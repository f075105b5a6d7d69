"""ctypes bindings for the native host kernels (built on first import).

Set PCODEC_TPU_NO_NATIVE=1 to force the pure-python fallbacks (used by tests
to validate both paths).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pco_kernels.cpp")
_SO = os.path.join(_DIR, "libpco_kernels.so")

if os.environ.get("PCODEC_TPU_NO_NATIVE"):
    raise ImportError("native kernels disabled via PCODEC_TPU_NO_NATIVE")


def _build():
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)


if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
    _build()

_lib = ctypes.CDLL(_SO)

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_u64p = ctypes.POINTER(ctypes.c_uint64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)

_lib.pco_ans_decode_batch.restype = ctypes.c_longlong
_lib.pco_ans_decode_batch.argtypes = [
    _u8p, ctypes.c_longlong, ctypes.c_int, _u32p, _i32p, _u64p, _u64p, _i64p,
]
_f32p = ctypes.POINTER(ctypes.c_float)
_lib.pco_optimize_bins_dp.restype = None
_lib.pco_optimize_bins_dp.argtypes = [
    _u32p, _u64p, _u64p, ctypes.c_longlong,
    ctypes.c_float, ctypes.c_float, _i64p, _f32p,
]


def optimize_bins_dp(c_counts, lowers, uppers, bin_meta_cost, total_count_log2):
    """Returns (best_js int64[n], best_cost f32) of the bin-merge DP."""
    n = len(lowers)
    best_js = np.empty(n, dtype=np.int64)
    best_cost = ctypes.c_float()
    _lib.pco_optimize_bins_dp(
        np.ascontiguousarray(c_counts, dtype=np.uint32).ctypes.data_as(_u32p),
        np.ascontiguousarray(lowers, dtype=np.uint64).ctypes.data_as(_u64p),
        np.ascontiguousarray(uppers, dtype=np.uint64).ctypes.data_as(_u64p),
        n, ctypes.c_float(bin_meta_cost), ctypes.c_float(total_count_log2),
        best_js.ctypes.data_as(_i64p), ctypes.byref(best_cost),
    )
    return best_js, np.float32(best_cost.value)


_lib.pco_histogram_sorted.restype = ctypes.c_longlong
_lib.pco_histogram_sorted.argtypes = [
    _u64p, ctypes.c_longlong, ctypes.c_int, _u64p, _u64p, _u64p,
]


def histogram_sorted(s: np.ndarray, n_bins_log: int):
    """(counts, lowers, uppers) of the quantile walk over sorted u64 `s`."""
    nb = 1 << n_bins_log
    counts = np.empty(nb, dtype=np.uint64)
    lowers = np.empty(nb, dtype=np.uint64)
    uppers = np.empty(nb, dtype=np.uint64)
    n_out = _lib.pco_histogram_sorted(
        np.ascontiguousarray(s, dtype=np.uint64).ctypes.data_as(_u64p),
        len(s), n_bins_log,
        counts.ctypes.data_as(_u64p), lowers.ctypes.data_as(_u64p),
        uppers.ctypes.data_as(_u64p),
    )
    return counts[:n_out], lowers[:n_out], uppers[:n_out]


_lib.pco_histogram_walk.restype = ctypes.c_longlong
_lib.pco_histogram_walk.argtypes = [
    ctypes.c_longlong, ctypes.c_int, _u64p, _i64p, _i64p, _u64p, _u64p,
    ctypes.c_uint64, ctypes.c_uint64, _u64p, _u64p, _u64p,
]


def histogram_walk(n, n_bins_log, V, L, R, SL1, SR, s0, slast):
    """Returns (counts, lowers, uppers) u64 arrays of the quantile walk."""
    nb = 1 << n_bins_log
    counts = np.empty(nb, dtype=np.uint64)
    lowers = np.empty(nb, dtype=np.uint64)
    uppers = np.empty(nb, dtype=np.uint64)
    n_out = _lib.pco_histogram_walk(
        n, n_bins_log,
        np.ascontiguousarray(V, dtype=np.uint64).ctypes.data_as(_u64p),
        np.ascontiguousarray(L, dtype=np.int64).ctypes.data_as(_i64p),
        np.ascontiguousarray(R, dtype=np.int64).ctypes.data_as(_i64p),
        np.ascontiguousarray(SL1, dtype=np.uint64).ctypes.data_as(_u64p),
        np.ascontiguousarray(SR, dtype=np.uint64).ctypes.data_as(_u64p),
        ctypes.c_uint64(s0), ctypes.c_uint64(slast),
        counts.ctypes.data_as(_u64p), lowers.ctypes.data_as(_u64p),
        uppers.ctypes.data_as(_u64p),
    )
    return counts[:n_out], lowers[:n_out], uppers[:n_out]


_lib.pco_xoroshiro_fill.restype = None
_lib.pco_xoroshiro_fill.argtypes = [ctypes.c_uint64, ctypes.c_uint64, ctypes.c_longlong, _u64p]


def xoroshiro_fill(s0: int, s1: int, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.uint64)
    _lib.pco_xoroshiro_fill(s0, s1, count, out.ctypes.data_as(_u64p))
    return out


_lib.pco_ans_encode_reverse.restype = None
_lib.pco_ans_encode_reverse.argtypes = [
    _i64p, ctypes.c_longlong, _u32p, _u32p, _u32p, _i64p, _u32p, _u64p, _i64p, _u32p,
]
_lib.pco_choose_lookbacks.restype = None
_lib.pco_choose_lookbacks.argtypes = [
    _u64p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int, ctypes.c_int, _u32p,
]
_lib.pco_write_bits.restype = None
_lib.pco_write_bits.argtypes = [
    _u64p, _i64p, ctypes.c_longlong, ctypes.c_longlong, _u8p,
]
_lib.pco_interleave_sections.restype = ctypes.c_longlong
_lib.pco_interleave_sections.argtypes = [
    ctypes.POINTER(ctypes.c_void_p), _i64p, ctypes.c_longlong,
    ctypes.c_longlong, _u8p, ctypes.c_longlong,
]
_vpp = ctypes.POINTER(ctypes.c_void_p)
_lib.pco_decode_page_pre_delta.restype = ctypes.c_longlong
_lib.pco_decode_page_pre_delta.argtypes = [
    _u8p, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int,
    _vpp, _vpp, _u32p, _i64p, ctypes.c_longlong,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), _u64p, _i64p,
    _vpp, _i64p, _i64p, _u32p,
]


_lib.pco_qco_decode_body.restype = ctypes.c_longlong
_lib.pco_qco_decode_body.argtypes = [
    _u8p, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
    ctypes.c_int, _i32p, _i32p, _u64p, _u64p, _i32p, _u64p, _u64p, _i32p,
    _u64p,
]


def qco_decode_body(padded: bytes, total_bits: int, start_bit: int,
                    n_out: int, max_depth: int, table, code_lens, lowers_u,
                    gcds, ks, min_unambiguous, most_significant, jumpstarts):
    """Native .qco chunk-body decode (legacy/qco.py fast path). Returns
    (out u64 array, new bit pos) or raises on insufficient data."""
    buf = np.frombuffer(padded, dtype=np.uint8)
    out = np.empty(n_out, dtype=np.uint64)
    new_pos = _lib.pco_qco_decode_body(
        _ptr(buf, ctypes.c_uint8), total_bits, start_bit, n_out, max_depth,
        _ptr(table, ctypes.c_int32), _ptr(code_lens, ctypes.c_int32),
        _ptr(lowers_u, ctypes.c_uint64), _ptr(gcds, ctypes.c_uint64),
        _ptr(ks, ctypes.c_int32), _ptr(min_unambiguous, ctypes.c_uint64),
        _ptr(most_significant, ctypes.c_uint64),
        _ptr(jumpstarts, ctypes.c_int32), _ptr(out, ctypes.c_uint64),
    )
    return out, int(new_pos)


_lib.pco_qco_encode_body.restype = ctypes.c_longlong
_lib.pco_qco_encode_body.argtypes = [
    _u64p, ctypes.c_longlong, ctypes.c_int, _u64p, _u64p, _u64p, _u32p,
    _i32p, _i32p, _u64p, _u64p, _i32p, _u8p,
]


def qco_encode_body(unsigneds: np.ndarray, lowers, uppers, gcds, codes,
                    code_lens, ks, only_k_lower, only_k_upper, jumpstarts,
                    dst: np.ndarray) -> int:
    """Native .qco chunk-body encode. dst must be zeroed with worst-case
    capacity. Returns bits written (-1 if a value fits no prefix)."""
    return int(_lib.pco_qco_encode_body(
        _ptr(unsigneds, ctypes.c_uint64), len(unsigneds), len(lowers),
        _ptr(lowers, ctypes.c_uint64), _ptr(uppers, ctypes.c_uint64),
        _ptr(gcds, ctypes.c_uint64), _ptr(codes, ctypes.c_uint32),
        _ptr(code_lens, ctypes.c_int32), _ptr(ks, ctypes.c_int32),
        _ptr(only_k_lower, ctypes.c_uint64),
        _ptr(only_k_upper, ctypes.c_uint64),
        _ptr(jumpstarts, ctypes.c_int32), _ptr(dst, ctypes.c_uint8),
    ))


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# adapters used by pcodec_tpu.codec
# ---------------------------------------------------------------------------


def _cld_native_tables(cld):
    cached = getattr(cld, "_native_tables", None)
    if cached is None:
        dec = cld.decoder
        node = (
            dec.bits_to_read.astype(np.int32)
            | (dec.offset_bits.astype(np.int32) << 4)
            | (dec.next_state_idx_base.astype(np.int32) << 11)
        )
        lowers = np.ascontiguousarray(cld.state_lowers.astype(np.uint64))
        cached = (np.ascontiguousarray(node), lowers)
        cld._native_tables = cached
    return cached


def ans_decode(reader, batch_n: int, state_idxs: list, cld) -> int:
    """Decode one interleaved tANS batch; fills cld scratch, mutates
    state_idxs, returns the new bit index."""
    node, lowers = _cld_native_tables(cld)
    states = np.array(state_idxs, dtype=np.uint32)
    out_lowers = getattr(cld, "_native_out64", None)
    if out_lowers is None:
        out_lowers = np.zeros(256, dtype=np.uint64)
        cld._native_out64 = out_lowers
    new_bit = _lib.pco_ans_decode_batch(
        _ptr(reader.src, ctypes.c_uint8),
        reader.bit_idx,
        batch_n,
        _ptr(states, ctypes.c_uint32),
        _ptr(node, ctypes.c_int32),
        _ptr(lowers, ctypes.c_uint64),
        _ptr(out_lowers, ctypes.c_uint64),
        _ptr(cld.scratch_offset_bits, ctypes.c_int64),
    )
    cld.scratch_latents[:batch_n] = out_lowers[:batch_n].astype(cld.latent_type.np_dtype)
    state_idxs[:] = states.tolist()
    return int(new_bit)


def _encoder_native_tables(enc):
    cached = getattr(enc, "_native_tables", None)
    if cached is None:
        min_renorm = np.array(enc.min_renorm_bits, dtype=np.uint32)
        cutoff = np.array(enc.renorm_bit_cutoff, dtype=np.uint32)
        weights = np.array(enc.weights, dtype=np.uint32)
        flat = np.concatenate([np.array(ns, dtype=np.uint32) for ns in enc.next_states]) \
            if enc.next_states else np.zeros(0, dtype=np.uint32)
        offs = np.zeros(len(enc.next_states), dtype=np.int64)
        pos = 0
        for i, ns in enumerate(enc.next_states):
            offs[i] = pos
            pos += len(ns)
        cached = (min_renorm, cutoff, flat, offs, weights)
        enc._native_tables = cached
    return cached


def ans_encode_reverse(symbols: np.ndarray, ans_vals: np.ndarray, ans_bits: np.ndarray, encoder):
    """Reverse LIFO encode; returns final states (list of 4)."""
    min_renorm, cutoff, flat, offs, weights = _encoder_native_tables(encoder)
    syms = np.ascontiguousarray(symbols, dtype=np.int64)
    final_states = np.full(4, encoder.default_state(), dtype=np.uint32)
    _lib.pco_ans_encode_reverse(
        _ptr(syms, ctypes.c_int64),
        len(syms),
        _ptr(min_renorm, ctypes.c_uint32),
        _ptr(cutoff, ctypes.c_uint32),
        _ptr(flat, ctypes.c_uint32),
        _ptr(offs, ctypes.c_int64),
        _ptr(weights, ctypes.c_uint32),
        _ptr(ans_vals, ctypes.c_uint64),
        _ptr(ans_bits, ctypes.c_int64),
        _ptr(final_states, ctypes.c_uint32),
    )
    return final_states.tolist()


def decode_page_pre_delta(reader, n: int, var_specs, capture: bool = False):
    """Decode a whole page's pre-delta latents in one native call.

    var_specs: list of dicts with keys cld (ChunkLatentDecompressor),
    pld (PageLatentDecompressor), state_n, is_delta. Returns (latents u64
    arrays per var, new bit index); raises on truncation via caller check.

    capture=True additionally returns (batch_cursors i64[n_batches, n_vars,
    2] of absolute (ans_start, off_start) bit positions, batch_states
    u32[n_batches, n_vars, 4] ANS entry state idxs) — the per-batch chain
    entry points the device-chain planner (ops/pallas_decode.plan_standalone)
    feeds the Pallas kernels with.
    """
    n_vars = len(var_specs)
    nodes_arr = (ctypes.c_void_p * n_vars)()
    lowers_arr = (ctypes.c_void_p * n_vars)()
    out_arr = (ctypes.c_void_p * n_vars)()
    states = np.zeros(n_vars * 4, dtype=np.uint32)
    var_state_n = np.zeros(n_vars, dtype=np.int64)
    is_delta = (ctypes.c_int * n_vars)()
    n_bins = (ctypes.c_int * n_vars)()
    single_lower = np.zeros(n_vars, dtype=np.uint64)
    single_ob = np.zeros(n_vars, dtype=np.int64)
    out_counts = np.zeros(n_vars, dtype=np.int64)
    outs = []
    keepalive = []
    for v, spec in enumerate(var_specs):
        cld = spec["cld"]
        node, lowers = _cld_native_tables(cld)
        keepalive += [node, lowers]
        nodes_arr[v] = ctypes.cast(_ptr(node, ctypes.c_int32), ctypes.c_void_p)
        lowers_arr[v] = ctypes.cast(_ptr(lowers, ctypes.c_uint64), ctypes.c_void_p)
        states[4 * v : 4 * v + 4] = spec["pld"].ans_state_idxs
        var_state_n[v] = spec["state_n"]
        is_delta[v] = 1 if spec["is_delta"] else 0
        n_bins[v] = cld.n_bins
        if cld.n_bins <= 1:
            single_lower[v] = lowers[0] if len(lowers) else 0
            single_ob[v] = cld.only_bin_offset_bits
        out = np.zeros(n + 260, dtype=np.uint64)
        outs.append(out)
        out_arr[v] = ctypes.cast(_ptr(out, ctypes.c_uint64), ctypes.c_void_p)

    primary_state_n = next(
        spec["state_n"] for spec in var_specs if spec["key"] == "primary"
    )
    n_batches = -(-n // 256)
    if capture:
        batch_cursors = np.zeros((n_batches, n_vars, 2), dtype=np.int64)
        batch_states = np.zeros((n_batches, n_vars, 4), dtype=np.uint32)
        cur_p = _ptr(batch_cursors, ctypes.c_int64)
        st_p = _ptr(batch_states, ctypes.c_uint32)
    else:
        cur_p = ctypes.cast(None, _i64p)
        st_p = ctypes.cast(None, _u32p)
    new_bit = _lib.pco_decode_page_pre_delta(
        _ptr(reader.src, ctypes.c_uint8),
        8 * reader.size,
        reader.bit_idx,
        n,
        n_vars,
        nodes_arr,
        lowers_arr,
        _ptr(states, ctypes.c_uint32),
        _ptr(var_state_n, ctypes.c_int64),
        primary_state_n,
        is_delta,
        n_bins,
        _ptr(single_lower, ctypes.c_uint64),
        _ptr(single_ob, ctypes.c_int64),
        out_arr,
        _ptr(out_counts, ctypes.c_int64),
        cur_p,
        st_p,
    )
    for v, spec in enumerate(var_specs):
        spec["pld"].ans_state_idxs = states[4 * v : 4 * v + 4].tolist()
    if capture:
        return outs, out_counts, int(new_bit), batch_cursors, batch_states
    return outs, out_counts, int(new_bit)


def choose_lookbacks_native(window_n_log: int, state_n: int, latents: np.ndarray) -> np.ndarray:
    lat64 = np.ascontiguousarray(latents.astype(np.uint64))
    n = len(lat64)
    out = np.zeros(max(n - state_n, 0), dtype=np.uint32)
    if len(out):
        _lib.pco_choose_lookbacks(
            _ptr(lat64, ctypes.c_uint64),
            n,
            latents.dtype.itemsize * 8,
            state_n,
            window_n_log,
            _ptr(out, ctypes.c_uint32),
        )
    return out


def interleave_sections(srcs, seclens: np.ndarray, dst: np.ndarray,
                        dst_start_bit: int) -> int:
    """Interleave per-var packed section streams into a page body: per
    batch, per var, [ans bits][offset bits]. srcs = list of uint8 arrays
    (each var's own packed stream, 8 bytes slack at the end); seclens =
    int64[(n_vars, 2, n_batches)] bit lengths. Returns bits written. dst
    must be zeroed past dst_start_bit with 8 bytes of slack."""
    n_vars, two, n_batches = seclens.shape
    assert two == 2
    padded = []
    for s in srcs:
        # copy_bits reads in 8-byte windows; guarantee slack past the end
        s2 = np.empty(len(s) + 8, np.uint8)
        s2[: len(s)] = s
        padded.append(s2)
    arr = (ctypes.c_void_p * n_vars)(
        *[s.ctypes.data_as(ctypes.c_void_p) for s in padded]
    )
    return _lib.pco_interleave_sections(
        arr,
        _ptr(np.ascontiguousarray(seclens, dtype=np.int64), ctypes.c_int64),
        n_vars, n_batches,
        _ptr(dst, ctypes.c_uint8),
        dst_start_bit,
    )


def write_bits(vals: np.ndarray, bitlens: np.ndarray, start_bit: int, dst: np.ndarray) -> None:
    _lib.pco_write_bits(
        _ptr(np.ascontiguousarray(vals, dtype=np.uint64), ctypes.c_uint64),
        _ptr(np.ascontiguousarray(bitlens, dtype=np.int64), ctypes.c_int64),
        len(vals),
        start_bit,
        _ptr(dst, ctypes.c_uint8),
    )


_lib.pco_delta_cand_stats.restype = None
_lib.pco_delta_cand_stats.argtypes = [
    _u64p, _i64p, _i64p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
    _i32p, ctypes.c_int, ctypes.c_int, _i32p, ctypes.c_longlong, _i64p,
    ctypes.c_int,
]


def delta_cand_stats(samples_flat, soff, sn, bits, obb, ubls,
                     min_order, max_order, wnls=None, n_threads=8):
    """Batched auto-delta candidate statistics (see pco_kernels.cpp).

    samples_flat: u64 concatenated per-chunk primary samples; soff/sn int64
    per chunk. max_order >= 0: consecutive orders min..max; -1: lookback
    (delta, primary) pairs using wnls (per-chunk window_n_log).
    Returns int64 (n_chunks, n_cands, 2 + 2*cap): [n_bins, asl, weights[cap],
    obs[cap]] with cap = 1 << max(ubls)."""
    n_chunks = len(sn)
    cap = 1 << int(np.max(ubls))
    cands = (max_order - min_order + 1) if max_order >= 0 else 2
    stride = 2 + 2 * cap
    out = np.zeros(n_chunks * cands * stride, np.int64)
    samples_flat = np.ascontiguousarray(samples_flat, np.uint64)
    soff = np.ascontiguousarray(soff, np.int64)
    sn_a = np.ascontiguousarray(sn, np.int64)
    ubls_a = np.ascontiguousarray(ubls, np.int32)
    wnls_a = (np.ascontiguousarray(wnls, np.int32) if wnls is not None
              else None)
    _lib.pco_delta_cand_stats(
        _ptr(samples_flat, ctypes.c_uint64), _ptr(soff, ctypes.c_int64),
        _ptr(sn_a, ctypes.c_int64), n_chunks, bits, obb,
        _ptr(ubls_a, ctypes.c_int32), min_order, max_order,
        _ptr(wnls_a, ctypes.c_int32) if wnls_a is not None else None,
        cap, _ptr(out, ctypes.c_int64), n_threads,
    )
    return out.reshape(n_chunks, cands, stride), cap


_lib.pco_hist_cand_stats.restype = None
_lib.pco_hist_cand_stats.argtypes = [
    _u64p, _u64p, _u64p, _i64p, _i64p, _i64p, _i32p,
    ctypes.c_longlong, ctypes.c_int, ctypes.c_int, ctypes.c_longlong,
    _i64p, ctypes.c_int,
]


def hist_cand_stats(counts, lowers, uppers, boff, bn, n_stored, ubls_slot,
                    bits, obb):
    """Partition + quantize from precomputed histograms, one slot per
    candidate (see pco_hist_cand_stats). Returns (int64 (n_slots,
    2 + 2*cap), cap)."""
    n_slots = len(bn)
    cap = 1 << int(np.max(ubls_slot)) if n_slots else 1
    stride = 2 + 2 * cap
    out = np.zeros(n_slots * stride, np.int64)
    args = [np.ascontiguousarray(a, np.uint64) for a in (counts, lowers, uppers)]
    boff = np.ascontiguousarray(boff, np.int64)
    bn_a = np.ascontiguousarray(bn, np.int64)
    nst = np.ascontiguousarray(n_stored, np.int64)
    ub = np.ascontiguousarray(ubls_slot, np.int32)
    _lib.pco_hist_cand_stats(
        _ptr(args[0], ctypes.c_uint64), _ptr(args[1], ctypes.c_uint64),
        _ptr(args[2], ctypes.c_uint64), _ptr(boff, ctypes.c_int64),
        _ptr(bn_a, ctypes.c_int64), _ptr(nst, ctypes.c_int64),
        _ptr(ub, ctypes.c_int32), n_slots, bits, obb, cap,
        _ptr(out, ctypes.c_int64), 1,
    )
    return out.reshape(n_slots, stride), cap
