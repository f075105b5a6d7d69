"""Device-side encoder training: full-array passes on the TPU, decisions on
the host from small fetched samples.

The host training pipeline (codec/compress.py, mirroring the reference's
wrapped/chunk_compressor.rs:477-534) spends its time in full-array passes:
the order-preserving bijection (data_types/*), per-page delta encoding
(delta/consecutive.rs:19-43), and the quantile histogram's sort
(histograms.rs:208-298). On this host those passes are memcpy-bound, so this
module runs them on the device instead and fetches only:

  - the deterministic mode/delta samples (sampling.rs:19-63 — the mode and
    delta decisions are pure functions of the samples),
  - per-page delta moments (they go into page metadata),
  - O(n_bins) quantile extracts per chunk that drive the histogram walk
    (histograms.rs:132-206) without touching the sorted array per bin.

Bins, ANS tables, and all emitted bytes are identical to the host pipeline;
tests/test_pallas_encode.py asserts byte equality.
"""

from dataclasses import dataclass, replace as _dc_replace
from functools import partial
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)  # all latent math is u64-widened

from pcodec_tpu import constants as c
from pcodec_tpu.binning import sampling
from pcodec_tpu.binning.histogram import _Builder, HistogramBin
from pcodec_tpu.codec.chunk_config import ChunkConfig, ModeSpec, PagingSpec
from pcodec_tpu.codec import compress as cmp
from pcodec_tpu.dtypes import NumberType, U32
from pcodec_tpu.format.metadata import DeltaEncoding, Mode, PerLatentVar
from pcodec_tpu.modes import int_mult
from pcodec_tpu.ops import softfloat

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

_TRAIN_TRACE = bool(int(__import__("os").environ.get("PCODEC_TRAIN_TRACE", "0")))

# A/B: 1 (default) = evaluate the lookback delta candidate on the host from
# a fetched delta sample; 0 = run the chooser scan on device and fetch only
# packed bins. Measured on TPU 2026-08-19 (64M taxi i64, warm): the device
# chooser scan is a ~21k-step lax.scan whose serial per-step overhead costs
# ~3.8 s of device time on the train critical path, while the host path's
# ~10.9 MB sample fetch rides a worker thread and the native chooser takes
# ~ms — train 0.97 s vs 4.32 s. Outputs are byte-identical either way.
_LB_HOST = bool(int(__import__("os").environ.get("PCODEC_LB_HOST", "1")))

# Decision-path selector. This host VM has ONE core (measured: thread
# pools give zero speedup), so the device decision machinery — full-array
# candidate walks on device, host does only the small bin DP per candidate
# — beats running the whole decision pipeline on host samples. Default 0 =
# device decisions, with the lookback candidate and the delta samples
# sourced from nums_host when the caller owns the array (no tunnel fetch).
# 1 = full host-native decisions (useful on many-core hosts).
_HOST_DECIDE = bool(int(__import__("os").environ.get("PCODEC_HOST_DECIDE", "0")))

# Speculative u32 sorts: XLA's u64 sort is the hottest stage-1/phase-2 op
# (u64 compares are emulated as u32 pairs). When a row's real value span
# fits 32 bits (device-checked), values sort as u32 relative to the row
# min — identical sorted VALUES, so bins are exact — and a fits flag rides
# back with the results; the host redispatches the exact u64 variant for
# the rare overflowing rows. 0 disables (always u64).
_SORT32 = bool(int(__import__("os").environ.get("PCODEC_SORT32", "1")))


def _prefetch(*arrays):
    """Start async device->host copies so later np.asarray calls hit the
    host cache instead of issuing serial RPCs."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except Exception:
            pass


def _trace(label, t0):
    import time as _t

    if _TRAIN_TRACE:
        print(f"    [train] {label}: {_t.time() - t0:.3f}s", flush=True)
    return _t.time()

# uploaded sample-index device arrays, keyed by chunk layout (see
# plan_encode_device: the indices are deterministic given the layout)
_IDX_UPLOAD_CACHE: Dict[tuple, tuple] = {}

# host-side bookkeeping (sample indices, spans, delta slices) per layout —
# the same determinism argument as _IDX_UPLOAD_CACHE
_BK_CACHE: Dict[tuple, tuple] = {}

# deterministic float-mode draw streams per chunk size (sample_draws runs
# a ~500k-element argsort; reruns of the same layout shouldn't repay it)
_DRAWS_CACHE: Dict[int, object] = {}

# last plan's decisions per (layout, dtype, config) — SPECULATION HINTS
# only: phase B/C are dispatched from them right after stage 1 so their
# compute overlaps the decision round trip; results are used only when the
# real decisions match exactly, else phase 2 re-dispatches (correctness
# never depends on the hint)
_SPEC_HINTS: Dict[tuple, dict] = {}


def device_train_supported(nt: NumberType, config: ChunkConfig, n: int, page_n: int) -> bool:
    """Chunks the device-train path covers; everything else falls back to the
    host pipeline (same output, slower). Every auto-mode winner is covered —
    Classic, IntMult (// base), FloatQuant (>> k with sign flip), FloatMult
    (integer softfloat split, ops/softfloat.py) — plus every pinned Try*
    spec (TRY_DICT splits on device via _phase_dict)."""
    ms = config.mode_spec
    if ms.kind in (ModeSpec.AUTO, ModeSpec.CLASSIC, ModeSpec.TRY_DICT):
        pass
    elif ms.kind == ModeSpec.TRY_INT_MULT:
        if nt.kind == "float" or int(ms.value) < 2:
            return False
    elif ms.kind == ModeSpec.TRY_FLOAT_QUANT:
        if nt.kind != "float" or not 1 <= int(ms.value) < nt.latent.bits:
            return False
    elif ms.kind == ModeSpec.TRY_FLOAT_MULT:
        if nt.kind != "float":
            return False
        # the softfloat split needs base AND inv_base normal
        for v in (nt.np_dtype.type(ms.value),
                  nt.np_dtype.type(1.0) / nt.np_dtype.type(ms.value)):
            bits = int(np.asarray(v, nt.np_dtype).view(nt.latent.np_dtype))
            eb_mask = (1 << (nt.latent.bits - nt.precision_bits - 1)) - 1
            eb = (bits >> nt.precision_bits) & eb_mask
            if eb == 0 or eb == eb_mask:
                return False
    else:
        return False
    if config.delta_spec.kind not in (
        cmp.DeltaSpec.AUTO,
        cmp.DeltaSpec.NO_OP,
        cmp.DeltaSpec.TRY_CONSECUTIVE,
        cmp.DeltaSpec.TRY_LOOKBACK,
    ):
        return False
    return n >= 4 * page_n


# ---------------------------------------------------------------------------
# jitted device phases
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("kind", "mid", "total_rows", "page_n"))
def _phase_latents(nums_dev, mode_idx, delta_idx, kind, mid, total_rows, page_n):
    """Bijection to latents + padded (rows, page_n) layout + sample gathers.

    ref bijection: data_types/signed.rs:88-91 (toggle top bit),
    unsigned.rs:118-120 (identity); widened to u64 rows for the kernels."""
    bits = nums_dev.dtype.itemsize * 8
    udt = {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32, 64: jnp.uint64}[bits]
    lat = jax.lax.bitcast_convert_type(nums_dev, udt)
    if kind == "signed":
        lat = lat ^ udt(mid)
    elif kind == "float":
        # sign-bit-toggle bijection (ref: data_types/float.rs:396-416)
        sign = udt(mid)
        neg = (lat & sign) != 0
        lat = jnp.where(neg, ~lat, lat ^ sign)
    lat = lat.astype(jnp.uint64)
    mode_s = lat[mode_idx]
    delta_s = lat[delta_idx]
    pad = total_rows * page_n - lat.shape[0]
    lat2d = jnp.pad(lat, (0, pad)).reshape(total_rows, page_n)
    return lat2d, mode_s, delta_s


def _gcd_u64(a, b):
    """Vectorized binary GCD (Stein) on u64 arrays — shifts, subtracts and
    popcounts only. TPU u64 division is software-emulated, which made the
    Euclid version the hottest op in the fused stage-1 dispatch (~0.15 s
    at the 64M bench shapes); exact on TPU (integer ops only)."""
    one = jnp.uint64(1)
    z64 = jnp.uint64(0)

    def ctz63(x):
        # trailing zeros, clamped to 63 so shifts stay defined for x == 0
        return jnp.minimum(
            jax.lax.population_count(~x & (x - one)), jnp.uint64(63))

    trivial = (a == 0) | (b == 0)
    ca = ctz63(a)
    cb = ctz63(b)
    shift = jnp.where(trivial, z64, jnp.minimum(ca, cb))
    x = jnp.where(trivial, one, a >> ca)         # odd
    y = jnp.where(trivial, z64, b >> cb)         # odd (or 0: loop no-op)

    def cond(st):
        return jnp.any(st[1] != 0)

    def body(st):
        x, y = st
        small = jnp.minimum(x, y)
        diff = jnp.maximum(x, y) - small
        ny = jnp.where(diff == 0, z64, diff >> ctz63(diff))
        return jnp.where(y == 0, x, small), jnp.where(y == 0, z64, ny)

    x, y = jax.lax.while_loop(cond, body, (x, y))
    return jnp.where(trivial, a | b, x << shift)


@partial(jax.jit, static_argnames=("n_chunks", "m_max", "k"))
def _phase_int_gcd(mode_s, starts, lens, n_chunks, m_max, k):
    """Triple-GCD screening for IntMult, reduced on device.

    Per chunk: sort sample triples, gcd the two diffs (int_mult.rs:114-136),
    and return the unique gcds>1 with counts (ascending, padded to k) so the
    host only fetches O(n_chunks * k) instead of the full mode sample.
    Returns (vals u64, cnts i32, n_unique i32)."""
    pos = jnp.arange(m_max, dtype=jnp.int32)[None, :]
    idx = jnp.clip(starts[:, None] + pos, 0, mode_s.shape[0] - 1)
    valid = pos < lens[:, None]
    sm = jnp.where(valid, mode_s[idx], jnp.uint64(0))
    nt3 = m_max // 3
    t = sm[:, : nt3 * 3].reshape(n_chunks, nt3, 3)
    tvalid = valid[:, : nt3 * 3].reshape(n_chunks, nt3, 3).all(axis=2)
    lo = jnp.min(t, axis=2)
    hi = jnp.max(t, axis=2)
    mid = jnp.sum(t, axis=2) - lo - hi
    g = _gcd_u64(mid - lo, hi - lo)
    g = jnp.where(tvalid & (g > 1), g, jnp.uint64(0))
    gs = jax.lax.sort(g, dimension=1, is_stable=False)  # zeros sort first
    nonzero = gs != 0
    is_start = nonzero & jnp.concatenate(
        [jnp.ones((n_chunks, 1), bool), gs[:, 1:] != gs[:, :-1]], axis=1
    )
    uidx = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    u = jnp.where(nonzero, jnp.minimum(uidx, k), k)  # slot k = overflow drop
    flat = (jnp.arange(n_chunks, dtype=jnp.int32)[:, None] * (k + 1) + u).reshape(-1)
    cnts = (
        jnp.zeros(n_chunks * (k + 1), jnp.int32)
        .at[flat]
        .add(nonzero.astype(jnp.int32).reshape(-1))
        .reshape(n_chunks, k + 1)[:, :k]
    )
    vals = (
        jnp.zeros(n_chunks * (k + 1), jnp.uint64)
        .at[flat]
        .add(jnp.where(is_start, gs, jnp.uint64(0)).reshape(-1))
        .reshape(n_chunks, k + 1)[:, :k]
    )
    n_unique = jnp.sum(is_start.astype(jnp.int32), axis=1)
    return vals, cnts, n_unique


@partial(jax.jit, static_argnames=("n_chunks", "m_max"))
def _phase_int_est(mode_s, starts, lens, bases, cutoffs, n_chunks, m_max):
    """Keep-count for the est_bits_saved acceptance test: # of sample
    elements whose primary (latent // base) occurs <= cutoff times
    (sampling.rs:71-101). bases >= 2, so the U64 MAX pad never collides
    with a real primary."""
    pos = jnp.arange(m_max, dtype=jnp.int32)[None, :]
    idx = jnp.clip(starts[:, None] + pos, 0, mode_s.shape[0] - 1)
    valid = pos < lens[:, None]
    prim = jnp.where(valid, mode_s[idx] // bases[:, None], U64_MAX)
    ps = jnp.sort(prim, axis=1)
    left = jax.vmap(partial(jnp.searchsorted, side="left"))(ps, ps)
    right = jax.vmap(partial(jnp.searchsorted, side="right"))(ps, ps)
    runlen = (right - left).astype(jnp.int32)
    keep = (runlen <= cutoffs[:, None]) & (pos < lens[:, None])
    return jnp.sum(keep.astype(jnp.int32), axis=1)


@partial(jax.jit, static_argnames=("mid", "exp_mask", "max_bits"))
def _phase_float_keep(nums_dev, draw_idx, mid, exp_mask, max_bits):
    """Per-draw keep flags for the float mode sample: normal floats with
    |x| <= the sampling cap (compress.py _is_normal/_max_for_sampling).
    Pure integer ops — positive IEEE floats order like their bits."""
    bits = nums_dev.dtype.itemsize * 8
    udt = {16: jnp.uint16, 32: jnp.uint32, 64: jnp.uint64}[bits]
    b = jax.lax.bitcast_convert_type(nums_dev, udt)[draw_idx]
    ab = b & udt(mid - 1)
    exp = b & udt(exp_mask)
    return (exp != 0) & (exp != udt(exp_mask)) & (ab <= udt(max_bits))


# first dict fetch carries this many dictionary entries alongside the
# per-chunk unique counts; larger dictionaries take one more (sized) fetch
_DICT_FETCH0 = 4096


@partial(jax.jit, static_argnames=("kind", "mid", "n_chunks", "dcap"))
def _phase_dict(nums_dev, chunk_starts, kind, mid, n_chunks, dcap):
    """TRY_DICT mode split on device (ref: mode/dict.rs:9-51; the host
    equivalent is modes/dict_mode.py). Per chunk: unique latents sorted by
    frequency descending (ties in ascending-value order, matching the host's
    stable argsort over np.unique output), plus the u32 dictionary index of
    every element.

    Everything is static-shaped: uniques live in flat n-sized buffers with
    one block per chunk (block ci starts at uid_base[ci] = cumsum of the
    unique counts), pads sink below real entries in every sort.

    Returns (idx_flat u32 [n] — the primary latents, uniq_freq flat u64 [n]
    device handle, small fetch buffer u64 [n_chunks + dcap] =
    [U per chunk | first dcap freq-ordered uniques])."""
    bits = nums_dev.dtype.itemsize * 8
    udt = {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32, 64: jnp.uint64}[bits]
    lat = jax.lax.bitcast_convert_type(nums_dev, udt)
    if kind == "signed":
        lat = lat ^ udt(mid)
    elif kind == "float":
        sign = udt(mid)
        neg = (lat & sign) != 0
        lat = jnp.where(neg, ~lat, lat ^ sign)
    lat = lat.astype(jnp.uint64)
    n = lat.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    cid = (jnp.searchsorted(chunk_starts, pos, side="right") - 1).astype(jnp.uint32)
    # group by (chunk, value); carry original positions for the scatter back
    cid_s, lat_s, pos_s = jax.lax.sort((cid, lat, pos), num_keys=2)
    bnd = jnp.concatenate([
        jnp.ones(1, bool),
        (cid_s[1:] != cid_s[:-1]) | (lat_s[1:] != lat_s[:-1]),
    ])
    uid = jnp.cumsum(bnd.astype(jnp.int32)) - 1  # global, value-asc per chunk
    counts = jnp.zeros(n, jnp.uint32).at[uid].add(jnp.uint32(1))
    val_of_uid = jnp.zeros(n, jnp.uint64).at[uid].max(lat_s)
    cid_of_uid = jnp.full(n, 0xFFFFFFFF, jnp.uint32).at[uid].min(cid_s)
    # frequency order per chunk: stable sort of uids by (chunk, count desc);
    # stability keeps equal-count uids in ascending-value order and sinks
    # the pad uids (count 0, chunk sentinel) below every real entry
    inv_cnt = jnp.uint32(0xFFFFFFFF) - counts
    uidx = jnp.arange(n, dtype=jnp.int32)
    _, _, uid_perm = jax.lax.sort(
        (cid_of_uid, inv_cnt, uidx), num_keys=2, is_stable=True
    )
    uniq_freq = val_of_uid[uid_perm]
    rank_global = jnp.zeros(n, jnp.uint32).at[uid_perm].set(uidx.astype(jnp.uint32))
    U = jnp.zeros(n_chunks, jnp.uint32).at[cid_s.astype(jnp.int32)].add(
        bnd.astype(jnp.uint32))
    uid_base = jnp.concatenate([
        jnp.zeros(1, jnp.uint32), jnp.cumsum(U)[:-1].astype(jnp.uint32)
    ])
    idx_sorted = rank_global[uid] - uid_base[cid_s.astype(jnp.int32)]
    idx_flat = jnp.zeros(n, jnp.uint32).at[pos_s].set(idx_sorted)
    small = jnp.concatenate([U.astype(jnp.uint64), uniq_freq[:dcap]])
    return idx_flat, uniq_freq, small


@partial(jax.jit, static_argnames=("cap",))
def _slice_prefix(a, cap):
    return a[:cap]


@partial(jax.jit, static_argnames=("max_order", "n_chunks", "rows_per_chunk",
                                   "page_n", "lat_bits", "has_bases",
                                   "f_params", "sort32"))
def _phase_delta_sort(lat2d, order_row, rowlen, nreal, extract_idx,
                      max_order, n_chunks, rows_per_chunk, page_n, lat_bits,
                      base_row=None, has_bases=False, fmult_invb_row=None,
                      f_params=None, sort32=False):
    """Per-page consecutive delta (vectorized, every order at once), then a
    per-chunk sort of the junk-masked deltas and the batched quantile
    extraction that drives the histogram walk on the host.

    order_row (rows,) i32: the chunk's delta order per page row.
    rowlen (rows,) i32: real numbers in each page row (0 for pad rows).
    nreal (n_chunks,) i32: histogram population per chunk.
    extract_idx (n_chunks, NB) i32: c_count(j)-1 positions per chunk.
    base_row (rows,) u64 (has_bases only): IntMult base per page row; rows
    with base > 1 are replaced by their PRIMARY latents (latent // base)
    before delta (mode split precedes delta, ref: chunk_compressor.rs:477).
    """
    if f_params is not None:
        # FloatMult rows are replaced by their PRIMARY latents (softfloat
        # split; invb bits 0 = not a FloatMult row)
        W, E, P = f_params
        prim = softfloat.float_mult_primary(
            lat2d, fmult_invb_row[:, None], W, E, P)
        lat2d = jnp.where(fmult_invb_row[:, None] != 0, prim, lat2d)
    if has_bases:
        lat2d = lat2d // jnp.maximum(base_row, jnp.uint64(1))[:, None]
    out = lat2d
    moments_cols = []
    col = jax.lax.broadcasted_iota(jnp.int32, lat2d.shape, 1)
    # wrapping arithmetic is mod 2^lat_bits even though rows are u64-widened
    mask = jnp.uint64((1 << lat_bits) - 1) if lat_bits < 64 else None
    for o in range(max_order):
        live = (order_row > o)[:, None]
        moments_cols.append(jnp.where(live[:, 0], out[:, o], 0))
        diff = out - jnp.roll(out, 1, axis=1)
        if mask is not None:
            diff = diff & mask
        step = jnp.where(col > o, diff, out)
        out = jnp.where(live, step, out)
    # toggle_center applies only to delta'd rows (delta/mod.rs:26-31);
    # NOOP pages keep raw latents
    mid = jnp.uint64(1) << jnp.uint64(lat_bits - 1)
    toggled = out + mid
    if mask is not None:
        toggled = toggled & mask
    do_toggle = (col >= order_row[:, None]) & (order_row[:, None] > 0)
    out = jnp.where(do_toggle, toggled, out)
    moments = (
        jnp.stack(moments_cols, axis=1)
        if moments_cols
        else jnp.zeros((lat2d.shape[0], 0), jnp.uint64)
    )

    # sort input: junk fronts and padding replaced by U64 MAX
    live_col = (col >= order_row[:, None]) & (col < rowlen[:, None])
    sort_in = jnp.where(live_col, out, jnp.uint64(U64_MAX))
    per_chunk = sort_in.reshape(n_chunks, rows_per_chunk * page_n)
    nreal64 = nreal[:, None].astype(jnp.int64)
    if sort32:
        # u32 keys relative to the chunk min when the real span fits 32
        # bits (sorted VALUES identical -> extracts/walk exact); fits=0
        # chunks carry garbage extracts and the host redispatches the u64
        # variant (see plan_encode_device)
        m_tot = per_chunk.shape[1]
        vmin = jnp.min(per_chunk, axis=1, keepdims=True)
        is_pad_or_max = per_chunk == U64_MAX
        realmax = jnp.max(
            jnp.where(is_pad_or_max, vmin, per_chunk), axis=1, keepdims=True)
        n_max = jnp.sum(is_pad_or_max, axis=1).astype(jnp.int64)
        fits = (
            (realmax[:, 0] - vmin[:, 0] <= jnp.uint64(0xFFFFFFFE))
            & (n_max == (jnp.int64(m_tot) - nreal64[:, 0]))
        )
        rel = jnp.where(
            is_pad_or_max, jnp.uint64(0xFFFFFFFF), per_chunk - vmin
        ).astype(jnp.uint32)
        s = jax.lax.sort(rel, dimension=1, is_stable=False)
        rec = lambda x: vmin + x.astype(jnp.uint64)
    else:
        fits = jnp.ones((n_chunks,), bool)
        # values only: unstable lax.sort (equal u64 keys indistinguishable)
        s = jax.lax.sort(per_chunk, dimension=1, is_stable=False)
        rec = lambda x: x

    v = jnp.take_along_axis(s, extract_idx.astype(jnp.int32), axis=1)
    # extract ranks via run-boundary cumulative scans (the extracts come
    # FROM s, so searchsorted left/right == first/last occurrence) — same
    # replacement as _extracts_and_walk, measured faster than the vmapped
    # binary search on the full-width rows
    col_r = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    bnd_l = jnp.concatenate(
        [jnp.ones((s.shape[0], 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    first_idx = jax.lax.cummax(jnp.where(bnd_l, col_r, 0), axis=1)
    bnd_r = jnp.concatenate(
        [s[:, 1:] != s[:, :-1], jnp.ones((s.shape[0], 1), bool)], axis=1)
    last_idx = jax.lax.cummin(
        jnp.where(bnd_r, col_r, jnp.int32(0x7FFFFFFF)), axis=1, reverse=True)
    eidx32 = extract_idx.astype(jnp.int32)
    left = jnp.take_along_axis(first_idx, eidx32, axis=1)
    right = jnp.take_along_axis(last_idx, eidx32, axis=1).astype(jnp.int64) + 1
    # pads sort at the tail; clipping right to the real count keeps
    # run extents exact even when real values equal the pad key
    right = jnp.minimum(right, nreal64)
    sl1 = jnp.take_along_axis(s, jnp.maximum(left - 1, 0).astype(jnp.int32), axis=1)
    sr_idx = jnp.clip(jnp.minimum(right, nreal64 - 1), 0, s.shape[1] - 1)
    sr = jnp.take_along_axis(s, sr_idx.astype(jnp.int32), axis=1)
    s0 = rec(s[:, 0:1])[:, 0]
    return (out, moments, rec(v), left, right, rec(sl1), rec(sr), s0,
            fits.astype(jnp.uint32))


_GCD_K = 256  # unique-GCD slots per chunk fetched from device


def _int_bases_collect(handle, mode_s_dev, chunk_ns, lt) -> Dict[int, int]:
    """Score the device GCD screening (arrays from the stage-1 packed
    fetch). Matches int_mult.choose_base_from_sample exactly; chunks whose
    unique GCD count overflows the fetch window fall back to a sample
    fetch. handle = ((vals, cnts, nuniq), starts, lens, m_max)."""
    if handle is None:
        return {}
    (vals_d, cnts_d, nuniq_d), starts, lens, m_max = handle
    n_chunks = len(chunk_ns)
    vals = np.asarray(vals_d)
    cnts = np.asarray(cnts_d)
    nuniq = np.asarray(nuniq_d)

    bases: Dict[int, int] = {}
    cands: Dict[int, tuple] = {}
    for ci in range(n_chunks):
        m = int(lens[ci])
        n_triples = m // 3
        if n_triples == 0:
            continue
        if nuniq[ci] > _GCD_K:  # pathological many distinct GCDs: fetch sample
            a = int(starts[ci])
            ms = np.asarray(mode_s_dev[a : a + m]).astype(lt.np_dtype)
            base = int_mult.choose_base_from_sample(ms)
            if base is not None:
                bases[ci] = base
            continue
        nu = int(nuniq[ci])
        cand = int_mult.choose_candidate_from_gcd_counts(
            vals[ci, :nu].tolist(), cnts[ci, :nu].tolist(), n_triples
        )
        if cand is not None:
            cands[ci] = cand
    if cands:
        sel = sorted(cands)
        cutoffs = np.array(
            [max(1, int(int(lens[ci]) / sampling.CLASSIC_MEMORIZABLE_BINS)) for ci in sel],
            dtype=np.int32,
        )
        kc = np.asarray(
            _phase_int_est(
                mode_s_dev,
                jnp.asarray(starts[sel]),
                jnp.asarray(lens[sel]),
                jnp.asarray(np.array([cands[ci][0] for ci in sel], dtype=np.uint64)),
                jnp.asarray(cutoffs),
                n_chunks=len(sel),
                m_max=m_max,
            )
        )
        for i, ci in enumerate(sel):
            candidate, score = cands[ci]
            if int_mult.accept_candidate(score, int(kc[i]), int(lens[ci])):
                bases[ci] = candidate
    return bases


# ---------------------------------------------------------------------------
# device histogram walk (integer-exact scan over the quantile extracts)
# ---------------------------------------------------------------------------


# Pallas walk kernel A/B (ops/pallas_walk.py): measured EQUAL to the
# lax.scan inside the fused stage-1 jit on v5e (71.6 vs 73.5 ms fused cand
# phase, 2026-08-20 — the scan's apparent per-step cost in isolated
# profiles was fetch-RTT artifacts). Kept as an off-by-default A/B; the
# scan is simpler.
_PALLAS_WALK = bool(int(__import__("os").environ.get("PCODEC_PALLAS_WALK", "0")))


def _walk_bins_device(V, L, R, SL1, SR, s0, n, nb_log, max_n=None):
    """The quantile-histogram walk (histograms.rs:132-206) on device,
    vectorized across lanes: one sequential scan of <= nb steps whose
    per-step logic mirrors the host builder exactly (pure integer ops, so
    results are bit-identical to histogram()). V/L/R/SL1/SR: (lanes, nb);
    s0, n: (lanes,). Returns counts/lowers/uppers (lanes, nb) u64 + n_bins
    (lanes,) i32, bins packed to the front in emission order.

    On TPU the scan runs as a Pallas kernel (ops/pallas_walk.py) when the
    caller supplies a static max_n bound — the XLA while-loop costs
    ~0.45 ms PER STEP here (~115 ms at nb=256, measured 2026-08-20); the
    kernel runs the same steps in microseconds."""
    nb = 1 << nb_log
    lanes = V.shape[0]
    n = n.astype(jnp.int64)
    slast = V[:, nb - 1]
    nsafe = jnp.maximum(n, 1)

    use_pallas = (
        _PALLAS_WALK and nb <= 256 and max_n is not None
        and (max_n << nb_log) < (1 << 30)
    )
    if use_pallas:
        try:
            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        except Exception:  # pragma: no cover
            on_tpu = False
        use_pallas = on_tpu
    if use_pallas:
        from pcodec_tpu.ops import pallas_walk

        ys = pallas_walk.walk_emissions(V, L, R, SL1, SR, s0, n, nb_log)
        nout64 = (jnp.sum(ys[0], axis=0) + jnp.sum(ys[4], axis=0)
                  ).astype(jnp.int64)
        return _pack_walk_emissions(ys, nout64, lanes, nb)

    def bin_idx(c_count):
        return (c_count << nb_log) // nsafe

    def c_count(bi):
        return ((bi + 1) * n + nb - 1) >> nb_log

    def step(carry, _):
        (pos, cur_lower, inc_c, inc_lo, inc_up, has_inc, next_avail, done,
         nout) = carry
        active = (~done) & (pos < n)

        j = bin_idx(pos)
        tcc = c_count(j)
        ti = tcc - pos
        brk = ti >= n - pos

        emitA = jnp.zeros(lanes, bool)
        emitA_c = jnp.zeros(lanes, jnp.int64)
        emitA_lo = jnp.zeros(lanes, jnp.uint64)
        emitA_up = jnp.zeros(lanes, jnp.uint64)
        emitB = jnp.zeros(lanes, bool)
        emitB_c = jnp.zeros(lanes, jnp.int64)
        emitB_lo = jnp.zeros(lanes, jnp.uint64)
        emitB_up = jnp.zeros(lanes, jnp.uint64)

        def apply_inc(cnt, lo, up, st):
            pos_, inc_c, inc_lo, inc_up, has_inc = st
            nz = cnt > 0
            inc_lo = jnp.where(nz & ~has_inc, lo, inc_lo)
            inc_up = jnp.where(nz, up, inc_up)
            inc_c = jnp.where(nz, inc_c + cnt, inc_c)
            has_inc = has_inc | nz
            return pos_, inc_c, inc_lo, inc_up, has_inc

        # ---- break branch (masked) ----
        b_st = apply_inc(
            jnp.where(active & brk, n - pos, 0), cur_lower, slast,
            (pos, inc_c, inc_lo, inc_up, has_inc),
        )
        _, b_inc_c, b_inc_lo, b_inc_up, b_has_inc = b_st
        b_complete = active & brk & (ti == n - pos) & b_has_inc
        emitA = jnp.where(b_complete, True, emitA)
        emitA_c = jnp.where(b_complete, b_inc_c, emitA_c)
        emitA_lo = jnp.where(b_complete, b_inc_lo, emitA_lo)
        emitA_up = jnp.where(b_complete, b_inc_up, emitA_up)
        b_next_avail = jnp.where(b_complete, j + 1, next_avail)
        b_has_inc2 = b_has_inc & ~b_complete

        # ---- run branch (masked) ----
        run = active & ~brk
        jc = jnp.minimum(j, nb - 1)
        tx = jnp.take_along_axis(V, jc[:, None], axis=1)[:, 0]
        lj = jnp.take_along_axis(L, jc[:, None], axis=1)[:, 0]
        rj = jnp.take_along_axis(R, jc[:, None], axis=1)[:, 0]
        sl1j = jnp.take_along_axis(SL1, jc[:, None], axis=1)[:, 0]
        srj = jnp.take_along_axis(SR, jc[:, None], axis=1)[:, 0]
        l = jnp.maximum(lj, pos)
        r_st = apply_inc(
            jnp.where(run, l - pos, 0), cur_lower, sl1j,
            (pos, inc_c, inc_lo, inc_up, has_inc),
        )
        _, r_inc_c, r_inc_lo, r_inc_up, r_has_inc = r_st
        # apply_constant_run(count=r-l, value=tx); n_applied == l here
        cnt = rj - l
        mid = l + cnt // 2
        end = l + cnt
        bin2 = bin_idx(mid)
        spare_cond = run & (bin2 > next_avail)
        spare = bin2 - 1
        spare_complete = spare_cond & r_has_inc
        emitA = jnp.where(spare_complete, True, emitA)
        emitA_c = jnp.where(spare_complete, r_inc_c, emitA_c)
        emitA_lo = jnp.where(spare_complete, r_inc_lo, emitA_lo)
        emitA_up = jnp.where(spare_complete, r_inc_up, emitA_up)
        r_next_avail = jnp.where(spare_complete, spare + 1, next_avail)
        r_has_inc2 = r_has_inc & ~spare_complete
        r_inc_c2 = jnp.where(spare_complete, 0, r_inc_c)
        bin2 = jnp.where(spare_cond & ~spare_complete, spare, bin2)
        # apply_incomplete(count, tx, tx)
        _, r_inc_c3, r_inc_lo3, r_inc_up3, r_has_inc3 = apply_inc(
            jnp.where(run, cnt, 0), tx, tx,
            (pos, r_inc_c2, r_inc_lo, r_inc_up, r_has_inc2),
        )
        end_complete = run & (end >= c_count(bin2)) & r_has_inc3
        emitB = jnp.where(end_complete, True, emitB)
        emitB_c = jnp.where(end_complete, r_inc_c3, emitB_c)
        emitB_lo = jnp.where(end_complete, r_inc_lo3, emitB_lo)
        emitB_up = jnp.where(end_complete, r_inc_up3, emitB_up)
        r_next_avail = jnp.where(end_complete, bin2 + 1, r_next_avail)
        r_has_inc4 = r_has_inc3 & ~end_complete
        r_inc_c4 = jnp.where(end_complete, 0, r_inc_c3)

        # ---- merge branches ----
        new_pos = jnp.where(run, rj, pos)
        new_cur_lower = jnp.where(run, srj, cur_lower)
        new_inc_c = jnp.where(run, r_inc_c4, jnp.where(active & brk, 0, inc_c))
        new_inc_lo = jnp.where(run, r_inc_lo3, jnp.where(active & brk, b_inc_lo, inc_lo))
        new_inc_up = jnp.where(run, r_inc_up3, jnp.where(active & brk, b_inc_up, inc_up))
        new_has_inc = jnp.where(run, r_has_inc4, jnp.where(active & brk, b_has_inc2, has_inc))
        new_next_avail = jnp.where(run, r_next_avail, jnp.where(active & brk, b_next_avail, next_avail))
        new_done = done | (active & brk) | (~active)
        new_nout = nout + emitA.astype(jnp.int64) + emitB.astype(jnp.int64)
        carry2 = (new_pos, new_cur_lower, new_inc_c, new_inc_lo, new_inc_up,
                  new_has_inc, new_next_avail, new_done, new_nout)
        ys = (emitA, emitA_c, emitA_lo, emitA_up, emitB, emitB_c, emitB_lo, emitB_up)
        return carry2, ys

    init = (
        jnp.zeros(lanes, jnp.int64),          # pos
        s0.astype(jnp.uint64),                # cur_lower
        jnp.zeros(lanes, jnp.int64),          # inc_count
        jnp.zeros(lanes, jnp.uint64),         # inc_lower
        jnp.zeros(lanes, jnp.uint64),         # inc_upper
        jnp.zeros(lanes, bool),               # has_inc
        jnp.zeros(lanes, jnp.int64),          # next_avail_bin_idx
        n <= 0,                               # done
        jnp.zeros(lanes, jnp.int64),          # nout
    )
    carry, ys = jax.lax.scan(step, init, None, length=nb)
    return _pack_walk_emissions(ys, carry[8], lanes, nb)


def _pack_walk_emissions(ys, nout64, lanes, nb):
    """Pack step-major A/B emissions to front-aligned bins per lane."""
    (emitA, eAc, eAlo, eAup, emitB, eBc, eBlo, eBup) = ys
    # chronological order per lane: step-major, slot A before slot B
    valid = jnp.stack([emitA, emitB], axis=2)          # (nb, lanes, 2)
    cs = jnp.stack([eAc, eBc], axis=2)
    los = jnp.stack([eAlo, eBlo], axis=2)
    ups = jnp.stack([eAup, eBup], axis=2)
    valid = jnp.transpose(valid, (1, 0, 2)).reshape(lanes, nb * 2)
    cs = jnp.transpose(cs, (1, 0, 2)).reshape(lanes, nb * 2)
    los = jnp.transpose(los, (1, 0, 2)).reshape(lanes, nb * 2)
    ups = jnp.transpose(ups, (1, 0, 2)).reshape(lanes, nb * 2)
    idx = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(valid, jnp.minimum(idx, nb - 1), nb)  # nb = drop slot
    flat = (jnp.arange(lanes, dtype=jnp.int32)[:, None] * (nb + 1) + tgt).reshape(-1)
    counts_out = (
        jnp.zeros(lanes * (nb + 1), jnp.uint64)
        .at[flat].add(jnp.where(valid, cs.astype(jnp.uint64), 0).reshape(-1))
        .reshape(lanes, nb + 1)[:, :nb]
    )
    lowers_out = (
        jnp.zeros(lanes * (nb + 1), jnp.uint64)
        .at[flat].add(jnp.where(valid, los, jnp.uint64(0)).reshape(-1))
        .reshape(lanes, nb + 1)[:, :nb]
    )
    uppers_out = (
        jnp.zeros(lanes * (nb + 1), jnp.uint64)
        .at[flat].add(jnp.where(valid, ups, jnp.uint64(0)).reshape(-1))
        .reshape(lanes, nb + 1)[:, :nb]
    )
    n_bins = nout64.astype(jnp.int32)
    return counts_out, lowers_out, uppers_out, n_bins


def _bitlen_u64(x):
    """bit_length of u64 lanes (0 -> 0), integer-only."""
    x = x.astype(jnp.uint64)
    nz = x > 0
    pos = jnp.zeros(x.shape, jnp.uint64)
    for k in (32, 16, 8, 4, 2, 1):
        big = (x >> jnp.uint64(k)) > 0
        x = jnp.where(big, x >> jnp.uint64(k), x)
        pos = pos + jnp.where(big, jnp.uint64(k), jnp.uint64(0))
    return jnp.where(nz, pos + 1, 0).astype(jnp.int32)


def _choose_lookbacks_device(lat2d, lens, bits, window_n_log, state_n):
    """The 16-candidate lookback chooser (delta/lookback.rs:101-164)
    vectorized across chunk lanes. Bit-identical to choose_lookbacks: pure
    integer ops, same proposal/scoring/update order.

    The reference keeps two hash tables of 2^(window_n_log+1) slots mapping
    value-bucket hashes to the last index seen — per-lane tables would cost
    lanes * 2^16 ints of carry at window 15. Since both the inserts
    (hash of position j's bucket) and the queries (hashes of position i's
    bucket +-1 at both coarsenesses) are static per position, the table
    reads are precomputed OUTSIDE the scan as predecessor queries — sort
    (insert_hash, position) per lane, searchsorted each query for the last
    insert j < i with the same hash (identical collisions), default j = 0
    exactly like the zero-initialized reference tables. The scan then
    carries only the small count/repeat feedback state.

    lat2d: (lanes, m) u64 latent values; lens: (lanes,) i32.
    Returns lookbacks (lanes, m - state_n) i32 (0 past each lane's length).
    """
    lanes, m = lat2d.shape
    window_n = 1 << window_n_log
    htn = 1 << (window_n_log + 1)
    hash_mask = jnp.uint64(htn - 1)
    mask_l = jnp.uint64((1 << bits) - 1) if bits < 64 else jnp.uint64(0xFFFFFFFFFFFFFFFF)
    lens = lens.astype(jnp.int32)
    col16 = jnp.arange(16, dtype=jnp.int32)[None, :]

    def hash_fn(x):
        x = (x ^ (x >> jnp.uint64(32))) * jnp.uint64(11400714819323197441)
        x = x ^ (x >> jnp.uint64(32))
        return (x & hash_mask).astype(jnp.uint64)

    # ---- precomputed hash-table reads: lb_last_all[k] (lanes, m) i32 is
    # what `i - table[query_hash_k(i)]` would return at step i ----
    col = jax.lax.broadcasted_iota(jnp.int64, (lanes, m), 1)
    mlog = max(m - 1, 1).bit_length()
    ins_ok = (col >= state_n) & (col < lens.astype(jnp.int64)[:, None])
    searchsorted_lane = jax.vmap(partial(jnp.searchsorted, side="left"))
    lb_last_all = []
    for coarseness in (0, 8):
        bucket = lat2d >> jnp.uint64(coarseness)
        ins_key = jnp.where(
            ins_ok,
            (hash_fn(bucket) << jnp.uint64(mlog)) | col.astype(jnp.uint64),
            jnp.uint64(0xFFFFFFFFFFFFFFFF),
        )
        skey = jnp.sort(ins_key, axis=1)
        for d in (0xFFFFFFFFFFFFFFFF, 0, 1):  # -1, 0, +1 mod 2^64
            qh = hash_fn(bucket + jnp.uint64(d))
            q = (qh << jnp.uint64(mlog)) | col.astype(jnp.uint64)
            idx = searchsorted_lane(skey, q) - 1
            cand = jnp.take_along_axis(skey, jnp.maximum(idx, 0).astype(jnp.int32), axis=1)
            hit = (idx >= 0) & ((cand >> jnp.uint64(mlog)) == qh)
            pred_j = jnp.where(
                hit, (cand & jnp.uint64((1 << mlog) - 1)).astype(jnp.int32), 0
            )
            lb_last_all.append(col.astype(jnp.int32) - pred_j)
    lb_last_all = jnp.stack(lb_last_all, axis=0)  # (6, lanes, m)

    def gather_lane16(arr2d, idx):
        # arr2d (lanes, K), idx (lanes, 16) -> (lanes, 16)
        return jnp.take_along_axis(arr2d, idx, axis=1)

    def step(carry, i):
        counts, proposed, best_lb, rep_idx = carry
        active = i < lens
        l = jax.lax.dynamic_index_in_dim(lat2d, i, axis=1, keepdims=False)

        new_brute = jnp.minimum(i, 16)
        proposed = jnp.where(
            active[:, None] & (col16 == new_brute - 1), new_brute, proposed
        )

        lb_last6 = jax.lax.dynamic_index_in_dim(
            lb_last_all, i, axis=2, keepdims=False
        )  # (6, lanes)
        for k in range(6):
            lb_last = lb_last6[k]
            prop_idx = 10 + k
            val = jnp.where(
                lb_last <= window_n, lb_last, jnp.minimum(prop_idx, i)
            ).astype(jnp.int32)
            proposed = jnp.where(
                active[:, None] & (col16 == prop_idx), val[:, None], proposed
            )

        lb = jnp.clip(proposed, 1, jnp.maximum(i, 1))
        count = gather_lane16(counts, lb - 1)
        other = gather_lane16(lat2d, jnp.clip(i - lb, 0, m - 1))
        d1 = (l[:, None] - other) & mask_l
        d2 = (other - l[:, None]) & mask_l
        delta = jnp.minimum(d1, d2)
        goodness = _bitlen_u64(count.astype(jnp.uint64)) + (
            bits - _bitlen_u64(delta)
        )
        kstar = jnp.argmax(goodness, axis=1).astype(jnp.int32)  # first max
        best = gather_lane16(lb, kstar[:, None])[:, 0]

        changed = best != best_lb
        rep_idx = jnp.where(active & changed, rep_idx + 1, rep_idx)
        rep_col = 6 + rep_idx % 4
        proposed = jnp.where(
            active[:, None] & (col16 == rep_col[:, None]), best[:, None], proposed
        )
        best_lb = jnp.where(active, best, best_lb)
        lane_iota = jnp.arange(lanes, dtype=jnp.int32)
        counts = counts.at[lane_iota, jnp.clip(best - 1, 0, counts.shape[1] - 1)].add(
            active.astype(counts.dtype)
        )
        out = jnp.where(active, best, 0)
        return (counts, proposed, best_lb, rep_idx), out

    init = (
        jnp.ones((lanes, min(window_n, m)), jnp.int32),   # lookback_counts
        jnp.minimum(col16 + 1, state_n) * jnp.ones((lanes, 1), jnp.int32),
        jnp.ones(lanes, jnp.int32),                       # best_lookback
        jnp.zeros(lanes, jnp.int32),                      # repeating_idx
    )
    xs = jnp.arange(state_n, m, dtype=jnp.int32)
    _, outs = jax.lax.scan(step, init, xs)
    return jnp.transpose(outs)  # (lanes, m - state_n)


def _pack_bins_dense(co, lo, up, nbn):
    """Pack per-row padded bins into one dense (cap, 3) u64 buffer
    [lower, upper, count] in row-major bin order, so the host fetches
    sum(nbn) * 24 bytes instead of rows * nb * 20."""
    rows, nb = co.shape
    cap = rows * nb
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int64), jnp.cumsum(nbn.astype(jnp.int64))[:-1]]
    )
    col = jax.lax.broadcasted_iota(jnp.int64, (rows, nb), 1)
    valid = col < nbn.astype(jnp.int64)[:, None]
    tgt = jnp.where(valid, starts[:, None] + col, cap).reshape(-1)
    dense = jnp.zeros((cap + 1, 3), jnp.uint64)
    dense = dense.at[tgt, 0].add(jnp.where(valid, lo, jnp.uint64(0)).reshape(-1))
    dense = dense.at[tgt, 1].add(jnp.where(valid, up, jnp.uint64(0)).reshape(-1))
    dense = dense.at[tgt, 2].add(
        jnp.where(valid, co.astype(jnp.uint64), jnp.uint64(0)).reshape(-1)
    )
    return dense[:cap]


def _pack_bins_dense32(co, lo, up, nbn):
    """Transfer-packed bins for the tunnel (which moves a few MB/s): per
    row, lower/upper are stored relative to the row's first lower (bins are
    sorted ascending), so each bin costs 12 bytes instead of 24. Returns
    (dense32 (cap, 3) u32 [lower-base, upper-base, count], base u64
    (rows,), fits u32 (rows,)). Rows whose span overflows 32 bits (fits=0,
    rare) must be re-read from the exact u64 packing instead; the host
    reconstruction base + u32 is exact integer math, so decisions stay
    byte-identical to the host pipeline."""
    rows, nb = co.shape
    base = lo[:, 0]
    last = jnp.maximum(nbn.astype(jnp.int32) - 1, 0)[:, None]
    span = jnp.take_along_axis(up, last, axis=1)[:, 0] - base
    fits = (span <= jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    lo32 = (lo - base[:, None]).astype(jnp.uint32)
    up32 = (up - base[:, None]).astype(jnp.uint32)
    cap = rows * nb
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int64), jnp.cumsum(nbn.astype(jnp.int64))[:-1]]
    )
    col = jax.lax.broadcasted_iota(jnp.int64, (rows, nb), 1)
    valid = col < nbn.astype(jnp.int64)[:, None]
    tgt = jnp.where(valid, starts[:, None] + col, cap).reshape(-1)
    z32 = jnp.uint32(0)
    dense = jnp.zeros((cap + 1, 3), jnp.uint32)
    dense = dense.at[tgt, 0].add(jnp.where(valid, lo32, z32).reshape(-1))
    dense = dense.at[tgt, 1].add(jnp.where(valid, up32, z32).reshape(-1))
    dense = dense.at[tgt, 2].add(
        jnp.where(valid, co.astype(jnp.uint32), z32).reshape(-1))
    return dense[:cap], base, fits


def _unpack_bins32(nbn, base, fits, dense32, dense64_d):
    """Host side of _pack_bins_dense32: per-row (counts, lowers, uppers)
    u64 views. dense64_d: the device-resident exact packing, fetched only
    for rows whose span overflowed u32 (rare; costs one extra RPC)."""
    row_starts = np.concatenate([[0], np.cumsum(nbn)])
    dense64 = None
    if not fits.all():
        dense64 = np.asarray(dense64_d)[: int(row_starts[-1])]
    out = []
    for r in range(len(nbn)):
        a_, b_ = int(row_starts[r]), int(row_starts[r + 1])
        if fits[r]:
            sl = dense32[a_:b_]
            out.append((sl[:, 2].astype(np.uint64),
                        base[r] + sl[:, 0].astype(np.uint64),
                        base[r] + sl[:, 1].astype(np.uint64)))
        else:
            sl = dense64[a_:b_]
            out.append((sl[:, 2], sl[:, 0], sl[:, 1]))
    return out


def _fetch_packed_bins(dense_d, nbn_d):
    """Fetch device-packed bins; returns per-row (counts, lowers, uppers)
    u64 array triplets (array views, no per-bin Python objects — tens of
    thousands of bins per plan make object churn a measurable host cost)."""
    nbn = np.asarray(nbn_d)
    total = int(nbn.sum())
    dense = np.asarray(dense_d)[:total] if total else np.zeros((0, 3), np.uint64)
    out = []
    pos = 0
    for r in range(len(nbn)):
        k = int(nbn[r])
        out.append((dense[pos : pos + k, 2], dense[pos : pos + k, 0],
                    dense[pos : pos + k, 1]))
        pos += k
    return out


_PALLAS_SORT = bool(int(__import__("os").environ.get("PCODEC_PALLAS_SORT", "1")))


def _sort_u32_rows(rel):
    """u32 row sort for the stage-1 sample candidates. On TPU, rows up to
    pallas_sort.MAX_M sort in a VMEM-resident Pallas bitonic network (the
    whole O(log^2 m) comparator network touches HBM twice instead of once
    per stage — measured A/B in NOTES.md); everywhere else (CPU tests,
    huge rows) lax.sort. Both produce identical sorted values."""
    if _PALLAS_SORT and rel.shape[1] <= 1 << 16:
        from pcodec_tpu.ops import pallas_sort

        try:
            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        except Exception:  # pragma: no cover
            on_tpu = False
        if on_tpu:
            return pallas_sort.sort_rows_u32(rel)
    return jax.lax.sort(rel, dimension=1, is_stable=False)


def _extracts_and_walk(sort_in, n_stored, nb_log, sort32=False):
    """Masked values (rows, m; pads = U64 MAX) -> sort -> quantile extracts
    -> device walk. Returns (counts u32, lowers u64, uppers u64, n_bins i32,
    fits u32), each (rows, nb) / (rows,). Mirrors _phase_delta_sort's
    extract construction.

    sort32: sort u32 keys relative to the row min when the row's real span
    fits 32 bits (sorted VALUES are identical, so the walk is exact);
    fits=0 rows carry garbage bins and must be redone with sort32=False.
    With sort32=False fits is all-ones."""
    nb = 1 << nb_log
    rows, m = sort_in.shape
    n_stored = n_stored.astype(jnp.int64)
    if sort32:
        vmin = jnp.min(sort_in, axis=1, keepdims=True)  # pads are U64_MAX
        is_pad_or_max = sort_in == U64_MAX
        realmax = jnp.max(
            jnp.where(is_pad_or_max, vmin, sort_in), axis=1, keepdims=True)
        n_max = jnp.sum(is_pad_or_max, axis=1).astype(jnp.int64)
        fits = (
            (realmax[:, 0] - vmin[:, 0] <= jnp.uint64(0xFFFFFFFE))
            & (n_max == (jnp.int64(m) - n_stored))
        )
        rel = jnp.where(
            is_pad_or_max, jnp.uint64(0xFFFFFFFF), sort_in - vmin
        ).astype(jnp.uint32)
        s = _sort_u32_rows(rel)
        rec = lambda x: vmin[:, 0][:, None] + x.astype(jnp.uint64)
    else:
        fits = jnp.ones((rows,), bool)
        s = jax.lax.sort(sort_in, dimension=1, is_stable=False)
        rec = lambda x: x
    j = jnp.arange(nb, dtype=jnp.int64)[None, :]
    ccp = ((j + 1) * n_stored[:, None] + nb - 1) >> nb_log
    eidx = jnp.clip(ccp - 1, 0, jnp.maximum(n_stored[:, None] - 1, 0)).astype(jnp.int32)
    v = jnp.take_along_axis(s, eidx, axis=1)
    # ranks of the extracts: the extracts come FROM s, so searchsorted
    # left/right == first/last occurrence of the value at eidx — two
    # run-boundary cumulative scans + a 256-wide gather instead of the
    # vmapped binary search (measured ~55 ms at (192, 20736) on v5e)
    col_i = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    bnd_l = jnp.concatenate(
        [jnp.ones((rows, 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    first_idx = jax.lax.cummax(jnp.where(bnd_l, col_i, 0), axis=1)
    bnd_r = jnp.concatenate(
        [s[:, 1:] != s[:, :-1], jnp.ones((rows, 1), bool)], axis=1)
    last_idx = jax.lax.cummin(
        jnp.where(bnd_r, col_i, jnp.int32(0x7FFFFFFF)), axis=1, reverse=True)
    left = jnp.take_along_axis(first_idx, eidx, axis=1)
    right = jnp.take_along_axis(last_idx, eidx, axis=1).astype(jnp.int64) + 1
    right = jnp.minimum(right, n_stored[:, None])
    sl1 = jnp.take_along_axis(s, jnp.maximum(left - 1, 0).astype(jnp.int32), axis=1)
    sr_idx = jnp.clip(jnp.minimum(right, n_stored[:, None] - 1), 0, s.shape[1] - 1)
    sr = jnp.take_along_axis(s, sr_idx.astype(jnp.int32), axis=1)
    co, lo, up, nbn = _walk_bins_device(
        rec(v), left.astype(jnp.int64), right, rec(sl1), rec(sr),
        rec(s[:, 0:1])[:, 0], n_stored, nb_log, max_n=s.shape[1]
    )
    return co.astype(jnp.uint32), lo, up, nbn, fits.astype(jnp.uint32)


@partial(jax.jit, static_argnames=(
    "n_chunks", "m_max", "max_order", "nb_log", "lat_bits", "window_n_log",
    "cands", "has_bases", "min_order", "f_params", "pack32", "sort32",
    "uniform"))
def _phase_delta_candidates(delta_s, starts, lens, n_chunks, m_max, max_order,
                            nb_log, lat_bits, window_n_log,
                            cands="orders+lookback", bases=None, has_bases=False,
                            min_order=0, fmult_invb=None, f_params=None,
                            pack32=False, sort32=False, uniform=False):
    """Histogram bins for auto-delta candidates, reduced on device.

    cands selects the candidate rows: "orders" = noop + consecutive
    min_order..max_order; "orders+lookback" adds the lookback primary
    deltas + lookback values; "lookback" computes ONLY the two lookback
    rows (no consecutive cascade). The host runs the reference decision
    (chunk_compressor.rs:341-395) from the bins alone. The production plan
    uses cands="orders" in stage 1 and, for the chunks whose noop
    cost clears the lookback penalty, a second cands="lookback" dispatch
    (just the chooser scan + the two lookback rows, no consecutive
    cascade): the host computes the lookback cost from those bins via
    sample_cost_from_unopt — identical float math to
    lookback_cost_from_sample — so the big delta-sample transfer never
    leaves the device (PCODEC_LB_HOST=1 restores the host-sample A/B
    path). Lookback-winning chunks route to the host pipeline anyway."""
    assert cands in ("orders", "orders+lookback", "lookback"), cands
    pos = jnp.arange(m_max, dtype=jnp.int32)[None, :]
    if uniform:
        # the chunks' samples are a contiguous equal-length partition of
        # delta_s (host-checked): a dynamic slice + reshape instead of the
        # (n_chunks, m_max) per-element gather (~35 M lookups/s on TPU,
        # ~40 ms at 64M — NOTES.md)
        sm = jax.lax.dynamic_slice_in_dim(
            delta_s, starts[0].astype(jnp.int32), n_chunks * m_max
        ).reshape(n_chunks, m_max)
        valid = jnp.ones(sm.shape, bool)
    else:
        idx = jnp.clip(starts[:, None] + pos, 0, delta_s.shape[0] - 1)
        valid = pos < lens[:, None]
        sm = jnp.where(valid, delta_s[idx], jnp.uint64(0))
    if f_params is not None:
        # FloatMult chunks decide delta on the PRIMARY latents (softfloat
        # split); invb bits 0 = not a FloatMult chunk (inv_base is normal)
        W, E, P = f_params
        prim = softfloat.float_mult_primary(sm, fmult_invb[:, None], W, E, P)
        sm = jnp.where(fmult_invb[:, None] != 0, prim, sm)
    if has_bases:
        # IntMult chunks decide delta on the PRIMARY latents (latent // base,
        # ref: chunk_compressor.rs:408-418 via SplitLatents); base 1 = classic
        sm = sm // jnp.maximum(bases, jnp.uint64(1))[:, None]
    mask = jnp.uint64((1 << lat_bits) - 1) if lat_bits < 64 else None
    mid = jnp.uint64(1) << jnp.uint64(lat_bits - 1)
    lens64 = lens.astype(jnp.int64)

    def toggle(x):
        t = x + mid
        return t & mask if mask is not None else t

    rows = []
    n_stored_rows = []
    col = jax.lax.broadcasted_iota(jnp.int32, sm.shape, 1)
    if cands != "lookback":
        if min_order == 0:
            # noop: raw sample values
            rows.append(jnp.where(valid, sm, U64_MAX))
            n_stored_rows.append(lens64)
        # consecutive orders (iterative wrapping diffs, junk fronts excluded)
        out = sm
        for o in range(max_order):
            diff = out - jnp.roll(out, 1, axis=1)
            if mask is not None:
                diff = diff & mask
            out = jnp.where(col > o, diff, out)
            k = o + 1
            if k < min_order:
                continue  # the diff cascade still runs; only sorts are skipped
            vals = toggle(out)
            rows.append(jnp.where((col >= k) & valid, vals, U64_MAX))
            n_stored_rows.append(jnp.maximum(lens64 - k, 0))
    # lookback: chooser + primary deltas + the lookback latent var
    if cands == "orders":
        n_cand = len(rows)
        sort_in = jnp.stack(rows, axis=1).reshape(n_chunks * n_cand, m_max)
        n_stored = jnp.stack(n_stored_rows, axis=1).reshape(n_chunks * n_cand)
        co, lo, up, nbn, sfits = _extracts_and_walk(
            sort_in, n_stored, nb_log, sort32=sort32)
        if pack32:
            d32, base, fits = _pack_bins_dense32(co, lo, up, nbn)
            return (d32, base, fits, _pack_bins_dense(co, lo, up, nbn),
                    sfits), nbn
        return _pack_bins_dense(co, lo, up, nbn), nbn
    lbs = _choose_lookbacks_device(sm, lens, lat_bits, window_n_log, 1)
    lb_full = jnp.concatenate(
        [jnp.ones((n_chunks, 1), jnp.int32), lbs], axis=1
    )  # lookback for position i (junk at 0)
    src = jnp.take_along_axis(
        sm, jnp.clip(col - lb_full, 0, m_max - 1).astype(jnp.int32), axis=1
    )
    lb_delta = sm - src
    if mask is not None:
        lb_delta = lb_delta & mask
    rows.append(jnp.where((col >= 1) & valid, toggle(lb_delta), U64_MAX))
    n_stored_rows.append(jnp.maximum(lens64 - 1, 0))
    lb_vals = jnp.concatenate(
        [lbs.astype(jnp.uint64), jnp.zeros((n_chunks, 1), jnp.uint64)], axis=1
    )
    rows.append(jnp.where(col < (lens64 - 1)[:, None], lb_vals, U64_MAX))
    n_stored_rows.append(jnp.maximum(lens64 - 1, 0))

    n_cand = len(rows)  # orders+lookback: max_order + 3; lookback: 2
    sort_in = jnp.stack(rows, axis=1).reshape(n_chunks * n_cand, m_max)
    n_stored = jnp.stack(n_stored_rows, axis=1).reshape(n_chunks * n_cand)
    co, lo, up, nbn, _ = _extracts_and_walk(sort_in, n_stored, nb_log)
    return _pack_bins_dense(co, lo, up, nbn), nbn


@partial(jax.jit, static_argnames=(
    "n_chunks", "rows_per_chunk", "page_n", "lat_bits", "wnl", "state_n",
    "nb_log"))
def _phase_lookback(lat2d_sel, rowlen_sel, nreal_prim, nreal_lb,
                    n_chunks, rows_per_chunk, page_n, lat_bits, wnl, state_n,
                    nb_log):
    """Full-chunk lookback delta ENCODE on device for split-free chunks.

    Per page row: the 16-candidate chooser picks lookbacks (bit-identical
    to the native chooser), deltas are value - value[i - lb] center-toggled
    (ref: delta/lookback.rs:166-198 / delta/encode.py lookback_encode), and
    per-chunk quantile walks bin BOTH latent vars (toggled primary deltas;
    the u32 lookback var). Pages are the parallel lanes — the whole chunk
    encodes in one dispatch.

    Returns (prim_rows, lb_rows, states, dense_p, nbn_p, dense_d, nbn_d):
    prim_rows (rows, page_n) u64 toggled deltas with a state_n junk front;
    lb_rows (rows, page_n) u64 lookbacks from column 0 (page_n - state_n
    real per full page); states (rows, state_n) u64 raw page-front latents
    (page metadata delta state); dense/nbn pairs are packed walk bins per
    chunk for the primary and lookback vars."""
    rows = lat2d_sel
    lens = rowlen_sel.astype(jnp.int32)
    lbs = _choose_lookbacks_device(rows, lens, lat_bits, wnl, state_n)
    col = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    lb_full = jnp.concatenate(
        [jnp.ones((rows.shape[0], state_n), jnp.int32), lbs], axis=1
    )
    src = jnp.take_along_axis(
        rows, jnp.clip(col - lb_full, 0, page_n - 1), axis=1
    )
    mask = jnp.uint64((1 << lat_bits) - 1) if lat_bits < 64 else None
    mid = jnp.uint64(1) << jnp.uint64(lat_bits - 1)
    delta = rows - src
    toggled = delta + mid
    if mask is not None:
        toggled = toggled & mask
    body = (col >= state_n) & (col < lens[:, None])
    prim_rows = jnp.where(body, toggled, rows)
    prim_sort = jnp.where(body, toggled, jnp.uint64(U64_MAX))
    lb_u64 = jnp.pad(lbs.astype(jnp.uint64), ((0, 0), (0, state_n)))
    lb_body = col < jnp.maximum(lens - state_n, 0)[:, None]
    lb_rows = jnp.where(lb_body, lb_u64, jnp.uint64(0))
    lb_sort = jnp.where(lb_body, lb_u64, jnp.uint64(U64_MAX))
    states = rows[:, :state_n]

    co_p, lo_p, up_p, nbn_p, _ = _extracts_and_walk(
        prim_sort.reshape(n_chunks, rows_per_chunk * page_n), nreal_prim, nb_log
    )
    co_d, lo_d, up_d, nbn_d, _ = _extracts_and_walk(
        lb_sort.reshape(n_chunks, rows_per_chunk * page_n), nreal_lb, nb_log
    )
    return (prim_rows, lb_rows, states,
            _pack_bins_dense(co_p, lo_p, up_p, nbn_p), nbn_p,
            _pack_bins_dense(co_d, lo_d, up_d, nbn_d), nbn_d)


@partial(jax.jit, static_argnames=("n_chunks", "rows_per_chunk", "page_n",
                                   "nb_log", "lat_bits", "f_params"))
def _phase_secondary(lat2d, row_sel, base_row, flip_row, rowlen, n_stored,
                     n_chunks, rows_per_chunk, page_n, nb_log, lat_bits=64,
                     fmult_invb_row=None, fmult_base_row=None, f_params=None):
    """Secondary (adjustment) latents for the selected chunk rows: page rows
    for the EB kernels plus the unoptimized-histogram walk bins (NOOP delta
    — all positions stored, no junk fronts). IntMult secondary =
    latent % base; FloatQuant secondary = low bits with the negative-sign
    flip (flip_row set, base = 2^k; ref: mode/float_quant.rs split — the
    float is negative exactly when its ordered latent < mid); FloatMult
    secondary = the softfloat adjustment (invb bits != 0 selects it,
    base_row is 1 there).

    row_sel (n_chunks*rows_per_chunk,) i32: page-row indices into lat2d.
    base_row: base per selected row (>= 2). flip_row: bool per selected
    row. rowlen: real numbers per selected row. n_stored (n_chunks,):
    chunk sizes (histogram population).
    """
    lat = lat2d[row_sel]
    base = jnp.maximum(base_row, jnp.uint64(1))[:, None]
    sec = lat % base
    mid = jnp.uint64(1 << (lat_bits - 1))
    neg_flip = flip_row[:, None] & (lat < mid)
    sec = jnp.where(neg_flip, (base - jnp.uint64(1)) - sec, sec)
    if f_params is not None:
        W, E, P = f_params
        invb = fmult_invb_row[:, None]
        prim = softfloat.float_mult_primary(lat, invb, W, E, P)
        adj = softfloat.float_mult_adjustment(
            lat, prim, fmult_base_row[:, None], W, E, P)
        sec = jnp.where(invb != 0, adj, sec)
    col = jax.lax.broadcasted_iota(jnp.int32, sec.shape, 1)
    live = col < rowlen[:, None]
    sort_in = jnp.where(live, sec, U64_MAX).reshape(
        n_chunks, rows_per_chunk * page_n
    )
    co, lo, up, nbn, _ = _extracts_and_walk(
        sort_in, n_stored.astype(jnp.int64), nb_log
    )
    return sec, _pack_bins_dense(co, lo, up, nbn), nbn


@partial(jax.jit, static_argnames=("nb_log", "max_n"))
def _phase_walk(V, L, R, SL1, SR, S0, nreal, sel, nb_log, sort_fits=None,
                max_n=None):
    """Walk selected chunk lanes at one nb_log; extracts stay device-side.
    Returns (packed u32 buffer [n_bins (lanes) | base lo32 | base hi32 |
    fits | dense32 (cap, 3) flat] — one small fetch through the MB/s
    tunnel — and the exact u64 dense packing, fetched only for rows whose
    bin span overflows 32 bits)."""
    nbg = 1 << nb_log
    co, lo, up, nbn = _walk_bins_device(
        V[sel, :nbg], L[sel, :nbg], R[sel, :nbg], SL1[sel, :nbg],
        SR[sel, :nbg], S0[sel], nreal[sel], nb_log, max_n=max_n,
    )
    co = co.astype(jnp.uint32)
    d32, base, fits = _pack_bins_dense32(co, lo, up, nbn)
    m32 = jnp.uint64(0xFFFFFFFF)
    sf = (jnp.ones((sel.shape[0],), jnp.uint32) if sort_fits is None
          else sort_fits[sel].astype(jnp.uint32))
    buf = jnp.concatenate([
        nbn.astype(jnp.uint32), (base & m32).astype(jnp.uint32),
        (base >> jnp.uint64(32)).astype(jnp.uint32), fits, sf,
        d32.reshape(-1),
    ])
    return buf, _pack_bins_dense(co, lo, up, nbn)


STAGE1_ORDERS = 2  # candidate orders evaluated in the fused first dispatch


@partial(jax.jit, static_argnames=(
    "kind", "mid", "total_rows", "page_n", "int_auto", "gcd_m_max",
    "cand_meta", "lat_bits", "fetch_mode_s", "sort32"))
def _phase_stage1(nums_dev, mode_idx, delta_idx, gcd_starts, gcd_lens,
                  cand_starts, cand_lens, kind, mid, total_rows, page_n,
                  int_auto, gcd_m_max, cand_meta, lat_bits,
                  fetch_mode_s=False, sort32=False):
    """One fused dispatch for everything the first host round trip needs:
    bijection + sample gathers, IntMult GCD screening, and the stage-1
    auto-delta candidate histograms (orders 0..STAGE1_ORDERS — the chain
    breaks there for almost all chunks; later orders run in a rare second
    dispatch). Returns (lat2d kept on device, mode_s kept on device,
    packed u64 fetch buffer).

    The packed buffer layout (all u64): [gcd vals | gcd cnts | gcd nuniq]
    (int_auto only) + per cand group [nbn | dense bins] + [delta_s]
    (+ [mode_s] when fetch_mode_s — float auto bids read it on the host).
    cand_meta: static tuple of (n_chunks, m_max, nb_log) per group."""
    lat2d, mode_s, delta_s = _phase_latents(
        nums_dev, mode_idx, delta_idx, kind=kind, mid=mid,
        total_rows=total_rows, page_n=page_n,
    )
    m32 = jnp.uint64(0xFFFFFFFF)

    def _split64(x):
        return [(x & m32).astype(jnp.uint32),
                (x >> jnp.uint64(32)).astype(jnp.uint32)]

    parts = []
    d64_handles = []
    if int_auto:
        vals, cnts, nuniq = _phase_int_gcd(
            mode_s, gcd_starts, gcd_lens,
            n_chunks=gcd_starts.shape[0], m_max=gcd_m_max, k=_GCD_K,
        )
        parts += _split64(vals.reshape(-1).astype(jnp.uint64))
        parts += [cnts.astype(jnp.uint32).reshape(-1),
                  nuniq.astype(jnp.uint32)]
    pos = 0
    for (g_n, g_m, g_nb, g_uni) in cand_meta:
        (d32, gbase, gfits, d64, sfits), nbn = _phase_delta_candidates(
            delta_s, cand_starts[pos : pos + g_n], cand_lens[pos : pos + g_n],
            n_chunks=g_n, m_max=g_m, max_order=STAGE1_ORDERS,
            nb_log=g_nb, lat_bits=lat_bits, window_n_log=4,
            cands="orders", pack32=True, sort32=sort32, uniform=g_uni,
        )
        parts += [nbn.astype(jnp.uint32)] + _split64(gbase) + [
            gfits, sfits, d32.reshape(-1)]
        d64_handles.append(d64)
        pos += g_n
    if fetch_mode_s:
        parts += _split64(mode_s)
    small = (
        jnp.concatenate(parts) if parts else jnp.zeros(0, jnp.uint32)
    )
    # delta_s is ~n/50 latents (the big transfer) and is only consumed by
    # the host lookback evaluator — returned separately so its fetch can
    # run in a worker thread while the host makes the chain decisions
    return lat2d, mode_s, delta_s, small, tuple(d64_handles)


def _dispatch_phase2_impl(ctx, orders_a, live_a, bases_map,
                          flip_cis=frozenset(), fmult_map=None, sort32=False):
    """Dispatch phase B (delta + sort + extracts) + the secondary-var
    phase (IntMult % base / FloatQuant low-bit flip / FloatMult softfloat
    adjustment) + the phase-C walk from a (orders, live set, bases, flips,
    fmult) decision vector. Called twice per plan at most: speculatively
    from the previous plan's decisions (_SPEC_HINTS — its compute overlaps
    the decision round trip) and for real when the speculation missed;
    results are only ever consumed when the real decisions match the
    vector used here. fmult_map: ci -> (inv_base bits, base bits)."""
    (ubls, chunk_ns, pages_per_chunk, rows_per_chunk, total_rows, page_n,
     n_chunks, lat2d, rowlen, lat_bits, f_params) = ctx
    fmult_map = fmult_map or {}
    NB = 1 << int(ubls.max()) if n_chunks else 1
    order_row = np.repeat(orders_a, rows_per_chunk).astype(np.int32)
    nreal = np.zeros(n_chunks, dtype=np.int64)
    extract_idx = np.zeros((n_chunks, NB), dtype=np.int64)
    for ci2, cn2 in enumerate(chunk_ns):
        if not live_a[ci2]:
            continue
        nr = cn2 - int(orders_a[ci2]) * len(pages_per_chunk[ci2])
        nreal[ci2] = nr
        nb = 1 << int(ubls[ci2])
        j = np.arange(nb, dtype=np.int64)
        cc_pos = ((j + 1) * nr + nb - 1) >> int(ubls[ci2])
        extract_idx[ci2, :nb] = np.minimum(cc_pos - 1, max(nr - 1, 0))
    base_kw = {}
    if bases_map:
        base_row = np.ones(total_rows, dtype=np.uint64)
        for ci_b, b in bases_map.items():
            base_row[ci_b * rows_per_chunk : (ci_b + 1) * rows_per_chunk] = b
        base_kw = dict(base_row=jnp.asarray(base_row), has_bases=True)
    invb_row_np = None
    fbase_row_np = None
    if fmult_map:
        invb_row_np = np.zeros(total_rows, dtype=np.uint64)
        fbase_row_np = np.zeros(total_rows, dtype=np.uint64)
        for ci_f, (invb_b, base_b) in fmult_map.items():
            sl = slice(ci_f * rows_per_chunk, (ci_f + 1) * rows_per_chunk)
            invb_row_np[sl] = invb_b
            fbase_row_np[sl] = base_b
        base_kw = dict(
            base_kw, fmult_invb_row=jnp.asarray(invb_row_np),
            f_params=f_params,
        )
    (dev_rows, moments_dev, V, L, R, SL1, SR, S0,
     sort_fits_d) = _phase_delta_sort(
        lat2d,
        jnp.asarray(order_row),
        jnp.asarray(rowlen),
        jnp.asarray(nreal),
        jnp.asarray(extract_idx),
        max_order=int(orders_a.max()) if n_chunks else 0,
        n_chunks=n_chunks,
        rows_per_chunk=rows_per_chunk,
        page_n=page_n,
        lat_bits=lat_bits,
        sort32=sort32,
        **base_kw,
    )

    # secondary-var phase for device IntMult / FloatQuant / FloatMult chunks
    sec_handles = []
    sec_row_of: Dict[int, int] = {}
    sec_rows_dev = None
    im_live = [ci2 for ci2 in range(n_chunks)
               if (ci2 in bases_map or ci2 in fmult_map) and live_a[ci2]]
    if im_live:
        by_ubl_sec: Dict[int, list] = {}
        for ci2 in im_live:
            ubl_sec = min(int(ubls[ci2]), c.LIMITED_UNOPTIMIZED_BINS_LOG)
            by_ubl_sec.setdefault(ubl_sec, []).append(ci2)
        sec_parts = []
        row_base = 0
        for ubl_sec, cis in by_ubl_sec.items():
            rows_idx = np.concatenate([
                np.arange(ci2 * rows_per_chunk, (ci2 + 1) * rows_per_chunk)
                for ci2 in cis
            ]).astype(np.int32)
            base_sel = np.repeat(
                np.array([bases_map.get(ci2, 1) for ci2 in cis], np.uint64),
                rows_per_chunk,
            )
            flip_sel = np.repeat(
                np.array([ci2 in flip_cis for ci2 in cis], bool),
                rows_per_chunk,
            )
            fm_kw = {}
            if any(ci2 in fmult_map for ci2 in cis):
                fm_kw = dict(
                    fmult_invb_row=jnp.asarray(np.repeat(np.array(
                        [fmult_map.get(ci2, (0, 0))[0] for ci2 in cis],
                        np.uint64), rows_per_chunk)),
                    fmult_base_row=jnp.asarray(np.repeat(np.array(
                        [fmult_map.get(ci2, (0, 0))[1] for ci2 in cis],
                        np.uint64), rows_per_chunk)),
                    f_params=f_params,
                )
            ns = np.array([chunk_ns[ci2] for ci2 in cis], np.int64)
            rows_d, dense_d, nbn_d = _phase_secondary(
                lat2d, jnp.asarray(rows_idx), jnp.asarray(base_sel),
                jnp.asarray(flip_sel),
                jnp.asarray(rowlen[rows_idx]), jnp.asarray(ns),
                n_chunks=len(cis), rows_per_chunk=rows_per_chunk,
                page_n=page_n, nb_log=ubl_sec, lat_bits=lat_bits, **fm_kw,
            )
            sec_parts.append(rows_d)
            sec_handles.append((cis, dense_d, nbn_d))
            for k, ci2 in enumerate(cis):
                sec_row_of[ci2] = row_base + k * rows_per_chunk
            row_base += len(cis) * rows_per_chunk
        sec_rows_dev = (
            jnp.concatenate(sec_parts, axis=0)
            if len(sec_parts) > 1 else sec_parts[0]
        )

    # phase C: the quantile walk (fetch deferred)
    hist_handles = []
    by_ubl: Dict[int, list] = {}
    for ci2 in range(n_chunks):
        if live_a[ci2]:
            by_ubl.setdefault(int(ubls[ci2]), []).append(ci2)
    for ubl_val, lanes in by_ubl.items():
        buf_w, d64_w = _phase_walk(
            V, L, R, SL1, SR, S0, jnp.asarray(nreal),
            jnp.asarray(np.array(lanes, dtype=np.int32)), nb_log=ubl_val,
            sort_fits=sort_fits_d, max_n=int(max(chunk_ns)),
        )
        hist_handles.append((lanes, buf_w, d64_w))
    return {
        "dev_rows": dev_rows, "moments_dev": moments_dev, "nreal": nreal,
        "sec_handles": sec_handles, "sec_row_of": sec_row_of,
        "sec_rows_dev": sec_rows_dev, "hist_handles": hist_handles,
        "sort32": sort32, "sort_fits_d": sort_fits_d,
    }


# ---------------------------------------------------------------------------
# host histogram walk from device extracts
# ---------------------------------------------------------------------------


def histogram_from_extracts(n, n_bins_log, V, L, R, SL1, SR, s0, slast):
    """The histogram quantile walk (ref: histograms.rs:132-206) driven by the
    device-extracted quantile values and run extents instead of the sorted
    array. Produces exactly histogram(latents, n_bins_log)."""
    if n == 0:
        return []
    try:
        from pcodec_tpu.native import kernels as _nk
    except Exception:
        _nk = None
    if _nk is not None:
        counts, lowers, uppers = _nk.histogram_walk(
            int(n), int(n_bins_log), V, L, R, SL1, SR, int(s0), int(slast)
        )
        return [
            HistogramBin(int(cc), int(lo), int(up))
            for cc, lo, up in zip(counts.tolist(), lowers.tolist(), uppers.tolist())
        ]
    b = _Builder(n, n_bins_log)
    pos = 0
    cur_lower = int(s0)
    while pos < n:
        j = b.bin_idx(b.n_applied)
        tcc = b.c_count(j)
        ti = tcc - pos
        if ti >= n - pos:
            b.apply_incomplete(n - pos, cur_lower, int(slast))
            if ti == n - pos:
                b.complete_bin(j)
            break
        tx = int(V[j])
        l = max(int(L[j]), pos)
        r = int(R[j])
        if l > pos:
            b.apply_incomplete(l - pos, cur_lower, int(SL1[j]))
        b.apply_constant_run(r - l, tx)
        pos = r
        cur_lower = int(SR[j])
    return b.dst


# ---------------------------------------------------------------------------
# the device-train planner
# ---------------------------------------------------------------------------


@dataclass
class DeviceChunkTrain:
    ci: int
    cc: object  # ChunkCompressor (lvc.latents is None)
    order: int
    row_start: int  # first page row of this chunk in the padded row array
    n_pages: int


def _cost_from_native_stats(per_var, delta_encoding, number_lt, cap):
    """sample_cost_from_unopt's cost layer over native candidate stats
    (pco_delta_cand_stats slots). per_var: [(key, slot_1d, n_stored)]. The
    float ops, dtypes and summation path are identical to
    codec/compress.py sample_cost_from_unopt, so decisions match the host
    pipeline exactly."""
    from pcodec_tpu.format.metadata import MAX_DELTA_ENCODING_BIT_SIZE

    meta_bits = c.BITS_TO_ENCODE_MODE_VARIANT + MAX_DELTA_ENCODING_BIT_SIZE
    page_meta_bits = 0
    body_bits = 0
    for key, slot, n_stored in per_var:
        var_lt = U32 if key == "delta" else number_lt
        n_bins = int(slot[0])
        asl = int(slot[1])
        if n_stored == 0 or n_bins == 0:
            n_bins, asl, avg = 0, 0, 0.0
        else:
            w = slot[2 : 2 + n_bins]
            ob = slot[2 + cap : 2 + cap + n_bins]
            warr = w.astype(np.float64)
            ans_bits = asl - np.log2(warr)
            avg = float(np.sum(
                (ans_bits + ob.astype(np.uint32)) * warr / float(1 << asl)
            ))
        meta_bits += (
            c.BITS_TO_ENCODE_ANS_SIZE_LOG
            + c.BITS_TO_ENCODE_N_BINS
            + n_bins * (asl + var_lt.bits + var_lt.offset_bits_bits)
        )
        de_v = delta_encoding.for_latent_var(key)
        page_meta_bits += (asl * c.ANS_INTERLEAVING
                           + var_lt.bits * de_v.n_latents_per_state())
        body_bits += int(np.ceil(n_stored * avg * 1.0))
    return float(
        (meta_bits + 7) // 8 + (page_meta_bits + 7) // 8 + (body_bits + 7) // 8
    )


_STAGE1_NATIVE_ORDERS = 3  # orders 0..3 eagerly; 4..7 fetched when unbroken


def _native_auto_delta_batch(samples, chunk_ns, ubls, plt, _nk):
    """choose_auto_delta_encoding_from_sample for every chunk at once: the
    expensive per-candidate stats (delta encode, sort, histogram, DP
    partitioning, ANS quantization) run in one multithreaded native call;
    this layer reproduces the decision sequence (noop -> lookback when the
    noop cost clears the penalty -> ascending orders with the convex
    break) with the same float math."""
    n_chunks = len(samples)
    sn = np.asarray([len(s) for s in samples], np.int64)
    soff = np.concatenate([[0], np.cumsum(sn)[:-1]]).astype(np.int64)
    flat = np.concatenate([s.astype(np.uint64) for s in samples])
    ubls_a = np.asarray(ubls, np.int32)
    obb = plt.offset_bits_bits
    mo = c.MAX_CONSECUTIVE_DELTA_ORDER

    stats, cap = _nk.delta_cand_stats(
        flat, soff, sn, plt.bits, obb, ubls_a, 0, _STAGE1_NATIVE_ORDERS)
    wnls = np.asarray(
        [cmp.new_lookback(int(m)).window_n_log for m in sn], np.int32)
    lb_stats, _ = _nk.delta_cand_stats(
        flat, soff, sn, plt.bits, obb, ubls_a, -1, -1, wnls=wnls)
    hi_stats = None

    out = {}
    for ci in range(n_chunks):
        n_s = int(sn[ci])
        best = DeltaEncoding.noop()
        best_cost = _cost_from_native_stats(
            [("primary", stats[ci, 0], n_s)], best, plt, cap)
        pen = cmp.LOOKBACK_REQUIRED_BYTE_SAVINGS_PER_N * n_s
        if best_cost > pen:
            lb_s = cmp.new_lookback(n_s)
            n_lb = max(n_s - lb_s.state_n, 0)
            lb_cost = _cost_from_native_stats(
                [("delta", lb_stats[ci, 0], n_lb),
                 ("primary", lb_stats[ci, 1], n_lb)], lb_s, plt, cap) + pen
            if lb_cost < best_cost:
                best = cmp.new_lookback(int(chunk_ns[ci]))
                best_cost = lb_cost
        for order in range(1, mo + 1):
            if order <= _STAGE1_NATIVE_ORDERS:
                slot = stats[ci, order]
            else:
                if hi_stats is None:
                    hi_stats, _ = _nk.delta_cand_stats(
                        flat, soff, sn, plt.bits, obb, ubls_a,
                        _STAGE1_NATIVE_ORDERS + 1, mo)
                slot = hi_stats[ci, order - _STAGE1_NATIVE_ORDERS - 1]
            enc = DeltaEncoding.consecutive(order)
            cost = _cost_from_native_stats(
                [("primary", slot, max(n_s - order, 0))], enc, plt, cap)
            if cost < best_cost:
                best = enc
                best_cost = cost
            else:
                break
        out[ci] = best
    return out


def plan_encode_device(nums, config: Optional[ChunkConfig],
                       page_n: int, chunk_n: int, extras: Optional[dict] = None,
                       nums_host: Optional[np.ndarray] = None,
                       dev_bits=None):
    """Device-train drop-in for pallas_encode._plan_encode. Returns
    (nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows) or None when the
    configuration isn't covered (caller falls back to the host planner).

    extras (optional dict): filled with device handles the file-image
    assembler (ops/assemble.py) needs beyond the launch jobs —
    moments_dev (per page row delta states, still on device) and
    rows_per_chunk (the device row pitch).

    nums may be a numpy array or an already-device-resident jax array
    (production pipelines keep data in HBM; only samples come back).
    dev_rows: (total_rows, page_n) u64 device array of page-delta'd latents
    (junk fronts intact); jobs carry (row_start, n_pages, order) so the
    launch builder can slice it without another host round trip.
    """
    from pcodec_tpu.codec import container as ctn
    from pcodec_tpu.dtypes import number_type_from_np
    from pcodec_tpu.ops.pallas_encode import build_enc_tables

    import time as _time
    _t0 = _time.time()
    config = config or ChunkConfig()
    nt = number_type_from_np(np.dtype(nums.dtype))
    config.validate(nt.latent)
    n = len(nums)
    if not device_train_supported(nt, config, n, page_n):
        return None
    chunk_ns = ctn._exact_split(n, chunk_n)
    n_chunks = len(chunk_ns)
    rows_per_chunk = -(-chunk_n // page_n)
    if chunk_n % page_n or rows_per_chunk % 256:
        return None
    total_rows = n_chunks * rows_per_chunk

    # ---- per-row bookkeeping (host) ----
    rowlen = np.zeros(total_rows, dtype=np.int32)
    row = 0
    pages_per_chunk: List[List[int]] = []
    for cn in chunk_ns:
        per = ctn._exact_split(cn, page_n)
        pages_per_chunk.append(per)
        rowlen[row : row + len(per)] = per
        row += rows_per_chunk
    if any(p[-1] <= c.MAX_CONSECUTIVE_DELTA_ORDER for p in pages_per_chunk):
        return None  # degenerate ragged tail; host path handles it

    # ---- deterministic sample indices (uniform chunks share them) ----
    level = config.compression_level
    lt = nt.latent
    if nt.kind == "float":
        # the device only ever needs the raw BITS (bijection/keep are integer
        # ops) and the TPU x64 rewriter can't bitcast f64 -> u64 on device.
        # dev_bits: caller-held device copy of nums.view(int) — production
        # pipelines keep the bits in HBM; without it every plan re-uploads
        # the whole array through the MB/s tunnel
        idt = {16: np.int16, 32: np.int32, 64: np.int64}[lt.bits]
        if dev_bits is not None:
            if dev_bits.dtype != jnp.dtype(idt) or dev_bits.shape != (n,):
                return None
            nums_dev = dev_bits
            if nums_host is None and isinstance(nums, np.ndarray):
                nums_host = nums
        elif isinstance(nums, np.ndarray):
            nums_dev = jnp.asarray(nums.view(idt))
        else:
            return None  # device-resident float input without bits view
    else:
        nums_dev = jnp.asarray(nums)
    is_float_auto = nt.kind == "float" and config.mode_spec.kind == ModeSpec.AUTO

    # TRY_DICT: the mode split runs on device FIRST (_phase_dict); the rest
    # of the pipeline then trains on the u32 index latents exactly like a
    # Classic chunk (dict primary latent type is U32, ref: metadata/mode.rs:200)
    is_dict = config.mode_spec.kind == ModeSpec.TRY_DICT
    plt = lt  # primary latent type for decisions/bins (dict: U32)
    dict_uniq_dev = dict_small_d = None
    if is_dict:
        starts_np = np.concatenate([[0], np.cumsum(chunk_ns)[:-1]]).astype(np.int64)
        nums_dev, dict_uniq_dev, dict_small_d = _phase_dict(
            nums_dev, jnp.asarray(starts_np), kind=nt.kind, mid=int(lt.mid),
            n_chunks=n_chunks, dcap=min(n, _DICT_FETCH0),
        )
        plt = U32
        _t0 = _trace("dict split dispatch", _t0)

    if nums_host is None and isinstance(nums, np.ndarray):
        nums_host = nums

    # float mode sampling: accepted draws depend on per-draw keep flags
    # (normal floats below the sampling cap). With a host mirror (the
    # production setting) the draws, keeps, AND the sample VALUES all come
    # from host gathers — no draw-index upload (~10 MB at 48M through the
    # MB/s tunnel), no keep pre-pass round trip, and no mode-sample fetch.
    # Without a mirror the keep flags come from the device pre-pass.
    draws_cache: Dict[int, object] = {}
    keep_by_chunk: List[Optional[np.ndarray]] = [None] * n_chunks
    float_host_samples: Optional[List[Optional[np.ndarray]]] = None
    if is_float_auto:
        for cn in chunk_ns:
            if cn not in draws_cache:
                d0 = _DRAWS_CACHE.get(cn)
                if d0 is None:
                    d0 = sampling.sample_draws(cn)
                    if len(_DRAWS_CACHE) > 8:
                        _DRAWS_CACHE.clear()
                    _DRAWS_CACHE[cn] = d0
                draws_cache[cn] = d0
        mx = np.abs(np.asarray(cmp._max_for_sampling(nt), dtype=nt.np_dtype))
        max_bits = int(mx.view(lt.np_dtype))
        exp_mask = ((1 << (lt.bits - nt.precision_bits - 1)) - 1) << nt.precision_bits
    if is_float_auto and nums_host is not None:
        udt_h = {16: np.uint16, 32: np.uint32, 64: np.uint64}[lt.bits]
        bits_h = nums_host.view(udt_h)
        sign_h = udt_h(lt.mid)
        float_host_samples = [None] * n_chunks
        start = 0
        for ci2, cn in enumerate(chunk_ns):
            d = draws_cache[cn]
            if d is None:
                start += cn
                continue
            draws, is_first, target = d
            b = bits_h[draws + start]
            ab = b & udt_h(int(lt.mid) - 1)
            exp = b & udt_h(exp_mask)
            keep = (exp != 0) & (exp != udt_h(exp_mask)) & (ab <= udt_h(max_bits))
            keep_by_chunk[ci2] = keep
            # select_sample_indices' visited-set semantics, keeping the
            # accepted draws' VALUES too (b is parallel to draws)
            accepted = is_first & keep
            acc_count = np.cumsum(accepted)
            cut = int(np.searchsorted(acc_count, target, side="left")) + 1
            sel = accepted[:cut]
            if int(acc_count[min(cut, len(acc_count)) - 1]) >= sampling.MIN_SAMPLE:
                sb = b[:cut][sel]
                neg = (sb & sign_h) != 0
                lat_s = np.where(neg, ~sb, sb ^ sign_h)
                float_host_samples[ci2] = lat_s.astype(lt.np_dtype)
            start += cn
    elif is_float_auto:
        draw_idx_parts, draw_spans = [], []
        pos = 0
        start = 0
        for cn in chunk_ns:
            d = draws_cache[cn]
            ln = 0 if d is None else len(d[0])
            draw_spans.append((pos, ln))
            if ln:
                draw_idx_parts.append(d[0] + start)
            pos += ln
            start += cn
        if draw_idx_parts:
            keep_all = np.asarray(_phase_float_keep(
                nums_dev, jnp.asarray(np.concatenate(draw_idx_parts)),
                mid=int(lt.mid), exp_mask=exp_mask, max_bits=max_bits,
            ))
            for ci2 in range(n_chunks):
                a, m = draw_spans[ci2]
                keep_by_chunk[ci2] = keep_all[a : a + m] if m else None

    # Host-native decision fast path: when the caller holds the numbers in
    # host RAM (CLI/file encode, or a bench that owns the array — the same
    # setting as the reference encoder), the mode auction and delta choice
    # run on host SAMPLES with the native hot loops. The decision path then
    # moves zero tunnel bytes: the ~n/40 sample-index upload, the decision
    # buffer fetch, and the ~n/50 delta-sample fetch (measured 2026-08-19:
    # 0.40 s + 0.61 s of the 1.22 s warm train at 64M) all disappear.
    # Decisions call the HOST PIPELINE's own functions on identically
    # constructed samples, so outputs stay byte-identical.
    if nums_host is None and isinstance(nums, np.ndarray):
        nums_host = nums
    host_decide = (
        nums_host is not None and not is_dict and not is_float_auto
        and _HOST_DECIDE
    )

    bk_key = (tuple(chunk_ns), host_decide)
    bk = None if is_float_auto else _BK_CACHE.get(bk_key)
    if bk is None:
        idx_cache: Dict[int, np.ndarray] = {}
        dslice_cache: Dict[int, list] = {}
        mode_idx_parts, delta_idx_parts = [], []
        mode_spans, delta_spans = [], []
        start = 0
        for ci2, cn in enumerate(chunk_ns):
            if cn not in dslice_cache:
                dslice_cache[cn] = cmp.delta_sample_slices(
                    cn, cmp.DELTA_GROUP_SIZE, 1 + cn // cmp.N_PER_EXTRA_DELTA_GROUP
                )
            if is_float_auto:
                d = draws_cache[cn]
                mi = None
                if d is not None and keep_by_chunk[ci2] is not None:
                    mi = sampling.select_sample_indices(
                        d[0], d[1], d[2], keep_by_chunk[ci2]
                    )
                mi = mi if mi is not None else np.zeros(0, dtype=np.int64)
            else:
                if cn not in idx_cache:
                    mi0 = sampling.choose_sample_indices(cn)
                    idx_cache[cn] = mi0 if mi0 is not None else np.zeros(0, dtype=np.int64)
                mi = idx_cache[cn]
            if host_decide:
                # spans kept for shape bookkeeping; no device gathers built
                mode_spans.append((0, 0))
                dsl = dslice_cache[cn]
                delta_spans.append((0, sum(b - a for a, b in dsl)))
                start += cn
                continue
            mode_spans.append((sum(len(p) for p in mode_idx_parts), len(mi)))
            mode_idx_parts.append(mi + start)
            dsl = dslice_cache[cn]
            dn = sum(b - a for a, b in dsl)
            delta_spans.append((sum(len(p) for p in delta_idx_parts), dn))
            delta_idx_parts.append(
                np.concatenate([np.arange(a, b, dtype=np.int64) for a, b in dsl]) + start
            )
            start += cn
        mode_idx = np.concatenate(mode_idx_parts) if mode_idx_parts else np.zeros(0, np.int64)
        delta_idx = np.concatenate(delta_idx_parts) if delta_idx_parts else np.zeros(0, np.int64)
        if not is_float_auto:
            # everything above is a deterministic function of the layout
            # (~0.09 s of 1-core index building per 64M encode)
            if len(_BK_CACHE) > 8:
                _BK_CACHE.clear()
            _BK_CACHE[bk_key] = (idx_cache, dslice_cache, mode_spans,
                                 delta_spans, mode_idx, delta_idx)
    else:
        (idx_cache, dslice_cache, mode_spans, delta_spans,
         mode_idx, delta_idx) = bk

    # the IntMult screening runs on the host thread below whenever the
    # caller owns a host mirror; the device then never consumes mode_s, so
    # the ~n/40-element random gather (~45 ms device at 64M) is skipped by
    # uploading an empty mode index array
    host_gcd_early = (
        nt.kind != "float" and config.mode_spec.kind == ModeSpec.AUTO
        and nums_host is not None and not host_decide and not is_float_auto
    )

    # The sample index arrays are deterministic functions of the chunk layout
    # (~n/40 i64 indices = the dominant host->device upload); cache the
    # uploaded device copies across calls. Float-auto mode indices depend on
    # per-draw keep flags (data), so those upload fresh.
    ckey = (tuple(chunk_ns), page_n, host_gcd_early)
    cached = (None if (is_float_auto or host_decide)
              else _IDX_UPLOAD_CACHE.get(ckey))
    if cached is None:
        skip_mode_gather = host_gcd_early or float_host_samples is not None
        mode_idx_dev = jnp.asarray(
            np.zeros(0, np.int64) if skip_mode_gather else mode_idx)
        delta_idx_dev = jnp.asarray(delta_idx)
        if not (is_float_auto or host_decide):
            # host_decide uploads empty index arrays — never cache those
            # under the layout key a device-decide call would hit
            if len(_IDX_UPLOAD_CACHE) > 8:
                _IDX_UPLOAD_CACHE.clear()
            _IDX_UPLOAD_CACHE[ckey] = (mode_idx_dev, delta_idx_dev)
    else:
        mode_idx_dev, delta_idx_dev = cached

    _t0 = _trace("bookkeeping+indices", _t0)
    is_int_auto = nt.kind != "float" and config.mode_spec.kind == ModeSpec.AUTO
    is_delta_auto = config.delta_spec.kind == cmp.DeltaSpec.AUTO
    ubls = np.zeros(n_chunks, dtype=np.int32)
    for ci, cn in enumerate(chunk_ns):
        ubls[ci] = cmp.choose_unoptimized_bins_log(level, cn)
    mo = c.MAX_CONSECUTIVE_DELTA_ORDER
    n_cand1 = STAGE1_ORDERS + 1


    # ---- stage 1: ONE fused dispatch (bijection + gathers + IntMult GCD
    # screening + stage-1 delta candidates) and ONE packed fetch. Every
    # round trip through the tunnel costs ~30 ms of latency, so the plan is
    # structured around two device round trips total on the common path. ----
    gcd_starts = np.array([a for a, _ in mode_spans], np.int32)
    gcd_lens = np.array([m for _, m in mode_spans], np.int32)
    gcd_m_max = int(gcd_lens.max()) if n_chunks else 0
    int_auto_eff = is_int_auto and gcd_m_max >= 3 and not host_decide
    # when the caller owns the host array, the IntMult screening runs in a
    # host thread on the same samples (choose_base_from_sample — the exact
    # host-parity path the device screening's overflow fallback already
    # uses) and OVERLAPS the stage-1 fetch wait, cutting the GCD phase
    # (~0.14 s at 64M) out of the fused device dispatch entirely
    host_gcd = int_auto_eff and nums_host is not None
    if host_gcd:
        int_auto_eff = False

    dec_groups: Dict[int, list] = {}
    if is_delta_auto and not host_decide:
        for ci, cn in enumerate(chunk_ns):
            if delta_spans[ci][1] >= 2:
                dec_groups.setdefault(int(ubls[ci]), []).append(ci)
    groups_list = sorted(dec_groups.items())
    cand_cis = [ci for _, cis in groups_list for ci in cis]
    cand_starts = np.array([delta_spans[ci][0] for ci in cand_cis], np.int32)
    cand_lens_np = np.array([delta_spans[ci][1] for ci in cand_cis], np.int32)
    cand_meta = []
    pos = 0
    for ubl_g, cis in groups_list:
        lens_g = cand_lens_np[pos : pos + len(cis)]
        starts_g = cand_starts[pos : pos + len(cis)]
        g_m = int(lens_g.max())
        uni = bool(
            np.all(lens_g == g_m)
            and np.array_equal(
                starts_g,
                starts_g[0] + np.arange(len(cis), dtype=starts_g.dtype) * g_m)
        )
        cand_meta.append((len(cis), g_m, ubl_g, uni))
        pos += len(cis)

    hint_key = (
        tuple(chunk_ns), page_n, str(np.dtype(nums.dtype)), level,
        config.mode_spec.kind, getattr(config.mode_spec, "value", None),
        config.delta_spec.kind,
        config.delta_spec.order, config.enable_8_bit,
    )
    _prev_hint = _SPEC_HINTS.get(hint_key)
    # speculative u32 sorts: int-kind value spans almost always fit 32
    # bits after delta; float latents spread over the full 64 bits, so
    # they keep the u64 sort. A previous overflow for this layout makes
    # the choice sticky-exact (sort32_ok=False in the hint).
    sort32_on = (
        _SORT32 and not host_decide and nt.kind != "float" and not is_dict
        and (_prev_hint is None or _prev_hint.get("sort32_ok", True))
    )

    import threading

    gcd_box: Dict[int, int] = {}
    gcd_thread = None
    if host_gcd:
        def _host_gcd_all():
            # ONE vectorized gather + bijection over all chunks' samples
            # (32 per-chunk fancy-index gathers measured ~0.15 s of the
            # thread's ~0.25 s at 64M; the screening itself is ~0.09 s)
            s_all = nt.to_latent_ordered(nums_host[mode_idx])
            for ci_g in range(n_chunks):
                a_g, m_g = mode_spans[ci_g]
                if m_g == 0:
                    continue
                b_g = int_mult.choose_base_from_sample(s_all[a_g : a_g + m_g])
                if b_g is not None:
                    gcd_box[ci_g] = int(b_g)

        gcd_thread = threading.Thread(target=_host_gcd_all)
        gcd_thread.start()

    lat2d, mode_s_dev, delta_s_dev, buf_d, stage1_d64s = _phase_stage1(
        nums_dev, mode_idx_dev, delta_idx_dev,
        jnp.asarray(gcd_starts), jnp.asarray(gcd_lens),
        jnp.asarray(cand_starts), jnp.asarray(cand_lens_np),
        kind="unsigned" if is_dict else nt.kind,
        mid=0 if is_dict else int(nt.latent.mid), total_rows=total_rows,
        page_n=page_n, int_auto=int_auto_eff, gcd_m_max=gcd_m_max,
        cand_meta=tuple(cand_meta), lat_bits=plt.bits,
        fetch_mode_s=is_float_auto and float_host_samples is None,
        sort32=sort32_on,
    )
    _t0 = _trace("stage1 dispatch", _t0)

    # speculative phase 2: dispatch B/C from the previous same-shaped
    # plan's decisions so their device compute overlaps the decision round
    # trip below; results are consumed only if the real decisions match
    f_params = (
        (lt.bits, lt.bits - nt.precision_bits - 1, nt.precision_bits + 1)
        if nt.kind == "float" else None
    )
    ph2_ctx = (ubls, chunk_ns, pages_per_chunk, rows_per_chunk, total_rows,
               page_n, n_chunks, lat2d, rowlen, plt.bits, f_params)
    # speculation works for host_decide too: phase 2 dispatches from the
    # previous plan's decisions and overlaps the HOST decision math; the
    # real decisions below validate it before any result is consumed
    spec_hint = _prev_hint

    def _split_kw_from(cis, bases_map, fm_map):
        """Per-chunk primary-transform kwargs for _phase_delta_candidates
        (IntMult/FloatQuant // base; FloatMult softfloat), from explicit
        maps so speculative dispatches can use the previous plan's."""
        kw = {}
        if any(ci in bases_map for ci in cis):
            kw = dict(
                bases=jnp.asarray(np.array(
                    [bases_map.get(ci, 1) for ci in cis], np.uint64)),
                has_bases=True,
            )
        if any(ci in fm_map for ci in cis):
            kw.update(
                fmult_invb=jnp.asarray(np.array(
                    [fm_map.get(ci, (0, 0))[0] for ci in cis], np.uint64)),
                f_params=f_params,
            )
        return kw

    def _dispatch_lb(lb_q, bases_map, fm_map):
        """Lookback-candidate dispatch (chooser scan + the two lookback
        rows) per (ubl, window) group; returns fetchable handles."""
        handles = []
        for (ubl_g, wnl_g), cis in sorted(lb_q.items()):
            starts_g = np.array([delta_spans[ci][0] for ci in cis], np.int32)
            lens_g = np.array([delta_spans[ci][1] for ci in cis], np.int32)
            devs = _phase_delta_candidates(
                delta_s_dev, jnp.asarray(starts_g), jnp.asarray(lens_g),
                n_chunks=len(cis), m_max=int(lens_g.max()), max_order=0,
                nb_log=ubl_g, lat_bits=plt.bits, window_n_log=wnl_g,
                cands="lookback", **_split_kw_from(cis, bases_map, fm_map),
            )
            handles.append((ubl_g, cis, lens_g, devs))
        return handles

    # speculative lookback candidates: on the warm path lb_pending is
    # layout+data stable, so the chooser scan overlaps the stage-1 fetch
    # and the host chain decisions instead of sitting on the critical path
    spec_lb = None
    if spec_hint is not None and not _LB_HOST and spec_hint.get("lb_q"):
        spec_lb = _dispatch_lb(
            spec_hint["lb_q"], spec_hint["bases"], spec_hint["fmult"])

    spec_ph2 = None
    if spec_hint is not None:
        spec_ph2 = _dispatch_phase2_impl(
            ph2_ctx, spec_hint["orders"], spec_hint["live"], spec_hint["bases"],
            spec_hint["flips"], spec_hint["fmult"], sort32=sort32_on,
        )

    # ---- host-native decisions (see host_decide above); they overlap
    # the stage-1 bijection and the speculative phase-2 dispatch above ----
    host_int_bases: Dict[int, int] = {}
    host_delta_encs: Dict[int, DeltaEncoding] = {}
    if host_decide:
        ms_h = config.mode_spec
        pin_base = None
        pin_fm = None
        if ms_h.kind == ModeSpec.TRY_INT_MULT:
            pin_base = int(ms_h.value)
        elif ms_h.kind == ModeSpec.TRY_FLOAT_QUANT:
            pin_base = 1 << int(ms_h.value)
        elif ms_h.kind == ModeSpec.TRY_FLOAT_MULT:
            pin_fm = (nt.np_dtype.type(ms_h.value),
                      nt.np_dtype.type(1.0) / nt.np_dtype.type(ms_h.value))
        starts_h = np.concatenate([[0], np.cumsum(chunk_ns)[:-1]])

        def _chunk_sample(ci):
            """(base or None, primary-transformed u64 delta sample)."""
            cn = chunk_ns[ci]
            cnums = nums_host[starts_h[ci] : starts_h[ci] + cn]
            base_ci = pin_base
            b_out = None
            if is_int_auto:
                mi_h = idx_cache[cn]
                s_lat = nt.to_latent_ordered(cnums[mi_h]) if len(mi_h) else None
                b_h = int_mult.choose_base_from_sample(s_lat)
                if b_h is not None:
                    b_out = int(b_h)
                    base_ci = int(b_h)
            prim_h = None
            if config.delta_spec.kind == cmp.DeltaSpec.AUTO:
                # the delta sample: contiguous groups of the chunk, mode
                # split applied elementwise — identical to the host
                # pipeline's choose_delta_sample(primary) construction
                dsl = dslice_cache[cn]
                seg = np.concatenate([cnums[a_:b_] for a_, b_ in dsl])
                s_h = nt.to_latent_ordered(seg)
                if base_ci is not None and base_ci > 1:
                    prim_h = s_h // s_h.dtype.type(base_ci)
                elif pin_fm is not None:
                    from pcodec_tpu.modes import float_mult
                    with np.errstate(all="ignore"):
                        prim_h, _ = float_mult.split_latents(
                            nt, nt.from_latent_ordered(s_h),
                            pin_fm[0], pin_fm[1])
                    prim_h = prim_h.astype(np.uint64)
                else:
                    prim_h = s_h
                prim_h = prim_h.astype(plt.np_dtype)
            return b_out, prim_h

        if n_chunks > 3:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=8) as pool:
                gathered = list(pool.map(_chunk_sample, range(n_chunks)))
        else:
            gathered = [_chunk_sample(ci) for ci in range(n_chunks)]
        for ci, (b_out, _) in enumerate(gathered):
            if b_out is not None:
                host_int_bases[ci] = b_out

        try:
            from pcodec_tpu.native import kernels as _nk
            _nk.delta_cand_stats
        except Exception:
            _nk = None
        if config.delta_spec.kind == cmp.DeltaSpec.AUTO:
            if _nk is None:
                for ci, (_, prim_h) in enumerate(gathered):
                    host_delta_encs[ci] = (
                        cmp.choose_auto_delta_encoding_from_sample(
                            prim_h, chunk_ns[ci], int(ubls[ci]), plt))
            else:
                host_delta_encs = _native_auto_delta_batch(
                    [p for _, p in gathered], chunk_ns, ubls, plt, _nk)
        _t0 = _trace("host decisions", _t0)


    try:
        from pcodec_tpu.native import kernels as _nk
        _nk.delta_cand_stats
    except Exception:
        _nk = None

    ds_box: Dict[str, np.ndarray] = {}
    ds_thread = None
    lb_box: Dict[str, object] = {}

    def _build_ds_from_host():
        # the delta samples are contiguous slices of the (bijected) numbers;
        # building them from the caller's host array skips the ~n/50-latent
        # tunnel fetch entirely
        parts = []
        start0 = 0
        for cn0 in chunk_ns:
            for a_, b_ in dslice_cache[cn0]:
                parts.append(nums_host[start0 + a_ : start0 + b_])
            start0 += cn0
        ds_box["v"] = nt.to_latent_ordered(
            np.concatenate(parts)).astype(np.uint64)

    host_ds_ok = nums_host is not None and not is_dict
    if _LB_HOST and not host_decide:
        if host_ds_ok:
            def _ds_and_spec_lb():
                _build_ds_from_host()
                if _nk is not None and is_delta_auto:
                    # speculative identity-transform lookback stats for all
                    # chunks: this CPU work overlaps the buf transfer (IO);
                    # split-mode chunks recompute with their base later
                    ds0 = ds_box["v"]
                    sn_l = np.asarray(
                        [delta_spans[ci][1] for ci in range(n_chunks)],
                        np.int64)
                    soff_l = np.asarray(
                        [delta_spans[ci][0] for ci in range(n_chunks)],
                        np.int64)
                    wnls_l = np.asarray(
                        [cmp.new_lookback(int(m)).window_n_log for m in sn_l],
                        np.int32)
                    lb_box["stats"] = _nk.delta_cand_stats(
                        ds0, soff_l, sn_l, plt.bits, plt.offset_bits_bits,
                        np.asarray(ubls, np.int32), -1, -1, wnls=wnls_l,
                        n_threads=1)
            ds_thread = threading.Thread(target=_ds_and_spec_lb)
        else:
            # host-sample lookback A/B fallback: fetch the device sample
            ds_thread = threading.Thread(
                target=lambda: ds_box.__setitem__(
                    "v", np.asarray(delta_s_dev))
            )
        ds_thread.start()

    # fetch the small decision buffer (packed candidate bins); the sample
    # build / speculative lookback stats above run while it transfers
    buf = None if host_decide else np.asarray(buf_d)
    _t0 = _trace("stage1 fetch", _t0)

    def _delta_samples() -> np.ndarray:
        if ds_thread is not None:
            ds_thread.join()
        elif "v" not in ds_box:
            # rare: only degenerate (<2-sample) chunks need host samples
            if host_ds_ok:
                _build_ds_from_host()
            else:
                ds_box["v"] = np.asarray(delta_s_dev)
        return ds_box["v"]

    dict_payloads = None
    if is_dict:
        # dictionaries (metadata payloads): the per-chunk unique counts plus
        # the first _DICT_FETCH0 freq-ordered uniques came in one buffer;
        # bigger dictionaries take one more fetch sized to the total
        dict_small = np.asarray(dict_small_d)
        U_arr = dict_small[:n_chunks].astype(np.int64)
        total_U = int(U_arr.sum())
        got = dict_small[n_chunks:]
        if total_U > len(got):
            cap = min(1 << (total_U - 1).bit_length(), n)
            got = np.asarray(_slice_prefix(dict_uniq_dev, cap))
        dict_payloads, base = [], 0
        for u in U_arr:
            dict_payloads.append(got[base : base + int(u)].astype(lt.np_dtype))
            base += int(u)
        _t0 = _trace("dict fetch", _t0)

    off = 0
    gcd_np = None
    if int_auto_eff:
        K = _GCD_K
        nK = n_chunks * K
        v_lo = buf[off : off + nK].astype(np.uint64)
        off += nK
        v_hi = buf[off : off + nK].astype(np.uint64)
        off += nK
        g_vals = (v_lo | (v_hi << 32)).reshape(n_chunks, K)
        g_cnts = buf[off : off + nK].reshape(n_chunks, K).astype(np.int64)
        off += nK
        g_nuniq = buf[off : off + n_chunks].astype(np.int64)
        off += n_chunks
        gcd_np = (g_vals, g_cnts, g_nuniq)
    cand_bins_by_ci: Dict[int, list] = {}
    sort32_failed = False
    pos = 0
    gpos = 0
    for gi_g, ((g_n, g_m, g_nb, _g_uni), (ubl_g, cis)) in enumerate(
            zip(cand_meta, groups_list)):
        rows = g_n * n_cand1
        nbn = buf[off : off + rows].astype(np.int64)
        off += rows
        b_lo = buf[off : off + rows].astype(np.uint64)
        off += rows
        b_hi = buf[off : off + rows].astype(np.uint64)
        off += rows
        gfits = buf[off : off + rows]
        off += rows
        gsfits = buf[off : off + rows]
        off += rows
        cap = rows * (1 << g_nb) * 3
        dense32 = buf[off : off + cap].reshape(rows * (1 << g_nb), 3)
        off += cap
        if gsfits.all():
            per_row = _unpack_bins32(
                nbn, b_lo | (b_hi << 32), gfits, dense32, stage1_d64s[gi_g])
        else:
            # a row's value span overflowed the speculative u32 sort:
            # redo this group's candidate bins exactly (u64 sort)
            sort32_failed = True
            dense_r, nbn_r = _phase_delta_candidates(
                delta_s_dev,
                jnp.asarray(cand_starts[gpos : gpos + g_n]),
                jnp.asarray(cand_lens_np[gpos : gpos + g_n]),
                n_chunks=g_n, m_max=g_m, max_order=STAGE1_ORDERS,
                nb_log=g_nb, lat_bits=plt.bits, window_n_log=4,
                cands="orders",
            )
            per_row = _fetch_packed_bins(dense_r, nbn_r)
        gpos += g_n
        for k, ci in enumerate(cis):
            lst = []
            dn_ci = int(cand_lens_np[pos + k])
            for cand in range(n_cand1):
                counts, lowers, uppers = per_row[k * n_cand1 + cand]
                lst.append(((counts, lowers, uppers),
                            max(dn_ci - cand, 0)))
            cand_bins_by_ci[ci] = lst
        pos += g_n
    mode_samples = None
    if is_float_auto and float_host_samples is not None:
        parts_ms = [s for s in float_host_samples if s is not None and len(s)]
        mode_samples = (np.concatenate(parts_ms) if parts_ms
                        else np.zeros(0, lt.np_dtype))
    elif is_float_auto:
        L_ms = len(mode_idx)
        ms_lo = buf[off : off + L_ms].astype(np.uint64)
        off += L_ms
        ms_hi = buf[off : off + L_ms].astype(np.uint64)
        off += L_ms
        mode_samples = (ms_lo | (ms_hi << 32)).astype(lt.np_dtype)
    _t0 = _trace("stage1 unpack", _t0)

    # ---- IntMult base scoring (host math from the packed screening) ----
    int_bases: Dict[int, int] = dict(host_int_bases)
    if int_auto_eff:
        int_bases = _int_bases_collect(
            (gcd_np, gcd_starts, gcd_lens, gcd_m_max), mode_s_dev, chunk_ns, lt
        )
        _t0 = _trace("gcd scoring", _t0)
    elif gcd_thread is not None:
        gcd_thread.join()
        int_bases.update(gcd_box)
        _t0 = _trace("gcd scoring (host thread)", _t0)

    # ---- mode routing: every auto-mode winner stays on device. IntMult /
    # FloatQuant split via integer division; FloatMult splits via the
    # integer softfloat (ops/softfloat.py) ----
    mode_is_host = np.zeros(n_chunks, dtype=bool)
    quant_ks: Dict[int, int] = {}
    fmult_bases: Dict[int, tuple] = {}  # ci -> (base, inv_base) np scalars
    for ci, cn in enumerate(chunk_ns):
        if is_float_auto:
            a, m = mode_spans[ci]
            if m:
                from pcodec_tpu.modes import float_mult, float_quant

                # |x| sample for the float bids; the auction order matches
                # choose_mode_and_split (float.rs:83-134): FloatQuant wins
                # ties against FloatMult
                svals = nt.from_latent_ordered(mode_samples[a : a + m])
                ab = np.abs(svals)
                fm = float_mult.compute_bid(nt, ab)
                fq = float_quant.compute_bid(nt, ab)
                if fq is not None and (fm is None or fq[1] >= fm[2]):
                    quant_ks[ci] = int(fq[0])
                elif fm is not None:
                    fmult_bases[ci] = (fm[0], fm[1])

    # pinned Try* specs: every chunk gets the user's mode (validated by
    # device_train_supported); no sampling or auction
    ms = config.mode_spec
    if ms.kind == ModeSpec.TRY_INT_MULT:
        int_bases = {ci: int(ms.value) for ci in range(n_chunks)}
    elif ms.kind == ModeSpec.TRY_FLOAT_QUANT:
        quant_ks = {ci: int(ms.value) for ci in range(n_chunks)}
    elif ms.kind == ModeSpec.TRY_FLOAT_MULT:
        base_v = nt.np_dtype.type(ms.value)
        inv_v = nt.np_dtype.type(1.0) / base_v
        fmult_bases = {ci: (base_v, inv_v) for ci in range(n_chunks)}

    # unified per-chunk primary transform: latent // base (FloatQuant's
    # primary latent is exactly latent >> k == latent // 2^k); FloatMult
    # carries (inv_base, base) BITS for the softfloat split
    prim_bases: Dict[int, int] = dict(int_bases)
    prim_bases.update({ci: 1 << k for ci, k in quant_ks.items()})
    fmult_map: Dict[int, tuple] = {}
    for ci, (b_, ib_) in fmult_bases.items():
        fmult_map[ci] = (
            int(np.asarray(ib_, nt.np_dtype).view(lt.np_dtype)),
            int(np.asarray(b_, nt.np_dtype).view(lt.np_dtype)),
        )

    def _host_primary_sample(ci, sample):
        """The per-chunk primary transform on a host latent sample."""
        if ci in prim_bases:
            return sample // np.uint64(prim_bases[ci])
        if ci in fmult_bases:
            b_, ib_ = fmult_bases[ci]
            from pcodec_tpu.modes import float_mult
            with np.errstate(all="ignore"):
                p, _ = float_mult.split_latents(
                    nt, nt.from_latent_ordered(sample.astype(lt.np_dtype)),
                    b_, ib_)
            return p.astype(np.uint64)
        return sample

    def _cand_split_kw(cis):
        """_split_kw_from with this plan's decided mode-split maps."""
        return _split_kw_from(cis, prim_bases, fmult_map)

    if (prim_bases or fmult_map) and is_delta_auto and not host_decide:
        # non-Classic winners decide delta on PRIMARY latents: their
        # stage-1 candidates re-run with the mode split applied
        redis_q: Dict[int, list] = {}
        for ci in list(prim_bases) + list(fmult_map):
            if delta_spans[ci][1] >= 2:
                redis_q.setdefault(int(ubls[ci]), []).append(ci)
        rq_handles = []
        for ubl_g, cis in sorted(redis_q.items()):
            starts_g = np.array([delta_spans[ci][0] for ci in cis], np.int32)
            lens_g = np.array([delta_spans[ci][1] for ci in cis], np.int32)
            devs = _phase_delta_candidates(
                delta_s_dev, jnp.asarray(starts_g),
                jnp.asarray(lens_g), n_chunks=len(cis),
                m_max=int(lens_g.max()), max_order=STAGE1_ORDERS,
                nb_log=ubl_g, lat_bits=plt.bits, window_n_log=4,
                cands="orders", **_cand_split_kw(cis),
            )
            rq_handles.append((ubl_g, cis, lens_g, devs))
        for ubl_g, cis, lens_g, (dense_d, nbn_d) in rq_handles:
            per_row = _fetch_packed_bins(dense_d, nbn_d)
            for k, ci in enumerate(cis):
                dn_ci = int(lens_g[k])
                cand_bins_by_ci[ci] = [
                    (per_row[k * n_cand1 + cand], max(dn_ci - cand, 0))
                    for cand in range(n_cand1)
                ]
        _t0 = _trace("mode-split cand redispatch", _t0)

    # ---- speculative auto-delta decision (no-lookback chain) ----
    # Stage-1 chains (orders 0..STAGE1_ORDERS) break there for almost all
    # chunks; the rare continuing chunks get orders STAGE1_ORDERS+1.. from
    # one more dispatch. The true decision is provably either the chain\'s
    # choice or lookback itself (a smaller intermediate best only makes
    # orders break earlier); lookback costs are evaluated on the host after
    # phase B dispatches, and lookback-winning chunks flip to the host
    # pipeline (which re-derives everything from the numbers).
    delta_encs: Dict[int, DeltaEncoding] = {}
    spec_chains: Dict[int, list] = {}
    if host_decide and is_delta_auto:
        delta_encs = host_delta_encs
    elif is_delta_auto:
        for ci, cn in enumerate(chunk_ns):
            if not mode_is_host[ci] and delta_spans[ci][1] < 2:
                a, m = delta_spans[ci]
                sample = _host_primary_sample(ci, _delta_samples()[a : a + m])
                delta_encs[ci] = cmp.choose_auto_delta_encoding_from_sample(
                    sample.astype(plt.np_dtype), cn, int(ubls[ci]), plt
                )
        unbroken: Dict[int, list] = {}
        chain_items = [
            (ci, cb) for ci, cb in cand_bins_by_ci.items() if not mode_is_host[ci]
        ]

        def _chain_of(item):
            ci, cb = item
            return cmp.extend_orders_chain([], cb, int(ubls[ci]), plt)

        def _chains_native(items):
            """extend_orders_chain for every chunk in ONE native call: the
            per-candidate partition+quantize runs in C++
            (pco_hist_cand_stats) and the float cost layer on top is the
            same as sample_cost_from_unopt, so costs and break points are
            identical."""
            co_all, lo_all, up_all = [], [], []
            boff, bns, nsts, ubl_slots = [], [], [], []
            pos = 0
            for ci, cb in items:
                for bins, nst in cb:
                    co, lo, up = bins
                    co_all.append(np.ascontiguousarray(co, dtype=np.uint64))
                    lo_all.append(np.ascontiguousarray(lo, dtype=np.uint64))
                    up_all.append(np.ascontiguousarray(up, dtype=np.uint64))
                    boff.append(pos)
                    bns.append(len(co))
                    pos += len(co)
                    nsts.append(int(nst))
                    ubl_slots.append(int(ubls[ci]))
            z = np.zeros(0, np.uint64)
            stats, cap = _nk.hist_cand_stats(
                np.concatenate(co_all) if co_all else z,
                np.concatenate(lo_all) if lo_all else z,
                np.concatenate(up_all) if up_all else z,
                boff, bns, nsts, ubl_slots, plt.bits, plt.offset_bits_bits)
            res = []
            k = 0
            for ci, cb in items:
                costs = []
                broke = False
                for cand in range(len(cb)):
                    order = len(costs)
                    enc = (DeltaEncoding.noop() if order == 0
                           else DeltaEncoding.consecutive(order))
                    cost = _cost_from_native_stats(
                        [("primary", stats[k + cand], nsts[k + cand])],
                        enc, plt, cap)
                    costs.append(cost)
                    if order > 0 and cost >= min(costs[:-1]):
                        broke = True
                        break
                    if order == c.MAX_CONSECUTIVE_DELTA_ORDER:
                        broke = True
                        break
                else:
                    broke = len(costs) > c.MAX_CONSECUTIVE_DELTA_ORDER
                k += len(cb)
                res.append((costs, broke))
            return res

        if _nk is not None and chain_items:
            chain_results = _chains_native(chain_items)
        elif len(chain_items) > 3:
            # the bin DP inside each eval is native (GIL released)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=8) as pool:
                chain_results = list(pool.map(_chain_of, chain_items))
        else:
            chain_results = [_chain_of(it) for it in chain_items]
        for (ci, _), (chain, broke) in zip(chain_items, chain_results):
            spec_chains[ci] = chain
            if not broke:
                unbroken.setdefault(int(ubls[ci]), []).append(ci)
        if unbroken:
            # stage 2: orders STAGE1_ORDERS+1..MAX for the continuing chunks
            s2_handles = []
            for ubl_g, cis in sorted(unbroken.items()):
                starts_g = np.array([delta_spans[ci][0] for ci in cis], np.int32)
                lens_g = np.array([delta_spans[ci][1] for ci in cis], np.int32)
                devs = _phase_delta_candidates(
                    delta_s_dev, jnp.asarray(starts_g),
                    jnp.asarray(lens_g), n_chunks=len(cis),
                    m_max=int(lens_g.max()), max_order=mo,
                    nb_log=ubl_g, lat_bits=plt.bits, window_n_log=4,
                    cands="orders", min_order=STAGE1_ORDERS + 1,
                    **_cand_split_kw(cis),
                )
                s2_handles.append((ubl_g, cis, lens_g, devs))
            n_cand2 = mo - STAGE1_ORDERS
            for ubl_g, cis, lens_g, (dense_d, nbn_d) in s2_handles:
                per_row = _fetch_packed_bins(dense_d, nbn_d)
                for k, ci in enumerate(cis):
                    dn_ci = int(lens_g[k])
                    more = [
                        (per_row[k * n_cand2 + j],
                         max(dn_ci - (STAGE1_ORDERS + 1 + j), 0))
                        for j in range(n_cand2)
                    ]
                    chain, _ = cmp.extend_orders_chain(
                        spec_chains[ci], more, ubl_g, plt)
                    spec_chains[ci] = chain
            _t0 = _trace("stage2 cands", _t0)
        for ci, chain in spec_chains.items():
            delta_encs[ci] = cmp.finalize_delta_choice(chain, None, chunk_ns[ci])

    _t0 = _trace("cand decisions", _t0)
    # ---- final per-chunk delta encodings ----
    orders = np.zeros(n_chunks, dtype=np.int32)
    encs: List[Optional[DeltaEncoding]] = [None] * n_chunks
    # lookback-winning split-free chunks encode on device (_phase_lookback);
    # encs stays None for them so phase 2 (consecutive machinery) skips them
    lb_encs: Dict[int, DeltaEncoding] = {}

    def _route_lookback(ci, enc):
        if ci not in prim_bases and ci not in fmult_map:
            lb_encs[ci] = enc

    for ci, cn in enumerate(chunk_ns):
        if mode_is_host[ci]:
            continue  # never set on the auto paths today; kept for
            # future Try* specs that pin a host-only mode
        if config.delta_spec.kind == cmp.DeltaSpec.AUTO:
            enc = delta_encs[ci]
        elif config.delta_spec.kind == cmp.DeltaSpec.NO_OP:
            enc = DeltaEncoding.noop()
        elif config.delta_spec.kind == cmp.DeltaSpec.TRY_LOOKBACK:
            enc = cmp.new_lookback(cn)
        else:  # TRY_CONSECUTIVE
            enc = (
                DeltaEncoding.noop()
                if config.delta_spec.order == 0
                else DeltaEncoding.consecutive(config.delta_spec.order)
            )
        if enc.kind == DeltaEncoding.LOOKBACK:
            _route_lookback(ci, enc)
            continue
        encs[ci] = enc
        orders[ci] = enc.order if enc.kind == DeltaEncoding.CONSECUTIVE else 0

    # ---- lookback candidate dispatch (device chooser + bins) ----
    # evaluated whenever the reference would (noop cost > penalty); the
    # chooser scan runs on device and only packed bins come back, so the
    # delta sample never leaves the device (PCODEC_LB_HOST=1 A/B's the old
    # host-sample path)
    lb_pending = [
        ci for ci in spec_chains
        if encs[ci] is not None
        and spec_chains[ci][0]
        > cmp.LOOKBACK_REQUIRED_BYTE_SAVINGS_PER_N * delta_spans[ci][1]
    ] if is_delta_auto else []
    lb_handles = []
    lb_q: Dict[tuple, list] = {}
    if lb_pending and not _LB_HOST:
        for ci in lb_pending:
            wnl = int(cmp.new_lookback(delta_spans[ci][1]).window_n_log)
            lb_q.setdefault((int(ubls[ci]), wnl), []).append(ci)
        # the speculative dispatch (issued at stage-1 time) is valid when
        # the grouping and the mode-split maps it used match this plan's
        use_spec_lb = (
            spec_lb is not None
            and spec_hint["lb_q"] == lb_q
            and spec_hint["bases"] == prim_bases
            and spec_hint["fmult"] == fmult_map
        )
        lb_handles = (
            spec_lb if use_spec_lb else _dispatch_lb(lb_q, prim_bases, fmult_map)
        )
        _t0 = _trace(
            f"lookback dispatch (spec={'hit' if use_spec_lb else 'miss'})", _t0)

    # ---- phase 2 decision compare + (re)dispatch ----

    live = np.array([e is not None for e in encs], dtype=bool)
    use_spec = (
        spec_ph2 is not None
        and np.array_equal(spec_hint["orders"], orders)
        and np.array_equal(spec_hint["live"], live)
        and spec_hint["bases"] == prim_bases
        and spec_hint["flips"] == frozenset(quant_ks)
        and spec_hint["fmult"] == fmult_map
    )
    ph2 = (
        spec_ph2 if use_spec
        else _dispatch_phase2_impl(ph2_ctx, orders, live, prim_bases,
                                   frozenset(quant_ks), fmult_map,
                                   sort32=sort32_on)
    )
    _SPEC_HINTS[hint_key] = {
        "orders": orders.copy(), "live": live.copy(),
        "bases": dict(prim_bases), "flips": frozenset(quant_ks),
        "fmult": dict(fmult_map),
        "lb_q": {k: list(v) for k, v in lb_q.items()},
        "sort32_ok": ((_prev_hint or {}).get("sort32_ok", True)
                      and not sort32_failed),
    }
    if len(_SPEC_HINTS) > 16:
        _SPEC_HINTS.clear()
    dev_rows = ph2["dev_rows"]
    moments_dev = ph2["moments_dev"]
    if extras is not None:
        extras["moments_dev"] = moments_dev
        extras["rows_per_chunk"] = rows_per_chunk
    nreal = ph2["nreal"]
    sec_handles = ph2["sec_handles"]
    sec_row_of = ph2["sec_row_of"]
    sec_rows_dev = ph2["sec_rows_dev"]
    hist_handles = ph2["hist_handles"]
    _t0 = _trace(f"phase2 dispatch (spec={'hit' if use_spec else 'miss'})", _t0)
    # fetch the phase-B/C results in worker threads while the host
    # evaluates the lookback candidates (device compute + transfer overlap
    # the host math)
    # moments feed page-meta delta states: the device file-image assembler
    # reads them from moments_dev directly and the host page writer only
    # touches them at write time, so the fetch is LAZY (a ~0.2 s transfer
    # at 64M that would otherwise sit on the image path's critical path)
    fetch_box: Dict[str, np.ndarray] = {}
    fetch_threads = []
    for gi, (lanes, buf_w, _d64_w) in enumerate(hist_handles):
        fetch_threads.append(threading.Thread(
            target=lambda gi=gi, b=buf_w: fetch_box.__setitem__(
                f"w{gi}", np.asarray(b))
        ))
    for t in fetch_threads:
        t.start()

    # ---- lookback candidate evaluation ----
    # if the true decision differs from the speculated chain (== lookback
    # wins, per the chain theorem above), the chunk flips to the host
    # pipeline, which re-derives everything from the numbers.
    def _apply_lb_cost(ci, lb_cost):
        true = cmp.finalize_delta_choice(spec_chains[ci], lb_cost, chunk_ns[ci])
        enc = encs[ci]
        if (true.kind, true.order) != (enc.kind, enc.order):
            encs[ci] = None  # ph2's consecutive machinery skips this chunk
            if true.kind == DeltaEncoding.LOOKBACK:
                _route_lookback(ci, true)

    if lb_pending and not _LB_HOST:
        # device bins (dispatched above): identical float math to
        # lookback_cost_from_sample — same chooser (pinned to the native
        # one), same histogram walk, same cost path
        for ubl_g, cis, lens_g, (dense_d, nbn_d) in lb_handles:
            per_row = _fetch_packed_bins(dense_d, nbn_d)
            for k, ci in enumerate(cis):
                dn = int(lens_g[k])
                lb_cost = cmp.sample_cost_from_unopt(
                    cmp.new_lookback(dn),
                    {"delta": (per_row[2 * k + 1], dn - 1),
                     "primary": (per_row[2 * k], dn - 1)},
                    ubl_g, plt,
                ) + cmp.LOOKBACK_REQUIRED_BYTE_SAVINGS_PER_N * dn
                _apply_lb_cost(ci, lb_cost)
    elif lb_pending:
        # host-sample path (PCODEC_LB_HOST=1, the default): the speculative
        # native stats computed during the buf transfer cover split-free
        # chunks; split-mode chunks and the no-native fallback compute here
        ds = _delta_samples()
        spec_stats = lb_box.get("stats")

        def _lb_cost_py(ci):
            a, dn = delta_spans[ci]
            sample = _host_primary_sample(ci, ds[a : a + dn])
            penalty = cmp.LOOKBACK_REQUIRED_BYTE_SAVINGS_PER_N * dn
            return cmp.lookback_cost_from_sample(
                sample.astype(plt.np_dtype), int(ubls[ci]),
                cmp.new_lookback(dn), plt,
            ) + penalty

        def _lb_cost_stats(ci, slot0, slot1, cap_l):
            dn = delta_spans[ci][1]
            enc_l = cmp.new_lookback(dn)
            n_lb = max(dn - enc_l.state_n, 0)
            return _cost_from_native_stats(
                [("delta", slot0, n_lb), ("primary", slot1, n_lb)],
                enc_l, plt, cap_l,
            ) + cmp.LOOKBACK_REQUIRED_BYTE_SAVINGS_PER_N * dn

        redo = []  # (ci,) needing a transformed recompute
        for ci in lb_pending:
            split = ci in prim_bases or ci in fmult_map
            if spec_stats is not None and not split:
                stats_l, cap_l = spec_stats
                _apply_lb_cost(
                    ci, _lb_cost_stats(ci, stats_l[ci, 0], stats_l[ci, 1],
                                       cap_l))
            elif _nk is not None:
                redo.append(ci)
            else:
                _apply_lb_cost(ci, _lb_cost_py(ci))
        if redo:
            samples_r = []
            for ci in redo:
                a, dn = delta_spans[ci]
                samples_r.append(_host_primary_sample(
                    ci, ds[a : a + dn]).astype(plt.np_dtype).astype(np.uint64))
            sn_r = np.asarray([len(s) for s in samples_r], np.int64)
            soff_r = np.concatenate([[0], np.cumsum(sn_r)[:-1]]).astype(np.int64)
            wnls_r = np.asarray(
                [cmp.new_lookback(int(m)).window_n_log for m in sn_r], np.int32)
            stats_r, cap_r = _nk.delta_cand_stats(
                np.concatenate(samples_r), soff_r, sn_r, plt.bits,
                plt.offset_bits_bits,
                np.asarray([ubls[ci] for ci in redo], np.int32), -1, -1,
                wnls=wnls_r, n_threads=1)
            for k, ci in enumerate(redo):
                _apply_lb_cost(
                    ci, _lb_cost_stats(ci, stats_r[k, 0], stats_r[k, 1],
                                       cap_r))
    _t0 = _trace("lookback eval", _t0)

    # ---- device lookback ENCODE for the routed chunks ----
    lbe_handles = []
    if lb_encs:
        lbe_groups: Dict[tuple, list] = {}
        for ci, enc in lb_encs.items():
            key = (int(ubls[ci]), int(enc.window_n_log), int(enc.state_n))
            lbe_groups.setdefault(key, []).append(ci)
        # cap chunks per dispatch: a 16-chunk (32M-element) _phase_lookback
        # dispatch crashes the v5e worker ("kernel fault", 2026-08-21) while
        # 4-chunk dispatches of the SAME chunk size run byte-exact — split
        # groups and keep every dispatch in the proven envelope
        LBE_MAX_CHUNKS = 4
        for (ubl_g, wnl_g, stn_g), cis_all in sorted(lbe_groups.items()):
            for gi0 in range(0, len(cis_all), LBE_MAX_CHUNKS):
                cis = cis_all[gi0 : gi0 + LBE_MAX_CHUNKS]
                rows_idx = np.concatenate([
                    np.arange(ci * rows_per_chunk, (ci + 1) * rows_per_chunk)
                    for ci in cis
                ]).astype(np.int32)
                # per chunk: stored primary latents = lookback count = n
                # minus the state_n page-front latents of each page
                nr_g = np.array(
                    [chunk_ns[ci] - stn_g * len(pages_per_chunk[ci])
                     for ci in cis],
                    np.int64,
                )
                outs = _phase_lookback(
                    lat2d[jnp.asarray(rows_idx)],
                    jnp.asarray(rowlen[rows_idx]),
                    jnp.asarray(nr_g), jnp.asarray(nr_g),
                    n_chunks=len(cis), rows_per_chunk=rows_per_chunk,
                    page_n=page_n, lat_bits=plt.bits, wnl=wnl_g,
                    state_n=stn_g, nb_log=ubl_g,
                )
                lbe_handles.append(((ubl_g, stn_g), cis, outs))
        _t0 = _trace("lookback-encode dispatch", _t0)

    for t in fetch_threads:
        t.join()

    moments_box: List[Optional[np.ndarray]] = [None]

    def _moments_np():
        if moments_box[0] is None:
            moments_box[0] = np.asarray(moments_dev)
        return moments_box[0]

    _t0 = _trace("moments+walk join", _t0)

    def _walk_parse(wb, n_lanes):
        return (wb[:n_lanes].astype(np.int64),
                wb[n_lanes : 2 * n_lanes].astype(np.uint64)
                | (wb[2 * n_lanes : 3 * n_lanes].astype(np.uint64) << 32),
                wb[3 * n_lanes : 4 * n_lanes],
                wb[4 * n_lanes : 5 * n_lanes],
                wb[5 * n_lanes :].reshape(-1, 3))

    # speculative-u32 full-array sort check: a chunk whose span overflowed
    # carries garbage extracts -> redo phase 2 exactly and refetch (rare;
    # the layout hint then pins sort32 off for subsequent plans)
    if ph2["sort32"] and not all(
            _walk_parse(fetch_box[f"w{gi}"], len(lanes))[3].all()
            for gi, (lanes, _b, _d) in enumerate(hist_handles)):
        # the hint may have been evicted by the size-capped clear() above;
        # re-insert rather than KeyError on the redo path
        _hint = _SPEC_HINTS.get(hint_key)
        if _hint is None:
            _hint = {"orders": orders.copy(), "live": live.copy(),
                     "bases": dict(prim_bases), "flips": frozenset(quant_ks),
                     "fmult": dict(fmult_map),
                     "lb_q": {k: list(v) for k, v in lb_q.items()}}
            _SPEC_HINTS[hint_key] = _hint
        _hint["sort32_ok"] = False
        ph2 = _dispatch_phase2_impl(ph2_ctx, orders, live, prim_bases,
                                    frozenset(quant_ks), fmult_map,
                                    sort32=False)
        dev_rows = ph2["dev_rows"]
        moments_dev = ph2["moments_dev"]
        nreal = ph2["nreal"]
        sec_handles = ph2["sec_handles"]
        sec_row_of = ph2["sec_row_of"]
        sec_rows_dev = ph2["sec_rows_dev"]
        hist_handles = ph2["hist_handles"]
        if extras is not None:
            extras["moments_dev"] = moments_dev
        for gi, (lanes, buf_w, _d) in enumerate(hist_handles):
            fetch_box[f"w{gi}"] = np.asarray(buf_w)

    hist_bins: Dict[int, list] = {}
    for gi, (lanes, buf_w, d64_w) in enumerate(hist_handles):
        nbn_w, base_w, fits_w, _sf_w, dense32_w = _walk_parse(
            fetch_box[f"w{gi}"], len(lanes))
        per_row = _unpack_bins32(nbn_w, base_w, fits_w, dense32_w, d64_w)
        for k, ci in enumerate(lanes):
            hist_bins[ci] = per_row[k]
    sec_bins: Dict[int, tuple] = {}
    for cis, dense_d, nbn_d in sec_handles:
        per_row = _fetch_packed_bins(dense_d, nbn_d)
        for k, ci in enumerate(cis):
            sec_bins[ci] = per_row[k]

    lb_data: Dict[int, dict] = {}
    for (ubl_g, stn_g), cis, outs in lbe_handles:
        prim_src, lb_src, states_d, dense_p, nbn_p, dense_dv, nbn_dv = outs
        states_np = np.asarray(states_d)
        bins_p = _fetch_packed_bins(dense_p, nbn_p)
        bins_dv = _fetch_packed_bins(dense_dv, nbn_dv)
        for k, ci in enumerate(cis):
            lb_data[ci] = {
                "ubl": ubl_g, "state_n": stn_g,
                "bins_p": bins_p[k], "bins_d": bins_dv[k],
                "states": states_np[k * rows_per_chunk : (k + 1) * rows_per_chunk],
                "prim_src": prim_src, "lb_src": lb_src,
                "row_start": k * rows_per_chunk,
            }

    _t0 = _trace("walk+bins fetch", _t0)
    # ---- host: bins, metadata, jobs ----
    nums_np_cache: List[Optional[np.ndarray]] = [None]

    def _nums_np(a, b):
        # host-pipeline chunks need host-side numbers; fetch lazily once
        if nums_np_cache[0] is None:
            nums_np_cache[0] = np.asarray(nums)
        return nums_np_cache[0][a:b]

    ccs: List[object] = [None] * n_chunks
    chunk_jobs: List[tuple] = [(None, None)] * n_chunks
    groups: Dict[tuple, list] = {}
    start = 0
    for ci, cn in enumerate(chunk_ns):
        if encs[ci] is None and ci not in lb_data:
            # host pipeline for this chunk (split-mode lookback winner /
            # degenerate fallback)
            chunk_config = _dc_replace(
                config, paging_spec=PagingSpec.exact_pages(pages_per_chunk[ci])
            )
            ccs[ci] = cmp.chunk_compressor(nt, _nums_np(start, start + cn), chunk_config)
            chunk_jobs[ci] = ("host", None)
            start += cn
            continue

        mode = Mode(Mode.DICT, dict_payloads[ci]) if is_dict else Mode(Mode.CLASSIC)
        if ci in lb_data:
            # device lookback chunk: two latent vars (u32 lookbacks +
            # toggled primary deltas), page state = the raw front latents
            d = lb_data[ci]
            enc_ci = lb_encs[ci]
            stn = d["state_n"]
            nb_log = int(d["ubl"])
            nr = cn - stn * len(pages_per_chunk[ci])
            trained = _train_from_histogram(d["bins_p"], nr, nb_log, plt,
                                            config.ans_size_log_cap)
            bins = cmp.bins_from_infos(trained.infos, plt)
            lvc = cmp.LatentVarCompressor(trained, bins, None)
            trained_d = _train_from_histogram(d["bins_d"], nr, nb_log, U32,
                                              config.ans_size_log_cap)
            bins_d = cmp.bins_from_infos(trained_d.infos, U32)
            lvc_d = cmp.LatentVarCompressor(trained_d, bins_d, None)
            var_metas = PerLatentVar(
                cmp.ChunkLatentVarMeta(trained_d.ans_size_log, bins_d),
                cmp.ChunkLatentVarMeta(trained.ans_size_log, bins),
                None,
            )
            lvcs_pv = PerLatentVar(lvc_d, lvc, None)
            counts = PerLatentVar(trained_d.counts, trained.counts, None)
            meta = cmp.ChunkMeta(mode, enc_ci, var_metas, nt.latent)
            page_infos = _LookbackPageInfos(
                pages_per_chunk[ci], stn,
                d["states"][: len(pages_per_chunk[ci])].astype(plt.np_dtype),
            )
            var_list = [
                ("delta", lvc_d, bins_d, 0, d["row_start"], d["lb_src"]),
                ("primary", lvc, bins, stn, d["row_start"], d["prim_src"]),
            ]
        else:
            order = int(orders[ci])
            nr = int(nreal[ci])
            nb_log = int(ubls[ci])
            has_sec = ci in prim_bases or ci in fmult_map
            trained = _train_from_histogram(hist_bins[ci], nr, nb_log, plt,
                                            config.ans_size_log_cap)
            bins = cmp.bins_from_infos(trained.infos, plt)
            lvc = cmp.LatentVarCompressor(trained, bins, None)
            var_metas = PerLatentVar(None, cmp.ChunkLatentVarMeta(trained.ans_size_log, bins), None)
            lvcs_pv = PerLatentVar(None, lvc, None)
            counts = PerLatentVar(None, trained.counts, None)
            if has_sec:
                # IntMult / FloatQuant: secondary (adjustment) var trained
                # from its own device walk; NOOP delta (auto never sets
                # secondary_uses_delta)
                ubl_sec = min(nb_log, c.LIMITED_UNOPTIMIZED_BINS_LOG)
                trained_s = _train_from_histogram(sec_bins[ci], cn, ubl_sec, lt,
                                                  config.ans_size_log_cap)
                bins_s = cmp.bins_from_infos(trained_s.infos, lt)
                lvc_s = cmp.LatentVarCompressor(trained_s, bins_s, None)
                var_metas = PerLatentVar(
                    None,
                    cmp.ChunkLatentVarMeta(trained.ans_size_log, bins),
                    cmp.ChunkLatentVarMeta(trained_s.ans_size_log, bins_s),
                )
                lvcs_pv = PerLatentVar(None, lvc, lvc_s)
                counts = PerLatentVar(None, trained.counts, trained_s.counts)
                if ci in quant_ks:
                    mode = Mode(Mode.FLOAT_QUANT, quant_ks[ci])
                elif ci in fmult_bases:
                    base_ = fmult_bases[ci][0]
                    mode = Mode(Mode.FLOAT_MULT, int(
                        nt.to_latent_ordered(
                            np.array([base_], nt.np_dtype))[0]))
                else:
                    mode = Mode(Mode.INT_MULT, int_bases[ci])
            meta = cmp.ChunkMeta(mode, encs[ci], var_metas, nt.latent)
            page_infos = _device_page_infos(
                pages_per_chunk[ci], order,
                (lambda ci=ci: _moments_np()[ci * rows_per_chunk :]), nt,
                has_secondary=has_sec, state_dtype=plt.np_dtype,
            )
            var_list = [("primary", lvc, bins, order, ci * rows_per_chunk, dev_rows)]
            if has_sec:
                var_list.append(
                    ("secondary", lvc_s, bins_s, 0, sec_row_of[ci], sec_rows_dev)
                )

        cand = cmp.ChunkCompressor(meta, lvcs_pv, page_infos)
        if cand.should_fallback(nt.latent, cn, counts):
            ccs[ci] = cmp.fallback_chunk_compressor(
                nt, _nums_np(start, start + cn), pages_per_chunk[ci]
            )
            chunk_jobs[ci] = ("host", None)
            start += cn
            continue
        ccs[ci] = cand
        start += cn

        # trivial vars (single zero-offset bin) write no body bits: skip
        # their kernel job; the assembler emits empty sections for them
        nontrivial = [v for v in var_list if not v[1].is_trivial]
        if not nontrivial:
            chunk_jobs[ci] = ("host", None)
            continue
        jobs_out = []
        ok = True
        for var, v_lvc, v_bins, v_order, row_start, src in nontrivial:
            nexts, lowers, t1, t2, ts = build_enc_tables(
                meta.per_latent_var.get(var)
            )
            b = len(lowers)
            max_ob = int(v_lvc.max_offset_bits)
            worst_bits = (
                float(np.max(v_bins.worst_case_bits_per_latent(v_lvc.ans_size_log)))
                if b else 0.0
            )
            sec_words = int(-(-int(page_n * (worst_bits + 1) + 64) // 32 // 128) * 128)
            if not (ts <= 4096 and b <= 2048 and sec_words <= 3072):
                ok = False
                break
            ob_class = 0 if max_ob == 0 else (32 if max_ob <= 32 else 64)
            key = (page_n, ob_class, max(sec_words, 128))
            jobs_out.append((key, {
                "ci": ci, "cc": ccs[ci], "tables": (nexts, lowers, t1, t2, ts),
                "b": b, "max_ob": max_ob, "var": var,
                "rkey": (ci, var) if len(var_list) > 1 else ci,
                "dev": {"row_start": row_start, "order": v_order,
                        "n_pages": len(pages_per_chunk[ci]), "src": src},
            }))
        if not ok:
            # kernel limits: re-train on host (rare, pathological tables)
            chunk_config = _dc_replace(
                config, paging_spec=PagingSpec.exact_pages(pages_per_chunk[ci])
            )
            ccs[ci] = cmp.chunk_compressor(nt, _nums_np(start - cn, start), chunk_config)
            chunk_jobs[ci] = ("host", None)
            continue
        for key, job in jobs_out:
            groups.setdefault(key, []).append(job)
        chunk_jobs[ci] = ("device", [j for _, j in jobs_out])

    _t0 = _trace("host train+jobs", _t0)
    return nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows


def _train_from_histogram(unopt, n_latents, unoptimized_bins_log, latent_type,
                          ans_cap=None):
    """train_infos (codec/compress.py) with the histogram precomputed."""
    return cmp.train_from_histogram(unopt, n_latents, unoptimized_bins_log,
                                    latent_type, ans_cap)


class _DevicePageInfos:
    """Lazy PageInfo sequence: tens of thousands of pages per chunk make
    eager construction a measurable part of plan time; the writer touches
    each page once, so build on access instead.

    Delta states are raw latents in page metadata — latent width matters
    (metadata/page_latent_var.rs:18-50).

    chunk_moments may be a zero-arg callable (lazy device fetch): the
    file-image assembler never touches host states, so the host moments
    transfer only happens when the host page writer actually runs."""

    def __init__(self, per_page: List[int], order: int, chunk_moments, nt,
                 has_secondary: bool = False, state_dtype=None):
        self.per_page = per_page
        self.order = order
        self.has_secondary = has_secondary
        ldt = state_dtype if state_dtype is not None else nt.latent.np_dtype
        self.empty = np.zeros(0, dtype=ldt)
        self._moments = chunk_moments
        self._states = None
        self.starts = np.concatenate([[0], np.cumsum(per_page)])

    @property
    def states(self):
        if self._states is None:
            m = self._moments() if callable(self._moments) else self._moments
            self._states = np.ascontiguousarray(
                m[: len(self.per_page), : self.order]
            ).astype(self.empty.dtype)
        return self._states

    def __len__(self):
        return len(self.per_page)

    def stored_counts(self, key: str) -> np.ndarray:
        """Vectorized per-page stored-latent counts (piv.end - piv.start):
        the launch builder needs them for every page, and materializing
        tens of thousands of PageInfo objects costs ~0.1 s per encode on
        this 1-core host."""
        pp = np.asarray(self.per_page, np.int64)
        if key == "primary" and self.order:
            return np.maximum(pp - self.order, 0)
        return pp

    def __getitem__(self, pi):
        if isinstance(pi, slice):
            return [self[i] for i in range(*pi.indices(len(self)))]
        pn = self.per_page[pi]
        start = int(self.starts[pi])
        end = start + pn
        if self.order:
            piv = cmp.PageInfoVar(self.states[pi], min(start + self.order, end), end)
        else:
            piv = cmp.PageInfoVar(self.empty, start, end)
        sec = (
            cmp.PageInfoVar(self.empty, start, end) if self.has_secondary else None
        )
        return cmp.PageInfo(pn, PerLatentVar(None, piv, sec))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def _device_page_infos(per_page: List[int], order: int, chunk_moments: np.ndarray, nt,
                       has_secondary: bool = False, state_dtype=None):
    return _DevicePageInfos(per_page, order, chunk_moments, nt, has_secondary,
                            state_dtype)


class _LookbackPageInfos:
    """Lazy PageInfo sequence for device-encoded lookback chunks: the
    primary var's body starts after the state_n raw front latents (stored
    as the page's delta state, ref: metadata/page_latent_var.rs:18-50) and
    the u32 lookback var indexes its own flat latent space (page_n - state_n
    entries per page, empty page state)."""

    def __init__(self, per_page: List[int], state_n: int, states: np.ndarray):
        self.per_page = per_page
        self.state_n = state_n
        self.states = states  # (n_pages, state_n) in the primary latent dtype
        self.starts = np.concatenate([[0], np.cumsum(per_page)])
        pp = np.asarray(per_page, np.int64)
        self.lb_starts = np.concatenate(
            [[0], np.cumsum(np.maximum(pp - state_n, 0))]
        )
        self.empty_u32 = np.zeros(0, dtype=np.uint32)

    def __len__(self):
        return len(self.per_page)

    def stored_counts(self, key: str) -> np.ndarray:
        pp = np.asarray(self.per_page, np.int64)
        if key == "delta":
            return np.maximum(pp - self.state_n, 0)
        return np.maximum(pp - np.minimum(self.state_n, pp), 0)

    def __getitem__(self, pi):
        if isinstance(pi, slice):
            return [self[i] for i in range(*pi.indices(len(self)))]
        pn = self.per_page[pi]
        start = int(self.starts[pi])
        end = start + pn
        piv = cmp.PageInfoVar(self.states[pi], min(start + self.state_n, end), end)
        dpiv = cmp.PageInfoVar(
            self.empty_u32, int(self.lb_starts[pi]), int(self.lb_starts[pi + 1])
        )
        return cmp.PageInfo(pn, PerLatentVar(dpiv, piv, None))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
