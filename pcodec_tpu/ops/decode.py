"""Device (JAX/XLA) page-body decoder.

Design (TPU-first, not a port): throughput comes from *breadth* — the
inherently serial 4-stream interleaved tANS walk of each page runs as a
`lax.scan` whose every operation is vectorized across many pages (vmap
lanes), so table lookups and bit-window loads become wide gathers on the
VPU. Everything after the symbol walk — offset gathers at prefix-summed bit
positions, delta reconstruction as cascaded cumsums, and mode joins — is
embarrassingly parallel vector work.

Stage parity with the host path (which mirrors ref:
pco/src/page_latent_decompressor.rs):
  scan:   read_full_ans_symbols  -> per-symbol state_idx + bit cursor
  post:   read_offsets           -> gather-by-bit-index + add lower
  post:   delta::decode_in_place -> k cascaded cumsums (consecutive)
  post:   T::join_latents        -> vectorized mode formulas

All latent arithmetic runs in uint64; wrapping for narrower latent types is
recovered by masking (add/mul/cumsum are ring homomorphisms mod 2^bits).
Pages with identical schema (mode kind, delta kind/order, dtype, batch
count) share one jitted kernel. Lookback and conv1 pages fall back to the
host path for now.
"""

import time
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from pcodec_tpu import constants as c
from pcodec_tpu.dtypes import NUMBER_TYPES, NumberType
from pcodec_tpu.format import ans
from pcodec_tpu.format.bitio import BitReader
from pcodec_tpu.format.metadata import ChunkMeta, DeltaEncoding, Mode, PageMeta
from pcodec_tpu.codec.standalone import FileDecompressor

QUADS_PER_BATCH = c.FULL_BATCH_N // c.ANS_INTERLEAVING  # 64
N_VARS = 3  # delta, primary, secondary (padded with 1-entry no-op tables)
_PAD_TAIL = 8  # extra latent slots so n (= body + order) fits past n_batches*256

_NT_BY_NAME = {t.name: t for t in NUMBER_TYPES}


# ---------------------------------------------------------------------------
# host-side planning
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TaskSchema:
    """Static (compile-time) properties shared by one kernel instantiation."""

    mode_kind: str
    delta_kind: str
    delta_order: int
    secondary_uses_delta: bool
    has_secondary: bool
    nt_name: str
    n_batches: int
    seg_bytes: int
    dict_len: int
    max_ob: int = 64  # max offset bits across the group (shrinks the window)
    lookback_state_n: int = 0


@dataclass
class Task:
    nt: NumberType
    meta: ChunkMeta
    n: int
    body_bit_start: int
    segment: np.ndarray
    var_table_off: np.ndarray  # (3,)
    var_body_n: np.ndarray  # (3,)
    init_state_idxs: np.ndarray  # (3, 4)
    moments: np.ndarray  # (3, 32) uint64 (delta state: consecutive moments /
    #   lookback stored state / conv1 initial latents)
    aux: np.ndarray  # (36,) int64: [window_n, conv1_quant, conv1_bias, conv1_weights...]
    mode_scalar: int
    dict_vals: Optional[np.ndarray]


class DevicePlan:
    def __init__(self):
        self.node_chunks: List[np.ndarray] = []
        self.lower_chunks: List[np.ndarray] = []
        self.table_cursor = 0
        self.tasks: List[Task] = []
        self.fallback_arrays: List[tuple] = []  # (order_key, np array)
        self.order_keys: List[tuple] = []  # sequence of ("task", i) / ("fallback", i)

    def add_var_table(self, var_meta) -> int:
        bins = var_meta.bins
        spec = ans.Spec.from_weights(var_meta.ans_size_log, bins.weights.tolist())
        dec = ans.Decoder(spec, bins.offset_bits.tolist())
        node = (
            dec.bits_to_read.astype(np.int32)
            | (dec.offset_bits.astype(np.int32) << 4)
            | (dec.next_state_idx_base.astype(np.int32) << 11)
        )
        if len(bins) > 0:
            sym = np.minimum(spec.state_symbols, len(bins) - 1)
            lowers = np.where(
                spec.state_symbols < len(bins), bins.lowers[sym].astype(np.uint64), np.uint64(0)
            )
        else:
            lowers = np.zeros(spec.table_size, dtype=np.uint64)
        off = self.table_cursor
        self.node_chunks.append(node)
        self.lower_chunks.append(lowers)
        self.table_cursor += len(node)
        return off

    def flat_tables(self):
        if not self.node_chunks:
            return np.zeros(1, np.int32), np.zeros(1, np.uint64)
        from pcodec_tpu.utils import concat
        return concat(self.node_chunks), concat(self.lower_chunks)


def _walk_page_body(reader: BitReader, meta: ChunkMeta, nt, page_start_bit: int, n: int):
    """Advance the host reader past one page (meta + body).

    Uses the native whole-page decode when available; the result is
    discarded — only the end position is needed to find the next chunk.
    """
    from pcodec_tpu.codec.decompress import PageDecompressor

    reader.bit_idx = page_start_bit
    pd = PageDecompressor(reader, meta, nt, n)
    scratch = np.zeros(n, dtype=nt.np_dtype)
    pd.read_page_fast(scratch)
    return reader.bit_idx


def plan_standalone_file(data: bytes) -> DevicePlan:
    """Parse all metadata on the host and plan device tasks.

    Note: locating chunk boundaries in a *standalone* file inherently
    requires walking the ANS symbol lengths (the format stores no chunk byte
    sizes — the wrapped format delegates that to the outer container, ref:
    README.md "wrapped or standalone"). Production parallel decode should
    store page byte ranges externally; bench timings therefore report the
    device decode given known boundaries.
    """
    from pcodec_tpu.codec.decompress import PageDecompressor
    from pcodec_tpu.dtypes import U64
    from pcodec_tpu.format.metadata import Bins, ChunkLatentVarMeta

    plan = DevicePlan()
    reader = BitReader(data)
    fd = FileDecompressor.new(reader)

    noop_off = plan.add_var_table(ChunkLatentVarMeta(0, Bins.empty(U64)))
    raw = np.frombuffer(data, dtype=np.uint8)

    while True:
        pre = fd.chunk_preamble(reader)
        if pre is None:
            break
        nt, n = pre
        meta = ChunkMeta.read_from(reader, fd.format_version, nt.latent)
        page_start_bit = reader.bit_idx

        de = meta.delta_encoding
        supported = de.kind in (
            DeltaEncoding.NOOP,
            DeltaEncoding.CONSECUTIVE,
            DeltaEncoding.CONV1,
        ) or (de.kind == DeltaEncoding.LOOKBACK and de.state_n <= 32 and n > de.state_n)
        if meta.mode.kind == Mode.FLOAT_MULT and nt.latent.bits == 64:
            from pcodec_tpu.ops.pallas_decode import float_mult_f64_device_ok

            if not float_mult_f64_device_ok(meta, nt):
                supported = False
        if not supported:
            pd = PageDecompressor(reader, meta, nt, n)
            dst = np.zeros(n, dtype=nt.np_dtype)
            pd.read(dst)
            plan.order_keys.append(("fallback", len(plan.fallback_arrays)))
            plan.fallback_arrays.append(dst)
            continue

        page_meta = PageMeta.read_from(reader, meta)
        body_bit_start = reader.bit_idx

        var_off = np.full(N_VARS, noop_off, dtype=np.int32)
        var_body = np.zeros(N_VARS, dtype=np.int32)
        init_idxs = np.zeros((N_VARS, 4), dtype=np.int32)
        moments = np.zeros((N_VARS, 32), dtype=np.uint64)
        aux = np.zeros(36, dtype=np.int64)
        if de.kind == DeltaEncoding.LOOKBACK:
            aux[0] = de.window_n
        elif de.kind == DeltaEncoding.CONV1:
            aux[1] = de.quantization
            aux[2] = de.bias
            aux[3 : 3 + len(de.weights)] = np.array(de.weights, dtype=np.int64)
        for vi, key in enumerate(("delta", "primary", "secondary")):
            var_meta = meta.per_latent_var.get(key)
            if var_meta is None:
                continue
            de = meta.delta_encoding.for_latent_var(key)
            state_n = de.n_latents_per_state()
            trivial = var_meta.bins.are_trivial()
            if not trivial:
                var_off[vi] = plan.add_var_table(var_meta)
                var_body[vi] = max(0, n - state_n)
            else:
                # single bin, zero offset bits -> constant lower, empty body
                var_off[vi] = plan.add_var_table(var_meta)
                var_body[vi] = 0
            pvm = page_meta.per_latent_var.get(key)
            init_idxs[vi] = np.array(pvm.ans_final_state_idxs, dtype=np.int32)
            st = pvm.delta_state.astype(np.uint64)
            moments[vi, : len(st)] = st

        end_bit = _walk_page_body(reader, meta, nt, page_start_bit, n)
        seg_start = page_start_bit // 8
        seg_end = (end_bit + 7) // 8
        segment = raw[seg_start:seg_end].copy()

        mode_scalar = 0
        dict_vals = None
        if meta.mode.kind in (Mode.INT_MULT, Mode.FLOAT_MULT, Mode.FLOAT_QUANT):
            mode_scalar = int(meta.mode.payload)
        elif meta.mode.kind == Mode.DICT:
            dict_vals = meta.mode.payload.astype(np.uint64)

        plan.order_keys.append(("task", len(plan.tasks)))
        plan.tasks.append(
            Task(
                nt=nt,
                meta=meta,
                n=n,
                body_bit_start=body_bit_start - seg_start * 8,
                segment=segment,
                var_table_off=var_off,
                var_body_n=var_body,
                init_state_idxs=init_idxs,
                moments=moments,
                mode_scalar=mode_scalar,
                dict_vals=dict_vals,
                aux=aux,
            )
        )
    return plan


# ---------------------------------------------------------------------------
# kernel pieces (single task; vmapped across tasks)
# ---------------------------------------------------------------------------


def _overlapping_u32(segs):
    """seg32o[t, b] = 4 bytes of segs[t] at byte offset b, as uint32.

    Built with shifted adds (no gathers); lets the scan fetch any <=25-bit
    window with a single gather."""
    s = segs.astype(jnp.uint32)
    out = s
    for k in range(1, 4):
        shifted = jnp.concatenate(
            [s[:, k:], jnp.zeros((s.shape[0], k), jnp.uint32)], axis=1
        )
        out = out | (shifted << jnp.uint32(8 * k))
    return out


def _overlapping_u64(segs):
    """seg64o[t, b] = 8 bytes of segs[t] at byte offset b, as uint64."""
    s = segs.astype(jnp.uint64)
    out = s
    for k in range(1, 8):
        shifted = jnp.concatenate(
            [s[:, k:], jnp.zeros((s.shape[0], k), jnp.uint64)], axis=1
        )
        out = out | (shifted << jnp.uint64(8 * k))
    return out


def _ans_scan_single(seg32, node_flat, start_bit, table_off, body_n, init_states, n_batches):
    """4-stream interleaved tANS walk over all batches and up to 3 vars.

    The outer scan runs over flattened (batch, var) steps — vars are
    sequential sections within each batch of the bitstream, so folding them
    into the scan dimension (instead of unrolling) keeps the HLO 3x smaller.
    """

    def step_body(carry, step):
        states, cursor = carry  # (3, 4) int32, int32
        b = step // N_VARS
        v = step % N_VARS
        valid_count = jnp.clip(body_n[v] - b * c.FULL_BATCH_N, 0, c.FULL_BATCH_N)
        toff = table_off[v]

        def quad_body(carry_q, q):
            st4, cur, obsum = carry_q
            idxs = []
            obs = []
            new_st = []
            for j in range(4):
                valid = (q * 4 + j) < valid_count
                st = st4[j]
                node = node_flat[toff + st]
                bits = node & 15
                ob = jnp.where(valid, (node >> 4) & 127, 0)
                base = node >> 11
                byte = cur >> 3
                sh = cur & 7
                w = seg32[byte].astype(jnp.int32)
                val = (w >> sh) & ((1 << bits) - 1)
                cur = cur + jnp.where(valid, bits, 0)
                obsum = obsum + ob
                idxs.append(st)
                obs.append(ob)
                new_st.append(jnp.where(valid, base + val, st))
            return (jnp.stack(new_st), cur, obsum), (jnp.stack(idxs), jnp.stack(obs))

        (st4, cursor, obsum), (idx_quads, ob_quads) = jax.lax.scan(
            quad_body,
            (states[v], cursor, jnp.int32(0)),
            jnp.arange(QUADS_PER_BATCH, dtype=jnp.int32),
        )
        states = states.at[v].set(st4)
        offsets_start = cursor
        cursor = cursor + obsum
        return (states, cursor), (
            idx_quads.reshape(c.FULL_BATCH_N),
            ob_quads.reshape(c.FULL_BATCH_N),
            offsets_start,
        )

    (_, _), (state_idx, ob, offsets_start) = jax.lax.scan(
        step_body,
        (init_states, start_bit),
        jnp.arange(n_batches * N_VARS, dtype=jnp.int32),
    )
    return (
        state_idx.reshape(n_batches, N_VARS, c.FULL_BATCH_N),
        ob.reshape(n_batches, N_VARS, c.FULL_BATCH_N),
        offsets_start.reshape(n_batches, N_VARS),
    )


def _gather_bits64(seg32, seg64, bit_pos, nbits, max_bits=64):
    """Vectorized read of up to `max_bits` bits at arbitrary bit positions.

    Uses precomputed overlapping windows: one u32 gather for <=25-bit reads,
    one u64 gather for <=57, two for wider — vs. up to nine byte gathers.
    """
    byte = (bit_pos >> 3).astype(jnp.int64)
    sh = (bit_pos & 7).astype(jnp.uint64)
    if max_bits <= 25:
        val = seg32[byte].astype(jnp.uint64) >> sh
    else:
        val = seg64[byte] >> sh
        if max_bits > 57:
            w2 = seg64[byte + 7] << (jnp.uint64(56) - sh)
            val = val | w2
    nbits = nbits.astype(jnp.uint64)
    mask = jnp.where(
        nbits >= 64,
        jnp.uint64(0xFFFFFFFFFFFFFFFF),
        (jnp.uint64(1) << jnp.minimum(nbits, 63)) - jnp.uint64(1),
    )
    return val & mask


def _var_latents(
    seg32, seg64, lower_flat, toff, body_n, state_idx, ob, offsets_start, const_lower, max_ob
):
    """latents[p] = bin.lower + offset (padded positions = const_lower).

    `ob` (offset bits per symbol) comes straight from the scan output, so the
    only table lookup left here is the bin lower."""
    n_batches = state_idx.shape[0]
    si = state_idx + toff
    if max_ob > 0:
        csum_excl = jnp.cumsum(ob, axis=1) - ob
        bit_pos = offsets_start[:, None].astype(jnp.int64) + csum_excl.astype(jnp.int64)
        offs = _gather_bits64(seg32, seg64, bit_pos, ob, max_bits=max_ob)
    else:
        offs = jnp.zeros(si.shape, dtype=jnp.uint64)
    lowers = lower_flat[si]
    pos = (
        jnp.arange(n_batches, dtype=jnp.int32)[:, None] * c.FULL_BATCH_N
        + jnp.arange(c.FULL_BATCH_N, dtype=jnp.int32)[None, :]
    )
    valid = pos < body_n
    latents = jnp.where(valid, lowers + offs, const_lower)
    flat = latents.reshape(-1)
    return jnp.concatenate([flat, jnp.full(_PAD_TAIL, const_lower, jnp.uint64)])


def _consecutive_decode(latents, moments, order, latent_bits):
    mid = jnp.uint64(1 << (latent_bits - 1))
    out = latents + mid  # toggle center (wrapping mod 2^bits via final mask)
    for j in range(order - 1, -1, -1):
        cs = jnp.cumsum(out)
        out = moments[j] + jnp.concatenate([jnp.zeros(1, jnp.uint64), cs[:-1]])
    return out


def _lookback_decode(latents, lookbacks, stored_state, window_n, state_n, latent_bits):
    """Whole-page lookback decode via log-depth pointer doubling.

    value[p] = delta[p] + value[p - lb[p]]; the first state_n positions are
    the stored state, references before the page read the zero window
    prefill (spec: docs/format.md Lookback; ref: delta/lookback.rs:200-246).
    Out-of-window lookbacks are clamped to 1 (the host path raises; device
    bit-exactness against the host is asserted for valid files).
    """
    P = latents.shape[0]
    mid = jnp.uint64(1 << (latent_bits - 1))
    deltas = latents + mid  # toggle center
    pos = jnp.arange(P, dtype=jnp.int64)
    in_state = pos < state_n
    add = jnp.where(
        in_state,
        stored_state[jnp.minimum(pos, 31)],
        deltas[jnp.maximum(pos - state_n, 0)],
    )
    lb = lookbacks[jnp.maximum(pos - state_n, 0)].astype(jnp.int64)
    lb = jnp.clip(lb, 1, window_n.astype(jnp.int64))
    ptr = jnp.where(in_state, jnp.int64(-1), pos - lb)
    rounds = max(P - 1, 1).bit_length()
    for _ in range(rounds):
        active = ptr >= 0
        j = jnp.maximum(ptr, 0)
        add = jnp.where(active, add + add[j], add)
        ptr = jnp.where(active, ptr[j], ptr)
    return add


def _conv1_decode(latents, stored_state, aux, order, latent_bits):
    """Serial LPC recurrence as a lax.scan with the rolling window in carry.

    value[p] = delta[p] + ((bias + Σ w_j * value[p-order+j]) >> q), arithmetic
    in signed 64-bit (validated to fit; spec: docs/format.md Conv1).
    """
    quant = aux[1].astype(jnp.int64)
    bias = aux[2].astype(jnp.int64)
    weights = aux[3 : 3 + order].astype(jnp.int64)
    mid = jnp.int64(1 << (latent_bits - 1))
    mask = jnp.int64((1 << latent_bits) - 1)
    window0 = stored_state[:order].astype(jnp.int64)

    def step(window, delta):
        s = bias + jnp.sum(weights * window)
        pred = jnp.maximum(s, 0) >> quant
        val = (delta.astype(jnp.int64) + mid + pred) & mask
        new_window = jnp.concatenate([window[1:], val[None]])
        return new_window, val

    _, vals = jax.lax.scan(step, window0, latents)
    # first `order` outputs are the stored state; the rest shift by `order`
    P = latents.shape[0]
    pos = jnp.arange(P, dtype=jnp.int64)
    out = jnp.where(
        pos < order,
        stored_state[jnp.minimum(pos, 31)].astype(jnp.int64) & mask,
        vals[jnp.maximum(pos - order, 0)],
    )
    return out.astype(jnp.uint64)


# ---------------------------------------------------------------------------
# mode joins (jnp mirrors of pcodec_tpu/modes.join_latents)
# ---------------------------------------------------------------------------


def _uint_dtype(bits):
    return {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32, 64: jnp.uint64}[bits]


def _float_dtype(bits):
    return {16: jnp.float16, 32: jnp.float32, 64: jnp.float64}[bits]


def _mask_of(bits):
    return jnp.uint64(0xFFFFFFFFFFFFFFFF) if bits == 64 else jnp.uint64((1 << bits) - 1)


def _from_latent_ordered_u(nt: NumberType, l):
    """latent -> raw memory bits of the number, as uint64."""
    bits = nt.latent.bits
    mask = _mask_of(bits)
    l = l & mask
    if nt.kind == "unsigned":
        return l
    mid = jnp.uint64(1 << (bits - 1))
    if nt.kind == "signed":
        return (l ^ mid) & mask
    pos = (l & mid) != 0
    return jnp.where(pos, l ^ mid, (~l) & mask)


def _bitcast_float_to_u64(nt: NumberType, f):
    """float -> uint64 bit pattern; 64-bit goes via u32 pairs because the
    TPU X64 rewriter does not implement f64<->u64 bitcasts."""
    bits = nt.latent.bits
    if bits < 64:
        return jax.lax.bitcast_convert_type(f, _uint_dtype(bits)).astype(jnp.uint64)
    parts = jax.lax.bitcast_convert_type(f, jnp.uint32)  # (..., 2) little-endian
    lo = parts[..., 0].astype(jnp.uint64)
    hi = parts[..., 1].astype(jnp.uint64)
    return lo | (hi << jnp.uint64(32))


def _bitcast_u64_to_float(nt: NumberType, u):
    bits = nt.latent.bits
    if bits < 64:
        return jax.lax.bitcast_convert_type(u.astype(_uint_dtype(bits)), _float_dtype(bits))
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    parts = jnp.stack([lo, hi], axis=-1)
    return jax.lax.bitcast_convert_type(parts, jnp.float64)


def _to_latent_ordered_float(nt: NumberType, f):
    bits = nt.latent.bits
    mem = _bitcast_float_to_u64(nt, f)
    mid = jnp.uint64(1 << (bits - 1))
    mask = _mask_of(bits)
    neg = (mem & mid) != 0
    return jnp.where(neg, (~mem) & mask, mem ^ mid)


def _int_float_from_latent(nt: NumberType, l):
    bits = nt.latent.bits
    mid = jnp.uint64(1 << (bits - 1))
    negative = l < mid
    abs_int = jnp.where(negative, (mid - jnp.uint64(1)) - l, l - mid)
    gpi = jnp.uint64(1 << nt.mantissa_digits)
    fdtype = _float_dtype(bits)
    gpi_float_bits = jnp.uint64(
        int(np.asarray(nt.np_dtype.type(1 << nt.mantissa_digits)).view(nt.latent.np_dtype))
    )
    small = abs_int < gpi
    small_float = jnp.where(small, abs_int, jnp.uint64(0)).astype(fdtype)
    big_bits = gpi_float_bits + (abs_int - gpi)
    big_float = _bitcast_u64_to_float(nt, big_bits)
    abs_float = jnp.where(small, small_float, big_float)
    return jnp.where(negative, -abs_float, abs_float)


def _join(nt: NumberType, mode_kind: str, mode_scalar, dict_vals, primary, secondary):
    bits = nt.latent.bits
    mask = _mask_of(bits)
    if mode_kind == Mode.CLASSIC:
        u_latent = primary & mask
    elif mode_kind == Mode.DICT:
        idx = jnp.minimum(primary & _mask_of(32), jnp.uint64(dict_vals.shape[0] - 1)).astype(
            jnp.int32
        )
        u_latent = dict_vals[idx] & mask
    elif mode_kind == Mode.INT_MULT:
        u_latent = ((primary & mask) * mode_scalar + (secondary & mask)) & mask
    elif mode_kind == Mode.FLOAT_QUANT:
        k = mode_scalar
        y = primary & mask
        m = secondary & mask
        sign_cutoff = jnp.uint64(1 << (bits - 1)) >> k
        low_max = ((jnp.uint64(1) << k) - jnp.uint64(1)) & mask
        lowest = jnp.where(y >= sign_cutoff, m, low_max - m)
        u_latent = ((y << k) + lowest) & mask
    elif mode_kind == Mode.FLOAT_MULT:
        mid = jnp.uint64(1 << (bits - 1))
        if bits == 64:
            # integer-exact softfloat multiply: TPU f64 is not bit-faithful
            # and the X64 rewriter rejects f64-involved bitcasts here. The
            # general IEEE mul covers subnormal products and any multiplier.
            from pcodec_tpu.ops import softfloat as sf

            base_bits = _from_latent_ordered_u(nt, mode_scalar)
            mult_bits = sf.int_float_latent_to_bits(primary & mask, 64, 11, 53)
            unadj_mem = sf.sf_mul_bits(mult_bits, base_bits, 64, 11, 53)
            unadj_lat = sf.ordered_from_bits(unadj_mem, 64)
            u_latent = (unadj_lat + (secondary & mask) + mid) & mask
        else:
            base_bits = _from_latent_ordered_u(nt, mode_scalar)
            base_f = _bitcast_u64_to_float(nt, base_bits)
            mult = _int_float_from_latent(nt, primary & mask)
            unadj = mult * base_f
            u_latent = (_to_latent_ordered_float(nt, unadj) + (secondary & mask) + mid) & mask
    else:
        raise NotImplementedError(mode_kind)

    mem = _from_latent_ordered_u(nt, u_latent)
    if nt.kind == "float":
        # return raw u64 memory bits: this TPU does not represent or
        # transfer f64 bit-faithfully (NOTES.md); hosts view-cast via
        # numbers_from_device_out
        return mem
    if nt.kind == "signed":
        # same-width integer converts are bit-preserving (C static_cast)
        sdtype = {8: jnp.int8, 16: jnp.int16, 32: jnp.int32, 64: jnp.int64}[bits]
        return mem.astype(_uint_dtype(bits)).astype(sdtype)
    return mem.astype(_uint_dtype(bits))


def numbers_from_device_out(nt: NumberType, arr: np.ndarray) -> np.ndarray:
    """Host-side conversion of decode_group_kernel output to numbers
    (floats come back as u64 memory bits)."""
    if nt.kind == "float":
        return np.ascontiguousarray(
            np.asarray(arr).astype(nt.latent.np_dtype)
        ).view(nt.np_dtype)
    return np.asarray(arr).astype(nt.np_dtype)


# ---------------------------------------------------------------------------
# jitted group kernel + driver
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("schema",))
def decode_group_kernel(
    segs, start_bits, table_offs, body_ns, init_states, moments, mode_scalars,
    dicts, const_lowers, auxs, node_flat, lower_flat, schema: TaskSchema,
):
    nt = _NT_BY_NAME[schema.nt_name]

    seg32 = _overlapping_u32(segs)
    seg64 = _overlapping_u64(segs) if schema.max_ob > 25 else seg32

    scan = jax.vmap(
        lambda s32, sb, to, bn, ist: _ans_scan_single(
            s32, node_flat, sb, to, bn, ist, schema.n_batches
        )
    )
    state_idx, ob, offsets_start = scan(seg32, start_bits, table_offs, body_ns, init_states)

    def decode_one(s32, s64, to, bn, si, vob, os, mom, mscalar, dvals, clower, aux):
        vlat = [
            _var_latents(
                s32, s64, lower_flat, to[v], bn[v], si[:, v], vob[:, v], os[:, v],
                clower[v], schema.max_ob,
            )
            for v in range(N_VARS)
        ]
        primary, secondary = vlat[1], vlat[2]
        if schema.delta_kind == DeltaEncoding.CONSECUTIVE:
            primary = _consecutive_decode(primary, mom[1], schema.delta_order, nt.latent.bits)
            if schema.secondary_uses_delta and schema.has_secondary:
                secondary = _consecutive_decode(secondary, mom[2], schema.delta_order, nt.latent.bits)
        elif schema.delta_kind == DeltaEncoding.LOOKBACK:
            window_n = aux[0]
            primary = _lookback_decode(
                primary, vlat[0], mom[1], window_n, schema.lookback_state_n, nt.latent.bits
            )
            if schema.secondary_uses_delta and schema.has_secondary:
                secondary = _lookback_decode(
                    secondary, vlat[0], mom[2], window_n, schema.lookback_state_n, nt.latent.bits
                )
        elif schema.delta_kind == DeltaEncoding.CONV1:
            primary = _conv1_decode(primary, mom[1], aux, schema.delta_order, nt.latent.bits)
        return _join(nt, schema.mode_kind, mscalar, dvals, primary, secondary)

    return jax.vmap(decode_one)(
        seg32, seg64, table_offs, body_ns, state_idx, ob, offsets_start, moments,
        mode_scalars, dicts, const_lowers, auxs,
    )


def build_group_arrays(items: List[Task], schema: TaskSchema):
    T = len(items)
    segs = np.zeros((T, schema.seg_bytes), dtype=np.uint8)
    start_bits = np.zeros(T, dtype=np.int32)
    table_offs = np.zeros((T, N_VARS), dtype=np.int32)
    body_ns = np.zeros((T, N_VARS), dtype=np.int32)
    init_states = np.zeros((T, N_VARS, 4), dtype=np.int32)
    moments = np.zeros((T, N_VARS, 32), dtype=np.uint64)
    auxs = np.zeros((T, 36), dtype=np.int64)
    mode_scalars = np.zeros(T, dtype=np.uint64)
    dicts = np.zeros((T, max(schema.dict_len, 1)), dtype=np.uint64)
    const_lowers = np.zeros((T, N_VARS), dtype=np.uint64)
    for i, t in enumerate(items):
        segs[i, : len(t.segment)] = t.segment
        start_bits[i] = t.body_bit_start
        table_offs[i] = t.var_table_off
        body_ns[i] = t.var_body_n
        init_states[i] = t.init_state_idxs
        moments[i] = t.moments
        auxs[i] = t.aux
        mode_scalars[i] = t.mode_scalar
        if t.dict_vals is not None:
            dicts[i, : len(t.dict_vals)] = t.dict_vals
        for vi, key in enumerate(("delta", "primary", "secondary")):
            vm = t.meta.per_latent_var.get(key)
            if vm is not None and len(vm.bins) >= 1 and t.var_body_n[vi] == 0:
                const_lowers[i, vi] = np.uint64(vm.bins.lowers[0])
    return segs, start_bits, table_offs, body_ns, init_states, moments, mode_scalars, dicts, const_lowers, auxs


def group_tasks(plan: DevicePlan):
    """Group tasks into (schema, [task indices]) with padded static shapes."""
    raw_groups = {}
    for ti, t in enumerate(plan.tasks):
        de = t.meta.delta_encoding
        key = (
            t.meta.mode.kind,
            de.kind,
            de.order if de.kind in (DeltaEncoding.CONSECUTIVE, DeltaEncoding.CONV1) else 0,
            de.state_n if de.kind == DeltaEncoding.LOOKBACK else 0,
            de.secondary_uses_delta,
            t.meta.per_latent_var.secondary is not None,
            t.nt.name,
        )
        raw_groups.setdefault(key, []).append(ti)

    result = []
    for key, tis in raw_groups.items():
        mode_kind, delta_kind, order, lb_state_n, sud, has_sec, nt_name = key
        n_batches = max(
            max(1, -(-int(plan.tasks[ti].var_body_n.max()) // c.FULL_BATCH_N)) for ti in tis
        )
        seg_bytes = max(len(plan.tasks[ti].segment) for ti in tis) + 16
        dict_len = max(
            (0 if plan.tasks[ti].dict_vals is None else len(plan.tasks[ti].dict_vals))
            for ti in tis
        )
        max_ob = 0
        for ti in tis:
            for _, vm in plan.tasks[ti].meta.per_latent_var.enumerated():
                max_ob = max(max_ob, vm.bins.max_offset_bits())
        schema = TaskSchema(
            mode_kind=mode_kind,
            delta_kind=delta_kind,
            delta_order=order,
            secondary_uses_delta=sud,
            has_secondary=has_sec,
            nt_name=nt_name,
            n_batches=n_batches,
            seg_bytes=seg_bytes,
            dict_len=dict_len,
            max_ob=max_ob,
            lookback_state_n=lb_state_n,
        )
        result.append((schema, tis))
    return result


def decode_standalone_with_device(data: bytes, time_it: bool = False):
    """Decode a standalone file on the device path (host fallback for
    lookback/conv1 chunks). Returns (array, device_seconds)."""
    plan = plan_standalone_file(data)
    node_flat, lower_flat = plan.flat_tables()
    node_flat_j = jnp.asarray(node_flat)
    lower_flat_j = jnp.asarray(lower_flat)

    task_outputs = {}
    device_seconds = 0.0
    for schema, tis in group_tasks(plan):
        items = [plan.tasks[ti] for ti in tis]
        arrays = build_group_arrays(items, schema)
        args = tuple(jnp.asarray(a) for a in arrays) + (node_flat_j, lower_flat_j)
        out = decode_group_kernel(*args, schema=schema)
        out.block_until_ready()
        if time_it:
            t0 = time.perf_counter()
            out = decode_group_kernel(*args, schema=schema)
            out.block_until_ready()
            device_seconds += time.perf_counter() - t0
        out_np = np.asarray(out)
        for i, ti in enumerate(tis):
            t = plan.tasks[ti]
            task_outputs[ti] = numbers_from_device_out(t.nt, out_np[i, : t.n])

    pieces = []
    for kind, idx in plan.order_keys:
        pieces.append(plan.fallback_arrays[idx] if kind == "fallback" else task_outputs[idx])
    if not pieces:
        return np.zeros(0, dtype=np.float64), device_seconds
    from pcodec_tpu.utils import concat
    return concat(pieces), device_seconds
