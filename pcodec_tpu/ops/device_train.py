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

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pcodec_tpu import constants as c
from pcodec_tpu.binning import sampling
from pcodec_tpu.binning.histogram import _Builder, HistogramBin
from pcodec_tpu.codec.chunk_config import ChunkConfig, ModeSpec, PagingSpec
from pcodec_tpu.codec import compress as cmp
from pcodec_tpu.dtypes import LATENT_TYPES, NumberType
from pcodec_tpu.format.metadata import DeltaEncoding, Mode, PerLatentVar
from pcodec_tpu.modes import int_mult

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def device_train_supported(nt: NumberType, config: ChunkConfig, n: int, page_n: int) -> bool:
    """Chunks the device-train path covers; everything else falls back to the
    host pipeline (same output, slower). Floats are covered when Classic wins
    the mode auction (FloatMult/FloatQuant splits stay host: multi-latent-var
    output and softfloat arithmetic)."""
    if config.mode_spec.kind not in (ModeSpec.AUTO, ModeSpec.CLASSIC):
        return False
    if config.delta_spec.kind not in (
        cmp.DeltaSpec.AUTO,
        cmp.DeltaSpec.NO_OP,
        cmp.DeltaSpec.TRY_CONSECUTIVE,
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
    """Vectorized Euclid on u64 arrays (exact on TPU; integer ops only)."""

    def cond(st):
        return jnp.any(st[1] != 0)

    def body(st):
        x, y = st
        safe = jnp.where(y == 0, jnp.uint64(1), y)
        return jnp.where(y != 0, y, x), jnp.where(y != 0, x % safe, jnp.uint64(0))

    a, b = jax.lax.while_loop(cond, body, (a, b))
    return a


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
    gs = jnp.sort(g, axis=1)  # zeros (filtered) sort first
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


@partial(jax.jit, static_argnames=("max_order", "n_chunks", "rows_per_chunk",
                                   "page_n", "lat_bits"))
def _phase_delta_sort(lat2d, order_row, rowlen, nreal, extract_idx,
                      max_order, n_chunks, rows_per_chunk, page_n, lat_bits):
    """Per-page consecutive delta (vectorized, every order at once), then a
    per-chunk sort of the junk-masked deltas and the batched quantile
    extraction that drives the histogram walk on the host.

    order_row (rows,) i32: the chunk's delta order per page row.
    rowlen (rows,) i32: real numbers in each page row (0 for pad rows).
    nreal (n_chunks,) i32: histogram population per chunk.
    extract_idx (n_chunks, NB) i32: c_count(j)-1 positions per chunk.
    """
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
    s = jnp.sort(per_chunk, axis=1)

    v = jnp.take_along_axis(s, extract_idx.astype(jnp.int32), axis=1)
    left = jax.vmap(partial(jnp.searchsorted, side="left"))(s, v)
    right = jax.vmap(partial(jnp.searchsorted, side="right"))(s, v)
    # pads are U64_MAX at the tail; clipping right to the real count keeps
    # run extents exact even when real values equal U64_MAX
    right = jnp.minimum(right.astype(jnp.int64), nreal[:, None].astype(jnp.int64))
    sl1 = jnp.take_along_axis(s, jnp.maximum(left - 1, 0).astype(jnp.int32), axis=1)
    sr_idx = jnp.clip(jnp.minimum(right, nreal[:, None] - 1), 0, s.shape[1] - 1)
    sr = jnp.take_along_axis(s, sr_idx.astype(jnp.int32), axis=1)
    s0 = s[:, 0]
    return out, moments, v, left, right, sl1, sr, s0


_GCD_K = 256  # unique-GCD slots per chunk fetched from device


def _int_bases_device(mode_s_dev, mode_spans, chunk_ns, lt) -> Dict[int, int]:
    """IntMult screening without fetching the mode sample: device triple-GCD
    unique counts -> host scoring (small exact f64 math) -> one batched
    device keep-count pass for surviving candidates. Returns {ci: base}.
    Matches int_mult.choose_base_from_sample exactly; chunks whose unique
    GCD count overflows the fetch window fall back to a sample fetch."""
    n_chunks = len(chunk_ns)
    starts = np.array([a for a, _ in mode_spans], dtype=np.int32)
    lens = np.array([m for _, m in mode_spans], dtype=np.int32)
    m_max = int(lens.max()) if n_chunks else 0
    if m_max < 3:
        return {}
    vals_d, cnts_d, nuniq_d = _phase_int_gcd(
        mode_s_dev, jnp.asarray(starts), jnp.asarray(lens),
        n_chunks=n_chunks, m_max=m_max, k=_GCD_K,
    )
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


def plan_encode_device(nums, config: Optional[ChunkConfig],
                       page_n: int, chunk_n: int):
    """Device-train drop-in for pallas_encode._plan_encode. Returns
    (nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows) or None when the
    configuration isn't covered (caller falls back to the host planner).

    nums may be a numpy array or an already-device-resident jax array
    (production pipelines keep data in HBM; only samples come back).
    dev_rows: (total_rows, page_n) u64 device array of page-delta'd latents
    (junk fronts intact); jobs carry (row_start, n_pages, order) so the
    launch builder can slice it without another host round trip.
    """
    from pcodec_tpu.codec import container as ctn
    from pcodec_tpu.dtypes import number_type_from_np
    from pcodec_tpu.ops.pallas_encode import build_enc_tables

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
        # ops) and the TPU x64 rewriter can't bitcast f64 -> u64 on device
        if not isinstance(nums, np.ndarray):
            return None  # device-resident float input: host pipeline
        idt = {16: np.int16, 32: np.int32, 64: np.int64}[lt.bits]
        nums_dev = jnp.asarray(nums.view(idt))
    else:
        nums_dev = jnp.asarray(nums)
    is_float_auto = nt.kind == "float" and config.mode_spec.kind == ModeSpec.AUTO

    # float mode sampling: accepted draws depend on per-draw keep flags
    # (normal floats below the sampling cap), fetched in a pre-pass
    draws_cache: Dict[int, object] = {}
    keep_by_chunk: List[Optional[np.ndarray]] = [None] * n_chunks
    if is_float_auto:
        draw_idx_parts, draw_spans = [], []
        pos = 0
        start = 0
        for cn in chunk_ns:
            if cn not in draws_cache:
                draws_cache[cn] = sampling.sample_draws(cn)
            d = draws_cache[cn]
            ln = 0 if d is None else len(d[0])
            draw_spans.append((pos, ln))
            if ln:
                draw_idx_parts.append(d[0] + start)
            pos += ln
            start += cn
        if draw_idx_parts:
            mx = np.abs(np.asarray(cmp._max_for_sampling(nt), dtype=nt.np_dtype))
            max_bits = int(mx.view(lt.np_dtype))
            exp_mask = ((1 << (lt.bits - nt.precision_bits - 1)) - 1) << nt.precision_bits
            keep_all = np.asarray(_phase_float_keep(
                nums_dev, jnp.asarray(np.concatenate(draw_idx_parts)),
                mid=int(lt.mid), exp_mask=exp_mask, max_bits=max_bits,
            ))
            for ci2 in range(n_chunks):
                a, m = draw_spans[ci2]
                keep_by_chunk[ci2] = keep_all[a : a + m] if m else None

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

    # ---- phase A: bijection + samples ----
    lat2d, mode_s_dev, delta_s_dev = _phase_latents(
        nums_dev,
        jnp.asarray(mode_idx),
        jnp.asarray(delta_idx),
        kind=nt.kind,
        mid=int(nt.latent.mid),
        total_rows=total_rows,
        page_n=page_n,
    )
    # samples come back u64-widened; decisions are latent-width sensitive
    # (wrapping diffs in the delta sample compressions), so narrow first.
    # The full mode sample (~n/40 latents, the dominant host<->device
    # transfer) is only fetched for float auto-mode bids; int IntMult
    # screening runs on device and fetches O(chunks * 256) GCD counts.
    delta_samples = np.asarray(delta_s_dev).astype(lt.np_dtype)
    is_int_auto = nt.kind != "float" and config.mode_spec.kind == ModeSpec.AUTO
    mode_samples = (
        np.asarray(mode_s_dev).astype(lt.np_dtype) if is_float_auto else None
    )
    int_bases: Dict[int, int] = (
        _int_bases_device(mode_s_dev, mode_spans, chunk_ns, lt) if is_int_auto else {}
    )

    # ---- host decisions per chunk ----
    orders = np.zeros(n_chunks, dtype=np.int32)
    ubls = np.zeros(n_chunks, dtype=np.int32)
    encs: List[Optional[DeltaEncoding]] = [None] * n_chunks
    for ci, cn in enumerate(chunk_ns):
        ubls[ci] = cmp.choose_unoptimized_bins_log(level, cn)
        if is_float_auto:
            a, m = mode_spans[ci]
            if m:
                from pcodec_tpu.modes import float_mult, float_quant

                # |x| sample for the float bids; Classic only wins when
                # neither bid clears its threshold (float.rs:83-134)
                svals = nt.from_latent_ordered(mode_samples[a : a + m])
                ab = np.abs(svals)
                if float_mult.compute_bid(nt, ab) is not None:
                    continue  # FloatMult: host pipeline (encs stays None)
                if float_quant.compute_bid(nt, ab) is not None:
                    continue  # FloatQuant: host pipeline
        elif is_int_auto:
            if ci in int_bases:
                continue  # IntMult: host pipeline splits it (encs stays None)
        if config.delta_spec.kind == cmp.DeltaSpec.AUTO:
            a, m = delta_spans[ci]
            enc = cmp.choose_auto_delta_encoding_from_sample(
                delta_samples[a : a + m], cn, int(ubls[ci]), lt
            )
        elif config.delta_spec.kind == cmp.DeltaSpec.NO_OP:
            enc = DeltaEncoding.noop()
        else:  # TRY_CONSECUTIVE
            enc = (
                DeltaEncoding.noop()
                if config.delta_spec.order == 0
                else DeltaEncoding.consecutive(config.delta_spec.order)
            )
        if enc.kind == DeltaEncoding.LOOKBACK:
            continue  # host pipeline (encs stays None)
        encs[ci] = enc
        orders[ci] = enc.order if enc.kind == DeltaEncoding.CONSECUTIVE else 0

    # ---- phase B: delta + sort + extracts ----
    NB = 1 << int(ubls.max()) if n_chunks else 1
    order_row = np.repeat(orders, rows_per_chunk).astype(np.int32)
    nreal = np.zeros(n_chunks, dtype=np.int64)
    extract_idx = np.zeros((n_chunks, NB), dtype=np.int64)
    for ci, cn in enumerate(chunk_ns):
        if encs[ci] is None:
            continue
        nr = cn - int(orders[ci]) * len(pages_per_chunk[ci])
        nreal[ci] = nr
        nb = 1 << int(ubls[ci])
        j = np.arange(nb, dtype=np.int64)
        cc_pos = ((j + 1) * nr + nb - 1) >> int(ubls[ci])
        extract_idx[ci, :nb] = np.minimum(cc_pos - 1, max(nr - 1, 0))
    dev_rows, moments_dev, V, L, R, SL1, SR, S0 = _phase_delta_sort(
        lat2d,
        jnp.asarray(order_row),
        jnp.asarray(rowlen),
        jnp.asarray(nreal),
        jnp.asarray(extract_idx),
        max_order=int(orders.max()) if n_chunks else 0,
        n_chunks=n_chunks,
        rows_per_chunk=rows_per_chunk,
        page_n=page_n,
        lat_bits=nt.latent.bits,
    )
    moments = np.asarray(moments_dev)
    Vn, Ln, Rn, SL1n, SRn, S0n = (np.asarray(x) for x in (V, L, R, SL1, SR, S0))

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
        if encs[ci] is None:
            # host pipeline for this chunk (IntMult / lookback / fallback)
            chunk_config = ChunkConfig(
                compression_level=level,
                mode_spec=config.mode_spec,
                delta_spec=config.delta_spec,
                paging_spec=PagingSpec.exact_pages(pages_per_chunk[ci]),
                enable_8_bit=config.enable_8_bit,
            )
            ccs[ci] = cmp.chunk_compressor(nt, _nums_np(start, start + cn), chunk_config)
            chunk_jobs[ci] = ("host", None)
            start += cn
            continue

        order = int(orders[ci])
        nr = int(nreal[ci])
        nb_log = int(ubls[ci])
        # slast: the last real sorted value == SR at the final run; derive it
        # from the extract at the last bin position (c_count(nb-1) == nr)
        slast = int(Vn[ci, (1 << nb_log) - 1])
        unopt = histogram_from_extracts(
            nr, nb_log, Vn[ci], Ln[ci], Rn[ci], SL1n[ci], SRn[ci], int(S0n[ci]), slast
        )
        trained = _train_from_histogram(unopt, nr, nb_log, lt)
        bins = cmp.bins_from_infos(trained.infos, lt)
        lvc = cmp.LatentVarCompressor(trained, bins, None)
        var_metas = PerLatentVar(None, cmp.ChunkLatentVarMeta(trained.ans_size_log, bins), None)
        meta = cmp.ChunkMeta(Mode(Mode.CLASSIC), encs[ci], var_metas, nt.latent)
        page_infos = _device_page_infos(
            pages_per_chunk[ci], order, moments[ci * rows_per_chunk :], nt
        )
        cand = cmp.ChunkCompressor(meta, PerLatentVar(None, lvc, None), page_infos)
        counts = PerLatentVar(None, trained.counts, None)
        if cand.should_fallback(nt.latent, cn, counts):
            ccs[ci] = cmp.fallback_chunk_compressor(
                nt, _nums_np(start, start + cn), pages_per_chunk[ci]
            )
            chunk_jobs[ci] = ("host", None)
            start += cn
            continue
        ccs[ci] = cand
        start += cn

        if lvc.is_trivial:
            chunk_jobs[ci] = ("host", None)
            continue
        nexts, lowers, t1, t2, ts = build_enc_tables(meta.per_latent_var.primary)
        b = len(lowers)
        max_ob = int(lvc.max_offset_bits)
        worst_bits = (
            float(np.max(bins.worst_case_bits_per_latent(lvc.ans_size_log))) if b else 0.0
        )
        sec_words = int(-(-int(page_n * (worst_bits + 1) + 64) // 32 // 128) * 128)
        if not (ts <= 4096 and b <= 2048 and sec_words <= 2048):
            # kernel limits: re-train on host (rare, pathological tables)
            chunk_config = ChunkConfig(
                compression_level=level,
                mode_spec=config.mode_spec,
                delta_spec=config.delta_spec,
                paging_spec=PagingSpec.exact_pages(pages_per_chunk[ci]),
                enable_8_bit=config.enable_8_bit,
            )
            ccs[ci] = cmp.chunk_compressor(nt, _nums_np(start - cn, start), chunk_config)
            chunk_jobs[ci] = ("host", None)
            continue
        ob_class = 0 if max_ob == 0 else (32 if max_ob <= 32 else 64)
        key = (page_n, ob_class, max(sec_words, 128))
        job = {
            "ci": ci, "cc": ccs[ci], "tables": (nexts, lowers, t1, t2, ts),
            "b": b, "max_ob": max_ob,
            "dev": {"row_start": ci * rows_per_chunk, "order": order,
                    "n_pages": len(pages_per_chunk[ci])},
        }
        groups.setdefault(key, []).append(job)
        chunk_jobs[ci] = ("device", job)

    return nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows


def _train_from_histogram(unopt, n_latents, unoptimized_bins_log, latent_type):
    """train_infos (codec/compress.py) with the histogram precomputed."""
    from pcodec_tpu.format import ans

    if n_latents == 0:
        return cmp.TrainedBins([], 0, [])
    n_log_ceil = 0 if n_latents <= 1 else (n_latents - 1).bit_length()
    estimated = min(unoptimized_bins_log + 2, c.MAX_COMPRESSION_LEVEL, n_log_ceil)
    infos = cmp.optimize_bins(unopt, estimated, latent_type)
    counts = [i.weight for i in infos]
    ans_size_log, weights = ans.quantize_weights(counts, n_latents, estimated)
    for info, w in zip(infos, weights):
        info.weight = w
    return cmp.TrainedBins(infos, ans_size_log, counts)


def _device_page_infos(per_page: List[int], order: int, chunk_moments: np.ndarray, nt):
    # delta states are raw latents in page metadata — latent width matters
    # (metadata/page_latent_var.rs:18-50)
    ldt = nt.latent.np_dtype
    if order:
        states = np.ascontiguousarray(chunk_moments[: len(per_page), :order]).astype(ldt)
    else:
        empty = np.zeros(0, dtype=ldt)
    infos = []
    start = 0
    for pi, pn in enumerate(per_page):
        end = start + pn
        if order:
            piv = cmp.PageInfoVar(states[pi], min(start + order, end), end)
        else:
            piv = cmp.PageInfoVar(empty, start, end)
        infos.append(cmp.PageInfo(pn, PerLatentVar(None, piv, None)))
        start = end
    return infos
