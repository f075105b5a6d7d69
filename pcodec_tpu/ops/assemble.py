"""Device-side PCT file-image assembly: the encoder's mirror of the decode
realign kernel.

Motivation (NOTES.md): device->host transfers through this environment's
tunnel run at MB/s, so an encoder that fetches compressed sections to the
host for file assembly can never approach the reference's end-to-end
compress throughput (0.556 GB/s on one M3 core,
/root/reference/docs/benchmark_results/columnar_mbp_m3_max_rust1_89.csv).
Production TPU encode keeps everything in HBM: the EB/EC kernels emit
per-page section words, and this module stitches them — together with
device-packed page metadata and the container directory — into the final
byte-exact `.pct` file image ON DEVICE. Only a small guard/size scalar
vector crosses the tunnel before the (untimed, one-time) byte-compare
readback.

File layout produced (see codec/container.py): the head (PCT header +
directory) is dense and word-aligned by construction, so it is a plain
device concat. The body is a bit-exact wrapped pco stream: per page,
[chunk-boundary prefix bytes: wrapped header + chunk meta, host-serialized
since they carry the trained bins] [page meta: delta-state latents + 4 ANS
final-state idxs, bit-packed LSB-first then byte-padded — ref
pco/src/metadata/page.rs via format/metadata.py PageMeta.write_to] then the
byte-aligned section bytes from the EC kernel. Pages land at arbitrary byte
offsets, so the body is a ragged concat of two row streams:

  A: one row per page [page meta | section bytes] — the meta (device-packed
     from EC final states + delta moments) and the EC kernel's section row
     are contiguous in the file and meta_bytes is static per chunk, so they
     merge with static shifts; one stream halves the stitch kernel's
     per-step DMA count (it is DMA-latency bound)
  C: chunk-boundary prefix rows (host bytes, device byte-shifted)

Each stream is pre-shifted by its destination offset mod 4 (a dense
4-variant select), after which placement is a pure word-level OR: adjacent
rows share at most boundary words, and both the EC kernel and the BitWriter
leave out-of-payload bits zero, so OR composes exactly like the host
writer's own OR-merging bit stream.

Two stitch implementations:
  - _stitch_xla: gather-based reference (correct everywhere; tests compare
    it and the kernel against the host encoder byte-for-byte)
  - the superblock Pallas kernel (_stitch_pass): the body is cut into
    SB superblocks; pass p's grid step i owns the PRIVATE contiguous
    2-superblock output region starting at superblock 2i+p and deposits
    exactly the rows STARTING in superblock 2i+p (every row fits inside
    one 2-superblock span since max row bytes <= 4*SB/2). Pass
    outputs are contiguous flat images offset by 0 / SB; the file
    body is their OR — no cross-step aliasing, no write races. Row words
    are extracted with the realign kernel's sublane-roll trick and placed
    with dynamic lane rolls.
"""

import os
from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcodec_tpu import constants as c

BATCH = c.FULL_BATCH_N
_GUARD_CAP = 1 << 16     # superblock-count cap for the guard histogram
_W_BUCKET = 1 << 18      # XLA-stitch output size classes (words)


def _interpret():
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


# Superblock size in u32 words; every row must fit in one superblock (so a
# row starting in superblock s always lands inside the pass's private
# 2-superblock region [s, s+2)). A/B on real v5e 2026-08-20 (64M taxi):
# SB=8192 halves the grid but REGRESSES the stitch 0.226 s -> 0.338 s (the
# 2x-unrolled per-step row loop costs more than the saved DMA latency), so
# the default stays 4096 everywhere. PCODEC_SB_WORDS overrides for A/Bs.
_SB_CACHED = None


def _sb_words():
    global _SB_CACHED
    if _SB_CACHED is None:
        env = os.environ.get("PCODEC_SB_WORDS")
        _SB_CACHED = int(env) if env else 4096
    return _SB_CACHED


def _caps_scale():
    return max(_sb_words() // 4096, 1)


# ---------------------------------------------------------------------------
# layout: the static (hashable) description of one assembly problem
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ImageLayout:
    page_n: int
    n_chunks: int
    rows_per_chunk: int            # device row pitch per chunk (moments etc.)
    pages_per_chunk: tuple         # (n_full, rem_page_len) per chunk
    orders: tuple                  # consecutive delta order per chunk
    sls: tuple                     # ans_size_log per chunk
    ts: tuple                      # real tANS table size per chunk
    bits: int                      # primary latent bits (64/32/16)
    meta_bytes: tuple              # page meta bytes per chunk
    pfx_bytes: tuple               # chunk-boundary prefix bytes per chunk
    sec_words: int                 # EC section row words (schema.sec_words)

    @property
    def n_pages(self):
        return tuple(nf + (1 if rem else 0) for nf, rem in self.pages_per_chunk)

    @property
    def total_pages(self):
        return int(sum(self.n_pages))

    @property
    def max_order(self):
        return max(self.orders) if self.orders else 0

    def page_lens(self):
        out = []
        for nf, rem in self.pages_per_chunk:
            out.extend([self.page_n] * nf)
            if rem:
                out.append(rem)
        return np.asarray(out, np.int64)

    def chain_of_page(self):
        """Real page index -> chain index in the (single) launch, whose
        chains are the jobs' pages each padded to a 256 multiple."""
        out = []
        start = 0
        for npg in self.n_pages:
            out.extend(range(start, start + npg))
            start += npg + ((-npg) % 256)
        return np.asarray(out, np.int32)

    def chain_ranges(self):
        """Static (start, n) chain ranges per chunk — row selection by
        contiguous slices: an XLA row GATHER of the (chains, SEC) sections
        lowers to a per-element gather (~35 M/s, seconds at 64M), while
        static slices are pure dense copies."""
        out = []
        start = 0
        for npg in self.n_pages:
            out.append((start, npg))
            start += npg + ((-npg) % 256)
        return tuple(out)

    def mrow_ranges(self):
        return tuple((ci * self.rows_per_chunk, npg)
                     for ci, npg in enumerate(self.n_pages))

    def mrow_of_page(self):
        out = []
        for ci, npg in enumerate(self.n_pages):
            base = ci * self.rows_per_chunk
            out.extend(range(base, base + npg))
        return np.asarray(out, np.int32)

    def chunk_of_page(self):
        return np.repeat(
            np.arange(self.n_chunks, dtype=np.int32),
            np.asarray(self.n_pages, np.int64),
        )

    def page0_of_chunk(self):
        return np.cumsum([0] + list(self.n_pages[:-1])).astype(np.int32)

    def dir_entry_pages(self):
        lens = self.page_lens()
        nb = -(-lens // BATCH)
        pages = np.repeat(np.arange(len(lens), dtype=np.int32), nb)
        batches = np.concatenate(
            [np.arange(k, dtype=np.int32) for k in nb]) if len(lens) else \
            np.zeros(0, np.int32)
        return pages, batches


# ---------------------------------------------------------------------------
# device prep: rows, offsets, head, guards
# ---------------------------------------------------------------------------


def _byte_shift_rows(rows, s_bytes):
    """Shift each row right by s_bytes in {0..3} (little-endian bit stream:
    payload bit b -> bit b + 8*s). rows: (R, W) uint32 -> (R, W+1)."""
    rows = jnp.concatenate(
        [rows, jnp.zeros((rows.shape[0], 1), rows.dtype)], axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((rows.shape[0], 1), rows.dtype), rows[:, :-1]], axis=1)
    s = (s_bytes.astype(jnp.uint32) * 8)[:, None]
    s_safe = jnp.maximum(s, jnp.uint32(1))
    shifted = (rows << s_safe) | (prev >> (jnp.uint32(32) - s_safe))
    return jnp.where(s == 0, rows, shifted)


def _pack_meta_group(moments_g, idxs_g, order, sl, bits, mw):
    """Pack page metas for one (order, sl) chunk group at bit offset 0.

    Wire layout (PageMeta.write_to): order delta-state latents at `bits`
    each, then 4 ANS final-state idxs at `sl` bits, LSB-first in the
    little-endian byte stream — so u32 word w holds bits [32w, 32w+32)."""
    fields = [(moments_g[:, k], bits) for k in range(order)]
    fields += [(idxs_g[:, k], sl) for k in range(4)]
    return _pack_meta_fields(fields, moments_g.shape[0], mw)


def _pack_meta_fields(fields, G, mw):
    """Bit-pack a sequence of (values (G,) u64, n_bits) fields LSB-first
    into (G, mw) u32 words — the multi-latent-var page-meta layout is the
    same packing with per-var field lists (delta-state latents at the
    var's latent bits, then 4 ANS idxs at its ans_size_log;
    ref: pco/src/metadata/page.rs via format/metadata.py PageMeta)."""
    words = [jnp.zeros((G,), jnp.uint64) for _ in range(mw)]
    cursor = 0
    for val, nb in fields:
        if nb <= 0:
            continue
        mask = (jnp.uint64((1 << nb) - 1) if nb < 64
                else jnp.uint64(0xFFFFFFFFFFFFFFFF))
        val = val.astype(jnp.uint64) & mask
        w0 = cursor >> 5
        w1 = (cursor + nb - 1) >> 5
        for w in range(w0, min(w1, mw - 1) + 1):
            sh = cursor - 32 * w
            contrib = (val << jnp.uint64(sh)) if sh >= 0 \
                else (val >> jnp.uint64(-sh))
            words[w] = words[w] | (contrib & jnp.uint64(0xFFFFFFFF))
        cursor += nb
    return jnp.stack(words, axis=1).astype(jnp.uint32)


def _max_run(F0):
    """Max count of rows sharing one start word (K guard for the stitch)."""
    R = F0.shape[0]
    first = jnp.searchsorted(F0, F0, side="left")
    return jnp.max(jnp.arange(R, dtype=jnp.int64) - first.astype(jnp.int64)) + 1


def _max_per_sb(F0):
    sb = jnp.clip(F0.astype(jnp.int64) // _sb_words(), 0, _GUARD_CAP - 1)
    cnt = jnp.zeros((_GUARD_CAP,), jnp.int32).at[sb].add(1)
    return jnp.max(cnt).astype(jnp.int64)


@partial(jax.jit, static_argnames=("layout",))
def _prepare_image(layout: ImageLayout, sections, fstates, ans_len, off_len,
                   total_bits, moments, head_host_words, pfx_words):
    """All-device row construction. Returns dict of device arrays: the two
    pre-shifted row streams + their (F0, lenW) tables, the dense head words,
    and guard scalars [body_bytes, body_words, nsb, maxA, maxC,
    runA, runC]."""
    R = layout.total_pages
    cranges = layout.chain_ranges()
    identity = all(s == sum(n for _, n in cranges[:i])
                   for i, (s, _) in enumerate(cranges))

    def take_chains(x):
        # contiguous static slices per chunk, NOT a row gather (see
        # chain_ranges); identity layouts skip even the concat
        if identity:
            return x[:R]
        parts = [x[s:s + n] for s, n in cranges]
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    cofp = jnp.asarray(layout.chunk_of_page())

    T = sections.shape[0]
    SEC = layout.sec_words
    sec2d = take_chains(sections.reshape(T * 256, SEC))             # (R, SEC)
    st4 = fstates.reshape(T, 8, 32, 4).transpose(0, 2, 1, 3)
    st4 = take_chains(st4.reshape(T * 256, 4))                      # (R, 4)
    tb = take_chains(total_bits).astype(jnp.int64)

    # ---- A+B: one combined row per page [page meta | section bytes] ----
    # the two spans are CONTIGUOUS in the file (meta at off_meta, sections
    # at off_meta + meta_bytes), and meta_bytes is STATIC per chunk, so the
    # section words merge in with per-chunk static shifts (dense ops, no
    # gathers). One stream instead of two halves the stitch kernel's
    # per-step DMA count (the kernel is DMA-latency bound, NOTES.md).
    ts_row = jnp.asarray(np.asarray(layout.ts, np.int64))[cofp]
    idxs = (st4.astype(jnp.int64) - ts_row[:, None]).astype(jnp.uint64)
    mo = layout.max_order
    if mo:
        mparts = [moments[s:s + n] for s, n in layout.mrow_ranges()]
        mom = (jnp.concatenate(mparts, axis=0) if len(mparts) > 1
               else mparts[0])
    else:
        mom = jnp.zeros((R, 0), jnp.uint64)
    mw = max(1, -(-max(o * layout.bits + 4 * sl + 24
                       for o, sl in zip(layout.orders, layout.sls)) // 32))
    groups = {}
    for ci2, (o, sl) in enumerate(zip(layout.orders, layout.sls)):
        groups.setdefault((o, sl), []).append(ci2)
    if len(groups) == 1:
        ((o, sl),) = groups.keys()
        rowsA0 = _pack_meta_group(mom[:, :o], idxs, o, sl, layout.bits, mw)
    else:
        rowsA0 = jnp.zeros((R, mw), jnp.uint32)
        cofp_np = layout.chunk_of_page()
        for (o, sl), cis in groups.items():
            sel = jnp.asarray(
                np.nonzero(np.isin(cofp_np, np.asarray(cis)))[0].astype(np.int32))
            packed = _pack_meta_group(
                mom[sel][:, :o], idxs[sel], o, sl, layout.bits, mw)
            rowsA0 = rowsA0.at[sel].set(packed)

    sec_u32 = jax.lax.bitcast_convert_type(sec2d, jnp.uint32)

    # directory entries: per (page, batch) — single latent var
    ep_np, eb_np = layout.dir_entry_pages()
    ans_e = take_chains(ans_len)[jnp.asarray(ep_np), jnp.asarray(eb_np)]
    off_e = take_chains(off_len)[jnp.asarray(ep_np), jnp.asarray(eb_np)]
    vals16 = jnp.concatenate([ans_e, off_e]).astype(jnp.uint32)
    ansoff = vals16[0::2] | (vals16[1::2] << 16)

    cspec = (layout.n_chunks, layout.n_pages, layout.meta_bytes,
             layout.pfx_bytes)
    return _core_prep(cspec, sec_u32, rowsA0, tb, ansoff,
                      head_host_words, pfx_words)


def _core_prep(cspec, sec_u32, rowsA0, tb, ansoff, head_host_words,
               pfx_words):
    """Shared tail of image prep (called inside a jit): merge [page meta |
    sections] rows, byte-shift both row streams to their destinations,
    build the dense head words, and compute the stitch guards. cspec =
    (n_chunks, n_pages tuple, meta_bytes tuple, pfx_bytes tuple)."""
    n_chunks, n_pages, meta_bytes, pfx_bytes = cspec
    R = int(sum(n_pages))
    mw = rowsA0.shape[1]
    SECW = sec_u32.shape[1]
    cofp = np.repeat(np.arange(n_chunks, dtype=np.int32),
                     np.asarray(n_pages, np.int64))
    meta_bytes_row = jnp.asarray(np.asarray(meta_bytes, np.int64)[cofp])
    page0 = np.cumsum([0] + list(n_pages[:-1])).astype(np.int32)
    pfx_np = np.zeros(R, np.int64)
    pfx_np[page0] = np.asarray(pfx_bytes, np.int64)
    pfx_bytes_row = jnp.asarray(pfx_np)

    sec_bytes = (tb + 7) >> 3
    row_total = pfx_bytes_row + meta_bytes_row + sec_bytes
    starts = jnp.cumsum(row_total) - row_total
    body_bytes = starts[-1] + row_total[-1]
    off_meta = starts + pfx_bytes_row

    # combined unshifted row width: meta words + byte-shifted sections
    mb_max = max(meta_bytes)
    WAB = (mb_max >> 2) + SECW + 1
    mb_arr = np.asarray(meta_bytes, np.int64)
    if len(set(meta_bytes)) == 1:
        mb = int(meta_bytes[0])
        secsh = _byte_shift_rows(sec_u32, jnp.full((R,), mb & 3, jnp.int32))
        metap = jnp.concatenate(
            [rowsA0, jnp.zeros((R, WAB - mw), jnp.uint32)], axis=1)
        secp = jnp.concatenate(
            [jnp.zeros((R, mb >> 2), jnp.uint32), secsh,
             jnp.zeros((R, WAB - (mb >> 2) - (SECW + 1)), jnp.uint32)],
            axis=1)
        rowsAB0 = metap | secp
    else:
        parts = []
        row0 = 0
        for ci2 in range(n_chunks):
            npg = n_pages[ci2]
            mb = int(mb_arr[ci2])
            rA = rowsA0[row0:row0 + npg]
            rS = _byte_shift_rows(
                sec_u32[row0:row0 + npg],
                jnp.full((npg,), mb & 3, jnp.int32))
            metap = jnp.concatenate(
                [rA, jnp.zeros((npg, WAB - mw), jnp.uint32)], axis=1)
            secp = jnp.concatenate(
                [jnp.zeros((npg, mb >> 2), jnp.uint32), rS,
                 jnp.zeros((npg, WAB - (mb >> 2) - (SECW + 1)), jnp.uint32)],
                axis=1)
            parts.append(metap | secp)
            row0 += npg
        rowsAB0 = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                   else parts[0])
    rowsA = _byte_shift_rows(rowsAB0, (off_meta & 3))
    F0A = (off_meta >> 2).astype(jnp.int32)
    lenA = ((meta_bytes_row + sec_bytes + (off_meta & 3) + 3) >> 2).astype(
        jnp.int32)

    # ---- C: chunk-boundary prefix rows ----
    off_c = starts[jnp.asarray(page0)]
    rowsC = _byte_shift_rows(pfx_words, (off_c & 3))
    F0C = (off_c >> 2).astype(jnp.int32)
    lenC = ((jnp.asarray(np.asarray(pfx_bytes, np.int64))
             + (off_c & 3) + 3) >> 2).astype(jnp.int32)

    # ---- head: [header + chunk_ns + chunk_meta_bytes] ++ page_bytes ++
    # [all pages' ans u16 entries] ++ [all pages' off u16 entries] ----
    page_bytes = (meta_bytes_row + sec_bytes).astype(jnp.uint32)
    head_words = jnp.concatenate([head_host_words, page_bytes, ansoff])

    body_words = (body_bytes + 3) >> 2
    nsb = (body_words + _sb_words() - 1) // _sb_words()
    guards = jnp.stack([
        body_bytes, body_words, nsb,
        _max_per_sb(F0A), _max_per_sb(F0C),
        _max_run(F0A), _max_run(F0C),
    ])

    return dict(
        rowsA=rowsA, F0A=F0A, lenA=lenA,
        rowsC=rowsC, F0C=F0C, lenC=lenC,
        head_words=head_words, guards=guards,
    )


# ---------------------------------------------------------------------------
# stitch: XLA reference
# ---------------------------------------------------------------------------


def _stitch_stream_xla(out, rows, F0, lenW, K):
    W = out.shape[0]
    w = jnp.arange(W, dtype=jnp.int32)
    r = jnp.searchsorted(F0, w, side="right").astype(jnp.int32) - 1
    Wrow = rows.shape[1]
    for k in range(K):
        rk = r - k
        rkc = jnp.clip(rk, 0, rows.shape[0] - 1)
        l = w - F0[rkc]
        valid = (rk >= 0) & (l >= 0) & (l < lenW[rkc]) & (l < Wrow)
        word = rows[rkc, jnp.clip(l, 0, Wrow - 1)]
        out = out | jnp.where(valid, word, jnp.uint32(0))
    return out


@partial(jax.jit, static_argnames=("W_pad", "K"))
def _stitch_xla(rowsA, F0A, lenA, rowsC, F0C, lenC, W_pad: int, K: int = 8):
    out = jnp.zeros((W_pad,), jnp.uint32)
    out = _stitch_stream_xla(out, rowsA, F0A, lenA, K)
    out = _stitch_stream_xla(out, rowsC, F0C, lenC, min(K, 3))
    return out




# ---------------------------------------------------------------------------
# stitch: superblock Pallas kernel
# ---------------------------------------------------------------------------


def _pad_lane128(rows):
    pad = (-rows.shape[1]) % 128
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((rows.shape[0], pad), rows.dtype)], axis=1)
    return rows


def _pad_rows8(rows):
    pad = (-rows.shape[0]) % 8
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad,) + rows.shape[1:], rows.dtype)], axis=0)
    return rows


def _stream_blocks(rows, F0, lenW):
    """(R, W) rows -> ((RB, 8, Wp) int32 row blocks, (RB, 8, 2) int32 SMEM
    tables carrying [F0, lenW] per row; padded rows get len 0)."""
    rows = _pad_rows8(_pad_lane128(
        jax.lax.bitcast_convert_type(rows, jnp.int32)))
    R = F0.shape[0]
    pad = (-R) % 8
    tab = jnp.stack([F0, lenW], axis=1)
    if pad:
        filler = jnp.zeros((pad, 2), jnp.int32).at[:, 0].set(
            jnp.int32(0x7FFFFFF0))
        tab = jnp.concatenate([tab, filler], axis=0)
    RB = rows.shape[0] // 8
    return rows.reshape(RB, 8, rows.shape[1]), tab.reshape(RB, 8, 2)


def _stitch_pass_kernel(meta, sc_ref, *refs):
    """meta = (parity, streams): streams = tuple of (P, WB, NV). refs per
    stream: WB row blocks (1, 8, NV*128) VMEM + WB tables (1, 8, 2) SMEM;
    then the (1, NVO, 8, 128) output block (this step's private contiguous
    2-superblock region)."""
    parity, streams = meta
    i = pl.program_id(0)
    with jax.enable_x64(False):
        ptr = 0
        wins, tabs = [], []
        for (P, WB, NV) in streams:
            wins.append(refs[ptr:ptr + WB]); ptr += WB
            tabs.append(refs[ptr:ptr + WB]); ptr += WB
        out_ref = refs[ptr]

        NVO = out_ref.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        zero = jnp.zeros((8, 128), jnp.int32)
        for v in range(NVO):
            out_ref[0, v] = zero

        sb_base = (2 * i + parity) * _sb_words()

        for s, (P, WB, NV) in enumerate(streams):
            lo = sc_ref[3 * s, i]
            n = sc_ref[3 * s + 1, i]
            base8 = sc_ref[3 * s + 2, i] * 8

            def do_row(j, s=s, P=P, WB=WB, NV=NV, lo=lo, base8=base8):
                widx = lo + j - base8
                blk = widx // 8
                sub = widx % 8
                for b in range(WB):
                    @pl.when(blk == b)
                    def _(b=b):
                        f0 = tabs[s][b][0, sub, 0]
                        lw = tabs[s][b][0, sub, 1]
                        local = f0 - sb_base
                        for v in range(NV):
                            @pl.when(v * 128 < lw)
                            def _(v=v, b=b):
                                tile = wins[s][b][0, :, v * 128:(v + 1) * 128]
                                # dynamic-index sublane loads don't lower;
                                # roll the target row to sublane 0 instead
                                rolled8 = pltpu.roll(tile, (8 - sub) % 8,
                                                     axis=0)
                                row = jnp.broadcast_to(
                                    rolled8[0:1, :], (8, 128))
                                row = jnp.where(lane + v * 128 < lw, row, 0)
                                off = local + v * 128
                                ow = off // 128
                                sh = off % 128
                                rl = pltpu.roll(row, sh, axis=1)
                                parts = (
                                    (jnp.where(lane >= sh, rl, 0), ow),
                                    (jnp.where(lane < sh, rl, 0), ow + 1),
                                )
                                for part, owp in parts:
                                    @pl.when((owp >= 0) & (owp < 8 * NVO))
                                    def _(part=part, owp=owp):
                                        d0 = owp // 8
                                        d1 = owp % 8
                                        cur = out_ref[0, d0]
                                        out_ref[0, d0] = jnp.where(
                                            subl == d1, cur | part, cur)

            for j in range(P):
                @pl.when(j < n)
                def _(j=j):
                    do_row(j)


@partial(jax.jit, static_argnames=("nsteps", "parity", "caps"))
def _stitch_pass(rowsA, F0A, lenA, rowsC, F0C, lenC,
                 nsteps: int, parity: int, caps: tuple):
    """One pass: grid step i deposits the rows starting in superblock
    2i+parity into its private contiguous 2-superblock region. Returns the
    flat (nsteps * 2 * SB,) int32 image of those regions."""
    PA, PC = caps
    streams_in = ((rowsA, F0A, lenA, PA), (rowsC, F0C, lenC, PC))
    SB = _sb_words()
    NVO = 2 * SB // 1024

    sc_rows = []
    specs = []
    args = []
    meta_streams = []
    for si, (rows, F0, lenW, P) in enumerate(streams_in):
        blocks, tab = _stream_blocks(rows, F0, lenW)
        RB = blocks.shape[0]
        WB = P // 8 + 2
        NV = blocks.shape[2] // 128
        meta_streams.append((P, WB, NV))
        sbs = (jnp.arange(nsteps, dtype=jnp.int64) * 2 + parity) * SB
        lo = jnp.searchsorted(F0.astype(jnp.int64), sbs, side="left")
        hi = jnp.searchsorted(F0.astype(jnp.int64), sbs + SB,
                              side="left")
        base_blk = jnp.clip(lo // 8, 0, max(RB - 1, 0))
        sc_rows += [lo.astype(jnp.int32), (hi - lo).astype(jnp.int32),
                    base_blk.astype(jnp.int32)]
        for b in range(WB):
            specs.append(pl.BlockSpec(
                (1, 8, blocks.shape[2]),
                (lambda i, sc, si=si, b=b, RB=RB:
                 (jnp.minimum(sc[3 * si + 2, i] + b, RB - 1),
                  jnp.int32(0), jnp.int32(0))),
                memory_space=pltpu.VMEM))
            args.append(blocks)
        for b in range(WB):
            specs.append(pl.BlockSpec(
                (1, 8, 2),
                (lambda i, sc, si=si, b=b, RB=RB:
                 (jnp.minimum(sc[3 * si + 2, i] + b, RB - 1),
                  jnp.int32(0), jnp.int32(0))),
                memory_space=pltpu.SMEM))
            args.append(tab)

    sc = jnp.stack(sc_rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, NVO, 8, 128),
            lambda i, sc: (i, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_stitch_pass_kernel, (parity, tuple(meta_streams))),
        out_shape=jax.ShapeDtypeStruct((nsteps, NVO, 8, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(sc, *args)
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("sb",))
def _merge_passes(p0, p1, sb):
    # eager at[].set + | + bitcast would cost several dispatch round trips
    # (~26 ms floor each) per stitch through the tunnel
    n1 = min(p1.shape[0], p0.shape[0] - sb)
    out = p0.at[sb:sb + n1].set(p0[sb:sb + n1] | p1[:n1])
    return jax.lax.bitcast_convert_type(out, jnp.uint32)


@jax.jit
def _bitcast_u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def stitch_pallas(prep, nsb: int, caps: tuple):
    """Two-pass stitch. Returns (ceil(nsb/2)*2*SB,) uint32 body."""
    SB = _sb_words()
    a = prep
    nsteps0 = max((nsb + 1) // 2, 1)
    p0 = _stitch_pass(a["rowsA"], a["F0A"], a["lenA"],
                      a["rowsC"], a["F0C"], a["lenC"],
                      nsteps=nsteps0, parity=0, caps=caps)
    nsteps1 = nsb // 2
    if nsteps1 > 0:
        p1 = _stitch_pass(a["rowsA"], a["F0A"], a["lenA"],
                          a["rowsC"], a["F0C"], a["lenC"],
                          nsteps=nsteps1, parity=1, caps=caps)
        return _merge_passes(p0, p1, sb=SB)
    return _bitcast_u32(p0)


# ---------------------------------------------------------------------------
# multi-latent-var image: joint per-batch interleaving across vars
#
# The wrapped page body interleaves the latent vars PER BATCH in file order
# (delta, primary, secondary): for batch b, for var v, [ANS bits][offset
# bits] (ref: pco/src/wrapped/chunk_compressor.rs:657-693 write_dissected_
# page). The EC kernel already packs at caller-supplied per-batch bit
# cursors, and its output is zero outside its own payload bits, so the
# interleaved body is: run EB for every var's launch, compute JOINT
# cursors across each chunk's vars from the per-batch section lengths,
# run EC per launch at the joint positions into full-width buffers, and
# OR the launches' rows together. Page metas concatenate the vars' fields
# (delta-state latents + 4 ANS idxs each); the directory gets per
# (page, var, batch) entries.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MVar:
    key: str          # delta | primary | secondary
    sl: int           # ans_size_log
    ts: int           # real tANS table size
    n_state: int      # delta-state latents in the page meta
    state_bits: int   # bit width of each state latent
    gi: int           # launch index; -1 = trivial var (no kernel job)
    cs: int           # chain_start within launch gi


@dataclass(frozen=True)
class MChunk:
    npg: int
    last_nb: int      # batches in the chunk's (possibly ragged) last page
    mrow: int         # moments row start (consecutive primary state); -1
    lbrow: int        # lb_rows row start (lookback primary state); -1
    vars: tuple       # of MVar, file order


@dataclass(frozen=True)
class MSpec:
    page_n: int
    sec_words: int    # JOINT section width (u32 words) — all EC launches
    mw: int           # page-meta words
    chunks: tuple     # of MChunk
    n_launches: int


@partial(jax.jit, static_argnames=("spec",))
def _multi_glue(spec: MSpec, eb_lens, fstates_list, moments, lb_rows,
                entry_sel):
    """From per-launch EB outputs to: joint per-batch cursors per launch,
    packed page-meta rows, joint per-page total bits, and the packed
    directory ans/off entry words."""
    B = spec.page_n // BATCH
    st4s = []
    for fst in fstates_list:
        T = fst.shape[0]
        st4s.append(
            fst.reshape(T, 8, 32, 4).transpose(0, 2, 1, 3).reshape(T * 256, 4))
    curs = [jnp.zeros((eb_lens[g][0].shape[0], 2 * B), jnp.int32)
            for g in range(spec.n_launches)]
    tb_parts, meta_parts, ans_parts, off_parts = [], [], [], []
    for ch in spec.chunks:
        npg = ch.npg
        a_list, o_list = [], []
        for v in ch.vars:
            if v.gi >= 0:
                a_list.append(eb_lens[v.gi][0][v.cs:v.cs + npg])
                o_list.append(eb_lens[v.gi][1][v.cs:v.cs + npg])
            else:
                a_list.append(jnp.zeros((npg, B), jnp.int32))
                o_list.append(jnp.zeros((npg, B), jnp.int32))
        ans_s = jnp.stack(a_list, axis=2)           # (npg, B, V)
        off_s = jnp.stack(o_list, axis=2)
        tot = ans_s + off_s
        V = len(ch.vars)
        flat = tot.reshape(npg, B * V)              # (b-major, v-minor)
        excl = jnp.cumsum(flat, axis=1) - flat
        excl3 = excl.reshape(npg, B, V)
        o_pos = excl3 + ans_s
        tb_parts.append(jnp.sum(flat, axis=1).astype(jnp.int64))
        fields = []
        for vi, v in enumerate(ch.vars):
            if v.gi >= 0:
                cc2 = jnp.stack(
                    [excl3[:, :, vi], o_pos[:, :, vi]], axis=2
                ).reshape(npg, 2 * B).astype(jnp.int32)
                curs[v.gi] = jax.lax.dynamic_update_slice(
                    curs[v.gi], cc2, (v.cs, 0))
            if v.n_state:
                src = moments if ch.mrow >= 0 else lb_rows
                row0 = ch.mrow if ch.mrow >= 0 else ch.lbrow
                st = src[row0:row0 + npg]
                for k in range(v.n_state):
                    fields.append((st[:, k], v.state_bits))
            if v.sl:
                if v.gi >= 0:
                    idx4 = (st4s[v.gi][v.cs:v.cs + npg].astype(jnp.int64)
                            - v.ts).astype(jnp.uint64)
                else:
                    idx4 = jnp.zeros((npg, 4), jnp.uint64)
                for k in range(4):
                    fields.append((idx4[:, k], v.sl))
            ans_parts.append(ans_s[:, :, vi].reshape(-1))
            off_parts.append(off_s[:, :, vi].reshape(-1))
        meta_parts.append(_pack_meta_fields(fields, npg, spec.mw))
    tb = jnp.concatenate(tb_parts)
    rowsA0 = (jnp.concatenate(meta_parts, axis=0) if len(meta_parts) > 1
              else meta_parts[0])
    ans_all = jnp.concatenate(ans_parts)
    off_all = jnp.concatenate(off_parts)
    ans_e = ans_all[entry_sel]
    off_e = off_all[entry_sel]
    vals16 = jnp.concatenate([ans_e, off_e]).astype(jnp.uint32)
    ansoff = vals16[0::2] | (vals16[1::2] << 16)
    return tuple(curs), rowsA0, tb, ansoff


@partial(jax.jit, static_argnames=("spec", "cspec"))
def _prep_multi(spec: MSpec, cspec, sections_list, rowsA0, tb, ansoff,
                head_host_words, pfx_words):
    """OR the launches' full-width section rows into global page order and
    finish prep via the shared core."""
    SEC = spec.sec_words
    flat = [s.reshape(s.shape[0] * 256, SEC) for s in sections_list]
    parts = []
    for ch in spec.chunks:
        acc = None
        for v in ch.vars:
            if v.gi < 0:
                continue
            rows = flat[v.gi][v.cs:v.cs + ch.npg]
            acc = rows if acc is None else (acc | rows)
        if acc is None:
            acc = jnp.zeros((ch.npg, SEC), jnp.int32)
        parts.append(acc)
    sec2d = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    sec_u32 = jax.lax.bitcast_convert_type(sec2d, jnp.uint32)
    return _core_prep(cspec, sec_u32, rowsA0, tb, ansoff,
                      head_host_words, pfx_words)


def _entry_sel_np(chunks, page_n):
    """Static directory-entry gather indices: entries ordered (page, var,
    batch) with only the page's real batches, indexing the glue's
    concatenated per-(chunk, var) page-major/batch length arrays."""
    B = page_n // BATCH
    base_parts, n_parts = [], []
    off = 0
    for ch in chunks:
        V = len(ch.vars)
        npg = ch.npg
        p_i = np.arange(npg, dtype=np.int64)[:, None]
        v_i = np.arange(V, dtype=np.int64)[None, :]
        bases = off + (v_i * npg + p_i) * B          # (npg, V), (p, v) order
        nbs = np.full((npg, V), B, np.int64)
        nbs[-1, :] = ch.last_nb
        base_parts.append(bases.reshape(-1))
        n_parts.append(nbs.reshape(-1))
        off += V * npg * B
    if not base_parts:
        return np.zeros(0, np.int64)
    starts_flat = np.concatenate(base_parts)
    n_flat = np.concatenate(n_parts)
    tot = int(n_flat.sum())
    cum = np.cumsum(n_flat) - n_flat
    return (np.arange(tot, dtype=np.int64)
            - np.repeat(cum, n_flat) + np.repeat(starts_flat, n_flat))


def _eb_jit(schema):
    from pcodec_tpu.ops import pallas_encode as pe

    key = ("eb", schema)
    fn = _RUN_JIT_CACHE.get(key)
    if fn is None:
        if len(_RUN_JIT_CACHE) > 24:
            _RUN_JIT_CACHE.clear()
        fn = jax.jit(partial(pe._run_launch_eb, schema))
        _RUN_JIT_CACHE[key] = fn
    return fn


def _ec_jit(schema):
    from pcodec_tpu.ops import pallas_encode as pe

    key = ("ec", schema)
    fn = _RUN_JIT_CACHE.get(key)
    if fn is None:
        if len(_RUN_JIT_CACHE) > 24:
            _RUN_JIT_CACHE.clear()
        fn = jax.jit(partial(pe._run_launch_ec, schema))
        _RUN_JIT_CACHE[key] = fn
    return fn


def _plan_image_multi(nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows,
                      extras, page_n, _trace=lambda *_: None):
    """Image plan for chunks with multiple latent vars (IntMult/Float*/
    dict-with-secondary) and device lookback chunks. Returns a plan dict
    (mode="multi") or None when outside coverage (host/section-width
    limits); output bytes are identical to the host pipeline either way.

    ref: the interleaved page-body order this reproduces is
    pco/src/wrapped/chunk_compressor.rs:657-693 (write_dissected_page)."""
    import struct
    from pcodec_tpu.codec import container as ctn
    from pcodec_tpu.codec.wrapped import FileCompressor
    from pcodec_tpu.format.bitio import BitWriter
    from pcodec_tpu.format.metadata import DeltaEncoding
    from pcodec_tpu.ops import pallas_encode as pe

    for cc in ccs:
        if cc.meta.delta_encoding.kind not in (
                DeltaEncoding.NOOP, DeltaEncoding.CONSECUTIVE,
                DeltaEncoding.LOOKBACK):
            return None

    built = pe._build_launch_args(groups, dev_rows=dev_rows)
    job_loc = {}
    for gi, (schema_g, jobs_g, _da) in enumerate(built):
        for j in jobs_g:
            job_loc[id(j)] = (gi, int(j["chain_start"]), schema_g)
    _trace("launch args")

    rows_per_chunk = extras.get("rows_per_chunk", 0)
    chunks = []
    lb_parts = []
    lb_off = 0
    sec_j = 0
    for ci, cc in enumerate(ccs):
        _kind, jlist = chunk_jobs[ci]
        jl_by_var = {j.get("var", "primary"): j for j in jlist}
        de = cc.meta.delta_encoding
        vars_out = []
        sec_sum = 0
        for key, lvc in cc.lvcs.enumerated():
            vm = cc.meta.per_latent_var.get(key)
            sl = int(vm.ans_size_log)
            n_state = de.for_latent_var(key).n_latents_per_state()
            state_bits = vm.latent_type.bits
            j = jl_by_var.get(key)
            if j is None:
                vars_out.append(MVar(key, sl, 0, n_state, state_bits, -1, 0))
            else:
                gi, cs, schema_g = job_loc[id(j)]
                sec_sum += schema_g.sec_words
                vars_out.append(MVar(
                    key, sl, int(j["tables"][4]), n_state, state_bits,
                    gi, cs))
        sec_j = max(sec_j, sec_sum)
        per = ctn._exact_split(chunk_ns[ci], page_n)
        npg = len(per)
        last_nb = -(-per[-1] // BATCH)
        if de.kind == DeltaEncoding.LOOKBACK:
            states = np.asarray(cc.page_infos.states)
            lb_parts.append(states.astype(np.uint64))
            mrow, lbrow = -1, lb_off
            lb_off += npg
        else:
            mrow, lbrow = ci * rows_per_chunk, -1
        chunks.append(MChunk(npg, last_nb, mrow, lbrow, tuple(vars_out)))

    SEC_J = max(128, -(-sec_j // 128) * 128)
    if SEC_J > 3072:
        return None  # joint stream exceeds the EC kernel's VMEM budget
    meta_bits = [sum(v.n_state * v.state_bits + 4 * v.sl for v in ch.vars)
                 for ch in chunks]
    meta_bytes = tuple((b + 7) // 8 for b in meta_bits)
    mw = max(1, -(-(max(meta_bits) + 24) // 32))
    if SEC_J + (-(-max(meta_bytes) // 4) + 2) > _sb_words():
        return None  # a merged row could span >1 superblock

    if lb_parts:
        lbw = max(p.shape[1] for p in lb_parts)
        lb_np = np.zeros((lb_off, lbw), np.uint64)
        r0 = 0
        for p in lb_parts:
            lb_np[r0:r0 + p.shape[0], :p.shape[1]] = p
            r0 += p.shape[0]
    else:
        lb_np = np.zeros((1, 1), np.uint64)

    spec = MSpec(page_n=page_n, sec_words=SEC_J, mw=mw,
                 chunks=tuple(chunks), n_launches=len(built))
    entry_sel = _entry_sel_np(chunks, page_n)
    E = len(entry_sel)

    # dispatch EB right away: the kernels run during the host meta tail
    eb_handles = [
        _eb_jit(schema_g)(*dev_args) for schema_g, _j, dev_args in built
    ]
    _trace("EB dispatch")

    # host bytes: wrapped header + chunk metas
    w = BitWriter()
    FileCompressor().write_header(w)
    wrapped_hdr = w.to_bytes()
    prefixes = []
    for ci, cc in enumerate(ccs):
        mw_ = BitWriter()
        cc.write_meta(mw_)
        m = mw_.to_bytes()
        prefixes.append((wrapped_hdr + m) if ci == 0 else m)
    _trace("prefix serialization")
    if max(len(p) for p in prefixes) > (_sb_words() * 4) // 2 - 64:
        return None  # giant chunk meta (huge dict): keep host assembly

    n_pages = tuple(ch.npg for ch in chunks)
    cspec = (len(chunks), n_pages, meta_bytes,
             tuple(len(p) for p in prefixes))
    R = int(sum(n_pages))

    dir_bytes = 8 * len(chunk_ns) + 4 * R + 4 * E
    header = struct.pack(
        ctn.HEADER_FMT, ctn.MAGIC, nt.type_byte, 1, 0, page_n,
        int(sum(chunk_ns)), len(chunk_ns), dir_bytes)
    cmb = [len(p) for p in prefixes]
    cmb[0] -= len(wrapped_hdr)
    head_host = (header
                 + np.asarray(chunk_ns, np.uint32).tobytes()
                 + np.asarray(cmb, np.uint32).tobytes())
    head_host_words = jnp.asarray(
        np.frombuffer(head_host, np.uint8).view(np.uint32).copy())
    head_bytes = len(head_host) + 4 * R + 4 * E

    pw = max(1, -(-max(len(p) for p in prefixes) // 4))
    pfx_np = np.zeros((len(prefixes), pw * 4), np.uint8)
    for ci, p in enumerate(prefixes):
        pfx_np[ci, :len(p)] = np.frombuffer(p, np.uint8)
    pfx_words = jnp.asarray(pfx_np.view(np.uint32))

    body_est = sum(len(p) for p in prefixes) + 64
    for ci, cc in enumerate(ccs):
        npg = chunks[ci].npg
        body_est += npg * meta_bytes[ci] + 8 * npg
        for key, lvc in cc.lvcs.enumerated():
            ns = int(np.sum(cc.page_infos.stored_counts(key)))
            body_est += int(ns * float(lvc.avg_bits_per_latent) * 1.05 / 8)
    nsb_ub = int(-(-(-(-body_est // 4)) // _sb_words())) + 2

    _trace("layout+head")
    return dict(
        mode="multi", spec=spec, cspec=cspec,
        schemas=[b[0] for b in built], eb_handles=eb_handles,
        moments_dev=extras["moments_dev"], lb_rows=jnp.asarray(lb_np),
        entry_sel=jnp.asarray(entry_sel),
        head_host_words=head_host_words, pfx_words=pfx_words,
        head_bytes=head_bytes, nsb_ub=nsb_ub, nt=nt, ccs=ccs,
    )


# ---------------------------------------------------------------------------
# public entry: full device container encode to a file image
# ---------------------------------------------------------------------------


def _bucket(x, choices):
    for ch in choices:
        if x <= ch:
            return ch
    return None


def plan_image(nums, config=None, page_n: int = 1024, chunk_n: int = 1 << 20,
               nums_host=None, dev_bits=None):
    """Train (plan_encode_device) + build the image layout. Returns None
    when this input is outside the image path's coverage (the caller falls
    back to pallas_encode.encode_container_device, byte-identical output).

    Coverage: every chunk on the device pipeline, single launch group,
    single (primary) latent var, consecutive/noop delta — i.e. Classic and
    Dict chunks, which includes every auto-mode int winner on taxi-like
    data. Multi-var modes (IntMult/Float*) and lookback keep the host
    assembly for now.
    """
    import struct
    from pcodec_tpu.codec import container as ctn
    from pcodec_tpu.codec.wrapped import FileCompressor
    from pcodec_tpu.format.bitio import BitWriter
    from pcodec_tpu.format.metadata import DeltaEncoding
    from pcodec_tpu.ops import pallas_encode as pe
    from pcodec_tpu.ops.device_train import plan_encode_device

    import os as _os
    import time as _time
    _tr = bool(int(_os.environ.get("PCODEC_TRAIN_TRACE", "0")))
    _t0 = _time.time()

    def _trace(label):
        nonlocal _t0
        if _tr:
            print(f"    [image] {label}: {_time.time() - _t0:.3f}s",
                  flush=True)
        _t0 = _time.time()

    extras = {}
    planned = plan_encode_device(nums, config, page_n, chunk_n, extras=extras,
                                 nums_host=nums_host, dev_bits=dev_bits)
    if planned is None or "moments_dev" not in extras:
        return None
    _trace("train")
    nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
    if not all(kind == "device" for kind, _ in chunk_jobs):
        return None

    def _single_ok():
        if len(groups) != 1:
            return False
        for ci, (kind, jlist) in enumerate(chunk_jobs):
            if not isinstance(jlist, list) or len(jlist) != 1:
                return False
            if jlist[0].get("var", "primary") != "primary":
                return False
            pv = ccs[ci].meta.per_latent_var
            if pv.secondary is not None or pv.delta is not None:
                # a trivial secondary writes no body bits but still owns
                # page-meta fields and zero directory entries — the joint
                # path handles those
                return False
            de = ccs[ci].meta.delta_encoding
            if de.kind not in (DeltaEncoding.NOOP, DeltaEncoding.CONSECUTIVE):
                return False
        return True

    if not _single_ok():
        # multi-latent-var / lookback chunks: joint-cursor interleaved path
        plan_m = _plan_image_multi(nt, chunk_ns, ccs, chunk_jobs, groups,
                                   dev_rows, extras, page_n, _trace)
        return plan_m

    (schema, jobs, dev_args), = pe._build_launch_args(groups, dev_rows=dev_rows)
    assert [j["ci"] for j in jobs] == list(range(len(ccs)))
    _trace("launch args")

    plt_bits = ccs[0].meta.mode.primary_latent_type(nt.latent).bits
    orders, sls, tss, meta_bytes = [], [], [], []
    for ci, cc in enumerate(ccs):
        de = cc.meta.delta_encoding
        o = de.order if de.kind == DeltaEncoding.CONSECUTIVE else 0
        sl = cc.meta.per_latent_var.primary.ans_size_log
        orders.append(int(o))
        sls.append(int(sl))
        tss.append(int(jobs[ci]["tables"][4]))
        meta_bytes.append((o * plt_bits + 4 * sl + 7) // 8)

    # schema-only guard BEFORE the launch dispatch (nothing below needs
    # device output to decide it): a merged row = page-meta row + section
    # row; slack derived from the actual max page-meta size instead of a
    # hard-coded constant so layout growth can't silently overflow a
    # superblock
    mb_max_words = -(-max(meta_bytes) // 4) + 2
    if schema.sec_words + mb_max_words > _sb_words():
        return None  # a merged row could span >1 superblock: host assembly

    # dispatch EB/EC right away: the kernels run while the host serializes
    # chunk metas and builds the layout below (~0.1 s at 64M that would
    # otherwise sit in front of the device work)
    launch_out = _run_launch_jit(schema)(*dev_args)
    _trace("launch dispatch")

    # host bytes: wrapped header + chunk metas (they carry the trained bins)
    w = BitWriter()
    FileCompressor().write_header(w)
    wrapped_hdr = w.to_bytes()
    prefixes = []
    for ci, cc in enumerate(ccs):
        mw_ = BitWriter()
        cc.write_meta(mw_)
        m = mw_.to_bytes()
        prefixes.append((wrapped_hdr + m) if ci == 0 else m)
    _trace("prefix serialization")
    if max(len(p) for p in prefixes) > (_sb_words() * 4) // 2 - 64:
        return None  # giant chunk meta (huge dict): keep host assembly

    pages_pc = []
    for cn in chunk_ns:
        pages_pc.append((cn // page_n, cn % page_n))

    layout = ImageLayout(
        page_n=page_n, n_chunks=len(chunk_ns),
        rows_per_chunk=extras["rows_per_chunk"],
        pages_per_chunk=tuple(pages_pc), orders=tuple(orders),
        sls=tuple(sls), ts=tuple(tss), bits=plt_bits,
        meta_bytes=tuple(meta_bytes),
        pfx_bytes=tuple(len(p) for p in prefixes),
        sec_words=schema.sec_words,
    )

    # head host bytes: PCT header (dir_bytes is layout-static) + chunk dirs
    R = layout.total_pages
    E = int(sum(-(-l // BATCH) for l in layout.page_lens()))
    # ans + off u16 regions total 4E bytes (always word-aligned; for odd E
    # the last ans entry shares a word with the first off entry)
    dir_bytes = 8 * len(chunk_ns) + 4 * R + 4 * E
    header = struct.pack(
        ctn.HEADER_FMT, ctn.MAGIC, nt.type_byte, 1, 0, page_n,
        len(nums), len(chunk_ns), dir_bytes)
    # chunk 0's prefix carries the wrapped header, which is NOT part of its
    # chunk_meta_bytes directory entry
    cmb = [len(p) for p in prefixes]
    cmb[0] -= len(wrapped_hdr)
    head_host = (header
                 + np.asarray(chunk_ns, np.uint32).tobytes()
                 + np.asarray(cmb, np.uint32).tobytes())
    head_host_words = jnp.asarray(
        np.frombuffer(head_host, np.uint8).view(np.uint32).copy())
    head_bytes = len(head_host) + 4 * R + 4 * E

    pw = max(1, -(-max(len(p) for p in prefixes) // 4))
    pfx_np = np.zeros((len(prefixes), pw * 4), np.uint8)
    for ci, p in enumerate(prefixes):
        pfx_np[ci, :len(p)] = np.frombuffer(p, np.uint8)
    pfx_words = jnp.asarray(pfx_np.view(np.uint32))

    # expected body size from the trained bins' average bits (ANS output
    # tracks it closely); +5% and slack make the optimistic stitch's
    # superblock count almost always sufficient — the guard check in
    # run_image redoes the stitch with the actual count when not
    body_est = sum(layout.pfx_bytes) + 64
    for ci2, cc in enumerate(ccs):
        npg = layout.n_pages[ci2]
        avg = float(cc.lvcs.primary.avg_bits_per_latent)
        body_est += npg * layout.meta_bytes[ci2]
        body_est += int(chunk_ns[ci2] * avg * 1.05 / 8) + 8 * npg
    nsb_ub = int(-(-(-(-body_est // 4)) // _sb_words())) + 2

    _trace("layout+head")
    return dict(layout=layout, schema=schema, dev_args=dev_args,
                launch_out=launch_out, moments_dev=extras["moments_dev"],
                head_host_words=head_host_words, pfx_words=pfx_words,
                head_bytes=head_bytes, nt=nt, ccs=ccs, nsb_ub=nsb_ub)


_RUN_JIT_CACHE = {}


def _run_launch_jit(schema):
    """jit cache keyed by schema: a fresh jax.jit(partial(...)) per call
    would retrace every encode."""
    from pcodec_tpu.ops import pallas_encode as pe

    fn = _RUN_JIT_CACHE.get(schema)
    if fn is None:
        if len(_RUN_JIT_CACHE) > 16:
            _RUN_JIT_CACHE.clear()
        fn = jax.jit(partial(pe._run_launch_device, schema))
        _RUN_JIT_CACHE[schema] = fn
    return fn


def _default_caps():
    sc = _caps_scale()
    return (32 * sc, 8)


def _run_multi_prep(plan):
    """EB outputs -> joint cursors -> per-launch EC at joint positions ->
    merged prep (see _plan_image_multi)."""
    from dataclasses import replace as _replace

    spec = plan["spec"]
    ebs = plan["eb_handles"]
    eb_lens = tuple((o[2], o[3]) for o in ebs)
    fstates_list = tuple(o[1] for o in ebs)
    curs, rowsA0, tb, ansoff = _multi_glue(
        spec, eb_lens, fstates_list, plan["moments_dev"], plan["lb_rows"],
        plan["entry_sel"])
    sections = []
    for g, schema_g in enumerate(plan["schemas"]):
        k = 4
        offlo = ebs[g][k] if schema_g.has_off else None
        k += 1 if schema_g.has_off else 0
        offhi = ebs[g][k] if schema_g.off64 else None
        schema_ec = _replace(schema_g, sec_words=spec.sec_words)
        args = [curs[g], ebs[g][0]]
        if offlo is not None:
            args.append(offlo)
        if offhi is not None:
            args.append(offhi)
        sections.append(_ec_jit(schema_ec)(*args))
    return _prep_multi(spec, plan["cspec"], tuple(sections), rowsA0, tb,
                       ansoff, plan["head_host_words"], plan["pfx_words"])


def run_image(plan, use_pallas: bool = True):
    """Run EB/EC + prep + stitch. Returns (head_words, body_words,
    head_bytes, body_bytes) with both word arrays device-resident.

    The stitch is dispatched OPTIMISTICALLY with default row caps and the
    layout's worst-case superblock count, so it queues right behind prep on
    the device; the guard scalars transfer while it runs and only trigger a
    (rare) redo when the data's row clustering exceeds the defaults."""
    if plan.get("mode") == "multi":
        prep = _run_multi_prep(plan)
    else:
        out = plan.get("launch_out")
        if out is None:
            out = _run_launch_jit(plan["schema"])(*plan["dev_args"])
        sections, fstates, ans_len, off_len, total_bits = out
        prep = _prepare_image(
            plan["layout"], sections, fstates, ans_len, off_len, total_bits,
            plan["moments_dev"], plan["head_host_words"], plan["pfx_words"])
    try:
        prep["guards"].copy_to_host_async()
    except Exception:
        pass

    body = None
    if use_pallas:
        body = stitch_pallas(prep, plan["nsb_ub"], _default_caps())

    guards = np.asarray(prep["guards"])
    body_bytes = int(guards[0])
    nsb = int(guards[2])
    sc = _caps_scale()
    caps = tuple(
        _bucket(int(g), (8 * sc, 16 * sc, 32 * sc, 64 * sc))
        for g in guards[3:5])
    if use_pallas and all(c_ is not None for c_ in caps):
        if (nsb > plan["nsb_ub"]
                or any(int(g) > d
                       for g, d in zip(guards[3:5], _default_caps()))):
            body = stitch_pallas(prep, nsb, caps)  # optimistic guess too small
    else:
        K = _bucket(int(max(guards[5:7])) + 1, (4, 8, 16))
        if K is None:
            return None  # pathological row clustering: host assembly
        W_pad = _round_up(max(int(guards[1]), 1), _W_BUCKET)
        body = _stitch_xla(
            prep["rowsA"], prep["F0A"], prep["lenA"],
            prep["rowsC"], prep["F0C"], prep["lenC"], W_pad=W_pad, K=K)
    return prep["head_words"], body, plan["head_bytes"], body_bytes


def _round_up(x, m):
    return -(-x // m) * m


def encode_container_image_device(nums, config=None, page_n: int = 1024,
                                  chunk_n: int = 1 << 20,
                                  use_pallas: bool = True, nums_host=None):
    """Full device container encode to an HBM-resident file image.

    Returns (head_words, body_words, head_bytes, body_bytes) or None when
    the input is outside the image path (caller falls back to
    pallas_encode.encode_container_device; output bytes are identical
    either way)."""
    plan = plan_image(nums, config, page_n, chunk_n, nums_host=nums_host)
    if plan is None:
        return None
    return run_image(plan, use_pallas=use_pallas)


def file_image_to_bytes(head_words, body_words, head_bytes, body_bytes):
    hb = np.asarray(head_words).view(np.uint8)[:head_bytes]
    bb = np.asarray(body_words).view(np.uint8)[:body_bytes]
    return hb.tobytes() + bb.tobytes()
