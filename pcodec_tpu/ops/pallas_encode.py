"""Pallas TPU encode kernels: dissection + bit-packing on device.

The encode mirror of ops/pallas_decode.py. Chains are (page, latent var);
one (8,128) vreg holds 256 chains x 4 interleaved streams, chain (g, s) at
sublane s, lanes 4g..4g+3.

EB kernel (reverse walk), per round, all dense VPU work:
  - bin index by branchless binary search in the chunk-shared sorted bin
    lowers (row-replicated lane-gather select trees; u64 compare in u32
    pairs) — ref: compression_table.rs:51-74
  - reverse 4-stream tANS encode: renorm = min_renorm + (state >= cutoff),
    val = state & mask(renorm), state = nexts[wbase[sym] + (state>>renorm) -
    weight[sym]] — ref: chunk_latent_compressor.rs:96-132, ans/encoding.rs
  - offset = latent - lower[sym] (u32 pair subtraction)
  No bit cursors exist in the walk (positions are prefix sums computed
  afterwards), which makes encode's serial chain cheaper than decode's.

EC kernel (forward pack): each round deposits 4 ans values and 4 offsets at
prefix-summed bit positions into multi-word per-quad accumulators; completed
words retire into a per-group circular 128-word write window; the window is
dumped into the chain's section buffer on a static schedule. Every write
OR-merges, so words shared between adjacent [ans][offset] sections compose.

Host keeps: sampling-based mode/delta selection, bin training DP + weight
quantization, chunk/page metadata, file assembly. Compressed sections stay
device-resident; tests assemble small files and compare byte-exactly with
the host encoder (same bins in => identical stream out).
"""

from dataclasses import dataclass, replace as _dc_replace
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcodec_tpu import constants as c
from pcodec_tpu.format import ans

TILE_CHAINS = 256
TILE_GROUPS = 32
BATCH = c.FULL_BATCH_N
RPB = BATCH // c.ANS_INTERLEAVING  # rounds per batch (64)


def _interpret():
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _srl(x, k):
    return jax.lax.shift_right_logical(x, jnp.int32(k))


def _sll(x, k):
    return jax.lax.shift_left(x, jnp.int32(k))


@dataclass(frozen=True)
class EncSchema:
    page_n: int
    ts: int          # padded next_states table size (pow2, >= 128)
    b_pad: int       # padded bin count (pow2, >= 128)
    max_ob: int      # max offset bits in launch (0 / <=32 / <=64)
    sec_words: int   # section buffer words per chain (multiple of 128)

    @property
    def rounds(self):
        return self.page_n // c.ANS_INTERLEAVING

    @property
    def n_batches(self):
        return self.page_n // BATCH

    @property
    def has_off(self):
        return self.max_ob > 0

    @property
    def off64(self):
        return self.max_ob > 32

    @property
    def n_acc_off(self):  # accumulator vregs for the offset cursor
        # per-round reach: 31 + 4*max_ob (+32 for the hi part) bits
        if not self.has_off:
            return 0
        reach = 31 + 4 * self.max_ob + (32 if self.off64 else 0) + 32
        return -(-reach // 128)

    @property
    def dump_period(self):  # rounds between window dumps
        adv_off = (4 * self.max_ob) // 32 + 2 if self.has_off else 1
        k = 1
        while 2 * k * max(3, adv_off) <= 100:
            k *= 2
        return min(k, RPB)


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _tree_gather(planes, idx):
    lo = idx & 127
    out = jnp.take_along_axis(planes[0], lo, axis=1)
    if len(planes) > 1:
        sel = _srl(idx, 7)
        for k in range(1, len(planes)):
            g = jnp.take_along_axis(planes[k], lo, axis=1)
            out = jnp.where(sel == k, g, out)
    return out


def _uge(a, b):
    """unsigned >= on int32 bit patterns."""
    m = jnp.int32(-0x80000000)
    return (a ^ m) >= (b ^ m)


# ---------------------------------------------------------------------------
# EB: binning + reverse ANS walk
# ---------------------------------------------------------------------------


def _eb_kernel(schema: EncSchema, tid_ref, latlo_ref, lathi_ref, tbl_ref,
               bodyn_ref, states0_ref, *out_refs):
    with jax.enable_x64(False):
        _eb_impl(schema, tid_ref, latlo_ref, lathi_ref, tbl_ref, bodyn_ref,
                 states0_ref, *out_refs)


def _eb_impl(schema, tid_ref, latlo_ref, lathi_ref, tbl_ref, bodyn_ref,
             states0_ref, *out_refs):
    p1_ref = out_refs[0]
    offlo_ref = out_refs[1] if schema.has_off else None
    offhi_ref = out_refs[2] if schema.off64 else None
    states_ref = out_refs[-1]

    nexts = [tbl_ref[0, 0][:, k * 128:(k + 1) * 128] for k in range(schema.ts // 128)]
    nb = schema.b_pad // 128
    lolo = [tbl_ref[0, 1][:, k * 128:(k + 1) * 128] for k in range(nb)]
    lohi = [tbl_ref[0, 2][:, k * 128:(k + 1) * 128] for k in range(nb)]
    t1p = [tbl_ref[0, 3][:, k * 128:(k + 1) * 128] for k in range(nb)]
    t2p = [tbl_ref[0, 4][:, k * 128:(k + 1) * 128] for k in range(nb)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    jq = lane & 3
    bodyn = bodyn_ref[0]
    R = schema.rounds

    def bin_search(llo, lhi):
        """index of the last bin with lower <= latent (padding = u64 max)."""
        idx = jnp.zeros((8, 128), jnp.int32)
        step = schema.b_pad >> 1
        while step >= 1:
            cand = idx + step
            clo = _tree_gather(lolo, cand)
            chi = _tree_gather(lohi, cand)
            eq = lhi == chi
            ge = (eq & _uge(llo, clo)) | (~eq & _uge(lhi, chi))
            idx = jnp.where(ge, cand, idx)
            step >>= 1
        return idx

    def round_body(rr, states):
        r = R - 1 - rr
        llo = latlo_ref[0, r]
        lhi = lathi_ref[0, r]
        valid = (4 * r + jq) < bodyn

        sym = bin_search(llo, lhi)
        t1 = _tree_gather(t1p, sym)
        t2 = _tree_gather(t2p, sym)
        minren = t1 & 15
        ob = _srl(t1, 4) & 127
        cutoff = _srl(t1, 11)
        renorm = minren + jnp.where(_uge(states, cutoff), 1, 0)
        val = states & ((jnp.int32(1) << renorm) - 1)
        nidx = t2 + jax.lax.shift_right_logical(states, renorm)
        nstate = _tree_gather(nexts, nidx & (schema.ts - 1))
        states = jnp.where(valid, nstate, states)

        val = jnp.where(valid, val, 0)
        renorm = jnp.where(valid, renorm, 0)
        ob = jnp.where(valid, ob, 0)
        p1_ref[0, r] = val | _sll(renorm, 15) | _sll(ob, 19)

        if offlo_ref is not None:
            blo = _tree_gather(lolo, sym)
            olo = llo - blo
            offlo_ref[0, r] = jnp.where(valid, olo, 0)
            if offhi_ref is not None:
                bhi = _tree_gather(lohi, sym)
                borrow = jnp.where(_uge(llo, blo), 0, 1)
                ohi = lhi - bhi - borrow
                offhi_ref[0, r] = jnp.where(valid, ohi, 0)
        return states

    states0 = states0_ref[0]  # encoder default state = real table size
    states = jax.lax.fori_loop(jnp.int32(0), jnp.int32(R), round_body, states0)
    states_ref[0] = states


def _eb_call(schema: EncSchema, latlo, lathi, tables, bodyn, states0, tbl_ids):
    n_tiles = latlo.shape[0]
    R = schema.rounds
    rspec = pl.BlockSpec(
        (1, R, 8, 128),
        lambda i, t: (i, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((n_tiles, R, 8, 128), jnp.int32)]
    out_specs = [rspec]
    if schema.has_off:
        out_shapes.append(out_shapes[0])
        out_specs.append(rspec)
    if schema.off64:
        out_shapes.append(out_shapes[0])
        out_specs.append(rspec)
    out_shapes.append(jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32))
    out_specs.append(pl.BlockSpec(
        (1, 8, 128), lambda i, t: (i, jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            rspec,
            rspec,
            pl.BlockSpec((1, 5, 8, max(schema.ts, schema.b_pad)),
                         lambda i, t: (t[i], jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, t: (i, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, t: (i, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
    )
    return pl.pallas_call(
        partial(_eb_kernel, schema),
        out_shape=tuple(out_shapes),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(tbl_ids, latlo, lathi, tables, bodyn, states0)


# ---------------------------------------------------------------------------
# EC: forward bit packing
# ---------------------------------------------------------------------------


def _ec_kernel(schema: EncSchema, curs_ref, p1_ref, *rest):
    with jax.enable_x64(False):
        _ec_impl(schema, curs_ref, p1_ref, *rest)


def _ec_impl(schema, curs_ref, p1_ref, *rest):
    i = 0
    offlo_ref = rest[i] if schema.has_off else None
    i += 1 if schema.has_off else 0
    offhi_ref = rest[i] if schema.off64 else None
    i += 1 if schema.off64 else 0
    out_ref = rest[i]
    wst_ans = rest[i + 1]
    wst_off = rest[i + 2]

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    jq = lane & 3
    qb = lane & ~3
    lane_or3 = lane | 3
    gmask = [(lane >> 2) == g for g in range(TILE_GROUPS)]
    c4g = [jnp.full((8, 128), 4 * g, jnp.int32) for g in range(TILE_GROUPS)]
    nsub = schema.sec_words // 128
    K = schema.dump_period
    n_acc_a = 1
    n_acc_o = schema.n_acc_off

    def quad_excl_prefix(x):
        r1 = jnp.where(jq >= 1, pltpu.roll(x, jnp.int32(1), axis=1), 0)
        r2 = jnp.where(jq >= 2, pltpu.roll(x, jnp.int32(2), axis=1), 0)
        r3 = jnp.where(jq >= 3, pltpu.roll(x, jnp.int32(3), axis=1), 0)
        return r1 + r2 + r3

    def rep_quad_last(x):
        return jnp.take_along_axis(x, lane_or3, axis=1)

    def deposit(accs, abase, vals, pos, width):
        """OR quad values (< 2^width) at bit positions pos into accumulators;
        acc vreg k lane (quad, t) covers section-word (abase + 4k + t)."""
        rel = pos - _sll(abase, 5)
        for j in range(4):
            v = jnp.take_along_axis(vals, qb + j, axis=1)
            b = jnp.take_along_axis(rel, qb + j, axis=1)
            for k in range(len(accs)):
                cdel = b - _sll(jq, 5) - (128 * k)
                in_lo = (cdel >= 0) & (cdel < 32)
                in_hi = (cdel < 0) & (cdel > -width)
                contrib = jnp.where(
                    in_lo, jax.lax.shift_left(v, jnp.where(in_lo, cdel, 0)), 0)
                contrib = contrib | jnp.where(
                    in_hi, jax.lax.shift_right_logical(v, jnp.where(in_hi, -cdel, 1)), 0)
                accs[k] = accs[k] | contrib
        return accs

    def retire(accs, nf):
        """Shift accumulators down by nf words (per chain, replicated per
        quad); returns new accs. Old accs hold the flushed words."""
        n = len(accs)
        new = []
        for k in range(n):
            srcw = 4 * k + jq + nf  # source word offset within the acc
            val = jnp.zeros((8, 128), jnp.int32)
            for k2 in range(n):
                m = (srcw >= 4 * k2) & (srcw < 4 * k2 + 4)
                g = jnp.take_along_axis(accs[k2], qb + (srcw & 3), axis=1)
                val = jnp.where(m, g, val)
            new.append(val)
        return new

    def flush_to_window(wst_ref, accs, abase, nf, max_nf):
        """Write section words [abase, abase+nf) from accs into the circular
        window (slot = word & 127), replacing slots."""
        for g in range(TILE_GROUPS):
            base_rep = jnp.take_along_axis(abase, c4g[g], axis=1)
            nf_rep = jnp.take_along_axis(nf, c4g[g], axis=1)
            rel = lane - (base_rep & 127)
            rel = jnp.where(rel < 0, rel + 128, rel)
            m = rel < jnp.minimum(nf_rep, max_nf)
            val = jnp.zeros((8, 128), jnp.int32)
            for k2 in range(len(accs)):
                mk = (rel >= 4 * k2) & (rel < 4 * k2 + 4)
                gk = jnp.take_along_axis(accs[k2], (c4g[g] + (rel & 3)), axis=1)
                val = jnp.where(mk, gk, val)
            cur = wst_ref[g]
            wst_ref[g] = jnp.where(m, val, cur)

    def dump_window(wst_ref, dumped, abase):
        """OR window words [dumped, abase) into the output section buffer."""
        for g in range(TILE_GROUPS):
            lo_rep = jnp.take_along_axis(dumped, c4g[g], axis=1)
            hi_rep = jnp.take_along_axis(abase, c4g[g], axis=1)
            win = wst_ref[g]
            for t in range(nsub):
                secw = t * 128 + lane
                m = (secw >= lo_rep) & (secw < hi_rep)
                cur = out_ref[0, g, :, t * 128:(t + 1) * 128]
                out_ref[0, g, :, t * 128:(t + 1) * 128] = jnp.where(m, cur | win, cur)

    # zero-init windows and output block
    zero = jnp.zeros((8, 128), jnp.int32)
    for g in range(TILE_GROUPS):
        wst_ans[g] = zero
        wst_off[g] = zero
        for t in range(nsub):
            out_ref[0, g, :, t * 128:(t + 1) * 128] = zero

    four = jnp.full((8, 128), 4, jnp.int32)

    def mk_round(b):
        def round_body(r, carry):
            anscur, offcur, acc_a, abase_a, acc_o, abase_o = carry
            p1 = p1_ref[0, RPB * b + r]
            val = p1 & 0x7FFF
            bits = _srl(p1, 15) & 15
            ob = _srl(p1, 19) & 127

            cumA = anscur + quad_excl_prefix(bits)
            acc_a = deposit(list(acc_a), abase_a, val, cumA, 15)
            anscur = rep_quad_last(cumA + bits)
            nb_a = _srl(anscur, 5)
            nf = nb_a - abase_a
            flush_to_window(wst_ans, acc_a, abase_a, nf, 4 * n_acc_a)
            acc_a = retire(acc_a, nf)
            abase_a = nb_a

            if offlo_ref is not None:
                cumO = offcur + quad_excl_prefix(ob)
                olo = offlo_ref[0, RPB * b + r]
                acc_o = deposit(list(acc_o), abase_o, olo, cumO, 32)
                if offhi_ref is not None:
                    ohi = offhi_ref[0, RPB * b + r]
                    acc_o = deposit(list(acc_o), abase_o, ohi, cumO + 32, 32)
                offcur = rep_quad_last(cumO + ob)
                nb_o = _srl(offcur, 5)
                nf_o = nb_o - abase_o
                flush_to_window(wst_off, acc_o, abase_o, nf_o, 4 * n_acc_o)
                acc_o = retire(acc_o, nf_o)
                abase_o = nb_o
            return anscur, offcur, tuple(acc_a), abase_a, tuple(acc_o), abase_o
        return round_body

    acc_a = tuple(zero for _ in range(n_acc_a))
    acc_o = tuple(zero for _ in range(max(n_acc_o, 1)))
    dumped_a = jnp.zeros((8, 128), jnp.int32)
    dumped_o = jnp.zeros((8, 128), jnp.int32)
    abase_a = dumped_a
    abase_o = dumped_o
    anscur = dumped_a
    offcur = dumped_a

    first = True
    for b in range(schema.n_batches):
        # close out the previous sections: flush accs fully, dump, jump
        if not first:
            flush_to_window(wst_ans, list(acc_a), abase_a, four, 4)
            dump_window(wst_ans, dumped_a, abase_a + 4)
            if schema.has_off:
                flush_to_window(wst_off, list(acc_o), abase_o, four, 4 * n_acc_o)
                # off acc may hold >4 pending words; flush the rest too
                if n_acc_o > 1:
                    acc_rest = retire(list(acc_o), four)
                    flush_to_window(wst_off, acc_rest, abase_o + 4,
                                    jnp.full((8, 128), 4 * (n_acc_o - 1), jnp.int32),
                                    4 * (n_acc_o - 1))
                dump_window(wst_off, dumped_o, abase_o + 4 * n_acc_o)
        anscur = curs_ref[0, 2 * b]
        offcur = curs_ref[0, 2 * b + 1]
        abase_a = _srl(anscur, 5)
        abase_o = _srl(offcur, 5)
        dumped_a = abase_a
        dumped_o = abase_o
        acc_a = tuple(zero for _ in range(n_acc_a))
        acc_o = tuple(zero for _ in range(max(n_acc_o, 1)))
        first = False

        carry = (anscur, offcur, acc_a, abase_a, acc_o, abase_o)
        for s0 in range(0, RPB, K):
            carry = jax.lax.fori_loop(
                jnp.int32(s0), jnp.int32(min(s0 + K, RPB)), mk_round(b), carry)
            # dump retired words, keeping the circular window from wrapping
            anscur, offcur, acc_a, abase_a, acc_o, abase_o = carry
            dump_window(wst_ans, dumped_a, abase_a)
            dumped_a = abase_a
            if schema.has_off:
                dump_window(wst_off, dumped_o, abase_o)
                dumped_o = abase_o
        anscur, offcur, acc_a, abase_a, acc_o, abase_o = carry

    # final close-out
    flush_to_window(wst_ans, list(acc_a), abase_a, four, 4)
    dump_window(wst_ans, dumped_a, abase_a + 4)
    if schema.has_off:
        flush_to_window(wst_off, list(acc_o), abase_o, four, 4 * n_acc_o)
        if n_acc_o > 1:
            acc_rest = retire(list(acc_o), four)
            flush_to_window(wst_off, acc_rest, abase_o + 4,
                            jnp.full((8, 128), 4 * (n_acc_o - 1), jnp.int32),
                            4 * (n_acc_o - 1))
        dump_window(wst_off, dumped_o, abase_o + 4 * n_acc_o)


def _ec_call(schema: EncSchema, curs, p1, offlo, offhi):
    n_tiles = curs.shape[0]
    R = schema.rounds
    rspec = pl.BlockSpec(
        (1, R, 8, 128),
        lambda i: (i, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 2 * schema.n_batches, 8, 128),
                     lambda i: (i, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        rspec,
    ]
    args = [curs, p1]
    if schema.has_off:
        in_specs.append(rspec)
        args.append(offlo)
    if schema.off64:
        in_specs.append(rspec)
        args.append(offhi)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, TILE_GROUPS, 8, schema.sec_words),
            lambda i: (i, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_GROUPS, 8, 128), jnp.int32),
            pltpu.VMEM((TILE_GROUPS, 8, 128), jnp.int32),
        ],
    )
    kw = {}
    if schema.sec_words > 2048:
        # wide sections (low-ratio 64-bit chunks): the out block alone is
        # >2 MB; raise the VMEM budget ONLY for these schemas so the
        # common shapes keep their measured schedule
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024)
    return pl.pallas_call(
        partial(_ec_kernel, schema),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, TILE_GROUPS, 8, schema.sec_words), jnp.int32),
        grid_spec=grid_spec,
        interpret=_interpret(),
        **kw,
    )(*args)


# ---------------------------------------------------------------------------
# table building (host)
# ---------------------------------------------------------------------------


def build_enc_tables(var_meta):
    """(nexts, lowers, t1, t2, ts): T1 = min_renorm | ob<<4 | cutoff<<11;
    T2 = wbase - weight so st' = nexts[T2[sym] + (st >> renorm)]."""
    bins = var_meta.bins
    n_bins = len(bins)
    spec = ans.Spec.from_weights(var_meta.ans_size_log, bins.weights.tolist())
    enc = ans.Encoder(spec)
    ts = max(spec.table_size, 1)
    weights = np.asarray(enc.weights, dtype=np.int64)
    wbase = np.cumsum(weights) - weights
    nexts = np.zeros(ts, dtype=np.int64)
    for s in range(n_bins):
        ns = np.asarray(enc.next_states[s], dtype=np.int64)
        nexts[wbase[s] : wbase[s] + weights[s]] = ns
    minren = np.asarray(enc.min_renorm_bits, dtype=np.int64)
    cutoff = np.asarray(enc.renorm_bit_cutoff, dtype=np.int64)
    ob = bins.offset_bits.astype(np.int64)
    t1 = minren | (ob << 4) | (cutoff << 11)
    t2 = wbase - weights
    lowers = bins.lowers.astype(np.uint64)
    return nexts, lowers, t1, t2, ts


# ---------------------------------------------------------------------------
# driver: full container encode with device dissection + packing
# ---------------------------------------------------------------------------


def _to_round_layout(x):
    """(n_tiles*256, page_n) -> (n_tiles, R, 8, 128) jnp (inverse chainsify)."""
    T = x.shape[0] // TILE_CHAINS
    page_n = x.shape[1]
    y = x.reshape(T, 32, 8, page_n // 4, 4)
    return jnp.transpose(y, (0, 3, 2, 1, 4)).reshape(T, page_n // 4, 8, 128)


def _chains_cols(x):
    """(n_tiles, B, 8, 32) -> (chains, B)."""
    T = x.shape[0]
    return jnp.transpose(x, (0, 3, 2, 1)).reshape(T * TILE_CHAINS, -1)


def _dense_quad_dev(vals):
    """(chains,) or (chains, cols) -> (tiles, [cols,] 8, 128) int32."""
    if vals.ndim == 1:
        t = vals.reshape(-1, 32, 8).transpose(0, 2, 1)
        return jnp.repeat(t, 4, axis=2).astype(jnp.int32)
    T = vals.shape[0] // TILE_CHAINS
    t = vals.reshape(T, 32, 8, -1).transpose(0, 3, 2, 1)  # (T, cols, 8, 32)
    return jnp.repeat(t, 4, axis=3).astype(jnp.int32)


def _run_launch_device(schema: EncSchema, latlo, lathi, tables, bodyn, states0, tbl_ids):
    """EB -> section-length reduces -> cursor inits -> EC. All on device."""
    eb_out = _eb_call(schema, latlo, lathi, tables, bodyn, states0, tbl_ids)
    p1 = eb_out[0]
    offlo = eb_out[1] if schema.has_off else None
    offhi = eb_out[2] if schema.off64 else None
    final_states = eb_out[-1]

    T, R = p1.shape[0], schema.rounds
    B = schema.n_batches
    bits = _srl(p1, 15) & 15
    ob = _srl(p1, 19) & 127
    blk = bits.reshape(T, B, RPB, 8, 32, 4)
    ans_len = _chains_cols(jnp.sum(blk, axis=(2, 5), dtype=jnp.int32))  # (chains, B)
    oblk = ob.reshape(T, B, RPB, 8, 32, 4)
    off_len = _chains_cols(jnp.sum(oblk, axis=(2, 5), dtype=jnp.int32))

    total = ans_len + off_len
    start = jnp.cumsum(total, axis=1) - total  # (chains, B)
    a_s = start
    o_s = start + ans_len
    curs_cols = jnp.stack([a_s, o_s], axis=2).reshape(a_s.shape[0], 2 * B)
    curs = _dense_quad_dev(curs_cols)

    sections = _ec_call(schema, curs, p1, offlo, offhi)
    total_bits = start[:, -1] + total[:, -1]  # (chains,)
    return sections, final_states, ans_len, off_len, total_bits



def _run_launch_eb(schema: EncSchema, latlo, lathi, tables, bodyn, states0,
                   tbl_ids):
    """EB + per-batch section-length reduces, WITHOUT cursors/EC. The
    multi-latent-var file-image assembler (ops/assemble.py) computes JOINT
    cursors across all of a chunk's vars from these lengths, then packs
    each var with _run_launch_ec — the interleaved page body the reference
    writes per batch per var (wrapped/chunk_compressor.rs:657-693)."""
    eb_out = _eb_call(schema, latlo, lathi, tables, bodyn, states0, tbl_ids)
    p1 = eb_out[0]
    offlo = eb_out[1] if schema.has_off else None
    offhi = eb_out[2] if schema.off64 else None
    final_states = eb_out[-1]
    T = p1.shape[0]
    B = schema.n_batches
    bits = _srl(p1, 15) & 15
    ob = _srl(p1, 19) & 127
    blk = bits.reshape(T, B, RPB, 8, 32, 4)
    ans_len = _chains_cols(jnp.sum(blk, axis=(2, 5), dtype=jnp.int32))
    oblk = ob.reshape(T, B, RPB, 8, 32, 4)
    off_len = _chains_cols(jnp.sum(oblk, axis=(2, 5), dtype=jnp.int32))
    outs = [p1, final_states, ans_len, off_len]
    if offlo is not None:
        outs.append(offlo)
    if offhi is not None:
        outs.append(offhi)
    return tuple(outs)


def _run_launch_ec(schema: EncSchema, curs_cols, p1, offlo=None, offhi=None):
    """EC with caller-supplied per-batch bit cursors (chains, 2B): even
    columns = ANS section start, odd = offset section start, both relative
    to the page's section stream. schema.sec_words must cover the JOINT
    stream width when vars interleave."""
    curs = _dense_quad_dev(curs_cols)
    return _ec_call(schema, curs, p1, offlo, offhi)


def _shardify_launch(mesh, schema, dev_args):
    """Wrap one launch as a shard_map over the tile axis (SURVEY §5 encode
    scale-out): every device runs the EB/EC kernels on its own tile shard;
    chunk tables (KB-scale) replicate; per-shard sections/lengths gather
    back sharded. Returns (jitted runner, trim) where trim restores the
    unpadded tile count."""
    import jax

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is not None:
        shard_map = partial(shard_map, check_vma=False)
    else:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = partial(_sm, check_rep=False)
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    latlo, lathi, tables, bodyn, states0, tbl_ids = dev_args
    T = latlo.shape[0]
    pad = (-T) % nd

    def padt(a):
        # replicate the last tile: always-valid rows whose outputs are
        # trimmed (zero-padding would feed tbl_id 0 with foreign states)
        if pad == 0:
            return a
        return jnp.concatenate([a] + [a[-1:]] * pad, axis=0)

    dev_args = (padt(latlo), padt(lathi), tables, padt(bodyn),
                padt(states0), padt(tbl_ids))

    sharded = P(axis)
    step = shard_map(
        partial(_run_launch_device, schema),
        mesh=mesh,
        in_specs=(sharded, sharded, P(), sharded, sharded, sharded),
        out_specs=(sharded, sharded, sharded, sharded, sharded),
    )

    def trim(outs):
        sections, fstates, ans_len, off_len, total_bits = outs
        C = T * TILE_CHAINS
        return (sections[:T], fstates[:T], ans_len[:C], off_len[:C],
                total_bits[:C])

    return jax.jit(step), dev_args, trim


_ROWS_JIT_CACHE = {}


def _rows_to_planes(slices, srcs):
    """Jitted (cached per static slice layout) device-row assembly: slice
    each job's page rows out of its source array, zero the junk fronts'
    tail columns, concatenate, and split into the EB kernels' round-layout
    lo/hi planes. Replaces a per-chunk chain of eager jnp ops (~0.1 s of
    1-core dispatch overhead per 64M encode)."""
    key = slices
    fn = _ROWS_JIT_CACHE.get(key)
    if fn is None:
        if len(_ROWS_JIT_CACHE) > 16:
            _ROWS_JIT_CACHE.clear()

        @jax.jit
        def fn(*srcs):
            parts = []
            for si, rs, nr, o in slices:
                rows = srcs[si][rs:rs + nr]
                body = rows[:, o:]
                parts.append(
                    jnp.pad(body, ((0, 0), (0, o))) if o else body)
            lat_dev = (jnp.concatenate(parts, axis=0)
                       if len(parts) > 1 else parts[0])
            latlo = _to_round_layout(
                jax.lax.bitcast_convert_type(
                    lat_dev.astype(jnp.uint32), jnp.int32))
            lathi = _to_round_layout(
                jax.lax.bitcast_convert_type(
                    (lat_dev >> jnp.uint64(32)).astype(jnp.uint32),
                    jnp.int32))
            return latlo, lathi

        _ROWS_JIT_CACHE[key] = fn
    return fn(*srcs)


def _build_launch_args(groups, dev_rows=None):
    """Build per-launch (schema, jobs, dev_args) WITHOUT running the
    kernels. Mutates each job with chain_start / n_pages bookkeeping (the
    chain order within a launch is the jobs' iteration order). Shared by
    _build_and_run_launches (run + fetch) and the device file-image
    assembler (ops/assemble.py), which keeps the outputs on device."""
    built = []
    for key, jobs in groups.items():
        pg, ob_class, sec_words = key
        ts_pad = max(128, 1 << int(np.ceil(np.log2(max(j["tables"][4] for j in jobs)))))
        b_pad = max(128, 1 << int(np.ceil(np.log2(max(j["b"] for j in jobs)))))
        schema = EncSchema(page_n=pg, ts=ts_pad, b_pad=b_pad,
                           max_ob=max(j["max_ob"] for j in jobs) if ob_class else 0,
                           sec_words=sec_words)
        n_tables = len(jobs)
        width = max(ts_pad, b_pad)
        # one sublane row per table on the host; the 8x sublane replication
        # the EB kernel's VMEM layout wants happens device-side (the upload
        # would otherwise be 8x bigger — ~10 MB at 64M on a MB/s tunnel)
        # int32 directly: every field fits (nexts < 2*ts <= 2^15, t1 <
        # 2^26, t2 in [-ts, ts], lowers split lo32/hi32) and the int64 ->
        # astype(int32) detour costs ~0.05 s of 1-core memcpy at 64M
        tables = np.zeros((n_tables, 5, 1, width), dtype=np.int32)
        chain_runs = []
        tbl_ids = []
        lat_rows = []
        dev_slices = []
        dev_srcs = []
        bodyn_rows = []
        states0_rows = []
        for tid, j in enumerate(jobs):
            nexts, lowers, t1, t2, ts = j["tables"]
            b = j["b"]
            tables[tid, 0, :, :ts] = nexts.astype(np.int32)[None, :]
            # pad bins with copies of the last real bin (never mis-selects)
            lo = np.full(b_pad, lowers[-1], dtype=np.uint64)
            lo[:b] = lowers
            t1p = np.full(b_pad, t1[-1], dtype=np.int64)
            t1p[:b] = t1
            t2p = np.full(b_pad, t2[-1], dtype=np.int64)
            t2p[:b] = t2
            tables[tid, 1, :, :b_pad] = (
                (lo & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                .view(np.int32)[None, :])
            tables[tid, 2, :, :b_pad] = (
                (lo >> np.uint64(32)).astype(np.uint32)
                .view(np.int32)[None, :])
            tables[tid, 3, :, :b_pad] = t1p.astype(np.int32)[None, :]
            tables[tid, 4, :, :b_pad] = t2p.astype(np.int32)[None, :]
            cc = j["cc"]
            var = j.get("var", "primary")
            lvc = cc.lvcs.get(var)
            n_pages = len(cc.page_infos)
            n_pad = (-n_pages) % TILE_CHAINS
            bn = np.zeros(n_pages + n_pad, dtype=np.int64)
            if "dev" in j:
                d = j["dev"]
                o = d["order"]
                src = d.get("src")
                src = dev_rows if src is None else src
                si = next(
                    (k for k, s_ in enumerate(dev_srcs) if s_ is src), None)
                if si is None:
                    si = len(dev_srcs)
                    dev_srcs.append(src)
                dev_slices.append(
                    (si, int(d["row_start"]), n_pages + n_pad, int(o)))
                lat_rows.append(None)  # assembled jitted below
                sc_fn = getattr(cc.page_infos, "stored_counts", None)
                if sc_fn is not None:
                    # vectorized: building one PageInfo object per page
                    # costs ~0.1 s per encode at 64M on a 1-core host
                    bn[:n_pages] = sc_fn(var)
                else:
                    for pi, info in enumerate(cc.page_infos):
                        piv = info.per_latent_var.get(var)
                        bn[pi] = piv.end - piv.start
            else:
                lat64 = lvc.latents.astype(np.uint64)
                rows = np.zeros((n_pages + n_pad, pg), dtype=np.uint64)
                for pi, info in enumerate(cc.page_infos):
                    piv = info.per_latent_var.get(var)
                    body = lat64[piv.start : piv.end]
                    rows[pi, : len(body)] = body
                    bn[pi] = len(body)
                lat_rows.append(rows)
            bodyn_rows.append(bn)
            states0_rows.append(np.full(n_pages + n_pad, ts, dtype=np.int64))
            j["chain_start"] = sum(r["n_total"] for r in chain_runs)
            j["n_pages"] = n_pages
            chain_runs.append({"n_total": n_pages + n_pad})
            tbl_ids.extend([tid] * ((n_pages + n_pad) // TILE_CHAINS))

        bodyn_all = np.concatenate(bodyn_rows)
        states0_all = np.concatenate(states0_rows)
        if dev_slices and all(r is None for r in lat_rows):
            latlo, lathi = _rows_to_planes(tuple(dev_slices), dev_srcs)
        elif dev_slices:  # mixed dev/host jobs in one group (not produced
            # by either planner today): eager assembly preserves order
            parts = []
            k = 0
            for r in lat_rows:
                if r is None:
                    si, rs, nr, o = dev_slices[k]
                    k += 1
                    body = dev_srcs[si][rs:rs + nr][:, o:]
                    parts.append(
                        jnp.pad(body, ((0, 0), (0, o))) if o else body)
                else:
                    parts.append(jnp.asarray(r))
            lat_dev = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            latlo = _to_round_layout(
                jax.lax.bitcast_convert_type(lat_dev.astype(jnp.uint32), jnp.int32))
            lathi = _to_round_layout(
                jax.lax.bitcast_convert_type(
                    (lat_dev >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32))
        else:
            lat_all = np.concatenate(lat_rows, axis=0)
            latlo = _to_round_layout(jnp.asarray((lat_all & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)))
            lathi = _to_round_layout(jnp.asarray((lat_all >> np.uint64(32)).astype(np.uint32).view(np.int32)))
        bodyn = _dense_quad_dev(jnp.asarray(bodyn_all))
        states0 = _dense_quad_dev(jnp.asarray(states0_all))

        tables_dev = jnp.broadcast_to(
            jnp.asarray(tables), (n_tables, 5, 8, width))
        dev_args = (latlo, lathi, tables_dev, bodyn,
                    states0, jnp.asarray(np.asarray(tbl_ids, dtype=np.int32)))
        built.append((schema, jobs, dev_args))
    return built


def _build_and_run_launches(groups, jit_cache=None, dev_rows=None,
                            shard_mesh=None):
    """Build device inputs per launch group and run EB+EC. Returns
    {ci: outputs} plus per-launch (schema, device args, jitted fn).

    Jobs from the device-train planner (ops/device_train.py) carry a "dev"
    entry referencing page rows already on the device (dev_rows); those skip
    the host row building and upload entirely. shard_mesh runs every launch
    under shard_map over the tile axis (see _shardify_launch)."""
    results = {}
    launch_handles = []
    for schema, jobs, dev_args in _build_launch_args(groups, dev_rows):
        if shard_mesh is not None:
            run, dev_args, trim = _shardify_launch(shard_mesh, schema, dev_args)
            launch_handles.append((schema, run, dev_args))
            sections, fstates, ans_len, off_len, total_bits = trim(
                run(*dev_args))
        else:
            run = jax.jit(partial(_run_launch_device, schema))
            launch_handles.append((schema, run, dev_args))
            sections, fstates, ans_len, off_len, total_bits = run(*dev_args)

        sec_np = np.asarray(sections)  # (T, 32, 8, SEC)
        fst_np = np.asarray(fstates)  # (T, 8, 128)
        ans_np = np.asarray(ans_len)
        off_np = np.asarray(off_len)
        tb_np = np.asarray(total_bits)
        for j in jobs:
            cs, npg = j["chain_start"], j["n_pages"]
            ts = j["tables"][4]
            idxs = np.arange(cs, cs + npg)
            t_i, g_i, s_i = idxs // 256, (idxs % 256) // 8, idxs % 8
            secs = sec_np[t_i, g_i, s_i]  # (npg, SEC)
            states4 = np.stack(
                [fst_np[t_i, s_i, 4 * g_i + k] for k in range(4)], axis=1)
            results[j.get("rkey", j["ci"])] = {
                "sections": secs,
                "states": states4 - ts,
                "ans_len": ans_np[cs : cs + npg],
                "off_len": off_np[cs : cs + npg],
                "total_bits": tb_np[cs : cs + npg],
            }
    return results, launch_handles


def _plan_encode(nums, config, page_n, chunk_n):
    """Host training + device-launch grouping. Returns
    (nt, chunk_ns, ccs, chunk_jobs, groups)."""
    from pcodec_tpu.codec.chunk_config import ChunkConfig, PagingSpec
    from pcodec_tpu.codec import container as ctn
    from pcodec_tpu.codec.compress import chunk_compressor
    from pcodec_tpu.dtypes import number_type_from_np
    from pcodec_tpu.format.metadata import DeltaEncoding

    if page_n > 1024 or page_n % BATCH != 0:
        raise ValueError("device encoder supports page_n in {256, 512, 1024}")
    config = config or ChunkConfig()
    nt = number_type_from_np(nums.dtype)
    chunk_ns = ctn._exact_split(len(nums), chunk_n)

    # ---- host training per chunk ----
    ccs = []
    start = 0
    for cn in chunk_ns:
        chunk_config = _dc_replace(
            config, paging_spec=PagingSpec.exact_pages(ctn._exact_split(cn, page_n))
        )
        ccs.append(chunk_compressor(nt, nums[start : start + cn], chunk_config))
        start += cn

    # ---- plan device launches ----
    groups = {}
    chunk_jobs = []  # per chunk: ("device", job) | ("host", None)
    for ci, cc in enumerate(ccs):
        meta = cc.meta
        de = meta.delta_encoding
        lvc = cc.lvcs.primary
        single_var = meta.per_latent_var.secondary is None and meta.per_latent_var.delta is None
        dev_ok = (
            single_var
            and de.kind in (DeltaEncoding.NOOP, DeltaEncoding.CONSECUTIVE)
            and len(cc.page_infos) > 0
            and not lvc.is_trivial
        )
        if dev_ok:
            nexts, lowers, t1, t2, ts = build_enc_tables(meta.per_latent_var.primary)
            b = len(lowers)
            max_ob = int(lvc.max_offset_bits)
            worst_bits = float(np.max(meta.per_latent_var.primary.bins.worst_case_bits_per_latent(lvc.ans_size_log))) if b else 0.0
            sec_words = int(-(-int(page_n * (worst_bits + 1) + 64) // 32 // 128) * 128)
            # sec_words cap: low-ratio 64-bit chunks (worst bits ~78) need
            # ~2528 words; the EC out block costs 1 KB/word so >2048 gets
            # an explicit VMEM budget in _ec_call
            dev_ok = ts <= 4096 and b <= 2048 and sec_words <= 3072
        if not dev_ok:
            chunk_jobs.append(("host", None))
            continue
        ob_class = 0 if max_ob == 0 else (32 if max_ob <= 32 else 64)
        key = (page_n, ob_class, max(sec_words, 128))
        job = {
            "ci": ci, "cc": cc, "tables": (nexts, lowers, t1, t2, ts),
            "b": b, "max_ob": max_ob,
        }
        groups.setdefault(key, []).append(job)
        chunk_jobs.append(("device", job))

    return nt, chunk_ns, ccs, chunk_jobs, groups


def encode_container_device(nums, config=None, page_n: int = 1024,
                            chunk_n: int = 1 << 20, shard_mesh=None):
    """Container encode with device dissection + bit packing.

    Host: mode/delta selection, latent split + delta (numpy), bin training
    (DP + weight quantization), metadata. Device (Pallas): binning, reverse
    interleaved-tANS walk, bit packing. Produces bytes identical to
    codec.container.container_compress for device-handled chunks.

    Returns (data: bytes, stats: dict). Chunks the device path does not
    cover (multi-latent-var modes, lookback/conv1 delta) go through the host
    page writer.
    """
    import struct as _struct

    from pcodec_tpu.codec.chunk_config import ChunkConfig, PagingSpec
    from pcodec_tpu.codec import container as ctn
    from pcodec_tpu.codec.compress import chunk_compressor
    from pcodec_tpu.codec.wrapped import FileCompressor
    from pcodec_tpu.dtypes import number_type_from_np
    from pcodec_tpu.format.bitio import BitWriter
    from pcodec_tpu.format.metadata import DeltaEncoding, PageLatentVarMeta, PageMeta, PerLatentVar
    from pcodec_tpu.utils import concat

    from pcodec_tpu.ops.device_train import plan_encode_device

    dev_rows = None
    planned = plan_encode_device(nums, config, page_n, chunk_n)
    if planned is not None:
        nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
    else:
        nt, chunk_ns, ccs, chunk_jobs, groups = _plan_encode(nums, config, page_n, chunk_n)

    # ---- build + run launches ----
    results, _ = _build_and_run_launches(groups, dev_rows=dev_rows,
                                         shard_mesh=shard_mesh)

    # ---- assemble the container file (host) ----
    fc = FileCompressor()
    body = BitWriter()
    fc.write_header(body)
    chunk_meta_bytes = []
    page_bytes = []
    ans_secs = []
    off_secs = []
    for ci, cc in enumerate(ccs):
        b0 = body.byte_len()
        cc.write_meta(body)
        chunk_meta_bytes.append(body.byte_len() - b0)
        kind, job = chunk_jobs[ci]
        if kind == "host":
            for pi in range(len(cc.n_per_page())):
                p0 = body.byte_len()
                sections = []
                cc.write_page(pi, body, sections_out=sections)
                page_bytes.append(body.byte_len() - p0)
                for a, o in sections:
                    ans_secs.append(a)
                    off_secs.append(o)
            continue
        jlist = job if isinstance(job, list) else [job]
        res_by_var = {j.get("var", "primary"): results[j.get("rkey", ci)]
                      for j in jlist}
        var_keys = [k for k, _ in cc.lvcs.enumerated()]
        if var_keys == ["primary"]:
            res = res_by_var["primary"]
            lvc = cc.lvcs.primary
            for pi, info in enumerate(cc.page_infos):
                p0 = body.byte_len()
                piv = info.per_latent_var.primary
                pm = PageMeta(PerLatentVar(
                    None,
                    PageLatentVarMeta(piv.delta_state, tuple(int(x) for x in res["states"][pi])),
                    None,
                ))
                pm.write_to(PerLatentVar(None, lvc.ans_size_log, None), body)
                nbytes = (int(res["total_bits"][pi]) + 7) // 8
                sec_bytes = res["sections"][pi].view(np.uint8)[:nbytes]
                body.write_aligned_bytes(sec_bytes.tobytes())
                page_bytes.append(body.byte_len() - p0)
                n_batches = -(-info.page_n // BATCH)
                ans_secs.append(res["ans_len"][pi, :n_batches].astype(np.int64))
                off_secs.append(res["off_len"][pi, :n_batches].astype(np.int64))
            continue
        # multi-latent-var (IntMult): per batch, per var, [ans][off] — the
        # per-var kernel streams are bit-interleaved by the native routine
        # (ref page body order: the write_page loop, codec/compress.py:403-421).
        # Vars without a kernel job are trivial: zero body bits, zero-filled
        # directory sections, 0-bit ANS state idxs.
        from pcodec_tpu.native.kernels import interleave_sections

        asl_pv = PerLatentVar()
        for key in var_keys:
            asl_pv.set(key, cc.lvcs.get(key).ans_size_log)
        empty_u8 = np.zeros(8, np.uint8)
        for pi, info in enumerate(cc.page_infos):
            p0 = body.byte_len()
            n_batches = -(-info.page_n // BATCH)
            pv = PerLatentVar()
            srcs, lens_rows = [], []
            tb = 0
            for key in var_keys:
                piv = info.per_latent_var.get(key)
                res = res_by_var.get(key)
                if res is None:
                    pv.set(key, PageLatentVarMeta(piv.delta_state, (0, 0, 0, 0)))
                    srcs.append(empty_u8)
                    zl = np.zeros(n_batches, np.int64)
                    lens_rows.append(np.stack([zl, zl]))
                    ans_secs.append(zl)
                    off_secs.append(zl)
                    continue
                pv.set(key, PageLatentVarMeta(
                    piv.delta_state, tuple(int(x) for x in res["states"][pi])))
                srcs.append(res["sections"][pi].view(np.uint8))
                al = res["ans_len"][pi, :n_batches].astype(np.int64)
                ol = res["off_len"][pi, :n_batches].astype(np.int64)
                lens_rows.append(np.stack([al, ol]))
                ans_secs.append(al)
                off_secs.append(ol)
                tb += int(res["total_bits"][pi])
            PageMeta(pv).write_to(asl_pv, body)
            dst = np.zeros((tb + 7) // 8 + 8, np.uint8)
            nbits = interleave_sections(srcs, np.stack(lens_rows), dst, 0)
            body.write_aligned_bytes(dst[: (nbits + 7) // 8].tobytes())
            page_bytes.append(body.byte_len() - p0)

    body_bytes = body.to_bytes()
    dir_parts = [
        np.asarray(chunk_ns, dtype=np.uint32).tobytes(),
        np.asarray(chunk_meta_bytes, dtype=np.uint32).tobytes(),
        np.asarray(page_bytes, dtype=np.uint32).tobytes(),
        (concat(ans_secs).astype(np.uint16) if ans_secs else np.zeros(0, np.uint16)).tobytes(),
        (concat(off_secs).astype(np.uint16) if off_secs else np.zeros(0, np.uint16)).tobytes(),
    ]
    directory = b"".join(dir_parts)
    header = _struct.pack(
        ctn.HEADER_FMT, ctn.MAGIC, nt.type_byte, 1, 0, page_n, len(nums),
        len(chunk_ns), len(directory),
    )
    n_dev = sum(1 for k, _ in chunk_jobs if k == "device")
    return header + directory + body_bytes, {"device_chunks": n_dev, "chunks": len(ccs)}
