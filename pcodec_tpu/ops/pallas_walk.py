"""Pallas kernel for the quantile-histogram walk's sequential scan.

The walk (device_train._walk_bins_device, mirroring the reference
histogram builder histograms.rs:132-206) is a <=2^nb_log-step sequential
scan over tiny per-lane state. As a lax.scan it costs ~0.45 ms PER STEP on
the axon TPU (~115 ms at 256 steps: every iteration of the XLA while loop
issues a handful of small gather/elementwise kernels). Here the whole scan
runs inside one Pallas grid step per 8 lanes: tables live in VMEM, state
lives in vregs, and the per-step work is ~150 vector ops — the scan
becomes microseconds.

Bit-exactness: all arithmetic is integer (positions/counts in i32; the
u64 bin values are only MOVED, as lo/hi i32 word pairs). The single
division (bin_idx = (pos << nb_log) // n) uses an f32 reciprocal followed
by exact integer fix-up steps, so the quotient is exactly floor-division.
Outputs feed the same pack logic as the lax.scan path and are
bit-identical to it (tests/test_device_train_phases.py).

Coverage: nb_log <= 8 (two 128-lane planes per table) and
n < 2^(31 - nb_log); callers fall back to the lax.scan path otherwise.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _walk_kernel(nb, scal_ref, vlo_ref, vhi_ref, l_ref, r_ref,
                 sl1lo_ref, sl1hi_ref, srlo_ref, srhi_ref, out_ref):
    nb_log = int(nb).bit_length() - 1
    with jax.enable_x64(False):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        scal = scal_ref[0]
        n = jnp.broadcast_to(scal[:, 0:1], (8, 128))
        s0lo = jnp.broadcast_to(scal[:, 1:2], (8, 128))
        s0hi = jnp.broadcast_to(scal[:, 2:3], (8, 128))
        slast_lo = jnp.broadcast_to(scal[:, 3:4], (8, 128))
        slast_hi = jnp.broadcast_to(scal[:, 4:5], (8, 128))
        nsafe = jnp.maximum(n, 1)
        inv_n = 1.0 / nsafe.astype(jnp.float32)

        n_planes = max(1, nb // 128)
        tabs = {}
        for name, ref in (("vlo", vlo_ref), ("vhi", vhi_ref),
                          ("l", l_ref), ("r", r_ref),
                          ("sl1lo", sl1lo_ref), ("sl1hi", sl1hi_ref),
                          ("srlo", srlo_ref), ("srhi", srhi_ref)):
            tabs[name] = [ref[0][:, k * 128:(k + 1) * 128]
                          for k in range(n_planes)]

        def gather(name, idx):
            lo = idx & 127
            out = jnp.take_along_axis(tabs[name][0], lo, axis=1)
            for k in range(1, n_planes):
                g = jnp.take_along_axis(tabs[name][k], lo, axis=1)
                out = jnp.where((idx >> 7) == k, g, out)
            return out

        def exact_div(x):
            """floor(x / nsafe) with x in [0, 2^30): f32 estimate + exact
            integer fix-ups."""
            q = (x.astype(jnp.float32) * inv_n).astype(jnp.int32)
            r = x - q * nsafe
            q = jnp.where(r < 0, q - 1, q)
            r = jnp.where(r < 0, r + nsafe, r)
            q = jnp.where(r >= nsafe, q + 1, q)
            r = jnp.where(r >= nsafe, r - nsafe, r)
            q = jnp.where(r < 0, q - 1, q)
            q = jnp.where(r >= nsafe, q + 1, q)
            return q

        def bin_idx(c):
            return exact_div(c << nb_log)

        def c_count(bi):
            return ((bi + 1) * n + nb - 1) >> nb_log

        zero = jnp.zeros((8, 128), jnp.int32)

        def b2i(c):
            # all mask algebra stays in i32 (chained i1 &/| and i1 selects
            # do not lower in Mosaic)
            return jnp.where(c, jnp.int32(1), jnp.int32(0))

        def step(i, carry):
            (pos, cl_lo, cl_hi, inc_c, il_lo, il_hi, iu_lo, iu_hi,
             has_inc, next_avail) = carry
            # done-ness is encoded as pos >= n (the break branch parks pos
            # at n): keeps a bool out of the loop carry, whose layout
            # Mosaic cannot reconcile across iterations
            active = b2i(pos < n)                       # i32 mask

            j = bin_idx(pos)
            tcc = c_count(j)
            ti = tcc - pos
            brk = b2i(ti >= n - pos)

            def apply_inc(cnt, lo_lo, lo_hi, up_lo, up_hi, st):
                ic, ill, ilh, iul, iuh, hi_ = st
                nz = b2i(cnt > 0)
                sel_new = (nz & (1 - hi_)) != 0
                nzb = nz != 0
                ill = jnp.where(sel_new, lo_lo, ill)
                ilh = jnp.where(sel_new, lo_hi, ilh)
                iul = jnp.where(nzb, up_lo, iul)
                iuh = jnp.where(nzb, up_hi, iuh)
                ic = jnp.where(nzb, ic + cnt, ic)
                hi_ = hi_ | nz
                return ic, ill, ilh, iul, iuh, hi_

            ab = active & brk
            # ---- break branch ----
            b_cnt = jnp.where(ab != 0, n - pos, 0)
            b_ic, b_ill, b_ilh, b_iul, b_iuh, b_hi = apply_inc(
                b_cnt, cl_lo, cl_hi, slast_lo, slast_hi,
                (inc_c, il_lo, il_hi, iu_lo, iu_hi, has_inc))
            b_complete = ab & b2i(ti == n - pos) & b_hi
            b_cb = b_complete != 0
            b_next = jnp.where(b_cb, j + 1, next_avail)
            b_hi2 = jnp.where(b_cb, 0, b_hi)

            emitA = b_complete
            eA_c, eA_ll, eA_lh, eA_ul, eA_uh = b_ic, b_ill, b_ilh, b_iul, b_iuh

            # ---- run branch ----
            run = active & (1 - brk)
            runb = run != 0
            jc = jnp.minimum(j, nb - 1)
            tx_lo = gather("vlo", jc)
            tx_hi = gather("vhi", jc)
            lj = gather("l", jc)
            rj = gather("r", jc)
            sl1_lo = gather("sl1lo", jc)
            sl1_hi = gather("sl1hi", jc)
            sr_lo = gather("srlo", jc)
            sr_hi = gather("srhi", jc)
            l = jnp.maximum(lj, pos)
            r_cnt = jnp.where(runb, l - pos, 0)
            r_ic, r_ill, r_ilh, r_iul, r_iuh, r_hi = apply_inc(
                r_cnt, cl_lo, cl_hi, sl1_lo, sl1_hi,
                (inc_c, il_lo, il_hi, iu_lo, iu_hi, has_inc))
            cnt = rj - l
            mid = l + (cnt >> 1)
            end = l + cnt
            bin2 = bin_idx(mid)
            spare_cond = run & b2i(bin2 > next_avail)
            spare = bin2 - 1
            spare_complete = spare_cond & r_hi
            scb = spare_complete != 0
            emitA = emitA | spare_complete
            eA_c = jnp.where(scb, r_ic, eA_c)
            eA_ll = jnp.where(scb, r_ill, eA_ll)
            eA_lh = jnp.where(scb, r_ilh, eA_lh)
            eA_ul = jnp.where(scb, r_iul, eA_ul)
            eA_uh = jnp.where(scb, r_iuh, eA_uh)
            r_next = jnp.where(scb, spare + 1, next_avail)
            r_hi2 = jnp.where(scb, 0, r_hi)
            r_ic2 = jnp.where(scb, 0, r_ic)
            bin2 = jnp.where((spare_cond & (1 - r_hi)) != 0, spare, bin2)
            r_ic3, r_ill3, r_ilh3, r_iul3, r_iuh3, r_hi3 = apply_inc(
                jnp.where(runb, cnt, 0), tx_lo, tx_hi, tx_lo, tx_hi,
                (r_ic2, r_ill, r_ilh, r_iul, r_iuh, r_hi2))
            end_complete = run & b2i(end >= c_count(bin2)) & r_hi3
            ecb = end_complete != 0
            r_next = jnp.where(ecb, bin2 + 1, r_next)
            r_hi4 = jnp.where(ecb, 0, r_hi3)
            r_ic4 = jnp.where(ecb, 0, r_ic3)

            # ---- merge ----
            abb = ab != 0
            new_pos = jnp.where(runb, rj, jnp.where(abb, n, pos))
            new_cl_lo = jnp.where(runb, sr_lo, cl_lo)
            new_cl_hi = jnp.where(runb, sr_hi, cl_hi)
            new_ic = jnp.where(runb, r_ic4, jnp.where(abb, 0, inc_c))
            new_ill = jnp.where(runb, r_ill3, jnp.where(abb, b_ill, il_lo))
            new_ilh = jnp.where(runb, r_ilh3, jnp.where(abb, b_ilh, il_hi))
            new_iul = jnp.where(runb, r_iul3, jnp.where(abb, b_iul, iu_lo))
            new_iuh = jnp.where(runb, r_iuh3, jnp.where(abb, b_iuh, iu_hi))
            new_hi = jnp.where(runb, r_hi4, jnp.where(abb, b_hi2, has_inc))
            new_next = jnp.where(runb, r_next,
                                 jnp.where(abb, b_next, next_avail))

            # ---- emission row: 12 packed lanes ----
            fields = [
                emitA, eA_c, eA_ll, eA_lh, eA_ul, eA_uh,
                end_complete, r_ic3, r_ill3, r_ilh3,
                r_iul3, r_iuh3,
            ]
            row = zero
            for k, f in enumerate(fields):
                row = jnp.where(lane == k, f, row)
            out_ref[0, i] = row

            return (new_pos, new_cl_lo, new_cl_hi, new_ic, new_ill, new_ilh,
                    new_iul, new_iuh, new_hi, new_next)

        # (lane & 0) forces a non-replicated vreg layout on every carry
        # entry: the loop body produces non-replicated values and Mosaic
        # cannot relayout replicated init values at the loop boundary
        zero_nr = lane & 0
        init = (zero_nr, s0lo | zero_nr, s0hi | zero_nr, zero_nr, zero_nr,
                zero_nr, zero_nr, zero_nr, zero_nr, zero_nr)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), step, init)


def walk_emissions(V, L, R, SL1, SR, s0, n, nb_log):
    """Run the walk scan in Pallas. Inputs as in _walk_bins_device
    (lanes, nb) u64 / i64 tables. Returns step-major emission arrays
    (emitA, eAc, eAlo, eAup, emitB, eBc, eBlo, eBup), each (nb, lanes),
    matching the lax.scan's ys exactly."""
    nb = 1 << nb_log
    lanes = V.shape[0]
    g = -(-lanes // 8)
    pad = g * 8 - lanes

    def p8(x, dtype):
        x = x.astype(dtype)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], dtype)], axis=0)
        return x

    def split64(x):
        xu = x.astype(jnp.uint64)
        lo = p8((xu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.uint32)
        hi = p8((xu >> jnp.uint64(32)).astype(jnp.uint32), jnp.uint32)
        return (jax.lax.bitcast_convert_type(lo, jnp.int32),
                jax.lax.bitcast_convert_type(hi, jnp.int32))

    vlo, vhi = split64(V)
    sl1lo, sl1hi = split64(SL1)
    srlo, srhi = split64(SR)
    l_i = p8(L, jnp.int32)
    r_i = p8(R, jnp.int32)

    s0u = s0.astype(jnp.uint64)
    slast = V[:, nb - 1].astype(jnp.uint64)
    scal_cols = [
        p8(n, jnp.int32),
        jax.lax.bitcast_convert_type(
            p8((s0u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.uint32),
            jnp.int32),
        jax.lax.bitcast_convert_type(
            p8((s0u >> jnp.uint64(32)).astype(jnp.uint32), jnp.uint32),
            jnp.int32),
        jax.lax.bitcast_convert_type(
            p8((slast & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
               jnp.uint32), jnp.int32),
        jax.lax.bitcast_convert_type(
            p8((slast >> jnp.uint64(32)).astype(jnp.uint32), jnp.uint32),
            jnp.int32),
    ]
    scal = jnp.stack(scal_cols, axis=1)                       # (g*8, 5)
    scal = jnp.pad(scal, ((0, 0), (0, 128 - scal.shape[1])))

    def tbl(x):
        return x.reshape(g, 8, nb)

    tspec = pl.BlockSpec((1, 8, nb), lambda i: (i, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 8, 128), lambda i: (i, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_walk_kernel, nb),
        grid=(g,),
        in_specs=[sspec] + [tspec] * 8,
        out_specs=pl.BlockSpec(
            (1, nb, 8, 128), lambda i: (i, jnp.int32(0), jnp.int32(0),
                                        jnp.int32(0)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, nb, 8, 128), jnp.int32),
        interpret=_interpret(),
    )(scal.reshape(g, 8, 128), tbl(vlo), tbl(vhi), tbl(l_i), tbl(r_i),
      tbl(sl1lo), tbl(sl1hi), tbl(srlo), tbl(srhi))

    # (g, nb, 8, 128) -> per-field (nb, lanes)
    def field(k, dtype=None):
        f = jnp.transpose(out[:, :, :, k], (1, 0, 2)).reshape(nb, g * 8)
        return f[:, :lanes]

    def u64f(klo, khi):
        lo = jax.lax.bitcast_convert_type(field(klo), jnp.uint32
                                          ).astype(jnp.uint64)
        hi = jax.lax.bitcast_convert_type(field(khi), jnp.uint32
                                          ).astype(jnp.uint64)
        return lo | (hi << jnp.uint64(32))

    emitA = field(0) != 0
    eAc = field(1).astype(jnp.int64)
    eAlo = u64f(2, 3)
    eAup = u64f(4, 5)
    emitB = field(6) != 0
    eBc = field(7).astype(jnp.int64)
    eBlo = u64f(8, 9)
    eBup = u64f(10, 11)
    return emitA, eAc, eAlo, eAup, emitB, eBc, eBlo, eBup
