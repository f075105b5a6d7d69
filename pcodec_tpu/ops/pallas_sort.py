"""VMEM-resident Pallas bitonic row sort (u32 keys).

Why: the encoder's stage-1 delta-candidate histograms sort ~(n_cand *
n_chunks, sample_len) rows. XLA's lax.sort runs its comparator network
through HBM — experiments/bitonic_jnp.py measured a pure-jnp bitonic EQUAL
to lax.sort at sample shapes and worse at big shapes precisely because
every stage round-trips HBM. This kernel keeps each row in VMEM for the
whole O(log^2 m) network, so the ~136 compare-exchange steps at m=65536
touch HBM exactly twice (load + store).

Semantics: ascending full sort of each row independently — identical
VALUES to lax.sort (a sorted multiset is unique), which is all the
encoder's quantile walk consumes (see device_train._extracts_and_walk).
Rows are padded to a power of two with 0xFFFFFFFF by the wrapper; the
caller's own pads are already 0xFFFFFFFF-sorted-last by construction.

Layout: each grid step owns one row viewed as (S, 128) — element index
i = s*128 + lane. A compare-exchange at XOR-distance j is two circular
rolls + a select: for single-bit j, i^j == i±j with no carry, so
roll(∓j) picks the partner exactly and wrap-around never matters.
Sublane-distance steps (j >= 128, 45 of them at m=65536) are statically
unrolled; the 7-or-fewer lane-distance steps of each stage run in a
fori_loop with a DYNAMIC lane roll (the stitch kernel proves dynamic
lane rolls lower fine) to keep the Mosaic program small — a fully
unrolled network at 8 rows/block measured as a never-finishing remote
compile. Unsigned order comes from biasing the int32 bit pattern by
0x80000000 once at load and using signed min/max.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_M = 1 << 16    # VMEM bound per row buffer (256 KB as u32)


def _interpret():
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _sort_kernel(m_pad, x_ref, o_ref):
    with jax.enable_x64(False):
        x = x_ref[0] ^ jnp.int32(-0x80000000)  # unsigned -> signed order
        S = x.shape[0]
        l_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        s_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)

        def cmpx(x, px, upper, desc):
            want_max = upper ^ desc
            return jnp.where(want_max, jnp.maximum(x, px),
                             jnp.minimum(x, px))

        def sub_step(x, m, desc):
            down = pltpu.roll(x, (S - m) % S, axis=0)
            up = pltpu.roll(x, m, axis=0)
            upper = (s_iota & m) != 0
            return cmpx(x, jnp.where(upper, up, down), upper, desc)

        def lane_steps(x, j_hi, desc):
            def body(t, x):
                j = j_hi >> t
                down = pltpu.roll(x, (jnp.int32(128) - j) & 127, axis=1)
                up = pltpu.roll(x, j, axis=1)
                upper = (l_iota & j) != 0
                return cmpx(x, jnp.where(upper, up, down), upper, desc)
            return jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(j_hi.bit_length()), body, x)

        k = 2
        while k <= m_pad:
            if k == m_pad:
                desc = jnp.zeros(x.shape, jnp.bool_)
            elif k >= 128:
                desc = (s_iota & (k // 128)) != 0
            else:
                desc = (l_iota & k) != 0
            j = k // 2
            while j >= 128:
                x = sub_step(x, j // 128, desc)
                j //= 2
            if j >= 1:
                x = lane_steps(x, j, desc)
            k *= 2
        o_ref[0] = x ^ jnp.int32(-0x80000000)


def sort_rows_u32(x):
    """Ascending per-row sort of a (rows, m) uint32 array. Returns the
    sorted (rows, m) uint32 array (value-identical to lax.sort)."""
    rows, m = x.shape
    m_pad = max(256, 1 << int(np.ceil(np.log2(max(m, 1)))))
    assert m_pad <= MAX_M, (m, m_pad)
    xi = jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.int32)
    if m_pad != m:
        xi = jnp.concatenate(
            [xi, jnp.full((rows, m_pad - m), -1, jnp.int32)], axis=1)
    S = m_pad // 128
    xi = xi.reshape(rows, S, 128)

    out = pl.pallas_call(
        partial(_sort_kernel, m_pad),
        out_shape=jax.ShapeDtypeStruct(xi.shape, jnp.int32),
        grid=(rows,),
        in_specs=[pl.BlockSpec(
            (1, S, 128),
            lambda i: (i, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, S, 128),
            lambda i: (i, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xi)
    return jax.lax.bitcast_convert_type(out.reshape(rows, m_pad)[:, :m],
                                        jnp.uint32)
