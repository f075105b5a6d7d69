"""Experiment: VMEM-resident Pallas bitonic sort for (rows, m) u32.

The encode pipeline's sorts run at ~14 M keys/s via lax.sort (and a
pure-jnp network is no better — every stage round-trips HBM, see
bitonic_jnp.py). This kernel keeps an (8, m) row block in VMEM across all
p(p+1)/2 comparator stages: one HBM read + one write total.

XOR-network formulation, ascending: for k = 2,4..m; j = k/2..1 (halving):
element i compares with i^j; direction up iff (i & k) == 0 (for the final
k = m every block sorts ascending). Partners are reached with two lane
rolls (+j / -j); u32 order is preserved in int32 by flipping the sign bit
at load/store.

Usage: python experiments/pallas_bitonic.py [m_log] — CPU interpret checks
tiny shapes; on TPU it benches (96, 65536) + (32, 2^21) vs lax.sort.
"""
import os
import sys
import time
from functools import partial

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".cache", "jax"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


def _sort_kernel(m, x_ref, o_ref):
    with jax.enable_x64(False):
        x = x_ref[...]  # (8, m) int32, sign-flipped u32 (order-preserving)
        ii = jax.lax.broadcasted_iota(jnp.int32, (8, m), 1)
        k = 2
        while k <= m:
            j = k // 2
            while j >= 1:
                r1 = pltpu.roll(x, m - j, axis=1)   # partner for bit_j set
                r2 = pltpu.roll(x, j, axis=1)       # partner for bit_j clear
                bit_clear = (ii & j) == 0
                # roll(x, s)[i] = x[i-s]: r1 holds x[i+j] (partner when
                # bit_j clear), r2 holds x[i-j] (partner when bit_j set)
                partner = jnp.where(bit_clear, r1, r2)
                up = (ii & k) == 0
                lo = jnp.minimum(x, partner)
                hi = jnp.maximum(x, partner)
                keep_lo = bit_clear == up  # lo at the smaller index when up
                x = jnp.where(keep_lo, lo, hi)
                j //= 2
            k *= 2
        o_ref[...] = x


def sort_rows_u32(x):
    """Ascending sort along axis 1. x: (rows, m) uint32, m a power of 2,
    rows a multiple of 8."""
    rows, m = x.shape
    xi = jax.lax.bitcast_convert_type(
        x ^ jnp.uint32(0x80000000), jnp.int32)
    out = pl.pallas_call(
        partial(_sort_kernel, m),
        grid=(rows // 8,),
        in_specs=[pl.BlockSpec((8, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, m), jnp.int32),
        interpret=_interpret(),
    )(xi)
    return jax.lax.bitcast_convert_type(out, jnp.uint32) ^ jnp.uint32(
        0x80000000)


def _check(rows, m, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 1 << 32, (rows, m), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(jax.jit(sort_rows_u32)(jnp.asarray(x)))
    want = np.sort(x, axis=1)
    ok = np.array_equal(got, want)
    print(f"check rows={rows} m={m}: {'OK' if ok else 'MISMATCH'}",
          flush=True)
    return ok


def main():
    print("device:", jax.devices(), "interpret:", _interpret(), flush=True)
    assert _check(8, 256)
    assert _check(16, 1024)
    if _interpret():
        return
    for rows, m in ((96, 1 << 16), (32, 1 << 21)):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 1 << 32, (rows, m), dtype=np.uint64).astype(
            np.uint32)
        xd = jnp.asarray(x)
        f = jax.jit(sort_rows_u32)
        got = np.asarray(f(xd))
        assert np.array_equal(got, np.sort(x, axis=1)), "device mismatch!"
        csum = jax.jit(lambda v: v[:, ::257].astype(jnp.uint32).sum().reshape(1))
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(csum(f(xd))[0])
            best = min(best, time.perf_counter() - t0)
        print(f"pallas bitonic ({rows}, {m}): {best*1e3:7.1f} ms", flush=True)
        g = jax.jit(lambda v: jax.lax.sort(v, dimension=1, is_stable=False))
        int(csum(g(xd))[0])
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(csum(g(xd))[0])
            best = min(best, time.perf_counter() - t0)
        print(f"lax.sort       ({rows}, {m}): {best*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
