"""Experiment: pure-jnp bitonic sorting network vs lax.sort on TPU.

The encode pipeline's sorts (stage-1 candidate samples ~(96, 41k); phase-2
full-array (32, 2M)) cost 0.15-0.2 s each via lax.sort. A bitonic network
is dense reshapes + min/max (no gathers, no variadic-sort machinery) —
this measures whether hand-rolling it beats XLA's built-in sort for
values-only u32/u64 sorts.

Usage: python experiments/bitonic_jnp.py
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".cache", "jax"))

import jax
import jax.numpy as jnp


def bitonic_sort(x):
    """Ascending bitonic sort along the last axis (power-of-2 length).

    Classic network: for k in 2,4,..,m (run length), first a 'flip'
    compare at distance k/2 (compares mirrored pairs, which turns two
    sorted-k/2 runs into a bitonic-k run then a descending cleanup), then
    'shuffle' compare-exchanges at strides k/4..1.
    """
    rows, m = x.shape
    assert m & (m - 1) == 0
    k = 2
    while k <= m:
        # flip stage: compare element j with element (k-1-j) within blocks
        y = x.reshape(rows, m // k, k)
        a = y[:, :, : k // 2]
        b = y[:, :, k // 2 :][:, :, ::-1]
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        x = jnp.concatenate([lo, hi[:, :, ::-1]], axis=2).reshape(rows, m)
        j = k // 4
        while j >= 1:
            y = x.reshape(rows, m // (2 * j), 2, j)
            a = y[:, :, 0]
            b = y[:, :, 1]
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            x = jnp.stack([lo, hi], axis=2).reshape(rows, m)
            j //= 2
        k *= 2
    return x


def bench(label, fn, x, iters=3):
    f = jax.jit(fn)
    r = f(x)
    s = int(jax.jit(lambda a: a[:, ::257].astype(jnp.uint32).sum().reshape(1))(r)[0])
    best = 9e9
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(x)
        int(jax.jit(lambda a: a[:, ::257].astype(jnp.uint32).sum().reshape(1))(r)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:7.1f} ms (check {s & 0xffff})", flush=True)
    return r


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices(), flush=True)

    for label, shape, dtype in (
        ("samples u64 (96, 65536)", (96, 1 << 16), np.uint64),
        ("samples u32 (96, 65536)", (96, 1 << 16), np.uint32),
        ("full u32 (32, 2^21)", (32, 1 << 21), np.uint32),
        ("full u64 (32, 2^21)", (32, 1 << 21), np.uint64),
    ):
        x = rng.integers(0, 1 << 31, shape).astype(dtype)
        xd = jnp.asarray(x)
        a = bench(f"lax.sort   {label}",
                  lambda v: jax.lax.sort(v, dimension=1, is_stable=False), xd)
        b = bench(f"bitonic    {label}", bitonic_sort, xd)
        ok = bool(jax.jit(lambda p, q: jnp.array_equal(p, q).reshape(1))(a, b)[0])
        print(f"  equal: {ok}", flush=True)
        assert ok


if __name__ == "__main__":
    main()
