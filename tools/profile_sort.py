"""A/B the Pallas VMEM bitonic row sort vs lax.sort on real hardware at the
stage-1 candidate shapes. Timing protocol: checksum fetch forces completion
(block_until_ready does not block through the axon tunnel, NOTES.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".cache", "jax"))

import numpy as np
import jax
import jax.numpy as jnp

from pcodec_tpu.ops import pallas_sort


def timed(f, x, iters=5):
    cs = int(f(x)[0])  # compile + warm
    best = 9e9
    for _ in range(iters):
        t0 = time.perf_counter()
        int(f(x)[0])
        best = min(best, time.perf_counter() - t0)
    return best, cs


def main():
    rng = np.random.default_rng(0)
    shapes = [(96, 42200), (192, 20736), (32, 42200)]
    for rows, m in shapes:
        x = rng.integers(0, 1 << 31, (rows, m), dtype=np.uint32)
        xd = jnp.asarray(x)

        @jax.jit
        def f_pallas(a):
            s = pallas_sort.sort_rows_u32(a)
            return jnp.sum(s[:, ::997].astype(jnp.uint64)).reshape(1)

        @jax.jit
        def f_xla(a):
            s = jax.lax.sort(a, dimension=1, is_stable=False)
            return jnp.sum(s[:, ::997].astype(jnp.uint64)).reshape(1)

        tp, cp = timed(f_pallas, xd)
        tx, cx = timed(f_xla, xd)
        assert cp == cx, (rows, m, cp, cx)
        print(f"({rows:4d},{m:6d}): pallas {tp*1e3:7.2f} ms   "
              f"lax.sort {tx*1e3:7.2f} ms   ({tx/tp:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
