"""Micro-profile of encode stage-1 device components on real TPU.

Synthetic shapes matched to the 64M-taxi bench (64 chunks of 1M, sample
sizes ~n/50): times each fused-stage-1 ingredient separately (warm
best-of-3, forced by tiny fetches) to locate the device time inside the
"stage1 fetch" wait.
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".cache", "jax"))

N = 64 * 1024 * 1024
N_CHUNKS = 64
M = 20736  # per-chunk sample size (~n/50 per chunk, 1M/50 rounded)


def bench(label, fn, *args):
    import jax

    out = fn(*args)  # compile
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(1234)
    incs = rng.integers(0, 120, N)
    jumps = rng.random(N) < 0.001
    incs = incs + jumps * rng.integers(0, 10**6, N)
    nums = np.cumsum(incs).astype(np.int64)

    import jax
    import jax.numpy as jnp
    from functools import partial
    from pcodec_tpu.ops import device_train as dt

    print("device:", jax.devices(), flush=True)
    nums_dev = jnp.asarray(nums)
    int(jnp.sum(nums_dev, dtype=jnp.int64)[None][0])

    total = N_CHUNKS * M
    mode_idx = jnp.asarray(
        rng.integers(0, N, total).astype(np.int32).reshape(-1))
    delta_idx = mode_idx
    starts = jnp.asarray((np.arange(N_CHUNKS) * M).astype(np.int32))
    lens = jnp.asarray(np.full(N_CHUNKS, M, np.int32))

    total_rows = (N + 1023) // 1024
    lat_fn = jax.jit(partial(
        dt._phase_latents, kind="signed", mid=1 << 63,
        total_rows=total_rows, page_n=1024))
    lat2d, mode_s, delta_s = bench(
        "latents+gathers (64M + 2x1.3M gathers)", lat_fn,
        nums_dev, mode_idx, delta_idx)

    gcd_fn = jax.jit(partial(
        dt._phase_int_gcd, n_chunks=N_CHUNKS, m_max=M, k=dt._GCD_K))
    bench("int_gcd screening", gcd_fn, mode_s, starts, lens)

    for s32 in (False, True):
        cand_fn = jax.jit(partial(
            dt._phase_delta_candidates, n_chunks=N_CHUNKS, m_max=M,
            max_order=dt.STAGE1_ORDERS, nb_log=8, lat_bits=64,
            window_n_log=4, cands="orders", pack32=True, sort32=s32))
        (d32, base, fits, d64, sf), nbn = bench(
            f"delta candidates sort32={s32}", cand_fn,
            delta_s, starts, lens)

    # pure transfer: distinct buffers the size of the stage-1 packed buf
    # (np.asarray caches per-array, so each fetch needs a fresh array)
    mk = jax.jit(lambda x, k: jnp.tile(x.reshape(-1), 2)[:900_000] + k)
    bufs = [mk(d32.astype(jnp.uint32), jnp.uint32(k)) for k in range(4)]
    np.asarray(bufs[0])
    for b in bufs[1:]:
        t0 = time.perf_counter()
        np.asarray(b)
        print(f"fetch {b.nbytes/1e6:.2f} MB: "
              f"{(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
