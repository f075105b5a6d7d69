"""Prototype: section realign kernel.

raw words (rows of 128) -> sections in group-row layout:
  out[g, t, s, :] = 128 words of chain (g, s) starting at its aligned block.

Each chain's fetch = 3 aligned 1024-word blocks (24 rows) selected by a
scalar-prefetched block index; the kernel transposes rows across chains with
static sublane rolls so the decode kernel can read (8,128) subtables per
group directly.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FETCH_BLOCKS = 3          # 1024-word aligned blocks per chain
FETCH_ROWS = FETCH_BLOCKS * 8


def make_run(n_groups):
    def kernel(st_ref, *refs):
        in_refs = refs[:24]
        out_ref = refs[24]
        subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        for t in range(FETCH_ROWS):
            j, r = t >> 3, t & 7
            acc = jnp.zeros((8, 128), jnp.int32)
            for s in range(8):
                blk = in_refs[s * FETCH_BLOCKS + j][:]
                contrib = pltpu.roll(blk, (s - r) % 8, axis=0)
                acc = jnp.where(subl == s, contrib, acc)
            out_ref[0, t] = acc

    in_specs = []
    for s in range(8):
        for j in range(FETCH_BLOCKS):
            in_specs.append(
                pl.BlockSpec(
                    (8, 128),
                    (lambda i, st, s=s, j=j: (st[i * 8 + s] + j, 0)),
                    memory_space=pltpu.VMEM,
                )
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, FETCH_ROWS, 8, 128), lambda i, st: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    @jax.jit
    def run(starts_blk, raw2d):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_groups, FETCH_ROWS, 8, 128), jnp.int32),
            grid_spec=grid_spec,
        )(starts_blk, *([raw2d] * 24))

    return run


def check_and_bench(n_groups):
    rng = np.random.default_rng(0)
    n_rows = 1 << 17  # 64MB
    raw2d = rng.integers(0, 2**31, (n_rows, 128), dtype=np.int32)
    n_chains = n_groups * 8
    starts_blk = rng.integers(0, n_rows // 8 - FETCH_BLOCKS, n_chains, dtype=np.int32)
    run = make_run(n_groups)
    raw_j = jnp.asarray(raw2d)
    st_j = jnp.asarray(starts_blk)
    out = run(st_j, raw_j)
    # correctness spot check
    o = np.asarray(out[:4])
    for g in range(4):
        for s in range(8):
            c = g * 8 + s
            want = raw2d[starts_blk[c] * 8:starts_blk[c] * 8 + FETCH_ROWS]
            got = o[g, :, s, :]
            assert np.array_equal(got, want), (g, s)
    print(f"correctness OK ({n_groups} groups)")
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(st_j, raw_j)
        _ = float(out[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    mb = n_chains * FETCH_ROWS * 128 * 4 / 1e6
    print(f"groups={n_groups:5d}: {best*1e3:8.3f} ms ({mb/best/1e3:6.1f} GB/s realigned)")


if __name__ == "__main__":
    check_and_bench(256)
    check_and_bench(2048)
