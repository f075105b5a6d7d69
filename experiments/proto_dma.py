"""Prototype: per-chain dynamic-offset DMA HBM->VMEM, double-buffered.

Validates the section-fetch mechanism for the decode kernel:
  - PrefetchScalarGridSpec with word-start offsets in SMEM
  - make_async_copy from an ANY/HBM ref at pl.ds(dynamic_start, LEN)
  - scratch persistence across sequential grid steps (double buffering)
  - per-step issue cost for N_CHAINS copies

Measures ms/tile for DMA-only vs DMA+light compute.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CHAINS = 128
SEC_WORDS = 2048
FETCH_WORDS = SEC_WORDS + 1024


def make_run(n_tiles, heavy_rounds):
    def kernel(starts_ref, raw_ref, out_ref, sec_ref, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def issue(tile_idx, slot):
            for ch in range(N_CHAINS):
                start_al = (starts_ref[tile_idx, ch] >> 10) << 10
                pltpu.make_async_copy(
                    raw_ref.at[pl.ds(pl.multiple_of(start_al, 1024), FETCH_WORDS)],
                    sec_ref.at[slot, ch],
                    sems.at[slot, ch],
                ).start()

        def wait(slot):
            for ch in range(N_CHAINS):
                pltpu.make_async_copy(
                    raw_ref.at[pl.ds(0, FETCH_WORDS)],
                    sec_ref.at[slot, ch],
                    sems.at[slot, ch],
                ).wait()

        @pl.when(i == 0)
        def _():
            issue(0, 0)

        @pl.when(i + 1 < n)
        def _():
            issue(i + 1, (i + 1) % 2)

        wait(i % 2)
        slot = i % 2

        # light compute: checksum each section (forces the data to be read)
        acc = jnp.zeros((8, 128), jnp.int32)
        for g in range(N_CHAINS // 8):
            block = sec_ref[slot, g * 8:(g + 1) * 8, :SEC_WORDS]
            red = jnp.sum(block.reshape(8, SEC_WORDS // 128, 128), axis=1)
            acc = acc + red

        def body(r, a):
            return a + jnp.take_along_axis(acc, a & 127, axis=1)

        acc = jax.lax.fori_loop(0, heavy_rounds, body, acc)
        out_ref[0] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, starts: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, N_CHAINS, FETCH_WORDS), jnp.int32),
            pltpu.SemaphoreType.DMA((2, N_CHAINS)),
        ],
    )

    @jax.jit
    def run(starts, raw):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),
            grid_spec=grid_spec,
        )(starts, raw)

    return run


def bench(n_tiles, heavy_rounds):
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 2**31, 32 * 1024 * 1024 // 4, np.int32))
    starts = jnp.asarray(
        rng.integers(0, raw.shape[0] - FETCH_WORDS - 1024, (n_tiles, N_CHAINS), np.int32))
    run = make_run(n_tiles, heavy_rounds)
    out = run(starts, raw)
    _ = float(out[0, 0, 0])
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(starts, raw)
        _ = float(out[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    mb = n_tiles * N_CHAINS * FETCH_WORDS * 4 / 1e6
    print(f"tiles={n_tiles:4d} heavy={heavy_rounds:4d}: {best*1e3:8.3f} ms "
          f"({best/n_tiles*1e6:7.1f} us/tile, {mb/best/1e3:6.1f} GB/s DMA)")


if __name__ == "__main__":
    bench(16, 0)
    bench(64, 0)
    bench(256, 0)
    bench(64, 512)
    bench(256, 512)
