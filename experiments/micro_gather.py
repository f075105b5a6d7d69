"""Microbenchmark: table-lookup strategies on the real TPU.

Measures lookups/s for the primitives that could back the ANS decode scan:
  1. XLA gather, flat table, int32 idx
  2. XLA take_along_axis (per-row tables)
  3. one-hot matmul (bf16) lookup
  4. Pallas: jnp.take from VMEM table inside a kernel
  5. Pallas: per-sublane dynamic_gather loop (roll/select)

Timing protocol for the axon tunnel: block_until_ready doesn't block, so we
reduce the output to one scalar and fetch it (forces execution).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

# x64 off: Pallas TPU rejects 64-bit types


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32) if out.dtype != jnp.float32 else out))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(out.ravel()[0]) if out.size else 0.0
        best = min(best, time.perf_counter() - t0)
    return best


rng = np.random.default_rng(0)

# ---- scenario sizes: mirror the scan's real shapes ----
T = 2048          # lanes (tasks)
STEPS = 192       # scan steps (proxy; real scan is n_batches*3*64 = 6144)
TS = 1024         # table size per task

print(f"lanes={T}, steps={STEPS}, lookups per run = {T*STEPS*4:,}")

table_flat = jnp.asarray(rng.integers(0, 2**20, T * TS, dtype=np.int32))
idx0 = jnp.asarray(rng.integers(0, TS, (T, 4), dtype=np.int32))
base_off = jnp.asarray((np.arange(T, dtype=np.int32) * TS)[:, None])


@jax.jit
def xla_gather_scan(idx0):
    def step(carry, _):
        idx = carry
        v = table_flat[(idx + base_off).reshape(-1)].reshape(T, 4)
        nidx = (idx + v) & (TS - 1)
        return nidx, jnp.sum(v, dtype=jnp.int32)
    idx, outs = jax.lax.scan(step, idx0, None, length=STEPS)
    return jnp.sum(outs)[None]


dt = timeit(xla_gather_scan, idx0)
n_lookups = T * STEPS * 4
print(f"1. XLA flat gather in scan:    {n_lookups/dt/1e6:8.1f} M lookups/s")

table2d = table_flat.reshape(T, TS)


@jax.jit
def xla_taa_scan(idx0):
    def step(carry, _):
        idx = carry
        v = jnp.take_along_axis(table2d, idx, axis=1)
        nidx = (idx + v) & (TS - 1)
        return nidx, jnp.sum(v, dtype=jnp.int32)
    idx, outs = jax.lax.scan(step, idx0, None, length=STEPS)
    return jnp.sum(outs)[None]


dt = timeit(xla_taa_scan, idx0)
print(f"2. XLA take_along_axis scan:   {n_lookups/dt/1e6:8.1f} M lookups/s")


# one-hot matmul: all T tasks share ONE table here (wrapped-format story);
# shape (T*4, TS) @ (TS, 1)
table_shared = jnp.asarray(rng.integers(0, 2**14, TS, dtype=np.int32)).astype(jnp.float32)


@jax.jit
def onehot_scan(idx0):
    def step(carry, _):
        idx = carry
        oh = jax.nn.one_hot(idx.reshape(-1), TS, dtype=jnp.bfloat16)
        v = jnp.dot(oh, table_shared.astype(jnp.bfloat16)[:, None],
                    preferred_element_type=jnp.float32)
        v = v.reshape(T, 4).astype(jnp.int32)
        nidx = (idx + v) & (TS - 1)
        return nidx, jnp.sum(v, dtype=jnp.int32)
    idx, outs = jax.lax.scan(step, idx0, None, length=STEPS)
    return jnp.sum(outs)[None]


dt = timeit(onehot_scan, idx0)
print(f"3. one-hot bf16 matmul scan:   {n_lookups/dt/1e6:8.1f} M lookups/s")


# ---- Pallas versions ----
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_take_kernel(table_ref, idx_ref, out_ref):
    def step(i, carry):
        idx = carry  # (T, 4) int32
        flat = (idx + jax.lax.broadcasted_iota(jnp.int32, (T, 4), 0) * TS).reshape(-1)
        v = jnp.take(table_ref[:], flat, axis=0).reshape(T, 4)
        return (idx + v) & (TS - 1)
    final = jax.lax.fori_loop(0, STEPS, step, idx_ref[:])
    out_ref[:] = final


@jax.jit
def pallas_take(idx0):
    return pl.pallas_call(
        pallas_take_kernel,
        out_shape=jax.ShapeDtypeStruct((T, 4), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table_flat, idx0)


try:
    dt = timeit(pallas_take, idx0)
    print(f"4. Pallas jnp.take flat:       {n_lookups/dt/1e6:8.1f} M lookups/s")
except Exception as e:
    print(f"4. Pallas jnp.take flat:       FAILED: {type(e).__name__}: {str(e)[:300]}")


def pallas_taa_kernel(table_ref, idx_ref, out_ref):
    def step(i, carry):
        idx = carry
        v = jnp.take_along_axis(table_ref[:], idx, axis=1)
        return (idx + v) & (TS - 1)
    out_ref[:] = jax.lax.fori_loop(0, STEPS, step, idx_ref[:])


@jax.jit
def pallas_taa(idx0):
    return pl.pallas_call(
        pallas_taa_kernel,
        out_shape=jax.ShapeDtypeStruct((T, 4), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table2d, idx0)


try:
    dt = timeit(pallas_taa, idx0)
    print(f"5. Pallas take_along_axis:     {n_lookups/dt/1e6:8.1f} M lookups/s")
except Exception as e:
    print(f"5. Pallas take_along_axis:     FAILED: {type(e).__name__}: {str(e)[:300]}")


# 6. Pallas: shared 128-entry table via lane dynamic_gather semantics
#    idx (T,128) gathering from a (1,128) broadcast table row.
TS_SMALL = 128
tbl_small = jnp.asarray(rng.integers(0, 128, (8, 128), dtype=np.int32))
idx_l = jnp.asarray(rng.integers(0, 128, (8, 128), dtype=np.int32))
LSTEPS = STEPS * 32


def pallas_lane_kernel(table_ref, idx_ref, out_ref):
    tbl = table_ref[:]
    def step(i, idx):
        v = jnp.take_along_axis(tbl, idx & 127, axis=1)
        return idx + v
    out_ref[:] = jax.lax.fori_loop(0, LSTEPS, step, idx_ref[:])


@jax.jit
def pallas_lane(idx_l):
    return pl.pallas_call(
        pallas_lane_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl_small, idx_l)


try:
    dt = timeit(pallas_lane, idx_l)
    print(f"6. Pallas lane-gather 8x128:   {8*128*LSTEPS/dt/1e6:8.1f} M lookups/s")
except Exception as e:
    print(f"6. Pallas lane-gather 8x128:   FAILED: {type(e).__name__}: {str(e)[:300]}")
