"""Benchmark: device decode throughput on TPU vs the reference baseline.

BASELINE config 1 flavor: NYC-taxi-like monotone-ish i64 values, consecutive
delta order 1, standalone format. The reference's headline taxi decompress is
3.49 GB/s on one M3 Max performance core (BASELINE.md); the north star is
>= 1 GB/s per TPU chip.

Pages decode independently (breadth feeds the vmapped tANS scan); boundaries
come from the host plan, matching the wrapped-format production setup where
the outer container stores page byte ranges (ref: README.md, format.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_CHUNKS = 2048
CHUNK_N = 8192
SEED = 1234
CACHE = "/tmp/pcodec_tpu_bench_cache"
REF_TAXI_DECOMPRESS_GBPS = 3.49  # M3 Max, 1 perf core (BASELINE.md)


def make_data():
    rng = np.random.default_rng(SEED)
    n = N_CHUNKS * CHUNK_N
    # taxi-like timestamps: sorted with jittery increments + occasional jumps
    incs = rng.integers(0, 120, n)
    jumps = rng.random(n) < 0.001
    incs = incs + jumps * rng.integers(0, 10**6, n)
    return np.cumsum(incs).astype(np.int64)


def get_compressed(nums):
    key = hashlib.sha256(
        nums[:1000].tobytes() + f"{len(nums)}-{CHUNK_N}-v3".encode()
    ).hexdigest()[:16]
    path = f"{CACHE}_{key}.pco"
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    from pcodec_tpu import ChunkConfig, DeltaSpec, PagingSpec, simple_compress

    cfg = ChunkConfig(
        delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, 1),
        paging_spec=PagingSpec.equal_pages_up_to(CHUNK_N),
    )
    data = simple_compress(nums, cfg)
    with open(path, "wb") as f:
        f.write(data)
    return data


def main():
    nums = make_data()
    raw_bytes = nums.nbytes
    t0 = time.time()
    data = get_compressed(nums)
    compress_secs = time.time() - t0
    ratio = raw_bytes / len(data)

    from pcodec_tpu.ops.decode import (
        build_group_arrays,
        decode_group_kernel,
        group_tasks,
        plan_standalone_file,
    )
    import jax.numpy as jnp

    plan = plan_standalone_file(data)
    node_flat, lower_flat = plan.flat_tables()
    groups = group_tasks(plan)
    prepared = []
    for schema, tis in groups:
        items = [plan.tasks[ti] for ti in tis]
        arrays = build_group_arrays(items, schema)
        args = tuple(jnp.asarray(a) for a in arrays) + (
            jnp.asarray(node_flat),
            jnp.asarray(lower_flat),
        )
        prepared.append((schema, tis, items, args))

    # On this remote-TPU setup block_until_ready does not actually block, so
    # timing uses a jitted decode+checksum whose 8-byte result is pulled to
    # the host — np.asarray of the scalar forces full execution.
    import jax
    from functools import partial

    @partial(jax.jit, static_argnames=("schema",))
    def decode_checksum(*args, schema=None):
        out = decode_group_kernel(*args, schema=schema)
        return jnp.sum(out.astype(jnp.int64))

    for schema, _, _, args in prepared:  # warmup/compile
        np.asarray(decode_checksum(*args, schema=schema))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for schema, _, _, args in prepared:
            np.asarray(decode_checksum(*args, schema=schema))
        best = min(best, time.perf_counter() - t0)

    outs = [decode_group_kernel(*args, schema=schema) for schema, _, _, args in prepared]

    # verify bit-exactness (reassemble in original chunk order)
    out_np = [np.asarray(o) for o in outs]
    task_outputs = {}
    for (schema, tis, items, _), o in zip(prepared, out_np):
        for i, (ti, t) in enumerate(zip(tis, items)):
            task_outputs[ti] = o[i, : t.n].astype(t.nt.np_dtype)
    pieces = [
        plan.fallback_arrays[idx] if kind == "fallback" else task_outputs[idx]
        for kind, idx in plan.order_keys
    ]
    from pcodec_tpu.utils import concat
    decoded = concat(pieces)
    assert np.array_equal(decoded, nums), "decode mismatch!"

    gbps = raw_bytes / best / 1e9
    result = {
        "metric": "decode_throughput_taxi_like_i64_delta1",
        "value": round(gbps, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / REF_TAXI_DECOMPRESS_GBPS, 4),
        "extra": {
            "ratio": round(ratio, 3),
            "n": len(nums),
            "chunks": N_CHUNKS,
            "compress_secs_host": round(compress_secs, 2),
            "decode_secs": round(best, 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
