"""Device-decode benchmark matrix over the five BASELINE.json configs
(plus a dict-mode config), each timed on real TPU hardware and
byte-compared against the host decoder (one-time readback).

Configs (BASELINE.json "configs", structure preserved, scaled so the
~26 ms dispatch floor does not dominate):
  1. standalone classic i64 taxi-like ints, delta order 1
  2. f64 time-series classic auto-delta, multi-chunk standalone
  3. IntMult i64 timestamps (multiples of 1e9 + small adjustments)
  4. FloatMult f32 + FloatQuant f16 sensor data
  5. wrapped (PCT) multi-page lookback with per-page state
  6. dict-mode i64 (few distinct values)

Timing protocol (NOTES.md): compressed data device-resident; the jitted
decode reduces to an 8-byte checksum that is fetched to force completion
(block_until_ready does not block through the axon tunnel). Plans are
host-side and cached — the standalone format requires a host boundary walk
by design (the wrapped format delegates ranges to outer containers).

Merges results into BENCH_MATRIX_r05.json (existing good entries are kept
when a config errors) and exits nonzero if any config errored.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
_REPO = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".cache", "jax"))

REF = {
    # reference M3 Max 1-core decompress GB/s for flavor-matched data
    # (docs/benchmark_results/columnar_mbp_m3_max_rust1_89.csv)
    "taxi_i64_delta1": 3.49,
    "f64_auto_multichunk": 3.49,
    "intmult_i64_timestamps": 3.49,
    "floatmult_f32": 2.32,
    "floatquant_f16": 2.32,
    "wrapped_lookback_multipage": 3.85,
    "dict_i64": 3.49,
    # realistic-ratio control: reference taxi pickup_ts compresses 6.89x
    # (columnar_mbp_m3_max_rust1_89.csv); this config is tuned to land near
    # that ratio so the headline's 8.9x synthetic has a fair-ratio sibling
    "taxi_i64_realistic_ratio": 3.49,
    # closest published reference number for an LPC-friendly float-ish
    # signal: fcbench f32_acs_wht decompress 1.45 GB/s (Xeon 8488C,
    # fcbench_intel_xeon_platinum_8488c_rust1_88.csv:20); the reference
    # publishes no conv1-specific number (conv1 is its slow path too,
    # pco/src/delta/conv1.rs:191-233)
    "conv1_i32_lpc": 1.45,
    # no published dict-specific reference number; taxi-class CPU core
    # figure used as the comparison anchor (same as dict_i64)
    "dict_i64_100k": 3.49,
}

MATRIX_OUT = "BENCH_MATRIX_r05.json"
BLOB_CACHE = os.path.join(_REPO, ".cache", "bench", "matrix_blobs_v1")


def make_configs():
    rng = np.random.default_rng(1234)
    cfgs = {}

    n = 48 * 1024 * 1024
    incs = rng.integers(0, 120, n)
    jumps = rng.random(n) < 0.001
    cfgs["taxi_i64_delta1"] = (
        np.cumsum(incs + jumps * rng.integers(0, 10**6, n)).astype(np.int64),
        None, "standalone",
    )

    n2 = 32 * 1024 * 1024
    t = np.arange(n2, dtype=np.float64)
    cfgs["f64_auto_multichunk"] = (
        np.cumsum(rng.standard_normal(n2)) + 0.001 * t,
        None, "standalone",
    )

    cfgs["intmult_i64_timestamps"] = (
        (np.cumsum(rng.integers(1, 30, n2)) * 1_000_000_000
         + rng.integers(0, 4, n2)).astype(np.int64),
        None, "standalone",
    )

    cfgs["floatmult_f32"] = (
        (rng.integers(-5000, 5000, n) * np.float32(0.01)).astype(np.float32),
        None, "standalone",
    )
    cfgs["floatquant_f16"] = (
        (np.round(rng.standard_normal(n) * 16) / 16).astype(np.float16),
        None, "standalone",
    )

    from pcodec_tpu import ChunkConfig, DeltaSpec, ModeSpec

    pattern = rng.integers(0, 10**6, 512).astype(np.int64)
    reps = np.tile(pattern, n2 // 512)
    cfgs["wrapped_lookback_multipage"] = (
        reps + rng.integers(0, 2, len(reps)),
        ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK)), "pct",
    )

    vals = np.array([3, 99, 1234567, -5], dtype=np.int64)
    cfgs["dict_i64"] = (
        vals[rng.integers(0, 4, n2)],
        ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT)), "pct",
    )

    # 100k-entry dictionary with UNIFORM indices — the worst case for the
    # big-dict cold-plane join (every decode block touches ~all planes);
    # VERDICT r4 #4 asks for a measured number here instead of a silent
    # cliff past the old 8192-entry cap
    n4 = 16 * 1024 * 1024
    big_vals = rng.integers(-(10**12), 10**12, 100_000).astype(np.int64)
    cfgs["dict_i64_100k"] = (
        big_vals[rng.integers(0, 100_000, n4)],
        ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT)), "pct",
    )

    # LPC-friendly i32 signal: a slow two-tone oscillator + small noise —
    # order-6 conv1 predicts it far better than consecutive deltas
    n3 = 8 * 1024 * 1024
    t3 = np.arange(n3, dtype=np.float64)
    sig = (
        (1 << 20) * np.sin(0.01 * t3)
        + (1 << 18) * np.sin(0.003 * t3 + 1.0)
        + rng.integers(-64, 64, n3)
    )
    cfgs["conv1_i32_lpc"] = (
        sig.astype(np.int32),
        ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONV1, 6)),
        "standalone",
    )

    # incs 0..600 lands the ratio at ~6.87 (vs reference taxi's 6.89)
    incs_r = rng.integers(0, 600, n2)
    jumps_r = rng.random(n2) < 0.001
    cfgs["taxi_i64_realistic_ratio"] = (
        np.cumsum(incs_r + jumps_r * rng.integers(0, 10**6, n2)).astype(np.int64),
        None, "standalone",
    )
    return cfgs


def time_device(plan_fn, data, expect_u64_sum):
    """Returns (best_secs, ok) timing the jitted decode+checksum."""
    import jax
    import jax.numpy as jnp
    import pcodec_tpu.ops.pallas_decode as pd

    plan = plan_fn(data)
    la = {"raw2d": jnp.asarray(plan.raw2d)}
    for lkey, launch in plan.launches.items():
        d = {
            k: jnp.asarray(getattr(launch, k))
            for k in ("starts_blk", "tables", "tbl_ids", "curs", "states0", "bodyn")
        }
        if launch.moments is not None:
            d["moments"] = jnp.asarray(launch.moments)
        la[repr(lkey)] = d
    host_sum = np.uint64(0)
    for cp in plan.chunks:
        if cp.fallback is not None:
            w = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[
                cp.fallback.dtype.itemsize
            ]
            host_sum += np.sum(
                cp.fallback.view(w).astype(np.uint64), dtype=np.uint64
            )

    def run(args):
        res = pd._decode_plan_device(plan, args)
        parts = [pd.result_checksum_u64(r) for r in res if r is not None]
        total = sum(parts) if parts else jnp.uint64(0)
        return jnp.asarray(total, jnp.uint64).reshape(1)

    f = jax.jit(run)
    checksum = np.uint64(int(f(la)[0])) + host_sum
    ok = int(checksum) == int(expect_u64_sum)
    best = 9e9
    for _ in range(6):
        t0 = time.perf_counter()
        cs = int(f(la)[0])
        best = min(best, time.perf_counter() - t0)
    return best, ok, plan


def time_encode(nums, cfg, name):
    """Device file-image encode (plan_image + run_image + stitch) timed as
    in bench.py: wall covers numbers-in-HBM (+ host mirror) -> completed
    byte-exact .pct image in HBM, forced by an 8-byte checksum fetch. The
    image is byte-compared against the host encoder once, untimed (the
    compressed image readback is MB-scale). Returns {} when the config is
    outside the device image path (reported as encode_device_image=False)."""
    import jax
    import jax.numpy as jnp
    from pcodec_tpu.ops import assemble
    from pcodec_tpu.codec.container import container_compress

    page_n, chunk_n = 1024, 1 << 21
    dev_bits = None
    if nums.dtype.kind == "f":
        # float plans consume raw BITS on device; upload them once outside
        # the timed wall (same numbers-in-HBM protocol as the int configs)
        idt = {2: np.int16, 4: np.int32, 8: np.int64}[nums.dtype.itemsize]
        dev_bits = jnp.asarray(nums.view(idt))
        nums_dev, nums_host = nums, nums
        int(jnp.sum(dev_bits, dtype=jnp.int64)[None][0])
    else:
        nums_dev = jnp.asarray(nums)
        nums_host = nums
        jnp.sum(nums_dev, dtype=jnp.int64).block_until_ready()

    _force = jax.jit(lambda x: jnp.sum(
        x.astype(jnp.uint32).astype(jnp.uint64)).reshape(1))

    def encode_once():
        t0 = time.perf_counter()
        plan = assemble.plan_image(nums_dev, cfg, page_n, chunk_n,
                                   nums_host=nums_host, dev_bits=dev_bits)
        if plan is None:
            return None, None, None
        t1 = time.perf_counter()
        out = assemble.run_image(plan, use_pallas=True)
        if out is None:
            return None, None, plan
        int(_force(out[1])[0])
        t2 = time.perf_counter()
        return (t1 - t0, t2 - t1), out, plan

    times, out, plan = encode_once()  # compile + warm
    if out is None:
        return {"encode_device_image": False}

    # one-time untimed oracle compare (cached host bytes)
    ocache = os.path.join(BLOB_CACHE, f"{name}_oracle_{len(nums)}.pct")
    if os.path.exists(ocache):
        with open(ocache, "rb") as fh:
            expect = fh.read()
    else:
        expect = container_compress(nums, cfg, page_n=page_n, chunk_n=chunk_n)
        with open(ocache, "wb") as fh:
            fh.write(expect)
    img = assemble.file_image_to_bytes(*out)
    byte_exact = img == expect

    train_secs, wall = 0.0, 9e9
    for _ in range(3):
        times, out, plan = encode_once()
        if times and sum(times) < wall:
            wall, train_secs = sum(times), times[0]
    return {
        "encode_device_image": True,
        "encode_image_mode": plan.get("mode", "single"),
        "encode_gbps": round(nums.nbytes / wall / 1e9, 3),
        "encode_train_secs": round(train_secs, 2),
        "encode_device_secs": round(wall - train_secs, 2),
        "encode_byte_exact": byte_exact,
        "encode_ratio": round(nums.nbytes / len(expect), 3),
    }


def main():
    from bench import wait_for_device

    wait_for_device()
    from pcodec_tpu.codec.container import container_compress, container_decompress
    from pcodec_tpu.codec.standalone import simple_compress, simple_decompress
    import pcodec_tpu.ops.pallas_decode as pd

    only = os.environ.get("PCODEC_BENCH_ONLY", "")
    os.makedirs(BLOB_CACHE, exist_ok=True)
    results = {}
    n_errors = 0
    for name, (nums, cfg, fmt) in make_configs().items():
        if only and only not in name:
            continue
        if fmt == "standalone":
            plan_fn = pd.plan_standalone
            dev_fn = pd.decode_standalone_device
        else:
            plan_fn = pd.plan_container
            dev_fn = pd.decode_container_device
        # host compression of tens of MM numbers costs minutes on this VM;
        # cache blobs so A/B reruns only pay the device side
        cache = os.path.join(BLOB_CACHE, f"{name}_{len(nums)}.bin")
        t0 = time.time()
        if os.path.exists(cache):
            with open(cache, "rb") as fh:
                blob = fh.read()
            compress_secs = 0.0
        else:
            compress = simple_compress if fmt == "standalone" else container_compress
            blob = compress(nums, cfg)
            compress_secs = time.time() - t0
            with open(cache, "wb") as fh:
                fh.write(blob)
        ratio = nums.nbytes / len(blob)

        w = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[nums.dtype.itemsize]
        expect = np.sum(nums.view(w).astype(np.uint64), dtype=np.uint64)
        try:
            best, ok, plan = time_device(plan_fn, blob, expect)

            # one-time byte compare via full readback (excluded from timing)
            out, _, _ = dev_fn(blob, plan)
            byte_exact = bool(np.array_equal(out.view(np.uint8), nums.view(np.uint8)))
        except Exception as e:  # one config must not kill the matrix
            n_errors += 1
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(name, json.dumps(results[name]), flush=True)
            continue

        gbps = nums.nbytes / best / 1e9
        results[name] = {
            "n": int(len(nums)),
            "dtype": str(nums.dtype),
            "format": fmt,
            "ratio": round(ratio, 3),
            "decode_gbps": round(gbps, 3),
            # symbol rate: GB/s penalizes narrow dtypes (f16 moves 4x fewer
            # bytes per decoded number than i64); nums/s is the real kernel
            # throughput axis (VERDICT r4 #7)
            "nums_per_sec_m": round(len(nums) / best / 1e6, 1),
            "decode_ms": round(best * 1e3, 2),
            "checksum_ok": ok,
            "byte_exact": byte_exact,
            "compress_secs_host": round(compress_secs, 2),
            "ref_cpu_gbps": REF[name],
            "vs_ref": round(gbps / REF[name], 3),
        }
        # device-encode leg (VERDICT r4 #2): every config gets a device
        # file-image encode number (or an honest encode_device_image=False)
        try:
            results[name].update(time_encode(nums, cfg, name))
        except Exception as e:
            n_errors += 1
            results[name]["encode_error"] = f"{type(e).__name__}: {e}"[:300]
        # a filtered A/B run must not overwrite the full matrix unless the
        # caller asks for it (PCODEC_BENCH_MERGE=1 re-measures one config
        # in place); merge after EVERY config so a timeout mid-run keeps
        # the configs already measured
        merge_ok = (not only) or bool(
            int(os.environ.get("PCODEC_BENCH_MERGE", "0")))
        print(name, json.dumps(results[name]), flush=True)
        if merge_ok:
            _merge_out(results)

    if not only or bool(int(os.environ.get("PCODEC_BENCH_MERGE", "0"))):
        _merge_out(results)
    print(json.dumps({"matrix": results}))
    if n_errors:
        sys.exit(1)


def _merge_out(results):
    """Merge results into MATRIX_OUT, never replacing a previously good
    measurement with an error."""
    prior = {}
    if os.path.exists(MATRIX_OUT):
        try:
            with open(MATRIX_OUT) as f:
                prior = json.load(f)
        except Exception:
            prior = {}
    merged = dict(prior)
    for name, res in results.items():
        if "error" in res and "error" not in merged.get(name, {"error": 1}):
            continue
        merged[name] = res
    with open(MATRIX_OUT, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
