"""Benchmark: TPU device decode throughput vs the reference baseline.

Headline: PCT-container decode (the production wrapped-format deployment —
standard Pco wrapped stream + page directory, see pcodec_tpu/codec/
container.py) of 64M taxi-like i64 numbers on one TPU chip, via the Pallas
batch-parallel tANS kernels (pcodec_tpu/ops/pallas_decode.py).

The reference's headline taxi decompress is 3.49 GB/s on one M3 Max
performance core (BASELINE.md); the BASELINE.json north star is
>= 1 GB/s per TPU chip.

Timing protocol for this environment (see NOTES.md): block_until_ready does
not block through the axon tunnel, so the jitted decode reduces to an 8-byte
checksum that is fetched to force completion. Compressed data is
device-resident before timing (production pipelines keep it in HBM).

Robustness (round-3 lesson: the driver run timed out with NOTHING recorded):
stages update a global RESULT as they complete; a watchdog thread and a
SIGTERM/SIGINT handler emit the single JSON line with whatever has been
measured if the process is killed or the self-deadline expires. Caches
(compressed file + JAX compilation cache) live under .cache/ in the repo so
they survive /tmp wipes between sessions.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import hashlib
import json
import os
import signal
import sys
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
_CACHE_DIR = os.path.join(_REPO, ".cache")
os.makedirs(os.path.join(_CACHE_DIR, "jax"), exist_ok=True)
os.makedirs(os.path.join(_CACHE_DIR, "bench"), exist_ok=True)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_CACHE_DIR, "jax"))

N = 64 * 1024 * 1024
SEED = 1234
CACHE = os.path.join(_CACHE_DIR, "bench", "bench_v4")
LEGACY_CACHE = "/tmp/pcodec_tpu_bench_v4"  # pre-round-4 location
REF_TAXI_DECOMPRESS_GBPS = 3.49  # M3 Max, 1 perf core (BASELINE.md)

_T_START = time.time()
# Self-deadline: emit whatever we have and exit before an external timeout
# can kill us silently. The driver's timeout budget is unknown; 2400 s is
# far beyond any healthy run (warm ~2 min, cold ~15 min) while still likely
# inside external limits.
DEADLINE_S = float(os.environ.get("PCODEC_BENCH_DEADLINE_S", "2400"))

RESULT = {
    "metric": "container_decode_taxi_like_i64",
    "value": 0.0,
    "unit": "GB/s/chip",
    "vs_baseline": 0.0,
    "extra": {"n": N, "stage": "start"},
}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _emit_and_exit(tag):
    """Print the single JSON line (exactly once) and hard-exit.

    Exit code: 0 only for a complete run ("done"); failure/abort tags
    (tunnel/deadline/signal*) exit 2 so drivers keying on rc see the
    difference while still getting the JSON line."""
    global _EMITTED
    rc = 0 if tag == "done" else 2
    with _EMIT_LOCK:
        if _EMITTED:
            os._exit(rc)
        _EMITTED = True
        if RESULT["value"] == 0.0:
            RESULT["extra"]["incomplete"] = tag
        elif tag != "done":
            RESULT["extra"]["partial"] = tag
        sys.stdout.write(json.dumps(RESULT) + "\n")
        sys.stdout.flush()
    os._exit(rc)


def _stage(name):
    RESULT["extra"]["stage"] = name
    print(f"[bench +{time.time() - _T_START:7.1f}s] {name}",
          file=sys.stderr, flush=True)


def _install_guards():
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, lambda s, f: _emit_and_exit(f"signal{s}"))
        except Exception:
            pass
    if DEADLINE_S > 0:
        t = threading.Timer(
            max(DEADLINE_S - (time.time() - _T_START), 5.0),
            lambda: _emit_and_exit("deadline"))
        t.daemon = True
        t.start()


def make_data():
    rng = np.random.default_rng(SEED)
    # taxi-like timestamps: sorted with jittery increments + occasional jumps
    incs = rng.integers(0, 120, N)
    jumps = rng.random(N) < 0.001
    incs = incs + jumps * rng.integers(0, 10**6, N)
    return np.cumsum(incs).astype(np.int64)


# TPU-profile experiment knob: cap trained ans_size_log (smaller tANS
# tables -> proportionally cheaper select trees in the decode kernel).
# Unset = reference-equivalent training. See ChunkConfig.ans_size_log_cap.
ANS_CAP = os.environ.get("PCODEC_BENCH_ANS_CAP")
ANS_CAP = int(ANS_CAP) if ANS_CAP else None
# Encode chunk size (TPU profile): bigger chunks amortize per-chunk host
# decisions/metas/fetches. Measured 2026-08-20 (warm, 64M taxi): 1M
# 0.379 GB/s, 2M 0.444, 4M 0.412 — 2M is the default. The reference CLI's
# own default chunk_n is 2^18 (pco_cli chunk_config_opt.rs), so this is an
# encoder-config choice, reported via ratio + byte-compared below. The
# decode leg keeps the 1M-chunk file for cross-round comparability.
CHUNK_N = int(os.environ.get("PCODEC_BENCH_CHUNK_N", str(2 << 20)))


def get_compressed(nums, chunk_n=1 << 20):
    tag = f"{len(nums)}-pct-a{ANS_CAP}" if ANS_CAP else f"{len(nums)}-pct"
    if chunk_n != 1 << 20:
        tag += f"-c{chunk_n}"
    key = hashlib.sha256(nums[:1000].tobytes() + tag.encode()).hexdigest()[:16]
    for base in (CACHE, LEGACY_CACHE):
        path = f"{base}_{key}_p1024.pct"
        if os.path.exists(path):
            with open(path, "rb") as f:
                return f.read(), 0.0
    from pcodec_tpu.codec.container import container_compress
    from pcodec_tpu.codec.chunk_config import ChunkConfig

    cfg = ChunkConfig(ans_size_log_cap=ANS_CAP) if ANS_CAP else None
    t0 = time.time()
    data = container_compress(nums, cfg, chunk_n=chunk_n)
    dt = time.time() - t0
    with open(f"{CACHE}_{key}_p1024.pct", "wb") as f:
        f.write(data)
    return data, dt


def wait_for_device(max_secs=900):
    """The axon tunnel can be transiently unavailable and jax.devices()
    then hangs indefinitely in-process. Probe via a killable subprocess
    and retry for a while before committing this process to the import."""
    import subprocess

    deadline = time.time() + max_secs
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                check=True, timeout=240, capture_output=True,
            )
            return True
        except Exception as e:
            if time.time() > deadline:
                RESULT["extra"]["error"] = (
                    f"TPU tunnel unavailable after {attempt} probes "
                    f"({type(e).__name__})")
                _emit_and_exit("tunnel")
            time.sleep(30)


def main():
    _install_guards()
    _stage("make_data")
    nums = make_data()
    _stage("host_compress (cache miss only)")
    data, compress_secs = get_compressed(nums)
    ratio = nums.nbytes / len(data)
    RESULT["extra"]["ratio"] = round(ratio, 3)
    RESULT["extra"]["compress_secs_host"] = round(compress_secs, 2)

    _stage("probe_device")
    wait_for_device()

    import jax
    import jax.numpy as jnp
    import pcodec_tpu.ops.pallas_decode as pd

    _stage("plan_container")
    plan = pd.plan_container(data)
    la = {"raw2d": jnp.asarray(plan.raw2d)}
    for lkey, launch in plan.launches.items():
        d = {
            k: jnp.asarray(getattr(launch, k))
            for k in ("starts_blk", "tables", "tbl_ids", "curs", "states0", "bodyn")
        }
        if launch.moments is not None:
            d["moments"] = jnp.asarray(launch.moments)
        la[repr(lkey)] = d

    def run(args):
        res = pd._decode_plan_device(plan, args)
        return sum(
            pd.result_checksum_u64(r) for r in res if r is not None
        ).reshape(1)

    _stage("decode_compile")
    f = jax.jit(run)
    checksum = int(f(la)[0])  # compile + warm
    expect = int(np.sum(nums.view(np.uint64), dtype=np.uint64))
    assert checksum == expect, "device decode checksum mismatch!"
    RESULT["extra"]["decode_checksum_ok"] = True

    # timing loop FIRST (before the untimed bit-exact compare, whose 512 MB
    # source upload is slow through the tunnel): a kill after this point
    # still records the headline number
    _stage("decode_timing")
    best = 9e9
    for _ in range(8):
        t0 = time.perf_counter()
        cs = int(f(la)[0])
        best = min(best, time.perf_counter() - t0)
    assert cs == expect
    gbps = nums.nbytes / best / 1e9
    RESULT["value"] = round(gbps, 3)
    RESULT["vs_baseline"] = round(gbps / REF_TAXI_DECOMPRESS_GBPS, 3)
    RESULT["extra"]["decode_ms"] = round(best * 1e3, 2)

    # one-time FULL-WIDTH bit-exactness: compare every decoded word against
    # the independently uploaded source ON DEVICE (a 512 MB readback through
    # the MB/s tunnel would take minutes; this fetches one bool). Untimed.
    # Two jits: decode-to-arrays (same graph size as the timed decode) and a
    # tiny compare — one fused graph exceeds the remote-compile size limit.
    _stage("decode_bit_exact (512MB source upload)")
    nums_dev = jnp.asarray(nums)
    chunk_ns_d = list(plan.idx.chunk_ns)
    dec_fn = jax.jit(lambda args: [
        r for r in pd._decode_plan_device(plan, args) if r is not None])
    res_dev = dec_fn(la)

    def full_compare(res, nd):
        ok = jnp.bool_(True)
        start = 0
        k = 0
        for cp, n_i in zip(plan.chunks, chunk_ns_d):
            ref = jax.lax.dynamic_slice_in_dim(nd, start, int(n_i), 0)
            start += int(n_i)
            if cp.fallback is not None:
                continue
            r = res[k]
            k += 1
            if r.ndim == 2:  # fused int32 little-endian word pairs
                ok = ok & jnp.all(r == jax.lax.bitcast_convert_type(ref, jnp.int32))
            else:
                ok = ok & jnp.all(
                    r == jax.lax.bitcast_convert_type(ref, jnp.uint64))
        return ok.reshape(1)

    # nums_dev is an ARGUMENT: closing over the device array would embed
    # a 512 MB constant in the remote-compile request (HTTP 413)
    decode_bit_exact = bool(
        np.asarray(jax.jit(full_compare)(res_dev, nums_dev))[0])
    assert decode_bit_exact, "device decode differs from source bits!"
    RESULT["extra"]["decode_bit_exact_bytes"] = True
    del res_dev

    # ---- encode: the FULL device pipeline to an HBM-resident file image —
    # train (host sample decisions + device full-array passes), EB/EC
    # kernels, and the device stitch of the final byte-exact .pct image
    # (ops/assemble.py). encode_wall covers everything from numbers-in-HBM
    # (+ the host mirror the caller owns, as the reference encoder does) to
    # the completed file image, forced by an 8-byte checksum fetch. The
    # image is byte-compared against the host encoder's file once, untimed.
    from pcodec_tpu.ops import assemble

    _ = int(jnp.sum(nums_dev, dtype=jnp.int64)[None][0])  # force upload
    cfg = (None if ANS_CAP is None else
           __import__("pcodec_tpu").ChunkConfig(ans_size_log_cap=ANS_CAP))

    # jitted completion force: an eager astype/astype/sum chain costs 3
    # dispatch round trips (~26 ms floor each) through the tunnel per call
    _force = jax.jit(lambda x: jnp.sum(
        x.astype(jnp.uint32).astype(jnp.uint64)).reshape(1))

    def encode_once():
        t0 = time.perf_counter()
        plan = assemble.plan_image(nums_dev, cfg, 1024, CHUNK_N, nums_host=nums)
        assert plan is not None, "headline data left the image path"
        t1 = time.perf_counter()
        out = assemble.run_image(plan, use_pallas=True)
        assert out is not None, "stitch guards tripped on headline data"
        head, body_dev, hb, bb = out
        int(_force(body_dev)[0])
        t2 = time.perf_counter()
        return (t1 - t0, t2 - t1), out

    _stage("encode_compile")
    (tr0, dev0), out = encode_once()  # compile warmup
    encode_bit_exact = False
    if out is not None and ANS_CAP is None:
        # one-time untimed byte compare against the host encoder's exact
        # file at the SAME chunk size (cached after the first run)
        _stage("encode_bit_exact (host-encoder oracle + image readback)")
        expect, enc_compress_secs = (
            (data, 0.0) if CHUNK_N == 1 << 20
            else get_compressed(nums, CHUNK_N))
        img = assemble.file_image_to_bytes(*out)
        encode_bit_exact = img == expect
        assert encode_bit_exact, "device file image differs from host encoder!"
        RESULT["extra"]["encode_bit_exact_bytes"] = True
        RESULT["extra"]["encode_chunk_n"] = CHUNK_N
        RESULT["extra"]["encode_ratio"] = round(
            nums.nbytes / len(expect), 3)
    _stage("encode_timing")
    train_secs = 0.0
    encode_wall = 9e9
    for _ in range(3):
        (tr, dev), out = encode_once()
        if tr + dev < encode_wall:
            encode_wall, train_secs = tr + dev, tr
    encode_gbps = nums.nbytes / encode_wall / 1e9
    RESULT["extra"].update({
        "encode_gbps": round(encode_gbps, 3),
        "encode_train_secs": round(train_secs, 2),
        "encode_device_secs": round(encode_wall - train_secs, 2),
    })
    RESULT["extra"].pop("stage", None)
    _emit_and_exit("done")


if __name__ == "__main__":
    main()
