"""Warm-stage profile of the device encode pipeline on real TPU.

Times, per stage (forced by tiny checksum fetches, which serializes the
stages — so stage sums exceed the overlapped end-to-end wall also printed):
plan_image (host+train), EB/EC launch, prep, stitch, final force.

Usage: python tools/profile_encode.py [n_mib] (default 64M numbers)
Env: PCODEC_SB_WORDS to A/B the stitch superblock size.
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".cache", "jax"))

N = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024 * 1024
CHUNK_N = int(os.environ.get("PCODEC_BENCH_CHUNK_N", str(2 << 20)))


def main():
    rng = np.random.default_rng(1234)
    incs = rng.integers(0, 120, N)
    jumps = rng.random(N) < 0.001
    incs = incs + jumps * rng.integers(0, 10**6, N)
    nums = np.cumsum(incs).astype(np.int64)

    import jax
    import jax.numpy as jnp
    from pcodec_tpu.ops import assemble

    print(f"sb_words={assemble._sb_words()} n={N}", flush=True)
    nums_dev = jnp.asarray(nums)
    _ = int(jnp.sum(nums_dev, dtype=jnp.int64)[None][0])  # force upload

    # one jitted reduction per array shape (eager ops each pay a remote
    # compile through the tunnel)
    _force_jit = jax.jit(
        lambda x: jnp.sum(x.astype(jnp.uint32).astype(jnp.uint64)).reshape(1))

    def force(x):
        return int(_force_jit(x)[0])

    def run_once(staged):
        t = {}
        t0 = time.perf_counter()
        plan = assemble.plan_image(nums_dev, None, 1024, CHUNK_N,
                                   nums_host=nums)
        assert plan is not None
        t["plan"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = plan.get("launch_out")
        if out is None:
            out = assemble._run_launch_jit(plan["schema"])(*plan["dev_args"])
        sections, fstates, ans_len, off_len, total_bits = out
        if staged:
            force(sections)
        t["eb_ec"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        prep = assemble._prepare_image(
            plan["layout"], sections, fstates, ans_len, off_len, total_bits,
            plan["moments_dev"], plan["head_host_words"], plan["pfx_words"])
        if staged:
            force(prep["rowsA"])
        t["prep"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        prep["guards"].copy_to_host_async()
        body = assemble.stitch_pallas(
            prep, plan["nsb_ub"], assemble._default_caps())
        if staged:
            force(body)
        t["stitch"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        guards = np.asarray(prep["guards"])
        nsb = int(guards[2])
        sc = assemble._caps_scale()
        caps = tuple(assemble._bucket(int(g),
                                      (8 * sc, 16 * sc, 32 * sc, 64 * sc))
                     for g in guards[3:6])
        redo = (nsb > plan["nsb_ub"] or any(
            int(g) > d for g, d in zip(guards[3:6], assemble._default_caps())))
        if redo:
            body = assemble.stitch_pallas(prep, nsb, caps)
        force(body)
        t["guards+force"] = time.perf_counter() - t0
        t["redo"] = int(redo)
        t["total"] = sum(v for k, v in t.items() if k not in ("redo",))
        return t

    for i in range(2):  # compile + warm
        t = run_once(staged=True)
        print(f"warm{i} staged: {t}", flush=True)
        t = run_once(staged=False)
        print(f"warm{i} overlap: {t}", flush=True)
    for staged in (True, False):
        best = None
        for _ in range(3):
            t = run_once(staged)
            if best is None or t["total"] < best["total"]:
                best = t
        mode = "staged" if staged else "overlap"
        print(f"[{mode}] " + "  ".join(
            f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in best.items()), flush=True)


if __name__ == "__main__":
    main()
