"""Split the encode launch (EB -> reduces/cursors -> EC) into timed stages
on real TPU, using the same 64M-taxi plan as bench.py."""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".cache", "jax"))

N = 64 * 1024 * 1024


def main():
    rng = np.random.default_rng(1234)
    incs = rng.integers(0, 120, N)
    jumps = rng.random(N) < 0.001
    incs = incs + jumps * rng.integers(0, 10**6, N)
    nums = np.cumsum(incs).astype(np.int64)

    import jax
    import jax.numpy as jnp
    from functools import partial
    from pcodec_tpu.ops import assemble
    from pcodec_tpu.ops import pallas_encode as pe

    nums_dev = jnp.asarray(nums)
    int(jnp.sum(nums_dev, dtype=jnp.int64)[None][0])

    plan = assemble.plan_image(nums_dev, None, 1024, 1 << 20, nums_host=nums)
    assert plan is not None
    schema = plan["schema"]
    dev_args = plan["dev_args"]

    eb_fn = jax.jit(partial(pe._eb_call, schema))

    def glue(eb_out):
        p1 = eb_out[0]
        T, R = p1.shape[0], schema.rounds
        B = schema.n_batches
        bits = pe._srl(p1, 15) & 15
        ob = pe._srl(p1, 19) & 127
        blk = bits.reshape(T, B, pe.RPB, 8, 32, 4)
        ans_len = pe._chains_cols(jnp.sum(blk, axis=(2, 5), dtype=jnp.int32))
        oblk = ob.reshape(T, B, pe.RPB, 8, 32, 4)
        off_len = pe._chains_cols(jnp.sum(oblk, axis=(2, 5), dtype=jnp.int32))
        total = ans_len + off_len
        start = jnp.cumsum(total, axis=1) - total
        curs_cols = jnp.stack([start, start + ans_len], axis=2).reshape(
            start.shape[0], 2 * B)
        return pe._dense_quad_dev(curs_cols)

    glue_fn = jax.jit(glue)

    def ec(eb_out, curs):
        p1 = eb_out[0]
        offlo = eb_out[1] if schema.has_off else None
        offhi = eb_out[2] if schema.off64 else None
        return pe._ec_call(schema, curs, p1, offlo, offhi)

    ec_fn = jax.jit(ec)
    fsum = jax.jit(lambda x: jnp.sum(
        x.astype(jnp.uint32).astype(jnp.uint64)).reshape(1))

    def force(x):
        return int(fsum(x)[0])

    for it in range(4):
        t0 = time.perf_counter()
        eb_out = eb_fn(*dev_args)
        force(eb_out[0])
        t1 = time.perf_counter()
        curs = glue_fn(eb_out)
        force(curs)
        t2 = time.perf_counter()
        sections = ec_fn(eb_out, curs)
        force(sections)
        t3 = time.perf_counter()
        print(f"it{it}: eb={t1-t0:.3f}  glue={t2-t1:.3f}  ec={t3-t2:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
