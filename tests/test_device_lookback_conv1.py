"""Device decode of lookback and conv1 chunks (no host fallback)."""

import numpy as np

from pcodec_tpu import ChunkConfig, DeltaSpec, PagingSpec, simple_compress
from tests.test_device_decode import check_device_matches_host


def test_device_lookback():
    base = np.array([11, 27, 6, 3, 8, 101, 9, 0, 3, 5], dtype=np.uint32)
    nums = np.tile(base, 400)
    cfg = ChunkConfig(
        delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK),
        paging_spec=PagingSpec.equal_pages_up_to(1000),
    )
    data = simple_compress(nums, cfg)
    from pcodec_tpu.ops.decode import plan_standalone_file

    plan = plan_standalone_file(data)
    assert len(plan.fallback_arrays) == 0, "lookback should use the device path"
    check_device_matches_host(data)


def test_device_conv1():
    xm1, xm2 = 0.0, 0.0
    vals = []
    for i in range(3000):
        x = xm1 * 1.9 - xm2 * 0.9 + ((i * 31) % 57 - 28)
        vals.append(int(x + 50000.0))
        xm2, xm1 = xm1, x
    nums = np.array(vals, dtype=np.int32)
    cfg = ChunkConfig(
        delta_spec=DeltaSpec(DeltaSpec.TRY_CONV1, 6),
        paging_spec=PagingSpec.equal_pages_up_to(1024),
    )
    data = simple_compress(nums, cfg)
    from pcodec_tpu.ops.decode import plan_standalone_file

    plan = plan_standalone_file(data)
    assert len(plan.fallback_arrays) == 0, "conv1 should use the device path"
    check_device_matches_host(data)


def test_lookback_pages_pallas_matches_xla():
    """The Pallas per-page lookback reconstruction kernel must be
    bit-identical to the XLA pointer-doubling reference on adversarial
    inputs: every page size class (G pages/block), state_n extremes,
    out-of-window and out-of-page lookbacks, wrap-around u64 sums."""
    import jax
    import jax.numpy as jnp

    import pcodec_tpu.ops.decode as xops
    import pcodec_tpu.ops.pallas_decode as pd

    import jax as _jax

    rng = np.random.default_rng(11)
    cases = [
        # (n_pages, page_n, state_n, window_n, bits): multi-page block (G=4)
        (5, 256, 32, 2048, 64),
    ]
    if _jax.devices()[0].platform in ("tpu", "axon"):
        # heavier shapes (interpret mode is ~2 min each on CPU); page_n 1024
        # (G=1) is also covered by the container lookback test on hardware
        cases += [(1, 768, 2, 300, 16), (2, 1024, 31, 4096, 32)]
    for n_pages, page_n, state_n, window_n, bits in cases:
        latents = rng.integers(0, 1 << 63, (n_pages, page_n), dtype=np.uint64)
        latents |= rng.integers(0, 2, (n_pages, page_n), dtype=np.uint64) << 63
        # lookbacks: mostly valid, some 0 and some far out of window/page
        lbs = rng.integers(1, window_n + 1, (n_pages, page_n), dtype=np.uint64)
        lbs[:, ::17] = 0
        lbs[:, 3::29] = window_n + 1000
        states = rng.integers(0, 1 << 62, (n_pages, 32), dtype=np.uint64)

        ref = jax.vmap(
            lambda lat, lb, st: xops._lookback_decode(
                lat, lb, st, jnp.int64(window_n), state_n, bits
            )
        )(jnp.asarray(latents), jnp.asarray(lbs), jnp.asarray(states))
        got = pd._lookback_decode_pages_pallas(
            jnp.asarray(latents), jnp.asarray(lbs), jnp.asarray(states),
            window_n, state_n, bits,
        )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref), err_msg=str((n_pages, page_n))
        )
