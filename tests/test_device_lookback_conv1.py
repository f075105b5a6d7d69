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
