"""Device encoder (ops/pallas_encode.py): byte-identical to the host encoder.

Same bins in => identical stream out: the EB/EC kernels must reproduce the
host dissection + packing exactly, including ragged pages, trivial vars
(host fallback), 64-bit offsets, and multi-chunk files.
"""

import numpy as np
import pytest

import jax

from pcodec_tpu import ChunkConfig, DeltaSpec
from pcodec_tpu.codec.container import container_compress

_ON_TPU = jax.devices()[0].platform in ("tpu", "axon")
needs_tpu = pytest.mark.skipif(
    not _ON_TPU,
    reason="device encode matrix needs TPU; run with PCODEC_TEST_PLATFORM=tpu",
)

RNG = np.random.default_rng(7)


def _identical(nums, cfg=None, **kw):
    from pcodec_tpu.ops.pallas_encode import encode_container_device

    kw.setdefault("page_n", 1024)
    ref = container_compress(nums, cfg, **kw)
    dev, stats = encode_container_device(nums, cfg, **kw)
    assert dev == ref, (
        f"device encode differs: ref {len(ref)}B dev {len(dev)}B "
        f"(first diff at {next((i for i in range(min(len(ref), len(dev))) if ref[i] != dev[i]), -1)})"
    )
    return stats


class TestEncodeInterpret:
    def test_smoke_interpret(self):
        stats = _identical(np.cumsum(RNG.integers(0, 90, 700)).astype(np.int64), page_n=256)
        assert stats["device_chunks"] == 1


@needs_tpu
class TestDeviceEncode:
    def test_taxi_ragged(self):
        assert _identical(np.cumsum(RNG.integers(0, 120, 9473)).astype(np.int64))[
            "device_chunks"] == 1

    def test_multichunk(self):
        _identical(np.cumsum(RNG.integers(0, 50, 10000)).astype(np.int64), chunk_n=4096)

    def test_ob64(self):
        assert _identical(RNG.integers(0, 2**62, 6000).astype(np.int64))["device_chunks"] == 1

    def test_trivial_and_fallbacks(self):
        _identical(np.full(5000, 42, np.int64))
        _identical((RNG.integers(0, 10**6, 6000) * 1_000_000_000).astype(np.int64))

    def test_delta_orders(self):
        base = np.cumsum(np.cumsum(np.cumsum(RNG.integers(0, 5, 6000)))).astype(np.int64)
        for order in (2, 3):
            _identical(base, ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, order)))

    def test_f32_classic(self):
        _identical((RNG.standard_normal(6000) * 100).astype(np.float32))

    def test_tiny(self):
        _identical(np.arange(7, dtype=np.int64))
        _identical(np.cumsum(RNG.integers(0, 90, 1025)).astype(np.int64))
