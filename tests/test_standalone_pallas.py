"""Pallas device decode of plain standalone .pco files (ops/pallas_decode.
plan_standalone): bit-exact vs the host decoder for every supported mode /
delta / dtype, including multi-chunk files, ragged tails, secondary vars,
and the reference compatibility assets.

The host boundary walk (required by the format: standalone stores no chunk
sizes, ref: standalone/decompressor.rs:83-134) captures per-batch chain
entry points; the device decode itself rides the same kernels as the PCT
container path.
"""

import glob
import os

import numpy as np
import pytest

import jax

from pcodec_tpu import ChunkConfig, DeltaSpec, ModeSpec
from pcodec_tpu.codec.chunk_config import PagingSpec
from pcodec_tpu.codec.standalone import simple_compress, simple_decompress

_ON_TPU = jax.devices()[0].platform in ("tpu", "axon")
needs_tpu = pytest.mark.skipif(
    not _ON_TPU,
    reason="standalone Pallas matrix needs TPU; run with PCODEC_TEST_PLATFORM=tpu",
)

RNG = np.random.default_rng(99)


def _roundtrip(nums, config=None):
    from pcodec_tpu.ops.pallas_decode import decode_standalone_device

    blob = simple_compress(nums, config)
    host, _ = simple_decompress(blob)
    assert np.array_equal(host.view(np.uint8), nums.view(np.uint8))
    out, _, _ = decode_standalone_device(blob)
    assert out.dtype == nums.dtype
    assert np.array_equal(out.view(np.uint8), nums.view(np.uint8)), (
        f"device mismatch: {np.count_nonzero(out.view(np.uint8) != nums.view(np.uint8))}"
    )
    return blob


def taxi_like(n):
    incs = RNG.integers(0, 120, n)
    return np.cumsum(incs).astype(np.int64)


class TestStandaloneInterpret:
    def test_smoke_interpret(self):
        # classic order-1 i64 (the fused-kernel path), one small case
        _roundtrip(taxi_like(3000))


@needs_tpu
class TestStandaloneDevice:
    def test_multi_chunk_ragged(self):
        cfg = ChunkConfig(paging_spec=PagingSpec.equal_pages_up_to(4096))
        _roundtrip(taxi_like(9473), cfg)

    def test_u32_noop(self):
        _roundtrip(RNG.integers(0, 5000, 6000).astype(np.uint32))

    def test_high_entropy_i64(self):
        _roundtrip(RNG.integers(0, 2**63, 6000).astype(np.int64))

    def test_f32_classic(self):
        _roundtrip((RNG.standard_normal(6000) * 100).astype(np.float32))

    def test_f64_float_mult(self):
        _roundtrip((RNG.integers(0, 1000, 6000) * 0.1).astype(np.float64))

    def test_f16_quant(self):
        _roundtrip(np.round(RNG.standard_normal(6000) * 16).astype(np.float16) / 16)

    def test_int_mult(self):
        _roundtrip((RNG.integers(0, 10**6, 6000) * 1_000_000_000).astype(np.int64))

    def test_dict_mode(self):
        vals = np.array([3, 99, 1234567, -5], dtype=np.int64)
        cfg = ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT))
        _roundtrip(vals[RNG.integers(0, 4, 6000)], cfg)

    def test_delta_orders(self):
        base = np.cumsum(np.cumsum(RNG.integers(0, 10, 6000))).astype(np.int64)
        for order in (2, 7):
            _roundtrip(base, ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, order)))

    def test_conv1(self):
        t = np.arange(6000, dtype=np.float64)
        nums = (1000 * np.sin(t * 0.01) + RNG.standard_normal(6000)).astype(np.int32)
        _roundtrip(nums, ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONV1, 4)))

    def test_lookback_device(self):
        # lookback chunks ride the device chains too: pre-delta latents +
        # lookbacks decode in the kernels, reconstruction runs flat on the
        # chunk (chains are an artificial split of the single page)
        nums = np.tile(RNG.integers(0, 1000, 64).astype(np.int64), 100)
        blob = _roundtrip(
            nums, ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK)))
        from pcodec_tpu.ops.pallas_decode import plan_standalone

        plan = plan_standalone(blob)
        assert all(c.fallback is None for c in plan.chunks)
        # ragged tail + multi-chunk
        pat = np.tile(RNG.integers(0, 10**6, 512).astype(np.int64), 30)
        _roundtrip(pat[: len(pat) - 100],
                   ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK)))

    def test_constant_and_tiny(self):
        _roundtrip(np.full(6000, 42, dtype=np.int64))
        _roundtrip(taxi_like(7))
        _roundtrip(taxi_like(1025))

    def test_assets(self):
        from pcodec_tpu.ops.pallas_decode import decode_standalone_device

        for path in sorted(glob.glob("/root/reference/pco/assets/*.pco")):
            with open(path, "rb") as f:
                blob = f.read()
            host, nt = simple_decompress(blob)
            out, _, _ = decode_standalone_device(blob)
            assert np.array_equal(
                out.view(np.uint8), host.view(np.uint8)
            ), os.path.basename(path)
