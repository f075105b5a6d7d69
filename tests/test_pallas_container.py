"""PCT container + Pallas device decode: bit-exact vs the host path.

The decode kernel (ops/pallas_decode.py) must reproduce the host
decompressor exactly for every mode / delta / dtype combination the device
path supports, including ragged final pages, trivial (single-bin) vars, and
secondary latent vars.  On machines without the TPU plugin these tests run
the kernels in interpreter mode automatically.
"""

import numpy as np
import pytest

import jax

from pcodec_tpu import ChunkConfig, DeltaSpec, ModeSpec

_ON_TPU = jax.devices()[0].platform in ("tpu", "axon")
needs_tpu = pytest.mark.skipif(
    not _ON_TPU,
    reason="Pallas decode matrix needs TPU (interpret mode too slow); "
    "run with PCODEC_TEST_PLATFORM=tpu",
)
from pcodec_tpu.codec.container import (
    container_compress,
    container_decompress,
    parse_container,
)


def _roundtrip(nums, config=None, page_n=1024, chunk_n=1 << 20, device=None):
    """Host round trip, plus the device decode when on TPU (or when asked:
    interpret-mode kernel runs are ~30s of trace+lower each, so CPU runs
    keep exactly one smoke case)."""
    data = container_compress(nums, config, page_n=page_n, chunk_n=chunk_n)
    host = container_decompress(data)
    assert np.array_equal(host.view(np.uint8), nums.view(np.uint8))
    if device is None:
        device = _ON_TPU
    if device:
        import pcodec_tpu.ops.pallas_decode as pd

        out, _, _ = pd.decode_container_device(data)
        assert out.dtype == nums.dtype
        assert np.array_equal(out.view(np.uint8), nums.view(np.uint8)), (
            f"device mismatch: {np.count_nonzero(out != nums)}/{len(nums)}"
        )
    return data


RNG = np.random.default_rng(1234)


def taxi_like(n):
    incs = RNG.integers(0, 120, n)
    jumps = RNG.random(n) < 0.001
    incs = incs + jumps * RNG.integers(0, 10**6, n)
    return np.cumsum(incs).astype(np.int64)


class TestContainerHost:
    def test_truncation_safety(self):
        from pcodec_tpu.errors import CorruptionError, InsufficientDataError

        data = container_compress(taxi_like(3000))
        for cut in list(range(0, 64, 7)) + [len(data) // 2, len(data) - 1]:
            with pytest.raises((CorruptionError, InsufficientDataError, Exception)):
                container_decompress(data[:cut])

    def test_multi_chunk(self):
        nums = taxi_like(10000)
        data = _roundtrip(nums, chunk_n=4096)
        idx = parse_container(data)
        assert len(idx.chunk_metas) == 3


class TestDeviceDecodeInterpret:
    def test_smoke_interpret(self):
        # one small end-to-end kernel correctness check that runs anywhere
        _roundtrip(taxi_like(600), page_n=256, device=True)


@needs_tpu
class TestDeviceDecode:
    def test_classic_delta1_i64(self):
        cfg = ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, 1))
        _roundtrip(taxi_like(5000), cfg)

    def test_auto_multi_chunk_ragged(self):
        _roundtrip(taxi_like(9473), chunk_n=4096)

    def test_tiny(self):
        _roundtrip(taxi_like(7))
        _roundtrip(taxi_like(256))
        _roundtrip(taxi_like(1024))
        _roundtrip(taxi_like(1025))

    def test_high_entropy_i64(self):
        # 64-bit offsets (ob class 64, no lat32)
        _roundtrip(RNG.integers(0, 2**63, 4000).astype(np.int64))

    def test_dtypes(self):
        for dt in (np.int16, np.uint32, np.int32, np.uint64):
            nums = (RNG.integers(0, 300, 4000) * 7).astype(dt)
            _roundtrip(nums)

    def test_f32_classic(self):
        _roundtrip((RNG.standard_normal(5000) * 100).astype(np.float32))

    def test_f16_classic(self):
        # headline dtype (ref: data_types/float.rs:256-368) incl. specials
        nums = (RNG.standard_normal(5000) * 8).astype(np.float16)
        nums[::97] = np.float16(np.inf)
        nums[1::211] = np.float16(-0.0)
        nums[2::321] = np.float16(np.nan)
        _roundtrip(nums)

    def test_f16_quant(self):
        _roundtrip(np.round(RNG.standard_normal(5000) * 16).astype(np.float16) / 16)

    def test_u8_i8(self):
        from pcodec_tpu import ChunkConfig

        cfg = ChunkConfig(enable_8_bit=True)
        _roundtrip(RNG.integers(0, 256, 5000).astype(np.uint8), cfg)
        _roundtrip(RNG.integers(-128, 128, 5000).astype(np.int8), cfg)

    def test_f64_float_mult(self):
        _roundtrip((RNG.integers(0, 1000, 5000) * 0.1).astype(np.float64))

    def test_f32_float_quant(self):
        _roundtrip(np.round(RNG.standard_normal(5000) * 64).astype(np.float32) / 64)

    def test_int_mult(self):
        _roundtrip((RNG.integers(0, 10**6, 5000) * 1_000_000_000).astype(np.int64))

    def test_dict_mode(self):
        vals = np.array([3, 99, 1234567, -5], dtype=np.int64)
        nums = vals[RNG.integers(0, 4, 5000)]
        cfg = ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT))
        _roundtrip(nums, cfg)

    def test_delta_orders(self):
        base = np.cumsum(np.cumsum(RNG.integers(0, 10, 4000)))
        for order in (2, 5, 7):
            cfg = ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, order))
            _roundtrip(base.astype(np.int64), cfg)

    def test_lookback(self):
        pattern = RNG.integers(0, 1000, 64).astype(np.int64)
        nums = np.tile(pattern, 80)
        cfg = ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK))
        _roundtrip(nums, cfg)

    def test_conv1(self):
        t = np.arange(6000, dtype=np.float64)
        nums = (1000 * np.sin(t * 0.01) + RNG.standard_normal(6000)).astype(np.int32)
        cfg = ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONV1, 4))
        data = container_compress(nums, cfg)
        host = container_decompress(data)
        assert np.array_equal(host, nums)
        import pcodec_tpu.ops.pallas_decode as pd

        out, _, _ = pd.decode_container_device(data)
        assert np.array_equal(out, nums)

    def test_constant(self):
        _roundtrip(np.full(5000, 42, dtype=np.int64))

    def test_sparse_trivial_secondary(self):
        # mostly-constant floats: secondary often trivial
        nums = np.where(RNG.random(5000) < 0.95, 1.5, RNG.standard_normal(5000)).astype(
            np.float64
        )
        _roundtrip(nums)

    def test_page_sizes(self):
        nums = taxi_like(3000)
        for pn in (256, 512, 2048):
            _roundtrip(nums, page_n=pn)


class TestDictJoinKernel:
    """Unit tests for the lane-gather dict join (interpret mode on CPU).

    End-to-end dict decode through the kernel is covered by
    TestDeviceMatrix.test_dict_mode on real hardware; these verify the
    planes builder + tree gather against _join_mem's XLA semantics on
    tiny shapes (multi-plane trees, all number kinds, index clamping)."""

    def _check(self, nt_np, dict_nums, idx):
        import jax.numpy as jnp
        import pcodec_tpu.ops.pallas_decode as pd
        from pcodec_tpu.dtypes import number_type_from_np

        nt = number_type_from_np(np.dtype(nt_np))
        # latent-ordered dictionary (what chunk meta carries)
        lat = nt.to_latent_ordered(dict_nums).astype(np.uint64)
        planes = pd._dict_mem_planes(nt, lat)
        assert planes is not None and planes.shape[0] == 2
        prim = jnp.asarray(idx.astype(np.uint64))
        old = pd._INTERPRET
        pd._INTERPRET = True
        try:
            pairs = np.asarray(pd._dict_join_pairs(prim, jnp.asarray(planes), len(lat)))
        finally:
            pd._INTERPRET = old
        got = np.ascontiguousarray(pairs).view(np.uint64).reshape(-1)
        clamped = np.minimum(idx, len(lat) - 1)
        w = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[
            np.dtype(nt_np).itemsize
        ]
        expect = dict_nums[clamped].view(w).astype(np.uint64)
        assert np.array_equal(got, expect)

    def test_i64_multi_plane(self):
        d = RNG.integers(-(10**12), 10**12, 300).astype(np.int64)
        self._check(np.int64, d, RNG.integers(0, 300, 2500).astype(np.int64))

    def test_u32_single_plane(self):
        d = RNG.integers(0, 2**31, 100).astype(np.uint32)
        self._check(np.uint32, d, RNG.integers(0, 100, 1000).astype(np.int64))

    def test_f64_and_clamp(self):
        d = RNG.standard_normal(513)  # 5 planes, odd tail
        idx = RNG.integers(0, 700, 3000)  # some out of range -> clamped
        self._check(np.float64, d, idx.astype(np.int64))

    def test_f16(self):
        d = (RNG.standard_normal(150).astype(np.float16))
        self._check(np.float16, d, RNG.integers(0, 150, 1100).astype(np.int64))

    def test_cap(self):
        import pcodec_tpu.ops.pallas_decode as pd
        from pcodec_tpu.dtypes import number_type_from_np

        nt = number_type_from_np(np.dtype(np.int64))
        big = np.arange(pd._DICT_JOIN_MAX_ENTRIES + 1, dtype=np.uint64)
        assert pd._dict_mem_planes(nt, big) is None

    def test_big_dict_cold_plane_loop(self):
        # > 4*_DICT_HOT_PLANES planes: exercises the hot-prefix tree +
        # data-bounded cold-plane fori_loop kernel; indices mix a zipf-ish
        # hot mass with cold-tail and out-of-range (clamped) hits
        d = RNG.integers(-(10**9), 10**9, 20_000).astype(np.int64)
        idx = np.where(
            RNG.random(3000) < 0.8,
            RNG.integers(0, 512, 3000),          # hot prefix
            RNG.integers(0, 25_000, 3000),       # cold planes + clamps
        ).astype(np.int64)
        self._check(np.int64, d, idx)
