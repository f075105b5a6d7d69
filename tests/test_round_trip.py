"""Round-trip matrix over modes × delta encodings × dtypes × edge cases.

Modeled on ref: pco/src/tests/recovery.rs.
"""

import numpy as np
import pytest

from pcodec_tpu import ChunkConfig, DeltaSpec, ModeSpec, PagingSpec, simple_compress, simple_decompress


def round_trip(nums, config=None):
    compressed = simple_compress(nums, config)
    decoded, _ = simple_decompress(compressed)
    assert decoded.dtype == nums.dtype
    if nums.dtype.kind == "f":
        w = {2: np.uint16, 4: np.uint32, 8: np.uint64}[nums.dtype.itemsize]
        np.testing.assert_array_equal(decoded.view(w), nums.view(w))
    else:
        np.testing.assert_array_equal(decoded, nums)
    return compressed


CFG = ChunkConfig(enable_8_bit=True)


def cfg(**kw):
    from dataclasses import replace

    return replace(CFG, **kw)


ALL_DTYPES = [np.int32, np.int64, np.uint32, np.uint64, np.float32, np.float64,
              np.int16, np.uint16, np.float16, np.int8, np.uint8]


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_classic_arange(dtype):
    rng = np.random.default_rng(0)
    nums = (rng.integers(0, 100, 1000)).astype(dtype)
    round_trip(nums, cfg(mode_spec=ModeSpec(ModeSpec.CLASSIC)))


@pytest.mark.parametrize("dtype", [np.int64, np.float64, np.uint32, np.float16])
def test_auto_mode_auto_delta(dtype):
    rng = np.random.default_rng(1)
    base = np.cumsum(rng.integers(-3, 5, 3000))
    nums = base.astype(dtype)
    round_trip(nums)


def test_empty_file():
    nums = np.zeros(0, dtype=np.float32)
    data = simple_compress(nums, CFG)
    decoded, _ = simple_decompress(data)
    assert len(decoded) == 0


@pytest.mark.parametrize("n", [1, 2, 255, 256, 257, 511, 512, 513, 1000])
def test_sizes(n):
    rng = np.random.default_rng(n)
    nums = rng.integers(-(10**9), 10**9, n).astype(np.int64)
    round_trip(nums)


@pytest.mark.parametrize("order", [1, 2, 7])
def test_consecutive_orders(order):
    rng = np.random.default_rng(order)
    nums = np.cumsum(rng.integers(0, 10, 2000)).astype(np.int32)
    round_trip(nums, cfg(delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, order)))


def test_lookback():
    base = np.array([11, 27, 6, 3, 8, 101, 9, 0, 3, 5], dtype=np.uint32)
    nums = np.tile(base, 300)
    round_trip(nums, cfg(delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK)))


@pytest.mark.parametrize("order", [2, 6])
def test_conv1(order):
    xm1, xm2 = 0.0, 0.0
    nums = []
    for i in range(2000):
        x = xm1 * 1.99 - xm2 + ((i * 47) % 77 - 38)
        nums.append(int(x + 10000.0))
        xm2, xm1 = xm1, x
    nums = np.array(nums, dtype=np.int32)
    round_trip(nums, cfg(delta_spec=DeltaSpec(DeltaSpec.TRY_CONV1, order)))


def test_int_mult():
    rng = np.random.default_rng(7)
    nums = (rng.integers(0, 1000, 3000) * 1000 + rng.integers(0, 2, 3000)).astype(np.int64)
    round_trip(nums)


def test_float_mult_auto():
    rng = np.random.default_rng(8)
    nums = (rng.integers(0, 1000, 3000) * 0.1).astype(np.float64)
    round_trip(nums)


def test_float_quant_auto():
    rng = np.random.default_rng(9)
    nums = rng.integers(0, 4000, 3000).astype(np.float32).astype(np.float64)
    round_trip(nums)


def test_try_dict():
    rng = np.random.default_rng(10)
    vals = np.array([8924659283, 234897984367, 9827358920], dtype=np.uint64)
    nums = vals[rng.integers(0, 3, 3000)]
    round_trip(nums, cfg(mode_spec=ModeSpec(ModeSpec.TRY_DICT), delta_spec=DeltaSpec(DeltaSpec.NO_OP)))


def test_extremes():
    for dtype in [np.int64, np.float64, np.uint32]:
        if np.dtype(dtype).kind == "f":
            nums = np.array(
                [np.inf, -np.inf, np.nan, 0.0, -0.0, np.finfo(dtype).max, np.finfo(dtype).min] * 50,
                dtype=dtype,
            )
        else:
            info = np.iinfo(dtype)
            nums = np.array([info.min, info.max, 0, 1, -1 if info.min < 0 else 2] * 50, dtype=dtype)
        round_trip(nums)


def test_sparse():
    nums = np.zeros(2000, dtype=np.float32)
    nums[137] = 1.5
    round_trip(nums)


def test_multi_chunk_paging():
    rng = np.random.default_rng(11)
    nums = rng.integers(0, 10**6, 1500).astype(np.int64)
    data = round_trip(nums, cfg(paging_spec=PagingSpec.equal_pages_up_to(400)))
    assert len(data) > 0


def test_level_0_and_12():
    rng = np.random.default_rng(12)
    nums = np.cumsum(rng.integers(-5, 6, 2000)).astype(np.int32)
    for level in (0, 4, 12):
        round_trip(nums, cfg(compression_level=level))


def test_ans_size_log_cap():
    """TPU-profile ans_size_log cap: files stay standard pco (decode with
    the normal path), tables shrink to the cap, ratio cost is small, and
    the device-train planner makes identical metadata under the cap."""
    import pcodec_tpu.codec.compress as cmp
    from pcodec_tpu.dtypes import number_type_from_np

    rng = np.random.default_rng(77)
    nums = np.cumsum(rng.integers(0, 120, 200_000)).astype(np.int64)
    plain = round_trip(nums)
    capped = round_trip(nums, cfg(ans_size_log_cap=7))
    # small ratio cost from coarser weight quantization
    assert len(capped) <= len(plain) * 1.02
    nt = number_type_from_np(np.dtype(np.int64))
    cc = cmp.chunk_compressor(nt, nums, cfg(ans_size_log_cap=7))
    for key in ("delta", "primary", "secondary"):
        m = cc.meta.per_latent_var.get(key)
        if m is not None:
            assert m.ans_size_log <= 7, key
    # cap below the bin count: quantize_weights raises size_log to fit
    many = rng.integers(0, 1 << 14, 100_000).astype(np.int64)
    round_trip(many, cfg(ans_size_log_cap=1))
    # invalid caps rejected
    with pytest.raises(Exception):
        cfg(ans_size_log_cap=0).validate(number_type_from_np(np.dtype(np.int64)).latent)
    with pytest.raises(Exception):
        cfg(ans_size_log_cap=15).validate(number_type_from_np(np.dtype(np.int64)).latent)


def test_ans_cap_device_train_meta_matches_host():
    """The cap applies at final training only, so the device-train planner
    and the host pipeline still emit byte-identical chunk metadata."""
    from pcodec_tpu.format.bitio import BitWriter
    from pcodec_tpu.ops.device_train import plan_encode_device
    import pcodec_tpu.codec.compress as cmp
    from pcodec_tpu.dtypes import number_type_from_np

    rng = np.random.default_rng(78)
    x = np.cumsum(rng.integers(0, 120, 131072)).astype(np.int64)
    config = cfg(ans_size_log_cap=7)
    planned = plan_encode_device(x, config, 256, 131072)
    assert planned is not None
    nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
    assert chunk_jobs[0][0] == "device"
    host_cc = cmp.chunk_compressor(
        nt, x[: chunk_ns[0]],
        cfg(ans_size_log_cap=7,
            paging_spec=PagingSpec.exact_pages([256] * (chunk_ns[0] // 256))))
    wd, wh = BitWriter(), BitWriter()
    ccs[0].write_meta(wd)
    host_cc.write_meta(wh)
    assert wd.to_bytes() == wh.to_bytes()
    assert host_cc.meta.per_latent_var.get("primary").ans_size_log <= 7


def test_reference_python_module_shape():
    """Drop-in module shape of the reference pco_python binding
    (ref: pco_python/src/lib.rs:17-53): top-level config classes +
    pcodec.standalone functions + pcodec.wrapped classes, with the
    reference's return conventions (simple_decompress -> array | None)."""
    import pcodec_tpu as pcodec

    for name in ("ChunkConfig", "ModeSpec", "DeltaSpec", "PagingSpec",
                 "Progress", "DEFAULT_COMPRESSION_LEVEL", "__version__"):
        assert hasattr(pcodec, name), name
    x = np.arange(500, dtype=np.int64)
    blob = pcodec.standalone.simple_compress(x, pcodec.ChunkConfig())
    out = pcodec.standalone.simple_decompress(blob)
    np.testing.assert_array_equal(out, x)
    dst = np.zeros(500, dtype=np.int64)
    prog = pcodec.standalone.simple_decompress_into(blob, dst)
    assert prog.finished and prog.n_processed == 500
    np.testing.assert_array_equal(dst, x)
    # terminator-only file -> None (reference returns PyNone)
    empty = pcodec.standalone.simple_compress(np.zeros(0, dtype=np.int64),
                                              pcodec.ChunkConfig())
    assert pcodec.standalone.simple_decompress(empty) is None
    # guarantee helpers under the standalone module
    from pcodec_tpu.dtypes import number_type_from_np
    lt = number_type_from_np(np.dtype(np.int64)).latent
    assert pcodec.standalone.chunk_size(lt, 500) >= len(blob) - 50
    for name in ("FileCompressor", "ChunkCompressor", "FileDecompressor",
                 "ChunkDecompressor"):
        assert hasattr(pcodec.wrapped, name), name
