"""Wrapped-format round trips with multi-page chunks and interleaved
custom bytes (modeled on ref: pco/src/tests/low_level.rs)."""

import numpy as np
import pytest

from pcodec_tpu import ChunkConfig, DeltaSpec, PagingSpec
from pcodec_tpu.codec import wrapped
from pcodec_tpu.format.bitio import BitReader, BitWriter


def wrapped_round_trip(nums, config, interleave=b""):
    fc = wrapped.FileCompressor()
    writer = BitWriter()
    writer.write_aligned_bytes(interleave)
    fc.write_header(writer)
    cc = fc.chunk_compressor(nums, config)
    n_per_page = cc.n_per_page()
    writer.write_aligned_bytes(interleave)
    cc.write_meta(writer)
    for i in range(len(n_per_page)):
        writer.write_aligned_bytes(interleave)
        cc.write_page(i, writer)
    data = writer.to_bytes()

    reader = BitReader(data)
    assert reader.read_aligned_bytes(len(interleave)) == interleave
    fd = wrapped.FileDecompressor.new(reader)
    assert reader.read_aligned_bytes(len(interleave)) == interleave
    cd = fd.chunk_decompressor(reader, nums.dtype)
    out = []
    for page_n in n_per_page:
        assert reader.read_aligned_bytes(len(interleave)) == interleave
        pd = cd.page_decompressor(reader, page_n)
        dst = np.zeros(page_n, dtype=nums.dtype)
        got = pd.read(dst)
        assert got == page_n
        out.append(dst)
    decoded = np.concatenate(out)
    np.testing.assert_array_equal(decoded, nums)
    return data


@pytest.mark.parametrize("delta", [DeltaSpec(DeltaSpec.NO_OP), DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, 2)])
def test_wrapped_multi_page(delta):
    rng = np.random.default_rng(0)
    nums = np.cumsum(rng.integers(-4, 6, 2000)).astype(np.int64)
    cfg = ChunkConfig(delta_spec=delta, paging_spec=PagingSpec.equal_pages_up_to(600))
    wrapped_round_trip(nums, cfg, interleave=b"CUSTOM!")


def test_wrapped_lookback_multi_page():
    base = np.array([5, 6, 99, 5, 6, 1, 2, 99], dtype=np.uint32)
    nums = np.tile(base, 250)
    cfg = ChunkConfig(
        delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK),
        paging_spec=PagingSpec.equal_pages_up_to(700),
    )
    wrapped_round_trip(nums, cfg)


def test_wrapped_partial_batch_reads():
    rng = np.random.default_rng(3)
    nums = rng.integers(0, 1000, 700).astype(np.int32)
    cfg = ChunkConfig(paging_spec=PagingSpec.equal_pages_up_to(700))
    fc = wrapped.FileCompressor()
    writer = BitWriter()
    fc.write_header(writer)
    cc = fc.chunk_compressor(nums, cfg)
    cc.write_meta(writer)
    cc.write_page(0, writer)
    reader = BitReader(writer.to_bytes())
    fd = wrapped.FileDecompressor.new(reader)
    cd = fd.chunk_decompressor(reader, nums.dtype)
    pd = cd.page_decompressor(reader, 700)
    # read in 256-multiples then the ragged tail
    d1 = np.zeros(512, dtype=np.int32)
    assert pd.read(d1) == 512
    d2 = np.zeros(256, dtype=np.int32)
    assert pd.read(d2) == 188
    np.testing.assert_array_equal(np.concatenate([d1, d2[:188]]), nums)
