"""Decode the reference's 13 pinned binary assets bit-exactly.

Expected values are regenerated with the same deterministic formulas as the
reference's compatibility tests (ref: pco/src/tests/compatibility.rs) — this
is the primary bit-exactness oracle for the decoder.
"""

import os

import numpy as np
import pytest

from pcodec_tpu.codec.standalone import simple_decompress

ASSET_DIR = "/root/reference/pco/assets"


def load(name):
    with open(os.path.join(ASSET_DIR, name), "rb") as f:
        return f.read()


def assert_exact(decoded: np.ndarray, expected: np.ndarray):
    assert decoded.dtype == expected.dtype
    assert len(decoded) == len(expected)
    if decoded.dtype.kind == "f":
        mism = decoded.view(np.uint64 if decoded.dtype.itemsize == 8 else
                            np.uint32 if decoded.dtype.itemsize == 4 else np.uint16) != \
               expected.view(decoded.view(np.uint8).dtype if False else (
                   np.uint64 if decoded.dtype.itemsize == 8 else
                   np.uint32 if decoded.dtype.itemsize == 4 else np.uint16))
        bad = np.nonzero(mism)[0]
    else:
        bad = np.nonzero(decoded != expected)[0]
    assert len(bad) == 0, f"first mismatch at {bad[:5]}: {decoded[bad[:5]]} != {expected[bad[:5]]}"


def pseudorandom_f16s():
    """ref: compatibility.rs generate_pseudorandom_f16s (exact f32 arithmetic)."""
    num = np.float32(0.1)
    out = []
    for _ in range(2000):
        num = np.float32(np.float32(num * np.float32(77.7)) + np.float32(0.1)) % np.float32(2.0)
        if num < np.float32(1.0):
            out.append(np.float16(np.float32(-1.0) - num))
        else:
            out.append(np.float16(num))
    return np.array(out, dtype=np.float16)


def test_v0_0_0_classic():
    expected = np.array(list(range(0, 1000)) + list(range(2000, 3000)), dtype=np.int32)
    decoded, _ = simple_decompress(load("v0_0_0_classic.pco"))
    assert_exact(decoded, expected)


def test_v0_0_0_delta_float_mult():
    nums = np.arange(2000, dtype=np.float32)
    nums[1337] = np.float32(nums[1337] + np.float32(1.001))
    decoded, _ = simple_decompress(load("v0_0_0_delta_float_mult.pco"))
    assert_exact(decoded, nums)


def test_v0_1_0_delta_int_mult():
    nums = (np.arange(2000, dtype=np.int32) * 1000).astype(np.int32)
    nums[1337] -= 1
    decoded, _ = simple_decompress(load("v0_1_0_delta_int_mult.pco"))
    assert_exact(decoded, nums)


def test_v0_1_1_standalone_versioned():
    decoded, _ = simple_decompress(load("v0_1_1_standalone_versioned.pco"))
    assert len(decoded) == 0


def test_v0_3_0_f16():
    expected = pseudorandom_f16s()
    decoded, _ = simple_decompress(load("v0_3_0_f16.pco"))
    assert_exact(decoded, expected)


def test_v0_3_0_float_quant():
    f16s = pseudorandom_f16s()
    xs = f16s.astype(np.float32)
    bits = xs.view(np.uint32)
    bump = np.abs(xs) < np.float32(1.1)
    bits = np.where(bump, bits + 1, bits)
    expected = bits.view(np.float32)
    decoded, _ = simple_decompress(load("v0_3_0_float_quant.pco"))
    assert_exact(decoded, expected)


def test_v0_4_0_lookback_delta():
    base = np.array(
        [1121827092, 729032807, 3968137854, 2875434067, 3775328080, 431649926,
         1048116090, 1906978350, 14752788, 1180462487],
        dtype=np.uint32,
    )
    expected = np.tile(base, 100)
    decoded, _ = simple_decompress(load("v0_4_0_lookback_delta.pco"))
    assert_exact(decoded, expected)


def test_v0_4_5_uniform_type():
    expected = np.array([1, 2, 3, 4, 5], dtype=np.uint32)
    decoded, _ = simple_decompress(load("v0_4_5_uniform_type.pco"))
    assert_exact(decoded, expected)


def test_v0_4_8_minor_version():
    expected = np.array([1, 2, 3, 4, 5], dtype=np.uint32)
    decoded, _ = simple_decompress(load("v0_4_8_minor_version.pco"))
    assert_exact(decoded, expected)


def test_v1_0_0_dict():
    expected = np.tile(
        np.array([8924659283, 234897984367, 9827358920], dtype=np.uint64), 1000
    )
    decoded, _ = simple_decompress(load("v1_0_0_dict.pco"))
    assert_exact(decoded, expected)


def test_v1_0_0_conv1():
    xm1 = np.float32(0.0)
    xm2 = np.float32(0.0)
    nums = []
    for i in range(2000):
        x = np.float32(
            np.float32(np.float32(xm1 * np.float32(1.99)) - xm2)
            + np.float32((i * 47) % 77 - 38)
        )
        nums.append(int(np.trunc(np.float32(x + np.float32(10000.0)))))
        xm2 = xm1
        xm1 = x
    expected = np.array(nums, dtype=np.int32)
    decoded, _ = simple_decompress(load("v1_0_0_conv1.pco"))
    assert_exact(decoded, expected)


def test_v1_0_0_u8():
    expected = np.array(list(range(0, 65)) + list(range(192, 256)), dtype=np.uint8)
    decoded, _ = simple_decompress(load("v1_0_0_u8.pco"))
    assert_exact(decoded, expected)


def test_v1_0_0_i8():
    expected = np.array(list(range(-128, -63)) + list(range(64, 128)), dtype=np.int8)
    decoded, _ = simple_decompress(load("v1_0_0_i8.pco"))
    assert_exact(decoded, expected)
