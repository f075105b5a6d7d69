"""Number / latent type system with vectorized order-preserving bijections.

Every Pco number type maps to an unsigned "latent" type of the same width via
an order-preserving bijection (ref: pco/src/data_types/float.rs:370-451,
signed.rs:88-91, unsigned.rs:118-120; spec: docs/format.md "Modes").

All transforms here are vectorized numpy; the same formulas are reimplemented
in jnp inside pcodec_tpu/ops for the device path.
"""

from dataclasses import dataclass

import numpy as np

__all__ = [
    "LatentType",
    "NumberType",
    "LATENT_TYPES",
    "NUMBER_TYPES",
    "NUMBER_TYPES_BY_BYTE",
    "NUMBER_TYPES_BY_NAME",
    "U8", "U16", "U32", "U64",
]


@dataclass(frozen=True)
class LatentType:
    """An unsigned integer type used for all bitwise codec logic."""

    bits: int
    np_dtype: np.dtype
    conv_dtype: np.dtype  # signed widening type for conv1 arithmetic

    @property
    def mid(self) -> int:
        return 1 << (self.bits - 1)

    @property
    def max(self) -> int:
        return (1 << self.bits) - 1

    # number of bits used to encode a bin's offset_bits field
    # (ref: pco/src/bits.rs:17-19)
    @property
    def offset_bits_bits(self) -> int:
        return self.bits.bit_length()

    def to_signed_f64(self, arr: np.ndarray) -> np.ndarray:
        """Interpret latents as centered signed values, as f64."""
        return arr.view(self.np_dtype).astype(np.int64).astype(np.float64)


U8 = LatentType(8, np.dtype(np.uint8), np.dtype(np.int16))
U16 = LatentType(16, np.dtype(np.uint16), np.dtype(np.int32))
U32 = LatentType(32, np.dtype(np.uint32), np.dtype(np.int64))
# 64-bit conv1 is rejected at config validation, so conv_dtype is unused there
U64 = LatentType(64, np.dtype(np.uint64), np.dtype(np.int64))

LATENT_TYPES = {8: U8, 16: U16, 32: U32, 64: U64}

_FLOAT_INFO = {
    # name -> (mantissa_digits, exp_offset)
    "f16": (11, 15),
    "f32": (24, 127),
    "f64": (53, 1023),
}


@dataclass(frozen=True)
class NumberType:
    """A user-facing number type: f16/f32/f64, i8..i64, u8..u64."""

    name: str
    type_byte: int  # wire discriminant (ref: docs/format.md number type table)
    np_dtype: np.dtype
    latent: LatentType
    kind: str  # "float" | "signed" | "unsigned"

    # ---------------- order-preserving bijection ----------------

    def to_latent_ordered(self, nums: np.ndarray) -> np.ndarray:
        nums = np.ascontiguousarray(nums, dtype=self.np_dtype)
        L = self.latent.np_dtype
        if self.kind == "unsigned":
            return nums.copy()
        if self.kind == "signed":
            # wrapping_sub(MIN) == toggle top bit
            return (nums.view(L) ^ L.type(self.latent.mid)).copy()
        bits = nums.view(L)
        sign = L.type(self.latent.mid)
        neg = (bits & sign) != 0
        return np.where(neg, ~bits, bits ^ sign)

    def from_latent_ordered(self, latents: np.ndarray) -> np.ndarray:
        latents = np.ascontiguousarray(latents, dtype=self.latent.np_dtype)
        L = self.latent.np_dtype
        if self.kind == "unsigned":
            return latents.copy()
        if self.kind == "signed":
            return (latents ^ L.type(self.latent.mid)).view(self.np_dtype).copy()
        sign = L.type(self.latent.mid)
        pos = (latents & sign) != 0
        bits = np.where(pos, latents ^ sign, ~latents)
        return bits.view(self.np_dtype).copy()

    # ---------------- float-specific helpers ----------------

    @property
    def mantissa_digits(self) -> int:
        return _FLOAT_INFO[self.name][0]

    @property
    def precision_bits(self) -> int:
        return self.mantissa_digits - 1

    @property
    def exp_offset(self) -> int:
        return _FLOAT_INFO[self.name][1]

    def exponent(self, nums: np.ndarray) -> np.ndarray:
        """Float exponent, e.g. 0 for values in [1, 2). Vectorized."""
        bits = np.abs(nums).view(self.latent.np_dtype)
        return (bits >> self.latent.np_dtype.type(self.precision_bits)).astype(
            np.int64
        ) - self.exp_offset

    def exp2(self, power: int) -> np.generic:
        """2^power as this float type via direct bit construction.

        ref: pco/src/data_types/float.rs impl_float exp2
        """
        L = self.latent.np_dtype
        # match Rust's `(exp_offset + power) as uN` wrapping cast exactly —
        # out-of-range powers intentionally produce inf/garbage bit patterns
        raw = ((self.exp_offset + power) & self.latent.max) << self.precision_bits
        bits = L.type(raw & self.latent.max)
        return np.asarray(bits).view(self.np_dtype)[()]

    def int_float_to_latent(self, x: np.ndarray) -> np.ndarray:
        """Map "integer-valued" floats to latents preserving order.

        ref: pco/src/data_types/float.rs:231-246 (generalized precision ints)
        """
        L = self.latent.np_dtype
        x = np.ascontiguousarray(x, dtype=self.np_dtype)
        ab = np.abs(x)
        gpi = 1 << self.mantissa_digits
        gpi_float = self.np_dtype.type(gpi)
        small = ab < gpi_float
        # conversion of |x| < 2^mantissa_digits to int is exact
        with np.errstate(invalid="ignore"):
            small_int = np.where(small, ab, 0).astype(L)
        gpi_float_bits = np.asarray(gpi_float).view(L)
        big_int = L.type(gpi) + (ab.view(L) - gpi_float_bits)
        abs_int = np.where(small, small_int, big_int)
        mid = L.type(self.latent.mid)
        pos = ~np.signbit(x)
        return np.where(pos, mid + abs_int, mid - L.type(1) - abs_int)

    def int_float_from_latent(self, l: np.ndarray) -> np.ndarray:
        """Inverse of int_float_to_latent. ref: float.rs:210-229."""
        L = self.latent.np_dtype
        l = np.ascontiguousarray(l, dtype=L)
        mid = L.type(self.latent.mid)
        negative = l < mid
        abs_int = np.where(negative, (mid - L.type(1)) - l, l - mid)
        gpi = 1 << self.mantissa_digits
        small = abs_int < L.type(gpi)
        small_float = np.where(small, abs_int, 0).astype(self.np_dtype)
        gpi_float_bits = np.asarray(self.np_dtype.type(gpi)).view(L)
        big_float = (gpi_float_bits + (abs_int - L.type(gpi))).view(self.np_dtype)
        abs_float = np.where(small, small_float, big_float)
        return np.where(negative, -abs_float, abs_float)

    def trailing_zeros(self, nums: np.ndarray) -> np.ndarray:
        """Count of trailing zero bits of the float's bit pattern."""
        bits = np.ascontiguousarray(nums, dtype=self.np_dtype).view(self.latent.np_dtype)
        return _trailing_zeros_uint(bits, self.latent.bits)


def _trailing_zeros_uint(bits: np.ndarray, width: int) -> np.ndarray:
    """Vectorized trailing_zeros; zeros map to `width`."""
    out = np.full(bits.shape, width, dtype=np.int64)
    x = bits.astype(np.uint64)
    nz = x != 0
    lsb = (x & (~x + np.uint64(1))).astype(np.uint64)
    # log2 of a power of 2 (exact for < 2^53; handle the 2^63 case separately)
    f = lsb.astype(np.float64)
    tz = np.where(
        lsb == np.uint64(1 << 63),
        63,
        np.log2(np.where(nz, f, 1.0)).astype(np.int64),
    )
    out[nz] = tz[nz]
    return out


def leading_zeros_uint(bits: np.ndarray, width: int) -> np.ndarray:
    """Vectorized leading_zeros for unsigned arrays of the given bit width."""
    x = np.ascontiguousarray(bits).astype(np.uint64)
    # bit_length via float exponent would lose precision >= 2^53; do it in two halves
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = x.astype(np.uint32)
    bl_hi = _bit_length_u32(hi)
    bl_lo = _bit_length_u32(lo)
    bit_length = np.where(hi != 0, bl_hi + 32, bl_lo)
    return width - bit_length


def _bit_length_u32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    f = x.astype(np.float64)
    bl = np.where(x == 0, 0, np.floor(np.log2(np.where(x == 0, 1, f))).astype(np.int64) + 1)
    return bl


NUMBER_TYPES = [
    NumberType("u32", 1, np.dtype(np.uint32), U32, "unsigned"),
    NumberType("u64", 2, np.dtype(np.uint64), U64, "unsigned"),
    NumberType("i32", 3, np.dtype(np.int32), U32, "signed"),
    NumberType("i64", 4, np.dtype(np.int64), U64, "signed"),
    NumberType("f32", 5, np.dtype(np.float32), U32, "float"),
    NumberType("f64", 6, np.dtype(np.float64), U64, "float"),
    NumberType("u16", 7, np.dtype(np.uint16), U16, "unsigned"),
    NumberType("i16", 8, np.dtype(np.int16), U16, "signed"),
    NumberType("f16", 9, np.dtype(np.float16), U16, "float"),
    NumberType("u8", 10, np.dtype(np.uint8), U8, "unsigned"),
    NumberType("i8", 11, np.dtype(np.int8), U8, "signed"),
]

NUMBER_TYPES_BY_BYTE = {t.type_byte: t for t in NUMBER_TYPES}
NUMBER_TYPES_BY_NAME = {t.name: t for t in NUMBER_TYPES}


def number_type_from_np(dtype) -> NumberType:
    dtype = np.dtype(dtype)
    for t in NUMBER_TYPES:
        if t.np_dtype == dtype:
            return t
    raise KeyError(f"unsupported numpy dtype {dtype}")
