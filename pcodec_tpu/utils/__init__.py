import numpy as np


def concat(arrays, dtype=None):
    """np.concatenate replacement: this environment's numpy concatenate is
    pathologically slow (~7 MB/s); preallocated slice copies run at memory
    speed."""
    arrays = [a for a in arrays]
    if not arrays:
        return np.zeros(0, dtype=dtype or np.float64)
    total = sum(len(a) for a in arrays)
    out = np.empty(total, dtype=dtype or arrays[0].dtype)
    pos = 0
    for a in arrays:
        out[pos : pos + len(a)] = a
        pos += len(a)
    return out


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Rust's f32/f64 `.round()`: half away from zero, exact (no +0.5 trick)."""
    t = np.trunc(x)
    frac = x - t
    bump = np.where(np.abs(frac) >= x.dtype.type(0.5), np.sign(x), x.dtype.type(0))
    return (t + bump).astype(x.dtype)


def bits_to_encode_offset(max_offset: int) -> int:
    """L::BITS - leading_zeros(max_offset) (ref: pco/src/bits.rs:12-14)."""
    return int(max_offset).bit_length()


def calc_max_bytes(precision: int) -> int:
    """Window bytes needed to read `precision`-bit values (ref: read_write_uint.rs:9-17)."""
    if precision == 0:
        return 0
    return (precision + 14) // 8
