"""Python side of the C ABI (native/cpcodec.cpp).

Pointer-based entry points called from the embedded interpreter; the C shim
owns the buffers (caller-allocates, like the reference's pco_c surface,
ref: pco_c/src/lib.rs:128-195).
"""

import ctypes

import numpy as np

from pcodec_tpu.codec.chunk_config import ChunkConfig, PagingSpec
from pcodec_tpu.codec.guarantee import standalone_file_size
from pcodec_tpu.codec.standalone import simple_compress, simple_decompress_into
from pcodec_tpu.dtypes import NUMBER_TYPES_BY_BYTE
from pcodec_tpu.errors import CorruptionError, InsufficientDataError, InvalidArgumentError

PCO_INVALID_ARGUMENT = 1
PCO_COMPRESSION_ERROR = 2
PCO_DECOMPRESSION_ERROR = 3
PCO_INSUFFICIENT_DATA = 4


def guarantee_file_size(number_type_byte: int, n: int) -> int:
    nt = NUMBER_TYPES_BY_BYTE[number_type_byte]
    return standalone_file_size(nt.latent, n, PagingSpec())


def _array_from_ptr(ptr: int, n: int, np_dtype) -> np.ndarray:
    buf = (ctypes.c_char * (n * np.dtype(np_dtype).itemsize)).from_address(ptr)
    return np.frombuffer(buf, dtype=np_dtype, count=n)


def simple_compress_ptr(src_ptr: int, n: int, number_type_byte: int,
                        compression_level: int) -> bytes:
    nt = NUMBER_TYPES_BY_BYTE[number_type_byte]
    nums = _array_from_ptr(src_ptr, n, nt.np_dtype)
    cfg = ChunkConfig(compression_level=compression_level, enable_8_bit=True)
    return simple_compress(nums, cfg)


def peek_and_decompress(src: bytes):
    """Decompress a whole standalone file without a priori type/count
    knowledge (the Java binding's simple_decompress surface).

    Returns (number_type_byte, raw_bytes) or (0, b"") when the file holds no
    chunks (type unknowable — mirrors the reference's Optional.empty,
    ref: pco_java/src/main/rust/src/lib.rs:98-116)."""
    from pcodec_tpu.codec.standalone import simple_decompress

    arr, nt = simple_decompress(src)
    if nt is None:
        return 0, b""
    return nt.type_byte, np.ascontiguousarray(arr).tobytes()


def simple_decompress_ptr(src: bytes, number_type_byte: int, dst_ptr: int,
                          dst_capacity_elems: int) -> int:
    """Returns elements written, or -error_code."""
    nt = NUMBER_TYPES_BY_BYTE[number_type_byte]
    dst_buf = (ctypes.c_char * (dst_capacity_elems * nt.np_dtype.itemsize)).from_address(dst_ptr)
    dst = np.frombuffer(dst_buf, dtype=nt.np_dtype, count=dst_capacity_elems)
    try:
        progress = simple_decompress_into(src, dst)
    except InsufficientDataError:
        return -PCO_INSUFFICIENT_DATA
    except CorruptionError:
        return -PCO_DECOMPRESSION_ERROR
    except InvalidArgumentError:
        return -PCO_INVALID_ARGUMENT
    return int(progress.n_processed)
