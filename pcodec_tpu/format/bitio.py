"""Little-endian bit-level I/O over numpy byte buffers.

Semantics mirror the reference bit packing exactly (LE within each byte,
components zero-padded to byte boundaries; ref: pco/src/bit_writer.rs,
bit_reader.rs, docs/format.md:5-8). Scalar paths use Python ints (metadata is
KB-scale); page bodies go through the vectorized batch paths below, and the
device path re-implements the same gather math in jnp.
"""

import numpy as np

from pcodec_tpu.errors import CorruptionError, InsufficientDataError, InvalidArgumentError

try:
    from pcodec_tpu.native import kernels as _native
except Exception:  # pragma: no cover - native build optional
    _native = None

# Trailing zero scratch so window loads never go OOB: one corrupt batch
# section can scan up to 448 bytes of ANS reads plus 2048 bytes of offset
# reads past the end before the bounds checks stop it.
_PAD = 4096


class BitWriter:
    """Appends bit-packed data to a growable numpy u8 buffer."""

    def __init__(self, initial_capacity: int = 1 << 12):
        self.buf = np.zeros(max(initial_capacity, 64), dtype=np.uint8)
        self.bit_idx = 0

    # ---------------- capacity ----------------

    def _ensure(self, nbytes: int) -> None:
        if nbytes > self.buf.size:
            new_size = max(nbytes, self.buf.size * 2)
            grown = np.zeros(new_size, dtype=np.uint8)
            grown[: self.buf.size] = self.buf
            self.buf = grown

    # ---------------- scalar writes ----------------

    def write_uint(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        s = self.bit_idx >> 3
        shift = self.bit_idx & 7
        nbytes = (shift + nbits + 7) >> 3
        self._ensure(s + nbytes + _PAD)
        chunk = value << shift
        piece = np.frombuffer(chunk.to_bytes(nbytes, "little"), dtype=np.uint8)
        self.buf[s : s + nbytes] |= piece
        self.bit_idx += nbits

    def write_bool(self, b: bool) -> None:
        self.write_uint(1 if b else 0, 1)

    def write_aligned_bytes(self, data: bytes) -> None:
        if self.bit_idx & 7:
            raise InvalidArgumentError("cannot write aligned bytes to unaligned writer")
        s = self.bit_idx >> 3
        self._ensure(s + len(data) + _PAD)
        self.buf[s : s + len(data)] = np.frombuffer(data, dtype=np.uint8)
        self.bit_idx += 8 * len(data)

    def finish_byte(self) -> None:
        self.bit_idx = (self.bit_idx + 7) & ~7

    # ---------------- vectorized batch write ----------------

    def write_batch(self, vals: np.ndarray, bitlens: np.ndarray) -> None:
        """Write vals[i] (already < 2^bitlens[i]) back to back.

        Mirrors write_short_uints/write_uints (ref:
        pco/src/chunk_latent_compressor.rs:41-81) but as a bit-position
        scatter: positions come from a prefix sum, then each value ORs its
        bytes into the buffer.
        """
        n = len(vals)
        if n == 0:
            return
        bitlens = np.asarray(bitlens, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.uint64)
        total = int(bitlens.sum())
        self._ensure(((self.bit_idx + total) >> 3) + _PAD)
        if _native is not None:
            _native.write_bits(vals, bitlens, self.bit_idx, self.buf)
            self.bit_idx += total
            return
        csum = np.cumsum(bitlens)
        bit_pos = self.bit_idx + csum - bitlens

        byte_idx = (bit_pos >> 3).astype(np.int64)
        shift = (bit_pos & 7).astype(np.uint64)
        low = vals << shift  # wraps mod 2^64
        nz = shift != 0
        hi = np.zeros_like(vals)
        hi[nz] = vals[nz] >> (np.uint64(64) - shift[nz])

        max_bits = int(bitlens.max(initial=0))
        n_bytes = min((7 + max_bits + 7) >> 3, 8)
        for b in range(n_bytes):
            np.bitwise_or.at(
                self.buf,
                byte_idx + b,
                ((low >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8),
            )
        if max_bits + 7 > 64 and hi.any():
            np.bitwise_or.at(self.buf, byte_idx + 8, (hi & np.uint64(0xFF)).astype(np.uint8))
        self.bit_idx += total

    # ---------------- output ----------------

    def byte_len(self) -> int:
        return (self.bit_idx + 7) >> 3

    def to_bytes(self) -> bytes:
        return self.buf[: self.byte_len()].tobytes()


class BitReader:
    """Reads bit-packed data from a padded numpy u8 buffer.

    `size` is the unpadded byte length; reads may scan into the zero padding
    but `check_in_bounds` raises InsufficientDataError if the cursor passed
    the unpadded end (ref: pco/src/bit_reader.rs:213-231).
    """

    def __init__(self, data: bytes | np.ndarray):
        if isinstance(data, np.ndarray):
            src = np.ascontiguousarray(data, dtype=np.uint8)
        else:
            src = np.frombuffer(data, dtype=np.uint8)
        self.size = src.size
        self.src = np.zeros(self.size + _PAD, dtype=np.uint8)
        self.src[: self.size] = src
        self._mem = self.src.tobytes()  # immutable copy for fast scalar reads
        self.bit_idx = 0

    # ---------------- bounds ----------------

    def check_in_bounds(self) -> None:
        if self.bit_idx > 8 * self.size:
            raise InsufficientDataError(
                f"out of bounds at bit {self.bit_idx} / {8 * self.size}"
            )

    # ---------------- scalar reads ----------------

    def read_uint(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        s = self.bit_idx >> 3
        shift = self.bit_idx & 7
        nbytes = (shift + nbits + 7) >> 3
        window = int.from_bytes(self._mem[s : s + nbytes], "little")
        self.bit_idx += nbits
        return (window >> shift) & ((1 << nbits) - 1)

    def read_bool(self) -> bool:
        return self.read_uint(1) != 0

    def read_aligned_bytes(self, n: int) -> bytes:
        if self.bit_idx & 7:
            raise InvalidArgumentError("cannot read aligned bytes on misaligned reader")
        s = self.bit_idx >> 3
        if s + n > self.size:
            raise InsufficientDataError("not enough bytes for aligned read")
        self.bit_idx += 8 * n
        return self._mem[s : s + n]

    def drain_empty_byte(self, message: str) -> None:
        self.check_in_bounds()
        shift = self.bit_idx & 7
        if shift != 0:
            byte = self._mem[self.bit_idx >> 3]
            if (byte >> shift) > 0:
                raise CorruptionError(message)
            self.bit_idx += 8 - shift

    # ---------------- vectorized batch read ----------------

    def gather_batch(self, bit_pos: np.ndarray, nbits: np.ndarray, max_bits: int) -> np.ndarray:
        """Gather values of up to 64 bits at arbitrary bit positions.

        The branch-free gather-by-bit-index shape of the reference's
        read_offsets (ref: pco/src/page_latent_decompressor.rs:15-44).
        """
        byte_idx = (bit_pos >> 3).astype(np.int64)
        # corrupt data can push positions past the padding; clamp (the caller's
        # post-batch bounds check then raises InsufficientDataError)
        np.clip(byte_idx, 0, self.size + _PAD - 16, out=byte_idx)
        shift = (bit_pos & 7).astype(np.uint64)
        n_bytes = min((7 + max_bits + 7) >> 3, 8)
        acc = np.zeros(byte_idx.shape, dtype=np.uint64)
        for b in range(n_bytes):
            acc |= self.src[byte_idx + b].astype(np.uint64) << np.uint64(8 * b)
        val = acc >> shift
        if max_bits + 7 > 64:
            nz = shift != 0
            if nz.any():
                hi = self.src[byte_idx + 8].astype(np.uint64)
                extra = np.zeros_like(val)
                extra[nz] = hi[nz] << (np.uint64(64) - shift[nz])
                val |= extra
        nbits = np.asarray(nbits, dtype=np.uint64)
        full = nbits >= np.uint64(64)
        mask = np.where(full, np.uint64(0xFFFFFFFFFFFFFFFF), (np.uint64(1) << nbits) - np.uint64(1))
        return val & mask
