"""Public wrapped-format API: embed Pco components in an outer container.

Mirrors the reference's wrapped API surface (ref: pco/src/wrapped/
file_compressor.rs:50-75, file_decompressor.rs:19-53,
chunk_decompressor.rs:10-81): the wrapping format may interleave its own
bytes anywhere between the header, chunk metadata, and pages, and must store
per-page number counts itself.
"""

from typing import List, Optional

import numpy as np

from pcodec_tpu.codec.chunk_config import ChunkConfig
from pcodec_tpu.codec.compress import ChunkCompressor as _ChunkCompressorImpl
from pcodec_tpu.codec.compress import chunk_compressor as _build_chunk_compressor
from pcodec_tpu.codec.decompress import PageDecompressor as _PageDecompressorImpl
from pcodec_tpu.dtypes import NumberType, number_type_from_np
from pcodec_tpu.errors import InvalidArgumentError
from pcodec_tpu.format.bitio import BitReader, BitWriter
from pcodec_tpu.format.metadata import ChunkMeta, FormatVersion


class FileCompressor:
    """Writes wrapped headers and creates chunk compressors."""

    def __init__(self, format_version: Optional[FormatVersion] = None):
        self.format_version = format_version or FormatVersion()

    def write_header(self, writer: BitWriter) -> None:
        self.format_version.write_to(writer)

    def chunk_compressor(self, nums: np.ndarray, config: Optional[ChunkConfig] = None):
        config = config or ChunkConfig()
        nt = number_type_from_np(nums.dtype)
        return ChunkCompressor(_build_chunk_compressor(nt, nums, config), nt)


class ChunkCompressor:
    """Wraps the internal compressor: write_meta once, then pages."""

    def __init__(self, inner: _ChunkCompressorImpl, nt: NumberType):
        self._inner = inner
        self.number_type = nt

    @property
    def meta(self) -> ChunkMeta:
        return self._inner.meta

    def n_per_page(self) -> List[int]:
        return self._inner.n_per_page()

    def meta_size_hint(self) -> int:
        return self._inner.meta_size_hint()

    def page_size_hint(self, page_idx: int) -> int:
        return self._inner.page_size_hint(page_idx)

    def write_meta(self, writer: BitWriter) -> None:
        self._inner.write_meta(writer)

    def write_page(self, page_idx: int, writer: BitWriter) -> None:
        self._inner.write_page(page_idx, writer)


class FileDecompressor:
    """Reads wrapped headers and creates chunk decompressors."""

    @classmethod
    def new(cls, reader: BitReader) -> "FileDecompressor":
        fd = cls()
        fd.format_version = FormatVersion.read_from(reader)
        return fd

    def chunk_decompressor(self, reader: BitReader, dtype) -> "ChunkDecompressor":
        nt = number_type_from_np(dtype)
        meta = ChunkMeta.read_from(reader, self.format_version, nt.latent)
        from pcodec_tpu import modes as modes_mod
        from pcodec_tpu.errors import CorruptionError

        if not modes_mod.mode_is_valid(nt, meta.mode):
            raise CorruptionError(
                f"invalid mode {meta.mode.kind} for number type {nt.name}"
            )
        return ChunkDecompressor(meta, nt)


class ChunkDecompressor:
    def __init__(self, meta: ChunkMeta, nt: NumberType):
        self.meta = meta
        self.number_type = nt

    def page_decompressor(self, reader: BitReader, n: int) -> "PageDecompressor":
        return PageDecompressor(_PageDecompressorImpl(reader, self.meta, self.number_type, n))


class PageDecompressor:
    """Streams one page batch-by-batch into caller-provided buffers."""

    def __init__(self, inner: _PageDecompressorImpl):
        self._inner = inner

    @property
    def n_remaining(self) -> int:
        return self._inner.n_remaining

    def read(self, dst: np.ndarray) -> int:
        """Returns the count of numbers decompressed into dst."""
        if dst.dtype != self._inner.nt.np_dtype:
            raise InvalidArgumentError(
                f"dst dtype {dst.dtype} does not match chunk type "
                f"{self._inner.nt.np_dtype}"
            )
        return self._inner.read(dst)
