"""PCT container: the production wrapped-format deployment of Pco on TPU.

A `.pct` file embeds a 100%-standard Pco *wrapped* stream (the same bytes the
reference's wrapped API produces — ref: pco/src/wrapped/file_compressor.rs,
docs/format.md "wrapped or standalone") inside an outer container that stores
what the wrapped design intentionally delegates to the outer format
(ref: README.md:88-98): per-page byte ranges and counts.  On top of that it
stores a small *device-decode directory* — per (page, latent var, batch) ANS
section bit lengths — which lets every 256-number batch section be located
without walking the serial ANS stream, so a TPU kernel can decode tens of
thousands of pages as independent interleaved-tANS chains (see
pcodec_tpu/ops/pallas_decode.py).

Layout (all little-endian):
    magic  b"PCT1"
    u8     number_type byte (same encoding as standalone, ref:
           standalone/constants.rs)
    u8     flags (bit0: directory present)
    u16    reserved
    u32    page_n target (PagingSpec::EqualPagesUpTo)
    u64    n (total numbers)
    u32    n_chunks
    u64    dir_bytes
    -- directory --
    u32[n_chunks]      chunk_ns
    u32[n_chunks]      chunk_meta_bytes
    u32[total_pages]   page_bytes (page meta + body, byte-aligned)
    u16[total_entries] ans_bits  per (page, var, batch), file order
    u16[total_entries] off_bits  per (page, var, batch), file order
    -- body --
    wrapped header | chunk0 meta | chunk0 pages... | chunk1 meta | ...

Pages within a chunk are exactly page_n numbers except a final remainder
page, so per-page counts are derived, not stored (and full pages stay
aligned for the device kernels).
"""

import struct
from dataclasses import dataclass, field, replace as _dc_replace
from typing import List, Optional

import numpy as np

from pcodec_tpu import constants as c
from pcodec_tpu.codec.chunk_config import ChunkConfig, PagingSpec
from pcodec_tpu.codec.wrapped import FileCompressor, FileDecompressor
from pcodec_tpu.dtypes import NUMBER_TYPES, NumberType, number_type_from_np
from pcodec_tpu.errors import CorruptionError, InsufficientDataError, InvalidArgumentError
from pcodec_tpu.format.bitio import BitReader, BitWriter
from pcodec_tpu.format.metadata import ChunkMeta
from pcodec_tpu.utils import concat

MAGIC = b"PCT1"
HEADER_FMT = "<4sBBHIQIQ"
HEADER_BYTES = struct.calcsize(HEADER_FMT)
DEFAULT_PAGE_N = 1024
DEFAULT_CHUNK_N = 1 << 20

_NT_BY_BYTE = {t.type_byte: t for t in NUMBER_TYPES}


def _exact_split(n: int, part: int) -> List[int]:
    if n == 0:
        return []
    full, rem = divmod(n, part)
    return [part] * full + ([rem] if rem else [])


def _n_per_chunk(n: int, chunk_n: int) -> List[int]:
    return _exact_split(n, chunk_n)


@dataclass
class PageEntry:
    chunk_idx: int
    page_n: int
    byte_start: int  # absolute offset of the page (incl. page meta) in `data`
    byte_len: int
    # per var key -> (ans_bits[u16 per batch], off_bits[u16 per batch])
    sections: dict


@dataclass
class ContainerIndex:
    nt: NumberType
    n: int
    page_n_target: int
    chunk_metas: List[ChunkMeta]
    chunk_ns: np.ndarray
    chunk_meta_starts: np.ndarray  # absolute byte offset of each chunk meta
    pages: List[PageEntry]
    data: bytes


def container_compress(
    nums: np.ndarray,
    config: Optional[ChunkConfig] = None,
    page_n: int = DEFAULT_PAGE_N,
    chunk_n: int = DEFAULT_CHUNK_N,
) -> bytes:
    """Compress into the PCT container (wrapped pco + page directory)."""
    if page_n < c.FULL_BATCH_N or page_n % c.FULL_BATCH_N != 0:
        raise InvalidArgumentError(
            f"container page_n must be a positive multiple of {c.FULL_BATCH_N}"
        )
    config = config or ChunkConfig()
    nt = number_type_from_np(nums.dtype)
    chunk_ns = _n_per_chunk(len(nums), chunk_n)

    fc = FileCompressor()
    body = BitWriter()
    fc.write_header(body)

    chunk_meta_bytes = []
    page_bytes: List[int] = []
    ans_secs: List[np.ndarray] = []
    off_secs: List[np.ndarray] = []
    start = 0
    for cn in chunk_ns:
        chunk_config = _dc_replace(
            config, paging_spec=PagingSpec.exact_pages(_exact_split(cn, page_n))
        )
        cc = fc.chunk_compressor(nums[start : start + cn], chunk_config)
        start += cn
        b0 = body.byte_len()
        cc.write_meta(body)
        chunk_meta_bytes.append(body.byte_len() - b0)
        for pi in range(len(cc.n_per_page())):
            p0 = body.byte_len()
            sections = []
            cc._inner.write_page(pi, body, sections_out=sections)
            page_bytes.append(body.byte_len() - p0)
            for ans_b, off_b in sections:
                ans_secs.append(ans_b)
                off_secs.append(off_b)

    body_bytes = body.to_bytes()
    dir_parts = [
        np.asarray(chunk_ns, dtype=np.uint32).tobytes(),
        np.asarray(chunk_meta_bytes, dtype=np.uint32).tobytes(),
        np.asarray(page_bytes, dtype=np.uint32).tobytes(),
        (concat(ans_secs).astype(np.uint16) if ans_secs else np.zeros(0, np.uint16)).tobytes(),
        (concat(off_secs).astype(np.uint16) if off_secs else np.zeros(0, np.uint16)).tobytes(),
    ]
    directory = b"".join(dir_parts)
    header = struct.pack(
        HEADER_FMT,
        MAGIC,
        nt.type_byte,
        1,
        0,
        page_n,
        len(nums),
        len(chunk_ns),
        len(directory),
    )
    return header + directory + body_bytes


def parse_container(data: bytes) -> ContainerIndex:
    if len(data) < HEADER_BYTES:
        raise InsufficientDataError("container too short for header")
    magic, tb, flags, _, page_n, n, n_chunks, dir_bytes = struct.unpack(
        HEADER_FMT, data[:HEADER_BYTES]
    )
    if magic != MAGIC:
        raise CorruptionError(f"bad container magic {magic!r}")
    if tb not in _NT_BY_BYTE:
        raise CorruptionError(f"unknown number type byte {tb}")
    if not flags & 1:
        raise CorruptionError("container directory missing")
    nt = _NT_BY_BYTE[tb]

    pos = HEADER_BYTES
    end_dir = pos + dir_bytes
    if end_dir > len(data):
        raise InsufficientDataError("container directory truncated")

    def take(dtype, count):
        nonlocal pos
        nbytes = np.dtype(dtype).itemsize * count
        if pos + nbytes > end_dir:
            raise CorruptionError("container directory too short")
        arr = np.frombuffer(data, dtype=dtype, count=count, offset=pos)
        pos += nbytes
        return arr

    chunk_ns = take(np.uint32, n_chunks)
    if int(chunk_ns.sum()) != n:
        raise CorruptionError("chunk counts do not sum to n")
    chunk_meta_bytes = take(np.uint32, n_chunks)
    page_ns: List[int] = []
    pages_per_chunk: List[List[int]] = []
    for cn in chunk_ns.tolist():
        per = _exact_split(cn, page_n)
        pages_per_chunk.append(per)
        page_ns.extend(per)
    page_bytes = take(np.uint32, len(page_ns))

    # parse chunk metas from the body to learn each chunk's latent vars
    body_start = end_dir
    reader = BitReader(np.frombuffer(data, dtype=np.uint8, count=len(data) - body_start, offset=body_start))
    fd = FileDecompressor.new(reader)
    chunk_metas: List[ChunkMeta] = []
    chunk_meta_starts = np.zeros(n_chunks, dtype=np.int64)
    pages: List[PageEntry] = []
    cursor = body_start + reader.bit_idx // 8
    page_idx = 0
    # count directory entries
    total_entries = 0
    per_chunk_keys: List[List[str]] = []
    metas_tmp = []
    save_pos = pos
    # first pass: read chunk metas (need reader positioned at each meta)
    for ci, cn in enumerate(chunk_ns.tolist()):
        chunk_meta_starts[ci] = cursor
        reader.bit_idx = (cursor - body_start) * 8
        cd = fd.chunk_decompressor(reader, nt.np_dtype)
        meta = cd.meta
        got = -(-(reader.bit_idx) // 8) * 1  # bits -> not needed; trust dir
        metas_tmp.append(meta)
        keys = [k for k, _ in meta.per_latent_var.enumerated()]
        per_chunk_keys.append(keys)
        cursor += int(chunk_meta_bytes[ci])
        for pn in pages_per_chunk[ci]:
            total_entries += len(keys) * (-(-pn // c.FULL_BATCH_N))
            cursor += int(page_bytes[page_idx])
            page_idx += 1
    chunk_metas = metas_tmp
    pos = save_pos
    ans_bits = take(np.uint16, total_entries)
    off_bits = take(np.uint16, total_entries)

    # second pass: page entries with per-var sections
    cursor = chunk_meta_starts[0] if n_chunks else body_start
    eidx = 0
    page_idx = 0
    for ci in range(n_chunks):
        cursor = int(chunk_meta_starts[ci]) + int(chunk_meta_bytes[ci])
        keys = per_chunk_keys[ci]
        for pn in pages_per_chunk[ci]:
            n_batches = -(-pn // c.FULL_BATCH_N)
            sections = {}
            for key in keys:
                sections[key] = (
                    ans_bits[eidx : eidx + n_batches].astype(np.int64),
                    off_bits[eidx : eidx + n_batches].astype(np.int64),
                )
                eidx += n_batches
            pages.append(
                PageEntry(
                    chunk_idx=ci,
                    page_n=pn,
                    byte_start=cursor,
                    byte_len=int(page_bytes[page_idx]),
                    sections=sections,
                )
            )
            cursor += int(page_bytes[page_idx])
            page_idx += 1

    return ContainerIndex(
        nt=nt,
        n=n,
        page_n_target=page_n,
        chunk_metas=chunk_metas,
        chunk_ns=chunk_ns.astype(np.int64),
        chunk_meta_starts=chunk_meta_starts,
        pages=pages,
        data=data,
    )


def container_decompress(data: bytes) -> np.ndarray:
    """Host-path decompression (bit-exact reference semantics)."""
    from pcodec_tpu.codec.decompress import PageDecompressor

    idx = parse_container(data)
    out = np.zeros(idx.n, dtype=idx.nt.np_dtype)
    body_start = idx.chunk_meta_starts[0] if len(idx.chunk_metas) else None
    reader = BitReader(np.frombuffer(idx.data, dtype=np.uint8))
    pos = 0
    for page in idx.pages:
        meta = idx.chunk_metas[page.chunk_idx]
        reader.bit_idx = page.byte_start * 8
        pd = PageDecompressor(reader, meta, idx.nt, page.page_n)
        pd.read_page_fast(out[pos : pos + page.page_n])
        pos += page.page_n
    return out
