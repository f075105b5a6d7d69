"""Metadata re-serialization oracle (SURVEY §7 step 1).

Parse every reference compatibility asset into our metadata structures
(header, chunk preamble, ChunkMeta, PageMeta), re-serialize with our own
writers, and assert the rebuilt file is byte-identical to the original.
Page bodies are payload, not metadata, and are copied verbatim between the
parsed boundaries (the decoder discovers those boundaries by decoding).

ref: pco/src/metadata/chunk.rs:127-189, pco/src/standalone/compressor.rs:85-204
"""

import glob
import os

import numpy as np
import pytest

from pcodec_tpu import constants as c
from pcodec_tpu.codec.decompress import PageDecompressor
from pcodec_tpu.codec.standalone import FileDecompressor, write_varint
from pcodec_tpu.format.bitio import BitReader, BitWriter
from pcodec_tpu.format.metadata import ChunkMeta, PageMeta

ASSET_DIR = "/root/reference/pco/assets"
ASSETS = sorted(os.path.basename(p) for p in glob.glob(os.path.join(ASSET_DIR, "*.pco")))


def reserialize(data: bytes) -> bytes:
    reader = BitReader(data)
    out = BitWriter()
    fd = FileDecompressor.new(reader)

    # header: magic + (v2+: standalone version + n_hint varint; v3+ also a
    # uniform type byte before the varint) + wrapped format version
    out.write_aligned_bytes(c.MAGIC_HEADER)
    if fd.standalone_version >= 2:
        out.write_uint(fd.standalone_version, c.BITS_TO_ENCODE_STANDALONE_VERSION)
        if fd.standalone_version >= 3:
            tb = fd.uniform_type.type_byte if fd.uniform_type else c.MAGIC_TERMINATION_BYTE
            out.write_aligned_bytes(bytes([tb]))
        write_varint(fd.n_hint, out)
        out.finish_byte()
    fd.format_version.write_to(out)
    assert out.to_bytes() == data[: reader.bit_idx // 8], "header mismatch"

    while True:
        pre = fd.chunk_preamble(reader)
        if pre is None:
            out.write_aligned_bytes(bytes([c.MAGIC_TERMINATION_BYTE]))
            break
        nt, n = pre
        out.write_aligned_bytes(bytes([nt.type_byte]))
        out.write_uint(n - 1, c.BITS_TO_ENCODE_N_ENTRIES)

        meta_start = reader.bit_idx // 8
        meta = ChunkMeta.read_from(reader, fd.format_version, nt.latent)
        meta_end = reader.bit_idx // 8
        w = BitWriter()
        meta.write_to(w, fd.format_version)
        assert w.to_bytes() == data[meta_start:meta_end], "chunk meta mismatch"
        meta.write_to(out, fd.format_version)

        pm_start = reader.bit_idx
        page_meta = PageMeta.read_from(reader, meta)
        pm_end = reader.bit_idx // 8
        ans_size_logs = meta.per_latent_var.map(lambda _k, vm: vm.ans_size_log)
        w = BitWriter()
        page_meta.write_to(ans_size_logs, w)
        assert w.to_bytes() == data[pm_start // 8 : pm_end], "page meta mismatch"
        page_meta.write_to(ans_size_logs, out)

        # page body: rewind so PageDecompressor re-reads the page meta, then
        # decode to locate the chunk end; copy the body bytes verbatim
        reader.bit_idx = pm_start
        pd = PageDecompressor(reader, meta, nt, n)
        dst = np.zeros(n, dtype=nt.np_dtype)
        pd.read_page_fast(dst)
        assert reader.bit_idx % 8 == 0, "page body did not end byte-aligned"
        out.write_aligned_bytes(data[pm_end : reader.bit_idx // 8])

    return out.to_bytes()


@pytest.mark.parametrize("asset", ASSETS)
def test_asset_reserializes_byte_identically(asset):
    with open(os.path.join(ASSET_DIR, asset), "rb") as f:
        data = f.read()
    rebuilt = reserialize(data)
    assert rebuilt == data, (
        f"{asset}: rebuilt {len(rebuilt)}B != original {len(data)}B "
        f"(first diff at {next((i for i in range(min(len(rebuilt), len(data))) if rebuilt[i] != data[i]), 'len')})"
    )
