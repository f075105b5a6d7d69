"""Worst-case size guarantees (ref: pco/src/wrapped/guarantee.rs,
standalone/guarantee.rs)."""

import numpy as np

from pcodec_tpu import constants as c
from pcodec_tpu.dtypes import LatentType
from pcodec_tpu.format.metadata import (
    Bins,
    ChunkLatentVarMeta,
    ChunkMeta,
    DeltaEncoding,
    Mode,
    PerLatentVar,
)


def wrapped_header_size() -> int:
    return 2


def baseline_chunk_meta(latent_type: LatentType) -> ChunkMeta:
    bins = Bins(
        latent_type,
        np.array([1], dtype=np.uint32),
        np.zeros(1, dtype=latent_type.np_dtype),
        np.array([latent_type.bits], dtype=np.uint32),
    )
    return ChunkMeta(
        Mode(Mode.CLASSIC),
        DeltaEncoding.noop(),
        PerLatentVar(None, ChunkLatentVarMeta(0, bins), None),
        latent_type,
    )


def wrapped_chunk_size(latent_type: LatentType, n: int) -> int:
    return baseline_chunk_meta(latent_type).max_size() + (n * latent_type.bits + 7) // 8


def standalone_header_size() -> int:
    max_varint_bits = c.BITS_TO_ENCODE_VARINT_POWER + 64
    return (
        len(c.MAGIC_HEADER)
        + 1
        + (max_varint_bits + c.BITS_TO_ENCODE_STANDALONE_VERSION + 7) // 8
        + wrapped_header_size()
    )


def standalone_chunk_size(latent_type: LatentType, n: int) -> int:
    return 1 + (c.BITS_TO_ENCODE_N_ENTRIES + 7) // 8 + wrapped_chunk_size(latent_type, n)


def standalone_file_size(latent_type: LatentType, n: int, paging_spec) -> int:
    n_per_chunk = paging_spec.n_per_page(n)
    return (
        standalone_header_size()
        + sum(standalone_chunk_size(latent_type, cn) for cn in n_per_chunk)
        + 1
    )
