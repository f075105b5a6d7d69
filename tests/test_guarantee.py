"""Size guarantees: compressed output never exceeds the documented bounds
even with adversarial configs (modeled on ref: wrapped/guarantee.rs:61-103,
standalone/guarantee.rs:64-91)."""

import numpy as np

from pcodec_tpu import ChunkConfig, DeltaSpec, ModeSpec, PagingSpec, simple_compress
from pcodec_tpu.codec import guarantee
from pcodec_tpu.dtypes import number_type_from_np


def check_file_guarantee(nums, config):
    data = simple_compress(nums, config)
    nt = number_type_from_np(nums.dtype)
    bound = guarantee.standalone_file_size(nt.latent, len(nums), config.paging_spec)
    assert len(data) <= bound, f"{len(data)} > {bound}"


def test_file_guarantee_empty():
    check_file_guarantee(np.zeros(0, dtype=np.int32), ChunkConfig())


def test_file_guarantee_uniform_random():
    rng = np.random.default_rng(0)
    nums = rng.integers(0, np.iinfo(np.uint32).max, 100, dtype=np.uint32)
    cfg = ChunkConfig(paging_spec=PagingSpec.equal_pages_up_to(10))
    check_file_guarantee(nums, cfg)


def test_file_guarantee_antagonistic():
    rng = np.random.default_rng(7)
    nums = (rng.random(300) * 2.0 - 1.0).astype(np.float32)
    cfg = ChunkConfig(
        mode_spec=ModeSpec(ModeSpec.TRY_FLOAT_MULT, 0.1),
        delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, 5),
        paging_spec=PagingSpec.equal_pages_up_to(10),
    )
    check_file_guarantee(nums, cfg)


def test_header_guarantee():
    from pcodec_tpu.codec.standalone import write_header
    from pcodec_tpu.dtypes import NUMBER_TYPES_BY_NAME
    from pcodec_tpu.format.bitio import BitWriter

    w = BitWriter()
    write_header(w, n_hint=2**63, uniform_type=NUMBER_TYPES_BY_NAME["f64"])
    assert w.byte_len() <= guarantee.standalone_header_size()
