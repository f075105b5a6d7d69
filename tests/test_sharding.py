"""Multi-chip sharding (parallel/sharding.py) on the virtual 8-device CPU
mesh — the same SPMD program the driver dry-runs (ref: SURVEY.md §2.5:
data parallelism over chunks/pages is the primary scaling axis)."""

import numpy as np
import pytest

import jax

from pcodec_tpu import ChunkConfig, DeltaSpec, PagingSpec, simple_compress
from pcodec_tpu.parallel.sharding import make_mesh, sharded_decode_standalone

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh (conftest)"
)


@needs_mesh
def test_sharded_standalone_decode_bit_exact():
    rng = np.random.default_rng(0)
    nums = np.cumsum(rng.integers(0, 50, 16 * 512)).astype(np.int64)
    cfg = ChunkConfig(
        delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, 1),
        paging_spec=PagingSpec.equal_pages_up_to(512),
    )
    data = simple_compress(nums, cfg)
    mesh = make_mesh(jax.devices()[:8])
    decoded = sharded_decode_standalone(data, mesh)
    np.testing.assert_array_equal(np.asarray(decoded, dtype=np.int64), nums)


@needs_mesh
def test_sharded_container_scatter_decode_bit_exact():
    # the real data path: per-device byte-range scatter, local Pallas decode,
    # gather of decoded shards — no replication of the compressed buffer
    from pcodec_tpu.codec.container import container_compress
    from pcodec_tpu.parallel.sharding import sharded_container_decode

    rng = np.random.default_rng(3)
    nums = np.cumsum(rng.integers(0, 3000, 20_000)).astype(np.int64)
    cfg = ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, 1))
    data = container_compress(nums, cfg)
    mesh = make_mesh(jax.devices()[:8])
    decoded = sharded_container_decode(data, mesh)
    np.testing.assert_array_equal(decoded, nums)


@needs_mesh
def test_mesh_shapes():
    mesh = make_mesh(jax.devices()[:8])
    assert mesh.devices.size == 8


@needs_mesh
def test_sharded_container_decode_all_modes():
    # the general sharded decode covers every launch group: multi-var
    # IntMult and the f64 FloatMult softfloat join run the kernels per
    # tile shard and the XLA post on the gathered outputs
    from pcodec_tpu.codec.container import container_compress
    from pcodec_tpu.parallel.sharding import make_mesh, sharded_container_decode

    mesh = make_mesh()
    rng = np.random.default_rng(5)
    y = (rng.integers(0, 5000, 8192) * 1000 + rng.integers(0, 3, 8192)).astype(np.int64)
    out = sharded_container_decode(container_compress(y, None, page_n=256), mesh)
    assert np.array_equal(out, y)
    z = (rng.integers(-50000, 50000, 8192) * 0.01).astype(np.float64)
    out = sharded_container_decode(container_compress(z, None, page_n=256), mesh)
    assert np.array_equal(out.view(np.uint64), z.view(np.uint64))


@needs_mesh
def test_sharded_container_encode_bit_exact():
    # SURVEY §5 encode half: EB/EC kernels run per-device on page-tile
    # shards; gathered sections assemble to the exact single-device bytes
    from pcodec_tpu.codec.container import container_compress
    from pcodec_tpu.parallel.sharding import make_mesh, sharded_container_encode

    rng = np.random.default_rng(11)
    x = np.cumsum(rng.integers(0, 120, 20000)).astype(np.int64)
    ref = container_compress(x, None, page_n=256, chunk_n=8192)
    enc, stats = sharded_container_encode(x, None, make_mesh(), page_n=256,
                                          chunk_n=8192)
    assert stats["device_chunks"] == 3
    assert enc == ref
