"""The JAX device decode path must agree bit-for-bit with the host path."""

import os

import numpy as np
import pytest

from pcodec_tpu.codec.standalone import simple_decompress

ASSET_DIR = "/root/reference/pco/assets"


def check_device_matches_host(data: bytes):
    from pcodec_tpu.ops.decode import decode_standalone_with_device

    host, _ = simple_decompress(data)
    device, _ = decode_standalone_with_device(data)
    assert device.dtype == host.dtype
    if host.dtype.kind == "f":
        w = {2: np.uint16, 4: np.uint32, 8: np.uint64}[host.dtype.itemsize]
        np.testing.assert_array_equal(device.view(w), host.view(w))
    else:
        np.testing.assert_array_equal(device, host)


@pytest.mark.parametrize("name", sorted(os.listdir(ASSET_DIR)))
def test_device_decode_assets(name):
    with open(os.path.join(ASSET_DIR, name), "rb") as f:
        data = f.read()
    check_device_matches_host(data)


def test_device_decode_synthetic():
    from pcodec_tpu import ChunkConfig, DeltaSpec, PagingSpec, simple_compress
    from dataclasses import replace

    rng = np.random.default_rng(0)
    nums = np.cumsum(rng.integers(-10, 12, 5000)).astype(np.int64)
    cfg = ChunkConfig(paging_spec=PagingSpec.equal_pages_up_to(1500))
    check_device_matches_host(simple_compress(nums, cfg))


def test_device_decode_float_mult():
    from pcodec_tpu import ChunkConfig, simple_compress

    rng = np.random.default_rng(1)
    nums = (rng.integers(0, 1000, 4000) * 0.1).astype(np.float64)
    check_device_matches_host(simple_compress(nums, ChunkConfig()))
