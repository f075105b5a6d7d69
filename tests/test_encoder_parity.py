"""Encoder parity with the reference: byte-identical files where the
reference's choices are fully deterministic, equal size elsewhere."""

import numpy as np

from pcodec_tpu import ChunkConfig, DeltaSpec, ModeSpec, simple_compress


def ref_bytes(name):
    with open(f"/root/reference/pco/assets/{name}", "rb") as f:
        return f.read()


def test_u8_asset_byte_identical():
    nums = np.array(list(range(0, 65)) + list(range(192, 256)), dtype=np.uint8)
    assert simple_compress(nums, ChunkConfig(enable_8_bit=True)) == ref_bytes("v1_0_0_u8.pco")


def test_i8_asset_byte_identical():
    nums = np.array(list(range(-128, -63)) + list(range(64, 128)), dtype=np.int8)
    assert simple_compress(nums, ChunkConfig(enable_8_bit=True)) == ref_bytes("v1_0_0_i8.pco")


def test_dict_asset_size_parity():
    nums = np.tile(np.array([8924659283, 234897984367, 9827358920], dtype=np.uint64), 1000)
    cfg = ChunkConfig(
        mode_spec=ModeSpec(ModeSpec.TRY_DICT), delta_spec=DeltaSpec(DeltaSpec.NO_OP)
    )
    # bytes differ only in dictionary tie order (the reference's is an
    # unstable sort over hash iteration order); size must match exactly
    assert len(simple_compress(nums, cfg)) == len(ref_bytes("v1_0_0_dict.pco"))


def test_conv1_asset_size_within_tolerance():
    xm1 = np.float32(0.0)
    xm2 = np.float32(0.0)
    vals = []
    for i in range(2000):
        x = np.float32(
            np.float32(np.float32(xm1 * np.float32(1.99)) - xm2)
            + np.float32((i * 47) % 77 - 38)
        )
        vals.append(int(np.trunc(np.float32(x + np.float32(10000.0)))))
        xm2, xm1 = xm1, x
    nums = np.array(vals, dtype=np.int32)
    mine = len(simple_compress(nums, ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONV1, 2))))
    ref = len(ref_bytes("v1_0_0_conv1.pco"))
    # least-squares weights can differ by an ULP (no fused multiply-add on the
    # python path); allow 0.5% size slack
    assert mine <= ref * 1.005
