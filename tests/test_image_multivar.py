"""Multi-latent-var / lookback device file-image assembly: the joint-cursor
interleaved image (ops/assemble.py::_plan_image_multi) must be
byte-identical to codec.container.container_compress for every mode family
the device planner covers (VERDICT r4 #2: one encoder path for every mode,
ref pco/src/wrapped/chunk_compressor.rs:604-693)."""

import numpy as np
import pytest

from pcodec_tpu.codec.container import container_compress
from pcodec_tpu.codec.chunk_config import ChunkConfig, ModeSpec, DeltaSpec


def _image(nums, cfg=None, page_n=256, chunk_n=131072, use_pallas=False):
    from pcodec_tpu.ops import assemble

    plan = assemble.plan_image(nums, cfg, page_n, chunk_n)
    if plan is None:
        return None, None
    out = assemble.run_image(plan, use_pallas=use_pallas)
    if out is None:
        return None, plan
    return assemble.file_image_to_bytes(*out), plan


def _check(nums, cfg=None, page_n=256, chunk_n=131072, use_pallas=False):
    from pcodec_tpu.ops import assemble

    got, plan = _image(nums, cfg, page_n, chunk_n, use_pallas=use_pallas)
    assert got is not None, "input unexpectedly outside the image path"
    assert plan.get("mode") == "multi", "expected the multi-var image path"
    expect = container_compress(nums, cfg, page_n=page_n, chunk_n=chunk_n)
    assert got == expect
    return plan


def test_intmult_two_vars():
    rng = np.random.default_rng(21)
    n = 200_000
    x = (np.cumsum(rng.integers(1, 30, n)) * 1_000_000_000
         + rng.integers(0, 4, n)).astype(np.int64)
    cfg = ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_INT_MULT, 10**9))
    _check(x, cfg)


def test_intmult_auto_winner():
    rng = np.random.default_rng(22)
    n = 200_000
    # noisy multiples: the secondary (adjustment) var is non-trivial
    x = (rng.integers(0, 1 << 20, n) * 777
         + rng.integers(0, 3, n)).astype(np.int64)
    _check(x)


def test_intmult_trivial_secondary():
    # exact multiples: adj == 0 everywhere -> trivial secondary with no
    # kernel job, but the chunk meta still has two latent vars, so the
    # directory needs the secondary's zero entries — the joint path owns
    # this (the old single-var path emitted a too-small directory)
    rng = np.random.default_rng(28)
    n = 200_000
    x = (rng.integers(0, 1 << 20, n) * 777).astype(np.int64)
    _check(x)


def test_lookback_two_vars():
    rng = np.random.default_rng(23)
    n = 199_680  # multiple of 512
    pattern = rng.integers(0, 10**6, 512).astype(np.int64)
    x = np.tile(pattern, n // 512) + rng.integers(0, 2, n)
    cfg = ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK))
    _check(x, cfg)


def test_floatquant_f32():
    rng = np.random.default_rng(24)
    n = 200_000
    x = (np.round(rng.standard_normal(n) * 64) / 64).astype(np.float32)
    # a few low-mantissa-bit wiggles keep the secondary (adjustment) var
    # non-trivial so the chunk really has two latent vars
    bits = x.view(np.uint32)
    bits[::7] += rng.integers(1, 4, len(bits[::7])).astype(np.uint32)
    x = bits.view(np.float32)
    cfg = ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_FLOAT_QUANT, 6))
    _check(x, cfg)


def test_floatmult_f32():
    rng = np.random.default_rng(25)
    n = 200_000
    x = (rng.integers(-5000, 5000, n) * np.float32(0.01)).astype(np.float32)
    bits = x.view(np.uint32)
    bits[::9] += 1  # ULP noise -> non-trivial adjustment var
    x = bits.view(np.float32)
    _check(x)


def test_mixed_chunks_classic_and_intmult():
    # chunk 0 classic-ish, chunk 1 IntMult winner: one file, both paths
    rng = np.random.default_rng(26)
    half = 131072
    a = np.cumsum(rng.integers(0, 120, half)).astype(np.int64)
    b = (rng.integers(0, 1 << 20, half) * 1_000_003).astype(np.int64)
    x = np.concatenate([a, b])
    _check(x)


def test_lookback_pallas_stitch():
    rng = np.random.default_rng(27)
    n = 199_680  # multiple of 512
    pattern = rng.integers(0, 10**6, 512).astype(np.int64)
    x = np.tile(pattern, n // 512) + rng.integers(0, 2, n)
    cfg = ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK))
    _check(x, cfg, use_pallas=True)
