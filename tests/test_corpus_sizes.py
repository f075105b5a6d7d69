"""Compression-size behavior on the reference's synthetic bench corpus
(ref: pco_cli/generate_randoms.py — distributions reproduced with a fixed
seed; the reference generator is unseeded, so exact published bytes don't
exist for it, and this environment has no Rust toolchain or real taxi/
air-quality datasets for byte-differential comparison. The pinned-bytes
oracle is the asset re-encode test in test_encoder_parity.py; this test
covers every corpus family end-to-end and guards ratio regressions with
floors pinned to the measured ratios minus 5% slack (2026-08-19), so a
real encoder size regression fails rather than hiding under a loose bound.
"""

import numpy as np
import pytest

from pcodec_tpu import ChunkConfig
from pcodec_tpu.codec.standalone import simple_compress, simple_decompress

N = 100_000  # scaled-down corpus (the generator uses 1M; ratios are stable)


def fixed_median_lomax(rng, a, median, n):
    unscaled_median = 2 ** (1 / a) - 1
    return rng.pareto(a=a, size=n) / unscaled_median * median


def corpus():
    rng = np.random.default_rng(271828)
    out = {}
    out["i64_geo"] = (rng.geometric(p=0.001, size=N).astype(np.int64), 5.30)
    lomax = fixed_median_lomax(rng, 0.5, 1000, N)
    out["i64_lomax05"] = (np.floor(lomax).astype(np.int64), 4.40)
    out["i32_lomax05"] = (np.floor(lomax).astype(np.int32), 2.19)
    out["i64_uniform"] = (
        rng.integers(-(2**63), 2**63, size=N, dtype=np.int64), 0.9999)
    out["i64_constant"] = (np.full(N, 77777, dtype=np.int64), 26000.0)
    out["i64_sparse"] = (
        rng.binomial(1, p=0.01, size=N).astype(np.int64), 696.0)
    dollars = np.floor(fixed_median_lomax(rng, 1.5, 5, N)).astype(np.int64)
    cents = rng.integers(0, 100, size=N)
    p = rng.uniform(size=N)
    for thresh, v in ((0.9, 99), (0.75, 98), (0.6, 95), (0.45, 75),
                      (0.4, 50), (0.25, 25), (0.15, 0)):
        cents[p < thresh] = v
    out["i64_dollars"] = (dollars, 12.26)
    out["i64_cents"] = (cents.astype(np.int64), 17.07)
    out["i64_total_cents"] = (dollars * 100 + cents, 6.25)
    # float families from the generator: normal, slow cosine, decimals
    out["f64_normal"] = (rng.standard_normal(N), 1.1439)
    t = np.arange(N)
    out["f64_slow_cosine"] = (
        np.cos(t * (2 * np.pi / 10_000)) + rng.standard_normal(N) * 0.01, 1.2125)
    out["f32_decimal"] = (
        (rng.integers(0, 10000, N) / 100.0).astype(np.float32), 2.1493)
    return out


@pytest.mark.parametrize("name", list(corpus().keys()))
def test_corpus_roundtrip_and_ratio(name):
    nums, ratio_floor = corpus()[name]
    blob = simple_compress(nums, ChunkConfig())
    out, _ = simple_decompress(blob)
    assert np.array_equal(out.view(np.uint8), nums.view(np.uint8)), name
    ratio = nums.nbytes / len(blob)
    assert ratio >= ratio_floor, (name, ratio, ratio_floor)
