import numpy as np

from pcodec_tpu.binning.bin_optimization import optimize_bins
from pcodec_tpu.binning.histogram import HistogramBin, histogram
from pcodec_tpu.dtypes import U32


def bins_tuples(bins):
    return [(b.count, b.lower, b.upper) for b in bins]


def test_histogram_simple():
    # pinned from ref: histograms.rs test_histogram_sorted_simple (sorted inputs)
    assert histogram(np.array([], dtype=np.uint32), 2) == []
    assert bins_tuples(histogram(np.array([8], dtype=np.uint32), 0)) == [(1, 8, 8)]
    assert bins_tuples(histogram(np.arange(1, 10, dtype=np.uint32), 2)) == [
        (3, 1, 3), (2, 4, 5), (2, 6, 7), (2, 8, 9),
    ]
    assert bins_tuples(histogram(np.full(11, 8, dtype=np.uint32), 2)) == [(11, 8, 8)]
    assert bins_tuples(histogram(np.array([0, 0, 0, 1, 2, 2, 2, 2], dtype=np.uint32), 3)) == [
        (3, 0, 0), (1, 1, 1), (4, 2, 2),
    ]
    assert bins_tuples(histogram(np.array([0, 0, 1, 2, 2, 2, 2, 2], dtype=np.uint32), 3)) == [
        (2, 0, 0), (1, 1, 1), (5, 2, 2),
    ]


def test_histogram_quicksort_pinned():
    # ref: histograms.rs test_histogram_quicksort — results are order-independent
    rng = np.random.default_rng(0)
    lat = np.arange(100, dtype=np.uint32)
    rng.shuffle(lat)
    assert bins_tuples(histogram(lat, 2)) == [
        (25, 0, 24), (25, 25, 49), (25, 50, 74), (25, 75, 99),
    ]

    lat = np.zeros(100, dtype=np.uint32)
    lat[0] = 1
    rng.shuffle(lat)
    assert bins_tuples(histogram(lat, 2)) == [(99, 0, 0), (1, 1, 1)]

    lat = np.ones(100, dtype=np.uint32)
    lat[0] = 0
    rng.shuffle(lat)
    assert bins_tuples(histogram(lat, 2)) == [(1, 0, 0), (99, 1, 1)]

    lat = np.full(100, 5, dtype=np.uint32)
    lat[0] = 3
    lat[1:3] = 7
    rng.shuffle(lat)
    assert bins_tuples(histogram(lat, 2)) == [(1, 3, 3), (97, 5, 5), (2, 7, 7)]
    assert bins_tuples(histogram(lat, 1)) == [(98, 3, 5), (2, 7, 7)]

    lat = np.full(100, 5, dtype=np.uint32)
    lat[0:2] = 3
    lat[2] = 7
    rng.shuffle(lat)
    assert bins_tuples(histogram(lat, 1)) == [(2, 3, 3), (98, 5, 7)]


def hb(count, lower, upper):
    return HistogramBin(count, lower, upper)


def test_bin_optimization():
    # pinned from ref: bin_optimization.rs test_bin_optimization
    infos = optimize_bins(
        [hb(100, 1, 16), hb(100, 33, 48), hb(100, 49, 64), hb(100, 65, 74), hb(50, 75, 79)],
        10,
        U32,
    )
    got = [(b.weight, b.lower, b.upper, b.offset_bits, b.symbol) for b in infos]
    assert got == [(100, 1, 16, 4, 0), (200, 33, 64, 5, 1), (150, 65, 79, 4, 2)]


def test_bin_optimization_enveloped():
    infos = optimize_bins([hb(1000, 0, 150), hb(1000, 200, 200)], 10, U32)
    got = [(b.weight, b.lower, b.upper, b.offset_bits, b.symbol) for b in infos]
    assert got == [(1000, 0, 150, 8, 0), (1000, 200, 200, 0, 1)]


def test_log2_approx():
    from pcodec_tpu.binning.bin_optimization import log2_approx_f32

    for exp in range(32):
        assert float(log2_approx_f32(np.float32(1 << exp))) == float(exp)
    xs = np.arange(1, 101, dtype=np.float32)
    approx = log2_approx_f32(xs)
    exact = np.log2(xs)
    assert np.all(np.abs(approx - exact) < 0.0076)
    assert np.all(np.diff(approx) >= 0)
