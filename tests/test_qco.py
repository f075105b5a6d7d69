"""Legacy quantile-compression (.qco) codec.

Oracle: the reference's 9 pinned binary assets
(/root/reference/quantile-compression/q_compress/assets/*.qco), each paired
with its raw .bin — the same backward-compatibility suite the reference
runs (q_compress/src/tests/backward_compatibility.rs).
"""

import numpy as np
import pytest

from pcodec_tpu.legacy import (
    auto_compress,
    auto_decompress,
    qco_compress,
    qco_decompress,
    wrapped_compress,
    wrapped_decompress,
)
from pcodec_tpu.legacy.qco import read_raw_asset

ASSETS = "/root/reference/quantile-compression/q_compress/assets"

STANDALONE_ASSETS = [
    ("v0.4_i64_empty", "i64"),
    ("v0.4_bool_sparse_2k", "bool"),
    ("v0.4_i32_2k", "i32"),
    ("v0.4_f32_2k", "f32"),
    ("v0.6_timestamp_deltas_2k", "timestamp_micros96"),
    ("v0.9_dispersed_shorts", "u16"),
    ("v0.10_varied_gcds", "f32"),
    ("v0.10_same_gcds", "i32"),
]


def _read(path):
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("name,dtype", STANDALONE_ASSETS)
def test_decode_assets(name, dtype):
    expected = read_raw_asset(_read(f"{ASSETS}/{name}.bin"), dtype)
    got, got_dtype = qco_decompress(_read(f"{ASSETS}/{name}.qco"))
    assert got_dtype == dtype
    if isinstance(expected, np.ndarray):
        assert np.array_equal(got, expected), name
    else:
        assert got == expected, name


def test_decode_wrapped_asset():
    expected = read_raw_asset(
        _read(f"{ASSETS}/v0.11.2_wrapped_brownian.bin"), "f32")
    got, dtype = wrapped_decompress(
        _read(f"{ASSETS}/v0.11.2_wrapped_brownian.qco"))
    assert dtype == "f32"
    assert np.array_equal(got, expected)


class TestRoundTrip:
    def _rt(self, nums, **kw):
        blob = qco_compress(nums, **kw)
        got, _ = qco_decompress(blob)
        assert np.array_equal(got, nums, equal_nan=False) or (
            got.dtype.kind == "f" and
            np.array_equal(got.view(np.uint32 if got.dtype.itemsize == 4
                                    else np.uint64),
                           nums.view(got.dtype.str.replace("f", "u")))
        )
        return blob

    def test_ints(self):
        rng = np.random.default_rng(0)
        for dt in (np.int64, np.int32, np.uint32, np.uint16, np.int16):
            self._rt(rng.integers(0, 1000, 2000).astype(dt))

    def test_delta_orders(self):
        rng = np.random.default_rng(1)
        base = np.cumsum(rng.integers(-5, 9, 3000)).astype(np.int64)
        for order in (1, 2, 7):
            self._rt(base, delta_order=order)

    def test_floats(self):
        rng = np.random.default_rng(2)
        self._rt(rng.normal(0, 1, 2000).astype(np.float64))
        self._rt(rng.normal(0, 1, 2000).astype(np.float32), delta_order=1)

    def test_gcds(self):
        rng = np.random.default_rng(3)
        self._rt((rng.integers(0, 1000, 3000) * 777).astype(np.int64))

    def test_sparse_run_len(self):
        rng = np.random.default_rng(4)
        x = (rng.random(5000) < 0.03)
        self._rt(x)

    def test_empty_and_tiny(self):
        self._rt(np.array([], dtype=np.int64))
        self._rt(np.array([42], dtype=np.int64))
        self._rt(np.arange(3, dtype=np.int32), delta_order=2)
        self._rt(np.arange(2, dtype=np.int32), delta_order=7)

    def test_levels(self):
        rng = np.random.default_rng(5)
        x = np.cumsum(rng.integers(0, 50, 4000)).astype(np.int64)
        sizes = [len(qco_compress(x, level=lv)) for lv in (0, 4, 8, 12)]
        # the prefix-merge DP's cost model is approximate (bumpy log), so
        # tiny inversions are possible; higher level must stay close
        assert sizes[2] <= sizes[0] * 1.02

    def test_auto(self):
        rng = np.random.default_rng(6)
        x = np.cumsum(rng.integers(0, 50, 4000)).astype(np.int64)
        blob = auto_compress(x)
        got, _ = auto_decompress(blob)
        assert np.array_equal(got, x)
        # delta order 1 should beat order 0 on a random walk
        assert len(blob) < len(qco_compress(x, delta_order=0))

    def test_wrapped_round_trip(self):
        rng = np.random.default_rng(7)
        x = np.cumsum(rng.normal(0, 1, 4000)).astype(np.float32)
        blob = wrapped_compress(x, delta_order=1,
                                sizess=[[1500, 500], [1200, 800]])
        got, dtype = wrapped_decompress(blob)
        assert dtype == "f32"
        assert np.array_equal(got.view(np.uint32), x.view(np.uint32))

    def test_native_path_matches_python_path(self):
        # numpy/native encode (C body + vectorized split) must emit the
        # exact bytes of the pure-Python reference path (list input)
        rng = np.random.default_rng(9)
        cases = [
            (np.cumsum(rng.integers(-5, 9, 5000)).astype(np.int64), 2),
            (rng.normal(0, 1, 5000).astype(np.float32), 0),
            ((rng.integers(0, 50, 5000) * 99).astype(np.uint32), 0),
            ((rng.random(5000) < 0.02), 0),  # sparse bool, run-length
            (rng.integers(-300, 300, 5000).astype(np.int16), 1),
        ]
        for x, order in cases:
            blob_np = qco_compress(x, delta_order=order)
            if x.dtype == np.bool_:
                lst = [bool(v) for v in x]
            elif x.dtype.kind == "f":
                w = np.uint32 if x.dtype.itemsize == 4 else np.uint64
                lst = [int(v) for v in x.view(w)]
            else:
                lst = [int(v) for v in x]
            name = {"int64": "i64", "float32": "f32", "uint32": "u32",
                    "bool": "bool", "int16": "i16"}[str(x.dtype)]
            blob_py = qco_compress(lst, name, delta_order=order)
            assert blob_np == blob_py, (x.dtype, order)
            got, _ = qco_decompress(blob_np)
            if x.dtype.kind == "f":
                assert np.array_equal(got.view(w), x.view(w))
            else:
                assert np.array_equal(got, x)

    def test_wide_types_python_path(self):
        # i128 / 96-bit timestamps ride the pure-Python int path
        rng = np.random.default_rng(3)
        vals = [int(v) * (1 << 70) + int(w) for v, w in
                zip(rng.integers(-500, 500, 800), rng.integers(0, 1000, 800))]
        got, dt = qco_decompress(qco_compress(vals, "i128", delta_order=1))
        assert dt == "i128" and got == vals
        ts = [int(v) + 10**15 for v in rng.integers(0, 10**9, 500)]
        got, dt = qco_decompress(
            qco_compress(ts, "timestamp_micros96", delta_order=2))
        assert dt == "timestamp_micros96" and got == ts

    def test_truncation_and_bitflip_fuzz(self):
        # every prefix must raise PcoError, never crash or hang
        # (q_compress/src/tests/stability.rs analog)
        from pcodec_tpu.errors import PcoError

        rng = np.random.default_rng(10)
        x = np.cumsum(rng.integers(0, 50, 3000)).astype(np.int64)
        blob = qco_compress(x, delta_order=1)
        for cut in list(range(0, 40)) + list(
                range(40, len(blob), max(1, len(blob) // 60))):
            try:
                got, _ = qco_decompress(blob[:cut])
                assert len(got) <= len(x)
            except PcoError:
                pass
        flip = bytearray(blob)
        for pos in rng.integers(0, len(blob), 40):
            flip[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            qco_decompress(bytes(flip))
        except PcoError:
            pass

    def test_ratio_on_reference_like_data(self):
        # sanity: the codec actually compresses (brownian f32 ~ several x)
        rng = np.random.default_rng(8)
        x = np.cumsum(rng.integers(0, 256, 10000)).astype(np.int64)
        blob = qco_compress(x, delta_order=1)
        assert len(blob) < x.nbytes / 4
