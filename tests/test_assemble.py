"""Device file-image assembly (ops/assemble.py): the assembled `.pct`
image must be byte-identical to codec.container.container_compress.

Runs on the CPU interpret path (conftest forces JAX_PLATFORMS=cpu); the
real-TPU counterpart is exercised by bench.py and the TPU matrix.
"""

import numpy as np
import pytest

from pcodec_tpu.codec.container import container_compress
from pcodec_tpu.codec.chunk_config import ChunkConfig, ModeSpec, DeltaSpec


def _image_bytes(nums, cfg=None, page_n=256, chunk_n=131072, use_pallas=True):
    from pcodec_tpu.ops import assemble

    out = assemble.encode_container_image_device(
        nums, cfg, page_n, chunk_n, use_pallas=use_pallas)
    if out is None:
        return None
    return assemble.file_image_to_bytes(*out)


def _expect(nums, cfg=None, page_n=256, chunk_n=131072):
    return container_compress(nums, cfg, page_n=page_n, chunk_n=chunk_n)


class TestImageXla:
    def test_taxi_multichunk_ragged(self):
        rng = np.random.default_rng(7)
        n = 300_000
        x = np.cumsum(rng.integers(0, 120, n)).astype(np.int64)
        got = _image_bytes(x, use_pallas=False)
        assert got is not None
        assert got == _expect(x)

    def test_delta_order0_u32(self):
        rng = np.random.default_rng(8)
        x = rng.integers(0, 1 << 30, 200_000).astype(np.uint32)
        cfg = ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, 0))
        got = _image_bytes(x, cfg, use_pallas=False)
        assert got is not None
        assert got == _expect(x, cfg)

    def test_high_order(self):
        rng = np.random.default_rng(9)
        n = 200_000
        x = np.cumsum(np.cumsum(rng.integers(0, 9, n))).astype(np.int64)
        got = _image_bytes(x, use_pallas=False)
        assert got is not None
        assert got == _expect(x)

    def test_dict_mode(self):
        rng = np.random.default_rng(10)
        vals = np.array([3, 99, 1234567, -5], dtype=np.int64)
        x = vals[rng.integers(0, 4, 300_000)]
        cfg = ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT))
        got = _image_bytes(x, cfg, use_pallas=False)
        assert got is not None
        assert got == _expect(x, cfg)

    def test_page1024(self):
        rng = np.random.default_rng(11)
        n = 400_000
        x = np.cumsum(rng.integers(0, 700, n)).astype(np.int64)
        got = _image_bytes(x, page_n=1024, chunk_n=1 << 18, use_pallas=False)
        assert got is not None
        assert got == _expect(x, page_n=1024, chunk_n=1 << 18)


class TestImagePallasInterpret:
    def test_taxi_multichunk_ragged(self):
        rng = np.random.default_rng(12)
        n = 300_000
        x = np.cumsum(rng.integers(0, 120, n)).astype(np.int64)
        got = _image_bytes(x, use_pallas=True)
        assert got is not None
        assert got == _expect(x)

    def test_dict_mode(self):
        rng = np.random.default_rng(13)
        vals = np.array([17, -2, 10**12], dtype=np.int64)
        x = vals[rng.integers(0, 3, 280_000)]
        cfg = ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT))
        got = _image_bytes(x, cfg, use_pallas=True)
        assert got is not None
        assert got == _expect(x, cfg)


class TestHostDecideAB:
    def test_host_vs_device_decisions_identical_bytes(self):
        """PCODEC_HOST_DECIDE=0 (device decision machinery) and the default
        host-native sample decisions must produce identical files."""
        from pcodec_tpu.ops import device_train as dt

        rng = np.random.default_rng(21)
        n = 260_000
        x = np.cumsum(rng.integers(0, 300, n)).astype(np.int64)
        a = _image_bytes(x, use_pallas=False)
        old = dt._HOST_DECIDE
        try:
            dt._HOST_DECIDE = False
            b = _image_bytes(x, use_pallas=False)
        finally:
            dt._HOST_DECIDE = old
        assert a is not None and b is not None
        assert a == b
        assert a == _expect(x)

    def test_intmult_winner_same_plan(self):
        """An IntMult auto winner (two vars, outside the image path) must
        get identical metas/jobs from both decision paths."""
        from pcodec_tpu.format.bitio import BitWriter
        from pcodec_tpu.ops import device_train as dt

        rng = np.random.default_rng(22)
        n = 260_000
        x = (np.cumsum(rng.integers(0, 40, n)) * 1000
             + rng.integers(0, 3, n)).astype(np.int64)

        def metas():
            planned = dt.plan_encode_device(x, None, 256, 131072)
            assert planned is not None
            _, _, ccs, chunk_jobs, _, _ = planned
            out = []
            for cc in ccs:
                w = BitWriter()
                cc.write_meta(w)
                out.append(w.to_bytes())
            return out, [k for k, _ in chunk_jobs]

        a, ka = metas()
        old = dt._HOST_DECIDE
        try:
            dt._HOST_DECIDE = False
            b, kb = metas()
        finally:
            dt._HOST_DECIDE = old
        assert ka == kb
        assert a == b
        assert any(b"\x00" != m[:1] for m in a)  # sanity: non-empty metas


class TestNativeDecisionParity:
    def test_native_batch_matches_python_reference(self):
        """pco_delta_cand_stats + the python cost layer must reproduce
        choose_auto_delta_encoding_from_sample exactly across shapes
        (noop / order-k / lookback winners, tiny chunks, fuzz)."""
        pytest.importorskip("pcodec_tpu.native.kernels")
        from pcodec_tpu.codec import compress as cmp
        from pcodec_tpu.native import kernels as _nk
        from pcodec_tpu.ops import device_train as dt
        from pcodec_tpu.dtypes import U64, number_type_from_np

        rng = np.random.default_rng(5)
        n = 150_000
        pat = rng.integers(0, 10**6, 512).astype(np.int64)
        cases = [
            np.cumsum(rng.integers(0, 120, n)).astype(np.int64),
            np.tile(pat, n // 512) + rng.integers(0, 2, (n // 512) * 512),
            rng.integers(-2**62, 2**62, n).astype(np.int64),
            np.cumsum(np.cumsum(rng.integers(0, 9, n))).astype(np.int64),
            np.full(n, 12345, np.int64) + (rng.random(n) < 0.001),
            np.cumsum(rng.integers(0, 5, 4096)).astype(np.int64),
        ]
        for _ in range(6):  # fuzz: random walks of random roughness
            k = int(rng.integers(3000, 80_000))
            step = int(rng.integers(1, 1 << int(rng.integers(1, 40))))
            cases.append(np.cumsum(rng.integers(0, step, k)).astype(np.int64))

        samples, cns, ubls, expected = [], [], [], []
        for x in cases:
            nt = number_type_from_np(x.dtype)
            cn = len(x)
            dsl = cmp.delta_sample_slices(
                cn, cmp.DELTA_GROUP_SIZE, 1 + cn // cmp.N_PER_EXTRA_DELTA_GROUP)
            seg = np.concatenate([x[a:b] for a, b in dsl])
            s = nt.to_latent_ordered(seg).astype(np.uint64)
            ubl = cmp.choose_unoptimized_bins_log(8, cn)
            expected.append(
                cmp.choose_auto_delta_encoding_from_sample(s, cn, ubl, nt.latent))
            samples.append(s)
            cns.append(cn)
            ubls.append(ubl)

        got = dt._native_auto_delta_batch(samples, cns, ubls, U64, _nk)
        for ci, exp in enumerate(expected):
            g = got[ci]
            assert (g.kind, g.order, g.window_n_log) == \
                (exp.kind, exp.order, exp.window_n_log), ci

    def test_native_lookback_cost_float_equal(self):
        """_cost_from_native_stats over pco_delta_cand_stats lookback slots
        must equal lookback_cost_from_sample to the last float bit (it feeds
        finalize_delta_choice comparisons)."""
        pytest.importorskip("pcodec_tpu.native.kernels")
        from pcodec_tpu.codec import compress as cmp
        from pcodec_tpu.native import kernels as _nk
        from pcodec_tpu.ops import device_train as dt
        from pcodec_tpu.dtypes import U64

        rng = np.random.default_rng(77)
        for trial in range(8):
            dn = int(rng.integers(500, 30_000))
            if trial % 3 == 0:
                s = np.cumsum(rng.integers(0, 120, dn)).astype(np.uint64)
            elif trial % 3 == 1:
                pat = rng.integers(0, 10**6, 256).astype(np.uint64)
                s = np.resize(pat, dn) + rng.integers(0, 2, dn).astype(np.uint64)
            else:
                s = rng.integers(0, 1 << 50, dn).astype(np.uint64)
            ubl = int(rng.integers(4, 9))
            enc = cmp.new_lookback(dn)
            expect = cmp.lookback_cost_from_sample(s, ubl, enc, U64)
            sn = np.asarray([dn], np.int64)
            stats, cap = _nk.delta_cand_stats(
                s, np.asarray([0], np.int64), sn, 64, U64.offset_bits_bits,
                np.asarray([ubl], np.int32), -1, -1,
                wnls=np.asarray([enc.window_n_log], np.int32))
            n_lb = max(dn - enc.state_n, 0)
            got = dt._cost_from_native_stats(
                [("delta", stats[0, 0], n_lb), ("primary", stats[0, 1], n_lb)],
                enc, U64, cap)
            assert got == expect, (trial, got, expect)
