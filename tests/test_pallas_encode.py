"""Device encoder (ops/pallas_encode.py): byte-identical to the host encoder.

Same bins in => identical stream out: the EB/EC kernels must reproduce the
host dissection + packing exactly, including ragged pages, trivial vars
(host fallback), 64-bit offsets, and multi-chunk files.
"""

import numpy as np
import pytest

import jax

from pcodec_tpu import ChunkConfig, DeltaSpec
from pcodec_tpu.codec.container import container_compress

_ON_TPU = jax.devices()[0].platform in ("tpu", "axon")
needs_tpu = pytest.mark.skipif(
    not _ON_TPU,
    reason="device encode matrix needs TPU; run with PCODEC_TEST_PLATFORM=tpu",
)

RNG = np.random.default_rng(7)


def _identical(nums, cfg=None, **kw):
    from pcodec_tpu.ops.pallas_encode import encode_container_device

    kw.setdefault("page_n", 1024)
    ref = container_compress(nums, cfg, **kw)
    dev, stats = encode_container_device(nums, cfg, **kw)
    assert dev == ref, (
        f"device encode differs: ref {len(ref)}B dev {len(dev)}B "
        f"(first diff at {next((i for i in range(min(len(ref), len(dev))) if ref[i] != dev[i]), -1)})"
    )
    return stats


class TestEncodeInterpret:
    def test_smoke_interpret(self):
        stats = _identical(np.cumsum(RNG.integers(0, 90, 700)).astype(np.int64), page_n=256)
        assert stats["device_chunks"] == 1

    def test_lookback_interpret(self):
        # lookback winner: both latent vars (u32 lookbacks + toggled deltas)
        # through the kernels, byte-identical
        x = (np.tile(RNG.integers(0, 10**6, 40), 40)[:1500]
             .astype(np.int64) + RNG.integers(0, 2, 1500))
        stats = _identical(x, page_n=256)
        assert stats["device_chunks"] == 1


@needs_tpu
class TestDeviceEncode:
    def test_taxi_ragged(self):
        assert _identical(np.cumsum(RNG.integers(0, 120, 9473)).astype(np.int64))[
            "device_chunks"] == 1

    def test_multichunk(self):
        _identical(np.cumsum(RNG.integers(0, 50, 10000)).astype(np.int64), chunk_n=4096)

    def test_ob64(self):
        assert _identical(RNG.integers(0, 2**62, 6000).astype(np.int64))["device_chunks"] == 1

    def test_trivial_and_fallbacks(self):
        _identical(np.full(5000, 42, np.int64))
        _identical((RNG.integers(0, 10**6, 6000) * 1_000_000_000).astype(np.int64))

    def test_delta_orders(self):
        base = np.cumsum(np.cumsum(np.cumsum(RNG.integers(0, 5, 6000)))).astype(np.int64)
        for order in (2, 3):
            _identical(base, ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, order)))

    def test_f32_classic(self):
        _identical((RNG.standard_normal(6000) * 100).astype(np.float32))

    def test_tiny(self):
        _identical(np.arange(7, dtype=np.int64))
        _identical(np.cumsum(RNG.integers(0, 90, 1025)).astype(np.int64))


def test_histogram_extract_walk_equivalence():
    # histogram_from_extracts == histogram on adversarial multisets (pure
    # numpy decision layer; runs everywhere)
    from pcodec_tpu.binning.histogram import histogram
    from pcodec_tpu.ops.device_train import histogram_from_extracts

    rng = np.random.default_rng(5)
    for data in [
        rng.integers(0, 10, 5000).astype(np.uint64),          # heavy runs
        np.zeros(3000, dtype=np.uint64),                      # one run
        rng.integers(0, 2**63, 5000).astype(np.uint64),       # distinct
        np.repeat(rng.integers(0, 50, 100), 50).astype(np.uint64),
        np.full(1000, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64),   # all MAX
    ]:
        for log in (2, 5, 8):
            nb = 1 << log
            n = len(data)
            s = np.sort(data)
            j = np.arange(nb)
            ccp = ((j + 1) * n + nb - 1) >> log
            idx = np.minimum(ccp - 1, n - 1)
            V = s[idx]
            L = np.searchsorted(s, V, side="left")
            R = np.searchsorted(s, V, side="right")
            SL1 = s[np.maximum(L - 1, 0)]
            SR = s[np.minimum(R, n - 1)]
            a = histogram(data.copy(), log)
            b = histogram_from_extracts(n, log, V, L, R, SL1, SR, s[0], s[-1])
            assert [(x.count, x.lower, x.upper) for x in a] == [
                (x.count, x.lower, x.upper) for x in b
            ], (log, len(data))


class TestDeviceTrainPlan:
    """plan_encode_device's decision layer (routing, fallbacks) on CPU —
    no kernel execution, so it stays fast everywhere."""

    def test_routing(self):
        from pcodec_tpu.ops.device_train import plan_encode_device

        rng = np.random.default_rng(22)
        # classic ints ride the device pipeline
        planned = plan_encode_device(
            np.cumsum(rng.integers(0, 120, 100_000)).astype(np.int64), None, 256, 131072)
        assert planned is not None
        # FloatMult winners stay on device too (softfloat split)
        decimal = (rng.integers(0, 10000, 100_000) * 0.01).astype(np.float64)
        planned = plan_encode_device(decimal, None, 256, 131072)
        assert planned is not None
        assert all(kind == "device" for kind, _ in planned[3])
        # ragged degenerate tail falls back entirely
        assert plan_encode_device(
            np.arange(131072 + 3, dtype=np.int64), None, 256, 131072) is None

    def test_intmult_device_meta_matches_host(self):
        """IntMult winners stay on device (two-var split); the planned
        chunk metadata (mode payload, both vars' bins, delta) must be
        byte-identical to the host pipeline's (chunk_compressor.rs:477-534).
        Pure-XLA phases, no Pallas kernels — fast on CPU."""
        from pcodec_tpu.codec.chunk_config import PagingSpec
        from pcodec_tpu.format.bitio import BitWriter
        from pcodec_tpu.ops.device_train import plan_encode_device
        import pcodec_tpu.codec.compress as cmp

        rng = np.random.default_rng(23)
        cases = [
            # timestamps: multiples of 1e9 with adjustments; primary delta 1
            np.cumsum(rng.integers(1, 2000, 262144)).astype(np.int64)
            * 1_000_000_000 + rng.integers(0, 3, 262144),
            # exact multiples: trivial secondary rides along
            (rng.integers(0, 10**6, 262144) * 60000).astype(np.int64),
        ]
        for x in cases:
            planned = plan_encode_device(x, None, 256, 131072)
            assert planned is not None
            nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
            start = 0
            for ci, cn in enumerate(chunk_ns):
                cfg = ChunkConfig(
                    paging_spec=PagingSpec.exact_pages([256] * (cn // 256)))
                host_cc = cmp.chunk_compressor(nt, x[start : start + cn], cfg)
                start += cn
                assert host_cc.meta.mode.kind == "int_mult"
                kind, _ = chunk_jobs[ci]
                assert kind == "device"
                wd, wh = BitWriter(), BitWriter()
                ccs[ci].write_meta(wd)
                host_cc.write_meta(wh)
                assert wd.to_bytes() == wh.to_bytes(), ci

    def test_floatquant_device_meta_matches_host(self):
        """FloatQuant winners stay on device: primary (ordered >> k) +
        secondary (low-k bits, negative flip) split, auction tie order
        matching choose_mode_and_split (float.rs:83-134)."""
        from pcodec_tpu.codec.chunk_config import PagingSpec
        from pcodec_tpu.format.bitio import BitWriter
        from pcodec_tpu.ops.device_train import plan_encode_device
        import pcodec_tpu.codec.compress as cmp

        rng = np.random.default_rng(31)
        cases = [
            # f16-quantized f32: k=13 low zero bits, mixed signs
            rng.normal(0, 1, 262144).astype(np.float16).astype(np.float32),
            # f16-quantized f64 random walk: delta decision on primary
            np.cumsum(rng.normal(0, 1, 262144)).astype(np.float16).astype(np.float64),
            # f32-representable f64: k=29
            (rng.normal(0, 1, 262144).astype(np.float32) * np.float32(0.5)
             ).astype(np.float64),
        ]
        for x in cases:
            planned = plan_encode_device(x, None, 256, 131072)
            assert planned is not None
            nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
            start = 0
            for ci, cn in enumerate(chunk_ns):
                cfg = ChunkConfig(
                    paging_spec=PagingSpec.exact_pages([256] * (cn // 256)))
                host_cc = cmp.chunk_compressor(nt, x[start : start + cn], cfg)
                start += cn
                assert host_cc.meta.mode.kind == "float_quant"
                kind, _ = chunk_jobs[ci]
                assert kind == "device"
                wd, wh = BitWriter(), BitWriter()
                ccs[ci].write_meta(wd)
                host_cc.write_meta(wh)
                assert wd.to_bytes() == wh.to_bytes(), ci

    def test_try_modes_meta_matches_host(self):
        """Pinned Try* mode specs ride the device planner too: the split
        parameters are user-given, so no sampling/auction runs."""
        from dataclasses import replace

        from pcodec_tpu import ModeSpec
        from pcodec_tpu.codec.chunk_config import PagingSpec
        from pcodec_tpu.format.bitio import BitWriter
        from pcodec_tpu.ops.device_train import plan_encode_device
        import pcodec_tpu.codec.compress as cmp

        rng = np.random.default_rng(17)
        cases = [
            (ModeSpec(ModeSpec.TRY_INT_MULT, 777), "int_mult",
             (rng.integers(0, 9000, 131072) * 777
              + rng.integers(0, 3, 131072)).astype(np.int64)),
            (ModeSpec(ModeSpec.TRY_FLOAT_QUANT, 13), "float_quant",
             rng.normal(0, 1, 131072).astype(np.float16).astype(np.float32)),
            (ModeSpec(ModeSpec.TRY_FLOAT_MULT, 0.01), "float_mult",
             (rng.integers(-50000, 50000, 131072) * 0.01).astype(np.float64)),
        ]
        for ms, kind, x in cases:
            cfg = ChunkConfig(mode_spec=ms)
            planned = plan_encode_device(x, cfg, 256, 131072)
            assert planned is not None, kind
            nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
            assert all(k == "device" for k, _ in chunk_jobs), kind
            hcfg = replace(cfg, paging_spec=PagingSpec.exact_pages(
                [256] * (chunk_ns[0] // 256)))
            host_cc = cmp.chunk_compressor(nt, x[: chunk_ns[0]], hcfg)
            assert host_cc.meta.mode.kind == kind
            wd, wh = BitWriter(), BitWriter()
            ccs[0].write_meta(wd)
            host_cc.write_meta(wh)
            assert wd.to_bytes() == wh.to_bytes(), kind

    def test_lookback_eval_device_bins_matches_host_sample(self):
        """The lookback delta candidate is costed from device-reduced bins
        (chooser scan on device, ~24 B/bin fetched) instead of a multi-MB
        delta-sample transfer; decisions and metadata must be identical to
        both the host-sample A/B path (PCODEC_LB_HOST=1) and the host
        pipeline, whether lookback wins (-> host-pipeline chunk) or loses
        (-> device chunk)."""
        import pcodec_tpu.ops.device_train as dt
        from pcodec_tpu.codec.chunk_config import PagingSpec
        from pcodec_tpu.codec import container as ctn
        from pcodec_tpu.format.bitio import BitWriter
        import pcodec_tpu.codec.compress as cmp

        rng = np.random.default_rng(55)
        cases = {
            # repetitive with noise: lookback wins
            "lb_wins": np.tile(rng.integers(0, 10**6, 700), 300)[:200_000]
            .astype(np.int64) + rng.integers(0, 2, 200_000),
            # taxi-like: lookback evaluated (noop cost clears the penalty)
            # but consecutive wins
            "lb_loses": np.cumsum(rng.integers(0, 120, 200_000)).astype(np.int64),
        }
        expect = {"lb_wins": ("lookback", "device"),
                  "lb_loses": ("consecutive", "device")}

        def run():
            out = {}
            for name, x in cases.items():
                planned = dt.plan_encode_device(x, None, 256, 131072)
                assert planned is not None, name
                nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
                start = 0
                for ci, cn in enumerate(chunk_ns):
                    hcfg = ChunkConfig(paging_spec=PagingSpec.exact_pages(
                        ctn._exact_split(cn, 256)))
                    host_cc = cmp.chunk_compressor(nt, x[start : start + cn], hcfg)
                    start += cn
                    wd, wh = BitWriter(), BitWriter()
                    ccs[ci].write_meta(wd)
                    host_cc.write_meta(wh)
                    assert wd.to_bytes() == wh.to_bytes(), (name, ci)
                    out.setdefault(name, []).append(
                        (host_cc.meta.delta_encoding.kind, chunk_jobs[ci][0]))
            return out

        old = dt._LB_HOST
        try:
            dt._LB_HOST = False
            dev_bins = run()
            dt._LB_HOST = True
            host_sample = run()
        finally:
            dt._LB_HOST = old
        assert dev_bins == host_sample
        for name, rows in dev_bins.items():
            assert all(r == expect[name] for r in rows), (name, rows)

    def test_lookback_device_meta_matches_host(self):
        """Lookback-winning (and pinned TRY_LOOKBACK) split-free chunks
        encode on device: the chooser + delta + both vars' walks run in
        _phase_lookback and the planned metadata (lookback var bins, primary
        bins, page-front delta states) must match the host pipeline."""
        from dataclasses import replace

        from pcodec_tpu import DeltaSpec, ModeSpec
        from pcodec_tpu.codec.chunk_config import PagingSpec
        from pcodec_tpu.codec import container as ctn
        from pcodec_tpu.format.bitio import BitWriter
        from pcodec_tpu.ops.device_train import plan_encode_device
        import pcodec_tpu.codec.compress as cmp

        rng = np.random.default_rng(7)
        lb = DeltaSpec(DeltaSpec.TRY_LOOKBACK)
        cases = [
            # auto: repetitive data where lookback wins the auction
            ("auto", ChunkConfig(),
             (np.tile(rng.integers(0, 10**6, 700), 300)[:200_000]
              .astype(np.int64) + rng.integers(0, 2, 200_000)), "device"),
            ("pinned i64", ChunkConfig(delta_spec=lb),
             np.cumsum(rng.integers(0, 120, 131072)).astype(np.int64), "device"),
            # narrow widths exercise the 32/16-bit wrapping delta masks
            ("pinned i32", ChunkConfig(delta_spec=lb),
             (np.tile(rng.integers(0, 9000, 300), 500)[:131072])
             .astype(np.int32), "device"),
            ("pinned u16", ChunkConfig(delta_spec=lb),
             (np.tile(rng.integers(0, 400, 100), 1400)[:131072])
             .astype(np.uint16), "device"),
            # device dict split feeding device lookback (u32 index latents);
            # own rng: this draw must make lookback win the auction
            ("dict", ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT)),
             np.tile(np.random.default_rng(7).integers(
                 -(10**12), 10**12, 50), 3000)[:131072]
             .astype(np.int64), "device"),
            # trivial vars: should_fallback/trivial routing to host, not crash
            ("constant", ChunkConfig(delta_spec=lb),
             np.full(131072, 42, np.int64), "host"),
            # ragged tail chunk + ragged tail page
            ("ragged", ChunkConfig(delta_spec=lb),
             np.tile(rng.integers(0, 10**6, 80), 2000)[:150_001]
             .astype(np.int64), "device"),
        ]
        for name, cfg, x, want in cases:
            planned = plan_encode_device(x, cfg, 256, 131072)
            assert planned is not None, name
            nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
            assert all(k == want for k, _ in chunk_jobs), (name, chunk_jobs)
            start = 0
            for ci, cn in enumerate(chunk_ns):
                hcfg = replace(cfg, paging_spec=PagingSpec.exact_pages(
                    ctn._exact_split(cn, 256)))
                host_cc = cmp.chunk_compressor(nt, x[start : start + cn], hcfg)
                start += cn
                assert host_cc.meta.delta_encoding.kind == "lookback", name
                wd, wh = BitWriter(), BitWriter()
                ccs[ci].write_meta(wd)
                host_cc.write_meta(wh)
                assert wd.to_bytes() == wh.to_bytes(), (name, ci)

    def test_dict_device_meta_matches_host(self):
        """TRY_DICT splits on device (_phase_dict): frequency-ordered
        dictionary + u32 index latents, then the pipeline trains on the
        indices like Classic with latent type U32 (metadata/mode.rs:200).
        Metadata (dict payload, bins, delta) must match the host split."""
        from dataclasses import replace

        from pcodec_tpu import DeltaSpec, ModeSpec
        from pcodec_tpu.codec.chunk_config import PagingSpec
        from pcodec_tpu.format.bitio import BitWriter
        from pcodec_tpu.ops.device_train import plan_encode_device
        import pcodec_tpu.codec.compress as cmp

        rng = np.random.default_rng(43)
        vocab_i = rng.integers(-(10**12), 10**12, 300)
        vocab_f = rng.normal(0, 1e6, 500)
        big_vocab = rng.integers(0, 2**60, 6000)  # > _DICT_FETCH0 uniques
        cases = [
            # multi-chunk, equal-count ties exercise the value-order tiebreak
            (None, vocab_i[rng.integers(0, 300, 262144)].astype(np.int64)),
            (None, vocab_f[rng.integers(0, 500, 131072)].astype(np.float64)),
            # two chunks x ~6000 uniques: total exceeds the first fetch cap
            (None, big_vocab[rng.integers(0, 6000, 262144)].astype(np.uint64)),
            # pinned consecutive delta on the u32 indices (wrap + u32 states)
            (DeltaSpec(DeltaSpec.TRY_CONSECUTIVE, 1),
             vocab_i[np.minimum(rng.integers(0, 300, 131072).cumsum() % 600, 299)]
             .astype(np.int64)),
        ]
        for ds, x in cases:
            cfg = ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT))
            if ds is not None:
                cfg = replace(cfg, delta_spec=ds)
            planned = plan_encode_device(x, cfg, 256, 131072)
            assert planned is not None
            nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
            assert all(k == "device" for k, _ in chunk_jobs)
            start = 0
            for ci, cn in enumerate(chunk_ns):
                hcfg = replace(cfg, paging_spec=PagingSpec.exact_pages(
                    [256] * (cn // 256)))
                host_cc = cmp.chunk_compressor(nt, x[start : start + cn], hcfg)
                start += cn
                assert host_cc.meta.mode.kind == "dict"
                wd, wh = BitWriter(), BitWriter()
                ccs[ci].write_meta(wd)
                host_cc.write_meta(wh)
                assert wd.to_bytes() == wh.to_bytes(), ci

    def test_float_specials_meta_matches_host(self):
        """NaN/inf/-0.0/subnormal values outside the decision sample flow
        through the device softfloat split; trained metadata must stay
        byte-identical to the host pipeline."""
        from pcodec_tpu.codec.chunk_config import PagingSpec
        from pcodec_tpu.format.bitio import BitWriter
        from pcodec_tpu.ops.device_train import plan_encode_device
        import pcodec_tpu.codec.compress as cmp

        rng = np.random.default_rng(99)
        x = (rng.integers(-500000, 500000, 131072) * 0.01).astype(np.float64)
        x[7] = np.nan
        x[1000] = np.inf
        x[2000] = -np.inf
        x[3000] = -0.0
        x[4000] = 5e-324
        planned = plan_encode_device(x, None, 256, 131072)
        assert planned is not None
        nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
        cfg = ChunkConfig(
            paging_spec=PagingSpec.exact_pages([256] * (chunk_ns[0] // 256)))
        host_cc = cmp.chunk_compressor(nt, x[: chunk_ns[0]], cfg)
        assert host_cc.meta.mode.kind == "float_mult"
        wd, wh = BitWriter(), BitWriter()
        ccs[0].write_meta(wd)
        host_cc.write_meta(wh)
        assert wd.to_bytes() == wh.to_bytes()

    def test_floatmult_device_meta_matches_host(self):
        """FloatMult winners stay on device: softfloat split (ops/softfloat)
        reproduces the host's numpy float arithmetic bit-for-bit, so the
        planned metadata matches the host pipeline's byte-identically
        (mode/float_mult.rs split_latents)."""
        from pcodec_tpu.codec.chunk_config import PagingSpec
        from pcodec_tpu.format.bitio import BitWriter
        from pcodec_tpu.ops.device_train import plan_encode_device
        import pcodec_tpu.codec.compress as cmp

        rng = np.random.default_rng(37)
        cases = [
            # decimal cents: base 0.01, mixed magnitudes
            (rng.integers(-500000, 500000, 262144) * 0.01).astype(np.float64),
            # f32 decimals (non-dyadic base so FloatMult outbids FloatQuant)
            (rng.integers(-5000, 5000, 262144) * 0.1).astype(np.float32),
        ]
        for x in cases:
            planned = plan_encode_device(x, None, 256, 131072)
            assert planned is not None
            nt, chunk_ns, ccs, chunk_jobs, groups, dev_rows = planned
            start = 0
            for ci, cn in enumerate(chunk_ns):
                cfg = ChunkConfig(
                    paging_spec=PagingSpec.exact_pages([256] * (cn // 256)))
                host_cc = cmp.chunk_compressor(nt, x[start : start + cn], cfg)
                start += cn
                assert host_cc.meta.mode.kind == "float_mult"
                kind, _ = chunk_jobs[ci]
                assert kind == "device"
                wd, wh = BitWriter(), BitWriter()
                ccs[ci].write_meta(wd)
                host_cc.write_meta(wh)
                assert wd.to_bytes() == wh.to_bytes(), ci


@needs_tpu
class TestDeviceTrain:
    """plan_encode_device (ops/device_train.py): the device-side training
    pipeline (bijection, page delta, sort-based histogram extraction) must
    make exactly the host pipeline's decisions — byte-identical files."""

    def _dt(self, nums, cfg=None, page_n=256, chunk_n=131072):
        from pcodec_tpu.ops.device_train import plan_encode_device

        planned = plan_encode_device(nums, cfg, page_n, chunk_n)
        assert planned is not None, "expected the device-train path"
        return _identical(nums, cfg, page_n=page_n, chunk_n=chunk_n)

    def test_i64_delta1(self):
        self._dt(np.cumsum(RNG.integers(0, 120, 200_000)).astype(np.int64))

    def test_u32_noop(self):
        self._dt(RNG.integers(0, 5000, 200_000).astype(np.uint32))

    def test_i32_delta_narrow_wrap(self):
        # 32-bit wrapping diffs + 32-bit page delta states
        self._dt(np.cumsum(RNG.integers(-3, 9, 200_000)).astype(np.int32))

    def test_i16_and_high_order(self):
        self._dt(RNG.integers(-300, 300, 200_000).astype(np.int16))
        x = np.cumsum(np.cumsum(RNG.integers(0, 5, 200_000))).astype(np.uint64)
        self._dt(x)

    def test_intmult_device_two_var(self):
        # IntMult chunks encode on device: primary (latent // base) +
        # secondary (latent % base) kernel streams, bit-interleaved
        self._dt((RNG.integers(0, 10000, 200_000) * 8
                  + RNG.integers(0, 3, 200_000)).astype(np.int64))

    def test_intmult_trivial_secondary(self):
        # exact multiples: the secondary var is trivial (no body bits)
        self._dt((RNG.integers(0, 10000, 200_000) * 8).astype(np.int64))

    def test_floatquant_device_two_var(self):
        # FloatQuant chunks encode on device: primary (ordered >> k) +
        # secondary (low-k bits with negative-sign flip) kernel streams
        rng = np.random.default_rng(31)
        self._dt(rng.normal(0, 1, 200_000).astype(np.float16).astype(np.float32))
        self._dt(np.cumsum(rng.normal(0, 1, 200_000))
                 .astype(np.float16).astype(np.float64))

    def test_floatmult_device_two_var(self):
        # FloatMult chunks encode on device: the integer softfloat split
        # (ops/softfloat.py) feeds the primary + adjustment kernel streams
        rng = np.random.default_rng(37)
        self._dt((rng.integers(-500000, 500000, 200_000) * 0.01)
                 .astype(np.float64))
        self._dt((rng.integers(-5000, 5000, 200_000) * 0.1)
                 .astype(np.float32))

    def test_try_modes_device(self):
        # pinned Try* specs: full device encode, byte-identical
        from pcodec_tpu import ModeSpec

        rng = np.random.default_rng(17)
        self._dt((rng.integers(0, 9000, 200_000) * 777
                  + rng.integers(0, 3, 200_000)).astype(np.int64),
                 ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_INT_MULT, 777)))
        self._dt((rng.integers(-50000, 50000, 200_000) * 0.01)
                 .astype(np.float64),
                 ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_FLOAT_MULT, 0.01)))

    def test_lookback_device(self):
        # lookback winners + pinned TRY_LOOKBACK encode on device
        from pcodec_tpu import DeltaSpec

        rng = np.random.default_rng(7)
        self._dt((np.tile(rng.integers(0, 10**6, 700), 150)[:100_000]
                  .astype(np.int64) + rng.integers(0, 2, 100_000)))
        self._dt(np.cumsum(rng.integers(0, 120, 100_000)).astype(np.int64),
                 ChunkConfig(delta_spec=DeltaSpec(DeltaSpec.TRY_LOOKBACK)))

    def test_dict_device(self):
        # TRY_DICT: device mode split (_phase_dict) + kernel encode of the
        # u32 index latents, byte-identical files
        from pcodec_tpu import ModeSpec

        rng = np.random.default_rng(43)
        vocab = rng.integers(-(10**12), 10**12, 300)
        self._dt(vocab[rng.integers(0, 300, 200_000)].astype(np.int64),
                 ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT)))
        vocab_f = rng.normal(0, 1e6, 500)
        self._dt(vocab_f[rng.integers(0, 500, 200_000)].astype(np.float64),
                 ChunkConfig(mode_spec=ModeSpec(ModeSpec.TRY_DICT)))

    def test_float_specials_device_two_var(self):
        # NaN/inf/-0.0/subnormals outside the sample must split bit-exactly
        # through the softfloat (x86 NaN quieting, signed zeros, underflow)
        rng = np.random.default_rng(99)
        x = (rng.integers(-500000, 500000, 200_000) * 0.01).astype(np.float64)
        x[7] = np.nan
        x[1000] = np.inf
        x[2000] = -np.inf
        x[3000] = -0.0
        x[4000] = 5e-324
        self._dt(x)
        self._dt(rng.normal(0, 1, 200_000).astype(np.float16))

    def test_trivial_constant(self):
        self._dt(np.full(200_000, 42, dtype=np.int64))

    def test_ragged_tail_chunk(self):
        self._dt(np.cumsum(RNG.integers(0, 50, 300_001)).astype(np.int64),
                 page_n=1024, chunk_n=262144)

    def test_levels(self):
        for level in (0, 12):
            self._dt(np.cumsum(RNG.integers(0, 120, 150_000)).astype(np.int64),
                     ChunkConfig(compression_level=level))

    def test_float_classic_device_train(self):
        # classic-mode floats ride the device pipeline (integer bijection);
        # FloatMult winners route to the host pipeline, all byte-identical
        rng = np.random.default_rng(21)
        self._dt(rng.normal(0, 1, 150_000).astype(np.float64))
        self._dt(rng.normal(0, 1, 150_000).astype(np.float32))
        self._dt(rng.normal(0, 1, 150_000).astype(np.float16))
        # infinities are excluded from the mode sample but still encode
        self._dt(np.where(rng.random(150_000) < 0.01, np.inf,
                          rng.normal(0, 1e6, 150_000)))

    def test_float_mode_winners_stay_on_device(self):
        """FloatMult auto winners ride the device pipeline (the integer
        softfloat split, round 2); stale pre-softfloat expectation was
        'host' — this test never ran on hardware until round 3 (tunnel
        outage) and byte identity is the substance either way."""
        from pcodec_tpu.ops.device_train import plan_encode_device

        rng = np.random.default_rng(22)
        decimal = (rng.integers(0, 10000, 150_000) * 0.01).astype(np.float64)
        planned = plan_encode_device(decimal, None, 256, 131072)
        assert planned is not None
        assert all(kind == "device" for kind, _ in planned[3])
        _identical(decimal, page_n=256, chunk_n=131072)
