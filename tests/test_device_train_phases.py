"""Device-train decision phases: bit-exact equivalence with the host
decision code. These run as plain XLA on CPU (no interpret-mode kernels),
so they stay fast everywhere.

 - the device quantile-histogram walk == histogram()
 - the device lookback chooser scan == the native C++ chooser
 - the device auto-delta candidate decision == choose_auto_delta_encoding
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pcodec_tpu.codec.compress as cmp
from pcodec_tpu import constants as c
from pcodec_tpu.binning.histogram import HistogramBin, histogram
from pcodec_tpu.dtypes import NUMBER_TYPES_BY_NAME

RNG = np.random.default_rng(5)


def _extracts(data, log):
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
    SR = s[np.clip(np.minimum(R, n - 1), 0, n - 1)]
    return V, L, R, SL1, SR, s[0], n


def test_device_walk_matches_host_histogram():
    from pcodec_tpu.ops.device_train import _walk_bins_device

    cases = [
        RNG.integers(0, 10, 5000).astype(np.uint64),
        np.zeros(3000, dtype=np.uint64),
        RNG.integers(0, 2**63, 5000).astype(np.uint64),
        np.repeat(RNG.integers(0, 50, 100), 50).astype(np.uint64),
        np.full(1000, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64),
        RNG.integers(0, 3, 777).astype(np.uint64),
        np.arange(4096, dtype=np.uint64),
        RNG.integers(0, 2, 10).astype(np.uint64),
    ]
    for log in (2, 5, 8):
        nb = 1 << log
        lanes = len(cases)
        arrs = [np.zeros((lanes, nb), dt) for dt in
                (np.uint64, np.int64, np.int64, np.uint64, np.uint64)]
        S0 = np.zeros(lanes, np.uint64)
        N = np.zeros(lanes, np.int64)
        for i, data in enumerate(cases):
            V, L, R, SL1, SR, s0, n = _extracts(data, log)
            for a, v in zip(arrs, (V, L, R, SL1, SR)):
                a[i] = v
            S0[i], N[i] = s0, n
        co, lo, up, nbn = jax.jit(
            _walk_bins_device, static_argnames=("nb_log",)
        )(*(jnp.asarray(a) for a in arrs), jnp.asarray(S0), jnp.asarray(N), nb_log=log)
        co, lo, up, nbn = map(np.asarray, (co, lo, up, nbn))
        for i, data in enumerate(cases):
            ref = [(b.count, b.lower, b.upper) for b in histogram(data.copy(), log)]
            got = [(int(co[i, k]), int(lo[i, k]), int(up[i, k])) for k in range(nbn[i])]
            assert got == ref, (log, i)


def test_device_lookback_chooser_matches_native():
    from pcodec_tpu.native.kernels import choose_lookbacks_native
    from pcodec_tpu.ops.device_train import _choose_lookbacks_device

    cases = [
        np.tile(RNG.integers(0, 1000, 64), 40).astype(np.uint64),
        RNG.integers(0, 2**62, 2600).astype(np.uint64),
        np.cumsum(RNG.integers(0, 100, 2600)).astype(np.uint64),
        RNG.integers(0, 2**16, 777).astype(np.uint16),
        RNG.integers(0, 255, 1300).astype(np.uint8),
    ]
    for lat in cases:
        n = len(lat)
        wlog = min(max((n - 1).bit_length(), c.LOOKBACK_MIN_WINDOW_N_LOG),
                   c.LOOKBACK_MAX_WINDOW_N_LOG)
        bits = lat.dtype.itemsize * 8
        ref = choose_lookbacks_native(wlog, 1, lat)
        lat2d = lat.astype(np.uint64)[None, :]
        got = np.asarray(jax.jit(
            _choose_lookbacks_device,
            static_argnames=("bits", "window_n_log", "state_n"),
        )(jnp.asarray(lat2d), jnp.asarray(np.array([n], np.int32)),
          bits=bits, window_n_log=wlog, state_n=1))
        assert np.array_equal(got[0].astype(np.uint32), ref), len(lat)


@pytest.mark.parametrize("name,sample", [
    ("taxi", np.cumsum(RNG.integers(0, 120, 2600)).astype(np.uint64)),
    ("tiled", np.tile(RNG.integers(0, 10**6, 64).astype(np.uint64), 40)),
    ("rand", RNG.integers(0, 2**60, 2600).astype(np.uint64)),
    ("smooth", np.cumsum(np.cumsum(RNG.integers(0, 5, 2600))).astype(np.uint64)),
    ("const", np.full(2600, 7, np.uint64)),
    ("u16", RNG.integers(0, 2**16, 1300).astype(np.uint16)),
    ("small", np.cumsum(RNG.integers(0, 9, 47)).astype(np.uint64)),
])
def test_device_delta_decision_matches_host(name, sample):
    from pcodec_tpu.ops.device_train import _phase_delta_candidates

    lt = NUMBER_TYPES_BY_NAME["u64" if sample.dtype == np.uint64 else "u16"].latent
    n_chunk = 1 << 20
    ubl = cmp.choose_unoptimized_bins_log(8, n_chunk)
    ref = cmp.choose_auto_delta_encoding_from_sample(
        sample.astype(lt.np_dtype), n_chunk, ubl, lt
    )
    dn = len(sample)
    wlog = cmp.new_lookback(dn).window_n_log
    mo = c.MAX_CONSECUTIVE_DELTA_ORDER
    from pcodec_tpu.ops.device_train import _fetch_packed_bins

    dense_d, nbn_d = _phase_delta_candidates(
        jnp.asarray(sample.astype(np.uint64)),
        jnp.asarray(np.array([0], np.int32)),
        jnp.asarray(np.array([dn], np.int32)),
        n_chunks=1, m_max=dn, max_order=mo, nb_log=ubl,
        lat_bits=lt.bits, window_n_log=wlog,
    )
    per_row = _fetch_packed_bins(dense_d, nbn_d)
    cand_bins = []
    for cand in range(mo + 3):
        bl = per_row[cand]
        ns = dn if cand == 0 else (
            max(dn - cand, 0) if cand <= mo else max(dn - 1, 0))
        cand_bins.append((bl, ns))
    got = cmp.choose_auto_delta_from_cand_bins(cand_bins, dn, n_chunk, ubl, lt)
    assert (got.kind, got.order, got.window_n_log) == (
        ref.kind, ref.order, ref.window_n_log), (name, got, ref)

    # the production (speculative) path: orders chain from device bins +
    # host-evaluated lookback cost, finalized — must equal the host decision
    chain = cmp.orders_chain_from_cand_bins(cand_bins[: mo + 1], ubl, lt)
    lb_cost = None
    penalty = cmp.LOOKBACK_REQUIRED_BYTE_SAVINGS_PER_N * dn
    if chain[0] > penalty:
        lb_cost = cmp._compressed_sample_size(
            sample.astype(lt.np_dtype), ubl, cmp.new_lookback(dn), lt
        ) + penalty
    spec = cmp.finalize_delta_choice(chain, lb_cost, n_chunk)
    assert (spec.kind, spec.order, spec.window_n_log) == (
        ref.kind, ref.order, ref.window_n_log), (name, spec, ref)
