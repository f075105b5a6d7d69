"""ops/softfloat.py: the integer softfloat must match numpy (x86 IEEE)
bit-for-bit — multiply, the FloatMult split, and the int-float latent
bijections — for every float width, including subnormals, signed zeros,
NaN payloads, infinities, and rounding boundaries."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcodec_tpu.dtypes import NUMBER_TYPES_BY_NAME
from pcodec_tpu.modes import float_mult
from pcodec_tpu.ops import softfloat as sf
from pcodec_tpu.utils import round_half_away

WEP = {"f16": (16, 5, 11), "f32": (32, 8, 24), "f64": (64, 11, 53)}
UDT = {"f16": np.uint16, "f32": np.uint32, "f64": np.uint64}


def _adversarial_bits(name, rng, n=4096):
    W, E, P = WEP[name]
    udt = UDT[name]
    bits = rng.integers(0, 1 << min(W, 63), n, dtype=np.uint64)
    if W == 64:
        bits = bits | (rng.integers(0, 2, n, dtype=np.uint64) << np.uint64(63))
    # force coverage of specials
    exp_mask = ((1 << E) - 1) << (P - 1)
    specials = np.array(
        [
            0,
            1 << (W - 1),  # +-0
            1,
            3,
            (1 << (P - 1)) - 1,  # subnormals
            exp_mask,
            exp_mask | (1 << (W - 1)) if W < 64 else exp_mask | (1 << 63),  # +-inf
            exp_mask | 1,
            exp_mask | (1 << (P - 2)),  # NaNs
            (1 << (P - 1)),  # smallest normal
            ((1 << E) - 2) << (P - 1) | ((1 << (P - 1)) - 1),  # largest normal
        ],
        dtype=np.uint64,
    ) & np.uint64((1 << W) - 1 if W < 64 else 2**64 - 1)
    bits[: len(specials)] = specials
    return bits.astype(np.uint64)


@pytest.mark.parametrize("name", ["f16", "f32", "f64"])
def test_sf_mul_matches_numpy(name):
    W, E, P = WEP[name]
    udt = UDT[name]
    nt = NUMBER_TYPES_BY_NAME[name]
    rng = np.random.default_rng(5)
    x_bits = _adversarial_bits(name, rng)
    xs = x_bits.astype(udt).view(nt.np_dtype)
    for yv in [0.01, 0.25, 3.0, 1e3, 1.0 / 3.0]:
        y = nt.np_dtype.type(yv)
        with np.errstate(all="ignore"):
            want = np.multiply(xs, y).view(udt).astype(np.uint64)
        y_bits = np.uint64(np.asarray(y).view(udt))
        got = np.asarray(
            sf.sf_mul_bits(jnp.asarray(x_bits), jnp.uint64(y_bits), W, E, P)
        )
        bad = got != want
        assert not bad.any(), (
            name, yv, x_bits[bad][:4], got[bad][:4], want[bad][:4])


@pytest.mark.parametrize("name", ["f16", "f32", "f64"])
def test_round_half_away_latent(name):
    W, E, P = WEP[name]
    udt = UDT[name]
    nt = NUMBER_TYPES_BY_NAME[name]
    rng = np.random.default_rng(6)
    p_bits = _adversarial_bits(name, rng)
    # exact halves and near-halves
    extra = []
    for k in range(-2, P + 2):
        for frac in (0.0, 0.5, 0.25, 0.75):
            v = nt.np_dtype.type(2.0**k + frac)
            extra.append(np.asarray(v).view(udt))
            extra.append(np.asarray(-v).view(udt))
    p_bits = np.concatenate([p_bits, np.array(extra, np.uint64)])
    ps = p_bits.astype(udt).view(nt.np_dtype)
    with np.errstate(all="ignore"):
        want = nt.int_float_to_latent(round_half_away(ps)).astype(np.uint64)
    got = np.asarray(sf.round_half_away_latent(jnp.asarray(p_bits), W, E, P))
    bad = got != want
    assert not bad.any(), (name, p_bits[bad][:4], got[bad][:4], want[bad][:4])


@pytest.mark.parametrize("name", ["f16", "f32", "f64"])
def test_int_float_latent_to_bits(name):
    W, E, P = WEP[name]
    udt = UDT[name]
    nt = NUMBER_TYPES_BY_NAME[name]
    rng = np.random.default_rng(7)
    mid = 1 << (W - 1)
    lats = rng.integers(0, 1 << min(W, 63), 4096, dtype=np.uint64)
    if W == 64:
        lats |= rng.integers(0, 2, 4096, dtype=np.uint64) << np.uint64(63)
    lats &= np.uint64((1 << W) - 1 if W < 64 else 2**64 - 1)
    lats[:8] = np.array(
        [mid, mid - 1, mid + 1, mid + (1 << P), mid - (1 << P), 0,
         (1 << W) - 1 if W < 64 else 2**64 - 1, mid + (1 << P) - 1],
        np.uint64,
    )
    want = (
        nt.int_float_from_latent(lats.astype(udt)).view(udt).astype(np.uint64)
    )
    got = np.asarray(sf.int_float_latent_to_bits(jnp.asarray(lats), W, E, P))
    bad = got != want
    assert not bad.any(), (name, lats[bad][:4], got[bad][:4], want[bad][:4])


@pytest.mark.parametrize("name", ["f16", "f32", "f64"])
def test_float_mult_split_device_matches_host(name):
    W, E, P = WEP[name]
    udt = UDT[name]
    nt = NUMBER_TYPES_BY_NAME[name]
    rng = np.random.default_rng(8)
    # decimal-ish data the mode targets, plus adversarial bit patterns
    x = (rng.integers(-10000, 10000, 4096) * 0.01).astype(nt.np_dtype)
    x_bits = np.concatenate(
        [x.view(udt).astype(np.uint64), _adversarial_bits(name, rng)]
    )
    xs = x_bits.astype(udt).view(nt.np_dtype)
    for bv in (0.01, 0.25):
        base = nt.np_dtype.type(bv)
        inv_base = nt.np_dtype.type(1.0) / base
        with np.errstate(all="ignore"):
            want_p, want_a = float_mult.split_latents(nt, xs, base, inv_base)
        lat = nt.to_latent_ordered(xs).astype(np.uint64)
        got_p, got_a = sf.float_mult_split_device(
            jnp.asarray(lat),
            jnp.uint64(np.asarray(inv_base).view(udt)),
            jnp.uint64(np.asarray(base).view(udt)),
            W, E, P,
        )
        got_p = np.asarray(got_p)
        got_a = np.asarray(got_a)
        bad = (got_p != want_p.astype(np.uint64)) | (
            got_a != want_a.astype(np.uint64))
        assert not bad.any(), (
            name, bv, x_bits[bad][:4], got_p[bad][:4],
            want_p.astype(np.uint64)[bad][:4])
