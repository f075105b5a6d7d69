"""Generic IEEE-754 binary multiply + FloatMult split primitives in pure
u64 integer ops.

TPU f64 is emulated and not bit-faithful, and even f32/f16 device float ops
must not be trusted for byte-identity with the host encoder (x86 IEEE incl.
subnormals, which TPUs flush in some paths). These routines reproduce
numpy's multiply semantics bit-for-bit — round-to-nearest-even, subnormal
inputs/outputs, signed zeros, overflow to inf, and x86 NaN propagation
(first operand's NaN quieted, payload and sign preserved) — so the
FloatMult encoder split (mode/float_mult.rs split_latents: mult =
(x * inv_base).round(); adj = x.to_latent() - (mult * base).to_latent())
can run on device for f16/f32/f64.

Everything is vectorized jnp on u64 arrays holding W-bit patterns in the
low bits; W/E/P (width, exponent bits, mantissa digits incl. implicit)
are static per dtype.
"""

from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)  # all bit fields are u64-widened

__all__ = [
    "sf_mul_bits",
    "round_half_away_latent",
    "int_float_latent_to_bits",
    "ordered_from_bits",
    "bits_from_ordered",
    "float_mult_split_device",
]


def _u(v):
    return jnp.uint64(v)


def _msb_pos(x):
    """floor(log2(x)) for x > 0 (returns 0 for x == 0), integer-only."""
    pos = jnp.zeros(x.shape, jnp.uint64)
    for k in (32, 16, 8, 4, 2, 1):
        big = (x >> _u(k)) > 0
        x = jnp.where(big, x >> _u(k), x)
        pos = pos + jnp.where(big, _u(k), _u(0))
    return pos


def _mul_dbl(a, b):
    """Full product of u64 a,b (each < 2^53) -> (hi, lo) u64."""
    m32 = _u(0xFFFFFFFF)
    ah, al = a >> _u(32), a & m32
    bh, bl = b >> _u(32), b & m32
    ll = al * bl
    mid = al * bh + ah * bl + (ll >> _u(32))  # < 2^63 for 53-bit inputs
    lo = (ll & m32) | (mid << _u(32))
    hi = (ah * bh) + (mid >> _u(32))
    return hi, lo


def ordered_from_bits(bits, W):
    """Float memory bits -> order-preserving latent (float bijection,
    ref: data_types/float.rs:396-416). W-bit patterns in u64."""
    mask = _u((1 << W) - 1) if W < 64 else _u(0xFFFFFFFFFFFFFFFF)
    sign = _u(1 << (W - 1))
    neg = (bits & sign) != 0
    return jnp.where(neg, (~bits) & mask, bits ^ sign)


def bits_from_ordered(lat, W):
    """Inverse float bijection: ordered latent -> memory bits."""
    mask = _u((1 << W) - 1) if W < 64 else _u(0xFFFFFFFFFFFFFFFF)
    sign = _u(1 << (W - 1))
    neg = (lat & sign) == 0
    return jnp.where(neg, (~lat) & mask, lat ^ sign)


def sf_mul_bits(x, y, W, E, P):
    """IEEE round-to-nearest-even product bits of two W-bit floats.

    y must be normal (the planner guarantees base / inv_base are); x may be
    anything: NaN -> x with the quiet bit set (x86 mul semantics), inf ->
    signed inf, zero/subnormal handled exactly, product overflow -> inf,
    product subnormal/underflow rounded correctly.
    """
    bias = (1 << (E - 1)) - 1
    sign_bit = _u(1 << (W - 1))
    mant_mask = _u((1 << (P - 1)) - 1)
    exp_raw_mask = _u((1 << E) - 1)
    implicit = _u(1 << (P - 1))
    quiet = _u(1 << (P - 2))
    inf_field = _u(((1 << E) - 1) << (P - 1))

    sx = x & sign_bit
    ex = (x >> _u(P - 1)) & exp_raw_mask
    mx = x & mant_mask
    sy = y & sign_bit
    ey = (y >> _u(P - 1)) & exp_raw_mask
    my = y & mant_mask

    is_nan = (ex == exp_raw_mask) & (mx != 0)
    is_inf = (ex == exp_raw_mask) & (mx == 0)
    is_zero = (ex == 0) & (mx == 0)
    sub = (ex == 0) & (mx != 0)

    # normalize x's mantissa to [2^(P-1), 2^P); value = mA * 2^(eA-(P-1))
    q = _msb_pos(jnp.maximum(mx, _u(1)))
    mA = jnp.where(sub, mx << (_u(P - 1) - q), mx | implicit)
    eA = jnp.where(
        sub,
        q.astype(jnp.int64) - (P - 1) + (1 - bias),
        ex.astype(jnp.int64) - bias,
    )
    mB = my | implicit
    eB = ey.astype(jnp.int64) - bias

    hi, lo = _mul_dbl(mA, mB)
    # align the 2P-bit product so its top set bit lands at 63 (big) or 62
    if 2 * P > 64:
        drop = 2 * P - 64
        sticky0 = (lo & _u((1 << drop) - 1)) != 0
        v = (hi << _u(64 - drop)) | (lo >> _u(drop))
    else:
        sticky0 = jnp.zeros(x.shape, bool)
        v = lo << _u(64 - 2 * P)
    big = (v >> _u(63)) != 0

    er = eA + eB + jnp.where(big, 1, 0)  # unbiased result exponent
    erb = er + bias
    # alignment shift to P-bit mantissa incl. implicit; +extra for subnormal
    s_base = jnp.where(big, jnp.int64(64 - P), jnp.int64(63 - P))
    extra = jnp.maximum(jnp.int64(1) - erb, jnp.int64(0))
    s_unc = s_base + extra
    s = jnp.clip(s_unc, 1, 63).astype(jnp.uint64)

    mant = v >> s
    rbit = (v >> (s - _u(1))) & _u(1)
    sticky = sticky0 | ((v & ((_u(1) << (s - _u(1))) - _u(1))) != 0)
    # deep underflow: s_unc == 64 keeps only the top bit as the round bit;
    # s_unc > 64 shifts everything into sticky (v != 0 by construction)
    mant = jnp.where(s_unc > 63, _u(0), mant)
    rbit = jnp.where(
        s_unc == 64, v >> _u(63), jnp.where(s_unc > 64, _u(0), rbit))
    sticky = jnp.where(
        s_unc == 64,
        sticky0 | ((v & _u((1 << 63) - 1)) != 0),
        jnp.where(s_unc > 64, True, sticky),
    )

    ebm1 = jnp.maximum(erb - 1, jnp.int64(0)).astype(jnp.uint64)
    # (ebm1 << (P-1)) + mant-with-implicit encodes normals, subnormals, and
    # lets the rounding carry ripple into the exponent (incl. mant -> 2^P
    # and subnormal -> normal promotions)
    bits = (ebm1 << _u(P - 1)) + mant
    round_up = (rbit == 1) & (sticky | ((mant & _u(1)) == 1))
    bits = bits + jnp.where(round_up, _u(1), _u(0))
    bits = jnp.where(bits >= inf_field, inf_field, bits)

    sign = sx ^ sy
    out = sign | bits
    out = jnp.where(is_zero, sign, out)
    out = jnp.where(is_inf, sign | inf_field, out)
    out = jnp.where(is_nan, x | quiet, out)
    return out


def round_half_away_latent(p, W, E, P):
    """int_float_to_latent(round_half_away(p)) in pure bit ops.

    ref: utils.round_half_away (Rust f__::round, half away from zero) then
    data_types/float.rs:231-246 (generalized precision ints). Matches the
    host for every input incl. inf/NaN (bit-trick big path) and signed
    zeros (sign decides mid vs mid-1).
    """
    bias = (1 << (E - 1)) - 1
    sign_bit = _u(1 << (W - 1))
    mid = _u(1 << (W - 1))
    mant_mask = _u((1 << (P - 1)) - 1)
    exp_raw_mask = _u((1 << E) - 1)
    implicit = _u(1 << (P - 1))
    gpi = _u(1 << P)
    gpi_bits = _u((P + bias) << (P - 1))  # memory bits of float(2^P)

    neg = (p & sign_bit) != 0
    abs_bits = p & (sign_bit - _u(1))
    ex = (p >> _u(P - 1)) & exp_raw_mask
    e = ex.astype(jnp.int64) - bias  # subnormals land at e = -bias (< -1)

    m = (p & mant_mask) | implicit
    # 0 <= e <= P-2: integer part + round-half-away bump from the top
    # fraction bit; k = P-1-e in [1, P-1]
    k = jnp.clip(jnp.int64(P - 1) - e, 1, P - 1).astype(jnp.uint64)
    small_abs = (m >> k) + ((m >> (k - _u(1))) & _u(1))

    is_sub_or_zero = ex == 0
    abs_int = jnp.where(e < -1, _u(0), jnp.where(e == -1, _u(1), small_abs))
    abs_int = jnp.where(is_sub_or_zero, _u(0), abs_int)
    big = e >= jnp.int64(P - 1)  # integer already; covers inf/NaN too
    # trunc quiets signaling NaNs before the bit-trick path sees them
    is_nan = (ex == ((_u(1) << _u(E)) - _u(1))) & ((p & mant_mask) != 0)
    abs_bits = jnp.where(is_nan, abs_bits | _u(1 << (P - 2)), abs_bits)
    abs_lat = jnp.where(big, gpi + (abs_bits - gpi_bits), abs_int)
    # trunc(x) + 0.0 turns a -0.0 result positive: zero is always latent mid
    neg = neg & ((abs_lat != 0) | big)
    return jnp.where(neg, mid - _u(1) - abs_lat, mid + abs_lat)


def int_float_latent_to_bits(lat, W, E, P):
    """Float memory bits of the integer-valued float a latent denotes
    (inverse of round_half_away_latent's mapping; ref: float.rs:210-229)."""
    bias = (1 << (E - 1)) - 1
    sign_bit = _u(1 << (W - 1))
    mid = _u(1 << (W - 1))
    gpi = _u(1 << P)
    gpi_bits = _u((P + bias) << (P - 1))

    neg = lat < mid
    a = jnp.where(neg, (mid - _u(1)) - lat, lat - mid)
    # small path: exact int -> float bits for 0 < a < 2^P
    t = _msb_pos(jnp.maximum(a, _u(1)))
    mant = (a << (_u(P - 1) - t)) & (_u(1 << (P - 1)) - _u(1))
    small_bits = ((t + _u(bias)) << _u(P - 1)) | mant
    small_bits = jnp.where(a == 0, _u(0), small_bits)
    bits = jnp.where(a < gpi, small_bits, gpi_bits + (a - gpi))
    # negation is a sign-bit FLIP (np.negative): the big-path bit trick can
    # carry into the sign bit, which -x then clears
    return jnp.where(neg, bits ^ sign_bit, bits)


def float_mult_primary(lat, invb_bits, W, E, P):
    """FloatMult primary latent from ordered latents:
    int_float_to_latent((x * inv_base).round()); invb_bits broadcastable
    u64. ref: mode/float_mult.rs split_latents."""
    x_bits = bits_from_ordered(lat, W)
    p = sf_mul_bits(x_bits, invb_bits, W, E, P)
    return round_half_away_latent(p, W, E, P)


def float_mult_adjustment(lat, prim, base_bits, W, E, P):
    """FloatMult adjustment latent: x.to_latent() - (mult * base).to_latent()
    + MID, where mult is the integer-valued float prim denotes."""
    mask = _u((1 << W) - 1) if W < 64 else _u(0xFFFFFFFFFFFFFFFF)
    mid = _u(1 << (W - 1))
    mult_bits = int_float_latent_to_bits(prim, W, E, P)
    prod2 = sf_mul_bits(mult_bits, base_bits, W, E, P)
    return (lat - ordered_from_bits(prod2, W) + mid) & mask


@partial(jax.jit, static_argnames=("W", "E", "P"))
def float_mult_split_device(lat, invb_bits, base_bits, W, E, P):
    """FloatMult split on ordered latents: returns (primary latent,
    adjustment latent) u64 rows. invb_bits/base_bits broadcastable u64.

    ref: mode/float_mult.rs split_latents — primary =
    int_float_to_latent((x * inv_base).round()), adj = x.to_latent() -
    (mult * base).to_latent() + MID, all in the number's own float width.
    """
    prim = float_mult_primary(lat, invb_bits, W, E, P)
    adj = float_mult_adjustment(lat, prim, base_bits, W, E, P)
    return prim, adj
