"""Encode-side delta machinery: lookback chooser/encoder, conv1 fitting.

ref: pco/src/delta/lookback.rs:13-198, conv1.rs:255-462. The lookback
proposal/scoring loop is ported exactly (it determines the emitted file);
conv1's least-squares fit uses numpy linear algebra — the normal equations,
regularization, and fixed-point quantization rules match the reference, but
float rounding of the fitted weights may differ by an ULP (the emitted file
is still valid and equally compact; conv1 is opt-in and never auto-chosen).
"""

import numpy as np

from pcodec_tpu import constants as c
from pcodec_tpu.delta import toggle_center
from pcodec_tpu.errors import InvalidArgumentError
from pcodec_tpu.format.metadata import DeltaEncoding
from pcodec_tpu.utils import bits_to_encode_offset

# ---------------------------------------------------------------------------
# lookback
# ---------------------------------------------------------------------------

PROPOSED_LOOKBACKS = 16
BRUTE_LOOKBACKS = 6
REPEATING_LOOKBACKS = 4
COARSENESSES = (0, 8)
_M64 = (1 << 64) - 1


def new_lookback(n: int) -> DeltaEncoding:
    window_n_log = min(
        max(bits_to_encode_offset(n - 1), c.LOOKBACK_MIN_WINDOW_N_LOG),
        c.LOOKBACK_MAX_WINDOW_N_LOG,
    )
    return DeltaEncoding.lookback(window_n_log, 0)


def choose_lookbacks(encoding: DeltaEncoding, latents: np.ndarray) -> np.ndarray:
    """Exact port of the 16-candidate proposal loop (ref: lookback.rs:101-164)."""
    state_n = encoding.state_n
    n = len(latents)
    if n <= state_n:
        return np.zeros(0, dtype=np.uint32)

    try:
        from pcodec_tpu.native import kernels as _native
    except Exception:
        _native = None
    if _native is not None:
        return _native.choose_lookbacks_native(encoding.window_n_log, state_n, latents)

    hash_table_n = 1 << (encoding.window_n_log + 1)
    hash_mask = hash_table_n - 1
    window_n = encoding.window_n
    assert window_n >= PROPOSED_LOOKBACKS

    lat_u64 = latents.astype(np.uint64).tolist()
    lat = latents.tolist()
    bits = latents.dtype.itemsize * 8
    mask_l = (1 << bits) - 1

    lookback_counts = [1] * min(window_n, n)
    lookbacks = np.zeros(n - state_n, dtype=np.uint32)
    idx_hash_table = [0] * (len(COARSENESSES) * hash_table_n)
    proposed = [min(i + 1, state_n) for i in range(PROPOSED_LOOKBACKS)]
    best_lookback = 1
    repeating_idx = 0

    def hash_fn(x):
        x = ((x ^ (x >> 32)) * 11400714819323197441) & _M64
        x ^= x >> 32
        return x & hash_mask

    for i in range(state_n, n):
        l = lat[i]
        l64 = lat_u64[i]

        new_brute = min(i, PROPOSED_LOOKBACKS)
        proposed[new_brute - 1] = new_brute

        # hash proposals
        prop_idx = BRUTE_LOOKBACKS + REPEATING_LOOKBACKS
        offset = 0
        for coarseness in COARSENESSES:
            bucket = l64 >> coarseness
            hs = (
                hash_fn((bucket - 1) & _M64),
                hash_fn(bucket),
                hash_fn((bucket + 1) & _M64),
            )
            for h in hs:
                lb_last = i - idx_hash_table[offset + h]
                proposed[prop_idx] = lb_last if lb_last <= window_n else min(prop_idx, i)
                prop_idx += 1
            idx_hash_table[offset + hs[1]] = i
            offset += hash_table_n

        # score proposals
        best_goodness = 0
        best = 0
        for lookback in proposed:
            count = lookback_counts[lookback - 1]
            other = lat[i - lookback]
            lookback_goodness = count.bit_length()
            d1 = (l - other) & mask_l
            d2 = (other - l) & mask_l
            delta = d1 if d1 < d2 else d2
            delta_goodness = bits - delta.bit_length()
            goodness = lookback_goodness + delta_goodness
            if goodness > best_goodness:
                best_goodness = goodness
                best = lookback

        if best != best_lookback:
            repeating_idx += 1
        proposed[BRUTE_LOOKBACKS + repeating_idx % REPEATING_LOOKBACKS] = best
        best_lookback = best
        lookbacks[i - state_n] = best
        lookback_counts[best - 1] += 1

    return lookbacks


def lookback_encode(encoding: DeltaEncoding, lookbacks: np.ndarray, latents: np.ndarray):
    """Returns (deltas_with_junk_front, state); ref: lookback.rs:166-198."""
    state_n = encoding.state_n
    n = len(latents)
    real_state_n = min(n, state_n)
    out = latents.copy()
    idx = np.arange(real_state_n, n)
    lb = lookbacks[idx - state_n].astype(np.int64)
    out[real_state_n:] = latents[real_state_n:] - latents[idx - lb]
    state = np.zeros(state_n, dtype=latents.dtype)
    state[state_n - real_state_n :] = out[:real_state_n]
    return toggle_center(out), state


# ---------------------------------------------------------------------------
# conv1
# ---------------------------------------------------------------------------

L2_REGULARIZATION = 0.1


def _choose_pivot(latents: np.ndarray):
    """Median-of-3(-of-medians) pivot (ref: pco/src/sort_utils.rs:5-50)."""
    n = len(latents)
    a, b, cc = n // 4, n // 2, (n * 3) // 4
    if n >= 8:
        def sort2(i, j):
            if latents[j] < latents[i]:
                return j, i
            return i, j

        def sort3(i, j, k):
            i, j = sort2(i, j)
            j, k = sort2(j, k)
            i, j = sort2(i, j)
            return i, j, k

        if n >= 50:
            def sort_adjacent(i):
                _, m, _ = sort3(i - 1, i, i + 1)
                return m

            a, b, cc = sort_adjacent(a), sort_adjacent(b), sort_adjacent(cc)
        a, b, cc = sort3(a, b, cc)
    return latents[b]


def conv1_choose_config(order: int, latents: np.ndarray):
    """Fit LPC weights; returns DeltaEncoding or None (ref: conv1.rs:363-421)."""
    bits = latents.dtype.itemsize * 8
    if bits > 32:
        raise InvalidArgumentError("Conv1 delta encoding cannot be used with 64-bit latents")
    if len(latents) < order + 1:
        return None

    center = _choose_pivot(latents)
    c64 = np.int64(np.uint64(center))
    v = (latents.astype(np.int64) - c64).astype(np.float64)

    n = len(v)
    # normal equations for v_i ~ [v_{i-order} .. v_{i-1}, 1] @ beta
    m = n - order
    cols = [v[j : j + m] for j in range(order)] + [np.ones(m)]
    X = np.stack(cols, axis=1)
    y = v[order:n]
    xtx = X.T @ X + L2_REGULARIZATION * np.eye(order + 1)
    xty = X.T @ y
    try:
        beta = np.linalg.solve(xtx, xty)
    except np.linalg.LinAlgError:
        return None

    float_weights = beta[:order]
    total_weight = float(np.sum(float_weights))
    total_abs_weight = float(np.sum(np.abs(float_weights)))
    if not (np.isfinite(total_weight) and np.isfinite(total_abs_weight)):
        return None
    float_bias = (1.0 - total_weight) * float(np.uint64(center)) + float(beta[order])

    conv_bits = 16 if bits == 8 else 32 if bits == 16 else 64
    conv_max = float((1 << (conv_bits - 1)) - 1)
    l_max = float((1 << bits) - 1)
    denom = total_abs_weight * l_max + abs(float_bias) + 1.0
    quantization = int(np.floor(np.log2(conv_max / denom))) - 1
    quantization = min(quantization, c.MAX_CONV1_DELTA_QUANTIZATION, conv_bits - 1)
    if quantization < 0:
        return None
    qf = 2.0 ** quantization
    # rust `(x * qf).round()`: half away from zero
    weights = []
    for w in float_weights:
        x = w * qf
        t = np.trunc(x)
        weights.append(int(t + (1 if x - t >= 0.5 else -1 if x - t <= -0.5 else 0)))
    bias = int(float_bias * qf)  # rust `as i64` truncates
    return DeltaEncoding.conv1(quantization, bias, weights)


def conv1_encode(encoding: DeltaEncoding, latents: np.ndarray):
    """Returns (residuals_with_junk_front, state); ref: conv1.rs:423-462.

    Predictions depend only on the original latents, so this vectorizes.
    """
    order = len(encoding.weights)
    state = latents[:order].copy()
    n = len(latents)
    out = latents.copy()
    if n > order:
        acc = np.full(n - order, encoding.bias, dtype=np.int64)
        for j, w in enumerate(encoding.weights):
            acc += np.int64(w) * latents[j : j + n - order].astype(np.int64)
        preds = (np.maximum(acc, 0) >> np.int64(encoding.quantization)).astype(
            np.uint64
        ).astype(latents.dtype)
        mid = latents.dtype.type(1) << latents.dtype.type(latents.dtype.itemsize * 8 - 1)
        out[order:] = latents[order:] - preds + mid
    return out, state
