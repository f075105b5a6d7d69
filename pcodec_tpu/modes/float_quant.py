"""FloatQuant mode: x_bits = (l0 << k) + adj with sign-dependent flip.

ref: pco/src/mode/float_quant.rs. k is chosen from a cumulative histogram of
trailing mantissa zeros, maximizing worst-case bits saved.
"""

import numpy as np

from pcodec_tpu.binning import sampling
from pcodec_tpu.constants import QUANT_REQUIRED_BITS_SAVED_PER_NUM
from pcodec_tpu.dtypes import NumberType
from pcodec_tpu.modes.int_mult import worst_case_categorical_entropy


def split_latents(nt: NumberType, nums: np.ndarray, k: int):
    L = nt.latent.np_dtype
    u = nt.to_latent_ordered(nums)
    kk = L.type(k)
    primary = u >> kk
    lowest_k_bits_max = (L.type(1) << kk) - L.type(1)
    lowest = u & lowest_k_bits_max
    pos = ~np.signbit(np.ascontiguousarray(nums, dtype=nt.np_dtype))
    secondary = np.where(pos, lowest, lowest_k_bits_max - lowest)
    return primary, secondary


def estimate_best_k_and_bits_saved(nt: NumberType, sample: np.ndarray):
    """ref: float_quant.rs:1103-1159."""
    pb = nt.precision_bits
    tz = np.minimum(nt.trailing_zeros(sample), pb)
    hist = np.bincount(tz, minlength=pb + 1)
    cum = np.cumsum(hist[::-1])[::-1]  # at least k trailing zeros

    sample_len = float(len(sample))
    best_k, best_bits_saved = 0, 0.0
    for k in range(1, pb + 1):
        occurrences = int(cum[k])
        if occurrences == 0:
            continue
        freq = occurrences / sample_len
        n_categories_m1 = float((1 << k) - 1)
        worst_case = worst_case_categorical_entropy(freq, n_categories_m1)
        bits_saved = k - worst_case
        if bits_saved > best_bits_saved:
            best_k, best_bits_saved = k, bits_saved
        else:
            break
    return best_k, best_bits_saved


def compute_bid(nt: NumberType, sample: np.ndarray):
    """Returns (k, bits_saved_per_num) or None."""
    k, bits_saved_per_primary = estimate_best_k_and_bits_saved(nt, sample)
    bits_u = np.ascontiguousarray(sample, dtype=nt.np_dtype).view(nt.latent.np_dtype)
    primary = bits_u >> nt.latent.np_dtype.type(k) if k else bits_u
    bits_saved = np.full(len(sample), bits_saved_per_primary)
    est = sampling.est_bits_saved_per_num(primary, bits_saved)
    if est > QUANT_REQUIRED_BITS_SAVED_PER_NUM:
        return k, est
    return None
