"""Deterministic sampling for mode detection.

Reproduces the reference's Xoroshiro128++-seeded sample-without-replacement
exactly (ref: pco/src/sampling.rs:19-63) so that auto mode/delta decisions —
and therefore compressed sizes — match.
"""

import numpy as np

from pcodec_tpu.constants import CLASSIC_MEMORIZABLE_BINS_LOG
from pcodec_tpu.rng import Xoroshiro128PlusPlus

try:
    from pcodec_tpu.native import kernels as _native
except Exception:  # pragma: no cover
    _native = None

MIN_SAMPLE = 10
SAMPLE_RATIO = 40
SAMPLING_PERSISTENCE = 4
CLASSIC_MEMORIZABLE_BINS = float(1 << CLASSIC_MEMORIZABLE_BINS_LOG)


def calc_sample_n(n: int):
    if n >= MIN_SAMPLE:
        return MIN_SAMPLE + (n - MIN_SAMPLE) // SAMPLE_RATIO
    return None


def sample_draws(n: int):
    """(draws, is_first, target) of the deterministic draw stream, or None.

    draws are the raw Xoroshiro picks mod n (with repeats); is_first marks
    the first occurrence of each index in draw order."""
    target = calc_sample_n(n)
    if target is None:
        return None
    limit = SAMPLING_PERSISTENCE * target
    rng = Xoroshiro128PlusPlus.seed_from_u64(0)
    if _native is not None:
        draws = _native.xoroshiro_fill(rng.s0, rng.s1, limit) % np.uint64(n)
    else:
        draws = np.empty(limit, dtype=np.uint64)
        for i in range(limit):
            draws[i] = rng.next_u64()
        draws %= np.uint64(n)
    draws = draws.astype(np.int64)
    # first occurrence of each index, in draw order
    order = np.argsort(draws, kind="stable")
    sorted_draws = draws[order]
    is_first_sorted = np.empty(limit, dtype=bool)
    is_first_sorted[0] = True
    np.not_equal(sorted_draws[1:], sorted_draws[:-1], out=is_first_sorted[1:])
    is_first = np.empty(limit, dtype=bool)
    is_first[order] = is_first_sorted
    return draws, is_first, target


def select_sample_indices(draws, is_first, target, keep_at_draws=None):
    """The accepted sample positions given per-draw keep flags (the
    visited-set semantics of the reference's sampler, sampling.rs:28-63)."""
    accepted = is_first if keep_at_draws is None else (is_first & keep_at_draws)
    # stop once `target` draws have been accepted
    acc_count = np.cumsum(accepted)
    cut = np.searchsorted(acc_count, target, side="left") + 1
    res = draws[:cut][accepted[:cut]]
    if len(res) >= MIN_SAMPLE:
        return res
    return None


def choose_sample_indices(n: int, keep_mask=None):
    """Indices of the reference-identical sample, in draw order."""
    d = sample_draws(n)
    if d is None:
        return None
    draws, is_first, target = d
    keep = None if keep_mask is None else np.asarray(keep_mask)[draws]
    return select_sample_indices(draws, is_first, target, keep)


def choose_sample(vals: np.ndarray, keep_mask=None):
    """Sampled values (already elementwise-transformed by the caller)."""
    idxs = choose_sample_indices(len(vals), keep_mask)
    if idxs is None:
        return None
    return vals[idxs]


def est_bits_saved_per_num(primary: np.ndarray, bits_saved: np.ndarray) -> float:
    """Savings estimate ignoring "memorizable" primaries.

    ref: pco/src/sampling.rs:71-101 — primaries occurring more than
    len/256 times in the sample contribute nothing (classic mode would
    memorize them as bins anyway).
    """
    n = len(primary)
    _, inverse, counts = np.unique(primary, return_inverse=True, return_counts=True)
    infrequent_cutoff = max(1, int(n / CLASSIC_MEMORIZABLE_BINS))
    keep = counts[inverse] <= infrequent_cutoff
    return float(np.sum(np.asarray(bits_saved, dtype=np.float64)[keep])) / n
