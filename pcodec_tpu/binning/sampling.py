"""Deterministic sampling for mode detection.

Reproduces the reference's Xoroshiro128++-seeded sample-without-replacement
exactly (ref: pco/src/sampling.rs:19-63) so that auto mode/delta decisions —
and therefore compressed sizes — match.
"""

import numpy as np

from pcodec_tpu.constants import CLASSIC_MEMORIZABLE_BINS_LOG
from pcodec_tpu.rng import Xoroshiro128PlusPlus

MIN_SAMPLE = 10
SAMPLE_RATIO = 40
SAMPLING_PERSISTENCE = 4
CLASSIC_MEMORIZABLE_BINS = float(1 << CLASSIC_MEMORIZABLE_BINS_LOG)


def calc_sample_n(n: int):
    if n >= MIN_SAMPLE:
        return MIN_SAMPLE + (n - MIN_SAMPLE) // SAMPLE_RATIO
    return None


def choose_sample_indices(n: int, keep_mask=None):
    """Indices of the reference-identical sample, in draw order."""
    target = calc_sample_n(n)
    if target is None:
        return None
    rng = Xoroshiro128PlusPlus.seed_from_u64(0)
    visited = bytearray((n + 7) // 8)
    res = []
    n_iters = 0
    limit = SAMPLING_PERSISTENCE * target
    while len(res) < target and n_iters < limit:
        idx = rng.next_u64() % n
        byte, bit = idx >> 3, idx & 7
        if not (visited[byte] >> bit) & 1:
            if keep_mask is None or keep_mask[idx]:
                res.append(idx)
            visited[byte] |= 1 << bit
        n_iters += 1
    if len(res) >= MIN_SAMPLE:
        return np.array(res, dtype=np.int64)
    return None


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
