"""IntMult mode: x = base * mult + adj (ref: pco/src/mode/int_mult.rs).

Base detection: GCDs of sorted sample triples, a frequentist z-test against
the uniform-residue null, then worst-case-entropy bits-saved scoring with a
false-position root solve. Triple GCDs are vectorized with np.gcd.
"""

import math

import numpy as np

from pcodec_tpu.binning import sampling
from pcodec_tpu.constants import MULT_REQUIRED_BITS_SAVED_PER_NUM
from pcodec_tpu.dtypes import NumberType

ZETA_OF_2 = math.pi * math.pi / 6.0
LCB_RATIO = 1.0


def split_latents(nt: NumberType, nums: np.ndarray, base: int):
    u = nt.to_latent_ordered(nums)
    b = u.dtype.type(base)
    return u // b, u % b


def single_category_entropy(p: float) -> float:
    if p == 0.0 or p == 1.0:
        return 0.0
    return -p * math.log2(p)


def worst_case_categorical_entropy(concentrated_p: float, n_categories_m1: float) -> float:
    return single_category_entropy(concentrated_p) + n_categories_m1 * single_category_entropy(
        (1.0 - concentrated_p) / n_categories_m1
    )


def solve_root_by_false_position(f, lb: float, ub: float):
    """ref: int_mult.rs:93-118."""
    X_TOLERANCE = 1e-4
    flb, fub = f(lb), f(ub)
    if flb > 0.0 or fub < 0.0:
        return None
    while ub - lb > X_TOLERANCE and fub - flb > 0.0:
        lb_prop = 0.001 + 0.998 * fub / (fub - flb)
        mid = lb_prop * lb + (1.0 - lb_prop) * ub
        fmid = f(mid)
        if fmid < 0.0:
            lb, flb = mid, fmid
        else:
            ub, fub = mid, fmid
    return (lb + ub) / 2.0


def filter_score_triple_gcd(gcd: float, triples_w_gcd: int, total_triples: int):
    """ref: int_mult.rs:138-207."""
    triples_w_gcd = float(triples_w_gcd)
    total_triples_f = float(total_triples)
    prob_per_triple = triples_w_gcd / total_triples_f

    natural_prob = 1.0 / (ZETA_OF_2 * gcd * gcd)
    stdev = math.sqrt(natural_prob * (1.0 - natural_prob) / total_triples_f)
    z_score = (prob_per_triple - natural_prob) / stdev
    if z_score < 3.0:
        return None

    triples_w_gcd_lcb = triples_w_gcd - LCB_RATIO * math.sqrt(triples_w_gcd)
    if triples_w_gcd_lcb <= 0.0:
        return None
    congruence_prob_lcb = min(ZETA_OF_2 * triples_w_gcd_lcb / total_triples_f, 1.0)

    gcd_m1 = gcd - 1.0
    gcd_m1_inv_sq = 1.0 / (gcd_m1 * gcd_m1)

    def f(p):
        return p**3 + (1.0 - p) ** 3 * gcd_m1_inv_sq - congruence_prob_lcb

    lb = 1.0 / gcd
    ub = np.cbrt(congruence_prob_lcb) + np.finfo(np.float64).eps
    concentrated_p = solve_root_by_false_position(f, lb, float(ub))
    if concentrated_p is None:
        return None
    worst_case_entropy = worst_case_categorical_entropy(concentrated_p, gcd_m1)
    worst_case_bits_saved = math.log2(gcd) - worst_case_entropy
    if worst_case_bits_saved < MULT_REQUIRED_BITS_SAVED_PER_NUM:
        return None
    return worst_case_bits_saved


def choose_candidate_from_gcd_counts(uniq, counts, n_triples: int):
    """Score unique triple-GCD counts (ascending gcd order) and pick the
    best candidate. Split out so device-train can feed device-reduced
    (gcd, count) pairs without fetching the sample (ref: int_mult.rs:203)."""
    best = None
    for gcd_val, count in zip(uniq, counts):
        gcd_f = float(min(int(gcd_val), (1 << 64) - 1))
        score = filter_score_triple_gcd(gcd_f, int(count), n_triples)
        if score is None:
            continue
        # ties keep the later (larger gcd) like Rust's max_by_key over i64 bits
        if best is None or score >= best[1]:
            best = (int(gcd_val), score)
    return best


def choose_candidate_base(sample: np.ndarray):
    """Returns (base, score) or None; sample is a latent array."""
    n_triples = len(sample) // 3
    if n_triples == 0:
        return None
    t = np.sort(sample[: n_triples * 3].reshape(n_triples, 3), axis=1)
    gcds = np.gcd(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
    gcds = gcds[gcds > 1]
    if len(gcds) == 0:
        return None
    uniq, counts = np.unique(gcds, return_counts=True)
    return choose_candidate_from_gcd_counts(uniq.tolist(), counts.tolist(), n_triples)


def choose_base(nt: NumberType, nums: np.ndarray):
    latents = nt.to_latent_ordered(nums)
    sample = sampling.choose_sample(latents)
    return choose_base_from_sample(sample)


def infrequent_keep_count(primary: np.ndarray) -> int:
    """# of sample elements whose primary value occurs <= n/256 times
    (ref: sampling.rs:71-101 — frequent primaries are "memorizable")."""
    n = len(primary)
    _, inverse, counts = np.unique(primary, return_inverse=True, return_counts=True)
    cutoff = max(1, int(n / sampling.CLASSIC_MEMORIZABLE_BINS))
    return int(np.count_nonzero(counts[inverse] <= cutoff))


def accept_candidate(bits_saved_per_adj: float, keep_count: int, n: int) -> bool:
    """est_bits_saved_per_num for the constant-savings case, via the count
    formula so the host path and device-train (which fetches only the keep
    count) compute the identical float."""
    est = bits_saved_per_adj * float(keep_count) / float(n)
    return est > MULT_REQUIRED_BITS_SAVED_PER_NUM


def choose_base_from_sample(sample):
    """choose_base given the already-gathered latent sample (the decision
    is a pure function of the sample; device-train fetches only the
    device-reduced GCD counts and keep count)."""
    if sample is None:
        return None
    cand = choose_candidate_base(sample)
    if cand is None:
        return None
    candidate, bits_saved_per_adj = cand
    primary = sample // sample.dtype.type(candidate)
    if accept_candidate(bits_saved_per_adj, infrequent_keep_count(primary), len(sample)):
        return candidate
    return None
