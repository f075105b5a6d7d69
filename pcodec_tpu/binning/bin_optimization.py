"""Exactly-optimal bin merging DP (ref: pco/src/bin_optimization.rs).

Minimizes total bit cost `bin_meta_cost + Σ count*(ans_cost + offset_bits)`
over partitions of consecutive histogram bins. All cost arithmetic is f32 with
the reference's fast log2 approximation so that tie-breaking — and therefore
compressed size — matches exactly. The O(B²) DP runs with a vectorized inner
loop.
"""

from dataclasses import dataclass

import numpy as np

from pcodec_tpu.dtypes import LatentType, leading_zeros_uint

try:
    from pcodec_tpu.native import kernels as _native
except Exception:  # pragma: no cover
    _native = None

SINGLE_BIN_SPEEDUP_WORTH_IN_BITS_PER_NUM = np.float32(0.1)
TRIVIAL_OFFSET_SPEEDUP_WORTH_IN_BITS_PER_NUM = np.float32(0.1)


@dataclass
class BinCompressionInfo:
    weight: int
    lower: int
    upper: int
    symbol: int
    offset_bits: int


def log2_approx_f32(x: np.ndarray) -> np.ndarray:
    """Reference's branch-free approximate log2 (ref: bin_optimization.rs:37-66).

    Exact same f32 bit manipulation, vectorized.
    """
    x = np.asarray(x, dtype=np.float32)
    Z = np.float32(0.674)
    SIGNIF_MASK = np.uint32(0x7FFFFF)
    Z_SIGNIF = np.asarray(Z).view(np.uint32) & SIGNIF_MASK
    B = np.float32(2.0) / Z
    C = np.float32(-B / (np.float32(6.0) * Z))
    A = np.float32(-B - C)

    bits = x.view(np.uint32) if x.flags["C_CONTIGUOUS"] else np.ascontiguousarray(x).view(np.uint32)
    exp = bits >> np.uint32(23)
    signif = bits & SIGNIF_MASK
    high_bit = (signif > Z_SIGNIF).astype(np.uint32)
    log_int = (exp + high_bit).astype(np.int64) - 127
    exp2 = np.uint32(0x7F) ^ high_bit
    norm_bits = (exp2 << np.uint32(23)) | signif
    normalized = norm_bits.view(np.float32)
    return (log_int.astype(np.float32) + A + normalized * (B + C * normalized)).astype(np.float32)


def _bits_to_encode_offset_vec(diffs_u64: np.ndarray) -> np.ndarray:
    return (64 - leading_zeros_uint(diffs_u64, 64)).astype(np.int64)


def optimize_bins(hist_bins, ans_size_log: int, latent_type: LatentType):
    """list[HistogramBin] OR (counts, lowers, uppers) u64 arrays ->
    list[BinCompressionInfo] (ref: bin_optimization.rs:180-199)."""
    if isinstance(hist_bins, tuple):
        counts, lowers, uppers = hist_bins
        counts = np.asarray(counts, dtype=np.uint64)
        lowers = np.asarray(lowers, dtype=np.uint64)
        uppers = np.asarray(uppers, dtype=np.uint64)
        n = len(counts)
        if n == 0:
            return []
    else:
        n = len(hist_bins)
        if n == 0:
            return []
        counts = np.array([b.count for b in hist_bins], dtype=np.uint64)
        lowers = np.array([b.lower for b in hist_bins], dtype=np.uint64)
        uppers = np.array([b.upper for b in hist_bins], dtype=np.uint64)

    partitioning = _choose_optimized_partitioning(counts, lowers, uppers, ans_size_log, latent_type)
    c_counts = np.concatenate([[0], np.cumsum(counts)])
    res = []
    for symbol, (j, i) in enumerate(partitioning):
        count = int(c_counts[i + 1] - c_counts[j])
        ob = int(uppers[i] - lowers[j]).bit_length()
        res.append(
            BinCompressionInfo(
                weight=count,
                lower=int(lowers[j]),
                upper=int(uppers[i]),
                symbol=symbol,
                offset_bits=ob,
            )
        )
    return res


def _bin_meta_cost(ans_size_log: int, latent_type: LatentType) -> np.float32:
    return np.float32(ans_size_log + latent_type.bits + latent_type.offset_bits_bits)


def _choose_optimized_partitioning(counts, lowers, uppers, ans_size_log, latent_type):
    n = len(counts)
    c_counts = np.concatenate([[0], np.cumsum(counts)]).astype(np.uint32)
    total_count = int(c_counts[-1])
    total_count_log2 = log2_approx_f32(np.float32(total_count))
    bin_meta_cost = _bin_meta_cost(ans_size_log, latent_type)

    if _native is not None:
        best_js, best_cost = _native.optimize_bins_dp(
            c_counts, lowers, uppers, bin_meta_cost, total_count_log2
        )
    else:
        best_costs = np.zeros(n + 1, dtype=np.float32)  # best cost through bin i-1
        best_js = np.zeros(n, dtype=np.int64)

        for i in range(n):
            upper = uppers[i]
            c_count_i = c_counts[i + 1]
            cnt = (c_count_i - c_counts[: i + 1]).astype(np.float32)
            ans_cost = total_count_log2 - log2_approx_f32(cnt)
            offset_cost = _bits_to_encode_offset_vec(upper - lowers[: i + 1]).astype(np.float32)
            costs = best_costs[: i + 1] + (bin_meta_cost + (ans_cost + offset_cost) * cnt)
            # reference scans j from i downward keeping strict improvements,
            # i.e. the LARGEST j among exact f32 ties
            rev = costs[::-1]
            best_j = i - int(np.argmin(rev))
            best_js[i] = best_j
            best_costs[i + 1] = costs[best_j]

        best_cost = best_costs[n]

    single_bin_cost = _bin_cost_scalar(
        bin_meta_cost, int(lowers[0]), int(uppers[n - 1]), total_count, total_count_log2
    )
    if single_bin_cost < best_cost + SINGLE_BIN_SPEEDUP_WORTH_IN_BITS_PER_NUM * np.float32(
        total_count
    ):
        return [(0, n - 1)]

    if bool(np.all(lowers == uppers)):
        trivial_cost = np.float32(0.0)
        cnts = counts.astype(np.float32)
        cs = bin_meta_cost + (total_count_log2 - log2_approx_f32(cnts)) * cnts
        # reference sums f32 sequentially
        acc = np.float32(0.0)
        for v in cs:
            acc = np.float32(acc + v)
        trivial_cost = acc
        if trivial_cost < best_cost + TRIVIAL_OFFSET_SPEEDUP_WORTH_IN_BITS_PER_NUM * np.float32(
            total_count
        ):
            return [(i, i) for i in range(n)]

    # rewind
    partitioning = []
    i = n - 1
    while True:
        j = int(best_js[i])
        partitioning.append((j, i))
        if j > 0:
            i = j - 1
        else:
            break
    partitioning.reverse()
    return partitioning


def _bin_cost_scalar(bin_meta_cost, lower, upper, count, total_count_log2):
    ans_cost = total_count_log2 - log2_approx_f32(np.float32(count))
    offset_cost = np.float32(int(upper - lower).bit_length())
    return np.float32(bin_meta_cost + (ans_cost + offset_cost) * np.float32(count))
