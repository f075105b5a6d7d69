"""Interleaved tANS entropy coder: spec, encoder, decoder, weight quantization.

The symbol spread and weight quantization are format-critical and match the
reference bit for bit (ref: pco/src/ans/spec.rs:24-59, encoding.rs:95-175,
decoding.rs; cited by docs/format.md:145-147).

States live in [table_size, 2 * table_size); "state index" = state - table_size.
"""

from dataclasses import dataclass

import numpy as np

from pcodec_tpu.errors import CorruptionError


def choose_stride(table_size: int) -> int:
    """Odd number near 3/5 of the table size (ref: ans/spec.rs:24-30)."""
    res = (3 * table_size) // 5
    if res % 2 == 0:
        res += 1
    return res


def spread_state_symbols(size_log: int, symbol_weights) -> np.ndarray:
    """The format-pinned symbol spread (ref: ans/spec.rs:36-59)."""
    weights = list(symbol_weights)
    table_size = sum(weights)
    if table_size != (1 << size_log):
        raise CorruptionError(
            f"table size log of {size_log} does not agree with total weight of {table_size}"
        )
    res = np.zeros(table_size, dtype=np.uint32)
    stride = choose_stride(table_size)
    mask = table_size - 1
    w = np.asarray(weights, dtype=np.int64)
    symbols_by_step = np.repeat(np.arange(len(weights), dtype=np.uint32), w)
    steps = np.arange(table_size, dtype=np.int64)
    res[(stride * steps) & mask] = symbols_by_step
    return res


@dataclass
class Spec:
    size_log: int
    state_symbols: np.ndarray  # uint32[table_size]
    symbol_weights: list  # ints

    @classmethod
    def from_weights(cls, size_log: int, symbol_weights) -> "Spec":
        weights = list(symbol_weights) or [1]
        return cls(size_log, spread_state_symbols(size_log, weights), weights)

    @property
    def table_size(self) -> int:
        return 1 << self.size_log


class Encoder:
    """tANS encoder tables (ref: ans/encoding.rs:28-93).

    encode() consumes symbols in reverse order (LIFO); callers collect the
    emitted (bits, bitlen) pairs and write them forward.
    """

    def __init__(self, spec: Spec):
        table_size = spec.table_size
        self.size_log = spec.size_log
        n_symbols = len(spec.symbol_weights)
        self.weights = list(spec.symbol_weights)
        self.min_renorm_bits = [0] * n_symbols
        self.renorm_bit_cutoff = [0] * n_symbols
        for symbol, weight in enumerate(self.weights):
            max_x_s = 2 * weight - 1
            min_renorm = spec.size_log - (max_x_s.bit_length() - 1)
            self.min_renorm_bits[symbol] = min_renorm
            self.renorm_bit_cutoff[symbol] = 2 * weight * (1 << min_renorm)
        # next_states[symbol][x_s - weight] = table_size + (index of the
        # x_s'th occurrence of symbol in spread order); a stable argsort by
        # symbol yields exactly those occurrence lists, vectorized
        order = np.argsort(spec.state_symbols, kind="stable")
        counts = np.bincount(spec.state_symbols, minlength=n_symbols).astype(np.int64)
        ends = np.cumsum(counts)
        begins = ends - counts
        flat = (order + table_size).astype(np.int64)
        self.next_states = [
            flat[begins[s] : ends[s]].tolist() for s in range(n_symbols)
        ]

    def default_state(self) -> int:
        return 1 << self.size_log

    def encode(self, state: int, symbol: int) -> tuple:
        """Returns (new_state, bits_to_emit) — emit the low bits of `state`."""
        renorm_bits = self.min_renorm_bits[symbol]
        if state >= self.renorm_bit_cutoff[symbol]:
            renorm_bits += 1
        nexts = self.next_states[symbol]
        return nexts[(state >> renorm_bits) - len(nexts)], renorm_bits


class Decoder:
    """Flat decode table (ref: ans/decoding.rs:14-49).

    Indexed by state idx in [0, table_size): next_state_idx_base, bits_to_read,
    and the bin's offset_bits piggybacked for the hot loop.
    """

    def __init__(self, spec: Spec, bin_offset_bits):
        table_size = spec.table_size
        n_symbols = len(spec.symbol_weights)
        self.symbols = spec.state_symbols
        symbols = spec.state_symbols.astype(np.int64)

        # x_s for state i = weight[s] + (occurrence index of s up to i);
        # occurrence indices via stable argsort by symbol, vectorized
        order = np.argsort(symbols, kind="stable")
        counts = np.bincount(symbols, minlength=n_symbols).astype(np.int64)
        begins = np.cumsum(counts) - counts
        occ = np.zeros(table_size, dtype=np.int64)
        occ[order] = np.arange(table_size, dtype=np.int64) - np.repeat(begins, counts)
        weights = np.asarray(spec.symbol_weights, dtype=np.int64)
        x_s = weights[symbols] + occ

        # bits_to_read = size_log + 1 - bit_length(x_s); x_s <= 2^15 so the
        # float log2 is exact
        bl = np.where(
            x_s == 0, 0, np.floor(np.log2(np.maximum(x_s, 1))).astype(np.int64) + 1
        )
        bits = table_size.bit_length() - bl
        base = (x_s << bits) - table_size
        self.next_state_idx_base = base.astype(np.uint32)
        self.bits_to_read = bits.astype(np.uint32)
        ob = np.asarray(list(bin_offset_bits) + [0], dtype=np.uint32)
        self.offset_bits = ob[np.minimum(symbols, len(ob) - 1)].astype(np.uint32)


def _round_half_away_f32(x: np.ndarray) -> np.ndarray:
    """Rust f32::round (half away from zero), exactly."""
    t = np.trunc(x)
    frac = x - t
    bump = np.where(np.abs(frac) >= np.float32(0.5), np.sign(x).astype(np.float32), np.float32(0))
    return (t + bump).astype(np.float32)


def quantize_weights_to(counts, total_count: int, size_log: int):
    """Quantize bin counts to weights summing to 2^size_log.

    Exact port (f32 arithmetic and repair-loop order) of
    ref: ans/encoding.rs:95-153 — compressed size parity depends on this.
    """
    if size_log == 0:
        return [1]
    required = 1 << size_log
    counts_f = np.asarray(counts, dtype=np.float32)
    multiplier = np.float32(required) / np.float32(total_count)
    desired_surplus = np.maximum(counts_f * multiplier - np.float32(1.0), np.float32(0.0))
    # reference sums f32 sequentially; match that association order
    acc = np.float32(0.0)
    for s in desired_surplus:
        acc = np.float32(acc + s)
    required_surplus = np.float32(required - len(counts))
    surplus_mult = np.float32(0.0) if acc == 0.0 else np.float32(required_surplus / acc)
    float_weights = (np.float32(1.0) + desired_surplus * surplus_mult).astype(np.float32)
    weights = _round_half_away_f32(float_weights).astype(np.int64)
    weight_sum = int(weights.sum())

    weights = weights.tolist()
    fw = float_weights.tolist()
    i = 0
    while weight_sum > required:
        if weights[i] > 1 and np.float32(weights[i]) > fw[i]:
            weights[i] -= 1
            weight_sum -= 1
        i += 1
    i = 0
    while weight_sum < required:
        if np.float32(weights[i]) < fw[i]:
            weights[i] += 1
            weight_sum += 1
        i += 1
    return weights


def quantize_weights(counts, total_count: int, max_size_log: int):
    """Choose (size_log, weights); ref: ans/encoding.rs:156-175."""
    if len(counts) == 1:
        return 0, [1]
    min_size_log = (len(counts) - 1).bit_length()
    size_log = max(min_size_log, max_size_log)
    weights = quantize_weights_to(counts, total_count, size_log)
    power_of_2 = min((w & -w).bit_length() - 1 for w in weights)
    size_log -= power_of_2
    weights = [w >> power_of_2 for w in weights]
    return size_log, weights
