"""Deterministic RNG matching rand_xoshiro's Xoroshiro128PlusPlus.

The reference samples ~1/40 of the data (without replacement) using
Xoroshiro128++ seeded from u64 0 (ref: pco/src/sampling.rs:28-63). We
reproduce the exact stream so that mode/delta auto-detection makes identical
choices and compressed sizes match the reference.
"""

MASK64 = (1 << 64) - 1


def _rotl(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & MASK64


def _splitmix64_stream(state: int):
    while True:
        state = (state + 0x9E3779B97F4A7C15) & MASK64
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
        yield z ^ (z >> 31)


class Xoroshiro128PlusPlus:
    """Port of rand_xoshiro::Xoroshiro128PlusPlus (seed_from_u64 semantics)."""

    def __init__(self, s0: int, s1: int):
        self.s0 = s0 & MASK64
        self.s1 = s1 & MASK64

    @classmethod
    def seed_from_u64(cls, seed: int) -> "Xoroshiro128PlusPlus":
        gen = _splitmix64_stream(seed)
        return cls(next(gen), next(gen))

    def next_u64(self) -> int:
        s0, s1 = self.s0, self.s1
        result = (_rotl((s0 + s1) & MASK64, 17) + s0) & MASK64
        s1 ^= s0
        self.s0 = _rotl(s0, 49) ^ s1 ^ ((s1 << 21) & MASK64)
        self.s1 = _rotl(s1, 28)
        return result
