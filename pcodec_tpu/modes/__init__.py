"""Modes: split numbers into latents and join them back.

Join formulas are format-pinned (spec: docs/format.md "Modes"); split and
auto-detection live with each mode. All joins are fully vectorized numpy and
mirrored in jnp for the device path (pcodec_tpu/ops).
"""

import numpy as np

from pcodec_tpu.dtypes import NumberType
from pcodec_tpu.errors import CorruptionError
from pcodec_tpu.format.metadata import Mode


def join_latents(
    nt: NumberType,
    mode: Mode,
    primary: np.ndarray,
    secondary,
) -> np.ndarray:
    """Join one batch of latents into numbers (decompression final step)."""
    L = nt.latent.np_dtype
    if mode.kind == Mode.CLASSIC:
        return nt.from_latent_ordered(primary)
    if mode.kind == Mode.DICT:
        dictionary = mode.payload
        idxs = primary.astype(np.uint32)
        if len(dictionary) == 0 or (idxs >= np.uint32(len(dictionary))).any():
            raise CorruptionError(f"dict index exceeded dict length {len(dictionary)}")
        return nt.from_latent_ordered(dictionary[idxs])
    if mode.kind == Mode.INT_MULT:
        base = L.type(mode.payload)
        return nt.from_latent_ordered(primary.astype(L) * base + secondary.astype(L))
    if mode.kind == Mode.FLOAT_MULT:
        base = nt.from_latent_ordered(np.array([mode.payload], dtype=L))[0]
        mult = nt.int_float_from_latent(primary)
        unadjusted = mult * base
        mid = L.type(nt.latent.mid)
        return nt.from_latent_ordered(
            nt.to_latent_ordered(unadjusted) + secondary.astype(L) + mid
        )
    if mode.kind == Mode.FLOAT_QUANT:
        k = L.type(mode.payload)
        y = primary.astype(L)
        m = secondary.astype(L)
        sign_cutoff = L.type(nt.latent.mid) >> k
        lowest_k_bits_max = (L.type(1) << k) - L.type(1)
        lowest = np.where(y >= sign_cutoff, m, lowest_k_bits_max - m)
        return nt.from_latent_ordered((y << k) + lowest)
    raise CorruptionError(f"unknown mode kind {mode.kind}")


def mode_is_valid(nt: NumberType, mode: Mode) -> bool:
    """Type/mode compatibility (ref: data_types/float.rs mode_is_valid etc.)."""
    if mode.kind in (Mode.CLASSIC, Mode.DICT):
        return True
    if nt.kind == "float":
        if mode.kind == Mode.FLOAT_MULT:
            base = nt.from_latent_ordered(np.array([mode.payload], dtype=nt.latent.np_dtype))[0]
            return bool(np.isfinite(base) and np.abs(base) > 0)
        if mode.kind == Mode.FLOAT_QUANT:
            return 0 < mode.payload <= nt.precision_bits
        return False
    # integer types
    if mode.kind == Mode.INT_MULT:
        return int(mode.payload) > 0
    return False
