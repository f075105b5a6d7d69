"""Delta encodings: consecutive, lookback, conv1.

Decode-side state semantics follow the page format exactly
(ref: pco/src/delta/mod.rs, consecutive.rs, lookback.rs, conv1.rs).
Consecutive decoding is vectorized as cascaded wrapping cumsums; lookback
decoding uses log-depth pointer doubling instead of the reference's serial
window walk (same results mod 2^bits).
"""

import numpy as np

from pcodec_tpu import constants as c
from pcodec_tpu.errors import CorruptionError
from pcodec_tpu.format.metadata import DeltaEncoding


def toggle_center(latents: np.ndarray) -> np.ndarray:
    """Wrapping add of MID; self-inverse (ref: delta/mod.rs:26-31)."""
    mid = latents.dtype.type(1) << latents.dtype.type(latents.dtype.itemsize * 8 - 1)
    return latents + mid


# ---------------------------------------------------------------------------
# consecutive
# ---------------------------------------------------------------------------


def consecutive_encode(order: int, latents: np.ndarray):
    """Returns (deltas_with_junk_front, page_moments).

    Leaves `order` junk latents at the front, like the reference
    (ref: delta/consecutive.rs:19-43).
    """
    out = latents.copy()
    moments = np.zeros(order, dtype=latents.dtype)
    for o in range(order):
        view = out[o:]
        moments[o] = view[0] if len(view) else latents.dtype.type(0)
        if len(view) > 1:
            view[1:] = view[1:] - view[:-1]  # wrapping diff
    start = min(order, len(out))
    out[start:] = toggle_center(out[start:])
    return out, moments


def consecutive_encode_pages(order: int, pages: np.ndarray):
    """Vectorized consecutive_encode over uniform pages.

    pages: (n_pages, page_n) with page_n > order. Returns
    (deltas (n_pages, page_n) with per-page junk fronts, moments
    (n_pages, order)) — row-for-row identical to consecutive_encode on
    each page (ref: delta/consecutive.rs:19-43).
    """
    out = pages.copy()
    n_pages, page_n = out.shape
    moments = np.zeros((n_pages, order), dtype=pages.dtype)
    with np.errstate(over="ignore"):
        for o in range(order):
            moments[:, o] = out[:, o]
            out[:, o + 1 :] = out[:, o + 1 :] - out[:, o:-1]
        out[:, order:] = toggle_center(out[:, order:])
    return out, moments


def consecutive_decode_in_place(moments: np.ndarray, latents: np.ndarray) -> None:
    """Mutates `latents` (deltas in, values out) and `moments` (batch state).

    k cascaded cumsums seeded by the delta moments
    (ref: delta/consecutive.rs:45-50; spec: docs/format.md Consecutive).
    """
    latents[:] = toggle_center(latents)
    n = len(latents)
    with np.errstate(over="ignore"):
        for j in range(len(moments) - 1, -1, -1):
            moment = moments[j]
            cs = np.cumsum(latents, dtype=latents.dtype)
            if n:
                new_moment = moment + cs[-1]
                latents[1:] = moment + cs[:-1]
                latents[0] = moment
                moments[j] = new_moment


# ---------------------------------------------------------------------------
# lookback
# ---------------------------------------------------------------------------


def lookback_window_buffer(encoding: DeltaEncoding, state: np.ndarray):
    """(window_buffer, start_pos); ref: delta/lookback.rs:200-214."""
    window_n = encoding.window_n
    buffer_n = max(window_n, c.FULL_BATCH_N) * 2
    buf = np.zeros(buffer_n, dtype=state.dtype)
    buf[window_n - len(state) : window_n] = state
    return buf, window_n


def lookback_decode_in_place(
    encoding: DeltaEncoding,
    lookbacks: np.ndarray,  # uint32, >= relevant length
    pos_holder: list,  # single-element [start_pos]
    window: np.ndarray,
    latents: np.ndarray,
) -> None:
    """Batch lookback decode via pointer doubling (log2(batch) passes).

    Equivalent to the reference's serial loop (ref: delta/lookback.rs:217-246):
    out[i] = latent[i] + out[i - lookback[i]], with out[-j] drawn from the
    window. Raises on lookbacks exceeding the window.
    """
    latents[:] = toggle_center(latents)
    window_n, state_n = encoding.window_n, encoding.state_n
    start_pos = pos_holder[0]
    batch_n = len(latents)
    if start_pos + batch_n > len(window):
        window[:window_n] = window[start_pos - window_n : start_pos]
        start_pos = window_n

    m = min(batch_n, len(lookbacks))
    lb = np.ones(batch_n, dtype=np.int64)
    lb[:m] = lookbacks[:m].astype(np.int64)
    oob = lb > window_n
    if oob.any():
        # the reference flags corruption and substitutes lookback 1
        lb = np.where(oob, 1, lb)
        had_oob = True
    else:
        had_oob = False

    # absolute window positions of this batch's outputs
    add = latents.copy()
    ptr = start_pos + np.arange(batch_n, dtype=np.int64) - lb
    in_batch = ptr >= start_pos
    while in_batch.any():
        j = ptr - start_pos
        add = np.where(in_batch, add + add[np.where(in_batch, j, 0)], add)
        ptr = np.where(in_batch, ptr[np.where(in_batch, j, 0)] - 0, ptr)
        # note: ptr jump must use the ORIGINAL ptrs of the referenced element
        in_batch = ptr >= start_pos
    window[start_pos : start_pos + batch_n] = add + window[ptr]

    end_pos = start_pos + batch_n
    latents[:] = window[start_pos - state_n : end_pos - state_n]
    pos_holder[0] = end_pos
    if had_oob:
        raise CorruptionError("delta lookback exceeded window n")


def lookback_decode_page(
    encoding: DeltaEncoding,
    lookbacks: np.ndarray,
    state: np.ndarray,
    deltas: np.ndarray,  # toggled-center deltas, length n - state_n (or less)
    n: int,
) -> np.ndarray:
    """Whole-page lookback decode via global pointer doubling.

    Page position p takes value add[p] + value[p - lb[p]]; positions below
    the stored state read zeros (the reference's zero window prefill,
    ref: delta/lookback.rs:205-211). Raises on out-of-window lookbacks.
    """
    state_n = encoding.state_n
    window_n = encoding.window_n
    real = min(n, state_n)
    dtype = deltas.dtype if len(deltas) else state.dtype

    add = np.zeros(n, dtype=dtype)
    add[:real] = state[state_n - real :]
    count = min(len(deltas), n - real)
    add[real : real + count] = deltas[:count]

    lb = np.ones(n, dtype=np.int64)
    lb_src = lookbacks[: n - real].astype(np.int64)
    oob = (lb_src > window_n).any()
    lb_eff = np.where(lb_src > window_n, 1, lb_src)
    lb[real : real + len(lb_eff)] = lb_eff

    ptr = np.arange(n, dtype=np.int64) - lb
    ptr[:real] = -1  # state values are terminal
    # positions below -? read the zero prefill: terminal as well
    active = ptr >= 0
    while active.any():
        j = np.where(active, ptr, 0)
        add = np.where(active & (ptr >= 0), add + add[j], add)
        ptr = np.where(active, ptr[j], ptr)
        active = ptr >= 0
    if oob:
        raise CorruptionError("delta lookback exceeded window n")
    return add


# ---------------------------------------------------------------------------
# conv1
# ---------------------------------------------------------------------------


def conv1_decode_in_place(encoding: DeltaEncoding, state: np.ndarray, latents: np.ndarray) -> None:
    """Serial linear-recurrence decode (ref: delta/conv1.rs:235-253).

    Arithmetic is exact in Python ints; overflow is impossible because
    ChunkMeta validation bounds |prediction| < 2^(conv_bits - 1).
    """
    latents[:] = toggle_center(latents)
    order = len(encoding.weights)
    assert len(state) == order
    q = encoding.quantization
    bias = encoding.bias
    weights = list(encoding.weights)
    bits = latents.dtype.itemsize * 8
    mask = (1 << bits) - 1

    window = [int(x) for x in state.tolist()] + [int(x) for x in latents.tolist()]
    for i in range(order, len(window)):
        s = bias
        base = i - order
        for j in range(order):
            s += weights[j] * window[base + j]
        pred = (s if s > 0 else 0) >> q
        window[i] = (window[i] + pred) & mask
    latents[:] = np.array(window[: len(latents)], dtype=latents.dtype)
    state[:] = np.array(window[len(latents) :], dtype=latents.dtype)
