"""Host (numpy) decompression path: chunk/page decompressors.

This is the bit-exact reference path; the throughput path lives in
pcodec_tpu/ops (JAX/Pallas) and pcodec_tpu/native (C++), both validated
against this implementation.

Call-stack parity: ref pco/src/wrapped/page_decompressor.rs:114-191,
page_latent_decompressor.rs:15-263, chunk_latent_decompressor.rs:30-91.
"""

import numpy as np

from pcodec_tpu import constants as c
from pcodec_tpu import delta as delta_mod
from pcodec_tpu import modes
from pcodec_tpu.dtypes import NumberType
from pcodec_tpu.errors import CorruptionError, InsufficientDataError
from pcodec_tpu.format import ans
from pcodec_tpu.format.bitio import BitReader
from pcodec_tpu.format.metadata import (
    ChunkMeta,
    DeltaEncoding,
    PageMeta,
    PerLatentVar,
)
from pcodec_tpu.utils import calc_max_bytes

try:
    from pcodec_tpu.native import kernels as _native
except Exception:  # pragma: no cover - native build optional
    _native = None


class ChunkLatentDecompressor:
    """Precomputed per-chunk decode state for one latent var."""

    def __init__(self, var_meta, delta_encoding: DeltaEncoding):
        bins = var_meta.bins
        self.latent_type = var_meta.latent_type
        self.delta_encoding = delta_encoding
        self.n_bins = len(bins)
        self.ans_size_log = var_meta.ans_size_log
        self.bytes_per_offset = calc_max_bytes(bins.max_offset_bits())
        spec = ans.Spec.from_weights(var_meta.ans_size_log, bins.weights.tolist())
        decoder = ans.Decoder(spec, bins.offset_bits.tolist())
        symbols = spec.state_symbols
        if self.n_bins > 0:
            self.state_lowers = bins.lowers[np.minimum(symbols, self.n_bins - 1)]
            self.state_lowers = np.where(
                symbols < self.n_bins, self.state_lowers, self.latent_type.np_dtype.type(0)
            )
        else:
            self.state_lowers = np.zeros(spec.table_size, dtype=self.latent_type.np_dtype)
        self.decoder = decoder
        # python lists for the scalar hot loop
        self._base = decoder.next_state_idx_base.tolist()
        self._bits = decoder.bits_to_read.tolist()
        self._ob = decoder.offset_bits.tolist()
        self._lowers = self.state_lowers.tolist()
        self.only_bin_offset_bits = int(bins.offset_bits[0]) if self.n_bins == 1 else 0
        # scratch (reused across batches)
        self.scratch_latents = np.zeros(c.FULL_BATCH_N, dtype=self.latent_type.np_dtype)
        self.scratch_offset_bits = np.zeros(c.FULL_BATCH_N, dtype=np.int64)
        if self.n_bins == 1:
            self.scratch_latents[:] = bins.lowers[0]
            self.scratch_offset_bits[:] = self.only_bin_offset_bits


class PageLatentDecompressor:
    """Mutable per-page decode state for one latent var."""

    def __init__(self, cld: ChunkLatentDecompressor, page_var_meta):
        self.cld = cld
        self.ans_state_idxs = list(page_var_meta.ans_final_state_idxs)
        de = cld.delta_encoding
        stored = page_var_meta.delta_state
        if de.kind == DeltaEncoding.LOOKBACK:
            window, pos = delta_mod.lookback_window_buffer(de, stored)
            self.delta_state = window
            self.pos_holder = [pos]
        else:
            self.delta_state = stored.copy()
            self.pos_holder = [0]

    def read_batch_pre_delta(self, reader: BitReader, batch_n: int) -> None:
        """Fills cld scratch latents[:batch_n] = bin.lower + offset."""
        cld = self.cld
        if batch_n == 0:
            return
        assert batch_n <= c.FULL_BATCH_N
        # never start a batch out of bounds (a corrupt previous batch may have
        # overrun into the zero padding; the padding absorbs at most one batch)
        reader.check_in_bounds()
        if cld.n_bins > 1:
            if _native is not None:
                ans_end = _native.ans_decode(
                    reader, batch_n, self.ans_state_idxs, cld
                )
            else:
                ans_end = self._read_ans_symbols(reader, batch_n)
            reader.bit_idx = ans_end
        else:
            # single-bin fast path: scratch latents must be refilled every
            # batch because delta decoding mutates them in place
            # (ref: page_latent_decompressor.rs:451-453)
            cld.scratch_latents[:batch_n] = (
                cld.state_lowers[0] if len(cld.state_lowers) else 0
            )

        ob = cld.scratch_offset_bits[:batch_n]
        if cld.bytes_per_offset > 0:
            total_ob = int(ob.sum())
            max_bits = int(ob.max(initial=0))
            if max_bits > 0:
                csum = np.cumsum(ob) - ob
                bit_pos = reader.bit_idx + csum
                offs = reader.gather_batch(bit_pos, ob, max_bits)
                lat = cld.scratch_latents
                lat[:batch_n] = lat[:batch_n] + offs.astype(cld.latent_type.np_dtype)
            reader.bit_idx += total_ob

    def _read_ans_symbols(self, reader: BitReader, batch_n: int) -> int:
        """Serial 4-stream interleaved tANS decode (python fallback).

        ref: page_latent_decompressor.rs:89-175. Returns the final bit index.
        """
        cld = self.cld
        base, bits_tab, ob_tab, lowers = cld._base, cld._bits, cld._ob, cld._lowers
        mem = reader._mem
        cursor = reader.bit_idx
        s0, s1, s2, s3 = self.ans_state_idxs
        states = [s0, s1, s2, s3]
        out_lowers = cld.scratch_latents
        out_ob = cld.scratch_offset_bits
        lower_list = [0] * batch_n
        for i in range(batch_n):
            j = i & 3
            st = states[j]
            byte = cursor >> 3
            sh = cursor & 7
            window = int.from_bytes(mem[byte : byte + 3], "little")
            nbits = bits_tab[st]
            val = (window >> sh) & ((1 << nbits) - 1)
            lower_list[i] = lowers[st]
            out_ob[i] = ob_tab[st]
            cursor += nbits
            states[j] = base[st] + val
        out_lowers[:batch_n] = np.array(lower_list, dtype=np.uint64).astype(
            cld.latent_type.np_dtype
        )
        self.ans_state_idxs = states
        return cursor

    def decode_deltas(self, delta_latents, dst: np.ndarray) -> None:
        de = self.cld.delta_encoding
        if de.kind == DeltaEncoding.NOOP:
            return
        if de.kind == DeltaEncoding.CONSECUTIVE:
            delta_mod.consecutive_decode_in_place(self.delta_state, dst)
        elif de.kind == DeltaEncoding.LOOKBACK:
            delta_mod.lookback_decode_in_place(
                de, delta_latents, self.pos_holder, self.delta_state, dst
            )
        elif de.kind == DeltaEncoding.CONV1:
            delta_mod.conv1_decode_in_place(de, self.delta_state, dst)


class PageDecompressor:
    """Streams one page, batch by batch (ref: wrapped/page_decompressor.rs)."""

    def __init__(self, reader: BitReader, chunk_meta: ChunkMeta, nt: NumberType, n: int):
        self.reader = reader
        self.meta = chunk_meta
        self.nt = nt
        self.n = n
        self.n_remaining = n
        page_meta = PageMeta.read_from(reader, chunk_meta)
        self.page_meta = page_meta  # raw stored states (pre window expansion)

        self.clds = PerLatentVar()
        self.plds = PerLatentVar()
        n_in_body = max(0, n - chunk_meta.delta_encoding.for_latent_var("primary").n_latents_per_state())
        for key, var_meta in chunk_meta.per_latent_var.enumerated():
            de = chunk_meta.delta_encoding.for_latent_var(key)
            cld = ChunkLatentDecompressor(var_meta, de)
            if cld.n_bins == 0 and n_in_body > 0:
                raise CorruptionError(
                    f"unable to decompress chunk with no bins and {n_in_body} latents"
                )
            self.clds.set(key, cld)
            self.plds.set(key, PageLatentDecompressor(cld, page_meta.per_latent_var.get(key)))
        self.primary_state_n = chunk_meta.delta_encoding.for_latent_var(
            "primary"
        ).n_latents_per_state()

    def _read_batch(self, dst: np.ndarray, start: int, end: int) -> None:
        reader = self.reader
        batch_n = end - start
        n_remaining = self.n_remaining

        delta_latents = None
        if self.plds.delta is not None:
            limit = min(max(0, n_remaining - self.primary_state_n), batch_n)
            self.plds.delta.read_batch_pre_delta(reader, limit)
            delta_latents = self.clds.delta.scratch_latents

        def read_var(key):
            pld = self.plds.get(key)
            cld = self.clds.get(key)
            state_n = cld.delta_encoding.n_latents_per_state()
            pre_delta_len = min(c.FULL_BATCH_N, max(0, n_remaining - state_n))
            pld.read_batch_pre_delta(reader, pre_delta_len)
            dst_n = min(n_remaining, c.FULL_BATCH_N)
            var_dst = cld.scratch_latents[:dst_n]
            pld.decode_deltas(delta_latents, var_dst)
            return var_dst

        primary = read_var("primary")
        secondary = read_var("secondary") if self.plds.secondary is not None else None

        dst[start:end] = modes.join_latents(self.nt, self.meta.mode, primary, secondary)

        self.n_remaining -= batch_n
        reader.check_in_bounds()
        if self.n_remaining == 0:
            reader.drain_empty_byte("expected trailing bits at end of page to be empty")

    def read_page_fast(self, dst: np.ndarray) -> int:
        """Decode the entire page in one native call + vectorized passes.

        Requires the native kernels, a full untouched page, and dst of at
        least n elements. Falls back to batch-wise read() otherwise.
        """
        if (
            _native is None
            or self.n_remaining != self.n
            or len(dst) < self.n
            or self.n == 0
        ):
            return self.read(dst)
        n = self.n
        reader = self.reader
        specs = []
        for key in ("delta", "primary", "secondary"):
            cld = self.clds.get(key)
            if cld is None:
                continue
            specs.append(
                {
                    "key": key,
                    "cld": cld,
                    "pld": self.plds.get(key),
                    "state_n": cld.delta_encoding.n_latents_per_state(),
                    "is_delta": key == "delta",
                }
            )
        outs, counts, new_bit = _native.decode_page_pre_delta(reader, n, specs)
        if new_bit < 0 or new_bit > 8 * reader.size:
            raise InsufficientDataError("page body ran out of data")
        reader.bit_idx = new_bit
        reader.drain_empty_byte("expected trailing bits at end of page to be empty")

        var_latents = {}
        delta_latents = None
        for spec, out_u64, count in zip(specs, outs, counts):
            key = spec["key"]
            cld = spec["cld"]
            pld = spec["pld"]
            L = cld.latent_type.np_dtype
            de = cld.delta_encoding
            count = int(count)
            if de.kind == DeltaEncoding.NOOP:
                vals = out_u64[:n].astype(L)
                if count < n and cld.n_bins >= 1 and key != "delta":
                    # positions past the body (none for noop vars) stay as-is
                    pass
            elif de.kind == DeltaEncoding.CONSECUTIVE:
                work = np.zeros(n, dtype=L)
                work[:count] = out_u64[:count].astype(L)
                delta_mod.consecutive_decode_in_place(pld.delta_state, work)
                vals = work
            elif de.kind == DeltaEncoding.LOOKBACK:
                deltas = delta_mod.toggle_center(out_u64[:count].astype(L))
                state = pld.delta_state[
                    de.window_n - de.state_n : de.window_n
                ].astype(L)
                vals = delta_mod.lookback_decode_page(
                    de, delta_latents[: max(n - de.state_n, 0)], state, deltas, n
                )
            else:  # conv1
                work = np.zeros(n, dtype=L)
                work[:count] = out_u64[:count].astype(L)
                delta_mod.conv1_decode_in_place(de, pld.delta_state, work)
                vals = work
            var_latents[key] = vals
            if key == "delta":
                delta_latents = vals

        dst[: self.n] = modes.join_latents(
            self.nt,
            self.meta.mode,
            var_latents["primary"],
            var_latents.get("secondary"),
        )
        self.n_remaining = 0
        return n

    def read(self, dst: np.ndarray) -> int:
        """Decompress min(len(dst), n_remaining) numbers into dst.

        dst must have length a multiple of FULL_BATCH_N or >= n_remaining
        (ref: wrapped/page_decompressor.rs:199-206).
        """
        from pcodec_tpu.errors import InvalidArgumentError

        if len(dst) % c.FULL_BATCH_N != 0 and len(dst) < self.n_remaining:
            raise InvalidArgumentError(
                f"dst length must be a multiple of {c.FULL_BATCH_N} or at least "
                f"the count of numbers remaining ({len(dst)} < {self.n_remaining})"
            )
        n_to_process = min(len(dst), self.n_remaining)
        processed = 0
        while processed < n_to_process:
            batch_end = min(processed + c.FULL_BATCH_N, n_to_process)
            self._read_batch(dst, processed, batch_end)
            processed = batch_end
        return processed
