import numpy as np

from pcodec_tpu.format import ans
from pcodec_tpu.format.bitio import BitReader, BitWriter


def test_spread_matches_reference():
    # pinned expectations from ref: pco/src/ans/spec.rs tests
    spec = ans.Spec.from_weights(4, [1, 1, 3, 11])
    assert spec.state_symbols.tolist() == [0, 3, 2, 3, 2, 3, 3, 3, 3, 1, 3, 2, 3, 3, 3, 3]
    assert ans.Spec.from_weights(0, [1]).state_symbols.tolist() == [0]
    assert ans.Spec.from_weights(1, [2]).state_symbols.tolist() == [0, 0]


def test_quantize_weights_to():
    assert ans.quantize_weights_to([777], 777, 0) == [1]
    assert ans.quantize_weights_to([777, 1], 778, 1) == [1, 1]
    assert ans.quantize_weights_to([777, 1], 778, 2) == [3, 1]
    assert ans.quantize_weights_to([2, 3, 6, 5, 1], 17, 3) == [1, 1, 3, 2, 1]
    assert ans.quantize_weights_to([1, 1], 2, 1) == [1, 1]


def test_quantize_weights():
    assert ans.quantize_weights([77, 100], 177, 4) == (4, [7, 9])
    assert ans.quantize_weights([77, 77], 154, 4) == (1, [1, 1])


def _round_trip(spec, symbols, expected_byte_len):
    encoder = ans.Encoder(spec)
    state = encoder.default_state()
    to_write = []
    for symbol in reversed(symbols):
        new_state, bitlen = encoder.encode(state, symbol)
        to_write.append((state & ((1 << bitlen) - 1) if bitlen else 0, bitlen))
        state = new_state
    writer = BitWriter()
    for val, bitlen in reversed(to_write):
        writer.write_uint(val, bitlen)
    writer.finish_byte()
    compressed = writer.to_bytes()
    assert len(compressed) == expected_byte_len

    final_state = state
    table_size = 1 << encoder.size_log
    reader = BitReader(compressed)
    decoder = ans.Decoder(spec, [])
    state_idx = final_state - table_size
    decoded = []
    for _ in symbols:
        decoded.append(int(decoder.symbols[state_idx]))
        bits = int(decoder.bits_to_read[state_idx])
        state_idx = int(decoder.next_state_idx_base[state_idx]) + reader.read_uint(bits)
    assert decoded == symbols


def test_ans_round_trip_dense():
    spec = ans.Spec(3, np.array([0, 1, 2, 0, 1, 2, 0, 1], dtype=np.uint32), [3, 3, 2])
    _round_trip(spec, [2, 0, 1, 1, 1, 0, 0, 1, 2], 2)
    _round_trip(spec, [0, 1, 2] * 200, 125)


def test_ans_round_trip_sparse():
    spec = ans.Spec(3, np.array([0, 0, 0, 0, 0, 0, 0, 1], dtype=np.uint32), [7, 1])
    _round_trip(spec, ([0] * 7 + [1]) * 100, 50)


def test_rng_matches_reference_sampling():
    # ref: pco/src/sampling.rs test_choose_sample expects this exact sample
    from pcodec_tpu.binning.sampling import choose_sample

    nums = np.array([-float(i) for i in range(150)], dtype=np.float32)
    keep = nums != 0.0
    sample = choose_sample(nums, keep)
    assert sample is not None
    s = np.sort(sample)
    assert len(sample) == 13
    assert s[:3].tolist() == [-147.0, -142.0, -119.0]
