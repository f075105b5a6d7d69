"""Format-critical constants for the Pco wire format.

Mirrors the reference constants (ref: pco/src/constants.rs:12-56) exactly —
these values are part of the format specification and must not change.
"""

# bit lengths of metadata fields (ref: pco/src/constants.rs:12-23)
BITS_TO_ENCODE_ANS_SIZE_LOG = 4
BITS_TO_ENCODE_MODE_VARIANT = 4
BITS_TO_ENCODE_DELTA_ENCODING_VARIANT = 4
BITS_TO_ENCODE_DELTA_ENCODING_ORDER = 3
BITS_TO_ENCODE_DELTA_CONV_QUANTIZATION = 5
BITS_TO_ENCODE_DELTA_CONV_N_WEIGHTS = 5
BITS_TO_ENCODE_DELTA_LOOKBACK_WINDOW_N_LOG = 5
BITS_TO_ENCODE_DELTA_LOOKBACK_STATE_N_LOG = 4
BITS_TO_ENCODE_N_BINS = 15
BITS_TO_ENCODE_QUANTIZE_K = 8
BITS_TO_ENCODE_DICT_LEN = 25

# padding used by the reference's buffered reader; we keep the same margin on
# numpy buffers so unaligned 8/15-byte window loads never run off the end
OVERSHOOT_PADDING = 9

# cutoffs and legal parameter values (ref: pco/src/constants.rs:31-45)
MAX_ANS_BITS = 14
LIMITED_UNOPTIMIZED_BINS_LOG = 6
MAX_COMPRESSION_LEVEL = 12
MAX_CONSECUTIVE_DELTA_ORDER = 7
MAX_CONV1_DELTA_ORDER = 32
MAX_CONV1_DELTA_QUANTIZATION = (1 << BITS_TO_ENCODE_DELTA_CONV_QUANTIZATION) - 1
MAX_ENTRIES = 1 << 24
MULT_REQUIRED_BITS_SAVED_PER_NUM = 0.5
QUANT_REQUIRED_BITS_SAVED_PER_NUM = 1.5
CLASSIC_MEMORIZABLE_BINS_LOG = 8

# defaults
DEFAULT_COMPRESSION_LEVEL = 8
DEFAULT_MAX_PAGE_N = 1 << 18

# format spec (ref: pco/src/constants.rs:52-56)
ANS_INTERLEAVING = 4
FULL_BATCH_N = 256

# lookback window bounds (ref: pco/src/delta/mod.rs:16-17)
LOOKBACK_MAX_WINDOW_N_LOG = 15
LOOKBACK_MIN_WINDOW_N_LOG = 4

# standalone format (ref: pco/src/standalone/constants.rs)
MAGIC_HEADER = bytes([112, 99, 111, 33])  # "pco!"
MAGIC_TERMINATION_BYTE = 0
BITS_TO_ENCODE_N_ENTRIES = 24
BITS_TO_ENCODE_STANDALONE_VERSION = 8
BITS_TO_ENCODE_VARINT_POWER = 6
CURRENT_STANDALONE_VERSION = 3

# wrapped format version written by this library (ref: format_version.rs:31-34)
CURRENT_FORMAT_VERSION = (4, 1)
MAX_SUPPORTED_FORMAT_VERSION = (4, 1)
