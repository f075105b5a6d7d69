"""Error types, mirroring the reference's PcoError kinds.

ref: pco/src/errors.rs:8-75
"""


class PcoError(Exception):
    """Base error for all pcodec_tpu failures."""


class CorruptionError(PcoError):
    """The compressed data is invalid (out-of-range metadata, bad magic, ...)."""


class InsufficientDataError(PcoError):
    """The compressed data ended before decompression completed."""


class InvalidArgumentError(PcoError):
    """The caller provided an invalid configuration or destination."""
