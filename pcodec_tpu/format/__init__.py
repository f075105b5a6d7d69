from pcodec_tpu.format.bitio import BitReader, BitWriter  # noqa: F401
