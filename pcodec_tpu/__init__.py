"""pcodec_tpu: a TPU-native implementation of the Pco compression format.

Wire-compatible with pcodec (format v4.1): host numpy reference path,
JAX/Pallas device path for decode throughput, C++ native kernels for the
serial host hot loops.
"""

from pcodec_tpu.codec.chunk_config import ChunkConfig, DeltaSpec, ModeSpec, PagingSpec  # noqa: F401
from pcodec_tpu.codec.standalone import (  # noqa: F401
    Progress,
    simple_compress,
    simple_decompress,
    simple_decompress_into,
)
from pcodec_tpu.codec import guarantee, wrapped  # noqa: F401
from pcodec_tpu.codec.container import (  # noqa: F401
    container_compress,
    container_decompress,
    parse_container,
)
from pcodec_tpu.constants import DEFAULT_COMPRESSION_LEVEL, FULL_BATCH_N  # noqa: F401
from pcodec_tpu import standalone  # noqa: F401  (pcodec.standalone module shape)
from pcodec_tpu.errors import (  # noqa: F401
    CorruptionError,
    InsufficientDataError,
    InvalidArgumentError,
    PcoError,
)

__version__ = "0.1.0"
