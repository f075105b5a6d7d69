"""User-facing compression configuration (ref: pco/src/chunk_config.rs)."""

from dataclasses import dataclass, field
from typing import List, Optional, Union

from pcodec_tpu import constants as c
from pcodec_tpu.dtypes import LatentType
from pcodec_tpu.errors import InvalidArgumentError


@dataclass(frozen=True)
class ModeSpec:
    kind: str = "auto"  # auto | classic | try_float_mult | try_float_quant | try_int_mult | try_dict
    value: float = 0.0

    AUTO = "auto"
    CLASSIC = "classic"
    TRY_FLOAT_MULT = "try_float_mult"
    TRY_FLOAT_QUANT = "try_float_quant"
    TRY_INT_MULT = "try_int_mult"
    TRY_DICT = "try_dict"


@dataclass(frozen=True)
class DeltaSpec:
    kind: str = "auto"  # auto | no_op | try_consecutive | try_lookback | try_conv1
    order: int = 0

    AUTO = "auto"
    NO_OP = "no_op"
    TRY_CONSECUTIVE = "try_consecutive"
    TRY_LOOKBACK = "try_lookback"
    TRY_CONV1 = "try_conv1"


@dataclass(frozen=True)
class PagingSpec:
    kind: str = "equal_pages_up_to"  # equal_pages_up_to | exact
    max_page_n: int = c.DEFAULT_MAX_PAGE_N
    exact: tuple = ()

    @classmethod
    def equal_pages_up_to(cls, n: int) -> "PagingSpec":
        return cls("equal_pages_up_to", max_page_n=n)

    @classmethod
    def exact_pages(cls, ns) -> "PagingSpec":
        return cls("exact", exact=tuple(ns))

    def n_per_page(self, n: int) -> List[int]:
        """ref: chunk_config.rs:934-983 — equal split with remainder up front."""
        if self.kind == "equal_pages_up_to":
            if n == 0:
                return []
            n_pages = -(-n // self.max_page_n)
            page_n_low = n // n_pages
            r = n % n_pages
            res = [page_n_low + 1] * r + [page_n_low] * (n_pages - r)
        else:
            res = list(self.exact)
        if sum(res) != n:
            raise InvalidArgumentError(
                f"paging spec suggests {sum(res)} numbers but {n} were given"
            )
        for page_n in res:
            if page_n == 0:
                raise InvalidArgumentError("cannot write data page of 0 numbers")
        return res


@dataclass(frozen=True)
class ChunkConfig:
    compression_level: int = c.DEFAULT_COMPRESSION_LEVEL
    mode_spec: ModeSpec = field(default_factory=ModeSpec)
    delta_spec: DeltaSpec = field(default_factory=DeltaSpec)
    paging_spec: PagingSpec = field(default_factory=PagingSpec)
    enable_8_bit: bool = False
    # TPU-profile extension (not in the reference): cap the trained
    # ans_size_log. Smaller tANS tables make the decode kernel's in-VMEM
    # select trees proportionally cheaper (tree cost ~ table_size/128 lane
    # gathers per symbol) at a small ratio cost from coarser weight
    # quantization. Files stay standard pco — ans_size_log is ordinary
    # chunk metadata. Applied at final training only, so mode/delta
    # decisions (and host/device byte-identity) are unaffected by the cap.
    ans_size_log_cap: Optional[int] = None

    def validate(self, latent_type: LatentType) -> None:
        if self.ans_size_log_cap is not None and not (
            1 <= self.ans_size_log_cap <= c.MAX_ANS_BITS
        ):
            raise InvalidArgumentError(
                f"ans_size_log_cap must be in [1, {c.MAX_ANS_BITS}] "
                f"(was {self.ans_size_log_cap})"
            )
        if self.compression_level > c.MAX_COMPRESSION_LEVEL:
            raise InvalidArgumentError(
                f"compression level may not exceed {c.MAX_COMPRESSION_LEVEL} "
                f"(was {self.compression_level})"
            )
        ds = self.delta_spec
        if ds.kind == DeltaSpec.TRY_CONSECUTIVE and ds.order > c.MAX_CONSECUTIVE_DELTA_ORDER:
            raise InvalidArgumentError(
                f"consecutive delta order may not exceed {c.MAX_CONSECUTIVE_DELTA_ORDER}"
            )
        if ds.kind == DeltaSpec.TRY_CONV1:
            if ds.order > c.MAX_CONV1_DELTA_ORDER:
                raise InvalidArgumentError(
                    f"conv1 delta order may not exceed {c.MAX_CONV1_DELTA_ORDER}"
                )
            if latent_type.bits > 32:
                raise InvalidArgumentError(
                    "Conv1 delta encoding is only supported for types with 32 or fewer bits"
                )
        if latent_type.bits == 8 and not self.enable_8_bit:
            raise InvalidArgumentError(
                "compressing 8-bit types with Pco is often a mistake; "
                "enable them on the ChunkConfig if you know what you're doing"
            )
