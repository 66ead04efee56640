from .vectors import cosine_similarity, dot_product, l2_norm, with_norm
from .timeutils import (
    calendar_offset,
    epoch_seconds,
    hhmm_to_timestamp,
    parse_offset_string,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "with_norm",
    "calendar_offset",
    "epoch_seconds",
    "hhmm_to_timestamp",
    "parse_offset_string",
]
