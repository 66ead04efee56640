from .recency import recency_split
from .sessionize import chunk_ids, session_gaps, sessionize
from .thresholds import group_percentile, with_group_threshold

__all__ = [
    "recency_split",
    "chunk_ids",
    "session_gaps",
    "sessionize",
    "group_percentile",
    "with_group_threshold",
]
