from .bpe import train_bpe
from .cdc import apply_changes, latest_snapshot, scd2_history
from .expectations import check_expectations
from .graph import pagerank_fixed
from .ivm import incremental_join
from .mview import build_mview, plan_mview, rewrite_rollup
from .timeseries import interpolate_linear, locf
from .recency import recency_split
from .sessionize import chunk_ids, session_gaps, sessionize
from .thresholds import group_percentile, winsorize, with_group_threshold
from .trainprep import balance_classes

__all__ = [
    "recency_split",
    "chunk_ids",
    "session_gaps",
    "sessionize",
    "group_percentile",
    "with_group_threshold",
    "winsorize",
    "latest_snapshot",
    "build_mview",
    "plan_mview",
    "rewrite_rollup",
    "interpolate_linear",
    "locf",
    "apply_changes",
    "scd2_history",
    "incremental_join",
    "pagerank_fixed",
    "check_expectations",
    "balance_classes",
    "train_bpe",
]
