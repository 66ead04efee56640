from .lineage import column_lineage
from .pipeline import Pipeline, Stage, build_recent_branch_pipeline

__all__ = ["Pipeline", "Stage", "build_recent_branch_pipeline", "column_lineage"]
