from .pipeline import Pipeline, Stage, build_recent_branch_pipeline

__all__ = ["Pipeline", "Stage", "build_recent_branch_pipeline"]
