"""Materialization boundary for multi-consumer intermediate frames.

Several operators compute a frame that feeds 2+ consumers (both sides
of a self-join, a size aggregate + join sides, per-round CC labels).
Without a boundary Spark re-runs the producing subtree once per
consumer; with one, consumers read materialized rows.

Three real strategies, one escape hatch:

- ``local``  — ``DataFrame.localCheckpoint()``: blocks pinned in
  executor storage (memory/disk). Cheapest, but NOT fault-tolerant:
  executor loss discards blocks and the job cannot recompute them
  (lineage was truncated). The right default for single-JVM local
  runs and tests.
- ``reliable`` — ``DataFrame.checkpoint()``: blocks written to the
  SparkContext checkpoint dir (HDFS/object store on a cluster), so
  executor loss recovers by re-reading. The 100 TB default; set
  ``spark.sparkContext.setCheckpointDir()`` to a durable URI (we
  auto-set a local fallback if unset so the mode always works).
- ``table`` — write parquet to a scratch path and read it back: the
  operationally strongest form (survives driver loss, inspectable,
  shareable across jobs; columnar + min/max footer stats for
  downstream pushdown, which RDD-block checkpoints don't give).
  The in-code analog of "persist the signature table" that the
  reference pipelines do between stages.
- ``none``  — no boundary (pure lazy). For plan inspection / tiny
  inputs where recompute beats materialization.

Default resolution: explicit argument > ``SPARK_GRAFT_MATERIALIZE``
env var > ``local``. Operators thread a ``materialize=`` parameter to
here, so one env var flips the whole engine to durable boundaries on
a real cluster without touching call sites.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

MODES = ("local", "reliable", "table", "none")

#: env var read when a call site passes ``materialize=None``.
ENV_VAR = "SPARK_GRAFT_MATERIALIZE"

#: env var overriding the scratch directory used by ``table`` mode.
SCRATCH_ENV_VAR = "SPARK_GRAFT_SCRATCH"


def resolve_mode(mode: str | None) -> str:
    out = mode or os.environ.get(ENV_VAR) or "local"
    if out not in MODES:
        raise ValueError(f"materialize mode {out!r} not in {MODES}")
    return out


def _scratch_dir() -> str:
    return os.environ.get(SCRATCH_ENV_VAR) or os.path.join(
        os.getcwd(), "spark-warehouse", "_materialize"
    )


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        # Local fallback so ``reliable`` never silently fails; real
        # clusters should setCheckpointDir to an object-store URI.
        sc.setCheckpointDir(os.path.join(_scratch_dir(), "_checkpoints"))


def materialize(df: DataFrame, mode: str | None = None) -> DataFrame:
    """Cut lineage under ``df`` per the chosen strategy (see module doc).

    Returns a frame with identical rows/schema whose plan reads the
    materialized data instead of recomputing the producing subtree.
    """
    mode = resolve_mode(mode)
    if mode == "none":
        return df
    if mode == "local":
        return df.localCheckpoint()
    if mode == "reliable":
        _ensure_checkpoint_dir(df)
        return df.checkpoint()
    # table
    path = os.path.join(_scratch_dir(), f"mat-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
