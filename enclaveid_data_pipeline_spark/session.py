"""SparkSession construction with engine defaults.

The reference executes eagerly on a single node (Polars) and delegates
SQL to Postgres; here one lazy Spark DAG owns the whole pipeline, so
the session is where the scale knobs live: AQE for runtime re-planning
(skew joins, partition coalescing), UTC session timezone so results are
comparable with UTC-naive engines (DuckDB oracle), Arrow for the
pandas-operator boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "enclaveid_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    model_resources=None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults are tuned for correctness-vs-oracle and local[N] testing,
    but every setting is the one you want on a real cluster too:
    AQE + skew-join handling on, dynamic partition overwrite for
    idempotent per-user rewrites (reference deletes-then-inserts per
    user_id, assets/recent_history.py:130-138), Arrow enabled for the
    pandas-operator boundary.

    ``model_resources`` (ml.resources.ModelResources) installs the
    GPU scheduling confs (``spark.task.resource.gpu.amount`` etc.)
    the model stages will later validate against — resource confs
    are immutable after session build, so they must enter here
    (reference's GPU-bound vLLM/cuML stages,
    utils/old_history_utils.py:137-165).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Shuffle/spill files MUST NOT live in /tmp: long benches have lost
    # live blockmgr-*/temp_shuffle_* files to external /tmp cleaners
    # (FileNotFound mid-stage -> task retries -> driver timeout).  Keep
    # scratch under an engine-owned directory; overridable via env.
    # spark.local.dir is a static conf — only the first session creator
    # in the JVM gets a say, which is fine: every entrypoint funnels
    # through get_spark.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if not local_dir:
        local_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".spark-local")
    os.makedirs(local_dir, exist_ok=True)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.local.dir", local_dir)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Parquet TIMESTAMP(NANOS) (pandas datetime64[ns] writers) is
        # otherwise an illegal type for the vectorized reader; read as
        # long and convert at the source boundary (sources.readers).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if model_resources is not None:
        for k, v in model_resources.spark_confs().items():
            builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
