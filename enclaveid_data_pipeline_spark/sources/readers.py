"""Sources (SURVEY §2.1 S1-S4, S10).

The reference reads one ``MyActivity.json`` per user with a schema
override (``pl.read_json(..., schema_overrides={"time": Datetime})``,
reference assets/takeout.py:57-60) and moves Parquet between stages via
an IO manager (resources/__init__.py:8-10). Here every table is a lazy
DataFrame read straight from columnar Parquet — Catalyst prunes columns
and pushes filters into the scan, which is the behavior the reference
approximates by hand with narrow ``select``\\ s.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Test-corpus tables (TESTDATA.md). One parquet file per table.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Explicit schema for the reference's Takeout JSON ingest (S1).
#: ``time`` is the only typed override in the reference; everything
#: else passes through (``pl.all().exclude("time")``, takeout.py:62-68).
TAKEOUT_SCHEMA = T.StructType(
    [
        T.StructField("header", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("titleUrl", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("products", T.ArrayType(T.StringType())),
        T.StructField("activityControls", T.ArrayType(T.StringType())),
    ]
)


#: Columns stored as parquet TIMESTAMP(NANOS) by pandas writers.
#: Spark has no nanosecond timestamp: with
#: ``spark.sql.legacy.parquet.nanosAsLong`` they surface as LongType
#: nanos and are truncated (floor-div) to microseconds here — the same
#: truncation DuckDB applies converting ns → its µs TIMESTAMP, so both
#: engines see identical values.
_NANOS_TS_COLS = {"events": ("ts",)}


#: Spark's untouched shuffle-partition default; the auto-tune below
#: only ever acts on sessions still carrying it.
_SPARK_DEFAULT_SHUFFLE_PARTITIONS = "200"


def _autotune_shuffle_partitions(spark: SparkSession, sf_dir: str) -> None:
    """Scale shuffle parallelism DOWN to the corpus on untuned
    sessions (runtime-settable; same spirit as the nanosAsLong
    self-configuration): an externally built SparkSession still at
    Spark's 200-partition default pays ~200 near-empty tasks per
    shuffle on a megabyte-scale test corpus — pure scheduler latency.
    Target ≈ total input bytes / 64 MB, clamped to [16, 200]. Only
    LOWERS, only from the untouched default, so a cluster-tuned or
    large-input session is never overridden, and at real scale the
    computed target saturates back to the configured value anyway.
    AQE partition coalescing does this after the first shuffle of
    each stage; setting the initial number also skips planning the
    empty tasks.
    """
    current = spark.conf.get("spark.sql.shuffle.partitions", None)
    # unset (None) and the untouched "200" both mean "nobody tuned
    # this session"; any other value is a deliberate setting
    if current is not None and current != _SPARK_DEFAULT_SHUFFLE_PARTITIONS:
        return
    try:
        total = sum(
            os.path.getsize(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        )
    except OSError:
        return  # non-local sf_dir (object store): leave the session be
    target = max(16, min(200, -(-total // (64 * 1024 * 1024))))
    if target < 200:
        spark.conf.set("spark.sql.shuffle.partitions", str(target))


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test-corpus table (S3: parquet source)."""
    if name in _NANOS_TS_COLS:
        # Runtime-settable; required even on externally-built sessions
        # (the driver constructs its own SparkSession for entry()).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _autotune_shuffle_partitions(spark, sf_dir)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def table_row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count of a corpus table, metadata-first (round-7
    verdict item 4): parquet footers / snapshot manifests answer
    without a Spark job (layout.row_count_hint); a count() action is
    the fallback, not the default. Adaptive-width dials (SimHash
    bits, LSH plane counts) call this at plan-build time."""
    from .layout import row_count_hint

    hint = row_count_hint(os.path.join(sf_dir, f"{name}.parquet"))
    if hint is not None:
        return hint
    return read_table(spark, sf_dir, name).count()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql use."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_takeout_json(
    spark: SparkSession, path: str, row_limit: int | None = None
) -> DataFrame:
    """S1 + S10: per-user activity JSON scan with typed ``time``.

    Mirrors reference assets/takeout.py:57-76: schema'd read, rename
    ``time`` -> ``timestamp``, optional deployment row limit applied
    *after* the scan (the reference slices after filtering; the limit
    ordering is part of the contract).
    """
    df = (
        spark.read.schema(TAKEOUT_SCHEMA)
        .option("multiLine", "true")
        .json(path)
        .withColumnRenamed("time", "timestamp")
    )
    if row_limit is not None:
        df = df.limit(row_limit)
    return df


def apply_row_limit(df: DataFrame, limit: int | None) -> DataFrame:
    """S10: env-gated row limit (reference consts.py:29, .slice(0, n))."""
    return df if limit is None else df.limit(limit)


def strip_zone_pattern(fmt: str) -> str:
    """Derive the TIMESTAMP_NTZ datetime pattern from an LTZ one by
    dropping the trailing zone-offset tokens (``X``/``x``/``Z``/
    ``O``/``V``/``z``). Spark's text writers format NTZ columns with
    ``timestampNTZFormat`` — ``timestampFormat`` is silently ignored
    for them — and an NTZ pattern must not carry an offset section,
    so one user-supplied format has to serve both: parquet sources
    with ``isAdjustedToUTC=false`` (this repo's ``events`` table)
    surface as NTZ, while the same reader must also accept LTZ DDLs.

    Any separator immediately before the zone section goes with it
    (``"yyyy-MM-dd HH:mm:ss X"`` → ``"yyyy-MM-dd HH:mm:ss"``, not a
    trailing-space pattern that fails to parse values lacking that
    literal space).
    """
    return fmt.rstrip("XxZzOV").rstrip(" \t'")


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    delimiter: str = ",",
    timestamp_format: str | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """S1-family CSV source with a MANDATORY schema.

    Schema inference is banned on purpose: it costs an extra full
    pass over the data and silently changes types when the data
    drifts — the same reason the reference overrides the Takeout
    schema instead of trusting ``read_json`` inference. ``FAILFAST``
    by default: a malformed row fails the job loudly; pass
    ``mode="PERMISSIVE"`` plus a ``_corrupt_record`` column in the
    schema for quarantine-style ingest.
    """
    r = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
    )
    if timestamp_format is not None:
        r = r.option("timestampFormat", timestamp_format).option(
            "timestampNTZFormat", strip_zone_pattern(timestamp_format)
        )
    return r.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "FAILFAST",
    timestamp_format: str | None = None,
) -> DataFrame:
    """S1-family line-delimited JSON source (one object per line —
    the streaming-friendly layout; contrast ``read_takeout_json``,
    which handles the reference's multiLine array-of-objects export).
    Mandatory schema, FAILFAST by default — same stance as
    :func:`read_csv_table`. Pass a microsecond ``timestamp_format``
    (``yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX``) on BOTH write and read for
    lossless timestamps — Spark's JSON default keeps milliseconds
    only.
    """
    r = (
        spark.read.schema(schema)
        .option("multiLine", "false")
        .option("mode", mode)
    )
    if timestamp_format is not None:
        r = r.option("timestampFormat", timestamp_format).option(
            "timestampNTZFormat", strip_zone_pattern(timestamp_format)
        )
    return r.json(path)


def with_derived_time_columns(
    df: DataFrame, ts_col: str = "timestamp"
) -> DataFrame:
    """P2/F1: derive ``date``, ``hour`` (HH:mm), ``month`` (yyyy-MM-dd).

    Reference assets/takeout.py:65-67. Spark has no TimeType, so
    time-of-day is an ``HH:mm`` string (display) — arithmetic uses the
    full timestamp (SURVEY §1.2 hard part 1).
    """
    ts = F.col(ts_col)
    return (
        df.withColumn("date", F.to_date(ts))
        .withColumn("hour", F.date_format(ts, "HH:mm"))
        .withColumn("month", F.date_format(ts, "yyyy-MM-dd"))
    )


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """S3-family ORC source. ORC carries its own schema and per-stripe
    min/max statistics, so — like parquet and unlike CSV/JSONL — no
    schema argument: predicate pushdown and column pruning reach the
    stripe level natively. Useful when upstream Hive/Trino pipelines
    hand over ORC instead of parquet; same downstream plans either
    way."""
    return spark.read.orc(path)


def read_text_lines(
    spark: SparkSession,
    path: str,
    wholetext: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """S1-family raw text source: one row per line (``value`` string),
    or one row per FILE with ``wholetext=True`` — the raw-corpus
    ingest shape (one document per file / per line) in front of the
    text-analysis and dedup operators. No parsing, no schema drift;
    pair with ``F.input_file_name()`` for provenance."""
    return spark.read.text(path, wholetext=wholetext, lineSep=line_sep)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet layout whose files were written under EVOLVING
    schemas (columns added over time — the normal life of a corpus
    table). Plain reads infer the schema from one footer, silently
    dropping columns the sampled file lacks; ``mergeSchema`` unions
    every file's schema instead, with files that predate a column
    yielding NULL for it. Schema merge reads all footers (metadata
    only, not data) — at 100 TB prefer a catalog/table format for the
    schema and keep this for ad-hoc layouts; column REMOVAL or type
    change is not evolution and should go through a rewrite."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    timestamp_format: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Quarantine-style ingest: parse what parses, capture what
    doesn't — the production alternative to FAILFAST when an upstream
    feed can't be trusted to be clean but the pipeline must not stop.
    Returns ``(good, quarantined)``: good rows with the declared
    schema, quarantined rows as their raw text (``_corrupt_record``)
    for repair-and-replay.

    PERMISSIVE mode with an explicit corrupt-record column; the
    parsed frame is persisted before splitting because Spark refuses
    to answer queries that filter on the corrupt column of an
    unmaterialized scan (the parser would have to run twice and
    could disagree with itself). The quarantine side should land in
    a dated side table — repair is a batch job over it, not a
    pipeline stall."""
    ddl = schema + ", _corrupt_record string"
    r = (
        spark.read.schema(ddl)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if timestamp_format is not None:
        r = r.option("timestampFormat", timestamp_format).option(
            "timestampNTZFormat", strip_zone_pattern(timestamp_format)
        )
    df = r.csv(path).persist()
    good = df.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return good, bad
