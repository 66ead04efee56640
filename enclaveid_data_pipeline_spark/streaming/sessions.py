"""Structured Streaming session windows (SURVEY §2.11).

The reference is batch-only; its incremental story is a poll-based
sensor plus full per-user re-materialization (sensors/__init__.py:
16-40). The natural streaming extension of the gap-based sessionizer
(operators.sessionize) is ``F.session_window(ts, gap)``: identical
semantics to the batch cumsum form for a fixed gap, with watermarked
state cleanup for late data — the piece the reference lacks entirely.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _event_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: Legacy layout: events.parquet written as TIMESTAMP(NANOS) — the
#: stream schema reads raw INT64 nanos and converts at the boundary
#: (same convention as sources.readers for the batch path).
EVENT_SCHEMA = _event_schema(T.LongType())

#: Current layout: TIMESTAMP(MICROS, isAdjustedToUTC=false) — read
#: directly as TIMESTAMP_NTZ, no conversion needed.
EVENT_SCHEMA_US = _event_schema(T.TimestampNTZType())


def _ts_is_nanos(directory: str, glob: str) -> bool:
    """Peek ONE parquet footer to pick the stream schema. A stream
    source needs its schema up front, but the corpus has shipped in
    two layouts (int64/TIMESTAMP(NANOS) vs μs NTZ) — one driver-side
    footer read resolves it instead of hardcoding either. Defaults to
    the current μs layout when no file has landed yet."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq
    except ImportError:  # no pyarrow → assume current layout
        return False
    for p in sorted(_glob.glob(os.path.join(directory, glob))):
        try:
            typ = pq.ParquetFile(p).schema_arrow.field("ts").type
        except (OSError, KeyError, pa.ArrowInvalid):
            return False
        return pa.types.is_int64(typ) or (
            pa.types.is_timestamp(typ) and typ.unit == "ns"
        )
    return False


def read_event_stream(
    spark: SparkSession,
    directory: str,
    glob: str = "events*.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over event parquet drops (the streaming
    replacement for the reference's directory-diff sensor, S9).
    Schema-adaptive across both corpus layouts via a one-footer peek;
    either way the stream surfaces ``ts`` as a proper timestamp.
    ``max_files_per_trigger`` pins drop→micro-batch granularity in
    tests (and bounds batch size in production backfills)."""
    nanos = _ts_is_nanos(directory, glob)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    r = spark.readStream.schema(
        EVENT_SCHEMA if nanos else EVENT_SCHEMA_US
    ).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = r.parquet(directory)
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # watermarks/windows demand TIMESTAMP (LTZ) — surface the NTZ
        # source column as LTZ (micros-identity under the UTC session)
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def streaming_session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Sessionize a stream: one output row per (user, session window)
    with the event count and span. Watermark bounds session state —
    late events beyond it start new sessions instead of reopening
    closed state (the batch path has no such cutoff; document the
    divergence when replaying history through the stream).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a stream synchronously to completion against a memory
    sink (local smoke harness; production sinks are files/Kafka via
    the same writeStream)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def streaming_exact_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of operators.dedup.exact_dedup_groups: emit each
    key once, suppressing re-deliveries across micro-batches.

    ``dropDuplicates`` keyed on (key, event-time) with a watermark
    bounds the dedup state: keys older than the watermark are evicted,
    so state is O(keys within the watermark window), not O(stream
    history) — the property that makes exact dedup runnable on an
    unbounded 100 TB/day feed. A re-delivery later than the watermark
    is NOT suppressed (document the at-least-once boundary; batch
    reconciliation owns the tail).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        [*key_cols, ts_col]
    )


def streaming_near_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    emit_window: str = "1 minute",
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    shingle_width: int = 3,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate suppression: a document
    arriving after a near-duplicate (within the watermark horizon) is
    flagged, using the SAME banding scheme as the batch
    ``minhash_lsh_pairs`` path so batch and stream agree on what
    counts as a candidate.

    Shape: the signature is computed IN-ROW (``shingle_hashes`` →
    one-pass k-minima fold → band keys) — the batch path's
    explode→groupBy codegen form would be a stateful aggregation here,
    so the narrow higher-order-function form is the right trade on a
    stream (per-micro-batch volume is bounded; no extra shuffle, no
    extra state). Band rows then pass through
    ``dropDuplicatesWithinWatermark`` keyed on (band_idx, band_key) —
    state is O(bands within the watermark), evicted as event time
    advances — and a windowed count per document tallies how many of
    its bands were first-seen.

    Output (append mode, emitted when the watermark closes the
    window): ``doc_id, window_start, n_novel_bands, novel`` where
    ``novel`` ⇔ every band was unseen. A document with ZERO novel
    bands (e.g. an exact re-delivery) produces no row at all; a
    document sharing ≥1 band with earlier traffic appears with
    ``novel = false`` — the LSH any-band candidate rule. Documents
    shorter than one shingle produce no bands and no row; route them
    through the exact-dedup path instead.
    """
    from ..operators.dedup import (
        lsh_band_keys,
        minhash_signature_from_hashes,
        shingle_hashes,
        tokenize,
        word_shingles,
    )

    sh = word_shingles(tokenize(F.col(text_col)), shingle_width)
    sig = minhash_signature_from_hashes(shingle_hashes(sh), num_hashes)
    banded = docs.select(
        F.col(id_col),
        F.col(ts_col),
        F.posexplode(lsh_band_keys(sig, bands, rows_per_band)).alias(
            "band_idx", "band_key"
        ),
    )
    fresh = banded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["band_idx", "band_key"]
    )
    counts = fresh.groupBy(
        F.window(ts_col, emit_window).alias("__w"), F.col(id_col)
    ).agg(F.count(F.lit(1)).alias("n_novel_bands"))
    return counts.select(
        id_col,
        F.col("__w.start").alias("window_start"),
        "n_novel_bands",
        (F.col("n_novel_bands") == bands).alias("novel"),
    )
