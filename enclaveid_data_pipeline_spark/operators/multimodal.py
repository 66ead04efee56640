"""Multimodal column plumbing (training-data pipeline extension).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
partition sizing, mapInPandas signatures — is real and tested; the
codec step is STUBBED (this container has no image/audio libraries):
``decode_stub=True`` produces a deterministic fake decode from the
bytes' md5, and ``decode_stub=False`` raises NotImplementedError at
the point where Pillow/ffmpeg would be invoked on the worker.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of
decoded frames fits worker memory, and never collect payload
columns; metadata-only projections must prune the binary column at
the parquet scan (they do: Spark columnar pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal asset schema.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

_HIGH = set("89abcdef")


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded-content feature vector."""
    out = []
    for j in range(dim):
        h = hashlib.md5(payload + b"|" + str(j).encode()).hexdigest()[:8]
        out.append(sum(1 for c in h if c in _HIGH) / 4.0 - 1.0)
    return out


def extract_features(
    assets: DataFrame, dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract over binary content via mapInPandas.

    Real pipeline: replace the stub branch with the actual codec
    (PIL.Image.open/librosa/pyav) — the operator contract (Arrow
    batch in, fixed feature schema out, executor-side import) is
    already the production shape.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires image/audio codecs not present "
                    "in this environment; use decode_stub=True"
                )
            payloads = [bytes(b) if b is not None else b"" for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(b) for b in payloads],
                    "content_md5": [
                        hashlib.md5(b).hexdigest() for b in payloads
                    ],
                    "feature": [_fake_feature(b, dim) for b in payloads],
                }
            )

    return assets.mapInPandas(op, schema=_FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling (video → rows of frames): UDTF-shaped
    mapInPandas — one asset row explodes into ceil(duration/every_ms)
    frame rows. Stub synthesizes frame ids; a real decoder would
    yield actual frame bytes per timestamp."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_index", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_md5", T.StringType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame decode not available")
            rows = []
            for _, r in pdf.iterrows():
                dur = (r["meta"]["duration_ms"] or 0) if r["meta"] is not None else 0
                payload = bytes(r["content"]) if r["content"] is not None else b""
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    rows.append(
                        (
                            r["asset_id"],
                            i,
                            ts,
                            hashlib.md5(payload + str(ts).encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "frame_ts_ms", "frame_md5"]
            )

    return assets.filter(F.col("modality") == "video").mapInPandas(op, schema=schema)


def synthetic_assets(spark, docs: DataFrame, n_modalities: int = 3) -> DataFrame:
    """Build a deterministic multimodal table from the documents
    corpus (text bytes stand in for media payloads) — test fixture
    for the plumbing above."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % n_modalities + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 100).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
