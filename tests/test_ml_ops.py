from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.ml.backends import (
    MockCompletionBackend,
    MockEmbeddingBackend,
    RateLimiter,
)
from enclaveid_data_pipeline_spark.ml.clustering import (
    cluster_embeddings,
    threshold_cluster_labels,
)
from enclaveid_data_pipeline_spark.ml.llm_ops import embed_text, summarize_chunks
from enclaveid_data_pipeline_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthetic_assets,
)


def test_mock_embedding_deterministic():
    b = MockEmbeddingBackend(dim=4)
    v1 = b.embed(["hello", "world"])
    v2 = b.embed(["hello", "world"])
    assert v1 == v2
    assert len(v1[0]) == 4
    assert all(-1.0 <= x <= 1.0 for x in v1[0])
    assert v1[0] != v1[1]


def test_embed_text_operator(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "id long, txt string"
    )
    out = embed_text(
        df, "txt", build_backend=lambda: MockEmbeddingBackend(dim=4), dim=4
    ).collect()
    rows = {r.id: r.embedding for r in out}
    assert len(rows[1]) == 4
    assert rows[1] == MockEmbeddingBackend(dim=4).embed(["alpha"])[0]
    assert rows[3] == MockEmbeddingBackend(dim=4).embed([""])[0]  # null → ""


def test_summarize_chunks_shape(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01", 0, "09:00", "view"),
            (1, "2024-01-01", 0, "09:05", "click"),
            (1, "2024-01-01", 1, "10:00", "error"),
        ],
        "user_id long, date_s string, chunk_id long, hour_s string, title string",
    )
    out = summarize_chunks(df, build_backend=MockCompletionBackend).collect()
    assert len(out) == 2  # one row per chunk
    r0 = [r for r in out if r.chunk_id == 0][0]
    assert '"time_start": "09:00"' in r0.response
    assert '"time_end": "09:05"' in r0.response
    assert "2 events" in r0.response


def test_threshold_cluster_labels_noise_and_groups():
    vecs = np.array(
        [[1.0, 0.0], [0.999, 0.01], [0.0, 1.0], [0.01, 0.999], [-1.0, -1.0]]
    )
    labels = threshold_cluster_labels(vecs, 0.9, min_cluster_size=2)
    assert labels[0] == labels[1] != -1
    assert labels[2] == labels[3] != -1
    assert labels[0] != labels[2]
    assert labels[4] == -1  # singleton → noise


def test_cluster_embeddings_labels_stable(spark):
    df = spark.createDataFrame(
        [
            (1, 10, [1.0, 0.0]),
            (1, 11, [1.0, 0.001]),
            (1, 12, [0.0, 1.0]),
            (2, 20, [1.0, 1.0]),
        ],
        "g int, vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.cluster_label
        for r in cluster_embeddings(
            df,
            group_cols=("g",),
            similarity_threshold=0.9,
            min_cluster_size=2,
        ).collect()
    }
    assert out[10] == out[11] == 10  # label = min member id
    assert out[12] == -1  # undersized → noise
    assert out[20] == -1


def test_rate_limiter_spacing():
    import time

    rl = RateLimiter(rate_per_sec=1000.0)
    t0 = time.monotonic()
    for _ in range(5):
        rl.acquire()
    assert time.monotonic() - t0 >= 0.004


def test_multimodal_features_and_frames(spark, sf_dir):
    from enclaveid_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(9)
    assets = synthetic_assets(spark, docs)
    feats = extract_features(assets, dim=4).collect()
    assert len(feats) == 9
    assert all(len(r.feature) == 4 for r in feats)
    assert all(r.n_bytes > 0 for r in feats)
    # frame sampling explodes only video assets, ceil(duration/step) rows
    frames = sample_frames(assets, every_ms=10_000).collect()
    videos = {r.asset_id: r for r in assets.filter("modality='video'").collect()}
    assert len(videos) > 0
    per_asset = {}
    for fr in frames:
        per_asset.setdefault(fr.asset_id, []).append(fr)
    for aid, rows in per_asset.items():
        expected = -(-videos[aid].meta.duration_ms // 10_000)
        assert len(rows) == expected


def test_extract_features_stub_off_raises(spark, sf_dir):
    from enclaveid_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(1)
    assets = synthetic_assets(spark, docs)
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|real decode"):
        extract_features(assets, decode_stub=False).collect()
