"""ANN index persistence: IVF centroids and PQ codebooks saved/loaded
through the snapshot layer must reproduce bit-identical search results
(judge r10 task #5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.knn import (
    ivf_topk,
    kmeans_refine,
    load_ann_index,
    pq_codebooks,
    pq_encode,
    pq_topk_adc,
    save_ann_index,
)
from enclaveid_data_pipeline_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_roundtrip_bit_identical(spark, tmp_path):
    emb = read_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    centroids = kmeans_refine(
        emb,
        emb.filter(F.col("vec_id") % 40 == 1),
        id_col="vec_id",
        vec_col="embedding",
        iterations=2,
    )
    direct = _rows(
        ivf_topk(queries, emb, centroids, k=5, nprobe=2)
    )
    path = os.path.join(tmp_path, "ivf_idx")
    v = save_ann_index(
        centroids, path, kind="ivf_centroids", params={"nprobe": 2}
    )
    assert v >= 0
    loaded, meta = load_ann_index(spark, path, expect_kind="ivf_centroids")
    assert meta["index_kind"] == "ivf_centroids"
    assert meta["nprobe"] == 2
    via_loaded = _rows(
        ivf_topk(queries, emb, loaded, k=5, nprobe=int(meta["nprobe"]))
    )
    assert via_loaded == direct
    assert len(direct) > 0


def test_pq_roundtrip_bit_identical(spark, tmp_path):
    emb = read_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    cb = pq_codebooks(emb.filter(F.col("vec_id") < 16), m=8)
    codes = pq_encode(emb, cb, m=8)
    direct = _rows(pq_topk_adc(queries, codes, cb, k=5))
    path = os.path.join(tmp_path, "pq_idx")
    save_ann_index(cb, path, kind="pq_codebooks", params={"m": 8})
    loaded, meta = load_ann_index(spark, path, expect_kind="pq_codebooks")
    assert meta["m"] == 8
    via_loaded = _rows(
        pq_topk_adc(queries, pq_encode(emb, loaded, m=int(meta["m"])), loaded, k=5)
    )
    assert via_loaded == direct
    assert len(direct) > 0


def test_kind_handshake_rejects_wrong_index(spark, tmp_path):
    emb = read_table(spark, SF, "embeddings")
    cb = pq_codebooks(emb.filter(F.col("vec_id") < 16), m=8)
    path = os.path.join(tmp_path, "pq_idx2")
    save_ann_index(cb, path, kind="pq_codebooks", params={"m": 8})
    with pytest.raises(ValueError, match="expected 'ivf_centroids'"):
        load_ann_index(spark, path, expect_kind="ivf_centroids")


def test_refresh_appends_version_and_time_travels(spark, tmp_path):
    emb = read_table(spark, SF, "embeddings")
    c1 = emb.filter(F.col("vec_id") % 40 == 1).select("vec_id", "embedding")
    c2 = emb.filter(F.col("vec_id") % 40 == 3).select("vec_id", "embedding")
    path = os.path.join(tmp_path, "ivf_versions")
    v1 = save_ann_index(c1, path, kind="ivf_centroids", params={"gen": 1})
    v2 = save_ann_index(c2, path, kind="ivf_centroids", params={"gen": 2})
    assert v2 > v1
    cur, meta = load_ann_index(spark, path, expect_kind="ivf_centroids")
    assert meta["gen"] == 2
    assert _rows(cur) == _rows(c2)
    old, old_meta = load_ann_index(
        spark, path, expect_kind="ivf_centroids", version=v1
    )
    assert old_meta["gen"] == 1
    assert _rows(old) == _rows(c1)
