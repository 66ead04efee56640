"""Per-group clustering operators (SURVEY §2.10 M5-M7).

The reference reduces each user's interest embeddings with GPU UMAP,
computes a pairwise cosine distance matrix, and clusters with HDBSCAN
(assets/old_history.py:154-176) — all single-process per user. The
Spark-native shape is ``applyInPandas`` per group: each group's
vectors fit one worker (documented bound, same constraint the
reference has in stronger form), groups distribute across the
cluster.

Backends are pluggable: production would import umap/hdbscan inside
the worker function (executor-side import, GPU via task resource
requests). The built-in fallback is a deterministic threshold
clustering — cosine-similarity graph + union-find connected
components, with an HDBSCAN-style noise label (-1) for undersized
clusters — so tests and oracles are hermetic.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def threshold_cluster_labels(
    vectors: np.ndarray, similarity_threshold: float, min_cluster_size: int
) -> np.ndarray:
    """Deterministic clustering: connect pairs with cosine ≥ threshold,
    label = index of the cluster's smallest member position; clusters
    smaller than ``min_cluster_size`` get noise label -1."""
    n = len(vectors)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    norms = np.linalg.norm(vectors, axis=1)
    norms[norms == 0] = 1.0
    unit = vectors / norms[:, None]
    sims = unit @ unit.T
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= similarity_threshold:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(n)])
    labels = np.full(n, -1, dtype=np.int64)
    for root in np.unique(roots):
        members = np.where(roots == root)[0]
        if len(members) >= min_cluster_size:
            labels[members] = root
    return labels


def cluster_embeddings(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("user_id",),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    similarity_threshold: float = 0.3,
    min_cluster_size: int = 2,
    label_fn: Callable[[np.ndarray], np.ndarray] | None = None,
    resources=None,
) -> DataFrame:
    """M5-M7: per-group clustering via applyInPandas.

    Output: group cols + ``id_col`` + ``cluster_label`` (bigint;
    -1 = noise). The label is remapped to the MIN member id of the
    cluster so labels are stable across row orders and partitionings
    (G5's positional attach is impossible here — the label is
    computed in the same pandas frame as the rows, SURVEY §7.3.7).

    ``label_fn`` swaps in a real clusterer (e.g. hdbscan.fit_predict
    on the worker); it must be a pure function of the vector array.

    ``resources`` (ml.resources.ModelResources): validates the
    session's GPU confs for accelerated ``label_fn``s (cuML UMAP/
    HDBSCAN — the reference's GPU clustering stack,
    utils/old_history_utils.py:137-165) and caps concurrent tasks by
    repartitioning on the group keys.
    """
    keys = list(group_cols)
    if resources is not None:
        resources.validate_session(df.sparkSession)
        if resources.max_concurrent_tasks:
            df = df.repartition(resources.max_concurrent_tasks, *keys)
    schema = T.StructType(
        [df.schema[k] for k in keys]
        + [
            df.schema[id_col],
            T.StructField("cluster_label", T.LongType()),
        ]
    )

    def op(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        if label_fn is not None:
            raw = np.asarray(label_fn(vecs), dtype=np.int64)
        else:
            raw = threshold_cluster_labels(
                vecs, similarity_threshold, min_cluster_size
            )
        ids = pdf[id_col].to_numpy()
        out_labels = np.full(len(pdf), -1, dtype=np.int64)
        for lab in np.unique(raw):
            if lab == -1:
                continue
            members = raw == lab
            out_labels[members] = ids[members].min()
        res = pdf[keys + [id_col]].copy()
        res["cluster_label"] = out_labels
        return res

    return df.groupBy(*keys).applyInPandas(op, schema=schema)
