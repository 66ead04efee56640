"""Linear text-classifier inference (fastText-shaped quality filter).

Production corpora gate documents with cheap learned linear models —
fastText-style quality/language filters scoring billions of docs
before any expensive model sees them. The inference plan is what
this module provides; the weights normally arrive from offline
training as a (feature_id, weight) table. Here the demo weights are
derived deterministically from md5 so the DuckDB oracle can replay
scoring end-to-end — swap :func:`demo_weight_table` for a real
trained table and nothing else changes.

The 100 TB inference shape, all native expressions:

- tokenize (split) → explode → FEATURE HASH to a fixed id space
  (md5 → mod n_features; collisions are the standard hashing-trick
  trade, bounded by n_features),
- one BROADCAST equi-join against the weight table (n_features rows
  — KBs to a few MBs; never a shuffle of the corpus side),
- per-doc partial-aggregated mean weight → sigmoid.

Mean (not sum) pooling so the score is length-invariant — fastText's
average-of-embeddings analog for the scalar case. No UDFs anywhere;
the whole plan is one explode + one broadcast join + one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def feature_hash(token, n_features: int, seed: str = "qcls"):
    """Hashing-trick feature id in [0, n_features): first 7 hex
    digits of md5(seed|token) mod n_features — same double-hash
    discipline as operators.dedup.shingle_hashes, replayable in
    SQL."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "|"), token)), 1, 7),
            16,
            10,
        ).cast("long")
        % n_features
    )


def demo_weight_table(
    spark: SparkSession, n_features: int, seed: str = "w"
) -> DataFrame:
    """Deterministic stand-in for trained weights: weight(f) uniform
    in [-1, 1) from the first 7 hex digits of md5(seed|f). A real
    deployment loads (feature_id, weight) parquet instead."""
    return spark.range(n_features).select(
        F.col("id").alias("feature_id"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed + "|"), F.col("id").cast("string"))),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**7))
            * 2.0
            - 1.0
        ).alias("weight"),
    )


def hashed_linear_scores(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    seed: str = "qcls",
    out_col: str = "score",
) -> DataFrame:
    """Score every document with the linear model: sigmoid of the
    MEAN weight of its hashed whitespace tokens. ``weights`` is a
    (feature_id, weight) table, broadcast (it is n_features rows by
    construction). Docs whose token list is empty score NULL —
    surfaced, not defaulted, because a quality gate must see "no
    evidence" as its own state."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).withColumn("feature_id", feature_hash(F.col("__tok"), n_features, seed))
    scored = (
        toks.join(F.broadcast(weights), "feature_id")
        .groupBy(id_col)
        .agg(F.avg("weight").alias("__mean_w"))
        .withColumn(
            out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__mean_w")))
        )
        .drop("__mean_w")
    )
    return docs.select(id_col).join(scored, id_col, "left")


#: fixed-point scale for trained weights / margins / residuals
TRAIN_SCALE = 1_000_000


def hashed_doc_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    seed: str = "qcls",
) -> DataFrame:
    """(id, feature_id, cnt) hashed bag-of-tokens per document — the
    shared input of training and fixed-point scoring. One explode +
    one groupBy; the id space is ``n_features`` by construction."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
        )
        .withColumn(
            "feature_id", feature_hash(F.col("__tok"), n_features, seed)
        )
        .groupBy(id_col, "feature_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_linear_classifier(
    docs: DataFrame,
    label: "F.Column",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    seed: str = "qcls",
    iterations: int = 2,
    lr: int = 4,
    materialize: str | None = None,
) -> DataFrame:
    """Distributed full-batch logistic-regression training of the
    hashed linear model :func:`hashed_linear_scores` serves (round
    12): the missing training half of the quality-filter loop — the
    docstring above says weights "arrive from offline training", and
    now the engine owns that too.

    The model matches inference exactly: margin(d) = Σ_f w[f]·c_{d,f}
    / dl_d (mean-pooled hashed tokens), p = σ(margin). Full-batch
    gradient descent, ``iterations`` rounds unrolled into the plan
    with the weight table (≤ n_features rows) materialized per round
    — the RollingBoundary discipline of the suite's other iterative
    operators; per round the corpus-sized feature table is touched
    exactly twice (forward margins, gradient scatter), each time as
    one broadcast-weight join + one aggregation, no UDFs.

    EVERY cross-row sum is BIGINT in 1e-6 fixed point — weights,
    margins, residuals, and per-(doc, feature) gradient
    contributions are integers, so training is independent of
    partitioning/summation order and a DuckDB oracle replays it
    bit-for-bit (the unigram/BM25 integer-contract discipline). The
    two transcendentals (σ's exp; nothing else) operate on integer
    inputs and are rounded straight back to fixed point.

    ``label`` is a 0/1 integer Column over ``docs`` (e.g.
    ``(F.col("lang") == "en").cast("int")``). ``lr`` is an integer
    learning rate (mean-pooled margins are small; 4 is a sane
    default at w₀=0). Documents with no tokens contribute nothing.
    Returns (feature_id, w_fx, weight) — ``weight`` = w_fx/1e6 ready
    for :func:`hashed_linear_scores`.
    """
    from ..materialize import materialize as _mat

    feats = _mat(
        hashed_doc_features(docs, id_col, text_col, n_features, seed)
        .join(
            docs.select(
                F.col(id_col), label.cast("long").alias("__y")
            ),
            on=id_col,
        ),
        materialize,
    )
    dl = feats.groupBy(id_col).agg(
        # max over the per-doc-constant label (not first(), which is
        # order-dependent by contract even when values agree)
        F.sum("cnt").alias("__dl"), F.max("__y").alias("__y")
    )
    n_docs = dl.agg(F.count(F.lit(1)).alias("__N"))
    w = feats.select("feature_id").distinct().withColumn(
        "w_fx", F.lit(0).cast("long")
    )
    for _ in range(iterations):
        margins = (
            feats.join(F.broadcast(w), on="feature_id")
            .groupBy(id_col)
            .agg(F.sum(F.col("w_fx") * F.col("cnt")).alias("__S"))
            .join(dl, on=id_col)
            .select(
                F.col(id_col),
                "__y",
                "__dl",
                F.round(
                    F.col("__S").cast("double") / F.col("__dl")
                )
                .cast("long")
                .alias("__m"),
            )
        )
        resid = margins.select(
            F.col(id_col),
            "__dl",
            (
                F.round(
                    F.lit(float(TRAIN_SCALE))
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -(
                                F.col("__m").cast("double")
                                / F.lit(float(TRAIN_SCALE))
                            )
                        )
                    )
                ).cast("long")
                - F.col("__y") * F.lit(TRAIN_SCALE)
            ).alias("__r"),
        )
        grads = (
            feats.join(resid, on=id_col)
            .groupBy("feature_id")
            .agg(
                F.sum(
                    F.round(
                        F.col("__r").cast("double")
                        * F.col("cnt")
                        / F.col("__dl")
                    ).cast("long")
                ).alias("__g")
            )
        )
        w = _mat(
            w.join(grads, on="feature_id", how="left")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "feature_id",
                (
                    F.col("w_fx")
                    - F.round(
                        F.lit(float(lr))
                        * F.coalesce(F.col("__g"), F.lit(0)).cast(
                            "double"
                        )
                        / F.col("__N")
                    ).cast("long")
                ).alias("w_fx"),
            ),
            materialize,
        )
    return w.select(
        "feature_id",
        "w_fx",
        (F.col("w_fx") / F.lit(float(TRAIN_SCALE))).alias("weight"),
    )


def fixed_point_margins(
    docs: DataFrame,
    weights_fx: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    seed: str = "qcls",
) -> DataFrame:
    """(id, m_fx) fixed-point margins of every document under a
    trained (feature_id, w_fx) table — the evaluation twin of the
    training forward pass, for oracle-exact downstream thresholds
    (``m_fx > 0`` ⇔ p > ½). Unseen features weigh 0 via the left
    join."""
    feats = hashed_doc_features(docs, id_col, text_col, n_features, seed)
    return (
        feats.join(
            F.broadcast(weights_fx.select("feature_id", "w_fx")),
            on="feature_id",
            how="left",
        )
        .groupBy(id_col)
        .agg(
            F.sum(
                F.coalesce(F.col("w_fx"), F.lit(0)) * F.col("cnt")
            ).alias("__S"),
            F.sum("cnt").alias("__dl"),
        )
        .select(
            F.col(id_col),
            F.round(F.col("__S").cast("double") / F.col("__dl"))
            .cast("long")
            .alias("m_fx"),
        )
    )


def save_classifier(
    weights_fx: DataFrame, path: str, params: dict | None = None
) -> int:
    """Persist a trained (feature_id, w_fx) weight table through the
    snapshot/catalog layer with the same typed-kind handshake as the
    ANN index lifecycle (operators.knn.save_ann_index) — atomic
    versioned commit, time travel to the previous model one version
    back. Returns the committed version."""
    from ..sources.layout import write_snapshot

    meta = {"index_kind": "linear_classifier", **(params or {})}
    return write_snapshot(
        weights_fx.select("feature_id", "w_fx"), path, commit_meta=meta
    )


def load_classifier(spark, path: str, version: int | None = None):
    """(weights_fx, meta) of a :func:`save_classifier` table; refuses
    non-classifier snapshots via the kind handshake."""
    from ..sources.layout import read_commit_meta, read_snapshot

    meta = read_commit_meta(path, version=version) or {}
    if meta.get("index_kind") != "linear_classifier":
        raise ValueError(
            f"snapshot at {path!r} has kind {meta.get('index_kind')!r},"
            f" expected 'linear_classifier'"
        )
    return read_snapshot(spark, path, version=version), meta


def teacher_agreement(
    docs: DataFrame,
    weights_fx: DataFrame,
    label: "F.Column",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    seed: str = "qcls",
) -> float:
    """Fraction of documents where the student's decision
    (fixed-point margin > 0) matches the teacher label — the
    classifier's staleness metric: when the corpus drifts away from
    the distribution the student was trained on, agreement with the
    (always-current) teacher decays, and THAT is the measured
    retrain trigger. One broadcast-weight join + one aggregate."""
    m = fixed_point_margins(
        docs, weights_fx, id_col, text_col, n_features, seed
    )
    row = (
        m.join(
            docs.select(F.col(id_col), label.cast("long").alias("__y")),
            on=id_col,
        )
        .agg(
            F.avg(
                ((F.col("m_fx") > 0) == (F.col("__y") == 1)).cast("double")
            ).alias("agreement")
        )
        .first()
    )
    return float(row["agreement"]) if row["agreement"] is not None else 1.0


def refresh_classifier(
    spark,
    docs: DataFrame,
    label: "F.Column",
    path: str,
    min_agreement: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    iterations: int = 16,
    lr: int = 128,
) -> dict:
    """Close the classifier lifecycle loop, mirroring
    operators.knn.refresh_ann_index: load the persisted student,
    measure teacher agreement on the CURRENT corpus, and only below
    ``min_agreement`` retrain (:func:`train_linear_classifier`) and
    commit the new weights as the next snapshot version with the
    triggering measurement in commit_meta. At or above the threshold
    nothing trains and the version is untouched — the
    no-needless-retrain half matters because the agreement probe is
    two cheap passes while retraining is 2·iterations corpus scans.
    ``n_features``/``seed`` come from the persisted model's meta so
    student and probe can never hash into different feature spaces.
    Returns {"refreshed", "version", "agreement", "threshold"}."""
    from ..sources.layout import current_snapshot

    w, meta = load_classifier(spark, path)
    n_features = int(meta.get("n_features", 1024))
    seed = str(meta.get("seed", "qcls"))
    version = current_snapshot(path)
    agreement = teacher_agreement(
        docs, w, label, id_col, text_col, n_features, seed
    )
    out = {
        "refreshed": False,
        "version": version,
        "agreement": agreement,
        "threshold": min_agreement,
    }
    if agreement >= min_agreement:
        return out
    retrained = train_linear_classifier(
        docs, label, id_col, text_col, n_features, seed,
        iterations=iterations, lr=lr,
    )
    new_version = save_classifier(
        retrained,
        path,
        params={
            **{k: v for k, v in meta.items() if k != "index_kind"},
            "refreshed_from": version,
            "trigger_agreement": agreement,
        },
    )
    out.update({"refreshed": True, "version": new_version})
    return out
