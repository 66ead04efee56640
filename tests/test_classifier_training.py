"""Distributed logistic-GD training of the hashed linear classifier
(round 12): learns a separable token rule, loss decreases with
iterations, and the trained weights drive the existing float
inference path consistently with the fixed-point margins."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.classifier import (
    TRAIN_SCALE,
    fixed_point_margins,
    hashed_linear_scores,
    train_linear_classifier,
)

N_FEATURES = 64


def _corpus(spark):
    # positive docs carry 'spam' tokens heavily; negatives never do
    rows = [
        (i, "spam buy spam now spam deal spam " + f"filler{i} pad{i}", 1)
        for i in range(12)
    ] + [
        (100 + i, f"alpha{i} beta{i} gamma{i} delta{i} text{i} body{i} "
                  f"words{i} here{i}", 0)
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _logloss(margins, labels):
    eps = 1e-12
    tot = 0.0
    for m, y in zip(margins, labels):
        p = 1.0 / (1.0 + math.exp(-m))
        p = min(max(p, eps), 1 - eps)
        tot += -(y * math.log(p) + (1 - y) * math.log(1 - p))
    return tot / len(margins)


def _eval(spark, docs, iters):
    w = train_linear_classifier(
        docs, label=F.col("y"), n_features=N_FEATURES,
        iterations=iters, lr=64,
    )
    got = (
        fixed_point_margins(docs, w, n_features=N_FEATURES)
        .join(docs.select("doc_id", "y"), on="doc_id")
        .collect()
    )
    margins = [r["m_fx"] / TRAIN_SCALE for r in got]
    labels = [r["y"] for r in got]
    return w, got, _logloss(margins, labels)


def test_training_learns_separable_rule_and_loss_decreases(spark):
    docs = _corpus(spark)
    _, got0, loss0 = _eval(spark, docs, 1)
    w, got, loss = _eval(spark, docs, 8)
    assert loss < loss0  # more rounds, lower full-batch logloss
    # perfect separation on the separable toy problem
    for r in got:
        assert (r["m_fx"] > 0) == (r["y"] == 1), r
    # weights are integer fixed-point with the float view attached
    row = w.first()
    assert row["weight"] == row["w_fx"] / TRAIN_SCALE


def test_trained_weights_drive_float_inference_consistently(spark):
    """hashed_linear_scores (float mean-pool + sigmoid) under the
    trained weight table must agree in DECISION with the fixed-point
    margins — the two paths share the model, not just the format."""
    docs = _corpus(spark)
    w = train_linear_classifier(
        docs, label=F.col("y"), n_features=N_FEATURES,
        iterations=8, lr=64,
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in hashed_linear_scores(
            docs, w.select("feature_id", "weight"),
            n_features=N_FEATURES,
        ).collect()
    }
    margins = {
        r["doc_id"]: r["m_fx"]
        for r in fixed_point_margins(
            docs, w, n_features=N_FEATURES
        ).collect()
    }
    for d, m in margins.items():
        assert (scores[d] > 0.5) == (m > 0), (d, scores[d], m)


def _drift_corpus(spark, proxy_pos, proxy_neg, base):
    """Teacher = stopword density > 1/16. Positives carry 2x'the' in
    ~20 tokens plus 4 proxy tokens; negatives carry no stopwords and
    the OTHER proxy. The proxy is the stronger feature, so a student
    trained on one proxy assignment flips when the proxies swap —
    the classic spurious-correlation distribution shift."""
    rows = []
    for i in range(16):
        filler = " ".join(f"w{base}{i}x{j}" for j in range(14))
        rows.append(
            (base * 1000 + i,
             f"the {filler} the {proxy_pos} {proxy_pos} {proxy_pos} {proxy_pos}")
        )
        rows.append(
            (base * 1000 + 100 + i,
             f"{filler} only{base}{i} {proxy_neg} {proxy_neg} {proxy_neg} {proxy_neg}")
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_refresh_classifier_triggers_on_drift_and_recovers(spark, tmp_path):
    """Lifecycle loop: persisted student agrees with the teacher on
    its training distribution (no-op refresh), disagrees after the
    spurious-correlation flip (refresh triggers, version advances,
    provenance recorded), and the retrained student recovers."""
    import os

    from enclaveid_data_pipeline_spark.operators.classifier import (
        load_classifier,
        refresh_classifier,
        save_classifier,
        teacher_agreement,
        train_linear_classifier,
    )

    teacher = (
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t == F.lit("the"))
        )
        * 16
        > F.size(F.split(F.col("text"), " "))
    ).cast("int")
    old = _drift_corpus(spark, "proxyA", "proxyB", base=1)
    new = _drift_corpus(spark, "proxyB", "proxyA", base=2)
    path = os.path.join(tmp_path, "clf")

    w = train_linear_classifier(
        old, teacher, n_features=N_FEATURES, iterations=16, lr=128
    )
    v1 = save_classifier(
        w, path, params={"n_features": N_FEATURES, "seed": "qcls"}
    )
    assert teacher_agreement(
        old, w, teacher, n_features=N_FEATURES
    ) >= 0.95

    # in-distribution: no retrain, version untouched
    res0 = refresh_classifier(
        spark, old, teacher, path, min_agreement=0.9
    )
    assert res0["refreshed"] is False and res0["version"] == v1

    # drifted corpus: agreement collapses, retrain commits v2
    res1 = refresh_classifier(
        spark, new, teacher, path, min_agreement=0.9
    )
    assert res1["refreshed"] is True and res1["version"] > v1
    assert res1["agreement"] < 0.9

    w2, meta = load_classifier(spark, path)
    assert meta["refreshed_from"] == v1
    assert meta["trigger_agreement"] == res1["agreement"]
    assert teacher_agreement(
        new, w2, teacher, n_features=N_FEATURES
    ) >= 0.9

    # and the loop is again quiescent on the new distribution
    res2 = refresh_classifier(
        spark, new, teacher, path, min_agreement=0.9
    )
    assert res2["refreshed"] is False and res2["version"] == res1["version"]


def test_quality_gate_sink_routes_by_persisted_model(spark, tmp_path):
    """Streamed gate == batch margins under the persisted model;
    replay is idempotent; each row records the model version that
    gated it, and a mid-stream model refresh shows up as a version
    boundary in the output instead of a restart."""
    import os
    import shutil

    from enclaveid_data_pipeline_spark.operators.classifier import (
        fixed_point_margins,
        save_classifier,
        train_linear_classifier,
    )
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        quality_gate_sink,
    )

    docs = _corpus(spark)
    w = train_linear_classifier(
        docs, label=F.col("y"), n_features=N_FEATURES,
        iterations=8, lr=64,
    )
    model_path = os.path.join(tmp_path, "model")
    v1 = save_classifier(
        w, model_path, params={"n_features": N_FEATURES, "seed": "qcls"}
    )
    want = {
        r["doc_id"]: r["m_fx"]
        for r in fixed_point_margins(
            docs, w, n_features=N_FEATURES
        ).collect()
    }

    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    out = str(tmp_path / "gated")
    rows = sorted((r["doc_id"], r["text"]) for r in docs.collect())

    def drop(name, batch):
        df = spark.createDataFrame(batch, "doc_id long, text string")
        staging = tmp_path / "staging" / name
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"docs-{name}.parquet")

    ckpt = os.path.join(tmp_path, "ckpt")

    def start(use_ckpt=True):
        return quality_gate_sink(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir)),
            out,
            model_path,
            checkpoint_dir=ckpt if use_ckpt else None,
        )

    q = start()
    try:
        drop("000", rows[:12])
        q.processAllAvailable()
        # batch 1 carries a NULL-text doc: no features, no margin —
        # must surface in rejected ("no evidence"), never vanish
        drop("001", rows[12:] + [(999, None)])
        q.processAllAvailable()
    finally:
        q.stop()

    acc = spark.read.parquet(os.path.join(out, "accepted")).collect()
    rej = spark.read.parquet(os.path.join(out, "rejected")).collect()
    null_doc = [r for r in rej if r["doc_id"] == 999]
    assert len(null_doc) == 1 and null_doc[0]["m_fx"] is None
    rej = [r for r in rej if r["doc_id"] != 999]
    assert {r["doc_id"] for r in acc} == {d for d, m in want.items() if m > 0}
    assert {r["doc_id"] for r in rej} == {d for d, m in want.items() if m <= 0}
    for r in acc + rej:
        assert r["m_fx"] == want[r["doc_id"]]
        assert r["_model_version"] == v1

    # no-checkpoint replay (model unchanged) rewrites the same
    # partitions byte-for-byte
    q2 = start(use_ckpt=False)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    acc2 = spark.read.parquet(os.path.join(out, "accepted")).collect()
    assert sorted((r["doc_id"], r["m_fx"]) for r in acc2) == sorted(
        (r["doc_id"], r["m_fx"]) for r in acc
    )

    # commit an inverted model mid-stream: the checkpointed query
    # resumes, only the NEW batch is gated (old partitions keep v1),
    # and its rows flip decision under the new version
    inverted = w.select(
        "feature_id", (-F.col("w_fx")).alias("w_fx"), "weight"
    )
    v2 = save_classifier(
        inverted, model_path,
        params={"n_features": N_FEATURES, "seed": "qcls"},
    )
    q3 = start()
    try:
        drop("002", [(500, rows[0][1])])  # clone of a positive doc
        q3.processAllAvailable()
    finally:
        q3.stop()
    late = [
        r
        for r in spark.read.parquet(os.path.join(out, "rejected")).collect()
        if r["doc_id"] == 500
    ]
    assert len(late) == 1 and late[0]["_model_version"] == v2 > v1
