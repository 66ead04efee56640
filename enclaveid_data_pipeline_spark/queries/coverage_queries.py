"""Coverage-widening queries: the composed session-merge semantics,
classic TPC-H shapes (Q4/Q6/Q18 families), the full window-function
surface, multi-quantiles, and corpus-sampling / vocabulary /
TF-IDF operators for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..operators.merge import connected_components
from ..sources.readers import read_table
from .registry import REGISTRY, register

# native kernel; bit-identical after round-6 on the fixtures (see
# similarity_queries._duck_cos for the verification note)
_DUCK_COS = (
    "list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
)


@register(
    "session_merge_full",
    oracle=f"""
    WITH pairs AS (
        SELECT a.label AS label, a.vec_id AS src, b.vec_id AS dst
        FROM embeddings a
        JOIN embeddings b
          ON a.label = b.label
         AND b.vec_id > a.vec_id
         AND b.vec_id - a.vec_id <= 3
        WHERE round({_DUCK_COS}, 6) >= 0.2
    ), sym AS (
        SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
    ), recursive_reach AS (
        WITH RECURSIVE reach(node, root) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.node
        )
        SELECT * FROM reach
    ), cc AS (
        SELECT node, min(root) AS component FROM recursive_reach GROUP BY node
    ), labeled AS (
        SELECT e.label, e.vec_id,
               coalesce(cc.component, e.vec_id) AS component
        FROM embeddings e LEFT JOIN cc ON cc.node = e.vec_id
    )
    SELECT label,
           CAST(component AS BIGINT) AS merged_id,
           CAST(min(vec_id) AS BIGINT) AS span_start,
           CAST(max(vec_id) AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_members
    FROM labeled
    GROUP BY label, component
    """,
)
def session_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL merge semantics composed (J1+P8+J4):
    candidate pairs must satisfy BOTH the temporal-adjacency bound
    (gap predicate, assets/recent_history.py:401-407; here id
    distance ≤ 3 stands in for the epoch gap) AND the similarity
    threshold (cosine ≥ s, 408-409), then transitive merge via
    connected components with span aggregation (min start / max end
    — the GREATEST/LEAST of the reference's UPDATE, 418-445).
    Unpaired rows remain singleton spans."""
    from .similarity_queries import _label_pairs_shared

    emb = read_table(spark, sf_dir, "embeddings")
    # shared per-label pair table (round 12): its pinned `sim` column
    # IS round(similarity, 6), so the threshold predicate is unchanged
    pairs = _label_pairs_shared(spark, sf_dir)
    edges = pairs.filter(
        (F.col("right_id") - F.col("left_id") <= 3)
        & (F.col("sim") >= 0.2)
    ).select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    cc = connected_components(edges)
    labeled = emb.join(cc, emb.vec_id == cc.node, "left").select(
        "label",
        "vec_id",
        F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
    )
    return labeled.groupBy("label", F.col("component").alias("merged_id")).agg(
        F.min("vec_id").alias("span_start"),
        F.max("vec_id").alias("span_end"),
        F.count(F.lit(1)).alias("n_members"),
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(8,4))), 2) AS DOUBLE)
               AS promo_revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + 1-row agg —
    the pushdown benchmark (every predicate reaches the parquet
    reader; no shuffle at all beyond the final 1-row reduce)."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(8,4)")
            ),
            2,
        )
        .cast("double")
        .alias("promo_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           round(o.o_totalprice, 2) AS total_price,
           CAST(t.sum_qty AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN (
        SELECT l_orderkey,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
    ) t ON t.l_orderkey = o.o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join with HAVING — the
    pre-aggregation side collapses lineitem to one row per order
    BEFORE the join (aggregate pushdown by construction)."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    t = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return o.join(t, o.o_orderkey == t.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total_price"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
    )


@register(
    "q4_priority_with_late_items",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join with a correlated residual
    predicate, then aggregate."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "window_function_surface",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           round(lead(o_totalprice, 1, 0.0) OVER w, 2) AS next_price,
           round(first_value(o_totalprice) OVER w, 2) AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-family coverage in one sorted window pass: rank,
    dense_rank, ntile, percent_rank, cume_dist, lead (with default),
    first_value."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(F.lead("o_totalprice", 1, 0.0).over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
    )


@register(
    "quantile_profile",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
           round(quantile_cont(c_acctbal, 0.50), 4) AS p50,
           round(quantile_cont(c_acctbal, 0.75), 4) AS p75,
           round(quantile_cont(c_acctbal, 0.95), 4) AS p95
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 generalized: multi-quantile in ONE pass via the array form
    of exact percentile (Spark sorts the group once for all four)."""
    c = read_table(spark, sf_dir, "customer")
    q = F.percentile(
        "c_acctbal", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95))
    )
    return c.groupBy("c_mktsegment").agg(
        F.round(F.element_at(q, 1), 4).alias("p25"),
        F.round(F.element_at(q, 2), 4).alias("p50"),
        F.round(F.element_at(q, 3), 4).alias("p75"),
        F.round(F.element_at(q, 4), 4).alias("p95"),
    )


@register(
    "hash_sample_events",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 7))::BIGINT % 100 < 5
    """,
)
def hash_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% corpus sample by key hash — reproducible
    across runs/engines/partitionings (unlike rand()-based sampling),
    the right primitive for carving train/eval splits at 100 TB."""
    ev = read_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 7), 16, 10)
        .cast("long")
        % 100
    )
    return ev.filter(bucket < 5).select("event_id", "user_id", "event_type")


@register(
    "stratified_sample_docs",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(doc_id::VARCHAR), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rn <= 20
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: fixed quota per class, hash-ordered so
    the draw is deterministic — class-balancing primitive for
    training corpora."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "vocabulary_top20",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), counts AS (
        SELECT token, count(*) AS freq FROM tok GROUP BY token
    ), ranked AS (
        SELECT token, freq,
               row_number() OVER (ORDER BY freq DESC, token) AS rn
        FROM counts
    )
    SELECT token, CAST(freq AS BIGINT) AS freq, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 20
    """,
)
def vocabulary_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: explode tokens → count → global top-k.
    The global sort is only over the (distinct-token) aggregate,
    never the token stream."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    # Top-k FIRST: orderBy().limit() plans TakeOrderedAndProject —
    # distributed per-partition heads — so no single task ever holds
    # the full vocabulary order (10^7+ tokens at corpus scale). The
    # rank window runs over only the 20 survivors.
    top = counts.orderBy(F.desc("freq"), F.asc("token")).limit(20)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return top.withColumn("rn", F.row_number().over(w)).select(
        "token", "freq", F.col("rn").cast("long").alias("rn")
    )


@register(
    "tfidf_top3_per_doc",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), tf AS (
        SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.token,
               round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    ), ranked AS (
        SELECT doc_id, token, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token
               ) AS rn
        FROM scored
    )
    SELECT doc_id, token, tfidf, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def tfidf_top3_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keywords: term frequency ⋈ document frequency (tiny —
    broadcast) × corpus size, top-3 terms per document. The df table
    and scalar N are broadcast; only the tf table shuffles."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # scalar; embedded as a literal in the plan
    scored = tf.join(F.broadcast(df), on="token").select(
        "doc_id",
        "token",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tfidf", F.col("rn").cast("long").alias("rn"))
    )


@register("session_merge_banded", oracle=REGISTRY["session_merge_full"].oracle)
def session_merge_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4.3.2 banded twin of ``session_merge_full`` — same oracle,
    same output, but candidate pairs come from the (group, band)
    equi-join (operators.similarity.banded_pairwise_similarity) so
    the quadratic per-group pair space never materializes. The gap
    bound (id distance ≤ 3) IS the band width, which is what makes
    banding lossless here."""
    from ..operators.similarity import banded_pairwise_similarity

    emb = read_table(spark, sf_dir, "embeddings")
    pairs = banded_pairwise_similarity(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        group_cols=("label",),
        band_width=3,
    )
    edges = pairs.filter(F.round("similarity", 6) >= 0.2).select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    )
    cc = connected_components(edges)
    labeled = emb.join(cc, emb.vec_id == cc.node, "left").select(
        "label",
        "vec_id",
        F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
    )
    return labeled.groupBy("label", F.col("component").alias("merged_id")).agg(
        F.min("vec_id").alias("span_start"),
        F.max("vec_id").alias("span_end"),
        F.count(F.lit(1)).alias("n_members"),
    )


@register(
    "skewed_merge_banded_hotkey",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, embedding,
               CASE WHEN vec_id % 2 = 0 THEN -1 ELSE label END AS label
        FROM embeddings
    ), pairs AS (
        SELECT a.label AS label, a.vec_id AS src, b.vec_id AS dst
        FROM emb a
        JOIN emb b
          ON a.label = b.label
         AND b.vec_id > a.vec_id
         AND b.vec_id - a.vec_id <= 3
        WHERE round({_DUCK_COS}, 6) >= 0.2
    ), sym AS (
        SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
    ), recursive_reach AS (
        WITH RECURSIVE reach(node, root) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.node
        )
        SELECT * FROM reach
    ), cc AS (
        SELECT node, min(root) AS component FROM recursive_reach GROUP BY node
    ), labeled AS (
        SELECT e.label, e.vec_id,
               coalesce(cc.component, e.vec_id) AS component
        FROM emb e LEFT JOIN cc ON cc.node = e.vec_id
    )
    SELECT label,
           CAST(component AS BIGINT) AS merged_id,
           CAST(min(vec_id) AS BIGINT) AS span_start,
           CAST(max(vec_id) AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_members
    FROM labeled
    GROUP BY label, component
    """,
)
def skewed_merge_banded_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key stress twin of ``session_merge_banded``: every even
    vec_id is remapped into ONE group (label -1), so half the corpus
    shares a single merge key — the skew shape that breaks per-group
    all-pairs plans. The banded path survives by construction: the
    shuffle/join key is (label, band), so the hot group's candidates
    spread across ~n/W band buckets instead of one task, and AQE
    skew-join (on in session defaults) splits any residual fat
    partition. Oracle replays the identical remap in SQL; the stress
    suite additionally pins the band-key spread on a synthetic
    hot-key fixture (tests/test_scale_stress.py)."""
    from ..operators.similarity import banded_pairwise_similarity

    emb = read_table(spark, sf_dir, "embeddings").withColumn(
        "label",
        F.when(F.col("vec_id") % 2 == 0, F.lit(-1)).otherwise(F.col("label")),
    )
    pairs = banded_pairwise_similarity(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        group_cols=("label",),
        band_width=3,
    )
    edges = pairs.filter(F.round("similarity", 6) >= 0.2).select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    )
    cc = connected_components(edges)
    labeled = emb.join(cc, emb.vec_id == cc.node, "left").select(
        "label",
        "vec_id",
        F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
    )
    return labeled.groupBy("label", F.col("component").alias("merged_id")).agg(
        F.min("vec_id").alias("span_start"),
        F.max("vec_id").alias("span_end"),
        F.count(F.lit(1)).alias("n_members"),
    )


@register(
    "incremental_rollup_merge",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows,
           strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
           strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship,
           round(CAST(sum(l_quantity) AS DOUBLE) / count(*), 6) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance, exercised end-to-end: the
    lineitem table arrives as three batches (split on
    ``l_orderkey % 3``); each batch is reduced to mergeable partials
    and folded into the running rollup; the avg derives at read time.
    The oracle is the FULL recompute — the commutative-monoid
    equivalence ``agg(A∪B∪C) == merge(merge(agg(A), agg(B)), agg(C))``
    is the whole claim, and it holds exactly (decimal sums, no float
    folds) so the hashes match. Per-batch cost is O(batch + keys);
    corpus size never enters (operators/rollup.py)."""
    from ..operators.rollup import merge_rollups, rollup_partials, with_ratio

    li = read_table(spark, sf_dir, "lineitem")
    keys = ("l_returnflag", "l_linestatus")
    measures = {
        "sum_qty": ("sum", "l_quantity"),
        "n_rows": ("count", "*"),
        "min_ship": ("min", "l_shipdate"),
        "max_ship": ("max", "l_shipdate"),
    }
    batches = [
        li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)
    ]
    rollup = rollup_partials(batches[0], keys, measures)
    for b in batches[1:]:
        rollup = merge_rollups(
            rollup, rollup_partials(b, keys, measures), keys, measures
        )
    out = with_ratio(rollup, "avg_qty", "sum_qty", "n_rows")
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.date_format("min_ship", "yyyy-MM-dd").alias("min_ship"),
        F.date_format("max_ship", "yyyy-MM-dd").alias("max_ship"),
        "avg_qty",
    )


@register(
    "incremental_distinct_rollup",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS merge_close,
           TRUE AS est_within_10pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def incremental_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental COUNT(DISTINCT) maintenance via mergeable HLL
    sketches (operators/rollup.py 'hll' kind): lineitem arrives as
    three batches, each batch's per-key Datasketches HLL partial
    folds into the rollup by sketch union, and the estimate derives
    at read time. Distinct counts are NOT additive across batches —
    the sketch union is the set-union monoid, which the output pins
    two ways: ``merge_close`` (estimate from the folded batch
    sketches within 2% of the single-pass sketch's estimate; the
    union gadget works in HLL_8 so the two sketches are not
    byte-identical, but both estimate the same union) and
    ``est_within_10pct`` (the estimate tracks the true distinct
    count; default lgK=12 gives ~1.6% standard error). The sketch
    is KBs per key at any corpus
    size — the 100 TB alternative, carrying every distinct value in
    the rollup, is unbounded state."""
    from ..operators.rollup import merge_rollups, rollup_partials, with_estimate

    li = read_table(spark, sf_dir, "lineitem")
    keys = ("l_returnflag",)
    measures = {"pk": ("hll", "l_partkey"), "n_rows": ("count", "*")}
    batches = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    rollup = rollup_partials(batches[0], keys, measures)
    for b in batches[1:]:
        rollup = merge_rollups(
            rollup, rollup_partials(b, keys, measures), keys, measures
        )
    merged = with_estimate(rollup, "est_m", "pk").select(
        "l_returnflag", "n_rows", "est_m"
    )
    full = with_estimate(
        rollup_partials(li, keys, measures), "est_f", "pk"
    ).select("l_returnflag", "est_f")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_exact")
    )
    return (
        merged.join(full, "l_returnflag")
        .join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_exact").cast("long").alias("n_exact"),
            (
                F.abs(F.col("est_m").cast("double") - F.col("est_f"))
                / F.col("est_f")
                <= 0.02
            ).alias("merge_close"),
            (
                F.abs(
                    F.col("est_m").cast("double") - F.col("n_exact")
                )
                / F.col("n_exact")
                <= 0.1
            ).alias("est_within_10pct"),
        )
    )


@register(
    "dq_expectations_events",
    oracle=r"""
    WITH m AS (
        SELECT count(*) AS total,
               sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v_null,
               sum(CASE WHEN value IS NULL OR value < 0 OR value > 100
                        THEN 1 ELSE 0 END) AS v_range,
               sum(CASE WHEN event_type NOT IN
                        ('click','error','purchase','signup','view')
                        THEN 1 ELSE 0 END) AS v_vals,
               count(*) - count(DISTINCT event_id) AS v_uniq,
               sum(CASE WHEN props IS NULL
                        OR NOT regexp_matches(props, '^\{.*\}$')
                        THEN 1 ELSE 0 END) AS v_match
        FROM events
    )
    SELECT r.rule,
           CAST(r.v AS BIGINT) AS n_violations,
           round(r.v / greatest(m.total, 1), 6) AS violation_frac,
           CAST(r.v <= r.thr * m.total AS BIGINT) AS passed
    FROM m, LATERAL (VALUES
        ('not_null_user_id', m.v_null, 0.0),
        ('in_range_value', m.v_range, 0.5),
        ('accepted_values_event_type', m.v_vals, 0.0),
        ('unique_event_id', m.v_uniq, 0.0),
        ('matches_props', m.v_match, 0.0)
    ) AS r(rule, v, thr)
    """,
)
def dq_expectations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators.expectations) over
    events: five rules — null check, tolerated range band (50%
    threshold, so 'passed with violations' is exercised), value
    whitelist, key uniqueness, and a regex shape check — ALL compiled
    into one conditional-aggregate pass (one scan regardless of rule
    count). Output is the metrics frame a quality table would land;
    the oracle recomputes every counter independently in SQL."""
    from ..operators.expectations import (
        accepted_values,
        check_expectations,
        in_range,
        matches,
        not_null,
        unique,
    )

    ev = read_table(spark, sf_dir, "events")
    rules = [
        not_null("user_id"),
        in_range("value", 0, 100, threshold=0.5),
        accepted_values(
            "event_type", ["click", "error", "purchase", "signup", "view"]
        ),
        unique(("event_id",)),
        matches("props", r"^\{.*\}$"),
    ]
    out = check_expectations(ev, rules)
    return out.select(
        "rule",
        "n_violations",
        "violation_frac",
        F.col("passed").cast("long").alias("passed"),
    )


@register(
    "funnel_signup_click_purchase",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase,
           round(CAST((SELECT count(*) FROM s3) AS DOUBLE) /
                 greatest((SELECT count(*) FROM s1), 1), 4)
               AS full_conversion
    """,
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → later click → later
    purchase): each stage is first-occurrence-AFTER the previous
    stage, not mere co-occurrence — the strict event-ordering form
    analytics engines sell as a primitive. Three chained per-user
    aggregates on the SAME user_id grouping, so Catalyst reuses one
    exchange; each stage's join input shrinks to the survivors of
    the previous stage (semi-join-shaped, never the event table
    squared)."""
    ev = read_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n_signup"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n_click"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n_purchase"))
    return (
        n1.join(F.broadcast(n2))
        .join(F.broadcast(n3))
        .select(
            "n_signup",
            "n_click",
            "n_purchase",
            F.round(
                F.col("n_purchase").cast("double")
                / F.greatest(F.col("n_signup"), F.lit(1)),
                4,
            ).alias("full_conversion"),
        )
    )


@register(
    "weekly_retention_cohorts",
    oracle="""
    WITH firsts AS (
        -- epoch() is DOUBLE in DuckDB and // does not floor doubles:
        -- go through BIGINT before any integer division
        SELECT user_id,
               min(CAST(epoch(CAST(ts AS DATE)) AS BIGINT) // 86400)
                   AS first_day
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id,
               f.first_day // 7 AS cohort_week,
               (CAST(epoch(CAST(e.ts AS DATE)) AS BIGINT) // 86400
                - f.first_day) // 7 AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity GROUP BY 1, 2
    """,
)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    counted per week-offset of later activity — the
    (cohort × offset) grid behind every retention curve. Integer
    epoch-day arithmetic end to end (no date-diff float anywhere);
    one aggregate for first-seen, one equi-join back, one distinct
    count per cell, all partial-aggregated on user_id."""
    ev = read_table(spark, sf_dir, "events")
    day_i = F.unix_date(F.to_date("ts")).cast("long")
    firsts = ev.groupBy("user_id").agg(F.min(day_i).alias("first_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.expr("first_day div 7").alias("cohort_week"),
            F.expr(
                f"(unix_date(to_date(ts)) - first_day) div 7"
            ).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "props_variant_stats",
    oracle="""
    SELECT event_type,
           CAST(count(json_extract(props, '$.k')) AS BIGINT) AS n_with_k,
           CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
               AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
               AS max_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
               AS sum_k
    FROM events GROUP BY event_type
    """,
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    path extraction with ``variant_get`` — the open-schema path for
    payload columns whose shape drifts (vs. the fixed-schema
    ``from_json`` used by the takeout ingest, F10). Parse and
    extraction are row-local expressions feeding a partial-aggregated
    groupBy; at scale the variant column also shreds into parquet so
    repeated path reads skip re-parsing the text."""
    ev = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.sum("k").cast("long").alias("sum_k"),
    )


@register(
    "theta_audience_overlap",
    oracle="""
    WITH a AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ), b AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_purchase,
           CAST((SELECT count(*) FROM (
               SELECT user_id FROM a UNION SELECT user_id FROM b))
               AS BIGINT) AS n_union,
           CAST((SELECT count(*) FROM (
               SELECT user_id FROM a INTERSECT SELECT user_id FROM b))
               AS BIGINT) AS n_intersect,
           CAST((SELECT count(*) FROM (
               SELECT user_id FROM a EXCEPT SELECT user_id FROM b))
               AS BIGINT) AS n_click_only
    """,
)
def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra through Datasketches THETA sketches:
    |A|, |B|, |A∪B|, |A∩B|, |A∖B| of the click vs purchase user
    sets, all computed on two fixed-size sketches instead of joining
    the sets — THE way to answer overlap questions across 100 TB
    partitions/days, since sketches build partial-aggregated per
    segment and compose by pure sketch algebra afterward (union /
    intersection / difference), no re-scan. Below saturation
    (< nominal k entries) theta sketches are EXACT, which is what
    lets the DuckDB oracle pin the estimates against true set
    counts — the corpus' user cardinality is chosen to stay in the
    exact regime; past saturation the same plan degrades to ~2%
    error instead of failing."""
    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sa")
    )
    b = ev.filter(F.col("event_type") == "purchase").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sb")
    )
    return (
        a.join(b)
        .select(
            F.expr("theta_sketch_estimate(sa)").cast("long").alias("n_click"),
            F.expr("theta_sketch_estimate(sb)")
            .cast("long")
            .alias("n_purchase"),
            F.expr("theta_sketch_estimate(theta_union(sa, sb))")
            .cast("long")
            .alias("n_union"),
            F.expr("theta_sketch_estimate(theta_intersection(sa, sb))")
            .cast("long")
            .alias("n_intersect"),
            F.expr("theta_sketch_estimate(theta_difference(sa, sb))")
            .cast("long")
            .alias("n_click_only"),
        )
    )


@register(
    "funnel_latency_percentiles",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s1.t1
        GROUP BY e.user_id
    ), lat AS (
        SELECT s1.user_id,
               epoch_us(s3.t3) - epoch_us(s1.t1) AS lat_us
        FROM s1 JOIN s3 ON s1.user_id = s3.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(CAST(quantile_cont(lat_us, 0.5) AS BIGINT) AS BIGINT)
               AS p50_us,
           CAST(CAST(quantile_cont(lat_us, 0.9) AS BIGINT) AS BIGINT)
               AS p90_us,
           CAST(max(lat_us) AS BIGINT) AS max_us
    FROM lat
    """,
)
def funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency for the signup→purchase funnel: exact
    p50/p90/max of the signup-to-first-subsequent-purchase gap —
    the 'how long does conversion take' companion to the stage
    counts. Integer-microsecond durations end to end (float seconds
    are not engine-portable); percentiles truncated to whole µs on
    both sides. Same chained per-user aggregates as the funnel, one
    extra 1-row reduce."""
    ev = read_table(spark, sf_dir, "events")
    from ..functions.timeutils import epoch_micros

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    lat = s1.join(s3, "user_id").select(
        (epoch_micros(F.col("t3")) - epoch_micros(F.col("t1"))).alias(
            "lat_us"
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile(F.col("lat_us").cast("double"), F.lit(0.5))
        .cast("long")
        .alias("p50_us"),
        F.percentile(F.col("lat_us").cast("double"), F.lit(0.9))
        .cast("long")
        .alias("p90_us"),
        F.max("lat_us").cast("long").alias("max_us"),
    )


def _ewma_weights() -> list[str]:
    """0.5^k as exact decimal literals (5^k/10^k — decimal-exact, so
    the weighted sum is exact in both engines' DECIMAL arithmetic)."""
    return [f"{0.5 ** k:.10f}" for k in range(10)]


def _ewma_den_case(rn: str) -> str:
    """Denominator Σ_{j<min(rn,10)} 0.5^j as exact literals."""
    parts = [
        f"WHEN {rn} >= {k} THEN {sum(0.5 ** j for j in range(k)):.10f}"
        for k in range(10, 0, -1)
    ]
    return "CASE " + " ".join(parts) + " END"


_EWMA_W = _ewma_weights()

_EWMA_ORACLE = f"""
    WITH ord AS (
        SELECT user_id, event_id,
               CAST(round(value, 2) AS DECIMAL(10,2)) AS v,
               row_number() OVER w AS rn,
               {" + ".join(
                   f"coalesce(lag(CAST(round(value, 2) AS DECIMAL(10,2)), {k})"
                   f" OVER w, 0) * CAST({w} AS DECIMAL(12,10))"
                   for k, w in enumerate(_EWMA_W)
               )} AS num
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           round(num::DOUBLE / ({_ewma_den_case("rn")})::DOUBLE, 6)
               AS ewma_value
    FROM ord
"""


@register("ewma_user_values", oracle=_EWMA_ORACLE)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    (decay ½, window 10) — the trailing ML feature that weights
    recent behavior over old. Exactness trick: 0.5^k is DECIMAL-exact
    (5^k/10^k), so numerator and the rank-dependent normalizer are
    exact decimal sums of 10 lag terms in BOTH engines; the single
    double division is over engine-identical inputs. Row-local after
    one per-user window sort — no extra shuffle beyond the
    partitioning every per-user feature shares."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.round(F.col("value"), 2).cast("decimal(10,2)")
    num = None
    for k, wt in enumerate(_EWMA_W):
        term = F.coalesce(F.lag(v, k).over(w), F.lit(0).cast("decimal(10,2)")) \
            * F.lit(wt).cast("decimal(12,10)")
        num = term if num is None else num + term
    rn = F.row_number().over(w)
    den = F.expr(_ewma_den_case("rn"))
    return (
        events.select(
            "user_id",
            "event_id",
            num.alias("num"),
            rn.alias("rn"),
        )
        .select(
            "user_id",
            "event_id",
            F.round(
                F.col("num").cast("double") / den.cast("double"), 6
            ).alias("ewma_value"),
        )
    )


_CUSUM_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type, day, n,
               CAST(round(avg(n::DOUBLE) OVER wt, 4) AS DECIMAL(14,4))
                   AS mu,
               CAST(round(stddev_samp(n::DOUBLE) OVER wt, 4)
                    AS DECIMAL(14,4)) AS sd
        FROM daily
        WINDOW wt AS (PARTITION BY event_type)
    ), dev AS (
        SELECT event_type, day, n, sd,
               n - mu - CAST(round(sd::DOUBLE / 2, 4) AS DECIMAL(14,4))
                   AS y
        FROM stats
    ), cum AS (
        SELECT event_type, day, n, sd,
               sum(y) OVER wd AS c
        FROM dev
        WINDOW wd AS (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING)
    ), s AS (
        SELECT event_type, day, n, sd,
               c - least(min(c) OVER wd, 0) AS s_cusum
        FROM cum
        WINDOW wd AS (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s,
           CAST(n AS BIGINT) AS n_events,
           round(s_cusum::DOUBLE, 4) AS cusum,
           s_cusum::DOUBLE > 4 * sd::DOUBLE AS drift_flag
    FROM s
"""


@register("cusum_daily_drift", oracle=_CUSUM_ORACLE)
def cusum_daily_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential change-point detection (one-sided CUSUM) on daily
    event rates per type: S_t = max(0, S_{t-1} + x_t − μ − k) via the
    prefix identity S_t = C_t − min(0, min_{j≤t} C_j) — the recursive
    definition rewritten as cumsum + running min, both plain window
    frames (no UDF, no iteration). Slack k = σ/2, alarm at 4σ: CUSUM
    accumulates persistent small drifts a per-day z-score
    (daily_rate_anomalies) cannot see. Deviations are exact DECIMAL
    after the one rounded μ/σ aggregate, so both engines walk the
    identical path."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    wd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stats = daily.select(
        "event_type",
        "day",
        "n",
        F.round(F.avg(F.col("n").cast("double")).over(wt), 4)
        .cast("decimal(14,4)")
        .alias("mu"),
        F.round(F.stddev_samp(F.col("n").cast("double")).over(wt), 4)
        .cast("decimal(14,4)")
        .alias("sd"),
    )
    dev = stats.select(
        "event_type",
        "day",
        "n",
        "sd",
        (
            F.col("n")
            - F.col("mu")
            - F.round(F.col("sd").cast("double") / 2, 4).cast(
                "decimal(14,4)"
            )
        ).alias("y"),
    )
    cum = dev.select(
        "event_type", "day", "n", "sd", F.sum("y").over(wd).alias("c")
    )
    s = cum.select(
        "event_type",
        "day",
        "n",
        "sd",
        (F.col("c") - F.least(F.min("c").over(wd), F.lit(0))).alias(
            "s_cusum"
        ),
    )
    return s.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        F.col("n").cast("long").alias("n_events"),
        F.round(F.col("s_cusum").cast("double"), 4).alias("cusum"),
        (
            F.col("s_cusum").cast("double")
            > 4 * F.col("sd").cast("double")
        ).alias("drift_flag"),
    )


_KS_ORACLE = """
    WITH vals AS (
        SELECT source, n_chars FROM documents
    ), sizes AS (
        SELECT source, count(*) AS n_s FROM vals GROUP BY source
    ), total AS (
        SELECT count(*) AS n_g FROM vals
    ), thresholds AS (
        SELECT DISTINCT n_chars AS v FROM vals
    ), grid AS (
        SELECT s.source, s.n_s, t.v FROM sizes s CROSS JOIN thresholds t
    ), per_sv AS (
        SELECT source, n_chars AS v, count(*) AS c
        FROM vals GROUP BY source, n_chars
    ), cum_s AS (
        SELECT g.source, g.n_s, g.v,
               sum(coalesce(p.c, 0)) OVER (
                   PARTITION BY g.source ORDER BY g.v
                   ROWS UNBOUNDED PRECEDING
               ) AS cnt_s
        FROM grid g
        LEFT JOIN per_sv p ON p.source = g.source AND p.v = g.v
    ), cum_g AS (
        SELECT t.v,
               sum(coalesce(q.c, 0)) OVER (
                   ORDER BY t.v ROWS UNBOUNDED PRECEDING
               ) AS cnt_g
        FROM thresholds t
        LEFT JOIN (
            SELECT n_chars AS v, count(*) AS c FROM vals GROUP BY n_chars
        ) q ON q.v = t.v
    )
    SELECT cs.source,
           CAST(cs.n_s AS BIGINT) AS n_source,
           round(max(abs(cs.cnt_s * tt.n_g - cg.cnt_g * cs.n_s))::DOUBLE
                 / (cs.n_s * tt.n_g), 6) AS ks_stat
    FROM cum_s cs
    JOIN cum_g cg ON cg.v = cs.v
    CROSS JOIN total tt
    GROUP BY cs.source, cs.n_s, tt.n_g
"""


@register("ks_drift_by_source", oracle=_KS_ORACLE)
def ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic of each source's
    document-length distribution against the full corpus — the
    distribution-free drift test completing the detection family
    (per-day z-score, CUSUM, JS divergence). Exactness trick: the sup
    over |F_s − F_g| is taken on INTEGER cross-multiplied counts
    (|cnt_s·n_g − cnt_g·n_s|), so the argmax is engine-exact and only
    the final ratio is floating. Grid = sources × distinct lengths —
    tiny next to the corpus; both CDFs are one window cumsum.

    ONE corpus pass: the (source, length) count grid is materialized
    and every other input — per-source sizes, grand total, distinct
    thresholds, per-length counts — is an exact aggregate OF that
    grid (r12: the before-plan derived each independently from the
    raw table, 11 document scans; guide §2.4)."""
    from ..materialize import materialize as _materialize

    docs = read_table(spark, sf_dir, "documents")
    vals = docs.select("source", "n_chars")
    per_sv = _materialize(
        vals.groupBy("source", F.col("n_chars").alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    sizes = per_sv.groupBy("source").agg(F.sum("c").alias("n_s"))
    total = per_sv.agg(F.sum("c").alias("n_g"))
    thresholds = per_sv.select("v").distinct()
    grid = sizes.crossJoin(F.broadcast(thresholds))
    ws = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_s = grid.join(per_sv, on=["source", "v"], how="left").select(
        "source",
        "n_s",
        "v",
        F.sum(F.coalesce(F.col("c"), F.lit(0))).over(ws).alias("cnt_s"),
    )
    per_v = per_sv.groupBy("v").agg(F.sum("c").alias("c"))
    # global CDF runs bucketed (operators/rank.py) — the distinct
    # length grid grows with the corpus, so no single-task window
    from ..operators.rank import global_cumsum, monotone_bucket

    cum_g = global_cumsum(
        thresholds.join(per_v, on="v", how="left"),
        F.coalesce(F.col("c"), F.lit(0)),
        [F.asc("v")],
        monotone_bucket(F.col("v"), 0.0, 1000.0, 64),
        out="cnt_g",
    ).select("v", "cnt_g")
    joined = cum_s.join(cum_g, on="v").crossJoin(F.broadcast(total))
    num = F.abs(
        F.col("cnt_s") * F.col("n_g") - F.col("cnt_g") * F.col("n_s")
    )
    return (
        joined.groupBy("source", "n_s", "n_g")
        .agg(F.max(num).alias("max_num"))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_source"),
            F.round(
                F.col("max_num").cast("double")
                / (F.col("n_s") * F.col("n_g")).cast("double"),
                6,
            ).alias("ks_stat"),
        )
    )


_THEILSEN_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2
    ), idxd AS (
        SELECT event_type,
               date_diff('day', min(day) OVER (PARTITION BY event_type),
                         day) AS x,
               n AS y
        FROM daily
    ), pairs AS (
        SELECT a.event_type,
               round((b.y - a.y)::DOUBLE / (b.x - a.x), 6) AS slope
        FROM idxd a JOIN idxd b
          ON a.event_type = b.event_type AND b.x > a.x
    ), ts_med AS (
        SELECT event_type,
               round(quantile_cont(slope, 0.5), 6) AS theilsen_slope
        FROM pairs GROUP BY event_type
    ), sums AS (
        SELECT event_type,
               count(*) AS k,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM idxd GROUP BY event_type
    ), ols AS (
        SELECT event_type,
               round((k * sxy - sx * sy)::DOUBLE
                     / (k * sxx - sx * sx), 6) AS ols_slope,
               CAST(k AS BIGINT) AS n_days
        FROM sums
    )
    SELECT o.event_type, o.n_days, t.theilsen_slope, o.ols_slope
    FROM ols o JOIN ts_med t USING (event_type)
"""


@register("theilsen_trend_by_type", oracle=_THEILSEN_ORACLE)
def theilsen_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-rate trend per event type: Theil–Sen (median of
    all pairwise slopes — 29.3% breakdown point, one wild day cannot
    move it) next to the OLS slope it robustifies. Slopes are double
    divisions of exact integer (Δcount, Δday) pairs rounded to 6, so
    both engines rank the same multiset; OLS comes from exact BIGINT
    moment sums, not float accumulation. Pair generation is row-local
    (per-type day arrays, ~O(days²) per type with days ≪ corpus);
    the median is an in-row sorted-array pick, no percentile
    shuffle."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    idxd = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.min("day").over(wt)).alias("x"),
        F.col("n").alias("y"),
    )
    arr = idxd.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("x"), F.col("y")))
        ).alias("a"),
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slopes = F.flatten(
        F.transform(
            F.col("a"),
            lambda p, i: F.transform(
                F.slice(
                    F.col("a"), i + 2, F.greatest(F.size("a"), F.lit(1))
                ),
                lambda q: F.round(
                    (q["y"] - p["y"]).cast("double") / (q["x"] - p["x"]),
                    6,
                ),
            ),
        )
    )
    sorted_s = F.array_sort(slopes)
    m = F.size(sorted_s)
    med = F.when(
        m % 2 == 1,
        F.element_at(sorted_s, ((m + 1) / 2).cast("int")),
    ).otherwise(
        F.round(
            (
                F.element_at(sorted_s, (m / 2).cast("int"))
                + F.element_at(sorted_s, (m / 2 + 1).cast("int"))
            )
            / 2,
            6,
        )
    )
    return arr.select(
        "event_type",
        F.col("k").cast("long").alias("n_days"),
        F.round(med, 6).alias("theilsen_slope"),
        F.round(
            (
                F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
            ).cast("double")
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("ols_slope"),
    )


_MWU_ORACLE = """
    WITH s AS (
        SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
        FROM events WHERE event_type IN ('click', 'error')
    ), pv AS (
        SELECT value,
               sum(g) AS n1v,
               count(*) - sum(g) AS n2v,
               count(*) AS t
        FROM s GROUP BY value
    ), cum AS (
        SELECT value, n1v, n2v, t,
               coalesce(sum(t) OVER (ORDER BY value
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS c_less
        FROM pv
    ), agg AS (
        SELECT CAST(sum(n1v) AS BIGINT) AS n1,
               CAST(sum(n2v) AS BIGINT) AS n2,
               CAST(sum(n1v * (2 * c_less + t + 1)) AS BIGINT) AS r1x2,
               CAST(sum(t * t * t - t) AS BIGINT) AS tie3
        FROM cum
    )
    SELECT n1, n2,
           round((r1x2 - n1 * (n1 + 1))::DOUBLE / 2, 1) AS u1,
           round(((r1x2 - n1 * (n1 + 1))::DOUBLE / 2 - n1::DOUBLE * n2 / 2)
                 / sqrt((n1::DOUBLE * n2 / 12)
                        * ((n1 + n2 + 1)
                           - tie3::DOUBLE / ((n1 + n2)
                                             * (n1 + n2 - 1)))), 6) AS z
    FROM agg
"""


@register("mannwhitney_click_vs_error", oracle=_MWU_ORACLE)
def mannwhitney_click_vs_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test of click vs error event values —
    the nonparametric two-sample location test (no normality
    assumption, unlike the t-statistics in numeric_profile_events).
    Exactness: midranks stay integer as 2·rank (tie group at c_less
    with t members contributes n1·(2·c_less + t + 1) to 2R₁), the
    tie-correction Σ(t³−t) is an exact integer sum, and only the
    final normal-approximation z divides in double. One distinct-
    value aggregate + one window cumsum — no per-row ranking
    shuffle."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    s = ev.select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g"),
    )
    pv = s.groupBy("value").agg(
        F.sum("g").alias("n1v"),
        (F.count(F.lit(1)) - F.sum("g")).alias("n2v"),
        F.count(F.lit(1)).alias("t"),
    )
    # rank-sum CDF over the distinct-value table, bucketed — the
    # value grid grows with the corpus (operators/rank.py)
    from ..operators.rank import global_cumsum, monotone_bucket

    cum = global_cumsum(
        pv,
        F.col("t"),
        [F.asc("value")],
        monotone_bucket(F.col("value"), 0.0, 500.0, 64),
        out="c_less",
        inclusive=False,
    ).select("n1v", "n2v", "t", "c_less")
    agg = cum.agg(
        F.sum("n1v").cast("long").alias("n1"),
        F.sum("n2v").cast("long").alias("n2"),
        F.sum(
            F.col("n1v") * (2 * F.col("c_less") + F.col("t") + 1)
        ).cast("long").alias("r1x2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("long").alias("tie3"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u1 = (
        F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)
    ).cast("double") / 2
    nn = F.col("n1") + F.col("n2")
    var = (n1d * n2d / 12) * (
        (nn + 1).cast("double")
        - F.col("tie3").cast("double")
        / (nn * (nn - 1)).cast("double")
    )
    return agg.select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.round((u1 - n1d * n2d / 2) / F.sqrt(var), 6).alias("z"),
    )


_NPERM = 40

_PERM_ORACLE = f"""
    WITH s AS (
        SELECT event_id,
               CAST(round(value, 2) AS DECIMAL(12,2)) AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
        FROM events WHERE event_type IN ('click', 'error')
    ), obs AS (
        SELECT abs(sum(CASE WHEN g = 1 THEN v END)::DOUBLE
                   / sum(CASE WHEN g = 1 THEN 1 END)
                 - sum(CASE WHEN g = 0 THEN v END)::DOUBLE
                   / sum(CASE WHEN g = 0 THEN 1 END)) AS d_obs
        FROM s
    ), perms AS (
        SELECT k.k, s.v,
               CASE WHEN substr(md5(k.k::VARCHAR || '|' || s.event_id::VARCHAR),
                                1, 1) IN ('8','9','a','b','c','d','e','f')
                    THEN 1 ELSE 0 END AS pg
        FROM s, unnest(generate_series(1, {_NPERM})) AS k(k)
    ), pstat AS (
        SELECT k,
               abs(sum(CASE WHEN pg = 1 THEN v END)::DOUBLE
                   / sum(CASE WHEN pg = 1 THEN 1 END)
                 - sum(CASE WHEN pg = 0 THEN v END)::DOUBLE
                   / sum(CASE WHEN pg = 0 THEN 1 END)) AS d
        FROM perms GROUP BY k
    )
    SELECT CAST({_NPERM} AS BIGINT) AS n_perms,
           round(obs.d_obs, 6) AS observed_diff,
           round((sum(CASE WHEN pstat.d >= obs.d_obs THEN 1 ELSE 0 END)
                  + 1)::DOUBLE / ({_NPERM} + 1), 6) AS p_value
    FROM pstat, obs
    GROUP BY obs.d_obs
"""


@register("permutation_test_value_diff", oracle=_PERM_ORACLE)
def permutation_test_value_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test of the click-vs-error mean value difference
    with DETERMINISTIC permutations: permutation k reassigns each row
    by the md5(k|event_id) high bit, so the resampling distribution
    is a pure function of the data — reviewable and replayable, where
    RNG-shuffled permutation tests are neither. Group sums are exact
    DECIMAL (order-free), so every permutation statistic is
    bit-identical in both engines; p = (#{d_k ≥ d_obs}+1)/(K+1).
    Shape: one fan-out to K×n rows (row-local md5), one (k, group)
    partial-agg — embarrassingly parallel, K and n independent."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    s = ev.select(
        "event_id",
        F.round("value", 2).cast("decimal(12,2)").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g"),
    )

    def mean_diff(df, grp):
        a = F.sum(F.when(F.col(grp) == 1, F.col("v"))).cast(
            "double"
        ) / F.sum(F.when(F.col(grp) == 1, 1))
        b = F.sum(F.when(F.col(grp) == 0, F.col("v"))).cast(
            "double"
        ) / F.sum(F.when(F.col(grp) == 0, 1))
        return F.abs(a - b)

    obs = s.agg(mean_diff(s, "g").alias("d_obs"))
    ks = spark.range(1, _NPERM + 1).select(F.col("id").alias("k"))
    perms = s.crossJoin(ks).select(
        "k",
        "v",
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("k").cast("string"),
                        F.lit("|"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                1,
            ).isin("8", "9", "a", "b", "c", "d", "e", "f"),
            1,
        )
        .otherwise(0)
        .alias("pg"),
    )
    pstat = perms.groupBy("k").agg(mean_diff(perms, "pg").alias("d"))
    return (
        pstat.crossJoin(F.broadcast(obs))
        .agg(
            F.lit(_NPERM).cast("long").alias("n_perms"),
            F.round(F.first("d_obs"), 6).alias("observed_diff"),
            F.round(
                (
                    F.sum((F.col("d") >= F.col("d_obs")).cast("long")) + 1
                ).cast("double")
                / (_NPERM + 1),
                6,
            ).alias("p_value"),
        )
    )
