from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.functions.textstats import (
    lang_guess,
    quality_score,
    regex_token_count,
    whitespace_token_count,
)
from enclaveid_data_pipeline_spark.operators.knn import kmeans_refine
from enclaveid_data_pipeline_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_similarity_pairs,
    minhash_lsh_pairs,
    simhash16,
    simhash16_grouped,
    tokenize,
    word_shingles,
)
from enclaveid_data_pipeline_spark.operators.knn import (
    brute_force_topk,
    lsh_bucketed_topk,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "completely different words entirely here now"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (5, "xy"),  # fewer tokens than shingle width
        ],
        "doc_id long, text string",
    )


def test_word_shingles_and_short_doc(spark):
    out = _docs(spark).select(
        "doc_id", word_shingles(tokenize(F.col("text")), 3).alias("s")
    )
    rows = {r.doc_id: r.s for r in out.collect()}
    assert rows[1][0] == "the quick brown"
    assert len(rows[1]) == 9 - 2
    assert rows[5] == []  # guarded: no descending-sequence garbage


def test_exact_dedup_groups(spark):
    groups = exact_dedup_groups(
        _docs(spark), key=F.md5("text"), id_col="doc_id"
    ).collect()
    assert len(groups) == 1
    assert groups[0].representative_id == 1 and groups[0].n_docs == 2


def test_minhash_lsh_finds_near_dups(spark):
    toks = _docs(spark).select("doc_id", tokenize(F.col("text")).alias("t"))
    pairs = {
        (r.left_id, r.right_id)
        for r in minhash_lsh_pairs(
            toks,
            id_col="doc_id",
            shingles=word_shingles(F.col("t"), 2),
            num_hashes=8,
            bands=4,
            rows_per_band=2,
        ).collect()
    }
    assert (1, 4) in pairs  # exact dups always collide
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup collides in ≥1 band
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_jaccard_pairs_exact(spark):
    toks = _docs(spark).select("doc_id", tokenize(F.col("text")).alias("t"))
    pairs = {
        (r.left_id, r.right_id): r.jaccard
        for r in jaccard_similarity_pairs(
            toks, "doc_id", word_shingles(F.col("t"), 2), threshold=0.0
        ).collect()
    }
    assert pairs[(1, 4)] == 1.0
    assert 0.5 < pairs[(1, 2)] < 1.0
    assert (1, 3) not in pairs  # no shared shingles → never materializes


def test_simhash_duplicates_equal(spark):
    toks = _docs(spark).select("doc_id", tokenize(F.col("text")).alias("t"))
    sh = {r.doc_id: r.sh for r in toks.select("doc_id", simhash16(F.col("t")).alias("sh")).collect()}
    assert sh[1] == sh[4]
    assert 0 <= sh[1] < (1 << 16)
    assert sh[1] != sh[3]


def test_simhash_grouped_matches_column_form(spark):
    """The codegen (explode→groupBy) form and the Column reference
    form must produce identical signatures — incl. the empty-token
    edge (doc 5 tokenizes to 2 tokens; add a null-text doc too)."""
    docs = _docs(spark).union(
        spark.createDataFrame([(6, None)], "doc_id long, text string")
    )
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("t"))
    ref = {
        r.doc_id: r.sh
        for r in toks.select(
            "doc_id", simhash16(F.col("t")).alias("sh")
        ).collect()
    }
    grouped = {
        r.doc_id: r.simhash
        for r in simhash16_grouped(toks, F.col("t"), id_cols=["doc_id"]).collect()
    }
    assert set(grouped) == set(ref)
    for d in ref:
        assert grouped[d] == (ref[d] if ref[d] is not None else 0), d


def _vecs(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.99, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )


def test_brute_force_topk(spark):
    emb = _vecs(spark)
    q = emb.filter("vec_id = 0")
    out = brute_force_topk(q, emb, k=2).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 2]
    assert out[0].sim > 0.99


def test_lsh_bucketed_topk_subset_of_bucket(spark):
    emb = _vecs(spark)
    q = emb.filter("vec_id = 0")
    out = lsh_bucketed_topk(q, emb, k=3, planes=2).collect()
    buckets = {r.bucket for r in out}
    assert len(buckets) <= 1  # all results share the query's bucket
    assert all(r.neighbor_id != 0 for r in out)


def test_textstats_basics(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog, friends!")], "id long, text string"
    )
    row = df.select(
        whitespace_token_count("text").alias("ws"),
        regex_token_count("text").alias("re"),
        quality_score(F.col("text"), tokenize(F.col("text"))).alias("q"),
        lang_guess("text").alias("lang"),
    ).first()
    assert row.ws == 6
    assert row.re == 8  # 6 words + ',' + '!'
    assert 0.0 <= row.q <= 1.0
    assert row.lang == "en"


def test_prefix_filtered_jaccard_equals_exact(spark, sf_dir):
    """PPJoin prefix filter must be a pure physical optimization:
    identical output to the quadratic exact form on the real corpus."""
    from enclaveid_data_pipeline_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )
    from enclaveid_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("t"))
    exact = jaccard_similarity_pairs(
        toks, id_col="doc_id", shingles=word_shingles(F.col("t"), 3), threshold=0.8
    )
    fast = prefix_filtered_jaccard_pairs(
        toks, id_col="doc_id", shingles=word_shingles(F.col("t"), 3), threshold=0.8
    )
    assert exact.count() > 0
    assert exact.exceptAll(fast).count() == 0
    assert fast.exceptAll(exact).count() == 0


def test_prefix_filtered_jaccard_low_threshold(spark):
    """At a low threshold the prefix is most of the set — degenerates
    gracefully to the exact join, still identical output."""
    from enclaveid_data_pipeline_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    docs = _docs(spark)
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("t"))
    exact = jaccard_similarity_pairs(
        toks, id_col="doc_id", shingles=word_shingles(F.col("t"), 2), threshold=0.3
    )
    fast = prefix_filtered_jaccard_pairs(
        toks, id_col="doc_id", shingles=word_shingles(F.col("t"), 2), threshold=0.3
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, fast.collect()))


def test_hof_minhash_equals_agg_form(spark, sf_dir):
    """The column-level minhash API (shingle_hashes →
    minhash_signature_from_hashes → lsh_band_keys) must produce the
    SAME candidate pairs as the exploded/aggregated form used by
    minhash_lsh_pairs — it exists for callers that need the signature
    as a column (e.g. streaming rows), so the two paths must never
    drift."""
    from enclaveid_data_pipeline_spark.operators.dedup import (
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_lsh_pairs,
        minhash_signature_from_hashes,
        shingle_hashes,
    )
    from enclaveid_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("t"))

    agg_pairs = minhash_lsh_pairs(
        toks, id_col="doc_id", shingles=word_shingles(F.col("t"), 3),
        num_hashes=16, bands=4, rows_per_band=4,
    )

    sh = toks.select(
        "doc_id", word_shingles(F.col("t"), 3).alias("s")
    ).filter(F.size("s") > 0)
    hs = sh.withColumn("hs", shingle_hashes(F.col("s")))
    sig = hs.withColumn("sig", minhash_signature_from_hashes(F.col("hs"), 16))
    banded = sig.select(
        "doc_id", lsh_band_keys(F.col("sig"), bands=4, rows_per_band=4).alias("bands")
    )
    hof_pairs = lsh_candidate_pairs(banded, id_col="doc_id")

    assert agg_pairs.exceptAll(hof_pairs).count() == 0
    assert hof_pairs.exceptAll(agg_pairs).count() == 0
    assert agg_pairs.count() > 0


def test_kmeans_refine_improves_assignment_and_keeps_empty_cells(spark):
    """Two well-separated blobs + one far-off centroid: refinement
    pulls centroids to blob means (mean assignment similarity must
    not decrease — Lloyd's monotonicity), and a centroid that
    captures no members keeps its previous position instead of
    vanishing."""
    import numpy as np

    rng = [
        (i, [10.0 + (i % 5) * 0.1, 1.0, 0.0]) for i in range(20)
    ] + [
        (100 + i, [0.0, 1.0, 10.0 + (i % 5) * 0.1]) for i in range(20)
    ]
    corpus = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    # init: one vector from blob A, one from blob B, one orthogonal
    # direction no vector points at (captures nothing after round 1)
    init = spark.createDataFrame(
        [
            (0, [10.0, 1.0, 0.0]),
            (100, [0.0, 1.0, 10.0]),
            (999, [-1.0, 0.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    refined = kmeans_refine(corpus, init, iterations=2)
    out = {r.vec_id: list(r.embedding) for r in refined.collect()}
    assert set(out) == {0, 100, 999}
    # empty cell unchanged
    assert out[999] == [-1.0, 0.0, -1.0]
    # refined blob centroids sit at (rounded) blob means
    a = np.array([v for i, v in rng if i < 100], dtype=float).mean(axis=0)
    b = np.array([v for i, v in rng if i >= 100], dtype=float).mean(axis=0)
    assert np.allclose(out[0], np.round(a, 6))
    assert np.allclose(out[100], np.round(b, 6))


def test_semantic_dedup_drops_higher_id_near_dups(spark):
    from enclaveid_data_pipeline_spark.operators.knn import semantic_dedup

    # two tight pairs in opposite half-spaces plus one loner; centroid
    # table = one member of each half-space so cells split cleanly
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),      # near-dup of 1, same cell
            (3, [-1.0, 0.0, 0.0]),
            (4, [-0.999, -0.01, 0.0]),    # near-dup of 3, same cell
            (5, [0.0, 1.0, 0.2]),         # loner (closer to cell 1)
        ],
        "vec_id long, embedding array<double>",
    )
    cent = vecs.filter(F.col("vec_id").isin(1, 3))
    out = semantic_dedup(vecs, cent, threshold=0.99)
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == 5  # one row per input vector
    assert [rows[i].kept for i in (1, 2, 3, 4, 5)] == [
        True, False, True, False, True,
    ]
    # the drop is recorded in the cell where the pair collided
    assert rows[2].cell == rows[1].cell
    assert rows[4].cell == rows[3].cell


def test_ivf_topk_sweep_matches_per_nprobe_calls(spark):
    """ivf_topk_sweep (ONE cell assignment + ONE candidate join,
    sliced by probe rank) must be row-identical to independent
    ivf_topk calls at every nprobe — the equivalence the r12
    ivf_nprobe_recall_tradeoff rewrite relies on."""
    import math

    from enclaveid_data_pipeline_spark.operators.knn import (
        ivf_topk,
        ivf_topk_sweep,
    )

    # 36 deterministic unit-ish vectors spread over 3 dims so cells
    # are non-trivial and nprobe=1 vs 2 genuinely differ
    rows = [
        (
            i,
            [
                math.sin(0.7 * i + d) + 0.1 * d
                for d in range(3)
            ],
        )
        for i in range(36)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = emb.filter(F.col("vec_id") % 7 == 0)
    cent = emb.filter(F.col("vec_id") % 9 == 1)
    sweep = ivf_topk_sweep(
        queries, emb, cent, k=4, nprobes=(1, 2), materialize="none"
    )
    for nprobe in (1, 2):
        want = sorted(
            ivf_topk(queries, emb, cent, k=4, nprobe=nprobe).collect()
        )
        got = sorted(sweep[nprobe].collect())
        assert got == want, f"nprobe={nprobe} diverged"
    # the sweep's nprobe results are genuinely different workloads
    assert sorted(sweep[1].collect()) != sorted(sweep[2].collect())


def test_semantic_dedup_threshold_keeps_everything(spark):
    from enclaveid_data_pipeline_spark.operators.knn import semantic_dedup

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(vecs, vecs.limit(1), threshold=1.1)
    assert all(r.kept for r in out.collect())


def test_random_projection_deterministic_and_linear(spark):
    from enclaveid_data_pipeline_spark.operators.knn import (
        random_projection_grouped,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [-1.0, -2.0, -3.0, -4.0])],
        "vec_id long, embedding array<double>",
    )
    out = random_projection_grouped(vecs, out_dims=4)
    rows = {r.vec_id: r for r in out.collect()}
    # sign projection is linear: p(-v) == -p(v) (mod -0.0 folding)
    for j in range(4):
        assert rows[1][f"p{j}"] == -rows[2][f"p{j}"] or (
            rows[1][f"p{j}"] == 0.0 and rows[2][f"p{j}"] == 0.0
        )
    # deterministic across invocations (md5 seeds, no rand())
    again = {r.vec_id: r for r in random_projection_grouped(
        vecs, out_dims=4).collect()}
    assert rows == again


def test_random_projection_rejects_wide_output(spark):
    import pytest

    from enclaveid_data_pipeline_spark.operators.knn import (
        random_projection_grouped,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        random_projection_grouped(vecs, out_dims=17)


def _pq_vecs(spark):
    """24 deterministic 8-dim vectors in 3 well-separated direction
    families so exact top-1 is unambiguous."""
    import math

    rows = []
    for i in range(24):
        fam = i % 3
        base = [0.0] * 8
        base[fam * 2] = 1.0
        base[fam * 2 + 1] = 0.3
        # small deterministic per-vector perturbation within family;
        # the 0.001*(i+1) term makes every vector's subvectors unique
        # (no equidistant-codeword ties in any subspace)
        eps = 0.01 * (i // 3)
        vec = [
            round(
                b
                + eps * math.sin(d + i)
                + 0.001 * (i + 1) * math.cos(2 * d + i),
                4,
            )
            for d, b in enumerate(base)
        ]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_encode_shape_and_self_code(spark):
    from enclaveid_data_pipeline_spark.operators.knn import (
        pq_codebooks,
        pq_encode,
    )

    emb = _pq_vecs(spark)
    seeds = emb.filter("vec_id < 4")
    cb = pq_codebooks(seeds, m=4)
    assert cb.count() == 16  # 4 seeds x 4 subspaces
    codes = pq_encode(emb, cb, m=4).collect()
    assert len(codes) == 24 and all(len(r.codes) == 4 for r in codes)
    # a seed vector encodes to its own codeword in every subspace
    own = {r.vec_id: r.codes for r in codes if r.vec_id < 4}
    for sid, cs in own.items():
        assert cs == [sid] * 4


def test_pq_adc_approximates_exact_ranking(spark):
    from enclaveid_data_pipeline_spark.operators.knn import (
        brute_force_topk,
        pq_codebooks,
        pq_encode,
        pq_topk_adc,
    )

    emb = _pq_vecs(spark)
    # one seed per family -> codebook can separate families
    seeds = emb.filter("vec_id IN (0, 1, 2)")
    cb = pq_codebooks(seeds, m=4)
    codes = pq_encode(emb, cb, m=4)
    q = emb.filter("vec_id IN (3, 4, 5)")
    adc = pq_topk_adc(q, codes, cb, k=8).collect()
    exact = brute_force_topk(q, emb, k=8).collect()
    # ADC's nearest codeword family matches exact search's top-1 family
    adc_top = {r.query_id: r.neighbor_id % 3 for r in adc if r.rank == 1}
    exact_top = {r.query_id: r.neighbor_id % 3 for r in exact if r.rank == 1}
    assert adc_top == exact_top
    # every query ranks all non-self candidates (ADC is a total order)
    from collections import Counter

    per_q = Counter(r.query_id for r in adc)
    assert all(v == 8 for v in per_q.values())


def test_ivf_pq_composition_ranks_within_probed_cells(spark):
    """The production IVF-PQ shape: coarse cells bound the candidate
    set, ADC ranks inside it — results are exactly ADC restricted to
    the probed cells' members."""
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.operators.knn import (
        _prep_centroids,
        assign_cells,
        pq_codebooks,
        pq_encode,
        pq_topk_adc,
    )

    emb = _pq_vecs(spark)
    cent = _prep_centroids(emb.filter("vec_id IN (0, 1, 2)"), "vec_id", "embedding")
    cells = assign_cells(emb, cent, "vec_id", "embedding").select(
        "vec_id", "cent_id"
    )
    cb = pq_codebooks(emb.filter("vec_id < 4"), m=4)
    codes = pq_encode(emb, cb, m=4).join(cells, on="vec_id")
    q = emb.filter("vec_id IN (6, 7)")
    # probe = the query's own cell (nprobe=1 equivalent for this
    # fixture: queries sit inside a family)
    probes = assign_cells(q, cent, "vec_id", "embedding").select(
        F.col("vec_id").alias("query_id"), "cent_id"
    )
    candidates = codes.join(probes, on="cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    got = pq_topk_adc(
        q, candidates.select("vec_id", "codes").distinct(), cb, k=3
    ).collect()
    # every returned neighbor lives in the probed cell of its query
    cell_of = {r.vec_id: r.cent_id for r in cells.collect()}
    probe_of = {r.query_id: r.cent_id for r in probes.collect()}
    assert got
    for r in got:
        assert cell_of[r.neighbor_id] == probe_of[r.query_id]


def test_prefix_filtered_df_order_equals_exact(spark, sf_dir):
    """order='df' (canonical PPJoin ascending-document-frequency
    global order) is a pure candidate-selection change — output must
    stay identical to the exact form and to order='hash', on the
    Zipf-derived corpus where the order actually changes which
    shingles land in each prefix."""
    from enclaveid_data_pipeline_spark.functions.zipfmap import (
        zipf_token_arrays,
    )
    from enclaveid_data_pipeline_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )
    from enclaveid_data_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    ztoks = zipf_token_arrays(docs)
    sh = word_shingles(F.col("t"), 3)
    exact = jaccard_similarity_pairs(
        ztoks, id_col="doc_id", shingles=sh, threshold=0.8
    )
    by_df = prefix_filtered_jaccard_pairs(
        ztoks, "doc_id", sh, threshold=0.8, order="df"
    )
    by_hash = prefix_filtered_jaccard_pairs(
        ztoks, "doc_id", sh, threshold=0.8, order="hash"
    )
    want = sorted(map(tuple, exact.collect()))
    assert want  # near-dup structure survives the zipf derivation
    assert sorted(map(tuple, by_df.collect())) == want
    assert sorted(map(tuple, by_hash.collect())) == want


def test_prefix_filtered_rejects_unknown_order():
    import pytest

    from enclaveid_data_pipeline_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    with pytest.raises(ValueError, match="order"):
        prefix_filtered_jaccard_pairs(None, "id", F.col("x"), order="tf")


def test_edit_distance_pairs_equals_bruteforce(spark):
    """PassJoin pigeonhole is LOSSLESS: on adversarial near-dup
    strings (seeded mutations over a tiny alphabet — the worst case
    for gram-based filters) the operator's pair set equals a
    Python-DP brute force over all pairs, exactly."""
    import random

    from enclaveid_data_pipeline_spark.operators.dedup import (
        edit_distance_pairs,
    )

    rng = random.Random(8)
    base = ["".join(rng.choice("abcd ") for _ in range(45)) for _ in range(12)]
    rows = []
    for i in range(80):
        s = list(rng.choice(base))
        for _ in range(rng.randrange(0, 6)):  # 0..5 edits
            op = rng.choice("sid")
            p = rng.randrange(len(s))
            if op == "s":
                s[p] = rng.choice("abcd ")
            elif op == "i":
                s.insert(p, rng.choice("abcd "))
            elif len(s) > 1:
                del s[p]
        rows.append((i, "".join(s)))

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def key(t):
        return (t[:40] + " " * 40)[:40]

    want = sorted(
        (a, b, lev(key(ta), key(tb)))
        for (a, ta) in rows
        for (b, tb) in rows
        if a < b and lev(key(ta), key(tb)) <= 3
    )
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted(
        (r.left_id, r.right_id, r.dist)
        for r in edit_distance_pairs(
            df, "doc_id", F.col("text"), max_dist=3, key_len=40
        ).collect()
    )
    assert got == want and len(want) > 20

    # block_cols restrict pairs to within-block, same exactness
    df2 = df.withColumn("grp", F.col("doc_id") % 2)
    got2 = sorted(
        (r.left_id, r.right_id, r.dist)
        for r in edit_distance_pairs(
            df2, "doc_id", F.col("text"), max_dist=3, key_len=40,
            block_cols=("grp",),
        ).collect()
    )
    assert got2 == [t for t in want if t[0] % 2 == t[1] % 2]

    # degenerate segmentation is a typed error
    import pytest

    with pytest.raises(ValueError, match="equal segments"):
        edit_distance_pairs(df, "doc_id", F.col("text"), max_dist=3,
                            key_len=41)


def test_edit_distance_funnel_counts_consistent(spark):
    """The funnel's counters agree with the pair operator they
    instrument: verified_pairs == |edit_distance_pairs output|, the
    funnel narrows monotonically (join_rows >= candidate_pairs >=
    verified_pairs), and engaging block_cols can only REMOVE join
    volume and candidates — the dial's claim, checked mechanically."""
    import random

    from enclaveid_data_pipeline_spark.operators.dedup import (
        edit_distance_funnel,
        edit_distance_pairs,
    )

    rng = random.Random(12)
    base = ["".join(rng.choice("abc ") for _ in range(45)) for _ in range(8)]
    rows = []
    for i in range(60):
        s = list(rng.choice(base))
        for _ in range(rng.randrange(0, 5)):
            s[rng.randrange(len(s))] = rng.choice("abc ")
        rows.append((i, "".join(s), f"g{i % 3}"))
    df = spark.createDataFrame(rows, "doc_id int, text string, grp string")

    exact = edit_distance_funnel(
        df, "doc_id", F.col("text"), max_dist=3, key_len=40
    ).first()
    blocked = edit_distance_funnel(
        df, "doc_id", F.col("text"), max_dist=3, key_len=40,
        block_cols=("grp",), method="blocked",
    ).first()
    n_pairs = edit_distance_pairs(
        df, "doc_id", F.col("text"), max_dist=3, key_len=40
    ).count()

    assert exact["n_docs"] == 60
    assert exact["verified_pairs"] == n_pairs > 0
    assert (
        exact["join_rows"]
        >= exact["candidate_pairs"]
        >= exact["verified_pairs"]
    )
    assert exact["max_key_product"] >= 1
    # the dial only removes volume, never adds
    assert blocked["join_rows"] <= exact["join_rows"]
    assert blocked["candidate_pairs"] <= exact["candidate_pairs"]
    assert blocked["verified_pairs"] <= exact["verified_pairs"]
    assert blocked["max_key_product"] <= exact["max_key_product"]


def test_misra_gries_emissions_bounded_and_superset(spark):
    """The extracted MG candidate stage honors its two contracts:
    every partition emits at most k rows (bounded shuffle side — the
    occupancy counter the decade bench records), and the distinct
    union retains every true phi-heavy item (the losslessness theorem
    heavy_hitters_exact builds on)."""
    from enclaveid_data_pipeline_spark.operators.sketch import (
        misra_gries_emissions,
    )

    k = 5
    # one genuinely heavy item spread across partitions + long tail
    vals = ["hot"] * 400 + [f"tail{i}" for i in range(300)]
    items = (
        spark.createDataFrame([(v,) for v in vals], "item string")
        .repartition(8)
    )
    em = misra_gries_emissions(items, "item", k)
    per_part = em.withColumn(
        "p", F.spark_partition_id()
    ).groupBy("p").count().agg(F.max("count")).first()[0]
    assert per_part <= k
    assert "hot" in {r["item"] for r in em.distinct().collect()}


def test_heavy_hitters_exact_equals_groupby_truth(spark):
    """Misra-Gries two-pass is EXACT: adversarial spread (the heavy
    item diluted evenly across many partitions, decoys dominating
    each partition locally) still yields exactly the GROUP BY/HAVING
    truth — the MG retention + pigeonhole theorems, not luck."""
    import pytest

    from enclaveid_data_pipeline_spark.operators.sketch import (
        heavy_hitters_exact,
    )

    # 10k rows: 'hot' = 12% (never a local majority anywhere after
    # round-robin), 'warm' = 5.2%, vocabulary of 2000 cold decoys
    rows = (
        [("hot",)] * 1200
        + [("warm",)] * 520
        + [(f"cold{i % 2000}",) for i in range(8280)]
    )
    df = spark.createDataFrame(rows, "tok string").repartition(32)
    got = {
        r.item: (r.cnt, r.share)
        for r in heavy_hitters_exact(
            df, F.col("tok"), phi=0.05, item_name="item"
        ).collect()
    }
    assert got == {
        "hot": (1200, 0.12),
        "warm": (520, 0.052),
    }
    # boundary exactness: share == phi must NOT pass (strict >),
    # compared in integer arithmetic
    df2 = spark.createDataFrame(
        [("a",)] * 50 + [(f"c{i}",) for i in range(950)], "tok string"
    ).repartition(8)
    got2 = heavy_hitters_exact(df2, F.col("tok"), phi=0.05).collect()
    assert got2 == []  # 50/1000 == phi exactly → excluded

    with pytest.raises(ValueError, match="phi"):
        heavy_hitters_exact(df, F.col("tok"), phi=1.5)


def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe LSH must recover at least the single-bucket
    result set's recall vs exact truth (its probe set is a strict
    superset of the home bucket), and strictly more candidates."""
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.operators.knn import (
        brute_force_topk,
        lsh_bucketed_topk,
        lsh_multiprobe_topk,
    )
    from enclaveid_data_pipeline_spark.sources.readers import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)

    def pairs(df):
        return {
            (r["query_id"], r["neighbor_id"])
            for r in df.select("query_id", "neighbor_id").collect()
        }

    truth = pairs(brute_force_topk(queries, emb, k=5))
    single = pairs(
        lsh_bucketed_topk(queries, emb, k=5, planes=4, dims=64)
    )
    multi = pairs(
        lsh_multiprobe_topk(queries, emb, k=5, planes=4, probes=2, dims=64)
    )
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi >= r_single
    # probing 3 of 16 buckets must surface new top-5 members for at
    # least some query on this corpus
    assert multi != single


def test_bm25_topk_matches_hand_computation(spark):
    """BM25 scores equal an independent Python implementation of the
    same fixed-point contract on a tiny corpus, self-retrieval ranks
    the query document first, and rarer terms outweigh stopwords."""
    import math

    from enclaveid_data_pipeline_spark.operators.retrieval import (
        BM25_SCALE,
        bm25_topk,
    )

    corpus = {
        0: "the cat sat on the mat",
        1: "the dog sat on the log",
        2: "quantum chromodynamics lattice gauge theory",
        3: "the cat and the dog",
    }
    rows = [
        (d, t) for d, text in corpus.items() for t in text.split(" ")
    ]
    doc_terms = spark.createDataFrame(rows, "doc_id long, term string")
    query_terms = spark.createDataFrame(
        [(0, t) for t in set(corpus[0].split())]
        + [(2, t) for t in set(corpus[2].split())],
        "query_id long, term string",
    )

    # independent reference with the identical fixed-point contract
    tf = {}
    for d, t in rows:
        tf[(d, t)] = tf.get((d, t), 0) + 1
    dl = {d: len(text.split()) for d, text in corpus.items()}
    N, S = len(corpus), sum(dl.values())
    df = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1

    def score_fx(qid):
        out = {}
        for t in set(corpus[qid].split()):
            idf_fx = round(
                math.log(1 + (N - df[t] + 0.5) / (df[t] + 0.5)) * BM25_SCALE
            )
            for d in corpus:
                if (d, t) not in tf:
                    continue
                f = tf[(d, t)]
                p = 44 * f * S
                q = 20 * f * S + 6 * S + 18 * dl[d] * N
                out[d] = out.get(d, 0) + round(idf_fx * p / q)
        return out

    got = bm25_topk(doc_terms, query_terms, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid in (0, 2):
        want = score_fx(qid)
        ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
        got_rows = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in got_rows] == [
            d for d, _ in ranked
        ]
        for r in got_rows:
            assert r["score"] == round(want[r["neighbor_id"]] / BM25_SCALE, 4)
    # self-retrieval first; the rare-term query never surfaces
    # stopword-only docs
    assert by_q[0][0]["neighbor_id"] == 0 or sorted(
        r["rank"] for r in by_q[0]
    )[0] == 1
    assert {r["neighbor_id"] for r in by_q[2]} == {2}


def test_bm25_topk_prebuilt_tf_equivalent(spark):
    # the shared-index path (queries.text_queries._doc_tf_shared):
    # bm25_topk given a pre-aggregated (doc_id, term, tf) table must
    # reproduce the occurrence-derived index build exactly
    from enclaveid_data_pipeline_spark.operators.retrieval import bm25_topk

    corpus = {
        0: "the cat sat on the mat",
        1: "the dog sat on the log",
        2: "quantum chromodynamics lattice gauge theory",
        3: "the cat and the dog",
    }
    rows = [(d, t) for d, text in corpus.items() for t in text.split(" ")]
    doc_terms = spark.createDataFrame(rows, "doc_id long, term string")
    query_terms = spark.createDataFrame(
        [(0, t) for t in set(corpus[0].split())]
        + [(2, t) for t in set(corpus[2].split())],
        "query_id long, term string",
    )
    tf = doc_terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    a = bm25_topk(doc_terms, query_terms, k=4)
    b = bm25_topk(None, query_terms, k=4, tf=tf)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
