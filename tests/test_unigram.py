"""Unigram-LM subword tokenizer (operators/unigram.py): Viterbi
exactness vs brute-force enumeration, vocab closure, EM/pruning
invariants, corpus encode join."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.unigram import (
    distinct_words,
    encode_tokens,
    ensure_single_chars,
    em_piece_counts,
    prune_vocab,
    seed_piece_counts,
    costs_from_counts,
    train_unigram,
    viterbi_segment,
    viterbi_segment_word,
)


def _enumerate_best(word: str, costs: dict[str, int], max_len: int):
    """Brute force: every segmentation into known pieces ≤ max_len,
    minimized by (total cost, n_pieces, then latest-boundaries-first
    — the 'prefer longer final piece at each boundary' order, which
    equals comparing the reversed boundary positions ascending)."""
    n = len(word)
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        pieces = [word[a:b] for a, b in zip(bounds, bounds[1:])]
        if any(len(p) > max_len or p not in costs for p in pieces):
            continue
        total = sum(costs[p] for p in pieces)
        # tie order: cost, k, then prev-boundary preference applied
        # right-to-left (DP picks the smaller prev position at every
        # suffix decision) == ascending reversed-bounds comparison
        key = (total, len(pieces), tuple(reversed(bounds[:-1])))
        if best is None or key < best[0]:
            best = (key, pieces)
    return best


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abc", min_size=1, max_size=8),
    st.dictionaries(
        st.text(alphabet="abc", min_size=2, max_size=4),
        st.integers(0, 5000),
        max_size=8,
    ),
)
def test_viterbi_matches_bruteforce(word, extra):
    costs = {c: 3000 for c in "abc"}
    costs.update(extra)
    got_cost, got_pieces = viterbi_segment_word(word, costs, 4)
    (exp_key, exp_pieces) = _enumerate_best(word, costs, 4)
    assert got_cost == exp_key[0]
    assert got_pieces == exp_pieces
    assert "".join(got_pieces) == word


def test_viterbi_missing_char_raises():
    try:
        viterbi_segment_word("ax", {"a": 1}, 4)
    except KeyError as e:
        assert "x" in str(e)
    else:
        raise AssertionError("expected KeyError")


def test_seed_closure_and_training(spark):
    rows = [("hello",), ("hello",), ("help",), ("world",), ("word",)]
    df = spark.createDataFrame(rows, "tok string")
    words = distinct_words(df, "tok")
    counts = seed_piece_counts(words, 4, 2)
    # every single character of every word survives the threshold
    chars = {c for (w,) in rows for c in w}
    kept = {
        r["piece"]
        for r in counts.filter(F.length("piece") == 1).collect()
    }
    assert chars <= kept

    costs = costs_from_counts(counts)
    seg = viterbi_segment(words, costs)
    segs = {r["word"]: list(r["pieces"]) for r in seg.collect()}
    assert all("".join(p) == w for w, p in segs.items())
    # shared stems compress: 'hell'/'hel' style multi-char pieces used
    assert any(len(p) > 1 for ps in segs.values() for p in ps)

    # EM statistics stay closed after ensure_single_chars
    counts2 = ensure_single_chars(em_piece_counts(seg), words)
    kept2 = {
        r["piece"]
        for r in counts2.filter(F.length("piece") == 1).collect()
    }
    assert chars <= kept2

    pruned = prune_vocab(counts2, vocab_target=2)
    kept3 = {r["piece"] for r in pruned.collect()}
    assert chars <= kept3
    assert len([p for p in kept3 if len(p) > 1]) <= 2


def test_encode_tokens_joins_every_row(spark):
    df = spark.createDataFrame(
        [("hello",), ("world",), ("hello",)], "tok string"
    )
    vocab = train_unigram(df, "tok", rounds=1, vocab_target=8)
    enc = encode_tokens(df, "tok", vocab)
    rows = enc.collect()
    assert len(rows) == 3
    assert all(r["pieces"] is not None and r["enc_cost"] is not None for r in rows)
    both = {r["tok"]: r["n_pieces"] for r in rows}
    assert set(both) == {"hello", "world"}
