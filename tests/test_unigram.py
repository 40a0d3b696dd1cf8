"""Unigram-LM tokenizer (operators/unigram.py): seed counts, EM
likelihood monotonicity, pruning invariants, Viterbi segmentation."""

from __future__ import annotations

import math

import pytest

from hypermap_etl_spark.operators import unigram


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_seed_pieces_counts_and_singles():
    seeds = unigram.seed_pieces({"abab": 2, "ba": 1}, max_piece_len=3,
                                seed_size=8)
    # "ab" occurs twice in abab (weight 2 each) -> 4
    assert seeds["ab"] == 4
    # "ba" once inside abab (x2) + the word itself (x1) -> 3
    assert seeds["ba"] == 3
    # singles always kept, regardless of the seed_size budget
    assert "a" in seeds and "b" in seeds
    assert seeds["a"] == 2 * 2 + 1 and seeds["b"] == 2 * 2 + 1


def test_em_likelihood_non_decreasing():
    wf = {"abcabc": 5, "abc": 3, "xya": 2}
    seeds = unigram.seed_pieces(wf, max_piece_len=4, seed_size=50)
    logp = unigram._normalize({p: float(n) for p, n in seeds.items()})
    lls = []
    for _ in range(4):
        exp, ll = unigram._em_round(wf, logp, 4)
        lls.append(ll)
        logp = unigram._normalize(exp)
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:])), lls


def test_train_planted_piece_and_invariants(spark):
    docs = _docs(spark, ["abcabc abcabc abc", "abc abcabc zq"] * 10)
    pieces, pieces_df = unigram.unigram_train(
        docs, vocab_size=12, seed_size=40, max_piece_len=4, n_em_iters=2
    )
    # normalized distribution
    assert math.isclose(sum(math.exp(lp) for lp in pieces.values()), 1.0,
                        rel_tol=1e-9)
    # every character of the corpus stays encodable
    for ch in "abczq":
        assert ch in pieces
    # the planted repeated piece survives pruning with high mass
    assert "abc" in pieces
    assert pieces["abc"] > pieces["z"]
    assert len(pieces) <= 12 or all(len(p) == 1 for p in pieces)
    assert pieces_df.count() == len(pieces)


def test_segment_roundtrip_and_unknowns(spark):
    docs = _docs(spark, ["abcabc abc", "abc??? zq"])
    pieces, _ = unigram.unigram_train(
        docs.filter("doc_id = 0"), vocab_size=10, seed_size=30,
        max_piece_len=4,
    )
    seg = unigram.unigram_segment(docs, pieces)
    rows = {r["doc_id"]: r for r in seg.collect()}
    # tokens concatenate back to the words, including unknown chars
    assert "".join(rows[0]["tokens"]) == "abcabcabc"
    assert "".join(rows[1]["tokens"]) == "abc???zq"
    assert rows[0]["n_pieces"] == len(rows[0]["tokens"])
    # partition-count invariance of the encoding
    a = sorted(tuple(r) for r in seg.collect())
    b = sorted(
        tuple(r)
        for r in unigram.unigram_segment(docs.repartition(8), pieces).collect()
    )
    assert a == b


def test_empty_corpus_raises(spark):
    with pytest.raises(ValueError, match="empty corpus"):
        unigram.unigram_train(_docs(spark, [""]))
