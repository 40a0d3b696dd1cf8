"""Distributed generalized suffix array (prefix doubling): must equal
the brute-force sorted-suffixes order — (suffix, doc_id, pos) total
order — on classic strings, duplicated documents, and random corpora,
with the short seeds that force refinement rounds to actually run."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hypermap_etl_spark.operators.suffixarray import suffix_array
from hypermap_etl_spark.util import release_persisted


def _ref(rows):
    suf = sorted((t[i:], d, i + 1) for d, t in rows for i in range(len(t)))
    return {(d, p): i + 1 for i, (_s, d, p) in enumerate(suf)}


def _got(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id"], r["pos"]): r["sa_rank"]
        for r in suffix_array(docs, **kw).collect()
    }
    release_persisted()
    return out


def test_classic_and_duplicate_docs(spark):
    """banana + an exact duplicate doc: identical cross-doc suffixes
    stay tied through every doubling round and must break by
    (doc_id, pos); an empty doc contributes nothing; seed_chars=2
    forces ~log2(maxlen) refinement rounds."""
    rows = [(1, "banana"), (2, "ana"), (3, "abcabc"), (4, "x"), (5, "banana")]
    assert _got(spark, rows, seed_chars=2) == _ref(rows)
    with_empty = rows + [(6, "")]
    docs = spark.createDataFrame(with_empty, "doc_id long, text string")
    out = suffix_array(docs, seed_chars=4)
    assert out.filter("doc_id = 6").count() == 0
    release_persisted()


def test_prefix_suffix_ordering(spark):
    """A suffix that is a proper prefix of another ranks first —
    the shorter-first rule the past-end sentinel implements."""
    rows = [(1, "aaaa"), (2, "aaaaaa")]
    got = _got(spark, rows, seed_chars=2)
    assert got == _ref(rows)
    # shortest suffix "a" of doc 1 at pos 4 ranks before doc 2's "aa"
    assert got[(1, 4)] < got[(2, 5)]


def test_random_low_alphabet_corpora(spark):
    """Property: random 'ab' corpora (dense accidental repeats, mixed
    lengths) match the brute-force reference exactly across seeds."""
    rnd = random.Random(3)
    for trial, seed_chars in ((0, 4), (1, 8)):
        rows = [
            (i, "".join(rnd.choice("ab") for _ in range(rnd.randint(1, 60))))
            for i in range(12)
        ]
        got = _got(spark, rows, seed_chars=seed_chars)
        assert got == _ref(rows), trial


def test_fixture_subset_matches_reference(spark):
    """Real fixture text (natural-language-ish, duplicated docs): the
    full (suffix, doc_id, pos) order must reproduce, and ranks must be
    a permutation of 1..n."""
    from hypermap_etl_spark.sources.tables import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 50 == 0)
    )
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got = {
        (r["doc_id"], r["pos"]): r["sa_rank"]
        for r in suffix_array(docs).collect()
    }
    release_persisted()
    assert got == _ref(rows)
    assert sorted(got.values()) == list(range(1, len(got) + 1))
