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


def _ref_lcp(rows, cap=256):
    suf = sorted((t[i:], d, i + 1) for d, t in rows for i in range(len(t)))
    out = {}
    for r in range(1, len(suf)):
        a, b = suf[r - 1][0], suf[r][0]
        n = 0
        for x, y in zip(a[:cap], b[:cap]):
            if x != y:
                break
            n += 1
        out[r + 1] = n  # 1-indexed rank of the later suffix
    return out


def test_lcp_rank_adjacent_matches_reference(spark):
    from hypermap_etl_spark.operators.suffixarray import (
        lcp_rank_adjacent,
        suffix_array,
    )

    rows = [(1, "banana"), (2, "bandana"), (3, "anab")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sa = suffix_array(docs, seed_chars=2)
    got = {
        r["rank"]: r["lcp"]
        for r in lcp_rank_adjacent(sa, docs, max_lcp=16).collect()
    }
    release_persisted()
    assert got == _ref_lcp(rows, cap=16)


def test_sa_lcp_duplicated_windows_agree_with_dup_char_spans(spark):
    """Internal consistency of the two ExactSubstr halves: positions
    whose suffix shares an LCP >= L with either SA neighbor are exactly
    the duplicated L-char-window starts — merged into maximal islands
    they must reproduce dup_char_spans byte-for-byte."""
    from hypermap_etl_spark.operators import dedup
    from hypermap_etl_spark.operators.suffixarray import (
        lcp_rank_adjacent,
        suffix_array,
    )

    L = 12
    rows = [
        (1, "the same long boilerplate sentence here plus tail one"),
        (2, "intro two the same long boilerplate sentence here"),
        (3, "completely unrelated content in this document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sa = suffix_array(docs, seed_chars=4)
    lcp = lcp_rank_adjacent(sa, docs, max_lcp=64).collect()
    release_persisted()

    # dup window-start positions: LCP >= L with predecessor marks BOTH
    # members of the adjacent pair; (id,pos) per rank from the SA
    by_rank = {r["rank"]: r for r in lcp}
    sa_rows = {
        r["sa_rank"]: (r["doc_id"], r["pos"])
        for r in suffix_array(docs, seed_chars=4).collect()
    }
    release_persisted()
    dup_pos = set()
    for r in range(2, len(sa_rows) + 1):
        row = by_rank.get(r)
        if row and row["lcp"] >= L:
            dup_pos.add(sa_rows[r])
            dup_pos.add(sa_rows[r - 1])
    # (no doc-end filter needed: lcp >= L implies both suffixes are at
    # least L chars, so every marked start hosts a full L-window)

    # island-merge (gap <= L-1) per doc -> spans
    spans = set()
    by_doc = {}
    for d, p in dup_pos:
        by_doc.setdefault(d, []).append(p)
    for d, ps in by_doc.items():
        ps.sort()
        lo = hi = ps[0]
        for p in ps[1:]:
            if p - hi <= L - 1:
                hi = p
            else:
                spans.add((d, lo, hi + L - 1))
                lo = hi = p
        spans.add((d, lo, hi + L - 1))

    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.dup_char_spans(docs, min_len=L).collect()
    }
    release_persisted()
    assert spans == got and got, (spans, got)


def test_suffix_array_more_partitions_than_rows(spark):
    """n_parts far above the row count (range partitioner emits fewer,
    possibly empty partitions) must not corrupt offsets or ranks."""
    rows = [(1, "abcab"), (2, "cabx")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pos"]): r["sa_rank"]
        for r in suffix_array(docs, n_parts=64, seed_chars=2).collect()
    }
    release_persisted()
    assert got == _ref(rows)
