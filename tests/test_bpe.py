"""BPE merge training: the distributed word-frequency + driver merge
loop must reproduce a pure-Python reference BPE (Sennrich-style, same
tie-break) exactly, and segmentation must apply merges in rank order."""

from __future__ import annotations

from hypermap_etl_spark.operators import bpe


def _ref_bpe(word_counts: dict[str, int], n_merges: int, min_pair_count: int = 2):
    vocab: dict[tuple, int] = {}
    for w, c in word_counts.items():
        key = tuple(w) + (bpe.END,)
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        new_vocab: dict[tuple, int] = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == (a, b):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def _word_counts(rows):
    counts: dict[str, int] = {}
    for _id, t in rows:
        for w in t.lower().split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def test_bpe_train_matches_reference(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the bat and the cat chat"),
        (3, "that hat is the cat hat"),
        (4, "mats and hats and bats"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got, mdf = bpe.bpe_train(docs, n_merges=25, min_pair_count=2)
    ref = _ref_bpe(_word_counts(rows), 25, 2)
    assert got == ref and got, got
    # the DataFrame mirror carries the same ordered merges
    out = [(r["left"], r["right"], r["pair_count"]) for r in mdf.orderBy("rank").collect()]
    assert out == ref


def test_bpe_train_fixture_corpus_matches_reference(spark):
    from hypermap_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got, _ = bpe.bpe_train(docs, n_merges=10, min_pair_count=2)
    assert got == _ref_bpe(_word_counts(rows), 10, 2)


def test_bpe_segment_applies_merges_in_rank_order(spark):
    rows = [(1, "the cat"), (2, "theta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges, _ = bpe.bpe_train(docs, n_merges=30, min_pair_count=1)
    seg = {
        r["doc_id"]: (list(r["tokens"]), r["n_bpe_tokens"])
        for r in bpe.bpe_segment(docs, merges).collect()
    }
    # fully merged training words collapse to whole-word tokens
    toks1, n1 = seg[1]
    assert "".join(toks1) == "the" + bpe.END + "cat" + bpe.END
    assert n1 == len(toks1)
    # with no merges, every char + end marker survives
    seg0 = bpe.bpe_segment(docs, []).collect()
    for r in seg0:
        text = dict(rows)[r["doc_id"]]
        expect = sum(len(w) + 1 for w in text.split(" ") if w)
        assert r["n_bpe_tokens"] == expect


def test_word_frequencies_cap_is_top_k(spark):
    rows = [(1, "a a a b b c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top2 = {
        r["word"]: r["n"]
        for r in bpe.word_frequencies(docs, max_words=2).collect()
    }
    assert top2 == {"a": 3, "b": 2}


def test_tokenizer_fertility_readout(spark, tmp_path):
    """Fertility = BPE tokens per word: a language the merge list was
    trained for segments coarser (lower fertility) than one it
    shreds char-by-char."""
    import os
    import shutil

    from hypermap_etl_spark.plans.doc_queries import doc_tokenizer_fertility

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    # 'table scan' words hit the merge list; 'xyzq' style words do not
    rows = [
        (1, "en", "table table scan", "w", 16),
        (2, "en", "table scan scan", "w", 15),
        (3, "xx", "xyzq wvut xyzq", "w", 14),
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r["lang"]: r for r in doc_tokenizer_fertility(spark, sf).collect()}
    shutil.rmtree(sf)
    assert out["en"]["n_docs"] == 2 and out["xx"]["n_docs"] == 1
    # merged words compress: en fertility well under the char-split xx
    assert out["en"]["fertility"] < out["xx"]["fertility"]
    # chars_per_token is the reciprocal view: en packs more chars/token
    assert out["en"]["chars_per_token"] > out["xx"]["chars_per_token"]
    assert out["en"]["n_words"] == 6
