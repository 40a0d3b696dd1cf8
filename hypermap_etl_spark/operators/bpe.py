"""Byte-pair-encoding merge training — the tokenizer-training step of a
training-data pipeline (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units").

Scale split, the same shape as similarity.pca_fit: the DATA-sized work
is one distributed aggregate (collapse the corpus to its distinct-word
frequency table — the standard BPE preprocessing; every real BPE
trainer iterates over the word dictionary, not the corpus), and the
MODEL-sized work (the merge loop over that compact dictionary) runs on
the driver. The driver never sees corpus rows: it sees at most
``max_words`` (word, count) pairs, pulled with a TakeOrdered top-k by
frequency so a 100 TB corpus with an unbounded long tail still ships a
bounded dictionary.

Determinism: words are lowercased space-tokens; symbols start as
characters plus a word-end marker; each round merges the pair with the
highest total count, ties broken by lexicographically smallest pair —
reproducible across runs, partitionings, and engines, which is what
lets the first merge be certified against an independent SQL oracle
(doc_bpe_first_merge) and the full loop against a pure-Python
reference in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_words: int | None = 1_000_000
) -> DataFrame:
    """Distinct-word frequency table, capped at the ``max_words`` most
    frequent words (count desc, word asc — a TakeOrdered top-k, so the
    driver-bound dictionary is bounded regardless of corpus size).
    ``max_words=None`` disables the cap (and skips the sort — the
    merge loop's dictionary is order-independent)."""
    wf = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_words is None:
        return wf
    return wf.orderBy(F.desc("n"), F.asc("word")).limit(max_words)


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
    max_words: int | None = 1_000_000,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges over the corpus.

    Returns (merges, merges_df): ``merges`` is the ordered list of
    (left, right, pair_count) actually applied (stops early when no
    pair reaches ``min_pair_count``); ``merges_df`` is the same as a
    DataFrame (rank, left, right, merged, pair_count) for relational
    consumers. Each word contributes its corpus frequency to every
    adjacent symbol pair, the classic dictionary-weighted count.
    """
    wf = {
        r["word"]: r["n"]
        for r in word_frequencies(docs, text_col, max_words).collect()
    }
    vocab: dict[tuple, int] = {}
    for w, c in wf.items():
        vocab[tuple(w) + (END,)] = vocab.get(tuple(w) + (END,), 0) + c

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        new_vocab: dict[tuple, int] = {}
        for sym, c in vocab.items():
            m = _merge_word(sym, (a, b))
            new_vocab[m] = new_vocab.get(m, 0) + c
        vocab = new_vocab

    spark = docs.sparkSession
    rows = [
        (i + 1, a, b, a + b, int(cnt)) for i, (a, b, cnt) in enumerate(merges)
    ]
    merges_df = spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count bigint"
    )
    return merges, merges_df


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply trained merges to segment each document: (id, tokens
    array<string>, n_bpe_tokens). The merge list is broadcast in a
    Pandas UDF closure (model-sized); segmentation is Arrow-batched,
    one pass over the corpus, embarrassingly parallel."""
    from pyspark.sql.functions import pandas_udf

    ranks = {(a, b): i for i, (a, b, _c) in enumerate(merges)}

    def encode_word(w: str) -> list[str]:
        sym = list(w) + [END]
        while len(sym) > 1:
            cand = [
                (ranks[(x, y)], i)
                for i, (x, y) in enumerate(zip(sym, sym[1:]))
                if (x, y) in ranks
            ]
            if not cand:
                break
            _, i = min(cand)
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        return sym

    # closure-level memo: rehydrated once per Python worker, so repeated
    # words (Zipf head — most of any batch) encode once per worker
    # lifetime, not once per Arrow batch
    cache: dict[str, list[str]] = {}

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split(" "):
                if not w:
                    continue
                if w not in cache:
                    cache[w] = encode_word(w)
                toks.extend(cache[w])
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        id_col,
        seg(F.col(text_col)).alias("tokens"),
    ).withColumn("n_bpe_tokens", F.size("tokens").cast("long"))
