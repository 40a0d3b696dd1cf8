"""Unigram language-model tokenizer training — the SentencePiece-style
subword vocabulary (Kudo 2018, "Subword Regularization: Improving
Neural Network Translation Models with Multiple Subword Candidates"),
the second of the two standard tokenizer trainings next to
:mod:`bpe`.

Scale split, identical to bpe_train / similarity.pca_fit: the
DATA-sized work is the one distributed aggregate that collapses the
corpus to its capped distinct-word frequency table
(:func:`bpe.word_frequencies` — every real trainer iterates the word
dictionary, not the corpus), and the MODEL-sized work (seed substring
mining + EM + pruning over that compact dictionary) runs on the
driver. The driver sees at most ``max_words`` (word, count) pairs.

Algorithm (faithful shape, one documented simplification):

  seed    every substring occurrence of every dictionary word up to
          ``max_piece_len`` chars, weighted by word frequency, scored
          count x piece-length; top ``seed_size`` kept, single chars
          always retained (coverage guarantee). This is the standard
          frequent-substring seeding; certified against an independent
          SQL oracle (doc_unigram_seed).
  EM      per word, forward-backward over the character lattice under
          current piece log-probs -> expected piece counts; M-step
          renormalizes. Corpus likelihood is non-decreasing (pinned in
          tests).
  prune   drop the lowest-expected-count pieces (never single chars)
          in geometric rounds until ``vocab_size`` remains, re-running
          EM between rounds. (Kudo prunes by exact loss-delta; the
          expected-count criterion is the common simplification — it
          ranks by the same dominant term. Documented, not hidden.)
  encode  Viterbi best segmentation per word, Arrow-batched with a
          per-worker memo (the bpe_segment shape).

Determinism: dictionary words are processed in sorted order, pieces
ranked with total tie-breaks (score desc, piece asc), all float work
is driver-side Python over the model — reproducible across runs,
partitionings, and engines.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.bpe import word_frequencies

_UNK_PENALTY = -20.0  # log-prob for a character absent from the vocab


def seed_pieces(
    wf: dict[str, int], max_piece_len: int = 6, seed_size: int = 2000
) -> dict[str, int]:
    """Frequent-substring seed vocabulary over a word-frequency dict:
    every substring occurrence (all start positions) up to
    ``max_piece_len`` chars, weighted by word frequency. Returns
    piece -> total weighted count; the top ``seed_size`` by
    (count x len desc, piece asc), with every single character kept
    unconditionally."""
    counts: dict[str, int] = {}
    for w in sorted(wf):
        c = wf[w]
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + c
    singles = {p: n for p, n in counts.items() if len(p) == 1}
    multi = [(p, n) for p, n in counts.items() if len(p) > 1]
    multi.sort(key=lambda kv: (-kv[1] * len(kv[0]), kv[0]))
    kept = dict(singles)
    for p, n in multi:
        if len(kept) >= max(seed_size, len(singles)):
            break
        kept[p] = n
    return kept


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Expected piece counts for one word under the current model and
    the word's log-evidence (log sum over all segmentations)."""
    n = len(word)
    NEG = float("-inf")
    fwd = [NEG] * (n + 1)
    fwd[0] = 0.0
    for j in range(1, n + 1):
        acc = NEG
        for i in range(max(0, j - max_len), j):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None or fwd[i] == NEG:
                continue
            x = fwd[i] + lp
            acc = x if acc == NEG else (max(acc, x) + math.log1p(math.exp(-abs(acc - x))))
        fwd[j] = acc
    if fwd[n] == NEG:
        return {}, NEG
    bwd = [NEG] * (n + 1)
    bwd[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None or bwd[j] == NEG:
                continue
            x = lp + bwd[j]
            acc = x if acc == NEG else (max(acc, x) + math.log1p(math.exp(-abs(acc - x))))
        bwd[i] = acc
    z = fwd[n]
    exp: dict[str, float] = {}
    for i in range(n):
        if fwd[i] == NEG:
            continue
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None or bwd[j] == NEG:
                continue
            gamma = math.exp(fwd[i] + lp + bwd[j] - z)
            exp[p] = exp.get(p, 0.0) + gamma
    return exp, z


def _em_round(
    wf: dict[str, int], logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """One EM pass over the dictionary: (expected counts, corpus LL)."""
    total_exp: dict[str, float] = {}
    ll = 0.0
    for w in sorted(wf):
        c = wf[w]
        exp, z = _forward_backward(w, logp, max_len)
        if z == float("-inf"):
            continue
        ll += c * z
        for p, e in exp.items():
            total_exp[p] = total_exp.get(p, 0.0) + c * e
    return total_exp, ll


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    tot = sum(counts.values())
    return {p: math.log(n / tot) for p, n in counts.items() if n > 0}


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 400,
    seed_size: int = 2000,
    max_piece_len: int = 6,
    n_em_iters: int = 2,
    shrink: float = 0.75,
    text_col: str = "text",
    max_words: int | None = 1_000_000,
) -> tuple[dict[str, float], DataFrame]:
    """Train a unigram-LM piece vocabulary over the corpus.

    Returns (pieces, pieces_df): ``pieces`` maps piece -> log-prob;
    ``pieces_df`` is the same as (piece, logprob) rows for relational
    consumers. Single characters are never pruned, so every word stays
    segmentable.
    """
    wf = {
        r["word"]: r["n"]
        for r in word_frequencies(docs, text_col, max_words).collect()
    }
    if not wf:
        raise ValueError("unigram_train: empty corpus")
    seeds = seed_pieces(wf, max_piece_len, seed_size)
    logp = _normalize({p: float(n) for p, n in seeds.items()})

    while True:
        for _ in range(n_em_iters):
            exp, _ll = _em_round(wf, logp, max_piece_len)
            # single-char floor: a char can fall out of every lattice
            # path's expectation yet must stay encodable
            for p in list(logp):
                if len(p) == 1 and exp.get(p, 0.0) <= 0.0:
                    exp[p] = 1e-9
            logp = _normalize(exp)
        if len(logp) <= vocab_size:
            break
        keep_n = max(vocab_size, int(len(logp) * shrink))
        multi = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        singles = {p: lp for p, lp in logp.items() if len(p) == 1}
        budget = max(keep_n - len(singles), 0)
        kept = dict(singles)
        kept.update(dict(multi[:budget]))
        logp = _normalize({p: math.exp(lp) for p, lp in kept.items()})
        if len(kept) == len(singles):
            break

    spark = docs.sparkSession
    rows = sorted(logp.items())
    pieces_df = spark.createDataFrame(rows, "piece string, logprob double")
    return logp, pieces_df


def unigram_segment(
    docs: DataFrame,
    pieces: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Viterbi best-path segmentation per word: (id, tokens
    array<string>, n_pieces). The piece table is broadcast in the UDF
    closure (model-sized); encoding is Arrow-batched with a per-worker
    word memo — one corpus pass, no shuffle. Characters outside the
    vocabulary segment as themselves at a fixed penalty."""
    from pyspark.sql.functions import pandas_udf

    max_len = max((len(p) for p in pieces), default=1)

    def encode_word(w: str) -> list[str]:
        n = len(w)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: list[tuple[int, str] | None] = [None] * (n + 1)
        best[0] = 0.0
        for j in range(1, n + 1):
            for i in range(max(0, j - max_len), j):
                p = w[i:j]
                lp = pieces.get(p)
                if lp is None and j - i == 1:
                    lp = _UNK_PENALTY
                if lp is None or best[i] == NEG:
                    continue
                x = best[i] + lp
                if x > best[j]:
                    best[j] = x
                    back[j] = (i, p)
        out: list[str] = []
        j = n
        while j > 0:
            i, p = back[j]  # type: ignore[misc]
            out.append(p)
            j = i
        return out[::-1]

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
    ).withColumn("n_pieces", F.size("tokens").cast("long"))
