"""Text analysis operators for training-data pipelines (north-star set).

All pure built-in column expressions (split/transform/aggregate/filter
HOFs, regexp, md5) — JVM-side, whole-stage codegen, zero Python on the
hot path. Each op is deterministic and engine-replicable so the DuckDB
oracle can verify it bit-for-bit:

  token counting      whitespace + regex tokenizations
  quality scoring     length/punct/stopword/word-length signals
  language ID         marker-word counting via replace-length trick
                      (identical semantics in any SQL engine; no regex
                      dialect dependence)
  fingerprinting      md5 full-text + min-md5 over word shingles
                      (winnowing-style document signature)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]

# marker words per language for the n-gram/stopword language heuristic;
# counted with the replace-length trick so Spark and any oracle engine
# agree exactly. Tie-break = the CASE order below (en first).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is "],
    "de": [" der ", " und ", " die ", " das "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " los ", " que ", " y "],
    "zh": ["的", "是", "了"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def words(text: Column) -> Column:
    """Whitespace tokenization on the single-space separator (identical to
    SQL string_split semantics, empty tokens preserved)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count of the LOWERED text, empty tokens
    dropped — THE corpus token-weight convention (shard weights, epoch
    plans, gate oracles all use `len(list_filter(string_split(lower(t),
    ' '), x -> x <> ''))`); change it here and everywhere agrees."""
    return F.size(F.filter(words(F.lower(text)), lambda w: w != F.lit("")))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles; empty array when fewer than n words.

    Built as zip_with over n shifted slices — O(words) per row. The
    naive transform(sequence, i -> array_join(slice(ws, i, n))) form
    re-slices the array per shingle: O(words²) in an interpreted
    higher-order lambda, measured 3-5x slower end-to-end on every
    shingle consumer (MinHash, n-gram Jaccard, SimHash, fingerprints).
    The guard also protects against slice's negative-length error on
    short docs (only the selected CASE branch evaluates).
    """
    ws = words(text)
    length = F.size(ws) - (n - 1)
    acc = F.slice(ws, 1, length)
    for j in range(1, n):
        acc = F.zip_with(
            acc, F.slice(ws, 1 + j, length), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(F.size(ws) >= n, acc).otherwise(F.array().cast("array<string>"))


def count_occurrences(text: Column, marker: str) -> Column:
    """Non-overlapping occurrence count of a literal marker:
    (len(t) - len(replace(t, m, ''))) / len(m). Deterministic and
    regex-free; identical in Spark and DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts (whitespace + BPE-ish regex), char count, word lengths."""
    t = F.lower(F.col(text_col))
    ws = F.filter(words(t), lambda w: w != F.lit(""))
    regex_tokens = F.regexp_extract_all(t, F.lit(r"[a-z]+|[0-9]|[^a-z0-9 ]"), 0)
    return docs.select(
        "doc_id",
        F.length(F.col(text_col)).cast("long").alias("n_chars_measured"),
        F.size(ws).cast("long").alias("n_tokens_ws"),
        F.size(regex_tokens).cast("long").alias("n_tokens_re"),
        F.round(
            F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
            / F.greatest(F.size(ws), F.lit(1)),
            6,
        ).alias("avg_word_len"),
    )


def quality_expressions(text_col: str = "text") -> dict[str, Column]:
    """quality_scores' output columns as bare expressions — shared by
    quality_scores and corpus.train_filter (r11), so the filter can
    evaluate them in the SAME projection as the language pick instead
    of joining two scans of the corpus. ONE definition: the rounds
    here are the gate contract."""
    t = F.lower(F.col(text_col))
    ws = F.filter(words(t), lambda w: w != F.lit(""))
    n_words = F.size(ws)
    n_stop = F.size(F.filter(ws, lambda w: w.isin(STOPWORDS)))
    n_punct = F.length(F.regexp_replace(t, r"[a-z0-9 ]", ""))
    word_ratio = n_stop / F.greatest(n_words, F.lit(1))
    punct_ratio = n_punct / F.greatest(F.length(t), F.lit(1))
    len_signal = F.least(n_words / F.lit(100.0), F.lit(1.0))
    return {
        "n_words": n_words.cast("long"),
        "stopword_ratio": F.round(word_ratio, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "quality_score": F.round(
            F.lit(0.4) * len_signal + F.lit(0.4) * word_ratio + F.lit(0.2) * (F.lit(1.0) - punct_ratio),
            6,
        ),
    }


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score from length, punctuation and stopword
    ratios — the standard pretraining-corpus filters, as one projection."""
    q = quality_expressions(text_col)
    return docs.select(
        "doc_id", *[expr.alias(name) for name, expr in q.items()]
    )


def language_scores(text_col: str = "text") -> tuple[dict[str, Column], Column]:
    """language_id's per-language scores and predicted-language pick as
    bare expressions — shared by language_id and corpus.train_filter
    (r11; same single-projection motive as quality_expressions)."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(
            (count_occurrences(padded, m) for m in markers), F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    pred = F.lit(None).cast("string")
    # build the CASE in reverse so earlier langs win ties
    for lang in reversed(LANG_ORDER):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return scores, pred


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language detection with deterministic tie-break
    (LANG_ORDER). Returns per-language scores + predicted language."""
    scores, pred = language_scores(text_col)
    return docs.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
        pred.alias("lang_pred"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", shingle_n: int = 3) -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact-dup key) and
    min-md5 over word shingles (winnowing-style near-dup signature)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    sh = word_shingles(F.lower(F.col(text_col)), shingle_n)
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_exact"),
        F.coalesce(F.array_min(F.transform(sh, F.md5)), F.lit("")).alias("fp_shingle"),
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Robust-winnowing fingerprint SET per document (Schleimer,
    Wilkerson & Aiken 2003 — the MOSS construction at word grain):
    hash every k-word shingle, slide a w-window over the hash sequence,
    keep each window's minimum, emit the distinct selected hashes.

    The winnowing guarantee: any shared run of ≥ w+k-1 words between
    two documents yields at least one SHARED fingerprint, while the
    sketch is ~2/(w+1) the size of the full shingle set — the local
    document sketch between one-hash fingerprints (too coarse) and the
    full inverted index (too big to ship per doc).

    Plan: posexplode shingles → per-doc MIN window over a w-row frame
    (partitioned by doc, never global) → distinct. Only full windows
    select (pos ≥ w), matching the reference algorithm. Output
    (doc_id, fp) rows — the relational form an overlap join consumes.
    """
    from pyspark.sql.window import Window

    sh = docs.select(
        "doc_id",
        F.posexplode(
            word_shingles(F.lower(F.col(text_col)), k)
        ).alias("__p0", "__g"),
    ).select(
        "doc_id",
        (F.col("__p0") + 1).alias("pos"),
        F.md5(F.col("__g")).alias("__h"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    return (
        sh.withColumn("__m", F.min("__h").over(win))
        .filter(F.col("pos") >= w)
        .select("doc_id", F.col("__m").alias("fp"))
        .distinct()
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    min_shared: int = 3,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing ≥ min_shared winnowing fingerprints with
    the shared count — MOSS-style containment mining. The join is the
    fingerprint inverted index (equi-join on fp, shuffle bounded by
    sketch sizes), never a doc×doc cartesian."""
    fps = winnow_fingerprints(docs, k=k, w=w, text_col=text_col)
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by tf·(N/df).

    The linear-idf variant (N/df instead of ln(N/df)) keeps every value
    a single integer division — bit-reproducible across engines, which
    log()'s last-ulp libm differences are not. Ranking is totally
    tie-broken (score desc, term asc). Plan: one explode + two hash
    aggregations (term counts, document frequencies) + a per-doc top-k
    window over the (small) distinct-term set; df table is broadcast.
    """
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    terms = docs.select("doc_id", F.explode(ws).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = terms.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.count()
    from pyspark.sql.window import Window

    score = F.round(F.col("tf") * F.lit(float(n_docs)) / F.col("df"), 6)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"), "score", "rank")
    )


def length_percentiles_by_lang(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-count distribution per detected language: exact interpolated
    quartiles + p90 — the corpus-profiling step before choosing chunk
    sizes and length filters.

    One projection (language scores + word count share the scan) and
    ONE hash aggregation; exact percentile is a sort-based aggregate
    per group, fine for a bounded group count (languages), and both
    engines define it identically (linear interpolation), so the
    oracle matches bit-for-bit on integer inputs.
    """
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    base = language_id(docs, text_col).select("doc_id", "lang_pred").join(
        docs.select("doc_id", F.size(ws).cast("long").alias("n_words")), "doc_id"
    )
    pct = lambda p: F.round(F.percentile("n_words", F.lit(p)), 6)  # noqa: E731
    return base.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        pct(0.25).alias("p25"),
        pct(0.5).alias("p50"),
        pct(0.75).alias("p75"),
        pct(0.9).alias("p90"),
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-model quality proxy: mean log10 unigram probability per
    document under the corpus's own MLE unigram model — the classic
    cheap stand-in for perplexity-based filtering (docs of improbable
    tokens score low). log10 + round(6) keeps last-ulp libm variance
    below the comparison grain, the same argument as the cosine
    kernels.

    Plan: one explode, one map-combined term-frequency aggregate, a
    broadcast of the (term, freq) table back onto the token stream, a
    per-doc mean. Shuffles are term- and doc-keyed only.
    """
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    terms = docs.select("doc_id", F.explode(ws).alias("term"))
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("__tf"))
    total = terms.count()
    scored = terms.join(F.broadcast(freq), "term").select(
        "doc_id", F.log10(F.col("__tf") / F.lit(float(total))).alias("__lp")
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("__lp"), 6).alias("mean_logprob"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
    )


def bigram_logprob(
    docs: DataFrame, text_col: str = "text", alpha: float = 0.4
) -> DataFrame:
    """Interpolated bigram LM quality score (Jelinek-Mercer smoothing):
    per-document mean log10 of P(w_i | w_{i-1}) = α·P_ML(w_i|w_{i-1})
    + (1-α)·P_uni(w_i) over the corpus's own counts — one rung up the
    CCNet perplexity-filter ladder from :func:`unigram_logprob`
    (repetitive boilerplate scores HIGH, incoherent token salad scores
    LOW, and the unigram back-off keeps unseen-context bigrams finite).
    Only bigram positions are scored; docs with fewer than two tokens
    emit (NULL, 0).

    Output: (doc_id, mean_logprob, n_bigrams).

    Plan: the token stream explodes once for unigram counts and once
    (as consecutive pairs, built map-side from the token array — no
    window, no self-join) for bigram/context counts; scoring joins the
    pair stream to the bigram table keyed by (w1, w2) — a plain keyed
    join, NOT broadcast: the bigram vocabulary of a 100 TB corpus is
    itself large — and to the broadcast unigram table. log10 +
    round(6) keeps last-ulp libm variance below the comparison grain.
    """
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    toks = docs.select("doc_id", ws.alias("__ws"))
    uni = toks.select("doc_id", F.explode("__ws").alias("term"))
    tf = uni.groupBy("term").agg(F.count(F.lit(1)).alias("__tf"))
    total = uni.count()
    pairs = (
        toks.filter(F.size("__ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__ws) - 1), i -> "
                    "named_struct('w1', element_at(__ws, i), "
                    "'w2', element_at(__ws, i + 1)))"
                )
            ).alias("__bg"),
        )
        .select("doc_id", F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )
    bf = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__bf"))
    cf = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("__cf"))
    p = (
        F.lit(float(alpha)) * (F.col("__bf") / F.col("__cf"))
        + F.lit(1.0 - float(alpha)) * (F.col("__tf") / F.lit(float(total)))
    )
    scored = (
        pairs.join(bf, ["w1", "w2"])
        .join(cf, "w1")
        .join(F.broadcast(tf.withColumnRenamed("term", "w2")), "w2")
        .select("doc_id", F.log10(p).alias("__lp"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(F.avg("__lp"), 6).alias("mean_logprob"),
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "mean_logprob",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
        )
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranking of documents for a bag-of-terms query — the search
    side of a corpus pipeline (e.g. decontamination triage or
    retrieval-based inspection), as pure relational algebra:

      ONE explode → a persisted per-doc aggregate (length + one tf
      column per query term, |docs| narrow rows) → avg_len and all
      document frequencies in a single driver collect → idf as
      literals in a map-side score expression → TakeOrderedAndProject
      top-k. One corpus pass total; no join anywhere.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the Robertson-Sparck
    Jones form, always positive); length norm uses exact doc lengths
    against the corpus mean. Rounded to 6 for engine parity.

    Population note: N counts ALL docs (zero-token ones included) while
    avg_len averages over scoreable (tokenized) docs only — zero-token
    docs can match no term, so excluding them keeps the mean defined
    over documents that can actually score. The oracle mirrors both
    choices. An empty/tokenless corpus returns an empty frame.

    The one-tf-column-per-term layout assumes IR-shaped bag-of-terms
    queries (a handful to a few dozen terms). Thousand-term "queries"
    still run (Spark falls back to interpreted projection past the
    codegen field cap) but belong in doc_tfidf/dsir-style batch
    scoring, not this point-query path.
    """
    from hypermap_etl_spark.util import tracked_persist

    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    qt = list(dict.fromkeys(t.lower() for t in query_terms))
    if not qt:  # empty query ("".split() from the CLI) matches nothing
        return docs.select("doc_id").limit(0).withColumn("score", F.lit(0.0))

    # ONE tokenize pass for everything, and that pass is a pure MAP
    # (r10, guide §2.4/§1.1): a doc's length is size() of its own token
    # array and each tf is size(filter()) of it — per-row array HOFs,
    # so the per-doc frame needs no explode and NO exchange at all
    # (the previous explode→groupBy shape shuffled |docs| partial-agg
    # rows). N, avg_len and every df come out of the persisted narrow
    # frame in ONE driver collect (subsuming the separate docs.count()
    # corpus pass the old shape paid: zero-token docs keep a __len=0
    # row here purely so count(1) can see them, and are excluded from
    # avg_len/scoring exactly as before — the oracle mirrors both
    # populations). Scoring stays a map-side expression over the cache.
    #
    # The token array is STAGED into its own projection (r11, VERDICT
    # r10 #9): inlining `ws` into __len and every __tf_i restates the
    # split+filter tokenize len(qt)+1 times per row, and the copies are
    # NOT merged — each HOF copy binds fresh lambda variables, so
    # runtime subexpression elimination sees structurally different
    # trees. Staging evaluates the tokenize once; CollapseProject keeps
    # the stage (non-cheap expression consumed len(qt)+1 times), the
    # same guard hash_embed's norm staging relies on.
    def _tf(term):
        # closure factory, NOT a default-arg lambda: a two-parameter
        # lambda is PySpark's (element, index) HOF form
        return F.size(F.filter(F.col("__ws"), lambda w: w == F.lit(term)))

    per_doc = tracked_persist(
        docs.select("doc_id", ws.alias("__ws")).select(
            "doc_id",
            F.size("__ws").alias("__len"),
            *[_tf(t).alias(f"__tf_{i}") for i, t in enumerate(qt)],
        )
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg(F.when(F.col("__len") > 0, F.col("__len"))).alias("__avg"),
        *[
            F.count(F.when(F.col(f"__tf_{i}") > 0, F.lit(1))).alias(f"__df_{i}")
            for i in range(len(qt))
        ],
    ).collect()[0]
    n_docs = stats["__n_docs"]
    avg_len = stats["__avg"]
    if avg_len is None:  # no tokenized docs at all — nothing can score
        return docs.select("doc_id").limit(0).withColumn("score", F.lit(0.0))

    import math

    score = F.lit(0.0)
    for i in range(len(qt)):
        idf = math.log(
            (float(n_docs) - stats[f"__df_{i}"] + 0.5)
            / (stats[f"__df_{i}"] + 0.5)
            + 1.0
        )
        tf = F.col(f"__tf_{i}").cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__len") / F.lit(float(avg_len))
        )
        score = score + F.lit(idf) * tf * F.lit(k1 + 1) / denom
    any_hit = (
        F.col("__tf_0")
        if len(qt) == 1
        else F.greatest(*[F.col(f"__tf_{i}") for i in range(len(qt))])
    )
    return (
        per_doc.filter(any_hit > 0)
        .select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _hash_bucket_sums(
    docs: DataFrame, dim: int, text_col: str, ngrams: int = 1
) -> DataFrame:
    """hash_embed's aggregate: per-doc UN-normalized bucket sums as dim
    narrow columns (doc_id, __v0..__v{dim-1}; absent buckets NULL).
    Shared by hash_embed (which assembles/normalizes the array) and
    hybrid_rrf_search's semantic leg (which consumes the sums directly
    — r11, so the one-query path never builds the array at all). One
    explode_outer → one map-combinable hash aggregate; see hash_embed's
    docstring for the full shape/equivalence story."""
    if ngrams > 1:
        # collapse whitespace runs first: word_shingles keeps empty
        # tokens (split on single space), so 'a  b' would otherwise
        # shingle as ('a ', ' b') — different buckets than 'a b'
        canon = F.trim(F.regexp_replace(F.lower(F.col(text_col)), " {2,}", " "))
        toks = word_shingles(canon, ngrams)
    else:
        toks = F.filter(
            words(F.lower(F.col(text_col))), lambda w: w != F.lit("")
        )
    t = docs.select("doc_id", F.explode_outer(toks).alias("__t"))
    h = F.md5(F.col("__t"))
    b = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(dim)
    )
    sign = F.when(
        F.pmod(F.conv(F.substring(h, 9, 1), 16, 10).cast("bigint"), F.lit(2))
        == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    return t.select("doc_id", b.alias("__b"), sign.alias("__s")).groupBy(
        "doc_id"
    ).agg(
        *[
            F.sum(F.when(F.col("__b") == i, F.col("__s"))).alias(f"__v{i}")
            for i in range(dim)
        ]
    )


def hash_embed(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    ngrams: int = 1,
) -> DataFrame:
    """Feature-hashing text embeddings (the hashing trick, Weinberger
    et al. 2009): every token (or word n-gram) hashes to a bucket in
    [0, dim) with a ±1 sign from a second hash bit; per-doc bucket sums
    are L2-normalized into an `embedding array<double>`.

    This is the deterministic, model-free bridge from raw text into the
    ENTIRE similarity stack — SemDeDup-style near-dup, ANN top-k, the
    persisted IVF index, k-means, semantic decontamination — with zero
    external dependencies, and engine-reproducible: hashes are
    md5-derived (first 8 hex chars → bucket, 9th → sign), the repo's
    convention wherever an oracle must replay a signature — DuckDB
    reproduces them bit-for-bit (Spark's xxhash64 it cannot).

    Scale shape (r10, guide §2.4): ONE explode_outer → ONE hash
    aggregate keyed by doc_id whose buffer is the dim bucket sums
    (``sum(when(bucket = i, sign))`` per slot — codegen'd,
    map-combinable; an n-token row collapses map-side before the
    exchange carries |docs| narrow rows). explode_outer keeps a
    NULL-token row for empty/NULL-text docs, so they surface as zero
    vectors from the SAME aggregate — the previous shape paid a second
    doc-keyed exchange to assemble the array AND a corpus-sized left
    join purely to restore those rows. Bucket sums are exact ±1
    integer adds in double — associative, so the aggregation-order
    change cannot move a bit. (dim beyond Spark's codegen field cap
    (~100) falls back to interpreted aggregation — still correct, and
    still one exchange.)

    Output: (doc_id, embedding array<double>) — the embeddings-table
    shape, minus the label column.
    """
    per = _hash_bucket_sums(docs, dim, text_col, ngrams)
    raw = F.array(*[F.coalesce(F.col(f"__v{i}"), F.lit(0.0)) for i in range(dim)])
    # staged projections: norm and both unit branches reference the
    # assembled array, and CollapseProject's used-once-or-cheap guard
    # keeps it built once per row
    staged = per.select("doc_id", raw.alias("__raw")).select(
        "doc_id",
        "__raw",
        F.sqrt(
            F.aggregate(F.col("__raw"), F.lit(0.0), lambda a, x: a + x * x)
        ).alias("__norm"),
    )
    unit = F.when(F.col("__norm") == 0, F.col("__raw")).otherwise(
        F.transform(F.col("__raw"), lambda x: x / F.col("__norm"))
    )
    return staged.select("doc_id", unit.alias("embedding"))


def kn_bigram_logprob(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """Interpolated Kneser-Ney bigram score (Kneser & Ney 1995; Chen &
    Goodman 1999 eq. 18) — the top rung of this module's perplexity
    ladder (unigram_logprob → bigram_logprob/JM → here). Per document,
    mean log10 of

        P_KN(w2|w1) = max(c(w1 w2) − d, 0) / c(w1 ·)
                      + d · N1+(w1 ·) / c(w1 ·) · P_cont(w2)
        P_cont(w2)  = N1+(· w2) / |distinct bigram types|

    — KN's continuation probability fixes exactly what the JM unigram
    back-off gets wrong on corpus boilerplate: a word frequent only
    inside one stock phrase ("Francisco") gets a LOW continuation
    probability however high its raw frequency.

    Output: (doc_id, mean_logprob, n_bigrams) — docs with fewer than
    two tokens emit (NULL, 0). All four model tables are exact count
    aggregates, so the DuckDB oracle reproduces the score bit-for-bit
    (log10 + round(6), the libm-variance argument of bigram_logprob).

    Plan: the consecutive-pair stream is built map-side from the token
    array (no window, no self-join); model tables are two-phase hash
    aggregates; scoring joins the pair stream to the bigram/context
    tables keyed by words (NOT broadcast — a web corpus's bigram
    vocabulary is large) and to the broadcast continuation-count
    table; |bigram types| is one scalar broadcast literal.
    """
    d = float(discount)
    if not 0 < d < 1:
        raise ValueError("kn_bigram_logprob: need 0 < discount < 1")
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    toks = docs.select("doc_id", ws.alias("__ws"))
    pairs = (
        toks.filter(F.size("__ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__ws) - 1), i -> "
                    "named_struct('w1', element_at(__ws, i), "
                    "'w2', element_at(__ws, i + 1)))"
                )
            ).alias("__bg"),
        )
        .select("doc_id", F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )
    bf = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__bf"))
    cf = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).alias("__cf"),           # c(w1 ·)
        F.count_distinct(F.col("w2")).alias("__n1f"),  # N1+(w1 ·)
    )
    cont = pairs.groupBy("w2").agg(
        F.count_distinct(F.col("w1")).alias("__n1b")   # N1+(· w2)
    )
    n_types = bf.count()  # |distinct bigram types| — scalar, broadcast literal
    p = (
        F.greatest(F.col("__bf") - F.lit(d), F.lit(0.0)) / F.col("__cf")
        + F.lit(d) * F.col("__n1f") / F.col("__cf")
        * (F.col("__n1b") / F.lit(float(n_types)))
    )
    scored = (
        pairs.join(bf, ["w1", "w2"])
        .join(cf, "w1")
        .join(F.broadcast(cont), "w2")
        .select("doc_id", F.log10(p).alias("__lp"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(F.avg("__lp"), 6).alias("mean_logprob"),
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "mean_logprob",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
        )
    )


def pmi_pairs(
    docs: DataFrame, min_count: int = 5, text_col: str = "text"
) -> DataFrame:
    """Pointwise-mutual-information collocations — the phrase-mining
    signal (word2vec's phrase pass, tokenizer-merge priors): for every
    adjacent word pair seen >= ``min_count`` times,

        pmi = ln( c_ab * N_uni^2 / (c_a * c_b * N_bi) )

    i.e. how much more often the pair occurs than independence
    predicts. Output: (w1, w2, n_pair, pmi) with pmi rounded at 6 —
    counts are exact integers, so the one ln() is the only float op
    and a final-round absorbs the cross-engine libm ulp.

    Scale shape: one explode -> hash agg for unigram counts, one for
    bigram counts (shingles built O(words)/row via word_shingles),
    then the bigram table joins the unigram counts twice, keyed by
    word — the classic co-occurrence join; totals ride a broadcast
    single-row cross join (the percentage-of-total A4 pattern). The
    min_count filter applies BEFORE the joins, so the join input is
    the heavy-pair table, not the full bigram tail.
    """
    if min_count < 1:
        raise ValueError("pmi_pairs: min_count must be >= 1")
    t = F.lower(F.col(text_col))
    uni = (
        docs.select(F.explode(F.filter(words(t), lambda w: w != F.lit(""))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        docs.select(F.explode(word_shingles(t, 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
        .select(
            F.split(F.col("g"), " ").getItem(0).alias("w1"),
            F.split(F.col("g"), " ").getItem(1).alias("w2"),
            "c_ab",
        )
    )
    totals = uni.agg(F.sum("c").cast("long").alias("n_uni")).crossJoin(
        docs.select(F.explode(word_shingles(t, 2)).alias("g"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_bi"))
    )
    joined = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("c_ab").cast("double") * F.col("n_uni").cast("double")
         * F.col("n_uni").cast("double"))
        / (F.col("c_a").cast("double") * F.col("c_b").cast("double")
           * F.col("n_bi").cast("double"))
    )
    return joined.select(
        "w1",
        "w2",
        F.col("c_ab").cast("long").alias("n_pair"),
        (F.round(pmi, 6) + F.lit(0.0)).alias("pmi"),
    )


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of each document's character distribution —
    the cheap junk detector at the two tails: near-zero entropy is
    repeated-character padding, implausibly high entropy is
    random-bytes/base64 noise (natural language sits ~2.5-4.5 bits
    equivalent). Output: (doc_id, n_chars, entropy) with entropy in
    nats rounded at 6; empty docs report 0.

    Scale shape: pure projection, zero shuffles — character counts
    are a nested HOF (distinct chars x filter-count, O(len x
    alphabet) per row, all JVM). The per-row float sum is over <=
    alphabet-size terms; the final round absorbs engine summation
    order.
    """
    t = F.col(text_col)
    cs = F.when(F.length(t) > 0, F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: t.substr(i, F.lit(1)),
    )).otherwise(F.array().cast("array<string>"))
    base = docs.select("doc_id", cs.alias("__cs"))
    n = F.size(F.col("__cs")).cast("double")
    ent = F.aggregate(
        F.array_distinct(F.col("__cs")),
        F.lit(0.0),
        lambda acc, c: acc
        - (
            F.size(F.filter(F.col("__cs"), lambda x: x == c)) / n
        )
        * F.log(F.size(F.filter(F.col("__cs"), lambda x: x == c)) / n),
    )
    return base.select(
        "doc_id",
        F.size("__cs").cast("long").alias("n_chars"),
        (F.round(F.when(F.size("__cs") > 0, ent).otherwise(F.lit(0.0)), 6)
         + F.lit(0.0)).alias("entropy"),
    )


def script_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Writing-system profile per document: counts of Latin / Cyrillic
    / Han script characters plus digits and whitespace, the Latin
    share, and the dominant script — the router that splits a
    multilingual crawl into per-script pipelines (tokenizer choice,
    langid model, CJK-aware segmentation) before any text-level work.

    Counts are Unicode-script regexp_count's (Java \\p{IsLatin} ==
    RE2 \\p{Latin} — both are Script=Latin); digits/whitespace use
    explicit ASCII classes (the engines' \\d/\\s shorthands differ at
    the edges, e.g. vertical tab). Dominant script is the max count
    with alphabetically-first tie-break, evaluated as a CASE chain so
    any engine reproduces it. Pure projection: no shuffle, no Python,
    one pass over the text."""
    t = F.col(text_col)
    n_latin = F.regexp_count(t, F.lit(r"\p{IsLatin}")).cast("long")
    n_cyr = F.regexp_count(t, F.lit(r"\p{IsCyrillic}")).cast("long")
    n_han = F.regexp_count(t, F.lit(r"\p{IsHan}")).cast("long")
    n_digit = F.regexp_count(t, F.lit("[0-9]")).cast("long")
    n_space = F.regexp_count(t, F.lit("[ \\t\\n\\r]")).cast("long")
    n_chars = F.length(t).cast("long")
    base = docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_latin.alias("n_latin"),
        n_cyr.alias("n_cyrillic"),
        n_han.alias("n_han"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
    )
    m = F.greatest("n_latin", "n_cyrillic", "n_han", "n_digit")
    dominant = (
        F.when(m == 0, F.lit(""))
        .when(F.col("n_cyrillic") == m, F.lit("cyrillic"))
        .when(F.col("n_digit") == m, F.lit("digit"))
        .when(F.col("n_han") == m, F.lit("han"))
        .otherwise(F.lit("latin"))
    )
    return base.select(
        "*",
        F.round(
            F.when(F.col("n_chars") > 0, F.col("n_latin") / F.col("n_chars"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("latin_share"),
        dominant.alias("dominant_script"),
    )


def zipf_fit(docs: DataFrame, top_k: int = 1000, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit over the corpus rank-frequency curve: OLS of
    ln(freq) on ln(rank) for the top_k terms — slope ≈ -1 for natural
    language; a flat slope flags synthetic/templated text and the
    curve sizes tokenizer vocabularies (how much mass the tail holds).

    One row out: n_terms (distinct vocabulary), n_tokens, slope,
    intercept, r2 (6 dp).

    Scale shape: ONE map-combined term-count aggregate (the only
    corpus-sized shuffle, keyed by term), top-k via
    TakeOrderedAndProject (per-partition heaps, no global sort), rank
    by a window over the k collected survivors (k rows — model-sized),
    and the OLS moments are one tiny aggregate. ln() only over exact
    integer counts, so the fit is layout-independent up to the final
    rounding.
    """
    from pyspark.sql.window import Window

    terms = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")
        ).alias("term")
    )
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("freq").alias("n_tokens"),
    )
    top = counts.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(top_k)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("term").asc())
        ),
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    moments = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    # try_divide: a degenerate corpus (k=1 term, or all-equal freqs
    # with exactly-cancelling moments) zeroes a denominator; NULL fit
    # beats an ANSI divide-by-zero error there
    slope = F.try_divide(
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
    )
    intercept = F.try_divide(F.col("sy") - slope * F.col("sx"), F.col("n"))
    r2 = F.try_divide(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
    )
    return moments.join(F.broadcast(totals)).select(
        F.col("n_terms").cast("bigint").alias("n_terms"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def bm25_snippets(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    context: int = 30,
    width: int = 80,
    text_col: str = "text",
) -> DataFrame:
    """Search results a human can read: bm25_search's top-k joined back
    to the text with a snippet centered on the FIRST query-term hit —
    the serving projection of the retrieval stack (triage UIs,
    decontamination review queues).

    first_pos = min over terms of instr(lower(text), term) (0 = no
    literal hit — possible when the tf tokenizer matched but the raw
    substring differs in whitespace; snippet then starts at 1).
    snippet = substr(text, max(1, first_pos − context), width). Both
    functions are 1-based and engine-identical, so the oracle replays
    the exact snippet. Join back to text is a broadcast of the k-row
    result frame against the corpus — the corpus is never shuffled.
    """
    hits = bm25_search(docs, query_terms, k=k, text_col=text_col)
    t = F.lower(F.col(text_col))
    # bm25_search lowercases terms for ranking; the position probe
    # must match that, or a capitalized query never centers a snippet
    terms = [qt.lower() for qt in query_terms]
    pos_candidates = [
        F.when(F.instr(t, term) > 0, F.instr(t, term)) for term in terms
    ]
    least = (
        F.least(*pos_candidates)
        if len(pos_candidates) > 1
        else pos_candidates[0]
    )
    first_pos = F.coalesce(least, F.lit(1))
    start = F.greatest(F.lit(1), first_pos - F.lit(context))
    return (
        docs.select("doc_id", text_col)
        .join(F.broadcast(hits), "doc_id")
        .select(
            "doc_id",
            "score",
            first_pos.cast("bigint").alias("first_pos"),
            F.col(text_col).substr(start, F.lit(width)).alias("snippet"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )


def lexical_diversity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Type-token ratio + Guiraud's root TTR per document — the
    lexical-diversity quality signal (templated/spun text has few
    types per token; TTR shrinks with length, which is why Guiraud's
    types/√tokens is the comparable form). Pure array math in one
    projection: no shuffle, no Python."""
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    arr = docs.select("doc_id", ws.alias("__ws"))
    n = F.size("__ws")
    t = F.size(F.array_distinct("__ws"))
    return arr.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        t.cast("bigint").alias("n_types"),
        F.round(F.when(n > 0, t / n).otherwise(F.lit(0.0)), 6).alias("ttr"),
        F.round(
            F.when(n > 0, t / F.sqrt(n.cast("double"))).otherwise(F.lit(0.0)),
            6,
        ).alias("guiraud"),
    )


def ngram_novelty(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Corpus-novelty score per document: the fraction of its distinct
    word n-grams that appear in NO other document — the RefinedWeb-
    style "how much of this doc is new text" signal (boilerplate-heavy
    docs score near 0 even when no single pair crosses a dedup
    threshold; fully original docs score 1).

    One inverted-index pass (doc_id, shingle) — the same corpus-sized
    aggregate the dedup miners pay — then document frequencies per
    shingle and a per-doc mean of df==1. Shuffles carry shingle
    hashes + ids only. Docs with no n-gram (< n words) score NULL.
    """
    from hypermap_etl_spark.operators.dedup import shingle_index

    sh = shingle_index(docs, text_col, n)
    df_counts = sh.groupBy("sh").agg(
        F.count(F.lit(1)).alias("__df")
    )
    joined = sh.join(df_counts, "sh")
    per_doc = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(F.when(F.col("__df") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_unique"),
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        F.round(
            F.when(
                F.col("n_shingles") > 0,
                F.col("n_unique") / F.col("n_shingles"),
            ),
            6,
        ).alias("novelty"),
    )


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease score per document — the classic
    surface-level difficulty prior (Flesch 1948; the Kincaid variants
    share the same three counts) used alongside the heuristic quality
    scores when bucketing a corpus by audience level.

    Counts are defined to be engine-reproducible rather than
    linguistically perfect (real syllabification needs a dictionary):
    syllables ≈ maximal [aeiouy]+ runs in the lowercased text,
    sentences ≈ maximal [.!?]+ runs (floored at 1), words = non-empty
    whitespace tokens (the corpus-wide token convention). Flesch =
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words);
    documents with no words emit NULL score.

    Scale shape: three regexp counts per row, no shuffle at all —
    column expressions only; the caller aggregates or filters.
    """
    lt = F.lower(F.col(text_col))
    n_words = F.size(F.filter(words(lt), lambda w: w != F.lit("")))
    n_syll = F.size(F.regexp_extract_all(lt, F.lit("[aeiouy]+"), 0))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(lt, F.lit("[.!?]+"), 0)), F.lit(1)
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(F.when(n_words > 0, flesch), 6).alias("flesch"),
    )


def hybrid_rrf_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k_leg: int = 30,
    rrf_c: int = 60,
    dim: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Hybrid retrieval by reciprocal rank fusion (Cormack, Clarke &
    Buettcher 2009): fuse a BM25 lexical leg with a hash-embedding
    cosine leg as score(d) = Σ_legs 1/(rrf_c + rank_leg(d)) — the
    standard way production search stacks combine keyword and vector
    retrieval without score calibration, since RRF consumes only
    RANKS. The fused score is exact integer-derived arithmetic, so it
    is engine-reproducible regardless of the legs' float internals.

    The unpartitioned rank windows run on leg frames already cut to
    ``k_leg`` rows by TakeOrderedAndProject — bounded by construction,
    never a corpus-wide single-task sort.

    Legs: ``bm25_search`` top-``k_leg`` (scores rounded to 6 before
    ranking, doc_id tie-break) and cosine of ``hash_embed`` corpus
    vectors against the query's own hash embedding (the query vector
    is data-independent — computed driver-side from the same
    md5-bucket construction and inlined as a literal). Zero-vector
    documents are excluded from the semantic leg (cosine undefined),
    mirroring the sparse-join oracle. A document absent from a leg
    contributes 0 for that leg.

    Scale shape: the corpus is scanned twice (once per leg — inherent:
    the legs index different representations); each leg ends in a
    TakeOrderedAndProject of k_leg rows, so the fusion join and final
    ordering run on ≤ 2·k_leg rows. No corpus-wide window, no UDF; the
    query embedding is a broadcast-free literal.
    """
    import hashlib

    from pyspark.sql.window import Window

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qt = [t.lower() for t in query_terms]

    # --- query vector: driver-side replay of hash_embed's buckets ---
    qv = [0.0] * dim
    for t in qt:
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        b = int(h[:8], 16) % dim
        sgn = 1.0 if int(h[8], 16) % 2 == 0 else -1.0
        qv[b] += sgn
    qn = sum(v * v for v in qv) ** 0.5
    w_leg = Window.orderBy(F.desc("score"), F.asc("doc_id"))

    lex = (
        bm25_search(docs, qt, k=k_leg, text_col=text_col)
        .withColumn("lex_rank", F.row_number().over(w_leg))
        .select("doc_id", "lex_rank")
    )

    if qn == 0:  # query terms hash-cancelled: lexical-only fusion
        fused = lex.select(
            "doc_id", "lex_rank", F.lit(None).cast("int").alias("sem_rank")
        )
    else:
        # Semantic leg straight off the bucket-sum columns (r11, guide
        # §4.1 "prefer built-ins"/§1.2 per-task work): the previous
        # shape assembled the normalized 64-slot array via hash_embed
        # and then reduced it with FOUR higher-order passes per doc
        # (transform divide, zip_with+aggregate twice for dot and the
        # zero-vector check) — HOF lambdas evaluate interpreted, per
        # element. Here norm and dot are plain codegen'd expression
        # CHAINS over __v0..__v63, built in the exact float-op sequence
        # the HOF folds executed, so every score is bit-identical:
        #   norm = sqrt(((0 + r0*r0) + r1*r1) + ...),  r_i = coalesce(v_i, 0)
        #   dot  = ((0 + (r0/norm)*q0) + (r1/norm)*q1) + ...
        # and the old filter (sum of unit squares > 0) is exactly
        # norm > 0: bucket sums are integer-valued doubles, so a
        # nonzero r_i makes norm >= 1 and every (r_i/norm)^2 term is
        # far above underflow. __norm is STAGED in its own projection
        # (consumed by all dim dot terms — the CollapseProject guard
        # keeps it evaluated once).
        sums = _hash_bucket_sums(docs.select("doc_id", text_col), dim, text_col)
        rs = [F.coalesce(F.col(f"__v{i}"), F.lit(0.0)) for i in range(dim)]
        n2 = F.lit(0.0)
        for r in rs:
            n2 = n2 + r * r
        staged = sums.select("doc_id", *sums.columns[1:], F.sqrt(n2).alias("__norm"))
        dot = F.lit(0.0)
        for i, r in enumerate(rs):
            dot = dot + (r / F.col("__norm")) * F.lit(qv[i] / qn)
        sem = (
            staged.filter(F.col("__norm") > 0)
            .select("doc_id", F.round(dot, 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k_leg)
            .withColumn("sem_rank", F.row_number().over(w_leg))
            .select("doc_id", "sem_rank")
        )
        fused = lex.join(sem, "doc_id", "full_outer")

    rrf = F.when(
        F.col("lex_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_c)) + F.col("lex_rank")),
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("sem_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_c)) + F.col("sem_rank")),
    ).otherwise(F.lit(0.0))
    return (
        fused.select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).cast("long").alias("sem_rank"),
            F.round(rrf, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )


def source_js_divergence(
    docs: DataFrame,
    top_v: int = 200,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Jensen-Shannon divergence between each source's word
    distribution and the corpus distribution, over the corpus's
    ``top_v`` most frequent words — the mixture-balance monitor of a
    multi-source training pipeline (a source whose JSD jumps is
    drifting away from the blend it was weighted for; symmetric and
    bounded by ln 2, unlike raw KL).

    Distributions are restricted to the top-V vocabulary and
    renormalized inside it (the deterministic (n DESC, word) cut, the
    word_frequencies convention), which bounds every frame after the
    first aggregate by V × sources — Heaps-law tails never reach the
    divergence sum. Words a source lacks still contribute their
    q·ln 2 mass through the mixture m = (p+q)/2.

    Scale shape: ONE corpus explode→aggregate keyed (source, word);
    everything after runs on V- and source-bounded frames (TakeOrdered
    vocabulary, broadcast totals, a sources×V grid). Output:
    (source, n_vocab_hit, jsd) with jsd rounded to 6 (log wobble
    across engines is absorbed by the final round; every other step
    is exact integer arithmetic).
    """
    from hypermap_etl_spark.util import tracked_persist

    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    sw = (
        docs.select(F.col(source_col).alias("source"), F.explode(ws).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sw = tracked_persist(sw)
    vocab = (
        sw.groupBy("word")
        .agg(F.sum("n").alias("cn"))
        .orderBy(F.desc("cn"), F.asc("word"))
        .limit(top_v)
    )
    swv = sw.join(F.broadcast(vocab.select("word")), "word")
    cwv = swv.groupBy("word").agg(F.sum("n").cast("long").alias("cn"))
    tot_c = cwv.agg(F.sum("cn").cast("double").alias("tc"))
    tot_s = swv.groupBy("source").agg(F.sum("n").cast("double").alias("ts"))
    # sources × V grid so absent words still contribute q·ln2
    grid = (
        tot_s.crossJoin(F.broadcast(cwv))
        .join(
            swv.select("source", "word", F.col("n").alias("sn")),
            ["source", "word"],
            "left",
        )
        .crossJoin(F.broadcast(tot_c))
    )
    p = F.coalesce(F.col("sn").cast("double"), F.lit(0.0)) / F.col("ts")
    q = F.col("cn").cast("double") / F.col("tc")
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / F.lit(2.0)
    return grid.groupBy("source").agg(
        F.sum(F.when(F.col("sn").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_vocab_hit"),
        F.round(F.sum(term), 6).alias("jsd"),
    )


def source_hellinger(
    docs: DataFrame,
    top_v: int = 200,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Hellinger distance between each source's word distribution and
    the corpus distribution over the corpus's ``top_v`` vocabulary —
    the metric sibling of :func:`source_js_divergence` (a true metric,
    bounded in [0,1], with H² = 1 − Σ√(p·q); preferred when distances
    must be comparable/triangulable, e.g. clustering sources).

    Same vocabulary discipline as the JSD: the deterministic
    (n DESC, word) top-V cut, renormalized inside it. Unlike the JSD,
    words a source LACKS contribute zero to the Bhattacharyya sum, so
    no sources×V grid is needed — only the source's vocab hits. A
    source with ZERO vocab hits still gets a row (n_vocab_hit=0,
    bhattacharyya=0, hellinger=1): maximal divergence must alarm in
    the drift report, not vanish from it.

    Determinism: each √(p·q) term is rounded to 12 dp and QUANTIZED to
    decimal before the cross-word reduction (the quantize-then-
    exact-sum discipline), so the sum is order-independent — stricter
    than relying on the final rounding to absorb float wobble.

    Scale shape: ONE corpus explode→aggregate keyed (source, word);
    everything after is bounded by V × sources. Output per source:
    n_vocab_hit, bhattacharyya (round 6), hellinger (round 6).
    """
    from hypermap_etl_spark.util import tracked_persist

    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    sw = (
        docs.select(F.col(source_col).alias("source"), F.explode(ws).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sw = tracked_persist(sw)
    vocab = (
        sw.groupBy("word")
        .agg(F.sum("n").alias("cn"))
        .orderBy(F.desc("cn"), F.asc("word"))
        .limit(top_v)
    )
    swv = sw.join(F.broadcast(vocab.select("word")), "word")
    cwv = swv.groupBy("word").agg(F.sum("n").cast("long").alias("cn"))
    tot_c = cwv.agg(F.sum("cn").cast("double").alias("tc"))
    tot_s = swv.groupBy("source").agg(F.sum("n").cast("double").alias("ts"))
    joint = (
        swv.select("source", "word", F.col("n").alias("sn"))
        .join(F.broadcast(cwv), "word")
        .join(F.broadcast(tot_s), "source")
        .crossJoin(F.broadcast(tot_c))
    )
    pcol = F.col("sn").cast("double") / F.col("ts")
    qcol = F.col("cn").cast("double") / F.col("tc")
    termq = F.round(F.sqrt(pcol * qcol), 12).cast("decimal(14,12)")
    agg = joint.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab_hit"),
        F.sum(termq).cast("decimal(38,12)").alias("__bc"),
    )
    # Zero-hit sources fall out of the vocab inner join; restore them
    # so maximal divergence reads hellinger=1 instead of disappearing.
    all_sources = sw.select("source").distinct()
    full = all_sources.join(agg, "source", "left")
    bc = F.coalesce(F.col("__bc").cast("double"), F.lit(0.0))
    return full.select(
        "source",
        F.coalesce(F.col("n_vocab_hit"), F.lit(0).cast("long")).alias(
            "n_vocab_hit"
        ),
        F.round(bc, 6).alias("bhattacharyya"),
        F.round(
            F.sqrt(F.greatest(F.lit(1.0) - bc, F.lit(0.0))), 6
        ).alias("hellinger"),
    )


def skipgram_cooc(
    docs: DataFrame,
    window: int = 3,
    min_count: int = 5,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Skip-gram co-occurrence counts within a ±``window`` position
    band — the input matrix of word2vec/GloVe-style embedding training
    and of PPMI vector mining (pmi_pairs scores ADJACENT pairs only;
    this is the windowed generalization).

    Scale shape — the delta-join, NOT a per-doc quadratic: each token
    row fans out to ``window`` shifted key rows (pos − d for d in
    1..window), and ONE equi-join on (doc_id, pos) recovers exactly
    the ordered pairs at distance ≤ window. Cost is O(len·window) rows
    into a hash join keyed by (doc, position) — a 10k-word document
    contributes 30k join rows at window 3, never the 100M of a
    positions-cross-join. Pairs are canonicalized unordered
    (least, greatest), counted in one aggregate, thresholded, and
    TakeOrdered to ``top_k`` by (n DESC, w1, w2).
    """
    pairs = _skipgram_pairs(docs, window, text_col)
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
        .limit(top_k)
    )


def _skipgram_pairs(docs: DataFrame, window: int, text_col: str) -> DataFrame:
    """The delta-join pair stream shared by skipgram_cooc and
    sppmi_matrix: unordered (w1 <= w2) co-occurrence instances at
    position distance <= window, O(len·window) join rows."""
    if window < 1:
        raise ValueError("window must be >= 1")
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    tok = docs.select(
        "doc_id", F.posexplode(ws).alias("pos", "w")
    )
    from hypermap_etl_spark.util import tracked_persist

    tok = tracked_persist(tok)
    shifted = tok.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(d) for d in range(1, window + 1)])
        ).alias("__d"),
        F.col("pos").alias("__bpos"),
        F.col("w").alias("__wb"),
    ).select(
        "doc_id",
        (F.col("__bpos") - F.col("__d")).alias("pos"),
        "__wb",
    )
    return tok.join(shifted, ["doc_id", "pos"]).select(
        F.least(F.col("w"), F.col("__wb")).alias("w1"),
        F.greatest(F.col("w"), F.col("__wb")).alias("w2"),
    )


def negative_sampling_table(
    docs: DataFrame,
    alpha: float = 0.75,
    top_v: int = 10000,
    text_col: str = "text",
) -> DataFrame:
    """The word2vec negative-sampling distribution: unigram counts
    raised to ``alpha`` (0.75 in Mikolov et al. 2013 — flattens the
    head, fattens the tail) over the deterministic top-``top_v``
    vocabulary, with each word's sampling share and cumulative share
    — the inverse-CDF lookup a sampler consumes (draw u in [0, 1),
    take the first word whose cum_share >= u). Completes the SGNS
    input trio beside :func:`skipgram_cooc` and :func:`sppmi_matrix`.

    Numerics: counts are exact longs; n^alpha is one pow() per word
    rounded to 6 dp and cast to decimal(28,6), so the total and the
    cumulative sums are EXACT decimal arithmetic — no float
    accumulation across the vocabulary (a double Σ over a Heaps-law
    vocab would be order-dependent). Shares divide exact decimals in
    doubles at the output. The vocabulary cut and the cumulative
    order are both (n DESC, word ASC) — total, engine-identical.

    Scale shape: ONE corpus aggregate to word counts, TakeOrdered to
    top_v, then everything runs on the capped vocabulary; the
    cumulative window orders the top_v frame only (bounded, never
    corpus rows).
    """
    from pyspark.sql.window import Window

    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    if top_v < 1:
        raise ValueError("top_v must be >= 1")
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    counts = (
        docs.select(F.explode(ws).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(top_v)
    )
    w6 = F.round(F.pow(F.col("n").cast("double"), F.lit(alpha)), 6).cast(
        "decimal(28,6)"
    )
    wv = counts.withColumn("__w", w6)
    tot = wv.agg(F.sum("__w").cast("decimal(38,6)").alias("__t"))
    cum_w = (
        Window.orderBy(F.desc("n"), F.asc("word"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        wv.withColumn("__cum", F.sum("__w").over(cum_w))
        .crossJoin(F.broadcast(tot))
        .select(
            "word",
            "n",
            F.col("__w").cast("double").alias("weight"),
            F.round(
                F.col("__w").cast("double") / F.col("__t").cast("double"), 9
            ).alias("share"),
            F.round(
                F.col("__cum").cast("double") / F.col("__t").cast("double"), 9
            ).alias("cum_share"),
        )
    )


def sppmi_matrix(
    docs: DataFrame,
    window: int = 3,
    min_count: int = 5,
    top_k: int = 50,
    shift_k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Shifted positive PMI over the windowed co-occurrence matrix —
    THE matrix whose factorization is skip-gram-with-negative-sampling
    (Levy & Goldberg 2014: SGNS implicitly factorizes PMI − ln k):
    SPPMI(w, c) = max(0, ln(#(w,c)) + ln T − ln #w − ln #c − ln k).
    The corpus-statistics half of embedding training, with the
    ``shift_k`` playing the negative-sampling count's role.

    Conventions (mirrored exactly by the gate oracle): pairs are the
    unordered delta-join instances (:func:`skipgram_cooc`'s stream);
    T is the total pair count; a word's marginal #w sums every pair
    containing it (a self-pair (w, w) contributes twice). Marginals
    and T come from the FULL matrix — the ``min_count`` floor applies
    only to which cells are emitted, never to the statistics.

    Numerics: counts are exact longs; the log-sum form never builds
    an int64-overflowing product (the categorical_mi discipline); one
    fixed-order double expression, rounded at the output, and the
    top-k orders by the ROUNDED value (ties by w1, w2) so the cut is
    engine-identical.

    Scale shape: one delta-join pass to the pair aggregate; marginals
    (union ×2 of the CELL frame, not the corpus) join back by word —
    plain hash joins, because a Heaps-law vocabulary is NOT
    broadcast-sized at corpus scale; only the one-row total
    broadcasts. AQE may still elect a broadcast at fixture scale.
    """
    pairs = _skipgram_pairs(docs, window, text_col)
    from hypermap_etl_spark.util import tracked_persist

    cells = tracked_persist(
        pairs.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    )
    marg = (
        cells.select(F.col("w1").alias("w"), "n")
        .unionByName(cells.select(F.col("w2").alias("w"), "n"))
        .groupBy("w")
        .agg(F.sum("n").cast("long").alias("__m"))
    )
    tot = cells.agg(F.sum("n").cast("long").alias("__t"))
    sppmi = F.greatest(
        F.lit(0.0),
        F.log(F.col("n").cast("double"))
        + F.log(F.col("__t").cast("double"))
        - F.log(F.col("__mw").cast("double"))
        - F.log(F.col("__mc").cast("double"))
        - F.log(F.lit(float(shift_k))),
    )
    return (
        cells.filter(F.col("n") >= min_count)
        .join(
            marg.select(F.col("w").alias("w1"), F.col("__m").alias("__mw")),
            "w1",
        )
        .join(
            marg.select(F.col("w").alias("w2"), F.col("__m").alias("__mc")),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n", F.round(sppmi, 6).alias("sppmi"))
        .orderBy(F.desc("sppmi"), F.asc("w1"), F.asc("w2"))
        .limit(top_k)
    )


def source_simpson(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Simpson diversity of each source's word distribution — the
    collision-probability view of vocabulary concentration (entropy's
    integer-exact sibling): the UNBIASED estimator

        λ̂ = Σ n_i(n_i−1) / (N(N−1))

    is the probability two tokens drawn without replacement are the
    same word. Reported with its two standard faces: gini_simpson
    (1−λ, "diversity") and inv_simpson (1/λ, the effective number of
    equally-common words — the vocabulary-size number that is robust
    to Heaps-law tails, unlike raw type counts).

    Every term is an exact integer (decimal(38,0) products), so the
    only float operations are the two final divisions — no vocabulary
    cap needed and nothing to quantize. One corpus explode→aggregate
    keyed (source, word); everything after runs on the aggregate.
    """
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))
    sw = (
        docs.select(F.col(source_col).alias("source"), F.explode(ws).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    d = "decimal(19,0)"
    g = sw.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("n").cast(d) * (F.col("n") - F.lit(1)).cast(d))
        .cast("decimal(38,0)")
        .alias("__s2"),
    )
    nn = F.col("n_tokens").cast(d)
    den = (nn * (F.col("n_tokens") - F.lit(1)).cast(d)).cast("decimal(38,0)")
    lam = F.try_divide(F.col("__s2").cast("double"), den.cast("double"))
    return g.filter(F.col("n_tokens") > 1).select(
        "source",
        "n_tokens",
        "n_types",
        F.round(lam, 6).alias("simpson"),
        F.round(F.lit(1.0) - lam, 6).alias("gini_simpson"),
        F.round(F.try_divide(F.lit(1.0), lam), 6).alias("inv_simpson"),
    )
