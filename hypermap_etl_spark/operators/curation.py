"""Training-corpus curation operators: the filters a pretraining data
pipeline runs between raw text and the training set.

  repetition_stats   Gopher-style repetition filters: duplicate word /
                     n-gram fractions + most-common-2-gram character
                     share (Rae et al. 2021 §A1.1 heuristics).
  tag_pii/redact_pii regex PII detection + masking (Dolma-style
                     taggers) — email / phone / SSN-shaped ids.
  decontaminate      benchmark decontamination by 13-gram overlap
                     (GPT-3 appendix C / PaLM-style n-gram collision).
  segment_dedup      C4-style duplicate-span removal: corpus-wide
                     first-occurrence-wins over fixed word windows
                     (Raffel et al. 2020 used 3-sentence spans; the
                     fixture text has no sentence marks, so the span
                     unit is a fixed word window).
  normalize_text     control-strip / Unicode NFC / accent-strip /
                     case-fold / whitespace-collapse canonicalization.

All built-in column expressions (split/slice/regexp/md5), zero Python
on the hot path — except normalize_text's Unicode step, which is the
one operation Spark's built-ins cannot express: Arrow-batched with a
vectorized ASCII fast path. Every formula is engine-reproducible so
the DuckDB oracle verifies bit-for-bit.

Scale notes inline per op. The common theme: per-row array math stays
map-side; the only shuffles are keyed by doc_id or by a fixed-width
md5 of the span text (never by raw variable-length text).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hypermap_etl_spark.operators.textstats import word_shingles, words


def _ws(text_col: str) -> Column:
    return F.filter(words(F.lower(F.col(text_col))), lambda w: w != F.lit(""))


# ------------------------------------------------------ repetition stats ----

def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher repetition signals per document.

    dup_word_frac / dup_2gram_frac / dup_3gram_frac are pure array math
    (1 - distinct/total) — map-side only. The most-common-2-gram share
    needs a corpus-independent per-doc mode: one explode + one hash
    aggregation keyed (doc_id, gram) + a per-doc top-1 window. Keys are
    near-unique (doc_id is), so there is no skew; the explode output is
    ~n_words rows per doc, the same order as tokenization itself.

    top_2gram_frac = min(1, occurrences * len(gram) / len(text)) — the
    fraction of characters covered by repetitions of the most frequent
    2-gram (ties broken gram-ascending; clamped because overlapping
    occurrences can claim more characters than the doc has). Docs with
    < 2 words report ('', 0).
    """
    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            F.round((n - F.size(F.array_distinct(arr))) / n, 6)
        )

    # each array built once in its own projection: dup_frac references
    # its array twice, and shingle construction is a non-cheap HOF that
    # codegen does not subexpression-eliminate — the alias keeps the
    # optimizer from inlining (CollapseProject declines on non-cheap
    # exprs referenced more than once) so every array is one build/row
    arrays = docs.select(
        "doc_id",
        F.length(F.lower(F.col(text_col))).alias("__n_chars"),
        _ws(text_col).alias("__ws"),
        word_shingles(F.lower(F.col(text_col)), 2).alias("__g2"),
        word_shingles(F.lower(F.col(text_col)), 3).alias("__g3"),
    )
    base = arrays.select(
        "doc_id",
        F.size("__ws").cast("long").alias("n_words"),
        dup_frac(F.col("__ws")).alias("dup_word_frac"),
        dup_frac(F.col("__g2")).alias("dup_2gram_frac"),
        dup_frac(F.col("__g3")).alias("dup_3gram_frac"),
    )

    grams = arrays.select(
        "doc_id",
        F.col("__n_chars").alias("n_chars"),
        F.explode("__g2").alias("gram"),
    )
    counts = grams.groupBy("doc_id", "n_chars", "gram").agg(
        F.count(F.lit(1)).alias("occ")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("occ").desc(), F.col("gram").asc())
    top = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_2gram"),
            # overlapping occurrences ("a a a" → "a a"×2) can claim more
            # characters than the doc has; a coverage fraction caps at 1
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("occ") * F.length("gram") / F.greatest("n_chars", F.lit(1)),
                ),
                6,
            ).alias("top_2gram_frac"),
        )
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "dup_word_frac",
        "dup_2gram_frac",
        "dup_3gram_frac",
        F.coalesce("top_2gram", F.lit("")).alias("top_2gram"),
        F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
    )


# ------------------------------------------------------------------ PII ----

# Simple-dialect patterns (identical under Java regex and RE2): no
# backreferences, no lookaround, no \d shorthand-class surprises.
EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PHONE_RE = "555-[0-9]{3}-[0-9]{4}"
SSN_RE = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
# ordered masking: phone first (its fixed 555- prefix can never appear
# inside an SSN-shaped id, and masking it removes the digits an SSN
# scan would otherwise have to skip), then SSN, then email
_MASKS = [(PHONE_RE, "<PHONE>"), (SSN_RE, "<SSN>"), (EMAIL_RE, "<EMAIL>")]


def tag_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counts (Dolma-style tagger output): non-
    overlapping regex match counts for email / phone / SSN-shaped
    spans + an any-hit flag. Pure projection — no shuffle, no Python.
    """
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long")
    n_phone = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).cast("long")
    n_ssn = F.size(F.regexp_extract_all(t, F.lit(SSN_RE), 0)).cast("long")
    return docs.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_phone.alias("n_phones"),
        n_ssn.alias("n_ssns"),
        ((n_email + n_phone + n_ssn) > 0).alias("has_pii"),
    )


def luhn_valid(number: Column) -> Column:
    """Luhn mod-10 checksum over a digits-only string column — the
    validity filter that separates real card numbers from arbitrary
    digit runs (the Dolma-style precision upgrade to regex-only CC
    tagging: ~90% of random 16-digit runs fail Luhn, so validating
    candidates cuts false-positive redactions by that factor).

    Pure nested-HOF column expression (split to chars → indexed
    transform → aggregate fold): from the RIGHTMOST digit, every
    second digit doubles (minus 9 when > 9); valid iff the sum ≡ 0
    mod 10. No shuffle, no UDF; engine-replayable in SQL. NULL/empty
    or non-digit input yields NULL (cast failure under the transform
    is avoided by the caller extracting digit runs)."""
    rev = F.reverse(number)
    chars = F.slice(F.split(rev, ""), 1, F.length(rev))
    terms = F.transform(
        chars,
        lambda c, i: F.when(
            i % 2 == 0, c.try_cast("int")
        ).otherwise(
            F.when(
                c.try_cast("int") * 2 > 9, c.try_cast("int") * 2 - 9
            ).otherwise(c.try_cast("int") * 2)
        ),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return F.when(F.length(number) > 0, total % 10 == 0)


def _pii_masked(t: Column) -> Column:
    """The PII mask chain as a bare expression — ONE definition shared
    by redact_pii and curate_pipeline (which rewrites the text column
    in place instead of joining redact_pii's projection back to the
    corpus). Ordering documented at _MASKS."""
    for pat, repl in _MASKS:
        t = F.regexp_replace(t, pat, repl)
    return t


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask every PII span with a typed placeholder. Global replace,
    one projection; ordering documented at _MASKS."""
    return docs.select("doc_id", _pii_masked(F.col(text_col)).alias("redacted"))


# -------------------------------------------------------- decontamination ----

def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination by n-gram collision (the GPT-3/PaLM
    recipe, default n=13): a training document is contaminated if it
    shares any word n-gram with any benchmark document.

    Output: (doc_id, n_hits, contaminated) for EVERY train doc —
    n_hits = number of distinct benchmark n-grams found in the doc.

    Scale shape: the benchmark probe set is distinct n-grams of the
    (small, fixed) eval suites — broadcast it; the train side explodes
    to distinct-per-doc n-grams and inner-joins, so the shuffle-free
    plan is scan → explode → broadcast-join → partial count. Grouping
    keys for the final count are doc_id only. A 100 TB corpus streams
    through one map-side pass; nothing is proportional to corpus size
    but the scan itself.
    """
    probes = (
        bench.select(F.explode(word_shingles(F.lower(F.col(text_col)), n)).alias("gram"))
        .distinct()
    )
    train_grams = train.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(F.lower(F.col(text_col)), n))).alias("gram"),
    )
    hits = (
        train_grams.join(F.broadcast(probes), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# --------------------------------------------------------- segment dedup ----

def segment_dedup(
    docs: DataFrame, seg_words: int = 10, text_col: str = "text"
) -> DataFrame:
    """C4-style duplicate-span removal over fixed word windows: split
    each doc into non-overlapping ``seg_words``-word segments; a
    segment occurring more than once corpus-wide keeps only its FIRST
    occurrence in (doc_id, seg_idx) order.

    Output: (doc_id, seg_idx, n_seg_words, keep).

    Scale shape: one map-side explode (array slicing of the token
    array, tokenized once), then ONE shuffle keyed by md5(segment) —
    fixed 32-byte keys, never the variable-length text — for the
    first-occurrence window. Duplicate-heavy corpora skew toward hot
    segment keys only as far as real duplication exists; the md5 key
    space is otherwise uniform.
    """
    ws = _ws(text_col)
    n = F.size(ws)
    n_segs = F.ceil(n / F.lit(float(seg_words))).cast("long")
    seg = F.slice(F.col("__ws"), F.col("seg_idx").cast("int") * seg_words + 1, seg_words)
    segs = (
        docs.select("doc_id", ws.alias("__ws"), n_segs.alias("__k"))
        .filter(F.col("__k") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__k") - 1)).alias("seg_idx"),
            F.col("__ws"),
        )
        .select(
            "doc_id",
            "seg_idx",
            F.size(seg).cast("long").alias("n_seg_words"),
            F.md5(F.array_join(seg, " ")).alias("__key"),
        )
    )
    w = Window.partitionBy("__key").orderBy("doc_id", "seg_idx")
    return (
        segs.withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "seg_idx", "n_seg_words", "keep")
    )


# ---------------------------------------------- importance resampling ----

def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much its hashed n-gram feature distribution looks
    like the TARGET corpus rather than the raw corpus. Downstream,
    sample raw docs proportional to exp(weight) (or keep the top
    fraction) to shift a web-scale corpus toward a quality domain.

    Features are word unigrams + bigrams hashed into ``n_buckets``
    buckets (md5-based so any SQL engine reproduces the bucketing
    bit-for-bit); both corpus distributions are add-one smoothed. A
    doc's weight is the sum over its feature OCCURRENCES of
    log10(p_target(b) / p_raw(b)), rounded to 6 dp.

    Scale shape: two map-combined bucket-count aggregates (n_buckets
    rows each — thousands, not corpus-sized), one broadcast of the
    log-ratio table back onto the raw feature stream, one per-doc sum.
    The corpus shuffles only doc-keyed partial sums; the two scalar
    totals are tiny driver actions on the PERSISTED count frames. The
    raw corpus is read twice (a counting pass and a scoring pass) —
    the paper's own shape; a production run would persist the hashed
    feature stream between the passes if memory allows. Plan pinned in
    tests/test_plans.py::test_dsir_ratio_table_broadcasts.
    """
    def grams(df: DataFrame) -> DataFrame:
        ws = _ws(text_col)
        gs = F.concat(ws, word_shingles(F.lower(F.col(text_col)), 2))
        return df.select(id_col, F.explode(gs).alias("__g")).select(
            id_col,
            F.pmod(
                F.conv(F.substring(F.md5("__g"), 1, 8), 16, 10).cast("bigint"),
                F.lit(n_buckets),
            ).alias("__b"),
        )

    from hypermap_etl_spark.util import tracked_persist

    raw_g = grams(raw)
    tgt_g = grams(target)
    # persist the two n_buckets-row count frames: each is consumed
    # twice (its total + the ratio join), and without the persist the
    # total collects AND the scoring job would each re-run the full
    # corpus gram scan from lineage (3 raw + 2 target passes instead
    # of the documented one counting pass per corpus)
    raw_ct = tracked_persist(raw_g.groupBy("__b").agg(F.count(F.lit(1)).alias("__cr")))
    tgt_ct = tracked_persist(tgt_g.groupBy("__b").agg(F.count(F.lit(1)).alias("__ct")))
    t_raw = raw_ct.agg(F.sum("__cr")).collect()[0][0] or 0
    t_tgt = tgt_ct.agg(F.sum("__ct")).collect()[0][0] or 0
    ratio = (
        raw_ct.join(tgt_ct, "__b", "left")
        .select(
            "__b",
            (
                F.log10(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + 1)
                    / F.lit(float(t_tgt + n_buckets))
                )
                - F.log10((F.col("__cr") + 1) / F.lit(float(t_raw + n_buckets)))
            ).alias("__lr"),
        )
    )
    return (
        raw_g.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            (F.round(F.sum("__lr"), 6) + F.lit(0.0)).alias("dsir_weight"),
        )
    )


# ------------------------------------------------------ text normalization ----

# Non-whitespace C0/C1-adjacent controls. \x09-\x0D (tab/newline-class)
# are deliberately NOT here: they are whitespace and belong to the
# collapse step, and removing \x0B/\x0C up front ALSO reconciles the
# one character where Java's \s ([ \t\n\x0B\f\r]) and RE2's \s
# ([\t\n\f\r ]) disagree, so the Spark and DuckDB collapse regexes see
# identical inputs.
_CONTROL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    form: str | None = "NFC",
    strip_accents: bool = False,
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    out_col: str = "norm_text",
) -> DataFrame:
    """Canonical text normalization — the first stage of every real
    ingest pipeline (the reference normalizes label bytes to UTF-8 with
    a '' fallback, /root/reference/src/lib/services/events.ts:134; this
    is the corpus-scale generalization).

    Steps, in order:
      1. strip non-whitespace control characters (JVM regexp, codegen);
      2. Unicode-normalize to ``form`` (NFC/NFKC/NFD/NFKD) and/or drop
         combining marks (``strip_accents``: NFD → remove category Mn →
         re-normalize, byte-identical to DuckDB's strip_accents on NFC
         input — verified for Latin, Hangul and singleton compositions);
      3. ``lowercase`` (JVM);
      4. collapse ASCII whitespace runs to one space + trim (JVM).

    Scale shape: steps 1/3/4 are whole-stage-codegen column expressions.
    Step 2 is the one Python stage, Arrow-batched, with a vectorized
    ASCII fast path — pure-ASCII batches (the overwhelming majority of
    a web corpus) return without touching unicodedata, so the Python
    cost is proportional to the non-ASCII subset, not the corpus. With
    ``form=None`` and ``strip_accents=False`` no Python stage is
    planned at all.
    """
    t: Column = F.col(text_col)
    t = F.regexp_replace(t, _CONTROL_RE, "")

    if form is not None or strip_accents:
        from pyspark.sql.functions import pandas_udf

        _form = form

        @pandas_udf("string")
        def _unorm(s: pd.Series) -> pd.Series:
            import unicodedata

            mask = s.notna() & s.str.contains(r"[^\x00-\x7F]", regex=True)
            if not mask.any():
                return s

            def one(x: str) -> str:
                if _form is not None:
                    x = unicodedata.normalize(_form, x)
                if strip_accents:
                    x = "".join(
                        c
                        for c in unicodedata.normalize("NFD", x)
                        if unicodedata.category(c) != "Mn"
                    )
                    x = unicodedata.normalize(_form or "NFC", x)
                return x

            out = s.copy()
            out[mask] = s[mask].map(one)
            return out

        t = _unorm(t)

    if lowercase:
        t = F.lower(t)
    if collapse_whitespace:
        t = F.trim(F.regexp_replace(t, "\\s+", " "))
    return docs.select("doc_id", t.alias(out_col))


# ----------------------------------------------------- C4 line-grain clean ----

# terminal punctuation a retained line must end with (C4 §2.2: period,
# exclamation, question mark, closing quote)
_C4_TERMINAL_RE = '[.!?"”]$'


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    line_min_words: int = 5,
    min_lines: int = 3,
    newline: str = "\n",
) -> DataFrame:
    """C4's line-grain page cleaning (Raffel et al. 2020 §2.2), the
    step BEFORE document-level filters: split the page into lines, keep
    only lines that end in terminal punctuation, have ≥
    ``line_min_words`` words, and don't mention javascript; drop the
    whole page when it contains 'lorem ipsum' or a curly brace, or
    fewer than ``min_lines`` lines survive.

    Output: (doc_id, clean_text, n_lines_in, n_lines_kept, page_kept) —
    clean_text is the kept lines rejoined (NULL when the page drops),
    so the keep/drop decision AND the surviving text are auditable in
    one pass.

    Scale shape: pure JVM higher-order functions (split → filter lambda
    → array_join) — per-row array math, map-side only, no shuffle, no
    Python. The line arrays live only inside the projection; nothing
    wider than the page itself is ever materialized.
    """
    t = F.col(text_col)
    # CRLF hardening: with the default newline, split on \r?\n AND
    # trim a trailing \r (end-of-text CR with no LF) — otherwise kept
    # lines end in \r, Java's $ (which matches before a final line
    # terminator) diverges from RE2's end-of-text $, and array_join
    # re-embeds the stray CR into clean_text. split()'s pattern is a
    # regex, so a custom newline is matched escaped-literally.
    import re as _re

    split_pat = "\\r?\\n" if newline == "\n" else _re.escape(newline)
    if newline == "\n":
        t = F.regexp_replace(t, "\\r$", "")
    lines = F.split(t, F.lit(split_pat))
    kept = F.filter(
        lines,
        lambda ln: (
            ln.rlike(_C4_TERMINAL_RE)
            & (
                F.size(F.filter(F.split(ln, " "), lambda w: w != F.lit("")))
                >= F.lit(line_min_words)
            )
            & ~F.lower(ln).contains("javascript")
        ),
    )
    page_ok = (
        (F.size(kept) >= F.lit(min_lines))
        & ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
    )
    return docs.select(
        "doc_id",
        F.when(page_ok, F.array_join(kept, newline)).alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines_in"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        page_ok.alias("page_kept"),
    )


# ------------------------------------------------------- HTML extraction ----

# Entity decode order is the standard one: named/numeric entities
# first, '&amp;' LAST — otherwise '&amp;lt;' would double-decode to
# '<'. Each pair is a literal replace (JVM StringReplace, codegen).
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

# Block-level boundaries that become line breaks when the tag soup is
# stripped — so 'one</p><p>two' reads 'one\ntwo', not 'one two' glued
# to whatever headline preceded it.
_HTML_BLOCK_RE = r"(?i)<(?:br|hr|/p|/div|/li|/ul|/ol|/h[1-6]|/tr|/table|/blockquote|/pre)[^>]*>"


def html_to_text(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "extracted_text",
) -> DataFrame:
    """Tag-soup → visible text: the extraction stage between a raw
    crawl (WARC/HTML) and every text filter in this module — C4 and
    CCNet both start from exactly this step (Raffel et al. 2020 §2.2
    runs its line filters on extracted text, not markup).

    Pipeline, in order, each a whole-stage-codegen JVM expression:
      1. drop <!-- comments -->, <script>…</script>, <style>…</style>
         (including their CONTENT — script/style text is never prose);
      2. block-level closing tags and <br>/<hr> become newlines, so
         paragraph structure survives for line-grain filters (c4_clean
         consumes the output directly);
      3. every remaining tag is stripped to a space (inline tags like
         <b> must not weld words together);
      4. the six ubiquitous HTML entities decode ('&amp;' last, the
         standard order that prevents double-decoding);
      5. whitespace canonicalization: runs containing a newline
         collapse to one '\\n', residual space/tab runs to one ' ',
         leading/trailing whitespace trimmed.

    Regex subset is deliberately RE2-safe (non-greedy + inline (?is)
    flags, no backreferences or lookaround) so the DuckDB oracle can
    replay the chain verbatim. Not a browser: CDATA, conditional
    comments, and malformed nesting degrade to stripped text rather
    than erroring — skip-don't-fail, the reference's decode posture
    (/root/reference/src/lib/services/events.ts:130-140).

    Scale shape: scan → project, no shuffle, no Python; at 100 TB the
    extraction cost is the scan itself.
    """
    t: Column = F.col(text_col)
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", "")
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", "")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", "")
    t = F.regexp_replace(t, _HTML_BLOCK_RE, "\n")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"[ \t\r]*\n[\s]*", "\n")
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    t = F.regexp_replace(t, r"^\s+|\s+$", "")
    return docs.select("doc_id", t.alias(out_col))


# -------------------------------------------------- quality bucketing ----

def quality_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    score_col: str = "mean_logprob",
    group_cols: tuple[str, ...] = ("lang",),
    method: str = "ntile",
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §3.3): rank
    every document within its group (language, source, ...) by a
    quality score — higher is better, e.g. :func:`textstats.
    bigram_logprob`'s mean_logprob — and assign quantile buckets
    1 (head) .. n (tail). The bucket label then drives sampling policy
    (train on head+middle, down-weight tail) without re-scoring.

    Output: input columns + ``bucket``. NULL scores (unscorable docs)
    land in the tail bucket. Ordering is (score DESC, doc_id ASC), so
    buckets are deterministic under ties.

    Two physical strategies:
      - ``method='ntile'`` — exact SQL NTILE per group. One shuffle on
        the group key, a per-group sort. Exact, but a group is sorted
        as a unit: right when groups are languages/sources (hundreds),
        wrong when one group is most of the corpus.
      - ``method='threshold'`` — per-group exact percentile cut points
        (a model-sized frame: groups × (n-1) doubles) broadcast back,
        bucket assigned map-side by comparing against the cuts. No
        per-group sort of the corpus — the 100 TB path. Differs from
        NTILE only at exact-tie/boundary rows (NTILE splits equal
        scores across a boundary by row position; thresholds cannot).
    """
    if n_buckets < 2:
        raise ValueError("quality_buckets: need n_buckets >= 2")
    if method not in ("ntile", "threshold"):
        raise ValueError(f"quality_buckets: unknown method {method!r}")
    gcols = list(group_cols)
    s = F.col(score_col)
    if method == "ntile":
        w = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy(
            s.desc_nulls_last(), F.col("doc_id").asc()
        )
        # NULL scores pin to the tail AFTER ranking (nulls sort last,
        # so non-null assignments are unchanged) — keeping the
        # documented invariant and agreement with method='threshold'
        return scored.withColumn(
            "bucket",
            F.when(s.isNull(), F.lit(n_buckets)).otherwise(
                F.ntile(n_buckets).over(w)
            ),
        )
    # threshold: cuts at the (1 - k/n) quantiles, k = 1..n-1 (score
    # DESC, so the top 1/n of scores sit above cut 1). Exact
    # interpolated percentile over the group — one hash aggregate whose
    # output is groups x (n-1) doubles.
    fracs = [1.0 - k / n_buckets for k in range(1, n_buckets)]
    cuts = scored.filter(s.isNotNull()).groupBy(*gcols).agg(
        F.percentile(s, F.array([F.lit(f) for f in fracs])).alias("__cuts")
    )
    joined = (
        scored.join(F.broadcast(cuts), gcols, "left")
        if gcols
        else scored.crossJoin(F.broadcast(cuts))
    )
    bucket = F.when(s.isNull() | F.col("__cuts").isNull(), F.lit(n_buckets)).otherwise(
        F.lit(1)
        + F.aggregate(
            "__cuts",
            F.lit(0),
            lambda acc, c: acc + F.when(s < c, 1).otherwise(0),
        )
    )
    return joined.withColumn("bucket", bucket.cast("int")).drop("__cuts")


# ------------------------------------------------- sentence-grain C4 ----

# a sentence = a maximal run of non-terminal chars + its terminal
# punctuation run (or end-of-text for an unterminated tail). RE2-safe:
# no lookaround, so the DuckDB oracle replays it verbatim.
_SENTENCE_RE = "[^.!?]+(?:[.!?]+|$)"


def split_sentences(text: Column) -> Column:
    """Sentence array from a text column: regex-extracted terminal-punct
    runs, trimmed, empties dropped. The cheap rule-based splitter every
    C4-style pipeline uses — abbreviation-blind by design (a 100 TB
    filter favors a reproducible rule over a language model)."""
    return F.filter(
        # NOTE: an explicit lambda, not bare F.trim — trim's optional
        # second parameter makes PySpark's HOF arity inspection pass
        # (element, index), silently turning it into trim-by-chars
        F.transform(
            F.regexp_extract_all(text, F.lit(_SENTENCE_RE), F.lit(0)),
            lambda s: F.trim(s),
        ),
        lambda s: s != F.lit(""),
    )


def sentence_segment_dedup(
    docs: DataFrame,
    n_sent: int = 3,
    stride: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """C4's dedup at its ACTUAL grain (Raffel et al. 2020 §2.2:
    "we discarded all but one of any three-sentence span occurring
    more than once") — :func:`segment_dedup` approximates with fixed
    word windows for corpora without sentence marks; this is the
    faithful construction for text that has them.

    Windows of ``n_sent`` sentences start every ``stride`` sentences
    (default ``n_sent`` — non-overlapping tiling; ``stride=1`` is the
    paper's sliding detection). A window occurring more than once
    corpus-wide keeps only its first occurrence in (doc_id, seg_idx)
    order.

    Output: (doc_id, seg_idx, n_sentences, keep).

    Scale shape: identical to segment_dedup — sentences are split
    map-side ONCE per doc, windows are array slices under one explode,
    and the only shuffle is keyed by md5(window text) (fixed 32-byte
    keys). ``stride < n_sent`` multiplies exploded rows by
    n_sent/stride, nothing else.
    """
    if n_sent < 1:
        raise ValueError("sentence_segment_dedup: need n_sent >= 1")
    stride = n_sent if stride is None else stride
    if not 1 <= stride <= n_sent:
        raise ValueError("sentence_segment_dedup: need 1 <= stride <= n_sent")
    sents = split_sentences(F.col(text_col))
    k = F.size(F.col("__sents"))
    # windows start at 0, stride, 2·stride, … while start < k
    n_windows = F.ceil(k / F.lit(float(stride))).cast("long")
    seg = F.slice(
        F.col("__sents"), F.col("seg_idx").cast("int") * stride + 1, n_sent
    )
    segs = (
        docs.select("doc_id", sents.alias("__sents"))
        .filter(F.size("__sents") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_windows - 1)
            ).alias("seg_idx"),
            F.col("__sents"),
        )
        .select(
            "doc_id",
            "seg_idx",
            F.size(seg).cast("long").alias("n_sentences"),
            F.md5(F.array_join(seg, " ")).alias("__key"),
        )
    )
    w = Window.partitionBy("__key").orderBy("doc_id", "seg_idx")
    return segs.withColumn("keep", F.row_number().over(w) == 1).select(
        "doc_id", "seg_idx", "n_sentences", "keep"
    )


# --------------------------------------------------- Gopher quality rules ----

# Gopher §A1.1's stop-word presence check uses exactly these eight
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_types: int = 2,
) -> DataFrame:
    """The full Gopher document-quality rule table (Rae et al. 2021
    §A1.1) — the repetition half lives in :func:`repetition_stats`;
    this is the other half, the structural screens:

      word count ∈ [min, max]; mean word length ∈ [3, 10];
      symbol-to-word ratio ('#' or '…'/'...') ≤ 0.1; lines starting
      with a bullet ≤ 90%; lines ending in an ellipsis ≤ 30%; words
      with ≥ 1 alphabetic character ≥ 80%; ≥ 2 distinct Gopher stop
      words present.

    Output: doc_id, the seven measured signals (floats rounded to 6),
    and ``keep`` (the conjunction). Every signal is a pure column
    expression over ONE tokenization and ONE line split — scan →
    project, no shuffle, no Python; the DuckDB oracle replays each
    formula bit-for-bit.
    """
    t = F.lower(F.col(text_col))
    lines_all = F.split(F.col(text_col), "\n")
    # words split on WHITESPACE runs (not the single-space _ws): the
    # input is multi-line by construction (the bullet/ellipsis rules
    # need lines), and a single-space split would weld line-final and
    # line-initial words into one token — hiding stop words and
    # distorting every word statistic
    ws = F.filter(F.split(t, "\\s+"), lambda w: w != F.lit(""))
    docs = docs.select(
        "doc_id",
        ws.alias("__ws"),
        F.filter(
            F.transform(lines_all, lambda ln: F.trim(ln)),
            lambda ln: ln != F.lit(""),
        ).alias("__lines"),
        # both ellipsis forms count; replace-all semantics make
        # occurrence counts engine-reproducible
        (
            (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
            + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
            + (F.length(t) - F.length(F.replace(t, F.lit("\u2026"), F.lit(""))))
        ).alias("__n_sym"),
    )
    n_words = F.size("__ws")
    nz = F.greatest(n_words, F.lit(1))
    n_lines = F.greatest(F.size("__lines"), F.lit(1))
    mean_wl = F.aggregate("__ws", F.lit(0), lambda a, w: a + F.length(w)) / nz
    bullet = F.size(
        F.filter(
            F.col("__lines"),
            lambda ln: ln.startswith("-") | ln.startswith("*") | ln.startswith("•"),
        )
    ) / n_lines
    ellipsis = F.size(
        F.filter(F.col("__lines"), lambda ln: ln.endswith("...") | ln.endswith("…"))
    ) / n_lines
    alpha = F.size(F.filter(F.col("__ws"), lambda w: w.rlike("[a-z]"))) / nz
    stop_arr = F.array([F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(stop_arr, F.array_distinct(F.col("__ws"))))
    m = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(F.col("__n_sym") / nz, 6).alias("symbol_ratio"),
        F.round(bullet, 6).alias("bullet_frac"),
        F.round(ellipsis, 6).alias("ellipsis_frac"),
        F.round(alpha, 6).alias("alpha_frac"),
        n_stop.cast("int").alias("n_stop_types"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("n_stop_types") >= min_stop_types)
    )
    return m.withColumn("keep", keep)


# ------------------------------------------------------ pseudonymization ----

def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    prefix_len: int = 16,
) -> DataFrame:
    """Deterministic keyed pseudonymization of identifier columns:
    value → first ``prefix_len`` hex chars of sha256(salt || value).
    The retention-side counterpart of :func:`redact_pii` — text masking
    destroys linkage, but an ANALYTICS corpus needs user/session ids
    that still join and group without exposing the raw identifier.
    Same salt + value → same token (joins/cohorts survive across
    tables and drops); without the salt the mapping is not
    practically invertible for high-entropy ids. For LOW-entropy ids
    (sequential integers) a keeper of the salt can brute-force the
    mapping — this is pseudonymization (linkable, salt-secret), NOT
    anonymization; pick retention policy accordingly.

    NULLs stay NULL (they carry no identity). Pure projection —
    sha256 is JVM-side and engine-reproducible, so the oracle
    verifies tokens bit-for-bit.
    """
    if not cols:
        raise ValueError("pseudonymize: need at least one column")
    if not 8 <= prefix_len <= 64:
        raise ValueError("pseudonymize: need 8 <= prefix_len <= 64")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"pseudonymize: columns not in frame: {missing}")
    out = df
    for c in cols:
        tok = F.substring(
            F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")), 256),
            1,
            prefix_len,
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), tok))
    return out


def boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate mining, the CCNet paragraph-hash
    screen at line grain (Wenzek et al. 2020 §3.2 dedups paragraphs
    seen across a shard; a site's nav/header/footer/cookie banner is
    exactly the text that recurs across ITS OWN pages): a line is
    boilerplate when its trimmed form appears in >= ``min_docs``
    DISTINCT documents of the SAME source. Returns (source, line_hash,
    n_docs) for the flagged lines.

    Empty (all-whitespace) lines are never flagged — they are
    formatting, not boilerplate, and stripping them would silently
    reflow every paragraph.

    Scale shape: one explode -> per-(source, doc, hash) distinct (the
    within-doc repeat collapses map-side) -> one (source, hash) count.
    The shuffle carries 16-byte md5 keys, never line text.
    """
    if min_docs < 2:
        raise ValueError("boilerplate_lines: min_docs must be >= 2")
    lines = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
    ).select(
        "source", "__doc", F.md5(F.trim(F.col("__line"))).alias("line_hash"),
        F.trim(F.col("__line")).alias("__t"),
    ).filter(F.col("__t") != "").drop("__t")
    return (
        lines.distinct()
        .groupBy("source", "line_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    docs: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove cross-document boilerplate lines from every document:
    (id, source, cleaned text, n_dropped). Line order is preserved
    (posexplode index, array_sort on reassembly); empty lines always
    survive. A document that was ALL boilerplate comes back with
    text = '' — downstream length filters (train_filter / c4_clean)
    are the right place to drop it, not a silent row deletion here.

    Scale shape: :func:`boilerplate_lines`' two shuffles, plus the
    (source, hash)-keyed anti join and one doc-keyed reassembly
    aggregate. Four exchanges total, each carrying hashes or line
    text once — the floor for order-preserving surgery keyed by a
    cross-document statistic.
    """
    bp = boilerplate_lines(docs, min_docs, text_col, source_col, id_col)
    pos = docs.select(
        F.col(id_col).alias("__doc"),
        F.col(source_col).alias("source"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).withColumn("line_hash", F.md5(F.trim(F.col("__line"))))
    kept = pos.join(
        bp.select("source", "line_hash"), ["source", "line_hash"], "left_anti"
    )
    rebuilt = kept.groupBy("__doc", "source").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias(text_col),
        F.count(F.lit(1)).cast("long").alias("__n_kept"),
    )
    base = docs.select(
        F.col(id_col).alias("__doc"),
        F.col(source_col).alias("source"),
        (F.size(F.split(F.col(text_col), "\n"))).cast("long").alias("__n_all"),
    )
    # left join so an all-boilerplate document survives as text = ''
    return base.join(rebuilt, ["__doc", "source"], "left").select(
        F.col("__doc").alias(id_col),
        "source",
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        (F.col("__n_all") - F.coalesce(F.col("__n_kept"), F.lit(0))).alias(
            "n_dropped"
        ),
    )


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney
    2002): every row must share its quasi-identifier tuple with at
    least k-1 others, or the "anonymized" release still singles people
    out by (zip, birthday, gender)-style joins. The audit half of the
    privacy family (redact_pii scrubs surface strings, pseudonymize
    protects identity columns; THIS measures what the remaining
    columns still leak).

    One summary row: (k, n_rows, n_groups, min_group_size,
    rows_at_risk, groups_at_risk, is_k_anonymous). NULL quasi values
    form their own group (SQL GROUP BY semantics — a NULL zip is
    itself a signature).

    Scale shape: ONE map-combinable hash aggregate keyed by the quasi
    tuple, then a tiny second aggregate over group sizes. The quasi
    key-space, not the table, bounds the shuffle.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity: quasi_cols must be non-empty")
    missing = [c for c in quasi_cols if c not in df.columns]
    if missing:
        raise ValueError(f"k_anonymity: columns not in frame: {missing}")
    if k < 2:
        raise ValueError("k_anonymity: k must be >= 2")
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__n"))
    return groups.agg(
        F.lit(int(k)).cast("long").alias("k"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("__n").cast("long").alias("min_group_size"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0))
        .cast("long")
        .alias("groups_at_risk"),
        (F.min("__n") >= k).alias("is_k_anonymous"),
    )


def k_suppress(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """Suppression baseline: drop every row whose quasi-identifier
    group has fewer than k members — the simplest release that
    :func:`k_anonymity` will certify. (Generalization hierarchies
    beat suppression on utility but need domain taxonomies; the
    caller can pre-coarsen columns — truncate zips, bucket ages —
    then suppress the remainder.)

    Scale shape: the group-size aggregate joined back semi-style on
    the quasi key — two exchanges on the same key; Catalyst reuses
    the partitioning for the join.
    """
    if k < 2:
        raise ValueError("k_suppress: k must be >= 2")
    big = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= k)
        .select(*[F.col(c).alias(f"__k_{c}") for c in quasi_cols])
    )
    # NULL-SAFE equality: k_anonymity's GROUP BY treats NULL as its own
    # group, so a NULL-keyed group of size >= k must survive too — a
    # plain equi-join would silently drop it (NULL never equals NULL)
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
        cond = eq if cond is None else (cond & eq)
    return df.join(big, cond, "left_semi")


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007): k-anonymity's
    blind spot is a group whose SENSITIVE value is uniform — group
    membership then discloses the attribute even at k=1000. Each
    quasi-identifier group must see at least ``l`` distinct sensitive
    values.

    One summary row: groups, minimum distinct-sensitive count, groups/
    rows below l, verdict. NULL sensitive values are excluded from the
    distinct count (missingness is not diversity); NULL quasi tuples
    group together, as in :func:`k_anonymity`.

    Scale shape: one (quasi, sensitive) distinct-style aggregate, then
    a groups-sized rollup — both map-combined, keyed by the quasi
    tuple. No windows, no collect.
    """
    if l < 2:
        raise ValueError("l_diversity: l must be >= 2")
    per = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.count_distinct(F.col(sensitive_col)).cast("long").alias("__d"),
    )
    return per.agg(
        F.lit(l).cast("long").alias("l"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("__d").cast("long").alias("min_diversity"),
        F.sum(F.when(F.col("__d") < l, F.col("__n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
        F.sum(F.when(F.col("__d") < l, 1).otherwise(0))
        .cast("long")
        .alias("groups_at_risk"),
        (F.min("__d") >= l).alias("is_l_diverse"),
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third rung of the privacy ladder: :func:`k_anonymity` bounds
    group SIZE, :func:`l_diversity` bounds sensitive-value VARIETY,
    and both miss a group whose sensitive DISTRIBUTION is skewed
    (99% one disease in a diverse-looking group still discloses).
    Each quasi group's sensitive distribution must sit within
    variational distance ``t`` of the global one:
    d(g) = ½ Σ_s |p_g(s) − p(s)|, over ALL global sensitive values
    (a value absent from the group contributes its full global mass).

    Numerics — the audit is EXACT: d(g) = D_g / (2·n_g·n) with
    D_g = Σ_s |n_gs·n − n_s·n_g| a pure integer (decimal(38,0)
    accumulation), and the at-risk comparison d(g) > t runs as
    D_g·den > 2·num·n_g·n with t an exact Fraction — no float
    threshold anywhere; only the reported max distance rounds.

    Scale shape: one (quasi, sensitive) corpus aggregate; the
    groups × values grid (zero cells INCLUDED — the chi2 lesson)
    derives from it with the value marginals broadcast (sensitive
    attributes are low-cardinality by definition); then a groups-
    sized rollup. NULL sensitive rows are excluded; NULL quasi
    tuples group together, as in the siblings.

    Output one row: (t, n_rows, n_groups, n_sensitive_values,
    max_t_distance, groups_at_risk, rows_at_risk, is_t_close).
    """
    from fractions import Fraction

    frac = Fraction(str(t))
    if not 0 < frac < 1:
        raise ValueError("t_closeness: t must be in (0, 1)")
    num, den = frac.numerator, frac.denominator
    base = df.filter(F.col(sensitive_col).isNotNull())
    gs = base.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("__ngs")
    )
    per_g = gs.groupBy(*quasi_cols).agg(
        F.sum("__ngs").cast("long").alias("__ng")
    )
    glob = gs.groupBy(sensitive_col).agg(
        F.sum("__ngs").cast("long").alias("__ns")
    )
    tot = glob.agg(F.sum("__ns").cast("long").alias("__n"))
    d38 = "decimal(38,0)"
    grid = (
        per_g.crossJoin(F.broadcast(glob))
        .join(gs, [*quasi_cols, sensitive_col], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            *quasi_cols,
            "__ng",
            "__n",
            F.abs(
                F.coalesce(F.col("__ngs"), F.lit(0)).cast(d38)
                * F.col("__n").cast(d38)
                - F.col("__ns").cast(d38) * F.col("__ng").cast(d38)
            ).alias("__term"),
        )
    )
    per_group = grid.groupBy(*quasi_cols, "__ng", "__n").agg(
        F.sum("__term").cast(d38).alias("__d")
    )
    dist = F.col("__d").cast("double") / (
        F.lit(2.0) * F.col("__ng").cast("double") * F.col("__n").cast("double")
    )
    at_risk = (
        F.col("__d") * F.lit(den)
        > F.lit(2 * num) * F.col("__ng").cast(d38) * F.col("__n").cast(d38)
    )
    n_vals = glob.agg(F.count(F.lit(1)).cast("long").alias("__v"))
    return (
        per_group.agg(
            F.round(F.lit(float(frac)), 6).alias("t"),
            F.sum("__ng").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.round(F.max(dist), 6).alias("max_t_distance"),
            F.sum(F.when(at_risk, 1).otherwise(0))
            .cast("long")
            .alias("groups_at_risk"),
            F.sum(F.when(at_risk, F.col("__ng")).otherwise(F.lit(0)))
            .cast("long")
            .alias("rows_at_risk"),
            (F.sum(F.when(at_risk, 1).otherwise(0)) == 0).alias("is_t_close"),
        )
        .crossJoin(F.broadcast(n_vals))
        .select(
            "t",
            "n_rows",
            "n_groups",
            F.col("__v").alias("n_sensitive_values"),
            "max_t_distance",
            "groups_at_risk",
            "rows_at_risk",
            "is_t_close",
        )
    )


def keyword_tags(
    docs: DataFrame, keywords: list[str], text_col: str = "text"
) -> DataFrame:
    """Dictionary-based topic/domain tagging: per (doc, keyword) hit
    counts for a broadcast keyword list, word-boundary matched — the
    curation step that routes documents to domain buckets (code /
    medical / legal ...) from curated term lists.

    One projection computes ALL keyword counts per row (k regexp_count
    columns over the lowered text — the text is scanned once per
    keyword but never duplicated), then a stack() unpivot emits the
    sparse (doc_id, keyword, n_hits > 0) rows. Everything JVM-side;
    no join, no shuffle, output is hit-sparse. For dictionaries beyond
    a few hundred terms the right construction is an Aho-Corasick
    automaton in an Arrow-batched UDF (one text pass total); this
    literal-column form is the broadcast-dictionary fast path.

    Keywords must be word-like ([a-z0-9_]+, lowercase) — enforced, so
    no regex metacharacter can leak into the pattern.
    """
    import re as _re

    if not keywords:
        raise ValueError("keywords must be non-empty")
    ks = sorted(set(keywords))
    for k in ks:
        if not _re.fullmatch(r"[a-z0-9_]+", k):
            raise ValueError(f"keyword must match [a-z0-9_]+: {k!r}")
    lowered = F.lower(F.col(text_col))
    counts = docs.select(
        "doc_id",
        *[
            F.regexp_count(lowered, F.lit(rf"\b{k}\b"))
            .cast("long")
            .alias(f"__k{i}")
            for i, k in enumerate(ks)
        ],
    )
    pairs = ", ".join(f"'{k}', __k{i}" for i, k in enumerate(ks))
    return (
        counts.selectExpr(
            "doc_id", f"stack({len(ks)}, {pairs}) as (keyword, n_hits)"
        )
        .filter(F.col("n_hits") > 0)
    )


def _aho_corasick(keywords: list[str]):
    """Build the Aho-Corasick automaton (goto/fail/output tables) as
    plain dicts — driver-side, once, O(Σ|kw|); shipped to executors in
    the UDF closure (dictionary-sized, like a broadcast)."""
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for ki, kw in enumerate(keywords):
        s = 0
        for ch in kw:
            if ch not in goto[s]:
                goto.append({})
                out.append([])
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        out[s].append(ki)
    from collections import deque

    fail = [0] * len(goto)
    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        for ch, t in goto[s].items():
            q.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
            out[t] = out[t] + out[fail[t]]
    return goto, fail, out


def keyword_tags_large(
    docs: DataFrame, keywords: list[str], text_col: str = "text"
) -> DataFrame:
    """keyword_tags' scale path: ONE pass over each text for the WHOLE
    dictionary via an Aho-Corasick automaton inside an Arrow-batched
    mapInPandas — for term lists beyond the few hundred where one
    regexp_count column per keyword stops making sense. Same contract
    as keyword_tags (word-boundary, lowercase, sparse hits) — the unit
    tests pin the two paths equal.

    Scale shape: automaton built once on the driver (O(dictionary)),
    shipped in the closure; executors stream Arrow batches, so memory
    is batch-bounded; output is the same sparse rows. No shuffle. The
    word-boundary check is a neighbor-char test at each match, exactly
    regex \\b for the enforced [a-z0-9_]+ alphabet.
    """
    import re as _re

    if not keywords:
        raise ValueError("keywords must be non-empty")
    ks = sorted(set(keywords))
    for k in ks:
        if not _re.fullmatch(r"[a-z0-9_]+", k):
            raise ValueError(f"keyword must match [a-z0-9_]+: {k!r}")
    goto, fail, out = _aho_corasick(ks)
    word = set("abcdefghijklmnopqrstuvwxyz0123456789_")

    def scan(batches):
        for pdf in batches:
            recs: dict[tuple, int] = {}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                if text is None:
                    continue
                t = text.lower()
                s = 0
                for pos, ch in enumerate(t):
                    while s and ch not in goto[s]:
                        s = fail[s]
                    s = goto[s].get(ch, 0)
                    for ki in out[s]:
                        start = pos - len(ks[ki]) + 1
                        if start > 0 and t[start - 1] in word:
                            continue
                        if pos + 1 < len(t) and t[pos + 1] in word:
                            continue
                        key = (doc_id, ks[ki])
                        recs[key] = recs.get(key, 0) + 1
            yield pd.DataFrame(
                [(d, k, n) for (d, k), n in recs.items()],
                columns=["doc_id", "keyword", "n_hits"],
            )

    # output schema inherits the caller's doc_id type — keyword_tags
    # preserves it, so the "same contract" claim must hold here too
    id_type = docs.schema["doc_id"].dataType.simpleString()
    return docs.select("doc_id", text_col).mapInPandas(
        scan, f"doc_id {id_type}, keyword string, n_hits long"
    )


# UTF-8 bytes re-decoded as Latin-1/cp1252 leave signature pairs: the
# 2-byte Latin range becomes U+00C3/U+00C2 followed by a continuation
# char (U+0080-00BF), 3-byte punctuation becomes U+00E2 U+20AC + one
# more (cp1252 maps byte 0x80 to the euro sign), and lossy decodes
# leave U+FFFD. Spelled in \\x{...} regex escapes — pure ASCII source,
# identical syntax in Java regex and RE2.
MOJIBAKE_RE = (
    "\\x{00C3}[\\x{0080}-\\x{00BF}]"
    "|\\x{00C2}[\\x{0080}-\\x{00BF}]"
    "|\\x{00E2}\\x{20AC}."
    "|\\x{FFFD}"
)


def mojibake_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-corruption screen: count mojibake signatures (UTF-8
    read as Latin-1/cp1252 — the single most common corruption in web
    crawls) per document and flag any hit. A clean corpus reports all
    zeros; a systematically corrupt source lights up at ~1 hit per
    accented word, which is the signal to re-decode the source rather
    than filter documents.

    Pure projection (one regexp_count per row) — no shuffle, no
    Python; the pattern is engine-identical so oracles replay it.
    """
    t = F.col(text_col)
    n = F.regexp_count(t, F.lit(MOJIBAKE_RE)).cast("long")
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        n.alias("n_mojibake"),
        F.round(
            F.when(F.length(t) > 0, n / F.length(t)).otherwise(F.lit(0.0)), 6
        ).alias("mojibake_rate"),
        (n > 0).alias("is_corrupt"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    sensitivity: int = 1,
    salt: str = "dp",
) -> DataFrame:
    """Laplace-mechanism plumbing for differentially private release
    of grouped counts: noisy_n = n + Lap(sensitivity/epsilon), the
    third privacy face next to k_anonymity (suppress) and pseudonymize
    (tokenize) -- release aggregate statistics instead.

    HONESTY NOTE (same posture as the multimodal codec stub): noise
    here is drawn by the DETERMINISTIC md5 inverse-CDF so tests and
    the DuckDB oracle can reproduce it bit-for-bit -- a fixed seed is
    NOT differential privacy (the mechanism's privacy proof needs
    fresh randomness per release). What this operator certifies is
    everything around the draw: the b = sensitivity/epsilon
    calibration, the inverse-CDF transform
    u -> -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|), NULL-group handling,
    and the one-aggregate scale shape. Production swaps the seed
    expression for `rand()` -- one line, same plan.

    Scale: ONE map-combined hash aggregate; the noise expression is
    per-GROUP arithmetic on the aggregate rows.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0: {epsilon}")
    if sensitivity < 1:
        raise ValueError(f"sensitivity must be >= 1: {sensitivity}")
    per = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    key = F.concat_ws(
        ":",
        F.lit(salt),
        *[F.coalesce(F.col(c).cast("string"), F.lit(" ")) for c in group_cols],
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )
    b = float(sensitivity) / float(epsilon)
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return per.select(
        *group_cols,
        F.round(F.col("n") + noise, 6).alias("noisy_n"),
        F.lit(b).alias("laplace_b"),
    )


def balanced_class_sample(
    df: DataFrame,
    label_col: str,
    id_col: str,
    salt: str = "bal",
) -> DataFrame:
    """Deterministic class-rebalancing sampler: downsample every class
    to the size of the SMALLEST class — the classifier-training
    preparation step — with no randomness and no approximation. A row
    survives iff

        md5_int64(salt:id) · n_class  <  n_min · 2³²

    evaluated in exact decimal(38,0) integer arithmetic (md5_int64 is
    the first 8 hex chars), so the keep decision is a pure function of
    (id, class sizes): reproducible across runs, layouts, AND engines
    — no float threshold anywhere, unlike rand()-based samplers whose
    output is irreproducible and sampleBy whose fractions are floats.

    Expected kept per class ≈ n_min (hash-binomial, not exact-k; the
    smallest class keeps everything since the inequality becomes
    u < 2³², always true). Returns the surviving rows with
    __n_class / __n_min dropped.

    Scale shape: one count aggregate, one broadcast join of the
    class-size table, one map-side filter. No shuffle of the data.
    """
    sizes = df.groupBy(label_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n_class")
    )
    nmin = sizes.agg(F.min("__n_class").alias("__n_min"))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt),
                    F.lit(":"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    keep = u * F.col("__n_class").cast("decimal(38,0)") < (
        F.col("__n_min").cast("decimal(38,0)")
        * F.lit(4294967296).cast("decimal(38,0)")
    )
    return (
        df.join(F.broadcast(sizes), label_col)
        .crossJoin(F.broadcast(nmin))
        .filter(keep)
        .drop("__n_class", "__n_min")
    )
