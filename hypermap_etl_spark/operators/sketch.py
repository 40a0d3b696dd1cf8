"""Mergeable cardinality sketches (beyond-reference, north-star set).

KMV (k-minimum-values) distinct-count sketch: hash every value to
[0, 1); keep the k smallest distinct hashes per group; estimate
|distinct| ≈ (k-1) / kth_smallest. Standard analysis (Bar-Yossef et
al. 2002; Beyer et al. 2007): relative error ≈ 1/sqrt(k-2).

Why KMV alongside HyperLogLog: Spark ships approx_count_distinct
(HLL++) already — the point of this operator is the MERGEABLE SKETCH
as data: the k-smallest-hash set is a value you can store per
partition/day and fold (union two sketches = k smallest of the union)
without rescanning history, the property a 100 TB incremental pipeline
needs. And with md5 as the hash it is bit-reproducible in any SQL
engine, so the driver gate can verify it exactly — which HLL's
engine-internal hashing never could.

The hll_* trio below covers the other half of that trade: Spark's
native hll_sketch_agg / hll_union_agg / hll_sketch_estimate emit and
fold Apache DataSketches HLL sketches as BINARY columns — the
industry-standard portable sketch format (readable by Druid, Hive,
the PostgreSQL datasketches extension), entirely JVM-side. The exact
estimate is not SQL-reproducible in another engine, so its driver
gate certifies a DERIVED property (estimate within a fixed relative
error of the exact count — the emb_lsh_recall pattern) and unit tests
pin mergeability (union-of-parts ≈ build-of-whole within a fraction
of the standard error) and partition tolerance. The estimate is NOT
bit-stable across merge trees: Datasketches unions drop the
stream-order HIP estimator, so different partitionings/rollup shapes
wobble by ~SE/2 — which is exactly why the gate asserts a tolerance,
never the estimate value.

Scale shape: one (group, value) distinct aggregation (map-side
combine), then a per-group top-k window over the distinct hashes —
shuffles keyed by group (+ uniform md5), never a collect_set that
would hold a whole group's values in one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# md5's first 8 hex chars as a uniform fraction in [0, 1)
_HASH_SPACE = float(1 << 32)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
    n_salts: int = 32,
) -> DataFrame:
    """The KMV sketch ITSELF as rows: per group, the k smallest
    distinct md5 fractions of ``value_col`` — group_cols + ``__frac``.

    This is the mergeable summary a 100 TB pipeline stores per
    partition/day: folding two sketches is union + re-top-k
    (:func:`kmv_set_ops` and :func:`kmv_distinct` both run on these
    rows), no rescan of history. md5-based, so any SQL engine
    reproduces it bit-for-bit.

    Two-stage top-k: a single per-group window would sort EVERY
    distinct hash of a group on one task — with few groups (the common
    sketching shape) that is one monster sort at 100 TB. Stage 1 keeps
    the k smallest per (group, salt) cell in parallel; stage 2 merges
    the ≤ n_salts*k survivors per group. Identical output: the global
    k smallest are each the minimum of their salt cell's k smallest.
    The salt is a deterministic value hash, so results (and the
    oracle) are unaffected by the physical split.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    frac = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(_HASH_SPACE)
    )
    hashes = (
        df.select(*group_cols, F.col(value_col))
        .filter(F.col(value_col).isNotNull())  # count distinct NON-NULL,
        # like count(DISTINCT x); also avoids NULLS FIRST/LAST ordering
        # divergence between engines in the top-k window
        .distinct()
        .select(
            *group_cols,
            frac.alias("__frac"),
            F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(n_salts)).alias(
                "__salt"
            ),
        )
    )
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy("__frac")
    stage1 = (
        hashes.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w = Window.partitionBy(*group_cols).orderBy("__frac")
    return (
        stage1.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_set_ops(
    sketch: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV set algebra over per-group sketches (Beyer et al. 2007,
    SIGMOD — 'On synopses for distinct-value estimation under multiset
    operations'): for every unordered group pair, estimate
    |A ∪ B|, |A ∩ B| and the Jaccard similarity from the two k-minimum
    -value sketches ALONE — no second pass over the data.

    Construction per pair: L = the k smallest fractions of
    L_A ∪ L_B (dedup by fraction — same fraction ⇒ same value for a
    shared hash function); ρ = |{h ∈ L : h ∈ L_A ∧ h ∈ L_B}| / |L| is
    an unbiased Jaccard estimator; |A∪B| ≈ (k−1)/kth(L) (exact when
    the union sketch holds the whole union); |A∩B| ≈ ρ·|A∪B|.

    Input: rows from :func:`kmv_sketch` (``group_col`` + ``__frac``).
    Output per pair (g_a < g_b): n_kept, union_est, n_common,
    jaccard_est (round 6), inter_est.

    Scale shape: sketches are ≤ k rows per group, so every join here
    runs on summary-sized frames (G·k rows) — broadcastable whatever
    the corpus size; the per-pair window sorts ≤ 2k rows. The corpus
    was touched once, by kmv_sketch.
    """
    g = F.col(group_col)
    a = sketch.select(g.alias("g_a"), F.col("__frac").alias("__frac"))
    b = sketch.select(g.alias("g_b"), F.col("__frac").alias("__frac"))
    groups = sketch.select(g.alias("__g")).distinct()
    pairs = (
        groups.select(F.col("__g").alias("g_a"))
        .join(
            F.broadcast(groups.select(F.col("__g").alias("g_b"))),
            F.col("g_a") < F.col("g_b"),
        )
    )
    pa = pairs.join(F.broadcast(a), "g_a").select(
        "g_a", "g_b", "__frac", F.lit(1).alias("__in_a"), F.lit(0).alias("__in_b")
    )
    pb = pairs.join(F.broadcast(b), "g_b").select(
        "g_a", "g_b", "__frac", F.lit(0).alias("__in_a"), F.lit(1).alias("__in_b")
    )
    u = (
        pa.unionByName(pb)
        .groupBy("g_a", "g_b", "__frac")
        .agg(F.max("__in_a").alias("__in_a"), F.max("__in_b").alias("__in_b"))
    )
    w = Window.partitionBy("g_a", "g_b").orderBy("__frac")
    topk = u.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    agg = topk.groupBy("g_a", "g_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.round(F.max("__frac"), 9).alias("__kth"),
        F.sum(F.col("__in_a") * F.col("__in_b")).cast("long").alias("n_common"),
    )
    union_est = (
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(F.floor((k - 1) / F.col("__kth")))
        .cast("long")
    )
    jac = F.round(F.col("n_common") / F.col("n_kept").cast("double"), 6)
    # single rounding at the end — floor(ρ_rounded · U) would bias the
    # exact-regime case down (e.g. 5/15·15 → 4); products of long-range
    # ints in double are exact, so round-0 then cast is engine-identical
    inter = F.round(
        F.col("n_common") * union_est.cast("double") / F.col("n_kept"), 0
    ).cast("long")
    return agg.select(
        "g_a",
        "g_b",
        "n_kept",
        union_est.alias("union_est"),
        "n_common",
        jac.alias("jaccard_est"),
        inter.alias("inter_est"),
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
    n_salts: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: group_cols + (n_kept, kth_frac, est_distinct) where
    n_kept = min(k, true distinct), kth_frac = the largest retained
    hash fraction, and est_distinct = exact count when the group has
    fewer than k distinct values (the sketch IS the distinct set
    then), else floor((k-1)/kth_frac). Runs on :func:`kmv_sketch`
    rows (see there for the two-stage top-k scale shape).
    """
    kept = kmv_sketch(df, value_col, group_cols, k=k, n_salts=n_salts)
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.round(F.max("__frac"), 9).alias("kth_frac"),
        )
        .select(
            *group_cols,
            "n_kept",
            "kth_frac",
            F.when(F.col("n_kept") < k, F.col("n_kept"))
            .otherwise(F.floor((k - 1) / F.col("kth_frac")))
            .cast("long")
            .alias("est_distinct"),
        )
    )


# ------------------------------------------------------- Bloom filter ----

# 63 usable bits per BIGINT word: bit 63 is unreachable because
# 1 << 63 overflows signed 64-bit in ANSI engines (DuckDB raises);
# capping at 62 keeps every mask positive and bit-identical everywhere.
_BLOOM_BITS_PER_WORD = 63


def _bloom_hashes(value_col: str) -> list:
    """KM double hashing from md5: two 32-bit halves of the digest."""
    val = F.col(value_col).cast("string")
    h1 = F.conv(F.substring(F.md5(val), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(val), 9, 8), 16, 10).cast("long")
    return [h1.alias("__h1"), h2.alias("__h2")]


def _pos_sql(i: int, m_bits: int) -> str:
    return f"pmod(__h1 + {i}L * __h2, {m_bits}L)"


def bloom_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    m_words: int = 4,
    k_hashes: int = 4,
) -> DataFrame:
    """Mergeable Bloom-filter sketch per group: m_words BIGINT words
    (63 usable bits each), k_hashes bit positions per value via
    Kirsch-Mitzenmacher double hashing on md5 — bit-reproducible in
    any SQL engine, like the KMV sketch above.

    Output: group_cols + w0..w{m-1} + n_values. Merging two sketches
    of the same shape = per-word bitwise OR (+ n_values sum) — the
    fold a per-partition/per-day incremental pipeline stores and ORs
    without rescanning history. False-positive rate for n values:
    (1 - exp(-k*n/m_bits))^k; size the words for the expected group.

    Scale shape: one map-side pass computes each value's word masks
    (the variable-shift bit math is generated as SQL expression
    strings — PySpark's shiftleft only accepts literal shift counts),
    then ONE hash aggregate with bit_or per word (map-side partial
    combine; the shuffle carries m_words longs per group per task).
    Explicit floor() for the word index: DuckDB casts float->int by
    rounding while Spark truncates; floor of a nonnegative quotient
    is identical everywhere.
    """
    group_cols = group_cols or []
    m_bits = m_words * _BLOOM_BITS_PER_WORD
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, *_bloom_hashes(value_col)
    )
    words = []
    for j in range(m_words):
        terms = " | ".join(
            f"(CASE WHEN CAST(floor({_pos_sql(i, m_bits)} / {_BLOOM_BITS_PER_WORD}.0) AS INT) = {j} "
            f"THEN shiftleft(1L, CAST({_pos_sql(i, m_bits)} % {_BLOOM_BITS_PER_WORD} AS INT)) "
            f"ELSE 0L END)"
            for i in range(k_hashes)
        )
        words.append(F.expr(f"({terms})").alias(f"__w{j}"))
    masked = hashed.select(*group_cols, *words)
    aggs = [F.bit_or(f"__w{j}").alias(f"w{j}") for j in range(m_words)] + [
        F.count(F.lit(1)).alias("n_values")
    ]
    if group_cols:
        return masked.groupBy(*group_cols).agg(*aggs)
    return masked.agg(*aggs)


def bloom_contains(
    probes: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_words: int = 4,
    k_hashes: int = 4,
) -> DataFrame:
    """Probe values against a SINGLE-row (ungrouped) bloom_build sketch:
    adds an `in_bloom` flag — true iff all k bits are set (no false
    negatives; false positives at the designed rate, deterministic
    because the hash is). The one-row sketch broadcasts; the probe is
    a map-side conjunction of bit tests."""
    m_bits = m_words * _BLOOM_BITS_PER_WORD
    cols = probes.columns
    joined = probes.crossJoin(F.broadcast(bloom)).select(
        "*", *_bloom_hashes(value_col)
    )
    tests = []
    for i in range(k_hashes):
        word = " ".join(
            f"WHEN CAST(floor({_pos_sql(i, m_bits)} / {_BLOOM_BITS_PER_WORD}.0) AS INT) = {j} THEN w{j}"
            for j in range(m_words)
        )
        tests.append(
            f"(((CASE {word} END) & "
            f"shiftleft(1L, CAST({_pos_sql(i, m_bits)} % {_BLOOM_BITS_PER_WORD} AS INT))) <> 0L)"
        )
    return joined.select(*cols, F.expr(" AND ".join(tests)).alias("in_bloom"))


# ---------------------------------------------------- count-min sketch ----

def cms_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Mergeable count-min sketch (Cormode & Muthukrishnan 2005) in
    LONG format: one row per (group, d, bucket) with the bucket's
    count. Point-query estimate for x = min over d of
    count[d][h_d(x)] — an overestimate only (collisions add), within
    ε·N with probability 1-δ for width = e/ε, depth = ln(1/δ).

    Why long format and not a 2-D array column: the rows ARE the
    merge — summing cnt on (group, d, bucket) folds any number of
    per-partition/per-day sketches without rescanning history, using
    nothing but a hash aggregate; and DuckDB reproduces every row
    because bucket placement is Kirsch-Mitzenmacher double hashing on
    md5 (same scheme as bloom_build above), not an engine-internal
    hash.

    Scale shape: a map-side projection computes the depth buckets per
    row (inline posexplode of a literal-sized array — no shuffle), then
    ONE hash aggregate keyed by (group, d, bucket); the shuffle carries
    at most depth × width rows per group per task after map-side
    combine, independent of input size.
    """
    group_cols = group_cols or []
    val = F.col(value_col).cast("string")
    h1 = F.conv(F.substring(F.md5(val), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(val), 9, 8), 16, 10).cast("long")
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.posexplode(
            F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(width)) for i in range(depth)])
        ).alias("d", "bucket"),
    )
    return rows.groupBy(*group_cols, "d", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_estimate(
    probes: DataFrame,
    cms: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query a SINGLE (ungrouped) cms_build sketch for each probe
    value: adds `est_count` = min over rows d of the probed bucket's
    count (0 if a bucket row is absent — an empty bucket proves count
    0). The sketch is at most depth × width rows, so it broadcasts and
    the probe is a map-side hash join + one small re-aggregation keyed
    by the probe row."""
    val = F.col(value_col).cast("string")
    h1 = F.conv(F.substring(F.md5(val), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(val), 9, 8), 16, 10).cast("long")
    cols = probes.columns
    exploded = probes.select(
        *cols,
        F.posexplode(
            F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(width)) for i in range(depth)])
        ).alias("d", "bucket"),
    )
    joined = exploded.join(F.broadcast(cms), ["d", "bucket"], "left")
    return (
        joined.groupBy(*cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_count"))
    )


def cms_join_estimate(
    cms_a: DataFrame, cms_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches over
    the join key: |A ⋈ B| ≈ min over d of Σ_bucket A[d][b]·B[d][b]
    (the CM inner product, Cormode & Muthukrishnan 2005 §4.2). Always
    an OVERESTIMATE of the true join size (collisions only add mass);
    within true + ε·N_A·N_B with probability 1-δ for ε = e/width,
    δ = e^-depth.

    This is the join planner's pre-flight: both sides sketch in one
    map-combined pass each (cms_build), and the estimate itself joins
    two ≤ depth×width-row frames — broadcast-sized whatever the input
    was, so choosing shuffle strategy / salting for a 100 TB join
    costs two cheap scans instead of running the join to see.

    Products accumulate in DECIMAL(38,0): two billion-row sides can
    put the inner product past int64. Missing (d, bucket) pairs on
    either side contribute zero; a depth row with NO shared buckets
    makes the whole estimate 0 (correct: some h_d separates the key
    sets perfectly, so they share no keys).
    """
    j = cms_a.alias("a").join(cms_b.alias("b"), ["d", "bucket"])
    per_d = j.groupBy("d").agg(
        F.sum(
            F.col("a.cnt").cast("decimal(38,0)")
            * F.col("b.cnt").cast("decimal(38,0)")
        ).alias("ip")
    )
    ds = (
        cms_a.sparkSession.range(depth)
        .select(F.col("id").cast("int").alias("d"))
    )
    full = ds.join(F.broadcast(per_d), "d", "left").select(
        F.coalesce(F.col("ip"), F.lit(0).cast("decimal(38,0)")).alias("ip")
    )
    return full.agg(F.min("ip").cast("long").alias("est_join_rows"))


# ------------------------------------------- hash-sampled quantiles ----

def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    key_col: str,
    rate: float = 0.25,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group quantile estimates over a DETERMINISTIC md5 row sample
    — the sample itself is the mergeable sketch: hash-thresholding on a
    unique row key commutes with union (sample(A ∪ B) = sample(A) ∪
    sample(B)), so per-partition/per-day samples concatenate without
    rescanning history, unlike engine-internal reservoir sampling.
    Standard error ~ 1/sqrt(rate·n) quantile density; crank ``rate``
    per group size.

    Exact interpolated percentiles over the sample (Spark percentile ≡
    DuckDB quantile_cont on DOUBLE), so the whole estimate is
    bit-reproducible in any SQL engine. One map-side filter + one hash
    aggregate; the shuffle carries only sampled rows.
    """
    frac = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )
    sampled = df.filter(F.col(value_col).isNotNull() & (frac < rate))
    plist = ", ".join(str(p) for p in probs)
    agg = sampled.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, array({plist}))").alias("__q"),
        F.count(F.lit(1)).alias("n_sample"),
    )
    qcols = [
        F.round(F.col("__q")[i], 6).alias(f"q_{str(p).replace('.', '_')}")
        for i, p in enumerate(probs)
    ]
    return agg.select(*group_cols, *qcols, "n_sample")


def hll_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-group Apache DataSketches HLL sketch over ``value_col``
    (nulls excluded), as a storable BINARY ``hll`` column plus the
    group's observed row count ``n_rows``.

    This is the fine-grain build a 100 TB pipeline runs once per
    partition/day: the output is a model-sized sketch TABLE (one row
    per group, ~2^lg_k bytes each) that replaces re-scanning history —
    roll it up with :func:`hll_merge` at query time. lg_k=12 gives
    ~1.6% standard error (Datasketches HLL: 1.04/sqrt(2^lg_k)).

    The value is cast to string before sketching so the same logical
    value sketches identically regardless of the column's physical
    type (int vs bigint vs string), making stored sketches stable
    across schema widenings. Entirely JVM-side: one hash aggregate
    with map-side combine; the shuffle carries one sketch per
    (partition, group) cell, never the values.
    """
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.hll_sketch_agg(
                F.col(value_col).cast("string"), F.lit(lg_k)
            ).alias("hll"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def hll_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold stored HLL sketches to coarser groups (day → month,
    (type, day) → type). The merged REGISTER state is the
    max-per-bucket of the parts (associative, commutative, split-
    invariant); the ESTIMATE read from it can differ from a direct
    build of the union by a fraction of the standard error, because
    Datasketches unions drop the single-stream HIP estimator — pinned
    within 0.25·SE by tests/test_sketch.py::test_hll_merge_equals_whole.

    Shuffles only sketch rows (model-sized), never the original data.
    """
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg("hll").alias("hll"),
        F.sum("n_rows").alias("n_rows"),
    )


def hll_estimate(sketches: DataFrame) -> DataFrame:
    """Append the distinct-count estimate (``est_distinct`` BIGINT) to
    a sketch table; keeps the binary sketch column so the row remains
    mergeable downstream."""
    return sketches.withColumn("est_distinct", F.hll_sketch_estimate("hll"))


# ------------------------------------------------ Misra-Gries top items ----

def _mg_compress(counters: dict, k: int) -> dict:
    """Reduce a counter dict to ≤ k entries: subtract the (k+1)-th
    largest count from everything, drop non-positives — the mergeable-
    summaries reduction (Agarwal et al. 2012, Thm 1): each reduction's
    total decrement is what keeps the global undercount ≤ n/(k+1)."""
    if len(counters) <= k:
        return counters
    off = sorted(counters.values(), reverse=True)[k]
    return {v: c - off for v, c in counters.items() if c > off}


def mg_summaries(df: DataFrame, value_col: str, k: int = 16) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ k (item, cnt) rows per
    input partition. Arrow-batched — each batch contributes its exact
    pandas value_counts (an error-free summary), merged into the
    partition's running ≤ k counters; never a per-row Python loop.
    NULL items are ignored (COUNT semantics)."""
    vals = df.select(F.col(value_col).cast("string").alias("item"))

    def gen(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item, c in pdf["item"].dropna().value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            counters = _mg_compress(counters, k)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "cnt": list(counters.values())}
            )

    return vals.mapInPandas(gen, "item string, cnt long")


def mg_topk(df: DataFrame, value_col: str, k: int = 16) -> DataFrame:
    """Mergeable frequent-items sketch (Misra-Gries 1982 / "mergeable
    summaries", Agarwal et al. 2012): find every item occurring more
    than n/(k+1) times — in bounded memory, REGARDLESS of how many
    distinct items the stream holds. The exact groupBy is preferable
    when the item dictionary fits a shuffle; this is the operator for
    the other case (URLs/user-ids at crawl scale), and the per-day
    summary is storable and foldable without rescanning history.

    Output: ≤ k (item, est_count) rows. est_count is a LOWER bound
    with true_count - n/(k+1) ≤ est_count ≤ true_count after any merge
    tree — so every true heavy hitter (> n/(k+1)) is guaranteed
    present. est_count itself depends on the partition/merge layout
    (only the BOUND is layout-invariant), which is why the driver gate
    certifies the derived containment/error property, never raw
    estimates.

    Scale shape: one Arrow map pass emitting ≤ k rows per partition,
    one hash aggregate over the ≤ k·P-row summary union, and a
    driver-side reduction of ≤ k·P counters (model-sized, the
    centroid-pull pattern) re-broadcast as a literal filter.
    """
    if k < 1:
        raise ValueError("mg_topk: need k >= 1")
    return mg_merge_summaries(mg_summaries(df, value_col, k), k)


def mg_merge_summaries(counters: DataFrame, k: int) -> DataFrame:
    """Fold an (item, cnt) counter union back to a ≤ k-entry MG
    summary: sum per item, subtract the (k+1)-th largest, drop
    non-positives. This is the store-side merge a streaming/daily
    summary pipeline calls over persisted per-batch summaries; only
    the offset row count (k+1, TakeOrdered) ever reaches the driver."""
    merged = counters.groupBy("item").agg(F.sum("cnt").alias("cnt"))
    top = merged.orderBy(F.col("cnt").desc(), "item").take(k + 1)
    if len(top) <= k:
        return merged.select("item", F.col("cnt").alias("est_count"))
    off = top[k]["cnt"]
    return merged.filter(F.col("cnt") > off).select(
        "item", (F.col("cnt") - F.lit(off)).alias("est_count")
    )


def approx_quantile_bounds(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    accuracy: int = 1000,
    slack: float = 2.0,
) -> DataFrame:
    """Certify Spark's native approximate percentiles
    (``percentile_approx``, the Greenwald-Khanna sketch) by their RANK
    guarantee: for each requested quantile p, the fraction of values
    <= the sketch's answer must sit within p ± slack/accuracy. The
    estimates themselves are partition/merge-layout-dependent (like
    every mergeable sketch here — the Misra-Gries rule); only the
    bound is invariant, so the gate certifies the derived boolean,
    never the raw estimate.

    Output: one row per p — (p, exact_rank, within_bound) with
    exact_rank the true CDF at the estimate, rounded at 6.

    Scale shape: one aggregate for all the percentiles (the sketch
    merges map-side), a model-sized collect of len(ps) doubles, and
    one counting aggregate against the broadcast literals. Two scans
    total; the exact-CDF pass exists only because this is a
    certificate — production reads just the first aggregate.
    """
    if not ps or not all(0.0 < p < 1.0 for p in ps):
        raise ValueError("approx_quantile_bounds: need 0 < p < 1")
    vals = df.select(F.col(value_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    approx = vals.agg(
        F.percentile_approx("__v", list(ps), accuracy).alias("q")
    ).collect()[0]["q"]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, est in enumerate(approx):
        aggs.append(
            F.sum(F.when(F.col("__v") <= F.lit(float(est)), 1).otherwise(0))
            .cast("long")
            .alias(f"__le_{i}")
        )
    one = vals.agg(*aggs)
    tol = slack / accuracy
    rows = [
        F.struct(
            F.lit(float(p)).alias("p"),
            F.round(F.col(f"__le_{i}") / F.col("__n").cast("double"), 6).alias(
                "exact_rank"
            ),
            (
                F.abs(F.col(f"__le_{i}") / F.col("__n").cast("double") - F.lit(float(p)))
                <= F.lit(tol)
            ).alias("within_bound"),
        )
        for i, p in enumerate(ps)
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
