"""Fuzzy (edit-distance) self-join without a cartesian product.

Entity-resolution primitive: find all pairs of rows whose string key
is within Levenshtein distance 1 (near-identical names, typo'd ids).
The naive form is an O(n²) cross join with a per-pair edit-distance —
the exact shape that dies at scale. This module blocks with DELETION
NEIGHBORHOODS (the FastSS / SymSpell family, Bocek et al. 2007): for
τ=1, ed(s, t) ≤ 1 ⟺ the sets {s} ∪ {s minus one char} and
{t} ∪ {t minus one char} intersect —

  - equal strings share s itself;
  - one substitution at i: deleting position i from both sides yields
    the same string;
  - one insertion/deletion: the shorter string appears verbatim in the
    longer one's deletion set.

so candidates are an EQUI-join on a generated key (L+1 keys per row),
and Levenshtein runs only on candidates. Completeness is exact — no
probabilistic recall argument needed (unlike MinHash banding).

Scale shape: key generation is a map-side higher-order projection
(sequence → transform → explode, all JVM); the join shuffles
(key, id, string) — O(n·L) rows, not O(n²); the verify is a JVM
levenshtein on the (deduplicated) candidate pairs only. Skew guard:
a key shared by m rows yields m² candidates — for natural-language
names m is tiny; for degenerate keys (e.g. all-equal strings) cap with
a pre-aggregated hot-key anti-join like dedup.ngram_jaccard_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _neighborhood_candidates(
    df: DataFrame, id_col: str, str_col: str, max_dist: int = 1
) -> DataFrame:
    """Candidate pairs (id1 < id2, with both strings carried) from the
    deletion-neighborhood equi-join, BEFORE verification.

    ``max_dist`` ∈ {1, 2} — the deletion
    neighborhood D_≤τ(s) (all strings reachable by deleting up to τ
    characters) blocks COMPLETELY for Levenshtein ≤ τ: any alignment
    with e ≤ τ edits yields a common string by deleting, on each side,
    the ≤ τ positions the alignment substitutes/inserts/deletes, so
    D_≤τ(s) ∩ D_≤τ(t) ≠ ∅ whenever ed(s, t) ≤ τ (Bocek et al. 2007,
    FastSS). Spurious collisions (the intersection is a SUPERSET of
    the ≤ τ ball) are removed by the exact bounded levenshtein on
    candidates only.

    Key count is 1 + L for τ=1 and 1 + L + C(L, 2) for τ=2 — the
    documented O(L^τ) growth, ~200 keys for a 20-char name; real
    entity-resolution keys (person/org names) stay short, so the
    blocked join's row count is O(n·L²), never O(n²). τ≥3's cubic
    neighborhoods stop paying for names; raise instead of silently
    building them.
    """
    if max_dist not in (1, 2):
        raise NotImplementedError(
            "deletion-neighborhood blocking covers max_dist in {1, 2}"
        )
    del1 = (
        f"transform(sequence(1, length({str_col})), "
        f"i -> concat(substr({str_col}, 1, i - 1), substr({str_col}, i + 1)))"
    )
    if max_dist == 1:
        keys = F.expr(f"array_union(array({str_col}), {del1})")
    else:
        # two deletions at positions i < j: drop chars i and j —
        # flatten(transform over j of transform over i < j); distinct
        # unions collapse the duplicates (deleting equal chars at
        # different positions can coincide)
        # j starts at 2: sequence(1, j-1) with j=1 would be the
        # DESCENDING [1, 0] (Spark defaults to step -1 when start >
        # stop), injecting bogus i=0 keys
        del2 = (
            f"flatten(transform(sequence(2, length({str_col})), "
            f"j -> transform(sequence(1, j - 1), "
            f"i -> concat(substr({str_col}, 1, i - 1), "
            f"substr({str_col}, i + 1, j - i - 1), "
            f"substr({str_col}, j + 1)))))"
        )
        keys = F.expr(
            f"CASE WHEN length({str_col}) >= 2 THEN "
            f"array_union(array_union(array({str_col}), {del1}), "
            f"array_distinct({del2})) "
            f"ELSE array_union(array({str_col}), {del1}) END"
        )
    keyed = (
        df.filter(F.col(str_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.col(str_col).alias("__s"),
            F.explode(keys).alias("__k"),
        )
    )
    a = keyed.select(
        F.col("__id").alias("id1"), F.col("__s").alias("__s1"), "__k"
    )
    b = keyed.select(
        F.col("__id").alias("id2"), F.col("__s").alias("__s2"), "__k"
    )
    return (
        a.join(b, "__k")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "__s1", "__s2")
        .distinct()
    )


def edit_distance_pairs(
    df: DataFrame, id_col: str, str_col: str, max_dist: int = 1
) -> DataFrame:
    """All pairs (id1 < id2) with levenshtein(s1, s2) <= max_dist —
    the deletion-neighborhood candidates of
    :func:`_neighborhood_candidates` verified by the exact bounded
    levenshtein (threshold form, SPARK-44213: abandons a pair's DP
    once the bound is exceeded, O(max_dist·L) per pair, not O(L²)).
    Output: (id1, id2, dist)."""
    cand = _neighborhood_candidates(df, id_col, str_col, max_dist)
    return cand.select(
        "id1",
        "id2",
        F.levenshtein("__s1", "__s2", max_dist).cast("int").alias("dist"),
    ).filter(F.col("dist") >= 0)


def linkage_scores(
    df: DataFrame,
    id_col: str,
    name_col: str,
    cat_fields: list[tuple[str, float, float]],
    num_col: str | None = None,
    num_tol_cents: int = 50_000,
    w_num: tuple[float, float] = (1.5, -1.0),
    w_name: tuple[float, ...] = (6.5, 3.5, 1.5),
    match_at: float = 8.0,
    possible_at: float = 4.0,
    max_dist: int = 1,
) -> DataFrame:
    """Fellegi–Sunter-style record-linkage scoring over the FastSS
    candidate pairs: each field comparison contributes a log-likelihood
    -ratio weight (agreement positive, disagreement negative), the sum
    classifies the pair match / possible / non_match — the probabilistic
    step that turns edit_distance_pairs' CANDIDATES into decisions
    (Fellegi & Sunter 1969; weights here are caller-supplied priors,
    dyadic by default so every engine reproduces the sums exactly).

    ``cat_fields``: (column, w_agree, w_disagree) per categorical
    field; ``num_col`` compares in exact integer cents within
    ``num_tol_cents``. Name weight: ``w_name[d]`` for name distance d
    (exact / one edit / two edits with the τ=2 candidates), strictly
    decreasing in d as a Fellegi–Sunter agreement weight should be;
    ``max_dist`` picks the candidate radius (1 or 2 — person/org
    corpora routinely need 2 for transposed or doubly-typo'd names).

    Scale shape: candidates come from the blocked equi-join (never
    quadratic); attribute lookup is two keyed joins back to the entity
    table; scoring is pure column arithmetic.
    """
    if len(w_name) < max_dist + 1:
        raise ValueError(
            f"w_name needs a weight per distance 0..{max_dist}, got {w_name}"
        )
    pairs = edit_distance_pairs(df, id_col, name_col, max_dist=max_dist)
    attrs = [num_col] if num_col else []
    attrs += [c for c, _, _ in cat_fields]
    ent = df.select(F.col(id_col), *[F.col(c) for c in attrs])
    a = ent.select(
        F.col(id_col).alias("id1"),
        *[F.col(c).alias(f"__a_{c}") for c in attrs],
    )
    b = ent.select(
        F.col(id_col).alias("id2"),
        *[F.col(c).alias(f"__b_{c}") for c in attrs],
    )
    j = pairs.join(a, "id1").join(b, "id2")
    weight = F.lit(w_name[max_dist])
    for d in range(max_dist - 1, -1, -1):
        weight = F.when(F.col("dist") == d, F.lit(w_name[d])).otherwise(weight)
    out_cols = []
    for c, w_agree, w_dis in cat_fields:
        agree = F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
        weight = weight + F.when(agree, F.lit(w_agree)).otherwise(F.lit(w_dis))
        out_cols.append(agree.alias(f"same_{c}"))
    if num_col:
        cents = lambda side: (  # noqa: E731
            F.col(f"__{side}_{num_col}").cast("decimal(12,2)") * 100
        ).cast("long")
        close = F.abs(cents("a") - cents("b")) <= F.lit(num_tol_cents)
        weight = weight + F.when(close, F.lit(w_num[0])).otherwise(
            F.lit(w_num[1])
        )
        out_cols.append(close.alias(f"close_{num_col}"))
    # verdict thresholds apply to the EXACT weight sum; rounding is
    # output cosmetics only (a caller-supplied non-dyadic weight could
    # otherwise flip a pair sitting within 5e-7 of a threshold)
    verdict = (
        F.when(weight >= match_at, F.lit("match"))
        .when(weight >= possible_at, F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    return j.select(
        "id1",
        "id2",
        F.col("dist").alias("name_dist"),
        *out_cols,
        F.round(weight, 6).alias("weight"),
        verdict.alias("verdict"),
    )


def golden_records(
    entities: DataFrame,
    clusters: DataFrame,
    id_col: str,
    max_cols: list[str] | None = None,
    mode_cols: list[str] | None = None,
) -> DataFrame:
    """Survivorship fusion — the step after linkage that master-data
    pipelines actually ship: collapse each duplicate cluster into ONE
    golden record. ``clusters`` is the (doc_id, cluster_id) frame of
    :func:`hypermap_etl_spark.operators.dedup.duplicate_clusters` over
    the match pairs; entities absent from it survive as their own
    singleton cluster (left join + coalesce), so the output is a
    complete deduplicated master table.

    Fusion rules, per field class:
      - ``max_cols``: keep the maximum (freshest balance, latest
        timestamp — the "most recent wins" rule);
      - ``mode_cols``: keep the most frequent value, ties to the
        smallest (the "majority wins" rule), computed per cluster via
        a count aggregate + one rank window over cluster×distinct-
        value rows — never a corpus window.

    Scale shape: one join to attach cluster ids, one hash aggregate
    for count/max fields, one (cluster, value) aggregate + bounded
    window per mode column, joined back on cluster_id. All keyed by
    cluster id — co-partitioned at scale by the same key.
    """
    from pyspark.sql.window import Window

    max_cols = max_cols or []
    mode_cols = mode_cols or []
    asg = (
        entities.join(
            clusters.withColumnsRenamed(
                {"doc_id": id_col, "cluster_id": "__cl"}
            ),
            id_col,
            "left",
        )
        .withColumn("cluster_id", F.coalesce(F.col("__cl"), F.col(id_col)))
        .drop("__cl")
    )
    out = asg.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
    )
    for c in mode_cols:
        counts = asg.groupBy("cluster_id", c).agg(
            F.count(F.lit(1)).alias("__n")
        )
        pick = Window.partitionBy("cluster_id").orderBy(
            F.col("__n").desc(), F.col(c).asc()
        )
        winner = (
            counts.withColumn("__rn", F.row_number().over(pick))
            .filter(F.col("__rn") == 1)
            .select("cluster_id", F.col(c).alias(f"mode_{c}"))
        )
        out = out.join(winner, "cluster_id")
    return out


def phonetic_key(col) -> "F.Column":
    """American Soundex as a pure column-expression chain — the
    phonetic blocking key (Russell 1918; the classic complement to
    the deletion-neighborhood keys: FastSS catches typos, Soundex
    catches HEARING variants like Smith/Smyth that are edit-distance
    far). Deliberately NOT Spark's builtin ``soundex()``: the
    identical translate → collapse → strip-zeros → pad chain runs in
    both engines, so an oracle reproduces the key character for
    character (the language_id replace-length-trick discipline).

    Steps: keep letters, uppercase; drop H/W after the first letter
    (same-code consonants across H/W collapse, the standard rule);
    map to digit codes; collapse adjacent equal codes INCLUDING the
    first letter's; drop vowels' zeros from the tail; first letter +
    three codes, zero-padded. Empty input keys to ''.
    """
    u = F.upper(F.regexp_replace(col, r"[^A-Za-z]", ""))
    first = F.substring(u, 1, 1)
    body = F.regexp_replace(F.substring(u, 2, 1 << 30), "[HW]", "")
    mapped = F.translate(
        F.concat(first, body),
        "ABCDEFGIJKLMNOPQRSTUVXYZ",
        "012301202245501262301202",
    )
    collapsed = F.regexp_replace(mapped, r"(\d)\1+", "$1")
    tail = F.regexp_replace(F.substring(collapsed, 2, 1 << 30), "0", "")
    return F.when(F.length(u) == 0, F.lit("")).otherwise(
        F.rpad(F.concat(first, F.substring(tail, 1, 3)), 4, "0")
    )


def phonetic_blocks(
    df: DataFrame,
    id_col: str,
    name_col: str,
) -> DataFrame:
    """Blocking-plan report for a Soundex partition of ``name_col``:
    per phonetic key, the member count, the distinct spellings it
    groups, and the candidate-pair cost n(n−1)/2 a within-block join
    would generate — the pre-flight a blocked ER run reads next to
    :func:`blocking_metrics` (which grades a blocking AFTER the fact;
    this prices one BEFORE). One hash aggregate; exact longs.
    """
    key = phonetic_key(F.col(name_col))
    return (
        df.filter(F.col(name_col).isNotNull() & F.col(id_col).isNotNull())
        .groupBy(key.alias("skey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(F.col(name_col)).cast("long").alias("n_names"),
        )
        .withColumn(
            "n_candidate_pairs",
            (F.col("n_rows") * (F.col("n_rows") - 1) / 2).cast("long"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    third classic blocking beside the deletion neighborhoods
    (:func:`edit_distance_pairs`) and :func:`phonetic_key`: sort the
    corpus by a blocking key and emit every pair within ``window``
    positions, catching near-sorted variants ("Jon Smith"/"John
    Smith") that share no exact block. Candidates are O(n·window),
    never quadratic, and independent of key-value skew (a mega-block
    under exact blocking is just more sliding positions here).

    Scale shape: the total order comes from :func:`~hypermap_etl_spark.
    operators.scale.global_rank` (range shuffle + partitioned windows,
    no single-task sort) over (key, id); the within-window pairing is
    the DELTA-JOIN (skipgram_cooc's shape) — each row fans out to
    window−1 shifted rank keys and ONE equi-join on rank recovers
    exactly the pairs at distance < window. No window function over
    corpus rows, no self cross-join.

    Output per pair: (id1, id2, key1, key2, rank_gap), id1 < id2 by
    rank order. NULL keys/ids are excluded.
    """
    from hypermap_etl_spark.operators.scale import global_rank

    if window < 2:
        raise ValueError("window must be >= 2")
    base = df.filter(
        F.col(id_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(F.col(id_col).alias("__id"), F.col(key_col).alias("__key"))
    ranked = global_rank(
        base, [F.col("__key").asc(), F.col("__id").asc()], rank_col="__r"
    )
    from hypermap_etl_spark.util import tracked_persist

    ranked = tracked_persist(ranked)
    shifted = ranked.select(
        F.col("__id").alias("id2"),
        F.col("__key").alias("key2"),
        F.explode(
            F.array(*[F.lit(d) for d in range(1, window)])
        ).alias("__d"),
        F.col("__r").alias("__r2"),
    ).select("id2", "key2", (F.col("__r2") - F.col("__d")).alias("__r"),
             "__d")
    return (
        ranked.join(shifted, "__r")
        .select(
            F.col("__id").alias("id1"),
            "id2",
            F.col("__key").alias("key1"),
            "key2",
            F.col("__d").cast("long").alias("rank_gap"),
        )
    )


def blocking_metrics(
    df: DataFrame, id_col: str, str_col: str, max_dist: int = 1
) -> DataFrame:
    """Blocking-quality report for the entity-resolution pipeline —
    the two numbers every ER deployment watches (Christen 2012):
    REDUCTION RATIO (how much of the quadratic comparison space the
    blocking avoided) and the candidate→match PRECISION (how much of
    what survived blocking was worth verifying). Pairs completeness
    is 1.0 by the FastSS theorem and is certified independently: the
    gate's oracle recomputes the matched count from a quadratic scan,
    so a recall regression in the blocking would hash-mismatch.

    One row: n_records, n_candidate_pairs, n_matched_pairs,
    reduction_ratio, match_precision (6 dp; NULL precision when no
    candidates).
    """
    base = df.filter(F.col(str_col).isNotNull())
    n_rec = base.agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    cand = _neighborhood_candidates(base, id_col, str_col, max_dist)
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs")
    )
    n_match = (
        cand.filter(F.levenshtein("__s1", "__s2", max_dist) >= 0)
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched_pairs"))
    )
    all_pairs = (
        F.col("n_records").cast("double")
        * (F.col("n_records").cast("double") - F.lit(1.0))
        / F.lit(2.0)
    )
    return (
        n_rec.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_match))
        .select(
            "n_records",
            "n_candidate_pairs",
            "n_matched_pairs",
            F.round(
                F.lit(1.0)
                - F.col("n_candidate_pairs").cast("double") / all_pairs,
                6,
            ).alias("reduction_ratio"),
            F.round(
                F.try_divide(
                    F.col("n_matched_pairs").cast("double"),
                    F.col("n_candidate_pairs").cast("double"),
                ),
                6,
            ).alias("match_precision"),
        )
    )
