"""Distributed generalized suffix array — prefix doubling on DataFrames.

The suffix array is the index at the heart of ExactSubstr dedup
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"): their pipeline builds one suffix array over the whole corpus
and scans adjacent-suffix LCPs. The construction they use is
single-machine (memory-mapped byte array + parallel sorts); the
standard DISTRIBUTED construction is prefix doubling (Manber-Myers;
distributed form as in Flick & Aluru, "Parallel distributed memory
construction of suffix and LCP arrays", SC'15): after round k every
suffix is ranked by its first h=2^k characters, and the next round
refines each rank with the rank of the suffix h positions later — a
self equi-join — so O(log maxlen) rounds rank every suffix completely.

Spark-first shape, no Python in the loop:

  - ranks are SEEDED from each suffix's first ``seed_chars`` characters
    (one distributed string-ranking pass), replacing the first
    log2(seed_chars) doubling rounds;
  - rank semantics are group-start ranks (r = number of strictly
    smaller suffixes + 1), so refinement is LOCAL to each tied group:
    ``new_r = r + rank_within_group(r2) - 1`` stays inside the group's
    rank interval and never disturbs other groups — no global
    re-ranking per round;
  - suffixes whose group reaches size 1 are FROZEN: each round joins
    and re-windows only the still-tied rows (at corpus scale, the
    unresolved tail — duplicated boilerplate — not the whole corpus);
    identical cross-document suffixes stay tied until h reaches the
    max length, which is their correct fixpoint;
  - the only global ranking passes are the seed and the final
    row_number, both via ``_distributed_rank``: range-repartition by
    the sort key, per-partition window ranks, broadcast partition
    offsets — the driver sees one count per partition, never rows;
  - each round materializes exactly ONE localCheckpoint (frozen and
    still-tied halves are lazy filters over it); round frames shrink
    geometrically as groups resolve and are all released before
    returning, so peak extra storage is ~2x the suffix count in
    fixed-width rows.

Comparison semantics match engine/byte order: Spark string comparison,
DuckDB binary collation, and Python str all order by UTF-8 bytes /
codepoints, so the result equals ORDER BY suffix in any of them —
which is exactly what the doc_suffix_array oracle checks. A suffix
that is a proper prefix of another ranks first (string prefix order in
the seed; past-end sentinel rank 0 in refinement rounds); ties between
IDENTICAL cross-document suffixes break by (doc_id, pos).

The min_len-grain application (duplicated spans) lives in
dedup.dup_char_spans; this module ships the index itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hypermap_etl_spark.util import (
    release_local_checkpoint,
    shuffle_partitions,
    tracked_local_checkpoint,
)


def _distributed_rank(
    df: DataFrame,
    key_cols: list[str],
    dense: bool,
    n_parts: int,
    out_col: str = "__r",
    with_group_size: bool = False,
):
    """Global rank over ``key_cols`` without a single-partition window:
    RANK() semantics for dense=True-style grouping (equal keys share
    the rank of their group's first row — group-start ranks), pure
    row_number for dense=False.

    Range-repartition on the keys (equal keys co-locate, partition p's
    keys all sort before partition p+1's), rank WITHIN each partition,
    then add broadcast per-partition ROW-count offsets (valid for both
    modes because RANK is row-positional). The driver materializes one
    count per partition.

    Returns (ranked_frame, scratch_frame): scratch is persisted (the
    offsets job and the caller's read share it) and must be unpersisted
    by the caller once ranked_frame is materialized. When
    ``with_group_size`` the output also carries ``__gsz``, the global
    size of each key group (safe per-partition: equal keys co-locate).
    """
    keys = [F.col(c) for c in key_cols]
    part = df.repartitionByRange(n_parts, *keys)
    with_pid = part.withColumn("__pid", F.spark_partition_id()).persist()
    counts = {
        r["__pid"]: r["__c"]
        for r in with_pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.coalesce(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
            F.col("__pid")
        ],
        F.lit(0),
    )
    w = Window.partitionBy("__pid").orderBy(*keys)
    rank = F.rank().over(w) if dense else F.row_number().over(w)
    out = with_pid.withColumn(out_col, (rank + off).cast("long"))
    if with_group_size:
        out = out.withColumn(
            "__gsz", F.count(F.lit(1)).over(Window.partitionBy("__pid", *keys))
        )
    return out.drop("__pid"), with_pid


def lcp_rank_adjacent(
    sa: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_lcp: int = 256,
) -> DataFrame:
    """LCP array over a suffix_array result: for every rank r ≥ 2, the
    length of the longest common prefix between the rank-r suffix and
    the rank-(r-1) suffix, capped at ``max_lcp`` — the second half of
    the Lee et al. index (duplicated substrings of length ≥ L are
    exactly the SA-adjacent pairs with LCP ≥ L, for any L ≤ max_lcp).

    Distributed shape: each SA row re-attaches its ``max_lcp``-char
    suffix prefix (substr — bounded width, never the full suffix),
    pairs with its rank predecessor by a self equi-join on rank
    (shuffle on rank, uniform by construction), and the LCP itself is
    one JVM character-fold (aggregate over sequence, short-circuiting
    struct accumulator — O(max_lcp) per pair, no Python). Kasai's
    O(n) LCP construction is inherently sequential; the capped
    prefix-compare keeps the whole pass declarative, and a cap is the
    honest contract anyway — ExactSubstr consumers threshold at
    ~50 chars, far below any sane cap.

    Output: (rank, id, pos, lcp) for every rank ≥ 2 (rank 1 has no
    predecessor).
    """
    C = int(max_lcp)
    if C < 1:
        # sequence(1, 0) is DESCENDING [1, 0] in Spark — a degenerate
        # cap would fold twice over empty strings and report lcp=2
        # everywhere instead of erroring
        raise ValueError(f"lcp_rank_adjacent: max_lcp must be >= 1, got {max_lcp}")
    from hypermap_etl_spark.util import tracked_persist

    # both sides of the rank self-join read the (sa ⋈ docs) + substr
    # subplan — persist so it runs once, not twice
    suf = tracked_persist(
        sa.join(docs.select(id_col, text_col), id_col).select(
            F.col("sa_rank"),
            F.col(id_col),
            F.col("pos"),
            F.expr(f"substr(`{text_col}`, cast(pos as int), {C})").alias("__s"),
        )
    )
    prev = suf.select(
        (F.col("sa_rank") + 1).alias("sa_rank"), F.col("__s").alias("__p")
    )
    paired = suf.join(prev, "sa_rank")
    lcp = F.expr(
        f"""
        aggregate(
          sequence(1, least({C}, length(__s), length(__p))),
          struct(cast(0 as int) as n, false as done),
          (acc, i) -> if(acc.done or substr(__s, i, 1) <> substr(__p, i, 1),
                         struct(acc.n as n, true as done),
                         struct(acc.n + 1 as n, false as done)),
          acc -> acc.n)
        """
    )
    return paired.select(
        F.col("sa_rank").alias("rank"),
        id_col,
        "pos",
        F.coalesce(lcp, F.lit(0)).cast("long").alias("lcp"),
    )


# refinement-round broadcast bound (r11, guide §3.1): when the still-
# tied tail fits a broadcast (rows of (id, pos) — ~50 MB built at this
# cap), the round's rank lookup is two broadcast joins and the corpus
# rank set is only SCANNED, never shuffled; above the cap the round
# falls back to the shuffle join. Same spirit as merge.py's
# _BROADCAST_KEYS_MAX.
_BROADCAST_TIED_MAX = 1_000_000


def suffix_array(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int | None = None,
    seed_chars: int = 128,
) -> DataFrame:
    """Generalized suffix array over every document: one row per suffix,
    (id, pos, sa_rank) with 1-indexed char positions and sa_rank the
    1-indexed position of ``s[pos:]`` in the lexicographic order of ALL
    corpus suffixes (ties between identical suffixes break by
    (id, pos) — the same total order as
    ``ORDER BY substr(text, pos), id, pos``).
    """
    spark = docs.sparkSession
    base = docs.filter(F.length(F.col(text_col)) > 0).select(
        id_col, F.col(text_col).alias("__t")
    )
    stats = base.agg(
        F.max(F.length("__t")).alias("mx"), F.sum(F.length("__t")).alias("n")
    ).collect()[0]
    maxlen, n_total = stats["mx"], stats["n"]
    if maxlen is None:
        return spark.createDataFrame(
            [], f"{id_col} {dict(docs.dtypes)[id_col]}, pos long, sa_rank long"
        )
    if n_parts is None:
        cap = shuffle_partitions(spark)
        n_parts = max(1, min(cap, int(n_total) // 65536 + 1))

    # seed: group-start ranks of the first seed_chars characters as a
    # plain string key (substr past the end is just the shorter suffix,
    # and string prefix order == suffix order for the covered chars)
    seeded = base.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.length("__t"))).alias("pos"),
        "__t",
    ).select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        F.expr(f"substr(__t, pos, {int(seed_chars)})").alias("__k"),
    )
    ranked, scratch = _distributed_rank(
        seeded, ["__k"], dense=True, n_parts=n_parts, out_col="__r",
        with_group_size=True,
    )
    sel = [F.col(id_col), F.col("pos"), F.col("__r")]
    # ONE checkpoint per round holds both halves; frozen/tied are lazy
    # filters over it (filter over a LogicalRDD leaf is free)
    rounds: list[DataFrame] = [
        tracked_local_checkpoint(ranked.select(*sel, F.col("__gsz")))
    ]
    scratch.unpersist()
    frozen: list[DataFrame] = [rounds[0].filter(F.col("__gsz") == 1).select(*sel)]
    tied = rounds[0].filter(F.col("__gsz") > 1).select(*sel)

    h = int(seed_chars)
    while h < maxlen:
        n_tied = tied.count()
        if n_tied == 0:
            break
        # rank lookup for pos+h spans frozen ∪ tied (a shifted suffix
        # may be resolved even when the shifting one is not)
        all_r = frozen[0]
        for fr in frozen[1:]:
            all_r = all_r.unionByName(fr)
        all_r = all_r.unionByName(tied)
        shifted = all_r.select(
            F.col(id_col),
            (F.col("pos") - F.lit(h)).alias("pos"),
            F.col("__r").alias("__r2"),
        )
        if n_tied <= _BROADCAST_TIED_MAX:
            # the tied tail fits a broadcast (we just counted it):
            # prune the corpus-sized rank set to the ≤ n_tied rows the
            # round actually looks up with a broadcast semi-join
            # (evaluated map-side over the checkpoint scan), then
            # broadcast THAT for the left join — the corpus ranks are
            # scanned, never shuffled, where the old shape sort-merge-
            # shuffled all of them every round (guide §3.1/§3.2)
            shifted = shifted.join(
                F.broadcast(tied.select(id_col, "pos")),
                [id_col, "pos"],
                "left_semi",
            )
            paired = tied.join(F.broadcast(shifted), [id_col, "pos"], "left")
        else:
            paired = tied.join(shifted, [id_col, "pos"], "left")
        paired = paired.select(
            id_col,
            "pos",
            "__r",
            F.coalesce("__r2", F.lit(0)).alias("__r2"),
        )
        # refine WITHIN each tied group: group-start + RANK(r2) stays in
        # the group's rank interval, so frozen ranks are undisturbed
        wg = Window.partitionBy("__r").orderBy("__r2")
        wsz = Window.partitionBy("__r", "__r2")
        new = paired.select(
            id_col,
            "pos",
            (F.col("__r") + F.rank().over(wg) - 1).alias("__r"),
            F.count(F.lit(1)).over(wsz).alias("__gsz"),
        )
        chk = tracked_local_checkpoint(new)
        rounds.append(chk)
        frozen.append(chk.filter(F.col("__gsz") == 1).select(*sel))
        tied = chk.filter(F.col("__gsz") > 1).select(*sel)
        h *= 2

    all_r = frozen[0]
    for fr in frozen[1:]:
        all_r = all_r.unionByName(fr)
    all_r = all_r.unionByName(tied)
    final, scratch = _distributed_rank(
        all_r, ["__r", id_col, "pos"], dense=False, n_parts=n_parts,
        out_col="sa_rank",
    )
    out = tracked_local_checkpoint(
        final.select(id_col, "pos", "sa_rank")
    )
    scratch.unpersist()
    for fr in rounds:
        release_local_checkpoint(fr)
    return out
