"""Link-graph centrality for corpus curation (beyond-reference,
north-star set): weighted PageRank with dangling-mass redistribution.

Why in a training-data engine: graph centrality over a hyperlink /
citation graph is a standard document-quality prior at CommonCrawl
scale (PageRank, Brin & Page 1998; harmonic centrality in CommonCrawl's
own ranking releases) — "how linked-to is this page" feeds the same
keep/drop decisions as the heuristic quality scores in
operators/curation.py.

Scale shape (the classic distributed formulation): ranks live as a
node-keyed DataFrame; each iteration is ONE join of edges to ranks on
``src`` (shuffle keyed by src, edges >> nodes so the edge table
dominates and ranks broadcast when small) + ONE hash aggregate of
contributions keyed by ``dst``. The dangling-node mass is recovered
WITHOUT a per-iteration driver action: total contribution mass is a
single-row aggregate cross-joined back (the broadcast
percentage-of-total pattern from plans/hm_queries.py A4), so
``1 - total_contribs`` is the dangling mass and the whole iteration
stays lazy. Each round is ``localCheckpoint``-ed (eager) and the
superseded round's blocks are released deterministically — the
connected-components discipline from operators/dedup.py:523.

Iterations are a fixed count (power iteration; ||error|| ~ damping^n),
which keeps the result engine-reproducible: the driver gate unrolls
the same fixed iterations as SQL CTEs (plans/star_queries.py
events_type_pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypermap_etl_spark.util import release_local_checkpoint


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns
    (node, rank) with ranks summing to 1.

    Semantics: rank_{i+1}(v) = (1-d)/N + d * (Σ_{u→v} rank_i(u) *
    w(u,v)/out_w(u) + dangling_i/N), where dangling_i is the total
    rank mass on nodes with no out-edges — the standard
    redistribute-to-all treatment, so mass is conserved exactly and
    a sink-heavy graph doesn't leak rank. ``weight=None`` counts each
    edge once; parallel edges are pre-summed either way, so the edge
    list need not be deduplicated. Self-loops count as ordinary
    edges. Null endpoints are dropped.

    Scale: nodes/out-weights are computed once; each iteration
    shuffles the (pre-aggregated) edge table on ``src`` then ``dst``
    — no per-iteration collect, no window over the full graph, and
    round N-1's checkpoint blocks are freed as round N materializes.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    w = (
        F.col(weight).cast("double")
        if weight is not None
        else F.lit(1.0)
    )
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__w"))
        .groupBy("__src", "__dst")
        .agg(F.sum("__w").alias("__w"))
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("__src").agg(F.sum("__w").alias("__out_w"))
    # Normalize once: each edge carries its contribution FRACTION, so
    # the per-iteration join is rank × fraction with no division.
    frac = (
        e.join(out_w, "__src")
        .select("__src", "__dst", (F.col("__w") / F.col("__out_w")).alias("__frac"))
        .localCheckpoint(eager=True)
    )
    nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.count()  # one scalar, graph-shape-sized
    if n_nodes == 0:
        # all-null or empty edge list: free the (empty) edge
        # checkpoint; the empty node frame is the result
        release_local_checkpoint(frac)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        contribs = (
            frac.join(ranks, frac["__src"] == ranks["node"])
            .groupBy("__dst")
            .agg(F.sum(F.col("rank") * F.col("__frac")).alias("__c"))
        )
        # Dangling mass = 1 - mass that flowed through out-edges; a
        # single-row aggregate cross-joined back keeps the loop lazy
        # (no per-iteration driver action).
        total = contribs.agg(
            F.coalesce(F.sum("__c"), F.lit(0.0)).alias("__total_c")
        )
        nxt = (
            nodes.join(contribs, nodes["node"] == contribs["__dst"], "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + (F.lit(1.0) - F.col("__total_c")) / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        prev, ranks = ranks, nxt
        # round 0's ranks frame is a cheap literal projection over
        # nodes (no checkpoint, release is a no-op); later rounds hold
        # real blocks and are freed as their successor materializes.
        release_local_checkpoint(prev)
    # the returned frame is itself an eager checkpoint — its inputs'
    # blocks are no longer needed; the result's own blocks stay alive
    # until the caller consumes the query, then release_persisted()
    # frees them (the duplicate_clusters convention).
    release_local_checkpoint(frac)
    release_local_checkpoint(nodes)
    from hypermap_etl_spark.util import _TRACKED_CHECKPOINTS

    _TRACKED_CHECKPOINTS.append(ranks)
    return ranks


def triangle_count(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal ("is this node in a tight community?") used to
    screen link farms vs organically linked documents in web-graph
    curation.

    Input: directed or undirected edge rows; self-loops and duplicate/
    reverse duplicates are removed. The count is over the
    CANONICALIZED undirected edge set.

    Algorithm (the standard distributed formulation; cf. Suri &
    Vassilvitskii's MapReduce triangle counting): orient every edge
    low→high, self-join oriented edges on the shared low endpoint to
    enumerate wedges (a<b, a<c with b<c), then semi-join wedges
    against the edge set to keep closed ones. Each triangle (a<b<c)
    appears exactly once, as wedge (b,c) at a. Per-node counts come
    from exploding each found triangle to its three corners.

    Scale shape: joins keyed by node id; the canonical orientation
    bounds the wedge fan-out by the LOW endpoint's degree, the classic
    high-degree-hub mitigation (a hub only generates wedges among
    higher-ordered neighbors). No windows, no collect.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))  # drops self-loops and NULLs
        .distinct()
    )
    w1 = e.select(F.col("a").alias("pivot"), F.col("b").alias("x"))
    w2 = e.select(F.col("a").alias("pivot"), F.col("b").alias("y"))
    wedges = w1.join(w2, "pivot").filter(F.col("x") < F.col("y"))
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "inner").select(
        F.col("pivot").alias("v1"), F.col("x").alias("v2"), F.col("y").alias("v3")
    )
    corners = (
        tris.select(F.col("v1").alias("node"))
        .unionAll(tris.select(F.col("v2").alias("node")))
        .unionAll(tris.select(F.col("v3").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
