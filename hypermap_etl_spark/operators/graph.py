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


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 8,
) -> DataFrame:
    """k-core of an undirected graph by iterative peeling — the
    dense-subgraph screen of web-graph curation (spam farms and bot
    rings live in high cores; a page whose neighborhood survives the
    k-core peel has organically dense linkage, Seidman 1983): repeat
    "drop every node with degree < k, and the edges it touches" until
    stable or ``n_iter`` rounds.

    Per round: ONE degree aggregate over the current edge frame + two
    semi joins against the surviving-node set (node-sized, broadcast
    when small). Rounds are localCheckpoint-ed eagerly and the
    superseded round's blocks are released — the pagerank/CC loop
    discipline — and the loop exits early when a round removes
    nothing (the edge count, one scalar off the already-materialized
    checkpoint, is the convergence probe). Early exit cannot change
    the result: once stable, further peels are no-ops, so the
    fixed-``n_iter`` unrolled SQL oracle reproduces the operator
    EXACTLY whether or not convergence happened first.

    Input edges are canonicalized (NULLs and self-loops dropped,
    (min, max) orientation, duplicates collapsed), so multi-edges
    count once. Output: (node, core_degree) for nodes surviving the
    peel — their degrees within the final subgraph (all >= k once
    converged; if ``n_iter`` was exhausted mid-peel the frame is the
    n_iter-round peel, documented rather than silently iterated
    further).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    a, b = F.col(src), F.col(dst)
    e = (
        edges.filter(a.isNotNull() & b.isNotNull() & (a != b))
        .select(F.least(a, b).alias("__a"), F.greatest(a, b).alias("__b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    for _ in range(n_iter):
        if n_edges == 0:
            break
        deg = (
            e.select(F.col("__a").alias("node"))
            .unionByName(e.select(F.col("__b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("__d"))
        )
        keep = deg.filter(F.col("__d") >= k).select("node")
        nxt = (
            e.join(keep, e["__a"] == keep["node"], "left_semi")
            .join(keep, e["__b"] == keep["node"], "left_semi")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        prev, e = e, nxt
        release_local_checkpoint(prev)
        if n_nxt == n_edges:
            n_edges = n_nxt
            break  # stable: every further peel is a no-op
        n_edges = n_nxt
    out = (
        e.select(F.col("__a").alias("node"))
        .unionByName(e.select(F.col("__b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )
    from hypermap_etl_spark.util import _TRACKED_CHECKPOINTS

    _TRACKED_CHECKPOINTS.append(e)
    return out


def seed_distance(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Multi-source BFS: the hop distance from a trusted seed set,
    capped at ``max_hops`` — the link-distance quality prior of
    web-corpus curation (TrustRank's propagation step, Gyöngyi et al.
    2004: pages close to a hand-vetted seed set inherit trust; spam
    lives far away). Nodes unreached within the cap are absent from
    the output — "beyond the horizon" is a keep/drop signal too.

    Per round: ONE join of the symmetrized edge frame to the current
    frontier on the source endpoint + a min-aggregate merging new
    candidates into the distance frame. Rounds are localCheckpoint-ed
    eagerly with deterministic block release (the pagerank/k_core
    loop discipline) and the loop exits early when a round neither
    adds a node nor shortens a distance (node count + distance sum,
    two scalars off the materialized checkpoint — distances only
    shrink, so joint stability is a fixpoint certificate). Early exit
    cannot change the result, so a fixed-``max_hops`` unrolled SQL
    oracle reproduces the operator exactly.

    Output: (node, dist) for every node within ``max_hops`` of a
    seed; seeds themselves carry dist 0 (seeds absent from the edge
    list still appear — vetting a page that nobody links yet is
    valid).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    a, b = F.col(src), F.col(dst)
    e = (
        edges.filter(a.isNotNull() & b.isNotNull() & (a != b))
        .select(a.alias("__a"), b.alias("__b"))
    )
    e = (
        e.unionByName(e.select(F.col("__b").alias("__a"), F.col("__a").alias("__b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .filter(F.col("node").isNotNull())
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    state = dist.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dist"), F.lit(0)).alias("s")
    ).collect()[0]
    n_prev, s_prev = state["n"], state["s"]
    for _ in range(max_hops):
        cand = (
            e.join(dist, e["__a"] == dist["node"])
            .select(F.col("__b").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        nxt = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            .localCheckpoint(eager=True)
        )
        st = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dist"), F.lit(0)).alias("s"),
        ).collect()[0]
        prev, dist = dist, nxt
        release_local_checkpoint(prev)
        if st["n"] == n_prev and st["s"] == s_prev:
            break  # fixpoint: no new nodes, no shortened paths
        n_prev, s_prev = st["n"], st["s"]
    release_local_checkpoint(e)
    from hypermap_etl_spark.util import _TRACKED_CHECKPOINTS

    _TRACKED_CHECKPOINTS.append(dist)
    return dist


def label_propagation(
    edges: DataFrame,
    n_iter: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007), made
    DETERMINISTIC: every node starts as its own community and each
    round adopts the most frequent label among its neighbors, ties
    broken toward the SMALLEST label — the cheap community detector
    for co-occurrence graphs (which products cluster, which domains
    interlink) where modularity solvers don't scale.

    Determinism is the whole design: the classic algorithm breaks
    ties randomly and updates asynchronously in shuffled order; this
    one is synchronous with a total tie order, so the result is a
    pure function of the graph and ``n_iter`` — reproducible across
    runs, partitionings, AND engines (the SQL oracle unrolls the same
    rounds). Synchronous LPA can two-cycle on bipartite structures
    rather than converge; a FIXED round count is therefore the
    honest contract (the early exit below fires only on exact
    fixpoints, which no further round can leave).

    Per round: ONE join of the symmetrized edge frame to the labels
    on the source endpoint, a (node, label) count aggregate, a
    node-partitioned top-1 window over that aggregate, and a left
    join back (isolated nodes keep their label). Rounds are
    localCheckpoint-ed eagerly with deterministic release; the
    change-count probe is one aggregate per round.

    Output: (node, community) after ``n_iter`` rounds.
    """
    from pyspark.sql.window import Window

    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    a, b = F.col(src), F.col(dst)
    e = (
        edges.filter(a.isNotNull() & b.isNotNull() & (a != b))
        .select(a.alias("__a"), b.alias("__b"))
    )
    e = (
        e.unionByName(e.select(F.col("__b").alias("__a"), F.col("__a").alias("__b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("__a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("community"))
        .localCheckpoint(eager=True)
    )
    ckpt = labels  # the checkpoint holding the current labels' blocks
    w = Window.partitionBy("node").orderBy(
        F.col("__c").desc(), F.col("community").asc()
    )
    for _ in range(n_iter):
        nbr = e.join(labels, e["__a"] == labels["node"]).select(
            F.col("__b").alias("node"), "community"
        )
        top = (
            nbr.groupBy("node", "community")
            .agg(F.count(F.lit(1)).alias("__c"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", F.col("community").alias("__new"))
        )
        # the changed flag rides the round's own checkpoint (r10, guide
        # §1.2: the probe used to be a separate labels-join-count action
        # — one extra shuffle join per round for a scalar the round's
        # plan already knows); counting flags off the materialized frame
        # is a scan of the checkpoint, no join
        nxt = (
            labels.join(top, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("__new"), F.col("community")).alias("community"),
                (
                    F.col("__new").isNotNull()
                    & (F.col("__new") != F.col("community"))
                ).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.filter(F.col("__chg")).count()
        prev, ckpt = ckpt, nxt
        labels = nxt.select("node", "community")
        release_local_checkpoint(prev)
        if changed == 0:
            break  # exact fixpoint: further rounds reproduce it
    release_local_checkpoint(e)
    from hypermap_etl_spark.util import _TRACKED_CHECKPOINTS

    _TRACKED_CHECKPOINTS.append(ckpt)
    return labels


def _orient_by_degree(e: DataFrame) -> DataFrame:
    """Orient a canonical undirected edge set (a < b, deduped) by the
    (degree, id) total order: returns (u, v, dv) rows with u ≺ v,
    where dv is v's degree (carried so downstream wedge enumeration
    can compare the total order without re-joining degrees).

    This is the Suri-Vassilvitskii hub mitigation: a node pivots
    wedges only among neighbors ABOVE it in degree order, so a
    degree-d hub contributes O(#higher-degree-neighbors²) wedges, not
    O(d²). Degrees are one hash aggregate over the edge endpoints;
    attaching them is two node-keyed joins.
    """
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.withColumnsRenamed({"node": "a", "deg": "da"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "deg": "db"}), "b")
    )
    a_first = F.struct("da", "a") < F.struct("db", "b")
    return ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )


def triangle_count(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal ("is this node in a tight community?") used to
    screen link farms vs organically linked documents in web-graph
    curation.

    Input: directed or undirected edge rows; self-loops and duplicate/
    reverse duplicates are removed. The count is over the
    CANONICALIZED undirected edge set.

    Algorithm (Suri & Vassilvitskii's MapReduce triangle counting):
    orient every edge from its (degree, id)-smaller endpoint, self-join
    oriented edges on the shared tail to enumerate wedges, then join
    wedges against the oriented edge set to keep closed ones. Each
    triangle appears exactly once — as the wedge pivoted at its
    ≺-smallest corner — and per-node counts come from exploding each
    found triangle to its three corners.

    Scale shape: joins keyed by node id; the DEGREE-then-id total
    order is the actual hub mitigation of the construction — a hot
    node's edges all point INTO it (every neighbor has lower degree or
    a lower tie-broken id), so the hub pivots no wedges and fan-out is
    bounded by the arboricity-style degree order, not by whichever
    node drew a low id. Wedge count is Σ_v C(outdeg(v), 2) with
    outdeg ≤ degree-rank neighbors — O(m^{3/2}) total, skew-safe.
    One extra degree aggregate + one join vs the naive id orientation.
    No windows, no collect.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))  # drops self-loops and NULLs
        .distinct()
    )
    o = _orient_by_degree(e)
    w1 = o.select(F.col("u").alias("pivot"), F.col("v").alias("x"),
                  F.col("dv").alias("dx"))
    w2 = o.select(F.col("u").alias("pivot"), F.col("v").alias("y"),
                  F.col("dv").alias("dy"))
    wedges = (
        w1.join(w2, "pivot")
        # strict half of the (degree, id) total order: each unordered
        # out-neighbor pair {x, y} yields exactly one wedge
        .filter(F.struct("dx", "x") < F.struct("dy", "y"))
    )
    # the closing edge x–y is oriented x→y because x ≺ y in the wedge
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
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


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    comm_col: str = "community",
) -> DataFrame:
    """Newman modularity Q of a community assignment over an
    undirected simple graph — the single number that says whether
    :func:`label_propagation`'s communities are real structure or
    noise (Q near 0: no better than random; 0.3+: strong community
    structure).

        Q = Σ_c [ e_c/m − (d_c/(2m))² ]
          = (4·m·Σe_c − Σd_c²) / (4·m²)

    The second form is the implementation: every term of the
    numerator and denominator is an EXACT integer (intra-community
    edge counts, per-community degree sums squared in decimal(38,0)),
    so the only float operation is the final division — engine-
    identical, no per-community float accumulation.

    Nodes absent from ``communities`` are excluded along with their
    edges (the score is over the covered subgraph, so the identity
    Σ_c d_c = 2m holds by construction). Self-loops are dropped;
    duplicate/reversed edge rows collapse to one undirected edge.

    Output: ONE row — n_edges, n_nodes, n_communities, intra_edges,
    modularity (round 6).

    Scale shape: edge normalization is a map + distinct; two
    broadcast-sized joins attach community labels to endpoints; all
    reductions are map-combined hash aggregates ending in single-row
    frames joined by crossJoin (the broadcast-single-row-total
    pattern). No windows, no driver collect.
    """
    a, b = F.col(src), F.col(dst)
    e = (
        edges.filter(a.isNotNull() & b.isNotNull() & (a != b))
        .select(F.least(a, b).alias("__a"), F.greatest(a, b).alias("__b"))
        .distinct()
    )
    cmu = communities.select(
        F.col(node_col).alias("__n"), F.col(comm_col).alias("__c")
    )
    ec = (
        e.join(cmu.withColumnRenamed("__n", "__a").withColumnRenamed("__c", "__ca"), "__a")
        .join(cmu.withColumnRenamed("__n", "__b").withColumnRenamed("__c", "__cb"), "__b")
    )
    eagg = ec.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(
            F.when(F.col("__ca") == F.col("__cb"), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("intra_edges"),
    )
    deg = (
        ec.select(F.col("__a").alias("__n"), "__ca")
        .unionByName(
            ec.select(F.col("__b").alias("__n"), F.col("__cb").alias("__ca"))
        )
        .groupBy("__n", "__ca")
        .agg(F.count(F.lit(1)).cast("long").alias("__d"))
    )
    dc = deg.groupBy("__ca").agg(F.sum("__d").cast("decimal(19,0)").alias("__dc"))
    dagg = dc.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum(F.col("__dc") * F.col("__dc")).cast("decimal(38,0)").alias("__sd2"),
    )
    nodes = deg.select("__n").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    j = eagg.crossJoin(dagg).crossJoin(nodes)
    m = F.col("n_edges").cast("decimal(19,0)")
    num = (
        F.lit(4).cast("decimal(19,0)") * m
        * F.col("intra_edges").cast("decimal(19,0)")
    ).cast("decimal(38,0)") - F.col("__sd2")
    den = (F.lit(4).cast("decimal(19,0)") * m * m).cast("decimal(38,0)")
    q = F.when(
        F.col("n_edges") > 0,
        num.cast("double") / den.cast("double"),
    )
    return j.select(
        "n_edges",
        "n_nodes",
        "n_communities",
        "intra_edges",
        F.round(q, 6).alias("modularity"),
    )


def markov_stationary(
    transitions: DataFrame,
    from_col: str = "from_type",
    to_col: str = "to_type",
    count_col: str = "n",
    n_iter: int = 8,
) -> DataFrame:
    """Stationary distribution of the behavior Markov chain by fixed
    power iteration — given the (from, to, count) transition table
    (e.g. events_type_bigrams), where does a long random session
    spend its time? The long-run companion of the transition counts
    and the entropy rate.

    States are the values with OUTGOING transitions (the chain is
    defined by its rows); mass flowing into a state with no outgoing
    row is re-normalized away each step — the standard sub-stochastic
    treatment, honest about dead-ends. A FIXED iteration count is the
    contract (periodic chains oscillate; the oracle unrolls the same
    k steps).

    Determinism: M_ij = c_ij/c_i is one double division of exact
    longs; each v_i·M_ij product is rounded to 12 dp and QUANTIZED to
    decimal before the per-state sum (quantize-then-exact-sum — a raw
    double sum would depend on aggregation order), and each
    renormalization divides exact decimal totals once in double.

    Scale shape: every frame is bounded by the state/edge count of
    the TYPE graph (tiny by construction — the corpus-sized work is
    whatever built the transition table); iterations chain linearly.
    Output: (state, n_out, pi) with pi rounded 6.
    """
    if n_iter < 1:
        raise ValueError("markov_stationary: need n_iter >= 1")
    tr = transitions.select(
        F.col(from_col).alias("__from"),
        F.col(to_col).alias("__to"),
        F.col(count_col).cast("long").alias("__n"),
    ).filter(F.col("__n") > 0)
    out_tot = tr.groupBy("__from").agg(
        F.sum("__n").cast("long").alias("__ci")
    )
    m = tr.join(out_tot, "__from").select(
        F.col("__from").alias("__mfrom"),
        F.col("__to").alias("__mto"),
        (F.col("__n").cast("double") / F.col("__ci").cast("double")).alias(
            "__pij"
        ),
    )
    states = out_tot.select(F.col("__from").alias("__st"), "__ci")
    ns = states.agg(F.count(F.lit(1)).cast("long").alias("__s"))
    v = states.crossJoin(F.broadcast(ns)).select(
        "__st",
        F.round(F.lit(1.0) / F.col("__s").cast("double"), 12)
        .cast("decimal(38,12)")
        .alias("__p"),
    )
    from hypermap_etl_spark.util import (
        release_local_checkpoint,
        tracked_local_checkpoint,
    )

    m = tracked_local_checkpoint(m)
    prev = None
    for _ in range(n_iter):
        # checkpoint each step: `up` feeds BOTH the total and the
        # renormalized vector — without materialization the whole
        # transition lineage would re-evaluate twice per iteration
        # (2^k blowup over k steps)
        up = tracked_local_checkpoint(
            v.join(m, F.col("__st") == F.col("__mfrom"))
            .select(
                F.col("__mto").alias("__st"),
                F.round(F.col("__p").cast("double") * F.col("__pij"), 12)
                .cast("decimal(38,12)")
                .alias("__t"),
            )
            .groupBy("__st")
            .agg(F.sum("__t").cast("decimal(38,12)").alias("__p"))
        )
        if prev is not None:
            release_local_checkpoint(prev)
        prev = up
        tot = up.agg(F.sum("__p").cast("decimal(38,12)").alias("__tot"))
        v = up.crossJoin(F.broadcast(tot)).select(
            "__st",
            F.round(
                F.col("__p").cast("double") / F.col("__tot").cast("double"),
                12,
            )
            .cast("decimal(38,12)")
            .alias("__p"),
        )
    return (
        states.join(v, "__st", "left")
        .select(
            F.col("__st").alias("state"),
            F.col("__ci").alias("n_out"),
            F.round(
                F.coalesce(F.col("__p").cast("double"), F.lit(0.0)), 6
            ).alias("pi"),
        )
        .orderBy("state")
    )


def link_prediction_aa(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 1000,
    top_k: int = 50,
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected graph: score
    every NON-adjacent pair that shares a neighbor by
    Σ_v 1/ln(deg(v)) over the common neighbors v — rare shared
    neighbors say more than hubs everyone touches. The standard
    "which products will be co-bought next / which entities are the
    same" candidate ranker.

    Candidate pairs ARE wedges pivoted at the shared neighbor, so a
    hub of degree d would fan out C(d,2) pairs — the quadratic-hub
    trap. ``max_degree`` excludes super-hub pivots (their 1/ln(d)
    contribution is the smallest anyway), the same cap discipline as
    the shingle-index dedup family; excluded-pivot mass is simply
    absent from scores, documented behavior. The same truncation
    applies to ``n_common``: it counts only wedges through SCORED
    pivots (degree in [2, max_degree]), so it under-reports the true
    common-neighbor count whenever a hub pivot is capped — it is the
    support of ``aa_score``, not an exact common-neighbor census.

    Determinism: each 1/ln(deg) term is rounded to 12 dp and
    quantized to decimal before the per-pair sum (libm ln wobble is
    absorbed by the quantization; the sum is order-independent).

    Scale shape: one degree aggregate, one pivot-keyed wedge
    self-join bounded by the degree cap, one hash aggregate per pair,
    a broadcast-able anti-join against the edge set, TakeOrdered
    top-k. Output: (node_a, node_b, n_common, aa_score).
    """
    if max_degree < 2:
        raise ValueError("link_prediction_aa: need max_degree >= 2")
    if top_k < 1:
        raise ValueError("link_prediction_aa: need top_k >= 1")
    from hypermap_etl_spark.util import tracked_persist

    # persisted (r10, guide §2.4/§3.3): ``e`` is consumed three times —
    # both legs of the symmetrization and the final anti-join — and
    # ``sym`` twice more (degree aggregate + adjacency join), so
    # without a boundary the caller's whole edge-construction lineage
    # (for the co-purchase graph: a lineitem self-join + count
    # aggregate) re-executed ~4x; the r10 plan audit counted 100
    # Exchanges in the bench entry's plan. One cached canonical edge
    # set feeds every branch.
    e = tracked_persist(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("__d"))
    piv = deg.filter((F.col("__d") >= 2) & (F.col("__d") <= max_degree))
    adj = sym.join(piv, "a").select(
        F.col("a").alias("__v"), F.col("b").alias("__x"), "__d"
    )
    left = adj.select("__v", F.col("__x").alias("na"), "__d")
    right = adj.select("__v", F.col("__x").alias("nb"))
    pairs = left.join(right, "__v").filter(F.col("na") < F.col("nb"))
    term = F.round(
        F.lit(1.0) / F.log(F.col("__d").cast("double")), 12
    ).cast("decimal(14,12)")
    scored = (
        pairs.select("na", "nb", term.alias("__t"))
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("__t").cast("decimal(38,12)").alias("__s"),
        )
    )
    non_edges = scored.join(
        e,
        (scored["na"] == e["a"]) & (scored["nb"] == e["b"]),
        "left_anti",
    )
    return (
        non_edges.select(
            F.col("na").alias("node_a"),
            F.col("nb").alias("node_b"),
            "n_common",
            F.round(F.col("__s").cast("double"), 6).alias("aa_score"),
        )
        .orderBy(
            F.col("aa_score").desc(),
            F.col("node_a").asc(),
            F.col("node_b").asc(),
        )
        .limit(top_k)
    )
