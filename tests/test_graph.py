"""PageRank semantics: equivalence to a pure-Python power iteration
(same fixed-iteration, dangling-redistribution formulation), mass
conservation, weighted/parallel-edge handling, partition tolerance."""

from __future__ import annotations

import pytest

from hypermap_etl_spark.operators.graph import pagerank


def _reference_pagerank(edges, n_iter, damping):
    """Dict-based power iteration mirroring the operator's semantics:
    edges = [(src, dst, w)], parallel edges summed, dangling mass
    redistributed uniformly."""
    agg = {}
    for s, d, w in edges:
        agg[(s, d)] = agg.get((s, d), 0.0) + float(w)
    nodes = sorted({s for s, _ in agg} | {d for _, d in agg})
    n = len(nodes)
    out_w = {}
    for (s, _), w in agg.items():
        out_w[s] = out_w.get(s, 0.0) + w
    ranks = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contribs = {v: 0.0 for v in nodes}
        for (s, d), w in agg.items():
            contribs[d] += ranks[s] * (w / out_w[s])
        total_c = sum(contribs.values())
        dangling = 1.0 - total_c
        ranks = {
            v: base + damping * (contribs[v] + dangling / n) for v in nodes
        }
    return ranks


def _pseudo_random_edges(n_nodes=40):
    # deterministic, includes sinks (nodes never appearing as src),
    # self-loops, and parallel edges with weights
    edges = []
    for i in range(n_nodes):
        if i % 11 == 0:
            continue  # sinks: receive but never send
        edges.append((f"n{i}", f"n{(i * 7 + 3) % n_nodes}", (i % 5) + 1))
        edges.append((f"n{i}", f"n{(i * i + 1) % n_nodes}", 2))
        if i % 13 == 0:
            edges.append((f"n{i}", f"n{i}", 1))  # self-loop
    edges.append(("n1", f"n{8}", 3))  # parallel with the i=1 edge set
    return edges


def test_pagerank_matches_python_reference(spark):
    edges = _pseudo_random_edges()
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=6, damping=0.85, weight="w").collect()
    }
    want = _reference_pagerank(edges, n_iter=6, damping=0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_unweighted_counts_edges(spark):
    # weight=None ≡ weight 1 per edge row (parallel rows sum)
    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    wdf = spark.createDataFrame(
        [("a", "b", 2), ("a", "c", 1), ("b", "c", 1)],
        "src string, dst string, w long",
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=4).collect()}
    want = {
        r["node"]: r["rank"] for r in pagerank(wdf, n_iter=4, weight="w").collect()
    }
    assert got == pytest.approx(want, abs=1e-14)


def test_pagerank_sink_mass_conserved(spark):
    # b is a pure sink: without dangling redistribution rank leaks
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    want = _reference_pagerank([("a", "b", 1)], n_iter=8, damping=0.85)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    assert got["b"] > got["a"]  # the sink accumulates


def test_pagerank_partition_tolerant(spark):
    edges = _pseudo_random_edges()
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    baseline = {
        r["node"]: r["rank"]
        for r in pagerank(df.coalesce(1), n_iter=4, weight="w").collect()
    }
    for n in (3, 17):
        got = {
            r["node"]: r["rank"]
            for r in pagerank(df.repartition(n), n_iter=4, weight="w").collect()
        }
        # double sums reorder across layouts; agreement to 1e-12 is
        # the float-summation bound, not a semantic difference
        assert got == pytest.approx(baseline, abs=1e-12)


def test_pagerank_null_endpoints_dropped_and_args_validated(spark):
    df = spark.createDataFrame(
        [("a", "b"), (None, "b"), ("a", None)], "src string, dst string"
    )
    got = pagerank(df, n_iter=2).collect()
    assert {r["node"] for r in got} == {"a", "b"}
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_pagerank_empty_and_released_checkpoints(spark):
    from hypermap_etl_spark.util import release_persisted

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, n_iter=3).collect() == []
    # the returned frame is tracked: consuming it then releasing frees
    # the loop's blocks without touching unrelated state
    df = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = pagerank(df, n_iter=3)
    assert len(out.collect()) == 2
    assert release_persisted() >= 1


# ------------------------------------------------------ triangle_count ----

def test_triangle_count_known_graphs(spark):
    from hypermap_etl_spark.operators.graph import triangle_count

    # K4: every node sits in C(3,2) = 3 triangles
    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    df = spark.createDataFrame(k4, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    # path graph has no triangles -> empty result
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_count(path).count() == 0


def test_triangle_count_canonicalizes_input(spark):
    from hypermap_etl_spark.operators.graph import triangle_count

    # duplicates, reversed duplicates, and self-loops must not change
    # the count: one triangle 1-2-3
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (2, 2), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_matches_bruteforce_random(spark):
    import itertools
    import random

    from hypermap_etl_spark.operators.graph import triangle_count

    rng = random.Random(11)
    nodes = list(range(15))
    edges = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.3
    ]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(5)
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    es = set(edges)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= es:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


def test_triangle_orientation_starves_low_id_hub(spark):
    """Degree orientation (Suri-Vassilvitskii) must bound wedge
    fan-out by degree ORDER, not id: a star centered at the LOWEST id
    — the worst case for the naive low-id→high-id orientation, which
    would pivot C(n, 2) wedges at the hub — generates ZERO wedges,
    because every spoke orients leaf→hub (leaves have degree 1 < n)
    and the hub has no out-edges."""
    from hypermap_etl_spark.operators.graph import (
        _orient_by_degree,
        triangle_count,
    )
    from pyspark.sql import functions as F

    n = 40
    star = spark.createDataFrame(
        [(0, i) for i in range(1, n + 1)], "src long, dst long"
    )
    e = star.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    o = _orient_by_degree(e)
    # every edge points INTO the hub; the hub pivots nothing
    assert o.filter(F.col("u") == 0).count() == 0
    assert o.filter(F.col("v") == 0).count() == n
    w1 = o.select(F.col("u").alias("pivot"), F.col("v").alias("x"),
                  F.col("dv").alias("dx"))
    w2 = o.select(F.col("u").alias("pivot"), F.col("v").alias("y"),
                  F.col("dv").alias("dy"))
    wedges = w1.join(w2, "pivot").filter(
        F.struct("dx", "x") < F.struct("dy", "y")
    )
    assert wedges.count() == 0  # id orientation would give C(n,2) = 780
    assert triangle_count(star).count() == 0

    # and a hub that IS in triangles still counts correctly: wheel
    # graph (hub 0 + cycle 1..6) -> hub in all 6 triangles (0,i,i+1),
    # each rim node in the 2 triangles with its cycle neighbors
    rim = [(i, i % 6 + 1) for i in range(1, 7)]
    wheel = spark.createDataFrame(
        [(0, i) for i in range(1, 7)] + rim, "src long, dst long"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(wheel).collect()}
    assert got == {0: 6, 1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 6: 2}


# ------------------------------------------------------------ k-core ----


def test_kcore_peels_tendrils_keeps_clique(spark):
    """A K5 with a pendant path: the 2-core is exactly the clique
    (each clique node degree 4); path nodes peel away round by
    round. Duplicate and reversed edges collapse; self-loops drop."""
    from hypermap_etl_spark.operators.graph import k_core
    from hypermap_etl_spark.util import release_persisted

    clique = [(i, j) for i in range(5) for j in range(5) if i < j]
    path = [(4, 10), (10, 11), (11, 12)]
    noise = [(1, 0), (2, 2), (3, 1)]  # reversed dup, self-loop, dup
    df = spark.createDataFrame(clique + path + noise, "src long, dst long")
    out = {r["node"]: r["core_degree"] for r in k_core(df, k=2).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(v == 4 for v in out.values())
    release_persisted()


def test_kcore_cascade_needs_multiple_rounds(spark):
    """A chain hanging off a triangle needs one peel round per link:
    the 2-core converges to the triangle only after the cascade, and
    an n_iter too small to finish leaves the documented partial peel."""
    from hypermap_etl_spark.operators.graph import k_core
    from hypermap_etl_spark.util import release_persisted

    tri = [(0, 1), (1, 2), (0, 2)]
    chain = [(2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(tri + chain, "src long, dst long")
    full = {r["node"] for r in k_core(df, k=2, n_iter=8).collect()}
    assert full == {0, 1, 2}
    # one round only removes the last link's endpoint (node 5 has
    # degree 1); 4 and 3 still looked degree-2 when it was measured
    partial = {r["node"] for r in k_core(df, k=2, n_iter=1).collect()}
    assert partial == {0, 1, 2, 3, 4}
    # empty core: k beyond the max degree peels everything
    assert k_core(df, k=10).count() == 0
    # guard
    import pytest

    with pytest.raises(ValueError):
        k_core(df, k=0)
    release_persisted()


# ------------------------------------------------------ seed distance ----


def test_seed_distance_bfs_semantics(spark):
    """Hop distances on a path with a shortcut: the min over multiple
    routes wins; nodes beyond max_hops are absent; isolated seeds
    still appear at dist 0; direction of the input edge is ignored."""
    from hypermap_etl_spark.operators.graph import k_core, seed_distance
    from hypermap_etl_spark.util import release_persisted

    # 0-1-2-3-4-5 path, plus shortcut 0-4, edge 5-4 given reversed
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 4), (0, 4)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,), (99,)], "node long")
    out = {r["node"]: r["dist"] for r in
           seed_distance(edges, seeds, max_hops=2).collect()}
    # 4 is 1 hop via the shortcut, 5 is 2; 3 is min(3, 2)=2 via 4
    assert out == {0: 0, 99: 0, 1: 1, 4: 1, 2: 2, 5: 2, 3: 2}
    # horizon: max_hops=1 drops the 2-hop ring
    near = {r["node"]: r["dist"] for r in
            seed_distance(edges, seeds, max_hops=1).collect()}
    assert near == {0: 0, 99: 0, 1: 1, 4: 1}
    # max_hops=0: seeds only
    zero = {r["node"] for r in seed_distance(edges, seeds, max_hops=0).collect()}
    assert zero == {0, 99}
    import pytest

    with pytest.raises(ValueError):
        seed_distance(edges, seeds, max_hops=-1)
    release_persisted()


def test_seed_distance_early_exit_matches_full_unroll(spark):
    """A huge max_hops converges early to the same frame as the exact
    eccentricity-bounded run — the property the SQL-unrolled oracle
    relies on."""
    from hypermap_etl_spark.operators.graph import seed_distance
    from hypermap_etl_spark.util import release_persisted

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    exact = sorted(
        (r["node"], r["dist"])
        for r in seed_distance(edges, seeds, max_hops=6).collect()
    )
    big = sorted(
        (r["node"], r["dist"])
        for r in seed_distance(edges, seeds, max_hops=50).collect()
    )
    assert exact == big == [(i, i) for i in range(7)]
    release_persisted()


# ------------------------------------------------------------ LPA ----


def test_lpa_two_cliques_with_bridge(spark):
    """Two K4s joined by one bridge edge settle into two communities,
    each labeled by its smallest member; the bridge does not merge
    them; isolated input nodes never appear (no edges, no node)."""
    from hypermap_etl_spark.operators.graph import label_propagation
    from hypermap_etl_spark.util import release_persisted

    k4a = [(i, j) for i in range(4) for j in range(4) if i < j]
    k4b = [(i, j) for i in range(10, 14) for j in range(10, 14) if i < j]
    bridge = [(3, 10)]
    df = spark.createDataFrame(k4a + k4b + bridge, "src long, dst long")
    out = {r["node"]: r["community"] for r in
           label_propagation(df, n_iter=6).collect()}
    assert {out[i] for i in range(4)} == {0}
    assert {out[i] for i in range(10, 14)} == {10}
    release_persisted()


def test_lpa_fixed_rounds_deterministic_and_tiebreak(spark):
    """On a single edge every round swaps labels toward the smaller
    endpoint's (tie of one neighbor each): the smallest-label rule
    makes round 1 assign node B label A and node A label... B's —
    then round 2 reaches the all-A fixpoint. n_iter=0 returns the
    identity labeling. Reversed duplicate edges collapse."""
    from hypermap_etl_spark.operators.graph import label_propagation
    from hypermap_etl_spark.util import release_persisted

    df = spark.createDataFrame([(7, 3), (3, 7)], "src long, dst long")
    r1 = {r["node"]: r["community"] for r in
          label_propagation(df, n_iter=1).collect()}
    assert r1 == {3: 7, 7: 3}  # synchronous swap
    r2 = {r["node"]: r["community"] for r in
          label_propagation(df, n_iter=2).collect()}
    assert r2 == {3: 3, 7: 7}  # the two-cycle swaps back to identity
    zero = {r["node"]: r["community"] for r in
            label_propagation(df, n_iter=0).collect()}
    assert zero == {3: 3, 7: 7}
    # determinism: same inputs, same result, twice
    a = sorted(map(tuple, label_propagation(df, n_iter=3).collect()))
    b = sorted(map(tuple, label_propagation(df, n_iter=3).collect()))
    assert a == b
    import pytest

    with pytest.raises(ValueError):
        label_propagation(df, n_iter=-1)
    release_persisted()


def test_modularity_two_cliques(spark):
    from pyspark.sql import functions as F

    from hypermap_etl_spark.operators.graph import modularity

    # two disjoint triangles with communities matching the cliques:
    # m=6, every edge intra, d_c=6 per community
    # Q = (4*6*6 - (36+36)) / (4*36) = (144-72)/144 = 0.5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        "src long, dst long",
    )
    comm = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
        "node long, community long",
    )
    out = modularity(edges, comm).collect()[0]
    assert out["n_edges"] == 6 and out["n_communities"] == 2
    assert out["intra_edges"] == 6
    assert out["modularity"] == 0.5

    # everything in ONE community: Q = (4*6*6 - 144)/144 = 0 exactly
    one = comm.select("node", F.lit(1).alias("community"))
    assert modularity(edges, one).collect()[0]["modularity"] == 0.0

    # a bad split (cutting a clique) scores worse than the true one
    bad = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 4), (4, 4), (5, 4), (6, 4)],
        "node long, community long",
    )
    assert modularity(edges, bad).collect()[0]["modularity"] < 0.5

    # duplicate/reversed/self-loop rows collapse; uncovered nodes and
    # their edges are excluded
    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3), (3, 9)],
        "src long, dst long",
    )
    cov = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node long, community long"
    )
    m_out = modularity(messy, cov).collect()[0]
    assert m_out["n_edges"] == 3 and m_out["n_nodes"] == 3
    assert m_out["modularity"] == 0.0


def test_markov_stationary_known_chain(spark):
    from hypermap_etl_spark.operators.graph import markov_stationary
    from hypermap_etl_spark.util import release_persisted

    # M = [[3/4, 1/4], [1/2, 1/2]] -> stationary pi = (2/3, 1/3);
    # the second eigenvalue is 1/4, so 8 iterations sit within 1e-4
    tr = spark.createDataFrame(
        [("a", "a", 3), ("a", "b", 1), ("b", "a", 1), ("b", "b", 1)],
        "from_type string, to_type string, n long",
    )
    out = {r["state"]: r for r in markov_stationary(tr).collect()}
    release_persisted()
    assert out["a"]["n_out"] == 4 and out["b"]["n_out"] == 2
    assert abs(out["a"]["pi"] - 2 / 3) < 1e-4
    assert abs(out["b"]["pi"] - 1 / 3) < 1e-4

    # symmetric 2-cycle: uniform start IS stationary, stays (0.5, 0.5)
    cyc = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)],
        "from_type string, to_type string, n long",
    )
    c = {r["state"]: r["pi"] for r in markov_stationary(cyc).collect()}
    release_persisted()
    assert c == {"a": 0.5, "b": 0.5}

    # dead-end destination: mass renormalizes among live states
    dead = spark.createDataFrame(
        [("a", "a", 1), ("a", "x", 1)],
        "from_type string, to_type string, n long",
    )
    d = {r["state"]: r["pi"] for r in markov_stationary(dead, n_iter=3).collect()}
    release_persisted()
    assert list(d) == ["a"] and d["a"] > 0

    import pytest as _pt

    with _pt.raises(ValueError):
        markov_stationary(tr, n_iter=0)


def test_link_prediction_adamic_adar(spark):
    import math

    from hypermap_etl_spark.operators.graph import link_prediction_aa

    # path graph 1-2-3 plus 1-4, 3-4: non-edges are (1,3) via common
    # neighbors {2, 4} and (2,4) via {1, 3}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], "src long, dst long"
    )
    out = {
        (r["node_a"], r["node_b"]): r
        for r in link_prediction_aa(edges).collect()
    }
    assert set(out) == {(1, 3), (2, 4)}
    # deg(2)=deg(4)=2, deg(1)=deg(3)=2 -> every score = 2/ln(2)
    want = round(2 * round(1 / math.log(2), 12), 6)
    assert out[(1, 3)]["aa_score"] == want
    assert out[(1, 3)]["n_common"] == 2

    # existing edges never appear as candidates
    assert (1, 2) not in out and (3, 4) not in out

    # hub cap: a star center above max_degree pivots nothing
    star = [(0, i) for i in range(1, 8)]
    sdf = spark.createDataFrame(star, "src long, dst long")
    capped = link_prediction_aa(sdf, max_degree=5).collect()
    assert capped == []  # only the center (deg 7) is a shared neighbor
    uncapped = link_prediction_aa(sdf, max_degree=100).collect()
    assert len(uncapped) == 21  # C(7,2) leaf pairs

    import pytest as _pt

    with _pt.raises(ValueError):
        link_prediction_aa(sdf, max_degree=1)
    with _pt.raises(ValueError):
        link_prediction_aa(sdf, top_k=0)


def test_modularity_bounds_and_cf_normalization(spark):
    """Structural invariants: modularity lies in [-0.5, 1]; the CF
    score of a pair equals 1 exactly when two parts always co-occur
    and only with each other."""
    from hypermap_etl_spark.operators.graph import modularity

    # worst split: bipartite K2,2 with sides as "communities" — every
    # edge crosses -> Q = -1/2 exactly (the known lower bound)
    edges = spark.createDataFrame(
        [(1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    comm = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "node long, community long"
    )
    q = modularity(edges, comm).collect()[0]["modularity"]
    assert q == -0.5


def test_triangle_orientation_bounds_hub_wedges(spark):
    """The claim that made the r6 degree-orientation fix matter, pinned
    on a planted power-law hub: node '00' (lexicographically SMALLEST)
    is connected to every spoke. Under the naive id-orientation the hub
    orients all its edges OUTWARD and pivots C(n_spokes, 2) wedges in
    one task's join group — the quadratic-hub trap. Under the shipped
    (degree, id) orientation every hub edge points INTO the hub, its
    pivot fan-out is ZERO, and the global wedge count collapses from
    ~20k to O(edges). Triangle counts stay exact."""
    from pyspark.sql import functions as F

    from hypermap_etl_spark.operators.graph import (
        _orient_by_degree,
        triangle_count,
    )

    n = 200
    hub = "00"
    spokes = [f"s{i:03d}" for i in range(n)]
    edges = [(hub, s) for s in spokes]
    # a short chain among the first spokes → planted triangles with hub
    for i in range(10):
        edges.append((spokes[i], spokes[i + 1]))
    e = (
        spark.createDataFrame(edges, "src string, dst string")
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )

    def wedge_stats(oriented):
        per_pivot = oriented.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        return (
            per_pivot.agg(
                F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("total"),
                F.max(F.col("d") * (F.col("d") - 1) / 2).alias("worst"),
            ).collect()[0]
        )

    # naive id-orientation foil: the hub is ≺-smallest by id, so every
    # hub edge orients outward
    naive = e.select(F.col("a").alias("u"), F.col("b").alias("v"))
    nv = wedge_stats(naive)
    assert nv["worst"] >= n * (n - 1) / 2, "hub must pivot C(n,2) wedges"

    # shipped orientation: hub fan-out bounded; total wedges O(edges)
    ov = wedge_stats(_orient_by_degree(e))
    assert ov["worst"] <= 64, f"hub wedge bound violated: {ov['worst']}"
    assert ov["total"] <= 4 * len(edges), f"wedge total blew up: {ov['total']}"

    # and the counts are still exact: each chain edge (s_i, s_{i+1})
    # closes exactly one triangle with the hub
    got = {r["node"]: r["n_triangles"] for r in triangle_count(
        e, src_col="a", dst_col="b").collect()}
    assert got[hub] == 10
    assert got[spokes[0]] == 1 and got[spokes[10]] == 1
    assert got[spokes[5]] == 2  # interior chain node: two triangles


def test_copurchase_pairs_hub_order_cap(spark, monkeypatch):
    """_copurchase_pairs' hub guard (r11): orders whose distinct-part
    set exceeds _HUB_ORDER_CAP expand through the chunked slice rows,
    and the result is identical to the brute-force pair counts under
    every chunking regime (default cap; cap above every order = the
    single-row r10 shape; tiny caps = all-cross-product chunking, down
    to cap=1 where every pair is a cross pair)."""
    from itertools import combinations

    from hypermap_etl_spark.plans import star_queries as sq

    hub_parts = list(range(1000, 1000 + sq._HUB_ORDER_CAP + 44))  # > cap
    rows = [(1, p) for p in hub_parts]
    rows += [(1, hub_parts[0]), (1, hub_parts[1])]  # dup lines collapse
    rows += [(2, 1000), (2, 1001), (2, 7)]          # small order, overlaps hub
    rows += [(3, 7)]                                # single-part: no pairs
    rows += [(None, 1000), (4, None), (4, 1000), (4, 1001)]  # NULL semantics
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    orders = {}
    for ok, pk in rows:
        if ok is None or pk is None:
            continue
        orders.setdefault(ok, set()).add(pk)
    expected = {}
    for parts in orders.values():
        for p1, p2 in combinations(sorted(parts), 2):
            expected[(p1, p2)] = expected.get((p1, p2), 0) + 1

    def result(cap):
        monkeypatch.setattr(sq, "_HUB_ORDER_CAP", cap)
        return {
            (r["p1"], r["p2"]): r["c"]
            for r in sq._copurchase_pairs(li).collect()
        }

    assert result(sq._HUB_ORDER_CAP) == expected  # hub chunks, small m=1
    assert result(10**9) == expected              # every order single-row
    assert result(3) == expected                  # everything chunked
    assert result(1) == expected                  # pure cross-product pairs
