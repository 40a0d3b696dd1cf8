"""Similarity search over embedding columns (north-star set).

Embeddings are `array<float>`; all kernels cast to double and use
zip_with/aggregate HOFs — JVM-evaluated, no Python on the hot path.

  brute_force_topk   exact cosine top-k: the correctness baseline.
                     Query side is small (sampled) and broadcast; the
                     corpus side streams — no shuffle of the big side,
                     per-partition top-k via window over (query, sim).
  lsh_topk           sign-random-projection buckets (deterministic
                     md5-derived hyperplanes) — the scale path: each
                     query only scores its bucket's corpus slice.
  cosine_neardup     all-pairs cosine ≥ threshold; exact, with the
                     corpus-side self-join keyed by id inequality.
  knn_label_vote     majority label of the exact top-k (simple kNN).

Determinism: similarities are rounded to 6 dp and ranked by
(rounded sim desc, vec_id asc) so results are reproducible across
engines for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hypermap_etl_spark.util import fan_out


def _vd(col) -> Column:
    return F.col(col).cast("array<double>")


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per vector."""
    v = _vd(vec_col)
    return emb.withColumn(
        "__norm",
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)),
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Zero-norm-safe cosine (ANSI mode would raise on divide-by-zero;
    convention: similarity to a zero vector is 0)."""
    denom = norm_a * norm_b
    return F.when(denom != 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    emb: DataFrame,
    k: int = 5,
    query_filter: Column | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for each query vector against the corpus.

    queries ⨉ corpus via broadcast of the (small) query side; ranking by
    (rounded sim desc, id asc) inside a window keyed by query id.
    """
    nemb = with_norm(fan_out(emb), vec_col)
    q = nemb.filter(query_filter) if query_filter is not None else nemb
    q = q.select(
        F.col(id_col).alias("query_id"),
        _vd(vec_col).alias("qv"),
        F.col("__norm").alias("qn"),
    )
    c = nemb.select(
        F.col(id_col).alias("neighbor_id"),
        _vd(vec_col).alias("cv"),
        F.col("__norm").alias("cn"),
    )
    sim = F.round(
        cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 6
    ).alias("sim")
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def cosine_neardup_pairs(
    emb: DataFrame, threshold: float = 0.45, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact).

    O(n²) scoring — correct baseline; at corpus scale use lsh_topk's
    bucketing to restrict candidate generation first.
    """
    nemb = with_norm(fan_out(emb), vec_col).select(
        F.col(id_col).alias("id"), _vd(vec_col).alias("v"), F.col("__norm").alias("n")
    )
    sim = F.round(
        cosine(F.col("a.v"), F.col("b.v"), F.col("a.n"), F.col("b.n")), 6
    ).alias("sim")
    return (
        nemb.alias("a")
        .join(nemb.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), sim)
        .filter(F.col("sim") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible
    across runs/clusters with no RNG state."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"pl{p}_{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id (one bit per plane)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    query_filter: Column | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only within the query's SRP bucket.

    2^n_planes buckets shrink each query's candidate set ~2^n_planes-fold;
    the bucket join is an equi-join (shuffle on bucket id), so total work
    scales linearly in corpus size instead of quadratically. Recall is
    approximate by design — the exact variant is the oracle baseline.
    """
    planes = _hyperplanes(dim, n_planes)
    nemb = with_norm(fan_out(emb), vec_col).withColumn("bucket", lsh_bucket(_vd(vec_col), planes))
    q = nemb.filter(query_filter) if query_filter is not None else nemb
    q = q.select(
        F.col(id_col).alias("query_id"),
        _vd(vec_col).alias("qv"),
        F.col("__norm").alias("qn"),
        "bucket",
    )
    c = nemb.select(
        F.col(id_col).alias("neighbor_id"),
        _vd(vec_col).alias("cv"),
        F.col("__norm").alias("cn"),
        "bucket",
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 6).alias("sim")
    scored = (
        q.join(c, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    query_filter: Column | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into inverted
    lists around centroids, probe only the n_probe nearest lists per
    query.

    Centroids are chosen deterministically (the vectors whose id ranks
    first in each of n_centroids uniform hash buckets — a k-means init
    without iterative refinement; swap in real k-means offline when
    recall matters more). Corpus side shuffles once on centroid id;
    each query scores |corpus|·(n_probe/n_centroids) candidates.
    """
    nemb = with_norm(fan_out(emb), vec_col)

    # deterministic centroid pick: first vector id in each hash bucket
    from pyspark.sql.window import Window as W

    bucketed = nemb.withColumn("__cb", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_centroids)))
    w = W.partitionBy("__cb").orderBy(F.col(id_col))
    centroids = (
        bucketed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("__cb").alias("cid"), _vd(vec_col).alias("cv"), F.col("__norm").alias("cn"))
        .collect()
    )
    cent = [(int(r["cid"]), list(r["cv"]), float(r["cn"])) for r in centroids]

    def _nearest(vec: Column, norm: Column, n: int) -> Column:
        """ids of the n nearest centroids as an array column."""
        sims = F.array(
            *[
                F.struct(
                    cosine(
                        vec,
                        F.array(*[F.lit(x) for x in cv]),
                        norm,
                        F.lit(cn),
                    ).alias("s"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cv, cn in cent
            ]
        )
        top = F.slice(F.reverse(F.array_sort(sims)), 1, n)
        return F.transform(top, lambda t: t["cid"])

    corpus = nemb.select(
        F.col(id_col).alias("neighbor_id"),
        _vd(vec_col).alias("cv"),
        F.col("__norm").alias("cn"),
        _nearest(_vd(vec_col), F.col("__norm"), 1).getItem(0).alias("cid"),
    )
    q = nemb.filter(query_filter) if query_filter is not None else nemb
    queries = q.select(
        F.col(id_col).alias("query_id"),
        _vd(vec_col).alias("qv"),
        F.col("__norm").alias("qn"),
        F.explode(_nearest(_vd(vec_col), F.col("__norm"), n_probe)).alias("cid"),
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 6).alias("sim")
    scored = (
        queries.join(corpus, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim)
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def knn_label_vote(
    emb: DataFrame,
    k: int = 5,
    query_filter: Column | None = None,
    label_col: str = "label",
) -> DataFrame:
    """Predict each query's label by majority vote of its exact top-k
    neighbors (ties → smaller label wins, deterministic)."""
    topk = brute_force_topk(emb, k, query_filter)
    labeled = topk.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col(label_col).alias("nlabel")),
        "neighbor_id",
    )
    votes = labeled.groupBy("query_id", "nlabel").agg(F.count(F.lit(1)).alias("votes"))
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("nlabel"))
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("nlabel").alias("label_pred"), "votes")
    )
