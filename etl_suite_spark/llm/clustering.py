"""Distributed k-means over embedding columns — the reference's
account/miner tier-clustering analog (SURVEY.md §0.1: sklearn clustering in
the transform stage [K]), re-expressed as pure DataFrame iterations.

Lloyd's algorithm, Spark-shaped:

- assignment: candidates × centroids is a *broadcast* nested loop (k rows
  on the build side — never a shuffle of the big side), argmin by
  (distance, cluster_id) for deterministic ties;
- update: per-(cluster, pos) component means via posexplode + groupBy —
  one shuffle per iteration, keyed uniformly;
- init: first k vectors by vec_id (deterministic; k-means++ would add a
  seeded sampling pass, same plumbing);
- at 100 TB: each iteration is one job; ``.localCheckpoint()`` between
  iterations truncates the lineage so the plan doesn't grow exponentially
  (the classic iterative-algorithm footgun on Spark).

Iterative and therefore not SQL-expressible → rows-only + pytest
invariants (assignment total, determinism, inertia monotonicity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

_K = 5
_ITERS = 5

# Squared L2 distance between two float arrays, in double: per-row scalar
# fold — deterministic (no partial-agg merge involved).
_DIST_SQ = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0.0 AS DOUBLE),"
    " (acc, v) -> acc + v)"
)


def kmeans_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding) × (cluster, centroid) → nearest-cluster rows.
    Centroids are broadcast (k rows); ties break toward the lowest
    cluster id so the assignment is a pure function of the inputs."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "dist_sq", F.expr(_DIST_SQ.format(a="embedding", b="centroid"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist_sq").asc(), F.col("cluster").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def kmeans_update(assigned: DataFrame) -> DataFrame:
    """Recompute centroids as per-(cluster, position) component means,
    then re-collect each centroid into an array ordered by position."""
    comp = assigned.select(
        "cluster", F.posexplode("embedding").alias("pos", "x")
    )
    means = comp.groupBy("cluster", "pos").agg(
        F.avg(F.col("x").cast("double")).alias("m")
    )
    return means.groupBy("cluster").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "m"))
        ).alias("pm")
    ).select(
        "cluster", F.expr("transform(pm, s -> CAST(s.m AS FLOAT))").alias("centroid")
    )


def kmeans_init_first_k(vectors: DataFrame, k: int) -> DataFrame:
    """First k vectors by vec_id — cheap deterministic init."""
    return (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cluster"),
            F.col("embedding").alias("centroid"),
        )
    )


def kmeans_init_pp(vectors: DataFrame, k: int) -> DataFrame:
    """k-means++-style spread init, deterministic: farthest-first traversal.

    Seed with the lowest vec_id, then k−1 times pick the vector maximizing
    distance² to its nearest already-chosen centroid (ties → lowest
    vec_id). This is the derandomized k-means++ (choose argmax instead of
    sampling ∝ D²) — same O(k·N) work as the sampled version: each round
    is one broadcast nested loop over the candidates + a global top-1
    (TakeOrderedAndProject, no full sort). Spread-out seeds cut Lloyd
    iterations, which at 100 TB matters more than the init's k extra jobs.
    """
    chosen = (
        vectors.orderBy("vec_id")
        .limit(1)
        .select(F.lit(1).alias("cluster"), F.col("embedding").alias("centroid"))
        .localCheckpoint(eager=True)
    )
    for i in range(2, k + 1):
        # fold the ≤k chosen centroids into ONE broadcast row of
        # array<array<float>> so the per-vector min-distance is a map-only
        # higher-order function — zero shuffle of the candidate side; the
        # global argmax is TakeOrderedAndProject (no full sort).
        cents = chosen.agg(F.collect_list("centroid").alias("cs"))
        scored = vectors.crossJoin(F.broadcast(cents)).withColumn(
            "d2",
            F.expr(
                "array_min(transform(cs, c -> "
                + _DIST_SQ.format(a="embedding", b="c")
                + "))"
            ),
        )
        nxt = (
            scored.orderBy(F.col("d2").desc(), F.col("vec_id").asc())
            .limit(1)
            .select(F.lit(i).alias("cluster"), F.col("embedding").alias("centroid"))
        )
        chosen = chosen.unionByName(nxt).localCheckpoint(eager=True)
    return chosen


def kmeans_fit(
    spark: SparkSession,
    vectors: DataFrame,
    k: int = _K,
    iters: int = _ITERS,
    init: str = "first_k",
) -> tuple[DataFrame, DataFrame]:
    """Run Lloyd's for ``iters`` iterations; returns (assignments,
    centroids) where assignments is (vec_id, cluster, dist_sq) and
    centroids is (cluster, centroid). Deterministic end-to-end: fixed
    init, deterministic argmin, exact small-int counts, and avg over a
    fixed per-group multiset."""
    if init == "pp":
        centroids = kmeans_init_pp(vectors, k)
    else:
        centroids = kmeans_init_first_k(vectors, k)
    for _ in range(iters):
        assigned = kmeans_assign(vectors, centroids)
        centroids = kmeans_update(assigned)
        # truncate lineage: each iteration's plan starts from materialized
        # centroids (k tiny rows), not the whole history.
        centroids = centroids.localCheckpoint(eager=True)
    final = kmeans_assign(vectors, centroids).select("vec_id", "cluster", "dist_sq")
    return final, centroids


def kmeans(
    spark: SparkSession,
    vectors: DataFrame,
    k: int = _K,
    iters: int = _ITERS,
    init: str = "first_k",
) -> DataFrame:
    """Assignment-only convenience wrapper over :func:`kmeans_fit`."""
    return kmeans_fit(spark, vectors, k, iters, init)[0]


@query("ml_kmeans_tiers")  # rows-only: iterative, not SQL-expressible
def ml_kmeans_tiers(spark, sf_dir):
    """Tier assignment for every embedding: 5 clusters, 5 Lloyd
    iterations. The reference's 'cluster accounts/miners into tiers'
    transform, minus sklearn and minus any driver-side data movement."""
    vectors = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = kmeans(spark, vectors)
    return out.select(
        "vec_id", "cluster", F.round("dist_sq", 6).alias("dist_sq")
    ).orderBy("vec_id")


@query("ml_kmeanspp_tiers")  # rows-only: iterative, not SQL-expressible
def ml_kmeanspp_tiers(spark, sf_dir):
    """Same clustering with derandomized k-means++ (farthest-first) init:
    spread seeds reach comparable inertia in fewer Lloyd iterations (3
    here vs 5 above; pytest pins pp-inertia within 1% of first-k at equal
    iterations plus Lloyd monotonicity under pp init)."""
    vectors = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = kmeans(spark, vectors, iters=3, init="pp")
    return out.select(
        "vec_id", "cluster", F.round("dist_sq", 6).alias("dist_sq")
    ).orderBy("vec_id")
