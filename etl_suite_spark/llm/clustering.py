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


def kmeans(
    spark: SparkSession,
    vectors: DataFrame,
    k: int = _K,
    iters: int = _ITERS,
) -> DataFrame:
    """Run Lloyd's for ``iters`` iterations; returns (vec_id, cluster,
    dist_sq). Deterministic end-to-end: fixed init, deterministic argmin,
    exact small-int counts, and avg over a fixed per-group multiset."""
    centroids = (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cluster"),
            F.col("embedding").alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = kmeans_assign(vectors, centroids)
        centroids = kmeans_update(assigned)
        # truncate lineage: each iteration's plan starts from materialized
        # centroids (k tiny rows), not the whole history.
        centroids = centroids.localCheckpoint(eager=True)
    return kmeans_assign(vectors, centroids).select("vec_id", "cluster", "dist_sq")


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
