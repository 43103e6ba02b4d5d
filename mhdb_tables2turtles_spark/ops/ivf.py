"""IVF-style clustering for embedding similarity search: deterministic
mini k-means in integer micro-units.

Complements :mod:`ops.similarity`'s hyperplane-LSH ANN with the other
standard scale path: partition the vector space into k Voronoi cells
(Lloyd iterations), assign every vector to its cell, and at query time
probe only the nearest cell(s) + exact rerank.  This module implements
the index-construction half as an oracle-checkable batch operator.

Determinism contract (the driver hash-compares values):

* vectors are quantized to integer micro-units up front
  (``round(x * 1e6)`` — both engines round half away from zero on the
  same IEEE doubles, so the quantized longs are identical);
* distances are exact integer sums of squares (no float accumulation
  order issues);
* seeds are the k vectors with the smallest ``(md5-hash(vec_id),
  vec_id)`` — a deterministic pseudo-random sample;
* centroid updates use ``floor(sum/count)`` per dimension; ties in
  assignment break toward the smaller cluster id.

Scale shape: centroids are a k-row broadcast; assignment is a narrow
map stage (broadcast nested loop, k small); the update is one shuffle
of ``(cluster, dim, value)`` triples — uniform keys, k*dim reducers'
worth of state.  At 10^12 vectors you run a few Lloyd rounds over a
sample, then one final assignment pass over everything; ``kmeans_assign``
with precomputed centroids is exactly that pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.ops.common import hash60

__all__ = ["MICRO", "quantize", "seed_centroids", "kmeans_assign", "kmeans_fit_assign"]

MICRO = 1_000_000


def quantize(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, v): embedding quantized to integer micro-units."""
    return vecs.select(
        "vec_id",
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * MICRO).cast("long"),
        ).alias("v"),
    )


def seed_centroids(q: DataFrame, k: int) -> DataFrame:
    """(cluster, c): initial centroids = the k quantized vectors with the
    smallest (md5-hash(vec_id), vec_id); cluster ids 0..k-1 in that
    order."""
    from pyspark.sql import Window

    w = Window.orderBy(hash60(F.col("vec_id").cast("string")), "vec_id")
    return (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select((F.col("rn") - 1).alias("cluster"), F.col("v").alias("c"))
    )


def _dist2(v, c):
    # exact integer squared L2 (sum of 64 products of ~1e6-scale longs
    # stays far below 2^63)
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_assign(q: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cluster, dist2): nearest centroid per vector, ties toward
    the smaller cluster id.  Broadcast nested loop — k rows replicated,
    vectors never shuffled."""
    d = _dist2(F.col("v"), F.col("c"))
    scored = q.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "v",
        "cluster",
        d.alias("dist2"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("dist2", "cluster")).alias("b")
    )
    return scored.join(best, "vec_id").filter(
        (F.col("dist2") == F.col("b.dist2"))
        & (F.col("cluster") == F.col("b.cluster"))
    ).select("vec_id", "v", "cluster", "dist2")


def _update(assigned: DataFrame, dim: int) -> DataFrame:
    """New centroids = per-dimension floor(mean) of member vectors."""
    per_dim = assigned.select(
        "cluster", F.posexplode("v").alias("i", "x")
    ).groupBy("cluster", "i").agg(
        F.floor(F.sum("x") / F.count("*")).alias("m")
    )
    return per_dim.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )


def kmeans_fit_assign(
    vecs: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Fit ``iterations`` Lloyd rounds from deterministic seeds, then
    return the final assignment (vec_id, cluster, dist2)."""
    q = quantize(vecs, vec_col).cache()
    centroids = seed_centroids(q, k)
    for _ in range(iterations):
        centroids = _update(kmeans_assign(q, centroids), dim)
    return kmeans_assign(q, centroids).select("vec_id", "cluster", "dist2")
