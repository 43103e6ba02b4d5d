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

__all__ = [
    "MICRO",
    "quantize",
    "seed_centroids",
    "kmeans_assign",
    "kmeans_fit_assign",
    "ivf_search",
]

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


def kmeans_assign(q: DataFrame, centroids: list) -> DataFrame:
    """(vec_id, v, cluster, dist2): nearest centroid per vector, ties
    toward the smaller cluster id.

    ``centroids`` is a driver-side ``[(cluster_id, [int, ...]), ...]``
    (k x dim longs — tiny by construction; same shape MLlib broadcasts).
    Shipping it into a vectorized numpy ``mapInPandas`` kernel makes
    assignment a pure map stage — zero shuffle, no join, one
    (n x k x d) batched matrix distance per Arrow batch.  (A column-
    expression twin via ``F.aggregate`` is 10x slower: Catalyst
    interprets higher-order-function lambdas — same lesson as the
    MinHash numpy path in ops/dedup.py.)

    numpy argmin returns the FIRST minimum, and ``centroids`` is sorted
    by cluster id, so ties break toward the smaller cluster exactly as
    the SQL oracle's ``order by dist, cluster`` does."""
    import numpy as np

    cids = np.asarray([c for c, _ in centroids], dtype="int64")
    cmat = np.asarray([v for _, v in centroids], dtype="int64")  # k x d

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.asarray(
                [np.asarray(v, dtype="int64") for v in pdf["v"]]
            )  # n x d
            # n x k exact integer squared L2
            d2 = ((vmat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            best = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "v": pdf["v"],
                    "cluster": cids[best],
                    "dist2": d2[np.arange(len(best)), best],
                }
            )

    return q.mapInPandas(
        kernel, schema="vec_id long, v array<long>, cluster long, dist2 long"
    )


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


def _collect_centroids(df: DataFrame) -> list:
    """centroid DataFrame -> driver-side list (k x dim longs; the only
    collect in the op, bounded by the centroid count by construction)."""
    return sorted(
        (int(r["cluster"]), [int(x) for x in r["c"]]) for r in df.collect()
    )


def kmeans_fit(
    q: DataFrame, k: int = 8, iterations: int = 2, dim: int = 64
) -> list:
    """Run ``iterations`` Lloyd rounds from deterministic seeds over the
    quantized vectors; returns the fitted driver-side centroid list."""
    centroids = _collect_centroids(seed_centroids(q, k))
    for _ in range(iterations):
        centroids = _collect_centroids(
            _update(kmeans_assign(q, centroids), dim)
        )
    return centroids


def kmeans_fit_assign(
    vecs: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Fit ``iterations`` Lloyd rounds from deterministic seeds, then
    return the final assignment (vec_id, cluster, dist2).

    Each round = one shuffle (the per-dimension centroid update);
    assignment itself never shuffles.  At 10^12 vectors: fit on a
    sample, then run the final ``kmeans_assign`` map stage over the full
    table with the fitted centroid list."""
    q = quantize(vecs, vec_col).cache()
    centroids = kmeans_fit(q, k, iterations, dim)
    return kmeans_assign(q, centroids).select("vec_id", "cluster", "dist2")


def ivf_search(
    q: DataFrame,
    centroids: list,
    queries: list,
    probes: int = 2,
    topk: int = 5,
) -> DataFrame:
    """(q_id, vec_id, dist2, rank): IVF probe search — for each query
    vector, rerank only the vectors assigned to its ``probes`` nearest
    cells, exact integer distances, ties toward the smaller vec_id.

    ``queries`` is a driver-side ``[(q_id, [int, ...]), ...]`` (query
    batches are small by definition; index vectors stay distributed).

    Scale shape: one shuffle-free assignment pass (``kmeans_assign``),
    one vectorized rerank map stage that scores each vector only against
    the queries probing its cell, then a top-k shuffle of (q_id, dist2)
    pairs — candidates only, never the corpus."""
    import numpy as np

    from pyspark.sql import Window

    cids = np.asarray([c for c, _ in centroids], dtype="int64")
    cmat = np.asarray([v for _, v in centroids], dtype="int64")
    qids = [int(i) for i, _ in queries]
    qmat = np.asarray([v for _, v in queries], dtype="int64")  # Q x d

    # probe sets per query, computed on the driver (Q x k tiny)
    qd = ((qmat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    order = np.lexsort((cids[None, :].repeat(len(qids), 0), qd), axis=1)
    probe_sets = {
        qid: {int(cids[j]) for j in order[i, :probes]}
        for i, qid in enumerate(qids)
    }

    assigned = kmeans_assign(q, centroids)

    def rerank(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.asarray(
                [np.asarray(v, dtype="int64") for v in pdf["v"]]
            )
            clusters = pdf["cluster"].to_numpy()
            out_q, out_v, out_d = [], [], []
            for i, qid in enumerate(qids):
                mask = np.isin(
                    clusters, np.asarray(sorted(probe_sets[qid]))
                )
                if not mask.any():
                    continue
                d2 = ((vmat[mask] - qmat[i][None, :]) ** 2).sum(axis=1)
                out_q.extend([qid] * int(mask.sum()))
                out_v.extend(pdf["vec_id"].to_numpy()[mask].tolist())
                out_d.extend(d2.tolist())
            yield pd.DataFrame(
                {"q_id": out_q, "vec_id": out_v, "dist2": out_d}
            )

    scored = assigned.mapInPandas(
        rerank, schema="q_id long, vec_id long, dist2 long"
    )
    w = Window.partitionBy("q_id").orderBy("dist2", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )
