"""Similarity search over an embedding column (``array<float>``).

* :func:`topk_bruteforce` — exact cosine top-k, the correctness baseline.
  The dot product is a row-local ``zip_with``/``aggregate`` expression
  (JVM, codegen); the only shuffle is the final per-query top-k
  (``row_number`` over query partitions).
* :func:`lsh_buckets` / :func:`topk_lsh` — the scale path: signed random
  projections (hyperplane LSH).  The plane matrix is **deterministically
  derived from md5** (:func:`common.py_hash60`), so buckets are
  reproducible across engines and cluster sizes; candidates are pairs
  sharing a bucket, then ranked by exact cosine.  At 100 TB the
  brute-force cross join is infeasible; LSH reduces it to
  per-bucket joins with uniform keys.
* :func:`embedding_near_duplicates` — near-dup pairs (cosine >= tau)
  via the same buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.ops.common import py_hash60

__all__ = [
    "cosine",
    "plane_matrix",
    "topk_bruteforce",
    "lsh_buckets",
    "lsh_buckets_np",
    "topk_lsh",
    "embedding_near_duplicates",
]


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Row-local cosine similarity of two double arrays."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _emb_double(col: F.Column) -> F.Column:
    # float->double early: keeps all arithmetic in double precision,
    # matching the SQL oracle's float handling
    return F.transform(col, lambda v: v.cast("double"))


def plane_matrix(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic hyperplane weights in [-1, 1]:
    w[p][d] = (hash60(f"{p},{d}") % 2001 - 1000) / 1000.

    Pure md5 — the SQL oracle can regenerate the identical matrix.
    """
    return [
        [((py_hash60(f"{p},{d}") % 2001) - 1000) / 1000.0 for d in range(dim)]
        for p in range(n_planes)
    ]


def topk_bruteforce(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id, cos).

    ``queries`` (query_id, embedding) is assumed small → broadcast, so
    the 'cross join' is a map-side nested loop; no all-to-all shuffle.
    ``cos`` is rounded to 6 dp for engine-portable determinism; ties
    break by neighbor_id.
    """
    e = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        _emb_double(F.col("embedding")).alias("emb_n"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        _emb_double(F.col("embedding")).alias("emb_q"),
    )
    scored = (
        e.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("emb_q"), F.col("emb_n")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """(vec_id, table_id, bucket): sign-of-projection bits packed into an
    int, for ``n_tables`` independent hash tables (multi-table LSH —
    recall compounds across tables while each table's bucket join stays
    uniform and narrow).

    The plane matrices ride as literal array expressions — no join, no
    broadcast variable, fully row-local.  Table t uses plane ids
    ``[t*n_planes, (t+1)*n_planes)`` of the deterministic md5 matrix.
    """
    emb = _emb_double(F.col("embedding"))
    all_planes = plane_matrix(n_planes * n_tables, dim)
    tables = []
    for t in range(n_tables):
        bucket = None
        for p in range(n_planes):
            w = all_planes[t * n_planes + p]
            wcol = F.array(*[F.lit(x) for x in w])
            proj = F.aggregate(
                F.zip_with(emb, wcol, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit = F.when(proj > 0, F.shiftleft(F.lit(1), p)).otherwise(0)
            bucket = bit if bucket is None else bucket + bit
        tables.append(
            F.struct(F.lit(t).alias("table_id"), bucket.cast("long").alias("bucket"))
        )
    return embeddings.select(
        "vec_id", F.explode(F.array(*tables)).alias("tb")
    ).select("vec_id", F.col("tb.table_id").alias("table_id"), F.col("tb.bucket").alias("bucket"))


def lsh_buckets_np(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """Numpy ``mapInPandas`` twin of :func:`lsh_buckets` (the bench/scale
    path): one (batch x planes) matmul instead of ``n_planes x n_tables``
    interpreted HOF folds per row.

    Exactness note: per-element products are identical (float32 widens to
    float64 exactly, same as the column version's cast-then-multiply);
    only the summation ORDER differs (numpy pairwise vs the fold's
    left-to-right), so a bucket bit could in principle differ when a
    projection sits within ~1 ulp of zero — probability ~1e-15 per
    projection with O(1)-magnitude projections.  The equality test locks
    the fixture; the DuckDB oracle carries the same (accepted) tolerance.
    """
    import numpy as np

    w_mat = np.array(plane_matrix(n_planes * n_tables, dim), dtype=np.float64)
    shifts = np.arange(n_planes, dtype=np.int64)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"vec_id": [], "table_id": [], "bucket": []}
                )
                continue
            emb = np.stack(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            bits = (emb @ w_mat.T > 0).astype(np.int64)  # (n, planes*tables)
            vec_ids = pdf["vec_id"].to_numpy()
            ids, tabs, bucks = [], [], []
            for t in range(n_tables):
                chunk = bits[:, t * n_planes : (t + 1) * n_planes]
                ids.append(vec_ids)
                tabs.append(np.full(n, t, dtype=np.int32))
                bucks.append((chunk << shifts).sum(axis=1))
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(ids),
                    "table_id": np.concatenate(tabs),
                    "bucket": np.concatenate(bucks),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id long, table_id int, bucket long"
    )


def topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    n_tables: int = 8,
) -> DataFrame:
    """ANN top-k: candidates share the query's bucket in ANY of the
    ``n_tables`` LSH tables, ranked by exact cosine.  Recall compounds
    across tables (1-(1-p^m)^L); each bucket join keys on
    (table_id, bucket) — uniform by construction."""
    b_all = lsh_buckets_np(embeddings, n_planes, dim, n_tables)
    e = embeddings.join(b_all, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        _emb_double(F.col("embedding")).alias("emb_n"),
        "table_id",
        "bucket",
    )
    qb = queries.join(b_all, "vec_id").select(
        F.col("vec_id").alias("query_id"),
        _emb_double(F.col("embedding")).alias("emb_q"),
        "table_id",
        "bucket",
    )
    scored = (
        e.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("emb_q"), F.col("emb_n")), 6).alias("cos"),
        )
        .distinct()  # a pair may collide in several tables — keep one row
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    tau: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """(vec_a < vec_b, cos) pairs with cosine >= tau among candidates
    sharing a bucket in any table — embedding-space near-dedup.  High tau
    pairs almost always collide (p = (1 - theta/pi)^m per table), so few
    tables suffice."""
    b = lsh_buckets_np(embeddings, n_planes, dim, n_tables)
    e = embeddings.join(b, "vec_id").select(
        "vec_id",
        _emb_double(F.col("embedding")).alias("emb"),
        "table_id",
        "bucket",
    )
    a2 = e.alias("a")
    b2 = e.alias("b")
    return (
        a2.join(b2, ["table_id", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.emb"), F.col("b.emb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= tau)
        .distinct()
    )
