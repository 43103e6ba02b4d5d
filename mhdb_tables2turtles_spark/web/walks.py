"""Deterministic random-walk corpus over the entity graph — the
training-data generator for KG embeddings (DeepWalk, Perozzi et al.
KDD 2014 / node2vec's p=q=1 case): each walk is a "sentence" of
entities fed to a skip-gram trainer, which is how web-scale KGs get
dense entity vectors for the linking and ANN stages this repo already
ships (web/linking.py, ops/similarity.py).

Distributed shape — the textbook scale plan, NOT a per-node Python
loop:

* Adjacency is symmetrized, DEDUPED, sorted, and row-numbered once:
  ``(node, idx, nbr)`` with idx in [0, deg).  One shuffle.
* Every walk advances in lockstep: step i is ONE equi-join of the
  walk frontier against the adjacency on ``(cur = node, idx = pick)``
  — uniform hash keys (walk ids), never a hot key, traffic exactly
  |walks| rows per step.  L steps = L joins, each AQE-planned
  (broadcast when the graph is small, shuffle-hash when it is not).
* "Random" is a HASH of (walk_id, step, current node) — the same
  engine-portable md5 device as every fixture in this repo, so walks
  are reproducible across runs, partitionings, AND engines: the DuckDB
  oracle replays the identical arithmetic.  Real deployments swap in
  xxhash64 of the same tuple; determinism-under-reshuffle is the
  property that matters (resumable epochs re-generate identical
  corpora).

Walk state never accumulates: only the CURRENT node and the growing
path string travel; at 10^12 scale the path column is the dominant
payload and is exactly the output being produced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mhdb_tables2turtles_spark.ops.common import hash60

__all__ = ["random_walks", "skipgram_pairs"]


def random_walks(
    edges: DataFrame, walk_len: int = 4, walks_per_node: int = 1
) -> DataFrame:
    """``(walk_id, path)`` — ``walks_per_node`` deterministic walks of
    ``walk_len`` steps from every node of the undirected graph of
    distinct ``(src, dst)`` pairs; ``path`` is the ``->``-joined node
    sequence (walk_len + 1 nodes).

    Step rule: from node v at step i of walk w, move to neighbor
    ``sorted_neighbors(v)[hash60(w || '|' || v || '|' || i) % deg(v)]``.
    Every node of an edge-derived universe has degree >= 1, so walks
    never strand.
    """
    if walk_len < 1 or walks_per_node < 1:
        raise ValueError("walk_len and walks_per_node must be >= 1")
    both = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionByName(
            edges.select(
                F.col("dst").alias("node"), F.col("src").alias("nbr")
            )
        )
        .distinct()
    )
    adj = both.withColumn(
        "idx",
        F.row_number().over(
            Window.partitionBy("node").orderBy("nbr")
        )
        - 1,
    )
    adj = adj.localCheckpoint(eager=True)
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    deg = deg.localCheckpoint(eager=True)

    walks = None
    for w in range(walks_per_node):
        s = deg.select(
            F.concat_ws("#", F.col("node"), F.lit(str(w))).alias(
                "walk_id"
            ),
            F.col("node").alias("cur"),
            F.col("node").alias("path"),
        )
        walks = s if walks is None else walks.unionByName(s)

    adj_slim = adj.select("node", "idx", "nbr")
    for i in range(walk_len):
        # two-phase step: attach deg first (1 row per walk), THEN
        # equi-join the adjacency on (node, idx) — pure join keys on
        # both sides, so per-step traffic is |walks| rows, never the
        # |walks| x deg fan-out a post-join idx filter would scan
        staged = walks.join(
            deg, walks["cur"] == deg["node"]
        ).select(
            "walk_id",
            "cur",
            "path",
            (
                hash60(
                    F.concat_ws(
                        "|", F.col("walk_id"), F.col("cur"), F.lit(str(i))
                    )
                )
                % F.col("deg")
            ).alias("pick"),
        )
        walks = staged.join(
            adj_slim,
            (staged["cur"] == adj_slim["node"])
            & (staged["pick"] == adj_slim["idx"]),
        ).select(
            "walk_id",
            F.col("nbr").alias("cur"),
            F.concat_ws("->", "path", "nbr").alias("path"),
        )
    return walks.select("walk_id", "path")


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """``(center, context, n_pairs)`` — the skip-gram training pairs a
    DeepWalk pipeline actually feeds to the embedding trainer: every
    (position i, position j) co-occurrence with 0 < |i - j| <=
    ``window`` inside one walk, aggregated over the whole corpus.

    ONE posexplode + a self-join keyed on walk_id (walks are
    fixed-length and walk ids uniform, so the join is skew-free with
    per-key fan-out bounded by (walk_len+1)^2) + ONE aggregation with
    map-side partials.  ``walks`` is the (walk_id, path) output of
    :func:`random_walks`.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = walks.select(
        "walk_id",
        F.posexplode(F.split("path", "->")).alias("i", "node"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("a.i") != F.col("b.i"))
            & (F.abs(F.col("a.i") - F.col("b.i")) <= window)
        )
        .groupBy(
            F.col("a.node").alias("center"),
            F.col("b.node").alias("context"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )
