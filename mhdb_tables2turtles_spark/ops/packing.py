"""Sequence packing for training-data preparation: greedily pack
documents into fixed token-budget context windows.

The classic pretraining step after cleaning/dedup/sampling: documents
are concatenated into ``budget``-token sequences; a document that would
overflow the current window starts the next one (no document splitting
here — split-long-docs is a separate upstream op).  Greedy sequential
packing carries running state across rows, which window functions can't
express, so the Spark side is an ``applyInPandas`` per-group kernel and
the DuckDB oracle is a recursive CTE stepping row-by-row — both walk
the identical (group, doc order) sequence, so results are bit-equal.

Scale shape: one shuffle keyed by the packing group (source/shard).
Groups are processing shards, not semantic units — at 10^12 docs you
pack per (source, hash-bucket) so each group fits an executor; the
group loop itself is O(docs in group) integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.ops.common import tokens

__all__ = ["pack_documents", "split_documents"]


def pack_documents(
    docs: DataFrame,
    budget: int = 256,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group, doc_id, n_tokens, pack_id, pack_fill): greedy sequential
    packing of each group's documents (ascending id) into windows of at
    most ``budget`` tokens; an oversized document occupies its own
    window.  ``pack_fill`` is the window's running total after this
    document — the last row of a pack carries its final size."""
    import pandas as pd

    sized = docs.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, fills = [], []
        pack, fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill and fill + n > budget:
                pack += 1
                fill = 0
            fill += n
            pack_ids.append(pack)
            fills.append(fill)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return sized.groupBy("group").applyInPandas(
        kernel,
        schema="group string, doc_id long, n_tokens long, "
        "pack_id long, pack_fill long",
    )


def split_documents(
    docs: DataFrame, budget: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, chunk_id, n_chunks, chunk_tokens, chunk_text): split
    each document into consecutive ``budget``-token chunks (the upstream
    op that makes :func:`pack_documents`'s no-splitting rule safe — run
    split first and nothing oversized reaches the packer).

    Pure row-local explode: ``sequence`` over ceil(n/budget) chunk
    indexes, each chunk a ``slice`` of the token array — codegen'd, zero
    shuffle, and expressible verbatim in the SQL oracle."""
    toks = tokens(F.col("text"))
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(budget)).cast("int")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("ts"),
            n.alias("n_tokens"),
            n_chunks.alias("n_chunks"),
        )
        .select(
            "doc_id",
            "ts",
            "n_chunks",
            F.explode(F.sequence(F.lit(1), F.col("n_chunks"))).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            "n_chunks",
            F.size(
                F.slice(F.col("ts"), (F.col("chunk_id") - 1) * budget + 1, budget)
            ).alias("chunk_tokens"),
            F.concat_ws(
                " ",
                F.slice(F.col("ts"), (F.col("chunk_id") - 1) * budget + 1, budget),
            ).alias("chunk_text"),
        )
    )
