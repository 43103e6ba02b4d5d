"""Distributed BPE merge training (Sennrich et al., ACL 2016) — the
tokenizer-training step of an LLM data pipeline, learned from the
corpus the rest of this package cleans and dedups.

Scale insight that makes BPE trainable at 10^12 documents: the
algorithm never needs the corpus after ONE word-count aggregation.
Training state is the DISTINCT-WORD table weighted by frequency —
Zipf-bounded (~10^6-10^8 types at web scale, vs 10^14 tokens), so
every merge round is a vocabulary-sized job: one pair-count
aggregation (map-side partials over the word table) + one row-local
merge application.  The only driver-side data is the single best pair
per round (K one-row collects, same K-sized-collect stance as
ops/ivf.py's centroids).

Determinism / oracle portability: a word's symbol sequence is encoded
as a DOUBLE-SPACE-joined string ("h  e  l  l  o").  Applying merge
(a, b) is a left-to-right fold over the symbol ARRAY that fuses only
exact adjacent full-symbol pairs (:func:`_apply_merge`) — a plain
substring ``replace(ws, 'a  b', 'ab')`` is WRONG once symbols are
multi-char, because a symbol merely *ending* with ``a`` or *starting*
with ``b`` also matches across the separator (rule ``(e, t)`` would
corrupt ``m  e  th  o  d`` into ``m  eth  o  d``).  The fold gives
greedy left-to-right non-overlapping semantics exactly
("a  a  a  a" -> "aa  aa", not "aa  a  a"): a freshly fused symbol
``ab`` can never be the LEFT of another fuse of the same rule since
``ab != a``.  The DuckDB oracles mirror the same fold via
``list_reduce``.  Ties on pair frequency break by the pair string
ascending, so the learned merge table is a pure function of the
corpus on every engine.

Perf note: the fold is a Catalyst higher-order function (interpreted
lambda), but it only ever runs over the DISTINCT word-TYPE table —
vocabulary-sized, not corpus-sized — so the interpreted path is
irrelevant to pipeline throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.ops.common import tokens

__all__ = ["bpe_train", "bpe_encode"]


def _apply_merge(ws, left: str, right: str):
    """Apply one BPE merge rule ``(left, right)`` to a double-space-
    joined symbol string column: fold over the symbol array, fusing an
    adjacent pair only when the PREVIOUS FULL SYMBOL equals ``left``
    and the current symbol equals ``right``.  Boundary-anchored — a
    symbol that merely ends with ``left`` (checked via the ``'  ' +
    left`` suffix; symbols never contain spaces) or starts with
    ``right`` can't match, unlike a raw substring replace."""
    lit_l = F.lit(left)
    sep_l = F.lit("  " + left)
    merged = F.lit(left + right)
    return F.aggregate(
        F.split(ws, "  "),
        F.lit(""),
        lambda acc, x: F.when(acc == F.lit(""), x)
        .when(
            ((acc == lit_l) | acc.endswith(sep_l)) & (x == F.lit(right)),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - F.lit(len(left))),
                merged,
            ),
        )
        .otherwise(F.concat(acc, F.lit("  "), x)),
    )


def bpe_train(docs: DataFrame, n_merges: int = 5) -> DataFrame:
    """``(rank, left, right, freq)`` — the first ``n_merges`` BPE merge
    rules learned from the corpus' normalized token stream, in learning
    order; ``freq`` is the merged pair's weighted frequency at the time
    it was chosen.  Stops early (fewer rows) if the vocabulary runs out
    of pairs.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .select(
            F.concat_ws(
                "  ",
                F.expr(
                    "transform(sequence(1, length(w)),"
                    " i -> substring(w, i, 1))"
                ),
            ).alias("ws"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    spark = docs.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        arr = F.split(F.col("ws"), "  ")
        pairs = words.select(
            F.explode(
                F.when(
                    F.size(arr) >= 2,
                    F.expr(
                        "transform(sequence(1, size(split(ws, '  ')) - 1),"
                        " i -> concat(element_at(split(ws, '  '), i),"
                        " '  ', element_at(split(ws, '  '), i + 1)))"
                    ),
                ).otherwise(F.array())
            ).alias("pair"),
            "n",
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, freq = best[0]["pair"], int(best[0]["c"])
        left, right = pair.split("  ")
        merges.append((r, left, right, freq))
        words = words.select(
            _apply_merge(F.col("ws"), left, right).alias("ws"),
            "n",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, freq long"
    )


def bpe_encode(docs: DataFrame, n_merges: int = 5) -> DataFrame:
    """``(doc_id, n_words, n_bpe_tokens)`` — tokenize the corpus with
    the ``n_merges``-rule BPE vocabulary learned from it (train +
    apply, the full Sennrich loop): per document, its word count and
    its symbol count under the learned merges — the "how many tokens
    is this corpus" question every LLM data budget starts with.

    Scale shape mirrors :func:`bpe_train`: merges apply on the
    DISTINCT word-TYPE table (row-local chained literal replaces, one
    per rule), and the per-document totals come from joining the
    (doc_id, word, m) counts to the type table on the uniform word key
    and aggregating ``sum(m · symbols(word))`` — the corpus text is
    read once and never re-tokenized per rule.  The learned rules ride
    along as a K-row driver list (same stance as the trainer).
    """
    rules = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges).orderBy("rank").collect()
    ]
    dw = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("m"))
    )
    types = dw.select("w").distinct().select(
        "w",
        F.concat_ws(
            "  ",
            F.expr(
                "transform(sequence(1, length(w)),"
                " i -> substring(w, i, 1))"
            ),
        ).alias("ws"),
    )
    for left, right in rules:
        types = types.select(
            "w", _apply_merge(F.col("ws"), left, right).alias("ws")
        )
    types = types.select(
        "w", F.size(F.split(F.col("ws"), "  ")).alias("syms")
    )
    return dw.join(types, "w").groupBy("doc_id").agg(
        F.sum("m").alias("n_words"),
        F.sum(F.col("m") * F.col("syms")).alias("n_bpe_tokens"),
    )
