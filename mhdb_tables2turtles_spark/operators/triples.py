"""Canonical triple model.

The reference accumulates triples in a nested dict
``{subject: {predicate: set(objects)}}`` (add_to_statements,
/root/reference/mhdb/ingest.py:28-76).  Spark-side the graph is a plain
DataFrame with explicit ordering columns standing in for dict insertion
order (Spark has none):

    subject    string   Turtle token (":Label", "prefix:name", "<...>")
    predicate  string
    object     string   Turtle token or formatted literal
    sheet_rank int      which input table emitted it (stable spec order)
    row_id     long     source-row ordinal within the table
    pred_rank  int      emission order of the predicate within the row

Set-semantics dedup (the reference's ``set.add``) is
``dropDuplicates(subject, predicate, object)`` keeping the *first*
emission's order keys, so serialization order is deterministic and
reproducible (stronger than the reference, whose per-(s,p) object order is
Python-set hash order).
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_COLS = ["subject", "predicate", "object"]
ORDER_COLS = ["sheet_rank", "row_id", "pred_rank"]

# String forms treated as "no value" when they appear as cell content
# (reference exclude_list, ingest.py:24; real nulls are handled as nulls).
EXCLUDED_TOKENS = ["EmptyValue", "", "NaN", "NAN", "nan"]


def exclude_filter(col: F.Column) -> F.Column:
    """Predicate: value is present and not a null-ish sentinel token."""
    return col.isNotNull() & ~F.trim(col).isin(EXCLUDED_TOKENS)


def union_triples(parts: Iterable[DataFrame]) -> DataFrame:
    """Union per-sheet triple streams (reference: one dict threaded through
    every sheet loop; here ``unionByName``)."""
    parts = list(parts)
    if not parts:
        raise ValueError("no triple parts to union")
    return reduce(lambda a, b: a.unionByName(b), parts)


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Set-semantics dedup keeping first-emission order keys.

    A map-side partial aggregation (min over order keys) replaces the
    reference's driver-resident dict -- shuffles only distinct triples.
    """
    aggs = [F.min(c).alias(c) for c in ORDER_COLS if c in triples.columns]
    if not aggs:
        return triples.dropDuplicates(TRIPLE_COLS)
    return triples.groupBy(*TRIPLE_COLS).agg(*aggs)


def reify_statements(
    triples: DataFrame, annotations: tuple = ()
) -> DataFrame:
    """W3C reification of each (s, p, o) row as a blank-node
    ``rdf:Statement`` (reference ``write_about_statement``,
    write_ttl.py:317-384 — unused by its own driver, declared here for
    API completeness).

    Per input triple: a blank node ``_:<label of "s_p_o">`` with
    ``rdf:type rdf:Statement``, ``rdf:subject/predicate/object`` back-
    references, plus caller ``annotations`` as extra (predicate, object)
    constants (the reference's ``predicates`` argument, e.g. provenance
    ``("source", '"..."')`` pairs).

    Row-local: one Arrow-batched mint + a constant-width union — no
    shuffle, linear in the triple stream.
    """
    from mhdb_tables2turtles_spark.functions import udfs

    seeded = triples.select(
        udfs.blank_node(
            F.concat_ws("_", "subject", "predicate", "object")
        ).alias("node"),
        "subject",
        "predicate",
        "object",
    )
    emit = [("rdf:type", F.lit("rdf:Statement")),
            ("rdf:subject", F.col("subject")),
            ("rdf:predicate", F.col("predicate")),
            ("rdf:object", F.col("object"))]
    emit += [(p, F.lit(o)) for p, o in annotations]
    parts = [
        seeded.select(
            F.col("node").alias("subject"),
            F.lit(p).alias("predicate"),
            o.alias("object"),
        )
        for p, o in emit
    ]
    return union_triples(parts)


def filter_valid(triples: DataFrame) -> DataFrame:
    """Drop rows whose s/p/o is null-ish (reference add_to_statements
    exclude check, ingest.py:58-60)."""
    cond = reduce(
        lambda a, b: a & b, [exclude_filter(F.col(c)) for c in TRIPLE_COLS]
    )
    return triples.filter(cond)
