"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in :mod:`mhdb_tables2turtles_spark.queries`;
this file stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triple extraction over the sf0.001 documents table —
    Aho-Corasick mention scan (mapInPandas) + IRI minting with the
    reference string kernel (pandas UDF) + triple emission."""
    from mhdb_tables2turtles_spark.queries import q_kg_triples

    return q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2 plus
    the training-data ops (dedup / similarity / text / multimodal)."""
    from mhdb_tables2turtles_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalents — one per query, no rows-only
    omissions: iterative ops (PageRank, k-means, BFS, connected
    components) unroll as chained CTEs, stateful per-row ops (packing)
    as recursive CTEs, all in engine-exact integer fixed-point."""
    from mhdb_tables2turtles_spark.queries import oracles

    return oracles()
