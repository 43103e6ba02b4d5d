"""Physical triple-store layout: the predicate-partitioned,
subject-sorted parquet table every docstring in this package assumes.

The reference's terminal artifact is a .ttl file; the pipeline's
terminal artifact (web/materialize.py) is a parquet/Iceberg triple
table.  HOW that table is laid out decides whether the query surface
(web/kgquery.py, web/paths.py) scales: a predicate-literal filter —
the first operation of every BGP step, path step, and entailment rule
in this repo — must be PARTITION PRUNING (skip whole directories), not
a scan-and-filter over 10^12 rows; and subject-range row-group stats
must let point lookups skip row groups within a partition.

This is the classic "vertical partitioning" RDF layout (Abadi et al.,
VLDB 2007 — SW-Store): one physical slice per predicate, rows sorted
by subject within each slice.  Predicates in a web KG follow a
heavy-tail distribution (a handful of relation types carry most
triples) but their CARDINALITY is tiny (dozens-thousands), so
directory-per-predicate is cheap in metadata while making the dominant
query pattern free.

On a real cluster the same two clauses move verbatim onto an Iceberg
catalog: ``writeTo(...).partitionedBy("predicate")`` with a sort order
of ``subject`` — parquet-on-parquet here only because the sandbox has
no catalog service (same stance as web/materialize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_triple_store", "read_triple_store"]


def write_triple_store(
    triples: DataFrame, path: str, max_records_per_file: int = 5_000_000
) -> None:
    """Write ``(subject, predicate, object)`` rows as a predicate-
    partitioned, subject-sorted parquet table.

    Plan shape: ONE shuffle keyed by predicate (repartition by the
    partition column so each predicate's files are written by as few
    tasks as possible — without it every task writes a sliver into
    every partition directory, the small-files failure mode at 10^5
    tasks), then an in-task sort by subject so parquet row-group
    min/max statistics become subject ranges.  Skew note: predicate
    frequencies are heavy-tailed, so the repartition uses (predicate,
    subject-hash) rather than predicate alone — the hot predicate's
    rows spread over many tasks (each still sorted, each writing only
    to that predicate's directory) instead of serializing through one.
    ``maxRecordsPerFile`` bounds file size under that skew.
    """
    (
        triples.select("subject", "predicate", "object")
        .repartition(F.col("predicate"), F.crc32(F.col("subject")))
        .sortWithinPartitions("predicate", "subject")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("predicate")
        .parquet(path)
    )


def read_triple_store(spark: SparkSession, path: str) -> DataFrame:
    """The store as a ``(subject, predicate, object)`` DataFrame.

    A ``filter(predicate == ...)`` on the result prunes partitions
    (only that predicate's directory is listed or read) and a
    ``filter(subject == ...)`` reaches parquet as a pushed filter
    against subject-sorted row groups — both asserted in
    tests/test_graph.py::test_triple_store_pruning.
    """
    return spark.read.parquet(path).select(
        "subject", "predicate", "object"
    )
