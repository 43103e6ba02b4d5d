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
    triples: DataFrame,
    path: str,
    max_records_per_file: int = 5_000_000,
    num_partitions: int | None = None,
) -> None:
    """Write ``(subject, predicate, object)`` rows as a predicate-
    partitioned, subject-sorted parquet table.

    Plan shape: ONE range shuffle keyed by (predicate, subject).
    Range partitioning — not hash — is the load-bearing choice for a
    heavy-tailed predicate distribution:

    * a TAIL predicate's whole range fits inside one task, so it
      writes ONE file into its directory (hashing the subject instead
      would scatter every tail predicate across all tasks — the
      small-files failure mode at 10^5 tasks: directories × tasks
      sliver files);
    * the HOT predicate spans a number of contiguous ranges
      proportional to its row count, so it still parallelizes and
      never serializes through a single writer;
    * within a predicate, tasks own DISJOINT subject ranges, so after
      the in-task sort the parquet row-group min/max subject stats are
      non-overlapping across files — a subject point lookup skips
      every file but one, instead of probing one row group per file.

    ``maxRecordsPerFile`` bounds file size under residual skew (one
    giant subject).  When ``num_partitions`` is None the range count is
    left to AQE, which coalesces tiny ranges — at small volume the
    whole store legitimately collapses to one file; pass an explicit
    ``num_partitions`` to pin the task count (AQE never coalesces a
    user-specified partition count).  On Iceberg this is exactly
    ``partitionedBy(predicate)`` + a table sort order of ``subject``.
    """
    range_cols = [F.col("predicate"), F.col("subject")]
    parted = (
        triples.select("subject", "predicate", "object")
        .repartitionByRange(num_partitions, *range_cols)
        if num_partitions
        else triples.select("subject", "predicate", "object")
        .repartitionByRange(*range_cols)
    )
    (
        parted.sortWithinPartitions("predicate", "subject")
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
