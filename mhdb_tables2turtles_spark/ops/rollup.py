"""Continuous-aggregate maintenance: refresh a committed hourly rollup
with a new event batch WITHOUT recomputing history — the TimescaleDB
continuous-aggregate / Iceberg MERGE pattern, and the time-series twin
of web/canonicalize.py::merge_components (same contract: the
incremental result is provably equal to the from-scratch recompute,
so the DuckDB oracle IS the from-scratch recompute and the driver
gate checks the equivalence theorem itself).

Scale shape: the batch aggregates to its own (event_type, hour) grain
first — map-side partials over only the NEW rows — and merges into the
committed aggregate by key.  Counts and micro-unit sums are
decomposable (commutative monoids), which is the whole trick: refresh
cost is O(batch + touched groups), never O(history).  In batch
DataFrame form the merge is a full-outer join; on the production
layout the committed table is hour-partitioned parquet/Iceberg and the
merge becomes a dynamic-partition overwrite of exactly the hours
present in the batch — untouched history is never read or written
(``spark.sql.sources.partitionOverwriteMode=dynamic``, the same
partition-pruning argument as web/store.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hourly_rollup", "rollup_refresh", "US_PER_HOUR"]

US_PER_HOUR = 3_600_000_000

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Finest-grain committed aggregate: ``(event_type, hour_us,
    n_events, sum_value_micro)`` — hour floors in epoch-µs longs,
    values quantized to micro-units BEFORE summation (exact long
    arithmetic, the events_rollup discipline); ROLLUP subtotals are
    NOT stored — they derive from this grain on read.
    """
    return (
        events.select(
            "event_type",
            F.expr(
                f"(timestampdiff(MICROSECOND, {_EPOCH}, ts)"
                f" div {US_PER_HOUR}) * {US_PER_HOUR}"
            ).alias("hour_us"),
            F.expr("cast(round(value * 1000000) as long)").alias(
                "vmicro"
            ),
        )
        .groupBy("event_type", "hour_us")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("vmicro").alias("sum_value_micro"),
        )
    )


def rollup_refresh(committed: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge a new raw-event ``batch`` into a ``committed``
    :func:`hourly_rollup` table; counts/sums are decomposable, so
    merged = committed ⊕ rollup(batch) keyed on (event_type, hour_us).
    Equal to ``hourly_rollup(history ∪ batch)`` by monoid associativity
    — the property the driver oracle checks.
    """
    delta = hourly_rollup(batch)
    c = committed.select(
        "event_type",
        "hour_us",
        F.col("n_events").alias("__cn"),
        F.col("sum_value_micro").alias("__cs"),
    )
    d = delta.select(
        "event_type",
        "hour_us",
        F.col("n_events").alias("__dn"),
        F.col("sum_value_micro").alias("__ds"),
    )
    return c.join(d, ["event_type", "hour_us"], "full_outer").select(
        "event_type",
        "hour_us",
        (
            F.coalesce("__cn", F.lit(0)) + F.coalesce("__dn", F.lit(0))
        ).alias("n_events"),
        (
            F.coalesce("__cs", F.lit(0)) + F.coalesce("__ds", F.lit(0))
        ).alias("sum_value_micro"),
    )
