"""As-of (most-recent-prior) join and banded range join — the two
classic time-series operators Spark's DataFrame API lacks.

For every left row, attach the latest right row with the same key whose
timestamp is <= the left timestamp (inclusive, matching DuckDB's native
``ASOF JOIN`` which the driver oracle uses verbatim).

Implementation is the union + last-value-carry-forward trick, NOT a
range join: tag both sides, union them, sort within each key by
(time, side) and carry the last seen right-side payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.

Scale shape: one shuffle keyed by the join key and one sort — the same
cost as a regular sort-merge join, versus the O(left x right-per-key)
blowup of the naive range-join formulation.  Skewed keys behave like
any window op (a hot key sorts on one task); sub-shard hot keys by time
range if a single user's history outgrows an executor.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
) -> DataFrame:
    """Banded interval join: every (left, right) pair sharing ``keys``
    with ``right_time - left_time`` in ``[lower_us, upper_us]``
    microseconds (inclusive).  Output = all left columns + all
    non-key right columns.

    Catalyst plans a bare time-inequality join as a per-key cross
    product (BroadcastNestedLoopJoin / O(L x R) per key) — the classic
    Spark range-join trap.  This implementation buckets both sides by
    ``floor(epoch_us / band)`` with ``band = upper_us - lower_us +
    1`` and equi-joins on ``(keys..., bucket)`` with the left side
    replicated into the (at most) two buckets its window can reach:
    every qualifying pair shares one of those bucket ids, so the exact
    time predicate applied AFTER the equi-join loses nothing, and the
    join is a plain hash/sort-merge shuffle with uniform keys —
    O(matches) work, survives 10^12 rows.

    The right side must carry tz-free timestamps in both engines'
    semantics (``events.ts`` style); arithmetic is integer
    microseconds end to end, so the DuckDB inequality-join oracle is
    value-exact.  Non-key column names must be disjoint between the
    sides (alias before calling), as with any natural join.
    """
    keys = list(keys)
    band = upper_us - lower_us + 1
    epoch = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"

    lt_us = F.expr(f"timestampdiff(MICROSECOND, {epoch}, {left_time})")
    rt_us = F.expr(f"timestampdiff(MICROSECOND, {epoch}, {right_time})")

    # left row can match right times in [lt+lower, lt+upper] — that
    # window touches exactly the buckets of its two endpoints.
    # Integer arithmetic, not floor(double/): epoch-µs values overflow
    # a double's 2^53 integer range within a few centuries.  Spark's
    # `div` truncates toward zero, which diverges from floor division
    # on NEGATIVE operands (pre-1970 timestamps, or lt+lower < 0) and
    # would land the two sides in inconsistent buckets — the correction
    # term below makes it exact floor division over the full long range
    # (no overflow-prone epoch shift needed).
    def _floordiv(x: str) -> str:
        return (
            f"(({x}) div {band})"
            f" - (case when ({x}) % {band} < 0 then 1 else 0 end)"
        )

    l = left.withColumn("__lt_us", lt_us).withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(_floordiv(f"__lt_us + {lower_us}")),
                    F.expr(_floordiv(f"__lt_us + {upper_us}")),
                )
            )
        ),
    )
    r = right.withColumn("__rt_us", rt_us).withColumn(
        "__bucket", F.expr(_floordiv("__rt_us"))
    )
    rcols = [c for c in right.columns if c not in keys]
    joined = l.join(r, [*keys, "__bucket"]).filter(
        (F.col("__rt_us") - F.col("__lt_us") >= lower_us)
        & (F.col("__rt_us") - F.col("__lt_us") <= upper_us)
    )
    return joined.select(*left.columns, *rcols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row plus, for each column in
    ``value_cols``, the value from the most recent ``right`` row (same
    ``keys``, ``right.time <= left.time``; null when no prior right row
    exists).  The right timestamp itself is exposed as
    ``{time_col}{suffix}``.

    Ties at the same timestamp match (inclusive) because the right side
    sorts before the left side at equal times.  The right side must be
    unique per (keys, time) — pre-aggregate it otherwise, exactly as
    with DuckDB/kdb ASOF semantics (ambiguous duplicates have no
    defined winner).

    The right payload is carried as ONE struct(ts, values...) column
    through ``last(..., ignorenulls=True)`` — never per value column:
    per-column carry would skip a legitimately-NULL value in the latest
    right row and stitch together fields from DIFFERENT right rows,
    diverging from native ASOF (which attaches the single latest row,
    nulls included).
    """
    from pyspark.sql import types as T

    keys = list(keys)
    lcols = [c for c in left.columns]

    pack_type = T.StructType(
        [T.StructField("__ts", right.schema[time_col].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    lpart = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(pack_type).alias("__r_pack"),
    )
    rpart = right.select(
        *[F.col(k) for k in keys],
        F.col(time_col),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in keys and c != time_col
        ],
        F.lit(0).alias("__side"),
        F.struct(
            F.col(time_col).alias("__ts"),
            *[F.col(c) for c in value_cols],
        ).alias("__r_pack"),
    ).select(*lcols, "__side", "__r_pack")

    unioned = lpart.unionByName(rpart)
    w = (
        Window.partitionBy(*keys)
        .orderBy(time_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        F.last("__r_pack", ignorenulls=True).over(w).alias("__pack"),
    ).select(
        *lcols,
        "__side",
        *[
            F.col(f"__pack.{c}").alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.col("__pack.__ts").alias(f"{time_col}{suffix}"),
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
