"""Stateful streaming sessionization (streaming/sessions.py):
applyInPandasWithState with event-time timeout, across micro-batches."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mhdb_tables2turtles_spark.streaming.sessions import mention_sessions

SCHEMA = StructType(
    [
        StructField("surface", StringType()),
        StructField("warc_ts", TimestampType()),
    ]
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _write_drop(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, src, out_dir, ck_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = mention_sessions(stream, gap_seconds=300, watermark="0 seconds")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    try:
        return {
            (r.surface, r.session_start, r.session_end, r.n_mentions)
            for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        return set()  # no closed sessions emitted yet


def test_sessions_split_on_gap_and_carry_state(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # batch 1: two bursts for "chills" separated by > gap -> first burst
    # closes in-batch; second stays open in state
    _write_drop(
        spark,
        src,
        [
            ("chills", T0),
            ("chills", T0 + timedelta(seconds=60)),
            ("chills", T0 + timedelta(seconds=120)),
            ("chills", T0 + timedelta(seconds=1000)),
            ("music", T0),
        ],
    )
    got1 = _run(spark, src, out, ck)
    assert ("chills", T0, T0 + timedelta(seconds=120), 3) in got1
    # music timed out in-run (watermark reached T0+1000s > its T0+300s
    # timeout); chills burst 2 (timeout T0+1300s) is still open in state
    assert ("music", T0, T0, 1) in got1
    assert not any(
        s == "chills" and start == T0 + timedelta(seconds=1000)
        for s, start, *_ in got1
    )

    # batch 2: extend the open chills session within the gap, and push
    # the watermark far ahead so both open sessions time out and flush
    _write_drop(
        spark,
        src,
        [
            ("chills", T0 + timedelta(seconds=1200)),
            ("other", T0 + timedelta(hours=6)),
        ],
    )
    got2 = _run(spark, src, out, ck)
    # carried-over state merged across micro-batches: burst 2 = 2 rows
    assert (
        "chills",
        T0 + timedelta(seconds=1000),
        T0 + timedelta(seconds=1200),
        2,
    ) in got2


def test_sessions_exactly_once_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _write_drop(
        spark,
        src,
        [
            ("a", T0),
            ("a", T0 + timedelta(seconds=10)),
            ("a", T0 + timedelta(seconds=2000)),
        ],
    )
    got = _run(spark, src, out, ck)
    assert ("a", T0, T0 + timedelta(seconds=10), 2) in got
    # restart with same checkpoint: no reprocessing, no duplicates
    again = _run(spark, src, out, ck)
    assert again == got


def _run_lenient(spark, src, out_dir, ck_dir):
    # 1-hour watermark delay: late rows inside the horizon are ACCEPTED
    # and must merge correctly into the open session
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = mention_sessions(stream, gap_seconds=300, watermark="1 hour")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    try:
        return {
            (r.surface, r.session_start, r.session_end, r.n_mentions)
            for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        return set()


def test_sessions_late_row_lowers_open_session_start(spark, tmp_path):
    """A late mention (within the watermark) that precedes the open
    session's start must lower session_start, not just raise last/count."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # batch 1: open session starts at T0+100
    _write_drop(spark, src, [("late", T0 + timedelta(seconds=100))])
    _run_lenient(spark, src, out, ck)
    # batch 2: a LATE row at T0 (before the open start, inside the 1-hour
    # watermark horizon), then a far-future row to flush by timeout
    _write_drop(
        spark,
        src,
        [
            ("late", T0),
            ("flush", T0 + timedelta(hours=6)),
        ],
    )
    got = _run_lenient(spark, src, out, ck)
    assert ("late", T0, T0 + timedelta(seconds=100), 2) in got
