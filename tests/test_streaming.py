"""Structured-Streaming ingestion: incremental triples, watermarked
windows, checkpointed exactly-once sink + restart recovery."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.streaming.ingest import (
    read_page_stream,
    start_triple_sink,
    stream_triples,
    windowed_mention_rates,
)
from mhdb_tables2turtles_spark.web.pipeline import build_corpus

SURFACES = ("music", "chills", "study")


@pytest.fixture(scope="module")
def page_drop(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("drops"))
    build_corpus(spark, 24, seed=11, partitions=3).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_stream_triples_match_batch(spark, page_drop, tmp_path):
    stream = read_page_stream(spark, page_drop)
    assert stream.isStreaming
    triples = stream_triples(stream, SURFACES)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = start_triple_sink(triples, out, ck, available_now=True)
    q.awaitTermination(300)
    got = {
        (r.subject, r.predicate, r.object)
        for r in spark.read.parquet(out).collect()
    }
    # batch equivalent over the same drop
    batch_pages = spark.read.parquet(page_drop)
    batch = stream_triples.__wrapped__ if hasattr(stream_triples, "__wrapped__") else None
    from mhdb_tables2turtles_spark.functions import udfs
    from mhdb_tables2turtles_spark.web.extract import extract_text_col
    from mhdb_tables2turtles_spark.web.mentions import scan_mentions

    extracted = batch_pages.select(
        "url", extract_text_col(F.col("html")).alias("text")
    )
    want = {
        (r.subject, ":mentions", r.object)
        for r in scan_mentions(extracted, SURFACES)
        .select(
            udfs.iri(F.col("url")).alias("subject"),
            F.col("surface").alias("object"),
        )
        .distinct()
        .collect()
    }
    assert got == want

    # restart with the same checkpoint: nothing re-processed, no dupes
    q2 = start_triple_sink(
        stream_triples(read_page_stream(spark, page_drop), SURFACES),
        out,
        ck,
        available_now=True,
    )
    q2.awaitTermination(300)
    again = [tuple(r) for r in spark.read.parquet(out).select("subject", "predicate", "object").collect()]
    assert len(again) == len(got)  # exactly-once across restart


def test_windowed_mention_rates(spark, page_drop, tmp_path):
    stream = read_page_stream(spark, page_drop)
    rates = windowed_mention_rates(stream, SURFACES, window="5 minutes")
    out = str(tmp_path / "rates")
    ck = str(tmp_path / "rck")
    q = (
        rates.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode emits only watermark-closed windows; with a bounded
    # drop the final windows may still be open — check schema + state
    # instead of counts
    df = spark.read.parquet(out)
    assert set(df.columns) == {"window_start", "window_end", "surface", "n_mentions"}
