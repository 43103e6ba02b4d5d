"""Streaming deduplication: the streaming twin of ``ops.dedup``'s
exact dedup for a crawl stream that re-fetches pages.

A continuous crawl re-sees the same page two ways: the same URL fetched
again (recrawl) and the same content under a different URL (mirrors,
tracking-param variants).  Batch dedup shuffles the whole corpus per
run; on a stream the engine instead keeps a keyed state store of seen
keys and drops repeats as they arrive —
``dropDuplicatesWithinWatermark`` bounds that state by the event-time
watermark, so a key is remembered only while a duplicate could still
legally arrive (``delay``), never forever.  At crawl scale this is the
difference between O(live horizon) and O(all keys ever) state.

The dedup key is computed row-locally (whole-stage codegen, no Python)
so the only stateful operator in the plan is the dedup itself:

* :func:`stream_dedup_exact` — key = 60-bit hash of the normalized
  content (``ops.common.norm_text``/``hash60``, identical to the batch
  ``exact_duplicates`` key, so batch and stream agree on what counts as
  a duplicate).
* :func:`stream_dedup_url` — key = canonical URL
  (``ops.cleaning.url_canonicalize`` rules inlined via the same helper),
  catching recrawls and tracking-param variants before the (heavier)
  content hash even runs.

Both return the deduplicated stream with the key column retained for
observability (downstream sinks can count drops per key family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.ops.common import hash60, norm_text

__all__ = ["stream_dedup_exact", "stream_dedup_url"]


def stream_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "fetch_ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop content-duplicate rows from a stream, keeping the first
    arrival per normalized-content hash within the watermark horizon.

    State: one entry per distinct content hash seen inside ``delay`` —
    evicted when the event-time watermark passes, so long-running
    crawls don't accumulate unbounded state (the failure mode of plain
    ``dropDuplicates`` on a stream).
    """
    keyed = docs.withColumn(
        "content_hash", hash60(norm_text(F.col(text_col)))
    )
    return keyed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def stream_dedup_url(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop recrawls: first arrival per canonical URL within the
    watermark horizon.  Canonicalization is the batch operator's rules
    (row-local regex, codegen'd), so ``http://ex.com/p?utm_source=x``
    and ``HTTP://EX.COM:80/p`` dedupe to one row."""
    from mhdb_tables2turtles_spark.ops.cleaning import url_canonicalize

    keyed = url_canonicalize(docs, url_col=url_col)
    return keyed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["canonical_url"]
    )
