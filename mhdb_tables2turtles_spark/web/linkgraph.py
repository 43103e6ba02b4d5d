"""Hyperlink graph over a Common-Crawl-style pages table.

The reference has no notion of links (its inputs are spreadsheets);
this is the web-side structure a 10^12-page KG build needs anyway —
crawl frontier ranking, host authority as an entity-linking prior, and
spam-host suppression all start from the (src_host, dst_host) graph.

Pipeline shape, scale-first:

1. :func:`page_links` — one Arrow-batched pandas UDF per page batch
   (:func:`~mhdb_tables2turtles_spark.web.extract.extract_links` +
   stdlib ``urljoin`` against the page url), exploded to
   ``(url, link)`` rows.  Pure function of (url, html bytes): no
   network, no wall clock, bit-identical at any parallelism.
2. :func:`host_edges` — host extraction via Spark's built-in
   ``parse_url`` (JVM-side, whole-stage codegen — NOT a Python UDF),
   then one aggregation to ``(src_host, dst_host, n_links)``.
   Self-loops (intra-host navigation, the vast majority of web links)
   are dropped BEFORE the shuffle: at crawl scale this cuts the
   exchanged rows by ~an order of magnitude.
3. :func:`host_pagerank` — the link-count graph fed to
   :func:`~mhdb_tables2turtles_spark.web.graphrank.pagerank_fixed`
   (integer fixed-point, deterministic).  Hosts are far fewer than
   pages (~10^8 vs 10^12), so the iteration state is small even when
   the page table is not; the heavy lifting stays in steps 1-2 where
   everything is map-local until the single host-pair aggregation.
"""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.web.extract import extract_links

__all__ = ["page_links", "host_edges", "host_pagerank"]


def page_links(pages: DataFrame) -> DataFrame:
    """``(url, link)`` — one row per resolved outgoing hyperlink.

    Relative hrefs resolve against the page url (RFC 3986 via stdlib
    ``urljoin``, version-stable for the http(s) cases we keep);
    non-http(s) schemes (mailto:, javascript:, data:) are dropped.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _links(url: pd.Series, html: pd.Series) -> pd.Series:
        def one(u, h):
            hrefs = extract_links(h)
            if hrefs is None:
                return None
            out = []
            for href in hrefs:
                try:
                    absolute = urljoin(u, href)
                except ValueError:
                    continue
                if absolute.startswith(("http://", "https://")):
                    out.append(absolute)
            return out

        return pd.Series(
            [one(u, h) for u, h in zip(url, html)], dtype=object
        )

    return (
        pages.select("url", _links(F.col("url"), F.col("html")).alias("__l"))
        .select("url", F.explode("__l").alias("link"))
    )


def host_edges(pages: DataFrame) -> DataFrame:
    """``(src_host, dst_host, n_links)`` — the host-level link graph.

    ``parse_url(..., 'HOST')`` runs JVM-side inside codegen; self-loops
    are filtered before the aggregation shuffles anything.
    """
    links = page_links(pages)
    hosts = links.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("src_host"),
        F.parse_url(F.col("link"), F.lit("HOST")).alias("dst_host"),
    ).filter(
        F.col("src_host").isNotNull()
        & F.col("dst_host").isNotNull()
        & (F.col("src_host") != F.col("dst_host"))
    )
    return hosts.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def host_pagerank(pages: DataFrame, iterations: int = 5) -> DataFrame:
    """Integer fixed-point DIRECTED PageRank over the distinct
    host-edge graph (links confer authority one way); ``(node, pr)``
    with pr in micro-units."""
    from mhdb_tables2turtles_spark.web.graphrank import pagerank_directed

    edges = host_edges(pages).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return pagerank_directed(edges, iterations=iterations)
