"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Generation is distributed (``spark.range`` -> ``mapInPandas``) and a pure
function of ``(seed, page_id)`` — no wall clock, no global RNG — so the
same table materializes bit-identically at any parallelism, which is what
lets the local[8]-vs-local[32] scaling run compare like with like.

Pages embed ontology surface forms (from :mod:`vocab`) inside filler
prose, plus script/style/comment/entity noise so the extractor
(:mod:`extract`) is actually exercised.  The committed ``text`` column is
``extract_text(html)`` by construction — the pipeline's stage 1 must
reproduce it byte-for-byte (the per-row invariant).
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from mhdb_tables2turtles_spark.web.extract import extract_text

__all__ = ["PAGES_SCHEMA", "synthesize_pages"]

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_LANGS = ("en", "en", "en", "de", "fr", "es", "zh")

_FILLER = (
    "study results participants reported during the trial with baseline "
    "measures and control groups across sessions the analysis showed "
    "significant effects for condition and stimulus while subjects rated "
    "their experience on a scale music passages were presented under "
    "laboratory conditions and responses were recorded for later review"
).split()

_TEMPLATE = """<html><head><title>{title}</title>
<style>body {{ font: 12px serif; }}</style>
<script>var tracker = "{pid}"; load();</script>
</head><body>
<!-- crawler-id {pid} -->
<h1>{title}</h1>
<nav>home &amp; archive</nav>
{paras}
<footer>&copy; example.org</footer>
</body></html>"""


_N_HOSTS = 37  # synthetic host universe when links are enabled


def _linked_url(pid: int) -> str:
    return f"https://site{pid % _N_HOSTS:02d}.example/p/{pid:09d}"


def _page_record(
    pid: int,
    seed: int,
    surfaces: list[str],
    with_links: bool = False,
    n_pages: int = 0,
) -> dict:
    rng = random.Random((seed << 32) ^ pid)  # deterministic per (seed, id)
    lang = _LANGS[pid % len(_LANGS)]
    # Common-Crawl-like body size: ~2-8 KB of extracted text per page
    n_paras = rng.randint(8, 24)
    paras = []
    for _ in range(n_paras):
        words = []
        for _ in range(rng.randint(30, 90)):
            if surfaces and rng.random() < 0.12:
                words.append(rng.choice(surfaces))
            else:
                words.append(rng.choice(_FILLER))
        paras.append("<p>" + " ".join(words) + "</p>")
    title = f"report {pid} on {rng.choice(surfaces) if surfaces else 'data'}"
    if with_links and n_pages > 1:
        # deterministic cross-page anchors: a handful of same-crawl
        # targets (skew toward low ids -> hub hosts, like real crawls),
        # relative + scheme-noise variants so the extractor earns its keep
        anchors = []
        for _ in range(rng.randint(2, 6)):
            target = rng.randrange(n_pages)
            if rng.random() < 0.35:
                # hub skew: real crawls concentrate links on few big
                # hosts — snap this target onto hosts 0..4
                base = (target // _N_HOSTS) * _N_HOSTS
                hub = base + rng.randrange(5)
                target = hub if hub < n_pages else hub % _N_HOSTS
            anchors.append(
                f'<a href="{_linked_url(target)}">ref {target}</a>'
            )
        anchors.append('<a href="/about">about</a>')  # relative, same host
        anchors.append('<a href="mailto:ed@example.org">mail</a>')  # dropped
        paras.append("<p>see also " + " ".join(anchors) + "</p>")
    html = _TEMPLATE.format(title=title, pid=pid, paras="\n".join(paras)).encode(
        "utf-8"
    )
    return {
        "url": _linked_url(pid)
        if with_links
        else f"https://example.org/crawl/{pid:012d}",
        # fixed epoch + deterministic offset; never the wall clock
        "warc_ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=pid * 37 % 86_400),
        "html": html,
        "text": extract_text(html),
        "lang": lang,
    }


def synthesize_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    surfaces: tuple[str, ...] = (),
    partitions: int | None = None,
    with_links: bool = False,
) -> DataFrame:
    """Distributed generator: one deterministic page per id in
    ``[0, n_pages)``.  ``surfaces`` (the vocabulary) ships with the closure
    — it is small (ontology-sized), so no broadcast plumbing needed.

    ``with_links=True`` spreads the crawl over ``_N_HOSTS`` synthetic
    hosts and embeds deterministic cross-page ``<a href>`` anchors
    (low-id hub skew) for the :mod:`linkgraph` operators; default off
    so every existing fixture stays byte-identical."""
    surf = list(surfaces)
    ids = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [
                    _page_record(int(i), seed, surf, with_links, n_pages)
                    for i in pdf["id"]
                ]
            )

    return ids.mapInPandas(gen, schema=PAGES_SCHEMA)
