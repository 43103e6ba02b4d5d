"""Corpus-cleaning operators for the training-data pipeline: PII
detection/redaction, Gopher-style repetition signals, cross-corpus
segment (boilerplate) dedup, and host/source-level crawl stats.

Design rules shared with :mod:`ops.text`:

* pure built-in column expressions (JVM-side, whole-stage codegen) — no
  Python in the hot path;
* deterministic arithmetic only (integer sums / longs before any
  division, then one final ``round``), so the DuckDB oracle reproduces
  every value bit-for-bit;
* regexes restricted to the Java∩RE2 common subset (no backrefs, no
  lookaround) so Spark and DuckDB match identically.

Scale notes per operator are in each docstring; none of these ships
document text through a shuffle — repetition/segment stats shuffle only
``(key, count)`` pairs keyed by uniform hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.ops.common import (
    hash60,
    norm_text,
    shingles,
    tokens,
)

__all__ = [
    "PII_PATTERNS",
    "TRACKING_PARAM_RE",
    "pii_scan",
    "repetition_stats",
    "line_repetition_stats",
    "segment_dedup",
    "host_stats",
    "stratified_sample",
    "ngram_decontaminate",
    "url_canonicalize",
    "mix_weights",
]

# Ordered (name, pattern, replacement): redaction applies in this order,
# and the SQL oracle must apply the same order (a phone redacted first
# could otherwise expose digits to the IPv4 pattern).  Java∩RE2 subset:
# character classes, bounded repeats, and ASCII \b only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_phone, n_ipv4, redacted): per-document PII
    match counts plus the text with every match replaced by a typed
    placeholder.

    Row-local, zero shuffle, codegen'd ``regexp_extract_all`` /
    ``regexp_replace`` — at 100 TB this is a pure map stage that fuses
    into the scan.  Counts are measured on the ORIGINAL text; redaction
    applies the patterns in :data:`PII_PATTERNS` order so overlapping
    matches resolve deterministically.
    """
    col = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(col, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    redacted = col
    for _, pat, rep in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, rep)
    return docs.select("doc_id", *counts, redacted.alias("redacted"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document: (doc_id, n_bigrams,
    top_bigram_bp, dup_bigram_bp).

    ``top_bigram_bp`` = share of the most frequent word 2-gram, in
    integer basis points (floor(10000 * top / total));
    ``dup_bigram_bp`` = basis-point share of 2-gram occurrences whose
    2-gram appears more than once.  High values flag boilerplate/spam
    pages (the corpus filters of Gopher/C4 use exactly these ratios;
    a 0.1 threshold is 1000 bp).

    Integer fixed-point, not rounded doubles: ``round(long/long, 4)``
    diverges across engines at last-bit ties (round-2 driver hash
    mismatch), while ``(10000 * a) div b`` on exact longs is
    engine-identical — the same pattern as web/graphrank.py PageRank.

    Scale: explode shuffles only ``(doc_id, gram)`` pairs — the grouping
    key includes ``doc_id`` so hot grams don't skew a single reducer,
    and partial aggregation collapses repeats map-side.  Docs shorter
    than 2 tokens have no bigrams and drop out (same in the oracle).
    """
    grams = docs.select(
        "doc_id", F.explode(shingles(tokens(F.col("text")), 2)).alias("gram")
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.expr("(10000 * max(c)) div sum(c)").alias("top_bigram_bp"),
        F.expr(
            "(10000 * sum(if(c > 1, c, 0))) div sum(c)"
        ).alias("dup_bigram_bp"),
    )


def line_repetition_stats(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher's LINE-level repetition signals per document: (doc_id,
    n_lines, dup_line_bp, dup_char_bp).

    ``dup_line_bp`` = basis-point share of non-empty line occurrences
    whose (trimmed) line appears more than once in the document;
    ``dup_char_bp`` = the same share weighted by line length in
    characters (Gopher filters on both: many short duplicated lines vs
    one long duplicated block are different failure modes — nav
    boilerplate vs copy-pasted body).  Empty/whitespace-only lines are
    ignored (they carry no boilerplate signal and would dominate the
    duplicate mass of any multi-paragraph page).

    Same conventions as :func:`repetition_stats`: duplicate mass counts
    ALL occurrences of a repeated line, ratios are integer fixed-point
    (``(10000*a) div b``, engine-exact), and the shuffle key is
    ``(doc_id, line)`` so hot boilerplate lines never skew one reducer.
    Docs with no non-empty lines drop out (same in the oracle).
    """
    lines = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col(text_col), "\n")).alias("__raw"),
        )
        .select("doc_id", F.trim("__raw").alias("line"))
        .filter(F.col("line") != "")
    )
    counts = lines.groupBy("doc_id", "line").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_lines"),
        F.expr("(10000 * sum(if(c > 1, c, 0))) div sum(c)").alias(
            "dup_line_bp"
        ),
        F.expr(
            "(10000 * sum(if(c > 1, c * length(line), 0)))"
            " div sum(c * length(line))"
        ).alias("dup_char_bp"),
    )


def segment_dedup(docs: DataFrame, k: int = 10) -> DataFrame:
    """Cross-corpus boilerplate detection (CCNet-style line dedup, over
    k-token segments because the corpus has no line structure):
    (doc_id, n_segments, n_dup_segments, dup_bp).

    A *segment* is a non-overlapping k-token chunk; a segment is *dup*
    when its 60-bit hash occurs in ≥ 2 distinct documents corpus-wide.
    ``dup_bp`` is the duplicated-segment share in integer basis points
    (fixed-point for engine-exact oracle comparison — see
    :func:`repetition_stats`).

    Scale: text never shuffles — only 8-byte segment hashes.  Two
    shuffles: (1) group by segment hash (uniform md5 keys, no skew) to
    count distinct docs, (2) group back by doc_id.  Both carry
    ``(long, long)`` rows; at 10^12 docs this is the same shape as the
    exact-dedup operator (`ops/dedup.py`), which is the scale-proven
    pattern.
    """
    toks = tokens(F.col("text"))
    nseg = F.floor(F.size(toks) / k).cast("int")
    seg_hashes = F.when(
        nseg >= 1,
        F.transform(
            F.sequence(F.lit(1), nseg),
            lambda i: hash60(
                F.concat_ws(" ", F.slice(toks, (i - 1) * k + 1, k))
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    segs = docs.select("doc_id", F.explode(seg_hashes).alias("seg_hash"))
    global_counts = segs.groupBy("seg_hash").agg(
        F.count_distinct("doc_id").alias("n_docs_with")
    )
    return (
        segs.join(global_counts, "seg_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(
                F.when(F.col("n_docs_with") > 1, 1).otherwise(0)
            ).alias("n_dup_segments"),
            F.expr(
                "(10000 * sum(if(n_docs_with > 1, 1, 0))) div count(*)"
            ).alias("dup_bp"),
        )
    )


def host_stats(docs: DataFrame, host_col: str = "source") -> DataFrame:
    """Host/source-level crawl aggregates for prioritization and
    host-level filtering: (host, n_docs, n_unique_texts, dup_bp,
    avg_tokens_milli).

    ``dup_bp`` = 1 − distinct-normalized-content / docs, in integer
    basis points (a host serving the same page under many URLs scores
    high and gets down-prioritized); ``avg_tokens_milli`` = mean token
    count in integer thousandths.  Fixed-point like
    :func:`repetition_stats`: ``round(double, 4)`` diverges across
    engines at last-bit rounding ties, integer `div` never does.

    One shuffle keyed by host; content rides as an 8-byte hash.  At
    crawl scale a handful of mega-hosts can skew — the distinct-count is
    the skew-prone part, and Spark's partial distinct aggregation (AQE
    skew split) handles it without salting because the per-host value
    space is already hashed.
    """
    h = F.col(host_col)
    per_doc = docs.select(
        h.alias("host"),
        hash60(norm_text(F.col("text"))).alias("content_hash"),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    return per_doc.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("content_hash").alias("n_unique_texts"),
        F.expr(
            "(10000 * (count(*) - count(distinct content_hash)))"
            " div count(*)"
        ).alias("dup_bp"),
        F.expr("(1000 * sum(n_tokens)) div count(*)").alias(
            "avg_tokens_milli"
        ),
    )


def ngram_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares a word ``n``-gram with an evaluation/benchmark set (the
    GPT-3/Llama-style 8-to-13-gram overlap filter) →
    ``(doc_id, n_grams, n_hits, contaminated)``.

    ``n_grams`` counts the document's word n-grams, ``n_hits`` how many
    of them occur anywhere in ``eval_docs``, ``contaminated`` is the
    0/1 drop verdict.  Documents shorter than ``n`` tokens have zero
    grams and are clean by definition (they stay in the output).

    Scale: the eval side is benchmark-sized (10^3–10^6 distinct grams),
    so its distinct 60-bit gram-hash set **broadcasts** and the corpus
    side probes it map-side — document text never shuffles, and the only
    shuffle is the per-doc re-aggregation of ``(doc_id, is_hit)`` pairs
    (8-byte keys, uniform), the same proven shape as
    :func:`segment_dedup`.  At 10^12 docs the gram explode is the cost;
    it fuses into the scan (no wide dependency before the final agg).
    """
    # hash60 is single-argument, so it binds safely as a transform lambda
    doc_grams = F.transform(shingles(tokens(F.col(text_col)), n), hash60)
    ev = (
        eval_docs.select(
            F.explode(
                F.transform(shingles(tokens(F.col(text_col)), n), hash60)
            ).alias("g")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        # explode_outer keeps sub-n-token documents (null gram row)
        F.explode_outer(doc_grams).alias("g"),
    )
    return (
        grams.join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("g").alias("n_grams"),
            F.count("__hit").alias("n_hits"),
            (F.count("__hit") > 0).cast("int").alias("contaminated"),
        )
    )


# tracking parameters dropped by URL canonicalization (Java∩RE2 subset);
# (=|$) so VALUELESS params (a bare 'fbclid') are dropped too — before
# round 4 they survived and split frontier entries
TRACKING_PARAM_RE = r"^(utm_[^=&]*|fbclid|gclid)(=|$)"


def url_canonicalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl-frontier URL canonicalization: adds ``canonical_url`` and
    ``host`` columns.  Rules (the standard crawl-dedup normalization):

    * scheme and host lowercased; default port (:80 http / :443 https)
      stripped, other ports kept;
    * fragment dropped (a ``?`` INSIDE the fragment is fragment text,
      not a query — the query is extracted from the pre-fragment
      substring only);
    * tracking query parameters removed (:data:`TRACKING_PARAM_RE`),
      survivors sorted bytewise so parameter order never splits a page
      into two frontier entries;
    * empty path becomes ``/``;
    * rows without a ``scheme://`` prefix (relative/opaque/malformed
      frontier entries) pass through UNCHANGED with a null host —
      collapsing every unparseable URL to one canonical key would make
      exact-dedup silently merge distinct entries.

    Row-local column expressions, zero shuffle, fuses into the scan.
    One honest caveat: the tracking-param removal is a higher-order
    ``filter`` with an ``rlike`` lambda, which Catalyst interprets
    rather than codegens — over the handful of parameters a URL has
    this is noise, unlike the per-shingle HOFs this repo moved to numpy
    kernels; if frontier profiling ever says otherwise, the same
    mapInPandas-kernel swap applies.  The canonical form is what
    exact-dedup and host stats key on upstream of fetch at crawl scale.
    """
    url = F.col(url_col)
    has_scheme = url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    # bracketed IPv6 hosts ([::1], [2001:db8::1]) keep their brackets
    # and colons; only a trailing :port outside the brackets is a port
    host = F.regexp_extract(hostport, r"^(\[[^\]]*\]|[^:]*)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    drop_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", "/").otherwise(path)
    # anchor the query before any '#': '?' after the first '#' is
    # fragment content
    query = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(drop_port, "").otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(qs == "", "").otherwise(F.concat(F.lit("?"), qs)),
    )
    return df.withColumns(
        {
            "canonical_url": F.when(has_scheme, canonical).otherwise(url),
            "host": F.when(has_scheme, host),
        }
    )


def mix_weights(docs: DataFrame, stratum_col: str = "source") -> DataFrame:
    """Temperature-based training-mix weights per stratum (the
    multilingual/multi-source sampling rule of mT5/XLM-R, temperature
    2 == alpha 0.5): ``(stratum, n_docs, n_tokens, weight_bp)`` with
    ``weight_bp`` proportional to ``n_tokens^0.5``, normalized to
    ~10000 basis points — upsamples small sources, tempers huge ones.

    Engine-exact without fixed-point roots: IEEE-754 ``sqrt`` is
    correctly rounded in every conforming implementation (JVM
    ``Math.sqrt`` == DuckDB libm), so ``floor(1000 * sqrt(T))``
    quantizes identically; all arithmetic after that is integer, so
    the normalization is shuffle-order-independent.  One stratum-keyed
    aggregation plus a broadcast of the stratum-count-sized total.
    """
    per = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
    )
    per = per.withColumn(
        "__s", F.floor(F.lit(1000) * F.sqrt(F.col("n_tokens"))).cast("long")
    )
    total = per.select(F.sum("__s").alias("__total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "stratum",
            "n_docs",
            "n_tokens",
            F.expr("(10000 * __s) div __total").alias("weight_bp"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict,
    default_rate: float = 0.0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling for training-data mixes: keep a
    document iff ``hash60(id) % 10000 < rate(stratum) * 10000``.

    Unlike ``df.sample``, this is reproducible across runs, engines, and
    partitionings (the coin flip is a pure function of the id), so a mix
    recipe re-executed on a grown corpus keeps every previously-selected
    document — the property curated-training-set pipelines need.
    Row-local, zero shuffle; the rate table compiles to a when-chain
    (broadcast-join a rates DataFrame instead if strata are unbounded).
    """
    bucket = hash60(F.col(id_col).cast("string")) % 10000
    rate = F.lit(int(default_rate * 10000))
    for stratum, r in sorted(rates.items()):
        rate = F.when(
            F.col(stratum_col) == stratum, F.lit(int(r * 10000))
        ).otherwise(rate)
    return docs.filter(bucket < rate)


def cdc_dedup(docs: DataFrame, divisor: int = 8) -> DataFrame:
    """Content-defined-chunking dedup — :func:`segment_dedup` with
    CONTENT-DERIVED boundaries instead of fixed k-token strides:
    ``(doc_id, n_chunks, n_dup_chunks, dup_bp)``.

    A chunk boundary falls AFTER any token whose 60-bit hash is 0 mod
    ``divisor`` (expected chunk length = ``divisor`` tokens) — the
    token-level analogue of Rabin/Gear CDC (LBFS, Muthitacharoen et
    al. SOSP 2001).  The property fixed strides cannot give: inserting
    or deleting text shifts only the chunks it touches, so shared
    boilerplate re-aligns and still dedups — byte-shift robustness, the
    reason backup systems and suffix-free corpus dedup use CDC.  No
    min/max chunk clamp (production CDC adds one; it only re-derives
    boundaries row-locally and is omitted for oracle simplicity —
    documented, not hidden).

    Plan: posexplode + ONE per-document running sum (window keyed by
    doc_id — uniform bounded-size partitions, the same shape as the W1
    sequence counter) assigns chunk ids; after that only 8-byte chunk
    hashes shuffle, exactly like :func:`segment_dedup`'s two
    hash-keyed aggregations.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = toks.select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce(
            F.sum(
                F.when(hash60(F.col("tok")) % divisor == 0, 1).otherwise(0)
            ).over(w),
            F.lit(0),
        ).alias("chunk_idx"),
    )
    # collect_list order is NOT deterministic under shuffle — sort the
    # (pos, tok) structs (sort_array orders by pos, the leading field)
    # before joining the chunk text
    chunks = marked.groupBy("doc_id", "chunk_idx").agg(
        hash60(
            F.concat_ws(
                " ",
                F.sort_array(
                    F.collect_list(F.struct("pos", "tok"))
                ).getField("tok"),
            )
        ).alias("chunk_hash")
    )
    global_counts = chunks.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").alias("n_docs_with")
    )
    return (
        chunks.join(global_counts, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                F.when(F.col("n_docs_with") > 1, 1).otherwise(0)
            ).alias("n_dup_chunks"),
            F.expr(
                "cast((10000 * sum(case when n_docs_with > 1 then 1"
                " else 0 end)) div count(*) as bigint)"
            ).alias("dup_bp"),
        )
    )
