"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

Every operator is a pure column expression over ``(doc_id, text)`` —
row-local, zero shuffle, whole-stage codegen — and deterministic, so the
DuckDB oracle reproduces values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.ops.common import hash60, norm_text, shingles, tokens

__all__ = [
    "token_stats",
    "quality_score",
    "lang_id",
    "fingerprint",
    "lm_surprise",
    "kn_bigram_lm",
    "LANG_MARKERS",
]

# Tiny per-language marker lists (function-word heuristic).  Chosen for
# determinism, not linguistic coverage — swap for fastText off-sandbox.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "y", "las"),
}

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_chars, avg_token_len,
    distinct_ratio) — whitespace tokenization plus a BPE-ish word-piece
    count (runs of letters OR digits OR single other chars)."""
    toks = tokens(F.col("text"))
    pieces = F.regexp_extract_all(
        norm_text(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(norm_text(F.col("text"))).alias("n_chars"),
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
            )
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
        F.round(
            F.size(F.array_distinct(toks)) / F.size(toks), 4
        ).alias("distinct_ratio"),
        F.size(pieces).alias("n_pieces"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Gopher-style filter features + a composite score in [0, 1]:
    penalize too-short/too-long docs, low lexical diversity, and
    stopword-free word soup.  All row-local arithmetic."""
    toks = tokens(F.col("text"))
    n = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    len_ok = F.when((n >= 20) & (n <= 100000), 1.0).otherwise(0.0)
    stop_ratio = stop_hits / n
    score = F.round(
        0.4 * len_ok
        + 0.3 * F.least(distinct_ratio * 2, F.lit(1.0))
        + 0.3 * F.least(stop_ratio * 10, F.lit(1.0)),
        4,
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        score.alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, lang_score): argmax of per-language marker-word
    hit counts; 'und' (undetermined) when no marker hits.  Ties break
    alphabetically — same rule in the SQL oracle."""
    toks = tokens(F.col("text"))
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(*words))).alias(code)
        for code, words in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", F.size(toks).alias("n"), *scores)
    codes = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(c) for c in codes])
    pred = F.when(best <= 0, F.lit("und"))
    for c in codes:  # first (alphabetical) language achieving the max
        pred = pred.when(F.col(c) == best, F.lit(c))
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.round(best / F.greatest(F.col("n"), F.lit(1)), 4).alias("lang_score"),
    )


def fingerprint(docs: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, content_hash, winnow_hash): full-content 60-bit hash plus
    a shift-robust fingerprint = min hash60 over word k-grams (a rolling-
    window min, winnowing-style) — equal for docs that differ only by
    leading/trailing content outside every shared window."""
    sh = shingles(tokens(F.col("text")), k)
    winnow = F.array_min(F.transform(sh, lambda s: hash60(s)))
    return docs.select(
        "doc_id",
        hash60(norm_text(F.col("text"))).alias("content_hash"),
        winnow.alias("winnow_hash"),
    )


# fixed-point scale for the inverse-probability surprise units
LM_SCALE = 1_000_000

# head grams broadcast in the two-tier count join: at Zipf exponent ~1
# the K most frequent bigrams carry the bulk of the instance stream, so
# resolving them map-side removes the hot shuffle keys entirely
LM_HEAD_K = 4096


def lm_surprise(docs: DataFrame, head_k: int = LM_HEAD_K) -> DataFrame:
    """Corpus-bigram LM surprise per document — the perplexity-style
    quality/novelty signal LM-data pipelines filter on (docs whose
    bigrams the corpus model finds improbable score high: boilerplate
    scores low, gibberish/outliers high):
    ``(doc_id, n_bigrams, surprise)``.

    The add-one-smoothed bigram probability is
    ``P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)`` (``V`` = corpus distinct
    token count); a log-sum would be the classic form, but engine libm
    ``ln`` is not contractually bit-identical, so the score is the
    fixed-point **inverse-probability sum** instead — monotone in
    perplexity and exact integer arithmetic end to end::

        surprise = sum over doc bigrams of (LM_SCALE * (c1 + V)) div (c12 + 1)

    Integer sums are associative, so shuffle order is irrelevant and the
    DuckDB oracle reproduces every value (the same reasoning as
    web/graphrank.py's fixed-point PageRank).

    Scale shape (the round-3 skew fix):

    * **one tokenization pass** — the token-array projection is
      localCheckpointed and feeds both the unigram counts and the
      (doc_id, gram) stream (round 3 ran ``tokens(text)`` twice);
    * the doc stream is **pre-aggregated to (doc_id, gram, m)** — a
      uniform composite key — so every downstream join moves one row
      per distinct gram per doc, not one per instance;
    * the per-gram surprise ``unit`` is computed ONCE per distinct
      corpus gram (c12 ⋈ c1 ⋈ V), never per instance;
    * the unit join back to the doc stream is **frequency-split
      two-tier**: the ``head_k`` most frequent grams — exactly the
      Zipf hot keys ("of the") that melt a raw shuffle join — resolve
      via a bounded BROADCAST, and only the tail (whose keys are
      near-uniform by construction: everything hotter was removed)
      shuffles.  The split is exact, not approximate: head ∪ tail
      covers every gram, so results are independent of ``head_k``.

    The count tables stay corpus-vocabulary-sized (unbounded at 10^12
    docs — never broadcast in full); the final re-aggregation is keyed
    by doc_id.  Docs shorter than 2 tokens have no bigrams and drop
    out, same as ``repetition_stats``.
    """
    tk = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).localCheckpoint(eager=False)
    c1 = tk.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count("*").alias("c1")
    )
    doc_grams = (
        tk.select(
            "doc_id", F.explode(shingles(F.col("toks"), 2)).alias("gram")
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("m"))
        .localCheckpoint(eager=False)
    )
    c12 = doc_grams.groupBy("gram").agg(F.sum("m").alias("c12"))
    vocab = c1.select(F.count("*").alias("V"))  # rows of c1 = distinct tokens
    unit = (
        c12.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
        .join(c1, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "gram",
            "c12",
            F.expr(f"({LM_SCALE} * (c1 + V)) div (c12 + 1)").alias("unit"),
        )
        .localCheckpoint(eager=False)
    )
    # deterministic frequency split: ties at the boundary break by gram
    head = (
        unit.orderBy(F.desc("c12"), "gram")
        .limit(head_k)
        .select("gram", "unit")
    )
    tail = unit.join(
        F.broadcast(head.select("gram")), "gram", "left_anti"
    ).select("gram", "unit")
    resolved = doc_grams.join(F.broadcast(head), "gram").unionByName(
        doc_grams.join(F.broadcast(head.select("gram")), "gram", "left_anti")
        .join(tail, "gram")
    )
    return resolved.groupBy("doc_id").agg(
        F.sum("m").alias("n_bigrams"),
        F.sum(F.col("m") * F.col("unit")).alias("surprise"),
    )


KN_MIN_COUNT = 3


def kn_bigram_lm(
    docs: DataFrame,
    min_count: int = KN_MIN_COUNT,
    discount_num: int = 3,
    discount_den: int = 4,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM, trained distributed — the
    actual n-gram LM estimator (Kneser & Ney 1995 / Chen & Goodman
    1999) behind CCNet-style perplexity filtering, where
    :func:`lm_surprise`'s add-one proxy is the cheap stand-in:
    ``(w1, w2, c12, p_micro)`` for every corpus bigram with
    ``c12 >= min_count``.

    With discount D = ``discount_num / discount_den`` (default the
    standard 0.75)::

        P(w2|w1) = (c(w1 w2) - D) / c(w1·)
                   + (D · N1+(w1·) / c(w1·)) · (N1+(·w2) / N1+(··))

    where c(w1·) sums bigram counts with left context w1, N1+(w1·) /
    N1+(·w2) are distinct right/left continuation counts, and N1+(··)
    is the distinct bigram-type total — the continuation-probability
    backoff that makes KN the strong n-gram baseline.  Everything is
    exact integer arithmetic over one common denominator with a single
    final floor::

        p_micro = (SCALE·((den·c12 − num)·T + num·nf1·np2))
                      div (den·c1·T)

    so the DuckDB oracle is value-exact.  Overflow bound: the numerator
    is < SCALE·den·c12·T + SCALE·num·nf1·np2 ≲ 4·10^6·c12·T; int64
    holds while c12·T < 2·10^12 — beyond that, rescale SCALE down or
    move to decimal(38) (documented, loud if hit: Spark overflows to
    error under ANSI, the tests pin exact values).

    Scale shape: every count table here is TYPE-level (one row per
    distinct bigram / token), so the Zipf instance skew that needed
    :func:`lm_surprise`'s head/tail split never enters — c12 ⋈ c1 and
    c12 ⋈ np2 are joins between aggregates, fan-out = types per word,
    handled by AQE skew split.  The only broadcast is the single-row
    type total T.
    """
    tk = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    c12 = (
        tk.select(F.explode(shingles(F.col("toks"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("c12"))
        .select(
            F.split(F.col("gram"), " ").getItem(0).alias("w1"),
            F.split(F.col("gram"), " ").getItem(1).alias("w2"),
            "c12",
        )
        .localCheckpoint(eager=False)
    )
    left = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("nf1")
    )
    right = c12.groupBy("w2").agg(F.count("*").alias("np2"))
    types = c12.select(F.count("*").alias("T"))
    num, den = discount_num, discount_den
    return (
        c12.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(types))
        .filter(F.col("c12") >= min_count)
        .select(
            "w1",
            "w2",
            "c12",
            F.expr(
                f"({LM_SCALE} * (({den} * c12 - {num}) * T"
                f" + {num} * nf1 * np2)) div ({den} * c1 * T)"
            ).alias("p_micro"),
        )
    )
