"""Deduplication operators over a documents table (doc_id, text).

Scale notes (the point of each design):

* **exact**: one shuffle on a 60-bit content hash — the classic
  hash-groupBy; at 100 TB the shuffle carries (hash, doc_id) only, never
  the text.
* **MinHash+LSH**: signatures are computed **row-locally** with array
  lambdas (no explode, no shuffle, whole-stage codegen); the only shuffle
  is the band-bucket self-join, whose keys are uniformly distributed
  hashes — no skew by construction.  Candidate verification (exact
  Jaccard) touches only candidate pairs, never all pairs.
* **SimHash**: again row-local bit-vote aggregation; near-dup candidates
  join on the 16-bit signature (hamming-0 buckets; rotate-band variants
  extend to hamming-k).

All hash math is md5-derived (:mod:`common`), so the DuckDB oracle can
reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.ops.common import hash60, norm_text, shingles, tokens

__all__ = [
    "exact_duplicates",
    "minhash_bands",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "simhash",
    "simhash_duplicates",
]


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Duplicate groups by full-content hash: (text_hash, dup_count,
    min_doc_id) for groups with >1 member."""
    return (
        docs.select(F.col("doc_id"), hash60(norm_text(F.col("text"))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


def _minhash_signature(sh: F.Column, n_hashes: int) -> F.Column:
    """array of n_hashes min-hashes; min over md5('<seed>:'+shingle).

    Lexicographic min over hex strings == min over the underlying 128-bit
    ints — stable, portable, and computed without leaving the row.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda s: F.array_min(
            F.transform(
                sh, lambda x: F.md5(F.concat(s.cast("string"), F.lit(":"), x))
            )
        ),
    )


def minhash_bands(
    docs: DataFrame, k: int = 3, n_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_id, band_id, band_hash): LSH banding of a MinHash signature.

    rows-per-band r = n_hashes/bands; two docs collide in a band iff all
    r component min-hashes agree.
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands
    toks = tokens(F.col("text"))
    sig = _minhash_signature(shingles(toks, k), n_hashes)
    return (
        docs.select("doc_id", sig.alias("sig"))
        .filter(F.size("sig") > 0)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band_id"),
                        F.md5(
                            F.concat_ws("|", F.slice(F.col("sig"), b * r + 1, r))
                        ).alias("band_hash"),
                    ),
                )
            ).alias("band"),
        )
        .select("doc_id", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash"))
    )


def lsh_candidate_pairs(band_rows: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one band bucket.
    Self-join keys are (band_id, band_hash) — uniform hashes, no skew."""
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame, pairs: DataFrame, k: int = 3, threshold: float = 0.0
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs:
    (doc_a, doc_b, jaccard).  Pair-local array math after two joins — the
    verification cost is O(candidates), not O(n^2)."""
    sh = docs.select(
        "doc_id",
        F.array_distinct(shingles(tokens(F.col("text")), k)).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over token hashes,
    computed entirely row-locally (aggregate over the token array)."""
    toks = tokens(F.col("text"))
    hashes = F.transform(toks, lambda t: hash60(t))
    # unrolled over bit positions (shift amounts must be Python ints);
    # still a single row-local projection — no shuffle, no UDF.
    # NB: capture b via an outer function, never `lambda acc, h, b=b` —
    # pyspark binds a 3-param lambda's third arg to a generated Column.
    def vote(b: int) -> F.Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )

    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(vote(b) > 0, F.lit(1 << b)).otherwise(0)
    return docs.select("doc_id", sim.alias("simhash"))


def simhash_duplicates(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Groups of documents sharing an identical simhash (hamming-0
    near-dup buckets): (simhash, dup_count, keep_doc_id)."""
    return (
        simhash(docs, bits)
        .groupBy("simhash")
        .agg(F.count("*").alias("dup_count"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("dup_count") > 1)
    )
