"""Shared column builders for the ops package.

Everything here is a pure Spark ``Column`` expression (JVM-side,
whole-stage codegen); the same formulas are expressible verbatim in ANSI
SQL/DuckDB, which is what the driver's oracle comparison relies on.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["hash60", "py_hash60", "tokens", "shingles", "norm_text"]


def hash60(col: Column) -> Column:
    """Deterministic 60-bit positive int from a string: the first 15 hex
    chars of md5.  Portable: DuckDB = ``('0x'||substr(md5(x),1,15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def py_hash60(s: str) -> int:
    """Python twin of :func:`hash60` (for building deterministic literal
    tables like LSH plane matrices driver-side)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def norm_text(col: Column) -> Column:
    """Whitespace-collapsed, lowercased text (fingerprint normalization)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased text."""
    return F.split(norm_text(col), " ")


def shingles(toks: Column, k: int) -> Column:
    """Word k-gram shingles of a token array; empty array when the
    document is shorter than k (guard needed: Spark ``sequence(1, 0)``
    counts *down*, unlike DuckDB's empty ``generate_series``)."""
    n = F.size(toks) - F.lit(k - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
