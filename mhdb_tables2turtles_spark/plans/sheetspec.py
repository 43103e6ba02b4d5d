"""Declarative table -> triples compiler.

The reference implements ~45 near-identical row loops across 6 ingest
functions (~3,900 LoC, /root/reference/mhdb/ingest.py): per row, mint a
subject IRI, emit a type triple + label, conditionally emit literal
predicates, and resolve scalar/comma-separated FK columns against sibling
dimension sheets.  All of that is one operator schema; here it is a single
generic compiler over a declarative :class:`SheetSpec`.

Dataflow per sheet (all built-in DataFrame ops; Python only in the
label/IRI pandas UDFs):

    scan -> filter(required subject) -> per-emitter select
         -> FK families: explode(split(fk, ',')) -> broadcast equi-join
         -> unionByName -> (caller) dedup_triples

Every dimension sheet is tiny relative to the fact table, so FK joins are
``broadcast()`` -- no shuffle.  The reference instead re-scans the
dimension with a boolean mask per (row x FK element)
(ingest.py:3192-3193 pattern): accidental O(rows*fks*dim).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.functions import udfs
from mhdb_tables2turtles_spark.operators.triples import (
    exclude_filter,
    union_triples,
)

ROW_ID = "row_id"  # stable source-row ordinal; fixtures must carry it


@dataclass(frozen=True)
class Literal:
    """Conditionally-emitted typed/language literal (reference pattern:
    ingest.py:3428-3456)."""

    column: str
    predicate: str
    kind: str = "lang"  # lang|anyURI|gyear|int|string|decimal|nonNegativeInteger
    lang: str = "en"


@dataclass(frozen=True)
class IriRef:
    """IRI-valued cell emitted raw (owl:sameAs), comma-split raw
    (rdfs:equivalentClass), or re-minted (rdfs:subClassOf)
    (reference pattern: ingest.py:3091-3106)."""

    column: str
    predicate: str
    split: bool = False
    raw: bool = True
    style: str = "delimited"


@dataclass(frozen=True)
class ForeignKey:
    """Scalar-or-comma-separated int FK resolved against a dimension sheet,
    one triple per element (reference pattern: ingest.py:3183-3196)."""

    column: str
    dim: str
    dim_value: str
    predicate: str
    style: str = "PascalCase"
    truncate: int | None = None


@dataclass(frozen=True)
class SheetSpec:
    table: str
    subject_column: str
    subject_style: str = "PascalCase"
    subject_truncate: int | None = None
    rdf_type: str | None = None
    label_predicate: str | None = "rdfs:label"
    label_column: str | None = None  # defaults to subject_column
    emitters: Sequence = field(default_factory=tuple)


def _literal_expr(lit: Literal) -> F.Column:
    col = F.col(lit.column)
    if lit.kind == "lang":
        return udfs.lang_literal(col, lit.lang)
    if lit.kind == "anyURI":
        return F.format_string('"%s"^^xsd:anyURI', F.trim(col))
    if lit.kind == "gyear":
        return F.format_string(
            '"%s"^^xsd:gyear', F.col(lit.column).cast("double").cast("long")
        )
    if lit.kind in ("int", "nonNegativeInteger", "decimal"):
        return F.format_string(
            f'"%s"^^xsd:{lit.kind}', F.col(lit.column).cast("string")
        )
    if lit.kind == "string":
        return F.format_string('"%s"^^xsd:string', col)
    raise ValueError(f"unknown literal kind: {lit.kind!r}")


def _fk_elements(col: F.Column) -> F.Column:
    """csv-int cell -> array<long> (reference parses with
    ``[np.int(x) for x in s.strip().split(',')]``, ingest.py:203-204)."""
    return F.transform(
        F.filter(
            # NB: the unary lambda matters -- F.transform(arr, F.trim)
            # would bind the element *index* as trim's trimStr argument
            F.transform(F.split(col.cast("string"), ","), lambda x: F.trim(x)),
            lambda x: F.length(x) > 0,
        ),
        lambda x: x.cast("double").cast("long"),
    )


def sheet_triples(
    tables: Mapping[str, DataFrame], spec: SheetSpec, sheet_rank: int
) -> DataFrame:
    """Compile one :class:`SheetSpec` into a triple DataFrame with order
    columns ``(sheet_rank, row_id, pred_rank)``."""
    df = tables[spec.table]
    if ROW_ID not in df.columns:
        raise ValueError(
            f"table {spec.table!r} lacks a stable {ROW_ID!r} column"
        )

    subj = F.trim(F.col(spec.subject_column))
    if spec.subject_truncate:
        subj = F.substring(subj, 1, spec.subject_truncate)
    base = df.filter(exclude_filter(F.col(spec.subject_column))).withColumn(
        "__subject", udfs.iri(subj, spec.subject_style)
    )

    def part(obj_expr: F.Column, predicate: str, rank: int, src=None):
        src_df = base if src is None else src
        return src_df.select(
            F.col("__subject").alias("subject"),
            F.lit(predicate).alias("predicate"),
            obj_expr.alias("object"),
            F.lit(sheet_rank).alias("sheet_rank"),
            F.col(ROW_ID).alias("row_id"),
            F.lit(rank).alias("pred_rank"),
        )

    parts = []
    rank = 0
    if spec.rdf_type:
        parts.append(part(F.lit(spec.rdf_type), "a", rank))
        rank += 1
    if spec.label_predicate:
        label_src = F.trim(F.col(spec.label_column or spec.subject_column))
        if spec.subject_truncate and not spec.label_column:
            label_src = F.substring(label_src, 1, spec.subject_truncate)
        parts.append(
            part(udfs.lang_literal(label_src), spec.label_predicate, rank)
        )
        rank += 1

    for em in spec.emitters:
        if isinstance(em, Literal):
            src = base.filter(exclude_filter(F.col(em.column)))
            parts.append(part(_literal_expr(em), em.predicate, rank, src))
        elif isinstance(em, IriRef):
            if em.split:
                src = (
                    base.filter(exclude_filter(F.col(em.column)))
                    .withColumn(
                        "__elem",
                        F.explode(
                            F.filter(
                                F.split(F.col(em.column), ","),
                                lambda x: F.length(x) > 0,
                            )
                        ),
                    )
                    .withColumn("__elem", F.trim("__elem"))
                    .filter(exclude_filter(F.col("__elem")))
                )
                obj = (
                    F.col("__elem")
                    if em.raw
                    else udfs.iri(F.col("__elem"), em.style)
                )
                parts.append(part(obj, em.predicate, rank, src))
            else:
                src = base.filter(exclude_filter(F.col(em.column)))
                obj = (
                    F.col(em.column)
                    if em.raw
                    else udfs.iri(F.col(em.column), em.style)
                )
                parts.append(part(obj, em.predicate, rank, src))
        elif isinstance(em, ForeignKey):
            fact = base.filter(exclude_filter(F.col(em.column))).select(
                "__subject",
                ROW_ID,
                F.explode(_fk_elements(F.col(em.column))).alias("__fk"),
            )
            dim = tables[em.dim].select(
                F.col("index").cast("long").alias("__idx"),
                F.col(em.dim_value).alias("__val"),
            )
            joined = fact.join(
                F.broadcast(dim), fact["__fk"] == dim["__idx"], "inner"
            ).filter(exclude_filter(F.col("__val")))
            val = F.col("__val")
            if em.truncate:
                val = F.substring(val, 1, em.truncate)
            parts.append(part(udfs.iri(val, em.style), em.predicate, rank, joined))
        else:
            raise TypeError(f"unknown emitter: {em!r}")
        rank += 1

    return union_triples(parts)


def workbook_triples(
    tables: Mapping[str, DataFrame], specs: Sequence[SheetSpec]
) -> DataFrame:
    """All sheets of a workbook -> one (not yet deduped) triple stream."""
    return union_triples(
        sheet_triples(tables, spec, i) for i, spec in enumerate(specs)
    )
