"""Sheet specs shared by every reference workbook.

Each of the reference's six ingest functions opens with a verbatim copy of
the same ``Classes`` and ``Properties`` row loops (ingest.py:124-188,
341-405, 1120-1184, 1901-1965, 2751-2815, 3084-3148 — six copies of the
same ~60 lines).  Here they are two shared spec constructors.
"""

from __future__ import annotations

from mhdb_tables2turtles_spark.plans.sheetspec import (
    IriRef,
    Literal,
    SheetSpec,
)


def classes_spec() -> SheetSpec:
    """The ``Classes`` worksheet (rdf:Class declarations)."""
    return SheetSpec(
        table="Classes",
        subject_column="ClassName",
        subject_style="delimited",
        rdf_type="rdf:Class",
        label_column="label",
        emitters=(
            Literal("definition", "rdfs:comment"),
            IriRef("sameAs", "owl:sameAs", raw=True),
            IriRef("equivalentClasses", "rdfs:equivalentClass", split=True, raw=True),
            IriRef("subClassOf", "rdfs:subClassOf", raw=False),
        ),
    )


def properties_spec() -> SheetSpec:
    """The ``Properties`` worksheet (rdf:Property declarations)."""
    return SheetSpec(
        table="Properties",
        subject_column="property",
        subject_style="delimited",
        rdf_type="rdf:Property",
        label_column="label",
        emitters=(
            IriRef("propertyDomain", "rdfs:domain", raw=False),
            IriRef("propertyRange", "rdfs:range", raw=False),
            Literal("definition", "rdfs:comment"),
            IriRef("sameAs", "owl:sameAs", raw=True),
            IriRef("equivalentProperty", "rdfs:equivalentProperty", raw=True),
            IriRef("subPropertyOf", "rdfs:subPropertyOf", raw=False),
        ),
    )
