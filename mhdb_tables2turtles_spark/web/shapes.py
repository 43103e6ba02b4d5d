"""SHACL-lite shape validation over the materialized triple table —
the KG quality gate.

The reference validates its OUTPUT SYNTAX (validate_turtle_files.sh →
our ``operators/validate.py`` Turtle grammar checker); a pipeline that
materializes a graph also needs SEMANTIC validation: does every entity
carry the properties its shape demands, with values of the right form?
That is SHACL's job.  This module implements the subset of SHACL core
that covers the common data-quality constraints — ``sh:minCount``,
``sh:maxCount``, ``sh:in``, and an IRI-prefix form of ``sh:nodeKind``/
``sh:pattern`` — as pure DataFrame algebra.

A shape is a plain dict::

    {"predicate": ":mentions",      # sh:path
     "min_count": 1,                # sh:minCount   (optional)
     "max_count": 5,                # sh:maxCount   (optional)
     "node_prefix": ":",            # value must start with (optional)
     "not_in": (":Forbidden",),     # sh:in complement (optional)
     "object_class": ":Entity"}     # sh:class (optional; see below)

Plan shape — the part that must survive 10^12 triples:

* Cardinality checks are ONE aggregation: pre-filter to the constrained
  predicates (partition pruning on a predicate-partitioned store),
  ``groupBy(subject, predicate).agg(count_distinct(object))`` — a
  single shuffle on the near-uniform (subject, predicate) key — then a
  row-local comparison per shape.  ``minCount`` needs the subjects that
  have ZERO rows of a predicate, so the count table left-joins from the
  focus-node universe (itself one distinct over pre-filtered subjects);
  that join is subject-keyed and AQE-planned.
* Value checks (``node_prefix`` / ``not_in``) never shuffle at all:
  each is a predicate-filtered row-local scan emitting one violation
  row per offending value.
* ``object_class`` (sh:class: every value of the predicate must carry
  an ``rdf:type`` of the given class) is the one JOIN-based constraint:
  a left-ANTI join of the predicate's values against the type slice —
  the typed-entity side is predicate-filtered (``a`` rows only) before
  it joins, and only the distinct conforming keys shuffle.
* The report is the union of per-shape violation sets — column-aligned
  appends, no shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["validate_shapes"]

_REPORT_COLS = ("focus", "predicate", "component", "value")


def validate_shapes(
    triples: DataFrame,
    shapes: Sequence[Mapping],
    targets: DataFrame | None = None,
    type_pred: str = "a",
) -> DataFrame:
    """Violation report ``(focus, predicate, component, value)`` for
    every shape constraint broken in ``triples`` — empty means the
    graph conforms.

    ``component`` names the violated SHACL constraint component
    (``minCount`` / ``maxCount`` / ``nodeKind`` / ``in`` / ``class``);
    ``value`` is the offending cardinality (as a string, for a uniform
    column type) or the offending object value.  ``object_class``
    checks against the ``type_pred`` slice of the SAME triple table
    (sh:class — every object must carry that rdf:type).  ``targets`` optionally narrows the
    focus-node universe (e.g. subjects of one ``rdf:type``, SHACL's
    ``sh:targetClass``) as a one-column ``focus`` DataFrame; the
    default universe is every distinct subject of the constrained
    predicates — note that a subject appearing ONLY under unconstrained
    predicates is then outside the universe, so ``min_count`` does not
    fire for it (pass explicit ``targets`` for strict targeting).

    A shape may carry ``path`` — a property-path AST from
    :mod:`~mhdb_tables2turtles_spark.web.paths` (SHACL ``sh:path``
    beyond a plain predicate): the shape's value nodes become the
    path-reachable pairs from :func:`~mhdb_tables2turtles_spark.web
    .paths.eval_path`, materialized ONCE per shape as virtual
    ``(focus, <label>, value)`` edges and unioned into the constraint
    base, so every constraint component (cardinality / in / nodeKind /
    class) applies to path shapes unchanged.  The shape's
    ``predicate`` is then only the REPORT LABEL and must not collide
    with a plain constrained predicate.  Scale posture is the path
    engine's own: each step predicate-prunes on the store layout,
    closures are semi-naive.
    """
    if not shapes:
        raise ValueError("validate_shapes needs at least one shape")
    plain = [s for s in shapes if not s.get("path")]
    pathy = [s for s in shapes if s.get("path")]
    plain_preds = sorted({s["predicate"] for s in plain})
    labels = {s["predicate"] for s in pathy}
    if labels & set(plain_preds):
        raise ValueError(
            "sh:path report label collides with a constrained "
            f"predicate: {sorted(labels & set(plain_preds))}"
        )
    parts = []
    if plain:
        parts.append(
            triples.filter(F.col("predicate").isin(*plain_preds)).select(
                "subject", "predicate", "object"
            )
        )
    if pathy:
        from mhdb_tables2turtles_spark.web.paths import eval_path

        for s in pathy:
            parts.append(
                eval_path(triples, s["path"]).select(
                    F.col("src").alias("subject"),
                    F.lit(s["predicate"]).alias("predicate"),
                    F.col("dst").alias("object"),
                )
            )
    base = parts[0]
    for p in parts[1:]:
        base = base.unionByName(p)
    typed = None
    if any(s.get("object_class") for s in shapes):
        typed = triples.filter(F.col("predicate") == type_pred).select(
            F.col("subject").alias("__ent"),
            F.col("object").alias("__cls"),
        )

    if targets is None:
        focus = base.select(F.col("subject").alias("focus")).distinct()
    else:
        focus = targets.select(F.col(targets.columns[0]).alias("focus"))
    focus = focus.localCheckpoint(eager=False)

    need_counts = [
        s for s in shapes
        if s.get("min_count") is not None or s.get("max_count") is not None
    ]
    reports: list[DataFrame] = []

    if need_counts:
        counts = (
            base.filter(
                F.col("predicate").isin(
                    *sorted({s["predicate"] for s in need_counts})
                )
            )
            .groupBy("subject", "predicate")
            .agg(F.count_distinct("object").alias("__n"))
        )
        for s in need_counts:
            per = (
                focus.join(
                    counts.filter(F.col("predicate") == s["predicate"])
                    .withColumnRenamed("subject", "focus")
                    .drop("predicate"),
                    "focus",
                    "left",
                )
                .select(
                    "focus",
                    F.coalesce(F.col("__n"), F.lit(0)).alias("__n"),
                )
            )
            if s.get("min_count") is not None:
                reports.append(
                    per.filter(F.col("__n") < s["min_count"]).select(
                        "focus",
                        F.lit(s["predicate"]).alias("predicate"),
                        F.lit("minCount").alias("component"),
                        F.col("__n").cast("string").alias("value"),
                    )
                )
            if s.get("max_count") is not None:
                reports.append(
                    per.filter(F.col("__n") > s["max_count"]).select(
                        "focus",
                        F.lit(s["predicate"]).alias("predicate"),
                        F.lit("maxCount").alias("component"),
                        F.col("__n").cast("string").alias("value"),
                    )
                )

    for s in shapes:
        rows = base.filter(F.col("predicate") == s["predicate"])
        if s.get("node_prefix") is not None:
            reports.append(
                rows.filter(~F.col("object").startswith(s["node_prefix"]))
                .select(
                    F.col("subject").alias("focus"),
                    F.lit(s["predicate"]).alias("predicate"),
                    F.lit("nodeKind").alias("component"),
                    F.col("object").alias("value"),
                )
                .distinct()
            )
        if s.get("not_in"):
            reports.append(
                rows.filter(F.col("object").isin(*s["not_in"]))
                .select(
                    F.col("subject").alias("focus"),
                    F.lit(s["predicate"]).alias("predicate"),
                    F.lit("in").alias("component"),
                    F.col("object").alias("value"),
                )
                .distinct()
            )
        if s.get("object_class"):
            conforming = typed.filter(
                F.col("__cls") == s["object_class"]
            ).select(F.col("__ent").alias("object"))
            reports.append(
                rows.select("subject", "object")
                .distinct()
                .join(conforming, "object", "left_anti")
                .select(
                    F.col("subject").alias("focus"),
                    F.lit(s["predicate"]).alias("predicate"),
                    F.lit("class").alias("component"),
                    F.col("object").alias("value"),
                )
            )

    if not reports:
        raise ValueError("no shape carries any constraint")
    return reduce(lambda a, b: a.unionByName(b), reports).select(
        *_REPORT_COLS
    )
