"""run_all driver parity: build every reference workbook's Turtle file.

The reference's entry point (``create_mhdb:175-218``) dispatches over six
ingest pipelines and writes one ``.ttl`` per workbook (``run_all=1``
mode; the shipped config runs only chills).  This module is that driver
re-expressed over the declared plans: one registry mapping workbook name
-> (triple builder, fixture frames), a parquet loader for real
deployments, and :func:`run_all` writing ``<name>.ttl`` per workbook.

Input resolution per workbook:

* ``tables_root`` given — read ``<root>/<workbook>/<Sheet>.parquet`` per
  sheet (the production path: worksheets pre-materialized as parquet,
  SURVEY.md §2.1 S1/S2).  Missing ``row_id`` columns are rejected — the
  stable source-row ordinal is part of the contract (serialization order
  + W1 numbering).
* no ``tables_root`` — deterministic fixtures: the chills workbook is
  reverse-engineered from the committed golden output
  (``sources/golden.py``), the other five come from
  ``sources/workbooks.py`` (the same frames the reference-execution
  parity tests run).
"""

from __future__ import annotations

import os
from typing import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession

from mhdb_tables2turtles_spark.operators.serialize import render_document
from mhdb_tables2turtles_spark.operators.triples import (
    dedup_triples,
    filter_valid,
)
from mhdb_tables2turtles_spark.plans.sheetspec import workbook_triples

__all__ = ["WORKBOOKS", "load_workbook_tables", "build_workbook", "run_all"]


def _chills_frames():
    from mhdb_tables2turtles_spark.sources.golden import (
        load_golden_triples,
        reverse_fixture,
    )

    return reverse_fixture(load_golden_triples())


def _chills_triples(tables: Mapping[str, DataFrame]) -> DataFrame:
    from mhdb_tables2turtles_spark.plans.chills import CHILLS_SPECS

    return workbook_triples(tables, CHILLS_SPECS)


def _states_triples(tables: Mapping[str, DataFrame]) -> DataFrame:
    from mhdb_tables2turtles_spark.plans.states import STATES_SPECS

    return workbook_triples(tables, STATES_SPECS)


def _measures_triples(tables: Mapping[str, DataFrame]) -> DataFrame:
    from mhdb_tables2turtles_spark.plans.measures import MEASURES_SPECS

    return workbook_triples(tables, MEASURES_SPECS)


def _frames_fn(name: str):
    from mhdb_tables2turtles_spark.sources import workbooks as wb

    return getattr(wb, f"{name}_frames")


def _plan_fn(name: str) -> Callable[[Mapping[str, DataFrame]], DataFrame]:
    if name == "disorders":
        from mhdb_tables2turtles_spark.plans.disorders import disorders_triples

        return disorders_triples
    if name == "resources":
        from mhdb_tables2turtles_spark.plans.resources import resources_triples

        return resources_triples
    from mhdb_tables2turtles_spark.plans.assessments import assessments_triples

    return assessments_triples


# name -> (triples builder, fixture frames builder); insertion order is
# the reference driver's dispatch order (create_mhdb:175-218)
WORKBOOKS: dict[str, tuple] = {
    "states": (_states_triples, lambda: _frames_fn("states")()),
    "disorders": (lambda t: _plan_fn("disorders")(t), lambda: _frames_fn("disorders")()),
    "resources": (lambda t: _plan_fn("resources")(t), lambda: _frames_fn("resources")()),
    "assessments": (lambda t: _plan_fn("assessments")(t), lambda: _frames_fn("assessments")()),
    "measures": (_measures_triples, lambda: _frames_fn("measures")()),
    "chills": (_chills_triples, _chills_frames),
}


def load_workbook_tables(
    spark: SparkSession, name: str, tables_root: str | None = None
) -> dict[str, DataFrame]:
    """Worksheet tables for one workbook: parquet under ``tables_root``
    (production) or deterministic fixtures (demo/test)."""
    if tables_root is not None:
        wb_dir = os.path.join(tables_root, name)
        tables = {}
        for fn in sorted(os.listdir(wb_dir)):
            if not fn.endswith(".parquet"):
                continue
            sheet = fn[: -len(".parquet")]
            df = spark.read.parquet(os.path.join(wb_dir, fn))
            if "row_id" not in df.columns:
                raise ValueError(
                    f"{name}/{sheet}: missing required 'row_id' column "
                    "(stable source-row ordinal)"
                )
            tables[sheet] = df
        return tables
    frames = WORKBOOKS[name][1]()
    if name == "chills":
        from mhdb_tables2turtles_spark.sources.golden import (
            fixture_spark_tables,
        )

        return fixture_spark_tables(spark, frames)
    from mhdb_tables2turtles_spark.sources.workbooks import spark_tables

    return spark_tables(spark, frames)


def build_workbook(
    spark: SparkSession,
    name: str,
    tables: Mapping[str, DataFrame] | None = None,
    tables_root: str | None = None,
) -> DataFrame:
    """Deduped triple DataFrame for one workbook plan."""
    if tables is None:
        tables = load_workbook_tables(spark, name, tables_root)
    build = WORKBOOKS[name][0]
    return dedup_triples(filter_valid(build(tables)))


def run_all(
    spark: SparkSession,
    out_dir: str,
    tables_root: str | None = None,
    base_uri: str = "http://www.purl.org/mentalhealth",
    version: str = "0.1.0",
    validate: bool = True,
    profile: str = "reference",
) -> dict[str, dict]:
    """Build and write ``<out_dir>/<workbook>.ttl`` for every workbook —
    the reference's ``run_all=1`` driver path.  Returns per-workbook
    triple counts and output paths.

    ``validate`` runs every rendered document through the strict Turtle
    grammar checker before the atomic write — the Spark analogue of the
    reference's external-parser pass
    (/root/reference/validate_turtle_files.sh:12-24).  A document that
    fails (e.g. a worksheet cell containing a bare backslash, which the
    reference's escape chain — reproduced verbatim for parity — passes
    through into the literal) is NOT written; its ``validation_error``
    is recorded in the result and the remaining workbooks still build,
    so one bad cell never turns the whole driver run into a crash with
    no artifacts.

    ``profile="owl"`` rewrites the reference's nonstandard vocabulary
    (``rdf:Class``/``rdf:Property``/``rdfs:equivalentProperty``) to the
    standards-compliant OWL tokens its legacy serializer documents
    (write_rdf.py) via :func:`operators.serialize.owl_profile`; the
    default ``"reference"`` preserves the verbatim tokens for golden
    parity.

    Writes are atomic (tmp file + ``os.replace``) and the builds are
    deterministic, so a run killed between workbooks simply re-runs:
    completed ``.ttl`` files are byte-identically rewritten, partial
    ``.tmp`` files are overwritten, and no reader ever sees a torn file.

    The per-workbook graphs are ontology-sized (the web-scale path is
    ``web/pipeline.py``), so the single-document renderer is the right
    sink here — same choice as ``render_body``'s documented small-graph
    mode.
    """
    from mhdb_tables2turtles_spark.operators.validate import (
        TurtleSyntaxError,
        validate_turtle,
    )

    os.makedirs(out_dir, exist_ok=True)
    # prefix table: the resources workbook's `ontologies` sheet, exactly
    # like the reference driver (create_mhdb:370-388) — every workbook's
    # header resolves its harvested prefixes against this one sheet
    ontologies = load_workbook_tables(spark, "resources", tables_root).get(
        "ontologies"
    )
    out: dict[str, dict] = {}
    for name in WORKBOOKS:
        # materialize once: the renderer needs three actions over the
        # triple set (prefix harvest, ordered body, count) and the
        # workbook plans are deep union-of-join trees — without this each
        # action recomputes the whole plan (measured 3x the runtime)
        triples = build_workbook(
            spark, name, tables_root=tables_root
        ).localCheckpoint()
        if profile == "owl":
            from mhdb_tables2turtles_spark.operators.serialize import (
                owl_profile,
            )

            triples = owl_profile(triples)
        doc = render_document(
            triples,
            f"{base_uri}/{name}",
            version,
            name,
            f"mhdb {name} workbook (PySpark plan)",
            prefix_table=ontologies,
        )
        n_pairs = err = None
        if validate:
            try:
                n_pairs = validate_turtle(doc)
            except TurtleSyntaxError as exc:
                err = str(exc)
        path = os.path.join(out_dir, f"{name}.ttl")
        if err is None:
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(doc)
            os.replace(tmp, path)
        elif os.path.exists(path):
            # disk must match the returned path=None: a stale .ttl from
            # an earlier successful run would otherwise be picked up by
            # consumers globbing out_dir
            os.remove(path)
        out[name] = {
            "path": path if err is None else None,
            "n_triples": triples.count(),
            "n_pairs_validated": n_pairs,
            "validation_error": err,
        }
    return out
