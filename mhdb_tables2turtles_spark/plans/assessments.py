"""Plan for the reference's assessments workbook
(``ingest_assessments``, /root/reference/mhdb/ingest.py:1834-2703).

The questions sheet is the W1+W2 composition the reference builds
imperatively (ingest.py:2124-2309):

* **W1** — per-questionnaire running counter: question IRIs are minted as
  ``{questionnaire}_Q{qnum}`` where qnum resets at each new questionnaire
  (ingest.py:2126-2140).  Spark-side this is ``row_number() over
  (partition by questionnaire order by row_id)`` — identical when the
  sheet lists each questionnaire's questions contiguously (the reference
  state machine would *re-increment across interleaved questionnaires*,
  minting duplicate IRIs; we treat grouped input as the contract).
* **W2** — response options parse into a positional ``rdf:Seq``:
  ``0=Never, 1=Sometimes, 2="Often, very often"`` splits on commas, or on
  the ``N="..."`` regex when quotes are present, and each option emits
  ``rdf:_{i}`` membership plus an option-text literal
  (ingest.py:2199-2239).  Spark-side: ``regexp_extract_all`` / ``split``
  + ``posexplode`` — row-local, no shuffle.

task_assertions resolution reuses the Cognitive-Atlas J4/J5 operators
(:mod:`plans.cogatlas` — the reference block ingest.py:2525-2648 is the
same code as its CSV variant).

Reference dead code deliberately not reproduced (documented):

* ``index_license`` (ingest.py:2112) dereferences undefined names
  (``shared``/``licenses`` — NameError whenever set; the assessments
  ingest never parses a licenses sheet, so there is no intent to recover)
  — omitted;
* the response_types loop appends ``definition``/``equivalentClasses`` to
  a stale ``predicates_list`` left over from the questions loop and never
  emits it (ingest.py:2332-2344) — only its two direct
  ``add_to_statements`` calls (subClassOf + label) are live;
* ASSERTS assertions reuse the previous loop iteration's predicate (the
  stale-``predicate_iri`` bug, see :mod:`plans.cogatlas`) — we emit the
  evident intent ``:assertsCognitiveAtlasConcept`` (oracle-checked by
  ``j5_reln_dispatch``).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.functions import udfs
from mhdb_tables2turtles_spark.operators.triples import (
    exclude_filter,
    union_triples,
)
from mhdb_tables2turtles_spark.plans.cogatlas import assertion_triples
from mhdb_tables2turtles_spark.plans.common import classes_spec, properties_spec
from mhdb_tables2turtles_spark.plans.sheetspec import (
    ForeignKey,
    Literal,
    SheetSpec,
    _fk_elements,
    sheet_triples,
)

__all__ = ["ASSESSMENTS_SPECS", "question_triples", "assessments_triples"]

# fmt: off
ASSESSMENTS_SPECS = (
    classes_spec(),
    properties_spec(),
    # questionnaires worksheet, ingest.py:1967-2122
    SheetSpec(
        table="questionnaires", subject_column="title", subject_style="delimited",
        rdf_type=":Questionnaire",
        emitters=(
            Literal("title", ":hasTitle"),
            Literal("abbreviation", ":hasAbbreviation"),
            Literal("description", "rdfs:comment"),
            Literal("link", ":hasWebsite", "anyURI"),
            Literal("authors", ":hasAuthorList"),
            Literal("year", ":hasPublicationYear", "gyear"),
            ForeignKey("use_with_assessments", "questionnaires", "title", ":useWith", style="delimited"),
            Literal("number_of_questions", ":hasNumberOfQuestions", "nonNegativeInteger"),
            Literal("minutes_to_complete", ":takesMinutesToComplete", "decimal"),
            Literal("age_min", "schema:requiredMinAge", "decimal"),
            Literal("age_max", "schema:requiredMaxAge", "decimal"),
        ),
    ),
    # response_types worksheet, ingest.py:2311-2344 (live surface only)
    SheetSpec(
        table="response_types", subject_column="response_type",
        rdf_type=":ResponseType", type_predicate="rdfs:subClassOf",
    ),
    # tasks worksheet, ingest.py:2346-2379
    SheetSpec(
        table="tasks", subject_column="name",
        rdf_type=":Task", type_predicate="rdfs:subClassOf",
        emitters=(
            Literal("description", "rdfs:comment"),
            Literal("aliases", "rdfs:label", split=True),
        ),
    ),
    # task_implementations worksheet, ingest.py:2381-2436: reversed task
    # FK (the TASK becomes the subject) + cross-workbook project FK whose
    # object IRI is qualified with the source-document prefix
    SheetSpec(
        table="task_implementations", subject_column="implementation",
        subject_style="delimited", rdf_type=":TaskImplementation",
        emitters=(
            Literal("description", "rdfs:comment"),
            Literal("link", ":hasWebsite", "anyURI"),
            ForeignKey("indices_task", "tasks", "name", ":hasTaskImplementation", reverse=True),
            ForeignKey("indices_project", "projects", "project", ":hasProject",
                       style="delimited", obj_prefix="mhdb-resources"),
        ),
    ),
    # task_conditions / task_contrasts / task_indicators, ingest.py:2438-2523
    SheetSpec(
        table="task_conditions", subject_column="condition",
        subject_style="delimited", rdf_type=":TaskCondition",
        emitters=(Literal("description", "rdfs:comment"),),
    ),
    SheetSpec(
        table="task_contrasts", subject_column="contrast",
        subject_style="delimited", rdf_type=":TaskContrast",
    ),
    SheetSpec(
        table="task_indicators", subject_column="indicator",
        subject_style="delimited", rdf_type=":TaskIndicator",
    ),
    # references worksheet, ingest.py:2650-2703 (pubdate variant)
    SheetSpec(
        table="references", subject_column="title", subject_style="delimited",
        rdf_type=":BibliographicResource",
        emitters=(
            Literal("title", ":hasTitle"),
            Literal("link", ":hasWebsite", "anyURI"),
            Literal("entry_date", ":hasDateLastUpdated"),
            Literal("authors", ":hasAuthorList"),
            Literal("pubdate", ":hasPublicationDate"),
            Literal("PubMedID", ":hasPubMedID", "nonNegativeInteger", int_cast=True),
        ),
    ),
)
# fmt: on

# the N="..." option tokenizer (ingest.py:2204-2205)
_QUOTED_OPT = r'[-+]?[0-9]+=".*?"'


def _nz(c: F.Column) -> F.Column:
    return F.when(exclude_filter(c), c)


def question_triples(
    tables: Mapping[str, DataFrame], sheet_rank: int
) -> DataFrame:
    """questions worksheet: W1 numbering + instructions side entities +
    W2 response-option rdf:Seq + response-type FK (ingest.py:2124-2309)."""
    qn = tables["questionnaires"].select(
        F.col("index").cast("long").alias("__qidx"),
        F.trim(F.col("title")).alias("__qtitle"),
    )
    q = (
        tables["questions"]
        .withColumn("question", F.trim(F.col("question")))
        .filter(exclude_filter(F.col("question")))
        .join(
            F.broadcast(qn),
            F.col("index_questionnaire").cast("long") == F.col("__qidx"),
            "inner",
        )
    )
    # W1: per-questionnaire running counter in sheet order
    w = Window.partitionBy("__qtitle").orderBy("row_id")
    q = q.withColumn("__qnum", F.row_number().over(w))
    q = q.withColumn(
        "__subject",
        udfs.iri(
            F.format_string("%s_Q%s", F.col("__qtitle"), F.col("__qnum")),
            "delimited",
        ),
    )
    # instruction cells are stripped before every presence/equality check
    for c in ("paper_instructions_preamble", "paper_instructions",
              "digital_instructions_preamble", "digital_instructions"):
        q = q.withColumn(c, _nz(F.trim(F.col(c))))
    q = q.localCheckpoint(eager=False)  # reused by ~15 selects below

    def part(df, pred: str, obj: F.Column, rank: int, subj=None):
        return df.select(
            (F.col("__subject") if subj is None else subj).alias("subject"),
            F.lit(pred).alias("predicate"),
            obj.alias("object"),
            F.lit(sheet_rank).alias("sheet_rank"),
            F.col("row_id").alias("row_id"),
            F.lit(rank).alias("pred_rank"),
        )

    qlabel = udfs.lang_literal(F.col("question"))
    parts = [
        part(q, "a", F.lit(":Question"), 0),
        part(q, "rdfs:label", qlabel, 1),
        part(q, ":hasQuestionText", qlabel, 2),
        part(q, ":isReferencedBy", udfs.iri(F.col("__qtitle"), "delimited"), 3),
    ]

    # instructions: digital unconditional; paper only when different
    # (ingest.py:2153-2196).  NB the reference emits :hasInstructions as a
    # *literal* but :hasPaperInstructions as an IRI — faithful here.
    dip = q.filter(F.col("digital_instructions_preamble").isNotNull())
    dip_iri = udfs.iri(F.col("digital_instructions_preamble"), "delimited")
    dip_lit = udfs.lang_literal(F.col("digital_instructions_preamble"))
    parts += [
        part(dip, ":hasInstructionsPreamble", dip_iri, 4),
        part(dip, ":hasInstructionsPreambleText", dip_lit, 5, subj=dip_iri),
    ]
    di = q.filter(F.col("digital_instructions").isNotNull())
    di_iri = udfs.iri(F.col("digital_instructions"), "delimited")
    di_lit = udfs.lang_literal(F.col("digital_instructions"))
    parts += [
        part(di, ":hasInstructions", di_lit, 6),
        part(di, ":hasInstructionsText", di_lit, 7, subj=di_iri),
    ]
    pip = q.filter(
        F.col("paper_instructions_preamble").isNotNull()
        & (
            F.col("digital_instructions_preamble").isNull()
            | (F.col("paper_instructions_preamble")
               != F.col("digital_instructions_preamble"))
        )
    )
    pip_iri = udfs.iri(F.col("paper_instructions_preamble"), "delimited")
    pip_lit = udfs.lang_literal(F.col("paper_instructions_preamble"))
    parts += [
        part(pip, ":hasPaperInstructionsPreamble", pip_iri, 8),
        part(pip, ":hasPaperInstructionsPreambleText", pip_lit, 9, subj=pip_iri),
    ]
    pi = q.filter(
        F.col("paper_instructions").isNotNull()
        & (
            F.col("digital_instructions").isNull()
            | (F.col("paper_instructions") != F.col("digital_instructions"))
        )
    )
    pi_iri = udfs.iri(F.col("paper_instructions"), "delimited")
    pi_lit = udfs.lang_literal(F.col("paper_instructions"))
    parts += [
        part(pi, ":hasPaperInstructions", pi_iri, 10),
        part(pi, ":hasPaperInstructionsText", pi_lit, 11, subj=pi_iri),
    ]

    # W2: response options -> rdf:Seq (ingest.py:2199-2239)
    ro = q.filter(exclude_filter(F.col("response_options"))).withColumn(
        "__ro",
        F.regexp_replace(
            F.regexp_replace(F.col("response_options"), r"^-+|-+$", ""),
            r"\n", "",
        ),
    )
    ro = ro.withColumn("__ro_iri", udfs.iri(F.col("__ro"), "delimited"))
    parts += [
        part(ro, ":hasResponseOptions", F.col("__ro_iri"), 12),
        part(ro, "a", F.lit("rdf:Seq"), 13, subj=F.col("__ro_iri")),
    ]
    opts = ro.select(
        "row_id",
        "__ro_iri",
        F.posexplode(
            F.when(
                F.col("__ro").contains('"'),
                F.regexp_extract_all("__ro", F.lit(_QUOTED_OPT), 0),
            ).otherwise(F.split("__ro", ","))
        ).alias("__pos", "__opt"),
    ).withColumn(
        "__resp", F.trim(F.split("__opt", "=").getItem(1))
    ).filter(exclude_filter(F.col("__resp")))
    resp_iri = udfs.iri(F.col("__resp"), "delimited")
    parts += [
        part(opts, ":hasResponseOptionText",
             udfs.lang_literal(F.col("__resp")), 14, subj=resp_iri),
        opts.select(
            F.col("__ro_iri").alias("subject"),
            F.format_string("rdf:_%s", F.col("__pos") + 1).alias("predicate"),
            resp_iri.alias("object"),
            F.lit(sheet_rank).alias("sheet_rank"),
            F.col("row_id").alias("row_id"),
            F.lit(15).alias("pred_rank"),
        ),
    ]

    # response-type FK (ingest.py:2241-2255): csv-int against the
    # response_types sheet, PascalCase objects, broadcast join
    rt_dim = tables["response_types"].select(
        F.col("index").cast("long").alias("__rtidx"),
        F.col("response_type").alias("__rtval"),
    )
    rt = (
        q.filter(exclude_filter(F.col("indices_response_type")))
        .select(
            "row_id",
            "__subject",
            F.explode(
                _fk_elements(F.col("indices_response_type"))
            ).alias("__fk"),
        )
        .join(F.broadcast(rt_dim), F.col("__fk") == F.col("__rtidx"))
        .filter(exclude_filter(F.col("__rtval")))
    )
    parts.append(
        part(rt, ":hasResponseType", udfs.iri(F.col("__rtval"), "PascalCase"), 16)
    )

    return union_triples(parts)


def _assertion_tables(tables: Mapping[str, DataFrame]) -> dict:
    """Workbook sheets -> the (node_id, value) tables + relationships the
    shared Cognitive-Atlas resolver consumes (ingest.py:2525-2648)."""
    out = {}
    for sheet, value_col in (
        ("tasks", "name"),
        ("task_implementations", "implementation"),
        ("task_indicators", "indicator"),
        ("task_conditions", "condition"),
        ("task_contrasts", "contrast"),
    ):
        name = sheet.replace("task_", "") if sheet != "tasks" else "tasks"
        out[name] = tables[sheet].select(
            F.col("cogatlas_node_id").cast("long").alias("node_id"),
            F.col(value_col).alias("value"),
        ).filter(
            F.col("node_id").isNotNull()
            & F.col("value").isNotNull()
            & (F.length(F.trim(F.col("value"))) > 0)
        )
    out["relationships"] = tables["task_assertions_indices"].select(
        F.col("cogatlas_reln_type").alias("reln_type"),
        F.col("cogatlas_startNode").cast("long").alias("startNode"),
        F.col("cogatlas_endNode").cast("long").alias("endNode"),
    ).filter(F.col("startNode").isNotNull() & F.col("endNode").isNotNull())
    return out


def assessments_triples(tables: Mapping[str, DataFrame]) -> DataFrame:
    """Whole workbook: SheetSpec sheets + questions chain + assertions."""
    simple = [
        sheet_triples(tables, spec, i) for i, spec in enumerate(ASSESSMENTS_SPECS)
    ]
    n = len(ASSESSMENTS_SPECS)
    q = question_triples(tables, n)
    asserts = assertion_triples(_assertion_tables(tables)).select(
        "subject", "predicate", "object",
        F.lit(n + 1).alias("sheet_rank"),
        F.lit(0).cast("long").alias("row_id"),
        F.lit(0).alias("pred_rank"),
    )
    return union_triples(simple + [q, asserts])
