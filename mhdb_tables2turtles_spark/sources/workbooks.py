"""Deterministic fixture frames for the five non-chills workbooks.

Hand-authored small tables (FIXTURES.md §2/§4): every FK resolves, ~15%
of optional cells are empty, and labels exercise the verified F3/F4 edge
cases (slashes, parens, quotes, newlines, double spaces, acronyms).

The same frames feed two consumers in the parity tests:

* the *reference itself* via a fake-ExcelFile shim (its ``ingest_*``
  functions run unmodified on these frames and produce the golden triple
  dict), and
* our Spark plans via :func:`spark_tables`.

Cells are strings (or ``None``): spreadsheet semantics.  Subjects of
fact sheets are always present because the reference row loops mint
subject IRIs unconditionally (e.g. ingest.py:197 would emit an
``:EmptyValue`` subject for a blank state) while our engine filters
required subjects (P3) — fixtures stay inside the intersection.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T

__all__ = ["states_frames", "measures_frames", "spark_tables"]


def _is_int_col(name: str) -> bool:
    """Columns holding real ints: the reference equi-compares ``index`` and
    scalar ``index_*`` cells directly against int values (e.g.
    ``references["index"] == row[1]["index_reference"]``, ingest.py:421),
    so string-typed cells would silently never match.  csv-int ``indices_*``
    cells stay strings (always ``.split(',')``-parsed)."""
    return name in ("index", "row_id", "cogatlas_node_id") or (
        name.startswith("index_") and not name.startswith("indices_")
    ) or name.startswith("cogatlas_startNode") or name.startswith("cogatlas_endNode")


def _frame(columns: list[str], rows: list[tuple]) -> pd.DataFrame:
    df = pd.DataFrame(rows, columns=columns).astype(object)
    df = df.where(pd.notna(df), None)
    for c in df.columns:
        if _is_int_col(c):
            df[c] = df[c].map(lambda v: None if v is None else int(v))
    return df


def _classes_frame() -> pd.DataFrame:
    return _frame(
        ["ClassName", "label", "definition", "sameAs", "equivalentClasses", "subClassOf"],
        [
            ("Calm State", "calm state", 'being "at ease"', None,
             "sio:SIO_000001, obo:MF_0000020", "Mental State"),
            ("Mental State", "mental  state", None, "obo:NBO_0000313", None, None),
            ("EEG Device", "EEG device", "device with\nelectrodes", None, None, None),
        ],
    )


def _properties_frame() -> pd.DataFrame:
    return _frame(
        ["property", "label", "propertyDomain", "propertyRange", "definition",
         "sameAs", "equivalentProperty", "subPropertyOf"],
        [
            ("has domain type", "has domain type", "Mental State", "Domain Type",
             "links a state/domain", None, "obo:RO_0000052", None),
            ("measures thing", "measures thing?", None, None, None,
             "ssn:forProperty", None, "has domain type"),
        ],
    )


def states_frames() -> dict[str, pd.DataFrame]:
    """states workbook (ingest.py:79-251 sheet shapes)."""
    states = _frame(
        ["index", "state", "indices_state_type", "indices_state_category"],
        [
            ("1", "anxiety / panic", "1", None),
            ("2", "joy -- elation (JOY)", "1,2", "1"),
            ("3", "flow", "2", "1, 2"),
            ("4", "alertness", None, "3"),
        ],
    )
    state_types = _frame(
        ["index", "state_type"],
        [("1", "emotional state"), ("2", "cognitive state")],
    )
    return {
        "Classes": _classes_frame(),
        "Properties": _properties_frame(),
        "states": states,
        "state_types": state_types,
    }


def measures_frames() -> dict[str, pd.DataFrame]:
    """measures workbook (ingest.py:2705-3004 sheet shapes)."""
    sensors = _frame(
        ["index", "sensor", "definition", "equivalentClasses", "aliases",
         "indices_sensor", "indices_measure"],
        [
            ("1", "EEG cap", "cap with electrodes", "ssn:SensingDevice", None,
             None, "1,2"),
            ("2", "heart-rate monitor (HRM)", None, None, "HRM, pulse watch",
             "1", "2"),
            ("3", "camera", 'records "video"', None, None, None, None),
        ],
    )
    measures = _frame(
        ["index", "measure", "definition", "equivalentClasses", "aliases",
         "indices_measure"],
        [
            ("1", "voltage", None, "qudt:Voltage", None, None),
            ("2", "heart rate", "beats per minute", None, "HR", "1"),
            ("3", "breathing rate / respiration", None, None, None, "2"),
        ],
    )
    scales = _frame(
        ["index", "scale", "definition", "equivalentClasses", "aliases",
         "indices_scale"],
        [
            ("1", "likert scale", "ordinal response scale", None, None, None),
            ("2", "visual analog scale", None, None, "VAS", "1"),
        ],
    )
    return {
        "Classes": _classes_frame(),
        "Properties": _properties_frame(),
        "sensors": sensors,
        "measures": measures,
        "scales": scales,
    }


def disorders_frames() -> dict[str, pd.DataFrame]:
    """disorders workbook (ingest.py:253-1039 sheet shapes).

    Row 1 exercises the full compound-label stack (ICD codes, specifier,
    inclusion/exclusion criteria, severity, 4-level category chain); rows
    2-4 take the sub/cat/fallback branches.
    """
    disorders = _frame(
        ["index", "disorder", "equivalentClasses", "subClassOf", "note",
         "ICD9CM", "ICD10CM", "index_diagnostic_specifier",
         "index_diagnostic_inclusion_criterion",
         "index_diagnostic_inclusion_criterion2",
         "index_diagnostic_exclusion_criterion",
         "index_diagnostic_exclusion_criterion2", "index_severity",
         "index_disorder_category", "index_disorder_subcategory",
         "index_disorder_subsubcategory", "index_disorder_subsubsubcategory"],
        [
            ("1", "fear of spiders", None, None, None, "300.29", "F40.218",
             "1", "1", "2", "3", None, "1", "2", "2", "1", "1"),
            ("2", "bipolar I disorder", None, None, None, None, "F31",
             None, None, None, None, None, "2", "1", "1", None, None),
            ("3", "generalized anxiety disorder (GAD)", "obo:MONDO_0001942",
             "Mental State", "chronic  worry", None, None,
             None, None, None, None, None, None, "2", None, None, None),
            ("4", "despair", None, None, None, None, None,
             None, None, None, None, None, None, None, None, None, None),
        ],
    )
    sign_or_symptoms = _frame(
        ["index", "sign_or_symptom", "sign_or_symptom_number",
         "index_reference", "index_gender", "indices_disorder",
         "indices_sign_or_symptom"],
        [
            ("1", "restlessness", "2", "1", None, "2,3", None),
            ("2", "tremor", "1", None, "1", "1", "1"),
            ("3", "racing thoughts?", "2", "2", "2", "3", None),
        ],
    )
    examples = _frame(
        ["index", "examples_sign_or_symptoms", "indices_sign_or_symptom"],
        [
            ("1", "pacing around", "1,2"),
            ("2", 'hand "shaking"', "2"),
        ],
    )
    severities = _frame(
        ["index", "severity", "definition", "equivalentClasses", "subClassOf"],
        [
            ("1", "mild", "minimal impairment", None, None),
            ("2", "moderate", None, "obo:HP_0012826", None),
            ("3", "severe -- disabling", None, None, "Mental State"),
        ],
    )
    diagnostic_specifiers = _frame(
        ["index", "diagnostic_specifier", "equivalentClasses", "subClassOf"],
        [
            ("1", "with anxious distress", None, None),
            ("2", "in partial remission", "obo:MONDO_0021128", None),
        ],
    )
    diagnostic_criteria = _frame(
        ["index", "diagnostic_criterion", "equivalentClasses", "subClassOf"],
        [
            ("1", "excessive fear", None, None),
            ("2", "immediate anxiety response", None, None),
            ("3", "better explained by OCD", None, "Mental State"),
        ],
    )
    categories = _frame(
        ["index", "disorder_category", "equivalentClasses", "subClassOf"],
        [
            ("1", "mood disorders", None, None),
            ("2", "anxiety disorders", "obo:MONDO_0011918", None),
        ],
    )
    subcategories = _frame(
        ["index", "disorder_subcategory", "equivalentClasses", "subClassOf"],
        [
            ("1", "bipolar disorders", None, None),
            ("2", "phobias", None, None),
        ],
    )
    subsubcategories = _frame(
        ["index", "disorder_subsubcategory", "equivalentClasses", "subClassOf"],
        [("1", "specific phobias", None, None)],
    )
    subsubsubcategories = _frame(
        ["index", "disorder_subsubsubcategory", "equivalentClasses", "subClassOf"],
        [("1", "animal phobias", None, None)],
    )
    references = _frame(
        ["index", "title", "link", "entry_date", "authors", "year", "PubMedID"],
        [
            ("1", "DSM-5", "https://dsm.example.org ", None, "APA", "2013", None),
            ("2", "A study of worry/fear", None, "2020-01-02",
             "Smith J, Lee K", None, "12345"),
        ],
    )
    return {
        "Classes": _classes_frame(),
        "Properties": _properties_frame(),
        "disorders": disorders,
        "sign_or_symptoms": sign_or_symptoms,
        "examples_sign_or_symptoms": examples,
        "severities": severities,
        "diagnostic_specifiers": diagnostic_specifiers,
        "diagnostic_criteria": diagnostic_criteria,
        "disorder_categories": categories,
        "disorder_subcategories": subcategories,
        "disorder_subsubcategories": subsubcategories,
        "disorder_subsubsubcategories": subsubsubcategories,
        "references": references,
    }


def resources_frames() -> dict[str, pd.DataFrame]:
    """resources workbook (ingest.py:1041-1832 sheet shapes).

    ``index_license`` is always empty: the reference's license branch
    dereferences an undefined name (``shared``, ingest.py:1312) and
    crashes whenever a license is set, so the executable surface is the
    null path.  Our plan implements the evident licenses-sheet intent,
    covered by a dedicated unit test instead of this parity fixture.
    """
    guide_types = _frame(
        ["index", "guide_type", "subClassOf"],
        [("1", "clinical guideline", None), ("2", "self-help book", "Mental State")],
    )
    guides = _frame(
        ["index", "title", "link", "entry_date", "authors", "publisher",
         "pubdate", "indices_guide_type", "index_gender", "indices_audience",
         "indices_subject", "indices_language", "index_license"],
        [
            ("1", "Coping with worry -- a guide", "https://guide.example.org ",
             "2020-03-04", "Smith J", "ACME Press", "2019", "1,2", "1",
             None, None, "1", None),
            ("2", 'The "calm" handbook', None, None, None, None, None,
             "2", None, None, None, None, None),
        ],
    )
    treatments = _frame(
        ["index", "treatment", "indices_treatment", "aliases", "definition",
         "equivalentClasses"],
        [
            ("1", "talk therapy", None, "psychotherapy, counselling",
             "conversation-based treatment", None),
            ("2", "cognitive behavioral therapy (CBT)", "1", "CBT", None,
             "obo:MONDO_0000001"),
        ],
    )
    medications = _frame(
        ["index", "medication", "indices_medication", "aliases",
         "equivalentClasses"],
        [
            ("1", "SSRI", None, None, None),
            ("2", "fluoxetine / Prozac", "1", "Prozac", "obo:CHEBI_5118"),
        ],
    )
    project_types = _frame(
        ["index", "project_type", "definition", "aliases",
         "equivalentClasses", "indices_project_type"],
        [
            ("1", "mobile app", "software for phones", "app", None, None),
            ("2", "wearable study", None, None, None, "1"),
        ],
    )
    projects = _frame(
        ["index", "project", "description", "link", "indices_project_type",
         "indices_group", "indices_sensor", "indices_reference"],
        [
            ("1", "MoodTracker 3000", "tracks mood\ndaily",
             "https://mood.example.org", "1", "1,2", None, "1"),
            ("2", "Calm Watch", None, None, "2", "3", None, None),
        ],
    )
    groups = _frame(
        ["index", "group", "organization", "link", "abbreviation", "member"],
        [
            ("1", "Digital Health Lab", "Example University",
             "https://dhl.example.org", "DHL", "Ada Lovelace"),
            ("2", "Open Minds Group", None, None, None, None),
            ("3", None, "Wellness Corp", None, "WC", "Grace Hopper"),
        ],
    )
    people = _frame(
        ["index", "person", "definition", "aliases", "equivalentClasses",
         "indices_person"],
        [
            ("1", "clinician", "licensed care provider", "doctor, therapist",
             None, None),
            ("2", "school counselor", None, None, None, "1"),
        ],
    )
    languages = _frame(
        ["index", "language", "indices_language", "equivalentClasses"],
        [
            ("1", "English", None, None),
            ("2", "Spanish / Castilian", "1", "obo:LANG_0000002"),
        ],
    )
    licenses = _frame(
        ["index", "license", "equivalentClasses", "indices_license"],
        [
            ("1", "CC BY 4.0", None, None),
            ("2", "CC BY-SA 4.0", None, "1"),
        ],
    )
    references = _frame(
        ["index", "title", "link", "entry_date", "authors", "year", "PubMedID"],
        [
            ("1", "DSM-5", "https://dsm.example.org ", None, "APA", "2013", None),
            ("2", "Wearables & mood: a review", None, "2021-07-08",
             "Chan A, Diaz B", "2021", "67890"),
        ],
    )
    # ontologies sheet: the prefix table the reference driver joins the
    # harvested header prefixes against (create_mhdb:370-388); not read
    # by ingest_resources itself, so it is invisible to the parity test
    # covers every prefix the six workbook plans emit (IRIs follow the
    # reference's own header table, write_rdf.py:306-318, plus the
    # public ontology IRIs for the sensor/unit vocabularies)
    ontologies = _frame(
        ["index", "prefix", "iri", "import"],
        [
            ("1", "obo", "http://purl.obolibrary.org/obo/", None),
            ("2", "sio", "http://semanticscience.org/resource/", None),
            ("3", "qudt", "http://qudt.org/schema/qudt#", None),
            ("4", "unused", "http://example.org/never-used#", None),
            ("5", "ssn", "http://www.w3.org/ns/ssn/", None),
            ("6", "m3-lite", "http://purl.org/iot/vocab/m3-lite#", None),
            ("7", "schema", "http://schema.org/", None),
            (
                "8",
                "ICD10CM",
                "http://purl.bioontology.org/ontology/ICD10CM/",
                None,
            ),
            (
                "9",
                "ICD9CM",
                "http://purl.bioontology.org/ontology/ICD9CM/",
                None,
            ),
            ("10", "fabio", "http://purl.org/spar/fabio", None),
            (
                "11",
                "mhdb-resources",
                "http://www.purl.org/mentalhealth/resources#",
                None,
            ),
        ],
    )
    return {
        "Classes": _classes_frame(),
        "Properties": _properties_frame(),
        "ontologies": ontologies,
        "guide_types": guide_types,
        "guides": guides,
        "treatments": treatments,
        "medications": medications,
        "project_types": project_types,
        "projects": projects,
        "groups": groups,
        "references": references,
        "people": people,
        "languages": languages,
        "licenses": licenses,
    }


def assessments_frames() -> dict[str, pd.DataFrame]:
    """assessments workbook (ingest.py:1834-2703 sheet shapes).

    Questions are contiguous per questionnaire (the W1 numbering
    contract); response options exercise both tokenizers (plain commas
    and the quoted ``N="..."`` form) plus the dash-strip/newline
    normalization.  ``task_assertions_indices`` avoids ASSERTS rows (the
    reference's stale-predicate bug path — see plans/assessments
    docstring) and includes an unresolvable endNode and an unmapped
    reln_type as negative cases.
    """
    questionnaires = _frame(
        ["index", "title", "abbreviation", "description", "link", "authors",
         "year", "use_with_assessments", "number_of_questions",
         "minutes_to_complete", "age_min", "age_max", "indices_respondent",
         "indices_subject", "indices_reference", "index_license",
         "indices_language"],
        [
            ("1", "Mood Survey", "MS", "measures  mood",
             "https://ms.example.org ", "Smith J", "2010", None, "2", "5",
             "8", "99", None, None, None, None, None),
            ("2", "Energy Scale", None, None, None, None, None, "1", "2",
             None, None, None, None, None, None, None, None),
        ],
    )
    questions = _frame(
        ["index", "index_questionnaire", "question",
         "paper_instructions_preamble", "paper_instructions",
         "digital_instructions_preamble", "digital_instructions",
         "response_options", "indices_response_type"],
        [
            ("1", "1", "How often do you feel sad?",
             "Read each item", "Circle one option",
             "Read each item", "Select one option",
             '0=Never, 1=Sometimes, 2="Often, very often", 3=Always', "1"),
            ("2", "1", "I have trouble sleeping ", None, None, None, None,
             "1=Yes, 0=No", "1,2"),
            ("3", "2", "Rate your energy / vigor", None, None,
             "Answer honestly", None, "0=Mid,\n1=High---", None),
            ("4", "2", "Do you exercise?", None, None, None, None, None, "2"),
        ],
    )
    response_types = _frame(
        ["index", "response_type", "definition", "equivalentClasses"],
        [
            ("1", "frequency rating", "how often", None),
            ("2", "yes/no answer", None, "obo:OBI_0000001"),
        ],
    )
    tasks = _frame(
        ["index", "name", "description", "aliases", "cogatlas_node_id"],
        [
            ("1", "stroop task", "color-word interference", "Stroop, color naming", "101"),
            ("2", "n-back task", None, None, "102"),
        ],
    )
    task_implementations = _frame(
        ["index", "implementation", "description", "link", "indices_task",
         "indices_project", "cogatlas_node_id"],
        [
            ("1", "web stroop v2", "browser version",
             "https://stroop.example.org", "1", "1,2", "201"),
        ],
    )
    task_conditions = _frame(
        ["index", "condition", "description", "cogatlas_node_id"],
        [("1", "congruent trials", "matching ink/word", "401")],
    )
    task_contrasts = _frame(
        ["index", "contrast", "cogatlas_node_id"],
        [("1", "incongruent - congruent", "501")],
    )
    task_indicators = _frame(
        ["index", "indicator", "cogatlas_node_id"],
        [("1", "reaction time (ms)", "301")],
    )
    task_assertions_indices = _frame(
        ["cogatlas_reln_type", "cogatlas_startNode", "cogatlas_endNode"],
        [
            ("KINDOF", "101", "102"),
            ("HASIMPLEMENTATION", "101", "201"),
            ("HASCONDITION", "101", "401"),
            ("HASCONTRAST", "401", "501"),
            ("HASINDICATOR", "102", "301"),
            ("MEASUREDBY", "102", "301"),
            ("HASCITATION", "101", "999"),   # unresolvable endNode
            ("HASDIFFERENCE", "101", "102"),  # unmapped reln_type
        ],
    )
    references = _frame(
        ["index", "title", "link", "entry_date", "authors", "pubdate",
         "PubMedID"],
        [
            ("1", "Assessment handbook", "https://handbook.example.org ",
             "2021-01-15", "Chan A", "2015-05-01", "424242"),
        ],
    )
    return {
        "Classes": _classes_frame(),
        "Properties": _properties_frame(),
        "questionnaires": questionnaires,
        "questions": questions,
        "response_types": response_types,
        "tasks": tasks,
        "task_implementations": task_implementations,
        "task_indicators": task_indicators,
        "task_conditions": task_conditions,
        "task_contrasts": task_contrasts,
        "task_assertions_indices": task_assertions_indices,
        # resources_xls side input: ingest_assessments only reads
        # projects["index"/"project"] (ingest.py:2416-2420)
        "projects": resources_frames()["projects"],
        "references": references,
    }


def spark_tables(
    spark: SparkSession, frames: dict[str, pd.DataFrame]
) -> dict:
    """pandas frames -> Spark DataFrames with a stable ``row_id``.

    All columns string-typed (spreadsheet cells); explicit schema because
    all-``None`` columns defeat type inference.
    """
    out = {}
    for name, pdf in frames.items():
        pdf = pdf.copy()
        pdf["row_id"] = range(len(pdf))
        schema = T.StructType(
            [
                T.StructField(
                    c, T.LongType() if _is_int_col(c) else T.StringType()
                )
                for c in pdf.columns
            ]
        )
        out[name] = spark.createDataFrame(pdf, schema=schema)
    return out
