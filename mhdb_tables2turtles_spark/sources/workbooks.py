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


# columns holding real ints (the reference equi-compares them against
# np.int() values, so string-typed cells would silently never match)
_INT_COLS = {"index", "row_id"}


def _frame(columns: list[str], rows: list[tuple]) -> pd.DataFrame:
    df = pd.DataFrame(rows, columns=columns).astype(object)
    df = df.where(pd.notna(df), None)
    for c in df.columns:
        if c in _INT_COLS:
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
                    c, T.LongType() if c in _INT_COLS else T.StringType()
                )
                for c in pdf.columns
            ]
        )
        out[name] = spark.createDataFrame(pdf, schema=schema)
    return out
