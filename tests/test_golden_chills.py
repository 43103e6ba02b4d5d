"""End-to-end golden equivalence: the engine must reproduce the reference's
emitted triple set (P/R >= 0.95 per BASELINE.json; we target ~1.0).

The reference ships no input spreadsheets, so the committed artifact
/root/reference/output/chills.ttl is the oracle: we reverse-engineer the
workbook from it (sources/golden.py), run the Spark pipeline, and compare
triple sets.
"""

import pandas as pd
import pytest

from mhdb_tables2turtles_spark.operators.triples import (
    dedup_triples,
    filter_valid,
)
from mhdb_tables2turtles_spark.plans.chills import CHILLS_SPECS
from mhdb_tables2turtles_spark.plans.sheetspec import workbook_triples
from mhdb_tables2turtles_spark.sources.golden import (
    load_golden_triples,
    reverse_fixture,
)

GOLDEN = "/root/reference/output/chills.ttl"


@pytest.fixture(scope="module")
def golden_triples():
    return load_golden_triples(GOLDEN)


@pytest.fixture(scope="module")
def workbook(spark, golden_triples):
    frames = reverse_fixture(golden_triples)
    tables = {}
    for name, pdf in frames.items():
        pdf = pdf.copy()
        for c in pdf.columns:
            if c in ("index", "row_id"):
                pdf[c] = pd.to_numeric(pdf[c]).astype("int64")
            else:
                pdf[c] = pdf[c].astype(object).where(pdf[c].notna(), None)
                pdf[c] = pdf[c].map(
                    lambda v: None if v is None else str(v)
                )
        tables[name] = spark.createDataFrame(pdf)
    return tables


def test_golden_parse_sanity(golden_triples):
    # ~1,762 (p,o) pairs over ~410 subjects counted in the golden file
    assert len(golden_triples) > 1600
    assert len({s for s, _, _ in golden_triples}) > 380


def test_golden_triple_equivalence(spark, workbook, golden_triples):
    triples = dedup_triples(
        filter_valid(workbook_triples(workbook, CHILLS_SPECS))
    )
    ours = {
        (r.subject, r.predicate, r.object)
        for r in triples.select("subject", "predicate", "object").collect()
    }
    tp = len(ours & golden_triples)
    precision = tp / len(ours)
    recall = tp / len(golden_triples)
    missing = sorted(golden_triples - ours)[:15]
    extra = sorted(ours - golden_triples)[:15]
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.4f} R={recall:.4f}\n"
        f"missing={missing}\nextra={extra}"
    )
    # exact reproduction, including the golden file's dangling
    # :Chill-InducingMusicMayPromoteAltruisticBeh hasClaim object (a
    # leading-space cell truncated unstripped on the paper side,
    # ingest.py:3333-3338, but stripped on the Claim-node side,
    # ingest.py:3751-3752 — recovered by the reverse fixture)
    assert ours == golden_triples, (
        f"P={precision:.4f} R={recall:.4f}\n"
        f"missing={missing}\nextra={extra}"
    )
