"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same sf0.01 parquet tables,
then compares row count, column-name set, and a value hash computed the
way the driver does (columns sorted by name, rows sorted, values
stringified).  Prints one JSON line per query and a final summary.

Usage: python scripts/correctness_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    """Normalize a cell value for hashing across engines.

    STRICT: floats compare by exact ``repr`` (shortest round-trip text of
    the binary double) with NO significant-digit collapsing, mirroring the
    driver's value-hash.  Queries in this repo are required to emit
    engine-exact values (integer fixed-point ratios, epoch-microsecond
    longs); the gate's job is to fail when they don't, exactly like the
    driver does — round-2's ``.9g`` collapsing hid 4 driver failures.
    """
    import numpy as np

    if v is None:
        return "\0"
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "nan"
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-gate")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec = {"q": name}
        try:
            sdf = fn(spark, sf_dir)
            # Fetch BOTH sides through pandas, like the driver: this is
            # what exposes engine-side dtype divergence (e.g. a bare
            # DuckDB integer sum() is HUGEINT, which pandas renders as
            # float64 — "3.0" vs Spark's "3"; .collect()/fetchall() hid
            # exactly that in round 2).
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
            scols = list(spdf.columns)
            rec["spark_rows"] = len(srows)
            sql = oracles.get(name)
            if sql is None:
                rec["status"] = "no_oracle"
                print(json.dumps(rec), flush=True)
                continue
            opdf = con.execute(sql).df()
            ocols = list(opdf.columns)
            orows = [tuple(r) for r in opdf.itertuples(index=False, name=None)]
            rec["oracle_rows"] = len(orows)
            rec["rows_match"] = len(srows) == len(orows)
            rec["schema_match"] = sorted(scols) == sorted(ocols)
            if rec["rows_match"] and rec["schema_match"]:
                a, b = canon(srows, scols), canon(orows, ocols)
                rec["hash_match"] = a == b
                if not rec["hash_match"]:
                    for i, (x, y) in enumerate(zip(a, b)):
                        if x != y:
                            rec["first_diff"] = {"i": i, "spark": x[:6], "oracle": y[:6]}
                            break
            else:
                rec["hash_match"] = False
                rec["spark_cols"] = sorted(scols)
                rec["oracle_cols"] = sorted(ocols)
            rec["status"] = "pass" if rec["hash_match"] else "FAIL"
        except Exception as exc:  # noqa: BLE001
            rec["status"] = "ERROR"
            rec["err"] = str(exc)[:300]
        if rec["status"] in ("FAIL", "ERROR"):
            bad.append(name)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"summary": "done", "bad": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
