#!/usr/bin/env python3
"""Targeted probe: why does the `triples` stage scale poorly 2->8 cores?

Materializes the pipeline through `linked` once, then times ONLY
page_entity_triples + parquet write at several core counts, with
spark.local.dir on disk (/tmp, the default) vs tmpfs (/dev/shm), to
separate CPU scaling from shuffle-disk saturation.

Usage: python scripts/triples_stage_probe.py [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prepare(n_pages: int, base: str) -> str:
    sys.path.insert(0, REPO)
    from bench import build_spark
    from mhdb_tables2turtles_spark.web.pipeline import KGPipeline, build_corpus

    spark = build_spark(8)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = os.path.join(base, "corpus")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        build_corpus(spark, n_pages, seed=42, partitions=128).write.mode(
            "overwrite"
        ).parquet(corpus)
    workdir = os.path.join(base, "stages")
    pipe = KGPipeline(spark, workdir)
    pages = spark.read.parquet(corpus)
    staged = pipe.staged
    from pyspark.sql import functions as F

    from mhdb_tables2turtles_spark.web.extract import extract_text_col
    from mhdb_tables2turtles_spark.web.linking import link_mentions
    from mhdb_tables2turtles_spark.web.mentions import scan_mentions

    extracted = staged.stage(
        "extract",
        lambda: pages.select(
            "url", "warc_ts", "lang", extract_text_col(F.col("html")).alias("text")
        ),
    )
    mentions = staged.stage(
        "mentions", lambda: scan_mentions(extracted, pipe.surfaces), upstream=("extract",)
    )
    staged.stage(
        "linked",
        lambda: link_mentions(mentions, pipe.vocab, extracted, pipe.profiles),
        upstream=("mentions", "extract"),
    )
    spark.stop()
    return os.path.join(workdir, "linked")


def time_stage(cpus: int, linked_path: str, localdir: str) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    from mhdb_tables2turtles_spark.web.mentions import page_entity_triples

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.local.dir", localdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    linked = spark.read.parquet(linked_path)
    out = tempfile.mkdtemp(prefix=f"probe_{cpus}_", dir="/dev/shm")
    t0 = time.time()
    page_entity_triples(linked).write.mode("overwrite").parquet(out)
    elapsed = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return {"cpus": cpus, "localdir": localdir, "sec": round(elapsed, 2)}


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 150000
    if len(sys.argv) > 2 and sys.argv[2] == "--prep":
        print("LINKED " + prepare(n_pages, sys.argv[3]))
        return
    if len(sys.argv) > 2 and sys.argv[2] == "--time":
        print("RESULT " + json.dumps(time_stage(int(sys.argv[3]), sys.argv[4], sys.argv[5])))
        return

    base = tempfile.mkdtemp(prefix="probe_base_", dir="/dev/shm")
    try:
        proc = subprocess.run(
            [sys.executable, __file__, str(n_pages), "--prep", base],
            capture_output=True, text=True, cwd=REPO, timeout=2000,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("LINKED ")]
        if not lines:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-3000:])
            raise SystemExit("prep failed")
        linked = lines[-1][len("LINKED "):]
        disk_tmp = tempfile.mkdtemp(prefix="probe_localdir_")  # /tmp = disk
        results = []
        for rep in range(2):
            for cpus in (2, 8):
                for localdir in (disk_tmp,):
                    p = subprocess.run(
                        [sys.executable, __file__, str(n_pages), "--time",
                         str(cpus), linked, localdir],
                        capture_output=True, text=True, cwd=REPO, timeout=1500,
                    )
                    rl = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
                    if rl:
                        r = json.loads(rl[-1][len("RESULT "):])
                        r["rep"] = rep
                        results.append(r)
                        print(json.dumps(r), flush=True)
                    else:
                        sys.stderr.write(p.stdout[-1000:] + p.stderr[-2000:])
        shutil.rmtree(disk_tmp, ignore_errors=True)
        print("SUMMARY " + json.dumps(results))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
