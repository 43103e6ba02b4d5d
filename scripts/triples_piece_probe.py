#!/usr/bin/env python3
"""Piecewise timing of the triples stage sub-plans at one core count.

Usage: python scripts/triples_piece_probe.py <cpus> <linked_path>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.functions import udfs
from mhdb_tables2turtles_spark.web.mentions import page_entity_triples


def main() -> None:
    cpus = int(sys.argv[1])
    linked_path = sys.argv[2]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    linked = spark.read.parquet(linked_path)
    timings = {}

    t = time.time()
    n = linked.count()
    timings["scan_count"] = round(time.time() - t, 2)

    t = time.time()
    pairs = linked.select("url", "entity_iri").distinct()
    timings["pairs_distinct_rows"] = pairs.count()
    timings["pairs_distinct"] = round(time.time() - t, 2)

    t = time.time()
    pp = (
        linked.select("url")
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism, F.col("url"))
        .select(F.col("url"), udfs.iri(F.col("url")).alias("subject"))
    )
    timings["per_page_rows"] = pp.count()
    timings["per_page"] = round(time.time() - t, 2)

    out = tempfile.mkdtemp(prefix=f"piece_{cpus}_", dir="/dev/shm")
    t = time.time()
    page_entity_triples(linked).write.mode("overwrite").parquet(out)
    timings["full_stage"] = round(time.time() - t, 2)
    shutil.rmtree(out, ignore_errors=True)

    out = tempfile.mkdtemp(prefix=f"piecep_{cpus}_", dir="/dev/shm")
    t = time.time()
    pairs.write.mode("overwrite").parquet(out)
    timings["pairs_write"] = round(time.time() - t, 2)
    shutil.rmtree(out, ignore_errors=True)

    timings["cpus"] = cpus
    timings["rows"] = n
    print("PIECES " + json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
