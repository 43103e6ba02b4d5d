"""Partition-level incremental resume (north rule: per-partition
lineage; completed crawl batches are never recomputed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.web.materialize import StagedPipeline
from mhdb_tables2turtles_spark.web.mentions import scan_mentions
from mhdb_tables2turtles_spark.web.pipeline import build_corpus


def _with_batches(pages):
    # crawl-batch id derived from the page id embedded in the url
    return pages.withColumn(
        "batch", F.pmod(F.xxhash64("url"), F.lit(4))
    )


def test_incremental_stage_skips_done_batches(spark, tmp_path):
    pages = _with_batches(build_corpus(spark, 40, seed=13, partitions=4)).cache()
    surfaces = ("music", "chills", "study")

    def mention_fn(batch_pages):
        m = scan_mentions(batch_pages.select("url", "text"), surfaces)
        return m.join(batch_pages.select("url", "batch"), "url")

    wd = str(tmp_path / "inc")
    # run 1: only batches 0 and 1 have "arrived" (or the job died after
    # committing them)
    p1 = StagedPipeline(spark, wd)
    p1.incremental_stage(
        "mentions", pages.filter(F.col("batch") < 2), "batch", mention_fn
    )
    assert p1.manifest("mentions")["done_partitions"] == [0, 1]

    # run 2: full input; only batches 2 and 3 are computed
    p2 = StagedPipeline(spark, wd)
    out = p2.incremental_stage("mentions", pages, "batch", mention_fn)
    assert p2.log == ["compute:mentions:[2, 3]"]
    assert p2.manifest("mentions")["done_partitions"] == [0, 1, 2, 3]

    # run 3: nothing to do
    p3 = StagedPipeline(spark, wd)
    out3 = p3.incremental_stage("mentions", pages, "batch", mention_fn)
    assert p3.log == ["resume:mentions"]

    # result identical to a from-scratch single pass
    scratch = mention_fn(pages)
    a = sorted((r.url, r.surface, r.start) for r in out3.collect())
    b = sorted((r.url, r.surface, r.start) for r in scratch.collect())
    assert a == b


def test_incremental_stage_rewrite_is_idempotent(spark, tmp_path):
    """A batch interrupted before its manifest update is re-overwritten
    (dynamic partition overwrite), not duplicated."""
    pages = _with_batches(build_corpus(spark, 20, seed=14, partitions=2)).cache()
    surfaces = ("music",)

    def fn(batch_pages):
        m = scan_mentions(batch_pages.select("url", "text"), surfaces)
        return m.join(batch_pages.select("url", "batch"), "url")

    wd = str(tmp_path / "inc2")
    p1 = StagedPipeline(spark, wd)
    p1.incremental_stage("m", pages, "batch", fn)
    n = spark.read.parquet(f"{wd}/m").count()

    # simulate "data written but manifest lost for batch 3": shrink the
    # manifest, rerun — batch 3 is overwritten in place, count unchanged
    import json, os

    man_path = os.path.join(wd, "m", "_STAGE_MANIFEST.json")
    man = json.load(open(man_path))
    man["done_partitions"] = [p for p in man["done_partitions"] if p != 3]
    json.dump(man, open(man_path, "w"))

    p2 = StagedPipeline(spark, wd)
    out = p2.incremental_stage("m", pages, "batch", fn)
    assert out.count() == n
    assert p2.manifest("m")["done_partitions"] == [0, 1, 2, 3]
