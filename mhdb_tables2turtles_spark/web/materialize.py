"""Staged graph materialization: atomic per-stage commits, per-partition
lineage, counters, resume.

Iceberg-style semantics emulated on plain parquet (the sandbox has no
catalog service): a stage is *committed* only once its parquet write has
finished AND a ``_STAGE_MANIFEST.json`` (rows, per-partition lineage,
counters, upstream stages) lands next to it.  A killed job leaves either
nothing or an uncommitted directory — both of which :meth:`stage`
recomputes with ``mode=overwrite`` — so a restart resumes from the last
committed snapshot and never duplicates committed work (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

On a real cluster, swap ``_write_parquet``/``_read`` for
``writeTo(...).createOrReplace()`` on an Iceberg catalog; the manifest
maps onto Iceberg's own snapshot summary + a lineage table.

Counters use ``pyspark.sql.Observation`` (batch `observe`): row counts are
collected from the *same job* that writes the data — no second scan.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

__all__ = ["StagedPipeline"]

MANIFEST = "_STAGE_MANIFEST.json"
LINEAGE_COL = "__lineage_part"


class StagedPipeline:
    """Chain DataFrame stages with commit/resume per stage."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.log: list[str] = []

    def _path(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def is_committed(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), MANIFEST))

    def manifest(self, name: str) -> dict:
        with open(os.path.join(self._path(name), MANIFEST)) as f:
            return json.load(f)

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        upstream: tuple[str, ...] = (),
        partitions: int | None = None,
    ) -> DataFrame:
        """Return the stage's committed output, computing it only if no
        committed snapshot exists."""
        import time as _time

        path = self._path(name)
        if self.is_committed(name):
            self.log.append(f"resume:{name}")
            return self.spark.read.parquet(path).drop(LINEAGE_COL)

        self.log.append(f"compute:{name}")
        t0 = _time.time()
        df = build().withColumn(LINEAGE_COL, F.spark_partition_id())
        if partitions:
            df = df.repartition(partitions)
        obs = Observation(f"stage_{name}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        df.write.mode("overwrite").parquet(path)
        elapsed = round(_time.time() - t0, 2)

        # per-partition lineage: row counts per source partition, read
        # back from the committed files (parquet stats; single small scan
        # of one int column)
        lineage = {
            str(r[LINEAGE_COL]): r["n"]
            for r in self.spark.read.parquet(path)
            .groupBy(LINEAGE_COL)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        manifest = {
            "stage": name,
            "rows": obs.get["rows"],
            "elapsed_sec": elapsed,
            "upstream": list(upstream),
            "partitions": lineage,
            "n_partitions": len(lineage),
        }
        self.log.append(f"done:{name}:{elapsed}s")
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, path + "/" + MANIFEST)  # atomic commit point
        return self.spark.read.parquet(path).drop(LINEAGE_COL)

    def incremental_stage(
        self,
        name: str,
        inputs: DataFrame,
        partition_key: str,
        fn: Callable[[DataFrame], DataFrame],
    ) -> DataFrame:
        """Partition-level resume: apply ``fn`` only to input partitions
        (values of ``partition_key``, e.g. a crawl-batch id) that no
        committed manifest lists as done; append their output via
        dynamic partition overwrite (idempotent if a previous attempt
        died mid-write), then extend the manifest.

        This is the per-partition lineage protocol of the north rule:
        the manifest's ``done_partitions`` is the lineage set, the
        anti-join (here a NOT IN over the driver-known id list) skips
        completed work, and a partition interrupted before its manifest
        update is simply re-overwritten on the next run.
        """
        path = self._path(name)
        done: list = []
        if self.is_committed(name):
            done = self.manifest(name).get("done_partitions", [])
        todo_df = inputs
        if done:
            todo_df = inputs.filter(~F.col(partition_key).isin(done))
        todo = [
            r[0] for r in todo_df.select(partition_key).distinct().collect()
        ]
        if not todo:
            self.log.append(f"resume:{name}")
            return self.spark.read.parquet(path)

        self.log.append(f"compute:{name}:{sorted(todo)}")
        out = fn(todo_df)
        assert partition_key in out.columns, (
            f"incremental stage {name!r} output must carry {partition_key!r}"
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_key)
            .parquet(path)
        )
        manifest = {
            "stage": name,
            "incremental": True,
            "partition_key": partition_key,
            "done_partitions": sorted(done + todo, key=str),
        }
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(path, MANIFEST))
        return self.spark.read.parquet(path)

    def counters(self) -> dict[str, int]:
        """Committed row counts per stage."""
        out = {}
        for name in sorted(os.listdir(self.workdir)):
            if self.is_committed(name):
                out[name] = self.manifest(name)["rows"]
        return out
