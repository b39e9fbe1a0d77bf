"""Checkpoint-resumable staged pipelines with per-partition lineage
manifests (north rule: "resumable from checkpoint with per-partition
lineage + metrics ... a killed run restarts from the last committed snapshot
without recomputing completed tiles").

Each stage materializes to a snapshot directory:

    <workdir>/<stage>/data/          parquet (the snapshot; on a cluster
                                     this is `df.writeTo(iceberg_table)` —
                                     no Iceberg jar in this sandbox, so a
                                     parquet dir + atomic manifest commit is
                                     the stand-in with the same protocol)
    <workdir>/<stage>/MANIFEST.json  commit record: stage fingerprint,
                                     input manifest hashes, row count,
                                     per-partition lineage (partition id ->
                                     rows), wall time, schema

Commit protocol: data is written first, the manifest last via
write-temp-then-rename (atomic on POSIX); a stage directory without a
manifest is an uncommitted snapshot and is recomputed. `Pipeline.run`
skips any stage whose manifest exists AND whose fingerprint (stage version +
params + input manifest hashes) matches — so a killed run resumes after the
last committed stage, and changing an upstream stage invalidates everything
downstream (lineage-correct resume, not just "file exists").
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Stage:
    name: str
    fn: Callable[..., DataFrame]      # (spark, **input_dfs) -> DataFrame
    inputs: list = field(default_factory=list)  # upstream stage names
    params: dict = field(default_factory=dict)  # fingerprinted
    version: str = "1"                # bump to force recompute


def _fingerprint(stage: Stage, input_hashes: dict[str, str]) -> str:
    blob = json.dumps({"name": stage.name, "version": stage.version,
                       "params": stage.params,
                       "inputs": input_hashes}, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


class Pipeline:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "MANIFEST.json")

    def read_manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def read_stage(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._dir(name), "data"))

    # -- execution ----------------------------------------------------------
    def run(self, stages: list[Stage], force: bool = False) -> dict:
        """Execute stages in order; returns {stage: 'computed'|'skipped'}."""
        status: dict[str, str] = {}
        hashes: dict[str, str] = {}
        for st in stages:
            input_hashes = {i: hashes[i] for i in st.inputs}
            fp = _fingerprint(st, input_hashes)
            man = self.read_manifest(st.name)
            if man is not None and man["fingerprint"] == fp and not force:
                status[st.name] = "skipped"
                hashes[st.name] = man["manifest_hash"]
                continue
            # (re)compute
            sdir = self._dir(st.name)
            if os.path.exists(sdir):
                shutil.rmtree(sdir)
            os.makedirs(sdir)
            t0 = time.time()
            dfs = {i: self.read_stage(i) for i in st.inputs}
            df = st.fn(self.spark, **dfs)
            data_dir = os.path.join(sdir, "data")
            # per-partition lineage: rows per output partition id
            tagged = df.withColumn("_part", F.spark_partition_id())
            tagged.write.mode("overwrite").parquet(data_dir)
            written = self.spark.read.parquet(data_dir)
            part_rows = {str(r["_part"]): r["n"] for r in
                         written.groupBy("_part")
                         .agg(F.count("*").alias("n")).collect()}
            n_rows = sum(part_rows.values())
            manifest = {
                "stage": st.name,
                "fingerprint": fp,
                "inputs": input_hashes,
                "rows": n_rows,
                "partitions": part_rows,
                "schema": written.drop("_part").schema.simpleString(),
                "bytes": sum(
                    os.path.getsize(os.path.join(data_dir, f))
                    for f in os.listdir(data_dir)
                    if f.endswith(".parquet")),
                "wall_sec": round(time.time() - t0, 3),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime()),
            }
            manifest["manifest_hash"] = hashlib.sha256(
                json.dumps(manifest, sort_keys=True).encode()).hexdigest()[:16]
            tmp = self._manifest_path(st.name) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.replace(tmp, self._manifest_path(st.name))  # atomic commit
            status[st.name] = "computed"
            hashes[st.name] = manifest["manifest_hash"]
        return status

    def read_output(self, name: str) -> DataFrame:
        return self.read_stage(name).drop("_part")
