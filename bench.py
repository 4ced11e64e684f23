#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "rows_per_sec": ...}

`python bench.py --scaling` additionally runs the spatial+tiling headline
set at local[8] and local[32] on the SAME input and reports throughput at
both plus scaling efficiency (the BASELINE.json two-cluster-size criterion,
evidenced by parallelism levels in this sandbox).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# the spatial-join + tiling headline (BASELINE.json metric) ...
HEADLINE = [
    "pip_join_tiered",
    "dwithin_join",
    "knn_join",
    "tile_assignment",
    "tile_counts_l8",
    "kde_l6",
    "range_query",
    "subsample_cells",
]
# ... plus the training-data-pipeline set
PIPELINE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simhash64",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "text_quality",
    "doc_fingerprint",
    "image_tile_counts",
]


def _sf_label(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return -1.0


def run_set(spark, names: list[str], sf_dir: str) -> dict[str, float]:
    from geowave_spark import entry_queries

    times: dict[str, float] = {}
    for name in names:
        t0 = time.monotonic()
        entry_queries.QUERIES[name](spark, sf_dir).count()
        times[name] = round(time.monotonic() - t0, 3)
    return times


def input_rows(spark, sf_dir: str) -> int:
    return spark.read.parquet(f"{sf_dir}/events.parquet").count()


def bench_once(cpus: int, names: list[str]) -> tuple[dict[str, float], float, int]:
    from geowave_spark.session import get_spark

    spark = get_spark(f"bench-{cpus}", cpus=cpus, shuffle_partitions=max(32, cpus))
    try:
        # warm the JVM + Python workers once (tiny query, not timed)
        spark.range(1000).selectExpr("sum(id)").collect()
        n_rows = input_rows(spark, SF_DIR)
        times = run_set(spark, names, SF_DIR)
        return times, sum(times.values()), n_rows
    finally:
        spark.stop()


def main() -> None:
    scaling = "--scaling" in sys.argv
    names = HEADLINE + PIPELINE
    times, total, n_rows = bench_once(CPUS, names)
    headline_sec = sum(times[n] for n in HEADLINE)
    out = {
        "metric": "spatial-join+tiling throughput (headline set, events table)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": _sf_label(SF_DIR),
        "cpus": CPUS,
        "input_rows": n_rows,
        "headline_sec": round(headline_sec, 3),
        "rows_per_sec": round(n_rows * len(HEADLINE) / headline_sec, 1),
    }
    if scaling:
        t8, tot8, _ = bench_once(8, HEADLINE)
        t32, tot32, _ = bench_once(32, HEADLINE)
        thr8 = n_rows * len(HEADLINE) / tot8
        thr32 = n_rows * len(HEADLINE) / tot32
        out["scaling"] = {
            "n_cpus": 8,
            "n4_cpus": 32,
            "sec_n": round(tot8, 3),
            "sec_4n": round(tot32, 3),
            "rows_per_sec_n": round(thr8, 1),
            "rows_per_sec_4n": round(thr32, 1),
            "efficiency": round(thr32 / (4.0 * thr8), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
