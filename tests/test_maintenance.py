"""Store maintenance (append + compaction) over the cell-indexed layout.

The LSM analog of the reference's KV-backend tablet compaction
(BaseDataStore continuous-ingest paths): appended sorted runs must be
immediately queryable, compaction must be result-invariant and reduce the
live file count, and the manifest swap must be the atomic commit point."""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.sources import indexed, maintenance as mt

BBOX = (-30.0, 10.0, 45.0, 55.0)


def _batch(spark, seed: int, n: int = 4000):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "event_id": [f"s{seed}:{i}" for i in range(n)],
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-90, 90, n),
            "value": rng.integers(0, 1000, n),
        }
    )
    return spark.createDataFrame(pdf)


def _ids(df):
    return sorted(r["event_id"] for r in df.select("event_id").collect())


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store") / "events_store")
    m0 = mt.write_store(_batch(spark, 0), root, n_files=8, phash_col=None)
    assert m0["generation"] == 0 and m0["deltas"] == []
    for seed in (1, 2, 3):
        mt.append_store(_batch(spark, seed), root, n_files=4)
    return root


def test_append_runs_visible_and_lookup_matches_oneshot(spark, store, tmp_path):
    # union of the four batches written one-shot = ground truth
    full = _batch(spark, 0)
    for seed in (1, 2, 3):
        full = full.unionByName(_batch(spark, seed))
    oneshot = str(tmp_path / "oneshot")
    indexed.write_indexed(full, oneshot, n_files=8, phash_col=None)
    want = _ids(indexed.range_lookup_indexed(spark, oneshot, BBOX))

    m = mt._read_manifest(store)
    assert m["deltas"] == ["delta_00000", "delta_00001", "delta_00002"]
    assert mt.read_store(spark, store).count() == 16000
    got = _ids(mt.lookup_store(spark, store, BBOX))
    assert got == want and len(got) > 0


def test_each_run_is_sorted_and_pruned(spark, store):
    # every live run is individually cell-sorted -> min-max pruning per run
    for run in mt.live_runs(store):
        df = spark.read.parquet(os.path.join(store, run))
        rows = df.select("cell").collect()
        assert len(rows) > 0
        # within each parquet file the cell column is non-decreasing
        by_file = (
            df.withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                F.expr("collect_list(cell)").alias("cells"),
            )
            .collect()
        )
        for r in by_file:
            c = r["cells"]
            assert all(c[i] <= c[i + 1] for i in range(len(c) - 1))
    # the pushed predicate reaches the scan
    m = mt._read_manifest(store)
    pred, nr = indexed.cell_range_predicate(BBOX)
    plan = mt.read_store(spark, store).filter(pred)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "cell" in plan


def test_compaction_is_result_invariant_and_shrinks_files(spark, store):
    before = _ids(mt.lookup_store(spark, store, BBOX))
    files_before = len(mt.read_store(spark, store).inputFiles())
    runs_before = mt.live_runs(store)
    assert len(runs_before) == 4

    m = mt.compact_store(spark, store, n_files=8)
    assert m["generation"] == 1 and m["deltas"] == [] and m["base"] == "base_g1"
    after = _ids(mt.lookup_store(spark, store, BBOX))
    assert after == before
    files_after = len(mt.read_store(spark, store).inputFiles())
    assert files_after < files_before
    # vacuum is opt-in (r4 ADVICE): the swap leaves dead runs on disk for
    # in-flight readers; an explicit vacuum_store then removes them
    for r in runs_before:
        assert os.path.exists(os.path.join(store, r))
    assert sorted(mt.vacuum_store(store)) == sorted(runs_before)
    for r in runs_before:
        assert not os.path.exists(os.path.join(store, r))
    assert set(m["runs"]) == {"base_g1"}
    assert m["runs"]["base_g1"]["rows"] == 16000
    # appends keep working on the compacted store
    mt.append_store(_batch(spark, 9), store, n_files=4)
    assert mt.read_store(spark, store).count() == 20000
    m2 = mt._read_manifest(store)
    assert m2["deltas"] == ["delta_00003"]  # counter never reused


def test_compaction_stats_derived_not_rescanned(spark, store):
    # after the earlier compaction test, runs stats must be exact
    m = mt._read_manifest(store)
    total = sum(s["rows"] for s in m["runs"].values())
    assert total == mt.read_store(spark, store).count()


def test_crashed_compaction_retry_does_not_wedge(spark, tmp_path):
    root = str(tmp_path / "crash_store")
    mt.write_store(_batch(spark, 20, n=1000), root, n_files=2, phash_col=None)
    mt.append_store(_batch(spark, 21, n=1000), root, n_files=2)
    # simulate a crashed earlier attempt: orphan target dir exists on disk
    m = mt._read_manifest(root)
    orphan = os.path.join(root, f"base_g{m['generation'] + 1}")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "wb") as f:
        f.write(b"partial write")
    m2 = mt.compact_store(spark, root, n_files=2)
    assert m2["base"] == os.path.basename(orphan)
    assert mt.read_store(spark, root).count() == 2000
    # crashed APPEND retry: orphan delta under the next counter name
    orphan_d = os.path.join(root, f"delta_{m2['next_delta']:05d}")
    os.makedirs(orphan_d)
    mt.append_store(_batch(spark, 22, n=500), root, n_files=2)
    assert mt.read_store(spark, root).count() == 2500


def test_compaction_vacuum_false_keeps_old_runs_for_readers(spark, tmp_path):
    root = str(tmp_path / "reader_store")
    mt.write_store(_batch(spark, 30, n=1000), root, n_files=2, phash_col=None)
    mt.append_store(_batch(spark, 31, n=1000), root, n_files=2)
    # a reader plans against the pre-compaction manifest (lazy scan)
    old_reader = mt.read_store(spark, root)
    m = mt.compact_store(spark, root, n_files=2, vacuum=False)
    # the old runs are still on disk -> the in-flight plan completes
    assert old_reader.count() == 2000
    # new manifest sees only the new base; vacuum then removes dead runs
    assert mt.live_runs(root) == [m["base"]]
    removed = mt.vacuum_store(root)
    assert set(removed) == {"base_g0", "delta_00000"}
    assert mt.read_store(spark, root).count() == 2000


def test_manifest_is_valid_json_with_stats(store):
    with open(os.path.join(store, "_manifest.json")) as f:
        m = json.load(f)
    for run, st in m["runs"].items():
        assert st["rows"] > 0 and st["min_cell"] <= st["max_cell"]


def test_maybe_compact_policy(spark, tmp_path):
    root = str(tmp_path / "policy_store")
    mt.write_store(_batch(spark, 40, n=4000), root, n_files=2, phash_col=None)
    # small delta: neither trigger fires
    mt.append_store(_batch(spark, 41, n=100), root, n_files=1)
    assert mt.maybe_compact(spark, root, max_deltas=8, delta_fraction=0.5) is None
    # delta mass exceeds half the store -> size trigger fires
    mt.append_store(_batch(spark, 42, n=5000), root, n_files=2)
    m = mt.maybe_compact(spark, root, max_deltas=8, delta_fraction=0.5)
    assert m is not None and m["deltas"] == [] and m["runs"][m["base"]]["rows"] == 9100
    # count trigger: many tiny deltas
    for s in range(43, 47):
        mt.append_store(_batch(spark, s, n=10), root, n_files=1)
    assert mt.maybe_compact(spark, root, max_deltas=8) is None  # 4 <= 8
    m2 = mt.maybe_compact(spark, root, max_deltas=3)
    assert m2 is not None and m2["generation"] == m["generation"] + 1


def test_pushed_filters_survive_compaction(spark, tmp_path):
    """r4 verdict ask #6: after compact + vacuum the cell-range predicate
    must still reach the (new) base's parquet scan as PushedFilters."""
    root = str(tmp_path / "maint_push")
    mt.write_store(_batch(spark, 0), root, n_files=4)
    mt.append_store(_batch(spark, 1), root, n_files=2)
    before = _ids(mt.lookup_store(spark, root, BBOX))
    mt.compact_store(spark, root, n_files=4)
    mt.vacuum_store(root)
    assert _ids(mt.lookup_store(spark, root, BBOX)) == before
    pred, _ = indexed.cell_range_predicate(BBOX)
    plan = (
        mt.read_store(spark, root).filter(pred)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "cell" in plan
