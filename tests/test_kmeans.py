"""KMeans + hulls: assignment coverage, determinism, hull containment."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import entry_queries as eq
from geowave_spark import geom
from geowave_spark.operators import kmeans


def test_kmeans_assigns_all_points_deterministically(spark, sf_dir):
    ev = eq._events(spark, sf_dir)
    a1 = kmeans.kmeans_clusters(ev, k=5)
    rows = a1.collect()
    assert len(rows) == ev.count()
    assert {r["cluster"] for r in rows} <= set(range(5))
    a2 = kmeans.kmeans_clusters(ev, k=5)
    assert sorted((r["event_id"], r["cluster"]) for r in a2.collect()) == sorted(
        (r["event_id"], r["cluster"]) for r in rows
    )


def test_cluster_hulls_contain_members(spark, sf_dir):
    ev = eq._events(spark, sf_dir).limit(300)
    assign = kmeans.kmeans_clusters(ev, k=4)
    hulls = {r["cluster"]: r for r in kmeans.cluster_hulls(assign).collect()}
    members = assign.collect()
    assert sum(h["n_points"] for h in hulls.values()) == len(members)
    for r in members:
        h = hulls[r["cluster"]]
        if h["hull_wkt"] == "POLYGON EMPTY":
            continue
        poly = geom.polygon_from_wkt(h["hull_wkt"])
        assert bool(
            poly.contains(np.array([r["lon"]]), np.array([r["lat"]]))[0]
        ), f"point outside its cluster hull: {r}"


def test_kmeans_with_time_dimension(spark, sf_dir):
    """ScaledTemporalRange analog: adding time changes clusterings but
    stays deterministic."""
    ev = eq._events(spark, sf_dir).limit(300)
    spatial = kmeans.kmeans_clusters(ev, k=4)
    st = kmeans.kmeans_clusters(ev, k=4, ts_col="ts", time_scale=5.0)
    assert st.count() == spatial.count()
    again = kmeans.kmeans_clusters(ev, k=4, ts_col="ts", time_scale=5.0)
    assert sorted(map(tuple, st.collect())) == sorted(map(tuple, again.collect()))
