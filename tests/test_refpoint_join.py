"""Reference-point (PBSM) dedup-free shuffle joins.

The BIG×BIG shuffle joins emit every intersecting pair EXACTLY ONCE —
meet-tier restriction + the Patel/DeWitt reference-point test — so the
physical plan carries NO pair-level dropDuplicates exchange.  At 10^8+
output pairs that distinct was the dominant shuffle (496M-row exchange at
sf1); these tests pin both the exactness and the plan shape.
"""

from __future__ import annotations

import os
import random
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import spatial_join as sj


def _boxes(n: int, seed: int) -> list[tuple]:
    """Random boxes incl. degenerate, seam-touching, and cell-aligned."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        x0 = rng.uniform(-180, 179)
        y0 = rng.uniform(-90, 89)
        w = rng.choice([0.0, 0.001, 0.5, 3.0, 20.0, 361.0])
        h = rng.choice([0.0, 0.002, 0.3, 1.5, 10.0, 181.0])
        out.append((i, x0, y0, min(x0 + w, 180.0), min(y0 + h, 90.0)))
    out.append((n, -180.0, -90.0, 180.0, 90.0))     # whole world
    out.append((n + 1, 180.0, 90.0, 180.0, 90.0))   # degenerate seam corner
    out.append((n + 2, 0.0, 0.0, 0.0, 0.0))         # degenerate origin
    out.append((n + 3, -5.625, -5.625, 5.625, 5.625))  # exactly cell-aligned
    out.append((n + 4, -180.0, -90.0, -180.0, -90.0))
    out.append((n + 5, 178.0, 88.0, 180.0, 90.0))
    return out


SCHEMA_L = "left_id long, x0 double, y0 double, x1 double, y1 double"
SCHEMA_R = "right_id long, x0 double, y0 double, x1 double, y1 double"


@pytest.mark.parametrize("seed", [1, 44])
def test_shuffle_extent_join_exactly_once_vs_brute(spark, seed):
    L, R = _boxes(250, seed), _boxes(250, seed + 1000)
    ldf = spark.createDataFrame(L, SCHEMA_L)
    rdf = spark.createDataFrame(R, SCHEMA_R)
    got = [tuple(r) for r in sj.tiered_extent_join_shuffle(ldf, rdf).collect()]
    exp = sorted(
        (l[0], r[0])
        for l in L
        for r in R
        if l[1] <= r[3] and l[3] >= r[1] and l[2] <= r[4] and l[4] >= r[2]
    )
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert sorted(got) == exp


def test_shuffle_extent_join_plan_has_no_pair_distinct(spark):
    ldf = spark.createDataFrame(_boxes(50, 3), SCHEMA_L)
    rdf = spark.createDataFrame(_boxes(50, 4), SCHEMA_R)
    plan = sj.tiered_extent_join_shuffle(ldf, rdf)._jdf.queryExecution().executedPlan().toString()
    # exactly-once emission: no aggregate (distinct) anywhere above the join
    assert "HashAggregate" not in plan
    assert "Deduplicate" not in plan


def test_geometry_join_shuffle_plan_no_pair_distinct_when_unsplit(spark):
    """No antimeridian-crossing envelopes → candidate pairs unique by
    construction; the narrow path must not re-shuffle them for dedup."""
    import pandas as pd

    left = spark.createDataFrame(pd.DataFrame({
        "left_id": range(40),
        "wkt": [f"POLYGON (({i} 0, {i + 2} 0, {i + 2} 2, {i} 2, {i} 0))" for i in range(40)],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "right_id": range(40),
        "wkt": [f"POLYGON (({i + 1} 1, {i + 3} 1, {i + 3} 3, {i + 1} 3, {i + 1} 1))" for i in range(40)],
    }))
    out = sj.geometry_join_shuffle(left, right)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Deduplicate" not in plan
    got = [tuple(r) for r in out.collect()]
    assert len(got) == len(set(got))
    exp = sorted(
        (i, j) for i in range(40) for j in range(40)
        if i <= j + 3 and i + 2 >= j + 1  # x-overlap (y always overlaps)
    )
    assert sorted(got) == exp


def test_geometry_join_shuffle_antimeridian_still_exact(spark):
    """Split envelopes (x1 > 180 convention) keep the dedup guard and stay
    exact: an unwrapped right polygon must match points on both sides of
    the seam exactly once."""
    import pandas as pd

    left = spark.createDataFrame(pd.DataFrame({
        "left_id": [0, 1, 2],
        "wkt": ["POINT (179.5 0.5)", "POINT (-179.5 0.5)", "POINT (0 0.5)"],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "right_id": [0],
        "wkt": ["POLYGON ((179 0, 181 0, 181 1, 179 1, 179 0))"],
    }))
    got = sorted(map(tuple, sj.geometry_join_shuffle(left, right).collect()))
    assert got == [(0, 0), (1, 0)]
