"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship tiered point-in-polygon join at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data-pipeline extensions, consolidated to exactly 50 entries
(near-duplicate operators merged via tag-column unions / wide joins) so the
driver's ~50-row correctness window covers every operator; ``oracle_sql()``
returns exactly-matching DuckDB SQL for ALL 50 (engineered for bit-exact
value parity — see geowave_spark/entry_queries.py; kmeans_hulls / sketch_stats
/ ann_ivf_pq joined the oracle set in r4 via deterministic SQL-derivable
state, and image_codec in r5 via the materialized engine-signature artifact
of sources/imgsig.py — the only self-certified surface left is raw codec
byte math, pinned by PSNR/roundtrip/fuzz tests).
Verified value-exact at sf0.001, sf0.01 and sf0.1
(tests/test_entry_parity.py), and fingerprint-exact at sf1 (all 50) and
sf10 (20-query linear-output subset) via scripts/verify_sf.py
(evidence/sf1_correctness.json, sf10_correctness.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geowave_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: tiered spatial join (events × polygon workload)."""
    return entry_queries.q_pip_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return entry_queries.build_oracles()
