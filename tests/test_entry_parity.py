"""Driver-style correctness gate: every queries() entry vs its DuckDB oracle.

Mimics the driver's compare: run the Spark query and the oracle SQL on the
same parquet tables, sort columns by name, sort rows, compare VALUES exactly
(our queries are engineered for exact integer/string outputs).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    df = q(spark, sf_dir)
    spark_rows = _norm([tuple(r) for r in df.collect()], df.columns)

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    cols = [d[0] for d in res.description]
    duck_rows = _norm(res.fetchall(), cols)

    assert sorted(c.lower() for c in df.columns) == sorted(c.lower() for c in cols), (
        f"{name}: column names differ: {sorted(df.columns)} vs {sorted(cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
