"""Visibility expression evaluation + pushdown-shaped row filtering."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.functions import visibility as vis


@pytest.mark.parametrize(
    "expr,auths,want",
    [
        ("a", {"a"}, True),
        ("a", {"b"}, False),
        ("a&b", {"a", "b"}, True),
        ("a&b", {"a"}, False),
        ("a|b", {"b"}, True),
        ("(a|b)&c", {"b", "c"}, True),
        ("(a|b)&c", {"a"}, False),
        ("a&(b|(c&d))", {"a", "c", "d"}, True),
        ("", {"x"}, True),
        ("  ", set(), True),
    ],
)
def test_expression_evaluation(expr, auths, want):
    assert vis.evaluate_expression(expr, auths) is want


def test_malformed_expressions_raise():
    for bad in ["a&", "(a", "a b", "&a", "a))"]:
        with pytest.raises(ValueError):
            vis.evaluate_expression(bad, {"a", "b"})


def test_visibility_filter_rows(spark):
    rows = [
        (1, "public"),
        (2, "secret"),
        (3, "public&internal"),
        (4, "secret|public"),
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id int, visibility string")
    got = sorted(r["id"] for r in vis.visibility_filter(df, {"public"}).collect())
    assert got == [1, 4, 5, 6]
    got2 = sorted(r["id"] for r in vis.visibility_filter(df, {"public", "internal"}).collect())
    assert got2 == [1, 3, 4, 5, 6]
    got3 = sorted(r["id"] for r in vis.visibility_filter(df, set()).collect())
    assert got3 == [5, 6]


def test_pathological_cardinality_guard(spark, monkeypatch):
    """r4 verdict ask #8: an unbounded label column (e.g. free text routed
    into vis_col by mistake) must raise instead of collecting the whole
    distinct set driver-side.  Bound lowered via monkeypatch so the test
    stays cheap."""
    monkeypatch.setattr(vis, "MAX_DISTINCT_EXPRESSIONS", 50)
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("label"), F.col("id")).alias("visibility"),
    )
    with pytest.raises(ValueError, match="distinct expressions"):
        vis.visibility_filter(df, {"label1"})
