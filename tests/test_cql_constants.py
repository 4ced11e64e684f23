"""Single-sourced CQL constants (r4 verdict ask #3 / open ADVICE item).

q_st_range's cql/arith legs and the DuckDB oracle must interpolate the SAME
RANGE_BBOX / ST_CQL_WINDOW / ST_CQL_VALUE constants — these tests pin the
generated strings so a constant move cannot silently diverge the two sides.
"""

from __future__ import annotations

from geowave_spark import entry_queries as eq


def test_cql_text_embeds_shared_constants():
    txt = eq.st_range_cql_text()
    for v in eq.RANGE_BBOX:
        assert repr(v) in txt
    w0, w1 = eq.ST_CQL_WINDOW
    assert f"{w0}Z/{w1}Z" in txt
    v0, v1 = eq.ST_CQL_VALUE
    assert f"BETWEEN {v0} AND {v1}" in txt


def test_arith_text_embeds_shared_constants():
    txt = eq.st_range_arith_text()
    for v in eq.RANGE_BBOX:
        assert repr(v) in txt
    v0, v1 = eq.ST_CQL_VALUE
    assert f"BETWEEN {v0} AND min({v1}, 300)" in txt


def test_oracle_embeds_same_constants():
    sql = eq._oracle_st_range()
    for v in eq.RANGE_BBOX:
        assert f"CAST({v!r} AS DOUBLE)" in sql
    w0, w1 = eq.ST_CQL_WINDOW
    assert f"TIMESTAMP '{w0.replace('T', ' ')}'" in sql
    assert f"TIMESTAMP '{w1.replace('T', ' ')}'" in sql
    v0, v1 = eq.ST_CQL_VALUE
    assert f"BETWEEN {v0} AND {v1}" in sql


def test_exact_generated_strings():
    """Golden pin: the exact leg filters as built from today's constants.
    If either string changes, update BOTH this pin and the oracle check
    above — the point is that a constant edit fails loudly."""
    assert eq.st_range_cql_text() == (
        "BBOX(geom, -30.0, 10.0, 45.0, 55.0) "
        "AND ts DURING 2024-01-06T00:00:00Z/2024-01-20T00:00:00Z "
        "AND (event_type IN ('click', 'view') OR event_type LIKE 'purch%') "
        "AND value BETWEEN 5 AND 400"
    )
    assert eq.st_range_arith_text() == (
        "BBOX(geom, -30.0, 10.0, 45.0, 55.0) "
        "AND value * 2 + 10 > 100 "
        "AND abs(lat - 30) < 12 "
        "AND strLength(strTrim(event_type)) >= 4 "
        "AND floor(value / 10) BETWEEN 5 AND min(400, 300)"
    )
