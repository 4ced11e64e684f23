"""Row-level visibility filtering — ClientVisibilityFilter semantics.

The reference tags rows with boolean label expressions ("a&b", "(a|b)&c")
and filters scans by the caller's authorization set
(core/store/.../query/filter/ClientVisibilityFilter.java,
util/VisibilityExpression.java).  Scale shape: visibility strings are
low-cardinality, so evaluate each DISTINCT expression once on the driver
against the auth set and push the result down as a sargable
``visibility IN (granted...)`` filter — dictionary/min-max prunable at the
parquet scan, zero per-row expression evaluation.

Expression grammar (the reference's): labels, ``&``, ``|``, parentheses;
empty/NULL visibility is readable by everyone.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Upper bound on the driver-side distinct-expression collect.  Visibility
# vocabularies are combinatorially tiny (a few labels x a few operators);
# 10k distinct expressions means the column is not a visibility column.
MAX_DISTINCT_EXPRESSIONS = 10_000

_TOKEN = re.compile(r"\s*([()&|]|[A-Za-z0-9_.-]+)")


def evaluate_expression(expr: str, auths: set[str]) -> bool:
    """Evaluate a visibility expression against an authorization set."""
    if not expr or not expr.strip():
        return True
    expr = expr.strip()  # trailing whitespace is not a syntax error
    pos = 0
    tokens: list[str] = []
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m:
            raise ValueError(f"bad visibility expression {expr!r} at {pos}")
        tokens.append(m.group(1))
        pos = m.end()

    def parse_or(i: int) -> tuple[bool, int]:
        v, i = parse_and(i)
        while i < len(tokens) and tokens[i] == "|":
            rhs, i = parse_and(i + 1)
            v = v or rhs
        return v, i

    def parse_and(i: int) -> tuple[bool, int]:
        v, i = parse_atom(i)
        while i < len(tokens) and tokens[i] == "&":
            rhs, i = parse_atom(i + 1)
            v = v and rhs
        return v, i

    def parse_atom(i: int) -> tuple[bool, int]:
        if i >= len(tokens):
            raise ValueError(f"truncated visibility expression {expr!r}")
        if tokens[i] == "(":
            v, i = parse_or(i + 1)
            if i >= len(tokens) or tokens[i] != ")":
                raise ValueError(f"unbalanced parens in {expr!r}")
            return v, i + 1
        if tokens[i] in ("&", "|", ")"):
            # structural token where a label is required: 'a|)' or 'a&&b'
            # must be a parse error, not a silently-False label
            raise ValueError(f"malformed visibility expression {expr!r}")
        return tokens[i] in auths, i + 1

    v, i = parse_or(0)
    if i != len(tokens):
        raise ValueError(f"trailing tokens in {expr!r}")
    return v


def visibility_filter(
    df: DataFrame, authorizations: set[str] | list[str], vis_col: str = "visibility"
) -> DataFrame:
    """Keep rows whose visibility expression the auth set satisfies.

    Distinct expressions are evaluated driver-side (one tiny aggregate),
    then pushed as an IN filter — the scan-prunable form.

    Malformed expressions FAIL CLOSED: an unparseable visibility string
    denies its rows (like an unmatched label) instead of crashing the
    whole scan — row data must never be able to kill the query.

    The distinct collect is limit-guarded (the probe_broadcastable
    pattern): real visibility vocabularies are tiny by construction, but
    an adversarial or mis-typed column (e.g. a free-text field) must fail
    loudly instead of pulling an unbounded label set onto the driver.
    """
    auths = set(authorizations)
    probe = df.select(vis_col).distinct().limit(MAX_DISTINCT_EXPRESSIONS + 1).collect()
    if len(probe) > MAX_DISTINCT_EXPRESSIONS:
        raise ValueError(
            f"visibility column {vis_col!r} has more than "
            f"{MAX_DISTINCT_EXPRESSIONS} distinct expressions — this is not "
            "a label vocabulary; refusing the driver-side collect"
        )
    distinct = [r[0] for r in probe]

    def _granted(v: str) -> bool:
        try:
            return evaluate_expression(v, auths)
        except ValueError:
            return False

    granted = [v for v in distinct if v is not None and _granted(v)]
    open_rows = F.col(vis_col).isNull() | (F.trim(F.col(vis_col)) == "")
    if any(v is not None and (not v.strip()) for v in distinct) or None in distinct:
        return df.filter(open_rows | F.col(vis_col).isin(granted))
    return df.filter(F.col(vis_col).isin(granted))
