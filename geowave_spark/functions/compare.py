"""BasicQueryFilter compare-operator family as Column predicates.

The reference evaluates eight range-relation operators per dimension over
(dataMin, dataMax) × (queryMin, queryMax)
(core/store/.../query/filter/BasicQueryFilter.java:41-146).  Re-expressed
as pure Column algebra over interval columns; n-dimensional semantics
follow the reference: INTERSECTS/DISJOINT/CONTAINS/WITHIN/EQUALS apply the
per-dimension relation conjunctively; OVERLAPS requires proper overlap
(intersecting but neither containing) in every dimension; CROSSES is
intersects-but-not-within with a strict boundary crossing in some
dimension; TOUCHES means intersection only at an interval endpoint in some
dimension while intersecting in all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OPS = (
    "INTERSECTS", "DISJOINT", "CONTAINS", "WITHIN",
    "EQUALS", "OVERLAPS", "TOUCHES", "CROSSES",
)


def _dim(op: str, dmin: Column, dmax: Column, qmin: Column, qmax: Column) -> Column:
    if op == "INTERSECTS":
        return (dmin <= qmax) & (dmax >= qmin)
    if op == "CONTAINS":  # data contains query
        return (dmin <= qmin) & (dmax >= qmax)
    if op == "WITHIN":  # data within query
        return (dmin >= qmin) & (dmax <= qmax)
    if op == "EQUALS":
        return (dmin == qmin) & (dmax == qmax)
    raise ValueError(op)


def interval_compare(
    op: str,
    dims: list[tuple[Column, Column, Column, Column]],
) -> Column:
    """n-dimensional compare: dims = [(dmin, dmax, qmin, qmax), ...]."""
    op = op.upper()
    if op not in OPS:
        raise ValueError(f"unknown compare op {op!r} (choose from {OPS})")

    def all_dims(o: str) -> Column:
        pred = F.lit(True)
        for dmin, dmax, qmin, qmax in dims:
            pred = pred & _dim(o, dmin, dmax, qmin, qmax)
        return pred

    if op == "INTERSECTS":
        return all_dims("INTERSECTS")
    if op == "DISJOINT":
        return ~all_dims("INTERSECTS")
    if op == "CONTAINS":
        return all_dims("CONTAINS")
    if op == "WITHIN":
        return all_dims("WITHIN")
    if op == "EQUALS":
        return all_dims("EQUALS")
    if op == "OVERLAPS":
        # proper overlap in every dimension: intersect, strictly crossing
        # one end of the query interval (neither contains the other)
        pred = F.lit(True)
        for dmin, dmax, qmin, qmax in dims:
            inter = _dim("INTERSECTS", dmin, dmax, qmin, qmax)
            not_cont = ~_dim("CONTAINS", dmin, dmax, qmin, qmax)
            not_within = ~_dim("WITHIN", dmin, dmax, qmin, qmax)
            pred = pred & inter & not_cont & not_within
        return pred
    if op == "TOUCHES":
        # intersects in all dims, and in some dim only at an endpoint
        inter = all_dims("INTERSECTS")
        touch_some = F.lit(False)
        for dmin, dmax, qmin, qmax in dims:
            touch_some = touch_some | (dmax == qmin) | (dmin == qmax)
        return inter & touch_some
    # CROSSES: intersects and crosses a query boundary in some dim (each
    # cross disjunct forces dmin < qmin or dmax > qmax in that dimension,
    # so "not within" is already implied — no extra predicate tree)
    inter = all_dims("INTERSECTS")
    cross_some = F.lit(False)
    for dmin, dmax, qmin, qmax in dims:
        cross_some = cross_some | ((dmin < qmin) & (dmax > qmin)) | ((dmin < qmax) & (dmax > qmax))
    return inter & cross_some


def bbox_compare(
    op: str,
    x0: Column, y0: Column, x1: Column, y1: Column,
    qx0: float, qy0: float, qx1: float, qy1: float,
) -> Column:
    """2-D convenience over bbox columns vs a literal query box."""
    lit = lambda v: F.lit(float(v))  # noqa: E731
    return interval_compare(
        op,
        [(x0, x1, lit(qx0), lit(qx1)), (y0, y1, lit(qy0), lit(qy1))],
    )
