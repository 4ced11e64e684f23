"""Spatio-temporal (x, y, t) key packing with bias-dependent bits.

The reference interleaves TIME into the tiered curve as a true SFC
dimension with bias-dependent bit budgets — BALANCED 20/20/20, SPATIAL
25/25/10, TEMPORAL 10/10/40 bits for (lon, lat, time)
(core/geotime/.../SpatialTemporalDimensionalityTypeProvider.java:184-221;
TemporalBinningStrategy.java:36-127 for the per-bin offset).  The round-2
engine folded time only as a calendar-bin PREFIX column, so a sub-bin
time slice (one week inside a year bin) scanned the whole bin's spatial
range.  This module is the bias-bits analog: within a calendar bin, the
row key is a generalized Morton interleave of (gx, gy, gt) — gt the
quantized offset within the bin — so a sub-bin time slice decomposes into
key ranges that prune below bin granularity on a (bin, key)-sorted
columnar layout.

Everything is pure Column bit math on the write path and a driver-side
recursive octant decomposition on the query path (the 3-D analog of
cells.ranges_for_cover / TieredSFCIndexStrategy.getQueryRanges).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (x_bits, y_bits, t_bits) per calendar bin — scaled-down analogs of the
# reference's 20/20/20 | 25/25/10 | 10/10/40 BIAS budgets (30-bit key)
ST_BIAS: dict[str, tuple[int, int, int]] = {
    "balanced": (10, 10, 10),
    "spatial": (12, 12, 6),
    "temporal": (6, 6, 18),
}


def bit_schedule(bits: tuple[int, int, int]) -> list[int]:
    """Interleave order of dimension indices, MSB first: round-robin over
    dimensions that still have bits left (a dim with a larger budget keeps
    contributing after the others run out — its extra bits land in the low
    positions, exactly the reference's unequal-cardinality interleave)."""
    remaining = list(bits)
    sched: list[int] = []
    while any(r > 0 for r in remaining):
        for d in range(3):
            if remaining[d] > 0:
                sched.append(d)
                remaining[d] -= 1
    return sched


def st_key_expr(gx: Column, gy: Column, gt: Column, bits: tuple[int, int, int]) -> Column:
    """Packed (x, y, t) key — pure JVM bit math (no UDF on the hot path)."""
    sched = bit_schedule(bits)
    total = len(sched)
    cols = (gx, gy, gt)
    seen = [0, 0, 0]
    expr = F.lit(0).cast("long")
    for i, d in enumerate(sched):
        src = bits[d] - 1 - seen[d]  # this appearance carries dim bit `src`
        dst = total - 1 - i
        seen[d] += 1
        bit = F.shiftrightunsigned(cols[d].cast("long"), src).bitwiseAND(F.lit(1))
        expr = expr + F.shiftleft(bit, dst)
    return expr


def ranges_for_box3(
    qlo: tuple[int, int, int],
    qhi: tuple[int, int, int],
    bits: tuple[int, int, int],
    budget: int = 96,
) -> list[tuple[int, int]]:
    """Budgeted key-range decomposition of an integer (x, y, t) box.

    Recursive octant subdivision along the interleave schedule: a block
    fully inside the query emits its whole key range; once the budget is
    reached remaining blocks emit LOOSE (superset) ranges — callers refine
    exactly afterwards, so looseness costs scan rows, never correctness.
    Adjacent ranges are merged (the reference merges contiguous SFC ranges
    the same way before issuing scans).
    """
    import heapq

    sched = bit_schedule(bits)
    total = len(sched)

    def clip_vol(blo, bhi) -> int:
        v = 1
        for d in range(3):
            ov = min(bhi[d], qhi[d]) - max(blo[d], qlo[d]) + 1
            if ov <= 0:
                return 0
            v *= ov
        return v

    def block_vol(blo, bhi) -> int:
        v = 1
        for d in range(3):
            v *= bhi[d] - blo[d] + 1
        return v

    # greedy refinement: always split the pending block with the most
    # EXCESS (non-query) volume, so the budget is spent where looseness
    # costs the most scan rows — a DFS-with-cutoff instead emits giant
    # untouched siblings once the budget dies inside the first subtree
    out: list[tuple[int, int]] = []
    heap: list = []
    seq = 0

    def push(depth: int, prefix: int, blo, bhi) -> None:
        nonlocal seq
        cv = clip_vol(blo, bhi)
        if cv == 0:
            return
        span = total - depth
        rng = (prefix << span, ((prefix + 1) << span) - 1)
        excess = block_vol(blo, bhi) - cv
        if excess == 0 or depth == total:
            out.append(rng)
            return
        heapq.heappush(heap, (-excess, seq, depth, prefix, blo, bhi))
        seq += 1

    push(0, 0, [0, 0, 0], [(1 << b) - 1 for b in bits])
    while heap and len(out) + len(heap) < budget:
        _, _, depth, prefix, blo, bhi = heapq.heappop(heap)
        d = sched[depth]
        mid = (blo[d] + bhi[d]) >> 1
        hi2 = list(bhi)
        hi2[d] = mid
        push(depth + 1, prefix << 1, list(blo), hi2)
        lo2 = list(blo)
        lo2[d] = mid + 1
        push(depth + 1, (prefix << 1) | 1, lo2, list(bhi))
    for _, _, depth, prefix, blo, bhi in heap:
        span = total - depth
        out.append((prefix << span, ((prefix + 1) << span) - 1))
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def st_key_scalar(gx: int, gy: int, gt: int, bits: tuple[int, int, int]) -> int:
    """Driver-side twin of st_key_expr (tests / planning)."""
    sched = bit_schedule(bits)
    total = len(sched)
    vals = (gx, gy, gt)
    seen = [0, 0, 0]
    key = 0
    for i, d in enumerate(sched):
        src = bits[d] - 1 - seen[d]
        dst = total - 1 - i
        seen[d] += 1
        key |= ((vals[d] >> src) & 1) << dst
    return key
