"""Data-layout keys for multi-dimensional scan pruning — the Z-order
(Morton) curve that Delta/Iceberg `OPTIMIZE ZORDER BY` clusters files
with: interleaving the bits of two dimension keys gives a single sort key
whose ranges are (approximately) rectangles in dimension space, so a
range-partitioned / file-sorted layout on the key lets min/max file stats
prune BOTH dimensions at scan time — where a lexicographic (a, b) sort
prunes only the leading one.

Pure integer bit arithmetic (shiftright/shiftleft/&/| are identical in
Spark and DuckDB), so layout keys hash-match the oracle bit-for-bit and
are reproducible across engines, reruns, and cluster sizes — a property
a layout key MUST have, or compaction jobs re-cluster forever.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_interleave(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integer columns
    into a Morton key: bit j of x lands at position 2j, bit j of y at
    2j+1. Inputs are masked to ``bits`` (callers bucket real values into
    [0, 2^bits) first — equal-width or quantile buckets both work; the
    power-of-two histogram sketch is the natural quantile source).

    The expression is the unrolled 2*bits-term integer sum — whole-stage
    codegen folds it into straight-line bit arithmetic, no UDF, no join.
    """
    if not (1 <= bits <= 31):
        raise ValueError("require 1 <= bits <= 31")
    xm = F.pmod(x.cast("long"), F.lit(1 << bits))
    ym = F.pmod(y.cast("long"), F.lit(1 << bits))
    key = F.lit(0).cast("long")
    for j in range(bits):
        key = key + F.shiftleft(
            F.shiftright(xm, j).bitwiseAND(F.lit(1)), 2 * j
        ).cast("long")
        key = key + F.shiftleft(
            F.shiftright(ym, j).bitwiseAND(F.lit(1)), 2 * j + 1
        ).cast("long")
    return key
