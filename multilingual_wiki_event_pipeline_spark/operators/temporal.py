"""Temporal joins: a scalable as-of join (pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` semantics) for event-state lookup.

The reference's pipeline carries per-document creation dates and
"state at processing time" lookups (dct metadata joins, reference
`utils.py` creation-date batches); the generalization a transcript/KG
pipeline actually needs is "for each fact row, the most recent state row
at-or-before its timestamp" — purchase→last-view attribution, message→
active-session lookup, rate-table resolution. Spark has no built-in as-of
join; the naive encoding (inequality theta-join + keep-latest window) is
O(left × right) per key and explodes on hot keys.

Implementation — union-tag + running ``last(ignorenulls)`` window:

  1. tag right rows 0, left rows 1; pack the right payload into ONE struct
     column (null on left rows) so the matched row's fields stay atomic;
  2. union, then one window partitioned by key, ordered by
     (time, side, tie): at equal timestamps right sorts before left, so a
     state row AT the probe instant matches (``allow_exact_matches``
     flips this, mirroring pandas); among equal-time right rows the
     greatest tie-break wins;
  3. ``last(payload, ignorenulls=True)`` over rows unbounded-preceding →
     current carries the latest state forward; keep the left rows.

Cost: ONE shuffle on the key, then a linear pass per partition — the same
plan shape as a sessionization window, independent of how many state rows
precede each probe. Skewed keys behave like any other window (AQE skew
handling applies to the shuffle; the pass itself is streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_time: str, right_time: str,
              right_payload: list[str], tie_break: str,
              allow_exact_matches: bool = True) -> DataFrame:
    """For each ``left`` row, attach the ``right_payload`` struct of the
    latest ``right`` row with the same ``key`` and ``right_time`` <=
    ``left_time`` (< if not ``allow_exact_matches``); ties on time broken
    by greatest ``tie_break``. Output = all ``left`` columns + ``asof``
    struct (null when no right row precedes)."""
    payload = F.struct(*[F.col(c) for c in right_payload]).alias("_payload")
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0 if allow_exact_matches else 2).alias("_side"),
        F.col(tie_break).alias("_tie"),
        payload,
    )
    payload_type = r.schema["_payload"].dataType
    l = (
        left.withColumn("_k", F.col(key))
        .withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(1))
        .withColumn("_tie", F.lit(None).cast(r.schema["_tie"].dataType))
        .withColumn("_payload", F.lit(None).cast(payload_type))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("asof", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_k", "_t", "_side", "_tie", "_payload")
    )
