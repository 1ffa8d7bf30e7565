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
    # helper names would be silently clobbered by the withColumns below,
    # corrupting output for inputs that happen to use them (ADVICE r5)
    clash = {"_k", "_t", "_side", "_tie", "_payload", "asof"} & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left columns collide with helper names {sorted(clash)}; "
            "rename them before joining")
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


def gapfill_locf(events: DataFrame, key_col: str, ts_col: str,
                 state_col: str, bucket: str = "DAY",
                 tie_col: str | None = None) -> DataFrame:
    """Calendar densification + last-observation-carried-forward — the
    timeseries-store gap-fill (TimescaleDB ``time_bucket_gapfill`` +
    ``locf``) as pure DataFrame algebra: per key, one row per ``bucket``
    between that key's first and last observation, carrying the latest
    observed state forward through empty buckets.

    Per (key, bucket) the observed state is the ``state_col`` of the
    LAST event (greatest ``ts_col``, ties on ``tie_col``) — a ranking
    window, deterministic. The dense calendar is ``sequence(min_bucket,
    max_bucket, interval 1 <bucket>)`` exploded per key — map-side array
    work, rows bounded by the key's own time span, no cross-key blowup.

    The carry-forward avoids engine-specific IGNORE NULLS windows with
    the portable two-window group trick: ``grp = count(state) over
    (key order by bucket)`` increments exactly at observed buckets, so
    ``max(state) over (key, grp)`` is THE state of each gap's governing
    observation. A key's first bucket is always observed (the calendar
    starts at its min), so no leading-null branch exists.

    Output: ``(key, bucket_ts, state, filled)`` — ``filled`` marks
    carried rows.

    Scale shape: one agg per (key, bucket) with partial map-side
    combine, one tiny per-key min/max agg, the calendar explode, one
    equi-join back, two windows over the SAME (key-bucket-sorted)
    shuffle — Catalyst runs them in a single Window exchange. Buckets
    per key are bounded by the retention span; hot keys split by AQE.
    """
    from pyspark.sql import Window

    # units valid for BOTH date_trunc and a sequence() interval literal;
    # the unit lands inside an F.expr string, so an arbitrary value is
    # rejected rather than injected
    allowed = ("MINUTE", "HOUR", "DAY", "WEEK", "MONTH", "YEAR")
    bucket = bucket.upper()
    if bucket not in allowed:
        raise ValueError(f"bucket must be one of {allowed}, got {bucket!r}")
    tie = tie_col or ts_col
    b = F.date_trunc(bucket, F.col(ts_col))
    w_last = Window.partitionBy("_k", "_b").orderBy(
        F.desc("_t"), F.desc("_tie"))
    obs = (
        events.select(
            F.col(key_col).alias("_k"), b.alias("_b"),
            F.col(ts_col).alias("_t"), F.col(tie).alias("_tie"),
            F.col(state_col).alias("_s"))
        .withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select("_k", "_b", "_s")
    )
    cal = (
        obs.groupBy("_k").agg(F.min("_b").alias("_lo"),
                              F.max("_b").alias("_hi"))
        .select(
            "_k",
            F.explode(
                F.expr(f"sequence(_lo, _hi, interval 1 {bucket})")
            ).alias("_b"),
        )
    )
    w_ord = Window.partitionBy("_k").orderBy("_b")
    grp = F.count("_s").over(
        w_ord.rowsBetween(Window.unboundedPreceding, 0))
    filled = (
        cal.join(obs, ["_k", "_b"], "left")
        .withColumn("_grp", grp)
        .withColumn(
            "state",
            F.max("_s").over(Window.partitionBy("_k", "_grp")))
        .select(
            F.col("_k").alias(key_col),
            F.col("_b").alias("bucket_ts"),
            "state",
            F.col("_s").isNull().alias("filled"),
        )
    )
    return filled


def scd2_history(updates: DataFrame, key_col: str, ts_col: str,
                 state_col: str, tie_col: str | None = None) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log: per
    key, collapse consecutive duplicate states (a re-assertion of the
    current value opens no new version — the warehouse MERGE rule), then
    close each version at the next change: ``(key, state, valid_from,
    valid_to, is_current)`` with ``valid_to`` NULL on the open version.

    Within equal ``ts_col`` values ``tie_col`` orders changes
    (deterministic; defaults to the timestamp itself). Zero-duration
    versions (two different states at one timestamp) are kept, closed at
    their own ``valid_from`` — an auditable record that the state passed
    through, matching bitemporal-warehouse practice.

    Scale shape: one shuffle on the key, then two linear window passes
    over the same sort (lag for the collapse, lead for the close) —
    Catalyst fuses them into one Window exchange; nothing key-crossing,
    hot keys split by AQE.
    """
    from pyspark.sql import Window

    tie = tie_col or ts_col
    w = Window.partitionBy("_k").orderBy("_t", "_tie")
    changes = (
        updates.select(
            F.col(key_col).alias("_k"), F.col(ts_col).alias("_t"),
            F.col(tie).alias("_tie"), F.col(state_col).alias("state"))
        .withColumn("_prev", F.lag("state").over(w))
        .filter(F.col("_prev").isNull()
                | (F.col("_prev") != F.col("state")))
    )
    return (
        changes
        .withColumn("valid_to", F.lead("_t").over(w))
        .select(
            F.col("_k").alias(key_col),
            "state",
            F.col("_t").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def rolling_days(events: DataFrame, key_col: str, ts_col: str,
                 value_col: str, days: int = 7) -> DataFrame:
    """Trailing N-day rolling aggregates per key — the RANGE-frame window
    (frame bounded by ORDER-column VALUE, not row position), which the
    repo's other windows never exercise: a key with activity on day 1
    and day 10 must NOT see day 1 inside day 10's trailing week, which a
    ROWS frame would get wrong on sparse histories.

    Two-level plan: (1) pre-aggregate to one row per (key, day) — daily
    event count and the day's value total in integer MICRO-units
    (``round(value * 1e6)`` per event, then exact BIGINT sums all the
    way up, so no float summation order exists and the DuckDB twin
    hash-matches); (2) one RANGE window ``BETWEEN days-1 PRECEDING AND
    CURRENT ROW`` over the integer day number (days since epoch — an
    arithmetic ORDER key both engines agree on, avoiding cross-engine
    timestamp-to-epoch semantics).

    Output: ``(key, day, n_events, n_events_Nd, value_micro_Nd)`` — one
    row per ACTIVE day (gap days emit no row but still bound the frame;
    compose with :func:`gapfill_locf` for a dense report). No float mean
    column: it is derivable from the two exact columns, and emitting it
    would reintroduce the ROUND(double) cross-engine hazard the integer
    micro-units exist to avoid.

    Scale shape: the pre-aggregation collapses events to (key, day)
    BEFORE the window (partial map-side combine), so the window pass
    touches one row per active day, not per event; one shuffle total —
    the (key, day) agg exchange satisfies the window's (key) partition
    requirement after a local sort. Hot keys bounded by retention days.
    """
    daily = (
        events.select(
            F.col(key_col).alias("_k"),
            F.datediff(F.col(ts_col), F.lit("1970-01-01").cast("date"))
            .alias("_d"),
            F.round(F.col(value_col) * F.lit(1e6)).cast("long").alias("_v"),
        )
        .groupBy("_k", "_d")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("_v").alias("_vday"))
    )
    w = Window.partitionBy("_k").orderBy("_d").rangeBetween(-(days - 1), 0)
    return (
        daily
        .withColumn("n_roll", F.sum("n_events").over(w))
        .withColumn("v_roll", F.sum("_vday").over(w))
        .select(
            F.col("_k").alias(key_col),
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("_d")),
                "yyyy-MM-dd",
            ).alias("day"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_roll").cast("long").alias(f"n_events_{days}d"),
            F.col("v_roll").cast("long").alias(f"value_micro_{days}d"),
        )
    )
