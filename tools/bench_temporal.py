"""Temporal-tier scale measurement: gap-fill + LOCF, SCD2 history, and
the RANGE-frame rolling aggregate on an event log large enough that the
per-key shuffle and the calendar explode are the costs that matter.
Same boundary-sentinel noise metering as bench.py / bench_sketches.py.

Fixture: a deterministic distributed event log (no disk, no driver
materialization) — spark.range(n) with user = id % n_users, a day drawn
from the md5 coin over ``n_days`` (so each user's history has random
gaps for LOCF to fill), a second coin for the in-day second, and a
small state alphabet. Throughput context: at the default 20M events /
200k users / 60 days, gap-fill densifies to ~12M (user, day) rows and
SCD2 emits one version per state transition.

Usage: python tools/bench_temporal.py [n_events] [--reps N]
       [--users N] [--days N]
Writes BENCH/temporal_scale.json (non-default n_events suffixes the
filename); prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sentinel import (  # noqa: E402
    best_accepted_wall, calibrate, meter_ops, sweep_stale_scratch,
)


def build_events(spark, n_events: int, n_users: int, n_days: int):
    """Deterministic event log with per-user day gaps: day and second
    come from disjoint md5 substrings of the row id."""
    from pyspark.sql import functions as F

    day = F.conv(
        F.substring(F.md5(F.col("id").cast("string")), 1, 7), 16, 10
    ).cast("long") % n_days
    sec = F.conv(
        F.substring(F.md5(F.col("id").cast("string")), 9, 7), 16, 10
    ).cast("long") % 86400
    # state and value from md5 too — an id-modulus state would be
    # CONSTANT per user (id ≡ user mod n_users, and n_users % 5 == 0),
    # leaving SCD2 with a single degenerate version per key
    coin = F.conv(
        F.substring(F.md5(F.col("id").cast("string")), 17, 7), 16, 10
    ).cast("long")
    return spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).alias("user_id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=(day * 86400 + sec).cast("double"))
         ).alias("ts"),
        F.concat(F.lit("s"), (coin % 5).cast("string")).alias("event_type"),
        ((coin % 1000).cast("double") / 100.0).alias("value"),
    )


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 20_000_000
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    n_users = 200_000
    if "--users" in sys.argv:
        n_users = int(sys.argv[sys.argv.index("--users") + 1])
    n_days = 60
    if "--days" in sys.argv:
        n_days = int(sys.argv[sys.argv.index("--days") + 1])

    sweep_stale_scratch()
    floor = calibrate()

    from multilingual_wiki_event_pipeline_spark.operators import temporal
    from multilingual_wiki_event_pipeline_spark.session import get_spark

    spark = get_spark(app_name="mwep-bench-temporal")
    spark.sparkContext.setLogLevel("ERROR")

    events = build_events(spark, n_events, n_users, n_days).localCheckpoint()
    n = events.count()

    ops = {
        "gapfill_locf": lambda: temporal.gapfill_locf(
            events, "user_id", "ts", "event_type", bucket="DAY",
            tie_col="event_id").count(),
        "scd2_history": lambda: temporal.scd2_history(
            events, "user_id", "ts", "event_type",
            tie_col="event_id").count(),
        "rolling_days": lambda: temporal.rolling_days(
            events, "user_id", "ts", "value", days=7).count(),
    }
    rows_out: dict[str, int] = {k: fn() for k, fn in ops.items()}  # warm-up
    detail = meter_ops(ops, reps, floor)

    out = {"n_events": n, "n_users": n_users, "n_days": n_days, "ops": {}}
    for name, rs in detail.items():
        best = best_accepted_wall(rs)
        out["ops"][name] = {
            "best_sec": best,
            "rows_out": rows_out[name],
            "events_per_sec": round(n / best),
            "reps": rs,
        }
    suffix = "" if n_events == 20_000_000 else f"_n{n_events}"
    with open(os.path.join(REPO, "BENCH",
                           f"temporal_scale{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
