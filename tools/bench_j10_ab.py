"""Sentinel-metered A/B of the j10 transitive-closure shapes (round-4
verdict "What's wrong" #2: the r3->r4 fold of the catalog entry onto
ontology.ancestor_closure doubled the entry's single unmetered bench wall,
2.30 -> 5.03 s, and was the one regressed query whose code actually
changed — noise and a real plan change were confounded).

Variants, all producing identical output (proper ancestors over the
nation->region->root edge table):

- ``reflexive_filter``  — the r4 fold: reflexive closure (identity-seeded)
  then ``node != ancestor``. Carries one identity row per node through
  every iteration's join+distinct.
- ``edge_seeded``       — the r5 shape (and the r3 inline shape): the
  iteration starts from the edge set, no identity rows, no post-filter.
  This is what ``catalog.j10_transitive_closure`` ships via
  ``ancestor_closure(..., reflexive=False)``.

Protocol: same boundary-sentinel machinery as bench.py's headline loop
(tools/sentinel.py) — idle-floor calibration, interleaved A/B/A/B rounds,
one sentinel sample between consecutive runs, rep accepted when both
boundary ratios <= 1.35x floor, best accepted wall per variant, all walls
reported. Writes BENCH/j10_ab.md + BENCH/j10_ab.json.

Usage: python tools/bench_j10_ab.py [--sf-dir /root/testdata/sf0.1]
           [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from sentinel import REJECT_P75_RATIO, calibrate, sentinel_wall  # noqa: E402


def variants():
    from pyspark.sql import functions as F

    from multilingual_wiki_event_pipeline_spark.catalog import _t
    from multilingual_wiki_event_pipeline_spark.operators import ontology

    def edges(spark, sf_dir):
        n = _t(spark, sf_dir, "nation")
        r = _t(spark, sf_dir, "region")
        return n.select(
            F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias(
                "child"
            ),
            F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias(
                "parent"
            ),
        ).unionByName(
            r.select(
                F.concat(F.lit("r"), F.col("r_regionkey").cast("string")).alias(
                    "child"
                ),
                F.lit("root").alias("parent"),
            )
        )

    return {
        "reflexive_filter": lambda spark, sf_dir: ontology.ancestor_closure(
            edges(spark, sf_dir), reflexive=True
        ).filter(F.col("node") != F.col("ancestor")),
        "edge_seeded": lambda spark, sf_dir: ontology.ancestor_closure(
            edges(spark, sf_dir), reflexive=False
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5,
                    help="accepted reps wanted per variant")
    args = ap.parse_args()

    from multilingual_wiki_event_pipeline_spark.session import get_spark

    spark = get_spark(app_name="mwep-j10-ab")
    spark.sparkContext.setLogLevel("ERROR")
    floor = calibrate()
    print(f"sentinel floor: {floor:.3f}s", flush=True)

    vs = variants()
    counts = {name: fn(spark, args.sf_dir).count() for name, fn in vs.items()}
    assert len(set(counts.values())) == 1, f"variant outputs differ: {counts}"

    detail: dict[str, list[dict]] = {name: [] for name in vs}
    max_rounds = args.reps + 3
    for _round in range(max_rounds):
        pending = [
            n for n in vs
            if sum(r["accepted"] for r in detail[n]) < args.reps
        ]
        if not pending:
            break
        s_prev = sentinel_wall()
        for name in pending:
            t0 = time.perf_counter()
            vs[name](spark, args.sf_dir).count()
            wall = round(time.perf_counter() - t0, 3)
            s_next = sentinel_wall()
            ratio = round(max(s_prev, s_next) / floor, 3)
            detail[name].append({
                "wall_sec": wall,
                "sentinel_ratio": ratio,
                "accepted": ratio <= REJECT_P75_RATIO,
            })
            print(f"{name}: {wall}s x{ratio} "
                  f"{'ok' if ratio <= REJECT_P75_RATIO else 'REJECTED'}",
                  flush=True)
            s_prev = s_next

    summary = {}
    for name, reps in detail.items():
        acc = sorted(r["wall_sec"] for r in reps if r["accepted"])
        summary[name] = {
            "best_accepted_sec": acc[0] if acc else None,
            "median_accepted_sec": acc[len(acc) // 2] if acc else None,
            "accepted_walls_sec": acc,
            "all_walls_sec": [r["wall_sec"] for r in reps],
            "reps": reps,
        }
    a, b = summary["reflexive_filter"], summary["edge_seeded"]
    payload = {
        "sf_dir": args.sf_dir,
        "output_rows": counts["edge_seeded"],
        "protocol": {
            "sentinel_floor_sec": round(floor, 3),
            "reject_boundary_ratio": REJECT_P75_RATIO,
            "interleaved": True,
            "reps_wanted": args.reps,
            "stat": "best accepted wall (boundary sentinels)",
        },
        "variants": summary,
        "speedup_edge_seeded": (
            round(a["best_accepted_sec"] / b["best_accepted_sec"], 3)
            if a["best_accepted_sec"] and b["best_accepted_sec"] else None
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "j10_ab.json"), "w") as f:
        json.dump(payload, f, indent=2)

    def row(name: str, s: dict) -> str:
        return (f"| {name} | {s['best_accepted_sec']} | "
                f"{s['median_accepted_sec']} | {s['accepted_walls_sec']} | "
                f"{[r['wall_sec'] for r in s['reps'] if not r['accepted']]} |")

    md = f"""# BENCH — j10 transitive-closure fold A/B (round 5)

Adjudicates round-4 "What's wrong" #2: after the r3->r4 fold of
`catalog.j10_transitive_closure` onto `ontology.ancestor_closure`, the
entry's single unmetered bench wall doubled (2.30 -> 5.03 s) — the one
regressed query whose code changed, with host noise and a real plan change
confounded. Both variants here produce IDENTICAL output
({counts['edge_seeded']} rows at {args.sf_dir}); the difference is the
iteration seed:

- `reflexive_filter` — r4 fold: identity-seeded reflexive closure, then
  `node != ancestor`. Every iteration's join+distinct carries one identity
  row per node.
- `edge_seeded` — r5 ship shape (= the r3 inline shape, now expressed as
  `ancestor_closure(..., reflexive=False)` so there is still exactly ONE
  closure implementation): the iteration starts from the edge set.

Protocol: boundary-sentinel metering (tools/sentinel.py), idle floor
{floor:.3f} s, interleaved rounds, rep accepted when both boundary ratios
<= {REJECT_P75_RATIO}x floor, best accepted wall counted.

| variant | best accepted (s) | median accepted | accepted walls | rejected walls |
|---|---|---|---|---|
{row('reflexive_filter (r4 fold)', a)}
{row('edge_seeded (r5 ship)', b)}

**reflexive_filter / edge_seeded = {payload['speedup_edge_seeded']}x.**

Machine-readable copy: `BENCH/j10_ab.json`. Reproduce with
`python tools/bench_j10_ab.py --sf-dir {args.sf_dir} --reps {args.reps}`.
"""
    with open(os.path.join(REPO, "BENCH", "j10_ab.md"), "w") as f:
        f.write(md)
    print(json.dumps(payload["variants"]["edge_seeded"]
                     | {"speedup": payload["speedup_edge_seeded"]}))


if __name__ == "__main__":
    main()
