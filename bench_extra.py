#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN; this file
is the sandbox for noop-sink isolation and per-query A/B timing).

Mirrors bench.py's methodology per query (warm-up rep, then N timed reps,
best wall) but lets you pick a subset of queries, a scale dir, and the
action: ``count`` (bench.py parity) or ``noop`` (guide §1.4 — computes
every column, no count-time column pruning).

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--action count|noop] [q ...]
Prints one JSON line {query: best_sec} plus per-rep detail on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from multilingual_wiki_event_pipeline_spark.catalog import (  # noqa: E402
    EXTRA_QUERIES, QUERIES,
)
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402

ALL_QUERIES = {**EXTRA_QUERIES, **QUERIES}

DEFAULT = [
    "dedup_simhash_pairs", "dedup_minhash_pairs", "canonicalize_components",
    "graph_pagerank", "knn_cosine", "mention_link_rank",
    "j10_incident_ancestors", "sparql_bgp", "j10_transitive_closure",
]


def run(df, action: str) -> None:
    if action == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        df.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--action", choices=["count", "noop"], default="count")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT

    spark = get_spark(app_name="mwep-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    best: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        run(ALL_QUERIES[name](spark, args.sf), args.action)  # untimed warm-up
        walls = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.perf_counter()
            run(ALL_QUERIES[name](spark, args.sf), args.action)
            walls.append(round(time.perf_counter() - t0, 3))
        best[name] = min(walls)
        print(f"{name}: {walls}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "action": args.action, "best": best}))
    spark.stop()


if __name__ == "__main__":
    main()
