#!/usr/bin/env python
"""Round-6 session-3 interleaved A/B #3: _weighted_edges(cluster="dst")
window-outdeg (2 edge exchanges + sort) vs agg+broadcast-join outdeg
(1 edge exchange, no sort, double persist) — pagerank/ppr, alternating
reps in one process.

Usage: python tools/bench_s3_ab3.py [--sf DIR] [--reps N] [q ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from multilingual_wiki_event_pipeline_spark.catalog import (  # noqa: E402
    EXTRA_QUERIES, QUERIES,
)
from multilingual_wiki_event_pipeline_spark.operators import graph  # noqa: E402
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402

ALL_QUERIES = {**EXTRA_QUERIES, **QUERIES}

OLD_WEIGHTED = graph._weighted_edges


def new_weighted(edges: DataFrame, cluster: str = "src") -> DataFrame:
    if cluster != "dst":
        return OLD_WEIGHTED(edges, cluster)
    edges = edges.select("src", "dst")
    n = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    deduped = (
        edges.repartition(n, F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    outdeg = deduped.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg"))
    out = deduped.join(F.broadcast(outdeg), "src").persist()
    out.count()  # materialize before dropping the dedup cache
    deduped.unpersist(blocking=True)
    return out


def set_variant(which: str) -> None:
    graph._weighted_edges = new_weighted if which == "new" else OLD_WEIGHTED


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata_big/sf1x")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*",
                    default=["graph_pagerank", "graph_ppr"])
    args = ap.parse_args()

    spark = get_spark(app_name="mwep-s3-ab3")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, list[float]]] = {}
    for name in args.queries:
        walls: dict[str, list[float]] = {"old": [], "new": []}
        for variant in ("old", "new"):
            set_variant(variant)
            spark.sparkContext.setJobDescription(f"warmup:{name}:{variant}")
            ALL_QUERIES[name](spark, args.sf).count()
        for rep in range(args.reps):
            for variant in ("old", "new"):
                set_variant(variant)
                spark.sparkContext.setJobDescription(
                    f"{name}:{variant}:rep{rep}")
                t0 = time.perf_counter()
                ALL_QUERIES[name](spark, args.sf).count()
                walls[variant].append(round(time.perf_counter() - t0, 3))
        set_variant("old")
        out[name] = walls
        print(f"{name}: old={walls['old']} new={walls['new']}",
              file=sys.stderr)
    print(json.dumps({
        "sf": args.sf,
        "detail": out,
        "best": {q: {v: min(w) for v, w in d.items()}
                 for q, d in out.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
