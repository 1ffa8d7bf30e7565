#!/usr/bin/env python
"""Round-6 session-3 interleaved A/B: union-symmetrize vs explode-symmetrize
and checkpointed vs un-checkpointed relax prep, measured IN ONE PROCESS
with alternating reps so host noise cannot land on one variant.

Variant "old" monkeypatches graph.symmetrize / canonicalize's sym build
back to the union shape and _relax_rounds_broadcast back to the
no-checkpoint prep; variant "new" is the shipped code. Reps alternate
old,new,old,new,... per query.

Usage: python tools/bench_s3_ab.py [--sf DIR] [--reps N] [q ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from multilingual_wiki_event_pipeline_spark.catalog import (  # noqa: E402
    EXTRA_QUERIES, QUERIES,
)
from multilingual_wiki_event_pipeline_spark.operators import graph  # noqa: E402
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402

ALL_QUERIES = {**EXTRA_QUERIES, **QUERIES}

NEW_SYMMETRIZE = graph.symmetrize
NEW_RELAX = graph._relax_rounds_broadcast


def old_symmetrize(pairs):
    return pairs.select("src", "dst").unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def old_relax(edges, dist, w, n_rounds):
    n = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    weighted = edges.select("src", "dst", w.alias("_w"))
    zero = F.lit(0).cast("long")
    nodes = (
        weighted.select(F.col("src").alias("v"))
        .unionByName(weighted.select(F.col("dst").alias("v")))
        .unionByName(dist.select(F.col("node").alias("v")))
        .distinct()
    )
    looped = (
        weighted.unionByName(
            nodes.select(F.col("v").alias("src"), F.col("v").alias("dst"),
                         zero.alias("_w"))
        )
        .repartition(n, F.col("dst"))
        .dropDuplicates(["src", "dst", "_w"])
        .persist()
    )
    for _ in range(n_rounds):
        dist = (
            looped.join(F.broadcast(dist), looped.src == dist.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("_w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    dist = dist.localCheckpoint()
    looped.unpersist(blocking=True)
    return dist


def set_variant(which: str) -> None:
    if which == "old":
        graph.symmetrize = old_symmetrize
        graph._relax_rounds_broadcast = old_relax
    else:
        graph.symmetrize = NEW_SYMMETRIZE
        graph._relax_rounds_broadcast = NEW_RELAX


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata_big/sf1x")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*",
                    default=["graph_pagerank", "graph_ppr", "graph_lpa",
                             "graph_bfs", "graph_sssp"])
    args = ap.parse_args()

    spark = get_spark(app_name="mwep-s3-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, list[float]]] = {}
    for name in args.queries:
        walls: dict[str, list[float]] = {"old": [], "new": []}
        for variant in ("old", "new"):  # untimed warm-ups, both variants
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
        set_variant("new")
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
