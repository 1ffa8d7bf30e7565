#!/usr/bin/env python
"""Round-6 session-3 interleaved A/B #2: the explode-symmetrization inside
connected_components (canonicalize), the kcore explode, and the
triangle_counts materialization — old vs shipped, alternating reps in one
process (host noise cannot land on one variant).

Usage: python tools/bench_s3_ab2.py [--sf DIR] [--reps N] [q ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from multilingual_wiki_event_pipeline_spark.catalog import (  # noqa: E402
    EXTRA_QUERIES, QUERIES,
)
from multilingual_wiki_event_pipeline_spark.operators import (  # noqa: E402
    canonicalize, graph,
)
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402

ALL_QUERIES = {**EXTRA_QUERIES, **QUERIES}

NEW_CC = canonicalize.connected_components
NEW_KCORE = graph.kcore_nodes
NEW_TRI = graph.triangle_counts


def old_cc(edges: DataFrame, src: str = "src", dst: str = "dst",
           max_iter: int = 20, checkpoint_every: int = 3) -> DataFrame:
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    sym = sym.localCheckpoint()
    verts = sym.select(F.col("a").alias("vertex")).distinct()
    looped = sym.unionByName(
        verts.select(F.col("vertex").alias("a"), F.col("vertex").alias("b"))
    )
    labels = verts.withColumn("component", F.col("vertex"))
    for i in range(max_iter):
        new_labels = (
            looped.join(labels, looped["b"] == labels["vertex"])
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("component"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "vertex")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels


def old_kcore(edges: DataFrame, k: int, n_rounds: int = 4) -> DataFrame:
    if k < 1:
        raise ValueError("kcore_nodes needs k >= 1")
    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .localCheckpoint()
    )
    for _ in range(n_rounds):
        keep = (
            sym.groupBy("src")
            .agg(F.count("*").alias("dg"))
            .filter(F.col("dg") >= k)
            .select(F.col("src").alias("node"))
        )
        sym = (
            sym.join(keep, sym.src == keep.node, "left_semi")
            .join(keep, F.col("dst") == keep.node, "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("long").alias("degree"))
    )


def old_tri(edges: DataFrame) -> DataFrame:
    e = (
        edges.select(F.col("src").alias("s"), F.col("dst").alias("t"))
        .filter(F.col("s") != F.col("t"))
        .select(
            F.least("s", "t").alias("a"), F.greatest("s", "t").alias("b")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("dg"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("a"), F.col("dg").alias("dga")),
               "a")
        .join(deg.select(F.col("n").alias("b"), F.col("dg").alias("dgb")),
              "b")
    )
    fwd = (F.col("dga") < F.col("dgb")) | (
        (F.col("dga") == F.col("dgb")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("x"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("y"),
        F.when(fwd, F.col("dgb")).otherwise(F.col("dga")).alias("yd"),
    )
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = (
        e1.join(e2, "x")
        .filter(
            (F.col("e1.yd") < F.col("e2.yd"))
            | (
                (F.col("e1.yd") == F.col("e2.yd"))
                & (F.col("e1.y") < F.col("e2.y"))
            )
        )
        .select(
            "x", F.col("e1.y").alias("y1"), F.col("e2.y").alias("y2")
        )
    )
    closing = o.select(F.col("x").alias("y1"), F.col("y").alias("y2"))
    tri = wedges.join(closing, ["y1", "y2"])
    return (
        tri.select(F.explode(F.array("x", "y1", "y2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def set_variant(which: str) -> None:
    if which == "old":
        canonicalize.connected_components = old_cc
        graph.kcore_nodes = old_kcore
        graph.triangle_counts = old_tri
    else:
        canonicalize.connected_components = NEW_CC
        graph.kcore_nodes = NEW_KCORE
        graph.triangle_counts = NEW_TRI


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata_big/sf1x")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*",
                    default=["canonicalize_components", "graph_kcore",
                             "graph_triangles"])
    args = ap.parse_args()

    spark = get_spark(app_name="mwep-s3-ab2")
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
