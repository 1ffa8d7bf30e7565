"""SemDeDup tier comparison at scale: trained-centroid cells (O(N·k)
assignment) vs seeded LSH-bucket cells (O(N·n_bits) assignment) for the
same keep-min-id dedup. Same boundary-sentinel metering as the other
tools. The question this answers with numbers: at what size does the
centroid assign dominate, and what does the linear tier cost on a corpus
the trained tier can no longer touch?

Fixture: deterministic 64-d vectors (md5-folded uniform components, no
disk). Cells sized for ~400-vector buckets on both tiers.

Usage: python tools/bench_semdedup.py [n_small] [n_large] [--reps N]
Writes BENCH/semdedup_scale.json; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sentinel import (  # noqa: E402
    best_accepted_wall, calibrate, meter_ops, positional_ints,
    sweep_stale_scratch,
)

DIM = 64


def build_vectors(spark, n: int):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"""transform(sequence(1, {DIM}), i ->
            CAST(conv(substring(md5(concat(CAST(id AS STRING), ':',
                 CAST(i AS STRING))), 1, 7), 16, 10) % 1000 AS DOUBLE)
            / 1000.0 - 0.5)"""
        ).alias("embedding"),
    ).localCheckpoint()


def main() -> None:
    pos = positional_ints(sys.argv[1:])
    n_small = pos[0] if pos else 50_000
    n_large = pos[1] if len(pos) > 1 else 200_000
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    sweep_stale_scratch()
    floor = calibrate()

    from pyspark.sql import functions as F

    from multilingual_wiki_event_pipeline_spark.operators import similarity
    from multilingual_wiki_event_pipeline_spark.session import get_spark

    spark = get_spark(app_name="mwep-bench-semdedup")
    spark.sparkContext.setLogLevel("ERROR")

    small = build_vectors(spark, n_small)
    large = build_vectors(spark, n_large)
    # trained tier: first-k vectors as centroids (the assignment cost is
    # identical to trained centroids; Lloyd training would ADD passes)
    k = max(2, n_small // 400)
    cents = small.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    ).localCheckpoint()
    bits_small = max(1, (n_small // 400).bit_length())
    bits_large = max(1, (n_large // 400).bit_length())

    ops = {
        f"centroid_cells_n{n_small}_k{k}": lambda: similarity.semantic_dedup(
            small, cents, threshold=0.35).filter("NOT kept").count(),
        f"lsh_buckets_n{n_small}_b{bits_small}":
            lambda: similarity.semantic_dedup_buckets(
                small, threshold=0.35, n_bits=bits_small)
            .filter("NOT kept").count(),
        f"lsh_buckets_n{n_large}_b{bits_large}":
            lambda: similarity.semantic_dedup_buckets(
                large, threshold=0.35, n_bits=bits_large)
            .filter("NOT kept").count(),
    }
    rows_out = {name: fn() for name, fn in ops.items()}  # warm-up
    detail = meter_ops(ops, reps, floor)

    out = {"n_small": n_small, "n_large": n_large, "dim": DIM, "ops": {}}
    for name, rs in detail.items():
        out["ops"][name] = {
            "best_sec": best_accepted_wall(rs),
            "n_dropped": rows_out[name],
            "reps": rs,
        }
    # non-default sizes get their own file — a probe must not clobber
    # the committed baseline BASELINE.md cites
    suffix = "" if (n_small, n_large) == (50_000, 200_000) \
        else f"_n{n_small}_{n_large}"
    with open(os.path.join(REPO, "BENCH",
                           f"semdedup_scale{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
