"""Sketch-vs-exact scale measurement: at what cost does each sketch
replace its exact twin on a corpus large enough that the exact path's
data-sized exchange matters? Same boundary-sentinel noise metering as
bench.py / bench_graph.py.

Fixture: a deterministic distributed token stream (no disk, no driver
materialization) — spark.range(n) with token = md5-derived zipf-ish id,
group = id % n_groups. Three head-to-heads:

- distinct:  HLL registers+estimate  vs exact countDistinct per group
- quantiles: log2 histogram (sketch-only) vs exact per-group row_number
             rank (the 1-partition-per-group window pain point)
- heavy:     CMS top-20                vs exact groupBy-count top-20

Usage: python tools/bench_sketches.py [n_rows] [--reps N]
Writes BENCH/sketch_scale.json; prints one JSON line.
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


def build_tokens(spark, n_rows: int, n_groups: int = 4,
                 vocab: int = 65536):
    """Deterministic skewed token stream: ~zipf via folding the md5 coin
    (25% of rows collapse onto token 0 — the hot key), value space
    ``vocab`` (the crossover knob: sketches win when the exact path's
    exchange is sized by distinct keys, i.e. vocab ~ n_rows)."""
    from pyspark.sql import functions as F

    return spark.range(n_rows).select(
        (F.col("id") % n_groups).cast("string").alias("g"),
        F.concat(
            F.lit("t"),
            F.when(F.col("id") % 4 == 0, F.lit(0)).otherwise(
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 7),
                       16, 10).cast("long") % vocab
            ).cast("string"),
        ).alias("token"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 9, 7),
                16, 10).cast("long") % 4096 + 1).alias("v"),
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 20_000_000
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    vocab = 65536
    if "--vocab" in sys.argv:
        vocab = int(sys.argv[sys.argv.index("--vocab") + 1])

    sweep_stale_scratch()
    floor = calibrate()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from multilingual_wiki_event_pipeline_spark.operators import text_analysis
    from multilingual_wiki_event_pipeline_spark.session import get_spark

    spark = get_spark(app_name="mwep-bench-sketches")
    spark.sparkContext.setLogLevel("ERROR")

    toks = build_tokens(spark, n_rows, vocab=vocab).localCheckpoint()
    n = toks.count()

    def exact_quantiles():
        w = Window.partitionBy("g").orderBy("v")
        ranked = toks.withColumn("rank", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        qdim = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
        return (
            ranked.join(F.broadcast(qdim))
            .filter(F.col("rank") >= F.ceil(F.col("q") * F.col("n")))
            .groupBy("g", "q").agg(F.min("v").alias("exact"))
        ).count()

    def exact_heavy():
        return (
            toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "token").limit(20)
        ).count()

    pairs = {
        "distinct_sketch": lambda: text_analysis.hll_estimate(
            text_analysis.hll_registers(toks, "g", "token")).count(),
        "distinct_exact": lambda: toks.groupBy("g").agg(
            F.countDistinct("token")).count(),
        "quantiles_sketch": lambda: text_analysis.log2_histogram_quantiles(
            toks, "g", "v", with_exact=False).count(),
        "quantiles_exact": exact_quantiles,
        "heavy_sketch": lambda: text_analysis.cms_heavy_hitters(
            toks, "token", sample_rate=0.001, sample_key_cols=("v",)
        ).count(),
        "heavy_exact": exact_heavy,
    }
    for name, fn in pairs.items():  # untimed warm-up
        fn()
    detail = meter_ops(pairs, reps, floor)

    out = {"n_rows": n, "vocab": vocab, "pairs": {}}
    for name, rs in detail.items():
        out["pairs"][name] = {"best_sec": best_accepted_wall(rs), "reps": rs}
    # non-default n_rows or vocab get their own file — a 1M-row probe must
    # not clobber the committed 20M-row baseline BENCH/BASELINE.md cites
    suffix = "" if vocab == 65536 else f"_v{vocab}"
    if n_rows != 20_000_000:
        suffix += f"_n{n_rows}"
    with open(os.path.join(REPO, "BENCH",
                           f"sketch_scale{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
