"""Mega-component skew fixture for connected-components canonicalization
(round-3 verdict task 8): turn the skew claim in ``canonicalize.py`` ("AQE
skew-join splitting handles the joins; the per-round min() partial-
aggregates map-side") into measured evidence.

Fixture (deterministic, spark.range — no files): one HOT ENTITY whose
similarity edges form a star of ``n_hot`` spokes (every edge carries the
hub key, so each label-propagation round's ``sym.b == labels.vertex`` join
concentrates ``n_hot`` rows on ONE shuffle key) plus ``n_background``
disjoint pair components. This is the similarity-graph analog of the
mega-conversation fixture in FIXTURES.md.

A/B: the SAME job with AQE skew-join splitting enabled vs disabled
(``spark.sql.adaptive.skewJoin.enabled``), thresholds lowered to
sandbox-scale partition sizes so the optimization can actually fire on a
few-hundred-MB fixture (at 100 TB the default 256 MB threshold fires on
its own). Interleaved reps, best + all walls reported, component counts
asserted equal.

Usage: python tools/bench_skew.py [n_hot] [n_background] [--reps R]
Writes BENCH/skew_megacomponent.md.
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

from multilingual_wiki_event_pipeline_spark.operators.canonicalize import (  # noqa: E402
    connected_components,
)
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402


def build_edges(spark, n_hot: int, n_background: int):
    """Star component around vertex 'hub' + disjoint background pairs."""
    hot = spark.range(n_hot).select(
        F.lit("hub").alias("src"),
        F.concat(F.lit("spoke_"), F.col("id")).alias("dst"),
    )
    bg = spark.range(n_background).select(
        F.concat(F.lit("a_"), F.col("id")).alias("src"),
        F.concat(F.lit("b_"), F.col("id")).alias("dst"),
    )
    return hot.unionByName(bg)


def run_once(spark, n_hot: int, n_background: int) -> tuple[float, int]:
    edges = build_edges(spark, n_hot, n_background)
    t0 = time.perf_counter()
    labels = connected_components(edges)
    n_components = labels.select("component").distinct().count()
    return time.perf_counter() - t0, n_components


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_hot", nargs="?", type=int, default=1_000_000)
    ap.add_argument("n_background", nargs="?", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="mwep-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # sandbox-scale thresholds so skew splitting CAN fire on a small
    # fixture; at production scale the defaults (256 MB) fire on their own
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    results: dict[str, dict] = {}
    # interleave ON/OFF reps so host drift cannot land on one config
    for config in ("skew_on", "skew_off"):
        results[config] = {"walls": [], "n_components": None}
    run_once(spark, 10, 10)  # warm-up: codegen + first-job setup
    for _rep in range(args.reps):
        for config in ("skew_on", "skew_off"):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if config == "skew_on" else "false",
            )
            wall, n_comp = run_once(spark, args.n_hot, args.n_background)
            r = results[config]
            r["walls"].append(round(wall, 2))
            assert r["n_components"] in (None, n_comp), (
                config, r["n_components"], n_comp
            )
            r["n_components"] = n_comp
            print(f"{config}: {wall:.2f}s ({n_comp} components)", flush=True)

    on, off = results["skew_on"], results["skew_off"]
    assert on["n_components"] == off["n_components"]
    md = f"""# BENCH — mega-component skew fixture (canonicalization)

Fixture: one hot-entity star of {args.n_hot:,} spokes (every edge hits the
hub's shuffle key each label-propagation round) + {args.n_background:,}
disjoint background pairs; {on['n_components']:,} components total.
AQE skew thresholds lowered to sandbox partition sizes (factor 2 / 4 MB /
2 MB advisory) so the splitting can fire at this fixture's size; at
production scale the stock 256 MB threshold fires unaided.

| config | best wall (s) | all reps (s) |
|---|---|---|
| AQE skew-join ON | {min(on['walls'])} | {on['walls']} |
| AQE skew-join OFF | {min(off['walls'])} | {off['walls']} |

Reps interleaved ON/OFF/ON/OFF. Identical component counts across
configs. The per-round aggregation (min over neighbor components) partial-
aggregates map-side regardless of the flag — the measured delta isolates
the skewed JOIN side, which is what `operators/canonicalize.py`'s skew
note claims AQE handles.

Reproduce: `python tools/bench_skew.py {args.n_hot} {args.n_background}`.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew_megacomponent.md"), "w") as f:
        f.write(md)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
