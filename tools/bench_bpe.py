"""BPE-trainer scale measurement: merge rounds over a large distinct-word
vocabulary — the claim under test is that each round costs one pair
explode + one tiny shuffle over the WORD table (corpus-size-independent),
so rounds stay seconds even at web-scale vocabulary sizes. Same
boundary-sentinel metering as the other tools.

Fixture: n distinct md5-derived words (length 4-11 chars over a 16-char
alphabet) with zipf-ish frequencies — no disk, no driver loop. The
trainer input is a documents frame whose one "text" column is the word
itself; frequencies are injected by repeating hot words via an explode
of a frequency-derived count (capped), preserving the weighted-count
semantics without materializing a corpus.

Usage: python tools/bench_bpe.py [n_words] [--merges N] [--reps N]
Writes BENCH/bpe_scale.json; prints one JSON line.
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


def build_docs(spark, n_words: int):
    """One row per word occurrence: word w_i = md5-hex prefix of length
    4 + (i % 8), suffixed with the id in hex so ALL n_words words are
    DISTINCT by construction (bare 4-char prefixes collide — only 65,536
    exist — which both shrank the real vocabulary ~8% and summed
    colliding frequencies); occurrence count = 1 + (16 if i % 97 == 0
    else 0) — a light zipf head so argmaxes are data-dependent."""
    from pyspark.sql import functions as F

    base = spark.range(n_words).select(
        F.concat(
            F.substring(
                F.md5(F.col("id").cast("string")), 1,
                (F.col("id") % 8 + 4).cast("int")
            ),
            F.lit("x"),
            F.conv(F.col("id").cast("string"), 10, 16),
        ).alias("word"),
        F.when(F.col("id") % 97 == 0, F.lit(17)).otherwise(F.lit(1))
         .alias("n"),
    )
    return base.select(
        F.explode(F.expr("transform(sequence(1, n), i -> word)"))
        .alias("text")
    )


def main() -> None:
    pos = positional_ints(sys.argv[1:])
    n_words = pos[0] if pos else 1_000_000
    n_merges = 20
    if "--merges" in sys.argv:
        n_merges = int(sys.argv[sys.argv.index("--merges") + 1])
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    sweep_stale_scratch()
    floor = calibrate()

    from multilingual_wiki_event_pipeline_spark.operators import bpe
    from multilingual_wiki_event_pipeline_spark.session import get_spark

    spark = get_spark(app_name="mwep-bench-bpe")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    docs = build_docs(spark, n_words).localCheckpoint()
    n_occurrences = docs.count()
    # MEASURED distinct vocabulary (the table the trainer operates on),
    # not the nominal fixture parameter
    n_distinct = docs.select(F.col("text").alias("w")).distinct().count()

    def train():
        return bpe.bpe_merges(docs, n_merges=n_merges).count()

    n_rules = train()  # warm-up
    detail = meter_ops({"train": train}, reps, floor)["train"]
    best = best_accepted_wall(detail)
    out = {
        "n_words_nominal": n_words, "n_distinct_words": n_distinct,
        "n_occurrences": n_occurrences,
        "n_merges": n_merges, "n_rules": n_rules,
        "best_sec": best,
        "sec_per_round": round(best / n_merges, 3),
        "reps": detail,
    }
    # non-default sizes get their own file — a probe must not clobber
    # the committed baseline BASELINE.md cites
    suffix = "" if n_words == 1_000_000 else f"_n{n_words}"
    if n_merges != 20:  # cost-model probes must not clobber the baseline
        suffix += f"_m{n_merges}"
    with open(os.path.join(REPO, "BENCH",
                           f"bpe_scale{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
