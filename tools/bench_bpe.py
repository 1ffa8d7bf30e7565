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
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sentinel import REJECT_P75_RATIO, calibrate, sentinel_wall, sweep_stale_scratch  # noqa: E402


def build_docs(spark, n_words: int):
    """One row per word occurrence: word w_i = md5-hex prefix of length
    4 + (i % 8); occurrence count = 1 + (16 if i % 97 == 0 else 0) — a
    light zipf head so argmaxes are data-dependent, not uniform."""
    from pyspark.sql import functions as F

    base = spark.range(n_words).select(
        F.substring(
            F.md5(F.col("id").cast("string")), 1,
            (F.col("id") % 8 + 4).cast("int")
        ).alias("word"),
        F.when(F.col("id") % 97 == 0, F.lit(17)).otherwise(F.lit(1))
         .alias("n"),
    )
    return base.select(
        F.explode(F.expr("transform(sequence(1, n), i -> word)"))
        .alias("text")
    )


def main() -> None:
    pos, it = [], iter(sys.argv[1:])
    for a in it:
        if a.startswith("--"):
            next(it, None)
        elif a.isdigit():
            pos.append(int(a))
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

    docs = build_docs(spark, n_words).localCheckpoint()
    n_occurrences = docs.count()

    def train():
        return bpe.bpe_merges(docs, n_merges=n_merges).count()

    n_rules = train()  # warm-up
    detail: list[dict] = []
    for _ in range(reps):
        s0 = sentinel_wall()
        t0 = time.perf_counter()
        train()
        wall = round(time.perf_counter() - t0, 3)
        s1 = sentinel_wall()
        ratio = round(max(s0, s1) / floor, 3)
        detail.append({
            "wall_sec": wall, "sentinel_ratio": ratio,
            "accepted": ratio <= REJECT_P75_RATIO,
        })
    accepted = [r["wall_sec"] for r in detail if r["accepted"]] or [
        r["wall_sec"] for r in detail
    ]
    best = min(accepted)
    out = {
        "n_words": n_words, "n_occurrences": n_occurrences,
        "n_merges": n_merges, "n_rules": n_rules,
        "best_sec": best,
        "sec_per_round": round(best / n_merges, 3),
        "reps": detail,
    }
    with open(os.path.join(REPO, "BENCH", "bpe_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
