"""Quality-scoring-tier scale measurement: unigram LM, bigram LM, and
linear-classifier inference on a corpus whose token volume makes the
count shuffles and the weight join the costs that matter. Same
boundary-sentinel noise metering as bench.py / bench_temporal.py.

Fixture: deterministic synthetic documents (no disk) — spark.range over
doc ids, each doc a 40-token string drawn from a zipf-ish md5-folded
vocabulary (25% of tokens collapse onto the hot word, mirroring
bench_sketches' stream). The classifier weight table is one row per
vocabulary word with an md5-derived micro-weight — the same stand-in
model the catalog entry uses, at full vocabulary size.

Usage: python tools/bench_quality.py [n_docs] [--reps N] [--vocab N]
Writes BENCH/quality_scale.json (non-default n_docs suffixes the
filename); prints one JSON line.
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

TOKENS_PER_DOC = 40


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 500_000
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    vocab = 65536
    if "--vocab" in sys.argv:
        vocab = int(sys.argv[sys.argv.index("--vocab") + 1])

    sweep_stale_scratch()
    floor = calibrate()

    from pyspark.sql import functions as F

    from multilingual_wiki_event_pipeline_spark.functions.hashing import md5_u32
    from multilingual_wiki_event_pipeline_spark.operators import curation
    from multilingual_wiki_event_pipeline_spark.session import get_spark

    spark = get_spark(app_name="mwep-bench-quality")
    spark.sparkContext.setLogLevel("ERROR")

    # 40 tokens/doc: transform over sequence, token = md5(doc:i)-folded
    # zipf-ish id (25% collapse onto the hot word)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.expr(
                f"""transform(sequence(1, {TOKENS_PER_DOC}), i ->
                CASE WHEN conv(substring(md5(concat(CAST(id AS STRING),
                     ':', CAST(i AS STRING))), 9, 2), 16, 10) % 4 = 0
                THEN 't0'
                ELSE concat('t', CAST(
                  conv(substring(md5(concat(CAST(id AS STRING), ':',
                       CAST(i AS STRING))), 1, 7), 16, 10)
                  % {vocab} AS STRING)) END)"""
            ),
            " ",
        ).alias("text"),
    ).localCheckpoint()
    n_tokens = n_docs * TOKENS_PER_DOC

    weights = spark.range(vocab).select(
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("token"),
        (md5_u32(F.concat(F.lit("qw:t"), F.col("id").cast("string")))
         % 2000001 - 1000000).alias("w_micro"),
    ).localCheckpoint()

    ops = {
        "unigram_logprob": lambda: curation.unigram_logprob(docs).count(),
        "bigram_logprob": lambda: curation.bigram_logprob(docs).count(),
        "classifier_score": lambda: curation.classifier_score(
            docs, weights).count(),
    }
    rows_out: dict[str, int] = {k: fn() for k, fn in ops.items()}  # warm-up
    detail = meter_ops(ops, reps, floor)

    out = {"n_docs": n_docs, "n_tokens": n_tokens, "vocab": vocab, "ops": {}}
    for name, rs in detail.items():
        best = best_accepted_wall(rs)
        out["ops"][name] = {
            "best_sec": best,
            "rows_out": rows_out[name],
            "tokens_per_sec": round(n_tokens / best),
            "reps": rs,
        }
    # non-default n_docs OR vocab get their own file — a probe must not
    # clobber the committed baseline BASELINE.md cites
    suffix = "" if n_docs == 500_000 else f"_n{n_docs}"
    if vocab != 65536:
        suffix += f"_v{vocab}"
    with open(os.path.join(REPO, "BENCH",
                           f"quality_scale{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
