#!/usr/bin/env python
"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Also reports turns/sec for the end-to-end KG pipeline (the BASELINE.md
headline metric) on a deterministic synthetic transcript corpus sized to
the scale factor. The two-parallelism scaling run lives in
tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multilingual_wiki_event_pipeline_spark import datagen  # noqa: E402
from multilingual_wiki_event_pipeline_spark.catalog import QUERIES  # noqa: E402
from multilingual_wiki_event_pipeline_spark.plans import pipeline  # noqa: E402
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402
from multilingual_wiki_event_pipeline_spark.sinks import CheckpointStore  # noqa: E402
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables  # noqa: E402

# Representative subset of the catalog: one per operator family, heaviest
# variants preferred (full list runs in tools/check_oracle.py at sf0.01).
HEADLINE = [
    "a1_incident_grouping",    # hash agg w/ collect_set
    "a2_dedup_window",         # ranking-window dedup
    "a3_collection_stats",     # stats battery (TPC-H Q1 shape)
    "j2_dimension_join",       # broadcast dim joins + shuffle join
    "j7_interval_containment", # non-equi interval join
    "j10_transitive_closure",  # iterative closure
    "w5_sessionize",           # lag + running sum windows
    "triples_events",          # K3 triple emitter (4-way union, one scan)
    "dedup_minhash_pairs",     # MinHash+LSH candidate pairs
    "dedup_simhash_pairs",     # SimHash hamming pairs
    "knn_cosine",              # brute-force cosine top-k
    "lang_id_profile",         # n-gram language ID
    "quality_score",           # text quality metrics
    "fingerprint",             # rolling-hash fingerprint
    "mention_link_rank",       # gazetteer detection + ranked linking (r2)
    "canonicalize_components", # minhash-candidate CC canonicalization (r2)
    "j10_incident_ancestors",  # ontology closure + ancestor expansion (r2)
]

# KG-pipeline corpus size per sf of the operator tables (sf0.1 ~ 600k
# lineitem rows -> 600 incidents ~ 160k turns).
N_INCIDENTS = {"0.001": 30, "0.01": 120, "0.1": 600}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    spark = get_spark(app_name="mwep-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm file listing + JIT once
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    # End-to-end KG pipeline: corpus generation is NOT timed; the timed
    # section is ingest -> filters -> mentions -> linking -> corefs -> triples.
    # Methodology (diagnosed round 3 — the r2 18->30 s "regression" was a
    # single COLD run measured right after a headline list that had just
    # grown by several heavy queries): (1) the KG section runs in a FRESH
    # SparkSession so accumulated headline-query state (python workers,
    # broadcasts, GC debt) can't leak into the measurement; (2) one untimed
    # warm-up rep absorbs JIT/codegen + Arrow-worker startup — the same
    # warm-once-then-time protocol the headline queries above already use;
    # (3) >= 3 timed reps, all reported, best counted (this shared-VM host
    # swings 1.5-5x one-sided). Cold-vs-warm measured at sf0.1: 70 s cold,
    # 13.7 s warm — the warm figure is the design-point signal (at 10^12
    # turns the one-time JIT/worker startup is amortized to nothing).
    spark.stop()
    spark = get_spark(app_name="mwep-bench-kg")
    spark.sparkContext.setLogLevel("ERROR")
    n_inc = N_INCIDENTS.get(sf, 120)
    # clamp to >= 1: zero reps would leave rep_secs empty (min() raises)
    # and the counts would come only from the untimed warm-up (ADVICE r3)
    n_reps = max(1, int(os.environ.get("SPARK_GRAFT_KG_REPS", "3")))
    out = tempfile.mkdtemp(prefix="mwep_bench_corpus_")
    rep_secs: list[float] = []
    best_stage_wall: dict[str, float] = {}
    try:
        datagen.generate_to_dir(out, n_incidents=n_inc, seed=42)
        t = CorpusTables(spark, out)
        n_turns = t.transcripts.count()
        for _rep in range(n_reps + 1):  # rep 0 = untimed warm-up
            ckpt = tempfile.mkdtemp(prefix="mwep_bench_ckpt_")
            try:
                t0 = time.perf_counter()
                # production path: stage boundaries materialized to the
                # checkpoint store (resumable, lineage, plan truncation).
                o = pipeline.build(t, store=CheckpointStore(spark, ckpt))
                n_triples = o.full_triples.count() + o.pilot_triples.count()
                n_mentions = o.mentions.count()
                sec = round(time.perf_counter() - t0, 3)
                if _rep == 0:
                    continue  # warm-up: absorbs JIT/codegen/worker startup
                if not rep_secs or sec < min(rep_secs):
                    import pyarrow.parquet as pq

                    best_stage_wall = {}
                    ldir = os.path.join(ckpt, "_lineage")
                    for fn in os.listdir(ldir):
                        lt = pq.read_table(
                            os.path.join(ldir, fn), columns=["stage", "wall_sec"]
                        )
                        for s, w in zip(
                            lt["stage"].to_pylist(), lt["wall_sec"].to_pylist()
                        ):
                            best_stage_wall[s] = w
                rep_secs.append(sec)
            finally:
                shutil.rmtree(ckpt, ignore_errors=True)
        kg_sec = min(rep_secs)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    timings["kg_pipeline"] = kg_sec

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg_turns": n_turns,
        "kg_triples": n_triples,
        "kg_mentions": n_mentions,
        "kg_turns_per_sec": round(n_turns / kg_sec, 1) if kg_sec else None,
        "kg_rep_secs": rep_secs,
        "kg_stage_wall_sec": best_stage_wall,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }))


if __name__ == "__main__":
    main()
