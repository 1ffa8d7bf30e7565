#!/usr/bin/env python
"""Dump .explain('formatted') for headline catalog entries to a directory.

Usage: python tools/dump_plans.py <outdir> [sf_dir] [query ...]
Driver-side only (no jobs run) — used to archive before/after plan shapes
for the optimization rounds (plans/r06/<query>_{before,after}.txt).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from multilingual_wiki_event_pipeline_spark.catalog import (  # noqa: E402
    EXTRA_QUERIES, QUERIES,
)

ALL_QUERIES = {**EXTRA_QUERIES, **QUERIES}
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "a1_incident_grouping", "a2_dedup_window", "a3_collection_stats",
    "j2_dimension_join", "j7_interval_containment", "j10_transitive_closure",
    "w5_sessionize", "triples_events", "dedup_minhash_pairs",
    "dedup_simhash_pairs", "knn_cosine", "lang_id_profile", "quality_score",
    "fingerprint", "mention_link_rank", "canonicalize_components",
    "j10_incident_ancestors", "sparql_bgp", "graph_pagerank",
]


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or HEADLINE
    os.makedirs(outdir, exist_ok=True)
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    spark = get_spark(app_name="mwep-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = ALL_QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
