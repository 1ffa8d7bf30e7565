"""Physical-plan audit of the catalog queries: dump .explain('formatted')
for each headline query and check scale hygiene —

- parquet scans carry PushedFilters / pruned ReadSchema where expected,
- relational operators run inside WholeStageCodegen,
- dimension joins are BroadcastHashJoin,
- no row-at-a-time Python (BatchEvalPython) anywhere; Arrow nodes only.

Writes PLANS.md at the repo root. Driver-side only (no job execution).

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from multilingual_wiki_event_pipeline_spark.catalog import (  # noqa: E402
    EXTRA_QUERIES, QUERIES,
)
from multilingual_wiki_event_pipeline_spark.session import get_spark  # noqa: E402

AUDITED = [
    "a1_incident_grouping", "a2_dedup_window", "a3_collection_stats",
    "f2_ref_text_filter", "j2_dimension_join", "j7_interval_containment",
    "w5_sessionize", "triples_events", "knn_cosine", "dedup_minhash_pairs",
    "lang_id_profile", "embed_cosine_neardup", "dedup_simhash_pairs",
    "mention_link_rank", "participant_triples", "a3_full_stats",
    "f5f6f7_crawl_filters", "ann_multiprobe", "sparql_bgp",
    "bm25_rank", "pii_redact", "repetition_stats", "decontaminate",
    "chunk_docs", "pack_boundary", "pack_firstfit", "mixture_weighted",
    "vocab_build", "sample_exact", "dup_spans", "dup_span_removal",
    "unigram_quality", "sample_stratified", "hll_token_distinct",
    "cms_hot_tokens", "quantile_doclen", "bloom_semijoin",
    "dedup_prefix_pairs", "rollup_stats", "pivot_lang_matrix",
    "zorder_layout", "quality_classifier", "bigram_quality",
    "semantic_dedup_keep", "mixture_temperature_lang",
    "gapfill_user_state", "scd2_user_state", "rolling_user_activity",
    "sem_dedup_lsh",
]

CHECKS = {
    "f2_ref_text_filter": ["PushedFilters"],
    "j2_dimension_join": ["BroadcastHashJoin", "WholeStageCodegen"],
    "a3_collection_stats": ["HashAggregate", "WholeStageCodegen"],
    "triples_events": ["Union", "WholeStageCodegen"],
    "knn_cosine": ["BroadcastNestedLoopJoin", "WholeStageCodegen"],
    "participant_triples": ["WholeStageCodegen"],
    "mention_link_rank": ["Window", "WholeStageCodegen"],
    "a3_full_stats": ["HashAggregate"],
    "f5f6f7_crawl_filters": ["WholeStageCodegen"],
    # distributed partial top-k (no global sort, no 1-partition window)
    "bm25_rank": ["TakeOrderedAndProject", "WholeStageCodegen"],
    # curation trio: pure per-row codegen (pii/repetition); the
    # decontamination eval-fingerprint join must be broadcast
    "pii_redact": ["WholeStageCodegen"],
    "repetition_stats": ["WholeStageCodegen"],
    "decontaminate": ["BroadcastHashJoin", "HashAggregate"],
    # training-prep: chunking is map-only explode; the packers' joins are
    # broadcast (bucket-prefix frame / mixture-rate dim); greedy packing
    # runs as ONE grouped Arrow node, never row-at-a-time Python
    "chunk_docs": ["Generate", "WholeStageCodegen"],
    "pack_boundary": ["BroadcastHashJoin", "Window"],
    "pack_firstfit": ["FlatMapGroupsInPandas"],
    "mixture_weighted": ["BroadcastHashJoin", "WholeStageCodegen"],
    # the vocab rank must stay the distributed zipWithIndex: offsets join
    # back broadcast. (The range exchange itself is invisible here — it
    # sits behind the correctness-pinning localCheckpoint, whose plan the
    # final explain shows as a scan; building this query runs that small
    # eager-checkpoint job.)
    "vocab_build": ["BroadcastHashJoin"],
    # exact-size sampling must stay a distributed partial top-k, like
    # bm25_rank — never a global sort
    "sample_exact": ["TakeOrderedAndProject"],
    # unigram scoring is agg + equi-join + agg, all codegen'd; the 1-row
    # corpus total joins broadcast
    "unigram_quality": ["HashAggregate", "WholeStageCodegen"],
    # per-group top-k must stay the salted two-phase windows
    "sample_stratified": ["Window", "WholeStageCodegen"],
    # the sketch is partial+final max-agg over registers
    "hll_token_distinct": ["HashAggregate", "WholeStageCodegen"],
    # model inference = a broadcast weight-table join, never a UDF
    "quality_classifier": ["BroadcastHashJoin", "HashAggregate"],
    # bigram pairs are array expressions + equi joins, all codegen'd
    "bigram_quality": ["HashAggregate", "WholeStageCodegen"],
    # the corpus-derived rate spec must join back as a broadcast dim
    "mixture_temperature_lang": ["BroadcastHashJoin", "WholeStageCodegen"],
    # calendar densification is a sequence explode (Generate), LOCF is
    # window passes — never a per-row UDF or driver loop
    "gapfill_user_state": ["Generate", "Window"],
    # the collapse + close are two window passes over ONE key shuffle
    "scd2_user_state": ["Window", "WholeStageCodegen"],
    # daily pre-agg (partial+final) must come BEFORE the range window
    "rolling_user_activity": ["HashAggregate", "Window"],
}

# per-query plan shapes that must NOT appear: the pigeonhole-blocked
# simhash pair join is an EQUI join on (lang, block_idx, block_bits) —
# a nested-loop/cartesian node would mean the O(n^2) pair enumeration
# came back. knn_cosine is the documented exact tier and exempt.
FORBIDDEN_PER = {
    "dedup_simhash_pairs": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    "dedup_minhash_pairs": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    # longest-match resolution is a window since round 3 — any join beyond
    # the detection equi-joins (SortMergeJoin on a self-joined match set)
    # reappearing here would mean the quadratic containment anti-join came
    # back.
    "mention_link_rank": ["BroadcastNestedLoopJoin", "CartesianProduct",
                          "LeftAnti"],
    # the probe fan-out must stay an equi-join on the probed bucket key —
    # a nested-loop node here would mean candidates stopped being bucketed
    "ann_multiprobe": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    # the within-cell pair check must stay EQUI on cell — a cartesian
    # node would mean the N^2 pair enumeration escaped its cells. (The
    # BroadcastNestedLoopJoin of the dimension-sized centroid assign is
    # the allowed exception, so only CartesianProduct is forbidden.)
    "semantic_dedup_keep": ["CartesianProduct"],
    # the LSH tier has NO centroid pass at all: neither join node may
    # appear beyond the bucket equi-join
    "sem_dedup_lsh": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    # BGP compilation rejects disconnected pattern groups up front, so a
    # cartesian in the compiled plan would mean that guard regressed
    "sparql_bgp": ["CartesianProduct"],
    # tf must stay map-side array expressions — a Generate (explode) node
    # would mean the quadratic inverted-index build crept in (the 1-row
    # broadcast stats crossJoin is the allowed BroadcastNestedLoopJoin)
    "bm25_rank": ["Generate", "CartesianProduct"],
    # corpus×eval n-gram overlap must stay a bucketed equi-join on the
    # n-gram hash — a nested-loop node would mean the quadratic
    # doc-pair comparison came back
    "decontaminate": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    # chunking must never shuffle — it is per-row window arithmetic
    "chunk_docs": ["Exchange"],
    # the corpus side of boundary packing joins the TINY bucket-prefix
    # frame; a sort-merge join would mean the fact table shuffled for it
    "pack_boundary": ["SortMergeJoin", "CartesianProduct"],
    "mixture_weighted": ["SortMergeJoin", "CartesianProduct"],
    # the duplicate-span corpus-total join must stay an equi-join on the
    # md5 window key — a nested-loop node would mean window-pair
    # enumeration (the quadratic shape the operator exists to avoid)
    "dup_spans": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    "dup_span_removal": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    # the occurrence->vocab join must stay an equi-join on token (the
    # 1-row corpus-total crossJoin is the allowed broadcast nested loop)
    "unigram_quality": ["CartesianProduct", "SortMergeJoin"],
    # registers->exact join is an equi-join on the group key
    "hll_token_distinct": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    # candidate->cell lookups and candidate->exact counts are broadcast
    # equi-joins; the cut is a distributed partial top-k
    "cms_hot_tokens": ["CartesianProduct", "SortMergeJoin"],
    # bucket histogram + window cumsum; the q-dim crossJoin is the
    # allowed broadcast against a 3-row frame — never a cartesian
    "quantile_doclen": ["CartesianProduct"],
    # bloom probe joins the tiny word table broadcast; a sort-merge here
    # would mean the fact side shuffled for a <=128-row filter
    "bloom_semijoin": ["CartesianProduct", "SortMergeJoin"],
    # grouping sets must expand inside ONE aggregate — a Union node would
    # mean the three-scan self-union came back
    "rollup_stats": ["Union", "CartesianProduct"],
    # the layout key is straight-line per-row arithmetic — any Exchange
    # would mean the key computation started shuffling
    "zorder_layout": ["Exchange", "CartesianProduct"],
}

FORBIDDEN = re.compile(r"BatchEvalPython")  # row-at-a-time Python UDF


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="mwep-explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    sections, problems = [], []
    for name in AUDITED:
        df = {**QUERIES, **EXTRA_QUERIES}[name](spark, sf_dir)
        qe = df._jdf.queryExecution()
        plan = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
        # AQE's pre-execution formatted plan hides codegen stage markers;
        # codegen mode prints "Found N WholeStageCodegen subtrees".
        codegen = df._sc._jvm.PythonSQLUtils.explainString(qe, "codegen")
        both = plan + codegen
        if FORBIDDEN.search(both):
            problems.append(f"{name}: row-at-a-time Python UDF (BatchEvalPython) in plan")
        for needle in CHECKS.get(name, []):
            if needle not in both:
                problems.append(f"{name}: expected `{needle}` in physical plan")
        for needle in FORBIDDEN_PER.get(name, []):
            if needle in both:
                problems.append(f"{name}: forbidden `{needle}` in physical plan")
        found = next(
            (ln for ln in codegen.splitlines() if "WholeStageCodegen subtree" in ln),
            "Found 0 WholeStageCodegen subtrees.",
        )
        sections.append(f"## {name}\n\n{found.strip()}\n\n```\n{plan.strip()}\n```\n")

    header = [
        "# PLANS — physical-plan audit (generated by tools/explain_audit.py)",
        "",
        f"Scale factor dir: `{sf_dir}`. Checks: filter pushdown reaches the",
        "parquet scan, whole-stage codegen spans the relational operators,",
        "dimension joins broadcast, and no `BatchEvalPython` (row-at-a-time",
        "Python) appears anywhere — Python runs only as Arrow-batched",
        "`ArrowEvalPython` / `MapInPandas` / `FlatMapGroupsInPandas` nodes.",
        "",
        "## Audit result",
        "",
        "All checks passed." if not problems else
        "PROBLEMS:\n" + "\n".join(f"- {p}" for p in problems),
        "",
    ]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(header) + "\n" + "\n".join(sections))
    print("problems:", problems or "none")


if __name__ == "__main__":
    main()
