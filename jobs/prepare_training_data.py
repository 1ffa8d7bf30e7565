"""Cluster entry point for the LLM training-data preparation pipeline.

Chains the engine's curation / dedup / packing operators end-to-end over a
``documents(doc_id, text, lang, source, ...)`` table — the trainer-facing
sibling of jobs/run_pipeline.py (the KG job), with the same contract:
every stage boundary materialized to a CheckpointStore (resumable after
failure; re-runs skip complete stages), per-partition lineage rows, and a
counters table recording the survivor count of every gate.

    spark-submit --py-files mwep_spark.zip jobs/prepare_training_data.py \
      --input /path/documents.parquet --checkpoint /path/ckpt \
      --output /path/prepared \
      [--eval-set /path/eval_docs.parquet]      # n-gram decontamination
      [--rates '{"web": 0.5, "wiki": 1.0}']      # mixture spec (JSON)
      [--temperature 0.7 --target-total 100000]  # OR corpus-derived rates
      [--classifier-weights /path/w.parquet]     # model-based quality gate
      [--embeddings /path/emb.parquet]           # SemDeDup semantic dedup
      [--pack boundary|greedy|none] [--budget 2048] [--build-vocab]

Stages (each a checkpoint boundary):

1. ``s1_clean`` — quality gate (composite lexical score >= --min-quality,
   Gopher repetition flag off; with ``--classifier-weights`` additionally
   the fastText-style linear head: mean per-token micro-logit under the
   provided ``(token, w_micro)`` table >= --min-logit) then PII
   redaction; text is replaced by the redacted form.
2. ``s2_dedup`` — exact dedup (keep min doc_id per content hash), MinHash
   LSH candidates verified by exact Jaccard on candidates only, dropping
   the LARGER id of every verified near-dup pair (deterministic greedy —
   keeps a superset of one-per-component; full transitive canonicalization
   is operators/canonicalize.py), then optional ExactSubstr span removal
   (``--exactsubstr-n N``: tokens covered by non-first occurrences of
   duplicated N-token windows are deleted, Lee et al. 2022; docs emptied
   by the rewrite are dropped), then optional SemDeDup semantic dedup
   when ``--embeddings`` points at a ``(vec_id, embedding)`` table keyed
   by doc_id (k-means cells trained in-job, within-cell keep-min-id at
   --sem-threshold), then optional n-gram decontamination against
   --eval-set (checked against the post-rewrite text).
3. ``s3_final`` — optional deterministic mixture sampling (md5 coin, so a
   re-run keeps the identical sample): either the fixed --rates spec or
   corpus-derived --temperature flattening (n^alpha shares, keep-all
   caps; mutually exclusive), the final corpus written partitioned by
   source.
4. ``packed`` — optional sequence packing manifest: ``boundary``
   (GPT-style split-at-budget) or ``greedy`` (SFT-style no-split
   first-fit), plus an optional frequency-ranked vocabulary.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> dict[str, int]:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--checkpoint", required=True, help="checkpoint-store root")
    ap.add_argument("--output", required=True, help="prepared-corpus output root")
    ap.add_argument("--eval-set", default=None,
                    help="eval/benchmark documents parquet for decontamination")
    ap.add_argument("--rates", default=None,
                    help='JSON mixture spec, e.g. \'{"web": 0.5}\'')
    ap.add_argument("--mix-seed", default="mix")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--temperature", type=float, default=None,
                    help="derive mixture rates from corpus group counts "
                         "(n^alpha shares, keep-all caps); mutually "
                         "exclusive with --rates")
    ap.add_argument("--target-total", type=int, default=None,
                    help="expected output size for --temperature")
    ap.add_argument("--mix-group", default="source",
                    help="grouping column for --temperature")
    ap.add_argument("--classifier-weights", default=None,
                    help="(token, w_micro) parquet: linear quality head "
                         "applied as a broadcast join in stage 1")
    ap.add_argument("--min-logit", type=float, default=0.0,
                    help="mean micro-logit cut (in plain units) for "
                         "--classifier-weights")
    ap.add_argument("--embeddings", default=None,
                    help="(vec_id, embedding) parquet keyed by doc_id: "
                         "SemDeDup semantic dedup in stage 2")
    ap.add_argument("--sem-threshold", type=float, default=0.85)
    ap.add_argument("--sem-cells", type=int, default=64)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--jaccard", type=float, default=0.9)
    ap.add_argument("--decontam-n", type=int, default=8)
    ap.add_argument("--exactsubstr-n", type=int, default=0,
                    help="remove spans covered by non-first occurrences of "
                         "duplicated N-token windows (0 = off)")
    ap.add_argument("--pack", default="boundary",
                    choices=["boundary", "greedy", "none"])
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--build-vocab", action="store_true")
    ap.add_argument("--vocab-min-count", type=int, default=2)
    ap.add_argument("--bpe-merges", type=int, default=0,
                    help="train N BPE merge rules on the final corpus and "
                         "write rules + per-word segmentation under "
                         "<output>/bpe (0 = off)")
    ap.add_argument("--telemetry", action="store_true",
                    help="write corpus-health sketches over the final "
                         "corpus under <output>/telemetry: per-source HLL "
                         "distinct-token estimates, Count-Min hot tokens, "
                         "and doc-length quantiles (p50/p90/p99)")
    args = ap.parse_args(argv)

    # imports AFTER spark-submit has the --py-files zip on sys.path
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import multilingual_wiki_event_pipeline_spark as pkg
    from multilingual_wiki_event_pipeline_spark.operators import (
        curation,
        text_analysis,
        text_dedup,
        training_prep,
    )
    from multilingual_wiki_event_pipeline_spark.sinks import CheckpointStore

    # CLI validation BEFORE the session spins up: a bad flag combination
    # must fail in milliseconds, not after cluster allocation
    rates = json.loads(args.rates) if args.rates else None
    if rates is not None and args.temperature is not None:
        raise SystemExit("--rates and --temperature are mutually exclusive")
    if args.temperature is not None and args.target_total is None:
        raise SystemExit("--temperature requires --target-total")
    if args.mix_group not in ("lang", "source"):
        # mixture_temperature projects (doc_id, lang, source); any other
        # group column would fail only at stage 3, hours into the run
        raise SystemExit("--mix-group must be 'lang' or 'source'")
    if args.bpe_merges < 0:
        raise SystemExit("--bpe-merges must be >= 0")

    spark = SparkSession.builder.appName("mwep-prepare-training-data").getOrCreate()
    store = CheckpointStore(
        spark,
        args.checkpoint,
        fingerprint=CheckpointStore.params_fingerprint(
            code_version=pkg.__version__,
            input=args.input,
            eval_set=args.eval_set,
            rates=rates,
            mix_seed=args.mix_seed,
            default_rate=args.default_rate,
            min_quality=args.min_quality,
            jaccard=args.jaccard,
            decontam_n=args.decontam_n,
            exactsubstr_n=args.exactsubstr_n,
            temperature=args.temperature,
            target_total=args.target_total,
            mix_group=args.mix_group,
            classifier_weights=args.classifier_weights,
            min_logit=args.min_logit,
            embeddings=args.embeddings,
            sem_threshold=args.sem_threshold,
            sem_cells=args.sem_cells,
        ),
    )
    counters: dict[str, int] = {}

    def count(metric: str, n: int) -> None:
        counters[metric] = n
        store.add_counter("curate", metric, n)

    docs = spark.read.parquet(args.input)
    count("input_docs", docs.count())

    # -- stage 1: quality gate + PII redaction ------------------------------
    # plans are built lazily; materialize() skips the compute entirely when
    # the boundary is already complete (resume) and serves the stored frame
    q = text_analysis.quality_score(docs).select("doc_id", "quality")
    rep = curation.repetition_stats(docs).select("doc_id", "repetitive")
    kept = (
        docs.join(q, "doc_id")
        .join(rep, "doc_id")
        .filter((F.col("quality") >= args.min_quality) & ~F.col("repetitive"))
    )
    if args.classifier_weights:
        scores = curation.classifier_score(
            kept, spark.read.parquet(args.classifier_weights)
        )
        # anti-join on FAILERS: a zero-token doc has no score row (no
        # tokens to explode) and must pass through like the
        # no-classifier path, not silently vanish from a semi-join
        kept = kept.join(
            scores.filter(F.col("avg_logit") < args.min_logit)
            .select("doc_id"),
            "doc_id", "left_anti",
        )
        # intra-stage-1 figure, upstream of after_quality_gate (which
        # counts the full s1 boundary: lexical gate + this gate + redact);
        # skipped on resume — counting it would re-execute the scoring
        # scan the complete s1 boundary otherwise avoids
        if not store.is_complete("s1_clean"):
            count("classifier_gate_survivors", kept.count())
    clean = store.materialize(
        curation.redact_pii(kept)
        .select("doc_id", F.col("redacted").alias("text"))
        .join(kept.select("doc_id", "lang", "source"), "doc_id"),
        "s1_clean",
    )
    count("after_quality_gate", clean.count())

    # -- stage 2: dedup (+ optional decontamination) ------------------------
    keepers = text_dedup.exact_dedup(clean).select(
        F.col("keeper_id").alias("doc_id")
    )
    uniq = clean.join(keepers, "doc_id", "left_semi")
    near = text_dedup.jaccard_on_candidates(
        uniq, text_dedup.minhash_candidate_pairs(uniq),
        threshold=args.jaccard,
    )
    # greedy near-dup drop: the larger id of every verified pair goes.
    # Deterministic; keeps a superset of one-doc-per-component (full
    # transitive canonicalization is operators/canonicalize.py).
    losers = near.select(F.col("b_id").alias("doc_id")).distinct()
    deduped = uniq.join(losers, "doc_id", "left_anti")
    if args.exactsubstr_n:
        rewritten = text_dedup.remove_duplicate_spans(
            deduped, n=args.exactsubstr_n
        )
        count(
            "exactsubstr_removed_tokens",
            rewritten.agg(F.sum("n_removed_tokens")).collect()[0][0] or 0,
        )
        deduped = deduped.select("doc_id", "lang", "source").join(
            rewritten.filter(F.length("clean_text") > 0)
            .select("doc_id", F.col("clean_text").alias("text")),
            "doc_id",
        )
    if args.eval_set:
        flags = curation.ngram_decontaminate(
            deduped, spark.read.parquet(args.eval_set), n=args.decontam_n
        )
        deduped = deduped.join(
            flags.filter(~F.col("contaminated")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    deduped = store.materialize(deduped, "s2_dedup")
    count("after_dedup", deduped.count())

    # -- stage 2b (optional): SemDeDup semantic dedup -----------------------
    # its own boundary AFTER s2_dedup so (a) resume skips the in-job
    # k-means training and the within-cell self-join entirely (both are
    # eager via localCheckpoint and would otherwise run at plan-build
    # time even for a complete stage), and (b) the kept/dropped decision
    # is computed among SURVIVORS only — an embedding whose document an
    # earlier gate already removed must not drag down its semantic
    # neighbors (keep-min-id would delete every copy of that content).
    if args.embeddings:
        if store.is_complete("s2b_semantic"):
            deduped = store.materialize(deduped, "s2b_semantic")
        else:
            from multilingual_wiki_event_pipeline_spark.operators import (
                similarity,
            )

            emb = spark.read.parquet(args.embeddings).join(
                deduped.select(F.col("doc_id").alias("vec_id")),
                "vec_id", "left_semi",
            )
            # coverage guard: survivors missing an embedding row cannot
            # be assessed; they pass through (the drop below is an
            # anti-join on DROPPED ids) but the gap is surfaced
            count(
                "docs_without_embedding",
                deduped.join(
                    emb.select(F.col("vec_id").alias("doc_id")),
                    "doc_id", "left_anti",
                ).count(),
            )
            cents = similarity.kmeans_centroids(
                emb, k=args.sem_cells, n_iters=2)
            sem_dropped = (
                similarity.semantic_dedup(emb, cents, args.sem_threshold)
                .filter("NOT kept")
                .select(F.col("vec_id").alias("doc_id"))
            )
            deduped = store.materialize(
                deduped.join(sem_dropped, "doc_id", "left_anti"),
                "s2b_semantic",
            )
        count("after_semantic_dedup", deduped.count())

    # -- stage 3: mixture sampling + final corpus ---------------------------
    if rates is not None:
        sample = training_prep.mixture_sample(
            deduped, rates, seed=args.mix_seed,
            default_rate=args.default_rate,
        ).select("doc_id")
        final = deduped.join(sample, "doc_id", "left_semi")
    elif args.temperature is not None:
        sample = training_prep.mixture_temperature(
            deduped, alpha=args.temperature,
            target_total=args.target_total,
            group_col=args.mix_group, seed=args.mix_seed,
        ).select("doc_id")
        final = deduped.join(sample, "doc_id", "left_semi")
    else:
        final = deduped
    final = store.materialize(final, "s3_final")
    count("final_docs", final.count())
    final.write.mode("overwrite").partitionBy("source").parquet(
        f"{args.output}/corpus"
    )

    # -- stage 4: packing manifest + vocabulary -----------------------------
    if args.pack == "boundary":
        packed = training_prep.pack_sequences(final, budget=args.budget)
        packed.write.mode("overwrite").parquet(f"{args.output}/packed")
        count("train_sequences",
              packed.agg(F.count_distinct("seq_id")).collect()[0][0])
        count("packed_tokens",
              packed.agg(F.sum("n_toks")).collect()[0][0])
    elif args.pack == "greedy":
        packed = training_prep.pack_greedy(final, budget=args.budget)
        packed.write.mode("overwrite").parquet(f"{args.output}/packed")
        count("train_sequences",
              packed.select("part", "bin_idx").distinct().count())
        count("packed_tokens",
              packed.agg(F.sum("n_toks")).collect()[0][0])
    if args.build_vocab:
        vocab = text_analysis.build_vocab(
            final, min_count=args.vocab_min_count
        )
        vocab.write.mode("overwrite").parquet(f"{args.output}/vocab")
        count("vocab_size", vocab.count())
    if args.bpe_merges:
        from multilingual_wiki_event_pipeline_spark.operators import bpe

        # the trainer's final state IS the corpus segmentation — no
        # second corpus pass; the symbol counter reads the WRITTEN
        # parquet back so the segmentation plan executes exactly once
        merges, state = bpe.bpe_train_state(final, n_merges=args.bpe_merges)
        merges.write.mode("overwrite").parquet(f"{args.output}/bpe/merges")
        seg_path = f"{args.output}/bpe/word_segments"
        bpe.segment_state(state).write.mode("overwrite").parquet(seg_path)
        count("bpe_rules", merges.count())
        count("bpe_symbols",
              spark.read.parquet(seg_path)
              .agg(F.sum("n_symbols")).collect()[0][0] or 0)

    # -- stage 5 (optional): corpus-health telemetry ------------------------
    # the trainer-facing report card, SKETCH-ONLY variants throughout so
    # the sketch exchanges stay O(registers/buckets) per group, never
    # O(data): HLL registers + estimate (no exact countDistinct), the
    # exact-free quantile histogram (no in-group rank). CMS's exact
    # counts cover only its <= k-row candidate output. The exact-included
    # report variants (hll_distinct / with_exact=True) are for validation
    # runs, not production telemetry.
    if args.telemetry:
        toks = final.select(
            "source", "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda x: x != ""))
             .alias("token"),
        )
        regs = text_analysis.hll_registers(toks, "source", "token")
        text_analysis.hll_estimate(regs).select(
            F.col("g").alias("source"), "est_distinct"
        ).write.mode("overwrite").parquet(
            f"{args.output}/telemetry/distinct_tokens")
        hot = text_analysis.cms_heavy_hitters(
            toks, "token", sample_key_cols=("doc_id",))
        hot.write.mode("overwrite").parquet(
            f"{args.output}/telemetry/hot_tokens")
        lens = final.select(
            "source",
            F.size(F.filter(F.split("text", " "), lambda x: x != ""))
             .alias("n_tokens"),
        ).filter(F.col("n_tokens") > 0)
        text_analysis.log2_histogram_quantiles(
            lens, "source", "n_tokens", with_exact=False
        ).write.mode("overwrite").parquet(
            f"{args.output}/telemetry/doclen_quantiles")
        count("telemetry_hot_tokens", hot.count())
    return counters


if __name__ == "__main__":
    main(sys.argv[1:])
