"""End-to-end test of jobs/prepare_training_data.py — the trainer-facing
pipeline (quality gate -> PII redact -> exact + near dedup ->
decontaminate -> mixture sample -> pack -> vocab) over the sf0.001
documents table, including checkpoint resume."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_prepare_training_data_end_to_end_and_resume(spark, tmp_path):
    from jobs.prepare_training_data import main

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    eval_set = str(tmp_path / "eval.parquet")
    # eval set: every 10th doc (same fixture shape as the decontaminate
    # catalog entry)
    docs = spark.read.parquet(DOCS)
    docs.filter("doc_id % 10 = 0").write.parquet(eval_set)

    argv = [
        "--input", DOCS, "--checkpoint", ckpt, "--output", out,
        "--eval-set", eval_set,
        "--rates", json.dumps({"src0": 1.0, "src1": 1.0}),
        "--default-rate", "0.5",
        "--min-quality", "0.1", "--pack", "boundary", "--budget", "64",
        "--build-vocab",
    ]
    c1 = main(argv)
    assert c1["input_docs"] == 500
    # every gate is a (weak) subset of the previous
    assert (c1["input_docs"] >= c1["after_quality_gate"]
            >= c1["after_dedup"] >= c1["final_docs"] > 0)
    assert c1["train_sequences"] > 0 and c1["vocab_size"] > 0
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() == c1["final_docs"]
    # PII redaction replaced text; the synthetic corpus has none, so text
    # survives, but the column exists and is non-null
    assert corpus.filter("text IS NULL").count() == 0
    packed = spark.read.parquet(f"{out}/packed")
    # conservation: packed tokens == total tokens of the final corpus
    from pyspark.sql import functions as F

    total = corpus.select(
        F.sum(F.size(F.split("text", " "))).alias("s")
    ).collect()[0]["s"]
    assert c1["packed_tokens"] == total
    assert packed.count() >= c1["final_docs"]

    # resume: second run serves every boundary from the store and lands on
    # identical counters (mixture sampling is an md5 coin -> identical set)
    c2 = main(argv)
    assert c2 == c1
    # boundaries were complete before the rerun
    from multilingual_wiki_event_pipeline_spark.sinks import CheckpointStore

    s = CheckpointStore(spark, ckpt)
    # fingerprint check needs the job's fingerprint; _SUCCESS presence is
    # enough to prove the stages materialized
    for stage in ("s1_clean", "s2_dedup", "s3_final"):
        assert os.path.exists(os.path.join(ckpt, stage, "_SUCCESS"))


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_prepare_training_data_greedy_pack_no_mixture(spark, tmp_path):
    from jobs.prepare_training_data import main

    c = main([
        "--input", DOCS, "--checkpoint", str(tmp_path / "ck2"),
        "--output", str(tmp_path / "out2"), "--pack", "greedy",
        "--budget", "128",
    ])
    # no mixture spec: final == deduped
    assert c["final_docs"] == c["after_dedup"] > 0
    assert c["train_sequences"] > 0
    assert c["packed_tokens"] > 0


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_prepare_training_data_exactsubstr_stage(spark, tmp_path):
    from pyspark.sql import functions as F

    from jobs.prepare_training_data import main

    c = main([
        "--input", DOCS, "--checkpoint", str(tmp_path / "ck3"),
        "--output", str(tmp_path / "out3"), "--pack", "none",
        "--exactsubstr-n", "4",
    ])
    # the ~20-word synthetic vocabulary guarantees duplicated 4-grams
    assert c["exactsubstr_removed_tokens"] > 0
    assert c["final_docs"] > 0
    corpus = spark.read.parquet(str(tmp_path / "out3") + "/corpus")
    # no emptied docs survive, and the rewrite preserved the schema
    assert corpus.filter("text = '' OR text IS NULL").count() == 0
    assert {"doc_id", "text", "lang", "source"} <= set(corpus.columns)
    # conservation: tokens removed == tokens(after_dedup pre-rewrite
    # survivors) - tokens(rewritten survivors) cannot be asserted without
    # re-running the stage; assert instead the corpus shrank vs input
    n_in = spark.read.parquet(DOCS).select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    n_out = corpus.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    assert n_out < n_in


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_prepare_training_data_telemetry_stage(spark, tmp_path):
    from jobs.prepare_training_data import main

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    c = main([
        "--input", DOCS, "--checkpoint", ckpt, "--output", out,
        "--pack", "none", "--telemetry",
    ])
    assert c["telemetry_hot_tokens"] > 0
    dt = spark.read.parquet(f"{out}/telemetry/distinct_tokens")
    # one row per surviving source; sketch-only output (production shape)
    rows = dt.collect()
    assert rows and all(r["est_distinct"] > 0 for r in rows)
    assert set(dt.columns) == {"source", "est_distinct"}
    hot = spark.read.parquet(f"{out}/telemetry/hot_tokens")
    assert hot.filter("overestimate < 0").count() == 0
    ql = spark.read.parquet(f"{out}/telemetry/doclen_quantiles")
    # p50/p90/p99 per source, sketch-only; every doc has >= 1 token so
    # every estimate is a positive 2^b - 1
    assert ql.count() == 3 * dt.count()
    assert set(ql.columns) == {"source", "q", "est"}
    assert ql.filter("est < 1").count() == 0


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_prepare_training_data_classifier_semdedup_temperature(spark, tmp_path):
    """The three round-5 curation stages together: model-based quality
    gate (hand-built weight table), SemDeDup over the driver embeddings
    (vec_id keyed by doc_id), and temperature mixture sampling."""
    from pyspark.sql import functions as F

    from jobs.prepare_training_data import main

    # weight table: every corpus token gets +1.0 except one poisoned
    # token that sinks any doc containing it
    docs = spark.read.parquet(DOCS)
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("token")).distinct()
    poison = toks.orderBy("token").limit(1).collect()[0]["token"]
    weights = toks.select(
        "token",
        F.when(F.col("token") == poison, F.lit(-100_000_000))
         .otherwise(F.lit(1_000_000)).alias("w_micro"))
    wpath = str(tmp_path / "w.parquet")
    weights.write.parquet(wpath)

    emb = "/root/testdata/sf0.001/embeddings.parquet"
    argv = [
        "--input", DOCS, "--checkpoint", str(tmp_path / "ck5"),
        "--output", str(tmp_path / "out5"), "--pack", "none",
        "--classifier-weights", wpath, "--min-logit", "0.5",
        "--embeddings", emb, "--sem-threshold", "0.3", "--sem-cells", "8",
        "--temperature", "0.5", "--target-total", "30",
        "--mix-group", "lang",
    ]
    c = main(argv)
    # each optional gate reported and monotone (classifier_gate_survivors
    # is intra-stage-1, upstream of the s1 boundary count)
    assert (c["input_docs"] >= c["classifier_gate_survivors"]
            >= c["after_quality_gate"] >= c["after_dedup"]
            >= c["after_semantic_dedup"] >= c["final_docs"] > 0)
    # the poisoned token kills at least one doc
    assert c["classifier_gate_survivors"] < c["input_docs"]
    # every survivor has an embedding row in the driver tables
    assert c["docs_without_embedding"] == 0
    # semantic dedup at cos>=0.3 on isotropic vectors drops some docs
    assert c["after_semantic_dedup"] < c["after_dedup"]
    # temperature sampling trims toward the 30-doc target
    assert c["final_docs"] < c["after_semantic_dedup"]
    # resume: the semantic boundary is served from the store (no k-means
    # retrain) and every surviving count is identical
    c2 = main(argv)
    for k in ("after_dedup", "after_semantic_dedup", "final_docs"):
        assert c2[k] == c[k]
    # the coverage counter only exists on the fresh (training) path
    assert "docs_without_embedding" not in c2


def test_prepare_training_data_rates_and_temperature_conflict(tmp_path):
    from jobs.prepare_training_data import main

    with pytest.raises(SystemExit):
        main([
            "--input", DOCS, "--checkpoint", str(tmp_path / "ck6"),
            "--output", str(tmp_path / "out6"),
            "--rates", "{}", "--temperature", "0.5",
            "--target-total", "10",
        ])
    with pytest.raises(SystemExit):
        main([
            "--input", DOCS, "--checkpoint", str(tmp_path / "ck7"),
            "--output", str(tmp_path / "out7"), "--temperature", "0.5",
        ])


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_prepare_training_data_bpe_stage(spark, tmp_path):
    from jobs.prepare_training_data import main

    out = str(tmp_path / "out8")
    c = main([
        "--input", DOCS, "--checkpoint", str(tmp_path / "ck8"),
        "--output", out, "--pack", "none", "--bpe-merges", "6",
    ])
    assert c["bpe_rules"] == 6
    merges = spark.read.parquet(f"{out}/bpe/merges")
    assert merges.count() == 6
    seg = spark.read.parquet(f"{out}/bpe/word_segments")
    # every distinct word of the final corpus is segmented, and applying
    # 6 merges cannot grow a word's symbol count beyond chars+1
    corpus = spark.read.parquet(f"{out}/corpus")
    from pyspark.sql import functions as F

    n_words = corpus.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter("w <> ''").filter(~F.col("w").contains("\x1f")) \
        .distinct().count()
    assert seg.count() == n_words
    bad = seg.filter(
        F.col("n_symbols") > F.length("word") + 1).count()
    assert bad == 0 and c["bpe_symbols"] > 0
