"""Checkpoint-store semantics: resume-after-failure, stage skipping,
lineage/counters, and the salted triple sink (north rule; SURVEY §7.1 M5).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from multilingual_wiki_event_pipeline_spark.plans import pipeline
from multilingual_wiki_event_pipeline_spark.sinks import (
    CheckpointStore,
    layer_row_counts,
    write_layer_union,
    write_triples,
)
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables


def _triples(df):
    return {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.lang, r.datatype)
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ckpt"))


def test_resume_identical_output(spark, corpus_dir, store_dir, tmp_path_factory):
    """A run interrupted after the early stages resumes without recomputing
    them and produces byte-identical triples."""
    t = CorpusTables(spark, corpus_dir)

    # run 1: full run through a store
    s1 = CheckpointStore(spark, store_dir)
    o1 = pipeline.build(t, store=s1)
    want = _triples(o1.pilot_triples)
    want_mentions = o1.mentions.count()
    assert s1.is_complete("s04_ref_dim")

    # simulate mid-run failure: later boundaries lost, early ones intact
    s1.invalidate("s04_ref_dim")
    s1.invalidate("s03_aligned_mentions")
    assert not s1.is_complete("s03_aligned_mentions")
    assert s1.is_complete("s01_texts_full")

    # run 2 (fresh store handle = fresh driver): completes only the missing
    # tail; output identical
    s2 = CheckpointStore(spark, store_dir)
    o2 = pipeline.build(t, store=s2)
    assert _triples(o2.pilot_triples) == want
    assert o2.mentions.count() == want_mentions

    # stages recomputed in run 2 are exactly the invalidated ones
    lineage = s2.lineage()
    redone = {
        r.stage
        for r in lineage.filter(F.col("run_id") == s2.run_id).collect()
    }
    assert redone == {"s03_aligned_mentions", "s04_ref_dim"}


def test_store_output_matches_cache_path(spark, corpus_dir, tmp_path_factory):
    """The materialized-store pipeline and the in-session cache pipeline are
    the same computation."""
    t = CorpusTables(spark, corpus_dir)
    store = CheckpointStore(spark, str(tmp_path_factory.mktemp("ckpt_eq")))
    via_store = _triples(pipeline.build(t, store=store).full_triples)
    via_cache = _triples(pipeline.build(t, cache_intermediates=True).full_triples)
    assert via_store == via_cache


def test_lineage_rows_cover_rowcounts(spark, corpus_dir, store_dir):
    """Per-partition lineage rows sum to the boundary's row count."""
    store = CheckpointStore(spark, store_dir)
    got = (
        store.lineage()
        .groupBy("stage")
        .agg(F.sum("n_rows").alias("n"))
        .collect()
    )
    by_stage = {r.stage: r.n for r in got}
    s02 = store._read("s02_pilot_texts").count()
    assert by_stage["s02_pilot_texts"] == s02
    assert by_stage["s03_aligned_mentions"] > 0


def test_counters_roundtrip(spark, store_dir):
    store = CheckpointStore(spark, store_dir)
    store.add_counter("s03_aligned_mentions", "misaligned_mentions", 7)
    rows = store.counters().filter(F.col("metric") == "misaligned_mentions").collect()
    assert any(r.value == 7.0 for r in rows)


def test_layer_union_typed_superschema_roundtrip(spark, tmp_path):
    """write_layer_union's typed superschema mode — exercised via the
    DEFAULT payload (typed IS the shipped default; this test pins that) —
    folds N layers into one tagged write under a nullable superschema:
    shared same-type columns merge, a name reused with a different type is
    layer-qualified, missing columns null-fill, and per-layer counts come
    from lineage."""
    store = CheckpointStore(spark, str(tmp_path / "ckpt_lu"))
    a = spark.range(7).select(F.col("id").alias("x"), (F.col("id") * 2).alias("y"))
    b = spark.range(3).select(F.col("id").cast("string").alias("s"))
    c = spark.range(2).select(
        F.col("id").alias("x"),                      # same name+type as a.x
        F.col("id").cast("string").alias("y"),        # name clash, new type
    )
    out = write_layer_union(store, {"a": a, "b": b, "c": c}, "out_layers")
    assert set(out.columns) == {"layer", "x", "y", "s", "y__c"}
    assert layer_row_counts(store, "out_layers") == {"a": 7, "b": 3, "c": 2}
    back_a = out.filter(F.col("layer") == "a").select("x", "y")
    assert {(r.x, r.y) for r in back_a.collect()} == {
        (i, 2 * i) for i in range(7)
    }
    # null-fill outside the owning layer; qualified column only in c
    assert out.filter(F.col("layer") == "b").select("x").distinct().collect()[0].x is None
    assert {r.y__c for r in out.filter(F.col("layer") == "c").collect()} == {"0", "1"}
    # resume: a fresh handle sees the stage complete
    assert CheckpointStore(spark, store.root).is_complete("out_layers")


def test_layer_union_json_mode(spark, tmp_path):
    """The JSON payload representation (the single-JVM wall knob; typed is
    the shipped default) round-trips through from_json."""
    store = CheckpointStore(spark, str(tmp_path / "ckpt_lu_json"))
    a = spark.range(4).select(F.col("id").alias("x"))
    out = write_layer_union(store, {"a": a}, "out_layers", payload="json",
                            compression="snappy")
    assert set(out.columns) == {"layer", "payload"}
    back = (
        out.select(F.from_json("payload", "x long").alias("r")).select("r.*")
    )
    assert {r.x for r in back.collect()} == set(range(4))


def test_manifest_invalidates_on_param_change(spark, tmp_path):
    """Resume is keyed by the run manifest: the same checkpoint root with a
    different params fingerprint must NOT serve the stale boundary."""
    root = str(tmp_path / "ckpt_fp")
    df = spark.range(5).withColumnRenamed("id", "v")
    fp1 = CheckpointStore.params_fingerprint(input="/a", languages="en,nl")
    s1 = CheckpointStore(spark, root, fingerprint=fp1)
    s1.materialize(df, "stage_x")
    assert s1.is_complete("stage_x")

    # same params -> fresh handle resumes
    s1b = CheckpointStore(spark, root, fingerprint=fp1)
    assert s1b.is_complete("stage_x")

    # changed params -> stale boundary is invalid, recompute happens
    fp2 = CheckpointStore.params_fingerprint(input="/a", languages="en")
    assert fp1 != fp2
    s2 = CheckpointStore(spark, root, fingerprint=fp2)
    assert not s2.is_complete("stage_x")
    out = s2.materialize(df.filter("v < 3"), "stage_x")
    assert out.count() == 3
    assert s2.is_complete("stage_x")

    # unfingerprinted legacy store still resumes on _SUCCESS alone
    s3 = CheckpointStore(spark, root)
    assert s3.is_complete("stage_x")


def test_stage_row_count_uses_latest_run(spark, tmp_path):
    """After invalidate()+recompute, stage_row_count reports the latest
    recording only — superseded lineage rows must not double the count."""
    root = str(tmp_path / "ckpt_rc")
    store = CheckpointStore(spark, root)
    store.materialize(spark.range(10).withColumnRenamed("id", "v"), "stage_y")
    assert store.stage_row_count("stage_y") == 10
    store.invalidate("stage_y")
    store.materialize(spark.range(4).withColumnRenamed("id", "v"), "stage_y")
    assert store.stage_row_count("stage_y") == 4


def test_iceberg_catalog_branch(spark, tmp_path):
    """CheckpointStore's Iceberg branch (writeTo/createOrReplace +
    tableExists resume + DROP TABLE invalidate). The sandbox ships no
    Iceberg runtime jar, so this skips unless a catalog is configured —
    the interface is exercised wherever one is (north-star production
    path; see sources/tables.py for the reader side)."""
    try:
        spark.conf.get("spark.sql.catalog.iceberg_cat")
    except Exception:
        pytest.skip("no Iceberg catalog configured in this session")
    store = CheckpointStore(
        spark, str(tmp_path / "ckpt_ice"), catalog="iceberg_cat.mwep_ckpt"
    )
    df = spark.range(5).withColumnRenamed("id", "v")
    out = store.materialize(df, "stage_ice")
    assert out.count() == 5
    assert store.is_complete("stage_ice")
    store.invalidate("stage_ice")
    assert not store.is_complete("stage_ice")


def test_salted_triple_sink(spark, corpus_dir, store_dir, tmp_path):
    """write_triples spreads hot subjects across salted buckets and rereads
    losslessly."""
    t = CorpusTables(spark, corpus_dir)
    o = pipeline.build(t, store=CheckpointStore(spark, store_dir))
    out = str(tmp_path / "triples_out")
    write_triples(o.full_triples, out, n_buckets=8)
    back = spark.read.parquet(out)
    assert _triples(back.drop("bucket")) == _triples(o.full_triples)
    # bucket dirs exist and no single bucket holds everything
    buckets = [d for d in os.listdir(out) if d.startswith("bucket=")]
    assert len(buckets) > 1
    per_bucket = back.groupBy("bucket").count().collect()
    total = sum(r["count"] for r in per_bucket)
    assert max(r["count"] for r in per_bucket) < total
