"""Streaming ingest parity: the foreachBatch incremental path over the
same corpus must reproduce the batch pipeline's full-collection triples,
and replaying a batch must be idempotent."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from multilingual_wiki_event_pipeline_spark.operators import documents, pilot, triples
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables
from multilingual_wiki_event_pipeline_spark.streaming import ingest


def _triples(df):
    return {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.lang, r.datatype)
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def batch_full_triples(spark, corpus_dir):
    t = CorpusTables(spark, corpus_dir)
    docs = documents.assemble_documents(t.transcripts)
    seeds = t.incidents.filter(F.col("participant_id").isNull())
    meta = t.conv_meta.join(
        seeds.select("incident_id"), "incident_id", "left_semi"
    )
    texts = pilot.full_texts(meta, docs)
    incidents = pilot.incidents_with_texts(seeds, texts)
    roles = t.incident_roles.join(
        incidents.select("incident_id"), "incident_id", "left_semi"
    )
    return _triples(
        triples.serialize_collection(
            incidents, texts, roles, t.type2mapping, t.role_mappings
        )
    )


def test_streamed_triples_match_batch(spark, corpus_dir, tmp_path, batch_full_triples):
    t = CorpusTables(spark, corpus_dir)
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    shutil.copy(f"{corpus_dir}/transcripts.parquet", stream_in)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in), t, out, ckpt
    )
    q.awaitTermination(120)
    assert not q.isActive

    got = _triples(ingest.read_streamed_triples(spark, out))
    assert got == batch_full_triples


def test_batch_replay_idempotent(spark, corpus_dir, tmp_path, batch_full_triples):
    """Re-running the stream over the same input with a FRESH checkpoint
    replays batch 0 — the overwrite-by-batch partition keeps output stable."""
    t = CorpusTables(spark, corpus_dir)
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    shutil.copy(f"{corpus_dir}/transcripts.parquet", stream_in)
    out = str(tmp_path / "out")

    for attempt in range(2):
        q = ingest.incremental_triples(
            ingest.stream_transcripts(spark, stream_in), t, out,
            str(tmp_path / f"ckpt{attempt}"),
        )
        q.awaitTermination(120)
    assert _triples(ingest.read_streamed_triples(spark, out)) == batch_full_triples


def test_multi_batch_parity(spark, corpus_dir, tmp_path, batch_full_triples):
    """Conversations split ACROSS micro-batches (maxFilesPerTrigger=1, one
    file per conv-index suffix) — in particular the duplicate-content pair
    (i%20==3, '-0'/'-1' convs of the same incident+lang) arrives in
    different batches. The per-batch A2 dedup cannot see the pair; the
    global dedup in read_streamed_triples must reconcile it so streamed
    output still equals the batch output."""
    t = CorpusTables(spark, corpus_dir)
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    tr = spark.read.parquet(f"{corpus_dir}/transcripts.parquet")
    for suffix in ("0", "1"):
        (
            tr.filter(F.col("conv_id").endswith(f"-{suffix}"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp_path / f"split{suffix}"))
        )
        part = [
            f for f in os.listdir(str(tmp_path / f"split{suffix}"))
            if f.endswith(".parquet")
        ][0]
        shutil.copy(
            str(tmp_path / f"split{suffix}" / part),
            os.path.join(stream_in, f"batchfile_{suffix}.parquet"),
        )

    out = str(tmp_path / "out")
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in, max_files_per_trigger=1),
        t, out, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    assert not q.isActive
    # really ran as 2+ micro-batches
    batch_dirs = {d for d in os.listdir(out) if d.startswith("batch_id=")}
    assert len(batch_dirs) >= 2, batch_dirs
    got = _triples(ingest.read_streamed_triples(spark, out))
    assert got == batch_full_triples, (
        list(got - batch_full_triples)[:4],
        list(batch_full_triples - got)[:4],
    )


def test_turns_split_across_batches(spark, corpus_dir, tmp_path, batch_full_triples):
    """Round-3: EVERY conversation's turns are split across two micro-batches
    (even turn_idx in batch 0, odd in batch 1) — the worst case for
    assembly. The per-batch processor re-assembles touched conversations
    from the _turns history store, and read_streamed_triples keeps the
    latest dct:description per unit, so streamed output must still equal
    the batch output exactly."""
    t = CorpusTables(spark, corpus_dir)
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    tr = spark.read.parquet(f"{corpus_dir}/transcripts.parquet")
    for parity in (0, 1):
        (
            tr.filter(F.col("turn_idx") % 2 == parity)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp_path / f"half{parity}"))
        )
        part = [
            f for f in os.listdir(str(tmp_path / f"half{parity}"))
            if f.endswith(".parquet")
        ][0]
        shutil.copy(
            str(tmp_path / f"half{parity}" / part),
            os.path.join(stream_in, f"batchfile_{parity}.parquet"),
        )

    out = str(tmp_path / "out")
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in, max_files_per_trigger=1),
        t, out, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    assert not q.isActive
    batch_dirs = {d for d in os.listdir(out) if d.startswith("batch_id=")}
    assert len(batch_dirs) >= 2, batch_dirs
    got = _triples(ingest.read_streamed_triples(spark, out))
    assert got == batch_full_triples, (
        list(got - batch_full_triples)[:4],
        list(batch_full_triples - got)[:4],
    )


def test_compaction_parity_and_continued_ingest(spark, corpus_dir, tmp_path,
                                                batch_full_triples):
    """Round-4 streamed-view compaction: (1) compacting absorbs the live
    batch partitions and the reader output is unchanged; (2) a stream
    RESUMED after compaction (same checkpoint, new input) re-assembles
    conversations from the compacted turn history and parity still holds.
    Worst-case split: even turn_idx arrives before the compaction, odd
    after — every conversation must be re-assembled across the boundary."""
    t = CorpusTables(spark, corpus_dir)
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    tr = spark.read.parquet(f"{corpus_dir}/transcripts.parquet")

    def add_half(parity: int) -> None:
        (
            tr.filter(F.col("turn_idx") % 2 == parity)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp_path / f"half{parity}"))
        )
        part = [
            f for f in os.listdir(str(tmp_path / f"half{parity}"))
            if f.endswith(".parquet")
        ][0]
        shutil.copy(
            str(tmp_path / f"half{parity}" / part),
            os.path.join(stream_in, f"batchfile_{parity}.parquet"),
        )

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    add_half(0)
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in), t, out, ckpt
    )
    q.awaitTermination(180)
    assert not q.isActive

    pre_compact = _triples(ingest.read_streamed_triples(spark, out))
    max_id = ingest.compact_streamed_triples(spark, out)
    assert max_id >= 0
    # live partitions absorbed, compacted stores in place
    assert not [d for d in os.listdir(out) if d.startswith("batch_id=")]
    assert not [d for d in os.listdir(f"{out}/_turns")
                if d.startswith("batch_id=")]
    # (1) compaction is a pure materialization: reader output unchanged
    assert _triples(ingest.read_streamed_triples(spark, out)) == pre_compact

    # (2) resume the SAME checkpointed stream on new input (the odd turns)
    add_half(1)
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in), t, out, ckpt
    )
    q.awaitTermination(180)
    assert not q.isActive
    got = _triples(ingest.read_streamed_triples(spark, out))
    assert got == batch_full_triples, (
        list(got - batch_full_triples)[:4],
        list(batch_full_triples - got)[:4],
    )
    # a second compaction over (compact + new batches) is idempotent too
    ingest.compact_streamed_triples(spark, out)
    assert _triples(ingest.read_streamed_triples(spark, out)) == batch_full_triples


def test_conversation_progress_stateful(spark, corpus_dir, tmp_path):
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    shutil.copy(f"{corpus_dir}/transcripts.parquet", stream_in)

    prog = ingest.conversation_progress(
        ingest.stream_transcripts(spark, stream_in)
    )
    q = (
        prog.writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.conv_id: (r.n_turns, r.max_turn_idx)
        for r in spark.table("conv_progress").collect()
    }
    want = {
        r.conv_id: (r.n, r.mx)
        for r in spark.read.parquet(f"{corpus_dir}/transcripts.parquet")
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"))
        .collect()
    }
    assert got == want
