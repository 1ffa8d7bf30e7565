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


def _copy_single_parquet(df, scratch_dir: str, dest_file: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(scratch_dir)
    part = [f for f in os.listdir(scratch_dir) if f.endswith(".parquet")][0]
    shutil.copy(os.path.join(scratch_dir, part), dest_file)


def test_compaction_reversible_dedup_and_manifest_swap(
        spark, corpus_dir, tmp_path, batch_full_triples):
    """Round-5, closing the r4 ADVICE (medium) + verdict item 5.

    Reversibility: compaction persists the PRE-A2 collapsed view, so a
    content-dedup LOSER's triples survive compaction. When a later batch
    diverges the WINNER's content (its conversation receives more turns),
    the read-time A2 replay must resurrect the loser — batch semantics
    hold even though the loser's conversation was never touched after the
    compaction that absorbed it. (The r4 compaction materialized the A2
    OUTPUT and deleted the loser forever — this test fails on that code.)

    Manifest swap: the compaction commit is an atomic pointer update and
    the previous version's dirs are kept for one cycle, so a reader
    resolved BEFORE a commit still executes after it; dirs older than the
    kept version are removed by the next commit.
    """
    t = CorpusTables(spark, corpus_dir)
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    tr = spark.read.parquet(f"{corpus_dir}/transcripts.parquet")
    # batch 0: '-0' convs; batch 1: '-1' convs. The duplicate-content pair
    # (datagen: i%20==3 — the '-1' page copies '-0's content and its name
    # sorts LARGER, so '-1' is the A2 winner) lands in separate batches.
    for suffix in ("0", "1"):
        _copy_single_parquet(
            tr.filter(F.col("conv_id").endswith(f"-{suffix}")),
            str(tmp_path / f"split{suffix}"),
            os.path.join(stream_in, f"batchfile_{suffix}.parquet"),
        )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in, max_files_per_trigger=1),
        t, out, ckpt,
    )
    q.awaitTermination(180)
    assert ingest.compact_streamed_triples(spark, out) >= 0

    snapshot = _triples(ingest.read_streamed_triples(spark, out))
    assert snapshot == batch_full_triples
    # lazy reader handle resolved at version 1 — collected only after the
    # NEXT compaction commits (deterministic resolve-then-swap interleaving)
    df_v1 = ingest.read_streamed_triples(spark, out)

    def extra_turns(bump: int, text: str):
        return (
            tr.filter(F.col("conv_id").endswith("-1"))
            .groupBy("conv_id")
            .agg(F.max("turn_idx").alias("mi"), F.max("ts").alias("mts"))
            .select(
                "conv_id",
                (F.col("mi") + bump).cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                F.lit(text).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.col("mts").alias("ts"),
            )
        )

    # batch 2: one extra turn on every '-1' conversation — every A2 winner
    # diverges from its untouched '-0' twin
    e1 = extra_turns(1, "fresh divergence turn")
    _copy_single_parquet(e1, str(tmp_path / "extra1"),
                         os.path.join(stream_in, "batchfile_2.parquet"))
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in), t, out, ckpt
    )
    q.awaitTermination(180)
    assert ingest.compact_streamed_triples(spark, out) >= 0

    # swap semantics: v2 committed, v1 kept one cycle, pre-commit reader
    # still executes and sees its resolved (frozen) version
    assert os.path.isdir(f"{out}/_compact_v2")
    assert os.path.isdir(f"{out}/_compact_v1")
    assert _triples(df_v1) == snapshot

    # ground truth = the BATCH pipeline over the augmented transcripts:
    # both units of each dup pair now survive (contents diverged)
    aug = tr.unionByName(e1)
    docs = documents.assemble_documents(aug)
    seeds = t.incidents.filter(F.col("participant_id").isNull())
    meta = t.conv_meta.join(
        seeds.select("incident_id"), "incident_id", "left_semi"
    )
    texts = pilot.full_texts(meta, docs)
    incidents = pilot.incidents_with_texts(seeds, texts)
    roles = t.incident_roles.join(
        incidents.select("incident_id"), "incident_id", "left_semi"
    )
    expected = _triples(
        triples.serialize_collection(
            incidents, texts, roles, t.type2mapping, t.role_mappings
        )
    )
    assert expected != batch_full_triples  # divergence really changed output
    got = _triples(ingest.read_streamed_triples(spark, out))
    assert got == expected, (
        list(got - expected)[:4], list(expected - got)[:4],
    )

    # batch 3 + third compaction: v1 (older than the kept version) is
    # dropped, v2 kept one cycle, v3 current
    _copy_single_parquet(extra_turns(2, "second divergence turn"),
                         str(tmp_path / "extra2"),
                         os.path.join(stream_in, "batchfile_3.parquet"))
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in), t, out, ckpt
    )
    q.awaitTermination(180)
    assert ingest.compact_streamed_triples(spark, out) >= 0
    assert not os.path.isdir(f"{out}/_compact_v1")
    assert os.path.isdir(f"{out}/_compact_v2")
    assert os.path.isdir(f"{out}/_compact_v3")
    man = ingest._read_manifest(out)
    assert man["version"] == 3 and man["triples"].endswith("_compact_v3")


def test_finalize_conversations_event_time_timeout(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState, EventTimeTimeout):
    a conversation finalizes exactly once, when the watermark passes its
    last turn + gap; state survives a query restart on the same checkpoint.

    Timeline (gap 30s, watermark delay 10s, one file per micro-batch;
    availableNow additionally runs a final no-data batch that flushes
    timeouts under the last watermark):
      f1  conv A  ts 10:00:00, 10:00:05   -> A armed at 10:00:35
      f2  conv B  ts 10:01:00             -> wm 09:59:55 (from f1); B armed
      f3  conv C  ts 10:05:00             -> wm 10:00:50: A fires; C armed
      flush batch                          -> wm 10:04:50: B fires;
                                              C (10:05:30) stays open
      --- restart, same checkpoint ---
      f4  conv D  ts 10:10:00 + flush     -> wm 10:09:50: C fires (state
                                              recovered from checkpoint);
                                              D (10:10:30) stays open
      --- restart, same checkpoint ---
      f5  conv A  ts 10:00:10 (VERY late) -> DROPPED by the watermark
                                             filter (ts <= wm 10:09:50):
                                             a quiesced conversation is
                                             never re-opened by data older
                                             than the delay, and no second
                                             A row appears
      f6  conv E  ts 10:20:00 + flush     -> wm 10:19:50: D fires;
                                             E (10:20:30) stays open
    """
    from datetime import datetime

    stream_in = str(tmp_path / "fin_in")
    ckpt = str(tmp_path / "fin_ckpt")
    os.makedirs(stream_in)

    def turn_file(n, rows):
        df = spark.createDataFrame(
            [(c, i, "user", f"turn {i}", None, ts) for c, i, ts in rows],
            ingest.TRANSCRIPT_SCHEMA,
        )
        dest = os.path.join(stream_in, f"f{n}.parquet")
        _copy_single_parquet(df, str(tmp_path / f"fin_scratch{n}"), dest)
        os.utime(dest, (1_000_000 + n, 1_000_000 + n))  # deterministic order

    t0 = datetime(2026, 1, 1, 10, 0, 0)

    def at(minute, second=0):
        return t0.replace(minute=minute, second=second)

    turn_file(1, [("A", 0, at(0)), ("A", 1, at(0, 5))])
    turn_file(2, [("B", 0, at(1))])
    turn_file(3, [("C", 0, at(5))])

    out = str(tmp_path / "fin_out")

    def run():
        # file sink, not memory: the memory sink can't recover from a
        # checkpoint, and the restart leg is the point of this test
        fin = ingest.finalize_conversations(
            ingest.stream_transcripts(spark, stream_in, max_files_per_trigger=1),
            gap="30 seconds", watermark="10 seconds",
        )
        q = (
            fin.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(
            (r.conv_id, r.n_turns, r.max_turn_idx, r.first_ts, r.last_ts)
            for r in spark.read.parquet(out).collect()
        )

    row_a = ("A", 2, 1, at(0), at(0, 5))
    row_b = ("B", 1, 0, at(1), at(1))
    row_c = ("C", 1, 0, at(5), at(5))

    got = run()
    assert got == [row_a, row_b], got

    turn_file(4, [("D", 0, at(10))])
    got = run()  # restart: state for C recovered from the checkpoint
    assert got == [row_a, row_b, row_c], got

    # a very-late turn (behind the watermark) must NOT re-open a quiesced
    # conversation: the watermark filter drops it before the operator
    turn_file(5, [("A", 2, at(0, 10))])
    turn_file(6, [("E", 0, at(20))])
    got = run()
    assert got == [
        row_a, row_b, row_c,
        ("D", 1, 0, at(10), at(10)),
    ], got


def test_sparql_over_streamed_store(spark, corpus_dir, tmp_path):
    """The layers compose: stream-ingest the corpus, compact the streamed
    view, then run a textual SPARQL query over the compacted store —
    answers must agree with the same relation computed directly from the
    streamed-triples DataFrame."""
    from multilingual_wiki_event_pipeline_spark.operators.sparql import (
        sparql_query,
    )

    t = CorpusTables(spark, corpus_dir)
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    shutil.copy(f"{corpus_dir}/transcripts.parquet", stream_in)
    out = str(tmp_path / "out")
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in), t, out,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert not q.isActive
    ingest.compact_streamed_triples(spark, out)

    store = ingest.read_streamed_triples(spark, out)
    pred = (
        store.groupBy("pred").count()
        .orderBy(F.desc("count"), "pred").first()["pred"]
    )
    want = sorted(
        (r.subj, r.obj)
        for r in store.filter(F.col("pred") == pred)
                      .select("subj", "obj").collect()
    )
    got = sparql_query(
        store, f"SELECT ?s ?o WHERE {{ ?s <{pred}> ?o }}"
    ).collect()
    assert sorted((r.s, r.o) for r in got) == want and want
    assert sparql_query(store, f"ASK {{ ?s <{pred}> ?o }}") is True
    assert sparql_query(store, "ASK { ?s <urn:no-such> ?o }") is False


def test_streaming_hll_register_log_is_batching_invariant(
        spark, corpus_dir, tmp_path):
    """The distinct-token estimate folded from per-batch register appends
    equals the whole-corpus sketch estimate, no matter how the stream was
    batched — and a replayed batch changes nothing (max is idempotent)."""
    from pyspark.sql import functions as F

    from multilingual_wiki_event_pipeline_spark.operators.text_analysis import (
        hll_estimate, hll_registers,
    )
    from multilingual_wiki_event_pipeline_spark.streaming import telemetry

    turns = spark.read.parquet(f"{corpus_dir}/transcripts.parquet")
    toks = turns.select(
        "role",
        F.explode(F.filter(F.split("text", " "), lambda x: x != ""))
         .alias("token"),
    )
    out = str(tmp_path / "telemetry")
    # simulate three micro-batches by conv_id hash + one REPLAY of batch 0
    for bid in (0, 1, 2, 0):
        batch = turns.filter(F.crc32(F.col("conv_id")) % 3 == bid % 3)
        btoks = batch.select(
            "role",
            F.explode(F.filter(F.split("text", " "), lambda x: x != ""))
             .alias("token"),
        )
        telemetry.append_batch_registers(btoks, bid, out, "role", "token")
    streamed = {r["g"]: r["est_distinct"]
                for r in telemetry.read_distinct_estimate(spark, out)
                .collect()}
    whole = {r["g"]: r["est_distinct"]
             for r in hll_estimate(
                 hll_registers(toks, "role", "token")).collect()}
    assert streamed == whole and whole


def test_compaction_refuses_live_stream(spark, corpus_dir, tmp_path):
    """r5 verdict #7: the quiescence contract is mechanical — compaction
    raises while the output dir's ingest query is active (deterministic
    interleaving: first batch fully processed, query still running), and
    succeeds as soon as the stream stops."""
    import pytest

    t = CorpusTables(spark, corpus_dir)
    stream_in = str(tmp_path / "in")
    os.makedirs(stream_in)
    shutil.copy(f"{corpus_dir}/transcripts.parquet", stream_in)
    out = str(tmp_path / "out")
    q = ingest.incremental_triples(
        ingest.stream_transcripts(spark, stream_in), t, out,
        str(tmp_path / "ckpt"), available_now=False,
    )
    try:
        q.processAllAvailable()  # batch 0 fully written, query still live
        assert q.isActive
        with pytest.raises(RuntimeError, match="ingest stream .* is active"):
            ingest.compact_streamed_triples(spark, out)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert ingest.compact_streamed_triples(spark, out) >= 0
