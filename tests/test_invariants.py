"""The input-hint invariant: per-turn text equality under stable
(conv_id, turn_idx) ordering — turn text must ride through the engine
byte-identical, and document assembly must be its exact join."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from multilingual_wiki_event_pipeline_spark.functions.text import TURN_SEPARATOR
from multilingual_wiki_event_pipeline_spark.operators import documents
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables


def test_per_turn_text_equality(spark, corpus_dir, corpus):
    t = CorpusTables(spark, corpus_dir)
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in documents.stable_turns(t.transcripts).collect()
    }
    want = {
        (row["conv_id"], row["turn_idx"]): row["text"]
        for row in corpus.tables["transcripts"]
    }
    assert got == want  # byte-identical, no rewrite anywhere


def test_stable_turn_seq_is_turn_idx_rank(spark, corpus_dir):
    t = CorpusTables(spark, corpus_dir)
    out = documents.stable_turns(t.transcripts)
    bad = out.withColumn(
        "rank",
        F.row_number().over(Window.partitionBy("conv_id").orderBy("turn_idx")),
    ).filter(F.col("rank") != F.col("turn_seq"))
    assert bad.count() == 0


def test_assembly_is_exact_separator_join(spark, corpus_dir, corpus):
    t = CorpusTables(spark, corpus_dir)
    got = {r.conv_id: r.content for r in documents.assemble_documents(t.transcripts).collect()}
    by_conv: dict[str, list[tuple[int, str]]] = {}
    for row in corpus.tables["transcripts"]:
        by_conv.setdefault(row["conv_id"], []).append((row["turn_idx"], row["text"]))
    want = {
        c: TURN_SEPARATOR.join(txt for _, txt in sorted(turns))
        for c, turns in by_conv.items()
    }
    assert got == want


def test_assembly_block_boundaries(spark, corpus_dir, corpus):
    """Two-phase assembly with a tiny block size must equal single-phase
    join exactly (mega-conversation path crosses many blocks)."""
    t = CorpusTables(spark, corpus_dir)
    got = {
        r.conv_id: r.content
        for r in documents.assemble_documents(t.transcripts, block=7).collect()
    }
    by_conv: dict[str, list[tuple[int, str]]] = {}
    for row in corpus.tables["transcripts"]:
        by_conv.setdefault(row["conv_id"], []).append((row["turn_idx"], row["text"]))
    want = {
        c: TURN_SEPARATOR.join(txt for _, txt in sorted(turns))
        for c, turns in by_conv.items()
    }
    assert got == want
