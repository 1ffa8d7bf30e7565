"""Structured-Streaming ingestion of transcript turns.

The reference is strictly batch (SURVEY §2.9) and so is the parity surface;
this module is the engine's *additive* streaming path for continuously
arriving transcripts:

- ``stream_transcripts``: file-source ``readStream`` over the transcript
  directory with the input-hint schema.
- ``incremental_triples``: ``foreachBatch`` wrapper around the SAME batch
  operators (document assembly -> text/incident/role triple serialization)
  — no second implementation to drift. Each micro-batch's triples land in a
  ``batch_id=N`` partition written with overwrite, so a replayed batch
  (failure between write and checkpoint commit) is idempotent —
  exactly-once at the partition level. Readers take ``dropDuplicates`` over
  the triple columns (triples are set-semantics; an incident spanning two
  micro-batches re-emits its incident-level triples).
- ``conversation_progress``: stateful streaming aggregation (running turn
  count / frontier per conversation) with a watermark bounding state.

Assumption for assembly correctness: a conversation's turns arrive within
one micro-batch (upstream emits conversations whole, e.g. on a
conversation-closed marker). Turn ordering inside the batch is stabilized
by the same ``(conv_id, turn_idx)`` sort as the batch path, so per-turn
text equality holds for streamed output too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_transcripts(spark: SparkSession, input_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def incremental_triples(stream: DataFrame, tables, output_dir: str,
                        checkpoint_dir: str,
                        available_now: bool = True) -> StreamingQuery:
    """Emit full-collection triples for each micro-batch of transcript turns.

    ``tables`` is a ``sources.tables.CorpusTables`` carrying the dimension
    tables (conv_meta, incidents, incident_roles, role mappings); the batch
    operators are reused verbatim inside ``foreachBatch``.
    """
    from ..operators import documents, pilot, triples

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        convs = batch_df.select("conv_id").distinct()
        docs = documents.assemble_documents(batch_df)
        meta = tables.conv_meta.join(convs, "conv_id", "left_semi")
        texts = pilot.full_texts(meta, docs)
        incidents = pilot.incidents_with_texts(tables.incidents, texts)
        roles = tables.incident_roles.join(
            incidents.select("incident_id"), "incident_id", "left_semi"
        )
        out = triples.serialize_collection(
            incidents, texts, roles, tables.type2mapping, tables.role_mappings
        )
        # overwrite THIS batch's partition: replays are idempotent
        out.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_streamed_triples(spark: SparkSession, output_dir: str) -> DataFrame:
    """Set-semantics view over the streamed batches."""
    from ..operators.triples import TRIPLE_COLS

    return (
        spark.read.option("basePath", output_dir).parquet(f"{output_dir}/batch_id=*")
        .select(*TRIPLE_COLS)
        .dropDuplicates(TRIPLE_COLS)
    )


def conversation_progress(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful running aggregate per conversation: turn count, idx/time
    frontier. Watermark bounds state for conversations that stop arriving."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.max("ts").alias("last_ts"),
        )
    )
