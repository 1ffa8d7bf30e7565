"""Streaming sketch telemetry: per-micro-batch HLL register appends whose
read-time fold is EXACT — the mergeability of max-registers
(operators/text_analysis.hll_merge) means sketch(batch 1) ⊕ sketch(batch
2) ⊕ ... equals the sketch of the union, bit-for-bit, so an append-only
register log answers "how many distinct X so far?" at any point without
ever re-reading the stream. The register log grows by ≤ m rows per group
per batch (64 for p=6) regardless of batch size — the telemetry analog
of the triple store's per-batch partitions, with read-time folding
instead of read-time dedup.

Pairs with streaming/ingest.py's foreachBatch pattern: call
``append_batch_registers`` inside the same ``process_batch`` that writes
triples, read with ``read_distinct_estimate`` any time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text_analysis import hll_estimate, hll_registers


def append_batch_registers(batch_df: DataFrame, batch_id: int,
                           output_dir: str, group_col: str,
                           value_col: str) -> None:
    """Append this micro-batch's HLL registers (≤ 64 rows per group) to
    the register log, tagged with batch_id so replays are idempotent at
    read time (a replayed batch re-appends identical registers; max-fold
    absorbs duplicates — max is idempotent)."""
    regs = hll_registers(batch_df, group_col, value_col).withColumn(
        "batch_id", F.lit(int(batch_id)))
    regs.write.mode("append").parquet(f"{output_dir}/_hll_registers")


def read_distinct_estimate(spark: SparkSession,
                           output_dir: str) -> DataFrame:
    """(g, est_distinct) over everything streamed so far: fold the
    register log by max per (g, bucket) — exact mergeability, so the
    answer equals the sketch of the full union regardless of how the
    stream was batched (pinned by test)."""
    regs = (
        spark.read.parquet(f"{output_dir}/_hll_registers")
        .groupBy("g", "bucket")
        .agg(F.max("M").alias("M"))
    )
    return hll_estimate(regs)
