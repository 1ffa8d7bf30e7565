"""Deterministic Bloom filter build + probe — the membership sketch that
makes semi-join REDUCTION affordable at 100 TB: instead of shuffling a
fact table against a dimension to learn which rows can possibly match, a
bit-array summary of the dimension keys (built with one tiny aggregation)
broadcasts to the fact scan and filters it map-side; only bloom-passing
rows pay the real join. One-sided error: every true member passes, a
false-positive fraction ~(1-e^{-kn/m})^k pays the join unnecessarily.

Everything is integer and md5-based — bit positions, the bit_or-folded
words, the probe's mask tests — so the result (and the reported
false-positive accounting) hash-matches the DuckDB oracle bit-for-bit.
Words are 32 bits wide (not 64): the maximum shift is then 31, which both
engines compute identically as a positive BIGINT — DuckDB raises on the
signed overflow of ``1::BIGINT << 63`` that a 64-bit word layout needs.
This is the engine-portable twin of the runtime bloom-join filters
Spark's own optimizer injects (spark.sql.optimizer.runtime.bloomFilter.*),
exposed as an explicit operator so a pipeline can build ONE filter and
reuse it across many probes.

Cites: Bloom CACM 1970; reference parity: the reference has no sketch
tier at all (single-process Python) — this generalizes its exact lookups
for the 100 TB case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _u32(col, salt: str):
    """First 8 md5 hex digits of ``salt + value`` as a uniform uint32 —
    the same cross-engine coin family as training_prep/text_analysis."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col).cast("binary")), 1, 8),
        16, 10,
    ).cast("long")


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 4096,
                k: int = 5, seed: str = "bloom") -> DataFrame:
    """Fold a key column into a Bloom bit array: ``(word_idx, word)`` rows
    (64 bits per word, ``m_bits // 64`` rows max) via one explode of the
    k hash positions and a single ``bit_or`` aggregation — map-side
    partial, the exchange carries at most ``m_bits/64`` rows total.
    """
    if m_bits % 64 != 0 or m_bits <= 0 or k < 1:
        raise ValueError("require m_bits > 0 divisible by 64 and k >= 1")
    v = F.col(key_col).cast("string")
    pos_structs = []
    for i in range(k):
        pos = _u32(v, f"{seed}:h{i}:") % F.lit(m_bits)
        pos_structs.append(F.struct(
            (pos.cast("long") / F.lit(32)).cast("long").alias("word_idx"),
            F.pmod(pos, F.lit(32)).cast("int").alias("bit"),
        ))
    exploded = keys.select(F.explode(F.array(*pos_structs)).alias("p"))
    return (
        exploded.select(
            F.col("p.word_idx").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), p.bit)").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(facts: DataFrame, key_col: str, bloom: DataFrame,
                m_bits: int = 4096, k: int = 5,
                seed: str = "bloom") -> DataFrame:
    """Mark each fact row with ``bloom_pass``: true iff ALL k bits of its
    key are set in the filter. The bloom frame broadcasts (≤ m_bits/64
    rows); the probe is one explode + broadcast equi-join on word_idx +
    bool_and per row key — nothing shuffles but the (tiny) filter.

    No false negatives: a key that was in the build set always passes.
    """
    if m_bits % 64 != 0 or m_bits <= 0 or k < 1:
        raise ValueError("require m_bits > 0 divisible by 64 and k >= 1")
    v = F.col(key_col).cast("string")
    pos_structs = []
    for i in range(k):
        pos = _u32(v, f"{seed}:h{i}:") % F.lit(m_bits)
        pos_structs.append(F.struct(
            (pos.cast("long") / F.lit(32)).cast("long").alias("word_idx"),
            F.pmod(pos, F.lit(32)).cast("int").alias("bit"),
        ))
    keyed = facts.select(
        F.col(key_col).alias("__k"),
        F.explode(F.array(*pos_structs)).alias("p"),
    ).select(
        "__k",
        F.col("p.word_idx").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), p.bit)").alias("mask"),
    )
    hits = (
        keyed.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "__k",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask"))
             != 0).alias("bit_set"),
        )
        .groupBy("__k")
        .agg(F.bool_and("bit_set").alias("bloom_pass"))
    )
    return facts.join(
        hits.select(F.col("__k").alias(key_col), "bloom_pass"), key_col
    )


def bloom_semijoin_report(facts: DataFrame, fact_key: str,
                          dim_keys: DataFrame, dim_key: str,
                          m_bits: int = 4096, k: int = 5,
                          seed: str = "bloom") -> DataFrame:
    """The semi-join-reduction report card: build a Bloom filter over the
    dimension keys, probe every fact row, and account exactly —
    ``(n_fact, n_pass, n_member, n_false_pos)`` in one row, all BIGINTs.
    ``n_member ≤ n_pass`` always (no false negatives); ``n_pass -
    n_member`` is the price of the sketch (rows that pay the real join
    without matching). At scale the report is the tuning loop for
    (m_bits, k) against the observed key cardinality."""
    bloom = bloom_build(dim_keys.select(dim_key), dim_key,
                        m_bits=m_bits, k=k, seed=seed)
    probed = bloom_probe(facts.select(fact_key), fact_key, bloom,
                         m_bits=m_bits, k=k, seed=seed)
    member = dim_keys.select(F.col(dim_key).alias(fact_key)).distinct()
    flagged = probed.join(
        member.withColumn("__m", F.lit(True)), fact_key, "left")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_pass"),
        F.sum(F.coalesce(F.col("__m"), F.lit(False)).cast("long"))
         .alias("n_member"),
        F.sum((F.col("bloom_pass")
               & ~F.coalesce(F.col("__m"), F.lit(False))).cast("long"))
         .alias("n_false_pos"),
    )
