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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_u32


def _validate(m_bits: int, k: int) -> None:
    if m_bits % 32 != 0 or m_bits <= 0 or k < 1:
        raise ValueError("require m_bits > 0 divisible by 32 and k >= 1")


def _word_and_bit(key: Column, i: int, m_bits: int, seed: str
                  ) -> tuple[Column, Column]:
    """(word_idx, bit) of hash row ``i`` for one key value — the single
    definition both build and probe use (and the oracles mirror)."""
    pos = md5_u32(F.concat(F.lit(f"{seed}:h{i}:"), key)) % F.lit(m_bits)
    return (
        (pos.cast("long") / F.lit(32)).cast("long"),
        F.pmod(pos, F.lit(32)).cast("int"),
    )


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 4096,
                k: int = 5, seed: str = "bloom") -> DataFrame:
    """Fold a key column into a Bloom bit array: ``(word_idx, word)`` rows
    (32 bits per word, ``m_bits // 32`` rows max) via one explode of the
    k hash positions and a single ``bit_or`` aggregation — map-side
    partial, the exchange carries at most ``m_bits/32`` rows total.
    """
    _validate(m_bits, k)
    v = F.col(key_col).cast("string")
    pos_structs = []
    for i in range(k):
        word_idx, bit = _word_and_bit(v, i, m_bits, seed)
        pos_structs.append(F.struct(
            word_idx.alias("word_idx"), bit.alias("bit")))
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
    key are set in the filter. MAP-SIDE: the k bit tests are k broadcast
    equi-joins of the ≤ m_bits/32-row word table against per-row word
    indexes — the fact table itself never shuffles and never aggregates
    (no groupBy on the key, no join of facts against a derived frame).

    No false negatives: a key that was in the build set always passes.
    A NULL key cannot be a member of anything, so it probes to
    ``bloom_pass = false`` (never dropped — every input row survives).
    """
    _validate(m_bits, k)
    v = F.col(key_col).cast("string")
    out = facts
    tests = []
    for i in range(k):
        word_idx, bit = _word_and_bit(v, i, m_bits, seed)
        w, b, wd = f"__bw{i}", f"__bb{i}", f"__bword{i}"
        side = F.broadcast(bloom.select(
            F.col("word_idx").alias(w), F.col("word").alias(wd)))
        out = (
            out.withColumn(w, word_idx).withColumn(b, bit)
            .join(side, w, "left")
        )
        tests.append(
            (F.coalesce(F.col(wd), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {b})")) != 0)
        )
    all_set = tests[0]
    for t in tests[1:]:
        all_set = all_set & t
    helper = [c for i in range(k)
              for c in (f"__bw{i}", f"__bb{i}", f"__bword{i}")]
    return out.withColumn(
        "bloom_pass", F.coalesce(all_set, F.lit(False))
    ).drop(*helper)


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
