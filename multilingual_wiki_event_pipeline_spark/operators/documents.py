"""Document assembly from transcript turns (SURVEY W1 + input_hint invariant).

The reference reads whole wiki pages (wikipedia_utils.py:56-99); our input is
a turns table, so a document = TURN_SEPARATOR-join of its turns under stable
``(conv_id, turn_idx)`` ordering. Assembly is a *two-phase* aggregation —
turns are first combined within fixed-size turn_idx blocks, then blocks are
combined per conversation — so a mega-conversation (100x median turns, see
FIXTURES.md) never concentrates its whole turn list in one task's grouping
state. Entirely JVM-side (array_sort/array_join inside whole-stage codegen);
no Python touches the text, which preserves per-turn byte equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import TURN_SEPARATOR

DEFAULT_BLOCK = 1024


def assemble_documents(transcripts: DataFrame, block: int = DEFAULT_BLOCK) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) -> docs(conv_id, content).

    Equivalent to ``TURN_SEPARATOR.join(texts sorted by turn_idx)`` per
    conversation. Phase 1 groups on (conv_id, block) — the skew-splitting
    salt derived from turn position — phase 2 merges the ordered blocks.
    """
    sep = F.lit(TURN_SEPARATOR)
    blocked = transcripts.select(
        "conv_id",
        (F.col("turn_idx") / F.lit(block)).cast("int").alias("block"),
        "turn_idx",
        "text",
    )
    partial = blocked.groupBy("conv_id", "block").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda s: s["text"],
            ),
            TURN_SEPARATOR,
        ).alias("block_text")
    )
    return partial.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("block", "block_text"))),
                lambda s: s["block_text"],
            ),
            TURN_SEPARATOR,
        ).alias("content")
    )


def stable_turns(transcripts: DataFrame) -> DataFrame:
    """Pass-through of turns with a stable global position per conversation
    (reference token-id sequencing analog, xml_utils.py:190-215): the
    per-turn text column is untouched (byte-equality invariant)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return transcripts.withColumn("turn_seq", F.row_number().over(w))
