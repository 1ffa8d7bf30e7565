"""SRL-style predicate-argument triple extraction (SURVEY J7/U3 — reference
xml_utils.py:118-187).

The reference nests two loops: every (frame, role, span) from the SRL layer
x every linked-entity span; match when the entity token range is contained
in the role range (inclusive; range_overlap truth table at
xml_utils.py:184-187). Here: an interval-containment join, equi on conv_id
(shuffle-friendly — both sides hash on the document key, the non-equi range
predicate evaluates post-match within co-partitioned data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def role_spans(srl_predicates: DataFrame, srl_roles: DataFrame) -> DataFrame:
    """Union of predicate spans (role='predicate', xml_utils.py:149-150) and
    role spans, each carrying its frame."""
    preds = srl_predicates.select(
        "conv_id", "frame", F.lit("predicate").alias("srl_role"),
        "begin_tid", "end_tid",
    )
    roles = (
        srl_roles.join(
            srl_predicates.select("pred_id", "frame"), "pred_id"
        ).select(
            "conv_id", "frame", F.col("role").alias("srl_role"),
            "begin_tid", "end_tid",
        )
    )
    return preds.unionByName(roles)


def entity_frame_roles(mentions: DataFrame, spans: DataFrame) -> DataFrame:
    """J7: emit (conv_id, entity, frame, srl_role) for every entity span
    contained in a role span. ``mentions`` needs (conv_id, begin_tid,
    end_tid, uri) — uri is the first externalRef (xml_utils.py:134-138).

    Multiset semantics: one output row per matching (mention, span) pair,
    exactly like the reference's list append (xml_utils.py:161).
    """
    m = mentions.select(
        "conv_id",
        F.col("begin_tid").alias("e_begin"),
        F.col("end_tid").alias("e_end"),
        F.col("uri").alias("entity"),
    )
    return m.join(
        spans,
        (m["conv_id"] == spans["conv_id"])
        & (F.col("e_begin") >= F.col("begin_tid"))
        & (F.col("e_end") <= F.col("end_tid")),
    ).select(m["conv_id"], "entity", "frame", "srl_role")
