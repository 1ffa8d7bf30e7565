"""BM25 top-k retrieval: hand-computed scores on a tiny corpus.

The catalog entry is additionally hash-checked against the generated
DuckDB oracle SQL by the full-catalog gate (test_catalog_oracle.py);
this file pins the SEMANTICS against by-hand Okapi BM25 arithmetic so
both engines can't be wrong together.
"""

from __future__ import annotations

import math

import pytest

from multilingual_wiki_event_pipeline_spark.operators.retrieval import (
    bm25_topk,
)

K1, B = 1.2, 0.75

DOCS = [
    # doc 0: 'spark' twice in 4 tokens — high tf, short doc
    (0, "spark spark join fast"),
    # doc 1: 'spark' once in 8 tokens
    (1, "spark is a tool for big data work"),
    # doc 2: no query term
    (2, "completely unrelated text here"),
    # doc 3: 'merge' once (rare term -> high idf)
    (3, "merge sort is stable"),
]


def _tok(s: str) -> list[str]:
    import re

    return re.findall("[a-z0-9]+", s.lower())


def _bm25(query: list[str]) -> dict[int, float]:
    toks = {d: _tok(t) for d, t in DOCS}
    n = float(len(DOCS))
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        score = 0.0
        for q in query:
            tf = float(t.count(q))
            df = float(sum(q in tt for tt in toks.values()))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score += idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * len(t) / avgdl)
            )
        out[d] = score
    return out


def test_bm25_matches_hand_arithmetic(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in bm25_topk(docs, ["spark", "merge"], k=10).collect()
    }
    want = _bm25(["spark", "merge"])

    assert set(got) == {0, 1, 3}  # doc 2 has no hit and must not rank
    for d in got:
        assert got[d]["score"] == pytest.approx(want[d], abs=1e-6)
    # rare 'merge' (df=1, idf 1.204) outscores even the doubled-tf
    # 'spark' doc (df=2, idf 0.693) — idf dominates tf saturation
    assert got[3]["score"] > got[0]["score"] > got[1]["score"]
    assert got[0]["n_hits"] == 1 and got[0]["dl"] == 4


def test_bm25_topk_truncates_deterministically(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    top1 = bm25_topk(docs, ["spark", "merge"], k=1).collect()
    assert [r["doc_id"] for r in top1] == [3]


def test_bm25_rejects_bad_queries(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="at least one"):
        bm25_topk(docs, [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_topk(docs, ["spark", "spark"])
    # uppercase/punctuated terms can never match tokenizer output (and
    # would reach the generated oracle SQL unescaped) — reject early
    with pytest.raises(ValueError, match="lowercase tokenizer"):
        bm25_topk(docs, ["Spark"])
    from multilingual_wiki_event_pipeline_spark.operators.retrieval import (
        bm25_topk_sql,
    )

    with pytest.raises(ValueError, match="lowercase tokenizer"):
        bm25_topk_sql(["o'brien"])
