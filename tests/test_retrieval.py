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


def test_rrf_fuse_hand_computed(spark):
    from multilingual_wiki_event_pipeline_spark.operators.retrieval import (
        rrf_fuse,
    )
    a = spark.createDataFrame(
        [("d1", 9.0), ("d2", 5.0), ("d3", 1.0)], "doc_id string, s double"
    )
    b = spark.createDataFrame(
        [("d2", 0.9), ("d4", 0.5)], "doc_id string, q double"
    )
    got = {r.doc_id: (r.rrf, r.n_systems)
           for r in rrf_fuse([(a, "s"), (b, "q")], k=10).collect()}
    # d2: rank 2 in a, rank 1 in b -> 1/62 + 1/61
    assert got["d2"] == (round(1 / 62 + 1 / 61, 9), 2)
    assert got["d1"] == (round(1 / 61, 9), 1)
    assert got["d3"] == (round(1 / 63, 9), 1)
    assert got["d4"] == (round(1 / 62, 9), 1)
    # fused order: d2 first (two systems), then d1 (rank-1 single)
    order = [r.doc_id
             for r in rrf_fuse([(a, "s"), (b, "q")], k=10).collect()]
    assert order[:2] == ["d2", "d1"]


def test_rrf_fuse_score_ties_break_on_id(spark):
    from multilingual_wiki_event_pipeline_spark.operators.retrieval import (
        rrf_fuse,
    )
    a = spark.createDataFrame(
        [("dB", 1.0), ("dA", 1.0)], "doc_id string, s double"
    )
    got = {r.doc_id: r.rrf for r in rrf_fuse([(a, "s")], k=2).collect()}
    # equal scores: dA (smaller id) takes rank 1
    assert got == {"dA": round(1 / 61, 9), "dB": round(1 / 62, 9)}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])
