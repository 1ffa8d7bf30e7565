"""connected_components label propagation on known graphs (north-star
canonicalization kernel; reference analog xml_utils.py:435-447)."""

from __future__ import annotations

from multilingual_wiki_event_pipeline_spark.operators.canonicalize import (
    connected_components,
    mention_similarity_edges,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r.vertex: r.component for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [("b", "a"), ("b", "c"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_chain_beyond_checkpoint_interval(spark):
    # a path graph longer than checkpoint_every exercises lineage cuts and
    # multi-round convergence
    chain = [(f"v{i:02d}", f"v{i + 1:02d}") for i in range(12)]
    got = _cc(spark, chain)
    assert set(got.values()) == {"v00"}
    assert len(got) == 13


def test_cycle(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_similarity_edges_block_by_shared_ref(spark):
    m = spark.createDataFrame(
        [
            ("c1", 1, "Alice", ["wd:Q1"]),
            ("c1", 2, "alice", ["wd:Q9"]),   # same surface, same doc -> edge
            ("c2", 3, "Bob", ["wd:Q1"]),     # shared ref with mention 1 -> edge
            ("c2", 4, "Carol", ["wd:Q7"]),   # isolated
        ],
        "conv_id string, eid int, surface string, ext_refs array<string>",
    )
    edges = {(r.src, r.dst) for r in mention_similarity_edges(m).collect()}
    comp = {
        r.vertex: r.component
        for r in connected_components(
            spark.createDataFrame(
                [(s, d) for s, d in edges], "src string, dst string"
            )
        ).collect()
    }
    # mentions 1,2 share a surface block; 1,3 share wd:Q1 -> one component
    assert comp["c1#1"] == comp["c1#2"] == comp["c2#3"]
    assert "c2#4" not in comp  # no edges -> caller keeps singleton id
