"""Unit tests for text_analysis.build_vocab — the distributed
zipWithIndex rank must equal the plain global rank exactly (tokens are
unique, so the order is tie-free and total). The sf0.01 hash parity vs
the DuckDB single-window oracle runs in the CI catalog gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from multilingual_wiki_event_pipeline_spark.operators import text_analysis


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_vocab_rank_and_counts(spark):
    rows = [
        (1, "b a a"),
        (2, "a c b"),
        (3, "c b b"),
    ]
    got = {r["token"]: r for r in
           text_analysis.build_vocab(_docs(spark, rows)).collect()}
    # counts: a=3(2 docs), b=4(3 docs), c=2(2 docs)
    assert (got["b"]["n_occurrences"], got["b"]["n_docs"]) == (4, 3)
    assert (got["a"]["n_occurrences"], got["a"]["n_docs"]) == (3, 2)
    assert (got["c"]["n_occurrences"], got["c"]["n_docs"]) == (2, 2)
    # rank: count desc, token asc
    assert [got[t]["token_id"] for t in ("b", "a", "c")] == [0, 1, 2]


def test_build_vocab_min_count(spark):
    rows = [(1, "x x y")]
    got = text_analysis.build_vocab(_docs(spark, rows), min_count=2)
    assert [(r["token"], r["token_id"]) for r in got.collect()] == [("x", 0)]


def test_build_vocab_matches_single_window_rank(spark):
    # a corpus wide enough to spread over many range partitions; the
    # two-phase distributed rank must equal the one-window global rank
    rows = [
        (i, " ".join(f"tok{(i * 7 + j) % 97}" for j in range(20)))
        for i in range(300)
    ]
    d = _docs(spark, rows)
    got = text_analysis.build_vocab(d)
    from pyspark.sql import Window

    expected = (
        d.select(F.explode(F.split("text", " ")).alias("token"), "doc_id")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"),
             F.count_distinct("doc_id").alias("n_docs"))
        .withColumn(
            "token_id",
            F.row_number().over(
                Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
            ).cast("long") - 1,
        )
    )
    g = sorted(map(tuple, got.select("token", "n_occurrences", "n_docs",
                                     "token_id").collect()))
    e = sorted(map(tuple, expected.select("token", "n_occurrences", "n_docs",
                                          "token_id").collect()))
    assert g == e
    # ids are a contiguous 0..N-1 permutation
    ids = sorted(r[3] for r in g)
    assert ids == list(range(len(g)))
