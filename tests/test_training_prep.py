"""Unit tests for operators/training_prep.py — chunking, both packers,
mixture sampling. The sf0.01 hash parity vs DuckDB runs in the CI catalog
gate (test_catalog_oracle.py); these pin the edge cases the driver corpus
doesn't exercise (short docs, budget overflow, boundary-straddling docs,
empty mixture rates) and the packers' conservation invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from multilingual_wiki_event_pipeline_spark.operators import training_prep


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_documents_windows(spark):
    # 10 tokens, size 4, overlap 2 -> stride 2, starts 1,3,5,7 (9 > n-2=8
    # never emitted: it would add <= overlap unseen tokens)
    text = " ".join(f"w{i}" for i in range(1, 11))
    out = training_prep.chunk_documents(
        _docs(spark, [(1, text)]), size=4, overlap=2
    ).orderBy("chunk_idx").collect()
    assert [r["chunk_text"] for r in out] == [
        "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10",
    ]
    assert [r["n_toks"] for r in out] == [4, 4, 4, 4]


def test_chunk_documents_short_doc_and_tail(spark):
    out = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in training_prep.chunk_documents(
            _docs(spark, [(1, "a b"), (2, "a b c d e")]), size=4, overlap=1
        ).collect()
    }
    # doc 1: n=2 <= size -> single (short) chunk
    assert out[(1, 0)]["chunk_text"] == "a b" and out[(1, 0)]["n_toks"] == 2
    # doc 2: starts 1, 4 (stride 3); tail chunk short
    assert out[(2, 0)]["chunk_text"] == "a b c d"
    assert out[(2, 1)]["chunk_text"] == "d e" and out[(2, 1)]["n_toks"] == 2
    assert len(out) == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    with pytest.raises(ValueError):
        training_prep.chunk_documents(_docs(spark, []), size=4, overlap=4)


def test_pack_sequences_boundary_split(spark):
    # budget 5; docs of 3, 4, 2 tokens in id order -> offsets 0, 3, 7.
    # doc 2 spans the seq 0/1 cut (tokens 1-2 -> seq 0, 3-4 -> seq 1);
    # doc 3 sits inside seq 1.
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h i")]
    out = {
        (r["doc_id"], r["seq_id"]): r
        for r in training_prep.pack_sequences(
            _docs(spark, rows), budget=5, bucket_width=2
        ).collect()
    }
    assert (out[(1, 0)]["tok_start"], out[(1, 0)]["tok_end"]) == (1, 3)
    assert (out[(2, 0)]["tok_start"], out[(2, 0)]["tok_end"]) == (1, 2)
    assert (out[(2, 1)]["tok_start"], out[(2, 1)]["tok_end"]) == (3, 4)
    assert (out[(3, 1)]["tok_start"], out[(3, 1)]["tok_end"]) == (1, 2)
    assert len(out) == 4


def test_pack_sequences_conservation(spark):
    # every token lands in exactly one (seq, slice): per-doc n_toks sums
    # to the doc's token count, and each sequence except the last carries
    # exactly `budget` tokens
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(1 + i % 7))) for i in range(40)]
    packed = training_prep.pack_sequences(
        _docs(spark, rows), budget=8, bucket_width=16
    )
    per_doc = {r["doc_id"]: r["s"] for r in
               packed.groupBy("doc_id").agg(F.sum("n_toks").alias("s")).collect()}
    assert per_doc == {i: 1 + i % 7 for i in range(40)}
    per_seq = {r["seq_id"]: r["s"] for r in
               packed.groupBy("seq_id").agg(F.sum("n_toks").alias("s")).collect()}
    last = max(per_seq)
    assert all(v == 8 for s, v in per_seq.items() if s != last)
    # bucketing is execution strategy only: a different width, same result
    alt = training_prep.pack_sequences(_docs(spark, rows), budget=8,
                                       bucket_width=3)
    assert sorted(map(tuple, alt.collect())) == sorted(map(tuple, packed.collect()))


def test_pack_greedy_fold(spark):
    # one partition (n_parts=1), budget 10, sizes 4,5,3,9,2:
    # bins: [4,5] (9), [3] (3+9 would overflow), wait — greedy walks in
    # order: 4+5=9 fits; +3 -> 12 > 10 so bin 1 starts at 3; 3+9 -> 12 >
    # 10 so bin 2 = 9; 9+2 -> 11 > 10 so bin 3 = 2.
    rows = [
        (0, "a a a a"), (1, "b b b b b"), (2, "c c c"),
        (3, "d d d d d d d d d"), (4, "e e"),
    ]
    out = {r["doc_id"]: r["bin_idx"] for r in training_prep.pack_greedy(
        _docs(spark, rows), budget=10, n_parts=1).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}


def test_pack_greedy_oversized_doc_gets_own_bin(spark):
    rows = [(0, "a a"), (1, " ".join(["b"] * 12)), (2, "c c")]
    out = {r["doc_id"]: r["bin_idx"] for r in training_prep.pack_greedy(
        _docs(spark, rows), budget=5, n_parts=1).collect()}
    # doc 1 exceeds the budget alone: it still packs (overflowing its own
    # bin), never dropped or split
    assert out == {0: 0, 1: 1, 2: 2}


def test_pack_greedy_partitions_independent(spark):
    rows = [(i, " ".join(["w"] * 3)) for i in range(10)]
    out = training_prep.pack_greedy(_docs(spark, rows), budget=6, n_parts=2)
    rws = out.collect()
    assert {r["part"] for r in rws} == {0, 1}
    for part in (0, 1):
        got = sorted((r["doc_id"], r["bin_idx"]) for r in rws
                     if r["part"] == part)
        # 5 docs of 3 tokens, budget 6 -> pairs: bins 0,0,1,1,2
        assert [b for _, b in got] == [0, 0, 1, 1, 2]


def test_pack_greedy_bin_budget_invariant(spark):
    # messy sizes: every bin with more than one doc sums <= budget; only
    # single-doc bins may overflow (the oversized-doc rule)
    rows = [(i, " ".join(["w"] * (1 + (i * 13) % 23))) for i in range(120)]
    out = training_prep.pack_greedy(_docs(spark, rows), budget=16, n_parts=4)
    per_bin = (
        out.groupBy("part", "bin_idx")
        .agg(F.sum("n_toks").alias("s"), F.count("*").alias("c"))
        .collect()
    )
    for r in per_bin:
        assert r["s"] <= 16 or r["c"] == 1
    # packing is a partition of the corpus: every doc exactly once
    assert out.count() == 120 and out.select("doc_id").distinct().count() == 120


def test_param_validation(spark):
    import pytest

    d = _docs(spark, [])
    with pytest.raises(ValueError):
        training_prep.pack_sequences(d, budget=0)
    with pytest.raises(ValueError):
        training_prep.pack_sequences(d, budget=8, bucket_width=0)
    with pytest.raises(ValueError):
        training_prep.pack_greedy(d, budget=-1)
    with pytest.raises(ValueError):
        training_prep.pack_greedy(d, budget=8, n_parts=0)


def test_mixture_sample_deterministic_and_rate_shaped(spark):
    rows = [(i, "x", "en", "web" if i % 2 == 0 else "books")
            for i in range(2000)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    kept = training_prep.mixture_sample(
        d, {"web": 0.25, "books": 1.0}, seed="s1"
    )
    counts = {r["source"]: r["c"] for r in
              kept.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts["books"] == 1000            # rate 1.0 keeps everything
    assert 150 < counts["web"] < 350          # ~250 expected
    # deterministic: identical rerun, identical kept set
    again = training_prep.mixture_sample(d, {"web": 0.25, "books": 1.0},
                                         seed="s1")
    assert sorted(r["doc_id"] for r in kept.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    # a different seed reshuffles the web sample
    other = training_prep.mixture_sample(d, {"web": 0.25, "books": 1.0},
                                         seed="s2")
    assert sorted(r["doc_id"] for r in other.collect()) != \
        sorted(r["doc_id"] for r in kept.collect())


def test_sample_exact_n(spark):
    import pytest

    d = spark.createDataFrame(
        [(i, "x", "en", "web") for i in range(500)],
        "doc_id long, text string, lang string, source string",
    )
    s1 = training_prep.sample_exact_n(d, 50, seed="s")
    assert s1.count() == 50
    # deterministic and seed-sensitive
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(
        r["doc_id"] for r in training_prep.sample_exact_n(d, 50, seed="s").collect()
    )
    assert ids1 != sorted(
        r["doc_id"] for r in training_prep.sample_exact_n(d, 50, seed="t").collect()
    )
    # nested: the N-sample is a prefix of the (N+k)-sample (same coin order)
    ids2 = sorted(r["doc_id"] for r in
                  training_prep.sample_exact_n(d, 80, seed="s").collect())
    assert set(ids1) <= set(ids2)
    with pytest.raises(ValueError):
        training_prep.sample_exact_n(d, 0)


def test_mixture_sample_default_rate(spark):
    d = spark.createDataFrame(
        [(i, "x", "en", "unlisted") for i in range(400)],
        "doc_id long, text string, lang string, source string",
    )
    assert training_prep.mixture_sample(d, {"web": 1.0}, seed="s",
                                        default_rate=0.0).count() == 0
    n = training_prep.mixture_sample(d, {"web": 1.0}, seed="s",
                                     default_rate=0.5).count()
    assert 120 < n < 280


def test_mixture_temperature_flattening_and_cap(spark):
    from multilingual_wiki_event_pipeline_spark.operators.training_prep import (
        mixture_temperature,
    )

    # group A: 8 docs, group B: 2 docs; alpha=0.5 -> shares 2:1, so
    # B's target (2 of target_total 6) equals its size: the keep-all
    # cap binds exactly, while A keeps roughly half
    rows = [(i, "x", "A" if i < 8 else "B") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = mixture_temperature(docs, alpha=0.5, target_total=6,
                              group_col="source", seed="t")
    rates = {r["source"]: r["rate_e9"] for r in out.collect()}
    assert rates["B"] == 10**9                    # cap binds: keep all of B
    assert abs(rates["A"] - 5 * 10**8) < 10**3    # ~0.5, micro-pin rounding
    kept_b = out.filter("source = 'B'").count()
    assert kept_b == 2                            # rate 1.0 keeps every doc
    # deterministic: a second evaluation returns the identical set
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == sorted(r["doc_id"] for r in out.collect())


def test_mixture_temperature_alpha_one_is_proportional(spark):
    from multilingual_wiki_event_pipeline_spark.operators.training_prep import (
        mixture_temperature,
    )

    # alpha=1 -> every group's rate is target/total regardless of size
    rows = [(i, "x", "A" if i < 30 else "B") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = mixture_temperature(docs, alpha=1.0, target_total=20,
                              group_col="source", seed="t")
    rates = {r["source"]: r["rate_e9"] for r in out.collect()}
    assert rates["A"] == rates["B"] == 5 * 10**8
