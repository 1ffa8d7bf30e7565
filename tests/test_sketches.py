"""Unit tests for the HyperLogLog distinct sketch (text_analysis.
hll_distinct) and the stratified sampler (training_prep.sample_stratified).
The sf0.01 hash parity vs DuckDB runs in the CI catalog gate; these pin
the estimator's error envelope, the linear-counting branch, and the
salting-is-execution-only property the oracle hash can't isolate."""

from __future__ import annotations

import pytest

from multilingual_wiki_event_pipeline_spark.operators import (
    text_analysis, training_prep,
)


def test_hll_rejects_unsupported_precision(spark):
    df = spark.createDataFrame([("a", "x")], "g string, v string")
    with pytest.raises(ValueError):
        text_analysis.hll_distinct(df, "g", "v", p=10)


def test_hll_small_cardinality_linear_counting(spark):
    # 3 distinct values -> far below 2.5*m with empty registers: the
    # linear-counting branch fires and lands near the exact count
    rows = [("g1", f"tok{i % 3}") for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = text_analysis.hll_distinct(df, "g", "v").collect()[0]
    assert out["exact_distinct"] == 3
    assert abs(out["est_distinct"] - 3) <= 1
    # repeats must not move the sketch: same values once each
    once = spark.createDataFrame(
        [("g1", f"tok{i}") for i in range(3)], "g string, v string")
    out2 = text_analysis.hll_distinct(once, "g", "v").collect()[0]
    assert out2["est_distinct"] == out["est_distinct"]


def test_hll_error_envelope_at_1000(spark):
    # m=64 -> theoretical std error 1.04/sqrt(64) = 13%; allow 3 sigma
    rows = [("g1", f"value_{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = text_analysis.hll_distinct(df, "g", "v").collect()[0]
    assert out["exact_distinct"] == 1000
    assert abs(out["rel_err"]) < 0.39


def test_sample_stratified_salting_is_execution_only(spark):
    rows = [(i, "en", f"src{i % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    picked = {
        salt: sorted(r["doc_id"] for r in training_prep.sample_stratified(
            df, 5, n_salt=salt).collect())
        for salt in (1, 8)
    }
    # the salted two-phase top-k and the unsalted plain window pick the
    # SAME rows — salting changes execution, never the result
    assert picked[1] == picked[8]
    assert len(picked[1]) == 20  # 4 strata x 5


def test_sample_stratified_small_groups_return_whole(spark):
    rows = [(1, "en", "a"), (2, "en", "a"), (3, "en", "b")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = sorted(r["doc_id"] for r in
                 training_prep.sample_stratified(df, 5).collect())
    assert out == [1, 2, 3]


def test_cms_overestimates_never_under(spark):
    # skewed stream: 'hot' 60x, tail values once each
    rows = ([(i, "hot") for i in range(60)]
            + [(100 + i, f"cold{i}") for i in range(30)])
    df = spark.createDataFrame(rows, "doc_id long, token string")
    out = text_analysis.cms_heavy_hitters(
        df, "token", k=50, sample_key_cols=("doc_id",)).collect()
    assert out, "no candidates sampled"
    by_tok = {r["token"]: r for r in out}
    # one-sided error: the estimate never undercounts
    assert all(r["overestimate"] >= 0 for r in out)
    # the heavy value is caught (60 distinct doc coins at rate .25:
    # miss prob (3/4)^60 ~ 3e-8) and ranks first
    assert "hot" in by_tok and by_tok["hot"]["exact_count"] == 60
    assert out[0]["token"] == "hot"
    # d=4 x w=512 over ~31 distinct values: collisions essentially nil
    assert by_tok["hot"]["est_count"] == 60


def test_cms_param_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, token string")
    with pytest.raises(ValueError):
        text_analysis.cms_heavy_hitters(df, "token", d=0)


def test_log2_quantiles_semantics(spark):
    # group of 1..100: p50 exact = 50 -> bucket bitlen(50)=6 -> est 63;
    # p99 exact = 99 -> bitlen 7 -> est 127; q=1.0 -> max
    rows = [("g", i) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["q"]: r for r in text_analysis.log2_histogram_quantiles(
        df, "g", "v", qs=(0.5, 0.99, 1.0)).collect()}
    assert (out[0.5]["exact"], out[0.5]["est"]) == (50, 63)
    assert (out[0.99]["exact"], out[0.99]["est"]) == (99, 127)
    assert (out[1.0]["exact"], out[1.0]["est"]) == (100, 127)
    # one-sided: est >= exact, within the 2x relative-error guarantee
    for r in out.values():
        assert r["exact"] <= r["est"] < 2 * r["exact"]


def test_log2_quantiles_rejects_nonpositive(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([("g", 0)], "g string, v long")
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        text_analysis.log2_histogram_quantiles(df, "g", "v").collect()
    with pytest.raises(ValueError):
        text_analysis.log2_histogram_quantiles(df, "g", "v", qs=(0.0,))


def test_bloom_no_false_negatives_and_low_fpr(spark):
    from multilingual_wiki_event_pipeline_spark.operators import bloom

    dim = spark.createDataFrame(
        [(f"key{i}",) for i in range(100)], "k string")
    filt = bloom.bloom_build(dim, "k")
    # the filter is tiny: at most m_bits/32 words
    assert filt.count() <= 4096 // 32
    members = bloom.bloom_probe(dim, "k", filt)
    assert members.filter("NOT bloom_pass").count() == 0  # no false negs
    probe = spark.createDataFrame(
        [(f"other{i}",) for i in range(1000)], "k string")
    fp = bloom.bloom_probe(probe, "k", filt).filter("bloom_pass").count()
    # theory at n=100, m=4096, k=5: ~2e-5; give it lots of slack
    assert fp < 50


def test_bloom_report_accounting(spark):
    from multilingual_wiki_event_pipeline_spark.operators import bloom

    dim = spark.createDataFrame([("a",), ("b",)], "dk string")
    facts = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("x",), ("y",)], "fk string")
    r = bloom.bloom_semijoin_report(facts, "fk", dim, "dk").collect()[0]
    assert r["n_fact"] == 5 and r["n_member"] == 3
    assert r["n_pass"] >= r["n_member"]
    assert r["n_false_pos"] == r["n_pass"] - r["n_member"]


def test_bloom_param_validation(spark):
    from multilingual_wiki_event_pipeline_spark.operators import bloom

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        bloom.bloom_build(df, "k", m_bits=100)
    with pytest.raises(ValueError):
        bloom.bloom_probe(df, "k", df, k=0)


def test_hll_registers_merge_exactly(spark):
    # mergeability: sketch(A) ⊕ sketch(B) == sketch(A ∪ B), including
    # overlap (max is idempotent) — the per-partition/per-day fold-up
    a = spark.createDataFrame(
        [("g", f"v{i}") for i in range(200)], "g string, v string")
    b = spark.createDataFrame(
        [("g", f"v{i}") for i in range(150, 400)], "g string, v string")
    whole = a.unionByName(b)
    merged = text_analysis.hll_merge(
        text_analysis.hll_registers(a, "g", "v"),
        text_analysis.hll_registers(b, "g", "v"),
    )
    est_merged = text_analysis.hll_estimate(merged).collect()[0]
    est_whole = text_analysis.hll_estimate(
        text_analysis.hll_registers(whole, "g", "v")).collect()[0]
    assert est_merged["est_distinct"] == est_whole["est_distinct"]
    with pytest.raises(ValueError):
        text_analysis.hll_merge()


def test_bloom_probe_null_keys_fail_closed(spark):
    from multilingual_wiki_event_pipeline_spark.operators import bloom

    dim = spark.createDataFrame([("a",)], "dk string")
    facts = spark.createDataFrame([("a",), (None,)], "fk string")
    filt = bloom.bloom_build(dim, "dk")
    out = {r["fk"]: r["bloom_pass"]
           for r in bloom.bloom_probe(facts, "fk", filt).collect()}
    # NULL keys survive (never dropped) and probe to false
    assert out == {"a": True, None: False}
    r = bloom.bloom_semijoin_report(facts, "fk", dim, "dk").collect()[0]
    assert (r["n_fact"], r["n_pass"], r["n_member"]) == (2, 1, 1)


def test_pivot_unpivot_roundtrip(spark):
    # the reshape pair: unpivot(pivot(x)) recovers the long-form counts
    import os

    import pytest as _pytest

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        _pytest.skip("driver testdata absent")
    from multilingual_wiki_event_pipeline_spark.catalog import (
        PIVOT_LANGS, pivot_lang_matrix,
    )
    from pyspark.sql import functions as F

    wide = pivot_lang_matrix(spark, sf)
    long = (
        wide.unpivot("source", PIVOT_LANGS, "lang", "n_docs")
        .filter(F.col("n_docs") > 0)
    )
    direct = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    assert sorted(map(tuple, long.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_morton_interleave_hand_computed(spark):
    from multilingual_wiki_event_pipeline_spark.functions.layout import (
        morton_interleave,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(3, 5), (0, 0), (65535, 65535), (-1, 2)], "x long, y long")
    out = [r["z"] for r in df.select(
        morton_interleave(F.col("x"), F.col("y")).alias("z")
    ).collect()]

    def py_morton(x, y, bits=16):
        x, y = x % (1 << bits), y % (1 << bits)
        k = 0
        for j in range(bits):
            k |= ((x >> j) & 1) << (2 * j)
            k |= ((y >> j) & 1) << (2 * j + 1)
        return k

    # 3=0b11 interleaved with 5=0b101 -> 0b100111 = 39
    assert out == [39, 0, (1 << 32) - 1, py_morton(-1 % 65536, 2)]
    with pytest.raises(ValueError):
        morton_interleave(F.col("x"), F.col("y"), bits=40)


def test_morton_locality_beats_lexicographic(spark):
    # the property z-order exists for: range-chunks of the key touch
    # BOTH dimensions' value ranges, so per-chunk min/max bounds are tight
    # in x AND y, where a lexicographic (x, y) sort leaves y unbounded
    # within every x-run. Quantified: mean per-chunk y-span is smaller
    # under z-order than under lexicographic order.
    from multilingual_wiki_event_pipeline_spark.functions.layout import (
        morton_interleave,
    )
    from pyspark.sql import functions as F

    rows = [(i % 64, (i * 7) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = df.select("x", "y", morton_interleave(
        F.col("x"), F.col("y"), bits=6).alias("k"))

    def mean_y_span(ordered_rows, n_chunks=16):
        chunk = len(ordered_rows) // n_chunks
        spans = []
        for i in range(n_chunks):
            ys = [y for (_x, y) in ordered_rows[i * chunk:(i + 1) * chunk]]
            spans.append(max(ys) - min(ys))
        return sum(spans) / len(spans)

    z_rows = [(r["x"], r["y"]) for r in
              z.orderBy("k").select("x", "y").collect()]
    lex_rows = sorted(rows)
    assert mean_y_span(z_rows) < mean_y_span(lex_rows)


def test_kmv_overlap_small_sets_exact_branch(spark):
    # fewer than k combined distinct values: the sketch IS the union and
    # every figure is exact
    rows = ([("A", f"x{i}") for i in range(10)]
            + [("B", f"x{i}") for i in range(5, 15)])
    df = spark.createDataFrame(rows, "g string, v string")
    r = text_analysis.kmv_overlap(df, "g", "v", "A", "B", k=64).collect()[0]
    assert r["exact_union"] == 15 and r["exact_inter"] == 5
    assert r["union_est"] == 15.0
    assert r["inter_est"] == round(5 / 15 * 15, 6) == 5.0


def test_kmv_overlap_estimation_branch_envelope(spark):
    # 600 distinct in A, 600 in B, 200 shared -> union 1000, jacc 0.2;
    # k=64 KMV: std error ~ 1/sqrt(k) ~ 12.5%, allow generous slack
    a = [("A", f"s{i}") for i in range(200)] + \
        [("A", f"a{i}") for i in range(400)]
    b = [("B", f"s{i}") for i in range(200)] + \
        [("B", f"b{i}") for i in range(400)]
    df = spark.createDataFrame(a + b, "g string, v string")
    r = text_analysis.kmv_overlap(df, "g", "v", "A", "B", k=64).collect()[0]
    assert r["k_used"] == 64
    assert r["exact_union"] == 1000 and r["exact_inter"] == 200
    assert 0.55 * 1000 < r["union_est"] < 1.65 * 1000
    assert 0.0 < r["jaccard_est"] < 0.5
    with pytest.raises(ValueError):
        text_analysis.kmv_registers(df, "g", "v", k=1)
