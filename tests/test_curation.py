"""Unit tests for operators/curation.py — PII redaction, repetition
stats, n-gram decontamination. The sf0.01 hash parity vs DuckDB runs in
the CI catalog gate (test_catalog_oracle.py); these pin edge cases the
driver corpus doesn't exercise (empty/short docs, degenerate repetition,
self-clean eval sets)."""

from __future__ import annotations

from multilingual_wiki_event_pipeline_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_all_classes(spark):
    rows = _docs(spark, [
        (1, "mail bob.smith+x@sub.example.org now"),
        (2, "host 192.168.0.1 and 10.0.0.255 up"),
        (3, "call +1-555-0100 or +44-123-4567"),
        (4, "no pii here at all"),
    ]).sortWithinPartitions("doc_id")
    out = {r["doc_id"]: r for r in curation.redact_pii(rows).collect()}
    assert out[1]["redacted"] == "mail <EMAIL> now"
    assert out[1]["n_emails"] == 1 and out[1]["n_ipv4"] == 0
    assert out[2]["redacted"] == "host <IP> and <IP> up"
    assert out[2]["n_ipv4"] == 2
    assert out[3]["redacted"] == "call <PHONE> or <PHONE>"
    assert out[3]["n_phones"] == 2
    assert out[4]["redacted"] == "no pii here at all"
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (0, 0, 0)


def test_redact_pii_email_before_ip_ordering(spark):
    # an address whose domain is dotted-numeric-ish must be consumed by
    # the email pass, not half-eaten by the IPv4 pass
    rows = _docs(spark, [(1, "x a@b12.cd y 1.2.3.4 z")])
    r = curation.redact_pii(rows).collect()[0]
    assert r["redacted"] == "x <EMAIL> y <IP> z"


def test_repetition_stats_degenerate(spark):
    rows = _docs(spark, [
        (1, "spam spam spam spam"),   # one distinct token
        (2, "one"),                   # too short for bigrams
        (3, "a b c d"),               # all distinct
    ])
    # top_bigram_max=0.5: on 4-token docs every distinct bigram carries
    # 1/3 mass, so the catalog default (0.18, sized for ~60-token docs)
    # would flag even the all-distinct doc — thresholds are per-corpus
    out = {r["doc_id"]: r for r in
           curation.repetition_stats(rows, top_bigram_max=0.5).collect()}
    assert out[1]["dup_word_frac"] == 0.75
    assert out[1]["top_bigram_frac"] == 1.0 and out[1]["repetitive"]
    assert out[2]["top_bigram_frac"] == 0.0
    assert out[2]["top_trigram_frac"] == 0.0
    assert out[3]["dup_word_frac"] == 0.0
    assert out[3]["top_bigram_frac"] == round(1.0 / 3, 4)
    assert not out[3]["repetitive"]


def test_ngram_decontaminate_hits_and_misses(spark):
    eval_set = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    corpus = _docs(spark, [
        (1, "x alpha beta gamma delta y"),   # shares one 4-gram
        (2, "alpha beta gamma x delta"),     # trigram overlap only
        (3, "short doc"),                    # < n tokens
    ])
    out = {r["doc_id"]: r for r in
           curation.ngram_decontaminate(corpus, eval_set, n=4).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["contaminated"]
    assert len(out) == 3  # every corpus doc gets a row


def test_ngram_decontaminate_counts_distinct(spark):
    # the same contaminated n-gram repeated in a doc counts once
    eval_set = _docs(spark, [(100, "a b c d")])
    corpus = _docs(spark, [(1, "a b c d a b c d")])
    r = curation.ngram_decontaminate(corpus, eval_set, n=4).collect()[0]
    assert r["n_hits"] == 1


def test_duplicate_span_stats_semantics(spark):
    """ExactSubstr semantics: a window is duplicated when its exact text
    occurs >1 time corpus-wide, INCLUDING twice within one document;
    docs shorter than n tokens are omitted (no windows to classify)."""
    from multilingual_wiki_event_pipeline_spark.operators import text_dedup

    rows = _docs(spark, [
        # docs 1 and 2 share the 3-gram "x y z"; their other windows are
        # unique ("a x y" / "b x y", "y z a" / "y z b")
        (1, "a x y z a"),
        (2, "b x y z b"),
        # doc 3 repeats "p q r" internally: windows at pos 1 and 4
        (3, "p q r p q r"),
        # doc 4 is all-unique windows
        (4, "u v w t s"),
        # doc 5 is too short for any 3-token window
        (5, "m n"),
    ])
    out = {
        r["doc_id"]: r
        for r in text_dedup.duplicate_span_stats(rows, n=3).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # doc 5 omitted
    assert (out[1]["n_windows"], out[1]["n_dup_windows"]) == (3, 1)
    assert (out[2]["n_windows"], out[2]["n_dup_windows"]) == (3, 1)
    # doc 3: windows p-q-r, q-r-p, r-p-q, p-q-r -> the two "p q r"
    # occurrences are duplicates of EACH OTHER (within-doc)
    assert (out[3]["n_windows"], out[3]["n_dup_windows"]) == (4, 2)
    assert (out[4]["n_windows"], out[4]["n_dup_windows"]) == (3, 0)
    assert out[3]["dup_frac"] == 0.5
    assert out[4]["dup_frac"] == 0.0


def test_duplicate_span_stats_vs_bruteforce(spark):
    """Seeded random corpus vs a brute-force Python model of ExactSubstr:
    per-doc window/dup counts must match exactly for n in {2, 5}."""
    import random
    from collections import Counter

    from multilingual_wiki_event_pipeline_spark.operators import text_dedup

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab -> dense collisions
    corpus = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(40)
    ]
    for n in (2, 5):
        grams: dict[int, list[str]] = {}
        for doc_id, text in corpus:
            toks = text.split(" ") if text else [""]
            grams[doc_id] = [
                " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
            ]
        totals = Counter(g for gs in grams.values() for g in gs)
        expect = {
            doc_id: (
                len(gs),
                sum(1 for g in gs if totals[g] >= 2),
            )
            for doc_id, gs in grams.items() if gs
        }
        out = {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in text_dedup.duplicate_span_stats(
                _docs(spark, corpus), n=n
            ).collect()
        }
        assert out == expect


def test_remove_duplicate_spans_semantics(spark):
    """Winner election and overlap policy: the globally-first (min
    (doc_id,pos)) occurrence of a duplicated window keeps its tokens;
    every token covered by a losing occurrence is removed; short docs
    pass through untouched."""
    from multilingual_wiki_event_pipeline_spark.operators import text_dedup

    rows = _docs(spark, [
        (1, "a x y z a"),      # "x y z" winner (doc 1, pos 2)
        (2, "b x y z b"),      # loser: x y z removed -> "b b"
        (3, "p q r p q r"),    # within-doc: pos-1 "p q r" wins, pos-4 loses
        (4, "m n"),            # too short: passthrough
    ])
    out = {
        r["doc_id"]: r
        for r in text_dedup.remove_duplicate_spans(rows, n=3).collect()
    }
    assert out[1]["clean_text"] == "a x y z a"
    assert out[1]["n_removed_tokens"] == 0
    assert out[2]["clean_text"] == "b b"
    assert out[2]["n_removed_tokens"] == 3
    # doc 3: losing occurrence covers positions 4-6 only ("q r p"/"r p q"
    # are unique, "p q r"@4 loses to @1)
    assert out[3]["clean_text"] == "p q r"
    assert out[3]["n_removed_tokens"] == 3
    assert out[4]["clean_text"] == "m n"
    assert out[4]["n_removed_tokens"] == 0


def test_remove_duplicate_spans_vs_bruteforce(spark):
    """Seeded random corpus vs a brute-force Python model of the winner
    election + covered-token removal."""
    import random
    from collections import defaultdict

    from multilingual_wiki_event_pipeline_spark.operators import text_dedup

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(5)]
    corpus = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
        for i in range(40)
    ]
    n = 3
    occs = defaultdict(list)  # ng -> [(doc_id, pos1based)]
    toks_of = {}
    for doc_id, text in corpus:
        toks = text.split(" ") if text else [""]
        toks_of[doc_id] = toks
        for p in range(len(toks) - n + 1):
            occs[" ".join(toks[p:p + n])].append((doc_id, p + 1))
    covered = defaultdict(set)
    for ng, lst in occs.items():
        if len(lst) >= 2:
            win = min(lst)
            for doc_id, p in lst:
                if (doc_id, p) != win:
                    covered[doc_id].update(range(p, p + n))
    expect = {}
    for doc_id, toks in toks_of.items():
        keep = [t for i, t in enumerate(toks, 1)
                if i not in covered[doc_id]]
        expect[doc_id] = (" ".join(keep), len(covered[doc_id]))
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
        for r in text_dedup.remove_duplicate_spans(
            _docs(spark, corpus), n=n
        ).collect()
    }
    assert out == expect


def test_unigram_logprob_hand_computed(spark):
    import math

    # corpus: 6 tokens total — a:3, b:2, c:1
    rows = _docs(spark, [
        (1, "a a b"),
        (2, "a b c"),
    ])
    out = {r["doc_id"]: r for r in curation.unigram_logprob(rows).collect()}

    def micro(cnt):
        return round(math.log(6.0 / cnt) * 1e6)

    # doc 1: 2*nll(a) + 1*nll(b); doc 2: nll(a) + nll(b) + nll(c)
    s1 = 2 * micro(3) + micro(2)
    s2 = micro(3) + micro(2) + micro(1)
    assert out[1]["n_tokens"] == 3 and out[1]["sum_nll_micro"] == s1
    assert out[2]["n_tokens"] == 3 and out[2]["sum_nll_micro"] == s2
    assert out[1]["avg_nll"] == round(s1 / 3 / 1e6, 6)
    # the rare-token doc scores strictly worse (higher mean nll)
    assert out[2]["avg_nll"] > out[1]["avg_nll"]


def test_unigram_logprob_repeated_tokens_weighting(spark):
    # occurrences (not distinct tokens) weight the sum: "a a a a" counts
    # nll(a) four times, and a uniform single-token corpus scores 0
    rows = _docs(spark, [(1, "a a a a")])
    r = curation.unigram_logprob(rows).collect()[0]
    assert r["n_tokens"] == 4
    assert r["sum_nll_micro"] == 0 and r["avg_nll"] == 0.0


def test_neardup_keep_clusters_and_singletons(spark):
    from multilingual_wiki_event_pipeline_spark.operators import text_dedup

    # docs 1/2/3 are near-identical (Jaccard 1.0 token sets, shared
    # 3-shingles), doc 10 unique, doc 11 unique
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = spark.createDataFrame(
        [
            (1, base, "en"),
            (2, base, "en"),
            (3, base, "en"),
            (10, "one two three four five six seven eight", "en"),
            (11, "red green blue cyan magenta yellow black white", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r["n_members"]
           for r in text_dedup.neardup_keep(rows, 0.9).collect()}
    # min doc_id of the cluster survives carrying its size; losers gone
    assert out == {1: 3, 10: 1, 11: 1}


def test_neardup_keep_language_partition(spark):
    from multilingual_wiki_event_pipeline_spark.operators import text_dedup

    # identical text in different languages is NOT a near-duplicate
    # (jaccard_on_candidates enforces same-language semantics)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = spark.createDataFrame(
        [(1, base, "en"), (2, base, "de")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r["n_members"]
           for r in text_dedup.neardup_keep(rows, 0.9).collect()}
    assert out == {1: 1, 2: 1}


def test_prefix_filter_pairs_is_exact(spark):
    """Prefix filtering is LOSSLESS: its verified pairs equal the full
    quadratic token self-join's pairs — no LSH-style band misses."""
    import os

    from multilingual_wiki_event_pipeline_spark.operators import text_dedup

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(docs_path):
        import pytest as _pytest

        _pytest.skip("driver testdata absent")
    docs = spark.read.parquet(docs_path)
    exact = {(r["a_id"], r["b_id"])
             for r in text_dedup.jaccard_pairs(docs, 0.9).collect()}
    pf = {(r["a_id"], r["b_id"])
          for r in text_dedup.prefix_filter_pairs(docs, 0.9).collect()}
    assert pf == exact and exact  # equal AND non-trivial on this corpus


def test_prefix_filter_pairs_threshold_one(spark):
    from multilingual_wiki_event_pipeline_spark.operators import text_dedup

    # identical token SETS (order/multiplicity differ) at t=1.0: the
    # prefix is exactly the single rarest token, and the pair still shows
    rows = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en"),
            (2, "gamma alpha beta beta", "en"),
            (3, "alpha beta delta", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = [(r["a_id"], r["b_id"], r["jaccard"])
           for r in text_dedup.prefix_filter_pairs(rows, 1.0).collect()]
    assert out == [(1, 2, 1.0)]
    import pytest

    with pytest.raises(ValueError):
        text_dedup.prefix_filter_pairs(rows, 0.0)


def test_classifier_score_hand_computed(spark):
    docs = _docs(spark, [(1, "good good bad"), (2, "oov1 oov2")])
    weights = spark.createDataFrame(
        [("good", 2_000_000), ("bad", -500_000)],
        "token string, w_micro long")
    out = {r["doc_id"]: r
           for r in curation.classifier_score(docs, weights).collect()}
    # doc 1: (2*2e6 - 5e5) / 3 tokens = 1.1666... -> positive label
    assert out[1]["n_tokens"] == 3
    assert out[1]["logit_sum_micro"] == 3_500_000
    assert out[1]["avg_logit"] == round(3_500_000 / 3 / 1e6, 6)
    assert out[1]["label"] is True
    # doc 2: all OOV -> weight 0, label False (not NULL)
    assert out[2]["logit_sum_micro"] == 0 and out[2]["label"] is False


def test_classifier_score_bias(spark):
    docs = _docs(spark, [(1, "x")])
    weights = spark.createDataFrame([("x", -100)], "token string, w_micro long")
    r = curation.classifier_score(docs, weights, bias_micro=400).collect()[0]
    assert r["logit_sum_micro"] == 300 and r["label"] is True


def test_bigram_logprob_hand_computed(spark):
    import math

    # corpus bigrams: (a b) x2 from docs 1+2, (b a) x1, (a a) x1
    # contexts: a -> 3 bigrams start with a, b -> 1
    docs = _docs(spark, [(1, "a b a a"), (2, "a b")])
    out = {r["doc_id"]: r for r in curation.bigram_logprob(docs).collect()}
    nll = {("a", "b"): round(math.log(3 / 2) * 1e6),
           ("b", "a"): round(math.log(1 / 1) * 1e6),
           ("a", "a"): round(math.log(3 / 1) * 1e6)}
    d1 = nll[("a", "b")] + nll[("b", "a")] + nll[("a", "a")]
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_nll_micro"] == d1
    assert out[1]["avg_nll"] == round(d1 / 3 / 1e6, 6)
    # doc 2's only bigram (a b) has P = 2/3
    assert out[2]["n_bigrams"] == 1
    assert out[2]["sum_nll_micro"] == nll[("a", "b")]


def test_bigram_logprob_short_docs_dropped(spark):
    docs = _docs(spark, [(1, "solo"), (2, ""), (3, "a b")])
    got = {r["doc_id"] for r in curation.bigram_logprob(docs).collect()}
    assert got == {3}
