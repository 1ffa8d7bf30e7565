"""Relational BPE trainer (operators/bpe.py) vs a pure-Python reference
implementation of Sennrich et al.'s algorithm, plus the edge semantics
the wrapped-string merge must honor (left-to-right non-overlap,
lexicographic ties, end-of-word marker)."""

from __future__ import annotations

import random
from collections import Counter

from multilingual_wiki_event_pipeline_spark.operators import bpe


def _py_bpe(word_freq: dict[str, int], n_merges: int):
    """Reference: overlapping pair counts, (cnt desc, pair asc) argmax,
    left-to-right non-overlapping merge."""
    seqs = {w: list(w) + ["</w>"] for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += word_freq[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], counts[best]))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_matches_python_reference_random_corpus(spark):
    rng = random.Random(3)
    vocab = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
             for _ in range(30)]
    texts = [" ".join(rng.choice(vocab) for _ in range(25))
             for _ in range(12)]
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    expect, expect_seqs = _py_bpe(dict(wf), 10)

    docs = _docs(spark, texts)
    merges = bpe.bpe_merges(docs, n_merges=10)
    got = [(r["left"], r["right"], r["pair_count"])
           for r in merges.orderBy("merge_round").collect()]
    assert got == expect

    seg = {r["word"]: r["symbols_csv"].split(" ")
           for r in bpe.bpe_segment(docs, merges).collect()}
    assert seg == expect_seqs


def test_bpe_merge_is_left_to_right_nonoverlapping(spark):
    # 'aaaa' with (a,a) the only pair: left-to-right gives [aa, aa, </w>],
    # never [a, aa, a] or overlap artifacts
    docs = _docs(spark, ["aaaa"])
    merges = bpe.bpe_merges(docs, n_merges=1)
    r = merges.collect()[0]
    assert (r["left"], r["right"]) == ("a", "a")
    assert r["pair_count"] == 3          # OVERLAPPING count, per the paper
    seg = bpe.bpe_segment(docs, merges).collect()[0]
    assert seg["symbols_csv"] == "aa aa </w>"


def test_bpe_tiebreak_lexicographic(spark):
    # 'ab' and 'cd' both occur once: pairs (a,b), (c,d), (b,</w>), (d,</w>)
    # all count 1 -> lexicographically smallest (a,b) wins round 1
    docs = _docs(spark, ["ab cd"])
    r = bpe.bpe_merges(docs, n_merges=1).collect()[0]
    assert (r["left"], r["right"]) == ("a", "b")


def test_bpe_end_marker_blocks_cross_word_merges(spark):
    # 'ab' x3: after (a,b) and (ab,</w>) the word is fully fused and NO
    # further rule can form across word instances
    docs = _docs(spark, ["ab ab ab"])
    merges = bpe.bpe_merges(docs, n_merges=5)
    got = [(r["left"], r["right"]) for r in
           merges.orderBy("merge_round").collect()]
    assert got == [("a", "b"), ("ab", "</w>")]  # rounds 3-5 emit nothing


def test_bpe_state_exhaustion_semantics(spark):
    # pair-exhausted training corpus: the trainer's state empties (an
    # empty argmax cross-joins every sequence away — identical in the
    # DuckDB twin, so segment_state stays hash-consistent), while the
    # apply-rules path still segments fresh input
    docs = _docs(spark, ["ab ab ab"])
    merges, state = bpe.bpe_train_state(docs, n_merges=5)
    assert merges.count() == 2
    assert bpe.segment_state(state).count() == 0
    seg = bpe.bpe_segment(docs, merges).collect()
    assert len(seg) == 1 and seg[0]["symbols_csv"] == "ab</w>"
