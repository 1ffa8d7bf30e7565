"""Corpus-curation operators for LLM training-data pipelines.

Three operators a 100 TB pretraining pipeline runs between ingestion and
dedup, all over ``documents(doc_id, text, ...)``:

- **PII redaction** (``redact_pii``): expression-only ``regexp_replace``
  chain (emails → IPv4 → phone-shaped numbers) plus per-class match
  counts. No UDF, no shuffle — pure per-row codegen work, so the scan
  stays pushdown-friendly and the operator is embarrassingly parallel at
  any scale.
- **Repetition statistics** (``repetition_stats``): the Gopher-style
  repetitive-text signals (duplicate-word fraction, most-frequent bigram /
  trigram mass). Computed entirely with array expressions
  (``transform``/``filter``/``aggregate``) over the token list — per-row
  O(distinct·total) on ~10²-token documents, no shuffle, no UDF.
- **N-gram decontamination** (``ngram_decontaminate``): flags corpus
  documents that share any word n-gram with an evaluation/benchmark set —
  the standard guard against test-set leakage into training data. The
  plan is the scale-correct shape: map-side explode of per-document
  DISTINCT n-gram hashes, a **broadcast** join against the (small) eval
  fingerprint set, partial-agg count per document, left join back. The
  corpus side is never collected or re-shuffled beyond the one count
  aggregation; at 100 TB the eval fingerprints (benchmarks are ~10⁴–10⁶
  n-grams) broadcast to every executor and the whole check is one pass.

Regex note: the three PII patterns are written in the common subset of
Java regex (Spark) and RE2 (DuckDB oracle) — no backreferences, no
lookaround — so both engines match identically; the catalog twin relies
on that.

Reference context: the reference pipeline curates its document store with
hand-rolled per-document Python filters (reference `utils.py`,
`clean_wiki.py` text cleanup); these operators are the equivalent
curation stage re-expressed as distributed, codegen-friendly plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns valid and equivalent in both Java regex and RE2.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"


def redact_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses, and phone-shaped numbers.

    Counts are taken on the ORIGINAL text; replacement is sequential
    (emails first, so an address' domain dots can't be half-eaten by the
    IPv4 pass). Output: doc_id, redacted, n_emails, n_ipv4, n_phones.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )

    def _n(pat: str) -> Column:
        return F.size(
            F.regexp_extract_all(text_col, F.lit(pat), F.lit(0))
        ).cast("long")

    return documents.select(
        "doc_id",
        redacted.alias("redacted"),
        _n(EMAIL_RE).alias("n_emails"),
        _n(IPV4_RE).alias("n_ipv4"),
        _n(PHONE_RE).alias("n_phones"),
    )


def _top_ngram_frac(toks: Column, n: int) -> Column:
    """Mass of the most frequent word n-gram: max count / total count.

    Array-expression mode computation — O(distinct·total) per row, fine
    for document-sized token lists; 0.0 when the doc has < n tokens.
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    top = F.array_max(
        F.transform(
            F.array_distinct(grams),
            lambda g: F.size(F.filter(grams, lambda x: x == g)),
        )
    )
    return F.when(
        F.size(toks) >= n, F.round(top * F.lit(1.0) / F.size(grams), 4)
    ).otherwise(F.lit(0.0))


def repetition_stats(
    documents: DataFrame,
    top_bigram_max: float = 0.18,
    dup_word_max: float = 0.9,
) -> DataFrame:
    """Gopher-style repetition signals + a composite ``repetitive`` flag.

    dup_word_frac = 1 − distinct/total tokens; top_{bi,tri}gram_frac =
    most-frequent-n-gram mass. The default thresholds mirror the spirit
    of the Gopher repetition rules (Rae et al. 2021, table A1) scaled to
    short synthetic documents; callers tune them per corpus.
    """
    toks = F.split("text", " ")
    n = F.size(toks)
    dup_word = F.round(
        F.lit(1.0) - F.size(F.array_distinct(toks)) * F.lit(1.0) / n, 4
    )
    top_bi = _top_ngram_frac(toks, 2)
    top_tri = _top_ngram_frac(toks, 3)
    return documents.select(
        "doc_id",
        dup_word.alias("dup_word_frac"),
        top_bi.alias("top_bigram_frac"),
        top_tri.alias("top_trigram_frac"),
        ((top_bi > top_bigram_max) | (dup_word > dup_word_max)).alias(
            "repetitive"
        ),
    )


def ngram_fingerprints(documents: DataFrame, n: int = 4) -> DataFrame:
    """(doc_id, ng) — md5 of each DISTINCT word n-gram per document.

    Distinct-before-explode keeps the exploded stream minimal (a document
    never emits the same n-gram twice), so the downstream join measures
    document-level overlap, not occurrence counts.
    """
    toks = F.split("text", " ")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.md5(F.array_join(F.slice(toks, i, n), " ").cast("binary")),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return documents.select("doc_id", F.explode(grams).alias("ng"))


def ngram_decontaminate(
    corpus: DataFrame, eval_set: DataFrame, n: int = 4
) -> DataFrame:
    """Flag corpus documents sharing any word n-gram with the eval set.

    Output: one row per corpus document — doc_id, n_hits (distinct
    contaminated n-grams), contaminated. The eval fingerprint set is
    broadcast (benchmark suites are tiny next to a training corpus), so
    the corpus side is one explode + one partial-agg count; nothing in
    the plan grows super-linearly with corpus size.
    """
    eval_fp = ngram_fingerprints(eval_set, n).select("ng").distinct()
    hits = (
        ngram_fingerprints(corpus, n)
        .join(F.broadcast(eval_fp), "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def unigram_logprob(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020 rank web text by
    LM perplexity to cut quality tiers; the unigram LM over the corpus's
    own token distribution is the training-free, engine-portable floor of
    that signal): score each document by the mean negative log-probability
    of its token stream. Low = typical/fluent for this corpus, high =
    rare-token salad — the standard perplexity-bucket signal for
    pretraining-data curation.

    Output: ``(doc_id, n_tokens, sum_nll_micro, avg_nll)`` — per-token nll
    in integer MICRO-nats (``round(ln(total/count) * 1e6)`` as BIGINT), the
    per-doc sum exact over integers, ``avg_nll = round(sum/n/1e6, 6)``.

    Cross-engine determinism (the DuckDB-oracle contract): float summation
    order never appears — the only float ops are one IEEE division, one
    ``ln``, and one final division of two exact integers, all
    order-independent, so the hash matches bit-for-bit.

    Scale shape: the token explode is map-side; the vocabulary is one
    partial+final count shuffle (map-side combine collapses repeats before
    the exchange); scoring joins per-(doc,token) COUNTS to the vocabulary —
    never per-occurrence rows — so stop-word skew reaches the join as one
    row per document per token, and AQE's skew-join split handles residual
    heavy hitters. Nothing super-linear, no UDF, whole-stage codegen
    throughout.
    """
    toks = documents.select(
        "doc_id",
        F.explode(
            F.filter(F.split(text_col, " "), lambda x: x != "")
        ).alias("token"),
    )
    per_doc = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("c"))
    vocab = per_doc.groupBy("token").agg(F.sum("c").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    nll_micro = F.round(
        F.log(F.col("total").cast("double") / F.col("cnt").cast("double"))
        * F.lit(1e6)
    ).cast("long")
    return (
        per_doc.join(vocab, "token")
        .join(F.broadcast(total))
        .select("doc_id", "c", nll_micro.alias("nll_micro"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("nll_micro")).alias("sum_nll_micro"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("sum_nll_micro").cast("long").alias("sum_nll_micro"),
            F.round(
                F.col("sum_nll_micro") / F.col("n_tokens") / F.lit(1e6), 6
            ).alias("avg_nll"),
        )
    )


def classifier_score(documents: DataFrame, weights: DataFrame,
                     text_col: str = "text",
                     bias_micro: int = 0) -> DataFrame:
    """Model-based quality filtering as RELATIONAL INFERENCE: score each
    document under a linear bag-of-words classifier (the fastText-style
    quality model DCLM / FineWeb-Edu pipelines gate pretraining data
    with), expressed entirely as a broadcast join + aggregation — model
    application at 100 TB is a JOIN against the weight table, not a UDF.

    ``weights`` is the trained model: ``(token, w_micro BIGINT)`` — one
    weight per vocabulary token in integer MICRO-units (exact integer
    arithmetic end-to-end; the only division is the final mean, so the
    DuckDB twin hash-matches bit-for-bit). Out-of-vocabulary tokens score
    0 (left join + coalesce), the standard hashing-trick fallback.

    Score = (bias + sum over token occurrences of w_micro) / n_tokens —
    the mean-of-feature-weights logit of a fastText linear head;
    ``label = avg_logit_micro > 0``.

    Output: ``(doc_id, n_tokens, logit_sum_micro, avg_logit, label)``.

    Scale shape: explode is map-side; per-(doc, token) counts collapse
    occurrences BEFORE the weight join (stop-word skew reaches the join
    as one row per doc per token); a real quality model has 1e5-1e6 rows
    -> broadcast; the final agg is partial+final on doc_id. No UDF, no
    driver round-trip, whole-stage codegen throughout.
    """
    toks = documents.select(
        "doc_id",
        F.explode(
            F.filter(F.split(text_col, " "), lambda x: x != "")
        ).alias("token"),
    )
    per_doc = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("c"))
    w = weights.select("token", F.col("w_micro").cast("long").alias("w"))
    return (
        per_doc.join(F.broadcast(w), "token", "left")
        .select("doc_id", "c", F.coalesce("w", F.lit(0)).alias("w"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            (F.sum(F.col("c") * F.col("w")) + F.lit(bias_micro))
            .alias("logit_sum_micro"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("logit_sum_micro").cast("long").alias("logit_sum_micro"),
            F.round(
                F.col("logit_sum_micro") / F.col("n_tokens") / F.lit(1e6), 6
            ).alias("avg_logit"),
            (F.col("logit_sum_micro") > 0).alias("label"),
        )
    )


def bigram_logprob(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram-LM perplexity scoring — the conditional upgrade of
    :func:`unigram_logprob` (CCNet's actual scorer is an n-gram LM;
    the bigram over the corpus's own transition counts is its
    training-free, engine-portable floor): score each document by the
    mean negative log of ``P(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1}
    as context)``. Low = typical transitions, high = incoherent word
    salad — unigram scoring cannot tell a shuffled document from the
    original; this can.

    Unsmoothed MLE is total because every scored bigram exists in the
    count table (the corpus scores itself); documents with fewer than two
    tokens have no transitions and are dropped (their fluency signal is
    undefined, and emitting 0-bigram rows would divide by zero).

    Output: ``(doc_id, n_bigrams, sum_nll_micro, avg_nll)`` — per-bigram
    nll in integer micro-nats, the per-doc sum exact over integers (same
    cross-engine determinism contract as unigram_logprob: the only float
    ops are one IEEE division, one ``ln``, one final division of exact
    integers — no float summation order anywhere).

    Scale shape: the bigram list is built per-row with array expressions
    (zero-shuffle map work); per-(doc, bigram) counts collapse repeats
    before the two count joins; the bigram vocabulary and the context
    totals are each one partial+final agg. The context join keys on the
    FIRST token only — Zipf-skewed (``the ...``), so one row per doc per
    bigram (not per occurrence) reaches it and AQE's skew split covers
    the rest. No UDF.
    """
    arr = F.filter(F.split(text_col, " "), lambda x: x != "")
    docs = documents.select("doc_id", arr.alias("arr")).filter(
        F.size("arr") >= 2)
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(slice(arr, 1, size(arr) - 1), "
                   "(x, i) -> struct(x AS w1, element_at(arr, i + 2) AS w2))")
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    per_doc = bigrams.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("c"))
    pair_cnt = per_doc.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
    ctx_cnt = pair_cnt.groupBy("w1").agg(F.sum("c12").alias("c1"))
    nll_micro = F.round(
        F.log(F.col("c1").cast("double") / F.col("c12").cast("double"))
        * F.lit(1e6)
    ).cast("long")
    return (
        per_doc.join(pair_cnt, ["w1", "w2"])
        .join(ctx_cnt, "w1")
        .select("doc_id", "c", nll_micro.alias("nll_micro"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("nll_micro")).alias("sum_nll_micro"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("sum_nll_micro").cast("long").alias("sum_nll_micro"),
            F.round(
                F.col("sum_nll_micro") / F.col("n_bigrams") / F.lit(1e6), 6
            ).alias("avg_nll"),
        )
    )
