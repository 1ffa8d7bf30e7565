"""Text-analysis operators for training-data curation.

All pure built-in-expression plans over ``documents(doc_id, text, lang,
source, n_chars)`` — no UDFs, so they stay inside whole-stage codegen and
predicate pushdown keeps working around them.

- profile-based language/domain ID (marker-token scoring + argmax; swap the
  marker lists for per-language char-n-gram profiles on real data),
- quality scoring (length / stopword-ratio / token-length composite),
- token counting (whitespace + regex token classes + a bytes/4 BPE proxy),
- document fingerprinting (normalized md5 + distinct 3-shingle count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (profile_name, marker tokens). Deterministic tie order = list order.
PROFILES: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of"]),
    ("query", ["query", "join", "table"]),
    ("stream", ["stream", "batch", "window"]),
]

STOPWORDS = ["the", "a", "of", "in"]


def _profile_score(padded: Column, markers: list[str]) -> Column:
    score = F.lit(0)
    for m in markers:
        score = score + F.when(padded.like(f"% {m} %"), 1).otherwise(0)
    return score


def profile_id(documents: DataFrame) -> DataFrame:
    """Argmax marker-profile classifier (language-ID mechanics).

    Output: (doc_id, pred_profile, s_<name>...). Scores are LIKE-based
    presence counts; argmax ties resolve in PROFILES order.
    """
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    df = documents.select(
        "doc_id",
        *[
            _profile_score(padded, markers).cast("long").alias(f"s_{name}")
            for name, markers in PROFILES
        ],
    )
    names = [name for name, _ in PROFILES]
    pred = None
    for i, name in enumerate(names[:-1]):
        cond = None
        for other in names[i + 1:]:
            c = F.col(f"s_{name}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, name) if pred is None else pred.when(cond, name)
    pred = pred.otherwise(names[-1])
    return df.select(
        "doc_id", pred.alias("pred_profile"),
        *[f"s_{n}" for n in names],
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score in [0,1] from cheap lexical statistics."""
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    avg_len = sum_len * F.lit(1.0) / n_tokens
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
        * F.lit(1.0)
        / n_tokens
    )
    quality = F.round(
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * stop_ratio
        + 0.3 * F.least(avg_len / F.lit(8.0), F.lit(1.0)),
        4,
    )
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens, regex word/number tokens, and a BPE-ish proxy
    (bytes/4 — the standard chars-per-token estimate)."""
    return documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), F.lit(0))
        ).cast("long").alias("re_tokens"),
        F.floor(F.length("text") / 4).cast("long").alias("approx_bpe"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Normalized-content fingerprint + distinct 3-shingle count.

    fp = md5(lower, whitespace-collapsed text); shingle count feeds
    near-dup scoring (MinHash consumes the same shingle stream).
    """
    toks = F.split(
        F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " "
    )
    shingle = lambda t, i: F.md5(  # noqa: E731
        F.concat_ws(
            " ",
            F.element_at(t, i),
            F.element_at(t, i + 1),
            F.element_at(t, i + 2),
        ).cast("binary")
    )
    n_shingles = F.when(
        F.size(toks) >= 3,
        F.size(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 2),
                    lambda i: shingle(toks, i),
                )
            )
        ),
    ).otherwise(0)
    return documents.select(
        "doc_id",
        F.md5(F.array_join(toks, " ").cast("binary")).alias("fp"),
        n_shingles.cast("long").alias("n_distinct_shingles"),
    )


def build_vocab(documents: DataFrame, min_count: int = 1) -> DataFrame:
    """Corpus vocabulary with deterministic frequency-ranked ids — the
    tokenizer-training / embedding-table precursor every pretraining
    pipeline runs once per corpus.

    Output: (token, n_occurrences, n_docs, token_id) where token_id is the
    0-based rank under (n_occurrences DESC, token ASC) — a total order
    (tokens are unique), so ids are reproducible across runs and cluster
    sizes.

    Scale shape: the corpus is touched once (map-side explode + partial
    agg; doc-frequency is exact count(distinct doc_id) — swap in
    approx_count_distinct for a one-pass estimate at extreme scale). The
    RANKING never sorts the vocabulary into one partition (the bm25-audit
    rule: no 1-partition window over data-sized frames): it is the
    distributed zipWithIndex — ``repartitionByRange`` +
    ``sortWithinPartitions`` on the rank key, per-partition local indexes
    from ``monotonically_increasing_id`` (documented layout: pid << 33 |
    row-index-within-partition, so ``id % 2^33`` IS the local 0-based
    index), and cross-partition offsets from a broadcast prefix sum over
    the tiny per-partition-count frame. Range boundaries are sampled, but
    the global rank is invariant to where they land: partitions are
    contiguous ranges of a tie-free total order.
    """
    from pyspark.sql import Window

    counts = (
        documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )
    # localCheckpoint pins ONE evaluation of the sampled range boundaries
    # and the nondeterministic ids: `ordered` feeds both the offset frame
    # and the final join, and a recomputation with re-sampled boundaries
    # between the two would misalign them (ReuseExchange usually dedupes,
    # but correctness must not ride on an optimizer heuristic).
    ordered = (
        counts.repartitionByRange(F.desc("n_occurrences"), F.asc("token"))
        .sortWithinPartitions(F.desc("n_occurrences"), F.asc("token"))
        .withColumn("pid", F.spark_partition_id())
        .withColumn(
            "local_ix", F.monotonically_increasing_id() % F.lit(2**33)
        )
        .localCheckpoint()
    )
    per_pid = ordered.groupBy("pid").agg(F.count("*").alias("pn"))
    wp = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_pid.select(
        "pid", F.coalesce(F.sum("pn").over(wp), F.lit(0)).alias("poff")
    )
    return ordered.join(F.broadcast(offsets), "pid").select(
        "token",
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("poff") + F.col("local_ix")).cast("long").alias("token_id"),
    )
