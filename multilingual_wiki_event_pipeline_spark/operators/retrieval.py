"""Ranked retrieval over the ``documents`` table: BM25 top-k.

A training-data pipeline needs keyword retrieval for curation (pull the
docs most relevant to a topic probe, score quality-by-topic, build
contrastive negatives). The classic lexical ranker is Okapi BM25
(Robertson & Walker, SIGIR '94; the MMDS/IR-textbook formulation):

    score(D, Q) = sum_t idf(t) * tf(t,D) * (k1+1)
                  / (tf(t,D) + k1 * (1 - b + b * |D|/avgdl))
    idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Spark-first shape — sized for a 100 TB corpus and a SHORT query (the
curation case: a handful of probe terms):

- **No explode, no per-term shuffle.** A generic inverted-index build
  would ``explode`` every token (100 TB -> quadrillions of rows) and
  shuffle twice. For a fixed small query, per-document term frequencies
  are plain ARRAY expressions (``size(filter(tokens, x -> x = term))``)
  — map-side only, whole-stage codegen, zero Python.
- **One partial-aggregate pass for corpus stats.** N, avgdl, and df(t)
  per query term reduce map-side to a single row, broadcast back with
  ``crossJoin(broadcast(...))`` — the same 1-row-dimension pattern the
  stats battery uses. (At production scale these are naturally
  precomputed once per corpus snapshot and reused across queries.)
- **Distributed top-k.** ``orderBy(...).limit(k)`` compiles to
  TakeOrderedAndProject — per-partition partial top-k, no global sort,
  no single-partition window.

Scores are rounded (default 6 dp) so the DuckDB oracle hash-matches:
the sum is emitted left-to-right in query-term order on both engines,
and sub-ulp disagreement (parallel-sum avgdl) dies at the rounding.

Reference parity note: the reference pipeline has no retrieval ranker —
this extends the engine for LLM-curation workloads (same bucket as the
dedup/ANN tiers); tokenization matches ``text_analysis.token_counts``'s
regex token class (reference analog: bag-of-words over cleaned text).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "[a-z0-9]+"


def _check_terms(query_terms: list[str]) -> None:
    if not query_terms:
        raise ValueError("bm25 needs at least one query term")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError(f"duplicate query terms: {query_terms}")
    bad = [t for t in query_terms if not re.fullmatch(TOKEN_RE, t)]
    if bad:
        # an uppercase/punctuated term can never equal a tokenizer
        # output (lowercased [a-z0-9] runs) — it would silently score 0
        # everywhere; and terms are interpolated into the generated
        # oracle SQL, so the whitelist doubles as injection-proofing
        raise ValueError(
            f"query terms must match {TOKEN_RE!r} (lowercase tokenizer "
            f"output): {bad}"
        )


def bm25_topk(documents: DataFrame,
              query_terms: list[str],
              k: int = 20,
              k1: float = 1.2,
              b: float = 0.75,
              round_to: int = 6) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    Output: (doc_id, dl, n_hits, score) — document token length, number
    of distinct query terms present, rounded BM25 score; only docs with
    at least one hit rank. Ties break on doc_id (deterministic).
    """
    _check_terms(query_terms)

    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0)
    )
    def _eq(term):  # 1-arg closure: a 2-arg lambda would receive
        return lambda x: x == F.lit(term)  # (element, index) from F.filter

    tf_cols = [
        F.size(F.filter(toks, _eq(t))).cast("double").alias(f"tf_{i}")
        for i, t in enumerate(query_terms)
    ]
    d = documents.select(
        "doc_id", F.size(toks).cast("double").alias("dl"), *tf_cols
    )

    # one map-side-partial pass: N, avgdl, df per query term -> 1 row
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))

    score = F.lit(0.0)
    n_hits = F.lit(0)
    for i in range(len(query_terms)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / denom
        n_hits = n_hits + (tf > 0).cast("int")

    return (
        scored.select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            n_hits.cast("long").alias("n_hits"),
            F.round(score, round_to).alias("score"),
        )
        .filter(F.col("n_hits") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


def bm25_topk_sql(query_terms: list[str],
                  k: int = 20,
                  k1: float = 1.2,
                  b: float = 0.75,
                  round_to: int = 6) -> str:
    """DuckDB twin of :func:`bm25_topk` — generated from the SAME
    parameter list so the term order (and therefore the float-sum
    order) matches the Spark plan exactly."""
    _check_terms(query_terms)
    tf_defs = ",\n               ".join(
        f"CAST(len(list_filter(t, x -> x = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(query_terms)
    )
    df_defs = ",\n               ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1.0 ELSE 0.0 END) AS df_{i}"
        for i in range(len(query_terms))
    )
    score_terms = "\n                 + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * {k1 + 1.0!r}"
        f" / (tf_{i} + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl))"
        for i in range(len(query_terms))
    )
    hit_terms = " + ".join(
        f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(query_terms))
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
          FROM documents),
        d AS (
          SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
               {tf_defs}
          FROM toks),
        s AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl,
               {df_defs}
          FROM d)
        SELECT doc_id, CAST(dl AS BIGINT) AS dl,
               CAST({hit_terms} AS BIGINT) AS n_hits,
               ROUND({score_terms}, {round_to}) AS score
        FROM d, s
        WHERE {hit_terms} > 0
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """


def rrf_fuse(rankings: list[tuple[DataFrame, str]],
             id_col: str = "doc_id",
             k: int = 20,
             k_rrf: int = 60,
             round_to: int = 9) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR '09)
    of several BOUNDED candidate rankings into one top-k:

        rrf(d) = sum over systems s ranking d: 1 / (k_rrf + rank_s(d))

    ``rankings`` is a list of ``(df, score_col)`` pairs; each frame is a
    candidate list whose ``score_col`` is higher-is-better. Ranks are
    dense per system (row_number ordered by score desc, id asc — the
    deterministic tie-break that makes the DuckDB twin hash-match), and
    a document absent from a system simply contributes nothing, per the
    standard formulation. Output: (id, rrf, n_systems) top-k by fused
    score, ties on id.

    This is the LLM-curation hybrid: fuse a lexical ranker (BM25), an
    embedding kNN list, and/or a quality prior without score
    calibration — RRF only consumes ranks, so incomparable score scales
    compose soundly.

    Scale contract (deliberate): inputs are top-k CANDIDATE LISTS
    (hundreds of rows), not corpora — each per-system rank is a
    row_number over an unpartitioned window, which Spark runs on one
    task. That is the right plan for bounded lists (the alternative, a
    per-system shuffle-heavy ranking join, buys nothing at k ≤ 10^4);
    feeding a full corpus ranking through this raises no error but
    serializes — rank upstream with TakeOrdered first (as bm25_topk
    does). The fused aggregation itself is a plain groupBy.

    Float note: contributions are 1/(k_rrf+rank) doubles summed per id;
    with ≤ 2 systems two-term addition is exactly associative, and
    beyond that ``round_to`` (default 9 dp, values ~1e-2) absorbs
    sub-ulp ordering noise, ann_ivf-style.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from pyspark.sql import Window

    parts = []
    for df, score_col in rankings:
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        parts.append(
            df.select(
                F.col(id_col),
                F.row_number().over(w).alias("_rank"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("_rank"))),
                round_to,
            ).alias("rrf"),
            F.count("*").cast("long").alias("n_systems"),
        )
        .orderBy(F.desc("rrf"), F.col(id_col))
        .limit(k)
    )
