"""Training-batch preparation operators — the last mile of an LLM data
pipeline, between curation/dedup and the trainer's data loader:

- **Document chunking** (``chunk_documents``): sliding token windows with
  overlap (the RAG/embedding and long-doc pretraining splitter). Pure
  array expressions — per-row ``split`` → window starts via ``sequence``
  → ``posexplode`` — no UDF, no shuffle; embarrassingly parallel.
- **Boundary-split sequence packing** (``pack_sequences``): the GPT-style
  pretraining packer — conceptually concatenate the corpus token stream
  in ``doc_id`` order and cut every ``budget`` tokens; a document spanning
  a cut contributes a slice to each sequence it intersects. The global
  token offset is a distributed two-phase prefix sum (per-range-bucket
  partials → tiny bucket-prefix frame → broadcast back), so the fact
  table is never globally sorted into one partition: the only
  single-partition window runs over the ~(corpus/bucket_width)-row bucket
  frame.
- **Greedy no-split packing** (``pack_greedy``): the SFT-style packer —
  whole documents first-fit into fixed-budget bins, never split. The scan
  is inherently sequential, so it runs partition-locally: documents are
  assigned to ``n_parts`` explicit partitions and each partition packs
  independently in ``doc_id`` order inside one Arrow-batched
  ``applyInPandas`` group (a per-GROUP numpy pass, not per-row Python;
  parallelism = ``n_parts``). The same decisions are reproducible in SQL
  via a recursive CTE, which the catalog oracle uses.
- **Mixture sampling** (``mixture_sample``): deterministic per-domain
  Bernoulli sampling for data-mixture weighting — keep a document iff
  ``hash(seed, doc_id) / 2^32 < rate(source)``. The hash is the first 8
  hex digits of md5, identical in Spark and DuckDB, so the sample is
  reproducible across engines and reruns (no RNG state anywhere); rates
  arrive as a broadcast dimension join, one narrow pass over the corpus.

Reference context: the reference pipeline has no trainer-facing stage
(it stops at NAF/RDF serialization); these operators are the engine's
additive LLM-pipeline surface, same tier as operators/curation.py and
operators/text_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(documents: DataFrame, size: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Sliding-window token chunks: windows of ``size`` tokens starting
    every ``size - overlap`` tokens; the final window may be short, and a
    start position beyond ``n - overlap`` is never emitted (it would carry
    at most ``overlap`` unseen tokens, all inside the previous window).

    Output: (doc_id, chunk_idx, chunk_text, n_toks), one row per window.
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap
    toks = F.split("text", " ")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - F.lit(overlap)), F.lit(stride)
    )
    d = documents.select("doc_id", toks.alias("toks"), starts.alias("starts"))
    chunk = F.slice("toks", F.col("s"), size)
    return d.select(
        "doc_id",
        F.posexplode("starts").alias("chunk_idx", "s"),
        "toks",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_toks"),
    )


def pack_sequences(documents: DataFrame, budget: int = 512,
                   bucket_width: int = 64) -> DataFrame:
    """Boundary-split packing: cut the doc_id-ordered corpus token stream
    every ``budget`` tokens. Output one row per (document × training
    sequence it intersects): (doc_id, seq_id, tok_start, tok_end, n_toks)
    with tok_start/tok_end 1-based inclusive within the document.

    The global token offset is a two-phase prefix sum keyed by the range
    bucket ``doc_id // bucket_width``: per-bucket token subtotals (one
    partial agg), an ordered prefix over the resulting bucket frame (tiny
    — corpus/bucket_width rows, the only single-partition window), a
    broadcast join back, then a within-bucket cumulative window. No
    global sort of the fact table at any scale; size ``bucket_width`` so
    the bucket frame stays driver-broadcastable (10^12 docs / 10^6 width
    = 10^6 buckets).
    """
    from pyspark.sql import Window

    if budget <= 0 or bucket_width <= 0:
        raise ValueError("require budget > 0 and bucket_width > 0")
    d = documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n"),
        (F.col("doc_id") / bucket_width).cast("long").alias("b"),
    )
    bucket_totals = d.groupBy("b").agg(F.sum("n").alias("bt"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bucket_prefix = bucket_totals.select(
        "b", F.coalesce(F.sum("bt").over(wb), F.lit(0)).alias("pb")
    )
    wd = Window.partitionBy("b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = (F.col("pb") + F.coalesce(F.sum("n").over(wd), F.lit(0))).alias("off")
    placed = d.join(F.broadcast(bucket_prefix), "b").select(
        "doc_id", "n", off
    )
    seq = F.col("seq_id")
    tok_start = F.greatest(seq * budget - F.col("off"), F.lit(0)) + 1
    tok_end = F.least((seq + 1) * budget - F.col("off"), F.col("n"))
    return (
        placed.select(
            "doc_id", "n", "off",
            F.explode(
                F.sequence(
                    F.floor(F.col("off") / budget),
                    F.floor((F.col("off") + F.col("n") - 1) / budget),
                )
            ).alias("seq_id"),
        )
        .select(
            "doc_id",
            seq.cast("long").alias("seq_id"),
            tok_start.cast("long").alias("tok_start"),
            tok_end.cast("long").alias("tok_end"),
            (tok_end - tok_start + 1).cast("long").alias("n_toks"),
        )
    )


PACK_GREEDY_SCHEMA = "doc_id long, part int, bin_idx long, n_toks long"


def pack_greedy(documents: DataFrame, budget: int = 512,
                n_parts: int = 8) -> DataFrame:
    """No-split first-fit-next packing: within each of ``n_parts``
    explicit partitions (``doc_id % n_parts``), walk documents in
    ``doc_id`` order keeping a running token total; when adding a document
    would exceed ``budget``, close the bin and start the next. A document
    alone in a fresh bin always fits (even one longer than the budget —
    it overflows its own bin rather than being dropped or split).

    Output: (doc_id, part, bin_idx, n_toks) — bin ids are per-partition
    (global bin key = (part, bin_idx)). The scan is inherently sequential
    per partition, so parallelism = ``n_parts``; inside a partition the
    fold is one numpy pass over the group's Arrow batch, not per-row
    Python UDF dispatch. Deterministic: no RNG, ordering pinned by
    (part, doc_id) — the catalog's DuckDB twin replays the identical
    decisions as a recursive CTE.
    """
    import pandas as pd

    if budget <= 0 or n_parts <= 0:
        raise ValueError("require budget > 0 and n_parts > 0")

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        ns = pdf["n_toks"].to_numpy()
        bins = []
        bin_idx, cum = 0, 0
        for n in ns:  # sequential by construction (running-total reset)
            if cum + n > budget and cum > 0:
                bin_idx += 1
                cum = 0
            cum += n
            bins.append(bin_idx)
        pdf["bin_idx"] = bins
        return pdf[["doc_id", "part", "bin_idx", "n_toks"]]

    d = documents.select(
        "doc_id",
        (F.col("doc_id") % n_parts).cast("int").alias("part"),
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
    )
    return d.groupBy("part").applyInPandas(fold, PACK_GREEDY_SCHEMA)


def _hash_u32(seed: str):
    """First 8 md5 hex digits of ``seed:doc_id`` as a uniform uint32 —
    the deterministic cross-engine coin (DuckDB: ``('0x' ||
    substring(md5(...), 1, 8))::BIGINT``)."""
    from ..functions.hashing import md5_u32

    return md5_u32(
        F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))


def sample_exact_n(documents: DataFrame, n: int,
                   seed: str = "sample") -> DataFrame:
    """Deterministic EXACT-size uniform sample: the ``n`` documents whose
    md5 coin (same ``hash(seed, doc_id)`` as :func:`mixture_sample`) ranks
    lowest, ties (never, md5 is injective here) on doc_id. The fixed-size
    companion to mixture sampling — ablation corpora and eval subsets are
    specified as "exactly N docs", which a Bernoulli rate cannot promise.

    Reproducible across engines, reruns, and cluster sizes; the plan is a
    distributed partial top-k (Spark's TakeOrdered / sortWithinPartitions
    + limit machinery — per-partition heaps, no global sort of the
    corpus). Output: (doc_id, lang, source) of the sampled docs.
    """
    if n <= 0:
        raise ValueError("require n > 0")
    return (
        documents.select("doc_id", "lang", "source",
                         _hash_u32(seed).alias("__coin"))
        .orderBy("__coin", "doc_id")
        .limit(n)
        .drop("__coin")
    )


def mixture_sample(documents: DataFrame, rates: dict[str, float],
                   seed: str = "mix", default_rate: float = 0.0) -> DataFrame:
    """Deterministic data-mixture sampling: keep a document iff
    ``hash(seed, doc_id) < rate(source) * 2^32``, with per-source rates
    (domains absent from ``rates`` get ``default_rate``). Reproducible
    across engines, reruns, and cluster sizes — the decision depends only
    on (seed, doc_id, source), never on partitioning or RNG state.

    ``rates`` joins in as a broadcast dimension (a mixture spec is tiny);
    the corpus side is one narrow filtered pass. Output: the kept rows'
    (doc_id, lang, source).
    """
    spark = documents.sparkSession
    dim = spark.createDataFrame(
        [(s, int(min(max(r, 0.0), 1.0) * 2**32)) for s, r in sorted(rates.items())],
        "source string, thresh long",
    )
    default_thresh = int(min(max(default_rate, 0.0), 1.0) * 2**32)
    return (
        documents.select("doc_id", "lang", "source")
        .join(F.broadcast(dim), "source", "left")
        .filter(_hash_u32(seed) < F.coalesce("thresh", F.lit(default_thresh)))
        .select("doc_id", "lang", "source")
    )


def sample_stratified(documents: DataFrame, n_per_group: int,
                      group_col: str = "source", seed: str = "strat",
                      n_salt: int = 8) -> DataFrame:
    """Deterministic EXACT-size-per-stratum sample: the ``n_per_group``
    documents with the lowest md5 coin (same ``hash(seed, doc_id)`` family
    as :func:`mixture_sample`) within each ``group_col`` value, ties on
    doc_id. The per-source-cap companion to :func:`sample_exact_n` —
    mixture specs are often stated as "at most N docs per source", which
    neither a Bernoulli rate nor a global top-N can promise. Groups
    smaller than ``n_per_group`` return whole.

    Skew-safe per-group top-k (a hot source must not serialize onto one
    window partition): phase 1 ranks within ``(group, salt)`` — the
    deterministic salt ``doc_id % n_salt`` splits each stratum across
    ``n_salt`` window partitions and keeps only each shard's local top-n;
    phase 2 re-ranks the surviving ≤ n_salt·n rows per group, a
    negligible window. The result is identical to the plain per-group
    row_number (the DuckDB oracle's QUALIFY), so the hash gate proves the
    salting is execution-only. Output: (doc_id, lang, source).
    """
    from pyspark.sql import Window

    if n_per_group <= 0:
        raise ValueError("require n_per_group > 0")
    coined = documents.select(
        "doc_id", "lang", "source",
        _hash_u32(seed).alias("__coin"),
        F.pmod(F.col("doc_id"), F.lit(n_salt)).alias("__salt"),
    )
    w_local = Window.partitionBy(group_col, "__salt").orderBy(
        "__coin", "doc_id")
    w_group = Window.partitionBy(group_col).orderBy("__coin", "doc_id")
    return (
        coined.withColumn("__r", F.row_number().over(w_local))
        .filter(F.col("__r") <= n_per_group)
        .withColumn("__r", F.row_number().over(w_group))
        .filter(F.col("__r") <= n_per_group)
        .select("doc_id", "lang", "source")
    )


def mixture_temperature(documents: DataFrame, alpha: float = 0.5,
                        target_total: int = 1000,
                        group_col: str = "source",
                        seed: str = "mix") -> DataFrame:
    """Temperature-based mixture sampling (the multilingual-pretraining
    standard: mT5 / XLM-R sample language g with probability proportional
    to n_g^alpha, alpha < 1 flattening the Zipf head so low-resource
    groups are not drowned; UniMax is the capped refinement): derive the
    per-group rate FROM the corpus itself instead of taking a hand-written
    spec (:func:`mixture_sample` is the fixed-spec sibling).

    Group g's expected OUTPUT share is n_g^alpha / sum_h n_h^alpha, so
    its per-document keep rate is ``min(1, target_total * n_g^alpha /
    (sum_h n_h^alpha) / n_g)`` — the cap binds for groups too small to
    deliver their temperature share (they contribute everything they
    have; the shortfall is NOT redistributed, matching the simple
    one-pass semantics a spec author expects).

    Cross-engine determinism: ``pow`` is the one non-correctly-rounded
    float op either engine runs, so each group weight is pinned to
    integer micro-units immediately (``round(n^alpha * 1e6)``); the
    weight total is then an exact integer sum, and the final rate is
    computed float from exact-integer operands in ONE fixed association
    (identical expression text in the DuckDB twin — IEEE * and / are
    correctly rounded, so identical operands + order = identical bits),
    pinned to integer e9. The keep decision is the shared md5_u32 coin
    in pure BIGINT arithmetic: ``coin * 1e9 < rate_e9 * 2^32``.

    Output: kept rows' (doc_id, lang, source, rate_e9).

    Scale shape: one partial+final count per group, two tiny broadcast
    dims (per-group weights, 1-row total), one narrow filtered pass over
    the corpus — the same join-a-broadcast-rate-dimension plan as
    mixture_sample, with the spec computed relationally upstream.
    """
    counts = documents.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_g"))
    w = counts.select(
        "g", "n_g",
        F.round(
            F.pow(F.col("n_g").cast("double"), F.lit(float(alpha)))
            * F.lit(1e6)
        ).cast("long").alias("w_micro"),
    )
    tot = w.agg(F.sum("w_micro").alias("w_tot"))
    rate_e9 = F.least(
        F.lit(10**9),
        F.round(
            F.lit(float(target_total)) * F.lit(1e9) * F.col("w_micro")
            / F.col("w_tot") / F.col("n_g")
        ).cast("long"),
    )
    dim = w.crossJoin(F.broadcast(tot)).select("g", rate_e9.alias("rate_e9"))
    return (
        documents.select("doc_id", "lang", "source")
        .join(F.broadcast(dim), F.col(group_col) == F.col("g"))
        .filter(_hash_u32(seed) * F.lit(10**9)
                < F.col("rate_e9") * F.lit(2**32))
        .select("doc_id", "lang", "source", "rate_e9")
    )
