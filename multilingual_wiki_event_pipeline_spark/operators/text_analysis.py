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


def _h60(value_col: str) -> Column:
    """The 60-bit md5 hash every sketch in this module keys on: first 15
    hex chars of md5(value::binary), base-16 -> BIGINT. The DuckDB oracles
    mirror this expression bit-for-bit — hll/kmv/overlap must all share
    ONE definition or an edit to one silently desynchronizes the others
    from their oracles."""
    return F.conv(
        F.substring(F.md5(F.col(value_col).cast("binary")), 1, 15), 16, 10
    ).cast("long")


def hll_distinct(rows: DataFrame, group_col: str, value_col: str,
                 p: int = 6) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007), built
    fully deterministically so the DuckDB oracle hash-matches — the
    cardinality-estimation tier for 100 TB columns where exact
    COUNT(DISTINCT) means a full shuffle of every distinct value: the
    sketch is one partial+final ``max`` aggregation over ``m = 2**p``
    registers per group (map-side combine collapses everything; the
    exchange carries ≤ m rows per group, independent of data volume).

    Mechanics (all integer until the final estimate): a 60-bit uniform
    hash from the first 15 md5 hex digits; bucket = ``h % m``; register
    value = position of the leading 1-bit in the remaining 54-bit word
    (``K - bitlen + 1``, bitlen exact via the base-2 string — no float
    log2 anywhere); the indicator sum is ``Σ 2**(SCALE - M_j)`` over
    occupied registers plus ``2**SCALE`` per empty register — dyadic
    integers, so the sum is EXACT and order-free. The only float ops are
    the one final alpha·m²·2^SCALE / S division and, in the small-range
    branch (E ≤ 2.5·m with empty registers), Flajolet's linear counting
    ``m·ln(m/V)`` — both single order-independent operations.

    Output per group: ``(group, est_distinct, exact_distinct, rel_err)``
    with the estimate rounded to 6 decimals (exact_distinct is computed
    alongside for the error report; at scale you would drop it — the
    sketch is the point).

    Only p=6 (m=64, alpha=0.709) is supported: Flajolet's alpha constants
    are per-m, and the exactness argument for the indicator sum is sized
    to 64 registers.
    """
    exact = (
        rows.select(F.col(group_col).alias("g"),
                    F.col(value_col).alias("v"))
        .groupBy("g")
        .agg(F.countDistinct("v").alias("exact_distinct"))
    )
    est = hll_estimate(hll_registers(rows, group_col, value_col, p=p))
    return (
        est.join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            F.col("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round(
                (F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"), 6
            ).alias("rel_err"),
        )
    )


_HLL_M, _HLL_ALPHA, _HLL_K = 64, 0.709, 54  # Flajolet alpha_64; 60-6 bits
_HLL_SCALE = _HLL_K + 2  # 2**(SCALE-M) stays a positive BIGINT for M<=K+1


def hll_registers(rows: DataFrame, group_col: str, value_col: str,
                  p: int = 6) -> DataFrame:
    """The sketch state itself: ``(g, bucket, M)`` max-registers per group
    — the MERGEABLE representation. Registers of disjoint (or overlapping
    — max is idempotent) row sets union via :func:`hll_merge` into the
    registers of the combined set EXACTLY, which is what lets a 100 TB
    sketch build per-partition/per-day and fold up without ever seeing
    the data twice (and why a resumable pipeline can checkpoint it)."""
    if p != 6:
        raise ValueError("hll: only p=6 (m=64) is supported")
    h60 = _h60(value_col)
    # NULL values are not elements of the set (countDistinct ignores
    # them); without this filter a NULL would fabricate a (g, NULL, NULL)
    # register that inflates n_occ without contributing to the sum
    bucketed = rows.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"), h60.alias("h")
    ).select(
        "g",
        F.expr("h % 64").alias("bucket"),
        F.expr("h div 64").alias("w"),
    )
    # leading-1 position: M = K - bitlen(w) + 1; w = 0 -> all K bits zero
    # -> M = K + 1. bitlen via length(base-2 string): exact integer path.
    bitlen = F.length(F.conv(F.col("w"), 10, 2))
    mreg = F.when(F.col("w") == 0, F.lit(_HLL_K + 1)).otherwise(
        F.lit(_HLL_K) - bitlen + F.lit(1))
    return (
        bucketed.select("g", "bucket", mreg.alias("M"))
        .groupBy("g", "bucket")
        .agg(F.max("M").alias("M"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Fold any number of register frames into one sketch: union + max per
    (g, bucket). Exact — hll_estimate(merge(regs(A), regs(B))) equals
    hll_estimate(regs(A ∪ B)) bit-for-bit (pinned by test)."""
    if not register_frames:
        raise ValueError("hll_merge: need at least one register frame")
    out = register_frames[0]
    for f in register_frames[1:]:
        out = out.unionByName(f)
    return out.groupBy("g", "bucket").agg(F.max("M").alias("M"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(g, est_distinct) from a register frame: the exact dyadic indicator
    sum, the single alpha*m^2*2^SCALE / S division, and Flajolet's
    linear-counting small-range branch — the only floats are two
    order-independent ops, so the estimate is reproducible bit-for-bit."""
    m, alpha, scale = _HLL_M, _HLL_ALPHA, _HLL_SCALE
    per_group = registers.groupBy("g").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - M)"))
         .alias("s_occ"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    s_total = (F.col("s_occ")
               + (F.lit(m) - F.col("n_occ"))
               * F.lit(1 << scale).cast("long"))
    e_raw = F.lit(alpha * m * m * float(1 << scale)) / s_total
    n_empty = F.lit(m) - F.col("n_occ")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (n_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty),
    ).otherwise(e_raw)
    return per_group.select("g", F.round(est, 6).alias("est_distinct"))


def cms_heavy_hitters(rows: DataFrame, value_col: str, d: int = 4,
                      w: int = 512, k: int = 20,
                      sample_rate: float = 0.25,
                      sample_key_cols: tuple[str, ...] = (),
                      seed: str = "cms") -> DataFrame:
    """Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005) —
    the mergeable frequency sketch behind hot-key detection, which is the
    prerequisite for every explicit skew treatment in this repo (salting,
    AQE skew-join hints, hub caps): at 100 TB you cannot afford an exact
    value-frequency shuffle just to learn which keys are hot.

    Sketch: ``d`` salted-md5 hash rows x ``w`` buckets; an occurrence
    increments one bucket per row; a value's point estimate is the MIN of
    its ``d`` bucket totals (always an OVERestimate — one-sided error
    eps = e/w with prob 1-(1/2)^d). The sketch aggregation exchanges at
    most ``d*w`` cells regardless of data volume and the cell table
    broadcasts everywhere it is consumed.

    Candidates (CMS answers point queries; the heavy-hitter scan needs a
    candidate set): values holding any occurrence whose deterministic md5
    coin over ``(seed, *sample_key_cols, value)`` lands under
    ``sample_rate`` — a value with n occurrences of distinct sampling
    keys is missed with prob (1-rate)^n, i.e. true heavies are caught
    w.h.p. while the candidate set stays ~rate-sized. Pass
    ``sample_key_cols`` (e.g. ``("doc_id",)``) so repeated occurrences
    carry distinct coins.

    Output: the top ``k`` candidates by ``(est_count DESC, value ASC)``
    (the tie-break makes the cut deterministic) with the exact count and
    the one-sided overestimate — every number an exact integer, so the
    DuckDB twin hash-matches bit-for-bit.
    """
    if d < 1 or w < 1 or k < 1:
        raise ValueError("require d, w, k >= 1")
    from ..functions.hashing import md5_u32 as _u32

    def _hash_positions(col):
        """The d (j, bucket) structs for one value — single definition
        for both the sketch build and the candidate lookups."""
        return F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                (_u32(F.concat(F.lit(f"{seed}:h{j}:"), col))
                 % F.lit(w)).alias("bucket"),
            )
            for j in range(d)
        ])

    v = F.col(value_col).cast("string")
    # sample-key columns get a private prefix so a caller's column named
    # "v" (or any clash with the value alias) cannot collide
    occ = rows.select(
        v.alias("v"),
        *[F.col(c).cast("string").alias(f"__sk_{c}")
          for c in sample_key_cols],
    )
    pairs = occ.select(
        "v", F.explode(_hash_positions(F.col("v"))).alias("jb"),
    ).select("v", F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
    cms = pairs.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cell"))

    coin_key = F.concat_ws(
        ":", F.lit(seed), *[F.col(f"__sk_{c}") for c in sample_key_cols],
        F.col("v"))
    thresh = int(min(max(sample_rate, 0.0), 1.0) * 2**32)
    cand = (
        occ.filter(_u32(coin_key) < F.lit(thresh))
        .select("v").distinct()
    )
    cand_keys = cand.select(
        "v", F.explode(_hash_positions(F.col("v"))).alias("jb"),
    ).select("v", F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
    est = (
        cand_keys.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy("v")
        .agg(F.min("cell").alias("est_count"))
    )
    exact = (
        occ.join(F.broadcast(cand), "v")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, "v")
        .select(
            F.col("v").alias(value_col),
            F.col("est_count").cast("long").alias("est_count"),
            F.col("exact_count").cast("long").alias("exact_count"),
            (F.col("est_count") - F.col("exact_count"))
            .cast("long").alias("overestimate"),
        )
        .orderBy(F.col("est_count").desc(), value_col)
        .limit(k)
    )


def log2_histogram_quantiles(rows: DataFrame, group_col: str,
                             value_col: str,
                             qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                             with_exact: bool = True) -> DataFrame:
    """Quantile telemetry without a global sort: a power-of-two-bucket
    histogram sketch (the integer-exact cousin of DDSketch's log buckets;
    Masson et al. VLDB'19 fix relative error by gamma-log bucketing —
    base 2 makes the bucket index ``bitlen(value)``, a pure integer path).
    Unlike rank-based sketches (GK, t-digest) the histogram is insertion-
    order- and partitioning-independent, so the result is reproducible
    across cluster sizes and hash-matches the DuckDB twin bit-for-bit.

    For each group and each q in ``qs``: the reported quantile is the
    upper bound ``2^b - 1`` of the first bucket whose cumulative count
    reaches ``ceil(q * N)`` — a guaranteed OVERestimate of the true
    q-quantile by at most 2x (relative), exact for values that are
    ``2^b - 1``. Positive BIGINT values only (raises on <= 0 — the
    telemetry domain is counts/lengths/latencies).

    Scale shape: one partial+final count per (group, bucket) — the
    exchange carries at most 63 buckets per group regardless of data
    volume; the quantile extraction is a window cumsum over those ≤ 63
    rows per group. The exact quantile is computed alongside for the
    error report via an in-group rank (percentile_disc semantics: the
    smallest value whose rank reaches ceil(q*N)) — at 100 TB you would
    drop that column; the sketch is the point.

    Output: one row per (group, q): ``(group, q, est, exact, rel_err)``
    — or just ``(group, q, est)`` with ``with_exact=False``, the
    sketch-only variant whose whole cost is the bounded histogram (the
    exact column's in-group row_number rank is the one O(data·log) piece,
    priced for error reports at validation scale, not for production
    telemetry).
    """
    from pyspark.sql import Window

    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("require quantiles in (0, 1]")
    v = F.col(value_col).cast("long")
    guarded = rows.select(
        F.col(group_col).alias("g"),
        F.when(v > 0, v).otherwise(
            F.raise_error(F.concat(
                F.lit("log2_histogram_quantiles: non-positive value "),
                v.cast("string")))).alias("v"),
    )
    # bucket b = bitlen(v): v in [2^(b-1), 2^b - 1]
    hist = (
        guarded.select("g", F.length(F.conv(F.col("v"), 10, 2)).alias("b"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wc = Window.partitionBy("g").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("g")))
    qdim = F.broadcast(rows.sparkSession.createDataFrame(
        [(float(q),) for q in sorted(qs)], "q double"))
    # first bucket whose cumulative count reaches ceil(q*N)
    est = (
        cum.join(qdim)
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("g", "q")
        .agg(F.min("b").alias("b"))
        .select("g", "q", F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) "
            "- CAST(1 AS BIGINT)").alias("est"))
    )
    if not with_exact:
        return est.select(
            F.col("g").alias(group_col), "q",
            F.col("est").cast("long").alias("est"),
        )
    # ties on v need no tie-break: whatever order equal values take, the
    # smallest v whose rank reaches ceil(q*N) is the sorted multiset's
    # position-ceil(q*N) element
    wr = Window.partitionBy("g").orderBy("v")
    ranked = guarded.withColumn(
        "rank", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g")))
    exact = (
        ranked.join(qdim)
        .filter(F.col("rank") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("g", "q")
        .agg(F.min("v").alias("exact"))
    )
    return (
        est.join(exact, ["g", "q"])
        .select(
            F.col("g").alias(group_col),
            F.col("q"),
            F.col("est").cast("long").alias("est"),
            F.col("exact").cast("long").alias("exact"),
            F.round((F.col("est") - F.col("exact")) / F.col("exact"), 6)
             .alias("rel_err"),
        )
    )


def kmv_registers(rows: DataFrame, group_col: str, value_col: str,
                  k: int = 64, n_salt: int = 8) -> DataFrame:
    """K-minimum-values sketch state (Bar-Yossef et al. RANDOM'02; the
    theta-sketch family): per group, the k SMALLEST 60-bit md5 hashes of
    the distinct values — ``(g, h, rank)``. Unlike HLL registers, KMV
    sketches support SET OPERATIONS: the k smallest of a union's hashes
    are computable from the two sketches alone, and membership of a
    union-sketch hash in each side's sketch estimates the intersection
    (see :func:`kmv_overlap`).

    Skew-safe k-smallest per group, same two-phase salt as
    training_prep.sample_stratified: phase 1 ranks within
    ``(g, h % n_salt)`` so a hot group splits across n_salt window
    partitions, phase 2 re-ranks the ≤ n_salt·k survivors. NULL values
    are not set elements (filtered, as in hll_registers).
    """
    if k < 2:
        raise ValueError("require k >= 2")
    hashed = (
        rows.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), _h60(value_col).alias("h"))
        .distinct()
    )
    return _kmv_topk(hashed, k, n_salt)


def _kmv_topk(hashed: DataFrame, k: int, n_salt: int) -> DataFrame:
    """k smallest ``h`` per ``g`` of a pre-hashed distinct ``(g, h)``
    frame — the salted two-phase rank of :func:`kmv_registers`, split out
    so callers that already hold the hashed frame (kmv_overlap) reuse it
    instead of rebuilding the scan + distinct."""
    from pyspark.sql import Window

    w1 = Window.partitionBy("g", F.pmod(F.col("h"), F.lit(n_salt))).orderBy("h")
    w2 = Window.partitionBy("g").orderBy("h")
    return (
        hashed.withColumn("rank", F.row_number().over(w1))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def kmv_overlap(rows: DataFrame, group_col: str, value_col: str,
                group_a: str, group_b: str, k: int = 64) -> DataFrame:
    """Set-operation cardinality estimates between two groups' value sets
    from their KMV sketches alone — the overlap question HLL cannot
    answer (HLL unions but never intersects): estimated union size,
    Jaccard, and intersection size, plus the exact figures for the error
    report (drop them at scale; the sketches are the point).

    Estimators (all deterministic — integer hashes, one division, one
    multiplication, identical expression trees in the DuckDB twin):
    the union sketch is the k smallest of the two sketches' combined
    hashes; with fewer than k combined distinct hashes the sketch holds
    the whole union and every figure is exact; otherwise
    ``union_est = (k-1) · 2^60 / h_(k)`` and ``jaccard_est = |unionK ∩
    A_K ∩ B_K| / k`` (Bar-Yossef et al.; the standard theta-sketch
    intersection), ``inter_est = jaccard_est · union_est``.

    Output: one row — ``(k_used, union_est, jaccard_est, inter_est,
    exact_union, exact_inter)``.
    """
    # ONE scan + hash + distinct serves both the sketches and the exact
    # audit figures; ReuseExchange dedups the shared distinct in the plan.
    vals = (
        rows.filter(F.col(group_col).isin(group_a, group_b))
        .filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), _h60(value_col).alias("h"))
        .distinct()
    )
    regs = _kmv_topk(vals, k, n_salt=8)
    a = regs.filter(F.col("g") == group_a).select("h")
    b = regs.filter(F.col("g") == group_b).select("h")
    merged = a.unionByName(b).distinct()
    from pyspark.sql import Window

    union_k = (
        merged.withColumn(
            "rank", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rank") <= k)
    )
    flagged = (
        union_k
        .join(a.withColumn("__a", F.lit(1)), "h", "left")
        .join(b.withColumn("__b", F.lit(1)), "h", "left")
    )
    stats = flagged.agg(
        F.count(F.lit(1)).alias("n_uk"),
        F.max("h").alias("h_k"),
        F.sum((F.coalesce(F.col("__a"), F.lit(0))
               * F.coalesce(F.col("__b"), F.lit(0))).cast("long"))
         .alias("n_both"),
    )
    exact = vals.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_groups")
    ).agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum((F.col("n_groups") == 2).cast("long")).alias("exact_inter"),
    )
    full = F.lit(float(1 << 60))
    union_est = F.when(
        F.col("n_uk") < k, F.col("n_uk").cast("double")
    ).otherwise(F.lit(float(k - 1)) * full / F.col("h_k"))
    jacc = F.col("n_both").cast("double") / F.col("n_uk")
    return (
        stats.crossJoin(F.broadcast(exact))
        .select(
            F.col("n_uk").cast("long").alias("k_used"),
            F.round(union_est, 6).alias("union_est"),
            F.round(jacc, 6).alias("jaccard_est"),
            F.round(jacc * union_est, 6).alias("inter_est"),
            F.col("exact_union").cast("long").alias("exact_union"),
            F.col("exact_inter").cast("long").alias("exact_inter"),
        )
    )
