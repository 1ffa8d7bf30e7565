"""Document deduplication operators for large-scale training-data pipelines.

Four strategies over a ``documents(doc_id bigint, text string, lang string,
...)`` table, all pure built-in-function DataFrame plans (JVM-side,
whole-stage-codegen; no Python in the hot path):

- exact: hash-groupBy on content digest (one shuffle on the digest).
- n-gram Jaccard: token-set self-join — exact but quadratic per token;
  only for small candidate pools / verification of the LSH path.
- MinHash + LSH: shingle → K salted-md5 minhashes → band signatures →
  bucket equi-join. This is the 100 TB path: candidate generation is a
  shuffle on (band, band_sig) so cost is O(collisions), not O(n²).
- SimHash: 16-bit locality-sensitive bit signature; pairs within Hamming
  distance h found by PIGEONHOLE BLOCKING — the signature is split into
  h+1 disjoint bit blocks, so any pair within distance h agrees exactly on
  at least one block; candidates come from an equi-join on
  (lang, block_idx, block_bits) and only candidates pay the Hamming check.
  O(block collisions), never an O(n²) pair enumeration.

Cross-engine portability (for the DuckDB oracle): all hashing is md5 hex
(identical in Spark and DuckDB); minhash uses MIN over salted-md5 strings —
a valid min-wise family without needing matching integer hash functions.

Reference parity note: the reference's only dedup is exact-content dedup at
utils.py:386-398 (see operators/dedup.py); these generalize it for the
training-data use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_tokens(documents: DataFrame, with_lang: bool = True) -> DataFrame:
    """Distinct whitespace tokens per document (the 1-gram shingle set)."""
    cols = ["doc_id", "lang"] if with_lang else ["doc_id"]
    return (
        documents.select(*cols, F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )


def _spread(df: DataFrame) -> DataFrame:
    """Deterministically redistribute document rows across the session's
    shuffle parallelism before map-heavy signature work.

    The r6 signature rewrites below compute md5/array work entirely
    map-side, i.e. in the stage that contains the scan — and a
    single-row-group parquet input gives that stage 1-2 tasks no matter
    what the split config says (guide §6: scan parallelism is
    file-layout-bound). One cheap exchange of the raw (narrow) document
    rows buys full parallelism for the expensive stage; it is strictly
    fewer bytes than the old plans shuffled (they exchanged the exploded
    token table instead). Keyed by doc_id so retried tasks re-produce the
    same placement (SPARK-38388), with an explicit partition count so
    AQE's small-shuffle coalescing (the corpus is a few MB compressed)
    cannot fold the stage back to one task."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, F.col("doc_id"))


def _nonempty(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop docs whose token/shingle set would be empty — text NULL, empty,
    or all-spaces — with a CHEAP raw-text predicate (``rlike '[^ ]'`` is
    true iff splitting on ' ' yields a non-empty token). The obvious
    ``filter(size(toks) > 0)`` is pushed below ``_spread``'s exchange by
    PushDownPredicate, which re-evaluates the whole tokenize/shingle
    expression in the 1-2-task scan stage — measured 1.8 s -> 16.6 s on
    the sf1.0 signature pass. A predicate on the raw column is pushed to
    the scan too, but costs one regex find (usually the first char)."""
    return documents.filter(F.col(text_col).rlike("[^ ]"))


def _token_set(text_col: str = "text"):
    """Per-row distinct non-empty whitespace tokens as an array column —
    the map-side twin of ``doc_tokens`` (array_distinct over one row ==
    DISTINCT over that doc's exploded tokens)."""
    return F.array_distinct(
        F.filter(F.split(text_col, " "), lambda x: x != "")
    )


def _shingle_set(k: int, text_col: str = "text"):
    """Per-row distinct k-word shingles as an array column — the map-side
    twin of ``doc_shingles`` (same whole-text fallback for short docs)."""
    arr = F.filter(F.split(text_col, " "), lambda x: x != "")
    shingles = F.when(
        F.size(arr) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - k + 1),
            lambda i: F.concat_ws(" ", F.slice(arr, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", arr)))
    return F.array_distinct(F.filter(shingles, lambda x: x != ""))


def doc_shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document — the MinHash representation.

    1-gram token sets stop discriminating on small vocabularies (every
    document shares most tokens, so LSH buckets collapse and candidate
    counts approach O(n²)); word k-shingles are the standard fix (MMDS
    ch.3). Documents shorter than k tokens contribute their whole text as
    one shingle. Map-side only: array ops on the split column, one explode.
    """
    arr = F.filter(F.split("text", " "), lambda x: x != "")
    shingles = F.when(
        F.size(arr) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - k + 1),
            lambda i: F.concat_ws(" ", F.slice(arr, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", arr)))
    return (
        documents.select("doc_id", F.explode(shingles).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup: group by content digest, keep min doc_id.

    At scale: single shuffle on a 128-bit digest — perfectly balanced keys
    unless true duplicates are themselves skewed (then AQE skew-join/salt).
    """
    return documents.groupBy(
        F.md5(F.col("text").cast("binary")).alias("content_hash")
    ).agg(
        F.min("doc_id").cast("long").alias("keeper_id"),
        F.count("*").alias("n_copies"),
    )


def jaccard_pairs(documents: DataFrame, threshold: float = 0.9,
                  max_df: int | None = None) -> DataFrame:
    """Exact token-set Jaccard over same-language pairs (verification path).

    Plan: explode → distinct → self equi-join on (token, lang) → count
    shared → join sizes. The join is equi (shuffle on token) so Catalyst
    handles it; but hot tokens fan out quadratically — at 100 TB use
    minhash_candidate_pairs() + jaccard_on_candidates() instead (candidate
    generation is bucketed; exact Jaccard is computed only on candidates).

    ``max_df`` (optional) drops tokens whose document frequency exceeds it
    from the token-set representation (the standard hot-token cap, cf.
    CountVectorizer maxDF) — changes the similarity definition, so it is
    off by default and must match on both engines when enabled.
    """
    toks = doc_tokens(documents)
    if max_df is not None:
        hot = (
            toks.groupBy("lang", "token")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("lang", "token")
        )
        toks = toks.join(hot, ["lang", "token"], "left_anti")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = toks.alias("a"), toks.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb")
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        shared.join(sa, "a_id")
        .join(sb, "b_id")
        .filter(jac >= threshold)
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
    )


def jaccard_on_candidates(documents: DataFrame, candidates: DataFrame,
                          threshold: float = 0.9) -> DataFrame:
    """Exact token-set Jaccard restricted to ``candidates(a_id, b_id)``
    (the verification stage of the MinHash-LSH path).

    r6 shape: each doc's distinct token set is computed MAP-SIDE as one
    array column (``_token_set`` == per-doc DISTINCT of the exploded
    table), candidates pick up both docs' sets with two equi-joins on the
    doc id, and the intersection count is ``size(array_intersect(...))``
    per pair — the old plan's token-level fan-out joins + (a_id, b_id,
    token) count shuffle disappear; shuffled bytes are
    O(candidates × doc_len) either way but now cross the network once,
    not three times. Assumes ``candidates`` is distinct (every caller
    passes a distinct pair set), matching the old groupBy's implicit
    collapse.
    """
    toks = _spread(_nonempty(documents)).select(
        "doc_id", "lang", _token_set().alias("toks")
    ).select(
        "doc_id", "lang", "toks", F.size("toks").cast("long").alias("n")
    )
    shared = F.size(F.array_intersect("a_toks", "b_toks")).cast("long")
    jac = shared / (F.col("na") + F.col("nb") - shared)
    return (
        candidates.select("a_id", "b_id")
        .join(toks.select(F.col("doc_id").alias("a_id"),
                          F.col("lang").alias("a_lang"),
                          F.col("toks").alias("a_toks"),
                          F.col("n").alias("na")), "a_id")
        .join(toks.select(F.col("doc_id").alias("b_id"),
                          F.col("lang").alias("b_lang"),
                          F.col("toks").alias("b_toks"),
                          F.col("n").alias("nb")), "b_id")
        .filter(F.col("a_lang") == F.col("b_lang"))
        .filter(jac >= threshold)
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
    )


def minhash_band_signatures(
    documents: DataFrame, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """(doc_id, band, band_sig): LSH band signatures from salted-md5 minhash
    over 3-word shingles (doc_shingles — discriminative even on small
    vocabularies, unlike 1-gram token sets).

    sig_s(doc) = MIN over shingles of md5(s || ':' || shingle); band
    signature joins its ``band_size`` row sigs in seed order.

    r6 shape: the whole signature is computed MAP-SIDE per document
    (``minhash_signature_vec``) — min over a transformed shingle array per
    seed, bands concatenated in seed order, then one posexplode. The old
    plan's three shuffles (shingle DISTINCT carrying full shingle strings,
    the (doc_id, seed) partial agg, the (doc_id, band) collect_list) are
    gone; duplicates need no pre-pass because MIN over a multiset equals
    MIN over its set, and ``array_distinct`` keeps the md5 count per doc
    identical to the old per-distinct-shingle cost. Zero exchanges beyond
    ``_spread``'s parallelism repartition of the raw doc rows.
    """
    vec = minhash_signature_vec(documents, n_hashes, band_size)
    return vec.select(
        "doc_id", F.posexplode("sigs").alias("band", "band_sig")
    ).select("doc_id", F.col("band").cast("long").alias("band"), "band_sig")


def minhash_signature_vec(
    documents: DataFrame, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """(doc_id, sigs array<string>): per-doc LSH band signatures, band i at
    index i — the map-side core of ``minhash_band_signatures`` (same
    salted-md5 min-wise family, same '|' band packing)."""
    d = _spread(_nonempty(documents)).select(
        "doc_id", _shingle_set(3).alias("toks")
    )
    def salted_md5(s):
        return lambda t: F.md5(
            F.concat(F.lit(str(s)), F.lit(":"), t).cast("binary")
        )

    mins = [
        F.array_min(F.transform("toks", salted_md5(s)))
        for s in range(n_hashes)
    ]
    n_bands = -(-n_hashes // band_size)
    sigs = [
        F.concat_ws(
            "|", *mins[band * band_size: min((band + 1) * band_size, n_hashes)]
        )
        for band in range(n_bands)
    ]
    return d.select("doc_id", F.array(*sigs).alias("sigs"))


def minhash_candidate_pairs(documents: DataFrame, **kw) -> DataFrame:
    """Distinct candidate pairs sharing ≥1 LSH band bucket (a_id < b_id).

    r6 shape: the signature vector is localCheckpoint'ed (tiny: one row of
    n_bands strings per doc) so the md5 work runs ONCE instead of once per
    join side, and the old ``.distinct()`` over the full candidate-pair
    set is replaced by a first-agreeing-band filter — a pair that shares
    several buckets is emitted only at the smallest agreeing band index,
    which IS the distinct set, without shuffling the pairs at all."""
    vec = minhash_signature_vec(documents, **kw).localCheckpoint()
    keyed = vec.select(
        "doc_id", "sigs", F.posexplode("sigs").alias("band", "band_sig")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    first_band = F.array_position(
        F.zip_with("a.sigs", "b.sigs", lambda x, y: x == y), F.lit(True)
    ) - 1
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(F.col("a.band").cast("long") == first_band)
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
    )


def simhash(documents: DataFrame, n_bits: int = 16) -> DataFrame:
    """(doc_id, lang, simhash): n_bits-bit SimHash over distinct tokens.

    Bit b of token = bit (b mod 4) of hex digit (b div 4) of md5(token);
    document bit = majority vote.

    r6 shape: computed ENTIRELY map-side per document. The first
    n_bits/4 hex digits of each distinct token's md5 are packed into one
    integer v with digit d at bits 4d..4d+3 (``conv(reverse(...), 16,
    10)`` — identical bits to the old per-bit instr() extraction), then
    bit b's majority vote is sign(2·Σ((v>>b)&1) − n) over the per-row
    distinct token array. The old plan's two shuffles (token DISTINCT +
    the ×n_bits exploded (doc_id, lang, b) partial agg) are gone; the only
    exchange is ``_spread``'s parallelism repartition of the raw doc rows.
    """
    assert n_bits % 4 == 0 and n_bits <= 32
    d = _spread(_nonempty(documents)).select(
        "doc_id", "lang", _token_set().alias("toks")
    )
    vs = F.transform(
        "toks",
        lambda t: F.conv(
            F.reverse(F.substring(F.md5(t.cast("binary")), 1, n_bits // 4)),
            16, 10,
        ).cast("long"),
    )
    d = d.select(
        "doc_id", "lang", vs.alias("vs"),
        F.size("toks").cast("long").alias("n"),
    )
    def bit_counter(mask):
        return lambda acc, v: acc + F.when(
            v.bitwiseAND(mask) != 0, F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    sim = F.lit(0).cast("long")
    for b in range(n_bits):
        sum_b = F.aggregate(
            "vs",
            F.lit(0).cast("long"),
            bit_counter(F.lit(1 << b).cast("long")),
        )
        sim = sim + F.when(
            2 * sum_b - F.col("n") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return d.select("doc_id", "lang", sim.cast("long").alias("simhash"))


def simhash_pairs(documents: DataFrame, max_hamming: int = 3,
                  n_bits: int = 16) -> DataFrame:
    """Same-language pairs within Hamming distance ``max_hamming``.

    Pigeonhole blocking: split the signature into ``max_hamming + 1``
    disjoint bit blocks — a pair within distance h differs in at most h
    blocks, so it agrees EXACTLY on ≥ 1 of the h+1 blocks. Candidates are
    an equi-join on (lang, block_idx, block_bits) — the same bucketed plan
    shape as the MinHash band join — and only candidates pay the full
    Hamming check. No non-equi pair enumeration anywhere in the plan.

    r6 shape: the signature table is localCheckpoint'ed (3 narrow columns
    per doc) so the map-side simhash runs ONCE instead of once per join
    side, and the old ``.distinct()`` over the full candidate-pair set is
    replaced by a first-agreeing-block filter computed from the xor — a
    pair agreeing on several blocks is emitted only at the smallest
    agreeing block index, which IS the distinct set, without shuffling
    the (quadratic-in-bucket) pair set at all."""
    sh = simhash(documents, n_bits).localCheckpoint()
    n_blocks = max_hamming + 1
    bounds = [round(i * n_bits / n_blocks) for i in range(n_blocks + 1)]
    blocks = F.array(*[
        F.struct(
            F.lit(i).alias("block_idx"),
            F.shiftright(F.col("simhash"), bounds[i])
            .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
            .alias("block_bits"),
        )
        for i in range(n_blocks)
    ])
    keyed = sh.select(
        "doc_id", "lang", "simhash", F.explode(blocks).alias("blk")
    ).select("doc_id", "lang", "simhash", "blk.block_idx", "blk.block_bits")
    a, b = keyed.alias("a"), keyed.alias("b")
    xor = F.expr("a.simhash ^ b.simhash")
    ham = F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)")
    # smallest agreeing block index, from the xor (the join guarantees the
    # matched block agrees, so the fall-through default is never wrong)
    first_block = F.lit(n_blocks - 1)
    for i in reversed(range(n_blocks - 1)):
        agrees = (
            F.shiftright(xor, bounds[i])
            .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
            == 0
        )
        first_block = F.when(agrees, F.lit(i)).otherwise(first_block)
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_bits") == F.col("b.block_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= max_hamming)
        .filter(F.col("a.block_idx") == first_block)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            ham.alias("hamming"),
        )
    )


def duplicate_span_stats(documents: DataFrame, n: int = 8) -> DataFrame:
    """ExactSubstr-style duplicate-span statistics (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better").

    The dedup family above works at DOCUMENT granularity; pretraining
    corpora also carry repeated SUBSTRINGS inside otherwise-unique
    documents (boilerplate, licenses, quoted passages). The paper's
    ExactSubstr pass finds every length-n token window whose exact text
    occurs more than once anywhere in the corpus (including twice in the
    same document). This operator reports, per document, how much of it
    is such duplicated material: ``doc_id, n_windows, n_dup_windows,
    dup_frac`` (docs shorter than n tokens have no windows and are
    omitted — they cannot contain a duplicated span).

    Plan (the suffix-array of the paper is a single-machine structure;
    this is its shuffle-native equivalent):

    1. map-side: tokenize, explode each doc into its rolling n-token
       window digests — md5 over the window text, so the corpus-wide
       equality test is an equi-key, never a string-payload shuffle;
    2. ``groupBy(doc_id, h)`` partial+final hash agg (windows repeated
       WITHIN a doc collapse map-side before the shuffle);
    3. ``groupBy(h)`` partial agg for corpus-wide occurrence totals —
       boilerplate mega-windows (the skew risk) partial-aggregate on the
       map side, so a window occurring 10^9 times arrives at one reducer
       as per-partition partials, not 10^9 rows;
    4. equi-join the per-doc counts back on ``h`` and re-aggregate by
       doc. Both inputs are already hash-partitioned outputs; at 100 TB
       this is the one unavoidable big-big shuffle join and it is on a
       high-cardinality uniform key (md5).

    Nothing is quadratic: no self-join on documents, no window-pair
    enumeration; cost is O(total windows) map-side + two hash aggs +
    one equi-join. Cross-engine note: md5 is injective in practice over
    window texts, so the DuckDB oracle can join on the raw n-gram string
    (same argument as curation.ngram_decontaminate).
    """
    toks = F.split(F.col("text"), " ")
    windows = (
        documents
        .filter(F.size(toks) >= n)  # sequence(1, k<=0) would step down
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
                )
            ).alias("h"),
        )
    )
    per_doc = windows.groupBy("doc_id", "h").agg(F.count("*").alias("c_doc"))
    totals = per_doc.groupBy("h").agg(F.sum("c_doc").alias("c_tot"))
    dup = F.when(F.col("c_tot") >= 2, F.col("c_doc")).otherwise(F.lit(0))
    return (
        per_doc.join(totals, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("c_doc").alias("n_windows"),
            F.sum(dup).alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.round(
                F.col("n_dup_windows") / F.col("n_windows"), 6
            ).alias("dup_frac"),
        )
    )


def remove_duplicate_spans(documents: DataFrame, n: int = 8,
                           key_mult: int = 1 << 20) -> DataFrame:
    """ExactSubstr removal (the transform tier of
    ``duplicate_span_stats``): rewrite each document with every token
    removed that is covered by a NON-FIRST occurrence of a duplicated
    n-token window. "First" is global and deterministic: the minimum
    ``(doc_id, pos)`` occurrence of each window text is the winner and
    keeps its tokens (Lee et al. 2022 keep-one-copy semantics; overlap
    policy: a token covered by any losing occurrence is removed even if
    a winning occurrence also covers it — deterministic and
    oracle-checkable, matching the paper's byte-range deletion spirit).

    Output: ``doc_id, clean_text, n_removed_tokens``. Inter-token
    whitespace is normalized to single spaces (the tokenizer contract
    everywhere in this module); docs shorter than n tokens pass through
    with 0 removals.

    Plan: the stats plan's two hash aggs fuse into ONE ``groupBy(h)``
    computing (count, min-occurrence-key) with map-side partials — the
    winner election never shuffles raw occurrences twice; losers explode
    to at most n covered positions each (bounded fan-out), collapse into
    a per-doc ``collect_set``, and one left equi-join rewrites the text
    with a positional array ``filter``. Occurrence keys are
    ``doc_id * key_mult + pos`` so the winner is one scalar ``MIN``;
    a guard raises if any doc reaches ``key_mult`` tokens (raise the
    parameter for mega-documents).
    """
    toks = F.split(F.col("text"), " ")
    base = documents.select("doc_id", "text")
    occ = (
        base.filter(F.size(toks) >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(
                            F.concat_ws(" ", F.slice(toks, i, n))
                        ).alias("h"),
                    ),
                )
            ).alias("w"),
        )
        .select("doc_id", "w.pos", "w.h")
        .withColumn(
            "k",
            F.when(
                # doc_id bound mirrors the pos bound: doc_id*key_mult+pos
                # must not overflow BIGINT, or the deterministic winner
                # election would corrupt silently (ADVICE r5)
                (F.col("pos") < key_mult)
                & (F.col("doc_id") < F.lit((2**63 - key_mult) // key_mult)),
                F.col("doc_id") * F.lit(key_mult) + F.col("pos"),
            ).otherwise(
                F.raise_error(F.lit(
                    "remove_duplicate_spans: document exceeds key_mult "
                    "tokens or doc_id would overflow doc_id*key_mult+pos; "
                    "adjust key_mult"
                ))
            ),
        )
    )
    winners = occ.groupBy("h").agg(
        F.count("*").alias("c_tot"), F.min("k").alias("k_win")
    )
    covered = (
        occ.join(winners, "h")
        .filter((F.col("c_tot") >= 2) & (F.col("k") != F.col("k_win")))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("tp"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("tp").alias("cov"))
    )
    cov = F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    return base.join(covered, "doc_id", "left").select(
        "doc_id",
        F.concat_ws(
            " ",
            F.filter(toks, lambda _x, i: ~F.array_contains(cov, i + 1)),
        ).alias("clean_text"),
        F.size(cov).cast("long").alias("n_removed_tokens"),
    )


def neardup_keep(documents: DataFrame, threshold: float = 0.9,
                 **lsh_kw) -> DataFrame:
    """NearDup document-level dedup end-to-end (Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" §4.2, the
    document-granularity sibling of the ExactSubstr pair above): MinHash-LSH
    candidates -> exact Jaccard verified on candidates only -> connected
    components over the verified similarity graph -> keep ONE canonical
    document per near-duplicate cluster. The cluster label IS the survivor
    (component = min doc_id, canonicalize.connected_components' contract),
    so winner election costs nothing beyond the CC itself.

    Output: one row per SURVIVING document — ``(doc_id, n_members)`` where
    ``n_members`` is the size of the cluster the survivor represents
    (1 for documents with no near-duplicate). A corpus materialization is
    ``documents.join(result, "doc_id")`` (left-semi).

    Scale shape: the token self-join never appears (candidates come from
    the bucketed LSH equi-join, O(collisions)); exact Jaccard touches
    candidates only; CC iterates over the verified edge set — empirically
    a small fraction of the corpus — with localCheckpoint lineage hygiene;
    the survival filter is one LEFT ANTI join of corpus ids against the
    losing-vertex set (duplicates), which AQE broadcasts whenever the
    duplicate population fits and shuffle-joins otherwise. Nothing is
    quadratic in corpus size.
    """
    from .canonicalize import connected_components

    cand = minhash_candidate_pairs(documents, **lsh_kw)
    edges = jaccard_on_candidates(documents, cand, threshold)
    comp = connected_components(edges, src="a_id", dst="b_id")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"))
    losers = comp.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias("doc_id"))
    return (
        documents.select("doc_id")
        .join(losers, "doc_id", "left_anti")
        .join(sizes.select(F.col("component").alias("doc_id"), "n_members"),
              "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.coalesce("n_members", F.lit(1)).cast("long").alias("n_members"),
        )
    )


def prefix_filter_pairs(documents: DataFrame,
                        threshold: float = 0.9) -> DataFrame:
    """EXACT near-duplicate pair detection by prefix filtering (Chaudhuri
    et al. ICDE'06; the PPJoin family) — the deterministic complement of
    the MinHash-LSH path: LSH candidates are probabilistic (a true pair
    can miss every band), prefix filtering is lossless. If
    ``J(x, y) >= t`` then, under ANY single global token order, the first
    ``|x| - ceil(t*|x|) + 1`` tokens of x and the first
    ``|y| - ceil(t*|y|) + 1`` of y share at least one token — so an
    equi-join on prefix tokens finds EVERY qualifying pair, and exact
    Jaccard verification (jaccard_on_candidates) never sees a false
    negative. Output: ``(a_id, b_id, jaccard)``, same contract as the
    LSH-verified pairs (no-false-negative property pinned by test against
    the quadratic jaccard_pairs on a small corpus).

    Measured honesty note (sf0.01 word-salad corpus): this exact path
    finds 2,359 qualifying 1-gram-set pairs where the MinHash tier
    (3-word-shingle candidates verified on 1-gram Jaccard) surfaces only
    14 vertices — on a tiny vocabulary, token SETS overlap almost freely
    while word ORDER does not, so the shingle-based candidate filter is
    doing most of the semantic work there. When 1-gram-set recall is the
    contract, this operator is the one that honors it; when
    order-sensitive near-duplication is wanted, the shingle-LSH tier is
    the right filter. Same trade at 100 TB, softened by real vocabularies.

    Scale shape: the global order is rare-token-first ((df, token) asc —
    rare prefixes collide rarely, which is the whole point), computed by
    one count shuffle; per-doc ranking is a window over that doc's tokens
    only; at threshold 0.9 the prefix is ~10% of each doc, so the
    candidate equi-join touches a tenth of the token table and hot tokens
    land at the END of the order, never in prefixes. The token self-join
    over FULL token sets never appears.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("require 0 < threshold <= 1")
    from pyspark.sql import Window

    toks = doc_tokens(documents)
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        toks.join(freq, "token")
        .withColumn("rank", F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "token")))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("rank")
        <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + F.lit(1)
    ).select("doc_id", "token")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"),
              (F.col("a.token") == F.col("b.token"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    return jaccard_on_candidates(documents, cand, threshold)
