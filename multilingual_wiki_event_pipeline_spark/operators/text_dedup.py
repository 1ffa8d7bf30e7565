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
  distance h join on doc granularity (here per-lang; at scale, join on
  rotated-signature blocks).

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


def jaccard_pairs(documents: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Exact token-set Jaccard over same-language pairs (verification path).

    Plan: explode → distinct → self equi-join on (token, lang) → count
    shared → join sizes. The join is equi (shuffle on token) so Catalyst
    handles it; but hot tokens fan out quadratically — at 100 TB use
    minhash_candidate_pairs() to generate candidates and this only to
    verify them (join candidates first, then compute exact Jaccard).
    """
    toks = doc_tokens(documents)
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


def minhash_band_signatures(
    documents: DataFrame, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """(doc_id, band, band_sig): LSH band signatures from salted-md5 minhash.

    sig_s(doc) = MIN over tokens of md5(s || ':' || token); band signature
    joins its ``band_size`` row sigs in seed order. Scale: the explode by
    n_hashes is map-side; the only shuffle is the (doc_id, seed) partial agg
    (map-side combine makes it cheap).
    """
    toks = doc_tokens(documents, with_lang=False)
    sig = (
        toks.select(
            "doc_id",
            "token",
            F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed"),
        )
        .groupBy("doc_id", "seed")
        .agg(
            F.min(
                F.md5(
                    F.concat(
                        F.col("seed").cast("string"), F.lit(":"), F.col("token")
                    ).cast("binary")
                )
            ).alias("mh")
        )
    )
    return (
        sig.withColumn("band", F.floor(F.col("seed") / band_size).cast("long"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                    lambda x: x["mh"],
                ),
                "|",
            ).alias("band_sig")
        )
    )


def minhash_candidate_pairs(documents: DataFrame, **kw) -> DataFrame:
    """Distinct candidate pairs sharing ≥1 LSH band bucket (a_id < b_id)."""
    bands = minhash_band_signatures(documents, **kw)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def simhash(documents: DataFrame, n_bits: int = 16) -> DataFrame:
    """(doc_id, lang, simhash): n_bits-bit SimHash over distinct tokens.

    Bit b of token = bit (b mod 4) of hex digit (b div 4) of md5(token);
    document bit = majority vote. Entirely built-in expressions; the
    explode-by-bits blowup is map-side, aggregation is partial+final.
    """
    assert n_bits % 4 == 0 and n_bits <= 32
    toks = doc_tokens(documents)
    bits = toks.withColumn("h", F.md5(F.col("token").cast("binary"))).select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("b"),
        "h",
    ).withColumn(
        "bit",
        F.expr(
            "(shiftright(instr('0123456789abcdef',"
            " substr(h, 1 + CAST(b DIV 4 AS INT), 1)) - 1,"
            " CAST(b % 4 AS INT))) & 1"
        ),
    )
    sums = bits.groupBy("doc_id", "lang", "b").agg(
        F.sum(2 * F.col("bit") - 1).alias("s")
    )
    return sums.groupBy("doc_id", "lang").agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("simhash")
    )


def simhash_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Same-language pairs within Hamming distance ``max_hamming``."""
    sh = simhash(documents)
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            ham.alias("hamming"),
        )
    )
