"""Gazetteer mention detection + candidate-ranked entity linking
(north-star steps 3-4: "batched mention detection and entity-link scoring
per partition"; reference analogs: the mention alignment machinery at
pilot_utils.py:262-340 and the label/candidate lookup memo-cache at
pilot_utils.py:160-176 — the reference only links pre-existing hyperlink
annotations, this operator DETECTS mentions from a surface dictionary).

Design (all relational after tokenization — no Python in the match path):

1. **n-gram candidates** — the token table (one Arrow-batched kernel,
   mentions.token_table) is expanded to contiguous 1..L-grams with three
   ``lead()`` windows per document; contiguity is checked on char offsets
   (``offset_{i+1} == offset_i + length_i + 1``) so grams never span a
   turn separator.
2. **detection join** — grams equi-join the DISTINCT gazetteer surfaces on
   (lang, surface): a shuffle on the surface key (or a broadcast — the
   gazetteer is dimension-sized), never a scan-per-pattern.
3. **overlap resolution** — a span strictly contained in a longer match is
   dropped with a single window over the matches: ordered by
   (begin_tid asc, end_tid desc), every span that could contain the current
   one precedes it, so ``max(end_tid) over preceding rows >= end_tid``
   detects containment. Linear in matches-per-document (the round-2
   anti-join was quadratic in it — a dense surface like a stopword entering
   the gazetteer would have blown up single conversations).
4. **candidate scoring + ranking** — surviving spans fan out to their
   gazetteer candidates; score = prior, doubled when the candidate entity
   is in the document's incident's structured data (the context feature);
   ``row_number() over (partition by mention order by score desc, qid)``
   ranks candidates; callers keep ``rank <= k``.

Scale shape: one tokens-sized shuffle for the windows (partitioned by
conv_id — the same key the token table is already grouped by), one
dimension join for detection, one per-doc anti-join on few matched spans,
one ranking window partitioned by mention. Nothing is quadratic in corpus
size; the gazetteer side is O(entities × languages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WD = "http://www.wikidata.org/entity/"

MAX_SURFACE_TOKENS = 4


def ngram_candidates(tokens: DataFrame, max_len: int = MAX_SURFACE_TOKENS) -> DataFrame:
    """tokens(conv_id, tid, offset, length, surface) -> contiguous n-grams
    (conv_id, begin_tid, end_tid, gram) for n in 1..max_len."""
    w = Window.partitionBy("conv_id").orderBy("tid")
    t = tokens
    for i in range(1, max_len):
        t = (
            t.withColumn(f"s{i}", F.lead("surface", i).over(w))
            .withColumn(f"o{i}", F.lead("offset", i).over(w))
            .withColumn(f"l{i}", F.lead("length", i).over(w))
        )
    # cont[i]: tokens 0..i are adjacent with exactly one separator char
    cont = []
    prev_end = F.col("offset") + F.col("length")
    for i in range(1, max_len):
        ok = F.col(f"o{i}") == prev_end + 1
        cont.append(ok if not cont else (cont[-1] & ok))
        prev_end = F.col(f"o{i}") + F.col(f"l{i}")
    grams = [
        F.struct(
            F.lit(1).alias("n"),
            F.col("surface").alias("gram"),
            F.lit(True).alias("ok"),
        )
    ]
    for n in range(2, max_len + 1):
        grams.append(
            F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ", "surface", *[f"s{i}" for i in range(1, n)]
                ).alias("gram"),
                (cont[n - 2] & F.col(f"s{n-1}").isNotNull()).alias("ok"),
            )
        )
    return (
        t.select("conv_id", "tid", F.explode(F.array(*grams)).alias("g"))
        .filter(F.col("g.ok"))
        .select(
            "conv_id",
            F.col("tid").alias("begin_tid"),
            (F.col("tid") + F.col("g.n") - 1).alias("end_tid"),
            F.col("g.gram").alias("gram"),
        )
    )


def detect_mentions(texts: DataFrame, gazetteer: DataFrame,
                    tokens: DataFrame) -> DataFrame:
    """Dictionary match: n-grams ∩ gazetteer surfaces per language, longest
    match wins (strictly contained spans dropped).

    Returns (conv_id, begin_tid, end_tid, surface)."""
    grams = ngram_candidates(tokens)
    grams = grams.join(texts.select("conv_id", "lang"), "conv_id")
    surfaces = gazetteer.select("lang", F.col("surface").alias("gram")).distinct()
    matches = grams.join(F.broadcast(surfaces), ["lang", "gram"]).select(
        "conv_id", "begin_tid", "end_tid", F.col("gram").alias("surface")
    )
    # Longest-match-wins without a self-join: match spans are unique per
    # (conv_id, begin_tid, end_tid), so span m is strictly contained in a
    # longer match iff some OTHER match c has c.begin <= m.begin and
    # c.end >= m.end.  Under (begin asc, end desc) ordering every such c
    # sorts before m, so a running max of end_tid over the preceding rows
    # witnesses containment in one pass.
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.asc("begin_tid"), F.desc("end_tid"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        matches.withColumn("__cover", F.max("end_tid").over(w))
        .filter(F.col("__cover").isNull() | (F.col("__cover") < F.col("end_tid")))
        .select("conv_id", "begin_tid", "end_tid", "surface")
    )


def rank_candidates(detected: DataFrame, texts: DataFrame,
                    gazetteer: DataFrame, inc_to_wd: DataFrame,
                    top_k: int = 3, context_boost: float = 2.0) -> DataFrame:
    """Entity-link candidate scoring + ranking (north-star step 4).

    score = gazetteer prior × ``context_boost`` when the candidate is in
    the document's incident's structured-data entity set, else the prior;
    rank = row_number over the mention ordered by (score desc, qid asc).

    Returns (conv_id, begin_tid, end_tid, surface, qid, uri, score, rank)
    with rank <= top_k.
    """
    d = detected.join(
        texts.select("conv_id", "lang", "incident_id"), "conv_id"
    )
    cands = d.join(F.broadcast(gazetteer), ["lang", "surface"])
    in_ctx = (
        inc_to_wd.select(
            "incident_id",
            F.replace(F.col("wd_uri"), F.lit(WD), F.lit("")).alias("qid"),
        )
        .distinct()
        .withColumn("__in_ctx", F.lit(True))
    )
    scored = cands.join(
        F.broadcast(in_ctx), ["incident_id", "qid"], "left"
    ).withColumn(
        "score",
        F.when(F.col("__in_ctx"), F.col("prior") * context_boost).otherwise(
            F.col("prior")
        ),
    )
    w = Window.partitionBy("conv_id", "begin_tid", "end_tid").orderBy(
        F.desc("score"), F.asc("qid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "conv_id", "begin_tid", "end_tid", "surface",
            "qid", "uri", "score", "rank",
        )
    )


def gazetteer_links(texts: DataFrame, gazetteer: DataFrame,
                    tokens: DataFrame, inc_to_wd: DataFrame,
                    top_k: int = 3) -> DataFrame:
    """detect -> score -> rank, end to end."""
    detected = detect_mentions(texts, gazetteer, tokens)
    return rank_candidates(detected, texts, gazetteer, inc_to_wd, top_k=top_k)
