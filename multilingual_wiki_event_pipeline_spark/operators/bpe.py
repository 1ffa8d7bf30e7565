"""Relational BPE (byte-pair-encoding) merge training — the tokenizer-
training step of an LLM data pipeline (Sennrich et al. 2016) expressed
as pure DataFrame algebra with a bit-exact unrolled DuckDB oracle.

Each merge round is: count adjacent symbol pairs over the word-frequency
table (weighted, OVERLAPPING — the paper's count), pick the most
frequent pair (ties: lexicographic on (left, right) — the deterministic
instantiation of the paper's unspecified tie), and fuse that pair
left-to-right in every word's symbol sequence. Rounds are data-dependent
but the ROUND COUNT is fixed, so the DuckDB twin unrolls one CTE triple
per round exactly like the Lloyd trainer's oracle.

Symbol sequences are stored as SENTINEL-WRAPPED strings: every symbol is
``US + sym + US`` (US = the 0x1f unit separator) and the sequence is
their concatenation, so the merge of pair (a, b) is ONE plain string
``replace(seq, US a US US b US, US ab US)`` — occurrences never share
characters, which makes builtin left-to-right non-overlapping ``replace``
IDENTICAL to BPE's left-to-right merge rule in both engines ('b b b'
merges to ['bb', 'b'], never ['b', 'bb']). No UDF anywhere; the
per-round pair count is a map-side explode + partial agg, the argmax is
a 1-row broadcast, and the rewrite is a codegen'd string expression.

Scale shape: the state is the DISTINCT-WORD frequency table, not the
corpus — after the one corpus pass, every round costs O(vocab) work
(pair explode over word sequences + one tiny shuffle for the pair agg);
at web scale the distinct-word table is ~1e7-1e8 rows regardless of
corpus size, which is why production BPE trainers also operate on it.
``localCheckpoint`` truncates the per-round lineage like every other
iterative operator here (ontology closure, Lloyd, PageRank).

End-of-word marker: ``</w>`` appended per word (the paper's marker), so
merges cannot cross word boundaries and suffix merges are learnable.
Corpus characters equal to the 0x1f sentinel are dropped defensively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
END = "</w>"


def _initial_seqs(documents: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, syms) — syms is the sentinel-wrapped character
    sequence with the end-of-word marker appended."""
    words = documents.select(
        F.explode(
            F.filter(F.split(text_col, " "),
                     lambda x: (x != "") & ~x.contains(SEP))
        ).alias("word")
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, F.lit(1)),
    )
    syms = F.concat(
        F.lit(SEP),
        F.array_join(
            F.concat(chars, F.array(F.lit(END))), SEP + SEP),
        F.lit(SEP),
    )
    return wf.select("word", "freq", syms.alias("syms"))


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Weighted OVERLAPPING adjacent-pair counts over the wrapped
    sequences: (a, b, cnt)."""
    with_arr = seqs.withColumn(
        "_arr",
        F.split(F.expr("substring(syms, 2, length(syms) - 2)"), SEP + SEP),
    )
    pairs = with_arr.select(
        "freq",
        F.explode(
            F.expr(
                "transform(slice(_arr, 1, size(_arr) - 1), "
                "(x, i) -> struct(x AS a, element_at(_arr, i + 2) AS b))"
            )
        ).alias("p"),
    ).select("freq", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    return pairs.groupBy("a", "b").agg(F.sum("freq").alias("cnt"))


def bpe_train_state(documents: DataFrame, n_merges: int = 8,
                    text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """Train ``n_merges`` BPE merge rules over the corpus' words and
    ALSO return the trainer's final sequence state — which by
    construction is the segmentation of the training corpus, so callers
    that want it (catalog.bpe_segment_words, the training-data job)
    avoid re-running the corpus pass and re-applying every rule.

    Returns ``(merges, final_seqs)``: merges is ``(merge_round, left,
    right, pair_count)`` — one row per learned rule, in training order —
    and final_seqs is the wrapped ``(word, freq, syms)`` state. If the
    vocabulary exhausts its pairs before ``n_merges`` rounds (every word
    fully fused), later rounds emit no rule AND the state empties — the
    empty argmax cross-joins every sequence away — identically in the
    DuckDB twin, so the hash contract covers the exhaustion path too.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    seqs = _initial_seqs(documents, text_col).localCheckpoint()
    out: DataFrame | None = None
    for r in range(1, n_merges + 1):
        best = (
            _pair_counts(seqs)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint()
        )
        row = best.select(
            F.lit(r).alias("merge_round"),
            F.col("a").alias("left"),
            F.col("b").alias("right"),
            F.col("cnt").cast("long").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        seqs = (
            seqs.crossJoin(F.broadcast(best))
            .select(
                "word", "freq",
                F.replace(
                    F.col("syms"),
                    F.concat(F.lit(SEP), F.col("a"), F.lit(SEP),
                             F.lit(SEP), F.col("b"), F.lit(SEP)),
                    F.concat(F.lit(SEP), F.col("a"), F.col("b"),
                             F.lit(SEP)),
                ).alias("syms"),
            )
            .localCheckpoint()
        )
    return out, seqs


def bpe_merges(documents: DataFrame, n_merges: int = 8,
               text_col: str = "text") -> DataFrame:
    """The rules alone — see :func:`bpe_train_state`."""
    return bpe_train_state(documents, n_merges, text_col)[0]


def _format_segments(seqs: DataFrame, syms_col: str) -> DataFrame:
    """(word, freq, <syms_col>) -> (word, freq, n_symbols, symbols_csv)."""
    arr = F.split(
        F.expr(f"substring({syms_col}, 2, length({syms_col}) - 2)"),
        SEP + SEP)
    return seqs.select(
        "word",
        F.col("freq").cast("long").alias("freq"),
        F.size(arr).cast("long").alias("n_symbols"),
        F.array_join(arr, " ").alias("symbols_csv"),
    )


def segment_state(final_seqs: DataFrame) -> DataFrame:
    """Format a trainer's final state (:func:`bpe_train_state`) as the
    per-word segmentation — zero extra corpus passes."""
    return _format_segments(final_seqs, "syms")


def bpe_segment(documents: DataFrame, merges: DataFrame,
                text_col: str = "text") -> DataFrame:
    """Apply learned merge rules to the corpus' words: the TOKENIZE side
    of BPE. Rules apply in training order (the standard greedy
    application); each is the same sentinel replace as training, driven
    from the collected (small — n_merges rows) rules table.

    Output: ``(word, freq, n_symbols, symbols_csv)`` per distinct word.
    """
    rules = [(r["left"], r["right"]) for r in
             merges.orderBy("merge_round").collect()]
    seqs = _initial_seqs(documents, text_col)
    col = F.col("syms")
    for a, b in rules:
        col = F.replace(
            col,
            F.lit(SEP + a + SEP + SEP + b + SEP),
            F.lit(SEP + a + b + SEP),
        )
    return _format_segments(seqs.withColumn("_merged", col), "_merged")
