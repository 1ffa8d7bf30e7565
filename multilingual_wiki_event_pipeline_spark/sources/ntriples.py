"""N-Triples source/sink: a splittable, line-oriented RDF interchange
format parsed and rendered entirely with JVM-side expressions.

The reference serializes its KG with rdflib (``classes.py:265-353`` via
``Graph.serialize``) and reloads graphs through rdflib parsers — a
driver-bound, per-row object walk. The Spark-first equivalent treats
N-Triples (the line-based W3C syntax Turtle tools interchange) as a TEXT
source: every line is one triple, so ``spark.read.text`` splits a
100 TB dump into ordinary file partitions and the whole parse is a
projection — regex term split, literal/IRI classification, escape
decoding — with zero Python, zero shuffle, and full whole-stage codegen.
The writer is the inverse projection over the typed triple frame
(``operators/triples.render_turtle_line``) plus ``write.text``. The
N-QUADS variants (``parse_nquads_lines`` / ``read_nquads`` /
``write_nquads``) add the optional graph-label term and produce/consume
the quad-store layout of operators/quads.py (absent label = the
default-graph sentinel).

Grammar coverage (W3C N-Triples): IRI terms ``<...>``, blank nodes
``_:label`` (kept verbatim as term text), literals with language tags
(``"..."@en``) or datatypes (``"..."^^<...>``), string escapes
``\\t \\b \\n \\r \\f \\" \\' \\\\ \\uXXXX \\UXXXXXXXX`` (supplementary
planes via surrogate-pair arithmetic — Spark's ``decode`` has no UTF-32).
Full-line ``#`` comments and blank lines are skipped; trailing same-line
comments are NOT supported (a lazy object match plus end-anchored
comment group can mis-split literals containing ``" . #"`` — the
unambiguous line grammar is worth the restriction).

Error contract: ``strict=True`` (default) plants ``raise_error`` on the
malformed-line branch, so a bad line fails the job at scan time with the
offending text in the message — the distributed analog of a parser
exception, no driver validation pass. ``strict=False`` drops malformed
lines (count them via ``parse_ntriples_lines(lines, strict=False)`` vs
the raw line count if ingest metrics are needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.triples import render_turtle_line

# term split: subject (IRI or blank), predicate IRI, object (lazy — the
# end anchor + backtracking make literals containing " . " parse whole)
_LINE_RE = r"^[ \t]*(<[^>]*>|_:[^ \t]+)[ \t]+<([^>]*)>[ \t]+(.*?)[ \t]*\.[ \t]*$"
# N-Quads: optional graph label (IRI or blank) before the dot. The lazy
# object is (.+?) — non-empty, so the optional graph group can never
# claim the object term of a 3-term line; literals containing " <x> "
# still parse whole because a graph-group match that strands text before
# the dot backtracks.
_QLINE_RE = (
    r"^[ \t]*(<[^>]*>|_:[^ \t]+)[ \t]+<([^>]*)>[ \t]+(.+?)"
    r"(?:[ \t]+(<[^>]*>|_:[^ \t]+))?[ \t]*\.[ \t]*$"
)
_LIT_RE = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z]+(?:-[A-Za-z0-9]+)*)|\^\^<([^>]*)>)?$'
# every char is either a non-backslash or one complete legal escape
_VALID_ESC_RE = (
    r'^(?:[^\\]|\\[tbnrf"' + r"'" + r'\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*$'
)
_TOKEN_RE = r"(\\U[0-9A-Fa-f]{8}|\\u[0-9A-Fa-f]{4}|\\.|[^\\])"

_SIMPLE_ESC = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _hex4(cp: Column) -> Column:
    return F.lpad(F.conv(cp.cast("string"), 10, 16), 4, "0")


def _unescape(col: Column) -> Column:
    """Decode N-Triples string escapes with one linear token scan:
    ``regexp_extract_all`` splits into (escape | raw char) tokens,
    ``transform`` maps each, ``array_join`` reassembles. Sequential
    escapes like ``\\\\n`` (backslash then 'n') decode correctly because
    the tokenizer consumes ``\\\\`` as one token — the classic failure of
    chained ``regexp_replace`` passes. BMP ``\\uXXXX`` decodes via
    UTF-16BE bytes; astral ``\\UXXXXXXXX`` builds the surrogate pair in
    integer arithmetic first. Assumes the input already passed
    ``_VALID_ESC_RE`` (callers route invalid escapes to the malformed
    branch), so the fallback arm only ever sees raw single chars."""
    toks = F.regexp_extract_all(col, F.lit(_TOKEN_RE), F.lit(1))

    def decode_tok(t: Column) -> Column:
        u4 = F.decode(F.unhex(F.substring(t, 3, 4)), "UTF-16BE")
        cp = F.conv(F.substring(t, 3, 8), 16, 10).cast("long")
        sup = cp - F.lit(0x10000)
        pair = F.concat(
            _hex4(F.lit(0xD800) + F.shiftright(sup, 10)),
            _hex4(F.lit(0xDC00) + F.pmod(sup, F.lit(1024))),
        )
        u8 = F.when(
            cp <= F.lit(0xFFFF), F.decode(F.unhex(_hex4(cp)), "UTF-16BE")
        ).otherwise(F.decode(F.unhex(pair), "UTF-16BE"))
        mapped = None
        for k, v in _SIMPLE_ESC.items():
            cond = t == F.lit("\\" + k)
            mapped = (
                F.when(cond, F.lit(v)) if mapped is None
                else mapped.when(cond, F.lit(v))
            )
        return (
            F.when(F.length(t) == 1, t)
            .when(t.startswith("\\u"), u4)
            .when(t.startswith("\\U"), u8)
            .otherwise(mapped.otherwise(t))
        )

    return F.array_join(F.transform(toks, decode_tok), "")


def parse_ntriples_lines(lines: DataFrame, col: str = "line",
                         strict: bool = True) -> DataFrame:
    """``lines(col)`` -> typed triple frame ``(subj, pred, obj,
    obj_is_literal, lang, datatype)``. Pure expression plan — see module
    docstring for grammar and the strict/permissive error contract."""
    return _parse(lines, col, strict, quads=False)


def parse_nquads_lines(lines: DataFrame, col: str = "line",
                       strict: bool = True) -> DataFrame:
    """``lines(col)`` -> typed QUAD frame ``(g, subj, pred, obj,
    obj_is_literal, lang, datatype)`` — the N-Quads sibling of
    :func:`parse_ntriples_lines`. Lines without a graph label land in
    the default graph (``bgp.DEFAULT_GRAPH``), so the result plugs
    straight into operators/quads.py."""
    return _parse(lines, col, strict, quads=True)


def _parse(lines: DataFrame, col: str, strict: bool,
           quads: bool) -> DataFrame:
    from ..operators.bgp import DEFAULT_GRAPH

    rx = _QLINE_RE if quads else _LINE_RE
    line = F.col(col)
    meat = lines.filter(
        (F.trim(line) != "") & ~F.ltrim(line).startswith("#")
    )
    subj_t = F.regexp_extract(line, rx, 1)
    pred_t = F.regexp_extract(line, rx, 2)
    obj_t = F.regexp_extract(line, rx, 3)

    is_iri = obj_t.startswith("<")
    is_blank = obj_t.startswith("_:")
    is_lit = obj_t.startswith('"')
    lit_ok = obj_t.rlike(_LIT_RE)
    body = F.regexp_extract(obj_t, _LIT_RE, 1)
    lang = F.nullif(F.regexp_extract(obj_t, _LIT_RE, 2), F.lit(""))
    dtype = F.nullif(F.regexp_extract(obj_t, _LIT_RE, 3), F.lit(""))
    iri_body = F.regexp_extract(obj_t, r"^<(.*)>$", 1)
    subj_iri = F.regexp_extract(subj_t, r"^<(.*)>$", 1)

    esc_ok = (
        F.when(is_lit, body.rlike(_VALID_ESC_RE))
        .when(is_iri, iri_body.rlike(_VALID_ESC_RE))
        .otherwise(F.lit(True))
    ) & F.when(subj_t.startswith("<"), subj_iri.rlike(_VALID_ESC_RE)) \
         .otherwise(F.lit(True)) \
      & pred_t.rlike(_VALID_ESC_RE)
    malformed = (
        (subj_t == "")
        | ~(is_iri | is_blank | is_lit)
        | (is_lit & ~lit_ok)
        | ~esc_ok
    )
    if quads:
        g_t = F.regexp_extract(line, rx, 4)
        g_iri = F.regexp_extract(g_t, r"^<(.*)>$", 1)
        esc_ok = esc_ok & F.when(
            g_t.startswith("<"), g_iri.rlike(_VALID_ESC_RE)
        ).otherwise(F.lit(True))
        malformed = malformed | ~esc_ok
        g_out = (
            F.when(g_t == "", F.lit(DEFAULT_GRAPH))
            .when(g_t.startswith("<"), _unescape(g_iri))
            .otherwise(g_t)
        )

    subj = F.when(subj_t.startswith("<"), _unescape(subj_iri)).otherwise(subj_t)
    obj = (
        F.when(is_lit, _unescape(body))
        .when(is_iri, _unescape(iri_body))
        .otherwise(obj_t)
    )
    if strict:
        # the guard lives in a FILTER, not a projected column: column
        # pruning (e.g. under count()) would silently drop a guarded
        # column, but a filter predicate is evaluated for every row no
        # matter which columns survive downstream
        meat = meat.filter(
            F.when(
                malformed,
                F.raise_error(F.concat(F.lit("bad N-Triples line: "), line)),
            ).otherwise(F.lit(True))
        )
    else:
        meat = meat.filter(~malformed)
    out_cols = [
        subj.alias("subj"),
        _unescape(pred_t).alias("pred"),
        obj.alias("obj"),
        is_lit.alias("obj_is_literal"),
        lang.alias("lang"),
        F.when(is_lit, dtype).alias("datatype"),
    ]
    if quads:
        out_cols.insert(0, g_out.alias("g"))
    return meat.select(*out_cols)


def read_ntriples(spark: SparkSession, path: str,
                  strict: bool = True) -> DataFrame:
    """Distributed N-Triples scan: ``spark.read.text`` (splittable file
    partitions, predicate pushdown inapplicable by construction) + the
    expression parser. 100 TB notes: the parse adds no shuffle and no
    Python; downstream filters on subj/pred/obj run in the same
    whole-stage-codegen pass as the regex split."""
    return parse_ntriples_lines(spark.read.text(path), col="value",
                                strict=strict)


def read_nquads(spark: SparkSession, path: str,
                strict: bool = True) -> DataFrame:
    """Distributed N-Quads scan — the quad-store (operators/quads.py)
    interchange sibling of :func:`read_ntriples`; same splittable
    text-scan plan, one extra projected column."""
    return parse_nquads_lines(spark.read.text(path), col="value",
                              strict=strict)


def _write_lines(triples: DataFrame, path: str, n_files: int | None,
                 graph_col: str | None) -> None:
    if "lang" not in triples.columns:
        triples = triples.withColumn("lang", F.lit(None).cast("string"))
    lines = render_turtle_line(triples, graph_col=graph_col).select(
        F.col("line").alias("value")
    )
    if n_files is not None:
        lines = lines.repartition(n_files)
    lines.write.mode("overwrite").text(path)


def write_ntriples(triples: DataFrame, path: str,
                   n_files: int | None = None) -> None:
    """Render the typed triple frame to N-Triples lines and write as
    text. A missing ``lang`` column is treated as all-null (some
    producers carry datatype-only triples); ``n_files`` caps output file
    count via a round-robin repartition (omit it to inherit upstream
    partitioning — no extra shuffle)."""
    _write_lines(triples, path, n_files, graph_col=None)


def write_nquads(quads: DataFrame, path: str,
                 n_files: int | None = None) -> None:
    """Render a quad frame (``g`` column + the triple schema) to
    N-Quads; default-graph rows (sentinel or null ``g``) omit the graph
    label per the grammar."""
    _write_lines(quads, path, n_files, graph_col="g")
