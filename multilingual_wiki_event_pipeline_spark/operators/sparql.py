"""SPARQL 1.1 query-string front-end over the BGP algebra.

The reference authors its Wikidata queries as SPARQL *text* (reference
`utils.py:33-83` builds SELECT strings with PREFIX headers, OPTIONAL
clauses, and `wdt:P31*/wdt:P279*` property paths). `operators/bgp.py`
implements the matching algebra programmatically; this module closes the
usability loop: parse a query string into that algebra, so the same text
a user runs against a SPARQL endpoint runs against the K3 triple store.

``sparql_query(triples, text)`` accepts the four query forms:

- ``SELECT [DISTINCT] (?v | (agg AS ?v))+ | * WHERE { body }`` with
  ``GROUP BY`` / ``HAVING`` / ``ORDER BY [ASC|DESC(?v)]`` / ``OFFSET`` /
  ``LIMIT``;
- ``CONSTRUCT { template } WHERE { body }``;
- ``ASK [WHERE] { body }`` (returns a Python bool);
- ``DESCRIBE (<iri> | ?v | *)... [WHERE { body }]`` — with a WHERE
  clause, describes every resource the solutions bind to the listed
  variables (``*`` = all solution variables) plus any named IRIs.

``body`` supports triple patterns (with ``;`` predicate-object and ``,``
object lists, ``a`` for rdf:type, prefixed names, property paths),
``OPTIONAL { ... }`` (FILTERs inside are group-scoped per SPARQL 1.1),
``FILTER expr``, ``BIND(expr AS ?v)``, ``{ SELECT ... }`` subqueries,
``MINUS { ... }``, ``FILTER [NOT] EXISTS { ... }``, ``VALUES``, and
group graph patterns ``{ ... }`` / ``{ A } UNION { B } [UNION ...]``
anywhere in the body — a group compiles to its own solution frame
(FILTERs inside are group-scoped) and joins the enclosing solutions on
the shared variables, so unions compose with other patterns, with
aggregation, and inside CONSTRUCT/ASK. Soundness guard: a join variable
not bound in EVERY union branch raises (an equi-join would drop
solutions SPARQL's compatible-join keeps) instead of silently returning
wrong rows.

Documented deviations (pragmatic subset, each raises or is noted):

- FILTER/HAVING/BIND bodies are evaluated as **Spark SQL** after
  variable translation (``?v`` → ``v``); the SPARQL forms ``&&``,
  ``||``, ``!``, ``BOUND``, ``REGEX(term, pattern)``, ``STR`` (identity
  — store terms are strings), ``STRSTARTS``/``STRENDS``/``STRLEN``/
  ``UCASE``/``LCASE``/``SUBSTR``/``REPLACE``/``STRBEFORE``/
  ``STRAFTER`` (first-occurrence semantics incl. the empty-separator
  edges) / ``ENCODE_FOR_URI`` (via url_encode; Java URLEncoder alphabet
  — '*' stays bare, '~' encodes — a documented deviation from RFC 3986)
  are rewritten to their Spark twins; ``CONTAINS``/``CONCAT``/``ABS``/``CEIL``/``FLOOR``/
  ``ROUND``/``COALESCE``/``IF``/``IN`` share Spark's spelling already.
  ``<...>`` IRIs and declared-prefix names in expressions become string
  literals (the store's lexical form). RDF-term builtins the plain-
  string store can't answer (LANG, DATATYPE, IRI(), isBlank, ...) raise
  at parse time.
- Aggregates: COUNT/SUM/MIN/MAX/AVG (incl. DISTINCT, ``*``) plus
  ``GROUP_CONCAT(...; SEPARATOR="s")`` (rewritten to a sorted
  ``collect_list`` join — deterministic order, a legal instantiation of
  the spec's unspecified order) and ``SAMPLE`` (rewritten to ``min``,
  a deterministic legal choice).
- BIND is applied after the group's joins: FILTER / negation / GROUP
  BY / SELECT / ORDER BY see the variable, but triple patterns cannot
  join on it (rebinding an in-scope variable raises, per spec).
- ``{ SELECT ... }`` subqueries join the enclosing group on their
  shared variables (the enclosing PREFIXes apply); subqueries inside
  UNION branches or OPTIONAL/MINUS groups raise.
- Literal matching is on the plain lexical form: ``@lang`` tags and
  ``^^datatype`` suffixes on query literals are stripped (the store
  carries datatype/language in side columns the matcher doesn't consult).
- Numeric literals compare as strings (the store's ``obj`` is a string
  column); quote-and-compare or FILTER with an explicit cast.
- Named graphs: against a QUAD store (a ``g`` column — operators/
  quads.py), ``GRAPH ?g { ... }`` / ``GRAPH <iri> { ... }`` and the
  ``FROM`` / ``FROM NAMED`` dataset clauses are supported in all four
  query forms; plain patterns then match the DEFAULT graph only (the
  ``urn:x-default`` tag), per SPARQL dataset semantics. Sub-surface:
  GRAPH blocks take triple patterns and FILTERs only (a FILTER inside
  merges into the enclosing group — identical semantics when it names
  variables the block binds, a documented deviation otherwise); nested
  GRAPH raises; property paths inside GRAPH need a constant graph term;
  DESCRIBE over a quad store describes the set-union of all graphs;
  GRAPH against a plain triple store raises; updates reject GRAPH.
- No BASE, no SERVICE, no property paths in CONSTRUCT templates —
  all raise with a clear message. ``[NOT] EXISTS { ... }`` works both as
  a standalone FILTER constraint (semi/anti join) and inside a larger
  filter expression (``FILTER(EXISTS {..} || ?x = "y")`` — compiled to a
  boolean flag via a distinct-projection left join, never multiplying
  solutions); EXISTS in BIND/HAVING expressions raises.

Scale notes (100 TB): parsing is driver-side and O(query length); the
compiled plan is exactly what ``bgp_match`` builds — per-pattern filtered
scans with pushed constants + equi-joins, nothing per-row in Python.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .bgp import (
    DEFAULT_GRAPH,
    GRAPH_COL,
    TRIPLE_COLS,
    _paren_wrapped,
    _split_top,
    bgp_ask,
    bgp_construct,
    bgp_describe,
    bgp_describe_solutions,
    bgp_match,
    parse_bgp,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_AGG_RE = re.compile(
    r"\b(count|sum|min|max|avg|group_concat|sample)\s*\(", re.IGNORECASE
)
_PNAME_RE = re.compile(r"([A-Za-z_][\w-]*):([A-Za-z_][\w.-]*)")


class SparqlSyntaxError(ValueError):
    pass


def _strip_comments(text: str) -> str:
    """Remove ``#``-to-EOL comments outside quotes and ``<...>`` IRIs.

    A ``<`` opens an IRI only when a ``>`` follows with no whitespace in
    between (so ``FILTER(?y < "5")``'s comparison operator doesn't
    swallow the rest of the query); IRIs are copied verbatim, so
    apostrophes or ``#`` fragments inside them can't poison the quote
    state. Inside string literals ``\\``-escapes are honored."""
    out, quote = [], ""
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if quote:
            if ch == "\\" and i + 1 < n:
                out.append(text[i:i + 2])
                i += 2
                continue
            if ch == quote:
                quote = ""
            out.append(ch)
        elif ch in "\"'":
            quote = ch
            out.append(ch)
        elif ch == "<":
            j = i + 1
            while j < n and not text[j].isspace() \
                    and text[j] not in ">\"'":
                j += 1
            span = text[i + 1:j]
            # a real IRI: closed by '>' with no whitespace or quotes
            # inside, has a scheme ':' (BASE-relative IRIs are rejected
            # at parse), and doesn't start like a variable — anything
            # else is the '<' comparison operator
            if (j < n and text[j] == ">" and ":" in span
                    and not span.startswith(("?", "$"))):
                out.append(text[i:j + 1])
                i = j + 1
                continue
            out.append(ch)  # comparison operator
        elif ch == "#":
            while i < n and text[i] != "\n":
                i += 1
            continue
        else:
            out.append(ch)
        i += 1
    return "".join(out)


class _Scan:
    """Cursor over query text: whitespace/keyword handling, quote- and
    brace-aware block extraction."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def skip_ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def eof(self) -> bool:
        self.skip_ws()
        return self.i >= len(self.s)

    def peek_ch(self) -> str:
        self.skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def peek_kw(self, *kws: str) -> str | None:
        """Case-insensitive keyword lookahead (word-boundary)."""
        self.skip_ws()
        for kw in kws:
            j = self.i + len(kw)
            if self.s[self.i:j].upper() == kw.upper() and (
                j >= len(self.s) or not (self.s[j].isalnum()
                                         or self.s[j] == "_")
            ):
                return kw
        return None

    def take_kw(self, *kws: str) -> str | None:
        kw = self.peek_kw(*kws)
        if kw:
            self.i += len(kw)
        return kw

    def expect_kw(self, kw: str) -> None:
        if not self.take_kw(kw):
            raise SparqlSyntaxError(
                f"expected {kw!r} at ...{self.s[self.i:self.i + 40]!r}"
            )

    def read_block(self, open_ch: str = "{", close_ch: str = "}") -> str:
        """Read a balanced ``{...}``/``(...)`` block, return the inside."""
        self.skip_ws()
        if self.peek_ch() != open_ch:
            raise SparqlSyntaxError(
                f"expected {open_ch!r} at ...{self.s[self.i:self.i + 40]!r}"
            )
        depth, quote = 0, ""
        start = self.i + 1
        while self.i < len(self.s):
            ch = self.s[self.i]
            if quote:
                if ch == "\\":
                    self.i += 2
                    continue
                if ch == quote:
                    quote = ""
            elif ch in "\"'":
                quote = ch
            elif ch == open_ch:
                depth += 1
            elif ch == close_ch:
                depth -= 1
                if depth == 0:
                    inner = self.s[start:self.i]
                    self.i += 1
                    return inner
            self.i += 1
        raise SparqlSyntaxError(f"unbalanced {open_ch!r} block")

    def read_token(self) -> str:
        """One term token: quoted literal (with optional @lang/^^type
        suffix), ``<...>`` IRI, or a run of non-separator characters.
        ``.``, ``;``, ``,`` are single-char tokens at top level."""
        self.skip_ws()
        s, i, n = self.s, self.i, len(self.s)
        if i >= n:
            raise SparqlSyntaxError("unexpected end of input")
        ch = s[i]
        if ch in ".;,":
            self.i = i + 1
            return ch
        if ch in "\"'":
            j = i + 1
            while j < n and s[j] != ch:
                j += 2 if s[j] == "\\" else 1  # honor \" escapes
            if j >= n:
                raise SparqlSyntaxError("unterminated string literal")
            j += 1
            # swallow @lang / ^^datatype suffixes (documented deviation)
            while j < n and not s[j].isspace() and s[j] not in ".;,}":
                j += 1
            tok = s[i:j]
            self.i = j
            return tok
        if ch == "<":
            j = s.find(">", i)
            if j < 0:
                raise SparqlSyntaxError("unterminated <...> IRI")
            # paths may continue after the IRI: <a>/<b>, <a>+, <a>|x
            while j + 1 < n and not s[j + 1].isspace() \
                    and s[j + 1] not in ".;,}":
                if s[j + 1] == "<":
                    j = s.find(">", j + 1)
                    if j < 0:
                        raise SparqlSyntaxError("unterminated <...> IRI")
                else:
                    j += 1
            tok = s[i:j + 1]
            self.i = j + 1
            return tok
        j = i
        while j < n and not s[j].isspace() and s[j] not in ";,{}":
            if s[j] == "<":  # path continuing into a bracketed IRI
                k = s.find(">", j)
                if k < 0:
                    raise SparqlSyntaxError("unterminated <...> IRI")
                j = k + 1
                continue
            # '.' ends a clause unless it's inside a prefixed local name
            # (rare) — treat a '.' followed by whitespace/EOF as the
            # terminator, anything else as part of the token
            if s[j] == "." and (j + 1 >= n or s[j + 1].isspace()):
                break
            j += 1
        tok = s[i:j]
        self.i = j
        if not tok:
            raise SparqlSyntaxError(
                f"cannot read a term at ...{s[i:i + 40]!r}"
            )
        return tok


def _parse_prologue(scan: _Scan) -> dict[str, str]:
    prefixes: dict[str, str] = {}
    while True:
        if scan.take_kw("PREFIX"):
            scan.skip_ws()
            m = re.match(r"([A-Za-z_][\w-]*)?:", scan.s[scan.i:])
            if not m:
                raise SparqlSyntaxError("malformed PREFIX declaration")
            name = m.group(1) or ""
            scan.i += m.end()
            scan.skip_ws()
            if scan.peek_ch() != "<":
                raise SparqlSyntaxError("PREFIX needs a <...> IRI")
            j = scan.s.find(">", scan.i)
            if j < 0:
                raise SparqlSyntaxError("unterminated PREFIX <...> IRI")
            prefixes[name] = scan.s[scan.i + 1:j]
            scan.i = j + 1
        elif scan.peek_kw("BASE"):
            raise SparqlSyntaxError("BASE is not supported")
        else:
            return prefixes


def _expand_pname(tok: str, prefixes: dict[str, str]) -> str | None:
    """``pfx:local`` -> full IRI when the prefix is declared."""
    m = _PNAME_RE.fullmatch(tok)
    if m and m.group(1) in prefixes:
        return prefixes[m.group(1)] + m.group(2)
    return None


def _expand_path(tok: str, prefixes: dict[str, str]) -> str:
    """Expand a predicate/path expression STRUCTURALLY: recurse through
    the path operators (same bracket-aware splits the compiler uses) and
    expand each atomic step — ``a`` -> rdf:type, ``pfx:local`` ->
    ``<iri>`` — so the keyword and prefixed names work inside composite
    paths and negated property sets (``!a``, ``a/pfx:p``), while IRIs'
    own ``/``/``|``/parens stay untouched."""
    for sep in ("|", "/"):
        parts = _split_top(tok, sep)
        if len(parts) > 1:
            return sep.join(_expand_path(q, prefixes) for q in parts)
    if tok.startswith(("^", "!")):
        return tok[0] + _expand_path(tok[1:], prefixes)
    if len(tok) > 1 and tok[-1] in "+*?":
        return _expand_path(tok[:-1], prefixes) + tok[-1]
    if _paren_wrapped(tok):
        return "(" + _expand_path(tok[1:-1], prefixes) + ")"
    if tok == "a":
        return f"<{RDF_TYPE}>"
    if tok.startswith("<"):
        return tok
    expanded = _expand_pname(tok, prefixes)
    return f"<{expanded}>" if expanded is not None else tok


_STR_ESCAPES = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
                '"': '"', "'": "'", "\\": "\\"}


def _unescape(body: str) -> str:
    """SPARQL string-literal escapes: the named set plus \\uXXXX /
    \\UXXXXXXXX; anything else raises (silently mangling an escape would
    make a valid literal match nothing)."""
    def repl(m: re.Match) -> str:
        g = m.group(1)
        if g[0] in "uU" and len(g) > 1:
            return chr(int(g[1:], 16))
        if g in _STR_ESCAPES:
            return _STR_ESCAPES[g]
        raise SparqlSyntaxError(f"unknown string escape \\{g}")
    return re.sub(
        r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", repl, body
    )


def _term(tok: str, prefixes: dict[str, str], *, pred: bool = False) -> str:
    """Normalize one term token to the algebra's form: raw store string
    for subjects/objects, ``<...>``-wrapped IRIs inside predicates (the
    path machinery strips them)."""
    if tok.startswith("$"):
        tok = "?" + tok[1:]
    if tok.startswith("?"):
        return tok
    if tok.startswith(("\"", "'")):
        quote = tok[0]
        end = tok.rfind(quote)
        body = tok[1:end]  # @lang/^^type suffix dropped (documented)
        return _unescape(body)
    if pred:
        return _expand_path(tok, prefixes)
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    expanded = _expand_pname(tok, prefixes)
    return expanded if expanded is not None else tok


_LITERAL_RE = re.compile(r""""(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*'""")
# an expression-position <...> IRI needs a scheme colon, so comparison
# chains like ?a<?b never false-positive (same heuristic as the comment
# stripper's '<'-vs-IRI call)
_EXPR_IRI_RE = re.compile(r"<([A-Za-z][\w+.-]*:[^<>\s]*)>")
_EXPR_PNAME_RE = re.compile(r"(?<![\w?$<])([A-Za-z_][\w-]*)?:([A-Za-z_][\w.-]*)")
# SPARQL builtins whose Spark SQL twin has a different name
_FN_RENAME = {
    "strstarts": "startswith", "strends": "endswith", "strlen": "length",
    "ucase": "upper", "lcase": "lower", "substr": "substring",
    "replace": "regexp_replace",
}
# RDF-term builtins the plain-string store can't answer — a clear
# parse-time raise beats Spark's unresolved-function error
_FN_UNSUPPORTED = (
    "lang", "langmatches", "datatype", "isiri", "isuri", "isblank",
    "isliteral", "isnumeric", "iri", "uri", "bnode", "strdt", "strlang",
    "uuid", "struuid", "now", "rand", "sameterm",
    "exists",
)


def _sql_quote(s: str) -> str:
    """A Spark-SQL single-quoted string literal (backslash escaping —
    Spark's default parser honors ``\\``-escapes in literals)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _translate_expr(expr: str, prefixes: dict[str, str]) -> str:
    """SPARQL expression -> Spark SQL (documented subset; see module
    docstring). String literals are masked out first so the rewrites
    never touch their contents (``"wow!"``, ``"a&&b"``, regex patterns
    with ``?``/``{2,3}``/parens all pass through verbatim). ``<...>``
    IRIs and declared-prefix names become quoted string literals (the
    store compares on the plain lexical form), masked the same way."""
    lits: list[str] = []

    def _mask_raw(text: str) -> str:
        lits.append(text)
        return f"\x00{len(lits) - 1}\x00"

    def _mask(m: re.Match) -> str:
        return _mask_raw(m.group(0))

    def _mask_iri(m: re.Match) -> str:
        return _mask_raw(_sql_quote(m.group(1)))

    def _expand_expr_pname(m: re.Match) -> str:
        pfx, local = m.group(1) or "", m.group(2)
        if pfx not in prefixes:
            raise SparqlSyntaxError(
                f"unknown prefix in expression: {pfx}:{local}"
            )
        return _mask_raw(_sql_quote(prefixes[pfx] + local))

    expr = _LITERAL_RE.sub(_mask, expr)
    expr = _EXPR_IRI_RE.sub(_mask_iri, expr)
    expr = _EXPR_PNAME_RE.sub(_expand_expr_pname, expr)
    if re.search(r"\x00\d+\x00\s*\(", expr):
        raise SparqlSyntaxError(
            "SPARQL constructor-cast form pfx:name(...) is not supported "
            "— use CAST(expr AS type)"
        )
    expr = re.sub(r"[?$]([A-Za-z_]\w*)", r"\1", expr)
    expr = expr.replace("&&", " AND ").replace("||", " OR ")
    expr = re.sub(
        r"(?i)\bbound\s*\(\s*(\w+)\s*\)", r"(\1 IS NOT NULL)", expr
    )
    def _regex3(m: re.Match) -> str:
        term, pat, flags_tok = m.group(1), m.group(2), m.group(3)
        raw = lits[int(flags_tok.strip("\x00"))]
        flags = raw[1:-1] if raw[:1] in "\"'" else None
        # XPath flags with a Java inline-flag twin; q (literal match)
        # has no (?q) and x differs on '#' comments — both raise
        if flags is None or any(f not in "ism" for f in flags):
            raise SparqlSyntaxError(
                f"unsupported REGEX flags {raw}: only i/s/m map to Java "
                "inline flags; inline others in the pattern itself"
            )
        if not flags:  # REGEX(t, p, "") == the 2-arg form, per spec
            return f"({term} rlike {pat})"
        return f"({term} rlike concat('(?{flags})', {pat}))"

    expr = re.sub(  # 3-arg form first: flags literal -> (?ism) prefix
        r"(?i)\bregex\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*,"
        r"\s*(\x00\d+\x00)\s*\)",
        _regex3, expr,
    )
    expr = re.sub(
        r"(?i)\bregex\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
        r"(\1 rlike \2)", expr,
    )
    if re.search(r"(?i)\bregex\s*\(", expr):
        raise SparqlSyntaxError(
            "unsupported REGEX call form — only REGEX(term, pattern[, "
            "flags-literal]) is rewritten"
        )
    if re.search(r"(?i)\b(not\s+)?exists\s*\{", expr):
        raise SparqlSyntaxError(
            "EXISTS { ... } is only supported in FILTER constraints "
            "(standalone or inside the filter expression), not in "
            "BIND/HAVING/projection expressions"
        )
    for name in _FN_UNSUPPORTED:
        if re.search(rf"(?i)\b{name}\s*\(", expr):
            raise SparqlSyntaxError(
                f"SPARQL builtin {name.upper()}() is not supported — the "
                "store matches on the plain lexical form (no RDF-term "
                "metadata in expressions)"
            )
    # STRBEFORE/STRAFTER: per-spec first-occurrence semantics, incl. the
    # empty-separator edge (instr(s,'')=1 makes both branches line up:
    # STRBEFORE(s,'')='' and STRAFTER(s,'')=s). Args with nested commas/
    # parens are out of scope, like the REGEX rewrite.
    expr = re.sub(
        r"(?i)\bstrbefore\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
        r"(CASE WHEN instr(\1, \2) > 0 "
        r"THEN substring(\1, 1, instr(\1, \2) - 1) ELSE '' END)",
        expr,
    )
    expr = re.sub(
        r"(?i)\bstrafter\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
        r"(CASE WHEN instr(\1, \2) > 0 "
        r"THEN substring(\1, instr(\1, \2) + length(\2)) ELSE '' END)",
        expr,
    )
    # ENCODE_FOR_URI via Spark's url_encode with the form-encoding space
    # fixed up; documented deviation: the Java URLEncoder alphabet ('*'
    # stays bare, '~' encodes) vs RFC 3986's unreserved set
    expr = re.sub(
        # NB regexp_replace spelled directly (the REPLACE->regexp_replace
        # rename pass below would hit a plain replace()); [+] dodges both
        # regex-metachar and SQL-escape pitfalls
        r"(?i)\bencode_for_uri\s*\(\s*([^,()]+?)\s*\)",
        r"regexp_replace(url_encode(\1), '[+]', '%20')",
        expr,
    )
    for name in ("strbefore", "strafter", "encode_for_uri"):
        if re.search(rf"(?i)\b{name}\s*\(", expr):
            raise SparqlSyntaxError(
                f"unsupported {name.upper()} call form — arguments must "
                "be simple (no nested commas/parens)"
            )
    for sparql_name, spark_name in _FN_RENAME.items():
        expr = re.sub(rf"(?i)\b{sparql_name}\s*\(", f"{spark_name}(", expr)
    expr = re.sub(r"(?i)\bstr\s*\(", "(", expr)  # store terms ARE strings
    expr = re.sub(r"!(?![=<>])", " NOT ", expr)
    expr = re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], expr)
    return expr.strip()


_GROUP_CONCAT_RE = re.compile(
    r"""(?is)^\s*group_concat\s*\(\s*(distinct\s+)?(.*?)
        (?:\s*;\s*separator\s*=\s*("(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*'))?
        \s*\)\s*$""",
    re.VERBOSE,
)
_SAMPLE_RE = re.compile(r"(?is)^\s*sample\s*\(\s*(.*?)\s*\)\s*$")


def _translate_agg(expr: str, prefixes: dict[str, str]) -> str:
    """A SPARQL aggregate expression -> Spark SQL. COUNT/SUM/MIN/MAX/AVG
    (incl. DISTINCT and ``*``) pass through ``_translate_expr``; the two
    SPARQL-only forms are rewritten:

    - ``GROUP_CONCAT(expr [; SEPARATOR="s"])`` -> ``array_join(
      sort_array(collect_list(expr)), 's')`` (DISTINCT -> collect_set).
      Documented deviation: SPARQL leaves concatenation order undefined;
      this sorts, which makes the result deterministic (and therefore
      oracle-checkable) — a legal instantiation of the spec.
    - ``SAMPLE(expr)`` -> ``min(expr)`` (SAMPLE is any-value by spec;
      min is a deterministic legal choice).
    """
    m = _GROUP_CONCAT_RE.match(expr)
    if m:
        collect = "collect_set" if m.group(1) else "collect_list"
        inner = _translate_expr(m.group(2), prefixes)
        sep = _sql_quote(_unescape(m.group(3)[1:-1])) if m.group(3) else "' '"
        return f"array_join(sort_array({collect}({inner})), {sep})"
    m = _SAMPLE_RE.match(expr)
    if m:
        return f"min({_translate_expr(m.group(1), prefixes)})"
    return _translate_expr(expr, prefixes)


def _extract_exists_binds(raw: str, prefixes: dict[str, str],
                          start_n: int) -> tuple[str, list]:
    """Cut every ``[NOT] EXISTS { group }`` out of a filter-expression
    text, replacing it with a generated boolean flag reference (negated
    inline for the NOT form); the groups compile through ``_parse_group``
    and travel as ``bgp_match``'s ``exists_binds``. String literals are
    length-preserving-masked first so EXISTS inside quotes (or braces in
    literals) never false-trigger."""
    masked = _LITERAL_RE.sub(lambda m: "\x01" * len(m.group(0)), raw)
    pat = re.compile(r"(?i)\b(NOT\s+)?EXISTS\s*\{")
    out, binds, i = [], [], 0
    while True:
        m = pat.search(masked, i)
        if not m:
            out.append(raw[i:])
            break
        depth, j = 1, m.end()
        while j < len(masked) and depth:
            if masked[j] == "{":
                depth += 1
            elif masked[j] == "}":
                depth -= 1
            j += 1
        if depth:
            raise SparqlSyntaxError(
                "unbalanced braces in FILTER ... EXISTS { ... }"
            )
        name = f"__exists_{start_n + len(binds)}"
        binds.append((name, _parse_group(raw[m.end():j - 1], prefixes)))
        out.append(raw[i:m.start()])
        out.append(f"(NOT {name})" if m.group(1) else name)
        i = j
    return "".join(out), binds


def _read_filter_expr(scan: _Scan) -> str:
    """A FILTER constraint per SPARQL's Constraint production: a
    parenthesized expression or a built-in call ``NAME(args)`` (bare
    infix expressions require the parens). Balanced-paren extraction, so
    ``.``/``,`` inside string or regex literals never truncate it."""
    scan.skip_ws()
    if scan.peek_ch() == "(":
        return scan.read_block("(", ")")
    m = re.match(r"[A-Za-z_]\w*", scan.s[scan.i:])
    if m:
        name = m.group(0)
        scan.i += m.end()
        return f"{name}({scan.read_block('(', ')')})"
    raise SparqlSyntaxError(
        "FILTER needs a parenthesized expression or a built-in call"
    )


def _parse_clause(scan: _Scan, prefixes: dict[str, str]
                  ) -> list[tuple[str, str, str]]:
    """One triple-pattern clause, with ``;`` predicate-object lists and
    ``,`` object lists, ending at ``.`` / end-of-body."""
    patterns = []
    subj = _term(scan.read_token(), prefixes)
    while True:
        pred = _term(scan.read_token(), prefixes, pred=True)
        while True:
            obj = _term(scan.read_token(), prefixes)
            patterns.append((subj, pred, obj))
            if scan.eof() or scan.peek_ch() != ",":
                break
            scan.read_token()  # ','
        if scan.eof():
            return patterns
        ch = scan.peek_ch()
        if ch == ".":
            scan.read_token()
            return patterns
        if ch == ";":
            scan.read_token()
            if scan.eof() or scan.peek_ch() in (".", "}"):  # trailing ';'
                if scan.peek_ch() == ".":
                    scan.read_token()
                return patterns
            continue
        return patterns  # next element starts (OPTIONAL/FILTER/...)


def _norm_var(tok: str) -> str:
    if tok.startswith("$"):
        tok = "?" + tok[1:]
    if not tok.startswith("?"):
        raise SparqlSyntaxError(f"VALUES needs variables, got {tok!r}")
    return tok


def _parse_values(scan: _Scan, prefixes: dict[str, str]
                  ) -> dict[str, list]:
    scan.skip_ws()
    if scan.peek_ch() == "(":
        head = _Scan(scan.read_block("(", ")"))
        names = []
        while not head.eof():
            names.append(_norm_var(head.read_token()))
        rows_scan = _Scan(scan.read_block())
        rows = []
        while not rows_scan.eof():
            row_scan = _Scan(rows_scan.read_block("(", ")"))
            row = []
            while not row_scan.eof():
                tok = row_scan.read_token()
                row.append(
                    None if tok.upper() == "UNDEF"
                    else _term(tok, prefixes)
                )
            rows.append(row)
        if any(len(r) != len(names) for r in rows):
            raise SparqlSyntaxError("ragged VALUES rows")
        return {
            name: [r[k] for r in rows] for k, name in enumerate(names)
        }
    name = _norm_var(scan.read_token())
    vals_scan = _Scan(scan.read_block())
    vals = []
    while not vals_scan.eof():
        tok = vals_scan.read_token()
        # single-variable UNDEF rows bind nothing: pure multiplicity
        vals.append(
            None if tok.upper() == "UNDEF" else _term(tok, prefixes)
        )
    return {name: vals}


def _parse_group(body: str, prefixes: dict[str, str]):
    """An OPTIONAL/MINUS/[NOT] EXISTS group body: a full group graph
    pattern — triple patterns, group-scoped FILTERs, nested groups and
    UNION, BIND, VALUES, nested OPTIONAL/MINUS/EXISTS — compiled
    recursively through ``bgp_match``. Subqueries inside raise. The
    group needs a required part: a body of only nested OPTIONALs /
    FILTERs has an empty required solution set, which this engine
    rejects."""
    bk = _parse_body(body, prefixes)
    if bk.get("subselect_texts"):
        raise SparqlSyntaxError(
            "subqueries inside OPTIONAL/MINUS/EXISTS groups are not "
            "supported — hoist the { SELECT ... } to the enclosing group"
        )
    bk = {k: v for k, v in bk.items() if v}
    if not bk.get("patterns") and not bk.get("union_groups"):
        raise SparqlSyntaxError(
            "group needs a required triple pattern (a group of only "
            "nested OPTIONAL/FILTER has an empty required part)"
        )
    if set(bk) == {"patterns"}:
        return bk["patterns"]
    return bk


def _parse_union_branches(branches: list[str],
                          prefixes: dict[str, str]) -> list[dict]:
    """Parse ``{ ... }`` branch texts into ``bgp_match`` branch kwarg
    dicts. A branch that is itself exactly ``{ A } UNION { B }`` is
    flattened (UNION is associative); a branch containing a union
    alongside other clauses keeps it nested as its own
    ``union_groups`` entry (``bgp_match`` recurses)."""
    parsed: list[dict] = []
    for b in branches:
        bk = _parse_body(b, prefixes)
        if bk.get("subselect_texts"):
            raise SparqlSyntaxError(
                "subqueries are not supported inside a UNION branch / "
                "group block — hoist the { SELECT ... } to the "
                "enclosing group"
            )
        bk = {k: v for k, v in bk.items() if v}
        if set(bk) == {"union_groups"} and len(bk["union_groups"]) == 1:
            parsed.extend(bk["union_groups"][0])  # pure nested union
            continue
        if not bk.get("patterns") and not bk.get("union_groups"):
            raise SparqlSyntaxError(
                "each UNION branch / group block needs at least one "
                "triple pattern"
            )
        parsed.append(bk)
    return parsed


def _parse_body(body: str, prefixes: dict[str, str]) -> dict:
    """A WHERE body -> bgp_match keyword arguments. ``{ ... }`` blocks
    become subquery texts ({ SELECT ... }) or inline union/group
    entries (``union_groups``), composable with everything else in the
    body — they join the enclosing solutions on shared variables."""
    scan = _Scan(body)
    kwargs: dict = {"patterns": []}
    while not scan.eof():
        if scan.peek_ch() == "{":
            block = scan.read_block()
            if re.match(r"(?is)\s*SELECT\b", block):
                # { SELECT ... } subquery: compiled to a solution
                # DataFrame later (needs the store), joined on shared vars
                kwargs.setdefault("subselect_texts", []).append(block)
            else:
                # { A } [UNION { B }]... anywhere in the body: compiled
                # to one solution frame, joined on shared variables
                branches = [block]
                while scan.take_kw("UNION"):
                    branches.append(scan.read_block())
                kwargs.setdefault("union_groups", []).append(
                    _parse_union_branches(branches, prefixes)
                )
            # optional trailing '.' per the grammar
            # (GraphPatternNotTriples '.'?)
            if not scan.eof() and scan.peek_ch() == ".":
                scan.read_token()
            continue
        if scan.take_kw("OPTIONAL"):
            kwargs.setdefault("optional", []).append(
                _parse_group(scan.read_block(), prefixes)
            )
        elif scan.take_kw("MINUS"):
            kwargs.setdefault("minus", []).append(
                _parse_group(scan.read_block(), prefixes)
            )
        elif scan.take_kw("FILTER"):
            scan.skip_ws()
            if scan.take_kw("NOT"):
                scan.expect_kw("EXISTS")
                kwargs.setdefault("not_exists", []).append(
                    _parse_group(scan.read_block(), prefixes)
                )
            elif scan.take_kw("EXISTS"):
                kwargs.setdefault("exists", []).append(
                    _parse_group(scan.read_block(), prefixes)
                )
            else:
                raw, ebinds = _extract_exists_binds(
                    _read_filter_expr(scan), prefixes,
                    len(kwargs.get("exists_binds", ())),
                )
                if ebinds:
                    kwargs.setdefault("exists_binds", []).extend(ebinds)
                kwargs.setdefault("filters", []).append(
                    _translate_expr(raw, prefixes)
                )
                if not scan.eof() and scan.peek_ch() == ".":
                    scan.read_token()
        elif scan.take_kw("VALUES"):
            if "values" in kwargs:
                raise SparqlSyntaxError("multiple VALUES blocks")
            kwargs["values"] = _parse_values(scan, prefixes)
        elif scan.peek_kw("SERVICE"):
            raise SparqlSyntaxError(
                "SERVICE is endpoint-specific and not supported — e.g. "
                "the wikibase:label service; this store carries labels "
                "as plain label triples, query them with a pattern"
            )
        elif scan.take_kw("BIND"):
            raw = scan.read_block("(", ")")
            m = re.match(r"(?is)^(.*?)\s+AS\s+[?$](\w+)\s*$", raw)
            if not m:
                raise SparqlSyntaxError(
                    f"BIND needs (expr AS ?name): {raw!r}"
                )
            kwargs.setdefault("binds", []).append(
                (m.group(2), _translate_expr(m.group(1), prefixes))
            )
            if not scan.eof() and scan.peek_ch() == ".":
                scan.read_token()
        elif scan.take_kw("GRAPH"):
            gtok = scan.read_token()
            if gtok[:1] in ("?", "$"):
                gterm = "?" + gtok.lstrip("?$")
            else:
                gterm = _term(gtok, prefixes)
            gk = _parse_body(scan.read_block(), prefixes)
            extra = {k for k, v in gk.items()
                     if v and k not in ("patterns", "filters")}
            if extra:
                raise SparqlSyntaxError(
                    f"GRAPH blocks support triple patterns and FILTER "
                    f"only — found {sorted(extra)}; hoist the clause out "
                    "of the GRAPH block"
                )
            if not gk.get("patterns"):
                raise SparqlSyntaxError(
                    "GRAPH block needs at least one triple pattern"
                )
            for p in gk["patterns"]:
                if len(p) != 3:
                    raise SparqlSyntaxError("nested GRAPH blocks")
                kwargs["patterns"].append(tuple(p) + (gterm,))
            # documented deviation: a GRAPH-block FILTER merges into the
            # enclosing group (group scoping is identical when the filter
            # only names variables the block's required patterns bind)
            if gk.get("filters"):
                kwargs.setdefault("filters", []).extend(gk["filters"])
            if not scan.eof() and scan.peek_ch() == ".":
                scan.read_token()
        else:
            kwargs["patterns"].extend(_parse_clause(scan, prefixes))
    return kwargs


def _parse_projection(scan: _Scan, prefixes: dict[str, str]):
    """SELECT projection list -> (select, aggregates, binds). Stops at
    WHERE or '{'. ``(agg-expr AS ?name)`` terms become aggregates;
    ``(plain-expr AS ?name)`` terms become per-solution binds (SPARQL
    projection expressions), applied after the WHERE body's own BINDs."""
    select: list[str] = []
    aggregates: dict[str, str] = {}
    binds: list[tuple[str, str]] = []
    star = False
    while True:
        if scan.peek_kw("WHERE", "FROM") or scan.peek_ch() == "{":
            break
        if scan.peek_ch() == "*":
            scan.i += 1
            star = True
            continue
        if scan.peek_ch() == "(":
            raw = scan.read_block("(", ")")
            m = re.match(r"(?is)^(.*?)\s+AS\s+[?$](\w+)\s*$", raw)
            if not m:
                raise SparqlSyntaxError(
                    f"projection expression needs (expr AS ?name): {raw!r}"
                )
            expr, name = m.group(1), m.group(2)
            # mask string literals before the aggregate test so
            # aggregate-looking text inside a quoted literal (e.g.
            # CONCAT(?x, " min(y)")) doesn't misroute a plain
            # projection expression into the aggregate path
            if _AGG_RE.search(_LITERAL_RE.sub('""', expr)):
                aggregates[name] = _translate_agg(expr, prefixes)
            else:
                binds.append((name, _translate_expr(expr, prefixes)))
            select.append(name)
            continue
        tok = scan.read_token()
        if not tok.startswith(("?", "$")):
            raise SparqlSyntaxError(f"bad projection term {tok!r}")
        select.append(tok.lstrip("?$"))
    if star:
        if select or aggregates or binds:
            raise SparqlSyntaxError("SELECT * cannot mix with named terms")
        return None, {}, []
    if not select:
        raise SparqlSyntaxError("empty SELECT projection")
    return select, aggregates, binds


def _parse_modifiers(scan: _Scan, prefixes: dict[str, str]) -> dict:
    mods: dict = {}
    while not scan.eof():
        if scan.take_kw("GROUP"):
            scan.expect_kw("BY")
            gvars = []
            while scan.peek_ch() in ("?", "$"):
                gvars.append(scan.read_token().lstrip("?$"))
            if not gvars:
                raise SparqlSyntaxError("empty GROUP BY")
            mods["group_by"] = gvars
        elif scan.take_kw("HAVING"):
            raw = scan.read_block("(", ")")
            mods.setdefault("having", []).append(
                _translate_expr(raw, prefixes)
            )
        elif scan.take_kw("ORDER"):
            scan.expect_kw("BY")
            terms = []
            while True:
                d = scan.take_kw("DESC", "ASC")
                if d:
                    inner = _Scan(scan.read_block("(", ")"))
                    v = inner.read_token().lstrip("?$")
                    terms.append(f"{v} desc" if d.upper() == "DESC" else v)
                elif scan.peek_ch() in ("?", "$"):
                    terms.append(scan.read_token().lstrip("?$"))
                else:
                    break
            if not terms:
                raise SparqlSyntaxError("empty ORDER BY")
            mods["order_by"] = terms
        elif scan.take_kw("LIMIT"):
            scan.skip_ws()
            m = re.match(r"\d+", scan.s[scan.i:])
            if not m:
                raise SparqlSyntaxError("LIMIT needs an integer")
            mods["limit"] = int(m.group(0))
            scan.i += m.end()
        elif scan.take_kw("OFFSET"):
            scan.skip_ws()
            m = re.match(r"\d+", scan.s[scan.i:])
            if not m:
                raise SparqlSyntaxError("OFFSET needs an integer")
            mods["offset"] = int(m.group(0))
            scan.i += m.end()
        else:
            raise SparqlSyntaxError(
                f"unexpected trailing text: {scan.s[scan.i:scan.i + 40]!r}"
            )
    return mods


def _parse_dataset(scan: _Scan, prefixes: dict[str, str]):
    """``FROM <g>`` / ``FROM NAMED <g>`` dataset clauses (repeatable,
    between the projection/template and WHERE)."""
    fg: list[str] = []
    fn: list[str] = []
    while scan.take_kw("FROM"):
        target = fn if scan.take_kw("NAMED") else fg
        target.append(_term(scan.read_token(), prefixes))
    return fg or None, fn or None


def _quadify_group(g):
    """Rewrite one group spec for a quad store: every 3-term pattern
    gains the DEFAULT_GRAPH tag (SPARQL dataset semantics — a plain
    pattern matches the default graph only); 4-term GRAPH patterns pass
    through."""
    if isinstance(g, dict):
        return _quadify_where(g)
    if isinstance(g, str):
        g = parse_bgp(g)
    return [tuple(p) + (DEFAULT_GRAPH,) if len(p) == 3 else tuple(p)
            for p in g]


def _quadify_where(where: dict) -> dict:
    out = dict(where)
    pats = out.get("patterns")
    if pats:
        if isinstance(pats, str):
            pats = parse_bgp(pats)
        out["patterns"] = [
            tuple(p) + (DEFAULT_GRAPH,) if len(p) == 3 else tuple(p)
            for p in pats
        ]
    for key in ("optional", "minus", "not_exists", "exists"):
        if out.get(key):
            out[key] = [_quadify_group(g) for g in out[key]]
    if out.get("union_groups"):
        out["union_groups"] = [
            [_quadify_group(b) for b in ug] for ug in out["union_groups"]
        ]
    if out.get("exists_binds"):
        out["exists_binds"] = [
            (name, _quadify_group(g)) for name, g in out["exists_binds"]
        ]
    return out


def _uses_graph(where: dict) -> bool:
    def group_uses(g) -> bool:
        if isinstance(g, dict):
            return _uses_graph(g)
        if isinstance(g, str):
            return False
        return any(len(p) == 4 for p in g)

    pats = where.get("patterns") or []
    if not isinstance(pats, str) and any(len(p) == 4 for p in pats):
        return True
    for key in ("optional", "minus", "not_exists", "exists"):
        if any(group_uses(g) for g in where.get(key) or []):
            return True
    for ug in where.get("union_groups") or []:
        if any(group_uses(b) for b in ug):
            return True
    return any(group_uses(g) for _, g in where.get("exists_binds") or [])


def _prepare_store(triples: DataFrame, where: dict,
                   from_graphs=None, from_named=None):
    """Resolve the (store, WHERE) pair for quad- vs triple-mode.

    Quad mode (the store has a ``g`` column): apply FROM / FROM NAMED
    via quads.dataset and tag every plain pattern with the default-graph
    sentinel so dataset semantics hold. Triple mode: GRAPH patterns and
    dataset clauses raise — they presuppose named graphs."""
    is_quads = GRAPH_COL in triples.columns
    if not is_quads:
        if from_graphs or from_named:
            raise SparqlSyntaxError(
                "FROM / FROM NAMED need a quad store (a 'g' column); "
                "this store is a single graph"
            )
        if _uses_graph(where):
            raise SparqlSyntaxError(
                "GRAPH needs a quad store (a 'g' column); this store is "
                "a single graph"
            )
        return triples, where
    if from_graphs or from_named:
        from .quads import dataset
        triples = dataset(triples, from_graphs, from_named)
    return triples, _quadify_where(where)


def _require_patterns(where: dict) -> None:
    if not where.get("patterns") and not where.get("subselect_texts") \
            and not where.get("union_groups"):
        raise SparqlSyntaxError(
            "WHERE needs at least one required triple pattern, group, "
            "or subquery (VALUES-only or OPTIONAL-only bodies are not "
            "supported)"
        )


def _compile_where_kwargs(triples: DataFrame, where: dict,
                          prefixes: dict[str, str]) -> dict:
    """Drop empty keys and compile any ``{ SELECT ... }`` subquery texts
    into solution DataFrames (``bgp_match``'s ``sub_selects``)."""
    kwargs = {k: v for k, v in where.items() if v}
    texts = kwargs.pop("subselect_texts", None)
    if texts:
        kwargs["sub_selects"] = [
            _compile_subselect(triples, t, prefixes) for t in texts
        ]
    return kwargs


def _compile_subselect(triples: DataFrame, text: str,
                       prefixes: dict[str, str]) -> DataFrame:
    """A ``{ SELECT ... }`` subquery body -> its solution DataFrame.
    SPARQL's prologue is query-global, so the enclosing PREFIXes apply;
    the subquery carries its own projection/aggregation/modifiers."""
    scan = _Scan(text)
    if not scan.take_kw("SELECT"):
        raise SparqlSyntaxError("a subquery must be a SELECT")
    return _run_select(triples, scan, prefixes, allow_dataset=False)


def _run_select(triples: DataFrame, scan: _Scan,
                prefixes: dict[str, str],
                allow_dataset: bool = True) -> DataFrame:
    """The SELECT form, shared by top-level queries and subqueries (the
    scan is positioned just past the SELECT keyword)."""
    from pyspark.sql import functions as F

    distinct = bool(scan.take_kw("DISTINCT"))
    if scan.take_kw("REDUCED"):
        distinct = True  # REDUCED permits dedup; DISTINCT delivers it
    select, aggregates, proj_binds = _parse_projection(scan, prefixes)
    if not allow_dataset and scan.peek_kw("FROM"):
        raise SparqlSyntaxError(
            "FROM / FROM NAMED are query-global — not allowed in a "
            "subquery"
        )
    fg, fn = _parse_dataset(scan, prefixes)
    scan.take_kw("WHERE")
    where = _parse_body(scan.read_block(), prefixes)
    _require_patterns(where)
    mods = _parse_modifiers(scan, prefixes)
    triples, where = _prepare_store(triples, where, fg, fn)
    kwargs = _compile_where_kwargs(triples, where, prefixes)
    if proj_binds:
        if aggregates or mods.get("group_by"):
            raise SparqlSyntaxError(
                "non-aggregate projection expressions cannot mix with "
                "aggregation — compute the aggregate in a { SELECT ... } "
                "subquery and project over it in the outer query"
            )
        kwargs["binds"] = list(kwargs.get("binds", [])) + proj_binds
    if aggregates:
        kwargs["aggregates"] = aggregates
    kwargs.update(mods)
    return bgp_match(
        triples, select=select, distinct=distinct, **kwargs
    )


def sparql_query_form(text: str) -> str:
    """The query form ('SELECT' | 'ASK' | 'CONSTRUCT' | 'DESCRIBE') of a
    query string, resolved by the SAME prologue-aware scanner
    ``sparql_query`` dispatches on — so form keywords inside PREFIX
    names, IRIs, or comments cannot confuse a caller that needs the form
    without executing anything (e.g. jobs/query.py --explain, which must
    refuse ASK because its probe runs during compilation)."""
    scan = _Scan(_strip_comments(text))
    _parse_prologue(scan)
    kw = scan.peek_kw("SELECT", "ASK", "CONSTRUCT", "DESCRIBE")
    if not kw:
        raise SparqlSyntaxError(
            "query must be SELECT, ASK, CONSTRUCT, or DESCRIBE")
    return kw


def sparql_query(triples: DataFrame, text: str):
    """Parse and run a SPARQL query string against ``triples(subj, pred,
    obj, ...)``. Returns a DataFrame (SELECT/CONSTRUCT/DESCRIBE) or a
    bool (ASK). See the module docstring for the supported surface and
    documented deviations."""
    scan = _Scan(_strip_comments(text))
    prefixes = _parse_prologue(scan)

    if scan.take_kw("SELECT"):
        return _run_select(triples, scan, prefixes)

    if scan.take_kw("ASK"):
        fg, fn = _parse_dataset(scan, prefixes)
        scan.take_kw("WHERE")
        where = _parse_body(scan.read_block(), prefixes)
        _require_patterns(where)
        if not scan.eof():
            raise SparqlSyntaxError(
                f"unexpected text after ASK body: "
                f"{scan.s[scan.i:scan.i + 40]!r}"
            )
        triples, where = _prepare_store(triples, where, fg, fn)
        kwargs = _compile_where_kwargs(triples, where, prefixes)
        return bgp_ask(triples, **kwargs)

    if scan.take_kw("CONSTRUCT"):
        template_scan = _Scan(scan.read_block())
        template = []
        while not template_scan.eof():
            template.extend(_parse_clause(template_scan, prefixes))
        fg, fn = _parse_dataset(scan, prefixes)
        scan.expect_kw("WHERE")
        where = _parse_body(scan.read_block(), prefixes)
        _require_patterns(where)
        mods = _parse_modifiers(scan, prefixes)
        triples, where = _prepare_store(triples, where, fg, fn)
        kwargs = _compile_where_kwargs(triples, where, prefixes)
        kwargs.update(mods)
        # template predicates were <>-wrapped for path handling; emitted
        # triples carry the raw IRI like the store does (path forms
        # raise — CONSTRUCT templates emit concrete triples)
        template = [
            (s, _unwrap_template_pred(p, "a CONSTRUCT template"), o)
            for s, p, o in template
        ]
        return bgp_construct(triples, template=template, **kwargs)

    if scan.take_kw("DESCRIBE"):
        resources, dvars, star = [], [], False
        while not scan.eof() and scan.peek_ch() != "{" \
                and not scan.peek_kw("WHERE") and not scan.peek_kw("FROM"):
            if scan.peek_kw("LIMIT", "OFFSET", "ORDER", "GROUP", "HAVING"):
                raise SparqlSyntaxError(
                    "DESCRIBE takes no solution modifiers"
                )
            tok = scan.read_token()
            if tok == "*":
                star = True
            elif tok[:1] in ("?", "$"):
                dvars.append(tok.lstrip("?$"))
            else:
                resources.append(_term(tok, prefixes))
        fg, fn = _parse_dataset(scan, prefixes)

        def _describe_view(store):
            # over a quad store, DESCRIBE describes the UNION graph
            # (set semantics — a triple present in two graphs is one
            # description triple)
            if GRAPH_COL in store.columns:
                return store.select(*TRIPLE_COLS).distinct()
            return store

        if scan.eof():
            if star or dvars:
                raise SparqlSyntaxError(
                    "DESCRIBE of variables needs a WHERE clause"
                )
            store, _ = _prepare_store(triples, {}, fg, fn)
            return bgp_describe(_describe_view(store), resources)
        # DESCRIBE ?v ... WHERE { ... }: describe every resource the
        # solutions bind to the listed vars (* = all solution vars)
        scan.take_kw("WHERE")
        where = _parse_body(scan.read_block(), prefixes)
        _require_patterns(where)
        if not scan.eof():
            raise SparqlSyntaxError("DESCRIBE takes no solution modifiers")
        store, where = _prepare_store(triples, where, fg, fn)
        sol = bgp_match(
            store, **_compile_where_kwargs(store, where, prefixes)
        )
        triples = _describe_view(store)
        if star:
            dvars = sorted(set(sol.columns) | set(dvars))
        if not dvars:
            raise SparqlSyntaxError(
                "DESCRIBE ... WHERE needs at least one described variable"
            )
        return bgp_describe_solutions(triples, sol, dvars, resources)

    raise SparqlSyntaxError(
        "query must be SELECT, ASK, CONSTRUCT, or DESCRIBE"
    )


_PATH_OP_CHARS = set("+*?^/|!()")


def _unwrap_template_pred(p: str, what: str) -> str:
    """A template/data-block predicate must be a single concrete IRI (or
    a variable in templates): unwrap the path-handling ``<...>`` ONLY
    when it encloses exactly one IRI — a path form (``<a>/<b>``,
    ``<a>+``, bare ``ex:a/ex:b``) raises instead of silently emitting a
    corrupted predicate or deleting nothing (SPARQL forbids paths in
    CONSTRUCT templates and update QuadPatterns)."""
    if p.startswith(("?", "$")):
        return p
    if p.startswith("<") and p.endswith(">"):
        inner = p[1:-1]
        if "<" not in inner and ">" not in inner:
            return inner
    elif not _PATH_OP_CHARS & set(p):
        return p  # bare prefixed-name form, no path operators
    raise SparqlSyntaxError(
        f"property paths are not allowed in {what} — a template/data "
        f"block emits concrete triples: {p!r}"
    )


def _parse_triple_block(text: str, prefixes: dict[str, str],
                        ground: bool, what: str
                        ) -> list[tuple[str, str, str]]:
    """A ``{ triples }`` block (INSERT/DELETE data or template) ->
    parsed triples, predicates unwrapped from their path-handling
    ``<...>``. ``ground=True`` (the DATA forms) additionally rejects
    variables."""
    tscan = _Scan(text)
    out = []
    while not tscan.eof():
        out.extend(_parse_clause(tscan, prefixes))
    if not out:
        raise SparqlSyntaxError(f"empty {what} block")
    unwrapped = []
    for s, p, o in out:
        p = _unwrap_template_pred(p, what)
        if ground and any(t.startswith(("?", "$")) for t in (s, p, o)):
            raise SparqlSyntaxError(
                f"{what} requires ground triples (no variables): "
                f"{(s, p, o)!r}"
            )
        unwrapped.append((s, p, o))
    return unwrapped


def _store_minus(store, dels, hint_broadcast: bool):
    """Graph difference: LEFT ANTI on the full triple — the delete set
    is the build side, so a literal DELETE DATA broadcasts and the store
    itself never shuffles."""
    from pyspark.sql import functions as F

    d = dels.dropDuplicates()
    return store.join(
        F.broadcast(d) if hint_broadcast else d,
        on=list(TRIPLE_COLS), how="left_anti",
    )


def _store_plus(store, ins, hint_broadcast: bool):
    """Graph union with RDF set semantics, without re-shuffling the
    store: the already-present subset is found with a LEFT SEMI probe
    (the small INSERT set is the build side), subtracted from the
    insert set driver-free (exceptAll of two small frames), and only
    the genuinely new triples append."""
    from pyspark.sql import functions as F

    ins_d = ins.dropDuplicates()
    probe = F.broadcast(ins_d) if hint_broadcast else ins_d
    existing = store.join(
        probe, on=list(TRIPLE_COLS), how="left_semi"
    ).dropDuplicates()
    return store.unionByName(ins_d.exceptAll(existing))


def _reject_update_graph(where: dict) -> None:
    if _uses_graph(where):
        raise SparqlSyntaxError(
            "GRAPH is not supported in updates — sparql_update operates "
            "on a single graph (query named graphs with sparql_query "
            "over a quad store)"
        )


def sparql_update(triples: DataFrame, text: str) -> DataFrame:
    """SPARQL 1.1 Update against ``triples(subj, pred, obj, ...)`` —
    as an IMMUTABLE transform: returns the new ``(subj, pred, obj)``
    graph; the input DataFrame (and whatever store it came from) is
    untouched, Spark-style. Callers persist the result however they
    version stores (e.g. ``sinks.write_triples`` to a new manifest
    generation).

    Supported operations, ``;``-separated and applied in order (each
    sees the previous result; within one operation DELETE and INSERT
    both evaluate against the pre-operation graph, per spec):

    - ``INSERT DATA { triples }`` / ``DELETE DATA { triples }`` —
      ground triples; the literal set broadcasts, the store never
      shuffles (ANTI/SEMI probes with the small side as build side).
    - ``DELETE WHERE { patterns }`` — shorthand: the pattern block is
      both the match and the delete template (QuadPattern per spec —
      filters/OPTIONAL/etc. raise; use the full form).
    - ``DELETE { template } [INSERT { template }] WHERE { body }`` and
      ``INSERT { template } WHERE { body }`` — the body compiles through
      the full ``bgp_match`` surface; templates instantiate per solution
      exactly like CONSTRUCT (unbound-in-an-OPTIONAL-miss instantiations
      drop, per spec), then graph-difference / set-union apply.

    Graph-management operations (LOAD/CLEAR/CREATE/DROP named graphs)
    are out of scope — the store is a single graph; they raise.
    """
    scan = _Scan(_strip_comments(text))
    prefixes = _parse_prologue(scan)
    store = triples.select(*TRIPLE_COLS)
    spark = triples.sparkSession
    n_ops = 0
    while True:
        scan.skip_ws()
        if scan.eof():
            break
        if scan.take_kw("LOAD", "CLEAR", "CREATE", "DROP", "COPY",
                        "MOVE", "ADD"):
            raise SparqlSyntaxError(
                "graph-management operations are not supported — the "
                "store is a single graph"
            )
        if scan.take_kw("INSERT"):
            if scan.take_kw("DATA"):
                data = _parse_triple_block(
                    scan.read_block(), prefixes, True, "INSERT DATA"
                )
                store = _store_plus(
                    store,
                    spark.createDataFrame(data, list(TRIPLE_COLS)),
                    hint_broadcast=True,
                )
            else:
                template = _parse_triple_block(
                    scan.read_block(), prefixes, False, "INSERT"
                )
                scan.expect_kw("WHERE")
                where = _parse_body(scan.read_block(), prefixes)
                _require_patterns(where)
                _reject_update_graph(where)
                ins = bgp_construct(
                    store, template=template,
                    **_compile_where_kwargs(store, where, prefixes),
                )
                store = _store_plus(store, ins, hint_broadcast=False)
        elif scan.take_kw("DELETE"):
            if scan.take_kw("DATA"):
                data = _parse_triple_block(
                    scan.read_block(), prefixes, True, "DELETE DATA"
                )
                store = _store_minus(
                    store,
                    spark.createDataFrame(data, list(TRIPLE_COLS)),
                    hint_broadcast=True,
                )
            elif scan.take_kw("WHERE"):
                where = _parse_body(scan.read_block(), prefixes)
                _reject_update_graph(where)
                extra = {k for k, v in where.items()
                         if v and k != "patterns"}
                if extra or not where.get("patterns"):
                    raise SparqlSyntaxError(
                        "DELETE WHERE takes only triple patterns "
                        "(QuadPattern per spec) — use DELETE { ... } "
                        "WHERE { ... } for a full group"
                    )
                template = [
                    (s, _unwrap_template_pred(p, "DELETE WHERE"), o)
                    for s, p, o in where["patterns"]
                ]
                dels = bgp_construct(
                    store, template=template, patterns=where["patterns"]
                )
                store = _store_minus(store, dels, hint_broadcast=False)
            else:
                del_template = _parse_triple_block(
                    scan.read_block(), prefixes, False, "DELETE"
                )
                ins_template = None
                if scan.take_kw("INSERT"):
                    ins_template = _parse_triple_block(
                        scan.read_block(), prefixes, False, "INSERT"
                    )
                scan.expect_kw("WHERE")
                where = _parse_body(scan.read_block(), prefixes)
                _require_patterns(where)
                _reject_update_graph(where)
                kwargs = _compile_where_kwargs(store, where, prefixes)
                dels = bgp_construct(store, template=del_template,
                                     **kwargs)
                ins = (
                    bgp_construct(store, template=ins_template, **kwargs)
                    if ins_template else None
                )
                # both instantiated against the pre-op graph (lazy
                # lineage pins it); delete applies before insert
                store = _store_minus(store, dels, hint_broadcast=False)
                if ins is not None:
                    store = _store_plus(store, ins, hint_broadcast=False)
        else:
            raise SparqlSyntaxError(
                "update operation must start with INSERT or DELETE"
            )
        n_ops += 1
        scan.skip_ws()
        if not scan.eof():
            if scan.peek_ch() != ";":
                raise SparqlSyntaxError(
                    "update operations must be separated by ';'"
                )
            scan.read_token()
            # truncate lineage between operations: each DELETE/INSERT
            # WHERE embeds the pre-op store several times (templates +
            # anti/semi probes), so an unchecked N-op sequence grows the
            # plan exponentially — same hygiene as the iterative graph
            # operators
            store = store.localCheckpoint(eager=False)
    if not n_ops:
        raise SparqlSyntaxError("empty update request")
    return store
