"""RDF datasets (named graphs) over a QUAD DataFrame — SPARQL 1.1
``GRAPH``, ``FROM`` and ``FROM NAMED`` as relational views.

The reference keeps one rdflib ``Graph`` per incident collection and
serializes each to its own file (``classes.py:265-353`` — the file
boundary IS its graph boundary); the Spark-first generalization is a
single quad table ``(g, subj, pred, obj, ...)`` where ``g`` names the
graph, the driver-side analog of a TriG/N-Quads store. Everything here
is a projection or filter over that table:

- the DEFAULT graph's rows carry the reserved tag ``bgp.DEFAULT_GRAPH``
  (``urn:x-default``) so graph selection is a plain equality predicate —
  pushed to the parquet scan, and a store partitioned by ``g`` prunes to
  the touched graphs only;
- ``GRAPH <iri> { ... }`` = an equality filter on ``g`` (every bgp_match
  feature composes unchanged against the filtered view);
- ``GRAPH ?g { ... }`` = quad patterns: the group's patterns carry the
  graph variable as a 4th term, so ``?g`` joins across patterns like any
  other variable and lands in the solution row (bgp._compile_pattern
  excludes the default-graph sentinel per SPARQL 1.1 §13.3);
- ``FROM`` / ``FROM NAMED`` = :func:`dataset`, which re-tags the chosen
  graphs as the new default (RDF merge = union + set-dedup) and
  restricts the named-graph space — a new quad frame, no data movement
  until an action.

Plain 3-term patterns over a quad frame would match across ALL graphs
(the "union default graph" mode some stores offer); for SPARQL dataset
semantics always expand patterns with :func:`default_patterns` /
:func:`graph_patterns`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bgp import DEFAULT_GRAPH, GRAPH_COL, is_var, parse_bgp

QUAD_COLS = (GRAPH_COL, "subj", "pred", "obj")


def as_quads(triples: DataFrame, graph: str = DEFAULT_GRAPH) -> DataFrame:
    """Tag a triple frame as one graph of a quad store."""
    return triples.select(F.lit(graph).alias(GRAPH_COL), "*")


def union_graphs(named: dict[str, DataFrame],
                 default: DataFrame | None = None) -> DataFrame:
    """Assemble a quad store from per-graph triple frames (the
    reference's file-per-collection layout lifted into one table)."""
    parts = [as_quads(df, g) for g, df in named.items()]
    if default is not None:
        parts.append(as_quads(default))
    if not parts:
        raise ValueError("union_graphs needs at least one graph")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def graph_view(quads: DataFrame, graph: str = DEFAULT_GRAPH) -> DataFrame:
    """One graph's triples (drops the ``g`` column): the view to hand to
    bgp_match / property paths when the graph is pinned."""
    return quads.filter(F.col(GRAPH_COL) == F.lit(graph)).drop(GRAPH_COL)


def dataset(quads: DataFrame,
            from_graphs: list[str] | None = None,
            from_named: list[str] | None = None) -> DataFrame:
    """The active dataset of a query with ``FROM`` / ``FROM NAMED``
    clauses, as a new quad frame.

    ``from_graphs`` — the new default graph is the RDF MERGE of the named
    graphs listed (union + set-dedup on the triple, per SPARQL 1.1
    §13.2's graph merge; without dedup a triple present in two source
    graphs would double its bag multiplicity, which no SPARQL store
    does). ``from_named`` — the named-graph space is restricted to the
    listed names. Either clause alone implies an EMPTY other part, per
    spec: ``FROM NAMED`` only => empty default graph; ``FROM`` only =>
    no named graphs."""
    if from_graphs is None and from_named is None:
        return quads
    other = [c for c in quads.columns if c not in (GRAPH_COL, "subj", "pred", "obj")]
    parts: list[DataFrame] = []
    if from_graphs:
        merged = (
            quads.filter(F.col(GRAPH_COL).isin(list(from_graphs)))
            .drop(GRAPH_COL)
            .dropDuplicates(["subj", "pred", "obj"] + other)
        )
        parts.append(as_quads(merged))
    if from_named:
        parts.append(
            quads.filter(
                F.col(GRAPH_COL).isin(list(from_named))
                & (F.col(GRAPH_COL) != F.lit(DEFAULT_GRAPH))
            )
        )
    if not parts:
        # e.g. FROM NAMED [] — an empty dataset with the store's schema
        return quads.filter(F.lit(False))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _expand(bgp, graph_term: str) -> list[tuple]:
    pats = parse_bgp(bgp) if isinstance(bgp, str) else list(bgp)
    out = []
    for p in pats:
        if len(p) != 3:
            raise ValueError(f"expected triple pattern, got {p!r}")
        out.append(tuple(p) + (graph_term,))
    return out


def graph_patterns(bgp, graph_term: str) -> list[tuple]:
    """``GRAPH <iri-or-?var> { bgp }`` -> quad patterns for bgp_match.
    A variable graph term binds the graph name into the solutions (and
    joins across the group's patterns); a constant pins one named
    graph."""
    if not (is_var(graph_term) or graph_term):
        raise ValueError("empty graph term")
    return _expand(bgp, graph_term)


def default_patterns(bgp) -> list[tuple]:
    """Patterns matching the dataset's DEFAULT graph only."""
    return _expand(bgp, DEFAULT_GRAPH)
