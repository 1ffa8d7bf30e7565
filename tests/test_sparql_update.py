"""SPARQL 1.1 Update as an immutable store transform
(operators/sparql.sparql_update): hand-built store, hand-computed
expected graphs. The input DataFrame must never change — every op
returns a new graph."""

from __future__ import annotations

import pytest

from multilingual_wiki_event_pipeline_spark.operators.sparql import (
    SparqlSyntaxError,
    sparql_update,
)

EX = "http://ex.org/"


@pytest.fixture(scope="module")
def store(spark):
    rows = [
        ("e1", EX + "actor", "alice"),
        ("e1", EX + "label", "boom"),
        ("e2", EX + "actor", "bob"),
        ("e2", EX + "label", "quiet"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


def _g(df):
    return sorted(map(tuple, df.collect()))


def test_insert_data_adds_and_is_set_semantic(store):
    out = sparql_update(store, """
        PREFIX ex: <http://ex.org/>
        INSERT DATA { e3 ex:actor "carol" . e1 ex:label "boom" }
    """)
    assert _g(out) == _g(store) + [("e3", EX + "actor", "carol")]
    # input untouched
    assert store.count() == 4


def test_delete_data_removes_exact_triples_only(store):
    out = sparql_update(store, """
        PREFIX ex: <http://ex.org/>
        DELETE DATA { e1 ex:label "boom" . e9 ex:label "ghost" }
    """)
    assert _g(out) == [
        ("e1", EX + "actor", "alice"),
        ("e2", EX + "actor", "bob"),
        ("e2", EX + "label", "quiet"),
    ]


def test_delete_where_pattern(store):
    out = sparql_update(store, """
        PREFIX ex: <http://ex.org/>
        DELETE WHERE { ?e ex:actor ?who }
    """)
    assert _g(out) == [
        ("e1", EX + "label", "boom"),
        ("e2", EX + "label", "quiet"),
    ]


def test_delete_insert_where_rewrites_predicate(store):
    out = sparql_update(store, """
        PREFIX ex: <http://ex.org/>
        DELETE { ?e ex:actor ?who }
        INSERT { ?e ex:agent ?who }
        WHERE  { ?e ex:actor ?who . FILTER(?who != "bob") }
    """)
    assert _g(out) == [
        ("e1", EX + "agent", "alice"),
        ("e1", EX + "label", "boom"),
        ("e2", EX + "actor", "bob"),
        ("e2", EX + "label", "quiet"),
    ]


def test_insert_where_derives_new_triples(store):
    out = sparql_update(store, """
        PREFIX ex: <http://ex.org/>
        INSERT { ?who ex:actsIn ?e } WHERE { ?e ex:actor ?who }
    """)
    assert _g(out) == sorted(_g(store) + [
        ("alice", EX + "actsIn", "e1"),
        ("bob", EX + "actsIn", "e2"),
    ])


def test_sequence_applies_in_order(store):
    # the second op sees the first op's insertion
    out = sparql_update(store, """
        PREFIX ex: <http://ex.org/>
        INSERT DATA { e3 ex:actor "carol" } ;
        DELETE WHERE { ?e ex:actor ?who } ;
        INSERT DATA { e4 ex:label "after" }
    """)
    assert _g(out) == [
        ("e1", EX + "label", "boom"),
        ("e2", EX + "label", "quiet"),
        ("e4", EX + "label", "after"),
    ]


def test_delete_insert_both_see_pre_op_graph(store, spark):
    # chain rewrite x->y->z: DELETE/INSERT must both evaluate against
    # the PRE-op graph — a sequential delete would starve the second
    # match, a sequential insert would double-fire it
    chain = spark.createDataFrame(
        [("x", EX + "next", "y"), ("y", EX + "next", "z")],
        "subj string, pred string, obj string",
    )
    out = sparql_update(chain, """
        PREFIX ex: <http://ex.org/>
        DELETE { ?a ex:next ?b } INSERT { ?b ex:prev ?a }
        WHERE { ?a ex:next ?b }
    """)
    assert _g(out) == [
        ("y", EX + "prev", "x"),
        ("z", EX + "prev", "y"),
    ]


def test_insert_data_with_variable_raises(store):
    with pytest.raises(SparqlSyntaxError, match="ground"):
        sparql_update(store, "INSERT DATA { ?e <p> \"v\" }")


def test_delete_where_with_filter_raises(store):
    with pytest.raises(SparqlSyntaxError, match="QuadPattern"):
        sparql_update(store, """
            PREFIX ex: <http://ex.org/>
            DELETE WHERE { ?e ex:actor ?w . FILTER(?w != "bob") }
        """)


def test_insert_data_path_predicate_raises(store):
    # a path form would silently corrupt the stored predicate
    with pytest.raises(SparqlSyntaxError, match="paths are not allowed"):
        sparql_update(store, """
            PREFIX ex: <http://ex.org/>
            INSERT DATA { e5 ex:a/ex:b "v" }
        """)


def test_delete_where_path_predicate_raises(store):
    # the path matches transitively but its 'template' would delete
    # nothing — must raise instead of silently no-opping
    with pytest.raises(SparqlSyntaxError, match="paths are not allowed"):
        sparql_update(store, """
            PREFIX ex: <http://ex.org/>
            DELETE WHERE { ?s ex:actor+ ?o }
        """)


def test_construct_path_template_raises(store, spark):
    from multilingual_wiki_event_pipeline_spark.operators.sparql import (
        sparql_query,
    )

    with pytest.raises(SparqlSyntaxError, match="paths are not allowed"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            CONSTRUCT { ?s ex:a/ex:b ?o } WHERE { ?s ex:actor ?o }
        """)


def test_long_sequence_plan_stays_bounded(store):
    # 8 chained ops: without per-op lineage truncation this plan grows
    # ~4^N store references; with it, building + running stays sane
    ops = " ;\n".join(
        f'INSERT DATA {{ n{i} <http://ex.org/p> "v{i}" }}'
        for i in range(8)
    )
    out = sparql_update(store, ops)
    assert out.count() == 4 + 8


def test_graph_management_raises(store):
    with pytest.raises(SparqlSyntaxError, match="single graph"):
        sparql_update(store, "CLEAR GRAPH <g>")


def test_unbound_insert_template_variable_raises(store):
    with pytest.raises(ValueError, match="unbound"):
        sparql_update(store, """
            PREFIX ex: <http://ex.org/>
            INSERT { ?e ex:x ?nope } WHERE { ?e ex:actor ?who }
        """)
