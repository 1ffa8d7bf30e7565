"""The SPARQL query-string front-end (operators/sparql.py): parse the
textual form the reference authors (reference `utils.py:33-83` builds
SELECT strings with PREFIX headers, OPTIONALs, and property paths) and
run it through the BGP algebra. Hand-built store, hand-computed
expectations; several cases differentially checked against the
programmatic bgp_match call they must compile to."""

from __future__ import annotations

import pytest

from multilingual_wiki_event_pipeline_spark.operators import bgp
from multilingual_wiki_event_pipeline_spark.operators.sparql import (
    RDF_TYPE,
    SparqlSyntaxError,
    sparql_query,
)

EX = "http://ex.org/"


@pytest.fixture(scope="module")
def store(spark):
    rows = [
        ("e1", RDF_TYPE, EX + "Event"),
        ("e2", RDF_TYPE, EX + "Event"),
        ("e1", EX + "actor", "alice"),
        ("e1", EX + "actor", "carol"),
        ("e2", EX + "actor", "bob"),
        ("e1", EX + "label", "big boom"),
        ("e2", EX + "label", "quiet"),
        ("alice", EX + "knows", "bob"),
        ("t1", EX + "sub", "t2"),
        ("t2", EX + "sub", "t3"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_select_basic_with_prefix_and_a_keyword(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who WHERE {
            ?e a ex:Event .
            ?e ex:actor ?who .
        }
    """).collect()
    assert sorted((r.e, r.who) for r in out) == [
        ("e1", "alice"), ("e1", "carol"), ("e2", "bob"),
    ]


def test_select_matches_programmatic_call(store):
    text = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT * WHERE { ?e ex:actor ?who }
    """)
    prog = bgp.bgp_match(store, [("?e", f"<{EX}actor>", "?who")])
    assert sorted(map(tuple, text.collect())) == \
        sorted(map(tuple, prog.collect()))


def test_select_property_path(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?x WHERE { t1 ex:sub+ ?x }
    """).collect()
    assert sorted({r.x for r in out}) == ["t2", "t3"]


def test_select_literal_with_spaces(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?y WHERE { ?y ex:label "big boom" }
    """).collect()
    assert [r.y for r in out] == ["e1"]


def test_select_distinct_order_limit(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT DISTINCT ?who WHERE { ?e ex:actor ?who }
        ORDER BY DESC(?who) LIMIT 2
    """).collect()
    assert [r.who for r in out] == ["carol", "bob"]


def test_order_offset_limit_pagination(store):
    q = """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE { ?e ex:actor ?who }
        ORDER BY ?who OFFSET %d LIMIT 2
    """
    assert [r.who for r in sparql_query(store, q % 0).collect()] == \
        ["alice", "bob"]
    assert [r.who for r in sparql_query(store, q % 1).collect()] == \
        ["bob", "carol"]
    assert [r.who for r in sparql_query(store, q % 3).collect()] == []


def test_optional_with_group_scoped_filter(store):
    # the SPARQL filter-scope trap: the FILTER inside OPTIONAL restricts
    # the group before the left join, so e2 survives with a null
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?b WHERE {
            ?e a ex:Event .
            OPTIONAL { ?e ex:actor ?a . ?a ex:knows ?b .
                       FILTER(?b != "nobody") }
        }
    """).collect()
    got = sorted((r.e, r.b) for r in out)
    assert got == [("e1", "bob"), ("e2", None)]


def test_filter_translation_sparql_forms(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?l WHERE {
            ?e ex:label ?l .
            FILTER(REGEX(?l, "boom") || ?l = "quiet")
            FILTER(!(?e = "e9") && BOUND(?l))
        }
    """).collect()
    assert sorted((r.e, r.l) for r in out) == [
        ("e1", "big boom"), ("e2", "quiet"),
    ]


def test_values_single_and_multi(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who WHERE {
            ?e ex:actor ?who .
            VALUES ?who { "alice" "bob" }
        }
    """).collect()
    assert sorted((r.e, r.who) for r in out) == [
        ("e1", "alice"), ("e2", "bob"),
    ]
    out2 = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who ?tag WHERE {
            ?e ex:actor ?who .
            VALUES (?who ?tag) { ("alice" "A") ("bob" "B") }
        }
    """).collect()
    assert sorted((r.e, r.who, r.tag) for r in out2) == [
        ("e1", "alice", "A"), ("e2", "bob", "B"),
    ]


def test_minus_and_not_exists(store):
    q = """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE {{
            ?e ex:actor ?who .
            {kw} {{ ?who ex:knows ?z }}
        }}
    """
    for kw in ("MINUS", "FILTER NOT EXISTS"):
        out = sparql_query(store, q.format(kw=kw)).collect()
        assert sorted(r.who for r in out) == ["bob", "carol"], kw


def test_group_by_count_having(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e (COUNT(?who) AS ?n) WHERE { ?e ex:actor ?who }
        GROUP BY ?e HAVING(?n >= 2)
    """).collect()
    assert [(r.e, r.n) for r in out] == [("e1", 2)]


def test_union_top_level(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e WHERE {
            { ?e ex:label "quiet" } UNION { ?e ex:actor "alice" }
        }
    """).collect()
    assert sorted(r.e for r in out) == ["e1", "e2"]


def test_ask(store):
    base = "PREFIX ex: <http://ex.org/> ASK { ?e ex:actor %s }"
    assert sparql_query(store, base % '"alice"') is True
    assert sparql_query(store, base % '"nobody"') is False


def test_construct(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        CONSTRUCT { ?who ex:actedIn ?e }
        WHERE { ?e ex:actor ?who . ?e ex:label "big boom" }
    """).collect()
    assert sorted((r.subj, r.pred, r.obj) for r in out) == [
        ("alice", EX + "actedIn", "e1"), ("carol", EX + "actedIn", "e1"),
    ]


def test_describe(store):
    out = sparql_query(store, "DESCRIBE <alice>").collect()
    assert sorted((r.subj, r.obj) for r in out) == [
        ("alice", "bob"), ("e1", "alice"),
    ]


def test_predicate_object_lists_and_comments(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>   # declares the store namespace
        SELECT ?e WHERE {
            ?e a ex:Event ;          # type via 'a'
               ex:actor "alice" , "carol" .   # object list: both required
        }
    """).collect()
    assert [r.e for r in out] == ["e1"]


def test_negated_set_and_a_keyword_in_path(store):
    # !a must negate rdf:type (the keyword expands inside paths and
    # negated sets), not the literal predicate string "a"
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?s ?o WHERE { ?s !a ?o . ?s ex:knows ?o }
    """).collect()
    assert [(r.s, r.o) for r in out] == [("alice", "bob")]
    out2 = sparql_query(
        store, "SELECT ?e ?t WHERE { ?e a ?t }"
    ).count()
    assert out2 == 2  # the rdf:type edges !a excluded above


def test_unicode_escape_in_literal(spark):
    t = spark.createDataFrame(
        [("s", "p", "café")], "subj string, pred string, obj string"
    )
    out = sparql_query(t, 'SELECT ?x WHERE { ?x p "caf\\u00e9" }')
    assert [r.x for r in out.collect()] == ["s"]
    with pytest.raises(SparqlSyntaxError, match="unknown string escape"):
        sparql_query(t, r'SELECT ?x WHERE { ?x p "bad\q" }')


def test_less_than_quoted_literal_with_gt_inside(store):
    # '<' followed by a quoted literal containing '>' must stay a
    # comparison operator, and the trailing comment must still strip
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?l WHERE {
            ?e ex:label ?l .
            FILTER(?l<"c>c")  # comment after the tricky filter
        }
    """).collect()
    assert [r.l for r in out] == ["big boom"]


def test_union_branch_without_pattern_raises(store):
    with pytest.raises(SparqlSyntaxError, match="UNION branch"):
        sparql_query(store, """
            SELECT ?x WHERE {
                { VALUES ?x { "a" } } UNION { ?s ?p ?x }
            }
        """)


def test_lang_tag_stripped(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e WHERE { ?e ex:label "quiet"@en }
    """).collect()
    assert [r.e for r in out] == ["e2"]


def test_filter_literals_pass_through_untouched(store):
    # '!'/'&&'/'?'/'{n,m}' INSIDE string literals must not be rewritten
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?l WHERE {
            ?e ex:label ?l .
            FILTER(?l != "wow!" && ?l != "a&&b")
            FILTER(REGEX(?l, "b.g [b]{1,2}o+m|quiet?"))
        }
    """).collect()
    assert sorted((r.e, r.l) for r in out) == [
        ("e1", "big boom"), ("e2", "quiet"),
    ]


def test_comment_after_less_than_comparison(store):
    # '<' as a comparison operator must not open an "IRI" and swallow
    # the '#' comment stripping
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?l WHERE {
            ?e ex:label ?l .
            FILTER(?l < "quiet")   # lexicographic: only "big boom"
        }
    """).collect()
    assert [r.l for r in out] == ["big boom"]


def test_unparenthesized_builtin_filter(store):
    # SPARQL's Constraint production allows a bare BuiltInCall — and the
    # regex literal's '.' must not truncate it
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e WHERE {
            ?e ex:label ?l .
            FILTER REGEX(?l, "b.g.boom")
        }
    """).collect()
    assert [r.e for r in out] == ["e1"]


def test_escaped_quote_in_literal(spark):
    t = spark.createDataFrame(
        [("s", "p", 'say "hi"')], "subj string, pred string, obj string"
    )
    out = sparql_query(t, r'SELECT ?x WHERE { ?x p "say \"hi\"" }')
    assert [r.x for r in out.collect()] == ["s"]


def test_values_dollar_variable(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who WHERE {
            ?e ex:actor $who .
            VALUES $who { "bob" }
        }
    """).collect()
    assert [(r.e, r.who) for r in out] == [("e2", "bob")]


def test_regex_flags_literal(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?y WHERE { ?y ex:label ?l . FILTER(REGEX(?l, "BIG", "i")) }
    """).collect()
    assert [r.y for r in out] == ["e1"]


def test_values_undef_row_matches_everything(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who ?tag WHERE {
            ?e ex:actor ?who .
            VALUES (?who ?tag) { ("alice" "A") (UNDEF "any") }
        }
    """).collect()
    assert sorted((r.e, r.who, r.tag) for r in out) == [
        ("e1", "alice", "A"), ("e1", "alice", "any"),
        ("e1", "carol", "any"), ("e2", "bob", "any"),
    ]


def test_values_single_var_undef_is_pure_multiplicity(store):
    # the UNDEF row constrains nothing: every solution once more
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who WHERE {
            ?e ex:actor ?who .
            VALUES ?who { "bob" UNDEF }
        }
    """).collect()
    assert sorted((r.e, r.who) for r in out) == [
        ("e1", "alice"), ("e1", "carol"),
        ("e2", "bob"), ("e2", "bob"),
    ]


def test_values_undef_binding_fresh_var_extends_solutions(store):
    # the (UNDEF "B") row binds only the fresh ?tag: it extends every
    # solution; the fully-bound row extends only its match
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who ?tag WHERE {
            ?e ex:actor ?who .
            VALUES (?who ?tag) { ("bob" "A") (UNDEF "B") }
        }
    """).collect()
    assert sorted((r.who, r.tag) for r in out) == [
        ("alice", "B"), ("bob", "A"), ("bob", "B"), ("carol", "B"),
    ]


def test_describe_where_variable(store):
    # resources bound to ?who by the WHERE: alice, carol, bob; the
    # description is every triple touching one of them (subject or
    # object), as a set
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        DESCRIBE ?who WHERE { ?e ex:actor ?who }
    """).collect()
    assert sorted(map(tuple, out)) == [
        ("alice", EX + "knows", "bob"),
        ("e1", EX + "actor", "alice"),
        ("e1", EX + "actor", "carol"),
        ("e2", EX + "actor", "bob"),
    ]


def test_describe_where_star_and_explicit_iri(store):
    # * describes every solution var (?x only here); the explicit term
    # adds t3 even though no variable binds it
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        DESCRIBE * t3 WHERE { t1 ex:sub ?x }
    """).collect()
    assert sorted(map(tuple, out)) == [
        ("t1", EX + "sub", "t2"),
        ("t2", EX + "sub", "t3"),
    ]


def test_describe_where_unbound_variable_raises(store):
    with pytest.raises(ValueError, match="not bound by the WHERE"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            DESCRIBE ?nope WHERE { ?e ex:actor ?who }
        """).collect()


def test_describe_variables_without_where_raises(store):
    with pytest.raises(SparqlSyntaxError, match="needs a WHERE"):
        sparql_query(store, "DESCRIBE ?who")


def test_values_on_union_partial_variable_raises(store):
    # ?lab is unbound in the actor branch: a VALUES equi-join on it
    # would drop those solutions SPARQL keeps — must raise, not lie
    with pytest.raises(ValueError, match="possibly-unbound|UNION branch"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            SELECT * WHERE {
                { ?e ex:actor ?who } UNION { ?e ex:label ?lab }
                VALUES ?lab { "boom" }
            }
        """).collect()


def test_optional_on_union_partial_variable_raises(store):
    with pytest.raises(ValueError, match="UNION branch"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            SELECT * WHERE {
                { ?e ex:actor ?who } UNION { ?e ex:label ?lab }
                OPTIONAL { ?x ex:knows ?lab }
            }
        """).collect()


def test_values_var_undef_in_every_row_stays_in_scope(store):
    # ?x is UNDEF in the only row: stays in scope as unbound (null),
    # not an unresolved-column crash
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who ?x WHERE {
            ?e ex:actor ?who .
            VALUES (?who ?x) { ("alice" UNDEF) }
        }
    """).collect()
    assert [(r.who, r.x) for r in out] == [("alice", None)]


def test_values_undef_on_pattern_bound_var_keeps_it_certain(store):
    # UNDEF rows can only null a variable VALUES itself introduces;
    # ?who is pattern-bound, so a later EXISTS correlation on it is
    # sound and must NOT raise
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who WHERE {
            ?e ex:actor ?who .
            VALUES ?who { "bob" UNDEF }
            FILTER(EXISTS { ?who ex:knows ?z } || ?who = "bob")
        }
    """).collect()
    assert sorted((r.e, r.who) for r in out) == [
        ("e1", "alice"), ("e2", "bob"), ("e2", "bob"),
    ]


def test_regex_empty_flags_is_two_arg_form(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?y WHERE { ?y ex:label ?l . FILTER(REGEX(?l, "boom", "")) }
    """).collect()
    assert [r.y for r in out] == ["e1"]


def test_values_on_optional_introduced_variable_raises(store):
    with pytest.raises(ValueError, match="OPTIONAL-introduced"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            SELECT * WHERE {
                ?e a ex:Event .
                OPTIONAL { ?e ex:missing ?m }
                VALUES ?m { "x" }
            }
        """).collect()


@pytest.mark.parametrize("text, msg", [
    ("PREFIX ex: <http://ex SELECT ?x WHERE { ?x ?p ?o }",
     "unterminated PREFIX"),
    ('SELECT ?x WHERE { VALUES ?x { "a" } }', "required triple pattern"),
    ('ASK { ?e ?p ?o } LIMIT 5', "after ASK body"),
    ('SELECT ?x WHERE { ?x ?p ?l . FILTER(REGEX(?l, "a", "q")) }',
     "REGEX flags"),
    ("DESCRIBE <a> LIMIT 5", "no solution modifiers"),
])
def test_malformed_queries_raise_cleanly(store, text, msg):
    with pytest.raises(SparqlSyntaxError, match=msg):
        sparql_query(store, text)


WD = "http://www.wikidata.org/entity/"
WDT = "http://www.wikidata.org/prop/direct/"


def test_reference_shaped_query(spark):
    # the query the reference constructs for subsumed_by event matching
    # (reference utils.py:115-143): property-path type clause + one
    # OPTIONAL per language + OPTIONAL role clauses + DISTINCT + limit,
    # authored as text. (The reference's SERVICE wikibase:label line is
    # endpoint-specific and raises — labels here are plain triples.)
    rows = [
        (WD + "Q858439", WDT + "P279", WD + "Q40231"),  # pres. election
        ("i1", WDT + "P31", WD + "Q858439"),
        ("i1", "label_en", "i1 english"),
        ("i1", WDT + "P276", "loc1"),
        ("i2", WDT + "P31", WD + "Q40231"),
        ("i2", "label_en", "i2 english"),
        ("i2", "label_nl", "i2 dutch"),
        ("i3", WDT + "P31", WD + "Q99"),               # unrelated type
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_query(t, """
        PREFIX wd: <http://www.wikidata.org/entity/>
        PREFIX wdt: <http://www.wikidata.org/prop/direct/>
        SELECT DISTINCT ?direct_type ?incident ?label_en ?label_nl ?P276
        WHERE {
          ?incident wdt:P31*/wdt:P279* wd:Q40231 ;
                    wdt:P31 ?direct_type .
          OPTIONAL { ?incident label_en ?label_en }
          OPTIONAL { ?incident label_nl ?label_nl }
          OPTIONAL { ?incident wdt:P276 ?P276 }
        } limit 10
    """).collect()
    got = sorted(
        (r.incident, r.direct_type, r.label_en, r.label_nl, r.P276)
        for r in out
    )
    assert got == [
        ("i1", WD + "Q858439", "i1 english", None, "loc1"),
        ("i2", WD + "Q40231", "i2 english", "i2 dutch", None),
    ]


@pytest.mark.parametrize("text, msg", [
    ("BASE <http://b/> SELECT ?x WHERE { ?x ?p ?o }", "BASE"),
    ("SELECT ?x WHERE { OPTIONAL { OPTIONAL { ?x ?p ?o } } }",
     "required"),
    ("DELETE WHERE { ?x ?p ?o }", "SELECT, ASK"),
    ("SELECT ?x WHERE { SERVICE <http://svc> { ?x ?p ?o } }", "SERVICE"),
    ("SELECT ?x WHERE { ?x ?p ?o . GRAPH <http://g> { ?x ?q ?r } }",
     "GRAPH"),
    ("SELECT ?x WHERE { ?x ?p ?o . FILTER(LANG(?o) = 'en') }", "LANG"),
    ("SELECT ?x WHERE { ?x ?p ?o . FILTER(xsd:integer(?o) > 3) }",
     "unknown prefix"),
    ("SELECT ?x WHERE { { ?a ?p ?o } UNION { { SELECT ?a WHERE "
     "{ ?a ?q ?r } } } }", "UNION branch"),
    ('SELECT (?x AS ?y) (COUNT(*) AS ?n) WHERE { ?x ?p ?o }',
     "cannot mix with aggregation"),
])
def test_unsupported_forms_raise(store, text, msg):
    with pytest.raises(SparqlSyntaxError, match=msg):
        sparql_query(store, text)


def test_bind_chained_with_builtins(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?shout WHERE {
            ?e ex:label ?l .
            BIND(UCASE(?l) AS ?u)
            FILTER(STRSTARTS(?u, "BIG"))
            BIND(CONCAT(?u, "!") AS ?shout)
        }
    """).collect()
    assert [(r.e, r.shout) for r in out] == [("e1", "BIG BOOM!")]


def test_projection_expression_non_aggregate(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who (STRLEN(?who) AS ?n) WHERE { ?e ex:actor ?who }
    """).collect()
    assert sorted((r.who, r.n) for r in out) == [
        ("alice", 5), ("bob", 3), ("carol", 5),
    ]


def test_filter_iri_and_pname_become_lexical(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who WHERE {
            ?e ?p ?who .
            FILTER(?p = ex:actor && ?who != "bob")
        }
    """).collect()
    assert sorted((r.e, r.who) for r in out) == [
        ("e1", "alice"), ("e1", "carol"),
    ]
    # full <...> IRI form, same solutions
    out2 = sparql_query(store, """
        SELECT ?e ?who WHERE {
            ?e ?p ?who .
            FILTER(?p = <http://ex.org/actor> && ?who != "bob")
        }
    """).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_group_concat_and_sample(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e (GROUP_CONCAT(?who; SEPARATOR=", ") AS ?names)
                  (SAMPLE(?who) AS ?one)
        WHERE { ?e ex:actor ?who } GROUP BY ?e ORDER BY ?e
    """).collect()
    assert [(r.e, r.names, r.one) for r in out] == [
        ("e1", "alice, carol", "alice"), ("e2", "bob", "bob"),
    ]


def test_group_concat_default_separator_space(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT (GROUP_CONCAT(?who) AS ?names)
        WHERE { <e1> ex:actor ?who }
    """).collect()
    assert [r.names for r in out] == ["alice carol"]


def test_subquery_aggregate_joined_to_outer(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?lab ?n WHERE {
            ?e ex:label ?lab .
            { SELECT ?e (COUNT(?who) AS ?n)
              WHERE { ?e ex:actor ?who } GROUP BY ?e }
            FILTER(?n > 1)
        }
    """).collect()
    assert [(r.e, r.lab, r.n) for r in out] == [("e1", "big boom", 2)]


def test_subquery_only_body(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?n WHERE {
            { SELECT ?e (COUNT(?who) AS ?n)
              WHERE { ?e ex:actor ?who } GROUP BY ?e }
        } ORDER BY ?n
    """).collect()
    assert [r.n for r in out] == [1, 2]


def test_bind_rebind_in_scope_raises(store):
    with pytest.raises(ValueError, match="rebind"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            SELECT ?l WHERE { ?e ex:label ?l . BIND("x" AS ?l) }
        """)


def test_filter_exists_correlated(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE {
            ?e ex:actor ?who .
            FILTER EXISTS { ?who ex:knows ?z }
        }
    """).collect()
    assert sorted(r.who for r in out) == ["alice"]


def test_filter_exists_never_multiplies(spark):
    # the semantic difference from joining the pattern in: two knows
    # edges still yield ONE solution for alice
    rows = [
        ("e1", EX + "actor", "alice"),
        ("alice", EX + "knows", "bob"),
        ("alice", EX + "knows", "carol"),
    ]
    st = spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )
    out = sparql_query(st, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE {
            ?e ex:actor ?who .
            FILTER EXISTS { ?who ex:knows ?z }
        }
    """).collect()
    assert [r.who for r in out] == ["alice"]


def test_filter_exists_uncorrelated(store):
    # nonempty uncorrelated group keeps every solution
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE {
            ?e ex:actor ?who .
            FILTER EXISTS { ?s ex:sub ?t }
        }
    """).collect()
    assert sorted(r.who for r in out) == ["alice", "bob", "carol"]
    # empty uncorrelated group drops every solution
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE {
            ?e ex:actor ?who .
            FILTER EXISTS { ?s ex:nosuch ?t }
        }
    """).collect()
    assert out == []


def test_exists_inside_expression_conjunction(store):
    # actor solutions: alice, carol, bob; only alice has a knows edge,
    # and bob is excluded by the other conjunct
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE {
            ?e ex:actor ?who .
            FILTER(?who != "bob" && EXISTS { ?who ex:knows ?z })
        }
    """).collect()
    assert [r.who for r in out] == ["alice"]


def test_exists_inside_expression_disjunction_never_multiplies(store):
    # EXISTS truth must not multiply: e1 has TWO actors but each
    # (e, who) solution appears once; the || arm rescues "quiet"
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?l WHERE {
            ?e ex:label ?l .
            FILTER(EXISTS { ?e ex:actor ?w . ?w ex:knows ?z }
                   || ?l = "quiet")
        }
    """).collect()
    assert sorted((r.e, r.l) for r in out) == [
        ("e1", "big boom"), ("e2", "quiet"),
    ]


def test_not_exists_inside_expression(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE {
            ?e ex:actor ?who .
            FILTER(NOT EXISTS { ?who ex:knows ?z } && ?who != "carol")
        }
    """).collect()
    assert [r.who for r in out] == ["bob"]


def test_exists_literal_containing_exists_brace_is_data(store):
    # the quoted string must not trigger extraction
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?l WHERE { ?e ex:label ?l . FILTER(?l != "EXISTS {x}") }
    """).collect()
    assert sorted(r.l for r in out) == ["big boom", "quiet"]


def test_exists_in_bind_expression_raises(store):
    with pytest.raises(SparqlSyntaxError, match="BIND/HAVING"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            SELECT ?f WHERE {
                ?e ex:actor ?who .
                BIND(EXISTS { ?who ex:knows ?z } AS ?f)
            }
        """)


def test_filter_composes_with_union(store):
    # a FILTER elsewhere in the body applies to the union's solutions
    # (group-level filter scope)
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE {
            FILTER(?who != "bob")
            { ?e ex:actor ?who } UNION { ?a ex:knows ?who }
        }
    """).collect()
    assert sorted(r.who for r in out) == ["alice", "carol"]


def test_subquery_composes_with_union(store):
    # the subquery's solutions (?who = bob) join the union frame on the
    # all-branch-bound ?who
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who WHERE {
            { SELECT ?who WHERE { ?x ex:knows ?who } }
            { ?e ex:actor ?who } UNION { ?a ex:knows ?who }
        }
    """).collect()
    assert sorted(r.who for r in out) == ["bob", "bob"]


def test_inline_union_joins_required_pattern(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?t ?lab WHERE {
            { ?e a ?t } UNION { ?e ex:sub ?t } .
            ?e ex:label ?lab
        }
    """).collect()
    assert sorted((r.e, r.t, r.lab) for r in out) == [
        ("e1", EX + "Event", "big boom"),
        ("e2", EX + "Event", "quiet"),
    ]


def test_union_join_var_not_bound_in_every_branch_raises(store):
    # joining the enclosing ?e against a union where only one branch
    # binds ?e would silently drop SPARQL-compatible solutions
    with pytest.raises(ValueError, match="not bound in every UNION"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            SELECT * WHERE {
                ?e ex:label ?lab .
                { ?e ex:actor ?who } UNION { ?a ex:knows ?who }
            }
        """).collect()


def test_aggregation_over_union(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who (COUNT(*) AS ?n) WHERE {
            { ?e ex:actor ?who } UNION { ?who ex:knows ?b }
        } GROUP BY ?who
    """).collect()
    assert sorted((r.who, r.n) for r in out) == [
        ("alice", 2), ("bob", 1), ("carol", 1),
    ]


def test_bare_group_with_scoped_filter(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?lab WHERE {
            ?e ex:label ?lab .
            { ?e ex:actor ?who . FILTER(?who = "alice") }
        }
    """).collect()
    assert [(r.e, r.lab) for r in out] == [("e1", "big boom")]


def test_construct_over_union(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        CONSTRUCT { ?who ex:involvedIn ?e } WHERE {
            { ?e ex:actor ?who } UNION { ?e ex:label ?who }
        }
    """).collect()
    assert sorted((r.subj, r.obj) for r in out) == [
        ("alice", "e1"), ("big boom", "e1"), ("bob", "e2"),
        ("carol", "e1"), ("quiet", "e2"),
    ]
    assert {r.pred for r in out} == {EX + "involvedIn"}


def test_ask_over_union(store):
    assert sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        ASK { { ?x ex:knows ?y } UNION { ?x ex:sub ?y } }
    """) is True
    assert sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        ASK { { ?x ex:knows "nobody" } UNION { ?x ex:sub "t9" } }
    """) is False


def test_union_inside_optional(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?lab ?x WHERE {
            ?e ex:label ?lab .
            OPTIONAL {
                { ?e ex:actor ?x . FILTER(?x != "bob") }
                UNION { ?e ex:sub ?x }
            }
        }
    """).collect()
    assert sorted(((r.e, r.lab, r.x) for r in out),
                  key=lambda t: (t[0], t[2] or "")) == [
        ("e1", "big boom", "alice"),
        ("e1", "big boom", "carol"),
        ("e2", "quiet", None),
    ]


def test_nested_optional_inside_optional(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who ?k WHERE {
            ?e a ex:Event .
            OPTIONAL { ?e ex:actor ?who OPTIONAL { ?who ex:knows ?k } }
        }
    """).collect()
    assert sorted(((r.e, r.who, r.k) for r in out),
                  key=lambda t: (t[0], t[1])) == [
        ("e1", "alice", "bob"),
        ("e1", "carol", None),
        ("e2", "bob", None),
    ]


def test_union_inside_minus(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e WHERE {
            ?e a ex:Event .
            MINUS { { ?e ex:actor "alice" } UNION { ?e ex:actor "bob" } }
        }
    """).collect()
    assert out == []


def test_optional_union_partial_binding_raises(store):
    with pytest.raises(ValueError, match="not bound in every UNION"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            SELECT * WHERE {
                ?e ex:label ?lab .
                OPTIONAL {
                    { ?e ex:actor ?x } UNION { ?a ex:knows ?x }
                }
            }
        """).collect()


def test_nested_union_flattens(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?t WHERE {
            { { ?e a ?t } UNION { ?e ex:sub ?t } } UNION { ?e ex:actor ?t }
        }
    """).collect()
    assert len(out) == 7  # 2 type + 2 sub + 3 actor solutions


def test_subquery_correlated_on_optional_variable(store):
    # connects only through the OPTIONAL-introduced ?who: joins after
    # the OPTIONAL (inner join — optional-miss NULL rows drop)
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?lab ?who WHERE {
            ?e ex:label ?lab .
            OPTIONAL { ?e ex:actor ?who }
            { SELECT ?who WHERE { ?x ex:knows ?who } }
        }
    """).collect()
    assert [(r.e, r.lab, r.who) for r in out] == [("e2", "quiet", "bob")]


def test_projection_expr_with_aggregate_looking_literal(store):
    # "min(x)" inside a string literal must not route the expression
    # into the aggregate path
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT (CONCAT(?who, " min(x)") AS ?y)
        WHERE { ?e ex:actor ?who }
    """).collect()
    assert sorted(r.y for r in out) == [
        "alice min(x)", "bob min(x)", "carol min(x)",
    ]


def test_union_projection_rebind_raises(store):
    with pytest.raises(ValueError, match="rebind"):
        sparql_query(store, """
            PREFIX ex: <http://ex.org/>
            SELECT ?who (UCASE(?who) AS ?who) WHERE {
                { ?e ex:actor ?who } UNION { ?a ex:knows ?who }
            }
        """)


def test_trailing_dot_after_subquery_block(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?who WHERE {
            { SELECT ?who WHERE { ?x ex:knows ?who } } .
            ?e ex:actor ?who
        }
    """).collect()
    assert [(r.e, r.who) for r in out] == [("e2", "bob")]


@pytest.fixture(scope="module")
def qstore(spark):
    """Quad store: per-source named graphs + a default graph of labels."""
    from multilingual_wiki_event_pipeline_spark.operators import quads as q
    ga = spark.createDataFrame(
        [("e1", EX + "type", "Fire"), ("e1", EX + "loc", "NL"),
         ("t1", EX + "sub", "t2"), ("t2", EX + "sub", "t3")],
        "subj string, pred string, obj string",
    )
    gb = spark.createDataFrame(
        [("e1", EX + "type", "Flood"), ("e2", EX + "loc", "DE")],
        "subj string, pred string, obj string",
    )
    dflt = spark.createDataFrame(
        [("e1", EX + "label", "fire one"), ("e2", EX + "label", "two")],
        "subj string, pred string, obj string",
    )
    return q.union_graphs(
        {"http://g/a": ga, "http://g/b": gb}, default=dflt
    )


def test_text_graph_var_joins_default_pattern(qstore):
    out = sparql_query(qstore, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?g ?t ?l WHERE {
            GRAPH ?g { ?e ex:type ?t }
            ?e ex:label ?l .
        }
    """)
    assert sorted(map(tuple, out.collect())) == [
        ("e1", "http://g/a", "Fire", "fire one"),
        ("e1", "http://g/b", "Flood", "fire one"),
    ]


def test_text_graph_constant_and_from(qstore):
    out = sparql_query(qstore, """
        PREFIX ex: <http://ex.org/>
        SELECT ?t WHERE { GRAPH <http://g/a> { ?e ex:type ?t } }
    """)
    assert [r.t for r in out.collect()] == ["Fire"]
    # FROM re-tags graph a as the default graph; the original default
    # graph leaves the active dataset
    out2 = sparql_query(qstore, """
        PREFIX ex: <http://ex.org/>
        SELECT ?t FROM <http://g/a> WHERE { ?e ex:type ?t }
    """)
    assert [r.t for r in out2.collect()] == ["Fire"]
    assert not sparql_query(
        qstore,
        "PREFIX ex: <http://ex.org/> "
        "ASK FROM <http://g/a> { ?e ex:label ?l }",
    )


def test_text_from_named_restricts_graph_var(qstore):
    out = sparql_query(qstore, """
        PREFIX ex: <http://ex.org/>
        SELECT ?g ?t FROM NAMED <http://g/b>
        WHERE { GRAPH ?g { ?e ex:type ?t } }
    """)
    assert sorted(map(tuple, out.collect())) == [("http://g/b", "Flood")]


def test_text_graph_path_with_constant_graph(qstore):
    out = sparql_query(qstore, """
        PREFIX ex: <http://ex.org/>
        SELECT ?x WHERE { GRAPH <http://g/a> { t1 ex:sub+ ?x } }
    """)
    assert sorted(r.x for r in out.collect()) == ["t2", "t3"]


def test_text_graph_optional_containing_graph(qstore):
    # GRAPH inside OPTIONAL: label is required, per-graph type optional
    out = sparql_query(qstore, """
        PREFIX ex: <http://ex.org/>
        SELECT ?e ?g ?t WHERE {
            ?e ex:label ?l .
            OPTIONAL { GRAPH ?g { ?e ex:type ?t } }
        }
    """)
    got = sorted(map(tuple, out.collect()))
    assert got == [
        ("e1", "http://g/a", "Fire"),
        ("e1", "http://g/b", "Flood"),
        ("e2", None, None),
    ]


def test_text_graph_errors(qstore, store):
    with pytest.raises(SparqlSyntaxError, match="quad store"):
        sparql_query(store, "SELECT ?t WHERE { GRAPH ?g { ?e ?p ?t } }")
    with pytest.raises(SparqlSyntaxError, match="quad store"):
        sparql_query(
            store, "SELECT ?t FROM <http://g/a> WHERE { ?e ?p ?t }"
        )
    with pytest.raises(SparqlSyntaxError, match="nested GRAPH"):
        sparql_query(qstore, """
            SELECT ?t WHERE {
                GRAPH ?g { GRAPH ?h { ?e ?p ?t } }
            }
        """)
    with pytest.raises(SparqlSyntaxError, match="triple patterns and FILTER"):
        sparql_query(qstore, """
            SELECT ?t WHERE {
                GRAPH ?g { OPTIONAL { ?e ?p ?t } }
            }
        """)
    with pytest.raises(SparqlSyntaxError, match="subquery"):
        sparql_query(qstore, """
            PREFIX ex: <http://ex.org/>
            SELECT ?t WHERE {
                { SELECT ?t FROM <http://g/a> WHERE { ?e ex:type ?t } }
                ?e ex:type ?t .
            }
        """)


def test_text_update_rejects_graph(qstore):
    from multilingual_wiki_event_pipeline_spark.operators.sparql import (
        sparql_update,
    )
    with pytest.raises(SparqlSyntaxError, match="single graph"):
        sparql_update(qstore.drop("g"), """
            PREFIX ex: <http://ex.org/>
            DELETE { ?e ex:type ?t } WHERE { GRAPH ?g { ?e ex:type ?t } }
        """)


def test_strbefore_strafter_encode_builtins(store):
    out = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT ?who (STRBEFORE(?l, " ") AS ?first)
               (STRAFTER(?l, " ") AS ?rest)
               (STRBEFORE(?l, "zzz") AS ?miss)
               (STRAFTER(?l, "") AS ?whole)
               (ENCODE_FOR_URI(?l) AS ?enc)
        WHERE { ?e ex:actor ?who . ?e ex:label ?l .
                FILTER(?who = "bob") }
    """).collect()
    (r,) = out
    assert (r.first, r.rest, r.miss, r.whole) == ("", "", "", "quiet")
    assert r.enc == "quiet"
    out2 = sparql_query(store, """
        PREFIX ex: <http://ex.org/>
        SELECT (STRBEFORE(?l, " ") AS ?first)
               (STRAFTER(?l, " ") AS ?rest)
               (ENCODE_FOR_URI(?l) AS ?enc)
        WHERE { ?e ex:label ?l . FILTER(STRSTARTS(?l, "big")) }
    """).collect()
    (r2,) = out2
    assert (r2.first, r2.rest) == ("big", "boom")
    assert r2.enc == "big%20boom"
