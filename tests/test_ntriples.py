"""N-Triples source/sink (sources/ntriples.py): expression-only parse,
escape round-trips, and the strict/permissive error contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multilingual_wiki_event_pipeline_spark.sources import ntriples as nt


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "line string")


def test_parse_term_types_and_skips(spark):
    df = _lines(spark, [
        "<http://e/s1> <http://e/p> <http://e/o> .",
        '<http://e/s2> <http://e/p> "plain" .',
        '<http://e/s3> <http://e/p> "hallo"@en-GB .',
        '<http://e/s4> <http://e/p> "5"^^<http://www.w3.org/2001/XMLSchema#int> .',
        "_:b1 <http://e/p> _:b2 .",
        "# a comment line",
        "   ",
    ])
    got = {r.subj: r for r in nt.parse_ntriples_lines(df).collect()}
    assert len(got) == 5
    assert got["http://e/s1"].obj == "http://e/o"
    assert not got["http://e/s1"].obj_is_literal
    assert got["http://e/s2"].obj_is_literal
    assert got["http://e/s2"].lang is None and got["http://e/s2"].datatype is None
    assert got["http://e/s3"].lang == "en-GB"
    assert got["http://e/s4"].datatype == "http://www.w3.org/2001/XMLSchema#int"
    assert got["_:b1"].obj == "_:b2" and not got["_:b1"].obj_is_literal


def test_parse_decodes_all_escapes(spark):
    df = _lines(spark, [
        '<http://e/s> <http://e/p> '
        '"tab\\there nl\\nhere cr\\r q\\" bs\\\\ u\\u00e9 U\\U0001F600" .',
    ])
    (row,) = nt.parse_ntriples_lines(df).collect()
    assert row.obj == 'tab\there nl\nhere cr\r q" bs\\ ué U\U0001F600'


def test_parse_literal_containing_dot_space(spark):
    # the lazy object match must backtrack past " . " inside the literal
    df = _lines(spark, ['<http://e/s> <http://e/p> "a . b" .'])
    (row,) = nt.parse_ntriples_lines(df).collect()
    assert row.obj == "a . b"


def test_strict_raises_on_malformed_even_under_count(spark):
    df = _lines(spark, [
        "<http://e/s> <http://e/p> <http://e/o> .",
        "not a triple",
    ])
    with pytest.raises(Exception, match="bad N-Triples line"):
        # count() prunes every column — the guard must still fire
        nt.parse_ntriples_lines(df, strict=True).count()


@pytest.mark.parametrize("bad", [
    "not a triple",
    '<http://e/s> <http://e/p> "unclosed .',
    '<http://e/s> <http://e/p> "bad \\q escape" .',
    "<http://e/s> <http://e/p> noquotes .",
])
def test_permissive_drops_each_malformed_shape(spark, bad):
    df = _lines(spark, ["<http://e/s> <http://e/p> <http://e/o> .", bad])
    assert nt.parse_ntriples_lines(df, strict=False).count() == 1


def test_write_read_roundtrip_bytes_exact(spark, tmp_path):
    t = spark.createDataFrame(
        [
            ("http://e/s1", "http://e/p",
             'weird\nobj "x" \\ é \U0001F600 \r tab\there',
             True, "en", None),
            ("_:b1", "http://e/p", "http://e/o", False, None, None),
            ("http://e/s2", "http://e/p", "2024", True, None,
             "http://www.w3.org/2001/XMLSchema#gYear"),
            ("http://e/s3", "http://e/p", "ends with backslash\\",
             True, None, None),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "lang string, datatype string",
    )
    path = str(tmp_path / "nt")
    nt.write_ntriples(t, path, n_files=2)
    back = nt.read_ntriples(spark, path)
    assert sorted(map(tuple, t.collect())) == sorted(map(tuple, back.collect()))


def test_write_without_lang_column(spark, tmp_path):
    t = spark.createDataFrame(
        [("http://e/s", "http://e/p", "v", True, "xsd:string")],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "datatype string",
    )
    path = str(tmp_path / "nt")
    nt.write_ntriples(t, path)
    (row,) = nt.read_ntriples(spark, path).collect()
    assert row.obj == "v" and row.lang is None and row.datatype == "xsd:string"


def test_nquads_roundtrip_and_default_graph(spark, tmp_path):
    from multilingual_wiki_event_pipeline_spark.operators.bgp import (
        DEFAULT_GRAPH,
    )
    q = spark.createDataFrame(
        [
            ("http://g/a", "http://e/s1", "http://e/p",
             'lit " <x> . y', True, "en", None),
            (DEFAULT_GRAPH, "http://e/s2", "http://e/p", "http://e/o",
             False, None, None),
            ("_:bg", "_:b1", "http://e/p", "2024", True, None,
             "http://www.w3.org/2001/XMLSchema#gYear"),
        ],
        "g string, subj string, pred string, obj string, "
        "obj_is_literal boolean, lang string, datatype string",
    )
    path = str(tmp_path / "nq")
    nt.write_nquads(q, path)
    back = nt.read_nquads(spark, path)
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, back.collect()))
    # the default-graph row rendered WITHOUT a graph label
    raw = spark.read.text(path).collect()
    (plain,) = [r.value for r in raw if "s2" in r.value]
    assert plain == "<http://e/s2> <http://e/p> <http://e/o> ."


def test_nquads_parse_graph_shapes(spark):
    from multilingual_wiki_event_pipeline_spark.operators.bgp import (
        DEFAULT_GRAPH,
    )
    df = _lines(spark, [
        "<http://e/s> <http://e/p> <http://e/o> <http://g/a> .",
        "<http://e/s> <http://e/p> <http://e/o> _:bg .",
        "<http://e/s> <http://e/p> <http://e/o> .",
        '<http://e/s> <http://e/p> "a <b> c" .',
    ])
    got = nt.parse_nquads_lines(df).collect()
    assert sorted(r.g for r in got) == \
        ["_:bg", "http://g/a", DEFAULT_GRAPH, DEFAULT_GRAPH]
    (litrow,) = [r for r in got if r.obj_is_literal]
    assert litrow.obj == "a <b> c" and litrow.g == DEFAULT_GRAPH


def test_nquads_strict_and_permissive(spark):
    df = _lines(spark, [
        "<http://e/s> <http://e/p> <http://e/o> <http://g/a> .",
        "<http://e/s> <http://e/p> .",
    ])
    assert nt.parse_nquads_lines(df, strict=False).count() == 1
    with pytest.raises(Exception, match="bad N-Triples line"):
        nt.parse_nquads_lines(df, strict=True).count()
