"""NAF XML serialization checks (K2): the rendered document must round-trip
the layer tables — raw text, wf offsets, entity spans + external refs,
coref clusters — when parsed with a real XML parser."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from multilingual_wiki_event_pipeline_spark.operators import naf
from multilingual_wiki_event_pipeline_spark.plans import pipeline
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables


@pytest.fixture(scope="module")
def tables(spark, corpus_dir):
    return CorpusTables(spark, corpus_dir)


@pytest.fixture(scope="module")
def rendered(spark, tables):
    o = pipeline.build(tables, cache_intermediates=True)
    docs = {
        r.conv_id: ET.fromstring(r.naf_xml)
        for r in naf.render_naf(
            o.pilot_texts, o.tokens, o.mentions, o.corefs,
            srl_predicates=tables.srl_predicates, srl_roles=tables.srl_roles,
        ).collect()
    }
    return o, docs


def test_every_pilot_doc_rendered_and_parses(rendered):
    o, docs = rendered
    assert len(docs) == o.pilot_texts.count() > 0


def test_raw_round_trip(rendered):
    o, docs = rendered
    contents = {r.conv_id: r.content for r in o.pilot_texts.collect()}
    for conv_id, root in docs.items():
        assert root.find("raw").text == contents[conv_id]


def test_wf_offsets_slice_raw(rendered):
    _, docs = rendered
    checked = 0
    for root in docs.values():
        raw = root.find("raw").text
        for wf in root.find("text"):
            off, ln = int(wf.get("offset")), int(wf.get("length"))
            assert raw[off:off + ln] == wf.text
            checked += 1
    assert checked > 100


def test_entity_layer_matches_mentions(rendered):
    o, docs = rendered
    want = {}
    for r in o.mentions.collect():
        want.setdefault(r.conv_id, {})[r.eid] = (
            list(range(r.begin_tid, r.end_tid + 1)), list(r.ext_refs)
        )
    for conv_id, root in docs.items():
        got = {}
        for ent in root.find("entities"):
            eid = int(ent.get("id")[1:])
            tids = [
                int(tg.get("id")[1:]) for tg in ent.find("span")
            ]
            refs = [
                er.get("reference")
                for er in ent.find("externalReferences")
            ]
            got[eid] = (tids, refs)
        assert got == want.get(conv_id, {})


def test_terms_layer_one_per_wf(rendered):
    """Terms layer (xml_utils.py:29-42 shape): exactly one term per wf,
    w{n} <-> t{n}, lowercase lemma, coarse pos."""
    _, docs = rendered
    checked = 0
    for root in docs.values():
        wfs = {wf.get("id")[1:]: wf.text for wf in root.find("text")}
        terms = root.find("terms")
        assert len(terms) == len(wfs)
        for term in terms:
            tid = term.get("id")[1:]
            (tgt,) = term.find("span")
            assert tgt.get("id") == f"w{tid}"
            assert term.get("lemma") == wfs[tid].lower()
            assert term.get("pos") in {"WORD", "NUM", "PUNCT"}
            checked += 1
    assert checked > 100


def test_srl_layer_matches_tables(rendered, tables):
    """SRL layer (xml_utils.py:140-162 read shape): predicate@uri spans +
    role@semRole spans round-trip the srl tables for rendered docs."""
    o, docs = rendered
    pred_rows = {
        (r.conv_id, r.pred_id): (r.frame, (r.begin_tid, r.end_tid))
        for r in tables.srl_predicates.collect()
    }
    role_rows = {}
    for r in tables.srl_roles.collect():
        role_rows.setdefault((r.conv_id, r.pred_id), set()).add(
            (r.role, r.begin_tid, r.end_tid)
        )
    n_preds = 0
    for conv_id, root in docs.items():
        for pred in root.find("srl"):
            pid = pred.get("id")
            frame, (b, e) = pred_rows[(conv_id, pid)]
            assert pred.get("uri") == frame
            span_tids = [int(t.get("id")[1:]) for t in pred.find("span")]
            assert span_tids == list(range(b, e + 1))
            got_roles = {
                (
                    ro.get("semRole"),
                    int(ro.find("span")[0].get("id")[1:]),
                    int(ro.find("span")[-1].get("id")[1:]),
                )
                for ro in pred.findall("role")
            }
            assert got_roles == role_rows.get((conv_id, pid), set())
            n_preds += 1
    assert n_preds > 20


def test_coref_layer_matches_clusters(rendered):
    o, docs = rendered
    want = {}
    for r in o.corefs.collect():
        want.setdefault(r.conv_id, {})[r.wd_uri] = (
            r.coref_type,
            {tuple(s) for s in r.spans},
        )
    for conv_id, root in docs.items():
        got = {}
        for co in root.find("coreferences"):
            spans = {
                tuple(int(tg.get("id")[1:]) for tg in span)
                for span in co.findall("span")
            }
            got[co.get("uri")] = (co.get("type"), spans)
        assert got == want.get(conv_id, {})
