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
def rendered(spark, corpus_dir):
    t = CorpusTables(spark, corpus_dir)
    o = pipeline.build(t, cache_intermediates=True)
    docs = {
        r.conv_id: ET.fromstring(r.naf_xml)
        for r in naf.render_naf(
            o.pilot_texts, o.tokens, o.mentions, o.corefs
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
