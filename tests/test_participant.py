"""Participant-mode (S2) parity: pipeline.build(seed_mode='by_participant')
must reproduce serialize_as_participant_event semantics exactly
(reference query_test.py:288-587 seeds, classes.py:167-262 emission)."""

from __future__ import annotations

import pytest

from multilingual_wiki_event_pipeline_spark import oracle
from multilingual_wiki_event_pipeline_spark.operators.triples import WDT_WIKI
from multilingual_wiki_event_pipeline_spark.plans import pipeline
from multilingual_wiki_event_pipeline_spark.sources.tables import CorpusTables


@pytest.fixture(scope="module")
def outputs(spark, corpus_dir):
    t = CorpusTables(spark, corpus_dir)
    return pipeline.build(t, cache_intermediates=True, seed_mode="by_participant")


@pytest.fixture(scope="module")
def expected(corpus):
    return oracle.run_participant(corpus)


def _triples(df):
    return {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.lang, r.datatype)
        for r in df.collect()
    }


def test_participant_full_triples_exact(outputs, expected):
    got = _triples(outputs.full_triples)
    want = expected.full_triples
    assert got == want, (list(got - want)[:5], list(want - got)[:5])
    # non-vacuous: actor edges + minted subjects + /wiki/ direct types exist
    actors = {tr for tr in want if tr[1].endswith("hasActor")}
    assert actors
    assert all("_Q" in tr[0] for tr in actors)  # wd:{participant}_{event}
    assert any(tr[1].endswith("#type") and tr[2].startswith(WDT_WIKI) for tr in want)


def test_participant_pilot_triples_exact(outputs, expected):
    got = _triples(outputs.pilot_triples)
    want = expected.pilot_triples
    assert got == want, (list(got - want)[:5], list(want - got)[:5])
    assert want  # pilot set non-empty


def test_participant_pilot_incident_set(outputs, expected):
    got = {
        r.incident_id
        for r in outputs.pilot_incidents.select("incident_id").collect()
    }
    assert got == set(expected.pilot_incident_ids)


def test_modes_are_disjoint(spark, corpus_dir, corpus):
    """by_incident output is unchanged by the participant seeds: no minted
    subject appears in incident-mode triples, and vice versa."""
    t = CorpusTables(spark, corpus_dir)
    inc_triples = _triples(
        pipeline.build(t, cache_intermediates=True).full_triples
    )
    part_ids = {
        r["incident_id"] for r in corpus.tables["incidents"]
        if r["participant_id"] is not None
    }
    assert part_ids
    assert not any(
        any(pid in subj for pid in part_ids) for (subj, *_r) in inc_triples
    )
