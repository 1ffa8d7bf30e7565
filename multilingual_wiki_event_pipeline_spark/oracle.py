"""Pure-Python oracle: reference-semantics reimplementation of the MWEP
pipeline over the synthetic corpus, used as the parity target for the
Spark engine (triple P/R >= 0.95, aim exact).

Single-threaded, dict/list based — deliberately the same *shape* as the
reference (/root/reference) so every behavioral subtlety is local and
reviewable, but consuming our relational corpus tables instead of live
Wikidata/Wikipedia services. File:line citations point at the reference
behavior each block reproduces.

Documented deviations from the reference (both sides — oracle AND engine —
implement the deviation, so parity is still exact):

* D1 — deterministic pilot truncation: the reference truncates a Python
  ``set`` (main.py:377-379, nondeterministic); we sort pilot incidents by
  wdt_id first.
* D2 — ``get_uris`` (utils.py:642-688) crashes on unlabeled extra_info
  values (``split(' | ')`` unpack) and on non-sem roles (KeyError in
  ``short_rel_to_full``); we take the first ``' | '`` component and ignore
  roles outside {sem:hasPlace, sem:hasActor} (sem:hasTimeStamp is already
  ignored by the reference).
* D3 — tokenization is the engine's deterministic whitespace tokenizer
  (functions/text.py), not spaCy.
* D4 — ``ReferenceText.uri`` is always present (conv_meta.uri); the
  reference serializes an empty URI for texts never backfilled.
"""

from __future__ import annotations

import urllib.parse
from collections import defaultdict
from dataclasses import dataclass, field

from .datagen import LANGS, ROLE_MAPPINGS, WD, Corpus, wiki_prefix
from .functions.text import (
    assemble_document,
    check_ref_text,
    first_section,
    offset_alignment_maps,
    tokenize,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
SEM = "http://semanticweb.cs.vu.nl/2009/11/sem/"
GRASP = "http://groundedannotationframework.org/grasp#"
DCT = "http://purl.org/dc/elements/1.1/"
FN = "http://premon.fbk.eu/resource/fn17-"
PREMON = "https://premon.fbk.eu/resource/"
XSD = "http://www.w3.org/2001/XMLSchema#"
DCMI_TEXT = "http://purl.org/dc/dcmitype/Text"

# (subj, pred, obj, obj_is_literal, lang, datatype)
Triple = tuple[str, str, str, bool, str | None, str | None]


@dataclass
class RefText:
    conv_id: str
    name: str
    language: str
    uri: str
    content: str | None = None
    annotations: list[dict] = field(default_factory=list)
    primary_ref_texts: list[str] = field(default_factory=list)
    # provenance (reference classes.py:395-407, main.py:60-76): which
    # seed method(s) found this text — 'SPARQL', 'API', or both
    found_by: list[str] = field(default_factory=lambda: ["SPARQL"])


@dataclass
class Incident:
    wdt_id: str
    incident_type: str
    incident_type_uri: str
    direct_types: set[str] = field(default_factory=set)
    extra_info: dict[str, set[str]] = field(default_factory=dict)
    reference_texts: list[RefText] = field(default_factory=list)
    participant_id: str | None = None
    participant_event_label: str | None = None


@dataclass
class OracleOutputs:
    full_triples: set[Triple]
    pilot_triples: set[Triple]
    pilot_incident_ids: list[str]
    # mentions: (conv_id, eid, begin_tid, end_tid, surface, frozenset(ext_refs))
    mentions: list[tuple]
    # corefs: (conv_id, wd_uri, coref_type, frozenset of span tuples)
    corefs: list[tuple]
    # srl_links: multiset of (conv_id, entity_ref, frame, role)
    srl_links: list[tuple]
    # turn passthrough invariant rows: (conv_id, turn_idx, text)
    turns: list[tuple]
    # gazetteer_links: (conv_id, begin_tid, end_tid, surface, qid, uri,
    # score, rank) — north-star steps 3-4 (detection + ranked linking)
    gazetteer_links: list[tuple] = field(default_factory=list)
    # type_index: A5 (classes.py:355-359) — direct type -> sorted wdt ids
    type_index: dict[str, tuple] = field(default_factory=dict)
    # incident_ancestors: update_incident (utils.py:555-569) —
    # set of (incident_id, ancestor) over root->direct-type path nodes
    incident_ancestors: set[tuple] = field(default_factory=set)
    # collection_stats: A3 battery (classes.py:27-125) — field name -> value
    collection_stats: dict = field(default_factory=dict)


def _load(corpus: Corpus | str) -> dict[str, list[dict]]:
    if isinstance(corpus, Corpus):
        return corpus.tables
    import pyarrow.parquet as pq

    tables = {}
    names = (
        "transcripts conv_meta conv_sources incidents incident_direct_types "
        "incident_roles role_mappings type2mapping entity_labels gazetteer "
        "langlinks wd_sitelinks annotations srl_predicates srl_roles "
        "ontology_edges"
    ).split()
    for n in names:
        tables[n] = pq.read_table(f"{corpus}/{n}.parquet").to_pylist()
    return tables


def run(
    corpus: Corpus | str,
    target_languages: list[str] = LANGS,
    must_have_all_languages: bool = True,
    must_have_english: bool = True,
    one_page_per_language: bool = True,
    max_pilot_incidents: int = 10**9,
) -> OracleOutputs:
    t = _load(corpus)

    type2mapping = {r["type_qid"]: r["mapping_name"] for r in t["type2mapping"]}
    entity_labels = {r["qid"]: r["label"] for r in t["entity_labels"]}
    langlinks: dict[str, dict[str, dict[str, str]]] = defaultdict(lambda: defaultdict(dict))
    for r in t["langlinks"]:
        langlinks[r["lang"]][r["uri"]][r["other_lang"]] = r["other_uri"]
    sitelinks_wiki_to_wd = {r["wiki_uri"]: r["wd_uri"] for r in t["wd_sitelinks"]}
    conv_sources = defaultdict(list)
    for r in t["conv_sources"]:
        conv_sources[r["conv_id"]].append(r["source"])
    anns_by_conv = defaultdict(list)
    for r in t["annotations"]:
        anns_by_conv[r["conv_id"]].append(r)

    # --- document assembly: stable (conv_id, turn_idx) order ---------------
    turns_by_conv: dict[str, list[tuple[int, str]]] = defaultdict(list)
    turn_rows = []
    for r in t["transcripts"]:
        turns_by_conv[r["conv_id"]].append((r["turn_idx"], r["text"]))
        turn_rows.append((r["conv_id"], r["turn_idx"], r["text"]))
    content_by_conv = {
        cid: assemble_document([txt for _, txt in sorted(pairs)])
        for cid, pairs in turns_by_conv.items()
    }

    # --- build incident objects (retrieve_incidents_per_type, main.py:139-197)
    # one seed mode per run, like the reference: by_incident skips
    # participant-minted seeds (those belong to run_participant)
    incidents: dict[str, Incident] = {}
    for r in t["incidents"]:
        if r["participant_id"] is not None:
            continue
        incidents[r["incident_id"]] = Incident(
            wdt_id=r["incident_id"],
            incident_type=r["incident_type"],
            incident_type_uri=r["incident_type_uri"],
        )
    for r in t["incident_direct_types"]:
        if r["incident_id"] in incidents:
            incidents[r["incident_id"]].direct_types.add(r["direct_type"])
    for r in t["incident_roles"]:
        if r["incident_id"] in incidents:
            incidents[r["incident_id"]].extra_info.setdefault(r["role"], set()).add(r["value"])
    for r in t["conv_meta"]:
        if r["incident_id"] in incidents:
            incidents[r["incident_id"]].reference_texts.append(
                RefText(conv_id=r["conv_id"], name=r["name"], language=r["lang"], uri=r["uri"],
                        found_by=list(r.get("found_by") or ["SPARQL"]))
            )

    # --- obtain_reference_texts: F8 + A2 dedup (main.py:200-229) -----------
    surviving: list[Incident] = []
    for inc in incidents.values():
        new_texts = []
        for rt in inc.reference_texts:
            content = content_by_conv.get(rt.conv_id)
            if content:  # success; missing/empty page -> dropped (F8)
                rt.content = content
                rt.annotations = anns_by_conv.get(rt.conv_id, [])
                new_texts.append(rt)
        new_texts = _deduplicate_ref_texts(new_texts)
        if new_texts:
            inc.reference_texts = new_texts
            surviving.append(inc)

    # --- full-collection serialize (main.py:366-367 -> classes.py:265-353) --
    # primary_ref_texts are NOT yet filled at this point in the reference
    # (get_primary_rt_links runs later, pilot-only) -> no dct:source triples.
    full_triples: set[Triple] = set()
    by_type: dict[str, list[Incident]] = defaultdict(list)
    for inc in surviving:
        by_type[inc.incident_type].append(inc)
    for type_qid, incs in by_type.items():
        full_triples |= _serialize(incs, type_qid, WD + type_qid, type2mapping)

    # --- create_pilot_data (pilot_utils.py:127-178) -------------------------
    pilots: list[Incident] = []
    for inc in sorted(surviving, key=lambda x: x.wdt_id):  # D1 determinism
        mapping_name = type2mapping.get(inc.incident_type, "any")
        all_fes = set(ROLE_MAPPINGS[mapping_name].keys())
        if set(inc.extra_info.keys()) != all_fes:  # F4
            continue
        inc.reference_texts = _deduplicate_ref_texts(inc.reference_texts)
        langs: set[str] = set()
        new_texts = []
        for rt in inc.reference_texts:
            rt.content = first_section(rt.content)  # F1
            if check_ref_text(rt.content, rt.name, min_chars=100, max_chars=50000):  # F2
                langs.add(rt.language)
                new_texts.append(rt)
        inc.reference_texts = new_texts
        if _skip_this_incident(
            new_texts, target_languages, langs,
            must_have_all_languages, must_have_english, one_page_per_language,
        ):  # F3
            continue
        # label backfill (pilot_utils.py:160-176)
        for role, vals in inc.extra_info.items():
            new_vals = set()
            for v in vals:
                if "|" not in v:
                    label = ""
                    q_id = v.split("/")[-1]
                    if v.startswith("http"):
                        label = entity_labels.get(q_id, "")
                    v = v + " | " + label
                new_vals.add(v)
            inc.extra_info[role] = new_vals
        pilots.append(inc)
    pilots = pilots[:max_pilot_incidents]  # deterministic O2 limit (D1)

    # primary sources for pilots (main.py:383 -> get_primary_rt_links)
    for inc in pilots:
        for rt in inc.reference_texts:
            rt.primary_ref_texts = conv_sources.get(rt.conv_id, [])

    pilot_triples: set[Triple] = set()
    pilots_by_type: dict[str, list[Incident]] = defaultdict(list)
    for inc in pilots:
        pilots_by_type[inc.incident_type].append(inc)
    for type_qid, incs in pilots_by_type.items():
        pilot_triples |= _serialize(incs, type_qid, WD + type_qid, type2mapping)

    # --- NAF-side layers: mentions, wd-rewrite, coref, SRL ------------------
    uri_to_rels, inc_id_to_wd_uris = _get_uris(surviving)
    wiki_to_wd = {
        wiki: wd for wiki, wd in sitelinks_wiki_to_wd.items()
        if wd.replace(WD, "") in uri_to_rels
    }  # native_api_utils.py:228-262 builds the map from uri_to_rels' keys

    mentions_out: list[tuple] = []
    corefs_out: list[tuple] = []
    srl_preds = defaultdict(list)
    for r in t["srl_predicates"]:
        srl_preds[r["conv_id"]].append(r)
    srl_roles = defaultdict(list)
    for r in t["srl_roles"]:
        srl_roles[r["pred_id"]].append(r)
    srl_links_out: list[tuple] = []

    for inc in pilots:
        inc_wd_uri = WD + inc.wdt_id
        wd_uris_of_inc = inc_id_to_wd_uris.get(inc_wd_uri, set())
        for rt in inc.reference_texts:
            ments = _add_hyperlinks(rt, langlinks)
            # J5 wiki->wd rewrite (xml_utils.py:350-408)
            enriched = []
            for m in ments:
                refs = list(m["ext_refs"])
                all_refs = set(refs)
                for ref in list(refs):
                    wd_ref = wiki_to_wd.get(ref)
                    if wd_ref is not None and wd_ref not in all_refs:
                        refs.append(wd_ref)
                        all_refs.add(wd_ref)
                m["ext_refs"] = refs
                enriched.append(m)
                mentions_out.append(
                    (rt.conv_id, m["eid"], m["begin_tid"], m["end_tid"],
                     m["surface"], frozenset(refs))
                )
            # coref layer (xml_utils.py:411-548)
            wd_uri_to_spans: dict[str, list[tuple]] = {}
            for m in enriched:
                span = tuple(range(m["begin_tid"], m["end_tid"] + 1))
                for ref in m["ext_refs"]:
                    if ref.startswith(WD) and ref in wd_uris_of_inc:
                        spans = wd_uri_to_spans.setdefault(ref, [])
                        if span not in spans:
                            spans.append(span)
            for wd_uri, spans in wd_uri_to_spans.items():
                q_id = wd_uri.replace(WD, "")
                rels = uri_to_rels.get(q_id, set())
                if not rels or len(rels) >= 2:
                    continue
                rel = next(iter(rels))
                coref_type = "event" if rel == SEM + "Event" else "entity"
                corefs_out.append(
                    (rt.conv_id, wd_uri, coref_type, frozenset(spans))
                )
            # SRL containment join (xml_utils.py:118-187)
            ent_ranges = [
                ((m["begin_tid"], m["end_tid"]), m["ext_refs"][0]) for m in enriched
            ]
            for pred in srl_preds.get(rt.conv_id, []):
                spans = [(pred["frame"], "predicate", (pred["begin_tid"], pred["end_tid"]))]
                for role in srl_roles.get(pred["pred_id"], []):
                    spans.append((pred["frame"], role["role"], (role["begin_tid"], role["end_tid"])))
                for frame, role, (rb, re_) in spans:
                    for (eb, ee), entity in ent_ranges:
                        if eb >= rb and ee <= re_:  # range_overlap truth table
                            srl_links_out.append((rt.conv_id, entity, frame, role))

    # --- ontology: A5 index + update_incident ancestors ---------------------
    parent = {r["child"]: r["parent"] for r in t["ontology_edges"]}  # tree

    def _path_to_root(node: str) -> list[str] | None:
        """nx.all_simple_paths(g, root, node) node set for the tree-shaped
        ontology: the unique node..root chain, or None when unreachable."""
        seen, cur = [node], node
        while cur in parent:
            cur = parent[cur]
            seen.append(cur)
        return seen if seen[-1] == "wd:Q1656682" else None

    incident_ancestors_out: set[tuple] = set()
    for inc in surviving:
        for dt in inc.direct_types:
            p = _path_to_root(dt)
            if p:
                incident_ancestors_out.update((inc.wdt_id, a) for a in p)
    type_index_out: dict[str, tuple] = {}
    idx: dict[str, set] = defaultdict(set)
    for inc in pilots:
        for dt in inc.direct_types:
            idx[dt].add(inc.wdt_id)
    type_index_out = {k: tuple(sorted(v)) for k, v in idx.items()}

    # --- gazetteer mention detection + ranked linking (north-star 3-4) ------
    gaz_cands: dict[tuple[str, str], list[dict]] = defaultdict(list)
    for r in t["gazetteer"]:
        gaz_cands[(r["lang"], r["surface"])].append(r)
    gaz_links_out: list[tuple] = []
    for inc in pilots:
        wd_uris_of_inc = inc_id_to_wd_uris.get(WD + inc.wdt_id, set())
        for rt in inc.reference_texts:
            gaz_links_out.extend(
                _gazetteer_links(rt, gaz_cands, wd_uris_of_inc)
            )

    return OracleOutputs(
        full_triples=full_triples,
        pilot_triples=pilot_triples,
        pilot_incident_ids=[i.wdt_id for i in pilots],
        mentions=mentions_out,
        corefs=corefs_out,
        srl_links=srl_links_out,
        turns=turn_rows,
        gazetteer_links=gaz_links_out,
        type_index=type_index_out,
        incident_ancestors=incident_ancestors_out,
        collection_stats=_collection_stats(pilots),
    )


def _dist_csv_py(counter: dict, top: int | None = None) -> str:
    items = sorted(counter.items(), key=lambda kv: (-kv[1], str(kv[0])))
    if top is not None:
        items = items[:top]
    return "|".join(f"{k}={v}" for k, v in items)


def _collection_stats(pilots: list[Incident]) -> dict:
    """compute_stats (classes.py:27-125) over the pilot collection.
    Distribution ties break (count desc, key asc) — deterministic stand-in
    for Counter.most_common insertion order (documented deviation,
    matched by operators/analyze.py)."""
    from collections import Counter

    texts = [(rt, inc) for inc in pilots for rt in inc.reference_texts]
    n_prim = [len(rt.primary_ref_texts) for rt, _ in texts]
    n = len(n_prim)
    mu = sum(n_prim) / n
    m2 = sum((x - mu) ** 2 for x in n_prim) / n
    m3 = sum((x - mu) ** 3 for x in n_prim) / n
    m4 = sum((x - mu) ** 4 for x in n_prim) / n
    stats = {
        "num_incidents": len(pilots),
        "num_texts": n,
        "num_with_wikipedia": sum(1 for rt, _ in texts if rt.content),
        "num_with_prim_rt": sum(1 for x in n_prim if x > 0),
        "num_with_annotations": sum(1 for rt, _ in texts if rt.annotations),
        # Guards mirror Spark's null semantics: var needs n >= 2, skew/kurt
        # need nonzero variance (all-equal counts) — without them this
        # oracle raised ZeroDivisionError on degenerate corpora (ADVICE r2).
        "prim_mean": round(mu, 6),
        "prim_var": (round(sum((x - mu) ** 2 for x in n_prim) / (n - 1), 6)
                     if n > 1 else None),
        "prim_skew": round(m3 / m2 ** 1.5, 6) if m2 > 0 else None,
        "prim_kurt": round(m4 / m2 ** 2 - 3, 6) if m2 > 0 else None,
        "prim_min": min(n_prim),
        "prim_max": max(n_prim),
        "cntr_prim_rt": _dist_csv_py(Counter(n_prim)),
        # Counter(found_bys), classes.py:82,125 — '|'-joined provenance list
        "found_by_dist": _dist_csv_py(Counter(
            "|".join(rt.found_by) for rt, _ in texts
        )),
        "langset_dist": _dist_csv_py(Counter(
            ",".join(sorted({rt.language for rt in inc.reference_texts}))
            for inc in pilots
        )),
        "numwiki_dist": _dist_csv_py(Counter(
            len(inc.reference_texts) for inc in pilots
        )),
        "countries_top10": _dist_csv_py(Counter(
            v for inc in pilots
            for v in inc.extra_info.get("sem:hasPlace", set())
        ), top=10),
        "direct_types_top10": _dist_csv_py(Counter(
            dt for inc in pilots for dt in inc.direct_types
        ), top=10),
        "count_occurences": _dist_csv_py(Counter(
            role for inc in pilots for role in inc.extra_info
        )),
        "count_values": _dist_csv_py({
            role: sum(
                len(inc.extra_info[role]) for inc in pilots
                if role in inc.extra_info
            )
            for role in {r for inc in pilots for r in inc.extra_info}
        }),
        "all_info": len(pilots),
    }
    return stats


def _gazetteer_links(rt: RefText, gaz_cands, wd_uris_of_inc,
                     max_len: int = 4, top_k: int = 3,
                     context_boost: float = 2.0) -> list[tuple]:
    """Dictionary mention detection + candidate ranking over one text
    (engine twin: operators/gazetteer.py — n-gram contiguity on char
    offsets, longest-match-wins, prior x context score, rank by
    (score desc, qid))."""
    toks = tokenize(rt.content)
    matches = []  # (begin_tid, end_tid, surface), tids 1-based
    for i in range(len(toks)):
        off0, surf0 = toks[i]
        parts = [surf0]
        prev_end = off0 + len(surf0)
        for n in range(1, max_len + 1):
            if n > 1:
                j = i + n - 1
                if j >= len(toks):
                    break
                off_j, surf_j = toks[j]
                if off_j != prev_end + 1:  # not contiguous (turn boundary)
                    break
                parts.append(surf_j)
                prev_end = off_j + len(surf_j)
            gram = " ".join(parts)
            if (rt.language, gram) in gaz_cands:
                matches.append((i + 1, i + n, gram))
    kept = [
        (b, e, s)
        for (b, e, s) in matches
        if not any(
            cb <= b and e <= ce and (ce - cb) > (e - b)
            for (cb, ce, _cs) in matches
        )
    ]
    out = []
    for b, e, surface in kept:
        cands = []
        for r in gaz_cands[(rt.language, surface)]:
            in_ctx = (WD + r["qid"]) in wd_uris_of_inc
            score = r["prior"] * context_boost if in_ctx else r["prior"]
            cands.append((r["qid"], r["uri"], score))
        cands.sort(key=lambda c: (-c[2], c[0]))
        for rank, (qid, uri, score) in enumerate(cands[:top_k], start=1):
            out.append((rt.conv_id, b, e, surface, qid, uri, score, rank))
    return out


def run_participant(
    corpus: Corpus | str,
    target_languages: list[str] = LANGS,
    must_have_all_languages: bool = True,
    must_have_english: bool = True,
    one_page_per_language: bool = True,
    max_pilot_incidents: int = 10**9,
) -> OracleOutputs:
    """Participant-mode lifecycle (S2 — query_test.py:288-587 seeds +
    classes.py:167-262 serialize_as_participant_event). Same F8/A2 full
    collection and F4/F1/F2/F3 pilot machinery as run(); the triple
    emission differs (see _serialize_participant)."""
    t = _load(corpus)
    type2mapping = {r["type_qid"]: r["mapping_name"] for r in t["type2mapping"]}
    entity_labels = {r["qid"]: r["label"] for r in t["entity_labels"]}
    conv_sources = defaultdict(list)
    for r in t["conv_sources"]:
        conv_sources[r["conv_id"]].append(r["source"])

    turns_by_conv: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for r in t["transcripts"]:
        turns_by_conv[r["conv_id"]].append((r["turn_idx"], r["text"]))
    content_by_conv = {
        cid: assemble_document([txt for _, txt in sorted(pairs)])
        for cid, pairs in turns_by_conv.items()
    }

    incidents: dict[str, Incident] = {}
    for r in t["incidents"]:
        if r["participant_id"] is None:
            continue
        incidents[r["incident_id"]] = Incident(
            wdt_id=r["incident_id"],
            incident_type=r["incident_type"],
            incident_type_uri=r["incident_type_uri"],
            participant_id=r["participant_id"],
            participant_event_label=r["participant_event_label"],
        )
    for r in t["incident_direct_types"]:
        if r["incident_id"] in incidents:
            incidents[r["incident_id"]].direct_types.add(r["direct_type"])
    for r in t["incident_roles"]:
        if r["incident_id"] in incidents:
            incidents[r["incident_id"]].extra_info.setdefault(
                r["role"], set()
            ).add(r["value"])
    for r in t["conv_meta"]:
        if r["incident_id"] in incidents:
            incidents[r["incident_id"]].reference_texts.append(
                RefText(conv_id=r["conv_id"], name=r["name"],
                        language=r["lang"], uri=r["uri"],
                        found_by=list(r.get("found_by") or ["SPARQL"]))
            )

    surviving: list[Incident] = []
    for inc in incidents.values():
        new_texts = []
        for rt in inc.reference_texts:
            content = content_by_conv.get(rt.conv_id)
            if content:
                rt.content = content
                new_texts.append(rt)
        new_texts = _deduplicate_ref_texts(new_texts)
        if new_texts:
            inc.reference_texts = new_texts
            surviving.append(inc)

    full_triples: set[Triple] = set()
    by_type: dict[str, list[Incident]] = defaultdict(list)
    for inc in surviving:
        by_type[inc.incident_type].append(inc)
    for type_qid, incs in by_type.items():
        full_triples |= _serialize_participant(incs, type_qid, type2mapping)

    pilots: list[Incident] = []
    for inc in sorted(surviving, key=lambda x: x.wdt_id):
        mapping_name = type2mapping.get(inc.incident_type, "any")
        if set(inc.extra_info.keys()) != set(ROLE_MAPPINGS[mapping_name].keys()):
            continue
        inc.reference_texts = _deduplicate_ref_texts(inc.reference_texts)
        langs: set[str] = set()
        new_texts = []
        for rt in inc.reference_texts:
            rt.content = first_section(rt.content)
            if check_ref_text(rt.content, rt.name, min_chars=100, max_chars=50000):
                langs.add(rt.language)
                new_texts.append(rt)
        inc.reference_texts = new_texts
        if _skip_this_incident(
            new_texts, target_languages, langs,
            must_have_all_languages, must_have_english, one_page_per_language,
        ):
            continue
        for role, vals in inc.extra_info.items():
            new_vals = set()
            for v in vals:
                if "|" not in v:
                    label = ""
                    if v.startswith("http"):
                        label = entity_labels.get(v.split("/")[-1], "")
                    v = v + " | " + label
                new_vals.add(v)
            inc.extra_info[role] = new_vals
        pilots.append(inc)
    pilots = pilots[:max_pilot_incidents]
    for inc in pilots:
        for rt in inc.reference_texts:
            rt.primary_ref_texts = conv_sources.get(rt.conv_id, [])

    pilot_triples: set[Triple] = set()
    pilots_by_type: dict[str, list[Incident]] = defaultdict(list)
    for inc in pilots:
        pilots_by_type[inc.incident_type].append(inc)
    for type_qid, incs in pilots_by_type.items():
        pilot_triples |= _serialize_participant(incs, type_qid, type2mapping)

    return OracleOutputs(
        full_triples=full_triples,
        pilot_triples=pilot_triples,
        pilot_incident_ids=[i.wdt_id for i in pilots],
        mentions=[], corefs=[], srl_links=[], turns=[],
    )


WDT_WIKI = "http://www.wikidata.org/wiki/"


def _serialize_participant(incs: list[Incident], incident_type: str,
                           type2mapping: dict[str, str]) -> set[Triple]:
    """classes.py:167-262 serialize_as_participant_event: sem:hasActor per
    participant (classes.py:208-210), rdf:type per direct type under
    /wiki/ (classes.py:213-215), denotedIn + dct metadata per text WITHOUT
    a per-text label, sem:eventType under /wiki/, a plain-literal
    participant-event label, role triples with the gYear rule — and NO
    fn17 hardcoded type or collection-label triple."""
    mapping_name = type2mapping.get(incident_type, "any")
    mapping = ROLE_MAPPINGS[mapping_name]
    g: set[Triple] = set()
    for inc in incs:
        event_id = WD + inc.wdt_id
        g.add((event_id, SEM + "hasActor", WD + inc.participant_id,
               False, None, None))
        for dt in inc.direct_types:
            g.add((event_id, RDF_TYPE, WDT_WIKI + dt[3:], False, None, None))
        for rt in inc.reference_texts:
            g.add((event_id, GRASP + "denotedIn", rt.uri, False, None, None))
            g.add((rt.uri, DCT + "description", rt.content or "", True, None, None))
            g.add((rt.uri, DCT + "title", rt.name, True, None, None))
            g.add((rt.uri, DCT + "language", rt.language, True, None, None))
            g.add((rt.uri, DCT + "type", DCMI_TEXT, False, None, None))
            for source in rt.primary_ref_texts:
                g.add((rt.uri, DCT + "source", source, False, None, None))
        g.add((event_id, RDF_TYPE, SEM + "Event", False, None, None))
        g.add((event_id, SEM + "eventType", WDT_WIKI + incident_type,
               False, None, None))
        g.add((event_id, RDFS_LABEL, inc.participant_event_label,
               True, None, None))
        for predicate in mapping:
            if predicate not in inc.extra_info:
                continue
            prefix, pid = predicate.split(":")
            res = SEM if prefix == "sem" else PREMON
            for v in inc.extra_info[predicate]:
                v = v.split("|")[0].strip()
                if pid not in {"hasTimeStamp", "time"}:
                    g.add((event_id, res + pid, v, False, None, None))
                elif v.endswith("-01-01T00:00:00Z"):
                    g.add((event_id, res + pid, v[:4], True, None, XSD + "gYear"))
                else:
                    g.add((event_id, res + pid, v, True, None, XSD + "date"))
    return g


def _deduplicate_ref_texts(ref_texts: list[RefText]) -> list[RefText]:
    """utils.py:386-398 — drop rt if a same-language text with identical
    content and lexicographically larger name exists (keeps max name)."""
    out = []
    for rt in ref_texts:
        keep = True
        for other in ref_texts:
            if rt.language == other.language and rt.name < other.name:
                if rt.content == other.content:
                    keep = False
                    break
        if keep:
            out.append(rt)
    return out


def _skip_this_incident(ref_texts, target_languages, rt_langs,
                        must_have_all_languages, must_have_english,
                        one_page_per_language) -> bool:
    """pilot_utils.py:107-124, incl. the if/elif structure."""
    skip = False
    if must_have_all_languages:
        for lang in target_languages:
            if lang not in rt_langs:
                skip = True
                break
    if must_have_english and "en" not in rt_langs:
        skip = True
    elif one_page_per_language and len(ref_texts) != len(rt_langs):
        skip = True
    return skip


def _serialize(incs: list[Incident], incident_type: str, incident_type_uri: str,
               type2mapping: dict[str, str]) -> set[Triple]:
    """classes.py:265-353 triple emission, one collection per event type."""
    mapping_name = type2mapping.get(incident_type, "any")
    mapping = ROLE_MAPPINGS[mapping_name]
    g: set[Triple] = set()
    for inc in incs:
        event_id = WD + inc.wdt_id
        for rt in inc.reference_texts:
            g.add((event_id, RDFS_LABEL, rt.name, True, rt.language, None))
            g.add((event_id, GRASP + "denotedIn", rt.uri, False, None, None))
            g.add((rt.uri, DCT + "description", rt.content or "", True, None, None))
            g.add((rt.uri, DCT + "title", rt.name, True, None, None))
            g.add((rt.uri, DCT + "language", rt.language, True, None, None))
            g.add((rt.uri, DCT + "type", DCMI_TEXT, False, None, None))
            for source in rt.primary_ref_texts:
                g.add((rt.uri, DCT + "source", source, False, None, None))
        g.add((event_id, RDF_TYPE, SEM + "Event", False, None, None))
        g.add((event_id, SEM + "eventType", incident_type_uri, False, None, None))
        g.add((event_id, RDF_TYPE, FN + "change_of_leadership", False, None, None))
        for predicate in mapping:
            if predicate not in inc.extra_info:
                continue
            prefix, pid = predicate.split(":")
            res = SEM if prefix == "sem" else PREMON
            for v in inc.extra_info[predicate]:
                v = v.split("|")[0].strip()
                if pid not in {"hasTimeStamp", "time"}:
                    g.add((event_id, res + pid, v, False, None, None))
                elif v.endswith("-01-01T00:00:00Z"):
                    g.add((event_id, res + pid, v[:4], True, None, XSD + "gYear"))
                else:
                    g.add((event_id, res + pid, v, True, None, XSD + "date"))
    g.add((incident_type_uri, RDFS_LABEL, incident_type, True, None, None))
    return g


def _get_uris(incidents: list[Incident]):
    """utils.py:642-688 with deviation D2."""
    short_rel_to_full = {
        "sem:hasPlace": SEM + "hasPlace",
        "sem:hasActor": SEM + "hasActor",
    }
    uri_to_rels: dict[str, set[str]] = defaultdict(set)
    inc_id_to_wd_uris: dict[str, set[str]] = defaultdict(set)
    for inc in incidents:
        uri_to_rels[inc.wdt_id].add(SEM + "Event")
        wd_inc_uri = WD + inc.wdt_id
        inc_id_to_wd_uris[wd_inc_uri].add(wd_inc_uri)
        for rel, vals in inc.extra_info.items():
            if rel == "sem:hasTimeStamp" or rel not in short_rel_to_full:  # D2
                continue
            for v in vals:
                uri = v.split(" | ")[0].strip()  # D2: tolerant unpack
                if not uri.startswith(WD):
                    continue
                qid = uri.replace(WD, "")
                uri_to_rels[qid].add(short_rel_to_full[rel])
                inc_id_to_wd_uris[wd_inc_uri].add(WD + qid)
    return uri_to_rels, inc_id_to_wd_uris


def _add_hyperlinks(rt: RefText, langlinks) -> list[dict]:
    """pilot_utils.py:262-340: align annotations to token boundaries over the
    (truncated) content, expand langlinks into ext_refs."""
    tokens = tokenize(rt.content)
    start2tid, end2tid = offset_alignment_maps(tokens)
    prefix = wiki_prefix(rt.language)
    # load_annotations (pilot_utils.py:233-253): dict keyed by (start, end)
    start_end2info: dict[tuple[int, int], tuple[str, str]] = {}
    for ann in rt.annotations:
        start = ann["offset"]
        sf = ann["surface_form"]
        uri = urllib.parse.unquote(prefix + ann["uri"])
        start_end2info[(start, start + len(sf))] = (sf, uri)

    mentions = []
    next_id = 1
    for (start, end), (sf, uri) in start_end2info.items():
        if start not in start2tid or end not in end2tid:
            continue  # F10 misalignment skip
        ext_refs = [uri]
        links = langlinks.get(rt.language, {}).get(uri, {})
        for _lang, other_uri in links.items():
            ext_refs.append(other_uri)
        mentions.append(
            {"eid": next_id, "begin_tid": start2tid[start], "end_tid": end2tid[end],
             "surface": sf, "ext_refs": ext_refs}
        )
        next_id += 1
    return mentions
