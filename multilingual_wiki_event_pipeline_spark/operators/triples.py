"""RDF triple materialization (SURVEY K3 — reference classes.py:265-353).

The reference walks the object graph per incident appending rdflib triples;
here the same triple set is the union of four narrow projections, each a
single scan, deduplicated at the end (rdflib Graph is a set):

  T1 per reference text   — labels, denotedIn, dct:* metadata, sources
  T2 per incident         — rdf:type sem:Event, sem:eventType, fn17 type
  T3 per role value       — sem:/pm: routed role triples with the
                            gYear/date literal rule (P4) and 'uri | label'
                            unpacking (P3)
  T4 per collection       — event-type label

Output schema: (subj, pred, obj, obj_is_literal, lang, datatype) — the
Turtle rendering is a final concat projection (render_turtle_line), not a
separate store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .filters import gyear_literal, packed_value_uri

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
SEM = "http://semanticweb.cs.vu.nl/2009/11/sem/"
GRASP = "http://groundedannotationframework.org/grasp#"
DCT = "http://purl.org/dc/elements/1.1/"
FN = "http://premon.fbk.eu/resource/fn17-"
PREMON = "https://premon.fbk.eu/resource/"
DCMI_TEXT = "http://purl.org/dc/dcmitype/Text"
WD = "http://www.wikidata.org/entity/"
WDT_WIKI = "http://www.wikidata.org/wiki/"

TRIPLE_COLS = ["subj", "pred", "obj", "obj_is_literal", "lang", "datatype"]


def _t(subj, pred, obj, is_literal=False, lang=None, datatype=None):
    lit = F.lit(True) if is_literal else F.lit(False)
    lang_c = lang if lang is not None else F.lit(None).cast("string")
    dt_c = datatype if datatype is not None else F.lit(None).cast("string")
    return F.struct(
        subj.alias("subj"),
        (pred if not isinstance(pred, str) else F.lit(pred)).alias("pred"),
        obj.alias("obj"),
        lit.alias("obj_is_literal"),
        lang_c.alias("lang"),
        dt_c.alias("datatype"),
    )


def _explode_triples(df: DataFrame, triple_structs: list) -> DataFrame:
    """One scan -> N triples per row via array+explode (keeps it a single
    pass instead of a union of N scans)."""
    return df.select(
        F.explode(F.array(*triple_structs)).alias("t")
    ).select("t.*")


def text_triples(texts: DataFrame, include_sources: bool = False,
                 conv_sources: DataFrame | None = None) -> DataFrame:
    """T1: per reference text (classes.py:304-317)."""
    event = F.concat(F.lit(WD), F.col("incident_id"))
    base = _explode_triples(
        texts,
        [
            _t(event, RDFS_LABEL, F.col("name"), True, lang=F.col("lang")),
            _t(event, GRASP + "denotedIn", F.col("uri")),
            _t(F.col("uri"), DCT + "description", F.col("content"), True),
            _t(F.col("uri"), DCT + "title", F.col("name"), True),
            _t(F.col("uri"), DCT + "language", F.col("lang"), True),
            _t(F.col("uri"), DCT + "type", F.lit(DCMI_TEXT)),
        ],
    )
    if include_sources and conv_sources is not None:
        src = (
            texts.join(conv_sources, "conv_id", "inner")
            .select(
                F.col("uri").alias("subj"),
                F.lit(DCT + "source").alias("pred"),
                F.col("source").alias("obj"),
                F.lit(False).alias("obj_is_literal"),
                F.lit(None).cast("string").alias("lang"),
                F.lit(None).cast("string").alias("datatype"),
            )
        )
        base = base.unionByName(src)
    return base


def incident_triples(incidents: DataFrame) -> DataFrame:
    """T2: per incident (classes.py:319-324) — including the reference's
    hardcoded fn17:change_of_leadership rdf:type."""
    event = F.concat(F.lit(WD), F.col("incident_id"))
    return _explode_triples(
        incidents,
        [
            _t(event, RDF_TYPE, F.lit(SEM + "Event")),
            _t(event, SEM + "eventType", F.col("incident_type_uri")),
            _t(event, RDF_TYPE, F.lit(FN + "change_of_leadership")),
        ],
    )


def role_triples(incident_roles: DataFrame, incidents: DataFrame,
                 type2mapping: DataFrame, role_mappings: DataFrame) -> DataFrame:
    """T3 (classes.py:327-345): roles routed sem:/pm: by prefix; only roles
    present in the type's mapping emit; timestamp roles become gYear/date
    literals; values are unpacked from 'uri | label' packing."""
    mapping_roles = (
        type2mapping.join(role_mappings.select("mapping_name", "role").distinct(),
                          "mapping_name")
        .select("type_qid", "role")
    )
    typed = incidents.select("incident_id", "incident_type", "incident_type_uri")
    roles = (
        incident_roles.join(typed, "incident_id")
        .join(
            F.broadcast(mapping_roles),
            (F.col("incident_type") == F.col("type_qid"))
            & (incident_roles["role"] == mapping_roles["role"]),
            "left_semi",
        )
    )
    prefix = F.split(F.col("role"), ":")[0]
    pid = F.split(F.col("role"), ":")[1]
    res = F.when(prefix == "sem", F.lit(SEM)).otherwise(F.lit(PREMON))
    unpacked = packed_value_uri(F.col("value"))
    is_time = pid.isin("hasTimeStamp", "time")
    g_obj, g_dt = gyear_literal(unpacked)
    return roles.select(
        F.concat(F.lit(WD), F.col("incident_id")).alias("subj"),
        F.concat(res, pid).alias("pred"),
        F.when(is_time, g_obj).otherwise(unpacked).alias("obj"),
        is_time.alias("obj_is_literal"),
        F.lit(None).cast("string").alias("lang"),
        F.when(is_time, g_dt).otherwise(F.lit(None).cast("string")).alias("datatype"),
    )


def collection_triples(incidents: DataFrame) -> DataFrame:
    """T4 (classes.py:347): one label triple per event-type collection."""
    return (
        incidents.select("incident_type", "incident_type_uri").distinct()
        .select(
            F.col("incident_type_uri").alias("subj"),
            F.lit(RDFS_LABEL).alias("pred"),
            F.col("incident_type").alias("obj"),
            F.lit(True).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("datatype"),
        )
    )


def serialize_collection(incidents: DataFrame, texts: DataFrame,
                         incident_roles: DataFrame, type2mapping: DataFrame,
                         role_mappings: DataFrame,
                         conv_sources: DataFrame | None = None) -> DataFrame:
    """Full serialize() equivalent: union of T1-T4, set-deduplicated
    (rdflib Graph semantics). `texts` rows must carry incident_id, lang,
    name, uri, content."""
    parts = [
        text_triples(texts, include_sources=conv_sources is not None,
                     conv_sources=conv_sources),
        incident_triples(incidents),
        role_triples(incident_roles, incidents, type2mapping, role_mappings),
        collection_triples(incidents),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(TRIPLE_COLS)


def participant_text_triples(texts: DataFrame,
                             conv_sources: DataFrame | None = None) -> DataFrame:
    """Participant-mode T1 (classes.py:217-227): denotedIn + dct metadata
    per reference text — NO per-text rdfs:label (serialize() emits one,
    serialize_as_participant_event does not)."""
    event = F.concat(F.lit(WD), F.col("incident_id"))
    base = _explode_triples(
        texts,
        [
            _t(event, GRASP + "denotedIn", F.col("uri")),
            _t(F.col("uri"), DCT + "description", F.col("content"), True),
            _t(F.col("uri"), DCT + "title", F.col("name"), True),
            _t(F.col("uri"), DCT + "language", F.col("lang"), True),
            _t(F.col("uri"), DCT + "type", F.lit(DCMI_TEXT)),
        ],
    )
    if conv_sources is not None:
        src = texts.join(conv_sources, "conv_id", "inner").select(
            F.col("uri").alias("subj"),
            F.lit(DCT + "source").alias("pred"),
            F.col("source").alias("obj"),
            F.lit(False).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("datatype"),
        )
        base = base.unionByName(src)
    return base


def participant_incident_triples(incidents: DataFrame,
                                 direct_types: DataFrame) -> DataFrame:
    """Participant-mode T2 (classes.py:205-242): sem:hasActor to the
    participant (classes.py:208-210), rdf:type per direct type under the
    /wiki/ namespace (classes.py:213-215 — WDT_ONT, not WDT_ENT),
    rdf:type sem:Event + sem:eventType (also /wiki/), and a plain-literal
    rdfs:label of the minted participant-event name. The hardcoded
    fn17:change_of_leadership type of serialize() is absent here."""
    event = F.concat(F.lit(WD), F.col("incident_id"))
    base = _explode_triples(
        incidents,
        [
            _t(event, SEM + "hasActor",
               F.concat(F.lit(WD), F.col("participant_id"))),
            _t(event, RDF_TYPE, F.lit(SEM + "Event")),
            _t(event, SEM + "eventType",
               F.concat(F.lit(WDT_WIKI), F.col("incident_type"))),
            _t(event, RDFS_LABEL, F.col("participant_event_label"), True),
        ],
    )
    dts = (
        direct_types.join(
            F.broadcast(incidents.select("incident_id")), "incident_id",
            "left_semi",
        )
        .select(
            F.concat(F.lit(WD), F.col("incident_id")).alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            # direct_type is 'wd:Qxxx' -> /wiki/Qxxx (classes.py:214 [3:])
            F.concat(F.lit(WDT_WIKI), F.substring(F.col("direct_type"), 4, 2**30))
            .alias("obj"),
            F.lit(False).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("datatype"),
        )
    )
    return base.unionByName(dts)


def serialize_participant_collection(
    incidents: DataFrame, texts: DataFrame, incident_roles: DataFrame,
    type2mapping: DataFrame, role_mappings: DataFrame,
    direct_types: DataFrame, conv_sources: DataFrame | None = None,
) -> DataFrame:
    """serialize_as_participant_event() equivalent (classes.py:167-262):
    union of participant T1/T2 + the shared role triples, set-deduplicated.
    No collection-label triple (classes.py defines inc_type_literal but
    never adds it in the participant variant)."""
    parts = [
        participant_text_triples(texts, conv_sources=conv_sources),
        participant_incident_triples(incidents, direct_types),
        role_triples(incident_roles, incidents, type2mapping, role_mappings),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(TRIPLE_COLS)


def render_turtle_line(triples: DataFrame,
                       graph_col: str | None = None) -> DataFrame:
    """Turtle rendering as a formatting projection (golden-file comparisons
    and the sources/ntriples.py writer). N-Triples line form; literal
    escaping covers the characters N-Triples forbids raw (backslash,
    quote, LF, CR — TAB is legal raw); terms starting with ``_:`` render
    as blank-node labels, everything else as ``<IRI>``.

    With ``graph_col``, renders N-QUADS: the named-graph label is the
    4th term; rows tagged with the default-graph sentinel (or null) omit
    it, per the N-Quads grammar."""
    # NB replacement strings are Java-regex replacements: backslashes must
    # be doubled THERE too, so a literal \" needs four source backslashes
    esc = F.regexp_replace(
        F.regexp_replace(F.col("obj"), r"\\", r"\\\\"), '"', r"\\\""
    )
    esc = F.regexp_replace(esc, "\n", r"\\n")
    esc = F.regexp_replace(esc, "\r", r"\\r")
    literal = F.concat(
        F.lit('"'), esc, F.lit('"'),
        F.when(F.col("lang").isNotNull(), F.concat(F.lit("@"), F.col("lang"))).otherwise(F.lit("")),
        F.when(F.col("datatype").isNotNull(),
               F.concat(F.lit("^^<"), F.col("datatype"), F.lit(">"))).otherwise(F.lit("")),
    )
    def term(c):
        return F.when(c.startswith("_:"), c).otherwise(
            F.concat(F.lit("<"), c, F.lit(">"))
        )

    obj = F.when(F.col("obj_is_literal"), literal).otherwise(
        term(F.col("obj"))
    )
    tail = F.lit(" .")
    if graph_col is not None:
        from .bgp import DEFAULT_GRAPH
        g = F.col(graph_col)
        tail = F.when(
            g.isNull() | (g == F.lit(DEFAULT_GRAPH)), F.lit(" .")
        ).otherwise(F.concat(F.lit(" "), term(g), F.lit(" .")))
    return triples.select(
        F.concat(
            term(F.col("subj")), F.lit(" <"), F.col("pred"), F.lit("> "),
            obj, tail,
        ).alias("line")
    )
