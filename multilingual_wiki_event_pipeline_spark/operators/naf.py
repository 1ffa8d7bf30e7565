"""NAF XML serialization (SURVEY K2 — reference pilot_utils.py:343-433
writer, xml_utils.py layer shapes).

The reference materializes one NAF XML file per (lang, title) with layers
raw / text(wf) / entities(externalReferences) / coreferences and then
mutates it in place (xml_utils.py:350-408, 540-548). Here the layer tables
(tokens, linked mentions, coref clusters) are the store of record and the
XML is a pure FORMATTING projection — one JVM-side string concat per
document, no lxml on executors, no in-place mutation (enrichment = new
layer rows, re-render).

Output: (conv_id, naf_xml string). Layer element shapes mirror the
reference: ``<wf id="w{n}" offset length>`` (xml_utils.py:250-258),
``<entity id="e{n}"><span><target id="t{n}"/></span>
<externalReferences><externalRef reference=.../></externalReferences>``
(pilot_utils.py:34-67), ``<coref id="co{n}"><span>..</span></coref>``
(xml_utils.py:475-534).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _esc(c: F.Column) -> F.Column:
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return c


def _layer(per_doc_elems: DataFrame, elem_col: str, order_col: str,
           out_name: str) -> DataFrame:
    """Per-doc element strings -> one joined layer string per conv_id."""
    return (
        per_doc_elems.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(order_col, elem_col))
                    ),
                    lambda s: s[elem_col],
                ),
                "",
            ).alias(out_name)
        )
    )


def render_naf(texts: DataFrame, tokens: DataFrame, mentions: DataFrame,
               corefs: DataFrame, srl_predicates: DataFrame | None = None,
               srl_roles: DataFrame | None = None) -> DataFrame:
    """texts(conv_id, lang, content) + layer tables -> (conv_id, naf_xml).

    Layers: raw / text(wf) / terms (xml_utils.py:29-42 shape: one term per
    wf with a lemma/pos — deterministic lowercase lemma + coarse pos, D3
    tokenizer deviation applies) / entities / coreferences / srl
    (xml_utils.py:140-162 read shape: predicate@uri with span + role@semRole
    elements) when the srl tables are supplied."""
    wf_elems = tokens.select(
        "conv_id",
        F.col("tid").alias("ord"),
        F.concat(
            F.lit('<wf id="w'), F.col("tid"),
            F.lit('" offset="'), F.col("offset"),
            F.lit('" length="'), F.col("length"),
            F.lit('">'), _esc(F.col("surface")), F.lit("</wf>"),
        ).alias("elem"),
    )
    wf = _layer(wf_elems, "elem", "ord", "text_layer")

    pos = (
        F.when(F.col("surface").rlike("^[0-9]+$"), F.lit("NUM"))
        .when(F.col("surface").rlike("^[^A-Za-z0-9]+$"), F.lit("PUNCT"))
        .otherwise(F.lit("WORD"))
    )
    term_elems = tokens.select(
        "conv_id",
        F.col("tid").alias("ord"),
        F.concat(
            F.lit('<term id="t'), F.col("tid"),
            F.lit('" lemma="'), _esc(F.lower(F.col("surface"))),
            F.lit('" pos="'), pos,
            F.lit('"><span><target id="w'), F.col("tid"),
            F.lit('"/></span></term>'),
        ).alias("elem"),
    )
    terms = _layer(term_elems, "elem", "ord", "terms_layer")

    targets = lambda b, e: F.array_join(  # noqa: E731
        F.transform(
            F.sequence(b, e),
            lambda x: F.concat(F.lit('<target id="t'), x, F.lit('"/>')),
        ),
        "",
    )
    ent_elems = mentions.select(
        "conv_id",
        F.col("eid").alias("ord"),
        F.concat(
            F.lit('<entity id="e'), F.col("eid"), F.lit('"><span>'),
            targets(F.col("begin_tid"), F.col("end_tid")),
            F.lit("</span><externalReferences>"),
            F.array_join(
                F.transform(
                    F.col("ext_refs"),
                    lambda r: F.concat(
                        F.lit('<externalRef reference="'), _esc(r), F.lit('"/>')
                    ),
                ),
                "",
            ),
            F.lit("</externalReferences></entity>"),
        ).alias("elem"),
    )
    ents = _layer(ent_elems, "elem", "ord", "entities_layer")

    coref_elems = corefs.select(
        "conv_id",
        F.col("wd_uri").alias("ord"),
        F.concat(
            F.lit('<coref type="'), F.col("coref_type"),
            F.lit('" uri="'), _esc(F.col("wd_uri")), F.lit('">'),
            F.array_join(
                F.transform(
                    F.col("spans"),
                    lambda span: F.concat(
                        F.lit("<span>"),
                        F.array_join(
                            F.transform(
                                span,
                                lambda t: F.concat(
                                    F.lit('<target id="t'), t, F.lit('"/>')
                                ),
                            ),
                            "",
                        ),
                        F.lit("</span>"),
                    ),
                ),
                "",
            ),
            F.lit("</coref>"),
        ).alias("elem"),
    )
    cors = _layer(coref_elems, "elem", "ord", "coref_layer")

    if srl_predicates is not None and srl_roles is not None:
        role_strs = srl_roles.groupBy("conv_id", "pred_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "role", "begin_tid", "end_tid",
                                F.concat(
                                    F.lit('<role semRole="'), _esc(F.col("role")),
                                    F.lit('"><span>'),
                                    targets(F.col("begin_tid"), F.col("end_tid")),
                                    F.lit("</span></role>"),
                                ).alias("elem"),
                            )
                        )
                    ),
                    lambda s: s["elem"],
                ),
                "",
            ).alias("roles_str")
        )
        pred_elems = (
            srl_predicates.join(role_strs, ["conv_id", "pred_id"], "left")
            .select(
                "conv_id",
                F.col("pred_id").alias("ord"),
                F.concat(
                    F.lit('<predicate id="'), _esc(F.col("pred_id")),
                    F.lit('" uri="'), _esc(F.col("frame")), F.lit('"><span>'),
                    targets(F.col("begin_tid"), F.col("end_tid")),
                    F.lit("</span>"),
                    F.coalesce(F.col("roles_str"), F.lit("")),
                    F.lit("</predicate>"),
                ).alias("elem"),
            )
        )
        srl = _layer(pred_elems, "elem", "ord", "srl_layer")
    else:
        srl = None

    empty = F.lit("")
    out = (
        texts.select("conv_id", "lang", "content")
        .join(wf, "conv_id", "left")
        .join(terms, "conv_id", "left")
        .join(ents, "conv_id", "left")
        .join(cors, "conv_id", "left")
    )
    if srl is not None:
        out = out.join(srl, "conv_id", "left")
    srl_col = (
        F.coalesce(F.col("srl_layer"), empty) if srl is not None else empty
    )
    return out.select(
        "conv_id",
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?>'),
            F.lit('<NAF xml:lang="'), F.col("lang"), F.lit('" version="v3">'),
            F.lit("<raw><![CDATA["), F.col("content"), F.lit("]]></raw>"),
            F.lit("<text>"), F.coalesce(F.col("text_layer"), empty),
            F.lit("</text>"),
            F.lit("<terms>"), F.coalesce(F.col("terms_layer"), empty),
            F.lit("</terms>"),
            F.lit("<entities>"), F.coalesce(F.col("entities_layer"), empty),
            F.lit("</entities>"),
            F.lit("<coreferences>"), F.coalesce(F.col("coref_layer"), empty),
            F.lit("</coreferences>"),
            F.lit("<srl>"), srl_col, F.lit("</srl>"),
            F.lit("</NAF>"),
        ).alias("naf_xml"),
    )
