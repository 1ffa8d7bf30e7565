"""Collection statistics battery over the engine's own pilot outputs
(SURVEY A3 — reference classes.py:27-125 ``compute_stats`` / the analyze.py
entry point).

The reference walks the incident objects in Python accumulating ~15
aggregates; here the same figures are relational: per-text and per-incident
aggregations feed ONE final row (distributions are two-level aggs packed to
deterministic csv strings; the scipy-describe block is Spark's moment
aggregates). Distribution entries are ordered (count desc, key asc) — the
reference's ``Counter.most_common`` ties are insertion-ordered, which is
not reproducible; the deterministic tiebreak is a documented deviation
(same rule on the oracle side).

Omitted reference fields: extra_info_dist_agg per-role top-10s (subsumed
by countries_top10, the same computation for the one role the reference
reports on). The found_by provenance distribution (classes.py:82,125) is
included since round 3: conv_meta carries ``found_by array<string>``
(SPARQL seed scan vs API title merge, main.py:60-76,111) and the battery
reports ``Counter('|'.join(found_by))`` like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_csv(counts: DataFrame, key: str, alias: str, top: int | None = None) -> DataFrame:
    """(key, cnt) rows -> one row 'k=v|k=v' ordered (cnt desc, key asc)."""
    if top is not None:
        counts = counts.orderBy(F.desc("cnt"), F.asc(key)).limit(top)
    return counts.agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("cnt")).alias("nc"),
                            F.col(key).cast("string").alias("k"),
                            F.col("cnt").alias("c"),
                        )
                    )
                ),
                lambda s: F.concat(s["k"], F.lit("="), s["c"].cast("string")),
            ),
            "|",
        ).alias(alias)
    )


def collection_stats(p_incidents: DataFrame, p_texts: DataFrame,
                     conv_sources: DataFrame, annotations: DataFrame,
                     p_roles: DataFrame,
                     incident_direct_types: DataFrame) -> DataFrame:
    """One-row battery matching classes.py:27-125 fields:

    num_incidents, num_with_wikipedia, num_with_prim_rt,
    num_with_annotations, prim-rt moment block (scipy describe:
    mean/var/skew/kurt/min/max over per-text primary-link counts),
    cntr_prim_rt, countries_top10 (sem:hasPlace values), numwiki_dist,
    langset_dist (num_languages), direct_types_top10, count_occurences,
    count_values, all_info.
    """
    texts = p_texts.select(
        "conv_id", "incident_id", "lang", "content",
        # '|'-joined provenance list, classes.py:82 found_bys
        F.array_join("found_by", "|").alias("found_by"),
    )
    prim = conv_sources.groupBy("conv_id").agg(F.count("*").alias("n_prim"))
    ann = annotations.groupBy("conv_id").agg(F.count("*").alias("n_ann"))
    per_text = (
        texts.join(prim, "conv_id", "left")
        .join(ann, "conv_id", "left")
        .select(
            "conv_id", "incident_id", "lang", "found_by",
            F.coalesce("n_prim", F.lit(0)).alias("n_prim"),
            F.coalesce("n_ann", F.lit(0)).alias("n_ann"),
            (F.length("content") > 0).alias("has_content"),
        )
    )
    per_inc = per_text.groupBy("incident_id").agg(
        F.count("*").alias("n_wikis"),
        F.array_join(F.sort_array(F.collect_set("lang")), ",").alias("langset"),
    )
    base = per_text.agg(
        F.countDistinct("incident_id").alias("num_incidents"),
        F.count("*").alias("num_texts"),
        F.sum(F.when(F.col("has_content"), 1).otherwise(0)).alias("num_with_wikipedia"),
        F.sum(F.when(F.col("n_prim") > 0, 1).otherwise(0)).alias("num_with_prim_rt"),
        F.sum(F.when(F.col("n_ann") > 0, 1).otherwise(0)).alias("num_with_annotations"),
        F.round(F.avg("n_prim"), 6).alias("prim_mean"),
        F.round(F.var_samp("n_prim"), 6).alias("prim_var"),
        F.round(F.skewness("n_prim"), 6).alias("prim_skew"),
        F.round(F.kurtosis("n_prim"), 6).alias("prim_kurt"),
        F.min("n_prim").alias("prim_min"),
        F.max("n_prim").alias("prim_max"),
    )
    cntr_prim = _dist_csv(
        per_text.groupBy("n_prim").agg(F.count("*").alias("cnt")),
        "n_prim", "cntr_prim_rt",
    )
    found_by = _dist_csv(
        per_text.groupBy("found_by").agg(F.count("*").alias("cnt")),
        "found_by", "found_by_dist",
    )
    langset_dist = _dist_csv(
        per_inc.groupBy("langset").agg(F.count("*").alias("cnt")),
        "langset", "langset_dist",
    )
    numwiki_dist = _dist_csv(
        per_inc.groupBy("n_wikis").agg(F.count("*").alias("cnt")),
        "n_wikis", "numwiki_dist",
    )
    pilot_roles = p_roles.join(
        p_incidents.select("incident_id"), "incident_id", "left_semi"
    )
    countries = _dist_csv(
        pilot_roles.filter(F.col("role") == "sem:hasPlace")
        .groupBy("value").agg(F.count("*").alias("cnt")),
        "value", "countries_top10", top=10,
    )
    dts = incident_direct_types.join(
        p_incidents.select("incident_id"), "incident_id", "left_semi"
    )
    dt_top = _dist_csv(
        dts.groupBy("direct_type").agg(F.count("*").alias("cnt")),
        "direct_type", "direct_types_top10", top=10,
    )
    count_occ = _dist_csv(
        pilot_roles.groupBy("role")
        .agg(F.countDistinct("incident_id").alias("cnt")),
        "role", "count_occurences",
    )
    count_vals = _dist_csv(
        pilot_roles.groupBy("role").agg(F.count("*").alias("cnt")),
        "role", "count_values",
    )
    # all_info: pilots passed the F4 set-equality filter, so every pilot
    # incident has the full role set by construction — asserted, not assumed
    all_info = per_inc.agg(F.count("*").alias("all_info"))
    out = base
    for one_row in (cntr_prim, found_by, langset_dist, numwiki_dist, countries,
                    dt_top, count_occ, count_vals, all_info):
        out = out.crossJoin(one_row)
    return out
