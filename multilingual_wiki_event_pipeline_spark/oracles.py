"""DuckDB oracle SQL for every relational query in ``catalog.py``.

Each SQL string is the ANSI-SQL twin of the Spark DataFrame plan with the
same key in ``catalog.QUERIES``; the driver runs both at sf=0.01 and compares
row count + schema + order-insensitive value hash. Column aliases MUST match
the Spark side exactly.

Portability rules used throughout (so Spark and DuckDB agree bit-for-bit):
- doubles are ROUND()ed after aggregation;
- integer counts are cast to BIGINT (DuckDB count() is BIGINT, sum(int) is
  HUGEINT — always cast);
- hashing across engines uses md5() hex strings (identical in both);
- rankings always carry a deterministic tiebreak column.
"""

from __future__ import annotations

# Shared CTE fragments -------------------------------------------------------

_DOC_TOKENS = """
doc_tokens AS (
  SELECT DISTINCT doc_id, lang, token FROM (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
)
"""

_MINHASH_BANDS = """
sh_lists AS (
  SELECT doc_id,
         CASE WHEN len(arr) >= 3
              THEN list_transform(range(1, len(arr) - 1),
                                  i -> array_to_string(arr[i:i+2], ' '))
              ELSE [array_to_string(arr, ' ')] END AS sh
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS arr
        FROM documents)
),
doc_shingles AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(sh) AS token FROM sh_lists
  ) WHERE token <> ''
),
sig AS (
  SELECT doc_id, s.seed, MIN(md5(concat(CAST(s.seed AS VARCHAR), ':', token))) AS mh
  FROM doc_shingles CROSS JOIN (SELECT unnest(range(8)) AS seed) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, CAST(seed // 2 AS BIGINT) AS band,
         string_agg(mh, '|' ORDER BY seed) AS band_sig
  FROM sig GROUP BY doc_id, CAST(seed // 2 AS BIGINT)
)
"""

_SIMHASH = """
doc_tokens AS (
  SELECT DISTINCT doc_id, lang, token FROM (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
bits AS (
  SELECT doc_id, lang, b.b,
         ((strpos('0123456789abcdef', substr(md5(token), 1 + CAST(b.b // 4 AS INT), 1)) - 1)
           >> CAST(b.b % 4 AS INT)) & 1 AS bit
  FROM doc_tokens CROSS JOIN (SELECT unnest(range(16)) AS b) b
),
sums AS (SELECT doc_id, lang, b, SUM(2 * bit - 1) AS s FROM bits GROUP BY doc_id, lang, b),
sh AS (
  SELECT doc_id, lang,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
  FROM sums GROUP BY doc_id, lang
)
"""

_EMB = "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

_COS = ("list_dot_product(q.v, c.v) / "
        "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))")

def _rp_bucket_sql(n_bits: int) -> str:
    """The DuckDB twin of similarity.rp_bucket: the SAME seeded projection
    weights (plan-build-time literals on the Spark side) rendered as SQL
    array literals — repr() round-trips doubles exactly, so both engines
    compute identical dot-product signs and identical bucket ids."""
    from .operators.similarity import (
        DEFAULT_DIM, DEFAULT_SEED, projection_weights,
    )

    terms = []
    for i, w in enumerate(projection_weights(n_bits, DEFAULT_DIM, DEFAULT_SEED)):
        arr = ", ".join(repr(float(x)) for x in w)
        terms.append(
            f"(CASE WHEN list_dot_product(v, [{arr}]) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


_BUCKET = _rp_bucket_sql(1)      # similarity.DEFAULT_LSH_BITS
_BUCKET_MP = _rp_bucket_sql(3)   # similarity.DEFAULT_MULTIPROBE_BITS


def _cos_of(a: str, b: str) -> str:
    return (f"list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b})))")


def _lloyd_assign(name: str, cents: str) -> str:
    """One nearest-centroid assignment CTE (ties on lower cell) — the
    DuckDB twin of similarity.assign_cells."""
    return f"""{name} AS (
          SELECT vec_id, v, cell FROM (
            SELECT vec_id, v, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cell) AS rn
            FROM (SELECT e.vec_id, e.v, c.cell,
                         {_cos_of('e.v', 'c.centroid')} AS csim
                  FROM e CROSS JOIN {cents} c)
          ) WHERE rn = 1)"""


def _lloyd_ctes(k: int, n_iters: int, dim: int,
                round_to: int) -> tuple[list[str], str]:
    """The deterministic Lloyd trainer (similarity.kmeans_centroids —
    first-k-by-vec_id init, fixed iterations, empty cells keep their
    previous centroid) unrolled into one CTE pair per round, finished by
    the trained assignment ``af``. Shared by the ann_ivf and
    semantic_dedup_keep oracles. Per-cell per-dim means are ROUND()ed to
    ``round_to`` decimals in BOTH engines (similarity._per_cell_mean
    round_to) so float summation order cannot leak a ulp into the
    comparison. Returns (ctes, final_centroid_cte_name)."""
    ctes = [f"""c0 AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                 v AS centroid
          FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}))"""]
    for i in range(1, n_iters + 1):
        ctes.append(_lloyd_assign(f"a{i}", f"c{i - 1}"))
        ctes.append(f"""m{i} AS (
          SELECT cell, list(m ORDER BY pos) AS centroid FROM (
            SELECT cell, p.pos, ROUND(AVG(a.v[p.pos + 1]), {round_to}) AS m
            FROM a{i} a CROSS JOIN (SELECT unnest(range({dim})) AS pos) p
            GROUP BY cell, p.pos
          ) GROUP BY cell)""")
        ctes.append(f"""c{i} AS (
          SELECT i.cell, COALESCE(m.centroid, i.centroid) AS centroid
          FROM c{i - 1} i LEFT JOIN m{i} m USING (cell))""")
    ctes.append(_lloyd_assign("af", f"c{n_iters}"))
    return ctes, f"c{n_iters}"


def _ivf_sql(k: int = 8, n_iters: int = 2, n_probe: int = 2, topk: int = 3,
             dim: int = 64, round_to: int = 9) -> str:
    """DuckDB twin of catalog.ann_ivf: the unrolled Lloyd trainer
    (_lloyd_ctes), then the IVF assign/probe/topk."""
    ctes, final = _lloyd_ctes(k, n_iters, dim, round_to)
    ctes.append(f"""qc AS (
          SELECT query_id, qv, cell FROM (
            SELECT query_id, qv, cell,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY csim DESC, cell) AS rn
            FROM (SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
                         {_cos_of('q.v', 'c.centroid')} AS csim
                  FROM e q CROSS JOIN {final} c WHERE q.vec_id < 50)
          ) WHERE rn <= {n_probe})""")
    ctes.append(f"""pairs AS (
          SELECT qc.query_id, a.vec_id AS neighbor_id,
                 ROUND({_cos_of('qc.qv', 'a.v')}, 6) AS sim
          FROM qc JOIN af a USING (cell)
          WHERE qc.query_id <> a.vec_id)""")
    body = ",\n        ".join(ctes)
    return f"""
        WITH {_EMB},
        {body}
        SELECT query_id, neighbor_id, sim FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM pairs
        ) WHERE rn <= {topk}
    """

_TS_IS_GYEAR = "strftime({c}, '%m-%d %H:%M:%S') = '01-01 00:00:00'"

# The K3 event-triple store, shared between the triples_events entry and
# the sparql_bgp self-joins (a CTE body — DuckDB allows a nested WITH
# inside a CTE subquery).
_TRIPLES_EVENTS_SQL = f"""
        WITH e AS (SELECT event_id, user_id, event_type, ts FROM events)
        SELECT subj, pred, obj, obj_is_literal, datatype FROM (
          SELECT concat('inst:ev', CAST(event_id AS VARCHAR)) AS subj,
                 'rdf:type' AS pred, 'sem:Event' AS obj,
                 FALSE AS obj_is_literal, '' AS datatype FROM e
          UNION ALL
          SELECT concat('inst:ev', CAST(event_id AS VARCHAR)), 'sem:hasActor',
                 concat('usr:', CAST(user_id AS VARCHAR)), FALSE, '' FROM e
          UNION ALL
          SELECT concat('inst:ev', CAST(event_id AS VARCHAR)), 'rdfs:label',
                 event_type, TRUE, 'xsd:string' FROM e
          UNION ALL
          SELECT concat('inst:ev', CAST(event_id AS VARCHAR)), 'sem:hasTimeStamp',
                 CASE WHEN {_TS_IS_GYEAR.format(c='ts')}
                      THEN strftime(ts, '%Y')
                      ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END,
                 TRUE,
                 CASE WHEN {_TS_IS_GYEAR.format(c='ts')}
                      THEN 'xsd:gYear' ELSE 'xsd:dateTime' END FROM e
        )
"""


def _pagerank_sql(n_iters: int = 5, scale: int = 10**12) -> str:
    """Unrolled-CTE twin of operators/graph.pagerank over the symmetrized
    customer↔supplier graph: one (join + grouped integer-division sum) CTE
    per Lloyd-style synchronous iteration. All arithmetic is BIGINT with
    ``//``, matching Spark's ``div`` bit-for-bit on non-negative values —
    no float summation anywhere, so no rounding pin is needed."""
    base = f"(15 * ({scale} // (SELECT n_nodes FROM nn))) // 100"
    iters = ",\n".join(
        f"""
        r{i} AS (
          SELECT n.node,
                 CAST({base} + (85 * COALESCE(m.in_mass, 0)) // 100
                      AS BIGINT) AS rank_e12
          FROM nodes n LEFT JOIN (
            SELECT e.dst, SUM(r.rank_e12 // e.outdeg) AS in_mass
            FROM e JOIN r{i - 1} r ON r.node = e.src GROUP BY e.dst
          ) m ON m.dst = n.node
        )"""
        for i in range(1, n_iters + 1)
    )
    return f"""
        WITH pairs AS (
          SELECT DISTINCT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
                          concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (SELECT src, dst FROM pairs
                  UNION ALL
                  SELECT dst, src FROM pairs),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
                FROM edges GROUP BY src),
        e AS (SELECT edges.src, edges.dst, deg.outdeg
              FROM edges JOIN deg USING (src)),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM edges
                   UNION ALL SELECT dst FROM edges)),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes),
        r0 AS (SELECT node,
                      CAST({scale} // (SELECT n_nodes FROM nn) AS BIGINT)
                        AS rank_e12
               FROM nodes),
        {iters}
        SELECT node, rank_e12 FROM r{n_iters}
    """


ORACLES: dict[str, str] = {
    # ---- SURVEY §2 relational operators over the testdata tables ----------
    "a1_incident_grouping": """
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
               arg_max(event_type, event_id) AS last_type
        FROM events GROUP BY user_id
    """,
    "a2_dedup_window": """
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang, substr(text, 1, 40)
                                    ORDER BY doc_id DESC) AS rn
          FROM documents
        ) WHERE rn = 1
    """,
    "f2_ref_text_filter": """
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        WHERE length(text) BETWEEN 100 AND 400
          AND NOT regexp_matches(text, '[1-2][0-9]{3}-[1-2][0-9]{3}')
    """,
    "f3_language_completeness": """
        SELECT source,
               array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs_csv,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
        HAVING list_contains(list(DISTINCT lang), 'en') AND COUNT(DISTINCT lang) >= 4
    """,
    "j1_outer_merge": """
        WITH l AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
             r AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        SELECT COALESCE(l.user_id, r.user_id) AS user_id,
               concat_ws(',',
                 CASE WHEN l.user_id IS NOT NULL THEN 'purchase' END,
                 CASE WHEN r.user_id IS NOT NULL THEN 'error' END) AS found_by
        FROM l FULL OUTER JOIN r ON l.user_id = r.user_id
    """,
    "j2_dimension_join": """
        SELECT r_name AS region, n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "j7_interval_containment": """
        SELECT v.event_id AS view_id, c.event_id AS click_id
        FROM events v JOIN events c
          ON v.user_id = c.user_id
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
    "j10_transitive_closure": """
        WITH RECURSIVE edges AS (
          SELECT concat('n', CAST(n_nationkey AS VARCHAR)) AS child,
                 concat('r', CAST(n_regionkey AS VARCHAR)) AS parent FROM nation
          UNION ALL
          SELECT concat('r', CAST(r_regionkey AS VARCHAR)), 'root' FROM region
        ), anc AS (
          SELECT child AS node, parent AS ancestor FROM edges
          UNION
          SELECT a.node, e.parent FROM anc a JOIN edges e ON a.ancestor = e.child
        )
        SELECT node, ancestor FROM anc
    """,
    "j10_incident_ancestors": """
        WITH RECURSIVE
        types AS (SELECT DISTINCT event_type FROM events),
        e1 AS (SELECT event_type AS child,
                      'cat:' || substr(md5(event_type), 1, 1) AS parent
               FROM types),
        e2 AS (SELECT DISTINCT parent AS child, 'root' AS parent FROM e1),
        edges AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2),
        dts AS (SELECT DISTINCT user_id AS incident_id,
                                event_type AS direct_type FROM events),
        anc AS (
          SELECT direct_type AS node, direct_type AS ancestor
          FROM (SELECT DISTINCT direct_type FROM dts)
          UNION
          SELECT a.node, e.parent FROM anc a JOIN edges e ON e.child = a.ancestor
        ),
        rooted AS (SELECT DISTINCT node FROM anc WHERE ancestor = 'root')
        SELECT DISTINCT CAST(d.incident_id AS BIGINT) AS incident_id, a.ancestor
        FROM dts d
        JOIN anc a ON a.node = d.direct_type
        JOIN rooted r ON r.node = a.node
    """,
    "w1_stable_ordering": """
        SELECT user_id, CAST(rn AS BIGINT) AS rn, event_id FROM (
          SELECT user_id, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events
        ) WHERE rn <= 3
    """,
    "w5_sessionize": """
        SELECT user_id, event_id, CAST(session_seq AS BIGINT) AS session_seq FROM (
          SELECT user_id, event_id,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events)
        )
    """,
    "o3_top_types": """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
        ORDER BY n DESC, event_type LIMIT 10
    """,
    "a3_collection_stats": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(AVG(l_extendedprice), 2) AS avg_price,
               ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
               strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
               strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
        FROM lineitem GROUP BY l_returnflag
    """,
    "a3_full_stats": """
        WITH per_src AS (
          SELECT source, COUNT(*) AS n_docs,
                 array_to_string(list_sort(list(DISTINCT lang)), ',') AS langset,
                 COUNT(DISTINCT lang) AS n_langs
          FROM documents GROUP BY source),
        m AS (
          SELECT COUNT(DISTINCT source) AS num_incidents,
                 COUNT(*) AS num_texts,
                 CAST(SUM(CASE WHEN n_chars > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS num_with_content,
                 ROUND(AVG(n_chars), 6) AS mean_chars,
                 ROUND(VAR_SAMP(n_chars), 6) AS var_chars,
                 AVG(n_chars) AS mu, COUNT(*) AS n,
                 SUM(CAST(n_chars AS DOUBLE) * n_chars) AS s2,
                 SUM(CAST(n_chars AS DOUBLE) * n_chars * n_chars) AS s3,
                 SUM(CAST(n_chars AS DOUBLE) * n_chars * n_chars * n_chars) AS s4,
                 SUM(CAST(n_chars AS DOUBLE)) AS s1,
                 MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
          FROM documents),
        base AS (
          SELECT num_incidents, num_texts, num_with_content, mean_chars,
                 var_chars,
                 ROUND(((s3 - 3 * mu * s2 + 3 * mu * mu * s1 - n * mu * mu * mu) / n)
                       / POW((s2 - n * mu * mu) / n, 1.5), 6) AS skew_chars,
                 ROUND(((s4 - 4 * mu * s3 + 6 * mu * mu * s2
                          - 4 * mu * mu * mu * s1 + n * mu * mu * mu * mu) / n)
                       / POW((s2 - n * mu * mu) / n, 2) - 3, 6) AS kurt_chars,
                 min_chars, max_chars
          FROM m),
        langset_dist AS (
          SELECT string_agg(langset || '=' || CAST(cnt AS VARCHAR), '|'
                            ORDER BY cnt DESC, langset) AS langset_dist
          FROM (SELECT langset, COUNT(*) AS cnt FROM per_src GROUP BY langset)),
        numwiki_dist AS (
          SELECT string_agg(CAST(n_docs AS VARCHAR) || '=' || CAST(cnt AS VARCHAR),
                            '|' ORDER BY cnt DESC, CAST(n_docs AS VARCHAR))
                 AS numwiki_dist
          FROM (SELECT n_docs, COUNT(*) AS cnt FROM per_src GROUP BY n_docs)),
        top_langs AS (
          SELECT string_agg(lang || '=' || CAST(cnt AS VARCHAR), '|'
                            ORDER BY cnt DESC, lang) AS top_langs
          FROM (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
                ORDER BY cnt DESC, lang LIMIT 10)),
        found_by_dist AS (
          SELECT string_agg(found_by || '=' || CAST(cnt AS VARCHAR), '|'
                            ORDER BY cnt DESC, found_by) AS found_by_dist
          FROM (SELECT CASE doc_id % 3 WHEN 0 THEN 'SPARQL'
                       WHEN 1 THEN 'SPARQL|API' ELSE 'API' END AS found_by,
                       COUNT(*) AS cnt
                FROM documents GROUP BY 1)),
        all_info AS (
          SELECT CAST(SUM(CASE WHEN n_langs >= 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS all_info FROM per_src)
        SELECT * FROM base, langset_dist, numwiki_dist, top_langs,
                      found_by_dist, all_info
    """,
    "p1_scalar_chain": """
        SELECT p_partkey,
               regexp_replace(p_brand, 'Brand#', 'b:') AS brand_id,
               list_extract(string_split(p_type, ' '), -1) AS type_last,
               split_part(p_name, ' ', 1) AS name_first,
               upper(trim(p_brand)) AS brand_uc,
               concat(p_brand, ' | ', p_name) AS packed,
               split_part(concat(p_brand, ' | ', p_name), ' | ', 1) AS unpacked_uri
        FROM part
    """,
    "k4_inverted_index": """
        SELECT event_type,
               array_to_string(list_sort(list(DISTINCT user_id)), ',') AS user_ids_csv
        FROM events GROUP BY event_type
    """,
    "f1_first_section": """
        SELECT doc_id, trim(split_part(text, '.', 1)) AS first_sec FROM documents
    """,
    "f4_role_set_equality": """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv
        FROM events GROUP BY user_id
        HAVING array_to_string(list_sort(list(DISTINCT event_type)), ',')
               = 'click,error,purchase,signup,view'
    """,
    "f8_surviving_orders": """
        SELECT o_orderkey, o_orderstatus FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
    "o2_deterministic_limit": """
        SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 5
    """,
    "p5_dct_coalesce": """
        SELECT event_id,
               COALESCE(json_extract_string(props, '$.missing'),
                        strftime(ts, '%Y-%m-%d')) AS dct,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "j3_fanout_collect": """
        SELECT o.o_orderkey,
               string_agg(concat(CAST(l.l_linenumber AS VARCHAR), ':', l.l_returnflag),
                          ',' ORDER BY concat(CAST(l.l_linenumber AS VARCHAR), ':', l.l_returnflag)) AS items_csv
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey
    """,
    "j5_rewrite_union": """
        SELECT l_orderkey,
               array_to_string(
                 list_sort(list_distinct(list_append(list(DISTINCT l_returnflag), 'AIR'))),
                 ',') AS modes_csv
        FROM lineitem GROUP BY l_orderkey
    """,
    "j8_semi_join": """
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND year(o.o_orderdate) = 1995)
    """,
    "c2_url_encode": """
        SELECT p_partkey, replace(p_name, ' ', '+') AS enc FROM part
    """,
    "f5f6f7_crawl_filters": """
        SELECT doc_id,
               CASE
                 WHEN contains('http://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR), 'src7.example.org')
                   OR contains('http://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR), 'src13.example.org')
                   THEN 'excluded domain'
                 WHEN NOT starts_with('http://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR), 'http')
                   THEN 'not a valid url'
                 WHEN contains(
                     CASE WHEN length(text) - length(replace(text, ' ', '')) >= 3
                          THEN array_to_string((string_split(text, ' '))[1:3], ' ')
                          ELSE text END, 'q')
                   THEN 'illegal char in title'
                 WHEN length(text) NOT BETWEEN 100 AND 499
                   THEN 'outside of accepted number of characters range'
                 WHEN contains(text, 'slow fast table')
                   THEN 'illegal substring'
                 WHEN lang NOT IN ('en', 'es', 'de')
                   THEN 'not in accepted languages'
                 ELSE 'succes'
               END AS status
        FROM documents
    """,
    "a9_crawl_status_tally": """
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT CASE
                 WHEN contains('http://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR), 'src7.example.org')
                   OR contains('http://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR), 'src13.example.org')
                   THEN 'excluded domain'
                 WHEN NOT starts_with('http://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR), 'http')
                   THEN 'not a valid url'
                 WHEN contains(
                     CASE WHEN length(text) - length(replace(text, ' ', '')) >= 3
                          THEN array_to_string((string_split(text, ' '))[1:3], ' ')
                          ELSE text END, 'q')
                   THEN 'illegal char in title'
                 WHEN length(text) NOT BETWEEN 100 AND 499
                   THEN 'outside of accepted number of characters range'
                 WHEN contains(text, 'slow fast table')
                   THEN 'illegal substring'
                 WHEN lang NOT IN ('en', 'es', 'de')
                   THEN 'not in accepted languages'
                 ELSE 'succes'
               END AS status
          FROM documents
        ) GROUP BY status
    """,
    "canonicalize_components": f"""
        WITH RECURSIVE {_MINHASH_BANDS},
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_sig = b.band_sig
           AND a.doc_id < b.doc_id),
        cand_lang AS (
          SELECT c.a_id, c.b_id FROM cand c
          JOIN documents da ON da.doc_id = c.a_id
          JOIN documents db ON db.doc_id = c.b_id
          WHERE da.lang = db.lang),
        lang_tokens AS (
          SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
          ) WHERE token <> ''),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM lang_tokens GROUP BY doc_id),
        shared AS (
          SELECT c.a_id, c.b_id, COUNT(*) AS shared
          FROM cand_lang c
          JOIN lang_tokens ta ON ta.doc_id = c.a_id
          JOIN lang_tokens tb ON tb.doc_id = c.b_id AND tb.token = ta.token
          GROUP BY c.a_id, c.b_id),
        pairs AS (
          SELECT a_id, b_id FROM shared
          JOIN sizes sa ON sa.doc_id = a_id
          JOIN sizes sb ON sb.doc_id = b_id
          WHERE shared / (sa.n + sb.n - shared) >= 0.9),
        sym AS (SELECT a_id AS v, b_id AS w FROM pairs
                UNION SELECT b_id, a_id FROM pairs),
        reach AS (
          SELECT v, v AS r FROM (SELECT DISTINCT v FROM sym)
          UNION
          SELECT s.v, rr.r FROM sym s JOIN reach rr ON s.w = rr.v)
        SELECT CAST(v AS BIGINT) AS vertex, CAST(MIN(r) AS BIGINT) AS component
        FROM reach GROUP BY v
    """,
    "w4_sequential_match": """
        WITH RECURSIVE ev AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
        step AS (
          SELECT user_id, 0 AS rn, 0 AS pos, 0 AS matches
          FROM (SELECT DISTINCT user_id FROM ev)
          UNION ALL
          SELECT e.user_id, e.rn,
                 CASE WHEN e.event_type = (['view','click','purchase'])[s.pos + 1]
                      THEN CASE WHEN s.pos = 2 THEN 0 ELSE s.pos + 1 END
                      ELSE s.pos END,
                 s.matches + CASE WHEN s.pos = 2 AND e.event_type = 'purchase'
                                  THEN 1 ELSE 0 END
          FROM step s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(MAX(matches) AS BIGINT) AS n_matches
        FROM step GROUP BY user_id
    """,
    "triples_events": _TRIPLES_EVENTS_SQL,
    # SPARQL BGP over the same triple store: each tr alias is one triple
    # pattern; constants are WHERE terms, shared variables are join
    # predicates — exactly what operators/bgp.bgp_match compiles.
    "sparql_bgp": f"""
        WITH tr AS ({_TRIPLES_EVENTS_SQL}),
        req AS (
          SELECT p2.obj AS actor, p3.obj AS etime, p1.subj AS ev,
                 p4.subj AS s
          FROM tr p1
          JOIN tr p2 ON p2.pred = 'sem:hasActor' AND p2.subj = p1.subj
          JOIN tr p3 ON p3.pred = 'sem:hasTimeStamp' AND p3.subj = p1.subj
          JOIN tr p4 ON p4.pred = 'rdfs:label' AND p4.obj = 'signup'
          JOIN tr p5 ON p5.pred = 'sem:hasActor' AND p5.subj = p4.subj
                     AND p5.obj = p2.obj
          WHERE p1.pred = 'rdfs:label' AND p1.obj = 'error'
            AND p3.obj >= '2024-01-20'),
        opt AS (
          -- the ptime filter lives HERE (inside the optional group), not
          -- in the outer query: SPARQL FILTER-inside-OPTIONAL scoping
          SELECT p7.obj AS actor, p6.subj AS ev2, p8.obj AS ptime
          FROM tr p6
          JOIN tr p7 ON p7.pred = 'sem:hasActor' AND p7.subj = p6.subj
          JOIN tr p8 ON p8.pred = 'sem:hasTimeStamp' AND p8.subj = p6.subj
          WHERE p6.pred = 'rdfs:label' AND p6.obj = 'purchase'
            AND p8.obj >= '2024-01-28')
        SELECT req.actor, req.etime, req.ev, opt.ev2, opt.ptime, req.s
        FROM req LEFT JOIN opt ON opt.actor = req.actor
    """,
    "graph_pagerank": _pagerank_sql(),
    "asof_join_events": """
        WITH v AS (SELECT event_id AS view_id, user_id,
                          epoch_us(ts) AS view_us
                   FROM events WHERE event_type = 'view'),
        p AS (SELECT event_id AS purchase_id, user_id,
                     epoch_us(ts) AS purchase_us
              FROM events WHERE event_type = 'purchase'),
        j AS (
          SELECT p.purchase_id, p.user_id, p.purchase_us,
                 v.view_id, v.view_us,
                 ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                    ORDER BY v.view_us DESC,
                                             v.view_id DESC) AS rn
          FROM p LEFT JOIN v
            ON v.user_id = p.user_id AND v.view_us <= p.purchase_us)
        SELECT purchase_id, user_id, purchase_us, view_id, view_us,
               purchase_us - view_us AS gap_us
        FROM j WHERE rn = 1
    """,
    "participant_triples": f"""
        WITH e AS (SELECT event_id, user_id, event_type, ts FROM events
                   WHERE event_type = 'signup'),
        s AS (SELECT *, concat('wd:Q', CAST(user_id AS VARCHAR), '_E',
                               CAST(event_id AS VARCHAR)) AS subj FROM e)
        SELECT subj, pred, obj, obj_is_literal, datatype FROM (
          SELECT subj, 'sem:hasActor' AS pred,
                 concat('wd:Q', CAST(user_id AS VARCHAR)) AS obj,
                 FALSE AS obj_is_literal, '' AS datatype FROM s
          UNION ALL
          SELECT subj, 'rdf:type',
                 concat('wiki:E', CAST(event_id AS VARCHAR)), FALSE, '' FROM s
          UNION ALL
          SELECT subj, 'rdf:type', 'sem:Event', FALSE, '' FROM s
          UNION ALL
          SELECT subj, 'sem:eventType', concat('wiki:', event_type),
                 FALSE, '' FROM s
          UNION ALL
          SELECT subj, 'rdfs:label',
                 concat(CAST(user_id AS VARCHAR), ' ', event_type),
                 TRUE, '' FROM s
          UNION ALL
          SELECT subj, 'sem:hasTimeStamp',
                 CASE WHEN {_TS_IS_GYEAR.format(c='ts')}
                      THEN strftime(ts, '%Y')
                      ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END,
                 TRUE,
                 CASE WHEN {_TS_IS_GYEAR.format(c='ts')}
                      THEN 'xsd:gYear' ELSE 'xsd:dateTime' END FROM s
        )
    """,
    # ---- training-data-pipeline operators ---------------------------------
    "dedup_exact": """
        SELECT md5(text) AS content_hash,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_minhash_pairs": f"""
        WITH {_MINHASH_BANDS},
        pairs AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs FROM pairs
    """,
    "dedup_simhash_pairs": f"""
        WITH {_SIMHASH}
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "knn_cosine": f"""
        WITH {_EMB},
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ROUND({_COS}, 6) AS sim
          FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
        SELECT query_id, neighbor_id, sim FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM pairs
        ) WHERE rn <= 5
    """,
    "ann_multiprobe": f"""
        WITH {_EMB},
        b AS (SELECT vec_id, v, {_BUCKET_MP} AS bucket FROM e),
        probes AS (
          SELECT vec_id, v, p.probe
          FROM b, UNNEST([bucket, xor(bucket, 1), xor(bucket, 2),
                          xor(bucket, 4)]) AS p(probe)
          WHERE vec_id < 50),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ROUND({_COS}, 6) AS sim
          FROM probes q JOIN b c ON q.probe = c.bucket AND q.vec_id <> c.vec_id)
        SELECT query_id, neighbor_id, sim FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM pairs
        ) WHERE rn <= 3
    """,
    "ann_ivf": _ivf_sql(),

    "lang_id_profile": """
        WITH padded AS (
          SELECT doc_id, concat(' ', text, ' ') AS p FROM documents),
        s AS (
          SELECT doc_id,
            (CASE WHEN p LIKE '% the %' THEN 1 ELSE 0 END
             + CASE WHEN p LIKE '% a %' THEN 1 ELSE 0 END
             + CASE WHEN p LIKE '% of %' THEN 1 ELSE 0 END) AS s_en,
            (CASE WHEN p LIKE '% query %' THEN 1 ELSE 0 END
             + CASE WHEN p LIKE '% join %' THEN 1 ELSE 0 END
             + CASE WHEN p LIKE '% table %' THEN 1 ELSE 0 END) AS s_query,
            (CASE WHEN p LIKE '% stream %' THEN 1 ELSE 0 END
             + CASE WHEN p LIKE '% batch %' THEN 1 ELSE 0 END
             + CASE WHEN p LIKE '% window %' THEN 1 ELSE 0 END) AS s_stream
          FROM padded)
        SELECT doc_id,
               CASE WHEN s_en >= s_query AND s_en >= s_stream THEN 'en'
                    WHEN s_query >= s_stream THEN 'query'
                    ELSE 'stream' END AS pred_profile,
               CAST(s_en AS BIGINT) AS s_en,
               CAST(s_query AS BIGINT) AS s_query,
               CAST(s_stream AS BIGINT) AS s_stream
        FROM s
    """,
    "quality_score": """
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) AS avg_len,
                 len(list_filter(toks, x -> list_contains(['the','a','of','in'], x))) * 1.0
                   / len(toks) AS stop_ratio
          FROM t)
        SELECT doc_id, n_tokens,
               ROUND(avg_len, 4) AS avg_token_len,
               ROUND(stop_ratio, 4) AS stopword_ratio,
               ROUND(0.4 * least(n_tokens / 100.0, 1.0)
                     + 0.3 * stop_ratio
                     + 0.3 * least(avg_len / 8.0, 1.0), 4) AS quality
        FROM m
    """,
    "fingerprint": """
        WITH t AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
          FROM documents),
        sh AS (
          SELECT doc_id,
                 COUNT(DISTINCT md5(concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS n_sh
          FROM t, (SELECT unnest(range(1, 2000)) AS i) idx
          WHERE i + 2 <= len(toks)
          GROUP BY doc_id)
        SELECT t.doc_id,
               md5(array_to_string(toks, ' ')) AS fp,
               CAST(COALESCE(sh.n_sh, 0) AS BIGINT) AS n_distinct_shingles
        FROM t LEFT JOIN sh ON t.doc_id = sh.doc_id
    """,
    "multimodal_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
        FROM documents
    """,
    # frame sampling: stride 256, window 64; the corpus text is pure ASCII
    # (verified), so character substr == byte slicing and md5 agrees with
    # the kernel's byte-window fingerprint
    "multimodal_frames": """
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(g.idx AS BIGINT) AS frame_idx,
               CAST(length(substr(text, 1 + CAST(g.idx AS INT) * 256, 64)) AS BIGINT)
                 AS frame_bytes,
               md5(substr(text, 1 + CAST(g.idx AS INT) * 256, 64)) AS frame_md5
        FROM documents,
             LATERAL (SELECT unnest(range(CAST(ceil(length(text) / 256.0) AS INT)))
                      AS idx) g
    """,
    "mention_link_rank": """
        WITH toks AS (
          SELECT doc_id, source,
                 CAST(g.i AS BIGINT) AS pos,
                 string_split(text, ' ')[g.i + 1] AS w
          FROM documents,
               LATERAL (SELECT unnest(range(len(string_split(text, ' '))))
                        AS i) g
        ),
        bigrams AS (
          SELECT doc_id, source, pos, w || ' ' || w2 AS surface FROM (
            SELECT doc_id, source, pos, w,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks
          ) WHERE w2 IS NOT NULL
        ),
        kb AS (SELECT DISTINCT surface, source, doc_id FROM bigrams
               WHERE doc_id % 7 = 0),
        df_src AS (SELECT surface, source, COUNT(*) AS df_src FROM kb
                   GROUP BY surface, source),
        df_all AS (SELECT surface, COUNT(*) AS df_all FROM kb GROUP BY surface),
        gaz AS (
          SELECT s.surface, s.source AS cand,
                 ROUND(s.df_src / a.df_all, 6) AS prior
          FROM df_src s JOIN df_all a ON a.surface = s.surface)
        SELECT doc_id, pos, surface, cand, prior, rank FROM (
          SELECT b.doc_id, b.pos, b.surface, g.cand, g.prior,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY b.doc_id, b.pos
                   ORDER BY g.prior DESC, g.cand) AS BIGINT) AS rank
          FROM bigrams b JOIN gaz g ON g.surface = b.surface
        ) WHERE rank <= 2
    """,
}

# Oracles for catalog.EXTRA_QUERIES — entries rotated out of the driver's
# 50-row correctness window (rotation rationale per entry lives at
# catalog.EXTRA_QUERIES) but still hash-checked by the CI full-catalog
# gate (tools/check_oracle.run_checks unions these in).
def _lpa_sql(n_iters: int = 3) -> str:
    """Unrolled-CTE twin of operators/graph.label_propagation over the
    symmetrized customer↔supplier graph: per round, count in-neighbor
    labels and keep the (cnt DESC, label ASC) winner per node — the same
    pinned tie-break the Spark struct-min argmin implements."""
    rounds = ",\n".join(
        f"""
        l{i} AS (
          SELECT node, label FROM (
            SELECT e.dst AS node, l.label, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY e.dst
                                      ORDER BY COUNT(*) DESC, l.label) AS rn
            FROM edges e JOIN l{i - 1} l ON l.node = e.src
            GROUP BY e.dst, l.label
          ) WHERE rn = 1
        )"""
        for i in range(1, n_iters + 1)
    )
    return f"""
        WITH pairs AS (
          SELECT DISTINCT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
                          concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (SELECT DISTINCT src, dst FROM
                  (SELECT src, dst FROM pairs
                   UNION ALL
                   SELECT dst, src FROM pairs)),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
        {rounds}
        SELECT node, label FROM l{n_iters}
    """


def _bfs_sql(n_rounds: int = 4, source: str = "c1") -> str:
    """Unrolled-CTE twin of operators/graph.bfs_distances: per round,
    union the current distances with every in-neighbor's dist+1 and keep
    the min per node — the same full relaxation the Spark rounds run."""
    rounds = ",\n".join(
        f"""
        d{i} AS (
          SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d{i - 1}
            UNION ALL
            SELECT e.dst AS node, d.dist + 1 AS dist
            FROM edges e JOIN d{i - 1} d ON d.node = e.src
          ) GROUP BY node
        )"""
        for i in range(1, n_rounds + 1)
    )
    return f"""
        WITH pairs AS (
          SELECT DISTINCT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
                          concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (SELECT DISTINCT src, dst FROM
                  (SELECT src, dst FROM pairs
                   UNION ALL
                   SELECT dst, src FROM pairs)),
        d0 AS (SELECT '{source}' AS node, CAST(0 AS BIGINT) AS dist),
        {rounds}
        SELECT node, dist FROM d{n_rounds}
    """


EXTRA_ORACLES: dict[str, str] = {
    "graph_lpa": _lpa_sql(),
    "graph_bfs": _bfs_sql(),
    # UNION ALL twin of bgp_union: branch 2 binds no timestamp pattern, so
    # ?etime is SPARQL-unbound there — a typed NULL column in SQL
    # MINUS twin: LEFT ANTI on the shared ?actor variable
    "sparql_minus": f"""
        WITH tr AS ({_TRIPLES_EVENTS_SQL}),
        err AS (
          SELECT p2.obj AS actor, p1.subj AS ev
          FROM tr p1
          JOIN tr p2 ON p2.pred = 'sem:hasActor' AND p2.subj = p1.subj
          WHERE p1.pred = 'rdfs:label' AND p1.obj = 'error'),
        signup AS (
          SELECT p4.obj AS actor
          FROM tr p3
          JOIN tr p4 ON p4.pred = 'sem:hasActor' AND p4.subj = p3.subj
          JOIN tr p5 ON p5.pred = 'sem:hasTimeStamp' AND p5.subj = p3.subj
          WHERE p3.pred = 'rdfs:label' AND p3.obj = 'signup'
            AND p5.obj < '2024-01-03')
        SELECT actor, ev FROM err ANTI JOIN signup USING (actor)
    """,
    # GROUP BY twin: count skips nothing here (ev never null in the
    # required pattern), HAVING filters groups post-agg
    "sparql_agg": f"""
        WITH tr AS ({_TRIPLES_EVENTS_SQL})
        SELECT p2.obj AS actor,
               CAST(COUNT(p1.subj) AS BIGINT) AS n_errors,
               MAX(p3.obj) AS latest
        FROM tr p1
        JOIN tr p2 ON p2.pred = 'sem:hasActor' AND p2.subj = p1.subj
        JOIN tr p3 ON p3.pred = 'sem:hasTimeStamp' AND p3.subj = p1.subj
        WHERE p1.pred = 'rdfs:label' AND p1.obj = 'error'
        GROUP BY p2.obj
        HAVING COUNT(p1.subj) >= 2
    """,
    # CONSTRUCT twin: same error+actor+time join, each template triple a
    # UNION branch, DISTINCT for RDF-graph set semantics
    "sparql_construct": f"""
        WITH tr AS ({_TRIPLES_EVENTS_SQL}),
        sol AS (
          SELECT p2.obj AS actor, p1.subj AS ev
          FROM tr p1
          JOIN tr p2 ON p2.pred = 'sem:hasActor' AND p2.subj = p1.subj
          JOIN tr p3 ON p3.pred = 'sem:hasTimeStamp' AND p3.subj = p1.subj
          WHERE p1.pred = 'rdfs:label' AND p1.obj = 'error'
            AND p3.obj >= '2024-01-20')
        SELECT DISTINCT subj, pred, obj FROM (
          SELECT actor AS subj, 'ex:flagged' AS pred, ev AS obj FROM sol
          UNION ALL
          SELECT ev AS subj, 'ex:status' AS pred, 'error' AS obj FROM sol)
    """,
    "sparql_union": f"""
        WITH tr AS ({_TRIPLES_EVENTS_SQL})
        SELECT p2.obj AS actor, p3.obj AS etime, p1.subj AS ev
        FROM tr p1
        JOIN tr p2 ON p2.pred = 'sem:hasActor' AND p2.subj = p1.subj
        JOIN tr p3 ON p3.pred = 'sem:hasTimeStamp' AND p3.subj = p1.subj
        WHERE p1.pred = 'rdfs:label' AND p1.obj = 'error'
          AND p3.obj >= '2024-01-30'
        UNION ALL
        SELECT p2.obj AS actor, CAST(NULL AS VARCHAR) AS etime,
               p1.subj AS ev
        FROM tr p1
        JOIN tr p2 ON p2.pred = 'sem:hasActor' AND p2.subj = p1.subj
        WHERE p1.pred = 'rdfs:label' AND p1.obj = 'signup'
    """,
    # expressive-SPARQL twin: the { SELECT ... } subquery is the sgn CTE,
    # BIND is a projected expression, GROUP_CONCAT's sorted collect_list
    # join is string_agg ORDER BY, SAMPLE's deterministic min is MIN
    "sparql_expressive": f"""
        WITH tr AS ({_TRIPLES_EVENTS_SQL}),
        err AS (
          SELECT p1.subj AS ev, p2.obj AS actor, p3.obj AS etime
          FROM tr p1
          JOIN tr p2 ON p2.pred = 'sem:hasActor' AND p2.subj = p1.subj
          JOIN tr p3 ON p3.pred = 'sem:hasTimeStamp' AND p3.subj = p1.subj
          WHERE p1.pred = 'rdfs:label' AND p1.obj = 'error'),
        sgn AS (
          SELECT p5.obj AS actor, CAST(COUNT(p4.subj) AS BIGINT) AS nsign
          FROM tr p4
          JOIN tr p5 ON p5.pred = 'sem:hasActor' AND p5.subj = p4.subj
          WHERE p4.pred = 'rdfs:label' AND p4.obj = 'signup'
          GROUP BY p5.obj),
        sol AS (
          SELECT e.actor, s.nsign, upper(e.actor) || '!' AS label,
                 e.etime, e.ev
          FROM err e JOIN sgn s USING (actor)
          WHERE s.nsign >= 1 AND starts_with(e.actor, 'usr:'))
        SELECT actor, nsign, label,
               string_agg(etime, ',' ORDER BY etime) AS times,
               MIN(ev) AS anyev
        FROM sol GROUP BY actor, nsign, label
    """,
    "dedup_minhash_sig": f"""
        WITH {_MINHASH_BANDS}
        SELECT doc_id, band, band_sig FROM bands
    """,
    "dedup_simhash": f"""
        WITH {_SIMHASH}
        SELECT doc_id, simhash FROM sh
    """,
    "token_count": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens,
               CAST(length(text) // 4 AS BIGINT) AS approx_bpe
        FROM documents
    """,
    "ann_lsh_bucketed": f"""
        WITH {_EMB},
        b AS (SELECT vec_id, v, {_BUCKET} AS bucket FROM e),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 CAST(q.bucket AS BIGINT) AS bucket,
                 ROUND({_COS}, 6) AS sim
          FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
          WHERE q.vec_id < 50)
        SELECT query_id, neighbor_id, bucket, sim FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM pairs
        ) WHERE rn <= 3
    """,
    # Raw-RGB nearest-neighbor resize, byte-exact: the 16x12 payload is
    # md5(text) hexdigest ASCII repeated to 576 bytes, so VARCHAR substr
    # arithmetic IS byte arithmetic. Half-pixel convention mirrors
    # operators/multimodal.resize_images: src = min(floor((dst+0.5)*s), n-1)
    # with s_y = 12/8 = 1.5, s_x = 16/8 = 2.0; 3 chars per pixel,
    # row-major gather, md5 over the reassembled 192-char payload.
    "multimodal_resize": """
        WITH pat AS (
          SELECT doc_id, substr(repeat(md5(text), 18), 1, 576) AS p
          FROM documents
        ),
        px AS (
          SELECT doc_id, ty.i AS ty, tx.i AS tx,
                 substr(p,
                        (LEAST(CAST(floor((ty.i + 0.5) * 1.5) AS INT), 11) * 16
                         + LEAST(CAST(floor((tx.i + 0.5) * 2.0) AS INT), 15)) * 3
                        + 1,
                        3) AS px
          FROM pat,
               LATERAL (SELECT unnest(range(8)) AS i) ty,
               LATERAL (SELECT unnest(range(8)) AS i) tx
        )
        SELECT doc_id,
               CAST(8 AS INT) AS width,
               CAST(8 AS INT) AS height,
               md5(string_agg(px, '' ORDER BY ty, tx)) AS payload_md5
        FROM px GROUP BY doc_id
    """,
}

# the text front-end (catalog.sparql_text) parses the query STRING form
# of sparql_bgp and must compile to the identical solution set — its
# oracle is sparql_bgp's verbatim
EXTRA_ORACLES["sparql_text"] = ORACLES["sparql_bgp"]

# BM25 top-k: the SQL twin is GENERATED from the same query-term list the
# Spark entry uses, so idf/tf term order (and thus float-sum order)
# matches by construction — only parallel-sum avgdl can differ, below the
# 6-dp rounding.
from .operators.retrieval import bm25_topk_sql as _bm25_sql  # noqa: E402
from .catalog import BM25_QUERY as _BM25_QUERY  # noqa: E402

EXTRA_ORACLES["bm25_rank"] = _bm25_sql(_BM25_QUERY, k=20)

# RRF hybrid: BM25 top-50 + quality-prior top-50 fused by reciprocal
# rank (ranks from row_number with the same desc-score, asc-id
# tie-break as the Spark windows)
EXTRA_ORACLES["rrf_hybrid_rank"] = f"""
    WITH bm AS (SELECT doc_id, score FROM ({_bm25_sql(_BM25_QUERY, k=50)})),
    r1 AS (SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
           FROM bm),
    qs AS (SELECT doc_id, quality FROM ({ORACLES["quality_score"]})
           ORDER BY quality DESC, doc_id LIMIT 50),
    r2 AS (SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id) AS r
           FROM qs),
    u AS (SELECT doc_id, r FROM r1 UNION ALL SELECT doc_id, r FROM r2)
    SELECT doc_id, ROUND(SUM(1.0 / (60 + r)), 9) AS rrf,
           CAST(COUNT(*) AS BIGINT) AS n_systems
    FROM u GROUP BY doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT 20
"""

# DESCRIBE ?actor WHERE: two SEMI joins (subject/object hits) + set
# dedup — the mirror of bgp_describe_solutions' plan
EXTRA_ORACLES["sparql_describe"] = f"""
    WITH tr AS ({_TRIPLES_EVENTS_SQL}),
    res AS (
      SELECT DISTINCT p2.obj AS r
      FROM tr p1
      JOIN tr p2 ON p2.pred = 'sem:hasActor' AND p2.subj = p1.subj
      WHERE p1.pred = 'rdfs:label' AND p1.obj = 'error'),
    hits AS (
      SELECT t.subj, t.pred, t.obj FROM tr t
      SEMI JOIN res ON t.subj = res.r
      UNION ALL
      SELECT t.subj, t.pred, t.obj FROM tr t
      SEMI JOIN res ON t.obj = res.r)
    SELECT DISTINCT subj, pred, obj FROM hits
"""

# SPARQL Update mirror: DELETE/INSERT WHERE both instantiate from the
# PRE-op graph (sol), delete applies first; set-semantic insert adds
# only triples absent from the post-delete graph; the second op adds
# its marker row iff absent.
EXTRA_ORACLES["sparql_update_rewrite"] = f"""
    WITH tr AS ({_TRIPLES_EVENTS_SQL}),
    sol AS (
      SELECT p2.subj AS ev, p2.obj AS a
      FROM tr p1
      JOIN tr p2 ON p2.pred = 'sem:hasActor' AND p2.subj = p1.subj
      WHERE p1.pred = 'rdfs:label' AND p1.obj = 'error'),
    dels AS (SELECT DISTINCT ev AS subj, 'sem:hasActor' AS pred,
                    a AS obj FROM sol),
    ins AS (SELECT DISTINCT ev AS subj, 'sem:agent' AS pred,
                   a AS obj FROM sol),
    after_del AS (
      SELECT t.subj, t.pred, t.obj FROM tr t
      ANTI JOIN dels d ON t.subj = d.subj AND t.pred = d.pred
                      AND t.obj = d.obj),
    op1 AS (
      SELECT subj, pred, obj FROM after_del
      UNION ALL
      SELECT i.subj, i.pred, i.obj FROM ins i
      WHERE NOT EXISTS (
        SELECT 1 FROM after_del x
        WHERE x.subj = i.subj AND x.pred = i.pred AND x.obj = i.obj)),
    op2 AS (
      SELECT subj, pred, obj FROM op1
      UNION ALL
      SELECT 'coll:events' AS subj, 'rdfs:label' AS pred,
             'migrated' AS obj
      WHERE NOT EXISTS (
        SELECT 1 FROM op1 x
        WHERE x.subj = 'coll:events' AND x.pred = 'rdfs:label'
          AND x.obj = 'migrated'))
    SELECT subj, pred, obj FROM op2
"""


def _sssp_sql(n_rounds: int = 4, source: str = "c1") -> str:
    """Unrolled-CTE twin of operators/graph.sssp_distances: per round,
    union current distances with every in-neighbor's dist + edge weight
    and keep the min per node. Weights are BIGINT (FLOOR mirrors Spark's
    truncating cast on the non-negative quantities), so the relaxation
    is bit-exact."""
    rounds = ",\n".join(
        f"""
        d{i} AS (
          SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d{i - 1}
            UNION ALL
            SELECT e.dst AS node, d.dist + e.w AS dist
            FROM edges e JOIN d{i - 1} d ON d.node = e.src
          ) GROUP BY node
        )"""
        for i in range(1, n_rounds + 1)
    )
    return f"""
        WITH pairs AS (
          SELECT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
                 concat('s', CAST(l_suppkey AS VARCHAR)) AS dst,
                 CAST(FLOOR(l_quantity) AS BIGINT) AS w
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        sym AS (SELECT src, dst, w FROM pairs
                UNION ALL
                SELECT dst AS src, src AS dst, w FROM pairs),
        edges AS (SELECT src, dst, MIN(w) AS w FROM sym
                  GROUP BY src, dst),
        d0 AS (SELECT '{source}' AS node, CAST(0 AS BIGINT) AS dist),
        {rounds}
        SELECT node, dist FROM d{n_rounds}
    """


EXTRA_ORACLES["graph_sssp"] = _sssp_sql()

# Degree-ordered triangle counting over the capped same-order-date
# customer co-occurrence graph — all BIGINT/comparisons, so the mirror
# is bit-exact. Orientation: each edge directed from its (degree, id)-
# smaller endpoint; a triangle is counted once as x->y1, x->y2, y1->y2.
EXTRA_ORACLES["graph_triangles"] = """
    WITH dc AS (
      SELECT DISTINCT CAST(o_orderdate AS DATE) AS d, o_custkey AS c
      FROM orders),
    cap AS (
      SELECT d, c FROM (
        SELECT d, c, ROW_NUMBER() OVER (PARTITION BY d ORDER BY c) AS rn
        FROM dc) WHERE rn <= 12),
    e AS (
      SELECT DISTINCT l.c AS a, r.c AS b
      FROM cap l JOIN cap r ON l.d = r.d AND l.c < r.c),
    deg AS (
      SELECT n, COUNT(*) AS dg FROM (
        SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e) GROUP BY n),
    o AS (
      SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
                  THEN a ELSE b END AS x,
             CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
                  THEN b ELSE a END AS y,
             CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
                  THEN db.dg ELSE da.dg END AS yd
      FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
    tri AS (
      SELECT e1.x AS x, e1.y AS y1, e2.y AS y2
      FROM o e1
      JOIN o e2 ON e1.x = e2.x
        AND (e1.yd < e2.yd OR (e1.yd = e2.yd AND e1.y < e2.y))
      JOIN o e3 ON e3.x = e1.y AND e3.y = e2.y)
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y1 FROM tri
      UNION ALL SELECT y2 FROM tri)
    GROUP BY node
"""


def _kcore_sql(k: int, n_rounds: int = 4) -> str:
    """Unrolled-CTE twin of operators/graph.kcore_nodes over the
    triangles' hub-capped co-occurrence graph: per round, survivors are
    the nodes with symmetric degree >= k, and the edge set is restricted
    to survivor-survivor edges. Pure integer counts — bit-exact."""
    rounds = ",\n".join(
        f"""
        n{i} AS (
          SELECT src AS node FROM e{i - 1}
          GROUP BY src HAVING COUNT(*) >= {k}),
        e{i} AS (
          SELECT e.src, e.dst FROM e{i - 1} e
          JOIN n{i} a ON e.src = a.node
          JOIN n{i} b ON e.dst = b.node)"""
        for i in range(1, n_rounds + 1)
    )
    return f"""
        WITH dc AS (
          SELECT DISTINCT CAST(o_orderdate AS DATE) AS d, o_custkey AS c
          FROM orders),
        cap AS (
          SELECT d, c FROM (
            SELECT d, c, ROW_NUMBER() OVER (PARTITION BY d ORDER BY c) AS rn
            FROM dc) WHERE rn <= 12),
        und AS (
          SELECT DISTINCT l.c AS a, r.c AS b
          FROM cap l JOIN cap r ON l.d = r.d AND l.c < r.c),
        e0 AS (SELECT a AS src, b AS dst FROM und
               UNION ALL
               SELECT b AS src, a AS dst FROM und),
        {rounds}
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM e{n_rounds} GROUP BY src
    """


EXTRA_ORACLES["graph_kcore"] = _kcore_sql(k=3, n_rounds=4)

# render∘parse identity: the round-trip entry must hash-match the plain
# triple emitter
EXTRA_ORACLES["ntriples_roundtrip"] = ORACLES["triples_events"]

# named graphs: GRAPH ?g binds the per-event-type graph name; the
# default-graph label pattern joins on the actor. Bag semantics = one
# row per (event x its label row); labels are distinct per user.
EXTRA_ORACLES["sparql_graph"] = """
    WITH ev AS (
      SELECT concat('graph:', event_type) AS g,
             concat('inst:ev', CAST(event_id AS VARCHAR)) AS e,
             concat('usr:', CAST(user_id AS VARCHAR)) AS u
      FROM events),
    lab AS (
      SELECT DISTINCT concat('usr:', CAST(user_id AS VARCHAR)) AS u,
             concat('user ', CAST(user_id AS VARCHAR)) AS name
      FROM events)
    SELECT ev.e AS e, ev.g AS g, lab.name AS name, ev.u AS u
    FROM ev JOIN lab ON ev.u = lab.u
"""
EXTRA_ORACLES["sparql_graph_text"] = EXTRA_ORACLES["sparql_graph"]

# int8 scalar quantization: one float divide + ties-away round per
# element, then all-integer (qnorm exact BIGINT)
EXTRA_ORACLES["embed_quantize"] = f"""
        WITH {_EMB},
        m AS (SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x))) AS mx
              FROM e),
        qz AS (SELECT vec_id, ROUND(mx / 127.0, 9) AS scale,
                      list_transform(v, x -> CASE WHEN mx = 0 THEN 0
                        ELSE CAST(round(x * 127.0 / mx) AS INTEGER) END)
                        AS qvec
               FROM m)
        SELECT vec_id, scale, qvec,
               CAST(list_sum(list_transform(qvec,
                    y -> CAST(y AS BIGINT) * y)) AS BIGINT) AS qnorm
        FROM qz
"""

# quantized-space cosine: integer dots (exact in double), scales
# cancel, only sqrt/divide/round is float
EXTRA_ORACLES["ann_quantized"] = f"""
        WITH {_EMB},
        m AS (SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x))) AS mx
              FROM e),
        qz AS (SELECT vec_id,
                      list_transform(v, x -> CASE WHEN mx = 0 THEN 0
                        ELSE CAST(round(x * 127.0 / mx) AS INTEGER) END)
                        AS qv
               FROM m),
        n AS (SELECT vec_id, qv,
                     CAST(list_sum(list_transform(qv,
                          y -> CAST(y AS BIGINT) * y)) AS BIGINT) AS qn
              FROM qz
              WHERE list_sum(list_transform(qv,
                    y -> CAST(y AS BIGINT) * y)) > 0),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ROUND(list_dot_product(CAST(q.qv AS DOUBLE[]),
                                        CAST(c.qv AS DOUBLE[]))
                       / sqrt(CAST(q.qn AS DOUBLE) * c.qn), 6) AS sim
          FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
        SELECT query_id, neighbor_id, sim FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM pairs
        ) WHERE rn <= 5
"""

# N-Quads render-parse identity over the same quad store: every quad,
# with default-graph label rows re-tagged by the parser
EXTRA_ORACLES["nquads_roundtrip"] = """
    WITH ev AS (
      SELECT concat('graph:', event_type) AS g,
             concat('inst:ev', CAST(event_id AS VARCHAR)) AS subj,
             'sem:hasActor' AS pred,
             concat('usr:', CAST(user_id AS VARCHAR)) AS obj
      FROM events),
    lab AS (
      SELECT DISTINCT 'urn:x-default' AS g,
             concat('usr:', CAST(user_id AS VARCHAR)) AS subj,
             'rdfs:label' AS pred,
             concat('user ', CAST(user_id AS VARCHAR)) AS obj
      FROM events)
    SELECT g, subj, pred, obj, (pred = 'rdfs:label') AS obj_is_literal
    FROM (SELECT * FROM ev UNION ALL SELECT * FROM lab)
"""

# Curation trio (operators/curation.py). The PII regexes are the SAME
# strings the Spark side compiles (common Java-regex/RE2 subset — no
# backreferences, no lookaround), injected by concatenation because they
# contain both '{' and '%'. DuckDB regexp_replace needs the explicit 'g'
# flag; Spark's is global by default.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_PHONE = "\\+\\d{1,2}-\\d{3}-\\d{4}"

EXTRA_ORACLES["pii_redact"] = (
    """
    WITH aug AS (
      SELECT doc_id,
             concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                    '@example.com from 10.2.',
                    CAST(doc_id % 256 AS VARCHAR), '.7 call +1-555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS text
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
               text, '"""
    + _PII_EMAIL
    + """', '<EMAIL>', 'g'), '"""
    + _PII_IPV4
    + """', '<IP>', 'g'), '"""
    + _PII_PHONE
    + """', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '"""
    + _PII_EMAIL
    + """')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '"""
    + _PII_IPV4
    + """')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '"""
    + _PII_PHONE
    + """')) AS BIGINT) AS n_phones
    FROM aug
"""
)

# Gopher-style repetition signals: per-doc mode mass of bi/trigrams via
# unnest + GROUP BY (the relational twin of the Spark side's array-mode
# expression); fractions rounded to 4 like the Spark side.
EXTRA_ORACLES["repetition_stats"] = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents),
    bg AS (
      SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS ng
      FROM t, (SELECT unnest(range(1, 2000)) AS i) ix WHERE i + 1 <= n),
    tg AS (
      SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS ng
      FROM t, (SELECT unnest(range(1, 2000)) AS i) ix WHERE i + 2 <= n),
    bstat AS (
      SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 4) AS frac
      FROM (SELECT doc_id, ng, COUNT(*) AS c FROM bg GROUP BY doc_id, ng)
      GROUP BY doc_id),
    tstat AS (
      SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 4) AS frac
      FROM (SELECT doc_id, ng, COUNT(*) AS c FROM tg GROUP BY doc_id, ng)
      GROUP BY doc_id)
    SELECT t.doc_id,
           ROUND(1.0 - len(list_distinct(toks)) * 1.0 / n, 4)
             AS dup_word_frac,
           COALESCE(bstat.frac, 0.0) AS top_bigram_frac,
           COALESCE(tstat.frac, 0.0) AS top_trigram_frac,
           (COALESCE(bstat.frac, 0.0) > 0.18
            OR ROUND(1.0 - len(list_distinct(toks)) * 1.0 / n, 4) > 0.9)
             AS repetitive
    FROM t
    LEFT JOIN bstat ON t.doc_id = bstat.doc_id
    LEFT JOIN tstat ON t.doc_id = tstat.doc_id
"""

# 4-gram decontamination: docs with doc_id % 10 == 0 are the eval set;
# DISTINCT per-doc n-grams (mirroring the Spark side's
# distinct-before-explode) joined against the eval fingerprints. The
# oracle joins on raw n-gram text where Spark joins on md5(ngram) —
# injective over these strings, so the hit sets are identical.
EXTRA_ORACLES["decontaminate"] = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT DISTINCT doc_id, array_to_string(toks[i:i+3], ' ') AS ng
      FROM t, (SELECT unnest(range(1, 2000)) AS i) ix
      WHERE i + 3 <= len(toks)),
    ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 0),
    h AS (
      SELECT g.doc_id, COUNT(*) AS n_hits
      FROM g JOIN ev USING (ng)
      WHERE g.doc_id % 10 <> 0
      GROUP BY g.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 10 <> 0
"""

# Training-prep quartet (operators/training_prep.py). Token counts use
# len(string_split(...)) — identical to Spark size(split(...)) for the
# non-empty corpus (the engines diverge only on text='': DuckDB [] vs
# Spark ['']).

# chunk_docs: size 24, overlap 8 -> stride 16; chunk_idx = (start-1)/16
# because starts are exactly 1 + 16k.
EXTRA_ORACLES["chunk_docs"] = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents),
    s AS (
      SELECT doc_id, toks, n, st
      FROM t, UNNEST(generate_series(1, greatest(1, n - 8), 16)) AS u(st))
    SELECT doc_id,
           CAST((st - 1) // 16 AS BIGINT) AS chunk_idx,
           array_to_string(toks[st:st+23], ' ') AS chunk_text,
           CAST(least(24, n - st + 1) AS BIGINT) AS n_toks
    FROM s
"""

# pack_boundary: budget 256. The oracle is the PLAIN single-window
# prefix sum — the Spark side's two-phase bucketed prefix sum must
# reproduce it exactly or the hash breaks (that is the point: bucketing
# is an execution strategy, not a semantics change).
EXTRA_ORACLES["pack_boundary"] = """
    WITH d AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents),
    o AS (
      SELECT doc_id, n,
             CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
      FROM d)
    SELECT doc_id,
           CAST(seq_id AS BIGINT) AS seq_id,
           CAST(greatest(seq_id * 256 - off, 0) + 1 AS BIGINT) AS tok_start,
           CAST(least((seq_id + 1) * 256 - off, n) AS BIGINT) AS tok_end,
           CAST(least((seq_id + 1) * 256 - off, n)
                - greatest(seq_id * 256 - off, 0) AS BIGINT) AS n_toks
    FROM o, UNNEST(generate_series(off // 256, (off + n - 1) // 256))
           AS u(seq_id)
"""

# pack_firstfit: budget 128, 8 partitions. The recursive CTE replays the
# partition-local greedy fold row by row (rn joins rn+1), the exact
# decisions applyInPandas makes; recursion depth = max partition size.
EXTRA_ORACLES["pack_firstfit"] = """
    WITH RECURSIVE d AS (
      SELECT doc_id, CAST(doc_id % 8 AS INT) AS part,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             row_number() OVER (PARTITION BY doc_id % 8
                                ORDER BY doc_id) AS rn
      FROM documents),
    p AS (
      SELECT part, rn, doc_id, n_toks,
             CAST(0 AS BIGINT) AS bin_idx, n_toks AS cum
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.part, d.rn, d.doc_id, d.n_toks,
             CASE WHEN p.cum + d.n_toks > 128
                  THEN p.bin_idx + 1 ELSE p.bin_idx END,
             CASE WHEN p.cum + d.n_toks > 128
                  THEN d.n_toks ELSE p.cum + d.n_toks END
      FROM d JOIN p ON d.part = p.part AND d.rn = p.rn + 1)
    SELECT doc_id, part, bin_idx, n_toks FROM p
"""


# vocab_build: min_count 2. The oracle ranks with a plain single window;
# the Spark side's range-partitioned two-phase rank must reproduce it
# exactly (tie-free total order: tokens are unique).
EXTRA_ORACLES["vocab_build"] = """
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    c AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM t GROUP BY token)
    SELECT token, n_occurrences, n_docs,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, token)
                - 1 AS BIGINT) AS token_id
    FROM c WHERE n_occurrences >= 2
"""


def _mixture_sql() -> str:
    """Generated from the SAME catalog constants the Spark entry uses, so
    the clamped integer thresholds match bit-for-bit."""
    from .catalog import MIXTURE_DEFAULT, MIXTURE_RATES, MIXTURE_SEED

    def thresh(r: float) -> int:
        return int(min(max(r, 0.0), 1.0) * 2**32)

    vals = ", ".join(
        f"('{s}', CAST({thresh(r)} AS BIGINT))"
        for s, r in sorted(MIXTURE_RATES.items())
    )
    return f"""
    WITH r AS (SELECT * FROM (VALUES {vals}) t(source, thresh))
    SELECT d.doc_id, d.lang, d.source
    FROM documents d LEFT JOIN r USING (source)
    WHERE ('0x' || substring(
             md5(concat('{MIXTURE_SEED}:', CAST(d.doc_id AS VARCHAR))),
             1, 8))::BIGINT
          < COALESCE(r.thresh, CAST({thresh(MIXTURE_DEFAULT)} AS BIGINT))
"""


EXTRA_ORACLES["mixture_weighted"] = _mixture_sql()


def _sample_exact_sql(n: int = 100) -> str:
    """Same md5 coin as the Spark side; the compare hash is row-order
    insensitive, so ORDER BY only has to pick the same N rows."""
    from .catalog import MIXTURE_SEED

    return f"""
    SELECT doc_id, lang, source FROM documents
    ORDER BY ('0x' || substring(
        md5(concat('{MIXTURE_SEED}:', CAST(doc_id AS VARCHAR))),
        1, 8))::BIGINT, doc_id
    LIMIT {n}
"""


EXTRA_ORACLES["sample_exact"] = _sample_exact_sql()


# ExactSubstr duplicate-span stats (text_dedup.duplicate_span_stats, n=4):
# per-doc 4-token windows duplicated anywhere in the corpus (including
# within the same doc). The oracle counts on the raw window text where
# Spark counts on md5(window) — injective over these strings, same
# argument as the decontaminate oracle. toks[i:i+3] is DuckDB's inclusive
# 4-element slice, the twin of Spark slice(toks, i, 4); docs shorter than
# 4 tokens produce no windows and are omitted in both engines.
EXTRA_ORACLES["dup_spans"] = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    w AS (
      SELECT doc_id, array_to_string(toks[i:i+3], ' ') AS ng
      FROM t, (SELECT unnest(range(1, 2000)) AS i) ix
      WHERE i + 3 <= len(toks)),
    c AS (SELECT doc_id, ng, COUNT(*) AS c_doc FROM w GROUP BY 1, 2),
    tot AS (SELECT ng, SUM(c_doc) AS c_tot FROM c GROUP BY 1)
    SELECT c.doc_id,
           CAST(SUM(c.c_doc) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN tot.c_tot >= 2 THEN c.c_doc ELSE 0 END)
                AS BIGINT) AS n_dup_windows,
           ROUND(CAST(SUM(CASE WHEN tot.c_tot >= 2 THEN c.c_doc ELSE 0 END)
                      AS DOUBLE) / SUM(c.c_doc), 6) AS dup_frac
    FROM c JOIN tot USING (ng)
    GROUP BY c.doc_id
"""


# ExactSubstr removal (text_dedup.remove_duplicate_spans, n=4,
# key_mult=2^20): winner election on the same scalar occurrence key
# doc_id*2^20+pos the Spark side uses; kept tokens re-joined in position
# order (string_agg ORDER BY i) — both engines normalize inter-token
# whitespace to single spaces, and the sf0.01 corpus is single-spaced.
# Docs with no kept tokens (fully covered) yield '' via COALESCE.
EXTRA_ORACLES["dup_span_removal"] = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    o AS (
      SELECT doc_id, i AS pos, array_to_string(toks[i:i+3], ' ') AS ng,
             doc_id * 1048576 + i AS k
      FROM t, (SELECT unnest(range(1, 2000)) AS i) ix
      WHERE i + 3 <= len(toks)),
    win AS (
      SELECT ng, COUNT(*) AS c_tot, MIN(k) AS k_win FROM o GROUP BY 1),
    cov AS (
      SELECT DISTINCT o.doc_id, o.pos + d AS tp
      FROM o JOIN win USING (ng),
           (SELECT unnest(range(0, 4)) AS d) dd
      WHERE win.c_tot >= 2 AND o.k <> win.k_win),
    kept AS (
      SELECT t.doc_id, i, toks[i] AS tok
      FROM t, (SELECT unnest(range(1, 2000)) AS i) ix
      WHERE i <= len(toks)
        AND NOT EXISTS (SELECT 1 FROM cov
                        WHERE cov.doc_id = t.doc_id AND cov.tp = i)),
    clean AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
      FROM kept GROUP BY doc_id),
    nrem AS (
      SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY doc_id)
    SELECT t.doc_id,
           COALESCE(clean.clean_text, '') AS clean_text,
           CAST(COALESCE(nrem.n, 0) AS BIGINT) AS n_removed_tokens
    FROM t
    LEFT JOIN clean ON t.doc_id = clean.doc_id
    LEFT JOIN nrem ON t.doc_id = nrem.doc_id
"""


# --- flagship oracle: the full KG pipeline's full_triples ------------------
# The corpus is deterministic (datagen seed 42) and generated to a FIXED
# dir (catalog.ensure_fixed_corpus), so DuckDB reads the SAME parquet the
# Spark entry reads. The SQL reproduces the by_incident full-collection
# path end-to-end (reference main.py:218-227 + classes.py:265-353):
# document assembly (ordered string_agg == operators/documents.py two-phase
# assembly), F8 missing-page drop, A2 keep-max-name dedup (rank, ties
# kept — utils.py:386-398), then the union of T1 text / T2 incident /
# T3 routed-role / T4 collection-label triples with the P3 'uri | label'
# unpack and the P4 gYear literal rule, set-deduplicated like rdflib.Graph.

def _kg_pipeline_sql(corpus_dir: str) -> str:
    wd = "http://www.wikidata.org/entity/"
    sem = "http://semanticweb.cs.vu.nl/2009/11/sem/"
    grasp = "http://groundedannotationframework.org/grasp#"
    dct = "http://purl.org/dc/elements/1.1/"
    fn = "http://premon.fbk.eu/resource/fn17-"
    premon = "https://premon.fbk.eu/resource/"
    dcmi_text = "http://purl.org/dc/dcmitype/Text"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rdfs_label = "http://www.w3.org/2000/01/rdf-schema#label"
    t = lambda name: f"read_parquet('{corpus_dir}/{name}.parquet')"  # noqa: E731
    return f"""
        WITH seeds AS (
          SELECT * FROM {t('incidents')} WHERE participant_id IS NULL
        ),
        cm AS (
          SELECT m.* FROM {t('conv_meta')} m
          WHERE m.incident_id IN (SELECT incident_id FROM seeds)
        ),
        docs AS (
          SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS content
          FROM {t('transcripts')} GROUP BY conv_id
        ),
        texts0 AS (
          SELECT cm.incident_id, cm.lang, cm.name, cm.uri, d.content
          FROM cm JOIN docs d USING (conv_id)
          WHERE length(d.content) > 0
        ),
        texts AS (
          SELECT incident_id, lang, name, uri, content FROM (
            SELECT *, rank() OVER (
              PARTITION BY incident_id, lang, content ORDER BY name DESC
            ) AS rnk FROM texts0
          ) WHERE rnk = 1
        ),
        incs AS (
          SELECT * FROM seeds
          WHERE incident_id IN (SELECT DISTINCT incident_id FROM texts)
        ),
        mapping_roles AS (
          SELECT DISTINCT tm.type_qid, rm.role
          FROM {t('type2mapping')} tm
          JOIN {t('role_mappings')} rm USING (mapping_name)
        ),
        roles AS (
          SELECT r.incident_id, r.role, r.value, i.incident_type
          FROM {t('incident_roles')} r
          JOIN incs i USING (incident_id)
          WHERE EXISTS (SELECT 1 FROM mapping_roles m
                        WHERE m.type_qid = i.incident_type
                          AND m.role = r.role)
        ),
        role_expr AS (
          SELECT '{wd}' || incident_id AS subj,
                 (CASE WHEN string_split(role, ':')[1] = 'sem'
                       THEN '{sem}' ELSE '{premon}' END)
                   || string_split(role, ':')[2] AS pred,
                 trim(string_split(value, '|')[1]) AS unpacked,
                 string_split(role, ':')[2]
                   IN ('hasTimeStamp', 'time') AS is_time
          FROM roles
        ),
        all_triples AS (
          -- T1 per reference text (classes.py:304-317); conv_sources=None
          -- at the full-collection stage, so no dct:source triples
          SELECT '{wd}' || incident_id AS subj, '{rdfs_label}' AS pred,
                 name AS obj, TRUE AS obj_is_literal, lang,
                 NULL AS datatype FROM texts
          UNION ALL
          SELECT '{wd}' || incident_id, '{grasp}denotedIn', uri, FALSE,
                 NULL, NULL FROM texts
          UNION ALL
          SELECT uri, '{dct}description', content, TRUE, NULL, NULL FROM texts
          UNION ALL
          SELECT uri, '{dct}title', name, TRUE, NULL, NULL FROM texts
          UNION ALL
          SELECT uri, '{dct}language', lang, TRUE, NULL, NULL FROM texts
          UNION ALL
          SELECT uri, '{dct}type', '{dcmi_text}', FALSE, NULL, NULL FROM texts
          UNION ALL
          -- T2 per incident (classes.py:319-324)
          SELECT '{wd}' || incident_id, '{rdf_type}', '{sem}Event', FALSE,
                 NULL, NULL FROM incs
          UNION ALL
          SELECT '{wd}' || incident_id, '{sem}eventType', incident_type_uri,
                 FALSE, NULL, NULL FROM incs
          UNION ALL
          SELECT '{wd}' || incident_id, '{rdf_type}',
                 '{fn}change_of_leadership', FALSE, NULL, NULL FROM incs
          UNION ALL
          -- T3 routed roles with P3 unpack + P4 gYear rule
          SELECT subj, pred,
                 CASE WHEN is_time AND unpacked LIKE '%-01-01T00:00:00Z'
                      THEN substr(unpacked, 1, 4) ELSE unpacked END,
                 is_time, NULL,
                 CASE WHEN NOT is_time THEN NULL
                      WHEN unpacked LIKE '%-01-01T00:00:00Z'
                      THEN 'http://www.w3.org/2001/XMLSchema#gYear'
                      ELSE 'http://www.w3.org/2001/XMLSchema#date' END
          FROM role_expr
          UNION ALL
          -- T4 per event-type collection (classes.py:347)
          SELECT DISTINCT incident_type_uri, '{rdfs_label}', incident_type,
                 TRUE, NULL, NULL FROM incs
        )
        SELECT DISTINCT subj, pred, obj, obj_is_literal,
               CAST(lang AS VARCHAR) AS lang,
               CAST(datatype AS VARCHAR) AS datatype
        FROM all_triples
    """


# NearDup keep-one (Lee et al. 2022 document-level dedup): same
# candidates -> verify -> closure chain as canonicalize_components, then
# the min-doc_id survivor election + cluster sizes. Singletons (docs in no
# verified cluster) survive with n_members = 1.
EXTRA_ORACLES["dedup_neardup_keep"] = f"""
    WITH RECURSIVE {_MINHASH_BANDS},
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id),
    cand_lang AS (
      SELECT c.a_id, c.b_id FROM cand c
      JOIN documents da ON da.doc_id = c.a_id
      JOIN documents db ON db.doc_id = c.b_id
      WHERE da.lang = db.lang),
    lang_tokens AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token <> ''),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM lang_tokens GROUP BY doc_id),
    shared AS (
      SELECT c.a_id, c.b_id, COUNT(*) AS shared
      FROM cand_lang c
      JOIN lang_tokens ta ON ta.doc_id = c.a_id
      JOIN lang_tokens tb ON tb.doc_id = c.b_id AND tb.token = ta.token
      GROUP BY c.a_id, c.b_id),
    pairs AS (
      SELECT a_id, b_id FROM shared
      JOIN sizes sa ON sa.doc_id = a_id
      JOIN sizes sb ON sb.doc_id = b_id
      WHERE shared / (sa.n + sb.n - shared) >= 0.9),
    sym AS (SELECT a_id AS v, b_id AS w FROM pairs
            UNION SELECT b_id, a_id FROM pairs),
    reach AS (
      SELECT v, v AS r FROM (SELECT DISTINCT v FROM sym)
      UNION
      SELECT s.v, rr.r FROM sym s JOIN reach rr ON s.w = rr.v),
    comp AS (SELECT v AS vertex, MIN(r) AS component FROM reach GROUP BY v),
    csizes AS (SELECT component, COUNT(*) AS n_members
               FROM comp GROUP BY component)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(s.n_members, 1) AS BIGINT) AS n_members
    FROM documents d
    LEFT JOIN csizes s ON s.component = d.doc_id
    WHERE NOT EXISTS (SELECT 1 FROM comp c
                      WHERE c.vertex = d.doc_id AND c.vertex <> c.component)
"""

# Unigram-LM quality twin: the only float ops are one IEEE division, one
# ln, and the final exact-integer division — no float summation order
# anywhere, so the hash matches the Spark plan bit-for-bit.
EXTRA_ORACLES["unigram_quality"] = """
    WITH tok AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token <> ''),
    per_doc AS (
      SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token),
    vocab AS (SELECT token, SUM(c) AS cnt FROM per_doc GROUP BY token),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    scored AS (
      SELECT p.doc_id, p.c,
             CAST(ROUND(ln(CAST(t.total AS DOUBLE) / CAST(v.cnt AS DOUBLE))
                        * 1e6) AS BIGINT) AS nll_micro
      FROM per_doc p JOIN vocab v USING (token) CROSS JOIN tot t)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(c * nll_micro) AS BIGINT) AS sum_nll_micro,
           ROUND(SUM(c * nll_micro) / SUM(c) / 1e6, 6) AS avg_nll
    FROM scored GROUP BY doc_id
"""


def _sample_stratified_sql(n: int = 10) -> str:
    """Plain per-group QUALIFY twin of the salted two-phase per-group
    top-k — hash equality proves the salting is execution-only."""
    from .catalog import MIXTURE_SEED

    return f"""
    SELECT doc_id, lang, source FROM documents
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY source
        ORDER BY ('0x' || substring(
            md5(concat('{MIXTURE_SEED}:', CAST(doc_id AS VARCHAR))),
            1, 8))::BIGINT, doc_id) <= {n}
"""


EXTRA_ORACLES["sample_stratified"] = _sample_stratified_sql()


def _hll_sql() -> str:
    """HyperLogLog twin (m=64): identical integer register path — 60-bit
    md5 hash, bucket = h % 64, register = 54 - bitlen + 1 via the base-2
    string (no float log2), indicator sum exact over dyadic BIGINTs; the
    alpha*m^2*2^SCALE constant is the SAME Python double the Spark plan
    embeds, emitted by repr."""
    alpha, m, scale, k = 0.709, 64, 56, 54
    numer = repr(alpha * m * m * float(1 << scale))
    return f"""
    WITH tok AS (
      SELECT lang, token FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token <> ''),
    keyed AS (
      SELECT lang AS g, token AS v,
             ('0x' || substring(md5(token), 1, 15))::BIGINT AS h
      FROM tok),
    regs AS (
      SELECT g, h % {m} AS bucket,
             MAX(CASE WHEN h // {m} = 0 THEN {k + 1}
                      ELSE {k} - length(bin(h // {m})) + 1 END) AS M
      FROM keyed GROUP BY g, h % {m}),
    pg AS (
      SELECT g, SUM((1::BIGINT) << ({scale} - M)) AS s_occ,
             COUNT(*) AS n_occ
      FROM regs GROUP BY g),
    ex AS (SELECT g, COUNT(DISTINCT v) AS exact_distinct
           FROM keyed GROUP BY g),
    fin AS (
      SELECT g,
             CASE WHEN {numer} / (s_occ + ({m} - n_occ) * ((1::BIGINT) << {scale}))
                       <= {2.5 * m!r}
                   AND ({m} - n_occ) > 0
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_occ))
                  ELSE {numer} / (s_occ + ({m} - n_occ) * ((1::BIGINT) << {scale}))
             END AS est
      FROM pg)
    SELECT f.g AS lang, ROUND(f.est, 6) AS est_distinct,
           CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
           ROUND((ROUND(f.est, 6) - e.exact_distinct) / e.exact_distinct,
                 6) AS rel_err
    FROM fin f JOIN ex e USING (g)
"""


EXTRA_ORACLES["hll_token_distinct"] = _hll_sql()


def _cms_sql(d: int = 4, w: int = 512, k: int = 20,
             sample_rate: float = 0.25, seed: str = "cms") -> str:
    """Count-Min twin: identical salted-md5 row hashes, identical
    (seed, doc_id, token) candidate coin, all-integer cells/estimates,
    same (est DESC, token ASC) deterministic cut."""
    thresh = int(min(max(sample_rate, 0.0), 1.0) * 2**32)
    js = ", ".join(f"({j})" for j in range(d))
    return f"""
    WITH occ AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, token AS v FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token <> ''),
    pairs AS (
      SELECT v, j,
             ('0x' || substring(md5('{seed}:h' || CAST(j AS VARCHAR)
                                    || ':' || v), 1, 8))::BIGINT % {w}
               AS bucket
      FROM occ CROSS JOIN (VALUES {js}) t(j)),
    cms AS (SELECT j, bucket, COUNT(*) AS cell
            FROM pairs GROUP BY j, bucket),
    cand AS (
      SELECT DISTINCT v FROM occ
      WHERE ('0x' || substring(
               md5(concat_ws(':', '{seed}', doc_id, v)), 1, 8))::BIGINT
            < {thresh}),
    ck AS (
      SELECT v, j,
             ('0x' || substring(md5('{seed}:h' || CAST(j AS VARCHAR)
                                    || ':' || v), 1, 8))::BIGINT % {w}
               AS bucket
      FROM cand CROSS JOIN (VALUES {js}) t(j)),
    est AS (
      SELECT ck.v, MIN(cms.cell) AS est_count
      FROM ck JOIN cms USING (j, bucket) GROUP BY ck.v),
    ex AS (
      SELECT occ.v, COUNT(*) AS exact_count
      FROM occ JOIN cand USING (v) GROUP BY occ.v)
    SELECT e.v AS token, CAST(e.est_count AS BIGINT) AS est_count,
           CAST(x.exact_count AS BIGINT) AS exact_count,
           CAST(e.est_count - x.exact_count AS BIGINT) AS overestimate
    FROM est e JOIN ex x USING (v)
    ORDER BY est_count DESC, token LIMIT {k}
"""


EXTRA_ORACLES["cms_hot_tokens"] = _cms_sql()


# Power-of-two histogram quantile twin: identical integer bucket path
# (bitlen via bin()), identical ceil(q*N) double arithmetic, identical
# first-bucket / smallest-ranked-value extraction.
EXTRA_ORACLES["quantile_doclen"] = """
    WITH vals AS (
      SELECT g, v FROM (
        SELECT lang AS g,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS v
        FROM documents
      ) WHERE v > 0),
    hist AS (
      SELECT g, length(bin(v)) AS b, COUNT(*) AS c
      FROM vals GROUP BY g, length(bin(v))),
    cum AS (
      SELECT g, b, SUM(c) OVER (PARTITION BY g ORDER BY b) AS cum,
             SUM(c) OVER (PARTITION BY g) AS n
      FROM hist),
    qs AS (SELECT * FROM (VALUES (0.5::DOUBLE), (0.9::DOUBLE),
                                 (0.99::DOUBLE)) t(q)),
    est AS (
      SELECT g, q, MIN(b) AS b FROM cum CROSS JOIN qs
      WHERE cum >= CEIL(q * n) GROUP BY g, q),
    ranked AS (
      SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rank,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM vals),
    ex AS (
      SELECT g, q, MIN(v) AS exact FROM ranked CROSS JOIN qs
      WHERE rank >= CEIL(q * n) GROUP BY g, q)
    SELECT e.g AS lang, e.q AS q,
           CAST(((1::BIGINT) << e.b) - 1 AS BIGINT) AS est,
           CAST(x.exact AS BIGINT) AS exact,
           ROUND((((1::BIGINT) << e.b) - 1 - x.exact) / x.exact, 6)
             AS rel_err
    FROM est e JOIN ex x USING (g, q)
"""


# Bloom semi-join twin: identical salted-md5 bit positions, identical
# bit_or word fold and all-k-bits mask test — one all-BIGINT report row.
EXTRA_ORACLES["bloom_semijoin"] = """
    WITH dimk AS (
      SELECT DISTINCT p_partkey AS dk FROM part WHERE p_size <= 5),
    js AS (SELECT * FROM (VALUES (0), (1), (2), (3), (4)) t(i)),
    bpos AS (
      SELECT ('0x' || substring(
               md5('bloom:h' || CAST(i AS VARCHAR) || ':'
                   || CAST(dk AS VARCHAR)), 1, 8))::BIGINT % 4096 AS pos
      FROM dimk CROSS JOIN js),
    bloom AS (
      SELECT pos // 32 AS word_idx,
             bit_or((1::BIGINT) << CAST(pos % 32 AS INT)) AS word
      FROM bpos GROUP BY pos // 32),
    fkeys AS (SELECT DISTINCT l_partkey AS fk FROM lineitem),
    fpos AS (
      SELECT fk, ('0x' || substring(
               md5('bloom:h' || CAST(i AS VARCHAR) || ':'
                   || CAST(fk AS VARCHAR)), 1, 8))::BIGINT % 4096 AS pos
      FROM fkeys CROSS JOIN js),
    probe AS (
      SELECT fk, bool_and(
               (COALESCE(b.word, 0)
                & ((1::BIGINT) << CAST(f.pos % 32 AS INT))) <> 0)
               AS bloom_pass
      FROM fpos f LEFT JOIN bloom b ON b.word_idx = f.pos // 32
      GROUP BY fk),
    flagged AS (
      SELECT p.bloom_pass, (d.dk IS NOT NULL) AS m
      FROM lineitem l
      JOIN probe p ON p.fk = l.l_partkey
      LEFT JOIN dimk d ON d.dk = l.l_partkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
           CAST(SUM(CASE WHEN bloom_pass AND NOT m THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos
    FROM flagged
"""


# Prefix-filter exact near-dup twin: same rare-first (df, token) global
# order, same |x| - ceil(t|x|) + 1 prefix, same verify chain as the
# canonicalize oracle.
EXTRA_ORACLES["dedup_prefix_pairs"] = """
    WITH lang_tokens AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token <> ''),
    freq AS (SELECT token, COUNT(*) AS df FROM lang_tokens GROUP BY token),
    ranked AS (
      SELECT doc_id, token,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY df, token) AS rank,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM lang_tokens JOIN freq USING (token)),
    prefix AS (
      SELECT doc_id, token FROM ranked
      WHERE rank <= n - CEIL(0.9 * n) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM prefix a JOIN prefix b
        ON a.token = b.token AND a.doc_id < b.doc_id),
    cand_lang AS (
      SELECT c.a_id, c.b_id FROM cand c
      JOIN documents da ON da.doc_id = c.a_id
      JOIN documents db ON db.doc_id = c.b_id
      WHERE da.lang = db.lang),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM lang_tokens
              GROUP BY doc_id),
    shared AS (
      SELECT c.a_id, c.b_id, COUNT(*) AS shared
      FROM cand_lang c
      JOIN lang_tokens ta ON ta.doc_id = c.a_id
      JOIN lang_tokens tb ON tb.doc_id = c.b_id AND tb.token = ta.token
      GROUP BY c.a_id, c.b_id)
    SELECT a_id, b_id,
           ROUND(shared / (sa.n + sb.n - shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE shared / (sa.n + sb.n - shared) >= 0.9
"""


def _ppr_sql(n_iters: int = 5, scale: int = 10**12) -> str:
    """Unrolled-CTE twin of graph.personalized_pagerank: same graph as
    _pagerank_sql, seeds = nation-0 customers, teleport mass CASE-gated
    to the seed flag — all BIGINT // arithmetic, bit-for-bit."""
    base = (f"(sf.s * 15 * ({scale} // (SELECT n_seeds FROM ns))) // 100")
    iters = ",\n".join(
        f"""
        r{i} AS (
          SELECT sf.node,
                 CAST({base} + (85 * COALESCE(m.in_mass, 0)) // 100
                      AS BIGINT) AS rank_e12
          FROM sflag sf LEFT JOIN (
            SELECT e.dst, SUM(r.rank_e12 // e.outdeg) AS in_mass
            FROM e JOIN r{i - 1} r ON r.node = e.src GROUP BY e.dst
          ) m ON m.dst = sf.node
        )"""
        for i in range(1, n_iters + 1)
    )
    return f"""
        WITH pairs AS (
          SELECT DISTINCT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
                          concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (SELECT src, dst FROM pairs
                  UNION ALL
                  SELECT dst, src FROM pairs),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
                FROM edges GROUP BY src),
        e AS (SELECT edges.src, edges.dst, deg.outdeg
              FROM edges JOIN deg USING (src)),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM edges
                   UNION ALL SELECT dst FROM edges)),
        seeds AS (SELECT DISTINCT concat('c', CAST(c_custkey AS VARCHAR))
                    AS node
                  FROM customer WHERE c_nationkey = 0),
        sflag AS (SELECT n.node,
                         CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS s
                  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
        ns AS (SELECT CAST(SUM(s) AS BIGINT) AS n_seeds FROM sflag),
        r0 AS (SELECT node,
                      CAST(s * ({scale} // (SELECT n_seeds FROM ns))
                           AS BIGINT) AS rank_e12
               FROM sflag),
        {iters}
        SELECT node, rank_e12 FROM r{n_iters}
    """


EXTRA_ORACLES["graph_ppr"] = _ppr_sql()


# Grouping-sets twin: DuckDB GROUP BY ROLLUP NULL-fills subtotal rows
# exactly like Spark's rollup().
EXTRA_ORACLES["rollup_stats"] = """
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(list_filter(string_split(text, ' '),
                                    x -> x <> ''))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY ROLLUP (lang, source)
"""


def _pivot_sql() -> str:
    """Conditional-aggregation twin of the pivot entry — generated from
    the same PIVOT_LANGS list so the column set matches by construction."""
    from .catalog import PIVOT_LANGS

    cols = ",\n           ".join(
        f"CAST(COUNT(*) FILTER (lang = '{v}') AS BIGINT) AS \"{v}\""
        for v in PIVOT_LANGS
    )
    return f"""
    SELECT source,
           {cols}
    FROM documents GROUP BY source
"""


EXTRA_ORACLES["pivot_lang_matrix"] = _pivot_sql()


def _zorder_sql(bits: int = 16) -> str:
    """Unrolled Morton-interleave twin. DuckDB's % keeps the sign, so the
    mask mirrors Spark's pmod as ((v % m) + m) % m."""
    m = 1 << bits
    terms = " + ".join(
        f"(((x >> {j}) & 1) << {2 * j}) + (((y >> {j}) & 1) << {2 * j + 1})"
        for j in range(bits)
    )
    return f"""
    WITH d AS (
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             ((CAST(c_nationkey AS BIGINT) % {m}) + {m}) % {m} AS x,
             ((CAST(FLOOR(c_acctbal) AS BIGINT) % {m}) + {m}) % {m} AS y
      FROM customer)
    SELECT c_custkey, CAST({terms} AS BIGINT) AS zkey FROM d
"""


EXTRA_ORACLES["zorder_layout"] = _zorder_sql()


def _kmv_sql(k: int = 16, ga: str = "en", gb: str = "de") -> str:
    """KMV overlap twin — identical sketch construction (k smallest
    60-bit md5 hashes per group) and identical estimator expression
    trees, so the float estimates match bit-for-bit."""
    full = float(1 << 60)
    est = (f"CASE WHEN n_uk < {k} THEN CAST(n_uk AS DOUBLE) "
           f"ELSE {float(k - 1)!r} * {full!r} / h_k END")
    return f"""
    WITH tok AS (
      SELECT g, token,
             ('0x' || substring(md5(token), 1, 15))::BIGINT AS h
      FROM (
        SELECT lang AS g, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE lang IN ('{ga}', '{gb}')
      ) WHERE token <> ''),
    dvals AS (SELECT DISTINCT g, h FROM tok),
    regs AS (
      SELECT g, h FROM (
        SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r
        FROM dvals
      ) WHERE r <= {k}),
    a AS (SELECT h FROM regs WHERE g = '{ga}'),
    b AS (SELECT h FROM regs WHERE g = '{gb}'),
    merged AS (SELECT DISTINCT h FROM
               (SELECT h FROM a UNION ALL SELECT h FROM b)),
    uk AS (SELECT h FROM (
             SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r FROM merged
           ) WHERE r <= {k}),
    st AS (
      SELECT COUNT(*) AS n_uk, MAX(uk.h) AS h_k,
             SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                      THEN 1 ELSE 0 END) AS n_both
      FROM uk LEFT JOIN a ON a.h = uk.h LEFT JOIN b ON b.h = uk.h),
    ex AS (
      SELECT COUNT(*) AS exact_union,
             SUM(CASE WHEN ng = 2 THEN 1 ELSE 0 END) AS exact_inter
      FROM (SELECT h, COUNT(*) AS ng FROM dvals GROUP BY h))
    SELECT CAST(n_uk AS BIGINT) AS k_used,
           ROUND({est}, 6) AS union_est,
           ROUND(CAST(n_both AS DOUBLE) / n_uk, 6) AS jaccard_est,
           ROUND((CAST(n_both AS DOUBLE) / n_uk) * ({est}), 6)
             AS inter_est,
           CAST(exact_union AS BIGINT) AS exact_union,
           CAST(exact_inter AS BIGINT) AS exact_inter
    FROM st CROSS JOIN ex
"""


EXTRA_ORACLES["kmv_lang_overlap"] = _kmv_sql()

# Linear-classifier inference twin: the stand-in weight table is derived
# from the corpus vocabulary with the shared md5_u32 coin; all arithmetic
# is exact integers until the final mean.
EXTRA_ORACLES["quality_classifier"] = """
    WITH tok AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token <> ''),
    per_doc AS (
      SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token),
    w AS (
      SELECT DISTINCT token,
             ('0x' || substring(md5('qw:' || token), 1, 8))::BIGINT
               % 2000001 - 1000000 AS w
      FROM tok),
    scored AS (
      SELECT p.doc_id, p.c, COALESCE(w.w, 0) AS w
      FROM per_doc p LEFT JOIN w USING (token))
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(c * w) AS BIGINT) AS logit_sum_micro,
           ROUND(SUM(c * w) / SUM(c) / 1e6, 6) AS avg_logit,
           SUM(c * w) > 0 AS label
    FROM scored GROUP BY doc_id
"""

# Bigram-LM twin of unigram_quality: same micro-nat integer contract; the
# lateral unnest over range(1, len) forms (w1, w2) transition pairs.
EXTRA_ORACLES["bigram_quality"] = """
    WITH docs AS (
      SELECT doc_id, arr FROM (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS arr
        FROM documents
      ) WHERE len(arr) >= 2),
    bg AS (
      SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
      FROM docs, unnest(range(1, len(arr))) AS t(i)),
    per_doc AS (
      SELECT doc_id, w1, w2, COUNT(*) AS c FROM bg GROUP BY doc_id, w1, w2),
    pair_cnt AS (
      SELECT w1, w2, SUM(c) AS c12 FROM per_doc GROUP BY w1, w2),
    ctx AS (SELECT w1, SUM(c12) AS c1 FROM pair_cnt GROUP BY w1),
    scored AS (
      SELECT p.doc_id, p.c,
             CAST(ROUND(ln(CAST(x.c1 AS DOUBLE) / CAST(pc.c12 AS DOUBLE))
                        * 1e6) AS BIGINT) AS nll_micro
      FROM per_doc p
      JOIN pair_cnt pc USING (w1, w2)
      JOIN ctx x USING (w1))
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(SUM(c * nll_micro) AS BIGINT) AS sum_nll_micro,
           ROUND(SUM(c * nll_micro) / SUM(c) / 1e6, 6) AS avg_nll
    FROM scored GROUP BY doc_id
"""


def _mixture_temperature_sql(alpha: float = 0.5, target: int = 300,
                             group_col: str = "lang") -> str:
    """Twin of catalog.mixture_temperature_lang. The rate expression
    keeps the SAME association as the Spark side (target*1e9*w/w_tot/n_g,
    left to right) — IEEE * and / are correctly rounded, so identical
    exact-integer operands in identical order give identical doubles;
    pow's ulp slack is absorbed by the micro-unit pin on each weight."""
    from .catalog import MIXTURE_SEED

    return f"""
    WITH counts AS (
      SELECT {group_col} AS g, COUNT(*) AS n_g FROM documents GROUP BY 1),
    w AS (
      SELECT g, n_g,
             CAST(ROUND(pow(CAST(n_g AS DOUBLE), {alpha}) * 1e6) AS BIGINT)
               AS w_micro
      FROM counts),
    tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS w_tot FROM w),
    dim AS (
      SELECT g, LEAST(CAST(1000000000 AS BIGINT),
                      CAST(ROUND(CAST({target} AS DOUBLE) * 1e9 * w_micro
                                 / w_tot / n_g) AS BIGINT)) AS rate_e9
      FROM w CROSS JOIN tot)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, d.source, dim.rate_e9
    FROM documents d JOIN dim ON d.{group_col} = dim.g
    WHERE ('0x' || substring(
             md5('{MIXTURE_SEED}:' || CAST(d.doc_id AS VARCHAR)),
             1, 8))::BIGINT * 1000000000
          < dim.rate_e9 * 4294967296
"""


def _semantic_dedup_sql(k: int = 8, n_iters: int = 2, thr: float = 0.3,
                        dim: int = 64, round_to: int = 9) -> str:
    """DuckDB twin of catalog.semantic_dedup_keep: the shared unrolled
    Lloyd trainer + trained assignment (_lloyd_ctes), then the
    within-cell keep-min-id near-dup rule. Cosines round to 6 decimals
    before the threshold compare, same pin as the Spark side."""
    ctes, _ = _lloyd_ctes(k, n_iters, dim, round_to)
    ctes.append(f"""dropped AS (
          SELECT DISTINCT b.vec_id
          FROM af a JOIN af b USING (cell)
          WHERE a.vec_id < b.vec_id
            AND ROUND({_cos_of('a.v', 'b.v')}, 6) >= {thr})""")
    body = ",\n        ".join(ctes)
    return f"""
        WITH {_EMB},
        {body}
        SELECT CAST(af.vec_id AS BIGINT) AS vec_id,
               CAST(af.cell AS INT) AS cell,
               d.vec_id IS NULL AS kept
        FROM af LEFT JOIN dropped d ON af.vec_id = d.vec_id
    """


# promoted into the driver window (round 5 rotation — see the rotation
# rationale at catalog.EXTRA_QUERIES); the three rows they displaced
# follow as EXTRA entries, still CI-hash-gated
ORACLES["semantic_dedup_keep"] = _semantic_dedup_sql()
ORACLES["mixture_temperature_lang"] = _mixture_temperature_sql()


def _semantic_dedup_lsh_sql(n_bits: int = 4, thr: float = 0.3) -> str:
    """Twin of catalog.sem_dedup_lsh: cells from the SAME seeded
    projection literals (_rp_bucket_sql), then the shared keep-min-id
    rule."""
    bucket = _rp_bucket_sql(n_bits)
    return f"""
        WITH {_EMB},
        a AS (SELECT vec_id, v, CAST({bucket} AS INT) AS cell FROM e),
        dropped AS (
          SELECT DISTINCT y.vec_id
          FROM a x JOIN a y USING (cell)
          WHERE x.vec_id < y.vec_id
            AND ROUND({_cos_of('x.v', 'y.v')}, 6) >= {thr})
        SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
               CAST(a.cell AS INT) AS cell,
               d.vec_id IS NULL AS kept
        FROM a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """


EXTRA_ORACLES["sem_dedup_lsh"] = _semantic_dedup_lsh_sql()


def _bpe_ctes(n_merges: int = 8) -> list[str]:
    """The shared unrolled trainer: one (pair-count, argmax, replace)
    CTE triple per merge round, like the Lloyd trainer's oracle. The
    sentinel-wrapped representation makes the merge one plain
    left-to-right replace in both engines (see operators/bpe.py).
    _bpe_sql and _bpe_segment_sql assemble their own final SELECTs from
    this list — no text surgery on each other's output."""
    us = "chr(31)"
    wrap = (f"{us} || array_to_string(list_append("
            "list_transform(range(1, length(word) + 1), "
            f"i -> substr(word, i, 1)), '</w>'), {us} || {us}) || {us}")
    ctes = [
        f"""w AS (SELECT unnest(list_filter(string_split(text, ' '),
               x -> x <> '' AND NOT contains(x, {us}))) AS word
           FROM documents)""",
        "wf AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word)",
        f"s0 AS (SELECT word, freq, {wrap} AS syms FROM wf)",
    ]
    for r in range(1, n_merges + 1):
        prev = f"s{r - 1}"
        ctes.append(f"""p{r} AS (
          SELECT a, b, SUM(freq) AS cnt FROM (
            SELECT freq, arr[i] AS a, arr[i + 1] AS b FROM (
              SELECT freq,
                     string_split(substr(syms, 2, length(syms) - 2),
                                  {us} || {us}) AS arr
              FROM {prev}),
            unnest(range(1, len(arr))) AS t(i))
          GROUP BY a, b)""")
        ctes.append(f"""m{r} AS (
          SELECT CAST({r} AS INT) AS merge_round, a, b, cnt FROM p{r}
          ORDER BY cnt DESC, a, b LIMIT 1)""")
        ctes.append(f"""s{r} AS (
          SELECT s.word, s.freq,
                 replace(s.syms,
                         {us} || m.a || {us} || {us} || m.b || {us},
                         {us} || m.a || m.b || {us}) AS syms
          FROM {prev} s, m{r} m)""")
    return ctes


def _bpe_sql(n_merges: int = 8) -> str:
    """Twin of catalog.bpe_train: union the per-round argmaxes."""
    unions = "\n        UNION ALL\n".join(
        f'SELECT merge_round, a AS "left", b AS "right", '
        f"CAST(cnt AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, n_merges + 1))
    return ("WITH " + ",\n        ".join(_bpe_ctes(n_merges))
            + "\n        " + unions)


EXTRA_ORACLES["bpe_train"] = _bpe_sql()


def _bpe_segment_sql(n_merges: int = 8) -> str:
    """Twin of catalog.bpe_segment_words: format the unrolled trainer's
    FINAL sequence state — which IS the segmentation of the training
    corpus (including the exhaustion case: an empty argmax empties the
    state identically in the Spark trainer)."""
    head = "WITH " + ",\n        ".join(_bpe_ctes(n_merges))
    return f"""{head}
        SELECT word, CAST(freq AS BIGINT) AS freq,
               CAST(len(arr) AS BIGINT) AS n_symbols,
               array_to_string(arr, ' ') AS symbols_csv
        FROM (SELECT word, freq,
                     string_split(substr(syms, 2, length(syms) - 2),
                                  chr(31) || chr(31)) AS arr
              FROM s{n_merges})
    """


EXTRA_ORACLES["bpe_segment_words"] = _bpe_segment_sql()

EXTRA_ORACLES["e2_set_difference"] = """
    SELECT source,
           COALESCE(array_to_string(
             [x for x in ['de','en','es','fr','zh'] if NOT list_contains(langs, x)],
             ','), '') AS missing_langs
    FROM (SELECT source, list(DISTINCT lang) AS langs
          FROM documents GROUP BY source)
"""

EXTRA_ORACLES["w2_sequence_expand"] = """
    SELECT l_orderkey, CAST(SUM(l_linenumber) AS BIGINT) AS n_expanded
    FROM lineitem GROUP BY l_orderkey
"""

EXTRA_ORACLES["embed_cosine_neardup"] = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 300)
    SELECT q.vec_id AS a_id, c.vec_id AS b_id, ROUND({_COS}, 6) AS sim
    FROM e q JOIN e c ON q.vec_id < c.vec_id
    WHERE ROUND({_COS}, 6) >= 0.3
"""

# Gap-fill twin: generate_series densifies each user's day range; the
# count-over/max-over pair is the same portable LOCF trick as Spark's.
ORACLES["gapfill_user_state"] = """
    WITH obs AS (
      SELECT user_id AS k, b, event_type AS s FROM (
        SELECT user_id, date_trunc('day', ts) AS b, event_type,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, date_trunc('day', ts)
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1),
    bounds AS (SELECT k, MIN(b) AS lo, MAX(b) AS hi FROM obs GROUP BY k),
    cal AS (
      SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS b
      FROM bounds),
    j AS (
      SELECT cal.k, cal.b, obs.s
      FROM cal LEFT JOIN obs ON cal.k = obs.k AND cal.b = obs.b),
    g AS (
      SELECT k, b, s,
             COUNT(s) OVER (PARTITION BY k ORDER BY b
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS grp
      FROM j)
    SELECT CAST(k AS BIGINT) AS user_id,
           strftime(b, '%Y-%m-%d') AS day,
           MAX(s) OVER (PARTITION BY k, grp) AS state,
           s IS NULL AS filled
    FROM g
"""

# RANGE-frame rolling twin: identical day-number ORDER key and integer
# micro-unit sums; the WINDOW clause is the value-bounded RANGE frame.
EXTRA_ORACLES["rolling_user_activity"] = """
    WITH daily AS (
      SELECT user_id AS k,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             COUNT(*) AS n_events,
             SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS vday
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT k, d, n_events,
             SUM(n_events) OVER w AS n_roll,
             SUM(vday) OVER w AS v_roll
      FROM daily
      WINDOW w AS (PARTITION BY k ORDER BY d
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT CAST(k AS BIGINT) AS user_id,
           strftime(DATE '1970-01-01' + d * INTERVAL 1 DAY,
                    '%Y-%m-%d') AS day,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_roll AS BIGINT) AS n_events_7d,
           CAST(v_roll AS BIGINT) AS value_micro_7d
    FROM r
"""

# SCD2 twin: lag-collapse then lead-close over the same (user, ts, id)
# order.
EXTRA_ORACLES["scd2_user_state"] = """
    WITH c AS (
      SELECT user_id AS k, ts, event_id, event_type AS state,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    ch AS (SELECT k, ts, event_id, state FROM c
           WHERE prev IS NULL OR prev <> state)
    SELECT CAST(k AS BIGINT) AS user_id, state, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY k ORDER BY ts, event_id)
             AS valid_to,
           LEAD(ts) OVER (PARTITION BY k ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM ch
"""


def flagship_oracle() -> dict[str, str]:
    """kg_pipeline_triples oracle over the fixed corpus — generated lazily
    so importing this module stays side-effect free until SQL is requested."""
    from .catalog import ensure_fixed_corpus

    return {"kg_pipeline_triples": _kg_pipeline_sql(ensure_fixed_corpus())}
