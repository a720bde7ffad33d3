"""DuckDB oracle SQL twins for contract.QUERIES.

Each string is ANSI SQL over the driver's pre-registered views (region
nation customer supplier part orders lineitem events documents
embeddings) producing EXACTLY the same rows (names, types, values) as the
Spark query. Floats are rounded inside both engines; counts are cast to
BIGINT (DuckDB sums default to HUGEINT); timestamps/dates stringified.

Queries with no entry here are approximate/hash-based by design
(MinHash/SimHash/IVF/HLL/KLL) and get the driver's rows-only check; their
exactness is covered by pytest with planted data instead.
"""

EVENT_TYPES_OK_SQL = "('click','view','purchase')"

_DRIFT_SQL = """
WITH ev AS (
  SELECT value, CASE WHEN extract(day FROM ts) <= 15 THEN 'a' ELSE 'b' END half
  FROM events
),
bounds AS (SELECT min(value) lo, max(value) hi FROM ev),
hist AS (
  SELECT half,
         least(19, greatest(0, cast(floor((value - lo) / ((hi - lo) / 20.0)) AS int))) bucket,
         count(*) cnt
  FROM ev, bounds
  GROUP BY 1, 2
),
a AS (SELECT bucket, sum(cnt) ca FROM hist WHERE half = 'a' GROUP BY 1),
b AS (SELECT bucket, sum(cnt) cb FROM hist WHERE half = 'b' GROUP BY 1),
ab AS (
  SELECT coalesce(a.bucket, b.bucket) bucket, coalesce(ca, 0) ca, coalesce(cb, 0) cb
  FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
),
pq AS (
  SELECT bucket,
         ca / (SELECT sum(ca) FROM ab)::double + 1e-6 p,
         cb / (SELECT sum(cb) FROM ab)::double + 1e-6 q
  FROM ab
),
c AS (
  SELECT abs(sum(p) OVER (ORDER BY bucket) - sum(q) OVER (ORDER BY bucket)) cdf_diff,
         (p - q) * ln(p / q) psi_term
  FROM pq
)
SELECT 'value' AS "column", 'a' AS part_a, 'b' AS part_b,
       round(max(cdf_diff), 6) AS ks_stat, round(sum(psi_term), 6) AS psi,
       CASE WHEN sum(psi_term) > 0.2 OR max(cdf_diff) > 0.2 THEN 'drift' ELSE 'ok' END AS verdict
FROM c
"""

ORACLES: dict[str, str] = {
    "rule_enum_event_type": f"""
        -- mirrors the Spark rule's P2 normalization (trim + blank->NULL)
        -- so padded/blank values diverge identically in both engines
        SELECT event_id, 'R_event_type' AS rule_id, 'error' AS severity,
               'turn' AS scope, event_type AS observed
        FROM events
        WHERE nullif(trim(event_type), '') IS NOT NULL
          AND nullif(trim(event_type), '') NOT IN {EVENT_TYPES_OK_SQL}
    """,
    "rule_required_props": """
        SELECT event_id, 'R_props_required' AS rule_id, 'error' AS severity,
               'turn' AS scope, coalesce(props, '<null>') AS observed
        FROM events WHERE props IS NULL OR trim(props) = ''
    """,
    "rule_numeric_value_range": """
        SELECT event_id, 'R_value_range' AS rule_id, 'error' AS severity,
               round(value, 2) AS value
        FROM events WHERE value < 0 OR value > 450
    """,
    "rule_expr_props_k": """
        SELECT event_id, 'R_props_k' AS rule_id, 'warning' AS severity,
               'turn' AS scope, regexp_extract(props, '"k": ([0-9]+)', 1) AS observed
        FROM events
        WHERE try_cast(regexp_extract(props, '"k": ([0-9]+)', 1) AS int) >= 90
    """,
    "rule_consistency_map": """
        -- P18: mapping {'N': 'O'} over normalized (trim + ''->NULL) key
        -- and value columns; observed is the RAW value column
        SELECT l_orderkey, l_linenumber, 'R_flag_status' AS rule_id,
               'error' AS severity,
               coalesce(cast(l_linestatus AS varchar), '<null>') AS observed
        FROM lineitem
        WHERE nullif(trim(l_returnflag), '') = 'N'
          AND nullif(trim(l_linestatus), '') IS NOT NULL
          AND nullif(trim(l_linestatus), '') <> 'O'
    """,
    "rule_conditional_bound": """
        -- P9: violation only when the value exceeds BOTH the percentage
        -- cap (100) and the absolute cap (300)
        SELECT event_id, 'R_value_dual_bound' AS rule_id, 'error' AS severity,
               round(value, 2) AS value
        FROM events
        WHERE try_cast(value AS double) > 100 AND try_cast(value AS double) > 300
    """,
    "rule_date_calendar": r"""
        -- P11: format-matching string that is not a real calendar date
        WITH d AS (
          SELECT o_orderkey,
                 strftime(o_orderdate, '%Y') || '-02-' || strftime(o_orderdate, '%d') AS feb_date
          FROM orders
        )
        SELECT o_orderkey, 'R_feb_date' AS rule_id, 'error' AS severity,
               feb_date AS observed
        FROM d
        WHERE regexp_matches(feb_date, '^\d{4}-\d{2}-\d{2}$')
          AND try_strptime(feb_date, '%Y-%m-%d') IS NULL
    """,
    "rule_url_schemes": """
        -- P15: scheme allow-list (http, https); ftp and mailto flagged
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'https://ex.org/' || doc_id
                      WHEN doc_id % 3 = 1 THEN 'ftp://ex.org/' || doc_id
                      ELSE 'mailto:user@ex.org' END AS link
          FROM documents
        )
        SELECT doc_id, 'R_link' AS rule_id, 'warning' AS severity,
               link AS observed
        FROM d WHERE NOT regexp_matches(link, '^(http|https)://')
    """,
    "rule_pair_required": """
        -- X1: exactly one side present (after trim + ''->NULL)
        WITH d AS (
          SELECT event_id,
                 CASE WHEN event_id % 5 = 0 THEN NULL
                      ELSE nullif(trim(event_type), '') END AS a_text,
                 CASE WHEN event_id % 7 = 0 THEN NULL ELSE 'x' END AS b_term
          FROM events
        )
        SELECT event_id, 'R_pair' AS rule_id, 'error' AS severity,
               coalesce(a_text, '<null>') || '|' || coalesce(b_term, '<null>') AS observed
        FROM d
        WHERE (a_text IS NOT NULL AND b_term IS NULL)
           OR (a_text IS NULL AND b_term IS NOT NULL)
    """,
    "rule_conditional_required": """
        -- X3: detail required unless event_type == 'view'; observed is the
        -- RAW condition column
        SELECT event_id, 'R_detail_required' AS rule_id, 'error' AS severity,
               coalesce(cast(event_type AS varchar), '<null>') AS observed
        FROM events
        WHERE nullif(trim(event_type), '') IS NOT NULL
          AND nullif(trim(event_type), '') <> 'view'
          AND event_id % 11 = 0
    """,
    "rule_term_format": """
        -- P3: underscore->colon normalization (all underscores, only when
        -- no colon present) then format check; blank passes as NULL;
        -- observed is the RAW term
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 4 = 0 THEN 'NCIT_' || doc_id
                      WHEN doc_id % 4 = 1 THEN 'NCIT:' || doc_id
                      WHEN doc_id % 4 = 2 THEN 'bad id'
                      ELSE ' ' END AS term
          FROM documents
        ),
        n AS (
          SELECT doc_id, term,
                 CASE WHEN t LIKE '%:%' THEN t
                      ELSE regexp_replace(t, '_', ':', 'g') END AS norm
          FROM (SELECT doc_id, term, nullif(trim(term), '') AS t FROM d)
        )
        SELECT doc_id, 'R_term_format' AS rule_id, 'error' AS severity,
               coalesce(term, '<null>') AS observed
        FROM n
        WHERE norm IS NOT NULL AND NOT regexp_matches(norm, '^[A-Za-z]+:[0-9]+$')
    """,
    "rule_sentinel_tiers": """
        -- P5: MISSING_VALUE_POLICY (constants.py:214-228) — sentinel
        -- short-circuits the base numeric check; base violation ('500' >
        -- max 100) fires at every tier with the rule's own severity
        WITH d AS (
          SELECT event_id, event_id % 10 AS m,
                 CASE WHEN event_id % 10 = 0 THEN 'not applicable'
                      WHEN event_id % 10 = 1 THEN 'not collected'
                      WHEN event_id % 10 = 2 THEN 'not provided'
                      WHEN event_id % 10 = 3 THEN 'restricted access'
                      WHEN event_id % 10 = 4 THEN ' '
                      WHEN event_id % 10 = 5 THEN '500'
                      ELSE '50' END AS reading
          FROM events
        )
        SELECT event_id, 'R_mand' AS rule_id,
               CASE WHEN m = 3 THEN 'warning' ELSE 'error' END AS severity,
               reading AS observed
        FROM d WHERE m IN (0, 1, 2, 3, 5)
        UNION ALL
        SELECT event_id, 'R_rec',
               CASE WHEN m IN (1, 2) THEN 'warning' ELSE 'error' END,
               reading
        FROM d WHERE m IN (1, 2, 5)
        UNION ALL
        SELECT event_id, 'R_opt', 'error', reading
        FROM d WHERE m IN (0, 1, 2, 3, 5)
    """,
    "rule_date_by_unit": r"""
        -- P10/X4: unit column selects the date regex
        WITH d AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 2 = 0 THEN 'YYYY' ELSE 'YYYY-MM-DD' END AS unit,
                 CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y')
                      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
                      ELSE 'n/a' END AS dt
          FROM orders
        )
        SELECT o_orderkey, 'R_date_unit' AS rule_id, 'error' AS severity,
               dt AS observed
        FROM d
        WHERE (unit = 'YYYY' AND NOT regexp_matches(dt, '^\d{4}$'))
           OR (unit = 'YYYY-MM-DD' AND NOT regexp_matches(dt, '^\d{4}-\d{2}-\d{2}$'))
    """,
    "rule_timestamp_strip": r"""
        -- P12: strip ' HH:MM:SS' then apply the date regex; observed is
        -- the RAW (unstripped) value
        WITH d AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 2 = 0
                      THEN strftime(o_orderdate, '%Y-%m-%d') || ' 00:00:00'
                      ELSE strftime(o_orderdate, '%Y/%m/%d') || ' 12:30:00' END AS dt
          FROM orders
        )
        SELECT o_orderkey, 'R_dt_strip' AS rule_id, 'error' AS severity,
               dt AS observed
        FROM d
        WHERE NOT regexp_matches(split_part(dt, ' ', 1), '^\d{4}-\d{2}-\d{2}$')
    """,
    "rule_time_photoperiod": r"""
        -- P13 HH:MM + P14 photoperiod-with-allow; blanks pass as NULL
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN '12:30'
                      WHEN doc_id % 3 = 1 THEN '99:99'
                      ELSE NULL END AS hhmm,
                 CASE WHEN doc_id % 4 = 0 THEN '12L:12D'
                      WHEN doc_id % 4 = 1 THEN 'natural light'
                      WHEN doc_id % 4 = 2 THEN 'constant'
                      ELSE NULL END AS photo
          FROM documents
        )
        SELECT doc_id, 'R_time' AS rule_id, 'error' AS severity,
               hhmm AS observed
        FROM d
        WHERE hhmm IS NOT NULL
          AND NOT regexp_matches(hhmm, '^([01]\d|2[0-3]):[0-5]\d$')
        UNION ALL
        SELECT doc_id, 'R_photo', 'warning', photo
        FROM d
        WHERE photo IS NOT NULL
          AND NOT regexp_matches(photo, '^[0-9]{1,2}L:[0-9]{1,2}D$')
          AND photo <> 'natural light'
    """,
    "rule_array_size": """
        -- A2-A4/A7: size in [1, 2] after dropping blank elements;
        -- observed is the normalized size
        WITH d AS (
          SELECT doc_id,
                 len(list_filter(
                   string_split(CASE WHEN doc_id % 4 = 0 THEN 'a'
                                     WHEN doc_id % 4 = 1 THEN 'a,b'
                                     WHEN doc_id % 4 = 2 THEN 'a,b,c'
                                     ELSE ' ' END, ','),
                   x -> trim(x) <> '')) AS n
          FROM documents
        )
        SELECT doc_id, 'R_parents_card' AS rule_id, 'error' AS severity,
               cast(n AS varchar) AS observed
        FROM d WHERE n < 1 OR n > 2
    """,
    "rule_array_elements": """
        -- A6 per-element regex + A5-predicate per-element enum; observed
        -- is the comma-joined offenders
        WITH d AS (
          SELECT doc_id,
                 string_split(CASE WHEN doc_id % 3 = 0 THEN 'https://a,https://b'
                                   WHEN doc_id % 3 = 1 THEN 'https://a,ftp://b'
                                   ELSE 'http://a' END, ',') AS urls,
                 string_split(CASE WHEN doc_id % 2 = 0 THEN 'click,view'
                                   ELSE 'click,zzz' END, ',') AS kinds
          FROM documents
        )
        SELECT doc_id, 'R_url_elems' AS rule_id, 'error' AS severity,
               array_to_string(list_filter(urls, x -> NOT regexp_matches(x, '^https?://')), ',') AS observed
        FROM d
        WHERE len(list_filter(urls, x -> NOT regexp_matches(x, '^https?://'))) > 0
        UNION ALL
        SELECT doc_id, 'R_kind_elems', 'error',
               array_to_string(list_filter(kinds, x -> x NOT IN ('click', 'view', 'purchase')), ',')
        FROM d
        WHERE len(list_filter(kinds, x -> x NOT IN ('click', 'view', 'purchase'))) > 0
    """,
    "prefix_route_docs": """
        -- J2: prefix (before ':', after _->: norm) must be a legal
        -- ontology; sentinel values are skipped
        WITH d AS (
          SELECT cast(doc_id AS varchar) AS conv_id,
                 CASE WHEN doc_id % 7 = 0 THEN 'not provided'
                      WHEN doc_id % 3 = 0 THEN 'NCIT_12'
                      WHEN doc_id % 3 = 1 THEN 'FOO:9'
                      ELSE 'PATO:5' END AS term
          FROM documents
        ),
        n AS (
          SELECT conv_id, term,
                 CASE WHEN term LIKE '%:%' THEN term
                      ELSE regexp_replace(term, '_', ':', 'g') END AS norm
          FROM d
          WHERE term NOT IN ('not applicable', 'not collected', 'not provided', 'restricted access')
        )
        SELECT conv_id, 'R_prefix' AS rule_id, 'error' AS severity,
               'turn' AS scope, term AS observed
        FROM n WHERE split_part(norm, ':', 1) NOT IN ('NCIT', 'PATO')
    """,
    "subclass_docs": """
        -- J4: is-a transitive closure (WITH RECURSIVE over the same
        -- literal edges) — term must have NCIT:1 among {self} U ancestors
        WITH RECURSIVE edges(child, parent) AS (
          VALUES ('NCIT:1', 'ROOT'), ('NCIT:2', 'NCIT:1'), ('NCIT:3', 'OTHER')
        ),
        anc(term, a) AS (
          SELECT child, child FROM edges
          UNION
          SELECT anc.term, e.parent FROM anc JOIN edges e ON anc.a = e.child
        ),
        d AS (
          SELECT cast(doc_id AS varchar) AS conv_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'NCIT:1'
                      WHEN doc_id % 3 = 1 THEN 'NCIT:2'
                      ELSE 'NCIT:3' END AS term
          FROM documents
        )
        SELECT conv_id, 'R_subclass' AS rule_id, 'error' AS severity,
               'turn' AS scope, term AS observed
        FROM d
        WHERE EXISTS (SELECT 1 FROM anc WHERE anc.term = d.term)
          AND NOT EXISTS (SELECT 1 FROM anc WHERE anc.term = d.term AND anc.a = 'NCIT:1')
    """,
    "label_match_customer": """
        -- J3: provided text must equal the dim label (case-insensitive);
        -- WARNING severity
        SELECT cast(c_custkey AS varchar) AS conv_id,
               'R_nation_label' AS rule_id, 'warning' AS severity,
               'turn' AS scope,
               CASE WHEN c_custkey % 5 = 0 THEN 'WRONG' ELSE lower(n_name) END AS observed
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE lower(CASE WHEN c_custkey % 5 = 0 THEN 'WRONG' ELSE lower(n_name) END)
              <> lower(n_name)
    """,
    "parent_attr_customer": """
        -- J8: child segment must equal decade-root parent's segment
        WITH e AS (
          SELECT cast(c_custkey AS varchar) AS id,
                 CASE WHEN c_custkey % 10 <> 0
                      THEN cast(c_custkey - (c_custkey % 10) AS varchar) END AS pid,
                 c_mktsegment AS attr
          FROM customer
        )
        SELECT c.id AS conv_id, 'R_parent_seg' AS rule_id, 'error' AS severity,
               'conv' AS scope, c.attr || '!=' || p.attr AS observed
        FROM e c JOIN e p ON c.pid = p.id
        WHERE c.attr <> p.attr
    """,
    "circular_customer": """
        -- J9: 1-hop circularity over planted mutual pointers; both
        -- directions emit
        WITH e AS (
          SELECT cast(c_custkey AS varchar) AS child,
                 cast(CASE WHEN c_custkey % 100 = 0 THEN c_custkey + 1
                           WHEN c_custkey % 100 = 1 THEN c_custkey - 1
                           ELSE c_custkey + 1000000 END AS varchar) AS parent
          FROM customer
        )
        SELECT DISTINCT a.child AS conv_id, 'R_circular' AS rule_id,
               'error' AS severity, 'conv' AS scope,
               a.child || '<->' || a.parent AS observed
        FROM e a JOIN e b ON a.child = b.parent AND a.parent = b.child
    """,
    "nested_elements_docs": """
        -- A5: explode {text,term} elements against dim
        -- {NCIT:1: Alpha, NCIT:2: Beta}: elem1 term always exists (text
        -- 'Wrong' mismatches on doc_id%5), elem2 term is the missing
        -- NCIT:9 on doc_id%3
        WITH f AS (SELECT cast(doc_id AS varchar) AS conv_id,
                          doc_id % 5 AS m5, doc_id % 3 AS m3
                   FROM documents)
        SELECT conv_id, 'R_term_exists' AS rule_id, 'error' AS severity,
               'turn' AS scope, 'NCIT:9' AS observed
        FROM f WHERE m3 = 0
        UNION ALL
        SELECT conv_id, 'R_term_label', 'warning', 'turn', 'Wrong'
        FROM f WHERE m5 = 0
    """,
    "schema_check_events": """
        -- the P17 check is driver-side metadata over a FIXED declared
        -- contract vs the parquet schema, so its expected output is a
        -- constant relation
        SELECT * FROM (VALUES
          ('R_column_type',    'error', 'table', 'value:double!=float'),
          ('R_missing_column', 'error', 'table', 'session_id:string'),
          ('R_unknown_column', 'error', 'table', 'props:string')
        ) t(rule_id, severity, scope, observed)
    """,
    "uniqueness_lineitem": """
        SELECT cast(l_orderkey AS varchar) AS conv_id, l_linenumber AS turn_idx,
               'R_turn_unique' AS rule_id, 'error' AS severity, 'turn' AS scope,
               cast(count(*) AS varchar) AS observed
        FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
    """,
    "referential_user_supplier": """
        SELECT cast(event_id AS varchar) AS conv_id, 'R_user_known' AS rule_id,
               'error' AS severity, 'turn' AS scope, cast(user_id AS varchar) AS observed
        FROM events WHERE user_id NOT IN (SELECT s_suppkey FROM supplier)
    """,
    "allowed_pairs_orders": """
        SELECT cast(o_orderkey AS varchar) AS conv_id, 'R_seg_prio' AS rule_id,
               'error' AS severity, 'turn' AS scope,
               c_mktsegment || '|' || o_orderpriority AS observed
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE NOT EXISTS (
          SELECT 1 FROM (
            VALUES ('BUILDING'),('AUTOMOBILE'),('MACHINERY'),('HOUSEHOLD'),('FURNITURE')
          ) s(seg), (VALUES ('1-URGENT'),('2-HIGH'),('3-MEDIUM')) p(prio)
          WHERE s.seg = c_mktsegment AND p.prio = o_orderpriority
        )
    """,
    "window_rules_lineitem": """
        WITH w AS (
          SELECT cast(l_orderkey AS varchar) conv_id, l_linenumber turn_idx, l_shipdate ts,
                 lag(l_linenumber) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_shipdate) prev_idx,
                 lag(l_shipdate)   OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_shipdate) prev_ts
          FROM lineitem
        )
        SELECT conv_id, turn_idx, 'R_turn_contiguous' AS rule_id, 'warning' AS severity,
               'turn' AS scope,
               cast(prev_idx AS varchar) || '->' || cast(turn_idx AS varchar) AS observed
        FROM w WHERE prev_idx IS NOT NULL AND turn_idx > prev_idx + 1
        UNION ALL
        SELECT conv_id, turn_idx, 'R_ts_monotonic', 'error', 'turn', cast(ts AS varchar)
        FROM w WHERE prev_ts IS NOT NULL AND ts < prev_ts
    """,
    "verdicts_events_daily": """
        WITH f AS (
          SELECT cast(user_id AS varchar) conv_id, event_id, event_type, value,
                 cast(ts AS date) ds
          FROM events
        ),
        v AS (
          SELECT conv_id, event_id, ds, 1 err, 0 warn FROM f
          WHERE nullif(trim(event_type), '') IS NOT NULL
            AND nullif(trim(event_type), '') NOT IN ('click','view','purchase')
          UNION ALL
          SELECT conv_id, event_id, ds, 0, 1 FROM f WHERE value < 0 OR value > 450
        ),
        pt AS (SELECT ds, conv_id, event_id, max(err) he, max(warn) hw FROM v GROUP BY 1,2,3),
        ta AS (
          SELECT ds, sum(he) error_turns,
                 sum(CASE WHEN hw = 1 AND he = 0 THEN 1 ELSE 0 END) warning_only_turns
          FROM pt GROUP BY 1
        ),
        tot AS (SELECT ds, count(*) total_turns, count(DISTINCT conv_id) n_conversations FROM f GROUP BY 1)
        SELECT cast(tot.ds AS varchar) ds,
               cast(total_turns AS bigint) total_turns,
               cast(n_conversations AS bigint) n_conversations,
               cast(total_turns - coalesce(error_turns, 0) AS bigint) valid_turns,
               cast(coalesce(error_turns, 0) AS bigint) error_turns,
               cast(coalesce(warning_only_turns, 0) AS bigint) warning_only_turns,
               cast(0 AS bigint) relationship_errors,
               CASE WHEN coalesce(error_turns, 0) > 0 THEN 'fail'
                    WHEN coalesce(warning_only_turns, 0) > 0 THEN 'pass_with_warnings'
                    ELSE 'pass' END verdict
        FROM tot LEFT JOIN ta ON tot.ds = ta.ds
    """,
    "column_stats_orders": """
        SELECT 'all' AS part, 'o_orderkey' AS "column", cast(count(*) AS bigint) n,
               cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) n_null,
               round(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) / count(*)::double, 6) null_rate,
               cast(min(o_orderkey) AS varchar) min, cast(max(o_orderkey) AS varchar) max
        FROM orders
        UNION ALL
        SELECT 'all', 'o_orderstatus', cast(count(*) AS bigint),
               cast(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS bigint),
               round(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) / count(*)::double, 6),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'all', 'o_orderdate', cast(count(*) AS bigint),
               cast(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS bigint),
               round(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) / count(*)::double, 6),
               cast(min(o_orderdate) AS varchar), cast(max(o_orderdate) AS varchar)
        FROM orders
        UNION ALL
        SELECT 'all', 'o_orderpriority', cast(count(*) AS bigint),
               cast(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS bigint),
               round(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) / count(*)::double, 6),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
    """,
    "salted_user_counts": """
        SELECT user_id, cast(count(*) AS bigint) AS n FROM events GROUP BY 1
    """,
    "drift_value_halves": _DRIFT_SQL,
    "drift_pandas_udf": _DRIFT_SQL,
    "sessionization_events": """
        WITH w AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_ts
          FROM events
        ),
        m AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN prev_ts IS NULL OR (epoch(ts) - epoch(prev_ts)) > 1800
                      THEN 1 ELSE 0 END new_sess
          FROM w
        ),
        s AS (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) sess_id
          FROM m
        ),
        ps AS (SELECT user_id, sess_id, count(*) n FROM s GROUP BY 1, 2)
        SELECT user_id, cast(count(*) AS bigint) n_sessions,
               cast(max(n) AS bigint) max_session_events
        FROM ps GROUP BY 1
    """,
    "conv_rollup": """
        SELECT user_id, cast(count(*) AS bigint) n_turns,
               cast(count(DISTINCT event_type) AS bigint) n_types,
               cast(epoch_us(max(ts)) - epoch_us(min(ts)) AS bigint) span_us,
               round(avg(value), 4) avg_value
        FROM events GROUP BY 1
    """,
    "tpch_q5_local_supplier": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) revenue,
               cast(count(*) AS bigint) n_items
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= timestamp '1996-01-01'
          AND o_orderdate < timestamp '1997-01-01'
        GROUP BY 1
    """,
    "drift_role_categorical": """
        WITH ev AS (
          SELECT event_type,
                 CASE WHEN extract(day FROM ts) <= 15 THEN 'a' ELSE 'b' END half
          FROM events
        ),
        top3 AS (
          SELECT event_type FROM ev GROUP BY 1
          ORDER BY count(*) DESC, event_type ASC LIMIT 3
        ),
        hist AS (
          SELECT half,
                 CASE WHEN event_type IN (SELECT event_type FROM top3)
                      THEN event_type ELSE '__OTHER__' END bucket,
                 count(*) cnt
          FROM ev GROUP BY 1, 2
        ),
        a AS (SELECT bucket, sum(cnt) ca FROM hist WHERE half = 'a' GROUP BY 1),
        b AS (SELECT bucket, sum(cnt) cb FROM hist WHERE half = 'b' GROUP BY 1),
        ab AS (
          SELECT coalesce(a.bucket, b.bucket) bucket, coalesce(ca, 0) ca, coalesce(cb, 0) cb
          FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
        ),
        pq AS (
          SELECT bucket,
                 ca / (SELECT sum(ca) FROM ab)::double + 1e-6 p,
                 cb / (SELECT sum(cb) FROM ab)::double + 1e-6 q
          FROM ab
        ),
        c AS (
          SELECT abs(sum(p) OVER (ORDER BY bucket) - sum(q) OVER (ORDER BY bucket)) cdf_diff,
                 (p - q) * ln(p / q) psi_term
          FROM pq
        )
        SELECT 'event_type' AS "column", 'a' AS part_a, 'b' AS part_b,
               round(max(cdf_diff), 6) AS ks_stat, round(sum(psi_term), 6) AS psi,
               CASE WHEN sum(psi_term) > 0.2 OR max(cdf_diff) > 0.2 THEN 'drift' ELSE 'ok' END AS verdict
        FROM c
    """,
    "tpch_q1_pricing": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) sum_qty,
               round(sum(l_extendedprice), 2) sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) sum_disc_price,
               round(avg(l_quantity), 4) avg_qty,
               round(avg(l_discount), 4) avg_disc,
               cast(count(*) AS bigint) count_order
        FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02'
        GROUP BY 1, 2
    """,
    "tpch_q3_shipping": """
        WITH j AS (
          SELECT l_orderkey, o_orderdate, o_orderpriority,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < timestamp '1995-03-15'
            AND l_shipdate > timestamp '1995-03-15'
          GROUP BY 1, 2, 3
        )
        SELECT l_orderkey, cast(o_orderdate AS varchar) o_orderdate, o_orderpriority,
               revenue, cast(rk AS int) rk
        FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey) rk FROM j)
        WHERE rk <= 10
    """,
    "dedup_exact_documents": r"""
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) content_md5,
               cast(count(*) AS bigint) n_docs, min(doc_id) keep_id
        FROM documents GROUP BY 1
    """,
    "dedup_pipeline_kept": r"""
        -- dedup_cli stages 1+3: exact-dedup survivors (min doc_id per
        -- normalized-text digest) filtered by quality + detected language;
        -- expressions mirror the text_quality / text_langid oracles
        WITH keep AS (
          SELECT min(doc_id) doc_id
          FROM documents
          GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        ),
        s AS (SELECT d.doc_id, d.text FROM documents d JOIN keep USING (doc_id)),
        b AS (
          SELECT doc_id, len(text) n_chars,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END n_words,
                 len(regexp_replace(text, '[^A-Za-z]', '', 'g')) n_alpha
          FROM s
        ),
        norm AS (
          SELECT doc_id,
                 CASE WHEN trim(lower(text)) = '' THEN []::varchar[]
                      ELSE string_split_regex(trim(lower(text)), '\s+') END ws
          FROM s
        ),
        scores AS (
          SELECT doc_id, sc.lang, sc.tb,
                 len(list_filter(ws, w -> list_contains(sc.markers, w))) hits
          FROM norm, (VALUES
            ('de', ['der','die','und','das','ein','nicht'], 3),
            ('en', ['the','a','of','and','to','is'], 2),
            ('es', ['el','la','los','que','una','es'], 1),
            ('fr', ['le','la','et','les','des','une'], 0)) sc(lang, markers, tb)
        ),
        best AS (
          SELECT doc_id, lang, hits,
                 row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, tb DESC) rn
          FROM scores
        ),
        lid AS (
          SELECT doc_id, CASE WHEN hits > 0 THEN lang ELSE 'und' END lang_guess
          FROM best WHERE rn = 1
        )
        SELECT b.doc_id, cast(b.n_words AS int) n_words, lid.lang_guess
        FROM b JOIN lid USING (doc_id)
        WHERE b.n_words >= 5
          AND round(b.n_alpha / greatest(b.n_chars, 1)::double, 6) >= 0.5
          AND lid.lang_guess <> 'und'
    """,
    "dedup_ngram_jaccard": r"""
        WITH norm AS (
          SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') t
          FROM documents
        ),
        words AS (SELECT doc_id, string_split(t, ' ') ws FROM norm),
        sh0 AS (
          SELECT DISTINCT doc_id,
                 CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
                      ELSE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] END sh
          FROM (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 2, 1) + 1)) i
                FROM words)
        ),
        -- max_df=1000 stop-shingle cap, mirroring the Spark operator:
        -- sizes are computed AFTER the cap (Jaccard over rare shingles)
        rare AS (SELECT sh FROM sh0 GROUP BY 1 HAVING count(*) <= 1000),
        sh AS (SELECT sh0.* FROM sh0 JOIN rare USING (sh)),
        sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.doc_id id_a, b.doc_id id_b, count(*) common
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(common / (sa.sz + sb.sz - common)::double, 6) jaccard
        FROM pairs JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(common / (sa.sz + sb.sz - common)::double, 6) >= 0.05
    """,
    "minhash_jaccard_verified": r"""
        -- exact twin of the MinHash exact-recall configuration: candidate
        -- recall is 1.0 at threshold 0.5 (see q_minhash_jaccard_verified),
        -- and the candidates are verified with exact Jaccard, so the output
        -- is precisely the ngram-Jaccard pair set (no max_df cap: the
        -- verification pass sizes over the FULL shingle sets)
        WITH norm AS (
          SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') t
          FROM documents
        ),
        words AS (SELECT doc_id, string_split(t, ' ') ws FROM norm),
        sh AS (
          SELECT DISTINCT doc_id,
                 CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
                      ELSE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] END sh
          FROM (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 2, 1) + 1)) i
                FROM words)
        ),
        sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.doc_id id_a, b.doc_id id_b, count(*) common
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(common / (sa.sz + sb.sz - common)::double, 6) jaccard
        FROM pairs JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(common / (sa.sz + sb.sz - common)::double, 6) >= 0.5
    """,
    "minhash_group_form": r"""
        -- group-form twin (see q_minhash_group_form): groups are
        -- normalized-text equivalence classes over the planted corpus
        -- (originals + doc_id<50 re-appended at +10000); intra edges =
        -- (min-id rep -> each other member, jaccard 1.0); inter edges =
        -- the exact-Jaccard >= 0.5 relation over group REPRESENTATIVES
        -- (the minhash_jaccard_verified recipe restricted to reps)
        WITH d AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50
        ),
        norm AS (
          SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') t
          FROM d
        ),
        g AS (SELECT t, min(doc_id) rep FROM norm GROUP BY t),
        m AS (SELECT g.rep, norm.doc_id id FROM norm JOIN g USING (t)),
        reps AS (SELECT rep AS doc_id, t FROM g),
        words AS (SELECT doc_id, string_split(t, ' ') ws FROM reps),
        sh AS (
          SELECT DISTINCT doc_id,
                 CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
                      ELSE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] END sh
          FROM (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 2, 1) + 1)) i
                FROM words)
        ),
        sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.doc_id id_a, b.doc_id id_b, count(*) common
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT rep AS rep_id, id AS member_id, 1.0::double jaccard
        FROM m WHERE id != rep
        UNION ALL
        SELECT id_a, id_b,
               round(common / (sa.sz + sb.sz - common)::double, 6) jaccard
        FROM pairs JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(common / (sa.sz + sb.sz - common)::double, 6) >= 0.5
    """,
    "text_quality": r"""
        WITH b AS (
          SELECT doc_id, text, len(text) n_chars,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END n_words,
                 len(regexp_replace(text, '[^A-Za-z]', '', 'g')) n_alpha
          FROM documents
        )
        SELECT doc_id, cast(n_chars AS int) n_chars, cast(n_words AS int) n_words,
               cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS int) n_tokens,
               round(len(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) / greatest(n_chars, 1)::double, 6) punct_ratio,
               round(n_alpha / greatest(n_chars, 1)::double, 6) alpha_ratio,
               round(len(regexp_replace(text, '[^A-Z]', '', 'g')) / greatest(n_alpha, 1)::double, 6) upper_ratio,
               round((n_chars - n_words + 1) / greatest(n_words, 1)::double, 6) mean_word_len
        FROM b
    """,
    "text_langid": r"""
        WITH norm AS (
          SELECT doc_id,
                 CASE WHEN trim(lower(text)) = '' THEN []::varchar[]
                      ELSE string_split_regex(trim(lower(text)), '\s+') END ws
          FROM documents
        ),
        scores AS (
          SELECT doc_id, s.lang, s.tb,
                 len(list_filter(ws, w -> list_contains(s.markers, w))) hits
          FROM norm, (VALUES
            ('de', ['der','die','und','das','ein','nicht'], 3),
            ('en', ['the','a','of','and','to','is'], 2),
            ('es', ['el','la','los','que','una','es'], 1),
            ('fr', ['le','la','et','les','des','une'], 0)) s(lang, markers, tb)
        ),
        best AS (
          SELECT doc_id, lang, hits,
                 row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, tb DESC) rn
          FROM scores
        ),
        nw AS (SELECT doc_id, greatest(len(ws), 1) nwords FROM norm)
        SELECT b.doc_id,
               CASE WHEN hits > 0 THEN lang ELSE 'und' END lang_guess,
               round(hits / nwords::double, 6) marker_ratio
        FROM best b JOIN nw ON b.doc_id = nw.doc_id WHERE rn = 1
    """,
    "text_fingerprint": r"""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) fp_md5
        FROM documents
    """,
    "ann_cosine_topk": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id < 10),
        s AS (
          SELECT query_id, e.vec_id corpus_id,
                 round(list_dot_product(qv, v)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) cosine
          FROM q, e WHERE e.vec_id != query_id
        ),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) rank FROM s)
        SELECT query_id, corpus_id, cosine, cast(rank AS int) rank FROM r WHERE rank <= 5
    """,
    "embedding_norm_stats": """
        WITH e AS (
          SELECT label,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) nrm
          FROM embeddings
        )
        SELECT label, cast(count(*) AS bigint) n,
               round(min(nrm), 4) min_norm, round(max(nrm), 4) max_norm,
               round(avg(nrm), 4) avg_norm
        FROM e GROUP BY label
    """,
    "multimodal_frame_sample": """
        -- n_frames is doc_id % 5 + 1 by pack_fake_media construction
        -- (doc_id >= 0); sampled frames = 0, 2, 4, ... < n_frames
        SELECT doc_id,
               cast(doc_id % 5 + 1 AS int) n_frames,
               cast(unnest(range(0, doc_id % 5 + 1, 2)) AS int) frame_idx
        FROM documents
    """,
    "embedding_near_dups": """
        -- brute-force all-pairs twin of the LSH-bucketed Spark operator,
        -- over the same duplicate-planted input (vec_id < 50 re-appended
        -- at vec_id+10000); exact because identical vectors share a bucket
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
          UNION ALL
          SELECT vec_id + 10000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 50
        ),
        p AS (
          SELECT a.vec_id id_a, b.vec_id id_b,
                 round(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) cosine
          FROM e a JOIN e b ON a.vec_id < b.vec_id
        )
        SELECT * FROM p WHERE cosine >= 0.95
    """,
    "simhash_planted_dups": """
        -- identical documents collide on all 64 simhash bits; the
        -- doc_id<50 subset has no natural sign-pattern collisions
        -- (empirically verified at every shipped sf), so hamming==0 pairs
        -- are exactly the planted (i, i+10000) duplicates
        SELECT doc_id AS id_a, doc_id + 10000 AS id_b, cast(0 AS int) AS hamming
        FROM documents WHERE doc_id < 50
    """,
    "ann_lsh": """
        -- n_planes=0 makes LSH probe one global bucket = full scan, so
        -- the result equals total-ordered brute-force top-k (see
        -- q_ann_lsh); cosine recomputed exactly here
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id < 8),
        s AS (
          SELECT query_id, e.vec_id corpus_id,
                 round(list_dot_product(qv, v)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) cosine
          FROM q, e WHERE e.vec_id != query_id
        ),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) rank FROM s)
        SELECT query_id, corpus_id, cosine, cast(rank AS int) rank FROM r WHERE rank <= 4
    """,
    "ann_ivf": """
        -- nprobe == nlist makes IVF scan the full corpus per query, so
        -- the result equals total-ordered brute-force top-k (see
        -- q_ann_ivf); cosine recomputed exactly here
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id < 5),
        s AS (
          SELECT query_id, e.vec_id corpus_id,
                 round(list_dot_product(qv, v)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) cosine
          FROM q, e WHERE e.vec_id != query_id
        ),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) rank FROM s)
        SELECT query_id, corpus_id, cosine, cast(rank AS int) rank FROM r WHERE rank <= 3
    """,
    "multimodal_meta": """
        -- NOTE: body_sum here is a per-character codepoint sum while the
        -- Spark decoder sums UTF-8 bytes — equal only because the testdata
        -- documents are ASCII (and doc_id >= 0 makes % == pmod). The byte
        -- sum is the correct multimodal semantics; this oracle documents
        -- the ASCII-only equivalence rather than weakening the operator.
        SELECT doc_id,
               cast(16 + octet_length(encode(text)) AS int) n_bytes,
               cast(doc_id % 64 + 8 AS int) width,
               cast(doc_id % 48 + 6 AS int) height,
               cast(doc_id % 5 + 1 AS int) n_frames,
               cast(list_sum(list_transform(range(1, len(text) + 1),
                                            i -> ord(substr(text, i, 1)))) AS bigint) body_sum
        FROM documents
    """,
}
