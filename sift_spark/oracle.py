"""DuckDB oracle SQL twins for every entry in ``sift_spark.queries``.

The SQL is generated from the same constants the Spark operators use
(entity lexicon, hash construction, window sizes), so semantics can't
drift. Tables ``region nation customer supplier part orders lineitem
events documents embeddings`` are pre-registered views on the same
parquet the Spark queries read.
"""

from __future__ import annotations

from sift_spark.functions.core import WIKI_PREFIX, sql_entity_set

# token table: (doc_id, pos [0-based int], anchor)
TOK = """tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS anchor
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
)"""

LINKS = f"""links AS (
  SELECT doc_id, pos, anchor, '{WIKI_PREFIX}' || anchor AS target
  FROM tok WHERE anchor IN {sql_entity_set()}
)"""

# documents as (doc_id, toks list)
DTOKS = """dtoks AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)"""

# entity vocab (rank by inlink count desc, target asc)
EVOCAB = """evocab AS (
  SELECT target, count, CAST(row_number() OVER (ORDER BY count DESC, target ASC) - 1 AS INT) AS rank
  FROM (SELECT target, count(*) AS count FROM links GROUP BY target)
)"""

# term vocab over unigrams, min_df=0 (all terms), rank by df desc, term asc
TVOCAB = """tvocab AS (
  SELECT term, df, CAST(row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS INT) AS rank
  FROM (SELECT anchor AS term, count(*) AS df
        FROM (SELECT DISTINCT doc_id, anchor FROM tok) GROUP BY anchor)
)"""

# idf over unigrams with df > 2 (min_df=2), idf rounded to 6dp
IDF = """idf AS (
  SELECT term, round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df), 6) AS idf
  FROM (SELECT anchor AS term, count(*) AS df
        FROM (SELECT DISTINCT doc_id, anchor FROM tok) GROUP BY anchor
        HAVING count(*) > 2)
)"""

# mention context (window = ±2 tokens) term pairs
CTX = """ctx AS (
  SELECT l.doc_id, l.pos, l.target, t.pos AS tpos, t.anchor AS term
  FROM links l JOIN tok t ON l.doc_id = t.doc_id AND t.pos BETWEEN l.pos - 2 AND l.pos + 2
)"""

ORACLE: dict[str, str] = {}

ORACLE["wikify"] = f"""
WITH {TOK},
off AS (
  SELECT doc_id, pos, anchor,
    CAST(COALESCE(SUM(length(anchor) + 1) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS start
  FROM tok)
SELECT doc_id, CAST(pos AS INT) AS pos, anchor, start,
       CAST(start + length(anchor) AS INT) AS stop,
       '{WIKI_PREFIX}' || anchor AS target
FROM off WHERE anchor IN {sql_entity_set()}
"""

ORACLE["entity_counts"] = f"""
WITH {TOK}, {LINKS}
SELECT target, count(*) AS count FROM links GROUP BY target HAVING count(*) > 1
"""

ORACLE["entity_name_counts"] = f"""
WITH {TOK}, {LINKS}
SELECT anchor, target, count(*) AS count
FROM links WHERE anchor != '' AND target != ''
GROUP BY anchor, target
"""

ORACLE["name_part_counts"] = f"""
WITH {TOK}, {LINKS},
allc AS (
  SELECT anchor AS term, 'B' AS spantype, count(*) AS count FROM links GROUP BY anchor
  UNION ALL
  SELECT anchor AS term, 'E' AS spantype, count(*) AS count FROM links GROUP BY anchor
  UNION ALL
  SELECT anchor AS term, 'O' AS spantype, count(*) AS count FROM tok
  GROUP BY anchor HAVING count(*) > 1
),
keeps AS (
  SELECT term FROM allc GROUP BY term
  HAVING max(CASE WHEN spantype = 'O' THEN 1 ELSE 0 END) = 1 AND count(*) > 1
)
SELECT a.term, a.spantype, a.count FROM allc a JOIN keeps USING (term)
"""

ORACLE["entity_inlinks"] = f"""
WITH {TOK}, {LINKS}
SELECT target, count(*) AS n_inlinks,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS inlinks
FROM (SELECT DISTINCT target, doc_id FROM links)
GROUP BY target
"""

ORACLE["entity_vocab"] = f"""
WITH {TOK}, {LINKS}, {EVOCAB}
SELECT target, count, rank FROM evocab WHERE rank >= 0 AND rank < 10000
"""

ORACLE["entity_comentions"] = f"""
WITH {TOK}, {LINKS}
SELECT doc_id, count(*) AS n_entities,
       string_agg(target, ',' ORDER BY target) AS entities
FROM (SELECT DISTINCT doc_id, target FROM links)
GROUP BY doc_id
"""

ORACLE["entity_relatedness"] = f"""
WITH {TOK}, {LINKS},
il AS (SELECT DISTINCT doc_id, target FROM links),
sizes AS (SELECT target, count(*) AS n FROM il GROUP BY target),
inter AS (
  SELECT l.target AS e1, r.target AS e2, count(*) AS inter
  FROM il l JOIN il r ON l.doc_id = r.doc_id AND l.target < r.target
  GROUP BY l.target, r.target
)
SELECT e1, e2, round(inter * 1.0 / (x.n + y.n - inter), 6) AS relatedness
FROM inter JOIN sizes x ON x.target = e1 JOIN sizes y ON y.target = e2
WHERE x.n >= 1 AND y.n >= 1
"""

ORACLE["mapped_comentions"] = f"""
WITH {TOK}, {LINKS}, {EVOCAB}
SELECT doc_id, count(*) AS n_entities,
       string_agg(CAST(rank AS VARCHAR), ',' ORDER BY rank) AS entity_ranks
FROM (SELECT DISTINCT doc_id, target FROM links) JOIN evocab USING (target)
GROUP BY doc_id
"""

ORACLE["term_frequencies"] = f"""
WITH {TOK},
grams AS (
  SELECT anchor AS term FROM tok
  UNION ALL
  SELECT term FROM (
    SELECT anchor || ' ' || lead(anchor) OVER (PARTITION BY doc_id ORDER BY pos) AS term
    FROM tok) WHERE term IS NOT NULL
)
SELECT term, count(*) AS count FROM grams GROUP BY term HAVING count(*) > 1
"""

ORACLE["term_doc_frequencies"] = f"""
WITH {TOK}
SELECT anchor AS term, count(*) AS df
FROM (SELECT DISTINCT doc_id, anchor FROM tok)
GROUP BY anchor HAVING count(*) > 2
"""

ORACLE["term_vocab"] = f"""
WITH {TOK}, {TVOCAB}
SELECT term, df, rank FROM tvocab WHERE rank >= 0 AND rank < 10000
"""

ORACLE["term_idfs"] = f"""
WITH {TOK}, {IDF}
SELECT term, idf FROM idf
"""

ORACLE["entity_mentions"] = f"""
WITH {TOK}, {LINKS}, {DTOKS}
SELECT l.target, l.doc_id AS source, CAST(l.pos AS INT) AS pos,
  array_to_string(t.toks[CAST(greatest(0, l.pos - 2) + 1 AS INT):CAST(least(len(t.toks) - 1, l.pos + 2) + 1 AS INT)], ' ') AS mention,
  CAST(l.pos - greatest(0, l.pos - 2) AS INT) AS span_start,
  CAST(l.pos - greatest(0, l.pos - 2) + 1 AS INT) AS span_stop
FROM links l JOIN dtoks t USING (doc_id)
"""

ORACLE["entity_mention_tf"] = f"""
WITH {TOK}, {LINKS}, {CTX}, {IDF},
tf AS (SELECT target, term, count(*) AS tf FROM ctx GROUP BY target, term),
w AS (SELECT target, term, sqrt(tf) * idf AS w FROM tf JOIN idf USING (term))
SELECT target, term,
       round(w / sqrt(sum(w * w) OVER (PARTITION BY target)), 6) AS weight
FROM w
"""

ORACLE["indexed_mentions"] = f"""
WITH {TOK}, {LINKS}, {CTX}, {TVOCAB}
SELECT c.target, c.doc_id AS source, CAST(c.pos AS INT) AS pos,
  string_agg(CAST(COALESCE(v.rank, -1) AS VARCHAR), ',' ORDER BY c.tpos) AS indexes,
  CAST(c.pos - greatest(0, c.pos - 2) AS INT) AS span_start,
  CAST(c.pos - greatest(0, c.pos - 2) + 1 AS INT) AS span_stop
FROM ctx c LEFT JOIN tvocab v ON v.term = c.term
GROUP BY c.target, c.doc_id, c.pos
"""

ORACLE["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_extendedprice), 6) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLE["q3_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > '1995-03-15' AND o_orderdate < '1995-03-15'
  AND c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

ORACLE["q5_local_supplier"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
  AND c_nationkey = s_nationkey
  AND r_name = 'ASIA'
GROUP BY n_name
"""

ORACLE["top_customers"] = """
SELECT c_mktsegment, rank, c_custkey, c_name, total_spend, n_orders
FROM (
  SELECT c.c_mktsegment, c.c_custkey, c.c_name, t.total_spend, t.n_orders,
         CAST(row_number() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY t.total_spend DESC, c.c_custkey ASC) AS INT) AS rank
  FROM (SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey) t
  JOIN customer c ON c.c_custkey = t.o_custkey
)
WHERE rank <= 5
"""

ORACLE["q4_order_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""

ORACLE["customers_without_orders"] = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""

ORACLE["revenue_rollup"] = """
SELECT CAST(coalesce(o_year, -1) AS INT) AS o_year,
       CAST(coalesce(o_quarter, -1) AS INT) AS o_quarter,
       round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(quarter(o_orderdate) AS INT) AS o_quarter, o_totalprice
      FROM orders)
GROUP BY ROLLUP (o_year, o_quarter)
"""

ORACLE["order_status_pivot"] = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
"""

ORACLE["price_percentiles"] = """
SELECT p_brand,
       CAST(round(quantile_cont(p_retailprice, 0.25), 6) AS DOUBLE) AS p25,
       CAST(round(quantile_cont(p_retailprice, 0.5), 6) AS DOUBLE) AS p50,
       CAST(round(quantile_cont(p_retailprice, 0.75), 6) AS DOUBLE) AS p75,
       count(*) AS n_parts
FROM part GROUP BY p_brand
"""

ORACLE["events_json_buckets"] = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1
"""

ORACLE["events_running"] = """
SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_value,
  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3
FROM events
"""

ORACLE["asof_clicks_errors"] = """
WITH clicks AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS click_es
  FROM events WHERE event_type = 'click'
),
errors AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS error_es
  FROM events WHERE event_type = 'error'
)
SELECT c.user_id, c.event_id, c.click_es, e.error_es AS last_error_es
FROM clicks c ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND c.click_es >= e.error_es
"""

ORACLE["clicks_errors_interval"] = """
WITH clicks AS (
  SELECT user_id, event_id AS click_id, CAST(floor(epoch(ts)) AS BIGINT) AS click_es
  FROM events WHERE event_type = 'click'
),
errors AS (
  SELECT user_id AS e_user, event_id AS error_id, CAST(floor(epoch(ts)) AS BIGINT) AS error_es
  FROM events WHERE event_type = 'error'
)
SELECT c.user_id, c.click_id, e.error_id, c.click_es - e.error_es AS lag_s
FROM clicks c JOIN errors e
  ON c.user_id = e.e_user
 AND e.error_es <= c.click_es
 AND e.error_es >= c.click_es - 1800
"""

ORACLE["events_tumbling"] = """
SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""

ORACLE["q7_volume_shipping"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""

ORACLE["q10_returned_items"] = """
SELECT c_custkey, c_name, n_name, revenue, rank FROM (
  SELECT c_custkey, c_name, n_name, revenue,
         CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS INT) AS rank
  FROM (SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2, 3))
WHERE rank <= 20
"""

ORACLE["q9_product_profit"] = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""

ORACLE["q13_custdist"] = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""

ORACLE["q14_promo_revenue"] = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-02-01'
"""

ORACLE["q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""

ORACLE["q17_small_qty"] = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice,
         avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n_lines
FROM li WHERE l_quantity < 0.2 * avg_qty
"""

ORACLE["q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty, rank FROM (
  SELECT c_custkey, c_name, o_orderkey,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
         round(o_totalprice, 2) AS o_totalprice, total_qty,
         CAST(row_number() OVER (ORDER BY total_qty DESC, o_orderkey ASC) AS INT) AS rank
  FROM orders JOIN big ON o_orderkey = l_orderkey
  JOIN customer ON o_custkey = c_custkey)
WHERE rank <= 100
"""

ORACLE["q19_disjunctive"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""

ORACLE["q22_idle_customers"] = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""

ORACLE["orders_cube"] = """
SELECT CAST(coalesce(o_year, -1) AS INT) AS o_year,
       coalesce(prio, 'ALL') AS prio,
       round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             o_orderpriority AS prio, o_totalprice FROM orders)
GROUP BY CUBE (o_year, prio)
"""

ORACLE["fuzzy_name_pairs"] = """
WITH c AS (SELECT c_custkey, c_name FROM customer),
b AS (
  SELECT c_custkey, c_name, p,
         substr(c_name, 1, p - 1) || chr(1) || substr(c_name, p + 1) AS key
  FROM c, unnest(generate_series(1, length(c_name))) AS u(p)
),
cand AS (
  SELECT l.c_custkey AS k1, l.c_name AS n1,
         r.c_custkey AS k2, r.c_name AS n2
  FROM b l JOIN b r ON l.p = r.p AND l.key = r.key AND l.c_custkey < r.c_custkey
)
SELECT k1, k2, CAST(levenshtein(n1, n2) AS INT) AS dist
FROM cand WHERE levenshtein(n1, n2) <= 1
"""

ORACLE["order_priority_unpivot"] = """
WITH pr AS (SELECT DISTINCT o_orderpriority FROM orders),
st(status) AS (VALUES ('O'), ('F'), ('P')),
cnt AS (SELECT o_orderpriority AS prio, o_orderstatus AS status, count(*) AS n
        FROM orders GROUP BY 1, 2)
SELECT pr.o_orderpriority, st.status, coalesce(cnt.n, 0) AS n
FROM pr CROSS JOIN st
LEFT JOIN cnt ON cnt.prio = pr.o_orderpriority AND cnt.status = st.status
"""

ORACLE["entity_pmi"] = f"""
WITH {TOK}, {LINKS},
il AS (SELECT DISTINCT doc_id, target FROM links),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM il),
marg AS (SELECT target, count(*) AS c FROM il GROUP BY target),
p AS (
  SELECT l.target AS e1, r.target AS e2, count(*) AS pair_count
  FROM il l JOIN il r ON l.doc_id = r.doc_id AND l.target < r.target
  GROUP BY 1, 2
)
SELECT e1, e2, pair_count,
       round(ln((SELECT n_docs FROM nd) * pair_count * 1.0 / (m1.c * m2.c)), 6) AS pmi
FROM p JOIN marg m1 ON m1.target = e1 JOIN marg m2 ON m2.target = e2
"""

ORACLE["doc_top_terms"] = f"""
WITH {TOK}, {IDF},
tf AS (SELECT doc_id, anchor AS term, count(*) AS tf FROM tok GROUP BY 1, 2),
w AS (SELECT doc_id, term, sqrt(tf) * idf AS wt FROM tf JOIN idf USING (term)),
top AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, term ASC) AS rn
    FROM w)
  WHERE rn <= 3
)
SELECT doc_id, string_agg(term, ',' ORDER BY term) AS top_terms
FROM top GROUP BY doc_id
"""

ORACLE["events_funnel"] = """
WITH m AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_0,
    min(CASE WHEN event_type = 'click' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_1,
    min(CASE WHEN event_type = 'purchase' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_2
  FROM events GROUP BY user_id
),
w AS (SELECT
  CAST(sum(CASE WHEN t_0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_0,
  CAST(sum(CASE WHEN t_0 IS NOT NULL AND t_1 IS NOT NULL AND t_1 > t_0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
  CAST(sum(CASE WHEN t_0 IS NOT NULL AND t_1 IS NOT NULL AND t_1 > t_0
                 AND t_2 IS NOT NULL AND t_2 > t_1 THEN 1 ELSE 0 END) AS BIGINT) AS n_2
  FROM m)
SELECT 0 AS step_idx, 'view' AS step, n_0 AS n_users FROM w
UNION ALL SELECT 1, 'click', n_1 FROM w
UNION ALL SELECT 2, 'purchase', n_2 FROM w
"""

ORACLE["churned_customers"] = """
SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1997
"""

ORACLE["repeat_customers"] = """
SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1997
"""

ORACLE["customer_ntile"] = """
SELECT c_custkey, c_nationkey,
       CAST(ntile(4) OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal ASC, c_custkey ASC) AS INT) AS quartile
FROM customer
"""

ORACLE["events_sliding"] = """
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type, value FROM events
),
w AS (
  SELECT unnest(generate_series(es - (es % 300) - 600 + 300,
                                es - (es % 300), 300)) AS window_start,
         event_type, value
  FROM ev
)
SELECT window_start, event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM w GROUP BY 1, 2
"""

ORACLE["events_histogram"] = """
SELECT event_type,
       CAST(least(greatest(floor(value / 10.0), 0), 9) AS INT) AS bin,
       count(*) AS n_events
FROM events GROUP BY 1, 2
"""

ORACLE["lineitem_stats"] = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(stddev_samp(l_extendedprice), 4) AS std_price,
       count(*) AS n_lines
FROM lineitem GROUP BY l_returnflag
"""

ORACLE["q6_forecast_revenue"] = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 25
"""

ORACLE["parts_above_brand_avg"] = """
SELECT p_partkey, p_brand, round(p_retailprice, 2) AS p_retailprice,
       round(brand_avg, 6) AS brand_avg
FROM (SELECT p_partkey, p_brand, p_retailprice,
             avg(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg
      FROM part)
WHERE p_retailprice > brand_avg
"""

ORACLE["daily_revenue_spine"] = """
WITH bounds AS (
  SELECT min(CAST(o_orderdate AS DATE)) AS d0, max(CAST(o_orderdate AS DATE)) AS d1 FROM orders
),
spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
       coalesce(d.revenue, 0.0) AS revenue,
       coalesce(d.n_orders, 0) AS n_orders
FROM spine s LEFT JOIN daily d ON d.day = s.day
"""

ORACLE["events_trending"] = """
SELECT window_start, event_type, n_events, rank FROM (
  SELECT window_start, event_type, n_events,
         CAST(row_number() OVER (PARTITION BY window_start
              ORDER BY n_events DESC, event_type ASC) AS INT) AS rank
  FROM (SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
               event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2))
WHERE rank <= 3
"""

_pr_iters = ",\n".join(
    f"""r{i} AS (
  SELECT e.dst AS node, 0.15 / (SELECT n FROM nn) + 0.85 * sum(p.r / d.deg) AS r
  FROM pedges e JOIN r{i - 1} p ON p.node = e.src JOIN pdeg d ON d.src = e.src
  GROUP BY e.dst
)"""
    for i in range(1, 6)
)

ORACLE["entity_pagerank"] = f"""
WITH {TOK}, {LINKS},
il AS (SELECT DISTINCT doc_id, target FROM links),
pedges AS (
  SELECT DISTINCT l.target AS src, r.target AS dst
  FROM il l JOIN il r ON l.doc_id = r.doc_id AND l.target != r.target
),
pdeg AS (SELECT src, count(*) AS deg FROM pedges GROUP BY src),
nn AS (SELECT count(*) AS n FROM pdeg),
r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r FROM pdeg),
{_pr_iters}
SELECT node AS entity, round(r, 6) AS pagerank FROM r5
"""


ORACLE["q2_min_cost_supplier"] = """
WITH sups AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), offers AS (
  SELECT p_partkey, p_name, l_suppkey,
         round(avg(l_extendedprice / l_quantity), 6) AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size >= 40
  GROUP BY p_partkey, p_name, l_suppkey
), ranked AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, n_name, unit_cost,
         min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM offers JOIN sups ON l_suppkey = s_suppkey
)
SELECT p_partkey, p_name, s_suppkey, s_name, n_name, unit_cost
FROM ranked WHERE unit_cost = min_cost
"""

ORACLE["q8_market_share"] = """
WITH in_region AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
), ords AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year
  FROM orders JOIN in_region ON o_custkey = c_custkey
  WHERE year(o_orderdate) BETWEEN 1995 AND 1997
), supp_nat AS (
  SELECT s_suppkey, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
SELECT o_year,
       round(sum(CASE WHEN n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN ords ON l_orderkey = o_orderkey
JOIN supp_nat ON l_suppkey = s_suppkey
GROUP BY o_year
"""

ORACLE["q11_important_parts"] = """
WITH sups AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
), per_part AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
  FROM lineitem JOIN sups ON l_suppkey = s_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey, round(value, 2) AS part_value
FROM per_part
WHERE value > 0.01 * (SELECT sum(value) FROM per_part)
"""

ORACLE["q12_late_shipments"] = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""

ORACLE["q16_supplier_diversity"] = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#5' AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%000000003%')
GROUP BY p_brand, p_type, p_size
"""

ORACLE["q20_dominant_suppliers"] = """
WITH per AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
  GROUP BY l_partkey, l_suppkey
), dom AS (
  SELECT l_suppkey
  FROM (SELECT l_suppkey, supp_qty,
               sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM per)
  WHERE supp_qty > 0.2 * part_qty
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
"""

ORACLE["q21_waiting_suppliers"] = """
WITH li AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey, max(l_shipdate) AS max_ship,
         count(DISTINCT l_suppkey) AS n_supp
  FROM li GROUP BY l_orderkey
), blamed AS (
  SELECT li.l_orderkey,
         count(DISTINCT li.l_suppkey) AS n_late,
         max(li.l_suppkey) AS suppkey
  FROM li JOIN per_order p ON li.l_orderkey = p.l_orderkey
  WHERE p.n_supp > 1 AND li.l_shipdate = p.max_ship
  GROUP BY li.l_orderkey
  HAVING count(DISTINCT li.l_suppkey) = 1
), numwait AS (
  SELECT suppkey, count(*) AS numwait FROM blamed GROUP BY suppkey
)
SELECT s_suppkey, s_name, numwait, rank FROM (
  SELECT s_suppkey, s_name, numwait,
         CAST(row_number() OVER (ORDER BY numwait DESC, s_name ASC) AS INT) AS rank
  FROM numwait JOIN supplier ON suppkey = s_suppkey)
WHERE rank <= 100
"""


from sift_spark.oracle_ops import ORACLE_OPS  # noqa: E402

ORACLE.update(ORACLE_OPS)

ORACLE["events_sessionize"] = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL THEN 1
         WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800 THEN 1
         ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(sum(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(floor(min(epoch(ts))) AS BIGINT) AS session_start,
       CAST(floor(max(epoch(ts))) AS BIGINT) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM s GROUP BY user_id, session_id
"""

ORACLE["retention_cohorts"] = """
WITH wk AS (
  SELECT DISTINCT user_id,
         CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week
  FROM events
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
SELECT cohort_week, week - cohort_week AS week_n,
       count(DISTINCT user_id) AS n_users
FROM wk JOIN cohort USING (user_id)
GROUP BY 1, 2
"""

ORACLE["rfm_segments"] = """
WITH per AS (
  SELECT o_custkey AS c_custkey, max(CAST(o_orderdate AS DATE)) AS last_order,
         count(*) AS frequency, round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY 1
),
mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_date FROM orders),
base AS (
  SELECT c_custkey, CAST(date_diff('day', last_order, max_date) AS INT) AS recency_days,
         frequency, monetary
  FROM per CROSS JOIN mx
),
tiled AS (
  SELECT c_custkey, recency_days, frequency, monetary,
    CAST(ntile(4) OVER (ORDER BY recency_days DESC, c_custkey ASC) AS INT) AS r,
    CAST(ntile(4) OVER (ORDER BY frequency ASC, c_custkey ASC) AS INT) AS f,
    CAST(ntile(4) OVER (ORDER BY monetary ASC, c_custkey ASC) AS INT) AS m
  FROM base
)
SELECT c_custkey, recency_days, frequency, monetary, r, f, m,
       r * 100 + f * 10 + m AS segment
FROM tiled
"""

ORACLE["comention_triangles"] = """
WITH tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS anchor
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
), links AS (
  SELECT doc_id, pos, anchor, 'wiki/' || anchor AS target
  FROM tok WHERE anchor IN ('column', 'customer', 'data', 'query', 'row', 'spark', 'stream', 'table', 'vector', 'window')
),
il AS (SELECT DISTINCT doc_id, target FROM links),
e AS (SELECT DISTINCT l.target AS a, r.target AS b
      FROM il l JOIN il r ON l.doc_id = r.doc_id AND l.target < r.target),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT target, count(*) AS n_triangles FROM (
  SELECT unnest([x, y, z]) AS target FROM tri) GROUP BY target
"""


ORACLE["events_anomaly"] = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, round(value, 2) AS value,
       CASE WHEN sd = 0 THEN NULL ELSE round((value - mu) / sd, 6) END AS z
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE sd <> 0 AND abs((value - mu) / sd) > 3.0
"""

ORACLE["events_seasonality"] = """
SELECT (CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) + 4) % 7 AS dow,
       event_type, count(*) AS n_events, round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2
"""

ORACLE["text_normalize"] = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, norm_text,
       CAST(CASE WHEN norm_text = '' THEN 0
                 ELSE len(string_split(norm_text, ' ')) END AS INT) AS n_norm_tokens
FROM n
"""

ORACLE["comention_degrees"] = """
WITH tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS anchor
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
), links AS (
  SELECT doc_id, pos, anchor, 'wiki/' || anchor AS target
  FROM tok WHERE anchor IN ('column', 'customer', 'data', 'query', 'row', 'spark', 'stream', 'table', 'vector', 'window')
),
il AS (SELECT DISTINCT doc_id, target FROM links),
e AS (SELECT DISTINCT l.target AS a, r.target AS b
      FROM il l JOIN il r ON l.doc_id = r.doc_id AND l.target < r.target),
sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
deg AS (SELECT a AS target, count(*) AS degree FROM sym GROUP BY a),
nd AS (SELECT target, count(*) AS n_docs FROM il GROUP BY target)
SELECT target, degree, n_docs FROM deg JOIN nd USING (target)
"""

ORACLE["weighted_sample"] = """
WITH pr AS (
  SELECT doc_id, n_chars,
         round(-ln((cast(concat('0x', substr(md5(concat('wsample:', cast(doc_id as varchar))), 1, 15)) as bigint) % 1000000 + 0.5) / 1000000.0) / n_chars, 6) AS priority
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, priority, rank FROM (
  SELECT doc_id, n_chars, priority,
         CAST(row_number() OVER (ORDER BY priority ASC, doc_id ASC) AS INT) AS rank
  FROM pr)
WHERE rank <= 100
"""


ORACLE["name_entity_priors"] = """
WITH tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS anchor
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
), links AS (
  SELECT doc_id, pos, anchor, 'wiki/' || anchor AS target
  FROM tok WHERE anchor IN ('column', 'customer', 'data', 'query', 'row', 'spark', 'stream', 'table', 'vector', 'window')
),
c AS (SELECT anchor, target, count(*) AS count
      FROM links WHERE anchor != '' AND target != ''
      GROUP BY anchor, target)
SELECT anchor, target, count,
       round(count * 1.0 / sum(count) OVER (PARTITION BY anchor), 6) AS prior
FROM c
"""

ORACLE["name_disambig_baseline"] = """
WITH tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS anchor
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
), links AS (
  SELECT doc_id, pos, anchor, 'wiki/' || anchor AS target
  FROM tok WHERE anchor IN ('column', 'customer', 'data', 'query', 'row', 'spark', 'stream', 'table', 'vector', 'window')
),
c AS (SELECT anchor, target, count(*) AS count
      FROM links WHERE anchor != '' AND target != ''
      GROUP BY anchor, target),
p AS (SELECT anchor, target, count,
             round(count * 1.0 / sum(count) OVER (PARTITION BY anchor), 6) AS prior,
             row_number() OVER (PARTITION BY anchor ORDER BY count DESC, target ASC) AS rn
      FROM c),
t AS (SELECT anchor, CAST(sum(count) AS BIGINT) AS n_mentions FROM c GROUP BY anchor)
SELECT p.anchor, p.target AS predicted_target, p.prior, t.n_mentions
FROM p JOIN t ON p.anchor = t.anchor WHERE p.rn = 1
"""


# identical output contract to dedup_clusters — the star-contraction
# variant computes the same connected components
ORACLE["dedup_clusters_star"] = ORACLE["dedup_clusters"]

# incremental LSH ≡ full-corpus LSH restricted to pairs touching the
# "new batch" (doc_id % 5 = 0 in the registered query)
ORACLE["dedup_incremental"] = (
    "WITH pairs AS (" + ORACLE["dedup_minhash_lsh"] + ")\n"
    "SELECT doc1, doc2, jaccard FROM pairs\n"
    "WHERE doc1 % 5 = 0 OR doc2 % 5 = 0"
)

ORACLE["entity_components"] = f"""
WITH RECURSIVE {TOK}, {LINKS},
il AS (SELECT DISTINCT doc_id, target FROM links),
cp AS (
  SELECT l.target AS e1, r.target AS e2
  FROM il l JOIN il r ON l.doc_id = r.doc_id AND l.target < r.target
  GROUP BY l.target, r.target
  HAVING count(*) >= 2
),
edges AS (
  SELECT e1 AS a, e2 AS b FROM cp
  UNION
  SELECT e2 AS a, e1 AS b FROM cp
),
reach(src, node) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
)
SELECT src AS target, min(node) AS component FROM reach GROUP BY src
"""

ORACLE["user_status_history"] = """
WITH e AS (
  SELECT user_id, event_id, event_type AS status,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
f AS (
  SELECT *, CASE WHEN lag(status) OVER w IS NULL
                   OR lag(status) OVER w != status THEN 1 ELSE 0 END AS new_run
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
),
r AS (
  SELECT *, sum(new_run) OVER (
    PARTITION BY user_id ORDER BY es, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM f
),
a AS (
  SELECT user_id, run_id, min(status) AS status,
         min(es) AS valid_from, count(*) AS n_events
  FROM r GROUP BY user_id, run_id
)
SELECT user_id, status, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to,
       n_events
FROM a
"""


# Bipartite HITS as power iteration on the entity comention matrix
# M = AᵀA (see models/links.py entity_hits): the corpus is scanned
# twice (M + the a1 inlink counts), each further round is a k-sized
# join on M. All intermediates are integers in doubles, so this is
# bit-identical to the edge-space unroll. Iterations run UNNORMALIZED
# (per-round L1 norms would reference each CTE twice and DuckDB
# inlines plain CTEs — the 4^n unroll measured as a hang); one final
# normalization emits round(a/Σa, 6). MATERIALIZED keeps evaluation
# single where a CTE feeds two consumers (m → every round; a5 →
# values + norm).
_hits_iters = ",\n".join(
    f"""a{i} AS (
  SELECT e AS target, sum(m * a_raw) AS a_raw
  FROM m JOIN a{i - 1} ON a{i - 1}.target = m.e2 GROUP BY e
)"""
    for i in range(2, 5)
) + f""",
a5 AS MATERIALIZED (
  SELECT e AS target, sum(m * a_raw) AS a_raw
  FROM m JOIN a4 ON a4.target = m.e2 GROUP BY e
)"""

ORACLE["entity_hits"] = f"""
WITH {TOK}, {LINKS},
il AS (SELECT DISTINCT doc_id, target FROM links),
m AS MATERIALIZED (
  SELECT l.target AS e, r.target AS e2, CAST(count(*) AS HUGEINT) AS m
  FROM il l JOIN il r USING (doc_id) GROUP BY 1, 2
),
a1 AS (SELECT target, CAST(count(*) AS HUGEINT) AS a_raw FROM il GROUP BY target),
{_hits_iters}
SELECT target AS entity,
       round(CAST(a_raw AS DOUBLE)
             / CAST((SELECT sum(a_raw) FROM a5) AS DOUBLE), 6) AS authority
FROM a5
"""


ORACLE["events_changepoint"] = """
WITH es AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events
),
c AS (
  SELECT event_type, e - e % 3600 AS window_start, count(*) AS n
  FROM es GROUP BY 1, 2
),
s AS (
  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd FROM c GROUP BY 1
),
z AS (
  SELECT c.event_type, window_start, n,
         CASE WHEN sd = 0 THEN NULL ELSE (n - mu) / sd END AS z
  FROM c JOIN s USING (event_type)
),
pre AS (
  SELECT event_type, window_start, n,
         sum(z - 0.5) OVER (PARTITION BY event_type ORDER BY window_start) AS sp,
         sum(-z - 0.5) OVER (PARTITION BY event_type ORDER BY window_start) AS sn
  FROM z
),
cu AS (
  SELECT event_type, window_start, n,
         sp - least(0, min(sp) OVER (PARTITION BY event_type ORDER BY window_start)) AS cp,
         sn - least(0, min(sn) OVER (PARTITION BY event_type ORDER BY window_start)) AS cn
  FROM pre
)
SELECT event_type, window_start, n,
       round(cp, 6) AS cusum_pos, round(cn, 6) AS cusum_neg,
       CAST(CASE WHEN cp > 4.0 OR cn > 4.0 THEN 1 ELSE 0 END AS INT) AS is_change
FROM cu
"""


ORACLE["temperature_weights"] = """
WITH cnt AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT sum(n_docs) AS t, sum(pow(n_docs, 0.3)) AS ta FROM cnt)
SELECT source, n_docs,
       round(n_docs / t, 6) AS p_raw,
       round(pow(n_docs, 0.3) / ta, 6) AS p_temp,
       round((pow(n_docs, 0.3) / ta) / (n_docs / t), 6) AS boost,
       round(10000.0 * pow(n_docs, 0.3) / ta, 2) AS expected_docs
FROM cnt, tot
"""


ORACLE["temperature_sample"] = """
WITH cnt AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT sum(n_docs) AS t, sum(pow(n_docs, 0.3)) AS ta FROM cnt),
rates AS (
  SELECT source, least(1.0, round(10000.0 * pow(n_docs, 0.3) / ta, 2) / n_docs) AS rate
  FROM cnt, tot
)
SELECT doc_id, d.source
FROM documents d JOIN rates r ON d.source = r.source
WHERE cast(concat('0x', substr(md5(concat('temp:', cast(doc_id as varchar))), 1, 15)) as bigint) % 1000000 < round(rate * 1000000)
"""


ORACLE["entity_salience"] = f"""
WITH {TOK}, {LINKS},
nt AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id),
per AS (
  SELECT doc_id, target, count(*) AS n_mentions,
         CAST(min(pos) AS INT) AS first_pos
  FROM links GROUP BY doc_id, target
)
SELECT p.doc_id, p.target, p.n_mentions, p.first_pos,
       round(p.n_mentions * 1.0 / n.n_tokens + 1.0 / (1.0 + p.first_pos), 6) AS salience
FROM per p JOIN nt n ON p.doc_id = n.doc_id
"""


# fuzzy decontamination = the full LSH pair machinery restricted to
# corpus x benchmark pairs, aggregated per corpus doc
ORACLE["fuzzy_contamination"] = """
WITH sh AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
),
shh AS (SELECT doc_id, shingle, (cast(concat('0x', substr(md5(shingle), 1, 15)) as bigint) % 2147483647) AS h FROM sh), mh AS (
  SELECT doc_id,
    min((1294255605 * h + 458256859) % 2147483647) AS mh_0,
    min((1645468585 * h + 42517570) % 2147483647) AS mh_1,
    min((2067182730 * h + 456440371) % 2147483647) AS mh_2,
    min((1531557246 * h + 203272735) % 2147483647) AS mh_3,
    min((587169733 * h + 1479202771) % 2147483647) AS mh_4,
    min((351678804 * h + 1556618321) % 2147483647) AS mh_5,
    min((790715258 * h + 376822726) % 2147483647) AS mh_6,
    min((1193424488 * h + 1609216730) % 2147483647) AS mh_7,
    min((991095636 * h + 138072304) % 2147483647) AS mh_8,
    min((478203456 * h + 1661692021) % 2147483647) AS mh_9,
    min((1540739706 * h + 240715902) % 2147483647) AS mh_10,
    min((801816812 * h + 699735852) % 2147483647) AS mh_11,
    min((1250870341 * h + 1432581497) % 2147483647) AS mh_12,
    min((1384636946 * h + 238483714) % 2147483647) AS mh_13,
    min((1980986935 * h + 1333487546) % 2147483647) AS mh_14,
    min((812150289 * h + 967644531) % 2147483647) AS mh_15
  FROM shh GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band, md5(concat_ws(',', CAST(mh_0 AS VARCHAR), CAST(mh_1 AS VARCHAR), CAST(mh_2 AS VARCHAR), CAST(mh_3 AS VARCHAR))) AS sig FROM mh
  UNION ALL
  SELECT doc_id, 1 AS band, md5(concat_ws(',', CAST(mh_4 AS VARCHAR), CAST(mh_5 AS VARCHAR), CAST(mh_6 AS VARCHAR), CAST(mh_7 AS VARCHAR))) AS sig FROM mh
  UNION ALL
  SELECT doc_id, 2 AS band, md5(concat_ws(',', CAST(mh_8 AS VARCHAR), CAST(mh_9 AS VARCHAR), CAST(mh_10 AS VARCHAR), CAST(mh_11 AS VARCHAR))) AS sig FROM mh
  UNION ALL
  SELECT doc_id, 3 AS band, md5(concat_ws(',', CAST(mh_12 AS VARCHAR), CAST(mh_13 AS VARCHAR), CAST(mh_14 AS VARCHAR), CAST(mh_15 AS VARCHAR))) AS sig FROM mh
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2
  FROM bands l JOIN bands r ON l.band = r.band AND l.sig = r.sig
  WHERE l.doc_id % 20 <> 0 AND r.doc_id % 20 = 0
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc1, c.doc2, count(*) AS inter
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc1
  JOIN sh s2 ON s2.doc_id = c.doc2 AND s2.shingle = s1.shingle
  GROUP BY c.doc1, c.doc2
),
jac AS (
  SELECT i.doc1, i.doc2,
         round(i.inter * 1.0 / (x.n_sh + y.n_sh - i.inter), 6) AS jaccard
  FROM inter i
  JOIN sizes x ON x.doc_id = i.doc1
  JOIN sizes y ON y.doc_id = i.doc2
)
SELECT doc1 AS doc_id, count(*) AS n_matches, max(jaccard) AS max_jaccard
FROM jac WHERE jaccard >= 0.5 GROUP BY doc1
"""


# deterministic DeepWalk oracle: identical hash-picked steps unrolled
ORACLE["entity_random_walks"] = f"""
WITH {TOK}, {LINKS},
il AS (SELECT DISTINCT doc_id, target FROM links),
e AS (SELECT DISTINCT l.target AS src, r.target AS dst
      FROM il l JOIN il r ON l.doc_id = r.doc_id AND l.target <> r.target),
adj AS (SELECT src, dst, CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS idx FROM e),
deg AS (SELECT src, count(*) AS deg FROM adj GROUP BY src),
w0 AS (
  SELECT src || '#' || u.w AS walk_id, src AS start, src AS cur, src AS path
  FROM deg, (SELECT unnest(generate_series(0, 1)) AS w) u
),
w1 AS (
  SELECT walk_id, start, path || ',' || a.dst AS path, a.dst AS cur
  FROM w0 JOIN deg d ON w0.cur = d.src
  JOIN adj a ON a.src = w0.cur AND a.idx = (cast(concat('0x', substr(md5(w0.walk_id || ':0'), 1, 15)) as bigint) % 2147483647) % d.deg
),
w2 AS (
  SELECT walk_id, start, path || ',' || a.dst AS path, a.dst AS cur
  FROM w1 JOIN deg d ON w1.cur = d.src
  JOIN adj a ON a.src = w1.cur AND a.idx = (cast(concat('0x', substr(md5(w1.walk_id || ':1'), 1, 15)) as bigint) % 2147483647) % d.deg
),
w3 AS (
  SELECT walk_id, start, path || ',' || a.dst AS path, a.dst AS cur
  FROM w2 JOIN deg d ON w2.cur = d.src
  JOIN adj a ON a.src = w2.cur AND a.idx = (cast(concat('0x', substr(md5(w2.walk_id || ':2'), 1, 15)) as bigint) % 2147483647) % d.deg
),
w4 AS (
  SELECT walk_id, start, path || ',' || a.dst AS path, a.dst AS cur
  FROM w3 JOIN deg d ON w3.cur = d.src
  JOIN adj a ON a.src = w3.cur AND a.idx = (cast(concat('0x', substr(md5(w3.walk_id || ':3'), 1, 15)) as bigint) % 2147483647) % d.deg
)
SELECT walk_id, start, path FROM w4
"""


ORACLE["events_forecast"] = """
WITH es AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events
),
c AS (
  SELECT event_type, e - e % 86400 AS window_start, count(*) AS n
  FROM es GROUP BY 1, 2
)
SELECT a.event_type, a.window_start, a.n, p.n AS forecast_n,
       abs(a.n - p.n) AS abs_err,
       round(abs(a.n - p.n) * 1.0 / a.n, 6) AS ape
FROM c a JOIN c p
  ON a.event_type = p.event_type AND a.window_start = p.window_start + 604800
"""


# cluster-size profile composed over the recursive CC oracle
ORACLE["dedup_cluster_stats"] = """
WITH cc AS (WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
),
shh AS (SELECT doc_id, shingle, (cast(concat('0x', substr(md5(shingle), 1, 15)) as bigint) % 2147483647) AS h FROM sh), mh AS (
  SELECT doc_id,
    min((1294255605 * h + 458256859) % 2147483647) AS mh_0,
    min((1645468585 * h + 42517570) % 2147483647) AS mh_1,
    min((2067182730 * h + 456440371) % 2147483647) AS mh_2,
    min((1531557246 * h + 203272735) % 2147483647) AS mh_3,
    min((587169733 * h + 1479202771) % 2147483647) AS mh_4,
    min((351678804 * h + 1556618321) % 2147483647) AS mh_5,
    min((790715258 * h + 376822726) % 2147483647) AS mh_6,
    min((1193424488 * h + 1609216730) % 2147483647) AS mh_7,
    min((991095636 * h + 138072304) % 2147483647) AS mh_8,
    min((478203456 * h + 1661692021) % 2147483647) AS mh_9,
    min((1540739706 * h + 240715902) % 2147483647) AS mh_10,
    min((801816812 * h + 699735852) % 2147483647) AS mh_11,
    min((1250870341 * h + 1432581497) % 2147483647) AS mh_12,
    min((1384636946 * h + 238483714) % 2147483647) AS mh_13,
    min((1980986935 * h + 1333487546) % 2147483647) AS mh_14,
    min((812150289 * h + 967644531) % 2147483647) AS mh_15
  FROM shh GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band, md5(concat_ws(',', CAST(mh_0 AS VARCHAR), CAST(mh_1 AS VARCHAR), CAST(mh_2 AS VARCHAR), CAST(mh_3 AS VARCHAR))) AS sig FROM mh
  UNION ALL
  SELECT doc_id, 1 AS band, md5(concat_ws(',', CAST(mh_4 AS VARCHAR), CAST(mh_5 AS VARCHAR), CAST(mh_6 AS VARCHAR), CAST(mh_7 AS VARCHAR))) AS sig FROM mh
  UNION ALL
  SELECT doc_id, 2 AS band, md5(concat_ws(',', CAST(mh_8 AS VARCHAR), CAST(mh_9 AS VARCHAR), CAST(mh_10 AS VARCHAR), CAST(mh_11 AS VARCHAR))) AS sig FROM mh
  UNION ALL
  SELECT doc_id, 3 AS band, md5(concat_ws(',', CAST(mh_12 AS VARCHAR), CAST(mh_13 AS VARCHAR), CAST(mh_14 AS VARCHAR), CAST(mh_15 AS VARCHAR))) AS sig FROM mh
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2
  FROM bands l JOIN bands r ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc1, c.doc2, count(*) AS inter
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc1
  JOIN sh s2 ON s2.doc_id = c.doc2 AND s2.shingle = s1.shingle
  GROUP BY c.doc1, c.doc2
),
jac AS (
  SELECT i.doc1, i.doc2,
         round(i.inter * 1.0 / (x.n_sh + y.n_sh - i.inter), 6) AS jaccard
  FROM inter i
  JOIN sizes x ON x.doc_id = i.doc1
  JOIN sizes y ON y.doc_id = i.doc2
),
pairs AS (SELECT doc1, doc2 FROM jac WHERE jaccard >= 0.8),
edges AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION
  SELECT doc2 AS a, doc1 AS b FROM pairs
),
reach(src, node) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
)
SELECT src AS doc_id, min(node) AS rep_id FROM reach GROUP BY src)
SELECT cluster_size, count(*) AS n_clusters,
       CAST(sum(cluster_size - 1) AS BIGINT) AS n_docs_removed
FROM (SELECT rep_id, count(*) AS cluster_size FROM cc GROUP BY rep_id)
GROUP BY cluster_size
"""


ORACLE["user_type_entropy"] = """
WITH per AS (
  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events, count(*) AS n_types,
       round(-sum(c * ln(c)) / sum(c) + ln(sum(c)), 6) AS entropy
FROM per GROUP BY user_id
"""


ORACLE["embedding_int8"] = """
WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
s AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM x GROUP BY dim),
c AS (
  SELECT vec_id, x.dim, x.x, lo, hi,
         CAST(CASE WHEN hi > lo THEN round(255.0 * (x.x - lo) / (hi - lo), 0)
              ELSE 0 END AS INT) AS code
  FROM x JOIN s ON x.dim = s.dim
)
SELECT vec_id,
       string_agg(CAST(code AS VARCHAR), ',' ORDER BY dim) AS codes,
       round(avg(abs(x - (lo + code * (hi - lo) / 255.0))), 6) AS mae
FROM c GROUP BY vec_id
"""


# histogram composed over the quality-score oracle
ORACLE["quality_bins"] = """
WITH q AS (WITH tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS anchor
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
feats AS (
  SELECT doc_id, count(*) AS n_tokens,
    round(count(DISTINCT anchor) * 1.0 / count(*), 6) AS distinct_ratio,
    round(avg(CASE WHEN anchor IN ('a', 'the') THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio,
    round(avg(length(anchor)), 6) AS mean_tok_len
  FROM tok GROUP BY doc_id
)
SELECT doc_id, n_tokens, distinct_ratio, stopword_ratio, mean_tok_len,
       round(distinct_ratio - stopword_ratio + least(n_tokens, 200) / 200.0, 6) AS score
FROM feats),
b AS (
  SELECT CAST(floor(score * 10) AS INT) AS bin, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM q GROUP BY 1
),
t AS (SELECT count(*) AS td, CAST(sum(n_tokens) AS BIGINT) AS tt FROM q)
SELECT bin, n_docs, n_tokens,
       round(n_docs * 1.0 / td, 6) AS doc_share,
       round(n_tokens * 1.0 / tt, 6) AS token_share
FROM b, t
"""


# node2vec oracle: identical biased hash-picked steps unrolled;
# power-of-two p/q make every weight dyadic (exact doubles)
ORACLE["entity_node2vec"] = f"""
WITH {TOK}, {LINKS},
il AS (SELECT DISTINCT doc_id, target FROM links),
e AS (SELECT DISTINCT l.target AS src, r.target AS dst
      FROM il l JOIN il r ON l.doc_id = r.doc_id AND l.target <> r.target),
w0 AS (
  SELECT s.src || '#' || u.w AS walk_id, s.src AS start,
         CAST(NULL AS VARCHAR) AS prev, s.src AS cur, s.src AS path
  FROM (SELECT DISTINCT src FROM e) s,
       (SELECT unnest(generate_series(0, 1)) AS w) u
),
s0 AS (
  SELECT w.walk_id, w.start, w.cur, w.path, e.dst AS x,
         CASE WHEN w.prev IS NULL THEN 1.0
              WHEN e.dst = w.prev THEN 0.5
              WHEN b.x2 IS NOT NULL THEN 1.0
              ELSE 2.0 END AS wt,
         ((cast(concat('0x', substr(md5(w.walk_id || ':0'), 1, 15)) as bigint) % 2147483647) / 2147483647.0) AS r
  FROM w0 w JOIN e ON w.cur = e.src
  LEFT JOIN (SELECT src AS p2, dst AS x2 FROM e) b
    ON w.prev = b.p2 AND e.dst = b.x2
),
c0 AS (
  SELECT *, sum(wt) OVER (PARTITION BY walk_id ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(wt) OVER (PARTITION BY walk_id) AS total
  FROM s0
),
w1 AS (
  SELECT walk_id, min(start) AS start, min(cur) AS prev, min(x) AS cur,
         min(path) || ',' || min(x) AS path
  FROM c0 WHERE cum > r * total GROUP BY walk_id
),
s1 AS (
  SELECT w.walk_id, w.start, w.cur, w.path, e.dst AS x,
         CASE WHEN w.prev IS NULL THEN 1.0
              WHEN e.dst = w.prev THEN 0.5
              WHEN b.x2 IS NOT NULL THEN 1.0
              ELSE 2.0 END AS wt,
         ((cast(concat('0x', substr(md5(w.walk_id || ':1'), 1, 15)) as bigint) % 2147483647) / 2147483647.0) AS r
  FROM w1 w JOIN e ON w.cur = e.src
  LEFT JOIN (SELECT src AS p2, dst AS x2 FROM e) b
    ON w.prev = b.p2 AND e.dst = b.x2
),
c1 AS (
  SELECT *, sum(wt) OVER (PARTITION BY walk_id ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(wt) OVER (PARTITION BY walk_id) AS total
  FROM s1
),
w2 AS (
  SELECT walk_id, min(start) AS start, min(cur) AS prev, min(x) AS cur,
         min(path) || ',' || min(x) AS path
  FROM c1 WHERE cum > r * total GROUP BY walk_id
),
s2 AS (
  SELECT w.walk_id, w.start, w.cur, w.path, e.dst AS x,
         CASE WHEN w.prev IS NULL THEN 1.0
              WHEN e.dst = w.prev THEN 0.5
              WHEN b.x2 IS NOT NULL THEN 1.0
              ELSE 2.0 END AS wt,
         ((cast(concat('0x', substr(md5(w.walk_id || ':2'), 1, 15)) as bigint) % 2147483647) / 2147483647.0) AS r
  FROM w2 w JOIN e ON w.cur = e.src
  LEFT JOIN (SELECT src AS p2, dst AS x2 FROM e) b
    ON w.prev = b.p2 AND e.dst = b.x2
),
c2 AS (
  SELECT *, sum(wt) OVER (PARTITION BY walk_id ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(wt) OVER (PARTITION BY walk_id) AS total
  FROM s2
),
w3 AS (
  SELECT walk_id, min(start) AS start, min(cur) AS prev, min(x) AS cur,
         min(path) || ',' || min(x) AS path
  FROM c2 WHERE cum > r * total GROUP BY walk_id
)
SELECT walk_id, start, path FROM w3
"""


ORACLE["orders_checks"] = """
WITH n AS (SELECT count(*) AS n_rows FROM orders)
SELECT 'not_null' AS "check", 'o_orderkey' AS "column",
       (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS n_violations,
       n_rows, CAST((SELECT count(*) FROM orders WHERE o_orderkey IS NULL) = 0 AS INT) AS passed FROM n
UNION ALL
SELECT 'not_null', 'o_custkey',
       (SELECT count(*) FROM orders WHERE o_custkey IS NULL), n_rows,
       CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) = 0 AS INT) FROM n
UNION ALL
SELECT 'not_null', 'o_orderdate',
       (SELECT count(*) FROM orders WHERE o_orderdate IS NULL), n_rows,
       CAST((SELECT count(*) FROM orders WHERE o_orderdate IS NULL) = 0 AS INT) FROM n
UNION ALL
SELECT 'non_negative', 'o_totalprice',
       (SELECT count(*) FROM orders WHERE o_totalprice < 0), n_rows,
       CAST((SELECT count(*) FROM orders WHERE o_totalprice < 0) = 0 AS INT) FROM n
UNION ALL
SELECT 'accepted_values', 'o_orderstatus',
       (SELECT count(*) FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P') OR o_orderstatus IS NULL), n_rows,
       CAST((SELECT count(*) FROM orders
             WHERE o_orderstatus NOT IN ('O', 'F', 'P') OR o_orderstatus IS NULL) = 0 AS INT) FROM n
UNION ALL
SELECT 'unique', 'o_orderkey',
       (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM
          (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)), n_rows,
       CAST((SELECT coalesce(sum(c - 1), 0) FROM
          (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)) = 0 AS INT) FROM n
UNION ALL
SELECT 'foreign_key', 'o_custkey',
       (SELECT count(*) FROM orders o
        WHERE o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)), n_rows,
       CAST((SELECT count(*) FROM orders o
        WHERE o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) = 0 AS INT) FROM n
"""


ORACLE["customer_profile"] = """
SELECT 'c_custkey' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT c_custkey) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v, CAST(NULL AS DOUBLE) AS mean_v
FROM customer
UNION ALL
SELECT 'c_name' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT c_name) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v, CAST(NULL AS DOUBLE) AS mean_v
FROM customer
UNION ALL
SELECT 'c_nationkey' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT c_nationkey) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v, CAST(NULL AS DOUBLE) AS mean_v
FROM customer
UNION ALL
SELECT 'c_acctbal' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT c_acctbal) AS n_distinct,
       round(min(c_acctbal), 6) AS min_v, round(max(c_acctbal), 6) AS max_v, round(avg(c_acctbal), 6) AS mean_v
FROM customer
UNION ALL
SELECT 'c_mktsegment' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT c_mktsegment) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v, CAST(NULL AS DOUBLE) AS mean_v
FROM customer
"""

ORACLE["gopher_rules"] = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
f AS (
  SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
),
r AS (
  SELECT doc_id,
    CAST(n AS BIGINT) AS n_words,
    round(list_sum(list_transform(toks, w -> length(w))) * 1.0 / n, 6) AS mean_word_len,
    round(len(list_filter(toks, w -> contains(w, '#') OR contains(w, '...'))) * 1.0 / n, 6) AS symbol_word_frac,
    round(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) * 1.0 / n, 6) AS alpha_word_frac,
    CAST(len(list_filter(list_distinct(toks),
         w -> w IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS n_stop_distinct
  FROM f
)
SELECT *,
  (n_words BETWEEN 50 AND 100000)
  AND (mean_word_len BETWEEN 3.0 AND 10.0)
  AND (symbol_word_frac <= 0.1)
  AND (alpha_word_frac >= 0.8)
  AND (n_stop_distinct >= 1) AS passes
FROM r
"""

ORACLE["gopher_repetition"] = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
f AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
g AS (
  SELECT doc_id, n, k,
         list_transform(generate_series(1, len(toks) - k + 1),
                        i -> array_to_string(toks[i:i+k-1], ' ')) AS grams
  FROM f, unnest([2, 3, 4, 5]) AS u(k)
  WHERE len(toks) >= k
),
cnt AS (
  SELECT doc_id, n, k, gram, count(*) AS c
  FROM g, unnest(g.grams) AS gg(gram)
  GROUP BY doc_id, n, k, gram
),
agg AS (
  SELECT doc_id, n, k, max(c) AS maxc, sum(c) AS total, count(*) AS dis
  FROM cnt GROUP BY doc_id, n, k
),
wide AS (
  SELECT doc_id,
         max(CASE WHEN k = 2 THEN maxc END) AS m2,
         max(CASE WHEN k = 3 THEN maxc END) AS m3,
         max(CASE WHEN k = 4 THEN maxc END) AS m4,
         max(CASE WHEN k = 5 THEN total - dis END) AS d5
  FROM agg GROUP BY doc_id
),
r AS (
  SELECT f.doc_id, CAST(f.n AS BIGINT) AS n_tokens,
         round(least(coalesce(w.m2, 0) * 2.0 / f.n, 1.0), 6) AS top_2gram_frac,
         round(least(coalesce(w.m3, 0) * 3.0 / f.n, 1.0), 6) AS top_3gram_frac,
         round(least(coalesce(w.m4, 0) * 4.0 / f.n, 1.0), 6) AS top_4gram_frac,
         round(least(coalesce(w.d5, 0) * 5.0 / f.n, 1.0), 6) AS dup_5gram_frac
  FROM f LEFT JOIN wide w USING (doc_id)
)
SELECT *,
  (top_2gram_frac <= 0.20) AND (top_3gram_frac <= 0.18)
  AND (top_4gram_frac <= 0.16) AND (dup_5gram_frac <= 0.15) AS passes
FROM r
"""


# contamination_summary composes the two contamination screens: reuse
# the fuzzy oracle's CTE chain verbatim (sh → jac) so the summary twin
# cannot drift from the component twin, then add the exact-screen flag
# set and the one-row roll-up.
_fz_sql = ORACLE["fuzzy_contamination"]
_fz_prefix = _fz_sql[: _fz_sql.rindex("SELECT doc1 AS doc_id")]

ORACLE["contamination_summary"] = _fz_prefix + """,
n_doc AS (SELECT doc_id, count(*) AS n_sh FROM sh WHERE doc_id % 20 <> 0 GROUP BY doc_id),
bset AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
n_hit AS (SELECT doc_id, count(*) AS n_c FROM sh
          WHERE doc_id % 20 <> 0 AND shingle IN (SELECT shingle FROM bset)
          GROUP BY doc_id),
ex AS (SELECT d.doc_id FROM n_doc d LEFT JOIN n_hit h USING (doc_id)
       WHERE round(coalesce(h.n_c, 0) * 1.0 / d.n_sh, 6) >= 0.5),
fz AS (SELECT DISTINCT doc1 AS doc_id FROM jac WHERE jaccard >= 0.5),
corp AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus_docs FROM documents WHERE doc_id % 20 <> 0),
fl AS (SELECT coalesce(e.doc_id, f.doc_id) AS doc_id,
              (e.doc_id IS NOT NULL) AS is_exact,
              (f.doc_id IS NOT NULL) AS is_fuzzy
       FROM ex e FULL OUTER JOIN fz f ON e.doc_id = f.doc_id)
SELECT corp.n_corpus_docs,
       CAST(coalesce(sum(CASE WHEN is_exact THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_exact,
       CAST(coalesce(sum(CASE WHEN is_fuzzy THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_fuzzy,
       CAST(coalesce(sum(CASE WHEN is_exact AND is_fuzzy THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_both,
       CAST(count(fl.doc_id) AS BIGINT) AS n_flagged,
       CASE WHEN corp.n_corpus_docs > 0
            THEN round((corp.n_corpus_docs - count(fl.doc_id)) * 1.0 / corp.n_corpus_docs, 6)
            END AS clean_rate
FROM corp LEFT JOIN fl ON TRUE
GROUP BY corp.n_corpus_docs
"""


# per-source dedup dashboard composes the minhash pair oracle the same
# way dedup_incremental does — the pair CTE is the component twin
# verbatim, so the two cannot drift
ORACLE["dedup_rate_by_source"] = (
    "WITH pairs AS (" + ORACLE["dedup_minhash_lsh"] + "),\n"
    "dup AS (SELECT DISTINCT doc_id FROM (\n"
    "  SELECT doc1 AS doc_id FROM pairs\n"
    "  UNION ALL SELECT doc2 AS doc_id FROM pairs)),\n"
    "fl AS (SELECT d.source, d.doc_id,\n"
    "              (u.doc_id IS NOT NULL) AS is_dup\n"
    "       FROM documents d LEFT JOIN dup u ON d.doc_id = u.doc_id)\n"
    "SELECT source, count(*) AS n_docs,\n"
    "       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,\n"
    "       round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_rate\n"
    "FROM fl GROUP BY source"
)


# LSH recall audit composes the exact-pair twin and the LSH twin the
# same way dedup_incremental composes the LSH twin — both CTEs are the
# component oracles verbatim
ORACLE["lsh_recall_probe"] = (
    "WITH ex AS (" + ORACLE["dedup_ngram_jaccard"] + "),\n"
    "ls AS (" + ORACLE["dedup_minhash_lsh"] + "),\n"
    "ms AS (SELECT e.doc1, e.doc2 FROM ex e LEFT JOIN ls l\n"
    "       ON e.doc1 = l.doc1 AND e.doc2 = l.doc2 WHERE l.doc1 IS NULL),\n"
    "a AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex),\n"
    "b AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM ls),\n"
    "c AS (SELECT CAST(count(*) AS BIGINT) AS n_missed FROM ms)\n"
    "SELECT n_exact, n_lsh, n_missed,\n"
    "       CASE WHEN n_exact > 0\n"
    "            THEN round((n_exact - n_missed) * 1.0 / n_exact, 6)\n"
    "            ELSE 1.0 END AS recall\n"
    "FROM a, b, c"
)


# IVF recall audit composes the exact brute-force twin and the IVF
# twin verbatim (same pattern as lsh_recall_probe)
ORACLE["ann_recall_report"] = (
    "WITH ex AS (" + ORACLE["ann_topk_bruteforce"] + "),\n"
    "ap AS (" + ORACLE["ann_ivf_bucketed"] + "),\n"
    "pv AS (SELECT vec_id, count(*) AS n_true FROM ex GROUP BY vec_id),\n"
    "hv AS (SELECT e.vec_id, count(*) AS n_hit FROM ex e JOIN ap a\n"
    "       ON e.vec_id = a.vec_id AND e.neighbor_id = a.neighbor_id\n"
    "       GROUP BY e.vec_id),\n"
    "r AS (SELECT p.vec_id, coalesce(h.n_hit, 0) * 1.0 / p.n_true AS rec\n"
    "      FROM pv p LEFT JOIN hv h ON p.vec_id = h.vec_id)\n"
    "SELECT CAST(count(*) AS BIGINT) AS n_queries,\n"
    "       round(avg(rec), 6) AS avg_recall,\n"
    "       round(min(rec), 6) AS min_recall,\n"
    "       round(sum(CASE WHEN rec = 1.0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)\n"
    "         AS full_recall_frac\n"
    "FROM r"
)


# recall audit for the PQ-coded serving index: brute-force twin vs
# the trained ADC round-trip twin (prices quantization loss on top of
# probing loss — the ivf_recall_report pattern with the ivfpq twin)
ORACLE["ivfpq_recall_report"] = (
    "WITH ex AS (" + ORACLE["ann_topk_bruteforce"] + "),\n"
    "ap AS (" + ORACLE["ivfpq_query_index"] + "),\n"
    "pv AS (SELECT vec_id, count(*) AS n_true FROM ex GROUP BY vec_id),\n"
    "hv AS (SELECT e.vec_id, count(*) AS n_hit FROM ex e JOIN ap a\n"
    "       ON e.vec_id = a.vec_id AND e.neighbor_id = a.neighbor_id\n"
    "       GROUP BY e.vec_id),\n"
    "r AS (SELECT p.vec_id, coalesce(h.n_hit, 0) * 1.0 / p.n_true AS rec\n"
    "      FROM pv p LEFT JOIN hv h ON p.vec_id = h.vec_id)\n"
    "SELECT CAST(count(*) AS BIGINT) AS n_queries,\n"
    "       round(avg(rec), 6) AS avg_recall,\n"
    "       round(min(rec), 6) AS min_recall,\n"
    "       round(sum(CASE WHEN rec = 1.0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)\n"
    "         AS full_recall_frac\n"
    "FROM r"
)


# recall audit for the PERSISTED serving index: composes the
# brute-force twin with the trained-index round-trip twin verbatim
# (same pattern as ann_recall_report)
ORACLE["ivf_recall_report"] = (
    "WITH ex AS (" + ORACLE["ann_topk_bruteforce"] + "),\n"
    "ap AS (" + ORACLE["ivf_query_index"] + "),\n"
    "pv AS (SELECT vec_id, count(*) AS n_true FROM ex GROUP BY vec_id),\n"
    "hv AS (SELECT e.vec_id, count(*) AS n_hit FROM ex e JOIN ap a\n"
    "       ON e.vec_id = a.vec_id AND e.neighbor_id = a.neighbor_id\n"
    "       GROUP BY e.vec_id),\n"
    "r AS (SELECT p.vec_id, coalesce(h.n_hit, 0) * 1.0 / p.n_true AS rec\n"
    "      FROM pv p LEFT JOIN hv h ON p.vec_id = h.vec_id)\n"
    "SELECT CAST(count(*) AS BIGINT) AS n_queries,\n"
    "       round(avg(rec), 6) AS avg_recall,\n"
    "       round(min(rec), 6) AS min_recall,\n"
    "       round(sum(CASE WHEN rec = 1.0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)\n"
    "         AS full_recall_frac\n"
    "FROM r"
)
