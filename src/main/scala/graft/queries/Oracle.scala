package graft.queries

/** DuckDB oracle SQL — one entry per key in SparkEntry.queries whose
  * semantics are ANSI-SQL-expressible. Column aliases MUST match the
  * Spark side exactly (the driver sorts columns by name before hashing).
  */
object Oracle {

  /** hex→BIGINT for the first 12 md5 digits via strpos digit
    * arithmetic (the t105 md5-digit convention — no hex-to-int builtin
    * needed); expects a column/alias `d` holding the md5 hex string.
    */
  private val HexTerms12: String = (0 until 12).map { i =>
    val w = BigInt(16).pow(11 - i)
    s"(strpos('0123456789abcdef', substr(d, ${i + 1}, 1)) - 1) * $w"
  }.mkString(" + ")

  /** Shared recursive-reachability prefix for t18/t38: connected
    * components over the SAME pair set the Spark side clusters (the
    * t4 contract: exact-dup pairs + df-capped 3-gram Jaccard >= 0.5
    * pairs); component = min reachable doc_id, singletons label
    * themselves.
    */
  private val ClusterReachCte: String =
    """WITH RECURSIVE reps AS (
      |  SELECT min(doc_id) AS id, text FROM documents GROUP BY text
      |), exact_pairs AS (
      |  SELECT r.id AS id_a, d.doc_id AS id_b
      |  FROM documents d JOIN reps r USING (text)
      |  WHERE d.doc_id != r.id
      |), toks AS (
      |  SELECT id, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS t FROM reps
      |), sets AS (
      |  SELECT id, list_distinct(
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |    ELSE list_transform(range(len(t) - 2),
      |                        i -> array_to_string(t[i+1:i+3], ' ')) END) AS sh
      |  FROM toks
      |), posting AS (
      |  SELECT id, unnest(sh) AS s FROM sets
      |), grouped AS (
      |  SELECT s, array_agg(id) AS ids FROM posting GROUP BY s
      |  HAVING count(*) BETWEEN 2 AND 10
      |), cands AS (
      |  SELECT DISTINCT la.a AS id_a, lb.b AS id_b
      |  FROM grouped, UNNEST(ids) la(a), UNNEST(ids) lb(b)
      |  WHERE lb.b > la.a
      |), near_pairs AS (
      |  SELECT c.id_a, c.id_b
      |  FROM cands c
      |  JOIN sets sa ON sa.id = c.id_a
      |  JOIN sets sb ON sb.id = c.id_b
      |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      |          / len(list_distinct(sa.sh || sb.sh)) >= 0.5
      |), pairs AS (
      |  SELECT id_a, id_b FROM exact_pairs
      |  UNION SELECT id_a, id_b FROM near_pairs
      |), edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs
      |), reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
      |)""".stripMargin

  private val base: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       -l_extendedprice / 100.0 AS val,
        |       l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1999-01-01'
        |  AND l_returnflag = 'R'""".stripMargin,

    "q3_case_label" ->
      """SELECT 'event' AS kind,
        |       CASE WHEN value < 100.0 THEN 'small' ELSE 'big' END AS bucket,
        |       event_type,
        |       count(*) AS n
        |FROM events
        |GROUP BY 1, 2, 3""".stripMargin,

    "q4_explode" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |) GROUP BY token HAVING count(*) > 10""".stripMargin,

    "q5_nest_roundtrip" ->
      "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",

    "q6_dedup_keepfirst" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn = 1""".stripMargin,

    "q7_dedup_removeall" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM (
        |  SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
        |         count(*) OVER (PARTITION BY l_orderkey) AS key_cnt
        |  FROM lineitem
        |) WHERE key_cnt = 1""".stripMargin,

    "q8_dedup_nullmask" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       CASE WHEN rn > 1 THEN NULL ELSE l_quantity END AS l_quantity
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        |         row_number() OVER (PARTITION BY l_partkey, l_suppkey
        |                            ORDER BY l_orderkey, l_linenumber) AS rn
        |  FROM lineitem
        |)""".stripMargin,

    "q9_dupe_audit" ->
      """SELECT l_partkey, l_suppkey, count(*) AS occurrence_count
        |FROM lineitem
        |GROUP BY l_partkey, l_suppkey
        |HAVING count(*) > 1
        |ORDER BY occurrence_count DESC, l_partkey, l_suppkey""".stripMargin,

    "q10_union_all" ->
      """SELECT event_id, 'input' AS type, -value AS val
        |FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, 'output' AS type, value AS val
        |FROM events WHERE event_type = 'error'""".stripMargin,

    "q11_union_distinct" ->
      """SELECT c_nationkey AS nkey FROM customer
        |UNION
        |SELECT s_nationkey AS nkey FROM supplier""".stripMargin,

    "q12_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q13_join_semi" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderstatus""".stripMargin,

    "q14_daily_series" ->
      """WITH buys AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS buy_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), clicks AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |)
        |SELECT buys.day AS day, buy_value, click_value
        |FROM buys JOIN clicks ON buys.day = clicks.day""".stripMargin,

    "q15_ols_daily" ->
      """WITH buys AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS buy_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), clicks AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |), xy AS (
        |  SELECT ln(buy_value) AS x, ln(click_value) AS y
        |  FROM buys JOIN clicks ON buys.day = clicks.day
        |  WHERE buy_value > 0 AND click_value > 0
        |), m AS (
        |  SELECT covar_pop(y, x) AS sxy, var_pop(x) AS sxx, var_pop(y) AS syy,
        |         avg(x) AS mx, avg(y) AS my, count(*) AS n
        |  FROM xy
        |)
        |SELECT round(sxy / sxx, 6) AS slope,
        |       round(my - (sxy / sxx) * mx, 6) AS intercept,
        |       round(pow(sxy, 2) / (sxx * syy), 6) AS r2,
        |       round(sqrt(syy * (1 - pow(sxy, 2) / (sxx * syy))), 6) AS rmse,
        |       n
        |FROM m""".stripMargin,

    "q16_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q17_window_rank" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_shipdate FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |         row_number() OVER (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem
        |) WHERE rn <= 3""".stripMargin,

    "q18_conditional_agg" ->
      """SELECT user_id,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |       array_to_string(COALESCE(array_agg(event_id ORDER BY event_id)
        |                FILTER (WHERE event_type = 'error'), []), ',') AS error_ids
        |FROM events GROUP BY user_id""".stripMargin,

    "q19_having_element" ->
      """SELECT l_orderkey, r_cnt, a_cnt,
        |       array_to_string(r_parts, ',') AS r_parts,
        |       array_to_string(a_parts, ',') AS a_parts FROM (
        |  SELECT l_orderkey,
        |         count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS r_cnt,
        |         count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS a_cnt,
        |         COALESCE(array_agg(l_partkey ORDER BY l_partkey)
        |                  FILTER (WHERE l_returnflag = 'R'), []) AS r_parts,
        |         COALESCE(array_agg(l_partkey ORDER BY l_partkey)
        |                  FILTER (WHERE l_returnflag = 'A'), []) AS a_parts
        |  FROM lineitem GROUP BY l_orderkey
        |) WHERE (r_cnt = 1 AND a_cnt = 1 AND r_parts[1] != a_parts[1])
        |     OR (r_cnt > 1 AND a_cnt = 1)""".stripMargin,

    "q20_flow_ledger" ->
      """WITH flows AS (
        |  SELECT l_orderkey, 'input' AS type,
        |         -CAST(l_extendedprice / 100000000.0 AS DECIMAL(28,10)) AS val
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, 'output' AS type,
        |         CAST(l_extendedprice / 100000000.0 AS DECIMAL(28,10)) AS val
        |  FROM lineitem
        |)
        |SELECT date_trunc('day', o_orderdate) AS day, type, n_name AS location,
        |       CAST(sum(val) AS DOUBLE) AS flow, count(*) AS n_legs
        |FROM flows
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,

    "q21_json_extract" ->
      // sum(INT) is HUGEINT in DuckDB but LONG in Spark — align the
      // oracle's dtype so the driver's hasher sees identical columns
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
        |       max(CAST(props->>'k' AS INT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q22_count_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS distinct_parts,
        |       count(DISTINCT l_suppkey) AS distinct_supps,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q23_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       GROUPING(l_returnflag) AS g_flag,
        |       GROUPING(l_linestatus) AS g_status,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q24_setops" ->
      """SELECT nkey, 'both' AS side FROM (
        |  SELECT c_nationkey AS nkey FROM customer
        |  INTERSECT
        |  SELECT s_nationkey AS nkey FROM supplier
        |)
        |UNION ALL
        |SELECT nkey, 'cust_only' AS side FROM (
        |  SELECT c_nationkey AS nkey FROM customer
        |  EXCEPT
        |  SELECT s_nationkey AS nkey FROM supplier
        |)""".stripMargin,

    "q25_asof" ->
      """SELECT c.event_id, c.user_id, p.value AS last_purchase_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |     (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, value
        |      FROM events WHERE event_type = 'purchase') p
        |ON c.user_id = p.user_id AND c.ts >= p.pts""".stripMargin,

    "q26_range_join" ->
      """SELECT e.event_id, count(*) AS n_nearby,
        |       CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS nearby_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts
        |      FROM events WHERE event_type = 'error') e
        |JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) pts, value
        |      FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id
        | AND abs(epoch_us(e.ts) - epoch_us(p.pts)) <= CAST(3600 AS BIGINT) * 1000000
        |GROUP BY e.event_id""".stripMargin,

    "q27_ndjson_dim" ->
      s"""SELECT COALESCE(w.location, 'unknown') AS location,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN read_json('${RelationalQueries.UserLocationPath}') w
        |  ON e.user_id = w.user_id
        |GROUP BY 1""".stripMargin,

    "q28_struct_semi" ->
      """SELECT l_partkey, l_suppkey, count(*) AS n_lines,
        |       sum(l_quantity) AS sum_qty
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM lineitem k
        |              WHERE k.l_returnflag = 'R' AND k.l_quantity >= 45
        |                AND k.l_partkey = l.l_partkey
        |                AND k.l_suppkey = l.l_suppkey)
        |GROUP BY l_partkey, l_suppkey""".stripMargin,

    "q29_explode_outer" ->
      """WITH g AS (
        |  SELECT l_orderkey,
        |         COALESCE(array_agg(l_partkey ORDER BY l_partkey)
        |                  FILTER (WHERE l_returnflag = 'R'), []) AS r_parts
        |  FROM lineitem GROUP BY l_orderkey
        |)
        |SELECT g.l_orderkey, u.r_part
        |FROM g LEFT JOIN LATERAL (SELECT unnest(r_parts) AS r_part) u
        |  ON true""".stripMargin,

    "q30_congruent" ->
      """WITH flow AS (
        |  SELECT l_orderkey AS txid, 'input' AS type,
        |         CAST(l_partkey AS VARCHAR) AS addr,
        |         CAST(l_extendedprice / 100000000.0 AS DECIMAL(28,10)) * -1 AS val
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT l_orderkey, 'output', CAST(l_partkey AS VARCHAR),
        |         CAST(l_extendedprice / 100000000.0 AS DECIMAL(28,10)) * 1
        |  FROM lineitem WHERE l_returnflag = 'A'
        |), grouped AS (
        |  SELECT txid,
        |         count(CASE WHEN type = 'input' THEN 1 END) AS input_count,
        |         count(CASE WHEN type = 'output' THEN 1 END) AS output_count,
        |         COALESCE(array_agg(addr ORDER BY addr)
        |                  FILTER (WHERE type = 'input'), []) AS ia,
        |         COALESCE(array_agg(addr ORDER BY addr)
        |                  FILTER (WHERE type = 'output'), []) AS oa
        |  FROM flow GROUP BY txid
        |), congruent AS (
        |  SELECT txid FROM grouped
        |  WHERE (input_count = 1 AND output_count = 1 AND ia[1] != oa[1])
        |     OR (input_count > 1 AND output_count = 1)
        |)
        |SELECT f.txid, f.type, f.addr, CAST(f.val AS DOUBLE) AS val
        |FROM flow f WHERE f.txid IN (SELECT txid FROM congruent)""".stripMargin,

    "q34_topk_ties" ->
      """SELECT l_returnflag, rnk, count(*) AS n_tied,
        |       min(l_orderkey) AS min_key
        |FROM (
        |  SELECT l_returnflag, l_orderkey,
        |         rank() OVER (PARTITION BY l_returnflag
        |                      ORDER BY l_quantity DESC) AS rnk
        |  FROM lineitem
        |) WHERE rnk <= 3
        |GROUP BY l_returnflag, rnk""".stripMargin,

    "q35_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 10""".stripMargin,

    "q39_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       GROUPING(l_returnflag) AS g_flag,
        |       GROUPING(l_linestatus) AS g_status,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "t17_streaming_dedup" ->
      // the deterministic contract of single-batch streaming dedup:
      // the surviving key set = the distinct keys
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,

    "q38_sessionize" ->
      // gaps-and-islands mirror of session_window: sessions MERGE while
      // an event lands at or before the previous event + gap (Spark's
      // boundary is inclusive — spec-pinned), so a new session opens
      // only when the gap STRICTLY exceeds 1 hour; session end = last
      // event + gap
      """WITH o AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |         lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP)) AS prev
        |  FROM events
        |), m AS (
        |  SELECT *, CASE WHEN prev IS NULL
        |                   OR ts - prev > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk
        |  FROM o
        |), g AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM m
        |)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 1 HOUR AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sess""".stripMargin,

    "q36_pivot" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY 1""".stripMargin,

    "q37_unpivot" ->
      """WITH wide AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |    CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |  FROM events GROUP BY 1
        |)
        |SELECT day, event_type, sum_value FROM (
        |  SELECT day, 'click' AS event_type, click AS sum_value FROM wide
        |  UNION ALL SELECT day, 'error', error FROM wide
        |  UNION ALL SELECT day, 'purchase', purchase FROM wide
        |  UNION ALL SELECT day, 'signup', signup FROM wide
        |  UNION ALL SELECT day, 'view', view FROM wide
        |) WHERE sum_value IS NOT NULL""".stripMargin,

    "q33_asof_native" ->
      // identical semantics to q25 (the composed form) — the custom
      // physical operator must reproduce DuckDB's native ASOF exactly
      """SELECT c.event_id, c.user_id, p.value AS last_purchase_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |     (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, value
        |      FROM events WHERE event_type = 'purchase') p
        |ON c.user_id = p.user_id AND c.ts >= p.pts""".stripMargin,

    "q31_window_frames" ->
      """SELECT user_id, event_id, value,
        |       lag(value, 1) OVER w AS prev_value,
        |       round(avg(value) OVER (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP), event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS avg_7
        |FROM events
        |WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP), event_id)""".stripMargin,

    "q32_percentiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "t4_ngram_jaccard" ->
      // exact mirror of TrainingQueries.t4NgramJaccard: exact-dedup
      // first (pairs at jaccard 1.0), then 3-gram shingle sets over the
      // distinct reps, posting-list candidates with 2 <= df <= 10, exact
      // Jaccard >= 0.5. Spark computes Jaccard over xxhash64'd shingles;
      // Jaccard over the shingle STRINGS is identical modulo 64-bit
      // collisions (none at oracle scale).
      """WITH reps AS (
        |  SELECT min(doc_id) AS id, text FROM documents GROUP BY text
        |), exact_pairs AS (
        |  SELECT r.id AS id_a, d.doc_id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
        |  FROM documents d JOIN reps r USING (text)
        |  WHERE d.doc_id != r.id
        |), toks AS (
        |  SELECT id, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS t FROM reps
        |), sets AS (
        |  SELECT id, list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END) AS sh
        |  FROM toks
        |), posting AS (
        |  SELECT id, unnest(sh) AS s FROM sets
        |), grouped AS (
        |  SELECT s, array_agg(id) AS ids FROM posting GROUP BY s
        |  HAVING count(*) BETWEEN 2 AND 10
        |), cands AS (
        |  SELECT DISTINCT la.a AS id_a, lb.b AS id_b
        |  FROM grouped, UNNEST(ids) la(a), UNNEST(ids) lb(b)
        |  WHERE lb.b > la.a
        |), verified AS (
        |  SELECT c.id_a, c.id_b,
        |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        |           / len(list_distinct(sa.sh || sb.sh)) AS j
        |  FROM cands c
        |  JOIN sets sa ON sa.id = c.id_a
        |  JOIN sets sb ON sb.id = c.id_b
        |)
        |SELECT id_a, id_b, round(j, 6) AS jaccard FROM verified WHERE j >= 0.5
        |UNION ALL
        |SELECT id_a, id_b, jaccard FROM exact_pairs""".stripMargin,

    "t266_prefix_jaccard" ->
      // NAIVE uncapped all-pairs ground truth for the prefix-filter
      // join (t4's shingle-string Jaccard convention — identical to
      // the hashed form modulo 64-bit collisions): any pair the
      // prefix algorithm misses or invents is a hash mismatch
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |         string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), sets AS (
        |  SELECT id, list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END) AS sh
        |  FROM toks
        |), posting AS (
        |  SELECT id, unnest(sh) AS s FROM sets
        |), cands AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM posting a JOIN posting b ON a.s = b.s AND a.id < b.id
        |), verified AS (
        |  SELECT c.id_a, c.id_b,
        |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        |           / len(list_distinct(sa.sh || sb.sh)) AS j
        |  FROM cands c
        |  JOIN sets sa ON sa.id = c.id_a
        |  JOIN sets sb ON sb.id = c.id_b
        |)
        |SELECT id_a, id_b, round(j, 6) AS jaccard
        |FROM verified WHERE j >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,

    "t268_mink_prob" ->
      // exact mirror of CorpusStats.minKProb: t36's model CTEs
      // verbatim, per-instance NLLs micro-rounded to BIGINTs (one
      // identical ln chain), top-20% selection via the interval-
      // overlap clip over per-doc DISTINCT micro values (desc),
      // k = ceil(n/5) in integer arithmetic, one double-divide chain
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |                     x -> x <> '') AS t
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, t FROM toks WHERE len(t) >= 2
        |), bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(len(t) - 1),
        |                               i -> t[i+1] || ' ' || t[i+2])) AS b
        |  FROM dt
        |), per_doc AS (
        |  SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b
        |), cnt AS (
        |  SELECT b, CAST(sum(n) AS BIGINT) AS c FROM per_doc GROUP BY b
        |), ctx AS (
        |  SELECT split_part(b, ' ', 1) AS w1, CAST(sum(c) AS BIGINT) AS cc
        |  FROM cnt GROUP BY 1
        |), vocab AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(t) AS tok FROM dt)
        |), cells AS (
        |  SELECT p.doc_id,
        |         CAST(round(-1000000.0 *
        |           ln((c.c + 0.5) / (x.cc + 0.5 * vocab.v))) AS BIGINT) AS mv,
        |         CAST(sum(p.n) AS BIGINT) AS cell_n
        |  FROM per_doc p
        |  JOIN cnt c USING (b)
        |  JOIN ctx x ON split_part(p.b, ' ', 1) = x.w1
        |  CROSS JOIN vocab
        |  GROUP BY p.doc_id, mv
        |), cum AS (
        |  SELECT doc_id, mv, cell_n,
        |         sum(cell_n) OVER (PARTITION BY doc_id) AS n_all,
        |         sum(cell_n) OVER (PARTITION BY doc_id ORDER BY mv DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
        |  FROM cells
        |), clipped AS (
        |  SELECT doc_id, n_all, (n_all * 20 + 99) // 100 AS m,
        |         greatest(least(cw, (n_all * 20 + 99) // 100) -
        |           (cw - cell_n), 0) AS w, mv
        |  FROM cum
        |)
        |SELECT doc_id, CAST(max(n_all) AS BIGINT) AS n_bigrams,
        |       CAST(max(m) AS BIGINT) AS k_terms,
        |       round(CAST(sum(CAST(w AS HUGEINT) * mv) AS DOUBLE)
        |             / max(m) / 1e6, 6) AS mink_avg_nll
        |FROM clipped GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t269_substr_dedup" ->
      // algorithm-independent ground truth for the prefix-doubling
      // engine plan: group the LITERAL 40-char windows (the oracle
      // may ship minLen-char keys where the engine must not), keep
      // classes at >= 2 positions, merge covered window starts per
      // doc into maximal islands (gap > 40 breaks), emit
      // [start, end) char spans. Both engines count CHARACTERS
      // (substr/substring and length are codepoint-based in DuckDB
      // and Spark alike), so zh documents align.
      """WITH pos0 AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(0, length(text) - 40)) AS o
        |  FROM documents WHERE length(text) >= 40
        |), pos AS (
        |  SELECT doc_id, o, substr(text, CAST(o + 1 AS BIGINT), 40) AS w
        |  FROM pos0
        |), dupw AS (
        |  SELECT w FROM pos GROUP BY w HAVING count(*) >= 2
        |), cov AS (
        |  SELECT p.doc_id, p.o FROM pos p JOIN dupw d USING (w)
        |), isl AS (
        |  SELECT doc_id, o,
        |         CASE WHEN lag(o) OVER (PARTITION BY doc_id ORDER BY o)
        |                   IS NULL THEN 1
        |              WHEN o - lag(o) OVER (PARTITION BY doc_id
        |                   ORDER BY o) > 40 THEN 1
        |              ELSE 0 END AS brk
        |  FROM cov
        |), grp AS (
        |  SELECT doc_id, o, sum(brk) OVER (PARTITION BY doc_id
        |         ORDER BY o ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl
        |)
        |SELECT doc_id, CAST(min(o) AS BIGINT) AS span_start,
        |       CAST(max(o) + 40 AS BIGINT) AS span_end,
        |       count(*) AS n_windows
        |FROM grp GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    "t267_repetition" ->
      // exact mirror of TextAnalysis.repetitionReport: lines split on
      // chr(10) with empties kept (raw text), word n-grams on the
      // shared lowercase-\s+ shingle contract (whole-text fallback
      // below n), masses = count × codepoint length as exact BIGINTs,
      // per-source sums, one divide each at 6dp
      """WITH lines AS (
        |  SELECT doc_id, source, unnest(string_split(text, chr(10))) AS ln
        |  FROM documents WHERE text IS NOT NULL
        |), lc AS (
        |  SELECT doc_id, source, ln, count(*) AS c, length(ln) AS len
        |  FROM lines GROUP BY ALL
        |), lagg AS (
        |  SELECT doc_id, source, sum(c) AS n_lines,
        |         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_lines,
        |         sum(c * len) AS line_chars,
        |         sum(CASE WHEN c >= 2 THEN c * len ELSE 0 END)
        |           AS dup_line_chars
        |  FROM lc GROUP BY ALL
        |), toks AS (
        |  SELECT doc_id, source,
        |         string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), g AS (
        |  SELECT doc_id, source, n,
        |         unnest(CASE WHEN len(t) < n THEN [array_to_string(t, ' ')]
        |           ELSE list_transform(range(len(t) - n + 1),
        |                  i -> array_to_string(t[i+1:i+n], ' ')) END) AS gr
        |  FROM toks CROSS JOIN (SELECT unnest([2, 3, 5]) AS n)
        |), gc AS (
        |  SELECT doc_id, source, n, gr, count(*) AS c, length(gr) AS len
        |  FROM g GROUP BY ALL
        |), ga AS (
        |  SELECT doc_id, source, n, max(c * len) AS top_mass,
        |         sum(CASE WHEN c >= 2 THEN c * len ELSE 0 END) AS dup_mass,
        |         sum(c * len) AS mass
        |  FROM gc GROUP BY ALL
        |), perdoc AS (
        |  SELECT l.doc_id, l.source, l.n_lines, l.dup_lines,
        |         l.line_chars, l.dup_line_chars,
        |         g2.top_mass AS t2, g2.mass AS m2,
        |         g3.top_mass AS t3, g3.mass AS m3,
        |         g5.dup_mass AS d5, g5.mass AS m5
        |  FROM lagg l
        |  JOIN ga g2 ON g2.doc_id = l.doc_id AND g2.n = 2
        |  JOIN ga g3 ON g3.doc_id = l.doc_id AND g3.n = 3
        |  JOIN ga g5 ON g5.doc_id = l.doc_id AND g5.n = 5
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CASE WHEN sum(n_lines) > 0 THEN round(
        |    CAST(sum(dup_lines) AS DOUBLE) /
        |    CAST(sum(n_lines) AS DOUBLE), 6) END AS dup_line_frac,
        |  CASE WHEN sum(line_chars) > 0 THEN round(
        |    CAST(sum(dup_line_chars) AS DOUBLE) /
        |    CAST(sum(line_chars) AS DOUBLE), 6) END AS dup_line_char_frac,
        |  CASE WHEN sum(m2) > 0 THEN round(
        |    CAST(sum(t2) AS DOUBLE) / CAST(sum(m2) AS DOUBLE), 6)
        |    END AS top2gram_mass_frac,
        |  CASE WHEN sum(m3) > 0 THEN round(
        |    CAST(sum(t3) AS DOUBLE) / CAST(sum(m3) AS DOUBLE), 6)
        |    END AS top3gram_mass_frac,
        |  CASE WHEN sum(m5) > 0 THEN round(
        |    CAST(sum(d5) AS DOUBLE) / CAST(sum(m5) AS DOUBLE), 6)
        |    END AS dup5gram_mass_frac
        |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,

    "t12_multimodal" ->
      // closed-form replay of synthesize → decode → aggregate: the
      // synthesized BMP/WAV/Y4M containers are deterministic functions
      // of the text's UTF-8 byte length, so DuckDB can predict the
      // decoded byte_len/width/duration exactly — if the codec
      // misparsed any header, these numbers would not reproduce
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    CASE doc_id % 3
        |      WHEN 0 THEN 54 + ((3 * (4 + L % 13) + 3) // 4) * 4 * (2 + L % 7)
        |      WHEN 1 THEN 44 + 2 * (400 + L)
        |      ELSE length('YUV4MPEG2 W' || (4 + 2 * (L % 5)) || ' H' ||
        |                  (4 + 2 * (L % 3)) || ' F25:1 Ip A1:1 C420') + 1
        |           + (1 + L % 40) *
        |             (6 + ((4 + 2 * (L % 5)) * (4 + 2 * (L % 3)) * 3) // 2)
        |    END AS byte_len,
        |    CASE doc_id % 3 WHEN 0 THEN 4 + L % 13 WHEN 1 THEN 0
        |         ELSE 4 + 2 * (L % 5) END AS width,
        |    CASE doc_id % 3 WHEN 0 THEN 0
        |      WHEN 1 THEN (2 * (400 + L) * 1000) // 16000
        |      ELSE ((1 + L % 40) * 1000) // 25 END AS duration_ms
        |  FROM d
        |)
        |SELECT media_type, count(*) AS n,
        |       CAST(sum(byte_len) AS BIGINT) AS total_bytes,
        |       max(width) AS max_width, max(duration_ms) AS max_duration_ms
        |FROM m GROUP BY 1""".stripMargin,

    "t14_streaming_daily" ->
      // replay of the streaming append-mode contract in plain SQL: a
      // 1-day tumbling window is finalized iff its end <= watermark =
      // max(event time) - 1 day; the single-file AvailableNow source
      // processes in one batch, so no row is late-dropped and the
      // emitted set is exactly the finalized daily aggregate
      """WITH e AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
        |), wm AS (
        |  SELECT max(ts) - INTERVAL 1 DAY AS w FROM e
        |)
        |SELECT date_trunc('day', ts) AS day, event_type,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |       count(*) AS n
        |FROM e
        |WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        |GROUP BY 1, 2""".stripMargin,

    "t64_pagerank" ->
      // exact replay of the fixed-iteration weighted PageRank: one CTE
      // per round, same uniform init, damping, and left-join
      // no-inbound handling as Graph.pageRank
      """WITH edges AS (
        |  SELECT source AS src,
        |         'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst,
        |         CAST(count(*) AS DOUBLE) AS w
        |  FROM documents GROUP BY 1, 2
        |), nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges
        |    UNION SELECT dst AS node FROM edges)
        |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |ne AS (
        |  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS f
        |  FROM edges
        |), r0 AS (
        |  SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn
        |), r1 AS (
        |  SELECT node, (1 - 0.85) / n + 0.85 * coalesce(c.s, 0) AS pr
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (SELECT dst, sum(r0.pr * f) AS s FROM ne
        |             JOIN r0 ON ne.src = r0.node GROUP BY dst) c
        |    ON nodes.node = c.dst
        |), r2 AS (
        |  SELECT node, (1 - 0.85) / n + 0.85 * coalesce(c.s, 0) AS pr
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (SELECT dst, sum(r1.pr * f) AS s FROM ne
        |             JOIN r1 ON ne.src = r1.node GROUP BY dst) c
        |    ON nodes.node = c.dst
        |), r3 AS (
        |  SELECT node, (1 - 0.85) / n + 0.85 * coalesce(c.s, 0) AS pr
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (SELECT dst, sum(r2.pr * f) AS s FROM ne
        |             JOIN r2 ON ne.src = r2.node GROUP BY dst) c
        |    ON nodes.node = c.dst
        |)
        |SELECT node, round(pr, 6) AS pagerank FROM r3""".stripMargin,

    "t82_temperature_mix" ->
      // skewed derived domain (g||⌊√doc_id⌋ — IEEE-exact in both
      // engines), counts → tempered (α = 0.5) quotas, floor of the
      // 6dp-rounded product (cross-engine fp convention), then the
      // standard md5-rank window cut (t29's replay shape)
      """WITH d AS (
        |  SELECT doc_id,
        |         'g' || CAST(CAST(floor(sqrt(CAST(doc_id AS DOUBLE)))
        |                          AS BIGINT) AS VARCHAR) AS domain
        |  FROM documents
        |), c AS (
        |  SELECT domain, count(*) AS n FROM d GROUP BY 1
        |), z AS (
        |  SELECT sum(pow(n, 0.5)) AS z FROM c
        |), q AS (
        |  SELECT domain,
        |         least(n, CAST(floor(round(200 * pow(n, 0.5) / z, 6))
        |                       AS BIGINT)) AS quota
        |  FROM c CROSS JOIN z
        |), r AS (
        |  SELECT doc_id, domain, row_number() OVER (
        |    PARTITION BY domain
        |    ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        |  FROM d
        |)
        |SELECT r.doc_id, r.domain FROM r JOIN q USING (domain)
        |WHERE rn <= quota""".stripMargin,

    "t87_validate_suite" ->
      // each per-row rule replays as one conditional sum over the same
      // scan; the uniqueness rule as sum(group count - 1); NULL
      // predicate results count as violations (NOT coalesce(p, false))
      """WITH t AS (SELECT count(*) AS nr FROM documents),
        |r AS (
        |  SELECT 'doc_id_not_null' AS rule,
        |    CAST(sum(CASE WHEN NOT coalesce(doc_id IS NOT NULL, false)
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM documents
        |  UNION ALL
        |  SELECT 'n_chars_matches_text',
        |    CAST(sum(CASE WHEN NOT coalesce(n_chars = length(text), false)
        |                  THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang_known',
        |    CAST(sum(CASE WHEN NOT coalesce(
        |        lang IN ('de', 'en', 'es', 'fr', 'zh'), false)
        |                  THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'source_format',
        |    CAST(sum(CASE WHEN NOT coalesce(
        |        regexp_matches(source, '^src[0-9]+$'), false)
        |                  THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'text_nonempty',
        |    CAST(sum(CASE WHEN NOT coalesce(length(text) > 0, false)
        |                  THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'n_chars_min_150',
        |    CAST(sum(CASE WHEN NOT coalesce(n_chars >= 150, false)
        |                  THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents
        |), u AS (
        |  SELECT 'doc_id_unique' AS rule,
        |         CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS n_violations,
        |         CAST(coalesce(sum(c), 0) AS BIGINT) AS nr
        |  FROM (SELECT count(*) AS c FROM documents GROUP BY doc_id)
        |), all_rows AS (
        |  SELECT rule, n_violations, (SELECT nr FROM t) AS n_rows FROM r
        |  UNION ALL SELECT rule, n_violations, nr FROM u
        |)
        |SELECT rule, n_violations, n_rows,
        |       CASE WHEN n_rows > 0 THEN
        |         round(CAST(n_violations AS DOUBLE) / n_rows, 6)
        |       ELSE 0.0 END AS violation_share,
        |       n_violations = 0 AS passed
        |FROM all_rows""".stripMargin,

    "t88_snapshot_diff" ->
      // the diff classification with DIRECT value compares (the engine
      // compares 8-byte payload hashes — identical verdicts absent a
      // 64-bit collision, and the data is deterministic)
      """WITH base AS (
        |  SELECT doc_id, text, lang, source FROM documents
        |), o AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' v1'
        |              ELSE text END AS text,
        |         lang, source
        |  FROM base WHERE doc_id % 10 <> 0
        |), n AS (
        |  SELECT * FROM base WHERE doc_id % 13 <> 0
        |)
        |SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
        |       CASE WHEN o.doc_id IS NULL THEN 'inserted'
        |            WHEN n.doc_id IS NULL THEN 'deleted'
        |            WHEN o.text <> n.text OR o.lang <> n.lang
        |                 OR o.source <> n.source THEN 'updated'
        |            ELSE 'unchanged' END AS change_type
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    "t89_cdc_apply" ->
      // the incremental apply must land EXACTLY on the new snapshot —
      // so the oracle IS the new-snapshot derivation
      """SELECT doc_id, text, lang, source FROM documents
        |WHERE doc_id % 13 <> 0""".stripMargin,

    "t86_stream_quantiles" ->
      // t14's watermark replay (finalized = window end <= max(ts) - 1
      // day) with per-window rank-exact quantiles: at test scale the
      // GK sketch's error bound is < 1 rank, and Spark's exact pick is
      // the ceil(p·n)-th order statistic — DuckDB's quantile_disc
      // convention, verified element-for-element
      """WITH e AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
        |         CAST(value AS DOUBLE) AS value
        |  FROM events
        |), wm AS (
        |  SELECT max(ts) - INTERVAL 1 DAY AS w FROM e
        |)
        |SELECT date_trunc('day', ts) AS day, event_type,
        |       quantile_disc(value, 0.5) AS p50,
        |       quantile_disc(value, 0.95) AS p95,
        |       quantile_disc(value, 0.99) AS p99,
        |       count(*) AS n
        |FROM e
        |WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        |GROUP BY 1, 2""".stripMargin,

    "t83_shard_manifest" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |         row_number() OVER (
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pos
        |  FROM documents
        |)
        |SELECT CAST(floor(pos / 64) AS INT) AS shard,
        |       count(*) AS n_rows,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id,
        |       CAST(sum(n_chars) AS BIGINT) AS total_weight
        |FROM r GROUP BY 1""".stripMargin,

    "t79_pagerank_dangling" ->
      // t64's CTE chain plus the dangling-mass correction: per round,
      // the scalar mass on no-out-link nodes (NOT IN distinct src)
      // spreads uniformly inside the damping term — same init/damping/
      // left-join handling as Graph.pageRank(redistributeDangling=true)
      """WITH edges AS (
        |  SELECT source AS src,
        |         'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst,
        |         CAST(count(*) AS DOUBLE) AS w
        |  FROM documents GROUP BY 1, 2
        |), nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges
        |    UNION SELECT dst AS node FROM edges)
        |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |ne AS (
        |  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS f
        |  FROM edges
        |), dang AS (
        |  SELECT node FROM nodes
        |  WHERE node NOT IN (SELECT DISTINCT src FROM edges)
        |), r0 AS (
        |  SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn
        |), d0 AS (
        |  SELECT coalesce(sum(pr), 0) AS dm FROM r0
        |  WHERE node IN (SELECT node FROM dang)
        |), r1 AS (
        |  SELECT node,
        |         (1 - 0.85) / n +
        |           0.85 * (coalesce(c.s, 0) + (SELECT dm FROM d0) / n) AS pr
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (SELECT dst, sum(r0.pr * f) AS s FROM ne
        |             JOIN r0 ON ne.src = r0.node GROUP BY dst) c
        |    ON nodes.node = c.dst
        |), d1 AS (
        |  SELECT coalesce(sum(pr), 0) AS dm FROM r1
        |  WHERE node IN (SELECT node FROM dang)
        |), r2 AS (
        |  SELECT node,
        |         (1 - 0.85) / n +
        |           0.85 * (coalesce(c.s, 0) + (SELECT dm FROM d1) / n) AS pr
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (SELECT dst, sum(r1.pr * f) AS s FROM ne
        |             JOIN r1 ON ne.src = r1.node GROUP BY dst) c
        |    ON nodes.node = c.dst
        |), d2 AS (
        |  SELECT coalesce(sum(pr), 0) AS dm FROM r2
        |  WHERE node IN (SELECT node FROM dang)
        |), r3 AS (
        |  SELECT node,
        |         (1 - 0.85) / n +
        |           0.85 * (coalesce(c.s, 0) + (SELECT dm FROM d2) / n) AS pr
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (SELECT dst, sum(r2.pr * f) AS s FROM ne
        |             JOIN r2 ON ne.src = r2.node GROUP BY dst) c
        |    ON nodes.node = c.dst
        |)
        |SELECT node, round(pr, 6) AS pagerank FROM r3""".stripMargin,

    "t63_stream_enrich" ->
      // t14's append-mode replay with a stream-static dimension join:
      // finalized = window end <= max(event time) - 1 day; the
      // broadcast join itself is stateless so plain SQL JOIN replays it
      """WITH e AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events
        |), j AS (
        |  SELECT e.ts, c.c_mktsegment, e.value
        |  FROM e JOIN customer c ON e.user_id = c.c_custkey
        |), wm AS (
        |  SELECT max(ts) - INTERVAL 1 DAY AS w FROM e
        |)
        |SELECT date_trunc('day', ts) AS day, c_mktsegment,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |       count(*) AS n
        |FROM j
        |WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        |GROUP BY 1, 2""".stripMargin,

    "t8_langid" ->
      // full DuckDB mirror of TextAnalysis.langId: per-language stopword
      // hits + character-class boosts, argmax via list_max over
      // (score, lang) structs — lexicographic struct ordering breaks
      // ties toward the later language code exactly like Spark's
      // array_max(struct(...)). (The synthetic corpus' text is mostly
      // English-ish regardless of its lang label; the oracle verifies
      // the ENGINE computes the heuristic exactly.)
      """WITH toks AS (
        |  SELECT lang, text, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS t
        |  FROM documents
        |), scored AS (
        |  SELECT lang,
        |    struct_pack(s := CASE WHEN regexp_matches(text, '[äöüß]') THEN 2 ELSE 0 END
        |      + (CASE WHEN list_contains(t,'der') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'die') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'das') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'und') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'ist') THEN 1 ELSE 0 END), l := 'de') AS de,
        |    struct_pack(s := (CASE WHEN list_contains(t,'the') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'a') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'of') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'and') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'is') THEN 1 ELSE 0 END), l := 'en') AS en,
        |    struct_pack(s := CASE WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 2 ELSE 0 END
        |      + (CASE WHEN list_contains(t,'el') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'la') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'de') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'que') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'y') THEN 1 ELSE 0 END), l := 'es') AS es,
        |    struct_pack(s := CASE WHEN regexp_matches(text, '[àâçéèêëîïôûù]') THEN 2 ELSE 0 END
        |      + (CASE WHEN list_contains(t,'le') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'la') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'de') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'et') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(t,'un') THEN 1 ELSE 0 END), l := 'fr') AS fr,
        |    struct_pack(s := CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 10 ELSE 0 END,
        |                l := 'zh') AS zh
        |  FROM toks
        |), best AS (
        |  SELECT lang, list_max([de, en, es, fr, zh]) AS b FROM scored
        |)
        |SELECT lang, CASE WHEN b.s <= 0 THEN 'und' ELSE b.l END AS predicted,
        |       count(*) AS n
        |FROM best GROUP BY 1, 2""".stripMargin,

    "t11_fingerprint" ->
      // CodePointRollingHash mirror: Horner over Unicode code points,
      // mod 2^31-1 with base 1000003 — pure 64-bit arithmetic, so
      // list_reduce reproduces it exactly; md5 is engine-portable hex
      """SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(text, ''),
        |                        c -> CAST(unicode(c) AS BIGINT))),
        |         (h, c) -> (h * 1000003 + c) % 2147483647) AS fingerprint,
        |       md5(text) AS digest
        |FROM documents""".stripMargin,

    "q47_delete_merge" ->
      // replay of the DELETE + MERGE sequence as pure SQL: survivors of
      // the delete, minus keys the merge updates, plus the update rows
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders
        |), survivors AS (
        |  SELECT * FROM base
        |  WHERE NOT coalesce(o_orderstatus = 'F', false)
        |), updates AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderstatus = 'P'
        |)
        |SELECT * FROM survivors
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        |UNION ALL
        |SELECT * FROM updates""".stripMargin,

    // exact mirror of q49 (quota_mix operator view driven through SQL
    // text only): the t29 md5-rank replay
    "q49_sql_operator_view" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (
        |           PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        |  FROM documents
        |)
        |SELECT doc_id, source FROM ranked
        |WHERE rn <= CASE
        |  WHEN source IN ('src0','src1','src2','src3','src4') THEN 10
        |  WHEN source IN ('src5','src6','src7','src8','src9') THEN 5
        |  ELSE 2 END
        |ORDER BY doc_id""".stripMargin,

    "q48_bq_dialect" ->
      // ANSI replay of the BigQuery-dialect congruent HAVING: branch-1
      // arrays have exactly one element, so OFFSET(0) = min()
      """WITH g AS (
        |  SELECT l_orderkey AS txid,
        |         count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS input_count,
        |         count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS output_count,
        |         min(CASE WHEN l_returnflag = 'R'
        |             THEN CAST(l_partkey AS VARCHAR) END) AS first_in,
        |         min(CASE WHEN l_returnflag = 'A'
        |             THEN CAST(l_partkey AS VARCHAR) END) AS first_out
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT txid, input_count, output_count FROM g
        |WHERE (input_count = 1 AND output_count = 1 AND first_in != first_out)
        |   OR (input_count > 1 AND output_count = 1)""".stripMargin,

    "t25_minhash_precision" ->
      // the invariant IS the oracle: zero violations of "every emitted
      // LSH pair has true string-shingle Jaccard >= 0.8 and reports it"
      "SELECT CAST(0 AS BIGINT) AS n_violations",

    "t27_simhash_recovery" ->
      // zero violations of "every PLANTED duplicate is recovered at
      // Hamming 0 by the raw pigeonhole pipeline (no exact-collapse
      // pre-pass)"
      "SELECT CAST(0 AS BIGINT) AS n_violations",

    "t47_semdedup_check" ->
      // zero violations of SemDeDup's structural contract: keepers are
      // never removed, keeper id < removed id (min-id election), and
      // identical-vector groups never keep two survivors
      "SELECT CAST(0 AS BIGINT) AS n_violations",

    "t26_neardup_exact" ->
      """WITH ids AS (
        |  SELECT vec_id AS id, embedding AS vec
        |  FROM embeddings WHERE vec_id < 500
        |), reps AS (
        |  SELECT min(id) AS id, vec FROM ids GROUP BY vec
        |), member_pairs AS (
        |  SELECT r.id AS id_a, i.id AS id_b, CAST(1.0 AS DOUBLE) AS cosine
        |  FROM ids i JOIN reps r USING (vec) WHERE i.id != r.id
        |), rep_pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |         list_cosine_similarity(CAST(a.vec AS DOUBLE[]),
        |                                CAST(b.vec AS DOUBLE[])) AS c
        |  FROM reps a JOIN reps b ON a.id < b.id
        |)
        |SELECT id_a, id_b, round(c, 6) AS cosine
        |FROM rep_pairs WHERE c >= 0.4
        |UNION ALL
        |SELECT id_a, id_b, cosine FROM member_pairs""".stripMargin,

    "t28_decontaminate" ->
      // string-shingle replay of the hashed-shingle overlap count
      // (identical modulo 64-bit collisions — none at oracle scale)
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS t
        |  FROM documents
        |), sets AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END) AS sh
        |  FROM toks
        |), train AS (
        |  SELECT doc_id AS train_id, unnest(sh) AS s FROM sets
        |), ev AS (
        |  SELECT doc_id AS eval_id, unnest(sh) AS s FROM sets
        |  WHERE doc_id % 97 = 0
        |)
        |SELECT train_id, eval_id, count(*) AS n_shared
        |FROM train JOIN ev USING (s)
        |WHERE train_id != eval_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin,

    "t29_mixture" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (
        |           PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        |  FROM documents
        |)
        |SELECT doc_id, source FROM ranked
        |WHERE rn <= CASE
        |  WHEN source IN ('src0','src1','src2','src3','src4') THEN 10
        |  WHEN source IN ('src5','src6','src7','src8','src9') THEN 5
        |  ELSE 2 END""".stripMargin,

    "t30_quality_flags" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS toks,
        |         length(text) AS n_chars,
        |         length(text) -
        |           length(regexp_replace(text, '[^\p{L}\p{N} \t\n\x0B\f\r]', '', 'g')) AS n_sym
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |         len(toks) AS n_tokens,
        |         CASE WHEN len(toks) = 0 THEN 0.0
        |              ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
        |                     AS DOUBLE) / len(toks) END AS mean_len,
        |         CASE WHEN n_chars = 0 THEN 0.0
        |              ELSE CAST(n_sym AS DOUBLE) / n_chars END AS sym_ratio,
        |         CASE WHEN len(toks) < 2 THEN 0.0
        |              ELSE 1.0 - CAST(len(list_distinct(
        |                     list_transform(range(len(toks) - 1),
        |                       i -> toks[i+1] || ' ' || toks[i+2]))) AS DOUBLE)
        |                   / (len(toks) - 1)
        |         END AS dup_frac
        |  FROM b
        |)
        |SELECT doc_id, n_tokens,
        |       round(mean_len, 6) AS mean_word_len,
        |       round(sym_ratio, 6) AS symbol_ratio,
        |       round(dup_frac, 6) AS dup_bigram_frac,
        |       n_tokens BETWEEN 5 AND 10000 AS ok_word_count,
        |       mean_len BETWEEN 2.0 AND 12.0 AS ok_mean_len,
        |       sym_ratio <= 0.3 AS ok_symbols,
        |       dup_frac <= 0.3 AS ok_repetition,
        |       (n_tokens BETWEEN 5 AND 10000)
        |         AND (mean_len BETWEEN 2.0 AND 12.0)
        |         AND sym_ratio <= 0.3 AND dup_frac <= 0.3 AS keep
        |FROM m""".stripMargin,

    // exact mirror of t51 (CorpusStats.vocabulary): token counts,
    // per-doc-distinct document frequency, the deterministic
    // (count desc, token) top-100 cut, and the cumulative-coverage
    // window over the cut rows against the TOTAL occurrence count
    "t51_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |                     x -> x <> '') AS t
        |  FROM documents
        |), posting AS (
        |  SELECT doc_id, unnest(t) AS token FROM toks
        |), counts AS (
        |  SELECT token, count(*) AS n_occurrences FROM posting GROUP BY token
        |), df AS (
        |  SELECT token, count(*) AS n_docs
        |  FROM (SELECT DISTINCT doc_id, token FROM posting) GROUP BY token
        |), total AS (
        |  SELECT sum(n_occurrences) AS tot FROM counts
        |), top AS (
        |  SELECT token, n_occurrences FROM counts
        |  ORDER BY n_occurrences DESC, token LIMIT 100
        |)
        |SELECT CAST(row_number() OVER
        |         (ORDER BY n_occurrences DESC, token) AS INT) AS rank,
        |       token, n_occurrences, n_docs,
        |       round(sum(n_occurrences) OVER
        |               (ORDER BY n_occurrences DESC, token
        |                ROWS UNBOUNDED PRECEDING) / tot, 6) AS cum_coverage
        |FROM top JOIN df USING (token), total
        |ORDER BY rank""".stripMargin,

    // exact mirror of t50 (TextDedup.removeDuplicateSpans): same
    // 6-token windows as t31, distinct-doc span counts, covered
    // token-position mask (pos..pos+5 of every bad window), ordered
    // reassembly of surviving tokens. The operator's hash prefilter is
    // a plan optimization — its verdict is string-level, as here.
    "t50_span_scrub" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS t
        |  FROM documents
        |), spans AS (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |         array_to_string(t[i+1 : i+6], ' ') AS span
        |  FROM toks,
        |       UNNEST(range(CASE WHEN len(t) < 6 THEN 1 ELSE len(t) - 5 END)) u(i)
        |), bad AS (
        |  SELECT span FROM (SELECT DISTINCT doc_id, span FROM spans) d
        |  GROUP BY span HAVING count(*) >= 2
        |), covered AS (
        |  SELECT DISTINCT doc_id, ti FROM (
        |    SELECT s.doc_id, CAST(unnest(range(s.pos, s.pos + 6)) AS INT) AS ti
        |    FROM spans s JOIN bad USING (span))
        |), tok AS (
        |  SELECT doc_id, CAST(i AS INT) AS ti, t[i+1] AS tok
        |  FROM toks, UNNEST(range(len(t))) u(i)
        |), kept AS (
        |  SELECT k.doc_id, k.ti, k.tok
        |  FROM tok k LEFT JOIN covered c ON k.doc_id = c.doc_id AND k.ti = c.ti
        |  WHERE c.doc_id IS NULL
        |)
        |SELECT t.doc_id,
        |       CAST(len(t.t) AS INT) AS n_tokens,
        |       CAST(coalesce(kc.n, 0) AS INT) AS n_kept,
        |       coalesce(kc.txt, '') AS clean_text
        |FROM toks t
        |LEFT JOIN (SELECT doc_id, count(*) AS n,
        |                  array_to_string(list(tok ORDER BY ti), ' ') AS txt
        |           FROM kept GROUP BY doc_id) kc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // exact mirror of TextDedup.duplicateSpans (t31): every 6-token
    // span in >= 2 distinct docs, by direct string regrouping — the
    // operator's hash pre-filter is a plan optimization, not a
    // semantic one (string-level regroup + re-filter make it exact).
    // Span construction matches the t4 shingle idiom; list slices
    // clamp, so the short-doc whole-text shingle falls out of t[i+1:i+6].
    "t31_dup_spans" ->
      """WITH sp AS (
        |  SELECT doc_id,
        |         unnest(list_transform(
        |           range(CASE WHEN len(t) < 6 THEN 1 ELSE len(t) - 5 END),
        |           i -> array_to_string(t[i+1:i+6], ' '))) AS span
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS t
        |        FROM documents)
        |)
        |SELECT span,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM sp
        |GROUP BY span
        |HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY span""".stripMargin,

    "t32_pack" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id % 8 AS shard, doc_id,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS BIGINT) AS w,
        |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents
        |), pack AS (
        |  SELECT shard, doc_id, w, rn, CAST(0 AS BIGINT) AS bin, w AS fill
        |  FROM docs WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.doc_id, d.w, d.rn,
        |         CASE WHEN p.fill + d.w > 2048 THEN p.bin + 1 ELSE p.bin END,
        |         CASE WHEN p.fill + d.w > 2048 THEN d.w ELSE p.fill + d.w END
        |  FROM pack p JOIN docs d ON d.shard = p.shard AND d.rn = p.rn + 1
        |)
        |SELECT shard, bin, doc_id, w AS weight FROM pack
        |ORDER BY shard, bin, doc_id""".stripMargin,

    // exact mirror of TextAnalysis.tokenChunks (t33): 16-token windows
    // advancing by 12, 1 + ceil((n-16)/12) windows (min 1), DuckDB's
    // inclusive 1-based list slice toks[s : s+15] = Spark's
    // slice(toks, s, 16) — both clamp at the end of the list
    "t33_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '[ \t\n\x0B\f\r]+') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |         unnest(range(CASE WHEN len(toks) <= 16 THEN 1
        |           ELSE CAST(ceil((len(toks) - 16)::DOUBLE / 12) AS INT) + 1
        |           END)) AS chunk_id,
        |         toks
        |  FROM t
        |)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |       array_to_string(toks[chunk_id*12+1 : chunk_id*12+16], ' ')
        |         AS chunk_text,
        |       CAST(len(toks[chunk_id*12+1 : chunk_id*12+16]) AS INT)
        |         AS n_tokens
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // exact mirror of Splits.assignArithmetic (t34): Knuth mod-prime
    // multiplicative hash into [0,1000), 800/100/100 cumulative cuts —
    // pure BIGINT arithmetic with no 64-bit wraparound, so any engine
    // reproduces the assignment bit for bit
    "t34_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         ((doc_id % 1000000007) * 2654435761) % 1000000007 % 1000
        |           AS bucket
        |  FROM documents
        |)
        |SELECT doc_id, bucket,
        |       CASE WHEN bucket < 800 THEN 'train'
        |            WHEN bucket < 900 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // independent formulation of TextAnalysis.collapseRuns (t35):
    // where Spark keeps run heads with an indexed per-row lambda, the
    // oracle finds runs by gaps-and-islands (position minus per-token
    // rank is constant within a run of equal tokens) — agreement
    // checks the semantics, not a transcription
    "t35_collapse" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(text, '[ \t\n\x0B\f\r]+') AS t FROM documents
        |), pos AS (
        |  SELECT doc_id, unnest(t) AS tok,
        |         unnest(range(1, len(t) + 1)) AS p
        |  FROM toks
        |), grp AS (
        |  SELECT doc_id, tok, p,
        |         p - row_number() OVER (PARTITION BY doc_id, tok ORDER BY p)
        |           AS g
        |  FROM pos
        |), runs AS (
        |  SELECT doc_id, tok, min(p) AS start_p, count(*) AS run_len
        |  FROM grp GROUP BY doc_id, tok, g
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_after,
        |         CAST(max(run_len) AS INT) AS max_run,
        |         string_agg(tok, ' ' ORDER BY start_p) AS clean_text
        |  FROM runs GROUP BY doc_id
        |)
        |SELECT t.doc_id, CAST(len(t.t) AS INT) AS n_tokens,
        |       a.n_after, a.max_run, a.clean_text
        |FROM toks t JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // exact mirror of CorpusStats.bigramLmScore (t36): corpus-trained
    // add-0.5-smoothed bigram LM, per-doc average negative
    // log-likelihood. Counts are exact integers; the per-term doubles
    // are bit-identical, only the sum order differs (~1e-15 relative
    // vs the 1e-6 rounding grid)
    "t36_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |                     x -> x <> '') AS t
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, t FROM toks WHERE len(t) >= 2
        |), bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(len(t) - 1),
        |                               i -> t[i+1] || ' ' || t[i+2])) AS b
        |  FROM dt
        |), per_doc AS (
        |  SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b
        |), cnt AS (
        |  SELECT b, CAST(sum(n) AS BIGINT) AS c FROM per_doc GROUP BY b
        |), ctx AS (
        |  SELECT split_part(b, ' ', 1) AS w1, CAST(sum(c) AS BIGINT) AS cc
        |  FROM cnt GROUP BY 1
        |), vocab AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(t) AS tok FROM dt)
        |)
        |SELECT p.doc_id, CAST(sum(p.n) AS BIGINT) AS n_bigrams,
        |       round(-sum(p.n * ln((c.c + 0.5) / (x.cc + 0.5 * vocab.v)))
        |             / sum(p.n), 6) AS avg_nll
        |FROM per_doc p
        |JOIN cnt c USING (b)
        |JOIN ctx x ON split_part(p.b, ' ', 1) = x.w1
        |CROSS JOIN vocab
        |GROUP BY p.doc_id
        |ORDER BY p.doc_id""".stripMargin,

    // exact mirror of t52 (CorpusStats.perplexityBands): t36's scored
    // frame (same CTEs verbatim), quantile_cont thresholds at the
    // exact double literals of 1.0/3 and 2.0/3 (both engines
    // interpolate at index q*(n-1)), and the same <=-comparison band
    // labels over the 6dp-rounded scores
    "t52_ppl_band" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |                     x -> x <> '') AS t
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, t FROM toks WHERE len(t) >= 2
        |), bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(len(t) - 1),
        |                               i -> t[i+1] || ' ' || t[i+2])) AS b
        |  FROM dt
        |), per_doc AS (
        |  SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b
        |), cnt AS (
        |  SELECT b, CAST(sum(n) AS BIGINT) AS c FROM per_doc GROUP BY b
        |), ctx AS (
        |  SELECT split_part(b, ' ', 1) AS w1, CAST(sum(c) AS BIGINT) AS cc
        |  FROM cnt GROUP BY 1
        |), vocab AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(t) AS tok FROM dt)
        |), scored AS (
        |  SELECT p.doc_id, CAST(sum(p.n) AS BIGINT) AS n_bigrams,
        |         round(-sum(p.n * ln((c.c + 0.5) / (x.cc + 0.5 * vocab.v)))
        |               / sum(p.n), 6) AS avg_nll
        |  FROM per_doc p
        |  JOIN cnt c USING (b)
        |  JOIN ctx x ON split_part(p.b, ' ', 1) = x.w1
        |  CROSS JOIN vocab
        |  GROUP BY p.doc_id
        |), thr AS (
        |  SELECT round(quantile_cont(avg_nll, 0.3333333333333333), 6) AS p_lo,
        |         round(quantile_cont(avg_nll, 0.6666666666666666), 6) AS p_hi
        |  FROM scored
        |)
        |SELECT s.doc_id, s.n_bigrams, s.avg_nll,
        |       CASE WHEN s.avg_nll <= t.p_lo THEN 'head'
        |            WHEN s.avg_nll <= t.p_hi THEN 'middle'
        |            ELSE 'tail' END AS band,
        |       s.avg_nll <= t.p_hi AS keep
        |FROM scored s, thr t
        |ORDER BY s.doc_id""".stripMargin,

    // exact mirror of t53 (CorpusStats.crossEntropySelect): the t36
    // model CTEs twice — once filtered to the English slice (scoring
    // LEFT-joins it, coalescing unseen bigrams/contexts to count 0)
    // and once over the whole corpus — then the Moore–Lewis rounded
    // cross-entropy difference and its keep verdict
    "t53_ml_select" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS in_dom,
        |         list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |                     x -> x <> '') AS t
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, in_dom, t FROM toks WHERE len(t) >= 2
        |), bg AS (
        |  SELECT doc_id, in_dom,
        |         unnest(list_transform(range(len(t) - 1),
        |                               i -> t[i+1] || ' ' || t[i+2])) AS b
        |  FROM dt
        |), per_doc AS (
        |  SELECT doc_id, in_dom, b, count(*) AS n FROM bg GROUP BY 1, 2, 3
        |), cnt_in AS (
        |  SELECT b, CAST(sum(n) AS BIGINT) AS c
        |  FROM per_doc WHERE in_dom GROUP BY b
        |), ctx_in AS (
        |  SELECT split_part(b, ' ', 1) AS w1, CAST(sum(c) AS BIGINT) AS cc
        |  FROM cnt_in GROUP BY 1
        |), v_in AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(t) AS tok FROM dt WHERE in_dom)
        |), cnt_all AS (
        |  SELECT b, CAST(sum(n) AS BIGINT) AS c FROM per_doc GROUP BY b
        |), ctx_all AS (
        |  SELECT split_part(b, ' ', 1) AS w1, CAST(sum(c) AS BIGINT) AS cc
        |  FROM cnt_all GROUP BY 1
        |), v_all AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(t) AS tok FROM dt)
        |), s_in AS (
        |  SELECT p.doc_id, CAST(sum(p.n) AS BIGINT) AS n_bigrams,
        |         round(-sum(p.n * ln((coalesce(c.c, 0) + 0.5)
        |                 / (coalesce(x.cc, 0) + 0.5 * v_in.v))) / sum(p.n), 6)
        |           AS nll_in
        |  FROM per_doc p
        |  LEFT JOIN cnt_in c USING (b)
        |  LEFT JOIN ctx_in x ON split_part(p.b, ' ', 1) = x.w1
        |  CROSS JOIN v_in
        |  GROUP BY p.doc_id
        |), s_all AS (
        |  SELECT p.doc_id,
        |         round(-sum(p.n * ln((c.c + 0.5)
        |                 / (x.cc + 0.5 * v_all.v))) / sum(p.n), 6) AS nll_gen
        |  FROM per_doc p
        |  JOIN cnt_all c USING (b)
        |  JOIN ctx_all x ON split_part(p.b, ' ', 1) = x.w1
        |  CROSS JOIN v_all
        |  GROUP BY p.doc_id
        |)
        |SELECT i.doc_id, i.n_bigrams, i.nll_in, a.nll_gen,
        |       round(i.nll_in - a.nll_gen, 6) AS ced,
        |       round(i.nll_in - a.nll_gen, 6) <= 0.0 AS keep
        |FROM s_in i JOIN s_all a USING (doc_id)
        |ORDER BY i.doc_id""".stripMargin,

    // exact mirror of t54 (Importance.dsirWeights): every unigram and
    // space-joined bigram hashed with the t43 positional-codepoint
    // arithmetic, 64-bucket target-vs-corpus counts, 6dp-rounded
    // per-bucket log ratios (rounded BEFORE the per-doc dot product,
    // matching the engine's driver-rounded literal vector), and the
    // rounded 0.75-quantile keep threshold over ALL documents
    // (featureless docs score 0)
    "t54_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS tgt,
        |         list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
        |                     x -> x <> '') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, tgt, unnest(t) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, tgt,
        |         unnest(list_transform(range(len(t) - 1),
        |                               i -> t[i+1] || ' ' || t[i+2])) AS g
        |  FROM toks
        |), feat AS (
        |  SELECT doc_id, tgt,
        |         list_sum(list_transform(range(1, len(g) + 1),
        |           i -> ascii(substr(g, CAST(i AS INT), 1)) * i)) % 64 AS b
        |  FROM grams
        |), per_doc AS (
        |  SELECT doc_id, b, count(*) AS n FROM feat GROUP BY 1, 2
        |), bkt AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS c_all,
        |         CAST(count(*) FILTER (WHERE tgt) AS BIGINT) AS c_tgt
        |  FROM feat GROUP BY b
        |), tot AS (
        |  SELECT CAST(sum(c_all) AS DOUBLE) AS t_all,
        |         CAST(sum(c_tgt) AS DOUBLE) AS t_tgt
        |  FROM bkt
        |), lr AS (
        |  SELECT b, round(ln((c_tgt + 0.5) / (t_tgt + 0.5 * 64))
        |               - ln((c_all + 0.5) / (t_all + 0.5 * 64)), 6) AS w
        |  FROM bkt CROSS JOIN tot
        |), s AS (
        |  SELECT p.doc_id, CAST(sum(p.n) AS BIGINT) AS n_feats,
        |         round(sum(p.n * lr.w), 6) AS logw
        |  FROM per_doc p JOIN lr USING (b)
        |  GROUP BY p.doc_id
        |), sc AS (
        |  SELECT d.doc_id, coalesce(s.n_feats, 0) AS n_feats,
        |         coalesce(s.logw, 0.0) AS logw
        |  FROM documents d LEFT JOIN s USING (doc_id)
        |), thr AS (
        |  SELECT round(quantile_cont(logw, 0.75), 6) AS q FROM sc
        |)
        |SELECT sc.doc_id, sc.n_feats, sc.logw, sc.logw >= thr.q AS keep
        |FROM sc, thr
        |ORDER BY sc.doc_id""".stripMargin,

    // exact mirror of t56 (Ids.denseIds): the engine computes the
    // dense rank via range partitions + broadcast offsets + local
    // windows; the oracle states the SEMANTICS directly as the global
    // row_number over the same total order
    "t56_dense_ids" ->
      """SELECT doc_id, lang, n_chars,
        |       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
        |            - 1 AS BIGINT) AS sample_id
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // exact mirror of IncrementalDedup semantics (t37): the Bloom
    // sketch + digest anti-join is a routing strategy, never the
    // verdict — the result is plain text-level set difference
    "t37_incr_dedup" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE doc_id >= 200
        |  AND text NOT IN (SELECT text FROM documents WHERE doc_id < 300)
        |ORDER BY doc_id""".stripMargin,

    // t39: batch replay of the streaming keep-first ingest dedup —
    // rebuild the doubled stream input, keep the min-doc_id row per
    // distinct text (ranged ascending batches make first-arrival =
    // global min id)
    "t39_stream_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text, lang, source, n_chars
        |  FROM documents
        |)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM all_docs d
        |JOIN (SELECT min(doc_id) AS doc_id FROM all_docs GROUP BY text) m
        |  USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // exact mirror of t40: rebuild the deterministic URL enrichment,
    // extract the host with the same portable regex, flag against the
    // same blocklist, audit per (domain, blocked)
    "t40_domain_filter" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |         'https://' || source || '.example.org/' || lang || '/'
        |           || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, n_chars,
        |         regexp_extract(url, '^https?://([^/:?#]+)', 1) AS domain
        |  FROM u
        |)
        |SELECT domain,
        |       domain IN ('src7.example.org', 'src13.example.org',
        |                  'src19.example.org') AS blocked,
        |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM d GROUP BY domain ORDER BY domain""".stripMargin,

    // exact mirror of t41 (LineOps.c4LineFilter): same 8-token
    // pseudo-line split, same per-line word-count + terminal-word
    // predicate, same >=2-surviving-lines document rule
    "t41_line_filter" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM documents
        |), ln AS (
        |  SELECT doc_id,
        |         list_transform(range(CAST(ceil(len(t) / 8.0) AS BIGINT)),
        |                        i -> array_to_string(t[i*8+1 : i*8+8], ' '))
        |           AS lines
        |  FROM toks
        |), k AS (
        |  SELECT doc_id, lines,
        |         list_filter(lines, l ->
        |           len(string_split(l, ' ')) >= 5 AND
        |           list_contains(['value','table','row','scan','data','join'],
        |                         list_extract(string_split(l, ' '), -1))) AS kept
        |  FROM ln
        |)
        |SELECT doc_id, CAST(len(lines) AS INT) AS n_lines,
        |       CAST(len(kept) AS INT) AS n_kept,
        |       len(kept) >= 2 AS doc_kept,
        |       coalesce(array_to_string(kept, ' '), '') AS clean_text
        |FROM k ORDER BY doc_id""".stripMargin,

    // exact mirror of t42 (LineOps.crossDocLineDedup) semantics: the
    // xxhash64 prefilter is a routing strategy, never the verdict —
    // the result is plain line-frequency set difference (drop lines in
    // more than 2 distinct docs), reassembled in line order
    "t42_line_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM documents
        |), ln AS (
        |  SELECT doc_id,
        |         list_transform(range(CAST(ceil(len(t) / 8.0) AS BIGINT)),
        |                        i -> array_to_string(t[i*8+1 : i*8+8], ' '))
        |           AS lines
        |  FROM toks
        |), l AS (
        |  SELECT doc_id, unnest(lines) AS line,
        |         unnest(range(len(lines))) AS line_no
        |  FROM ln
        |), dup AS (
        |  SELECT line FROM l GROUP BY line
        |  HAVING count(DISTINCT doc_id) > 2
        |), kept AS (
        |  SELECT doc_id, line, line_no FROM l
        |  WHERE line NOT IN (SELECT line FROM dup)
        |)
        |SELECT n.doc_id, CAST(len(n.lines) AS INT) AS n_lines,
        |       CAST(count(k.line) AS INT) AS n_kept,
        |       coalesce(string_agg(k.line, ' ' ORDER BY k.line_no), '')
        |         AS clean_text
        |FROM ln n LEFT JOIN kept k USING (doc_id)
        |GROUP BY n.doc_id, n.lines
        |ORDER BY n.doc_id""".stripMargin,

    // exact mirror of t43 (TextAnalysis.bowQualityScore): same
    // positional code-point token hash into 64 buckets, same
    // Knuth-scramble weight table, same mean + sigmoid — replayed in
    // plain SQL arithmetic (per-term doubles are bit-identical; only
    // the sum order differs, ~1e-16 vs the 1e-6 rounding grid)
    "t43_bow_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(t) AS tok FROM toks
        |), h AS (
        |  SELECT doc_id,
        |         list_sum(list_transform(range(1, len(tok) + 1),
        |           i -> ascii(substr(tok, CAST(i AS INT), 1)) * i)) % 64 AS b
        |  FROM tok
        |), w AS (
        |  SELECT doc_id,
        |         ((b * 2654435761) % 1000003) / 1000003.0 - 0.5 AS wt
        |  FROM h
        |), s AS (
        |  SELECT doc_id, sum(wt) / count(*) AS m,
        |         CAST(count(*) AS INT) AS n_tokens
        |  FROM w GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       coalesce(s.n_tokens, 0) AS n_tokens,
        |       round(1.0 / (1.0 + exp(-coalesce(s.m, 0.0))), 6) AS score,
        |       coalesce(s.m, 0.0) >= 0.0 AS keep
        |FROM documents d LEFT JOIN s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // replay of t44's TWO contracts in plain SQL: q38's
    // gaps-and-islands session semantics (inclusive merge boundary,
    // end = last event + gap) plus the append-mode watermark rule (a
    // session emits iff its end <= max(event time) - 2 hours; the
    // single-file AvailableNow source processes in one batch, so no
    // row is late-dropped)
    "t44_stream_sessions" ->
      """WITH o AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |         lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP)) AS prev
        |  FROM events
        |), m AS (
        |  SELECT *, CASE WHEN prev IS NULL
        |                   OR ts - prev > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk
        |  FROM o
        |), g AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM m
        |), s AS (
        |  SELECT user_id, min(ts) AS session_start,
        |         max(ts) + INTERVAL 1 HOUR AS session_end,
        |         count(*) AS n_events,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM g GROUP BY user_id, sess
        |), wm AS (
        |  SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 2 HOUR AS w FROM events
        |)
        |SELECT user_id, session_start, session_end, n_events, sum_value
        |FROM s WHERE session_end <= (SELECT w FROM wm)
        |ORDER BY user_id, session_start""".stripMargin,

    // exact mirror of t45 (LineOps.dedupLinesWithinDoc): keep the
    // min-position occurrence of each distinct line per document
    // (matching array_distinct's keep-first contract), reassemble in
    // first-occurrence order
    "t45_line_dedup_doc" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM documents
        |), ln AS (
        |  SELECT doc_id,
        |         list_transform(range(CAST(ceil(len(t) / 8.0) AS BIGINT)),
        |                        i -> array_to_string(t[i*8+1 : i*8+8], ' '))
        |           AS lines
        |  FROM toks
        |), l AS (
        |  SELECT doc_id, unnest(lines) AS line,
        |         unnest(range(len(lines))) AS line_no
        |  FROM ln
        |), first_pos AS (
        |  SELECT doc_id, line, min(line_no) AS p
        |  FROM l GROUP BY doc_id, line
        |)
        |SELECT n.doc_id, CAST(len(n.lines) AS INT) AS n_lines,
        |       CAST(count(f.line) AS INT) AS n_unique,
        |       coalesce(string_agg(f.line, ' ' ORDER BY f.p), '')
        |         AS clean_text
        |FROM ln n LEFT JOIN first_pos f USING (doc_id)
        |GROUP BY n.doc_id, n.lines
        |ORDER BY n.doc_id""".stripMargin,

    // full CTE replay of t48's four-stage curation pipeline: C4 line
    // filter (t41 logic) → exact dedup on clean text → shingle
    // decontamination vs the mod-97 eval cohort (t28 logic, withheld
    // cohort dropped too) → per-source mixture quotas (t29 logic);
    // output is the per-stage audit ledger
    "t48_pipeline" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM documents
        |), ln AS (
        |  SELECT doc_id,
        |         list_transform(range(CAST(ceil(len(t) / 8.0) AS BIGINT)),
        |                        i -> array_to_string(t[i*8+1 : i*8+8], ' '))
        |           AS lines
        |  FROM toks
        |), k AS (
        |  SELECT doc_id,
        |         list_filter(lines, l ->
        |           len(string_split(l, ' ')) >= 5 AND
        |           list_contains(['value','table','row','scan','data','join'],
        |                         list_extract(string_split(l, ' '), -1))) AS kept
        |  FROM ln
        |), s1 AS (
        |  SELECT doc_id,
        |         coalesce(array_to_string(kept, ' '), '') AS clean_text
        |  FROM k WHERE len(kept) >= 2
        |), s2 AS (
        |  SELECT min(doc_id) AS doc_id, clean_text
        |  FROM s1 GROUP BY clean_text
        |), ctoks AS (
        |  SELECT doc_id, string_split_regex(lower(clean_text), '\s+') AS t
        |  FROM s2
        |), sets AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END) AS sh
        |  FROM ctoks
        |), tr AS (
        |  SELECT doc_id AS train_id, unnest(sh) AS s FROM sets
        |), ev AS (
        |  SELECT doc_id AS eval_id, unnest(sh) AS s FROM sets
        |  WHERE doc_id % 97 = 0
        |), cont AS (
        |  SELECT DISTINCT train_id AS doc_id FROM (
        |    SELECT train_id, eval_id FROM tr JOIN ev USING (s)
        |    WHERE train_id != eval_id
        |    GROUP BY 1, 2 HAVING count(*) >= 2)
        |), s3 AS (
        |  SELECT doc_id FROM s2
        |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)
        |    AND doc_id % 97 != 0
        |), ranked AS (
        |  SELECT s3.doc_id, d.source,
        |         row_number() OVER (
        |           PARTITION BY d.source
        |           ORDER BY md5(CAST(s3.doc_id AS VARCHAR))) AS rn
        |  FROM s3 JOIN documents d USING (doc_id)
        |), s4 AS (
        |  SELECT doc_id FROM ranked
        |  WHERE rn <= CASE
        |    WHEN source IN ('src0','src1','src2','src3','src4') THEN 10
        |    WHEN source IN ('src5','src6','src7','src8','src9') THEN 5
        |    ELSE 2 END
        |)
        |SELECT 1 AS step, 'line_filter' AS stage,
        |       (SELECT count(*) FROM documents) AS docs_in,
        |       (SELECT count(*) FROM s1) AS docs_out
        |UNION ALL SELECT 2, 'exact_dedup',
        |       (SELECT count(*) FROM s1), (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'decontaminate',
        |       (SELECT count(*) FROM s2), (SELECT count(*) FROM s3)
        |UNION ALL SELECT 4, 'mixture',
        |       (SELECT count(*) FROM s3), (SELECT count(*) FROM s4)
        |ORDER BY step""".stripMargin,

    // exact mirror of t49 (Mixing.sampleWeightBudget): same md5 order
    // per source, same BPE-ish token weight (regexp replay of the
    // native counter, as t10), greedy prefix under the budget via a
    // monotone running sum
    "t59_upsample" ->
      """WITH n AS (
        |  SELECT source, count(*) AS cnt FROM documents GROUP BY source
        |), w AS (
        |  SELECT d.doc_id, d.source, n.cnt,
        |         CASE d.source
        |           WHEN 'src0' THEN CAST(2.5 AS DOUBLE)
        |           WHEN 'src1' THEN CAST(1.25 AS DOUBLE)
        |           WHEN 'src2' THEN CAST(0.4 AS DOUBLE)
        |           ELSE CAST(1.0 AS DOUBLE) END AS wt
        |  FROM documents d JOIN n USING (source)
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        |  FROM w
        |), fulle AS (
        |  SELECT doc_id, source,
        |         CAST(unnest(range(0, CAST(floor(wt) AS BIGINT))) AS INT) AS epoch
        |  FROM r
        |), part AS (
        |  SELECT doc_id, source, CAST(floor(wt) AS INT) AS epoch
        |  FROM r WHERE rn <= floor((wt - floor(wt)) * cnt)
        |)
        |SELECT * FROM fulle UNION ALL SELECT * FROM part
        |ORDER BY doc_id, epoch""".stripMargin,

    "t49_token_mixture" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_extract_all(text,
        |           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS INT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |         sum(n_tokens) OVER (
        |           PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR))
        |           ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM w
        |)
        |SELECT doc_id, source, n_tokens FROM c
        |WHERE cum <= CASE
        |  WHEN source IN ('src0','src1','src2','src3','src4') THEN 4000
        |  WHEN source IN ('src5','src6','src7','src8','src9') THEN 2000
        |  ELSE 800 END
        |ORDER BY doc_id""".stripMargin,

    "t13_sample" ->
      """WITH binned AS (
        |  SELECT o_orderkey, o_totalprice,
        |         ntile(20) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
        |  FROM orders
        |), capped AS (
        |  SELECT o_orderkey, o_totalprice,
        |         row_number() OVER (
        |           PARTITION BY bin
        |           ORDER BY md5(CAST(o_orderkey AS VARCHAR))) AS rn
        |  FROM binned
        |)
        |SELECT o_orderkey, o_totalprice FROM capped WHERE rn <= 25""".stripMargin,

    "t1_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
        |       length(text) AS text_len
        |FROM documents GROUP BY text""".stripMargin,

    "t61_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS c
        |  FROM documents WHERE length(text) > 0
        |), f AS (
        |  SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2
        |), t AS (
        |  SELECT doc_id, CAST(sum(n) AS DOUBLE) AS tot FROM f GROUP BY 1
        |), p AS (
        |  SELECT f.doc_id,
        |         round(-sum((n / tot) * log2(n / tot)), 6) AS entropy,
        |         CAST(count(*) AS INTEGER) AS unique_chars,
        |         round(max(n) / first(tot), 6) AS top_char_ratio
        |  FROM f JOIN t USING (doc_id) GROUP BY f.doc_id
        |)
        |SELECT doc_id, entropy, unique_chars, top_char_ratio,
        |       (entropy < 3.9 OR top_char_ratio > 0.2) AS low_quality
        |FROM p
        |UNION ALL
        |SELECT doc_id, 0.0, 0, 0.0, true
        |FROM documents WHERE length(text) = 0""".stripMargin,

    // exact mirror of t238 (marginMine at the explicit brute-force
    // audit baseline — the pre-flip t75 contract; t75 itself now runs
    // the operator's LSH default and is gate-checked instead)
    "t238_margin_bf_audit" ->
      // raw cosine ranks the top-k (the heap selects on unrounded
      // scores — the t5 convention), the 6dp-ROUNDED cosine feeds the
      // NNk means and the margin (Spark's top-k output is rounded)
      """WITH s AS (
        |  SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 2 = 0
        |), t AS (
        |  SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 2 <> 0
        |), x AS (
        |  SELECT src_id, tgt_id,
        |         list_cosine_similarity(s.v, t.v) AS c,
        |         round(list_cosine_similarity(s.v, t.v), 6) AS rc
        |  FROM s CROSS JOIN t
        |), fwd AS (
        |  SELECT src_id, tgt_id, rc, row_number() OVER (
        |    PARTITION BY src_id ORDER BY c DESC, tgt_id) AS r
        |  FROM x
        |), avs AS (
        |  SELECT src_id, avg(rc) AS avg_s FROM fwd WHERE r <= 4 GROUP BY 1
        |), bwd AS (
        |  SELECT tgt_id, rc, row_number() OVER (
        |    PARTITION BY tgt_id ORDER BY c DESC, src_id) AS r
        |  FROM x
        |), avt AS (
        |  SELECT tgt_id, avg(rc) AS avg_t FROM bwd WHERE r <= 4 GROUP BY 1
        |), m AS (
        |  SELECT f.src_id, f.tgt_id, f.rc,
        |         round(f.rc / ((avg_s + avg_t) / 2), 6) AS margin
        |  FROM fwd f JOIN avs USING (src_id) JOIN avt USING (tgt_id)
        |  WHERE f.r <= 4
        |), best AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rn
        |  FROM m
        |)
        |SELECT src_id, tgt_id, rc AS cosine, margin,
        |       margin >= 1.0 AS accepted
        |FROM best WHERE rn = 1""".stripMargin,

    "t73_epoch_shuffle" ->
      """SELECT doc_id, e.epoch,
        |       CAST(row_number() OVER (
        |         PARTITION BY e.epoch
        |         ORDER BY md5(e.epoch || ':' || CAST(doc_id AS VARCHAR)),
        |                  doc_id) - 1 AS BIGINT) AS epoch_pos
        |FROM documents
        |CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e""".stripMargin,

    "t70_k_anonymity" ->
      """SELECT doc_id, lang, source,
        |       count(*) OVER (PARTITION BY lang, source) AS group_size,
        |       count(*) OVER (PARTITION BY lang, source) >= 5 AS kept
        |FROM documents""".stripMargin,

    "t69_length_buckets" ->
      // portable regexp token count (the t49/t32 replay) + exact
      // quartile edges via quantile_cont, both 6dp-aligned with
      // Spark's percentile (see t52's tied-value-knot note)
      """WITH w AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text,
        |           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS BIGINT)
        |           AS w
        |  FROM documents
        |), e AS (
        |  SELECT round(quantile_cont(w, 0.25), 6) AS q0,
        |         round(quantile_cont(w, 0.5), 6) AS q1,
        |         round(quantile_cont(w, 0.75), 6) AS q2
        |  FROM w
        |), b AS (
        |  SELECT doc_id, w,
        |         CASE WHEN w <= q0 THEN 0
        |              WHEN w <= q1 THEN 1
        |              WHEN w <= q2 THEN 2
        |              ELSE 3 END AS bucket
        |  FROM w CROSS JOIN e
        |)
        |SELECT bucket, count(*) AS n_docs,
        |       min(w) AS min_w, max(w) AS max_w,
        |       CAST(sum(w) AS BIGINT) AS sum_w,
        |       CAST(count(*) * max(w) - sum(w) AS BIGINT) AS padding_waste,
        |       CASE WHEN max(w) > 0 THEN
        |         round(CAST(count(*) * max(w) - sum(w) AS DOUBLE)
        |               / CAST(count(*) * max(w) AS DOUBLE), 6)
        |       ELSE 0.0 END AS waste_ratio
        |FROM b GROUP BY bucket""".stripMargin,

    "t67_ngram_novelty" ->
      // string-shingle replay of the hashed-shingle coverage join
      // (identical modulo 64-bit collisions — none at oracle scale);
      // split arithmetic replays t34's buckets
      """WITH b AS (
        |  SELECT doc_id, text,
        |         ((doc_id % 1000000007) * 2654435761) % 1000000007 % 1000
        |           AS bucket
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, bucket,
        |         string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS t
        |  FROM b
        |), sets AS (
        |  SELECT doc_id, bucket, list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END) AS sh
        |  FROM toks
        |), ref AS (
        |  SELECT DISTINCT unnest(sh) AS s FROM sets WHERE bucket < 800
        |), tgt AS (
        |  SELECT doc_id, unnest(sh) AS s FROM sets
        |  WHERE bucket >= 800 AND bucket < 900
        |), j AS (
        |  SELECT t.doc_id, count(*) AS n_shingles, count(r.s) AS n_seen
        |  FROM tgt t LEFT JOIN ref r ON t.s = r.s
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_shingles, n_seen,
        |       round(n_seen / CAST(n_shingles AS DOUBLE), 6) AS coverage,
        |       round(n_seen / CAST(n_shingles AS DOUBLE), 6) >= 0.5
        |         AS high_overlap
        |FROM j""".stripMargin,

    "t62_url_canon" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE CAST(doc_id % 4 AS INTEGER)
        |           WHEN 0 THEN 'HTTPS://Example.ORG:443/' || source || '/p'
        |             || (doc_id % 100) || '/?utm_source=rss&ref=tw#top'
        |           WHEN 1 THEN 'https://example.org/' || source || '/p'
        |             || (doc_id % 100) || '?utm_campaign=x&id=7&fbclid=abc'
        |           WHEN 2 THEN 'http://Example.org:80/' || source || '/p'
        |             || (doc_id % 100) || '/#sec'
        |           ELSE 'http://example.org/' || source || '/p'
        |             || (doc_id % 100) || '?gclid=z&id=7&b=2'
        |         END AS url
        |  FROM documents
        |), s1 AS (
        |  SELECT doc_id, url, regexp_replace(url, '#.*', '') AS nf FROM d
        |), s2 AS (
        |  SELECT doc_id, url,
        |         lower(regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*'))
        |           || substr(nf, length(
        |                regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*')) + 1)
        |           AS lw
        |  FROM s1
        |), s3 AS (
        |  SELECT doc_id, url,
        |         regexp_replace(regexp_replace(lw,
        |           '^(https://[^/:?#]*):443([/?#].*)?$', '\1\2'),
        |           '^(http://[^/:?#]*):80([/?#].*)?$', '\1\2') AS np
        |  FROM s2
        |), s4 AS (
        |  SELECT doc_id, url,
        |         CASE WHEN instr(np, '?') > 0
        |              THEN substr(np, 1, instr(np, '?') - 1) ELSE np END AS path,
        |         CASE WHEN instr(np, '?') > 0
        |              THEN substr(np, instr(np, '?') + 1) ELSE '' END AS q
        |  FROM s3
        |), s5 AS (
        |  SELECT doc_id, url,
        |         regexp_replace(path, '/+$', '') AS pathc,
        |         coalesce(list_aggregate(list_filter(string_split(q, '&'),
        |           p -> NOT regexp_matches(p, '^(utm_[^=&]*|ref|fbclid|gclid)=')),
        |           'string_agg', '&'), '') AS kept
        |  FROM s4
        |), c AS (
        |  SELECT doc_id, url,
        |         CASE WHEN kept = '' THEN pathc
        |              ELSE pathc || '?' || kept END AS canon_url
        |  FROM s5
        |)
        |SELECT doc_id, url, canon_url,
        |       doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS keep
        |FROM c""".stripMargin,

    "t60_embed_decontam" ->
      """WITH ev AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 20 = 0
        |), co AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 20 <> 0
        |)
        |SELECT c.vec_id,
        |       round(max(list_cosine_similarity(c.v, ev.v)), 6) AS max_eval_cos,
        |       round(max(list_cosine_similarity(c.v, ev.v)), 6) >= 0.45
        |         AS contaminated
        |FROM co c CROSS JOIN ev
        |GROUP BY c.vec_id""".stripMargin,

    "t5_embed_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q.qid, e.vec_id AS id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec) AS c
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id != q.qid
        |), ranked AS (
        |  SELECT qid, id, c,
        |         row_number() OVER (PARTITION BY qid ORDER BY c DESC, id) AS rank
        |  FROM scored
        |)
        |SELECT qid, rank, id, round(c, 6) AS cosine
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "t9_quality" ->
      """SELECT doc_id,
        |       length(text) AS n_chars_measured,
        |       len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS n_tokens,
        |       round(CAST(length(text) - (len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) - 1) AS DOUBLE)
        |             / len(string_split_regex(text, '[ \t\n\x0B\f\r]+')), 6) AS avg_token_len,
        |       round(CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS DOUBLE)
        |             / length(text), 6) AS punct_ratio,
        |       round(CAST(len(list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |                       w -> list_contains(['the','a','of','and','is'], w))) AS DOUBLE)
        |             / len(string_split_regex(text, '[ \t\n\x0B\f\r]+')), 6) AS stopword_ratio
        |FROM documents""".stripMargin,

    "q40_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events
        |), m AS (
        |  SELECT *, lag(event_type) OVER w AS prev,
        |         row_number() OVER w AS rn
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), c AS (
        |  -- rn = 1 opens explicitly: lag() = NULL is ambiguous between
        |  -- "first row" and "previous attr was NULL"
        |  SELECT * FROM m WHERE rn = 1 OR prev IS DISTINCT FROM event_type
        |)
        |SELECT user_id, event_type, ts AS valid_from,
        |       lead(ts) OVER w AS valid_to,
        |       (lead(ts) OVER w) IS NULL AS is_current
        |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q41_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms
        |  WHERE length(term) > 0 GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term,
        |         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |             ORDER BY tfidf DESC, term) AS rnk
        |  FROM scored
        |)
        |SELECT doc_id, rnk, term, tfidf FROM ranked WHERE rnk <= 3""".stripMargin,

    "q42_profile" ->
      """SELECT 'o_orderkey' AS col_name,
        |       count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
        |       count(DISTINCT o_orderkey) AS n_distinct,
        |       CAST(min(o_orderkey) AS VARCHAR) AS min_str,
        |       CAST(max(o_orderkey) AS VARCHAR) AS max_str FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(CASE WHEN o_custkey IS NULL THEN 1 END),
        |       count(DISTINCT o_custkey),
        |       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
        |       count(DISTINCT o_orderstatus),
        |       CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(CASE WHEN o_totalprice IS NULL THEN 1 END),
        |       count(DISTINCT o_totalprice),
        |       CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
        |       CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(CASE WHEN o_orderdate IS NULL THEN 1 END),
        |       count(DISTINCT o_orderdate),
        |       CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
        |       count(DISTINCT o_orderpriority),
        |       CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
        |FROM orders""".stripMargin,

    "q43_skew_salted" ->
      // the plain (unsalted) join+rollup — the salted physical rewrite
      // must produce byte-identical results
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q44_anti_join" ->
      """SELECT p_brand, count(*) AS n_parts,
        |       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_retail
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_partkey = p.p_partkey
        |                    AND l.l_quantity >= 49)
        |GROUP BY p_brand""".stripMargin,

    "q45_full_outer" ->
      """WITH buys AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS buy_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), clicks AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |)
        |SELECT COALESCE(buys.day, clicks.day) AS day, buy_value, click_value
        |FROM buys FULL OUTER JOIN clicks ON buys.day = clicks.day""".stripMargin,

    "q46_scalar_subquery" ->
      // the 1.5×avg threshold is a double computed from 2-decimal
      // prices: engine summation order can move it ulps, but prices
      // are >= 0.01 apart so no row straddles the gap
      """SELECT l_returnflag, count(*) AS n_pricey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_extendedprice >
        |      (SELECT 1.5 * avg(l_extendedprice) FROM lineitem)
        |GROUP BY l_returnflag""".stripMargin,

    "t18_cluster" ->
      (ClusterReachCte + "\n" +
      """SELECT id AS doc_id, min(r) AS component,
        |       min(r) = id AS is_rep
        |FROM reach GROUP BY id""".stripMargin),

    // t38: the APPLY step over the same components — one canonical
    // survivor per cluster (longest text, doc_id tie-break) + size
    "t38_canonical" ->
      (ClusterReachCte + ",\n" +
      """labeled AS (
        |  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
        |), ranked AS (
        |  SELECT l.component, d.doc_id, d.n_chars,
        |         count(*) OVER (PARTITION BY l.component) AS cluster_size,
        |         row_number() OVER (PARTITION BY l.component
        |                            ORDER BY d.n_chars DESC, d.doc_id)
        |           AS rn
        |  FROM labeled l JOIN documents d USING (doc_id)
        |)
        |SELECT component, doc_id AS canonical_id, n_chars, cluster_size
        |FROM ranked WHERE rn = 1 ORDER BY component""".stripMargin),

    "t90_leakfree_split" ->
      // components via the shared recursive CTE (the t18 replay), then
      // t34's exact mod-prime arithmetic applied to the COMPONENT id
      (ClusterReachCte + ",\n" +
      """labeled AS (
        |  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
        |), b AS (
        |  SELECT doc_id, component,
        |         ((component % 1000000007) * 2654435761)
        |           % 1000000007 % 1000 AS bucket
        |  FROM labeled
        |)
        |SELECT doc_id, component, bucket,
        |       CASE WHEN bucket < 800 THEN 'train'
        |            WHEN bucket < 900 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin),

    "t19_redact" ->
      // rebuild the identical PII-enriched input, replay the identical
      // (Java/RE2-portable) redaction regexes
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@example.com call 555-'
        |              || CAST((doc_id * 7919) % 10000 AS VARCHAR) AS s
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, s,
        |         regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                        '<EMAIL>', 'g') AS masked
        |  FROM p
        |)
        |SELECT doc_id,
        |       regexp_replace(masked, '[0-9]{3,}', '<NUM>', 'g') AS redacted,
        |       len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |       len(regexp_extract_all(masked, '[0-9]{3,}')) AS n_num_runs
        |FROM r""".stripMargin,

    "t20_quantize" ->
      // fixed-order IEEE-double replay of the quantization formula:
      // same ops, same order => identical bits before the final round
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), b AS (
        |  SELECT vec_id, v, list_min(v) AS lo,
        |         (list_max(v) - list_min(v)) / 255.0 AS scale
        |  FROM v
        |), q AS (
        |  SELECT vec_id, v, lo, scale,
        |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |         ELSE list_transform(v,
        |                x -> CAST(floor((x - lo) / scale + 0.5) AS INT)) END AS codes
        |  FROM b
        |), e AS (
        |  SELECT vec_id, lo, scale, codes,
        |    list_transform(range(len(v)),
        |                   i -> pow(v[i+1] - (lo + codes[i+1] * scale), 2)) AS sq_err,
        |    len(v) AS n
        |  FROM q
        |)
        |SELECT vec_id, round(lo, 6) AS lo, round(scale, 6) AS scale_q,
        |       array_to_string(codes, ',') AS codes_csv,
        |       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), sq_err),
        |                         (a, b) -> a + b) / n, 9) AS mse
        |FROM e""".stripMargin,

    "t22_streaming_join" ->
      // batch replay of the stream-stream interval join: single-batch
      // AvailableNow emits every match (no late rows), so the streaming
      // result IS the batch interval join
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |       c.user_id, p.value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts, value
        |      FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.pts >= c.ts - INTERVAL 1 HOUR AND p.pts <= c.ts""".stripMargin,

    "t23_streaming_upsert" ->
      // keep-latest is order-independent, so the incremental foreachBatch
      // merge must land exactly on the batch keep-latest window
      """SELECT user_id, event_type AS last_type,
        |       CAST(ts AS TIMESTAMP) AS last_ts, value AS last_value
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "t24_stateful_balance" ->
      // the final stateful snapshot per wallet = plain batch aggregate;
      // both engines' double sums drift only ~1e-12 from the same true
      // value, so the 2dp round lands identically
      """SELECT CAST(user_id AS VARCHAR) AS wallet,
        |       round(sum(value), 2) AS net_r,
        |       count(*) AS n_events,
        |       max(CAST(ts AS TIMESTAMP)) AS last_ts
        |FROM events GROUP BY user_id""".stripMargin,

    "t10_tokens" ->
      """SELECT doc_id,
        |       len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS bpeish_tokens
        |FROM documents""".stripMargin,

    "t94_hybrid_search" ->
      // BM25 arithmetic mirrored op-for-op (k1=1.2, b=0.75, Lucene
      // plus-one idf), dense leg = t5's proven cosine parity, RRF sums
      // <= 2 reciprocal ranks per id
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |         unnest(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')) AS term
        |  FROM documents
        |), tok2 AS (
        |  SELECT * FROM toks WHERE length(term) > 0
        |), dl AS (
        |  SELECT id, count(*) AS dl FROM tok2 GROUP BY id
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
        |), tf AS (
        |  SELECT id, term, count(*) AS tf FROM tok2
        |  WHERE term IN ('hash', 'join', 'window') GROUP BY id, term
        |), dft AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), idf AS (
        |  SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,
        |         avgdl
        |  FROM dft CROSS JOIN stats
        |), sc AS (
        |  SELECT tf.id,
        |         round(sum(idf.idf * (tf.tf * 2.2)
        |                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / idf.avgdl))),
        |               6) AS bm25
        |  FROM tf JOIN idf USING (term) JOIN dl ON tf.id = dl.id
        |  GROUP BY tf.id
        |), sparse AS (
        |  SELECT id, row_number() OVER (ORDER BY bm25 DESC, id) AS rank
        |  FROM sc QUALIFY rank <= 50
        |), q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings
        |  WHERE vec_id = 0
        |), dense AS (
        |  SELECT e.vec_id AS id,
        |         row_number() OVER (
        |           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                           q.qvec) DESC, e.vec_id) AS rank
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
        |  QUALIFY rank <= 50
        |), unioned AS (
        |  SELECT id, rank FROM sparse UNION ALL SELECT id, rank FROM dense
        |), fused AS (
        |  SELECT id, round(sum(1.0 / (60 + rank)), 6) AS rrf,
        |         count(*) AS n_lists
        |  FROM unioned GROUP BY id
        |)
        |SELECT row_number() OVER (ORDER BY rrf DESC, id) AS fused_rank,
        |       id, rrf, n_lists
        |FROM fused QUALIFY fused_rank <= 20
        |ORDER BY fused_rank""".stripMargin,

    // t270: t94's proven fused ranking (CTEs duplicated verbatim, the
    // t252 convention), then the deterministic cross-scorer replayed
    // as exact integers: 1e6·(ordered query-term adjacencies) +
    // 1e3·(distinct terms present) − token count; fused ids with no
    // document row score as empty text on BOTH sides
    "t270_rerank" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |         unnest(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')) AS term
        |  FROM documents
        |), tok2 AS (
        |  SELECT * FROM toks WHERE length(term) > 0
        |), dl AS (
        |  SELECT id, count(*) AS dl FROM tok2 GROUP BY id
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
        |), tf AS (
        |  SELECT id, term, count(*) AS tf FROM tok2
        |  WHERE term IN ('hash', 'join', 'window') GROUP BY id, term
        |), dft AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), idf AS (
        |  SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,
        |         avgdl
        |  FROM dft CROSS JOIN stats
        |), sc AS (
        |  SELECT tf.id,
        |         round(sum(idf.idf * (tf.tf * 2.2)
        |                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / idf.avgdl))),
        |               6) AS bm25
        |  FROM tf JOIN idf USING (term) JOIN dl ON tf.id = dl.id
        |  GROUP BY tf.id
        |), sparse AS (
        |  SELECT id, row_number() OVER (ORDER BY bm25 DESC, id) AS rank
        |  FROM sc QUALIFY rank <= 50
        |), q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings
        |  WHERE vec_id = 0
        |), dense AS (
        |  SELECT e.vec_id AS id,
        |         row_number() OVER (
        |           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                           q.qvec) DESC, e.vec_id) AS rank
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
        |  QUALIFY rank <= 50
        |), unioned AS (
        |  SELECT id, rank FROM sparse UNION ALL SELECT id, rank FROM dense
        |), fused AS (
        |  SELECT id, round(sum(1.0 / (60 + rank)), 6) AS rrf
        |  FROM unioned GROUP BY id
        |), top20 AS (
        |  SELECT id, row_number() OVER (ORDER BY rrf DESC, id) AS first_rank
        |  FROM fused QUALIFY first_rank <= 20
        |), ctoks AS (
        |  SELECT t.id, unnest(t.l) AS term, generate_subscripts(t.l, 1) AS p
        |  FROM (SELECT top20.id,
        |               list_filter(string_split_regex(
        |                   lower(coalesce(d.text, '')), '[ \t\n\x0B\f\r]+'),
        |                 x -> length(x) > 0) AS l
        |        FROM top20 LEFT JOIN documents d ON d.doc_id = top20.id) t
        |), adj AS (
        |  SELECT a.id, count(*) AS n_adj
        |  FROM ctoks a JOIN ctoks b ON b.id = a.id AND b.p = a.p + 1
        |  WHERE (a.term = 'hash' AND b.term = 'join')
        |     OR (a.term = 'join' AND b.term = 'window')
        |  GROUP BY a.id
        |), cov AS (
        |  SELECT id, count(DISTINCT term) AS n_match FROM ctoks
        |  WHERE term IN ('hash', 'join', 'window') GROUP BY id
        |), ln AS (
        |  SELECT id, count(*) AS n_tok FROM ctoks GROUP BY id
        |), scored AS (
        |  SELECT t.id, t.first_rank,
        |         coalesce(adj.n_adj, 0) * 1000000
        |           + coalesce(cov.n_match, 0) * 1000
        |           - coalesce(ln.n_tok, 0) AS score
        |  FROM top20 t LEFT JOIN adj USING (id) LEFT JOIN cov USING (id)
        |       LEFT JOIN ln USING (id)
        |)
        |SELECT CAST(0 AS BIGINT) AS query_id,
        |       row_number() OVER (ORDER BY score DESC, id) AS rerank,
        |       id, CAST(score AS BIGINT) AS score,
        |       CAST(first_rank AS BIGINT) AS first_rank,
        |       CAST(first_rank AS BIGINT)
        |         - row_number() OVER (ORDER BY score DESC, id) AS rank_shift
        |FROM scored QUALIFY rerank <= 10 ORDER BY rerank""".stripMargin,

    // exact mirror of Retrieval.rankingMetrics over the t94 legs
    // (t252): list replay = t94's proven arithmetic cut at k = 20,
    // relevance = docs with >= 2 distinct query terms, DCG/IDCG terms
    // micro-rounded BIGINTs (the t228 log convention), each metric one
    // IEEE divide of exact integers
    "t252_ranking_metrics" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |         unnest(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')) AS term
        |  FROM documents
        |), tok2 AS (
        |  SELECT * FROM toks WHERE length(term) > 0
        |), dl AS (
        |  SELECT id, count(*) AS dl FROM tok2 GROUP BY id
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
        |), tf AS (
        |  SELECT id, term, count(*) AS tf FROM tok2
        |  WHERE term IN ('hash', 'join', 'window') GROUP BY id, term
        |), dft AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), idf AS (
        |  SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,
        |         avgdl
        |  FROM dft CROSS JOIN stats
        |), sc AS (
        |  SELECT tf.id,
        |         round(sum(idf.idf * (tf.tf * 2.2)
        |                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / idf.avgdl))),
        |               6) AS bm25
        |  FROM tf JOIN idf USING (term) JOIN dl ON tf.id = dl.id
        |  GROUP BY tf.id
        |), sparse AS (
        |  SELECT id, row_number() OVER (ORDER BY bm25 DESC, id) AS rank
        |  FROM sc QUALIFY rank <= 50
        |), q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings
        |  WHERE vec_id = 0
        |), dense AS (
        |  SELECT e.vec_id AS id,
        |         row_number() OVER (
        |           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                           q.qvec) DESC, e.vec_id) AS rank
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
        |  QUALIFY rank <= 50
        |), unioned AS (
        |  SELECT id, rank FROM sparse UNION ALL SELECT id, rank FROM dense
        |), fused AS (
        |  SELECT id, round(sum(1.0 / (60 + rank)), 6) AS rrf
        |  FROM unioned GROUP BY id
        |), fusedtop AS (
        |  SELECT id, row_number() OVER (ORDER BY rrf DESC, id) AS rank
        |  FROM fused QUALIFY rank <= 20
        |), lists AS (
        |  SELECT 'sparse' AS leg, id, rank FROM sparse WHERE rank <= 20
        |  UNION ALL SELECT 'dense', id, rank FROM dense WHERE rank <= 20
        |  UNION ALL SELECT 'fused', id, rank FROM fusedtop
        |), rel AS (
        |  SELECT id FROM (
        |    SELECT id, count(DISTINCT term) AS c FROM tok2
        |    WHERE term IN ('hash', 'join', 'window') GROUP BY id)
        |  WHERE c >= 2
        |), nrel AS (SELECT CAST(count(*) AS BIGINT) AS n_rel FROM rel),
        |hit AS (SELECT leg, rank FROM lists JOIN rel USING (id)),
        |agg AS (
        |  SELECT leg, CAST(count(*) AS BIGINT) AS hits,
        |         min(rank) AS first_rel,
        |         CAST(sum(CAST(round(1000000.0 /
        |             (ln(CAST(rank AS DOUBLE) + 1) / ln(2.0)))
        |           AS BIGINT)) AS BIGINT) AS dcg
        |  FROM hit GROUP BY leg
        |), idcg AS (
        |  SELECT CAST(sum(CAST(round(1000000.0 /
        |      (ln(CAST(i AS DOUBLE) + 1) / ln(2.0))) AS BIGINT)) AS BIGINT)
        |    AS idcg
        |  FROM (SELECT unnest(range(1,
        |    1 + least(20, (SELECT n_rel FROM nrel)))) AS i)
        |), names AS (SELECT unnest(['sparse', 'dense', 'fused']) AS leg)
        |SELECT names.leg, nrel.n_rel,
        |  coalesce(agg.hits, 0) AS hits,
        |  round(CAST(coalesce(agg.hits, 0) AS DOUBLE) / nrel.n_rel, 6)
        |    AS recall,
        |  round(CAST(coalesce(agg.hits, 0) AS DOUBLE) / 20, 6) AS prec,
        |  coalesce(round(1.0 / agg.first_rel, 6), 0.0) AS mrr,
        |  coalesce(round(CAST(agg.dcg AS DOUBLE) / idcg.idcg, 6), 0.0)
        |    AS ndcg
        |FROM names LEFT JOIN agg USING (leg)
        |CROSS JOIN nrel CROSS JOIN idcg
        |ORDER BY leg""".stripMargin,

    // exact mirror of TextDedup.winnowingFingerprints (t253): 48-bit
    // md5 char-8-gram digests, 4-window list minima, distinct collapse
    "t253_winnowing" ->
      """WITH d AS (
        |  SELECT doc_id, lower(text) AS t FROM documents
        |  WHERE text IS NOT NULL
        |), g AS (
        |  SELECT doc_id, CASE WHEN length(t) < 8
        |    THEN [CAST('0x' || substr(md5(t), 1, 12) AS BIGINT)]
        |    ELSE list_transform(range(1, length(t) - 6),
        |      i -> CAST('0x' || substr(md5(substr(t, i, 8)), 1, 12)
        |           AS BIGINT)) END AS hs
        |  FROM d
        |), wn AS (
        |  SELECT doc_id, len(hs) AS ng,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(hs) - 3, 1) + 1),
        |      j -> list_min(hs[j:j+3]))) AS fps
        |  FROM g
        |)
        |SELECT doc_id, CAST(ng AS BIGINT) AS n_grams,
        |  CAST(len(fps) AS BIGINT) AS n_fingerprints,
        |  round(CAST(len(fps) AS DOUBLE) / ng, 6) AS density
        |FROM wn ORDER BY doc_id""".stripMargin,

    // exact mirror of TextDedup.winnowingPairs (t254): the t253
    // fingerprint replay + df-capped posting join (2..10 occupancy —
    // saturated buckets drop, matching the engine's saturating cap),
    // pair counts and fingerprint Jaccard
    "t254_winnow_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, lower(text) AS t FROM documents
        |  WHERE text IS NOT NULL
        |), g AS (
        |  SELECT doc_id, CASE WHEN length(t) < 8
        |    THEN [CAST('0x' || substr(md5(t), 1, 12) AS BIGINT)]
        |    ELSE list_transform(range(1, length(t) - 6),
        |      i -> CAST('0x' || substr(md5(substr(t, i, 8)), 1, 12)
        |           AS BIGINT)) END AS hs
        |  FROM d
        |), wn AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |      range(1, greatest(len(hs) - 3, 1) + 1),
        |      j -> list_min(hs[j:j+3]))) AS fps
        |  FROM g
        |), p AS (
        |  SELECT doc_id AS id, unnest(fps) AS h FROM wn
        |), keep AS (
        |  SELECT h FROM p GROUP BY h HAVING count(*) BETWEEN 2 AND 10
        |), pp AS (
        |  SELECT p.id, p.h FROM p JOIN keep USING (h)
        |), pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |         CAST(count(*) AS BIGINT) AS n_shared
        |  FROM pp a JOIN pp b ON a.h = b.h AND a.id < b.id
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), nf AS (
        |  SELECT doc_id AS id, CAST(len(fps) AS BIGINT) AS nf FROM wn
        |)
        |SELECT id_a, id_b, n_shared,
        |  round(CAST(n_shared AS DOUBLE)
        |        / (fa.nf + fb.nf - n_shared), 6) AS jaccard
        |FROM pairs
        |JOIN nf fa ON fa.id = pairs.id_a
        |JOIN nf fb ON fb.id = pairs.id_b
        |ORDER BY id_a, id_b""".stripMargin,

    // exact mirror of CorpusStats.datacard (t255): one GROUP BY source
    // of integer legs (tokens unfiltered — the t2 convention; dedup by
    // md5 digest) + the t253 winnowing replay reduced per source
    "t255_datacard" ->
      """WITH d AS (
        |  SELECT doc_id, source, lang, text, lower(text) AS t
        |  FROM documents WHERE text IS NOT NULL
        |), base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |    CAST(sum(len(string_split_regex(t, '[ \t\n\x0B\f\r]+')))
        |      AS BIGINT) AS total_tokens,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS en,
        |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS dist
        |  FROM d GROUP BY source
        |), g AS (
        |  SELECT source, CASE WHEN length(t) < 8
        |    THEN [CAST('0x' || substr(md5(t), 1, 12) AS BIGINT)]
        |    ELSE list_transform(range(1, length(t) - 6),
        |      i -> CAST('0x' || substr(md5(substr(t, i, 8)), 1, 12)
        |           AS BIGINT)) END AS hs
        |  FROM d
        |), wnd AS (
        |  SELECT source, len(hs) AS ng,
        |    len(list_distinct(list_transform(
        |      range(1, greatest(len(hs) - 3, 1) + 1),
        |      j -> list_min(hs[j:j+3])))) AS nf
        |  FROM g
        |), wn AS (
        |  SELECT source, CAST(sum(ng) AS BIGINT) AS grams,
        |         CAST(sum(nf) AS BIGINT) AS fps
        |  FROM wnd GROUP BY source
        |)
        |SELECT base.source, n_docs, total_chars, total_tokens,
        |  round(CAST(total_tokens AS DOUBLE) / n_docs, 6)
        |    AS mean_doc_tokens,
        |  round(CAST(en AS DOUBLE) / n_docs, 6) AS pct_en,
        |  round(1.0 - CAST(dist AS DOUBLE) / n_docs, 6)
        |    AS exact_dup_frac,
        |  round(CAST(fps AS DOUBLE) / grams, 6) AS winnow_density
        |FROM base JOIN wn USING (source)
        |ORDER BY source""".stripMargin,

    // exact mirror of StreamDecontam.flag over the ranged stream
    // (t256): the stream's content is documents UNION the +100000
    // id-shifted copies (arrival-order-independent because the flag is
    // stateless); fingerprints are the t253 winnowing replay; the
    // reference union comes from the ORIGINAL eval docs (doc_id % 97)
    "t256_stream_decontam" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents
        |), d AS (
        |  SELECT doc_id, lower(text) AS t FROM alldocs
        |  WHERE text IS NOT NULL
        |), g AS (
        |  SELECT doc_id, CASE WHEN length(t) < 8
        |    THEN [CAST('0x' || substr(md5(t), 1, 12) AS BIGINT)]
        |    ELSE list_transform(range(1, length(t) - 6),
        |      i -> CAST('0x' || substr(md5(substr(t, i, 8)), 1, 12)
        |           AS BIGINT)) END AS hs
        |  FROM d
        |), wn AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |      range(1, greatest(len(hs) - 3, 1) + 1),
        |      j -> list_min(hs[j:j+3]))) AS fps
        |  FROM g
        |), refd AS (
        |  SELECT lower(text) AS t FROM documents
        |  WHERE text IS NOT NULL AND doc_id % 97 = 0
        |), refg AS (
        |  SELECT CASE WHEN length(t) < 8
        |    THEN [CAST('0x' || substr(md5(t), 1, 12) AS BIGINT)]
        |    ELSE list_transform(range(1, length(t) - 6),
        |      i -> CAST('0x' || substr(md5(substr(t, i, 8)), 1, 12)
        |           AS BIGINT)) END AS hs
        |  FROM refd
        |), ref AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(1, greatest(len(hs) - 3, 1) + 1),
        |    j -> list_min(hs[j:j+3])))) AS h
        |  FROM refg
        |), p AS (
        |  SELECT doc_id, unnest(fps) AS h FROM wn
        |), sh AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM p JOIN ref USING (h) GROUP BY doc_id
        |)
        |SELECT wn.doc_id, coalesce(sh.n_shared, 0) AS n_shared,
        |  coalesce(sh.n_shared, 0) >= 2 AS contaminated
        |FROM wn LEFT JOIN sh USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // exact mirror of ClusterEval.clusterQuality (t257): md5-ordered
    // seed centroids, micro-quantized components, exact-integer
    // squared distances (row_number over (d2, cid) = the engine's
    // first-min-position tie rule), per-point micro-rounded
    // silhouette/root-distance, one IEEE divide per output at 6dp
    "t257_cluster_quality" ->
      """WITH q AS (
        |  SELECT vec_id AS id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), cents AS (
        |  SELECT CAST(row_number() OVER
        |      (ORDER BY md5(CAST(id AS VARCHAR)), id) AS INT) - 1 AS cid, v
        |  FROM q
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) <= 8
        |), d AS (
        |  SELECT q.id, c.cid,
        |    list_sum(list_transform(range(1, len(q.v) + 1),
        |      i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS d2
        |  FROM q CROSS JOIN cents c
        |), ranked AS (
        |  SELECT id, cid, d2,
        |    row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
        |  FROM d
        |), pp AS (
        |  SELECT r1.id, r1.cid AS own, r1.d2 AS a, r2.d2 AS b
        |  FROM ranked r1 JOIN ranked r2 ON r1.id = r2.id AND r2.rn = 2
        |  WHERE r1.rn = 1
        |), pt AS (
        |  SELECT own, a,
        |    CASE WHEN greatest(a, b) > 0 THEN
        |      CAST(round(CAST(b - a AS DOUBLE)
        |        / CAST(greatest(a, b) AS DOUBLE) * 1000000.0) AS BIGINT)
        |    ELSE 0 END AS sil_micro,
        |    CAST(round(sqrt(CAST(a AS DOUBLE))) AS BIGINT) AS r_micro
        |  FROM pp
        |), agg AS (
        |  SELECT own AS cluster, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(a AS HUGEINT)) AS inertia_sum,
        |    sum(sil_micro) AS sil_sum, sum(r_micro) AS r_sum
        |  FROM pt GROUP BY own
        |), cd AS (
        |  SELECT c1.cid AS i, c2.cid AS j,
        |    sqrt(CAST(list_sum(list_transform(range(1, len(c1.v) + 1),
        |      t -> (c1.v[t] - c2.v[t]) * (c1.v[t] - c2.v[t])))
        |      AS DOUBLE)) AS dcc
        |  FROM cents c1 CROSS JOIN cents c2 WHERE c1.cid <> c2.cid
        |), db AS (
        |  SELECT a1.cluster,
        |    max((CAST(a1.r_sum AS DOUBLE) / a1.n
        |       + CAST(a2.r_sum AS DOUBLE) / a2.n) / cd.dcc) AS db_term
        |  FROM agg a1 JOIN cd ON cd.i = a1.cluster
        |  JOIN agg a2 ON a2.cluster = cd.j
        |  WHERE cd.dcc > 0
        |  GROUP BY a1.cluster
        |)
        |SELECT CAST(agg.cluster AS INT) AS cluster, n,
        |  round(CAST(inertia_sum AS DOUBLE) / 1e12, 6) AS inertia,
        |  round(CAST(sil_sum AS DOUBLE) / n / 1e6, 6) AS mean_silhouette,
        |  round(CAST(r_sum AS DOUBLE) / n / 1e6, 6) AS mean_dist,
        |  round(db.db_term, 6) AS db_worst
        |FROM agg LEFT JOIN db USING (cluster)
        |ORDER BY cluster""".stripMargin,

    // exact mirror of TextDedup.canonicalGroups over the t259 planted
    // variants: DuckDB nfc_normalize == the JDK normalizer (same
    // Unicode composition tables); grouping by the canonical STRING
    // equals the engine's grouping by its md5 (collision-free)
    "t259_canonical_dedup" ->
      ("""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |         text || ' Cafe' || chr(769) || '  U' || chr(776) || 'BER'
        |  FROM documents WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id + 300000, text || chr(9) || 'caf""" +
        "\u00e9 \u00fc" + """ber '
        |  FROM documents WHERE doc_id % 11 = 0
        |), canon AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(nfc_normalize(text)),
        |      '[ \t\n\x0B\f\r]+', ' ', 'g')) AS c
        |  FROM all_docs
        |)
        |SELECT min(doc_id) AS kept_id, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(min(length(c)) AS INT) AS canon_chars
        |FROM canon GROUP BY c HAVING count(*) > 1
        |ORDER BY kept_id""").stripMargin,

    // exact mirror of IngestQuality.gate over the streamed doubled
    // corpus (t260): the t30 quality replay + the t19 PII counters,
    // stateless per row so the batch replay is exact
    "t260_stream_quality" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents
        |), b AS (
        |  SELECT doc_id, text,
        |         string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS toks,
        |         length(text) AS n_chars,
        |         length(text) -
        |           length(regexp_replace(text, '[^\p{L}\p{N} \t\n\x0B\f\r]', '', 'g')) AS n_sym
        |  FROM alldocs
        |), m AS (
        |  SELECT doc_id, text,
        |         len(toks) AS n_tokens,
        |         CASE WHEN len(toks) = 0 THEN 0.0
        |              ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
        |                     AS DOUBLE) / len(toks) END AS mean_len,
        |         CASE WHEN n_chars = 0 THEN 0.0
        |              ELSE CAST(n_sym AS DOUBLE) / n_chars END AS sym_ratio,
        |         CASE WHEN len(toks) < 2 THEN 0.0
        |              ELSE 1.0 - CAST(len(list_distinct(
        |                     list_transform(range(len(toks) - 1),
        |                       i -> toks[i+1] || ' ' || toks[i+2]))) AS DOUBLE)
        |                   / (len(toks) - 1)
        |         END AS dup_frac
        |  FROM b
        |), p AS (
        |  SELECT doc_id, n_tokens, mean_len, sym_ratio, dup_frac,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |    len(regexp_extract_all(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |        '<EMAIL>', 'g'),
        |      '[0-9]{3,}')) AS n_num_runs
        |  FROM m
        |)
        |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |       round(mean_len, 6) AS mean_word_len,
        |       round(sym_ratio, 6) AS symbol_ratio,
        |       round(dup_frac, 6) AS dup_bigram_frac,
        |       (n_tokens BETWEEN 5 AND 10000)
        |         AND (mean_len BETWEEN 2.0 AND 12.0)
        |         AND sym_ratio <= 0.3 AND dup_frac <= 0.3 AS quality_ok,
        |       CAST(n_emails AS INT) AS n_emails,
        |       CAST(n_num_runs AS INT) AS n_num_runs,
        |       n_emails = 0 AND n_num_runs = 0 AS pii_free,
        |       (n_tokens BETWEEN 5 AND 10000)
        |         AND (mean_len BETWEEN 2.0 AND 12.0)
        |         AND sym_ratio <= 0.3 AND dup_frac <= 0.3
        |         AND n_emails = 0 AND n_num_runs = 0 AS keep
        |FROM p ORDER BY doc_id""".stripMargin,

    // exact mirror of Pca.embeddingCard (t261): same planted defects,
    // flags replayed, micro-norms on QUANTIZED components (exact
    // integer sum-of-squares, one IEEE sqrt+round per row),
    // quantile_cont interpolation on integers (the t141 convention)
    "t261_embedding_card" ->
      """WITH allv AS (
        |  SELECT vec_id, embedding, label FROM embeddings
        |  UNION ALL SELECT 100001, NULL, 99
        |  UNION ALL SELECT 100002,
        |    list_transform(range(64), i -> CAST(0.0 AS FLOAT)), 99
        |  UNION ALL SELECT 100003, [CAST(1.0 AS FLOAT),
        |    CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)], 99
        |  UNION ALL SELECT 100004,
        |    list_transform(range(64), i -> CAST(CASE WHEN i = 0
        |      THEN 'NaN'::DOUBLE ELSE 0.1 END AS FLOAT)), 99
        |  UNION ALL SELECT 100005,
        |    list_transform(range(64), i -> CAST(CASE WHEN i = 0
        |      THEN NULL ELSE 0.1 END AS FLOAT)), 99
        |), f AS (
        |  SELECT label,
        |    (embedding IS NULL) AS is_null,
        |    embedding IS NOT NULL AND len(embedding) <> 64 AS bad_dim,
        |    embedding IS NOT NULL AND len(embedding) = 64 AND
        |      len(list_filter(embedding, x -> x IS NULL
        |        OR isnan(CAST(x AS DOUBLE))
        |        OR isinf(CAST(x AS DOUBLE)))) > 0 AS nonfinite,
        |    embedding IS NOT NULL AND len(embedding) = 64 AND NOT (
        |      len(list_filter(embedding, x -> x IS NULL
        |        OR isnan(CAST(x AS DOUBLE))
        |        OR isinf(CAST(x AS DOUBLE)))) > 0) AS ok,
        |    embedding AS v
        |  FROM allv
        |), g AS (
        |  SELECT label, is_null, bad_dim, nonfinite, ok,
        |    ok AND len(list_filter(v,
        |      x -> CAST(x AS DOUBLE) <> 0.0)) = 0 AS is_zero,
        |    CASE WHEN ok THEN CAST(round(sqrt(CAST(list_sum(
        |      list_transform(v, x ->
        |        CAST(round(CAST(x AS DOUBLE)*1000000.0) AS BIGINT) *
        |        CAST(round(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)))
        |      AS DOUBLE))) AS BIGINT) END AS r_micro
        |  FROM f
        |)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null,
        |  CAST(sum(CASE WHEN bad_dim THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bad_dim,
        |  CAST(sum(CASE WHEN nonfinite THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nonfinite,
        |  CAST(sum(CASE WHEN is_zero THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero,
        |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        |  round(quantile_cont(r_micro, 0.1) / 1e6, 6) AS p10_norm,
        |  round(quantile_cont(r_micro, 0.5) / 1e6, 6) AS p50_norm,
        |  round(quantile_cont(r_micro, 0.9) / 1e6, 6) AS p90_norm,
        |  round(CAST(sum(r_micro) AS DOUBLE)
        |    / sum(CASE WHEN ok THEN 1 ELSE 0 END) / 1e6, 6) AS mean_norm
        |FROM g GROUP BY label ORDER BY label""".stripMargin,

    // exact mirror of CorpusStats.corpusDiff over the t262 planted v2
    // corpus: digests joined full-outer on id, per-source status counts
    "t262_corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, text, source FROM documents
        |), v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text,
        |    source
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 500000, text || ' brand new', source
        |  FROM documents WHERE doc_id % 13 = 0
        |), k1 AS (
        |  SELECT doc_id, source, md5(text) AS dig FROM v1
        |), k2 AS (
        |  SELECT doc_id, source, md5(text) AS dig FROM v2
        |), j AS (
        |  SELECT coalesce(k2.source, k1.source) AS source,
        |    CASE WHEN k1.dig IS NULL THEN 'added'
        |         WHEN k2.dig IS NULL THEN 'removed'
        |         WHEN k1.dig <> k2.dig THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM k1 FULL OUTER JOIN k2 ON k1.doc_id = k2.doc_id
        |)
        |SELECT source,
        |  sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_added,
        |  sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_removed,
        |  sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_changed,
        |  sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)::BIGINT
        |    AS n_unchanged
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "t102_theta_novelty" ->
      // first-seen replay: n_new(d) = users whose min(day) = d; theta
      // difference in exact mode computes exactly this
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        |  FROM events WHERE user_id IS NOT NULL
        |), per AS (
        |  SELECT day, count(DISTINCT user_id) AS n_day FROM d GROUP BY day
        |), fs AS (
        |  SELECT user_id, min(day) AS first_day FROM d GROUP BY user_id
        |), nw AS (
        |  SELECT first_day AS day, count(*) AS n_new FROM fs GROUP BY first_day
        |)
        |SELECT p.day, round(CAST(p.n_day AS DOUBLE), 6) AS n_day,
        |       round(CAST(coalesce(nw.n_new, 0) AS DOUBLE), 6) AS n_new
        |FROM per p LEFT JOIN nw USING (day)
        |ORDER BY day""".stripMargin,

    "t107_funnel" ->
      // first-touch funnel replay: the same strictly-after min chain
      """WITH s1 AS (
        |  SELECT user_id AS u, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
        |), c AS (
        |  SELECT 1 AS step, 'view' AS step_name,
        |         (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        |)
        |SELECT step, step_name, n_users,
        |       CASE WHEN step = 1 THEN 1.0
        |            WHEN lag(n_users) OVER (ORDER BY step) = 0 THEN 0.0
        |            ELSE round(CAST(n_users AS DOUBLE)
        |                       / lag(n_users) OVER (ORDER BY step), 6)
        |       END AS conversion
        |FROM c ORDER BY step""".stripMargin,

    "t108_retention" ->
      // cohort = ISO week of first event; Monday-aligned week deltas
      // are exact multiples of 7 on both engines
      """WITH f AS (
        |  SELECT user_id AS u,
        |         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT user_id AS u,
        |         CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events
        |), cells AS (
        |  SELECT cohort_week,
        |         CAST((week - cohort_week) / 7 AS INT) AS week_no,
        |         count(DISTINCT a.u) AS n_active
        |  FROM a JOIN f USING (u) GROUP BY 1, 2
        |), sz AS (
        |  SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1
        |)
        |SELECT cohort_week, week_no, n_active,
        |       round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        |FROM cells JOIN sz USING (cohort_week)
        |ORDER BY cohort_week, week_no""".stripMargin,

    "t105_dp_counts" ->
      // Laplace-mechanism replay: the same md5-digit uniform (8 hex
      // digits, strpos arithmetic — no hex-to-int builtin needed),
      // the same clamped inverse-CDF, the same 6dp round
      """WITH c AS (
        |  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
        |), h AS (
        |  SELECT lang, source, n,
        |         md5(concat_ws('|',
        |           CASE WHEN lang IS NULL THEN 'N'
        |                ELSE 'V' || to_base64(CAST(CAST(lang AS VARCHAR) AS BLOB)) END,
        |           CASE WHEN source IS NULL THEN 'N'
        |                ELSE 'V' || to_base64(CAST(CAST(source AS VARCHAR) AS BLOB)) END,
        |           'release-2026-08')) AS hx
        |  FROM c
        |), u AS (
        |  SELECT lang, source, n,
        |         least(greatest(
        |             (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) / power(16.0, 1)
        |           + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) / power(16.0, 2)
        |           + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) / power(16.0, 3)
        |           + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) / power(16.0, 4)
        |           + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) / power(16.0, 5)
        |           + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) / power(16.0, 6)
        |           + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) / power(16.0, 7)
        |           + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1) / power(16.0, 8),
        |           1e-9), 1.0 - 1e-9) AS uu
        |  FROM h
        |)
        |SELECT lang, source,
        |       round(n + (-1.0) * sign(uu - 0.5)
        |                 * ln(1.0 - 2.0 * abs(uu - 0.5)), 6) AS noisy_count,
        |       1.0 AS epsilon
        |FROM u ORDER BY lang, source""".stripMargin,

    "t98_filtered_ann" ->
      // t5's proven cosine formulation + the metadata predicate
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q.qid, e.vec_id AS id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec) AS c
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.label = 1 AND e.vec_id != q.qid
        |), ranked AS (
        |  SELECT qid, id, c,
        |         row_number() OVER (PARTITION BY qid ORDER BY c DESC, id) AS rank
        |  FROM scored
        |)
        |SELECT qid, rank, id, round(c, 6) AS cosine
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "t95_zorder_layout" ->
      // full replay of Layout.zorderAudit: linear 16-bit normalization,
      // the 4-step mask-ladder bit interleave, Z-prefix vs linear-x
      // bucketing, per-bucket fractional spans. Masks in decimal:
      // 0x00FF00FF/0x0F0F0F0F/0x33333333/0x55555555
      """WITH s AS (
        |  SELECT min(CAST(user_id AS DOUBLE)) AS x_min,
        |         max(CAST(user_id AS DOUBLE)) AS x_max,
        |         min(CAST(value AS DOUBLE)) AS y_min,
        |         max(CAST(value AS DOUBLE)) AS y_max
        |  FROM events
        |), n AS (
        |  SELECT CAST(user_id AS DOUBLE) AS x, CAST(value AS DOUBLE) AS y,
        |         x_min, x_max, y_min, y_max,
        |         CASE WHEN x_max <= x_min THEN 0 ELSE CAST(least(
        |           floor((CAST(user_id AS DOUBLE) - x_min) / (x_max - x_min)
        |                 * 65536.0), 65535.0) AS BIGINT) END AS x16,
        |         CASE WHEN y_max <= y_min THEN 0 ELSE CAST(least(
        |           floor((CAST(value AS DOUBLE) - y_min) / (y_max - y_min)
        |                 * 65536.0), 65535.0) AS BIGINT) END AS y16
        |  FROM events CROSS JOIN s
        |), sx AS (
        |  SELECT *, (x16 | (x16 << 8)) & 16711935 AS xa,
        |            (y16 | (y16 << 8)) & 16711935 AS ya
        |  FROM n
        |), sx2 AS (
        |  SELECT *, (xa | (xa << 4)) & 252645135 AS xb,
        |            (ya | (ya << 4)) & 252645135 AS yb
        |  FROM sx
        |), sx3 AS (
        |  SELECT *, (xb | (xb << 2)) & 858993459 AS xc,
        |            (yb | (yb << 2)) & 858993459 AS yc
        |  FROM sx2
        |), keyed AS (
        |  SELECT x, y, x_min, x_max, y_min, y_max,
        |         (((xc | (xc << 1)) & 1431655765)
        |          | (((yc | (yc << 1)) & 1431655765) << 1)) >> 28 AS zb,
        |         x16 >> 12 AS lb
        |  FROM sx3
        |), per AS (
        |  SELECT layout, bucket,
        |         min(x) AS bx_min, max(x) AS bx_max,
        |         min(y) AS by_min, max(y) AS by_max,
        |         any_value(x_min) AS x_min, any_value(x_max) AS x_max,
        |         any_value(y_min) AS y_min, any_value(y_max) AS y_max
        |  FROM (
        |    SELECT 'zorder' AS layout, zb AS bucket, * FROM keyed
        |    UNION ALL
        |    SELECT 'linear_x' AS layout, lb AS bucket, * FROM keyed
        |  ) GROUP BY layout, bucket
        |), agg AS (
        |  SELECT layout, count(*) AS n_buckets,
        |         round(avg(CASE WHEN x_max > x_min
        |           THEN (bx_max - bx_min) / (x_max - x_min) ELSE 0.0 END), 6)
        |           AS avg_x_frac,
        |         round(avg(CASE WHEN y_max > y_min
        |           THEN (by_max - by_min) / (y_max - y_min) ELSE 0.0 END), 6)
        |           AS avg_y_frac
        |  FROM per GROUP BY layout
        |)
        |SELECT layout, n_buckets, avg_x_frac, avg_y_frac,
        |       greatest(avg_x_frac, avg_y_frac) AS worst_dim_frac
        |FROM agg ORDER BY layout""".stripMargin,

    "t93_theta_overlap" ->
      // exact-mode theta set algebra IS exact (every source's distinct
      // vocabulary sits far under the 4096-entry sketch capacity at the
      // audit SF), so the sketch estimates replay as plain
      // COUNT(DISTINCT) + inclusion-exclusion; jaccard divides the same
      // two integers the engine's union estimate produces
      """WITH toks AS (
        |  SELECT source,
        |         unnest(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')) AS tok
        |  FROM documents
        |), p AS (
        |  SELECT DISTINCT source, tok FROM toks WHERE length(tok) > 0
        |), sizes AS (
        |  SELECT source, count(*) AS n FROM p GROUP BY source
        |), pairs AS (
        |  SELECT a.source AS g_a, b.source AS g_b, count(*) AS n_both
        |  FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT sa.source AS g_a, sb.source AS g_b,
        |       round(CAST(sa.n AS DOUBLE), 6) AS n_a,
        |       round(CAST(sb.n AS DOUBLE), 6) AS n_b,
        |       round(CAST(coalesce(pr.n_both, 0) AS DOUBLE), 6) AS n_both,
        |       round(CAST(coalesce(pr.n_both, 0) AS DOUBLE)
        |             / (sa.n + sb.n - coalesce(pr.n_both, 0)), 6) AS jaccard
        |FROM sizes sa JOIN sizes sb ON sa.source < sb.source
        |LEFT JOIN pairs pr ON pr.g_a = sa.source AND pr.g_b = sb.source
        |ORDER BY g_a, g_b""".stripMargin,

    // exact mirror of Chunking.contentChunks (t110): the window-Horner
    // anchor rule replayed per position with list_reduce (the t11
    // residue chain restricted to a 16-cp window), next-anchor via a
    // reverse cumulative window min, cut(s) = least(nextAnchor(s+24),
    // s+96, n) precomputed for EVERY s, and the sequential chunk walk
    // as a recursive CTE following that cut table from 0 (the t32
    // pattern). The s+24 grid lookup clamps to n: whenever it clamps,
    // both the clamped and the true formula yield cut = n.
    "t110_content_chunks" ->
      """WITH RECURSIVE cp AS (
        |  SELECT doc_id, string_split(text, '') AS chars,
        |         list_transform(string_split(text, ''),
        |                        c -> CAST(unicode(c) AS BIGINT)) AS cps
        |  FROM documents
        |), meta AS (
        |  SELECT doc_id, chars, cps, len(cps) AS n FROM cp
        |), anch AS (
        |  SELECT m.doc_id, p.p
        |  FROM meta m, unnest(generate_series(16, m.n)) AS p(p)
        |  WHERE m.n >= 16
        |    AND list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                                 m.cps[p.p-15 : p.p]),
        |          (h, c) -> (h * 257 + c) % 2147483647) % 32 = 0
        |), grid AS (
        |  SELECT m.doc_id, m.n, t.t
        |  FROM meta m, unnest(generate_series(0, m.n)) AS t(t)
        |), nexta AS (
        |  SELECT g.doc_id, g.n, g.t,
        |         min(a.p) OVER (PARTITION BY g.doc_id ORDER BY g.t DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS na
        |  FROM grid g
        |  LEFT JOIN anch a ON a.doc_id = g.doc_id AND a.p = g.t
        |), cuts AS (
        |  SELECT s.doc_id, s.t AS s,
        |         least(coalesce(nx.na, 9223372036854775807),
        |               s.t + 96, s.n) AS e
        |  FROM grid s
        |  JOIN nexta nx ON nx.doc_id = s.doc_id
        |                AND nx.t = least(s.t + 24, s.n)
        |  WHERE s.t < s.n
        |), walk AS (
        |  SELECT doc_id, 1 AS chunk_idx, CAST(0 AS BIGINT) AS s, e
        |  FROM cuts WHERE s = 0
        |  UNION ALL
        |  SELECT w.doc_id, w.chunk_idx + 1, w.e, c.e
        |  FROM walk w JOIN cuts c ON c.doc_id = w.doc_id AND c.s = w.e
        |)
        |SELECT w.doc_id, CAST(w.chunk_idx AS INT) AS chunk_idx,
        |       CAST(w.s + 1 AS INT) AS start,
        |       CAST(w.e - w.s AS INT) AS len,
        |       md5(array_to_string(m.chars[w.s + 1 : w.e], '')) AS chunk_md5
        |FROM walk w JOIN meta m ON m.doc_id = w.doc_id
        |ORDER BY w.doc_id, w.chunk_idx""".stripMargin,

    // exact mirror of t111: the same planted-shift construction, the
    // same chunk walk as t110 over the augmented corpus, then an
    // UNCAPPED distinct-chunk self-join + Jaccard — equal to the
    // engine's saturating-bucket path because no chunk's doc frequency
    // approaches maxDf=50 at verify scale (measured max 4 at sf0.01,
    // 21 at sf0.1); md5 stands in for the engine's 8-byte xxhash64
    // join key (both collision-free here)
    "t111_chunk_neardup" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, 'shifted preface marker ' || text
        |  FROM documents WHERE doc_id % 7 = 0 AND n_chars >= 200
        |), cp AS (
        |  SELECT doc_id, string_split(text, '') AS chars,
        |         list_transform(string_split(text, ''),
        |                        c -> CAST(unicode(c) AS BIGINT)) AS cps
        |  FROM base
        |), meta AS (
        |  SELECT doc_id, chars, cps, len(cps) AS n FROM cp
        |), anch AS (
        |  SELECT m.doc_id, p.p
        |  FROM meta m, unnest(generate_series(16, m.n)) AS p(p)
        |  WHERE m.n >= 16
        |    AND list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                                 m.cps[p.p-15 : p.p]),
        |          (h, c) -> (h * 257 + c) % 2147483647) % 32 = 0
        |), grid AS (
        |  SELECT m.doc_id, m.n, t.t
        |  FROM meta m, unnest(generate_series(0, m.n)) AS t(t)
        |), nexta AS (
        |  SELECT g.doc_id, g.n, g.t,
        |         min(a.p) OVER (PARTITION BY g.doc_id ORDER BY g.t DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS na
        |  FROM grid g
        |  LEFT JOIN anch a ON a.doc_id = g.doc_id AND a.p = g.t
        |), cuts AS (
        |  SELECT s.doc_id, s.t AS s,
        |         least(coalesce(nx.na, 9223372036854775807),
        |               s.t + 96, s.n) AS e
        |  FROM grid s
        |  JOIN nexta nx ON nx.doc_id = s.doc_id
        |                AND nx.t = least(s.t + 24, s.n)
        |  WHERE s.t < s.n
        |), walk AS (
        |  SELECT doc_id, 1 AS chunk_idx, CAST(0 AS BIGINT) AS s, e
        |  FROM cuts WHERE s = 0
        |  UNION ALL
        |  SELECT w.doc_id, w.chunk_idx + 1, w.e, c.e
        |  FROM walk w JOIN cuts c ON c.doc_id = w.doc_id AND c.s = w.e
        |), chunks AS (
        |  SELECT DISTINCT w.doc_id,
        |         md5(array_to_string(m.chars[w.s + 1 : w.e], '')) AS h
        |  FROM walk w JOIN meta m ON m.doc_id = w.doc_id
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM chunks GROUP BY doc_id
        |), shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM chunks a JOIN chunks b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT s.id_a, s.id_b, s.shared, na.n AS n_a, nb.n AS n_b,
        |       round(CAST(s.shared AS DOUBLE)
        |             / (na.n + nb.n - s.shared), 6) AS jaccard
        |FROM shared s
        |JOIN sizes na ON na.doc_id = s.id_a
        |JOIN sizes nb ON nb.doc_id = s.id_b
        |WHERE CAST(s.shared AS DOUBLE) / (na.n + nb.n - s.shared) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    // exact mirror of TextAnalysis.blocklistAudit (t112): per-term
    // greedy leftmost non-overlapping occurrence counts via replace
    // arithmetic — `replace` removes exactly the occurrences the
    // Aho-Corasick kernel's lastEnd rule accepts; nested terms
    // ("merge" inside "merge slow") count independently on both sides
    "t112_blocklist" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    (len(text) - len(replace(text, 'merge', ''))) // 5 AS h1,
        |    (len(text) - len(replace(text, 'merge slow', ''))) // 10 AS h2,
        |    (len(text) - len(replace(text, 'batch batch', ''))) // 11 AS h3,
        |    (len(text) - len(replace(text, 'customer filter', ''))) // 15 AS h4,
        |    (len(text) - len(replace(text, 'vector window', ''))) // 13 AS h5,
        |    (len(text) - len(replace(text, 'quantum', ''))) // 7 AS h6
        |  FROM documents
        |)
        |SELECT doc_id,
        |       CAST((h1 > 0)::INT + (h2 > 0)::INT + (h3 > 0)::INT
        |            + (h4 > 0)::INT + (h5 > 0)::INT + (h6 > 0)::INT
        |            AS INT) AS n_terms,
        |       CAST(h1 + h2 + h3 + h4 + h5 + h6 AS BIGINT) AS total_hits,
        |       (h1 + h2 + h3 + h4 + h5 + h6) > 0 AS blocked
        |FROM h
        |ORDER BY doc_id""".stripMargin,

    // exact mirror of Drift.ksStatistic (t113): duplicate values
    // collapse to per-(group, value) side counts, both ECDFs from one
    // cumulative window over distinct values (no ties -> ROWS frame ==
    // DuckDB's default RANGE frame), D = max |fa/na - fb/nb|, the
    // alpha=0.05 critical value 1.358*sqrt((na+nb)/(na*nb))
    "t113_ks_drift" ->
      """WITH t AS (
        |  SELECT event_type, value AS v,
        |         ((CAST(ts AS DATE) - DATE '1970-01-01') % 2 = 0) AS sa
        |  FROM events WHERE value IS NOT NULL
        |), counts AS (
        |  SELECT event_type, v,
        |         CAST(sum(CASE WHEN sa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM t GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, v,
        |         sum(ca) OVER (PARTITION BY event_type ORDER BY v) AS fa,
        |         sum(cb) OVER (PARTITION BY event_type ORDER BY v) AS fb
        |  FROM counts
        |), cum2 AS (
        |  SELECT *, max(fa) OVER (PARTITION BY event_type) AS na,
        |            max(fb) OVER (PARTITION BY event_type) AS nb
        |  FROM cum
        |)
        |SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |       CAST(max(nb) AS BIGINT) AS n_b,
        |       round(max(abs(CAST(fa AS DOUBLE)/na
        |                     - CAST(fb AS DOUBLE)/nb)), 6) AS ks_d,
        |       round(1.358 * sqrt(CAST(max(na) + max(nb) AS DOUBLE)
        |                          / (max(na) * max(nb))), 6) AS ks_crit,
        |       max(abs(CAST(fa AS DOUBLE)/na - CAST(fb AS DOUBLE)/nb))
        |         > 1.358 * sqrt(CAST(max(na) + max(nb) AS DOUBLE)
        |                        / (max(na) * max(nb))) AS drifted
        |FROM cum2
        |GROUP BY event_type
        |HAVING max(na) > 0 AND max(nb) > 0
        |ORDER BY event_type""".stripMargin,

    // exact mirror of Drift.psi (t114): bin = count of literal edges
    // <= v, shares clamped at 1e-6, psi = sum (pa-pb)*ln(pa/pb)
    "t114_psi_drift" ->
      """WITH t AS (
        |  SELECT event_type, value AS v,
        |         (ts < TIMESTAMP '2024-01-16 00:00:00') AS sa
        |  FROM events WHERE value IS NOT NULL
        |), b AS (
        |  SELECT event_type, sa,
        |         (v >= 25.0)::INT + (v >= 50.0)::INT + (v >= 75.0)::INT
        |         + (v >= 100.0)::INT + (v >= 150.0)::INT + (v >= 200.0)::INT
        |         + (v >= 300.0)::INT + (v >= 400.0)::INT AS bin
        |  FROM t
        |), counts AS (
        |  SELECT event_type, bin,
        |         CAST(sum(CASE WHEN sa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2
        |), sh AS (
        |  SELECT event_type, ca, cb,
        |         sum(ca) OVER (PARTITION BY event_type) AS na,
        |         sum(cb) OVER (PARTITION BY event_type) AS nb
        |  FROM counts
        |), cl AS (
        |  SELECT event_type, na, nb,
        |         greatest(CAST(ca AS DOUBLE)/na, 1e-6) AS pa,
        |         greatest(CAST(cb AS DOUBLE)/nb, 1e-6) AS pb
        |  FROM sh WHERE na > 0 AND nb > 0
        |)
        |SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |       CAST(max(nb) AS BIGINT) AS n_b,
        |       round(sum((pa - pb) * ln(pa / pb)), 6) AS psi,
        |       sum((pa - pb) * ln(pa / pb)) < 0.1 AS stable
        |FROM cl GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // exact mirror of Sampling.weightedSample (t116): the shared
    // md5-digit seeded uniform (the t105 convention), the
    // Efraimidis-Spirakis exponential key -ln(u)/w, row_number replay
    // of the salted two-level cap (provably the same selection)
    "t116_weighted_sample" ->
      """WITH u AS (
        |  SELECT source, doc_id, n_chars,
        |         least(greatest(
        |             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'es-2026'), 1, 1)) - 1) / power(16.0, 1)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'es-2026'), 2, 1)) - 1) / power(16.0, 2)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'es-2026'), 3, 1)) - 1) / power(16.0, 3)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'es-2026'), 4, 1)) - 1) / power(16.0, 4)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'es-2026'), 5, 1)) - 1) / power(16.0, 5)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'es-2026'), 6, 1)) - 1) / power(16.0, 6)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'es-2026'), 7, 1)) - 1) / power(16.0, 7)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'es-2026'), 8, 1)) - 1) / power(16.0, 8),
        |           1e-9), 1 - 1e-9) AS u
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0
        |), p AS (
        |  SELECT source, doc_id, n_chars, -ln(u) / n_chars AS e FROM u
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |                              ORDER BY e, doc_id) AS rn
        |  FROM p
        |)
        |SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
        |       round(e, 6) AS priority
        |FROM r WHERE rn <= 4
        |ORDER BY source, doc_id""".stripMargin,

    // exact mirror of Sampling.bottomKSample (t117): distinct
    // (event_type, user_id), the same seeded uniform, bottom-8 by
    // (u, user_id) — the ORDER BY/LIMIT replay of the TopKByScore
    // aggregate's keep-highest-negated-score-smallest-id contract
    "t117_bottomk_sample" ->
      """WITH d AS (
        |  SELECT DISTINCT event_type, user_id FROM events
        |), u AS (
        |  SELECT event_type, user_id,
        |         least(greatest(
        |             (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'bk-2026'), 1, 1)) - 1) / power(16.0, 1)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'bk-2026'), 2, 1)) - 1) / power(16.0, 2)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'bk-2026'), 3, 1)) - 1) / power(16.0, 3)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'bk-2026'), 4, 1)) - 1) / power(16.0, 4)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'bk-2026'), 5, 1)) - 1) / power(16.0, 5)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'bk-2026'), 6, 1)) - 1) / power(16.0, 6)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'bk-2026'), 7, 1)) - 1) / power(16.0, 7)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'bk-2026'), 8, 1)) - 1) / power(16.0, 8),
        |           1e-9), 1 - 1e-9) AS u
        |  FROM d
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |                              ORDER BY u, user_id) AS rn
        |  FROM u
        |)
        |SELECT event_type, user_id, round(u, 6) AS u
        |FROM r WHERE rn <= 8
        |ORDER BY event_type, user_id""".stripMargin,

    // exact mirror of t119: the t14 append-mode watermark rule (a day
    // finalizes iff day + 1 <= max(ts) - 1 day), DISTINCT users per
    // finalized day, the shared md5-digit uniform, bottom-4 by
    // (u, user_id) — the deterministic draw makes the STREAMING result
    // value-exact and fully SQL-replayable
    "t119_stream_sample" ->
      """WITH e AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts, user_id FROM events
        |), wm AS (
        |  SELECT max(ts) - INTERVAL 1 DAY AS w FROM e
        |), fin AS (
        |  SELECT DISTINCT date_trunc('day', ts) AS day, user_id
        |  FROM e
        |  WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        |), u AS (
        |  SELECT day, user_id,
        |         least(greatest(
        |             (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'sk-2026'), 1, 1)) - 1) / power(16.0, 1)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'sk-2026'), 2, 1)) - 1) / power(16.0, 2)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'sk-2026'), 3, 1)) - 1) / power(16.0, 3)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'sk-2026'), 4, 1)) - 1) / power(16.0, 4)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'sk-2026'), 5, 1)) - 1) / power(16.0, 5)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'sk-2026'), 6, 1)) - 1) / power(16.0, 6)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'sk-2026'), 7, 1)) - 1) / power(16.0, 7)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR) || '|' || 'sk-2026'), 8, 1)) - 1) / power(16.0, 8),
        |           1e-9), 1 - 1e-9) AS u
        |  FROM fin
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY day
        |                              ORDER BY u, user_id) AS rn
        |  FROM u
        |)
        |SELECT day, CAST(rn AS INT) AS rank, user_id, round(u, 6) AS u
        |FROM r WHERE rn <= 4
        |ORDER BY day, rank""".stripMargin,

    // exact mirror of Drift.madOutliers (t120): quantile_cont replays
    // Spark's interpolated exact percentile for median and MAD, then
    // the same robust-z / outlier-count arithmetic (MAD = 0 -> any
    // deviation is an outlier, z reported NULL)
    "t120_mad_outliers" ->
      """WITH v AS (
        |  SELECT event_type, value AS v FROM events WHERE value IS NOT NULL
        |), med AS (
        |  SELECT event_type, quantile_cont(v, 0.5) AS med FROM v GROUP BY 1
        |), ad AS (
        |  SELECT v.event_type, v.v, m.med, abs(v.v - m.med) AS ad
        |  FROM v JOIN med m ON v.event_type = m.event_type
        |), mad AS (
        |  SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM ad GROUP BY 1
        |), j AS (
        |  SELECT a.event_type, a.med, a.ad, md.mad,
        |         CASE WHEN md.mad > 0 THEN a.ad / md.mad END AS z,
        |         CASE WHEN md.mad > 0 THEN a.ad > 3.0 * md.mad
        |              ELSE a.ad > 0 END AS outlier
        |  FROM ad a JOIN mad md ON a.event_type = md.event_type
        |)
        |SELECT event_type, count(*) AS n, round(max(med), 6) AS med,
        |       round(max(mad), 6) AS mad,
        |       CAST(sum(CASE WHEN outlier THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers,
        |       round(max(z), 6) AS max_z
        |FROM j GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // exact mirror of Behavior.transitions (t121): per-user lag window
    // (ts, event_id tiebreak), consecutive-pair counts, conditional
    // probability against the per-prev row sum
    "t121_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events
        |), c AS (
        |  SELECT prev AS prev_type, event_type AS next_type,
        |         count(*) AS n
        |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
        |), t AS (
        |  SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1
        |)
        |SELECT c.prev_type, c.next_type, c.n,
        |       round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p
        |FROM c JOIN t USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,

    // exact mirror of Pca.dimStats (t122): 1-based list extraction
    // over a 0-based dim grid, the same population-std and zero-share
    // arithmetic, 6dp at the boundary
    "t122_dim_stats" ->
      """WITH x AS (
        |  SELECT d.d AS dim, CAST(embedding[d.d + 1] AS DOUBLE) AS x
        |  FROM embeddings,
        |       unnest(generate_series(0, len(embedding) - 1)) AS d(d)
        |  WHERE embedding IS NOT NULL
        |)
        |SELECT CAST(dim AS INT) AS dim, count(*) AS n,
        |       round(avg(x), 6) AS mean,
        |       round(sqrt(avg(x * x) - avg(x) * avg(x)), 6) AS std,
        |       round(min(x), 6) AS min,
        |       round(max(x), 6) AS max,
        |       round(sum(CASE WHEN x = 0.0 THEN 1.0 ELSE 0.0 END)
        |             / count(*), 6) AS frac_zero
        |FROM x GROUP BY dim
        |ORDER BY dim""".stripMargin,

    // exact mirror of Drift.rollingAnomalies over daily counts (t124):
    // trailing ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING window
    // excluding the scored day; integer inputs make every statistic
    // bit-identical across engines
    "t124_rolling_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), w AS (
        |  SELECT event_type, day, n,
        |         count(n) OVER tw AS cnt,
        |         avg(n) OVER tw AS m,
        |         avg(n * n) OVER tw AS s2
        |  FROM daily
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |), s AS (
        |  SELECT event_type, day, n, cnt, m,
        |         sqrt(greatest(s2 - m * m, 0.0)) AS sd
        |  FROM w
        |)
        |SELECT event_type, day, n,
        |       CASE WHEN cnt = 7 THEN round(m, 6) END AS mean_prev,
        |       CASE WHEN cnt = 7 THEN round(sd, 6) END AS std_prev,
        |       CASE WHEN cnt = 7 AND sd > 0
        |            THEN round((n - m) / sd, 6) END AS z,
        |       CASE WHEN cnt = 7
        |            THEN CASE WHEN sd > 0 THEN abs((n - m) / sd) > 3.0
        |                      ELSE n <> m END
        |            ELSE false END AS anomaly
        |FROM s
        |ORDER BY event_type, day""".stripMargin,

    // exact mirror of t125: per-source corpus report card — the t51
    // tokenizer, a global text-duplicate count join, the t112
    // replace-arithmetic blocklist flag, the same 6dp shares
    "t125_dataset_card" ->
      """WITH dup AS (
        |  SELECT text, count(*) AS copies FROM documents GROUP BY text
        |), e AS (
        |  SELECT d.source, d.lang, d.n_chars, dup.copies,
        |         len(list_filter(
        |           string_split_regex(lower(d.text), '[ \t\n\x0B\f\r]+'),
        |           x -> x <> '')) AS toks,
        |         ((len(d.text) - len(replace(d.text, 'merge slow', ''))) // 10
        |          + (len(d.text) - len(replace(d.text, 'batch batch', ''))) // 11
        |          + (len(d.text) - len(replace(d.text, 'customer filter', ''))) // 15
        |         ) > 0 AS blocked
        |  FROM documents d JOIN dup ON d.text = dup.text
        |)
        |SELECT source, count(*) AS n_docs,
        |       round(avg(n_chars), 6) AS avg_chars,
        |       CAST(sum(toks) AS BIGINT) AS total_tokens,
        |       count(DISTINCT lang) AS n_langs,
        |       round(sum(CASE WHEN copies > 1 THEN 1.0 ELSE 0.0 END)
        |             / count(*), 6) AS dup_share,
        |       round(sum(CASE WHEN blocked THEN 1.0 ELSE 0.0 END)
        |             / count(*), 6) AS blocked_share
        |FROM e GROUP BY source
        |ORDER BY source""".stripMargin,

    // exact mirror of Ols.groupedOls over daily counts (t127):
    // integer moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs,
    // so slope/intercept/r² are the same IEEE doubles on both engines;
    // intercept uses the UNROUNDED slope, as the engine does
    "t127_grouped_ols" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, CAST(ts AS DATE)
        |), m AS (
        |  SELECT event_type, count(*) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |         sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM daily GROUP BY 1
        |), d AS (
        |  SELECT event_type, n, sx, sy,
        |         CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
        |         CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
        |         CAST(n * syy - sy * sy AS DOUBLE) AS varyn
        |  FROM m WHERE n >= 2 AND n * sxx - sx * sx > 0
        |)
        |SELECT event_type, n,
        |       round(covn / varxn, 6) AS slope,
        |       round((CAST(sy AS DOUBLE) - (covn / varxn) * sx) / n, 6)
        |         AS intercept,
        |       round(CASE WHEN varyn > 0
        |                  THEN (covn * covn) / (varxn * varyn) END, 6) AS r2
        |FROM d
        |ORDER BY event_type""".stripMargin,

    // exact mirror of Ols.pairCorrelation (t128): day-keyed self-join
    // (a < b), the same integer moment reduction, corr from exact sums
    "t128_corr_matrix" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), p AS (
        |  SELECT a.event_type AS g_a, b.event_type AS g_b,
        |         a.n AS x, b.n AS y
        |  FROM daily a JOIN daily b
        |    ON a.day = b.day AND a.event_type < b.event_type
        |), m AS (
        |  SELECT g_a, g_b, count(*) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |         sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM p GROUP BY 1, 2
        |)
        |SELECT g_a, g_b, n,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE)
        |             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr
        |FROM m
        |WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |ORDER BY g_a, g_b""".stripMargin,

    // exact mirror of Sampling.negativePairs (t129): the per-pair
    // seeded uniform md5(anchor ‖ candidate ‖ salt), different-label
    // candidates only, bottom-4 by (u, cid) per anchor
    "t129_neg_sample" ->
      """WITH a AS (
        |  SELECT vec_id AS aid, label AS albl FROM embeddings
        |  WHERE vec_id < 20
        |), c AS (
        |  SELECT vec_id AS cid, label AS clbl FROM embeddings
        |), p AS (
        |  SELECT aid, cid,
        |         least(greatest(
        |             (strpos('0123456789abcdef', substr(md5(CAST(aid AS VARCHAR) || '|' || CAST(cid AS VARCHAR) || '|' || 'neg-2026'), 1, 1)) - 1) / power(16.0, 1)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(aid AS VARCHAR) || '|' || CAST(cid AS VARCHAR) || '|' || 'neg-2026'), 2, 1)) - 1) / power(16.0, 2)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(aid AS VARCHAR) || '|' || CAST(cid AS VARCHAR) || '|' || 'neg-2026'), 3, 1)) - 1) / power(16.0, 3)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(aid AS VARCHAR) || '|' || CAST(cid AS VARCHAR) || '|' || 'neg-2026'), 4, 1)) - 1) / power(16.0, 4)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(aid AS VARCHAR) || '|' || CAST(cid AS VARCHAR) || '|' || 'neg-2026'), 5, 1)) - 1) / power(16.0, 5)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(aid AS VARCHAR) || '|' || CAST(cid AS VARCHAR) || '|' || 'neg-2026'), 6, 1)) - 1) / power(16.0, 6)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(aid AS VARCHAR) || '|' || CAST(cid AS VARCHAR) || '|' || 'neg-2026'), 7, 1)) - 1) / power(16.0, 7)
        |           + (strpos('0123456789abcdef', substr(md5(CAST(aid AS VARCHAR) || '|' || CAST(cid AS VARCHAR) || '|' || 'neg-2026'), 8, 1)) - 1) / power(16.0, 8),
        |           1e-9), 1 - 1e-9) AS u
        |  FROM a JOIN c ON cid <> aid AND clbl IS DISTINCT FROM albl
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY aid
        |                              ORDER BY u, cid) AS rn
        |  FROM p
        |)
        |SELECT aid AS anchor_id, CAST(rn AS INT) AS rank, cid AS neg_id,
        |       round(u, 6) AS u
        |FROM r WHERE rn <= 4
        |ORDER BY anchor_id, rank""".stripMargin,

    // exact mirror of Similarity.hardNegatives (t130): the t5 cosine
    // replay plus the null-safe label-mismatch predicate
    "t130_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec,
        |         label AS qlbl
        |  FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q.qid, e.vec_id AS id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                q.qvec) AS c
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id != q.qid AND e.label IS DISTINCT FROM q.qlbl
        |), ranked AS (
        |  SELECT qid, id, c,
        |         row_number() OVER (PARTITION BY qid
        |                            ORDER BY c DESC, id) AS rank
        |  FROM scored
        |)
        |SELECT qid, rank, id, round(c, 6) AS cosine
        |FROM ranked WHERE rank <= 4
        |ORDER BY qid, rank""".stripMargin,

    // exact mirror of Graph.personalizedPageRank (t131): the t79 CTE
    // chain with teleport vector tele = 1/3 on the seed set, 0
    // elsewhere; init = tele; dangling mass re-enters THROUGH tele
    "t131_ppr" ->
      """WITH edges AS (
        |  SELECT source AS src,
        |         'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst,
        |         CAST(count(*) AS DOUBLE) AS w
        |  FROM documents GROUP BY 1, 2
        |), nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges
        |    UNION SELECT dst AS node FROM edges)
        |), t AS (
        |  SELECT node,
        |         CASE WHEN node IN ('src1', 'src5', 'src9')
        |              THEN 1.0 / 3 ELSE 0.0 END AS tele
        |  FROM nodes
        |), ne AS (
        |  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS f
        |  FROM edges
        |), dang AS (
        |  SELECT node FROM nodes
        |  WHERE node NOT IN (SELECT DISTINCT src FROM edges)
        |), r0 AS (
        |  SELECT node, tele AS pr FROM t
        |), d0 AS (
        |  SELECT coalesce(sum(pr), 0) AS dm FROM r0
        |  WHERE node IN (SELECT node FROM dang)
        |), r1 AS (
        |  SELECT t.node, t.tele,
        |         (1 - 0.85) * t.tele +
        |           0.85 * (coalesce(c.s, 0) + (SELECT dm FROM d0) * t.tele)
        |           AS pr
        |  FROM t
        |  LEFT JOIN (SELECT dst, sum(r0.pr * f) AS s FROM ne
        |             JOIN r0 ON ne.src = r0.node GROUP BY dst) c
        |    ON t.node = c.dst
        |), d1 AS (
        |  SELECT coalesce(sum(pr), 0) AS dm FROM r1
        |  WHERE node IN (SELECT node FROM dang)
        |), r2 AS (
        |  SELECT t.node, t.tele,
        |         (1 - 0.85) * t.tele +
        |           0.85 * (coalesce(c.s, 0) + (SELECT dm FROM d1) * t.tele)
        |           AS pr
        |  FROM t
        |  LEFT JOIN (SELECT dst, sum(r1.pr * f) AS s FROM ne
        |             JOIN r1 ON ne.src = r1.node GROUP BY dst) c
        |    ON t.node = c.dst
        |), d2 AS (
        |  SELECT coalesce(sum(pr), 0) AS dm FROM r2
        |  WHERE node IN (SELECT node FROM dang)
        |), r3 AS (
        |  SELECT t.node,
        |         (1 - 0.85) * t.tele +
        |           0.85 * (coalesce(c.s, 0) + (SELECT dm FROM d2) * t.tele)
        |           AS pr
        |  FROM t
        |  LEFT JOIN (SELECT dst, sum(r2.pr * f) AS s FROM ne
        |             JOIN r2 ON ne.src = r2.node GROUP BY dst) c
        |    ON t.node = c.dst
        |)
        |SELECT node, round(pr, 6) AS ppr FROM r3
        |ORDER BY node""".stripMargin,

    // exact mirror of t133: per-user double-lag window, path counts,
    // deterministic (count desc, path) top-15
    "t133_top_paths" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lag(event_type, 1) OVER w AS p1,
        |         lag(event_type, 2) OVER w AS p2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT p2 || '>' || p1 || '>' || event_type AS path,
        |       count(*) AS n
        |FROM s WHERE p2 IS NOT NULL
        |GROUP BY 1
        |ORDER BY n DESC, path
        |LIMIT 15""".stripMargin,

    // exact mirror of t134: the t14 watermark rule picks finalized
    // days, per-day bin counts vs a fixed first-15-day reference,
    // clamped shares on the COMPLETE 0..8 bin grid, the t114 PSI
    // arithmetic — integer counts make every double identical
    "t134_stream_psi" ->
      """WITH e AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE value IS NOT NULL
        |), wm AS (
        |  SELECT max(ts) - INTERVAL 1 DAY AS w FROM e
        |), fin AS (
        |  SELECT date_trunc('day', ts) AS day,
        |         (value >= 25.0)::INT + (value >= 50.0)::INT
        |         + (value >= 75.0)::INT + (value >= 100.0)::INT
        |         + (value >= 150.0)::INT + (value >= 200.0)::INT
        |         + (value >= 300.0)::INT + (value >= 400.0)::INT AS bin
        |  FROM e
        |  WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        |), counts AS (
        |  SELECT day, bin, count(*) AS n FROM fin GROUP BY 1, 2
        |), dtot AS (
        |  SELECT day, sum(n) AS tot FROM counts GROUP BY 1
        |), ref AS (
        |  SELECT (value >= 25.0)::INT + (value >= 50.0)::INT
        |         + (value >= 75.0)::INT + (value >= 100.0)::INT
        |         + (value >= 150.0)::INT + (value >= 200.0)::INT
        |         + (value >= 300.0)::INT + (value >= 400.0)::INT AS bin,
        |         count(*) AS rn
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1
        |), rtot AS (SELECT sum(rn) AS rt FROM ref),
        |grid AS (
        |  SELECT d.day, g.g AS bin
        |  FROM (SELECT DISTINCT day FROM counts) d,
        |       unnest(generate_series(0, 8)) AS g(g)
        |), sh AS (
        |  SELECT grid.day, dtot.tot,
        |         greatest(CAST(coalesce(c.n, 0) AS DOUBLE) / dtot.tot,
        |                  1e-6) AS pb,
        |         greatest(CAST(coalesce(r.rn, 0) AS DOUBLE)
        |                  / (SELECT rt FROM rtot), 1e-6) AS pa
        |  FROM grid
        |  JOIN dtot ON dtot.day = grid.day
        |  LEFT JOIN counts c ON c.day = grid.day AND c.bin = grid.bin
        |  LEFT JOIN ref r ON r.bin = grid.bin
        |)
        |SELECT day, CAST(max(tot) AS BIGINT) AS n_day,
        |       round(sum((pb - pa) * ln(pb / pa)), 6) AS psi,
        |       sum((pb - pa) * ln(pb / pa)) < 0.25 AS stable
        |FROM sh GROUP BY day
        |ORDER BY day""".stripMargin,

    // exact mirror of Mixing.waterFill over per-source token mass
    // (t135): sort-window prefix feasibility (monotone in sorted
    // order), common water level from exact longs, min/cap allocation
    "t135_water_fill" ->
      """WITH toks AS (
        |  SELECT source,
        |         CAST(len(list_filter(
        |           string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |           x -> x <> '')) AS BIGINT) AS t
        |  FROM documents
        |), avail AS (
        |  SELECT source, CAST(sum(t) AS BIGINT) AS available
        |  FROM toks GROUP BY source
        |), w AS (
        |  SELECT source, available,
        |         row_number() OVER (ORDER BY available, source) AS rn,
        |         sum(available) OVER (ORDER BY available, source
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS prefix,
        |         count(*) OVER () AS n
        |  FROM avail
        |), f AS (
        |  SELECT *, (prefix - available)
        |            + available * (n - rn + 1) <= 20000 AS funded
        |  FROM w
        |), s AS (
        |  SELECT coalesce(sum(CASE WHEN funded THEN available END), 0)
        |           AS fsum,
        |         coalesce(sum(CASE WHEN funded THEN 1 ELSE 0 END), 0)
        |           AS fcnt,
        |         max(n) AS nn
        |  FROM f
        |)
        |SELECT f.source, f.available,
        |       round(CASE WHEN f.funded THEN CAST(f.available AS DOUBLE)
        |                  ELSE CAST(20000 - s.fsum AS DOUBLE)
        |                       / (s.nn - s.fcnt) END, 6) AS allocation,
        |       NOT f.funded AS capped
        |FROM f CROSS JOIN s
        |ORDER BY f.source""".stripMargin,

    // exact mirror of CorpusStats.calibrateScores (t136): percent_rank
    // = (rank - 1) / (n - 1) with shared ranks on ties, identical in
    // both engines
    "t136_score_calibrate" ->
      """SELECT source, doc_id, n_chars,
        |       round(percent_rank() OVER (PARTITION BY source
        |                                  ORDER BY n_chars), 6) AS pct
        |FROM documents
        |WHERE n_chars IS NOT NULL
        |ORDER BY source, doc_id""".stripMargin,

    // exact mirror of Drift.ksStatisticBinned (t137): the t113 KS
    // chain with the value replaced by the t114 bin id (count of
    // literal edges <= v) — ECDFs at bin boundaries only. BIGINT
    // casts per the HUGEINT rule (window sum of BIGINT promotes).
    "t137_ks_binned" ->
      """WITH t AS (
        |  SELECT event_type, value AS v,
        |         ((CAST(ts AS DATE) - DATE '1970-01-01') % 2 = 0) AS sa
        |  FROM events WHERE value IS NOT NULL
        |), b AS (
        |  SELECT event_type, sa,
        |         (v >= 25.0)::INT + (v >= 50.0)::INT + (v >= 75.0)::INT
        |         + (v >= 100.0)::INT + (v >= 150.0)::INT + (v >= 200.0)::INT
        |         + (v >= 300.0)::INT + (v >= 400.0)::INT AS bin
        |  FROM t
        |), counts AS (
        |  SELECT event_type, bin,
        |         CAST(sum(CASE WHEN sa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, bin,
        |         sum(ca) OVER (PARTITION BY event_type ORDER BY bin) AS fa,
        |         sum(cb) OVER (PARTITION BY event_type ORDER BY bin) AS fb
        |  FROM counts
        |), cum2 AS (
        |  SELECT *, max(fa) OVER (PARTITION BY event_type) AS na,
        |            max(fb) OVER (PARTITION BY event_type) AS nb
        |  FROM cum
        |)
        |SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |       CAST(max(nb) AS BIGINT) AS n_b,
        |       round(max(abs(CAST(fa AS DOUBLE)/na
        |                     - CAST(fb AS DOUBLE)/nb)), 6) AS ks_d,
        |       round(1.358 * sqrt(CAST(max(na) + max(nb) AS DOUBLE)
        |                          / (max(na) * max(nb))), 6) AS ks_crit,
        |       max(abs(CAST(fa AS DOUBLE)/na - CAST(fb AS DOUBLE)/nb))
        |         > 1.358 * sqrt(CAST(max(na) + max(nb) AS DOUBLE)
        |                        / (max(na) * max(nb))) AS drifted
        |FROM cum2
        |GROUP BY event_type
        |HAVING max(na) > 0 AND max(nb) > 0
        |ORDER BY event_type""".stripMargin,

    // exact mirror of CorpusStats.calibratedKeep + audit (t138): the
    // t136 percent_rank calibration, keep = 6dp-rounded pct >= 0.7,
    // then the per-source audit aggregate. BIGINT cast on the kept
    // sum per the HUGEINT rule.
    "t138_calibrated_keep" ->
      """WITH c AS (
        |  SELECT source, n_chars,
        |         round(percent_rank() OVER (PARTITION BY source
        |                                    ORDER BY n_chars), 6) AS pct
        |  FROM documents
        |  WHERE n_chars IS NOT NULL
        |)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN pct >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_kept,
        |       round(CAST(sum(CASE WHEN pct >= 0.7 THEN 1 ELSE 0 END)
        |                  AS DOUBLE) / count(*), 6) AS keep_frac,
        |       min(CASE WHEN pct >= 0.7 THEN n_chars END) AS min_kept_score
        |FROM c
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // exact mirror of Drift.ksStatisticQuantileBinned (t139): the
    // t137 chain with edges = reference-side per-group deciles
    // (quantile_cont == Spark's exact percentile: both linear
    // interpolation at p*(n-1)); bin = fold over the edge list.
    "t139_ks_qbinned" ->
      """WITH t AS (
        |  SELECT event_type, value AS v,
        |         ((CAST(ts AS DATE) - DATE '1970-01-01') % 2 = 0) AS sa
        |  FROM events WHERE value IS NOT NULL
        |), e AS (
        |  SELECT event_type,
        |         quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
        |           AS edges
        |  FROM t WHERE sa GROUP BY event_type
        |), b AS (
        |  SELECT t.event_type,
        |         CAST(list_sum(list_transform(e.edges,
        |           x -> CASE WHEN t.v >= x THEN 1 ELSE 0 END)) AS INT)
        |           AS bin,
        |         t.sa
        |  FROM t JOIN e USING (event_type)
        |), counts AS (
        |  SELECT event_type, bin,
        |         CAST(sum(CASE WHEN sa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, bin,
        |         sum(ca) OVER (PARTITION BY event_type ORDER BY bin) AS fa,
        |         sum(cb) OVER (PARTITION BY event_type ORDER BY bin) AS fb
        |  FROM counts
        |), cum2 AS (
        |  SELECT *, max(fa) OVER (PARTITION BY event_type) AS na,
        |            max(fb) OVER (PARTITION BY event_type) AS nb
        |  FROM cum
        |)
        |SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |       CAST(max(nb) AS BIGINT) AS n_b,
        |       round(max(abs(CAST(fa AS DOUBLE)/na
        |                     - CAST(fb AS DOUBLE)/nb)), 6) AS ks_d,
        |       round(1.358 * sqrt(CAST(max(na) + max(nb) AS DOUBLE)
        |                          / (max(na) * max(nb))), 6) AS ks_crit,
        |       max(abs(CAST(fa AS DOUBLE)/na - CAST(fb AS DOUBLE)/nb))
        |         > 1.358 * sqrt(CAST(max(na) + max(nb) AS DOUBLE)
        |                        / (max(na) * max(nb))) AS drifted
        |FROM cum2
        |GROUP BY event_type
        |HAVING max(na) > 0 AND max(nb) > 0
        |ORDER BY event_type""".stripMargin,

    // exact mirror of Ids.rendezvousShards' reshard audit (t140):
    // shard = arg_max over s of md5('s:id') (hex-string comparison —
    // identical lexicographic order both engines), replayed at 16 and
    // 17 shards; movers' destination proven to be the new shard.
    "t140_rendezvous_shards" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |b AS (
        |  SELECT doc_id,
        |         CAST(arg_max(s, md5(s || ':' || doc_id)) AS INT)
        |           AS shard_before
        |  FROM ids CROSS JOIN range(0,16) r(s) GROUP BY doc_id
        |), a AS (
        |  SELECT doc_id,
        |         CAST(arg_max(s, md5(s || ':' || doc_id)) AS INT)
        |           AS shard_after
        |  FROM ids CROSS JOIN range(0,17) r(s) GROUP BY doc_id
        |)
        |SELECT b.shard_before, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN a.shard_after <> b.shard_before
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
        |       round(CAST(sum(CASE WHEN a.shard_after <> b.shard_before
        |                          THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS moved_frac,
        |       CAST(max(CASE WHEN a.shard_after <> b.shard_before
        |                     THEN a.shard_after END) AS INT) AS moved_to
        |FROM b JOIN a USING (doc_id)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // exact mirror of Bootstrap.meanCI (t141): the shared md5-digit
    // uniform keyed (doc_id, b), Poisson(1) multiplicity via the same
    // hard-coded CDF literals, replicate mean = exact-long ratio,
    // percentile CI via quantile_cont (== Spark's exact percentile).
    "t141_bootstrap_ci" ->
      """WITH rws AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS v
        |  FROM documents WHERE n_chars IS NOT NULL
        |), reps AS (SELECT b FROM range(0, 200) r(b)),
        |h AS (
        |  SELECT source, doc_id, v, b,
        |         md5(CAST(doc_id AS VARCHAR) || '|' ||
        |             CAST(b AS VARCHAR) || '|' || 'boot') AS hh
        |  FROM rws CROSS JOIN reps
        |), u AS (
        |  SELECT source, v, b,
        |         least(greatest(
        |             (strpos('0123456789abcdef', substr(hh, 1, 1)) - 1) / power(16.0, 1)
        |           + (strpos('0123456789abcdef', substr(hh, 2, 1)) - 1) / power(16.0, 2)
        |           + (strpos('0123456789abcdef', substr(hh, 3, 1)) - 1) / power(16.0, 3)
        |           + (strpos('0123456789abcdef', substr(hh, 4, 1)) - 1) / power(16.0, 4)
        |           + (strpos('0123456789abcdef', substr(hh, 5, 1)) - 1) / power(16.0, 5)
        |           + (strpos('0123456789abcdef', substr(hh, 6, 1)) - 1) / power(16.0, 6)
        |           + (strpos('0123456789abcdef', substr(hh, 7, 1)) - 1) / power(16.0, 7)
        |           + (strpos('0123456789abcdef', substr(hh, 8, 1)) - 1) / power(16.0, 8),
        |           1e-9), 1 - 1e-9) AS u
        |  FROM h
        |), w AS (
        |  SELECT source, v, b,
        |         (CASE WHEN u >= 0.36787944117144233 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.7357588823428847 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9196986029286058 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9810118431238463 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9963401531726563 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9994058151824183 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.999916758850712 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9999897508033253 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.999998874797402 THEN 1 ELSE 0 END) AS wt
        |  FROM u
        |), per AS (
        |  SELECT source, b,
        |         CAST(sum(wt * v) AS DOUBLE) / CAST(sum(wt) AS DOUBLE) AS m
        |  FROM w GROUP BY 1, 2 HAVING sum(wt) > 0
        |), ci AS (
        |  SELECT source, count(*) AS n_reps,
        |         quantile_cont(m, 0.025) AS lo, quantile_cont(m, 0.975) AS hi
        |  FROM per GROUP BY source
        |), pt AS (
        |  SELECT source, count(*) AS n_rows,
        |         CAST(sum(v) AS DOUBLE) / count(*) AS mean
        |  FROM rws GROUP BY source
        |)
        |SELECT pt.source, pt.n_rows, round(pt.mean, 6) AS mean,
        |       round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi,
        |       ci.n_reps
        |FROM pt JOIN ci USING (source)
        |ORDER BY pt.source""".stripMargin,

    // exact mirror of Drift.chiSquareDrift (t142): pooled-margin
    // expected counts, χ² over (category × side) cells, critical
    // value from the shared df≤30 literal table (Wilson–Hilferty
    // beyond). BIGINT casts per the HUGEINT rule.
    "t142_chi2_drift" ->
      """WITH t AS (
        |  SELECT source, lang AS c,
        |         (substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8') AS sa
        |  FROM documents WHERE lang IS NOT NULL
        |), counts AS (
        |  SELECT source, c,
        |         CAST(sum(CASE WHEN sa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM t GROUP BY 1, 2
        |), m AS (
        |  SELECT *, sum(ca) OVER (PARTITION BY source) AS na,
        |            sum(cb) OVER (PARTITION BY source) AS nb
        |  FROM counts
        |), terms AS (
        |  SELECT source, na, nb,
        |         CASE WHEN na > 0 AND nb > 0 THEN
        |           (CAST(ca AS DOUBLE) - (ca+cb) * CAST(na AS DOUBLE) / (na+nb))
        |           * (CAST(ca AS DOUBLE) - (ca+cb) * CAST(na AS DOUBLE) / (na+nb))
        |           / ((ca+cb) * CAST(na AS DOUBLE) / (na+nb))
        |         + (CAST(cb AS DOUBLE) - (ca+cb) * CAST(nb AS DOUBLE) / (na+nb))
        |           * (CAST(cb AS DOUBLE) - (ca+cb) * CAST(nb AS DOUBLE) / (na+nb))
        |           / ((ca+cb) * CAST(nb AS DOUBLE) / (na+nb))
        |         END AS term
        |  FROM m
        |), agg AS (
        |  SELECT source, CAST(max(na) AS BIGINT) AS n_a,
        |         CAST(max(nb) AS BIGINT) AS n_b,
        |         CAST(count(*) - 1 AS BIGINT) AS dof, sum(term) AS chi2
        |  FROM terms GROUP BY source
        |  HAVING max(na) > 0 AND max(nb) > 0 AND count(*) >= 2
        |), c AS (
        |  SELECT *, CASE WHEN dof <= 30 THEN
        |      [3.841458821, 5.991464547, 7.814727903, 9.487729037, 11.070497694,
        |       12.591587244, 14.067140449, 15.507313056, 16.918977605, 18.307038053,
        |       19.675137573, 21.026069817, 22.362032495, 23.684791305, 24.99579014,
        |       26.296227605, 27.587111638, 28.86929943, 30.143527206, 31.410432844,
        |       32.670573341, 33.924438471, 35.172461627, 36.415028502, 37.652484133,
        |       38.88513866, 40.113272069, 41.337138151, 42.556967804, 43.772971826][dof]
        |    ELSE dof * pow(1.0 - 2.0/(9.0*dof)
        |                   + 1.6448536269514722 * sqrt(2.0/(9.0*dof)), 3)
        |    END AS crit
        |  FROM agg
        |)
        |SELECT source, n_a, n_b, dof, round(chi2, 6) AS chi2,
        |       round(crit, 6) AS chi2_crit, chi2 > crit AS drifted
        |FROM c
        |ORDER BY source""".stripMargin,

    // exact mirror of CorpusStats.jsdDistinctiveness (t143): shared
    // tokenization, per-(source, token) counts joined to corpus token
    // counts, JSD with the absent-token mass in closed form
    // ((ln 2 / 2)·(1 − Q_cov)); each integrand and q round to BIGINT
    // micro units BEFORE the vocab-sized sum (the t167/t204 order-
    // independence contract); ln 2 as a shared literal.
    "t143_jsd_sources" ->
      """WITH posting AS (
        |  SELECT source AS g, t.tok AS token
        |  FROM documents,
        |       unnest(list_filter(
        |         string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |         x -> x <> '')) AS t(tok)
        |  WHERE text IS NOT NULL
        |), sc AS (
        |  SELECT g, token, CAST(count(*) AS BIGINT) AS cs
        |  FROM posting GROUP BY 1, 2
        |), tc AS (
        |  SELECT token, CAST(sum(cs) AS BIGINT) AS ct FROM sc GROUP BY token
        |), ns AS (
        |  SELECT g, CAST(sum(cs) AS BIGINT) AS ns FROM sc GROUP BY g
        |), ntot AS (
        |  SELECT CAST(sum(ct) AS BIGINT) AS n FROM tc
        |), terms AS (
        |  SELECT sc.g, ns.ns,
        |         CAST(round(
        |         ((CAST(sc.cs AS DOUBLE)/ns.ns * ln((CAST(sc.cs AS DOUBLE)/ns.ns) /
        |            ((CAST(sc.cs AS DOUBLE)/ns.ns + CAST(tc.ct AS DOUBLE)/ntot.n)/2))
        |        + CAST(tc.ct AS DOUBLE)/ntot.n * ln((CAST(tc.ct AS DOUBLE)/ntot.n) /
        |            ((CAST(sc.cs AS DOUBLE)/ns.ns + CAST(tc.ct AS DOUBLE)/ntot.n)/2))) / 2)
        |           * 1e6) AS BIGINT) AS tm,
        |         CAST(round(CAST(tc.ct AS DOUBLE)/ntot.n * 1e6) AS BIGINT) AS qm
        |  FROM sc JOIN tc USING (token) JOIN ns USING (g) CROSS JOIN ntot
        |)
        |SELECT g AS source, max(ns) AS n_tokens, count(*) AS n_vocab,
        |       round(CAST(sum(tm) AS DOUBLE)/1e6
        |             + 0.6931471805599453/2 * (1 - CAST(sum(qm) AS DOUBLE)/1e6), 6) AS jsd,
        |       round((CAST(sum(tm) AS DOUBLE)/1e6
        |             + 0.6931471805599453/2 * (1 - CAST(sum(qm) AS DOUBLE)/1e6))
        |             / 0.6931471805599453, 6) AS jsd_norm
        |FROM terms GROUP BY g
        |ORDER BY g""".stripMargin,

    // exact mirror of Bootstrap.diffCI (t144): the t141 seeded-Poisson
    // machinery with the md5-half side split, replicate statistic
    // mean_A − mean_B (both exact-long ratios), percentile CI,
    // significant = CI excludes 0.
    "t144_bootstrap_diff" ->
      """WITH rws AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS v,
        |         (substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8') AS sa
        |  FROM documents WHERE n_chars IS NOT NULL
        |), reps AS (SELECT b FROM range(0, 200) r(b)),
        |h AS (
        |  SELECT source, doc_id, v, sa, b,
        |         md5(CAST(doc_id AS VARCHAR) || '|' ||
        |             CAST(b AS VARCHAR) || '|' || 'ab') AS hh
        |  FROM rws CROSS JOIN reps
        |), u AS (
        |  SELECT source, v, sa, b,
        |         least(greatest(
        |             (strpos('0123456789abcdef', substr(hh, 1, 1)) - 1) / power(16.0, 1)
        |           + (strpos('0123456789abcdef', substr(hh, 2, 1)) - 1) / power(16.0, 2)
        |           + (strpos('0123456789abcdef', substr(hh, 3, 1)) - 1) / power(16.0, 3)
        |           + (strpos('0123456789abcdef', substr(hh, 4, 1)) - 1) / power(16.0, 4)
        |           + (strpos('0123456789abcdef', substr(hh, 5, 1)) - 1) / power(16.0, 5)
        |           + (strpos('0123456789abcdef', substr(hh, 6, 1)) - 1) / power(16.0, 6)
        |           + (strpos('0123456789abcdef', substr(hh, 7, 1)) - 1) / power(16.0, 7)
        |           + (strpos('0123456789abcdef', substr(hh, 8, 1)) - 1) / power(16.0, 8),
        |           1e-9), 1 - 1e-9) AS u
        |  FROM h
        |), w AS (
        |  SELECT source, v, sa, b,
        |         (CASE WHEN u >= 0.36787944117144233 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.7357588823428847 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9196986029286058 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9810118431238463 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9963401531726563 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9994058151824183 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.999916758850712 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9999897508033253 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.999998874797402 THEN 1 ELSE 0 END) AS wt
        |  FROM u
        |), per AS (
        |  SELECT source, b,
        |         CAST(sum(CASE WHEN sa THEN wt * v END) AS DOUBLE)
        |           / CAST(sum(CASE WHEN sa THEN wt END) AS DOUBLE)
        |       - CAST(sum(CASE WHEN NOT sa THEN wt * v END) AS DOUBLE)
        |           / CAST(sum(CASE WHEN NOT sa THEN wt END) AS DOUBLE) AS d
        |  FROM w GROUP BY 1, 2
        |  HAVING sum(CASE WHEN sa THEN wt END) > 0
        |     AND sum(CASE WHEN NOT sa THEN wt END) > 0
        |), ci AS (
        |  SELECT source, count(*) AS n_reps,
        |         quantile_cont(d, 0.025) AS lo, quantile_cont(d, 0.975) AS hi
        |  FROM per GROUP BY source
        |), pt AS (
        |  SELECT source,
        |         CAST(sum(CASE WHEN sa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN sa THEN v END) AS DOUBLE)
        |           / sum(CASE WHEN sa THEN 1 ELSE 0 END)
        |       - CAST(sum(CASE WHEN NOT sa THEN v END) AS DOUBLE)
        |           / sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS diff
        |  FROM rws GROUP BY source
        |  HAVING sum(CASE WHEN sa THEN 1 ELSE 0 END) > 0
        |     AND sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) > 0
        |)
        |SELECT pt.source, pt.n_a, pt.n_b, round(pt.diff, 6) AS diff,
        |       round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi,
        |       ci.n_reps, (ci.lo > 0 OR ci.hi < 0) AS significant
        |FROM pt JOIN ci USING (source)
        |ORDER BY pt.source""".stripMargin,

    // exact watermark-replay mirror of t145: merging the stream's
    // per-day partial sums is exact long addition, so the oracle is
    // simply the batch Poisson bootstrap over all events — same
    // seeded uniforms (event_id, b, 'sboot'), fixed-point cents.
    "t145_stream_bootstrap" ->
      """WITH e AS (
        |  SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE value IS NOT NULL
        |), wm AS (
        |  SELECT max(ts) - INTERVAL 1 DAY AS w FROM e
        |), rws AS (
        |  SELECT event_type, event_id,
        |         CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM e
        |  WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        |), reps AS (SELECT b FROM range(0, 100) r(b)),
        |h AS (
        |  SELECT event_type, v, b,
        |         md5(CAST(event_id AS VARCHAR) || '|' ||
        |             CAST(b AS VARCHAR) || '|' || 'sboot') AS hh
        |  FROM rws CROSS JOIN reps
        |), u AS (
        |  SELECT event_type, v, b,
        |         least(greatest(
        |             (strpos('0123456789abcdef', substr(hh, 1, 1)) - 1) / power(16.0, 1)
        |           + (strpos('0123456789abcdef', substr(hh, 2, 1)) - 1) / power(16.0, 2)
        |           + (strpos('0123456789abcdef', substr(hh, 3, 1)) - 1) / power(16.0, 3)
        |           + (strpos('0123456789abcdef', substr(hh, 4, 1)) - 1) / power(16.0, 4)
        |           + (strpos('0123456789abcdef', substr(hh, 5, 1)) - 1) / power(16.0, 5)
        |           + (strpos('0123456789abcdef', substr(hh, 6, 1)) - 1) / power(16.0, 6)
        |           + (strpos('0123456789abcdef', substr(hh, 7, 1)) - 1) / power(16.0, 7)
        |           + (strpos('0123456789abcdef', substr(hh, 8, 1)) - 1) / power(16.0, 8),
        |           1e-9), 1 - 1e-9) AS u
        |  FROM h
        |), w AS (
        |  SELECT event_type, v, b,
        |         (CASE WHEN u >= 0.36787944117144233 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.7357588823428847 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9196986029286058 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9810118431238463 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9963401531726563 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9994058151824183 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.999916758850712 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.9999897508033253 THEN 1 ELSE 0 END
        |        + CASE WHEN u >= 0.999998874797402 THEN 1 ELSE 0 END) AS wt
        |  FROM u
        |), per AS (
        |  SELECT event_type, b,
        |         CAST(sum(wt * v) AS DOUBLE) / CAST(sum(wt) AS DOUBLE) AS m
        |  FROM w GROUP BY 1, 2 HAVING sum(wt) > 0
        |), ci AS (
        |  SELECT event_type, count(*) AS n_reps,
        |         quantile_cont(m, 0.025) AS lo, quantile_cont(m, 0.975) AS hi
        |  FROM per GROUP BY event_type
        |), pt AS (
        |  SELECT event_type, count(*) AS n_rows,
        |         CAST(sum(v) AS DOUBLE) / count(*) AS mean_cents
        |  FROM rws GROUP BY event_type
        |)
        |SELECT pt.event_type, pt.n_rows, round(pt.mean_cents, 6) AS mean_cents,
        |       round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi,
        |       ci.n_reps
        |FROM pt JOIN ci USING (event_type)
        |ORDER BY pt.event_type""".stripMargin,

    // exact mirror of Ids.rendezvousShardsTwoLevel's reshard audit
    // (t147): group = arg_max md5('G'||j||':'||id) over 16 groups,
    // shard = arg_max md5('S'||s||':'||id) over the group's shards
    // (s mod 16 = group), replayed at 256 and 257 shards.
    "t147_two_level_shards" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |grp AS (
        |  SELECT doc_id,
        |         CAST(arg_max(j, md5('G' || j || ':' || doc_id)) AS INT) AS g
        |  FROM ids CROSS JOIN range(0,16) r(j) GROUP BY doc_id
        |), b AS (
        |  SELECT i.doc_id,
        |         CAST(arg_max(s, md5('S' || s || ':' || i.doc_id)) AS INT)
        |           AS shard_before
        |  FROM grp i CROSS JOIN range(0,256) r(s)
        |  WHERE s % 16 = i.g GROUP BY i.doc_id
        |), a AS (
        |  SELECT i.doc_id,
        |         CAST(arg_max(s, md5('S' || s || ':' || i.doc_id)) AS INT)
        |           AS shard_after
        |  FROM grp i CROSS JOIN range(0,257) r(s)
        |  WHERE s % 16 = i.g GROUP BY i.doc_id
        |), j AS (
        |  SELECT b.doc_id, shard_before, shard_after
        |  FROM b JOIN a USING (doc_id)
        |), loads AS (
        |  SELECT shard_after, count(*) AS c FROM j GROUP BY 1
        |)
        |SELECT count(*) AS n_docs,
        |       CAST(sum(CASE WHEN shard_after <> shard_before
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
        |       round(CAST(sum(CASE WHEN shard_after <> shard_before
        |                          THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS moved_frac,
        |       coalesce(bool_and(CASE WHEN shard_after <> shard_before
        |                              THEN shard_after = 256 END), TRUE)
        |         AS movers_to_new,
        |       (SELECT CAST(max(c) AS BIGINT) FROM loads) AS max_load,
        |       CAST(count(DISTINCT shard_after) AS BIGINT) AS n_shards_used
        |FROM j""".stripMargin,

    // exact mirror of Trend.mannKendall (t148) on daily event counts:
    // S from the bounded day-pair join, tie-corrected variance (exact
    // integer numerator / 18), continuity-corrected z, z0.975 literal.
    "t148_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), pairs AS (
        |  SELECT a.event_type,
        |         CAST(sum(sign(b.x - a.x)) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1
        |), n AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
        |  FROM daily GROUP BY 1
        |), ties AS (
        |  SELECT event_type,
        |         CAST(sum(tc*(tc-1)*(2*tc+5)) AS BIGINT) AS tiesum
        |  FROM (SELECT event_type, x, count(*) AS tc
        |        FROM daily GROUP BY 1, 2) GROUP BY 1
        |), j AS (
        |  SELECT n.event_type, n.n_points, pairs.s_stat,
        |         n.n_points*(n.n_points-1)*(2*n.n_points+5) - ties.tiesum
        |           AS var18
        |  FROM n JOIN pairs USING (event_type) JOIN ties USING (event_type)
        |  WHERE n.n_points >= 2
        |), z AS (
        |  SELECT *, CASE WHEN var18 > 0 THEN
        |      CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var18/18.0)
        |           WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var18/18.0)
        |           ELSE 0.0 END END AS zv
        |  FROM j
        |)
        |SELECT event_type, n_points, s_stat, round(var18/18.0, 6) AS var_s,
        |       round(zv, 6) AS z,
        |       coalesce(abs(zv) > 1.959963985, FALSE) AS trending
        |FROM z ORDER BY event_type""".stripMargin,

    // exact mirror of Trend.cusumChangePoint (t149): scaled deviation
    // n·S_k = n·cum_k − k·T stays an exact long; first-argmax pick.
    "t149_cusum_change" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, day, x,
        |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
        |         sum(x) OVER (PARTITION BY event_type ORDER BY day) AS ck,
        |         count(*) OVER (PARTITION BY event_type) AS n,
        |         sum(x) OVER (PARTITION BY event_type) AS tot
        |  FROM daily
        |), ns AS (
        |  SELECT *, n*ck - k*tot AS nsk FROM cum WHERE n >= 2
        |), pick AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |                               ORDER BY abs(nsk) DESC, day ASC) AS rn
        |  FROM ns
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n_points,
        |       day AS change_point,
        |       round(CAST(abs(nsk) AS DOUBLE) / n, 6) AS cusum_max,
        |       round(CAST(ck AS DOUBLE) / k, 6) AS mean_before,
        |       CASE WHEN n > k
        |            THEN round(CAST(tot - ck AS DOUBLE) / (n - k), 6)
        |       END AS mean_after,
        |       CASE WHEN n > k
        |            THEN round(CAST(tot - ck AS DOUBLE) / (n - k)
        |                       - CAST(ck AS DOUBLE) / k, 6)
        |       END AS shift
        |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // exact mirror of Agreement.cohensKappa (t150): confusion-cell
    // counts, marginal-product p_e accumulated as the EXACT integer
    // Σ ra·cb (HUGEINT here, DECIMAL(38,0) in Spark — order-
    // independent) with one double divide by n², chance-corrected
    // kappa; labels = the two length heuristics stringified
    // ('true'/'false' in both engines).
    "t150_cohens_kappa" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(n_chars > 300 AS VARCHAR) AS a,
        |         CAST(len(list_filter(
        |           string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |           x -> x <> '')) > 45 AS VARCHAR) AS b
        |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
        |), cells AS (
        |  SELECT source, a, b, CAST(count(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2, 3
        |), n AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_rows
        |  FROM cells GROUP BY source
        |), ra AS (
        |  SELECT source, a AS k, CAST(sum(c) AS BIGINT) AS ra
        |  FROM cells GROUP BY 1, 2
        |), cb AS (
        |  SELECT source, b AS k, CAST(sum(c) AS BIGINT) AS cb
        |  FROM cells GROUP BY 1, 2
        |), labels AS (
        |  SELECT coalesce(ra.source, cb.source) AS source,
        |         coalesce(ra.k, cb.k) AS k,
        |         coalesce(ra.ra, 0) AS ra, coalesce(cb.cb, 0) AS cb
        |  FROM ra FULL OUTER JOIN cb
        |    ON ra.source = cb.source AND ra.k = cb.k
        |), pe AS (
        |  SELECT l.source,
        |         CAST(sum(CAST(l.ra AS HUGEINT) * l.cb) AS DOUBLE)
        |           / (CAST(any_value(n.n_rows) AS DOUBLE)
        |              * any_value(n.n_rows)) AS pe
        |  FROM labels l JOIN n USING (source) GROUP BY l.source
        |), po AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS agree
        |  FROM cells WHERE a = b GROUP BY source
        |)
        |SELECT n.source, n.n_rows,
        |       round(CAST(coalesce(po.agree, 0) AS DOUBLE) / n.n_rows, 6)
        |         AS po,
        |       round(pe.pe, 6) AS pe,
        |       round(CASE WHEN pe.pe < 1.0 THEN
        |         (CAST(coalesce(po.agree, 0) AS DOUBLE) / n.n_rows - pe.pe)
        |         / (1.0 - pe.pe) END, 6) AS kappa,
        |       coalesce(CASE WHEN pe.pe < 1.0 THEN
        |         (CAST(coalesce(po.agree, 0) AS DOUBLE) / n.n_rows - pe.pe)
        |         / (1.0 - pe.pe) >= 0.6 END, FALSE) AS reliable
        |FROM n JOIN pe USING (source) LEFT JOIN po USING (source)
        |ORDER BY n.source""".stripMargin,

    // exact mirror of CorpusStats.quantileNormalize (t151): the t136
    // percent_rank calibration + a shared 101-point global
    // quantile_cont grid, linear interpolation with identical
    // arithmetic (a*(1-frac) + b*frac on the 6dp-rounded pct).
    "t151_quantile_normalize" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |         round(percent_rank() OVER (PARTITION BY source
        |                                    ORDER BY n_chars), 6) AS pct
        |  FROM documents WHERE n_chars IS NOT NULL
        |), grid AS (
        |  SELECT quantile_cont(n_chars,
        |           list_transform(range(0, 101), g -> g/100.0)) AS q
        |  FROM documents WHERE n_chars IS NOT NULL
        |)
        |SELECT source, doc_id, n_chars, pct,
        |       round(q[CAST(floor(pct*100) AS INT) + 1]
        |             * (1 - (pct*100 - floor(pct*100)))
        |           + q[least(CAST(floor(pct*100) AS INT) + 2, 101)]
        |             * (pct*100 - floor(pct*100)), 6) AS normalized
        |FROM c CROSS JOIN grid
        |ORDER BY source, doc_id""".stripMargin,

    // exact watermark-replay mirror of t153: daily counts restricted
    // to finalized windows (end <= max ts - 1 day), then the t149
    // CUSUM chain.
    "t153_stream_cusum" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), wm AS (
        |  SELECT max(ts) - INTERVAL 1 DAY AS w FROM e
        |), daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM e
        |  WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        |  GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, day, x,
        |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
        |         sum(x) OVER (PARTITION BY event_type ORDER BY day) AS ck,
        |         count(*) OVER (PARTITION BY event_type) AS n,
        |         sum(x) OVER (PARTITION BY event_type) AS tot
        |  FROM daily
        |), ns AS (
        |  SELECT *, n*ck - k*tot AS nsk FROM cum WHERE n >= 2
        |), pick AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |                               ORDER BY abs(nsk) DESC, day ASC) AS rn
        |  FROM ns
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n_points,
        |       day AS change_point,
        |       round(CAST(abs(nsk) AS DOUBLE) / n, 6) AS cusum_max,
        |       round(CAST(ck AS DOUBLE) / k, 6) AS mean_before,
        |       CASE WHEN n > k
        |            THEN round(CAST(tot - ck AS DOUBLE) / (n - k), 6)
        |       END AS mean_after,
        |       CASE WHEN n > k
        |            THEN round(CAST(tot - ck AS DOUBLE) / (n - k)
        |                       - CAST(ck AS DOUBLE) / k, 6)
        |       END AS shift
        |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // exact mirror of t154: the t113 KS, t114 PSI, and t142-style chi2
    // mirrors over the same even-day split, joined per event type.
    "t154_drift_panel" ->
      """WITH t AS (
        |  SELECT event_type, value AS v,
        |         ((CAST(ts AS DATE) - DATE '1970-01-01') % 2 = 0) AS sa
        |  FROM events WHERE value IS NOT NULL
        |), kcounts AS (
        |  SELECT event_type, v,
        |         CAST(sum(CASE WHEN sa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM t GROUP BY 1, 2
        |), kcum AS (
        |  SELECT event_type, v,
        |         sum(ca) OVER (PARTITION BY event_type ORDER BY v) AS fa,
        |         sum(cb) OVER (PARTITION BY event_type ORDER BY v) AS fb
        |  FROM kcounts
        |), kcum2 AS (
        |  SELECT *, max(fa) OVER (PARTITION BY event_type) AS na,
        |            max(fb) OVER (PARTITION BY event_type) AS nb
        |  FROM kcum
        |), ks AS (
        |  SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |         CAST(max(nb) AS BIGINT) AS n_b,
        |         round(max(abs(CAST(fa AS DOUBLE)/na
        |                       - CAST(fb AS DOUBLE)/nb)), 6) AS ks_d,
        |         max(abs(CAST(fa AS DOUBLE)/na - CAST(fb AS DOUBLE)/nb))
        |           > 1.358 * sqrt(CAST(max(na) + max(nb) AS DOUBLE)
        |                          / (max(na) * max(nb))) AS ks_drifted
        |  FROM kcum2
        |  GROUP BY event_type
        |  HAVING max(na) > 0 AND max(nb) > 0
        |), pb AS (
        |  SELECT event_type, sa,
        |         (v >= 25.0)::INT + (v >= 50.0)::INT + (v >= 75.0)::INT
        |         + (v >= 100.0)::INT + (v >= 150.0)::INT + (v >= 200.0)::INT
        |         + (v >= 300.0)::INT + (v >= 400.0)::INT AS bin
        |  FROM t
        |), pcounts AS (
        |  SELECT event_type, bin,
        |         CAST(sum(CASE WHEN sa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM pb GROUP BY 1, 2
        |), psh AS (
        |  SELECT *, sum(ca) OVER (PARTITION BY event_type) AS na,
        |            sum(cb) OVER (PARTITION BY event_type) AS nb
        |  FROM pcounts
        |), pcl AS (
        |  SELECT event_type,
        |         greatest(CAST(ca AS DOUBLE)/na, 1e-6) AS pa,
        |         greatest(CAST(cb AS DOUBLE)/nb, 1e-6) AS pbn
        |  FROM psh WHERE na > 0 AND nb > 0
        |), psi AS (
        |  SELECT event_type,
        |         round(sum((pa - pbn) * ln(pa / pbn)), 6) AS psi,
        |         NOT (sum((pa - pbn) * ln(pa / pbn)) < 0.1) AS psi_drifted
        |  FROM pcl GROUP BY event_type
        |), cb2 AS (
        |  SELECT event_type, sa,
        |         CAST(least(floor(v/100), 4) AS INT) AS c
        |  FROM t
        |), ccells AS (
        |  SELECT event_type, c,
        |         CAST(sum(CASE WHEN sa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM cb2 GROUP BY 1, 2
        |), cm AS (
        |  SELECT *, sum(ca) OVER (PARTITION BY event_type) AS na,
        |            sum(cb) OVER (PARTITION BY event_type) AS nb
        |  FROM ccells
        |), cterms AS (
        |  SELECT event_type, na, nb,
        |         CASE WHEN na > 0 AND nb > 0 THEN
        |           (CAST(ca AS DOUBLE) - (ca+cb) * CAST(na AS DOUBLE) / (na+nb))
        |           * (CAST(ca AS DOUBLE) - (ca+cb) * CAST(na AS DOUBLE) / (na+nb))
        |           / ((ca+cb) * CAST(na AS DOUBLE) / (na+nb))
        |         + (CAST(cb AS DOUBLE) - (ca+cb) * CAST(nb AS DOUBLE) / (na+nb))
        |           * (CAST(cb AS DOUBLE) - (ca+cb) * CAST(nb AS DOUBLE) / (na+nb))
        |           / ((ca+cb) * CAST(nb AS DOUBLE) / (na+nb))
        |         END AS term
        |  FROM cm
        |), cagg AS (
        |  SELECT event_type,
        |         CAST(count(*) - 1 AS BIGINT) AS dof, sum(term) AS chi2
        |  FROM cterms GROUP BY event_type
        |  HAVING max(na) > 0 AND max(nb) > 0 AND count(*) >= 2
        |), chi AS (
        |  SELECT event_type, round(chi2, 6) AS chi2,
        |         chi2 > (CASE WHEN dof <= 30 THEN
        |      [3.841458821, 5.991464547, 7.814727903, 9.487729037, 11.070497694,
        |       12.591587244, 14.067140449, 15.507313056, 16.918977605, 18.307038053,
        |       19.675137573, 21.026069817, 22.362032495, 23.684791305, 24.99579014,
        |       26.296227605, 27.587111638, 28.86929943, 30.143527206, 31.410432844,
        |       32.670573341, 33.924438471, 35.172461627, 36.415028502, 37.652484133,
        |       38.88513866, 40.113272069, 41.337138151, 42.556967804, 43.772971826][dof]
        |    ELSE dof * pow(1.0 - 2.0/(9.0*dof)
        |                   + 1.6448536269514722 * sqrt(2.0/(9.0*dof)), 3)
        |    END) AS chi2_drifted
        |  FROM cagg
        |)
        |SELECT ks.event_type, ks.n_a, ks.n_b, ks.ks_d, ks.ks_drifted,
        |       psi.psi, psi.psi_drifted, chi.chi2, chi.chi2_drifted,
        |       (ks.ks_drifted OR psi.psi_drifted OR chi.chi2_drifted)
        |         AS any_drifted
        |FROM ks JOIN psi USING (event_type) JOIN chi USING (event_type)
        |ORDER BY ks.event_type""".stripMargin,

    // exact mirror of t155: the t113 KS chain, the 3-term Kolmogorov
    // tail p-value on the 6dp-rounded D (lam2 built as (d*d)*ne and
    // scaled by one literal per term — same association as the engine),
    // then BH step-up at alpha = 0.05 with event_type tie-break.
    "t155_fdr_alarms" ->
      """WITH t AS (
        |  SELECT event_type, value AS v,
        |         ((CAST(ts AS DATE) - DATE '1970-01-01') % 2 = 0) AS sa
        |  FROM events WHERE value IS NOT NULL
        |), kcounts AS (
        |  SELECT event_type, v,
        |         sum(CASE WHEN sa THEN 1 ELSE 0 END) AS ca,
        |         sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS cb
        |  FROM t GROUP BY 1, 2
        |), kcum AS (
        |  SELECT event_type, v,
        |         sum(ca) OVER (PARTITION BY event_type ORDER BY v) AS fa,
        |         sum(cb) OVER (PARTITION BY event_type ORDER BY v) AS fb
        |  FROM kcounts
        |), kc2 AS (
        |  SELECT *, max(fa) OVER (PARTITION BY event_type) AS na,
        |            max(fb) OVER (PARTITION BY event_type) AS nb
        |  FROM kcum
        |), ks AS (
        |  SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |         CAST(max(nb) AS BIGINT) AS n_b,
        |         round(max(abs(CAST(fa AS DOUBLE)/na
        |                       - CAST(fb AS DOUBLE)/nb)), 6) AS ks_d
        |  FROM kc2 GROUP BY 1 HAVING max(na) > 0 AND max(nb) > 0
        |), lam AS (
        |  SELECT *, ks_d * ks_d * (CAST(n_a AS DOUBLE) * n_b / (n_a + n_b))
        |              AS lam2
        |  FROM ks
        |), pv AS (
        |  SELECT event_type, n_a, n_b, ks_d,
        |         round(least(1.0, greatest(0.0,
        |           2.0 * (exp(-2.0 * lam2) - exp(-8.0 * lam2)
        |                  + exp(-18.0 * lam2)))), 6) AS p_value
        |  FROM lam
        |), ranked AS (
        |  SELECT *,
        |         CAST(row_number() OVER (ORDER BY p_value, event_type)
        |              AS BIGINT) AS p_rank,
        |         CAST(count(*) OVER () AS BIGINT) AS m_tests
        |  FROM pv
        |), km AS (
        |  SELECT coalesce(max(p_rank), 0) AS k FROM ranked
        |  WHERE p_value <= 0.05 * p_rank / m_tests
        |)
        |SELECT event_type, n_a, n_b, ks_d, p_value, p_rank, m_tests,
        |       round(0.05 * p_rank / m_tests, 6) AS bh_cutoff,
        |       p_rank <= (SELECT k FROM km) AS fdr_drifted,
        |       p_value <= 0.05 AS raw_drifted
        |FROM ranked ORDER BY event_type""".stripMargin,

    // exact mirror of t156: snapshot B = A minus doc_id%97 with
    // doc_id%101 texts edited; 48-bit md5-digit row digests, per-shard
    // (count, xor, sum-mod-1000003) fingerprints, full-outer verdict.
    "t156_snapshot_fingerprint" -> s"""
        |WITH a AS (
        |  SELECT doc_id, coalesce(lang, '') AS lang,
        |         coalesce(source, '') AS source,
        |         coalesce(text, '') AS text
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, lang, source,
        |         CASE WHEN doc_id % 101 = 0 THEN text || ' [edited]'
        |              ELSE text END AS text
        |  FROM a WHERE doc_id % 97 <> 0
        |), ha AS (
        |  SELECT doc_id % 64 AS shard, CAST($HexTerms12 AS BIGINT) AS h
        |  FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '|' || lang
        |               || '|' || source || '|' || text) AS d FROM a)
        |), hb AS (
        |  SELECT doc_id % 64 AS shard, CAST($HexTerms12 AS BIGINT) AS h
        |  FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '|' || lang
        |               || '|' || source || '|' || text) AS d FROM b)
        |), fa AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS na, bit_xor(h) AS xa,
        |         CAST(sum(h % 1000003) AS BIGINT) AS sa
        |  FROM ha GROUP BY 1
        |), fb AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS nb, bit_xor(h) AS xb,
        |         CAST(sum(h % 1000003) AS BIGINT) AS sb
        |  FROM hb GROUP BY 1
        |)
        |SELECT coalesce(fa.shard, fb.shard) AS shard,
        |       coalesce(na, 0) AS n_a, coalesce(nb, 0) AS n_b,
        |       (na IS NOT NULL AND nb IS NOT NULL AND na = nb
        |        AND xa = xb AND sa = sb) AS shard_equal
        |FROM fa FULL OUTER JOIN fb ON fa.shard = fb.shard
        |ORDER BY shard""".stripMargin,

    // exact mirror of t157: the t4 shingle contract (lowercase
    // whitespace tokens, whole-text fallback below n), 48-bit
    // md5-digit gram digests, two-stage distinct/total counts.
    "t157_diversity" -> s"""
        |WITH toks AS (
        |  SELECT source,
        |         string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), grams AS (
        |  SELECT source, n,
        |         CASE WHEN len(t) < n THEN [array_to_string(t, ' ')]
        |              ELSE list_transform(range(len(t) - n + 1),
        |                     i -> array_to_string(t[i+1:i+n], ' ')) END AS gs
        |  FROM toks CROSS JOIN (SELECT unnest([1, 2, 3]) AS n)
        |), ex AS (
        |  SELECT source, n, unnest(gs) AS gram FROM grams
        |), h AS (
        |  SELECT source, n, CAST($HexTerms12 AS BIGINT) AS hv
        |  FROM (SELECT source, n, md5(gram) AS d FROM ex)
        |)
        |SELECT source, CAST(n AS INT) AS n,
        |       CAST(count(*) AS BIGINT) AS total_grams,
        |       CAST(count(DISTINCT hv) AS BIGINT) AS distinct_grams,
        |       round(CAST(count(DISTINCT hv) AS DOUBLE) / count(*), 6) AS ttr
        |FROM h GROUP BY source, n ORDER BY source, n""".stripMargin,

    // exact mirror of t159: the t113 cumulative-count chain plus
    // lead(v), W1 = sum |Fa-Fb| * gap over consecutive distinct values.
    "t159_wasserstein" ->
      """WITH t AS (
        |  SELECT event_type, value AS v,
        |         ((CAST(ts AS DATE) - DATE '1970-01-01') % 2 = 0) AS sa
        |  FROM events WHERE value IS NOT NULL
        |), c AS (
        |  SELECT event_type, v,
        |         sum(CASE WHEN sa THEN 1 ELSE 0 END) AS ca,
        |         sum(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS cb
        |  FROM t GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, v,
        |         sum(ca) OVER (PARTITION BY event_type ORDER BY v) AS fa,
        |         sum(cb) OVER (PARTITION BY event_type ORDER BY v) AS fb,
        |         lead(v) OVER (PARTITION BY event_type ORDER BY v) AS nv
        |  FROM c
        |), tot AS (
        |  SELECT *, max(fa) OVER (PARTITION BY event_type) AS na,
        |            max(fb) OVER (PARTITION BY event_type) AS nb
        |  FROM cum
        |)
        |SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |       CAST(max(nb) AS BIGINT) AS n_b,
        |       round(sum(CASE WHEN nv IS NULL THEN 0.0
        |                 ELSE abs(CAST(fa AS DOUBLE)/na
        |                          - CAST(fb AS DOUBLE)/nb) * (nv - v)
        |                 END), 6) AS w1,
        |       round(max(v) - min(v), 6) AS v_range
        |FROM tot GROUP BY event_type
        |HAVING max(na) > 0 AND max(nb) > 0
        |ORDER BY event_type""".stripMargin,

    // exact mirror of t160: distinct (source, 48-bit 3-gram digest)
    // rows, digest self-join with source_a < source_b, containment =
    // common / min sizes.
    "t160_containment" -> s"""
        |WITH toks AS (
        |  SELECT source,
        |         string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), grams AS (
        |  SELECT source,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_transform(range(len(t) - 2),
        |                     i -> array_to_string(t[i+1:i+3], ' ')) END AS gs
        |  FROM toks
        |), ex AS (SELECT source, unnest(gs) AS gram FROM grams),
        |sd AS (
        |  SELECT DISTINCT source, CAST($HexTerms12 AS BIGINT) AS hv
        |  FROM (SELECT source, md5(gram) AS d FROM ex)
        |), sz AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM sd GROUP BY 1
        |), pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |         CAST(count(*) AS BIGINT) AS n_common
        |  FROM sd a JOIN sd b ON a.hv = b.hv AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT p.source_a, p.source_b, za.n AS n_a, zb.n AS n_b,
        |       p.n_common,
        |       round(CAST(p.n_common AS DOUBLE) / least(za.n, zb.n), 6)
        |         AS containment
        |FROM pairs p JOIN sz za ON p.source_a = za.source
        |             JOIN sz zb ON p.source_b = zb.source
        |ORDER BY containment DESC, source_a, source_b""".stripMargin,

    // exact mirror of t158: t149's daily counts, ascending rank
    // (value then day), the standard Gini rank formula with exact
    // BIGINT numerators and 6dp at the double boundary.
    "t158_burst_gini" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), ranked AS (
        |  SELECT event_type, day, x,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY x, day) AS i,
        |         count(*) OVER (PARTITION BY event_type) AS dd,
        |         sum(x) OVER (PARTITION BY event_type) AS s,
        |         max(x) OVER (PARTITION BY event_type) AS mx
        |  FROM daily
        |)
        |SELECT event_type, CAST(max(dd) AS BIGINT) AS n_periods,
        |       CAST(max(s) AS BIGINT) AS total_x,
        |       round(CAST(2 * sum(i * x) AS DOUBLE) / (max(dd) * max(s))
        |             - CAST(max(dd) + 1 AS DOUBLE) / max(dd), 6) AS gini,
        |       round(CAST(max(mx) AS DOUBLE) / max(s), 6) AS peak_share
        |FROM ranked WHERE s > 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // exact mirror of Mixing.rakeWeights (t152): 4 unrolled IPF
    // iterations (row-scale then column-scale), uniform 0.2/0.25
    // targets, identical per-step arithmetic; 6dp at the boundary.
    "t152_rake_weights" ->
      """WITH cells AS (
        |  SELECT lang, CAST(least(floor(n_chars/150), 3) AS INT) AS b,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY 1, 2
        |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
        |w0 AS (SELECT lang, b, n, 1.0 AS w FROM cells),
        |r1 AS (
        |  SELECT p.lang, p.b, p.n,
        |         p.w * (0.2 / (rs.s / tot.nn)) AS w
        |  FROM w0 p
        |  JOIN (SELECT lang, sum(n*w) AS s FROM w0 GROUP BY lang) rs
        |    ON rs.lang = p.lang
        |  CROSS JOIN tot
        |),
        |c1 AS (
        |  SELECT p.lang, p.b, p.n,
        |         p.w * (0.25 / (cs.s / tot.nn)) AS w
        |  FROM r1 p
        |  JOIN (SELECT b, sum(n*w) AS s FROM r1 GROUP BY b) cs
        |    ON cs.b = p.b
        |  CROSS JOIN tot
        |),
        |r2 AS (
        |  SELECT p.lang, p.b, p.n,
        |         p.w * (0.2 / (rs.s / tot.nn)) AS w
        |  FROM c1 p
        |  JOIN (SELECT lang, sum(n*w) AS s FROM c1 GROUP BY lang) rs
        |    ON rs.lang = p.lang
        |  CROSS JOIN tot
        |),
        |c2 AS (
        |  SELECT p.lang, p.b, p.n,
        |         p.w * (0.25 / (cs.s / tot.nn)) AS w
        |  FROM r2 p
        |  JOIN (SELECT b, sum(n*w) AS s FROM r2 GROUP BY b) cs
        |    ON cs.b = p.b
        |  CROSS JOIN tot
        |),
        |r3 AS (
        |  SELECT p.lang, p.b, p.n,
        |         p.w * (0.2 / (rs.s / tot.nn)) AS w
        |  FROM c2 p
        |  JOIN (SELECT lang, sum(n*w) AS s FROM c2 GROUP BY lang) rs
        |    ON rs.lang = p.lang
        |  CROSS JOIN tot
        |),
        |c3 AS (
        |  SELECT p.lang, p.b, p.n,
        |         p.w * (0.25 / (cs.s / tot.nn)) AS w
        |  FROM r3 p
        |  JOIN (SELECT b, sum(n*w) AS s FROM r3 GROUP BY b) cs
        |    ON cs.b = p.b
        |  CROSS JOIN tot
        |),
        |r4 AS (
        |  SELECT p.lang, p.b, p.n,
        |         p.w * (0.2 / (rs.s / tot.nn)) AS w
        |  FROM c3 p
        |  JOIN (SELECT lang, sum(n*w) AS s FROM c3 GROUP BY lang) rs
        |    ON rs.lang = p.lang
        |  CROSS JOIN tot
        |),
        |c4 AS (
        |  SELECT p.lang, p.b, p.n,
        |         p.w * (0.25 / (cs.s / tot.nn)) AS w
        |  FROM r4 p
        |  JOIN (SELECT b, sum(n*w) AS s FROM r4 GROUP BY b) cs
        |    ON cs.b = p.b
        |  CROSS JOIN tot
        |)
        |SELECT lang, b, n, round(w, 6) AS weight
        |FROM c4
        |ORDER BY lang, b""".stripMargin,

    // exact mirror of t161 (Eval.aucRank): one collapse per (dow,
    // score) with pos/neg counts, cumulative window for tie-block
    // midranks, 2*R+ accumulated as an exact BIGINT; one division at
    // the end. dow = epoch-day % 7 (the t159 portable convention).
    "t161_auc" ->
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |           AS dow,
        |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y,
        |         value AS s
        |  FROM events WHERE value IS NOT NULL
        |), blocks AS (
        |  SELECT dow, s, CAST(sum(y) AS BIGINT) AS cp,
        |         CAST(sum(1 - y) AS BIGINT) AS cn
        |  FROM e GROUP BY dow, s
        |), cum AS (
        |  SELECT dow, cp, cn,
        |         CAST(coalesce(sum(cp + cn) OVER (PARTITION BY dow
        |           ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           1 PRECEDING), 0) AS BIGINT) AS bef
        |  FROM blocks
        |), agg AS (
        |  SELECT dow, CAST(sum(cp) AS BIGINT) AS n_pos,
        |         CAST(sum(cn) AS BIGINT) AS n_neg,
        |         CAST(sum(cp * (2*bef + cp + cn + 1)) AS BIGINT) AS trp
        |  FROM cum GROUP BY dow
        |)
        |SELECT dow, n_pos, n_neg,
        |       round((trp - n_pos*(n_pos+1)) / (2.0 * n_pos * n_neg), 6)
        |         AS auc
        |FROM agg WHERE n_pos > 0 AND n_neg > 0
        |ORDER BY dow""".stripMargin,

    // exact mirror of t162 (Eval.calibrationReport): fixed bins on
    // floor(p*10), BIGINT label counts, confidence mass through
    // DECIMAL(28,10) so every sum is order-independent; ECE numerator
    // sum(|pos - conf_mass|) is an exact decimal.
    "t162_calibration" ->
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |           AS dow,
        |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y,
        |         value / 500.0 AS p
        |  FROM events WHERE value IS NOT NULL
        |), per_bin AS (
        |  SELECT dow, least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
        |         CAST(count(*) AS BIGINT) AS n_b,
        |         CAST(sum(y) AS BIGINT) AS pos,
        |         sum(CAST(p AS DECIMAL(28,10))) AS cm
        |  FROM e GROUP BY 1, 2
        |), tot AS (
        |  SELECT dow, CAST(sum(n_b) AS BIGINT) AS n_tot,
        |         sum(abs(CAST(pos AS DECIMAL(28,10)) - cm)) AS ece_num
        |  FROM per_bin GROUP BY dow
        |)
        |SELECT p.dow, p.bin, p.n_b,
        |       round(CAST(p.pos AS DOUBLE) / p.n_b, 6) AS acc,
        |       round(CAST(p.cm / p.n_b AS DOUBLE), 6) AS conf,
        |       round(CAST(abs(CAST(p.pos AS DECIMAL(28,10)) - p.cm)
        |                    / p.n_b AS DOUBLE), 6) AS gap,
        |       round(CAST(t.ece_num / t.n_tot AS DOUBLE), 6) AS ece
        |FROM per_bin p JOIN tot t ON p.dow = t.dow
        |ORDER BY p.dow, p.bin""".stripMargin,

    // exact mirror of t163 (TextAnalysis.zipfFit): t51 tokenization,
    // 48-bit token digests, top-100 per source by (count DESC, digest
    // ASC) — the bounded-heap aggregate's exact order — then the
    // integer micro-log OLS moments (x/y = round(ln·1e6) BIGINTs) and
    // the t127 closed-form arithmetic with the UNROUNDED slope feeding
    // the intercept.
    "t163_zipf" -> s"""
        |WITH toks AS (
        |  SELECT source,
        |         list_filter(string_split_regex(lower(text),
        |           '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), posting AS (
        |  SELECT source, unnest(t) AS token FROM toks
        |), counts AS (
        |  SELECT source, CAST($HexTerms12 AS BIGINT) AS hv, cnt FROM (
        |    SELECT source, md5(token) AS d, CAST(count(*) AS BIGINT) AS cnt
        |    FROM posting GROUP BY source, token)
        |), ranked AS (
        |  SELECT source, cnt,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY cnt DESC, hv) AS BIGINT) AS rank
        |  FROM counts QUALIFY rank <= 100
        |), xy AS (
        |  SELECT source,
        |         CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0)
        |           AS BIGINT) AS x,
        |         CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000.0)
        |           AS BIGINT) AS y
        |  FROM ranked
        |), m AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x*y) AS BIGINT) AS sxy,
        |         CAST(sum(x*x) AS BIGINT) AS sxx,
        |         CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM xy GROUP BY source
        |)
        |SELECT source, n_terms,
        |       round(CAST(n_terms*sxy - sx*sy AS DOUBLE)
        |             / CAST(n_terms*sxx - sx*sx AS DOUBLE), 6) AS slope,
        |       round((CAST(sy AS DOUBLE)
        |              - (CAST(n_terms*sxy - sx*sy AS DOUBLE)
        |                 / CAST(n_terms*sxx - sx*sx AS DOUBLE)) * sx)
        |             / n_terms / 1000000.0, 6) AS intercept,
        |       CASE WHEN n_terms*syy - sy*sy > 0 THEN
        |         round(CAST(n_terms*sxy - sx*sy AS DOUBLE)
        |               * CAST(n_terms*sxy - sx*sy AS DOUBLE)
        |               / (CAST(n_terms*sxx - sx*sx AS DOUBLE)
        |                  * CAST(n_terms*syy - sy*sy AS DOUBLE)), 6)
        |       END AS r2
        |FROM m WHERE n_terms >= 2 AND n_terms*sxx - sx*sx > 0
        |ORDER BY source""".stripMargin,

    // exact mirror of t164 (Eval.kaplanMeier): per-user first event /
    // first purchase in exact epoch micros, hour durations by integer
    // division, reversed-cumulative at-risk window, survival as exp of
    // the ordered cumulative ln-sum with the deaths==at_risk row
    // pinned to exactly 0.
    "t164_km_survival" ->
      """WITH horizon AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
        |per_user AS (
        |  SELECT user_id, user_id % 3 AS cohort,
        |         min(epoch_us(ts)) AS t0,
        |         min(CASE WHEN event_type = 'purchase'
        |               THEN epoch_us(ts) END) AS tp
        |  FROM events GROUP BY user_id
        |), u AS (
        |  SELECT cohort,
        |         CAST((coalesce(tp, tmax) - t0) // 3600000000 AS BIGINT)
        |           AS dur,
        |         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS died
        |  FROM per_user, horizon
        |), per_d AS (
        |  SELECT cohort, dur AS d, CAST(sum(died) AS BIGINT) AS deaths,
        |         CAST(count(*) AS BIGINT) AS ending
        |  FROM u GROUP BY cohort, dur
        |), risk AS (
        |  SELECT cohort, d, deaths,
        |         CAST(sum(ending) OVER (PARTITION BY cohort ORDER BY d
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |           AS BIGINT) AS at_risk
        |  FROM per_d
        |), terms AS (
        |  SELECT cohort, d, deaths, at_risk,
        |         CASE WHEN deaths < at_risk
        |              THEN ln(1.0 - deaths / CAST(at_risk AS DOUBLE)) END
        |           AS term,
        |         CASE WHEN deaths = at_risk THEN 1 ELSE 0 END AS zr
        |  FROM risk
        |)
        |SELECT cohort, d, deaths, at_risk,
        |       CASE WHEN max(zr) OVER (PARTITION BY cohort ORDER BY d
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
        |            THEN 0.0
        |            ELSE round(exp(coalesce(sum(term) OVER
        |              (PARTITION BY cohort ORDER BY d
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |              0.0)), 6)
        |       END AS survival
        |FROM terms WHERE deaths > 0
        |ORDER BY cohort, d""".stripMargin,

    // exact mirror of t165 (Eval.averagePrecision): same blocks
    // collapse as t161, cumulative positives/rows over distinct
    // scores DESC, AP as the identically-ordered cumulative term sum
    // (terms >= 0, so max = the final ordered sum).
    "t165_avg_precision" ->
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |           AS dow,
        |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y,
        |         value AS s
        |  FROM events WHERE value IS NOT NULL
        |), blocks AS (
        |  SELECT dow, s, CAST(sum(y) AS BIGINT) AS cp,
        |         CAST(count(*) AS BIGINT) AS ct
        |  FROM e GROUP BY dow, s
        |), cum AS (
        |  SELECT dow, s, cp,
        |         CAST(sum(cp) OVER w AS BIGINT) AS pb,
        |         CAST(sum(ct) OVER w AS BIGINT) AS tb
        |  FROM blocks
        |  WINDOW w AS (PARTITION BY dow ORDER BY s DESC
        |               ROWS UNBOUNDED PRECEDING)
        |), tot AS (
        |  SELECT dow, CAST(sum(cp) AS BIGINT) AS n_pos FROM blocks
        |  GROUP BY dow
        |), terms AS (
        |  SELECT c.dow, t.n_pos,
        |         sum((c.cp / CAST(t.n_pos AS DOUBLE))
        |             * (c.pb / CAST(c.tb AS DOUBLE)))
        |           OVER (PARTITION BY c.dow ORDER BY c.s DESC
        |                 ROWS UNBOUNDED PRECEDING) AS ap_cum
        |  FROM cum c JOIN tot t ON c.dow = t.dow WHERE t.n_pos > 0
        |)
        |SELECT dow, n_pos, round(max(ap_cum), 6) AS ap
        |FROM terms GROUP BY dow, n_pos
        |ORDER BY dow""".stripMargin,

    // exact mirror of t166 (TextDedup.containmentPairs over exact
    // reps): the t4 candidate contract (distinct 3-gram shingle sets,
    // posting lists with 2 <= df <= 10), then BOTH directions of
    // |A ∩ B| / |A| judged on the 6dp-rounded value. Spark intersects
    // xxhash64'd shingles; string-set intersection is identical
    // modulo 64-bit collisions (none at oracle scale).
    "t166_containment_pairs" ->
      """WITH reps AS (
        |  SELECT min(doc_id) AS id, text FROM documents GROUP BY text
        |), toks AS (
        |  SELECT id, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')
        |           AS t
        |  FROM reps
        |), sets AS (
        |  SELECT id, list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END)
        |    AS sh
        |  FROM toks
        |), posting AS (
        |  SELECT id, unnest(sh) AS s FROM sets
        |), grouped AS (
        |  SELECT s, array_agg(id) AS ids FROM posting GROUP BY s
        |  HAVING count(*) BETWEEN 2 AND 10
        |), cands AS (
        |  SELECT DISTINCT la.a AS id_a, lb.b AS id_b
        |  FROM grouped, UNNEST(ids) la(a), UNNEST(ids) lb(b)
        |  WHERE lb.b > la.a
        |), scored AS (
        |  SELECT c.id_a, c.id_b,
        |         CAST(len(sa.sh) AS BIGINT) AS n_a,
        |         CAST(len(sb.sh) AS BIGINT) AS n_b,
        |         CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT)
        |           AS n_common
        |  FROM cands c
        |  JOIN sets sa ON sa.id = c.id_a
        |  JOIN sets sb ON sb.id = c.id_b
        |), dirs AS (
        |  SELECT id_a AS id_sub, id_b AS id_sup,
        |         n_a AS n_sub, n_b AS n_sup, n_common FROM scored
        |  UNION ALL
        |  SELECT id_b, id_a, n_b, n_a, n_common FROM scored
        |)
        |SELECT id_sub, id_sup, n_sub, n_sup, n_common,
        |       round(CAST(n_common AS DOUBLE) / n_sub, 6) AS containment
        |FROM dirs
        |WHERE round(CAST(n_common AS DOUBLE) / n_sub, 6) >= 0.8
        |ORDER BY id_sub, id_sup""".stripMargin,

    // exact mirror of t167 (Behavior.transitionEntropy): t121's
    // transition counts, per-term BIGINT micro-log round(p·ln p·1e6),
    // order-independent integer sum, 6dp at the final divisions.
    "t167_transition_entropy" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events
        |), c AS (
        |  SELECT prev AS prev_type, event_type AS next_type,
        |         count(*) AS n
        |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
        |), t AS (
        |  SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1
        |), m AS (
        |  SELECT c.prev_type, t.tot,
        |         CAST(round((CAST(c.n AS DOUBLE) / t.tot)
        |                    * ln(CAST(c.n AS DOUBLE) / t.tot)
        |                    * 1000000.0) AS BIGINT) AS micro
        |  FROM c JOIN t USING (prev_type)
        |), a AS (
        |  SELECT prev_type, CAST(max(tot) AS BIGINT) AS n_out,
        |         CAST(count(*) AS BIGINT) AS k_next,
        |         CAST(sum(micro) AS BIGINT) AS msum
        |  FROM m GROUP BY prev_type
        |)
        |SELECT prev_type, n_out, k_next,
        |       round(-CAST(msum AS DOUBLE) / 1000000.0, 6) AS entropy,
        |       CASE WHEN k_next > 1
        |            THEN round(-CAST(msum AS DOUBLE) / 1000000.0
        |                       / ln(CAST(k_next AS DOUBLE)), 6)
        |            ELSE 0.0 END AS norm_entropy
        |FROM a ORDER BY prev_type""".stripMargin,

    // exact mirror of t168 (TextAnalysis.heapsFit): per-source doc
    // ranks ordered by doc_id, vocabulary first-sightings over the
    // 48-bit md5 token digests, power-of-2 checkpoints, and the t163
    // integer micro-log OLS. The oracle joins every first-sighting /
    // rank to every checkpoint >= it (fine at oracle scale); the
    // engine buckets by ceil(log2) and cumsums — identical integers.
    "t168_heaps_fit" ->
      s"""WITH toks AS (
        |  SELECT source, doc_id,
        |         list_filter(string_split_regex(lower(text),
        |           '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), ranked AS (
        |  SELECT source, doc_id, len(t) AS ntok,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY doc_id) AS BIGINT) AS rk
        |  FROM toks
        |), posting AS (
        |  SELECT source, rk, unnest(t) AS token
        |  FROM (SELECT source, t, rk
        |        FROM toks JOIN ranked USING (source, doc_id))
        |), firstseen AS (
        |  SELECT source, CAST($HexTerms12 AS BIGINT) AS hv,
        |         min(rk) AS fr
        |  FROM (SELECT source, md5(token) AS d, rk FROM posting)
        |  GROUP BY source, hv
        |), cp AS (
        |  SELECT source, CAST(pow(2, g) AS BIGINT) AS c
        |  FROM (SELECT source, max(rk) AS mx FROM ranked GROUP BY source),
        |       (SELECT unnest(range(1, 63)) AS g)
        |  WHERE CAST(pow(2, g) AS BIGINT) <= mx
        |), vexact AS (
        |  SELECT cp.source, cp.c, CAST(count(*) AS BIGINT) AS v
        |  FROM cp JOIN firstseen f
        |    ON f.source = cp.source AND f.fr <= cp.c
        |  GROUP BY cp.source, cp.c
        |), nmass AS (
        |  SELECT cp.source, cp.c, CAST(sum(r.ntok) AS BIGINT) AS n
        |  FROM cp JOIN ranked r
        |    ON r.source = cp.source AND r.rk <= cp.c
        |  GROUP BY cp.source, cp.c
        |), xy AS (
        |  SELECT v.source,
        |         CAST(round(ln(CAST(n.n AS DOUBLE)) * 1000000.0)
        |           AS BIGINT) AS x,
        |         CAST(round(ln(CAST(v.v AS DOUBLE)) * 1000000.0)
        |           AS BIGINT) AS y
        |  FROM vexact v JOIN nmass n
        |    ON v.source = n.source AND v.c = n.c
        |  WHERE v.v > 0 AND n.n > 0
        |), m AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_points,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x*y) AS BIGINT) AS sxy,
        |         CAST(sum(x*x) AS BIGINT) AS sxx,
        |         CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM xy GROUP BY source
        |)
        |SELECT source, n_points,
        |       round(CAST(n_points*sxy - sx*sy AS DOUBLE)
        |             / CAST(n_points*sxx - sx*sx AS DOUBLE), 6) AS beta,
        |       round((CAST(sy AS DOUBLE)
        |              - (CAST(n_points*sxy - sx*sy AS DOUBLE)
        |                 / CAST(n_points*sxx - sx*sx AS DOUBLE)) * sx)
        |             / n_points / 1000000.0, 6) AS ln_k,
        |       CASE WHEN n_points*syy - sy*sy > 0 THEN
        |         round(CAST(n_points*sxy - sx*sy AS DOUBLE)
        |               * CAST(n_points*sxy - sx*sy AS DOUBLE)
        |               / (CAST(n_points*sxx - sx*sx AS DOUBLE)
        |                  * CAST(n_points*syy - sy*sy AS DOUBLE)), 6)
        |       END AS r2
        |FROM m WHERE n_points >= 2 AND n_points*sxx - sx*sx > 0
        |ORDER BY source""".stripMargin,

    // exact mirror of t169 (TextAnalysis.pmiPairs): per-doc DISTINCT
    // tokens, doc-frequency by 48-bit digest, top-30 by (df DESC,
    // digest) — the bounded-heap's tie rule — presence self-join for
    // pair counts, PMI = ln(n_ab N / (n_a n_b)) at 6dp.
    "t169_pmi_cooccur" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text),
        |           '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), posting AS (
        |  SELECT DISTINCT doc_id, token
        |  FROM (SELECT doc_id, unnest(t) AS token FROM toks)
        |), hv AS (
        |  SELECT doc_id, token, CAST($HexTerms12 AS BIGINT) AS h
        |  FROM (SELECT doc_id, token, md5(token) AS d FROM posting)
        |), df AS (
        |  SELECT h, min(token) AS token, CAST(count(*) AS BIGINT) AS n_doc
        |  FROM hv GROUP BY h
        |), topk AS (
        |  SELECT h, token, n_doc,
        |         row_number() OVER (ORDER BY n_doc DESC, h) AS rk
        |  FROM df QUALIFY rk <= 30
        |), pres AS (
        |  SELECT v.doc_id, v.h FROM hv v JOIN topk USING (h)
        |), pairs AS (
        |  SELECT a.h AS ha, b.h AS hb, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.h < b.h
        |  GROUP BY 1, 2
        |), nn AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM toks
        |)
        |SELECT ta.token AS tok_a, tb.token AS tok_b,
        |       ta.n_doc AS n_a, tb.n_doc AS n_b, p.n_ab,
        |       round(ln(CAST(p.n_ab * nn.n_docs AS DOUBLE)
        |                / CAST(ta.n_doc * tb.n_doc AS DOUBLE)), 6) AS pmi
        |FROM pairs p, nn
        |JOIN topk ta ON ta.h = p.ha
        |JOIN topk tb ON tb.h = p.hb
        |WHERE p.n_ab >= 10
        |ORDER BY tok_a, tok_b""".stripMargin,

    // exact mirror of t170 (Privacy.lDiversityAudit): (quasi,
    // sensitive) counts, micro-log entropy terms, both verdicts on
    // the 6dp-rounded entropy vs ln(120).
    "t170_l_diversity" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |           AS dow,
        |         user_id
        |  FROM events
        |), c AS (
        |  SELECT event_type, dow, user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2, 3
        |), t AS (
        |  SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS tot,
        |         CAST(count(*) AS BIGINT) AS k_sensitive
        |  FROM c GROUP BY 1, 2
        |), m AS (
        |  SELECT c.event_type, c.dow,
        |         CAST(round((CAST(c.n AS DOUBLE) / t.tot)
        |                    * ln(CAST(c.n AS DOUBLE) / t.tot)
        |                    * 1000000.0) AS BIGINT) AS micro
        |  FROM c JOIN t USING (event_type, dow)
        |), a AS (
        |  SELECT event_type, dow, CAST(sum(micro) AS BIGINT) AS msum
        |  FROM m GROUP BY 1, 2
        |)
        |SELECT t.event_type, t.dow, t.tot AS n, t.k_sensitive,
        |       round(-CAST(a.msum AS DOUBLE) / 1000000.0, 6) AS s_entropy,
        |       t.k_sensitive >= 120 AS distinct_l_diverse,
        |       round(-CAST(a.msum AS DOUBLE) / 1000000.0, 6) >= ln(120.0)
        |         AS entropy_l_diverse
        |FROM t JOIN a USING (event_type, dow)
        |ORDER BY event_type, dow""".stripMargin,

    // exact mirror of t171 (Profiling.benfordAudit): BIGINT cents,
    // string leading digit, full 9-digit grid (absent digits score
    // |0 - P(d)|), micro-term MAD.
    "t171_benford" ->
      """WITH v AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND value > 0
        |), d AS (
        |  SELECT event_type,
        |         CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |           AS digit
        |  FROM v WHERE cents > 0
        |), c AS (
        |  SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
        |  FROM d GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1
        |), grid AS (
        |  SELECT t.event_type, t.tot, CAST(g.g AS BIGINT) AS digit
        |  FROM t, (SELECT unnest(range(1, 10)) AS g) g
        |), m AS (
        |  SELECT gr.event_type, gr.tot,
        |         coalesce(c.n, 0) AS nd,
        |         CAST(round(abs(CAST(coalesce(c.n, 0) AS DOUBLE) / gr.tot
        |               - log10(1.0 + 1.0 / gr.digit)) * 1000000.0)
        |           AS BIGINT) AS micro
        |  FROM grid gr LEFT JOIN c
        |    ON c.event_type = gr.event_type AND c.digit = gr.digit
        |)
        |SELECT event_type, CAST(max(tot) AS BIGINT) AS n_values,
        |       CAST(sum(CASE WHEN nd > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS k_digits,
        |       round(CAST(sum(micro) AS DOUBLE) / 1000000.0 / 9.0, 6)
        |         AS mad
        |FROM m GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // exact mirror of t172 (Eval.conformalThreshold): calibration
    // blocks over distinct scores, the ceil((n+1)*0.9) order
    // statistic from the cumulative window, test coverage judged on
    // the 6dp-rounded share vs 0.88.
    "t172_conformal" ->
      """WITH e AS (
        |  SELECT event_type, event_id % 2 = 0 AS cal, value AS s
        |  FROM events WHERE value IS NOT NULL
        |), blocks AS (
        |  SELECT event_type, s, CAST(count(*) AS BIGINT) AS ct
        |  FROM e WHERE cal GROUP BY 1, 2
        |), nc AS (
        |  SELECT event_type, CAST(sum(ct) AS BIGINT) AS n_cal
        |  FROM blocks GROUP BY 1
        |), cum AS (
        |  SELECT b.event_type, b.s, n.n_cal,
        |         CAST(sum(b.ct) OVER (PARTITION BY b.event_type
        |           ORDER BY b.s ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
        |  FROM blocks b JOIN nc n USING (event_type)
        |), thr AS (
        |  SELECT event_type, n_cal, min(s) AS thr
        |  FROM cum
        |  WHERE cc >= CAST(ceil((n_cal + 1) * 0.9) AS BIGINT)
        |  GROUP BY event_type, n_cal
        |), test AS (
        |  SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_test,
        |         CAST(sum(CASE WHEN e.s <= t.thr THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_cov
        |  FROM e JOIN thr t USING (event_type) WHERE NOT e.cal
        |  GROUP BY 1
        |)
        |SELECT t.event_type, t.n_cal, round(t.thr, 6) AS threshold,
        |       x.n_test,
        |       round(CAST(x.n_cov AS DOUBLE) / x.n_test, 6) AS coverage,
        |       round(CAST(x.n_cov AS DOUBLE) / x.n_test, 6) >= 0.88
        |         AS covered
        |FROM thr t JOIN test x USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // exact mirror of t173 (TextAnalysis.goodTuringReport): per-source
    // token counts over the shared lowercase-whitespace contract,
    // frequency-of-frequencies, p0 = N1/N and r1* = 2 N2/N1.
    "t173_good_turing" ->
      """WITH toks AS (
        |  SELECT source,
        |         list_filter(string_split_regex(lower(text),
        |           '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), cnt AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS r
        |  FROM (SELECT source, unnest(t) AS token FROM toks)
        |  GROUP BY 1, 2
        |), agg AS (
        |  SELECT source, CAST(sum(r) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS v,
        |         CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n1,
        |         CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n2
        |  FROM cnt GROUP BY source
        |)
        |SELECT source, n_tokens, v, n1, n2,
        |       round(CAST(n1 AS DOUBLE) / n_tokens, 6) AS p_unseen,
        |       CASE WHEN n1 > 0 THEN round(2.0 * n2 / n1, 6) END
        |         AS r1_star
        |FROM agg ORDER BY source""".stripMargin,

    // exact mirror of t174 (TextAnalysis.labelMi): top-30 by (df DESC,
    // digest), 2 x |labels| contingency per token with absent cells
    // from the label totals, per-cell BIGINT micro-log terms.
    "t174_label_mi" ->
      s"""WITH toks AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split_regex(lower(text),
        |           '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), posting AS (
        |  SELECT DISTINCT doc_id, source, token
        |  FROM (SELECT doc_id, source, unnest(t) AS token FROM toks)
        |), hv AS (
        |  SELECT doc_id, source, token, CAST($HexTerms12 AS BIGINT) AS h
        |  FROM (SELECT doc_id, source, token, md5(token) AS d FROM posting)
        |), dfx AS (
        |  SELECT h, min(token) AS token, CAST(count(*) AS BIGINT) AS n_t
        |  FROM hv GROUP BY h
        |), topk AS (
        |  SELECT h, token, n_t,
        |         row_number() OVER (ORDER BY n_t DESC, h) AS rk
        |  FROM dfx QUALIFY rk <= 30
        |), srcn AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM toks
        |  GROUP BY source
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
        |pres AS (
        |  SELECT v.h, v.source, CAST(count(*) AS BIGINT) AS n_ts
        |  FROM hv v JOIN topk USING (h) GROUP BY 1, 2
        |), cells AS (
        |  SELECT t.h, t.n_t, s.source, s.n_s, nn.n,
        |         coalesce(p.n_ts, 0) AS n_ts
        |  FROM topk t CROSS JOIN srcn s CROSS JOIN nn
        |  LEFT JOIN pres p ON p.h = t.h AND p.source = s.source
        |), terms AS (
        |  SELECT h,
        |    CASE WHEN n_ts > 0 THEN
        |      CAST(round((CAST(n_ts AS DOUBLE) / n)
        |        * ln(CAST(n_ts * n AS DOUBLE) / CAST(n_t * n_s AS DOUBLE))
        |        * 1000000.0) AS BIGINT)
        |    ELSE 0 END
        |    + CASE WHEN n_s - n_ts > 0 AND n - n_t > 0 THEN
        |      CAST(round((CAST(n_s - n_ts AS DOUBLE) / n)
        |        * ln(CAST((n_s - n_ts) * n AS DOUBLE)
        |             / CAST((n - n_t) * n_s AS DOUBLE))
        |        * 1000000.0) AS BIGINT)
        |    ELSE 0 END AS micro
        |  FROM cells
        |)
        |SELECT t2.token, t2.n_t AS n_doc,
        |       round(CAST(sum(terms.micro) AS DOUBLE) / 1000000.0, 6)
        |         AS mi
        |FROM terms JOIN topk t2 USING (h)
        |GROUP BY t2.token, t2.n_t
        |ORDER BY mi DESC, t2.token""".stripMargin,

    // exact mirror of t175 (streaming conformal coverage monitor):
    // thresholds from the even-day slice (t172's order statistic),
    // per-ODD-day coverage, append-mode watermark cut (windows whose
    // end <= max(filtered ts) - 1 day emit), running miss count.
    "t175_stream_conformal" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS ed,
        |         CAST(ts AS DATE) AS day, CAST(ts AS TIMESTAMP) AS tss,
        |         value AS s
        |  FROM events WHERE value IS NOT NULL
        |), blocks AS (
        |  SELECT event_type, s, CAST(count(*) AS BIGINT) AS ct
        |  FROM e WHERE ed % 2 = 0 GROUP BY 1, 2
        |), nc AS (
        |  SELECT event_type, CAST(sum(ct) AS BIGINT) AS n_cal
        |  FROM blocks GROUP BY 1
        |), cum AS (
        |  SELECT b.event_type, b.s, n.n_cal,
        |         CAST(sum(b.ct) OVER (PARTITION BY b.event_type
        |           ORDER BY b.s ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
        |  FROM blocks b JOIN nc n USING (event_type)
        |), thr AS (
        |  SELECT event_type, n_cal, min(s) AS thr
        |  FROM cum
        |  WHERE cc >= CAST(ceil((n_cal + 1) * 0.9) AS BIGINT)
        |  GROUP BY event_type, n_cal
        |), wm AS (
        |  SELECT max(tss) - INTERVAL 1 DAY AS w FROM e WHERE ed % 2 = 1
        |), daily AS (
        |  SELECT e.event_type, e.day, t.n_cal, t.thr,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN e.s <= t.thr THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_cov
        |  FROM e JOIN thr t USING (event_type)
        |  WHERE e.ed % 2 = 1
        |    AND CAST(e.day AS TIMESTAMP) + INTERVAL 1 DAY
        |          <= (SELECT w FROM wm)
        |  GROUP BY 1, 2, 3, 4
        |), flags AS (
        |  SELECT event_type, day, n_cal, round(thr, 6) AS threshold,
        |         n, n_cov,
        |         round(CAST(n_cov AS DOUBLE) / n, 6) AS coverage,
        |         round(CAST(n_cov AS DOUBLE) / n, 6) >= 0.85 AS covered
        |  FROM daily
        |)
        |SELECT event_type, day, n_cal, threshold, n, n_cov, coverage,
        |       covered,
        |       CAST(sum(CASE WHEN covered THEN 0 ELSE 1 END) OVER
        |         (PARTITION BY event_type ORDER BY day
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS misses_so_far
        |FROM flags ORDER BY event_type, day""".stripMargin,

    // exact mirror of t176 (Eval.mannWhitney): t161's BIGINT rank
    // sums plus the exact per-block tie cubes; doubles only in the
    // final sigma/z expression, mirrored operation-for-operation.
    "t176_mann_whitney" ->
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |           AS dow,
        |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y,
        |         value AS s
        |  FROM events WHERE value IS NOT NULL
        |), blocks AS (
        |  SELECT dow, s, CAST(sum(y) AS BIGINT) AS cp,
        |         CAST(sum(1 - y) AS BIGINT) AS cn
        |  FROM e GROUP BY 1, 2
        |), cum AS (
        |  SELECT dow, cp, cn,
        |         CAST(coalesce(sum(cp + cn) OVER (PARTITION BY dow
        |           ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           1 PRECEDING), 0) AS BIGINT) AS bef
        |  FROM blocks
        |), agg AS (
        |  SELECT dow, CAST(sum(cp) AS BIGINT) AS n1,
        |         CAST(sum(cn) AS BIGINT) AS n2,
        |         CAST(sum(cp * (2*bef + cp + cn + 1)) AS BIGINT) AS trp,
        |         CAST(sum((cp+cn)*(cp+cn)*(cp+cn) - (cp+cn)) AS BIGINT)
        |           AS ties
        |  FROM cum GROUP BY dow
        |)
        |SELECT dow, n1 AS n_pos, n2 AS n_neg,
        |       round((trp - n1*(n1+1)) / 2.0, 6) AS u,
        |       round(((trp - n1*(n1+1)) - CAST(n1*n2 AS DOUBLE))
        |         / (2.0 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
        |             * ((n1 + n2 + 1) - CAST(ties AS DOUBLE)
        |                / (CAST(n1+n2 AS DOUBLE) * (n1+n2-1))))), 6)
        |         AS z
        |FROM agg WHERE n1 > 0 AND n2 > 0
        |ORDER BY dow""".stripMargin,

    // exact mirror of Eval.cliffsDelta (t240): the t176 doubled-
    // midrank BIGINT accumulator, delta = (2U - n1*n2)/(n1*n2) one
    // IEEE chain, Romano magnitude labels on the 6dp-rounded value
    "t240_cliffs_delta" ->
      """WITH e AS (
        |  SELECT source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |         n_chars AS s
        |  FROM documents WHERE n_chars IS NOT NULL
        |), blocks AS (
        |  SELECT source, s, CAST(sum(y) AS BIGINT) AS cp,
        |         CAST(sum(1 - y) AS BIGINT) AS cn
        |  FROM e GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, cp, cn,
        |         CAST(coalesce(sum(cp + cn) OVER (PARTITION BY source
        |           ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           1 PRECEDING), 0) AS BIGINT) AS bef
        |  FROM blocks
        |), agg AS (
        |  SELECT source, CAST(sum(cp) AS BIGINT) AS n1,
        |         CAST(sum(cn) AS BIGINT) AS n2,
        |         CAST(sum(cp * (2*bef + cp + cn + 1)) AS BIGINT) AS trp
        |  FROM cum GROUP BY source
        |), d AS (
        |  SELECT source, n1, n2,
        |         round((CAST(trp - n1*(n1+1) AS DOUBLE)
        |                - CAST(n1*n2 AS DOUBLE))
        |               / CAST(n1*n2 AS DOUBLE), 6) AS delta
        |  FROM agg WHERE n1 > 0 AND n2 > 0
        |)
        |SELECT source, n1 AS n_pos, n2 AS n_neg, delta,
        |       CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |            WHEN abs(delta) < 0.33  THEN 'small'
        |            WHEN abs(delta) < 0.474 THEN 'medium'
        |            ELSE 'large' END AS magnitude
        |FROM d ORDER BY source""".stripMargin,

    // exact mirror of Agreement.cochranQ (t241): one integer
    // reduction per source (row sums are per-row expressions — raters
    // are columns), HUGEINT products, Q one double divide, judged
    // against the shared chi-square 0.95 literal at df = 2
    "t241_cochran_q" ->
      """WITH r AS (
        |  SELECT source,
        |    CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS r1,
        |    CASE WHEN len(list_filter(
        |      string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |      x -> x <> '')) > 45 THEN 1 ELSE 0 END AS r2,
        |    CASE WHEN len(list_distinct(list_filter(
        |      string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
        |      x -> x <> ''))) > 25 THEN 1 ELSE 0 END AS r3
        |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
        |), agg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum((r1+r2+r3)*(r1+r2+r3)) AS BIGINT) AS rr,
        |    CAST(sum(r1) AS BIGINT) AS c1, CAST(sum(r2) AS BIGINT) AS c2,
        |    CAST(sum(r3) AS BIGINT) AS c3
        |  FROM r GROUP BY source
        |), qq AS (
        |  SELECT source, n_items,
        |    CASE WHEN 3*(c1+c2+c3) - rr > 0 THEN
        |      CAST(2*(3*(CAST(c1 AS HUGEINT)*c1 + CAST(c2 AS HUGEINT)*c2
        |                 + CAST(c3 AS HUGEINT)*c3)
        |           - CAST(c1+c2+c3 AS HUGEINT)*(c1+c2+c3)) AS DOUBLE)
        |      / CAST(3*(c1+c2+c3) - rr AS DOUBLE)
        |    END AS q
        |  FROM agg
        |)
        |SELECT source, n_items, 3 AS k, round(q, 6) AS q,
        |       round(5.991464547, 6) AS q_crit,
        |       coalesce(q > 5.991464547, FALSE) AS significant
        |FROM qq ORDER BY source""".stripMargin,

    // exact mirror of Agreement.krippendorffAlpha (t242): the
    // coincidence-matrix closed form — per-unit disagreement terms
    // (n_u^2 - sum o^2)/(n_u - 1) micro-rounded to BIGINT before the
    // sum, margins squared as HUGEINT, alpha one IEEE chain; the
    // third rater abstains on doc_id % 7 = 0
    "t242_krippendorff" ->
      """WITH t AS (
        |  SELECT source, doc_id, n_chars,
        |    len(list_filter(string_split_regex(lower(text),
        |      '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS ntok,
        |    len(list_distinct(list_filter(string_split_regex(lower(text),
        |      '[ \t\n\x0B\f\r]+'), x -> x <> ''))) AS ndis
        |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
        |), ratings AS (
        |  SELECT source, doc_id AS u,
        |    CASE WHEN n_chars <= 250 THEN 'short'
        |         WHEN n_chars <= 350 THEN 'mid' ELSE 'long' END AS k
        |  FROM t
        |  UNION ALL
        |  SELECT source, doc_id,
        |    CASE WHEN ntok <= 40 THEN 'short'
        |         WHEN ntok <= 55 THEN 'mid' ELSE 'long' END
        |  FROM t
        |  UNION ALL
        |  SELECT source, doc_id,
        |    CASE WHEN ndis <= 22 THEN 'short'
        |         WHEN ndis <= 28 THEN 'mid' ELSE 'long' END
        |  FROM t WHERE doc_id % 7 <> 0
        |), cell AS (
        |  SELECT source, u, k, CAST(count(*) AS BIGINT) AS c
        |  FROM ratings GROUP BY 1, 2, 3
        |), per_unit AS (
        |  SELECT source, u, CAST(sum(c*c) AS BIGINT) AS s2,
        |         CAST(sum(c) AS BIGINT) AS nu
        |  FROM cell GROUP BY 1, 2
        |  HAVING sum(c) >= 2
        |), dsum AS (
        |  SELECT source,
        |    CAST(sum(CAST(round(CAST(nu*nu - s2 AS DOUBLE)
        |      / (nu - 1) * 1e6) AS BIGINT)) AS BIGINT) AS ds,
        |    CAST(sum(nu) AS BIGINT) AS n_ratings,
        |    CAST(count(*) AS BIGINT) AS n_units
        |  FROM per_unit GROUP BY source
        |), margins AS (
        |  SELECT source, CAST(sum(CAST(nc AS HUGEINT) * nc) AS HUGEINT)
        |           AS nc2,
        |         CAST(count(*) AS BIGINT) AS n_categories
        |  FROM (
        |    SELECT c.source, c.k, CAST(sum(c.c) AS BIGINT) AS nc
        |    FROM cell c JOIN per_unit p
        |      ON p.source = c.source AND p.u = c.u
        |    GROUP BY 1, 2
        |  ) GROUP BY source
        |)
        |SELECT d.source, d.n_units, d.n_ratings, m.n_categories,
        |  round(CASE WHEN CAST(d.n_ratings AS HUGEINT)*d.n_ratings - m.nc2
        |               > 0 THEN
        |    1.0 - CAST(d.n_ratings - 1 AS DOUBLE)
        |          * (CAST(d.ds AS DOUBLE) / 1e6)
        |          / CAST(CAST(d.n_ratings AS HUGEINT)*d.n_ratings - m.nc2
        |                 AS DOUBLE)
        |  END, 6) AS alpha
        |FROM dsum d JOIN margins m ON m.source = d.source
        |ORDER BY d.source""".stripMargin,

    // exact mirror of t247 (streaming median-of-means): the t14
    // append-emission replay (windows with end <= max ts - 1 day)
    // feeding the t245 shard arithmetic — every shard statistic an
    // exact integer, MoM the left-median of the shard means
    "t247_stream_mom" ->
      """WITH e AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, event_id,
        |         CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |), wm AS (
        |  SELECT max(ts) - INTERVAL 1 DAY AS w FROM e
        |), f AS (
        |  SELECT date_trunc('day', ts) AS day, event_type,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12)
        |      AS BIGINT) % 16 AS shard, cents
        |  FROM e
        |  WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        |), bm AS (
        |  SELECT day, event_type, shard, CAST(sum(cents) AS BIGINT) AS s,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM f GROUP BY 1, 2, 3
        |), g AS (
        |  SELECT day, event_type, CAST(sum(c) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS k_buckets,
        |         list_sort(list(CAST(s AS DOUBLE) / c / 100.0)) AS ms
        |  FROM bm GROUP BY 1, 2
        |)
        |SELECT day, event_type, n_rows, k_buckets,
        |  round(ms[CAST((k_buckets + 1) // 2 AS INT)], 6) AS mom
        |FROM g ORDER BY day, event_type""".stripMargin,

    // exact mirror of Eval.rollingMedianOfMeans (t248): per-day shard
    // sums merged across each 7-day window by a range join (the t92
    // window-replay convention), then the t245 shard arithmetic
    "t248_mom_rolling" ->
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12)
        |      AS BIGINT) % 16 AS b,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |), daily AS (
        |  SELECT d, b, CAST(sum(cents) AS BIGINT) AS s,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2
        |), days AS (SELECT DISTINCT d AS day FROM daily),
        |win AS (
        |  SELECT days.day, daily.b, CAST(sum(daily.s) AS BIGINT) AS ws,
        |         CAST(sum(daily.c) AS BIGINT) AS wc
        |  FROM days JOIN daily
        |    ON daily.d BETWEEN days.day - 6 AND days.day
        |  GROUP BY 1, 2
        |), g AS (
        |  SELECT day, CAST(sum(wc) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS k_buckets,
        |         list_sort(list(CAST(ws AS DOUBLE) / wc / 100.0)) AS ms
        |  FROM win GROUP BY day
        |)
        |SELECT day, 7 AS window_days, n_rows, k_buckets,
        |  round(ms[CAST((k_buckets + 1) // 2 AS INT)], 6) AS mom
        |FROM g ORDER BY day""".stripMargin,

    // exact mirror of Eval.medianOfMeans (t245): 16 md5-digest shards
    // of event_id, exact cents sums per shard, one IEEE chain per
    // shard mean, left-median of the sorted means; the plain mean
    // rides along for the contamination-gap readout
    "t245_median_of_means" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12)
        |      AS BIGINT) % 16 AS b
        |  FROM events WHERE value IS NOT NULL
        |), bm AS (
        |  SELECT event_type, b, CAST(sum(cents) AS BIGINT) AS s,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2
        |), s AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS k_buckets,
        |         CAST(sum(s) AS BIGINT) AS st,
        |         list_sort(list(CAST(s AS DOUBLE) / c / 100.0)) AS ms
        |  FROM bm GROUP BY event_type
        |)
        |SELECT event_type, n_rows, k_buckets,
        |  round(CAST(st AS DOUBLE) / n_rows / 100.0, 6) AS mean,
        |  round(ms[CAST((k_buckets + 1) // 2 AS INT)], 6) AS mom
        |FROM s ORDER BY event_type""".stripMargin,

    // exact mirror of Profiling.hillTailIndex (t246): the bounded-heap
    // top-51 replayed as a window cut (ties at the boundary share a
    // value, so the arbitrary row choice cannot move the statistic),
    // per-term micro-rounded BIGINT log sum, alpha one divide
    "t246_hill_tail" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |    AND CAST(round(value*100) AS BIGINT) > 0
        |), r AS (
        |  SELECT event_type, cents, row_number() OVER (
        |    PARTITION BY event_type ORDER BY cents DESC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_rows
        |  FROM e
        |), kk AS (
        |  SELECT r.event_type, r.cents, r.n_rows, t.cents AS tail
        |  FROM r JOIN (SELECT event_type, cents FROM r WHERE rn = 51) t
        |    ON t.event_type = r.event_type
        |  WHERE r.rn <= 50
        |), s AS (
        |  SELECT event_type, CAST(max(n_rows) AS BIGINT) AS n_rows,
        |    CAST(max(tail) AS BIGINT) AS x_k1,
        |    CAST(sum(CAST(round(ln(CAST(cents AS DOUBLE) / tail) * 1e6)
        |      AS BIGINT)) AS BIGINT) AS lsum
        |  FROM kk GROUP BY event_type
        |)
        |SELECT event_type, n_rows, 50 AS k, x_k1,
        |  CASE WHEN lsum > 0
        |    THEN round(50 / (CAST(lsum AS DOUBLE) / 1e6), 6) END
        |    AS hill_alpha
        |FROM s ORDER BY event_type""".stripMargin,

    // exact mirror of CorpusStats.tokenizerFertility (t244): the t49
    // BPE-ish regexp token count + the shared filtered whitespace
    // split, four exact BIGINT sums per lang, two divides
    "t244_token_fertility" ->
      """WITH w AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split_regex(lower(text),
        |      '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS BIGINT) AS words,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS BIGINT)
        |      AS bpe,
        |    CAST(length(text) AS BIGINT) AS chars
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(words) AS BIGINT) AS n_words,
        |  CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
        |  CAST(sum(chars) AS BIGINT) AS n_chars,
        |  CASE WHEN sum(words) > 0 THEN
        |    round(CAST(CAST(sum(bpe) AS BIGINT) AS DOUBLE)
        |          / CAST(sum(words) AS BIGINT), 6) END AS fertility,
        |  CASE WHEN sum(bpe) > 0 THEN
        |    round(CAST(CAST(sum(chars) AS BIGINT) AS DOUBLE)
        |          / CAST(sum(bpe) AS BIGINT), 6) END AS chars_per_token
        |FROM w GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // exact mirror of CorpusStats.sourceOverlapMatrix (t243):
    // per-source distinct 3-gram digests (the t212 48-bit md5
    // convention), digest-keyed intersection self-join, Jaccard +
    // overlap coefficient one divide each. Tokens are UNFILTERED —
    // the t2 replay convention: TextDedup.tokens keeps boundary empty
    // tokens (Spark split limit −1), so the oracle must too, or any
    // document with leading whitespace would shift the gram set
    "t243_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, string_split_regex(lower(text),
        |    '[ \t\n\x0B\f\r]+') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), grams AS (
        |  SELECT source, unnest(
        |    CASE WHEN len(t) < 3 THEN list_value(array_to_string(t, ' '))
        |    ELSE list_transform(range(len(t) - 2),
        |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END) AS g
        |  FROM toks
        |), sh AS (
        |  SELECT DISTINCT source,
        |         CAST('0x' || substr(md5(g), 1, 12) AS BIGINT) AS h
        |  FROM grams
        |), cnt AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM sh GROUP BY source
        |), inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |         CAST(count(*) AS BIGINT) AS n_shared
        |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT i.source_a, i.source_b, ca.n AS n_a, cb.n AS n_b,
        |  i.n_shared,
        |  round(CAST(i.n_shared AS DOUBLE)
        |        / (ca.n + cb.n - i.n_shared), 6) AS jaccard,
        |  round(CAST(i.n_shared AS DOUBLE) / least(ca.n, cb.n), 6)
        |    AS overlap_coef
        |FROM inter i JOIN cnt ca ON ca.source = i.source_a
        |             JOIN cnt cb ON cb.source = i.source_b
        |ORDER BY i.source_a, i.source_b""".stripMargin,

    // exact mirror of t177 (t4's Jaccard >= 0.5 shortlist over exact
    // reps, then TextDedup.editDistanceVerify): the same length
    // quick-reject (with the 1e-6 slack) precedes the standard-DP
    // levenshtein on both engines; sim judged on the 6dp boundary.
    "t177_edit_verify" ->
      """WITH reps AS (
        |  SELECT min(doc_id) AS id, text FROM documents GROUP BY text
        |), toks AS (
        |  SELECT id, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')
        |           AS t
        |  FROM reps
        |), sets AS (
        |  SELECT id, list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END)
        |    AS sh
        |  FROM toks
        |), posting AS (
        |  SELECT id, unnest(sh) AS s FROM sets
        |), grouped AS (
        |  SELECT s, array_agg(id) AS ids FROM posting GROUP BY s
        |  HAVING count(*) BETWEEN 2 AND 10
        |), cands AS (
        |  SELECT DISTINCT la.a AS id_a, lb.b AS id_b
        |  FROM grouped, UNNEST(ids) la(a), UNNEST(ids) lb(b)
        |  WHERE lb.b > la.a
        |), shortlist AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cands c
        |  JOIN sets sa ON sa.id = c.id_a
        |  JOIN sets sb ON sb.id = c.id_b
        |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        |          / len(list_distinct(sa.sh || sb.sh)) >= 0.5
        |), verified AS (
        |  SELECT p.id_a, p.id_b,
        |         CAST(levenshtein(ra.text, rb.text) AS BIGINT) AS dist,
        |         CAST(greatest(length(ra.text), length(rb.text))
        |           AS BIGINT) AS max_len
        |  FROM shortlist p
        |  JOIN reps ra ON ra.id = p.id_a
        |  JOIN reps rb ON rb.id = p.id_b
        |  WHERE 1.0 - abs(length(ra.text) - length(rb.text))
        |          / CAST(greatest(length(ra.text), length(rb.text))
        |                 AS DOUBLE)
        |        >= 0.8 - 0.000001
        |)
        |SELECT id_a, id_b, dist, max_len,
        |       round(1.0 - CAST(dist AS DOUBLE) / max_len, 6) AS sim
        |FROM verified
        |WHERE round(1.0 - CAST(dist AS DOUBLE) / max_len, 6) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // exact mirror of t178 (Trend.rollingCorrelation over daily
    // click/purchase counts): five exact BIGINT window moments per
    // trailing 7-day frame, one closed-form r with a single sqrt;
    // only complete windows emit, degenerate windows yield NULL.
    "t178_rolling_corr" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1
        |), w AS (
        |  SELECT day, x, y,
        |    CAST(count(*) OVER win AS BIGINT) AS n,
        |    CAST(sum(x) OVER win AS BIGINT) AS sx,
        |    CAST(sum(y) OVER win AS BIGINT) AS sy,
        |    CAST(sum(x*y) OVER win AS BIGINT) AS sxy,
        |    CAST(sum(x*x) OVER win AS BIGINT) AS sxx,
        |    CAST(sum(y*y) OVER win AS BIGINT) AS syy
        |  FROM d
        |  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND
        |                 CURRENT ROW)
        |)
        |SELECT day, x, y,
        |  CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
        |    round(CAST(n*sxy - sx*sy AS DOUBLE)
        |      / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
        |             * CAST(n*syy - sy*sy AS DOUBLE)), 6)
        |  END AS r
        |FROM w WHERE n = 7 ORDER BY day""".stripMargin,

    // exact mirror of t179 (TextAnalysis.readabilityReport): the
    // defined portable proxies (nonempty whitespace tokens, [.!?]+
    // runs min 1, [aeiouy]+ runs min 1), per-doc BIGINT micro score,
    // order-independent mean.
    "t179_readability" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(lower(text),
        |      '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS BIGINT) AS w,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      AS BIGINT) AS snt,
        |    CAST(greatest(len(regexp_extract_all(lower(text),
        |      '[aeiouy]+')), 1) AS BIGINT) AS syl
        |  FROM documents WHERE text IS NOT NULL
        |), scored AS (
        |  SELECT source,
        |    CAST(round((206.835 - 1.015 * (CAST(w AS DOUBLE) / snt)
        |               - 84.6 * (CAST(syl AS DOUBLE) / w))
        |      * 1000000.0) AS BIGINT) AS micro
        |  FROM d WHERE w > 0
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(micro) AS DOUBLE) / count(*) / 1000000.0, 6)
        |    AS flesch_avg
        |FROM scored GROUP BY source ORDER BY source""".stripMargin,

    // exact mirror of t180 (Profiling.fdAudit x 4): (lhs, rhs)
    // counts, per-lhs majority mass, confidence = sum(max)/N, holds
    // when no lhs group has > 1 distinct rhs.
    "t180_fd_audit" ->
      """WITH pairs AS (
        |  SELECT 'doc->source' AS fd, CAST(doc_id AS VARCHAR) AS lhs,
        |         CAST(source AS VARCHAR) AS rhs FROM documents
        |  UNION ALL
        |  SELECT 'lang->source', CAST(lang AS VARCHAR),
        |         CAST(source AS VARCHAR) FROM documents
        |  UNION ALL
        |  SELECT 'source->lang', CAST(source AS VARCHAR),
        |         CAST(lang AS VARCHAR) FROM documents
        |  UNION ALL
        |  SELECT 'user->type', CAST(user_id AS VARCHAR),
        |         CAST(event_type AS VARCHAR) FROM events
        |), c AS (
        |  SELECT fd, lhs, rhs, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs GROUP BY 1, 2, 3
        |), g AS (
        |  SELECT fd, lhs, CAST(sum(n) AS BIGINT) AS tot,
        |         CAST(max(n) AS BIGINT) AS mx,
        |         CAST(count(*) AS BIGINT) AS k
        |  FROM c GROUP BY 1, 2
        |)
        |SELECT fd, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  CAST(sum(tot) AS BIGINT) AS n_rows,
        |  round(CAST(sum(mx) AS DOUBLE) / sum(tot), 6) AS confidence,
        |  sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0 AS holds
        |FROM g GROUP BY fd ORDER BY fd""".stripMargin,

    // exact mirror of t181 (TextAnalysis.llrCollocations): adjacent
    // bigrams, the three margin counts, Dunning's G^2 term-for-term
    // (x ln x of exact BIGINTs), min count 20, top-50 deterministic.
    "t181_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text),
        |    '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), bg AS (
        |  SELECT t[i+1] AS w1, t[i+2] AS w2
        |  FROM toks, UNNEST(range(len(t) - 1)) g(i)
        |  WHERE len(t) >= 2
        |), c12 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS k
        |  FROM bg GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, CAST(count(*) AS BIGINT) AS n1 FROM bg GROUP BY 1
        |), c2 AS (
        |  SELECT w2, CAST(count(*) AS BIGINT) AS n2 FROM bg GROUP BY 1
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg),
        |m AS (
        |  SELECT c12.w1, c12.w2, c12.k AS n12, c1.n1, c2.n2, nn.n,
        |    c12.k AS k11, c1.n1 - c12.k AS k12, c2.n2 - c12.k AS k21,
        |    nn.n - c1.n1 - c2.n2 + c12.k AS k22
        |  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nn
        |  WHERE c12.k >= 20
        |)
        |SELECT w1, w2, n12, n1, n2,
        |  round(2.0 * ((CASE WHEN k11 > 0
        |      THEN k11 * ln(CAST(k11 AS DOUBLE)) ELSE 0 END
        |    + CASE WHEN k12 > 0
        |      THEN k12 * ln(CAST(k12 AS DOUBLE)) ELSE 0 END
        |    + CASE WHEN k21 > 0
        |      THEN k21 * ln(CAST(k21 AS DOUBLE)) ELSE 0 END
        |    + CASE WHEN k22 > 0
        |      THEN k22 * ln(CAST(k22 AS DOUBLE)) ELSE 0 END)
        |    - (CASE WHEN n1 > 0
        |       THEN n1 * ln(CAST(n1 AS DOUBLE)) ELSE 0 END
        |       + CASE WHEN n - n1 > 0
        |         THEN (n - n1) * ln(CAST(n - n1 AS DOUBLE)) ELSE 0 END
        |       + CASE WHEN n2 > 0
        |         THEN n2 * ln(CAST(n2 AS DOUBLE)) ELSE 0 END
        |       + CASE WHEN n - n2 > 0
        |         THEN (n - n2) * ln(CAST(n - n2 AS DOUBLE)) ELSE 0 END)
        |    + n * ln(CAST(n AS DOUBLE))), 6) AS llr
        |FROM m ORDER BY llr DESC, w1, w2 LIMIT 50""".stripMargin,

    // exact mirror of t182 (Trend.dispersionIndex over daily type
    // counts): BIGINT moments, sample variance / mean, flag on the
    // unrounded D.
    "t182_dispersion" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x*x) AS BIGINT) AS sxx
        |  FROM d GROUP BY 1
        |)
        |SELECT event_type, n, sx AS total,
        |  round(CAST(sx AS DOUBLE) / n, 6) AS mean_daily,
        |  round(CAST(n*sxx - sx*sx AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * (n-1))
        |        / (CAST(sx AS DOUBLE) / n), 6) AS dispersion,
        |  CAST(n*sxx - sx*sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n-1))
        |    / (CAST(sx AS DOUBLE) / n) > 1.5 AS overdispersed
        |FROM m WHERE n >= 2 AND sx > 0
        |ORDER BY event_type""".stripMargin,

    // exact mirror of t183 (Similarity.cosineProfile over neighbor
    // pairs vec 2i / 2i+1): sequential-accumulation cosine, BIGINT
    // micro values, exact integer moment sums (HUGEINT here, DECIMAL
    // on the engine), doubles only in the final mean/std.
    "t183_cosine_profile" ->
      """WITH p AS (
        |  SELECT a.vec_id AS id_a,
        |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[])) AS c
        |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |  WHERE a.vec_id % 2 = 0
        |), s AS (
        |  SELECT least(greatest(CAST(floor(c * 10) AS BIGINT), -10), 9)
        |           AS bin,
        |         CAST(round(c * 1000000.0) AS BIGINT) AS micro
        |  FROM p
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(micro) AS BIGINT) AS sm,
        |         CAST(sum(micro * micro) AS BIGINT) AS smm
        |  FROM s
        |)
        |SELECT s.bin, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(count(*) AS DOUBLE) / tot.n, 6) AS share,
        |  round(CAST(tot.sm AS DOUBLE) / tot.n / 1000000.0, 6)
        |    AS mean_cos,
        |  round(sqrt((CAST(tot.smm AS DOUBLE)
        |              - CAST(tot.sm AS DOUBLE) * tot.sm / tot.n)
        |             / tot.n) / 1000000.0, 6) AS std_cos
        |FROM s CROSS JOIN tot
        |GROUP BY s.bin, tot.n, tot.sm, tot.smm
        |ORDER BY s.bin""".stripMargin,

    // exact mirror of t184 (Profiling.weightedQuantiles on lineitem):
    // (flag, price) blocks with BIGINT weight sums, integer rank
    // tests cw*k >= tw*m, left-continuous selected data values.
    "t184_weighted_quantiles" ->
      """WITH l AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS v,
        |         CAST(l_quantity AS BIGINT) AS wt
        |  FROM lineitem
        |), blocks AS (
        |  SELECT flag, v, CAST(sum(wt) AS BIGINT) AS w FROM l GROUP BY 1, 2
        |), tot AS (
        |  SELECT flag, CAST(sum(w) AS BIGINT) AS tw FROM blocks GROUP BY 1
        |), cum AS (
        |  SELECT b.flag, b.v, t.tw,
        |    CAST(sum(b.w) OVER (PARTITION BY b.flag ORDER BY b.v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
        |  FROM blocks b JOIN tot t USING (flag)
        |)
        |SELECT flag, max(tw) AS total_weight,
        |  min(CASE WHEN cw * 4 >= tw THEN v END) AS p25,
        |  min(CASE WHEN cw * 2 >= tw THEN v END) AS p50,
        |  min(CASE WHEN cw * 4 >= tw * 3 THEN v END) AS p75
        |FROM cum GROUP BY flag ORDER BY flag""".stripMargin,

    // exact mirror of Behavior.sessionize (t185): 6 h gap, (ts, id)
    // order, strict-gt break, 1-based running break count; every
    // output column exact BIGINT via epoch_us
    "t185_sessions" ->
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |                   OR us - prev_us > CAST(21600 AS BIGINT)*1000000
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM o
        |), s AS (
        |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_no
        |  FROM f
        |)
        |SELECT user_id, session_no, CAST(count(*) AS BIGINT) AS n_events,
        |       min(us) AS start_us, max(us) - min(us) AS duration_us,
        |       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_no""".stripMargin,

    // exact mirror of Agreement.fleissKappa (t186) over the three
    // deterministic raters; kappa as one division of exact integer
    // products (HUGEINT here, DECIMAL(38,0) engine-side), P_e = 1
    // degenerate pinned to 1.0 on both sides
    "t186_fleiss" ->
      """WITH r AS (
        |  SELECT doc_id AS item, source AS grp,
        |         CASE WHEN len(string_split(text, ' ')) >= 56
        |              THEN 'keep' ELSE 'drop' END AS category
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, source,
        |         CASE WHEN length(text) >= 306 THEN 'keep' ELSE 'drop' END
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, source,
        |         CASE WHEN len(list_filter(string_split(text, ' '),
        |                x -> x = 'the' OR x = 'a')) >= 4
        |              THEN 'keep' ELSE 'drop' END
        |  FROM documents
        |), cell AS (
        |  SELECT grp, item, category, CAST(count(*) AS BIGINT) AS c
        |  FROM r GROUP BY 1, 2, 3
        |), peri AS (
        |  SELECT grp, item, sum(c*c) AS s2, sum(c) AS n
        |  FROM cell GROUP BY 1, 2
        |), ag AS (
        |  SELECT grp, CAST(sum(s2 - n) AS BIGINT) AS a,
        |         CAST(count(*) AS BIGINT) AS n_items,
        |         CAST(max(n) AS BIGINT) AS n_raters
        |  FROM peri GROUP BY 1
        |), cm AS (
        |  SELECT grp, CAST(sum(bj*bj) AS BIGINT) AS cc
        |  FROM (SELECT grp, category, sum(c) AS bj
        |        FROM cell GROUP BY 1, 2) GROUP BY 1
        |)
        |SELECT ag.grp AS source, n_items, n_raters,
        |  CASE WHEN CAST(n_items*n_raters AS HUGEINT)
        |            * (n_items*n_raters) = cc THEN 1.0
        |  ELSE round(CAST(CAST(a AS HUGEINT)
        |           * (n_items*n_raters) * (n_items*n_raters)
        |           - CAST(cc AS HUGEINT)
        |           * n_items*n_raters*(n_raters-1) AS DOUBLE)
        |       / CAST(CAST(n_items*n_raters*(n_raters-1) AS HUGEINT)
        |           * (CAST(n_items*n_raters AS HUGEINT)
        |              * (n_items*n_raters) - cc) AS DOUBLE), 6)
        |  END AS kappa
        |FROM ag JOIN cm ON ag.grp = cm.grp
        |ORDER BY source""".stripMargin,

    // exact mirror of Privacy.tClosenessAudit (t187): ordered EMD on
    // the global 50.00-cents-bin domain; HUGEINT cumulative products,
    // verdict on the 6dp-rounded emd, strict t = 0.008
    "t187_t_closeness" ->
      """WITH t AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |           AS dow,
        |         CAST(floor(CAST(round(value*100) AS BIGINT) / 5000)
        |           AS BIGINT) AS bin
        |  FROM events WHERE value IS NOT NULL
        |), gb AS (
        |  SELECT event_type, dow, bin, CAST(count(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2, 3
        |), ab AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS ca FROM t GROUP BY 1
        |), gn AS (
        |  SELECT event_type, dow, CAST(sum(c) AS BIGINT) AS ng
        |  FROM gb GROUP BY 1, 2
        |), an AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na,
        |         CAST(count(*) AS BIGINT) AS m FROM ab
        |), grid AS (
        |  SELECT g.event_type, g.dow, g.ng, a.bin, coalesce(gb.c, 0) AS c,
        |         a.ca
        |  FROM gn g CROSS JOIN ab a
        |  LEFT JOIN gb ON gb.event_type = g.event_type
        |              AND gb.dow = g.dow AND gb.bin = a.bin
        |), cum AS (
        |  SELECT event_type, dow, ng, bin,
        |         sum(c)  OVER (PARTITION BY event_type, dow
        |                       ORDER BY bin) AS cg,
        |         sum(ca) OVER (PARTITION BY event_type, dow
        |                       ORDER BY bin) AS cal
        |  FROM grid
        |), emds AS (
        |  SELECT c.event_type, c.dow, max(c.ng) AS n,
        |         round(CASE WHEN max(an.m) > 1 THEN
        |           CAST(sum(abs(CAST(c.cg AS HUGEINT) * an.na
        |                 - CAST(c.cal AS HUGEINT) * c.ng)) AS DOUBLE)
        |           / CAST(CAST(max(c.ng) AS HUGEINT) * max(an.na)
        |                 * (max(an.m) - 1) AS DOUBLE)
        |           ELSE 0.0 END, 6) AS emd
        |  FROM cum c CROSS JOIN an
        |  GROUP BY c.event_type, c.dow
        |)
        |SELECT event_type, dow, n, emd, (emd <= 0.008) AS t_close
        |FROM emds ORDER BY event_type, dow""".stripMargin,

    // exact mirror of Profiling.robustOutliers (t188): left-continuous
    // median/MAD of value cents, pure-integer modified-z flag
    // |x-med|*10000 > 51891*MAD
    "t188_robust_outliers" ->
      """WITH t AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |), vc AS (
        |  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, cents,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY cents
        |           ROWS UNBOUNDED PRECEDING) AS cw,
        |         sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM vc
        |), med AS (
        |  SELECT event_type, min(cents) AS med,
        |         CAST(max(n) AS BIGINT) AS n
        |  FROM cum WHERE 2*cw >= n GROUP BY 1
        |), dc AS (
        |  SELECT vc.event_type, abs(vc.cents - med.med) AS d,
        |         CAST(sum(vc.c) AS BIGINT) AS c
        |  FROM vc JOIN med ON vc.event_type = med.event_type
        |  GROUP BY 1, 2
        |), dcum AS (
        |  SELECT event_type, d,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY d
        |           ROWS UNBOUNDED PRECEDING) AS cw,
        |         sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM dc
        |), mad AS (
        |  SELECT event_type, min(d) AS mad
        |  FROM dcum WHERE 2*cw >= n GROUP BY 1
        |)
        |SELECT med.event_type, med.n, med.med AS med,
        |       mad.mad AS mad,
        |       CAST(sum(CASE WHEN abs(vc.cents - med.med)*10000
        |                      > 51891*mad.mad THEN vc.c ELSE 0 END)
        |         AS BIGINT) AS n_outliers,
        |       round(CAST(sum(CASE WHEN abs(vc.cents - med.med)*10000
        |                      > 51891*mad.mad THEN vc.c ELSE 0 END)
        |         AS DOUBLE) / CAST(med.n AS DOUBLE), 6) AS outlier_frac
        |FROM vc JOIN med ON vc.event_type = med.event_type
        |        JOIN mad ON vc.event_type = mad.event_type
        |GROUP BY med.event_type, med.n, med.med, mad.mad
        |ORDER BY med.event_type""".stripMargin,

    // exact mirror of Trend.autocorrelation (t189) on the zero-filled
    // day grid: mean multiplied away (y = n*x - S), HUGEINT moment
    // sums (DECIMAL(38,0) engine-side), one double divide at 6dp
    "t189_acf" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), bounds AS (
        |  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT b.event_type, b.d0 + g.i AS d, coalesce(daily.x, 0) AS x
        |  FROM bounds b
        |  CROSS JOIN LATERAL (SELECT unnest(range(0, b.d1 - b.d0 + 1)) AS i) g
        |  LEFT JOIN daily ON daily.event_type = b.event_type
        |                 AND daily.d = b.d0 + g.i
        |), st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS s
        |  FROM grid GROUP BY 1
        |), c AS (
        |  SELECT g.event_type, g.d, CAST(st.n * g.x - st.s AS BIGINT) AS y
        |  FROM grid g JOIN st USING (event_type)
        |), lagged AS (
        |  SELECT event_type, y,
        |    lag(y, 1) OVER w AS y1, lag(y, 2) OVER w AS y2,
        |    lag(y, 3) OVER w AS y3, lag(y, 4) OVER w AS y4,
        |    lag(y, 5) OVER w AS y5, lag(y, 6) OVER w AS y6,
        |    lag(y, 7) OVER w AS y7
        |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY d)
        |), agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    sum(CAST(y AS HUGEINT) * y) AS den,
        |    sum(CAST(y AS HUGEINT) * y1) AS m1,
        |    sum(CAST(y AS HUGEINT) * y2) AS m2,
        |    sum(CAST(y AS HUGEINT) * y3) AS m3,
        |    sum(CAST(y AS HUGEINT) * y4) AS m4,
        |    sum(CAST(y AS HUGEINT) * y5) AS m5,
        |    sum(CAST(y AS HUGEINT) * y6) AS m6,
        |    sum(CAST(y AS HUGEINT) * y7) AS m7
        |  FROM lagged GROUP BY 1
        |)
        |SELECT event_type, CAST(l.lag AS BIGINT) AS lag, n_days,
        |  round(CAST(CASE l.lag WHEN 1 THEN m1 WHEN 2 THEN m2
        |    WHEN 3 THEN m3 WHEN 4 THEN m4 WHEN 5 THEN m5 WHEN 6 THEN m6
        |    WHEN 7 THEN m7 END AS DOUBLE)
        |    / CAST(nullif(den, 0) AS DOUBLE), 6) AS acf
        |FROM agg CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) l(lag)
        |ORDER BY event_type, lag""".stripMargin,

    // exact mirror of Eval.kruskalWallis (t190): BIGINT doubled rank
    // sums, micro-unit term sums (order-independent), the shared chi2
    // critical literals, C <= 0 degenerate -> NULL h / false flag
    "t190_kruskal_wallis" ->
      """WITH t AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |           AS dow,
        |         event_type AS trt, value AS s
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |), cell AS (
        |  SELECT dow, trt, s, CAST(count(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2, 3
        |), vb AS (
        |  SELECT dow, s, CAST(sum(c) AS BIGINT) AS tv FROM cell GROUP BY 1, 2
        |), vb2 AS (
        |  SELECT dow, s, tv,
        |    coalesce(CAST(sum(tv) OVER (PARTITION BY dow ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS bef
        |  FROM vb
        |), rg AS (
        |  SELECT c.dow, c.trt, CAST(sum(c.c) AS BIGINT) AS ng,
        |         CAST(sum(c.c * (2 * v.bef + v.tv + 1)) AS BIGINT) AS r2
        |  FROM cell c JOIN vb2 v ON c.dow = v.dow AND c.s = v.s
        |  GROUP BY 1, 2
        |), nn AS (
        |  SELECT dow, CAST(count(*) AS BIGINT) AS k,
        |         CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
        |      / CAST(4 * ng AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT)
        |      AS amicro
        |  FROM rg GROUP BY 1 HAVING count(*) >= 2
        |), tie AS (
        |  SELECT dow, CAST(sum(tv * tv * tv - tv) AS BIGINT) AS tsum
        |  FROM vb GROUP BY 1
        |), res AS (
        |  SELECT nn.dow, nn.k, nn.n,
        |    CASE WHEN (1.0 - CAST(tsum AS DOUBLE)
        |           / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
        |              * CAST(nn.n AS DOUBLE) - CAST(nn.n AS DOUBLE))) > 0
        |    THEN (12.0 * (CAST(amicro AS DOUBLE) / 1000000.0)
        |            / (CAST(nn.n AS DOUBLE) * CAST(nn.n + 1 AS DOUBLE))
        |          - 3.0 * CAST(nn.n + 1 AS DOUBLE))
        |         / (1.0 - CAST(tsum AS DOUBLE)
        |            / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
        |               * CAST(nn.n AS DOUBLE) - CAST(nn.n AS DOUBLE)))
        |    END AS h_raw,
        |    CASE WHEN nn.k - 1 <= 30 THEN
        |      [3.841458821, 5.991464547, 7.814727903, 9.487729037, 11.070497694,
        |       12.591587244, 14.067140449, 15.507313056, 16.918977605, 18.307038053,
        |       19.675137573, 21.026069817, 22.362032495, 23.684791305, 24.99579014,
        |       26.296227605, 27.587111638, 28.86929943, 30.143527206, 31.410432844,
        |       32.670573341, 33.924438471, 35.172461627, 36.415028502, 37.652484133,
        |       38.88513866, 40.113272069, 41.337138151, 42.556967804, 43.772971826]
        |      [nn.k - 1]
        |    ELSE (nn.k - 1) * pow(1.0 - 2.0/(9.0*(nn.k - 1))
        |         + 1.6448536269514722 * sqrt(2.0/(9.0*(nn.k - 1))), 3)
        |    END AS crit
        |  FROM nn JOIN tie USING (dow)
        |)
        |SELECT dow, k, n, round(h_raw, 6) AS h, round(crit, 6) AS h_crit,
        |       coalesce(h_raw > crit, FALSE) AS significant
        |FROM res ORDER BY dow""".stripMargin,

    // exact mirror of Trend.theilSen (t191): pairwise slopes are one
    // IEEE divide of exact integers; both medians are left-continuous
    // SELECTIONS (2*cum >= n over distinct-value blocks), 6dp display
    "t191_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), bounds AS (
        |  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT b.event_type, g.i AS d, coalesce(daily.x, 0) AS x
        |  FROM bounds b
        |  CROSS JOIN LATERAL (SELECT unnest(range(0, b.d1 - b.d0 + 1)) AS i) g
        |  LEFT JOIN daily ON daily.event_type = b.event_type
        |                 AND daily.d = b.d0 + g.i
        |), pairs AS (
        |  SELECT a.event_type,
        |         CAST(b.x - a.x AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
        |           AS slope
        |  FROM grid a JOIN grid b
        |    ON a.event_type = b.event_type AND b.d > a.d
        |), sc AS (
        |  SELECT event_type, slope, CAST(count(*) AS BIGINT) AS c
        |  FROM pairs GROUP BY 1, 2
        |), scum AS (
        |  SELECT event_type, slope,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY slope
        |      ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(c) OVER (PARTITION BY event_type) AS np
        |  FROM sc
        |), med AS (
        |  SELECT event_type, min(slope) AS sl,
        |         CAST(max(np) AS BIGINT) AS n_pairs
        |  FROM scum WHERE 2 * cw >= np GROUP BY 1
        |), ic AS (
        |  SELECT g.event_type,
        |         CAST(g.x AS DOUBLE) - m.sl * CAST(g.d AS DOUBLE) AS iv
        |  FROM grid g JOIN med m USING (event_type)
        |), icc AS (
        |  SELECT event_type, iv, CAST(count(*) AS BIGINT) AS c
        |  FROM ic GROUP BY 1, 2
        |), iccum AS (
        |  SELECT event_type, iv,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY iv
        |      ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(c) OVER (PARTITION BY event_type) AS nd
        |  FROM icc
        |), imed AS (
        |  SELECT event_type, min(iv) AS ic, CAST(max(nd) AS BIGINT) AS n_days
        |  FROM iccum WHERE 2 * cw >= nd GROUP BY 1
        |)
        |SELECT m.event_type, n_days, n_pairs, round(m.sl, 6) AS slope,
        |       round(i.ic, 6) AS intercept
        |FROM med m JOIN imed i USING (event_type)
        |ORDER BY m.event_type""".stripMargin,

    // exact mirror of Graph.triangleStats (t192) on the co-purchase
    // graph: degree-ordered orientation, wedge-closure join; integer
    // division keeps the wedge count exact past 2^53
    "t192_triangles" ->
      """WITH e0 AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |), deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1
        |), ed AS (
        |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
        |              THEN u ELSE v END AS s,
        |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
        |              THEN v ELSE u END AS t
        |  FROM e0 JOIN deg du ON du.node = e0.u
        |          JOIN deg dv ON dv.node = e0.v
        |), tri AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM ed e1 JOIN ed e2 ON e1.t = e2.s
        |       JOIN ed e3 ON e3.s = e1.s AND e3.t = e2.t
        |), wed AS (
        |  SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
        |         CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM deg
        |), ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e0)
        |SELECT n_nodes, n_edges, n_triangles, n_wedges,
        |  CASE WHEN n_wedges > 0 THEN
        |    round(3.0 * CAST(n_triangles AS DOUBLE)
        |          / CAST(n_wedges AS DOUBLE), 6) END AS global_cc
        |FROM wed CROSS JOIN ne CROSS JOIN tri""".stripMargin,

    // exact mirror of Eval.spearman (t193): midrank Pearson over
    // (flag, qty, price-cents) cells — doubled rank blocks
    // 2R = 2·bef + tv + 1 per marginal, HUGEINT moments (the engine's
    // DECIMAL(38,0)), one double expression at the 6dp boundary
    "t193_spearman" ->
      """WITH base AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
        |         CAST(round(l_extendedprice*100) AS BIGINT) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |), cells AS (
        |  SELECT flag, x, y, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1,2,3
        |), xb AS (
        |  SELECT flag, x, CAST(sum(c) AS BIGINT) AS tv,
        |         CAST(coalesce(sum(sum(c)) OVER (PARTITION BY flag
        |           ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           1 PRECEDING), 0) AS BIGINT) AS bef
        |  FROM cells GROUP BY flag, x
        |), yb AS (
        |  SELECT flag, y, CAST(sum(c) AS BIGINT) AS tv,
        |         CAST(coalesce(sum(sum(c)) OVER (PARTITION BY flag
        |           ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           1 PRECEDING), 0) AS BIGINT) AS bef
        |  FROM cells GROUP BY flag, y
        |), joined AS (
        |  SELECT c.flag, c.c,
        |         CAST(2*xb.bef + xb.tv + 1 AS HUGEINT) AS a,
        |         CAST(2*yb.bef + yb.tv + 1 AS HUGEINT) AS b
        |  FROM cells c JOIN xb ON xb.flag = c.flag AND xb.x = c.x
        |               JOIN yb ON yb.flag = c.flag AND yb.y = c.y
        |), m AS (
        |  SELECT flag, CAST(sum(c) AS BIGINT) AS n,
        |         sum(c*a) AS sa, sum(c*b) AS sb, sum(c*a*b) AS sab,
        |         sum(c*a*a) AS saa, sum(c*b*b) AS sbb
        |  FROM joined GROUP BY flag
        |)
        |SELECT flag, n,
        |  CASE WHEN (n*saa - sa*sa) > 0 AND (n*sbb - sb*sb) > 0 THEN
        |    round(CAST(n*sab - sa*sb AS DOUBLE)
        |      / sqrt(CAST(n*saa - sa*sa AS DOUBLE)
        |             * CAST(n*sbb - sb*sb AS DOUBLE)), 6)
        |  END AS rho
        |FROM m ORDER BY flag""".stripMargin,

    // exact mirror of t194 (Blocking.sortedNeighborhoodCandidates +
    // TextDedup.jaroWinklerVerify): SNM candidates in min-shingle-
    // digest order, then DuckDB's native jaro_winkler_similarity —
    // the engine kernel is bit-identical to it (byte alphabet, boost
    // threshold 0.7, 4-byte prefix cap, either-empty ⇒ 0)
    "t194_jw_verify" ->
      """WITH reps AS (
        |  SELECT min(doc_id) AS id, text FROM documents
        |  WHERE text IS NOT NULL GROUP BY text
        |), toks AS (
        |  SELECT id, list_filter(string_split_regex(lower(text),
        |    '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM reps
        |), sets AS (
        |  SELECT id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END
        |    AS sh
        |  FROM toks
        |), keyed AS (
        |  SELECT s.id, list_aggregate(list_transform(s.sh,
        |      x -> CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)), 'min')
        |    AS mkey
        |  FROM sets s
        |), ranked AS (
        |  SELECT id, CAST(row_number() OVER (ORDER BY mkey, id)
        |    AS BIGINT) - 1 AS rk
        |  FROM keyed
        |), pairs AS (
        |  SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
        |  FROM ranked a JOIN ranked b ON b.rk BETWEEN a.rk+1 AND a.rk+3
        |)
        |SELECT p.id_a, p.id_b,
        |       round(jaro_winkler_similarity(ra.text, rb.text), 6) AS jw,
        |       round(jaro_winkler_similarity(ra.text, rb.text), 6) >= 0.9
        |         AS accept
        |FROM pairs p JOIN reps ra ON ra.id = p.id_a
        |             JOIN reps rb ON rb.id = p.id_b
        |ORDER BY id_a, id_b""".stripMargin,

    // exact mirror of Eval.isotonicCalibration (t195): the closed
    // minimax PAV form over the t162 reliability bins — every
    // segment average is ONE IEEE divide of exact BIGINT cumulative
    // sums, min/max are selections, 6dp only at the output
    "t195_isotonic" ->
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |           AS dow,
        |         least(CAST(floor(value/500.0*10) AS BIGINT), 9) AS bin,
        |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL
        |), per_bin AS (
        |  SELECT dow, bin, CAST(count(*) AS BIGINT) AS n_b,
        |         CAST(sum(y) AS BIGINT) AS pos
        |  FROM e GROUP BY 1, 2
        |), cum AS (
        |  SELECT dow, bin, n_b, pos,
        |         CAST(sum(n_b) OVER w AS BIGINT) AS cn,
        |         CAST(sum(pos) OVER w AS BIGINT) AS cp
        |  FROM per_bin
        |  WINDOW w AS (PARTITION BY dow ORDER BY bin
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), seg AS (
        |  SELECT a.dow, a.bin AS j, b.bin AS k,
        |         CAST(b.cp - a.cp + a.pos AS DOUBLE)
        |           / CAST(b.cn - a.cn + a.n_b AS DOUBLE) AS avg_jk
        |  FROM cum a JOIN cum b ON a.dow = b.dow AND b.bin >= a.bin
        |), inner_min AS (
        |  SELECT s.dow, i.bin AS i, s.j, min(s.avg_jk) AS mn
        |  FROM seg s JOIN per_bin i
        |    ON i.dow = s.dow AND s.j <= i.bin AND s.k >= i.bin
        |  GROUP BY s.dow, i.bin, s.j
        |), iso AS (
        |  SELECT dow, i AS bin, max(mn) AS iso_raw
        |  FROM inner_min GROUP BY dow, i
        |)
        |SELECT p.dow, p.bin, p.n_b,
        |       round(CAST(p.pos AS DOUBLE) / p.n_b, 6) AS acc,
        |       round(i.iso_raw, 6) AS iso
        |FROM per_bin p JOIN iso i ON i.dow = p.dow AND i.bin = p.bin
        |ORDER BY p.dow, p.bin""".stripMargin,

    // exact mirror of Blocking.sortedNeighborhoodPairs (t196): SNM
    // candidates (same CTE chain as t194) + exact string-shingle-set
    // Jaccard — identical to the engine's 8-byte hash-set value
    // (collisions aside), one IEEE divide at the 6dp boundary
    "t196_snm_block" ->
      """WITH reps AS (
        |  SELECT min(doc_id) AS id, text FROM documents
        |  WHERE text IS NOT NULL GROUP BY text
        |), toks AS (
        |  SELECT id, list_filter(string_split_regex(lower(text),
        |    '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM reps
        |), sets AS (
        |  SELECT id, list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END)
        |    AS sh
        |  FROM toks
        |), keyed AS (
        |  SELECT s.id, list_aggregate(list_transform(s.sh,
        |      x -> CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)), 'min')
        |    AS mkey
        |  FROM sets s
        |), ranked AS (
        |  SELECT id, CAST(row_number() OVER (ORDER BY mkey, id)
        |    AS BIGINT) - 1 AS rk
        |  FROM keyed
        |), pairs AS (
        |  SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
        |  FROM ranked a JOIN ranked b ON b.rk BETWEEN a.rk+1 AND a.rk+3
        |), sims AS (
        |  SELECT p.id_a, p.id_b,
        |    round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        |      / len(list_distinct(sa.sh || sb.sh)), 6) AS jaccard
        |  FROM pairs p JOIN sets sa ON sa.id = p.id_a
        |               JOIN sets sb ON sb.id = p.id_b
        |)
        |SELECT id_a, id_b, jaccard FROM sims
        |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // exact mirror of Profiling.cramersV (t197): full r×c grid
    // (absent cells contribute expected mass), each χ² term
    // (o·n − cr·cc)²/(n·cr·cc) is one IEEE divide of exact HUGEINTs
    // (the engine's DECIMAL(38,0)) micro-rounded to BIGINT so the sum
    // is order-independent; V one closed-form double
    "t197_cramers_v" ->
      """WITH cells AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS mon, l_returnflag AS a,
        |         l_linestatus AS b, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2, 3
        |), rm AS (
        |  SELECT mon, a, CAST(sum(c) AS BIGINT) AS cr FROM cells GROUP BY 1,2
        |), cm AS (
        |  SELECT mon, b, CAST(sum(c) AS BIGINT) AS cc FROM cells GROUP BY 1,2
        |), tot AS (
        |  SELECT r.mon, r.n, r.n_rows, c.n_cols FROM
        |    (SELECT mon, CAST(sum(cr) AS BIGINT) AS n,
        |            CAST(count(*) AS BIGINT) AS n_rows FROM rm GROUP BY 1) r
        |    JOIN (SELECT mon, CAST(count(*) AS BIGINT) AS n_cols
        |          FROM cm GROUP BY 1) c ON c.mon = r.mon
        |), grid AS (
        |  SELECT rm.mon, rm.cr, cm.cc, coalesce(cells.c, 0) AS o, t.n
        |  FROM rm JOIN cm ON cm.mon = rm.mon
        |  LEFT JOIN cells ON cells.mon = rm.mon AND cells.a = rm.a
        |                 AND cells.b = cm.b
        |  JOIN tot t ON t.mon = rm.mon
        |), micro AS (
        |  SELECT mon, CAST(sum(CAST(round(
        |    CAST((CAST(o AS HUGEINT)*n - CAST(cr AS HUGEINT)*cc)
        |         * (CAST(o AS HUGEINT)*n - CAST(cr AS HUGEINT)*cc)
        |      AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT)*cr*cc AS DOUBLE)
        |    * 1000000.0) AS BIGINT)) AS BIGINT) AS chi2m
        |  FROM grid GROUP BY 1
        |)
        |SELECT t.mon, t.n, t.n_rows, t.n_cols,
        |  CASE WHEN least(t.n_rows, t.n_cols) - 1 > 0 THEN
        |    round(sqrt(CAST(m.chi2m AS DOUBLE) / 1e6
        |      / CAST(t.n * (least(t.n_rows, t.n_cols) - 1) AS DOUBLE)), 6)
        |  END AS v
        |FROM tot t JOIN micro m ON m.mon = t.mon
        |ORDER BY t.mon""".stripMargin,

    // exact mirror of Eval.kendallTauB (t198): BIGINT concordant /
    // discordant cell-product sums over the bounded 50×11 quantized
    // domain, integer-div tie terms, one double at the 6dp boundary
    "t198_kendall_tau" ->
      """WITH base AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
        |         CAST(round(l_discount*100) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        |), cells AS (
        |  SELECT flag, x, y, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1,2,3
        |), cd AS (
        |  SELECT a.flag,
        |    CAST(sum(CASE WHEN b.y > a.y THEN a.c*b.c ELSE 0 END)
        |      AS BIGINT) AS cc,
        |    CAST(sum(CASE WHEN b.y < a.y THEN a.c*b.c ELSE 0 END)
        |      AS BIGINT) AS dd
        |  FROM cells a JOIN cells b ON a.flag = b.flag AND b.x > a.x
        |  GROUP BY 1
        |), xm AS (
        |  SELECT flag, CAST(sum(cx) AS BIGINT) AS n,
        |         CAST(sum(cx*(cx-1)//2) AS BIGINT) AS t1 FROM (
        |    SELECT flag, x, CAST(sum(c) AS BIGINT) AS cx
        |    FROM cells GROUP BY 1,2)
        |  GROUP BY flag
        |), ym AS (
        |  SELECT flag, CAST(sum(cy*(cy-1)//2) AS BIGINT) AS t2 FROM (
        |    SELECT flag, y, CAST(sum(c) AS BIGINT) AS cy
        |    FROM cells GROUP BY 1,2)
        |  GROUP BY flag
        |)
        |SELECT x.flag, x.n,
        |  CASE WHEN (x.n*(x.n-1)//2 - x.t1) > 0
        |        AND (x.n*(x.n-1)//2 - y.t2) > 0 THEN
        |    round(CAST(cd.cc - cd.dd AS DOUBLE)
        |      / sqrt(CAST(x.n*(x.n-1)//2 - x.t1 AS DOUBLE)
        |             * CAST(x.n*(x.n-1)//2 - y.t2 AS DOUBLE)), 6)
        |  END AS tau_b
        |FROM xm x JOIN ym y ON y.flag = x.flag JOIN cd ON cd.flag = x.flag
        |ORDER BY x.flag""".stripMargin,

    // exact mirror of Profiling.skewKurtosis (t199) on the daily
    // event-volume series: mean multiplied away (y = n·x − S), m2/m3/
    // m4 exact HUGEINT sums, g1/g2 closed-form doubles
    "t199_skew_kurtosis" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS s
        |  FROM daily GROUP BY 1
        |), ys AS (
        |  SELECT d.event_type, st.n,
        |         CAST(st.n * d.x - st.s AS HUGEINT) AS y
        |  FROM daily d JOIN st ON st.event_type = d.event_type
        |), m AS (
        |  SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
        |         sum(y*y) AS m2, sum(y*y*y) AS m3, sum(y*y*y*y) AS m4
        |  FROM ys GROUP BY 1
        |)
        |SELECT event_type, n_days,
        |  CASE WHEN m2 > 0 THEN
        |    round(sqrt(CAST(n_days AS DOUBLE)) * CAST(m3 AS DOUBLE)
        |      / pow(CAST(m2 AS DOUBLE), 1.5), 6) END AS skewness,
        |  CASE WHEN m2 > 0 THEN
        |    round(CAST(n_days AS DOUBLE) * CAST(m4 AS DOUBLE)
        |      / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3.0, 6)
        |  END AS kurtosis
        |FROM m ORDER BY event_type""".stripMargin,

    // exact mirror of Graph.degreeAssortativity (t200) on the
    // co-purchase graph: Pearson over both edge orientations,
    // HUGEINT moments (the engine's DECIMAL(38,0))
    "t200_assortativity" ->
      """WITH e0 AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |), deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1
        |), dir AS (
        |  SELECT du.deg AS dx, dv.deg AS dy FROM e0
        |    JOIN deg du ON du.node = e0.u JOIN deg dv ON dv.node = e0.v
        |  UNION ALL
        |  SELECT dv.deg, du.deg FROM e0
        |    JOIN deg du ON du.node = e0.u JOIN deg dv ON dv.node = e0.v
        |), m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS mm,
        |         CAST(sum(dx) AS HUGEINT) AS sx,
        |         CAST(sum(dy) AS HUGEINT) AS sy,
        |         sum(CAST(dx AS HUGEINT)*dy) AS sxy,
        |         sum(CAST(dx AS HUGEINT)*dx) AS sxx,
        |         sum(CAST(dy AS HUGEINT)*dy) AS syy
        |  FROM dir
        |), nn AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg
        |)
        |SELECT nn.n_nodes, CAST(m.mm/2 AS BIGINT) AS n_edges,
        |  CASE WHEN (m.mm*m.sxx - m.sx*m.sx) > 0
        |        AND (m.mm*m.syy - m.sy*m.sy) > 0 THEN
        |    round(CAST(m.mm*m.sxy - m.sx*m.sy AS DOUBLE)
        |      / sqrt(CAST(m.mm*m.sxx - m.sx*m.sx AS DOUBLE)
        |             * CAST(m.mm*m.syy - m.sy*m.sy AS DOUBLE)), 6)
        |  END AS assortativity
        |FROM nn CROSS JOIN m""".stripMargin,

    // exact mirror of Basket.associationRules (t201): order-basket
    // supplier pair rules — each metric ONE IEEE divide of exact
    // integer products; rank by UNROUNDED lift then the id tiebreak
    "t201_basket_rules" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL
        |), tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM op),
        |ic AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM op GROUP BY 1),
        |pc AS (
        |  SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.s < b.s GROUP BY 1,2
        |  HAVING count(*) >= 5
        |)
        |SELECT sa AS a, sb AS b, c_ab, ia.c AS c_a, ib.c AS c_b,
        |  round(CAST(c_ab AS DOUBLE) / t.n, 6) AS support,
        |  round(CAST(c_ab AS DOUBLE) / ia.c, 6) AS confidence,
        |  round(CAST(c_ab * t.n AS DOUBLE) / CAST(ia.c * ib.c AS DOUBLE), 6)
        |    AS lift
        |FROM pc JOIN ic ia ON ia.s = pc.sa JOIN ic ib ON ib.s = pc.sb
        |CROSS JOIN tot t
        |ORDER BY CAST(c_ab * t.n AS DOUBLE) / CAST(ia.c * ib.c AS DOUBLE)
        |  DESC, sa, sb
        |LIMIT 20""".stripMargin,

    // exact mirror of Eval.balanceSmd (t202): per-side HUGEINT
    // moments (the engine's DECIMAL(38,0)), Bessel variances and the
    // SMD on the identical fixed IEEE chain
    "t202_smd_balance" ->
      """WITH t AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS x,
        |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS sa
        |  FROM documents WHERE n_chars IS NOT NULL
        |), m AS (
        |  SELECT source, sa, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS HUGEINT) AS s,
        |         sum(CAST(x AS HUGEINT)*x) AS ss
        |  FROM t GROUP BY 1, 2 HAVING count(*) > 1
        |), ab AS (
        |  SELECT a.source, a.n AS n_a, b.n AS n_b,
        |    CAST(a.s AS DOUBLE)/a.n - CAST(b.s AS DOUBLE)/b.n AS dmean,
        |    CAST(a.n*a.ss - a.s*a.s AS DOUBLE)
        |      / (CAST(a.n AS DOUBLE)*(a.n-1)) AS va,
        |    CAST(b.n*b.ss - b.s*b.s AS DOUBLE)
        |      / (CAST(b.n AS DOUBLE)*(b.n-1)) AS vb
        |  FROM m a JOIN m b ON b.source = a.source AND a.sa AND NOT b.sa
        |)
        |SELECT source, n_a, n_b,
        |  CASE WHEN va + vb > 0 THEN round(dmean / sqrt((va+vb)/2.0), 6)
        |  END AS smd
        |FROM ab ORDER BY source""".stripMargin,

    // exact mirror of Profiling.trimmedMean (t203): interval-overlap
    // clip weights on distinct-value cells (partial tie blocks exact),
    // one HUGEINT weighted sum, one divide by (n − 2k)
    "t203_trimmed_mean" ->
      """WITH base AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice*100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |), cells AS (
        |  SELECT flag, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1,2
        |), cum AS (
        |  SELECT flag, v, c,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY flag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS bef,
        |    CAST(sum(c) OVER (PARTITION BY flag) AS BIGINT) AS n
        |  FROM cells
        |), clip AS (
        |  SELECT flag, v, n, n//10 AS k,
        |    greatest(least(bef + c, n - n//10) - greatest(bef, n//10), 0)
        |      AS w
        |  FROM cum
        |)
        |SELECT flag, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(k) AS BIGINT) AS k_trim,
        |  CASE WHEN max(n) - 2*max(k) > 0 THEN
        |    round(CAST(sum(CAST(w AS HUGEINT) * v) AS DOUBLE)
        |      / CAST(max(n) - 2*max(k) AS DOUBLE), 6) END AS trimmed_mean
        |FROM clip GROUP BY flag ORDER BY flag""".stripMargin,

    // exact mirror of Profiling.theilIndex (t204) on per-user event
    // mass: micro-rounded BIGINT log terms (the t163 integer
    // micro-log contract), one divide by 10⁶·X
    "t204_theil" ->
      """WITH uc AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS xx FROM uc GROUP BY 1
        |), micro AS (
        |  SELECT u.event_type, st.n, st.xx,
        |    CAST(round(1000000.0 * u.x *
        |      ln(CAST(u.x AS DOUBLE) * st.n / st.xx)) AS BIGINT) AS tm
        |  FROM uc u JOIN st ON st.event_type = u.event_type
        |)
        |SELECT event_type, max(n) AS n_entities, max(xx) AS total,
        |  round(CAST(sum(tm) AS DOUBLE) / 1e6 / max(xx), 6) AS theil
        |FROM micro GROUP BY event_type ORDER BY event_type""".stripMargin,

    // exact replay of t205's streaming session contract: batch
    // sessionize (t185's chain, 6 h gap) restricted to sessions the
    // watermark finalized -- append mode emits iff session end
    // (last + gap*1e6 + 1 us) <= watermark = ms-truncated max event
    // time (t14's emission contract; session_window gap D = G*1e6+1 us
    // reproduces the batch strict-gt break exactly)
    "t205_stream_sessions" ->
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |                   OR us - prev_us > CAST(21600 AS BIGINT)*1000000
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM o
        |), s AS (
        |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_no
        |  FROM f
        |), wm AS (
        |  SELECT (max(epoch_us(ts)) // 1000) * 1000 AS w FROM events
        |), sess AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         min(us) AS start_us, max(us) - min(us) AS duration_us,
        |         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |         max(us) AS last_us
        |  FROM s GROUP BY user_id, session_no
        |)
        |SELECT user_id, n_events, start_us, duration_us, n_types
        |FROM sess
        |WHERE last_us + CAST(21600 AS BIGINT)*1000000 + 1
        |        <= (SELECT w FROM wm)
        |ORDER BY user_id, start_us""".stripMargin,

    // exact mirror of Profiling.medianCI (t206): sign-test 95% CI --
    // rank pair one fixed IEEE expression of n, all outputs rank-test
    // SELECTIONS of data values
    "t206_median_ci" ->
      """WITH base AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice*100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |), cells AS (
        |  SELECT flag, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1,2
        |), cum AS (
        |  SELECT flag, v,
        |    CAST(sum(c) OVER (PARTITION BY flag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cw,
        |    CAST(sum(c) OVER (PARTITION BY flag) AS BIGINT) AS n
        |  FROM cells
        |), ranks AS (
        |  SELECT flag, v, cw, n,
        |    CAST(floor((n - 1.959963984540054 * sqrt(CAST(n AS DOUBLE)))
        |      / 2.0) AS BIGINT) AS lo,
        |    (n + 1) // 2 AS mid
        |  FROM cum
        |)
        |SELECT flag, max(n) AS n,
        |  min(CASE WHEN cw >= lo THEN v END) AS ci_lo,
        |  min(CASE WHEN cw >= mid THEN v END) AS median,
        |  min(CASE WHEN cw >= n + 1 - lo THEN v END) AS ci_hi
        |FROM ranks GROUP BY flag ORDER BY flag""".stripMargin,

    // exact mirror of Behavior.rfmSegments (t207): value-threshold
    // tertiles from the integer rank test (3*cum >= k*n) -- ties score
    // together; recency inverted
    "t207_rfm" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(max(CAST(ts AS DATE)) - DATE '1970-01-01' AS BIGINT)
        |      AS last_d,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS money
        |  FROM events WHERE value IS NOT NULL GROUP BY 1
        |), mx AS (SELECT CAST(max(last_d) AS BIGINT) AS maxd FROM u),
        |s AS (
        |  SELECT user_id, mx.maxd - last_d AS rec, freq, money
        |  FROM u CROSS JOIN mx
        |), cells AS (
        |  SELECT 'rec' AS metric, rec AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM s GROUP BY 2
        |  UNION ALL
        |  SELECT 'freq', freq, CAST(count(*) AS BIGINT) FROM s GROUP BY 2
        |  UNION ALL
        |  SELECT 'money', money, CAST(count(*) AS BIGINT) FROM s GROUP BY 2
        |), cum AS (
        |  SELECT metric, v,
        |    CAST(sum(c) OVER (PARTITION BY metric ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cw,
        |    CAST(sum(c) OVER (PARTITION BY metric) AS BIGINT) AS n
        |  FROM cells
        |), qs AS (
        |  SELECT metric,
        |    min(CASE WHEN cw*3 >= n THEN v END) AS q1,
        |    min(CASE WHEN cw*3 >= n*2 THEN v END) AS q2
        |  FROM cum GROUP BY 1
        |)
        |SELECT
        |  3 - CAST(s.rec > qr.q1 AS BIGINT) - CAST(s.rec > qr.q2 AS BIGINT)
        |    AS r_score,
        |  1 + CAST(s.freq > qf.q1 AS BIGINT) + CAST(s.freq > qf.q2 AS BIGINT)
        |    AS f_score,
        |  1 + CAST(s.money > qm.q1 AS BIGINT)
        |    + CAST(s.money > qm.q2 AS BIGINT) AS m_score,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM s, qs qr, qs qf, qs qm
        |WHERE qr.metric = 'rec' AND qf.metric = 'freq'
        |  AND qm.metric = 'money'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // exact mirror of Profiling.lorenzDeciles (t208): lower-tail mass
    // via the interval-overlap clip on distinct-mass cells (partial
    // tie blocks exact; tie order irrelevant -- equal masses), one
    // HUGEINT weighted sum per decile
    "t208_lorenz" ->
      """WITH uc AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), cells AS (
        |  SELECT event_type, x AS v, CAST(count(*) AS BIGINT) AS c,
        |         CAST(sum(x) AS BIGINT) AS m
        |  FROM uc GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, v, c,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS bef,
        |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(sum(m) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM cells
        |), clip AS (
        |  SELECT event_type, d.decile, n, tot,
        |    CAST(greatest(least(bef + c, n * d.decile // 10)
        |      - least(bef, n * d.decile // 10), 0) AS HUGEINT) * v AS wmass
        |  FROM cum CROSS JOIN (SELECT unnest(range(1, 11)) AS decile) d
        |)
        |SELECT event_type, CAST(decile AS BIGINT) AS decile,
        |  CAST(max(n) AS BIGINT) AS n_entities,
        |  round(CAST(sum(wmass) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6)
        |    AS mass_share
        |FROM clip GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // exact mirror of Eval.mcNemar (t209): exact BIGINT discordant
    // cells, one IEEE divide, shared chi2(df=1) 0.95 literal
    "t209_mcnemar" ->
      """WITH m AS (
        |  SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_quantity >= 26
        |      AND NOT (round(l_extendedprice*100) >= 5000000)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT (l_quantity >= 26)
        |      AND round(l_extendedprice*100) >= 5000000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1
        |)
        |SELECT flag, n, b, c,
        |  CASE WHEN b + c > 0 THEN
        |    round(CAST((b-c)*(b-c) AS DOUBLE) / (b+c), 6) END AS stat,
        |  CASE WHEN b + c > 0 THEN
        |    round(CAST((b-c)*(b-c) AS DOUBLE) / (b+c), 6) > 3.841458821
        |  END AS significant
        |FROM m ORDER BY flag""".stripMargin,

    // exact mirror of Eval.cuped (t210): theta/xbar from HUGEINT
    // moments, per-user adjusted metric micro-rounded to BIGINT so
    // means AND variances are exact integer forms
    "t210_cuped" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(round(value*100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), sp AS (SELECT (min(d) + max(d)) // 2 AS cut FROM e),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN d <= (SELECT cut FROM sp) THEN v ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN d > (SELECT cut FROM sp) THEN v ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM e GROUP BY 1
        |), m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(x AS HUGEINT)*y) AS sxy, sum(CAST(x AS HUGEINT)*x) AS sxx
        |  FROM u
        |), t2 AS (
        |  SELECT CAST(n*sxy - sx*sy AS DOUBLE)
        |           / CAST(n*sxx - sx*sx AS DOUBLE) AS th,
        |         CAST(sx AS DOUBLE) / CAST(n AS BIGINT) AS xbar
        |  FROM m
        |), adj AS (
        |  SELECT substr(md5(CAST(u.user_id AS VARCHAR)),1,1) < '8' AS arm,
        |    u.y,
        |    CAST(round((CAST(u.y AS DOUBLE)
        |      - t2.th * (CAST(u.x AS DOUBLE) - t2.xbar)) * 1000000.0)
        |      AS HUGEINT) AS ym,
        |    t2.th
        |  FROM u, t2
        |), g AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS n_units,
        |    max(th) AS th,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(y AS HUGEINT)*y) AS syy,
        |    CAST(sum(ym) AS HUGEINT) AS sm,
        |    sum(ym*ym) AS smm
        |  FROM adj GROUP BY 1
        |)
        |SELECT arm, n_units, round(th, 6) AS theta,
        |  round(CAST(sy AS DOUBLE) / n_units, 6) AS mean_y,
        |  round(CAST(sm AS DOUBLE) / 1e6 / n_units, 6) AS mean_cuped,
        |  CASE WHEN n_units > 1
        |        AND CAST(n_units*syy - sy*sy AS DOUBLE) > 0 THEN
        |    round(1.0 - (CAST(n_units*smm - sm*sm AS DOUBLE) / 1e12)
        |      / CAST(n_units*syy - sy*sy AS DOUBLE), 6)
        |  END AS var_reduction
        |FROM g ORDER BY arm""".stripMargin,

    // exact mirror of CorpusStats.chapmanEstimate (t211): exact
    // capture counts, one IEEE divide (bias-corrected Chapman form)
    "t211_chapman" ->
      """WITH m AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) < 'c'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),2,1) < 'c'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) < 'c'
        |      AND substr(md5(CAST(doc_id AS VARCHAR)),2,1) < 'c'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
        |  FROM documents GROUP BY 1
        |)
        |SELECT source, n_a, n_b, n_overlap,
        |  round(CAST((n_a+1)*(n_b+1) AS DOUBLE) / (n_overlap+1) - 1.0, 6)
        |    AS n_hat
        |FROM m ORDER BY source""".stripMargin,

    // exact mirror of CorpusStats.chao1Richness (t212) on bigrams:
    // the t51 tokenization + 48-bit digests, two map-side count
    // stages, closed-form bias-corrected Chao1
    "t212_chao1" ->
      """WITH toks AS (
        |  SELECT source, list_filter(string_split_regex(lower(text),
        |    '[ 	

]+'), x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), grams AS (
        |  SELECT source, unnest(
        |    CASE WHEN len(t) < 2 THEN list_value(array_to_string(t, ' '))
        |    ELSE list_transform(range(len(t) - 1),
        |                        i -> t[i+1] || ' ' || t[i+2]) END) AS g
        |  FROM toks
        |), tc AS (
        |  SELECT source, CAST('0x' || substr(md5(g),1,12) AS BIGINT) AS h,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM grams GROUP BY source, g
        |), ff AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS d_observed,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM tc GROUP BY 1
        |)
        |SELECT source, d_observed, f1, f2,
        |  round(d_observed + CAST(f1*(f1-1) AS DOUBLE) / (2.0*(f2+1)), 6)
        |    AS chao1
        |FROM ff ORDER BY source""".stripMargin,

    // exact mirror of Eval.sequentialAbMonitor (t213): per-(day, arm)
    // HUGEINT moments, per-arm cumulative windows, inner join on days
    // both arms saw, fixed IEEE Lambda chain, running-max p
    "t213_seq_monitor" ->
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |    AS period,
        |    substr(md5(CAST(user_id AS VARCHAR)),1,1) < '8' AS a,
        |    CAST(round(value*100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), daily AS (
        |  SELECT period, a, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS HUGEINT) AS s, sum(CAST(v AS HUGEINT)*v) AS ss
        |  FROM e GROUP BY 1, 2
        |), cum AS (
        |  SELECT period, a,
        |    CAST(sum(n) OVER w AS BIGINT) AS cn,
        |    CAST(sum(s) OVER w AS HUGEINT) AS cs,
        |    CAST(sum(ss) OVER w AS HUGEINT) AS css
        |  FROM daily
        |  WINDOW w AS (PARTITION BY a ORDER BY period
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), ab AS (
        |  SELECT x.period, x.cn AS na, y.cn AS nb,
        |    CAST(x.cs AS DOUBLE)/x.cn - CAST(y.cs AS DOUBLE)/y.cn AS delta,
        |    (CAST(x.cn*x.css - x.cs*x.cs AS DOUBLE)
        |       / (CAST(x.cn AS DOUBLE)*(x.cn-1))
        |     + CAST(y.cn*y.css - y.cs*y.cs AS DOUBLE)
        |       / (CAST(y.cn AS DOUBLE)*(y.cn-1))) / 2.0 AS s2
        |  FROM cum x JOIN cum y ON y.period = x.period
        |  WHERE x.a AND NOT y.a AND x.cn > 1 AND y.cn > 1
        |), lam AS (
        |  SELECT period, na, nb, delta,
        |    s2*(1.0/na + 1.0/nb) AS vn, s2
        |  FROM ab
        |), lam2 AS (
        |  SELECT period, na, nb, delta,
        |    sqrt(vn/(vn+s2)) * exp(delta*delta*s2/(2.0*vn*(vn+s2)))
        |      AS lambda
        |  FROM lam
        |), fin AS (
        |  SELECT period, na AS n_a, nb AS n_b, round(delta, 6) AS delta,
        |    round(least(1.0, 1.0/max(lambda) OVER (ORDER BY period
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
        |      AS p_always
        |  FROM lam2
        |)
        |SELECT period, n_a, n_b, delta, p_always,
        |       p_always < 0.05 AS stopped
        |FROM fin ORDER BY period""".stripMargin,

    // exact mirror of Trend.seasonalIndices (t214): index =
    // (S_p*n)/(n_p*S) -- one IEEE divide of exact BIGINT products
    "t214_seasonality" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS s
        |  FROM daily GROUP BY 1
        |), dm AS (
        |  SELECT event_type, d % 7 AS phase,
        |         CAST(count(*) AS BIGINT) AS n_periods,
        |         CAST(sum(x) AS BIGINT) AS sp
        |  FROM daily GROUP BY 1, 2
        |)
        |SELECT dm.event_type, dm.phase, dm.n_periods,
        |  CASE WHEN st.s > 0 THEN
        |    round(CAST(dm.sp * st.n AS DOUBLE)
        |      / CAST(dm.n_periods * st.s AS DOUBLE), 6) END
        |    AS seasonal_index
        |FROM dm JOIN st ON st.event_type = dm.event_type
        |ORDER BY 1, 2""".stripMargin,

    // exact replay of t215 (SNM blocking + JW >= 0.9 verify + exact
    // pairs + the shared recursive components + canonical election):
    // the t196 CTE chain, the t194 judge, the t18/t38 tail
    "t215_entity_resolve" ->
      """WITH RECURSIVE reps AS (
        |  SELECT min(doc_id) AS id, text FROM documents
        |  WHERE text IS NOT NULL GROUP BY text
        |), exact_pairs AS (
        |  SELECT r.id AS id_a, d.doc_id AS id_b
        |  FROM documents d JOIN reps r USING (text)
        |  WHERE d.doc_id != r.id
        |), toks AS (
        |  SELECT id, list_filter(string_split_regex(lower(text),
        |    '[ 	

]+'), x -> x <> '') AS t
        |  FROM reps
        |), sets AS (
        |  SELECT id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END
        |    AS sh
        |  FROM toks
        |), keyed AS (
        |  SELECT s.id, list_aggregate(list_transform(s.sh,
        |      x -> CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)), 'min')
        |    AS mkey
        |  FROM sets s
        |), ranked AS (
        |  SELECT id, CAST(row_number() OVER (ORDER BY mkey, id)
        |    AS BIGINT) - 1 AS rk
        |  FROM keyed
        |), cands AS (
        |  SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
        |  FROM ranked a JOIN ranked b ON b.rk BETWEEN a.rk+1 AND a.rk+3
        |), near_pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cands c JOIN reps ra ON ra.id = c.id_a
        |               JOIN reps rb ON rb.id = c.id_b
        |  WHERE round(jaro_winkler_similarity(ra.text, rb.text), 6) >= 0.9
        |), pairs AS (
        |  SELECT id_a, id_b FROM exact_pairs
        |  UNION SELECT id_a, id_b FROM near_pairs
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
        |), labeled AS (
        |  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
        |), rankedc AS (
        |  SELECT l.component, d.doc_id, d.n_chars,
        |         count(*) OVER (PARTITION BY l.component) AS cluster_size,
        |         row_number() OVER (PARTITION BY l.component
        |                            ORDER BY d.n_chars DESC, d.doc_id)
        |           AS rn
        |  FROM labeled l JOIN documents d USING (doc_id)
        |)
        |SELECT component, doc_id AS canonical_id, n_chars,
        |       CAST(cluster_size AS BIGINT) AS cluster_size
        |FROM rankedc WHERE rn = 1 ORDER BY component""".stripMargin,

    // exact mirror of Attribution.deltaAttribution (t216): exact
    // BIGINT pre/post sums, integer deltas summing exactly to the
    // total, one IEEE divide for the share
    "t216_delta_attribution" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(round(value*100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), sp AS (SELECT (min(d) + max(d)) // 2 AS cut FROM e),
        |cells AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN d <= (SELECT cut FROM sp) THEN v ELSE 0 END)
        |      AS BIGINT) AS pre,
        |    CAST(sum(CASE WHEN d > (SELECT cut FROM sp) THEN v ELSE 0 END)
        |      AS BIGINT) AS post
        |  FROM e GROUP BY 1
        |), t AS (SELECT CAST(sum(post - pre) AS BIGINT) AS td FROM cells)
        |SELECT event_type, pre, post, post - pre AS delta,
        |  CASE WHEN t.td != 0 THEN
        |    round(CAST(post - pre AS DOUBLE) / CAST(t.td AS DOUBLE), 6)
        |  END AS share
        |FROM cells CROSS JOIN t
        |ORDER BY event_type""".stripMargin,

    // exact mirror of t217 (Similarity.poolChunkEmbeddings + QA
    // folds): chunks fold in vec_id order -- with exactly 4 chunks
    // per doc the left-assoc sum is the explicit pivot chain -- and
    // the summary folds replay via list_reduce (left fold, the same
    // IEEE order as Spark's aggregate())
    "t217_pool_embed" ->
      """WITH ch AS (
        |  SELECT vec_id // 4 AS doc, vec_id % 4 AS k, embedding AS e
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), piv AS (
        |  SELECT doc,
        |    max(CASE WHEN k=0 THEN e END) AS e0,
        |    max(CASE WHEN k=1 THEN e END) AS e1,
        |    max(CASE WHEN k=2 THEN e END) AS e2,
        |    max(CASE WHEN k=3 THEN e END) AS e3,
        |    CAST(count(*) AS BIGINT) AS n_chunks
        |  FROM ch GROUP BY doc
        |), pooled AS (
        |  SELECT doc, n_chunks,
        |    list_transform(range(64), i ->
        |      (((0.0 + CAST(e0[i+1] AS DOUBLE)) + CAST(e1[i+1] AS DOUBLE)
        |        + CAST(e2[i+1] AS DOUBLE)) + CAST(e3[i+1] AS DOUBLE))
        |      / 4) AS v
        |  FROM piv
        |)
        |SELECT doc, n_chunks,
        |  round(sqrt(list_reduce(list_transform(v, x -> x*x),
        |    (a, b) -> a + b)), 6) AS norm,
        |  round(list_reduce(v, (a, b) -> a + b) / 64.0, 6) AS mean_val,
        |  round(list_max(list_transform(v, x -> abs(x))), 6) AS max_abs
        |FROM pooled ORDER BY doc""".stripMargin,

    // exact mirror of Eval.srmCheck (t218): exact BIGINT arm counts,
    // one IEEE divide, shared chi2(df=1) literal
    "t218_srm" ->
      """WITH d AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |    AS period,
        |    CAST(sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)),1,1)
        |      < '8' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)),1,1)
        |      >= '8' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM events GROUP BY 1
        |)
        |SELECT period, n_a, n_b,
        |  round(CAST((n_a-n_b)*(n_a-n_b) AS DOUBLE)/(n_a+n_b), 6) AS chi2,
        |  round(CAST((n_a-n_b)*(n_a-n_b) AS DOUBLE)/(n_a+n_b), 6)
        |    > 3.841458821 AS mismatch
        |FROM d ORDER BY period""".stripMargin,

    // exact mirror of Eval.winRateMatrix (t219): dense value grid,
    // per-group cumulative CDF, doubled BIGINT win mass
    // 2W = sum c_a(v)*(2*F_b(v-) + c_b(v)), one divide per pair
    "t219_win_matrix" ->
      """WITH cells AS (
        |  SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
        |), tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cells
        |           GROUP BY 1),
        |grid AS (
        |  SELECT t.g, vv.v, coalesce(cells.c, 0) AS c
        |  FROM (SELECT DISTINCT v FROM cells) vv
        |  CROSS JOIN tot t
        |  LEFT JOIN cells ON cells.g = t.g AND cells.v = vv.v
        |), cdf AS (
        |  SELECT g AS group_b, v, c AS cb,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS bef
        |  FROM grid
        |), w AS (
        |  SELECT a.g AS group_a, cdf.group_b,
        |    CAST(sum(a.c * (2*cdf.bef + cdf.cb)) AS BIGINT) AS w2
        |  FROM cells a JOIN cdf ON cdf.v = a.v AND a.g < cdf.group_b
        |  GROUP BY 1, 2
        |)
        |SELECT w.group_a, w.group_b, ta.n AS n_a, tb.n AS n_b,
        |  round(CAST(w.w2 AS DOUBLE) / (2*ta.n*tb.n), 6) AS win_rate
        |FROM w JOIN tot ta ON ta.g = w.group_a
        |       JOIN tot tb ON tb.g = w.group_b
        |ORDER BY group_a, group_b""".stripMargin,

    // exact mirror of Sampling.neymanAllocation (t220): HUGEINT
    // moments, fixed IEEE sigma chain, micro-rounded weights summed
    // exactly, one rounded divide per stratum
    "t220_neyman" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_h,
        |    CAST(sum(v) AS HUGEINT) AS s, sum(CAST(v AS HUGEINT)*v) AS ss
        |  FROM e GROUP BY 1 HAVING count(*) > 1
        |), w AS (
        |  SELECT event_type, n_h,
        |    sqrt(CAST(n_h*ss - s*s AS DOUBLE)
        |      / (CAST(n_h AS DOUBLE)*(n_h-1))) AS sigma
        |  FROM m
        |), wm AS (
        |  SELECT event_type, n_h, sigma,
        |    CAST(round(n_h * sigma * 1000000.0) AS BIGINT) AS weight_micro
        |  FROM w
        |), t AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS tw FROM wm)
        |SELECT event_type, n_h, round(sigma, 6) AS sigma, weight_micro,
        |  CAST(round(1000.0 * weight_micro / t.tw) AS BIGINT) AS n_alloc
        |FROM wm CROSS JOIN t ORDER BY event_type""".stripMargin,

    // exact replay of t221 (StreamingSrm over 1-day windows): t218's
    // chi-square on days the watermark finalized -- append emits iff
    // window end <= max(event time) - 1 day (the t14 contract)
    "t221_stream_srm" ->
      """WITH e AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts,
        |    substr(md5(CAST(user_id AS VARCHAR)),1,1) < '8' AS a
        |  FROM events
        |), wm AS (SELECT max(ts) - INTERVAL 1 DAY AS w FROM e),
        |d AS (
        |  SELECT date_trunc('day', ts) AS day,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM e
        |  WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
        |  GROUP BY 1
        |)
        |SELECT day, n_a, n_b,
        |  round(CAST((n_a-n_b)*(n_a-n_b) AS DOUBLE)/(n_a+n_b), 6) AS chi2,
        |  round(CAST((n_a-n_b)*(n_a-n_b) AS DOUBLE)/(n_a+n_b), 6)
        |    > 3.841458821 AS mismatch
        |FROM d ORDER BY day""".stripMargin,

    // exact mirror of Trend.seasonalOutliers (t222): deseasonalized
    // micro values -- ONE IEEE divide of exact HUGEINT products per
    // day (the engine's DECIMAL(38,0)) -- through the t188 median/MAD
    // chain on distinct micro cells
    "t222_seasonal_outliers" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS s
        |  FROM daily GROUP BY 1
        |), dm AS (
        |  SELECT event_type, d % 7 AS phase, CAST(count(*) AS BIGINT) AS np,
        |         CAST(sum(x) AS BIGINT) AS sp
        |  FROM daily GROUP BY 1, 2
        |), micro AS (
        |  SELECT daily.event_type,
        |    CAST(round(1000000.0 * (CAST(daily.x AS HUGEINT) * dm.np * st.s)
        |      / (CAST(dm.sp AS HUGEINT) * st.n)) AS BIGINT) AS m
        |  FROM daily JOIN dm ON dm.event_type = daily.event_type
        |                    AND dm.phase = daily.d % 7
        |             JOIN st ON st.event_type = daily.event_type
        |), vc AS (
        |  SELECT event_type, m, CAST(count(*) AS BIGINT) AS c
        |  FROM micro GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, m,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY m
        |      ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM vc
        |), med AS (
        |  SELECT event_type, min(m) AS med, CAST(max(n) AS BIGINT) AS n
        |  FROM cum WHERE 2*cw >= n GROUP BY 1
        |), dc AS (
        |  SELECT vc.event_type, abs(vc.m - med.med) AS dd,
        |         CAST(sum(vc.c) AS BIGINT) AS c
        |  FROM vc JOIN med ON vc.event_type = med.event_type GROUP BY 1, 2
        |), dcum AS (
        |  SELECT event_type, dd,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY dd
        |      ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM dc
        |), mad AS (
        |  SELECT event_type, min(dd) AS mad FROM dcum
        |  WHERE 2*cw >= n GROUP BY 1
        |)
        |SELECT med.event_type, med.n, med.med AS med, mad.mad AS mad,
        |  CAST(sum(CASE WHEN abs(vc.m - med.med)*10000 > 51891*mad.mad
        |    THEN vc.c ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(CAST(sum(CASE WHEN abs(vc.m - med.med)*10000
        |    > 51891*mad.mad THEN vc.c ELSE 0 END) AS DOUBLE)
        |    / CAST(med.n AS DOUBLE), 6) AS outlier_frac
        |FROM vc JOIN med ON vc.event_type = med.event_type
        |        JOIN mad ON mad.event_type = vc.event_type
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,

    // exact mirror of Profiling.columnEntropy (t223): micro-log
    // BIGINT terms (the t167/t204 contract), one divide per column
    "t223_column_entropy" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |      AS dow,
        |    CAST(floor(value/50) AS BIGINT) AS value_bucket
        |  FROM events WHERE value IS NOT NULL
        |), u AS (
        |  SELECT 'event_type' AS col_name, event_type AS v FROM base
        |  WHERE event_type IS NOT NULL
        |  UNION ALL SELECT 'dow', CAST(dow AS VARCHAR) FROM base
        |  UNION ALL SELECT 'value_bucket', CAST(value_bucket AS VARCHAR)
        |    FROM base
        |), c AS (
        |  SELECT col_name, v, CAST(count(*) AS BIGINT) AS c
        |  FROM u GROUP BY 1, 2
        |), t AS (
        |  SELECT col_name, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1
        |), micro AS (
        |  SELECT c.col_name,
        |    CAST(round(1000000.0 * c.c * ln(CAST(c.c AS DOUBLE)/t.n))
        |      AS BIGINT) AS tm
        |  FROM c JOIN t ON t.col_name = c.col_name
        |), agg AS (
        |  SELECT col_name, CAST(count(*) AS BIGINT) AS k_distinct,
        |         CAST(sum(tm) AS BIGINT) AS tms
        |  FROM micro GROUP BY 1
        |)
        |SELECT a.col_name, t.n, a.k_distinct,
        |  round(-CAST(a.tms AS DOUBLE)/1e6/t.n, 6) AS entropy,
        |  CASE WHEN a.k_distinct > 1 THEN
        |    round(-CAST(a.tms AS DOUBLE)/1e6/t.n
        |      / ln(CAST(a.k_distinct AS DOUBLE)), 6) ELSE 0.0 END
        |    AS norm_entropy
        |FROM agg a JOIN t ON t.col_name = a.col_name
        |ORDER BY a.col_name""".stripMargin,

    // exact mirror of Profiling.fdMine (t224): 12 rule-labeled
    // branches through one generic majority-mass chain
    "t224_fd_mine" ->
      """WITH base AS (
        |  SELECT l_returnflag AS c1, l_linestatus AS c2,
        |    strftime(l_shipdate, '%Y-%m') AS c3,
        |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS c4
        |  FROM lineitem
        |), u AS (
        |  SELECT 'l_returnflag->l_linestatus' AS rule, c1 AS l, c2 AS r FROM base
        |  UNION ALL SELECT 'l_returnflag->ship_month', c1, c3 FROM base
        |  UNION ALL SELECT 'l_returnflag->qty', c1, c4 FROM base
        |  UNION ALL SELECT 'l_linestatus->l_returnflag', c2, c1 FROM base
        |  UNION ALL SELECT 'l_linestatus->ship_month', c2, c3 FROM base
        |  UNION ALL SELECT 'l_linestatus->qty', c2, c4 FROM base
        |  UNION ALL SELECT 'ship_month->l_returnflag', c3, c1 FROM base
        |  UNION ALL SELECT 'ship_month->l_linestatus', c3, c2 FROM base
        |  UNION ALL SELECT 'ship_month->qty', c3, c4 FROM base
        |  UNION ALL SELECT 'qty->l_returnflag', c4, c1 FROM base
        |  UNION ALL SELECT 'qty->l_linestatus', c4, c2 FROM base
        |  UNION ALL SELECT 'qty->ship_month', c4, c3 FROM base
        |), c AS (
        |  SELECT rule, l, r, CAST(count(*) AS BIGINT) AS n
        |  FROM u GROUP BY 1, 2, 3
        |), g AS (
        |  SELECT rule, l, CAST(sum(n) AS BIGINT) AS tot,
        |         CAST(max(n) AS BIGINT) AS mx,
        |         CAST(count(*) AS BIGINT) AS k
        |  FROM c GROUP BY 1, 2
        |)
        |SELECT rule, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  CAST(sum(tot) AS BIGINT) AS n_rows,
        |  round(CAST(sum(mx) AS DOUBLE) / sum(tot), 6) AS confidence,
        |  sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0 AS holds
        |FROM g GROUP BY rule ORDER BY rule""".stripMargin,

    // exact mirror of Profiling.winsorizedMean (t225): boundary
    // order statistics by rank test, interval-overlap middle clip,
    // HUGEINT winsorized sum, one divide by n
    "t225_winsorized" ->
      """WITH base AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice*100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |), cells AS (
        |  SELECT flag, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1,2
        |), cum AS (
        |  SELECT flag, v, c,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY flag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS bef,
        |    CAST(sum(c) OVER (PARTITION BY flag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cw,
        |    CAST(sum(c) OVER (PARTITION BY flag) AS BIGINT) AS n
        |  FROM cells
        |)
        |SELECT flag, max(n) AS n, max(n)//10 AS k_winsor,
        |  round((CAST(sum(CAST(greatest(least(cw, n - n//10)
        |        - greatest(bef, n//10), 0) AS HUGEINT) * v) AS DOUBLE)
        |    + CAST(max(n)//10 AS DOUBLE)
        |      * min(CASE WHEN cw >= n//10 + 1 THEN v END)
        |    + CAST(max(n)//10 AS DOUBLE)
        |      * min(CASE WHEN cw >= n - n//10 THEN v END))
        |    / max(n), 6) AS winsorized_mean
        |FROM cum GROUP BY flag ORDER BY flag""".stripMargin,

    // exact mirror of Similarity.labelSeparation (t226): micro-
    // quantized components, centroid identity on HUGEINT dots (the
    // engine's DECIMAL(38,0)), one divide per output
    "t226_label_separation" ->
      """WITH q AS (
        |  SELECT label, vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE)*1000000.0) AS BIGINT)) AS v
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND label IS NOT NULL
        |), ex AS (
        |  SELECT label, vec_id, u.i, v[u.i+1] AS x
        |  FROM q, (SELECT unnest(range(64)) AS i) u
        |), cent AS (
        |  SELECT label, i, CAST(sum(x) AS HUGEINT) AS s FROM ex GROUP BY 1,2
        |), norms AS (
        |  SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n,
        |         sum(CAST(x AS HUGEINT)*x) AS sqs
        |  FROM ex GROUP BY 1
        |), tot AS (
        |  SELECT i, CAST(sum(s) AS HUGEINT) AS st FROM cent GROUP BY 1
        |), dots AS (
        |  SELECT label, CAST(sum(s*s) AS HUGEINT) AS ss,
        |         CAST(sum(s*(st - s)) AS HUGEINT) AS sx
        |  FROM cent JOIN tot USING (i) GROUP BY 1
        |), nall AS (SELECT CAST(sum(n) AS BIGINT) AS na FROM norms),
        |fin AS (
        |  SELECT norms.label, norms.n,
        |    CASE WHEN norms.n > 1 THEN
        |      round(CAST(dots.ss - norms.sqs AS DOUBLE)
        |        / (CAST(norms.n AS DOUBLE) * (norms.n - 1)) / 1e12, 6)
        |    END AS intra_dot,
        |    CASE WHEN nall.na > norms.n THEN
        |      round(CAST(dots.sx AS DOUBLE)
        |        / (CAST(norms.n AS DOUBLE) * (nall.na - norms.n))
        |        / 1e12, 6)
        |    END AS inter_dot
        |  FROM norms JOIN dots ON dots.label = norms.label CROSS JOIN nall
        |)
        |SELECT label, n, intra_dot, inter_dot,
        |  CASE WHEN intra_dot IS NOT NULL AND inter_dot IS NOT NULL THEN
        |    round(intra_dot - inter_dot, 6) END AS separation
        |FROM fin ORDER BY label""".stripMargin,

    // exact mirror of Profiling.chiSquareResiduals (t227): full grid
    // (absent cells included), residual one IEEE divide+sqrt of
    // exact HUGEINT integers
    "t227_chi2_residuals" ->
      """WITH cells AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS mon, l_returnflag AS a,
        |         l_linestatus AS b, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2, 3
        |), rm AS (
        |  SELECT mon, a, CAST(sum(c) AS BIGINT) AS cr FROM cells GROUP BY 1,2
        |), cm AS (
        |  SELECT mon, b, CAST(sum(c) AS BIGINT) AS cc FROM cells GROUP BY 1,2
        |), tot AS (
        |  SELECT mon, CAST(sum(cr) AS BIGINT) AS n FROM rm GROUP BY 1
        |), grid AS (
        |  SELECT rm.mon, rm.a, cm.b, rm.cr, cm.cc,
        |         coalesce(cells.c, 0) AS o, t.n
        |  FROM rm JOIN cm ON cm.mon = rm.mon
        |  LEFT JOIN cells ON cells.mon = rm.mon AND cells.a = rm.a
        |                 AND cells.b = cm.b
        |  JOIN tot t ON t.mon = rm.mon
        |)
        |SELECT mon, a, b, o,
        |  round(CAST(CAST(o AS HUGEINT)*n - CAST(cr AS HUGEINT)*cc
        |      AS DOUBLE)
        |    / sqrt(CAST(CAST(n AS HUGEINT)*cr*cc AS DOUBLE)), 6)
        |    AS residual,
        |  abs(round(CAST(CAST(o AS HUGEINT)*n - CAST(cr AS HUGEINT)*cc
        |      AS DOUBLE)
        |    / sqrt(CAST(CAST(n AS HUGEINT)*cr*cc AS DOUBLE)), 6)) > 2.0
        |    AS notable
        |FROM grid ORDER BY mon, a, b""".stripMargin,

    // exact mirror of Profiling.infoGain (t228): micro-log entropies
    // (the t223 contract), gain = difference of the 6dp-rounded pair
    "t228_info_gain" ->
      """WITH base AS (
        |  SELECT event_type AS label,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
        |      AS dow,
        |    CAST(floor(value/100) AS BIGINT) AS value_bucket,
        |    CAST(user_id % 10 AS BIGINT) AS user_mod
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |), u AS (
        |  SELECT 'dow' AS feat, CAST(dow AS VARCHAR) AS v,
        |         CAST(label AS VARCHAR) AS l FROM base
        |  UNION ALL SELECT 'value_bucket', CAST(value_bucket AS VARCHAR),
        |    CAST(label AS VARCHAR) FROM base
        |  UNION ALL SELECT 'user_mod', CAST(user_mod AS VARCHAR),
        |    CAST(label AS VARCHAR) FROM base
        |), c AS (
        |  SELECT feat, v, l, CAST(count(*) AS BIGINT) AS c
        |  FROM u GROUP BY 1, 2, 3
        |), nv AS (
        |  SELECT feat, v, CAST(sum(c) AS BIGINT) AS nv FROM c GROUP BY 1, 2
        |), n AS (SELECT feat, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        |cond AS (
        |  SELECT c.feat, CAST(sum(CAST(round(1000000.0 * c.c *
        |    ln(CAST(c.c AS DOUBLE)/nv.nv)) AS BIGINT)) AS BIGINT) AS tms
        |  FROM c JOIN nv ON nv.feat = c.feat AND nv.v = c.v GROUP BY 1
        |), lab AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nl FROM base GROUP BY label
        |), hl AS (
        |  SELECT round(-CAST(sum(CAST(round(1000000.0 * nl *
        |      ln(CAST(nl AS DOUBLE) / (SELECT sum(nl) FROM lab)))
        |      AS BIGINT)) AS DOUBLE) / 1e6 / (SELECT sum(nl) FROM lab), 6)
        |    AS h_label
        |  FROM lab
        |)
        |SELECT c.feat, hl.h_label,
        |  round(-CAST(c.tms AS DOUBLE)/1e6/n.n, 6) AS h_cond,
        |  round(hl.h_label - round(-CAST(c.tms AS DOUBLE)/1e6/n.n, 6), 6)
        |    AS info_gain
        |FROM cond c JOIN n ON n.feat = c.feat CROSS JOIN hl
        |ORDER BY c.feat""".stripMargin,

    // exact replay of t229 (exact+near clusters via the shared
    // recursive CTE, longest-text canonical, byte sums)
    "t229_dedup_savings" ->
      (ClusterReachCte + """,
        |labeled AS (
        |  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
        |), cl AS (
        |  SELECT l.component, CAST(count(*) AS BIGINT) AS sz,
        |         CAST(max(d.n_chars) AS BIGINT) AS keep_b,
        |         CAST(sum(d.n_chars) AS BIGINT) AS tot_b
        |  FROM labeled l JOIN documents d USING (doc_id) GROUP BY 1
        |)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(sum(tot_b) AS BIGINT) AS bytes_before,
        |  CAST(sum(keep_b) AS BIGINT) AS bytes_after,
        |  round(1.0 - CAST(sum(keep_b) AS DOUBLE)
        |    / CAST(sum(tot_b) AS DOUBLE), 6) AS savings
        |FROM cl""".stripMargin),

    // exact mirror of Eval.ratioMetricCI (t230): unit moments exact
    // HUGEINT, delta-method variance and bounds one fixed IEEE chain
    "t230_ratio_ci" ->
      """WITH u AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(round(value*100)) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(x AS HUGEINT)*x) AS sxx, sum(CAST(y AS HUGEINT)*y)
        |      AS syy,
        |    sum(CAST(x AS HUGEINT)*y) AS sxy
        |  FROM u GROUP BY 1
        |), f AS (
        |  SELECT event_type, n,
        |    CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS r,
        |    CAST(sx AS DOUBLE) / n AS xbar,
        |    CAST(n*sxx - sx*sx AS DOUBLE) / (CAST(n AS DOUBLE)*(n-1)) AS vx,
        |    CAST(n*syy - sy*sy AS DOUBLE) / (CAST(n AS DOUBLE)*(n-1)) AS vy,
        |    CAST(n*sxy - sx*sy AS DOUBLE) / (CAST(n AS DOUBLE)*(n-1)) AS cxy
        |  FROM m WHERE n > 1
        |), s AS (
        |  SELECT event_type, n, r,
        |    sqrt((vy - 2.0*r*cxy + r*r*vx) / (xbar*xbar) / n) AS se
        |  FROM f
        |)
        |SELECT event_type, n, round(r, 6) AS ratio,
        |  round(r - 1.959963984540054*se, 6) AS ci_lo,
        |  round(r + 1.959963984540054*se, 6) AS ci_hi
        |FROM s ORDER BY event_type""".stripMargin,

    // exact mirror of Eval.mdeTable (t231): shared z literals, exact
    // HUGEINT moments, fixed IEEE chain
    "t231_mde" ->
      """WITH u AS (
        |  SELECT event_type, user_id,
        |         CAST(sum(round(value*100)) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS HUGEINT) AS s, sum(CAST(y AS HUGEINT)*y) AS ss
        |  FROM u GROUP BY 1
        |)
        |SELECT event_type, n,
        |  round(sqrt(CAST(n*ss - s*s AS DOUBLE)
        |    / (CAST(n AS DOUBLE)*(n-1))), 6) AS sigma,
        |  round((1.959963984540054 + 0.8416212335729143)
        |    * sqrt(CAST(n*ss - s*s AS DOUBLE) / (CAST(n AS DOUBLE)*(n-1)))
        |    * sqrt(2.0/(n/2)), 6) AS mde_abs,
        |  round((1.959963984540054 + 0.8416212335729143)
        |    * sqrt(CAST(n*ss - s*s AS DOUBLE) / (CAST(n AS DOUBLE)*(n-1)))
        |    * sqrt(2.0/(n/2)) / (CAST(s AS DOUBLE)/n), 6) AS mde_rel
        |FROM m WHERE n > 1 ORDER BY event_type""".stripMargin,

    // exact mirror of Profiling.leaveOneOutInfluence (t232): exact
    // HUGEINT sums, one divide per mean, mirrored subtraction
    "t232_influence" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
        |         CAST(sum(v) AS HUGEINT) AS s_g
        |  FROM e GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |         CAST(sum(s_g) AS HUGEINT) AS s FROM m
        |)
        |SELECT event_type, n_g,
        |  round(CAST(t.s AS DOUBLE)/t.n, 6) AS mean_all,
        |  round(CAST(t.s - m.s_g AS DOUBLE)/(t.n - m.n_g), 6)
        |    AS mean_without,
        |  round(CAST(t.s AS DOUBLE)/t.n
        |    - CAST(t.s - m.s_g AS DOUBLE)/(t.n - m.n_g), 6) AS influence
        |FROM m CROSS JOIN t WHERE t.n > m.n_g ORDER BY event_type""".stripMargin,

    // exact mirror of t233 (SNM candidates + TextDedup.damerauVerify):
    // the t194 blocking chain judged by DuckDB's native
    // damerau_levenshtein -- the engine kernel is bit-identical to it
    // (full Lowrance-Wagner DL over bytes)
    "t233_damerau_verify" ->
      """WITH reps AS (
        |  SELECT min(doc_id) AS id, text FROM documents
        |  WHERE text IS NOT NULL GROUP BY text
        |), toks AS (
        |  SELECT id, list_filter(string_split_regex(lower(text),
        |    '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
        |  FROM reps
        |), sets AS (
        |  SELECT id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(len(t) - 2),
        |                        i -> array_to_string(t[i+1:i+3], ' ')) END
        |    AS sh
        |  FROM toks
        |), keyed AS (
        |  SELECT s.id, list_aggregate(list_transform(s.sh,
        |      x -> CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)), 'min')
        |    AS mkey
        |  FROM sets s
        |), ranked AS (
        |  SELECT id, CAST(row_number() OVER (ORDER BY mkey, id)
        |    AS BIGINT) - 1 AS rk
        |  FROM keyed
        |), cpairs AS (
        |  SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
        |  FROM ranked a JOIN ranked b ON b.rk BETWEEN a.rk+1 AND a.rk+3
        |), dsets AS (
        |  SELECT id, list_distinct(sh) AS dsh FROM sets
        |), pairs AS (
        |  SELECT p.id_a, p.id_b FROM cpairs p
        |  JOIN dsets sa ON sa.id = p.id_a
        |  JOIN dsets sb ON sb.id = p.id_b
        |  WHERE CAST(len(list_intersect(sa.dsh, sb.dsh)) AS DOUBLE)
        |          / len(list_distinct(sa.dsh || sb.dsh)) >= 0.3
        |), v AS (
        |  SELECT p.id_a, p.id_b,
        |    CAST(damerau_levenshtein(ra.text, rb.text) AS BIGINT) AS dl,
        |    CAST(greatest(length(ra.text), length(rb.text)) AS BIGINT)
        |      AS max_len
        |  FROM pairs p JOIN reps ra ON ra.id = p.id_a
        |               JOIN reps rb ON rb.id = p.id_b
        |  WHERE 1.0 - abs(length(ra.text) - length(rb.text))
        |          / CAST(greatest(length(ra.text), length(rb.text))
        |                 AS DOUBLE)
        |        >= 0.8 - 0.000001
        |)
        |SELECT id_a, id_b, dl, max_len,
        |  round(1.0 - CAST(dl AS DOUBLE) / max_len, 6) AS sim
        |FROM v
        |WHERE round(1.0 - CAST(dl AS DOUBLE) / max_len, 6) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // exact mirror of Profiling.concentrationProfile (t234): HHI =
    // exact HUGEINT sum(x^2)/X^2, CR4 = top-4 mass share (ties carry
    // equal mass, so the sum is tie-order-invariant)
    "t234_concentration" ->
      """WITH uc AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_entities,
        |    CAST(sum(x) AS HUGEINT) AS xx, sum(CAST(x AS HUGEINT)*x) AS sq
        |  FROM uc GROUP BY 1
        |), topk AS (
        |  SELECT event_type, CAST(sum(x) AS BIGINT) AS top4 FROM (
        |    SELECT event_type, x,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY x DESC, user_id) AS rn
        |    FROM uc) WHERE rn <= 4 GROUP BY 1
        |)
        |SELECT m.event_type, m.n_entities, CAST(m.xx AS BIGINT) AS total,
        |  round(CAST(m.sq AS DOUBLE) / CAST(m.xx * m.xx AS DOUBLE), 6)
        |    AS hhi,
        |  round(CAST(t.top4 AS DOUBLE) / CAST(m.xx AS BIGINT), 6) AS cr_k
        |FROM m JOIN topk t ON t.event_type = m.event_type
        |ORDER BY m.event_type""".stripMargin,
  )

  // t239 resumes the t48 pipeline from a mid-chain checkpoint; the
  // resumed ledger must be EXACTLY the uninterrupted run's — one
  // oracle replay, two execution paths
  // t271 / q72 share one oracle string (the q49/t239 pattern)
  private val t271LangidSql: String =
    """WITH d AS (
          |  SELECT doc_id, lang, coalesce(text, '') ||
          |    repeat(CASE lang WHEN 'de' THEN ' der die das und ist'
          |                     WHEN 'es' THEN ' el la de que y'
          |                     WHEN 'fr' THEN ' le la de et un'
          |                     WHEN 'zh' THEN ' 的 是 在 了 不'
          |                     ELSE ' the of and is a' END, 8) AS t
          |  FROM documents
          |), g AS (
          |  SELECT d.doc_id, d.lang,
          |    (unicode(substr(d.t, ii.i, 1)) +
          |     2 * unicode(substr(d.t, ii.i + 1, 1))) % 4096 AS b
          |  FROM d, LATERAL (SELECT unnest(range(1, length(d.t))) AS i) ii
          |), trc AS (
          |  SELECT lang, b, CAST(count(*) AS BIGINT) AS c
          |  FROM g WHERE doc_id % 2 = 0 GROUP BY 1, 2
          |), trt AS (
          |  SELECT lang, CAST(sum(c) AS BIGINT) AS tt FROM trc GROUP BY 1
          |), w AS (
          |  SELECT trc.lang, trc.b,
          |    CAST(round(1e6 * ln((trc.c + 1.0) / (trt.tt + 4096.0)))
          |      AS BIGINT) AS w
          |  FROM trc JOIN trt ON trt.lang = trc.lang
          |), wdef AS (
          |  SELECT lang,
          |    CAST(round(1e6 * ln(1.0 / (tt + 4096.0))) AS BIGINT) AS w0
          |  FROM trt
          |), pri AS (
          |  SELECT lang, CAST(round(1e6 * ln(CAST(count(*) AS DOUBLE) /
          |      CAST((SELECT count(*) FROM d WHERE doc_id % 2 = 0)
          |        AS DOUBLE))) AS BIGINT) AS p
          |  FROM d WHERE doc_id % 2 = 0 GROUP BY 1
          |), sc AS (
          |  SELECT dd.doc_id, dd.lang AS lang_true, pri.lang AS lang_m,
          |    pri.p + coalesce(sum(CASE WHEN g.doc_id IS NOT NULL THEN
          |      coalesce(w.w, wdef.w0,
          |        CAST(round(1e6 * ln(1.0 / 4096.0)) AS BIGINT))
          |      ELSE 0 END), 0) AS score
          |  FROM d dd
          |  CROSS JOIN pri
          |  LEFT JOIN wdef ON wdef.lang = pri.lang
          |  LEFT JOIN g ON g.doc_id = dd.doc_id
          |  LEFT JOIN w ON w.lang = pri.lang AND w.b = g.b
          |  GROUP BY dd.doc_id, dd.lang, pri.lang, pri.p
          |), pick AS (
          |  SELECT lang_true, lang_m,
          |    row_number() OVER (PARTITION BY doc_id
          |      ORDER BY score DESC, lang_m DESC) AS rn
          |  FROM sc
          |)
          |SELECT lang_true AS lang, lang_m AS pred,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM pick WHERE rn = 1
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val sql: Map[String, String] =
    base + ("t239_pipeline_resume" -> base("t48_pipeline")) +
      // the SQL-surface views return the OPERATOR's exact output: each
      // qN reuses its operator's oracle verbatim (the q49/t239 pattern)
      ("q50_sql_drift_panel" -> base("t154_drift_panel")) +
      ("q51_sql_hybrid_search" -> base("t94_hybrid_search")) +
      ("q52_sql_near_dup_clusters" -> base("t38_canonical")) +
      ("q53_sql_datacard" -> base("t255_datacard")) +
      ("q54_sql_cluster_quality" -> base("t257_cluster_quality")) +
      ("q55_sql_canonical_dups" -> base("t259_canonical_dedup")) +
      ("q56_sql_embedding_card" -> base("t261_embedding_card")) +
      ("q57_sql_corpus_diff" -> base("t262_corpus_diff")) +
      ("q58_sql_filtered_search" -> base("t98_filtered_ann")) +
      ("q59_sql_funnel" -> base("t107_funnel")) +
      ("q60_sql_retention" -> base("t108_retention")) +
      ("q61_sql_sessions" -> base("t185_sessions")) +
      ("q62_sql_repetition" -> base("t267_repetition")) +
      ("q63_sql_prefix_jaccard" -> base("t266_prefix_jaccard")) +
      ("q64_sql_mink_prob" -> base("t268_mink_prob")) +
      ("q65_sql_snapshot_diff" -> base("t88_snapshot_diff")) +
      ("q66_sql_validate" -> base("t87_validate_suite")) +
      // q67: the rolling-distinct view against an EXACT recount of
      // the same 7-day windows. Valid as a hash-exact oracle because
      // at verify scale (<= 150 distinct users per window) the
      // lgK=12 HLL sketch is deep inside its coupon-exact regime —
      // deterministic AND exact (t92 measured 0.0 relative error at
      // sf0.01; the regime demonstrably ends before 1338/window,
      // where sf0.1 shows an off-by-2 coupon collision). The
      // precondition is ENFORCED: the Verify gate "t92 hll
      // max_exact_window <= 512" fails by name when a testdata regen
      // leaves the regime; t92's rel-err contract stays the gate for
      // approximate scales.
      ("q68_sql_substr_spans" -> base("t269_substr_dedup")) +
      ("q69_sql_rerank" -> base("t270_rerank")) +
      // q70: the rolling-quantiles view against a rank-selection
      // replay of the same 7-day windows. Valid as a hash-exact
      // oracle because the view's KLL sketches (k=8192) hold every
      // window's items uncompacted at verify scale, so getQuantile(p)
      // is an exact order statistic: the SMALLEST value whose
      // normalized inclusive rank cum/n ≥ p, with the comparison on
      // IEEE doubles (pinned empirically: n=20, p=0.95 selects rank
      // 19 because 19/20 rounds to the same double as the 0.95
      // literal, while natural-rank forms ⌈0.95·20⌉ = 20 and
      // round(0.95·20) = 19 disagree with other probes). The replay
      // below computes the identical rn/n ≥ p double comparison. The
      // view builder enforces the regime as a precondition
      // (TrainingQueries.rollingQuantilesExact); t100 stays the
      // enforced rank-error gate for the k=200 production contract.
      ("q71_sql_weighted_quantiles" -> base("t184_weighted_quantiles")) +
      // t271: full replay of the trainable naive-Bayes langid —
      // training counts, Laplace micro-log weights, priors, scoring
      // and argmax are ALL re-derived in DuckDB from the raw table.
      // Bucket hash: (cp1 + 2·cp2) mod 4096 via unicode()/substr()
      // (codepoint semantics match the engine kernel's UTF-8
      // decoder); micro-log arithmetic on the identical IEEE chain
      // (the t163 contract); argmax ties to the lexicographically
      // LATER language (ORDER BY score DESC, lang DESC). Languages
      // with no training grams keep a prior and the c=0 smoothed
      // default weight ln(1/4096) — the coalesce below.
      ("t271_langid_nb" -> t271LangidSql) +
      ("q72_sql_langid" -> t271LangidSql) +
      ("q70_sql_rolling_quantiles" ->
        """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
          |w AS (
          |  SELECT d.day, CAST(e.value AS DOUBLE) AS v
          |  FROM days d JOIN events e
          |    ON e.value IS NOT NULL
          |   AND CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
          |), c AS (
          |  SELECT day, v,
          |    row_number() OVER (PARTITION BY day ORDER BY v) AS rn,
          |    count(*) OVER (PARTITION BY day) AS n
          |  FROM w
          |)
          |SELECT day, 7 AS window_days,
          |  min(CASE WHEN CAST(rn AS DOUBLE) / CAST(n AS DOUBLE) >= 0.5
          |           THEN v END) AS p50,
          |  min(CASE WHEN CAST(rn AS DOUBLE) / CAST(n AS DOUBLE) >= 0.95
          |           THEN v END) AS p95
          |FROM c GROUP BY day ORDER BY day""".stripMargin) +
      ("q67_sql_rolling_distinct" ->
        """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
          |SELECT d.day, 7 AS window_days,
          |       count(DISTINCT e.user_id) AS approx_distinct
          |FROM days d
          |JOIN events e ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
          |GROUP BY d.day ORDER BY d.day""".stripMargin)
}
