package graft.oracles

/** DuckDB oracle SQL for the relational query family — the
  * literal twins split out of SparkEntry (one object per family;
  * `SparkEntry.oracleSqlBase` unions them). Entry text is
  * byte-identical to the pre-split map: derived oracles anchor on
  * exact substrings of these strings. */
object RelationalOracles {
  val sql: Map[String, String] = Map(
    // q67: join-key skew head over events.user_id — exact counts, two
    // IEEE share divisions, the window only over the 20-row head.
    "q67_key_skew" ->
      """WITH c AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY user_id),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |  CAST(count(*) AS BIGINT) AS n_keys FROM c GROUP BY (1=1)),
        |h AS (SELECT key, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, key) AS INT) AS rank
        |  FROM c QUALIFY rank <= 20)
        |SELECT h.rank, h.key, h.n, t.n_keys, t.total,
        |  CAST(h.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
        |  CAST(SUM(h.n) OVER (ORDER BY h.n DESC, h.key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(t.total AS DOUBLE) AS cum_share
        |FROM h CROSS JOIN t""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_broadcast" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q3_join_topn" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q6_outer_join_agg" ->
      """SELECT n_nationkey, n_name,
        |  COUNT(c_custkey) AS n_customers,
        |  CAST(SUM(CAST(COALESCE(c_acctbal, 0.0) AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name""".stripMargin,
    "q7_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,
    "q8_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  row_number() OVER w AS order_seq,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS cum_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q9_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q10_set_union" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin,
    "q11_set_intersect" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin,
    "q12_set_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin,
    "q13_distinct_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q14_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q15_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q16_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  length(p_name) AS name_len,
        |  substring(p_name, 1, 4) AS name_pfx,
        |  p_brand || '/' || p_type AS brand_type,
        |  regexp_replace(p_name, 'widget', 'gizmo', 'g') AS name_sub,
        |  p_size % 7 AS size_mod,
        |  CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS price_up,
        |  CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class
        |FROM part""".stripMargin,
    "q17_pivot_conditional" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q18_event_window" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS win_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q19_sessionize" ->
      """WITH b AS (SELECT user_id, event_id, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |f AS (SELECT user_id, event_id, ts, sec,
        |  CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |       THEN 1 ELSE 0 END AS is_new
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_id, sec,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(sec) AS session_start, max(sec) AS session_end
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    // Running-max gaps-and-islands on epoch-microsecond longs; touching
    // intervals merge (start == running max end is NOT a new island).
    "q59_interval_merge" ->
      """WITH iv AS (SELECT user_id, event_id,
        |    epoch_us(ts) AS start_us,
        |    epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 AS end_us
        |  FROM events),
        |m AS (SELECT user_id, event_id, start_us, end_us,
        |  max(end_us) OVER (PARTITION BY user_id
        |    ORDER BY start_us, end_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv),
        |f AS (SELECT *, CASE WHEN prev_max IS NULL OR start_us > prev_max
        |    THEN 1 ELSE 0 END AS is_new FROM m),
        |s AS (SELECT user_id, start_us, end_us,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY start_us, end_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS island
        |  FROM f)
        |SELECT user_id, island, count(*) AS n_events,
        |  min(start_us) AS span_start_us, max(end_us) AS span_end_us
        |FROM s GROUP BY user_id, island""".stripMargin,
    "q61_linear_attribution" ->
      """WITH b AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    event_id, event_type, value FROM events),
        |c AS (SELECT user_id, t AS ct, event_id AS click_id FROM b
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, t AS pt, event_id AS purchase_id, value
        |  FROM b WHERE event_type = 'purchase'),
        |j AS (SELECT p.purchase_id, p.user_id, c.click_id,
        |    p.pt - c.ct AS lag_sec, p.value
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.ct <= p.pt AND p.pt - c.ct <= 604800),
        |n AS (SELECT *, CAST(count(*) OVER (PARTITION BY purchase_id)
        |    AS BIGINT) AS n_touches FROM j)
        |SELECT purchase_id, user_id, click_id, lag_sec, n_touches,
        |  CAST(1.0 AS DOUBLE) / n_touches AS credit,
        |  value / n_touches AS value_credit
        |FROM n""".stripMargin,
    "q60_ohlc_bars" ->
      """WITH r AS (SELECT user_id, CAST(ts AS DATE) AS day, value,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS cnt
        |  FROM events)
        |SELECT user_id, day,
        |  max(CASE WHEN rn = 1 THEN value END) AS open,
        |  max(value) AS high,
        |  min(value) AS low,
        |  max(CASE WHEN rn = cnt THEN value END) AS close,
        |  count(*) AS n_events
        |FROM r GROUP BY user_id, day""".stripMargin,
    "q20_exact_median" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |  FROM orders)
        |SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS median_price,
        |  max(cnt) AS n_orders
        |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |GROUP BY o_orderpriority""".stripMargin,
    "q21_asof_join" ->
      """WITH u AS (
        |  SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    1 AS side, event_id, CAST(NULL AS BIGINT) AS o_orderkey
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT),
        |    0, NULL, o_orderkey
        |  FROM orders),
        |m AS (SELECT event_id, k, side,
        |  last_value(o_orderkey IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY t, side, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_order
        |  FROM u)
        |SELECT event_id, k AS user_id, matched_order
        |FROM m WHERE side = 1""".stripMargin,
    // q21's union+window with the matched row's own timestamp carried
    // forward; the 30-day staleness bound is a pure per-row filter.
    "q45_asof_tolerance" ->
      """WITH u AS (
        |  SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    1 AS side, event_id, CAST(NULL AS BIGINT) AS o_orderkey
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT),
        |    0, NULL, o_orderkey
        |  FROM orders),
        |m AS (SELECT event_id, k, t, side,
        |  last_value(o_orderkey IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY t, side, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cand_order,
        |  last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY t, side, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cand_t
        |  FROM u)
        |SELECT event_id, k AS user_id,
        |  CASE WHEN t - cand_t <= 2592000 THEN cand_order END AS matched_order,
        |  CASE WHEN t - cand_t <= 2592000 THEN t - cand_t END AS gap_sec
        |FROM m WHERE side = 1""".stripMargin,
    "q24_range_join" ->
      """SELECT a.event_id, count(*) - 1 AS n_close
        |FROM events a JOIN events b ON a.event_type = b.event_type
        |  AND b.value >= a.value AND b.value < a.value + 0.5
        |GROUP BY a.event_id""".stripMargin,
    "q35_interval_join" ->
      """WITH b AS (SELECT event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |  CAST(floor(epoch(ts)) AS BIGINT) + 60 +
        |    ((CAST(floor(value) AS BIGINT) * 17) % 240 + 240) % 240 AS e
        | FROM events)
        |SELECT a.event_id, count(*) - 1 AS n_overlaps
        |FROM b a JOIN b b2 ON a.event_type = b2.event_type
        |  AND a.s <= b2.e AND b2.s <= a.e
        |GROUP BY a.event_id""".stripMargin,
    // q22: exact columns value-checked; sketch columns carved out as
    // within-tolerance booleans the oracle pins to literal true (a sketch
    // drifting outside its accuracy contract flips the flag → hash fail)
    "q22_approx_stats" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_rows,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  true AS approx_orders_ok,
        |  true AS approx_parts_ok,
        |  true AS approx_median_ok
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q23_topk_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q30_window_nav" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  ntile(4) OVER w AS quartile,
        |  first_value(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q44_window_dist" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(o_totalprice, 3) OVER w AS third_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q46_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |  CAST(l_quantity AS DOUBLE) AS mval FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |  CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount',
        |  CAST(l_discount AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax',
        |  CAST(l_tax AS DOUBLE) FROM lineitem""".stripMargin,
    "q34_date_funcs" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
        |  CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS mth,
        |  CAST(day(CAST(o_orderdate AS DATE)) AS INT) AS dom,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
        |    AS days_to_eoy,
        |  CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start
        |FROM orders""".stripMargin,
    "q32_histogram" ->
      """WITH s AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
        |b AS (SELECT CASE WHEN vmax = vmin THEN 0
        |    ELSE least(CAST(floor((value - vmin) / ((vmax - vmin) / 20)) AS BIGINT), 19)
        |  END AS bucket
        | FROM events CROSS JOIN s),
        |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket)
        |SELECT bucket,
        |  vmin + bucket * ((vmax - vmin) / 20) AS bucket_lo,
        |  vmin + (bucket + 1) * ((vmax - vmin) / 20) AS bucket_hi,
        |  n
        |FROM c CROSS JOIN s""".stripMargin,
    // decimal→double goes through VARCHAR: DuckDB's direct DECIMAL→DOUBLE
    // cast is not correctly rounded once the unscaled value needs int128
    // (observed 1-ulp-high on the Σy² sums), while its string→double parse
    // and Spark's BigDecimal.doubleValue both round correctly.
    "q33_group_corr" ->
      """WITH a AS (SELECT l_returnflag, count(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |  CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxy,
        |  CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxx,
        |  CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS syy
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (n * sxy - sx * sy) /
        |  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
        |FROM a""".stripMargin,
    "q31_latest_upsert" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q28_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q29_scalar_subquery" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part p
        |WHERE p_retailprice > (
        |  SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
        |           / COUNT(*)
        |  FROM part p2 WHERE p2.p_brand = p.p_brand)""".stripMargin,
    "q25_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q26_salted_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q27_sliding_window" ->
      """WITH e AS (SELECT event_type, value,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |w AS (SELECT event_type, value,
        |  (sec // 1800) * 1800 - s.k AS win_start
        |  FROM e, (SELECT unnest([0, 1800]) AS k) s)
        |SELECT win_start, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    // Bloom pre-filtering is a physical rewrite (false positives are removed
    // by the join) — the oracle is the plain join.
    "q65_monthly_growth" ->
      """WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
        |    AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |    AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT month, revenue, n_orders,
        |  lag(revenue) OVER (ORDER BY month) AS prev_revenue,
        |  CASE WHEN lag(revenue) OVER (ORDER BY month) > 0
        |    THEN (revenue - lag(revenue) OVER (ORDER BY month))
        |      / lag(revenue) OVER (ORDER BY month) END AS growth
        |FROM m""".stripMargin,
    "q64_regional_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |GROUP BY r_name""".stripMargin,
    "q36_bloom_join" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus""".stripMargin,
    "q37_snapshot_diff" ->
      """WITH old AS (SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 7 <> 0),
        |new AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
        |       ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
        |  CASE WHEN old.o_orderkey IS NULL THEN 'insert'
        |       WHEN new.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  old.o_totalprice AS old_o_totalprice,
        |  new.o_totalprice AS new_o_totalprice
        |FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
        |WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
        |   OR old.o_totalprice IS DISTINCT FROM new.o_totalprice""".stripMargin,
    // NTILE semantics are rank-arithmetic (no float boundaries) — the
    // distributed two-phase rank must reproduce ntile() exactly.
    "q38_equidepth" ->
      """WITH b AS (SELECT value,
        |  ntile(8) OVER (ORDER BY value, event_id) AS bucket FROM events)
        |SELECT bucket, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
        |FROM b GROUP BY bucket""".stripMargin,
    "q39_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id)
        |SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT 2, 'click', count(*) FROM c
        |UNION ALL SELECT 3, 'purchase', count(*) FROM p""".stripMargin,
    "q41_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS from_type
        |  FROM events)
        |SELECT from_type, event_type AS to_type, count(*) AS n_transitions
        |FROM s WHERE from_type IS NOT NULL
        |GROUP BY from_type, event_type""".stripMargin,
    // ps CAST to DOUBLE in the rank targets: DuckDB's bare 0.05 literal is
    // DECIMAL, and decimal ceil(p*n) parts ways with Spark's double at
    // exact-integer boundaries (0.05·2000: double 200.0000…11 → 201).
    "q62_winsorize" ->
      """WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT event_type, p, CAST(ceil(p * n) AS BIGINT) AS rnk
        |  FROM c CROSS JOIN (SELECT UNNEST(
        |    [CAST(0.05 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS p)),
        |r AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rnk
        |  FROM events),
        |qv AS (SELECT r.event_type, t.p, r.value AS q_value
        |  FROM r JOIN t ON t.event_type = r.event_type AND t.rnk = r.rnk),
        |b AS (SELECT event_type,
        |    min(CASE WHEN p = CAST(0.05 AS DOUBLE) THEN q_value END) AS lo_v,
        |    min(CASE WHEN p = CAST(0.95 AS DOUBLE) THEN q_value END) AS hi_v
        |  FROM qv GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  greatest(least(e.value, b.hi_v), b.lo_v) AS value_winsorized,
        |  (e.value < b.lo_v OR e.value > b.hi_v) AS clipped
        |FROM events e JOIN b ON b.event_type = e.event_type""".stripMargin,
    // q66: EWMA with α = ½ — every weight an exact power of two, so the
    // fixed left-to-right term order is bit-exact with NO decimal grid;
    // partial heads renormalize over the present taps.
    "q66_ewma" ->
      """WITH w AS (SELECT event_id, user_id, value,
        |  LAG(value, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS v1,
        |  LAG(value, 2) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS v2,
        |  LAG(value, 3) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS v3
        |  FROM events)
        |SELECT event_id, user_id, value,
        |  ((((CASE WHEN value IS NOT NULL
        |        THEN value * CAST(1.0 AS DOUBLE)
        |        ELSE CAST(0.0 AS DOUBLE) END)
        |    + CASE WHEN v1 IS NOT NULL THEN v1 * CAST(0.5 AS DOUBLE)
        |        ELSE CAST(0.0 AS DOUBLE) END)
        |    + CASE WHEN v2 IS NOT NULL THEN v2 * CAST(0.25 AS DOUBLE)
        |        ELSE CAST(0.0 AS DOUBLE) END)
        |    + CASE WHEN v3 IS NOT NULL THEN v3 * CAST(0.125 AS DOUBLE)
        |        ELSE CAST(0.0 AS DOUBLE) END)
        |  /
        |  ((((CASE WHEN value IS NOT NULL THEN CAST(1.0 AS DOUBLE)
        |        ELSE CAST(0.0 AS DOUBLE) END)
        |    + CASE WHEN v1 IS NOT NULL THEN CAST(0.5 AS DOUBLE)
        |        ELSE CAST(0.0 AS DOUBLE) END)
        |    + CASE WHEN v2 IS NOT NULL THEN CAST(0.25 AS DOUBLE)
        |        ELSE CAST(0.0 AS DOUBLE) END)
        |    + CASE WHEN v3 IS NOT NULL THEN CAST(0.125 AS DOUBLE)
        |        ELSE CAST(0.0 AS DOUBLE) END)
        |  AS ewma
        |FROM w""".stripMargin,
    // Trailing-frame Σv/Σv² as DECIMAL(18,6)/(36,12) (exact both engines);
    // mean/var/z in the same fixed-order double expressions.
    "q63_rolling_anomaly" ->
      """WITH s AS (SELECT user_id, event_id, value,
        |    count(*) OVER w AS n_prev,
        |    SUM(CAST(value AS DECIMAL(18,6))) OVER w AS s1,
        |    SUM(CAST(value AS DECIMAL(18,6)) *
        |        CAST(value AS DECIMAL(18,6))) OVER w AS s2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT user_id, event_id, value,
        |    CAST(n_prev AS BIGINT) AS n_prev,
        |    CAST(s1 AS DOUBLE) / n_prev AS mean_prev,
        |    CAST(s2 AS DOUBLE) / n_prev AS ex2
        |  FROM s WHERE n_prev >= 5),
        |v AS (SELECT user_id, event_id, value, n_prev, mean_prev,
        |    sqrt(greatest(ex2 - mean_prev * mean_prev, 0.0)) AS std_prev
        |  FROM m)
        |SELECT user_id, event_id, value, n_prev, mean_prev, std_prev,
        |  CASE WHEN std_prev > 0
        |    THEN (value - mean_prev) / std_prev END AS z,
        |  (std_prev > 0 AND
        |   abs((value - mean_prev) / std_prev) > 3.0) AS anomaly
        |FROM v""".stripMargin,
    "q43_group_quantiles" ->
      """WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rnk
        |  FROM events),
        |t AS (SELECT event_type, p, CAST(ceil(p * n) AS BIGINT) AS tr
        |  FROM n CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75, 0.95]) AS p))
        |SELECT t.event_type, p, r.value AS q_value
        |FROM t JOIN r ON r.event_type = t.event_type AND r.rnk = t.tr""".stripMargin,
    // PERCENTILE_CONT with the lerp spelled out — the builtins associate
    // the interpolation differently across engines.
    "q47_percentile_cont" ->
      """WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |t0 AS (SELECT event_type, CAST(p AS DOUBLE) AS p,
        |  CAST(n - 1 AS DOUBLE) * CAST(p AS DOUBLE) + 1.0 AS h
        |  FROM n CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75]) AS p)),
        |t AS (SELECT event_type, p, CAST(floor(h) AS BIGINT) AS lo,
        |  CAST(ceil(h) AS BIGINT) AS hi, h - floor(h) AS frac FROM t0),
        |r AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rnk
        |  FROM events),
        |j AS (SELECT t.event_type, p, frac,
        |  MIN(CASE WHEN rnk = lo THEN value END) AS v_lo,
        |  MIN(CASE WHEN rnk = hi THEN value END) AS v_hi
        |  FROM r JOIN t ON r.event_type = t.event_type
        |    AND (rnk = lo OR rnk = hi)
        |  GROUP BY 1, 2, 3)
        |SELECT event_type, p, v_lo + frac * (v_hi - v_lo) AS pval
        |FROM j""".stripMargin,
    // Per-key day grid via generate_series; forward fill is the same
    // last_value IGNORE NULLS running lookup as the Spark window.
    "q48_gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    count(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS day_value
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        |grid AS (SELECT user_id, CAST(g AS DATE) AS day
        |  FROM spans, LATERAL unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(g)),
        |j AS (SELECT grid.user_id, grid.day,
        |    COALESCE(daily.n_events, 0) AS n_events,
        |    last_value(daily.day_value IGNORE NULLS) OVER (
        |      PARTITION BY grid.user_id ORDER BY grid.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |  FROM grid LEFT JOIN daily
        |    ON grid.user_id = daily.user_id AND grid.day = daily.day)
        |SELECT user_id,
        |  CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS day_num,
        |  n_events, filled_value
        |FROM j""".stripMargin,
    // Lower weighted median over the per-price pre-aggregate; 2·cumw >=
    // totw keeps the arithmetic in DECIMAL (no half-total division).
    "q49_weighted_median" ->
      """WITH byp AS (SELECT l_returnflag, l_extendedprice,
        |    SUM(CAST(l_quantity AS DECIMAL(38,6))) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, l_extendedprice,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS totw
        |  FROM byp)
        |SELECT l_returnflag, min(l_extendedprice) AS w_median,
        |  CAST(max(totw) AS DOUBLE) AS total_weight
        |FROM c WHERE cumw * 2 >= totw
        |GROUP BY l_returnflag""".stripMargin,
    // RANGE frame over epoch seconds: ties share a frame in both engines.
    "q50_rolling_range" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(floor(epoch(o_orderdate)) AS BIGINT) AS sec, o_totalprice
        |  FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY sec
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_revenue,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY sec
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |    AS trailing_orders
        |FROM o""".stripMargin,
    // Gaps-and-islands by rank difference; longest streak's start via a
    // deterministic (len DESC, start ASC) rank.
    "q51_streaks" ->
      """WITH daily AS (SELECT DISTINCT user_id,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day_num
        |  FROM events),
        |g AS (SELECT user_id, day_num,
        |    day_num - row_number() OVER (PARTITION BY user_id
        |      ORDER BY day_num) AS grp
        |  FROM daily),
        |s AS (SELECT user_id, grp, count(*) AS len,
        |    min(day_num) AS streak_start
        |  FROM g GROUP BY 1, 2),
        |r AS (SELECT user_id, len, streak_start,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, streak_start) AS rk
        |  FROM s)
        |SELECT s.user_id, count(*) AS n_streaks, max(s.len) AS longest_streak,
        |  CAST(sum(s.len) AS BIGINT) AS active_days,
        |  max(r.streak_start) AS longest_start
        |FROM s JOIN r ON s.user_id = r.user_id AND r.rk = 1
        |GROUP BY s.user_id""".stripMargin,
    // Mode with the tie policy spelled out: count desc, then priority asc.
    "q52_group_mode" ->
      """WITH c AS (SELECT o_custkey, o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, o_orderpriority AS mode_priority, n AS n_mode
        |FROM (SELECT o_custkey, o_orderpriority, n, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY n DESC, o_orderpriority) AS rk
        |  FROM c) t WHERE rk = 1""".stripMargin,
    "q53_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey
        |          AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |        WHERE o2.o_custkey = c.c_custkey
        |          AND o2.o_orderstatus = 'F')""".stripMargin,
    // Union-trick attribution inside one stream: clicks carry forward,
    // purchases read the latest one, window bound is a per-row filter.
    "q55_attribution" ->
      """WITH b AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    event_id, event_type FROM events),
        |u AS (
        |  SELECT user_id, t, 0 AS side,
        |    CAST(NULL AS BIGINT) AS purchase_id, event_id AS click_id
        |  FROM b WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, t, 1, event_id, CAST(NULL AS BIGINT)
        |  FROM b WHERE event_type = 'purchase'),
        |m AS (SELECT user_id, t, side, purchase_id,
        |  last_value(click_id IGNORE NULLS) OVER w AS cand_click,
        |  last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
        |    OVER w AS cand_t
        |  FROM u WINDOW w AS (PARTITION BY user_id
        |    ORDER BY t, side, click_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT purchase_id, user_id,
        |  CASE WHEN t - cand_t <= 604800 THEN cand_click END
        |    AS attributed_click,
        |  CASE WHEN t - cand_t <= 604800 THEN t - cand_t END AS lag_sec
        |FROM m WHERE side = 1""".stripMargin,
    "q56_integrity" ->
      """SELECT 'lineitem->orders' AS edge,
        |  (SELECT count(*) FROM lineitem) AS n_child,
        |  (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey
        |   WHERE o.o_orderkey IS NULL) AS n_orphans
        |UNION ALL SELECT 'lineitem->part',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l LEFT JOIN part p
        |     ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
        |UNION ALL SELECT 'lineitem->supplier',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
        |     ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
        |UNION ALL SELECT 'orders->customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o LEFT JOIN customer c
        |     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
        |UNION ALL SELECT 'customer->nation',
        |  (SELECT count(*) FROM customer),
        |  (SELECT count(*) FROM customer c LEFT JOIN nation n
        |     ON c.c_nationkey = n.n_nationkey
        |   WHERE n.n_nationkey IS NULL)""".stripMargin,
    // q20's middle-statistics recipe applied twice: once on values, once
    // on |value - median| with the same deterministic (dev, id) rank.
    "q57_group_mad" ->
      """WITH r AS (SELECT event_type, value, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events),
        |med AS (SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
        |      AS med,
        |    max(cnt) AS n_rows
        |  FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |  GROUP BY event_type),
        |dev AS (SELECT e.event_type, abs(e.value - med.med) AS dev,
        |    e.event_id
        |  FROM events e JOIN med ON e.event_type = med.event_type),
        |r2 AS (SELECT event_type, dev, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY dev, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM dev),
        |mad AS (SELECT event_type,
        |    CAST(SUM(CAST(dev AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
        |      AS mad
        |  FROM r2 WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |  GROUP BY event_type)
        |SELECT med.event_type, med.med AS median_value, mad.mad,
        |  med.n_rows
        |FROM med JOIN mad ON med.event_type = mad.event_type""".stripMargin,
    // Rank trimming keeps a deterministic multiset of values under ties,
    // so no tiebreak column; mean mirrors davg (DECIMAL(38,6) sum / count).
    "q58_trimmed_mean" ->
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |k AS (SELECT event_type, value, n FROM r
        |  WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1))
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_total,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |    / COUNT(value) AS DOUBLE) AS trimmed_mean
        |FROM k GROUP BY event_type""".stripMargin,
    "q54_ratio_to_report" ->
      """WITH pn AS (SELECT n_regionkey, n_name,
        |    SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_regionkey, n_name,
        |  CAST(bal AS DOUBLE) AS nation_bal,
        |  CAST(sum(bal) OVER (PARTITION BY n_regionkey) AS DOUBLE)
        |    AS region_bal,
        |  CAST(bal AS DOUBLE)
        |    / CAST(sum(bal) OVER (PARTITION BY n_regionkey) AS DOUBLE)
        |    AS share
        |FROM pn""".stripMargin,
    "q42_retention" ->
      """WITH coh AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        |  FROM events GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date
        |  FROM events)
        |SELECT cohort_date,
        |  datediff('day', cohort_date, active_date) AS day_offset,
        |  count(DISTINCT act.user_id) AS n_active
        |FROM act JOIN coh ON act.user_id = coh.user_id
        |WHERE datediff('day', cohort_date, active_date) BETWEEN 0 AND 7
        |GROUP BY 1, 2""".stripMargin,
    "q40_zorder" ->
      """WITH d AS (SELECT event_id, user_id % 1024 AS a,
        |  CAST(hour(ts) AS BIGINT) AS b FROM events)
        |SELECT event_id,
        |  list_reduce(list_transform(range(0, 10), i ->
        |    (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))),
        |    (x, y) -> x | y) AS zv
        |FROM d""".stripMargin,
    // q68: per-user event-type Shannon entropy — x21's decimal-grid log
    // recipe over the (user, event_type) histogram.
    "q68_user_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |ag AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(SUM(cnt) AS BIGINT) AS n_events,
        |  SUM(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)), 5)
        |    AS DECIMAL(18,6))) AS clog_sum
        | FROM c GROUP BY 1)
        |SELECT user_id, n_types, n_events,
        |  CAST(CAST(round(ln(CAST(n_events AS DOUBLE)), 5)
        |    AS DECIMAL(18,6)) AS DOUBLE)
        |    - CAST(clog_sum AS DOUBLE) / n_events AS entropy_nats
        |FROM ag""".stripMargin,
    // q69: the oracle recomputes the q1 summary over the WHOLE table in
    // one pass; the engine merges two partial states (90/10 orderkey
    // split) — hash equality is the IVM merge ≡ recompute contract.
    "q69_ivm_merge" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
