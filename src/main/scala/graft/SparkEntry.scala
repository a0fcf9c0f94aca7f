package graft

import graft.operators.{PipelineOps, Relational => R, Tables => T}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB twin in `oracleSql` (same column
  * names, exact-match arithmetic via DECIMAL accumulation) unless the
  * operator is not SQL-expressible, in which case the driver records a
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    R.pricingSummary(T.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.8 extension
    * surface + LLM-pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- relational core (§2.8 extension surface) --
    "q1_agg" -> ((s, d) => R.pricingSummary(T.lineitem(s, d))),
    "q2_join_broadcast" -> ((s, d) => R.revenueByBrand(T.lineitem(s, d), T.part(s, d))),
    "q3_join_topn" -> ((s, d) =>
      R.shippingPriority(T.customer(s, d), T.orders(s, d), T.lineitem(s, d), "BUILDING")),
    "q4_semi_join" -> ((s, d) => R.customersWithOrders(T.customer(s, d), T.orders(s, d))),
    "q5_anti_join" -> ((s, d) => R.customersWithoutOrders(T.customer(s, d), T.orders(s, d))),
    "q6_outer_join_agg" -> ((s, d) => R.customersPerNation(T.nation(s, d), T.customer(s, d))),
    "q7_window_rank" -> ((s, d) => R.topOrdersPerCustomer(T.orders(s, d), 3)),
    "q8_window_running" -> ((s, d) => R.runningCustomerSpend(T.orders(s, d))),
    "q9_sort_limit" -> ((s, d) => R.topOrders(T.orders(s, d), 20)),
    "q10_set_union" -> ((s, d) => R.setUnion(
      R.segmentKeys(T.customer(s, d), "BUILDING"),
      R.segmentKeys(T.customer(s, d), "MACHINERY"))),
    "q11_set_intersect" -> ((s, d) => R.setIntersect(
      R.segmentKeys(T.customer(s, d), "BUILDING"),
      R.segmentKeys(T.customer(s, d), "MACHINERY"))),
    "q12_set_except" -> ((s, d) => R.setExcept(
      R.segmentKeys(T.customer(s, d), "BUILDING"),
      R.segmentKeys(T.customer(s, d), "MACHINERY"))),
    "q13_distinct_agg" -> ((s, d) => R.orderStats(T.orders(s, d), T.lineitem(s, d))),
    "q14_rollup" -> ((s, d) => R.rollupSummary(T.lineitem(s, d))),
    "q15_cube" -> ((s, d) => R.cubeSummary(T.orders(s, d))),
    "q16_scalar_funcs" -> ((s, d) => R.scalarFunctions(T.part(s, d))),
    "q17_pivot_conditional" -> ((s, d) => R.statusByPriority(T.orders(s, d))),
    "q18_event_window" -> ((s, d) => R.eventsPerHour(T.events(s, d))),
    // -- reference pipeline parity ops (SURVEY §2.1-§2.5) --
    "m_safe_json_decode" -> ((s, d) => PipelineOps.safeJsonDecode(T.events(s, d))),
    "m_error_routing" -> ((s, d) => PipelineOps.errorRouting(T.events(s, d))),
    "m_headers_roundtrip" -> ((s, d) =>
      PipelineOps.headersRoundTrip(T.events(s, d), "graft-app")),
    "m_delta_dedup" -> ((s, d) => PipelineOps.deltaDedup(s, T.events(s, d))),
  )

  /** DuckDB twins. Arithmetic rules for exact comparison: double measures are
    * accumulated as DECIMAL(38,6) then surfaced as DOUBLE (order-independent,
    * identical on both engines); averages divide the exact decimal sum by the
    * count in double; timestamps surface as epoch seconds or DATE.
    */
  def oracleSql: Map[String, String] = Map(
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
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
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
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin,
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
    "m_safe_json_decode" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(NULL AS VARCHAR) AS error_code
        |FROM events""".stripMargin,
    "m_error_routing" ->
      """SELECT event_type,
        |  COUNT(CASE WHEN value < 10.0 THEN 1 END) AS n_invalid,
        |  COUNT(CASE WHEN NOT (value < 10.0) THEN 1 END) AS n_valid
        |FROM events GROUP BY event_type""".stripMargin,
    "m_headers_roundtrip" ->
      """SELECT event_id,
        |  'graft-app' AS error_source_application_id,
        |  CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) AS error_source_timestamp,
        |  'events' AS error_source_topic,
        |  CAST(event_id % 4 AS VARCHAR) AS error_source_partition,
        |  CAST(event_id AS VARCHAR) AS "error_source_partition_offset",
        |  'FAILED_TO_PROCESS_RECORD' AS error_source_application_code,
        |  'Failed to process event ' || event_id AS error_source_application_message,
        |  'java.io.IOException' AS error_source_exception_class
        |FROM events WHERE event_type = 'error'""".stripMargin,
    "m_delta_dedup" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |  FROM events)
        |WHERE prev IS NULL OR prev <> event_type""".stripMargin,
  )
}
