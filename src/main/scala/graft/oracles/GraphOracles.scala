package graft.oracles

/** DuckDB oracle SQL for the graph query family — the
  * literal twins split out of SparkEntry (one object per family;
  * `SparkEntry.oracleSqlBase` unions them). Entry text is
  * byte-identical to the pre-split map: derived oracles anchor on
  * exact substrings of these strings. */
object GraphOracles {
  val sql: Map[String, String] = Map(
    // Three unrolled PageRank iterations on the same 1e-9 decimal grid as
    // the engine: per-edge contributions in doubles (every literal CAST to
    // DOUBLE — bare 1.0/0.85 would be DuckDB decimals with different
    // rounding), grid-rounded, summed as DECIMAL(38,0).
    "g1_pagerank" ->
      """WITH pairc AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |ed AS (SELECT 'c:' || cust AS src, 's:' || supp AS dst, w FROM pairc
        |  UNION ALL
        |  SELECT 's:' || supp, 'c:' || cust, w FROM pairc),
        |ow AS (SELECT src, sum(w) AS wout FROM ed GROUP BY src),
        |e AS (SELECT ed.src, ed.dst, ed.w, ow.wout
        |  FROM ed JOIN ow ON ed.src = ow.src),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |nn AS (SELECT count(*) AS n FROM nd),
        |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS pr
        |  FROM nd CROSS JOIN nn),
        |c1 AS (SELECT e.dst, SUM(CAST(round(p0.pr *
        |    (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE)) * 1.0e9)
        |    AS DECIMAL(38,0))) AS gs
        |  FROM e JOIN p0 ON e.src = p0.node GROUP BY e.dst),
        |p1 AS (SELECT nd.node,
        |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
        |    + CAST(0.85 AS DOUBLE) *
        |      (CAST(COALESCE(c1.gs, 0) AS DOUBLE) / 1.0e9) AS pr
        |  FROM nd CROSS JOIN nn LEFT JOIN c1 ON c1.dst = nd.node),
        |c2 AS (SELECT e.dst, SUM(CAST(round(p1.pr *
        |    (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE)) * 1.0e9)
        |    AS DECIMAL(38,0))) AS gs
        |  FROM e JOIN p1 ON e.src = p1.node GROUP BY e.dst),
        |p2 AS (SELECT nd.node,
        |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
        |    + CAST(0.85 AS DOUBLE) *
        |      (CAST(COALESCE(c2.gs, 0) AS DOUBLE) / 1.0e9) AS pr
        |  FROM nd CROSS JOIN nn LEFT JOIN c2 ON c2.dst = nd.node),
        |c3 AS (SELECT e.dst, SUM(CAST(round(p2.pr *
        |    (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE)) * 1.0e9)
        |    AS DECIMAL(38,0))) AS gs
        |  FROM e JOIN p2 ON e.src = p2.node GROUP BY e.dst),
        |p3 AS (SELECT nd.node,
        |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
        |    + CAST(0.85 AS DOUBLE) *
        |      (CAST(COALESCE(c3.gs, 0) AS DOUBLE) / 1.0e9) AS pr
        |  FROM nd CROSS JOIN nn LEFT JOIN c3 ON c3.dst = nd.node)
        |SELECT node, pr FROM p3""".stripMargin,
    // g15: g1's unrolled grid PageRank with the teleport mass restricted
    // to the seed set (suppliers ≡ 0 mod 10): p0 uniform over seeds,
    // restart term (1−d)/|S| on seeds and 0 elsewhere.
    "g15_ppr" ->
      """WITH pairc AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |ed AS (SELECT 'c:' || cust AS src, 's:' || supp AS dst, w FROM pairc
        |  UNION ALL
        |  SELECT 's:' || supp, 'c:' || cust, w FROM pairc),
        |ow AS (SELECT src, sum(w) AS wout FROM ed GROUP BY src),
        |e AS (SELECT ed.src, ed.dst, ed.w, ow.wout
        |  FROM ed JOIN ow ON ed.src = ow.src),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |sd AS (SELECT node, CASE WHEN node LIKE 's:%'
        |    AND CAST(substr(node, 3) AS BIGINT) % 10 = 0
        |    THEN 1 ELSE 0 END AS seed FROM nd),
        |ns AS (SELECT CAST(sum(seed) AS BIGINT) AS s FROM sd),
        |p0 AS (SELECT node, seed,
        |    CASE WHEN seed = 1 THEN CAST(1.0 AS DOUBLE) / s
        |         ELSE CAST(0.0 AS DOUBLE) END AS pr
        |  FROM sd CROSS JOIN ns),
        |c1 AS (SELECT e.dst, SUM(CAST(round(p0.pr *
        |    (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE)) * 1.0e9)
        |    AS DECIMAL(38,0))) AS gs
        |  FROM e JOIN p0 ON e.src = p0.node GROUP BY e.dst),
        |p1 AS (SELECT sd.node, sd.seed,
        |    (CASE WHEN sd.seed = 1
        |      THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / s
        |      ELSE CAST(0.0 AS DOUBLE) END)
        |    + CAST(0.85 AS DOUBLE) *
        |      (CAST(COALESCE(c1.gs, 0) AS DOUBLE) / 1.0e9) AS pr
        |  FROM sd CROSS JOIN ns LEFT JOIN c1 ON c1.dst = sd.node),
        |c2 AS (SELECT e.dst, SUM(CAST(round(p1.pr *
        |    (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE)) * 1.0e9)
        |    AS DECIMAL(38,0))) AS gs
        |  FROM e JOIN p1 ON e.src = p1.node GROUP BY e.dst),
        |p2 AS (SELECT sd.node, sd.seed,
        |    (CASE WHEN sd.seed = 1
        |      THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / s
        |      ELSE CAST(0.0 AS DOUBLE) END)
        |    + CAST(0.85 AS DOUBLE) *
        |      (CAST(COALESCE(c2.gs, 0) AS DOUBLE) / 1.0e9) AS pr
        |  FROM sd CROSS JOIN ns LEFT JOIN c2 ON c2.dst = sd.node),
        |c3 AS (SELECT e.dst, SUM(CAST(round(p2.pr *
        |    (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE)) * 1.0e9)
        |    AS DECIMAL(38,0))) AS gs
        |  FROM e JOIN p2 ON e.src = p2.node GROUP BY e.dst),
        |p3 AS (SELECT sd.node, sd.seed,
        |    (CASE WHEN sd.seed = 1
        |      THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / s
        |      ELSE CAST(0.0 AS DOUBLE) END)
        |    + CAST(0.85 AS DOUBLE) *
        |      (CAST(COALESCE(c3.gs, 0) AS DOUBLE) / 1.0e9) AS pr
        |  FROM sd CROSS JOIN ns LEFT JOIN c3 ON c3.dst = sd.node)
        |SELECT node, pr FROM p3""".stripMargin,
    // g5: supplier pairs sharing customers, hub-capped at 100 suppliers
    // per customer (QUALIFY mirrors the agg+anti-join), min-weight
    // affinity — integers end to end.
    "g5_copurchase" ->
      """WITH pair AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |capped AS (SELECT * FROM pair
        |  QUALIFY count(*) OVER (PARTITION BY cust) <= 100)
        |SELECT a.supp AS supp_a, b.supp AS supp_b,
        |  CAST(count(*) AS BIGINT) AS n_shared_customers,
        |  CAST(sum(least(a.w, b.w)) AS BIGINT) AS affinity
        |FROM capped a JOIN capped b
        |  ON a.cust = b.cust AND a.supp < b.supp
        |GROUP BY 1, 2""".stripMargin,
    // g6: the g5 hub cap's accounting row — same pair aggregate, one
    // per-customer degree rollup, all-integer except the final fraction.
    "g6_copurchase_report" ->
      """WITH pair AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |deg AS (SELECT cust, count(*) AS n_supp, sum(w) AS wsum
        |  FROM pair GROUP BY cust)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_excluded_hubs,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN wsum ELSE 0 END) AS BIGINT)
        |    AS excluded_edge_w,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN 0 ELSE wsum END) AS BIGINT)
        |    AS kept_edge_w,
        |  CAST(max(n_supp) AS BIGINT) AS max_fanout,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN 0
        |    ELSE n_supp * (n_supp - 1) // 2 END) AS BIGINT)
        |    AS kept_pair_budget,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN wsum ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN n_supp > 100 THEN wsum ELSE 0 END)
        |      + SUM(CASE WHEN n_supp > 100 THEN 0 ELSE wsum END) AS DOUBLE)
        |    AS excluded_frac
        |FROM deg GROUP BY (1=1)""".stripMargin,
    // g8: per-side degree histogram over the shared purchase-pair
    // aggregate — the cap-tuning input for g5/g6.
    "g8_degree_distribution" ->
      """WITH pair AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |cd AS (SELECT 'customer' AS side, CAST(count(*) AS BIGINT)
        |    AS degree FROM pair GROUP BY cust),
        |sd AS (SELECT 'supplier' AS side, CAST(count(*) AS BIGINT)
        |    AS degree FROM pair GROUP BY supp)
        |SELECT side, degree, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM (SELECT * FROM cd UNION ALL SELECT * FROM sd)
        |GROUP BY side, degree""".stripMargin,
    // g9: per-node triangle count + local clustering coefficient over the
    // top-10 affinity neighbor graph (g5's capped projection, sparsified
    // by per-node top-k then symmetrized by union). Degree-ordered
    // orientation — every triangle found exactly once; integers end to
    // end except the final lcc division.
    "g9_triangle_lcc" ->
      """WITH pair AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |capped AS (SELECT * FROM pair
        |  QUALIFY count(*) OVER (PARTITION BY cust) <= 100),
        |cop AS (SELECT a.supp AS sa, b.supp AS sb,
        |    CAST(sum(least(a.w, b.w)) AS BIGINT) AS aff
        |  FROM capped a JOIN capped b
        |    ON a.cust = b.cust AND a.supp < b.supp
        |  GROUP BY 1, 2),
        |dir AS (SELECT sa AS src, sb AS dst, aff FROM cop
        |  UNION ALL SELECT sb, sa, aff FROM cop),
        |knn AS (SELECT src, dst FROM (SELECT src, dst,
        |    row_number() OVER (PARTITION BY src
        |      ORDER BY aff DESC, dst) AS rn FROM dir) WHERE rn <= 10),
        |und AS (SELECT DISTINCT least(src, dst) AS u,
        |    greatest(src, dst) AS v FROM knn),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
        |  (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY node),
        |ed AS (SELECT
        |    CASE WHEN du.degree < dv.degree
        |      OR (du.degree = dv.degree AND und.u < und.v)
        |      THEN und.u ELSE und.v END AS lo,
        |    CASE WHEN du.degree < dv.degree
        |      OR (du.degree = dv.degree AND und.u < und.v)
        |      THEN und.v ELSE und.u END AS hi,
        |    CASE WHEN du.degree < dv.degree
        |      OR (du.degree = dv.degree AND und.u < und.v)
        |      THEN dv.degree ELSE du.degree END AS dhi
        |  FROM und JOIN deg du ON du.node = und.u
        |    JOIN deg dv ON dv.node = und.v),
        |tri AS (SELECT a.lo AS n1, a.hi AS n2, b.hi AS n3
        |  FROM ed a JOIN ed b ON a.lo = b.lo
        |    AND (a.dhi < b.dhi OR (a.dhi = b.dhi AND a.hi < b.hi))
        |  JOIN ed c ON c.lo = a.hi AND c.hi = b.hi),
        |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS t FROM
        |  (SELECT n1 AS node FROM tri UNION ALL SELECT n2 FROM tri
        |   UNION ALL SELECT n3 FROM tri) GROUP BY node)
        |SELECT deg.node AS supp, deg.degree,
        |  CAST(COALESCE(tc.t, 0) AS BIGINT) AS n_triangles,
        |  CASE WHEN deg.degree >= 2 THEN
        |    CAST(2 * COALESCE(tc.t, 0) AS DOUBLE) /
        |    (CAST(deg.degree AS DOUBLE) * CAST(deg.degree - 1 AS DOUBLE))
        |  ELSE CAST(0 AS DOUBLE) END AS lcc
        |FROM deg LEFT JOIN tc ON tc.node = deg.node""".stripMargin,
    // g2: three unrolled SEMI-synchronous LPA rounds over g1's edge CTEs
    // (bipartite 2-coloring: round 1/3 update c:-side dsts, round 2 the
    // s:-side — fully synchronous LPA oscillates on bipartite graphs).
    // Integer vote weights, winner = (vw DESC, lab ASC), pure
    // string/integer arithmetic so no grid rounding is needed anywhere.
    // g2: semi-synchronous LPA unrolled PAST the measured fixpoint over
    // g1's edge CTEs (bipartite 2-coloring: odd rounds update c:-side
    // dsts, even rounds the s:-side — fully synchronous LPA oscillates
    // on bipartite graphs). The Spark side propagates TO FIXPOINT (two
    // consecutive zero-change rounds); a stationary label table is a
    // fixed point of every further round, so the over-unroll matches
    // whatever round the engine stops at. Integer vote weights, winner
    // = (vw DESC, lab ASC), pure string/integer arithmetic so no grid
    // rounding is needed anywhere. Every l-CTE is MATERIALIZED: DuckDB
    // inlines CTEs by default and each round references the previous
    // one twice — an inlined 12-round unroll re-opens the base parquet
    // 2^12 times ("Too many open files").
    "g2_label_prop" -> lpaSql,
    // g14: per-round changed-label counts over g2's unrolled chain —
    // convergence telemetry as a first-class query (see lpaProfileSql).
    "g14_lpa_profile" -> lpaProfileSql,
  )

  /** Rounds unrolled in the g2 oracle — 1.5x the measured fixpoint
    * (7 rounds at sf0.01, 8 at sf0.1; see `Graph.lpaLabels`). */
  final val lpaUnrolledRounds = 12

  /** Final projection of the g2 oracle — the anchor the derived oracles
    * (g3/g4/g7) swap their aggregates into. */
  def lpaFinalTable: String = s"l$lpaUnrolledRounds"
  def lpaFinalSelect: String =
    s"SELECT node, lab AS label FROM $lpaFinalTable"

  /** The shared WITH chain of the unrolled LPA oracles (g2 and g14):
    * edge CTEs + `lpaUnrolledRounds` materialized label rounds. */
  private def lpaWith: String = {
    val rounds = (1 to lpaUnrolledRounds).map { i =>
      val side = if (i % 2 == 1) "c:%" else "s:%"
      s"""v$i AS (SELECT e.dst, l.lab, SUM(e.w) AS vw
         |  FROM e JOIN l${i - 1} l ON e.src = l.node
         |  WHERE e.dst LIKE '$side' GROUP BY 1, 2),
         |w$i AS (SELECT dst, lab FROM (
         |  SELECT dst, lab, row_number() OVER (PARTITION BY dst
         |    ORDER BY vw DESC, lab) AS rn FROM v$i) WHERE rn = 1),
         |l$i AS MATERIALIZED (SELECT l${i - 1}.node,
         |  COALESCE(w$i.lab, l${i - 1}.lab) AS lab
         |  FROM l${i - 1} LEFT JOIN w$i ON w$i.dst = l${i - 1}.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairc AS (SELECT o_custkey AS cust, l_suppkey AS supp,
       |    count(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |e AS MATERIALIZED (SELECT 'c:' || cust AS src, 's:' || supp AS dst, w
       |  FROM pairc
       |  UNION ALL
       |  SELECT 's:' || supp, 'c:' || cust, w FROM pairc),
       |nd AS (SELECT DISTINCT src AS node FROM e),
       |l0 AS MATERIALIZED (SELECT node, node AS lab FROM nd),
       |$rounds""".stripMargin
  }

  private def lpaSql: String = s"$lpaWith\n$lpaFinalSelect"

  /** g14: per-round changed-label counts over the SAME unrolled chain —
    * only rounds with changes emit a row, so the engine's trailing
    * zero-change rounds and the oracle's over-unrolled no-op rounds
    * both contribute nothing and the two sides agree whatever round
    * each stops at (the g2/g11 over-unroll algebra, applied to the
    * convergence telemetry itself). */
  def lpaProfileSql: String = {
    val diffs = (1 to lpaUnrolledRounds).map { i =>
      s"""SELECT $i AS round, CAST(count(*) AS BIGINT) AS n_changed
         |FROM l$i a JOIN l${i - 1} b ON a.node = b.node
         |WHERE a.lab <> b.lab""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$lpaWith,
       |chg AS ($diffs)
       |SELECT round, n_changed FROM chg WHERE n_changed > 0""".stripMargin
  }
}
