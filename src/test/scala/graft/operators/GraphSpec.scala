package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // purchase graph: supplier 1 is bought from by customers 10, 11, 12;
  // supplier 2 only by customer 10 (and with fewer items)
  private def fixture = {
    val lineitem = Seq(
      (100L, 1L), (100L, 1L), (101L, 1L), (102L, 1L),
      (100L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val orders = Seq(
      (100L, 10L), (101L, 11L), (102L, 12L))
      .toDF("o_orderkey", "o_custkey")
    (lineitem, orders)
  }

  test("pageRank: mass conserved, degree-central supplier ranks highest") {
    val (li, ord) = fixture
    val out = Graph.pageRank(li, ord).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // undirected walk has no dangling mass: ranks sum to 1 up to the
    // 1e-9 contribution grid (|V| * iterations * 1e-9 worst case)
    assert(math.abs(out.values.sum - 1.0) < 1e-6,
      s"rank mass drifted: ${out.values.sum} in $out")
    assert(out("s:1") > out("s:2"),
      s"three-buyer supplier must outrank the single-buyer one: $out")
    assert(out("c:10") > out("c:11"),
      s"two-supplier customer must outrank single-supplier ones: $out")
    // every node present
    assert(out.keySet == Set("c:10", "c:11", "c:12", "s:1", "s:2"))
  }

  test("labelPropagation: weighted votes converge, community = label") {
    val (li, ord) = fixture
    val out = Graph.labelPropagation(li, ord).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet == Set("c:10", "c:11", "c:12", "s:1", "s:2"))
    // round 1: every customer's only/heaviest neighbor is s:1's label
    // 's:1'... after 3 synchronous rounds, the dense star around s:1
    // agrees on ONE community label; s:2 (one weak edge to c:10) follows
    // c:10's label — a single community, as the structure demands
    assert(out.values.toSet.size == 1,
      s"one dense community expected, got $out")
    // deterministic: re-running under different partitioning is identical
    val alt = Graph.labelPropagation(li.repartition(7), ord.repartition(3))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(alt == out, s"partitioning moved labels:\n$alt\n$out")
  }

  test("labelPropagation reports per-round convergence (changed labels)") {
    val (li, ord) = fixture
    Graph.labelPropagation(li, ord)
    // round 1 (customer side): all three customers adopt s:1's label;
    // round 2 (supplier side): s:1 keeps its own label (unanimous votes),
    // s:2 follows c:10 into the s:1 community; rounds 3 and 4 both move
    // nothing — two consecutive zero-change rounds prove both color
    // classes stable, so the fixpoint loop stops there (no fixed budget)
    assert(Graph.lastLpaRoundChanges == Seq(3L, 1L, 0L, 0L),
      s"per-round changed-label telemetry drifted: " +
        s"${Graph.lastLpaRoundChanges}")
  }

  test("labelPropagation separates disconnected communities") {
    // two disjoint purchase stars: {c:10,c:11}↔s:1 and {c:20,c:21}↔s:2
    val li = Seq((100L, 1L), (101L, 1L), (200L, 2L), (201L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 11L), (200L, 20L), (201L, 21L))
      .toDF("o_orderkey", "o_custkey")
    val out = Graph.labelPropagation(li, ord).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("c:10") == out("c:11") && out("c:10") == out("s:1"))
    assert(out("c:20") == out("c:21") && out("c:20") == out("s:2"))
    assert(out("s:1") != out("s:2"),
      s"disconnected components must not share a label: $out")
  }

  test("communityStats: node counts and edge mass per detected community") {
    // two disjoint stars → two communities, each fully internal
    val li = Seq((100L, 1L), (101L, 1L), (200L, 2L), (201L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 11L), (200L, 20L), (201L, 21L))
      .toDF("o_orderkey", "o_custkey")
    val out = Graph.communityStats(li, ord).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out.size == 2, s"two communities expected: $out")
    // each star: 3 nodes, 2 undirected edges → 4 rows of the doubled
    // table, weight 1 each; everything internal
    out.values.foreach { case (n, internal, incident, frac) =>
      assert(n == 3L && internal == 4L && incident == 4L && frac == 1.0,
        s"star community stats: $out")
    }
  }

  test("bridgeNodes flags the customer straddling two communities") {
    // two purchase stars, plus customer 30 buying once from EACH
    // supplier — the one node whose neighborhood spans both communities
    val li = Seq((100L, 1L), (101L, 1L), (200L, 2L), (201L, 2L),
      (300L, 1L), (301L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 11L), (200L, 20L), (201L, 21L),
      (300L, 30L), (301L, 30L))
      .toDF("o_orderkey", "o_custkey")
    val out = Graph.bridgeNodes(li, ord).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getBoolean(6)))).toMap
    // c:30 sees both labels: 2 incident unit edges, one external
    assert(out("c:30") == ((2L, 2L, 1L, 0.5, true)), s"$out")
    // interior customers see exactly their own community
    assert(out("c:10") == ((1L, 1L, 0L, 0.0, false)), s"$out")
    assert(out("c:20") == ((1L, 1L, 0L, 0.0, false)), s"$out")
    // the supplier c:30 did NOT side with sees one external edge (c:30's)
    val bridgeSuppliers = Seq("s:1", "s:2").filter(s => out(s)._5)
    assert(bridgeSuppliers.size == 1, s"$out")
    val (nl, wt, wx, frac, _) = out(bridgeSuppliers.head)
    assert(nl == 2L && wt == 3L && wx == 1L &&
      math.abs(frac - 1.0 / 3.0) < 1e-15, s"$out")
    // every node of the graph is reported
    assert(out.keySet ==
      Set("c:10", "c:11", "c:20", "c:21", "c:30", "s:1", "s:2"))
  }

  test("coPurchasePairs: shared-customer pairs with min-weight affinity") {
    // cust 10: s1 w=2, s2 w=1; cust 11: s1 w=1, s2 w=3; cust 12: s1 only
    val li = Seq(
      (100L, 1L), (100L, 1L), (101L, 2L),
      (110L, 1L), (111L, 2L), (111L, 2L), (111L, 2L),
      (120L, 1L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 10L), (110L, 11L), (111L, 11L),
      (120L, 12L)).toDF("o_orderkey", "o_custkey")
    val out = Graph.coPurchasePairs(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // one pair, ordered supp_a < supp_b; affinity = min(2,1) + min(1,3)
    assert(out == Map((1L, 2L) -> ((2L, 2L))), s"$out")
  }

  test("coPurchasePairs: hub customers are excluded before the self-join") {
    // cust 99 buys from three suppliers; with maxSupp=2 every pair it
    // would contribute disappears, leaving only cust 10's (s1,s2)
    val li = Seq(
      (100L, 1L), (101L, 2L),
      (900L, 1L), (901L, 2L), (902L, 3L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 10L),
      (900L, 99L), (901L, 99L), (902L, 99L))
      .toDF("o_orderkey", "o_custkey")
    val capped = Graph.coPurchasePairs(li, ord, maxSupp = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(capped == Map((1L, 2L) -> ((1L, 1L))), s"$capped")
    // default cap admits the hub: all three pairs appear, (s1,s2) gains
    // cust 99's shared row
    val open = Graph.coPurchasePairs(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(open == Map(
      (1L, 2L) -> ((2L, 2L)),
      (1L, 3L) -> ((1L, 1L)),
      (2L, 3L) -> ((1L, 1L))), s"$open")
  }

  test("coPurchaseGovernance accounts for every excluded hub (no silent cap)") {
    // same planted hub as the cap test: cust 99 has 3 suppliers (w=1
    // each), cust 10 has 2 (w=1 each); with maxSupp=2 the hub and its 3
    // edge-weight units must be REPORTED, not silently dropped
    val li = Seq(
      (100L, 1L), (101L, 2L),
      (900L, 1L), (901L, 2L), (902L, 3L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 10L),
      (900L, 99L), (901L, 99L), (902L, 99L))
      .toDF("o_orderkey", "o_custkey")
    val r = Graph.coPurchaseGovernance(li, ord, maxSupp = 2).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n_customers")) == 2L)
    assert(row.getLong(row.fieldIndex("n_excluded_hubs")) == 1L, s"$row")
    assert(row.getLong(row.fieldIndex("excluded_edge_w")) == 3L, s"$row")
    assert(row.getLong(row.fieldIndex("kept_edge_w")) == 2L, s"$row")
    assert(row.getLong(row.fieldIndex("max_fanout")) == 3L)
    // kept self-join budget: C(2,2 choose)=1 pair row from cust 10
    assert(row.getLong(row.fieldIndex("kept_pair_budget")) == 1L)
    assert(math.abs(row.getDouble(row.fieldIndex("excluded_frac")) - 0.6)
      < 1e-12, s"$row")
    // no hubs under the default cap: zero excluded, zero excluded mass
    val open = Graph.coPurchaseGovernance(li, ord).collect().head
    assert(open.getLong(open.fieldIndex("n_excluded_hubs")) == 0L)
    assert(open.getLong(open.fieldIndex("excluded_edge_w")) == 0L)
  }

  test("labelIndex: stored labels serve g3/g4 identically to inline LPA") {
    val (li, ord) = fixture
    val inlineStats = Graph.communityStats(li, ord).collect()
      .map(_.toSeq).sortBy(_.toString)
    val inlineBridges = Graph.bridgeNodes(li, ord).collect()
      .map(_.toSeq).sortBy(_.toString)
    // the index round-trips through parquet — the stored-lake-table
    // shape every other *VsIndex family pins
    val idx = Graph.labelIndex(li, ord)
    val dir = java.nio.file.Files.createTempDirectory("graft-lpa-spec-")
    idx.labels.write.parquet(s"$dir/labels")
    idx.edges.write.parquet(s"$dir/edges")
    val stored = Graph.LabelIndex(spark.read.parquet(s"$dir/labels"),
      spark.read.parquet(s"$dir/edges"), idx.maxIters)
    assert(Graph.communityStats(stored).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq == inlineStats.toSeq)
    assert(Graph.bridgeNodes(stored).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq == inlineBridges.toSeq)
  }

  test("degreeDistribution: per-side histogram, hand-checked") {
    val (li, ord) = fixture
    // customers: c10 has 2 suppliers, c11/c12 have 1; suppliers: s1 has
    // 3 customers, s2 has 1
    val out = Graph.degreeDistribution(li, ord).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("customer", 2L) -> 1L, ("customer", 1L) -> 2L,
      ("supplier", 3L) -> 1L, ("supplier", 1L) -> 1L), s"$out")
  }

  test("modularity: one community scores 0; two disjoint stars score 0.5") {
    // the star fixture converges to ONE community: I = D = T, so
    // Q = T/T − (T/T)² = 0 exactly — the "no structure beyond chance"
    // reading a single all-absorbing label deserves
    val (li, ord) = fixture
    val r = Graph.modularity(li, ord).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 10L &&
      r.getLong(2) == 10L, s"$r")
    assert(r.getDouble(3) == 0.0, s"$r")
    // two disjoint stars: T=8, two communities each I=D=4 →
    // Q = 8/8 − 2·(4/8)² = 0.5 — strong structure
    val li2 = Seq((100L, 1L), (101L, 1L), (200L, 2L), (201L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val ord2 = Seq((100L, 10L), (101L, 11L), (200L, 20L), (201L, 21L))
      .toDF("o_orderkey", "o_custkey")
    val r2 = Graph.modularity(li2, ord2).collect().head
    assert(r2.getLong(0) == 2L, s"$r2")
    assert(math.abs(r2.getDouble(3) - 0.5) < 1e-12, s"$r2")
  }

  // one customer buying from s1,s2,s3 makes the projection triangle
  // {1,2,3}; customer 11 hangs s4 off s1 as a degree-1 pendant
  private def triangleFixture = {
    val li = Seq((100L, 1L), (100L, 2L), (100L, 3L), (110L, 1L),
      (110L, 4L)).toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (110L, 11L)).toDF("o_orderkey", "o_custkey")
    (li, ord)
  }

  test("triangleStats: hand-checked triangle, pendant, lcc values") {
    val (li, ord) = triangleFixture
    val out = Graph.triangleStats(li, ord).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // edges: (1,2),(1,3),(2,3),(1,4) — degrees 3,2,2,1; one triangle
    assert(out(1L) == ((3L, 1L, 2.0 / 6.0)), s"$out")
    assert(out(2L) == ((2L, 1L, 1.0)), s"$out")
    assert(out(3L) == ((2L, 1L, 1.0)), s"$out")
    assert(out(4L) == ((1L, 0L, 0.0)), s"$out")
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("triangleStats: k=1 sparsification breaks the triangle (ties by id)") {
    val (li, ord) = triangleFixture
    // each node keeps only its strongest neighbor (ties → lowest id):
    // s1→s2, s2→s1, s3→s1, s4→s1; the union is the star around s1 —
    // no triangles survive the sparsifier
    val out = Graph.triangleStats(li, ord, k = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 0L)), s"$out")
    assert(out(2L) == ((1L, 0L)), s"$out")
    assert(out(3L) == ((1L, 0L)), s"$out")
    assert(out(4L) == ((1L, 0L)), s"$out")
  }

  test("transitivity: 3T over wedge count, hand-checked") {
    val (li, ord) = triangleFixture
    val r = Graph.transitivity(li, ord).collect().head
    assert(r.getLong(r.fieldIndex("n_nodes")) == 4L, s"$r")
    assert(r.getLong(r.fieldIndex("n_edges")) == 4L, s"$r")
    // wedges: per node C(d,2) over degrees 3,2,2,1 → 3+1+1+0 = 5
    assert(r.getLong(r.fieldIndex("n_wedges")) == 5L, s"$r")
    assert(r.getLong(r.fieldIndex("n_triangles")) == 1L, s"$r")
    assert(r.getDouble(r.fieldIndex("transitivity")) == 3.0 / 5.0, s"$r")
    // star graph (k=1 sparsified): wedges but no triangles → 0.0
    val star = Graph.transitivity(li, ord, k = 1).collect().head
    assert(star.getLong(star.fieldIndex("n_triangles")) == 0L, s"$star")
    assert(star.getDouble(star.fieldIndex("transitivity")) == 0.0, s"$star")
  }

  test("kcore: triangle survives, pendant peels, path fully peels") {
    val (li, ord) = triangleFixture
    val out = Graph.kcore(li, ord).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // the triangle {1,2,3} is the 2-core; s1 loses its pendant edge so
    // its in-core degree is 2, not 3; pendant s4 is peeled
    assert(out(1L) == ((3L, 2L, true)), s"$out")
    assert(out(2L) == ((2L, 2L, true)), s"$out")
    assert(out(3L) == ((2L, 2L, true)), s"$out")
    assert(out(4L) == ((1L, 0L, false)), s"$out")
    // fixpoint semantics: the loop stops at the first zero-peel round
    // (round 2 proves round 1's survivor set stable) — no fixed budget
    assert(Graph.lastKcorePeeled == Seq(1L, 0L),
      s"${Graph.lastKcorePeeled}")
    // a pure path has NO 2-core: peeling the endpoints strands the
    // middle node, so everything unravels
    val li2 = Seq((100L, 1L), (100L, 2L), (110L, 2L), (110L, 3L))
      .toDF("l_orderkey", "l_suppkey")
    val ord2 = Seq((100L, 10L), (110L, 11L))
      .toDF("o_orderkey", "o_custkey")
    val path = Graph.kcore(li2, ord2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(path == Map(1L -> false, 2L -> false, 3L -> false), s"$path")
  }

  test("kcore peels a long path to fixpoint (needs more than 3 rounds)") {
    // path s1-s2-…-s8 via one customer per adjacent pair: a 2-core peel
    // unravels it from the endpoints inward, needing 4 rounds — the
    // exact regime where round 11's fixed 3-round budget stopped early
    // and reported the half-peeled middle as in_core
    val li = Seq((100L, 1L), (100L, 2L), (110L, 2L), (110L, 3L),
      (120L, 3L), (120L, 4L), (130L, 4L), (130L, 5L),
      (140L, 5L), (140L, 6L), (150L, 6L), (150L, 7L),
      (160L, 7L), (160L, 8L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (110L, 11L), (120L, 12L), (130L, 13L),
      (140L, 14L), (150L, 15L), (160L, 16L))
      .toDF("o_orderkey", "o_custkey")
    val out = Graph.kcore(li, ord).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.size == 8 && out.values.forall(_ == false),
      s"a path has no 2-core; fixpoint peel must empty it: $out")
    // round 1 drops {1,8} and strands {2,7} (peel compounds within the
    // round: n counts deg>=2 AFTER induction); then {3,6}, then {4,5},
    // then the stability round — 4 rounds, past the old 3-round budget
    assert(Graph.lastKcorePeeled == Seq(4L, 2L, 2L, 0L),
      s"${Graph.lastKcorePeeled}")
  }

  test("kcore/componentSizes served from a parquet-stored neighbor index" +
    " equal inline") {
    val (li, ord) = triangleFixture
    val dir = java.nio.file.Files.createTempDirectory("graft-knn-spec-")
    Graph.neighborIndex(li, ord).edges.write.parquet(s"$dir/edges")
    val stored = Graph.NeighborIndex(
      spark.read.parquet(s"$dir/edges"), maxSupp = 100, k = 10)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(sorted(Graph.kcore(stored, k = 2, maxRounds = 64)) ==
      sorted(Graph.kcore(li, ord)), "stored kcore drifted from inline")
    assert(sorted(Graph.componentSizes(stored)) ==
      sorted(Graph.componentSizes(li, ord)),
      "stored componentSizes drifted from inline")
    assert(sorted(Graph.triangleStats(stored)) ==
      sorted(Graph.triangleStats(li, ord)),
      "stored triangleStats drifted from inline")
  }

  test("neighborChurn: kept/added/removed edges between builds") {
    // stored build saw only customer 10's clique {1,2,3}; the fresh
    // build adds customer 20's pair {7,8} — 3 kept, 1 added, 0 removed
    val liOld = Seq((100L, 1L), (100L, 2L), (100L, 3L))
      .toDF("l_orderkey", "l_suppkey")
    val liNew = liOld.unionByName(
      Seq((200L, 7L), (200L, 8L)).toDF("l_orderkey", "l_suppkey"))
    val ordOld = Seq((100L, 10L)).toDF("o_orderkey", "o_custkey")
    val ordNew = Seq((100L, 10L), (200L, 20L))
      .toDF("o_orderkey", "o_custkey")
    val r = Graph.neighborChurn(
      Graph.neighborIndex(liNew, ordNew),
      Graph.neighborIndex(liOld, ordOld)).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 3L && r.head.getLong(1) == 1L &&
      r.head.getLong(2) == 0L, s"${r.head}")
    assert(r.head.getDouble(3) == 1.0 / 4.0, s"${r.head}")
    // identical builds churn zero
    val same = Graph.neighborChurn(
      Graph.neighborIndex(liNew, ordNew),
      Graph.neighborIndex(liNew, ordNew)).collect().head
    assert(same.getLong(1) == 0L && same.getLong(2) == 0L &&
      same.getDouble(3) == 0.0)
    // removal-heavy direction (ADVICE r12): the union denominator keeps
    // churn in [0,1] — fresh=old vs stored=new reads 3 kept, 0 added,
    // 1 removed → 1/4 (a fresh-size denominator would say 1/3, and
    // 100% removals would exceed 1.0)
    val rev = Graph.neighborChurn(
      Graph.neighborIndex(liOld, ordOld),
      Graph.neighborIndex(liNew, ordNew)).collect().head
    assert(rev.getLong(0) == 3L && rev.getLong(1) == 0L &&
      rev.getLong(2) == 1L, s"$rev")
    assert(rev.getDouble(3) == 1.0 / 4.0, s"$rev")
    // empty fresh vs nonempty stored: every edge removed → churn exactly
    // 1.0, not Infinity (the old fresh-size denominator divided by zero)
    val emptyIdx = Graph.NeighborIndex(
      Seq.empty[(Long, Long)].toDF("u", "v"), maxSupp = 100, k = 10)
    val gone = Graph.neighborChurn(
      emptyIdx, Graph.neighborIndex(liNew, ordNew)).collect().head
    assert(gone.getLong(0) == 0L && gone.getLong(1) == 0L &&
      gone.getLong(2) == 4L, s"$gone")
    assert(gone.getDouble(3) == 1.0, s"$gone")
    // both sides empty: empty report (the empty-input contract)
    assert(Graph.neighborChurn(emptyIdx, emptyIdx).collect().isEmpty)
  }

  test("componentSizesFrom: stored members table serves g12 ≡ inline") {
    val (li, ord) = triangleFixture
    val idx = Graph.neighborIndex(li, ord)
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-spec-")
    Graph.componentMembers(idx).write.parquet(s"$dir/members")
    idx.edges.write.parquet(s"$dir/edges")
    val served = Graph.componentSizesFrom(
      spark.read.parquet(s"$dir/edges"),
      spark.read.parquet(s"$dir/members"))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(sorted(served) == sorted(Graph.componentSizes(li, ord)),
      "stored-members componentSizes drifted from inline")
  }

  test("convergenceReport: cap-hit surfaces as converged=false data") {
    val (li, ord) = triangleFixture
    // a full-cap run converges: both ops report converged=true
    Graph.labelPropagation(li, ord)
    Graph.kcore(li, ord)
    val ok = Graph.convergenceReport(spark).collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(ok == Map("lpa" -> true, "kcore" -> true), s"$ok")
    // an 8-node path needs 4 peel rounds; a 2-round cap must surface
    // converged=false AS DATA (not just the log warning) so a downstream
    // job can refuse the artifact
    val liPath = (1L to 7L).flatMap(i =>
      Seq((i * 10, i), (i * 10, i + 1))).toDF("l_orderkey", "l_suppkey")
    val ordPath = (1L to 7L).map(i => (i * 10, 100 + i))
      .toDF("o_orderkey", "o_custkey")
    Graph.kcore(liPath, ordPath, k = 2, maxRounds = 2)
    val capped = Graph.convergenceReport(spark).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getBoolean(4)))
      .filter(_._1 == "kcore").toSeq
    assert(capped == Seq(("kcore", 2, false)), s"$capped")
    // and LPA under a 1-round cap cannot prove the two-zero fixpoint
    Graph.labelPropagation(li, ord, maxIters = 1)
    val lpaCapped = Graph.convergenceReport(spark).collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(lpaCapped("lpa") == false, s"$lpaCapped")
    // restore converged state for any later spec reading the globals
    Graph.labelPropagation(li, ord)
    Graph.kcore(li, ord)
  }

  test("label build publishes its own profile + convergence row; a " +
    "pinned cap-hit build is refusable by data") {
    import graft.sources.IndexStore
    val (li, ord) = fixture
    val family = "spec:lpa-artifacts"
    // a healthy build: full cap, converges
    val b1 = IndexStore.publish(family) { dir =>
      Graph.writeLabelArtifacts(spark, Graph.labelIndex(li, ord), dir)
    }
    // the stored profile is the same stop-point-independent row set the
    // inline lpaProfile form produces (g14's stored-serve equivalence)
    val stored = spark.read.parquet(s"${b1.dir}/profile").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val inline = Graph.lpaProfile(li, ord).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(stored == inline, s"stored profile drifted:\n$stored\n$inline")
    val conv1 = spark.read.parquet(s"${b1.dir}/convergence").collect()
    assert(conv1.length == 1 && conv1(0).getString(0) == "lpa" &&
      conv1(0).getBoolean(4), s"healthy build's row: ${conv1.toSeq}")
    // a cap-hit build (maxIters=1 cannot prove the two-zero fixpoint):
    // ITS convergence row says false, per build, not session-global
    val b2 = IndexStore.publish(family) { dir =>
      Graph.writeLabelArtifacts(spark,
        Graph.labelIndex(li, ord, maxIters = 1), dir)
    }
    assert(IndexStore.pin(family, b2.buildId))
    val conv2 = spark.read.parquet(s"${b2.dir}/convergence").collect()
    assert(conv2.length == 1 && !conv2(0).getBoolean(4),
      s"cap-hit build must be refusable by data: ${conv2.toSeq}")
    // the healthy build's row is untouched by the cap-hit build landing
    assert(spark.read.parquet(s"${b1.dir}/convergence").collect()(0)
      .getBoolean(4), "build 1's convergence row was overwritten")
    IndexStore.unpin(family, b2.buildId)
    // restore converged globals for any later spec reading them
    Graph.labelPropagation(li, ord)
  }

  test("componentSizes: two disjoint affinity cliques, hand-checked") {
    // two disjoint purchase stars that project to two disjoint supplier
    // cliques: {1,2,3} (customer 10) and {7,8} (customer 20)
    val li = Seq((100L, 1L), (100L, 2L), (100L, 3L),
      (200L, 7L), (200L, 8L)).toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (200L, 20L))
      .toDF("o_orderkey", "o_custkey")
    val out = Graph.componentSizes(li, ord).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((3L, 3L)), 7L -> ((2L, 1L))), s"$out")
  }

  test("transitivityOf a parquet-stored per-node table equals inline") {
    val (li, ord) = triangleFixture
    val inline = Graph.transitivity(li, ord).collect().map(_.toSeq).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-tri-spec-")
    Graph.triangleStats(li, ord).write.parquet(s"$dir/pernode")
    val served = Graph.transitivityOf(spark.read.parquet(s"$dir/pernode"))
      .collect().map(_.toSeq).toSeq
    assert(served == inline, s"stored serve drifted:\n$served\n$inline")
  }

  test("triangleStats is partition-invariant") {
    val (li, ord) = triangleFixture
    def run(parts: Int) =
      Graph.triangleStats(li.repartition(parts), ord.repartition(parts))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(run(1) == run(7))
  }

  test("personalizedPageRank: mass stays near seeds, totals 1, invariant") {
    // suppliers 10 (seed: 10 % 10 == 0) and 3 (non-seed); connected graph
    val li = Seq((100L, 10L), (100L, 10L), (101L, 10L), (102L, 10L),
      (100L, 3L)).toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 11L), (102L, 12L))
      .toDF("o_orderkey", "o_custkey")
    val out = Graph.personalizedPageRank(li, ord).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("c:10", "c:11", "c:12", "s:10", "s:3"))
    // teleport goes only to the seed; total mass stays 1 (connected
    // undirected graph, grid slack)
    assert(math.abs(out.values.sum - 1.0) < 1e-6, s"mass: $out")
    // proximity-to-seed ordering: s:3 sits two hops from the seed and
    // hangs off one weak edge — it must rank strictly last, far below
    // the seed and the seed's direct heavy neighbor
    assert(out("s:3") == out.values.min, s"far node not last: $out")
    assert(out("s:3") > 0.0 && out("s:3") < out("s:10") / 5, s"$out")
    assert(out("c:10") > out("c:11"), // heavier edge to the seed
      s"edge weight must matter: $out")
    val alt = Graph.personalizedPageRank(li.repartition(7),
      ord.repartition(3)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(alt == out, s"partitioning changed PPR:\n$alt\n$out")
  }

  test("featureProp: one- and two-hop neighbor means, hand-checked") {
    // path graph 1 — 2 — 3 with balances 10.0, 20.0, 40.0
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val supplier = Seq((1L, 10.0), (2L, 20.0), (3L, 40.0))
      .toDF("s_suppkey", "s_acctbal")
    val out = Graph.featureProp(Graph.NeighborIndex(edges, 100, 10),
      supplier).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // h1: node 1 sees {20}, node 2 sees {10,40} -> 25, node 3 sees {20}
    assert(out(1L) == ((10.0, 1L, 20.0, 25.0)), s"node1: $out")
    assert(out(2L) == ((20.0, 2L, 25.0, 20.0)), s"node2: $out")
    // h2(3) = mean of h1(2) = 25
    assert(out(3L) == ((40.0, 1L, 20.0, 25.0)), s"node3: $out")
  }

  test("pageRank is partition- and AQE-invariant (grid-exact sums)") {
    val (li, ord) = fixture
    def run(parts: Int) =
      Graph.pageRank(li.repartition(parts), ord.repartition(parts))
        .collect().map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
    val a = run(1)
    val b = run(7)
    assert(a == b, s"partitioning changed bit-exact ranks:\n$a\n$b")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try assert(run(3) == a, "AQE-off drifted")
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
