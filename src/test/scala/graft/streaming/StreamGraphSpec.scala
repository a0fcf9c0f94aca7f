package graft.streaming

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.operators.Graph

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming community membership: per-batch lookups against the stored
  * label index must equal the batch twin on the same frames, through a
  * parquet round-trip of the index (the lake-table shape the nightly
  * build writes). */
class StreamGraphSpec extends SparkSpec {
  import spark.implicits._

  // the GraphSpec star: s:1 bought by c:10/c:11/c:12, s:2 only by c:10 —
  // one dense community; c:10 is the only multi-supplier customer
  private def index = {
    val lineitem = Seq(
      (100L, 1L), (100L, 1L), (101L, 1L), (102L, 1L),
      (100L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val orders = Seq(
      (100L, 10L), (101L, 11L), (102L, 12L))
      .toDF("o_orderkey", "o_custkey")
    Graph.labelIndex(lineitem, orders)
  }

  test("batchMembership: stored labels serve lookups; unknown nodes flagged") {
    val idx = index
    val dir = java.nio.file.Files.createTempDirectory("graft-sg-")
    idx.labels.write.parquet(s"$dir/labels")
    Graph.bridgeNodes(idx).write.parquet(s"$dir/bridges")
    val labels = spark.read.parquet(s"$dir/labels")
    val bridges = spark.read.parquet(s"$dir/bridges")

    val batch = Seq(("c:10", 7L), ("s:2", 8L), ("c:99", 9L))
      .toDF("node", "payload")
    val out = StreamGraph.batchMembership(batch, labels, bridges)
      .collect()
      .map(r => r.getString(r.fieldIndex("node")) ->
        ((Option(r.getString(r.fieldIndex("label"))),
          r.getBoolean(r.fieldIndex("is_known")),
          r.getBoolean(r.fieldIndex("is_bridge"))))).toMap
    // known nodes carry the community label the batch LPA assigned
    val lab = idx.labels.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("c:10") == ((Some(lab("c:10")), true, false)), s"$out")
    assert(out("s:2") == ((Some(lab("s:2")), true, false)), s"$out")
    // a node that arrived after the build misses loudly, never wrongly
    assert(out("c:99") == ((None, false, false)), s"$out")
    // the single-community star has no bridges; payload survives the joins
    assert(StreamGraph.batchMembership(batch, labels, bridges)
      .select("payload").collect().map(_.getLong(0)).toSet ==
      Set(7L, 8L, 9L))
  }

  test("coreMembershipVsIndex: per-batch core lookups equal the batch " +
    "twin through a parquet round-trip") {
    // the GraphSpec triangle + pendant: suppliers {1,2,3} form the
    // 2-core, 4 hangs off 1 — kcore's output written as a lake table
    val lineitem = Seq((100L, 1L), (100L, 2L), (100L, 3L), (110L, 1L),
      (110L, 4L)).toDF("l_orderkey", "l_suppkey")
    val orders = Seq((100L, 10L), (110L, 11L))
      .toDF("o_orderkey", "o_custkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-sgc-")
    Graph.kcore(lineitem, orders).write.parquet(s"$dir/core")
    val core = spark.read.parquet(s"$dir/core")

    implicit val sqlCtx = spark.sqlContext
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Boolean, Boolean, Long, Long)]()
    val input = MemoryStream[(Long, Long)]
    val q = StreamGraph.coreMembershipVsIndex(
      input.toDF().toDF("node", "payload"), core,
      df => df.collect().foreach(r => rows.add((
        r.getLong(r.fieldIndex("node")),
        r.getBoolean(r.fieldIndex("in_core")),
        r.getBoolean(r.fieldIndex("is_known")),
        r.getLong(r.fieldIndex("core_degree")),
        r.getLong(r.fieldIndex("batch_id"))))))
    try {
      input.addData(Seq((1L, 7L), (4L, 8L)))
      q.processAllAvailable()
      input.addData(Seq((99L, 9L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows.asScala.toSet
    def twin(batch: Seq[(Long, Long)], id: Long) =
      StreamGraph.batchCoreMembership(
          batch.toDF("node", "payload"), core)
        .collect().map(r => (
          r.getLong(r.fieldIndex("node")),
          r.getBoolean(r.fieldIndex("in_core")),
          r.getBoolean(r.fieldIndex("is_known")),
          r.getLong(r.fieldIndex("core_degree")), id))
    val want = (twin(Seq((1L, 7L), (4L, 8L)), 0L) ++
      twin(Seq((99L, 9L)), 1L)).toSet
    assert(got == want, s"stream rows must equal batch twin:\n$got\n$want")
    // core member, pendant, and post-build node all classified
    assert(got.exists(r => r._1 == 1L && r._2 && r._3 && r._4 == 2L))
    assert(got.exists(r => r._1 == 4L && !r._2 && r._3))
    assert(got.exists(r => r._1 == 99L && !r._2 && !r._3))
  }

  test("componentMembershipVsIndex: per-batch component lookups equal " +
    "the batch twin through a parquet round-trip") {
    // two disjoint cliques: {1,2,3} (cust 10) and {7,8} (cust 20)
    val lineitem = Seq((100L, 1L), (100L, 2L), (100L, 3L),
      (200L, 7L), (200L, 8L)).toDF("l_orderkey", "l_suppkey")
    val orders = Seq((100L, 10L), (200L, 20L))
      .toDF("o_orderkey", "o_custkey")
    val nIdx = Graph.neighborIndex(lineitem, orders)
    val dir = java.nio.file.Files.createTempDirectory("graft-sgm-")
    Graph.componentMembers(nIdx).write.parquet(s"$dir/members")
    Graph.componentSizes(nIdx).write.parquet(s"$dir/sizes")
    val members = spark.read.parquet(s"$dir/members")
    val sizes = spark.read.parquet(s"$dir/sizes")

    implicit val sqlCtx = spark.sqlContext
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Option[Long], Boolean, Long)]()
    val input = MemoryStream[(Long, Long)]
    val q = StreamGraph.componentMembershipVsIndex(
      input.toDF().toDF("node", "payload"), members, sizes,
      df => df.collect().foreach(r => rows.add((
        r.getLong(r.fieldIndex("node")),
        if (r.isNullAt(r.fieldIndex("component"))) None
        else Some(r.getLong(r.fieldIndex("component"))),
        r.getBoolean(r.fieldIndex("is_known")),
        r.getLong(r.fieldIndex("batch_id"))))))
    try {
      input.addData(Seq((2L, 1L), (8L, 2L)))
      q.processAllAvailable()
      input.addData(Seq((99L, 3L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows.asScala.toSet
    def twin(batch: Seq[(Long, Long)], id: Long) =
      StreamGraph.batchComponentMembership(
          batch.toDF("node", "payload"), members, sizes)
        .collect().map(r => (
          r.getLong(r.fieldIndex("node")),
          if (r.isNullAt(r.fieldIndex("component"))) None
          else Some(r.getLong(r.fieldIndex("component"))),
          r.getBoolean(r.fieldIndex("is_known")), id))
    val want = (twin(Seq((2L, 1L), (8L, 2L)), 0L) ++
      twin(Seq((99L, 3L)), 1L)).toSet
    assert(got == want, s"stream rows must equal batch twin:\n$got\n$want")
    // nodes land in their own components; the post-build node misses
    assert(got.exists(r => r._1 == 2L && r._2 == Some(1L) && r._3))
    assert(got.exists(r => r._1 == 8L && r._2 == Some(7L) && r._3))
    assert(got.exists(r => r._1 == 99L && r._2.isEmpty && !r._3))
  }

  test("membershipVsIndex emits the batch-twin rows per micro-batch") {
    val idx = index
    val dir = java.nio.file.Files.createTempDirectory("graft-sg2-")
    idx.labels.write.parquet(s"$dir/labels")
    Graph.bridgeNodes(idx).write.parquet(s"$dir/bridges")
    val labels = spark.read.parquet(s"$dir/labels")
    val bridges = spark.read.parquet(s"$dir/bridges")

    implicit val sqlCtx = spark.sqlContext
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Option[String], Boolean, Boolean, Long)]()
    val input = MemoryStream[(String, Long)]
    val q = StreamGraph.membershipVsIndex(
      input.toDF().toDF("node", "payload"), labels, bridges,
      df => df.collect().foreach(r => rows.add((
        r.getString(r.fieldIndex("node")),
        Option(r.getString(r.fieldIndex("label"))),
        r.getBoolean(r.fieldIndex("is_known")),
        r.getBoolean(r.fieldIndex("is_bridge")),
        r.getLong(r.fieldIndex("batch_id"))))))
    try {
      input.addData(Seq(("c:11", 1L), ("c:99", 2L)))
      q.processAllAvailable()
      input.addData(Seq(("s:1", 3L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows.asScala.toSet
    def twin(batch: Seq[(String, Long)], id: Long) =
      StreamGraph.batchMembership(
          batch.toDF("node", "payload"), labels, bridges)
        .collect().map(r => (
          r.getString(r.fieldIndex("node")),
          Option(r.getString(r.fieldIndex("label"))),
          r.getBoolean(r.fieldIndex("is_known")),
          r.getBoolean(r.fieldIndex("is_bridge")), id))
    val want = (twin(Seq(("c:11", 1L), ("c:99", 2L)), 0L) ++
      twin(Seq(("s:1", 3L)), 1L)).toSet
    assert(got == want, s"stream rows must equal batch twin:\n$got\n$want")
    assert(got.exists(r => r._1 == "c:99" && !r._3),
      "post-build node must be flagged unknown")
  }

  test("membershipChurnGauge: per-batch moved fraction between two " +
    "builds equals the batch twin, hand-checked") {
    // build N: components {1,2,3} (rep 1) and {7,8} (rep 7), plus a
    // node 4 the new build dropped; build N+1: 3 moved in with {7,8}
    // (rep 3), {1,2} stays rep 1
    val membersOld = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L),
      (8L, 7L), (4L, 4L)).toDF("node", "component")
    val membersNew = Seq((1L, 1L), (2L, 1L), (3L, 3L), (7L, 3L),
      (8L, 3L)).toDF("node", "component")

    implicit val sqlCtx = spark.sqlContext
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long, Long, Double, Long)]()
    val input = MemoryStream[(Long, Long)]
    val q = StreamGraph.membershipChurnGauge(
      input.toDF().toDF("node", "payload"), membersOld, membersNew,
      df => df.collect().foreach(r => rows.add((
        r.getLong(r.fieldIndex("n_rows")),
        r.getLong(r.fieldIndex("n_both")),
        r.getLong(r.fieldIndex("n_one_side")),
        r.getLong(r.fieldIndex("n_moved")),
        r.getDouble(r.fieldIndex("moved_frac")),
        r.getLong(r.fieldIndex("batch_id"))))))
    try {
      // arrivals: 2 (rep 1→1, same), 3 (1→3, moved), 8 (7→3, moved —
      // the representative change is canonical even though 8 "stayed
      // with" 7), 4 (old build only), 99 (unknown to both)
      input.addData(Seq((2L, 0L), (3L, 0L), (8L, 0L), (4L, 0L),
        (99L, 0L)))
      q.processAllAvailable()
      input.addData(Seq((1L, 0L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows.asScala.toSet
    assert(got.size == 2, s"$got")
    assert(got.contains((5L, 3L, 1L, 2L, 2.0 / 3.0, 0L)), s"$got")
    assert(got.contains((1L, 1L, 0L, 0L, 0.0, 1L)), s"$got")
    // stream body == batch twin on the same frames
    val twin = StreamGraph.batchMembershipChurn(
      Seq((2L, 0L), (3L, 0L), (8L, 0L), (4L, 0L), (99L, 0L))
        .toDF("node", "payload"), membersOld, membersNew)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(twin == Seq((5L, 3L, 1L, 2L, 2.0 / 3.0)), s"$twin")
    // empty batch → empty report
    assert(StreamGraph.batchMembershipChurn(
      Seq.empty[(Long, Long)].toDF("node", "payload"),
      membersOld, membersNew).collect().isEmpty)
  }
}
