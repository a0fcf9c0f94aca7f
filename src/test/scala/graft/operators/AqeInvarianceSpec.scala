package graft.operators

import graft.SparkSpec

/** Results must not depend on adaptive execution: AQE re-plans joins and
  * coalesces shuffles at runtime, which is exactly the plan movement that
  * once turned an ambiguous self-join condition trivially true. Pin the
  * self-join-heavy operators to identical output with AQE on and off. */
class AqeInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (1L, base), (2L, base.replace("dog", "cat")),
      (3L, base.replace("quick", "slow").replace("dog", "cat")),
      (4L, "completely unrelated words forming another tiny document here"),
      (5L, base)).toDF("doc_id", "text")
  }

  private def withAqe[A](enabled: Boolean)(f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", enabled.toString)
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("minhashLsh and nearDupComponents are AQE-invariant") {
    def pairs() = Dedup.minhashLsh(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def comps() = Dedup.nearDupComponents(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    val (pOn, cOn) = withAqe(true) { (pairs(), comps()) }
    val (pOff, cOff) = withAqe(false) { (pairs(), comps()) }
    assert(pOn == pOff, "pair set must not depend on AQE")
    assert(cOn == cOff, "component labels must not depend on AQE")
    assert(pOn.nonEmpty, "fixture actually produces near-dup pairs")
  }

  test("spanDedup is AQE-invariant (shared-hash join may flip strategy)") {
    def run() = LlmText.spanDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.exists(_._3 > 0), "fixture actually shares spans")
  }

  test("removableSpans and incrementalDedupVsIndex are AQE-invariant") {
    def spans() = LlmText.removableSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val incoming = docs.filter($"doc_id" <= 2L)
    val idx = Dedup.nearDupIndex(docs.filter($"doc_id" > 2L))
    def inc() = Dedup.incrementalDedupVsIndex(incoming, idx, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val (sOn, iOn) = withAqe(true) { (spans(), inc()) }
    val (sOff, iOff) = withAqe(false) { (spans(), inc()) }
    assert(sOn == sOff && iOn == iOff)
    assert(sOn.nonEmpty && iOn.nonEmpty, "fixtures actually produce rows")
  }

  test("annLsh is AQE-invariant (aliased self-join)") {
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(d => ((i % 7) + d % 3).toFloat))
    }.toDF("vec_id", "embedding")
    def run() = Similarity.annLsh(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted.toSeq
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.nonEmpty)
  }

  test("connectedComponentsStar is AQE-invariant (derived self-joins + distinct)") {
    // star rounds join a frame against its own groupBy-min — exactly the
    // derived-self-join shape AQE re-plans; labels must not move
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }.toDF("doc_a", "doc_b")
    def run() = Dedup.connectedComponentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.nonEmpty)
  }

  test("containment is AQE-invariant (sketch + shingle-set self-joins)") {
    // d15 stacks two aliased self-joins (bottom-4 sketch blocking, then
    // the shingle-set gather) — the shape AQE most likes to re-plan; the
    // pair set and both containment directions must not move
    def run() = Dedup.containment(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sorted.toSeq
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.nonEmpty, "fixture produces containment pairs")
  }

  test("hybridRrf is AQE-invariant (two rankings + full-outer fusion)") {
    // doc 0 is the query (id % 100 == 0); overlap and cosine ranks both
    // flow through joins AQE may re-plan; the fused scores must not move
    val fdocs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta delta"),
      (2L, "zeta eta theta"), (3L, "alpha epsilon mu"))
      .toDF("doc_id", "text")
    val fvecs = (0L to 3L).map { i =>
      (i, Array.tabulate(64)(d => if (d == i % 4) 1f else 0.1f), 0)
    }.toDF("vec_id", "embedding", "label")
    def run() = Similarity.hybridRrf(fdocs, fvecs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.nonEmpty)
  }

  test("fuzzyTitlePairs and phashPairs are AQE-invariant (block self-joins)") {
    val long = (0 until 300).map(i => ('a' + (i * 7 + i / 3) % 26).toChar)
      .mkString
    val fdocs = Seq(
      (1L, long), (2L, long),                     // phash pair + fuzzy pair
      (3L, long.dropRight(1) + "!"),              // 1 edit in the tail
      (4L, "short unrelated text"))
      .toDF("doc_id", "text")
    def fuzzy() = Dedup.fuzzyTitlePairs(fdocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    def phash() = Multimodal.phashPairs(fdocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val (fOn, pOn) = withAqe(true) { (fuzzy(), phash()) }
    val (fOff, pOff) = withAqe(false) { (fuzzy(), phash()) }
    assert(fOn == fOff && pOn == pOff)
    assert(fOn.nonEmpty && pOn.nonEmpty, "fixtures actually produce pairs")
  }

  test("mmrRerank is AQE-invariant (iterative candidate joins)") {
    val vecs = (0L to 8L).map { i =>
      (i, Array.tabulate(64)(d =>
        if (d == (i % 3).toInt) 1f else 0.05f * ((i + d) % 5)), 0)
    }.toDF("vec_id", "embedding", "label")
    def run() = Similarity.mmrRerank(vecs, k = 4).collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getInt(r.fieldIndex("mmr_rank")),
        r.getLong(r.fieldIndex("neighbor_id")))).sorted.toSeq
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.size == 4, "one query, four ranks")
  }

  test("ivfAdcAnn is AQE-invariant (tiered broadcast joins + heap top-k)") {
    val vecs = (0L until 120L).map { i =>
      (i, Array.tabulate(64)(d =>
        if (d == (i % 3).toInt) 1f else 0.05f * ((i + d) % 5)), 0)
    }.toDF("vec_id", "embedding", "label")
    def run() = Similarity.ivfAdcAnn(vecs, k = 3, probeK = 20).collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("neighbor_id")),
        r.getDouble(r.fieldIndex("cos")))).sorted.toSeq
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.nonEmpty, "fixture actually produces neighbors")
  }

  test("sortedNeighborPairs is AQE-invariant (rank self-join + window)") {
    // near pairs (1,2) and (3,5): identical/1-edit titles sort adjacent
    def run() = Dedup.sortedNeighborPairs(docs, window = 2, maxEdit = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.nonEmpty, "fixture actually produces neighbor pairs")
  }

  test("prefixFilterPairs is AQE-invariant (freq join + prefix self-join)") {
    def run() = Dedup.prefixFilterPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.nonEmpty, "fixture actually produces prefix-filter pairs")
  }

  test("labelPropagation and communityStats are AQE-invariant") {
    // join+agg+TopK rounds over a small purchase graph: AQE may flip the
    // vote join strategy per round, the labels must not move
    val li = Seq((100L, 1L), (100L, 1L), (101L, 1L), (102L, 1L),
      (100L, 2L), (200L, 3L), (201L, 3L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 11L), (102L, 12L),
      (200L, 20L), (201L, 21L)).toDF("o_orderkey", "o_custkey")
    def labels() = Graph.labelPropagation(li, ord).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    def stats() = Graph.communityStats(li, ord).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sorted.toSeq
    val (lOn, sOn) = withAqe(true) { (labels(), stats()) }
    val (lOff, sOff) = withAqe(false) { (labels(), stats()) }
    assert(lOn == lOff, "labels must not depend on AQE")
    assert(sOn == sOff, "community stats must not depend on AQE")
    assert(lOn.nonEmpty && sOn.size >= 2, "fixture forms communities")
  }

  test("round-11 surface is AQE-invariant (projection, reports, gauges)") {
    // the co-purchase self-join + its governance/modularity folds, the
    // held-out LM scorer (left joins may flip strategy), and the motion
    // window — none may move a value when AQE re-plans
    val li = Seq((100L, 1L), (100L, 1L), (101L, 1L), (102L, 1L),
      (100L, 2L), (200L, 3L), (201L, 3L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (101L, 11L), (102L, 12L),
      (200L, 20L), (201L, 21L)).toDF("o_orderkey", "o_custkey")
    def g5() = Graph.coPurchasePairs(li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    def g6() = Graph.coPurchaseGovernance(li, ord).collect()
      .map(_.toSeq).map(_.toString).sorted.toSeq
    def g7() = Graph.modularity(li, ord).collect()
      .map(_.toSeq).map(_.toString).sorted.toSeq
    def x37() = LlmLm.bigramLmVsRef(docs, refMod = 2).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    // multi-frame payloads (>= 2 × 64-byte frames) so deltas exist
    val media = Seq((1L, "a" * 100 + "z" * 100), (2L, "b" * 200))
      .toDF("doc_id", "text")
    def mm13() = Multimodal.motionProfile(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).sorted.toSeq
    val on = withAqe(true) { (g5(), g6(), g7(), x37(), mm13()) }
    val off = withAqe(false) { (g5(), g6(), g7(), x37(), mm13()) }
    assert(on == off, s"round-11 ops moved under AQE:\n$on\n$off")
    assert(on._1.nonEmpty && on._4.nonEmpty && on._5.nonEmpty,
      "fixtures actually produce rows")
  }

  test("round-12 surface is AQE-invariant (peel, components, skew head)") {
    // g11's semi-join peel rounds and g12's star-contraction CC may both
    // flip join strategies per round under AQE; q67's head is a
    // TakeOrdered + window over 20 rows — none may move a value
    val li = Seq((100L, 1L), (100L, 2L), (100L, 3L), (110L, 1L),
      (110L, 4L), (200L, 7L), (200L, 8L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (110L, 11L), (200L, 20L))
      .toDF("o_orderkey", "o_custkey")
    def g11() = Graph.kcore(li, ord).collect()
      .map(_.toSeq).map(_.toString).sorted.toSeq
    def g12() = Graph.componentSizes(li, ord).collect()
      .map(_.toSeq).map(_.toString).sorted.toSeq
    val ev = (1L to 200L).map(i =>
      (i, if (i % 3 == 0) 7L else i)).toDF("event_id", "user_id")
    def q67() = Relational.keySkewReport(ev, "user_id", topK = 5)
      .collect().map(_.toSeq).map(_.toString).sorted.toSeq
    val on = withAqe(true) { (g11(), g12(), q67()) }
    val off = withAqe(false) { (g11(), g12(), q67()) }
    assert(on == off, s"round-12 ops moved under AQE:\n$on\n$off")
    assert(on._1.nonEmpty && on._2.size == 2 && on._3.size == 5,
      "fixtures actually produce rows")
  }

  test("late round-11 surface is AQE-invariant (triangles, gauges, ranks)") {
    // g9/g10 (projection + top-k + wedge self-joins — the most
    // join-shaped chain of the family), the e20/e21 geometry folds, the
    // c28 per-source windows, and mm14's typed per-media pass
    val li = Seq((100L, 1L), (100L, 2L), (100L, 3L), (110L, 1L),
      (110L, 4L)).toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 10L), (110L, 11L)).toDF("o_orderkey", "o_custkey")
    def g9() = Graph.triangleStats(li, ord).collect()
      .map(_.toSeq).map(_.toString).sorted.toSeq
    def g10() = Graph.transitivity(li, ord).collect()
      .map(_.toSeq).map(_.toString).sorted.toSeq
    val embs = Seq(
      (1L, Array.tabulate(64)(i => if (i == 0) 1f else 0.25f)),
      (2L, Array.tabulate(64)(i => if (i == 1) 2f else -0.5f)),
      (3L, Array.tabulate(64)(_ => 0.75f)))
      .toDF("vec_id", "embedding")
    def e20() = VectorOps.anisotropy(embs).collect()
      .map(_.toSeq).map(_.toString).toSeq
    def e21() = VectorOps.participationRatio(embs).collect()
      .map(_.toSeq).map(_.toString).toSeq
    val cdocs = docs.withColumn("source",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("s"), $"doc_id" % 2))
    def c28() = Curation.curriculumOrder(cdocs).collect()
      .map(_.toSeq).map(_.toString).sorted.toSeq
    def mm14() = Multimodal.clippingReport(docs).collect()
      .map(_.toSeq).map(_.toString).sorted.toSeq
    val on = withAqe(true) { (g9(), g10(), e20(), e21(), c28(), mm14()) }
    val off = withAqe(false) { (g9(), g10(), e20(), e21(), c28(), mm14()) }
    assert(on == off, s"late round-11 ops moved under AQE:\n$on\n$off")
    assert(on._1.nonEmpty && on._3.nonEmpty && on._5.nonEmpty &&
      on._6.nonEmpty, "fixtures actually produce rows")
  }

  test("phashVsIndex is AQE-invariant (cross-set band join)") {
    val long = (0 until 300).map(i => ('a' + (i * 7 + i / 3) % 26).toChar)
      .mkString
    val known = Seq((1L, long), (2L, long.reverse)).toDF("doc_id", "text")
    val inc = Seq((100L, long)).toDF("doc_id", "text")
    val idx = Multimodal.phashIndex(known)
    def run() = Multimodal.phashVsIndex(inc, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val on = withAqe(true)(run())
    val off = withAqe(false)(run())
    assert(on == off)
    assert(on.nonEmpty, "fixture actually hits the index")
  }
}
