package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** Salting is a physical rewrite: results must be row-identical to the
  * plain formulation under any bucket count. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    (1L, 10L, "click", 5.0), (2L, 10L, "click", 7.0),
    (3L, 10L, "view", 1.0), (4L, 20L, "click", 2.0),
    (5L, 30L, "view", 9.0), (6L, 10L, "click", 4.0))
    .toDF("event_id", "user_id", "event_type", "value")

  private val customer = Seq(
    (10L, "BUILDING"), (20L, "MACHINERY"), (30L, "BUILDING"))
    .toDF("c_custkey", "c_mktsegment")

  test("saltedSegmentRevenue equals the plain join for any bucket count") {
    val plain = events.join(customer,
        events("user_id") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        Relational.dsum(col("value")).as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    for (b <- Seq(1, 3, 8)) {
      val salted = Relational.saltedSegmentRevenue(events, customer, b)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(salted == plain, s"buckets=$b")
    }
  }

  test("property: salted rewrites equal plain forms on random event tables") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val eventsGen = Gen.listOfN(60, for {
      id <- Gen.choose(0L, 500L)
      user <- Gen.choose(0L, 8L)       // few users → every key is hot
      et <- Gen.oneOf("click", "view") // 2 group keys → hot aggregation
      v <- Gen.choose(0, 10000).map(_ / 100.0)
    } yield (id, user, et, v))
    val prop = forAll(eventsGen, Gen.oneOf(1, 2, 5, 32)) { (rows, buckets) =>
      val ev = rows.toDF("event_id", "user_id", "event_type", "value")
      val plain = ev.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          Relational.dsum(col("value")).as("sum_value"))
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val salted = Relational.saltedDistinctAgg(ev, buckets)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      Prop(salted == plain)
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("spanDedup pre-aggregate bounds a hot span by doc count, not occurrences") {
    // Boilerplate skew: ONE span in 50% of docs, repeated 10x within each.
    // Without the (doc_id, h) pre-aggregate, the shared-span join would see
    // every occurrence of the hot hash (hotDocs x ~10 repeats) on a single
    // shuffle key; with it, the hot key's join input is one row per doc.
    val boiler = "alpha beta gamma delta"
    val docs = ((0 until 50).map(i =>
        (i.toLong, (Seq.fill(10)(boiler).mkString(" ")) +
          s" u${i}w u${i}x u${i}y u${i}z")) ++
      (50 until 100).map(i =>
        (i.toLong, s"c${i}a c${i}b c${i}c c${i}d c${i}e c${i}f c${i}g c${i}h")))
      .toDF("doc_id", "text")

    // assert on the EXACT frame spanDedup joins (spanWindowCounts), not a
    // spec-local reconstruction — a regression that joins the shared-hash
    // table against raw exploded occurrences changes this frame and fails
    val rawHot = LlmText.rolledWindows(docs)
      .select(col("doc_id"), explode(col("roll")).as("h"))
      .groupBy(col("h")).count()
      .agg(max(col("count"))).head().getLong(0)
    val pre = LlmText.spanWindowCounts(docs).persist()
    try {
      val preHot = pre.groupBy(col("h")).count()
        .agg(max(col("count"))).head().getLong(0)
      assert(preHot <= 50, s"hot span rows after pre-agg = $preHot (docs=50)")
      assert(rawHot >= 9 * preHot,
        s"fixture must be genuinely skewed: raw=$rawHot pre=$preHot")
      // the occurrence mass survives in `cnt`, so the pre-agg loses nothing
      assert(pre.agg(sum(col("cnt"))).head().getLong(0) ==
        LlmText.rolledWindows(docs)
          .select(explode(col("roll"))).count())
    } finally pre.unpersist()

    // end-to-end: boilerplate-heavy docs flagged, unique docs untouched
    val flags = LlmText.spanDedup(docs)
      .select(col("doc_id"), col("is_dup_heavy"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((0L until 50L).forall(flags(_)), "all boilerplate docs dup-heavy")
    assert((50L until 100L).forall(!flags(_)), "unique docs are clean")
  }

  test("saltedDistinctAgg equals plain count-distinct for any bucket count") {
    val plain = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        Relational.dsum(col("value")).as("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    for (b <- Seq(1, 2, 32)) {
      val salted = Relational.saltedDistinctAgg(events, b)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(salted == plain, s"buckets=$b")
    }
  }
}
