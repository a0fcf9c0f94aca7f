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

  test("spanScoreVsIndex under boilerplate skew: broadcast side stays small") {
    // The same hot-span fixture: one span in 50% of docs, 10x repeats.
    // The scorer's index side must be ONE row per duplicated span hash
    // (broadcast-safe however hot the span is), and scoring must survive
    // the skew with exact per-doc fractions — occurrence rows never cross
    // a shuffle keyed by the hot hash.
    val boiler = "alpha beta gamma delta"
    val docs = ((0 until 50).map(i =>
        (i.toLong, (Seq.fill(10)(boiler).mkString(" ")) +
          s" u${i}w u${i}x u${i}y u${i}z")) ++
      (50 until 100).map(i =>
        (i.toLong, s"c${i}a c${i}b c${i}c c${i}d c${i}e c${i}f c${i}g c${i}h")))
      .toDF("doc_id", "text")
    val index = LlmText.sharedSpanIndex(docs)
    // index cardinality = duplicated spans, NOT occurrences: the hot span
    // contributes ONE row despite 500 occurrences
    val idxRows = index.count()
    assert(idxRows <= 50,
      s"index must be one row per shared hash, got $idxRows")
    val scored = LlmText.spanScoreVsIndex(docs, index)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    // a boilerplate doc: 10x4-word boiler + 4 unique words = 44 words ->
    // 41 windows; the windows fully inside the unique tail (last 1) plus
    // those bridging <4 boiler words... pin via invariant instead of
    // arithmetic: every boilerplate doc is flagged, every clean doc clean
    assert((0L until 50L).forall(scored(_)._3), "boilerplate docs flagged")
    assert((50L until 100L).forall(!scored(_)._3), "clean docs unflagged")
    assert((50L until 100L).forall(scored(_)._2 == 0L),
      "clean docs index-match nothing")
  }

  test("hot-band cap bounds LSH candidate pairs by docs·cap, not docs²") {
    // Boilerplate blowup: 60% of the corpus is the SAME text (so all 4 of
    // its band keys are shared by 60 docs), plus 4 genuine near-dup
    // triplets and unique filler. Uncapped, the hot band keys alone emit
    // C(60,2) = 1770 candidate pairs — the O(docs²) failure that kills a
    // 100 TB job on one skewed key. With cap=10 those keys are excluded
    // while the cold triplet keys (3 docs each) still pair.
    val boiler = "the quick brown fox jumps over the lazy dog again"
    val docs = ((0 until 60).map(i => (i.toLong, boiler)) ++
      (0 until 4).flatMap(g => (0 until 3).map(j =>
        ((100 + 3 * g + j).toLong, s"group$g alpha$g beta$g gamma$g delta$g"))) ++
      (200 until 230).map(i => (i.toLong, s"q${i}a q${i}b q${i}c q${i}d")))
      .toDF("doc_id", "text")

    val uncapped = Dedup.lshCandidatePairs(docs, Int.MaxValue).count()
    assert(uncapped >= 1770 + 4 * 3,
      s"fixture must blow up uncapped: $uncapped")

    val capped = Dedup.lshCandidatePairs(docs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // O(docs·cap) bound: every surviving key has ≤ cap docs, so each of a
    // doc's 4 band memberships contributes at most cap-1 partners
    assert(capped.size <= docs.count() * 4 * 10,
      s"capped candidates not bounded: ${capped.size}")
    assert(!capped.exists(p => p._1 < 60L && p._2 < 60L),
      "hot boilerplate keys must not pair")
    for (g <- 0 until 4; j <- 0 until 3; k <- j + 1 until 3)
      assert(capped.contains(((100 + 3 * g + j).toLong, (100 + 3 * g + k).toLong)),
        s"cold triplet $g pair $j-$k must survive the cap")

    // end-to-end: the capped d2 degrades accountably — boilerplate pairs
    // gone, genuine near-dup triplets intact
    val pairs = Dedup.minhashLsh(docs, 0.7, maxBandDocs = 10)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 < 60L && p._2 < 60L))
    assert(pairs == (for (g <- 0 until 4; j <- 0 until 3; k <- j + 1 until 3)
      yield ((100 + 3 * g + j).toLong, (100 + 3 * g + k).toLong)).toSet)

    // ...and the dropped mass is visible to governance: 4 hot band keys
    // carrying 60 docs each
    val rep = Dedup.bandCapReport(docs, cap = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep("minhash_band")._2 == 4L,
      s"expected 4 hot band keys: ${rep("minhash_band")}")
    assert(rep("minhash_band")._3 == 240L,
      s"expected 4x60 dropped band entries: ${rep("minhash_band")}")
    assert(rep("bottom4_sketch")._2 >= 1L,
      s"boilerplate must be hot in the sketch family too: ${rep("bottom4_sketch")}")
  }

  test("fuzzyTitlePairs caps a boilerplate title block at cap-squared work") {
    // 60% of the corpus shares one title prefix (the syndicated-headline
    // shape); uncapped, that block alone is ~hot² comparisons
    val hot = (0 until 60).map(i =>
      (i.toLong, s"breaking news today item number $i full story inside"))
    val cold = (60 until 100).map(i =>
      (i.toLong, s"unique$i headline about topic $i with words $i"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val uncapped = Dedup.fuzzyTitlePairs(docs, maxBlockDocs = Int.MaxValue)
    val capped = Dedup.fuzzyTitlePairs(docs, maxBlockDocs = 10)
    // the hot block is entirely dropped by the cap (accounted-degrade
    // stance), so capped output has no hot-hot pair while uncapped has
    // the full quadratic set
    assert(uncapped.count() > 1000,
      "uncapped hot block must be quadratic (~60²/2 pairs)")
    assert(capped.count() == 0,
      "capped run drops the >cap block entirely, like the LSH family")
  }

  test("sortedNeighborPairs: a hot title costs O(n·window), never n²") {
    // the SAME boilerplate scenario that forces fuzzyTitlePairs to drop
    // its hot block entirely: 60 identical titles. Sorted-neighborhood
    // needs no cap and no drop — identical titles sort adjacent and each
    // record still compares against exactly `window` successors, so the
    // hot run yields 60·w - w(w+1)/2 pairs (every one ≤ w ranks apart),
    // not 60²/2.
    val hot = (0 until 60).map(i =>
      (1000L + i, "free shipping on all orders click here now"))
    val cold = (0 until 40).map(i =>
      (i.toLong, s"unique$i headline about topic $i with words $i"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val w = 5
    val pairs = Dedup.sortedNeighborPairs(docs, window = w, maxEdit = 0)
    // maxEdit=0: only the identical hot titles match; candidate volume is
    // bounded by construction, and NO pair was dropped to get there
    assert(pairs.count() == 60L * w - w.toLong * (w + 1) / 2,
      "hot run must produce exactly the rank-window pairs")
  }

  test("keySkewReport surfaces the planted heavy key with exact shares") {
    // key 7 holds 60 of 100 rows; keys 1..40 hold one each
    val rows = (1L to 60L).map(i => (i, 7L)) ++
      (1L to 40L).map(i => (60L + i, i + 100L))
    val out = Relational.keySkewReport(
        rows.toDF("event_id", "user_id"), "user_id", topK = 3)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(out.size == 3)
    // rank 1: the hub, 60% share
    assert(out(1) == ((7L, 60L, 41L, 100L, 0.6, 0.6)), s"$out")
    // ranks 2-3: ties broken by key ascending; cumulative share grows
    assert(out(2)._1 == 101L && out(2)._2 == 1L, s"$out")
    assert(out(2)._6 == 0.61 && out(3)._6 == (61.0 + 1.0) / 100.0,
      s"$out")
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
