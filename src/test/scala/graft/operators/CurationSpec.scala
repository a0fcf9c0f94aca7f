package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("stratifiedSample is a deterministic per-stratum gate") {
    val d = docs((0L until 200L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "en" else "fr", s"src${i % 4}")): _*)
    val out = Curation.stratifiedSample(d, Map("en" -> 50), 25)
    val again = Curation.stratifiedSample(d.repartition(7), Map("en" -> 50), 25)
    // identical decisions regardless of partitioning
    assert(out.collect().map(_.getLong(0)).sorted.toSeq ==
      again.collect().map(_.getLong(0)).sorted.toSeq)
    // every bucket respects its stratum's rate
    val bad = out.filter(
      (col("lang") === "en" && col("bucket") >= 50) ||
        (col("lang") =!= "en" && col("bucket") >= 25)).count()
    assert(bad == 0)
    // rates land near 50% / 25% of each stratum (hash uniformity)
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") > 30 && kept("en") < 70, s"en kept ${kept("en")}/100")
    assert(kept("fr") > 10 && kept("fr") < 40, s"fr kept ${kept("fr")}/100")
  }

  test("domainMix downsamples every domain toward the smallest") {
    // 160 en vs 40 fr: en should come down to roughly fr's size
    val d = docs((0L until 200L).map(i =>
      (i, s"doc $i", if (i % 5 == 0) "fr" else "en", "src0")): _*)
    val kept = Curation.domainMix(d).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("fr") == 40, "smallest domain is fully kept")
    assert(kept("en") > 20 && kept("en") < 60,
      s"dominant domain downsampled to ~40, got ${kept("en")}")
  }

  test("packSequences: per-shard running offsets, stable under repartition") {
    val d = docs((0L until 100L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "), "en", "src0")): _*)
    val out = Curation.packSequences(d, budget = 10, shards = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    // within a shard, pack_id/start_offset follow the doc_id-ordered
    // running sum: offset = cumulative-before mod budget
    rows.groupBy(_._2).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._1).foreach { case (_, _, n, packId, off) =>
        assert(packId == cum / 10)
        assert(off == cum % 10)
        cum += n
      }
    }
    // deterministic under a different input partitioning
    val again = Curation.packSequences(d.repartition(13), 10, 4)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sorted
    assert(again.toSeq ==
      rows.map(r => (r._1, r._4, r._5)).sorted.toSeq)
  }

  test("packBySimilarity groups same-cell docs before packing") {
    val d = docs((0L until 40L).map(i =>
      (i, Seq.fill(3)("w").mkString(" "), "en", "src0")): _*)
    val emb = (0L until 40L).map(i =>
      (i, Array.fill(64)(0f), (i % 2).toInt))  // cells 0 and 1 interleaved
      .toDF("vec_id", "embedding", "label")
    val out = Curation.packBySimilarity(d, emb, budget = 6, shards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // within each shard the running sum is ordered by (cell, doc_id)
    out.groupBy(_._2).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(r => (r._3, r._1)).foreach { case (_, _, _, n, packId, off) =>
        assert(packId == cum / 6)
        assert(off == cum % 6)
        cum += n
      }
      // cell-grouping: within a shard, every cell-0 doc precedes every
      // cell-1 doc in pack order (pack_id, offset)
      val order = rs.sortBy(r => (r._5, r._6)).map(_._3).toSeq
      assert(order == order.sorted, s"cells must be contiguous: $order")
    }
  }

  test("curationPipeline composes gates and near-dup drop") {
    val good = "the cat and the dog of a house is that one there now"
    val d = docs(
      (1L, good, "en", "a"),
      (2L, good, "en", "b"),                    // exact near-dup of 1 → dropped
      (3L, "spam spam spam spam spam spam", "en", "a"), // repetitive → dropped
      (4L, "zz qq ww", "fr", "a"))              // no stopwords → low quality
    val out = Curation.curationPipeline(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set("en"))
    assert(out("en")._1 == 1L, "only the cluster representative survives")
    assert(out("en")._2 == good.length.toLong)
  }

  test("gateFunnel: cumulative survivors through each gate, hand-checked") {
    val good = "the cat and the dog of a house is that one there now"
    // stopword-rich (passes quality) but a 4x-repeated phrase (fails
    // the dup-n-gram repetition gate) — so each gate cuts its OWN doc
    val loop = Seq.fill(4)("the cat and the dog").mkString(" ")
    val d = docs(
      (1L, good, "en", "a"),
      (2L, good, "en", "b"),       // near-dup of 1: dedup cut
      (3L, loop, "en", "a"),       // repetition cut
      (4L, "zz qq ww", "fr", "a")) // quality cut
    val out = Curation.gateFunnel(d).collect()
      .map(r => r.getInt(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1) == (("all", 4L,
      good.length * 2L + loop.length + "zz qq ww".length)))
    // quality drops doc 4; repetition then drops doc 3; dedup drops 2
    assert(out(2)._2 == 3L && out(2)._1 == "quality", s"$out")
    assert(out(3)._2 == 2L && out(3)._1 == "quality+repetition", s"$out")
    assert(out(4) == (("quality+repetition+dedup", 1L,
      good.length.toLong)), s"$out")
    // the funnel is monotone non-increasing in both columns
    val stages = (1 to 4).map(out)
    assert(stages.sliding(2).forall(p => p(0)._2 >= p(1)._2 &&
      p(0)._3 >= p(1)._3))
  }

  test("decontaminate counts shared shingles against the benchmark union") {
    val corpus = docs(
      (1L, "alpha beta gamma delta epsilon", "en", "a"), // 3 shingles, all shared
      (2L, "alpha beta gamma nothing else here", "en", "a"), // 1 shared
      (3L, "completely different words entirely now", "en", "a"), // 0
      (4L, "xy", "en", "a")) // no shingles at all
    val bench = docs((100L, "alpha beta gamma delta epsilon zeta", "en", "b"))
    val out = Curation.decontaminate(corpus, bench, minShared = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == (3L, true))
    assert(out(2L) == (1L, false))
    assert(out(3L) == (0L, false))
    assert(out(4L) == (0L, false), "shingle-less docs still reported clean")
    assert(out.size == 4)
  }

  test("decontaminateBloom matches the broadcast form row-for-row") {
    val corpus = docs(
      (1L, "alpha beta gamma delta epsilon", "en", "a"),
      (2L, "alpha beta gamma nothing else here", "en", "a"),
      (3L, "completely different words entirely now", "en", "a"),
      (4L, "xy", "en", "a"))
    val bench = docs((100L, "alpha beta gamma delta epsilon zeta", "en", "b"))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // the sketch only prunes; the exact join confirms — bit-identical output
    assert(asMap(Curation.decontaminateBloom(corpus, bench, minShared = 3)) ==
      asMap(Curation.decontaminate(corpus, bench, minShared = 3)))
  }

  test("contaminationReport attributes the leak to the right source") {
    // source "a" carries the contaminated doc (3 shared shingles) plus a
    // clean one; source "b" is entirely clean — the report must say WHICH
    // feed leaks, not just that something does
    val corpus = docs(
      (1L, "alpha beta gamma delta epsilon", "en", "a"),
      (2L, "alpha beta gamma nothing else here", "en", "a"),
      (3L, "completely different words entirely now", "en", "b"),
      (4L, "other clean material lives here too", "en", "b"))
    val bench = docs((100L, "alpha beta gamma delta epsilon zeta", "en", "x"))
    val out = Curation.contaminationReport(corpus, bench, minShared = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") == ((2L, 1L, 0.5)), s"$out")
    assert(out("b") == ((2L, 0L, 0.0)), s"$out")
    assert(out.size == 2)
  }

  test("shuffleShard is a deterministic permutation; the writer round-trips it") {
    val d = docs((0L to 49L).map(i => (i, s"doc $i text", "en", "a")): _*)
    val assign = Curation.shuffleShard(d, shards = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(assign.keySet == (0L to 49L).toSet)
    assert(assign.values.forall { case (s, _) => s >= 0 && s < 4 })
    assert(assign.values.map(_._1).toSet.size > 1, "docs spread over shards")
    // run-over-run determinism: same ids → same shards and sort keys
    assert(Curation.shuffleShard(d, shards = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap == assign)

    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      Curation.writeShuffledShards(d, dir, shards = 4)
      val back = spark.read.parquet(dir)
      assert(back.count() == 50)
      val byShard = back.select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
      // partitionBy directories carry the same assignment as the query form
      assert(byShard == assign.map { case (id, (s, _)) => id -> s })
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("leakageSafeSplit keeps near-dup clusters in one split") {
    // two exact near-dup families plus unrelated docs
    val family = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "one two three four five six seven eight"
    val d = docs(
      (1L, family, "en", "a"), (2L, family, "en", "b"),
      (3L, family + " iota", "en", "c"),
      (10L, other, "en", "a"), (11L, other, "en", "b"),
      (20L, "totally unrelated text with many unique words here", "en", "c"))
    val out = Curation.leakageSafeSplit(d)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = rows.map(t => t._1 -> t._3).toMap
    // same cluster → same split, by construction of the rep hash
    assert(byDoc(1L) == byDoc(2L) && byDoc(2L) == byDoc(3L))
    assert(byDoc(10L) == byDoc(11L))
    // singleton keeps its own id as rep
    assert(rows.find(_._1 == 20L).get._2 == 20L)
    // all three split labels are legal
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("chunkOverlap windows every stride tokens with overlap") {
    val d = docs((0L, Seq.tabulate(100)(i => s"w${i + 1}").mkString(" "),
      "en", "src0"))
    val out = Curation.chunkOverlap(d, chunk = 64, stride = 48)
      .collect().map(r => (r.getLong(r.fieldIndex("chunk_id")),
        r.getLong(r.fieldIndex("start_token")),
        r.getLong(r.fieldIndex("n_tokens")),
        r.getString(r.fieldIndex("chunk_text")))).sortBy(_._1)
    assert(out.map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((0L, 1L, 64L), (1L, 49L, 52L), (2L, 97L, 4L)))
    assert(out(0)._4.startsWith("w1 ") && out(0)._4.endsWith(" w64"))
    // overlap: chunk 1 re-covers tokens 49..64
    assert(out(1)._4.startsWith("w49 ") && out(1)._4.endsWith(" w100"))
    assert(out(2)._4 == "w97 w98 w99 w100")
  }

  test("tokenBudgetSelect fills each domain best-first up to the budget") {
    // quality rises with stopword share; 10 docs of 10 tokens per lang
    val mk = (i: Long, lang: String, nStop: Int) =>
      (i, (Seq.fill(nStop)("the") ++ Seq.fill(10 - nStop)("zz")).mkString(" "),
        lang, "src0")
    val d = docs((0L until 10L).map(i => mk(i, "en", (i % 5).toInt + 1)) ++
      (10L until 20L).map(i => mk(i, "fr", (i % 5).toInt + 1)): _*)
    val out = Curation.tokenBudgetSelect(d, budgetPerDomain = 30)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(r.fieldIndex("cum_tokens"))))
    // 3 docs of 10 tokens fit per domain
    assert(out.count(_._2 == "en") == 3)
    assert(out.count(_._2 == "fr") == 3)
    assert(out.forall(_._3 <= 30))
    // best-first: every selected doc has 5 stopwords (quality argmax),
    // tie-broken by doc_id — ids 4, 9 then 3 (4 stopwords) for en
    val en = out.filter(_._2 == "en").map(_._1).sorted.toSeq
    assert(en == Seq(3L, 4L, 9L), s"got $en")
  }

  test("sourceReport aggregates exact per-source health stats") {
    val d = docs(
      (1L, "the a of and", "en", "srcA"),
      (2L, "the a of and", "en", "srcA"),
      (3L, "!!! ???", "en", "srcB"))
    val out = Curation.sourceReport(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        r.getDouble(r.fieldIndex("mean_quality")),
        r.getDouble(r.fieldIndex("mean_tokens")),
        r.getDouble(r.fieldIndex("quality_rate")))).toMap
    assert(out("srcA")._1 == 2 && out("srcB")._1 == 1)
    assert(out("srcA")._3 == 4.0 && out("srcB")._3 == 2.0)
    assert(out("srcA")._4 == 1.0, "all-stopword docs pass the gate")
    assert(out("srcB")._4 == 0.0, "punct-only docs fail the gate")
    assert(out("srcA")._2 > 0.7 && out("srcB")._2 < 0.2)
    // decimal-grid accumulation → identical under repartition
    val again = Curation.sourceReport(d.repartition(7)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.forall { case (s, v) => again(s) == v._2 })
  }

  test("qualitySample keeps docs with probability equal to their quality") {
    // all-stopword docs score ~0.4+0.3+small; junk-punct docs score low
    val good = (0L until 100L).map(i =>
      (i, "the a of and to in is that", "en", "src0"))
    val junk = (100L until 200L).map(i =>
      (i, "!!! ??? *** $$$ %%% ###", "en", "src0"))
    val out = Curation.qualitySample(docs(good ++ junk: _*))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val goodKept = out.count(_._1 < 100)
    val junkKept = out.count(_._1 >= 100)
    // quality ≈ 0.78 for the stopword docs → ~78/100 kept
    assert(goodKept > 60 && goodKept < 95, s"goodKept=$goodKept")
    // punct-only docs score ≈ 0.3·(1−1) + … ≈ 0.075 → almost none survive
    assert(junkKept < 25, s"junkKept=$junkKept")
    // decisions are deterministic
    val again = Curation.qualitySample(docs(good ++ junk: _*))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("temperatureMix keeps sqrt-scaled shares, tail kept fully") {
    // 160 en vs 40 fr: fr rate = 1.0 (all 40), en rate = sqrt(40/160) = 0.5
    val d = docs((0L until 200L).map(i =>
      (i, s"doc $i", if (i % 5 == 0) "fr" else "en", "src0")): _*)
    val kept = Curation.temperatureMix(d).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("fr") == 40, "smallest domain fully kept")
    assert(kept("en") > 60 && kept("en") < 100,
      s"head domain at ~50%, got ${kept("en")}")
    // temperature keeps MORE of the head than uniform mixing does
    val uniform = Curation.domainMix(d).filter(col("lang") === "en").count()
    assert(kept("en") > uniform,
      s"sqrt temperature (${kept("en")}) should exceed uniform ($uniform)")
  }

  test("importanceResample ranks target-like docs first, deterministically") {
    // Target speaks "alpha beta"; corpus has 10 alpha-beta docs and 10
    // noise docs sharing a raw-frequent vocabulary the target never uses —
    // the signal DSIR penalizes (hapax words would be smoothed to neutral).
    // Every target-like doc must out-weigh every noise doc, and the budget
    // keeps exactly the target-like half.
    val target = docs((100L until 104L).map(i =>
      (i, "alpha beta alpha beta alpha", "en", "wiki")): _*)
    val corpus = docs((0L until 20L).map { i =>
      val text = if (i < 10) "alpha beta alpha beta gamma"
                 else "zulu yankee xray whisky victor"
      (i, text, "en", "web")
    }: _*)
    val out = Curation.importanceResample(corpus, target, budget = 10)
    assert(out.count() == 20, "one row per corpus doc")
    val sel = out.filter(col("selected")).collect().map(_.getLong(0)).sorted
    assert(sel.toSeq == (0L until 10L), s"selected ${sel.mkString(",")}")
    // decisions are invariant to input partitioning
    val again = Curation
      .importanceResample(corpus.repartition(7), target.repartition(3),
        budget = 10)
      .filter(col("selected")).collect().map(_.getLong(0)).sorted
    assert(again.toSeq == sel.toSeq)
    // weights separate: min selected weight > max unselected weight
    val w = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert((0L until 10L).map(w).min > (10L until 20L).map(w).max)
  }

  test("unimaxAllocate water-fills: caps the tail, splits the rest") {
    // tokens: a=10, b=100, c=1000; maxEpochs=2 → caps 20/200/2000.
    // budget=1000: a,b capped (epoch limit), c absorbs the rest.
    def txt(n: Int) = Seq.fill(n)("t").mkString(" ")
    val d = docs(
      (1L, txt(10), "a", "s"), (2L, txt(100), "b", "s"),
      (3L, txt(1000), "c", "s"))
    val out = Curation.unimaxAllocate(d, budgetTokens = 1000L, maxEpochs = 2)
    val alloc = out.collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(alloc == Map("a" -> 20.0, "b" -> 200.0, "c" -> 780.0), alloc)
    // the budget is exactly consumed when demand exceeds it
    assert(alloc.values.sum == 1000.0)
    // decisions are invariant to input partitioning
    val again = Curation
      .unimaxAllocate(d.repartition(5), budgetTokens = 1000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(again == alloc)
    // budget larger than all capacity: every language caps out
    val rich = Curation.unimaxAllocate(d, budgetTokens = 10000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(rich == Map("a" -> 20.0, "b" -> 200.0, "c" -> 2000.0), rich)
  }

  test("epochExpand materializes the UniMax schedule as (doc, epoch) rows") {
    def txt(n: Int) = Seq.fill(n)("t").mkString(" ")
    // mi: 2 docs × 5 tokens → cap 20, capped under budget 100 → exactly
    // 2 epochs per doc, no fraction. en: 6 docs × 10 tokens → water level
    // (100-20)/1 = 80 over 60 tokens → 1.3333 epochs: every doc at least
    // once, a deterministic ~third of docs twice.
    val d = docs(
      (Seq(1L -> "mi", 2L -> "mi").map { case (id, l) => (id, txt(5), l, "s") } ++
        (10L until 16L).map(id => (id, txt(10), "en", "s"))): _*)
    val out = Curation.epochExpand(d, budgetTokens = 100L, maxEpochs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // capped language: exactly maxEpochs copies, epochs 0..1
    assert(byDoc(1L) == Seq(0L, 1L) && byDoc(2L) == Seq(0L, 1L))
    // uncapped: every doc appears, copies contiguous from 0, count 1 or 2
    (10L until 16L).foreach { id =>
      val eps = byDoc(id)
      assert(eps.nonEmpty && eps == (0L until eps.size.toLong),
        s"doc $id epochs $eps")
      assert(eps.size <= 2)
    }
    // determinism: same output on a different partitioning
    val again = Curation.epochExpand(d.repartition(5), 100L, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("qualityDrift: identical snapshots score 0, a shifted source flags") {
    import org.apache.spark.sql.functions._
    // quality text (stopword-rich) vs junk text (pure punctuation) land in
    // different score buckets
    val good = "the cat and the dog sat in the sun and the rain"
    val junk = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    def docs(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "source")
    // stable: same distribution on both sides -> TV 0. shifted: all good
    // docs in old, all junk in new -> TV 1 (disjoint buckets).
    val oldSnap = docs(Seq(
      (2L, good, "stable"), (4L, junk, "stable"),
      (6L, good, "shifted"), (8L, good, "shifted")))
    val newSnap = docs(Seq(
      (1L, good, "stable"), (3L, junk, "stable"),
      (5L, junk, "shifted"), (7L, junk, "shifted")))
    val out = Curation.qualityDrift(oldSnap, newSnap)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out("stable") == ((2L, 2L, 0.0, false)),
      s"identical distributions must not drift: ${out("stable")}")
    val (no, nn, tv, drifted) = out("shifted")
    assert(no == 2L && nn == 2L && drifted, s"shifted must flag: $tv")
    assert(math.abs(tv - 1.0) < 1e-9,
      s"disjoint buckets -> total variation 1.0, got $tv")
    // partition-invariant (the decimal-accumulated sum is the point)
    val re = Curation.qualityDrift(
      oldSnap.repartition(7), newSnap.repartition(3))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(re == out.map { case (k, v) => k -> v._3 })
  }

  test("neymanAllocation: N·sigma shares, largest-remainder to budget") {
    // A: {0,2} → σ=1, Nσ=2; B: {3,3} → σ=0, Nσ=0; C: {0,6} → σ=3, Nσ=6.
    // Shares: A 1/4, C 3/4 of budget 10 → raw 2.5 / 7.5, floors 2+0+7=9,
    // one remainder seat: frac tie (.5 = .5) → lexicographic source → A.
    val docs = Seq(
      (1L, "A", 0L), (2L, "A", 2L),
      (3L, "B", 3L), (4L, "B", 3L),
      (5L, "C", 0L), (6L, "C", 6L))
      .toDF("doc_id", "source", "n_chars")
    val out = Curation.neymanAllocation(docs, budget = 10L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3))).toMap
    assert(out("A") == (2L, 1.0, 3L))
    assert(out("B") == (2L, 0.0, 0L))
    assert(out("C") == (2L, 3.0, 7L))
    assert(out.values.map(_._3).sum == 10L, "allocations sum to budget")
    // degenerate corpus: every stratum constant-valued → all sigmas 0 →
    // SIZE-proportional fallback, never a NaN-poisoned 0/0
    val flat = Seq((1L, "A", 5L), (2L, "A", 5L), (3L, "A", 5L),
      (4L, "B", 5L))
      .toDF("doc_id", "source", "n_chars")
    val fb = Curation.neymanAllocation(flat, budget = 8L).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(fb == Map("A" -> 6L, "B" -> 2L),
      s"size-proportional fallback sums to budget: $fb")
  }

  test("temperatureMixTokens: rates derive from token mass, not doc counts") {
    import org.apache.spark.sql.functions._
    // domain A: 2 docs x 2 tokens = 4 tokens; domain B: 1 doc x 16 tokens.
    // Token accounting: min_t=4, rate_A=10000, rate_B=floor(10000*sqrt(4/16))
    // = 5000 — doc accounting would instead keep ALL of B (fewest docs).
    val docs = Seq(
      (1L, "a b", "s", "A"), (2L, "c d", "s", "A"),
      (3L, Seq.fill(16)("w").mkString(" "), "s", "B"))
      .toDF("doc_id", "text", "source", "lang")
    val kept = Curation.temperatureMixTokens(docs).collect()
      .map(_.getLong(0)).toSet
    // domain A's rate is 10000 → both A docs always survive
    assert(Set(1L, 2L).subsetOf(kept), s"$kept")
    // doc 3 survives iff its deterministic bucket < 5000 — recompute
    val b = graft.operators.PortableHash.hash28Jvm("tmt:3") % 10000
    assert(kept.contains(3L) == (b < 5000), s"bucket $b, kept $kept")
  }

  test("weightedSample equals the plain-Scala A-ES reference, rank and key") {
    val rows = (1L to 60L).map(i => (i, 1L + (i * 37) % 500))
    val df = rows.toDF("doc_id", "n_chars")
    def refKey(id: Long, w: Long): Double = {
      val u = (graft.operators.PortableHash.hash28Jvm(s"ws:$id") + 1L)
        .toDouble / 268435456.0
      val l5 = BigDecimal(math.log(u))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      (0.0 - l5) / w.toDouble
    }
    val expect = rows.map { case (id, w) => (id, w, refKey(id, w)) }
      .sortBy(t => (t._3, t._1)).take(10)
    val out = Curation.weightedSample(df, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._3, t._1))
    assert(out.toSeq == expect,
      s"engine sample drifted from reference: $out vs $expect")
    // partition-count invariance: the global top-k must not care how the
    // scan was split
    val alt = Curation.weightedSample(df.repartition(7), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._3, t._1))
    assert(alt.toSeq == expect)
  }

  test("dedupWeightedMix: syndicated copy counts once, for the first source") {
    // source B republishes doc 1's text; the survivor (min doc_id) is A's,
    // so B's weight must come only from its unique doc
    val docs = Seq(
      (1L, "a b c", "A"),
      (2L, "d e f g", "A"),
      (3L, "a b c", "B"),   // exact duplicate of doc 1 — dropped
      (4L, "x y", "B"))
      .toDF("doc_id", "text", "source")
    val out = Curation.dedupWeightedMix(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("A") == ((2L, 7L, 7.0 / 9.0)), s"${out("A")}")
    assert(out("B") == ((1L, 2L, 2.0 / 9.0)), s"${out("B")}")
  }

  test("qualityDupCalibration: dup mass lands in the duplicated text's bucket") {
    // two identical symbol-soup docs (stopword-free, punct-heavy → low
    // quality; one is the dup) + two DISTINCT stopword-rich clean docs
    val junk = "!!! ??? zzz $$$ %%% ^^^"
    val docs = Seq(
      (1L, junk), (2L, junk),
      (3L, "the cat is in the hat and that is that"),
      (4L, "a dog of the town is to bark and that is fine"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions
        .length(org.apache.spark.sql.functions.col("text")).cast("long"))
    val out = Curation.qualityDupCalibration(docs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3))))
    // buckets partition the corpus; exactly one planted duplicate
    assert(out.map(_._2._1).sum == 4L, s"${out.toSeq}")
    assert(out.map(_._2._2).sum == 1L, s"${out.toSeq}")
    // the dup sits in the junk pair's bucket (rate 0.5 over its 2 docs);
    // every clean-doc bucket reads 0
    val dupBuckets = out.filter(_._2._2 > 0)
    assert(dupBuckets.length == 1 && dupBuckets.head._2 == ((2L, 1L, 0.5)),
      s"${out.toSeq}")
    // the junk bucket scores BELOW every clean bucket (calibration is
    // reading real quality, not arbitrary ids)
    val junkBucket = dupBuckets.head._1
    assert(out.filter(_._2._2 == 0).forall(_._1 > junkBucket),
      s"${out.toSeq}")
  }

  test("curriculumOrder: easy-first ranks within source, phase cuts") {
    import spark.implicits._
    // source A, easy → hard: short monosyllabic sentences score a higher
    // flesch than one long many-syllable run-on
    val easy = "the cat sat. the dog ran. we go now."
    val mid = "the quick brown fox jumps over the lazy dog near town."
    val hard = "extraordinarily complicated multisyllabic terminology " +
      "necessitates considerable concentration understanding everything"
    val docs = Seq(
      (1L, hard, "A"), (2L, easy, "A"), (3L, mid, "A"),
      (4L, easy, "B"))
      .toDF("doc_id", "text", "source")
    val out = Curation.curriculumOrder(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getString(6)))).toMap
    // within A: easy(2) < mid(3) < hard(1) in rank order
    assert(out(2L)._2 == 1L && out(3L)._2 == 2L && out(1L)._2 == 3L,
      s"$out")
    assert(out.values.filter(_._1 == "A").forall(_._3 == 3L))
    // n=3 progress grid: 0, 1/3, 2/3 → warmup, main, polish
    assert(out(2L)._4 == 0.0 && out(2L)._5 == "warmup", s"$out")
    assert(out(3L)._5 == "main" && out(1L)._5 == "polish", s"$out")
    // a single-doc source is all warmup, rank 1 of 1
    assert(out(4L) == (("B", 1L, 1L, 0.0, "warmup")), s"$out")
  }

  test("dedupTokenBudget: the duplicate's tokens drop from the kept " +
    "budget; untouched sources keep everything") {
    val docs = Seq(
      (1L, "the cat sat on the mat today", "web"),
      (2L, "the cat sat on the mat today", "web"),
      (3L, "entirely different text content here now", "books"))
      .toDF("doc_id", "text", "source")
    val out = Curation.dedupTokenBudget(docs,
        Dedup.nearDupComponents(docs, 0.7)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // web: two 7-token duplicates; the non-representative drops → half
    // the tokens survive
    assert(out("web") == ((2L, 1L, 14L, 7L, 0.5)), s"$out")
    // books: outside every near-dup pair — keep defaults true
    assert(out("books") == ((1L, 1L, 6L, 6L, 1.0)), s"$out")
  }

  test("annealMix: phase allocations sum exactly to their budgets and " +
    "follow each phase's eligible token mass") {
    // "the ... that" stopword-heavy text scores high; punctuation soup
    // scores low — srcA contributes to both phases, srcB to neither
    val hi = "the cat is that of a good and clean stopword heavy " +
      "sentence that is of the kind quality gates like to keep around"
    val lo = "@@ ## $$ %% ^^ && ** (( )) !! ?? ;; :: ~~ ``"
    val docs = Seq.tabulate(12)(i =>
      (i.toLong, if (i % 3 == 0) lo else hi,
        if (i % 2 == 0) "srcA" else "srcB"))
      .toDF("doc_id", "text", "source")
    val out = Curation.annealMix(docs, budget = 1000L,
        annealPermille = 100).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val mainSum = out.values.map(_._3).sum
    val annealSum = out.values.map(_._4).sum
    assert(mainSum == 900L, s"main allocs must sum to budget: $out")
    assert(annealSum == 100L, s"anneal allocs must sum to budget: $out")
    // both sources carry the same hi-quality token mass → equal shares
    assert(out("srcA")._1 == out("srcB")._1, s"$out")
    assert(math.abs(out("srcA")._3 - out("srcB")._3) <= 1, s"$out")
    // partition invariance (window ranks + IEEE shares are deterministic)
    val alt = Curation.annealMix(docs.repartition(7), budget = 1000L,
        annealPermille = 100).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(alt == out, s"partitioning changed allocations:\n$alt\n$out")
  }

  test("gateFairness: the stopword-biased gate passes the stopword-heavy " +
    "language and fails the punctuation-heavy one — and says so") {
    val hi = "the cat is that of a good and clean stopword heavy " +
      "sentence that is of the kind quality gates like to keep around"
    val lo = "@@ ## $$ %% ^^ && ** (( )) !! ?? ;; :: ~~ ``"
    val docs = (Seq.tabulate(4)(i => (i.toLong, hi, "en")) ++
      Seq.tabulate(4)(i => (10L + i, lo, "zz")))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("src0"))
    val out = Curation.gateFairness(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("en")._1 == 4L && out("en")._2 == 4L &&
      out("en")._3 == 1.0, s"$out")
    assert(out("zz")._1 == 4L && out("zz")._2 == 0L &&
      out("zz")._3 == 0.0, s"$out")
    assert(out("en")._4 > out("zz")._4,
      s"mean quality must expose the bias: $out")
  }

  test("effectiveTokens: a duplicate-ridden source is worth its unique " +
    "mass scaled by the repeat-decay curve") {
    val docs = Seq(
      (1L, "the cat sat on the mat today", "web"),
      (2L, "the cat sat on the mat today", "web"),
      (3L, "entirely different text content here now", "books"))
      .toDF("doc_id", "text", "source")
    val out = Curation.effectiveTokens(docs,
        Dedup.nearDupComponents(docs, 0.7)).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // books: epochs = 1 → effective == unique exactly (e^0 snap = 1)
    assert(out("books")._1 == 6L && out("books")._2 == 6L)
    assert(out("books")._3 == 1.0 && out("books")._4 == 6.0, s"$out")
    // web: 14 raw / 7 unique → 2 epochs; replicate the snapped formula
    val decay = BigDecimal(math.exp((1.0 - 2.0) / 15.0))
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = 7.0 + 7.0 * 15.0 * (1.0 - decay)
    assert(out("web")._3 == 2.0, s"$out")
    assert(out("web")._4 == expected, s"got ${out("web")._4} want $expected")
    // repeats are worth less than fresh: effective < raw, > unique
    assert(out("web")._4 > 7.0 && out("web")._4 < 14.0, s"$out")
  }
}
