package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Watermarked streaming dedup: duplicates inside the watermark are
  * dropped; once state is evicted a re-arrival is re-emitted (the
  * documented at-least-once trade, mopped up by batch d1). */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("byContent drops in-watermark duplicates, re-emits after eviction") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamDedup.byContent(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "10 seconds", "text")
    val q = out.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    try {
      input.addData(Seq((ts(100), 1L, "same text"), (ts(102), 3L, "other text")))
      q.processAllAvailable()
      // duplicate arrives in a LATER batch (within a batch, which copy
      // survives is partition-order-dependent — not part of the contract)
      input.addData(Seq((ts(101), 2L, "same text")))
      q.processAllAvailable()
      assert(spark.table("sdedup_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L),
        "duplicate doc 2 suppressed inside the watermark")

      // advance the watermark far past the originals, evicting their state
      input.addData(Seq((ts(1000), 4L, "fresh text")))
      q.processAllAvailable()
      input.addData(Seq((ts(1001), 5L, "same text")))
      q.processAllAvailable()
      assert(spark.table("sdedup_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L, 5L),
        "post-eviction duplicate re-emitted (at-least-once trade)")
    } finally q.stop()
  }

  test("exact dedups on explicit keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamDedup.exact(
      input.toDF().toDF("ts", "event_id", "payload"),
      "ts", "1 minute", Seq("event_id"))
    val q = out.writeStream.format("memory").queryName("sdedup_keys")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (ts(100), 10L, "a"), (ts(101), 10L, "retry"), (ts(102), 11L, "b")))
      q.processAllAvailable()
      assert(spark.table("sdedup_keys").count() == 2)
    } finally q.stop()
  }

  test("nearDupVsIndex flags each batch's near-dups against the stored index") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog"
    val known = Seq((100L, base)).toDF("doc_id", "text")
    val pairs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()

    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.nearDupVsIndex(
      input.toDF().toDF("doc_id", "text"), known,
      sink = df => df.collect().foreach(r =>
        pairs.add((r.getLong(0), r.getLong(1), r.getDouble(2)))))
    try {
      // batch 1: one near-dup of the known doc (6 of 7 shingles shared →
      // jaccard 0.75), one unrelated doc
      input.addData(Seq(
        (1L, base.replace("dog", "cat")),
        (2L, "completely different words forming another document here")))
      q.processAllAvailable()
      assert(pairs.toArray.toSet ==
        Set((1L, 100L, 0.75)), "only the near-dup pairs with the index")

      // batch 2: an exact copy — flagged independently, per-batch cost
      input.addData(Seq((3L, base)))
      q.processAllAvailable()
      assert(pairs.toArray(Array.empty[(Long, Long, Double)]).toSet ==
        Set((1L, 100L, 0.75), (3L, 100L, 1.0)))
    } finally q.stop()
  }

  test("nearDupVsPrebuiltIndex matches the raw-docs path per batch") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog"
    // the stored side is the MATERIALIZED index — built once, here round-
    // tripped through parquet like the lake table it is in production
    val dir = java.nio.file.Files.createTempDirectory("graft-ndpi").toString
    graft.operators.Dedup.nearDupIndex(Seq((100L, base)).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val pairs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.nearDupVsPrebuiltIndex(
      input.toDF().toDF("doc_id", "text"), index,
      sink = df => df.collect().foreach(r =>
        pairs.add((r.getLong(0), r.getLong(1), r.getDouble(2)))))
    try {
      input.addData(Seq(
        (1L, base.replace("dog", "cat")),
        (2L, "completely different words forming another document here")))
      q.processAllAvailable()
      assert(pairs.toArray.toSet == Set((1L, 100L, 0.75)),
        "prebuilt-index path must flag exactly the raw-path pairs")
      input.addData(Seq((3L, base)))
      q.processAllAvailable()
      assert(pairs.toArray(Array.empty[(Long, Long, Double)]).toSet ==
        Set((1L, 100L, 0.75), (3L, 100L, 1.0)))
    } finally q.stop()
  }

  test("prefixVsIndex: per-batch exact dedup equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog"
    val known = Seq(
      (100L, base),
      (101L, "some other stored document with its own vocabulary entirely"))
      .toDF("doc_id", "text")
    // lake round-trip of both index tables, like production
    val dir = java.nio.file.Files.createTempDirectory("graft-pfi").toString
    val built = graft.operators.Dedup.prefixFilterIndex(known, 0.5)
    built.freq.write.parquet(s"$dir/freq")
    built.docs.write.parquet(s"$dir/docs")
    val index = graft.operators.Dedup.PrefixFilterIndex(
      spark.read.parquet(s"$dir/freq"), spark.read.parquet(s"$dir/docs"))
    val pairs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.prefixVsIndex(
      input.toDF().toDF("doc_id", "text"), index,
      sink = df => df.collect().foreach(r =>
        pairs.add((r.getLong(0), r.getLong(1), r.getDouble(2)))),
      threshold = 0.5)
    try {
      val b0 = Seq(
        (1L, base.replace("dog", "cat")),
        (2L, "completely different words forming another document here"))
      input.addData(b0)
      q.processAllAvailable()
      val twin = graft.operators.Dedup.prefixFilterVsIndex(
        b0.toDF("doc_id", "text"), index, 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairs.toArray(Array.empty[(Long, Long, Double)]).toSet == twin,
        "stream output must equal the batch twin")
      assert(twin.exists(p => p._1 == 1L && p._2 == 100L),
        "near-dup of the stored doc flagged")
    } finally q.stop()
  }

  test("spanScoreVsIndex scores arriving docs against stored boilerplate") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LlmText
    // corpus with a 6-word boilerplate run in two docs -> its three 4-word
    // windows form the shared-span index
    val boiler = "all rights reserved by example corp"
    val corpus = Seq(
      (100L, s"alpha beta gamma $boiler"),
      (101L, s"$boiler delta epsilon zeta"),
      (102L, "unrelated corpus document with distinct words")).toDF("doc_id", "text")
    val index = LlmText.sharedSpanIndex(corpus)
    val scores = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long, Boolean)]()

    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.spanScoreVsIndex(
      input.toDF().toDF("doc_id", "text"), index,
      sink = df => df.collect().foreach(r => scores.add(
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))))
    try {
      // arriving doc 1 is pure boilerplate (3 windows, all indexed);
      // doc 2 shares nothing
      input.addData(Seq(
        (1L, boiler),
        (2L, "fresh novel writing with entirely new vocabulary")))
      q.processAllAvailable()
      assert(scores.toArray.toSet == Set(
        (1L, 3L, 3L, true), (2L, 4L, 0L, false)))

      // the streaming result equals the batch operator on the same rows
      val batchTwin = LlmText.spanScoreVsIndex(
        Seq((1L, boiler),
          (2L, "fresh novel writing with entirely new vocabulary"))
          .toDF("doc_id", "text"), index)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4))).toSet
      assert(scores.toArray.toSet == batchTwin)
    } finally q.stop()
  }

  test("phashVsIndex: arriving media probe the stored signature table") {
    implicit val sqlCtx = spark.sqlContext
    val long = (0 until 300).map(i => ('a' + (i * 7 + i / 3) % 26).toChar)
      .mkString
    val known = Seq((100L, long), (101L, long.reverse))
      .toDF("doc_id", "text")
    // lake round-trip like production
    val dir = java.nio.file.Files.createTempDirectory("graft-phi").toString
    graft.operators.Multimodal.phashIndex(known).sigs
      .write.parquet(s"$dir/sigs")
    val index = graft.operators.Multimodal.PhashIndex(
      spark.read.parquet(s"$dir/sigs"))
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Int)]()
    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.phashVsIndex(
      input.toDF().toDF("doc_id", "text"), index,
      sink = df => df.collect().foreach(r =>
        hits.add((r.getLong(0), r.getLong(1), r.getInt(2)))))
    try {
      val b0 = Seq(
        (1L, long),                          // re-upload of stored 100
        (2L, "short unrelated"))             // under the size floor
      input.addData(b0)
      q.processAllAvailable()
      val twin = graft.operators.Multimodal.phashVsIndex(
        b0.toDF("doc_id", "text"), index).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val got = hits.toArray(Array.empty[(Long, Long, Int)]).toSet
      assert(got == twin, s"stream must equal the batch twin:\n$got\n$twin")
      assert(got.contains((1L, 100L, 0)),
        s"re-upload found at hamming 0: $got")
    } finally q.stop()
  }

  test("dirtyBucketGauge: per-batch new-vs-existing bucket split equals " +
    "the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog"
    val index = graft.operators.Dedup.nearDupIndex(
      Seq((100L, base)).toDF("doc_id", "text"))
    index.count()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long, Double, Long)]()
    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.dirtyBucketGauge(
      input.toDF().toDF("doc_id", "text"), index,
      sink = df => df.collect().foreach(r => rows.add((
        r.getLong(r.fieldIndex("n_touched")),
        r.getLong(r.fieldIndex("n_new")),
        r.getLong(r.fieldIndex("n_existing")),
        r.getDouble(r.fieldIndex("new_frac")),
        r.getLong(r.fieldIndex("batch_id"))))))
    try {
      // batch 1: an exact copy of the known doc — every touched bucket
      // already exists (pure duplication pressure, new_frac 0)
      input.addData(Seq((1L, base)))
      q.processAllAvailable()
      // batch 2: unrelated content — every bucket is new space
      input.addData(Seq(
        (2L, "completely different words forming another document here")))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows.toArray(Array.empty[(Long, Long, Long, Double, Long)])
      .toSet
    assert(got.contains((4L, 0L, 4L, 0.0, 0L)), s"$got")
    assert(got.contains((4L, 4L, 0L, 1.0, 1L)), s"$got")
    // stream body == batch twin on the same frames
    val twin = graft.operators.Dedup.batchDirtyBuckets(
        Seq((1L, base)).toDF("doc_id", "text"), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(twin == Seq((4L, 0L, 4L, 0.0)), s"$twin")
    // empty batch → empty report
    assert(graft.operators.Dedup.batchDirtyBuckets(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), index)
      .collect().isEmpty)
  }

  test("chainVsIndex: arriving continuations probe the stored boundary " +
    "index and equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val known = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six"))
      .toDF("doc_id", "text")
    // lake round-trip like production
    val dir = java.nio.file.Files.createTempDirectory("graft-cbi").toString
    graft.operators.DedupSources.chainBoundaryIndex(known)
      .write.parquet(s"$dir/index")
    val index = spark.read.parquet(s"$dir/index")
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long)]()
    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.chainVsIndex(
      input.toDF().toDF("doc_id", "text"), index,
      sink = df => df.collect().foreach(r =>
        hits.add((r.getLong(0), r.getLong(1), r.getLong(2)))))
    try {
      val b0 = Seq(
        (1L, "zeta eta theta continues the stored document"), // 3-stitch
        (2L, "totally unrelated arrival text here"))
      input.addData(b0)
      q.processAllAvailable()
      val twin = graft.operators.DedupSources.chainOverlapVsIndex(
        b0.toDF("doc_id", "text"), index).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = hits.toArray(Array.empty[(Long, Long, Long)]).toSet
      assert(got == twin, s"stream must equal the batch twin:\n$got\n$twin")
      assert(got.contains((100L, 1L, 3L)),
        s"continuation of stored doc 100 found: $got")
    } finally q.stop()
  }
}
