package graft.streaming

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.operators.Curation

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming curation gates: each micro-batch's drift / divergence rows
  * must equal the batch twin run on the same frames. */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private val accepted = Seq(
    (100L, "alpha beta gamma delta epsilon zeta", "srcA"),
    (101L, "alpha alpha beta beta gamma gamma", "srcA"),
    (102L, "one two three four five six seven", "srcB"))
    .toDF("doc_id", "text", "source")

  test("driftVsAccepted emits the c20 verdict per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long, Double, Boolean, Long)]()
    val input = MemoryStream[(Long, String, String)]
    val q = StreamCuration.driftVsAccepted(
      input.toDF().toDF("doc_id", "text", "source"), accepted,
      df => df.collect().foreach(r => rows.add((r.getString(0),
        r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4),
        r.getLong(5)))))
    try {
      val b0 = Seq((1L, "alpha beta gamma delta epsilon zeta", "srcA"))
      val b1 = Seq(
        (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "srcA"),
        (3L, "one two three four five six seven", "srcB"))
      input.addData(b0)
      q.processAllAvailable()
      input.addData(b1)
      q.processAllAvailable()
      val got = rows.asScala.toSet
      val want = (
        Curation.qualityDrift(accepted,
            b0.toDF("doc_id", "text", "source")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getBoolean(4), 0L)) ++
        Curation.qualityDrift(accepted,
            b1.toDF("doc_id", "text", "source")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getBoolean(4), 1L))).toSet
      assert(got == want, s"stream rows must equal batch twin:\n$got\n$want")
      // the junk batch must actually trip the gate for srcA
      assert(got.exists(r => r._1 == "srcA" && r._6 == 1L && r._5),
        "symbol-soup batch drifts past the bar")
    } finally q.stop()
  }

  test("batchDivergence: zero KL on an identical distribution, OOV counted") {
    val counts = Seq(("alpha", 2L), ("beta", 1L)).toDF("tok", "cw")
    // batch with the same distribution as accepted → every ratio is 1
    val same = Seq((1L, "alpha alpha beta", "srcA")).toDF("doc_id", "text", "source")
    val r = StreamCuration.batchDivergence(same, counts).collect().head
    assert(r.getLong(r.fieldIndex("n_tokens")) == 3L)
    assert(r.getLong(r.fieldIndex("n_oov_tokens")) == 0L)
    assert(r.getDouble(r.fieldIndex("kl_nats")) == 0.0)
    // unseen tokens are carved out and counted, not folded into the KL
    val oov = Seq((2L, "alpha zzz zzz", "srcA")).toDF("doc_id", "text", "source")
    val r2 = StreamCuration.batchDivergence(oov, counts).collect().head
    assert(r2.getLong(r2.fieldIndex("n_oov_tokens")) == 2L)
    assert(!r2.getDouble(r2.fieldIndex("kl_nats")).isNaN)
  }

  test("divergenceVsAccepted equals the batch twin per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val counts = Seq(("alpha", 2L), ("beta", 1L), ("one", 5L))
      .toDF("tok", "cw")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long, Long, Double, Long)]()
    val input = MemoryStream[(Long, String, String)]
    val q = StreamCuration.divergenceVsAccepted(
      input.toDF().toDF("doc_id", "text", "source"), counts,
      df => df.collect().foreach(r => rows.add((r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getLong(5)))))
    try {
      val b0 = Seq((1L, "alpha beta beta one", "srcA"))
      input.addData(b0)
      q.processAllAvailable()
      val want = StreamCuration.batchDivergence(
          b0.toDF("doc_id", "text", "source"), counts).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), 0L)).toSet
      assert(rows.asScala.toSet == want)
    } finally q.stop()
  }

  test("fertilityVsDict: per-batch chars-per-token gate vs trained dict") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // train the dictionary on the accepted snapshot (the stored artifact)
    val train = Seq(
      (100L, "aaaa aaaa bb", 12L), (101L, "aaaa bb bb", 10L))
      .toDF("doc_id", "text", "n_chars")
    val dict = graft.operators.LlmBpe.bpeDictionary(train, nMerges = 4)
    val baseline = graft.operators.LlmBpe
      .bpeDocStatsVsDict(train, dict)
      .agg(org.apache.spark.sql.functions
        .sum(col("n_chars")).cast("double") /
        org.apache.spark.sql.functions.sum(col("n_tokens")))
      .head().getDouble(0)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long, Long, Option[Double], Boolean, Long)]()
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamCuration.fertilityVsDict(
      input.toDF().toDF("doc_id", "text", "n_chars"), dict, baseline,
      df => df.collect().foreach(r => rows.add((r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getBoolean(5), r.getLong(6)))))
    try {
      // batch 0: on-distribution (chars/token 2.0 vs baseline 22/9,
      // inside the 20% bar); batch 1: all-OOV drifted junk
      val b0 = Seq((1L, "aaaa bb bb", 10L))
      val b1 = Seq((2L, "zzzz qqqq wwww xxxx", 19L))
      input.addData(b0)
      q.processAllAvailable()
      input.addData(b1)
      q.processAllAvailable()
      val got = rows.asScala.toSet
      val want = Seq(b0 -> 0L, b1 -> 1L).map { case (b, id) =>
        val r = StreamCuration.batchFertility(
          b.toDF("doc_id", "text", "n_chars"), dict, baseline).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5), id)
      }.toSet
      assert(got == want, s"stream rows must equal batch twin:\n$got\n$want")
      assert(got.exists(r => r._7 == 0L && !r._6),
        "on-distribution batch passes the gate")
      assert(got.exists(r => r._7 == 1L && r._6 && r._3 == 4L),
        "OOV junk batch drifts and every word counts as OOV")
    } finally q.stop()
  }

  test("embeddingDriftVsAccepted equals the batch e15 gate per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val accepted = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(1.0f, 0.0f)),
      (4L, 1, Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Double, Boolean, Long)]()
    val input = MemoryStream[(Long, Int, Array[Float])]
    val q = StreamCuration.embeddingDriftVsAccepted(
      input.toDF().toDF("vec_id", "label", "embedding"), accepted,
      df => df.collect().foreach(r =>
        rows.add((r.getInt(0), r.getDouble(3), r.getBoolean(4),
          r.getLong(5)))))
    try {
      // batch 0: label 0 aligned; batch 1: label 1 rotated orthogonal
      input.addData(Seq((10L, 0, Array(1.0f, 0.0f))))
      q.processAllAvailable()
      input.addData(Seq((11L, 1, Array(1.0f, 0.0f))))
      q.processAllAvailable()
      val got = rows.toArray(Array.empty[(Int, Double, Boolean, Long)]).toSet
      assert(got == Set((0, 1.0, false, 0L), (1, 0.0, true, 1L)),
        s"stream drift rows: $got")
    } finally q.stop()
  }

  test("weightedReservoir: stream-final reservoir equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("wres-").toString + "/reservoir"
    val input = MemoryStream[(Long, Long)]
    val q = StreamCuration.weightedReservoir(
      input.toDF().toDF("doc_id", "n_chars"), dir, k = 8)
    val all = (1L to 40L).map(i => (i, 1L + (i * 53) % 300))
    try {
      all.grouped(13).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    val want = Curation.weightedSample(
        all.toDF("doc_id", "n_chars"), k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    assert(got == want,
      s"reservoir must equal batch A-ES over the whole stream:\n$got\n$want")
  }

  test("weightedReservoir: a replayed batch does not double-insert") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("wres-replay-").toString + "/reservoir"
    val all = (1L to 40L).map(i => (i, 1L + (i * 53) % 300))
    val first = all.take(13)
    val input = MemoryStream[(Long, Long)]
    val q = StreamCuration.weightedReservoir(
      input.toDF().toDF("doc_id", "n_chars"), dir, k = 8)
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(all.drop(13))
      q.processAllAvailable()
      // foreachBatch is at-least-once: a crash between the reservoir
      // overwrite and the offset commit re-offers an already-merged batch.
      // The A-ES key is a pure function of (doc_id, weight), so the replay
      // is row-identical — the merge must dedup it, not let the duplicate
      // occupy a second of the k slots and displace a distinct doc.
      input.addData(first)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    val want = Curation.weightedSample(
        all.toDF("doc_id", "n_chars"), k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    assert(got == want,
      s"replay must be idempotent — stream-final == batch twin:\n$got\n$want")
  }

  test("lmScoreVsRef scores each batch under the stored reference LM") {
    // stored snapshot tables (built once, offline): bigram counts and
    // context counts of a reference corpus "a b a b / b a"
    val biCnt = Seq(("a b", 2L), ("b a", 2L)).toDF("bigram", "cb")
    val ctxCnt = Seq(("a", 2L), ("b", 2L)).toDF("w1", "cw")
    implicit val sqlCtx = spark.sqlContext
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Double, Long)]()
    val input = MemoryStream[(Long, String)]
    val q = StreamCuration.lmScoreVsRef(
      input.toDF().toDF("doc_id", "text"), biCnt, ctxCnt,
      df => df.collect().foreach(r =>
        rows.add((r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3)))))
    try {
      input.addData(Seq((1L, "a b"), (2L, "q r")))
      q.processAllAvailable()
      input.addData(Seq((3L, "b a")))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows.asScala.toSet
    def twin(batch: Seq[(Long, String)], id: Long) =
      StreamCuration.batchLmScore(batch.toDF("doc_id", "text"),
          biCnt, ctxCnt)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), id))
    val want = (twin(Seq((1L, "a b"), (2L, "q r")), 0L) ++
      twin(Seq((3L, "b a")), 1L)).toSet
    assert(got == want, s"stream rows must equal batch twin:\n$got\n$want")
    // in-distribution "a b": p=(2+1)/(2+2); unseen "q r": p=1/(0+2) —
    // finite, and ranked strictly lower
    val byDoc = got.map(t => t._1 -> t._3).toMap
    assert(byDoc(2L) < byDoc(1L), s"$byDoc")
    assert(!byDoc(2L).isNaN && !byDoc(2L).isInfinite)
  }
}
