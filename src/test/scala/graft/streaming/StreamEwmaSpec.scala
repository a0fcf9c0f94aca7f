package graft.streaming

import graft.SparkSpec
import graft.operators.Temporal

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming EWMA must smooth exactly like the batch operator on the
  * same rows, with the tap window stitched across batch boundaries
  * through state — bit-identical doubles (dyadic weights, pinned term
  * order), not approximately equal. */
class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("ewma equals the batch twin across a micro-batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    // two users, interleaved, with the split landing mid-window for
    // both — the partial-head renormalization AND the state stitch are
    // both exercised; values chosen non-dyadic so drift would show
    val all = Seq(
      (1L, 1L, ts(1), 3.7), (2L, 2L, ts(2), 100.1),
      (1L, 3L, ts(3), -1.3), (1L, 4L, ts(4), 9.9),
      (2L, 5L, ts(5), 7.77), (1L, 6L, ts(6), 0.123),
      (1L, 7L, ts(7), 55.5), (2L, 8L, ts(8), -0.01),
      (1L, 9L, ts(9), 2.22))
    val (b0, b1) = all.splitAt(5)
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val q = StreamEwma.scores(spark,
        input.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.format("memory").queryName("ewma_scores")
      .outputMode("append").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      val got = spark.table("ewma_scores").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3)))
        .sortBy(_._2).toSeq
      val batch = Temporal.ewma(
          all.toDF("user_id", "event_id", "ts", "value"))
        .select("user_id", "event_id", "value", "ewma")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3)))
        .sortBy(_._2).toSeq
      assert(got == batch,
        s"stream ewma must equal the batch twin bit-for-bit:\n$got\n$batch")
      // the first row of each user is its own value (partial-head
      // renormalization), even when that user starts mid-suite
      assert(got.find(_._2 == 1L).get._4 == 3.7)
      assert(got.find(_._2 == 2L).get._4 == 100.1)
    } finally q.stop()
  }

  test("full window uses exactly `taps` values (older history forgotten)") {
    implicit val sqlCtx = spark.sqlContext
    // 6 single-user rows across two batches; the last row's ewma reads
    // taps=4 values only — hand-checked dyadic arithmetic
    val all = (1 to 6).map(i => (1L, i.toLong, ts(i.toLong), i.toDouble))
    val (b0, b1) = (all.take(2), all.drop(2))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val q = StreamEwma.scores(spark,
        input.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.format("memory").queryName("ewma_scores2")
      .outputMode("append").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      val got = spark.table("ewma_scores2").collect()
        .map(r => r.getLong(1) -> r.getDouble(3)).toMap
      // row 6: (6 + 5/2 + 4/4 + 3/8) / (1 + 1/2 + 1/4 + 1/8)
      assert(got(6L) == (6.0 + 2.5 + 1.0 + 0.375) / 1.875, s"$got")
      // row 3 (partial): (3 + 2/2 + 1/4) / 1.75
      assert(got(3L) == (3.0 + 1.0 + 0.25) / 1.75, s"$got")
    } finally q.stop()
  }
}
