package graft.streaming

import graft.SparkSpec
import graft.operators.Temporal

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming anomaly detector must score exactly like the batch
  * operator on the same rows, with the baseline stitched across batch
  * boundaries through state. */
class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("scores equal the batch twin across a micro-batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    // alternating baseline then a spike, split mid-history across batches
    val all = (1 to 10).map(i =>
      (1L, i.toLong, ts(i.toLong),
        if (i % 2 == 0) 10.0 else 12.0)) :+ ((1L, 11L, ts(11L), 110.0))
    val (b0, b1) = all.splitAt(6)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Double, Long, Double, Double, Option[Double], Boolean)]()
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val q = StreamAnomaly.scores(spark,
        input.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.format("memory").queryName("anomaly_scores")
      .outputMode("append").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      val got = spark.table("anomaly_scores").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)),
          r.getBoolean(7)))
        .sortBy(_._2).toSeq
      val batch = Temporal.rollingAnomaly(
          all.toDF("user_id", "event_id", "ts", "value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3 - 1),
          r.getLong(3), r.getDouble(4), r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)),
          r.getBoolean(7)))
        .sortBy(_._2).toSeq
      assert(got == batch,
        s"stream scores must equal the batch twin:\n$got\n$batch")
      assert(got.exists(s => s._2 == 11L && s._8), "spike flags in-stream")
    } finally q.stop()
  }
}
