package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming event transitions: pairs stitch across micro-batches via the
  * per-user last-event state, and the accumulated pair counts equal the
  * batch twin (Temporal.eventTransitions) over the same replayed events. */
class StreamTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("pairs stitch across batches and match the batch twin's counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val out = StreamTransitions.pairs(spark,
      input.toDF().toDF("user_id", "event_id", "event_type", "ts"))
    val q = out.writeStream.format("memory").queryName("strans_out")
      .outputMode("append").start()
    val batch1 = Seq(
      (1L, 1L, "view", ts(1)), (1L, 2L, "click", ts(2)),
      // out of arrival order inside the batch — ts/event_id order rules
      (2L, 4L, "purchase", ts(9)), (2L, 3L, "view", ts(8)))
    val batch2 = Seq(
      // continues user 1's journey: click (state) → view
      (1L, 5L, "view", ts(3)),
      (2L, 6L, "error", ts(10)))
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val streamed = spark.table("strans_out")
        .groupBy("from_type", "to_type").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed(("click", "view")) == 1L, "cross-batch stitch")
      val batchTwin = graft.operators.Temporal.eventTransitions(
        (batch1 ++ batch2).toDF("user_id", "event_id", "event_type", "ts"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batchTwin,
        s"stream $streamed vs batch $batchTwin")
    } finally q.stop()
  }
}
