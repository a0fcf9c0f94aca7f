package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream equi-join with watermarks and a time-range condition —
  * SURVEY §2.8's join row on the streaming side. State on both sides is
  * bounded by the watermark + range bound, which is what makes the join
  * runnable forever at scale. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  // Offset well past epoch 0: with an event-time range join the initial
  // watermark is epoch 0, and input rows at or before the watermark are
  // dropped as late.
  private def ts(sec: Long) = new Timestamp((1700000000L + sec) * 1000)

  test("orders join payments within a 60s window, late rows dropped") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[(Long, Timestamp)]
    val payments = MemoryStream[(Long, Timestamp, Double)]
    val o = orders.toDF().toDF("order_id", "o_ts")
      .withWatermark("o_ts", "10 seconds")
    val p = payments.toDF().toDF("pay_order_id", "p_ts", "amount")
      .withWatermark("p_ts", "10 seconds")
    val joined = o.join(p,
      col("order_id") === col("pay_order_id") &&
        col("p_ts") >= col("o_ts") &&
        col("p_ts") <= col("o_ts") + expr("INTERVAL 60 seconds"))
    val q = joined.select("order_id", "amount")
      .writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").start()
    try {
      orders.addData(Seq((1L, ts(0)), (2L, ts(5))))
      payments.addData(Seq((1L, ts(30), 9.99)))       // within 60s of order 1
      q.processAllAvailable()
      payments.addData(Seq((2L, ts(120), 5.0)))       // outside the window
      q.processAllAvailable()
      val rows = spark.table("ss_join_out")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((1L, 9.99)), "only the in-window payment matches")
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch from a broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Double)]
    // static dimension: stays on the executors, re-joined per micro-batch
    // with no streaming state at all — the 100 TB enrichment pattern for
    // slowly-changing reference data
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val enriched = events.toDF().toDF("user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left_outer")
    val q = enriched.writeStream.format("memory").queryName("sstatic_out")
      .outputMode("append").start()
    try {
      events.addData(Seq((1L, 5.0), (3L, 7.0)))
      q.processAllAvailable()
      events.addData(Seq((2L, 1.0)))
      q.processAllAvailable()
      val rows = spark.table("sstatic_out").collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          Option(r.getString(2)))).toSet
      assert(rows == Set(
        (1L, 5.0, Some("gold")),
        (3L, 7.0, None),          // unmatched key survives the outer join
        (2L, 1.0, Some("basic"))))
      // no stateful operator: the static side is not streaming state
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
