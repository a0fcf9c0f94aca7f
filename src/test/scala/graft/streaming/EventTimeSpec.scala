package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Watermark semantics: windows finalize in append mode once the watermark
  * passes their end; data later than the watermark is dropped. */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("tumbling windows finalize on watermark and drop late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = EventTime.tumbling(
      input.toDF().toDF("ts", "etype", "value"),
      "ts", "etype", "value", "1 minute", "10 seconds")
    val q = out.writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try {
      // two events in window [0, 60)
      input.addData(Seq((ts(5), "a", 1.0), (ts(30), "a", 2.0)))
      q.processAllAvailable()
      assert(spark.table("tumbling_out").count() == 0,
        "window still open — nothing emitted in append mode")

      // an event far past the window advances the watermark beyond 60
      input.addData(Seq((ts(200), "a", 5.0)))
      q.processAllAvailable()
      input.addData(Seq((ts(201), "a", 0.0))) // push watermark past 190
      q.processAllAvailable()
      val closed = spark.table("tumbling_out")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000,
          r.getString(2), r.getLong(3), r.getDouble(4)))
      assert(closed.toSeq == Seq((0L, "a", 2L, 3.0)))

      // late data before the watermark is dropped, not re-emitted
      input.addData(Seq((ts(10), "a", 100.0)))
      q.processAllAvailable()
      assert(spark.table("tumbling_out").count() == 1)
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = EventTime.session(
      input.toDF().toDF("ts", "user", "value"),
      "ts", "user", "30 seconds", "5 seconds")
    val q = out.writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try {
      // events 10s apart merge into one session; then silence
      input.addData(Seq((ts(0), "u1", 1.0), (ts(10), "u1", 1.0)))
      q.processAllAvailable()
      input.addData(Seq((ts(500), "u1", 1.0)))  // watermark → 495
      q.processAllAvailable()
      input.addData(Seq((ts(600), "u1", 1.0)))
      q.processAllAvailable()
      val sessions = spark.table("session_out")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000,
          r.getTimestamp(1).getTime / 1000, r.getLong(3)))
      // first session merges the two events 10s apart: [0, 10+30);
      // the lone t=500 event closes as its own [500, 530) session once the
      // watermark passes 530
      assert(sessions.sortBy(_._1).toSeq == Seq((0L, 40L, 2L), (500L, 530L, 1L)))
    } finally q.stop()
  }

  test("sliding windows put each event in length/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = EventTime.sliding(
      input.toDF().toDF("ts", "etype", "value"),
      "ts", "etype", "value", "1 minute", "30 seconds", "5 seconds")
    val q = out.writeStream.format("memory").queryName("sliding_out")
      .outputMode("append").start()
    try {
      // event at t=100 belongs to windows [60,120) and [90,150)
      input.addData(Seq((ts(100), "a", 2.0)))
      q.processAllAvailable()
      input.addData(Seq((ts(400), "a", 1.0))) // watermark past both windows
      q.processAllAvailable()
      input.addData(Seq((ts(401), "a", 0.0)))
      q.processAllAvailable()
      val wins = spark.table("sliding_out")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000,
          r.getTimestamp(1).getTime / 1000, r.getLong(3), r.getDouble(4)))
        .filter(_._3 > 0).sortBy(_._1)
      assert(wins.count(w => w._1 == 60 && w._2 == 120 && w._4 == 2.0) == 1)
      assert(wins.count(w => w._1 == 90 && w._2 == 150 && w._4 == 2.0) == 1)
    } finally q.stop()
  }
}
