package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import graft.SparkSpec
import graft.core.ErrorCodes

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** M1: the two error counters of the reference
  * (MetricsBuilder.java:15-61) surfaced via Dataset.observe + listener. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("observeErrors counts deser and business errors per micro-batch") {
    val published = new ConcurrentHashMap[String, Long]()
    val listener = Metrics.listener((k, v) => published.merge(k, v, _ + _))
    spark.streams.addListener(listener)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val withError = input.toDF()
      .select(when(col("value") === "deser",
          struct(lit(ErrorCodes.FailedToDeserializeRecord).as("code")))
        .when(col("value") === "biz",
          struct(lit(ErrorCodes.FailedToProcessRecord).as("code")))
        .otherwise(lit(null).cast("struct<code:string>")).as("error"))
    val q = Metrics.observeErrors(withError)
      .writeStream.format("noop").start()
    try {
      input.addData(Seq("ok", "deser", "biz", "deser", "ok"))
      q.processAllAvailable()
      // listener events are async — wait briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (!published.containsKey(Metrics.DeserErrors) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
    assert(published.get(Metrics.DeserErrors) == 2L)
    assert(published.get(Metrics.ProcessErrors) == 1L)
  }
}
