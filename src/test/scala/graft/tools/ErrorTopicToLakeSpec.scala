package graft.tools

import java.sql.Timestamp

import graft.SparkSpec
import graft.core.{ErrorCodes, GraftConf, ErrorHeaderNames => H}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Integration chain for the deployable error-topic → warehouse job:
  * memory-stream (kafka-shaped error records with diagnostic headers) →
  * ErrorTopicToLake.run → partitioned parquet → queryable lake table.
  * The streaming twin of the reference's Connect+HeaderTo+Elasticsearch
  * deployment (HeaderTo.java:88-98, README.md:94-116). */
class ErrorTopicToLakeSpec extends SparkSpec {
  import spark.implicits._

  private def hs(pairs: (String, String)*): Seq[(String, Array[Byte])] =
    pairs.map { case (k, v) => k -> v.getBytes("UTF-8") }

  test("memory-stream -> job -> queryable partitioned lake table") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-errlake").toString
    val lake = s"$base/lake"
    val input = MemoryStream[
      (String, Array[Byte], Seq[(String, Array[Byte])], String, Int, Long,
        Timestamp)]
    // error-topic shape: key, raw payload bytes, diagnostic headers, and the
    // error topic's own Kafka metadata (what kafkaSource yields)
    val source = input.toDF()
      .toDF("key", "value", "headers", "topic", "partition", "offset",
        "timestamp")
      .withColumn("headers", transform(col("headers"), h =>
        struct(h.getField("_1").as("key"), h.getField("_2").as("value"))))
    val conf = GraftConf(applicationId = "err-lake-test",
      checkpointLocation = s"$base/ckpt", commitDir = s"$base/commits")
    val q = ErrorTopicToLake.run(source, conf, lake)
    try {
      input.addData(Seq(
        ("k1", "raw-payload-1".getBytes("UTF-8"),
          hs(H.ApplicationCode -> ErrorCodes.FailedToDeserializeRecord,
            H.ApplicationId -> "orders-app",
            H.ApplicationMessage -> "Failed to deserialize record to Order",
            H.ExceptionClass -> "graft.streaming.FakeDeserException",
            H.TargetClass -> "Order"),
          "orders-error", 0, 42L, Timestamp.valueOf("2026-03-01 10:00:00")),
        ("k2", "raw-payload-2".getBytes("UTF-8"),
          hs(H.ApplicationCode -> ErrorCodes.FailedToProcessRecord,
            H.ApplicationId -> "orders-app",
            H.ApplicationMessage -> "business says no",
            H.ExceptionClass -> "java.lang.IllegalStateException",
            H.TargetClass -> "Order"),
          "orders-error", 1, 7L, Timestamp.valueOf("2026-03-02 11:00:00"))))
      q.processAllAvailable()
    } finally q.stop()

    // partition layout on disk: date first, then the error-code class
    val dateDirs = new java.io.File(lake).list().toSet
    assert(dateDirs.contains("error_date=2026-03-01") &&
      dateDirs.contains("error_date=2026-03-02"), s"saw $dateDirs")
    val codeDirs =
      new java.io.File(s"$lake/error_date=2026-03-01").list().toSet
    assert(codeDirs.exists(_.endsWith(ErrorCodes.FailedToDeserializeRecord)),
      s"saw $codeDirs")

    // queryable as a lake table with the lifted triage columns
    spark.read.parquet(lake).createOrReplaceTempView("error_lake")
    val row = spark.sql(
      """SELECT key, CAST(value AS STRING) AS payload, topic, offset,
        |  error_source_application_id, error_source_application_message,
        |  error_source_exception_class
        |FROM error_lake
        |WHERE error_source_application_code = 'FAILED_TO_PROCESS_RECORD'
        |""".stripMargin).collect()
    assert(row.length == 1)
    assert(row(0).getString(0) == "k2")
    assert(row(0).getString(1) == "raw-payload-2", "raw bytes ride along")
    assert(row(0).getString(4) == "orders-app")
    assert(row(0).getString(5) == "business says no")
    assert(row(0).getString(6) == "java.lang.IllegalStateException")
    // the consumed headers column is dropped, like the SMT removes them
    assert(!spark.read.parquet(lake).columns.contains("headers"))

    // a record with NO diagnostic headers still lands (absent -> UNKNOWN
    // partition, null lifted columns) — triage sees it instead of losing it
    val input2 = MemoryStream[
      (String, Array[Byte], Seq[(String, Array[Byte])], String, Int, Long,
        Timestamp)]
    val source2 = input2.toDF()
      .toDF("key", "value", "headers", "topic", "partition", "offset",
        "timestamp")
      .withColumn("headers", transform(col("headers"), h =>
        struct(h.getField("_1").as("key"), h.getField("_2").as("value"))))
    val conf2 = GraftConf(applicationId = "err-lake-test-2",
      checkpointLocation = s"$base/ckpt2")
    val q2 = ErrorTopicToLake.run(source2, conf2, lake)
    try {
      input2.addData(Seq(("k3", "naked".getBytes("UTF-8"),
        hs(), "orders-error", 0, 9L,
        Timestamp.valueOf("2026-03-03 09:00:00"))))
      q2.processAllAvailable()
    } finally q2.stop()
    val naked = spark.read.parquet(lake)
      .filter(col("error_source_application_code") === "UNKNOWN").collect()
    assert(naked.length == 1 && naked(0).getAs[String]("key") == "k3")
  }
}
