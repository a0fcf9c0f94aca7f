package graft.errors

import graft.SparkSpec
import graft.core.{ErrorHeaderNames => H}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of the reference's header assertions
  * (SimpleVavrStreamConsumerTopologyTest.java:149-180,
  * KafkaErrorToHeaderBuilder.java:39-80, HeaderTo.java:34-98). */
class ErrorHeadersSpec extends SparkSpec {
  import spark.implicits._

  private def errStruct = struct(
    lit("boom msg").as("message"),
    lit("FAILED_TO_PROCESS_RECORD").as("code"),
    lit("java.io.IOException").as("exceptionClass"),
    lit("io broke").as("exceptionMessage"),
    lit(null).cast(StringType).as("stackTrace"),
    lit("graft.Dummy").as("targetClass"),
    lit(null).cast(BinaryType).as("rawBytes"))

  private def headerMap(r: Row): Map[String, String] =
    r.getSeq[Row](0).map(h =>
      h.getString(0) -> new String(h.getAs[Array[Byte]](1), "UTF-8")).toMap

  test("build writes the 11 diagnostic headers (null-valued ones dropped)") {
    val df = Seq(1).toDF("x").select(ErrorHeaders.build("app-1", errStruct,
      lit("topic-a"), lit(3), lit(42L),
      lit("2024-01-02 03:04:05").cast("timestamp")).as("headers"))
    val m = headerMap(df.head())
    assert(m(H.ApplicationId) == "app-1")
    assert(m(H.Topic) == "topic-a")
    assert(m(H.Partition) == "3")
    assert(m(H.Offset) == "42")
    // epoch MILLIS like ctx.timestamp() (KafkaErrorToHeaderBuilder.java:47)
    assert(m(H.Timestamp) == "1704164645000")
    assert(m(H.ApplicationCode) == "FAILED_TO_PROCESS_RECORD")
    assert(m(H.ApplicationMessage) == "boom msg")
    assert(m(H.TargetClass) == "graft.Dummy")
    assert(m(H.ExceptionClass) == "java.io.IOException")
    assert(m(H.ExceptionMessage) == "io broke")
    // stackTrace is null → header absent, mirroring Kafka's behavior
    assert(!m.contains(H.ExceptionStackTrace))
    assert(m.size == 10)
  }

  test("mergeOnto flushes stale error headers but keeps user headers") {
    val stale = array(
      struct(lit(H.Topic).as("key"), lit("old-topic").cast("binary").as("value")),
      struct(lit("user.header").as("key"), lit("keep").cast("binary").as("value")))
    val fresh = ErrorHeaders.build("app-1", errStruct,
      lit("new-topic"), lit(0), lit(1L), lit("2024-01-01 00:00:00").cast("timestamp"))
    val df = Seq(1).toDF("x")
      .select(ErrorHeaders.mergeOnto(stale, fresh).as("headers"))
    val m = headerMap(df.head())
    assert(m("user.header") == "keep")
    assert(m(H.Topic) == "new-topic")
    val keys = df.head().getSeq[Row](0).map(_.getString(0))
    assert(keys.count(_ == H.Topic) == 1, "stale copy must be flushed")
  }

  test("headersToColumns lifts the reference's 8 headers and drops headers") {
    val fresh = ErrorHeaders.build("app-1", errStruct,
      lit("t"), lit(0), lit(7L), lit("2024-01-01 00:00:00").cast("timestamp"))
    val df = Seq(1).toDF("x").select(lit(5L).as("event_id"), fresh.as("headers"))
    val lifted = ErrorHeaders.headersToColumns(df)
    assert(!lifted.columns.contains("headers"))
    // exactly the HeaderTo.java:73-82 set: no timestamp/partition/offset
    assert(lifted.columns.toSet == Set("event_id",
      "error_source_target_class", "error_source_application_code",
      "error_source_application_id", "error_source_exception_message",
      "error_source_exception_stack_trace", "error_source_topic",
      "error_source_application_message", "error_source_exception_class"))
    val row = lifted.select("error_source_application_id", "error_source_topic",
      "error_source_target_class", "error_source_exception_class",
      "error_source_exception_stack_trace").head()
    assert(row.getString(0) == "app-1")
    assert(row.getString(1) == "t")
    assert(row.getString(2) == "graft.Dummy")
    assert(row.getString(3) == "java.io.IOException")
    assert(row.isNullAt(4), "absent header lifts as null")
  }

  test("headersToStructColumn (Key variant) extends the struct, keeps value") {
    val fresh = ErrorHeaders.build("app-1", errStruct,
      lit("t"), lit(0), lit(7L), lit("2024-01-01 00:00:00").cast("timestamp"))
    val df = Seq(1).toDF("x").select(
      struct(lit("k-9").as("business_key")).as("key"),
      lit("payload").as("value"),
      fresh.as("headers"))
    val lifted = ErrorHeaders.headersToStructColumn(df, "key")
    assert(!lifted.columns.contains("headers"))
    assert(lifted.columns.toSeq == Seq("key", "value"))
    val keyRow = lifted.select("key.*").head()
    val fields = lifted.select("key.*").columns
    assert(fields.head == "business_key")
    assert(fields.contains("error_source_application_id"))
    assert(keyRow.getString(0) == "k-9")
    assert(keyRow.getString(fields.indexOf("error_source_topic")) == "t")
    assert(lifted.select("value").head().getString(0) == "payload")
  }
}
