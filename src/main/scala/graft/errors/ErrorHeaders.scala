package graft.errors

import graft.core.ErrorHeaderNames._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error-diagnostic headers as Kafka header columns, and the inverse
  * projection lifting headers back to struct fields.
  *
  * Kafka sources/sinks expose headers as
  * `array<struct<key: string, value: binary>>` (includeHeaders=true). The
  * reference writes 11 diagnostic headers onto every error record
  * (/root/reference/src/main/java/fr/barbicane/maston/builder/KafkaErrorToHeaderBuilder.java:39-66)
  * after flushing stale copies (:68-80); its Connect SMT `HeaderTo` lifts 8 of
  * them back to struct fields, renaming dots to underscores and removing the
  * consumed headers (HeaderTo.java:39-98). Both are plain column expressions
  * here — codegen-friendly, no UDFs.
  */
object ErrorHeaders {

  private def header(name: String, value: Column): Column =
    struct(lit(name).as("key"), value.cast("binary").as("value"))

  /** Build the 11-header array from source metadata + the error struct.
    * Values are UTF-8 string bytes, like the reference's
    * `String.getBytes()` writes. Null-valued headers are dropped, matching
    * Kafka's behavior of simply not seeing absent headers.
    *
    * @param applicationId analog of the Kafka Streams application id
    * @param error the GraftError struct column
    * @param topic/partition/offset/timestamp Kafka source metadata columns
    */
  def build(
      applicationId: String,
      error: Column,
      topic: Column,
      partition: Column,
      offset: Column,
      timestamp: Column): Column = {
    val hs = Seq(
      header(ApplicationId, lit(applicationId)),
      // epoch MILLIS, matching the reference's ctx.timestamp()
      // (KafkaErrorToHeaderBuilder.java:47) — downstream error-topic
      // consumers parse this as a Kafka record timestamp.
      header(Timestamp, unix_millis(timestamp).cast("string")),
      header(Topic, topic.cast("string")),
      header(Partition, partition.cast("string")),
      header(Offset, offset.cast("string")),
      header(ApplicationCode, error.getField("code")),
      header(ApplicationMessage, error.getField("message")),
      header(TargetClass, error.getField("targetClass")),
      header(ExceptionStackTrace, error.getField("stackTrace")),
      header(ExceptionMessage, error.getField("exceptionMessage")),
      header(ExceptionClass, error.getField("exceptionClass")))
    filter(array(hs: _*), h => h.getField("value").isNotNull)
  }

  /** Merge new error headers over an existing headers column, first removing
    * any stale error headers — the reference flushes before rewriting
    * (KafkaErrorToHeaderBuilder.java:68-80) so re-processed records never
    * carry duplicate or stale diagnostics.
    */
  def mergeOnto(existing: Column, errorHeaders: Column): Column = {
    val names = all.map(lit(_))
    val kept = filter(existing, h => !h.getField("key").isInCollection(names))
    concat(kept, errorHeaders)
  }

  /** Extract one header's (last) value as a string column; null when the
    * header is absent (`element_at(arr, -1)` THROWS on an empty array —
    * `lastWithName` in the SMT returns null, HeaderTo.java:60-63). */
  def headerValue(headers: Column, name: String): Column = {
    val matches = filter(headers, h => h.getField("key") === lit(name))
    when(size(matches) > 0, element_at(matches, -1).getField("value"))
      .cast("string")
  }

  /** The `HeaderTo`-equivalent projection (HeaderTo.java:34-98): lift the 8
    * lifted headers to top-level string columns (dots → underscores,
    * HeaderTo.java:84), keeping the last occurrence of each, then drop the
    * headers column (the SMT removes consumed headers, HeaderTo.java:96).
    * Runs as a batch or streaming projection over the error topic — replaces
    * the reference's separate Kafka Connect worker with a plain Spark job.
    */
  def headersToColumns(
      df: DataFrame,
      headersCol: String = "headers",
      names: Seq[String] = liftedByHeaderTo): DataFrame = {
    val lifted = names.map { n =>
      headerValue(col(headersCol), n).as(n.replace('.', '_'))
    }
    df.select(col("*") +: lifted: _*).drop(headersCol)
  }

  /** The `HeaderTo$Key` variant (HeaderTo.java:123-151): extend a STRUCT
    * column (the record key in Connect) with the 8 header-derived fields
    * instead of the top level, then drop the consumed headers column. The
    * reference operates on the key Struct; here any struct column can be
    * the target. */
  def headersToStructColumn(
      df: DataFrame,
      structCol: String,
      headersCol: String = "headers",
      names: Seq[String] = liftedByHeaderTo): DataFrame = {
    val lifted = names.map { n =>
      headerValue(col(headersCol), n).as(n.replace('.', '_'))
    }
    df.withColumn(structCol, struct(col(s"$structCol.*") +: lifted: _*))
      .drop(headersCol)
  }
}
