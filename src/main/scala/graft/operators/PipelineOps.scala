package graft.operators

import graft.core.GraftError
import graft.errors.ErrorHeaders
import graft.serde.SafeJson
import graft.streaming.DeltaDedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's pipeline operators exercised as oracle-checkable batch
  * queries over the `events` table: safe decode (D1/D4), error routing
  * (P1/P2), header round-trip (T2 + P5), and the stateful delta/dedup (G1).
  * Streaming twins of the same code paths live in graft.streaming and are
  * covered by ScalaTest golden specs.
  */
object PipelineOps {

  /** Safe JSON decode of the events `props` payload: the valid side surfaces
    * the parsed field, the invalid side the error code — never throws.
    * (VavrSafeDeserializer.java:29-39 semantics on a batch column.) */
  def safeJsonDecode(events: DataFrame): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    events
      .withColumn("decoded",
        SafeJson.decode(col("props"), schema, "graft.operators.Props"))
      .select(
        col("event_id"),
        col("decoded.value.k").as("k"),
        col("decoded.error.code").as("error_code"))
  }

  /** Validity branching (P1/P2): classify each record valid/invalid by a
    * business predicate and count both sides per type — the branch topology
    * (TopologyBuilder.java:36-37) as one single-pass aggregate. */
  def errorRouting(events: DataFrame): DataFrame = {
    val invalid = col("value") < lit(10.0)
    events.groupBy(col("event_type"))
      .agg(
        count(when(invalid, 1)).as("n_invalid"),
        count(when(!invalid, 1)).as("n_valid"))
  }

  /** Error headers round-trip: build the 11 diagnostic headers for synthetic
    * failures (events of type 'error'), then lift them back to columns via
    * the HeaderTo-equivalent projection. Exercises T2 build + flush-merge +
    * P5 lift in one plan. */
  def headersRoundTrip(events: DataFrame, applicationId: String): DataFrame = {
    val err = struct(
      concat(lit("Failed to process event "), col("event_id")).as("message"),
      lit(graft.core.ErrorCodes.FailedToProcessRecord).as("code"),
      lit("java.io.IOException").as("exceptionClass"),
      lit("boom").as("exceptionMessage"),
      lit(null).cast(StringType).as("stackTrace"),
      lit("graft.operators.EventRow").as("targetClass"),
      lit(null).cast(BinaryType).as("rawBytes"))
    val withHeaders = events
      .filter(col("event_type") === "error")
      .select(
        col("event_id"),
        ErrorHeaders.mergeOnto(
          array().cast("array<struct<key:string,value:binary>>"),
          ErrorHeaders.build(applicationId, err,
            topic = lit("events"),
            partition = pmod(col("event_id"), lit(4)).cast("int"),
            offset = col("event_id"),
            timestamp = col("ts"))).as("headers"))
    ErrorHeaders.headersToColumns(withHeaders)
  }

  case class EventRow(event_id: Long, user_id: Long, event_type: String,
      value: Double)

  /** Batch form of the delta/dedup pipeline (G1) on events: key = user_id,
    * order = event_id (the offset analog), predicate = event_type changed.
    * Emits the first event per user and every event whose type differs from
    * the last *emitted* one — with an (in)equality predicate this matches the
    * reference's store semantics exactly (suppressed records leave the store
    * untouched, TransformerBuilder.java:140-143).
    */
  def deltaDedup(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val ds = events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[EventRow]
    DeltaDedup.batch[EventRow, Long](ds)(
      _.user_id, _.event_id, (old, nw) => old.event_type != nw.event_type)
      .map { case (k, e) => (k, e.event_id, e.event_type) }
      .toDF("user_id", "event_id", "event_type")
  }
}
