package graft.tools

import graft.core.GraftConf
import graft.errors.ErrorHeaders
import graft.streaming.GraftStream

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Deployable error-topic → warehouse job: stream the error topic, lift the
  * diagnostic headers to columns, land partitioned parquet.
  *
  * The reference ships this as a Kafka Connect SMT feeding Elasticsearch
  * (/root/reference/src/main/java/fr/barbicane/maston/connect/HeaderTo.java:88-98,
  * README.md:94-116: error topic → Connect worker → HeaderTo → ES index for
  * triage dashboards). Here the same pipeline is ONE Spark job: the
  * `kafkaSource` the library already has, the `headersToColumns` projection
  * (the HeaderTo equivalent), and a partitioned parquet lake any SQL engine
  * queries directly — no separate Connect cluster to operate.
  *
  * Layout: partitioned by `error_date` (daily pruning for "what failed
  * yesterday" triage) and `error_source_application_code` (the handful of
  * error-code values — deser failure, process failure, state-store failure —
  * so a dashboard filtering one failure class prunes everything else at the
  * scan). Both keys are low-cardinality, so file counts stay bounded at any
  * volume; the raw payload bytes ride along for replay tooling, per the
  * never-lose-a-record contract.
  *
  * Delivery: at-least-once append by default; set `conf.commitDir` and
  * replayed micro-batches are skipped whole (see DELIVERY.md's batch
  * commit log row).
  */
object ErrorTopicToLake extends Logging {

  /** The HeaderTo-equivalent projection plus the partition columns, exposed
    * separately so tests (and batch backfills over a dumped error topic)
    * run the exact transform the streaming job lands. */
  def lift(errorRecords: DataFrame): DataFrame =
    ErrorHeaders.headersToColumns(errorRecords)
      .withColumn("error_date",
        coalesce(to_date(col("timestamp")), lit(java.sql.Date.valueOf("1970-01-01"))))
      .withColumn("error_source_application_code",
        coalesce(col("error_source_application_code"), lit("UNKNOWN")))

  /** Wire the job over an already-built source (the Kafka error topic in
    * production, a MemoryStream in tests). */
  def run(source: DataFrame, conf: GraftConf, lakePath: String): StreamingQuery = {
    val sink = GraftStream.parquetLakeSink(lakePath,
      Seq("error_date", "error_source_application_code"))
    val writeBatch: DataFrame => Unit = batch => sink(lift(batch))
    val guarded: (DataFrame, Long) => Unit =
      if (conf.commitDir.nonEmpty)
        // namespaced like GraftStream.simple/delta: batchIds are only
        // unique within one query's checkpoint lineage
        GraftStream.idempotent(
          s"${conf.commitDir}/${conf.applicationId}-error-lake")(writeBatch)
      else (b, _) => writeBatch(b)
    source.writeStream
      .queryName(s"${conf.applicationId}-error-lake")
      .option("checkpointLocation", conf.checkpointLocation)
      .foreachBatch(guarded)
      .start()
  }

  /** CLI: bootstrapServers errorTopic lakePath checkpointDir [commitDir].
    * Runs until terminated; fail-fast like every pipeline entry (S3). */
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ErrorTopicToLake " +
      "<bootstrapServers> <errorTopic> <lakePath> <checkpointDir> [commitDir]")
    val Array(bootstrap, topic, lakePath, checkpoint) = args.take(4)
    val conf = GraftConf(
      applicationId = s"graft-error-lake-$topic",
      bootstrapServers = bootstrap,
      topic = topic,
      checkpointLocation = checkpoint,
      commitDir = if (args.length > 4) args(4) else "")
    val spark = SparkSession.builder()
      .appName(conf.applicationId)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.streams.addListener(GraftStream.failFastListener())
    val query = run(GraftStream.kafkaSource(spark, conf), conf, lakePath)
    GraftStream.startAndAwait(query)
  }
}
