package graft.streaming

import org.apache.spark.sql.{Dataset, functions => F}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Error count/rate metrics — M1.
  *
  * The reference registers two sensors in group `maston-kafka-streams`, each
  * with a cumulative count and a rate
  * (/root/reference/src/main/java/fr/barbicane/maston/metrics/MetricsBuilder.java:15-61):
  * `error-from-maston-kafka-streams` (deserialization errors) and
  * `error-from-record-processed-by-application` (business errors).
  *
  * Spark-native form: `Dataset.observe` accumulates the counters inside the
  * existing plan (no extra pass, no shuffle); a StreamingQueryListener reads
  * them per micro-batch from `progress.observedMetrics` — rates fall out of
  * count/batchDuration. The listener can republish to any metrics system;
  * here it logs, which is where a Dropwizard/JMX bridge would attach (the
  * reference enables JmxReporter, KafkaPropertiesBuilder.java:75).
  */
object Metrics {
  val Group = "graft-metrics"
  val DeserErrors = "error-from-deserialization"
  val ProcessErrors = "error-from-record-processed-by-application"

  /** Attach observed error counters to an envelope Dataset (column layout:
    * `error.code`). */
  def observeErrors[T](ds: Dataset[T]): Dataset[T] =
    ds.observe(Group,
      F.count(F.when(F.col("error").getField("code") ===
        graft.core.ErrorCodes.FailedToDeserializeRecord, 1)).as(DeserErrors),
      F.count(F.when(F.col("error").isNotNull &&
        F.col("error").getField("code") =!=
          graft.core.ErrorCodes.FailedToDeserializeRecord, 1)).as(ProcessErrors))

  /** Listener publishing the observed counters once per micro-batch. */
  def listener(publish: (String, Long) => Unit): StreamingQueryListener =
    new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics
        if (m.containsKey(Group)) {
          val row = m.get(Group)
          publish(DeserErrors, row.getAs[Long](DeserErrors))
          publish(ProcessErrors, row.getAs[Long](ProcessErrors))
        }
      }
    }
}
