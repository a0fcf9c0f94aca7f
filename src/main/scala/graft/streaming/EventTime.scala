package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarks — the streaming surface
  * the reference lacks entirely (SURVEY §2.8: no TimeWindows /
  * SessionWindows / suppress anywhere) and Structured Streaming provides
  * natively. Kept as thin, tested composition helpers so pipelines share
  * one definition of "window + watermark + late-data policy".
  *
  * Scale notes: event-time aggregation state is per (window, key) and is
  * dropped once the watermark passes the window end, so state size is
  * bounded by (active windows × keys), not by stream length; the watermark
  * also bounds how long late data can arrive, which is the knob that keeps
  * reprocessing deterministic at 100 TB/day rates.
  */
object EventTime {

  /** Tumbling event-time counts/sums per window × key — the slide ==
    * length special case of [[sliding]].
    * Batch twin: Relational.eventsPerHour (q18). */
  def tumbling(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: String): DataFrame =
    sliding(events, tsCol, keyCol, valueCol,
      windowDuration, windowDuration, watermark)

  /** Sliding event-time windows: length `windowDuration`, advancing every
    * `slideDuration` — each event enters length/slide windows via a narrow
    * pre-aggregate expansion; state is still bounded by (open windows ×
    * keys) and evicted by the watermark.
    * Batch twin: Relational.slidingEventCounts (q27). */
  def sliding(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      slideDuration: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration, slideDuration), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** Session windows with an inactivity gap per key.
    * Batch twin: Temporal.sessionize (q19). */
  def session(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"))
}
