package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Temporal.eventTransitions` (q41): per-user
  * consecutive event-type pairs extracted from an unbounded stream, with
  * the LAST event of each user carried as per-key state so journeys stitch
  * across micro-batch boundaries.
  *
  * Ordering: within a batch a user's events are sorted by (ts, event_id)
  * before the pairwise fold — same contract as [[DeltaDedup]] (a
  * micro-batch hands the whole group over at once). Across batches the
  * stored last event precedes everything in the next batch; out-of-order
  * ARRIVAL across batch boundaries is the ingest pipeline's watermark
  * problem, documented rather than buffered here.
  *
  * Scale: state is one (ts, event_id, type) triple per user — O(1) per
  * key, RocksDB-backable, TTL-bounded via `ttlMs` for unbounded user
  * spaces (an expired user's next event simply starts a fresh journey,
  * losing one boundary pair — the same at-least-once style trade
  * [[StreamDedup]] documents); the shuffle is the same groupBy(user)
  * family the batch twin uses. Downstream counting is a plain aggregation
  * on the emitted pair stream.
  */
object StreamTransitions {

  case class Event(user_id: Long, event_id: Long, event_type: String,
      ts: java.sql.Timestamp)

  case class LastEvent(tsMillis: Long, eventId: Long, eventType: String)

  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** (from → to) pair per consecutive event of each user's journey.
    * `ttlMs > 0` evicts a user's last-event state after that much
    * processing-time inactivity (DeltaDedup's TTL contract: the mode is
    * derived here so ttl + NoTimeout cannot be combined into a runtime
    * throw). */
  def pairs(spark: SparkSession, events: DataFrame,
      ttlMs: Long = -1L): Dataset[Transition] = {
    import spark.implicits._
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (user: Long, it: Iterator[Event], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val prior = state.getOption.map(l =>
              Event(user, l.eventId, l.eventType,
                new java.sql.Timestamp(l.tsMillis))).toSeq
            val chain = prior ++ ordered
            if (ordered.nonEmpty) {
              val last = ordered.last
              state.update(LastEvent(last.ts.getTime, last.event_id,
                last.event_type))
            }
            // TTL re-arms on every batch that touches the key, so an
            // active journey never expires mid-stream
            if (ttlMs > 0 && state.exists) state.setTimeoutDuration(ttlMs)
            chain.iterator.sliding(2).withPartial(false).map(w =>
              Transition(user, w(0).event_type, w(1).event_type))
          }
      }
  }
}
