package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Temporal.ewma` (q66): every arriving event carries
  * the exponentially weighted average of its user's last `taps` values
  * (weights 1, ½, ¼, … — most recent heaviest), with the tap window held
  * as per-key state so the smoother stitches across micro-batch
  * boundaries — the live form of the recency-biased activity/quality
  * gauge.
  *
  * Exact batch parity (the q66 contract, stronger than the grid
  * family's): α = ½ makes every weight an exact power of two, and
  * multiplying any double by 2⁻ⁱ is EXACT in IEEE, so with the term
  * order pinned left-to-right (ascending tap index — the batch side's
  * `reduce(_ + _)` shape) the only rounding sites are the final add
  * chain and one division, identical on both sides. Partial heads
  * renormalize over the PRESENT taps, so a user's first row is its own
  * value. Pinned equal to the batch operator by StreamEwmaSpec.
  *
  * Scale: state is at most `taps − 1` doubles per user (tens of bytes),
  * RocksDB-backable, TTL-bounded via `ttlMs` for unbounded key spaces
  * (an expired user restarts with an empty window — the
  * [[StreamTransitions]] trade). In-batch ordering follows the
  * [[DeltaDedup]] contract: sort by (ts, event_id) inside the group.
  */
object StreamEwma {

  case class Point(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)

  case class Smoothed(user_id: Long, event_id: Long, value: Double,
      ewma: Double)

  /** Trailing values per key, MOST RECENT FIRST, capped at taps − 1. */
  case class Taps(values: Seq[Double])

  def scores(spark: SparkSession, events: DataFrame, taps: Int = 4,
      ttlMs: Long = -1L): Dataset[Smoothed] = {
    import spark.implicits._
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (user: Long, it: Iterator[Point], state: GroupState[Taps]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = it.toSeq.sortBy(p => (p.ts.getTime, p.event_id))
            var prev = state.getOption.map(_.values.toVector)
              .getOrElse(Vector.empty[Double])
            val out = Vector.newBuilder[Smoothed]
            for (p <- ordered) {
              // tap i: this row for i = 0, the i-th previous value
              // otherwise; absent taps contribute 0.0 to both sums —
              // the exact expression shape of the batch window form
              var num = 0.0
              var den = 0.0
              var i = 0
              while (i < taps) {
                val v: Option[Double] =
                  if (i == 0) Some(p.value) else prev.lift(i - 1)
                val w = math.pow(0.5, i)
                num += v.fold(0.0)(_ * w)
                den += v.fold(0.0)(_ => w)
                i += 1
              }
              out += Smoothed(user, p.event_id, p.value, num / den)
              prev = (p.value +: prev).take(taps - 1)
            }
            state.update(Taps(prev))
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.result().iterator
          }
      }
  }
}
