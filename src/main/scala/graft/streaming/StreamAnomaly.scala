package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Temporal.rollingAnomaly` (q63): every arriving
  * event scored against its user's trailing-window baseline, with the
  * window carried as per-key state so baselines stitch across micro-batch
  * boundaries — the live form of the per-entity drift detector.
  *
  * Exact batch parity: the batch operator accumulates Σv and Σv² as
  * DECIMAL(18,6)/(36,12); this twin redoes the identical arithmetic with
  * JVM BigDecimal (the cast rounds HALF_UP exactly like Spark's
  * double→decimal cast, products/sums are exact) and the same fixed-order
  * double mean/var/z tail — pinned equal by StreamAnomalySpec.
  *
  * Scale: state is ≤ `window` doubles per user (a few hundred bytes),
  * RocksDB-backable, TTL-bounded via `ttlMs` for unbounded key spaces
  * (an expired user restarts with an empty baseline — the
  * [[StreamTransitions]] trade). In-batch ordering follows the
  * [[DeltaDedup]] contract: sort by (ts, event_id) inside the group.
  */
object StreamAnomaly {

  case class Point(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)

  case class Score(user_id: Long, event_id: Long, value: Double,
      n_prev: Long, mean_prev: Double, std_prev: Double,
      z: Option[Double], anomaly: Boolean)

  /** Trailing values per key, oldest first, capped at the window size. */
  case class Baseline(values: Seq[Double])

  def scores(spark: SparkSession, events: DataFrame, window: Int = 20,
      zBar: Double = 3.0, minHistory: Int = 5,
      ttlMs: Long = -1L): Dataset[Score] = {
    import spark.implicits._
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (user: Long, it: Iterator[Point], state: GroupState[Baseline]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = it.toSeq.sortBy(p => (p.ts.getTime, p.event_id))
            var buf = state.getOption.map(_.values.toVector)
              .getOrElse(Vector.empty[Double])
            val out = Vector.newBuilder[Score]
            for (p <- ordered) {
              val n = buf.length
              if (n >= minHistory) {
                // the batch twin's decimal grid, re-derived exactly
                val v6 = buf.map(v => BigDecimal(v)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP))
                val s1 = v6.sum
                val s2 = v6.map(d => d * d).sum
                val mean = s1.toDouble / n
                val ex2 = s2.toDouble / n
                val std = math.sqrt(math.max(ex2 - mean * mean, 0.0))
                val z = if (std > 0) Some((p.value - mean) / std) else None
                out += Score(user, p.event_id, p.value, n.toLong, mean, std,
                  z, std > 0 && math.abs((p.value - mean) / std) > zBar)
              }
              buf = (buf :+ p.value).takeRight(window)
            }
            state.update(Baseline(buf))
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.result().iterator
          }
      }
  }
}
