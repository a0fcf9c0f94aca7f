package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators: sessionization, exact quantiles, and an as-of join.
  *
  * These are the batch forms of capabilities the streaming side gets from
  * `session_window`/watermarks; written with window functions so the only
  * shuffle is the partition-by key, and every result is integer/decimal
  * deterministic for the DuckDB oracle.
  */
object Temporal {

  /** Sessionize events per user with an inactivity gap (q19): a session
    * starts at the first event or after `gapSeconds` of silence. The
    * classic lag-flag + running-sum formulation: one shuffle on user_id,
    * two windows over it, then a hash aggregate — scales as events/user,
    * never materializes per-session state. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sec = unix_timestamp(col("ts"))
    val newSession = when(
      lag(sec, 1).over(byUser).isNull ||
        sec - lag(sec, 1).over(byUser) > gapSeconds, 1).otherwise(0)
    events
      .withColumn("session_id",
        sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(sec).as("session_start"),
        max(sec).as("session_end"))
  }

  /** Exact median of order totalprice per priority (q20). Approximate
    * percentiles (HLL-style sketches) are the 100 TB default, but their
    * values are engine-specific; this is the deterministic exact form:
    * rank with row_number, average the middle one or two values through
    * DECIMAL so the result is bit-stable. */
  def exactMedian(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val n = Window.partitionBy(col("o_orderpriority"))
    val ranked = orders
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(n))
    ranked
      .filter(col("rn") === floor((col("cnt") + 1) / 2).cast("long") ||
        col("rn") === floor((col("cnt") + 2) / 2).cast("long"))
      .groupBy(col("o_orderpriority"))
      .agg(
        (Relational.dsum(col("o_totalprice")) / count(lit(1)))
          .as("median_price"),
        first(col("cnt")).as("n_orders"))
  }

  /** Range join (q24): for each event, how many events of the same type
    * have a value in [v, v + width).
    *
    * A naive range join is a nested-loop product; the scalable form
    * bucketizes the range dimension: targets land in bucket floor(v/width),
    * each probe explodes to its own and the next bucket (an interval of
    * length `width` spans at most one boundary), the join is an equi-join
    * on (type, bucket), and the exact range predicate filters the
    * candidates. Work scales with true pair density, not n². The probe row
    * always matches itself, so `count - 1` also covers zero-neighbor events
    * without a left join back. */
  def rangeJoinCount(events: DataFrame, width: Double = 0.5): DataFrame = {
    val e = events.select(col("event_id"), col("event_type"), col("value"))
    val probes = e.withColumn("bucket",
      explode(array(floor(col("value") / width),
        floor(col("value") / width) + 1)))
    val targets = e.select(
      col("event_type").as("t_type"), col("value").as("t_value"),
      floor(col("value") / width).as("bucket"))
    probes
      .join(targets,
        col("event_type") === col("t_type") &&
          probes("bucket") === targets("bucket") &&
          col("t_value") >= col("value") &&
          col("t_value") < col("value") + width)
      .groupBy(col("event_id"))
      .agg((count(lit(1)) - 1).as("n_close"))
  }

  /** Interval-overlap join (q35): for each event's derived time interval,
    * count the OTHER same-type events whose interval overlaps it — the
    * concurrent-sessions / conflicting-bookings query. The corpus has no
    * interval columns, so both engines derive [s, s + 60 + (17·⌊value⌋ mod
    * 240)] deterministically from the row.
    *
    * Scalable shape: with interval length bounded by `width`, an interval
    * spans at most two `width`-buckets; each side explodes to its (≤2)
    * buckets and the join is an equi-join on (type, bucket). A pair could
    * then meet in TWO buckets, so the canonical-bucket predicate (`a`'s
    * bucket must be the bucket of the overlap START, max(a.s, b.s)) keeps
    * exactly one instance per pair — no distinct pass. Work scales with
    * true overlap density, never n². Self-overlap is always counted and
    * subtracted, which covers zero-neighbor events without a left join. */
  def intervalOverlapCount(events: DataFrame, width: Long = 512): DataFrame = {
    val s = unix_timestamp(col("ts"))
    val base = events.select(
      col("event_id"), col("event_type"), s.as("s"),
      (s + 60 + pmod(floor(col("value")).cast("long") * 17, lit(240)))
        .as("e"))
    val exploded = base.select(
      col("event_id"), col("event_type"), col("s"), col("e"),
      explode(array_distinct(array(
        floor(col("s") / lit(width)), floor(col("e") / lit(width)))))
        .as("bucket"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b,
        col("a.event_type") === col("b.event_type") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e") &&
          col("a.bucket") ===
            floor(greatest(col("a.s"), col("b.s")) / lit(width)))
      .groupBy(col("a.event_id").as("event_id"))
      .agg((count(lit(1)) - 1).as("n_overlaps"))
  }

  /** As-of join (q21): for each event, the most recent order of the same
    * customer with o_orderdate <= ts. Spark has no native ASOF JOIN; the
    * scalable composition is the union trick — tag both sides, union,
    * sort within the key partition by (time, side), and carry the last
    * non-null order id forward. One shuffle on the key, no range
    * explosion, no per-key loop: this survives arbitrarily skewed key
    * frequencies because it's a window, not a join product. */
  def asofJoin(events: DataFrame, orders: DataFrame): DataFrame = {
    val e = events.select(
      col("user_id").as("k"), unix_timestamp(col("ts")).as("t"),
      lit(1).as("side"), col("event_id"),
      lit(null).cast("long").as("o_orderkey"))
    val o = orders.select(
      col("o_custkey").as("k"), unix_timestamp(col("o_orderdate")).as("t"),
      lit(0).as("side"), lit(null).cast("long").as("event_id"),
      col("o_orderkey"))
    // order rows sort before event rows at equal time → <= semantics;
    // o_orderkey desc-tie-break keeps "latest order" deterministic when a
    // customer has several orders on the same timestamp (later key wins,
    // matching the oracle's ORDER BY).
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("matched_order", last(col("o_orderkey"), ignoreNulls = true)
        .over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        col("matched_order"))
  }

  /** Exact per-group discrete quantiles (q43): the order statistic at rank
    * ⌈p·n⌉ for each probability — generalizes [[exactMedian]] to arbitrary
    * quantile vectors with NO interpolation (returned values are actual
    * data points, so results are bit-identical across engines by
    * construction, tie-order-independent).
    *
    * One per-group rank window (parallel across groups) + a broadcast of
    * the tiny (group × p) target table. Groups too large for a single
    * task's sort take the [[Relational.equiDepthHistogram]] two-phase
    * rank instead — same arithmetic, split windows. */
  def groupQuantiles(events: DataFrame,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame = {
    val counts = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val targets = counts
      .select(col("event_type"), col("n"), explode(typedlit(ps)).as("p"))
      // long rank: the per-group row_number window is the real size
      // ceiling and an int cast would overflow (ANSI error) before the
      // caller ever reaches it; row_number's int joins fine against long
      .select(col("event_type"), col("p"),
        ceil(col("p") * col("n")).cast("long").as("rnk"))
    val ranked = events
      .select(col("event_type"), col("value"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("value"))))
    ranked.join(broadcast(targets), Seq("event_type", "rnk"))
      .select(col("event_type"), col("p"), col("value").as("q_value"))
  }

  /** Event-type transition matrix (q41): counts of consecutive
    * (from → to) event-type pairs per user journey — the Markov-chain
    * summary behavioral analytics reads for drop-off/loop detection.
    * One lag window partitioned by user (parallel across users — no global
    * window), then a hash aggregate on the 25-cell pair space.
    * (event_id tiebreaks equal timestamps so journeys are total-ordered
    * and the matrix is partitioning-independent.) */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"),
        lag(col("event_type"), 1).over(w).as("from_type"),
        col("event_type").as("to_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Cohort retention (q42): users grouped by first-activity date; for
    * each cohort × day-offset, how many distinct users were active again.
    * The cohort assignment is one min-aggregate on user_id; activity joins
    * back on the same key (co-partitioned, no second shuffle family); the
    * output is cohorts × offsets — tiny at any corpus scale. */
  def cohortRetention(events: DataFrame, maxDays: Int = 7): DataFrame = {
    val cohorts = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    events.select(col("user_id"), to_date(col("ts")).as("active_date"))
      .distinct()
      .join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("active_date"), col("cohort_date")))
      .filter(col("day_offset").between(0, maxDays))
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
  }
}
