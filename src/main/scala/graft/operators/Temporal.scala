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
    * values are engine-specific; this is the deterministic exact form,
    * averaging the middle one or two order statistics through DECIMAL so
    * the result is bit-stable.
    *
    * Scale-adaptive rank plan: a plain `Window.partitionBy(priority)`
    * sorts each group in ONE task — 5 tasks total at any scale, the
    * classic low-cardinality window trap. The rows are range-partitioned
    * on (priority, price, key) and the per-cell (partition × group) count
    * table is collected (bounded driver state, same contract as
    * [[Relational.equiDepthHistogram]]); with group sizes in hand the
    * driver picks the plan:
    *   - every group ≤ `maxSingleSortRows`: one rank window per group —
    *     fewest stages, each sort task bounded;
    *   - any group larger: two-phase global rank — offsets from the cell
    *     table, rank windows per (partition, group), parallelism
    *     `partitions × groups`.
    * Both paths are exact and bit-identical (same middle-statistics
    * average through DECIMAL). */
  def exactMedian(orders: DataFrame, partitions: Int = 32,
      maxSingleSortRows: Long = 1L << 21): DataFrame =
    groupMedian(orders, "o_orderpriority", "o_totalprice", "o_orderkey",
      partitions, maxSingleSortRows)
      .select(col("grp").as("o_orderpriority"),
        col("median").as("median_price"), col("n_rows").as("n_orders"))

  /** The generic engine under [[exactMedian]] (q20) and [[groupMad]]
    * (q57): exact per-group median of `valCol` with `keyCol` as the
    * deterministic tiebreak, output `(grp, median, n_rows)`. The group
    * column must be string-typed (the plan-decision map keys on it).
    * Scale-adaptive exactly as documented on q20: per-group counts pick
    * either a single rank window per group or the range-partitioned
    * global-rank path with per-cell offsets. */
  def groupMedian(df: DataFrame, grpCol: String, valCol: String,
      keyCol: String, partitions: Int = 32,
      maxSingleSortRows: Long = 1L << 21): DataFrame = {
    val base = df.select(col(grpCol).as("grp"), col(valCol).as("v"),
      col(keyCol).as("k"))
    val spark = base.sparkSession
    // one narrow partial-aggregated count per group (bounded driver state:
    // one row per group) decides the plan and fixes the target ranks
    val groupN = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // target ranks: middle one (odd n) or two (even n) per group
    val targets = groupN.toSeq.sortBy(_._1).flatMap { case (g, n) =>
      Seq((n + 1) / 2, (n + 2) / 2).distinct.map(k => (g, k, n))
    }
    val tgtDf = broadcast(
      spark.createDataFrame(targets).toDF("grp", "grnk", "n"))
    def medianOfRanked(ranked: DataFrame): DataFrame = ranked
      .join(tgtDf, Seq("grp", "grnk"))
      .groupBy(col("grp"))
      .agg(
        (Relational.dsum(col("v")) / count(lit(1))).as("median"),
        first(col("n")).as("n_rows"))
    if (groupN.values.forall(_ <= maxSingleSortRows)) {
      // every group fits one task's sort: single rank window, no extra
      // shuffle or persist
      val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("k"))
      medianOfRanked(
        base.withColumn("grnk", row_number().over(w).cast("long")))
    } else {
      // two-phase global rank: range-partition, per-cell counts give each
      // (partition, group) its global-rank offset, rank windows run per
      // (partition, group) — parallelism partitions × groups
      val sortKeys = Seq(col("grp"), col("v"), col("k"))
      val parted = base.repartitionByRange(partitions, sortKeys: _*)
        .withColumn("pid", spark_partition_id())
      Caching.withPersisted(parted) {
        val cells = parted
          .groupBy(col("pid"), col("grp"))
          .agg(count(lit(1)).as("cn"))
          .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
          .toMap
        val offsets = for {
          g <- groupN.keys.toSeq.sorted; p <- 0 until partitions
        } yield {
          val off = (0 until p).map(q => cells.getOrElse((q, g), 0L)).sum
          (p, g, off)
        }
        val offDf = broadcast(spark.createDataFrame(offsets)
          .toDF("pid", "grp", "off"))
        val w = Window.partitionBy(col("pid"), col("grp"))
          .orderBy(col("v"), col("k"))
        medianOfRanked(parted
          .join(offDf, Seq("pid", "grp"))
          .withColumn("grnk", col("off") + row_number().over(w)))
      }
    }
  }

  /** Median absolute deviation (q57): per event type, the exact median of
    * |value − median(value)| — the robust dispersion estimate outlier
    * gates prefer over stddev (one corrupt feed day moves a stddev for a
    * month; the MAD barely notices). Two [[groupMedian]] passes: the
    * 5-row median table broadcasts back over the events for the
    * deviation projection, so the second pass costs the same as the
    * first and both inherit the scale-adaptive rank plan. Deviations are
    * double subtractions of decimal-exact medians — deterministic per
    * row, so the second rank order (dev, event_id) is engine-stable. */
  def groupMad(events: DataFrame, partitions: Int = 32,
      maxSingleSortRows: Long = 1L << 21): DataFrame = {
    val med = groupMedian(events, "event_type", "value", "event_id",
        partitions, maxSingleSortRows)
      .select(col("grp").as("event_type"), col("median").as("med"),
        col("n_rows"))
    val dev = events.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("dev"),
        col("event_id"))
    groupMedian(dev, "event_type", "dev", "event_id",
        partitions, maxSingleSortRows)
      .select(col("grp").as("event_type"), col("median").as("mad"))
      .join(broadcast(med), "event_type")
      .select(col("event_type"), col("med").as("median_value"),
        col("mad"), col("n_rows"))
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

  /** Interval coalescing / union per key (q59): merge every overlapping or
    * touching interval [ts, ts + ⌊value⌋ seconds) per user into maximal
    * covered spans — the interval-union primitive behind "total engaged
    * time", span-cut planning over [[graft.operators.LlmText.removableSpans]]
    * output, and coverage accounting. VARIABLE-length intervals make this
    * strictly harder than [[sessionize]]'s fixed-gap islands: an early long
    * interval can swallow many later short ones, so the island flag must
    * compare each start against the RUNNING MAX of all previous ends (not
    * just the previous row's), the classic gaps-and-islands running-max
    * formulation.
    *
    * Scale shape: one shuffle on user_id, two frame-bounded windows over
    * it, one hash aggregate — O(events/user) per task with no join and no
    * per-interval state. Arithmetic is entirely on epoch-microsecond longs
    * (`unix_micros`), so the oracle (DuckDB `epoch_us`) matches exactly
    * with no timestamp-format hazard. Touching intervals (next start ==
    * running max end) merge, matching the half-open [start, end) reading. */
  def coalesceIntervals(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("start_us"), col("end_us"), col("event_id"))
    val iv = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("start_us"),
      (unix_micros(col("ts")) +
        floor(col("value")).cast("long") * lit(1000000L)).as("end_us"))
    val prevMax = max(col("end_us"))
      .over(byUser.rowsBetween(Window.unboundedPreceding, -1))
    iv
      .withColumn("is_new",
        when(prevMax.isNull || col("start_us") > prevMax, 1).otherwise(0))
      .withColumn("island",
        sum(col("is_new")).over(byUser.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("n_events"),
        min(col("start_us")).as("span_start_us"),
        max(col("end_us")).as("span_end_us"))
  }

  /** OHLC bars (q60): per (user, day) open/high/low/close of `value` —
    * the downsampling summary every time-series store exposes (candlestick
    * aggregation), built as one window + one aggregate: rank events within
    * the (user, day) partition by (ts, event_id), then take the rank-1
    * value as open, the rank-n value as close, and plain min/max for the
    * band. One shuffle on (user_id, day); conditional aggregation instead
    * of a second first/last window pass. */
  def ohlcBars(events: DataFrame): DataFrame = {
    val keyed = events.withColumn("day", to_date(col("ts")))
    val byBar = Window.partitionBy(col("user_id"), col("day"))
    val ordered = byBar.orderBy(col("ts"), col("event_id"))
    keyed
      .withColumn("rn", row_number().over(ordered))
      .withColumn("cnt", count(lit(1)).over(byBar))
      .groupBy(col("user_id"), col("day"))
      .agg(
        max(when(col("rn") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn") === col("cnt"), col("value"))).as("close"),
        count(lit(1)).as("n_events"))
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

  /** Tolerance-bounded as-of join (q45): [[asofJoin]] with a staleness
    * bound — the match is kept only when the event is within
    * `toleranceSec` of the matched order (pandas `merge_asof(tolerance=…)`
    * semantics, the feature-store rule "a feature older than N days is no
    * feature"). Same union+window shape, additionally carrying the matched
    * row's OWN timestamp forward (both `last(_, ignoreNulls)` calls read
    * the same order row, so the pair is consistent); the bound is then a
    * pure per-row filter on the gap. One shuffle on the key, no range
    * explosion, skew-proof for the same reason as q21. */
  def asofJoinTolerance(events: DataFrame, orders: DataFrame,
      toleranceSec: Long = 30L * 24 * 3600): DataFrame = {
    val e = events.select(
      col("user_id").as("k"), unix_timestamp(col("ts")).as("t"),
      lit(1).as("side"), col("event_id"),
      lit(null).cast("long").as("o_orderkey"))
    val o = orders.select(
      col("o_custkey").as("k"), unix_timestamp(col("o_orderdate")).as("t"),
      lit(0).as("side"), lit(null).cast("long").as("event_id"),
      col("o_orderkey"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("cand_order",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("cand_t",
        last(when(col("side") === 0, col("t")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        when(col("t") - col("cand_t") <= toleranceSec, col("cand_order"))
          .as("matched_order"),
        when(col("t") - col("cand_t") <= toleranceSec,
          col("t") - col("cand_t")).as("gap_sec"))
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

  /** Per-group winsorization (q62): clamp every value into its group's
    * [⌈lo·n⌉-th, ⌈hi·n⌉-th] order-statistic band — the outlier-clipping
    * step a curation pipeline runs before any mean-sensitive statistic
    * (clip absurd doc lengths / quality scores instead of dropping the
    * rows; [[graft.operators.Relational.trimmedMean]] is the drop-based
    * sibling). Bounds come from the same exact rank machinery as
    * [[groupQuantiles]]; the clamp itself is a broadcast join + two
    * comparisons per row, so the operator stays one rank window + one
    * scan at any scale. */
  def winsorize(events: DataFrame,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val q = groupQuantiles(events, Seq(lo, hi))
    val bounds = q.groupBy(col("event_type")).agg(
      min(when(col("p") === lo, col("q_value"))).as("lo_v"),
      min(when(col("p") === hi, col("q_value"))).as("hi_v"))
    events.select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(bounds), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        greatest(least(col("value"), col("hi_v")), col("lo_v"))
          .as("value_winsorized"),
        (col("value") < col("lo_v") || col("value") > col("hi_v"))
          .as("clipped"))
  }

  /** Rolling z-score anomaly detection (q63): each event scored against
    * the mean/σ of its user's PREVIOUS `window` events (frame [-window,
    * -1] — the current value never contaminates its own baseline). The
    * per-entity drift detector for metrics pipelines: |z| > zBar with a
    * minimum history floor flags the row. One (user, time) sort window;
    * running Σv and Σv² accumulate as DECIMAL (exact, order-independent)
    * and convert to doubles only in the final fixed-order mean/var/z
    * expressions, so the flag is bit-stable across engines and
    * partitionings.
    *
    * Numeric note: var = E[v²] − mean² is the cancellation-PRONE form in
    * floating point, but here both Σ terms are EXACT decimals of
    * 6/12-decimal inputs — the subtraction is the only rounding site and
    * it is the same one IEEE op on both engines; `greatest(…, 0)` guards
    * the σ=0 tail. */
  def rollingAnomaly(events: DataFrame, window: Int = 20,
      zBar: Double = 3.0, minHistory: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-window, -1)
    val vDec = col("value").cast(DecimalType(18, 6))
    val scored = events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("s1", sum(vDec).over(w))
      .withColumn("s2", sum(vDec * vDec).over(w))
    val mean = col("s1").cast("double") / col("n_prev")
    val ex2 = col("s2").cast("double") / col("n_prev")
    val variance = greatest(ex2 - mean * mean, lit(0.0))
    val std = sqrt(variance)
    scored
      .filter(col("n_prev") >= minHistory)
      .select(col("user_id"), col("event_id"), col("value"),
        col("n_prev"), mean.as("mean_prev"), std.as("std_prev"),
        when(std > 0, (col("value") - mean) / std).as("z"),
        (std > 0 && abs((col("value") - mean) / std) > zBar)
          .as("anomaly"))
  }

  /** Interpolated per-group percentiles (q47): SQL-standard
    * PERCENTILE_CONT semantics — h = (n−1)·p + 1, result =
    * v_⌊h⌋ + (h−⌊h⌋)·(v_⌈h⌉ − v_⌊h⌋) — computed with EXPLICIT arithmetic
    * on the two order statistics instead of the built-in (Spark's
    * `percentile` and DuckDB's `quantile_cont` associate the lerp
    * differently, so only the spelled-out formula is bit-stable across
    * engines). Same shape as q43: one per-group rank window + a broadcast
    * (group × p) target table; the lo/hi rows come back from a single
    * disjunctive join and fold in one aggregate. */
  def groupPercentileCont(events: DataFrame,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val counts = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val targets = counts
      .select(col("event_type"), col("n"), explode(typedlit(ps)).as("p"))
      .withColumn("h", (col("n") - 1).cast("double") * col("p") + lit(1.0))
      .withColumn("lo", floor(col("h")).cast("long"))
      .withColumn("hi", ceil(col("h")).cast("long"))
      .withColumn("frac", col("h") - floor(col("h")))
      .drop("n", "h")
    val ranked = events
      .select(col("event_type"), col("value"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("value"))))
    ranked.join(broadcast(targets), Seq("event_type"))
      .filter(col("rnk") === col("lo") || col("rnk") === col("hi"))
      .groupBy(col("event_type"), col("p"), col("frac"))
      .agg(min(when(col("rnk") === col("lo"), col("value"))).as("v_lo"),
        min(when(col("rnk") === col("hi"), col("value"))).as("v_hi"))
      .select(col("event_type"), col("p"),
        (col("v_lo") + col("frac") * (col("v_hi") - col("v_lo")))
          .as("pval"))
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

  /** Last-touch attribution (q55): each purchase is credited to the same
    * user's most recent click within the attribution window — the
    * marketing-analytics join that burns warehouses when written as a
    * correlated subquery per purchase. Here it is the q21/q45 union
    * trick WITHIN one event stream: clicks and purchases tag sides,
    * one window per user carries the latest click forward, the window
    * bound is a per-row filter. One shuffle on user_id, no join at all,
    * skew-immune (a user with a million events is still one ordered
    * partition pass). Unattributed purchases keep a NULL click — they
    * are the organic-conversion rows the report needs, not drops. */
  def lastTouchAttribution(events: DataFrame,
      windowSec: Long = 7L * 86400): DataFrame = {
    val base = events.select(col("user_id"),
      unix_timestamp(col("ts")).as("t"), col("event_id"),
      col("event_type"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("t"), lit(0).as("side"),
        lit(null).cast("long").as("purchase_id"),
        col("event_id").as("click_id"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t"), lit(1).as("side"),
        col("event_id").as("purchase_id"),
        lit(null).cast("long").as("click_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("side"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("cand_click",
        last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("cand_t",
        last(when(col("side") === 0, col("t")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("user_id"),
        when(col("t") - col("cand_t") <= windowSec, col("cand_click"))
          .as("attributed_click"),
        when(col("t") - col("cand_t") <= windowSec,
          col("t") - col("cand_t")).as("lag_sec"))
  }

  /** Linear multi-touch attribution (q61): every click within the
    * lookback window of a same-user purchase shares the credit equally —
    * the fractional complement of [[lastTouchAttribution]] (q55 awards the
    * final click everything; this splits 1/n and value/n across all n
    * touches, the other standard marketing-attribution policy). One row
    * per (purchase, contributing click) with its lag, touch count, and
    * both unit and value-weighted credit.
    *
    * Scale shape: unlike last-touch, the OUTPUT is the (purchase, click)
    * pair list, so a per-user join is inherent, not overhead — the join is
    * user_id-partitioned with the window predicate applied in the join
    * condition (pairs outside the window never materialize), and the
    * credit split is one count window over the pairs keyed by purchase.
    * Cost is O(output) plus one shuffle family on user_id. */
  def linearAttribution(events: DataFrame,
      windowSec: Long = 7L * 86400): DataFrame = {
    val base = events.select(col("user_id"),
      unix_timestamp(col("ts")).as("t"), col("event_id"),
      col("event_type"), col("value"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("t").as("ct"),
        col("event_id").as("click_id"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t").as("pt"),
        col("event_id").as("purchase_id"), col("value"))
    val byPurchase = Window.partitionBy(col("purchase_id"))
    purchases.join(clicks, Seq("user_id"))
      .filter(col("ct") <= col("pt") &&
        col("pt") - col("ct") <= windowSec)
      .withColumn("n_touches", count(lit(1)).over(byPurchase))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (col("pt") - col("ct")).as("lag_sec"), col("n_touches"),
        (lit(1.0) / col("n_touches")).as("credit"),
        (col("value") / col("n_touches")).as("value_credit"))
  }

  /** Time-series gap filling with forward fill (q48): one row per user per
    * calendar day between that user's first and last event, with the days
    * the user was silent carried forward from the last active day — the
    * canonical densify step before any per-entity daily model (LTV curves,
    * rolling features, churn labels).
    *
    * Scalable shape: the day grid is generated PER KEY with
    * `sequence(min_day, max_day)` + `explode` — distributed, never a
    * driver-side calendar, and sized by each user's own span instead of
    * the global one (a user active for a week costs 7 rows even if the
    * corpus spans years). One shuffle family on user_id: the daily
    * pre-aggregate, the span aggregate, the grid join, and the
    * forward-fill window all partition by the same key, so AQE coalesces
    * them without a second exchange of the fact table. Forward fill is
    * `last(value, ignoreNulls)` over an unbounded-preceding frame — a
    * running lookup, not a self-join. */
  def gapFill(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        Relational.dsum(col("value")).as("day_value"))
    val grid = daily
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(daily, Seq("user_id", "day"), "left")
      .select(
        col("user_id"),
        datediff(col("day"), lit("1970-01-01").cast("date"))
          .cast("long").as("day_num"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_value"), ignoreNulls = true).over(w)
          .as("filled_value"))
  }

  /** Consecutive-active-day streaks (q51) — the gaps-and-islands pattern
    * on a discrete grid. Sessionize (q19) merges by a time-gap threshold;
    * this merges by grid adjacency with the rank-difference idiom:
    * `day_num - row_number()` is constant exactly across a run of
    * consecutive days, so one window + one aggregate finds every island
    * with no self-join. Per user: streak count, longest streak, total
    * active days, and the longest streak's start day (deterministic
    * tiebreak: earliest).
    *
    * Scale: the window partitions by user_id (parallel across users) over
    * the DISTINCT (user, day) frame — bounded by span days per user, not
    * event count; everything downstream is hash aggregation. */
  def activeStreaks(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_num"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
    val streaks = daily
      .withColumn("grp", col("day_num") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(
        count(lit(1)).as("len"),
        min(col("day_num")).as("streak_start"))
    streaks
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        sum(col("len")).as("active_days"),
        min(struct(col("len") * -1, col("streak_start")))
          .getField("streak_start").as("longest_start"))
  }

  /** Exponentially weighted moving average (q66): per user, the last
    * `taps` values blended with weights 1, ½, ¼, … — the recency-biased
    * smoother for activity levels, quality trends, and rate estimates
    * (the one-line alternative to q63's mean/σ window when "recent
    * matters more" is the point). Partial heads renormalize over the
    * PRESENT taps, so row 1's ewma is its own value, not a damped one.
    *
    * Parity contract, stronger than the grid family's: α = ½ makes
    * every weight an exact power of two, and multiplying/dividing any
    * double by 2ᵏ is EXACT in IEEE — so with the term order pinned
    * left-to-right there is no rounding site at all beyond the two
    * final IEEE ops, and both engines agree bit-for-bit with no decimal
    * grid anywhere. One per-user window (hash-partitioned, never
    * global), `taps` LAG reads per row. */
  def ewma(events: DataFrame, taps: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    def v(i: Int) =
      if (i == 0) col("value") else lag(col("value"), i).over(w)
    def wt(i: Int) = lit(math.pow(0.5, i))
    val num = (0 until taps)
      .map(i => when(v(i).isNotNull, v(i) * wt(i)).otherwise(lit(0.0)))
      .reduce(_ + _)
    val den = (0 until taps)
      .map(i => when(v(i).isNotNull, wt(i)).otherwise(lit(0.0)))
      .reduce(_ + _)
    events.select(col("event_id"), col("user_id"), col("value"),
      (num / den).as("ewma"))
  }
}
