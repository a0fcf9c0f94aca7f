package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("sessionize splits on the inactivity gap and counts per session") {
    val events = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(100)),        // session 1
      (1L, 12L, ts(100 + 1801)),                   // gap > 1800 → session 2
      (2L, 20L, ts(50)))                           // other user
      .toDF("user_id", "event_id", "ts")
    val out = Temporal.sessionize(events, gapSeconds = 1800)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out((1L, 1L)) == (2L, 0L, 100L))
    assert(out((1L, 2L)) == (1L, 1901L, 1901L))
    assert(out((2L, 1L)) == (1L, 50L, 50L))
  }

  test("exactMedian averages the middle pair for even counts") {
    val orders = Seq(
      ("HIGH", 10.0, 1L), ("HIGH", 20.0, 2L), ("HIGH", 30.0, 3L), ("HIGH", 40.0, 4L),
      ("LOW", 5.0, 5L), ("LOW", 7.0, 6L), ("LOW", 100.0, 7L))
      .toDF("o_orderpriority", "o_totalprice", "o_orderkey")
    val out = Temporal.exactMedian(orders).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out("HIGH") == (25.0, 4L)) // avg(20, 30)
    assert(out("LOW") == (7.0, 3L))   // middle of 3

    // the two-phase global-rank path (forced: every group > 1 row) must be
    // bit-identical to the single-window path
    val twoPhase = Temporal.exactMedian(orders, maxSingleSortRows = 1L)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(twoPhase == out)
  }

  test("asofJoin picks the latest order at or before each event") {
    val events = Seq((1L, 100L, ts(50)), (1L, 101L, ts(9)), (2L, 102L, ts(50)))
      .toDF("user_id", "event_id", "ts")
    val orders = Seq(
      (1L, 11L, ts(10)), (1L, 12L, ts(40)), (1L, 13L, ts(60)),  // after evt
      (3L, 31L, ts(0)))                                          // other key
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val out = Temporal.asofJoin(events, orders).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(100L) == 12L, "latest order at t<=50 is 12 (t=40)")
    assert(out(101L) == -1L, "no order at or before t=9")
    assert(out(102L) == -1L, "user 2 has no orders")
  }

  test("asofJoin: order exactly at event time matches (<= semantics)") {
    val events = Seq((1L, 100L, ts(10))).toDF("user_id", "event_id", "ts")
    val orders = Seq((1L, 11L, ts(10))).toDF("o_custkey", "o_orderkey", "o_orderdate")
    val out = Temporal.asofJoin(events, orders).collect()
    assert(out.head.getLong(2) == 11L)
  }

  test("asofJoinTolerance nulls matches staler than the bound") {
    val events = Seq((1L, 100L, ts(50)), (1L, 101L, ts(45)))
      .toDF("user_id", "event_id", "ts")
    val orders = Seq((1L, 11L, ts(10)), (1L, 12L, ts(44)))
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    // tolerance 10s: event@50 matches order 12 (gap 6); with tolerance 5s
    // the same candidate is too stale for event@50 but fresh for event@45
    val loose = Temporal.asofJoinTolerance(events, orders, 10L).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(loose(100L) == ((12L, 6L)))
    assert(loose(101L) == ((12L, 1L)))
    val tight = Temporal.asofJoinTolerance(events, orders, 5L).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(tight(100L) == -1L, "order 12 is 6s stale, over the 5s bound")
    assert(tight(101L) == 12L)
  }

  test("groupPercentileCont interpolates between order statistics") {
    // group a: values 10, 20, 30, 40 → h(p=.25) = 1.75 → 10 + .75·10 = 17.5;
    // h(.5) = 2.5 → 25; h(.75) = 3.25 → 32.5. group b: single value → all p
    // collapse to it (lo == hi, frac 0).
    val events = (Seq(10.0, 20.0, 30.0, 40.0).map(("a", _)) :+ (("b", 9.0)))
      .toDF("event_type", "value")
    val out = Temporal.groupPercentileCont(events)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(out == Map(
      ("a", 0.25) -> 17.5, ("a", 0.5) -> 25.0, ("a", 0.75) -> 32.5,
      ("b", 0.25) -> 9.0, ("b", 0.5) -> 9.0, ("b", 0.75) -> 9.0), out)
  }

  test("groupQuantiles returns the ceil(p*n) order statistic per group") {
    // group a: values 1..4 → p25 at rank 1, p50 at rank 2, p75 at rank 3,
    // p95 at rank ceil(3.8)=4; group b: one value serves every p
    val events = (Seq.tabulate(4)(i => ("a", (i + 1).toDouble)) :+
      (("b", 9.0))).toDF("event_type", "value")
    val out = Temporal.groupQuantiles(events)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(out == Map(
      ("a", 0.25) -> 1.0, ("a", 0.5) -> 2.0,
      ("a", 0.75) -> 3.0, ("a", 0.95) -> 4.0,
      ("b", 0.25) -> 9.0, ("b", 0.5) -> 9.0,
      ("b", 0.75) -> 9.0, ("b", 0.95) -> 9.0))
  }

  test("eventTransitions counts consecutive pairs per user journey") {
    val events = Seq(
      (1L, 1L, "view", ts(1)), (1L, 2L, "click", ts(2)),
      (1L, 3L, "view", ts(3)), (1L, 4L, "click", ts(4)),
      // user 2: equal timestamps — event_id orders the journey
      (2L, 5L, "view", ts(9)), (2L, 6L, "purchase", ts(9)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Temporal.eventTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("view", "click") -> 2L,
      ("click", "view") -> 1L,
      ("view", "purchase") -> 1L))
  }

  test("cohortRetention counts distinct users per cohort and day offset") {
    def day(d: Int, h: Int = 0) =
      Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val events = Seq(
      // user 1: cohort Jan 1, active again on day 2 (twice — counted once)
      (1L, day(1)), (1L, day(3)), (1L, day(3, 12)),
      // user 2: same cohort, only day 0
      (2L, day(1, 5)),
      // user 3: cohort Jan 2, active day 0 and day 1
      (3L, day(2)), (3L, day(3)))
      .toDF("user_id", "ts")
    val out = Temporal.cohortRetention(events).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 2) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 1) -> 1L))
  }

  test("intervalOverlapCount: bucketized join counts true overlaps once") {
    // value=0 → every interval is [s, s+60]
    val events = Seq(
      (1L, "a", ts(1000), 0.0),   // [1000,1060] overlaps 2, 3
      (2L, "a", ts(1050), 0.0),   // [1050,1110] overlaps 1, 3
      (3L, "a", ts(1060), 0.0),   // [1060,1120] touches 1 (<=), overlaps 2
      (4L, "a", ts(5000), 0.0),   // far away → 0
      (5L, "b", ts(1000), 0.0))   // other type → 0
      .toDF("event_id", "event_type", "ts", "value")
    val out = Temporal.intervalOverlapCount(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 0L, 5L -> 0L))
    // straddle a bucket boundary (width 512): the canonical-bucket rule
    // must count the pair exactly once even though both buckets match
    val straddle = Seq(
      (10L, "a", ts(500), 0.0),   // [500,560] spans buckets 0 and 1
      (11L, "a", ts(520), 0.0))   // [520,580] spans buckets 1 and 1
      .toDF("event_id", "event_type", "ts", "value")
    val s = Temporal.intervalOverlapCount(straddle).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s == Map(10L -> 1L, 11L -> 1L))
  }

  test("groupMad: exact median of absolute deviations, both parities") {
    val events = Seq(
      (1L, "A", 1.0), (2L, "A", 3.0), (3L, "A", 100.0),     // med 3, MAD 2
      (4L, "B", 1.0), (5L, "B", 2.0), (6L, "B", 3.0), (7L, "B", 4.0))
      .toDF("event_id", "event_type", "value")
    val out = Temporal.groupMad(events).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out("A") == (3.0, 2.0, 3L))
    // B: med 2.5; deviations {1.5, .5, .5, 1.5} → middle pair avg = 1.0
    assert(out("B") == (2.5, 1.0, 4L))
    // forced two-phase path must agree
    val twoPhase = Temporal.groupMad(events, maxSingleSortRows = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(twoPhase == out)
  }

  test("lastTouchAttribution credits the latest in-window click") {
    val day = 86400L
    val events = Seq(
      (1L, 10L, ts(100), "click"),
      (1L, 11L, ts(200), "click"),          // latest click before 12
      (1L, 12L, ts(300), "purchase"),       // → click 11, lag 100
      (1L, 13L, ts(200 + 8 * day), "purchase"), // window expired → organic
      (2L, 20L, ts(50), "purchase"))        // no click at all → organic
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Temporal.lastTouchAttribution(events).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out(12L) == (Some(11L), Some(100L)))
    assert(out(13L) == (None, None))
    assert(out(20L) == (None, None))
  }

  test("gapFill densifies each user's span and forward-fills silent days") {
    val day = 86400L
    val events = Seq(
      (1L, 100L, ts(0), 10.0),          // day 0
      (1L, 101L, ts(0 + 3600), 20.0),   // day 0 again → sum 30
      (1L, 102L, ts(3 * day), 7.0),     // day 3; days 1-2 are gaps
      (2L, 200L, ts(day), 5.0))         // single-day user: no gaps
      .toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.gapFill(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // user 1: 4 grid days (0..3); gaps carry day 0's filled value forward
    assert(out((1L, 0L)) == (2L, 30.0))
    assert(out((1L, 1L)) == (0L, 30.0))
    assert(out((1L, 2L)) == (0L, 30.0))
    assert(out((1L, 3L)) == (1L, 7.0))
    assert(out((2L, 1L)) == (1L, 5.0))
    assert(out.size == 5)
  }

  test("activeStreaks merges consecutive days and finds the longest run") {
    val day = 86400L
    val events = Seq(
      // user 1: active days 0,1,2 then 5,6 → streaks of 3 and 2
      (1L, 1L, ts(0)), (1L, 2L, ts(day)), (1L, 3L, ts(day + 10)),
      (1L, 4L, ts(2 * day)), (1L, 5L, ts(5 * day)), (1L, 6L, ts(6 * day)),
      // user 2: two singleton days 0 and 2, equal lengths → earliest wins
      (2L, 7L, ts(0)), (2L, 8L, ts(2 * day)))
      .toDF("user_id", "event_id", "ts")
    val out = Temporal.activeStreaks(events).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (2L, 3L, 5L, 0L))
    assert(out(2L) == (2L, 1L, 2L, 0L)) // tie on len → earliest start
  }

  test("coalesceIntervals merges by running max end, not previous row") {
    val events = Seq(
      // user 1: long interval [0,100) swallows [10,20) and [50,60); the
      // row BEFORE [50,60) ends at 20 — only a running max keeps them
      // in one island. [100,110) touches end 100 → still merges.
      (1L, 10L, ts(0), 100.9),
      (1L, 11L, ts(10), 10.0),
      (1L, 12L, ts(50), 10.0),
      (1L, 13L, ts(100), 10.0),
      // gap: [200, 205) is its own island
      (1L, 14L, ts(200), 5.0),
      // user 2: disjoint back-to-back with a 1-second gap stays split
      (2L, 20L, ts(0), 10.0), (2L, 21L, ts(11), 10.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.coalesceIntervals(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, 1L)) == (4L, 0L, 110L * 1000000L),
      s"island 1 of user 1 wrong: $out")
    assert(out((1L, 2L)) == (1L, 200L * 1000000L, 205L * 1000000L))
    assert(out((2L, 1L)) == (1L, 0L, 10L * 1000000L))
    assert(out((2L, 2L)) == (1L, 11L * 1000000L, 21L * 1000000L))
  }

  test("linearAttribution splits credit equally inside the window") {
    val events = Seq(
      (1L, 10L, ts(0), "click", 0.0),
      (1L, 11L, ts(100), "click", 0.0),
      (1L, 12L, ts(200), "purchase", 30.0),   // both clicks share
      (1L, 13L, ts(200 + 700000), "purchase", 10.0), // outside 7d window
      (2L, 20L, ts(50), "click", 0.0),
      (2L, 21L, ts(60), "purchase", 8.0))     // single touch
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Temporal.linearAttribution(events).collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(out((12L, 10L)) == (200L, 2L, 0.5, 15.0))
    assert(out((12L, 11L)) == (100L, 2L, 0.5, 15.0))
    assert(out((21L, 20L)) == (10L, 1L, 1.0, 8.0))
    assert(!out.keySet.exists(_._1 == 13L),
      "purchase outside the lookback window attributes nothing")
  }

  test("winsorize clamps to the exact order-statistic band") {
    // 20 values 1..20 in one group. IEEE doubles: 0.05·20 rounds to
    // exactly 1.0 → lo rank 1 (bound 1.0, nothing clips below);
    // 0.95·20 = 18.9999…9 → hi rank 19 (bound 19.0, only 20 clips).
    // The spec pins the double arithmetic the oracle must mirror.
    val events = (1 to 20).map(i =>
      (1L, i.toLong, ts(i.toLong), "a", i.toDouble))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Temporal.winsorize(events).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    assert(out(1L) == (1.0, 1.0, false), s"lo rank is 1, bottom passes: $out")
    assert(out(20L) == (20.0, 19.0, true), "top clips down to rank-19")
    assert(out(10L) == (10.0, 10.0, false))
    assert(out.values.count(_._3) == 1, "exactly the top extreme clips")
  }

  test("ewma: dyadic weights, partial-head renormalization, per-user") {
    val events = Seq(
      (1L, 1L, ts(1L), 10.0), (1L, 2L, ts(2L), 20.0),
      (1L, 3L, ts(3L), 40.0),
      (2L, 4L, ts(1L), 100.0)) // another user: own head, ewma = value
      .toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.ewma(events).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // head rows renormalize over present taps (exact dyadic arithmetic,
    // asserted with the identical expression order — no tolerance)
    assert(out(1L) == 10.0, s"$out")
    assert(out(2L) == (20.0 * 1.0 + 10.0 * 0.5) / (1.0 + 0.5), s"$out")
    assert(out(3L) ==
      ((40.0 * 1.0 + 20.0 * 0.5) + 10.0 * 0.25) / ((1.0 + 0.5) + 0.25),
      s"$out")
    assert(out(4L) == 100.0, s"$out")
  }

  test("rollingAnomaly flags a spike against the trailing baseline only") {
    // ten flat values then a spike; the spike's baseline is the flat run
    // (std tiny but > 0? no — identical values → std 0 → no flag). Use a
    // small alternation so σ > 0, then a 10× spike.
    val base = (1 to 10).map(i =>
      (1L, i.toLong, ts(i.toLong), if (i % 2 == 0) 10.0 else 12.0))
    val events = (base :+ ((1L, 11L, ts(11L), 110.0)))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.rollingAnomaly(events, window = 20, minHistory = 5)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(3), r.getBoolean(7))).toMap
    assert(!out.contains(1L) && !out.contains(5L),
      "rows below the history floor are not scored")
    assert(out(11L)._1 == 10L)
    assert(out(11L)._2, s"10x spike must flag: $out")
    assert(out.filterNot(_._1 == 11L).values.forall(!_._2),
      "alternating baseline rows do not flag")
  }

  test("ohlcBars: open is first-by-time, close is last, band is min/max") {
    val day0 = 0L
    val day1 = 86400L
    val events = Seq(
      (1L, 10L, ts(day0 + 10), 5.0),   // open of day 0
      (1L, 11L, ts(day0 + 20), 9.0),   // high
      (1L, 12L, ts(day0 + 30), 1.0),   // low
      (1L, 13L, ts(day0 + 40), 4.0),   // close
      (1L, 14L, ts(day1 + 5), 7.0),    // lone bar next day
      (2L, 20L, ts(day0 + 1), 2.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.ohlcBars(events).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    assert(out((1L, "1970-01-01")) == (5.0, 9.0, 1.0, 4.0, 4L), s"$out")
    assert(out((1L, "1970-01-02")) == (7.0, 7.0, 7.0, 7.0, 1L))
    assert(out((2L, "1970-01-01")) == (2.0, 2.0, 2.0, 2.0, 1L))
  }
}
