package graft.operators

import graft.SparkSpec

import java.sql.Timestamp

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("windowNavigation: lag/lead/ntile/first share one window") {
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val orders = Seq(
      (1L, 10L, ts(1), 100.0),
      (1L, 11L, ts(2), 200.0),
      (1L, 12L, ts(3), 300.0),
      (1L, 13L, ts(4), 400.0),
      (2L, 20L, ts(5), 50.0))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val out = Relational.windowNavigation(orders).collect()
      .map(r => r.getLong(r.fieldIndex("o_orderkey")) ->
        (Option(r.get(r.fieldIndex("prev_price"))),
          Option(r.get(r.fieldIndex("next_price"))),
          r.getInt(r.fieldIndex("quartile")),
          r.getDouble(r.fieldIndex("first_price")))).toMap
    assert(out(10L) == ((None, Some(200.0), 1, 100.0)))
    assert(out(11L) == ((Some(100.0), Some(300.0), 2, 100.0)))
    assert(out(12L) == ((Some(200.0), Some(400.0), 3, 100.0)))
    assert(out(13L) == ((Some(300.0), None, 4, 100.0)))
    // the second customer is its own partition
    assert(out(20L) == ((None, None, 1, 50.0)))
    // all four functions fold into ONE Window operator → one exchange
    val plan = Relational.windowNavigation(orders)
      .queryExecution.executedPlan.toString
    assert("(?s)Window".r.findAllIn(plan).size == 1,
      s"expected a single Window node:\n$plan")
  }

  test("latestPerKey compacts a changelog to the newest row per key") {
    val ts = (s: Int) => Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val events = Seq(
      (1L, 100L, "create", 1.0, ts(1)),
      (1L, 101L, "update", 2.0, ts(2)),
      (1L, 102L, "update", 3.0, ts(3)),
      // same timestamp as 102 → higher event_id wins
      (1L, 103L, "delete", 4.0, ts(3)),
      (2L, 200L, "create", 9.0, ts(1)))
      .toDF("user_id", "event_id", "event_type", "value", "ts")
    graft.functions.GraftFunctions.register(spark)
    val out = Relational.latestPerKey(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        r.getDouble(3))).toMap
    assert(out(1L) == ((103L, "delete", 4.0)))
    assert(out(2L) == ((200L, "create", 9.0)))
    assert(out.size == 2)
  }
}
