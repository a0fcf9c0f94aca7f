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
}
