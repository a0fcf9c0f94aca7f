package graft.operators

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("groupCentroids: exact per-dim means in long form, partition-stable") {
    val e = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 6.0f)),
      ("b", Array(10.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = VectorOps.groupCentroids(e)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out(("a", 0)) == (2.0, 2L))
    assert(out(("a", 1)) == (4.0, 2L))
    assert(out(("b", 0)) == (10.0, 1L))
    assert(out(("b", 1)) == (0.0, 1L))
    // same values under a different partitioning (order-independent sums)
    val again = VectorOps.groupCentroids(e.repartition(5))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(again == out)
  }
}
