package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.functions._

class BottomKSketchSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k smallest distinct values; merge is order-independent") {
    val agg = BottomKSketch(3)
    val b = Seq("d", "b", "d", "a", "c").foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == "a|b|c")
    // merge of disjoint partial buffers equals the global bottom-k
    val b1 = Seq("x", "c").foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq("a", "y", "b").foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b1, b2)) == "a|b|c")
    assert(agg.finish(agg.merge(b2, b1)) == "a|b|c")
  }

  test("works as a group-by udaf with partial aggregation") {
    val sketch = udaf(BottomKSketch(2))
    val out = Seq(("g1", "m"), ("g1", "a"), ("g1", "z"), ("g1", "a"),
      ("g2", "q")).toDF("g", "v")
      .repartition(4)
      .groupBy("g").agg(sketch(col("v")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("g1") == "a|m")
    assert(out("g2") == "q")
  }
}
