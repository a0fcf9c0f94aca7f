package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.functions._

class BottomKSketchSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k smallest distinct values; merge is order-independent") {
    val agg = BottomKSketch(3)
    val b = Seq(40L, 20L, 40L, 10L, 30L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == "10|20|30")
    // merge of disjoint partial buffers equals the global bottom-k
    val b1 = Seq(99L, 30L).foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq(10L, 77L, 20L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b1, b2)) == "10|20|30")
    assert(agg.finish(agg.merge(b2, b1)) == "10|20|30")
  }

  test("works as a group-by udaf with partial aggregation") {
    val sketch = udaf(BottomKSketch(2))
    val out = Seq(("g1", 50L), ("g1", 1L), (("g1"), 99L), ("g1", 1L),
      ("g2", 7L)).toDF("g", "v")
      .repartition(4)
      .groupBy("g").agg(sketch(col("v")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("g1") == "1|50")
    assert(out("g2") == "7")
  }
}
