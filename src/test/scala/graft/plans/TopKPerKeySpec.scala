package graft.plans

import graft.SparkSpec
import graft.functions.GraftFunctions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val orders = Seq(
    (1L, 10L, 500.0), (1L, 11L, 300.0), (1L, 12L, 700.0), (1L, 13L, 700.0),
    (2L, 20L, 50.0), (2L, 21L, 60.0),
    (3L, 30L, 1.0))
    .toDF("cust", "ord", "price").repartition(4)

  test("heap top-k equals the window row_number formulation") {
    val viaTopK = TopK.perKey(orders, Seq(col("cust")),
      Seq(col("price").desc, col("ord")), 2)
      .select("cust", "ord").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val w = Window.partitionBy(col("cust"))
      .orderBy(col("price").desc, col("ord"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("cust", "ord").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(viaTopK == viaWindow)
    assert(viaTopK == Set((1L, 12L), (1L, 13L), (2L, 21L), (2L, 20L), (3L, 30L)))
  }

  test("physical plan uses TopKPerKeyExec with a hash exchange on the key") {
    val df = TopK.perKey(orders, Seq(col("cust")), Seq(col("price").desc), 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["))
    assert(plan.contains("hashpartitioning(cust"))
    assert(!plan.contains("Sort "), "no full sort of the key groups")
  }

  test("rows within a key come out in the requested order") {
    val rows = TopK.perKey(orders.filter(col("cust") === 1), Seq(col("cust")),
      Seq(col("price").desc, col("ord")), 3)
      .select("ord").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(12L, 13L, 10L))
  }

  test("matches window semantics on the real orders table (q7 shape)") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val viaTopK = TopK.perKey(o, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaTopK == viaWindow)
  }

  test("k <= 0 yields an empty result like row_number() <= 0") {
    assert(TopK.perKey(orders, Seq(col("cust")),
      Seq(col("price").desc), 0).count() == 0)
  }
}
