package graft.plans

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.operators.VectorOps

import org.apache.spark.sql.functions._

class RewriteVectorHofSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  // range-based (non-local) input: literal Seq frames constant-fold into a
  // LocalRelation before extra optimizer rules run, leaving nothing to match
  private val df = spark.range(1).select(
    array(lit(1.0), lit(2.0), col("id").cast("double") + 3.0).as("a"),
    array(lit(4.0), lit(5.0), lit(6.0)).as("b"))

  test("HOF dot-product pattern is rewritten to the native expression") {
    val q = df.select(VectorOps.dot(col("a"), col("b")).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "optimizer should replace aggregate(zip_with(...)) with DotProduct")
    assert(q.head().getDouble(0) == 32.0)
  }

  test("cosine pattern rewrites all three inner aggregates") {
    val q = df.select(VectorOps.cosine(col("a"), col("b")).as("c"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert("graft_dot".r.findAllIn(plan).size == 3,
      "dot + both squared norms should be native")
    assert(!plan.contains("aggregate(zip_with"),
      "no interpreted HOF should remain")
  }

  test("rewrite does not fire for non-matching aggregates") {
    // max-merge instead of sum — must stay a HOF aggregate
    val q = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => greatest(acc, v)).as("m"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(q.head().getDouble(0) == 18.0)
  }

  test("rewritten plan matches HOF result on length-mismatched input") {
    val bad = spark.range(1).select(
      array(lit(1.0), col("id").cast("double")).as("a"), array(lit(1.0)).as("b"))
    assert(bad.select(VectorOps.dot(col("a"), col("b"))).head().isNullAt(0))
  }
}
