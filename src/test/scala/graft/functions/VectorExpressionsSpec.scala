package graft.functions

import graft.SparkSpec
import graft.operators.VectorOps

import org.apache.spark.sql.functions._
/** The native codegen expressions must be BIT-identical to the
  * higher-order-function formulation (and therefore to the DuckDB oracle):
  * same index order, same 0.0 seed, same association. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("native dot/cosine are bit-identical to the HOF formulation") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(40)(
      (Seq.fill(16)(rnd.nextDouble() * 2e3 - 1e3),
        Seq.fill(16)(rnd.nextDouble() * 2e3 - 1e3)))
    val df = vecs.toDF("a", "b")
    df.select(
      GraftFunctions.dot(col("a"), col("b")).as("ndot"),
      VectorOps.dot(col("a"), col("b")).as("hdot"),
      GraftFunctions.cosine(col("a"), col("b")).as("ncos"),
      VectorOps.cosine(col("a"), col("b")).as("hcos"))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(3)))
      }
  }

  test("length mismatch and null inputs yield null") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    assert(df.select(GraftFunctions.dot(col("a"), col("b"))).head().isNullAt(0))
    assert(df.select(GraftFunctions.cosine(col("a"),
      lit(null).cast("array<double>"))).head().isNullAt(0))
  }

  test("null ELEMENTS yield null, exactly like the HOF form") {
    val df = Seq((Seq(Some(1.0), None, Some(3.0)), Seq(Some(2.0), Some(4.0), Some(6.0))))
      .toDF("a", "b")
    val r = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("nd"),
      VectorOps.dot(col("a"), col("b")).as("hd"),
      GraftFunctions.cosine(col("a"), col("b")).as("nc")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("expressions survive both codegen and interpreted paths") {
    val df = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("a", "b")
    val expected = 24.0
    // wholestage on (default)
    assert(df.select(GraftFunctions.dot(col("a"), col("b"))).head().getDouble(0)
      == expected)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(df.select(GraftFunctions.dot(col("a"), col("b"))).head()
        .getDouble(0) == expected)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("sql-registered names resolve via expr()") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
    assert(df.selectExpr("graft_cosine(a, b) AS c").head().getDouble(0) == 1.0)
  }
}
