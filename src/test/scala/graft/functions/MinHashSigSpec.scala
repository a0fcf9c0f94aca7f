package graft.functions

import graft.SparkSpec
import graft.operators.Dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftinternal.Bridge

/** The native one-pass signature must be bit-identical to the HOF
  * formulation the DuckDB oracle mirrors. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private def hofSig = transform(sequence(lit(0), lit(Dedup.MinHashK - 1)), k =>
    array_min(transform(col("bases"), b =>
      pmod(element_at(typedlit(Dedup.HashA), (k + 1).cast("int")) * b +
        element_at(typedlit(Dedup.HashB), (k + 1).cast("int")),
        lit(Dedup.HashP)))))

  private def nativeSig = Bridge.column(
    MinHashSig(Bridge.expression(col("bases")),
      Dedup.HashA, Dedup.HashB, Dedup.HashP))

  test("native signature == HOF signature on random base arrays") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(40) + 1)(rnd.nextLong().abs % (1L << 28)))
    val out = rows.toDF("bases")
      .select(nativeSig.as("n"), hofSig.as("h")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("interpreted eval matches codegen and handles null elements") {
    val df = Seq(Seq[java.lang.Long](5L, null, 131071L)).toDF("bases")
    val viaExpr = df.select(nativeSig.as("n")).head().getSeq[Long](0)
    // null elements skipped like array_min; 12 mins over {5, 131071}
    val expect = Dedup.HashA.zip(Dedup.HashB).map { case (a, b) =>
      Seq(5L, 131071L).map(x => (a * x + b) % Dedup.HashP).min
    }
    assert(viaExpr == expect)
  }
}
