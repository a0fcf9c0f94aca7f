package graft.functions

import graft.SparkSpec
import graft.operators.PortableHash

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftinternal.Bridge

/** The native digest-fold must be bit-identical to the hex-chain form the
  * DuckDB oracle computes — `fold(md5(prefix ‖ s))` — at both widths, over
  * ascii, unicode, and empty inputs, and inside HOF lambdas (where the
  * hot paths use it). */
class Md5FoldSpec extends SparkSpec {
  import spark.implicits._

  private def native(prefix: String, v: Column, nibbles: Int): Column =
    Bridge.column(Md5Fold(Bridge.expression(v), prefix, nibbles))

  private val inputs = (0 until 400).map(i => s"shingle number $i") ++
    Seq("", " ", "a", "naïve café über 東京", "f:already prefixed",
      "a|b|c", "\t\n")

  test("width 7: native == md5+nibbleFold7 reference chain") {
    val rows = inputs.toDF("s").select(
      native("m:", col("s"), 7).as("nat"),
      PortableHash.nibbleFold7(
        md5(concat(lit("m:"), col("s")).cast("binary"))).as("ref"))
      .collect()
    assert(rows.length == inputs.length)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("width 15: native == md5+nibbleFold15Reference chain, and stays " +
    "non-negative") {
    val rows = inputs.toDF("s").select(
      native("f:", col("s"), 15).as("nat"),
      PortableHash.nibbleFold15Reference(
        md5(concat(lit("f:"), col("s")).cast("binary"))).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), r.toString)
      assert(r.getLong(0) >= 0L, r.toString)
    }
  }

  test("inside a HOF lambda over a shingle array (the hot-path shape)") {
    val df = Seq((1L, Seq("a b c", "b c d", "c d e"))).toDF("id", "sh")
    val got = df.select(
      transform(col("sh"), s => PortableHash.hash60("f:", s)).as("v"))
      .collect().head.getSeq[Long](0)
    val want = df.select(
      transform(col("sh"), s => PortableHash.nibbleFold15Reference(
        md5(concat(lit("f:"), s).cast("binary")))).as("v"))
      .collect().head.getSeq[Long](0)
    assert(got == want)
    assert(got.distinct.length == 3)
  }

  test("null input folds to null; hash28/hash60 match the JVM fold") {
    val out = Seq[Option[String]](Some("x"), None).toDF("s")
      .select(native("p:", col("s"), 7).as("v")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
    val viaCol = Seq("abc").toDF("s")
      .select(PortableHash.hash28("", col("s"))).collect().head.getLong(0)
    assert(viaCol == PortableHash.hash28Jvm("abc"))
  }
}
