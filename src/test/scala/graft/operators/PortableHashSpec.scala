package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** The native HexFold7 expression must be bit-identical to the portable
  * Column-tree form the DuckDB oracle mirrors — over md5 output, edge
  * strings, and inside HOF lambdas. */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("native fold == column-tree reference on md5 output and edges") {
    val df = ((0 until 500).map(i => s"doc $i") ++
      Seq("", "abc", "0000000", "fffffff", "badcafe")).toDF("s")
      .select(md5(col("s").cast("binary")).as("hx"))
      .union(Seq("0123456", "deadbee").toDF("hx"))
    val rows = df.select(
      PortableHash.nibbleFold7(col("hx")).as("native"),
      PortableHash.nibbleFold7Reference(col("hx")).as("ref"))
      .collect()
    assert(rows.length == 507)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("short and null inputs yield null") {
    val out = Seq(Some("abc"), None).toDF("hx")
      .select(PortableHash.nibbleFold7(col("hx")).as("v")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("driver-JVM fold == the Column form on the same strings") {
    val inputs = (0 until 64).map(i => s"rp:3:$i") ++ Seq("", "x", "rp:0:0")
    val viaColumn = inputs.toDF("s")
      .select(col("s"), PortableHash.hash28("", col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach(s =>
      assert(PortableHash.hash28Jvm(s) == viaColumn(s), s"input '$s'"))
  }

  test("native fold works inside HOF lambdas (transform)") {
    val out = Seq(Seq("alpha", "beta")).toDF("ws")
      .select(transform(col("ws"), w =>
        PortableHash.nibbleFold7(md5(w.cast("binary")))).as("vs"),
        transform(col("ws"), w =>
          PortableHash.nibbleFold7Reference(md5(w.cast("binary")))).as("ref"))
      .head()
    assert(out.getSeq[Long](0) == out.getSeq[Long](1))
  }
}
