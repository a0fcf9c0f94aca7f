package graft.tools

import graft.operators.{Caching, Dedup, PortableHash, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase accounting INSIDE the prefix-filter pairs kernel (d26 == d28's
  * pairs stage) under the ScaleSmoke epoch-expansion regime — the
  * measurement that names which internal phase carries the 10× wall
  * ratio (the op-level stress rows say 3.2–3.7× while candidates grow
  * exactly 10×, so the growth is one of the internal shuffles, not the
  * candidate tail). Phases, each materialized with a count barrier:
  *
  *   shingle   docShingles (persist bracket) — per-doc arrays
  *   tokenize  explode + per-token digest fold
  *   freq      groupBy(h) corpus frequency table
  *   rank      freq join + per-doc rarity window + prefix cut + cap
  *   join      the prefix self-join (+ size/positional bounds) +
  *             distinct — the candidate generator proper
  *   verify    shingle-array gather + exact Jaccard
  *
  * Usage: `sbt "runMain graft.tools.PrefixProfile [sfDir] [factor]"`.
  * Prints one [profile] line per (leg, phase) and a JSON summary line.
  * Not part of the driver contract — a measurement main like ScaleSmoke.
  */
object PrefixProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, factor)
    finally spark.stop()
  }

  private def epoch(base: DataFrame, e: Int): DataFrame =
    base.select(
      (col("doc_id") + lit(e.toLong * 10_000_000L)).as("doc_id"),
      regexp_replace(col("text"), "\\S+", s"$$0z$e").as("text"))

  private[tools] def run(spark: SparkSession, sfDir: String,
      factor: Int): Unit = {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val one = epoch(base, 1).repartition(32).persist()
    val many = (1 to factor).map(epoch(base, _))
      .reduce(_.unionByName(_)).repartition(32).persist()
    one.count(); many.count()

    def timed(label: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = body
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[profile] $label%-18s $dt%7.2fs ($rows rows)")
      dt
    }

    // the phases mirror Dedup.prefixFilterPairs exactly (same exprs,
    // same threshold/cap defaults), split by materialize barriers
    def phases(d: DataFrame, leg: String): Seq[(String, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      val t = 0.7
      var sh: DataFrame = null
      out += s"$leg:shingle" -> timed(s"$leg:shingle") {
        sh = Caching.materialize(d.select(col("doc_id"),
          graft.operators.LlmText.shingles(col("text")).as("sh"))
          .filter(size(col("sh")) > 0))
        sh.count()
      }
      var tok: DataFrame = null
      out += s"$leg:tokenize" -> timed(s"$leg:tokenize") {
        tok = Caching.materialize(
          sh.select(col("doc_id"), size(col("sh")).as("n"),
            explode(transform(col("sh"),
              s => PortableHash.hash60("f:", s))).as("h")))
        tok.count()
      }
      var freq: DataFrame = null
      out += s"$leg:freq" -> timed(s"$leg:freq") {
        freq = Caching.materialize(
          tok.groupBy(col("h")).agg(count(lit(1)).as("freq")))
        freq.count()
      }
      var pc: DataFrame = null
      out += s"$leg:rank" -> timed(s"$leg:rank") {
        val byRarity = Window.partitionBy(col("doc_id"))
          .orderBy(col("freq"), col("h"))
        val prefix = tok.join(freq, "h")
          .withColumn("rn", row_number().over(byRarity))
          .filter(col("rn") <=
            floor((lit(1.0) - t) * col("n") + lit(1e-9)) + 1)
          .select(col("doc_id"), col("n"), col("h"), col("rn"))
        val hot = prefix.groupBy(col("h"))
          .agg(count(lit(1)).as("__kd")).filter(col("__kd") > 500)
          .select(col("h"))
        pc = Caching.materialize(prefix.join(hot, Seq("h"), "left_anti"))
        pc.count()
      }
      var cand: DataFrame = null
      out += s"$leg:join" -> timed(s"$leg:join") {
        cand = Caching.materialize(pc.as("a")
          .join(pc.as("b"),
            col("a.h") === col("b.h") &&
              col("a.doc_id") < col("b.doc_id") &&
              col("a.n").cast("double") >= lit(t) * col("b.n") &&
              col("b.n").cast("double") >= lit(t) * col("a.n") &&
              (lit(1) + least(col("a.n") - col("a.rn"),
                col("b.n") - col("b.rn"))).cast("double") >=
                ceil(lit(t) * (col("a.n") + col("b.n")).cast("double") /
                  lit(1.0 + t) - lit(1e-9)))
          .select(col("a.doc_id").as("doc_a"),
            col("b.doc_id").as("doc_b"))
          .distinct())
        cand.count()
      }
      out += s"$leg:verify" -> timed(s"$leg:verify") {
        cand.join(sh.as("x"), col("doc_a") === col("x.doc_id"))
          .join(sh.as("y"), col("doc_b") === col("y.doc_id"))
          .select(col("doc_a"), col("doc_b"),
            (size(array_intersect(col("x.sh"), col("y.sh")))
              .cast("double") /
              size(array_union(col("x.sh"), col("y.sh"))))
              .as("jaccard"))
          .filter(col("jaccard") >= t).count()
      }
      out.toSeq
    }

    phases(one, "warm").foreach(_ => ()) // codegen/shuffle warm-up
    val p1 = phases(one, "1x")
    val pN = phases(many, s"${factor}x")
    val json = p1.zip(pN).map { case ((n1, t1), (_, tN)) =>
      val phase = n1.split(':')(1)
      f""""$phase":{"sec1":$t1%.3f,"secN":$tN%.3f,""" +
        f""""ratio":${tN / math.max(t1, 1e-9)}%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""{"profile":"prefix_pairs","factor":$factor,$json}""")
    one.unpersist(); many.unpersist()
  }
}
