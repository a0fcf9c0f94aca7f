package graft.tools

import org.apache.spark.sql.SparkSession

/** One-JVM interleaved A/B of the LPA loop's side-split (guide §1: for
  * perf claims on this box, compare variants inside ONE JVM — cross-JVM
  * single runs swing ±30% under neighbor load). Builds the edge frame
  * once, then alternates lpaLabels(sideSplit = false / true) N times and
  * prints per-run seconds plus medians.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.tools.LpaAb [reps]"
  */
object LpaAb {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.operators.Tables.lineitem(spark, sfDir)
    val ord = graft.operators.Tables.orders(spark, sfDir)
    // labelIndex builds + materializes the edges once and runs the loop
    // once (warm-up for codegen/shuffle machinery on BOTH variants' ops)
    val idx = graft.operators.Graph.labelIndex(li, ord)
    val edges = idx.edges
    def time(split: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.Graph.lpaLabels(edges, 24, sideSplit = split)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc() // let ContextCleaner reclaim the per-round checkpoints
      dt
    }
    time(false); time(true) // one untimed warm pair
    val rows = (1 to reps).map { i =>
      val a = time(false); val b = time(true)
      println(f"run $i: nosplit=$a%.3f s  split=$b%.3f s")
      (a, b)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"median: nosplit=${med(rows.map(_._1))}%.3f s  " +
      f"split=${med(rows.map(_._2))}%.3f s")
    spark.stop()
  }
}
