package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump the formatted physical plan of named SparkEntry
  * queries at sf0.001 — the plan-audit loop ("is the filter pushed, is the
  * dim broadcast, where are the exchanges") the scale design depends on.
  *
  * Usage: sbt "runMain graft.tools.ExplainMain q2_join_broadcast x7_tfidf"
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { q =>
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
