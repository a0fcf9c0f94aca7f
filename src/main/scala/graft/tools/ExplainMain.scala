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
    // Materialized operators (Caching.materialize) return checkpoint-scan
    // frames whose explain hides the executed shape; capture each
    // intermediate's formatted plan as it materializes and print those too.
    graft.operators.Caching.captureMaterializedPlans = true
    args.foreach { q =>
      graft.operators.Caching.materializedPlans.synchronized {
        graft.operators.Caching.materializedPlans.clear()
      }
      val df = graft.SparkEntry.queries(q)(spark, d)
      println(s"===== $q =====")
      val inner = graft.operators.Caching.materializedPlans.synchronized {
        graft.operators.Caching.materializedPlans.toList
      }
      inner.zipWithIndex.foreach { case (p, i) =>
        println(s"----- materialized intermediate ${i + 1}/${inner.size} " +
          "(executed shape before lineage truncation) -----")
        println(p)
      }
      println("----- final frame -----")
      df.explain("formatted")
    }
    spark.stop()
  }
}
