package graft.tools

import graft.SparkEntry

import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession

/** Diagnostic: where do large task binaries come from?
  *
  * For each query named in SPARK_GRAFT_ONLY (default: the known IVF
  * offenders), plans the frame and reports the closure-serialized size of
  * every physical-plan subtree, largest first — the same serialization
  * the DAGScheduler performs when it broadcasts a stage's task binary, so
  * a node whose subtree serializes at ~1 MiB here is the node that makes
  * the scheduler log "Broadcasting large task binary". Run with
  * `sbt "runMain graft.tools.TaskBinSizes"`.
  */
object TaskBinSizes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "s14_ivf_adc_vs_index")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val ser = SparkEnv.get.closureSerializer.newInstance()
    def sizeOf(o: AnyRef): Long =
      try ser.serialize(o).limit().toLong
      catch { case _: Throwable => -1L }
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      println(s"=== $name ===")
      val rows = plan.collect { case p =>
        (sizeOf(p), p.getClass.getSimpleName, p.simpleStringWithNodeId())
      }.sortBy(-_._1).take(12)
      rows.foreach { case (sz, cls, s) =>
        println(f"$sz%10d  $cls%-28s ${s.take(100)}")
      }
    }
    spark.stop()
  }
}
