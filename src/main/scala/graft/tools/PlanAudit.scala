package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape audit over EVERY declared query (optimization-guide §1:
  * "capture explain('formatted') for every declared query and note the
  * plan shape"). For each SparkEntry query this captures the final
  * frame's formatted plan PLUS the pre-truncation plan of every
  * Caching.materialize intermediate (the executed shape a checkpoint
  * scan hides), and writes one TSV row of shape counters:
  *
  *   shuffle exchanges, broadcast exchanges, joins by strategy
  *   (BroadcastHash / SortMerge / ShuffledHash / BroadcastNestedLoop /
  *   Cartesian), parquet scans, scans with pushed filters,
  *   WholeStageCodegen spans, and rows that would flag an anti-pattern
  *   (any CartesianProduct or non-broadcast nested loop).
  *
  * Usage: sbt "runMain graft.tools.PlanAudit /tmp/plan_audit.tsv [fullDir]"
  * Env:   SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS (default 8),
  *        SPARK_GRAFT_ONLY=a,b to restrict.
  *
  * NOTE: building a query frame EXECUTES its eager materializations, so
  * a full sweep costs roughly one bench pass at the chosen SF — run it
  * at sf0.01 for shape audits, sf0.1 when stats-dependent choices
  * (broadcast thresholds) are under question. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/plan_audit.tsv")
    val fullDir = args.drop(1).headOption
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Caching.captureMaterializedPlans = true
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(graft.SparkEntry.queries)(names =>
      graft.SparkEntry.queries.filter { case (n, _) => names(n) })
    val w = new java.io.PrintWriter(out)
    w.println(Seq("query", "n_plans", "shuffle_exchanges",
      "broadcast_exchanges", "bhj", "smj", "shj", "bnlj", "cartesian",
      "parquet_scans", "scans_with_pushed_filters", "codegen_spans",
      "err").mkString("\t"))
    def count(txt: String, pat: String): Int =
      pat.r.findAllMatchIn(txt).length
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      graft.operators.Caching.materializedPlans.synchronized {
        graft.operators.Caching.materializedPlans.clear()
      }
      val row =
        try {
          spark.sparkContext.setJobDescription(s"planaudit:$name")
          val df = fn(spark, d)
          val finalPlan = df.queryExecution.explainString(FormattedMode)
          val inner = graft.operators.Caching.materializedPlans.synchronized {
            graft.operators.Caching.materializedPlans.toList
          }
          val plans = inner :+ finalPlan
          val all = plans.mkString("\n")
          fullDir.foreach { dir =>
            java.nio.file.Files.createDirectories(java.nio.file.Path.of(dir))
            java.nio.file.Files.writeString(
              java.nio.file.Path.of(dir, s"$name.txt"),
              plans.zipWithIndex.map { case (p, i) =>
                s"----- plan ${i + 1}/${plans.size}" +
                  (if (i == plans.size - 1) " (final frame)"
                   else " (materialized intermediate)") + " -----\n" + p
              }.mkString("\n"))
          }
          // tree-section lines only (the numbered operator tree prints each
          // op once; the detail section repeats names in prose)
          val tree = all.linesIterator
            .filter(l => l.contains("+-") || l.startsWith("Exchange") ||
              l.contains(": ")).mkString("\n")
          Seq(name, plans.size,
            count(tree, """(?m)[+:]- Exchange """),
            count(tree, """(?m)[+:]- BroadcastExchange """),
            count(tree, """BroadcastHashJoin"""),
            count(tree, """SortMergeJoin"""),
            count(tree, """ShuffledHashJoin"""),
            count(tree, """BroadcastNestedLoopJoin"""),
            count(tree, """CartesianProduct"""),
            count(all, """(?m)\(\d+\) Scan parquet"""),
            count(all, """(?m)PushedFilters: \[(?!\])"""),
            // formatted mode annotates codegen per OPERATOR ("[codegen
            // id : n]"); report covered-operator count — a low number on
            // a big plan means interpreted gaps worth a look
            count(all, """\[codegen id : """),
            "").mkString("\t")
        } catch {
          case e: Throwable =>
            Seq(name, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
              e.getClass.getSimpleName + ": " +
                Option(e.getMessage).getOrElse("").take(120).replace('\t', ' ')
                  .replace('\n', ' ')).mkString("\t")
        } finally spark.sparkContext.setJobDescription(null)
      w.println(row)
      w.flush()
    }
    w.close()
    spark.stop()
  }
}
