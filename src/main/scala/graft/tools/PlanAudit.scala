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
    // Count operators from each formatted plan's FINAL tree section only
    // (ADVICE r16: the old substring filter double-counted detail-section
    // headers carrying "[codegen id : n]", missed subtree-root tree lines
    // with no "+-" — e.g. "BroadcastHashJoin LeftAnti BuildRight (81)" —
    // and AQE's "== Initial Plan ==" duplicate section inflated
    // scan/codegen totals). A tree line is decoration ([ :+|-]*), an
    // optional codegen marker (*), then the operator name; the detail
    // section starts at the first "^(n) OpName" header. Pushed-filter
    // scans are resolved per final-tree scan id against that id's detail
    // block, so initial-plan duplicates are never counted.
    final case class Shape(shuffleEx: Int, broadcastEx: Int, bhj: Int,
        smj: Int, shj: Int, bnlj: Int, cartesian: Int, scans: Int,
        pushedScans: Int, codegen: Int) {
      def +(o: Shape): Shape = Shape(shuffleEx + o.shuffleEx,
        broadcastEx + o.broadcastEx, bhj + o.bhj, smj + o.smj,
        shj + o.shj, bnlj + o.bnlj, cartesian + o.cartesian,
        scans + o.scans, pushedScans + o.pushedScans, codegen + o.codegen)
    }
    val emptyShape = Shape(0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val detailHdr = """^\((\d+)\) """.r
    val opId = """\((\d+)\)""".r
    def shapeOf(plan: String): Shape = {
      val lines = plan.linesIterator.toVector
      val detailStart =
        lines.indexWhere(l => detailHdr.findPrefixOf(l).isDefined)
      val (treeAll, details) =
        if (detailStart >= 0) lines.splitAt(detailStart)
        else (lines, Vector.empty[String])
      // keep only the final plan's tree: AQE appends an "== Initial
      // Plan ==" duplicate after the final one
      val initIdx = treeAll.indexWhere(_.contains("== Initial Plan =="))
      val tree = if (initIdx >= 0) treeAll.take(initIdx) else treeAll
      def deco(c: Char) =
        c == ' ' || c == ':' || c == '+' || c == '-' || c == '|'
      val stripped = tree.map(_.dropWhile(deco))
      // dedupe tree lines by operator id: a self-join prints its reused
      // scan/build subtree once per branch with the SAME id — count the
      // operator, not the references to it (lines without an id, e.g.
      // the "== Final Plan ==" header, can't name an operator)
      val byId = stripped
        .flatMap(l => opId.findAllMatchIn(l).toSeq.lastOption
          .map(m => m.group(1) -> l))
        .toMap.values.toVector
      def cnt(op: String) = byId.count(l =>
        l.startsWith(op) || l.startsWith("* " + op))
      val scanLines = byId.filter(l => l.startsWith("Scan parquet") ||
        l.startsWith("* Scan parquet"))
      // resolve PushedFilters per final-tree scan id in the detail section
      val scanIds = stripped
        .filter(l => l.startsWith("Scan parquet") ||
          l.startsWith("* Scan parquet"))
        .flatMap(l => opId.findAllMatchIn(l).toSeq.lastOption.map(_.group(1)))
        .toSet
      var pushed = 0
      var i = 0
      while (i < details.length) {
        detailHdr.findFirstMatchIn(details(i)) match {
          case Some(m) if scanIds(m.group(1)) &&
              details(i).contains("Scan parquet") =>
            var j = i + 1
            while (j < details.length &&
                detailHdr.findPrefixOf(details(j)).isEmpty) {
              if ("""PushedFilters: \[(?!\])""".r
                  .findFirstIn(details(j)).isDefined) pushed += 1
              j += 1
            }
            i = j
          case _ => i += 1
        }
      }
      Shape(
        cnt("Exchange"), cnt("BroadcastExchange"), cnt("BroadcastHashJoin"),
        cnt("SortMergeJoin"), cnt("ShuffledHashJoin"),
        cnt("BroadcastNestedLoopJoin"), cnt("CartesianProduct"),
        scanLines.size, pushed,
        byId.count(_.startsWith("* ")))
    }
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
          val s = plans.map(shapeOf).foldLeft(emptyShape)(_ + _)
          Seq(name, plans.size,
            // "Exchange" (shuffle) and "BroadcastExchange" are distinct
            // startsWith prefixes — no overlap between the two counters
            s.shuffleEx, s.broadcastEx,
            s.bhj, s.smj, s.shj, s.bnlj, s.cartesian,
            s.scans, s.pushedScans,
            // codegen-covered operator count over the FINAL tree ("*"
            // marker) — a low number on a big plan means interpreted
            // gaps worth a look
            s.codegen,
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
