package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Registration parity gate: every registered query MUST have oracle SQL
    // and vice versa — a divergence here is how a query silently loses its
    // correctness row (round 7: the 133rd registration got no driver row).
    // Fail the whole dump loudly instead of shipping a partial oracle map.
    val qKeys = SparkEntry.queries.keySet
    val oKeys = SparkEntry.oracleSql.keySet
    require(qKeys == oKeys,
      s"queries/oracleSql diverge: missing oracle for ${qKeys -- oKeys}, " +
        s"oracle without query ${oKeys -- qKeys}")
    System.err.println(s"[verify] ${qKeys.size} queries registered, " +
      s"every one oracle-backed")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE-off sweep: results must be plan-movement-invariant
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // events.ts is parquet TIMESTAMP(NANOS); read as long, convert in Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark's runtime bloom-filter injection defaults to 8M bits; the
      // built filter is INLINED into every task binary of the filtered
      // stage as a literal (~1 MiB task binaries — a per-task-launch tax,
      // and the driver-record ">1 MiB binary" noise bar). Our candidate-
      // pruning joins carry ~10^4-10^5 build-side rows, so a 1M-bit
      // filter holds the same (negligible) false-positive rate at 1/8th
      // the shipping cost. False positives only re-admit rows the exact
      // join drops — results are unaffected.
      .config("spark.sql.optimizer.runtime.bloomFilter.numBits", "1048576")
      .config("spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
        "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional subset for local iteration: SPARK_GRAFT_ONLY=x7_tfidf,c1_...
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names(n) })
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Over-unroll invariant (ADVICE r12): the g2/g11 oracles unroll a
    // FIXED number of rounds while the engine runs to fixpoint under a
    // larger safety cap. Rounds past the fixpoint are no-ops, so the two
    // sides agree iff the engine's last CHANGING round fell within the
    // oracle's unroll — a dataset whose fixpoint depth lands between the
    // unroll and the cap would converge cleanly on the Spark side (no
    // warning) yet diverge from the oracle, a loud but confusing parity
    // failure. Check it against THIS dump's recorded telemetry instead
    // of assuming it: fail the whole dump so the gap is named before the
    // driver's DuckDB compare turns it into a hash mismatch.
    // Assert on the per-JVM HIGH-WATER mark, not the last run's sequence
    // (ADVICE r13: last-writer-wins globals mask an earlier over-deep run
    // if a later shallower run overwrites them — g2 and the stored label
    // build both run LPA in this JVM, so the gate must see the max).
    import graft.operators.Graph
    if (Graph.lpaLastChangingHighWater > 0)
      require(Graph.lpaLastChangingHighWater <=
        graft.oracles.GraphOracles.lpaUnrolledRounds,
        s"LPA's deepest last-changing round this JVM " +
          s"(${Graph.lpaLastChangingHighWater}; last run: " +
          s"${Graph.lastLpaRoundChanges.mkString(",")}) exceeds the " +
          s"${graft.oracles.GraphOracles.lpaUnrolledRounds}-round oracle " +
          "unroll — raise lpaUnrolledRounds or the g2 oracle diverges")
    if (Graph.kcoreLastChangingHighWater > 0)
      require(Graph.kcoreLastChangingHighWater <=
        graft.oracles.DerivedOracles.kcoreUnrolledRounds,
        s"kcore's deepest last-changing peel round this JVM " +
          s"(${Graph.kcoreLastChangingHighWater}; last run: " +
          s"${Graph.lastKcorePeeled.mkString(",")}) exceeds the " +
          s"${graft.oracles.DerivedOracles.kcoreUnrolledRounds}-round " +
          "oracle unroll — raise kcoreUnrolledRounds or g11 diverges")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
