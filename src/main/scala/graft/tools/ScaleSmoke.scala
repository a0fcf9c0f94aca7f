package graft.tools

import graft.operators.{Dedup, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot scale stress of the candidate-generation dedup family beyond
  * sf0.1 — the empirical leg of the 100 TB design argument (VERDICT r8
  * "Next" #2): the plans are SHAPED for linear scaling (bucketed + capped
  * candidate joins, rare-first prefixes, star-contraction CC), and this
  * main measures it instead of asserting it.
  *
  * Corpus construction: `factor` epochs of the sf0.1 documents table, each
  * epoch's text re-tokenized by suffixing every word with an epoch marker
  * (`regexp_replace(text, "\\S+", "$0z<e>")` — word and shingle COUNTS
  * stay identical to the base, so per-doc cost is scale-invariant). The
  * suffix makes every 3-word shingle epoch-specific, so epochs share NO
  * shingles: the expanded corpus is
  * `factor` disjoint shards, each isomorphic to the base — duplicate
  * DENSITY stays constant while document count scales, which is exactly
  * the regime where a linear-scaling candidate generator must show linear
  * wall time (a corpus where every doc gains `factor-1` cross-epoch twins
  * would instead scale the TRUE-PAIR OUTPUT quadratically and measure the
  * corpus, not the algorithm). The 1× baseline is epoch 1 alone — same
  * transformation, same per-doc cost — so the ratio isolates scale.
  *
  * Measures d26 (exact-recall prefix-filter self-join), d28 (the full
  * exact pipeline: pairs → components → apply), d2 (MinHash-LSH pairs),
  * d12 (large-star/small-star components), and the d17 cap accounting at
  * 10× (dropped candidate mass must stay a bounded fraction of entries).
  *
  * Usage: `sbt "runMain graft.tools.ScaleSmoke [sfDir] [factor]"`.
  * Prints one JSON line and writes STRESS_LOCAL.json next to
  * BENCH_LOCAL.json.
  */
object ScaleSmoke {

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

  /** One epoch: every word suffixed with the epoch marker, doc_ids
    * offset. */
  private def epoch(base: DataFrame, e: Int): DataFrame =
    base.select(
      (col("doc_id") + lit(e.toLong * 10_000_000L)).as("doc_id"),
      regexp_replace(col("text"), "\\S+", s"$$0z$e").as("text"),
      col("source"), col("lang"))

  private def expand(base: DataFrame, epochs: Range): DataFrame =
    epochs.map(epoch(base, _)).reduce(_.unionByName(_))

  private[tools] def run(spark: SparkSession, sfDir: String,
      factor: Int): Unit = {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
    val one = expand(base, 1 to 1)
      .repartition(32).persist()
    val many = expand(base, 1 to factor)
      .repartition(32).persist()
    val nOne = one.count()
    val nMany = many.count()

    def timed(fn: DataFrame => DataFrame)(df: DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = fn(df).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "d26_prefix_filter" -> (d => Dedup.prefixFilterPairs(d, 0.7)),
      "d28_exact_pipeline" -> { d =>
        val pairs = Dedup.prefixFilterPairs(d, 0.7)
          .select(col("doc_a"), col("doc_b"))
        val comps = Dedup.connectedComponents(pairs)
          .select(col("doc").as("doc_id"),
            (col("doc") === col("lab")).as("keep"))
        Dedup.dedupApply(d, comps)
      },
      "d2_minhash_lsh" -> (d => Dedup.minhashLsh(d)),
      "d12_cc_star" -> (d => Dedup.nearDupComponentsStar(d)))

    // warm the JVM (codegen, shuffle machinery) so the first 1× timing
    // isn't charged startup cost — without this the 1× leg of the first
    // operator measured 1.8× its steady-state time
    ops.foreach { case (_, fn) => fn(one).count() }

    val results = ops.map { case (name, fn) =>
      val (t1, r1) = timed(fn)(one)
      val (tN, rN) = timed(fn)(many)
      val ratio = tN / math.max(t1, 1e-9)
      System.err.println(f"[stress] $name%-18s 1x=$t1%7.1fs ($r1 rows)  " +
        f"${factor}x=$tN%7.1fs ($rN rows)  ratio=$ratio%5.2f")
      (name, t1, tN, r1, rN, ratio)
    }

    // cap accounting at the stressed scale: the drop mass the hot-key cap
    // excludes must stay a bounded fraction of all (doc,key) entries
    val cap = Dedup.bandCapReport(many).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    cap.foreach { case (fam, keys, hot, dropped) =>
      System.err.println(
        s"[stress] cap $fam: $keys keys, $hot hot, $dropped dropped entries")
    }

    // the ITERATIVE graph family under the same regime: epoch-offset
    // order/customer/supplier keys make each epoch a disjoint subgraph,
    // so community structure stays constant while node/edge counts scale
    def graphEpoch(e: Int): (DataFrame, DataFrame) = {
      val li = Tables.lineitem(spark, sfDir)
        .select((col("l_orderkey") + lit(e.toLong * 100_000_000L))
          .as("l_orderkey"),
          (col("l_suppkey") + lit(e.toLong * 1_000_000L)).as("l_suppkey"))
      val ord = Tables.orders(spark, sfDir)
        .select((col("o_orderkey") + lit(e.toLong * 100_000_000L))
          .as("o_orderkey"),
          (col("o_custkey") + lit(e.toLong * 1_000_000L)).as("o_custkey"))
      (li, ord)
    }
    def graphTables(epochs: Range): (DataFrame, DataFrame) = {
      val parts = epochs.map(graphEpoch)
      (parts.map(_._1).reduce(_.unionByName(_)).repartition(32).persist(),
        parts.map(_._2).reduce(_.unionByName(_)).repartition(32).persist())
    }
    val (li1, ord1) = graphTables(1 to 1)
    val (liN, ordN) = graphTables(1 to factor)
    li1.count(); ord1.count(); liN.count(); ordN.count()
    val graphOps: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
      "g1_pagerank" -> ((l, o) => graft.operators.Graph.pageRank(l, o)),
      "g2_label_prop" -> ((l, o) =>
        graft.operators.Graph.labelPropagation(l, o)))
    graphOps.foreach { case (_, fn) => fn(li1, ord1).count() } // warm
    val graphResults = graphOps.map { case (name, fn) =>
      val t0 = System.nanoTime(); val r1 = fn(li1, ord1).count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime(); val rN = fn(liN, ordN).count()
      val tN = (System.nanoTime() - t2) / 1e9
      val ratio = tN / math.max(t1, 1e-9)
      System.err.println(f"[stress] $name%-18s 1x=$t1%7.1fs ($r1 rows)  " +
        f"${factor}x=$tN%7.1fs ($rN rows)  ratio=$ratio%5.2f")
      (name, t1, tN, r1, rN, ratio)
    }
    Seq(li1, ord1, liN, ordN).foreach(_.unpersist())

    def opsJson(rs: Seq[(String, Double, Double, Long, Long, Double)]) =
      rs.map { case (n, t1, tN, r1, rN, ratio) =>
        s""""$n":{"sec1":${f"$t1%.3f"},"secN":${f"$tN%.3f"},""" +
        s""""rows1":$r1,"rowsN":$rN,"ratio":${f"$ratio%.3f"}}"""
      }.mkString(",")
    val json =
      s"""{"sf":"$sfDir","factor":$factor,"docs1":$nOne,"docsN":$nMany,""" +
      s""""ops":{${opsJson(results)}},""" +
      s""""graphOps":{${opsJson(graphResults)}},""" +
      s""""cap":{${cap.map { case (fam, keys, hot, dropped) =>
        s""""$fam":{"keys":$keys,"hot":$hot,"dropped":$dropped}"""
      }.mkString(",")}}}"""
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Path.of("STRESS_LOCAL.json"), json + "\n")
    catch { case _: Throwable => () }

    one.unpersist(); many.unpersist()
  }
}
