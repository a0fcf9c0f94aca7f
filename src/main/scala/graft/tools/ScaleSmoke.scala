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
  * d12 (large-star/small-star components), the d17 cap accounting at
  * 10× (dropped candidate mass must stay a bounded fraction of entries),
  * the iterative graph family (g1/g2), and the index LIFECYCLE family —
  * IVF-ADC build/search/append, range serve, and the mm9 phash probe —
  * where build may scale with the corpus but the append/probe serve
  * paths must scale with the batch (warned loudly if they don't).
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

    // best-of-2 on every measured leg: single-shot timings on a shared
    // box swing >3× under neighbor load (one run recorded 181s for an
    // op that times 12-21s in every other run) — the min of two
    // back-to-back runs reads through the spikes while the ratio story
    // stays the algorithm's, not the neighbors'
    def best2[A](once: () => (Double, A)): (Double, A) = {
      val (ta, _) = once()
      val (tb, b) = once()
      (math.min(ta, tb), b)
    }
    def timed(fn: DataFrame => DataFrame)(df: DataFrame): (Double, Long) =
      best2 { () =>
        val t0 = System.nanoTime()
        val rows = fn(df).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "d26_prefix_filter" -> (d => Dedup.prefixFilterPairs(d, 0.7)),
      "d28_exact_pipeline" -> { d =>
        // mirrors the SparkEntry registration: pairs MATERIALIZED before
        // CC (the phase accounting below showed the as-written lazy
        // pipeline re-planning the prefix join in CC's union arms)
        val pairs = graft.operators.Caching.materialize(
          Dedup.prefixFilterPairs(d, 0.7)
            .select(col("doc_a"), col("doc_b")))
        val comps = Dedup.connectedComponents(pairs)
          .select(col("doc").as("doc_id"),
            (col("doc") === col("lab")).as("keep"))
        Dedup.dedupApply(d, comps)
      },
      "d2_minhash_lsh" -> (d => Dedup.minhashLsh(d)),
      // d44/d45: the r16 audit queries — compositions of the stressed
      // kernels above (d26 + d2 + CC), so their ratios must inherit the
      // components' linearity; measured here rather than asserted
      "d44_lsh_vs_exact" -> (d => Dedup.lshVsExact(d)),
      "d45_threshold_sweep" -> (d => Dedup.thresholdSweep(d)),
      "d12_cc_star" -> (d => Dedup.nearDupComponentsStar(d)),
      // d39: boundary-shingle candidate join — the epoch suffix makes
      // boundary keys epoch-disjoint, so candidates (and wall time)
      // must scale linearly like d26's
      "d39_chain_overlap" -> (d =>
        graft.operators.DedupSources.chainOverlap(d)),
      // d35: estimator-vs-exact over the LSH candidate set only — must
      // track the candidate count (linear here), never go all-pairs
      "d35_minhash_calib" -> (d => Dedup.minhashCalibration(d)),
      // mm14: per-media sample loop — cost must track media bytes 1:1
      "mm14_clipping" -> (d =>
        graft.operators.Multimodal.clippingReport(d)))

    // SPARK_GRAFT_STRESS_OPS=d26_prefix_filter,... runs only the named
    // document-family ops (plus the d28 phase accounting iff d28 is
    // named), prints the same JSON shape restricted to those rows, and
    // writes STRESS_SUBSET_LOCAL.json instead of STRESS_LOCAL.json — the
    // cheap re-measure / extra-factor path (a 30× point of ONE op should
    // not pay for the whole lifecycle family).
    val subsetSel = sys.env.get("SPARK_GRAFT_STRESS_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val opsSel = subsetSel.fold(ops)(sel => ops.filter(p => sel(p._1)))

    // warm the JVM (codegen, shuffle machinery) so the first 1× timing
    // isn't charged startup cost — without this the 1× leg of the first
    // operator measured 1.8× its steady-state time
    opsSel.foreach { case (_, fn) => fn(one).count() }

    val results = opsSel.map { case (name, fn) =>
      val (t1, r1) = timed(fn)(one)
      val (tN, rN) = timed(fn)(many)
      val ratio = tN / math.max(t1, 1e-9)
      System.err.println(f"[stress] $name%-18s 1x=$t1%7.1fs ($r1 rows)  " +
        f"${factor}x=$tN%7.1fs ($rN rows)  ratio=$ratio%5.2f")
      (name, t1, tN, r1, rN, ratio)
    }

    // d28 phase accounting (VERDICT r12 #4: its 10× ratio reads 4.5 with
    // no named cause). The pipeline is pairs → CC → apply; timing the
    // phases against a MATERIALIZED pairs frame names which phase grows
    // superlinearly and how the candidate-pair count itself scales —
    // the g6/d16 accounting posture applied to the ratio.
    val doAcct = subsetSel.forall(_.contains("d28_exact_pipeline"))
    def d28Phases(d: DataFrame): (Double, Double, Double, Long) = {
      val t0 = System.nanoTime()
      val pairs = graft.operators.Caching.materialize(
        Dedup.prefixFilterPairs(d, 0.7).select(col("doc_a"), col("doc_b")))
      val nPairs = pairs.count()
      val t1 = System.nanoTime()
      val comps = Dedup.connectedComponents(pairs)
        .select(col("doc").as("doc_id"),
          (col("doc") === col("lab")).as("keep"))
      comps.count()
      val t2 = System.nanoTime()
      Dedup.dedupApply(d, comps).count()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, nPairs)
    }
    val d28Acct: Seq[(String, Double, Double, Long, Long)] =
      if (!doAcct) Seq.empty
      else {
        val (p1a, c1a, a1a, np1) = d28Phases(one)
        val (p1b, c1b, a1b, _) = d28Phases(one)
        val (pNa, cNa, aNa, npN) = d28Phases(many)
        val (pNb, cNb, aNb, _) = d28Phases(many)
        Seq(
          ("d28_pairs", math.min(p1a, p1b), math.min(pNa, pNb), np1, npN),
          ("d28_cc", math.min(c1a, c1b), math.min(cNa, cNb), np1, npN),
          ("d28_apply", math.min(a1a, a1b), math.min(aNa, aNb), nOne, nMany))
      }
    d28Acct.foreach { case (name, t1, tN, r1, rN) =>
      System.err.println(f"[stress] $name%-18s 1x=$t1%7.1fs ($r1 rows)  " +
        f"${factor}x=$tN%7.1fs ($rN rows)  ratio=${tN / math.max(t1, 1e-9)}%5.2f")
    }

    if (subsetSel.isDefined) {
      def row(n: String, t1: Double, tN: Double, r1: Long, rN: Long) =
        s""""$n":{"sec1":${f"$t1%.3f"},"secN":${f"$tN%.3f"},""" +
          s""""rows1":$r1,"rowsN":$rN,""" +
          s""""ratio":${f"${tN / math.max(t1, 1e-9)}%.3f"}}"""
      val json =
        s"""{"sf":"$sfDir","factor":$factor,"docs1":$nOne,""" +
          s""""docsN":$nMany,""" +
          s""""ops":{${results.map(r =>
            row(r._1, r._2, r._3, r._4, r._5)).mkString(",")}},""" +
          s""""accounting":{${d28Acct.map(r =>
            row(r._1, r._2, r._3, r._4, r._5)).mkString(",")}}}"""
      println(json)
      try java.nio.file.Files.writeString(
        java.nio.file.Path.of("STRESS_SUBSET_LOCAL.json"), json + "\n")
      catch { case _: Throwable => () }
      one.unpersist(); many.unpersist()
      return
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
        graft.operators.Graph.labelPropagation(l, o)),
      // g5: THE quadratic-per-key candidate (the one-mode projection) —
      // the hub cap must hold it near-linear under epoch expansion
      "g5_copurchase" -> ((l, o) =>
        graft.operators.Graph.coPurchasePairs(l, o)),
      "g6_copurchase_rep" -> ((l, o) =>
        graft.operators.Graph.coPurchaseGovernance(l, o)),
      // g9: the triangle build (projection + top-k sparsifier + wedge
      // join) — epochs are disjoint subgraphs, so the degree-ordered
      // count must stay near-linear under epoch expansion
      "g9_triangle_lcc" -> ((l, o) =>
        graft.operators.Graph.triangleStats(l, o)))
    graphOps.foreach { case (_, fn) => fn(li1, ord1).count() } // warm
    val graphResults = graphOps.map { case (name, fn) =>
      def leg(l: DataFrame, o: DataFrame): (Double, Long) = best2 { () =>
        val t0 = System.nanoTime(); val r = fn(l, o).count()
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (t1, r1) = leg(li1, ord1)
      val (tN, rN) = leg(liN, ordN)
      val ratio = tN / math.max(t1, 1e-9)
      System.err.println(f"[stress] $name%-18s 1x=$t1%7.1fs ($r1 rows)  " +
        f"${factor}x=$tN%7.1fs ($rN rows)  ratio=$ratio%5.2f")
      (name, t1, tN, r1, rN, ratio)
    }
    Seq(li1, ord1, liN, ordN).foreach(_.unpersist())

    // ---- the ANN / multimodal INDEX-LIFECYCLE family (VERDICT r9 #3) ----
    // Build cost legitimately scales with the corpus (that's what a
    // nightly rebuild pays); the APPEND and PROBE serve paths are the ones
    // whose cost must track the BATCH. Epochs reuse the id-offset recipe:
    // identical vectors under disjoint ids keep per-item cost constant
    // while corpus size scales (candidate growth stays linear — every
    // query's probed cells hold `factor` copies, not factor² pairs).
    import graft.operators.{Multimodal, Similarity}
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    // epoch 1 keeps the BASE ids: the PQ codebook's deterministic seed
    // gate (`vec_id % 61 == 0 AND vec_id < 61·256`) must see its seed
    // rows, or the codebook trains EMPTY and every ADC search returns
    // zero rows (the quantizer-sampling-split trap — the s15 spec hit
    // the same thing with a % 5 split). Later epochs land above the
    // gate, which just means the bounded seed set stays epoch-1-only —
    // the same fixed-size-codebook regime a real corpus has.
    def embEpoch(e: Int): DataFrame = embBase.select(
      (col("vec_id") + lit((e - 1).toLong * 10_000_000L)).as("vec_id"),
      col("embedding"), col("label"))
    def embExpand(epochs: Range): DataFrame =
      epochs.map(embEpoch).reduce(_.unionByName(_)).repartition(32).persist()
    val emb1 = embExpand(1 to 1)
    val embN = embExpand(1 to factor)
    emb1.count(); embN.count()
    def timedAction[A](body: => A): (Double, A) = best2 { () =>
      val t0 = System.nanoTime()
      val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // build = the rebuild yardstick (index tables materialize eagerly, so
    // constructing the IvfAdcIndex IS the timed work)
    Similarity.ivfAdcIndex(emb1) // warm (codegen, shuffle machinery)
    val (build1, idx1) = timedAction(Similarity.ivfAdcIndex(emb1))
    val (buildN, idxN) = timedAction(Similarity.ivfAdcIndex(embN))
    // s13/s14 search phase against the prebuilt index, each at its scale
    val (search1, sr1) =
      timedAction(Similarity.ivfAdcVsIndex(emb1, idx1).count())
    val (searchN, srN) =
      timedAction(Similarity.ivfAdcVsIndex(embN, idxN).count())
    // a zero-row search means a quantizer trained empty (the seed-gate
    // trap above) — the timing would measure nothing; fail loudly
    require(sr1 > 0 && srN > 0,
      s"IVF-ADC search returned $sr1/$srN rows — empty quantizer; " +
        "check the epoch id offsets against the codebook seed gate")
    // s15 append: the SAME fixed batch (one epoch under fresh ids) onto
    // the 1x and the factor-x index — per-ingest cost must track the
    // batch; growth here comes only from the corpus-sized centroid table
    // the argmax broadcasts (corpus/50 seeds in this toy parameterization)
    val batch = embEpoch(factor + 1).repartition(32).persist()
    batch.count()
    Similarity.ivfAdcAppend(batch, idx1) // warm
    val (append1, _) = timedAction(Similarity.ivfAdcAppend(batch, idx1))
    val (appendN, _) = timedAction(Similarity.ivfAdcAppend(batch, idxN))
    // s16 range serve: fixed caller query set against both indexes (the
    // corpus argument feeds the exact re-rank gather; its prep is the
    // stored-vector-table cost a lake deployment pays once, not per call)
    val queries = embEpoch(factor + 2)
      .filter(col("vec_id") % 100 === 0).repartition(8).persist()
    queries.count()
    val (serve1, rs1) = timedAction(
      Similarity.ivfRangeServe(queries, emb1, idx1).count())
    val (serveN, rsN) = timedAction(
      Similarity.ivfRangeServe(queries, embN, idxN).count())
    // mm9 phash probe: fixed incoming batch against stored sig indexes
    val pIdx1 = Multimodal.phashIndex(one)
    val pIdxN = Multimodal.phashIndex(many)
    val incoming = epoch(base, factor + 1).repartition(32).persist()
    incoming.count()
    Multimodal.phashVsIndex(incoming, pIdx1).count() // warm
    val (probe1, pr1) = timedAction(
      Multimodal.phashVsIndex(incoming, pIdx1).count())
    val (probeN, prN) = timedAction(
      Multimodal.phashVsIndex(incoming, pIdxN).count())
    // g-family membership serve: a FIXED node batch looked up against the
    // stored label index of the 1x and factor-x graphs — two equi-joins,
    // per-batch cost, must not track graph size
    val lIdx1 = graft.operators.Graph.labelIndex(li1, ord1)
    val lIdxN = graft.operators.Graph.labelIndex(liN, ordN)
    // g11: the fixpoint peel SERVED from the stored neighbor index (the
    // round-12 stored/serve split) — the build is measured separately by
    // g9 in graphOps; the peel's per-round shuffles must track edge
    // count (near-linear), with round count set by peel depth, not size
    val nIdx1 = graft.operators.Graph.neighborIndex(li1, ord1)
    val nIdxN = graft.operators.Graph.neighborIndex(liN, ordN)
    graft.operators.Graph.kcore(nIdx1, 2, 64).count() // warm
    val (core1, kc1) = timedAction(
      graft.operators.Graph.kcore(nIdx1, 2, 64).count())
    val (coreN, kcN) = timedAction(
      graft.operators.Graph.kcore(nIdxN, 2, 64).count())
    val (bridges1, bridgesN) = (
      graft.operators.Caching.materialize(
        graft.operators.Graph.bridgeNodes(lIdx1)),
      graft.operators.Caching.materialize(
        graft.operators.Graph.bridgeNodes(lIdxN)))
    val nodeBatch = lIdx1.labels.select(col("node")).limit(500)
      .withColumn("payload", lit(1L)).repartition(8).persist()
    nodeBatch.count()
    graft.streaming.StreamGraph.batchMembership(nodeBatch,
      lIdx1.labels, bridges1).count() // warm
    val (member1, mb1) = timedAction(graft.streaming.StreamGraph
      .batchMembership(nodeBatch, lIdx1.labels, bridges1).count())
    val (memberN, mbN) = timedAction(graft.streaming.StreamGraph
      .batchMembership(nodeBatch, lIdxN.labels, bridgesN).count())
    // x37 serve: a FIXED doc batch scored against stored reference LM
    // count tables built from the 1x and factor-x corpora — the count
    // tables are vocabulary-sized, so the join cost tracks the batch
    val refBi1 = graft.operators.Caching.materialize(
      graft.operators.LlmLm.docBigrams(one)
        .groupBy(col("bigram")).agg(count(lit(1)).as("cb")))
    val refCtx1 = graft.operators.Caching.materialize(
      graft.operators.LlmLm.docBigrams(one)
        .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
        .agg(count(lit(1)).as("cw")))
    val refBiN = graft.operators.Caching.materialize(
      graft.operators.LlmLm.docBigrams(many)
        .groupBy(col("bigram")).agg(count(lit(1)).as("cb")))
    val refCtxN = graft.operators.Caching.materialize(
      graft.operators.LlmLm.docBigrams(many)
        .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
        .agg(count(lit(1)).as("cw")))
    val docBatch = epoch(base, factor + 3).limit(500)
      .repartition(8).persist()
    docBatch.count()
    graft.streaming.StreamCuration.batchLmScore(docBatch, refBi1,
      refCtx1).count() // warm
    val (lm1, ls1) = timedAction(graft.streaming.StreamCuration
      .batchLmScore(docBatch, refBi1, refCtx1).count())
    val (lmN, lsN) = timedAction(graft.streaming.StreamCuration
      .batchLmScore(docBatch, refBiN, refCtxN).count())
    // the s18–s21 gauges against the PREBUILT indexes (the post-reuse
    // serve forms SparkEntry registers): query count scales with the
    // corpus here (vec_id % 100 queries), so the expected ratio is
    // ~linear — what must NOT appear is a quantizer retrain (which
    // would add a corpus-sized k-means on every gauge read)
    Similarity.cellBalance(idx1).count() // warm
    val (gErr1, ge1) = timedAction(
      Similarity.adcErrorStats(emb1, idx1, probeK = 30).count())
    val (gErrN, geN) = timedAction(
      Similarity.adcErrorStats(embN, idxN, probeK = 30).count())
    val (gFan1, gf1) = timedAction(
      Similarity.probeFanout(emb1, idx1).count())
    val (gFanN, gfN) = timedAction(
      Similarity.probeFanout(embN, idxN).count())
    val (gBal1, gb1) = timedAction(Similarity.cellBalance(idx1).count())
    val (gBalN, gbN) = timedAction(Similarity.cellBalance(idxN).count())
    val (gSub1, gs1) = timedAction(
      Similarity.adcErrorBySubspace(emb1, idx1).count())
    val (gSubN, gsN) = timedAction(
      Similarity.adcErrorBySubspace(embN, idxN).count())
    // s22 filtered serve: the allow-predicate is semi-joined into the
    // stored codes BEFORE scoring, so cost tracks the probed candidate
    // set (~linear with corpus here: query count scales too), never the
    // filter's complement
    val (gFil1, gl1) = timedAction(
      Similarity.filteredVsIndex(emb1, idx1).count())
    val (gFilN, glN) = timedAction(
      Similarity.filteredVsIndex(embN, idxN).count())
    // s24/g13 churn reports (VERDICT r12 #4: the two most expensive
    // round-12 queries had no stress row): each builds its SECOND index
    // inline BY DESIGN (the s15/d13 convention — the build is the
    // benchmark), so the expected ratio tracks the corpus like
    // s13_index_build does, NOT the batch; the churn fold itself is one
    // equi-join + constant-group aggregate on top. The row exists so
    // the next scale-up reads a measured number instead of a guess.
    val (chS1, cs1) = timedAction(Similarity.cellChurn(idx1,
      Similarity.ivfAdcIndex(
        emb1.filter(pmod(col("vec_id"), lit(7)) =!= 3))).count())
    val (chSN, csN) = timedAction(Similarity.cellChurn(idxN,
      Similarity.ivfAdcIndex(
        embN.filter(pmod(col("vec_id"), lit(7)) =!= 3))).count())
    val (chG1, cg1) = timedAction(graft.operators.Graph.neighborChurn(
      nIdx1, graft.operators.Graph.neighborIndex(li1,
        ord1.filter(col("o_orderkey") % 10 =!= 0))).count())
    val (chGN, cgN) = timedAction(graft.operators.Graph.neighborChurn(
      nIdxN, graft.operators.Graph.neighborIndex(liN,
        ordN.filter(col("o_orderkey") % 10 =!= 0))).count())
    // d38/mm16 stored-serve shapes (VERDICT r13 #6): since the post-seal
    // rewire the FRESH side is the stored lake artifact (primed untimed —
    // built here outside the timers, like the bench's priming phase);
    // what the nightly actually pays is (a) yesterday's 90%-split build
    // and (b) the distinct-bucket-scale fold. Timed as separate rows so
    // the build-vs-fold split is visible: the split build legitimately
    // tracks the corpus (it IS a rebuild of 90% of it); the fold must
    // track distinct buckets (~linear here since epochs share no
    // shingles/hashes), never corpus pairs.
    import graft.operators.Caching
    val ndStored1 = Caching.materialize(Dedup.nearDupIndex(one))
    val ndStoredN = Caching.materialize(Dedup.nearDupIndex(many))
    def ndSplit(d: DataFrame): DataFrame = Caching.materialize(
      Dedup.nearDupIndex(d.filter(pmod(col("doc_id"), lit(10)) =!= 0)))
    ndSplit(one).count() // warm
    val (ndB1, ndSplit1) = timedAction(ndSplit(one))
    val (ndBN, ndSplitN) = timedAction(ndSplit(many))
    Dedup.dirtyBucketReport(ndStored1, ndSplit1).count() // warm
    val (ndF1, nf1) = timedAction(
      Dedup.dirtyBucketReport(ndStored1, ndSplit1).count())
    val (ndFN, nfN) = timedAction(
      Dedup.dirtyBucketReport(ndStoredN, ndSplitN).count())
    def phSplit(d: DataFrame): Multimodal.PhashIndex =
      Multimodal.phashIndex(d.filter(pmod(col("doc_id"), lit(10)) =!= 0))
    val (phB1, phSplit1) = timedAction(phSplit(one))
    val (phBN, phSplitN) = timedAction(phSplit(many))
    Multimodal.phashDirtyBuckets(pIdx1, phSplit1).count() // warm
    val (phF1, pf1) = timedAction(
      Multimodal.phashDirtyBuckets(pIdx1, phSplit1).count())
    val (phFN, pfN) = timedAction(
      Multimodal.phashDirtyBuckets(pIdxN, phSplitN).count())
    val lifecycle = Seq(
      ("s13_index_build", build1, buildN, 0L, 0L, buildN / math.max(build1, 1e-9)),
      ("d38_split_build", ndB1, ndBN, 0L, 0L,
        ndBN / math.max(ndB1, 1e-9)),
      ("d38_bucket_fold", ndF1, ndFN, nf1, nfN,
        ndFN / math.max(ndF1, 1e-9)),
      ("mm16_split_build", phB1, phBN, 0L, 0L,
        phBN / math.max(phB1, 1e-9)),
      ("mm16_bucket_fold", phF1, phFN, pf1, pfN,
        phFN / math.max(phF1, 1e-9)),
      ("s18_adc_error", gErr1, gErrN, ge1, geN,
        gErrN / math.max(gErr1, 1e-9)),
      ("s19_probe_fanout", gFan1, gFanN, gf1, gfN,
        gFanN / math.max(gFan1, 1e-9)),
      ("s20_cell_balance", gBal1, gBalN, gb1, gbN,
        gBalN / math.max(gBal1, 1e-9)),
      ("s21_adc_err_sub", gSub1, gSubN, gs1, gsN,
        gSubN / math.max(gSub1, 1e-9)),
      ("s22_filtered_serve", gFil1, gFilN, gl1, glN,
        gFilN / math.max(gFil1, 1e-9)),
      ("g11_kcore_peel", core1, coreN, kc1, kcN,
        coreN / math.max(core1, 1e-9)),
      ("s13_index_search", search1, searchN, sr1, srN,
        searchN / math.max(search1, 1e-9)),
      ("s15_append_batch", append1, appendN, batch.count(), batch.count(),
        appendN / math.max(append1, 1e-9)),
      ("s16_range_serve", serve1, serveN, rs1, rsN,
        serveN / math.max(serve1, 1e-9)),
      ("mm9_phash_probe", probe1, probeN, pr1, prN,
        probeN / math.max(probe1, 1e-9)),
      ("g_member_serve", member1, memberN, mb1, mbN,
        memberN / math.max(member1, 1e-9)),
      ("x37_lm_serve", lm1, lmN, ls1, lsN,
        lmN / math.max(lm1, 1e-9)),
      ("s24_cell_churn", chS1, chSN, cs1, csN,
        chSN / math.max(chS1, 1e-9)),
      ("g13_index_churn", chG1, chGN, cg1, cgN,
        chGN / math.max(chG1, 1e-9)))
    lifecycle.foreach { case (name, t1, tN, r1, rN, ratio) =>
      System.err.println(f"[stress] $name%-18s 1x=$t1%7.1fs ($r1 rows)  " +
        f"${factor}x=$tN%7.1fs ($rN rows)  ratio=$ratio%5.2f")
    }
    // the serve-path claim, asserted loudly: append/probe ratios at
    // factor-x must sit well below the corpus ratio (they scale with the
    // batch); build is ALLOWED to scale with the corpus — that's the
    // rebuild-vs-append tradeoff s15 exists to demonstrate
    Seq("s15_append_batch" -> (appendN / math.max(append1, 1e-9)),
        "mm9_phash_probe" -> (probeN / math.max(probe1, 1e-9)),
        "g_member_serve" -> (memberN / math.max(member1, 1e-9)),
        "x37_lm_serve" -> (lmN / math.max(lm1, 1e-9)))
      .foreach { case (name, ratio) =>
        if (ratio > factor / 2.0)
          System.err.println(s"[stress] WARNING: $name ratio $ratio " +
            s"approaches the corpus ratio $factor — serve path is NOT " +
            "batch-scaled; investigate before the next scale-up")
      }
    Seq(emb1, embN, batch, queries, incoming, nodeBatch, docBatch)
      .foreach(_.unpersist())

    def opsJson(rs: Seq[(String, Double, Double, Long, Long, Double)]) =
      rs.map { case (n, t1, tN, r1, rN, ratio) =>
        s""""$n":{"sec1":${f"$t1%.3f"},"secN":${f"$tN%.3f"},""" +
        s""""rows1":$r1,"rowsN":$rN,"ratio":${f"$ratio%.3f"}}"""
      }.mkString(",")
    val d28AcctJson = d28Acct.map { case (n, t1, tN, r1, rN) =>
      s""""$n":{"sec1":${f"$t1%.3f"},"secN":${f"$tN%.3f"},""" +
      s""""rows1":$r1,"rowsN":$rN,"ratio":${f"${tN / math.max(t1, 1e-9)}%.3f"}}"""
    }.mkString(",")
    val json =
      s"""{"sf":"$sfDir","factor":$factor,"docs1":$nOne,"docsN":$nMany,""" +
      s""""ops":{${opsJson(results)}},""" +
      s""""accounting":{$d28AcctJson},""" +
      s""""graphOps":{${opsJson(graphResults)}},""" +
      s""""lifecycle":{${opsJson(lifecycle)}},""" +
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
