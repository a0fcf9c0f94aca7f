package graft

import graft.operators.{Curation, Dedup, Graph, LlmText, Multimodal,
  PipelineOps, Relational => R, Similarity, Tables => T, Temporal}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, broadcast, col, count, lit, pmod, when}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB twin in `oracleSql` (same column
  * names, exact-match arithmetic via DECIMAL accumulation) — currently ALL
  * entries, including the sketch query q22 (verified via oracle-pinned
  * tolerance booleans) and the multimodal mm2 (byte-level hex
  * reconstruction). If a future operator is genuinely not SQL-expressible,
  * omitting its oracle key downgrades it to a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    R.pricingSummary(T.lineitem(spark, "/root/testdata/sf0.001"))

  /** ONE full-corpus IVF-ADC index per scale factor, shared by every
    * stored-index query (s14 top-k, s16 range, s17 recall) — the d28
    * one-pass pattern across the registration: a deployment builds its
    * index once and serves every retrieval form from it, so the suite
    * should pay the k-means/codebook training once, not three times.
    *
    * The tables round-trip through parquet in a temp dir (the
    * IvfAdcIndex "stored lake table" shape the spec pins) rather than
    * staying as localCheckpoint frames: the bench sweeps checkpoint
    * blocks between queries, and a swept block would make the second
    * reader recompute — parquet-backed frames survive any sweep. s13
    * intentionally does NOT share: it benchmarks the build+search path.
    * s15 builds its own split index (different training corpus). */
  /** The caches hold PARQUET PATHS, not DataFrames: a cached frame is
    * bound to the SparkSession that built it (a later caller with a
    * different session in the same JVM would get frames of a stopped
    * session), and re-reading per call also gives every query its own
    * scan RDDs — no cross-query re-persist of a shared RDD (the
    * BlockManager "already exists, not re-adding" notice). The temp dirs
    * are deleted by a JVM shutdown hook. */
  private val storedIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def storedTempDir(key: String)(
      write: String => Unit): String =
    storedIndexDirs.computeIfAbsent(key, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-idx-")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          java.nio.file.Files.walk(tmp)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        } catch { case _: Throwable => () }))
      write(tmp.toString)
      tmp.toString
    })

  private def storedIvfIndex(s: SparkSession, d: String): Similarity.IvfAdcIndex = {
    val dir = storedTempDir(s"ivf:$d") { tmp =>
      val idx = Similarity.ivfAdcIndex(T.embeddings(s, d))
      Seq("centroids" -> idx.centroids, "cells" -> idx.cells,
        "codes" -> idx.codes, "codebook" -> idx.codebook)
        .foreach { case (n, df) => df.write.parquet(s"$tmp/$n") }
    }
    Similarity.IvfAdcIndex(
      s.read.parquet(s"$dir/centroids"), s.read.parquet(s"$dir/cells"),
      s.read.parquet(s"$dir/codes"), s.read.parquet(s"$dir/codebook"))
  }

  /** ONE stored community-label index per scale factor (the
    * [[storedIvfIndex]] pattern for the graph family): g2 benchmarks the
    * LPA build itself; g3/g4 and the membership serve path read the
    * stored labels + edges instead of rerunning three LPA rounds each. */
  private def storedLabelIndex(s: SparkSession, d: String): Graph.LabelIndex = {
    val dir = storedTempDir(s"lpa:$d") { tmp =>
      val idx = Graph.labelIndex(T.lineitem(s, d), T.orders(s, d))
      idx.labels.write.parquet(s"$tmp/labels")
      idx.edges.write.parquet(s"$tmp/edges")
    }
    Graph.LabelIndex(s.read.parquet(s"$dir/labels"),
      s.read.parquet(s"$dir/edges"), iters = 3)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.8 extension
    * surface + LLM-pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- relational core (§2.8 extension surface) --
    "q1_agg" -> ((s, d) => R.pricingSummary(T.lineitem(s, d))),
    "q2_join_broadcast" -> ((s, d) => R.revenueByBrand(T.lineitem(s, d), T.part(s, d))),
    "q3_join_topn" -> ((s, d) =>
      R.shippingPriority(T.customer(s, d), T.orders(s, d), T.lineitem(s, d), "BUILDING")),
    "q4_semi_join" -> ((s, d) => R.customersWithOrders(T.customer(s, d), T.orders(s, d))),
    // anti-join against the URGENT subset so the expected output is
    // NONEMPTY — an all-customers anti-join returns 0 rows on this data,
    // and a 0-row oracle match is vacuous
    "q5_anti_join" -> ((s, d) => R.customersWithoutOrders(T.customer(s, d),
      T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"))),
    "q6_outer_join_agg" -> ((s, d) => R.customersPerNation(T.nation(s, d), T.customer(s, d))),
    "q7_window_rank" -> ((s, d) => R.topOrdersPerCustomer(T.orders(s, d), 3)),
    "q8_window_running" -> ((s, d) => R.runningCustomerSpend(T.orders(s, d))),
    "q9_sort_limit" -> ((s, d) => R.topOrders(T.orders(s, d), 20)),
    "q10_set_union" -> ((s, d) => R.setUnion(
      R.segmentKeys(T.customer(s, d), "BUILDING"),
      R.segmentKeys(T.customer(s, d), "MACHINERY"))),
    "q11_set_intersect" -> ((s, d) => R.setIntersect(
      R.segmentKeys(T.customer(s, d), "BUILDING"),
      R.segmentKeys(T.customer(s, d), "MACHINERY"))),
    // EXCEPT at customer granularity — every segment spans all 25 nations,
    // so the nationkey-level difference was vacuously empty
    "q12_set_except" -> ((s, d) => R.setExcept(
      T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")).distinct(),
      T.orders(s, d).filter(col("o_orderpriority") === "5-LOW")
        .select(col("o_custkey").as("custkey")).distinct())),
    "q13_distinct_agg" -> ((s, d) => R.orderStats(T.orders(s, d), T.lineitem(s, d))),
    "q14_rollup" -> ((s, d) => R.rollupSummary(T.lineitem(s, d))),
    "q15_cube" -> ((s, d) => R.cubeSummary(T.orders(s, d))),
    "q16_scalar_funcs" -> ((s, d) => R.scalarFunctions(T.part(s, d))),
    "q17_pivot_conditional" -> ((s, d) => R.statusByPriority(T.orders(s, d))),
    "q18_event_window" -> ((s, d) => R.eventsPerHour(T.events(s, d))),
    "q19_sessionize" -> ((s, d) => Temporal.sessionize(T.events(s, d))),
    "q20_exact_median" -> ((s, d) => Temporal.exactMedian(T.orders(s, d))),
    "q21_asof_join" -> ((s, d) =>
      Temporal.asofJoin(T.events(s, d), T.orders(s, d))),
    "q24_range_join" -> ((s, d) => Temporal.rangeJoinCount(T.events(s, d))),
    "q35_interval_join" -> ((s, d) =>
      Temporal.intervalOverlapCount(T.events(s, d))),
    "q59_interval_merge" -> ((s, d) =>
      Temporal.coalesceIntervals(T.events(s, d))),
    "q60_ohlc_bars" -> ((s, d) => Temporal.ohlcBars(T.events(s, d))),
    "q62_winsorize" -> ((s, d) => Temporal.winsorize(T.events(s, d))),
    "q63_rolling_anomaly" -> ((s, d) =>
      Temporal.rollingAnomaly(T.events(s, d))),
    // q22 verification harness around the sketch operator: sketch VALUES
    // are engine-specific, so the query surfaces them as within-tolerance
    // booleans against exact twins and the oracle pins the booleans to
    // `true` — a sketch drifting outside its accuracy contract fails the
    // hash check. The harness (exact distinct passes, rank-bound median
    // check) is oracle plumbing, NOT part of the production operator —
    // R.approxStats returns the raw sketch values in one mergeable pass.
    "q22_approx_stats" -> ((s, d) => {
      val joined = T.lineitem(s, d)
        .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), col("l_orderkey"),
          col("l_partkey"), col("o_totalprice"))
      graft.operators.Caching.withPersisted(joined) {
        // the operator pass and its exact twins share one persisted join
        val sk = graft.operators.Caching.materialize(R.approxStatsOf(joined))
        // exact distinct counts via two-level aggregation (dedup pass,
        // then count) — no distinct-expand, partial agg on both levels
        def exactDistinct(c: String, as: String) = joined
          .groupBy(col("o_orderpriority"), col(c)).agg(count(lit(1)))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as(as))
        val eo = exactDistinct("l_orderkey", "eo")
        val ep = exactDistinct("l_partkey", "ep")
        // quantile contract checked by RANK: percentile_approx guarantees
        // rank error ≤ n/accuracy; count rows on each side of the returned
        // value and require the true median rank within 0.005·n (5× the
        // 1/1000-accuracy bound). A plain codegen'd aggregate — a
        // per-group window sort would run one task per group at scale.
        val medCheck = joined
          .join(broadcast(sk.select(col("o_orderpriority"),
            col("approx_median_price").as("am"))), Seq("o_orderpriority"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(when(col("o_totalprice") < col("am"), 1)).as("c_lt"),
            count(when(col("o_totalprice") <= col("am"), 1)).as("c_le"),
            count(lit(1)).as("n"))
          .select(col("o_orderpriority"),
            (col("c_lt") <= col("n") * 0.505 &&
              col("c_le") >= col("n") * 0.495).as("median_rank_ok"))
        // tolerances are 3× each sketch's rsd (default 0.05 → 0.15;
        // explicit 0.01 → 0.03); measured max deviations across
        // sf0.001/0.01/0.1 are 0.107 / 0.009 — ≥39% headroom while still
        // failing on a genuinely broken sketch
        sk.join(eo, Seq("o_orderpriority"))
          .join(ep, Seq("o_orderpriority"))
          .join(medCheck, Seq("o_orderpriority"))
          .select(col("o_orderpriority"), col("n_rows"),
            col("min_price"), col("max_price"),
            (abs(col("approx_orders") - col("eo")) <= col("eo") * 0.15)
              .as("approx_orders_ok"),
            (abs(col("approx_parts") - col("ep")) <= col("ep") * 0.03)
              .as("approx_parts_ok"),
            (col("approx_median_price")
              .between(col("min_price"), col("max_price")) &&
              col("median_rank_ok"))
              .as("approx_median_ok"))
      }
    }),
    // custom LogicalPlan+Strategy+SparkPlan: heap-based per-key top-k
    "q23_topk_custom" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      graft.plans.TopK.perKey(
        T.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice")),
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    }),
    // -- reference pipeline parity ops (SURVEY §2.1-§2.5) --
    "m_safe_json_decode" -> ((s, d) => PipelineOps.safeJsonDecode(T.events(s, d))),
    "m_error_routing" -> ((s, d) => PipelineOps.errorRouting(T.events(s, d))),
    "m_headers_roundtrip" -> ((s, d) =>
      PipelineOps.headersRoundTrip(T.events(s, d), "graft-app")),
    "m_delta_dedup" -> ((s, d) => PipelineOps.deltaDedup(s, T.events(s, d))),
    // -- LLM-data-pipeline ops: text analysis --
    "x1_token_stats" -> ((s, d) => LlmText.tokenStats(T.documents(s, d))),
    "x2_lang_id" -> ((s, d) => LlmText.langId(T.documents(s, d))),
    "x3_quality_score" -> ((s, d) => LlmText.qualityScore(T.documents(s, d))),
    "x4_fingerprint" -> ((s, d) => LlmText.fingerprint(T.documents(s, d))),
    "x5_rolling_fingerprint" -> ((s, d) =>
      LlmText.rollingFingerprint(T.documents(s, d))),
    "x6_text_clean" -> ((s, d) => LlmText.cleanText(T.documents(s, d))),
    "x7_tfidf" -> ((s, d) => LlmText.tfidf(T.documents(s, d))),
    "x8_repetition" -> ((s, d) => LlmText.repetitionSignals(T.documents(s, d))),
    // vocabSize 16 < the corpus's distinct-word count so OOV is exercised
    "x9_vocab_oov" -> ((s, d) => LlmText.vocabOov(T.documents(s, d), 16)),
    "x10_bm25" -> ((s, d) =>
      LlmText.bm25(T.documents(s, d), Seq("data", "query", "fast"))),
    "x17_bigram_lm" -> ((s, d) => LlmText.bigramLm(T.documents(s, d))),
    "x18_gopher_rules" -> ((s, d) => LlmText.gopherRules(T.documents(s, d))),
    "x19_cdc_chunks" -> ((s, d) => LlmText.cdcChunks(T.documents(s, d))),
    "x20_lang_ngram_profile" -> ((s, d) =>
      LlmText.langNgramProfile(T.documents(s, d))),
    "x21_char_entropy" -> ((s, d) => LlmText.charEntropy(T.documents(s, d))),
    "x22_lexical_diversity" -> ((s, d) =>
      LlmText.lexicalDiversity(T.documents(s, d))),
    "x23_source_divergence" -> ((s, d) =>
      LlmText.sourceDivergence(T.documents(s, d))),
    "x24_langid_eval" -> ((s, d) => LlmText.langIdEval(T.documents(s, d))),
    "x29_pmi_collocations" -> ((s, d) =>
      LlmText.pmiCollocations(T.documents(s, d))),
    "x30_novelty" -> ((s, d) => LlmText.noveltyScore(T.documents(s, d))),
    "x33_quality_quantiles" -> ((s, d) =>
      LlmText.qualityQuantiles(T.documents(s, d))),
    "x34_readability" -> ((s, d) => LlmText.readability(T.documents(s, d))),
    // x35: per-source char-class + encoding-sanity (control/U+FFFD) profile
    "x35_charclass_profile" -> ((s, d) =>
      LlmText.charClassProfile(T.documents(s, d))),
    // x36: corpus token mass covered by the top-N vocabulary
    "x36_vocab_coverage" -> ((s, d) =>
      LlmText.vocabCoverage(T.documents(s, d))),
    "x32_code_switch" -> ((s, d) => LlmText.codeSwitch(T.documents(s, d))),
    "x31_vocab_growth" -> ((s, d) =>
      LlmText.vocabGrowth(T.documents(s, d))),
    "x25_bpe_train" -> ((s, d) => LlmText.bpeTrain(T.documents(s, d))),
    "x26_bpe_vocab" -> ((s, d) => LlmText.bpeVocab(T.documents(s, d))),
    "x27_bpe_doc_stats" -> ((s, d) => LlmText.bpeDocStats(T.documents(s, d))),
    // x27 through the MATERIALIZED dictionary path (train-once artifact;
    // ingest never re-runs a merge step). Same oracle SQL as x27 — the
    // physical path differs, the semantics must not.
    "x28_bpe_vs_dict" -> ((s, d) => {
      val docs = T.documents(s, d)
      LlmText.bpeDocStatsVsDict(docs, LlmText.bpeDictionary(docs))
    }),
    "x11_pii_redact" -> ((s, d) => LlmText.piiRedact(T.documents(s, d))),
    "x12_line_filter" -> ((s, d) => LlmText.lineFilter(T.documents(s, d))),
    "x13_char_diversity" -> ((s, d) =>
      LlmText.charDiversity(T.documents(s, d))),
    "x14_url_normalize" -> ((s, d) =>
      LlmText.urlNormalize(T.documents(s, d))),
    // -- LLM-data-pipeline ops: corpus curation --
    "c1_stratified_sample" -> ((s, d) =>
      Curation.stratifiedSample(T.documents(s, d), Map("en" -> 50), 25)),
    "c2_domain_mix" -> ((s, d) => Curation.domainMix(T.documents(s, d))),
    "c3_leakage_split" -> ((s, d) => Curation.leakageSafeSplit(T.documents(s, d))),
    "c4_pack_sequences" -> ((s, d) => Curation.packSequences(T.documents(s, d))),
    "c8_pack_materialize" -> ((s, d) =>
      Curation.materializePacks(T.documents(s, d))),
    "c5_curation_pipeline" -> ((s, d) =>
      Curation.curationPipeline(T.documents(s, d))),
    "c7_group_sample" -> ((s, d) => Curation.groupSample(T.documents(s, d))),
    "c9_chunk_overlap" -> ((s, d) => Curation.chunkOverlap(T.documents(s, d))),
    "c10_temperature_mix" -> ((s, d) =>
      Curation.temperatureMix(T.documents(s, d))),
    "c11_token_budget" -> ((s, d) =>
      Curation.tokenBudgetSelect(T.documents(s, d))),
    "c12_quality_sample" -> ((s, d) =>
      Curation.qualitySample(T.documents(s, d))),
    "c13_source_report" -> ((s, d) =>
      Curation.sourceReport(T.documents(s, d))),
    "c6_decontaminate" -> ((s, d) => {
      val docs = T.documents(s, d)
      Curation.decontaminate(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97)) === 0))
    }),
    "c15_decontaminate_bloom" -> ((s, d) => {
      val docs = T.documents(s, d)
      Curation.decontaminateBloom(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97)) === 0))
    }),
    "c16_shuffle_shard" -> ((s, d) => Curation.shuffleShard(T.documents(s, d))),
    "c17_dsir_resample" -> ((s, d) => {
      val docs = T.documents(s, d)
      Curation.importanceResample(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97)) === 0))
    }),
    "c18_unimax" -> ((s, d) => Curation.unimaxAllocate(T.documents(s, d))),
    "c19_epoch_expand" -> ((s, d) => Curation.epochExpand(T.documents(s, d))),
    "c21_pack_similar" -> ((s, d) =>
      Curation.packBySimilarity(T.documents(s, d), T.embeddings(s, d))),
    "c22_neyman_alloc" -> ((s, d) =>
      Curation.neymanAllocation(T.documents(s, d))),
    "c23_weighted_sample" -> ((s, d) =>
      Curation.weightedSample(T.documents(s, d))),
    "c24_token_temperature" -> ((s, d) =>
      Curation.temperatureMixTokens(T.documents(s, d))),
    "c25_dedup_weighted_mix" -> ((s, d) =>
      Curation.dedupWeightedMix(T.documents(s, d))),
    // snapshot split by doc_id parity: even = accepted corpus, odd = the
    // incoming crawl under review
    "c20_quality_drift" -> ((s, d) => {
      val docs = T.documents(s, d)
      Curation.qualityDrift(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    }),
    // -- skew-handling physical rewrites (oracle = the unsalted SQL) --
    "q25_salted_join" -> ((s, d) =>
      R.saltedSegmentRevenue(T.events(s, d), T.customer(s, d))),
    "q26_salted_distinct" -> ((s, d) => R.saltedDistinctAgg(T.events(s, d))),
    "q27_sliding_window" -> ((s, d) => R.slidingEventCounts(T.events(s, d))),
    "q28_grouping_sets" -> ((s, d) => R.groupingSetsSummary(T.orders(s, d))),
    "q29_scalar_subquery" -> ((s, d) => R.aboveBrandAverage(T.part(s, d))),
    "q30_window_nav" -> ((s, d) => R.windowNavigation(T.orders(s, d))),
    "q44_window_dist" -> ((s, d) => R.windowDistribution(T.orders(s, d))),
    "q45_asof_tolerance" -> ((s, d) =>
      Temporal.asofJoinTolerance(T.events(s, d), T.orders(s, d))),
    "q46_unpivot" -> ((s, d) => R.meltMeasures(T.lineitem(s, d))),
    "q47_percentile_cont" -> ((s, d) =>
      Temporal.groupPercentileCont(T.events(s, d))),
    "q48_gap_fill" -> ((s, d) => Temporal.gapFill(T.events(s, d))),
    "q49_weighted_median" -> ((s, d) => R.weightedMedian(T.lineitem(s, d))),
    "q50_rolling_range" -> ((s, d) => R.rollingRevenue(T.orders(s, d))),
    "q51_streaks" -> ((s, d) => Temporal.activeStreaks(T.events(s, d))),
    "q52_group_mode" -> ((s, d) => R.groupMode(T.orders(s, d))),
    "q53_exists_subquery" -> ((s, d) =>
      R.urgentOnlyCustomers(T.customer(s, d), T.orders(s, d))),
    "q54_ratio_to_report" -> ((s, d) =>
      R.ratioToReport(T.customer(s, d), T.nation(s, d))),
    "d21_fuzzy_title" -> ((s, d) => Dedup.fuzzyTitlePairs(T.documents(s, d))),
    "d22_keep_longest" -> ((s, d) =>
      Dedup.keepBestInCluster(T.documents(s, d))),
    "d23_lsh_curve" -> ((s, _) => Dedup.lshCandidateCurve(s)),
    "d24_sorted_neighborhood" -> ((s, d) =>
      Dedup.sortedNeighborPairs(T.documents(s, d))),
    "d25_lsh_tune" -> ((s, _) => Dedup.lshTune(s)),
    "d26_prefix_filter" -> ((s, d) =>
      Dedup.prefixFilterPairs(T.documents(s, d))),
    // the exact-recall pipeline: ONE prefix-filter pass feeds components
    // and the surviving-corpus apply — d8b's shape with d26's guarantee
    // (every true near-dup pair reaches the component step; no LSH miss)
    "d28_exact_pipeline" -> ((s, d) => {
      val docs = T.documents(s, d)
      val pairs = Dedup.prefixFilterPairs(docs, 0.7)
        .select(col("doc_a"), col("doc_b"))
      val comps = Dedup.connectedComponents(pairs)
        .select(col("doc").as("doc_id"),
          (col("doc") === col("lab")).as("keep"))
      Dedup.dedupApply(docs, comps)
    }),
    "d29_dup_trend" -> ((s, d) => Dedup.dupTrend(T.documents(s, d))),
    "d30_syndication" -> ((s, d) => Dedup.syndication(T.documents(s, d))),
    "d31_cluster_sizes" -> ((s, d) =>
      Dedup.clusterSizeHistogram(T.documents(s, d))),
    "d32_dup_by_source" -> ((s, d) =>
      Dedup.dupBySource(T.documents(s, d))),
    // d33/d34: the CCNet/C4 boilerplate-line family — cross-document
    // repeated lines detected, then removed per doc (detect/apply pair)
    "d33_boilerplate_lines" -> ((s, d) =>
      Dedup.boilerplateLines(T.documents(s, d))),
    "d34_boilerplate_apply" -> ((s, d) =>
      Dedup.boilerplateApply(T.documents(s, d))),
    // d35: MinHash estimate vs exact Jaccard over d2's candidate set.
    "d35_minhash_calibration" -> ((s, d) =>
      Dedup.minhashCalibration(T.documents(s, d))),
    // d36: bottom-k (KMV) distinct-shingle estimate vs exact, per source.
    "d36_cardinality_sketch" -> ((s, d) =>
      Dedup.cardinalitySketch(T.documents(s, d))),
    // c26: c6's contamination verdicts rolled up per source.
    "c26_contamination_report" -> ((s, d) => {
      val docs = T.documents(s, d)
      Curation.contaminationReport(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97)) === 0))
    }),
    // snapshot split by vec_id parity: even = accepted, odd = incoming
    "e15_centroid_drift" -> ((s, d) => {
      val e = T.embeddings(s, d)
      graft.operators.VectorOps.centroidDrift(
        e.filter(pmod(col("vec_id"), lit(2)) === 0),
        e.filter(pmod(col("vec_id"), lit(2)) =!= 0))
    }),
    "d27_prefix_vs_index" -> ((s, d) => {
      val docs = T.documents(s, d)
      Dedup.prefixFilterVsIndex(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        Dedup.prefixFilterIndex(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)))
    }),
    "q55_attribution" -> ((s, d) =>
      Temporal.lastTouchAttribution(T.events(s, d))),
    "q61_linear_attribution" -> ((s, d) =>
      Temporal.linearAttribution(T.events(s, d))),
    "q65_monthly_growth" -> ((s, d) =>
      R.monthlyGrowth(T.orders(s, d))),
    "q64_regional_revenue" -> ((s, d) =>
      R.regionalRevenue(T.lineitem(s, d), T.orders(s, d),
        T.customer(s, d), T.supplier(s, d), T.nation(s, d),
        T.region(s, d))),
    "q56_integrity" -> ((s, d) =>
      R.integrityReport(T.customer(s, d), T.orders(s, d),
        T.lineitem(s, d), T.part(s, d), T.supplier(s, d), T.nation(s, d))),
    "g1_pagerank" -> ((s, d) =>
      Graph.pageRank(T.lineitem(s, d), T.orders(s, d))),
    "g2_label_prop" -> ((s, d) =>
      Graph.labelPropagation(T.lineitem(s, d), T.orders(s, d))),
    // g3: community stats SERVED from the stored label index (g2's labels
    // parquet-round-tripped; LPA is integer-deterministic, so stored ≡
    // inline and the oracle — g2's unrolled chain — is unchanged).
    "g3_community_stats" -> ((s, d) =>
      Graph.communityStats(storedLabelIndex(s, d))),
    // g5: one-mode supplier projection of the purchase graph, hub-capped.
    "g5_copurchase" -> ((s, d) =>
      Graph.coPurchasePairs(T.lineitem(s, d), T.orders(s, d))),
    // g6: the cap's accounting row — what the g5 hub exclusion dropped.
    "g6_copurchase_report" -> ((s, d) =>
      Graph.coPurchaseGovernance(T.lineitem(s, d), T.orders(s, d))),
    "q57_group_mad" -> ((s, d) => Temporal.groupMad(T.events(s, d))),
    "q58_trimmed_mean" -> ((s, d) => R.trimmedMean(T.events(s, d))),
    "q31_latest_upsert" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      R.latestPerKey(T.events(s, d))
    }),
    "q32_histogram" -> ((s, d) => R.valueHistogram(T.events(s, d))),
    "q34_date_funcs" -> ((s, d) => R.dateFunctions(T.orders(s, d))),
    "q33_group_corr" -> ((s, d) => R.groupCorrelation(T.lineitem(s, d))),
    "q36_bloom_join" -> ((s, d) =>
      R.urgentOrderRevenue(T.lineitem(s, d), T.orders(s, d))),
    "q37_snapshot_diff" -> ((s, d) => R.orderSnapshotDiff(T.orders(s, d))),
    "q38_equidepth" -> ((s, d) => R.equiDepthHistogram(T.events(s, d))),
    "q39_funnel" -> ((s, d) => R.conversionFunnel(T.events(s, d))),
    "q41_transitions" -> ((s, d) => Temporal.eventTransitions(T.events(s, d))),
    "q42_retention" -> ((s, d) => Temporal.cohortRetention(T.events(s, d))),
    "q43_group_quantiles" -> ((s, d) => Temporal.groupQuantiles(T.events(s, d))),
    "q40_zorder" -> ((s, d) => {
      import org.apache.spark.sql.functions.hour
      T.events(s, d).select(col("event_id"),
        graft.sources.Sources.zvalue(
          pmod(col("user_id"), lit(1024)), hour(col("ts"))).as("zv"))
    }),
    // -- LLM-data-pipeline ops: deduplication --
    "d1_exact_dedup" -> ((s, d) => Dedup.exactDedup(T.documents(s, d))),
    "d2_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(T.documents(s, d))),
    "d3_simhash" -> ((s, d) => Dedup.simhash(T.documents(s, d))),
    "d4_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(T.documents(s, d))),
    "d5_embed_dedup" -> ((s, d) => Dedup.embeddingDedup(T.embeddings(s, d))),
    "d9_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(T.documents(s, d))),
    "d6_source_sketch" -> ((s, d) => Dedup.sourceSketch(T.documents(s, d))),
    "d11_source_overlap" -> ((s, d) => Dedup.sourceOverlap(T.documents(s, d))),
    "d7_neardup_components" -> ((s, d) =>
      Dedup.nearDupComponents(T.documents(s, d))),
    "d8_dedup_apply" -> ((s, d) => Dedup.dedupApply(T.documents(s, d))),
    // the pipeline form: ONE components pass feeds the apply via the
    // precomputed-decisions overload — the shape a real corpus pipeline
    // uses so dedup, splits, and accounting share a single LSH+CC pass
    "d8b_dedup_pipeline" -> ((s, d) => {
      val docs = T.documents(s, d)
      Dedup.dedupApply(docs, Dedup.nearDupComponents(docs, 0.7))
    }),
    "d10_span_dedup" -> ((s, d) => LlmText.spanDedup(T.documents(s, d))),
    "d18_removable_spans" -> ((s, d) =>
      LlmText.removableSpans(T.documents(s, d))),
    // d13's incremental split applied at span granularity: 10% of docs
    // arrive as the "incoming" side, scored against the index built from
    // the other 90%
    "d19_span_vs_index" -> ((s, d) => {
      val docs = T.documents(s, d)
      LlmText.spanScoreVsIndex(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        LlmText.sharedSpanIndex(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)))
    }),
    // d13 through the MATERIALIZED index path: the stored side is the
    // prebuilt (doc_id, sh, bkeys) table, never re-shingled per call.
    // Same oracle SQL as d13 — the physical path differs, the semantics
    // must not.
    "d20_dedup_vs_index" -> ((s, d) => {
      val docs = T.documents(s, d)
      Dedup.incrementalDedupVsIndex(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        Dedup.nearDupIndex(docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)))
    }),
    "d12_cc_star" -> ((s, d) => Dedup.nearDupComponentsStar(T.documents(s, d))),
    "d13_incremental_dedup" -> ((s, d) => {
      val docs = T.documents(s, d)
      Dedup.incrementalDedup(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0))
    }),
    "c14_semdedup" -> ((s, d) =>
      Dedup.semDedup(T.documents(s, d), T.embeddings(s, d))),
    "d14_url_dedup" -> ((s, d) => Dedup.urlDedup(T.documents(s, d))),
    "d15_containment" -> ((s, d) => Dedup.containment(T.documents(s, d))),
    // per-source dedup accounting + hot-key-cap accounting in ONE query
    // slot (two kinds of rows) — originally folded together after round
    // 7's 133rd registration silently got no driver correctness row; the
    // local gate (Verify's parity check + tools/verify_local.py) covers
    // every registration regardless. Accounting cap=5 (not the production
    // 500) so the hot-key arithmetic is exercised by real data at every SF.
    "d16_dedup_report" -> ((s, d) =>
      Dedup.governanceReport(T.documents(s, d), cap = 5)),
    "x15_feature_hash" -> ((s, d) => LlmText.featureHash(T.documents(s, d))),
    "x16_token_zipf" -> ((s, d) => LlmText.tokenZipf(T.documents(s, d))),
    // -- LLM-data-pipeline ops: similarity search --
    "e1_label_centroids" -> ((s, d) =>
      graft.operators.VectorOps.groupCentroids(T.embeddings(s, d))),
    "e2_int8_quantize" -> ((s, d) =>
      graft.operators.VectorOps.int8Quantize(T.embeddings(s, d))),
    "e11_kmeans_step" -> ((s, d) =>
      graft.operators.VectorOps.kmeansStep(T.embeddings(s, d))),
    "e12_centroid_outliers" -> ((s, d) =>
      graft.operators.VectorOps.centroidOutliers(T.embeddings(s, d))),
    // e17: every embedding projected onto e13's top-2 directions.
    "e17_pc_project" -> ((s, d) =>
      graft.operators.VectorOps.pcProject(T.embeddings(s, d))),
    "e13_top2_power" -> ((s, d) =>
      graft.operators.VectorOps.top2PowerIteration(T.embeddings(s, d))),
    "e14_cluster_quality" -> ((s, d) =>
      graft.operators.VectorOps.clusterQuality(T.embeddings(s, d))),
    "e3_zscore_normalize" -> ((s, d) =>
      graft.operators.VectorOps.zscoreNormalize(T.embeddings(s, d))),
    "e4_random_projection" -> ((s, d) =>
      graft.operators.VectorOps.randomProjection(T.embeddings(s, d))),
    "e5_pq_encode" -> ((s, d) =>
      graft.operators.VectorOps.pqEncode(T.embeddings(s, d))),
    "e6_matryoshka" -> ((s, d) =>
      graft.operators.VectorOps.matryoshkaTruncate(T.embeddings(s, d))),
    "s1_knn_brute" -> ((s, d) => Similarity.knnBruteForce(T.embeddings(s, d))),
    "s11_filtered_knn" -> ((s, d) =>
      Similarity.filteredKnn(T.embeddings(s, d))),
    "s12_mmr_rerank" -> ((s, d) => Similarity.mmrRerank(T.embeddings(s, d))),
    "s2_ann_lsh" -> ((s, d) => Similarity.annLsh(T.embeddings(s, d))),
    "s3_ann_ivf" -> ((s, d) => Similarity.annIvf(T.embeddings(s, d))),
    "s4_range_search" -> ((s, d) => Similarity.rangeSearch(T.embeddings(s, d))),
    "s5_hybrid_rrf" -> ((s, d) =>
      Similarity.hybridRrf(T.documents(s, d), T.embeddings(s, d))),
    "s6_ann_tiered" -> ((s, d) => Similarity.annTiered(T.embeddings(s, d))),
    "s7_ann_hamming" -> ((s, d) => Similarity.hammingAnn(T.embeddings(s, d))),
    "s8_ann_pq_adc" -> ((s, d) => Similarity.pqAdcAnn(T.embeddings(s, d))),
    "s13_ivf_adc" -> ((s, d) => Similarity.ivfAdcAnn(T.embeddings(s, d))),
    // s13 through the MATERIALIZED index path (stored centroid/cell/code/
    // codebook tables; search runs zero training). Same oracle SQL as s13.
    "s14_ivf_adc_vs_index" -> ((s, d) =>
      Similarity.ivfAdcVsIndex(T.embeddings(s, d), storedIvfIndex(s, d))),
    // s15: the index LIFECYCLE path — build on the vec_id % 7 != 3 split,
    // ivfAdcAppend the held-out arrivals (quantizers frozen: assignment
    // and codes only), then search the full corpus. The oracle is s13's
    // SQL with its quantizer-TRAINING CTEs restricted to the same split
    // (see restrictTrainingToStoredSplit); everything downstream of
    // training — cell assignment, codes, probes, ADC, re-rank — runs
    // full-corpus on both sides, because append-with-frozen-quantizers
    // assigns arrivals exactly as a build over the union would.
    "s15_append_vs_rebuild" -> ((s, d) => {
      val em = T.embeddings(s, d)
      val stored = em.filter(pmod(col("vec_id"), lit(7)) =!= 3)
      val arriving = em.filter(pmod(col("vec_id"), lit(7)) === 3)
      val idx = Similarity.ivfAdcAppend(arriving,
        Similarity.ivfAdcIndex(stored))
      Similarity.ivfAdcVsIndex(em, idx)
    }),
    // s16: range search (all neighbors above the s4 threshold) served
    // from the stored IVF index's probed cells — the "all sufficiently
    // close" serving form next to s14's top-k.
    "s16_range_vs_index" -> ((s, d) =>
      Similarity.ivfRangeVsIndex(T.embeddings(s, d), storedIvfIndex(s, d))),
    // s17: per-query recall of the served range search vs the exact one —
    // the probe-coverage gauge for retuning NProbe. Gauges the SAME
    // stored index s16 serves from (the rangeRecall index overload).
    "s17_range_recall" -> ((s, d) =>
      Similarity.rangeRecall(T.embeddings(s, d), storedIvfIndex(s, d),
        minCos = 0.3)),
    // s18: ADC-vs-exact quantization error over s13's candidate set,
    // gauged against the STORED index (zero retraining; s14 pins
    // stored ≡ inline, so s13's derived oracle is unchanged).
    "s18_adc_error" -> ((s, d) =>
      Similarity.adcErrorStats(T.embeddings(s, d), storedIvfIndex(s, d),
        probeK = 30)),
    // s19: per-query probed-cell candidate fanout (serving-cost gauge)
    // against the stored index's centroids/cells.
    "s19_probe_fanout" -> ((s, d) =>
      Similarity.probeFanout(T.embeddings(s, d), storedIvfIndex(s, d))),
    // s20: cell-balance summary over the stored index's cell table.
    "s20_cell_balance" -> ((s, d) =>
      Similarity.cellBalance(storedIvfIndex(s, d))),
    // s21: s18's error split per PQ subspace — which codebook is lossy.
    "s21_adc_error_subspace" -> ((s, d) =>
      Similarity.adcErrorBySubspace(T.embeddings(s, d),
        storedIvfIndex(s, d))),
    "s9_ann_recall" -> ((s, d) => Similarity.annRecall(T.embeddings(s, d))),
    "s10_hard_negatives" -> ((s, d) =>
      Similarity.hardNegatives(T.embeddings(s, d))),
    "e7_binary_quantize" -> ((s, d) =>
      graft.operators.VectorOps.binaryQuantize(T.embeddings(s, d))),
    "e8_gram_matrix" -> ((s, d) =>
      graft.operators.VectorOps.gramMatrix(T.embeddings(s, d))),
    "e16_dim_stats" -> ((s, d) =>
      graft.operators.VectorOps.dimStats(T.embeddings(s, d))),
    "e9_pc1_power" -> ((s, d) =>
      graft.operators.VectorOps.pc1PowerIteration(T.embeddings(s, d))),
    "e10_remove_pc1" -> ((s, d) =>
      graft.operators.VectorOps.removeTopComponent(T.embeddings(s, d))),
    // -- LLM-data-pipeline ops: multimodal columns --
    "mm1_media_features" -> ((s, d) =>
      Multimodal.mediaFeatures(T.documents(s, d))),
    "mm2_decoded_features" -> ((s, d) =>
      Multimodal.decodedFeatures(T.documents(s, d))),
    "mm3_patch_extract" -> ((s, d) =>
      Multimodal.patchExtract(T.documents(s, d))),
    "mm4_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(T.documents(s, d))),
    "mm5_resize" -> ((s, d) => Multimodal.resizeThumbs(T.documents(s, d))),
    "mm6_phash_pairs" -> ((s, d) => Multimodal.phashPairs(T.documents(s, d))),
    // mm9: the stored-signature path — index built on the doc_id % 10 != 0
    // split, the % 10 == 0 ingest probed against it (d13/d27's split
    // convention for the vs-index family).
    "mm9_phash_vs_index" -> ((s, d) => {
      val docs = T.documents(s, d)
      val idx = Multimodal.phashIndex(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0))
      Multimodal.phashVsIndex(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0), idx)
    }),
    "mm7_frame_energy" -> ((s, d) =>
      Multimodal.frameEnergy(T.documents(s, d))),
    // mm11: per-format participation rate in mm6's near-dup pairs.
    "mm11_format_dup_rate" -> ((s, d) =>
      Multimodal.formatDupRate(T.documents(s, d))),
    // mm12: duplicate patch tiles across documents (mm3's patches grouped
    // by content hash, kept where >= 2 distinct docs share the bytes).
    "mm12_dup_patches" -> ((s, d) =>
      Multimodal.duplicatePatches(T.documents(s, d))),
    // g4: community boundary nodes SERVED from the stored label index.
    "g4_bridge_nodes" -> ((s, d) =>
      Graph.bridgeNodes(storedLabelIndex(s, d))),
    "mm8_media_mix" -> ((s, d) => Multimodal.mediaMix(T.documents(s, d))),
    "mm10_silence_report" -> ((s, d) =>
      Multimodal.silenceReport(T.documents(s, d))),
  )

  /** DuckDB twins. Arithmetic rules for exact comparison: double measures are
    * accumulated as DECIMAL(38,6) then surfaced as DOUBLE (order-independent,
    * identical on both engines); averages divide the exact decimal sum by the
    * count in double; timestamps surface as epoch seconds or DATE.
    */
  def oracleSql: Map[String, String] = oracleSqlBase +
    // d8b is the pipeline-form twin of d8 (precomputed-components overload);
    // both must be bit-identical to the same SQL.
    ("d8b_dedup_pipeline" -> oracleSqlBase("d8_dedup_apply")) +
    // d20 is d13 through the materialized-index path; same SQL.
    ("d20_dedup_vs_index" -> oracleSqlBase("d13_incremental_dedup")) +
    // x28 is x27 through the materialized-dictionary path; same SQL.
    ("x28_bpe_vs_dict" -> oracleSqlBase("x27_bpe_doc_stats")) +
    // s14 is s13 through the materialized-index path; same SQL.
    ("s14_ivf_adc_vs_index" -> oracleSqlBase("s13_ivf_adc")) +
    // s15 is s13 with the quantizers trained on the stored split only.
    ("s15_append_vs_rebuild" ->
      restrictTrainingToStoredSplit(oracleSqlBase("s13_ivf_adc"))) +
    // s16 is s13's coarse chain with an exact-cosine threshold instead of
    // the PQ/top-k tail.
    ("s16_range_vs_index" ->
      coarseRangeOracle(oracleSqlBase("s13_ivf_adc"))) +
    // g3 is g2's unrolled label chain + per-community mass aggregation.
    ("g3_community_stats" ->
      communityStatsOracle(oracleSqlBase("g2_label_prop"))) +
    // s17 is s16's chain + the exact range side + a per-query recall agg.
    ("s17_range_recall" ->
      rangeRecallOracle(
        coarseRangeOracle(oracleSqlBase("s13_ivf_adc")))) +
    // d31 is d7's recursive-CC chain + the size histogram.
    ("d31_cluster_sizes" ->
      clusterSizesOracle(oracleSqlBase("d7_neardup_components"))) +
    // mm10 is mm7's frame chain + the per-media silence aggregate.
    ("mm10_silence_report" ->
      silenceReportOracle(oracleSqlBase("mm7_frame_energy"))) +
    // mm11 is mm6's pair chain + the per-format participation aggregate.
    ("mm11_format_dup_rate" ->
      formatDupRateOracle(oracleSqlBase("mm6_phash_pairs"))) +
    // mm12 is mm3's patch chain + the cross-doc duplicate aggregate.
    ("mm12_dup_patches" ->
      duplicatePatchesOracle(oracleSqlBase("mm3_patch_extract"))) +
    // g4 is g2's unrolled label chain + the per-node boundary aggregate.
    ("g4_bridge_nodes" ->
      bridgeNodesOracle(oracleSqlBase("g2_label_prop"))) +
    // s18 is s13's chain through adc + the exact-grid error aggregate.
    ("s18_adc_error" -> adcErrorOracle(oracleSqlBase("s13_ivf_adc"))) +
    // s19 is s13's coarse chain through ccand + the per-query count.
    ("s19_probe_fanout" ->
      probeFanoutOracle(oracleSqlBase("s13_ivf_adc"))) +
    // s20 is s13's chain through asg + the cell-population summary.
    ("s20_cell_balance" ->
      cellBalanceOracle(oracleSqlBase("s13_ivf_adc"))) +
    // s21 is s18's candidate set with the error split per PQ subspace.
    ("s21_adc_error_subspace" ->
      adcErrorBySubspaceOracle(oracleSqlBase("s13_ivf_adc"))) +
    // e17 is e13's recursive power-iteration chain + the per-vector
    // in-order projection onto both final iterates.
    ("e17_pc_project" -> pcProjectOracle(oracleSqlBase("e13_top2_power"))) +
    // d35 is d2's signature/band/candidate chain + the estimator-vs-exact
    // comparison (no jaccard threshold).
    ("d35_minhash_calibration" ->
      minhashCalibrationOracle(oracleSqlBase("d2_minhash_lsh"))) +
    // c26 is c6's overlap chain + the per-source rollup.
    ("c26_contamination_report" ->
      contaminationReportOracle(oracleSqlBase("c6_decontaminate")))

  /** Derive the d35 oracle from d2's: keep the shingle/minhash/band/
    * candidate CTEs byte-identical, drop the jaccard threshold, and set
    * the estimate (matching components / 12) next to the exact value. */
  private def minhashCalibrationOracle(d2: String): String = {
    val anchor = "jac AS (SELECT doc_a, doc_b,\n" +
      "  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)\n" +
      "    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard\n" +
      "  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b)\n" +
      "SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.7"
    require(d2.endsWith(anchor), "d2 oracle SQL lost the d35 anchor")
    d2.dropRight(anchor.length) +
      """jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |est AS (SELECT c.doc_a, c.doc_b,
        |  CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE) / 12
        |    AS est_jaccard
        |  FROM cand c JOIN mh a ON a.doc_id = c.doc_a
        |    JOIN mh b ON b.doc_id = c.doc_b AND b.k = a.k
        |  GROUP BY 1, 2)
        |SELECT j.doc_a, j.doc_b, e.est_jaccard,
        |  j.jaccard AS exact_jaccard,
        |  abs(e.est_jaccard - j.jaccard) AS abs_err
        |FROM jac j JOIN est e
        |  ON e.doc_a = j.doc_a AND e.doc_b = j.doc_b""".stripMargin
  }

  /** Derive the c26 oracle from c6's: keep the shingle-overlap chain and
    * swap the per-doc verdict projection for the per-source rollup. */
  private def contaminationReportOracle(c6: String): String = {
    val anchor = "SELECT d.doc_id, d.source,\n" +
      "  COALESCE(ov.shared, 0) AS n_shared,\n" +
      "  COALESCE(ov.shared, 0) >= 3 AS contaminated\n" +
      "FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id\n" +
      "WHERE d.doc_id % 97 <> 0"
    require(c6.endsWith(anchor), "c6 oracle SQL lost the c26 anchor")
    c6.dropRight(anchor.length) +
      """SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN COALESCE(ov.shared, 0) >= 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_contaminated,
        |  CAST(SUM(CASE WHEN COALESCE(ov.shared, 0) >= 3 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS contamination_rate
        |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
        |WHERE d.doc_id % 97 <> 0
        |GROUP BY d.source""".stripMargin
  }

  /** Derive the e17 oracle from e13's: keep the recursive chain and swap
    * the loading dump for the per-vector projection onto the two final
    * iterates (lists re-assembled in dim order; in-order dot — the e10
    * parity shape). */
  private def pcProjectOracle(e13: String): String = {
    val anchor = "SELECT 1 AS component, CAST(d AS INT) AS dim, vv AS loading,\n" +
      "  lam AS eigenvalue FROM pw WHERE it = 24\n" +
      "UNION ALL\n" +
      "SELECT 2, CAST(d AS INT), vv, lam FROM pw2 WHERE it = 24"
    require(e13.endsWith(anchor), "e13 oracle SQL lost the e17 anchor")
    e13.dropRight(anchor.length) +
      """SELECT vec_id,
        |  list_reduce(list_transform(range(1,65), i -> x[i] * v1[i]),
        |    (a,b) -> a + b) AS pc1_score,
        |  list_reduce(list_transform(range(1,65), i -> x[i] * v2[i]),
        |    (a,b) -> a + b) AS pc2_score
        |FROM (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)
        |CROSS JOIN (SELECT list(vv ORDER BY d) AS v1 FROM pw WHERE it = 24)
        |CROSS JOIN (SELECT list(vv ORDER BY d) AS v2 FROM pw2 WHERE it = 24)""".stripMargin
  }

  /** Derive the s18 oracle from s13's: keep every CTE through `adc`
    * byte-identical, widen the top-30 candidate CTE to carry adc_d2,
    * join both pair sides back to the subspace slices for the exact
    * grid distance, and aggregate the per-query error stats. */
  private def adcErrorOracle(s13: String): String = {
    val anchor = "cand AS (SELECT query_id, neighbor_id FROM ("
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the cand anchor for s18")
    s13.substring(0, i) +
      """cand AS (SELECT query_id, neighbor_id, adc_d2 FROM (
        |  SELECT query_id, neighbor_id, adc_d2,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_d2, neighbor_id) AS r
        |  FROM adc) WHERE r <= 30),
        |exd AS (SELECT cd.query_id, cd.neighbor_id, cd.adc_d2,
        |  CAST(CAST(SUM(CAST(round(list_reduce(list_transform(range(1, 17),
        |    i -> (q.sx[i] - c.sx[i]) * (q.sx[i] - c.sx[i])), (a, b) -> a + b)
        |    * 1.0e9) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0e9 AS exact_d2
        |  FROM cand cd JOIN sub q ON q.vec_id = cd.query_id
        |    JOIN sub c ON c.vec_id = cd.neighbor_id AND c.s = q.s
        |  GROUP BY 1, 2, 3)
        |SELECT query_id, CAST(count(*) AS BIGINT) AS n_cands,
        |  CAST(SUM(CAST(round(abs(adc_d2 - exact_d2) * 1.0e9) AS BIGINT))
        |    AS DOUBLE) / (count(*) * 1.0e9) AS mean_abs_err,
        |  max(abs(adc_d2 - exact_d2)) AS max_abs_err
        |FROM exd GROUP BY query_id""".stripMargin
  }

  /** Derive the s21 oracle from s13's: keep every CTE through `cand`
    * byte-identical (same top-30 candidate set as s18), then compare the
    * per-subspace LUT grid term (plut, via the neighbor's stored pasg
    * code — exactly the longs the adc CTE sums) against the exact grid
    * term of the real subvectors, aggregated per subspace. */
  private def adcErrorBySubspaceOracle(s13: String): String = {
    val anchor = "fx AS (SELECT cand.query_id, cand.neighbor_id,"
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the fx anchor for s21")
    s13.substring(0, i) +
      """sxe AS (SELECT pa.s,
        |  abs(l.g2 - CAST(round(list_reduce(list_transform(range(1, 17),
        |    i -> (q.sx[i] - n.sx[i]) * (q.sx[i] - n.sx[i])), (a, b) -> a + b)
        |    * 1.0e9) AS BIGINT)) AS err_g
        |  FROM cand cd
        |    JOIN pasg pa ON pa.vec_id = cd.neighbor_id
        |    JOIN plut l ON l.query_id = cd.query_id AND l.s = pa.s
        |      AND l.code = pa.code
        |    JOIN sub q ON q.vec_id = cd.query_id AND q.s = pa.s
        |    JOIN sub n ON n.vec_id = cd.neighbor_id AND n.s = pa.s)
        |SELECT CAST(s AS INT) AS s, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(err_g) AS DOUBLE) / (count(*) * 1.0e9) AS mean_abs_err,
        |  CAST(max(err_g) AS DOUBLE) / 1.0e9 AS max_abs_err
        |FROM sxe GROUP BY s""".stripMargin
  }

  /** Derive the s20 oracle from s13's: cut after the full-corpus `asg`
    * CTE (the probes anchor) and aggregate per-cell populations into the
    * one-row balance summary. Every aggregate is an exact integer; only
    * the final mean and imbalance divide, in the same left-assoc IEEE
    * expression tree on both engines. */
  private def cellBalanceOracle(s13: String): String = {
    val anchor = "probes AS (SELECT vec_id AS query_id"
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the asg anchor for s20")
    s13.substring(0, i) +
      """cells AS (SELECT cent_id, count(*) AS n FROM asg GROUP BY cent_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(n) AS BIGINT) AS n_vecs,
        |  CAST(min(n) AS BIGINT) AS min_cell,
        |  CAST(max(n) AS BIGINT) AS max_cell,
        |  CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) / count(*) AS mean_cell,
        |  CAST(count(*) AS DOUBLE) * CAST(CAST(sum(n * n) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT) AS DOUBLE)
        |    AS imbalance
        |FROM cells""".stripMargin
  }

  /** Derive the s19 oracle from s13's: cut after the ccand CTE (the
    * FIRST "GROUP BY 1, 2)" — the coarseRangeOracle anchor) and count
    * candidates per query. */
  private def probeFanoutOracle(s13: String): String = {
    val anchor = "GROUP BY 1, 2)"
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the ccand anchor for s19")
    s13.substring(0, i + anchor.length) +
      "\nSELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates" +
      "\nFROM ccand GROUP BY query_id"
  }

  /** Derive the mm11 oracle from mm6's: keep the signature/band/candidate
    * chain byte-identical, lift the verified pairs into a CTE, and swap
    * the projection for the per-format participation aggregate. */
  private def formatDupRateOracle(mm6: String): String = {
    val anchor = "SELECT doc_a, doc_b, bit_count(xor(pa, pb)) AS hamming\n" +
      "FROM cand WHERE bit_count(xor(pa, pb)) <= 6"
    require(mm6.endsWith(anchor), "mm6 oracle SQL lost the mm11 anchor")
    // the dropped text leaves the CTE list ending at "...cand AS (...)\n";
    // the appended chain must re-open it with a comma
    mm6.dropRight(anchor.length).stripSuffix("\n") + ",\n" +
      """pairs AS (SELECT doc_a, doc_b FROM cand
        |  WHERE bit_count(xor(pa, pb)) <= 6),
        |dup AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM pairs
        |  UNION ALL SELECT doc_b AS doc_id FROM pairs)),
        |fm AS (SELECT doc_id,
        |  ['png','jpeg','wav','mp4'][CAST(doc_id % 4 + 1 AS INT)]
        |    AS format FROM documents)
        |SELECT format, CAST(count(*) AS BIGINT) AS n_media,
        |  CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dup_media,
        |  CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS dup_rate
        |FROM fm LEFT JOIN dup d ON fm.doc_id = d.doc_id
        |GROUP BY format""".stripMargin
  }

  /** Derive the mm12 oracle from mm3's: keep the hex-dump patch chain
    * byte-identical and swap the per-patch projection for the
    * cross-document duplicate aggregate. */
  private def duplicatePatchesOracle(mm3: String): String = {
    val anchor = "SELECT doc_id, patch_idx,\n" +
      "  CAST(length(ph) // 2 AS BIGINT) AS patch_len,\n" +
      "  md5(ph) AS patch_md5,\n" +
      "  CAST((strpos('0123456789ABCDEF', substr(ph, 1, 1)) - 1) * 16\n" +
      "    + (strpos('0123456789ABCDEF', substr(ph, 2, 1)) - 1) AS INT)\n" +
      "    AS first_byte\nFROM e"
    require(mm3.endsWith(anchor), "mm3 oracle SQL lost the mm12 anchor")
    mm3.dropRight(anchor.length) +
      """SELECT md5(ph) AS patch_md5,
        |  CAST(length(ph) // 2 AS BIGINT) AS patch_len,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_patches
        |FROM e GROUP BY md5(ph), length(ph)
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin
  }

  /** Derive the g4 oracle from g2's: keep the unrolled LPA chain and swap
    * the final projection for the per-node boundary aggregate (distinct
    * neighbor labels, external edge mass, bridge verdict). */
  private def bridgeNodesOracle(g2: String): String = {
    val anchor = "SELECT node, lab AS label FROM l3"
    require(g2.contains(anchor), "g2 oracle SQL lost the g4 anchor")
    g2.replace(anchor,
      """SELECT ls.node, ls.lab AS label,
        |  CAST(count(DISTINCT ld.lab) AS BIGINT) AS n_neighbor_labels,
        |  CAST(SUM(e.w) AS BIGINT) AS w_total,
        |  CAST(SUM(CASE WHEN ld.lab <> ls.lab THEN e.w ELSE 0 END)
        |    AS BIGINT) AS w_external,
        |  CAST(SUM(CASE WHEN ld.lab <> ls.lab THEN e.w ELSE 0 END)
        |    AS DOUBLE) / CAST(SUM(e.w) AS DOUBLE) AS external_frac,
        |  count(DISTINCT ld.lab) >= 2 AS is_bridge
        |FROM e JOIN l3 ls ON e.src = ls.node
        |       JOIN l3 ld ON e.dst = ld.node
        |GROUP BY ls.node, ls.lab""".stripMargin)
  }

  /** Derive the mm10 oracle from mm7's: keep the byte→frame→energy chain
    * byte-identical and swap the per-frame projection for the per-media
    * quiet-fraction aggregate (floor 30.0, blank at ≥ 0.9). */
  private def silenceReportOracle(mm7: String): String = {
    val anchor = "SELECT media_id, frame_idx, n_samples, energy,\n" +
      "  sqrt(CAST(energy AS DOUBLE) / n_samples) AS rms\nFROM fr"
    require(mm7.endsWith(anchor), "mm7 oracle SQL lost the mm10 anchor")
    mm7.dropRight(anchor.length) +
      """SELECT media_id,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN sqrt(CAST(energy AS DOUBLE) / n_samples)
        |      < CAST(30.0 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_quiet,
        |  CAST(SUM(CASE WHEN sqrt(CAST(energy AS DOUBLE) / n_samples)
        |      < CAST(30.0 AS DOUBLE) THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS quiet_frac,
        |  CAST(SUM(CASE WHEN sqrt(CAST(energy AS DOUBLE) / n_samples)
        |      < CAST(30.0 AS DOUBLE) THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) >= CAST(0.9 AS DOUBLE) AS is_blank
        |FROM fr GROUP BY media_id""".stripMargin
  }

  /** Derive the d31 oracle from d7's: keep the LSH + recursive-reach chain
    * byte-identical and swap the per-doc projection for the size
    * histogram. */
  private def clusterSizesOracle(d7: String): String = {
    val anchor = "SELECT doc AS doc_id, min(lab) AS cluster_rep,\n" +
      "  doc = min(lab) AS keep\nFROM reach GROUP BY doc"
    require(d7.endsWith(anchor), "d7 oracle SQL lost the d31 anchor")
    d7.dropRight(anchor.length) +
      """SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        |FROM (SELECT rep, CAST(count(*) AS BIGINT) AS cluster_size
        |      FROM (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc)
        |      GROUP BY rep)
        |GROUP BY cluster_size""".stripMargin
  }

  /** Derive the s17 oracle from s16's: the served set becomes a CTE, the
    * exact above-threshold set is the s4 scan over the SAME `v` CTE, and
    * the result is the per-query left-join recall aggregate (queries
    * with no exact neighbor drop out — no 0/0 rows, matching the Spark
    * side's inner-exact shape). */
  private def rangeRecallOracle(s16: String): String = {
    val anchor = "SELECT query_id, neighbor_id, cos FROM fx\n" +
      "WHERE cos >= CAST(0.3 AS DOUBLE)"
    require(s16.endsWith(anchor), "s16 oracle SQL lost the s17 anchor")
    s16.dropRight(anchor.length) +
      """, served AS (SELECT query_id, neighbor_id FROM fx
        |  WHERE cos >= CAST(0.3 AS DOUBLE)),
        |ex AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        |  FROM v q JOIN v c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id % 100 = 0),
        |exh AS (SELECT query_id, neighbor_id FROM ex
        |  WHERE cos >= CAST(0.3 AS DOUBLE))
        |SELECT e.query_id,
        |  CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
        |FROM exh e LEFT JOIN served s
        |  ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
        |GROUP BY e.query_id""".stripMargin
  }

  /** Derive the g3 oracle from g2's: keep the whole unrolled LPA chain
    * (byte-identical CTEs) and swap the final projection for the
    * per-community node/edge-mass aggregate. */
  private def communityStatsOracle(g2: String): String = {
    val anchor = "SELECT node, lab AS label FROM l3"
    require(g2.contains(anchor), "g2 oracle SQL lost the g3 anchor")
    g2.replace(anchor,
      """SELECT nn2.lab AS label, nn2.n_nodes, ew.internal_w,
        |  ew.incident_w,
        |  CAST(ew.internal_w AS DOUBLE) / CAST(ew.incident_w AS DOUBLE)
        |    AS internal_frac
        |FROM (SELECT lab, CAST(count(*) AS BIGINT) AS n_nodes
        |      FROM l3 GROUP BY lab) nn2
        |JOIN (SELECT ls.lab,
        |        CAST(SUM(e.w) AS BIGINT) AS incident_w,
        |        CAST(SUM(CASE WHEN ld.lab = ls.lab THEN e.w ELSE 0 END)
        |          AS BIGINT) AS internal_w
        |      FROM e JOIN l3 ls ON e.src = ls.node
        |             JOIN l3 ld ON e.dst = ld.node
        |      GROUP BY ls.lab) ew ON ew.lab = nn2.lab""".stripMargin)
  }

  /** Derive the s16 oracle from s13's: keep the coarse-quantizer chain
    * through `ccand` (training, assignment, probes, self-excluded cell
    * candidates — byte-identical CTEs, so the two oracles cannot drift),
    * drop the PQ/ADC/top-k tail, and score candidates with the exact
    * cosine against the s4 threshold. The ccand CTE is the FIRST
    * "GROUP BY 1, 2)" in the s13 text (the adc CTE's is later). */
  private def coarseRangeOracle(s13: String): String = {
    val anchor = "GROUP BY 1, 2)"
    val i = s13.indexOf(anchor)
    require(i >= 0, "s13 oracle SQL lost the ccand anchor for s16")
    s13.substring(0, i + anchor.length) + """,
fx AS (SELECT cc.query_id, cc.neighbor_id,
  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
 FROM ccand cc JOIN v q ON q.vec_id = cc.query_id
           JOIN v c ON c.vec_id = cc.neighbor_id)
SELECT query_id, neighbor_id, cos FROM fx
WHERE cos >= CAST(0.3 AS DOUBLE)"""
  }

  /** Derive the s15 oracle from s13's: restrict the four quantizer-TRAINING
    * surfaces (k-means sample, k-means seeds, PQ codebook seeds, PQ
    * one-Lloyd-step members) to the stored split `vec_id % 7 <> 3`, leaving
    * every post-training CTE (full-corpus assignment, probes, ADC, re-rank)
    * untouched — exactly what ivfAdcIndex-on-split + ivfAdcAppend computes.
    * Deriving instead of copying keeps the two oracles in lockstep; each
    * replace REQUIRES its anchor so a future edit to the s13 SQL cannot
    * silently detach this one. */
  private def restrictTrainingToStoredSplit(s13: String): String = {
    val edits = Seq(
      // k-means training sample (samp CTE)
      "WHERE vec_id % 5 = 0" ->
        "WHERE vec_id % 5 = 0 AND vec_id % 7 <> 3",
      // k-means seeds (c0 CTE)
      "WHERE vec_id % 50 = 0" ->
        "WHERE vec_id % 50 = 0 AND vec_id % 7 <> 3",
      // PQ codebook seeds (seeds CTE)
      "WHERE vec_id % 61 = 0 AND vec_id < 61 * 256" ->
        "WHERE vec_id % 61 = 0 AND vec_id % 7 <> 3 AND vec_id < 61 * 256",
      // PQ one-Lloyd-step members (pd0 CTE feeding pa0/pm1)
      "FROM sub u JOIN seeds se ON u.s = se.s)" ->
        "FROM sub u JOIN seeds se ON u.s = se.s WHERE u.vec_id % 7 <> 3)")
    edits.foldLeft(s13) { case (sql, (anchor, repl)) =>
      require(sql.contains(anchor),
        s"s13 oracle SQL lost the s15 anchor: $anchor")
      sql.replace(anchor, repl)
    }
  }

  /** Unrolled BPE merge-step CTE chain shared by the x25/x26/x27 oracles:
    * w0 is the char-split word-count table (end-of-word marker appended),
    * then per step i: overlapping adjacent-pair counts (pi), the argmax
    * pair with deterministic tie-break (bi), and the 3-pass space-padded
    * replace rewrite (wi) — the exact arithmetic of
    * `LlmText.bpeTrainState`, unrolled because the per-step argmax makes
    * a recursive CTE reference its own table twice. */
  private def bpeCtes(n: Int): String = {
    val steps = (1 to n).map { i =>
      s"""p$i AS (SELECT ss[k] AS lhs, ss[k+1] AS rhs,
         |    CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, string_split(sym,' ') AS ss FROM w${i - 1}) t$i,
         |       UNNEST(range(1, len(ss))) AS u$i(k)
         |  GROUP BY 1, 2),
         |b$i AS (SELECT lhs, rhs, c FROM p$i ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w$i AS (SELECT w, cnt, trim(replace(replace(replace(' '||sym||' ',
         |    ' '||lhs||' '||rhs||' ', ' '||lhs||rhs||' '),
         |    ' '||lhs||' '||rhs||' ', ' '||lhs||rhs||' '),
         |    ' '||lhs||' '||rhs||' ', ' '||lhs||rhs||' ')) AS sym
         |  FROM w${i - 1} CROSS JOIN b$i)""".stripMargin
    }
    s"""WITH w0 AS (
       |  SELECT w, cnt,
       |    trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' </w>' AS sym
       |  FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |     SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) q
       |     WHERE len(w) > 0 GROUP BY w) wc
       |),
       |${steps.mkString(",\n")}""".stripMargin
  }

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_broadcast" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q3_join_topn" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q6_outer_join_agg" ->
      """SELECT n_nationkey, n_name,
        |  COUNT(c_custkey) AS n_customers,
        |  CAST(SUM(CAST(COALESCE(c_acctbal, 0.0) AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name""".stripMargin,
    "q7_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,
    "q8_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  row_number() OVER w AS order_seq,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS cum_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q9_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q10_set_union" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin,
    "q11_set_intersect" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin,
    "q12_set_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin,
    "q13_distinct_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q14_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q15_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q16_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  length(p_name) AS name_len,
        |  substring(p_name, 1, 4) AS name_pfx,
        |  p_brand || '/' || p_type AS brand_type,
        |  regexp_replace(p_name, 'widget', 'gizmo', 'g') AS name_sub,
        |  p_size % 7 AS size_mod,
        |  CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS price_up,
        |  CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class
        |FROM part""".stripMargin,
    "q17_pivot_conditional" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q18_event_window" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS win_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q19_sessionize" ->
      """WITH b AS (SELECT user_id, event_id, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |f AS (SELECT user_id, event_id, ts, sec,
        |  CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |       THEN 1 ELSE 0 END AS is_new
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_id, sec,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(sec) AS session_start, max(sec) AS session_end
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    // Running-max gaps-and-islands on epoch-microsecond longs; touching
    // intervals merge (start == running max end is NOT a new island).
    "q59_interval_merge" ->
      """WITH iv AS (SELECT user_id, event_id,
        |    epoch_us(ts) AS start_us,
        |    epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 AS end_us
        |  FROM events),
        |m AS (SELECT user_id, event_id, start_us, end_us,
        |  max(end_us) OVER (PARTITION BY user_id
        |    ORDER BY start_us, end_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv),
        |f AS (SELECT *, CASE WHEN prev_max IS NULL OR start_us > prev_max
        |    THEN 1 ELSE 0 END AS is_new FROM m),
        |s AS (SELECT user_id, start_us, end_us,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY start_us, end_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS island
        |  FROM f)
        |SELECT user_id, island, count(*) AS n_events,
        |  min(start_us) AS span_start_us, max(end_us) AS span_end_us
        |FROM s GROUP BY user_id, island""".stripMargin,
    "q61_linear_attribution" ->
      """WITH b AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    event_id, event_type, value FROM events),
        |c AS (SELECT user_id, t AS ct, event_id AS click_id FROM b
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, t AS pt, event_id AS purchase_id, value
        |  FROM b WHERE event_type = 'purchase'),
        |j AS (SELECT p.purchase_id, p.user_id, c.click_id,
        |    p.pt - c.ct AS lag_sec, p.value
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.ct <= p.pt AND p.pt - c.ct <= 604800),
        |n AS (SELECT *, CAST(count(*) OVER (PARTITION BY purchase_id)
        |    AS BIGINT) AS n_touches FROM j)
        |SELECT purchase_id, user_id, click_id, lag_sec, n_touches,
        |  CAST(1.0 AS DOUBLE) / n_touches AS credit,
        |  value / n_touches AS value_credit
        |FROM n""".stripMargin,
    "q60_ohlc_bars" ->
      """WITH r AS (SELECT user_id, CAST(ts AS DATE) AS day, value,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS cnt
        |  FROM events)
        |SELECT user_id, day,
        |  max(CASE WHEN rn = 1 THEN value END) AS open,
        |  max(value) AS high,
        |  min(value) AS low,
        |  max(CASE WHEN rn = cnt THEN value END) AS close,
        |  count(*) AS n_events
        |FROM r GROUP BY user_id, day""".stripMargin,
    "q20_exact_median" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |  FROM orders)
        |SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS median_price,
        |  max(cnt) AS n_orders
        |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |GROUP BY o_orderpriority""".stripMargin,
    "q21_asof_join" ->
      """WITH u AS (
        |  SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    1 AS side, event_id, CAST(NULL AS BIGINT) AS o_orderkey
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT),
        |    0, NULL, o_orderkey
        |  FROM orders),
        |m AS (SELECT event_id, k, side,
        |  last_value(o_orderkey IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY t, side, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_order
        |  FROM u)
        |SELECT event_id, k AS user_id, matched_order
        |FROM m WHERE side = 1""".stripMargin,
    // q21's union+window with the matched row's own timestamp carried
    // forward; the 30-day staleness bound is a pure per-row filter.
    "q45_asof_tolerance" ->
      """WITH u AS (
        |  SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    1 AS side, event_id, CAST(NULL AS BIGINT) AS o_orderkey
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT),
        |    0, NULL, o_orderkey
        |  FROM orders),
        |m AS (SELECT event_id, k, t, side,
        |  last_value(o_orderkey IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY t, side, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cand_order,
        |  last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY t, side, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cand_t
        |  FROM u)
        |SELECT event_id, k AS user_id,
        |  CASE WHEN t - cand_t <= 2592000 THEN cand_order END AS matched_order,
        |  CASE WHEN t - cand_t <= 2592000 THEN t - cand_t END AS gap_sec
        |FROM m WHERE side = 1""".stripMargin,
    "q24_range_join" ->
      """SELECT a.event_id, count(*) - 1 AS n_close
        |FROM events a JOIN events b ON a.event_type = b.event_type
        |  AND b.value >= a.value AND b.value < a.value + 0.5
        |GROUP BY a.event_id""".stripMargin,
    "q35_interval_join" ->
      """WITH b AS (SELECT event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |  CAST(floor(epoch(ts)) AS BIGINT) + 60 +
        |    ((CAST(floor(value) AS BIGINT) * 17) % 240 + 240) % 240 AS e
        | FROM events)
        |SELECT a.event_id, count(*) - 1 AS n_overlaps
        |FROM b a JOIN b b2 ON a.event_type = b2.event_type
        |  AND a.s <= b2.e AND b2.s <= a.e
        |GROUP BY a.event_id""".stripMargin,
    "c13_source_report" ->
      """WITH t AS (SELECT doc_id, source, n_chars, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, source, n_chars, n,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS q
        | FROM t)
        |SELECT source, count(*) AS n_docs,
        |  CAST(SUM(CAST(round(q * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
        |    / (count(*) * 1000000.0) AS mean_quality,
        |  CAST(SUM(CAST(n AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS mean_tokens,
        |  CAST(COUNT(CASE WHEN q >= 0.5 THEN 1 END) AS DOUBLE) / count(*) AS quality_rate,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM m GROUP BY source""".stripMargin,
    "c12_quality_sample" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, lang,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS qs
        | FROM t),
        |h AS (SELECT doc_id, lang, qs,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('qs:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('qs:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('qs:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 10000 AS gate
        | FROM m)
        |SELECT doc_id, lang, qs AS quality_score FROM h
        |WHERE gate < CAST(floor(qs * 10000) AS BIGINT)""".stripMargin,
    // q22: exact columns value-checked; sketch columns carved out as
    // within-tolerance booleans the oracle pins to literal true (a sketch
    // drifting outside its accuracy contract flips the flag → hash fail)
    "q22_approx_stats" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_rows,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  true AS approx_orders_ok,
        |  true AS approx_parts_ok,
        |  true AS approx_median_ok
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q23_topk_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "m_safe_json_decode" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(NULL AS VARCHAR) AS error_code
        |FROM events""".stripMargin,
    "m_error_routing" ->
      """SELECT event_type,
        |  COUNT(CASE WHEN value < 10.0 THEN 1 END) AS n_invalid,
        |  COUNT(CASE WHEN NOT (value < 10.0) THEN 1 END) AS n_valid
        |FROM events GROUP BY event_type""".stripMargin,
    // The lifted set is the reference's HeaderTo 8 (HeaderTo.java:73-82):
    // target class, application code/id, exception message/stacktrace,
    // topic, application message, exception class.
    "m_headers_roundtrip" ->
      """SELECT event_id,
        |  'graft.operators.EventRow' AS error_source_target_class,
        |  'FAILED_TO_PROCESS_RECORD' AS error_source_application_code,
        |  'graft-app' AS error_source_application_id,
        |  'boom' AS error_source_exception_message,
        |  CAST(NULL AS VARCHAR) AS error_source_exception_stack_trace,
        |  'events' AS error_source_topic,
        |  'Failed to process event ' || event_id AS error_source_application_message,
        |  'java.io.IOException' AS error_source_exception_class
        |FROM events WHERE event_type = 'error'""".stripMargin,
    "m_delta_dedup" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |  FROM events)
        |WHERE prev IS NULL OR prev <> event_type""".stripMargin,
    "x1_token_stats" ->
      """SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens,
        |  CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
        |    / len(string_split(text,' ')) AS avg_token_len
        |FROM documents""".stripMargin,
    "x2_lang_id" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS score_en,
        |  len(list_filter(w, x -> list_contains(['le','la','les','de','et','un','une','est'], x))) AS score_fr,
        |  len(list_filter(w, x -> list_contains(['der','die','das','und','ist','ein','eine','von'], x))) AS score_de,
        |  len(list_filter(w, x -> list_contains(['el','los','las','de','y','un','una','es'], x))) AS score_es
        | FROM t)
        |SELECT doc_id, score_en, score_fr, score_de, score_es,
        |  CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es THEN 'en'
        |       WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
        |       WHEN score_de >= score_es THEN 'de'
        |       ELSE 'es' END AS pred_lang
        |FROM s""".stripMargin,
    "x3_quality_score" ->
      """WITH t AS (SELECT doc_id, n_chars, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, n_chars, n,
        |  CAST(length(text) - (n - 1) AS DOUBLE) / n AS mwl,
        |  CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n AS sr,
        |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1) AS pr
        | FROM t)
        |SELECT doc_id, n_chars, n AS n_tokens, mwl AS avg_token_len,
        |  sr AS stopword_ratio, pr AS punct_ratio,
        |  0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0) AS quality_score,
        |  (0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0)) >= 0.5 AS is_quality
        |FROM m""".stripMargin,
    "x4_fingerprint" ->
      """WITH ws AS (SELECT doc_id, text, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, text,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |h AS (SELECT doc_id, text,
        |  list_sort(list_transform(s, x -> md5('f:' || x))) AS hs FROM sh)
        |SELECT doc_id, md5(text) AS content_md5, hs[1] AS min_shingle_hash,
        |  array_to_string(hs[1:4], '|') AS bottom4_sketch
        |FROM h""".stripMargin,
    "x5_rolling_fingerprint" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |f AS (SELECT doc_id, list_transform(w, x -> CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(md5('r:' || x), c, 1)) <= 57
        |           THEN ascii(substr(md5('r:' || x), c, 1)) - 48
        |           ELSE ascii(substr(md5('r:' || x), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT)) AS varr
        |  FROM ws WHERE len(w) >= 4),
        |r AS (SELECT doc_id, list_transform(range(1, len(varr) - 2), i ->
        |    ((((varr[i] * 131 + varr[i+1]) % 1000000007) * 131 + varr[i+2])
        |      % 1000000007 * 131 + varr[i+3]) % 1000000007) AS roll
        |  FROM f)
        |SELECT doc_id, len(roll) AS n_windows, list_min(roll) AS min_window_hash,
        |  len(list_distinct(roll)) AS n_distinct_windows
        |FROM r""".stripMargin,
    // Same roll CTE as x5; parallel UNNESTs zip the hash list with its
    // positions, then a doc-keyed running sum assigns chunk ids.
    "x19_cdc_chunks" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |f AS (SELECT doc_id, list_transform(w, x -> CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(md5('r:' || x), c, 1)) <= 57
        |           THEN ascii(substr(md5('r:' || x), c, 1)) - 48
        |           ELSE ascii(substr(md5('r:' || x), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT)) AS varr
        |  FROM ws WHERE len(w) >= 4),
        |r AS (SELECT doc_id, list_transform(range(1, len(varr) - 2), i ->
        |    ((((varr[i] * 131 + varr[i+1]) % 1000000007) * 131 + varr[i+2])
        |      % 1000000007 * 131 + varr[i+3]) % 1000000007) AS roll
        |  FROM f),
        |e AS (SELECT doc_id, UNNEST(roll) AS h,
        |  UNNEST(range(0, len(roll))) AS pos FROM r),
        |c AS (SELECT doc_id, h,
        |  CAST(SUM(CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS chunk_idx
        | FROM e)
        |SELECT doc_id, chunk_idx, COUNT(*) AS n_windows,
        |  MIN(h) AS chunk_min_hash, CAST(bit_xor(h) AS BIGINT) AS chunk_xor
        |FROM c GROUP BY 1, 2""".stripMargin,
    "x20_lang_ngram_profile" ->
      """WITH ws AS (SELECT lang, string_split(text,' ') AS w FROM documents),
        |bg AS (SELECT lang,
        |  UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
        |    AS bigram
        | FROM ws WHERE len(w) >= 2),
        |c AS (SELECT lang, bigram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2)
        |SELECT lang, bigram, cnt, rank FROM (
        |  SELECT lang, bigram, cnt,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY cnt DESC, bigram) AS INT) AS rank
        |  FROM c) WHERE rank <= 5""".stripMargin,
    // x17's decimal-grid log recipe over the per-doc char histogram.
    "x21_char_entropy" ->
      """WITH ch AS (SELECT doc_id,
        |  UNNEST(list_transform(range(1, length(text) + 1),
        |    i -> substr(text, i, 1))) AS c
        | FROM documents),
        |cnts AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
        |ag AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_chars,
        |  SUM(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)), 5)
        |    AS DECIMAL(18,6))) AS clog_sum
        | FROM cnts GROUP BY 1)
        |SELECT doc_id, n_chars,
        |  CAST(CAST(round(ln(CAST(n_chars AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    AS DOUBLE) - CAST(clog_sum AS DOUBLE) / n_chars AS entropy_nats
        |FROM ag""".stripMargin,
    // Unigram diversity: ratios are IEEE divisions of exact longs.
    "x22_lexical_diversity" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hapax_types,
        |  CAST(max(c) AS BIGINT) AS max_count,
        |  CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS ttr,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS hapax_frac,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS dominance
        |FROM c GROUP BY doc_id""".stripMargin,
    // x20's profile machinery as a classifier: train/eval split on
    // doc_id % 3, distinct-bigram hits vs each profile, argmax with
    // lexicographic tiebreak, zero-hit docs restored as 'und'.
    "x24_langid_eval" ->
      """WITH ws AS (SELECT doc_id, lang, string_split(text,' ') AS w
        |  FROM documents),
        |bg AS (SELECT doc_id, lang,
        |  UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
        |    AS bigram
        | FROM ws WHERE len(w) >= 2),
        |c AS (SELECT lang AS plang, bigram, count(*) AS cnt FROM bg
        |  WHERE doc_id % 3 <> 0 GROUP BY 1, 2),
        |prof AS (SELECT plang, bigram FROM (
        |  SELECT plang, bigram, row_number() OVER (PARTITION BY plang
        |    ORDER BY cnt DESC, bigram) AS rn FROM c) t WHERE rn <= 16),
        |eb AS (SELECT DISTINCT doc_id, lang, bigram FROM bg
        |  WHERE doc_id % 3 = 0),
        |hits AS (SELECT doc_id, lang, plang, count(*) AS hits
        |  FROM eb JOIN prof ON eb.bigram = prof.bigram GROUP BY 1, 2, 3),
        |best AS (SELECT doc_id, lang, plang FROM (
        |  SELECT doc_id, lang, plang, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY hits DESC, plang) AS rn FROM hits) t WHERE rn = 1),
        |und AS (SELECT d.doc_id, d.lang, 'und' AS plang FROM documents d
        |  WHERE d.doc_id % 3 = 0
        |    AND d.doc_id NOT IN (SELECT doc_id FROM best))
        |SELECT lang, plang AS pred_lang, count(*) AS n_docs
        |FROM (SELECT * FROM best UNION ALL SELECT * FROM und) u
        |GROUP BY 1, 2""".stripMargin,
    // BPE tokenizer family: the unrolled merge-step CTE chain (bpeCtes)
    // mirrors LlmText.bpeTrainState step for step — overlapping pair
    // counts, argmax with (count desc, lhs, rhs) tie-break, 3-pass
    // space-padded replace rewrite (Spark UTF8String.replace and DuckDB
    // replace share left-to-right non-overlapping scan semantics).
    "x25_bpe_train" ->
      (bpeCtes(6) + "\n" +
        (1 to 6).map(i =>
            s"SELECT CAST($i AS INT) AS step, lhs, rhs, c AS pair_count FROM b$i")
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY step")),
    "x26_bpe_vocab" ->
      (bpeCtes(6) +
        """
          |SELECT ss[k] AS token, CAST(SUM(cnt) AS BIGINT) AS freq
          |FROM (SELECT cnt, string_split(sym,' ') AS ss FROM w6) tf,
          |     UNNEST(range(1, len(ss) + 1)) AS uf(k)
          |GROUP BY 1""".stripMargin),
    "x27_bpe_doc_stats" ->
      (bpeCtes(6) +
        """,
          |dict AS (SELECT w, CAST(len(string_split(sym,' ')) AS BIGINT)
          |    AS ntok FROM w6),
          |dw AS (SELECT doc_id, n_chars, UNNEST(string_split(text,' ')) AS w
          |  FROM documents)
          |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
          |  CAST(SUM(ntok) AS BIGINT) AS n_tokens, n_chars,
          |  CAST(n_chars AS DOUBLE) / CAST(SUM(ntok) AS BIGINT)
          |    AS chars_per_token
          |FROM dw JOIN dict USING (w)
          |WHERE len(w) > 0
          |GROUP BY doc_id, n_chars""".stripMargin),
    // KL(source‖corpus) with x17's decimal-grid log terms; only the final
    // three-term combination runs in double, left-to-right.
    "x23_source_divergence" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |sw AS (SELECT source, tok, count(*) AS csw FROM t GROUP BY 1, 2),
        |w AS (SELECT tok, count(*) AS cw FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS nn FROM t),
        |j AS (SELECT source, csw,
        |    csw * (CAST(round(ln(CAST(csw AS DOUBLE)), 5) AS DECIMAL(18,6))
        |         - CAST(round(ln(CAST(cw AS DOUBLE)), 5) AS DECIMAL(18,6)))
        |      AS term
        |  FROM sw JOIN w ON sw.tok = w.tok),
        |g AS (SELECT source, CAST(SUM(csw) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types, SUM(term) AS term_sum
        |  FROM j GROUP BY source)
        |SELECT source, n_tokens, n_types,
        |  CAST(term_sum AS DOUBLE) / n_tokens
        |    - CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)), 5)
        |        AS DECIMAL(18,6)) AS DOUBLE)
        |    + CAST(CAST(round(ln(CAST(nn AS DOUBLE)), 5)
        |        AS DECIMAL(18,6)) AS DOUBLE) AS kl_nats
        |FROM g CROSS JOIN n""".stripMargin,
    // PMI as a pure decimal-grid sum of six L(count) terms in the same
    // association order as the Column expression; ties broken (w1, w2).
    "x29_pmi_collocations" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |uni AS (SELECT tok, count(*) AS cw FROM t GROUP BY tok),
        |n AS (SELECT count(*) AS n_total FROM t),
        |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
        |  FROM ws WHERE len(w) >= 2),
        |bi AS (SELECT bigram, count(*) AS cab FROM bg GROUP BY bigram
        |  HAVING count(*) >= 5),
        |b AS (SELECT count(*) AS b_total FROM bg),
        |j AS (SELECT
        |    split_part(bigram, ' ', 1) AS w1,
        |    split_part(bigram, ' ', 2) AS w2,
        |    cab FROM bi),
        |s AS (SELECT j.w1, j.w2, j.cab, a.cw AS ca, c.cw AS cb,
        |    n.n_total, b.b_total
        |  FROM j JOIN uni a ON a.tok = j.w1 JOIN uni c ON c.tok = j.w2
        |  CROSS JOIN n CROSS JOIN b),
        |p AS (SELECT w1, w2, cab, ca, cb, CAST(
        |    CAST(round(ln(CAST(cab AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    - CAST(round(ln(CAST(b_total AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    - CAST(round(ln(CAST(ca AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    + CAST(round(ln(CAST(n_total AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    - CAST(round(ln(CAST(cb AS DOUBLE)), 5) AS DECIMAL(18,6))
        |    + CAST(round(ln(CAST(n_total AS DOUBLE)), 5) AS DECIMAL(18,6))
        |  AS DOUBLE) AS pmi FROM s)
        |SELECT w1, w2, cab, ca, cb, pmi FROM p
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    // x34: Flesch reading ease — pure IEEE ±·/ in the same left-assoc
    // expression tree on both engines; decimal literals cast to DOUBLE
    // (DuckDB parses bare 206.835 as DECIMAL).
    "x35_charclass_profile" ->
      """WITH p AS (SELECT source,
        |  CAST(length(text) AS BIGINT) AS n,
        |  CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g'))
        |    AS BIGINT) AS lo,
        |  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
        |    AS BIGINT) AS up,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |    AS BIGINT) AS di,
        |  CAST(length(text) - length(regexp_replace(text, ' ', '', 'g'))
        |    AS BIGINT) AS sp,
        |  CAST(length(text) - length(regexp_replace(text, '[\x00-\x1f]', '', 'g'))
        |    AS BIGINT) AS ctl,
        |  CAST(length(text) - length(regexp_replace(text, '\x{FFFD}', '', 'g'))
        |    AS BIGINT) AS rep
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_chars,
        |  CAST(sum(lo) AS BIGINT) AS n_lower,
        |  CAST(sum(up) AS BIGINT) AS n_upper,
        |  CAST(sum(di) AS BIGINT) AS n_digit,
        |  CAST(sum(sp) AS BIGINT) AS n_space,
        |  CAST(sum(ctl) AS BIGINT) AS n_control,
        |  CAST(sum(rep) AS BIGINT) AS n_replacement,
        |  CAST(CAST(sum(lo) AS BIGINT) AS DOUBLE)
        |    / CAST(sum(n) AS BIGINT) AS lower_frac,
        |  CAST(CAST(sum(sp) AS BIGINT) AS DOUBLE)
        |    / CAST(sum(n) AS BIGINT) AS space_frac,
        |  CAST(sum(ctl) AS BIGINT) + CAST(sum(rep) AS BIGINT) > 0
        |    AS encoding_suspect
        |FROM p GROUP BY source""".stripMargin,
    "x36_vocab_coverage" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM t
        |  WHERE length(tok) > 0 GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM c),
        |top AS (SELECT cnt,
        |    row_number() OVER (ORDER BY cnt DESC, tok) AS rank
        |  FROM c ORDER BY cnt DESC, tok LIMIT 10000),
        |n AS (SELECT unnest([100, 1000, 10000]) AS n_vocab)
        |SELECT CAST(n.n_vocab AS INT) AS n_vocab,
        |  CAST(sum(top.cnt) AS BIGINT) AS covered_tokens,
        |  tot.total_tokens,
        |  CAST(CAST(sum(top.cnt) AS BIGINT) AS DOUBLE) / tot.total_tokens
        |    AS coverage
        |FROM n JOIN top ON top.rank <= n.n_vocab CROSS JOIN tot
        |GROUP BY n.n_vocab, tot.total_tokens""".stripMargin,
    "x34_readability" ->
      """WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS w
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  len(w) AS n_words,
        |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |    AS n_sentences,
        |  list_sum(list_transform(w, x ->
        |    greatest(len(regexp_extract_all(lower(x), '[aeiouy]+')), 1)))
        |    AS n_syllables
        |  FROM ws)
        |SELECT doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_sentences AS BIGINT) AS n_sentences,
        |  CAST(n_syllables AS BIGINT) AS n_syllables,
        |  CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE)
        |      * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - CAST(84.6 AS DOUBLE)
        |      * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        |    AS flesch
        |FROM m""".stripMargin,
    "x33_quality_quantiles" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, source,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS qs
        | FROM t),
        |c AS (SELECT source, count(*) AS n FROM m GROUP BY 1),
        |tg AS (SELECT source, p, CAST(ceil(p * n) AS BIGINT) AS rnk
        |  FROM c CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75]) AS p)),
        |r AS (SELECT source, qs, row_number() OVER (PARTITION BY source
        |    ORDER BY qs, doc_id) AS rnk FROM m)
        |SELECT r.source, p, r.qs AS q_value
        |FROM r JOIN tg ON tg.source = r.source AND tg.rnk = r.rnk""".stripMargin,
    "x30_novelty" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |intro AS (SELECT g, min(doc_id) AS introducer FROM tok GROUP BY g),
        |per AS (SELECT t.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(SUM(CASE WHEN i.introducer = t.doc_id
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM tok t JOIN intro i ON i.g = t.g GROUP BY t.doc_id)
        |SELECT doc_id, n_shingles, n_novel,
        |  CAST(n_novel AS DOUBLE) / n_shingles AS novelty
        |FROM per""".stripMargin,
    "x32_code_switch" ->
      """WITH ws AS (SELECT doc_id, lang, string_split(text,' ') AS w
        |  FROM documents),
        |bg AS (SELECT doc_id, lang,
        |  UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
        |    AS bigram
        | FROM ws WHERE len(w) >= 2),
        |c AS (SELECT lang AS plang, bigram, count(*) AS cnt FROM bg
        |  GROUP BY 1, 2),
        |prof AS (SELECT plang, bigram FROM (
        |  SELECT plang, bigram, row_number() OVER (PARTITION BY plang
        |    ORDER BY cnt DESC, bigram) AS rn FROM c) t WHERE rn <= 16),
        |hv AS (SELECT doc_id, 0 AS half, w[1:len(w)//2] AS hw FROM ws
        |  UNION ALL
        |  SELECT doc_id, 1, w[len(w)//2+1:len(w)] FROM ws),
        |hb AS (SELECT DISTINCT doc_id, half, bigram FROM (
        |  SELECT doc_id, half,
        |    UNNEST(list_transform(range(1, len(hw)),
        |      i -> hw[i] || ' ' || hw[i+1])) AS bigram
        |  FROM hv WHERE len(hw) >= 2) q),
        |hits AS (SELECT doc_id, half, plang, count(*) AS hits
        |  FROM hb JOIN prof ON hb.bigram = prof.bigram GROUP BY 1, 2, 3),
        |best AS (SELECT doc_id, half, plang FROM (
        |  SELECT doc_id, half, plang, row_number() OVER (
        |    PARTITION BY doc_id, half ORDER BY hits DESC, plang) AS rn
        |  FROM hits) t WHERE rn = 1),
        |f AS (SELECT doc_id, plang AS lang_front FROM best WHERE half = 0),
        |b AS (SELECT doc_id, plang AS lang_back FROM best WHERE half = 1)
        |SELECT d.doc_id, d.lang,
        |  COALESCE(f.lang_front, 'und') AS lang_front,
        |  COALESCE(b.lang_back, 'und') AS lang_back,
        |  (COALESCE(f.lang_front, 'und') <> 'und'
        |   AND COALESCE(b.lang_back, 'und') <> 'und'
        |   AND COALESCE(f.lang_front, 'und') <> COALESCE(b.lang_back, 'und'))
        |    AS switched
        |FROM documents d LEFT JOIN f ON f.doc_id = d.doc_id
        |  LEFT JOIN b ON b.doc_id = d.doc_id""".stripMargin,
    "x31_vocab_growth" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w FROM t WHERE length(w) > 0),
        |tm AS (SELECT doc_id // 100 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM tf GROUP BY 1),
        |nt AS (SELECT first_doc // 100 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_new_types
        |  FROM (SELECT w, min(doc_id) AS first_doc FROM tf GROUP BY w)
        |  GROUP BY 1),
        |j AS (SELECT COALESCE(tm.bucket, nt.bucket) AS bucket,
        |    COALESCE(tm.n_tokens, 0) AS n_tokens,
        |    COALESCE(nt.n_new_types, 0) AS n_new_types
        |  FROM tm FULL OUTER JOIN nt ON tm.bucket = nt.bucket)
        |SELECT bucket, n_tokens, n_new_types,
        |  CAST(sum(n_tokens) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(sum(n_new_types) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_types
        |FROM j""".stripMargin,
    "x6_text_clean" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS clean_text,
        |  length(text) AS len_raw,
        |  length(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS len_clean,
        |  CAST(length(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS DOUBLE) / length(text) AS retained_ratio
        |FROM documents""".stripMargin,
    "x7_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, tf.term, tf.tf, df.df,
        |  tf.tf * (CAST(n_docs AS DOUBLE) / df.df) AS tfidf
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        |SELECT doc_id, term, tf, df, tfidf, rank FROM (
        |  SELECT doc_id, term, tf, df, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored) WHERE rank <= 3""".stripMargin,
    "x8_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |g AS (SELECT doc_id, w,
        |  [array_to_string(w[i:i+1],' ') for i in range(1, len(w))] AS g2,
        |  [array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)] AS g3
        | FROM t),
        |m AS (SELECT doc_id, len(w) AS n_words,
        |  CASE WHEN len(w) > 0
        |       THEN CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w)
        |       ELSE 0.0 END AS dup_word_frac,
        |  CASE WHEN len(g2) > 0
        |       THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
        |       ELSE 0.0 END AS dup_bigram_frac,
        |  CASE WHEN len(g3) > 0
        |       THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
        |       ELSE 0.0 END AS dup_trigram_frac
        | FROM g)
        |SELECT doc_id, n_words, dup_word_frac, dup_bigram_frac, dup_trigram_frac,
        |  (dup_word_frac > 0.30 OR dup_bigram_frac > 0.20
        |    OR dup_trigram_frac > 0.18) AS is_repetitive
        |FROM m""".stripMargin,
    "x9_vocab_oov" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |cnt AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
        |vocab AS (SELECT term FROM cnt ORDER BY cnt DESC, term LIMIT 16),
        |iv AS (SELECT doc_id, count(*) AS n_in FROM toks JOIN vocab USING(term) GROUP BY 1),
        |t AS (SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens FROM documents)
        |SELECT t.doc_id, n_tokens,
        |  n_tokens - COALESCE(n_in, 0) AS n_oov,
        |  CAST(n_tokens - COALESCE(n_in, 0) AS DOUBLE) / n_tokens AS oov_rate
        |FROM t LEFT JOIN iv ON t.doc_id = iv.doc_id""".stripMargin,
    "x10_bm25" ->
      """WITH n AS (SELECT count(*) AS n_docs,
        |  CAST(SUM(CAST(len(string_split(text,' ')) AS DECIMAL(38,6))) AS DOUBLE)
        |    / count(*) AS avgdl FROM documents),
        |t AS (SELECT doc_id, len(string_split(text,' ')) AS dl,
        |  unnest(string_split(text,' ')) AS term FROM documents),
        |q AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM t
        |  WHERE term IN ('data', 'query', 'fast') GROUP BY 1, 2),
        |d AS (SELECT term, count(*) AS df FROM q GROUP BY 1),
        |s AS (SELECT doc_id, q.term,
        |  (CAST(n_docs AS DOUBLE) / df) * (tf * CAST(2.2 AS DOUBLE))
        |    / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |         + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS s
        |  FROM q JOIN d ON q.term = d.term CROSS JOIN n),
        |p AS (SELECT doc_id,
        |  COALESCE(max(CASE WHEN term = 'data' THEN s END), 0.0)
        |  + COALESCE(max(CASE WHEN term = 'query' THEN s END), 0.0)
        |  + COALESCE(max(CASE WHEN term = 'fast' THEN s END), 0.0) AS score
        | FROM s GROUP BY doc_id)
        |SELECT doc_id, score FROM p
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "x17_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |b AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
        |  FROM t WHERE len(w) >= 2),
        |cb AS (SELECT bigram, count(*) AS cb FROM b GROUP BY 1),
        |cw AS (SELECT split_part(bigram,' ',1) AS w1, count(*) AS cw FROM b GROUP BY 1),
        |v AS (SELECT count(*) AS vsz FROM cw),
        |lp AS (SELECT doc_id,
        |  CAST(round(ln((cb + CAST(1 AS DOUBLE)) / CAST(cw + vsz AS DOUBLE)), 5)
        |    AS DECIMAL(18,6)) AS lp
        |  FROM b JOIN cb USING (bigram)
        |  JOIN cw ON split_part(b.bigram,' ',1) = cw.w1 CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logprob
        |FROM lp GROUP BY doc_id""".stripMargin,
    "x18_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split(text,' ') AS w FROM documents),
        |m AS (SELECT doc_id,
        |  len(w) AS n_words,
        |  CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS mean_word_len,
        |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / len(w) AS symbol_ratio,
        |  CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(w) AS alpha_frac,
        |  CAST(1 AS DOUBLE) - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_frac,
        |  len(list_intersect(list_distinct(w),
        |    ['the','a','of','and','to','in','is','that'])) AS n_stopwords
        | FROM t)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
        |  dup_frac, n_stopwords,
        |  n_words >= 20 AND n_words <= 80 AS rule_word_count,
        |  mean_word_len >= 4.0 AND mean_word_len <= 5.0 AS rule_word_len,
        |  symbol_ratio <= 0.1 AS rule_symbol_ratio,
        |  alpha_frac >= 0.8 AS rule_alpha_frac,
        |  dup_frac <= 0.5 AS rule_dup_frac,
        |  n_stopwords >= 2 AS rule_stopwords,
        |  n_words >= 20 AND n_words <= 80
        |    AND mean_word_len >= 4.0 AND mean_word_len <= 5.0
        |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
        |    AND dup_frac <= 0.5 AND n_stopwords >= 2 AS pass
        |FROM m""".stripMargin,
    "x11_pii_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@mail.example.com'
        |    || ' backup admin@corp' || (doc_id % 7) || '.org'
        |    || ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 256)
        |    || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        | FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(t, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted_text
        |FROM p""".stripMargin,
    "x12_line_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |l AS (SELECT doc_id,
        |  [w[i:i+7] for i in range(1, len(w)+1, 8)] AS lines FROM t),
        |k AS (SELECT doc_id, lines,
        |  list_filter(lines, x -> len(x) >= 5
        |    AND len(list_filter(x, y -> length(y) >= 4)) > 0) AS kept
        | FROM l)
        |SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
        |  CAST(len(kept) AS DOUBLE) / len(lines) AS kept_ratio,
        |  array_to_string(list_transform(kept, x -> array_to_string(x, ' ')),
        |    ' | ') AS kept_text
        |FROM k""".stripMargin,
    "x13_char_diversity" ->
      """WITH c AS (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
        |  FROM documents),
        |g AS (SELECT doc_id, ch, count(*) AS cnt FROM c GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
        |  count(*) AS n_distinct_chars,
        |  CAST(sum(cnt * cnt) AS BIGINT) AS s2, max(cnt) AS mx
        | FROM g GROUP BY doc_id)
        |SELECT doc_id, n AS n_chars_counted, n_distinct_chars,
        |  CAST(s2 AS DOUBLE) / (n * n) AS collision_prob,
        |  CAST(mx AS DOUBLE) / n AS max_char_frac
        |FROM a""".stripMargin,
    "x14_url_normalize" ->
      """WITH p AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END)
        |  || source || '.Example.COM'
        |  || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END)
        |  || '/p/' || (doc_id % 7)
        |  || '?utm_source=feed&id=' || (doc_id % 13)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '&utm_campaign=x' ELSE '' END)
        |  || '#sec' AS url
        | FROM documents),
        |n AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |  regexp_replace(lower(regexp_replace(
        |    regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1),
        |    ':[0-9]+$', '')), '^www\.', '') AS host,
        |  regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  array_to_string(list_filter(
        |    string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |    q -> NOT starts_with(q, 'utm_')), '&') AS nq
        | FROM p),
        |h AS (SELECT doc_id, url, scheme, host, path, nq,
        |  string_split(host, '.') AS hp FROM n)
        |SELECT doc_id, url, scheme, host,
        |  array_to_string(hp[-2:], '.') AS registered_domain,
        |  scheme || '://' || host || path
        |    || (CASE WHEN nq = '' THEN '' ELSE '?' || nq END) AS norm_url
        |FROM h""".stripMargin,
    "d14_url_dedup" ->
      """WITH p AS (SELECT doc_id, length(text) AS n_chars,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END)
        |  || source || '.Example.COM'
        |  || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END)
        |  || '/p/' || (doc_id % 7)
        |  || '?utm_source=feed&id=' || (doc_id % 13)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '&utm_campaign=x' ELSE '' END)
        |  || '#sec' AS url
        | FROM documents),
        |n AS (SELECT doc_id, n_chars,
        |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://'
        |  || regexp_replace(lower(regexp_replace(
        |       regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1),
        |       ':[0-9]+$', '')), '^www\.', '')
        |  || regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)
        |  || (CASE WHEN array_to_string(list_filter(
        |        string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |        q -> NOT starts_with(q, 'utm_')), '&') = '' THEN ''
        |      ELSE '?' || array_to_string(list_filter(
        |        string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |        q -> NOT starts_with(q, 'utm_')), '&') END) AS norm_url
        | FROM p),
        |w AS (SELECT norm_url, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY norm_url
        |    ORDER BY n_chars DESC, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY norm_url) AS n_dupes
        | FROM n)
        |SELECT norm_url, doc_id AS keep_doc_id, CAST(n_chars AS BIGINT)
        |  AS n_chars, n_dupes
        |FROM w WHERE rn = 1""".stripMargin,
    "c9_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |e AS (SELECT doc_id, w,
        |  unnest(range(1, len(w) + 1, 48)) AS start FROM t)
        |SELECT doc_id,
        |  CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start_token,
        |  CAST(len(w[start:start+63]) AS BIGINT) AS n_tokens,
        |  array_to_string(w[start:start+63], ' ') AS chunk_text
        |FROM e""".stripMargin,
    // c25: token mass per source over exact-dedup survivors (first copy
    // by doc_id); weight = survivor tokens / total survivor tokens.
    "c25_dedup_weighted_mix" ->
      """WITH h AS (SELECT doc_id, source,
        |    md5(text) AS h, len(string_split(text, ' ')) AS tok
        |  FROM documents),
        |f AS (SELECT h, min(doc_id) AS first_doc FROM h GROUP BY h),
        |kept AS (SELECT h.* FROM h JOIN f ON f.h = h.h
        |  WHERE h.doc_id = f.first_doc),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(tok) AS BIGINT) AS n_tokens
        |  FROM kept GROUP BY source),
        |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM per)
        |SELECT source, n_docs, n_tokens,
        |  CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE) AS weight
        |FROM per CROSS JOIN t""".stripMargin,
    "c24_token_temperature" ->
      """WITH masses AS (SELECT lang,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t_total
        |  FROM documents GROUP BY 1),
        |mn AS (SELECT min(t_total) AS min_t FROM masses),
        |rates AS (SELECT lang,
        |  CAST(floor(10000.0 * sqrt(CAST(min_t AS DOUBLE) / t_total)) AS BIGINT)
        |    AS keep_per_10k
        |  FROM masses CROSS JOIN mn),
        |h AS (SELECT doc_id, source, d.lang,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('tmt:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('tmt:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('tmt:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 10000 AS b
        | FROM documents d)
        |SELECT doc_id, source, h.lang FROM h JOIN rates ON h.lang = rates.lang
        |WHERE b < keep_per_10k""".stripMargin,
    "c10_temperature_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
        |mn AS (SELECT min(n_total) AS min_n FROM counts),
        |rates AS (SELECT lang,
        |  CAST(floor(10000.0 * sqrt(CAST(min_n AS DOUBLE) / n_total)) AS BIGINT)
        |    AS keep_per_10k
        |  FROM counts CROSS JOIN mn),
        |h AS (SELECT doc_id, source, d.lang,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('tmp:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('tmp:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('tmp:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 10000 AS b
        | FROM documents d)
        |SELECT doc_id, source, h.lang FROM h JOIN rates ON h.lang = rates.lang
        |WHERE b < keep_per_10k""".stripMargin,
    "q30_window_nav" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  ntile(4) OVER w AS quartile,
        |  first_value(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q44_window_dist" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(o_totalprice, 3) OVER w AS third_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q46_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |  CAST(l_quantity AS DOUBLE) AS mval FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |  CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount',
        |  CAST(l_discount AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax',
        |  CAST(l_tax AS DOUBLE) FROM lineitem""".stripMargin,
    "q34_date_funcs" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
        |  CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS mth,
        |  CAST(day(CAST(o_orderdate AS DATE)) AS INT) AS dom,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
        |    AS days_to_eoy,
        |  CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start
        |FROM orders""".stripMargin,
    "q32_histogram" ->
      """WITH s AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
        |b AS (SELECT CASE WHEN vmax = vmin THEN 0
        |    ELSE least(CAST(floor((value - vmin) / ((vmax - vmin) / 20)) AS BIGINT), 19)
        |  END AS bucket
        | FROM events CROSS JOIN s),
        |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket)
        |SELECT bucket,
        |  vmin + bucket * ((vmax - vmin) / 20) AS bucket_lo,
        |  vmin + (bucket + 1) * ((vmax - vmin) / 20) AS bucket_hi,
        |  n
        |FROM c CROSS JOIN s""".stripMargin,
    // decimal→double goes through VARCHAR: DuckDB's direct DECIMAL→DOUBLE
    // cast is not correctly rounded once the unscaled value needs int128
    // (observed 1-ulp-high on the Σy² sums), while its string→double parse
    // and Spark's BigDecimal.doubleValue both round correctly.
    "q33_group_corr" ->
      """WITH a AS (SELECT l_returnflag, count(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |  CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxy,
        |  CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxx,
        |  CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS syy
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (n * sxy - sx * sy) /
        |  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
        |FROM a""".stripMargin,
    "q31_latest_upsert" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "c11_token_budget" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, lang, CAST(n AS BIGINT) AS n_tokens,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0) AS q
        | FROM t),
        |c AS (SELECT doc_id, lang AS domain, n_tokens, q,
        |  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY q DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        | FROM m)
        |SELECT doc_id, domain, n_tokens, q AS quality_score, cum_tokens
        |FROM c WHERE cum_tokens <= 3000""".stripMargin,
    "s4_range_search" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cos FROM p WHERE cos >= 0.3""".stripMargin,
    "s5_hybrid_rrf" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_distinct(string_split(text,' '))) AS term FROM documents),
        |q AS (SELECT doc_id AS query_id, term FROM t WHERE doc_id % 100 = 0),
        |o AS (SELECT query_id, t.doc_id, count(*) AS ovl
        |  FROM q JOIN t USING (term) WHERE t.doc_id <> query_id GROUP BY 1, 2),
        |lr AS (SELECT query_id, doc_id, rank_l FROM (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ovl DESC, doc_id) AS rank_l
        |  FROM o) WHERE rank_l <= 20),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |vr AS (SELECT query_id, neighbor_id AS doc_id, rank_v FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank_v
        |  FROM p) WHERE rank_v <= 20)
        |SELECT COALESCE(lr.query_id, vr.query_id) AS query_id,
        |  COALESCE(lr.doc_id, vr.doc_id) AS doc_id,
        |  COALESCE(CAST(1 AS DOUBLE) / (60 + rank_l), 0)
        |    + COALESCE(CAST(1 AS DOUBLE) / (60 + rank_v), 0) AS rrf_score
        |FROM lr FULL OUTER JOIN vr
        |  ON lr.query_id = vr.query_id AND lr.doc_id = vr.doc_id""".stripMargin,
    "s6_ann_tiered" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |co AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,17), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,17), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,17), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS ccos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, neighbor_id) AS r
        |  FROM co) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10""".stripMargin,
    "s7_ann_hamming" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |b AS (SELECT vec_id, x,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), i ->
        |    CASE WHEN x[i + 1] >= 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)),
        |    (a, w) -> a | w) AS w0,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), i ->
        |    CASE WHEN x[i + 33] >= 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)),
        |    (a, w) -> a | w) AS w1
        | FROM v),
        |ham AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  CAST(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS hamming
        | FROM b q JOIN b c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS r
        |  FROM ham) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10""".stripMargin,
    // s1's scan with the label inequality in the join, per-anchor top-5.
    "s10_hard_negatives" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, q.label AS qlabel,
        |  c.vec_id AS neighbor_id, c.label AS neg_label,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id
        |   AND c.label <> q.label)
        |SELECT query_id, qlabel, neighbor_id, neg_label, cos, rank FROM (
        |  SELECT query_id, qlabel, neighbor_id, neg_label, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        |  FROM p) WHERE rank <= 5""".stripMargin,
    // s1's exact top-10 and s6's tiered top-10 composed, left-joined on
    // (query, neighbor), reduced to per-query recall.
    "s9_ann_recall" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 10),
        |co AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,17), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,17), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,17), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS ccos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, neighbor_id) AS r
        |  FROM co) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id),
        |ap AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10)
        |SELECT ex.query_id, COUNT(*) AS n_exact,
        |  CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  CAST(CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS DOUBLE) / COUNT(*) AS recall
        |FROM ex LEFT JOIN ap ON ex.query_id = ap.query_id
        |  AND ex.neighbor_id = ap.neighbor_id
        |GROUP BY ex.query_id""".stripMargin,
    // ADC tier reuses e5's codebook construction verbatim (sub/seeds/d0/
    // a0/m1/cb), then scores corpus codes against the per-query lookup
    // table on the shared 1e-9 grid before the exact re-rank.
    "s8_ann_pq_adc" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |sub AS (SELECT vec_id, s, x[(16*s+1):(16*s+16)] AS sx
        |  FROM v CROSS JOIN (SELECT UNNEST(range(0, 4)) AS s)),
        |seeds AS (SELECT s, sx AS cx,
        |    CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) AS INT)
        |      AS code
        |  FROM sub WHERE vec_id % 61 = 0 AND vec_id < 61 * 256),
        |d0 AS (SELECT u.vec_id, u.s, se.code, u.sx,
        |  list_reduce(list_transform(range(1, 17), i ->
        |    (u.sx[i] - se.cx[i]) * (u.sx[i] - se.cx[i])), (a, b) -> a + b)
        |    AS d2
        |  FROM sub u JOIN seeds se ON u.s = se.s),
        |a0 AS (SELECT vec_id, s, code, sx FROM (SELECT vec_id, s, code, sx,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)
        |      AS rn FROM d0) WHERE rn = 1),
        |m1 AS (SELECT s, code, list(m ORDER BY i) AS mx FROM (
        |  SELECT a.s, a.code, d.i,
        |    CAST(SUM(CAST(round(a.sx[d.i] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS m
        |  FROM a0 a CROSS JOIN (SELECT UNNEST(range(1, 17)) AS i) d
        |  GROUP BY a.s, a.code, d.i) GROUP BY s, code),
        |cb AS (SELECT se.s, se.code, COALESCE(m1.mx, se.cx) AS cx
        |  FROM seeds se LEFT JOIN m1 ON se.s = m1.s AND se.code = m1.code),
        |asg AS (SELECT vec_id, s, code FROM (SELECT u.vec_id, u.s, c.code,
        |    row_number() OVER (PARTITION BY u.vec_id, u.s ORDER BY
        |      list_reduce(list_transform(range(1, 17), i ->
        |        (u.sx[i] - c.cx[i]) * (u.sx[i] - c.cx[i])), (a, b) -> a + b),
        |      c.code) AS rn
        |  FROM sub u JOIN cb c ON u.s = c.s) WHERE rn = 1),
        |lut AS (SELECT q.vec_id AS query_id, c.s, c.code,
        |  CAST(round(list_reduce(list_transform(range(1, 17), i ->
        |    (q.sx[i] - c.cx[i]) * (q.sx[i] - c.cx[i])), (a, b) -> a + b)
        |    * 1.0e9) AS BIGINT) AS g2
        |  FROM sub q JOIN cb c ON q.s = c.s WHERE q.vec_id % 100 = 0),
        |adc AS (SELECT l.query_id, a.vec_id AS neighbor_id,
        |  CAST(CAST(SUM(g2) AS BIGINT) AS DOUBLE) / 1.0e9 AS adc_d2
        |  FROM asg a JOIN lut l ON a.s = l.s AND a.code = l.code
        |    AND a.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_d2, neighbor_id) AS r
        |  FROM adc) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10""".stripMargin,
    "c1_stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang, source,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('smp:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('smp:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('smp:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 100 AS bucket
        | FROM documents)
        |SELECT doc_id, lang, source, bucket FROM h
        |WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 25 END""".stripMargin,
    "c2_domain_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
        |mn AS (SELECT min(n_total) AS min_n FROM counts),
        |rates AS (SELECT lang, (min_n * 10000) // n_total AS keep_per_10k
        |  FROM counts CROSS JOIN mn),
        |h AS (SELECT doc_id, source, d.lang,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('mix:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('mix:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('mix:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 10000 AS b
        | FROM documents d)
        |SELECT doc_id, source, h.lang FROM h JOIN rates ON h.lang = rates.lang
        |WHERE b < keep_per_10k""".stripMargin,
    "c3_leakage_split" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc),
        |r AS (SELECT d.doc_id, COALESCE(dec.rep, d.doc_id) AS rep
        |  FROM documents d LEFT JOIN dec ON d.doc_id = dec.doc),
        |hh AS (SELECT doc_id, rep,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('sp:' || rep), c, 1)) <= 57
        |         THEN ascii(substr(md5('sp:' || rep), c, 1)) - 48
        |         ELSE ascii(substr(md5('sp:' || rep), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 100 AS b
        | FROM r)
        |SELECT doc_id, rep,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM hh""".stripMargin,
    "c4_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('pk:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('pk:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('pk:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 32 AS shard
        | FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM t)
        |SELECT doc_id, shard, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 512 AS BIGINT) AS start_offset
        |FROM c""".stripMargin,
    "c8_pack_materialize" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('pk:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('pk:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('pk:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 32 AS shard
        | FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM t),
        |p AS (SELECT doc_id, shard, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id FROM c)
        |SELECT p.shard, p.pack_id, count(*) AS n_docs,
        |  CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
        |  string_agg(d.text, ' ' ORDER BY d.doc_id) AS pack_text
        |FROM p JOIN documents d ON p.doc_id = d.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "c5_curation_pipeline" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc),
        |drops AS (SELECT doc FROM dec WHERE doc <> rep),
        |m AS (SELECT d.doc_id, d.lang, d.n_chars,
        |  CAST(length(d.text) - (len(ws.w) - 1) AS DOUBLE) / len(ws.w) AS mwl,
        |  CAST(len(list_filter(ws.w,
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE)
        |    / len(ws.w) AS sr,
        |  CAST(len(regexp_extract_all(d.text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(d.text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1) AS pr,
        |  CASE WHEN len(ws.w) > 0
        |       THEN CAST(len(ws.w) - len(list_distinct(ws.w)) AS DOUBLE) / len(ws.w)
        |       ELSE 0.0 END AS dw,
        |  CASE WHEN len(ws.w) >= 2
        |       THEN CAST(len(ws.w) - 1 - len(list_distinct(
        |         [array_to_string(ws.w[i:i+1],' ') for i in range(1, len(ws.w))])) AS DOUBLE)
        |         / (len(ws.w) - 1)
        |       ELSE 0.0 END AS d2f,
        |  CASE WHEN len(ws.w) >= 3
        |       THEN CAST(len(ws.w) - 2 - len(list_distinct(
        |         [array_to_string(ws.w[i:i+2],' ') for i in range(1, len(ws.w)-1)])) AS DOUBLE)
        |         / (len(ws.w) - 2)
        |       ELSE 0.0 END AS d3f
        | FROM documents d JOIN ws ON d.doc_id = ws.doc_id),
        |sel AS (SELECT doc_id, lang, n_chars FROM m
        |  WHERE (0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * (least(mwl, 8.0) / 8.0)) >= 0.5
        |    AND NOT (dw > 0.30 OR d2f > 0.20 OR d3f > 0.18)
        |    AND doc_id NOT IN (SELECT doc FROM drops))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM sel GROUP BY lang""".stripMargin,
    "c7_group_sample" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('gs:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('gs:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('gs:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 1000000 AS h
        | FROM documents)
        |SELECT doc_id, lang, h FROM (
        |  SELECT doc_id, lang, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        |  FROM t) WHERE rn <= 10""".stripMargin,
    "c6_decontaminate" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |cor AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0),
        |ov AS (SELECT doc_id, count(*) AS shared
        |  FROM cor JOIN bench USING(g) GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  COALESCE(ov.shared, 0) AS n_shared,
        |  COALESCE(ov.shared, 0) >= 3 AS contaminated
        |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
        |WHERE d.doc_id % 97 <> 0""".stripMargin,
    // c15 is the bloom-prefiltered physical form of c6 — the sketch only
    // prunes, the exact join confirms, so the oracle is the same plain SQL
    "c15_decontaminate_bloom" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |cor AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0),
        |ov AS (SELECT doc_id, count(*) AS shared
        |  FROM cor JOIN bench USING(g) GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  COALESCE(ov.shared, 0) AS n_shared,
        |  COALESCE(ov.shared, 0) >= 3 AS contaminated
        |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
        |WHERE d.doc_id % 97 <> 0""".stripMargin,
    "c16_shuffle_shard" ->
      """WITH h AS (SELECT doc_id,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('shard:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('shard:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('shard:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS sh,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('ord:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('ord:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('ord:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS sort_key
        | FROM documents)
        |SELECT doc_id, sh % 8 AS shard, sort_key FROM h""".stripMargin,
    "c17_dsir_resample" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('fh:' || tok), c, 1)) <= 57
        |         THEN ascii(substr(md5('fh:' || tok), c, 1)) - 48
        |         ELSE ascii(substr(md5('fh:' || tok), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 64 AS bucket,
        |  doc_id % 97 = 0 AS is_t FROM t),
        |tc AS (SELECT bucket, COUNT(*) AS tb FROM h WHERE is_t GROUP BY 1),
        |rc AS (SELECT bucket, COUNT(*) AS rb FROM h WHERE NOT is_t GROUP BY 1),
        |tot AS (SELECT (SELECT COUNT(*) FROM h WHERE is_t) AS tt,
        |               (SELECT COUNT(*) FROM h WHERE NOT is_t) AS rt),
        |lam AS (SELECT rc.bucket,
        |  CAST(round(ln(COALESCE(tc.tb, 0) + 1.0) - ln(tt + 64.0)
        |           - ln(rc.rb + 1.0) + ln(rt + 64.0), 5) AS DECIMAL(18,6)) AS lam
        |  FROM rc LEFT JOIN tc USING(bucket) CROSS JOIN tot),
        |w AS (SELECT h.doc_id, COUNT(*) AS n_tokens, SUM(lam) AS wsum
        |  FROM h JOIN lam USING(bucket) WHERE NOT is_t GROUP BY 1),
        |sel AS (SELECT doc_id FROM w ORDER BY wsum DESC, doc_id LIMIT 100)
        |SELECT w.doc_id, w.n_tokens, CAST(w.wsum AS DOUBLE) AS logratio,
        |  w.doc_id IN (SELECT doc_id FROM sel) AS selected
        |FROM w""".stripMargin,
    "c18_unimax" ->
      """WITH pl AS (SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |c AS (SELECT lang, n_docs, tokens, tokens * 2 AS cap FROM pl),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cap, lang) AS i,
        |  COALESCE(SUM(cap) OVER (ORDER BY cap, lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
        |  COUNT(*) OVER () AS nlang FROM c),
        |f AS (SELECT *, cap * (nlang - i + 1) + pre <= 20000 AS capped FROM r),
        |ks AS (SELECT CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS k,
        |  CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END) AS BIGINT) AS s FROM f)
        |SELECT lang, n_docs, tokens, cap,
        |  CASE WHEN capped THEN CAST(cap AS DOUBLE)
        |       ELSE CAST(20000 - ks.s AS DOUBLE) / (nlang - ks.k)
        |  END AS alloc_tokens
        |FROM f CROSS JOIN ks""".stripMargin,
    // c18's schedule divided down to epochs/language, then the repeat
    // explode with the c1-style md5 basis-point gate for the fraction.
    "c19_epoch_expand" ->
      """WITH pl AS (SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |c AS (SELECT lang, n_docs, tokens, tokens * 2 AS cap FROM pl),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cap, lang) AS i,
        |  COALESCE(SUM(cap) OVER (ORDER BY cap, lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
        |  COUNT(*) OVER () AS nlang FROM c),
        |f AS (SELECT *, cap * (nlang - i + 1) + pre <= 20000 AS capped FROM r),
        |ks AS (SELECT CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS k,
        |  CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END) AS BIGINT) AS s FROM f),
        |sch AS (SELECT lang,
        |  (CASE WHEN capped THEN CAST(cap AS DOUBLE)
        |        ELSE CAST(20000 - ks.s AS DOUBLE) / (nlang - ks.k)
        |   END) / tokens AS epochs
        |  FROM f CROSS JOIN ks),
        |s2 AS (SELECT lang, CAST(floor(epochs) AS BIGINT) AS full_ep,
        |  CAST(floor((epochs - floor(epochs)) * 10000.0) AS BIGINT) AS rem_bp
        |  FROM sch),
        |dn AS (SELECT doc_id, d.lang,
        |  full_ep + (CASE WHEN
        |    CAST(list_reduce(list_transform(range(1, 8), ch ->
        |      CASE WHEN ascii(substr(md5('ep:' || doc_id), ch, 1)) <= 57
        |           THEN ascii(substr(md5('ep:' || doc_id), ch, 1)) - 48
        |           ELSE ascii(substr(md5('ep:' || doc_id), ch, 1)) - 87 END),
        |      (a, v) -> a * 16 + v) AS BIGINT) % 10000 < rem_bp
        |    THEN 1 ELSE 0 END) AS n_copies
        |  FROM documents d JOIN s2 ON d.lang = s2.lang)
        |SELECT doc_id, lang, UNNEST(range(0, n_copies)) AS epoch
        |FROM dn WHERE n_copies > 0""".stripMargin,
    // x3's composite score, 10 fixed buckets, per-source total variation
    // distance between the even/odd snapshot distributions; bucket gaps
    // decimal-accumulated so the sum is order-independent
    "c20_quality_drift" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    len(string_split(text,' ')) AS n FROM documents),
        |m AS (SELECT doc_id, source,
        |  0.4 * (CAST(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS DOUBLE) / n)
        |  + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 1))
        |  + 0.3 * (least(CAST(length(text) - (n - 1) AS DOUBLE) / n, 8.0) / 8.0)
        |    AS score
        |  FROM t),
        |b AS (SELECT source, doc_id % 2 AS side,
        |  CAST(least(floor(score * 10), 9.0) AS BIGINT) AS bucket FROM m),
        |c AS (SELECT source, bucket,
        |  CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        |  CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |  FROM b GROUP BY 1, 2),
        |tt AS (SELECT source, CAST(sum(n_old) AS BIGINT) AS t_old,
        |  CAST(sum(n_new) AS BIGINT) AS t_new FROM c GROUP BY 1),
        |agg AS (SELECT c.source,
        |  CAST(max(t_old) AS BIGINT) AS n_old_docs,
        |  CAST(max(t_new) AS BIGINT) AS n_new_docs,
        |  CAST(SUM(CAST(abs(
        |    CASE WHEN t_old > 0 THEN CAST(n_old AS DOUBLE) / t_old ELSE 0.0 END -
        |    CASE WHEN t_new > 0 THEN CAST(n_new AS DOUBLE) / t_new ELSE 0.0 END)
        |    AS DECIMAL(38,6))) AS DOUBLE) / 2 AS tv_distance
        |  FROM c JOIN tt USING (source) GROUP BY c.source)
        |SELECT source, n_old_docs, n_new_docs, tv_distance,
        |  tv_distance > 0.1 AS drifted
        |FROM agg""".stripMargin,
    "q28_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q29_scalar_subquery" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part p
        |WHERE p_retailprice > (
        |  SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
        |           / COUNT(*)
        |  FROM part p2 WHERE p2.p_brand = p.p_brand)""".stripMargin,
    "q25_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q26_salted_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q27_sliding_window" ->
      """WITH e AS (SELECT event_type, value,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |w AS (SELECT event_type, value,
        |  (sec // 1800) * 1800 - s.k AS win_start
        |  FROM e, (SELECT unnest([0, 1800]) AS k) s)
        |SELECT win_start, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "d2_minhash_lsh" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.7""".stripMargin,
    "d3_simhash" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS word FROM ws),
        |h AS (SELECT doc_id, md5('w:' || word) AS hx FROM tok),
        |bits AS (SELECT doc_id, b,
        |  CASE WHEN ((CASE WHEN ascii(substr(hx, b // 4 + 1, 1)) <= 57
        |              THEN ascii(substr(hx, b // 4 + 1, 1)) - 48
        |              ELSE ascii(substr(hx, b // 4 + 1, 1)) - 87 END)
        |             >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END AS v
        |  FROM h, range(60) t(b)),
        |agg AS (SELECT doc_id, b, sum(v) AS sb FROM bits GROUP BY doc_id, b)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN sb > 0 THEN power(2, b)::BIGINT ELSE 0 END) AS BIGINT) AS simhash
        |FROM agg GROUP BY doc_id""".stripMargin,
    "d9_simhash_pairs" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS word FROM ws),
        |h AS (SELECT doc_id, md5('w:' || word) AS hx FROM tok),
        |bits AS (SELECT doc_id, b,
        |  CASE WHEN ((CASE WHEN ascii(substr(hx, b // 4 + 1, 1)) <= 57
        |              THEN ascii(substr(hx, b // 4 + 1, 1)) - 48
        |              ELSE ascii(substr(hx, b // 4 + 1, 1)) - 87 END)
        |             >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END AS v
        |  FROM h, range(60) t(b)),
        |agg AS (SELECT doc_id, b, sum(v) AS sb FROM bits GROUP BY doc_id, b),
        |s AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN sb > 0 THEN power(2, b)::BIGINT ELSE 0 END) AS BIGINT) AS simhash
        |  FROM agg GROUP BY doc_id),
        |bnd AS (SELECT doc_id, simhash, j,
        |  (simhash >> (15 * j)) & 32767 AS bv FROM s, range(4) t(j)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS sa, b.simhash AS sb
        |  FROM bnd a JOIN bnd b
        |    ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(sa, sb)::BIT) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)::BIT) <= 3""".stripMargin,
    "d4_ngram_jaccard" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |sk AS (SELECT doc_id,
        |  unnest(list_sort(list_transform(s, x -> md5('f:' || x)))[1:4]) AS h FROM sh),
        |skk AS (SELECT s0.* FROM sk s0
        |  QUALIFY count(*) OVER (PARTITION BY s0.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM skk a JOIN skk b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |g AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))) AS g3
        |  FROM documents WHERE length(text) >= 3),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.g3, y.g3)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.g3, y.g3))) AS jaccard3
        |  FROM cand JOIN g x ON x.doc_id = doc_a JOIN g y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, jaccard3 FROM jac WHERE jaccard3 >= 0.6""".stripMargin,
    // d4's sketch blocking, but scored asymmetrically on the word-shingle
    // sets themselves: containment(A->B) = |A∩B| / |A|.
    "d15_containment" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |sk AS (SELECT doc_id,
        |  unnest(list_sort(list_transform(s, x -> md5('f:' || x)))[1:4]) AS h FROM sh),
        |skk AS (SELECT s0.* FROM sk s0
        |  QUALIFY count(*) OVER (PARTITION BY s0.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM skk a JOIN skk b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |ct AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(x.s) AS cont_a_in_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(y.s) AS cont_b_in_a
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, cont_a_in_b, cont_b_in_a FROM ct
        |WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.8""".stripMargin,
    "d5_embed_dedup" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * b.x[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> a.x[i] * a.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> b.x[i] * b.x[i]), (p,q) -> p + q))) AS cos
        | FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, cos FROM p WHERE cos >= 0.4""".stripMargin,
    "c14_semdedup" ->
      """WITH RECURSIVE v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * b.x[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> a.x[i] * a.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> b.x[i] * b.x[i]), (p,q) -> p + q))) AS cos
        | FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id),
        |e AS (SELECT vec_a AS a, vec_b AS b FROM p WHERE cos >= 0.4),
        |ed AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |c AS (SELECT doc, min(lab) AS lab FROM reach GROUP BY doc)
        |SELECT d.doc_id, COALESCE(c.lab, d.doc_id) AS cluster_rep,
        |  COALESCE(c.lab, d.doc_id) = d.doc_id AS keep
        |FROM documents d LEFT JOIN c ON c.doc = d.doc_id""".stripMargin,
    "d6_source_sketch" ->
      """WITH ws AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |h AS (SELECT DISTINCT source, md5('f:' || unnest(s)) AS h FROM sh),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h)
        |SELECT source, string_agg(h, '|' ORDER BY h) AS sketch
        |FROM r WHERE rn <= 4 GROUP BY source""".stripMargin,
    "d11_source_overlap" ->
      """WITH ws AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |h AS (SELECT DISTINCT source, md5('f:' || unnest(s)) AS h FROM sh),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
        |kk AS (SELECT source, h FROM r WHERE rn <= 16),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |  count(*) AS n_common
        |  FROM kk a JOIN kk b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2),
        |sz AS (SELECT source, count(*) AS n FROM kk GROUP BY 1)
        |SELECT source_a, source_b, n_common,
        |  CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard_est
        |FROM p JOIN sz sa ON sa.source = source_a
        |JOIN sz sb ON sb.source = source_b""".stripMargin,
    "d7_neardup_components" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc)
        |SELECT doc AS doc_id, min(lab) AS cluster_rep,
        |  doc = min(lab) AS keep
        |FROM reach GROUP BY doc""".stripMargin,
    // d7's clusters with the keep-longest winner rule (n_chars desc, id).
    "d22_keep_longest" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc AS doc_id, min(lab) AS cluster_rep
        |  FROM reach GROUP BY doc),
        |mem AS (SELECT dec.doc_id, dec.cluster_rep, d.n_chars
        |  FROM dec JOIN documents d ON d.doc_id = dec.doc_id),
        |win AS (SELECT cluster_rep, doc_id AS winner_id FROM (
        |  SELECT cluster_rep, doc_id, row_number() OVER (
        |    PARTITION BY cluster_rep ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM mem) t WHERE rn = 1)
        |SELECT mem.doc_id, mem.cluster_rep, win.winner_id,
        |  mem.doc_id = win.winner_id AS keep
        |FROM mem JOIN win ON mem.cluster_rep = win.cluster_rep""".stripMargin,
    "d13_incremental_dedup" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandi AS (SELECT b0.* FROM band b0 WHERE b0.doc_id % 10 = 0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |bandn AS (SELECT b0.* FROM band b0 WHERE b0.doc_id % 10 <> 0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_id, b.doc_id AS dup_of
        |  FROM bandi a JOIN bandn b
        |    ON a.band = b.band AND a.bkey = b.bkey
        |  GROUP BY 1, 2)
        |SELECT cand.doc_id AS doc_id, cand.dup_of AS dup_of,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |FROM cand JOIN sh x ON x.doc_id = cand.doc_id
        |  JOIN sh y ON y.doc_id = cand.dup_of
        |WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) >= 0.7""".stripMargin,
    // d12 computes the SAME decisions as d7 through the star-contraction
    // scale path — one oracle definition, two engine algorithms.
    "d12_cc_star" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc)
        |SELECT doc AS doc_id, min(lab) AS cluster_rep,
        |  doc = min(lab) AS keep
        |FROM reach GROUP BY doc""".stripMargin,
    "d8_dedup_apply" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc),
        |drops AS (SELECT doc FROM dec WHERE doc <> rep)
        |SELECT d.source, count(*) AS n_docs_kept
        |FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc
        |WHERE drops.doc IS NULL
        |GROUP BY d.source""".stripMargin,
    // d8's component chain, aggregated into the dropped-mass report.
    "d16_dedup_report" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |hx AS (SELECT doc_id, md5('m:' || shingle) AS h FROM tok),
        |base AS (SELECT doc_id, CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(h, c, 1)) <= 57
        |           THEN ascii(substr(h, c, 1)) - 48
        |           ELSE ascii(substr(h, c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS b FROM hx),
        |mh AS (SELECT doc_id, k,
        |  min(([1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841,
        |        12195257, 13834103, 15485863, 17624813, 19654991][k + 1] * b +
        |       [15487469, 32452843, 49979687, 67867967, 86028121, 104395301,
        |        122949823, 141650939, 160481183, 179424673, 198491317,
        |        217645177][k + 1]) % 1000000007) AS mh
        |  FROM base, range(12) t(k) GROUP BY doc_id, k),
        |band AS (SELECT doc_id, k // 3 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k) AS bkey
        |  FROM mh GROUP BY doc_id, k // 3),
        |bandk AS (SELECT b0.* FROM band b0
        |  QUALIFY count(*) OVER (PARTITION BY b0.band, b0.bkey) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bandk a JOIN bandk b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc),
        |drops AS (SELECT doc FROM dec WHERE doc <> rep),
        |bc AS (SELECT band, bkey, count(*) AS n FROM band GROUP BY 1, 2),
        |sk AS (SELECT doc_id,
        |  unnest(list_sort(list_transform(s, x -> md5('f:' || x)))[1:4]) AS h FROM sh),
        |sc AS (SELECT h, count(*) AS n FROM sk GROUP BY 1),
        |bstat AS (SELECT 'minhash_band' AS family,
        |  count(*) AS n_keys,
        |  CAST(sum(CASE WHEN n > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys,
        |  CAST(sum(CASE WHEN n > 5 THEN n ELSE 0 END) AS BIGINT) AS n_dropped_entries
        |  FROM bc),
        |sstat AS (SELECT 'bottom4_sketch' AS family,
        |  count(*) AS n_keys,
        |  CAST(sum(CASE WHEN n > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys,
        |  CAST(sum(CASE WHEN n > 5 THEN n ELSE 0 END) AS BIGINT) AS n_dropped_entries
        |  FROM sc)
        |SELECT d.source AS section, 'source_dedup' AS kind,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN drops.doc IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped,
        |  CAST(COUNT(*) - SUM(CASE WHEN drops.doc IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(CAST(SUM(CASE WHEN drops.doc IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS DOUBLE) / COUNT(*) AS drop_frac,
        |  CAST(NULL AS BIGINT) AS n_keys,
        |  CAST(NULL AS BIGINT) AS n_hot_keys,
        |  CAST(NULL AS BIGINT) AS n_dropped_entries
        |FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc
        |GROUP BY d.source
        |UNION ALL
        |SELECT family AS section, 'hot_key_cap' AS kind,
        |  CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS n_dropped,
        |  CAST(NULL AS BIGINT) AS n_kept, CAST(NULL AS DOUBLE) AS drop_frac,
        |  n_keys, n_hot_keys, n_dropped_entries
        |FROM (SELECT * FROM bstat UNION ALL SELECT * FROM sstat)""".stripMargin,
    "d10_span_dedup" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |f AS (SELECT doc_id, list_transform(w, x -> CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(md5('r:' || x), c, 1)) <= 57
        |           THEN ascii(substr(md5('r:' || x), c, 1)) - 48
        |           ELSE ascii(substr(md5('r:' || x), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT)) AS varr
        |  FROM ws WHERE len(w) >= 4),
        |r AS (SELECT doc_id, list_transform(range(1, len(varr) - 2), i ->
        |    ((((varr[i] * 131 + varr[i+1]) % 1000000007) * 131 + varr[i+2])
        |      % 1000000007 * 131 + varr[i+3]) % 1000000007) AS roll
        |  FROM f),
        |e AS (SELECT doc_id, unnest(roll) AS h FROM r),
        |sh AS (SELECT h, 1 AS is_shared FROM (
        |  SELECT h, count(DISTINCT doc_id) AS nd FROM e GROUP BY h)
        |  WHERE nd >= 2),
        |a AS (SELECT e.doc_id, count(*) AS n_windows,
        |  count(sh.is_shared) AS n_shared_windows
        | FROM e LEFT JOIN sh ON e.h = sh.h GROUP BY e.doc_id)
        |SELECT doc_id, n_windows, n_shared_windows,
        |  CAST(n_shared_windows AS DOUBLE) / n_windows AS shared_frac,
        |  CAST(n_shared_windows AS DOUBLE) / n_windows > 0.5 AS is_dup_heavy
        |FROM a""".stripMargin,
    // d10's rolling windows with positions; maximal consecutive-shared runs
    // via gaps-and-islands (pos minus per-doc rank is constant in a run)
    "d18_removable_spans" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |f AS (SELECT doc_id, list_transform(w, x -> CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(md5('r:' || x), c, 1)) <= 57
        |           THEN ascii(substr(md5('r:' || x), c, 1)) - 48
        |           ELSE ascii(substr(md5('r:' || x), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT)) AS varr
        |  FROM ws WHERE len(w) >= 4),
        |r AS (SELECT doc_id, list_transform(range(1, len(varr) - 2), i ->
        |    ((((varr[i] * 131 + varr[i+1]) % 1000000007) * 131 + varr[i+2])
        |      % 1000000007 * 131 + varr[i+3]) % 1000000007) AS roll
        |  FROM f),
        |e AS (SELECT doc_id, unnest(range(1, len(roll) + 1)) AS pos,
        |  unnest(roll) AS h FROM r),
        |nd AS (SELECT h FROM (
        |  SELECT h, count(DISTINCT doc_id) AS n FROM e GROUP BY h)
        |  WHERE n >= 2),
        |sp AS (SELECT e.doc_id, e.pos FROM e JOIN nd USING (h)),
        |isl AS (SELECT doc_id, pos,
        |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM sp)
        |SELECT doc_id, min(pos) AS span_start,
        |  CAST(max(pos) - min(pos) + 4 AS BIGINT) AS span_len
        |FROM isl GROUP BY doc_id, g""".stripMargin,
    // incoming (doc_id%10=0) scored against the shared-span index of the
    // rest; index membership is distinct-doc-count >= 2 on the 90% side
    "d19_span_vs_index" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |f AS (SELECT doc_id, list_transform(w, x -> CAST(list_reduce(
        |    list_transform(range(1, 8), c ->
        |      CASE WHEN ascii(substr(md5('r:' || x), c, 1)) <= 57
        |           THEN ascii(substr(md5('r:' || x), c, 1)) - 48
        |           ELSE ascii(substr(md5('r:' || x), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT)) AS varr
        |  FROM ws WHERE len(w) >= 4),
        |r AS (SELECT doc_id, list_transform(range(1, len(varr) - 2), i ->
        |    ((((varr[i] * 131 + varr[i+1]) % 1000000007) * 131 + varr[i+2])
        |      % 1000000007 * 131 + varr[i+3]) % 1000000007) AS roll
        |  FROM f),
        |e AS (SELECT doc_id, unnest(roll) AS h FROM r),
        |idx AS (SELECT h FROM (
        |  SELECT h, count(DISTINCT doc_id) AS nd FROM e
        |  WHERE doc_id % 10 <> 0 GROUP BY h) WHERE nd >= 2),
        |inc AS (SELECT doc_id, h FROM e WHERE doc_id % 10 = 0),
        |a AS (SELECT inc.doc_id, count(*) AS n_windows,
        |  count(idx.h) AS n_indexed_windows
        |  FROM inc LEFT JOIN idx ON inc.h = idx.h GROUP BY inc.doc_id)
        |SELECT doc_id, n_windows, n_indexed_windows,
        |  CAST(n_indexed_windows AS DOUBLE) / n_windows AS indexed_frac,
        |  CAST(n_indexed_windows AS DOUBLE) / n_windows > 0.5
        |    AS is_boilerplate_heavy
        |FROM a""".stripMargin,
    "e2_int8_quantize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |m AS (SELECT vec_id, x,
        |  list_max(list_transform(x, a -> abs(a))) AS maxabs FROM v),
        |q AS (SELECT vec_id, x, maxabs,
        |  CASE WHEN maxabs = 0
        |       THEN list_transform(x, a -> 0.0)
        |       ELSE list_transform(x, a -> floor(a * (127.0 / maxabs) + 0.5))
        |  END AS qv
        | FROM m)
        |SELECT vec_id, maxabs / 127.0 AS scale,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, 65), i ->
        |    (x[i] - qv[i] * (maxabs / 127.0)) * (x[i] - qv[i] * (maxabs / 127.0)))),
        |    (a, b) -> a + b) AS l2_err_sq,
        |  list_max(list_transform(range(1, 65), i ->
        |    abs(x[i] - qv[i] * (maxabs / 127.0)))) AS max_abs_err
        |FROM q""".stripMargin,
    // sums of squared grid values exceed int64 → decimal→double goes
    // through VARCHAR (same DuckDB int128-cast quirk as q33)
    "e3_zscore_normalize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim),
        |e AS (SELECT vec_id, CAST(dim AS INT) AS dim,
        |  x[dim + 1] AS v FROM v CROSS JOIN dims),
        |st AS (SELECT dim,
        |  CAST(CAST(SUM(CAST(round(v * 1.0e9) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sg,
        |  CAST(CAST(SUM(CAST(round(v * 1.0e9) * round(v * 1.0e9) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sg2,
        |  count(*) AS n
        | FROM e GROUP BY dim),
        |m AS (SELECT dim, sg / n / 1.0e9 AS mu, sg2 / (n * 1.0e18) AS ex2
        | FROM st),
        |s AS (SELECT dim, mu, ex2 - mu * mu AS vr FROM m)
        |SELECT vec_id, e.dim, (v - mu) / sqrt(vr + 1.0e-9) AS zscore
        |FROM e JOIN s ON e.dim = s.dim""".stripMargin,
    "e6_matryoshka" ->
      """WITH v AS (SELECT vec_id, label, (embedding::DOUBLE[])[1:16] AS t FROM embeddings),
        |n AS (SELECT vec_id, label, t,
        |  sqrt(list_reduce(list_transform(range(1,17), i -> t[i] * t[i]),
        |    (a,b) -> a + b)) AS nrm FROM v),
        |dims AS (SELECT UNNEST(range(0, 16)) AS dim)
        |SELECT vec_id, label, CAST(dim AS INT) AS dim,
        |  t[dim + 1] / nrm AS mval
        |FROM n CROSS JOIN dims""".stripMargin,
    "e7_binary_quantize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)
        |SELECT vec_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), i ->
        |    CASE WHEN x[i + 1] >= 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)),
        |    (a, w) -> a | w) AS w0,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), i ->
        |    CASE WHEN x[i + 33] >= 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)),
        |    (a, w) -> a | w) AS w1,
        |  CAST(len(list_filter(x, y -> y >= 0)) AS BIGINT) AS n_pos
        |FROM v""".stripMargin,
    // Grid sums stay within int64 (|x_i·x_j|·1e9 ≤ ~3.5e8 per row here);
    // e16: per-dimension mean/variance from 1e-9-grid integer sums (the
    // e8/g1 parity pattern); the divisions and the E[x²]−E[x]² subtraction
    // are plain IEEE after the exact sums.
    "e16_dim_stats" ->
      """WITH v AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |d AS (SELECT UNNEST(range(1, 65)) AS i),
        |g AS (SELECT d.i - 1 AS dim,
        |    CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(round(v.x[d.i] * 1.0e9) AS DECIMAL(38,0))) AS s,
        |    SUM(CAST(round(v.x[d.i] * v.x[d.i] * 1.0e9)
        |      AS DECIMAL(38,0))) AS s2
        |  FROM v CROSS JOIN d GROUP BY d.i)
        |SELECT dim, n,
        |  (CAST(s AS DOUBLE) / 1.0e9) / n AS mean,
        |  (CAST(s2 AS DOUBLE) / 1.0e9) / n
        |    - ((CAST(s AS DOUBLE) / 1.0e9) / n)
        |      * ((CAST(s AS DOUBLE) / 1.0e9) / n) AS variance
        |FROM g""".stripMargin,
    // DuckDB SUM(BIGINT) yields HUGEINT → CAST back to BIGINT before the
    // double divide (the q33 int128 quirk).
    "e8_gram_matrix" ->
      """WITH v AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |pr AS (SELECT UNNEST(range(0, 64)) AS d),
        |pairs AS (SELECT a.d AS i, b.d AS j
        |  FROM pr a CROSS JOIN pr b WHERE b.d >= a.d)
        |SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
        |  CAST(CAST(SUM(CAST(round(x[p.i + 1] * x[p.j + 1] * 1.0e9) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 1.0e9 AS gram,
        |  COUNT(*) AS n
        |FROM v CROSS JOIN pairs p GROUP BY p.i, p.j""".stripMargin,
    // e8's Gram matrix mirrored symmetric, then 8 grid-stabilized power
    // iterations in a recursive CTE (GROUP BY matvec + windowed norm per
    // step); every sum is over 1e-9-grid integers so the loadings are
    // bit-identical to the driver-side loop.
    "e9_pc1_power" ->
      """WITH RECURSIVE ve AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |pr AS (SELECT UNNEST(range(0, 64)) AS d),
        |pairs AS (SELECT a.d AS i, b.d AS j
        |  FROM pr a CROSS JOIN pr b WHERE b.d >= a.d),
        |g0 AS (SELECT p.i, p.j,
        |  CAST(CAST(SUM(CAST(round(x[p.i + 1] * x[p.j + 1] * 1.0e9) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 1.0e9 AS gram
        |  FROM ve CROSS JOIN pairs p GROUP BY p.i, p.j),
        |gm AS (SELECT i, j, gram FROM g0
        |  UNION ALL SELECT j AS i, i AS j, gram FROM g0 WHERE i <> j),
        |pw(it, d, vv, lam) AS (
        |  SELECT 0, d, CAST(1.0 AS DOUBLE) / 64, CAST(0 AS DOUBLE) FROM pr
        |  UNION ALL
        |  SELECT it + 1, d, w / nrm, nrm FROM (
        |    SELECT it, d, w,
        |      sqrt(CAST(CAST(SUM(CAST(round(w * w * 1.0e9) AS BIGINT))
        |        OVER (PARTITION BY it) AS BIGINT) AS DOUBLE) / 1.0e9) AS nrm
        |    FROM (
        |      SELECT pw.it, gm.i AS d,
        |        CAST(CAST(SUM(CAST(round(gm.gram * pw.vv * 1.0e9) AS BIGINT))
        |          AS BIGINT) AS DOUBLE) / 1.0e9 AS w
        |      FROM pw JOIN gm ON gm.j = pw.d WHERE pw.it < 8
        |      GROUP BY pw.it, gm.i) a) b
        |)
        |SELECT CAST(d AS INT) AS dim, vv AS loading, lam AS eigenvalue
        |FROM pw WHERE it = 8""".stripMargin,
    // e9's converged direction folded to a list, then the pure per-row
    // projection x' = x - (v.x) v, long-form like e3/e6.
    "e10_remove_pc1" ->
      """WITH RECURSIVE ve AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |pr AS (SELECT UNNEST(range(0, 64)) AS d),
        |pairs AS (SELECT a.d AS i, b.d AS j
        |  FROM pr a CROSS JOIN pr b WHERE b.d >= a.d),
        |g0 AS (SELECT p.i, p.j,
        |  CAST(CAST(SUM(CAST(round(x[p.i + 1] * x[p.j + 1] * 1.0e9) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 1.0e9 AS gram
        |  FROM ve CROSS JOIN pairs p GROUP BY p.i, p.j),
        |gm AS (SELECT i, j, gram FROM g0
        |  UNION ALL SELECT j AS i, i AS j, gram FROM g0 WHERE i <> j),
        |pw(it, d, vv, lam) AS (
        |  SELECT 0, d, CAST(1.0 AS DOUBLE) / 64, CAST(0 AS DOUBLE) FROM pr
        |  UNION ALL
        |  SELECT it + 1, d, w / nrm, nrm FROM (
        |    SELECT it, d, w,
        |      sqrt(CAST(CAST(SUM(CAST(round(w * w * 1.0e9) AS BIGINT))
        |        OVER (PARTITION BY it) AS BIGINT) AS DOUBLE) / 1.0e9) AS nrm
        |    FROM (
        |      SELECT pw.it, gm.i AS d,
        |        CAST(CAST(SUM(CAST(round(gm.gram * pw.vv * 1.0e9) AS BIGINT))
        |          AS BIGINT) AS DOUBLE) / 1.0e9 AS w
        |      FROM pw JOIN gm ON gm.j = pw.d WHERE pw.it < 8
        |      GROUP BY pw.it, gm.i) a) b
        |),
        |pc AS (SELECT list(vv ORDER BY d) AS v FROM pw WHERE it = 8),
        |vx AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |pj AS (SELECT vec_id, x,
        |  list_reduce(list_transform(range(1, 65), i -> x[i] * pc.v[i]),
        |    (a, b) -> a + b) AS proj
        |  FROM vx CROSS JOIN pc)
        |SELECT vec_id, CAST(dd AS INT) AS dim,
        |  x[dd + 1] - proj * pc.v[dd + 1] AS wval
        |FROM pj CROSS JOIN pc
        |  CROSS JOIN (SELECT UNNEST(range(0, 64)) AS dd)""".stripMargin,
    "e5_pq_encode" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |sub AS (SELECT vec_id, s, x[(16*s+1):(16*s+16)] AS sx
        |  FROM v CROSS JOIN (SELECT UNNEST(range(0, 4)) AS s)),
        |seeds AS (SELECT s, sx AS cx,
        |    CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) AS INT)
        |      AS code
        |  FROM sub WHERE vec_id % 61 = 0 AND vec_id < 61 * 256),
        |d0 AS (SELECT u.vec_id, u.s, se.code, u.sx,
        |  list_reduce(list_transform(range(1, 17), i ->
        |    (u.sx[i] - se.cx[i]) * (u.sx[i] - se.cx[i])), (a, b) -> a + b)
        |    AS d2
        |  FROM sub u JOIN seeds se ON u.s = se.s),
        |a0 AS (SELECT vec_id, s, code, sx FROM (SELECT vec_id, s, code, sx,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)
        |      AS rn FROM d0) WHERE rn = 1),
        |m1 AS (SELECT s, code, list(m ORDER BY i) AS mx FROM (
        |  SELECT a.s, a.code, d.i,
        |    CAST(SUM(CAST(round(a.sx[d.i] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS m
        |  FROM a0 a CROSS JOIN (SELECT UNNEST(range(1, 17)) AS i) d
        |  GROUP BY a.s, a.code, d.i) GROUP BY s, code),
        |cb AS (SELECT se.s, se.code, COALESCE(m1.mx, se.cx) AS cx
        |  FROM seeds se LEFT JOIN m1 ON se.s = m1.s AND se.code = m1.code),
        |df AS (SELECT u.vec_id, u.s, c.code,
        |  list_reduce(list_transform(range(1, 17), i ->
        |    (u.sx[i] - c.cx[i]) * (u.sx[i] - c.cx[i])), (a, b) -> a + b)
        |    AS d2
        |  FROM sub u JOIN cb c ON u.s = c.s)
        |SELECT vec_id, CAST(s AS INT) AS subspace, code, d2 AS err2
        |FROM (SELECT vec_id, s, code, d2,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)
        |      AS rn FROM df) WHERE rn = 1""".stripMargin,
    // Bloom pre-filtering is a physical rewrite (false positives are removed
    // by the join) — the oracle is the plain join.
    "q65_monthly_growth" ->
      """WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
        |    AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |    AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT month, revenue, n_orders,
        |  lag(revenue) OVER (ORDER BY month) AS prev_revenue,
        |  CASE WHEN lag(revenue) OVER (ORDER BY month) > 0
        |    THEN (revenue - lag(revenue) OVER (ORDER BY month))
        |      / lag(revenue) OVER (ORDER BY month) END AS growth
        |FROM m""".stripMargin,
    "q64_regional_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |GROUP BY r_name""".stripMargin,
    "q36_bloom_join" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus""".stripMargin,
    "q37_snapshot_diff" ->
      """WITH old AS (SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 7 <> 0),
        |new AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
        |       ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
        |  CASE WHEN old.o_orderkey IS NULL THEN 'insert'
        |       WHEN new.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  old.o_totalprice AS old_o_totalprice,
        |  new.o_totalprice AS new_o_totalprice
        |FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
        |WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
        |   OR old.o_totalprice IS DISTINCT FROM new.o_totalprice""".stripMargin,
    "e4_random_projection" ->
      """WITH sgn AS (SELECT j, i,
        |  CASE WHEN CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('rp:' || j || ':' || i), c, 1)) <= 57
        |         THEN ascii(substr(md5('rp:' || j || ':' || i), c, 1)) - 48
        |         ELSE ascii(substr(md5('rp:' || j || ':' || i), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
        |  FROM range(16) t1(j), range(64) t2(i)),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |e AS (SELECT vec_id, CAST(i AS INT) AS i,
        |  CAST(round(x[i + 1] * 1.0e9) AS BIGINT) AS g
        |  FROM v CROSS JOIN (SELECT UNNEST(range(0, 64)) AS i))
        |SELECT vec_id, CAST(j AS INT) AS out_dim,
        |  CAST(SUM(g * s) AS DOUBLE) / 1.0e9 AS proj
        |FROM e JOIN sgn ON e.i = sgn.i
        |GROUP BY vec_id, j""".stripMargin,
    // NTILE semantics are rank-arithmetic (no float boundaries) — the
    // distributed two-phase rank must reproduce ntile() exactly.
    "q38_equidepth" ->
      """WITH b AS (SELECT value,
        |  ntile(8) OVER (ORDER BY value, event_id) AS bucket FROM events)
        |SELECT bucket, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
        |FROM b GROUP BY bucket""".stripMargin,
    "q39_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id)
        |SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT 2, 'click', count(*) FROM c
        |UNION ALL SELECT 3, 'purchase', count(*) FROM p""".stripMargin,
    "q41_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS from_type
        |  FROM events)
        |SELECT from_type, event_type AS to_type, count(*) AS n_transitions
        |FROM s WHERE from_type IS NOT NULL
        |GROUP BY from_type, event_type""".stripMargin,
    // ps CAST to DOUBLE in the rank targets: DuckDB's bare 0.05 literal is
    // DECIMAL, and decimal ceil(p*n) parts ways with Spark's double at
    // exact-integer boundaries (0.05·2000: double 200.0000…11 → 201).
    "q62_winsorize" ->
      """WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT event_type, p, CAST(ceil(p * n) AS BIGINT) AS rnk
        |  FROM c CROSS JOIN (SELECT UNNEST(
        |    [CAST(0.05 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS p)),
        |r AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rnk
        |  FROM events),
        |qv AS (SELECT r.event_type, t.p, r.value AS q_value
        |  FROM r JOIN t ON t.event_type = r.event_type AND t.rnk = r.rnk),
        |b AS (SELECT event_type,
        |    min(CASE WHEN p = CAST(0.05 AS DOUBLE) THEN q_value END) AS lo_v,
        |    min(CASE WHEN p = CAST(0.95 AS DOUBLE) THEN q_value END) AS hi_v
        |  FROM qv GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  greatest(least(e.value, b.hi_v), b.lo_v) AS value_winsorized,
        |  (e.value < b.lo_v OR e.value > b.hi_v) AS clipped
        |FROM events e JOIN b ON b.event_type = e.event_type""".stripMargin,
    // Trailing-frame Σv/Σv² as DECIMAL(18,6)/(36,12) (exact both engines);
    // mean/var/z in the same fixed-order double expressions.
    "q63_rolling_anomaly" ->
      """WITH s AS (SELECT user_id, event_id, value,
        |    count(*) OVER w AS n_prev,
        |    SUM(CAST(value AS DECIMAL(18,6))) OVER w AS s1,
        |    SUM(CAST(value AS DECIMAL(18,6)) *
        |        CAST(value AS DECIMAL(18,6))) OVER w AS s2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT user_id, event_id, value,
        |    CAST(n_prev AS BIGINT) AS n_prev,
        |    CAST(s1 AS DOUBLE) / n_prev AS mean_prev,
        |    CAST(s2 AS DOUBLE) / n_prev AS ex2
        |  FROM s WHERE n_prev >= 5),
        |v AS (SELECT user_id, event_id, value, n_prev, mean_prev,
        |    sqrt(greatest(ex2 - mean_prev * mean_prev, 0.0)) AS std_prev
        |  FROM m)
        |SELECT user_id, event_id, value, n_prev, mean_prev, std_prev,
        |  CASE WHEN std_prev > 0
        |    THEN (value - mean_prev) / std_prev END AS z,
        |  (std_prev > 0 AND
        |   abs((value - mean_prev) / std_prev) > 3.0) AS anomaly
        |FROM v""".stripMargin,
    "q43_group_quantiles" ->
      """WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rnk
        |  FROM events),
        |t AS (SELECT event_type, p, CAST(ceil(p * n) AS BIGINT) AS tr
        |  FROM n CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75, 0.95]) AS p))
        |SELECT t.event_type, p, r.value AS q_value
        |FROM t JOIN r ON r.event_type = t.event_type AND r.rnk = t.tr""".stripMargin,
    // PERCENTILE_CONT with the lerp spelled out — the builtins associate
    // the interpolation differently across engines.
    "q47_percentile_cont" ->
      """WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |t0 AS (SELECT event_type, CAST(p AS DOUBLE) AS p,
        |  CAST(n - 1 AS DOUBLE) * CAST(p AS DOUBLE) + 1.0 AS h
        |  FROM n CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75]) AS p)),
        |t AS (SELECT event_type, p, CAST(floor(h) AS BIGINT) AS lo,
        |  CAST(ceil(h) AS BIGINT) AS hi, h - floor(h) AS frac FROM t0),
        |r AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rnk
        |  FROM events),
        |j AS (SELECT t.event_type, p, frac,
        |  MIN(CASE WHEN rnk = lo THEN value END) AS v_lo,
        |  MIN(CASE WHEN rnk = hi THEN value END) AS v_hi
        |  FROM r JOIN t ON r.event_type = t.event_type
        |    AND (rnk = lo OR rnk = hi)
        |  GROUP BY 1, 2, 3)
        |SELECT event_type, p, v_lo + frac * (v_hi - v_lo) AS pval
        |FROM j""".stripMargin,
    // Per-key day grid via generate_series; forward fill is the same
    // last_value IGNORE NULLS running lookup as the Spark window.
    "q48_gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    count(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS day_value
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        |grid AS (SELECT user_id, CAST(g AS DATE) AS day
        |  FROM spans, LATERAL unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(g)),
        |j AS (SELECT grid.user_id, grid.day,
        |    COALESCE(daily.n_events, 0) AS n_events,
        |    last_value(daily.day_value IGNORE NULLS) OVER (
        |      PARTITION BY grid.user_id ORDER BY grid.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |  FROM grid LEFT JOIN daily
        |    ON grid.user_id = daily.user_id AND grid.day = daily.day)
        |SELECT user_id,
        |  CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS day_num,
        |  n_events, filled_value
        |FROM j""".stripMargin,
    // Lower weighted median over the per-price pre-aggregate; 2·cumw >=
    // totw keeps the arithmetic in DECIMAL (no half-total division).
    "q49_weighted_median" ->
      """WITH byp AS (SELECT l_returnflag, l_extendedprice,
        |    SUM(CAST(l_quantity AS DECIMAL(38,6))) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, l_extendedprice,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS totw
        |  FROM byp)
        |SELECT l_returnflag, min(l_extendedprice) AS w_median,
        |  CAST(max(totw) AS DOUBLE) AS total_weight
        |FROM c WHERE cumw * 2 >= totw
        |GROUP BY l_returnflag""".stripMargin,
    // RANGE frame over epoch seconds: ties share a frame in both engines.
    "q50_rolling_range" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(floor(epoch(o_orderdate)) AS BIGINT) AS sec, o_totalprice
        |  FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY sec
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_revenue,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY sec
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |    AS trailing_orders
        |FROM o""".stripMargin,
    // Gaps-and-islands by rank difference; longest streak's start via a
    // deterministic (len DESC, start ASC) rank.
    "q51_streaks" ->
      """WITH daily AS (SELECT DISTINCT user_id,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day_num
        |  FROM events),
        |g AS (SELECT user_id, day_num,
        |    day_num - row_number() OVER (PARTITION BY user_id
        |      ORDER BY day_num) AS grp
        |  FROM daily),
        |s AS (SELECT user_id, grp, count(*) AS len,
        |    min(day_num) AS streak_start
        |  FROM g GROUP BY 1, 2),
        |r AS (SELECT user_id, len, streak_start,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, streak_start) AS rk
        |  FROM s)
        |SELECT s.user_id, count(*) AS n_streaks, max(s.len) AS longest_streak,
        |  CAST(sum(s.len) AS BIGINT) AS active_days,
        |  max(r.streak_start) AS longest_start
        |FROM s JOIN r ON s.user_id = r.user_id AND r.rk = 1
        |GROUP BY s.user_id""".stripMargin,
    // Mode with the tie policy spelled out: count desc, then priority asc.
    "q52_group_mode" ->
      """WITH c AS (SELECT o_custkey, o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, o_orderpriority AS mode_priority, n AS n_mode
        |FROM (SELECT o_custkey, o_orderpriority, n, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY n DESC, o_orderpriority) AS rk
        |  FROM c) t WHERE rk = 1""".stripMargin,
    "q53_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey
        |          AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |        WHERE o2.o_custkey = c.c_custkey
        |          AND o2.o_orderstatus = 'F')""".stripMargin,
    // Union-trick attribution inside one stream: clicks carry forward,
    // purchases read the latest one, window bound is a per-row filter.
    "q55_attribution" ->
      """WITH b AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    event_id, event_type FROM events),
        |u AS (
        |  SELECT user_id, t, 0 AS side,
        |    CAST(NULL AS BIGINT) AS purchase_id, event_id AS click_id
        |  FROM b WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, t, 1, event_id, CAST(NULL AS BIGINT)
        |  FROM b WHERE event_type = 'purchase'),
        |m AS (SELECT user_id, t, side, purchase_id,
        |  last_value(click_id IGNORE NULLS) OVER w AS cand_click,
        |  last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
        |    OVER w AS cand_t
        |  FROM u WINDOW w AS (PARTITION BY user_id
        |    ORDER BY t, side, click_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT purchase_id, user_id,
        |  CASE WHEN t - cand_t <= 604800 THEN cand_click END
        |    AS attributed_click,
        |  CASE WHEN t - cand_t <= 604800 THEN t - cand_t END AS lag_sec
        |FROM m WHERE side = 1""".stripMargin,
    "q56_integrity" ->
      """SELECT 'lineitem->orders' AS edge,
        |  (SELECT count(*) FROM lineitem) AS n_child,
        |  (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey
        |   WHERE o.o_orderkey IS NULL) AS n_orphans
        |UNION ALL SELECT 'lineitem->part',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l LEFT JOIN part p
        |     ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
        |UNION ALL SELECT 'lineitem->supplier',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
        |     ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
        |UNION ALL SELECT 'orders->customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o LEFT JOIN customer c
        |     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
        |UNION ALL SELECT 'customer->nation',
        |  (SELECT count(*) FROM customer),
        |  (SELECT count(*) FROM customer c LEFT JOIN nation n
        |     ON c.c_nationkey = n.n_nationkey
        |   WHERE n.n_nationkey IS NULL)""".stripMargin,
    // c4's packer with (cell, doc_id) ordering inside each shard; cell =
    // the embedding label, joined on doc_id = vec_id.
    "c21_pack_similar" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('pk:' || doc_id), c, 1)) <= 57
        |         THEN ascii(substr(md5('pk:' || doc_id), c, 1)) - 48
        |         ELSE ascii(substr(md5('pk:' || doc_id), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 32 AS shard
        | FROM documents),
        |j AS (SELECT t.doc_id, t.shard, t.n_tokens,
        |    CAST(e.label AS BIGINT) AS cell
        |  FROM t JOIN embeddings e ON e.vec_id = t.doc_id),
        |c AS (SELECT doc_id, shard, cell, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY cell, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        | FROM j)
        |SELECT doc_id, shard, cell, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 512 AS BIGINT) AS start_offset
        |FROM c""".stripMargin,
    // Neyman allocation: exact decimal power sums → fixed-order double
    // variance, grid-rounded N_h·σ_h weights, largest-remainder
    // integerization (allocations sum exactly to the budget).
    "c22_neyman_alloc" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nh,
        |    SUM(CAST(n_chars AS DECIMAL(38,0))) AS sx,
        |    SUM(CAST(n_chars * n_chars AS DECIMAL(38,0))) AS sx2
        |  FROM documents GROUP BY source),
        |s1 AS (SELECT source, nh,
        |    sqrt(greatest((CAST(sx2 AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / nh) / nh, 0.0))
        |      AS sigma
        |  FROM per),
        |s2 AS (SELECT source, nh AS n_docs, sigma,
        |    CAST(round(nh * sigma * 1.0e9) AS DECIMAL(38,0)) AS g FROM s1),
        |s3 AS (SELECT source, n_docs, sigma,
        |    1000.0 * (CASE WHEN CAST(SUM(g) OVER () AS DOUBLE) > 0
        |      THEN CAST(g AS DOUBLE) / CAST(SUM(g) OVER () AS DOUBLE)
        |      ELSE CAST(n_docs AS DOUBLE)
        |        / CAST(SUM(n_docs) OVER () AS DOUBLE) END) AS raw
        |  FROM s2),
        |s4 AS (SELECT source, n_docs, sigma, floor(raw) AS base,
        |    raw - floor(raw) AS frac FROM s3),
        |s5 AS (SELECT source, n_docs, sigma, base, frac,
        |    1000 - CAST(SUM(base) OVER () AS BIGINT) AS rem,
        |    row_number() OVER (ORDER BY frac DESC, source) AS rn FROM s4)
        |SELECT source, n_docs, sigma,
        |  CAST(base AS BIGINT) +
        |    (CASE WHEN rn <= rem THEN 1 ELSE 0 END) AS alloc
        |FROM s5""".stripMargin,
    // Three unrolled PageRank iterations on the same 1e-9 decimal grid as
    // the engine: per-edge contributions in doubles (every literal CAST to
    // DOUBLE — bare 1.0/0.85 would be DuckDB decimals with different
    // rounding), grid-rounded, summed as DECIMAL(38,0).
    "g1_pagerank" ->
      """WITH pairc AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |ed AS (SELECT 'c:' || cust AS src, 's:' || supp AS dst, w FROM pairc
        |  UNION ALL
        |  SELECT 's:' || supp, 'c:' || cust, w FROM pairc),
        |ow AS (SELECT src, sum(w) AS wout FROM ed GROUP BY src),
        |e AS (SELECT ed.src, ed.dst, ed.w, ow.wout
        |  FROM ed JOIN ow ON ed.src = ow.src),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |nn AS (SELECT count(*) AS n FROM nd),
        |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS pr
        |  FROM nd CROSS JOIN nn),
        |c1 AS (SELECT e.dst, SUM(CAST(round(p0.pr *
        |    (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE)) * 1.0e9)
        |    AS DECIMAL(38,0))) AS gs
        |  FROM e JOIN p0 ON e.src = p0.node GROUP BY e.dst),
        |p1 AS (SELECT nd.node,
        |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
        |    + CAST(0.85 AS DOUBLE) *
        |      (CAST(COALESCE(c1.gs, 0) AS DOUBLE) / 1.0e9) AS pr
        |  FROM nd CROSS JOIN nn LEFT JOIN c1 ON c1.dst = nd.node),
        |c2 AS (SELECT e.dst, SUM(CAST(round(p1.pr *
        |    (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE)) * 1.0e9)
        |    AS DECIMAL(38,0))) AS gs
        |  FROM e JOIN p1 ON e.src = p1.node GROUP BY e.dst),
        |p2 AS (SELECT nd.node,
        |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
        |    + CAST(0.85 AS DOUBLE) *
        |      (CAST(COALESCE(c2.gs, 0) AS DOUBLE) / 1.0e9) AS pr
        |  FROM nd CROSS JOIN nn LEFT JOIN c2 ON c2.dst = nd.node),
        |c3 AS (SELECT e.dst, SUM(CAST(round(p2.pr *
        |    (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE)) * 1.0e9)
        |    AS DECIMAL(38,0))) AS gs
        |  FROM e JOIN p2 ON e.src = p2.node GROUP BY e.dst),
        |p3 AS (SELECT nd.node,
        |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
        |    + CAST(0.85 AS DOUBLE) *
        |      (CAST(COALESCE(c3.gs, 0) AS DOUBLE) / 1.0e9) AS pr
        |  FROM nd CROSS JOIN nn LEFT JOIN c3 ON c3.dst = nd.node)
        |SELECT node, pr FROM p3""".stripMargin,
    // g5: supplier pairs sharing customers, hub-capped at 100 suppliers
    // per customer (QUALIFY mirrors the agg+anti-join), min-weight
    // affinity — integers end to end.
    "g5_copurchase" ->
      """WITH pair AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |capped AS (SELECT * FROM pair
        |  QUALIFY count(*) OVER (PARTITION BY cust) <= 100)
        |SELECT a.supp AS supp_a, b.supp AS supp_b,
        |  CAST(count(*) AS BIGINT) AS n_shared_customers,
        |  CAST(sum(least(a.w, b.w)) AS BIGINT) AS affinity
        |FROM capped a JOIN capped b
        |  ON a.cust = b.cust AND a.supp < b.supp
        |GROUP BY 1, 2""".stripMargin,
    // g6: the g5 hub cap's accounting row — same pair aggregate, one
    // per-customer degree rollup, all-integer except the final fraction.
    "g6_copurchase_report" ->
      """WITH pair AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |deg AS (SELECT cust, count(*) AS n_supp, sum(w) AS wsum
        |  FROM pair GROUP BY cust)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_excluded_hubs,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN wsum ELSE 0 END) AS BIGINT)
        |    AS excluded_edge_w,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN 0 ELSE wsum END) AS BIGINT)
        |    AS kept_edge_w,
        |  CAST(max(n_supp) AS BIGINT) AS max_fanout,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN 0
        |    ELSE n_supp * (n_supp - 1) // 2 END) AS BIGINT)
        |    AS kept_pair_budget,
        |  CAST(SUM(CASE WHEN n_supp > 100 THEN wsum ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN n_supp > 100 THEN wsum ELSE 0 END)
        |      + SUM(CASE WHEN n_supp > 100 THEN 0 ELSE wsum END) AS DOUBLE)
        |    AS excluded_frac
        |FROM deg""".stripMargin,
    // g2: three unrolled SEMI-synchronous LPA rounds over g1's edge CTEs
    // (bipartite 2-coloring: round 1/3 update c:-side dsts, round 2 the
    // s:-side — fully synchronous LPA oscillates on bipartite graphs).
    // Integer vote weights, winner = (vw DESC, lab ASC), pure
    // string/integer arithmetic so no grid rounding is needed anywhere.
    "g2_label_prop" ->
      """WITH pairc AS (SELECT o_custkey AS cust, l_suppkey AS supp,
        |    count(*) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |e AS (SELECT 'c:' || cust AS src, 's:' || supp AS dst, w FROM pairc
        |  UNION ALL
        |  SELECT 's:' || supp, 'c:' || cust, w FROM pairc),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |l0 AS (SELECT node, node AS lab FROM nd),
        |v1 AS (SELECT e.dst, l.lab, SUM(e.w) AS vw
        |  FROM e JOIN l0 l ON e.src = l.node
        |  WHERE e.dst LIKE 'c:%' GROUP BY 1, 2),
        |w1 AS (SELECT dst, lab FROM (
        |  SELECT dst, lab, row_number() OVER (PARTITION BY dst
        |    ORDER BY vw DESC, lab) AS rn FROM v1) WHERE rn = 1),
        |l1 AS (SELECT l0.node, COALESCE(w1.lab, l0.lab) AS lab
        |  FROM l0 LEFT JOIN w1 ON w1.dst = l0.node),
        |v2 AS (SELECT e.dst, l.lab, SUM(e.w) AS vw
        |  FROM e JOIN l1 l ON e.src = l.node
        |  WHERE e.dst LIKE 's:%' GROUP BY 1, 2),
        |w2 AS (SELECT dst, lab FROM (
        |  SELECT dst, lab, row_number() OVER (PARTITION BY dst
        |    ORDER BY vw DESC, lab) AS rn FROM v2) WHERE rn = 1),
        |l2 AS (SELECT l1.node, COALESCE(w2.lab, l1.lab) AS lab
        |  FROM l1 LEFT JOIN w2 ON w2.dst = l1.node),
        |v3 AS (SELECT e.dst, l.lab, SUM(e.w) AS vw
        |  FROM e JOIN l2 l ON e.src = l.node
        |  WHERE e.dst LIKE 'c:%' GROUP BY 1, 2),
        |w3 AS (SELECT dst, lab FROM (
        |  SELECT dst, lab, row_number() OVER (PARTITION BY dst
        |    ORDER BY vw DESC, lab) AS rn FROM v3) WHERE rn = 1),
        |l3 AS (SELECT l2.node, COALESCE(w3.lab, l2.lab) AS lab
        |  FROM l2 LEFT JOIN w3 ON w3.dst = l2.node)
        |SELECT node, lab AS label FROM l3""".stripMargin,
    // Efraimidis–Spirakis A-ES keys: u from the shared 28-bit fold,
    // ln grid-rounded to 5 decimals (x21 precedent) so the one libm call
    // agrees across engines; everything else is IEEE-exact arithmetic.
    "c23_weighted_sample" ->
      """WITH h AS (SELECT doc_id, n_chars,
        |    md5('ws:' || doc_id) AS hx FROM documents),
        |v AS (SELECT doc_id, n_chars,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(hx, c, 1)) <= 57
        |         THEN ascii(substr(hx, c, 1)) - 48
        |         ELSE ascii(substr(hx, c, 1)) - 87 END),
        |    (a, x) -> a * 16 + x) AS BIGINT) AS hv
        |  FROM h),
        |k AS (SELECT doc_id, n_chars AS weight,
        |  (0.0 - CAST(CAST(round(ln((hv + 1) / 268435456.0), 5)
        |      AS DECIMAL(18,6)) AS DOUBLE)) / n_chars AS skey
        |  FROM v)
        |SELECT doc_id, weight, skey FROM k
        |ORDER BY skey, doc_id LIMIT 100""".stripMargin,
    // q20's middle-statistics recipe applied twice: once on values, once
    // on |value - median| with the same deterministic (dev, id) rank.
    "q57_group_mad" ->
      """WITH r AS (SELECT event_type, value, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events),
        |med AS (SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
        |      AS med,
        |    max(cnt) AS n_rows
        |  FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |  GROUP BY event_type),
        |dev AS (SELECT e.event_type, abs(e.value - med.med) AS dev,
        |    e.event_id
        |  FROM events e JOIN med ON e.event_type = med.event_type),
        |r2 AS (SELECT event_type, dev, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY dev, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM dev),
        |mad AS (SELECT event_type,
        |    CAST(SUM(CAST(dev AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
        |      AS mad
        |  FROM r2 WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |  GROUP BY event_type)
        |SELECT med.event_type, med.med AS median_value, mad.mad,
        |  med.n_rows
        |FROM med JOIN mad ON med.event_type = mad.event_type""".stripMargin,
    // Rank trimming keeps a deterministic multiset of values under ties,
    // so no tiebreak column; mean mirrors davg (DECIMAL(38,6) sum / count).
    "q58_trimmed_mean" ->
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |k AS (SELECT event_type, value, n FROM r
        |  WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1))
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_total,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |    / COUNT(value) AS DOUBLE) AS trimmed_mean
        |FROM k GROUP BY event_type""".stripMargin,
    // d23's S-curve swept over every (bands, rows) factorization of the
    // hash budget; powers are left-fold repeated multiplication (1.0·s ≡ s
    // in IEEE so Spark aggregate-HOF and DuckDB list_reduce agree), error
    // terms grid-rounded before the cross-grid integral.
    "d25_lsh_tune" ->
      """WITH combos AS (SELECT CAST(b AS INT) AS bands,
        |    CAST(12 // b AS INT) AS rows_per_band
        |  FROM (SELECT UNNEST(range(1, 13)) AS b) q WHERE 12 % b = 0),
        |g AS (SELECT CAST(i AS DOUBLE) / 20 AS s FROM range(1, 20) t(i)),
        |sc AS (SELECT bands, rows_per_band, s,
        |    list_reduce(list_transform(range(1,
        |      CAST(rows_per_band + 1 AS BIGINT)), i -> s),
        |      (a, b) -> a * b) AS sr
        |  FROM combos CROSS JOIN g),
        |pc AS (SELECT bands, rows_per_band, s,
        |    1.0 - list_reduce(list_transform(range(1,
        |      CAST(bands + 1 AS BIGINT)), i -> 1.0 - sr),
        |      (a, b) -> a * b) AS p
        |  FROM sc),
        |terms AS (SELECT bands, rows_per_band,
        |    CASE WHEN s < 0.7 THEN p * 0.05 ELSE 0.0 END AS fp_term,
        |    CASE WHEN s >= 0.7 THEN (1.0 - p) * 0.05 ELSE 0.0 END AS fn_term
        |  FROM pc),
        |errs AS (SELECT bands, rows_per_band,
        |    CAST(SUM(CAST(round(fp_term * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / 1.0e9 AS fp_mass,
        |    CAST(SUM(CAST(round(fn_term * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / 1.0e9 AS fn_mass
        |  FROM terms GROUP BY 1, 2)
        |SELECT bands, rows_per_band, fp_mass, fn_mass,
        |  fp_mass + fn_mass AS total_err,
        |  row_number() OVER (ORDER BY fp_mass + fn_mass, bands) = 1
        |    AS chosen
        |FROM errs""".stripMargin,
    // Prefix filtering: rare-first order (corpus frequency asc, hash asc),
    // prefix length floor((1-t)*n)+1, size-ratio filter in the candidate
    // join, exact Jaccard verify — the same pipeline as the engine, so the
    // oracle pins the exact-recall semantics, not a sample of it.
    "d26_prefix_filter" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, len(s) AS n,
        |  unnest(list_transform(s, x -> md5('f:' || x))) AS h FROM sh),
        |freq AS (SELECT h, count(*) AS freq FROM tok GROUP BY h),
        |rk AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY f.freq, t.h) AS rn
        |  FROM tok t JOIN freq f ON f.h = t.h),
        |pre AS (SELECT doc_id, n, h FROM rk
        |  WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1),
        |prec AS (SELECT p.* FROM pre p
        |  QUALIFY count(*) OVER (PARTITION BY p.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM prec a JOIN prec b ON a.h = b.h AND a.doc_id < b.doc_id
        |    AND a.n >= 0.7 * b.n AND b.n >= 0.7 * a.n
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |    JOIN sh y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, jaccard FROM jac
        |WHERE jaccard >= 0.7""".stripMargin,
    "e15_centroid_drift" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x
        |  FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim),
        |ca AS (SELECT label, CAST(dim AS INT) AS dim,
        |    CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS ca,
        |    COUNT(*) AS n_accepted
        |  FROM v CROSS JOIN dims WHERE vec_id % 2 = 0
        |  GROUP BY label, dim),
        |cb AS (SELECT label, CAST(dim AS INT) AS dim,
        |    CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS cb,
        |    COUNT(*) AS n_incoming
        |  FROM v CROSS JOIN dims WHERE vec_id % 2 <> 0
        |  GROUP BY label, dim),
        |j AS (SELECT ca.label, ca.n_accepted, cb.n_incoming,
        |    CAST(SUM(CAST(round(ca.ca * cb.cb * 1.0e12) AS DECIMAL(38,0)))
        |      AS DOUBLE) / 1.0e12 AS dot,
        |    CAST(SUM(CAST(round(ca.ca * ca.ca * 1.0e12) AS DECIMAL(38,0)))
        |      AS DOUBLE) / 1.0e12 AS na2,
        |    CAST(SUM(CAST(round(cb.cb * cb.cb * 1.0e12) AS DECIMAL(38,0)))
        |      AS DOUBLE) / 1.0e12 AS nb2
        |  FROM ca JOIN cb ON ca.label = cb.label AND ca.dim = cb.dim
        |  GROUP BY 1, 2, 3)
        |SELECT label, n_accepted, n_incoming,
        |  dot / (sqrt(na2) * sqrt(nb2)) AS cos_drift,
        |  (dot / (sqrt(na2) * sqrt(nb2))) < 0.95 AS drifted
        |FROM j""".stripMargin,
    "d30_syndication" ->
      """WITH h AS (SELECT source,
        |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h
        |  FROM documents),
        |c AS (SELECT h, source, count(*) AS n FROM h GROUP BY 1, 2)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(SUM(a.n * b.n) AS BIGINT) AS n_dup_pairs,
        |  CAST(count(*) AS BIGINT) AS n_shared_texts
        |FROM c a JOIN c b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    // d32: d29's first-copy rule grouped by source — which feed re-posts.
    "d32_dup_by_source" ->
      """WITH h AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |f AS (SELECT h, min(doc_id) AS first_doc FROM h GROUP BY h),
        |j AS (SELECT x.source, x.doc_id <> f.first_doc AS is_dup
        |  FROM h x JOIN f ON f.h = x.h)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_frac
        |FROM j GROUP BY source""".stripMargin,
    // d33: x12's 8-word line segmentation; boilerplate = a line whose
    // exact text occurs in >= 2 distinct docs.
    "d33_boilerplate_lines" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |l AS (SELECT doc_id, i AS li,
        |  list_aggr(w[i:i+7], 'string_agg', ' ') AS line
        |  FROM t, UNNEST(range(1, len(w)+1, 8)) AS u(i))
        |SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM l GROUP BY line
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    // d34: d33's detector applied per doc — surviving lines rejoined in
    // order and md5'd so every output byte is pinned.
    "d34_boilerplate_apply" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |l AS (SELECT doc_id, i AS li,
        |  list_aggr(w[i:i+7], 'string_agg', ' ') AS line
        |  FROM t, UNNEST(range(1, len(w)+1, 8)) AS u(i)),
        |b AS (SELECT line FROM (SELECT line,
        |    count(DISTINCT doc_id) AS nd FROM l GROUP BY line)
        |  WHERE nd >= 2),
        |f AS (SELECT l.doc_id, l.li, l.line, (b.line IS NOT NULL) AS flag
        |  FROM l LEFT JOIN b ON l.line = b.line)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler,
        |  CAST(count(*) - SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS kept_ratio,
        |  md5(COALESCE(string_agg(CASE WHEN NOT flag THEN line END,
        |    ' | ' ORDER BY li), '')) AS kept_md5
        |FROM f GROUP BY doc_id""".stripMargin,
    // d36: bottom-k (KMV) distinct-shingle cardinality per source — the
    // 28-bit portable-hash fold (x15's idiom) over d6's shingle chain;
    // est = (k-1)*2^28/h_k with k = 64 once a source holds >= k hashes.
    "d36_cardinality_sketch" ->
      """WITH ws AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |t AS (SELECT DISTINCT source, unnest(s) AS sg FROM sh),
        |ex AS (SELECT source, count(*) AS n_exact FROM t GROUP BY source),
        |h AS (SELECT DISTINCT source,
        |  CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('card:' || sg), c, 1)) <= 57
        |         THEN ascii(substr(md5('card:' || sg), c, 1)) - 48
        |         ELSE ascii(substr(md5('card:' || sg), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) AS h FROM t),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
        |st AS (SELECT source, count(*) AS n_sketch, max(h) AS h_k
        |  FROM r WHERE rn <= 64 GROUP BY source),
        |fin AS (SELECT ex.source, ex.n_exact, st.n_sketch,
        |  CASE WHEN st.n_sketch < 64 THEN CAST(st.n_sketch AS DOUBLE)
        |       ELSE CAST(16911433728 AS DOUBLE) / CAST(st.h_k AS DOUBLE)
        |  END AS est
        |  FROM ex JOIN st ON st.source = ex.source)
        |SELECT source, n_exact, n_sketch, est,
        |  (est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
        |    AS rel_err
        |FROM fin""".stripMargin,
    "d29_dup_trend" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
        |f AS (SELECT h, min(doc_id) AS first_doc FROM h GROUP BY h),
        |j AS (SELECT x.doc_id, x.doc_id <> f.first_doc AS is_dup
        |  FROM h x JOIN f ON f.h = x.h)
        |SELECT doc_id // 100 AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_frac
        |FROM j GROUP BY 1""".stripMargin,
    // d26's pair chain + d8's component/apply tail: exact candidates →
    // transitive closure → keep component minima → kept-per-source.
    "d28_exact_pipeline" ->
      """WITH RECURSIVE ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, len(s) AS n,
        |  unnest(list_transform(s, x -> md5('f:' || x))) AS h FROM sh),
        |freq AS (SELECT h, count(*) AS freq FROM tok GROUP BY h),
        |rk AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY f.freq, t.h) AS rn
        |  FROM tok t JOIN freq f ON f.h = t.h),
        |pre AS (SELECT doc_id, n, h FROM rk
        |  WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1),
        |prec AS (SELECT p0.* FROM pre p0
        |  QUALIFY count(*) OVER (PARTITION BY p0.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM prec a JOIN prec b ON a.h = b.h AND a.doc_id < b.doc_id
        |    AND a.n >= 0.7 * b.n AND b.n >= 0.7 * a.n
        |  GROUP BY 1, 2),
        |jac AS (SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |    JOIN sh y ON y.doc_id = doc_b),
        |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.7),
        |ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(doc, lab) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.doc),
        |dec AS (SELECT doc, min(lab) AS rep FROM reach GROUP BY doc),
        |drops AS (SELECT doc FROM dec WHERE doc <> rep)
        |SELECT d.source, count(*) AS n_docs_kept
        |FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc
        |WHERE drops.doc IS NULL
        |GROUP BY d.source""".stripMargin,
    // d26's pipeline split cross-set: the frequency order is frozen from
    // the INDEX side only; incoming tokens unseen there rank with freq 0
    // (before all seen tokens) — the same single total order both sides.
    "d27_prefix_vs_index" ->
      """WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tok AS (SELECT doc_id, len(s) AS n,
        |  unnest(list_transform(s, x -> md5('f:' || x))) AS h FROM sh),
        |freq AS (SELECT h, count(*) AS freq FROM tok
        |  WHERE doc_id % 10 <> 0 GROUP BY h),
        |rkk AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY f.freq, t.h) AS rn
        |  FROM tok t JOIN freq f ON f.h = t.h WHERE t.doc_id % 10 <> 0),
        |prek AS (SELECT p.doc_id, p.n, p.h
        |  FROM (SELECT doc_id, n, h FROM rkk
        |    WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1) p
        |  QUALIFY count(*) OVER (PARTITION BY p.h) <= 500),
        |rki AS (SELECT t.doc_id, t.n, t.h,
        |  row_number() OVER (PARTITION BY t.doc_id
        |    ORDER BY COALESCE(f.freq, 0), t.h) AS rn
        |  FROM tok t LEFT JOIN freq f ON f.h = t.h WHERE t.doc_id % 10 = 0),
        |prei AS (SELECT p.doc_id, p.n, p.h
        |  FROM (SELECT doc_id, n, h FROM rki
        |    WHERE rn <= floor((1.0 - 0.7) * n + 1e-9) + 1) p
        |  QUALIFY count(*) OVER (PARTITION BY p.h) <= 500),
        |cand AS (SELECT a.doc_id AS doc_id, b.doc_id AS dup_of
        |  FROM prei a JOIN prek b ON a.h = b.h
        |    AND a.n >= 0.7 * b.n AND b.n >= 0.7 * a.n
        |  GROUP BY 1, 2),
        |jac AS (SELECT c.doc_id, c.dup_of,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
        |  FROM cand c JOIN sh x ON x.doc_id = c.doc_id
        |    JOIN sh y ON y.doc_id = c.dup_of)
        |SELECT doc_id, dup_of, jaccard FROM jac
        |WHERE jaccard >= 0.7""".stripMargin,
    // The S-curve uses multiplication-only arithmetic in the same order
    // as the Spark expression, so doubles match bit-for-bit.
    "d23_lsh_curve" ->
      """WITH g AS (SELECT CAST(i AS DOUBLE) / 20 AS jaccard
        |  FROM range(1, 20) t(i)),
        |s AS (SELECT jaccard,
        |    1.0 - jaccard * jaccard * jaccard AS q FROM g),
        |s2 AS (SELECT jaccard, q * q AS q2 FROM s)
        |SELECT jaccard, 1.0 - q2 * q2 AS p_candidate FROM s2""".stripMargin,
    "q54_ratio_to_report" ->
      """WITH pn AS (SELECT n_regionkey, n_name,
        |    SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_regionkey, n_name,
        |  CAST(bal AS DOUBLE) AS nation_bal,
        |  CAST(sum(bal) OVER (PARTITION BY n_regionkey) AS DOUBLE)
        |    AS region_bal,
        |  CAST(bal AS DOUBLE)
        |    / CAST(sum(bal) OVER (PARTITION BY n_regionkey) AS DOUBLE)
        |    AS share
        |FROM pn""".stripMargin,
    // Block on the exact 8-char title prefix (d2's QUALIFY cap mirror),
    // verify with Levenshtein inside blocks only.
    "d21_fuzzy_title" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 40) AS title
        |  FROM documents),
        |b AS (SELECT doc_id, title, substr(title, 1, 8) AS blk FROM t),
        |bk AS (SELECT * FROM b
        |  QUALIFY count(*) OVER (PARTITION BY blk) <= 500)
        |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |  CAST(levenshtein(a.title, b2.title) AS INT) AS edit_dist
        |FROM bk a JOIN bk b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id
        |WHERE levenshtein(a.title, b2.title) <= 5""".stripMargin,
    // sorted-neighborhood: the oracle's single-window row_number IS the
    // semantic spec; the engine computes the same global rank with the
    // two-phase range-partition + offset scheme and pairs neighbors via
    // a rank-bucket equi-join (never a windowed global sort).
    "d24_sorted_neighborhood" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 40) AS title
        |  FROM documents),
        |r AS (SELECT doc_id, title,
        |  row_number() OVER (ORDER BY title, doc_id) AS rk FROM t)
        |SELECT least(a.doc_id, b.doc_id) AS doc_a,
        |  greatest(a.doc_id, b.doc_id) AS doc_b,
        |  CAST(levenshtein(a.title, b.title) AS INT) AS edit_dist
        |FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 10
        |WHERE levenshtein(a.title, b.title) <= 5""".stripMargin,
    "q42_retention" ->
      """WITH coh AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        |  FROM events GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date
        |  FROM events)
        |SELECT cohort_date,
        |  datediff('day', cohort_date, active_date) AS day_offset,
        |  count(DISTINCT act.user_id) AS n_active
        |FROM act JOIN coh ON act.user_id = coh.user_id
        |WHERE datediff('day', cohort_date, active_date) BETWEEN 0 AND 7
        |GROUP BY 1, 2""".stripMargin,
    "q40_zorder" ->
      """WITH d AS (SELECT event_id, user_id % 1024 AS a,
        |  CAST(hour(ts) AS BIGINT) AS b FROM events)
        |SELECT event_id,
        |  list_reduce(list_transform(range(0, 10), i ->
        |    (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))),
        |    (x, y) -> x | y) AS zv
        |FROM d""".stripMargin,
    "x16_token_zipf" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        |top AS (SELECT tok, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, tok) AS rank
        |  FROM c ORDER BY cnt DESC, tok LIMIT 100)
        |SELECT rank, tok, cnt,
        |  CAST(sum(cnt) OVER w AS BIGINT) AS cum_cnt,
        |  CAST(CAST(sum(cnt) OVER w AS BIGINT) AS DOUBLE) / total AS cum_share
        |FROM top, tot
        |WINDOW w AS (ORDER BY rank ROWS UNBOUNDED PRECEDING)""".stripMargin,
    "x15_feature_hash" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, CAST(list_reduce(list_transform(range(1, 8), c ->
        |    CASE WHEN ascii(substr(md5('fh:' || tok), c, 1)) <= 57
        |         THEN ascii(substr(md5('fh:' || tok), c, 1)) - 48
        |         ELSE ascii(substr(md5('fh:' || tok), c, 1)) - 87 END),
        |    (a, v) -> a * 16 + v) AS BIGINT) % 64 AS bucket FROM t)
        |SELECT doc_id, bucket, COUNT(*) AS tf
        |FROM h GROUP BY doc_id, bucket""".stripMargin,
    "e1_label_centroids" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] AS x FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim)
        |SELECT label, CAST(dim AS INT) AS dim,
        |  CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |    / (COUNT(*) * 1.0e9) AS centroid,
        |  COUNT(*) AS n_vecs
        |FROM v CROSS JOIN dims
        |GROUP BY label, dim""".stripMargin,
    // e9's recursion twice with Hotelling deflation on the 1e-9 grid
    // between (G' = G - lam*v*vT, every cell re-quantized).
    "e13_top2_power" ->
      """WITH RECURSIVE ve AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
        |pr AS (SELECT UNNEST(range(0, 64)) AS d),
        |pairs AS (SELECT a.d AS i, b.d AS j
        |  FROM pr a CROSS JOIN pr b WHERE b.d >= a.d),
        |g0 AS (SELECT p.i, p.j,
        |  CAST(CAST(SUM(CAST(round(x[p.i + 1] * x[p.j + 1] * 1.0e9) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 1.0e9 AS gram
        |  FROM ve CROSS JOIN pairs p GROUP BY p.i, p.j),
        |gm AS (SELECT i, j, gram FROM g0
        |  UNION ALL SELECT j AS i, i AS j, gram FROM g0 WHERE i <> j),
        |pw(it, d, vv, lam) AS (
        |  SELECT 0, d, CAST(1.0 AS DOUBLE) / 64, CAST(0 AS DOUBLE) FROM pr
        |  UNION ALL
        |  SELECT it + 1, d, w / nrm, nrm FROM (
        |    SELECT it, d, w,
        |      sqrt(CAST(CAST(SUM(CAST(round(w * w * 1.0e9) AS BIGINT))
        |        OVER (PARTITION BY it) AS BIGINT) AS DOUBLE) / 1.0e9) AS nrm
        |    FROM (
        |      SELECT pw.it, gm.i AS d,
        |        CAST(CAST(SUM(CAST(round(gm.gram * pw.vv * 1.0e9) AS BIGINT))
        |          AS BIGINT) AS DOUBLE) / 1.0e9 AS w
        |      FROM pw JOIN gm ON gm.j = pw.d WHERE pw.it < 24
        |      GROUP BY pw.it, gm.i) a) b
        |),
        |v1 AS (SELECT d, vv FROM pw WHERE it = 24),
        |l1 AS (SELECT lam FROM pw WHERE it = 24 LIMIT 1),
        |g2 AS (SELECT gm.i, gm.j,
        |  CAST(CAST(round(gm.gram * 1.0e9) AS BIGINT)
        |     - CAST(round(l1.lam * vi.vv * vj.vv * 1.0e9) AS BIGINT) AS DOUBLE)
        |    / 1.0e9 AS gram
        |  FROM gm JOIN v1 vi ON vi.d = gm.i JOIN v1 vj ON vj.d = gm.j
        |  CROSS JOIN l1),
        |pw2(it, d, vv, lam) AS (
        |  SELECT 0, d, CAST(1.0 AS DOUBLE) / 64, CAST(0 AS DOUBLE) FROM pr
        |  UNION ALL
        |  SELECT it + 1, d, w / nrm, nrm FROM (
        |    SELECT it, d, w,
        |      sqrt(CAST(CAST(SUM(CAST(round(w * w * 1.0e9) AS BIGINT))
        |        OVER (PARTITION BY it) AS BIGINT) AS DOUBLE) / 1.0e9) AS nrm
        |    FROM (
        |      SELECT pw2.it, g2.i AS d,
        |        CAST(CAST(SUM(CAST(round(g2.gram * pw2.vv * 1.0e9) AS BIGINT))
        |          AS BIGINT) AS DOUBLE) / 1.0e9 AS w
        |      FROM pw2 JOIN g2 ON g2.j = pw2.d WHERE pw2.it < 24
        |      GROUP BY pw2.it, g2.i) a) b
        |)
        |SELECT 1 AS component, CAST(d AS INT) AS dim, vv AS loading,
        |  lam AS eigenvalue FROM pw WHERE it = 24
        |UNION ALL
        |SELECT 2, CAST(d AS INT), vv, lam FROM pw2 WHERE it = 24""".stripMargin,
    // One Lloyd step: s1's cosine scoring for the argmax assignment,
    // e1's grid-exact mean recipe for the update.
    "e11_kmeans_step" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x,
        |  sqrt(list_reduce(list_transform(range(1,65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (a,b) -> a + b)) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, x AS cx, nrm AS cnrm FROM v
        |  WHERE vec_id % 199 = 0),
        |sc AS (SELECT v.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> v.x[i] * c.cx[i]), (a,b) -> a + b)
        |    / (v.nrm * c.cnrm) AS ccos
        |  FROM v CROSS JOIN c),
        |asg AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn FROM sc)
        |  WHERE rn = 1),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim)
        |SELECT cent_id, CAST(dim AS INT) AS dim,
        |  CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |    / (COUNT(*) * 1.0e9) AS centroid,
        |  COUNT(*) AS n_vecs
        |FROM v JOIN asg ON v.vec_id = asg.vec_id CROSS JOIN dims
        |GROUP BY cent_id, dim""".stripMargin,
    // e1's grid-exact centroids re-assembled into arrays, s1's cosine
    // shape against them, bottom-k ascending per label.
    "e12_centroid_outliers" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x,
        |  sqrt(list_reduce(list_transform(range(1,65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (a,b) -> a + b)) AS nrm
        |  FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim),
        |cd AS (SELECT label, dim,
        |    CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS centroid
        |  FROM v CROSS JOIN dims GROUP BY label, dim),
        |c AS (SELECT label, list(centroid ORDER BY dim) AS cx FROM cd
        |  GROUP BY label),
        |cn AS (SELECT label, cx,
        |    sqrt(list_reduce(list_transform(range(1,65), i -> cx[i] * cx[i]), (a,b) -> a + b)) AS cnrm
        |  FROM c),
        |sc AS (SELECT v.label, v.vec_id,
        |    list_reduce(list_transform(range(1,65), i -> v.x[i] * cn.cx[i]), (a,b) -> a + b)
        |      / (v.nrm * cn.cnrm) AS cos_centroid
        |  FROM v JOIN cn ON v.label = cn.label)
        |SELECT label, vec_id, cos_centroid, outlier_rank FROM (
        |  SELECT label, vec_id, cos_centroid, row_number() OVER (
        |    PARTITION BY label ORDER BY cos_centroid ASC, vec_id)
        |    AS outlier_rank
        |  FROM sc) t WHERE outlier_rank <= 5""".stripMargin,
    // e12's cosine-to-centroid machinery scored against ALL centroids:
    // cohesion (own), separation (best other), grid-exact per-label means.
    "e14_cluster_quality" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x,
        |  sqrt(list_reduce(list_transform(range(1,65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (a,b) -> a + b)) AS nrm
        |  FROM embeddings),
        |dims AS (SELECT UNNEST(range(0, 64)) AS dim),
        |cd AS (SELECT label, dim,
        |    CAST(SUM(CAST(round(x[dim + 1] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS centroid
        |  FROM v CROSS JOIN dims GROUP BY label, dim),
        |c AS (SELECT label AS clabel, list(centroid ORDER BY dim) AS cx
        |  FROM cd GROUP BY label),
        |cn AS (SELECT clabel, cx,
        |    sqrt(list_reduce(list_transform(range(1,65), i -> cx[i] * cx[i]), (a,b) -> a + b)) AS cnrm
        |  FROM c),
        |sc AS (SELECT v.vec_id, v.label, cn.clabel,
        |    list_reduce(list_transform(range(1,65), i -> v.x[i] * cn.cx[i]), (a,b) -> a + b)
        |      / (v.nrm * cn.cnrm) AS ccos
        |  FROM v CROSS JOIN cn),
        |pv AS (SELECT vec_id, label,
        |    MAX(CASE WHEN label = clabel THEN ccos END) AS cos_own,
        |    MAX(CASE WHEN label <> clabel THEN ccos END) AS cos_other
        |  FROM sc GROUP BY vec_id, label),
        |agg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |    CAST(SUM(CAST(round(cos_own * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS mean_cos_own,
        |    CAST(SUM(CAST(round(cos_other * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS mean_cos_other
        |  FROM pv GROUP BY label)
        |SELECT label, n_vecs, mean_cos_own, mean_cos_other,
        |  mean_cos_own - mean_cos_other AS margin
        |FROM agg""".stripMargin,
    "s1_knn_brute" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 10""".stripMargin,
    // s1 with the metadata predicate on the corpus side (pre-filter).
    "s11_filtered_knn" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x
        |  FROM embeddings),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id
        |   AND c.label % 2 = 0)
        |SELECT query_id, neighbor_id, label, cos, rank FROM (
        |  SELECT query_id, neighbor_id, label, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 10""".stripMargin,
    // Greedy MMR as a recursive CTE (e9's aggregates-in-recursion
    // precedent): one state row per query per rank, selected set carried
    // as a list; (1 - 0.7) is written as the same double expression the
    // engine computes.
    "s12_mmr_rerank" ->
      """WITH RECURSIVE v AS (SELECT vec_id, embedding::DOUBLE[] AS x,
        |  sqrt(list_reduce(list_transform(range(1,65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (a,b) -> a + b)) AS nrm
        |  FROM embeddings),
        |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) / (q.nrm * c.nrm) AS rel
        |  FROM v q JOIN v c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |cand AS (SELECT query_id, neighbor_id, rel FROM (
        |  SELECT query_id, neighbor_id, rel,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
        |  FROM sc) t WHERE rn <= 20),
        |cv AS (SELECT cand.query_id, cand.neighbor_id, cand.rel, v.x, v.nrm
        |  FROM cand JOIN v ON v.vec_id = cand.neighbor_id),
        |pp AS (SELECT a.query_id, a.neighbor_id AS ca, b.neighbor_id AS cb,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * b.x[i]), (a2,b2) -> a2 + b2) / (a.nrm * b.nrm) AS sim
        |  FROM cv a JOIN cv b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id),
        |sel(r, query_id, neighbor_id, mmr_score, sel_ids) AS (
        |  SELECT 1, query_id, neighbor_id, 0.7 * rel, [neighbor_id]
        |  FROM (SELECT query_id, neighbor_id, rel,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
        |    FROM cand) t WHERE rn = 1
        |  UNION ALL
        |  SELECT r + 1, query_id, pick_id, score, list_append(sel_ids, pick_id) FROM (
        |    SELECT m.r, m.query_id, m.pick_id, m.sel_ids, m.score,
        |      row_number() OVER (PARTITION BY m.query_id ORDER BY m.score DESC, m.pick_id) AS rn
        |    FROM (
        |      SELECT s.r, s.query_id, c.neighbor_id AS pick_id, s.sel_ids,
        |        0.7 * c.rel - (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * MAX(p.sim) AS score
        |      FROM sel s
        |      JOIN cand c ON c.query_id = s.query_id
        |        AND NOT list_contains(s.sel_ids, c.neighbor_id)
        |      JOIN pp p ON p.query_id = s.query_id AND p.ca = c.neighbor_id
        |        AND list_contains(s.sel_ids, p.cb)
        |      WHERE s.r < 5
        |      GROUP BY s.r, s.query_id, c.neighbor_id, s.sel_ids, c.rel
        |    ) m
        |  ) picked WHERE rn = 1
        |)
        |SELECT query_id, neighbor_id, CAST(r AS INT) AS mmr_rank, mmr_score
        |FROM sel""".stripMargin,
    "s2_ann_lsh" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |dots AS (SELECT vec_id, i,
        |  list_reduce(list_transform(range(1,65), d ->
        |    x[d] * (CASE WHEN (CASE WHEN ascii(substr(md5(i || ':' || (d-1)), 1, 1)) <= 57
        |                       THEN ascii(substr(md5(i || ':' || (d-1)), 1, 1)) - 48
        |                       ELSE ascii(substr(md5(i || ':' || (d-1)), 1, 1)) - 87 END) % 2 = 1
        |            THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b) AS dot
        |  FROM v, range(16) t(i)),
        |sig AS (SELECT vec_id,
        |  CAST(sum(CASE WHEN i < 8 AND dot > 0 THEN power(2, i) ELSE 0 END) AS INT) AS band0,
        |  CAST(sum(CASE WHEN i >= 8 AND dot > 0 THEN power(2, i - 8) ELSE 0 END) AS INT) AS band1
        |  FROM dots GROUP BY vec_id),
        |cand AS (SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id
        |  FROM sig q JOIN sig s ON (q.band0 = s.band0 OR q.band1 = s.band1)
        |  WHERE q.vec_id % 100 = 0 AND s.vec_id <> q.vec_id GROUP BY 1, 2),
        |p AS (SELECT query_id, neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        |  FROM cand JOIN v q ON q.vec_id = query_id JOIN v c ON c.vec_id = neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 5""".stripMargin,
    // Mirrors Similarity.kmeansCentroids exactly: seeds = vec_id%50 sample,
    // training set = vec_id%5 sample, KMeansIters=2 unrolled Lloyd steps
    // (a0/g0/m1/c1 then a1/g1/m2/c2), per-dim means as DECIMAL(38,12) sums
    // divided in double, empty cells keep the previous centroid.
    // s13 = s3's coarse-quantizer chain (verbatim, through `probes`) +
    // s8's PQ chain (CTEs renamed pd0/pa0/pm1/pasg/plut) with the ADC sum
    // restricted to probed-cell candidates (`ccand`), then the exact
    // re-rank — the IVFADC composition mirrored CTE for CTE.
    "s13_ivf_adc" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |dims AS (SELECT UNNEST(range(1,65)) AS i),
        |samp AS (SELECT vec_id, x FROM v WHERE vec_id % 5 = 0),
        |c0 AS (SELECT vec_id AS cent_id, x AS cx FROM v WHERE vec_id % 50 = 0),
        |a0 AS (SELECT s.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> s.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> s.x[i] * s.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM samp s, c0 c),
        |g0 AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM a0) WHERE rn <= 1),
        |m1 AS (SELECT cent_id, list(m ORDER BY i) AS mx FROM (
        |  SELECT g.cent_id, d.i,
        |    CAST(SUM(CAST(s.x[d.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM samp s JOIN g0 g ON s.vec_id = g.vec_id CROSS JOIN dims d
        |  GROUP BY g.cent_id, d.i) GROUP BY cent_id),
        |c1 AS (SELECT c.cent_id, COALESCE(m.mx, c.cx) AS cx
        |  FROM c0 c LEFT JOIN m1 m ON c.cent_id = m.cent_id),
        |a1 AS (SELECT s.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> s.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> s.x[i] * s.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM samp s, c1 c),
        |g1 AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM a1) WHERE rn <= 1),
        |m2 AS (SELECT cent_id, list(m ORDER BY i) AS mx FROM (
        |  SELECT g.cent_id, d.i,
        |    CAST(SUM(CAST(s.x[d.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM samp s JOIN g1 g ON s.vec_id = g.vec_id CROSS JOIN dims d
        |  GROUP BY g.cent_id, d.i) GROUP BY cent_id),
        |cent AS (SELECT c.cent_id, COALESCE(m.mx, c.cx) AS cx
        |  FROM c1 c LEFT JOIN m2 m ON c.cent_id = m.cent_id),
        |ac AS (SELECT a.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> a.x[i] * a.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM v a, cent c),
        |asg AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM ac) WHERE rn <= 1),
        |probes AS (SELECT vec_id AS query_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM ac WHERE vec_id % 100 = 0) WHERE rn <= 2),
        |ccand AS (SELECT p.query_id, s.vec_id AS neighbor_id
        |  FROM probes p JOIN asg s ON p.cent_id = s.cent_id
        |  WHERE s.vec_id <> p.query_id GROUP BY 1, 2),
        |sub AS (SELECT vec_id, s, x[(16*s+1):(16*s+16)] AS sx
        |  FROM v CROSS JOIN (SELECT UNNEST(range(0, 4)) AS s)),
        |seeds AS (SELECT s, sx AS cx,
        |    CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) AS INT)
        |      AS code
        |  FROM sub WHERE vec_id % 61 = 0 AND vec_id < 61 * 256),
        |pd0 AS (SELECT u.vec_id, u.s, se.code, u.sx,
        |  list_reduce(list_transform(range(1, 17), i ->
        |    (u.sx[i] - se.cx[i]) * (u.sx[i] - se.cx[i])), (a, b) -> a + b)
        |    AS d2
        |  FROM sub u JOIN seeds se ON u.s = se.s),
        |pa0 AS (SELECT vec_id, s, code, sx FROM (SELECT vec_id, s, code, sx,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)
        |      AS rn FROM pd0) WHERE rn = 1),
        |pm1 AS (SELECT s, code, list(m ORDER BY i) AS mx FROM (
        |  SELECT a.s, a.code, d.i,
        |    CAST(SUM(CAST(round(a.sx[d.i] * 1.0e9) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(*) * 1.0e9) AS m
        |  FROM pa0 a CROSS JOIN (SELECT UNNEST(range(1, 17)) AS i) d
        |  GROUP BY a.s, a.code, d.i) GROUP BY s, code),
        |cb AS (SELECT se.s, se.code, COALESCE(pm1.mx, se.cx) AS cx
        |  FROM seeds se LEFT JOIN pm1 ON se.s = pm1.s AND se.code = pm1.code),
        |pasg AS (SELECT vec_id, s, code FROM (SELECT u.vec_id, u.s, c.code,
        |    row_number() OVER (PARTITION BY u.vec_id, u.s ORDER BY
        |      list_reduce(list_transform(range(1, 17), i ->
        |        (u.sx[i] - c.cx[i]) * (u.sx[i] - c.cx[i])), (a, b) -> a + b),
        |      c.code) AS rn
        |  FROM sub u JOIN cb c ON u.s = c.s) WHERE rn = 1),
        |plut AS (SELECT q.vec_id AS query_id, c.s, c.code,
        |  CAST(round(list_reduce(list_transform(range(1, 17), i ->
        |    (q.sx[i] - c.cx[i]) * (q.sx[i] - c.cx[i])), (a, b) -> a + b)
        |    * 1.0e9) AS BIGINT) AS g2
        |  FROM sub q JOIN cb c ON q.s = c.s WHERE q.vec_id % 100 = 0),
        |adc AS (SELECT cc.query_id, cc.neighbor_id,
        |  CAST(CAST(SUM(g2) AS BIGINT) AS DOUBLE) / 1.0e9 AS adc_d2
        |  FROM ccand cc JOIN pasg a ON a.vec_id = cc.neighbor_id
        |    JOIN plut l ON l.query_id = cc.query_id
        |      AND a.s = l.s AND a.code = l.code
        |  GROUP BY 1, 2),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_d2, neighbor_id) AS r
        |  FROM adc) WHERE r <= 30),
        |fx AS (SELECT cand.query_id, cand.neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        | FROM cand JOIN v q ON q.vec_id = cand.query_id
        |           JOIN v c ON c.vec_id = cand.neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM fx) WHERE rank <= 10""".stripMargin,
    "s3_ann_ivf" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |dims AS (SELECT UNNEST(range(1,65)) AS i),
        |samp AS (SELECT vec_id, x FROM v WHERE vec_id % 5 = 0),
        |c0 AS (SELECT vec_id AS cent_id, x AS cx FROM v WHERE vec_id % 50 = 0),
        |a0 AS (SELECT s.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> s.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> s.x[i] * s.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM samp s, c0 c),
        |g0 AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM a0) WHERE rn <= 1),
        |m1 AS (SELECT cent_id, list(m ORDER BY i) AS mx FROM (
        |  SELECT g.cent_id, d.i,
        |    CAST(SUM(CAST(s.x[d.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM samp s JOIN g0 g ON s.vec_id = g.vec_id CROSS JOIN dims d
        |  GROUP BY g.cent_id, d.i) GROUP BY cent_id),
        |c1 AS (SELECT c.cent_id, COALESCE(m.mx, c.cx) AS cx
        |  FROM c0 c LEFT JOIN m1 m ON c.cent_id = m.cent_id),
        |a1 AS (SELECT s.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> s.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> s.x[i] * s.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM samp s, c1 c),
        |g1 AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM a1) WHERE rn <= 1),
        |m2 AS (SELECT cent_id, list(m ORDER BY i) AS mx FROM (
        |  SELECT g.cent_id, d.i,
        |    CAST(SUM(CAST(s.x[d.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM samp s JOIN g1 g ON s.vec_id = g.vec_id CROSS JOIN dims d
        |  GROUP BY g.cent_id, d.i) GROUP BY cent_id),
        |cent AS (SELECT c.cent_id, COALESCE(m.mx, c.cx) AS cx
        |  FROM c1 c LEFT JOIN m2 m ON c.cent_id = m.cent_id),
        |ac AS (SELECT a.vec_id, c.cent_id,
        |  list_reduce(list_transform(range(1,65), i -> a.x[i] * c.cx[i]), (p,q) -> p + q) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> a.x[i] * a.x[i]), (p,q) -> p + q)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.cx[i] * c.cx[i]), (p,q) -> p + q))) AS ccos
        |  FROM v a, cent c),
        |asg AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM ac) WHERE rn <= 1),
        |probes AS (SELECT vec_id AS query_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
        |  FROM ac WHERE vec_id % 100 = 0) WHERE rn <= 2),
        |cand AS (SELECT p.query_id, s.vec_id AS neighbor_id
        |  FROM probes p JOIN asg s ON p.cent_id = s.cent_id
        |  WHERE s.vec_id <> p.query_id GROUP BY 1, 2),
        |p AS (SELECT query_id, neighbor_id,
        |  list_reduce(list_transform(range(1,65), i -> q.x[i] * c.x[i]), (a,b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(range(1,65), i -> q.x[i] * q.x[i]), (a,b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(range(1,65), i -> c.x[i] * c.x[i]), (a,b) -> a + b))) AS cos
        |  FROM cand JOIN v q ON q.vec_id = query_id JOIN v c ON c.vec_id = neighbor_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM p) WHERE rank <= 5""".stripMargin,
    "mm1_media_features" ->
      """SELECT doc_id,
        |  (['png','jpeg','wav','mp4'])[CAST(doc_id % 4 + 1 AS INT)] AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS media_len,
        |  md5(text) AS media_md5,
        |  md5(substr(text, 1, 64)) AS thumb_md5,
        |  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    // FakeDecoder is a pure function of the UTF-8 bytes, so the oracle
    // reproduces it from the hex dump: byte i = 16·hi + lo nibble.
    "mm2_decoded_features" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents
        |)
        |SELECT doc_id,
        |  (['png','jpeg','wav','mp4'])[CAST(doc_id % 4 + 1 AS INT)] AS format,
        |  n AS n_bytes,
        |  CAST((n + 255) // 256 AS BIGINT) AS n_frames,
        |  CASE WHEN n = 0 THEN 0.0 ELSE
        |    CAST(list_sum(list_transform(generate_series(1, CAST(n AS INT)),
        |      i -> (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
        |         + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1))) AS DOUBLE) / n
        |  END AS mean_byte,
        |  CAST(CASE WHEN n = 0 THEN -1 ELSE
        |    (strpos('0123456789ABCDEF', substr(hx, 1, 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF', substr(hx, 2, 1)) - 1)
        |  END AS INT) AS first_byte
        |FROM b""".stripMargin,
    // Patch slicing runs over the hex dump on both engines (2 chars/byte);
    // md5 is taken over the hex substring itself, so no BLOB functions are
    // needed anywhere.
    "mm3_patch_extract" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |e0 AS (SELECT doc_id, hx,
        |  UNNEST(range(0, (n + 31) // 32)) AS pi FROM b),
        |e AS (SELECT doc_id, CAST(pi AS INT) AS patch_idx,
        |  substr(hx, CAST(64 * pi + 1 AS BIGINT), 64) AS ph FROM e0)
        |SELECT doc_id, patch_idx,
        |  CAST(length(ph) // 2 AS BIGINT) AS patch_len,
        |  md5(ph) AS patch_md5,
        |  CAST((strpos('0123456789ABCDEF', substr(ph, 1, 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF', substr(ph, 2, 1)) - 1) AS INT)
        |    AS first_byte
        |FROM e""".stripMargin,
    // Every 16th byte via hex-dump nibbles (stride 16 → 32 hex chars apart).
    "mm4_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |e AS (SELECT doc_id, hx,
        |  UNNEST(range(0, (n + 15) // 16)) AS fi FROM b)
        |SELECT doc_id AS media_id, CAST(fi AS INT) AS frame_idx,
        |  CAST((strpos('0123456789ABCDEF',
        |      substr(hx, CAST(32 * fi + 1 AS BIGINT), 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF',
        |      substr(hx, CAST(32 * fi + 2 AS BIGINT), 1)) - 1) AS INT)
        |    AS frame_byte
        |FROM e""".stripMargin,
    // stride-4 thumbnail: every 4th byte (8 hex chars apart), md5 over the
    // concatenated hex pairs — byte-exact on both engines
    "mm5_resize" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |o AS (SELECT doc_id, n AS n_bytes,
        |  CAST((n + 3) // 4 AS BIGINT) AS thumb_bytes, hx FROM b)
        |SELECT doc_id, n_bytes, thumb_bytes,
        |  CASE WHEN thumb_bytes > 0 THEN md5(array_to_string(
        |    list_transform(range(0, thumb_bytes),
        |      i -> substr(hx, CAST(8 * i + 1 AS BIGINT), 2)), ''))
        |  ELSE NULL END AS thumb_md5
        |FROM o""".stripMargin,
    "mm8_media_mix" ->
      """SELECT source,
        |  ['png', 'jpeg', 'wav', 'mp4'][CAST(doc_id % 4 + 1 AS INT)]
        |    AS format,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // PCM-at-128 read of the payload bytes via the hex dump; energy is
    // exact integer math, RMS one IEEE division + correctly-rounded sqrt.
    "mm7_frame_energy" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |u AS (SELECT doc_id, hx, unnest(range(0, n)) AS i FROM b),
        |s AS (SELECT doc_id, CAST(i // 64 AS BIGINT) AS frame_idx,
        |    CAST(('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2)) AS INT)
        |      - 128 AS sv
        |  FROM u),
        |fr AS (SELECT doc_id AS media_id, frame_idx,
        |    CAST(count(*) AS BIGINT) AS n_samples,
        |    CAST(SUM(sv * sv) AS BIGINT) AS energy
        |  FROM s GROUP BY 1, 2)
        |SELECT media_id, frame_idx, n_samples, energy,
        |  sqrt(CAST(energy AS DOUBLE) / n_samples) AS rms
        |FROM fr""".stripMargin,
    // dHash over the stride-4 thumbnail, then d9's banded Hamming search:
    // 4 × 15-bit bands on the 60-bit hash, xor+bit_count on candidates.
    "mm6_phash_pairs" ->
      """WITH t AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |th AS (SELECT doc_id,
        |    list_transform(range(0, 61),
        |      i -> CAST(('0x' || substr(hx, CAST(i * 8 + 1 AS INT), 2))
        |        AS INT)) AS b
        |  FROM t WHERE n >= 241),
        |ph AS (SELECT doc_id,
        |    list_reduce(list_transform(range(0, 60),
        |      i -> CASE WHEN b[CAST(i + 1 AS INT)] < b[CAST(i + 2 AS INT)]
        |           THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
        |      (a, x) -> a | x) AS phash
        |  FROM th),
        |bands AS (SELECT doc_id, phash, j,
        |    (phash >> CAST(15 * j AS INT)) & 32767 AS bv
        |  FROM ph, range(4) r(j)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.phash AS pa, b.phash AS pb
        |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv
        |    AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, bit_count(xor(pa, pb)) AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 6""".stripMargin,
    // mm9: mm6's signature/band CTEs with the corpus split at the band
    // stage — stored side doc_id % 10 <> 0, incoming % 10 = 0, no
    // ordering constraint (cross-set namespaces).
    "mm9_phash_vs_index" ->
      """WITH t AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |th AS (SELECT doc_id,
        |    list_transform(range(0, 61),
        |      i -> CAST(('0x' || substr(hx, CAST(i * 8 + 1 AS INT), 2))
        |        AS INT)) AS b
        |  FROM t WHERE n >= 241),
        |ph AS (SELECT doc_id,
        |    list_reduce(list_transform(range(0, 60),
        |      i -> CASE WHEN b[CAST(i + 1 AS INT)] < b[CAST(i + 2 AS INT)]
        |           THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
        |      (a, x) -> a | x) AS phash
        |  FROM th),
        |bandsk AS (SELECT doc_id, phash, j,
        |    (phash >> CAST(15 * j AS INT)) & 32767 AS bv
        |  FROM ph, range(4) r(j) WHERE doc_id % 10 <> 0),
        |bandsi AS (SELECT doc_id, phash, j,
        |    (phash >> CAST(15 * j AS INT)) & 32767 AS bv
        |  FROM ph, range(4) r(j) WHERE doc_id % 10 = 0),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS dup_of,
        |    a.phash AS pa, b.phash AS pb
        |  FROM bandsi a JOIN bandsk b ON a.j = b.j AND a.bv = b.bv)
        |SELECT doc_id, dup_of, bit_count(xor(pa, pb)) AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 6""".stripMargin,
  )
}
