package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.DataFrame

/** Empty-input robustness: a filter chain, a partition prune, or an
  * unlucky ingest window can hand ANY operator a zero-row frame at 100 TB
  * — the correct behavior is an empty (or all-zero-group) result, never a
  * throw. One sweep over the documents- and embeddings-shaped operator
  * surface; report-shaped operators must return zero rows too (no
  * divide-by-zero poison rows). */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private val docs: DataFrame =
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  private val embs: DataFrame =
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")

  private val docOps: Seq[(String, () => DataFrame)] = Seq(
    "exactDedup" -> (() => Dedup.exactDedup(docs)),
    "minhashLsh" -> (() => Dedup.minhashLsh(docs)),
    "simhash" -> (() => Dedup.simhash(docs)),
    "simhashPairs" -> (() => Dedup.simhashPairs(docs)),
    "ngramJaccard" -> (() => Dedup.ngramJaccard(docs)),
    "containment" -> (() => Dedup.containment(docs)),
    "prefixFilterPairs" -> (() => Dedup.prefixFilterPairs(docs)),
    "prefixFilterAudit" -> (() => Dedup.prefixFilterAudit(docs)),
    "lshVsExact" -> (() => Dedup.lshVsExact(docs)),
    "thresholdSweep" -> (() => Dedup.thresholdSweep(docs)),
    "sourceSketch" -> (() => DedupSources.sourceSketch(docs)),
    "sourceOverlap" -> (() => DedupSources.sourceOverlap(docs)),
    "dupSourceSplit" -> (() => DedupSources.dupSourceSplit(docs)),
    "urlDedup" -> (() => Dedup.urlDedup(docs)),
    "nearDupComponents" -> (() => Dedup.nearDupComponents(docs)),
    "keepBestInCluster" -> (() => Dedup.keepBestInCluster(docs)),
    "fuzzyTitlePairs" -> (() => Dedup.fuzzyTitlePairs(docs)),
    "sortedNeighborPairs" -> (() => Dedup.sortedNeighborPairs(docs)),
    "dedupApply" -> (() => Dedup.dedupApply(docs)),
    "dedupReport" -> (() => Dedup.dedupReport(docs)),
    "tokenStats" -> (() => LlmText.tokenStats(docs)),
    "langId" -> (() => LlmText.langId(docs)),
    "qualityScore" -> (() => LlmText.qualityScore(docs)),
    "fingerprint" -> (() => LlmText.fingerprint(docs)),
    "tfidf" -> (() => LlmText.tfidf(docs)),
    "repetitionSignals" -> (() => LlmText.repetitionSignals(docs)),
    "vocabOov" -> (() => LlmText.vocabOov(docs)),
    "bm25" -> (() => LlmText.bm25(docs, Seq("spark", "query"))),
    "piiRedact" -> (() => LlmText.piiRedact(docs)),
    "lineFilter" -> (() => LlmText.lineFilter(docs)),
    "charEntropy" -> (() => LlmText.charEntropy(docs)),
    "lexicalDiversity" -> (() => LlmText.lexicalDiversity(docs)),
    "sourceDivergence" -> (() => LlmText.sourceDivergence(docs)),
    "pmiCollocations" -> (() => LlmText.pmiCollocations(docs)),
    "noveltyScore" -> (() => LlmText.noveltyScore(docs)),
    "vocabGrowth" -> (() => LlmText.vocabGrowth(docs)),
    "spanDedup" -> (() => LlmText.spanDedup(docs)),
    "removableSpans" -> (() => LlmText.removableSpans(docs)),
    "stratifiedSample" -> (() =>
      Curation.stratifiedSample(docs, Map.empty, 50)),
    "domainMix" -> (() => Curation.domainMix(docs)),
    "qualitySample" -> (() => Curation.qualitySample(docs)),
    "tokenBudgetSelect" -> (() => Curation.tokenBudgetSelect(docs)),
    "sourceReport" -> (() => Curation.sourceReport(docs)),
    "weightedSample" -> (() => Curation.weightedSample(docs)),
    "neymanAllocation" -> (() => Curation.neymanAllocation(docs)),
    "chunkOverlap" -> (() => Curation.chunkOverlap(docs)),
    "mediaFeatures" -> (() => Multimodal.mediaFeatures(docs)),
    "frameEnergy" -> (() => Multimodal.frameEnergy(docs)),
    "patchExtract" -> (() => Multimodal.patchExtract(docs)),
    "resizeThumbs" -> (() => Multimodal.resizeThumbs(docs)),
    // round-9 additions
    "readability" -> (() => LlmText.readability(docs)),
    "curriculumOrder" -> (() => Curation.curriculumOrder(docs)),
    "tokenizerFertility" -> (() => LlmBpe.tokenizerFertility(docs)),
    "dedupWeightedMix" -> (() => Curation.dedupWeightedMix(docs)),
    "dupFingerprints" -> (() => DedupSources.dupFingerprints(docs)),
    "dupTrend" -> (() => DedupSources.dupTrend(docs)),
    "syndication" -> (() => DedupSources.syndication(docs)),
    "phashPairs" -> (() => Multimodal.phashPairs(docs)),
    "phashVsIndex" -> (() =>
      Multimodal.phashVsIndex(docs, Multimodal.phashIndex(docs))),
    // an empty FACT side against itself: the graph family must survive a
    // zero-edge graph (no nodes → no labels → no communities)
    "labelPropagation" -> (() => Graph.labelPropagation(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    "communityStats" -> (() => Graph.communityStats(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    // round-11 additions
    "bigramLmVsRef" -> (() => LlmLm.bigramLmVsRef(docs)),
    "motionProfile" -> (() => Multimodal.motionProfile(docs)),
    "clippingReport" -> (() => Multimodal.clippingReport(docs)),
    "coPurchasePairs" -> (() => Graph.coPurchasePairs(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    // constant-group reports: empty in → ZERO rows, no null-poison row
    "coPurchaseGovernance" -> (() => Graph.coPurchaseGovernance(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    "modularity" -> (() => Graph.modularity(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    "degreeDistribution" -> (() => Graph.degreeDistribution(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    "triangleStats" -> (() => Graph.triangleStats(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    "transitivity" -> (() => Graph.transitivity(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    "kcore" -> (() => Graph.kcore(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    // round-13 additions
    "lpaProfile" -> (() => Graph.lpaProfile(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    "hapaxBySource" -> (() => LlmText.hapaxBySource(docs)),
    "dirtyBucketReport" -> (() => Dedup.dirtyBucketReport(
      Dedup.nearDupIndex(docs), Dedup.nearDupIndex(docs))),
    "batchDirtyBuckets" -> (() =>
      Dedup.batchDirtyBuckets(docs, Dedup.nearDupIndex(docs))),
    "phashDirtyBuckets" -> (() => Multimodal.phashDirtyBuckets(
      Multimodal.phashIndex(docs), Multimodal.phashIndex(docs))),
    "dedupTokenBudget" -> (() => Curation.dedupTokenBudget(
      docs, Dedup.nearDupComponents(docs))),
    // round-14 additions
    "annealMix" -> (() => Curation.annealMix(docs)),
    "effectiveTokens" -> (() => Curation.effectiveTokens(
      docs, Dedup.nearDupComponents(docs))),
    "crossDocNgrams" -> (() => LlmText.crossDocNgrams(docs)),
    "chainOverlap" -> (() => DedupSources.chainOverlap(docs)),
    "chainGroups" -> (() => DedupSources.chainGroups(docs)),
    "chainSaturation" -> (() =>
      DedupSources.chainSaturationFrom(DedupSources.chainOverlap(docs))),
    "foldCollisions" -> (() => Dedup.foldCollisions(docs)),
    "gateFairness" -> (() => Curation.gateFairness(docs)),
    "mixAllocation" -> (() => Multimodal.mixAllocation(docs)),
    "personalizedPageRank" -> (() => Graph.personalizedPageRank(
      Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"))),
    "featureProp" -> (() => Graph.featureProp(
      Graph.NeighborIndex(
        Seq.empty[(Long, Long)].toDF("u", "v"), 100, 10),
      Seq.empty[(Long, Double)].toDF("s_suppkey", "s_acctbal"))),
    "incrementalPricingSummary" -> (() => {
      val li = Seq.empty[(Long, String, String, Double, Double, Double,
        Double, java.sql.Timestamp)]
        .toDF("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
      Relational.incrementalPricingSummary(li, li)
    }))

  private val embOps: Seq[(String, () => DataFrame)] = Seq(
    "embeddingDedup" -> (() => Dedup.embeddingDedup(embs)),
    "anisotropy" -> (() => VectorOps.anisotropy(embs)),
    "participationRatio" -> (() => VectorOps.participationRatio(embs)),
    "knnBruteForce" -> (() => Similarity.knnBruteForce(embs)),
    "sq8Serve" -> (() => Similarity.sq8Serve(embs)),
    "alignmentUniformity" -> (() => VectorOps.alignmentUniformity(embs)),
    "rangeSearch" -> (() => Similarity.rangeSearch(embs)),
    "filteredKnn" -> (() => Similarity.filteredKnn(embs)),
    "groupCentroids" -> (() => VectorOps.groupCentroids(embs)),
    "int8Quantize" -> (() => VectorOps.int8Quantize(embs)),
    "zscoreNormalize" -> (() => VectorOps.zscoreNormalize(embs)),
    "binaryQuantize" -> (() => VectorOps.binaryQuantize(embs)),
    "matryoshkaTruncate" -> (() => VectorOps.matryoshkaTruncate(embs)),
    "randomProjection" -> (() => VectorOps.randomProjection(embs)),
    "projectionDistortion" -> (() => VectorOps.projectionDistortion(embs)),
    "ivfRangeVsIndex" -> (() =>
      Similarity.ivfRangeVsIndex(embs, Similarity.ivfAdcIndex(embs))),
    "filteredVsIndex" -> (() =>
      Similarity.filteredVsIndex(embs, Similarity.ivfAdcIndex(embs))),
    "rangeRecall" -> (() => Similarity.rangeRecall(embs)),
    "dimStats" -> (() => VectorOps.dimStats(embs)),
    "standardize" -> (() => VectorOps.standardize(embs)),
    "pqWorstVectors" -> (() => VectorOps.pqWorstVectors(embs)),
    "clusterSizeHistogram" -> (() => Dedup.clusterSizeHistogram(docs)),
    "silenceReport" -> (() => Multimodal.silenceReport(docs)),
    // round-13 additions
    "normBands" -> (() => VectorOps.normBands(embs)),
    "coarseCentroids" -> (() => Similarity.coarseCentroids(embs)),
    "centroidDrift" -> (() => Similarity.centroidDrift(
      Similarity.coarseCentroids(embs), Similarity.coarseCentroids(embs))),
    "batchCellChurn" -> (() => Similarity.batchCellChurn(
      embs, Seq.empty[(Long, Long)].toDF("vec_id", "cent_id"),
      Similarity.coarseCentroids(embs))))

  test("documents operators return empty on an empty corpus, never throw") {
    val bad = (docOps ++ embOps).flatMap { case (name, op) =>
      try {
        val n = op().count()
        if (n == 0) None else Some(s"$name emitted $n rows from nothing")
      } catch {
        case e: Throwable => Some(s"$name threw ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.take(1).mkString)
      }
    }
    assert(bad.isEmpty, s"empty-input violations:\n${bad.mkString("\n")}")
  }
}
