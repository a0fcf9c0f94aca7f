package graft.tools

import java.nio.file.{Files, Paths}

import graft.operators.{Curation, Dedup, DedupSources, LlmBpe, LlmLm, LlmText, Multimodal, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Datasheet generator: one runnable main that composes the governance
  * queries into a markdown data card — the "Datasheets for Datasets"-style
  * artifact a training-data release ships next to the shards. Every number
  * comes from an oracle-checked operator (c13 source health, d16 dedup
  * governance, x23 vocabulary divergence, x2 language mix, d23 detector
  * curve), so the card's cells are exactly as trustworthy as the
  * correctness gate.
  *
  * Usage: `sbt "runMain graft.tools.DataCard <sfDir> <out.md>"`.
  *
  * Scale note: each section is a small aggregate (rows = sources,
  * languages, or a fixed grid) — the card generation collects only
  * report-sized frames; the corpus passes stay distributed.
  */
object DataCard {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DataCard <sfDir> <outPath>")
    val Array(sfDir, outPath) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      Files.writeString(Paths.get(outPath), render(spark, sfDir))
      System.err.println(s"[datacard] wrote $outPath")
    } finally spark.stop()
  }

  /** The card body, exposed for the spec. */
  def render(spark: SparkSession, sfDir: String): String = {
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)

    val overview = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(LlmText.words(col("text")))).as("n_tokens"),
      count_distinct(col("source")).as("n_sources"),
      count_distinct(col("lang")).as("n_langs")).collect().head

    val langMix = LlmText.langId(docs)
      .groupBy(col("pred_lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pred_lang"))

    val health = Curation.sourceReport(docs).orderBy(col("source"))
    val governance = Dedup.governanceReport(docs)
      .orderBy(col("kind"), col("section"))
    val divergence = LlmText.sourceDivergence(docs)
      .orderBy(col("kl_nats").desc)
    val curve = Dedup.lshCandidateCurve(spark)
      .filter(col("jaccard").isin(0.5, 0.7, 0.9))
    val audit = Curation.neymanAllocation(docs).orderBy(col("source"))
    val auditSample = Curation.weightedSample(docs, k = 10)
    val phrases = LlmText.pmiCollocations(docs, k = 10)
    // ONE text-scan fingerprint pass feeds all three duplication sections
    // (d29 trend + d30 syndication + d37 within/cross split); the frames
    // are materialized (lineage truncated) off the persisted pass so the
    // later section-collects can't silently re-run it
    val fp = DedupSources.dupFingerprints(docs)
    val (trendRaw, syndRaw, splitRaw) =
      graft.operators.Caching.withPersisted3(fp)((
        DedupSources.dupTrendFromFingerprints(fp),
        DedupSources.syndicationFromFingerprints(fp),
        DedupSources.dupSourceSplitFromFingerprints(fp)))
    val trend = trendRaw.orderBy(col("bucket"))
    val dupSplit = splitRaw.orderBy(col("source"))
    val growth = LlmText.vocabGrowth(docs).orderBy(col("bucket"))
    val synd = syndRaw
      .orderBy(col("n_dup_pairs").desc, col("source_a"), col("source_b"))
      .limit(10)
    // ONE media-catalog scan feeds ALL media sections (mm8 mix + mm10
    // silence rates + mm6/mm9 phash dup advisory) — the d29/d30
    // one-pass pattern applied to the payload column
    val cat = Multimodal.mediaCatalog(docs)
    val (mediaRaw, silenceRaw, phashRaw) =
      graft.operators.Caching.withPersisted3(cat)((
        Multimodal.mediaMix(cat),
        Multimodal.silenceSummaryFromCatalog(cat),
        Multimodal.phashAdvisoryFromCatalog(cat)))
    val media = mediaRaw.orderBy(col("source"), col("format")).limit(12)
    val silence = silenceRaw.orderBy(col("source"))
    val phashAdv = phashRaw.orderBy(col("source"))
    val merges = LlmBpe.bpeTrain(docs)
    val clusters = graft.operators.VectorOps.clusterQuality(embs)
      .orderBy(col("margin"))
    // motion summary rides its own frame pass (frame RMS needs the raw
    // payload bytes, not the catalog's per-media features): one row —
    // media with motion data, mean of per-media mean deltas, total cuts
    // the x37 clean-model fluency gate's worst offenders: the docs the
    // held-out reference LM finds least plausible — the review queue a
    // curation pass reads before tightening the score threshold
    val lmWorst = LlmLm.bigramLmVsRef(docs)
      .orderBy(col("avg_logprob"), col("doc_id")).limit(10)
    val motion = Multimodal.motionProfile(docs)
      .agg(count(lit(1)).as("n_media"),
        avg(col("mean_abs_delta")).as("avg_mean_delta"),
        max(col("max_abs_delta")).as("max_delta"),
        sum(col("n_cuts")).as("n_scene_cuts"))
    // e20: the one-row geometry gauge cosine thresholds depend on
    val aniso = graft.operators.VectorOps.anisotropy(embs)
    // mm14 rolled up per source (the silence-section shape, loud end)
    val clipping = Multimodal.clippingReport(docs)
      .join(docs.select(col("doc_id").as("media_id"), col("source")),
        "media_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(when(col("is_clipped"), 1L).otherwise(0L)).as("n_clipped"),
        avg(col("clip_frac")).as("avg_clip_frac"),
        max(col("peak")).as("max_peak"))
      .orderBy(col("source"))
    // the purchase-graph community readout (ONE shared label index feeds
    // g7's quality number; the g6 cap accounting shares the fact scan)
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val labelIdx = graft.operators.Graph.labelIndex(li, ord)
    val modularity = graft.operators.Graph.modularity(labelIdx)
    val copurchase = graft.operators.Graph.coPurchaseGovernance(li, ord)
    // ONE neighbor-edge build feeds the whole triangle/core/component
    // family (the round-12 stored/serve split, exercised here the way a
    // nightly card job would): g10's transitivity fold and g12's
    // component table read the same stored edges
    val nIdx = graft.operators.Graph.neighborIndex(li, ord)
    val transitivity = graft.operators.Graph.transitivityOf(
      graft.operators.Graph.triangleStats(nIdx))
    val components = graft.operators.Graph.componentSizes(nIdx)
      .orderBy(col("n_nodes").desc, col("component")).limit(10)
    // g13: how much of the stored index yesterday's build would miss
    val churn = graft.operators.Graph.neighborChurn(nIdx,
      graft.operators.Graph.neighborIndex(li,
        ord.filter(col("o_orderkey") % 10 =!= 0)))
    // d38/mm16: tonight's incremental re-pair work estimate — which
    // fraction of the LSH / phash bucket space yesterday's build left
    // dirty (the dirty-bucket family, one row each)
    val dirtyLsh = Dedup.dirtyBucketReport(
      Dedup.nearDupIndex(docs),
      Dedup.nearDupIndex(docs.filter(col("doc_id") % 10 =!= 0)))
    val dirtyPhash = Multimodal.phashDirtyBuckets(
      Multimodal.phashIndex(docs),
      Multimodal.phashIndex(docs.filter(col("doc_id") % 10 =!= 0)))
    // c30: the token budget a training-mix plan actually schedules —
    // per source, before/after the near-dup keeper decision
    val budget = Curation.dedupTokenBudget(
        docs, Dedup.nearDupComponents(docs, 0.7))
      .orderBy(col("token_frac"), col("source"))
    // x39: the per-feed off-distribution dial, worst source first
    val lmBySource = LlmLm.lmScoreBySource(docs)
      .orderBy(col("avg_logprob"), col("source"))
    // e22: one-row spectrum shape next to e20's anisotropy
    val gap = graft.operators.VectorOps.spectralGap(embs)
    // mm15: is the phash cutoff clipping real duplicates?
    val hammingHist = Multimodal.phashHammingHistogram(docs)
      .orderBy(col("hamming"))

    val sb = new StringBuilder
    sb ++= "# Data card\n\n"
    sb ++= s"Corpus: `$sfDir`\n\n"
    sb ++= "## Overview\n\n"
    sb ++= s"- documents: ${overview.getLong(0)}\n"
    sb ++= s"- whitespace tokens: ${overview.getLong(1)}\n"
    sb ++= s"- sources: ${overview.getLong(2)}\n"
    sb ++= s"- declared languages: ${overview.getLong(3)}\n\n"
    sb ++= section("Predicted language mix (x2)", langMix)
    sb ++= section("Per-source health (c13)", health)
    sb ++= section("Dedup governance (d16: dropped mass + cap accounting)",
      governance)
    sb ++= section("Vocabulary divergence vs corpus (x23, KL nats)",
      divergence)
    sb ++= section(
      "Near-dup detector operating points (d23: P(candidate|jaccard))",
      curve)
    sb ++= section(
      "Audit sampling allocation (c22: Neyman, budget 1000)", audit)
    sb ++= section(
      "Length-weighted audit sample (c23: A-ES, first 10 keys)", auditSample)
    sb ++= section("Top collocations (x29: PMI head)", phrases)
    sb ++= section("Duplication-rate trend by ingest bucket (d29)", trend)
    sb ++= section("Vocabulary growth / Heaps curve (x31)", growth)
    sb ++= section("Top syndication pairs (d30: shared opening fingerprints)",
      synd)
    sb ++= section(
      "Within/cross-source duplicate split (d37: can dedup shard by source?)",
      dupSplit)
    sb ++= section("Media mix (mm8: first rows)", media)
    sb ++= section("Silence/blank rates by source (mm10)", silence)
    sb ++= section("Clipping rates by source (mm14: full-scale pileup)",
      clipping)
    sb ++= section(
      "Perceptual-hash duplicate advisory by source (mm6/mm9)", phashAdv)
    sb ++= section(
      "Least-plausible docs under the reference LM (x37: review queue)",
      lmWorst)
    sb ++= section(
      "Reference-LM score by source (x39: pooled, worst feed first)",
      lmBySource)
    sb ++= section("Motion / scene-cut profile (mm13: summary)", motion)
    sb ++= section("Tokenizer merge table (x25: first BPE merges)", merges)
    sb ++= section(
      "Embedding cluster quality (e14: cohesion vs separation, worst first)",
      clusters)
    sb ++= section("Embedding geometry (e20: corpus anisotropy)", aniso)
    sb ++= section("Embedding spectrum shape (e22: spectral gap)", gap)
    sb ++= section("Purchase-graph community quality (g7: Newman Q)",
      modularity)
    sb ++= section("Co-purchase clustering (g10: transitivity of the " +
      "top-k affinity graph)", transitivity)
    sb ++= section("Co-purchase hub-cap accounting (g6)", copurchase)
    sb ++= section("Affinity-graph components (g12: largest first)",
      components)
    sb ++= section(
      "Neighbor-index churn (g13: stored split vs fresh build)", churn)
    sb ++= section(
      "Perceptual-hash distance histogram (mm15: cutoff tuning)",
      hammingHist)
    sb ++= section(
      "LSH dirty buckets (d38: tonight's incremental re-pair estimate)",
      dirtyLsh)
    sb ++= section(
      "Phash dirty buckets (mm16: the multimodal twin)", dirtyPhash)
    sb ++= section(
      "Post-dedup token budget by source (c30: worst retention first)",
      budget)
    // the graph sections above ran the to-fixpoint builds; their
    // convergence accounting ships ON the card so a release sign-off
    // reads converged=true next to the numbers it certifies
    sb ++= section(
      "Iterative-op convergence accounting (lpa/kcore: must all read " +
        "converged=true)",
      graft.operators.Graph.convergenceReport(spark))
    sb.result()
  }

  /** A DataFrame as a compact markdown table (reports only — collects). */
  private def section(title: String, df: DataFrame): String = {
    val cols = df.columns
    val rows = df.collect()
    val sb = new StringBuilder
    sb ++= s"## $title\n\n"
    sb ++= cols.mkString("| ", " | ", " |\n")
    sb ++= cols.map(_ => "---").mkString("| ", " | ", " |\n")
    rows.foreach { r =>
      sb ++= cols.indices.map { i =>
        r.get(i) match {
          case d: Double => f"$d%.6f"
          case v => String.valueOf(v)
        }
      }.mkString("| ", " | ", " |\n")
    }
    sb ++= "\n"
    sb.result()
  }
}
