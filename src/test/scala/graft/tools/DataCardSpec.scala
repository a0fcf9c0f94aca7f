package graft.tools

import graft.SparkSpec
import graft.operators.DedupSources

/** The datasheet generator renders every governance section from the
  * sample corpus — the compiled guarantee that the card's operators stay
  * composable and its cells stay populated. */
class DataCardSpec extends SparkSpec {

  test("render produces every section with populated tables") {
    val card = DataCard.render(spark, "/root/testdata/sf0.001")
    for (section <- Seq(
        "## Overview",
        "## Predicted language mix (x2)",
        "## Per-source health (c13)",
        "## Dedup governance (d16: dropped mass + cap accounting)",
        "## Vocabulary divergence vs corpus (x23, KL nats)",
        "## Near-dup detector operating points",
        "## Audit sampling allocation (c22: Neyman, budget 1000)",
        "## Length-weighted audit sample (c23: A-ES, first 10 keys)",
        "## Top collocations (x29: PMI head)",
        "## Duplication-rate trend by ingest bucket (d29)",
        "## Vocabulary growth / Heaps curve (x31)",
        "## Top syndication pairs (d30: shared opening fingerprints)",
        "## Within/cross-source duplicate split (d37: can dedup shard " +
          "by source?)",
        "## Media mix (mm8: first rows)",
        "## Silence/blank rates by source (mm10)",
        "## Perceptual-hash duplicate advisory by source (mm6/mm9)",
        "## Least-plausible docs under the reference LM (x37: review queue)",
        "## Motion / scene-cut profile (mm13: summary)",
        "## Tokenizer merge table (x25: first BPE merges)",
        "## Embedding cluster quality (e14",
        "## Clipping rates by source (mm14: full-scale pileup)",
        "## Embedding geometry (e20: corpus anisotropy)",
        "## Purchase-graph community quality (g7: Newman Q)",
        "## Co-purchase clustering (g10: transitivity of the top-k " +
          "affinity graph)",
        "## Co-purchase hub-cap accounting (g6)",
        "## Reference-LM score by source (x39: pooled, worst feed first)",
        "## Embedding spectrum shape (e22: spectral gap)",
        "## Affinity-graph components (g12: largest first)",
        "## Perceptual-hash distance histogram (mm15: cutoff tuning)",
        "## Neighbor-index churn (g13: stored split vs fresh build)",
        "## LSH dirty buckets (d38: tonight's incremental re-pair " +
          "estimate)",
        "## Phash dirty buckets (mm16: the multimodal twin)",
        "## Post-dedup token budget by source (c30: worst retention " +
          "first)",
        "## Iterative-op convergence accounting"))
      assert(card.contains(section), s"missing section: $section\n$card")
    // overview numbers are real
    assert("- documents: (\\d+)".r.findFirstMatchIn(card)
      .exists(_.group(1).toLong > 0))
    // the curve section pins the three operating points
    assert(card.contains("0.700000") || card.contains("| 0.7 |"),
      "jaccard=0.7 operating point present")
    // every markdown table has at least one data row (header + sep + row)
    val tables = card.split("\n## ").drop(1)
    tables.filter(_.contains("| ---")).foreach { t =>
      assert(t.linesIterator.count(_.startsWith("| ")) >= 3,
        s"empty table in section:\n$t")
    }
  }

  test("media sections derive from ONE shared catalog scan") {
    import graft.operators.{Caching, DedupSources, Multimodal, Tables}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the card's shape: one persisted media-catalog scan, all three media
    // sections (mm8 mix, mm10 silence, mm6/mm9 phash advisory) off it
    val cat = Multimodal.mediaCatalog(docs)
    val (mix, silence, phash) = Caching.withPersisted3(cat)((
      Multimodal.mediaMix(cat),
      Multimodal.silenceSummaryFromCatalog(cat),
      Multimodal.phashAdvisoryFromCatalog(cat)))
    // the mix off the catalog is exactly the standalone oracle-pinned mm8
    assert(mix.collect().map(_.toSeq).toSet ==
      Multimodal.mediaMix(docs).collect().map(_.toSeq).toSet)
    // silence/advisory rows exist for every source in the corpus
    val sources = docs.select("source").distinct().count()
    assert(silence.count() == sources, "one silence row per source")
    assert(phash.count() == sources, "one advisory row per source")
    // the LAST section's executed plan read the persisted catalog, not
    // the corpus (the d29/d30 plan pin): cached-scan leaves only, every
    // FileScan mention living inside a cached-relation description
    val plan = Caching.lastMaterializedPlan
    assert(plan.contains("InMemoryTableScan"),
      s"expected the shared cached catalog in the plan:\n$plan")
    def occurrences(needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)
    assert(occurrences("FileScan") == occurrences("InMemoryRelation"),
      s"a media section re-scanned the corpus:\n$plan")
  }

  test("d29/d30 sections derive from ONE shared fingerprint pass") {
    import graft.operators.{Caching, Dedup, Tables}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the card's shape: one persisted fingerprint scan, both sections off it
    val fp = DedupSources.dupFingerprints(docs)
    val (trend, synd) = Caching.withPersisted2(fp)((
      DedupSources.dupTrendFromFingerprints(fp),
      DedupSources.syndicationFromFingerprints(fp)))
    // identical to the standalone oracle-pinned operators
    assert(trend.collect().map(_.toSeq).toSet ==
      DedupSources.dupTrend(docs).collect().map(_.toSeq).toSet)
    assert(synd.collect().map(_.toSeq).toSet ==
      DedupSources.syndication(docs).collect().map(_.toSeq).toSet)
    // and the SECOND section's executed plan read the persisted pass, not
    // the corpus: a cached-scan leaf, zero parquet leaves — the compiled
    // guarantee that the card never re-runs the text scan per section
    val plan = Caching.lastMaterializedPlan
    assert(plan.contains("InMemoryTableScan"),
      s"expected the shared cached pass in the plan:\n$plan")
    // every parquet mention must live INSIDE a cached-relation description
    // (InMemoryRelation prints its stored build plan); a LIVE re-scan
    // would add a FileScan leaf with no matching InMemoryRelation
    def occurrences(needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)
    assert(occurrences("FileScan") == occurrences("InMemoryRelation"),
      s"second section re-scanned the corpus:\n$plan")
  }
}
