package graft.tools

import graft.operators.{Curation, Dedup, DedupSources, LlmText, Similarity, Tables}

import org.apache.spark.sql.SparkSession

/** Compiled form of the README quick start — the batch curation pipeline a
  * training-data job runs, end to end on the sample data. Keeping it a
  * runnable main means the documented API cannot silently drift from the
  * real one.
  *
  * Usage: sbt "runMain graft.tools.PipelineExample [sfDir]"
  */
object PipelineExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)

    // one LSH + connected-components pass feeds every downstream consumer
    val components = Dedup.nearDupComponents(docs)
    val cleanedBySource = Dedup.dedupApply(docs, components)
    val splits = Curation.leakageSafeSplit(docs, components, 80, 10)

    val quality = LlmText.qualityScore(docs)
    val mix = Curation.domainMix(docs)
    val curated = Curation.curationPipeline(docs)
    val packs = Curation.packSequences(docs)
    val neighbors = Similarity.annIvf(Tables.embeddings(spark, dir))

    // compliance + retrieval prep over the same corpus
    val redacted = LlmText.piiRedact(docs)
    val chunks = Curation.chunkOverlap(docs)
    val report = Curation.sourceReport(docs)
    val overlap = DedupSources.sourceOverlap(docs)

    // nightly-ingest shape: the newest batch dedups against the ingested
    // corpus (cross-set band join), never corpus × corpus
    val batch = docs.filter("doc_id % 10 = 0")
    val corpus = docs.filter("doc_id % 10 <> 0")
    val ingestDups = Dedup.incrementalDedup(batch, corpus)

    // corpus-health: vocabulary head + hashed features + PQ compression
    val zipfHead = LlmText.tokenZipf(docs, k = 10)
    val features = LlmText.featureHash(docs)
    val pq = graft.operators.VectorOps.pqEncode(Tables.embeddings(spark, dir))

    // exact-recall family + audit sampling + governance trends (round 8)
    val exactPairs = Dedup.prefixFilterPairs(docs)
    val audit = Curation.weightedSample(docs, k = 25)
    val trend = DedupSources.dupTrend(docs)
    val growth = LlmText.vocabGrowth(docs)

    println(s"docs=${docs.count()}")
    println(s"near-dup clusters=${components.filter("NOT keep").count()} drops")
    println(s"kept per source rows=${cleanedBySource.count()}")
    println("splits: " + splits.groupBy("split").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" "))
    println(s"quality-pass=${quality.filter("is_quality").count()}")
    println(s"domain-mixed=${mix.count()}")
    println(s"curated rows=${curated.count()}")
    println(s"packs=${packs.select("shard", "pack_id").distinct().count()}")
    println(s"ann rows=${neighbors.count()}")
    println(s"docs with PII found=${redacted.filter("n_emails > 0").count()}")
    println(s"rag chunks=${chunks.count()}")
    println(s"sources reported=${report.count()}, " +
      s"overlapping source pairs=${overlap.count()}")
    println(s"ingest batch dups vs corpus=${ingestDups.count()}")
    println("zipf head: " + zipfHead.collect()
      .map(r => s"${r.getString(1)}:${r.getLong(2)}").take(3).mkString(" "))
    println(s"hashed feature cells=${features.count()}, " +
      s"pq codes=${pq.count()}")
    println(s"exact-recall pairs=${exactPairs.count()}, " +
      s"audit sample=${audit.count()}, " +
      s"dup-trend buckets=${trend.count()}, " +
      s"vocab-growth buckets=${growth.count()}")
    spark.stop()
  }
}
