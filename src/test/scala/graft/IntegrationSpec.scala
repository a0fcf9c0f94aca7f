package graft

import java.sql.Timestamp

import graft.operators.{Curation, Dedup, LlmText}
import graft.streaming.{GraftStream, StreamDedup}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Capstone composition: the pieces a training-data pipeline chains —
  * streaming ingest with content dedup, partitioned lake landing, then
  * batch curation over the landed corpus. Each operator is specced alone
  * elsewhere; this pins that they compose (schemas line up, the landed
  * layout feeds the batch side unchanged). */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("stream ingest → dedup → lake → batch curation composes") {
    implicit val sqlCtx = spark.sqlContext
    val lake = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val goodText = "the cat and the dog of a house is that one there now"

    // -- streaming side: dedup on content, land partitioned by lang --
    val input = MemoryStream[(Timestamp, Long, String, String, String)]
    val sink = GraftStream.parquetLakeSink(lake, Seq("lang"))
    val deduped = StreamDedup.byContent(
      input.toDF().toDF("ts", "doc_id", "lang", "source", "text"),
      "ts", "10 minutes", "text")
    val q = deduped.writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => sink(b))
      .start()
    try {
      input.addData(Seq(
        (ts(100), 1L, "en", "crawl-a", goodText),
        (ts(101), 2L, "en", "crawl-b", "spam spam spam spam spam spam"),
        (ts(102), 3L, "fr", "crawl-a", "zz qq ww")))
      q.processAllAvailable()
      // exact duplicate of doc 1 arrives later — dropped in-stream
      input.addData(Seq((ts(103), 4L, "en", "crawl-c", goodText)))
      q.processAllAvailable()
    } finally q.stop()

    // -- batch side: read the landed lake, curate --
    val landed = spark.read.parquet(lake)
    assert(landed.count() == 3, "stream dedup dropped the duplicate")
    assert(new java.io.File(lake).list().exists(_.startsWith("lang=")),
      "partitioned layout on disk")

    val corpus = landed
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    // batch mop-up finds nothing left to dedup exactly
    assert(Dedup.exactDedup(corpus).filter(col("n_copies") > 1).count() == 0)
    // quality/repetition gates keep exactly the good doc
    val kept = Curation.curationPipeline(corpus).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("en" -> 1L), s"got $kept")
    // and the OOV/packing ops run over the same landed frame
    assert(LlmText.vocabOov(corpus, 8).count() == 3)
    assert(Curation.packSequences(corpus, budget = 16, shards = 2)
      .agg(sum("n_tokens")).head().getLong(0) ==
      corpus.select(size(split(col("text"), " ")).cast("long").as("n"))
        .agg(sum("n")).head().getLong(0))
  }
}
