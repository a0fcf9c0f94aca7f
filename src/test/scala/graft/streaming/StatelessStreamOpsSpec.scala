package graft.streaming

import graft.SparkSpec
import graft.operators.{Curation, LlmText}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The batch text/curation operators that are pure projections apply to
  * streaming DataFrames UNCHANGED — no twin implementation, no rewrite:
  * the same Column trees run per micro-batch. Pins that contract for a
  * quality filter (x18) and the shard assigner (c16), so a refactor that
  * sneaks a shuffle/aggregate into either (making them stream-illegal
  * without a watermark) fails here. */
class StatelessStreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gopherRules and shuffleShard run per micro-batch, equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")

    val rules = LlmText.gopherRules(docs, minWords = 3, maxWords = 10,
      minMwl = 1.0, maxMwl = 8.0, maxSymbolRatio = 0.1, minAlphaFrac = 0.8,
      maxDupFrac = 0.5, minStopwords = 1)
    val shards = Curation.shuffleShard(docs, shards = 4)

    val q1 = rules.writeStream.format("memory").queryName("rules_out")
      .outputMode("append").start()
    val q2 = shards.writeStream.format("memory").queryName("shards_out")
      .outputMode("append").start()
    val rows = Seq((1L, "the whale is quite large"),
      (2L, "the the the the the"), (3L, "ab cd"))
    try {
      input.addData(rows)
      q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }

    val streamed = spark.table("rules_out").collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("pass"))).toMap
    val batch = LlmText.gopherRules(rows.toDF("doc_id", "text"),
        minWords = 3, maxWords = 10, minMwl = 1.0, maxMwl = 8.0,
        maxSymbolRatio = 0.1, minAlphaFrac = 0.8, maxDupFrac = 0.5,
        minStopwords = 1).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("pass"))).toMap
    assert(streamed == batch)

    val shardStream = spark.table("shards_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val shardBatch = Curation.shuffleShard(rows.toDF("doc_id", "text"), 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(shardStream == shardBatch)
  }

  test("patchExtract and binaryQuantize run per micro-batch, equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Multimodal, VectorOps}

    val docsIn = MemoryStream[(Long, String)]
    val patches = Multimodal.patchExtract(docsIn.toDF().toDF("doc_id", "text"))
    val q1 = patches.writeStream.format("memory").queryName("patches_out")
      .outputMode("append").start()
    val docRows = Seq((1L, "a" * 40), (2L, ""))
    try { docsIn.addData(docRows); q1.processAllAvailable() }
    finally q1.stop()
    val patchStream = spark.table("patches_out").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(3)).toMap
    val patchBatch = Multimodal.patchExtract(docRows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(3)).toMap
    assert(patchStream == patchBatch && patchBatch.nonEmpty)

    val vecIn = MemoryStream[(Long, Array[Float])]
    val quant = VectorOps.binaryQuantize(
      vecIn.toDF().toDF("vec_id", "embedding"))
    val q2 = quant.writeStream.format("memory").queryName("quant_out")
      .outputMode("append").start()
    val vecRows = Seq((1L, Array.tabulate(64)(i => if (i % 3 == 0) 1f else -1f)))
    try { vecIn.addData(vecRows); q2.processAllAvailable() }
    finally q2.stop()
    val quantStream = spark.table("quant_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val quantBatch = VectorOps.binaryQuantize(
        vecRows.toDF("vec_id", "embedding")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(quantStream == quantBatch && quantBatch.nonEmpty)
  }
}
