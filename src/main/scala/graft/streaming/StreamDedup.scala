package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time twin of the batch
  * `Dedup.exactDedup` (d1): drop records whose key (or content hash) was
  * already seen, keeping state only within the watermark.
  *
  * `dropDuplicatesWithinWatermark` is the scale-correct primitive: per-key
  * state is evicted once the watermark passes, so state size is bounded by
  * (arrival rate × watermark), not stream length — the difference between
  * a dedup that survives a year of 100 TB/day ingest and one that OOMs.
  * The trade is the standard one: a duplicate arriving after its
  * original's state expired is re-emitted, which downstream batch dedup
  * (d1) mops up. Rows pass through immediately (no aggregation barrier).
  */
object StreamDedup {

  /** Dedup on explicit key columns within the watermark. */
  def exact(df: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Dedup a document stream by content hash: the md5 gate d1 applies in
    * batch, computed as a narrow projection before the stateful operator
    * so the dedup state holds one 32-char hash per document, not the
    * document itself. */
  def byContent(df: DataFrame, tsCol: String, watermark: String,
      contentCol: String): DataFrame =
    df.withColumn("content_md5", md5(col(contentCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("content_md5"))
      // pass-through contract: the helper hash must not leak into the
      // caller's stream schema (schema-sensitive sinks would reject it)
      .drop("content_md5")

  /** Streaming NEAR-dup detection against a stored corpus index — the
    * ingest-time twin of the batch incremental dedup (d13). Each
    * micro-batch runs the SAME batch operator (MinHash band join incoming ×
    * known, exact-Jaccard confirm) with the batch as the incoming side, so
    * per-batch cost scales with the batch and the near-dup pairs reach the
    * caller's sink as they arrive. The known index stays a static frame
    * here (nightly-rebuilt in practice); appending accepted docs back into
    * the index is the caller's policy, same as d13's batch contract.
    * foreachBatch (not a stream-static join) because the band join needs
    * `distinct` + a persist bracket — legal on the per-batch BATCH frame,
    * illegal mid-stream. */
  def nearDupVsIndex(
      docs: DataFrame,
      known: DataFrame,
      sink: DataFrame => Unit,
      threshold: Double = 0.7): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-neardup-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup.incrementalDedup(batch, known, threshold))
        ()
      }
      .start()

  /** [[nearDupVsIndex]] against a PREBUILT `Dedup.nearDupIndex` table —
    * the form a production ingest runs: the stored side is a lake table
    * of (doc_id, sh, bkeys) appended per ingest, so each micro-batch pays
    * only for ITS documents' shingling; the corpus is never re-hashed
    * (at 100 TB the re-hash would dominate every batch). */
  def nearDupVsPrebuiltIndex(
      docs: DataFrame,
      index: DataFrame,
      sink: DataFrame => Unit,
      threshold: Double = 0.7): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-neardup-vs-prebuilt-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup
          .incrementalDedupVsIndex(batch, index, threshold))
        ()
      }
      .start()

  /** Streaming dirty-bucket gauge (d38's live twin — the VERDICT r12 #8
    * pattern applied to the dedup family): per micro-batch, which LSH
    * buckets the arrivals touch, split into brand-new bucket space vs
    * hits on the stored index's keys — the duplication-pressure dial an
    * ingest watches between nightly d38 reports. The sink receives
    * (n_touched, n_new, n_existing, new_frac, batch_id); per-batch cost
    * is the batch's own shingling + a bucket-scale equi-join. Spec pins
    * stream output == `Dedup.batchDirtyBuckets` on the same frames. */
  def dirtyBucketGauge(
      docs: DataFrame,
      index: DataFrame,
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-dirty-bucket-gauge")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.operators.Dedup.batchDirtyBuckets(batch, index)
          .withColumn("batch_id",
            org.apache.spark.sql.functions.lit(batchId)))
        ()
      }
      .start()

  /** Streaming EXACT-recall dedup against a stored prefix-filter index
    * (d27's streaming twin): each arriving batch ranks its tokens by the
    * index's frozen frequency order and joins its prefixes against the
    * stored ones — the [[nearDupVsPrebuiltIndex]] contract with the
    * prefix-filter family's exact cross-set recall guarantee instead of
    * the LSH bands' probabilistic one. The index tables
    * ([[graft.operators.Dedup.PrefixFilterIndex]]) are lake scans rebuilt
    * offline; per-batch cost scales with the batch. */
  def prefixVsIndex(
      docs: DataFrame,
      index: graft.operators.Dedup.PrefixFilterIndex,
      sink: DataFrame => Unit,
      threshold: Double = 0.7): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-prefix-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup
          .prefixFilterVsIndex(batch, index, threshold))
        ()
      }
      .start()

  /** Streaming span-level boilerplate scoring against a stored shared-span
    * index — the span-granularity sibling of [[nearDupVsIndex]] (batch
    * operator: `LlmText.spanScoreVsIndex`, d19; index builder:
    * `LlmText.sharedSpanIndex`). Each arriving document is scored for
    * known-boilerplate content as it lands; the index is a small broadcast
    * frame rebuilt offline. foreachBatch so every batch emits its COMPLETE
    * per-doc scores immediately (a stream-side groupBy would hold them for
    * a watermark). */
  def spanScoreVsIndex(
      docs: DataFrame,
      index: DataFrame,
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-spanscore-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.LlmText.spanScoreVsIndex(batch, index))
        ()
      }
      .start()

  /** Streaming perceptual-hash dedup advisory against the stored
    * signature table (mm9's twin, completing the vs-index streaming
    * family across modalities: text prefixes ([[prefixVsIndex]]), spans
    * ([[spanScoreVsIndex]]), embeddings (StreamSimilarity), and now
    * media): each arriving medium is hashed, its band keys probe the
    * index, survivors get the exact Hamming check — the online "have we
    * already got this image" gate. Spec pins stream output ==
    * `Multimodal.phashVsIndex` on the same rows. */
  def phashVsIndex(
      docs: DataFrame,
      index: graft.operators.Multimodal.PhashIndex,
      sink: DataFrame => Unit,
      maxHamming: Int = 6): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-phash-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Multimodal
          .phashVsIndex(batch, index, maxHamming = maxHamming))
        ()
      }
      .start()

  /** Streaming continuation detection against the stored boundary index
    * (d39's live twin): each arriving document's leading 3-gram
    * positions probe `DedupSources.chainBoundaryIndex`'s suffix keys, so
    * a crawl-split continuation is flagged the batch it lands — the
    * online "does this document continue one we already hold" gate next
    * to [[prefixVsIndex]]'s whole-doc near-dup advisory. foreachBatch so
    * every batch emits its complete verified stitches immediately. Spec
    * pins stream output == `DedupSources.chainOverlapVsIndex` on the
    * same rows through a parquet round-trip of the index. */
  def chainVsIndex(
      docs: DataFrame,
      index: DataFrame,
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-chain-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.DedupSources.chainOverlapVsIndex(batch, index))
        ()
      }
      .start()
}
