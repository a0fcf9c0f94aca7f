package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming similarity search — the ingest-time twin of the batch ANN
  * family: a stream of query embeddings is scored against a STATIC corpus
  * index (nightly-rebuilt in practice), emitting top-k neighbors per query
  * as each micro-batch arrives. The retrieval shape every "find training
  * examples like this incoming one" / online-dedup-advisory service runs.
  */
object StreamSimilarity {

  /** ANN serving: each micro-batch of queries searches the STORED IVF-ADC
    * index ([[graft.operators.Similarity.IvfAdcIndex]] lake tables) via
    * the s13/s14 search phase — probe cells, ADC-score only probed cells'
    * codes, exact re-rank against the stored corpus frame. The
    * production online-retrieval path: per-batch cost is the batch's
    * probes + candidate ADC, never a corpus scan beyond the re-rank
    * gather. Spec pins stream output == `Similarity.ivfAdcServe` on the
    * same rows. */
  def ivfAdcVsIndex(
      queries: DataFrame,
      corpus: DataFrame,
      index: graft.operators.Similarity.IvfAdcIndex,
      sink: DataFrame => Unit,
      k: Int = 10,
      probeK: Int = 30): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .queryName("graft-ivfadc-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Similarity
          .ivfAdcServe(batch, corpus, index, k, probeK))
        ()
      }
      .start()

  /** Streaming FILTERED ANN serving (s22's twin): each micro-batch of
    * queries searches only the stored rows in the caller-supplied
    * allow-list (a `vec_id` frame — a metadata predicate evaluated
    * against the lake, a tenant scope, a freshness window), with the
    * filter semi-joined into the codes table BEFORE candidate scoring —
    * pre-filter semantics per batch, so a selective filter cannot
    * starve the per-query top-k. Spec pins stream output ==
    * `Similarity.filteredServe` on the same rows. */
  def filteredVsIndex(
      queries: DataFrame,
      corpus: DataFrame,
      index: graft.operators.Similarity.IvfAdcIndex,
      allowed: DataFrame,
      sink: DataFrame => Unit,
      k: Int = 10,
      probeK: Int = 30): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .queryName("graft-filtered-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Similarity
          .filteredServe(batch, corpus, index, allowed, k, probeK))
        ()
      }
      .start()

  /** Streaming range serving (s16's twin): each micro-batch of queries
    * finds ALL stored neighbors above the cosine threshold inside its
    * probed cells — the online "is this incoming document near anything
    * we already have" advisory gate, where the answer set is every
    * sufficiently-close match (dedup advisories, blocklist expansion),
    * not a fixed k. Spec pins stream output == `Similarity.ivfRangeServe`
    * on the same rows; caller-namespace query ids (no self-exclusion). */
  def rangeVsIndex(
      queries: DataFrame,
      corpus: DataFrame,
      index: graft.operators.Similarity.IvfAdcIndex,
      sink: DataFrame => Unit,
      minCos: Double = 0.3): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .queryName("graft-range-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Similarity
          .ivfRangeServe(batch, corpus, index, minCos))
        ()
      }
      .start()

  /** Exact cosine top-k per streaming query against the static index.
    *
    * A plain stream-static join: the query stream stays append-only (no
    * aggregation barrier — the per-query top-k heap runs inside
    * foreachBatch on the bounded batch frame), and the index side is the
    * same frame every batch, so Spark broadcasts or re-uses its scan per
    * micro-batch. Per-batch cost is |batch| × |index| dot products — the
    * s1 brute-force tier; swap `index` for a band-bucketed or coarse-tier
    * candidate frame to run the s2/s6 shapes unchanged, because the batch
    * operator composes the same way.
    *
    * foreachBatch (not a raw stream-static join) for the same reason as
    * [[StreamDedup.nearDupVsIndex]]: the top-k reduction and the result
    * sink are batch-frame operations, illegal mid-stream. */
  def knnVsIndex(
      queries: DataFrame,
      index: DataFrame,
      sink: DataFrame => Unit,
      k: Int = 10): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .queryName("graft-knn-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(knnBatch(batch, index, k))
        ()
      }
      .start()

  /** One micro-batch worth of scoring: broadcast the (small) query batch
    * against the index scan, exact cosine, heap top-k per query — the
    * batch-side logic shared with the streaming wrapper and directly
    * testable. */
  private[streaming] def knnBatch(batch: DataFrame, index: DataFrame,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    val q = batch.select(col("vec_id").as("query_id"),
      graft.operators.VectorOps.asDouble(col("embedding")).as("qx"))
      .withColumn("qnrm",
        sqrt(graft.operators.VectorOps.norm2(col("qx"))))
    val c = index.select(col("vec_id").as("neighbor_id"),
      graft.operators.VectorOps.asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(graft.operators.VectorOps.norm2(col("x"))))
    val scored = broadcast(q)
      .join(c, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.GraftFunctions.dot(col("qx"), col("x")) /
          (col("qnrm") * col("nrm"))).as("cos"))
    graft.plans.TopK.perKey(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("neighbor_id")), k)
  }

  /** Streaming cell-churn gauge (s24's twin — VERDICT r12 #8): each
    * micro-batch of arriving vectors is compared STORED assignment
    * (build N's cells lake table) vs a fresh local assignment against
    * build N+1's centroid table, emitting one churn row per batch —
    * the rebuild-cadence signal LIVE instead of nightly. The sink
    * receives (n_rows, n_known, n_unknown, n_moved, moved_frac,
    * batch_id); an operator watching moved_frac spike after a retrain
    * flips consumers to the new build and invalidates cell-local
    * caches without waiting for the batch report. Per-batch cost is
    * one equi-join against the stored cells + one ≤|centroids|
    * broadcast scan — O(batch), independent of corpus size. Spec pins
    * stream output == `Similarity.batchCellChurn` on the same rows. */
  def cellChurnGauge(
      arrivals: DataFrame,
      storedCells: DataFrame,
      centroids: DataFrame,
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    arrivals.writeStream
      .queryName("graft-cell-churn-gauge")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.operators.Similarity
          .batchCellChurn(batch, storedCells, centroids)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Streaming MMR serving (s12's twin): each micro-batch of query
    * vectors is diversity-ranked against the static index with
    * `Similarity.mmrVsCorpus` — the retrieval endpoint shape (query
    * batch in, k diverse results per query out). foreachBatch because
    * the greedy loop needs per-round materialization, legal only on the
    * per-batch BATCH frame. Per-batch cost: one scoring pass over the
    * index + O(batch · poolK²) re-ranking. */
  def mmrVsIndex(
      queries: DataFrame,
      index: DataFrame,
      sink: DataFrame => Unit,
      k: Int = 5,
      poolK: Int = 20,
      lambda: Double = 0.7): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .queryName("graft-mmr-vs-index")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Similarity.mmrVsCorpus(
          batch, index, k, poolK, lambda))
        ()
      }
      .start()
}
