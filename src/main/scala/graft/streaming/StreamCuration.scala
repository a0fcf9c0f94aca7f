package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming curation governance — ingest-time twins of the batch
  * acceptance gates, run per micro-batch against a static ACCEPTED
  * snapshot (nightly-rebuilt in practice, same contract as
  * [[StreamDedup]]'s index side).
  *
  * foreachBatch, not a stream-static aggregate: the drift comparison is a
  * full-outer join + roll-up over the batch's bucket table — legal on the
  * per-batch BATCH frame, illegal mid-stream — and each batch's verdict
  * is a complete, immediately actionable row set (gate the batch, page
  * the on-call) rather than a running aggregate.
  */
object StreamCuration {

  /** Per-micro-batch quality drift vs the accepted corpus (the c20 gate,
    * streaming form): every batch is scored, bucketed, and compared to
    * the accepted snapshot's distribution by total variation distance;
    * the sink receives one row per source present in the batch, tagged
    * with the batch id. Per-batch cost is the batch's score pass plus a
    * ≤10·sources-row join — the accepted side's bucket table is tiny and
    * recomputed from the snapshot frame each batch (persist the snapshot
    * upstream if it is not already a lake scan). */
  def driftVsAccepted(
      docs: DataFrame,
      accepted: DataFrame,
      sink: DataFrame => Unit,
      driftBar: Double = 0.1): StreamingQuery =
    docs.writeStream
      .queryName("graft-quality-drift")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.operators.Curation.qualityDrift(accepted, batch, driftBar)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Per-micro-batch vocabulary divergence vs the full stream-so-far
    * baseline is not well-defined; what an ingest wants is each batch's
    * KL against the ACCEPTED corpus vocabulary (the x23 gauge, streaming
    * form). The accepted side's (token → count) table dominates the cost,
    * so the caller passes it PRECOMPUTED (one `LlmText.sourceDivergence`-
    * style aggregate at snapshot-build time, stored as a lake table);
    * each batch then pays only its own token explode + a join against
    * that table. Emits (source, n_tokens, n_types, kl_nats, batch_id). */
  def divergenceVsAccepted(
      docs: DataFrame,
      acceptedTokenCounts: DataFrame,
      sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .queryName("graft-source-divergence")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchDivergence(batch, acceptedTokenCounts)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Per-micro-batch LM quality scoring against STORED reference counts
    * (x37's serve path): each arriving doc's average bigram log-prob
    * under the add-1-smoothed LM whose count tables were built once at
    * snapshot time (`refBigramCounts` (bigram, cb), `refContextCounts`
    * (w1, cw) — lake tables, the [[graft.operators.Graph.LabelIndex]]
    * staleness contract). The ingest gate thresholds this score to
    * reject gibberish before it spends tokenizer budget; per-batch cost
    * is the batch's bigram explode + two joins against the stored
    * vocabulary-sized tables. Emits (doc_id, n_bigrams, avg_logprob,
    * batch_id). */
  def lmScoreVsRef(
      docs: DataFrame,
      refBigramCounts: DataFrame,
      refContextCounts: DataFrame,
      sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .queryName("graft-lm-score")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchLmScore(batch, refBigramCounts, refContextCounts)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Batch twin of [[lmScoreVsRef]]'s per-batch body — the exact x37
    * scoring arithmetic ([[graft.operators.LlmLm.scoreBigramsVsRef]]),
    * so the stream cannot drift from the batch gauge. */
  def batchLmScore(batch: DataFrame, refBigramCounts: DataFrame,
      refContextCounts: DataFrame): DataFrame =
    graft.operators.LlmLm.scoreBigramsVsRef(
      graft.operators.LlmLm.docBigrams(batch),
      refBigramCounts, refContextCounts)

  /** Batch twin of [[divergenceVsAccepted]]'s per-batch body, exposed so
    * the spec pins stream output == batch output on the same frames:
    * KL(batch-source ‖ accepted) using the x23 decimal-grid recipe, with
    * the accepted distribution coming from the precomputed counts table
    * `(tok, cw)` (cn = Σcw). Tokens the accepted corpus has never seen
    * carry no defined likelihood ratio — they are counted separately as
    * `n_oov_tokens` (an ingest red flag on its own) and excluded from the
    * KL sum, the same carve-out DSIR's hashed likelihoods make. */
  def batchDivergence(batch: DataFrame,
      acceptedTokenCounts: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def l(c: org.apache.spark.sql.Column) =
      round(log(c.cast("double")), 5).cast(DecimalType(18, 6))
    val toks = batch.select(col("source"),
      explode(graft.operators.LlmText.words(col("text"))).as("tok"))
    val sw = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("csw"))
    val cn = acceptedTokenCounts.agg(sum(col("cw")).as("cn"))
    sw.join(acceptedTokenCounts, Seq("tok"), "left")
      .select(col("source"), col("csw"), col("cw"),
        when(col("cw").isNotNull,
          col("csw") * (l(col("csw")) - l(col("cw"))))
          .otherwise(lit(null)).as("term"))
      .groupBy(col("source"))
      .agg(
        sum(col("csw")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cw").isNull, col("csw")).otherwise(0L))
          .as("n_oov_tokens"),
        sum(when(col("cw").isNotNull, col("csw")).otherwise(0L))
          .as("n_known"),
        sum(col("term")).as("term_sum"))
      .crossJoin(broadcast(cn))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_oov_tokens"),
        (col("term_sum").cast("double") / col("n_known")
          - l(col("n_known")).cast("double")
          + l(col("cn")).cast("double")).as("kl_nats"))
  }

  /** Per-micro-batch tokenizer-fertility gate: each batch is tokenized
    * against the TRAINED dictionary ([[graft.operators.LlmBpe.bpeDictionary]],
    * a stored lake table — never retrained here) and its corpus-level
    * chars-per-token is compared to the training baseline. Rising
    * fertility (more tokens per character budget) is the canonical signal
    * that incoming data has drifted off the tokenizer's training
    * distribution — new languages, markup, encodings — and it shows up
    * here BEFORE it shows up as a training-loss anomaly. OOV words
    * (absent from the dictionary) drop out of the broadcast join and are
    * counted separately; a rising `n_oov_words` is the same drift signal
    * at word granularity. Emits one row per batch:
    * (n_docs, n_words, n_oov_words, n_tokens, chars_per_token, drifted,
    * batch_id). */
  def fertilityVsDict(
      docs: DataFrame,
      dict: DataFrame,
      baselineCharsPerToken: Double,
      sink: DataFrame => Unit,
      driftFrac: Double = 0.2): StreamingQuery =
    docs.writeStream
      .queryName("graft-tokenizer-fertility")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchFertility(batch, dict, baselineCharsPerToken, driftFrac)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Batch twin of [[fertilityVsDict]]'s per-batch body, exposed so the
    * spec pins stream output == batch output on the same frames. */
  def batchFertility(batch: DataFrame, dict: DataFrame,
      baselineCharsPerToken: Double, driftFrac: Double = 0.2): DataFrame = {
    import graft.operators.LlmText
    val tokAgg = batch
      .select(explode(LlmText.words(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(dict), Seq("w"), "left_outer")
      .agg(
        count(lit(1)).as("n_words"),
        // coalesced like n_tokens: a zero-word batch sums to NULL, and
        // the row contract is all-long
        coalesce(sum(when(col("ntok").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_oov_words"),
        coalesce(sum(col("ntok")), lit(0L)).as("n_tokens"))
    val docAgg = batch.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("n_chars")), lit(0L)).as("chars_total"))
    docAgg.crossJoin(tokAgg)
      // a batch whose every word is OOV has zero in-dictionary tokens:
      // chars_per_token is null (ANSI-safe) and the gate trips outright
      .select(col("n_docs"), col("n_words"), col("n_oov_words"),
        col("n_tokens"),
        when(col("n_tokens") > 0,
          col("chars_total").cast("double") / col("n_tokens"))
          .as("chars_per_token"))
      .withColumn("drifted",
        // a batch with no words at all has nothing to gate; a batch whose
        // words are ALL OOV trips outright
        col("n_words") > 0 && (col("n_tokens") === 0 ||
          abs(col("chars_per_token") - lit(baselineCharsPerToken)) >
            lit(driftFrac) * lit(baselineCharsPerToken)))
  }

  /** Per-micro-batch embedding centroid drift vs the accepted snapshot
    * (the e15 gate, streaming form): every arriving vector batch's
    * per-label centroids score against the accepted corpus's — the
    * ingest-time alarm for a silently swapped embedding-model version.
    * Same foreachBatch posture as [[driftVsAccepted]]; the accepted side's
    * centroid aggregate recomputes from the snapshot frame each batch
    * (persist or pre-aggregate it upstream for hot loops). */
  def embeddingDriftVsAccepted(
      vecs: DataFrame,
      accepted: DataFrame,
      sink: DataFrame => Unit,
      cosBar: Double = 0.95): StreamingQuery =
    vecs.writeStream
      .queryName("graft-embedding-drift")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.operators.VectorOps
          .centroidDrift(accepted, batch, cosBar)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Streaming weighted reservoir (c23's streaming twin): maintain the k
    * smallest Efraimidis–Spirakis keys across micro-batches — the A-ES
    * key is a pure deterministic function of (doc_id, weight), so
    * "union the stored reservoir with the batch's own top-k and re-take
    * the k smallest" is EXACTLY the batch operator applied to the whole
    * stream-so-far; A-ES is precisely the weighted-reservoir algorithm
    * and the spec pins stream-final == batch-twin equality.
    *
    * State is the reservoir itself — k rows, read from and rewritten to
    * `reservoirDir` each batch through the driver (bounded state, the
    * [[graft.operators.Relational.equiDepthHistogram]] contract): no
    * unbounded stream-side state store, restart-safe because the lake
    * table IS the state. Per-batch cost: the batch's scan + its own
    * TakeOrdered(k) + a 2k-row driver merge. */
  def weightedReservoir(
      docs: DataFrame,
      reservoirDir: String,
      k: Int = 100,
      sink: DataFrame => Unit = _ => ()): StreamingQuery =
    docs.writeStream
      .queryName("graft-weighted-reservoir")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val batchTop = graft.operators.Curation.weightedSample(batch, k)
        val prev =
          try spark.read.parquet(reservoirDir)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](),
              batchTop.schema)
          }
        // k is small by contract — merge on the driver so the overwrite
        // below never reads the files it is replacing.
        // dropDuplicates first: foreachBatch is at-least-once, so a
        // replayed batch re-offers rows already in the stored reservoir;
        // the A-ES key is a pure function of (doc_id, weight), so the
        // replayed copy is row-identical and dedup-by-doc_id restores the
        // exactly-once merge (without it, the duplicate occupies a slot
        // and displaces a distinct doc, breaking the batch-twin identity).
        val merged = prev.unionByName(batchTop)
          .dropDuplicates("doc_id")
          .orderBy(col("skey"), col("doc_id")).limit(k)
          .collect()
        val out = spark.createDataFrame(
          java.util.Arrays.asList(merged: _*), batchTop.schema)
        out.coalesce(1).write.mode("overwrite").parquet(reservoirDir)
        sink(out.withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()
}
