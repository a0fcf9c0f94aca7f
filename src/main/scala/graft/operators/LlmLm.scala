package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring over the documents table — the x17/x37
  * family, split out of LlmText.scala in round 12 to keep every main
  * file under 1,500 lines (zero behavior change; bodies byte-identical).
  * Shares [[LlmText.words]]' whitespace tokenization so LM counts and
  * token stats cannot drift apart. */
object LlmLm {


  def bigramLm(documents: DataFrame): DataFrame = {
    val ws = LlmText.words(col("text"))
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (x, y) => concat(x, lit(" "), y))
    val docBi = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(size(ws) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bigram"))
    Caching.withPersisted(docBi) {
      val biCnt = docBi.groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
      val ctxCnt = docBi
        .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
        .agg(count(lit(1)).as("cw"))
      val vocab = ctxCnt.agg(count(lit(1)).as("vsz"))
      val lp = round(
        log((col("cb") + lit(1.0)) / (col("cw") + col("vsz")).cast("double")),
        5).cast(org.apache.spark.sql.types.DecimalType(18, 6))
      docBi
        .join(biCnt, Seq("bigram"))
        .withColumn("w1", substring_index(col("bigram"), " ", 1))
        .join(ctxCnt, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(lp).as("lp_sum"))
        .select(col("doc_id"), col("n_bigrams"),
          (col("lp_sum").cast("double") / col("n_bigrams"))
            .as("avg_logprob"))
    }
  }

  /** Held-out-reference LM scoring (x37): every document's average bigram
    * log-probability under an add-1-smoothed LM trained ONLY on the
    * reference split (`doc_id % refMod != 0`) — the CCNet-style quality
    * filter next to x17's self-trained gauge: x17 says "how typical is
    * this doc of THIS corpus", this says "how plausible is it under a
    * CLEAN reference model", which is the score a crawl-filtering
    * pipeline actually thresholds (docs the reference LM finds
    * improbable are gibberish, boilerplate, or off-distribution).
    * Unseen events stay inside the smoothing: an unseen bigram scores
    * ln(1/(cw+V)), an unseen CONTEXT word ln(1/V) — both finite, no
    * NULL poison (left joins coalesce to 0 before the arithmetic).
    * Same engine-exact recipe as x17: per-event ln rounded to 5 dp as
    * DECIMAL(18,6), summed exactly, one double division at the end.
    *
    * Scale shape: counts are vocabulary-sized aggregates off one
    * persisted bigram explode; scoring is two equi-joins against them
    * (broadcast-able at any corpus size — vocabularies grow sublinearly)
    * plus the 1-row vocab scalar. Nothing scales beyond the explode. */
  def bigramLmVsRef(documents: DataFrame, refMod: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ws = LlmText.words(col("text"))
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (x, y) => concat(x, lit(" "), y))
    val docBi = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(size(ws) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bigram"))
    Caching.withPersisted(docBi) {
      val ref = docBi.filter(col("doc_id") % refMod =!= 0)
      val biCnt = ref.groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
      val ctxCnt = ref
        .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
        .agg(count(lit(1)).as("cw"))
      scoreBigramsVsRef(docBi, biCnt, ctxCnt)
        .select(col("doc_id"),
          (col("doc_id") % refMod =!= 0).as("in_ref"),
          col("n_bigrams"), col("avg_logprob"))
    }
  }

  /** The x37 scoring body over PRECOMPUTED reference LM tables — shared
    * with the per-batch streaming serve path
    * ([[graft.streaming.StreamCuration.lmScoreVsRef]]) so stream and
    * batch cannot drift: `docBi` is (doc_id, bigram) exploded rows,
    * `refBigramCounts` (bigram, cb), `refContextCounts` (w1, cw) —
    * at snapshot-build time these are lake tables. Returns (doc_id,
    * n_bigrams, avg_logprob). */
  private[graft] def scoreBigramsVsRef(docBi: DataFrame,
      refBigramCounts: DataFrame,
      refContextCounts: DataFrame): DataFrame =
    scoreBigramSums(docBi, refBigramCounts, refContextCounts)
      .select(col("doc_id"), col("n_bigrams"),
        (col("lp_sum").cast("double") / col("n_bigrams"))
          .as("avg_logprob"))

  /** The x37 per-doc score table BEFORE the final division — lp_sum
    * stays DECIMAL so [[lmScoreBySource]] can pool docs exactly (summing
    * per-doc AVERAGES would weight a 3-bigram doc like a 3,000-bigram
    * one; pooling the exact sums is the corpus-level perplexity). */
  private def scoreBigramSums(docBi: DataFrame,
      refBigramCounts: DataFrame,
      refContextCounts: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val vocab = refContextCounts.agg(count(lit(1)).as("vsz"))
    val lp = round(
      log((coalesce(col("cb"), lit(0L)) + lit(1.0)) /
        (coalesce(col("cw"), lit(0L)) + col("vsz")).cast("double")),
      5).cast(DecimalType(18, 6))
    docBi
      .join(refBigramCounts, Seq("bigram"), "left_outer")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(refContextCounts, Seq("w1"), "left_outer")
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(lp).as("lp_sum"))
  }

  /** Reference-LM score rolled up per source (x39): each source's doc
    * count, bigram mass, and POOLED average log-probability under the
    * x37 held-out reference model — the per-feed quality dial next to
    * x23's vocabulary divergence: a source whose pooled logprob sits
    * well below the rest is off-distribution wholesale (machine
    * translation, boilerplate farms, wrong language), and the mix
    * weights (c2/c10) read this before admitting it. Pooled, not
    * mean-of-means: the per-doc DECIMAL sums are summed exactly and
    * divided once, so big docs weigh their size. Same scale shape as
    * x37 plus one doc-keyed join to the documents table for the source
    * column and a #sources-cardinality aggregate. */
  def lmScoreBySource(documents: DataFrame, refMod: Int = 10): DataFrame = {
    val ws = LlmText.words(col("text"))
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (x, y) => concat(x, lit(" "), y))
    val docBi = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(size(ws) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bigram"))
    Caching.withPersisted(docBi) {
      val ref = docBi.filter(col("doc_id") % refMod =!= 0)
      val biCnt = ref.groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
      val ctxCnt = ref
        .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
        .agg(count(lit(1)).as("cw"))
      scoreBigramSums(docBi, biCnt, ctxCnt)
        .join(documents.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("n_bigrams"),
          (sum(col("lp_sum")).cast("double") /
            sum(col("n_bigrams")).cast("double")).as("avg_logprob"))
    }
  }

  /** The (doc_id, bigram) explode [[scoreBigramsVsRef]] consumes —
    * exposed so streaming batches build the identical rows. */
  private[graft] def docBigrams(documents: DataFrame): DataFrame = {
    val ws = LlmText.words(col("text"))
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (x, y) => concat(x, lit(" "), y))
    documents
      .filter(size(ws) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bigram"))
  }
}
