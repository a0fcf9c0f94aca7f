package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-curation operators for assembling a training corpus: deterministic
  * stratified sampling, domain mixing to a target distribution, and a
  * leakage-safe train/val/test split.
  *
  * All sampling decisions are pure functions of stable row identity (md5 of
  * the document id) — never `rand()` — so a 100 TB job is reproducible across
  * retries, speculative tasks, and re-partitioning, and the DuckDB oracle can
  * replay every decision bit-exactly. Each operator is a narrow projection
  * plus at most one tiny aggregate that broadcasts back; nothing here
  * shuffles the corpus itself.
  */
object Curation {

  /** 28-bit sampling hash ([[PortableHash.hash28]]): uniform enough for
    * percentage gates and independent across prefixes, so composed
    * sampling stages (sample → mix → split) never correlate. */
  private def hash28(prefix: String, v: Column): Column =
    PortableHash.hash28(prefix, v)

  /** Stratified sample (c1): keep `pct(lang)` percent of each language
    * stratum (default `defaultPct` for unlisted strata), gating on a
    * deterministic per-document hash bucket. A pure filter — no shuffle, no
    * driver state — so it runs at input-scan speed on any corpus size. */
  def stratifiedSample(documents: DataFrame,
      pct: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = pct.foldLeft(lit(defaultPct)) { case (acc, (lang, p)) =>
      when(col("lang") === lang, p).otherwise(acc)
    }
    // gate hash projected once, filtered as a column reference — Catalyst
    // has no cross-operator CSE, so filter(hash)+select(hash) would run
    // the md5 fold twice per row
    documents
      .withColumn("bucket", pmod(hash28("smp:", col("doc_id")), lit(100)))
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
  }

  /** Domain mixing (c2): re-balance the corpus so every domain (default:
    * language) contributes equally — each domain is down-sampled to
    * (approximately) the size of the smallest one, the standard move when one
    * crawl or language dominates the mix.
    *
    * Plan shape at 100 TB: per-domain counts are one map-side-combined
    * aggregate whose output is #domains rows; the acceptance-rate table
    * broadcasts back onto the corpus and the keep decision is a narrow
    * filter. The corpus is never shuffled. Rates use integer
    * per-ten-thousand arithmetic (`min_n·10⁴ div n_domain`) so both engines
    * floor identically with no float in the gate. */
  def domainMix(documents: DataFrame, domain: String = "lang"): DataFrame = {
    // NULL domains (unlabeled crawl docs) form their own stratum via a
    // sentinel key — an equi-join on the raw column would silently drop
    // every NULL-domain row, deleting data instead of mixing it
    val dkey = coalesce(col(domain).cast("string"), lit("\u0000null"))
    val keyed = documents.withColumn("mix_domain", dkey)
    val counts = keyed.groupBy(col("mix_domain"))
      .agg(count(lit(1)).as("n_total"))
    val minN = counts.agg(min(col("n_total")).as("min_n"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("mix_domain"),
        expr("min_n * 10000 DIV n_total").as("keep_per_10k"))
    keyed
      // the gate hash is projected BEFORE the join: a filter referencing
      // both sides becomes the join condition, where the md5 chain would
      // re-evaluate once per hex char (no CSE outside Project codegen)
      .withColumn("mix_bucket", pmod(hash28("mix:", col("doc_id")), lit(10000)))
      .join(broadcast(rates), Seq("mix_domain"))
      .filter(col("mix_bucket") < col("keep_per_10k"))
      .select(col("doc_id"), col("source"), col("lang"))
  }

  /** Sequence packing (c4): concat-and-chunk documents into fixed
    * token-budget training sequences — each document is placed at the
    * running token offset of its shard and belongs to the pack where it
    * starts, the GPT-style "concatenate everything, cut every B tokens"
    * layout.
    *
    * The corpus is first split into `shards` deterministic hash shards and
    * packed independently within each — a single global running sum would
    * serialize 100 TB through one window partition, while per-shard packing
    * runs `shards`-wide and is exactly how per-worker packing behaves on a
    * real cluster. Integer token counts, BIGINT running sum, integer
    * div/mod — bit-stable across engines. */
  def packSequences(documents: DataFrame,
      budget: Int = 512, shards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"),
        size(LlmText.words(col("text"))).cast("long").as("n_tokens"),
        pmod(hash28("pk:", col("doc_id")), lit(shards)).as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"(cum - n_tokens) DIV $budget").as("pack_id"),
        pmod(col("cum") - col("n_tokens"), lit(budget)).as("start_offset"))
  }

  /** Similarity-ordered sequence packing (c21): [[packSequences]] with
    * documents ordered by their embedding CLUSTER inside each shard, so
    * semantically related documents land in the same training sequence —
    * the in-context-pretraining recipe (packing related docs teaches
    * long-range use of context; random packing wastes it). The cluster
    * column here is the embeddings' label (the corpus' semantic cell
    * stand-in); production swaps in an IVF cell id from
    * [[Similarity.annIvf]]'s quantizer — any int column, same plan.
    *
    * Same scale shape as c4: hash-sharded, one cumulative window per
    * shard; the only addition is the doc↔vector equi-join (co-keyed,
    * one shuffle). Docs without a vector are excluded by the inner join
    * — the caller routes them through plain [[packSequences]]. */
  def packBySimilarity(documents: DataFrame, embeddings: DataFrame,
      budget: Int = 512, shards: Int = 32): DataFrame = {
    val cells = embeddings.select(col("vec_id").as("doc_id"),
      col("label").cast("long").as("cell"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("cell"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"),
        size(LlmText.words(col("text"))).cast("long").as("n_tokens"),
        pmod(hash28("pk:", col("doc_id")), lit(shards)).as("shard"))
      .join(cells, Seq("doc_id"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("cell"), col("n_tokens"),
        expr(s"(cum - n_tokens) DIV $budget").as("pack_id"),
        pmod(col("cum") - col("n_tokens"), lit(budget)).as("start_offset"))
  }

  /** Materialized training sequences (c8): the text of each [[packSequences]]
    * pack, concatenated in doc order — the step that turns pack assignments
    * into the actual pretraining batches.
    *
    * The per-pack collect_list is bounded by the token budget (a pack holds
    * at most ~budget tokens of text), so groups stay small no matter the
    * corpus size; the join back to text and the pack grouping are the one
    * unavoidable full-corpus shuffle of a packing job. Sorting the
    * collected (doc_id, text) structs makes concatenation order
    * deterministic under any partitioning. */
  def materializePacks(documents: DataFrame,
      budget: Int = 512, shards: Int = 32): DataFrame = {
    val packed = packSequences(documents, budget, shards)
    documents.select(col("doc_id"), col("text"))
      .join(packed, Seq("doc_id"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            p => p.getField("text")), " ").as("pack_text"))
  }

  /** End-to-end curation pipeline (c5): the composition a training-data
    * job actually runs — quality gate, repetition gate, near-dup drop,
    * per-language corpus accounting — expressed so the expensive parts
    * stay cheap at 100 TB:
    *
    *  - quality + repetition are inline narrow filters (the same expression
    *    trees x3/x8 verify), NOT semi-joins against O(corpus) keep-lists —
    *    they run at scan speed and Catalyst folds them into one predicate;
    *  - the near-dup drop list is O(duplicates) and applied with the d8
    *    anti-join shape;
    *  - the final per-language aggregate is a handful of groups with
    *    map-side combine. */
  def curationPipeline(documents: DataFrame): DataFrame = {
    val drops = Dedup.nearDupComponents(documents)
      .filter(!col("keep")).select(col("doc_id"))
    documents
      .filter(LlmText.qualityScoreExpr(col("text")) >= 0.5)
      .filter(!LlmText.isRepetitiveExpr(col("text")))
      .join(drops, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** Curation-gate funnel (c29): cumulative survivor counts and char
    * mass through c5's gate chain — all docs → quality ≥ 0.5 → AND not
    * repetitive → AND near-dup keeper — the accounting table that says
    * WHICH gate is doing the cutting (a funnel that collapses at the
    * quality stage needs threshold work; one that collapses at dedup
    * needs a syndication look), read before c5's per-language survivor
    * summary. ONE corpus pass: per-doc gate flags, one constant-group
    * conditional aggregate (empty in → empty out), and a 4-arm explode
    * over the materialized 1-row result — the arms read checkpoint
    * blocks, never recompute the pass. */
  def gateFunnel(documents: DataFrame): DataFrame = {
    val drops = Dedup.nearDupComponents(documents)
      .filter(!col("keep"))
      .select(col("doc_id"), lit(true).as("dropped"))
    val flags = documents
      .select(col("doc_id"), col("n_chars"),
        (LlmText.qualityScoreExpr(col("text")) >= 0.5).as("q"),
        (!LlmText.isRepetitiveExpr(col("text"))).as("r"))
      .join(drops, Seq("doc_id"), "left_outer")
      .select(col("n_chars"), col("q"), col("r"),
        col("dropped").isNull.as("kd"))
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    def chars(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, col("n_chars"))), lit(0L))
    val agg = Caching.materialize(flags
      .groupBy(lit(true).as("all"))
      .agg(count(lit(1)).as("n0"),
        coalesce(sum(col("n_chars")), lit(0L)).as("c0"),
        cnt(col("q")).as("n1"), chars(col("q")).as("c1"),
        cnt(col("q") && col("r")).as("n2"),
        chars(col("q") && col("r")).as("c2"),
        cnt(col("q") && col("r") && col("kd")).as("n3"),
        chars(col("q") && col("r") && col("kd")).as("c3")))
    def arm(stage: Int, gate: String, n: String, c: String) =
      struct(lit(stage).as("stage"), lit(gate).as("gate"),
        col(n).as("n_docs"), col(c).as("total_chars"))
    agg.select(explode(array(
        arm(1, "all", "n0", "c0"),
        arm(2, "quality", "n1", "c1"),
        arm(3, "quality+repetition", "n2", "c2"),
        arm(4, "quality+repetition+dedup", "n3", "c3"))).as("s"))
      .select(col("s.stage").as("stage"), col("s.gate").as("gate"),
        col("s.n_docs").as("n_docs"),
        col("s.total_chars").as("total_chars"))
  }

  /** Deterministic per-group sample (c7): the k documents with the
    * smallest sampling hash per group — the distributed, re-runnable
    * analog of per-group reservoir sampling (a uniform hash order is a
    * uniform random order, but stable across retries and partitionings).
    * Runs on the heap-based [[graft.plans.TopK.perKey]] operator:
    * O(k) state per group per partition with map-side pre-reduction, no
    * full sort, no per-group shuffle of losers. */
  /** Dedup-aware token budget (c30): per source, document and TOKEN
    * counts before and after the near-dup keeper decision — the number
    * a training-mix plan actually budgets with (c11 counts raw tokens;
    * epochs are scheduled over the DEDUPED corpus, and a source that
    * loses half its tokens to duplication contributes half the
    * training signal its raw size suggests). Composes the d-family's
    * component decisions with the c-family's budget view through the
    * same precomputed-components overload d8b/d16 use, so one LSH+CC
    * pass feeds dedup, accounting, AND the budget. Docs outside every
    * near-dup pair keep by default (the dedupApply contract). One left
    * join + a map-side-combined per-source fold; integers until the
    * final fraction. */
  def dedupTokenBudget(documents: DataFrame,
      components: DataFrame): DataFrame = {
    val keep = components.select(col("doc_id"), col("keep"))
    documents.join(keep, Seq("doc_id"), "left_outer")
      .select(col("source"), coalesce(col("keep"), lit(true)).as("k"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("k"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("tok")).as("n_tokens"),
        sum(when(col("k"), col("tok")).otherwise(0L)).as("n_tokens_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("n_tokens"), col("n_tokens_kept"),
        (col("n_tokens_kept").cast("double") /
          col("n_tokens").cast("double")).as("token_frac"))
  }

  def groupSample(documents: DataFrame, k: Int = 10,
      by: String = "lang"): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    graft.plans.TopK.perKey(
      documents.select(col("doc_id"), col(by),
        pmod(hash28("gs:", col("doc_id")), lit(1000000)).as("h")),
      Seq(col(by)), Seq(col("h"), col("doc_id")), k)
  }

  /** Eval-set decontamination (c6): count, per corpus document, the
    * distinct word-3-gram shingles it shares with ANY document of the
    * benchmark set, and flag docs at or above `minShared` — the standard
    * guard against training on eval data.
    *
    * Plan shape at 100 TB: the benchmark side (eval suites — thousands of
    * docs) collapses to a distinct shingle set that BROADCASTS; the corpus
    * side is a narrow explode into that broadcast hash join, so only
    * matching shingles ever reach the per-doc count shuffle, which is
    * O(contaminated overlap), not O(corpus). The overlap counts then join
    * back to the corpus on doc_id where AQE broadcasts the small side. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      minShared: Int = 3): DataFrame = {
    val bsh = benchmark
      .select(explode(LlmText.shingles(col("text"))).as("sh"))
      .distinct()
    val overlap = corpus
      .select(col("doc_id"), explode(LlmText.shingles(col("text"))).as("sh"))
      .join(broadcast(bsh), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared"))
    corpus.select(col("doc_id"), col("source"))
      .join(overlap, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"),
        coalesce(col("shared"), lit(0L)).as("n_shared"),
        (coalesce(col("shared"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** Per-source contamination report (c26): [[decontaminate]]'s per-doc
    * verdicts rolled up to the governance table a release review reads —
    * doc count, contaminated count, and the rate per source. The number
    * that says WHICH feed is leaking the eval set (one scraped mirror of
    * a benchmark site shows up as a single hot source, not a uniform
    * haze), and therefore where the ingest fix goes. Aggregation is free
    * on top of the c6 pass. */
  /** Quality-vs-duplication calibration (c27): the x3 quality score
    * bucketed into deciles, with each bucket's exact-duplicate rate
    * (d1's keeper rule: a doc is a dup when it is not its content
    * hash's min-id keeper) — the cross-family sanity check behind
    * quality-weighted dedup policies: if low-quality buckets carry most
    * of the duplication (boilerplate IS low-quality and viral), dedup
    * first and the quality filter's job shrinks; a flat profile means
    * the two gates are independent and both must run. Bucket = floor
    * (score·10 + 1e-9) (the c22 boundary nudge); integer counts, one
    * final division. */
  def qualityDupCalibration(documents: DataFrame): DataFrame = {
    val q = LlmText.qualityScore(documents)
      .select(col("doc_id"), col("quality_score"))
    val h = documents.select(col("doc_id"), md5(col("text")).as("h"))
    val keep = h.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    val fl = h.join(keep, "h")
      .select(col("doc_id"), (col("doc_id") =!= col("keeper")).as("is_dup"))
    q.join(fl, "doc_id")
      .groupBy(floor(col("quality_score") * 10 + lit(1.0e-9))
        .cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"))
      .select(col("bucket"), col("n_docs"), col("n_dups"),
        (col("n_dups").cast("double") / col("n_docs")).as("dup_rate"))
  }

  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      minShared: Int = 3): DataFrame =
    decontaminate(corpus, benchmark, minShared)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("contaminated"), 1L).otherwise(0L))
          .as("n_contaminated"))
      .select(col("source"), col("n_docs"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_docs"))
          .as("contamination_rate"))

  /** Bloom-prefiltered decontamination (c15): same contract as
    * [[decontaminate]], different 100 TB posture. c6 broadcasts the
    * benchmark's distinct shingle ROWS — right while the suite fits the
    * broadcast threshold, impossible when the held-out set is itself
    * corpus-sized (e.g. decontaminating one crawl snapshot against
    * another). Here only a ~MB Bloom sketch of the shingle fingerprints
    * ships — as a broadcast variable ([[graft.functions.BloomProbeBc]]),
    * once per executor, not per task binary; corpus shingles are pruned at scan
    * parallelism BEFORE any shuffle, and the exact equi-join over the few
    * survivors removes the false positives — results are identical to c6
    * (the oracle is the same plain-join SQL). */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      minShared: Int = 3): DataFrame = {
    val bsh = benchmark
      .select(explode(LlmText.shingles(col("text"))).as("bsh"))
      .distinct()
    val overlap = Relational.bloomPrefilteredJoin(
        corpus.select(col("doc_id"),
          explode(LlmText.shingles(col("text"))).as("sh")),
        bsh, "sh", "bsh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared"))
    corpus.select(col("doc_id"), col("source"))
      .join(overlap, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"),
        coalesce(col("shared"), lit(0L)).as("n_shared"),
        (coalesce(col("shared"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** Deterministic global shuffle + shard assignment (c16): the export step
    * of a training pipeline — every document gets a pseudorandom shard and a
    * pseudorandom within-shard sort key, both pure functions of its id, so
    * the "shuffled" training order is reproducible run-over-run and
    * resumable mid-export (no rand(), no zipWithIndex, no driver state).
    * Independent hash prefixes keep shard choice and ordering uncorrelated
    * with each other and with the sampling gates (c1/c3).
    *
    * This is the 100 TB answer to "shuffle the corpus": a global sort by
    * random key would be one giant range-exchange; hash-assigning shard and
    * order is a narrow projection, and [[writeShuffledShards]] turns it
    * into files with one range-partitioned exchange whose keys are already
    * uniform (no skew by construction). */
  def shuffleShard(documents: DataFrame, shards: Int = 8): DataFrame =
    documents.select(col("doc_id"),
      pmod(hash28("shard:", col("doc_id")), lit(shards)).as("shard"),
      hash28("ord:", col("doc_id")).as("sort_key"))

  /** Physical form of [[shuffleShard]]: materialize the corpus as
    * `shard=N/` parquet directories, each file sorted by the shuffle key.
    * Range-partitioning on (shard, sort_key) makes every shard a contiguous
    * run of output partitions, so a shard's global order is the
    * partition-index order of its files — for ANY partition count, which is
    * why write parallelism (`numPartitions`, default the session's
    * parallelism) is decoupled from the shard count: 8 shards of a 100 TB
    * corpus must not mean 8 writer tasks. Uniform hash keys mean the range
    * exchange cannot skew. */
  def writeShuffledShards(documents: DataFrame, path: String,
      shards: Int = 8, numPartitions: Int = 0): Unit = {
    val parts =
      if (numPartitions > 0) numPartitions
      else documents.sparkSession.sparkContext.defaultParallelism
    documents
      .withColumn("shard", pmod(hash28("shard:", col("doc_id")), lit(shards)))
      .withColumn("sort_key", hash28("ord:", col("doc_id")))
      .repartitionByRange(math.max(parts, shards),
        col("shard"), col("sort_key"))
      .sortWithinPartitions(col("shard"), col("sort_key"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Leakage-safe train/val/test split (c3): every document is assigned a
    * split by hashing its near-dup cluster representative (its own id when
    * it has no near-dups), so near-duplicate documents can never straddle
    * the train/test boundary — the contamination mode a naive per-document
    * split is blind to.
    *
    * The component labels come from [[Dedup.nearDupComponents]] (MinHash+LSH
    * pair graph → min-label propagation); that frame is O(near-dup docs),
    * tiny next to the corpus, so the label join is broadcast-shaped and the
    * split itself is a narrow projection. */
  def leakageSafeSplit(documents: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    leakageSafeSplit(documents, Dedup.nearDupComponents(documents),
      trainPct, valPct)

  /** [[leakageSafeSplit]] over PRECOMPUTED components — share one
    * LSH+components pass across split, dedup, and accounting consumers. */
  def leakageSafeSplit(documents: DataFrame, components: DataFrame,
      trainPct: Int, valPct: Int): DataFrame = {
    val comp = components.select(col("doc_id"), col("cluster_rep"))
    documents
      .join(comp, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("doc_id")).as("rep"))
      // split hash projected once (the CaseWhen would evaluate it per arm)
      .withColumn("h", pmod(hash28("sp:", col("rep")), lit(100)))
      .select(col("doc_id"), col("rep"),
        when(col("h") < trainPct, "train")
          .when(col("h") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
  }

  /** Sliding-window chunking with overlap (c9): cut each document into
    * `chunk`-token windows every `stride` tokens (overlap = chunk − stride)
    * — the RAG/embedding-prep operator that turns documents into unit-sized
    * passages without losing cross-boundary context.
    *
    * The token array is materialized ONCE per document before the explode
    * (slicing from inside a post-explode lambda would re-run the split once
    * per chunk), then every chunk is a narrow slice — no shuffle at all, so
    * the operator runs at scan speed on any corpus size. */
  def chunkOverlap(documents: DataFrame,
      chunk: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && chunk >= stride,
      s"need 0 < stride <= chunk, got chunk=$chunk stride=$stride")
    val t = documents
      .select(col("doc_id"), LlmText.words(col("text")).as("w"))
      .transform(Partitioning.spread(_, col("doc_id")))
    val piece = slice(col("w"), col("start"), lit(chunk))
    t.select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")), lit(stride))).as("start"))
      .select(
        col("doc_id"),
        expr(s"CAST((start - 1) DIV $stride AS BIGINT)").as("chunk_id"),
        col("start").cast("long").as("start_token"),
        size(piece).cast("long").as("n_tokens"),
        array_join(piece, " ").as("chunk_text"))
  }

  /** Per-source corpus health report (c13): document counts, exact mean
    * quality and token length, quality-pass rate, and total characters per
    * source — the daily dashboard a data-engineering team watches to catch
    * a crawl going bad. One map-side-combined aggregate over scan-speed
    * expressions (the x3 quality tree inline); means accumulate as
    * DECIMAL(38,6) then divide once, so every cell is bit-stable under any
    * partitioning. */
  def sourceReport(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val q = LlmText.qualityScoreExpr(col("text"))
    val ntok = size(LlmText.words(col("text")))
    documents.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        // quality is an arbitrary double: a direct DECIMAL(38,6) cast hits
        // the engines' differing tie-rounding, so quantize to a 1e-6 grid
        // with round() (away-from-zero in both) BEFORE accumulating — the
        // e1 grid trick
        (sum(round(q * lit(1.0e6)).cast(DecimalType(38, 0))).cast("double")
          / (count(lit(1)) * lit(1.0e6))).as("mean_quality"),
        (sum(ntok.cast(DecimalType(38, 6))).cast("double") / count(lit(1)))
          .as("mean_tokens"),
        count(when(q >= 0.5, 1)).as("n_quality"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("source"), col("n_docs"), col("mean_quality"),
        col("mean_tokens"),
        (col("n_quality").cast("double") / col("n_docs"))
          .as("quality_rate"),
        col("total_chars"))
  }

  /** Quality-proportional sampling (c12): keep each document with
    * probability equal to its quality score — the CCNet-style soft filter
    * that trades a hard threshold for a smooth gradient (borderline docs
    * survive at reduced rate, junk almost never). The decision gate is
    * `hash(doc) mod 10⁴ < ⌊quality·10⁴⌋`: the quality expression is the
    * exact x3 tree and the hash is the shared 28-bit fold, so every
    * decision replays identically across engines, retries, and
    * partitionings. Pure narrow filter — scan speed at any corpus size. */
  def qualitySample(documents: DataFrame): DataFrame =
    documents
      .withColumn("qs", LlmText.qualityScoreExpr(col("text")))
      .withColumn("gate", pmod(hash28("qs:", col("doc_id")), lit(10000)))
      .filter(col("gate") < floor(col("qs") * 10000))
      .select(col("doc_id"), col("lang"), col("qs").as("quality_score"))

  /** Token-budget best-first selection (c11): per domain, keep the
    * highest-quality documents until a token budget fills — "give me the
    * best N tokens of each language", the selection rule when compute (not
    * data) is the binding constraint on a training run. Quality is the
    * exact x3 score expression, so the ranking is bit-stable across
    * engines; ties break on doc_id.
    *
    * Scale note: the running token sum needs a per-domain sort — the one
    * inherent cost of best-first semantics. It parallelizes across domains
    * (each partition sorts independently), and when one domain dominates a
    * 100 TB corpus the practical form pre-filters on a quality threshold
    * from an approx-quantile pass first, then only sorts the shortlist;
    * this operator is that shortlist's exact final step. */
  def tokenBudgetSelect(documents: DataFrame,
      budgetPerDomain: Long = 3000, domain: String = "lang"): DataFrame = {
    val n = size(LlmText.words(col("text"))).cast("long")
    val scored = documents.select(
      col("doc_id"), col(domain).as("domain"), n.as("n_tokens"),
      LlmText.qualityScoreExpr(col("text")).as("q"))
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerDomain)
      .select(col("doc_id"), col("domain"), col("n_tokens"),
        col("q").as("quality_score"), col("cum_tokens"))
  }

  /** Temperature-based domain mixing (c10): up-weight the tail instead of
    * flattening the mix — each domain keeps `sqrt(min_n / n_domain)` of its
    * rows (α = 0.5 temperature re-sampling), the multilingual-corpus
    * compromise between natural proportions (α=1, head domains dominate)
    * and uniform (α=0, [[domainMix]], tail over-repeated).
    *
    * Same 100 TB shape as [[domainMix]]: one tiny aggregate broadcasts
    * rates back, the keep decision is a narrow hash-gate filter, and the
    * corpus is never shuffled. `sqrt` is IEEE-exact (correctly rounded in
    * every implementation, unlike `pow`/`ln`), so the floored per-10k rate
    * is bit-stable across engines. */
  def temperatureMix(documents: DataFrame, domain: String = "lang")
      : DataFrame = {
    val dkey = coalesce(col(domain).cast("string"), lit("\u0000null"))
    val keyed = documents.withColumn("mix_domain", dkey)
    val counts = keyed.groupBy(col("mix_domain"))
      .agg(count(lit(1)).as("n_total"))
    val minN = counts.agg(min(col("n_total")).as("min_n"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("mix_domain"),
        floor(lit(10000.0) *
          sqrt(col("min_n").cast("double") / col("n_total")))
          .as("keep_per_10k"))
    keyed
      .withColumn("mix_bucket",
        pmod(hash28("tmp:", col("doc_id")), lit(10000)))
      .join(broadcast(rates), Seq("mix_domain"))
      .filter(col("mix_bucket") < col("keep_per_10k"))
      .select(col("doc_id"), col("source"), col("lang"))
  }

  /** Temperature mixing over TOKEN mass (c24): [[temperatureMix]]'s
    * α=0.5 flattening with the domain size measured in whitespace tokens
    * instead of documents — the form production mixtures actually use
    * (a domain of few huge documents and one of many tiny ones have the
    * same TRAINING mass only under token accounting). Same deterministic
    * per-doc hash gate, same broadcast rate table; only the size
    * statistic changes. */
  def temperatureMixTokens(documents: DataFrame,
      domain: String = "lang"): DataFrame = {
    val dkey = coalesce(col(domain).cast("string"), lit("\u0000null"))
    val keyed = documents.withColumn("mix_domain", dkey)
    val masses = keyed.groupBy(col("mix_domain"))
      .agg(sum(size(LlmText.words(col("text")))).as("t_total"))
    val minT = masses.agg(min(col("t_total")).as("min_t"))
    val rates = masses.crossJoin(broadcast(minT))
      .select(col("mix_domain"),
        floor(lit(10000.0) *
          sqrt(col("min_t").cast("double") / col("t_total")))
          .as("keep_per_10k"))
    keyed
      .withColumn("mix_bucket",
        pmod(hash28("tmt:", col("doc_id")), lit(10000)))
      .join(broadcast(rates), Seq("mix_domain"))
      .filter(col("mix_bucket") < col("keep_per_10k"))
      .select(col("doc_id"), col("source"), col("lang"))
  }

  /** DSIR-style importance-weighted selection (c17): score every raw-corpus
    * document by how much it reads like a small high-quality `target` set,
    * then keep the top `budget` docs — the hashed-n-gram importance
    * resampling recipe of Xie et al. 2023 ("Data Selection for Language
    * Models via Importance Resampling"), with the bag-of-words features
    * reduced to [[LlmText.featureHash]]'s bucket convention and the Gumbel
    * resampling step replaced by a deterministic top-k so every decision
    * replays bit-exactly (the repo-wide no-`rand()` rule).
    *
    * Model: unigram bag-of-hashed-words with add-one smoothing on both
    * sides. Per bucket b, λ_b = log p_target(b) − log p_raw(b) =
    * log(t_b+1) − log(T+B) − log(r_b+1) + log(R+B); a document's weight is
    * Σ_tokens λ_{bucket(token)}. Each λ_b is rounded to 5 decimals and
    * summed through DECIMAL (the x17 grid trick) so the ranking is
    * independent of partition order and of sub-ulp libm differences
    * between engines.
    *
    * 100 TB shape: the token explode is narrow; both bucket-count tables
    * partial-aggregate map-side before a `buckets`-wide shuffle; the λ
    * table is O(buckets) rows and BROADCASTS, so per-doc scoring is a
    * map-side join + partial-aggregated groupBy(doc_id); selection is
    * `orderBy.limit` = TakeOrderedAndProject (per-partition heaps, no
    * global sort); the selected-id flag join broadcasts a budget-sized
    * list. The corpus is shuffled exactly once, on doc_id. */
  def importanceResample(corpus: DataFrame, target: DataFrame,
      buckets: Int = 64, budget: Int = 100): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def tok(df: DataFrame): DataFrame = df
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), explode(LlmText.words(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(hash28("fh:", col("tok")), lit(buckets)).as("bucket"))
    val corpusTok = tok(corpus)
    Caching.withPersisted(corpusTok) {
      val rawCnt = corpusTok.groupBy(col("bucket")).agg(count(lit(1)).as("rb"))
      val tgtCnt = tok(target).groupBy(col("bucket")).agg(count(lit(1)).as("tb"))
      val totals = rawCnt.agg(sum(col("rb")).as("rt"))
        .crossJoin(tgtCnt.agg(sum(col("tb")).as("tt")))
      val lam = rawCnt.join(tgtCnt, Seq("bucket"), "left")
        .crossJoin(broadcast(totals))
        .select(col("bucket"),
          round(log(coalesce(col("tb"), lit(0L)).cast("double") + lit(1.0))
              - log(col("tt").cast("double") + lit(buckets.toDouble))
              - log(col("rb").cast("double") + lit(1.0))
              + log(col("rt").cast("double") + lit(buckets.toDouble)), 5)
            .cast(DecimalType(18, 6)).as("lam"))
      val weights = corpusTok.join(broadcast(lam), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("lam")).as("wsum"))
      val selected = weights
        .orderBy(col("wsum").desc, col("doc_id")).limit(budget)
        .select(col("doc_id"), lit(true).as("sel"))
      weights.join(broadcast(selected), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          col("wsum").cast("double").as("logratio"),
          coalesce(col("sel"), lit(false)).as("selected"))
    }
  }

  /** UniMax-style language budget allocation (c18): split a total token
    * budget across languages so that no language is repeated more than
    * `maxEpochs` times, and whatever the capped (low-resource) languages
    * cannot absorb is shared uniformly among the uncapped ones — the
    * water-filling recipe of Chung et al. 2023 ("UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual Pretraining").
    *
    * Closed form instead of the paper's loop: with languages sorted by
    * capacity `cap_l = maxEpochs · tokens_l` ascending, the capped set is a
    * prefix, and language i is capped iff
    * `cap_i · (L − i + 1) + Σ_{j<i} cap_j ≤ budget`. One pass of window
    * functions finds the prefix; the water level is
    * `(budget − Σ_capped cap) / (L − K)`. All inputs to the one double
    * division are exact integers, so the allocation is bit-stable across
    * engines with no rounding grid needed.
    *
    * 100 TB shape: the only corpus-wide work is the per-language token
    * count — a narrow projection into a partial-aggregated groupBy whose
    * output is one row per LANGUAGE. Everything after (ranking, prefix
    * sums, the water level) runs on that bounded frame; the single-
    * partition window sort is over at most a few hundred rows no matter
    * the corpus size. */
  /** Epoch materialization (c19): turn the [[unimaxAllocate]] token budget
    * into the actual repeated training set — language l gets
    * `epochs_l = alloc_tokens_l / tokens_l` passes, materialized as one row
    * per (doc, epoch): every doc repeats ⌊epochs⌋ times, and the
    * fractional remainder becomes one extra copy for a deterministic
    * per-doc hash share of the language (basis-point gate, c1's md5-bucket
    * idiom) — so the emitted token mass per language matches the
    * allocation in expectation, with NO randomness and no driver state.
    *
    * 100 TB shape: the schedule is a per-language table (broadcast); the
    * expansion is a pure projection + bounded explode (fanout ≤
    * maxEpochs + 1), no shuffle of the corpus. Downstream, c16's shard
    * assignment deterministically scatters the copies across the epoch
    * files. */
  def epochExpand(documents: DataFrame, budgetTokens: Long = 20000L,
      maxEpochs: Int = 2): DataFrame = {
    val sched = unimaxAllocate(documents, budgetTokens, maxEpochs)
      .select(col("lang"),
        (col("alloc_tokens") / col("tokens")).as("epochs"))
      .withColumn("full_ep", floor(col("epochs")).cast("long"))
      .withColumn("rem_bp",
        floor((col("epochs") - floor(col("epochs"))) * lit(10000.0))
          .cast("long"))
    documents.select(col("doc_id"), col("lang"))
      .join(broadcast(sched), Seq("lang"))
      .withColumn("n_copies",
        col("full_ep") +
          when(pmod(hash28("ep:", col("doc_id")), lit(10000))
            < col("rem_bp"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("epoch"))
  }

  def unimaxAllocate(documents: DataFrame, budgetTokens: Long = 20000L,
      maxEpochs: Int = 2): DataFrame = {
    val perLang = documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(LlmText.words(col("text"))).cast("long")).as("tokens"))
      .withColumn("cap", col("tokens") * maxEpochs)
    // constant partition key: the frame is the per-language summary
    // (#langs rows at any corpus size), so single-partition is the
    // intended shape — declaring it spares WindowExec's scale warning
    val byCap = Window.partitionBy(lit(0))
      .orderBy(col("cap").asc, col("lang").asc)
    val ranked = perLang
      .withColumn("i", row_number().over(byCap))
      .withColumn("pre",
        coalesce(sum(col("cap")).over(
          byCap.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(perLang.agg(count(lit(1)).as("nlang"))))
      .withColumn("capped",
        col("cap") * (col("nlang") - col("i") + 1) + col("pre")
          <= lit(budgetTokens))
    val waterInputs = ranked.agg(
      sum(when(col("capped"), lit(1L)).otherwise(lit(0L))).as("k"),
      sum(when(col("capped"), col("cap")).otherwise(lit(0L))).as("s"))
    ranked.crossJoin(broadcast(waterInputs))
      .select(col("lang"), col("n_docs"), col("tokens"), col("cap"),
        when(col("capped"), col("cap").cast("double"))
          .otherwise((lit(budgetTokens) - col("s")).cast("double")
            / (col("nlang") - col("k")))
          .as("alloc_tokens"))
  }

  /** Quality-drift report (c20): per source, how far the NEW snapshot's
    * quality-score distribution moved from the OLD one — the acceptance
    * gate a recurring ingest runs before admitting a fresh crawl ("source
    * X's quality profile shifted — syndication change or pipeline bug?").
    *
    * Each side is scored with the x3 composite
    * ([[LlmText.qualityScoreExpr]] — only +,*,/ on doubles, bit-stable
    * across engines), bucketed into 10 fixed score bins, and compared by
    * total variation distance (half the L1 gap between the two bucket
    * distributions — exact arithmetic, no transcendentals, so it
    * oracle-checks where a KL/PSI's logs would drift in the last ulp).
    * Bucket gaps are decimal-accumulated ([[Relational.dsum]] pattern) so
    * the per-source sum is order-independent under any partitioning.
    *
    * Scale shape: two score passes (pure projections), one (source,
    * bucket) aggregate each (map-side combined, ≤10 rows per source), a
    * full-outer join on ≤10·sources rows, and a source-keyed roll-up —
    * the heavy work never leaves the scan stage. */
  def qualityDrift(oldDocs: DataFrame, newDocs: DataFrame,
      driftBar: Double = 0.1): DataFrame = {
    def buckets(df: DataFrame, out: String): DataFrame =
      df.select(col("source"),
          least(floor(LlmText.qualityScoreExpr(col("text")) * 10), lit(9.0))
            .cast("long").as("bucket"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as(out))
    val joined = buckets(oldDocs, "n_old")
      .join(buckets(newDocs, "n_new"), Seq("source", "bucket"), "full_outer")
      .select(col("source"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = joined.groupBy(col("source"))
      .agg(sum(col("n_old")).as("t_old"), sum(col("n_new")).as("t_new"))
    val gap = abs(
      when(col("t_old") > 0, col("n_old").cast("double") / col("t_old"))
        .otherwise(lit(0.0)) -
      when(col("t_new") > 0, col("n_new").cast("double") / col("t_new"))
        .otherwise(lit(0.0)))
    joined.join(totals, Seq("source"))
      .groupBy(col("source"))
      .agg(max(col("t_old")).as("n_old_docs"),
        max(col("t_new")).as("n_new_docs"),
        (Relational.dsum(gap) / 2).as("tv_distance"))
      .withColumn("drifted", col("tv_distance") > driftBar)
  }

  /** Neyman sampling allocation (c22): split a doc `budget` across sources
    * proportionally to N_h·σ_h (stratum size × within-stratum stddev of
    * n_chars) — the variance-minimizing allocation for a fixed sample
    * budget, so high-variance sources get proportionally more audit/eval
    * samples than uniform-or-size-proportional splits would give them.
    *
    * Arithmetic contract: per-stratum count and power sums are exact
    * (decimal accumulation), variance/σ are then single-expression double
    * math with fixed operation order; the N_h·σ_h weights are grid-rounded
    * before the cross-strata total so the denominator is order-independent.
    * Integerization is largest-remainder (floor everyone, then +1 by
    * fractional-part rank, ties → source name) — allocations sum EXACTLY
    * to `budget`. All windows run over the strata-count aggregate (the
    * q54 summary-window shape), never the fact table. */
  def neymanAllocation(documents: DataFrame, budget: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val per = documents.groupBy(col("source")).agg(
      count(lit(1)).as("nh"),
      sum(col("n_chars").cast(DecimalType(38, 0))).as("sx"),
      sum((col("n_chars") * col("n_chars")).cast(DecimalType(38, 0)))
        .as("sx2"))
    val sxd = col("sx").cast("double")
    // clamped at 0: for a large constant-valued stratum the double
    // rounding of sx²/nh can exceed the exact sx2 by an ulp, and
    // sqrt(negative) would poison the weight as NaN
    val varH = greatest(
      (col("sx2").cast("double") - sxd * sxd / col("nh")) / col("nh"),
      lit(0.0))
    val sigma = sqrt(varH)
    val scored = per.select(col("source"), col("nh").as("n_docs"),
      sigma.as("sigma"),
      round(col("nh") * sigma * lit(1.0e9)).cast(DecimalType(38, 0)).as("g"))
    val all = Window.partitionBy()
    // all-zero weights (every stratum constant-valued) degrade to
    // SIZE-proportional allocation instead of a NaN-poisoned 0/0 — the
    // exact-sum contract holds on that corpus too
    val gTotal = sum(col("g")).over(all).cast("double")
    val w = when(gTotal > 0, col("g").cast("double") / gTotal)
      .otherwise(col("n_docs").cast("double") /
        sum(col("n_docs")).over(all).cast("double"))
    val raw = lit(budget.toDouble) * w
    val withBase = scored.select(col("source"), col("n_docs"), col("sigma"),
      floor(raw).as("base"), (raw - floor(raw)).as("frac"))
    val rem = lit(budget) - sum(col("base")).over(all).cast("long")
    val rn = row_number().over(
      Window.partitionBy().orderBy(col("frac").desc, col("source")))
    withBase
      .select(col("source"), col("n_docs"), col("sigma"),
        (col("base").cast("long") +
          when(rn <= rem, 1L).otherwise(0L)).as("alloc"))
  }

  /** Weighted sampling WITHOUT replacement (c23), Efraimidis–Spirakis
    * A-ES: each document draws a deterministic uniform u from the 28-bit
    * portable hash and ranks by the exponential key −ln(u)/w; the k
    * smallest keys are exactly a weight-proportional sample without
    * replacement (Efraimidis & Spirakis, IPL 2006 — P(doc i first) =
    * wᵢ/Σw, then recursively on the remainder). Weight here is `n_chars`:
    * "sample documents proportionally to their length", the audit-sample
    * rule that makes per-TOKEN inspection rates uniform instead of
    * over-representing short documents the way uniform per-DOC sampling
    * does.
    *
    * Scale shape: one scan, zero shuffles — the key is a per-row
    * projection and the k smallest rows come from TakeOrderedAndProject
    * (per-partition heaps, k-row reduce at the driver), the same plan as
    * q9/q23. At 100 TB this is scan-bound, the optimum for any global
    * sample.
    *
    * Determinism/parity: u = (hash28+1)/2²⁸ ∈ (0,1]; ln(u) is the one
    * libm call, grid-rounded to 5 decimals through DECIMAL(18,6) (the x21
    * entropy precedent) so both engines see the identical key; division
    * by the integer weight is IEEE-exact and ties break on doc_id. */
  def weightedSample(documents: DataFrame, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val h = hash28("ws:", col("doc_id"))
    val u = (h + lit(1L)).cast("double") / lit(268435456.0)
    val lnu = round(log(u), 5).cast(DecimalType(18, 6)).cast("double")
    val skey = (lit(0.0) - lnu) / col("n_chars").cast("double")
    documents
      .select(col("doc_id"), col("n_chars").as("weight"), skey.as("skey"))
      .orderBy(col("skey"), col("doc_id"))
      .limit(k)
  }

  /** Dedup-weighted mixture (c25): per-source token mass measured over the
    * EXACT-DEDUP SURVIVORS (first copy by doc_id, [[graft.operators.Dedup
    * .exactDedup]]'s keep-minimum rule) and the resulting mixture weight —
    * the honest version of a by-source sampling table: a syndicated feed
    * that republishes another source's documents contributes its token
    * mass ONCE, where a naive by-source count would double-weight exactly
    * the most-duplicated content. Composes the [[graft.operators.Dedup
    * .dupFingerprints]] full-text hash with c24's token-mass weighting.
    *
    * Scale shape: one hash + token-count projection, one min-per-hash
    * aggregate, one join back, one per-source aggregate, one broadcast
    * 1-row total — no pairwise work anywhere. */
  def dedupWeightedMix(documents: DataFrame): DataFrame = {
    val h = documents.select(col("doc_id"), col("source"),
      md5(col("text").cast("binary")).as("h"),
      size(LlmText.words(col("text"))).as("tok"))
    val first = h.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    val kept = h.join(first, "h")
      .filter(col("doc_id") === col("first_doc"))
    val per = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("n_tokens"))
    val total = per.agg(sum(col("n_tokens")).as("t"))
    per.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("t").cast("double"))
          .as("weight"))
  }

  /** Curriculum ordering (c28): rank every document easy→hard WITHIN its
    * source by Flesch readability (x34's exact score; ties by doc_id) and
    * tag the training phase its rank falls in — the deterministic
    * "curriculum learning" export order (Bengio et al. 2009): early
    * epochs read the high-readability head, late epochs the hard tail,
    * and interleaving by (within_rank, source) keeps every phase
    * source-balanced without a global shuffle. The anti-shuffle
    * complement of c16: where shuffle-shard destroys order on purpose,
    * this pins a pedagogically-meaningful one.
    *
    * Scale shape: one window per source partition (rank + count — a
    * per-source sort, the cost any curriculum export pays at write time)
    * and zero joins beyond re-attaching the source column; no global
    * sort — shard writers order by the (within_rank, source) key
    * locally. Phase cuts compare exact progress fractions
    * (rank−1)/n — plain IEEE on both engines. */
  def curriculumOrder(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("flesch").desc, col("doc_id"))
    val progress = (col("within_rank") - 1).cast("double") /
      col("n_in_source").cast("double")
    LlmText.readability(documents).select(col("doc_id"), col("flesch"))
      .join(documents.select(col("doc_id"), col("source")), "doc_id")
      .select(col("doc_id"), col("source"), col("flesch"),
        row_number().over(w).cast("long").as("within_rank"),
        count(lit(1)).over(Window.partitionBy(col("source")))
          .cast("long").as("n_in_source"))
      .select(col("doc_id"), col("source"), col("flesch"),
        col("within_rank"), col("n_in_source"), progress.as("progress"),
        when(progress < 0.33, "warmup")
          .when(progress < 0.66, "main")
          .otherwise("polish").as("phase"))
  }

  /** Largest-remainder integerization of a token-mass-proportional budget
    * — the c22 Hamilton-apportionment shape shared by [[annealMix]]'s two
    * phases: floor the raw shares, hand the leftover units to the largest
    * fractional remainders (ties by source name), so the allocations sum
    * to EXACTLY `budget` even when the masses don't divide it. Degrades
    * to doc-count-proportional when the phase's whole token mass is zero
    * (every source gated out), never to 0/0 NaN. */
  private[operators] def remainderAlloc(tokens: Column, nDocs: Column,
      budget: Long, ord: Seq[Column]): Column = {
    val all = Window.partitionBy()
    val tTotal = sum(tokens).over(all).cast("double")
    val w = when(tTotal > 0, tokens.cast("double") / tTotal)
      .otherwise(nDocs.cast("double") / sum(nDocs).over(all).cast("double"))
    val raw = lit(budget.toDouble) * w
    val base = floor(raw)
    val rem = lit(budget) - sum(base).over(all).cast("long")
    val rn = row_number().over(
      Window.partitionBy().orderBy((raw - base).desc +: ord: _*))
    (base.cast("long") + when(rn <= rem, 1L).otherwise(0L))
  }

  /** Two-phase training-mix budgets (c31): per-source token allocations
    * for the MAIN pretraining phase and a smaller high-quality ANNEAL
    * phase (mid-training / learning-rate-anneal data, the practice of
    * ending pretraining on the best data — MiniCPM, Llama-3-style
    * two-stage mixes). Main phase draws from everything above the broad
    * quality gate (`qualityScoreExpr ≥ 0.4`, c5's floor); the anneal
    * phase from the strict gate (≥ 0.6). Each phase's budget splits
    * across sources proportional to that phase's ELIGIBLE token mass,
    * integerized largest-remainder so each phase sums exactly to its
    * budget ([[remainderAlloc]]).
    *
    * Scale shape: one corpus scan (quality score + token count are
    * per-row expressions), one per-source aggregate, then the
    * apportionment runs on the |sources|-row aggregate under an
    * unpartitioned window — bounded driver-free work, the c22 shape. At
    * 100 TB the scan dominates and it's a single pass; nothing joins
    * back to the corpus. */
  def annealMix(documents: DataFrame, budget: Long = 1000000L,
      annealPermille: Int = 100): DataFrame = {
    val annealBudget = budget * annealPermille / 1000L
    val mainBudget = budget - annealBudget
    val tok = size(split(col("text"), " ")).cast("long")
    val q = LlmText.qualityScoreExpr(col("text"))
    val per = documents
      .select(col("source"), tok.as("tok"), q.as("q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("q") >= 0.4, col("tok")).otherwise(0L))
          .as("main_tokens"),
        sum(when(col("q") >= 0.6, col("tok")).otherwise(0L))
          .as("anneal_tokens"))
    per.select(col("source"), col("n_docs"),
      col("main_tokens"), col("anneal_tokens"),
      remainderAlloc(col("main_tokens"), col("n_docs"),
        mainBudget, Seq(col("source"))).as("main_alloc"),
      remainderAlloc(col("anneal_tokens"), col("n_docs"),
        annealBudget, Seq(col("source"))).as("anneal_alloc"))
  }

  /** Quality-gate fairness audit (c33): per language, how the c5/c12
    * quality gate actually lands — doc count, pass count/rate at the
    * 0.5 floor, and the grid-exact mean score. The scoring features
    * (English stopword hits, punctuation share, word length) are
    * English-biased by construction, and this is the table that shows
    * it: a gate that passes 80% of `en` and 30% of `zh` is reshaping
    * the language mix silently — the fairness check every multilingual
    * curation pipeline (CCNet, mC4, CulturaX postmortems) learned to
    * publish next to its filters.
    *
    * One corpus scan, one |langs|-row aggregate; the mean accumulates
    * round(q·1e9) as DECIMAL (exact, order-free) and divides once. */
  def gateFairness(documents: DataFrame, floor: Double = 0.5): DataFrame = {
    val q = LlmText.qualityScoreExpr(col("text"))
    documents
      .select(col("lang"),
        round(q * lit(1.0e9))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("g"),
        when(q >= floor, 1L).otherwise(0L).as("p"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("p")).as("n_pass"),
        sum(col("g")).as("gs"))
      .select(col("lang"), col("n_docs"), col("n_pass"),
        (col("n_pass").cast("double") / col("n_docs").cast("double"))
          .as("pass_rate"),
        (col("gs").cast("double") / lit(1.0e9) / col("n_docs"))
          .as("mean_quality"))
  }

  /** Data-constrained-scaling effective-token accounting (c32): per
    * source, how many FRESH-data-equivalent tokens the source really
    * contributes when a fixed token budget forces repeating it. Unique
    * mass U = tokens surviving the near-dup keeper decision (the same
    * components c30 budgets with), raw mass T = everything, epochs
    * k = T/U, and the effective mass follows Muennighoff et al. 2023
    * (arXiv:2305.16264, "Scaling Data-Constrained Language Models"):
    * repeated epochs decay exponentially with half-value constant
    * R* ≈ 15, D' = U + U·R*·(1 − e^(−(k−1)/R*)) — k=1 is exactly U,
    * k→∞ saturates at U·(1+R*). This is the number a 100 TB mix plan
    * compares across sources when deciding whether to re-epoch a clean
    * small source or ingest a duplicate-ridden large one.
    *
    * Parity contract: T and U are exact integer sums ([[dedupTokenBudget]]
    * semantics); k is one IEEE division; the single libm exp is snapped
    * to the 5-decimal grid (x21's ln precedent) so both engines agree
    * bit-exactly; the rest is plain IEEE arithmetic on snapped values.
    *
    * Scale shape: the keeper decision is the LSH+CC pass the dedup
    * family already prices (d8b's precomputed-components shape — pass
    * the stored component table, don't rebuild it per consumer); this
    * operator adds one corpus scan + a |sources|-row fold. */
  def effectiveTokens(documents: DataFrame, components: DataFrame,
      rStar: Double = 15.0): DataFrame = {
    val base = dedupTokenBudget(documents, components)
    val u = col("n_tokens_kept").cast("double")
    val k = col("n_tokens").cast("double") / u
    val decay = round(exp((lit(1.0) - k) / lit(rStar)), 5)
      .cast(org.apache.spark.sql.types.DecimalType(18, 6)).cast("double")
    val eff = u + u * lit(rStar) * (lit(1.0) - decay)
    base.select(col("source"), col("n_docs"),
      col("n_tokens").as("raw_tokens"),
      col("n_tokens_kept").as("unique_tokens"),
      k.as("epochs"), eff.as("effective_tokens"),
      (eff / col("n_tokens").cast("double")).as("efficiency"))
  }
}
