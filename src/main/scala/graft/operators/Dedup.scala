package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, bottom-k n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): every candidate-generation step is an equi-join on
  * a small derived key (band signature / sketch hash / label block), never an
  * all-pairs product; fingerprints are computed in one pass per document with
  * array higher-order functions (no per-token shuffle); verification joins
  * repartition only the candidate pairs, which are O(near-dups), not O(n²).
  *
  * All hashes are md5 hex strings so the DuckDB oracle can reproduce them
  * exactly; min/sort over hex strings is a valid uniform min-hash.
  */
object Dedup {

  /** Exact dedup (d1): group by content hash, keep the smallest doc_id.
    * One hash-aggregate with map-side partial aggregation; the canonical
    * exact-dedup shape for any scale. */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text").cast("binary")).as("content_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Number of MinHash functions and rows-per-band for LSH: 12 hashes in 4
    * bands of 3 → candidate threshold ≈ (1/4)^(1/3) ≈ 0.63 Jaccard. */
  val MinHashK = 12
  val BandRows = 3

  private def docShingles(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), LlmText.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)

  /** MinHash signature: for hash k, min over shingles of md5("k:" + s). */
  private def minhashSig(sh: Column): Column =
    transform(sequence(lit(0), lit(MinHashK - 1)), k =>
      array_min(transform(sh, s =>
        md5(concat(k.cast("string"), lit(":"), s).cast("binary")))))

  /** MinHash + LSH near-dup pairs (d2): shingle → 12 min-hashes → 4 band
    * keys → band-bucket equi-join for candidates → exact Jaccard ≥ 0.7.
    *
    * The band join is the scalable step: documents only meet if they share
    * an identical 3-hash band, so the shuffle key is (band index, band key)
    * and no n² product ever materializes. Verification re-joins shingle sets
    * for candidate pairs only. */
  def minhashLsh(documents: DataFrame, threshold: Double = 0.7): DataFrame = {
    val sh = docShingles(documents)
    val sig = sh.select(col("doc_id"), minhashSig(col("sh")).as("mhs"))
    val bands = sig.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(MinHashK / BandRows - 1)), j =>
        struct(j.as("band"),
          concat_ws("|",
            element_at(col("mhs"), j * BandRows + 1),
            element_at(col("mhs"), j * BandRows + 2),
            element_at(col("mhs"), j * BandRows + 3)).as("bkey"))))
        .as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val jac = cand
      .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sh.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          size(array_union(col("x.sh"), col("y.sh")))).as("jaccard"))
    jac.filter(col("jaccard") >= threshold)
  }

  /** Hex-char value (0..15) at 1-based position c of a hex string. */
  private def hexVal(hx: Column, c: Column): Column = {
    val a = ascii(hx.substr(c, lit(1)))
    when(a <= 57, a - 48).otherwise(a - 87)
  }

  /** ±1 contribution of each of the 60 bits of md5("w:" + word) (first 15
    * hex chars; bit b lives at hex char b/4, bit-in-char b%4). */
  private def wordBits(w: Column): Column =
    flatten(transform(sequence(lit(1), lit(15)), c => {
      val v = hexVal(md5(concat(lit("w:"), w).cast("binary")), c)
      array((0 to 3).map(j =>
        shiftright(v, j).bitwiseAND(lit(1)) * 2 - 1): _*)
    }))

  /** SimHash fingerprint (d3): 60-bit signature per document, computed in a
    * single projection — per-word ±1 bit votes accumulated with
    * aggregate/zip_with, then packed into a long. Integer-only arithmetic →
    * bit-exact across engines; no shuffle at any scale. */
  def simhash(documents: DataFrame): DataFrame = {
    val ws = LlmText.words(col("text"))
    val counts = aggregate(ws,
      array_repeat(lit(0), 60),
      (acc, w) => zip_with(acc, wordBits(w), (x, y) => x + y))
    val packed = aggregate(
      zip_with(counts, sequence(lit(0), lit(59)), (cnt, b) =>
        when(cnt > 0, pow(lit(2.0), b).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    documents.select(col("doc_id"), packed.as("simhash"))
  }

  /** Bottom-k n-gram Jaccard near-dup (d4): candidates share one of the 4
    * smallest shingle hashes (bottom-k sketch equi-join — content-based
    * blocking that survives cross-source/cross-lang near-dups), verified by
    * character-3-gram Jaccard ≥ 0.6. */
  def ngramJaccard(documents: DataFrame, threshold: Double = 0.6): DataFrame = {
    val sk = documents
      .filter(size(LlmText.words(col("text"))) >= 3)
      .select(col("doc_id"),
        explode(slice(array_sort(transform(LlmText.shingles(col("text")),
          s => md5(concat(lit("f:"), s).cast("binary")))), 1, 4)).as("h"))
    val cand = sk.as("a")
      .join(sk.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val g = documents
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), LlmText.charTrigrams(col("text")).as("g3"))
    cand
      .join(g.as("x"), col("doc_a") === col("x.doc_id"))
      .join(g.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("x.g3"), col("y.g3"))).cast("double") /
          size(array_union(col("x.g3"), col("y.g3")))).as("jaccard3"))
      .filter(col("jaccard3") >= threshold)
  }

  /** Embedding-cosine near-dup pairs (d5): label-blocked self-join (the
    * cluster-id analog of ANN bucketing — at 100 TB the block key would come
    * from s2's LSH signature instead), exact in-order cosine ≥ threshold. */
  def embeddingDedup(embeddings: DataFrame,
      threshold: Double = 0.4): DataFrame = {
    val v = embeddings.select(col("vec_id"), col("label"),
      VectorOps.asDouble(col("embedding")).as("x"))
    v.as("a")
      .join(v.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VectorOps.cosine(col("a.x"), col("b.x")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
