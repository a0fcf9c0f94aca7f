package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over the
  * `documents` table: token statistics, n-gram/stopword language ID, quality
  * scoring, and content fingerprinting.
  *
  * Every operator here is a single narrow projection — no shuffle, no UDF,
  * no driver-side state — so it scales linearly with input splits at 100 TB
  * and stays inside Catalyst (higher-order functions on arrays). All
  * arithmetic is integer or single-division double so results are
  * bit-identical to the DuckDB oracle regardless of partitioning.
  */
object LlmText {

  /** Whitespace tokens of `text`. Uses a literal single-space split like the
    * corpus layout; both the Spark and oracle sides derive every measure from
    * the same split so the definitions stay in lockstep. */
  def words(text: Column): Column = split(text, " ")

  /** BPE-ish tokenizer: letter runs, digit runs, single other non-space
    * chars (CJK text falls through to char-level, like byte-fallback BPE). */
  val BpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** Word 3-gram shingles (distinct), the unit of all n-gram dedup ops.
    * Empty for docs under 3 words (mirrored by the oracle's WHERE).
    *
    * Built as zip_with over three shifted slices rather than per-index
    * element_at: a lambda body re-evaluates everything inside it per
    * element, so indexing into `split(text)` from within the lambda re-runs
    * the split 3× per shingle (~7× slower measured); the slice form
    * evaluates the split once per row. */
  def shingles(text: Column): Column = {
    val ws = words(text)
    val n = size(ws) - 2
    when(size(ws) >= 3,
      array_distinct(
        zip_with(
          zip_with(slice(ws, lit(1), n), slice(ws, lit(2), n),
            (x, y) => concat(x, lit(" "), y)),
          slice(ws, lit(3), n),
          (xy, z) => concat(xy, lit(" "), z))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct character 3-grams — the finer-grained similarity unit used by
    * n-gram Jaccard verification. Native one-pass byte walk
    * ([[graft.functions.CharTrigramSet]]); the HOF twin re-seeks the
    * code-point offset per trigram (quadratic on CJK text). */
  def charTrigrams(text: Column): Column =
    org.apache.spark.sql.graftinternal.Bridge.column(
      graft.functions.CharTrigramSet(
        org.apache.spark.sql.graftinternal.Bridge.expression(text)))

  /** HOF formulation of [[charTrigrams]] — the portable form the DuckDB
    * oracle mirrors, kept as the bit-equality reference. */
  private[graft] def charTrigramsReference(text: Column): Column =
    when(length(text) >= 3,
      array_distinct(transform(sequence(lit(1), length(text) - 2), i =>
        text.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** Token counting (x1): whitespace tokens, distinct tokens, BPE-ish
    * tokens, and mean token length. Mean length is derived from char count
    * minus separators — one double division, order-independent. */
  def tokenStats(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val n = size(ws)
    documents.select(
      col("doc_id"),
      n.as("n_tokens"),
      size(array_distinct(ws)).as("n_distinct_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeTokenPattern), lit(0)))
        .as("n_bpe_tokens"),
      ((length(col("text")) - (n - 1)).cast("double") / n)
        .as("avg_token_len"))
  }

  // Tiny per-language stopword lists for the n-gram-free heuristic scorer.
  // Deliberately overlapping (de/la/un appear in several Romance lists) —
  // the argmax with a fixed tie-break order resolves them deterministically.
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "that")
  val StopFr = Seq("le", "la", "les", "de", "et", "un", "une", "est")
  val StopDe = Seq("der", "die", "das", "und", "ist", "ein", "eine", "von")
  val StopEs = Seq("el", "los", "las", "de", "y", "un", "una", "es")

  private def stopHits(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(stop)))

  /** Language ID (x2): count stopword occurrences per language, argmax with
    * tie-break order en > fr > de > es. Pure projection — the 100 TB form of
    * fastText-style lang ID where the model is a broadcast lookup. */
  def langId(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val sEn = stopHits(ws, StopEn)
    val sFr = stopHits(ws, StopFr)
    val sDe = stopHits(ws, StopDe)
    val sEs = stopHits(ws, StopEs)
    documents.select(
      col("doc_id"),
      sEn.as("score_en"), sFr.as("score_fr"),
      sDe.as("score_de"), sEs.as("score_es"),
      when(sEn >= sFr && sEn >= sDe && sEn >= sEs, "en")
        .when(sFr >= sDe && sFr >= sEs, "fr")
        .when(sDe >= sEs, "de")
        .otherwise("es").as("pred_lang"))
  }

  /** The x3 quality score as a standalone column expression over a text
    * column — the exact tree [[qualityScore]] emits, so composed pipelines
    * (c5) filter on bit-identical values without a keep-list join. */
  def qualityScoreExpr(text: Column): Column = {
    val ws = words(text)
    val n = size(ws)
    val mwl = (length(text) - (n - 1)).cast("double") / n
    val stopRatio = stopHits(ws, StopEn).cast("double") / n
    val nBpe = greatest(
      size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))),
      lit(1))
    val punctRatio =
      size(regexp_extract_all(text, lit("[^a-zA-Z0-9 ]"), lit(0)))
        .cast("double") / nBpe
    lit(0.4) * stopRatio + lit(0.3) * (lit(1.0) - punctRatio) +
      lit(0.3) * (least(mwl, lit(8.0)) / lit(8.0))
  }

  /** Quality scoring (x3): length/punctuation/stopword heuristics composed
    * into one [0,1] score. Only +,*,/ on doubles in a fixed expression tree
    * — no transcendentals, so the value is bit-stable across engines. */
  def qualityScore(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val n = size(ws)
    val mwl = (length(col("text")) - (n - 1)).cast("double") / n
    val stopRatio = stopHits(ws, StopEn).cast("double") / n
    val nBpe = greatest(
      size(regexp_extract_all(col("text"), lit(BpeTokenPattern), lit(0))),
      lit(1))
    val punctRatio =
      size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0)))
        .cast("double") / nBpe
    val score = lit(0.4) * stopRatio + lit(0.3) * (lit(1.0) - punctRatio) +
      lit(0.3) * (least(mwl, lit(8.0)) / lit(8.0))
    documents.select(
      col("doc_id"),
      col("n_chars"),
      n.as("n_tokens"),
      mwl.as("avg_token_len"),
      stopRatio.as("stopword_ratio"),
      punctRatio.as("punct_ratio"),
      score.as("quality_score"),
      (score >= 0.5).as("is_quality"))
  }

  /** Flesch reading-ease readability (x34): 206.835 − 1.015·(words/
    * sentences) − 84.6·(syllables/words), the curation-side difficulty
    * score next to x3's quality composite — training mixtures routinely
    * stratify on readability bands (textbook-like vs forum-like prose).
    * Sentences are [.!?]+ runs (min 1), syllables per word are [aeiouy]+
    * vowel GROUPS lowercased (min 1, the standard cheap approximation).
    * Only +,−,·,/ on doubles in a fixed expression tree — no
    * transcendentals, so the score is bit-stable across engines and the
    * DuckDB twin needs no grid rounding. One projection, no shuffle. */
  def readability(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val nWords = size(ws)
    val nSent = greatest(
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1))
    val syll = aggregate(
      transform(ws, w => greatest(
        size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0))),
        lit(1))),
      lit(0), (acc, x) => acc + x)
    documents.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      nSent.cast("long").as("n_sentences"),
      syll.cast("long").as("n_syllables"),
      (lit(206.835)
        - lit(1.015) * (nWords.cast("double") / nSent.cast("double"))
        - lit(84.6) * (syll.cast("double") / nWords.cast("double")))
        .as("flesch"))
  }

  /** Gopher-style rule filter (x18): the published-heuristic counterpart of
    * x3's composite score — each document is judged by NAMED structural
    * rules (word-count bounds, mean-word-length bounds, symbol ratio,
    * alphabetic-word fraction, duplicate-word fraction, stopword presence)
    * with the per-rule verdicts exposed as columns, so a curation run can
    * report WHICH rule rejected each document, not just that one did
    * (the Gopher/Dolma filter-ledger shape). Thresholds default to values
    * meaningful for the synthetic corpus; production corpora pass their
    * own. All measures are counts and ratios in fixed expression trees —
    * no transcendentals — so values are bit-stable across engines. Pure
    * projection: runs at scan speed, no shuffle at any corpus size. */
  def gopherRules(documents: DataFrame,
      minWords: Int = 20, maxWords: Int = 80,
      minMwl: Double = 4.0, maxMwl: Double = 5.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      maxDupFrac: Double = 0.5, minStopwords: Int = 2): DataFrame = {
    val ws = words(col("text"))
    val n = size(ws)
    val mwl = (length(col("text")) - (n - 1)).cast("double") / n
    val symRatio =
      size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0)))
        .cast("double") / n
    val alphaFrac =
      size(filter(ws, w => w.rlike("[a-zA-Z]"))).cast("double") / n
    val dupFrac = lit(1.0) - size(array_distinct(ws)).cast("double") / n
    val nStop = size(array_intersect(
      array_distinct(ws), array(StopEn.map(lit): _*)))
    val rWords = n >= minWords && n <= maxWords
    val rMwl = mwl >= minMwl && mwl <= maxMwl
    val rSym = symRatio <= maxSymbolRatio
    val rAlpha = alphaFrac >= minAlphaFrac
    val rDup = dupFrac <= maxDupFrac
    val rStop = nStop >= minStopwords
    documents.select(
      col("doc_id"), n.as("n_words"), mwl.as("mean_word_len"),
      symRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
      dupFrac.as("dup_frac"), nStop.as("n_stopwords"),
      rWords.as("rule_word_count"), rMwl.as("rule_word_len"),
      rSym.as("rule_symbol_ratio"), rAlpha.as("rule_alpha_frac"),
      rDup.as("rule_dup_frac"), rStop.as("rule_stopwords"),
      (rWords && rMwl && rSym && rAlpha && rDup && rStop).as("pass"))
  }

  /** Rabin–Karp rolling-hash parameters: H(w1..w4) = ((v1·B + v2)·B + v3)·B
    * + v4 (mod P), each step reduced mod P so the widest product is
    * (P-1)·B + 2^28 < 2^38 — overflow-free in both engines. */
  val RollB = 131L
  val RollP = 1000000007L
  val RollK = 4

  /** Per-document Rabin–Karp window hashes: `(doc_id, roll)` where `roll`
    * is the array of 4-word rolling hashes in position order — the shared
    * span unit of [[rollingFingerprint]] (x5) and [[spanDedup]] (d10). */
  private[operators] def rolledWindows(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    // word values materialized behind an exchange: the rolling combine
    // references the array via four shifted slices, which would otherwise
    // re-inline the hash chain 4× per row (see Dedup's shingle hashing).
    // hash28 digests-and-folds natively — no per-word hex intermediate.
    val based = documents
      .filter(size(ws) >= RollK)
      .select(col("doc_id"),
        transform(ws, w => PortableHash.hash28("r:", w)).as("varr"))
      .transform(Partitioning.spread(_, col("doc_id")))
    val m = size(col("varr")) - (RollK - 1)
    def shifted(i: Int): Column = slice(col("varr"), lit(i), m)
    val roll = zip_with(
      zip_with(
        zip_with(shifted(1), shifted(2),
          (a, b) => pmod(a * RollB + b, lit(RollP))),
        shifted(3), (ab, c) => pmod(ab * RollB + c, lit(RollP))),
      shifted(4), (abc, d) => pmod(abc * RollB + d, lit(RollP)))
    based.select(col("doc_id"), roll.as("roll"))
  }

  /** Rolling-hash document fingerprint (x5): Rabin–Karp over 4-word
    * windows, winnowing-style min sample + distinct-window count. Built
    * with zip_with over shifted slices (one pass per row, no per-element
    * re-evaluation) — a pure projection at any scale. */
  def rollingFingerprint(documents: DataFrame): DataFrame =
    rolledWindows(documents).select(
      col("doc_id"),
      size(col("roll")).as("n_windows"),
      array_min(col("roll")).as("min_window_hash"),
      size(array_distinct(col("roll"))).as("n_distinct_windows"))

  /** Content-defined chunking (x19): split each document into variable-size
    * chunks whose boundaries are chosen by CONTENT, not position — a new
    * chunk starts wherever the 4-word rolling hash ≡ 0 (mod `divisor`), so
    * an insertion early in a document only reshuffles the chunks around the
    * edit instead of shifting every fixed-width block after it (the
    * rsync/LBFS property storage-level dedup relies on). Emits one row per
    * (doc, chunk) with the window count, min window hash, and xor-fold —
    * the chunk signature columns an exact-dedup pass groups on.
    *
    * 100 TB shape: window explode is token-scale and narrow (d10's shape);
    * the chunk assignment is one doc-keyed running sum and the roll-up is a
    * co-partitioned groupBy on (doc, chunk) — the doc_id exchange is
    * reused, and no state leaves the executors. */
  def cdcChunks(documents: DataFrame, divisor: Int = 16): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    rolledWindows(documents)
      .select(col("doc_id"), posexplode(col("roll")).as(Seq("pos", "h")))
      .withColumn("bd",
        when(pmod(col("h"), lit(divisor.toLong)) === 0, 1L).otherwise(0L))
      .withColumn("chunk_idx", sum(col("bd")).over(W))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_windows"),
        min(col("h")).as("chunk_min_hash"),
        expr("bit_xor(h)").as("chunk_xor"))
  }

  /** Span-level duplication (d10): which 4-word spans of each document also
    * appear in OTHER documents — the scalable stand-in for exact-substring
    * dedup (suffix-array dedup à la "Deduplicating Training Data"): a span
    * shared across documents is boilerplate/copied text even when whole-doc
    * similarity is low.
    *
    * Plan shape at 100 TB: the window explode is narrow (corpus token
    * scale) and is immediately reduced to ONE ROW PER (doc, span-hash) —
    * every downstream step works on that deduplicated frame, so a
    * boilerplate span occurring millions of times contributes one row per
    * document it appears in, never one per occurrence. The per-hash
    * distinct-doc count becomes a plain count over the pre-aggregate
    * (map-side partial aggregation absorbs the hot keys); the shared-hash
    * table is O(duplicated spans) and joins back against the (doc, hash)
    * frame, where AQE broadcasts it when small and skew-splits the
    * residual shuffle otherwise — the residual hot-key partition holds a
    * bounded row per document, not per occurrence. The per-doc roll-up is
    * a doc-keyed aggregate. No driver-side state anywhere. */
  /** spanDedup's join input: one row per (doc, span-hash) with the
    * occurrence count folded in. This pre-aggregate is the skew guard — a
    * boilerplate span occurring millions of times in hot docs costs one
    * row per doc on the shared-span join key, not one per occurrence
    * (SkewSpec pins this bound on the exact frame spanDedup joins). */
  private[operators] def spanWindowCounts(documents: DataFrame): DataFrame =
    rolledWindows(documents)
      .select(col("doc_id"), explode(col("roll")).as("h"))
      .groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("cnt"))

  /** The shared-span hash index: the 4-word window hashes appearing in at
    * least `minDocs` documents — the boilerplate vocabulary of a corpus,
    * materialized small (one row per DUPLICATED span) so ingest-time
    * scoring ([[spanScoreVsIndex]], streaming twin
    * [[graft.streaming.StreamDedup.spanScoreVsIndex]]) joins against it as
    * a broadcast. Rebuild it nightly from the lake the way d13's band
    * index is rebuilt. */
  def sharedSpanIndex(documents: DataFrame, minDocs: Int = 2): DataFrame =
    spanWindowCounts(documents)
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))

  /** Score documents against a STORED shared-span index (d19): per doc,
    * how many of its 4-word windows are known boilerplate — [[spanDedup]]'s
    * incremental twin, the d13 pattern applied at span granularity. An
    * ingest pipeline scores arriving documents against last night's index
    * without touching the corpus.
    *
    * Plan shape: the index is O(duplicated spans) and broadcasts; the
    * window explode is joined broadcast-side (no shuffle, no skew — a hot
    * boilerplate span costs its occurrence rows, all local), and the
    * roll-up is keyed by doc_id on the partitioning [[rolledWindows]]
    * already established, so the whole scorer adds zero exchanges. */
  def spanScoreVsIndex(docs: DataFrame, index: DataFrame): DataFrame = {
    val w = rolledWindows(docs)
      .select(col("doc_id"), explode(col("roll")).as("h"))
    val frac = col("n_indexed_windows").cast("double") / col("n_windows")
    w.join(broadcast(index.select(col("h"), lit(1).as("in_index"))),
        Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        coalesce(sum(when(col("in_index").isNotNull, 1L)), lit(0L))
          .as("n_indexed_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_indexed_windows"),
        frac.as("indexed_frac"), (frac > 0.5).as("is_boilerplate_heavy"))
  }

  /** Removable duplicated spans (d18): the surgical companion to
    * [[spanDedup]] — instead of flagging whole documents as dup-heavy, emit
    * the exact word ranges `(doc_id, span_start, span_len)` whose 4-word
    * windows all appear in ≥ `minDocs` documents, so curation can CUT the
    * boilerplate and keep the document ("Deduplicating Training Data Makes
    * Language Models Better" removes substrings, not documents).
    *
    * A span is a maximal run of consecutive shared windows: windows at
    * positions i..j (1-based word index of each window's first word)
    * collapse to one span starting at word i covering `j - i + RollK`
    * words. Runs are found with the gaps-and-islands trick — position minus
    * its per-doc rank is constant within a consecutive run — so the only
    * window function is partitioned by doc_id (bounded per doc, no skew).
    *
    * Plan shape at 100 TB: the shared-hash table comes from the same
    * pre-aggregated (doc, hash) frame as [[spanDedup]] (one row per doc per
    * hash, hot spans absorbed map-side); the positional explode joins that
    * small table on h (AQE broadcasts it), and everything after is
    * partitioned by doc_id. */
  def removableSpans(documents: DataFrame, minDocs: Int = 2): DataFrame = {
    // ONE rolling-hash pass: both the shared-hash table (via the per-doc
    // distinct counts) and the positional explode derive from the same
    // persisted window frame — recomputing rolledWindows for the
    // positions would double the per-word md5 + rolling-combine cost.
    val rw = rolledWindows(documents)
    Caching.withPersisted(rw) {
      val shared = rw
        .select(col("doc_id"), explode(col("roll")).as("h"))
        .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= minDocs)
        .select(col("h"))
      val pos = rw
        .select(col("doc_id"), posexplode(col("roll")).as(Seq("p0", "h")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      pos.join(shared, Seq("h"))
        .select(col("doc_id"), col("pos"),
          (col("pos") - row_number().over(byDoc)).as("isl"))
        .groupBy(col("doc_id"), col("isl"))
        .agg(min(col("pos")).cast("long").as("span_start"),
          (max(col("pos")) - min(col("pos")) + RollK).cast("long")
            .as("span_len"))
        .select(col("doc_id"), col("span_start"), col("span_len"))
    }
  }

  def spanDedup(documents: DataFrame, minDocs: Int = 2): DataFrame = {
    val g = spanWindowCounts(documents)
    Caching.withPersisted(g) {
      val shared = g.groupBy(col("h"))
        .agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= minDocs)
        .select(col("h"), lit(1).as("is_shared"))
      val frac =
        col("n_shared_windows").cast("double") / col("n_windows")
      g.join(shared, Seq("h"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_windows"),
          coalesce(sum(when(col("is_shared").isNotNull, col("cnt"))),
            lit(0L)).as("n_shared_windows"))
        .select(col("doc_id"), col("n_windows"), col("n_shared_windows"),
          frac.as("shared_frac"),
          (frac > 0.5).as("is_dup_heavy"))
    }
  }

  /** Text cleaning (x6): the normalization pass that precedes dedup and
    * tokenization in a training-data pipeline — lowercase, strip
    * non-alphanumerics to spaces, collapse runs of whitespace, trim.
    * Pure regexp projection; emits before/after lengths so filtering rules
    * ("cleaning removed >50% of the doc") compose downstream. */
  def cleanText(documents: DataFrame): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    documents.select(
      col("doc_id"),
      cleaned.as("clean_text"),
      length(col("text")).as("len_raw"),
      length(cleaned).as("len_clean"),
      (length(cleaned).cast("double") / length(col("text")))
        .as("retained_ratio"))
  }

  /** Document fingerprinting (x4): whole-content md5, min-hashed shingle
    * (winnowing-style min-sample), and a bottom-4 shingle sketch — the join
    * key family for near-dup candidate generation at scale. */
  def fingerprint(documents: DataFrame): DataFrame = {
    val sh = shingles(col("text"))
    val hashes = transform(sh, s => md5(concat(lit("f:"), s).cast("binary")))
    documents
      .filter(size(words(col("text"))) >= 3)
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("content_md5"),
        array_min(hashes).as("min_shingle_hash"),
        array_join(slice(array_sort(hashes), 1, 4), "|").as("bottom4_sketch"))
  }

  /** Non-distinct word k-grams via zip_with over shifted slices (the same
    * one-pass-per-row shape as [[shingles]], minus the dedup). */
  private def wordNgrams(ws: Column, k: Int): Column = {
    val n = size(ws) - (k - 1)
    val joined = (2 to k).foldLeft(slice(ws, lit(1), n)) { (acc, i) =>
      zip_with(acc, slice(ws, lit(i), n), (a, b) => concat(a, lit(" "), b))
    }
    when(size(ws) >= k, joined).otherwise(array().cast("array<string>"))
  }

  /** Fraction of duplicate elements in a gram array (0.0 when empty). */
  private def dupFrac(grams: Column): Column = {
    val n = size(grams)
    when(n > 0, (n - size(array_distinct(grams))).cast("double") / n)
      .otherwise(lit(0.0))
  }

  /** The three duplicate fractions as one native one-pass struct
    * ([[graft.functions.DupNgramFracs]]); the HOF twin is
    * [[repetitionSignalsReference]], pinned bit-equal by spec. */
  private def dupStruct(text: Column): Column =
    org.apache.spark.sql.graftinternal.Bridge.column(
      graft.functions.DupNgramFracs(
        org.apache.spark.sql.graftinternal.Bridge.expression(words(text))))

  /** The x8 repetition flag as a standalone column expression — the exact
    * arithmetic [[repetitionSignals]] emits, for inline pipeline filters
    * (c5). */
  def isRepetitiveExpr(text: Column): Column = {
    val d = dupStruct(text)
    d.getField("dup_word_frac") > 0.30 ||
      d.getField("dup_bigram_frac") > 0.20 ||
      d.getField("dup_trigram_frac") > 0.18
  }

  /** Repetition signals (x8): Gopher-style duplicate-n-gram fractions at the
    * word, bigram, and trigram level, plus a composite repetition flag — the
    * filter that removes boilerplate/looping documents from a training mix.
    * One narrow projection per row (single-pass native struct, no shuffle),
    * integer counts with a single final division, so values are bit-stable
    * across engines at any partitioning. */
  def repetitionSignals(documents: DataFrame): DataFrame = {
    val d = dupStruct(col("text"))
    val dupW = d.getField("dup_word_frac")
    val dup2 = d.getField("dup_bigram_frac")
    val dup3 = d.getField("dup_trigram_frac")
    documents.select(
      col("doc_id"),
      size(words(col("text"))).as("n_words"),
      dupW.as("dup_word_frac"),
      dup2.as("dup_bigram_frac"),
      dup3.as("dup_trigram_frac"),
      (dupW > 0.30 || dup2 > 0.20 || dup3 > 0.18).as("is_repetitive"))
  }

  /** HOF formulation of [[repetitionSignals]] — the portable form the
    * DuckDB oracle mirrors, kept as the bit-equality reference. */
  private[graft] def repetitionSignalsReference(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val dupW = dupFrac(ws)
    val dup2 = dupFrac(wordNgrams(ws, 2))
    val dup3 = dupFrac(wordNgrams(ws, 3))
    documents.select(
      col("doc_id"),
      size(ws).as("n_words"),
      dupW.as("dup_word_frac"),
      dup2.as("dup_bigram_frac"),
      dup3.as("dup_trigram_frac"),
      (dupW > 0.30 || dup2 > 0.20 || dup3 > 0.18).as("is_repetitive"))
  }

  /** Vocabulary coverage / OOV stats (x9): build the corpus top-`vocabSize`
    * vocabulary (count desc, term asc — deterministic at the cutoff) and
    * report per-document out-of-vocabulary counts and rate — the signal a
    * tokenizer-bound pipeline uses to spot domain drift and junk before
    * training.
    *
    * Plan shape at 100 TB: the vocabulary is a TakeOrdered over the
    * map-side-combined term counts and BROADCASTS; membership counting is
    * the explode joined against that broadcast, so the only corpus-keyed
    * shuffle is the per-doc count. */
  def vocabOov(documents: DataFrame, vocabSize: Int = 1000): DataFrame = {
    val toks = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
    Caching.withPersisted(toks) {
      val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(vocabSize)
        .select(col("term"), lit(1).as("in_v"))
      // one pass over toks yields BOTH counts (split() emits ≥1 token per
      // doc, so every doc appears): no second corpus scan, no re-join on
      // doc_id — count(in_v) counts only vocabulary hits
      val oov = col("n_tokens") - col("n_in_vocab")
      toks.join(broadcast(vocab), Seq("term"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), count(col("in_v")).as("n_in_vocab"))
        .select(col("doc_id"), col("n_tokens"), oov.as("n_oov"),
          (oov.cast("double") / col("n_tokens")).as("oov_rate"))
    }
  }

  /** BM25 relevance scoring (x10): rank documents against a fixed query
    * term set — the relevance-based selection pass of a curation pipeline
    * ("keep documents that look like the target domain"). Uses the
    * rational idf `N/df` (like x7) and fixed-order per-term summation, so
    * every value is a deterministic double expression both engines
    * reproduce; k1/b are the standard 1.2/0.75.
    *
    * Plan shape at 100 TB: the token explode filters to query terms
    * IMMEDIATELY (narrow, corpus never shuffled wide), tf/df aggregates are
    * map-side combined over the tiny filtered stream, corpus stats and df
    * broadcast, and the global top-k compiles to TakeOrderedAndProject. */
  def bm25(documents: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dl = size(words(col("text")))
    val stats = documents.agg(count(lit(1)).as("n_docs"),
      (sum(dl.cast(DecimalType(38, 6))).cast("double") / count(lit(1)))
        .as("avgdl"))
    val tf = documents
      .select(col("doc_id"), dl.as("dl"),
        explode(words(col("text"))).as("term"))
      .filter(col("term").isInCollection(terms))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val s = (col("n_docs").cast("double") / col("df")) *
      (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    val perTerm = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), s.as("s"))
    // fixed-order summation over the (small, fixed) term set: a plain
    // sum(double) would be partition-order-dependent
    val parts = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("s"))).as(s"s$i")
    }
    val score = terms.indices
      .map(i => coalesce(col(s"s$i"), lit(0.0)))
      .reduce(_ + _)
    perTerm.groupBy(col("doc_id"))
      .agg(parts.head, parts.tail: _*)
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** PII patterns (x11). Deliberately in the RE2 ∩ java.util.regex common
    * subset — `\b`, bounded repetition, and character classes only — so the
    * Spark plan and the DuckDB oracle compile the SAME pattern. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** The synthetic-PII enrichment both engines apply before detection: the
    * test corpus carries no real PII, so each doc gets a deterministic
    * email/second email domain/IPv4/phone derived from its id. This keeps
    * the detection and redaction paths genuinely exercised while staying
    * reproducible (no fixture files, no rand()). */
  def withSyntheticPii(text: Column, docId: Column): Column = concat(
    text,
    lit(" contact user"), docId.cast("string"), lit("@mail.example.com"),
    lit(" backup admin@corp"), pmod(docId, lit(7)).cast("string"),
    lit(".org from 10."), pmod(docId, lit(200)).cast("string"),
    lit(".0."), pmod(docId, lit(256)).cast("string"),
    lit(" call +1-555-"),
    lpad(pmod(docId, lit(10000)).cast("string"), 4, "0"))

  /** PII detection + redaction (x11): count emails / IPv4s / phone numbers
    * and replace each with a typed placeholder — the compliance pass every
    * training-data pipeline runs before releasing a corpus. Counts are
    * taken on the raw text; redaction applies email → IP → phone in a fixed
    * order so the passes cannot partially rewrite each other's matches.
    * Pure regexp projection: no shuffle, scales with input splits. */
  def piiRedact(documents: DataFrame): DataFrame = {
    val enriched = withSyntheticPii(col("text"), col("doc_id"))
    val docs = documents.select(col("doc_id"), enriched.as("pii_text"))
      .transform(Partitioning.spread(_, col("doc_id")))
    val t = col("pii_text")
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0))).as("n_ips"),
      size(regexp_extract_all(t, lit(PhonePattern), lit(0))).as("n_phones"),
      redacted.as("redacted_text"))
  }

  /** Line-level boilerplate filtering (x12), C4-style: segment the document
    * into fixed-width pseudo-lines (the corpus has no newlines), keep lines
    * with at least `minWords` words and at least one word of
    * `minLongChars`+ characters, and re-join the survivors. The rules are
    * the shape of C4's "3+ words, ends in punctuation" line filters; the
    * plumbing (segment → per-line predicate → rejoin, all inside one row)
    * is exactly what a newline-delimited 100 TB corpus needs — a pure
    * projection with no shuffle. */
  def lineFilter(documents: DataFrame, lineLen: Int = 8,
      minWords: Int = 5, minLongChars: Int = 4): DataFrame = {
    val ws = words(col("text"))
    val t = documents.select(col("doc_id"), ws.as("w"))
      .transform(Partitioning.spread(_, col("doc_id")))
    val lines = transform(
      sequence(lit(1), size(col("w")), lit(lineLen)),
      i => slice(col("w"), i, lit(lineLen)))
    val kept = filter(lines, l =>
      size(l) >= minWords && exists(l, wd => length(wd) >= minLongChars))
    t.select(
      col("doc_id"),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      (size(kept).cast("double") / size(lines)).as("kept_ratio"),
      array_join(transform(kept, l => array_join(l, " ")), " | ")
        .as("kept_text"))
  }

  /** Character-diversity signals (x13): distinct-character count, Rényi-2
    * collision probability (Σp²), and max-character frequency — the
    * gibberish/low-entropy detector of a quality pipeline. Deliberately
    * AVOIDS log-based Shannon entropy: Σcnt² and max(cnt) are exact
    * integers and the two final divisions are single double ops, so values
    * are bit-identical across engines, where `ln` differs by ulps between
    * libm implementations.
    *
    * Plan shape at 100 TB: one narrow projection — the per-row stats come
    * from the one-pass native kernel
    * ([[graft.functions.CharDiversityStats]]); the explode/groupBy twin
    * below would shuffle a row PER CHARACTER. Docs with zero countable
    * characters are filtered to match the reference shape (their explode
    * emits nothing). */
  def charDiversity(documents: DataFrame): DataFrame = {
    val stats = org.apache.spark.sql.graftinternal.Bridge.column(
      graft.functions.CharDiversityStats(
        org.apache.spark.sql.graftinternal.Bridge.expression(col("text"))))
    documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), stats.as("st"))
      .filter(col("st.n_chars") > 0)
      .select(
        col("doc_id"),
        col("st.n_chars").as("n_chars_counted"),
        col("st.n_distinct").as("n_distinct_chars"),
        (col("st.sum_sq").cast("double") /
          (col("st.n_chars") * col("st.n_chars"))).as("collision_prob"),
        (col("st.max_cnt").cast("double") / col("st.n_chars"))
          .as("max_char_frac"))
  }

  /** Explode/groupBy formulation of [[charDiversity]] — the portable form
    * the DuckDB oracle mirrors, kept as the bit-equality reference. */
  private[graft] def charDiversityReference(documents: DataFrame): DataFrame = {
    val chars = documents
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("."), lit(0))).as("ch"))
    val perChar = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
    perChar.groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("cnt") * col("cnt")).as("s2"),
        max(col("cnt")).as("mx"))
      .select(
        col("doc_id"),
        col("n").as("n_chars_counted"),
        col("n_distinct_chars"),
        (col("s2").cast("double") / (col("n") * col("n")))
          .as("collision_prob"),
        (col("mx").cast("double") / col("n")).as("max_char_frac"))
  }

  /** The synthetic URL both engines attach to each document (the corpus has
    * no URL column): scheme/host casing, a default port, `www.`, tracking
    * params, and a fragment — every case the normalizer must handle. */
  def withSyntheticUrl(docId: Column, source: Column): Column = concat(
    when(pmod(docId, lit(2)) === 0, "HTTPS://WWW.").otherwise("http://"),
    source, lit(".Example.COM"),
    when(pmod(docId, lit(2)) === 0, ":443").otherwise(""),
    lit("/p/"), pmod(docId, lit(7)).cast("string"),
    lit("?utm_source=feed&id="), pmod(docId, lit(13)).cast("string"),
    when(pmod(docId, lit(3)) === 0, "&utm_campaign=x").otherwise(""),
    lit("#sec"))

  /** URL normalization + domain extraction (x14): lowercase scheme and
    * host, strip default ports / `www.` / `utm_*` tracking params / the
    * fragment, and surface the registered domain — the canonical key for
    * URL-level dedup and per-site aggregation in a crawl pipeline. Pure
    * regexp/array projection, no shuffle. */
  def urlNormalize(documents: DataFrame): DataFrame = {
    val docs = documents
      .select(col("doc_id"),
        withSyntheticUrl(col("doc_id"), col("source")).as("url"))
      .transform(Partitioning.spread(_, col("doc_id")))
    val u = col("url")
    val (scheme, host, _, _) = urlParts(u)
    val hostParts = split(host, "\\.")
    docs.select(
      col("doc_id"),
      u.as("url"),
      scheme.as("scheme"),
      host.as("host"),
      array_join(slice(hostParts, size(hostParts) - 1, lit(2)), ".")
        .as("registered_domain"),
      normUrl(u).as("norm_url"))
  }

  /** (scheme, host, path, kept-query) of a raw URL column — the pieces the
    * normalizer is built from, shared by x14 and the URL-level dedup d14. */
  private[operators] def urlParts(u: Column)
      : (Column, Column, Column, Column) = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      lower(regexp_replace(
        regexp_extract(u, "^[A-Za-z]+://([^/?#]+)", 1),
        ":[0-9]+$", "")),
      "^www\\.", "")
    val path = regexp_extract(u, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val keptParams = filter(
      split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => !p.startsWith("utm_"))
    (scheme, host, path, array_join(keptParams, "&"))
  }

  /** Canonical form of a raw URL column: lowercased scheme/host, default
    * port / `www.` / `utm_*` params / fragment stripped. */
  def normUrl(u: Column): Column = {
    val (scheme, host, path, normQuery) = urlParts(u)
    concat(scheme, lit("://"), host, path,
      when(normQuery === "", "").otherwise(concat(lit("?"), normQuery)))
  }

  /** Model-scoring seam: run an expensive text scorer (quality classifier,
    * perplexity model, toxicity head) over the corpus with the MODEL LOADED
    * ONCE PER PARTITION, not per row — the same amortization seam
    * [[Multimodal]] uses for codecs. `makeScorer` is the model load; it
    * runs inside `mapPartitions` on the executor, so nothing
    * non-serializable crosses the driver boundary and partition count is
    * the concurrency knob for model memory.
    *
    * Typed `mapPartitions` is deliberately opaque to Catalyst (like every
    * model call); keep it LAST in the plan after filters/projections have
    * pruned the scan — the scored frame joins back on doc_id. */
  def scoreWithModel(documents: DataFrame,
      makeScorer: () => String => Double): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val scorer = makeScorer()
        it.map { case (id, text) => (id, scorer(text)) }
      }
      .toDF("doc_id", "model_score")
  }

  /** Zipf head of the corpus vocabulary (x16): the `k` most frequent
    * tokens with rank, count, running count, and running share of the
    * token stream — the curve a corpus-health check reads to spot
    * boilerplate floods (too-heavy head) or tokenizer bugs (too-flat).
    *
    * Global token counts aggregate with map-side combine; the head is a
    * TakeOrdered top-k (no full sort), and the running totals are a window
    * over only those k rows — so nothing global-single-task touches the
    * corpus itself. The share divides two exact longs in double, identical
    * in both engines. */
  def tokenZipf(documents: DataFrame, k: Int = 100): DataFrame = {
    // counts feeds both the total scalar and the top-k head — persist for
    // the duration of the call so the corpus token stream is aggregated
    // once, not once per consumer (tfidf precedent; exchange reuse is
    // unreliable under AQE for these shapes)
    val counts = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(explode(words(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    Caching.withPersisted(counts) {
      val total = counts.agg(sum(col("cnt")).as("total"))
      val W = org.apache.spark.sql.expressions.Window
      val order = Seq(col("cnt").desc, col("tok").asc)
      // constant partition key: the windows run over the k-row Zipf head
      // (TakeOrdered output), single-partition by design
      val w = W.partitionBy(lit(0)).orderBy(order: _*)
        .rowsBetween(W.unboundedPreceding, 0)
      counts.orderBy(order: _*).limit(k)
        .crossJoin(broadcast(total))
        .select(
          row_number().over(W.partitionBy(lit(0)).orderBy(order: _*))
            .as("rank"),
          col("tok"), col("cnt"),
          sum(col("cnt")).over(w).as("cum_cnt"),
          (sum(col("cnt")).over(w).cast("double") / col("total"))
            .as("cum_share"))
    }
  }

  /** Feature hashing (x15): the hashing-trick bag-of-words — every token
    * maps to one of `buckets` indices via the shared portable hash, and the
    * per-doc bucket counts ARE the fixed-width sparse feature vector (the
    * collision-tolerant vectorization classic linear classifiers and
    * fastText-style models train on, no vocabulary pass needed).
    *
    * Long-form output (doc_id, bucket, tf): explode → one hash aggregate
    * keyed (doc_id, bucket) with map-side combine, so shuffle rows are
    * bounded by docs × buckets regardless of document length. No vocab
    * broadcast, no driver state — the hash IS the vocabulary. */
  def featureHash(documents: DataFrame, buckets: Int = 64): DataFrame =
    documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), explode(words(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(PortableHash.hash28("fh:", col("tok")), lit(buckets))
          .as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))

  /** TF-IDF top-k terms per document (x7). IDF is the rational form
    * `N / df` (one double division, no transcendental) so the score is
    * bit-identical across engines; the re-rank goes through the heap-based
    * [[graft.plans.TopK.perKey]] operator instead of a full per-doc sort.
    *
    * Plan shape at 100 TB: explode is narrow; the (doc, term) term-frequency
    * aggregate and the document-frequency aggregate both benefit from
    * map-side partial aggregation, which absorbs the stopword hot keys
    * before the shuffle; the tf⋈df join shuffles on term where AQE's skew
    * splitting handles the residual head terms; the corpus-size scalar is a
    * broadcast. The tf frame feeds both df and the join, so it is persisted
    * for the duration of the call (Caching bracket). */
  def tfidf(documents: DataFrame, k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val tf = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    Caching.withPersisted(tf) {
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = documents.agg(count(lit(1)).as("n_docs"))
      val scored = tf
        .join(df, Seq("term"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          (col("tf") * (col("n_docs").cast("double") / col("df")))
            .as("tfidf"))
      val top = graft.plans.TopK.perKey(scored, Seq(col("doc_id")),
        Seq(col("tfidf").desc, col("term")), k)
      top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))))
    }
  }

  /** Per-source hapax-legomena report (x40): how much of each source's
    * vocabulary occurs exactly ONCE in the whole corpus — the classic
    * lexical-richness / noise gauge (a source whose hapax share is far
    * above its peers is usually OCR debris, random ids, or genuinely
    * novel vocabulary — either way, the place token-budget and quality
    * gates look first), and the corpus-frequency tail readout next to
    * x7's head (tf-idf) and x16's Zipf slope. A hapax is counted in the
    * one source that contains it, so per-source hapax counts partition
    * the corpus-wide hapax set exactly.
    *
    * Scale shape: token explode → map-side-combined (source, term) and
    * corpus term counts off ONE persisted token frame, then a join on
    * term (vocabulary-sized, AQE handles the stopword head) and a
    * per-source fold — output is |sources| rows. Integers until the
    * final share division (exact small ints over doubles). */
  def hapaxBySource(documents: DataFrame): DataFrame = {
    val toks = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("source"), explode(words(col("text"))).as("term"))
    Caching.withPersisted(toks) {
      val cf = toks.groupBy(col("term")).agg(count(lit(1)).as("cf"))
      val st = toks.groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("n"))
      st.join(cf, Seq("term"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("cf") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("n_hapax"),
          (col("n_hapax").cast("double") / col("n_types").cast("double"))
            .as("hapax_share"))
    }
  }

  /** Per-language n-gram profile (x20): the top-k bigrams of each language
    * by corpus frequency — the reference profile an n-gram language
    * identifier is trained against (x2 consumes exactly this artifact
    * shape), and the per-group twin of the corpus-level Zipf head (x16).
    * Token-scale explode → map-side-combined (lang, bigram) counts → the
    * heap [[graft.plans.TopK.perKey]] per language, so the shuffle after
    * the count is #distinct-bigrams wide and the final frame is
    * #langs × k rows. */
  def langNgramProfile(documents: DataFrame, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val ws = words(col("text"))
    val m = size(ws) - 1
    val bigrams = zip_with(slice(ws, lit(1), m), slice(ws, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
    val counts = documents
      .filter(size(ws) >= 2)
      .select(col("lang"), explode(bigrams).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
    val top = graft.plans.TopK.perKey(counts, Seq(col("lang")),
      Seq(col("cnt").desc, col("bigram")), k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("bigram"))))
  }

  /** Trained language-ID evaluation (x24): the x20 profiles turned into a
    * CLASSIFIER and scored in-engine — train/eval split by doc_id hash
    * parity (train = doc_id % 3 ≠ 0), per-language top-`k` bigram
    * profiles from the train side only, every eval doc predicted as the
    * language whose profile it hits most (distinct-bigram hits; ties →
    * lexicographic language; zero hits anywhere → "und"), output the
    * confusion matrix (lang, pred_lang, n_docs). The eval harness the
    * heuristic x2 never had: a reviewer reads per-language recall off the
    * diagonal, and the matrix recomputes on every corpus snapshot.
    *
    * Scale: profiles are langs·k rows (broadcast); eval docs explode to
    * DISTINCT bigram rows, hit the profile with a broadcast join, and
    * reduce per (doc, lang) — work scales with eval tokens, never
    * corpus². The argmax is the heap top-k (k=1). */
  def langIdEval(documents: DataFrame, k: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val ws = words(col("text"))
    val m = size(ws) - 1
    val bigrams = zip_with(slice(ws, lit(1), m), slice(ws, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
    val train = documents.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val eval_ = documents.filter(pmod(col("doc_id"), lit(3)) === 0)
    val profile = graft.plans.TopK.perKey(
      train
        .filter(size(ws) >= 2)
        .select(col("lang").as("plang"), explode(bigrams).as("bigram"))
        .groupBy(col("plang"), col("bigram"))
        .agg(count(lit(1)).as("cnt")),
      Seq(col("plang")), Seq(col("cnt").desc, col("bigram")), k)
      .select(col("plang"), col("bigram"))
    val evalBigrams = eval_
      .filter(size(ws) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(bigrams)).as("bigram"))
    val hits = evalBigrams
      .join(broadcast(profile), Seq("bigram"))
      .groupBy(col("doc_id"), col("lang"), col("plang"))
      .agg(count(lit(1)).as("hits"))
    val best = graft.plans.TopK.perKey(hits, Seq(col("doc_id")),
        Seq(col("hits").desc, col("plang")), 1)
      .select(col("doc_id"), col("lang"), col("plang"))
    // zero-hit docs (nothing joined) fall out of `hits`: restore as "und"
    val undecided = eval_.select(col("doc_id"), col("lang"))
      .join(best.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), lit("und").as("plang"))
    best.unionByName(undecided)
      .groupBy(col("lang"), col("plang").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Code-switch / mixed-language detection (x32): classify each HALF of
    * a document independently against the x20/x24-style per-language
    * bigram profiles and flag documents whose halves disagree — the
    * mixed-language signal doc-level language ID structurally cannot see
    * (a 50/50 en/fr spam page argmaxes to one language with full
    * confidence; its halves disagree loudly). Halves below 2 words or
    * with zero profile hits classify as "und" and never flag.
    *
    * Scale shape: profile training is one vocabulary-sized aggregate +
    * heap top-k per language (the x24 path); classification explodes each
    * half's DISTINCT bigrams against the broadcast profile and argmaxes
    * per (doc, half) on the heap operator — corpus-linear, no shuffle
    * beyond the (doc, half) aggregate. */
  def codeSwitch(documents: DataFrame, k: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val ws = words(col("text"))
    def bigramsOf(arr: Column): Column =
      zip_with(slice(arr, lit(1), size(arr) - 1),
        slice(arr, lit(2), size(arr) - 1),
        (a, b) => concat(a, lit(" "), b))
    val profile = graft.plans.TopK.perKey(
      documents
        .filter(size(ws) >= 2)
        .select(col("lang").as("plang"), explode(bigramsOf(ws)).as("bigram"))
        .groupBy(col("plang"), col("bigram"))
        .agg(count(lit(1)).as("cnt")),
      Seq(col("plang")), Seq(col("cnt").desc, col("bigram")), k)
      .select(col("plang"), col("bigram"))
    val nFront = floor(size(ws) / 2).cast("int")
    val halves = documents
      .select(col("doc_id"),
        posexplode(array(
          slice(ws, lit(1), nFront),
          slice(ws, nFront + 1, size(ws) - nFront))).as(Seq("half", "hw")))
      .filter(size(col("hw")) >= 2)
      .select(col("doc_id"), col("half"),
        explode(array_distinct(bigramsOf(col("hw")))).as("bigram"))
    val hits = halves
      .join(broadcast(profile), Seq("bigram"))
      .groupBy(col("doc_id"), col("half"), col("plang"))
      .agg(count(lit(1)).as("hits"))
    val best = graft.plans.TopK.perKey(hits,
        Seq(col("doc_id"), col("half")),
        Seq(col("hits").desc, col("plang")), 1)
      .select(col("doc_id"), col("half"), col("plang"))
    val front = best.filter(col("half") === 0)
      .select(col("doc_id"), col("plang").as("lang_front"))
    val back = best.filter(col("half") === 1)
      .select(col("doc_id"), col("plang").as("lang_back"))
    documents.select(col("doc_id"), col("lang"))
      .join(front, Seq("doc_id"), "left_outer")
      .join(back, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"),
        coalesce(col("lang_front"), lit("und")).as("lang_front"),
        coalesce(col("lang_back"), lit("und")).as("lang_back"))
      .withColumn("switched",
        col("lang_front") =!= lit("und") &&
          col("lang_back") =!= lit("und") &&
          col("lang_front") =!= col("lang_back"))
  }

  /** Bigram language-model fluency scoring (x17): train an add-one-smoothed
    * bigram LM on the corpus itself and score every document by its average
    * bigram log-probability — the CCNet/KenLM-style quality signal ("does
    * this doc read like the corpus?") with the model reduced to count
    * tables. p(w2|w1) = (c(w1 w2) + 1) / (ctx(w1) + V), where ctx(w1) is
    * w1's occurrence count as a bigram context and V the number of distinct
    * contexts — both derived from the SAME exploded bigram stream, so the
    * corpus is tokenized exactly once (persisted across the three
    * aggregates). Docs under 2 tokens have no bigrams and are excluded.
    *
    * Determinism: each bigram's log-probability is rounded to 5 decimals
    * and summed through DECIMAL, so the per-doc average is independent of
    * partition order and of sub-ulp libm differences between engines.
    *
    * 100 TB shape: the bigram explode is a narrow map; both count tables
    * partial-aggregate map-side before their shuffles; scoring is two
    * equi-joins on (bigram, w1) — co-partitioned shuffles whose width is
    * the corpus token count, never all-pairs; the vocab scalar broadcasts.
    * At trillion-token scale the count tables themselves stay distributed
    * (no driver collect anywhere). */
  /** Character-level Shannon entropy (x21): H = ln(n) − Σ cnt·ln(cnt) / n
    * over the per-doc character histogram — the direct gibberish /
    * compression-proxy signal next to x13's exact-arithmetic diversity
    * ratios. Transcendental terms follow x17's grid recipe: ln of each
    * INTEGER count rounds to 5 decimals and sums through DECIMAL, so the
    * result is partition-order independent and engine-exact. Char explode
    * is a narrow map into a map-side-combined (doc, char) count whose
    * roll-up is a doc-keyed aggregate — no state beyond the histogram.
    *
    * BMP-only "character" unit: `split(text, "")` yields UTF-16 code
    * units, so a supplementary-plane codepoint (emoji, rare CJK) counts as
    * its two surrogate halves, while the DuckDB twin's substr iterates
    * codepoints. The engine-exact parity contract therefore holds for BMP
    * text (all corpora here are ASCII); a codepoint-exact variant would
    * histogram on a codepoint-safe splitter at the cost of re-pinning the
    * oracle. Both surrogate halves of one codepoint land in the SAME doc's
    * histogram, so the entropy remains a deterministic, monotone gibberish
    * signal even off-BMP — only cross-engine parity narrows. */
  def charEntropy(documents: DataFrame): DataFrame = {
    val cnts = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
    val lc = round(log(col("cnt").cast("double")), 5)
      .cast(org.apache.spark.sql.types.DecimalType(18, 6))
    cnts.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_chars"),
        sum(col("cnt") * lc).as("clog_sum"))
      .select(col("doc_id"), col("n_chars"),
        (round(log(col("n_chars").cast("double")), 5)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).cast("double")
          - col("clog_sum").cast("double") / col("n_chars"))
          .as("entropy_nats"))
  }

  /** PMI collocation mining (x29): the top-k word bigrams by pointwise
    * mutual information, PMI(a,b) = ln(p(ab)) − ln(p(a)) − ln(p(b)) with
    * p(ab) = c_ab/B and p(w) = c_w/N over exact corpus counts — the
    * phrase-mining primitive behind tokenizer vocabulary construction
    * (SentencePiece/WordPiece seed phrases), stopword-free keyphrase
    * extraction, and collocation-aware text normalization. A minimum
    * pair-count floor keeps the head statistical (a hapax pair of two
    * hapax words has sky-high PMI and zero evidence — the classic PMI
    * pathology).
    *
    * Engine-exact recipe (x17/x21/x23 precedent): every term is
    * L(count) = ln rounded to 5 dp as DECIMAL(18,6) of an exact integer
    * count, and PMI = ((((L(c_ab) − L(B)) − L(c_a)) + L(N)) − L(c_b)) +
    * L(N) is exact decimal addition — bit-stable across engines, cast to
    * double only on output.
    *
    * Scale shape: two corpus-wide aggregates off one persisted bigram
    * explode (pair counts keyed by bigram, unigram counts keyed by word —
    * both vocabulary-sized, both with map-side partial aggregation), two
    * vocabulary-sized equi-joins, 1-row scalar totals broadcast, and a
    * TakeOrderedAndProject head. Nothing scales with corpus size except
    * the scan and the pre-aggregated explode. */
  def pmiCollocations(documents: DataFrame, k: Int = 50,
      minPairCount: Long = 5L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def l(c: Column): Column =
      round(log(c.cast("double")), 5).cast(DecimalType(18, 6))
    val ws = words(col("text"))
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (x, y) => concat(x, lit(" "), y))
    val toks = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), explode(words(col("text"))).as("tok"))
    val docBi = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(size(ws) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bigram"))
    Caching.withPersisted(toks, docBi) {
      val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cw"))
      val nTot = toks.agg(count(lit(1)).as("n_total"))
      val bi = docBi.groupBy(col("bigram")).agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= minPairCount)
      val bTot = docBi.agg(count(lit(1)).as("b_total"))
      val pmiDec =
        l(col("cab")).minus(l(col("b_total"))).minus(l(col("ca")))
          .plus(l(col("n_total"))).minus(l(col("cb")))
          .plus(l(col("n_total")))
      bi
        .withColumn("w1", substring_index(col("bigram"), " ", 1))
        .withColumn("w2", substring_index(col("bigram"), " ", -1))
        .join(uni.withColumnRenamed("tok", "w1")
          .withColumnRenamed("cw", "ca"), Seq("w1"))
        .join(uni.withColumnRenamed("tok", "w2")
          .withColumnRenamed("cw", "cb"), Seq("w2"))
        .crossJoin(broadcast(nTot))
        .crossJoin(broadcast(bTot))
        .select(col("w1"), col("w2"), col("cab"), col("ca"), col("cb"),
          pmiDec.cast("double").as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(k)
    }
  }

  /** Per-source quality-score quantiles (x33): the ⌈p·n⌉-th order
    * statistics of the x3 quality score per source — the distribution
    * SHAPE next to [[graft.operators.Curation.sourceReport]]'s means
    * (two sources with equal mean quality and wildly different spreads
    * need different curation thresholds; the mean cannot see that).
    * The [[graft.operators.Temporal.groupQuantiles]] exact-rank recipe
    * applied to a derived score: one rank window keyed by source, a
    * broadcast (source × p) target table, binary-exact p literals. */
  def qualityQuantiles(documents: DataFrame,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val scored = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), col("source"),
        qualityScoreExpr(col("text")).as("qs"))
    Caching.withPersisted(scored) {
      val counts = scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
      val targets = counts
        .select(col("source"), explode(typedlit(ps)).as("p"), col("n"))
        .select(col("source"), col("p"),
          ceil(col("p") * col("n")).cast("long").as("rnk"))
      val ranked = scored
        .withColumn("rnk", row_number().over(
          W.partitionBy(col("source")).orderBy(col("qs"), col("doc_id"))))
      ranked.join(broadcast(targets), Seq("source", "rnk"))
        .select(col("source"), col("p"), col("qs").as("q_value"))
    }
  }

  /** Corpus-order novelty attribution (x30): for every word-3-shingle,
    * the document that INTRODUCES it is the one with the smallest doc_id
    * (ingest order); a document's novelty is the fraction of its shingles
    * it introduces. The dedup family (d2/d4/d26) scores pairwise
    * similarity; novelty is the complementary CORPUS-LEVEL signal — a doc
    * can evade every pairwise detector by copying 30 sources a little
    * (novelty near 0, no single pair above threshold), and memorization
    * audits rank exactly this "nothing here is new" tail. Dually, the
    * per-source mean of `novelty` is the freshness gauge mixture
    * governance wants next to x23's KL.
    *
    * Scale shape: one shingle explode → min-aggregate keyed by shingle
    * (map-side partial min), join back, one per-doc aggregate — two
    * bounded shuffles, no self-join, no candidate blowup; the introducer
    * table is the corpus's distinct-shingle table, the same cardinality
    * every sketch in this library already aggregates over. */
  def noveltyScore(documents: DataFrame): DataFrame = {
    val tok = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), explode(shingles(col("text"))).as("g"))
    Caching.withPersisted(tok) {
      val intro = tok.groupBy(col("g")).agg(min(col("doc_id")).as("introducer"))
      tok.join(intro, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("introducer") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_shingles")).as("novelty"))
    }
  }

  /** Vocabulary-growth curve (x31): cumulative distinct word types vs
    * cumulative tokens along ingest order, reported per `bucketDocs`-doc
    * bucket — the empirical Heaps'-law curve (V ≈ K·Nᵝ). A flattening
    * curve says the crawl is exhausting its domain (more tokens, no new
    * vocabulary — diminishing returns for training); a kink upward marks
    * a new source or language entering the mix. Complements [[
    * noveltyScore]] (x30, per-doc shingle novelty) with the corpus-level
    * word trajectory.
    *
    * Scale shape: each word's INTRODUCING bucket is a min-aggregate
    * (map-side partial), token mass a per-bucket count — two bounded
    * shuffles over vocabulary/bucket cardinality. Only the final running
    * sum runs in a single-partition window, over the BUCKET table
    * (corpus_docs / bucketDocs rows — hundreds, not billions), the same
    * bounded-report contract as every governance query here. */
  def vocabGrowth(documents: DataFrame, bucketDocs: Long = 100L): DataFrame = {
    val toks = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    Caching.withPersisted(toks) {
      val tokMass = toks
        .groupBy(floor(col("doc_id") / bucketDocs).as("bucket"))
        .agg(count(lit(1)).as("n_tokens"))
      val newTypes = toks
        .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
        .groupBy(floor(col("first_doc") / bucketDocs).as("bucket"))
        .agg(count(lit(1)).as("n_new_types"))
      val W = org.apache.spark.sql.expressions.Window
      // constant partition key: the running sum covers the per-bucket
      // summary (corpus_docs / bucketDocs rows), single-partition by design
      val run = W.partitionBy(lit(0)).orderBy(col("bucket"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      tokMass.join(newTypes, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(run))
        .withColumn("cum_types", sum(col("n_new_types")).over(run))
    }
  }

  /** Per-source vocabulary divergence (x23): KL(source ‖ corpus) over
    * unigram distributions, in nats — the domain-shift gauge for mixture
    * governance: a source whose vocabulary drifts from the corpus (new
    * spam template, language leak, format change) shows a KL jump long
    * before aggregate quality scores move. Complements [[Curation
    * .qualityDrift]] (c20, score distributions) with a CONTENT
    * distribution.
    *
    * Engine-exact recipe (x17/x21 precedent): with c_sw/c_w the exact
    * per-source/corpus counts, KL decomposes to
    * `Σ c_sw·(L(c_sw) − L(c_w)) / n_s − L(n_s) + L(N)` where L = ln
    * rounded to 5 dp and carried as DECIMAL(18,6) — every product and sum
    * is exact decimal (order-independent), only the final three-term
    * combination runs in double, in fixed left-to-right order. Joins are
    * (source,word)⋈(word) off one persisted token explode — the
    * co-partitioned two-aggregate family, shuffle bounded by vocabulary,
    * not corpus size. */
  def sourceDivergence(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def l(c: Column): Column =
      round(log(c.cast("double")), 5).cast(DecimalType(18, 6))
    val toks = documents
      .select(col("source"), explode(words(col("text"))).as("tok"))
    Caching.withPersisted(toks) {
      val sw = toks.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("csw"))
      val w = toks.groupBy(col("tok")).agg(count(lit(1)).as("cw"))
      val n = toks.agg(count(lit(1)).as("nn"))
      sw.join(w, "tok")
        .select(col("source"), col("csw"),
          (col("csw") * (l(col("csw")) - l(col("cw")))).as("term"))
        .groupBy(col("source"))
        .agg(
          sum(col("csw")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("term")).as("term_sum"))
        .crossJoin(broadcast(n))
        .select(col("source"), col("n_tokens"), col("n_types"),
          (col("term_sum").cast("double") / col("n_tokens")
            - l(col("n_tokens")).cast("double")
            + l(col("nn")).cast("double")).as("kl_nats"))
    }
  }

  /** Unigram lexical-diversity profile (x22): per-document type/token
    * ratio, hapax-legomena fraction, and top-token dominance — the
    * vocabulary-richness axis of quality filtering. `tokenStats` (x1)
    * counts tokens, `repetitionSignals` (x8) measures n≥2-gram phrase
    * reuse; this measures single-token concentration: machine-generated
    * and template text shows low TTR and high dominance long before its
    * n-grams literally repeat.
    *
    * Two hash aggregates: (doc, token) counts with map-side partial
    * aggregation (the explode never shuffles raw text — only token rows),
    * then per-doc rollup. Ratios are IEEE double divisions of exact
    * longs, bit-identical across engines and partitionings. */
  def lexicalDiversity(documents: DataFrame): DataFrame = {
    val counts = documents
      .select(col("doc_id"), explode(words(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax_types"),
        max(col("c")).as("max_count"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_types"),
        col("hapax_types"), col("max_count"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (col("hapax_types").cast("double") / col("n_types"))
          .as("hapax_frac"),
        (col("max_count").cast("double") / col("n_tokens"))
          .as("dominance"))
  }

  /** Per-source character-class / encoding-sanity profile (x35): counts
    * of lowercase, uppercase, digit and space characters per source with
    * their fractions, plus the two encoding red flags an ingest gate
    * watches — C0 control bytes and U+FFFD replacement characters (the
    * mojibake signature of a mis-declared charset: a decoder that hit
    * invalid bytes leaves FFFD droppings; raw control bytes mean the
    * "text" was never text). Healthy prose has zero of either, so any
    * nonzero count localizes a broken decode to its feed.
    *
    * Counting is length-differencing against a class-stripped copy —
    * the regex classes are plain byte ranges that mean the same thing to
    * every engine. All counts are exact integers map-side-combined per
    * source; only the final fractions divide. No shuffle beyond the
    * #sources-cardinality aggregate. */
  def charClassProfile(documents: DataFrame): DataFrame = {
    def stripped(pattern: String): Column =
      length(col("text")) - length(regexp_replace(col("text"), pattern, ""))
    val profiled = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("source"),
        length(col("text")).cast("long").as("n"),
        stripped("[a-z]").cast("long").as("lo"),
        stripped("[A-Z]").cast("long").as("up"),
        stripped("[0-9]").cast("long").as("di"),
        stripped(" ").cast("long").as("sp"),
        stripped("[\\x00-\\x1f]").cast("long").as("ctl"),
        stripped("\\uFFFD").cast("long").as("rep"))
    profiled
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_chars"),
        sum(col("lo")).as("n_lower"),
        sum(col("up")).as("n_upper"),
        sum(col("di")).as("n_digit"),
        sum(col("sp")).as("n_space"),
        sum(col("ctl")).as("n_control"),
        sum(col("rep")).as("n_replacement"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        col("n_lower"), col("n_upper"), col("n_digit"), col("n_space"),
        col("n_control"), col("n_replacement"),
        (col("n_lower").cast("double") / col("n_chars")).as("lower_frac"),
        (col("n_space").cast("double") / col("n_chars")).as("space_frac"),
        ((col("n_control") + col("n_replacement")) > 0L)
          .as("encoding_suspect"))
  }

  /** Vocabulary coverage curve (x36): what fraction of the corpus token
    * mass the top-N vocabulary covers, for the candidate vocabulary
    * sizes a tokenizer design weighs — the OOV-budget number read
    * together with the Zipf head (x16) and OOV gauge (x9): coverage at
    * N IS 1 − OOV-rate of an N-word vocabulary.
    *
    * Scale shape: token counts map-side combine; the top-max(N) head
    * arrives via TakeOrdered (distributed heap, never a global sort);
    * ranking then runs single-partition over that bounded head only.
    * Counts stay exact longs until the one division per output row. */
  def vocabCoverage(documents: DataFrame,
      ns: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    val counts = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(explode(words(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    Caching.withPersisted(counts) {
      val total = counts.agg(sum(col("cnt")).as("total_tokens"))
      val order = Seq(col("cnt").desc, col("tok").asc)
      val W = org.apache.spark.sql.expressions.Window
      // constant partition key: ranks cover the max(ns)-row head only
      val head = counts.orderBy(order: _*).limit(ns.max)
        .withColumn("rank",
          row_number().over(W.partitionBy(lit(0)).orderBy(order: _*)))
      head
        .select(explode(typedlit(ns)).as("n_vocab"), col("rank"),
          col("cnt"))
        .filter(col("rank") <= col("n_vocab"))
        .groupBy(col("n_vocab"))
        .agg(sum(col("cnt")).as("covered_tokens"))
        .crossJoin(broadcast(total))
        .select(col("n_vocab"), col("covered_tokens"), col("total_tokens"),
          (col("covered_tokens").cast("double") / col("total_tokens"))
            .as("coverage"))
    }
  }

  /** Cross-document duplicate n-gram mass per source (x41): of each
    * source's distinct-per-doc word-3-gram occurrences, how many are
    * shingles that appear in MORE THAN ONE document corpus-wide — the
    * "dedup pressure" gauge next to d16's dropped-mass report. x8/x18
    * measure WITHIN-doc repetition; d11 measures pairwise SOURCE overlap
    * by sketch; this is the per-source scalar that says how much of the
    * source's n-gram surface is shared text (syndication, boilerplate,
    * crawl echoes) before any dedup decision is made — the number that
    * predicts how hard d2/d8 will hit a source.
    *
    * Scale shape: one shingle explode (the d2 cost, off one persisted
    * token frame), a map-side-combined per-shingle doc count, a join
    * back on the shingle key (the SAME key the count shuffled on — one
    * partitioning reused), then a |sources|-row fold; the affected-doc
    * count is an exact distinct on (source, doc) pairs that survive the
    * cnt>1 filter — O(duplicated surface), not O(corpus). Integers
    * until the final share division. */
  def crossDocNgrams(documents: DataFrame): DataFrame = {
    val u = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), col("source"),
        explode(shingles(col("text"))).as("sh"))
    Caching.withPersisted(u) {
      val cnt = u.groupBy(col("sh")).agg(count(lit(1)).as("nd"))
      val perSrc = u.join(cnt, Seq("sh"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_shingles"),
          countDistinct(when(col("nd") > 1, col("doc_id")))
            .as("n_docs_affected"))
      documents.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .join(perSrc, Seq("source"), "left_outer")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_dup_shingles"), lit(0L)).as("n_dup_shingles"),
          coalesce(col("n_docs_affected"), lit(0L)).as("n_docs_affected"),
          when(coalesce(col("n_shingles"), lit(0L)) > 0,
            col("n_dup_shingles").cast("double") /
              col("n_shingles").cast("double"))
            .otherwise(lit(0.0)).as("dup_frac"))
    }
  }
}
