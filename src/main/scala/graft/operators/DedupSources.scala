package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source duplicate analytics — the d6/d11/d29/d30/d32/d37 family
  * (trend buckets, syndication, within-vs-cross-source splits, source
  * sketches/overlap) over the d30 opening-fingerprint identity. Split
  * out of Dedup.scala in round 12 to keep every main file under 1,500
  * lines (zero behavior change; bodies byte-identical). */
object DedupSources {


  /** Duplication-rate trend (d29): exact-duplicate fraction per
    * `bucketDocs`-doc ingest bucket — a doc counts as a duplicate when its
    * content hash was first seen in an EARLIER doc ([[exactDedup]]'s
    * keep-minimum rule read as a time series). The governance curve next
    * to [[LlmText.vocabGrowth]]: a crawl whose dup_frac climbs bucket
    * over bucket is re-fetching what it already has (frontier collapse,
    * syndication storm), visible long before corpus-total dedup numbers
    * move. One hash aggregate + one join + one bucket aggregate —
    * the x30/x31 introducer shape at whole-doc granularity. */
  def dupTrend(documents: DataFrame, bucketDocs: Long = 100L): DataFrame =
    dupTrendFromFingerprints(dupFingerprints(documents), bucketDocs)

  /** ONE text scan computing both duplication fingerprints — the full-text
    * hash [[dupTrend]] buckets on AND the opening-words hash
    * [[syndication]] pairs on: (doc_id, source, full_h, head_h). The
    * governance report (tools/DataCard) persists this once and feeds both
    * sections from it, instead of re-scanning (and re-hashing) the corpus
    * per section — at 100 TB the text scan IS the cost and everything
    * downstream is hash-sized. */
  def dupFingerprints(documents: DataFrame, headWords: Int = 8): DataFrame = {
    // trend-only corpora may carry no source column; syndication needs it,
    // but the shared pass shouldn't force it on every caller
    val src =
      if (documents.columns.contains("source")) col("source")
      else lit(null).cast("string")
    documents.select(col("doc_id"), src.as("source"),
      md5(col("text").cast("binary")).as("full_h"),
      md5(array_join(
        slice(LlmText.words(col("text")), 1, headWords), " ")
        .cast("binary")).as("head_h"))
  }

  /** [[dupTrend]]'s body over a precomputed [[dupFingerprints]] frame. */
  def dupTrendFromFingerprints(fp: DataFrame,
      bucketDocs: Long = 100L): DataFrame = {
    val h = fp.select(col("doc_id"), col("full_h").as("h"))
    val first = h.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    h.join(first, "h")
      .groupBy(floor(col("doc_id") / bucketDocs).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("first_doc"), 1L).otherwise(0L))
          .as("n_dup_docs"))
      .select(col("bucket"), col("n_docs"), col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_docs")).as("dup_frac"))
  }

  /** Cross-source syndication matrix (d30): for every source pair, how
    * many EXACT-duplicate document pairs straddle it and how many distinct
    * texts they share — the content-level "who republishes whom" table
    * next to [[sourceOverlap]]'s approximate shingle-sketch estimate (d11
    * answers "similar vocabulary?", this answers "literally the same
    * documents?"). The shared key is the md5 of the OPENING `headWords`
    * words — the headline fingerprint real syndication shares even when
    * feeds append their own boilerplate tails; set `headWords` large to
    * approach exact-text matching. The mixture-governance input for
    * collapsing syndicated feeds before they double-count in training
    * weights.
    *
    * Scale shape: one (hash, source) count aggregate (map-side combined),
    * then a self-join ON THE HASH whose per-key fanout is bounded by the
    * source count — a few hundred rows per hash at worst, no doc-level
    * pair blowup no matter how many copies exist (counts multiply,
    * n_a·n_b, instead of rows joining). */
  def syndication(documents: DataFrame, headWords: Int = 8): DataFrame =
    syndicationFromFingerprints(dupFingerprints(documents, headWords))

  /** Per-source duplicate contribution (d32): [[dupTrend]]'s first-copy
    * rule grouped by source instead of ingest bucket — which FEED is
    * re-posting content the corpus already holds. The mixture-governance
    * number next to [[syndication]]'s pair matrix: syndication says who
    * copies whom, this says how much of each source is copies (of
    * anything, including itself). Same cost shape as d29: one hash
    * projection, one min-per-hash aggregate, one join, one per-source
    * aggregate. */
  /** Within-vs-cross-source duplicate split (d37): for every duplicate
    * document (non-keeper of its exact-hash group, the d32 convention),
    * does its keeper live in the SAME source or a different one — the
    * shuffle-planning gauge for dedup at 100 TB: a corpus whose
    * duplication is overwhelmingly within-source can dedup SHARDED BY
    * SOURCE (each shard fits its partition, zero cross-shard shuffle)
    * and only run the expensive global pass on the small cross-source
    * residue; a high cross fraction says the global pass is
    * load-bearing and cannot be skipped. Duplicate identity is the
    * 8-word OPENING fingerprint (the d29/d30 syndication convention —
    * re-posts keep openings and drift in the tail; full-hash identity
    * is d32's stricter rule). One fingerprint pass + one keeper
    * aggregate + one keeper-source lookup join — the d32 chain plus a
    * single |groups|-row join. */
  def dupSourceSplit(documents: DataFrame): DataFrame = {
    val fp = dupFingerprints(documents)
    Caching.withPersisted(fp)(dupSourceSplitFromFingerprints(fp))
  }

  /** [[dupSourceSplit]] over an already-computed (and persisted)
    * [[dupFingerprints]] frame — the d29/d30 one-pass sharing shape the
    * data card uses so all three duplication sections ride one text
    * scan. */
  def dupSourceSplitFromFingerprints(fp: DataFrame): DataFrame = {
    val h = fp.select(col("doc_id"), col("source"), col("head_h").as("h"))
    val first = h.groupBy(col("h"))
      .agg(min(col("doc_id")).as("first_doc"))
    val firstSrc = h.select(col("doc_id").as("first_doc"),
      col("source").as("first_source"))
    h.join(first, "h")
      .filter(col("doc_id") =!= col("first_doc"))
      .join(firstSrc, "first_doc")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_dup_docs"),
        sum(when(col("source") === col("first_source"), 1L)
          .otherwise(0L)).as("n_within_source"),
        sum(when(col("source") =!= col("first_source"), 1L)
          .otherwise(0L)).as("n_cross_source"))
      .select(col("source"), col("n_dup_docs"), col("n_within_source"),
        col("n_cross_source"),
        (col("n_cross_source").cast("double") /
          col("n_dup_docs").cast("double")).as("cross_frac"))
  }

  def dupBySource(documents: DataFrame): DataFrame = {
    val h = dupFingerprints(documents)
      .select(col("doc_id"), col("source"), col("full_h").as("h"))
    val first = h.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    h.join(first, "h")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("first_doc"), 1L).otherwise(0L))
          .as("n_dup_docs"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_docs")).as("dup_frac"))
  }

  /** [[syndication]]'s body over a precomputed [[dupFingerprints]] frame. */
  def syndicationFromFingerprints(fp: DataFrame): DataFrame = {
    val h = fp
      .select(col("source"), col("head_h").as("h"))
      .groupBy(col("h"), col("source")).agg(count(lit(1)).as("n"))
    h.as("a")
      .join(h.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(sum(col("a.n") * col("b.n")).as("n_dup_pairs"),
        count(lit(1)).as("n_shared_texts"))
  }

  /** Corpus-level bottom-k sketch per source (d6): the k smallest distinct
    * shingle hashes per group via the typed BottomKSketch Aggregator —
    * partial aggregation keeps the shuffle at k values per group, the
    * scalable way to estimate cross-source overlap without pairwise work. */
  def sourceSketch(documents: DataFrame, k: Int = 4): DataFrame = {
    val sketch = udaf(graft.functions.BottomKSketch(k))
    documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(size(LlmText.words(col("text"))) >= 3)
      // pre-reduce to the per-DOC bottom-k before exploding: any hash in a
      // source's bottom-k must be in its document's bottom-k, so this is
      // exact and the aggregate sees k rows per doc instead of every
      // shingle (~30× less input at this corpus's shingle counts)
      .select(col("source"),
        explode(slice(array_sort(transform(LlmText.shingles(col("text")),
          s => Dedup.bottomKHash(s))), 1, k)).as("h"))
      .groupBy(col("source"))
      .agg(sketch(col("h")).as("sketch"))
  }

  /** Corpus-overlap matrix (d11): estimated Jaccard between every pair of
    * sources from their bottom-k shingle-hash sketches — the diagnostic
    * that tells a mixing pipeline which crawls/dumps duplicate each other
    * BEFORE paying for document-level dedup between them. Estimation is
    * |sketchA ∩ sketchB| / |sketchA ∪ sketchB| over the bottom-k sets (a
    * consistent MinHash-style estimator; k bounds both cost and variance).
    *
    * Scale shape: per-source distinct hashing map-side combines; bottom-k
    * per source runs on the heap TopK operator (k values of state per
    * source); the pair join touches k·#sources rows — independent of
    * corpus size. Pairs sharing no sketch hash are omitted (their estimate
    * is 0). */
  def sourceOverlap(documents: DataFrame, k: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val hashes = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(size(LlmText.words(col("text"))) >= 3)
      // per-doc pre-reduction as in sourceSketch: exact for bottom-k
      .select(col("source"),
        explode(slice(array_sort(transform(LlmText.shingles(col("text")),
          s => Dedup.bottomKHash(s))), 1, k)).as("h"))
      .distinct()
    val bottomK = graft.plans.TopK.perKey(hashes,
      Seq(col("source")), Seq(col("h")), k)
    Caching.withPersisted(bottomK) {
      val sizes = bottomK.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val common = bottomK.as("a")
        .join(bottomK.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_common"))
      common
        .join(broadcast(sizes.select(col("source").as("source_a"),
          col("n").as("na"))), "source_a")
        .join(broadcast(sizes.select(col("source").as("source_b"),
          col("n").as("nb"))), "source_b")
        .select(col("source_a"), col("source_b"), col("n_common"),
          (col("n_common").cast("double") /
            (col("na") + col("nb") - col("n_common"))).as("jaccard_est"))
    }
  }

  /** Crawl-split chain detection (d39): find ordered doc pairs (a, b)
    * where a's text ENDS with the tokens b's text STARTS with — the
    * signature of one logical document split across fetches (pagination,
    * chunked re-crawls, article continuations). d10/d18 find REPEATED
    * interior spans; this finds the boundary stitch, the structure a
    * reassembly or drop-continuation pass consumes.
    *
    * Two stages, the LSH discipline applied to boundaries: (1) CANDIDATES
    * by equi-joining a's LAST word-3-gram against b's leading 3-gram
    * POSITIONS 1..[[ChainProbePositions]] — an overlap of L ∈
    * [3, [[ChainMaxOverlap]]] tokens puts a's final 3-gram at exactly
    * position L−2 of b, so the position-exploded key (≤ 14 rows per doc,
    * corpus-linear) catches every admissible length, where a prefix-only
    * key would catch L = 3 alone. Both sides carry the d2 hot-key cap
    * (agg + broadcast anti-join) so a boilerplate boundary ("subscribe
    * to our newsletter …") cannot quadratically explode one bucket.
    * (2) VERIFY the exact candidate length: the match at position j
    * claims L = j+2, confirmed by slice equality of a's last L tokens
    * against b's first L on the fixed-width boundary slices in the
    * joined row — then keep each pair's longest confirmed overlap.
    *
    * Coverage contract: overlaps LONGER than [[ChainMaxOverlap]] tokens
    * produce no candidate at all (a's final 3-gram sits past the probed
    * positions) — they are invisible, not truncated. d41
    * ([[chainSaturationFrom]]) surfaces the bound the way bandCapReport
    * surfaces cap drops: pair mass AT overlap = [[ChainMaxOverlap]]
    * says real stitches are saturating the window and the probe range
    * needs widening.
    *
    * Scale shape: one scan to build (doc, boundary-key, tokens), one
    * capped equi-join whose output is O(boundary collisions), per-row
    * verification arithmetic, one (doc_a, doc_b) max-fold — the d2/d8
    * candidate/verify split, so it survives 100× with the same plan. */
  /** Longest overlap the chain family can DETECT (r15: 8 → 16). Also the
    * fixed row width of the boundary index and probe: both carry exactly
    * this many boundary tokens, so index row size is independent of
    * document length — at 100 TB the stitch index stays thin instead of
    * re-shipping the corpus through the candidate shuffle. */
  val ChainMaxOverlap = 16
  /** b-side probed leading 3-gram positions: j ∈ [1, ChainMaxOverlap−2]. */
  val ChainProbePositions: Int = ChainMaxOverlap - 2

  def chainOverlap(documents: DataFrame, cap: Int = 100): DataFrame =
    chainOverlapVsIndex(documents, chainBoundaryIndex(documents, cap), cap)

  private def boundaryTokens(documents: DataFrame): DataFrame =
    documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("n"))
      .filter(col("n") >= 3)

  /** [[chainOverlap]]'s suffix side as a standalone table — each doc's
    * capped boundary-suffix 3-gram key plus the LAST [[ChainMaxOverlap]]
    * tokens (all the verify stage ever reads — the full token array
    * would make index row width scale with document length for zero
    * recall). Written to the lake, this is the artifact arriving
    * documents probe ("is this a continuation of something we already
    * hold?") — the d13/mm9 stored-index convention for the chain
    * family. */
  def chainBoundaryIndex(documents: DataFrame, cap: Int = 100): DataFrame = {
    val t = boundaryTokens(documents)
    Dedup.capHotKeys(
      // the negative start must be clamped to the doc length: Spark's
      // slice returns EMPTY (not the whole array) when |start| > len
      t.select(col("doc_id").as("doc_a"),
        slice(col("w"),
          -least(col("n"), lit(ChainMaxOverlap)),
          lit(ChainMaxOverlap)).as("wa"),
        col("n").as("na"),
        concat_ws(" ", slice(col("w"), -3, 3)).as("bkey")),
      Seq("bkey"), cap)
  }

  /** [[chainOverlap]]'s probe side against a (possibly parquet-stored)
    * [[chainBoundaryIndex]]: the batch's leading 3-gram positions 1..6
    * explode (capped), equi-join the index, and the claimed length gets
    * the exact slice verify + per-pair max. Probe cost is O(batch ×
    * collisions), never O(corpus) — the serve-path contract every
    * vs-index member quotes. */
  def chainOverlapVsIndex(batch: DataFrame, index: DataFrame,
      cap: Int = 100): DataFrame = {
    val t = boundaryTokens(batch)
    val bexp = t
      .select(col("doc_id").as("doc_b"),
        slice(col("w"), 1, ChainMaxOverlap).as("wb"),
        col("n").as("nb"),
        explode(filter(
          transform(sequence(lit(1), lit(ChainProbePositions)), j =>
            struct(j.as("j"),
              concat_ws(" ", slice(col("w"), j, lit(3))).as("k"))),
          s => col("n") >= s.getField("j") + 2)).as("e"))
      .select(col("doc_b"), col("wb"), col("nb"),
        col("e.j").as("j"), col("e.k").as("bkey"))
    val b = Dedup.capHotKeys(bexp, Seq("bkey"), cap)
    val cand = index.join(b,
      Seq("bkey")).filter(col("doc_a") =!= col("doc_b"))
    val l = (col("j") + 2).cast("long")
    val confirmed = when(col("na") >= l && col("nb") >= l &&
      (slice(col("wa"), -col("j") - 2, col("j") + 2) ===
        slice(col("wb"), lit(1), col("j") + 2)), l).otherwise(0L)
    cand.select(col("doc_a"), col("doc_b"), confirmed.as("l"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("l")).as("overlap_len"))
      .filter(col("overlap_len") >= 3L)
  }

  /** Chain reassembly plan (d40): connected components over
    * [[chainOverlap]]'s verified stitches — every group is one logical
    * document the crawler delivered in fragments, reported with its
    * fragment count, total token mass, and id span. This is the table a
    * reassembly job (concatenate fragments back into whole documents
    * before dedup/packing) or a drop-continuations policy consumes; the
    * d7→d8 pairs→components→decision shape applied to the chain family.
    *
    * Scale shape: the stitch pairs are MATERIALIZED once (they feed the
    * CC loop's repeated passes — the d28 lesson), star-contraction CC
    * runs on the stitch graph (O(stitches), tiny next to the corpus),
    * and one join back to per-doc token counts prices the groups.
    * Chains are near-linear paths, so CC converges in a few rounds. */
  def chainGroups(documents: DataFrame, cap: Int = 100): DataFrame =
    chainGroupsFrom(
      Caching.materialize(chainOverlap(documents, cap)), documents)

  /** [[chainGroups]]' serve form over an ALREADY-BUILT (typically
    * parquet-stored) stitch-pair table — the reassembly consumer reads
    * the lake artifact d39 builds; zero candidate/verify work here. The
    * pair frame must be materialized or storage-backed: the CC loop
    * scans it repeatedly (the d28 lesson). CC runs through the
    * STAR-CONTRACTION path: stitch graphs are long near-linear paths
    * (continuation chains, transitive boundary collisions), exactly the
    * diameter regime where min-label propagation pays O(path length)
    * rounds and star contraction pays O(log) — measured 6.4s → 4.4s at
    * sf0.1 on the same pairs (the residue is per-round materialization
    * overhead, constant in data size), identical labels (both emit the
    * component minimum). */
  /** Chain-window saturation gauge (d41): the verified-overlap length
    * histogram with the detection bound made explicit — `at_cap` marks
    * the [[ChainMaxOverlap]] row, the only length whose mass is
    * CENSORED (a true overlap of 20 tokens reports as nothing at all,
    * not as 16 — see [[chainOverlap]]'s coverage contract; a detected
    * 16 means "≥ 16"). Mass piling onto the at_cap row is the signal to
    * widen [[ChainProbePositions]] before trusting d40's reassembly
    * plan; spread mass below it says the window is sized right. The
    * bandCapReport stance applied to the chain family: every bounded
    * detector ships the gauge that says when its bound binds.
    *
    * Serve shape: one |pairs|-row aggregate over the STORED d39 stitch
    * table — zero candidate/verify work. */
  def chainSaturationFrom(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("overlap_len"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("overlap_len"), col("n_pairs"),
        (col("overlap_len") === lit(ChainMaxOverlap.toLong)).as("at_cap"))

  def chainGroupsFrom(pairs: DataFrame, documents: DataFrame): DataFrame = {
    val mem = Dedup.connectedComponentsStar(
        pairs.select(col("doc_a"), col("doc_b")))
      .select(col("doc").as("doc_id"), col("lab").as("chain_id"))
    val tok = documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("nt"))
    mem.join(tok, "doc_id")
      .groupBy(col("chain_id"))
      .agg(count(lit(1)).as("n_fragments"),
        sum(col("nt")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }
}
