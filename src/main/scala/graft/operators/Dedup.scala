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
  * All hashes derive from md5 so the DuckDB oracle can reproduce them
  * exactly — but the HOT paths never materialize hex strings: ids and
  * join/group keys are the digest's leading 28 or 60 bits as longs
  * ([[graft.functions.Md5Fold]], bit-equal to the oracle's hex-char
  * fold), and band keys pack into two longs. Hex appears only where a
  * report surfaces it (d1's content_md5, x4's fingerprints).
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

  /** Hot-key frequency cap for every LSH/sketch candidate join: a band or
    * sketch key shared by MORE than this many documents is excluded from
    * candidate generation entirely. At 100 TB a single boilerplate shingle
    * (cookie banner, license header) that lands in the bottom-4 sketch of
    * 10⁶ docs would otherwise produce ~5·10¹¹ candidate pairs on ONE join
    * key and kill the job in a single skewed stage — the cap bounds every
    * key's pair contribution at cap²/2 and the total at O(keys·cap²), the
    * degrade-accountably stance of production near-dup pipelines. Pairs
    * lost to the cap are only those whose EVERY shared key is hot — for
    * near-dup detection such pairs still meet on any non-boilerplate band —
    * and the dropped mass is surfaced by [[bandCapReport]] the way
    * [[dedupReport]] surfaces dropped docs. */
  val MaxBandDocs = 500

  /** Drop rows whose key is shared by more than `cap` documents. The
    * hot-key set is tiny by construction (≤ total-entries/cap keys), so the
    * anti-join's build side is a few rows and AQE plans it as a broadcast —
    * the capped table itself is never reshuffled. `Partitioning.spread`
    * fixes partition skew; this fixes candidate-pair blowup — different
    * failure modes, both needed. */
  private[operators] def capHotKeys(t: DataFrame, keys: Seq[String],
      cap: Int): DataFrame = {
    if (cap == Int.MaxValue) t
    else {
      val hot = t.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__key_docs"))
        .filter(col("__key_docs") > cap)
        .select(keys.map(col): _*)
      t.join(hot, keys, "left_anti")
    }
  }

  /** Fixed affine constants for the 12 minhash functions
    * h_k(x) = (A(k)·x + B(k)) mod P. One md5 per shingle provides the
    * uniform base; the affine family derives the remaining hashes with
    * integer-only math (A(k)·x < 2^59, no overflow in either engine). */
  val HashP = 1000000007L
  val HashA: Seq[Long] = Seq(1299721, 2750161, 4256233, 5800079, 7368787,
    8960453, 10570841, 12195257, 13834103, 15485863, 17624813, 19654991)
  val HashB: Seq[Long] = Seq(15487469, 32452843, 49979687, 67867967,
    86028121, 104395301, 122949823, 141650939, 160481183, 179424673,
    198491317, 217645177)


  /** The documents' distinct word-3-gram shingle sets, bracketed by two
    * doc_id exchanges that are both load-bearing: the one BELOW the
    * projection spreads compute across the cluster even when the source
    * arrives as few splits; the one ABOVE is an optimizer barrier so the
    * shingle arrays are referenced as materialized columns downstream
    * instead of CollapseProject re-inlining the expensive expression into
    * every join side and band reference. */
  private def docShingles(documents: DataFrame): DataFrame =
    documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"), LlmText.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(Partitioning.spread(_, col("doc_id")))

  /** MinHash + LSH near-dup pairs (d2): shingle → 12 min-hashes → 4 band
    * keys → band-bucket equi-join for candidates → exact Jaccard ≥ 0.7.
    *
    * The band join is the scalable step: documents only meet if they share
    * an identical 3-hash band, so the shuffle key is (band index, band key)
    * and no n² product ever materializes. Verification re-joins shingle sets
    * for candidate pairs only. */
  /** Shingle sets with their per-shingle base hashes — the persisted
    * intermediate every minhash consumer (signatures, band joins, exact
    * Jaccard verify) reads. */
  private def shinglesWithBases(documents: DataFrame): DataFrame =
    docShingles(documents)
      .withColumn("bases",
        transform(col("sh"), s => PortableHash.hash28("m:", s)))

  /** A band's 3 minhash components packed into TWO longs — the band join
    * and every bucket gauge shuffle/group on (bk1, bk2) instead of the
    * pre-r15 `concat_ws("|", …)` VARCHAR (the r14 GC telemetry's largest
    * allocation source after the hex intermediates). The packing is
    * injective — each h < P < 2³⁰, so bk1 = band·2⁶⁰ + h1·2³⁰ + h2 < 2⁶²
    * and (bk1, bk2=h3) partitions documents EXACTLY as (band, h1|h2|h3)
    * did — candidate sets, bucket counts, and every oracle row are
    * unchanged; the oracle keeps its string form of the same partition. */
  private val Pow30 = 1073741824L
  private val Pow60 = Pow30 * Pow30

  /** LSH band table of a [[shinglesWithBases]] frame: (doc_id, bk1,
    * bk2) — all 12 affine minimums in one native pass over the bases
    * (the HOF twin walks the array 12×; bit-equality pinned by
    * MinHashSigSpec), packed into MinHashK/BandRows two-long band keys. */
  private def bandTable(sh: DataFrame): DataFrame = {
    val siged = sh
      .select(col("doc_id"),
        org.apache.spark.sql.graftinternal.Bridge.column(
          graft.functions.MinHashSig(
            org.apache.spark.sql.graftinternal.Bridge.expression(col("bases")),
            HashA, HashB, HashP)).as("mhs"))
    siged.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(MinHashK / BandRows - 1)), j =>
        struct(
          (j.cast("long") * Pow60 +
            element_at(col("mhs"), j * BandRows + 1) * Pow30 +
            element_at(col("mhs"), j * BandRows + 2)).as("bk1"),
          element_at(col("mhs"), j * BandRows + 3).as("bk2"))))
        .as("b"))
      .select(col("doc_id"), col("b.bk1").as("bk1"), col("b.bk2").as("bk2"))
  }

  def minhashLsh(documents: DataFrame, threshold: Double = 0.7,
      maxBandDocs: Int = MaxBandDocs): DataFrame = {
    // Shingle sets (and their base hashes) are read by several consumers:
    // the 12 minhash functions, the two band-join sides, and the two
    // Jaccard-verify sides. Spark's exchange reuse is unreliable under AQE
    // for these self-join shapes (observed: 3 ReusedExchange with AQE off,
    // 0 with AQE on), and CollapseProject would otherwise re-inline the
    // md5 hashing into every one of those references (12× the work — the
    // affine family reads `bases` as data precisely so md5 runs once per
    // shingle). An explicit persist is the robust barrier: MEMORY_AND_DISK
    // spills rather than OOMs, and the footprint is O(corpus shingles) —
    // the same data a shuffle would have written anyway. The persist lives
    // only for the duration of this call (Caching bracket).
    val sh = shinglesWithBases(documents)
    Caching.withPersisted(sh) { lshPairs(sh, threshold, maxBandDocs) }
  }

  /** [[minhashLsh]]'s body over an ALREADY-PERSISTED [[shinglesWithBases]]
    * frame — split out so [[governanceReport]] shares one shingle pass
    * between the dedup chain and the cap accounting. Derived frames (the
    * capped band table) are deliberately NOT persisted (measured, r8):
    * caching them costs more in columnar encode/decode + lost codegen
    * fusion than their count+anti-join costs to recompute from the cached
    * sh (ablation: d4 2.4s inline vs 3.9s persisted; same shape here).
    * The cap's residual premium vs uncapped is ~0.5s at sf0.1 — the
    * accepted insurance. The agg+anti-join cap form is deliberate too:
    * map-side combine absorbs hot keys and the broadcast anti-join drops
    * them BEFORE any shuffle, where a QUALIFY-style window count would
    * funnel a 100 TB boilerplate key's rows through one window task. */
  private def lshPairs(sh: DataFrame, threshold: Double,
      maxBandDocs: Int): DataFrame =
    shingleJaccard(lshCandidates(sh, maxBandDocs), sh)
      .filter(col("jaccard") >= threshold)

  /** The band-bucket candidate join of a [[shinglesWithBases]] frame —
    * (doc_a, doc_b), capped and distinct; shared by [[lshPairs]] and the
    * d35 calibration gauge so both see the identical candidate set. */
  private def lshCandidates(sh: DataFrame, maxBandDocs: Int): DataFrame = {
    val bands = capHotKeys(bandTable(sh), Seq("bk1", "bk2"), maxBandDocs)
    bands.as("a")
      .join(bands.as("b"),
        col("a.bk1") === col("b.bk1") && col("a.bk2") === col("b.bk2") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard of two DISTINCT-element set columns from ONE
    * intersect: shingle/trigram arrays are array_distinct at
    * construction, so |A∪B| = |A|+|B|−|A∩B| exactly and the
    * array_union per candidate pair (a second hash-set build plus a
    * materialized union array of up to |A|+|B| strings) is pure
    * allocation with no information. Codegen subexpression elimination
    * evaluates the intersect once. The division operands are the
    * identical integers either way, so every jaccard double — and
    * every oracle row hash — is bit-unchanged. */
  private[operators] def setJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Exact word-shingle Jaccard for a candidate pair frame. */
  private def shingleJaccard(cand: DataFrame, sh: DataFrame): DataFrame =
    cand
      .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sh.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        setJaccard(col("x.sh"), col("y.sh")).as("jaccard"))

  /** MinHash estimator calibration (d35): for every LSH candidate pair
    * (NO jaccard threshold — the sub-threshold pairs are exactly where
    * the estimator earns its keep), the MinHash-estimated Jaccard
    * (matching signature components / K) next to the exact word-shingle
    * Jaccard and their absolute gap — the detector-QA gauge that says
    * whether K=12 components still calibrate on this corpus or the d23/
    * d25 operating points need retuning. Same candidate generation and
    * signature kernel as d2 (shared helpers), so the gauge measures the
    * production detector, not a replica. */
  def minhashCalibration(documents: DataFrame,
      maxBandDocs: Int = MaxBandDocs): DataFrame = {
    val sh = shinglesWithBases(documents)
    Caching.withPersisted(sh) {
      val cand = lshCandidates(sh, maxBandDocs)
      val siged = sh.select(col("doc_id"),
        org.apache.spark.sql.graftinternal.Bridge.column(
          graft.functions.MinHashSig(
            org.apache.spark.sql.graftinternal.Bridge.expression(col("bases")),
            HashA, HashB, HashP)).as("mhs"))
      val est = cand
        .join(siged.select(col("doc_id").as("doc_a"), col("mhs").as("ma")),
          "doc_a")
        .join(siged.select(col("doc_id").as("doc_b"), col("mhs").as("mb")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (size(filter(zip_with(col("ma"), col("mb"),
            (a, b) => a === b), m => m)).cast("double") /
            lit(MinHashK)).as("est_jaccard"))
      est.join(shingleJaccard(cand, sh)
          .withColumnRenamed("jaccard", "exact_jaccard"),
          Seq("doc_a", "doc_b"))
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
          col("exact_jaccard"),
          abs(col("est_jaccard") - col("exact_jaccard")).as("abs_err"))
    }
  }

  /** Near-dup cluster decisions (d7): connected components over the
    * MinHash-LSH pair graph, each doc labeled with its component's minimum
    * doc_id and a keep/drop decision (keep = the representative).
    *
    * Iterative min-label propagation: every round each node takes the min
    * of its own and its neighbors' labels; converged when nothing changes
    * (detected with a count per round), which is exactly the transitive-
    * closure minimum the oracle computes with a recursive CTE. Rounds are
    * bounded by component diameter — near-dup clusters are tiny (pairs to
    * dozens), so a handful of shuffle rounds; truly giant components would
    * use the large-star/small-star variant with the same join shapes. */
  def nearDupComponents(documents: DataFrame,
      threshold: Double = 0.7, maxIter: Int = 25): DataFrame = {
    // minhashLsh returns an eagerly materialized pair list, so the loop's
    // repeated actions never re-run the LSH pipeline.
    val pairs = minhashLsh(documents, threshold)
      .select(col("doc_a"), col("doc_b"))
    connectedComponents(pairs, maxIter)
      .select(col("doc").as("doc_id"), col("lab").as("cluster_rep"),
        (col("doc") === col("lab")).as("keep"))
  }

  /** Near-dup cluster-size histogram (d31): how many duplicate clusters
    * exist at each size, and the document mass they hold — the governance
    * readout that separates "pairs of near-identical posts" (size-2 tail)
    * from a syndication storm (one 500-member cluster). Sizes count only
    * docs that ARE in some near-dup pair ([[nearDupComponents]]'s
    * domain); singletons aren't duplication and would drown the
    * histogram. Two count aggregates over the components table — free at
    * any scale once the components pass has run. */
  def clusterSizeHistogram(documents: DataFrame,
      threshold: Double = 0.7): DataFrame =
    nearDupComponents(documents, threshold)
      .groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  /** Connected components over an undirected pair list → (doc, lab) where
    * lab is the component's minimum id — the transitive closure the oracle
    * computes with a recursive CTE.
    *
    * Min-label propagation WITH pointer jumping: each round a node takes
    * the least of its own label, its neighbors' labels, and its label's
    * label (path doubling). The jump halves every label chain per round, so
    * convergence is O(log diameter) instead of O(diameter) — a 1000-link
    * chain (the giant-component shape that breaks plain propagation)
    * settles in ~10 rounds. Labels only decrease and never leave the
    * component (neighbor labels share the component by the edge; lab's
    * label shares it by the doc→lab invariant), so the fixpoint is exactly
    * the component minimum. Per round: two equi-joins + one aggregate, all
    * on the (doc) key — the same shuffle family a real cluster co-locates;
    * convergence is one count() action on the changed set. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Each round references comp FOUR times (neighbor-min, both jump sides,
    // changed-count), so a persist-only loop grows the logical plan ~4^i —
    // the string alone OOMs the driver past ~10 rounds. Caching.materialize
    // truncates lineage every round (reliable checkpoint when the session
    // has a checkpoint dir — survives executor loss on a preemptible
    // cluster — localCheckpoint otherwise), keeping every round's plan
    // flat; superseded blocks are reclaimed by the ContextCleaner.
    //
    // Labels are SEEDED with the neighborhood minimum — one aggregate over
    // the symmetrized edges replaces the identity init AND the whole first
    // propagation round, so isolated pairs (the dominant near-dup cluster
    // shape) converge on the first changed-count check.
    var comp = Caching.materialize(
      edges.groupBy(col("src").as("doc"))
        .agg(min(col("dst")).as("nmin"))
        .select(col("doc"), least(col("doc"), col("nmin")).as("lab")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(comp, edges("dst") === comp("doc"))
        .groupBy(col("src")).agg(min(col("lab")).as("nlab"))
      val jump = comp.as("a")
        .join(comp.as("b"), col("a.lab") === col("b.doc"))
        .select(col("a.doc").as("jdoc"), col("b.lab").as("jlab"))
      val newLab = least(col("lab"), coalesce(col("nlab"), col("lab")),
        coalesce(col("jlab"), col("lab")))
      // the changed flag rides the round's own projection, so convergence
      // detection is a filter+count over the checkpointed blocks — no
      // extra join against the previous state per round
      val next = comp
        .join(neighborMin, comp("doc") === neighborMin("src"), "left_outer")
        .join(jump, comp("doc") === col("jdoc"), "left_outer")
        .select(comp("doc"), newLab.as("lab"),
          (newLab =!= col("lab")).as("chg"))
      val nextM = Caching.materialize(next)
      val changed = nextM.filter(col("chg")).count()
      comp = nextM.select(col("doc"), col("lab"))
      converged = changed == 0
      i += 1
    }
    if (!converged) {
      // Labels are still correct per-round minimums but NOT the component
      // minimum. With pointer jumping this takes a component of diameter
      // > 2^maxIter — surface it loudly rather than silently mislabel.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did NOT converge within $maxIter rounds; " +
          "component labels are incomplete. Raise maxIter.")
    }
    // comp is materialization-backed on every path (the seed and each
    // round's frame go through Caching.materialize), so the result needs no
    // further copy — its plan is a projection over checkpointed blocks.
    edges.unpersist(false)
    comp.select(col("doc"), col("lab"))
  }

  /** Materialized near-dup index of a corpus (d20's stored side): ONE
    * row per document carrying everything incremental matching needs —
    * the shingle set (exact-Jaccard verify) and the 4 LSH band keys
    * (candidate generation) — so the index is a plain parquet/lake table
    * built once and appended per ingest, and NO per-batch work ever
    * touches the corpus again (the r8 fix for [[incrementalDedup]]'s
    * recompute-the-known-side-every-call cost, which at 100 TB dominates
    * every micro-batch). Schema: (doc_id, sh, bkeys[4] of (bk1, bk2) —
    * the packed two-long band keys, 16 bytes/band in parquet instead of
    * a ~30-char string). */
  def nearDupIndex(documents: DataFrame): DataFrame = {
    val sh = shinglesWithBases(documents)
    sh.select(col("doc_id"), col("sh"),
        org.apache.spark.sql.graftinternal.Bridge.column(
          graft.functions.MinHashSig(
            org.apache.spark.sql.graftinternal.Bridge.expression(col("bases")),
            HashA, HashB, HashP)).as("mhs"))
      .select(col("doc_id"), col("sh"),
        transform(sequence(lit(0), lit(MinHashK / BandRows - 1)), j =>
          struct(
            (j.cast("long") * Pow60 +
              element_at(col("mhs"), j * BandRows + 1) * Pow30 +
              element_at(col("mhs"), j * BandRows + 2)).as("bk1"),
            element_at(col("mhs"), j * BandRows + 3).as("bk2")))
          .as("bkeys"))
  }

  /** Stored-layout guard for [[nearDupIndex]] consumers: r15 widened
    * `bkeys` from array<string> (hex band keys) to the packed
    * array<struct<bk1,bk2>>. A pre-r15 parquet index would otherwise
    * fail deep inside the probe join with an unresolved-column analysis
    * error (`e.bk1`) — detect the legacy layout up front and fail with
    * the actionable rebuild message instead. */
  private[operators] def requireBandStructIndex(index: DataFrame): Unit =
    index.schema("bkeys").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        _: org.apache.spark.sql.types.StructType, _) => ()
      case other => throw new IllegalStateException(
        "near-dup index uses a legacy layout (bkeys: array<" +
          other.asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType.simpleString +
          ">); this engine expects bkeys: array<struct<bk1,bk2>> — " +
          "rebuild the stored index with Dedup.nearDupIndex")
    }

  /** LSH dirty-bucket report (d38): today's [[nearDupIndex]] band
    * buckets compared to yesterday's build — per bucket class, how many
    * are unchanged / grown / brand-new / shrunk / removed, and the
    * dirty fraction. This is the WORK ESTIMATE of incremental dedup
    * maintenance: a bucket whose membership did not change cannot
    * produce new candidate pairs, so the nightly re-pair only needs to
    * touch dirty buckets — dirty_frac × bucket count sizes tonight's
    * job before it runs, the dedup-family twin of g13's edge churn and
    * s24's cell churn (every stored index family now has its staleness
    * measured, not asserted). Under pure ingest (stored ⊆ fresh)
    * shrunk/removed read 0; they exist for the retention/deletion
    * regime where yesterday's docs can leave.
    *
    * One band-key explode + count per side (distinct-key scale, not
    * corpus scale), one full outer equi-join of two bucket tables, one
    * constant-group fold — empty inputs → empty report. Integers until
    * the final fraction. */
  def dirtyBucketReport(fresh: DataFrame, stored: DataFrame): DataFrame = {
    requireBandStructIndex(fresh); requireBandStructIndex(stored)
    def buckets(idx: DataFrame) = idx
      .select(col("doc_id"), explode(col("bkeys")).as("e"))
      .groupBy(col("e.bk1").as("bk1"), col("e.bk2").as("bk2"))
      .agg(count(lit(1)).as("c"))
    bucketClassFold(
      buckets(fresh).withColumnRenamed("c", "cf"),
      buckets(stored).withColumnRenamed("c", "cs"),
      Seq("bk1", "bk2"))
  }

  /** Per-batch dirty-bucket gauge — the STREAMING-twin body of
    * [[dirtyBucketReport]] (d38 measures a whole build nightly; this
    * says which buckets ONE arriving batch touches, live): the batch is
    * shingled and banded (its own cost only — the d13 contract), its
    * distinct band keys split into brand-new buckets vs hits on the
    * stored index's key set. A rising new_frac means arrivals are
    * opening fresh bucket space (novel content — the index append stays
    * cheap); a low one means arrivals pile into existing buckets
    * (duplication pressure — tonight's re-pair grows). One explode +
    * distinct per side and one equi-join at batch-bucket scale; empty
    * batch → empty report. */
  def batchDirtyBuckets(incoming: DataFrame, index: DataFrame): DataFrame = {
    requireBandStructIndex(index)
    def keys(idx: DataFrame) = idx
      .select(explode(col("bkeys")).as("e"))
      .select(col("e.bk1").as("bk1"), col("e.bk2").as("bk2"))
      .distinct()
    keys(nearDupIndex(incoming))
      .join(keys(index).withColumn("s", lit(true)),
        Seq("bk1", "bk2"), "left_outer")
      .groupBy(lit(true).as("all"))
      .agg(count(lit(1)).as("n_touched"),
        sum(when(col("s").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("s").isNotNull, 1L).otherwise(0L)).as("n_existing"))
      .select(col("n_touched"), col("n_new"), col("n_existing"),
        (col("n_new").cast("double") / col("n_touched").cast("double"))
          .as("new_frac"))
  }

  /** The bucket-class fold shared by every dirty-bucket gauge (d38's LSH
    * bands, mm16's phash bands): full outer join two keyed count frames
    * (`cf` fresh, `cs` stored) and classify each bucket as unchanged /
    * new / grown / shrunk / removed, plus the dirty fraction. Null
    * comparisons are three-valued — a bucket missing on one side counts
    * ONLY in its new/removed class, never in grown/shrunk. */
  private[operators] def bucketClassFold(f: DataFrame, s: DataFrame,
      keys: Seq[String]): DataFrame =
    f.join(s, keys, "full_outer")
      .groupBy(lit(true).as("all"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("cf") === col("cs"), 1L).otherwise(0L))
          .as("n_unchanged"),
        sum(when(col("cs").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cf") > col("cs"), 1L).otherwise(0L)).as("n_grown"),
        sum(when(col("cf") < col("cs"), 1L).otherwise(0L)).as("n_shrunk"),
        sum(when(col("cf").isNull, 1L).otherwise(0L)).as("n_removed"))
      .select(col("n_buckets"), col("n_unchanged"), col("n_new"),
        col("n_grown"), col("n_shrunk"), col("n_removed"),
        ((col("n_buckets") - col("n_unchanged")).cast("double") /
          col("n_buckets").cast("double")).as("dirty_frac"))

  /** [[incrementalDedup]] against a PREBUILT [[nearDupIndex]] — per call,
    * only the incoming batch is shingled and banded; the stored side
    * contributes an explode of its 4 band keys (narrow, no hashing) and
    * its stored shingle sets for the verify join. Same output contract as
    * d13 (pinned equal by DedupSpec and by the shared oracle SQL). */
  def incrementalDedupVsIndex(incoming: DataFrame, index: DataFrame,
      threshold: Double = 0.7, maxBandDocs: Int = MaxBandDocs): DataFrame = {
    requireBandStructIndex(index)
    val shI = shinglesWithBases(incoming)
    // the index is referenced three times (band explode, its hot-key
    // count, the verify join); persisting keeps a DERIVED index — e.g.
    // nearDupIndex(df) built on the fly — from re-shingling its corpus
    // per reference. A parquet-backed index pays one cheap cache fill.
    Caching.withPersisted(shI, index) {
      val bandsI = capHotKeys(bandTable(shI), Seq("bk1", "bk2"), maxBandDocs)
      val bandsK = capHotKeys(
        index.select(col("doc_id"), explode(col("bkeys")).as("e"))
          .select(col("doc_id"), col("e.bk1").as("bk1"),
            col("e.bk2").as("bk2")),
        Seq("bk1", "bk2"), maxBandDocs)
      val cand = bandsI.as("a")
        .join(bandsK.as("b"),
          col("a.bk1") === col("b.bk1") && col("a.bk2") === col("b.bk2"))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"))
        .distinct()
      cand.as("c")
        .join(shI.as("x"), col("c.doc_id") === col("x.doc_id"))
        .join(index.as("y"), col("c.dup_of") === col("y.doc_id"))
        .select(col("c.doc_id").as("doc_id"), col("c.dup_of").as("dup_of"),
          setJaccard(col("x.sh"), col("y.sh")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** Incremental near-dup detection (d13): match an INCOMING batch against
    * an already-ingested corpus without re-pairing the corpus with itself —
    * the nightly-ingest shape at 100 TB, where the historical side's band
    * table is a stored index that only ever gets appended to.
    *
    * Candidates come from the cross-set band equi-join only (incoming ×
    * known, never known × known), so per-ingest cost scales with the BATCH,
    * not the corpus; the exact-Jaccard verify then touches only candidate
    * pairs. Emits every (incoming doc, known doc) pair at or above the
    * threshold — the drop/keep policy stays with the caller
    * ([[dedupApply]]-style anti-join on the doc_id side). */
  def incrementalDedup(incoming: DataFrame, known: DataFrame,
      threshold: Double = 0.7, maxBandDocs: Int = MaxBandDocs): DataFrame = {
    val shI = shinglesWithBases(incoming)
    val shK = shinglesWithBases(known)
    Caching.withPersisted(shI, shK) {
      // each side is capped on its OWN key frequency: a key hot in the
      // 100 TB index (the realistic blowup) is excluded even when the
      // incoming batch holds it only once, and vice versa
      val cand = capHotKeys(bandTable(shI), Seq("bk1", "bk2"), maxBandDocs)
        .as("a")
        .join(capHotKeys(bandTable(shK), Seq("bk1", "bk2"), maxBandDocs)
          .as("b"),
          col("a.bk1") === col("b.bk1") && col("a.bk2") === col("b.bk2"))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"))
        .distinct()
      cand.as("c")
        .join(shI.as("x"), col("c.doc_id") === col("x.doc_id"))
        .join(shK.as("y"), col("c.dup_of") === col("y.doc_id"))
        .select(col("c.doc_id").as("doc_id"), col("c.dup_of").as("dup_of"),
          setJaccard(col("x.sh"), col("y.sh")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** Connected components via alternating large-star / small-star rounds
    * (the MapReduce-native algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — the giant-component scale path
    * [[connectedComponents]] documents: label propagation does O(diameter)
    * rounds each touching EVERY edge, while star contraction rewires edges
    * toward per-neighborhood minima and converges in O(log² n) rounds with
    * the edge set SHRINKING toward one star per component.
    *
    * large-star: every node u links its larger neighbors to
    * m = min(N(u) ∪ {u}); small-star: u links its smaller-or-equal
    * neighbors and itself to m. Both are one groupBy(min) + one equi-join
    * on the same key — the co-partitioned shuffle family — plus a distinct
    * to keep the edge set canonical. Fixpoint: edges form stars centered on
    * component minima, read off directly as (doc, lab).
    *
    * Same output contract as [[connectedComponents]]; DedupSpec pins the
    * two equivalent on randomized graphs against a local union-find. */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym0 = pairs.toDF("a", "b")
    val nodes = Caching.materialize(
      sym0.select(col("a").as("doc"))
        .union(sym0.select(col("b").as("doc"))).distinct())
    // Canonical undirected edge set, self-loops dropped.
    var edges = Caching.materialize(
      sym0.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct())
    def neighborhoodMin(sym: DataFrame): DataFrame =
      sym.groupBy(col("u")).agg(min(col("v")).as("nmin"))
        .select(col("u"), least(col("u"), col("nmin")).as("m"))
    // One star round: rewire each u's selected neighbors to u's
    // neighborhood minimum. large keeps v > u; small takes v <= u plus u
    // itself (dropping the self-pair m–m).
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val m = neighborhoodMin(sym)
      val joined = sym.join(m, "u")
      val rewired =
        if (large) joined.filter(col("v") > col("u"))
          .select(col("v"), col("m"))
        else joined.filter(col("v") <= col("u"))
          .select(col("v"), col("m"))
          .union(m.select(col("u").as("v"), col("m")))
      Caching.materialize(
        rewired.filter(col("v") =!= col("m"))
          .select(least(col("v"), col("m")).as("a"),
            greatest(col("v"), col("m")).as("b"))
          .distinct())
    }
    // Converged when the canonical edge set is unchanged: same size and an
    // order-independent XOR checksum (overflow-free under ANSI arithmetic,
    // collision-safe on a distinct edge set) — one aggregate action per
    // round; the previous round's signature is remembered, not recomputed.
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(a, b))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prevSig = sig(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = star(star(edges, large = true), large = false)
      val nextSig = sig(next)
      converged = nextSig == prevSig
      prevSig = nextSig
      edges = next
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponentsStar did NOT converge within $maxIter rounds; " +
          "component labels are incomplete. Raise maxIter.")
    // Fixpoint edges are stars (min, member): member → min, minima and
    // isolated nodes → themselves. The read-off AGGREGATES rather than
    // projects: at the fixpoint each node is `b` of at most one edge and
    // the min is a no-op, but if maxIter ran out unconverged a node can
    // still sit in several non-star edges — groupBy(min) keeps the
    // one-row-per-doc contract (with best-effort labels) instead of
    // emitting conflicting duplicates.
    nodes.join(edges, nodes("doc") === edges("b"), "left_outer")
      .groupBy(col("doc"))
      .agg(min(coalesce(col("a"), col("doc"))).as("lab"))
  }

  /** [[nearDupComponents]] computed through the star-contraction scale path
    * (d12) — identical decisions, giant-component-safe rounds. */
  def nearDupComponentsStar(documents: DataFrame,
      threshold: Double = 0.7, maxIter: Int = 25): DataFrame = {
    val pairs = minhashLsh(documents, threshold)
      .select(col("doc_a"), col("doc_b"))
    connectedComponentsStar(pairs, maxIter)
      .select(col("doc").as("doc_id"), col("lab").as("cluster_rep"),
        (col("doc") === col("lab")).as("keep"))
  }

  /** Apply dedup decisions (d8): drop every non-representative member of a
    * near-dup cluster and report the surviving corpus per source — the
    * left-anti join against the (small) drop list is the standard shape for
    * applying a dedup pass to a 100 TB corpus. */
  def dedupApply(documents: DataFrame, threshold: Double = 0.7): DataFrame =
    dedupApply(documents, nearDupComponents(documents, threshold))

  /** [[dedupApply]] over PRECOMPUTED component decisions — the form a real
    * pipeline uses so one LSH+components pass feeds dedup, splits, and
    * accounting instead of recomputing per consumer. */
  def dedupApply(documents: DataFrame, components: DataFrame): DataFrame = {
    val drops = components.filter(!col("keep")).select(col("doc_id"))
    documents
      .join(drops, Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_kept"))
  }

  /** Dedup accounting report (d16): the governance artifact next to d8's
    * surviving corpus — per source, how many documents the near-dup pass
    * dropped and what fraction of the source that was. The numbers a
    * curation review reads before signing off a training mix ("source X
    * lost 40% to dedup — is it syndicated content or a pipeline bug?").
    * Same components pass as d7/d8; the report is one left join + a
    * map-side-combined aggregate whose output is #sources rows. */
  def dedupReport(documents: DataFrame, threshold: Double = 0.7): DataFrame =
    dedupReport(documents, nearDupComponents(documents, threshold))

  /** [[dedupReport]] over PRECOMPUTED component decisions — like
    * [[dedupApply]]'s two-arg form, so one LSH+components pass feeds the
    * surviving corpus AND the accounting report instead of recomputing
    * per consumer. */
  def dedupReport(documents: DataFrame, comp: DataFrame): DataFrame = {
    documents.select(col("doc_id"), col("source"))
      .join(comp.select(col("doc_id"), col("keep")), Seq("doc_id"),
        "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep") === false, 1L).otherwise(0L)).as("n_dropped"))
      .select(col("source"), col("n_docs"), col("n_dropped"),
        (col("n_docs") - col("n_dropped")).as("n_kept"),
        (col("n_dropped").cast("double") / col("n_docs")).as("drop_frac"))
  }

  /** Hex-char value (0..15) at 1-based position c of a hex string. */
  private def hexVal(hx: Column, c: Column): Column = {
    val a = ascii(hx.substr(c, lit(1)))
    when(a <= 57, a - 48).otherwise(a - 87)
  }

  /** The 16 possible ±1 vote vectors of a hex char's 4 bits, as a constant
    * lookup table — votes(v)(j) = 2·bit_j(v) − 1. */
  private val hexVotes: Seq[Seq[Int]] =
    (0 to 15).map(v => (0 to 3).map(j => ((v >> j) & 1) * 2 - 1))

  /** ±1 contribution of each of the 60 bits of an md5 hex string (first 15
    * hex chars; bit b lives at hex char b/4, bit-in-char b%4). Takes the
    * ALREADY-COMPUTED hex column: HOF lambdas re-evaluate their body per
    * element with no common-subexpression elimination, so computing the md5
    * inside this function would hash every word 15 times. */
  private def hexBits(hx: Column): Column =
    flatten(transform(sequence(lit(1), lit(15)), c =>
      element_at(typedlit(hexVotes), (hexVal(hx, c) + 1).cast("int"))))

  /** SimHash fingerprint (d3): 60-bit signature per document, computed in a
    * single projection — per-word ±1 bit votes accumulated and packed into
    * a long by the native [[graft.functions.SimHashPack]] expression (one
    * generated loop; the HOF twin below built two 60-element arrays per
    * word). Integer-only arithmetic → bit-exact across engines; no shuffle
    * at any scale. One native digest+fold per word (no hex
    * intermediates), votes read from the fold's hex digits. */
  def simhash(documents: DataFrame): DataFrame = {
    val bases = transform(LlmText.words(col("text")),
      w => PortableHash.hash60("w:", w))
    documents.select(col("doc_id"),
      org.apache.spark.sql.graftinternal.Bridge.column(
        graft.functions.SimHashPack(
          org.apache.spark.sql.graftinternal.Bridge.expression(bases)))
        .as("simhash"))
  }

  /** The HOF formulation of [[simhash]]'s vote-and-pack — the portable
    * form the DuckDB oracle mirrors, pinned bit-equal to the native
    * expression by SimHashPackSpec. */
  private[graft] def simhashReference(documents: DataFrame): DataFrame = {
    val hexes = transform(LlmText.words(col("text")),
      w => md5(concat(lit("w:"), w).cast("binary")))
    val counts = aggregate(hexes,
      array_repeat(lit(0), 60),
      (acc, hx) => zip_with(acc, hexBits(hx), (x, y) => x + y))
    val packed = aggregate(
      zip_with(counts, sequence(lit(0), lit(59)), (cnt, b) =>
        when(cnt > 0, pow(lit(2.0), b).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    documents.select(col("doc_id"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs (d9): banded hamming search over the d3
    * signatures — 60 bits split into 4 bands of 15; two docs are candidates
    * iff they share ANY band value, verified by exact `bit_count(xor)` ≤
    * maxHamming.
    *
    * Recall contract: with 4 bands, the pigeonhole principle guarantees a
    * shared band only for hamming ≤ 3 — the default. A larger maxHamming
    * returns MORE pairs but becomes approximate (a radius-4 pair with one
    * differing bit per band shares no band and is missed); for guaranteed
    * recall at radius r, band into r+1 pieces instead.
    *
    * The same scale shape as MinHash LSH: candidates come from an
    * equi-join on (band index, 15-bit band value) — never an all-pairs
    * product — and the exact verify touches only candidate pairs, with
    * integer-only arithmetic both engines reproduce. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhash(documents)
      .transform(Partitioning.spread(_, col("doc_id")))
    Caching.withPersisted(sigs) {
      val bands = sigs
        .select(col("doc_id"), col("simhash"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .withColumn("bv", expr("shiftright(simhash, 15 * j) & 32767"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.j") === col("b.j") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.simhash").as("sa"), col("b.simhash").as("sb"))
        .distinct()
      cand
        .withColumn("hamming", expr("bit_count(sa ^ sb)"))
        .filter(col("hamming") <= maxHamming)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    }
  }

  /** Bottom-k n-gram Jaccard near-dup (d4): candidates share one of the 4
    * smallest shingle hashes (bottom-k sketch equi-join — content-based
    * blocking that survives cross-source/cross-lang near-dups), verified by
    * character-3-gram Jaccard ≥ 0.6. */
  /** The 4 smallest "f:"-md5 shingle hashes of a shingle-array column —
    * THE blocking key expression of the bottom-4 sketch family
    * (d4/d15/d16); one definition so the hash prefix and width can never
    * drift between the operators and the governance accounting. */
  private def bottom4Expr(shCol: Column): Column =
    slice(array_sort(transform(shCol, s => bottomKHash(s))), 1, 4)

  /** The 60-bit "f:" shingle-hash every bottom-k sketch sorts and blocks
    * on (d4/d6/d11/d15) — one definition so the prefix and fold width can
    * never drift between the sketch operators. Numeric order over the
    * fold equals lexicographic order over the hex it encodes. */
  private[operators] def bottomKHash(s: Column): Column =
    PortableHash.hash60("f:", s)

  /** The bottom-4 shingle-hash sketch rows (doc_id, h) d4/d15 block on —
    * content-based blocking that survives cross-source near-dups. */
  private def bottom4Sketch(documents: DataFrame): DataFrame =
    documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(size(LlmText.words(col("text"))) >= 3)
      .select(col("doc_id"),
        explode(bottom4Expr(LlmText.shingles(col("text")))).as("h"))
      .transform(Partitioning.spread(_, col("doc_id")))

  def ngramJaccard(documents: DataFrame, threshold: Double = 0.6,
      maxSketchDocs: Int = MaxBandDocs): DataFrame = {
    val sk = bottom4Sketch(documents)
    val g = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), LlmText.charTrigrams(col("text")).as("g3"))
      .transform(Partitioning.spread(_, col("doc_id")))
    Caching.withPersisted(sk, g) {
    val skc = capHotKeys(sk, Seq("h"), maxSketchDocs)
    val cand = skc.as("a")
      .join(skc.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(g.as("x"), col("doc_a") === col("x.doc_id"))
      .join(g.as("y"), col("doc_b") === col("y.doc_id"))
      // length-ratio prefilter: j >= t implies |A| >= t·|B| and vice versa
      // (|A∩B| <= |A|, |A∪B| >= |B|), so this prunes candidates with a
      // cheap size comparison before the expensive set intersection without
      // changing the result set.
      .filter(
        size(col("x.g3")).cast("double") >= lit(threshold) * size(col("y.g3")) &&
          size(col("y.g3")).cast("double") >= lit(threshold) * size(col("x.g3")))
      .select(col("doc_a"), col("doc_b"),
        setJaccard(col("x.g3"), col("y.g3")).as("jaccard3"))
      .filter(col("jaccard3") >= threshold)
    }
  }

  /** Shingle-containment scoring (d15): asymmetric near-superset detection
    * — containment(A→B) = |S_A ∩ S_B| / |S_A| on word-3-shingle sets, the
    * signal that catches "doc A is a quoted/extended copy inside doc B"
    * where Jaccard stays LOW because the union is dominated by the larger
    * doc (RefinedWeb-style curation uses exactly this to kill embedded
    * boilerplate). Candidates come from the same bottom-4 sketch blocking
    * as d4 — no all-pairs product — and each surviving pair reports both
    * directions so the caller picks which side is the subset.
    *
    * 100 TB shape: identical to d4's — sketch equi-join for candidates,
    * shingle sets gathered only for candidate pairs, everything keyed and
    * co-partitioned on doc_id.
    *
    * Recall contract (approximate, like [[graft.operators.Similarity]]'s
    * annTiered): the bottom-4 blocking is SYMMETRIC, but containment is
    * not — a small doc fully embedded in a much larger one is found only
    * if one of the small doc's 4 smallest shingle hashes is also among the
    * superset's 4 smallest, and the superset's EXTRA content can supply 4
    * smaller hashes that displace all of them. The miss probability grows
    * with the size ratio (≈ 1 − (|A|/|B|)⁴ for A ⊂ B in the uniform-hash
    * model), so extreme near-superset pairs can be silently skipped; raise
    * the sketch width or block on the subset side's full bottom-k when
    * that tail matters. The oracle mirrors the same blocking, so the
    * parity gate pins the implementation, not this recall ceiling. */
  def containment(documents: DataFrame, threshold: Double = 0.8,
      maxSketchDocs: Int = MaxBandDocs): DataFrame = {
    val sh = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(size(LlmText.words(col("text"))) >= 3)
      .select(col("doc_id"), LlmText.shingles(col("text")).as("sh"))
      .transform(Partitioning.spread(_, col("doc_id")))
    Caching.withPersisted(sh) {
      val sk = capHotKeys(
        sh.select(col("doc_id"), explode(bottom4Expr(col("sh"))).as("h")),
        Seq("h"), maxSketchDocs)
      val cand = sk.as("a")
        .join(sk.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val inter =
        size(array_intersect(col("x.sh"), col("y.sh"))).cast("double")
      cand.join(sh.as("x"), col("doc_a") === col("x.doc_id"))
        .join(sh.as("y"), col("doc_b") === col("y.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (inter / size(col("x.sh"))).as("cont_a_in_b"),
          (inter / size(col("y.sh"))).as("cont_b_in_a"))
        .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a"))
          >= threshold)
    }
  }

  /** Frequency-ordered prefix-filter set-similarity self-join (d26): the
    * EXACT-recall member of the candidate-generation family. MinHash bands
    * (d2) and bottom-k sketches (d4/d15) trade recall for cost; prefix
    * filtering (SSJoin / All-Pairs, Chaudhuri et al. ICDE'06, Bayardo et
    * al. WWW'07) guarantees every pair with Jaccard ≥ t shares at least one
    * token inside its PREFIX under any common total order: order each doc's
    * shingle-hash set by ascending corpus frequency (ties by hash) and keep
    * the first ⌊(1−t)·n⌋+1 tokens — two sets with ≥ ⌈t·n⌉ overlap cannot
    * avoid colliding there. Candidates are the prefix-token equi-join with
    * a size-ratio filter fused into the join (t·|A| ≤ |B| ≤ |A|/t is
    * necessary for Jaccard ≥ t); verification is exact Jaccard on the full
    * shingle sets of candidate pairs only.
    *
    * 100 TB shape: the rare-first order is the scale lever — prefixes hold
    * each document's RAREST tokens, so join keys are near-unique by
    * construction and the boilerplate shingle that breaks naive token
    * joins (shared by 10⁶ docs) sorts to the very END of every prefix
    * order and never enters a prefix unless the doc is mostly boilerplate.
    * The per-doc rank is a window keyed by doc_id (one shuffle, no global
    * sort); the frequency table is a plain count aggregate. `capHotKeys`
    * stays on as defense-in-depth for the adversarial corpus whose docs
    * are ALL near-identical (then every token is hot and capped pairs are
    * accounted by [[bandCapReport]]'s mechanism) — with the default cap
    * the result is exact whenever no prefix token is shared by more than
    * `maxPrefixDocs` documents, and DedupSpec pins equality against the
    * brute-force all-pairs join on an uncapped corpus. */
  /** Prefix length ⌊(1−t)·n⌋+1 — mathematically identical to the SSJoin
    * bound n−⌈t·n⌉+1 — computed with a +1e-9 nudge before the floor. In
    * bare IEEE doubles, (1.0 − t) rounds DOWN for t = 0.8/0.9 (e.g.
    * 1.0−0.8 = 0.19999999999999996), so (1−t)·n lands an ulp below the
    * exact integer and floor() under-shoots by one — one prefix token
    * short, and a pair at Jaccard exactly t can be missed, breaking the
    * exact-recall guarantee. The nudge errs LONG (a longer prefix never
    * loses recall): exact (1−t)·n for few-decimal-digit t is never within
    * 1e-9 below an integer, so the nudge can't overshoot either. The
    * DuckDB oracle twins (d26/d27/d28) carry the same `+ 1e-9`. */
  private def prefixLen(n: Column, threshold: Double): Column =
    floor((lit(1.0) - threshold) * n + lit(1e-9)) + 1

  /** PPJoin positional filter (Xiao et al., WWW'08 §3.2): a pair with
    * Jaccard ≥ t has overlap O ≥ t·(|A|+|B|)/(1+t), and at the FIRST
    * common token (positions i in A, j in B under the shared rare-first
    * total order) every other common token ranks after it in BOTH docs,
    * so O ≤ 1 + min(|A|−i, |B|−j). The first common token of a
    * qualifying pair lies inside both prefixes (the prefix theorem), so
    * requiring the bound on each joined prefix-token row — the pair
    * survives iff ANY of its shared prefix tokens passes — never drops
    * a qualifying pair, while candidates seeded only by a LATE prefix
    * position (the superlinear tail as bucket occupancy rises: the
    * STRESS d28_pairs 3.0×-at-10× kernel) die before the
    * array_intersect verify. The −1e-9 nudge errs ADMITTING (recall is
    * never lost to fp rounding of t·(na+nb)/(1+t)); the DuckDB oracle
    * twins carry the identical arithmetic. */
  private[operators] def positionalBound(na: Column, ra: Column, nb: Column,
      rb: Column, threshold: Double): Column =
    (lit(1) + least(na - ra, nb - rb)).cast("double") >=
      ceil(lit(threshold) * (na + nb).cast("double") /
        lit(1.0 + threshold) - lit(1e-9))

  def prefixFilterPairs(documents: DataFrame, threshold: Double = 0.7,
      maxPrefixDocs: Int = MaxBandDocs): DataFrame = {
    val sh = docShingles(documents)
    val tok = sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(transform(col("sh"),
        s => PortableHash.hash60("f:", s))).as("h"))
    val freq = tok.groupBy(col("h")).agg(count(lit(1)).as("freq"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("freq"), col("h"))
    val prefix = tok.join(freq, "h")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefixLen(col("n"), threshold))
      .select(col("doc_id"), col("n"), col("h"), col("rn"))
    // pc feeds BOTH sides of the candidate self-join; as a bracket
    // intermediate it is computed once and served from cache to the
    // second side — without it, exchange reuse across the aliased
    // window+join subplans is unreliable and the whole
    // explode→freq→rank chain runs twice (measured: op-level d26 at
    // 10× epochs ran ~1.7× its phase-sum before this persist).
    val pc = capHotKeys(prefix, Seq("h"), maxPrefixDocs)
    Caching.withPersisted(sh, pc) {
      // Eager cache build — the exception to the lazy-persist default
      // (r13 measured eager counts a bad trade suite-wide): a SELF-join
      // puts pc's compute under two sibling stages of one job, which the
      // scheduler launches concurrently, so the lazy build runs the
      // whole explode→freq→rank chain TWICE deterministically (not the
      // occasional scheduling-luck race the benign counter tracks) —
      // measured 45s vs a 23s phase-sum at 30× epochs. One count() pays
      // a cached-scan re-read instead.
      pc.count()
      val cand = pc.as("a")
        .join(pc.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            col("a.n").cast("double") >= lit(threshold) * col("b.n") &&
            col("b.n").cast("double") >= lit(threshold) * col("a.n") &&
            positionalBound(col("a.n"), col("a.rn"),
              col("b.n"), col("b.rn"), threshold))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand.join(sh.as("x"), col("doc_a") === col("x.doc_id"))
        .join(sh.as("y"), col("doc_b") === col("y.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          setJaccard(col("x.sh"), col("y.sh")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** Measured LSH recall against exact ground truth (d44): d23/d25
    * PREDICT the banding S-curve p(candidate | jaccard); this measures
    * it — [[prefixFilterPairs]] (exact recall by construction) is the
    * ground-truth pair set, [[minhashLsh]] the probabilistic one, and
    * the report buckets true pairs by Jaccard decile with the fraction
    * LSH actually found. The measured recall column is directly
    * comparable to d23's p_candidate at the bucket's similarity — the
    * validation loop for the (bands, rows) choice d25 makes on paper.
    * LSH output ⊆ exact output always (both verify exact Jaccard ≥ t;
    * they differ only in candidate recall), so a left join from the
    * truth side accounts every pair. Cost: both pipelines once —
    * an audit row, not a serving path. Empty corpus → empty report. */
  def lshVsExact(documents: DataFrame, threshold: Double = 0.7): DataFrame = {
    val exact = prefixFilterPairs(documents, threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val lsh = minhashLsh(documents, threshold)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("found"))
    exact.join(lsh, Seq("doc_a", "doc_b"), "left_outer")
      .select(floor(col("jaccard") * lit(10)).cast("int").as("j_bucket"),
        coalesce(col("found"), lit(0L)).as("found"))
      .groupBy(col("j_bucket"))
      .agg(count(lit(1)).as("n_true_pairs"),
        sum(col("found")).as("n_lsh_found"))
      .select(col("j_bucket"), col("n_true_pairs"), col("n_lsh_found"),
        (col("n_lsh_found").cast("double") /
          col("n_true_pairs").cast("double")).as("lsh_recall"))
  }

  /** Positional-filter effectiveness audit (d43): the PPJoin bound's
    * effect measured AS DATA on the real corpus, the d42 idiom applied
    * to r16's candidate-pruning change. One row: the distinct candidate
    * count under the base prefix join (size-ratio only), the count
    * surviving the positional bound, the pruned fraction, the verified
    * near-dup pair count, and — the exact-recall claim as a number —
    * how many VERIFIED pairs the bound would have pruned (must be 0;
    * the spec and oracle both pin it). Costs one extra flag column over
    * the pre-r16 d26 plan: every base candidate is verified here
    * because the audit's subject is exactly the rows d26 no longer
    * pays for. Empty corpus → empty report (grouped on a constant). */
  def prefixFilterAudit(documents: DataFrame, threshold: Double = 0.7,
      maxPrefixDocs: Int = MaxBandDocs): DataFrame = {
    val sh = docShingles(documents)
    val tok = sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(transform(col("sh"),
        s => PortableHash.hash60("f:", s))).as("h"))
    val freq = tok.groupBy(col("h")).agg(count(lit(1)).as("freq"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("freq"), col("h"))
    val prefix = tok.join(freq, "h")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefixLen(col("n"), threshold))
      .select(col("doc_id"), col("n"), col("h"), col("rn"))
    val pc = capHotKeys(prefix, Seq("h"), maxPrefixDocs)
    Caching.withPersisted(sh, pc) {
      pc.count() // eager cache build — see prefixFilterPairs
      val cand = pc.as("a")
        .join(pc.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            col("a.n").cast("double") >= lit(threshold) * col("b.n") &&
            col("b.n").cast("double") >= lit(threshold) * col("a.n"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          when(positionalBound(col("a.n"), col("a.rn"),
            col("b.n"), col("b.rn"), threshold), 1L).otherwise(0L)
            .as("ok"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(max(col("ok")).as("pp_ok"))
      cand.join(sh.as("x"), col("doc_a") === col("x.doc_id"))
        .join(sh.as("y"), col("doc_b") === col("y.doc_id"))
        .select(col("pp_ok"),
          setJaccard(col("x.sh"), col("y.sh")).as("j"))
        .groupBy(lit(true).as("all"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(col("pp_ok")).as("n_after_positional"),
          sum(when(col("j") >= threshold, 1L).otherwise(0L))
            .as("n_verified"),
          sum(when(col("j") >= threshold && col("pp_ok") === 0L, 1L)
            .otherwise(0L)).as("n_verified_pruned"))
        .select(col("n_candidates"), col("n_after_positional"),
          ((col("n_candidates") - col("n_after_positional")).cast("double") /
            col("n_candidates").cast("double")).as("pruned_frac"),
          col("n_verified"), col("n_verified_pruned"))
    }
  }

  /** Dedup operating-point table (d45): what each Jaccard threshold
    * actually REMOVES — pair count, docs touched, docs dropped (one
    * keeper per connected component, d28's rule) and the removed
    * fraction of the corpus, per threshold. [[prefixFilterPairs]] runs
    * ONCE at the lowest threshold (exact recall there covers every
    * higher cut — a pair at Jaccard ≥ t' ≥ t is in the base set by
    * construction), then each threshold filters the verified pairs and
    * runs [[connectedComponents]] on its surviving edge set; the base
    * pair table is already materialized and lineage-truncated by the
    * prefix operator's cache bracket, so the per-threshold legs re-read
    * checkpoint blocks, never the shingle pipeline. This is the table
    * that turns d44 (recall per decile) and d25 (predicted fp/fn mass)
    * into a removal decision: what 0.8-vs-0.7 costs in kept tokens is
    * read here, not estimated.
    *
    * 100 TB shape: cost is one d26 pass plus |thresholds| CC loops over
    * verified-pair edge sets — the pair set is orders of magnitude
    * smaller than the corpus (it fits broadcast range at any corpus
    * size that dedup is sane for), so the sweep's marginal cost over
    * d26 is near zero. Thresholds with zero surviving pairs produce no
    * row (the grouped empty-shape convention); empty corpus → empty. */
  /** The d45 sweep's default cuts — the oracle SQL interpolates this
    * list (the d39/ChainProbePositions lesson: one source of truth, so
    * widening the sweep updates engine and oracle in lockstep). The
    * base prefix-filter CTEs in the oracle are written at 0.7: if a
    * future edit drops `SweepThresholds.min` below that, the oracle's
    * base-pass threshold must move with it. */
  val SweepThresholds: Seq[Double] = Seq(0.7, 0.8, 0.9)

  def thresholdSweep(documents: DataFrame,
      thresholds: Seq[Double] = SweepThresholds): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep: need at least one threshold")
    val nTotal = documents.count()
    val pairs = prefixFilterPairs(documents, thresholds.min)
    thresholds.sorted.map { t =>
      val p = pairs.filter(col("jaccard") >= lit(t))
      val comps = connectedComponents(p.select(col("doc_a"), col("doc_b")))
      val np = p.select(lit(t).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("n_pairs"))
      comps.select(lit(t).as("t"), col("doc"), col("lab"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_docs_in_pairs"),
          sum(when(col("doc") =!= col("lab"), 1L).otherwise(0L))
            .as("n_docs_removed"))
        // both sides are single-row global aggregates; the join key is
        // the folded constant t, so without the hint the planner emits a
        // CartesianProduct (1×1 — harmless, but the broadcast makes it
        // the same BNLJ shape as every other scalar join in the suite
        // and keeps the plan audit's "no cartesian" invariant clean)
        .join(broadcast(np), "t")
        .select(col("t").as("threshold"), col("n_pairs"),
          col("n_docs_in_pairs"), col("n_docs_removed"),
          (col("n_docs_removed").cast("double") / lit(nTotal.toDouble))
            .as("frac_docs_removed"))
    }.reduce(_.union(_))
  }

  /** The two stored tables of a materialized prefix-filter index (d27):
    * the corpus token-frequency table (h, freq) — the FROZEN total order
    * every later search ranks against — and the per-doc table (doc_id, n,
    * sh, pre) holding the shingle set and its precomputed prefix hashes.
    * Both are plain lake-table shapes (parquet round-trip pinned by
    * DedupSpec), the [[graft.operators.Similarity.IvfAdcIndex]] pattern
    * applied to the EXACT dedup family. */
  final case class PrefixFilterIndex(freq: DataFrame, docs: DataFrame)

  /** Build the prefix-filter index once: one token explode, one frequency
    * aggregate, one rank window — after this, ingests never recompute the
    * corpus order. */
  def prefixFilterIndex(documents: DataFrame,
      threshold: Double = 0.7): PrefixFilterIndex = {
    val sh = docShingles(documents)
    sh.persist()
    try {
      val tok = sh.select(col("doc_id"), size(col("sh")).as("n"),
        explode(transform(col("sh"),
          s => PortableHash.hash60("f:", s))).as("h"))
      val freq = Caching.materialize(
        tok.groupBy(col("h")).agg(count(lit(1)).as("freq")))
      val byRarity = Window.partitionBy(col("doc_id"))
        .orderBy(col("freq"), col("h"))
      val pre = tok.join(freq, "h")
        .withColumn("rn", row_number().over(byRarity))
        .filter(col("rn") <= prefixLen(col("n"), threshold))
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("h"), col("rn"))).as("pre"))
      val docs = Caching.materialize(sh.join(pre, "doc_id")
        .select(col("doc_id"), size(col("sh")).as("n"), col("sh"),
          col("pre")))
      PrefixFilterIndex(freq, docs)
    } finally sh.unpersist(false)
  }

  /** [[prefixFilterPairs]] against a PREBUILT [[prefixFilterIndex]] (d27):
    * the incoming batch ranks its tokens by the STORED frequency order —
    * tokens the index has never seen take frequency 0, sorting before all
    * seen tokens, which keeps the order a single consistent total order
    * over the whole token universe (a token's key is the same no matter
    * which side evaluates it), so the prefix-filter recall guarantee
    * stays EXACT for cross-set pairs. Candidates are incoming-prefix ×
    * stored-prefix only (never index × index); verification reads the
    * stored shingle sets. Same output contract as d13/d20
    * (doc_id, dup_of, jaccard).
    *
    * Staleness contract (same as [[nearDupIndex]]): the frozen frequency
    * order drifts as the corpus grows — drift changes which tokens land
    * in NEW prefixes but never breaks the total-order consistency above,
    * so recall stays exact; rebuild on the nightly cadence to keep
    * prefixes rare-first (the performance property, not the correctness
    * one). */
  def prefixFilterVsIndex(incoming: DataFrame, index: PrefixFilterIndex,
      threshold: Double = 0.7, maxPrefixDocs: Int = MaxBandDocs): DataFrame = {
    // Stored-layout guard: r16 widened `pre` from array<bigint> (token
    // hashes only) to array<struct<h,rn>> (hash + prefix rank) for the
    // PPJoin positional filter. A pre-r16 parquet index would otherwise
    // die inside the join with an unresolved-column analysis error —
    // fail fast with the actionable message instead.
    index.docs.schema("pre").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        _: org.apache.spark.sql.types.StructType, _) => ()
      case other => throw new IllegalStateException(
        "prefix-filter index uses a legacy layout (pre: array<" +
          other.asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType.simpleString +
          ">); this engine expects pre: array<struct<h,rn>> — rebuild " +
          "the stored index with Dedup.prefixFilterIndex")
    }
    val shI = docShingles(incoming)
    Caching.withPersisted(shI, index.freq, index.docs) {
      val tokI = shI.select(col("doc_id"), size(col("sh")).as("n"),
        explode(transform(col("sh"),
          s => PortableHash.hash60("f:", s))).as("h"))
      val byRarity = Window.partitionBy(col("doc_id"))
        .orderBy(col("freq"), col("h"))
      val preI = capHotKeys(
        tokI.join(index.freq, Seq("h"), "left_outer")
          .withColumn("freq", coalesce(col("freq"), lit(0L)))
          .withColumn("rn", row_number().over(byRarity))
          .filter(col("rn") <= prefixLen(col("n"), threshold))
          .select(col("doc_id"), col("n"), col("h"), col("rn")),
        Seq("h"), maxPrefixDocs)
      val preK = capHotKeys(
        index.docs.select(col("doc_id"), col("n"),
          explode(col("pre")).as("e"))
          .select(col("doc_id"), col("n"),
            col("e.h").as("h"), col("e.rn").as("rn")),
        Seq("h"), maxPrefixDocs)
      val cand = preI.as("a")
        .join(preK.as("b"),
          col("a.h") === col("b.h") &&
            col("a.n").cast("double") >= lit(threshold) * col("b.n") &&
            col("b.n").cast("double") >= lit(threshold) * col("a.n") &&
            positionalBound(col("a.n"), col("a.rn"),
              col("b.n"), col("b.rn"), threshold))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"))
        .distinct()
      cand.as("c")
        .join(shI.as("x"), col("c.doc_id") === col("x.doc_id"))
        .join(index.docs.as("y"), col("c.dup_of") === col("y.doc_id"))
        .select(col("c.doc_id").as("doc_id"), col("c.dup_of").as("dup_of"),
          setJaccard(col("x.sh"), col("y.sh")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }
  /** Salt fan-out for the label-blocked join below: parallelism becomes
    * #labels × SaltBuckets instead of #labels. */
  val SaltBuckets = 8


  /** Embedding-cosine near-dup pairs (d5): label-blocked self-join (the
    * cluster-id analog of ANN bucketing — at 100 TB the block key would come
    * from s2's LSH signature instead), exact in-order cosine ≥ threshold.
    *
    * The block key is low-cardinality (10 labels), so a plain equi-join
    * would collapse onto 10 tasks regardless of cluster size. Classic
    * salting fixes the skew: the left side gets salt = vec_id mod S, the
    * right side is replicated across all S salts, and the join key becomes
    * (label, salt) — S× replication of one side buys S× parallelism. */
  def embeddingDedup(embeddings: DataFrame,
      threshold: Double = 0.4): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    // Norms are precomputed per vector (not per pair — that would triple the
    // pair-stage flops) and materialized behind an exchange.
    val v = embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"), col("label"),
        VectorOps.asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(VectorOps.norm2(col("x"))))
      .transform(Partitioning.spread(_, col("vec_id")))
    val left = v.withColumn("salt", pmod(col("vec_id"), lit(SaltBuckets)))
    val right = v.withColumn("salt",
      explode(sequence(lit(0), lit(SaltBuckets - 1))))
    left.as("a")
      .join(right.as("b"),
        col("a.label") === col("b.label") && col("a.salt") === col("b.salt") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (graft.functions.GraftFunctions.dot(col("a.x"), col("b.x")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SemDeDup-style semantic dedup (c14): resolve [[embeddingDedup]]'s
    * cosine near-dup pairs into per-document keep/drop decisions — group
    * semantically-identical docs into components and keep one representative
    * (the minimum id) per component. Docs without any near-dup keep
    * themselves. This is the embedding-space twin of the MinHash pipeline
    * (d7 → d8): same component machinery, different similarity generator —
    * the "prune semantic duplicates before training" pass of
    * Abbas et al.'s SemDeDup, with the cluster step expressed as the
    * label-blocked pair join + CC instead of a k-means partition.
    *
    * 100 TB shape: inherits embeddingDedup's salted label-blocked join (no
    * all-pairs product) and connectedComponents' O(log diameter) rounds;
    * the final decision join is a doc_id equi-join. */
  /** URL-level dedup (d14): the first dedup pass of a crawl pipeline —
    * canonicalize each document's URL ([[LlmText.normUrl]]: case, default
    * port, `www.`, tracking params, fragment) and keep ONE document per
    * canonical URL: the longest text, doc_id as the deterministic
    * tiebreak. Emits (norm_url, keep_doc_id, n_chars, n_dupes) so the
    * dupe mass per URL is visible to curation reports.
    *
    * 100 TB shape: winner selection is the heap-based
    * [[graft.plans.TopK.perKey]] (k=1, partial per-partition heaps — the
    * shuffle carries one candidate per URL per partition, not the dupe
    * mass), and the dupe count is a co-partitioned groupBy on the same
    * key; both exchanges hash on norm_url, so the join after them is
    * shuffle-free. */
  def urlDedup(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    // ONE scan, ONE exchange: normalize + spread by the dedup key itself,
    // persist for the two consumers — the heap top-k and the dupe count
    // both declare clustering on norm_url, so neither adds a shuffle, and
    // the winners/counts join is co-partitioned.
    val docs = documents.select(col("doc_id"),
        LlmText.normUrl(
          LlmText.withSyntheticUrl(col("doc_id"), col("source")))
          .as("norm_url"),
        length(col("text")).cast("long").as("n_chars"))
      .transform(Partitioning.spread(_, col("norm_url")))
    Caching.withPersisted(docs) {
      val winners = graft.plans.TopK.perKey(docs, Seq(col("norm_url")),
        Seq(col("n_chars").desc, col("doc_id")), 1)
        .select(col("norm_url"), col("doc_id").as("keep_doc_id"),
          col("n_chars"))
      val counts = docs.groupBy(col("norm_url"))
        .agg(count(lit(1)).as("n_dupes"))
      winners.join(counts, Seq("norm_url"))
    }
  }

  def semDedup(documents: DataFrame, embeddings: DataFrame,
      threshold: Double = 0.4): DataFrame = {
    val pairs = embeddingDedup(embeddings, threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val comp = connectedComponents(pairs)
    documents.select(col("doc_id"))
      .join(comp, col("doc_id") === col("doc"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("lab"), col("doc_id")).as("cluster_rep"),
        (coalesce(col("lab"), col("doc_id")) === col("doc_id")).as("keep"))
  }

  /** Combined dedup governance report (d16): ONE frame carrying both
    * accounting artifacts a curation review reads — [[dedupReport]]'s
    * per-source dropped-mass rows AND [[bandCapReport]]'s per-key-family
    * hot-key-cap rows — unioned under a shared wide schema (`section`
    * names the source or the key family; `kind` discriminates; the
    * non-applicable measure columns are null). One query slot serves both
    * artifacts, so the registered-query budget the correctness driver
    * enumerates stays at 132 (round 7 showed the 133rd registration
    * silently lost its oracle row).
    *
    * `threshold` feeds the near-dup components (production posture);
    * `cap` feeds only the ACCOUNTING rows — callers pass a small cap to
    * exercise the hot-key arithmetic on modest corpora while the dedup
    * pass itself keeps [[MaxBandDocs]]. */
  def governanceReport(documents: DataFrame, threshold: Double = 0.7,
      cap: Int = MaxBandDocs): DataFrame = {
    def nullL(n: String) = lit(null).cast("long").as(n)
    // ONE shingle pass serves both report families (r7 advice: don't pay
    // the corpus scan + shingle hashing twice in one governance query):
    // the dedup chain reads the persisted sh through lshPairs, and the
    // cap-accounting rows count the SAME band table plus the bottom-4
    // sketch derived from the same sh column.
    val sh = shinglesWithBases(documents)
    val (pairs, capRows) = Caching.withPersisted2(sh) {
      val p = lshPairs(sh, threshold, MaxBandDocs)
        .select(col("doc_a"), col("doc_b"))
      val bandCounts = bandTable(sh)
        .groupBy(col("bk1"), col("bk2")).agg(count(lit(1)).as("n"))
      val sketchCounts = sh
        .select(col("doc_id"), explode(bottom4Expr(col("sh"))).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("n"))
      (p, capFamilyStats(bandCounts, "minhash_band", cap)
        .unionAll(capFamilyStats(sketchCounts, "bottom4_sketch", cap)))
    }
    val comp = connectedComponents(pairs)
      .select(col("doc").as("doc_id"), col("lab").as("cluster_rep"),
        (col("doc") === col("lab")).as("keep"))
    val src = dedupReport(documents, comp).select(
      col("source").as("section"), lit("source_dedup").as("kind"),
      col("n_docs"), col("n_dropped"), col("n_kept"), col("drop_frac"),
      nullL("n_keys"), nullL("n_hot_keys"), nullL("n_dropped_entries"))
    src.unionByName(capRows.select(
      col("family").as("section"), lit("hot_key_cap").as("kind"),
      nullL("n_docs"), nullL("n_dropped"), nullL("n_kept"),
      lit(null).cast("double").as("drop_frac"),
      col("n_keys"), col("n_hot_keys"), col("n_dropped_entries")))
  }

  /** Hot-key cap accounting (d17): per key family, how many band/sketch
    * keys exist, how many exceed `cap`, and how many (doc,key) entries the
    * cap excludes from candidate generation — the governance artifact next
    * to [[dedupReport]], so a curation review sees the blocking mass the
    * LSH family refused to pair ("4 keys carry 60% of the corpus — that's
    * boilerplate, not near-dups") instead of a silent recall cliff.
    *
    * Families mirror the two candidate generators: `minhash_band` =
    * [[bandTable]]'s packed (bk1,bk2) keys (d2/d7/d8/d12/d13/c3/c5),
    * `bottom4_sketch` = [[bottom4Sketch]]'s h keys (d4/d15). Cost: the same
    * per-key counts [[capHotKeys]] computes, aggregated to ONE row per
    * family — map-side combined, no join. */
  def bandCapReport(documents: DataFrame, cap: Int = MaxBandDocs): DataFrame = {
    val bandCounts = bandTable(shinglesWithBases(documents))
      .groupBy(col("bk1"), col("bk2")).agg(count(lit(1)).as("n"))
    val sketchCounts = bottom4Sketch(documents)
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
    capFamilyStats(bandCounts, "minhash_band", cap)
      .unionAll(capFamilyStats(sketchCounts, "bottom4_sketch", cap))
  }

  /** ONE accounting row for a key family's per-key counts frame `(…, n)`:
    * total keys, keys over `cap`, and the (doc,key) entries the cap drops.
    * Shared by [[bandCapReport]] and [[governanceReport]] so the
    * accounting arithmetic cannot drift between them. */
  private def capFamilyStats(counts: DataFrame, family: String,
      cap: Int): DataFrame =
    counts.agg(count(lit(1)).as("n_keys"),
        sum(when(col("n") > cap, 1L).otherwise(0L)).as("n_hot_keys"),
        sum(when(col("n") > cap, col("n")).otherwise(0L))
          .as("n_dropped_entries"))
      .select(lit(family).as("family"), col("n_keys"), col("n_hot_keys"),
        col("n_dropped_entries"))

  /** The d2 band-join candidate pairs at a given cap — exposed for
    * SkewSpec, which plants a boilerplate key in most of the corpus and
    * pins that capped candidates stay O(docs·cap) while the uncapped count
    * blows up O(docs²). */
  private[graft] def lshCandidatePairs(documents: DataFrame,
      cap: Int): DataFrame = {
    val bands = capHotKeys(bandTable(shinglesWithBases(documents)),
      Seq("bk1", "bk2"), cap)
    bands.as("a")
      .join(bands.as("b"),
        col("a.bk1") === col("b.bk1") && col("a.bk2") === col("b.bk2") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH operating curve (d23): P(candidate | jaccard = s) for the
    * configured 4-band × 3-row minhash blocking — `1 − (1 − s³)⁴` on a
    * fixed s grid. The governance table that documents what the detector
    * CAN see: the curve's steep region is where d2's candidate recall
    * transitions, and a reviewer reads the miss probability at the 0.7
    * decision threshold straight off the row. Multiplication-only
    * arithmetic in fixed order (s·s·s, q·q squared twice), so the doubles
    * are bit-identical across engines — no pow(). */
  def lshCandidateCurve(
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(1, 20)
      .select((col("id").cast("double") / 20).as("jaccard"))
      .withColumn("s3", col("jaccard") * col("jaccard") * col("jaccard"))
      .withColumn("q", lit(1.0) - col("s3"))
      .withColumn("q2", col("q") * col("q"))
      .select(col("jaccard"),
        (lit(1.0) - col("q2") * col("q2")).as("p_candidate"))

  /** LSH parameter auto-tuner (d25): for a fixed hash budget, score every
    * (bands, rows) factorization's S-curve against a target similarity
    * threshold and flag the argmin — the tuning artifact behind d2/d23's
    * hardcoded (4, 3): `fp_mass` integrates P(candidate) below the
    * threshold (wasted verify work), `fn_mass` integrates 1−P above it
    * (missed near-dups), both on d23's 19-point grid.
    *
    * Arithmetic contract: powers are repeated multiplication via a
    * left-fold from 1.0 (1.0·s ≡ s in IEEE, so Spark's `aggregate` HOF
    * and DuckDB's `list_reduce` agree bit-for-bit); the per-point error
    * terms are grid-rounded before the cross-grid sum so the integral is
    * order-independent. All of it runs on a generated 6×19-row frame —
    * there is no data input; the artifact is the decision table. */
  def lshTune(spark: org.apache.spark.sql.SparkSession,
      hashBudget: Int = 12, threshold: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val combos = (1 to hashBudget)
      .filter(hashBudget % _ == 0)
      .map(b => (b, hashBudget / b))
    val base = spark.createDataFrame(combos).toDF("bands", "rows_per_band")
      .crossJoin(spark.range(1, 20)
        .select((col("id").cast("double") / 20).as("s")))
    def powFold(x: Column, n: Column): Column =
      aggregate(sequence(lit(1), n), lit(1.0), (acc, _) => acc * x)
    val scored = base
      .withColumn("sr", powFold(col("s"), col("rows_per_band")))
      .withColumn("p",
        lit(1.0) - powFold(lit(1.0) - col("sr"), col("bands")))
      .withColumn("fp_term",
        when(col("s") < threshold, col("p") * lit(0.05)).otherwise(lit(0.0)))
      .withColumn("fn_term",
        when(col("s") >= threshold, (lit(1.0) - col("p")) * lit(0.05))
          .otherwise(lit(0.0)))
    def gridSum(c: Column): Column =
      (sum(round(c * lit(1.0e9)).cast(DecimalType(38, 0)))
        .cast("double") / lit(1.0e9))
    val errs = scored.groupBy(col("bands"), col("rows_per_band"))
      .agg(gridSum(col("fp_term")).as("fp_mass"),
        gridSum(col("fn_term")).as("fn_mass"))
      .withColumn("total_err", col("fp_mass") + col("fn_mass"))
    errs.withColumn("chosen",
      row_number().over(Window.partitionBy()
        .orderBy(col("total_err"), col("bands"))) === 1)
  }

  /** Quality-ranked cluster winners (d22): within each near-dup cluster,
    * keep the LONGEST member (ties to the smaller doc_id) instead of
    * [[nearDupComponents]]' min-id representative — the RefinedWeb /
    * CCNet keep-policy: near-dups usually differ by truncation, and the
    * longest copy carries the most content. Emits every clustered doc
    * with its cluster, the winner, and the keep verdict; singletons never
    * enter a cluster and are untouched (same contract as d7).
    *
    * Cost on top of d7 is one co-keyed join with the (doc_id, n_chars)
    * projection and a heap argmax per cluster — no new shuffle family:
    * members and winners both key on cluster_rep. */
  def keepBestInCluster(documents: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val members = nearDupComponents(documents, threshold)
      .select(col("doc_id"), col("cluster_rep"))
      .join(documents.select(col("doc_id"), col("n_chars")), "doc_id")
    val winners = graft.plans.TopK.perKey(members,
        Seq(col("cluster_rep")),
        Seq(col("n_chars").desc, col("doc_id")), 1)
      .select(col("cluster_rep"), col("doc_id").as("winner_id"))
    members
      .join(winners, "cluster_rep")
      .select(col("doc_id"), col("cluster_rep"), col("winner_id"),
        (col("doc_id") === col("winner_id")).as("keep"))
  }

  /** Blocked fuzzy-title pairs (d21): documents whose leading `titleLen`
    * chars are within `maxEdit` Levenshtein edits — the entity-resolution
    * join (re-crawled pages with tweaked headlines, re-uploads with
    * version suffixes) that exact hashing misses and shingle LSH
    * over-triggers on.
    *
    * Edit distance is O(titleLen²) per comparison and CANNOT be computed
    * against the whole corpus; the scalable shape is block-then-verify:
    * candidates must share their first `blockPrefix` chars exactly (an
    * equi-join key — titles whose edits touch the prefix are found by d2's
    * shingle blocking instead; this is the cheap complementary blocker),
    * hot blocks are capped by [[capHotKeys]] with the same accounted-drop
    * stance as the LSH family, and the quadratic verify runs only inside
    * blocks. Work scales with Σ block² bounded by cap², never corpus². */
  def fuzzyTitlePairs(documents: DataFrame, titleLen: Int = 40,
      blockPrefix: Int = 8, maxEdit: Int = 5,
      maxBlockDocs: Int = MaxBandDocs): DataFrame = {
    val t = capHotKeys(
      documents
        .select(col("doc_id"),
          substring(col("text"), 1, titleLen).as("title"))
        .withColumn("blk", substring(col("title"), 1, blockPrefix))
        .transform(Partitioning.spread(_, col("doc_id"))),
      Seq("blk"), maxBlockDocs)
    t.as("a")
      .join(t.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.title"), col("b.title")).as("edit_dist"))
      .filter(col("edit_dist") <= maxEdit)
  }

  /** Sorted-neighborhood near-dup blocking (d24): globally sort the corpus
    * by the normalized blocking key and compare each record only against
    * its `window` successors in that order — the classic complement to
    * hash blocking ([[fuzzyTitlePairs]]'s prefix blocks): candidate count
    * is O(n·window) by CONSTRUCTION regardless of key distribution, so a
    * pathological hot key (which hash blocking must cap and drop) costs
    * nothing here; the trade is that pairs whose keys sort far apart are
    * never compared, even with a shared prefix.
    *
    * Global order without a global sort: range-partition on the key,
    * per-partition row_number + broadcast partition-count offsets (the
    * [[Relational.equiDepthHistogram]] two-phase rank — the collect is
    * `partitions` longs of bounded driver state). Neighbor pairing is an
    * EQUI-join on rank buckets of width `window` (right side replicated to
    * its own and preceding bucket), so the pair generation shuffles on a
    * dense integer key — no range-join nested loop, no single-partition
    * window. Emitted pairs are canonicalized to (min, max) doc_id. */
  def sortedNeighborPairs(documents: DataFrame, titleLen: Int = 40,
      window: Int = 10, maxEdit: Int = 5, partitions: Int = 32): DataFrame = {
    val sortKeys = Seq(col("title"), col("doc_id"))
    val parted = documents
      .select(col("doc_id"), substring(col("text"), 1, titleLen).as("title"))
      .repartitionByRange(partitions, sortKeys: _*)
      .withColumn("pid", spark_partition_id())
    Caching.withPersisted(parted) {
      val perPart = parted.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets = {
        var acc = 0L
        (0 until partitions).map { p =>
          val o = p -> acc; acc += perPart.getOrElse(p, 0L); o
        }
      }
      val offDf = broadcast(
        parted.sparkSession.createDataFrame(offsets).toDF("pid", "off"))
      val pw = Window.partitionBy(col("pid"))
        .orderBy(sortKeys.map(_.asc): _*)
      val ranked = parted.join(offDf, "pid")
        .select(col("doc_id"), col("title"),
          (col("off") + row_number().over(pw)).as("rk"))
        .withColumn("bk", floor((col("rk") - 1) / lit(window.toLong)))
      val right = ranked.select(col("doc_id").as("r_doc_id"),
        col("title").as("r_title"), col("rk").as("r_rk"),
        explode(array(col("bk"), col("bk") - 1)).as("jb"))
      ranked.join(right,
          col("bk") === col("jb") &&
            (col("r_rk") - col("rk")).between(1, window.toLong))
        .select(
          least(col("doc_id"), col("r_doc_id")).as("doc_a"),
          greatest(col("doc_id"), col("r_doc_id")).as("doc_b"),
          levenshtein(col("title"), col("r_title")).as("edit_dist"))
        .filter(col("edit_dist") <= maxEdit)
    }
  }

  /** One row per fixed-width "line" of each document: (doc_id, li, line)
    * with `li` the line's position. The x12 segmentation (the corpus has
    * no newlines, so a line is a `lineLen`-word window), shared by the
    * boilerplate family so the detector and the apply cannot drift.
    * One posexplode with bounded fanout n_words/lineLen, no shuffle. */
  private def docLines(documents: DataFrame, lineLen: Int): DataFrame = {
    val ws = LlmText.words(col("text"))
    documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(ws), lit(lineLen)),
          i => array_join(slice(ws, i, lit(lineLen)), " ")))
          .as(Seq("li", "line")))
  }

  /** Cross-document repeated-line detector (d33): lines whose exact text
    * occurs in at least `minDocs` DISTINCT documents — the
    * boilerplate-removal primitive of the CCNet/C4 lineage (navigation
    * chrome, cookie banners, license footers repeat across pages;
    * in-document prose does not). Returns (line, n_docs, n_occurrences).
    *
    * 100 TB shape: explode to n_words/lineLen rows per doc, then ONE
    * map-side-combinable aggregate on the line text — the same
    * key-cardinality regime as a token count. A hot boilerplate line is
    * exactly a heavy aggregation key, which partial aggregation absorbs;
    * nothing here is quadratic in duplication. */
  def boilerplateLines(documents: DataFrame, lineLen: Int = 8,
      minDocs: Int = 2): DataFrame =
    boilerFrom(docLines(documents, lineLen), minDocs)
      .select(col("line"), col("n_docs"), col("n_occurrences"))

  private def boilerFrom(lines: DataFrame, minDocs: Int): DataFrame =
    lines
      .groupBy(col("line"))
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)

  /** Boilerplate-line removal report (d34): per document, how many lines
    * the [[boilerplateLines]] set removes, the kept ratio, and the md5 of
    * the surviving text (lines rejoined in order) — the apply step next
    * to d33's detector, mirroring the d8/d26 detect/apply pairing.
    *
    * ONE line-explode pass feeds both the detector aggregate and the
    * per-doc rebuild (persisted bracket); the rebuild is a
    * collect_list-per-doc of its own lines — bounded at n_words/lineLen
    * entries, the row the doc already was. */
  def boilerplateApply(documents: DataFrame, lineLen: Int = 8,
      minDocs: Int = 2): DataFrame = {
    val lines = docLines(documents, lineLen)
    Caching.withPersisted(lines) {
      val boiler = boilerFrom(lines, minDocs)
        .select(col("line"), lit(true).as("is_boiler"))
      val kept = filter(
        array_sort(collect_list(struct(col("li"), col("flag"), col("line")))),
        s => !s.getField("flag"))
      lines
        .join(boiler, Seq("line"), "left_outer")
        .select(col("doc_id"), col("li"), col("line"),
          coalesce(col("is_boiler"), lit(false)).as("flag"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("flag"), 1L).otherwise(0L)).as("n_boiler"),
          md5(array_join(transform(kept, s => s.getField("line")), " | ")
            .cast("binary")).as("kept_md5"))
        .select(col("doc_id"), col("n_lines"), col("n_boiler"),
          ((col("n_lines") - col("n_boiler")).cast("double") /
            col("n_lines")).as("kept_ratio"),
          col("kept_md5"))
    }
  }

  /** Bottom-k distinct-cardinality calibration (d36): per source, the
    * bottom-k estimate of its distinct-shingle count next to the exact
    * count and the relative error — the d35-style QA gauge for the
    * OTHER sketch this library serves (d6/d11's bottom-k overlap family
    * rests on the same order statistics; this says whether k is sized
    * right for the corpus before anyone trusts a Jaccard estimate).
    *
    * Estimator: with k-th smallest distinct 28-bit hash h_k, the classic
    * KMV estimate is (k−1) · 2^28 / h_k; a source with fewer than k
    * distinct hashes was seen WHOLE, so its estimate is the exact count
    * of its hashes. Every input to the one floating division is an exact
    * integer, so both engines compute the identical double.
    *
    * Scale shape: per-doc distinct shingles explode once (d6's regime),
    * distinct (source, hash) map-side combines, bottom-k runs on the
    * heap TopK operator (k values of state per source). The exact side
    * is one count-distinct per source — the calibration cost, paid by
    * the gauge so production sketches don't have to. */
  /** Fold-width collision audit (d42): over the corpus's DISTINCT word
    * shingles, how many 28-bit ("m:", the minhash base) and 60-bit
    * ("f:", the prefix/sketch id) digest-fold values collide — the gauge
    * that justifies (or retires) the fold widths this library keys every
    * shingle operator on. A 28-bit collision merges two shingles in a
    * minhash signature (harmless at d2's estimator granularity, which is
    * why 28 bits suffice there); a 60-bit collision merges two token ids
    * in the EXACT-recall prefix filter (d26/d28) — its measured frequency
    * is the empirical distance-to-exact of the r15 key design, published
    * next to the operators that rely on it (the d35/d36/d41 stance:
    * every lossy design decision ships the gauge that measures it).
    *
    * One distinct-shingle pass and one 3-aggregate fold — n_shingles is
    * corpus-vocabulary scale, nothing leaves the executors until the
    * one-row report. Empty corpus → empty report (grouped on a constant,
    * not a bare global aggregate). */
  def foldCollisions(documents: DataFrame): DataFrame =
    docShingles(documents)
      .select(explode(col("sh")).as("s"))
      .distinct()
      .select(PortableHash.hash28("m:", col("s")).as("h7"),
        PortableHash.hash60("f:", col("s")).as("h15"))
      .groupBy(lit(true).as("all"))
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct(col("h7")).as("n_fold7_values"),
        countDistinct(col("h15")).as("n_fold15_values"))
      .select(col("n_shingles"),
        col("n_fold7_values"),
        (col("n_shingles") - col("n_fold7_values"))
          .as("n_fold7_collisions"),
        ((col("n_shingles") - col("n_fold7_values")).cast("double") /
          col("n_shingles")).as("fold7_collision_frac"),
        col("n_fold15_values"),
        (col("n_shingles") - col("n_fold15_values"))
          .as("n_fold15_collisions"),
        ((col("n_shingles") - col("n_fold15_values")).cast("double") /
          col("n_shingles")).as("fold15_collision_frac"))

  def cardinalitySketch(documents: DataFrame, k: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val sh = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .filter(size(LlmText.words(col("text"))) >= 3)
      .select(col("source"),
        explode(LlmText.shingles(col("text"))).as("s"))
    Caching.withPersisted(sh) {
      val exact = sh.select(col("source"), col("s")).distinct()
        .groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
      val hashed = sh
        .select(col("source"),
          PortableHash.hash28("card:", col("s")).as("h"))
        .distinct()
      val bottomK = graft.plans.TopK.perKey(hashed,
        Seq(col("source")), Seq(col("h")), k)
      val stats = bottomK.groupBy(col("source"))
        .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("h_k"))
      val est = when(col("n_sketch") < k, col("n_sketch").cast("double"))
        .otherwise(lit((k - 1).toDouble * 268435456.0) /
          col("h_k").cast("double"))
      exact.join(stats, "source")
        .select(col("source"), col("n_exact"), col("n_sketch"),
          est.as("est"),
          ((est - col("n_exact").cast("double")) /
            col("n_exact").cast("double")).as("rel_err"))
    }
  }
}
