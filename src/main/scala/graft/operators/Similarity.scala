package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.functions.GraftFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * s1 is the exact baseline: brute-force cosine top-k for a query set. The
  * query side is tiny and broadcast; the corpus side streams, so the plan is
  * a broadcast nested-loop + per-query top-k — no corpus shuffle.
  *
  * s2 is the scale path: 16 random-hyperplane signs → two 8-bit LSH band
  * buckets per vector; vectors only meet queries through a bucket equi-join,
  * so candidate generation is a hash join on a small key, never an n²
  * product. Hyperplane entries are ±1 derived from md5 parity so the DuckDB
  * oracle reproduces the identical signature (shared public randomness
  * instead of a seeded RNG).
  *
  * Re-ranks go through the heap-based [[graft.plans.TopK.perKey]] operator
  * (O(n log k) per partition, no full sort of the losers); the `rank` column
  * is added by a window over the ALREADY-REDUCED k·q rows, which reuses the
  * top-k exec's hash clustering — so the expensive sort the window
  * formulation would have done over all scored pairs never happens.
  *
  * Cache lifecycle: each operator persists the normalized-vector frame for
  * its own duration only (Caching.withPersisted) and returns an eagerly
  * materialized result — no cached blocks outlive the call.
  */
object Similarity {

  val NumPlanes = 16
  val BandBits = 8
  val Dim = 64

  /** ±1.0 hyperplane matrix: sign(i, d) = parity of the first hex char of
    * md5("i:d") — deterministic and reproducible in plain SQL. */
  lazy val planeSigns: IndexedSeq[IndexedSeq[Double]] = {
    def hexVal(c: Char): Int = if (c <= '9') c - '0' else c - 'a' + 10
    (0 until NumPlanes).map { i =>
      (0 until Dim).map { d =>
        val h = MessageDigest.getInstance("MD5")
          .digest(s"$i:$d".getBytes(StandardCharsets.UTF_8))
        val firstHex = "%02x".format(h(0) & 0xff).charAt(0)
        if (hexVal(firstHex) % 2 == 1) 1.0 else -1.0
      }
    }
  }

  /** Vectors with the norm precomputed per vector (not per pair) and
    * materialized behind an exchange — the exchange doubles as the optimizer
    * barrier that stops CollapseProject from inlining the norm computation
    * into every pair-stage reference. NOT persisted here: operators bracket
    * it with Caching.withPersisted for their own duration. */
  private def vecs(embeddings: DataFrame): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"),
        VectorOps.asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(VectorOps.norm2(col("x"))))
      .transform(Partitioning.spread(_, col("vec_id")))
  }

  /** Heap top-k per query + rank column over the reduced k·q rows.
    *
    * The heap output (q×k rows) is MATERIALIZED before the rank window:
    * whole-stage codegen carries the window's SortExec as a runtime
    * reference, and serializing a SortExec serializes its ENTIRE child
    * plan into every task binary of the final stage — over the full
    * ANN/rerank tree that measured >1 MiB per task launch ("Broadcasting
    * large task binary"); over a checkpoint scan it is a few KB. The cut
    * costs one eager job over a k·q-row frame. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val top = Caching.materialize(graft.plans.TopK.perKey(scored,
      Seq(col("query_id")), Seq(col("cos").desc, col("neighbor_id")), k))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w))
  }

  /** The benchmark query set, defined ONCE: every ANN tier and the re-rank
    * read the predicate from here so they cannot drift apart. */
  private def defaultQueries(v: DataFrame): DataFrame =
    v.filter(col("vec_id") % 100 === 0)

  /** Brute-force cosine top-k (s1): queries = vec_id % 100 == 0. */
  def knnBruteForce(embeddings: DataFrame, k: Int = 10): DataFrame = {
    val v = vecs(embeddings)
    Caching.withPersisted(v) { knnWithVc(v, k) }
  }

  /** s1's body over an already-prepared (and persisted) vector frame —
    * shared with [[annRecall]] so the evaluation preps the corpus once. */
  private def knnWithVc(v: DataFrame, k: Int): DataFrame = {
    // materialized for the kmeansCentroids-seeds reason: the scan query
    // otherwise builds lazily-persisted `v`'s cache from two concurrent
    // stages (this broadcast build + the corpus scan)
    val q = Caching.materialize(defaultQueries(v)
      .select(col("vec_id").as("query_id"), col("x").as("qx"),
        col("nrm").as("qnrm")))
    val scored = broadcast(q)
      .join(v, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (GraftFunctions.dot(col("qx"), col("x")) /
          (col("qnrm") * col("nrm"))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Scalar-quantized serve tier (s26): brute-force cosine top-k with the
    * CORPUS side stored as int8 (e2's symmetric max-abs grid, dequantized
    * at score time) and the QUERY side raw float — the asymmetric-distance
    * convention (queries arrive uncompressed; only the billion stored
    * vectors pay for compression). This is the 4× memory tier between s1
    * (full float) and s7 (binary hamming): SQ8 keeps ~cosine-faithful
    * ordering at a quarter of the footprint, the default first compression
    * step production vector stores take before PQ.
    *
    * Parity: dequantized values qv·(maxabs/127) are exact IEEE doubles
    * reproduced verbatim by the oracle (e2's expression shape), and the
    * cosine is the same fixed-order fold as s1 — no tolerance needed.
    *
    * Scale shape: s1's broadcast-queries × corpus-scan plan over the
    * dequantized frame; quantization itself is a pure per-row projection
    * (at 100 TB the int8 codes + per-vector scale ARE the stored index —
    * the scan reads a quarter of the bytes, which is the entire point). */
  def sq8Serve(embeddings: DataFrame, k: Int = 10): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val raw = embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("x"))
    val pre = raw.select(col("vec_id"), col("x"),
      array_max(transform(col("x"), abs(_))).as("maxabs"))
    val up = lit(127.0) / col("maxabs")
    val down = col("maxabs") / lit(127.0)
    val deq = when(col("maxabs") === 0.0,
      transform(col("x"), _ => lit(0.0)))
      .otherwise(transform(col("x"), v => floor(v * up + 0.5) * down))
    val v = pre.select(col("vec_id"), deq.as("x"))
      .withColumn("nrm", sqrt(VectorOps.norm2(col("x"))))
    Caching.withPersisted(v) {
      val q = Caching.materialize(defaultQueries(
        raw.withColumn("nrm", sqrt(VectorOps.norm2(col("x")))))
        .select(col("vec_id").as("query_id"), col("x").as("qx"),
          col("nrm").as("qnrm")))
      val scored = broadcast(q)
        .join(v, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (GraftFunctions.dot(col("qx"), col("x")) /
            (col("qnrm") * col("nrm"))).as("cos"))
      topKPerQuery(scored, k)
    }
  }

  /** Metadata-filtered exact top-k (s11): nearest neighbors among only the
    * corpus rows passing an attribute predicate (here: even `label`, the
    * stand-in for license/language/domain filters) — filtered vector
    * search, the retrieval mode RAG stacks actually run ("nearest chunks
    * the user may see").
    *
    * The predicate is applied to the CORPUS SIDE BEFORE any distance math
    * — pre-filtering, not post-filtering: a post-filter over an unfiltered
    * top-k under-fills k whenever the predicate is selective (ask for 10,
    * get back 3 allowed), and at 100 TB the filter also prunes the scan
    * (parquet pushdown on the metadata column) and shrinks every candidate
    * join downstream. Composes with any ANN tier: the same filtered frame
    * feeds [[annTiered]]'s coarse stage unchanged. Exact form here is the
    * yardstick; per-query work is |filtered corpus|, reduced by the heap
    * top-k before any sort. */
  def filteredKnn(embeddings: DataFrame, k: Int = 10): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val v = embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"), col("label"),
        VectorOps.asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(VectorOps.norm2(col("x"))))
    Caching.withPersisted(v) {
      // materialized for the kmeansCentroids-seeds reason (see
      // rangeSearch): the broadcast build must not race v's cache build
      val q = Caching.materialize(defaultQueries(v)
        .select(col("vec_id").as("query_id"), col("x").as("qx"),
          col("nrm").as("qnrm")))
      val allowed = v.filter(col("label") % 2 === 0)
      val scored = broadcast(q)
        .join(allowed, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("label"),
          (GraftFunctions.dot(col("qx"), col("x")) /
            (col("qnrm") * col("nrm"))).as("cos"))
      topKPerQuery(scored, k)
    }
  }

  /** Maximal-marginal-relevance re-rank (s12): from each query's top-20
    * exact candidate pool, greedily select 5 results maximizing
    * `λ·relevance − (1−λ)·max-similarity-to-already-selected` — the
    * diversity re-rank that stops retrieval from returning five copies of
    * the same near-duplicate chunk (the failure mode [[Dedup]] exists to
    * measure). Ties break on neighbor_id, so the greedy trajectory is
    * fully deterministic.
    *
    * Scale shape: MMR is inherently sequential in k, so the loop runs on
    * the DRIVER — but each of the k−1 rounds is a constant-size
    * distributed plan over the CANDIDATE POOL, never the corpus: pools are
    * poolK rows/query from the heap top-k, pairwise sims are poolK² per
    * query computed once and persisted, and each round is a
    * broadcast-scale join + heap argmax. Corpus cost is exactly one s1
    * scoring pass; everything after is O(queries · poolK²) independent of
    * corpus size. */
  def mmrRerank(embeddings: DataFrame, k: Int = 5, poolK: Int = 20,
      lambda: Double = 0.7): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val v = embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(VectorOps.norm2(col("x"))))
    Caching.withPersisted(v) {
      // materialized for the kmeansCentroids-seeds reason: the first
      // mmrCore query otherwise scans lazily-persisted `v` from two
      // concurrent stages (this broadcast build + the corpus scan),
      // racing v's cache build (BlockManager "already exists" WARN)
      val q = Caching.materialize(defaultQueries(v)
        .select(col("vec_id").as("query_id"), col("x").as("qx"),
          col("nrm").as("qnrm")))
      mmrCore(q, v, k, poolK, lambda)
    }
  }

  /** [[mmrRerank]] with CALLER-SUPPLIED queries — the serving form: rank
    * an external query set (a user request batch, an eval set) against a
    * corpus, both as `(vec_id, embedding)` frames. Same contract as the
    * benchmark form: corpus rows sharing a query's id are excluded
    * (self-match guard; harmless when the id spaces are disjoint). The
    * streaming twin is `StreamSimilarity.mmrVsIndex`. */
  def mmrVsCorpus(queries: DataFrame, corpus: DataFrame, k: Int = 5,
      poolK: Int = 20, lambda: Double = 0.7): DataFrame = {
    GraftFunctions.register(queries.sparkSession)
    val v = corpus.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(VectorOps.norm2(col("x"))))
    val q = queries
      .select(col("vec_id").as("query_id"),
        VectorOps.asDouble(col("embedding")).as("qx"))
      .withColumn("qnrm", sqrt(VectorOps.norm2(col("qx"))))
    Caching.withPersisted(v) { mmrCore(q, v, k, poolK, lambda) }
  }

  /** The greedy MMR engine shared by [[mmrRerank]] and [[mmrVsCorpus]]:
    * `q` = (query_id, qx, qnrm), `v` = (vec_id, x, nrm) already prepared
    * (and `v` persisted by the caller's bracket). */
  private def mmrCore(q: DataFrame, v: DataFrame, k: Int, poolK: Int,
      lambda: Double): DataFrame = {
      val scored = broadcast(q)
        .join(v, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (GraftFunctions.dot(col("qx"), col("x")) /
            (col("qnrm") * col("nrm"))).as("rel"))
      val cand = graft.plans.TopK.perKey(scored, Seq(col("query_id")),
        Seq(col("rel").desc, col("neighbor_id")), poolK)
      val cv = cand
        .join(v, cand("neighbor_id") === v("vec_id"))
        .select(col("query_id"), col("neighbor_id"), col("rel"),
          col("x"), col("nrm"))
      val left = cv.select(col("query_id"), col("neighbor_id").as("ca"),
        col("x").as("ax"), col("nrm").as("anrm"))
      val right = cv.select(col("query_id").as("bq"),
        col("neighbor_id").as("cb"), col("x").as("bx"),
        col("nrm").as("bnrm"))
      val pp = left
        .join(right, col("query_id") === col("bq") && col("ca") =!= col("cb"))
        .select(col("query_id"), col("ca"), col("cb"),
          (GraftFunctions.dot(col("ax"), col("bx")) /
            (col("anrm") * col("bnrm"))).as("sim"))
      val candSlim = cv.select(col("query_id"), col("neighbor_id"),
        col("rel"))
      Caching.withPersisted(candSlim, pp) {
        // Each round's selected set is EAGERLY materialized: the loop
        // references selected three times per round (max-sim join,
        // anti-join, union), so lazy lineage would recompute round r-1's
        // picks 3^r times — measured 60s instead of ~3s at sf0.1. The
        // frames are queries·k rows; the checkpoint is effectively free.
        var selected = Caching.materialize(graft.plans.TopK.perKey(
          candSlim.select(col("query_id"), col("neighbor_id"),
            (lit(lambda) * col("rel")).as("mmr_score")),
          Seq(col("query_id")),
          Seq(col("mmr_score").desc, col("neighbor_id")), 1)
          .withColumn("mmr_rank", lit(1)))
        for (r <- 2 to k) {
          val selIds = selected
            .select(col("query_id").as("sq"), col("neighbor_id").as("sel_id"))
          val maxsim = pp
            .join(selIds, col("query_id") === col("sq") &&
              col("cb") === col("sel_id"))
            .groupBy(col("query_id").as("mq"), col("ca"))
            .agg(max(col("sim")).as("maxsim"))
          val remaining = candSlim
            .join(selIds, col("query_id") === col("sq") &&
              col("neighbor_id") === col("sel_id"), "left_anti")
          val pick = graft.plans.TopK.perKey(
            remaining
              .join(maxsim, col("query_id") === col("mq") &&
                col("neighbor_id") === col("ca"))
              .select(col("query_id"), col("neighbor_id"),
                (lit(lambda) * col("rel") -
                  lit(1 - lambda) * col("maxsim")).as("mmr_score")),
            Seq(col("query_id")),
            Seq(col("mmr_score").desc, col("neighbor_id")), 1)
            .withColumn("mmr_rank", lit(r))
          selected = Caching.materialize(selected.unionByName(pick))
        }
        selected
      }
  }

  /** Cosine range search (s4): ALL neighbors within a similarity threshold,
    * not a fixed k — the retrieval mode for "find every near-duplicate of
    * these seed documents" where the neighbor count per query is unknown.
    * Exact baseline: broadcast query side × streamed corpus, narrow filter,
    * no re-rank stage at all (threshold semantics need no sort). At 100 TB
    * the same call composes with the LSH band blocking ([[annLsh]]'s
    * candidate stage) to prune the corpus side first; the exact form here is
    * the recall yardstick those candidates are measured against. */
  def rangeSearch(embeddings: DataFrame, minCos: Double = 0.3): DataFrame = {
    val v = vecs(embeddings)
    Caching.withPersisted(v) {
      // materialized for the kmeansCentroids-seeds reason: the broadcast
      // build and the corpus scan otherwise race v's cache build (the
      // r13 seal run attributed a BlockManager re-add WARN to exactly
      // this site); one sequential slice action builds v's cache first
      val q = Caching.materialize(v.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("x").as("qx"),
          col("nrm").as("qnrm")))
      broadcast(q)
        .join(v, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (GraftFunctions.dot(col("qx"), col("x")) /
            (col("qnrm") * col("nrm"))).as("cos"))
        .filter(col("cos") >= minCos)
    }
  }

  /** Two-tier matryoshka ANN (s6): generate candidates with a cosine over
    * only the first `coarseDims` coordinates (the MRL prefix — a valid
    * low-dimensional embedding of the same space, see
    * [[VectorOps.matryoshkaTruncate]]), keep `probeK` per query, then
    * re-rank the survivors with the EXACT full-dimension cosine and return
    * top `k`. The production retrieval-tier pattern: the coarse pass
    * touches dims/64 of the bytes per comparison, the exact pass touches
    * only `probeK` vectors per query.
    *
    * 100 TB shape: the coarse tier here is the broadcast-query exact scan
    * (the recall yardstick); at corpus scale the same coarse scores come
    * from [[annLsh]]/[[annIvf]] candidates over a STORED prefix column, so
    * the full vectors are read only for the probeK re-rank gather. The
    * candidate list (queries × probeK) broadcasts into the re-rank join —
    * the corpus is never shuffled. Recall: every miss is a vector whose
    * prefix cosine lies below the probeK'th candidate but whose full
    * cosine is top-k; widening probeK trades compute for recall. The
    * contract assumes MRL-shaped embeddings (information concentrated in
    * the prefix — what matryoshka training produces); spec-pinned ≥0.9 on
    * a planted MRL fixture, and documented-weak (~0.24) on isotropic
    * random vectors where prefix cosine carries no signal. */
  def annTiered(embeddings: DataFrame, k: Int = 10, probeK: Int = 30,
      coarseDims: Int = 16): DataFrame = {
    val vc = withCoarse(vecs(embeddings), coarseDims)
    Caching.withPersisted(vc) { tieredWithVc(vc, k, probeK) }
  }

  /** vecs + the matryoshka-prefix columns the coarse tier reads. */
  private def withCoarse(v: DataFrame, coarseDims: Int): DataFrame =
    v.withColumn("xc", slice(col("x"), 1, coarseDims))
      .withColumn("cnrm", sqrt(VectorOps.norm2(col("xc"))))

  /** s6's body over an already-prepared (and persisted) frame carrying the
    * coarse columns — shared with [[annRecall]]. */
  private def tieredWithVc(vc: DataFrame, k: Int, probeK: Int): DataFrame = {
    // materialized for the kmeansCentroids-seeds reason (see rangeSearch)
    val q = Caching.materialize(defaultQueries(vc))
    val coarse = broadcast(
        q.select(col("vec_id").as("query_id"), col("xc").as("qxc"),
          col("cnrm").as("qcnrm")))
      .join(vc, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (GraftFunctions.dot(col("qxc"), col("xc")) /
          (col("qcnrm") * col("cnrm"))).as("ccos"))
    val cands = graft.plans.TopK.perKey(coarse, Seq(col("query_id")),
      Seq(col("ccos").desc, col("neighbor_id")), probeK)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(vc, q, cands, k)
  }

  /** Hamming-tier ANN (s7): candidates come from popcount(xor) over the
    * packed sign words of [[VectorOps.binaryQuantize]] — 8 bytes and two
    * integer instructions per comparison instead of 64 float
    * multiply-adds — then the probeK survivors are re-ranked with the
    * exact full-dimension cosine. The sign words are exactly the SimHash
    * signature ([[graft.functions.SimHashPack]] family), so Hamming
    * distance is a cosine-angle proxy with known concentration.
    *
    * 100 TB shape: the packed words are a STORED 8-byte column (the e7
    * output); the coarse scan reads only (vec_id, w0, w1) — a columnar
    * scan 512× narrower than the float vectors — and the full vectors are
    * gathered only for queries × probeK re-rank pairs, broadcast-joined so
    * the corpus never shuffles. */
  def hammingAnn(embeddings: DataFrame, k: Int = 10,
      probeK: Int = 30): DataFrame = {
    val vc = vecs(embeddings)
      .withColumn("w0", VectorOps.signWord(col("x"), 0))
      .withColumn("w1", VectorOps.signWord(col("x"), 32))
    Caching.withPersisted(vc) {
      // materialized for the kmeansCentroids-seeds reason (see rangeSearch)
      val q = Caching.materialize(defaultQueries(vc))
      val ham = broadcast(
          q.select(col("vec_id").as("query_id"), col("w0").as("qw0"),
            col("w1").as("qw1")))
        .join(vc, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (call_function("bit_count", col("qw0").bitwiseXOR(col("w0"))) +
            call_function("bit_count", col("qw1").bitwiseXOR(col("w1"))))
            .cast("long").as("hamming"))
      val cands = graft.plans.TopK.perKey(ham, Seq(col("query_id")),
        Seq(col("hamming"), col("neighbor_id")), probeK)
        .select(col("query_id"), col("neighbor_id"))
      rerankExact(vc, q, cands, k)
    }
  }

  /** PQ asymmetric-distance ANN (s8): the FAISS-IVFPQ retrieval pattern
    * minus the cell index — corpus vectors are represented by their PQ
    * codes (one byte per subspace, [[VectorOps.pqCodebook]] /
    * [[VectorOps.pqNearest]]), and each query scores the WHOLE corpus by
    * table lookup: precompute d²(query-slice, centroid) for every
    * (subspace, code) — the ADC lookup table, queries × M × K entries,
    * broadcast — then a candidate's approximate distance is the sum of M
    * table hits. probeK survivors re-rank with the exact full-dimension
    * cosine.
    *
    * 100 TB shape: the corpus side of the scoring join reads ONLY the
    * stored code columns (M bytes/vector vs 8·dim for floats); the LUT
    * broadcasts, the per-(query, vec) sum is a map-side-combinable
    * groupBy, and the full vectors are gathered just for the probeK
    * re-rank pairs. Subspace distances land on the shared 1e-9 grid so
    * the 4-term sum is order-independent and oracle-exact. */
  def pqAdcAnn(embeddings: DataFrame, k: Int = 10, probeK: Int = 30,
      subspaces: Int = 4, subDim: Int = 16): DataFrame = {
    val vc = vecs(embeddings)
    // sub is read three ways (codebook training, corpus assignment, query
    // LUT) — persist it alongside vc so the subspace explode runs once
    val sub = VectorOps.pqSubspaces(embeddings, subspaces, subDim)
    Caching.withPersisted(vc, sub) {
      // the query slices stay LAZY here: this site never reproduced the
      // broadcast-build race, and a measured attempt to pre-materialize
      // the slices (r13) cost +0.8 s — the slice action forces the full
      // vc/sub cache builds as separate passes. The benign residual WARN
      // class is handled by policy at Caching.withPersisted.
      val qv = defaultQueries(vc)
      val qsub = defaultQueries(sub)
      val codebook = VectorOps.pqCodebook(sub)
      val codes = VectorOps.pqNearest(sub, codebook)
        .select(col("vec_id"), col("s"), col("code"))
      val lut = qsub
        .select(col("vec_id").as("query_id"), col("s"),
          col("sx").as("qsx"))
        .join(broadcast(codebook), "s")
        .select(col("query_id"), col("s"), col("code"),
          round(VectorOps.pqD2(col("qsx"), col("cx")) * lit(1.0e9), 0)
            .cast("long").as("g2"))
      val approx = codes
        .join(broadcast(lut), Seq("s", "code"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg((sum(col("g2")).cast("double") / lit(1.0e9)).as("adc_d2"))
      val cands = graft.plans.TopK.perKey(approx, Seq(col("query_id")),
        Seq(col("adc_d2"), col("vec_id")), probeK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      rerankExact(vc, qv, cands, k)
    }
  }

  /** IVF-ADC ANN (s13): the production composition of the two scale tiers
    * — the IVF coarse quantizer (s3) restricts each query's candidates to
    * its probed cells, PQ asymmetric distance (s8) then scores ONLY those
    * candidates via the broadcast per-query lookup table, and the ADC
    * survivors get the exact re-rank. Per-query cost falls from
    * full-corpus ADC to |probed cells| × subspaces table adds — the
    * FAISS IVFADC shape that serves billion-vector corpora from code
    * tables that fit in executor memory, here as three broadcast-join
    * passes over one persisted corpus prep. */
  def ivfAdcAnn(embeddings: DataFrame, k: Int = 10, probeK: Int = 30,
      subspaces: Int = 4, subDim: Int = 16): DataFrame = {
    val vc = vecs(embeddings)
    val sub = VectorOps.pqSubspaces(embeddings, subspaces, subDim)
    Caching.withPersisted(vc, sub) {
      // every index table is materialized (lineage-truncated): the search
      // stages below re-reference them several times, and an un-truncated
      // codebook/cells tree re-serializes the whole training plan into
      // every downstream task binary (measured 2-6 MiB task binaries —
      // a per-task-launch tax at cluster scale)
      val cent = Caching.materialize(kmeansCentroids(vc))
      val cells = Caching.materialize(bestCells(cent)(vc, 1))
      val codebook = Caching.materialize(VectorOps.pqCodebook(sub))
      val codes = Caching.materialize(VectorOps.pqNearest(sub, codebook)
        .select(col("vec_id"), col("s"), col("code")))
      ivfAdcSearch(vc, defaultQueries(vc), defaultQueries(sub),
        cent, cells, codes, codebook, k, probeK, excludeSelf = true)
    }
  }

  /** The ONE copy of the IVF-ADC search phase, shared by [[ivfAdcAnn]]
    * (tables built in-memory) and [[ivfAdcVsIndex]] (tables loaded from
    * the lake) so a tuning change cannot break the s13 == s14 identity:
    * probe cells → cell-restricted candidates → ADC from the broadcast
    * per-query LUT → exact re-rank. `qsub` is the QUERY side's subspace
    * frame (vec_id, s, sx). `excludeSelf` drops the candidate whose
    * vec_id equals the query_id — correct ONLY for the benchmark
    * self-search forms ([[ivfAdcAnn]]/[[ivfAdcVsIndex]]), where queries
    * ARE corpus rows; [[ivfAdcServe]] passes false because its query ids
    * live in the CALLER's namespace, and a caller id that numerically
    * collides with a stored vec_id must not silently lose that stored
    * vector from its top-k. */
  private def ivfAdcSearch(vc: DataFrame, queries: DataFrame,
      qsub: DataFrame,
      centroids: DataFrame, cells: DataFrame, codes: DataFrame,
      codebook: DataFrame, k: Int, probeK: Int,
      excludeSelf: Boolean): DataFrame = {
    val adc = adcScores(queries, qsub, centroids, cells, codes, codebook,
      excludeSelf)
    val cands = graft.plans.TopK.perKey(adc, Seq(col("query_id")),
      Seq(col("adc_d2"), col("neighbor_id")), probeK)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(vc, queries, cands, k)
  }

  /** Probed-cell candidates only (query_id, neighbor_id) — the coarse
    * tier's output before any PQ scoring; shared by the search body
    * (via [[adcScores]]) and the s19 fanout gauge. */
  private def probedCandidates(queries: DataFrame, centroids: DataFrame,
      cells: DataFrame, excludeSelf: Boolean): DataFrame = {
    val probes = bestCells(centroids)(queries, NProbe)
      .withColumnRenamed("vec_id", "query_id")
    // queries-sized and feeding multi-join stages: materialized so the
    // ADC/re-rank task binaries carry a checkpoint scan, not the whole
    // probe/codebook plan tree (the 2-6 MiB task-binary fix)
    Caching.materialize(probes.join(cells, "cent_id")
      .filter(if (excludeSelf) col("query_id") =!= col("vec_id")
              else lit(true))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct())
  }

  /** The ADC scoring stage (query_id, neighbor_id, adc_d2) — the ONE
    * copy shared by [[ivfAdcSearch]] and the s18 quantization-error
    * gauge, so the gauge measures exactly the distances the search
    * ranks by. */
  /** Per-query ADC lookup table (query_id, s, code, g2): every query
    * subspace scored against every codebook entry on the 1e-9 grid — the
    * ONE copy shared by [[adcScores]] and the s21 per-subspace error
    * drilldown, so the drilldown audits exactly the table the search
    * adds from. */
  private def queryLut(qsub: DataFrame, codebook: DataFrame): DataFrame =
    Caching.materialize(qsub
      .select(col("vec_id").as("query_id"), col("s"),
        col("sx").as("qsx"))
      .join(broadcast(codebook), "s")
      .select(col("query_id"), col("s"), col("code"),
        round(VectorOps.pqD2(col("qsx"), col("cx")) * lit(1.0e9), 0)
          .cast("long").as("g2")))

  private def adcScores(queries: DataFrame, qsub: DataFrame,
      centroids: DataFrame, cells: DataFrame, codes: DataFrame,
      codebook: DataFrame, excludeSelf: Boolean): DataFrame =
    adcScoresFromLut(queries, queryLut(qsub, codebook), centroids, cells,
      codes, excludeSelf)

  /** [[adcScores]] over a CALLER-BUILT LUT — lets s21 build the
    * (materialized) per-query lookup table once and share it between the
    * scoring pass and its standalone drilldown join, instead of two
    * identical checkpoint builds per call (ADVICE r11). */
  private def adcScoresFromLut(queries: DataFrame, lut: DataFrame,
      centroids: DataFrame, cells: DataFrame, codes: DataFrame,
      excludeSelf: Boolean): DataFrame = {
    val cellCand = probedCandidates(queries, centroids, cells, excludeSelf)
    cellCand
      .join(codes.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id")
      .join(broadcast(lut), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg((sum(col("g2")).cast("double") / lit(1.0e9)).as("adc_d2"))
  }

  /** ADC quantization-error gauge (s18): for each query's top-`probeK`
    * ADC candidates (exactly the set s13 re-ranks), compare the ADC
    * approximate distance against the EXACT subspace-grid squared L2 and
    * report per-query error stats — the number an embedding store
    * watches when sizing the PQ codebook (error creeping up means the
    * codebook no longer fits the data and re-rank depth must grow to
    * hold recall). Both distances live on the shared 1e-9 grid, so the
    * error is engine-exact; the mean accumulates grid longs (order-free).
    * Returns (query_id, n_cands, mean_abs_err, max_abs_err). */
  def adcErrorStats(embeddings: DataFrame, probeK: Int = 30,
      subspaces: Int = 4, subDim: Int = 16): DataFrame = {
    val vc = vecs(embeddings)
    val sub = VectorOps.pqSubspaces(embeddings, subspaces, subDim)
    Caching.withPersisted(vc, sub) {
      val cent = Caching.materialize(kmeansCentroids(vc))
      val cells = Caching.materialize(bestCells(cent)(vc, 1))
      val codebook = Caching.materialize(VectorOps.pqCodebook(sub))
      val codes = Caching.materialize(VectorOps.pqNearest(sub, codebook)
        .select(col("vec_id"), col("s"), col("code")))
      adcErrorBody(vc, sub,
        IvfAdcIndex(cent, cells, codes, codebook, subspaces, subDim),
        probeK)
    }
  }

  /** [[adcErrorStats]] against a PREBUILT [[IvfAdcIndex]] — the serving
    * form: the gauge re-derives NOTHING (no k-means, no codebook, no
    * corpus re-coding), it audits the stored tables a deployment actually
    * searches with. s14 pins stored ≡ inline training, so the two forms
    * share one oracle. */
  def adcErrorStats(embeddings: DataFrame, index: IvfAdcIndex,
      probeK: Int): DataFrame = {
    val vc = vecs(embeddings)
    val sub = VectorOps.pqSubspaces(embeddings, index.subspaces,
      index.subDim)
    Caching.withPersisted(vc, sub) {
      adcErrorBody(vc, sub, index, probeK)
    }
  }

  /** The s18 gauge body over caller-persisted vc/sub and any index. */
  private def adcErrorBody(vc: DataFrame, sub: DataFrame,
      index: IvfAdcIndex, probeK: Int): DataFrame = {
    val adc = adcScores(defaultQueries(vc), defaultQueries(sub),
      index.centroids, index.cells, index.codes, index.codebook,
      excludeSelf = true)
    val cands = Caching.materialize(
      graft.plans.TopK.perKey(adc, Seq(col("query_id")),
        Seq(col("adc_d2"), col("neighbor_id")), probeK))
    // exact distance over the SAME subspace grid the LUT uses: per
    // (pair, subspace) round(d2·1e9) longs, summed exactly
    val exact = broadcast(cands)
      .join(sub.select(col("vec_id").as("query_id"), col("s"),
        col("sx").as("qsx")), Seq("query_id"))
      .join(sub.select(col("vec_id").as("neighbor_id"), col("s"),
        col("sx").as("nsx")), Seq("neighbor_id", "s"))
      .groupBy(col("query_id"), col("neighbor_id"), col("adc_d2"))
      .agg((sum(round(VectorOps.pqD2(col("qsx"), col("nsx")) *
        lit(1.0e9), 0).cast("long")).cast("double") / lit(1.0e9))
        .as("exact_d2"))
    val err = round(abs(col("adc_d2") - col("exact_d2")) * lit(1.0e9), 0)
      .cast("long")
    exact.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_cands"),
        (sum(err).cast("double") /
          (count(lit(1)) * lit(1.0e9))).as("mean_abs_err"),
        max(abs(col("adc_d2") - col("exact_d2"))).as("max_abs_err"))
  }

  /** Per-SUBSPACE ADC quantization-error drilldown (s21): s18 reports the
    * corpus-level error; this splits it by PQ subspace over the SAME
    * candidate pairs — per (query, candidate, s), |LUT grid term − exact
    * grid term| — so a drifting s18 reading points at WHICH codebook went
    * lossy (the actionable retuning signal: retrain that subspace's 256
    * entries, or give its dimensions more bits, instead of rebuilding the
    * whole index). All terms are 1e-9-grid longs; only the final mean/max
    * divide. Returns one row per subspace (s, n_pairs, mean_abs_err,
    * max_abs_err). */
  def adcErrorBySubspace(embeddings: DataFrame, index: IvfAdcIndex,
      probeK: Int = 30): DataFrame = {
    val vc = vecs(embeddings)
    val sub = VectorOps.pqSubspaces(embeddings, index.subspaces,
      index.subDim)
    Caching.withPersisted(vc, sub) {
      // ONE LUT build shared by the scoring pass and the drilldown join
      // below (each call to queryLut materializes a checkpoint)
      val lut = queryLut(defaultQueries(sub), index.codebook)
      val adc = adcScoresFromLut(defaultQueries(vc), lut,
        index.centroids, index.cells, index.codes, excludeSelf = true)
      val cands = Caching.materialize(
        graft.plans.TopK.perKey(adc, Seq(col("query_id")),
          Seq(col("adc_d2"), col("neighbor_id")), probeK)
          .select(col("query_id"), col("neighbor_id")))
      // per (pair, subspace): the LUT term the search added (via the
      // neighbor's stored code) vs the exact grid term of the real
      // subvectors — both longs on the shared 1e-9 grid. Materialized
      // (bounded at pairs × subspaces rows) so the final aggregate's
      // task binary carries a checkpoint scan, not the five-way join
      // tree (measured 4-5 MiB per task without it).
      val terms = Caching.materialize(broadcast(cands)
        .join(index.codes.withColumnRenamed("vec_id", "neighbor_id"),
          "neighbor_id")
        .join(lut.withColumnRenamed("g2", "lut_g2"),
          Seq("query_id", "s", "code"))
        .join(sub.select(col("vec_id").as("query_id"), col("s"),
          col("sx").as("qsx")), Seq("query_id", "s"))
        .join(sub.select(col("vec_id").as("neighbor_id"), col("s"),
          col("sx").as("nsx")), Seq("neighbor_id", "s"))
        .select(col("s"),
          abs(col("lut_g2") - round(VectorOps.pqD2(col("qsx"),
            col("nsx")) * lit(1.0e9), 0).cast("long")).as("err_g")))
      terms.groupBy(col("s"))
        .agg(count(lit(1)).as("n_pairs"),
          (sum(col("err_g")).cast("double") /
            (count(lit(1)) * lit(1.0e9))).as("mean_abs_err"),
          (max(col("err_g")).cast("double") / lit(1.0e9))
            .as("max_abs_err"))
    }
  }

  /** IVF probe-fanout gauge (s19): per query, how many candidates its
    * probed cells contribute to the ADC stage — the serving-cost
    * telemetry an IVF deployment watches when retuning NProbe/cell count
    * (fanout IS the per-query work; a fat tail here means skewed cells
    * and a slow tail latency). Same coarse chain as s13 up to the
    * candidate set, then one count per query. */
  def probeFanout(embeddings: DataFrame): DataFrame = {
    val vc = vecs(embeddings)
    Caching.withPersisted(vc) {
      val cent = Caching.materialize(kmeansCentroids(vc))
      val cells = Caching.materialize(bestCells(cent)(vc, 1))
      fanoutBody(vc, cent, cells)
    }
  }

  /** [[probeFanout]] against a PREBUILT [[IvfAdcIndex]]: the gauge of
    * the index actually being served — no coarse-quantizer retraining,
    * just probes against the stored centroids counted over the stored
    * cell assignments. */
  def probeFanout(embeddings: DataFrame, index: IvfAdcIndex): DataFrame = {
    val vc = vecs(embeddings)
    Caching.withPersisted(vc) {
      fanoutBody(vc, index.centroids, index.cells)
    }
  }

  private def fanoutBody(vc: DataFrame, cent: DataFrame,
      cells: DataFrame): DataFrame =
    probedCandidates(defaultQueries(vc), cent, cells, excludeSelf = true)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_candidates"))

  /** IVF cell-balance gauge (s20): one-row health summary of the coarse
    * quantizer's cell assignment — non-empty cell count, corpus size,
    * min/max/mean cell population, and the FAISS-style imbalance factor
    * C·Σnᵢ²/N² (1.0 = perfectly even cells; the expected per-query
    * candidate fanout is this factor × N/C, so a drifting value is the
    * early warning that retraining the centroids — not raising NProbe —
    * is the fix for s19's fat fanout tail). Shares s13's training and
    * assignment stages; the summary itself is two integer aggregates. */
  def cellBalance(embeddings: DataFrame): DataFrame = {
    val vc = vecs(embeddings)
    Caching.withPersisted(vc) {
      val cent = Caching.materialize(kmeansCentroids(vc))
      val cells = Caching.materialize(bestCells(cent)(vc, 1))
      balanceBody(cells)
    }
  }

  /** [[cellBalance]] over a PREBUILT [[IvfAdcIndex]]'s stored cell
    * table — no quantizer retraining; the whole gauge is two integer
    * aggregates over (vec_id, cent_id). */
  def cellBalance(index: IvfAdcIndex): DataFrame = balanceBody(index.cells)

  private def balanceBody(cells: DataFrame): DataFrame =
    cells.groupBy(col("cent_id")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_vecs"),
          min(col("n")).as("min_cell"), max(col("n")).as("max_cell"),
          sum(col("n") * col("n")).as("sum_n2"))
        .select(col("n_cells"), col("n_vecs"), col("min_cell"),
          col("max_cell"),
          (col("n_vecs").cast("double") / col("n_cells")).as("mean_cell"),
          (col("n_cells").cast("double") * col("sum_n2").cast("double") /
            (col("n_vecs") * col("n_vecs")).cast("double")).as("imbalance"))

  /** The four stored tables of a materialized IVF-ADC index — each one a
    * plain lake-table shape (parquet round-trip pinned by the spec):
    * coarse centroids (cent_id, cx, cnrm), corpus cell assignments
    * (vec_id, cent_id), PQ codes (vec_id, s, code), and the PQ codebook
    * (s, code, cx) — plus the PQ geometry (subspaces, subDim) the tables
    * were built with, so a search can never silently slice queries with
    * the wrong layout. Built ONCE by [[ivfAdcIndex]]; every later
    * [[ivfAdcVsIndex]] search runs zero training work — the FAISS
    * build/search split as lake tables. */
  final case class IvfAdcIndex(centroids: DataFrame, cells: DataFrame,
      codes: DataFrame, codebook: DataFrame,
      subspaces: Int = 4, subDim: Int = 16)

  /** Build the IVF-ADC index tables from a corpus: one k-means training
    * pass, one PQ codebook pass, one assignment pass — all materialized
    * so storing them is a plain write. */
  def ivfAdcIndex(embeddings: DataFrame, subspaces: Int = 4,
      subDim: Int = 16): IvfAdcIndex = {
    // vc/sub are MATERIALIZED (blocks exist before any consumer plans),
    // not lazily persisted: pqCodebook's first action joins two
    // derivations of `sub` (seeds ⋈ one-Lloyd-step means), and a lazy
    // cache's first build races across those concurrent stages — the
    // deterministic BlockManager "already exists, not re-adding" WARN
    // the r12 driver bench tail recorded during IVF priming (reproduced
    // on rdd_149 with the lazy persist, gone with materialization).
    val vc = Caching.materialize(vecs(embeddings))
    val sub = Caching.materialize(
      VectorOps.pqSubspaces(embeddings, subspaces, subDim))
    val cent = Caching.materialize(kmeansCentroids(vc))
    val cells = Caching.materialize(bestCells(cent)(vc, 1))
    val codebook = Caching.materialize(VectorOps.pqCodebook(sub))
    val codes = Caching.materialize(VectorOps.pqNearest(sub, codebook)
      .select(col("vec_id"), col("s"), col("code")))
    IvfAdcIndex(cent, cells, codes, codebook, subspaces, subDim)
  }

  /** IVF-ADC serving form: CALLER-SUPPLIED queries against the stored
    * index — the online-retrieval twin of [[ivfAdcVsIndex]] (whose
    * benchmark queries are a fixed corpus slice). Query ids are the
    * caller's namespace; the corpus frame supplies only the exact re-rank
    * vectors for stored neighbors. The [[mmrVsCorpus]] caller-supplied-
    * queries precedent applied to the ANN index path; the streaming twin
    * is `streaming.StreamSimilarity.ivfAdcVsIndex`. */
  def ivfAdcServe(queries: DataFrame, corpus: DataFrame,
      index: IvfAdcIndex, k: Int = 10, probeK: Int = 30): DataFrame = {
    val vc = vecs(corpus)
    val qv = vecs(queries)
    Caching.withPersisted(vc, qv, index.cells, index.codes) {
      val qsub = VectorOps.pqSubspaces(queries, index.subspaces,
        index.subDim)
      ivfAdcSearch(vc, qv, qsub, index.centroids, index.cells,
        index.codes, index.codebook, k, probeK, excludeSelf = false)
    }
  }

  /** [[ivfAdcServe]] with a caller-supplied allow-list (the s22
    * pre-filter applied to the online serve path): `allowed` is an id
    * frame (`vec_id`) semi-joined into the stored codes before candidate
    * scoring, so each batch's probe-k budget is spent entirely on
    * rows matching the metadata predicate. */
  def filteredServe(queries: DataFrame, corpus: DataFrame,
      index: IvfAdcIndex, allowed: DataFrame, k: Int = 10,
      probeK: Int = 30): DataFrame = {
    val fCodes = index.codes
      .join(allowed.select(col("vec_id")), Seq("vec_id"), "left_semi")
    ivfAdcServe(queries, corpus,
      index.copy(codes = fCodes), k, probeK)
  }

  /** Incremental IVF-ADC index maintenance (s15): assign ARRIVING vectors
    * to the stored coarse cells and PQ codes — the write path of the
    * FAISS-style index lifecycle ([[ivfAdcIndex]] builds, [[ivfAdcVsIndex]]
    * searches, this appends). No quantizer retrains: cell assignment is a
    * broadcast-centroid argmax, codes a broadcast-codebook argmin, both
    * one scan over the batch — per-ingest cost scales with the batch while
    * the corpus-sized tables only ever append (the same staleness contract
    * as [[graft.operators.Dedup.nearDupIndex]]: rebuild nightly to re-fit
    * quantizers to drifted data; correctness of search over appended rows
    * never depends on the rebuild). */
  def ivfAdcAppend(incoming: DataFrame, index: IvfAdcIndex): IvfAdcIndex = {
    val vc = vecs(incoming)
    val sub = VectorOps.pqSubspaces(incoming, index.subspaces, index.subDim)
    val newCells = Caching.materialize(bestCells(index.centroids)(vc, 1))
    val newCodes = Caching.materialize(
      VectorOps.pqNearest(sub, index.codebook)
        .select(col("vec_id"), col("s"), col("code")))
    IvfAdcIndex(index.centroids, index.cells.unionByName(newCells),
      index.codes.unionByName(newCodes), index.codebook,
      index.subspaces, index.subDim)
  }

  /** s13's search phase against a PREBUILT index (s14): the corpus scan
    * here serves only the query projection and the final exact re-rank —
    * no quantizer or codebook is ever retrained at search time. The PQ
    * geometry comes FROM the index (never a caller parameter), so stored
    * tables can't be sliced against the wrong layout. Same oracle as s13:
    * the physical path differs, the results must not. */
  /** Metadata-filtered ANN against the stored index (s22): the s14 serve
    * path with an allow-predicate (label % 2 == 0, the s11 convention)
    * PRE-filtered into the candidate set — a semi-join of the stored
    * codes table against the allowed ids, so disallowed vectors never
    * reach the ADC scoring or occupy probe-k slots. This is the
    * "filtered vector search" serving form (search only docs matching a
    * metadata predicate) done the pre-filter way; post-filtering the
    * final top-k instead silently returns < k rows whenever the filter
    * is selective — the classic filtered-ANN recall bug. At scale the
    * predicate column lives IN the stored codes lake table (or arrives
    * as an id list, as here); either way the filter lands before the
    * expensive stages and the exact re-rank sees only allowed
    * candidates. */
  def filteredVsIndex(corpus: DataFrame, index: IvfAdcIndex, k: Int = 10,
      probeK: Int = 30): DataFrame = {
    val vc = vecs(corpus)
    Caching.withPersisted(vc) {
      filteredBody(corpus, vc, index, k, probeK)
    }
  }

  /** The s22 serve body over a caller-persisted prepared corpus — shared
    * with [[filteredRecall]] so the gauge audits exactly the serve path
    * it scores, off one corpus prep. */
  private def filteredBody(corpus: DataFrame, vc: DataFrame,
      index: IvfAdcIndex, k: Int, probeK: Int): DataFrame = {
    val allowed = corpus.filter(col("label") % 2 === 0)
      .select(col("vec_id"))
    val fCodes = index.codes.join(allowed, Seq("vec_id"), "left_semi")
    val qsub = defaultQueries(
      VectorOps.pqSubspaces(corpus, index.subspaces, index.subDim))
    ivfAdcSearch(vc, defaultQueries(vc), qsub,
      index.centroids, index.cells, fCodes,
      index.codebook, k, probeK, excludeSelf = true)
  }

  /** Top-k recall of the filtered serve (s23): [[filteredVsIndex]]'s
    * served neighbors scored against the exact filtered brute-force
    * top-k over the SAME allow-predicate — the quality gauge for
    * filtered ANN, where recall losses are sneakier than in the
    * unfiltered form (a probe set tuned for the full corpus can cover
    * the allowed subset badly when the predicate correlates with cell
    * geometry; this number is what says whether NProbe must grow for
    * filtered traffic). The s17 recall shape: exact side left-joins the
    * served set, per-query hit fraction; queries with an empty exact
    * top-k drop out (no 0/0 rows). Both sides rank (cos DESC,
    * neighbor_id) over IEEE-identical cosines, so the oracle — the s22
    * chain + an exact filtered scan — matches bit-for-bit. */
  def filteredRecall(corpus: DataFrame, index: IvfAdcIndex, k: Int = 10,
      probeK: Int = 30): DataFrame = {
    val vc = vecs(corpus)
    Caching.withPersisted(vc) {
      val served = Caching.materialize(
        filteredBody(corpus, vc, index, k, probeK)
          .select(col("query_id"), col("neighbor_id"),
            lit(1L).as("hit")))
      val allowed = corpus.filter(col("label") % 2 === 0)
        .select(col("vec_id"))
      val va = vc.join(allowed, Seq("vec_id"), "left_semi")
      val q = Caching.materialize(defaultQueries(vc)
        .select(col("vec_id").as("query_id"), col("x").as("qx"),
          col("nrm").as("qnrm")))
      val scored = broadcast(q)
        .join(va, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (GraftFunctions.dot(col("qx"), col("x")) /
            (col("qnrm") * col("nrm"))).as("cos"))
      val exact = graft.plans.TopK.perKey(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id")), k)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(served, Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall"))
    }
  }

  def ivfAdcVsIndex(corpus: DataFrame, index: IvfAdcIndex, k: Int = 10,
      probeK: Int = 30): DataFrame = {
    val vc = vecs(corpus)
    Caching.withPersisted(vc) {
      val qsub = defaultQueries(
        VectorOps.pqSubspaces(corpus, index.subspaces, index.subDim))
      ivfAdcSearch(vc, defaultQueries(vc), qsub,
        index.centroids, index.cells, index.codes,
        index.codebook, k, probeK, excludeSelf = true)
    }
  }

  /** IVF-probed range search against the stored index (s16): every stored
    * neighbor with exact cosine ≥ `minCos` inside the query's probed
    * cells — [[rangeSearch]]'s threshold semantics served through the
    * [[IvfAdcIndex]] coarse tier, the retrieval shape when the answer is
    * "all sufficiently close", not top-k (dedup sweeps, blocklist
    * expansion). Per-query cost drops from the full corpus to probed-cell
    * candidates (n·nprobe/cells); the exact cosine runs on candidates
    * only. Recall contract is IVF's: a neighbor assigned outside the
    * probed cells is missed — raise NProbe to trade cost for recall. */
  def ivfRangeVsIndex(corpus: DataFrame, index: IvfAdcIndex,
      minCos: Double = 0.3): DataFrame = {
    val vc = vecs(corpus)
    Caching.withPersisted(vc, index.cells) {
      ivfRangeSearch(vc, defaultQueries(vc), index, minCos,
        excludeSelf = true)
    }
  }

  /** [[ivfRangeVsIndex]] for CALLER-SUPPLIED queries — the online serving
    * form ([[ivfAdcServe]]'s precedent): query ids are the caller's
    * namespace, so no self-exclusion (a query id that numerically
    * collides with a stored vec_id must still see that stored vector).
    * Streaming twin: `streaming.StreamSimilarity.rangeVsIndex`. */
  def ivfRangeServe(queries: DataFrame, corpus: DataFrame,
      index: IvfAdcIndex, minCos: Double = 0.3): DataFrame = {
    val vc = vecs(corpus)
    val qv = vecs(queries)
    Caching.withPersisted(vc, qv, index.cells) {
      ivfRangeSearch(vc, qv, index, minCos, excludeSelf = false)
    }
  }

  /** The ONE copy of the probed-cell range search shared by the benchmark
    * and serving forms (the [[ivfAdcSearch]] pattern): probe cells →
    * cell-restricted candidates → exact cosine ≥ threshold. */
  private def ivfRangeSearch(vc: DataFrame, queries: DataFrame,
      index: IvfAdcIndex, minCos: Double,
      excludeSelf: Boolean): DataFrame = {
    val probes = bestCells(index.centroids)(queries, NProbe)
      .withColumnRenamed("vec_id", "query_id")
    val cand = Caching.materialize(probes.join(index.cells, "cent_id")
      .filter(if (excludeSelf) col("query_id") =!= col("vec_id")
              else lit(true))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct())
    cand
      .join(vc.select(col("vec_id").as("neighbor_id"), col("x"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(queries.select(
        col("vec_id").as("query_id"), col("x").as("qx"),
        col("nrm").as("qnrm"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (GraftFunctions.dot(col("qx"), col("x")) /
          (col("qnrm") * col("nrm"))).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** ANN recall evaluation (s9): run the exact baseline and an approximate
    * tier over the SAME corpus and report per-query recall@k — the quality
    * gate an ANN deployment watches when retuning probeK/band counts. The
    * join is on (query, neighbor) between two k·q-row frames, so the
    * evaluation itself costs nothing at any corpus size; the operands cost
    * whatever the two retrieval tiers cost. Emits (query_id, n_exact,
    * n_hit, recall). */
  def annRecall(embeddings: DataFrame, k: Int = 10,
      probeK: Int = 30, coarseDims: Int = 16): DataFrame = {
    // ONE prepared+persisted frame serves both operands — the corpus prep
    // (spread, norms, coarse prefix) is not paid twice for an evaluation
    val vc = withCoarse(vecs(embeddings), coarseDims)
    Caching.withPersisted(vc) {
      val exact = knnWithVc(vc, k)
        .select(col("query_id"), col("neighbor_id"))
      val approx = tieredWithVc(vc, k, probeK)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall"))
    }
  }

  /** Range-search recall evaluation (s17): [[annRecall]]'s quality gate
    * applied to the threshold family — per query, how many of the EXACT
    * above-threshold neighbors ([[rangeSearch]]) the IVF-served form
    * ([[ivfRangeVsIndex]]) finds. The number an operator watches when
    * retuning NProbe for the range tier: range semantics make missed
    * recall structurally visible (the served set is always a subset, so
    * recall IS the probe-coverage fraction). Queries with no exact
    * neighbor are vacuous and excluded (no 0/0 rows). */
  def rangeRecall(embeddings: DataFrame, minCos: Double = 0.3): DataFrame =
    rangeRecall(embeddings, ivfAdcIndex(embeddings), minCos)

  /** [[rangeRecall]] against a CALLER-SUPPLIED prebuilt index — the form a
    * deployment actually runs (the index it serves from is the index whose
    * recall it watches; rebuilding one inline would gauge a DIFFERENT
    * index and double the cost). The no-index overload above stays as the
    * self-contained quality gauge. */
  def rangeRecall(embeddings: DataFrame, index: IvfAdcIndex,
      minCos: Double): DataFrame = {
    val exact = rangeSearch(embeddings, minCos)
      .select(col("query_id"), col("neighbor_id"))
    val served = ivfRangeVsIndex(embeddings, index, minCos)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact.join(served, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact")).as("recall"))
  }

  /** Hard-negative mining (s10): for each anchor, the k most-similar
    * vectors with a DIFFERENT label — the contrastive-training staple
    * (negatives that are hard precisely because they look like the
    * anchor). Same broadcast-anchor scan shape as s1 with the label
    * inequality fused into the join condition, so the filter prunes pairs
    * before any scoring work; per-anchor reduction is the heap top-k. At
    * corpus scale the scan side composes with any candidate tier
    * (bands/cells/prefix) exactly like the other ANN paths. */
  def hardNegatives(embeddings: DataFrame, k: Int = 5): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val v = embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"), col("label"),
        VectorOps.asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(VectorOps.norm2(col("x"))))
      .transform(Partitioning.spread(_, col("vec_id")))
    Caching.withPersisted(v) {
      // materialized for the kmeansCentroids-seeds reason (see there)
      val anchors = Caching.materialize(defaultQueries(v)
        .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
          col("x").as("qx"), col("nrm").as("qnrm")))
      val scored = broadcast(anchors)
        .join(v, col("vec_id") =!= col("query_id") &&
          col("label") =!= col("qlabel"))
        .select(col("query_id"), col("qlabel"),
          col("vec_id").as("neighbor_id"), col("label").as("neg_label"),
          (GraftFunctions.dot(col("qx"), col("x")) /
            (col("qnrm") * col("nrm"))).as("cos"))
      val top = graft.plans.TopK.perKey(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id")), k)
      top.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
    }
  }

  /** Cell-assignment churn after quantizer retraining (s24): the fresh
    * full-corpus index's cell table inner-joined to the stored
    * split-trained index's on vec_id — how many vectors a retrain MOVES
    * to a different coarse cell. The IVF analog of the neighbor-graph
    * churn report (g13): s20's balance says whether the cells are even,
    * this says whether they are STABLE — a retrain that moves a large
    * fraction invalidates cached probe routing and any cell-local
    * statistics downstream, and is the signal to version the index
    * rather than swap it in place. One equi-join of two |corpus|-row
    * tables + a constant-group aggregate; empty inputs → empty report. */
  /** Assign caller-supplied vectors to their nearest coarse cell of a
    * STORED centroid table — the serve-side quantizer step alone (no
    * training): one broadcast of the ≤|cells| centroid rows against the
    * batch, per-row top-1. The per-batch body of the streaming churn
    * gauge and of any ingest path that routes arrivals into an existing
    * index ([[appendToIndex]]'s assignment stage as a standalone). */
  def assignCells(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    bestCells(centroids)(vecs(embeddings), 1)

  /** Per-batch cell-assignment churn gauge — the STREAMING twin of
    * [[cellChurn]] (VERDICT r12 #8: s24 measures retrain churn
    * batch-only, nightly; this is the same signal LIVE): for each
    * arriving vector, its STORED assignment (the build-N cells lake
    * table) vs a fresh local assignment against build-N+1's centroid
    * table. The emitted fraction is the rebuild-cadence signal — a
    * batch stream whose moved_frac jumps after a retrain says "flip
    * consumers to the new build and invalidate cell-local caches NOW",
    * without waiting for the nightly batch report. One broadcast-able
    * equi-join against the stored cells + one ≤|centroids| broadcast
    * scan per batch, O(batch); vectors unknown to the stored build are
    * counted (`n_unknown`) but excluded from the fraction — they have
    * no stored assignment to churn against. Empty batch → empty report
    * (constant-group contract). */
  def batchCellChurn(batch: DataFrame, storedCells: DataFrame,
      centroids: DataFrame): DataFrame = {
    val fresh = assignCells(batch, centroids)
      .select(col("vec_id"), col("cent_id").as("cf"))
    fresh
      .join(storedCells.select(col("vec_id"), col("cent_id").as("cs")),
        Seq("vec_id"), "left_outer")
      .groupBy(lit(true).as("all"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("cs").isNull, 1L).otherwise(0L)).as("n_unknown"),
        sum(when(col("cs").isNotNull && col("cf") =!= col("cs"), 1L)
          .otherwise(0L)).as("n_moved"),
        sum(when(col("cs").isNotNull, 1L).otherwise(0L)).as("n_known"))
      .select(col("n_rows"), col("n_known"), col("n_unknown"),
        col("n_moved"),
        when(col("n_known") > 0,
          col("n_moved").cast("double") / col("n_known").cast("double"))
          .otherwise(lit(0.0)).as("moved_frac"))
  }

  /** The coarse-quantizer training pass ALONE — k-means centroids off a
    * corpus, materialized, without the PQ codebook/codes/cells the full
    * [[ivfAdcIndex]] build pays for. The cheap input for centroid-level
    * diagnostics (s25 drift) and for pre-flighting a retrain before
    * committing to a full index build. */
  def coarseCentroids(embeddings: DataFrame): DataFrame = {
    val v = vecs(embeddings)
    Caching.withPersisted(v) { Caching.materialize(kmeansCentroids(v)) }
  }

  /** Centroid drift after retraining (s25): per centroid id, the
    * euclidean distance between its fresh and stored positions — the
    * GEOMETRY readout under s24's assignment churn: s24 says how many
    * vectors a retrain moves, this says how far the cells themselves
    * moved, and the two disagree in a useful way (large drift with low
    * churn = cells translated together, caches fine; small drift with
    * high churn = boundary vectors flipped, cell-local stats are
    * stale). Centroid ids align across builds because seeding is
    * deterministic (vec_id gates); ids trained in only one build drop
    * out of the inner join. One ≤|cells|-row equi-join + an in-order
    * 64-dim fold — driver/exec cost is centroid-count-bounded, never
    * corpus-bounded. Distances are IEEE-exact: both engines fold the
    * identical grid-derived centroid doubles in index order. */
  def centroidDrift(fresh: DataFrame, stored: DataFrame): DataFrame = {
    val f = fresh.select(col("cent_id"), col("cx").as("fx"))
    val o = stored.select(col("cent_id"), col("cx").as("ox"))
    f.join(o, "cent_id")
      .select(col("cent_id"),
        sqrt(VectorOps.pqD2(col("fx"), col("ox"))).as("drift"))
  }

  def cellChurn(fresh: IvfAdcIndex, stored: IvfAdcIndex): DataFrame = {
    val f = fresh.cells.select(col("vec_id"), col("cent_id").as("cf"))
    val o = stored.cells.select(col("vec_id"), col("cent_id").as("cs"))
    f.join(o, "vec_id")
      .groupBy(lit(true).as("all"))
      .agg(count(lit(1)).as("n_common"),
        sum(when(col("cf") === col("cs"), 1L).otherwise(0L)).as("n_same"),
        sum(when(col("cf") =!= col("cs"), 1L).otherwise(0L))
          .as("n_moved"))
      .select(col("n_common"), col("n_same"), col("n_moved"),
        (col("n_moved").cast("double") / col("n_common").cast("double"))
          .as("moved_frac"))
  }

  /** TwoNN intrinsic-dimension estimate (e23, Facco et al. 2017): over
    * the standard query sample, each point's two nearest EUCLIDEAN
    * neighbors give μ = r₂/r₁, and the MLE intrinsic dimension is
    * n / Σ ln μ — the "how many dimensions do these embeddings really
    * use" number next to e21's participation ratio: PR reads the global
    * covariance (linear structure), TwoNN reads local neighborhood
    * scaling (manifold structure), and a corpus whose TwoNN dimension
    * is far below the ambient 64 can be matryoshka-truncated (e6) or
    * PQ-coded (e5) much harder than its variance spectrum suggests.
    *
    * Parity: distances are the SAME left-fold Σ(qᵢ−cᵢ)² grid shape as
    * s18's exact side, then sqrt (IEEE); ln is grid-rounded to 5 dp as
    * DECIMAL(18,6) (the libm rule) and summed exactly; queries whose
    * nearest neighbor is an exact duplicate (r₁ = 0) are excluded and
    * counted. Per-query work is one scan + heap top-2 — composes with
    * any candidate tier at scale exactly like s1. */
  def intrinsicDimension(embeddings: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val v = vecs(embeddings)
    Caching.withPersisted(v) {
      val q = Caching.materialize(defaultQueries(v)
        .select(col("vec_id").as("query_id"), col("x").as("qx")))
      val dists = broadcast(q)
        .join(v, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          sqrt(VectorOps.pqD2(col("qx"), col("x"))).as("dist"))
      val top2 = graft.plans.TopK.perKey(dists, Seq(col("query_id")),
        Seq(col("dist"), col("neighbor_id")), 2)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("dist"), col("neighbor_id"))
      val ranked = top2.withColumn("rn", row_number().over(w))
      val mu = ranked.filter(col("rn") === 1)
        .select(col("query_id"), col("dist").as("r1"))
        .join(ranked.filter(col("rn") === 2)
          .select(col("query_id"), col("dist").as("r2")), "query_id")
      val lmu = round(log(col("r2") / col("r1")), 5)
        .cast(DecimalType(18, 6))
      mu.groupBy(lit(true).as("all"))
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("r1") > 0.0, 1L).otherwise(0L)).as("n_used"),
          sum(when(col("r1") > 0.0, lmu)
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 6))))
            .as("slm"))
        .select(col("n_queries"), col("n_used"),
          col("slm").cast("double").as("sum_log_ratio"),
          when(col("slm") > 0,
            col("n_used").cast("double") / col("slm").cast("double"))
            .otherwise(0.0).as("intrinsic_dim"))
    }
  }

  /** Exact full-dimension cosine re-rank shared by the tiered ANN paths:
    * score every (query_id, neighbor_id) candidate with the true cosine
    * from the prepared frame `vc` and keep top `k` per query. The query
    * frame is PASSED IN (not re-derived) so the candidate tier and the
    * re-rank can never disagree about what the query set is. The
    * candidate list and the query table broadcast; the corpus side is a
    * hash-join gather of probeK rows per query. */
  private def rerankExact(vc: DataFrame, q: DataFrame, cands: DataFrame,
      k: Int): DataFrame = {
    // both broadcast sides are materialized first: a broadcast-exchange
    // build job serializes its whole child plan into its (single) task
    // binary, and the candidate tree / cached-corpus query projection both
    // measured ~1 MiB at sf0.1 — over checkpoint scans the builds are KBs
    // and the broadcast VALUES (q×probeK ids, q query vectors) unchanged
    val candsM = Caching.materialize(cands)
    val qM = Caching.materialize(q.select(col("vec_id").as("query_id"),
      col("x").as("qx"), col("nrm").as("qnrm")))
    val scored = broadcast(candsM)
      .join(vc.select(col("vec_id").as("neighbor_id"), col("x"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(qM), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (GraftFunctions.dot(col("qx"), col("x")) /
          (col("qnrm") * col("nrm"))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** LSH band buckets for a prepared vector frame: band 0 packs sign bits of
    * planes 0..7, band 1 planes 8..15. */
  private def bandsOf(v: DataFrame): DataFrame = {
    val dots = (0 until NumPlanes).map(i =>
      VectorOps.dot(col("x"), typedlit(planeSigns(i))))
    def pack(from: Int): Column =
      (from until from + BandBits).map(i =>
        when(dots(i) > 0, lit(1 << (i - from))).otherwise(lit(0)))
        .reduce(_ + _)
    // Materialized: the 16 hyperplane dots are computed once per vector,
    // not re-inlined into each band reference / join side.
    v.select(col("vec_id"), col("x"), col("nrm"),
      pack(0).as("band0"), pack(BandBits).as("band1"))
      .transform(Partitioning.spread(_, col("vec_id")))
  }

  /** Per-vector LSH band buckets. Exposed for reuse/testing. */
  def withBands(embeddings: DataFrame): DataFrame = bandsOf(vecs(embeddings))

  /** IVF-style ANN (s3): k-means centroids (see [[kmeansCentroids]]), every
    * vector assigned to its best cell by cosine, queries probe their NProbe
    * best cells, exact re-rank inside the probed cells.
    *
    * Scale shape: the centroid set is small and broadcast, so assignment
    * is a map-side n×k scoring pass (no shuffle of the corpus beyond the
    * cell grouping), and search cost drops from n to n·(nprobe/k). The
    * k-means training pass touches only a 1/KMeansSampleEvery sample, so
    * quantizer cost stays a fixed fraction of one corpus pass at 100 TB. */
  val CentroidEvery = 50
  val NProbe = 2
  val KMeansIters = 2
  val KMeansSampleEvery = 5

  /** Lloyd k-means coarse quantizer, fully deterministic so the DuckDB
    * oracle can unroll the identical iterations:
    *
    *   - seeds: the `vec_id % CentroidEvery == 0` data points
    *   - training set: the `vec_id % KMeansSampleEvery == 0` sample
    *     (seeds ⊂ sample since CentroidEvery % KMeansSampleEvery == 0)
    *   - exactly KMeansIters assignment→mean steps; assignment by cosine
    *     with ties broken by cent_id
    *   - per-dimension means accumulate as DECIMAL(38,12) before the double
    *     division, so the result is independent of partition/merge order
    *   - a cell that loses all members keeps its previous centroid
    *
    * Each step broadcasts the (tiny) centroid table for assignment; only the
    * sample is shuffled for the mean recompute (posexplode → 64·|sample|
    * rows, grouped by (cell, dim)). Returns (cent_id, cx, cnrm). */
  private[operators] def kmeansCentroids(v: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    GraftFunctions.register(v.sparkSession)
    val samp = v.filter(col("vec_id") % KMeansSampleEvery === 0)
    // seeds are MATERIALIZED before the round loop: the first round's
    // query otherwise scans the caller's lazily-persisted `v` from TWO
    // concurrent stages (the seeds broadcast-exchange build and the
    // samp scan), racing its cache build (the BlockManager "already
    // exists, not re-adding" WARN — deterministic in the bench's
    // priming phase). The materialize action is a single sequential
    // scan, so v's cache exists before any concurrent consumer plans.
    val seeds = Caching.materialize(
      v.filter(col("vec_id") % CentroidEvery === 0)
        .select(col("vec_id").as("cent_id"), col("x").as("cx"),
          col("nrm").as("cnrm")))
    (1 to KMeansIters).foldLeft(seeds) { (cent, _) =>
      val scored = samp.join(broadcast(cent))
        .select(col("vec_id"), col("cent_id"),
          (GraftFunctions.dot(col("x"), col("cx")) /
            (col("nrm") * col("cnrm"))).as("ccos"))
      val asg = graft.plans.TopK.perKey(scored, Seq(col("vec_id")),
          Seq(col("ccos").desc, col("cent_id")), 1)
        .select(col("vec_id"), col("cent_id"))
      val means = samp.join(asg, "vec_id")
        .select(col("cent_id"), posexplode(col("x")))
        .groupBy(col("cent_id"), col("pos"))
        .agg((sum(col("col").cast(DecimalType(38, 12))).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cent_id"),
          transform(col("pm"), p => p.getField("m")).as("mx"))
      cent.join(means, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("mx"), col("cx")).as("cx"))
        .withColumn("cnrm", sqrt(VectorOps.norm2(col("cx"))))
    }
  }

  /** Best `n` cells per vector by cosine against the broadcast centroid
    * table — the IVF assignment/probe primitive shared by [[annIvf]] and
    * [[ivfAdcAnn]]. */
  private def bestCells(cent: DataFrame)(
      side: DataFrame, n: Int): DataFrame = {
    val scored = side
      .join(broadcast(cent))
      .select(col("vec_id"), col("cent_id"),
        (GraftFunctions.dot(col("x"), col("cx")) /
          (col("nrm") * col("cnrm"))).as("ccos"))
    graft.plans.TopK.perKey(scored, Seq(col("vec_id")),
      Seq(col("ccos").desc, col("cent_id")), n)
      .select(col("vec_id"), col("cent_id"))
  }

  def annIvf(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val v = vecs(embeddings)
    Caching.withPersisted(v) {
      // Materialized eagerly: the centroid table is referenced by both the
      // corpus assignment and the query probes — without this each broadcast
      // would re-run the Lloyd iterations.
      val cent = Caching.materialize(kmeansCentroids(v))
      val cells = Caching.materialize(bestCells(cent)(v, 1))
      val probes = bestCells(cent)(v.filter(col("vec_id") % 100 === 0), NProbe)
        .withColumnRenamed("vec_id", "query_id")
      // candidate list is queries×probed-cells rows; materialized so the
      // exact re-rank joins carry a checkpoint scan instead of the whole
      // probe tree in their task binaries
      val cand = Caching.materialize(probes.join(cells, "cent_id")
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
        .distinct())
      topKPerQuery(rescored(cand, v), k)
    }
  }

  /** Exact cosine for a candidate-pair frame against the vector frame. */
  private def rescored(cand: DataFrame, v: DataFrame): DataFrame =
    cand
      .join(v.select(col("vec_id").as("query_id"), col("x").as("qx"),
        col("nrm").as("qnrm")), "query_id")
      .join(v.select(col("vec_id").as("neighbor_id"), col("x").as("nx"),
        col("nrm").as("nnrm")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (GraftFunctions.dot(col("qx"), col("nx")) /
          (col("qnrm") * col("nnrm"))).as("cos"))

  /** LSH-bucketed ANN top-k (s2): candidates share at least one band bucket
    * with the query; exact cosine re-rank, top-k per query. One vector frame
    * is threaded through the band build AND the re-rank (single persist). */
  def annLsh(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val v = vecs(embeddings)
    Caching.withPersisted(v) {
      val bands = bandsOf(v).select(col("vec_id"),
        explode(array(
          struct(lit(0).as("bi"), col("band0").as("bucket")),
          struct(lit(1).as("bi"), col("band1").as("bucket")))).as("b"))
        .select(col("vec_id"), col("b.bi").as("bi"),
          col("b.bucket").as("bucket"))
      // Explicit aliases on BOTH sides: `bands` appears twice, and
      // dataframe-reference conditions (qb("bi") === bands("bi")) resolve to
      // a trivially-true self-comparison under plan changes. The string-path
      // form is the only robust self-join condition.
      val qb = bands.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("bi"), col("bucket"))
      val cand = qb.as("q").join(bands.as("c"),
          col("q.bi") === col("c.bi") &&
            col("q.bucket") === col("c.bucket") &&
            col("q.query_id") =!= col("c.vec_id"))
        .select(col("q.query_id").as("query_id"),
          col("c.vec_id").as("neighbor_id"))
        .distinct()
      topKPerQuery(rescored(cand, v), k)
    }
  }

  /** Hybrid retrieval with reciprocal-rank fusion (s5): fuse a lexical
    * ranking (distinct-token overlap with the query document) and a vector
    * ranking (exact cosine top-k, [[knnBruteForce]]) into one RRF score,
    * `sum(1 / (c + rank))` over the lists a doc appears in — the standard
    * fusion step of a retrieval-augmented curation pipeline ("find docs like
    * these seeds, lexically OR semantically"). Queries are the `% 100 == 0`
    * id set shared with s1–s4; `documents` and `embeddings` align on id.
    *
    * 100 TB shape: the query token set is tiny and broadcast, so the
    * lexical side is a broadcast join + count aggregate (corpus never
    * shuffles wide); both rankings reduce to k·q rows through the heap
    * top-k operator before the full-outer fusion join, which is therefore
    * k·q-sized — the corpus-scale work is two narrow scans. */
  def hybridRrf(documents: DataFrame, embeddings: DataFrame,
      k: Int = 20, rrfC: Int = 60): DataFrame = {
    val toks = documents
      .transform(Partitioning.spread(_, col("doc_id")))
      .select(col("doc_id"),
        explode(array_distinct(LlmText.words(col("text")))).as("term"))
    val qtoks = toks.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"), col("term"))
    val ovl = broadcast(qtoks)
      .join(toks, Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("ovl"))
    val wl = Window.partitionBy(col("query_id"))
      .orderBy(col("ovl").desc, col("doc_id"))
    val lexRank = graft.plans.TopK
      .perKey(ovl, Seq(col("query_id")), Seq(col("ovl").desc, col("doc_id")), k)
      .withColumn("rank_l", row_number().over(wl))
      .select(col("query_id"), col("doc_id"), col("rank_l"))
    val vecRank = knnBruteForce(embeddings, k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("rank_v"))
    lexRank.join(vecRank, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(rrfC) + col("rank_l")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfC) + col("rank_v")), lit(0.0)))
          .as("rrf_score"))
  }
}
