package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** 64-dim unit-ish vectors with a known cosine order relative to e1. */
  private def vec(parts: (Int, Float)*): Array[Float] = {
    val a = Array.fill(64)(0f)
    parts.foreach { case (i, v) => a(i) = v }
    a
  }

  private val emb = Seq(
    (0L, vec(0 -> 1f), 0),               // the query (0 % 100 == 0)
    (1L, vec(0 -> 2f), 0),               // same direction → cos 1
    (2L, vec(0 -> 1f, 1 -> 1f), 0),      // 45° → cos ≈ 0.707
    (3L, vec(1 -> 1f), 0),               // orthogonal → cos 0
    (4L, vec(0 -> -1f), 0))              // opposite → cos -1
    .toDF("vec_id", "embedding", "label")

  test("planeSigns is a deterministic ±1 matrix") {
    assert(Similarity.planeSigns.size == Similarity.NumPlanes)
    assert(Similarity.planeSigns.forall(_.size == Similarity.Dim))
    assert(Similarity.planeSigns.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(Similarity.planeSigns.flatten.count(_ == 1.0) > 300,
      "signs should be roughly balanced")
  }

  test("knnBruteForce ranks neighbors by exact cosine") {
    val out = Similarity.knnBruteForce(emb, k = 10)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("neighbor_id")),
        r.getInt(r.fieldIndex("rank")),
        r.getDouble(r.fieldIndex("cos"))))
      .sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.head._3 == 1.0)
    assert(math.abs(out(1)._3 - math.sqrt(0.5)) < 1e-12)
    assert(out(2)._3 == 0.0)
    assert(out(3)._3 == -1.0)
  }

  test("annLsh finds the co-directional duplicate through a shared bucket") {
    val out = Similarity.annLsh(emb, k = 5).collect()
      .map(r => (r.getLong(r.fieldIndex("neighbor_id")),
        r.getInt(r.fieldIndex("rank")), r.getDouble(r.fieldIndex("cos"))))
    // vec 1 is collinear with the query → identical 16-bit signature →
    // guaranteed candidate, exact cosine 1, rank 1
    assert(out.nonEmpty)
    val top = out.minBy(_._2)
    assert(top._1 == 1L && top._3 == 1.0)
    // the opposite vector flips every sign bit → never a candidate
    assert(!out.exists(_._1 == 4L))
  }

  test("kmeansCentroids: Lloyd steps move seeds to the cluster means") {
    import org.apache.spark.sql.functions._
    // Two tight clusters around e0 and e1. Seeds (vec_id % 50 == 0) are ids
    // 0 and 50; the training sample (vec_id % 5 == 0) is all of them.
    def cluster(base: Int, dim: Int, n: Int): Seq[(Long, Array[Float])] =
      (0 until n).map { i =>
        val a = Array.fill(64)(0f)
        a(dim) = 1f
        a(dim + 2) = 0.05f * i // small spread inside the cluster
        (base + 5L * i, a)
      }
    val v = (cluster(0, 0, 4) ++ cluster(50, 1, 4))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
      .withColumn("nrm", sqrt(graft.operators.VectorOps.norm2(col("x"))))
    val cents = Similarity.kmeansCentroids(v)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    assert(cents.keySet == Set(0L, 50L))
    // each centroid is the mean of its own cluster: dominant dim 1.0,
    // spread dim = mean of the float-valued spreads (float repr carried
    // exactly into double, so compute the expectation the same way)
    val spread = (0 until 4).map(i => (0.05f * i).toDouble).sum / 4
    assert(math.abs(cents(0L)(0) - 1.0) < 1e-9)
    assert(math.abs(cents(0L)(2) - spread) < 1e-9)
    assert(math.abs(cents(50L)(1) - 1.0) < 1e-9)
    assert(math.abs(cents(50L)(3) - spread) < 1e-9)
    assert(cents(0L)(1) == 0.0 && cents(50L)(0) == 0.0)
  }

  test("annTiered: coarse-prefix candidates, exact re-rank, high recall") {
    import org.apache.spark.sql.functions._
    // The recall contract holds for MRL-SHAPED embeddings — information
    // concentrated in the prefix dims, which is what matryoshka training
    // produces. (On i.i.d.-random synthetic vectors the 16-dim prefix
    // carries only 1/4 of the energy and prefix cosine is a weak proxy —
    // measured recall@5 ≈ 0.24 there; that regime belongs to annIvf/
    // annLsh, whose candidates don't rely on prefix structure.) Plant
    // 20 clusters of 10 whose identity lives in dims 0–15, with small
    // per-vector noise in dims 16–63.
    val mrl = (0L until 200L).map { i =>
      val rnd = new scala.util.Random(i % 20) // cluster pattern
      val head = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
      val noise = new scala.util.Random(1000 + i)
      val tail = Array.fill(48)((noise.nextDouble() * 0.2 - 0.1).toFloat)
      (i, head ++ tail, (i % 20).toInt)
    }.toDF("vec_id", "embedding", "label")
    val exact = Similarity.knnBruteForce(mrl, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    val tiered = Similarity.annTiered(mrl, k = 5, probeK = 30)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    val hits = exact.select("query_id", "neighbor_id")
      .join(tiered.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
    val total = exact.count()
    val recall = hits.toDouble / total
    info(s"annTiered recall@5 on MRL-shaped vectors = $recall ($hits/$total)")
    assert(recall >= 0.9, s"tiered recall@5 $recall below floor")
    // the survivors' cosines are the EXACT full-dim values: every returned
    // (query, neighbor) pair that brute force also returns agrees on cos
    val mismatch = exact.as("e")
      .join(tiered.as("t"), Seq("query_id", "neighbor_id"))
      .filter(col("e.cos") =!= col("t.cos")).count()
    assert(mismatch == 0, "re-ranked cosine must equal the exact cosine")
  }

  test("hammingAnn: sign-word candidates, exact re-rank, high recall") {
    import org.apache.spark.sql.functions._
    // Hamming distance over sign bits is a cosine-angle proxy when vector
    // identity lives in the SIGN PATTERN. Plant 20 clusters of 10 whose
    // pattern values are uniform in [-1, 1] across all 64 dims, with ±0.1
    // per-vector noise: a sign flips only when the pattern value sits
    // within the noise band (~5% of dims), so same-cluster Hamming ≈ 3
    // bits while cross-cluster ≈ 32 — the candidate tier separates
    // cleanly and the exact re-rank fixes the final order.
    val data = (0L until 200L).map { i =>
      val rnd = new scala.util.Random(i % 20) // cluster sign pattern
      val pat = Array.fill(64)(rnd.nextDouble() * 2 - 1)
      val noise = new scala.util.Random(1000 + i)
      val v = pat.map(p => (p + noise.nextDouble() * 0.2 - 0.1).toFloat)
      (i, v, (i % 20).toInt)
    }.toDF("vec_id", "embedding", "label")
    val exact = Similarity.knnBruteForce(data, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val ham = Similarity.hammingAnn(data, k = 5, probeK = 30)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val hits = exact.select("query_id", "neighbor_id")
      .join(ham.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
    val total = exact.count()
    val recall = hits.toDouble / total
    info(s"hammingAnn recall@5 on sign-structured vectors = $recall ($hits/$total)")
    assert(recall >= 0.9, s"hamming recall@5 $recall below floor")
    // survivors carry the EXACT full-dimension cosine
    val mismatch = exact.as("e")
      .join(ham.as("t"), Seq("query_id", "neighbor_id"))
      .filter(col("e.cos") =!= col("t.cos")).count()
    assert(mismatch == 0, "re-ranked cosine must equal the exact cosine")
  }

  test("hardNegatives returns nearest DIFFERENT-label vectors only") {
    import org.apache.spark.sql.functions._
    val data = Seq(
      (0L, vec(0 -> 1f), 7),               // anchor, label 7
      (1L, vec(0 -> 2f), 7),               // same label, collinear → excluded
      (2L, vec(0 -> 1f, 1 -> 1f), 3),      // other label, 45° → hardest neg
      (3L, vec(1 -> 1f), 3),               // other label, orthogonal
      (4L, vec(0 -> -1f), 5))              // other label, opposite
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(data, k = 2).collect()
      .map(r => (r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("neighbor_id")),
        r.getInt(r.fieldIndex("neg_label"))))
      .sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(2L, 3L),
      "hardest different-label negatives in cosine order; collinear " +
        s"same-label vec 1 excluded, got ${out.toSeq}")
    assert(out.map(_._3).toSeq == Seq(3, 3))
  }

  test("annRecall reports per-query hit counts against the exact baseline") {
    import org.apache.spark.sql.functions._
    // Same MRL-shaped fixture as the annTiered spec, where the tier is
    // known-perfect — so every query must report recall exactly 1.0, and
    // the arithmetic (n_hit / n_exact) is pinned by construction.
    val mrl = (0L until 200L).map { i =>
      val rnd = new scala.util.Random(i % 20)
      val head = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
      val noise = new scala.util.Random(1000 + i)
      val tail = Array.fill(48)((noise.nextDouble() * 0.2 - 0.1).toFloat)
      (i, head ++ tail, (i % 20).toInt)
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.annRecall(mrl, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 2, "queries are vec_id 0 and 100")
    out.foreach { case (q, nExact, nHit, recall) =>
      assert(nExact == 5L && nHit == 5L && recall == 1.0,
        s"query $q: $nHit/$nExact")
    }
  }

  test("pqAdcAnn: code-tuple candidates, exact re-rank, high recall") {
    import org.apache.spark.sql.functions._
    // 4 clusters of 50 with cluster = id % 4, so the deterministic PQ
    // seeds (ids 0, 61, 122, 183) each fall in a DIFFERENT cluster and
    // the one-Lloyd codebook converges to the four cluster centers. Every
    // vector then snaps to its own cluster's code tuple, giving
    // cluster-mates ADC ≈ 0 and everyone else a positive floor. ADC ties
    // inside a cluster break by vec_id, not cosine — so probeK must cover
    // the full 49-mate cluster for the exact re-rank to see all of them.
    val data = (0L until 200L).map { i =>
      val rnd = new scala.util.Random(i % 4)
      val pat = Array.fill(64)(rnd.nextDouble() * 2 - 1)
      val noise = new scala.util.Random(1000 + i)
      val v = pat.map(p => (p + noise.nextDouble() * 0.2 - 0.1).toFloat)
      (i, v, (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
    val exact = Similarity.knnBruteForce(data, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val adc = Similarity.pqAdcAnn(data, k = 5, probeK = 60)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val hits = exact.select("query_id", "neighbor_id")
      .join(adc.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
    val total = exact.count()
    val recall = hits.toDouble / total
    info(s"pqAdcAnn recall@5 on clustered vectors = $recall ($hits/$total)")
    assert(recall >= 0.9, s"ADC recall@5 $recall below floor")
    val mismatch = exact.as("e")
      .join(adc.as("t"), Seq("query_id", "neighbor_id"))
      .filter(col("e.cos") =!= col("t.cos")).count()
    assert(mismatch == 0, "re-ranked cosine must equal the exact cosine")
  }

  test("ivfAdcAnn: cell-restricted ADC keeps recall, exact re-rank cosines") {
    import org.apache.spark.sql.functions._
    // same 4-cluster layout as the pqAdcAnn spec: the coarse quantizer's
    // cells align with the clusters, so restricting ADC to probed cells
    // must not lose the cluster-mate neighbors the full ADC pass finds
    val data = (0L until 200L).map { i =>
      val rnd = new scala.util.Random(i % 4)
      val pat = Array.fill(64)(rnd.nextDouble() * 2 - 1)
      val noise = new scala.util.Random(1000 + i)
      val v = pat.map(p => (p + noise.nextDouble() * 0.2 - 0.1).toFloat)
      (i, v, (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
    val exact = Similarity.knnBruteForce(data, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val ivfadc = Similarity.ivfAdcAnn(data, k = 5, probeK = 60)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val hits = exact.select("query_id", "neighbor_id")
      .join(ivfadc.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
    val total = exact.count()
    val recall = hits.toDouble / total
    info(s"ivfAdcAnn recall@5 on clustered vectors = $recall ($hits/$total)")
    assert(recall >= 0.9, s"IVF-ADC recall@5 $recall below floor")
    val mismatch = exact.as("e")
      .join(ivfadc.as("t"), Seq("query_id", "neighbor_id"))
      .filter(col("e.cos") =!= col("t.cos")).count()
    assert(mismatch == 0, "re-ranked cosine must equal the exact cosine")
  }

  test("filteredVsIndex: only allowed neighbors; vacuous filter ≡ s14") {
    import org.apache.spark.sql.functions.{col, lit}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfAdcIndex(emb)
    val out = Similarity.filteredVsIndex(emb, idx).collect()
    assert(out.nonEmpty)
    // every returned neighbor satisfies the allow predicate
    val allowed = emb.filter(col("label") % 2 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r =>
      allowed(r.getLong(r.fieldIndex("neighbor_id")))),
      "a disallowed neighbor leaked through the pre-filter")
    // with a vacuous predicate (all labels even) the filtered path must
    // equal the unfiltered serve path bit-for-bit
    val allEven = emb.withColumn("label", lit(2))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("neighbor_id")),
        r.getDouble(r.fieldIndex("cos")))).sortBy(t => (t._1, -t._3, t._2))
      .toSeq
    assert(key(Similarity.filteredVsIndex(allEven, idx)) ==
      key(Similarity.ivfAdcVsIndex(emb, idx)))
  }

  test("ivfAdcVsIndex: parquet-stored index equals the end-to-end path") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfAdcIndex(emb)
    // land all four tables and reload — the index must be a plain lake
    // artifact, not something alive only inside one driver
    val dir = java.nio.file.Files.createTempDirectory("ivfadc-").toString
    idx.centroids.write.parquet(s"$dir/centroids")
    idx.cells.write.parquet(s"$dir/cells")
    idx.codes.write.parquet(s"$dir/codes")
    idx.codebook.write.parquet(s"$dir/codebook")
    val stored = Similarity.IvfAdcIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/cells"),
      spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/codebook"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("neighbor_id")),
        r.getDouble(r.fieldIndex("cos")))).sortBy(t => (t._1, -t._3, t._2))
      .toSeq
    val viaIndex = key(Similarity.ivfAdcVsIndex(emb, stored))
    val endToEnd = key(Similarity.ivfAdcAnn(emb))
    assert(viaIndex == endToEnd,
      "stored-index search must equal the end-to-end IVFADC path")
    assert(viaIndex.nonEmpty)
  }

  test("ivfAdcAppend: appended vectors are searchable, quantizers frozen") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // split on % 7 so the quantizer's deterministic training sample
    // (vec_id % 5 == 0) and seeds (% 50 == 0) stay in the stored side
    val known = emb.filter(col("vec_id") % 7 =!= 3)
    // arriving batch: the held-out vectors, plus an exact duplicate of a
    // query vector under a fresh id — the append path must make it the
    // query's top stored neighbor
    val dupSrc = emb.filter(col("vec_id") === 100)
      .select(lit(900001L).as("vec_id"), col("embedding"), col("label"))
    val arriving = emb.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(dupSrc)
    val idx = Similarity.ivfAdcIndex(known)
    val idx2 = Similarity.ivfAdcAppend(arriving, idx)
    // quantizers untouched; cell/code tables grew by exactly the batch
    assert(idx2.centroids eq idx.centroids)
    assert(idx2.codebook eq idx.codebook)
    val grown = idx2.cells.count() - idx.cells.count()
    assert(grown == arriving.count(), s"cells grew by $grown")
    // the duplicate lands in the same cell as its source vector
    val cellOf = idx2.cells.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellOf(900001L) == cellOf(100L),
      "identical vector must be assigned the identical stored cell")
    // and search over the appended index surfaces it for query 100 —
    // the corpus side is the post-ingest lake table (original ∪ appended),
    // which supplies the exact re-rank vectors
    val corpus2 = emb.unionByName(dupSrc)
    val hits = Similarity.ivfAdcVsIndex(corpus2, idx2, k = 5)
      .filter(col("query_id") === 100 && col("neighbor_id") === 900001L)
      .collect()
    assert(hits.nonEmpty && math.abs(hits.head.getDouble(
      hits.head.fieldIndex("cos")) - 1.0) < 1e-12,
      "appended exact duplicate must be found at cosine 1")
  }

  test("annIvf recall vs exact brute force on real embeddings") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.knnBruteForce(emb, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.annIvf(emb, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id")).count()
    val total = exact.count()
    val recall = hits.toDouble / total
    info(s"annIvf recall@5 = $recall ($hits/$total)")
    assert(recall >= 0.5, s"k-means IVF recall@5 $recall below floor")
  }

  test("annLsh recall on planted near-duplicates is total") {
    // Hyperplane-band LSH's contract is HIGH-similarity retrieval: a
    // near-identical vector shares all 16 sign bits w.h.p. and therefore
    // both band buckets. (On weak-similarity neighbors — random corpus
    // vectors — low recall is the designed trade; annIvf covers that
    // regime, see its recall test.) Plant a near-copy for every query id
    // and require each one retrieved at rank 1.
    val base = (0 until 300).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(64)((rnd.nextInt(13) - 6).toFloat))
    }.toMap
    val planted = Seq(0L, 100L, 200L).map { q =>
      val copy = base(q).clone()
      copy(0) = copy(0) + 0.01f
      (q + 1, copy)
    }
    val emb = (base - 1L - 101L - 201L).toSeq.++(planted)
      .toDF("vec_id", "embedding")
    val out = Similarity.annLsh(emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    for (q <- Seq(0L, 100L, 200L))
      assert(out.contains((q, q + 1, 1)),
        s"planted near-dup of $q at rank 1; got ${out.filter(_._1 == q).toSeq}")
  }

  test("withBands: collinear vectors share both band buckets") {
    val bands = Similarity.withBands(emb)
      .select("vec_id", "band0", "band1").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(bands(0L) == bands(1L))
    assert(bands(0L)._1 == (bands(4L)._1 ^ 0xff),
      "opposite vector has complementary band bits")
  }

  test("rangeSearch returns every neighbor above the threshold, no more") {
    val out = Similarity.rangeSearch(emb, minCos = 0.3)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("neighbor_id")),
        r.getDouble(r.fieldIndex("cos"))))
      .sortBy(_._1)
    // cos(1)=1, cos(2)=0.707 pass; cos(3)=0, cos(4)=-1 fail
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0)._2 == 1.0)
    assert(math.abs(out(1)._2 - math.sqrt(0.5)) < 1e-12)
  }

  test("hybridRrf fuses lexical and vector ranks reciprocally") {
    // doc 1 matches the query both lexically and by vector; doc 2 only by
    // vector (disjoint text); doc 3 only lexically (orthogonal vector).
    val docs = Seq(
      (0L, "alpha beta gamma"),  // the query doc (0 % 100 == 0)
      (1L, "alpha beta delta"),  // 2 shared tokens → lex rank 1
      (2L, "zeta eta theta"),    // 0 shared tokens → lexically absent
      (3L, "alpha epsilon mu"))  // 1 shared token → lex rank 2
      .toDF("doc_id", "text")
    val vecsDf = Seq(
      (0L, vec(0 -> 1f), 0),
      (1L, vec(0 -> 2f), 0),               // cos 1   → vec rank 1
      (2L, vec(0 -> 1f, 1 -> 1f), 0),      // cos .71 → vec rank 2
      (3L, vec(1 -> 1f), 0))               // cos 0   → vec rank 3
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hybridRrf(docs, vecsDf, k = 3)
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(math.abs(out(1L) - (1.0 / 61 + 1.0 / 61)) < 1e-12) // both lists
    assert(math.abs(out(2L) - 1.0 / 62) < 1e-12)              // vector only
    assert(math.abs(out(3L) - (1.0 / 62 + 1.0 / 63)) < 1e-12) // lex 2, vec 3
  }

  test("filteredKnn only returns corpus rows passing the predicate") {
    // neighbor 1 (odd label) is the TRUE nearest — a post-filter of the
    // unfiltered top-k would lose rank 1; the pre-filter must instead
    // promote the best even-label rows.
    val embs = Seq(
      (0L, vec(0 -> 1f), 0),               // query
      (1L, vec(0 -> 2f), 1),               // cos 1 but odd label → excluded
      (2L, vec(0 -> 1f, 1 -> 1f), 2),      // cos .707, allowed → rank 1
      (3L, vec(1 -> 1f), 4),               // cos 0, allowed → rank 2
      (4L, vec(0 -> -1f), 3))              // odd label → excluded
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.filteredKnn(embs, k = 2).collect()
      .map(r => r.getInt(r.fieldIndex("rank")) ->
        (r.getLong(r.fieldIndex("neighbor_id")),
          r.getInt(r.fieldIndex("label"))))
      .toMap
    assert(out(1)._1 == 2L && out(2)._1 == 3L)
    assert(out.values.forall(_._2 % 2 == 0), "every hit passes the filter")
    assert(out.size == 2)
  }

  test("mmrVsCorpus serves external queries with the same greedy order") {
    val queries = Seq((1000L, vec(0 -> 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val corpus = Seq(
      (1L, vec(0 -> 0.8f, 1 -> 0.6f), 0),
      (2L, vec(0 -> 0.8f, 1 -> 0.6f, 2 -> 0.001f), 0),
      (3L, vec(0 -> 0.6f, 1 -> -0.8f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.mmrVsCorpus(queries, corpus, k = 3).collect()
      .map(r => r.getInt(r.fieldIndex("mmr_rank")) ->
        r.getLong(r.fieldIndex("neighbor_id"))).toMap
    assert(out == Map(1 -> 1L, 2 -> 3L, 3 -> 2L))
  }

  test("mmrRerank demotes near-duplicates of already-selected results") {
    // candidate 2 is a near-copy of candidate 1 (rel ≈ .8, sim ≈ 1);
    // candidate 3 has lower relevance (.6) but is ORTHOGONAL to 1 — pure
    // relevance ranks (1, 2, 3), MMR must rank (1, 3, 2).
    val embs = Seq(
      (0L, vec(0 -> 1f), 0),                         // query
      (1L, vec(0 -> 0.8f, 1 -> 0.6f), 0),            // rel .8 → pick 1
      (2L, vec(0 -> 0.8f, 1 -> 0.6f, 2 -> 0.001f), 0), // its near-dup
      (3L, vec(0 -> 0.6f, 1 -> -0.8f), 0))           // rel .6, sim(1,3)=0
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.mmrRerank(embs, k = 3).collect()
      .map(r => r.getInt(r.fieldIndex("mmr_rank")) ->
        r.getLong(r.fieldIndex("neighbor_id"))).toMap
    assert(out == Map(1 -> 1L, 2 -> 3L, 3 -> 2L))
  }

  test("ivfRangeVsIndex: nonempty probed-cell subset of exact range search") {
    import org.apache.spark.sql.functions.col
    val data = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfAdcIndex(data)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("neighbor_id")),
        r.getDouble(r.fieldIndex("cos")))).toSet
    val served = key(Similarity.ivfRangeVsIndex(data, idx))
    val exact = key(Similarity.rangeSearch(data))
    assert(served.nonEmpty, "the served range search must find neighbors")
    assert(served.subsetOf(exact),
      s"every served pair must be an exact range hit with the identical " +
        s"cosine: ${served -- exact}")
    // and the threshold is real: nothing below the s4 bar sneaks through
    assert(served.forall(_._3 >= 0.3))
  }

  test("rangeRecall: per-query probe-coverage fraction, bounded and exact") {
    import org.apache.spark.sql.functions.col
    val data = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rec = Similarity.rangeRecall(data).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rec.nonEmpty, "queries with exact neighbors exist")
    rec.foreach { case (q, nExact, nHit, recall) =>
      assert(nExact > 0 && nHit <= nExact, s"query $q: $nHit/$nExact")
      assert(recall == nHit.toDouble / nExact && recall >= 0.0 &&
        recall <= 1.0, s"query $q recall $recall")
    }
    // consistency with the operands: hits are exactly the served pairs
    // that are also exact pairs
    val idx = Similarity.ivfAdcIndex(data)
    val served = Similarity.ivfRangeVsIndex(data, idx)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.rangeSearch(data)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantHits = exact.groupBy(_._1).map { case (q, es) =>
      q -> es.count(served.contains) }
    rec.foreach { case (q, _, nHit, _) =>
      assert(wantHits(q) == nHit, s"query $q hit count drifted") }
  }

  test("ivfAdcServe: query id colliding with a stored vec_id keeps it") {
    import org.apache.spark.sql.functions._
    val data = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfAdcIndex(data)
    // the caller's query id 100 numerically collides with stored corpus
    // vec_id 100 AND carries that very vector — ids are the CALLER's
    // namespace, so the stored twin must come back at cosine 1, not be
    // silently dropped by the benchmark paths' self-exclusion
    val q = data.filter(col("vec_id") === 100)
    val hits = Similarity.ivfAdcServe(q, data, idx, k = 5)
      .filter(col("query_id") === 100 && col("neighbor_id") === 100)
      .collect()
    assert(hits.nonEmpty,
      "serve must not exclude the stored vector whose id collides with " +
        "the caller's query id")
    assert(math.abs(
      hits.head.getDouble(hits.head.fieldIndex("cos")) - 1.0) < 1e-12)
    // the benchmark self-search form still excludes: queries there ARE
    // corpus rows and a self-hit would be vacuous
    assert(Similarity.ivfAdcVsIndex(data, idx, k = 5)
      .filter(col("query_id") === col("neighbor_id")).count() == 0L)
  }

  test("probeFanout counts each query's probed-cell candidate set") {
    import org.apache.spark.sql.functions._
    val data = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.probeFanout(data).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = data.count()
    val queries = data.filter(col("vec_id") % 100 === 0).count()
    // every query reports, fanout is a real subset: at least one
    // candidate (its own cell minus itself), never the whole corpus
    assert(out.size == queries, s"${out.size} of $queries queries")
    assert(out.values.forall(c => c >= 1L && c < n), s"$out")
    assert(out.values.sum < queries * n,
      "probe fanout must restrict candidates below brute force")
    // deterministic under repartitioning — telemetry cannot drift with
    // the physical layout
    val alt = Similarity.probeFanout(data.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt == out)
  }

  test("adcErrorStats: per-query gauge is bounded and self-consistent") {
    import org.apache.spark.sql.functions._
    val data = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probeK = 30
    val rows = Similarity.adcErrorStats(data, probeK = probeK).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val queries = data.filter(col("vec_id") % 100 === 0).count()
    assert(rows.size == queries, s"${rows.size} of $queries queries")
    rows.values.foreach { case (nCands, meanErr, maxErr) =>
      assert(nCands >= 1L && nCands <= probeK.toLong, s"n_cands $nCands")
      assert(meanErr >= 0.0 && maxErr >= 0.0)
      // the mean of |err| can never exceed the max (shared 1e-9 grid
      // keeps both exact, so no float-slop tolerance is needed)
      assert(meanErr <= maxErr + 1e-12, s"mean $meanErr > max $maxErr")
      assert(!meanErr.isNaN && !maxErr.isNaN && !maxErr.isInfinite)
    }
    // determinism: the gauge is a pure function of the corpus
    val again = Similarity.adcErrorStats(data, probeK = probeK).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(again == rows)
  }

  test("index-backed gauges match their inline-training twins") {
    import org.apache.spark.sql.functions._
    val data = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfAdcIndex(data)
    // the gauges a deployment runs against its STORED tables must read
    // exactly what inline training computes (the s14 identity, extended
    // to s18/s19/s20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(Similarity.adcErrorStats(data, idx, probeK = 30)) ==
      rows(Similarity.adcErrorStats(data)))
    assert(rows(Similarity.probeFanout(data, idx)) ==
      rows(Similarity.probeFanout(data)))
    assert(rows(Similarity.cellBalance(idx)) ==
      rows(Similarity.cellBalance(data)))
  }

  test("adcErrorBySubspace: per-subspace split is consistent with s18") {
    import org.apache.spark.sql.functions._
    val data = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfAdcIndex(data)
    val by = Similarity.adcErrorBySubspace(data, idx).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // one row per PQ subspace, every pair count equal (each candidate
    // pair contributes exactly one term per subspace)
    assert(by.keySet == Set(0, 1, 2, 3), s"${by.keySet}")
    assert(by.values.map(_._1).toSet.size == 1,
      s"subspace pair counts diverged: $by")
    by.values.foreach { case (n, meanErr, maxErr) =>
      assert(n >= 1L)
      assert(meanErr >= 0.0 && meanErr <= maxErr + 1e-12, s"$by")
    }
    // the sum of per-subspace mean errors bounds the corpus-level s18
    // mean from above (triangle inequality: |Σa-Σb| <= Σ|a-b|, applied
    // per pair then averaged — candidate sets are identical)
    val s18 = Similarity.adcErrorStats(data, idx, probeK = 30).collect()
    val totalPairs = s18.map(_.getLong(1)).sum
    val s18MeanAll = s18.map(r => r.getLong(1) * r.getDouble(2)).sum /
      totalPairs
    assert(by.values.map(_._1).head == totalPairs,
      s"subspace pair universe ${by.values.map(_._1).head} != s18 " +
        s"candidate universe $totalPairs")
    val bySumMean = by.values.map(_._2).sum
    assert(s18MeanAll <= bySumMean + 1e-9,
      s"s18 mean $s18MeanAll exceeds per-subspace sum $bySumMean")
  }

  test("cellChurn: identical quantizers move nothing; split-only join") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val full = Similarity.ivfAdcIndex(emb)
    // identical indexes: every common vector keeps its cell
    val same = Similarity.cellChurn(full, full).collect().head
    assert(same.getLong(0) == 5L && same.getLong(1) == 5L &&
      same.getLong(2) == 0L && same.getDouble(3) == 0.0, s"$same")
    // split-trained stored index: the churn join covers only the
    // vectors BOTH indexes know (the split), never the arrivals
    val stored = Similarity.ivfAdcIndex(
      emb.filter(pmod(col("vec_id"), lit(7)) =!= 3))
    val churn = Similarity.cellChurn(full, stored).collect().head
    assert(churn.getLong(0) == 4L, s"$churn")
    assert(churn.getLong(1) + churn.getLong(2) == churn.getLong(0))
  }

  test("intrinsicDimension: hand-checked TwoNN ratio on a line") {
    def vec(t: Float): Array[Float] = {
      val a = Array.fill(64)(0f); a(0) = t; a
    }
    // only id 0 is a query (vec_id % 100 == 0); its neighbors on the
    // line sit at distances 1 and 3 -> mu = 3
    val embs = Seq((0L, vec(0f)), (1L, vec(1f)), (2L, vec(3f)),
      (3L, vec(7f))).toDF("vec_id", "embedding")
    val r = Similarity.intrinsicDimension(embs).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 1L && r.head.getLong(1) == 1L)
    val ln3 = math.rint(math.log(3.0) * 1e5) / 1e5
    assert(r.head.getDouble(2) == ln3, s"${r.head}")
    assert(math.abs(r.head.getDouble(3) - 1.0 / ln3) < 1e-12)
  }

  test("intrinsicDimension excludes exact-duplicate nearest neighbors") {
    def vec(t: Float): Array[Float] = {
      val a = Array.fill(64)(0f); a(0) = t; a
    }
    // the query's nearest neighbor is an exact copy: r1 = 0 -> the
    // query is counted but not used, and the estimate guards to 0.0
    val embs = Seq((0L, vec(2f)), (1L, vec(2f)), (2L, vec(5f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.intrinsicDimension(embs).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L)
    assert(r.getDouble(3) == 0.0)
  }

  test("centroidDrift: per-id euclidean distance; one-build-only ids " +
    "drop out") {
    import org.apache.spark.sql.functions.col
    val fresh = Seq((1L, Seq(3.0, 0.0), 1.0), (2L, Seq(1.0, 1.0), 1.0))
      .toDF("cent_id", "cx", "cnrm")
    val stored = Seq((1L, Seq(0.0, 4.0), 1.0), (3L, Seq(9.0, 9.0), 1.0))
      .toDF("cent_id", "cx", "cnrm")
    val out = Similarity.centroidDrift(fresh, stored).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // only the shared id survives; 3-4-5 triangle
    assert(out == Map(1L -> 5.0), s"$out")
    // identical builds drift zero
    val same = Similarity.centroidDrift(fresh, fresh).collect()
      .map(r => r.getDouble(1)).toSeq
    assert(same == Seq(0.0, 0.0), s"$same")
  }

  test("sq8Serve: quantized corpus keeps the exact order of the axis " +
    "fixture (its vectors are int8-grid-exact), queries stay float") {
    val out = Similarity.sq8Serve(emb, k = 10).collect()
      .map(r => (r.getLong(r.fieldIndex("neighbor_id")),
        r.getInt(r.fieldIndex("rank")),
        r.getDouble(r.fieldIndex("cos"))))
      .sortBy(_._2)
    // every fixture vector has coordinates in {-1, 0, 1, 2} → the
    // max-abs grid reproduces them exactly (qv·scale == value), so the
    // SQ8 tier returns s1's exact ranks AND cosines
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L), s"${out.toSeq}")
    assert(out.head._3 == 1.0)
    assert(math.abs(out(1)._3 - math.sqrt(0.5)) < 1e-12)
    assert(out(2)._3 == 0.0)
    assert(out(3)._3 == -1.0)
  }
}
