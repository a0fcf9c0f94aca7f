package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.functions.GraftFunctions

import org.apache.spark.sql.DataFrame
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
    * into every pair-stage reference. */
  private def vecs(embeddings: DataFrame): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"),
        VectorOps.asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(VectorOps.norm2(col("x"))))
      .transform(Partitioning.spread(_, col("vec_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Brute-force cosine top-k (s1): queries = vec_id % 100 == 0. */
  def knnBruteForce(embeddings: DataFrame, k: Int = 10): DataFrame = {
    val v = vecs(embeddings)
    val q = v.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("x").as("qx"),
        col("nrm").as("qnrm"))
    val scored = broadcast(q)
      .join(v, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (GraftFunctions.dot(col("qx"), col("x")) /
          (col("qnrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-vector LSH band buckets: band 0 packs sign bits of planes 0..7,
    * band 1 planes 8..15. Exposed for reuse/testing. */
  def withBands(embeddings: DataFrame): DataFrame = {
    val v = vecs(embeddings)
    val dots = (0 until NumPlanes).map(i =>
      VectorOps.dot(col("x"), typedlit(planeSigns(i))))
    def pack(from: Int): org.apache.spark.sql.Column =
      (from until from + BandBits).map(i =>
        when(dots(i) > 0, lit(1 << (i - from))).otherwise(lit(0)))
        .reduce(_ + _)
    // Materialized: the 16 hyperplane dots are computed once per vector,
    // not re-inlined into each band reference / join side.
    v.select(col("vec_id"), col("x"), col("nrm"),
      pack(0).as("band0"), pack(BandBits).as("band1"))
      .transform(Partitioning.spread(_, col("vec_id")))
  }

  /** IVF-style ANN (s3): data-sampled centroids (vec_id % CentroidEvery ==
    * 0), every vector assigned to its best cell by cosine, queries probe
    * their NProbe best cells, exact re-rank inside the probed cells.
    *
    * Scale shape: the centroid set is small and broadcast, so assignment
    * is a map-side n×k scoring pass (no shuffle of the corpus beyond the
    * cell grouping), and search cost drops from n to n·(nprobe/k). At
    * 100 TB the centroid sample would come from k-means — the plumbing
    * (broadcast assign → cell equi-join → re-rank) is identical. */
  val CentroidEvery = 50
  val NProbe = 2

  def annIvf(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val v = vecs(embeddings)
    val cent = v.filter(col("vec_id") % CentroidEvery === 0)
      .select(col("vec_id").as("cent_id"), col("x").as("cx"),
        col("nrm").as("cnrm"))
    def bestCells(side: DataFrame, n: Int): DataFrame = {
      val scored = side
        .join(broadcast(cent))
        .select(col("vec_id"), col("cent_id"),
          (GraftFunctions.dot(col("x"), col("cx")) /
            (col("nrm") * col("cnrm"))).as("ccos"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .select(col("vec_id"), col("cent_id"))
    }
    val cells = bestCells(v, 1)
    val probes = bestCells(v.filter(col("vec_id") % 100 === 0), NProbe)
      .withColumnRenamed("vec_id", "query_id")
    val cand = probes.join(cells, "cent_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val scored = cand
      .join(v.select(col("vec_id").as("query_id"), col("x").as("qx"),
        col("nrm").as("qnrm")), "query_id")
      .join(v.select(col("vec_id").as("neighbor_id"), col("x").as("nx"),
        col("nrm").as("nnrm")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (GraftFunctions.dot(col("qx"), col("nx")) /
          (col("qnrm") * col("nnrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN top-k (s2): candidates share at least one band bucket
    * with the query; exact cosine re-rank, top-k per query. */
  def annLsh(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val sig = withBands(embeddings)
    val bands = sig.select(col("vec_id"),
      explode(array(
        struct(lit(0).as("bi"), col("band0").as("bucket")),
        struct(lit(1).as("bi"), col("band1").as("bucket")))).as("b"))
      .select(col("vec_id"), col("b.bi").as("bi"), col("b.bucket").as("bucket"))
    val qb = bands.filter(col("vec_id") % 100 === 0)
      .withColumnRenamed("vec_id", "query_id")
    val cand = qb.join(bands,
        qb("bi") === bands("bi") && qb("bucket") === bands("bucket") &&
          col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val v = vecs(embeddings)
    val scored = cand
      .join(v.select(col("vec_id").as("query_id"), col("x").as("qx"),
        col("nrm").as("qnrm")), "query_id")
      .join(v.select(col("vec_id").as("neighbor_id"), col("x").as("nx"),
        col("nrm").as("nnrm")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (GraftFunctions.dot(col("qx"), col("nx")) /
          (col("qnrm") * col("nnrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
