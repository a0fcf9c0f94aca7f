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

  test("withBands: collinear vectors share both band buckets") {
    val bands = Similarity.withBands(emb)
      .select("vec_id", "band0", "band1").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(bands(0L) == bands(1L))
    assert(bands(0L)._1 == (bands(4L)._1 ^ 0xff),
      "opposite vector has complementary band bits")
  }
}
