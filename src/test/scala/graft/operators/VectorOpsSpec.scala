package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("groupCentroids: exact per-dim means in long form, partition-stable") {
    val e = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 6.0f)),
      ("b", Array(10.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = VectorOps.groupCentroids(e)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out(("a", 0)) == (2.0, 2L))
    assert(out(("a", 1)) == (4.0, 2L))
    assert(out(("b", 0)) == (10.0, 1L))
    assert(out(("b", 1)) == (0.0, 1L))
    // same values under a different partitioning (order-independent sums)
    val again = VectorOps.groupCentroids(e.repartition(5))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(again == out)
  }

  test("zscoreNormalize centers and scales each dimension") {
    // dim 0: values 0, 2 → mu 1, var 1; dim 1: constant → var 0 (eps guards)
    val e = Seq(
      (1L, Array(0.0f, 5.0f)),
      (2L, Array(2.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.zscoreNormalize(e).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getInt(r.fieldIndex("dim"))) ->
        r.getDouble(r.fieldIndex("zscore"))).toMap
    assert(math.abs(out((1L, 0)) + 1.0) < 1e-6)
    assert(math.abs(out((2L, 0)) - 1.0) < 1e-6)
    // constant dimension maps to ~0, not NaN/Inf
    assert(math.abs(out((1L, 1))) < 1e-3 && !out((1L, 1)).isNaN)
    // partition-stable (grid-exact moments)
    val again = VectorOps.zscoreNormalize(e.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(again == out)
  }

  test("int8Quantize: symmetric scale, floor(+0.5) ties, exact errors") {
    // the engine sees the f32-rounded values (0.254f != 0.254) — replicate
    // the same float->double widening the column cast performs
    val xs = Array(1.0f, -0.5f, 0.0f, 0.254f).map(_.toDouble)
    val e = Seq(
      (1L, xs.map(_.toFloat)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.int8Quantize(e).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    // replicate the exact IEEE expression tree
    val maxabs = 1.0
    val up = 127.0 / maxabs
    val down = maxabs / 127.0
    val q = xs.map(v => math.floor(v * up + 0.5))
    val l2 = xs.zip(q).map { case (v, qi) =>
      val d = v - qi * down; d * d
    }.foldLeft(0.0)(_ + _)
    val maxErr = xs.zip(q).map { case (v, qi) =>
      math.abs(v - qi * down)
    }.max
    assert(out(1L) == ((maxabs / 127.0, -63L, 127L, l2, maxErr)))
    // zero vector: scale 0, quantized to zeros, zero error
    assert(out(2L) == ((0.0, 0L, 0L, 0.0, 0.0)))
  }

  test("pqEncode assigns Lloyd-refined codes per subspace with exact errors") {
    // 4-dim vectors, 2 subspaces of 2 dims; seeds = vec_id % 3 == 0
    // (vecs 0 and 3). Two tight clusters around (0,0)/(10,10) per
    // subspace → after one Lloyd step the codebook is each cluster's mean
    // and members code to their own cluster.
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.2f, 0.0f, 0.2f, 0.0f)),
      (2L, Array(0.4f, 0.0f, 0.4f, 0.0f)),
      (3L, Array(10.0f, 10.0f, 10.0f, 10.0f)),
      (4L, Array(10.2f, 10.0f, 10.2f, 10.0f)),
      (5L, Array(10.4f, 10.0f, 10.4f, 10.0f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.pqEncode(vecs, subspaces = 2, subDim = 2, seedMod = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getDouble(3)))
      .toMap
    assert(out.size == 12)
    // cluster membership: vecs 0-2 → code of seed 0, vecs 3-5 → seed 3's
    for (s <- 0 to 1) {
      assert(Seq(0L, 1L, 2L).map(v => out((v, s))._1).distinct == Seq(1))
      assert(Seq(3L, 4L, 5L).map(v => out((v, s))._1).distinct == Seq(2))
    }
    // Lloyd centroid of cluster 1 in each subspace is ((0+0.2+0.4)/3, 0)
    // on the 1e-9 grid; vec 1 sits near it with the exact squared distance
    val c0 = Seq(0.0, 0.2, 0.4).map(v =>
      math.round(v.toFloat.toDouble * 1e9)).sum.toDouble / 3 / 1e9
    val x1 = 0.2f.toDouble
    val expected = (x1 - c0) * (x1 - c0) + (0.0 - 0.0) * (0.0 - 0.0)
    assert(out((1L, 0))._2 == expected)
  }

  test("randomProjection: seeded signs, grid-exact sums, long form") {
    // 4-dim input, 2 output dims: the expected projection is the local
    // replay of the same md5-derived ±1 signs over the same 1e-9 grid
    def sign(j: Int, i: Int): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"rp:$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.take(7), 16) % 2 == 0) 1L else -1L
    }
    val vec = Array(0.5f, -1.25f, 2.0f, 0.125f)
    val out = VectorOps.randomProjection(
      Seq((7L, vec)).toDF("vec_id", "embedding"), outDims = 2, inDims = 4)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    for (j <- 0 until 2) {
      val expected = vec.zipWithIndex.map { case (v, i) =>
        math.round(v.toDouble * 1e9) * sign(j, i)
      }.sum.toDouble / 1e9
      assert(out(j) == expected, s"out_dim $j")
    }
    assert(out.size == 2)
  }

  test("matryoshkaTruncate keeps the prefix direction at unit length") {
    import spark.implicits._
    // first 4 dims (3,4,0,0) → norm 5 → (0.6, 0.8, 0, 0); tail ignored
    val v = Array.fill(64)(0f); v(0) = 3f; v(1) = 4f; v(10) = 9f
    val out = VectorOps.matryoshkaTruncate(
      Seq((1L, v, 2)).toDF("vec_id", "embedding", "label"), dims = 4)
      .collect().map(r => r.getInt(2) -> r.getDouble(3)).toMap
    assert(out == Map(0 -> 0.6, 1 -> 0.8, 2 -> 0.0, 3 -> 0.0))
    assert(math.abs(out.values.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("gramMatrix: one-pass upper-triangle second moments") {
    import spark.implicits._
    val v1 = Array.fill(64)(0f); v1(0) = 2f; v1(1) = 3f
    val v2 = Array.fill(64)(0f); v2(0) = 1f
    val out = VectorOps.gramMatrix(
      Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDouble(2), r.getLong(3)))).toMap
    assert(out.size == 64 * 65 / 2, "one row per upper-triangle cell")
    assert(out.values.forall(_._2 == 2L), "n = corpus row count everywhere")
    assert(out((0, 0))._1 == 5.0) // 2·2 + 1·1
    assert(out((0, 1))._1 == 6.0) // 2·3 + 1·0
    assert(out((1, 1))._1 == 9.0)
    assert(out((2, 63))._1 == 0.0)
    assert(!out.contains((1, 0)), "strictly upper triangle")
  }

  test("pc1PowerIteration recovers a planted dominant direction") {
    import spark.implicits._
    // 50 vectors = ±(3·e5) plus small noise in e7: the second moment is
    // dominated by dim 5, so the top eigenvector must concentrate there.
    val data = (0L until 50L).map { i =>
      val a = Array.fill(64)(0f)
      a(5) = if (i % 2 == 0) 3f else -3f
      a(7) = 0.01f * (i % 5)
      (i, a)
    }.toDF("vec_id", "embedding")
    val out = VectorOps.pc1PowerIteration(data)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val loading = out.view.mapValues(_._1).toMap
    assert(math.abs(math.abs(loading(5)) - 1.0) < 1e-6,
      s"PC1 must align with dim 5, got ${loading(5)}")
    assert(loading.filter(_._1 != 5).values.forall(l => math.abs(l) < 1e-2))
    // unit norm and a positive dominant eigenvalue ≈ Σ x5² = 50·9
    assert(math.abs(loading.values.map(l => l * l).sum - 1.0) < 1e-9)
    val lambda = out(5)._2
    assert(math.abs(lambda - 450.0) < 1.0, s"eigenvalue $lambda")
  }

  test("removeTopComponent zeroes the dominant direction, keeps the rest") {
    import spark.implicits._
    val data = (0L until 50L).map { i =>
      val a = Array.fill(64)(0f)
      a(5) = if (i % 2 == 0) 3f else -3f
      a(7) = 0.01f * (i % 5)
      (i, a)
    }.toDF("vec_id", "embedding")
    val out = VectorOps.removeTopComponent(data)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    // the planted dominant component vanishes; the small orthogonal-ish
    // noise in dim 7 survives (PC1 has ~no dim-7 loading)
    assert((0L until 50L).forall(i => math.abs(out((i, 5))) < 1e-4))
    assert(math.abs(out((1L, 7)) - 0.01f.toDouble) < 1e-3)
    assert(math.abs(out((0L, 7))) < 1e-3)
  }

  test("binaryQuantize packs sign bits into two 32-bit words") {
    import spark.implicits._
    // sign convention: x >= 0 sets the bit (zero counts as positive)
    val v = Array.fill(64)(-1f)
    v(0) = 1f; v(2) = 0f; v(5) = 2f // w0 bits 0, 2, 5
    v(32) = 1f; v(63) = 3f          // w1 bits 0, 31
    val r = VectorOps.binaryQuantize(Seq((7L, v)).toDF("vec_id", "embedding"))
      .collect().head
    assert(r.getLong(r.fieldIndex("w0")) == ((1L << 0) | (1L << 2) | (1L << 5)))
    assert(r.getLong(r.fieldIndex("w1")) == ((1L << 0) | (1L << 31)))
    assert(r.getLong(r.fieldIndex("n_pos")) == 5L)
  }

  test("top2PowerIteration recovers two planted orthogonal directions") {
    import spark.implicits._
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, v) => a(i) = v }
      a
    }
    // Gram = diag(160 at dim0, 20 at dim1): exact, well-separated spectrum
    val embs = ((0L until 10L).map(i => (i, vec(0 -> 4f))) ++
      (10L until 15L).map(i => (i, vec(1 -> 2f))))
      .toDF("vec_id", "embedding")
    val out = VectorOps.top2PowerIteration(embs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(math.abs(out((1, 0))._1) > 0.99, "PC1 is the dim-0 direction")
    assert(math.abs(out((2, 1))._1) > 0.99, "PC2 is the dim-1 direction")
    val (l1, l2) = (out((1, 0))._2, out((2, 1))._2)
    assert(math.abs(l1 - 160.0) < 1.0 && math.abs(l2 - 20.0) < 1.0)
    assert(l1 > l2)
    assert(out.size == 2 * 64)
  }

  test("spectralGap folds the two planted eigenvalues into one row") {
    import spark.implicits._
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, v) => a(i) = v }
      a
    }
    // the top2PowerIteration fixture: spectrum diag(160, 20) → gap 8
    val embs = ((0L until 10L).map(i => (i, vec(0 -> 4f))) ++
      (10L until 15L).map(i => (i, vec(1 -> 2f))))
      .toDF("vec_id", "embedding")
    val r = VectorOps.spectralGap(embs).collect()
    assert(r.length == 1)
    val (l1, l2) = (r.head.getDouble(0), r.head.getDouble(1))
    assert(math.abs(l1 - 160.0) < 1.0 && math.abs(l2 - 20.0) < 1.0)
    assert(r.head.getDouble(2) == l1 / l2)
    assert(r.head.getDouble(3) == l1 / (l1 + l2))
  }

  test("pcProject: per-vector coordinates on the two planted directions") {
    import spark.implicits._
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, v) => a(i) = v }
      a
    }
    // the top2PowerIteration fixture: PC1 = dim-0 axis, PC2 = dim-1 axis
    val embs = ((0L until 10L).map(i => (i, vec(0 -> 4f))) ++
      (10L until 15L).map(i => (i, vec(1 -> 2f))))
      .toDF("vec_id", "embedding")
    val out = VectorOps.pcProject(embs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out.size == 15)
    // dim-0 vectors land at |pc1| ≈ 4 with ~no pc2 coordinate; dim-1
    // vectors at |pc2| ≈ 2 with ~no pc1 — the 2-D map separates the
    // two populations on orthogonal axes
    (0L until 10L).foreach { i =>
      assert(math.abs(math.abs(out(i)._1) - 4.0) < 1e-6, s"${out(i)}")
      assert(math.abs(out(i)._2) < 1e-6, s"${out(i)}")
    }
    (10L until 15L).foreach { i =>
      assert(math.abs(out(i)._1) < 1e-6, s"${out(i)}")
      assert(math.abs(math.abs(out(i)._2) - 2.0) < 1e-6, s"${out(i)}")
    }
    // within a population every projection is IDENTICAL (same input row),
    // so the map is usable as a stratification key
    assert((0L until 10L).map(out).toSet.size == 1)
    assert((10L until 15L).map(out).toSet.size == 1)
  }

  test("centroidOutliers ranks members by distance from their label centroid") {
    import spark.implicits._
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, v) => a(i) = v }
      a
    }
    // label 0 centroid ≈ (2/3, 1/3): v3 (pure e1) is the farthest member
    val embs = Seq(
      (1L, vec(0 -> 1f), 0),
      (2L, vec(0 -> 1f), 0),
      (3L, vec(1 -> 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = VectorOps.centroidOutliers(embs, k = 2).collect()
      .map(r => r.getInt(r.fieldIndex("outlier_rank")) ->
        r.getLong(r.fieldIndex("vec_id"))).toMap
    assert(out == Map(1 -> 3L, 2 -> 1L)) // tie v1/v2 → vec_id ascending
  }

  test("kmeansStep assigns by cosine argmax and means grid-exactly") {
    import spark.implicits._
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, v) => a(i) = v }
      a
    }
    // seeds (seedEvery=2): c0 = e0, c2 = e1
    val embs = Seq(
      (0L, vec(0 -> 1f)),            // seed c0, assigns to itself
      (1L, vec(0 -> 2f)),            // cos 1 with c0
      (2L, vec(1 -> 1f)),            // seed c2
      (3L, vec(0 -> 1f, 1 -> 1f)))   // cos .707 with BOTH → tie → c0
      .toDF("vec_id", "embedding")
    val out = VectorOps.kmeansStep(embs, seedEvery = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out((0L, 0)) == ((1.0 + 2.0 + 1.0) / 3, 3L))
    assert(out((0L, 1)) == (1.0 / 3, 3L))
    assert(out((2L, 1)) == (1.0, 1L))
    assert(out((2L, 0)) == (0.0, 1L))
    assert(out.size == 2 * 64)
  }

  test("clusterQuality: cohesion vs best-other-centroid separation") {
    // A sits alone on e0 → margin 1; B and C share the e1 direction, so
    // each one's best OTHER centroid is as close as its own → margin 0
    val embs = Seq(
      (1L, "A", Array(1.0f, 0.0f)), (2L, "A", Array(1.0f, 0.0f)),
      (3L, "B", Array(0.0f, 1.0f)), (4L, "B", Array(0.0f, 1.0f)),
      (5L, "C", Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = VectorOps.clusterQuality(embs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(out("A") == (2L, 1.0, 0.0, 1.0))
    assert(out("B") == (2L, 1.0, 1.0, 0.0))
    assert(out("C") == (1L, 1.0, 1.0, 0.0))
  }

  test("centroidDrift: stable label passes, rotated label flags") {
    import spark.implicits._
    // label 0: same direction in both snapshots → cos 1; label 1: the
    // incoming snapshot rotated to an orthogonal direction → cos 0
    val accepted = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f)), (2L, 0, Array(1.0f, 0.0f, 0.0f)),
      (4L, 1, Array(0.0f, 1.0f, 0.0f)), (6L, 1, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val incoming = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (3L, 1, Array(0.0f, 0.0f, 1.0f)), (5L, 1, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = VectorOps.centroidDrift(accepted, incoming).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(0) == (2L, 1L, 1.0, false), s"$out")
    assert(out(1)._3 == 0.0 && out(1)._4, "orthogonal drift must flag")
  }

  test("participationRatio: rank-1 collapse is 1, k orthogonal dims is k") {
    import spark.implicits._
    def vec(vals: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f); vals.foreach { case (i, v) => a(i) = v }; a
    }
    def run(vs: Array[Float]*) = {
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      VectorOps.participationRatio(df).collect().head
    }
    // colinear vectors: trace 5, tr(C²) 25 → PR exactly 1
    val rank1 = run(vec(0 -> 1f), vec(0 -> 2f))
    assert(rank1.getLong(0) == 2L, s"$rank1")
    assert(rank1.getDouble(3) == 1.0, s"$rank1")
    // four orthonormal one-hot vectors: trace 4, tr(C²) 4 → PR 4
    val iso = run(vec(0 -> 1f), vec(1 -> 1f), vec(2 -> 1f), vec(3 -> 1f))
    assert(iso.getDouble(3) == 4.0, s"$iso")
    // uneven mass: diag(2,1) → 9/5
    val mixed = run(vec(0 -> 1f), vec(0 -> 1f), vec(1 -> 1f))
    assert(math.abs(mixed.getDouble(3) - 1.8) < 1e-12, s"$mixed")
  }

  test("anisotropy: closed-form mean pairwise cosine, hand-checked") {
    import spark.implicits._
    def vec(v0: Float, v1: Float): Array[Float] = {
      val a = Array.fill(64)(0f); a(0) = v0; a(1) = v1; a
    }
    def run(vs: (Float, Float)*) = {
      val df = vs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, vec(a, b)) }
        .toDF("vec_id", "embedding")
      VectorOps.anisotropy(df).collect()
    }
    // two identical directions: mean pairwise cosine = 1
    val same = run((1f, 0f), (2f, 0f)).head
    assert(same.getLong(0) == 2L, s"$same")
    assert(math.abs(same.getDouble(2) - 1.0) < 1e-9, s"$same")
    // orthogonal pair: 0; opposite pair: -1
    val orth = run((1f, 0f), (0f, 1f)).head
    assert(math.abs(orth.getDouble(2)) < 1e-9, s"$orth")
    val opp = run((1f, 0f), (-1f, 0f)).head
    assert(math.abs(opp.getDouble(2) + 1.0) < 1e-9, s"$opp")
    // a zero vector has no direction: excluded, not NaN-poisoning
    val withZero = run((1f, 0f), (2f, 0f), (0f, 0f)).head
    assert(withZero.getLong(0) == 2L, s"$withZero")
    assert(math.abs(withZero.getDouble(2) - 1.0) < 1e-9, s"$withZero")
    // n < 2 → gauge pinned to 0.0, no 0/0
    val single = run((1f, 0f)).head
    assert(single.getLong(0) == 1L && single.getDouble(2) == 0.0,
      s"$single")
    // empty input → zero rows (constant-group contract)
    assert(run().isEmpty)
  }

  test("dimStats: hand-computed per-dimension mean and variance") {
    import spark.implicits._
    def vec(v0: Float, v1: Float): Array[Float] = {
      val a = Array.fill(64)(0f); a(0) = v0; a(1) = v1; a
    }
    // dim 0: values {1, 3} → mean 2, var ((1+9)/2) − 4 = 1
    // dim 1: constant 0.5 → mean 0.5, var 0 (a DEAD dim)
    // dims 2..63: all zero → mean 0, var 0
    val embs = Seq((1L, vec(1f, 0.5f), 0), (2L, vec(3f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = VectorOps.dimStats(embs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(out(0) == ((2L, 2.0, 1.0)), s"dim0: ${out(0)}")
    assert(out(1) == ((2L, 0.5, 0.0)), s"dim1: ${out(1)}")
    assert(out(5) == ((2L, 0.0, 0.0)))
    assert(out.size == 64)
    // partition-order independence: grid sums are exact
    val alt = VectorOps.dimStats(embs.repartition(7)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(alt == out)
  }

  test("pqWorstVectors: head equals the grid-summed e5 distortions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val data = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val k = 10
    val head = VectorOps.pqWorstVectors(data, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(head.length == k)
    // ranks are 1..k, distortions non-increasing, ties broken by vec_id
    assert(head.map(_._3).toSeq == (1 to k), s"${head.toSeq}")
    head.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1), s"$a !>= $b")
    }
    // the head is exactly the top-k of the full per-vector grid sums
    val full = VectorOps.pqEncode(data)
      .groupBy(col("vec_id"))
      .agg((sum(round(col("err2") * lit(1.0e9), 0).cast("long"))
        .cast("double") / lit(1.0e9)).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(t => (-t._2, t._1)).take(k).toSeq
    assert(head.map(t => (t._1, t._2)).toSeq == full, s"$full")
  }

  test("standardize: hand-computed z-scores; dead dims stay finite") {
    import spark.implicits._
    def vec(v0: Float, v1: Float): Array[Float] = {
      val a = Array.fill(64)(0f); a(0) = v0; a(1) = v1; a
    }
    // dim 0: {1, 3} → mean 2, var 1 → z = ±1/sqrt(1 + 1e-9);
    // dim 1: constant (var 0) → z = 0/sqrt(1e-9) = 0, never NaN/Inf
    val embs = Seq((1L, vec(1f, 0.5f), 0), (2L, vec(3f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = VectorOps.standardize(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val z = 1.0 / math.sqrt(1.0 + 1e-9)
    assert(out((1L, 0)) == -z && out((2L, 0)) == z,
      s"${out((1L, 0))} / ${out((2L, 0))}")
    assert(out((1L, 1)) == 0.0 && out((2L, 1)) == 0.0)
    assert(out.size == 2 * 64)
    assert(out.values.forall(v => !v.isNaN && !v.isInfinite))
    // whitened: every dim's z-scores sum to ~0
    (0 until 64).foreach { d =>
      assert(math.abs(out((1L, d)) + out((2L, d))) < 1e-9, s"dim $d")
    }
  }

  test("alignmentUniformity: a collapsed label reads (1, 0); an " +
    "orthogonal one reads (0, -4); pairing is consecutive-by-id") {
    // label 0: three identical vectors → 2 pairs, cos = 1 each →
    //   alignment 1, uniformity ln(e^(4·1−4)) = ln(1) = 0 (collapse!)
    // label 1: two orthogonal vectors → 1 pair, cos = 0 →
    //   alignment 0, uniformity ln(e^−4) = −4 (well spread)
    val ex = Array.fill(4)(0.0f); ex(0) = 1.0f
    val ey = Array.fill(4)(0.0f); ey(1) = 1.0f
    val e = Seq(
      (1L, ex, 0), (2L, ex, 0), (3L, ex, 0),
      (10L, ex, 1), (11L, ey, 1))
      .toDF("vec_id", "embedding", "label")
    val out = VectorOps.alignmentUniformity(e).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(out(0) == ((2L, 1.0, 0.0)), s"$out")
    assert(out(1)._1 == 1L && out(1)._2 == 0.0, s"$out")
    assert(math.abs(out(1)._3 - -4.0) < 1e-3, s"$out")
    // deterministic under repartitioning (window pairing is by id)
    val alt = VectorOps.alignmentUniformity(e.repartition(5)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(alt == out)
  }

  test("projectionDistortion: a one-dimension difference has distortion " +
    "exactly 1; an identical pair reads null") {
    // pair (0,1) differs only in dim 0 by 0.5 → every projected
    // coordinate differs by ±0.5, so d2_proj = 16·0.25 and the
    // normalized distortion is exactly 1.0 (no cross-terms to cancel)
    val a = Array.fill(64)(0.0f); a(0) = 1.0f
    val b = Array.fill(64)(0.0f); b(0) = 0.5f
    val c = Array.fill(64)(0.25f)
    val e = Seq((0L, a, 0), (1L, b, 0), (2L, c, 0), (3L, c, 0))
      .toDF("vec_id", "embedding", "label")
    val out = VectorOps.projectionDistortion(e).collect()
      .map(r => r.getLong(0) -> r).toMap
    val p01 = out(0L)
    assert(p01.getLong(1) == 1L)
    assert(p01.getDouble(2) == 0.25 && p01.getDouble(3) == 4.0, s"$p01")
    assert(p01.getDouble(4) == 1.0, s"$p01")
    val p23 = out(2L)
    assert(p23.getDouble(2) == 0.0 && p23.isNullAt(4), s"$p23")
  }
}
