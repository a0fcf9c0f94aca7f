package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dense-vector column math over `array<double>` columns, built from
  * Catalyst higher-order functions (zip_with/transform/aggregate) — no UDFs,
  * so the expressions ship to executors as codegen-friendly plans and work
  * on any partitioning.
  *
  * Summation is strictly in index order with a 0.0 seed, which makes every
  * result bit-identical to an oracle that reduces the same list left-to-right
  * (IEEE: 0.0 + x == x), independent of Spark partitioning/parallelism.
  */
object VectorOps {

  /** In-order sum of an array<double> column. */
  def asum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product in index order. Inputs must be array<double>. */
  def dot(a: Column, b: Column): Column =
    asum(zip_with(a, b, (x, y) => x * y))

  /** Squared L2 norm in index order. */
  def norm2(a: Column): Column = asum(zip_with(a, a, (x, y) => x * y))

  /** Cosine similarity with the exact expression shape
    * dot / (sqrt(n2a) * sqrt(n2b)) — mirrored verbatim by the oracle SQL. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Float-array column → exact double array (f32→f64 is lossless). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Matryoshka truncation (e6): keep the first `dims` coordinates and
    * re-normalize to unit length — the MRL serving trick where a nested
    * prefix of a trained embedding is a valid lower-dimensional embedding,
    * cutting ANN storage and distance cost by dims/64 with a pure
    * projection (no shuffle, no model). Long form (vec_id, label, dim,
    * mval) like e1/e3 so every compared cell is a scalar double; the norm
    * is the index-order fold the oracle mirrors. */
  def matryoshkaTruncate(embeddings: DataFrame, dims: Int = 16,
      vecCol: String = "embedding"): DataFrame = {
    val t = slice(asDouble(col(vecCol)), 1, dims)
    embeddings
      .select(col("vec_id"), col("label"), t.as("t"))
      .withColumn("nrm", sqrt(norm2(col("t"))))
      .select(col("vec_id"), col("label"), col("nrm"),
        posexplode(col("t")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        (col("v") / col("nrm")).as("mval"))
  }

  /** Per-label norm-band histogram (e24): vectors bucketed by L2 norm
    * into 0.5-wide bands, per label — the embedding-QC gate that runs
    * BEFORE any cosine math: un-normalized stragglers (a band far from
    * the cluster), near-zero vectors (band 0 — dead inputs, failed
    * encodes), and label-conditional norm drift (one class embedding
    * systematically longer) all show up as band rows a threshold can
    * refuse, the cheap first look next to e16's per-dimension moments.
    *
    * Parity: the norm is the index-order Σx² fold + sqrt (IEEE), then
    * GRID-ROUNDED to 5 dp as DECIMAL(18,6) before banding — ×2 and
    * floor happen in exact decimal arithmetic, so a norm landing on a
    * band boundary buckets identically on both engines (the libm grid
    * rule applied to bucketing, same reason q38's equi-depth ranks are
    * computed on rounded keys). Min/max surface the band's actual norm
    * range; integers elsewhere.
    *
    * Scale shape: one projection + one (label, band) hash aggregate
    * with map-side combine — no shuffle wider than labels × bands. */
  def normBands(embeddings: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val g = round(sqrt(norm2(asDouble(col(vecCol)))), 5)
      .cast(DecimalType(18, 6))
    embeddings
      .select(col("label"), g.as("nrm_g"))
      .select(col("label"),
        floor(col("nrm_g") * 2).cast("long").as("band"), col("nrm_g"))
      .groupBy(col("label"), col("band"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("nrm_g")).cast("double").as("min_nrm"),
        max(col("nrm_g")).cast("double").as("max_nrm"))
  }

  /** Exact distributed per-group vector mean (e1): centroid of the
    * embedding column per group, in long form (group, dim, centroid value,
    * member count) — the aggregation at the heart of IVF training,
    * mean-pooled source embeddings, and cluster profiling.
    *
    * posexplode turns the n×d array column into n·d (group, dim, value)
    * rows, then one hash aggregate on (group, dim) with map-side combine —
    * shuffle rows = groups × dims, not corpus size. Long form keeps every
    * output cell a scalar double, so oracle comparison is
    * representation-stable (no array-of-double canonicalization).
    *
    * Components are quantized to a 1e-9 grid BEFORE accumulation
    * (`round(v·1e9)` → integer, summed as DECIMAL(38,0) so 10¹² vectors
    * cannot overflow): a direct double→DECIMAL cast rounds arbitrary
    * floats differently across engines (HALF_UP vs HALF_EVEN at the last
    * decimal digit), whereas the scaled round is the same IEEE product and
    * away-from-zero rounding everywhere. The mean is exact on the grid —
    * error ≤ 5e-10 per component, far inside f32 input noise. */
  def groupCentroids(embeddings: DataFrame, by: String = "label",
      vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(by), posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .groupBy(col(by), col("dim"))
      .agg(
        (sum(round(col("v") * lit(1.0e9)).cast(DecimalType(38, 0)))
          .cast("double") / (count(col("v")) * lit(1.0e9))).as("centroid"),
        count(col("v")).as("n_vecs"))

  /** Per-dimension z-score normalization (e3): center and scale every
    * embedding dimension by its corpus mean and standard deviation — the
    * whitening-lite preprocessing that stops high-variance dimensions from
    * dominating cosine/L2 retrieval. Long-form output (vec_id, dim, z)
    * keeps every cell a scalar double for representation-stable oracle
    * comparison (e1 precedent); production callers re-assemble the array.
    *
    * Moments are exact on a 1e-9 grid: components quantize with round()
    * (away-from-zero in both engines) and Σg / Σg² accumulate as
    * DECIMAL(38,0) — order-independent, overflow-free, bit-identical
    * across engines (g² above 2^53 is still exact: doubles there are all
    * integers). The 64-row stats table broadcasts back over the explode;
    * the corpus itself is never shuffled. */
  def zscoreNormalize(embeddings: DataFrame, eps: Double = 1e-9,
      vecCol: String = "embedding"): DataFrame = {
    val expl = embeddings
      .select(col("vec_id"), posexplode(asDouble(col(vecCol)))
        .as(Seq("dim", "v")))
    val g = round(col("v") * lit(1.0e9))
    val stats = expl.groupBy(col("dim"))
      .agg(
        sum(g.cast(DecimalType(38, 0))).cast("double").as("sg"),
        sum((g * g).cast(DecimalType(38, 0))).cast("double").as("sg2"),
        count(lit(1)).as("n"))
      .select(col("dim"),
        (col("sg") / col("n") / lit(1.0e9)).as("mu"),
        (col("sg2") / (col("n") * lit(1.0e18))).as("ex2"))
      .select(col("dim"), col("mu"),
        (col("ex2") - col("mu") * col("mu")).as("vr"))
    expl.join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim"),
        ((col("v") - col("mu")) / sqrt(col("vr") + lit(eps))).as("zscore"))
  }

  /** Product quantization encode (e5): split each embedding into
    * `subspaces` contiguous sub-vectors, learn a small per-subspace
    * codebook (deterministic seeds → one Lloyd step → grid-exact means,
    * the [[graft.operators.Similarity]] IVF recipe per subspace), and emit
    * each vector's nearest code per subspace with its reconstruction
    * error — the compression that turns a 64-float embedding into
    * `subspaces` bytes for memory-resident ANN at corpus scale.
    *
    * Scale shape: the codebook is HARD-BOUNDED at `maxCodes` codes per
    * subspace (seeds come from the id gate `vec_id % seedMod == 0 AND
    * vec_id < seedMod·maxCodes`, so both the seed frame and its
    * code-numbering window are ≤ maxCodes rows regardless of corpus
    * size) and BROADCAST to both assignment passes; the corpus is touched
    * by narrow projections plus one (subspace-sliced) explode for the
    * Lloyd mean — shuffle rows bounded by codes × dims, never corpus
    * size. Distances are in-order IEEE sums over exact (grid-mean)
    * centroids, so codes and errors are bit-identical to the oracle.
    * Seeds that lose every member keep their position (e1/IVF empty-cell
    * convention). */
  def pqEncode(embeddings: DataFrame, subspaces: Int = 4, subDim: Int = 16,
      seedMod: Int = 61, maxCodes: Int = 256,
      vecCol: String = "embedding"): DataFrame = {
    val sub = pqSubspaces(embeddings, subspaces, subDim, vecCol)
    pqNearest(sub, pqCodebook(sub, seedMod, maxCodes))
      .select(col("vec_id"), col("s").as("subspace"), col("code"),
        col("d2").as("err2"))
  }

  /** Worst PQ-quantized vectors (e19): per vector, the TOTAL squared
    * reconstruction error across subspaces (e5's per-subspace err2 summed
    * on the 1e-9 grid — order-free), top-`k` worst first — the outlier
    * audit an embedding store runs before switching on PQ serving: the
    * head names the vectors quantization actually hurts (cluster
    * boundary cases, out-of-distribution rows) so they can ride a
    * full-precision lane or trigger codebook retraining. One aggregate
    * over the e5 encode + a TakeOrdered head; the rank window runs over
    * the k-row head only (bounded by construction). */
  def pqWorstVectors(embeddings: DataFrame, k: Int = 50,
      subspaces: Int = 4, subDim: Int = 16): DataFrame = {
    val enc = pqEncode(embeddings, subspaces, subDim)
    val tv = enc.groupBy(col("vec_id"))
      .agg((sum(round(col("err2") * lit(1.0e9), 0).cast("long"))
        .cast("double") / lit(1.0e9)).as("distortion"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
      .orderBy(col("distortion").desc, col("vec_id"))
    tv.orderBy(col("distortion").desc, col("vec_id")).limit(k)
      .withColumn("rank", row_number().over(w))
  }

  /** Per-vector subspace slices: (vec_id, s, sx) with sx the s-th
    * `subDim`-wide slice of the embedding. Shared by PQ encode (e5) and
    * the ADC retrieval tier ([[Similarity.pqAdcAnn]]). */
  private[operators] def pqSubspaces(embeddings: DataFrame, subspaces: Int,
      subDim: Int, vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(subspaces - 1)),
          s => slice(asDouble(col(vecCol)), s * subDim + 1, lit(subDim))))
        .as(Seq("s", "sx")))

  /** In-order squared L2 between two subspace slices. */
  private[operators] def pqD2(a: Column, b: Column): Column =
    asum(zip_with(a, b, (p, q) => (p - q) * (p - q)))

  /** One-Lloyd-step PQ codebook per subspace: (s, code, cx). Deterministic
    * seeds, bounded BEFORE the window: the id gate caps the frame at
    * maxCodes rows per subspace, so the code-numbering window never sees
    * more than maxCodes rows in its single partition. Seeds that lose
    * every member keep their position (e1/IVF empty-cell convention). */
  private[operators] def pqCodebook(sub: DataFrame, seedMod: Int = 61,
      maxCodes: Int = 256): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val seeds = sub
      .filter(pmod(col("vec_id"), lit(seedMod)) === 0 &&
        col("vec_id") < lit(seedMod.toLong * maxCodes))
      .withColumn("code",
        row_number().over(W.partitionBy(col("s")).orderBy(col("vec_id"))))
      .select(col("s"), col("code"), col("sx").as("cx"))
    // one Lloyd step: grid-exact member means per (subspace, code, dim)
    val means = pqNearest(sub, seeds)
      .select(col("s"), col("code"), posexplode(col("sx")).as(Seq("i", "v")))
      .groupBy(col("s"), col("code"), col("i"))
      .agg((sum(round(col("v") * lit(1.0e9)).cast(DecimalType(38, 0)))
        .cast("double") / (count(lit(1)) * lit(1.0e9))).as("m"))
      .groupBy(col("s"), col("code"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        e => e.getField("m")).as("mx"))
    seeds.join(means, Seq("s", "code"), "left_outer")
      .select(col("s"), col("code"), coalesce(col("mx"), col("cx")).as("cx"))
  }

  /** Nearest codebook entry per (vec, subspace): broadcast the codebook,
    * exact in-order d2, deterministic (d2, code) tiebreak. */
  private[operators] def pqNearest(sub: DataFrame,
      codebook: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    sub.join(broadcast(codebook), "s")
      .withColumn("d2", pqD2(col("sx"), col("cx")))
      .withColumn("rn", row_number().over(
        W.partitionBy(col("vec_id"), col("s"))
          .orderBy(col("d2"), col("code"))))
      .filter(col("rn") === 1)
  }

  /** Johnson–Lindenstrauss random projection (e4): project every embedding
    * onto `outDims` ±1 hyperplanes — the dimensionality-reduction pass that
    * shrinks ANN index footprint while approximately preserving pairwise
    * distances (Achlioptas-style sign projections). Long-form output
    * (vec_id, out_dim, proj) for representation-stable oracle comparison.
    *
    * The sign matrix is a SEEDED CONSTANT — sign(j,i) from the md5 nibble
    * fold this library uses everywhere (here evaluated once on the driver,
    * k×d ints folded into the plan as a literal lookup table; the oracle
    * re-derives the same signs with SQL md5) — so the whole operator is one
    * narrow projection: no shuffle, no explode×k row blowup, and the
    * aggregate runs inside the row over the grid-quantized components
    * (round(v·1e9) longs; ±1 products summed exactly → bit-identical
    * across engines, e1/e3 precedent). */
  def randomProjection(embeddings: DataFrame, outDims: Int = 16,
      inDims: Int = 64, vecCol: String = "embedding"): DataFrame = {
    val signs: Seq[Seq[Long]] =
      (0 until outDims).map(j => (0 until inDims).map(i => rpSign(j, i)))
    val g = transform(asDouble(col(vecCol)),
      v => round(v * lit(1.0e9)).cast("long"))
    val projections = transform(
      sequence(lit(0), lit(outDims - 1)),
      j => {
        val signRow = element_at(typedlit(signs), (j + 1).cast("int"))
        aggregate(
          zip_with(col("g"), signRow, (x, s) => x * s),
          lit(0L), (acc, x) => acc + x)
      })
    embeddings
      .select(col("vec_id"), g.as("g"))
      .select(col("vec_id"), posexplode(projections).as(Seq("out_dim", "p")))
      .select(col("vec_id"), col("out_dim"),
        (col("p").cast("double") / lit(1.0e9)).as("proj"))
  }

  /** ±1 sign for projection row j, input dim i: parity of the shared
    * 28-bit md5 nibble fold ([[PortableHash.hash28Jvm]] — the one-copy
    * driver form of the arithmetic the oracle mirrors in SQL), evaluated
    * once to build the constant matrix, not per row. */
  private def rpSign(j: Int, i: Int): Long =
    if (PortableHash.hash28Jvm(s"rp:$j:$i") % 2 == 0) 1L else -1L

  /** Johnson–Lindenstrauss distortion audit of [[randomProjection]]
    * (e26): for deterministic consecutive-id pairs (even vec with its
    * successor — the e25 pairing convention), the squared distance in
    * the original 64-d space next to the squared distance between the
    * 16-d projections and their ratio normalized by the expectation
    * (for a ±1 matrix, E‖R(x−y)‖² = m·‖x−y‖², so distortion =
    * d²_proj / (m · d²_orig), 1.0 = perfectly preserved). This is the
    * d42/d35/d41 stance applied to the e-family's lossy step: e4 SHIPS
    * a 4× dimensionality cut; this row says what it does to the
    * distances the downstream ANN/dedup consumers rank by — mean
    * distortion far from 1, or heavy tails, means the m=16 budget needs
    * raising before anyone trusts a projected distance.
    *
    * Parity: coordinates live on the 1e-9 grid (the e4 quantization),
    * squared-diff terms are rounded to the 1e-12 grid and summed as
    * DECIMAL(38,0) (the e15 idiom), and the final ratio divides two
    * grid-exact doubles — bit-identical across engines. Scale shape:
    * one 64-row-per-vector dim explode (e4/e15's regime), pair joins on
    * vec_id+1 (co-partitioned equi-joins), per-pair fold — nothing
    * corpus-quadratic anywhere. */
  def projectionDistortion(embeddings: DataFrame, outDims: Int = 16,
      inDims: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def gridSq(a: Column, b: Column): Column =
      (sum(round((a - b) * (a - b) * lit(1.0e12))
        .cast(DecimalType(38, 0))).cast("double") / lit(1.0e12))
    val xo = embeddings.select(col("vec_id"),
      posexplode(transform(asDouble(col("embedding")),
        v => round(v * lit(1.0e9)).cast("long").cast("double") / lit(1.0e9)))
        .as(Seq("i", "xv")))
    val po = randomProjection(embeddings, outDims, inDims)
    val do2 = xo.as("a").filter(pmod(col("a.vec_id"), lit(2)) === 0)
      .join(xo.as("b"),
        col("b.vec_id") === col("a.vec_id") + 1 && col("a.i") === col("b.i"))
      .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .agg(gridSq(col("a.xv"), col("b.xv")).as("d2_orig"))
    val dp2 = po.as("a").filter(pmod(col("a.vec_id"), lit(2)) === 0)
      .join(po.as("b"),
        col("b.vec_id") === col("a.vec_id") + 1 &&
          col("a.out_dim") === col("b.out_dim"))
      .groupBy(col("a.vec_id").as("vec_a"))
      .agg(gridSq(col("a.proj"), col("b.proj")).as("d2_proj"))
    do2.join(dp2, "vec_a")
      .select(col("vec_a"), col("vec_b"), col("d2_orig"), col("d2_proj"),
        when(col("d2_orig") > 0,
          col("d2_proj") / (lit(outDims.toDouble) * col("d2_orig")))
          .as("distortion"))
  }

  /** Sign bits of dims [lo, lo+32) packed into one long: bit (i-lo) is set
    * iff x[i] ≥ 0. Two words cover a 64-dim embedding; built from
    * filter/aggregate HOFs so it stays inside codegen like everything else
    * here. Shared by [[binaryQuantize]] and the Hamming ANN tier
    * ([[Similarity.hammingAnn]]). */
  def signWord(x: Column, lo: Int): Column =
    aggregate(
      filter(sequence(lit(lo), lit(lo + 31)),
        i => element_at(x, i + 1) >= 0),
      lit(0L),
      (acc, i) => acc.bitwiseOR(call_function("shiftleft", lit(1L), i - lo)))

  /** Binary (sign-bit) quantization (e7): each embedding becomes two packed
    * 32-bit sign words plus the positive-dim count — 8 bytes per vector,
    * the 64× compression behind Hamming-distance retrieval tiers
    * (binarized embeddings rank candidates with xor+popcount before an
    * exact re-rank; see [[Similarity.hammingAnn]]).
    *
    * Pure per-row projection: no shuffle, no UDF, bit-exact across engines
    * (sign tests and integer ors only). At 100 TB the packed words are the
    * stored ANN index column; the float vectors are only read by the
    * re-rank gather. */
  def binaryQuantize(embeddings: DataFrame,
      vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col("vec_id"), asDouble(col(vecCol)).as("x"))
      .select(col("vec_id"),
        signWord(col("x"), 0).as("w0"),
        signWord(col("x"), 32).as("w1"),
        size(filter(col("x"), v => v >= 0)).cast("long").as("n_pos"))

  /** Corpus Gram matrix (e8): G[i][j] = Σ over vectors of xᵢ·xⱼ, the 64×64
    * second-moment matrix that whitening, PCA, and OPQ rotation all start
    * from. One pass, NO explode and no per-row product array: each input
    * row is just its 64 doubles, and [[graft.functions.GramSum]] folds the
    * upper-triangle outer product onto a 1e-9 integer grid inside its
    * `reduce` loop — map-side partial aggregation, so the shuffle carries
    * one 2081-long array per partition (the treeAggregate shape). The grid
    * makes the sum order-independent and bit-identical to the DuckDB twin
    * (integer adds commute; same `round` tie rule both engines).
    *
    * 100 TB shape: cost is a single scan + a 16 KB-per-partition reduce; the
    * result is O(dim²) rows regardless of corpus size. Grid headroom: with
    * |xᵢxⱼ|·1e9 ≤ ~1e9 per row, the int64 accumulator holds ~9e9 rows per
    * cell before overflow — beyond that, shard by vec_id range and sum the
    * (tiny) per-shard matrices. */
  /** Effective dimensionality via the participation ratio (e21):
    * PR = (Σλ)²/Σλ² over the second-moment spectrum — computed WITHOUT an
    * eigendecomposition, because tr(C) is the Gram diagonal and
    * tr(C²) = Σᵢⱼ Cᵢⱼ² for symmetric C, both plain folds over
    * [[gramMatrix]]'s 2080 upper-triangle cells (off-diagonals counted
    * twice). PR ranges from 1 (rank-1 collapse: every embedding on one
    * line) to dim (isotropic), and is the "how many dimensions actually
    * carry signal" readout next to [[anisotropy]]'s cone-width gauge and
    * [[dimStats]]'s per-dim table — the capacity check run before
    * matryoshka truncation (e6) or PQ subspace sizing (e5) decide how
    * much to keep.
    *
    * Parity: gram cells are already 1e-9-grid values; the trace and the
    * squared-cell total re-enter the grid before summation (decimal,
    * order-independent), and the final ratio is one IEEE division.
    * Constant-group: empty corpus → zero rows. */
  def participationRatio(embeddings: DataFrame,
      vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    val diag = col("i") === col("j")
    val tr = sum(when(diag, round(col("gram") * lit(1.0e9))
        .cast(DecimalType(38, 0)))
      .otherwise(lit(0).cast(DecimalType(38, 0))))
    val trSq = sum(round(((col("gram") * col("gram")) *
        when(diag, lit(1.0)).otherwise(lit(2.0))) * lit(1.0e9))
      .cast(DecimalType(38, 0)))
    gramMatrix(embeddings, vecCol, dim)
      .groupBy(lit(true).as("all"))
      .agg(max(col("n")).as("n_vectors"),
        (tr.cast("double") / lit(1.0e9)).as("trace"),
        (trSq.cast("double") / lit(1.0e9)).as("trace_sq"))
      .select(col("n_vectors"), col("trace"), col("trace_sq"),
        when(col("trace_sq") > 0,
          (col("trace") * col("trace")) / col("trace_sq"))
          .otherwise(0.0).as("participation_ratio"))
  }

  /** Corpus anisotropy gauge (e20): the mean cosine between all ordered
    * pairs of DISTINCT vectors, computed in closed form — for unit
    * vectors, mean_{i≠j} cos(v̂ᵢ, v̂ⱼ) = (‖Σᵢ v̂ᵢ‖² − n) / (n·(n−1)) —
    * so the all-pairs quantity costs ONE per-dim aggregate, never a
    * pairwise join. High anisotropy (Ethayarajh 2019) means the corpus
    * embeddings crowd a narrow cone: cosine thresholds stop
    * discriminating and dedup/ANN recall quietly degrades — this is the
    * one-row health check read before trusting e.g. the d5/c14 cosine
    * cutoffs, and the "did it help" gauge after e10's common-direction
    * removal.
    *
    * Parity contract: per-vector normalization is an in-order fold +
    * sqrt + divide (IEEE-identical); the per-dim sums of unit
    * coordinates and the final Σ S_d² both accumulate on the 1e-9
    * decimal grid (order-independent, the e16/g1 pattern); the closing
    * subtraction/division is plain IEEE. Zero vectors are excluded (no
    * direction to compare). Constant-group aggregate: empty input →
    * zero rows. */
  def anisotropy(embeddings: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val x = asDouble(col(vecCol))
    val perDim = embeddings
      .withColumn("nrm", sqrt(norm2(x)))
      .filter(col("nrm") > 0.0)
      .select(col("nrm"), posexplode(x).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round((col("v") / col("nrm")) * lit(1.0e9))
          .cast(DecimalType(38, 0))).as("s"))
    val sd = col("s").cast("double") / lit(1.0e9)
    val nD = col("n_vectors").cast("double")
    perDim
      .groupBy(lit(true).as("all"))
      .agg(max(col("n")).as("n_vectors"),
        sum(round(sd * sd * lit(1.0e9)).cast(DecimalType(38, 0)))
          .as("ss"))
      .select(col("n_vectors"),
        (col("ss").cast("double") / lit(1.0e9)).as("sum_sq"),
        when(col("n_vectors") >= 2,
          ((col("ss").cast("double") / lit(1.0e9)) - nD) /
            (nD * (col("n_vectors") - 1).cast("double")))
          .otherwise(0.0).as("anisotropy"))
  }

  /** Per-dimension embedding health stats (e16): mean and variance of
    * every coordinate over the corpus — the diagnostic that catches DEAD
    * dimensions (a projection bug or a collapsed encoder head shows as
    * near-zero variance) and mis-centered dims before they poison cosine
    * geometry. Var = E[x²] − E[x]² with both expectations built from
    * exact 1e-9-grid integer sums (the [[gramMatrix]]/g1 parity pattern),
    * so the result is partition-order-independent and engine-exact; the
    * two final divisions and one subtraction are plain IEEE. One
    * posexplode + one (dim)-keyed aggregate — map-side combined, 64
    * output rows at any corpus size. */
  def dimStats(embeddings: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val g = embeddings
      .select(posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("v") * lit(1.0e9))
          .cast(DecimalType(38, 0))).as("s"),
        sum(round(col("v") * col("v") * lit(1.0e9))
          .cast(DecimalType(38, 0))).as("s2"))
    val mean = (col("s").cast("double") / lit(1.0e9)) / col("n")
    g.select(col("dim"), col("n"), mean.as("mean"),
      ((col("s2").cast("double") / lit(1.0e9)) / col("n") - mean * mean)
        .as("variance"))
  }

  /** Per-dimension standardization (e18): z = (x − μ_d)/√(σ²_d + ε) for
    * every (vector, dimension) — the whitening preprocessing an embedding
    * pipeline applies before cosine/ANN when dimensions carry wildly
    * different scales (a hot dimension otherwise dominates every
    * distance; the all-but-the-top literature's first step). μ/σ² come
    * from [[dimStats]]'s grid-exact accumulation, so the z-scores are
    * bit-identical across engines/partitionings; the per-element
    * arithmetic is one broadcast join of the 64-row stats table into the
    * corpus explode — corpus-linear, no shuffle beyond the scan. */
  def standardize(embeddings: DataFrame, eps: Double = 1e-9,
      vecCol: String = "embedding"): DataFrame = {
    val stats = dimStats(embeddings, vecCol)
      .select(col("dim"), col("mean"), col("variance"))
    embeddings
      .select(col("vec_id"), posexplode(asDouble(col(vecCol)))
        .as(Seq("dim", "v")))
      .join(broadcast(stats), Seq("dim"))
      .select(col("vec_id"), col("dim"),
        ((col("v") - col("mean")) /
          sqrt(col("variance") + lit(eps))).as("z"))
  }

  def gramMatrix(embeddings: DataFrame, vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    val summed = embeddings.select(asDouble(col(vecCol))).as[Array[Double]]
      .select(graft.functions.GramSum(dim).toColumn.name("g"))
    val idx = (for { i <- 0 until dim; j <- i until dim } yield (i, j))
      .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
    summed.toDF("g")
      .select(element_at(col("g"), tri + 1).as("n"),
        posexplode(slice(col("g"), 1, tri)).as(Seq("k", "gsum")))
      // empty-corpus parity: the global typed agg still returns its zero
      // buffer, but the oracle's CROSS JOIN + GROUP BY yields no rows
      .filter(col("n") > 0)
      .join(broadcast(idx.toDF("k", "i", "j")), "k")
      .select(col("i"), col("j"),
        (col("gsum").cast("double") / lit(1.0e9)).as("gram"), col("n"))
  }

  /** Top principal direction (e9): power iteration on the [[gramMatrix]]
    * output — the dominant eigenvector of the corpus second-moment matrix,
    * i.e. the direction PCA/whitening removes first and the axis embedding
    * stores use for split planes. The distributed work is exactly e8's one
    * scan; the iteration itself runs on the DRIVER over the collected
    * 64×64 matrix (bounded at dim² cells regardless of corpus size — the
    * same driver-side-math license as the k-means seed table).
    *
    * Determinism across engines: every matvec term and every squared-norm
    * term is snapped to the 1e-9 grid before summation (integer adds
    * commute), and the remaining double ops (divide by 1e9, sqrt,
    * normalize) are identical IEEE expressions on both sides — so after 8
    * iterations the loadings are bit-identical to the DuckDB recursive-CTE
    * twin. Output: (dim, loading, eigenvalue) with eigenvalue = ‖G·v‖ of
    * the final unit iterate. */
  def pc1PowerIteration(embeddings: DataFrame, iters: Int = 8,
      dim: Int = 64, vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val G = Array.ofDim[Double](dim, dim)
    val cells = gramMatrix(embeddings, vecCol, dim).collect()
    require(cells.nonEmpty,
      "pc1PowerIteration: empty corpus — no Gram matrix to iterate on")
    cells.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val gv = r.getDouble(2)
      G(i)(j) = gv; G(j)(i) = gv
    }
    val (v, lambda) = powerIterate(G, iters, dim)
    v.zipWithIndex.map { case (l, d) => (d, l, lambda) }.toSeq
      .toDF("dim", "loading", "eigenvalue")
  }

  /** The grid-stabilized power-iteration loop shared by
    * [[pc1PowerIteration]] (e9) and [[top2PowerIteration]] (e13): every
    * mat-vec product and norm accumulates on the 1e-9 grid
    * ([[graft.functions.GramSum.grid]] = round-half-away-from-zero, the
    * oracle's `round()`), so the trajectory is bit-identical to the
    * recursive-CTE twin. Returns (unit eigenvector, eigenvalue). */
  private def powerIterate(G: Array[Array[Double]], iters: Int,
      dim: Int): (Array[Double], Double) = {
    var v = Array.fill(dim)(1.0 / dim)
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0L
        var j = 0
        while (j < dim) {
          acc += graft.functions.GramSum.grid(G(i)(j) * v(j) * 1.0e9)
          j += 1
        }
        w(i) = acc.toDouble / 1.0e9
        i += 1
      }
      var nacc = 0L
      var k = 0
      while (k < dim) {
        nacc += graft.functions.GramSum.grid(w(k) * w(k) * 1.0e9)
        k += 1
      }
      lambda = math.sqrt(nacc.toDouble / 1.0e9)
      v = w.map(_ / lambda)
      it += 1
    }
    (v, lambda)
  }

  /** Top TWO principal directions (e13): PC1 by power iteration, then
    * Hotelling deflation ON THE GRAM MATRIX — G′ = G − λ₁·v₁v₁ᵀ, every
    * cell re-quantized to the 1e-9 grid — then power iteration again for
    * PC2. The two-direction subspace is what embedding-QA actually plots
    * (a 1-D projection hides cluster structure the second axis shows),
    * and deflation on the collected dim² matrix costs nothing at any
    * corpus scale: the distributed work remains the single [[gramMatrix]]
    * pass e9 already pays. Long-form output (component, dim, loading,
    * eigenvalue); the oracle runs the identical recursion twice with the
    * same grid deflation between.
    *
    * Default is 24 iterations (vs e9's 8): deflation quality is bounded
    * by PC1's convergence, and power iteration separates at (λ₂/λ₁)^iters
    * — on a near-degenerate spectrum (isotropic embeddings) the two
    * outputs still span the top-2 subspace exactly, but their individual
    * eigenvalue ordering can stay soft; the spec pins the well-separated
    * planted case. */
  def top2PowerIteration(embeddings: DataFrame, iters: Int = 24,
      dim: Int = 64, vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val G = Array.ofDim[Double](dim, dim)
    val cells = gramMatrix(embeddings, vecCol, dim).collect()
    require(cells.nonEmpty,
      "top2PowerIteration: empty corpus — no Gram matrix to iterate on")
    cells.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val gv = r.getDouble(2)
      G(i)(j) = gv; G(j)(i) = gv
    }
    val (v1, l1) = powerIterate(G, iters, dim)
    val G2 = Array.tabulate(dim, dim) { (i, j) =>
      (graft.functions.GramSum.grid(G(i)(j) * 1.0e9) -
        graft.functions.GramSum.grid(l1 * v1(i) * v1(j) * 1.0e9))
        .toDouble / 1.0e9
    }
    val (v2, l2) = powerIterate(G2, iters, dim)
    val rows =
      v1.zipWithIndex.map { case (l, d) => (1, d, l, l1) } ++
      v2.zipWithIndex.map { case (l, d) => (2, d, l, l2) }
    rows.toSeq.toDF("component", "dim", "loading", "eigenvalue")
  }

  /** Spectral gap of the embedding covariance (e22): λ₁/λ₂ of the top
    * two grid-stabilized eigenvalues from [[top2PowerIteration]], plus
    * λ₁'s share of the top-2 mass — the one-number "how 1-dimensional
    * are these embeddings" gauge read next to e20's anisotropy and
    * e21's participation ratio: a large gap means one rogue direction
    * dominates (e10's removal will help retrieval), a gap near 1 means
    * the top of the spectrum is soft and e17's 2-D map axes are
    * unstable. A pure fold over e13's output — two 1-row aggregates and
    * one broadcast cross join; both divisions are IEEE doubles in the
    * identical shape on both engines. */
  def spectralGap(embeddings: DataFrame): DataFrame = {
    val t = top2PowerIteration(embeddings)
    def lam(c: Int, as: String) = t.filter(col("component") === c)
      .groupBy(lit(true).as("all"))
      .agg(max(col("eigenvalue")).as(as)).drop("all")
    lam(1, "lambda1").crossJoin(broadcast(lam(2, "lambda2")))
      .select(col("lambda1"), col("lambda2"),
        (col("lambda1") / col("lambda2")).as("spectral_gap"),
        (col("lambda1") / (col("lambda1") + col("lambda2")))
          .as("top2_share"))
  }

  /** Principal-component projection (e17): every embedding's coordinates
    * on the top-2 grid-stabilized principal directions from
    * [[top2PowerIteration]] — the 2-D embedding map a corpus QA review
    * plots (cluster structure, outlier shelves, source separation), and
    * the cheap stratification key for embedding-aware sampling. The two
    * loadings collapse to 64-double literals folded into the plan, so
    * the projection is a pure per-row in-order dot — no shuffle, scan
    * speed at any corpus size (the e10 shape, twice). */
  def pcProject(embeddings: DataFrame, iters: Int = 24, dim: Int = 64,
      vecCol: String = "embedding"): DataFrame = {
    val comps = top2PowerIteration(embeddings, iters, dim, vecCol)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val v1 = typedlit((0 until dim).map(d => comps((1, d))))
    val v2 = typedlit((0 until dim).map(d => comps((2, d))))
    embeddings
      .select(col("vec_id"), asDouble(col(vecCol)).as("x"))
      .select(col("vec_id"),
        dot(col("x"), v1).as("pc1_score"),
        dot(col("x"), v2).as("pc2_score"))
  }

  /** All-but-the-top postprocessing (e10): subtract each embedding's
    * projection onto the dominant direction — x′ = x − (v·x)·v with v from
    * [[pc1PowerIteration]] — the Mu & Viswanath ("All-but-the-Top", 2018)
    * correction that removes the common-direction bias dominating cosine
    * scores in anisotropic embedding spaces. v collapses to a 64-double
    * literal folded into the plan, so the correction is a pure per-row
    * projection: no shuffle, no join, input-scan speed at any corpus size.
    * Long-form output (vec_id, dim, wval) like e3/e6 so every compared
    * cell is a scalar double; proj is the in-order dot the oracle mirrors. */
  def removeTopComponent(embeddings: DataFrame, iters: Int = 8,
      dim: Int = 64, vecCol: String = "embedding"): DataFrame = {
    val pc = pc1PowerIteration(embeddings, iters, dim, vecCol)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val vLit = typedlit((0 until dim).map(pc))
    embeddings
      .select(col("vec_id"), asDouble(col(vecCol)).as("x"))
      .withColumn("proj", dot(col("x"), vLit))
      .select(col("vec_id"),
        posexplode(zip_with(col("x"), vLit,
          (xi, vi) => xi - col("proj") * vi)).as(Seq("dim", "wval")))
  }

  /** Symmetric int8 quantization with round-trip error stats (e2): the
    * compression pass an embedding store runs before ANN serving — scale =
    * max|x|/127 per vector, q_i = ⌊x_i·(127/max|x|) + 0.5⌋ (away-from-zero
    * at .5 for positives; FIXED tie behavior because floor is exact — a
    * library `round()` would HALF_UP in one engine and HALF_EVEN in the
    * other), errors from the dequantized values.
    *
    * Pure per-row array math — no shuffle — and every op (division, fused
    * multiply-free products, floor, in-order aggregate sum) is IEEE-exact
    * and order-fixed, so values are bit-identical across engines.
    * Zero vectors pass through with scale 0 and zero error. */
  def int8Quantize(embeddings: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val x = col("x")
    val maxAbs = array_max(transform(x, abs(_)))
    val prepared = embeddings
      .select(col("vec_id"), asDouble(col(vecCol)).as("x"))
      .transform(Partitioning.spread(_, col("vec_id")))
      // maxabs materialized once: every q/err reference below would
      // otherwise re-scan the array per use (no cross-op CSE)
      .select(col("vec_id"), x, maxAbs.as("maxabs"))
    val up = lit(127.0) / col("maxabs")
    val down = col("maxabs") / lit(127.0)
    val q = when(col("maxabs") === 0.0,
      transform(x, _ => lit(0.0)))
      .otherwise(transform(x, v => floor(v * up + 0.5)))
    val err = zip_with(x, col("q"), (v, qi) => abs(v - qi * down))
    prepared
      .select(col("vec_id"), x, col("maxabs"), q.as("q"))
      .select(
        col("vec_id"),
        (col("maxabs") / 127.0).as("scale"),
        array_min(col("q")).cast("long").as("q_min"),
        array_max(col("q")).cast("long").as("q_max"),
        asum(zip_with(x, col("q"),
          (v, qi) => (v - qi * down) * (v - qi * down))).as("l2_err_sq"),
        array_max(err).as("max_abs_err"))
  }

  /** One Lloyd k-means iteration (e11): assign every vector to its nearest
    * seed centroid by cosine (argmax with deterministic cent_id tiebreak),
    * then recompute each centroid as the grid-exact mean of its members —
    * the auditable building block under [[Similarity.annIvf]]'s coarse
    * quantizer and [[pqEncode]]'s codebooks (those iterate this step on a
    * sample; this surfaces ONE step, full-corpus, as a checkable query).
    *
    * Scale shape: seeds broadcast (k·dim doubles — tiny), so assignment is
    * a map-side join scored in one pass with the index-order dot product;
    * argmax goes through the heap top-k operator (k=1), never a global
    * sort; the mean update is e1's recipe — components quantized to the
    * 1e-9 grid, accumulated as DECIMAL(38,0) (order-independent,
    * overflow-free), divided back in double. Long-form (cent_id, dim)
    * output keeps every cell scalar for the oracle. */
  /** Centroid-outlier mining (e12): for each label, the k member vectors
    * FARTHEST (lowest cosine) from their own label centroid — the
    * embedding-QA sweep that surfaces mislabeled rows, collapsed
    * embeddings, and encoder regressions before they poison contrastive
    * training or ANN recall.
    *
    * Centroids are [[groupCentroids]]' grid-exact per-dim means
    * re-assembled into arrays (sort-by-dim collect, the
    * [[Similarity]] kmeans recipe), broadcast back over the corpus — one
    * narrow pass, no shuffle of the vectors; the bottom-k runs on the heap
    * top-k operator ascending, never a per-label sort. Cosines are
    * index-order dots of grid-exact components — engine-exact. */
  def centroidOutliers(embeddings: DataFrame, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val v = embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(norm2(col("x"))))
    val cent = groupCentroids(embeddings)
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("centroid"))))
        .as("pm"))
      .select(col("label"),
        transform(col("pm"), p => p.getField("centroid")).as("cx"))
      .withColumn("cnrm", sqrt(norm2(col("cx"))))
    val scored = v.join(broadcast(cent), "label")
      .select(col("label"), col("vec_id"),
        (graft.functions.GraftFunctions.dot(col("x"), col("cx")) /
          (col("nrm") * col("cnrm"))).as("cos_centroid"))
    val bottom = graft.plans.TopK.perKey(scored, Seq(col("label")),
      Seq(col("cos_centroid").asc, col("vec_id")), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"))
      .orderBy(col("cos_centroid").asc, col("vec_id"))
    bottom.withColumn("outlier_rank", row_number().over(w))
  }

  /** Per-label cluster-quality report (e14): a simplified silhouette at
    * cluster granularity — every vector's cosine to its OWN label centroid
    * (cohesion) and its best cosine to any OTHER label centroid
    * (separation), aggregated per label with grid-exact decimal means;
    * `margin` = cohesion − separation is the one number a curation
    * reviewer reads per cluster (negative margin → the label's members sit
    * closer to a different centroid than their own).
    *
    * Scale: centroids are labels·dims driver-free aggregates
    * ([[groupCentroids]]); the label-count-sized centroid table broadcasts
    * and each vector scores against all of them in one map-side pass
    * (labels ≪ vectors), then ONE per-label aggregation — no shuffle
    * beyond the two aggregations, no per-vector state. */
  def clusterQuality(embeddings: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val v = embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(norm2(col("x"))))
    val cent = groupCentroids(embeddings)
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("centroid"))))
        .as("pm"))
      .select(col("label").as("clabel"),
        transform(col("pm"), p => p.getField("centroid")).as("cx"))
      .withColumn("cnrm", sqrt(norm2(col("cx"))))
    val scored = v.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("clabel"),
        (graft.functions.GraftFunctions.dot(col("x"), col("cx")) /
          (col("nrm") * col("cnrm"))).as("ccos"))
    val perVec = scored.groupBy(col("vec_id"), col("label"))
      .agg(
        max(when(col("label") === col("clabel"), col("ccos"))).as("cos_own"),
        max(when(col("label") =!= col("clabel"), col("ccos"))).as("cos_other"))
    def gridMean(c: Column): Column =
      sum(round(c * lit(1.0e9)).cast(DecimalType(38, 0))).cast("double") /
        (count(lit(1)) * lit(1.0e9))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        gridMean(col("cos_own")).as("mean_cos_own"),
        gridMean(col("cos_other")).as("mean_cos_other"))
      .withColumn("margin", col("mean_cos_own") - col("mean_cos_other"))
  }

  def kmeansStep(embeddings: DataFrame, seedEvery: Int = 199): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val v = embeddings.transform(Partitioning.spread(_, col("vec_id")))
      .select(col("vec_id"), asDouble(col("embedding")).as("x"))
      .withColumn("nrm", sqrt(norm2(col("x"))))
    Caching.withPersisted(v) {
      val cents = v.filter(col("vec_id") % seedEvery === 0)
        .select(col("vec_id").as("cent_id"), col("x").as("cx"),
          col("nrm").as("cnrm"))
      val scored = v.join(broadcast(cents))
        .select(col("vec_id"), col("cent_id"),
          (graft.functions.GraftFunctions.dot(col("x"), col("cx")) /
            (col("nrm") * col("cnrm"))).as("ccos"))
      val asg = graft.plans.TopK.perKey(scored, Seq(col("vec_id")),
          Seq(col("ccos").desc, col("cent_id")), 1)
        .select(col("vec_id"), col("cent_id"))
      v.join(asg, "vec_id")
        .select(col("cent_id"), posexplode(col("x")).as(Seq("dim", "v")))
        .groupBy(col("cent_id"), col("dim"))
        .agg(
          (sum(round(col("v") * lit(1.0e9)).cast(DecimalType(38, 0)))
            .cast("double") / (count(col("v")) * lit(1.0e9)))
            .as("centroid"),
          count(col("v")).as("n_vecs"))
    }
  }

  /** Embedding centroid drift between snapshots (e15): per label, the
    * cosine between the ACCEPTED corpus's centroid and the INCOMING
    * snapshot's — the embedding-space member of the drift-gate family
    * ([[graft.operators.Curation.qualityDrift]] watches score
    * distributions, `LlmText.sourceDivergence` vocabulary; this watches
    * where the vectors themselves moved, the signal that fires when an
    * upstream embedding model silently changes version). A label whose
    * centroids' cosine falls under `cosBar` flags.
    *
    * Parity shape: both centroid tables come from the grid-exact
    * [[groupCentroids]]; the dot/norm reductions over the 64 dims
    * re-quantize each product on a 1e-12 grid and sum as DECIMAL —
    * order-independent, so the flag is bit-stable. Everything after the
    * two centroid aggregates is label-count-sized. */
  def centroidDrift(accepted: DataFrame, incoming: DataFrame,
      cosBar: Double = 0.95): DataFrame = {
    def gsum(c: Column): Column =
      sum(round(c * lit(1.0e12)).cast(DecimalType(38, 0)))
        .cast("double") / lit(1.0e12)
    val a = groupCentroids(accepted)
      .select(col("label"), col("dim"), col("centroid").as("ca"),
        col("n_vecs").as("n_accepted"))
    val b = groupCentroids(incoming)
      .select(col("label"), col("dim"), col("centroid").as("cb"),
        col("n_vecs").as("n_incoming"))
    a.join(b, Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(max(col("n_accepted")).as("n_accepted"),
        max(col("n_incoming")).as("n_incoming"),
        gsum(col("ca") * col("cb")).as("dot"),
        gsum(col("ca") * col("ca")).as("na2"),
        gsum(col("cb") * col("cb")).as("nb2"))
      .select(col("label"), col("n_accepted"), col("n_incoming"),
        (col("dot") / (sqrt(col("na2")) * sqrt(col("nb2"))))
          .as("cos_drift"))
      .withColumn("drifted", col("cos_drift") < cosBar)
  }

  /** Alignment/uniformity QC (e25) — Wang & Isola (ICML 2020)'s two
    * contrastive-embedding health numbers, per label, over a
    * DETERMINISTIC linear pair sample: each vector pairs with the next
    * vec_id of its own label. Alignment = mean pairwise cosine (how
    * tight same-label points sit — want high); uniformity =
    * ln(mean e^(−2·d²)) over the same pairs with d² taken on the
    * normalized sphere (how spread the label's region is — want LOW,
    * i.e. more negative; a label whose alignment AND uniformity are
    * both ≈ 1/0 has collapsed to a point, the failure mode this gauge
    * exists to catch). On unit vectors d² = 2 − 2cos, so the pair term
    * is e^(4cos−4) — one cosine serves both numbers.
    *
    * Parity: cosine is the fixed-shape index-order fold; alignment
    * accumulates on the 1e-9 grid as DECIMAL(38,0); the one libm exp
    * snaps to the 5-decimal grid per pair and sums as DECIMAL(18,6)
    * (exact), with the final ln snapped the same way (x21 precedent).
    *
    * Scale shape: consecutive-id pairing is one window per label (the
    * per-label sort any per-group QC pays) yielding exactly n−1 pairs
    * per label — linear, never the quadratic all-pairs expectation the
    * paper defines (a uniform-random pair sample has the same mean in
    * expectation; this one is replayable). Output is |labels| rows. */
  def alignmentUniformity(embeddings: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val v = embeddings
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("x"))
    val paired = v
      .select(col("label"), col("x"),
        lead(col("x"), 1).over(
          W.partitionBy(col("label")).orderBy(col("vec_id"))).as("y"))
      .filter(col("y").isNotNull)
    val cs = cosine(col("x"), col("y"))
    paired
      .select(col("label"),
        round(cs * lit(1.0e9)).cast(DecimalType(38, 0)).as("g"),
        round(exp(lit(4.0) * cs - lit(4.0)), 5)
          .cast(DecimalType(18, 6)).as("u"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("g")).as("gs"), sum(col("u")).as("us"))
      .select(col("label"), col("n_pairs"),
        (col("gs").cast("double") / lit(1.0e9) / col("n_pairs"))
          .as("alignment"),
        round(log(col("us").cast("double") / col("n_pairs")), 5)
          .cast(DecimalType(18, 6)).cast("double").as("uniformity"))
  }
}
