package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Gram-matrix accumulator: folds each `dim`-long double vector's
  * upper-triangle outer product onto a 1e-9 integer grid, entirely inside
  * `reduce` — no per-row product array is ever materialized or serialized,
  * so the only encoder work per row is the 64-double input.
  *
  * The buffer is `dim·(dim+1)/2 + 1` longs (slot `tri` counts rows); reduce
  * and merge are commutative integer adds, so Spark runs the whole thing as
  * a partial aggregation and the shuffle carries ONE array per partition —
  * the treeAggregate shape with no explode amplification.
  *
  * [[grid]] reproduces exactly the HALF_UP-away-from-zero rounding that both
  * Spark's `round` and DuckDB's `round` apply to doubles (tie away from
  * zero; fractional comparison against 0.5 is order-equivalent to the
  * decimal-string rounding BigDecimal does), so grid sums are bit-identical
  * to the oracle without a BigDecimal allocation per product.
  */
case class GramSum(dim: Int)
    extends Aggregator[Array[Double], Array[Long], Array[Long]] {

  private val tri = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](tri + 1)

  override def reduce(b: Array[Long], x: Array[Double]): Array[Long] = {
    // every row counts toward n (the oracle's COUNT(*)); rows whose vector
    // is null/short contribute nothing to the sums, exactly like the
    // oracle's SUM skipping NULL products
    if (x != null && x.length >= dim) {
      var k = 0
      var i = 0
      while (i < dim) {
        val xi = x(i)
        var j = i
        while (j < dim) {
          b(k) += GramSum.grid(xi * x(j) * 1.0e9)
          k += 1
          j += 1
        }
        i += 1
      }
    }
    b(tri) += 1L
    b
  }

  override def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= tri) { a(i) += c(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object GramSum {
  /** round-half-away-from-zero to an integer, matching DuckDB `round(v)`
    * (and BigDecimal HALF_UP — equivalent on every double: shortest-decimal
    * round-tripping preserves ordering against .5, and binary ties are
    * decimal ties) without a BigDecimal allocation per call.
    *
    * The fraction is taken on |v|: `a - floor(a)` is EXACT for a ≥ 0
    * (trivially below 1, Sterbenz above), whereas `v - floor(v)` for
    * negative v crosses zero and can double-round a near-tie fraction onto
    * exactly 0.5 — the case GramSumSpec pins. */
  def grid(v: Double): Long = {
    val neg = v < 0
    val a = math.abs(v)
    val f = math.floor(a)
    val r = a - f
    val mag = (if (r >= 0.5) f + 1 else f).toLong
    if (neg) -mag else mag
  }
}
