package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
}
