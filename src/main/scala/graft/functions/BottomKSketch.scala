package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k sketch: the k smallest distinct values of a long hash column,
  * as a typed `Aggregator` — SURVEY §7.3's "Aggregator[IN,BUF,OUT] for
  * sketches" slot. r15: input moved from hex STRINGS to the 60-bit digest
  * folds the whole sketch family keys on — numeric order over the fold
  * equals lexicographic order over the hex it encodes, and the per-value
  * buffer entry drops from a 32-char string to 8 bytes.
  *
  * A bottom-k sketch over a uniform hash is a mergeable uniform sample of a
  * set: |A ∩ B| / |A ∪ B| is estimated by comparing sketches, which is how
  * corpus-level near-dup rates are estimated without pairwise work. The
  * buffer is O(k), reduce/merge are commutative+associative (set-merge,
  * keep k smallest), so Spark runs it as a partial aggregation — map-side
  * combine does most of the work and the shuffle carries only k values per
  * group. Inputs are non-null by contract (hash expressions over non-null
  * columns).
  *
  * Output is the sorted values joined with '|' — deterministic, so the
  * DuckDB oracle reproduces it with row_number/string_agg.
  */
case class BottomKSketch(k: Int) extends Aggregator[Long, Seq[Long], String] {

  private def insert(b: Seq[Long], a: Long): Seq[Long] =
    if (b.contains(a)) b
    else ((a +: b).sorted: Seq[Long]).take(k)

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    b2.foldLeft(b1)(insert)

  override def finish(b: Seq[Long]): String = b.sorted.mkString("|")

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
