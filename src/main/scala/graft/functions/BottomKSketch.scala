package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k sketch: the k smallest distinct values of a string column
  * (hash values in practice), as a typed `Aggregator` — SURVEY §7.3's
  * "Aggregator[IN,BUF,OUT] for sketches" slot.
  *
  * A bottom-k sketch over a uniform hash is a mergeable uniform sample of a
  * set: |A ∩ B| / |A ∪ B| is estimated by comparing sketches, which is how
  * corpus-level near-dup rates are estimated without pairwise work. The
  * buffer is O(k), reduce/merge are commutative+associative (set-merge,
  * keep k smallest), so Spark runs it as a partial aggregation — map-side
  * combine does most of the work and the shuffle carries only k values per
  * group.
  *
  * Output is the sorted values joined with '|' — deterministic, so the
  * DuckDB oracle reproduces it with row_number/string_agg.
  */
case class BottomKSketch(k: Int) extends Aggregator[String, Seq[String], String] {

  private def insert(b: Seq[String], a: String): Seq[String] =
    if (a == null || b.contains(a)) b
    else ((a +: b).sorted: Seq[String]).take(k)

  override def zero: Seq[String] = Vector.empty

  override def reduce(b: Seq[String], a: String): Seq[String] = insert(b, a)

  override def merge(b1: Seq[String], b2: Seq[String]): Seq[String] =
    b2.foldLeft(b1)(insert)

  override def finish(b: Seq[String]): String = b.sorted.mkString("|")

  override def bufferEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
