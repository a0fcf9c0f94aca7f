package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of fixed-length `array<bigint>` rows, plus a trailing
  * row count — the mergeable accumulator behind one-pass moment matrices
  * ([[graft.operators.VectorOps.gramMatrix]]).
  *
  * The buffer is a single `len + 1` long array (slot `len` counts rows), so
  * Spark runs the whole thing as a partial aggregation: each task folds its
  * rows locally and the shuffle carries ONE array per partition — the
  * treeAggregate shape, with no explode amplification anywhere. reduce and
  * merge mutate the deserialized buffer in place (integer adds, overflow-safe
  * for grid-scaled inputs by construction at the call site).
  *
  * Rows that are null or of the wrong length are skipped rather than
  * corrupting the accumulator.
  */
case class LongVecSum(len: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](len + 1)

  override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
    if (a != null && a.length == len) {
      var i = 0
      while (i < len) { b(i) += a(i); i += 1 }
      b(len) += 1L
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= len) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
