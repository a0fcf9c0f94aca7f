package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}

/** dup_ngram_fracs(words): the Gopher-style duplicate fractions of a word
  * array at n = 1, 2, 3, as one struct — `(count − distinct) / count` per
  * level, 0.0 when a level has no grams.
  *
  * One pass with three hash sets replaces the HOF chain that built two
  * shifted-slice zip_with arrays plus three array_distinct sorts per row.
  * Fractions are the identical integer-difference-then-single-division
  * arithmetic the DuckDB oracle mirrors (pinned by the x8 oracle and the
  * bit-equality spec). CodegenFallback: the row-at-a-time eval is already
  * one tight JVM method; the surrounding projection still codegens around
  * it. Null elements cannot occur from split(); a null element degrades to
  * the literal string "null" rather than poisoning the row. */
case class DupNgramFracs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_dup_ngram_fracs"

  override def dataType: DataType = StructType(Seq(
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("dup_bigram_frac", DoubleType, nullable = false),
    StructField("dup_trigram_frac", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val w = new Array[String](n)
    var i = 0
    while (i < n) {
      w(i) = if (arr.isNullAt(i)) "null" else arr.getUTF8String(i).toString
      i += 1
    }
    val s1 = new java.util.HashSet[String]()
    val s2 = new java.util.HashSet[String]()
    val s3 = new java.util.HashSet[String]()
    i = 0
    while (i < n) {
      s1.add(w(i))
      if (i + 1 < n) s2.add(w(i) + " " + w(i + 1))
      if (i + 2 < n) s3.add(w(i) + " " + w(i + 1) + " " + w(i + 2))
      i += 1
    }
    def frac(total: Int, distinct: Int): Double =
      if (total > 0) (total - distinct).toDouble / total else 0.0
    InternalRow(
      frac(n, s1.size), frac(n - 1, s2.size), frac(n - 2, s3.size))
  }

  override protected def withNewChildInternal(newChild: Expression): DupNgramFracs =
    copy(child = newChild)
}
