package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** char_diversity_stats(text): the per-document character statistics behind
  * the x13 diversity signals — total counted characters, distinct
  * characters, Σcount², and the max count — in ONE pass over the string
  * with a small per-row hash map.
  *
  * This replaces the explode → (doc, char) count → per-doc reduce shape,
  * which shuffles a row PER CHARACTER (corpus-character-scale exchange at
  * 100 TB); as a projection the operator runs at scan speed. Counting is
  * per code point, skipping the five Java-regex line terminators so the
  * values stay bit-identical to the `regexp_extract_all(text, '.')`
  * reference twin the DuckDB oracle mirrors (corpus text contains none of
  * them, where the engines' `.` dialects would diverge). */
case class CharDiversityStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_char_diversity_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("max_cnt", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }

  private def isLineTerminator(cp: Int): Boolean =
    cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Integer, Integer]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (!isLineTerminator(cp)) {
        val prev = counts.get(cp)
        counts.put(cp, if (prev == null) 1 else prev + 1)
      }
    }
    var n = 0L
    var s2 = 0L
    var mx = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      n += c
      s2 += c * c
      if (c > mx) mx = c
    }
    InternalRow(n, counts.size().toLong, s2, mx)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharDiversityStats = copy(child = newChild)
}
