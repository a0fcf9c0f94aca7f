package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** simhash_pack(hexes): the 60-bit SimHash of an array of md5 hex strings
  * — per element, the first 15 hex chars vote ±1 on 60 bit counters (bit b
  * lives at hex char b/4, bit-in-char b%4, vote 2·bit−1); bits with a
  * positive total set the output.
  *
  * Native one-pass form of the HOF chain
  * `aggregate(hexes, 60-zeros, zip_with(+ hexBits)) → pack` — which built
  * two 60-element arrays per WORD through lambda plumbing. Arithmetic is
  * identical (integer votes, strict > 0 threshold, 2^b as exact longs), so
  * results are bit-equal to the portable form and the DuckDB oracle.
  * Null array → null; null/short elements are skipped entirely (the HOF
  * twin's zip_with would null the whole accumulator — the corpus has no
  * null words, and skipping is the robust semantics for a library op). */
case class SimHashPack(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_simhash_pack"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hexes = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](60)
    val n = hexes.numElements()
    var i = 0
    while (i < n) {
      if (!hexes.isNullAt(i)) {
        val b = hexes.getUTF8String(i).getBytes
        if (b.length >= 15) {
          var c = 0
          while (c < 15) {
            val a = b(c) & 0xff
            val v = if (a <= 57) a - 48 else a - 87
            var j = 0
            while (j < 4) {
              counts(c * 4 + j) += (((v >> j) & 1) << 1) - 1
              j += 1
            }
            c += 1
          }
        }
      }
      i += 1
    }
    var acc = 0L
    var bit = 0
    while (bit < 60) {
      if (counts(bit) > 0) acc |= 1L << bit
      bit += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hexes => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val a = ctx.freshName("a")
      val v = ctx.freshName("v")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bit = ctx.freshName("bit")
      s"""
         |final int[] $counts = new int[60];
         |final int $n = $hexes.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$hexes.isNullAt($i)) {
         |    final byte[] $b = $hexes.getUTF8String($i).getBytes();
         |    if ($b.length >= 15) {
         |      for (int $c = 0; $c < 15; $c++) {
         |        final int $a = $b[$c] & 0xff;
         |        final int $v = $a <= 57 ? $a - 48 : $a - 87;
         |        for (int $j = 0; $j < 4; $j++) {
         |          $counts[$c * 4 + $j] += ((($v >> $j) & 1) << 1) - 1;
         |        }
         |      }
         |    }
         |  }
         |}
         |long $acc = 0L;
         |for (int $bit = 0; $bit < 60; $bit++) {
         |  if ($counts[$bit] > 0) $acc |= 1L << $bit;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}
