package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** simhash_pack(bases): the 60-bit SimHash of an array of 60-bit digest
  * folds ([[Md5Fold]] at 15 nibbles) — per element, the 15 hex digits
  * encoded in the fold vote ±1 on 60 bit counters (bit b lives at hex
  * digit b/4, bit-in-digit b%4, vote 2·bit−1); bits with a positive
  * total set the output.
  *
  * r15: input moved from md5 hex STRINGS to the fold longs — digit c of
  * the fold is `(x >>> 4·(14−c)) & 0xf`, exactly the value the hex-char
  * chain read, so the vote arithmetic (integer votes, strict > 0
  * threshold) and every output bit are unchanged while the per-word
  * 32-char UTF8String disappears from the hot loop. Pinned bit-equal to
  * the hex HOF reference (and therefore the DuckDB oracle) by
  * SimHashPackSpec. Null array → null; null elements are skipped
  * entirely (the HOF twin's zip_with would null the whole accumulator —
  * the corpus has no null words, and skipping is the robust semantics
  * for a library op). */
case class SimHashPack(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_simhash_pack"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bases = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](60)
    val n = bases.numElements()
    var i = 0
    while (i < n) {
      if (!bases.isNullAt(i)) {
        val x = bases.getLong(i)
        var c = 0
        while (c < 15) {
          val v = ((x >>> (4 * (14 - c))) & 0xf).toInt
          var j = 0
          while (j < 4) {
            counts(c * 4 + j) += (((v >> j) & 1) << 1) - 1
            j += 1
          }
          c += 1
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
    nullSafeCodeGen(ctx, ev, bases => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bit = ctx.freshName("bit")
      s"""
         |final int[] $counts = new int[60];
         |final int $n = $bases.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$bases.isNullAt($i)) {
         |    final long $x = $bases.getLong($i);
         |    for (int $c = 0; $c < 15; $c++) {
         |      final int $v = (int) (($x >>> (4 * (14 - $c))) & 0xfL);
         |      for (int $j = 0; $j < 4; $j++) {
         |        $counts[$c * 4 + $j] += ((($v >> $j) & 1) << 1) - 1;
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
