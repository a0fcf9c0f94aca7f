package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** hex_fold7(hex): the first 7 lowercase-hex chars of a string folded into
  * a 28-bit non-negative long — the native form of
  * [[graft.operators.PortableHash.nibbleFold7]]'s 28-node Column tree
  * (7 × substr/ascii/CASE chains become one tight byte loop).
  *
  * This is the innermost expression of every deterministic hash in the
  * library — one evaluation per shingle for minhash bases, per word for
  * rolling fingerprints, per row for sampling gates — so the codegen win
  * multiplies across the corpus. The arithmetic is EXACTLY the portable
  * per-char form the DuckDB oracle mirrors: byte b ≤ '9' → b-48, else
  * b-87 (md5 emits lowercase), acc·16+v. Null input → null; shorter than
  * 7 bytes → null (md5 hex is always 32).
  */
case class HexFold7(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_hexfold7"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numBytes() < 7) null
    else {
      val b = s.getBytes
      var acc = 0L
      var i = 0
      while (i < 7) {
        val a = b(i) & 0xff
        acc = acc * 16 + (if (a <= 57) a - 48 else a - 87)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val a = ctx.freshName("a")
      val acc = ctx.freshName("acc")
      s"""
         |if ($s.numBytes() < 7) {
         |  ${ev.isNull} = true;
         |} else {
         |  final byte[] $b = $s.getBytes();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < 7; $i++) {
         |    final int $a = $b[$i] & 0xff;
         |    $acc = $acc * 16 + ($a <= 57 ? $a - 48 : $a - 87);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexFold7 =
    copy(child = newChild)
}
