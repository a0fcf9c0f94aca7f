package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_md5fold(s): md5(prefix ‖ s) folded to its first `nibbles` hex
  * digits as a non-negative long — ONE digest call per value, no hex
  * string, no concat buffer.
  *
  * Bit-identical to the portable chain the DuckDB oracle computes
  * (`fold(md5(prefix || s))` with the per-char ascii arithmetic of
  * [[graft.operators.PortableHash]]): an md5 hex string is the digest
  * bytes in big-endian nibble order, so the first N hex chars ARE the
  * digest's first 4·N bits — `Md5FoldSpec` pins the equality against the
  * Column-tree reference for both widths. This expression exists because
  * the r14 bench telemetry showed the shingle families spending 85–105%
  * of wall in GC: every shingle was materializing a prefix-concat
  * UTF8String plus a 32-char hex UTF8String just to feed a 28- or 60-bit
  * fold. Folding straight off the digest removes both allocations from
  * the hottest loop in the library.
  *
  * `nibbles` ≤ 15 keeps the value positive in a signed 64-bit long on
  * both engines. Null input → null; non-null input never nulls (md5 is
  * total).
  */
case class Md5Fold(child: Expression, prefix: String, nibbles: Int)
    extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be in [1, 15], got $nibbles")

  override def prettyName: String = "graft_md5fold"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)

  @transient private lazy val prefixBytes: Array[Byte] =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any = {
    val md = Md5Fold.digestPool.get()
    md.reset()
    md.update(prefixBytes)
    md.update(input.asInstanceOf[UTF8String].getBytes)
    Md5Fold.fold(md.digest(), nibbles)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pre = ctx.addReferenceObj("prefixBytes", prefixBytes, "byte[]")
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, s => {
      val dg = ctx.freshName("dg")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val nib = ctx.freshName("nib")
      s"""
         |$md.reset();
         |$md.update($pre);
         |$md.update($s.getBytes());
         |final byte[] $dg = $md.digest();
         |long $acc = 0L;
         |for (int $i = 0; $i < $nibbles; $i++) {
         |  final int $nib = ($i % 2 == 0)
         |    ? (($dg[$i / 2] >>> 4) & 0xf) : ($dg[$i / 2] & 0xf);
         |  $acc = $acc * 16 + $nib;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Fold =
    copy(child = newChild)
}

object Md5Fold {
  /** One MessageDigest per thread for the interpreted path — MessageDigest
    * is stateful and expression instances can be shared across tasks. */
  private val digestPool: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First `nibbles` big-endian hex digits of a digest as a long. */
  private[functions] def fold(dg: Array[Byte], nibbles: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < nibbles) {
      val nib =
        if (i % 2 == 0) (dg(i / 2) >>> 4) & 0xf else dg(i / 2) & 0xf
      acc = acc * 16 + nib
      i += 1
    }
    acc
  }
}
