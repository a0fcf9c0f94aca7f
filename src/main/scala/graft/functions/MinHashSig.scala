package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** minhash_sig(bases): the k affine min-hashes
  * `min_b (A(j)·b + B(j)) mod P` of a base-hash array, computed in ONE pass
  * over the bases — the native form of the HOF formulation
  * `transform(0..k-1, j -> array_min(transform(bases, b -> pmod(...))))`,
  * which walks the bases array k times through lambda plumbing.
  *
  * This is the per-document signature step of MinHash+LSH (d2) and every
  * operator built on it (near-dup components, dedup apply, leakage-safe
  * splits, the curation pipeline); integer arithmetic identical to the
  * portable form and the DuckDB oracle (A·b < 2⁵⁹ — no overflow in
  * either engine). Null bases array → null; null ELEMENTS are skipped
  * (array_min semantics ignore nulls); an empty array yields P-mod
  * "identity" minimums of Long.MaxValue — callers filter empty shingle
  * sets upstream, matching the oracle's WHERE len >= 3. */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty)

  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bases = input.asInstanceOf[ArrayData]
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = bases.numElements()
    var i = 0
    while (i < n) {
      if (!bases.isNullAt(i)) {
        val base = bases.getLong(i)
        var j = 0
        while (j < k) {
          val h = (a(j) * base + b(j)) % p
          // base hashes are non-negative, so h ≥ 0 — pmod == %
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aArr = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
    val bArr = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, bases => {
      val k = a.length
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |final long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $bases.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$bases.isNullAt($i)) {
         |    final long $base = $bases.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $h = ($aArr[$j] * $base + $bArr[$j]) % ${p}L;
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
