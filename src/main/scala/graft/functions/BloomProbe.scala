package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** graft_bloom_probe(hash): Bloom-membership probe whose sketch rides a
  * BROADCAST VARIABLE instead of a plan literal.
  *
  * Spark's own `BloomFilterMightContain` takes the serialized filter as a
  * child expression; inlining a ~1 MiB sketch as a `Literal` makes the
  * DAGScheduler serialize it into EVERY task binary of every stage the
  * predicate appears in ("Broadcasting large task binary" — measured 1.9
  * MiB on q36 at sf0.1). A broadcast variable ships the bytes to each
  * executor ONCE over the torrent path; the expression itself serializes
  * as just the broadcast handle, so task launch cost returns to normal at
  * any sketch size — the difference between a 1 MiB and a 64 MiB
  * dimension fingerprint on a 1000-executor cluster.
  *
  * The filter deserializes ONCE PER EXECUTOR JVM: each task deserializes
  * its own copy of the expression tree, so a plain per-instance lazy val
  * would re-parse the ~MiB sketch once per task — the deserialized
  * filter is memoized in a JVM-level cache keyed by the broadcast id
  * (soft-referenced, so a memory-pressured executor can reclaim filters
  * of finished queries). The probe stays inside whole-stage codegen via
  * a reference object (same technique Spark uses for `references`-
  * carried state). Null hash → null (same three-valued logic as
  * might_contain).
  */
case class BloomProbeBc(bloomBytes: Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_bloom_probe"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long hash argument, got " +
        child.dataType.simpleString)

  @transient private lazy val filter: BloomFilter =
    BloomProbeBc.filterFor(bloomBytes)

  /** Called from generated code — must stay public. */
  def mightContain(h: Long): Boolean = filter.mightContainLong(h)

  override def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // ship `this` (the broadcast HANDLE + child metadata, a few hundred
    // bytes) as a codegen reference; the sketch bytes travel broadcast
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomProbeBc].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomProbeBc = copy(child = newChild)
}

object BloomProbeBc {
  /** Executor-JVM-level memo of deserialized filters, keyed by broadcast
    * id (unique per broadcast variable per application). Soft references:
    * a filter is re-parsed after a GC reclaim rather than pinning ~MiB
    * sketches of finished queries forever. */
  private val filters = new java.util.concurrent.ConcurrentHashMap[
    Long, java.lang.ref.SoftReference[BloomFilter]]()

  private[functions] def filterFor(bc: Broadcast[Array[Byte]]): BloomFilter = {
    val ref = filters.get(bc.id)
    val cached = if (ref == null) null else ref.get()
    if (cached != null) cached
    else {
      val f = BloomFilter.readFrom(new ByteArrayInputStream(bc.value))
      filters.put(bc.id, new java.lang.ref.SoftReference(f))
      f
    }
  }
}
