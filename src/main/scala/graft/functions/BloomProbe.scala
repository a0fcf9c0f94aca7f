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
  /** Executor-JVM-level memo of deserialized filters, keyed by
    * (application id, broadcast id). Broadcast ids alone are a
    * per-SparkContext counter: after a context restart in the same JVM a
    * fresh broadcast could collide with a stale entry and the probe
    * would silently use the WRONG filter — false negatives that drop
    * rows the exact join would have kept (ADVICE r11 medium). The app id
    * is unique per context, so stale entries can only miss, never serve.
    * Soft references: a filter is re-parsed after a GC reclaim rather
    * than pinning ~MiB sketches of finished queries forever. */
  private val filters = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.SoftReference[BloomFilter]]()

  /** Context-unique memo key. SparkEnv is present wherever the
    * expression evaluates (driver in local mode, executor otherwise);
    * if it is somehow absent, fall back to a never-cached key rather
    * than risking a cross-context collision. */
  private def keyFor(bc: Broadcast[Array[Byte]]): Option[String] =
    Option(org.apache.spark.SparkEnv.get)
      .flatMap(env => scala.util.Try(env.conf.getAppId).toOption)
      .map(appId => s"$appId:${bc.id}")

  private[functions] def filterFor(bc: Broadcast[Array[Byte]]): BloomFilter =
    keyFor(bc) match {
      case None =>
        BloomFilter.readFrom(new ByteArrayInputStream(bc.value))
      case Some(key) =>
        val ref = filters.get(key)
        val cached = if (ref == null) null else ref.get()
        if (cached != null) cached
        else {
          val f = BloomFilter.readFrom(new ByteArrayInputStream(bc.value))
          filters.put(key, new java.lang.ref.SoftReference(f))
          f
        }
    }
}
