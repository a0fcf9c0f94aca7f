package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftinternal.Bridge

/** Per-key top-k as a first-class operator: logical node + planner strategy
  * + heap-based physical exec, registered through SparkSessionExtensions.
  *
  * The built-in formulation (`row_number().over(Window...) <= k`) SORTS
  * every key group in full before discarding all but k rows — O(n log n)
  * comparisons and a full materialization per group. This operator keeps a
  * bounded k-element heap per key inside each partition: O(n log k), memory
  * O(#keys · k) instead of O(n), no sort of the losers. At 100 TB (top-k
  * neighbors per query vector, top orders per customer) the difference is
  * the whole group spill.
  *
  * The physical node declares ClusteredDistribution(keys), so the planner
  * inserts the same hash shuffle the window would have used — only the
  * per-partition algorithm changes. Rows within a key are emitted in sort
  * order (like the sorted window output); no rank column is produced.
  *
  * Memory bound: the heap map retains at most (#distinct keys in the
  * partition) · k rows and does NOT spill — the window-sort formulation
  * spills but sorts everything. The exec counts retained rows and warns
  * once per partition past [[TopKPerKeyExec.RetainedRowsWarnThreshold]];
  * if a workload genuinely has billions of keys per partition, raise
  * `spark.sql.shuffle.partitions` (more, smaller partitions) or fall back
  * to the window formulation.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def references: AttributeSet =
    AttributeSet(child.output) ++ AttributeSet(keys.flatMap(_.references)) ++
      AttributeSet(order.flatMap(_.references))
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { it =>
      if (limit <= 0) Iterator.empty
      else {
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap by the output ordering: head = current worst of the kept k
      val heapOrd: Ordering[InternalRow] = ord
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      var retained = 0L
      var warned = false
      it.foreach { r =>
        val key = keyProj(r)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](heapOrd))
        if (heap.size < limit) {
          heap.enqueue(r.copy())
          retained += 1
          if (!warned && retained > TopKPerKeyExec.RetainedRowsWarnThreshold) {
            warned = true
            org.slf4j.LoggerFactory.getLogger(classOf[TopKPerKeyExec])
              .warn(s"TopKPerKey retains $retained rows (unspillable heap " +
                s"map) in one partition — high key cardinality × k=$limit. " +
                "Raise spark.sql.shuffle.partitions or use the window-sort " +
                "formulation if this approaches executor memory.")
          }
        } else if (ord.compare(r, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(r.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator
      }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyExec {
  /** Retained-row count per partition past which the exec logs a memory
    * warning: 4M rows · ~100 B/row ≈ 400 MB of heap — loud well before a
    * realistic executor OOMs. */
  val RetainedRowsWarnThreshold: Long = 4L << 20
}

/** Column-API facade. */
object TopK {
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    val sortOrder = order.map(c => Bridge.expr(spark, c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    Bridge.ofRows(spark,
      TopKPerKey(keys.map(Bridge.expr(spark, _)), sortOrder, k,
        df.queryExecution.logical))
  }
}
