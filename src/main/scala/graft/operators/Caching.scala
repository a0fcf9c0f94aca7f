package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache-lifecycle bracket for operators whose pipeline reads a shared
  * intermediate several times (shingle sets, normalized vectors) but whose
  * result is orders of magnitude smaller (candidate pairs, top-k lists).
  *
  * The intermediates are persisted for the duration of the operator, the
  * result is materialized eagerly — `localCheckpoint` truncates lineage so
  * the result no longer references the intermediates — and the intermediates
  * are released in a `finally`. Operator calls therefore leave no cached
  * blocks behind: repeated calls in a long-lived session (or a 47-query
  * bench run) do not accumulate storage memory, and no plan can silently
  * recompute the expensive intermediate because the cache was dropped early.
  *
  * The checkpointed result blocks themselves are owned by the returned
  * DataFrame's RDD and are reclaimed by the ContextCleaner once the caller
  * drops the reference — unlike `CacheManager` entries, they hold no strong
  * root.
  *
  * Contract: use only when the operator's OUTPUT is small relative to the
  * intermediates (dedup pair lists, per-query top-k, per-group sketches).
  * `localCheckpoint` is not fault-tolerant to executor loss; for a
  * multi-tenant 100 TB job prefer `spark.sparkContext.setCheckpointDir` +
  * reliable `checkpoint` via [[Caching.reliable]].
  */
object Caching {

  /** The physical plan of the last frame [[materialize]] truncated —
    * lineage truncation replaces the caller-visible plan with a checkpoint
    * scan, so plan-quality pins (and humans debugging a slow operator)
    * read the REAL executed shape here instead. Planning is forced anyway
    * by the eager materialization; capturing its string costs nothing
    * extra. Last-writer-wins by design: read it immediately after a
    * single-threaded operator call (the PlanQualitySpec pattern), not
    * while concurrent queries may materialize. */
  @volatile private[graft] var lastMaterializedPlan: String = ""

  /** Plan-dump hook (ExplainMain): when enabled, every [[materialize]]
    * call also appends its FORMATTED pre-truncation plan here, so a plan
    * dump can show the real executed shape of operators whose public
    * result frame is just a checkpoint scan. Off (and the buffer empty)
    * in every normal run — Bench/Verify never set it. */
  @volatile private[graft] var captureMaterializedPlans: Boolean = false
  private[graft] val materializedPlans =
    new scala.collection.mutable.ArrayBuffer[String]

  /** Eager materialization with lineage truncation, fault-tolerance chosen
    * by session posture: a RELIABLE `checkpoint()` when the session has a
    * checkpoint directory (the 100 TB cluster setting — a lost executor
    * recomputes from the checkpoint files instead of killing the job),
    * `localCheckpoint` otherwise (local/dev, where executor loss means the
    * JVM is gone anyway and the extra write job buys nothing). Iterative
    * operators (connected components) and cache brackets all materialize
    * through this one policy point.
    *
    * The reliable path persists before checkpointing: a bare
    * `df.checkpoint(true)` computes the plan twice — once for the eager
    * action and again when `ReliableCheckpointRDD` writes the files — so
    * every CC round on the very cluster posture this exists for would cost
    * 2×. Persist makes the checkpoint write read cached blocks; the persist
    * is released once the checkpoint files own the data.
    *
    * Checkpoint-file lifecycle: Spark deletes a reliable checkpoint's files
    * only when `spark.cleaner.referenceTracking.cleanCheckpoints=true`
    * (default false) AND the driver GCs the RDD. Iterative callers on a real
    * cluster should set that conf, or clear the checkpoint dir between jobs
    * — otherwise per-round checkpoints accumulate unboundedly. */
  def materialize(df: DataFrame): DataFrame = {
    lastMaterializedPlan = df.queryExecution.executedPlan.toString
    if (captureMaterializedPlans) materializedPlans.synchronized {
      materializedPlans += df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }
    // SPARK_GRAFT_PLANSIZE=1: report what the DAGScheduler will serialize
    // for this materialization — the task-binary-bloat diagnostic (find
    // which plan node drags a ~MiB subtree into every task binary)
    if (sys.env.get("SPARK_GRAFT_PLANSIZE").contains("1")) {
      val ser = org.apache.spark.SparkEnv.get.closureSerializer.newInstance()
      def sz(o: AnyRef): Long =
        try ser.serialize(o).limit().toLong
        catch { case _: Throwable => -1L }
      val top = df.queryExecution.executedPlan.collect {
        case p => (sz(p), p.getClass.getSimpleName)
      }.sortBy(-_._1).take(6)
      // cumulative serialized size along the narrow-dependency lineage:
      // the first big jump names the RDD whose closure drags the weight
      def walk(r: org.apache.spark.rdd.RDD[_]): List[org.apache.spark.rdd.RDD[_]] =
        r :: r.dependencies.collect {
          case d: org.apache.spark.NarrowDependency[_] => walk(d.rdd)
        }.toList.flatten
      val chain = walk(df.queryExecution.toRdd)
        .map(r => (sz(r), r.id, r.getClass.getSimpleName))
      System.err.println(
        s"[plansize] rdd=${sz(df.queryExecution.toRdd)} top=$top chain=$chain")
      // field-level breakdown of the heaviest lineage RDD: which captured
      // object carries the weight
      def fields(o: AnyRef): Seq[(Long, String, AnyRef)] = {
        var c: Class[_] = o.getClass
        val out = scala.collection.mutable.ArrayBuffer[(Long, String, AnyRef)]()
        while (c != null) {
          c.getDeclaredFields.foreach { f =>
            if (!java.lang.reflect.Modifier.isStatic(f.getModifiers) &&
                f.getName != "deps" && f.getName != "dependencies_") {
              f.setAccessible(true)
              val v = f.get(o)
              if (v != null && v.isInstanceOf[AnyRef] &&
                  !v.isInstanceOf[org.apache.spark.rdd.RDD[_]])
                out += ((sz(v.asInstanceOf[AnyRef]),
                  s"${c.getSimpleName}.${f.getName}:${v.getClass.getSimpleName}",
                  v.asInstanceOf[AnyRef]))
            }
          }
          c = c.getSuperclass
        }
        out.toSeq
      }
      // the RDD where the cumulative size JUMPS is the one whose own
      // closure carries the weight
      val lineage = walk(df.queryExecution.toRdd)
      val jumps = lineage.map { r =>
        val parent = r.dependencies.collectFirst {
          case d: org.apache.spark.NarrowDependency[_] => sz(d.rdd) }
        (sz(r) - parent.getOrElse(0L), r)
      }
      jumps.maxByOption(_._1).foreach { case (jump, r) =>
        var level: Seq[(Long, String, AnyRef)] =
          fields(r).sortBy(-_._1)
        val path = scala.collection.mutable.ArrayBuffer[String]()
        var depth = 0
        while (level.nonEmpty && depth < 8) {
          val (s0, n0, v0) = level.head
          path += s"$n0=$s0"
          v0 match {
            case arr: Array[AnyRef] =>
              path += arr.map(e => if (e == null) (0L, "null")
                else (sz(e), e.getClass.getName)).sortBy(-_._1).take(4)
                .mkString("[", "; ", "]")
              level = Nil
            case _ => level = fields(v0).sortBy(-_._1)
          }
          depth += 1
        }
        System.err.println(
          s"[plansize]   jump=$jump at rdd ${r.id}: ${path.mkString(" -> ")}")
      }
    }
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      persistedCheckpoint(df)
    else df.localCheckpoint(true)
  }

  /** The ONE copy of the single-compute reliable-checkpoint bracket:
    * persist → checkpoint(eager) → unpersist. Both [[materialize]] and
    * [[reliable]] route through it, so a future change to the bracket
    * (like the sweep-predicate fix this pattern once needed) lands in one
    * place and is covered by the one single-compute test. */
  private def persistedCheckpoint(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    try df.checkpoint(true)
    finally df.unpersist(false)
  }

  /** Intermediates persist LAZILY by design — their cache builds inside
    * the body's first action, FUSED with that action's own compute (no
    * separate pass, no columnar read-back for the first consumer). The
    * price is a benign race: when the first action scans the frame from
    * two concurrent stages (a band/wedge self-join, a broadcast build
    * racing the probe scan), both may compute the same partition, one
    * put is rejected, and the BlockManager logs "already exists, not
    * re-adding" — correctness unaffected (the kept copy is the one
    * everyone reads), cost = the raced partition computed twice,
    * OCCASIONALLY (scheduling-dependent; ~1-3 occurrences per ~500
    * measured queries in the r13 audits). The alternative was measured
    * and REJECTED (r13): eagerly count()-building every bracket's cache
    * kills the race class but swaps the first consumer's fused compute
    * for a cache decode — +0.9-1.0 s per shingle-heavy query (d2/d26),
    * ~3% suite-wide, a worse steady-state trade than an intermittent
    * duplicated partition. Sites whose first action RELIABLY races
    * (deterministic, not scheduling-luck) instead materialize the small
    * slice that seeds the race (kmeansCentroids seeds; the s1/s4/s6/s7/
    * s8/s10/s12 broadcast-query slices; ivfAdcIndex's vc/sub; the Graph
    * label/rank edge frames) — one cheap sequential action, no decode
    * tax on the big frame. */
  def withPersisted(intermediates: DataFrame*)(result: => DataFrame): DataFrame = {
    intermediates.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    try materialize(result)
    finally intermediates.foreach(_.unpersist(false))
  }

  /** Two-result form of [[withPersisted]]: both frames are materialized
    * (lineage-truncated) BEFORE the intermediates are released, so neither
    * result can silently recompute the shared intermediate later. For
    * operators that fan one expensive pass out into two outputs
    * (governance report: dedup pairs + cap accounting). */
  def withPersisted2(intermediates: DataFrame*)(
      result: => (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    intermediates.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    try { val (a, b) = result; (materialize(a), materialize(b)) }
    finally intermediates.foreach(_.unpersist(false))
  }

  /** Three-result form of [[withPersisted2]] — for the card's media pass
    * (mix + silence + phash advisory off one persisted catalog scan). */
  def withPersisted3(intermediates: DataFrame*)(
      result: => (DataFrame, DataFrame, DataFrame))
      : (DataFrame, DataFrame, DataFrame) = {
    intermediates.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    try {
      val (a, b, c) = result
      (materialize(a), materialize(b), materialize(c))
    }
    finally intermediates.foreach(_.unpersist(false))
  }

  /** Same bracket with a reliable (checkpoint-dir) materialization — survives
    * executor loss, for long multi-stage jobs on real clusters. Requires
    * `spark.sparkContext.setCheckpointDir` to have been called. The result
    * is persisted across the action + checkpoint-write pair (see
    * [[materialize]]) so the plan is computed exactly once. */
  def reliable(intermediates: DataFrame*)(result: => DataFrame): DataFrame = {
    intermediates.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    try persistedCheckpoint(result)
    finally intermediates.foreach(_.unpersist(false))
  }
}
