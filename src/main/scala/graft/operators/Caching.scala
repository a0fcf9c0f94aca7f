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

  /** Persist `intermediates`, evaluate `result`, eagerly materialize it with
    * lineage truncation, release the intermediates. */
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
