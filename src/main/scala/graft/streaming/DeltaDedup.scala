package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's one stateful operator: per-key delta/dedup against a
  * persistent store with a user predicate deciding emit-or-suppress
  * (/root/reference/src/main/java/fr/barbicane/maston/builder/TransformerBuilder.java:116-162,
  * store wiring TopologyBuilder.java:66-69).
  *
  * Semantics (TransformerBuilder.java:140-143, RecordDeltaProcessor.java:5-13):
  *   key' = keyFn(record); old = store.get(key')
  *   if old == null or isUpdated(old, new): store.put(key', new); emit (key', new)
  *   else: suppress
  *
  * Ordering: Kafka Streams sees records one at a time in per-partition offset
  * order; a Spark micro-batch (or batch group) hands the whole key group over
  * at once, so records are re-sorted by a caller-supplied sequence (offset /
  * event id) before the sequential fold — without this the emission set
  * diverges (SURVEY.md §7.4.1).
  *
  * Scale: state is per-key and O(1) per key (one stored value). Backed by the
  * RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`) the state comfortably
  * exceeds executor memory; unbounded key spaces should set a TTL via
  * `streamTimeout`. The groupByKey shuffle is the same repartition-by-new-key
  * the reference performs at its producer (RecordKeyProcessor.java:9).
  */
object DeltaDedup {

  /** Streaming form: flatMapGroupsWithState in Append mode.
    *
    * @param keyFn   business-key extractor (T3, RecordKeyProcessor.java)
    * @param seqFn   per-record order within a key (Kafka offset, event id)
    * @param isUpdated emit/suppress predicate given (stored, incoming)
    * @param timeout optional state TTL; NoTimeout matches the reference's
    *                forever-store, ProcessingTimeTimeout bounds state at scale
    */
  def stream[T: Encoder, K: Encoder](ds: Dataset[T])(
      keyFn: T => K,
      seqFn: T => Long,
      isUpdated: (T, T) => Boolean,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      ttlMs: Long = -1L)(
      implicit pairEnc: Encoder[(K, T)]): Dataset[(K, T)] = {
    // ttlMs implies processing-time timeouts — deriving the mode here keeps
    // the API from permitting ttl + NoTimeout, which would throw at runtime
    // on the first setTimeoutDuration call.
    val effectiveTimeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout else timeout
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[T, (K, T)](OutputMode.Append, effectiveTimeout) {
        (key: K, it: Iterator[T], state: GroupState[T]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = foldGroup(key, it, seqFn, isUpdated,
              if (state.exists) Some(state.get) else None,
              (v: T) => state.update(v))
            // TTL re-arms on EVERY batch that touches the key — including
            // batches of suppressed duplicates — so a hot key's state never
            // expires mid-stream (expiry would re-emit its next duplicate).
            if (ttlMs > 0 && state.exists) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
      }
  }

  /** Batch form: same semantics over a bounded Dataset via flatMapGroups —
    * lets the golden fixtures and the DuckDB oracle exercise identical logic
    * without a streaming sink.
    */
  def batch[T: Encoder, K: Encoder](ds: Dataset[T])(
      keyFn: T => K,
      seqFn: T => Long,
      isUpdated: (T, T) => Boolean)(
      implicit pairEnc: Encoder[(K, T)]): Dataset[(K, T)] = {
    ds.groupByKey(keyFn).flatMapGroups { (key: K, it: Iterator[T]) =>
      foldGroup(key, it, seqFn, isUpdated, None, (_: T) => ()).iterator
    }
  }

  private def foldGroup[T, K](
      key: K,
      it: Iterator[T],
      seqFn: T => Long,
      isUpdated: (T, T) => Boolean,
      initial: Option[T],
      store: T => Unit): Seq[(K, T)] = {
    var stored = initial
    // Sort by sequence inside the group: a micro-batch delivers the whole
    // group at once while the reference consumed in offset order (§7.4.1).
    val sorted = it.toVector.sortBy(seqFn)
    val out = Vector.newBuilder[(K, T)]
    sorted.foreach { v =>
      val emit = stored.isEmpty || isUpdated(stored.get, v)
      if (emit) {
        stored = Some(v)
        store(v)
        out += ((key, v))
      }
    }
    out.result()
  }
}
