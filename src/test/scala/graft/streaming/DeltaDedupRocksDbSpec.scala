package graft.streaming

import graft.SparkSpec

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** G1 state at scale (SURVEY §7.4.8): the delta/dedup store on the RocksDB
  * state store provider — the Spark analog of the reference's persistent
  * RocksDB KeyValueStore (TopologyBuilder.java:66-69) — with TTL eviction
  * asserted across batches. RocksDB keeps state off-heap/on-disk, so an
  * unbounded business-key space does not grow the executor heap; the TTL
  * bounds the store itself.
  */
class DeltaDedupRocksDbSpec extends SparkSpec {
  import spark.implicits._

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("suppression state survives batches on the RocksDB provider") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Rec]
      val q = DeltaDedup.stream(input.toDS())(
          _.busKey, _.idx, (old, nw) => old.value.contains(nw.value))
        .map { case (k, r) => (k, r.idx) }.toDF("key", "idx")
        .writeStream.format("memory").queryName("rocks_out")
        .outputMode("append").start()
      try {
        input.addData(Seq(Rec(0, "key-1", "should_pass")))
        q.processAllAvailable()
        // cross-batch suppress: state written by batch 0 must be read back
        // from RocksDB in batch 1
        input.addData(Seq(Rec(1, "key-1", "nope_not_contained")))
        q.processAllAvailable()
        val idxs = spark.table("rocks_out")
          .collect().map(_.getLong(1)).sorted.toSeq
        assert(idxs == Seq(0L))
        // the stateful operator really ran on RocksDB
        val metrics = q.lastProgress.stateOperators.head.customMetrics
        assert(metrics.keySet().toString.toLowerCase.contains("rocksdb"),
          s"expected RocksDB state metrics, got $metrics")
      } finally q.stop()
    }
  }

  test("GraftConf.useRocksDbStateStore wires the provider, fixture passes") {
    import java.sql.Timestamp
    import graft.core.GraftConf
    // snapshot/restore both confs: the flag mutates the SESSION by design
    val keys = GraftStream.RocksDbStateStoreConfigs.keys.toSeq
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      implicit val sqlCtx = spark.sqlContext
      val outRows = new java.util.concurrent.ConcurrentLinkedQueue[
        (String, Long)]()
      val input = MemoryStream[
        (String, Array[Byte], String, Int, Long, Timestamp)]
      val source = input.toDF()
        .toDF("key", "value", "topic", "partition", "offset", "timestamp")
      val conf = GraftConf(applicationId = "graft-rocks-conf-app",
        useRocksDbStateStore = true)
      val q = GraftStream.delta[Dummy](
        source, conf, GraftStreamSpec.decodeFn,
        keyFn = _.busKey,
        seqFn = _.offset,
        isUpdated = (old, nw) => old.value.contains(nw.value),
        outputSink = df => df.collect().foreach(r => outRows.add(
          (r.getString(r.fieldIndex("key")),
            r.getLong(r.fieldIndex("offset"))))),
        errorSink = _ => ())
      try {
        // the conf flag must have landed on the session at pipeline start
        assert(spark.conf.get(
          "spark.sql.streaming.stateStore.providerClass") == Provider)
        def rec(idx: Long, payload: String) =
          (idx.toString, payload.getBytes("UTF-8"), "in-topic", 0, idx,
            new Timestamp(1700000000000L + idx))
        input.addData(Seq(
          rec(0, "key-1|should_pass"),
          rec(1, "key-1|should_not_pass"),
          rec(2, "key-1|should_pass"),
          rec(3, "key-2|should_pass"),
          rec(4, "key-2|should_not_pass"),
          rec(5, "key-2|should_pass")))
        q.processAllAvailable()
        // the canonical delta fixture must still emit {0,2,3,5} — and the
        // stateful operator must actually be running on RocksDB
        val emitted = outRows.toArray(Array.empty[(String, Long)])
          .sortBy(_._2).toSeq
        assert(emitted == Seq(("key-1", 0L), ("key-1", 2L),
          ("key-2", 3L), ("key-2", 5L)), s"fixture drifted: $emitted")
        val metrics = q.lastProgress.stateOperators.head.customMetrics
        assert(metrics.keySet().toString.toLowerCase.contains("rocksdb"),
          s"expected RocksDB state metrics, got $metrics")
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ttlMs evicts idle keys: expired state re-emits the next duplicate") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Rec]
      // With ProcessingTimeTimeout every batch "requires another batch" (to
      // fire newly-expired timers), so the engine runs batches continuously
      // and processAllAvailable never observes a quiescent stream. Pace the
      // trigger and synchronize on processed-input counts instead.
      // The TTL must comfortably exceed the trigger + poll cadence, or the
      // state can expire between batch 0 and the duplicate's batch and the
      // "suppressed before expiry" half of the test races. 2000ms raced
      // once on a cold RocksDB JVM (a first micro-batch was observed to
      // take 4.5s, expiring key-1 before the duplicate arrived); 10s
      // clears any cold-start batch by >2x while the lapse sleep below
      // still bounds the test.
      val ttlMs = 10000L
      val q = DeltaDedup.stream(input.toDS())(
          _.busKey, _.idx, (old, nw) => old.value.contains(nw.value),
          ttlMs = ttlMs)
        .map { case (k, r) => (k, r.idx) }.toDF("key", "idx")
        .writeStream.format("memory").queryName("rocks_ttl_out")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
        .start()
      def awaitInputs(n: Long): Unit = {
        val deadline = System.currentTimeMillis + 60000L
        while (q.recentProgress.map(_.numInputRows).sum < n &&
            System.currentTimeMillis < deadline) Thread.sleep(50L)
        assert(q.recentProgress.map(_.numInputRows).sum >= n,
          s"timed out waiting for $n processed input rows")
      }
      try {
        input.addData(Seq(Rec(0, "key-1", "should_pass")))
        awaitInputs(1)
        // before expiry: duplicate suppressed (and the touch re-arms TTL)
        input.addData(Seq(Rec(1, "key-1", "nope_not_contained")))
        awaitInputs(2)
        assert(spark.table("rocks_ttl_out").count() == 1)

        // let the TTL lapse; the paced empty batches fire the timeout and
        // remove key-1's state (drive one record through as a barrier)
        Thread.sleep(ttlMs + 3000L)
        input.addData(Seq(Rec(2, "key-other", "x")))
        awaitInputs(3)

        // key-1's state is gone → the same suppressed value now re-emits as
        // a first-seen record
        input.addData(Seq(Rec(3, "key-1", "nope_not_contained")))
        awaitInputs(4)
        val deadline = System.currentTimeMillis + 30000L
        while (spark.table("rocks_ttl_out").count() < 3 &&
            System.currentTimeMillis < deadline) Thread.sleep(50L)
        val rows = spark.table("rocks_ttl_out")
          .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2).toSeq
        assert(rows == Seq(("key-1", 0L), ("key-other", 2L), ("key-1", 3L)))
      } finally q.stop()
    }
  }
}
