package graft.streaming

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Top-level state for the forced-restart replay test: foreachBatch
  * closures must not capture the ScalaTest suite, and the counters must
  * survive across the two query incarnations. */
object IdemReplaySink {
  val sinkRuns = new java.util.concurrent.atomic.AtomicInteger
  val crashOnce = new java.util.concurrent.atomic.AtomicBoolean
  def reset(): Unit = { sinkRuns.set(0); crashOnce.set(false) }
  /** parquet append wrapped in the idempotence guard, with one injected
    * crash AFTER the guard commits — the window between the sink's commit
    * and Spark's own checkpoint commit, which is exactly what a restart
    * replays. */
  def batchFn(lake: String, commits: String): (DataFrame, Long) => Unit = {
    val sink: DataFrame => Unit = { df =>
      sinkRuns.incrementAndGet()
      GraftStream.parquetLakeSink(lake, Nil)(df)
    }
    val guarded = GraftStream.idempotent(commits)(sink)
    (df, id) => {
      guarded(df, id)
      if (!crashOnce.getAndSet(true))
        throw new RuntimeException("injected crash after sink commit")
    }
  }
}

class LakeSinkSpec extends SparkSpec {
  import spark.implicits._

  test("parquetLakeSink lands micro-batches partitioned by column") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-lake").toString
    val input = MemoryStream[(Long, String, String)]
    val sink = GraftStream.parquetLakeSink(dir, Seq("lang"))
    val q = input.toDF().toDF("doc_id", "lang", "text").writeStream
      .foreachBatch((b: DataFrame, _: Long) => sink(b))
      .start()
    try {
      input.addData(Seq((1L, "en", "hello"), (2L, "fr", "bonjour")))
      q.processAllAvailable()
      input.addData(Seq((3L, "en", "again")))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    // directory partitioning visible on disk → partition pruning downstream
    val dirs = new java.io.File(dir).list().toSet
    assert(dirs.exists(_.startsWith("lang=en")) &&
      dirs.exists(_.startsWith("lang=fr")), s"saw $dirs")
    assert(back.filter($"lang" === "en").count() == 2)
  }

  test("upsertLakeSink materializes the newest record per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert")
      .toString + "/t"
    val input = MemoryStream[(Long, Long, String)]
    val sink = GraftStream.upsertLakeSink(dir,
      keyCols = Seq("id"), orderCols = Seq("ver"))
    val q = input.toDF().toDF("id", "ver", "state").writeStream
      .foreachBatch((b: DataFrame, _: Long) => sink(b))
      .start()
    try {
      input.addData(Seq((1L, 1L, "created"), (2L, 1L, "created")))
      q.processAllAvailable()
      // batch 2 updates key 1, inserts key 3
      input.addData(Seq((1L, 2L, "updated"), (3L, 1L, "created")))
      q.processAllAvailable()
      // replayed change (same key+ver) must not change the state
      input.addData(Seq((1L, 2L, "updated")))
      q.processAllAvailable()
    } finally q.stop()
    val state = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(state == Map(
      1L -> ((2L, "updated")),
      2L -> ((1L, "created")),
      3L -> ((1L, "created"))))
  }

  test("idempotent: forced-restart replay does not double-write the lake") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-idem").toString
    val (lake, ckpt, commits) =
      (s"$base/lake", s"$base/ckpt", s"$base/commits")
    IdemReplaySink.reset()
    val input = MemoryStream[(Long, String)]
    def start() = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(IdemReplaySink.batchFn(lake, commits))
      .start()

    // First incarnation: the sink writes AND commits its marker, then the
    // query dies before Spark records the batch in its own commit log —
    // the exact window a restart replays.
    input.addData(Seq((1L, "a"), (2L, "b")))
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    assert(IdemReplaySink.sinkRuns.get == 1, "sink ran once before the crash")
    assert(spark.read.parquet(lake).count() == 2)

    // Restart: Spark replays the SAME batch id; the guard must skip it
    // (no duplicate rows), then process new data normally.
    val q2 = start()
    try {
      q2.processAllAvailable()
      input.addData(Seq((3L, "c")))
      q2.processAllAvailable()
    } finally q2.stop()
    val ids = spark.read.parquet(lake).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"replayed batch must not re-append: $ids")
    assert(IdemReplaySink.sinkRuns.get == 2,
      "replayed batch skipped: one sink run per distinct batch")
  }

  test("idempotent: failed sink leaves no marker, so the batch is retried") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cl").toString
    val runs = new java.util.concurrent.atomic.AtomicInteger
    val df = Seq((1L, "a")).toDF("id", "v")
    val log = new GraftStream.BatchCommitLog(dir,
      spark.sessionState.newHadoopConf())
    // sink failure: the guard must NOT publish the marker — marking a
    // failed batch committed would turn a retry into silent data loss
    intercept[RuntimeException] {
      GraftStream.idempotent[DataFrame](dir) { _ =>
        runs.incrementAndGet(); throw new RuntimeException("sink boom")
      }.apply(df, 7L)
    }
    assert(!log.committed(7L), "failed batch must not be marked committed")
    // the retry (same batch id) runs the sink and commits
    val guarded = GraftStream.idempotent[DataFrame](dir) { _ =>
      runs.incrementAndGet(); ()
    }
    guarded(df, 7L)
    assert(log.committed(7L) && runs.get == 2)
    // a re-delivery after commit is a no-op
    guarded(df, 7L)
    assert(runs.get == 2, "committed batch re-delivered must be skipped")
  }

  test("BatchCommitLog prunes markers behind the retention window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val log = new GraftStream.BatchCommitLog(dir,
      spark.sessionState.newHadoopConf(), retainBatches = 2)
    (0L to 5L).foreach(log.commit)
    // floor = 5 - 2 = 3: everything below is pruned, the window survives
    assert(!log.committed(0L) && !log.committed(2L))
    assert(log.committed(3L) && log.committed(4L) && log.committed(5L))
  }

  test("simple pipeline with conf.commitDir writes batch markers") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-wire").toString
    GraftStreamSpec.processed.clear()
    val input =
      MemoryStream[(String, Array[Byte], String, Int, Long, Timestamp)]
    val source = input.toDF()
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val conf = graft.core.GraftConf(applicationId = "graft-idem-app",
      checkpointLocation = s"$base/ckpt", commitDir = s"$base/commits")
    val q = GraftStream.simple[Dummy](source, conf, GraftStreamSpec.decodeFn,
      process = d => { GraftStreamSpec.processed.add(d.value); None },
      // the error sink is the pipeline's one action — it must consume the
      // frame or nothing (including the processor) evaluates
      errorSink = df => { df.collect(); () })
    try {
      input.addData(Seq(("0", "k1|ok".getBytes("UTF-8"), "t", 0, 0L,
        new Timestamp(1700000000000L))))
      q.processAllAvailable()
    } finally q.stop()
    assert(GraftStreamSpec.processed.toArray.toSet == Set("ok"))
    // markers live under the per-pipeline namespace: batchIds restart at 0
    // for every query, so a shared bare dir would cross-skip batches
    val log = new GraftStream.BatchCommitLog(
      s"$base/commits/graft-idem-app-simple",
      spark.sessionState.newHadoopConf())
    assert(log.committed(0L), "wired guard must record the batch marker")
  }
}
