package graft.streaming

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Top-level sink buffer: foreachBatch closures must not capture the
  * ScalaTest suite (serialization), and the buffer must survive across the
  * two query incarnations. */
object DeltaRestartSink {
  val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
  def add(df: DataFrame): Unit =
    df.collect().foreach(r => rows.add((r.getString(0), r.getLong(1))))
}

/** The reference's state store is durable across application restarts
  * (RocksDB + changelog); the Spark analog is flatMapGroupsWithState state
  * restored from the streaming checkpoint. A key seen before the restart
  * must still suppress duplicates after it — if state were lost, the
  * post-restart record would wrongly emit as first-per-key. */
class DeltaRestartSpec extends SparkSpec {
  import spark.implicits._

  test("delta suppression state survives a query restart (checkpoint)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("delta-ckpt").toString
    DeltaRestartSink.rows.clear()
    val input = MemoryStream[Rec]
    val isUpdated: (Rec, Rec) => Boolean =
      (old, nw) => old.value.contains(nw.value)
    def start() = DeltaDedup.stream(input.toDS())(_.busKey, _.idx, isUpdated)
      .map { case (k, r) => (k, r.idx) }.toDF("key", "idx")
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) => DeltaRestartSink.add(b))
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      input.addData(Rec(0, "key-1", "should_pass"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(DeltaRestartSink.rows.size == 1, "first record emitted")

    // arrives while the query is down; NOT contained by the stored value →
    // must be suppressed, but ONLY if key-1's state was restored
    input.addData(Rec(1, "key-1", "something_else"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(DeltaRestartSink.rows.size == 1,
        "suppressed against state restored from the checkpoint")
      // a contained value still emits post-restart (predicate, not dedup-all)
      input.addData(Rec(2, "key-1", "should_pass"))
      q2.processAllAvailable()
      val all = DeltaRestartSink.rows.toArray(Array.empty[(String, Long)])
      assert(all.map(_._2).sorted.toSeq == Seq(0L, 2L))
    } finally q2.stop()
  }
}
