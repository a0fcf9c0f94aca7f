package graft.streaming

import graft.SparkSpec

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The canonical delta fixture of the reference, reproduced verbatim:
  * 6 records over 2 business keys with predicate
  * isUpdated(old, new) = old.value.contains(new.value) must emit exactly
  * records {0, 2, 3, 5} re-keyed to their business keys
  * (VavrKStreamWithDeltaTopologyTest.java:263-331, fixture :334-376;
  * same assertions over real Kafka in VavrKStreamWithDeltaIT.java:178-187). */
case class Rec(idx: Long, busKey: String, value: String)

class DeltaDedupSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    Rec(0, "key-1", "should_pass"),
    Rec(1, "key-1", "should_not_pass"),
    Rec(2, "key-1", "should_pass"),
    Rec(3, "key-2", "should_pass"),
    Rec(4, "key-2", "should_not_pass"),
    Rec(5, "key-2", "should_pass"))

  private val isUpdated: (Rec, Rec) => Boolean =
    (old, nw) => old.value.contains(nw.value)

  test("batch delta emits {0,2,3,5} with re-mapped keys") {
    val out = DeltaDedup.batch(fixture.toDS())(_.busKey, _.idx, isUpdated)
      .collect().sortBy(_._2.idx)
    assert(out.map(_._2.idx).toSeq == Seq(0L, 2L, 3L, 5L))
    assert(out.map(_._1).toSeq == Seq("key-1", "key-1", "key-2", "key-2"))
  }

  test("batch delta ignores input order inside a group (offset-sort, §7.4.1)") {
    val shuffled = scala.util.Random.shuffle(fixture)
    val out = DeltaDedup.batch(shuffled.toDS())(_.busKey, _.idx, isUpdated)
      .collect().map(_._2.idx).sorted.toSeq
    assert(out == Seq(0L, 2L, 3L, 5L))
  }

  test("streaming delta matches the fixture and keeps state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Rec]
    val out = DeltaDedup.stream(input.toDS())(_.busKey, _.idx, isUpdated)
      .map { case (k, r) => (k, r.idx, r.value) }
      .toDF("key", "idx", "value")
    val q = out.writeStream.format("memory").queryName("delta_out")
      .outputMode("append").start()
    try {
      input.addData(fixture.take(3))
      q.processAllAvailable()
      val afterB1 = spark.table("delta_out").select("idx")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(afterB1 == Seq(0L, 2L))

      // batch 2: key-2 fixture rows + a duplicate for key-1 that must be
      // suppressed against state persisted from batch 1
      input.addData(fixture.drop(3) :+ Rec(6, "key-1", "should_pass"))
      q.processAllAvailable()
      val all = spark.table("delta_out")
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2).toSeq
      // idx 6 emits: stored "should_pass" contains new "should_pass" → true
      assert(all == Seq(("key-1", 0L), ("key-1", 2L), ("key-2", 3L),
        ("key-2", 5L), ("key-1", 6L)))

      // batch 3: a value NOT contained by the stored one is suppressed
      input.addData(Seq(Rec(7, "key-1", "something_else_entirely")))
      q.processAllAvailable()
      assert(spark.table("delta_out").count() == 5)
    } finally q.stop()
  }

  test("first record per key always emits even when predicate says false") {
    val ds = Seq(Rec(0, "k", "a")).toDS()
    val out = DeltaDedup.batch(ds)(_.busKey, _.idx, (_, _) => false).collect()
    assert(out.length == 1)
  }
}
