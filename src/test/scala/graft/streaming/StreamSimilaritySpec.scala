package graft.streaming

import graft.SparkSpec

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming kNN against a static index: each micro-batch of query
  * embeddings is scored with the same batch operator, so results per batch
  * equal the batch answer and cost scales with the batch. */
class StreamSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(parts: (Int, Float)*): Array[Float] = {
    val a = Array.fill(64)(0f)
    parts.foreach { case (i, v) => a(i) = v }
    a
  }

  test("knnVsIndex emits per-batch exact top-k against the static index") {
    implicit val sqlCtx = spark.sqlContext
    val index = Seq(
      (100L, vec(0 -> 1f)),            // collinear with query 1
      (101L, vec(0 -> 1f, 1 -> 1f)),   // 45°
      (102L, vec(1 -> 1f)),            // orthogonal
      (103L, vec(0 -> -1f)))           // opposite
      .toDF("vec_id", "embedding")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()

    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamSimilarity.knnVsIndex(
      input.toDF().toDF("vec_id", "embedding"), index,
      sink = df => df.collect().foreach(r =>
        got.add((r.getLong(0), r.getLong(1)))), k = 2)
    try {
      input.addData(Seq((1L, vec(0 -> 2f))))
      q.processAllAvailable()
      assert(got.toArray(Array.empty[(Long, Long)]).toSet ==
        Set((1L, 100L), (1L, 101L)),
        "top-2 by cosine: the collinear and the 45-degree neighbor")

      // second batch: a different query, scored independently
      input.addData(Seq((2L, vec(1 -> 3f))))
      q.processAllAvailable()
      assert(got.toArray(Array.empty[(Long, Long)]).toSet ==
        Set((1L, 100L), (1L, 101L), (2L, 102L), (2L, 101L)))
    } finally q.stop()
  }

  test("mmrVsIndex equals the batch mmrVsCorpus per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val index = Seq(
      (1L, vec(0 -> 0.8f, 1 -> 0.6f)),
      (2L, vec(0 -> 0.8f, 1 -> 0.6f, 2 -> 0.001f)),  // near-dup of 1
      (3L, vec(0 -> 0.6f, 1 -> -0.8f)))
      .toDF("vec_id", "embedding")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Int, Long)]()
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamSimilarity.mmrVsIndex(
      input.toDF().toDF("vec_id", "embedding"), index,
      sink = df => df.collect().foreach(r => got.add((
        r.getLong(r.fieldIndex("query_id")),
        r.getInt(r.fieldIndex("mmr_rank")),
        r.getLong(r.fieldIndex("neighbor_id"))))), k = 3)
    try {
      val batch = Seq((1000L, vec(0 -> 1f)))
      input.addData(batch)
      q.processAllAvailable()
      val want = graft.operators.Similarity.mmrVsCorpus(
          batch.toDF("vec_id", "embedding"), index, k = 3).collect()
        .map(r => (r.getLong(r.fieldIndex("query_id")),
          r.getInt(r.fieldIndex("mmr_rank")),
          r.getLong(r.fieldIndex("neighbor_id")))).toSet
      assert(got.toArray(Array.empty[(Long, Int, Long)]).toSet == want)
      assert(want == Set((1000L, 1, 1L), (1000L, 2, 3L), (1000L, 3, 2L)),
        "diversity demotes the near-duplicate")
    } finally q.stop()
  }

  test("rangeVsIndex streams every above-threshold stored neighbor") {
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = graft.operators.Similarity.ivfAdcIndex(emb)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Double)]()
    val input = MemoryStream[(Long, Array[Float], Int)]
    val q = StreamSimilarity.rangeVsIndex(
      input.toDF().toDF("vec_id", "embedding", "label"), emb, index,
      sink = df => df.collect().foreach(r => got.add((
        r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("neighbor_id")),
        r.getDouble(r.fieldIndex("cos"))))))
    try {
      // query id 100 COLLIDES with stored vec_id 100 and carries its
      // vector: the serve form must return the stored twin at cosine 1
      val v100 = emb.filter("vec_id = 100").collect().head
        .getSeq[Float](1).toArray
      val batch = Seq((100L, v100, 0))
      input.addData(batch)
      q.processAllAvailable()
      val rows = got.toArray(Array.empty[(Long, Long, Double)]).toSet
      val want = graft.operators.Similarity.ivfRangeServe(
          batch.toDF("vec_id", "embedding", "label"), emb, index)
        .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
          r.getLong(r.fieldIndex("neighbor_id")),
          r.getDouble(r.fieldIndex("cos")))).toSet
      assert(rows == want, s"stream must equal the batch serve:\n$rows\n$want")
      assert(rows.exists(t => t._2 == 100L && math.abs(t._3 - 1.0) < 1e-12),
        s"colliding-id stored twin found at cosine 1: $rows")
      assert(rows.forall(_._3 >= 0.3))
    } finally q.stop()
  }

  test("filteredVsIndex streams only allow-listed neighbors (batch twin)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = graft.operators.Similarity.ivfAdcIndex(emb)
    val allowed = emb.filter(col("label") % 2 === 0).select("vec_id")
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Double)]()
    val input = MemoryStream[(Long, Array[Float], Int)]
    val q = StreamSimilarity.filteredVsIndex(
      input.toDF().toDF("vec_id", "embedding", "label"), emb, index,
      allowed,
      sink = df => df.collect().foreach(r => got.add((
        r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("neighbor_id")),
        r.getDouble(r.fieldIndex("cos"))))), k = 5)
    try {
      val v100 = emb.filter("vec_id = 100").collect().head
        .getSeq[Float](1).toArray
      val batch = Seq((990001L, v100, 0))
      input.addData(batch)
      q.processAllAvailable()
      val rows = got.toArray(Array.empty[(Long, Long, Double)]).toSet
      assert(rows.nonEmpty)
      assert(rows.forall(t => allowedIds(t._2)),
        s"a disallowed neighbor leaked into the stream: $rows")
      val want = graft.operators.Similarity.filteredServe(
          batch.toDF("vec_id", "embedding", "label"), emb, index,
          allowed, k = 5)
        .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
          r.getLong(r.fieldIndex("neighbor_id")),
          r.getDouble(r.fieldIndex("cos")))).toSet
      assert(rows == want,
        s"stream must equal the batch filtered serve:\n$rows\n$want")
    } finally q.stop()
  }

  test("ivfAdcVsIndex serves streaming queries from the stored index") {
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = graft.operators.Similarity.ivfAdcIndex(emb)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Double)]()
    val input = MemoryStream[(Long, Array[Float], Int)]
    val q = StreamSimilarity.ivfAdcVsIndex(
      input.toDF().toDF("vec_id", "embedding", "label"), emb, index,
      sink = df => df.collect().foreach(r => got.add((
        r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("neighbor_id")),
        r.getDouble(r.fieldIndex("cos"))))), k = 5)
    try {
      // serve the vector of corpus id 100 under a fresh query id: the
      // stored duplicate must come back at cosine 1
      val v100 = emb.filter("vec_id = 100").collect().head
        .getSeq[Float](1).toArray
      val batch = Seq((990001L, v100, 0))
      input.addData(batch)
      q.processAllAvailable()
      val rows = got.toArray(Array.empty[(Long, Long, Double)]).toSet
      val want = graft.operators.Similarity.ivfAdcServe(
          batch.toDF("vec_id", "embedding", "label"), emb, index, k = 5)
        .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
          r.getLong(r.fieldIndex("neighbor_id")),
          r.getDouble(r.fieldIndex("cos")))).toSet
      assert(rows == want, s"stream must equal the batch serve:\n$rows\n$want")
      assert(rows.exists(t => t._2 == 100L && math.abs(t._3 - 1.0) < 1e-12),
        s"stored duplicate found at cosine 1: $rows")
    } finally q.stop()
  }

  test("cellChurnGauge: per-batch stored-vs-fresh assignment churn, " +
    "hand-checked and equal to the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    def axis(i: Int): Seq[Double] =
      Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
    // build N's centroids: cell 1 along e0, cell 2 along e1; build N+1
    // SWAPS them — every vector's nearest cell flips
    val centOld = Seq((1L, axis(0), 1.0), (2L, axis(1), 1.0))
      .toDF("cent_id", "cx", "cnrm")
    val centNew = Seq((1L, axis(1), 1.0), (2L, axis(0), 1.0))
      .toDF("cent_id", "cx", "cnrm")
    // build N's stored assignments (consistent with centOld)
    val storedCells = Seq((1L, 1L), (2L, 2L)).toDF("vec_id", "cent_id")

    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long, Long, Double, Long)]()
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamSimilarity.cellChurnGauge(
      input.toDF().toDF("vec_id", "embedding"), storedCells, centNew,
      df => df.collect().foreach(r => got.add((
        r.getLong(r.fieldIndex("n_rows")),
        r.getLong(r.fieldIndex("n_known")),
        r.getLong(r.fieldIndex("n_unknown")),
        r.getLong(r.fieldIndex("n_moved")),
        r.getDouble(r.fieldIndex("moved_frac")),
        r.getLong(r.fieldIndex("batch_id"))))))
    try {
      // arrivals: vec 1 (e0, stored cell 1 → fresh cell 2 under the
      // swap), vec 2 (e1, stored 2 → fresh 1), vec 99 (no stored row)
      input.addData(Seq((1L, vec(0 -> 1f)), (2L, vec(1 -> 1f)),
        (99L, vec(0 -> 1f))))
      q.processAllAvailable()
      input.addData(Seq((1L, vec(0 -> 1f))))
      q.processAllAvailable()
    } finally q.stop()
    val rows = got
      .toArray(Array.empty[(Long, Long, Long, Long, Double, Long)]).toSet
    assert(rows == Set(
      (3L, 2L, 1L, 2L, 1.0, 0L),
      (1L, 1L, 0L, 1L, 1.0, 1L)), s"$rows")
    // batch twin on the same frames agrees
    val twin = graft.operators.Similarity.batchCellChurn(
        Seq((1L, vec(0 -> 1f)), (2L, vec(1 -> 1f)), (99L, vec(0 -> 1f)))
          .toDF("vec_id", "embedding"), storedCells, centNew)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(twin == Seq((3L, 2L, 1L, 2L, 1.0)), s"$twin")
    // same-build assignment (centOld) moves nothing
    val calm = graft.operators.Similarity.batchCellChurn(
        Seq((1L, vec(0 -> 1f)), (2L, vec(1 -> 1f)))
          .toDF("vec_id", "embedding"), storedCells, centOld)
      .collect().map(r => (r.getLong(3), r.getDouble(4))).toSeq
    assert(calm == Seq((0L, 0.0)), s"$calm")
    // empty batch → empty report
    assert(graft.operators.Similarity.batchCellChurn(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      storedCells, centOld).collect().isEmpty)
  }
}
