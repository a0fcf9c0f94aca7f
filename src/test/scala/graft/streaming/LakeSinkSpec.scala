package graft.streaming

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

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
}
