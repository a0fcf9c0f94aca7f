package graft.sources

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("parquet source reads the star schema with pruned scans") {
    val df = Sources.parquet(spark, "/root/testdata/sf0.001/region.parquet")
    assert(df.count() == 5)
    val plan = df.select("r_name").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<r_name:string>"),
      "projection must prune to the selected column")
  }

  test("recommendedConfigs pin RocksDB state store and cluster-sized shuffles") {
    val c = Sources.recommendedConfigs(64)
    assert(c("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    assert(c("spark.sql.shuffle.partitions") == "64")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
  }

  test("rate source produces a streaming frame") {
    val df = Sources.rate(spark, 1)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.contains("value"))
  }

  test("json/csv sources read with explicit schemas, malformed rows kept") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-src")
    val jsonFile = dir.resolve("d.jsonl")
    java.nio.file.Files.writeString(jsonFile,
      """{"id": 1, "name": "a"}
        |not json at all
        |{"id": 3, "name": "c"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    // Spark refuses queries touching ONLY _corrupt_record on raw scans;
    // materialize all columns first (the documented cache/save pattern)
    val rows = Sources.json(spark, jsonFile.toString, schema).collect()
    assert(rows.length == 3, "malformed line kept, not dropped")
    assert(rows.count(!_.isNullAt(2)) == 1)

    val csvFile = dir.resolve("d.csv")
    java.nio.file.Files.writeString(csvFile, "id,name\n1,a\n2,b\n")
    val c = Sources.csv(spark, csvFile.toString,
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))))
    assert(c.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("compact rewrites a many-file directory into size-targeted files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
    val in = s"$dir/in"
    val out = s"$dir/out"
    // 64 partitions → 64 tiny files
    (0L until 2000L).toDF("id").repartition(64).write.parquet(in)
    val inFiles = new java.io.File(in).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(inFiles == 64)
    val n = Sources.compact(spark, in, out, targetBytes = 16L * 1024)
    val outFiles = new java.io.File(out).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == n && n < 16, s"expected few files, got $n")
    // data survives the rewrite intact
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq ==
      (0L until 2000L))
  }

  test("writePartitioned replaces only the partitions present in the frame") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dynpart")
    val path = s"$dir/t"
    Sources.writePartitioned(
      Seq((1L, "d1"), (2L, "d2")).toDF("id", "day"), path, "day")
    // backfill day d2 only — d1 must survive, d2 must be replaced
    Sources.writePartitioned(
      Seq((99L, "d2")).toDF("id", "day"), path, "day")
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "d1"), (99L, "d2")))
  }

  test("parquetMerged unions evolved file schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-merge")
    val path = s"$dir/t"
    Seq(1L, 2L).toDF("id").write.parquet(s"$path/v=1")
    Seq((3L, "x")).toDF("id", "extra").write.parquet(s"$path/v=2")
    val merged = Sources.parquetMerged(spark, path)
    assert(merged.columns.toSet == Set("id", "extra", "v"))
    val byId = merged.collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        Option(r.get(r.fieldIndex("extra")))).toMap
    assert(byId(1L).isEmpty && byId(3L).contains("x"))
  }

  test("zvalue interleaves bits; zorderWrite clusters both dimensions per file") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // bit-interleave unit check: a=0b101 (evens), b=0b011 (odds)
    //   → z = 1·1 + 0·4 + 1·16 (a) + 1·2 + 1·8 + 0·32 (b) = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Sources.zvalue(col("a"), col("b")).as("z"))
      .head().getLong(0)
    assert(z == 27L)
    // layout: the full 64×64 grid z-ordered into 16 files. The property a
    // lake reader exploits is file-level min/max pruning on BOTH
    // dimensions: a 16×16 needle rectangle must live in a small handful of
    // files (row-order or single-column-sort layouts smear it across most
    // of them).
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder")
    val grid = (0 until 4096).map(i => (i % 64, i / 64)).toDF("xa", "xb")
    Sources.zorderWrite(grid, s"$dir/z", col("xa"), col("xb"), files = 16)
    val files = new java.io.File(s"$dir/z").listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 16)
    val hit = files.count { f =>
      spark.read.parquet(f.getPath)
        .filter(col("xa") < 16 && col("xb") < 16).limit(1).count() > 0
    }
    // the [0,16)² tile is one contiguous Morton range (z < 256 of 4096) —
    // at most 2 of the 16 range-partitioned files, +1 slack for sampled
    // partition boundaries
    assert(hit <= 3, s"needle tile touched $hit of 16 files")
    // the layout is a permutation of the input, nothing lost
    assert(spark.read.parquet(s"$dir/z").count() == 4096)
  }

  test("co-bucketed tables join and aggregate with no shuffle exchange") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets")
    val left = (0L until 1000L).map(i => (i % 97, i, s"o$i"))
      .toDF("k", "id", "tag")
    val right = (0L until 3000L).map(i => (i % 97, i * 2))
      .toDF("k", "amount")
    Sources.writeBucketed(left, "b_left", s"$dir/left", "k", 4)
    Sources.writeBucketed(right, "b_right", s"$dir/right", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Sources.bucketedTable(spark, "b_left")
        .join(Sources.bucketedTable(spark, "b_right"), Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join+agg must not shuffle:\n$plan")
      // and the result is the same as the plain (shuffled) join
      val expected = left.join(right, Seq("k")).groupBy("k")
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
