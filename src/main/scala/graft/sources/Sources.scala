package graft.sources

import graft.core.GraftConf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
import org.apache.spark.sql.types.StructType

/** Source facade: the batch and streaming entry points of the library in
  * one place, plus the session configuration we recommend for production
  * streams.
  */
object Sources {

  /** Batch parquet table (the driver's star schema and any other parquet
    * directory). Predicate pushdown/column pruning come from the parquet
    * datasource; at cluster scale the same call reads partitioned or
    * bucketed table layouts unchanged. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Streaming Kafka source per GraftConf — delegates to the pipeline
    * module (S1). */
  def kafka(spark: SparkSession, conf: GraftConf): DataFrame =
    graft.streaming.GraftStream.kafkaSource(spark, conf)

  /** JSON-lines source with a REQUIRED schema: schema inference reads the
    * whole dataset once before the real scan — at 100 TB that doubles the
    * job. Malformed lines follow `mode` (PERMISSIVE keeps them as nulls
    * with `_corrupt_record` when the schema carries that column — the
    * batch cousin of the never-throw serde contract). */
  def json(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  /** CSV source with a REQUIRED schema — same no-inference rationale as
    * [[json]] (CSV inference also scans everything to type columns). */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString).option("mode", mode).csv(path)

  /** Deterministic-rate synthetic stream — useful for soak tests of the
    * pipelines without Kafka. */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** Session configs we recommend for stateful production streams — the
    * Spark analog of the reference's opinionated KafkaPropertiesBuilder
    * (KafkaPropertiesBuilder.java:35-107 bundles "safe by default" Kafka
    * settings; these are the "safe by default" Spark settings):
    *
    *  - RocksDB state store: G1-style per-key state beyond heap size,
    *    matching the reference's persistent store choice
    *    (TopologyBuilder.java:66-69);
    *  - changelog checkpointing: incremental state checkpoints (the
    *    changelog-topic analog);
    *  - AQE on: runtime coalescing and skew-join splitting;
    *  - shuffle partitions sized to the cluster, not the 200 default.
    */
  def recommendedConfigs(parallelism: Int): Map[String, String] =
    // the same RocksDB pair GraftConf.useRocksDbStateStore applies at
    // pipeline start — one definition, so flag and recommendation can't
    // drift
    graft.streaming.GraftStream.RocksDbStateStoreConfigs ++ Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.shuffle.partitions" -> parallelism.toString,
    "spark.sql.session.timeZone" -> "UTC")

  /** Apply [[recommendedConfigs]] to a builder. */
  def configure(
      builder: SparkSession.Builder,
      parallelism: Int): SparkSession.Builder =
    recommendedConfigs(parallelism).foldLeft(builder) {
      case (b, (k, v)) => b.config(k, v)
    }

  /** Write `df` as a bucketed, bucket-sorted parquet table at `path`,
    * registered as `table` in the session catalog.
    *
    * Bucketing is the pre-shuffle: the one-time write partitions rows by
    * `hash(key) mod buckets`, so every later equi-join or aggregation on
    * `key` between tables bucketed the same way runs with NO exchange —
    * at 100 TB that turns the nightly fact⋈fact join from the dominant
    * shuffle into a zipped per-bucket merge. `sortBy` additionally lets
    * the join skip its sort. The bucket count is a layout contract shared
    * by all co-bucketed tables; size it to cluster cores × a small factor
    * (buckets are also the join's parallelism). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Read a bucketed table back by catalog name (the bucket layout only
    * survives through the catalog, not through `read.parquet(path)`). */
  def bucketedTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Directory-partitioned lake write with DYNAMIC overwrite: only the
    * partition directories present in `df` are replaced; every other
    * partition survives untouched. This is the idempotent backfill
    * primitive — re-running yesterday's job rewrites yesterday's
    * directories only, where static overwrite mode would wipe the whole
    * table root. Partition columns become directory keys, so downstream
    * readers get partition pruning for free. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: String*): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Read a parquet directory whose files carry EVOLVED schemas, unioning
    * the fields (absent columns read as null). Schema merge costs a footer
    * read per file, so it is opt-in here rather than a session default. */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Compact a parquet directory's small files into ~`targetBytes` outputs
    * at `outDir`, returning the file count written. Streaming sinks and
    * over-parallel writers leave thousands of tiny files whose per-file
    * open/footer cost dominates later scans; nightly compaction is the
    * standard lake-maintenance fix. Sizing comes from the ACTUAL on-disk
    * byte total (filesystem metadata, no data read), and the rewrite is one
    * round-robin repartition — at 100 TB this runs per partition directory
    * (date=.../lang=...), each an independent job sized to its own bytes.
    * Writes to a fresh directory rather than swapping in place: the swap is
    * the table-format layer's job (atomic commit), not the engine's. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Morton/Z-order value of two non-negative int columns: the low `bits`
    * bits of `a` and `b` interleaved (a even positions, b odd) — one long
    * whose ordering clusters rows that are close in BOTH dimensions. Pure
    * integer bit arithmetic (shift/and/or), mirrored exactly by the oracle
    * SQL. */
  def zvalue(a: Column, b: Column, bits: Int = 10): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Z-order layout write: cluster the table on the Morton value of two
    * query dimensions so parquet row-group/file min-max stats prune scans
    * that filter on EITHER dimension — the multi-column answer to
    * single-column sort layouts. `repartitionByRange` on the z-value gives
    * disjoint z-ranges per file; the within-partition sort tightens each
    * row group's stats. At 100 TB this is the nightly layout job that turns
    * needle queries from full scans into a handful of file reads. */
  def zorderWrite(df: DataFrame, path: String, a: Column, b: Column,
      files: Int = 16, bits: Int = 10): Unit =
    df.withColumn("zv", zvalue(a, b, bits))
      .repartitionByRange(files, org.apache.spark.sql.functions.col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode("overwrite").parquet(path)
}
