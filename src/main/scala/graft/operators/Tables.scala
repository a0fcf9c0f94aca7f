package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's star schema (TESTDATA.md). One parquet per table;
  * at cluster scale these would be partitioned/bucketed table reads, so every
  * operator downstream assumes nothing about physical layout beyond what it
  * states (broadcast hints, repartitioning).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever physical type the data generator
    * chose — TIMESTAMP(NANOS) (read as long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which Verify/Bench set)
    * or naive TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ by Spark 4's
    * parquet inference). Every downstream event-time operator assumes one
    * session-zone TimestampType (`unix_millis`, watermarks, and window()
    * all reject or re-interpret NTZ), so the loader normalizes here: long
    * nanos → micros, NTZ → TimestampType (a wall-clock-preserving cast —
    * sessions run UTC, matching the stored epoch values). Round 7 lesson:
    * a generator-side type change surfaced as ONE query silently losing
    * its correctness row, so normalization lives in the loader, not in
    * each operator. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** All star-schema tables by name (events with the timestamp fix-up). */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> (region _), "nation" -> (nation _),
    "customer" -> (customer _), "supplier" -> (supplier _),
    "part" -> (part _), "orders" -> (orders _), "lineitem" -> (lineitem _),
    "events" -> (events _), "documents" -> (documents _),
    "embeddings" -> (embeddings _))

  /** Register every table as a session temp view so ad-hoc `spark.sql`
    * works against the schema — the SQL entry point of the library
    * (Catalyst parses/optimizes/plans for free; SURVEY §2.8). Also
    * registers the graft SQL functions (dot product, cosine). */
  def createViews(s: SparkSession, d: String): Unit = {
    graft.functions.GraftFunctions.register(s)
    all.foreach { case (name, fn) => fn(s, d).createOrReplaceTempView(name) }
  }
}
