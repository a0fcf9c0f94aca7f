package graft.operators

import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("createViews exposes the star schema and graft functions to SQL") {
    // events.ts is TIMESTAMP(NANOS); Verify/Bench sessions set this at
    // build time, the shared test session sets it here (runtime-settable)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.createViews(spark, "/root/testdata/sf0.001")
    val top = spark.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3""".stripMargin)
      .collect()
    assert(top.length == 3)
    assert(top.forall(_.getLong(1) > 0))
    // the registered native vector functions resolve by name in SQL
    val d = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
  }

  test("events loader normalizes every ts physical form to TimestampType") {
    // The data generator has shipped events.ts as TIMESTAMP(NANOS) (read
    // as long under nanosAsLong) AND as naive TIMESTAMP(MICROS) (read as
    // TIMESTAMP_NTZ) across rounds; a type change silently broke
    // unix_millis downstream in r7. Pin: whatever form lands on disk,
    // Tables.events yields session-zone TimestampType with the same
    // instant.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val micros = 1700000000000000L // 2023-11-14T22:13:20Z
    def write(df: org.apache.spark.sql.DataFrame): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // long nanos (the nanosAsLong reading of TIMESTAMP(NANOS))
    val asLong = write(spark.range(1).select(col("id").as("event_id"),
      lit(micros * 1000L).as("ts")))
    // naive micros -> Spark writes/reads TIMESTAMP_NTZ
    val asNtz = write(spark.range(1).select(col("id").as("event_id"),
      timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts")))
    // session-zone timestamp (the already-normal form)
    val asLtz = write(spark.range(1).select(col("id").as("event_id"),
      timestamp_micros(lit(micros)).as("ts")))
    for (dir <- Seq(asLong, asNtz, asLtz)) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType, s"dir=$dir")
      val out = ev.select(unix_micros(col("ts"))).head().getLong(0)
      assert(out == micros, s"instant preserved for $dir")
    }
  }
}
