package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join lever this library leans on at
  * 100 TB: two fact tables written bucketed (and sorted) by their join
  * key join WITHOUT any shuffle exchange, because the bucket layout IS
  * the partitioning the join needs. On a 1000-executor cluster this
  * turns the nightly fact↔fact join from a full two-sided shuffle of
  * the corpus into a per-bucket merge — the physical contract bucketing
  * exists to buy, pinned here at the plan level the same way
  * PlanQualitySpec pins pushdown and broadcast shapes.
  *
  * (Spec-level rather than a driver query: the correctness oracle reads
  * bare parquet paths, while bucketing lives in catalog table metadata —
  * the RESULT is identical to the plain join, which is asserted too.) */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-join-key tables sort-merge-join with zero exchanges " +
    "and match the plain join row-for-row") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val li = Seq.tabulate(200)(i =>
      (i.toLong % 40, s"item$i", (i % 7).toDouble))
      .toDF("l_orderkey", "name", "qty")
    val ord = Seq.tabulate(40)(i => (i.toLong, s"cust${i % 5}"))
      .toDF("o_orderkey", "cust")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // one writer task → exactly one file per bucket, so the sorted-scan
      // path stays eligible and the read side needs no Sort either
      li.repartition(1).write.format("parquet")
        .option("path", s"$wh/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("graft_li_bucketed")
      ord.repartition(1).write.format("parquet")
        .option("path", s"$wh/ord")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_ord_bucketed")
      // force the shuffle-join path (no broadcast) and freeze the plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("name"), col("qty"), col("cust"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // the layout is an optimization, never a semantics change
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("name"), col("qty"), col("cust"))
        .collect().map(_.toSeq).toSet
      assert(j.collect().map(_.toSeq).toSet == plain,
        "bucketed join drifted from the plain join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }
}
