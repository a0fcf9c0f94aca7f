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
}
