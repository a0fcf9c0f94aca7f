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
}
