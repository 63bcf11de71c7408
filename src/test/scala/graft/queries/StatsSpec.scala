package graft.queries

import graft.SparkSpec

/** Table/column statistics + CBO wiring (SURVEY §4: the reference enabled
  * `hive.cbo.enable` + `hive.stats.*`; here ANALYZE TABLE feeds Catalyst's
  * cost-based optimizer and broadcast decisions at scale).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("ANALYZE TABLE computes row/size and column stats visible to the catalog") {
    spark.sql("DROP TABLE IF EXISTS stats_t")
    (1 to 1000).map(i => (i.toLong, s"name$i", i % 7)).toDF("id", "name", "grp")
      .write.saveAsTable("stats_t")
    spark.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS FOR COLUMNS id, grp")

    val described = spark.sql("DESCRIBE EXTENDED stats_t").collect()
      .map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(described.contains("Statistics"), described)
    assert(described.contains("1000 rows"), described)

    val idStats = spark.sql("DESCRIBE EXTENDED stats_t id").collect()
      .map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(idStats.contains("distinct_count"), idStats)
    assert(idStats.contains("max=1000"), idStats)

    // with CBO on (reference: hive.cbo.enable), the optimizer sees the
    // computed rowCount on the logical plan
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val rowCount = spark.table("stats_t").queryExecution.optimizedPlan
        .stats.rowCount
      assert(rowCount.contains(BigInt(1000)))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
