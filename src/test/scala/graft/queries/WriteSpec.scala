package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sink-side scale behaviors: partitioned layout + partition pruning on
  * read-back, and sketch accuracy for approximate aggregates.
  */
class WriteSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("partitionBy write prunes partitions on filtered read-back") {
    val out = Files.createTempDirectory("graft-part").toString + "/events"
    spark.read.parquet(s"$dir/events.parquet")
      .write.partitionBy("event_type").parquet(out)
    val back = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = back.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    val n = back.count()
    assert(n > 0)
    // pruned scan reads exactly the one partition directory
    val clickOnly = spark.read.parquet(s"$out/event_type=click").count()
    assert(n === clickOnly)
  }

  test("insertInto appends to a saved table") {
    spark.sql("DROP TABLE IF EXISTS graft_ins")
    Seq((1, "a")).toDF("id", "v").write.saveAsTable("graft_ins")
    Seq((2, "b")).toDF("id", "v").write.insertInto("graft_ins")
    assert(spark.table("graft_ins").count() === 2)
  }

  test("approx_count_distinct within rsd of exact; approx_percentile sane") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val r = o.agg(
      count_distinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("p50"),
      expr("percentile(o_totalprice, 0.5)").as("p50_exact")).head()
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact < 0.05)
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) / r.getDouble(3) < 0.1)
  }

  test("kllQuantiles (lossy regime) tracks exact percentile_disc within " +
      "the rank-error envelope on real data") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    // k=64 forces compaction (orders >> capacity): genuinely approximate
    val r = o.agg(
      graft.functions.QuantileSketch
        .kllQuantiles(64, Seq(0.5, 0.9))(col("o_totalprice")).as("qs"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("e50"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("e90"),
      count(lit(1)).as("n")).head()
    val qs = r.getSeq[Double](0)
    val n = r.getLong(3).toDouble
    assert(n > 1000) // lossy regime actually engaged
    // compare in RANK space (value space has no bound): the estimated
    // value's true rank must sit within ~3/k of the target rank
    def rankOf(v: Double): Double =
      o.filter(col("o_totalprice") <= v).count() / n
    assert(math.abs(rankOf(qs(0)) - 0.5) <= 3.0 / 64, s"p50=${qs(0)}")
    assert(math.abs(rankOf(qs(1)) - 0.9) <= 3.0 / 64, s"p90=${qs(1)}")
  }

  test("GROUPING SETS via SQL (beyond rollup/cube)") {
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("ws_orders")
    val got = spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM ws_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin)
    val rows = got.collect()
    assert(rows.exists(r => !r.isNullAt(0) && r.isNullAt(1)))
    assert(rows.exists(r => r.isNullAt(0) && !r.isNullAt(1)))
  }
}
