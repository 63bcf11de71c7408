package graft.tools

import org.apache.spark.sql.functions._

/** Smoke test of the Hive-metastore-backed catalog — the reference's
  * deployment mode (reference: process/Configs.scala:65
  * `spark.sql.catalogImplementation=hive`) — against the embedded
  * Derby metastore that Spark's bundled Hive jars provide. This must run
  * in a FRESH JVM (`sbt "runMain graft.tools.HiveCatalogSmoke"`):
  * `spark.sql.catalogImplementation` is static conf, so the shared test
  * session cannot switch catalogs mid-suite — which is why this is a
  * main, not a ScalaTest suite.
  *
  * Proves, under the hive catalog:
  *  1. bucketed `saveAsTable` + metastore round-trip (bucket spec kept);
  *  2. SQL DDL + `insertInto`;
  *  3. the engine's stage-and-rename bucketed state swap
  *     (`Dedup.saveFingerprints` twice — the second save READS the
  *     previous generation through the same table name it replaces,
  *     exercising `ALTER TABLE ... RENAME` semantics on the metastore);
  *  4. co-bucketed join planning without a shuffle on either side.
  *
  * Exits non-zero on any failed check; prints HIVE_CATALOG_SMOKE_OK.
  */
object HiveCatalogSmoke {
  def main(args: Array[String]): Unit = {
    val scratch = java.nio.file.Files.createTempDirectory("graft-hive-smoke")
    val wh = scratch.resolve("warehouse").toString
    val metastore = scratch.resolve("metastore_db").toString
    val spark = graft.GraftSession.builder("hive-smoke", enableHive = true)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastore;create=true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)

    def check(cond: Boolean, what: String): Unit =
      if (!cond) { System.err.println(s"FAIL: $what"); spark.stop(); sys.exit(1) }

    check(spark.conf.get("spark.sql.catalogImplementation") == "hive",
      "session is not hive-catalog-backed")

    // 1. bucketed managed table + metastore round-trip
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
    df.write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .saveAsTable("smoke_bucketed")
    check(spark.catalog.tableExists("smoke_bucketed"), "table not in metastore")
    check(spark.table("smoke_bucketed").count() == 1000L, "bucketed count")
    // match the Num Buckets ROW's value specifically — a bare
    // contains("4") is vacuous (paths/stats contain digits regardless)
    val bucketRow = spark.sql("DESCRIBE EXTENDED smoke_bucketed").collect()
      .find(r => String.valueOf(r.get(0)).trim == "Num Buckets")
      .map(r => String.valueOf(r.get(1)).trim)
    check(bucketRow.contains("4"),
      s"bucket spec lost in metastore round-trip: Num Buckets=$bucketRow")

    // 2. SQL DDL + insertInto
    spark.sql("CREATE TABLE smoke_ins (id BIGINT, k BIGINT) USING parquet")
    df.write.insertInto("smoke_ins")
    check(spark.table("smoke_ins").count() == 1000L, "insertInto count")

    // 3. stage-and-rename state swap, twice: the second save's plan READS
    // the table it replaces (steady-state incremental-dedup cadence)
    val fps1 = spark.range(0, 100).select(col("id").as("fp"))
    graft.operators.Dedup.saveFingerprints(fps1, "smoke_state", buckets = 4)
    val gen1 = graft.operators.Dedup.loadFingerprints(spark, "smoke_state")
    check(gen1.count() == 100L, "state gen1 count")
    val fps2 = gen1.unionAll(
      spark.range(100, 150).select(col("id").as("fp")))
    graft.operators.Dedup.saveFingerprints(fps2, "smoke_state", buckets = 4)
    check(graft.operators.Dedup.loadFingerprints(spark, "smoke_state")
      .count() == 150L, "state gen2 count after rename swap")

    // 4. co-bucketed join: no Exchange on either side (broadcast disabled
    // so the planner must rely on the metastore-reported bucketing; with
    // the threshold on, a table this small legitimately broadcasts)
    df.write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .saveAsTable("smoke_bucketed_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("smoke_bucketed")
      .join(spark.table("smoke_bucketed_b"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    check(!plan.contains("Exchange"),
      s"co-bucketed join still shuffles:\n$plan")
    check(joined.count() > 0, "co-bucketed join result")

    System.out.println("HIVE_CATALOG_SMOKE_OK")
    spark.stop()
    sys.exit(0)
  }
}
