package graft.connectors

import org.apache.spark.sql.SaveMode
import graft.SparkSpec

class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftspec;create=true"

  private def reset(table: String): Unit =
    try Jdbc.execUpdate(url, s"DROP TABLE $table") catch { case _: Exception => () }

  test("write + read roundtrip preserves rows and schema") {
    reset("t1")
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.mode(SaveMode.Overwrite)
      .jdbc(url, "t1", new java.util.Properties())
    val back = Jdbc.read(spark, url, "t1").as[(Int, String)].collect().sortBy(_._1)
    assert(back === Array((1, "a"), (2, "b")))
  }

  test("execUpdate runs DDL/DML and reports update counts") {
    reset("t2")
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v").write
      .jdbc(url, "t2", new java.util.Properties())
    // Spark's JDBC writer creates case-sensitive quoted columns in Derby
    assert(Jdbc.execUpdate(url, """UPDATE t2 SET "v" = 'q' WHERE "id" >= 2""") === 2)
    val vs = Jdbc.read(spark, url, "t2").as[(Int, String)].collect().sortBy(_._1)
    assert(vs === Array((1, "x"), (2, "q"), (3, "q")))
  }

  test("readPartitioned splits the table across partition strides") {
    reset("t3")
    (1 to 100).map(i => (i, s"v$i")).toDF("id", "v").write
      .jdbc(url, "t3", new java.util.Properties())
    val df = Jdbc.readPartitioned(spark, url, "t3", "id", 1, 101, 5)
    assert(df.rdd.getNumPartitions === 5)
    assert(df.count() === 100)
  }

  test("toView registers a queryable temp view") {
    reset("t4")
    Seq((10, "hello")).toDF("id", "v").write.jdbc(url, "t4", new java.util.Properties())
    Jdbc.toView(spark, url, "t4", "jdbc_view_t4")
    assert(spark.sql("SELECT v FROM jdbc_view_t4 WHERE id = 10").as[String].head() === "hello")
  }

  test("filter pushdown reaches the JDBC source") {
    reset("t5")
    (1 to 50).map(i => (i, i * 2)).toDF("id", "v").write
      .jdbc(url, "t5", new java.util.Properties())
    val df = Jdbc.read(spark, url, "t5").filter($"id" > 40)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,40)"), plan)
    assert(df.count() === 10)
  }
}
