package graft.connectors

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC connector — replaces the reference's hand-rolled `JdbcRDD` +
  * ResultSet-schema-inference path (reference:
  * data-process/spark-process/src/main/scala/hive/JdbcHelper.scala:46-73,
  * 79-99, 119-133) with `spark.read.jdbc`, which already does schema
  * inference, predicate pushdown, and partitioned parallel reads.
  */
object Jdbc {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Whole table (or `(subquery) alias`). */
  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Partitioned parallel read on a numeric column — the scale path the
    * reference's single-threaded `hiveToDF` lacked (JdbcHelper.scala:79-99):
    * numPartitions concurrent connections, each reading one stride.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(options))

  /** Register a JDBC table as a temp view
    * (reference jdbcToView: JdbcHelper.scala:124-133).
    */
  def toView(spark: SparkSession, url: String, table: String, viewName: String,
      options: Map[String, String] = Map.empty): Unit =
    read(spark, url, table, options).createOrReplaceTempView(viewName)

  /** Driver-side DDL/DML (reference execUpdate: JdbcHelper.scala:27-44).
    * Returns the update count (0 for DDL).
    */
  def execUpdate(url: String, sql: String,
      options: Map[String, String] = Map.empty): Int = {
    val conn = DriverManager.getConnection(url, props(options))
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql) finally st.close()
    } finally conn.close()
  }

  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      options: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode).jdbc(url, table, props(options))
}
