package graft.engine

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Script-source + execution-journal records
  * (reference: data-process/spark-process/src/main/scala/records/ScriptSrc.scala:11-25,
  * records/ExecutionRecord.scala:10-21 — JDO entities persisted to MySQL).
  * Here they are plain case classes persisted as a parquet table: the
  * journal is itself queryable data (the reference's own framing, SURVEY
  * §1.1 "scripts as data"), and any JDBC sink can be swapped in via
  * `df.write.jdbc`.
  */
final case class ScriptSrc(
    createdAt: Long, name: String, modifiedAt: Long, path: String,
    scriptType: String, description: String, content: String)

final case class ExecutionRecord(
    path: String, startedAt: Long, finishedAt: Long, result: String, status: String)

/** Parquet-backed journal: append-only saves, last-execution-by-path lookup
  * (reference: records/RecordDao.scala:66-90, `getLastExecution` at 85-90).
  */
class Journal(spark: SparkSession, dir: String) {
  import spark.implicits._

  def save(rec: ExecutionRecord): Unit =
    Seq(rec).toDS().write.mode(SaveMode.Append).parquet(dir)

  private def table() =
    try spark.read.parquet(dir)
    catch { case _: Exception => spark.emptyDataset[ExecutionRecord].toDF() }

  def lastExecution(path: String): Option[ExecutionRecord] =
    table().filter(col("path") === path)
      .orderBy(col("startedAt").desc)
      .limit(1)
      .as[ExecutionRecord]
      .collect().headOption

  def history(path: String): Seq[ExecutionRecord] =
    table().filter(col("path") === path)
      .orderBy(col("startedAt"))
      .as[ExecutionRecord].collect().toSeq
}
