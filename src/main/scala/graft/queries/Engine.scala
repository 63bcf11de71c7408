package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ScriptCompiler
import graft.etl.SqlRunner
import graft.streaming.Streams

/** Engine-layer queries: the SQL script runner (Beeline replacement), hot
  * script compilation (interpreter replacement), and Structured Streaming
  * transforms — each oracle-checked on the driver tables.
  */
object Engine {

  /** Multi-statement SQL script through SqlRunner: comments, temp-view DDL,
    * a TEMPORARY MACRO (rewritten to a registered function), and a final
    * SELECT whose DataFrame is the query result.
    */
  def etlSqlScript(s: SparkSession, dir: String): DataFrame = {
    val script =
      s"""-- pricing script (reference README.md:173-219 shape)
         |# hash comments are comments too
         |CREATE TEMPORARY MACRO disc_price(p DOUBLE, d DOUBLE) p * (1 - d);
         |CREATE OR REPLACE TEMPORARY VIEW graft_li AS
         |  SELECT * FROM parquet.`$dir/lineitem.parquet`;
         |SELECT l_returnflag,
         |  CAST(SUM(CAST(disc_price(l_extendedprice, l_discount) AS DECIMAL(14,4))) AS DOUBLE) AS rev,
         |  COUNT(*) AS n
         |FROM graft_li
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag;
         |""".stripMargin
    new SqlRunner(s).runScriptStrict(script).get
  }

  val etlSqlScriptOracle: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(14,4))) AS DOUBLE) AS rev,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Hot-compiled script job (ToolBox ≈ the reference's IMain): the script
    * text itself declares the plan; the engine compiles and invokes it.
    */
  def scriptCompiled(s: SparkSession, dir: String): DataFrame = {
    val script =
      s"""(spark: SparkSession) => {
         |  val o = spark.read.parquet("$dir/orders.parquet")
         |  o.groupBy(col("o_orderstatus"))
         |    .agg(count(lit(1)).as("n"),
         |      max(col("o_totalprice")).as("max_price"))
         |    .orderBy(col("o_orderstatus"))
         |}
         |""".stripMargin
    ScriptCompiler.compileTask(script)(s).asInstanceOf[DataFrame]
  }

  val scriptCompiledOracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n, MAX(o_totalprice) AS max_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  private val streamSeq = new AtomicInteger(0)

  /** Structured Streaming end-to-end: file-source stream over events,
    * watermarked 1-day tumbling window counts per event type, drained to a
    * memory sink in complete mode (deterministic for finite input), result
    * read back as a batch table.
    */
  def streamingWindowCounts(s: SparkSession, dir: String): DataFrame = {
    val batch = T(s, dir, "events")
    val stream = Streams.withEventTime(
      Streams.parquetStream(s, dir, batch, glob = Some("events.parquet")))
    val agg = Streams.windowedCounts(stream, col("event_time"),
      col("event_type"), "1 day", "1 hour")
    val name = s"graft_stream_${streamSeq.incrementAndGet()}"
    Streams.drainToMemory(agg, name)
    s.table(name)
      .select(col("w.start").cast("date").as("day"), col("event_type"), col("n"))
      .orderBy(col("day"), col("event_type"))
  }

  val streamingWindowCountsOracle: String =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, COUNT(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  /** Native session_window (30-minute gap) per user — the batch run of the
    * streaming sessionizer; oracle rebuilds sessions with lag/cumsum logic.
    */
  def sessionWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Streams.withEventTime(T(s, dir, "events"))
    Streams.sessionCounts(ev, col("event_time"), col("user_id"), "30 minutes",
        watermark = "0 seconds")
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n"))
      .orderBy(col("user_id"), col("start_us"))
  }

  val sessionWindowOracle: String =
    """WITH t AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
      |), sess AS (
      |  SELECT user_id, us,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM t)
      |SELECT user_id, MIN(us) AS start_us,
      |  MAX(us) + 1800 * 1000000 AS end_us, COUNT(*) AS n
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin

  val all: Seq[Q] = Seq(
    Q("etl_sql_script", etlSqlScript, Some(etlSqlScriptOracle)),
    Q("etl_script_compiled", scriptCompiled, Some(scriptCompiledOracle)),
    Q("streaming_window_counts", streamingWindowCounts, Some(streamingWindowCountsOracle)),
    Q("session_window", sessionWindow, Some(sessionWindowOracle))
  )
}
