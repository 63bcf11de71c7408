package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every implemented operator's query + oracle from the
  * graft.queries.* registries; wraps each query so the (driver-built)
  * session gets the engine's session contract (LAST_WIN map dedup, UTC,
  * registered functions) before the plan is built.
  */
object SparkEntry {

  def allQueries: Seq[Q] =
    graft.queries.Relational.all ++
      graft.queries.Pipeline.all ++
      graft.queries.Connectors.all ++
      graft.queries.Functions.all ++
      graft.queries.Engine.all ++
      graft.queries.StreamGates.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    graft.queries.Relational.q02RevenueByNation(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        GraftSession.configure(s)
        q.fn(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Names of the ENGINE-LIFECYCLE entries (`Q.lifecycle = true` at the
    * registration site): each run prices a Structured Streaming
    * start/stop/recover cycle or a persisted-artifact save + cold-reload
    * audit. Bench reports them as a separate cohort so steady-query
    * drift detection stays sharp.
    */
  def lifecycleQueries: Set[String] =
    allQueries.filter(_.lifecycle).map(_.name).toSet
}
