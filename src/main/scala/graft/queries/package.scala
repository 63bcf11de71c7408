package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

  /** A named engine query plus (optionally) its ANSI-SQL oracle for the
    * driver's DuckDB compare. `fn(spark, sfDir)` must be self-contained:
    * it reads only the parquet tables under `sfDir` (or deterministic
    * local stand-ins) and returns a deterministic DataFrame whose column
    * names match the oracle's aliases exactly.
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      headline: Boolean = true)

  /** Parquet table loader for the driver-provided test tables. */
  object T {
    def apply(spark: SparkSession, dir: String, name: String): DataFrame =
      spark.read.parquet(s"$dir/$name.parquet")
  }
}
