package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight diagnostics for shuffle-heavy plans. At 100 TB the difference
  * between a join that finishes and one that stalls is usually ONE skewed
  * key; measuring the key distribution BEFORE the big job is how the salt
  * factor / AQE skew thresholds get chosen instead of guessed.
  */
object Diagnostics {

  /** Exact per-key skew report for a prospective join/groupBy key: the
    * `topN` heaviest keys with row counts, their share of the table, and
    * the salting factor that would split each key's rows into
    * ~average-partition-sized buckets given `partitions` reducers
    * (`ceil(cnt · partitions / total)` — 1 means "no salting needed").
    *
    * One partial-aggregated groupBy over the key (the same shuffle the
    * prospective join would pay on its small side) plus a driver-sized
    * top-N. Use [[graft.functions.HeavyHitters]] instead when even one
    * exact pass is too much and an approximate answer steers the decision.
    * Output: (key, cnt, share, salt_factor), heaviest first.
    */
  def skewReport(df: DataFrame, key: Column, topN: Int = 20,
      partitions: Int = 32): DataFrame = {
    require(topN > 0 && partitions > 0, s"topN=$topN partitions=$partitions")
    val counts = df.select(key.cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("total"))))
      .select(col("key"), col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double")).as("share"),
        // integer ceil-division keeps the oracle exact (no double ceil)
        expr(s"(cnt * $partitions + total - 1) div total").as("salt_factor"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
  }
}
