package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation — the curation step between raw
  * human/model comparison logs and a reward-model training set: collapse
  * (winner, loser) comparison rows into a per-item record with a
  * confidence-aware ranking score. The Wilson lower bound (not the raw
  * win-rate) is the ranking key production systems use, because it
  * penalizes small samples: an item with 2/2 wins must rank below one
  * with 90/100 — a raw-rate sort would invert that.
  *
  * Everything here is deterministic and oracle-replayable: counts are
  * exact integers; the rate and Wilson chain are fixed-order two-operand
  * IEEE arithmetic (sqrt is correctly rounded).
  */
object Preference {

  /** Per-item preference record over a comparison-pair table: each input
    * row says `winner` beat `loser` once. Output: one row per item that
    * appears in any comparison — (item, wins, losses, n, win_rate,
    * wilson_lb) — where `wilson_lb` is the lower bound of the Wilson
    * score interval at confidence `z` (1.96 ≈ 95%):
    *
    *   lb = (p̂ + z²/2n − z·sqrt((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)
    *
    * computed as a FIXED left-to-right chain so an ANSI-SQL oracle
    * replays it bit-for-bit.
    *
    * Scale shape: each comparison becomes exactly two (item, bit) rows;
    * one partial-aggregated groupBy(item) collapses them — comparisons
    * never shuffle wider than 16 bytes/row, and the output is
    * |items|-sized. No window, no driver collect. Ties must be resolved
    * upstream (emit no row, or one row each way for a split ballot).
    */
  def winRates(pairs: DataFrame, winner: Column, loser: Column,
      z: Double = 1.96): DataFrame =
    ratesFromCounts(ballotCounts(pairs, winner, loser), z)

  /** The count half of [[winRates]]: ballots → (item, wins, n). Exposed
    * so incremental consumers ([[graft.streaming.Streams.PreferenceIngest]])
    * can FOLD counts across batches — counts are the sufficient statistic
    * (plain sums), the rate/Wilson chain is derived per read.
    */
  def ballotCounts(pairs: DataFrame, winner: Column,
      loser: Column): DataFrame =
    pairs.select(winner.as("item"), lit(1L).as("w"))
      .unionByName(pairs.select(loser.as("item"), lit(0L).as("w")))
      .groupBy(col("item"))
      .agg(sum(col("w")).as("wins"), count(lit(1)).as("n"))

  /** The derivation half of [[winRates]] over a (item, wins, n) count
    * table — map-only, no shuffle.
    */
  def ratesFromCounts(counts: DataFrame, z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val zz = lit(z * z)
    val base = counts.select(col("item"), col("wins"),
      (col("n") - col("wins")).as("losses"), col("n"),
      (col("wins").cast("double") / col("n").cast("double")).as("win_rate"))
    val nD = col("n").cast("double")
    val p = col("win_rate")
    // fixed-order chain: center, then margin, then the denominator
    val center = p + zz / (lit(2.0) * nD)
    val margin = lit(z) * sqrt((p * (lit(1.0) - p) + zz / (lit(4.0) * nD)) / nD)
    val denom = lit(1.0) + zz / nD
    base.withColumn("wilson_lb", (center - margin) / denom)
  }
}
