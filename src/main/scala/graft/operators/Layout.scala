package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LayoutFunctions

/** Physical-layout operators: how rows are ordered into files decides which
  * files a 100 TB scan can SKIP. Parquet keeps per-row-group min/max stats;
  * a table range-partitioned and sorted by a clustering key turns a
  * predicate on that key into file/row-group pruning instead of a full scan.
  *
  * Z-ordering extends that to TWO dimensions at once: sorting by the Morton
  * interleave of (a, b) keeps rows that are close in both columns physically
  * adjacent, so each file covers a small rectangle of (a, b) space and
  * predicates on EITHER column skip most files — where a lexicographic sort
  * (a, b) prunes only on `a`.
  */
object Layout {

  /** Z-order clustering key for two integral columns. */
  def zOrderKey(a: Column, b: Column): Column = LayoutFunctions.zOrderKey(a, b)

  /** Returns `df` redistributed and ordered for a Z-clustered write:
    * range-partitioned into `numFiles` slices of the z-curve, each slice
    * sorted by z. Write the result with any file sink; each output file then
    * covers a compact rectangle in (a, b). The z column is internal and
    * dropped.
    *
    * The single range exchange samples z-keys to build balanced bounds (no
    * skew pile-up on hot key prefixes); this is the same shuffle a plain
    * global sort would pay, so Z-clustering costs nothing extra over
    * sort-on-write.
    */
  def zorder(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("__z", zOrderKey(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Curriculum sharding: assign every row to one of `numShards` buckets by
    * the quantile band of a difficulty/quality `score` — the
    * short-to-long (or clean-to-noisy) ordering curriculum training
    * consumes, produced WITHOUT a global sort. Cut points come from one
    * mergeable KLL sketch aggregation ([[graft.functions.QuantileSketch]]:
    * each map task ships an O(k) summary, exact while n ≤ the k buffer,
    * rank-error-bounded beyond); the numShards−1 cuts then broadcast and
    * assignment is a map-only membership count — `shard` = how many cuts
    * the score exceeds (boundary scores go to the lower shard, matching
    * the discrete-quantile convention). Output: (id, score, shard).
    *
    * Scale shape: one O(k)-exchange aggregation + one map-only pass. The
    * alternative — ntile() over a corpus-wide Window — funnels every row
    * through one reducer and is exactly the shape this engine bans.
    */
  def curriculumShards(df: DataFrame, id: Column, score: Column,
      numShards: Int, sketchK: Int = 4096): DataFrame = {
    require(numShards >= 2, s"numShards must be >= 2, got $numShards")
    val probs = (1 until numShards).map(_.toDouble / numShards)
    val cuts = df.agg(graft.functions.QuantileSketch
      .kllQuantiles(sketchK, probs)(score.cast("double")).as("__cuts"))
    df.select(id.as("id"), score.as("score"))
      .crossJoin(broadcast(cuts))
      .select(col("id"), col("score"),
        size(filter(col("__cuts"), c => col("score").cast("double") > c))
          .as("shard"))
  }

  /** Hilbert-curve clustering key — same 62-bit contract as [[zOrderKey]]
    * but with no long jumps between consecutive cells, so clustered files
    * cover tighter (a, b) rectangles and min/max pruning skips more of
    * them (see [[org.apache.spark.sql.graft.HilbertIndex]]).
    */
  def hilbertKey(a: Column, b: Column): Column = LayoutFunctions.hilbertKey(a, b)

  /** [[zorder]] with the Hilbert key — identical shuffle cost (one range
    * exchange, the same a sort-on-write pays), better pruning locality.
    */
  def hilbertOrder(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("__h", hilbertKey(a, b))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }
}
