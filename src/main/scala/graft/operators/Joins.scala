package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join helpers for the two scale pathologies AQE can't always fix alone:
  * heavy skew on a join key, and repeated shuffles of a large fact table.
  */
object Joins {

  /** Skew-safe equi-join of a skewed large side against a smaller side:
    * the large side's rows get a deterministic salt in [0, saltFactor), the
    * small side is replicated saltFactor times, and the join key becomes
    * (key, salt) — a hot key's rows now spread over saltFactor reducers.
    *
    * The salt is `xxhash64` of the large side's whole row (content-derived,
    * no rand(), so retries/resamples don't reshuffle rows). Result equals
    * the plain equi-join on `keys` exactly; `smallDf` grows ×saltFactor,
    * so keep saltFactor modest (8–32) and the small side genuinely smaller.
    *
    * Join types that preserve every LEFT (large-side) row are supported;
    * right/full outer are rejected — an unmatched small-side row exists
    * once per salt replica and would be emitted saltFactor times.
    */
  def saltedJoin(largeDf: DataFrame, smallDf: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(Set("inner", "cross", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti")
        .contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType " +
        "(right/full would emit unmatched small-side rows once per salt replica)")
    val salted = largeDf.withColumn("__salt",
      pmod(xxhash64(largeDf.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val replicated = smallDf.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** As-of join — for every left row, the single right row with the
    * greatest `rightTime` <= `leftTime` (or < when `strict`) per key; nulls
    * when no prior right row exists (left-join semantics). Spark has no
    * native as-of join; the scalable formulation is union + one window pass:
    * tag sides, sort within each key by (time, side), and carry the last
    * non-null right value forward — ONE shuffle on the key, no range-join
    * explosion, no per-key collect. Right rows must be unique per
    * (key, rightTime) for a deterministic pick (pre-aggregate if not).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightValue: String,
      strict: Boolean = false, out: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(rightValue).dataType))
    val r = right.select(col(key), col(rightTime).as("__t"),
        lit(0).as("__side"), col(rightValue).as("__rv"))
    val rAligned = l.columns.foldLeft(r) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col).toIndexedSeq: _*)
    // equal times: non-strict sorts right (0) before left (1) so it counts;
    // strict sorts right after left so it doesn't
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn(out, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col).toIndexedSeq :+ col(out): _*)
  }

  /** Range (interval) join: pairs where `left.t ∈ [right.lo, right.hi]`.
    * Spark plans a raw range predicate as broadcast-nested-loop/cartesian —
    * quadratic at scale. Bucketizing time into `bucketWidth`-wide chunks
    * turns it into an equi-join: each left row joins through its single
    * bucket, each right interval is exploded over the buckets it covers
    * (≈ (hi-lo)/width + 1 rows), and the exact BETWEEN filter runs after
    * the hash join. Every qualifying pair matches in exactly one bucket
    * (the left row's), so no dedup pass is needed. Extra equality `keys`
    * tighten the join when present.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, leftTime: String,
      lo: String, hi: String, bucketWidth: Long,
      keys: Seq[String] = Seq.empty, joinType: String = "inner"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti").contains(joinType.toLowerCase.replace(" ", "_")),
      s"rangeJoin supports inner/left/left_semi/left_anti, got $joinType " +
        "(the right side is exploded per bucket, so right/full would duplicate " +
        "unmatched intervals)")
    // The BETWEEN predicate lives INSIDE the join condition (not a post-join
    // filter): under left joins a post-filter would see null lo/hi on
    // unmatched rows, evaluate false, and silently drop them — degrading
    // left to inner. Right-side key/bucket columns are renamed so the
    // explicit condition is unambiguous, then dropped.
    val l = left.withColumn("__bucket", floor(col(leftTime) / bucketWidth))
    val rExploded = right.withColumn("__rbucket",
      explode(sequence(floor(col(lo) / bucketWidth), floor(col(hi) / bucketWidth))))
    val renamed = keys.map(k => k -> s"__r_$k")
    val r = renamed.foldLeft(rExploded) { case (d, (k, rk)) => d.withColumnRenamed(k, rk) }
    val cond = renamed.foldLeft(
        col("__bucket") === col("__rbucket") &&
          col(leftTime) >= col(lo) && col(leftTime) <= col(hi)) {
      case (c, (k, rk)) => c && col(k) === col(rk)
    }
    l.join(r, cond, joinType)
      .drop("__bucket" +: "__rbucket" +: renamed.map(_._2): _*)
  }

  /** Write `df` bucketed+sorted on the join key so later joins between
    * co-bucketed tables skip the shuffle entirely (sort-merge join reads
    * bucket files pairwise). The table lands in the session catalog's
    * warehouse as parquet.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}
