package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** HLL sketch distinct-counting (Spark's DataSketches bindings) in the
  * regime the oracle query relies on: below the coupon-set promotion
  * threshold the sketch is exact, and unions of per-group sketches equal
  * the single-pass sketch — so rollups can re-merge stored sketches
  * instead of re-shuffling raw keys.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate is exact at small cardinality, any partitioning") {
    val df = (0L until 5000L).map(i => (i % 37, i % 400)).toDF("g", "v")
    val got = df.repartition(7)
      .groupBy("g").agg(hll_sketch_estimate(hll_sketch_agg(col("v"), 16)).as("est"))
      .join(df.groupBy("g").agg(countDistinct(col("v")).as("exact")), "g")
    assert(got.filter(col("est") =!= col("exact")).count() === 0)
  }

  test("union of per-group sketches equals the global sketch (mergeable)") {
    val df = (0L until 5000L).map(i => (i % 37, i % 400)).toDF("g", "v")
    val viaUnion = df.groupBy("g").agg(hll_sketch_agg(col("v"), 16).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).as[Long].head
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"), 16))).as[Long].head
    assert(viaUnion === direct)
    assert(viaUnion === 400L)
  }

  test("sketches survive a store/re-merge roundtrip as binary columns") {
    val df = (0L until 1000L).map(i => (i % 4, i % 123)).toDF("g", "v")
    val stored = df.groupBy("g").agg(hll_sketch_agg(col("v"), 16).as("sk"))
    // simulate "stored sketches, rolled up later without raw data"
    val rolled = stored.select(col("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).as[Long].head
    assert(rolled === 123L)
  }
}
