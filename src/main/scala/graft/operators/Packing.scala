package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for pretraining pipelines: assign documents to
  * fixed-token-budget training sequences ("packs") so short documents share
  * a context window instead of each wasting one.
  */
object Packing {

  /** Greedy packing: walk each `group`'s items in `order` and append to the
    * current pack while the running `size` total stays within `budget`;
    * otherwise open a new pack. An item alone larger than the budget gets
    * its own pack. Deterministic — pack assignment is a pure function of
    * the (group, order) sequence. Output: `group`/`ord`/`size` plus
    * `pack_id` (1-based per group).
    *
    * Scale shape: packing is inherently sequential per group, so the plan
    * is the secondary-sort pattern — ONE shuffle (hash repartition on
    * group), a partition-local sort on (group, order), then a single
    * streaming pass with O(1) state per partition. No per-group
    * materialization, no corpus-wide window, no driver loop: 10^9 docs in
    * 10^5 source shards run as independent sequential scans spread across
    * executors. (A corpus-wide single-group call serializes by design —
    * shard first, e.g. by source or a hash prefix.)
    */
  def packGreedy(df: DataFrame, group: Column, order: Column, size: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val prepared =
      df.select(group.as("group"), order.as("ord"), size.cast("long").as("size"))
    val outSchema = StructType(
      prepared.schema.fields :+ StructField("pack_id", LongType, nullable = false))
    prepared
      .repartition(col("group"))
      .sortWithinPartitions(col("group"), col("ord"))
      .mapPartitions { rows =>
        var curGroup: Any = null
        var started = false
        var acc = 0L
        var pack = 1L
        rows.map { r =>
          val g = r.get(0)
          val sz = r.getLong(2)
          if (!started || g != curGroup) {
            started = true; curGroup = g; acc = sz; pack = 1L
          } else if (acc + sz > budget) {
            pack += 1; acc = sz
          } else acc += sz
          Row.fromSeq(r.toSeq :+ pack)
        }
      }(Encoders.row(outSchema))
  }
}
