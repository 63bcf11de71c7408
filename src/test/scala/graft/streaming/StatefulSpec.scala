package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.SparkSpec

/** Custom keyed state via flatMapGroupsWithState — the escape hatch for
  * stream logic window/session operators can't express (running per-key
  * aggregates emitted every batch, cross-batch dedup, etc.). The reference
  * had no streaming state at all (closed-window pulls); this pins the
  * engine's pattern for it.
  */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("running per-key count survives across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]

    val counted = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Int)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator((key, total))
      }

    val q = counted.toDF("k", "n").writeStream
      .format("memory").queryName("state_test").outputMode("update").start()
    mem.addData(("a", 1), ("a", 2), ("b", 1))
    q.processAllAvailable()
    mem.addData(("a", 3), ("c", 1))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("state_test").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(last === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("funnelIngest: depth advances across micro-batches, within-batch " +
      "events fold in time order, and equal timestamps do not advance") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)] // (user, ts, type)
    val out = Streams.funnelIngest(mem.toDF().toDF("u", "ts", "et"),
      $"u", $"ts", $"et", Seq("A", "B", "C"))
    val q = out.toDF("user_id", "depth").writeStream
      .format("memory").queryName("funnel_state").outputMode("update").start()
    // batch 0: u1 does A,B OUT OF ORDER in the batch (B row added first);
    // u2 does B only (no A yet -> depth 0)
    mem.addData((1L, 20L, "B"), (1L, 10L, "A"), (2L, 10L, "B"))
    q.processAllAvailable()
    // batch 1: u1 completes C; u2 does A then B at the SAME ts (no advance
    // past A), then B later (advance)
    mem.addData((1L, 30L, "C"), (2L, 20L, "A"), (2L, 20L, "B"), (2L, 40L, "B"))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("funnel_state").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(last === Map(1L -> 3, 2L -> 2))
  }

  test("cross-batch exact dedup with keyed seen-state (Streams.dedupByKey)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)] // (doc_id, payload)

    val deduped = Streams.dedupByKey(mem.toDF().toDF("id", "payload"),
      org.apache.spark.sql.functions.col("id"))

    val q = deduped.writeStream
      .format("memory").queryName("dedup_state").outputMode("update").start()
    mem.addData(("d1", "x"), ("d1", "x-dup"), ("d2", "y"))
    q.processAllAvailable()
    mem.addData(("d1", "x-again"), ("d3", "z"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_state").as[(String, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq("d1", "d2", "d3")) // each id exactly once
  }
}
