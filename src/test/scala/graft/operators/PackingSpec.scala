package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def packed(rows: Seq[(String, Long, Long)], budget: Long) =
    Packing.packGreedy(rows.toDF("g", "o", "sz"),
        col("g"), col("o"), col("sz"), budget)
      .as[(String, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))

  test("greedy fill: items pack until the budget would overflow") {
    val out = packed(Seq(
      ("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 250L), // 100+200, then 250+300>512? 250+300=550 -> 250 fits (300 total... )
      ("a", 4L, 300L), ("a", 5L, 10L)), budget = 512L)
    // walk: 100 -> 300 -> 550>512 so pack2 at 250 -> 550>512 so pack3 at 300 -> 310
    assert(out.map(_._4).toSeq === Seq(1L, 1L, 2L, 3L, 3L))
  }

  test("every pack's total stays within budget unless it is a single oversized item") {
    val rows = (1 to 200).map(i => ("g" + i % 7, i.toLong, (i * 37 % 300 + 1).toLong))
    val out = packed(rows, budget = 256L)
    val byPack = out.groupBy(r => (r._1, r._4))
    byPack.foreach { case (_, items) =>
      val total = items.map(_._3).sum
      assert(total <= 256L || items.length == 1,
        s"pack over budget with ${items.length} items: $total")
    }
    // pack ids are contiguous from 1 within each group
    out.groupBy(_._1).foreach { case (_, items) =>
      val ids = items.map(_._4).distinct.sorted
      assert(ids.toSeq === (1L to ids.max).toSeq)
    }
    // packs honor the order column: pack_id is monotone in o
    out.groupBy(_._1).foreach { case (_, items) =>
      val inOrder = items.sortBy(_._2).map(_._4)
      assert(inOrder.zip(inOrder.tail).forall { case (a, b) => b >= a })
    }
  }

  test("an item larger than the budget gets a pack of its own") {
    val out = packed(Seq(("a", 1L, 50L), ("a", 2L, 9999L), ("a", 3L, 50L)), 100L)
    assert(out.map(_._4).toSeq === Seq(1L, 2L, 3L))
  }

  test("groups pack independently and results are partitioning-invariant") {
    val rows = (1 to 300).map(i => ("s" + i % 13, i.toLong, (i % 97 + 1).toLong))
    val a = packed(rows, 128L)
    val b = Packing.packGreedy(
        rows.toDF("g", "o", "sz").repartition(17),
        col("g"), col("o"), col("sz"), 128L)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq === b.toSeq)
  }
}
