package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate for bounded top-k aggregation. */
case class TopKEntry(id: Long, score: Double)

/** Bounded top-k aggregation: each partial buffer keeps at most `k` entries
  * ordered by (score desc, id asc).
  *
  * This is the distributed top-k shape: map-side partial aggregation prunes
  * every partition's candidates down to k before the shuffle, so the exchange
  * carries O(partitions × k) entries per group and the final merge is a
  * k-way list merge — replacing a `row_number()` window whose sort would
  * funnel every scored row of a group through one reducer (unbounded reducer
  * input at corpus scale).
  *
  * Ties break toward the smaller id, matching the `ORDER BY score DESC, id`
  * window it replaces.
  */
case class TopKAggregator(k: Int)
    extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: TopKEntry, b: TopKEntry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[TopKEntry] = Vector.empty

  override def reduce(buf: Seq[TopKEntry], x: TopKEntry): Seq[TopKEntry] =
    if (buf.size >= k && better(buf.last, x)) buf // full and x worse than the current worst
    else merge(buf, Vector(x))

  override def merge(a: Seq[TopKEntry], b: Seq[TopKEntry]): Seq[TopKEntry] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[TopKEntry]): Seq[TopKEntry] = r

  private def enc[T: TypeTag]: Encoder[T] = ExpressionEncoder[T]()
  override def bufferEncoder: Encoder[Seq[TopKEntry]] = enc
  override def outputEncoder: Encoder[Seq[TopKEntry]] = enc
}

object TopKAggregator {
  /** Column-level entry point: `topK(k)(idCol, scoreCol)` aggregates to
    * `array<struct<id,score>>` of the k best (score desc, id asc) entries.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(TopKAggregator(k))
    (id: Column, score: Column) => f(id, score)
  }
}
