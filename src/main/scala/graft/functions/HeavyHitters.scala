package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (term, count) slot of a frequent-items summary. */
case class HHEntry(term: String, cnt: Long)

/** Misra-Gries frequent-items sketch as a typed Aggregator — bounded-memory
  * heavy hitters over a corpus too large to count exactly. The summary
  * holds at most `capacity` (term, count) slots per partial buffer, so the
  * shuffle carries O(capacity) state per partition instead of one row per
  * distinct term (the groupBy-count plan's shuffle is |vocab|-sized; this
  * one is constant).
  *
  * Guarantees (standard MG): every term with true count > n/(capacity+1)
  * is present in the result; reported counts are underestimates by at most
  * the total decrement amount. When `capacity` >= the number of distinct
  * terms no decrement ever fires and the summary is EXACT — which is what
  * makes the oracle entry possible on a small-vocabulary corpus (and makes
  * the result partitioning-invariant). Merging two summaries adds counts
  * slot-wise, then trims back to `capacity` by subtracting the
  * (capacity+1)-th largest count (Agarwal et al.'s mergeable-summaries
  * construction) — the error GUARANTEE survives any merge order, though in
  * the lossy regime the reported underestimates may differ slightly across
  * partitionings (use the exact regime when bit-stable output matters).
  */
case class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[HHEntry]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], term: String): Map[String, Long] = {
    if (term == null) return b
    b.get(term) match {
      case Some(c) => b.updated(term, c + 1)
      case None if b.size < capacity => b.updated(term, 1L)
      case None =>
        // classic MG step: decrement every slot, drop the zeroed ones
        b.iterator.flatMap { case (t, c) =>
          if (c > 1) Some(t -> (c - 1)) else None
        }.toMap
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest count from every slot
      val kth = combined.valuesIterator.toArray.sortBy(-_).apply(capacity)
      combined.iterator.flatMap { case (t, c) =>
        if (c > kth) Some(t -> (c - kth)) else None
      }.toMap
    }
  }

  override def finish(b: Map[String, Long]): Seq[HHEntry] =
    b.iterator.map { case (t, c) => HHEntry(t, c) }
      .toSeq.sortBy(e => (-e.cnt, e.term))

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[HHEntry]] =
    ExpressionEncoder[Seq[HHEntry]]()
}

object HeavyHitters {
  /** Column form: `heavyHitters(capacity)(termCol)` aggregates to a sorted
    * array<struct<term, cnt>> of at most `capacity` entries.
    */
  def heavyHitters(capacity: Int)(term: Column): Column =
    udaf(MisraGriesAggregator(capacity)).apply(term)
}
