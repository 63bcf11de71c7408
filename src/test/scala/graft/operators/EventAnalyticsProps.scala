package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-math laws of the funnel/retention operators, checked against
  * straight-line Scala reference implementations on random event streams
  * — the property the distributed fold must preserve under ANY grouping.
  */
object EventAnalyticsProps extends Properties("EventAnalytics") {

  private val steps = Vector("A", "B", "C")

  private val eventGen: Gen[(Long, Long, String)] = for {
    u <- Gen.chooseNum(1L, 6L)
    ts <- Gen.chooseNum(0L, 50L)
    et <- Gen.oneOf("A", "B", "C", "X")
  } yield (u, ts, et)

  private val streamGen: Gen[List[(Long, Long, String)]] =
    Gen.listOf(eventGen)

  /** The greedy strict-order chain, written the obvious sequential way. */
  private def refDepth(evs: Seq[(Long, String)]): Int = {
    var d = 0
    var t = Long.MinValue
    evs.sortBy(e => (e._1, e._2)).foreach { case (ts, et) =>
      if (d < steps.size && et == steps(d) && ts > t) { d += 1; t = ts }
    }
    d
  }

  /** The per-step sequential min-chain the DuckDB oracle replays. */
  private def refMinChain(evs: Seq[(Long, String)]): Int = {
    var t = Long.MinValue
    var d = 0
    var advanced = true
    while (advanced && d < steps.size) {
      val nxt = evs.filter(e => e._2 == steps(d) && e._1 > t).map(_._1)
      if (nxt.isEmpty) advanced = false
      else { t = nxt.min; d += 1 }
    }
    d
  }

  property("greedy fold == sequential min-chain on every random stream " +
      "(the equivalence the oracle relies on)") =
    forAll(streamGen) { evs =>
      evs.groupBy(_._1).forall { case (_, rows) =>
        val perUser = rows.map(r => (r._2, r._3))
        refDepth(perUser) == refMinChain(perUser)
      }
    }

  property("users_reached per step is monotonically non-increasing") =
    forAll(streamGen) { evs =>
      val depths = evs.groupBy(_._1).values
        .map(rows => refDepth(rows.map(r => (r._2, r._3)))).toSeq
      val reached = (1 to steps.size).map(s => depths.count(_ >= s))
      reached.zip(reached.tail).forall { case (a, b) => a >= b }
    }

  property("adding an event never decreases any user's depth " +
      "(funnel progress is monotone in evidence)") =
    forAll(streamGen, eventGen) { (evs, extra) =>
      val before = evs.filter(_._1 == extra._1).map(r => (r._2, r._3))
      val after = before :+ ((extra._2, extra._3))
      refDepth(after) >= refDepth(before)
    }
}
