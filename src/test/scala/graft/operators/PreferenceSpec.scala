package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def wilson(wins: Long, n: Long, z: Double = 1.96): Double = {
    val zz = z * z
    val nd = n.toDouble
    val p = wins.toDouble / nd
    val center = p + zz / (2.0 * nd)
    val margin = z * math.sqrt((p * (1.0 - p) + zz / (4.0 * nd)) / nd)
    (center - margin) / (1.0 + zz / nd)
  }

  test("winRates: exact counts and the hand-computed Wilson chain") {
    // A beats B twice and C once; C beats B once. A: 3/3, B: 0/3, C: 1/2.
    val pairs = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("C", "B"))
      .toDF("w", "l")
    val got = Preference.winRates(pairs, col("w"), col("l"))
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") === (("A", 3L, 0L, 3L, 1.0, wilson(3, 3))))
    assert(got("B") === (("B", 0L, 3L, 3L, 0.0, wilson(0, 3))))
    assert(got("C") === (("C", 1L, 1L, 2L, 0.5, wilson(1, 2))))
  }

  test("winRates: Wilson lower bound ranks 90/100 above 2/2") {
    val many = Seq.fill(90)(("big", "x")) ++ Seq.fill(10)(("x", "big")) ++
      Seq.fill(2)(("small", "y"))
    val got = Preference.winRates(many.toDF("w", "l"), col("w"), col("l"))
      .select(col("item"), col("win_rate"), col("wilson_lb"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    // raw rate would invert this ranking (1.0 > 0.9)
    assert(got("small")._2 === 1.0 && got("big")._2 === 0.9)
    assert(got("big")._3 > got("small")._3)
  }

  test("winRates: an item that only ever loses still gets a row") {
    val got = Preference.winRates(Seq(("a", "b")).toDF("w", "l"),
        col("w"), col("l"))
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq("a", "b"))
    assert(got(1)._2 === 0L && got(1)._3 === 1L)
    // lb must stay within [0, 1] even at p̂ = 0
    assert(got(1)._6 >= 0.0 && got(1)._6 <= 1.0)
  }

  /** Driver-side reference of btStrengths' exact integer recurrence. */
  private def btRef(ballots: Seq[(String, String)], iters: Int,
      scale: Long = 1000000000L, prec: Long = 1000000000000000L)
      : Map[String, Long] = {
    val ord = ballots.flatMap { case (w, l) => Seq((w, l, 1L), (l, w, 0L)) }
      .groupBy(t => (t._1, t._2)).map { case ((i, o), ts) =>
        (i, o, ts.size.toLong, ts.map(_._3).sum)
      }.toSeq
    val wins = ord.groupBy(_._1).view
      .mapValues(ts => (ts.map(_._4).sum, ts.map(_._3).sum)).toMap
    var s = wins.keys.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val d = ord.groupBy(_._1).view.mapValues(
        _.map { case (i, o, n, _) => n * prec / (s(i) + s(o)) }.sum).toMap
      s = wins.map { case (i, (w, _)) =>
        i -> math.max(1L,
          (BigInt(w) * prec / d(i)).toLong)
      }
    }
    s
  }

  test("btStrengths matches the integer recurrence on a hand fixture") {
    val ballots = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("A", "C"),
      ("C", "B"), ("A", "B"))
    for (iters <- Seq(1, 2, 3)) {
      val got = Preference.btStrengths(ballots.toDF("w", "l"), col("w"),
          col("l"), iters = iters)
        .select(col("item"), col("strength_fp"))
        .as[(String, Long)].collect().toMap
      assert(got === btRef(ballots, iters), s"iters=$iters")
    }
  }

  test("btStrengths: beating a STRONG opponent outranks beating a weak " +
      "one at the same record (what the Wilson ranking cannot see)") {
    // A beats c,d,e; B loses to c,d,e. X beats A once, Y beats B once:
    // X and Y are both 1/1, but X's win is over the strongest item.
    val ballots = Seq(("A", "c"), ("A", "d"), ("A", "e"),
      ("c", "B"), ("d", "B"), ("e", "B"),
      ("X", "A"), ("Y", "B"))
    val got = Preference.btStrengths(ballots.toDF("w", "l"), col("w"),
        col("l"), iters = 3)
      .select(col("item"), col("strength_fp"))
      .as[(String, Long)].collect().toMap
    assert(got("X") > got("Y"),
      s"X=${got("X")} must outrank Y=${got("Y")}")
    // while the Wilson view ties them exactly
    val wr = Preference.winRates(ballots.toDF("w", "l"), col("w"), col("l"))
      .select(col("item"), col("wilson_lb")).as[(String, Double)]
      .collect().toMap
    assert(wr("X") === wr("Y"))
  }

  test("btStrengths: an all-losses item floors at 1, never divides by zero") {
    val ballots = Seq(("a", "z"), ("b", "z"), ("a", "b"))
    val got = Preference.btStrengths(ballots.toDF("w", "l"), col("w"),
        col("l"), iters = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("z")._2 === 0L && got("z")._3 === 2L)
    assert(got("z")._5 >= 1L)
    assert(got("a")._5 > got("z")._5)
  }

  test("btStrengths is partitioning-independent") {
    val ballots = (1 to 300).map(i => (s"i${i % 11}", s"i${(i * 3) % 11}"))
      .filter(p => p._1 != p._2)
    val a = Preference.btStrengths(ballots.toDF("w", "l"), col("w"), col("l"))
      .orderBy("item").collect().toSeq
    val b = Preference.btStrengths(ballots.toDF("w", "l").repartition(7),
        col("w"), col("l"))
      .orderBy("item").collect().toSeq
    assert(a === b)
  }

  test("lengthBias: longer/shorter/tie ballots counted exactly, ties " +
      "excluded from the rate, all-ties yields NULL not 0.5") {
    val items = Seq(("a", 10L), ("b", 20L), ("c", 10L))
      .toDF("item", "len")
    // b(20) beats a(10): longer wins; a(10) beats b(20): shorter wins;
    // a(10) vs c(10): length tie
    // last ballot references an item absent from the dim: it must be
    // COUNTED as unmatched, never silently dropped
    val ballots = Seq(("b", "a"), ("a", "b"), ("a", "b"), ("a", "c"),
        ("a", "ghost"))
      .toDF("w", "l")
    val out = Preference.lengthBias(ballots, col("w"), col("l"),
        items, col("item"), col("len"))
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(out === ((5L, 1L, 1L, 2L, 1L, Some(1.0 / 3.0))))
    val allTies = Preference.lengthBias(
        Seq(("a", "c")).toDF("w", "l"), col("w"), col("l"),
        items, col("item"), col("len"))
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(allTies === ((1L, 0L, 0L, 0L, 1L, None)))
  }

  test("dpoPairs: arg-extremes with the documented tie-breaks, margin " +
      "filter, fully-tied groups still yield a distinct pair") {
    // prompt 1: item 10 wins both its ballots (rate 1), 12 loses both
    // (rate 0), 11 splits (0.5) -> chosen 10, rejected 12, margin 1
    // prompt 2: every item at rate 0.5 -> full tie: chosen = LOW id,
    // rejected = HIGH id, margin 0 (dropped at minMargin > 0)
    val ballots = Seq(
      (1L, 10L, 11L), (1L, 10L, 12L), (1L, 11L, 12L),
      (2L, 20L, 21L), (2L, 21L, 20L)).toDF("p", "w", "l")
    def run(m: Double) =
      Preference.dpoPairs(ballots, col("p"), col("w"), col("l"),
          minMargin = m)
        .as[(Long, Long, Long, Double, Double, Double, Long)]
        .collect().sortBy(_._1).toSeq
    assert(run(0.0) === Seq(
      (1L, 10L, 12L, 1.0, 0.0, 1.0, 3L),
      (2L, 20L, 21L, 0.5, 0.5, 0.0, 2L)))
    assert(run(0.75) === Seq((1L, 10L, 12L, 1.0, 0.0, 1.0, 3L)))
    // a one-item group can never form a pair (chosen == rejected)
    val solo = Seq((9L, 5L, 5L)).toDF("p", "w", "l")
    assert(Preference.dpoPairs(solo, col("p"), col("w"), col("l"))
      .count() === 0L)
    // STRING items (the winRates/btStrengths contract): tie-breaks must
    // stay deterministic — negating the item column would ANSI-throw here
    val strBallots = Seq(
      ("p1", "resp-a", "resp-b"), ("p1", "resp-b", "resp-a"),
      ("p1", "resp-a", "resp-c"),
      // p2 fully tied: lexicographically LOW chosen, HIGH rejected
      ("p2", "x", "y"), ("p2", "y", "x")).toDF("p", "w", "l")
    val strOut = Preference.dpoPairs(strBallots, col("p"), col("w"),
        col("l"))
      .as[(String, String, String, Double, Double, Double, Long)]
      .collect().sortBy(_._1).toSeq
    // p1 rates: a 2/3, b 1/2, c 0/1 -> chosen a, rejected c
    assert(strOut === Seq(
      ("p1", "resp-a", "resp-c", 2.0 / 3.0, 0.0, 2.0 / 3.0, 3L),
      ("p2", "x", "y", 0.5, 0.5, 0.0, 2L)))
  }

  test("dpoPairs laws on random ballots: chosen_rate >= rejected_rate, " +
      "n_ballots exact, minMargin keeps a subset, partitioning-independent") {
    val rnd = new scala.util.Random(42)
    val ballots = (1 to 400).map { _ =>
      val p = rnd.nextInt(20).toLong
      val a = p * 10 + rnd.nextInt(6)
      val b = p * 10 + rnd.nextInt(6)
      (p, a, b)
    }.filter(t => t._2 != t._3)
    val df = ballots.toDF("p", "w", "l")
    def run(d: org.apache.spark.sql.DataFrame, m: Double) =
      Preference.dpoPairs(d, col("p"), col("w"), col("l"), minMargin = m)
        .as[(Long, Long, Long, Double, Double, Double, Long)]
        .collect().sortBy(_._1).toSeq
    val out = run(df, 0.0)
    assert(out.forall(t => t._4 >= t._5 && t._6 === t._4 - t._5))
    val ballotsPerPrompt = ballots.groupBy(_._1).view.mapValues(_.size)
    assert(out.forall(t => t._7 === ballotsPerPrompt(t._1).toLong))
    val cut = run(df, 0.4)
    assert(cut.toSet.subsetOf(out.toSet) &&
      cut.forall(_._6 >= 0.4) &&
      out.filter(_._6 >= 0.4).toSet === cut.toSet)
    assert(run(df.repartition(7), 0.0) === out)
  }

  test("winRates is partitioning-independent") {
    val pairs = (1 to 400)
      .map(i => (s"i${i % 13}", s"i${(i * 7) % 13}"))
      .filter(p => p._1 != p._2)
    val a = Preference.winRates(pairs.toDF("w", "l"), col("w"), col("l"))
      .orderBy("item").collect().toSeq
    val b = Preference.winRates(pairs.toDF("w", "l").repartition(7),
        col("w"), col("l"))
      .orderBy("item").collect().toSeq
    assert(a === b)
  }
}
