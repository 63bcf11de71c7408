package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-math laws behind the round-13 calibration/screening operators,
  * checked on random inputs — each property is an equivalence the DuckDB
  * oracle or the operator's documented contract relies on.
  */
object CalibrationProps extends Properties("Calibration") {

  // ------------------------------------------------ jaccard histogram laws

  private val setGen: Gen[Set[Int]] =
    Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 12)).map(_.toSet))
  private val corpusGen: Gen[List[Set[Int]]] =
    Gen.resize(12, Gen.listOf(setGen))
  private val binsGen: Gen[Int] = Gen.chooseNum(1, 30)

  private def candidatePairs(c: List[Set[Int]]): Seq[(Int, Int)] =
    for {
      i <- c.indices; j <- c.indices if i < j
      inter = (c(i) & c(j)).size
      if inter > 0
    } yield (inter, (c(i) | c(j)).size)

  property("integer bucket brackets the exact jaccard: for every candidate " +
      "pair, lo <= j < hi, except j == 1 which folds into the top bucket " +
      "(the quantization-correctness claim in the operator doc)") =
    forAll(corpusGen, binsGen) { (c, bins) =>
      candidatePairs(c).forall { case (inter, union) =>
        val b = math.min(inter.toLong * bins / union, bins - 1L)
        val j = inter.toDouble / union
        if (inter == union) b == bins - 1L
        else b.toDouble / bins <= j && j < (b + 1).toDouble / bins
      }
    }

  property("histogram mass == candidate pair count (no pair lost or " +
      "double-counted by the bucketing)") =
    forAll(corpusGen, binsGen) { (c, bins) =>
      val ps = candidatePairs(c)
      val hist = ps.groupBy { case (i, u) =>
        math.min(i.toLong * bins / u, bins - 1L)
      }
      hist.values.map(_.size).sum == ps.size &&
        hist.keys.forall(b => b >= 0 && b < bins)
    }

  property("a df cap only REMOVES candidate pairs — the capped histogram's " +
      "total mass never exceeds the uncapped (the conservative-shift claim)") =
    forAll(corpusGen, Gen.chooseNum(1, 5)) { (c, cap) =>
      val df = c.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val kept = c.map(_.filter(s => df(s) <= cap))
      val cappedPairs = (for {
        i <- c.indices; j <- c.indices if i < j
        if (kept(i) & kept(j)).nonEmpty
      } yield (i, j)).toSet
      val allPairs = (for {
        i <- c.indices; j <- c.indices if i < j
        if (c(i) & c(j)).nonEmpty
      } yield (i, j)).toSet
      cappedPairs.subsetOf(allPairs)
    }

  // -------------------------------------------- semantic decontamination laws

  private val vecGen: Gen[Vector[Double]] =
    Gen.listOfN(4, Gen.chooseNum(-5, 5).map(_.toDouble))
      .map(_.toVector).suchThat(v => v.exists(_ != 0.0))
  private val needlesGen: Gen[List[(Long, Vector[Double])]] =
    Gen.resize(8, Gen.nonEmptyListOf(vecGen))
      .map(_.zipWithIndex.map { case (v, i) => (100L + i, v) })

  private def cos(a: Vector[Double], b: Vector[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  /** The engine's formulation: max_by over struct((cos, -needle_id)). */
  private def foldArgmax(cs: Seq[(Long, Double)]): (Long, Double) =
    cs.maxBy { case (nid, c) => (c, -nid) }

  /** The oracle's formulation: ROW_NUMBER ordered by (cos DESC, nid). */
  private def sortPick(cs: Seq[(Long, Double)]): (Long, Double) =
    cs.sortBy { case (nid, c) => (-c, nid) }.head

  property("max_by(struct(cos, -nid)) == ROW_NUMBER(cos DESC, nid) on every " +
      "random needle set — the exact engine/oracle argmax equivalence " +
      "semantic_decontaminate's hash gate relies on, ties included") =
    forAll(vecGen, needlesGen) { (doc, needles) =>
      val cs = needles.map { case (nid, nv) => (nid, cos(doc, nv)) }
      foldArgmax(cs) == sortPick(cs)
    }

  property("contamination is monotone: the flagged set at a higher " +
      "threshold is a subset of the flagged set at a lower one") =
    forAll(Gen.resize(8, Gen.nonEmptyListOf(vecGen)), needlesGen,
        Gen.chooseNum(0, 100), Gen.chooseNum(0, 100)) { (docs, needles, a, b) =>
      val (t1, t2) = (math.min(a, b) / 100.0, math.max(a, b) / 100.0)
      def flagged(t: Double) = docs.zipWithIndex.collect {
        case (d, i) if needles.map(n => cos(d, n._2)).max >= t => i
      }.toSet
      flagged(t2).subsetOf(flagged(t1))
    }

  property("adding a needle never decreases any doc's max cosine (more " +
      "benchmark coverage can only find MORE leakage)") =
    forAll(vecGen, needlesGen, vecGen) { (doc, needles, extra) =>
      val before = needles.map(n => cos(doc, n._2)).max
      val after = (needles :+ ((999L, extra))).map(n => cos(doc, n._2)).max
      after >= before
    }
}
