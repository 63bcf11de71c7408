package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-math laws of the round's retrieval/importance operators — the
  * parts that must hold for EVERY input, independent of Spark: the BM25
  * closed form's monotonicities, the fixed-point quantization bound, and
  * the DSIR weight algebra.
  */
object RetrievalProps extends Properties("Retrieval") {

  // the scalar BM25 term the engine's column expression implements
  private def bm25Term(tf: Double, df: Double, n: Double, dl: Double,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = (n - df + 0.5) / (df + 0.5)
    idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl))))
  }

  private val posInt: Gen[Int] = Gen.chooseNum(1, 10000)

  property("bm25: more occurrences never score lower (tf monotone)") =
    forAll(posInt, posInt, posInt, posInt) { (tf0, dfR, nR, dl0) =>
      val n = math.max(nR, dfR).toDouble
      val df = math.min(nR, dfR).toDouble
      val dl = dl0.toDouble
      val avgdl = 37.5
      bm25Term(tf0 + 1.0, df, n, dl, avgdl) >=
        bm25Term(tf0.toDouble, df, n, dl, avgdl)
    }

  property("bm25: longer documents never score higher at equal tf " +
      "(length penalty monotone)") =
    forAll(posInt, posInt, posInt, posInt) { (tfR, dfR, nR, dl0) =>
      val n = math.max(nR, dfR).toDouble
      val df = math.min(nR, dfR).toDouble
      val tf = tfR.toDouble
      val avgdl = 37.5
      bm25Term(tf, df, n, dl0.toDouble, avgdl) >=
        bm25Term(tf, df, n, dl0.toDouble + 1.0, avgdl)
    }

  property("bm25: rarer terms never weigh less (df anti-monotone)") =
    forAll(posInt, posInt, posInt, posInt) { (tfR, dfR, nR, dlR) =>
      val n = (math.max(nR, dfR) + 1).toDouble
      val df = math.min(nR, dfR).toDouble
      bm25Term(tfR.toDouble, df, n, dlR.toDouble, 37.5) >=
        bm25Term(tfR.toDouble, df + 1.0, n, dlR.toDouble, 37.5)
    }

  property("fixed-point quantization: |round(x*S)/S - x| <= 1/(2S) and " +
      "the divide back is exact scaling") =
    forAll(Gen.chooseNum(-1.0e6, 1.0e6)) { x =>
      val s = TextIndex.Bm25Scale
      val q = math.rint(x * s)
      math.abs(q / s - x) <= 1.0 / (2.0 * s) + math.ulp(x)
    }

  property("weighted-sample rank: scaling every weight by a constant " +
      "preserves the selection order (A-ES scale invariance), and higher " +
      "weight at equal hash never ranks lower") =
    forAll(Gen.chooseNum(0.001, 0.999), Gen.chooseNum(0.001, 0.999),
        Gen.chooseNum(1, 1000), Gen.chooseNum(1, 1000),
        Gen.chooseNum(1, 100000)) { (u1, u2, w1, w2, c) =>
      def rank(u: Double, w: Double): Double = math.log(u) / w
      val order = rank(u1, w1.toDouble) > rank(u2, w2.toDouble)
      val scaled = rank(u1, w1.toDouble * c) > rank(u2, w2.toDouble * c)
      // scale invariance (ranks divide by the same positive constant)
      order == scaled &&
        // monotone in w at fixed u: ln(u) < 0, so /w grows toward 0
        rank(u1, (w1 + 1).toDouble) >= rank(u1, w1.toDouble)
    }

  property("dsir weight algebra: a bucket seen only in target scores " +
      "positive, only in raw negative, and equal profiles score the " +
      "corpus-size baseline everywhere") =
    forAll(Gen.chooseNum(1, 500), Gen.chooseNum(1, 500)) { (tc, rc) =>
      val b = 4
      // closed-form replica of trainDsirWeights' math
      def w(t: Long, r: Long, tTot: Double, rTot: Double): Double =
        math.log(((t + 1.0) / tTot) / ((r + 1.0) / rTot))
      val tTot = tc.toDouble + b
      val rTot = rc.toDouble + b
      val targetOnly = w(tc, 0, tTot, rTot)
      val rawOnly = w(0, rc, tTot, rTot)
      val emptyBoth = w(0, 0, tTot, rTot)
      // target-only bucket beats the empty-bucket baseline; raw-only sits
      // below it; the baseline itself is ln(rTot/tTot)
      targetOnly > emptyBoth && rawOnly < emptyBoth &&
        math.abs(emptyBoth - math.log(rTot / tTot)) < 1e-12
    }
}
