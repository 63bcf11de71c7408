package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-math laws behind the round-16 curation operators, checked on
  * random inputs — each property is an equivalence or bound the DuckDB
  * oracle or the operator's documented contract relies on.
  */
object CurationProps extends Properties("Curation") {

  // --------------------------------------------- containment / prefix laws

  private val setGen: Gen[Set[Int]] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 15)).map(_.toSet))

  property("containment >= jaccard for every pair, so Jaccard-threshold " +
      "pairs are a subset of containment-threshold pairs at the same t " +
      "(the dedup_containment motivation)") =
    forAll(setGen, setGen) { (a, b) =>
      val inter = (a & b).size.toDouble
      val jac = inter / (a | b).size
      val cont = inter / math.min(a.size, b.size)
      cont >= jac
    }

  private val thresholdGen: Gen[Double] =
    Gen.chooseNum(1, 1000000).map(_ / 1000000.0)
  private val szGen: Gen[Int] = Gen.chooseNum(1, 10000)

  /** The SHIPPED integer prefix keep-count core (DedupSpec pins the
    * Column expr to this same function over a sz sweep).
    */
  private def keepInt(t: Double, sz: Int): Long =
    Dedup.prefixKeepCountInt(t, sz)

  /** ceil(t·sz) in EXACT rational arithmetic (t is a binary rational). */
  private def ceilExact(t: Double, sz: Int): Long =
    new java.math.BigDecimal(t)
      .multiply(new java.math.BigDecimal(sz))
      .setScale(0, java.math.RoundingMode.CEILING).longValueExact()

  property("integer prefix keep-count is recall-safe: at least as long " +
      "as the exact AllPairs bound sz - ceil(t*sz) + 1, and at most one " +
      "element longer (the double-ceil overshoot fix)") =
    forAll(thresholdGen, szGen) { (t, sz) =>
      val exact = sz - ceilExact(t, sz) + 1
      val got = keepInt(t, sz)
      got >= exact && got <= exact + 1
    }

  property("prefix pigeonhole: a pair with containment >= t shares >= " +
      "ceil(t*min) elements, and the keep-count prefix of the smaller " +
      "set cannot avoid the intersection (keep + ceil(t*sz) >= sz + 1)") =
    forAll(thresholdGen, szGen) { (t, sz) =>
      keepInt(t, sz) + ceilExact(t, sz) >= sz + 1
    }

  // ------------------------------------------------- Poisson bootstrap laws

  private val cdf = Diagnostics.PoissonCdf1.map(_.toDouble)

  /** The SHIPPED inverse-CDF ladder (Diagnostics.poissonInv1). */
  private def ladder(u: Double): Int = Diagnostics.poissonInv1(u).toInt

  property("Poisson ladder is the inverse CDF: w = k iff " +
      "cdf(k-1) <= u < cdf(k), and the tail folds into w = 8") =
    forAll(Gen.chooseNum(0L, (1L << 32) - 1)) { h =>
      val u = h.toDouble / 4294967296.0
      val w = ladder(u)
      val lo = if (w == 0) 0.0 else cdf(w - 1)
      val hi = if (w == cdf.size) 1.0 else cdf(w)
      w >= 0 && w <= 8 && lo <= u && u < hi
    }

  property("Poisson ladder is monotone in u (a deterministic hash " +
      "ordering can never invert multiplicities)") =
    forAll(Gen.chooseNum(0.0, 0.9999999), Gen.chooseNum(0.0, 0.9999999)) {
      (u1, u2) =>
        val (lo, hi) = if (u1 <= u2) (u1, u2) else (u2, u1)
        ladder(lo) <= ladder(hi)
    }

  property("constant metric collapses every replicate mean exactly (the " +
      "bootstrap_ci spec claim, at any weight vector)") =
    forAll(Gen.chooseNum(0L, 1000L),
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 8L))) { (x, ws) =>
      val sw = ws.sum
      sw == 0 || (ws.map(_ * x).sum.toDouble / sw.toDouble) == x.toDouble
    }

  // -------------------------------------------- Hellinger / TV divergence

  private val countsGen: Gen[Map[Int, Long]] =
    Gen.mapOf(Gen.zip(Gen.chooseNum(0, 20), Gen.chooseNum(1L, 50L)))
      .suchThat(_.nonEmpty)

  /** The operator's quantized sums (TextIndex.corpusDivergenceFromCounts
    * tail) over two count maps.
    */
  private def divergence(a: Map[Int, Long], b: Map[Int, Long])
      : (Double, Double) = {
    val scale = math.pow(2, 40)
    val na = a.values.sum.toDouble
    val nb = b.values.sum.toDouble
    val terms = a.keySet ++ b.keySet
    var sh = 0L
    var stv = 0L
    terms.toSeq.sorted.foreach { t =>
      val p = a.get(t).fold(0.0)(_.toDouble / na)
      val q = b.get(t).fold(0.0)(_.toDouble / nb)
      sh += math.round((math.sqrt(p) - math.sqrt(q)) *
        (math.sqrt(p) - math.sqrt(q)) * scale)
      stv += math.round(math.abs(p - q) * scale)
    }
    (math.sqrt(sh.toDouble / scale * 0.5), stv.toDouble / scale * 0.5)
  }

  property("divergence is symmetric: H(a,b) == H(b,a) and TV(a,b) == " +
      "TV(b,a) bit-for-bit (the per-term chains are symmetric under swap)") =
    forAll(countsGen, countsGen) { (a, b) =>
      divergence(a, b) == divergence(b, a)
    }

  property("divergence of a corpus against itself is exactly zero") =
    forAll(countsGen) { a => divergence(a, a) == ((0.0, 0.0)) }

  property("divergence bounds: 0 <= H <= 1 and 0 <= TV <= 1 (up to one " +
      "quantization ulp, absorbed by the 2^40 grid)") =
    forAll(countsGen, countsGen) { (a, b) =>
      val (h, tv) = divergence(a, b)
      h >= 0.0 && h <= 1.0000001 && tv >= 0.0 && tv <= 1.0000001
    }

  // -------------------------------------------------- conformal index law

  property("conformal order-statistic index equals exact rational " +
      "ceil((1-a)(n+1)) and stays within [1, n+1] (the double-alpha flip " +
      "the operator doc warns about cannot happen in integer form)") =
    forAll(Gen.chooseNum(1, 99), Gen.chooseNum(0L, 100000L)) { (num, n) =>
      val den = 100
      val idx = ((den - num).toLong * (n + 1) + den - 1) / den
      val exact = BigInt((den - num).toLong) * BigInt(n + 1)
      val ceilExact =
        if (exact % den == 0) exact / den else exact / den + 1
      idx == ceilExact.toLong && idx >= 1 && idx <= n + 1
    }
}
