package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val toyDict = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
    ("low low", 0L) // zero-freq words contribute nothing
  ).filter(_._2 > 0)

  test("trainUnigram: coverage, normalization, and EM likelihood ascent") {
    val pieces = Unigram.trainUnigram(toyDict, vocabExtra = 8,
      maxPieceLen = 4, seedSize = 64, emIters = 3)
    val probs = pieces.map { case (p, lnp) => p -> math.exp(lnp) }.toMap
    // every corpus character is a piece (coverage is unconditional)
    val chars = toyDict.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(probs.keySet))
    // probabilities normalize
    assert(math.abs(probs.values.sum - 1.0) < 1e-9)
    // more EM iterations never decrease corpus likelihood
    def ll(table: Seq[(String, Double)]): Double = {
      val costs = Unigram.toCosts(table).toMap
      // fixed-point total cost is a monotone proxy for -log-likelihood of
      // the Viterbi segmentation
      -toyDict.map { case (w, f) =>
        f * Unigram.segmentCost(w, costs, 4)._2.toDouble
      }.sum
    }
    val early = Unigram.trainUnigram(toyDict, vocabExtra = 8,
      maxPieceLen = 4, seedSize = 64, emIters = 1)
    assert(ll(pieces) >= ll(early) - 1e-6 * math.abs(ll(early)))
    // determinism: same dictionary -> bit-identical table
    val again = Unigram.trainUnigram(toyDict, vocabExtra = 8,
      maxPieceLen = 4, seedSize = 64, emIters = 3)
    assert(again === pieces)
  }

  test("segmentCost/segment: exact-integer Viterbi with fewest-pieces " +
      "tie-break and UNK fallback") {
    // equal-cost tie: "ab" (20) vs "a"+"b" (10+10) -> fewer pieces wins
    val costs = Map("a" -> 10L, "b" -> 10L, "ab" -> 20L)
    assert(Unigram.segmentCost("ab", costs, 2) === ((1, 20L)))
    assert(Unigram.segment("ab", costs, 2) === Seq("ab"))
    // cheaper composite beats the pair outright
    val cheap = Map("a" -> 10L, "b" -> 10L, "ab" -> 5L)
    assert(Unigram.segmentCost("abab", cheap, 2) === ((2, 10L)))
    assert(Unigram.segment("abab", cheap, 2) === Seq("ab", "ab"))
    // pricier composite loses to singles
    val dear = Map("a" -> 10L, "b" -> 10L, "ab" -> 50L)
    assert(Unigram.segmentCost("ab", dear, 2) === ((2, 20L)))
    // uncovered code point consumes one UnkCost token, only when its
    // single-char piece is absent
    assert(Unigram.segmentCost("axb", costs, 2) ===
      ((3, 20L + Unigram.UnkCost)))
    assert(Unigram.segment("axb", costs, 2) === Seq("a", "x", "b"))
    // segmentation always reconstructs the word
    val trained = Unigram.toCosts(Unigram.trainUnigram(toyDict,
      vocabExtra = 8, maxPieceLen = 4, seedSize = 64, emIters = 3)).toMap
    toyDict.foreach { case (w, _) =>
      assert(Unigram.segment(w, trained, 4).mkString === w)
    }
  }

  test("tokenCounts: per-doc totals via the distinct-word join, empty " +
      "docs report 0; an empty piece table is rejected with a clear error") {
    val costs = Seq(("a", 10L), ("b", 10L), ("ab", 5L), ("c", 10L))
    val err = intercept[IllegalArgumentException] {
      Unigram.tokenCounts(Seq((1L, "x")).toDF("id", "text"),
        col("id"), col("text"), Seq.empty)
    }
    assert(err.getMessage.contains("empty piece table"))
    val docs = Seq((1L, "ab ab c"), (2L, "abab"), (3L, " "))
      .toDF("id", "text")
    val got = Unigram.tokenCounts(docs, col("id"), col("text"), costs)
      .as[(Long, Long)].collect().sortBy(_._1)
    // "ab" -> 1 piece, twice; "c" -> 1; "abab" -> 2
    assert(got === Array((1L, 3L), (2L, 2L), (3L, 0L)))
  }

  test("fertilityByGroup mirrors the BPE diagnostic's shape") {
    val costs = Seq(("a", 10L), ("b", 10L), ("ab", 5L))
    val docs = Seq(("en", "ab ab"), ("en", "a b"), ("de", "abab"))
      .toDF("lang", "text")
    val got = Unigram.fertilityByGroup(docs, col("text"), col("lang"), costs)
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._4, r._5)) ===
      Seq(("de", 1L, 2L), ("en", 4L, 4L)))
  }

  test("greedyCount: longest match wins at each position, UNK consumes " +
      "one code point, and maximal munch can differ from Viterbi") {
    val vocab = Set("ab", "a", "b", "abc", "c")
    assert(Unigram.greedyCount("abcab", vocab, maxPieceLen = 3) === 2) // abc|ab
    assert(Unigram.greedyCount("abq", vocab, maxPieceLen = 3) === 2)   // ab|UNK
    assert(Unigram.greedyCount("qq", vocab, maxPieceLen = 3) === 2)    // UNK|UNK
    assert(Unigram.greedyCount("", vocab, maxPieceLen = 3) === 0)
    // greedy "aa|b" loses to Viterbi "a|ab" when costs favor the split —
    // the divergence the three-entry tokenizer audit is built to show
    val costs = Seq(("a", 1L), ("ab", 1L), ("aa", 100L), ("b", 100L))
    assert(Unigram.greedyCount("aab", costs.map(_._1).toSet, 2) === 2) // aa|b
    assert(Unigram.segmentCost("aab", costs.toMap, 2) === ((2, 2L)))   // a|ab
  }

  test("greedyTokenCounts: per-doc totals via the distinct-word join") {
    val docs = Seq((1L, "abcab abq"), (2L, ""), (3L, "qq qq")).toDF("id", "text")
    val vocab = Seq("ab", "a", "b", "abc", "c")
    val got = Unigram.greedyTokenCounts(docs, col("id"), col("text"), vocab)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 4L), (2L, 0L), (3L, 4L)))
  }
}
