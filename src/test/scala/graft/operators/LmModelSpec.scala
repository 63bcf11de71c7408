package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The frozen-LM composition: model counts are additive (incremental
  * maintenance = fold, never rebuild), and scoring a corpus against a
  * model trained elsewhere handles unseen bigrams and OOV tokens at the
  * documented costs.
  */
class LmModelSpec extends SparkSpec {
  import spark.implicits._

  private def counts(rows: Seq[String]) =
    TextIndex.bigramLmCounts(rows.toDF("text"), col("text"))

  private def toMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap

  test("bigramLmCounts is additive: fold(counts(A), counts(B)) equals a " +
      "clean rebuild over A union B, either fold order") {
    val a = Seq("a b a b", "c d")
    val b = Seq("a b c", "d")
    val rebuilt = toMap(counts(a ++ b))
    assert(toMap(TextIndex.foldLmCounts(counts(a), counts(b))) === rebuilt)
    assert(toMap(TextIndex.foldLmCounts(counts(b), counts(a))) === rebuilt)
  }

  test("lmScoreAgainst a FROZEN model: seen bigrams cost the model's " +
      "bits, unseen bigrams back off, OOV tokens floor at the 1+log2(N) " +
      "maximum") {
    // model corpus: c1 a=3 b=3 c=1, N=7; c2 (a b)=3 (b a)=1 (b c)=1
    val model = counts(Seq("a b a b", "a b c"))
    val docs = Seq(
      (1L, "a b x"), // (a b): flog2(3)-flog2(3)=0; (b x): 1+flog2(7)-0=3
      (2L, "x y")    // (x y) both OOV: 1+flog2(7)-flog2(1)=3
    ).toDF("id", "text")
    val out = TextIndex.lmScoreAgainst(docs, col("id"), col("text"), model,
        thresholdBits = 2.0)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 2L, 3L, 1.5, true)))
    assert(out(1) === ((2L, 1L, 3L, 3.0, false)))
  }

  test("selfCounts mode through the shared chain reproduces " +
      "lmPerplexityScreen exactly") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"), (4L, ""))
      .toDF("id", "text")
    val direct = TextIndex.lmPerplexityScreen(docs, col("id"), col("text"),
        thresholdBits = 1.5)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val composed = TextIndex.lmScoreAgainst(docs, col("id"), col("text"),
        TextIndex.bigramLmCounts(docs, col("text")), thresholdBits = 1.5,
        selfCounts = true)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(direct === composed)
  }
}
