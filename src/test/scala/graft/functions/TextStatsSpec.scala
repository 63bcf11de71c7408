package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextStats
import graft.SparkSpec

/** The native one-pass TextStats expression must agree exactly with the
  * column-composed TextFunctions formulations (the executable spec that the
  * DuckDB oracle mirrors).
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox",
    "",
    "   ",
    "a",
    "der die das und oder",
    "el la de a en es por",
    "le la les et ou de à",
    "x1y2z3 !!! ??? abc123",
    "  padded   with   spaces  ",
    "tab\tseparated\ttokens",
    "symbols #$% mixed 42 with, punctuation!",
    "ümlauts öre åre — unicode § chars",
    "1 2 3 4 5 6 7 8 9 10")

  test("TextStats agrees with the TextFunctions column spec on all fields") {
    import TextFunctions._
    val df = samples.toDF("text")
    val both = df.select(
      TextStats.textStats(col("text")).as("native"),
      struct(
        tokenCountWs(col("text")).cast("int").as("n_tok"),
        tokenCountBpe(col("text")).cast("int").as("n_tok_bpe"),
        punctRatio(col("text")).as("punct_ratio"),
        stopwordRatio(col("text")).as("stop_ratio"),
        meanTokenLen(col("text")).as("mean_tok_len"),
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("lang_pred")).as("spec"),
      col("text"))
    both.collect().foreach { r =>
      assert(r.getStruct(0) === r.getStruct(1), s"text=<${r.getString(2)}>")
    }
  }

  test("langId discriminates genuinely multilingual text, including zh " +
      "via CJK characters, and native TextStats agrees") {
    import TextFunctions._
    val fixtures = Seq(
      ("the cat sat on the mat and it was warm", "en"),
      ("der Hund und die Katze sind bei dem Haus", "de"),
      ("el perro y la casa en la calle con los amigos", "es"),
      ("le chien et la maison sur la rue avec les amis", "fr"),
      ("这是一个中文句子没有空格也没有停用词", "zh"),
      ("mixed 中文 with the english words around it the the", "en"),
      ("xyzzy qwerty 12345", "und"),
      ("", "und"),
      (null, null)) // null text → null label, never a confident language
    val got = fixtures.map(_._1).toDF("text")
      .select(col("text"), langId(col("text")).as("pred"),
        TextStats.textStats(col("text")).getField("lang_pred").as("native"))
      .collect()
    got.zip(fixtures).foreach { case (r, (text, expect)) =>
      assert(r.getString(1) === expect, s"text=<$text>")
      assert(r.getString(2) === expect, s"native disagrees on <$text>")
    }
    // the native one-pass scorer agrees with the HOF spec field-for-field
    // (non-null texts: null-in yields a null STRUCT natively vs a struct
    // of null fields from the column composition — langId guards both)
    val scores = fixtures.map(_._1).filter(_ != null).toDF("text")
      .select(col("text"),
        org.apache.spark.sql.graft.LangScores.langScores(col("text")).as("n"),
        langScores(col("text")).as("s"))
      .collect()
    scores.foreach { r =>
      assert(r.getStruct(1) === r.getStruct(2),
        s"LangScores native != spec on <${r.getString(0)}>")
    }
    // zh evidence is per CHARACTER: 2 ideographs beat 1 stopword hit
    val zhWins = Seq("the 中文").toDF("text")
      .select(langId(col("text"))).head().getString(0)
    assert(zhWins === "zh")
  }

  test("NfcNormalize composes decomposed accents; ASCII passes through; " +
      "composed == decomposed after normalization") {
    import spark.implicits._
    val df = Seq(
      ("plain ascii", "plain ascii"),
      ("caf\u00e9", "cafe\u0301"), // composed vs decomposed é
      ("\u00c5ngstr\u00f6m", "A\u030angstro\u0308m") // composed vs decomposed
    ).toDF("a", "b")
    val out = df.select(
      TextStats.nfcNormalize(col("a")).as("na"),
      TextStats.nfcNormalize(col("b")).as("nb"))
      .as[(String, String)].collect()
    out.foreach { case (na, nb) => assert(na === nb) }
    assert(out(0)._1 === "plain ascii")
    assert(out(1)._1 === "caf\u00e9") // normalized to the composed form
  }

  test("charNgrams: code-point trigrams match SQL substring semantics, " +
      "including astral chars; short and empty strings give empty") {
    import spark.implicits._
    val df = Seq("abcde", "ab", "", "a\ud83d\ude00b\u00e9c").toDF("t")
    val got = df.select(TextStats.charNgrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) === Seq("abc", "bcd", "cde"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
    // "a\ud83d\ude00b\u00e9c" has 5 code points: a, \ud83d\ude00, b, \u00e9, c \u2192 3 trigrams, each
    // slicing the surrogate pair whole (substring semantics)
    assert(got(3) === Seq("a\ud83d\ude00b", "\ud83d\ude00b\u00e9", "b\u00e9c"))
    // parity with Spark SQL's own substring over the same code points
    val viaSql = df.filter(length(col("t")) >= 3)
      .select(col("t"), explode(sequence(lit(1),
        length(col("t")) - 2)).as("i"))
      .select(expr("substring(t, i, 3)").as("g"))
      .as[String].collect().toSet
    val viaNative = df.select(explode(
      TextStats.charNgrams(col("t"), 3)).as("g")).as[String].collect().toSet
    assert(viaNative === viaSql)
  }
}
