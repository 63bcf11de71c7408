package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  private val th = QualityFilter.Thresholds(
    minTokens = 4, maxTokens = 20, minStopRatio = 0.0, maxPunctRatio = 0.4,
    minMeanTokLen = 2.0, maxMeanTokLen = 8.0, maxDupFrac = 0.3,
    maxTopFrac = 0.6)

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"), // clean
    (2L, "hi"),                                           // too few tokens
    (3L, "!!! ??? ... !!! ??? abc def ghi"),              // punct-heavy
    (4L, "same thing here. same thing here. same thing here. other bit"), // repeated segments
    (5L, "one " * 25)                                     // too many tokens
  ).toDF("doc_id", "text")

  test("each rule fires on its planted document, with the right reason") {
    val out = QualityFilter.filterWithReasons(docs, col("doc_id"), col("text"), th)
      .select(col("id"), col("kept"), col("reasons"))
      .as[(Long, Boolean, Seq[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 === true && out(1L)._3.isEmpty)
    assert(out(2L)._2 === false && out(2L)._3.contains("too_few_tokens"))
    assert(out(3L)._2 === false && out(3L)._3.contains("high_punct_ratio"))
    assert(out(4L)._2 === false && out(4L)._3.contains("repeated_segments"))
    assert(out(5L)._2 === false && out(5L)._3.contains("too_many_tokens"))
  }

  test("ruleHits: n_hits counts every firing, n_solo only documents the " +
      "rule rejects alone; clean docs count in n_docs only") {
    // doc 2 (too_few_tokens, solo), doc 3 (high_punct + mean_tok_len ... ),
    // compute from the planted fixture: read the verdicts first, then
    // assert the audit agrees with them exactly
    val verdicts = QualityFilter
      .filterWithReasons(docs, col("doc_id"), col("text"), th)
      .select(col("reasons")).as[Seq[String]].collect()
    val expHits = verdicts.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val expSolo = verdicts.filter(_.size == 1).flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val out = QualityFilter.ruleHits(docs, col("doc_id"), col("text"), th)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSet === expHits.keySet)
    out.foreach { case (rule, hits, solo, nDocs, rate) =>
      assert(hits === expHits(rule), rule)
      assert(solo === expSolo.getOrElse(rule, 0L), rule)
      assert(nDocs === 5L)
      assert(rate === hits.toDouble / 5.0)
    }
    // the fixture must exercise BOTH branches: some rule fires solo,
    // some rule shares its rejections
    assert(out.exists(r => r._3 > 0), "need a solo-firing rule")
    assert(out.exists(r => r._2 > r._3), "need a co-firing rule")
  }

  test("dominant_segment needs more than one segment") {
    // one segment repeated 3 of 4 times: top_frac = 0.75 > 0.6 with n_seg=4
    val dom = Seq((1L, "aa bb. aa bb. aa bb. cc dd")).toDF("doc_id", "text")
    val loose = th.copy(minTokens = 1, maxDupFrac = 1.0)
    val reasons = QualityFilter.filterWithReasons(dom, col("doc_id"), col("text"), loose)
      .select(col("reasons")).as[Seq[String]].head()
    assert(reasons.contains("dominant_segment"))
    // a single-segment doc (top_frac = 1.0 by construction) must NOT fire it
    val single = Seq((1L, "just one segment of ordinary text here")).toDF("doc_id", "text")
    val r2 = QualityFilter.filterWithReasons(single, col("doc_id"), col("text"), loose)
      .select(col("reasons")).as[Seq[String]].head()
    assert(!r2.contains("dominant_segment"))
  }

  test("filter keeps exactly the kept ids with original columns") {
    val kept = QualityFilter.filter(docs, col("doc_id"), col("text"), th)
      .select(col("doc_id")).as[Long].collect().sorted
    assert(kept === Array(1L))
  }

  test("reasons appear in fixed rule order") {
    val multi = Seq((1L, "x!")).toDF("doc_id", "text") // few tokens + punct + short tokens
    val loose = th.copy(maxPunctRatio = 0.1)
    val reasons = QualityFilter.filterWithReasons(multi, col("doc_id"), col("text"), loose)
      .select(col("reasons")).as[Seq[String]].head()
    assert(reasons === reasons.sortBy(Seq("too_few_tokens", "too_many_tokens",
      "low_stopword_ratio", "high_punct_ratio", "mean_tok_len_out_of_range",
      "repeated_segments", "dominant_segment").indexOf))
    assert(reasons.head === "too_few_tokens")
  }

  test("mixedLanguageReport: code-switched docs flag mixed with the " +
      "majority language primary; monolingual and blank docs do not") {
    import spark.implicits._
    // 16-token windows: doc 1 = two English windows + one German window;
    // doc 2 = one English window; doc 3 = blank
    val en16 = Seq.fill(8)("the cat").mkString(" ")    // 16 tokens, 8 'the' hits
    val de16 = Seq.fill(8)("der hund").mkString(" ")
    val df = Seq(
      (1L, s"$en16 $en16 $de16"),
      (2L, en16),
      (3L, "")).toDF("doc_id", "text")
    val out = QualityFilter.mixedLanguageReport(df, col("doc_id"),
        col("text"), window = 16)
      .as[(Long, Long, Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 3L, 2L, "en", true)))
    assert(out(2L) === ((2L, 1L, 1L, 1L, "en", false)))
    assert(out(3L) === ((3L, 1L, 0L, 0L, "und", false)))
  }

  test("WindowedLangLabels equals the chunks->langId HOF composition it " +
      "replaced (the executable spec), over random multi-script inputs " +
      "including blanks, partial windows, and odd whitespace") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val words = Seq("the", "and", "der", "und", "el", "la", "le", "les",
      "一二三", "word", "zx", "", "\tq", "x y")
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    } :+ ((200L, "")) :+ ((201L, "   "))
    val df = docs.toDF("doc_id", "text")
    val toks = graft.functions.TextFunctions.tokensWs(col("text"))
    val native = df.select(col("doc_id"),
        org.apache.spark.sql.graft.WindowedLangLabels
          .windowedLangLabels(toks, 7).as("l"))
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    val hof = TextIndex.chunks(df, col("doc_id"), col("text"), 7, 7)
      .select(col("id"), col("chunk_id"),
        graft.functions.TextFunctions.langId(col("chunk")).as("lang"))
      .as[(Long, Int, String)].collect().groupBy(_._1)
      .map { case (id, xs) => id -> xs.sortBy(_._2).map(_._3).toSeq }
    native.foreach { case (id, ls) =>
      assert(hof(id) === ls, s"doc $id diverged")
    }
  }

  test("docCompressibility: hand gram counts, repetitive text scores " +
      "low, natural text high, short docs get NULL ratio") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaaaa"),        // 10 chars -> 3 distinct? no: all "aaaaaaaa"
      (2L, "abcdefghij"),        // all 3 8-grams distinct
      (3L, "short"))             // < 8 chars -> 0 grams, NULL ratio
      .toDF("doc_id", "text")
    val got = graft.operators.QualityFilter.docCompressibility(
        docs, col("doc_id"), col("text"), n = 8)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    // doc1: 3 grams, all "aaaaaaaa" -> 1 distinct -> ratio 1/3
    assert(got(0) === ((1L, 3L, 1L, Some(1.0 / 3.0))))
    // doc2: 3 grams, 3 distinct -> 1.0
    assert(got(1) === ((2L, 3L, 3L, Some(1.0))))
    assert(got(2) === ((3L, 0L, 0L, None)))
  }

  test("docCompressibility separates keyword stuffing from prose") {
    import spark.implicits._
    val stuffed = "buy cheap " * 40            // heavy window re-use
    val prose = (1 to 80).map(i => s"w$i").mkString(" ") // all-fresh windows
    val got = graft.operators.QualityFilter.docCompressibility(
        Seq((1L, stuffed), (2L, prose)).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._4.get).toMap
    assert(got(1L) < 0.1)
    assert(got(2L) > 0.9)
  }
}
