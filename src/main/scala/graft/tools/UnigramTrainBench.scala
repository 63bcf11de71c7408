package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times unigram-LM trainer runs at growing vocabulary budgets and
  * compares the two tokenizer families' corpus fertility on the same
  * word dictionary — the measurement behind choosing BPE vs unigram for
  * a production vocab ([[graft.operators.Unigram]]'s BpeTrainBench twin).
  *
  * {{{ sbt "runMain graft.tools.UnigramTrainBench /root/testdata/sf0.1 256 6" }}}
  *
  * The driver fixtures have CLOSED vocabularies (sf0.1: 31 distinct
  * words; stress ×16: 47) — useless for bounding the driver-local
  * trainer at production dictionary sizes. A fourth argument > 0
  * swaps in a deterministic synthetic Zipf dictionary of that many
  * distinct words (seeded; 3–12-char words over a letter distribution,
  * frequency ∝ 1/rank — the Heaps/Zipf shape a real crawl dictionary
  * has), so the 10⁵-word trainer bound is measurable:
  *
  * {{{ sbt "runMain graft.tools.UnigramTrainBench - 8192 8 100000" }}}
  */
object UnigramTrainBench {

  /** Deterministic Zipf dictionary: `w` distinct words, frequency
    * ⌈w/rank⌉ — ~w·ln(w) total occurrences, the rank-frequency shape of
    * a natural-language dictionary.
    */
  private def zipfDict(w: Int, seed: Long): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    val letters = "etaoinshrdlcumwfgypbvkjxqz"
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < w) {
      val len = 3 + rnd.nextInt(10)
      seen += (0 until len).map(_ =>
        letters(math.min(rnd.nextInt(letters.length),
          rnd.nextInt(letters.length)))).mkString
    }
    seen.iterator.zipWithIndex
      .map { case (word, r) => (word, (w.toLong / (r + 1)).max(1L)) }.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val vocabExtra = args.lift(1).map(_.toInt).getOrElse(256)
    val maxPieceLen = args.lift(2).map(_.toInt).getOrElse(6)
    val synthWords = args.lift(3).map(_.toInt).getOrElse(0)
    val spark = graft.GraftSession.configure(
      SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import spark.implicits._
    val dictDf = (if (synthWords > 0)
      zipfDict(synthWords, seed = 42L).toDF("word", "n")
        .withColumn("syms", // wordCounts' symbol column, for the BPE twin
          concat(filter(split(col("word"), ""), s => length(s) > 0),
            array(lit(graft.operators.Bpe.EndMark))))
    else graft.operators.Bpe.wordCounts(
      spark.read.parquet(s"$dir/documents.parquet"), col("text")))
      .localCheckpoint()
    val dict = dictDf.select(col("word"), col("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    println(s"dictionary: ${dict.size} distinct words, " +
      s"${dict.map(_._2).sum} occurrences")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    def fertility(nSub: String => Int): Double = {
      val toks = dict.map { case (w, f) => f * nSub(w) }.sum
      toks.toDouble / dict.map(_._2).sum
    }

    // unigram at the requested budget (+ the pinned 48 for reference)
    Seq(48, vocabExtra).distinct.foreach { extra =>
      val pieces = time(s"unigram train (chars + $extra pieces, " +
          s"maxLen=$maxPieceLen)") {
        graft.operators.Unigram.trainUnigram(dict, vocabExtra = extra,
          maxPieceLen = maxPieceLen)
      }
      val costs = graft.operators.Unigram.toCosts(pieces).toMap
      val fert = fertility(w =>
        graft.operators.Unigram.segmentCost(w, costs, maxPieceLen)._1)
      println(f"  unigram fertility (tokens/word): $fert%.4f " +
        s"(${pieces.size} pieces)")
    }

    // BPE at a comparable merge budget, via the exact local trainer
    val merges = time(s"bpe local train ($vocabExtra merges)") {
      graft.operators.Bpe.trainBpeLocal(dictDf, vocabExtra)
    }
    val bpeFert = fertility(w =>
      graft.operators.Bpe.applyMerges(w, merges).size)
    println(f"  bpe fertility (tokens/word):     $bpeFert%.4f " +
      s"(${merges.size} merges)")

    spark.stop()
  }
}
