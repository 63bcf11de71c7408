package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times unigram-LM trainer runs at growing vocabulary budgets and
  * compares the two tokenizer families' corpus fertility on the same
  * word dictionary — the measurement behind choosing BPE vs unigram for
  * a production vocab ([[graft.operators.Unigram]]'s BpeTrainBench twin).
  *
  * {{{ sbt "runMain graft.tools.UnigramTrainBench /root/testdata/sf0.1 256 6" }}}
  */
object UnigramTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val vocabExtra = args.lift(1).map(_.toInt).getOrElse(256)
    val maxPieceLen = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = graft.GraftSession.configure(
      SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val dictDf = graft.operators.Bpe.wordCounts(
      spark.read.parquet(s"$dir/documents.parquet"), col("text"))
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
