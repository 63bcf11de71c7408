package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regenerates [[graft.queries.PinnedArtifacts.LangFastFixtureDims]]: the
  * fast-family featurizer output (native xxhash64 CharNgramDimCounts) over
  * the fixed `LangFastFixture` corpus, printed as the Scala literal rows to
  * paste back. The [[TrainArtifacts]] companion for the
  * `lang_classifier_fast` gate — run it ONLY when the fixture texts or the
  * featurizer contract (n, dims, hash) deliberately change; the
  * TextClassifierSpec pin-equality test is what makes an ACCIDENTAL change
  * loud.
  *
  * {{{ sbt "runMain graft.tools.FixtureDims" }}}
  */
object FixtureDims {

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.configure(
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val P = graft.queries.PinnedArtifacts
    val df = P.LangFastFixture.toDF("doc_id", "lang", "text")
    val dims = graft.operators.TextClassifier.hashedGramCounts(
        df, col("doc_id"), col("text"),
        n = P.LangLrGramN, dims = P.LangLrDims, family = "fast")
      .orderBy(col("id"), col("dim"))
      .as[(Long, Long, Long)].collect()
    println("// ---- Scala literal: LangFastFixtureDims")
    dims.foreach { case (id, d, c) => println(s"    (${id}L, $d, ${c}L),") }
    spark.stop()
  }
}
