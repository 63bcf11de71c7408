package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the md5-vs-fast featurize trade for the pinned linear
  * classifier at stress scale — the regime the native
  * [[org.apache.spark.sql.graft.CharNgramDimCounts]] kernel exists for:
  * `lang_classifier`'s cost is ~600 grams/doc × one md5 each (the
  * round-16 stress band read 142–146 s at ×64, linear, featurize-bound),
  * while the fast family hashes the same grams with xxhash64 straight
  * off the UTF-8 bytes and finishes each document's counts at map time.
  *
  * {{{ sbt "runMain graft.tools.FeaturizeProbe /tmp/graft_stress/x16" }}}
  *
  * Prints one JSON line {"n_docs":…,"md5_sec":…,"fast_sec":…,
  * "speedup":…,"agree":…} — each family scored with ITS OWN pinned
  * weights ([[graft.queries.PinnedArtifacts.LangLrWeights]] /
  * `LangLrWeightsFast`), timed over the full classify → argmax chain
  * (min of two passes, like Bench), plus the prediction-agreement count
  * as a sanity readout.
  */
object FeaturizeProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress/x16")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)

    import graft.queries.PinnedArtifacts._
    val docs = graft.queries.T(spark, dir, "documents")
    val nDocs = docs.count()

    def classified(family: String) = {
      val w = if (family == "md5") LangLrWeights else LangLrWeightsFast
      graft.operators.TextClassifier.classifyLinearPinned(
        docs, col("doc_id"), col("text"), w,
        n = LangLrGramN, dims = LangLrDims, family = family)
    }
    def time(family: String): Double =
      (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        classified(family).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    val md5Sec = time("md5")
    val fastSec = time("fast")
    val agree = classified("md5").select(col("id"), col("pred").as("p1"))
      .join(classified("fast").select(col("id"), col("pred").as("p2")),
        Seq("id"))
      .filter(col("p1") === col("p2")).count()

    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    println(s"""{"n_docs":$nDocs,"md5_sec":${num(md5Sec)},""" +
      s""""fast_sec":${num(fastSec)},"speedup":${num(md5Sec / fastSec)},""" +
      s""""agree":$agree}""")
    spark.stop()
  }
}
