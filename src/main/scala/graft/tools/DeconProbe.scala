package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the exact-vs-LSH semantic-decontamination trade at
  * corpus-sized needle sets — the regime
  * [[graft.operators.Dedup.semanticDecontaminateLsh]] exists for. The
  * exact screen pays |corpus| × |needles| cosines however small each one
  * is; the bucketed screen pays each doc's bucket occupancy. Run against
  * a stress dir to scale both sides:
  *
  * {{{ sbt "runMain graft.tools.DeconProbe /tmp/graft_stress/x16" }}}
  *
  * Prints one JSON line {"n_corpus":…,"n_needles":…,"exact_sec":…,
  * "lsh_sec":…,"lsh_flagged":…,"exact_flagged":…,"recall":…} — recall is
  * flagged-set recall of the LSH screen vs the exact one (precision is
  * exact by construction).
  */
object DeconProbe {

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

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    def time(f: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val flagged = f.filter(col("contaminated")).count()
      ((System.nanoTime() - t0) / 1e9, flagged)
    }

    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))

    def probe(regime: String, corpus: org.apache.spark.sql.DataFrame,
        needles: org.apache.spark.sql.DataFrame): Unit = {
      val nC = corpus.count()
      val nN = needles.count()
      if (nC == 0 || nN == 0) {
        // an x1 dir has no replicas — regime 2's split is empty there; a
        // vacuous {recall: 1.0} row must not look like an adjudication
        println(s"""{"regime":"$regime","n_corpus":$nC,"n_needles":$nN,""" +
          """"skipped":"degenerate split — nothing to screen"}""")
        return
      }
      val (lshSec, lshFlagged) = time(
        graft.operators.Dedup.semanticDecontaminateLsh(
          corpus, col("vec_id"), col("embedding"),
          needles, col("vec_id"), col("embedding"), threshold = 0.9))
      val (exSec, exFlagged) = time(
        graft.operators.Dedup.semanticDecontaminate(
          corpus, col("vec_id"), col("embedding"),
          needles, col("vec_id"), col("embedding"), threshold = 0.9))
      val recall =
        if (exFlagged == 0) 1.0 else lshFlagged.toDouble / exFlagged
      println(s"""{"regime":"$regime","n_corpus":$nC,"n_needles":$nN,""" +
        s""""exact_sec":${num(exSec)},"lsh_sec":${num(lshSec)},""" +
        s""""exact_flagged":$exFlagged,"lsh_flagged":$lshFlagged,""" +
        s""""recall":${num(recall)}}""")
    }

    // untimed warm-up: whichever screen runs first otherwise pays the
    // one-time codegen/classloading/parquet-footer cost and the printed
    // ratio biases against it (the adjudication readings matter here)
    emb.filter(col("vec_id") < 64).count()
    graft.operators.Dedup.semanticDecontaminateLsh(
        emb.filter(col("vec_id") < 64), col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") < 8), col("vec_id"), col("embedding"),
        threshold = 0.9)
      .count()
    graft.operators.Dedup.semanticDecontaminate(
        emb.filter(col("vec_id") < 64), col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") < 8), col("vec_id"), col("embedding"),
        threshold = 0.9)
      .count()

    // regime 1 — the PRODUCT shape: small fixed benchmark (the base
    // snapshot, rep 0) vs the replica corpus; every replica is an
    // epsilon-perturbation of a base vector, so recall reads on a corpus
    // saturated with true near-needles. Exact wins here — that is the
    // point of keeping both paths.
    probe("fixed_needles",
      emb.filter(col("vec_id") >= graft.Stress.IdStride),
      emb.filter(col("vec_id") < graft.Stress.IdStride))

    // regime 2 — the SCALE shape the LSH variant exists for: both sides
    // corpus-sized (replica halves; same-base near-dups cross the split),
    // where the exact screen's |corpus|×|needles| cosines blow up
    // integral div — Column./ is double division (the retention-cohorts
    // nanosecond gotcha; harmless at these magnitudes but keep the idiom)
    val rep = expr(s"vec_id div ${graft.Stress.IdStride}")
    val mid = emb.select(max(rep).as("m")).head().getLong(0) / 2
    probe("corpus_needles",
      emb.filter(rep > mid), emb.filter(rep <= mid))
    spark.stop()
  }
}
