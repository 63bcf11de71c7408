package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the dedup_incremental path at sf0.1 — times the
  * state build, the within-batch pair generation, the components loop and
  * the full operator separately, so a bench regression can be attributed
  * to a phase instead of guessed at.
  * Run: `runMain graft.tools.IncrementalProbe [sfDir]`.
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val batch = docs.filter(col("doc_id") >= 250)

    // phase 1: admitted-corpus state build (docs < 250)
    val state = time("state_build") {
      val st = graft.operators.Dedup.NearDupState.build(
        docs.filter(col("doc_id") < 250), col("doc_id"), col("text"))
      st.bands.count(); st.postings.count()
      st
    }

    // phase 2: within-batch verified pairs (signature pass + LSH + verify —
    // same parameters as minHashIncremental's internal collapse)
    val pairs = time("within_batch_pairs") {
      val p = graft.operators.Dedup.minHashPairs(
          batch, col("doc_id"), col("text")).localCheckpoint()
      System.err.println(s"PROBE pair_count ${p.count()}")
      p
    }

    // phase 3: components over the batch pairs (the star loop under test)
    time("components") {
      graft.operators.Dedup.components(pairs).count()
    }

    // phase 4: the full operator end to end for reference
    time("full_minHashIncremental") {
      val (survivors, _) = graft.operators.Dedup.minHashIncremental(
        batch, col("doc_id"), col("text"), state)
      survivors.count()
    }

    spark.stop()
    sys.exit(0)
  }
}
