package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K-scaling probe for semantic dedup: times
  * [[graft.operators.Dedup.semanticDedup]] over a stress-scaled embeddings
  * table at several quantizer sizes, demonstrating the SemDeDup contract
  * that K must grow with n — the pair scan is Σ cluster² ≈ n²/K, so a K
  * pinned at the oracle's 16 goes quadratic at ×64 (measured 91.8 s in
  * stress_x64.json) while K ∝ n restores the linear shape. Centroids here
  * are modulus-sampled corpus vectors (deterministic, training-free) —
  * the quantizer QUALITY doesn't matter for the cost shape, only its
  * size. Usage: runMain graft.tools.SemanticProbe /tmp/graft_stress/x64 [Ks...]
  */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress/x64")
    val ks = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(16, 256, 2048)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = emb.count()
    println(s"PROBE corpus rows=$n")

    ks.foreach { k =>
      // deterministic HASH-sampled quantizer of size ~k (training-free;
      // cost shape depends on K, not centroid quality). Hash, NOT id
      // modulus: the stress corpus's replica ids are stride-structured, so
      // a modulus sampler picks replicas of ONE vector — near-identical
      // centroids collapse the corpus into a single cluster and the pair
      // scan goes n² (measured: the K=16 modulus probe never finished at
      // ×64). The same dense/structured-id footgun as the round-8
      // quantizer-selection fix.
      val step = math.max(1L, n / k)
      val cents = emb.filter(pmod(
          graft.functions.TextFunctions.hash32(col("vec_id").cast("string")),
          lit(step)) === 0)
        .limit(k)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        .cache()
      val kActual = cents.count()
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val out = graft.operators.Dedup.semanticDedup(
          emb, col("vec_id"), col("embedding"), cents, threshold = 0.95)
        val kept = out.filter(col("kept")).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE K=$kActual pass$pass kept=$kept sec=$sec%.2f")
      }
      cents.unpersist()
    }
    spark.stop()
  }
}
