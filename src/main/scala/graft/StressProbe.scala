package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off strategy probe over the stress-scaled documents: times
  * jaccardPairs under each strategy at a given scale so the `auto`
  * trigger's switch point is set from measurements, not guesses.
  * Usage: runMain graft.StressProbe /tmp/graft_stress/x16 count|prefix
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val strategy = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    // Unbounded: the probe measures the STRATEGY's cost — letting the
    // default budget degrade the index would time the sampled join and
    // corrupt the count-vs-prefix switch-point measurements
    val n = graft.operators.Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
      shingleK = 3, threshold = 0.5, strategy = strategy,
      pairBudget = graft.operators.Dedup.PairBudget.Unbounded).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"strategy":"$strategy","pairs":$n,"sec":$sec%.2f}""")
    spark.stop()
    sys.exit(0)
  }
}
