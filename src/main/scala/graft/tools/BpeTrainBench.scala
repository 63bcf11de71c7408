package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times production-sized BPE vocabulary training on the documents table —
  * the measurement behind the BASELINE.md claim that large merge counts are
  * feasible. Compares the three trainers at the same merge count:
  * sequential (one argmax job per merge — the known job-count wall),
  * batched (one counting job per `batch` merges), and local (one collect,
  * incremental counts — zero jobs per merge, exact sequential semantics).
  *
  * {{{ sbt "runMain graft.tools.BpeTrainBench /root/testdata/sf0.1 512 32" }}}
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val merges = args.lift(1).map(_.toInt).getOrElse(512)
    val batch = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = graft.GraftSession.configure(
      SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val dict = graft.operators.Bpe.wordCounts(
      spark.read.parquet(s"$dir/documents.parquet"), col("text"))
      .localCheckpoint()

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    val local = time(s"local     ($merges merges)") {
      graft.operators.Bpe.trainBpeLocal(dict, merges)
    }
    val batched = time(s"batched   ($merges merges, batch=$batch)") {
      graft.operators.Bpe.trainBpeBatched(dict, merges, batch)
    }
    if (args.lift(3).contains("seq")) time(s"sequential ($merges merges)") {
      graft.operators.Bpe.trainBpe(dict, merges)
    }
    println(s"local learned ${local.size}, batched learned ${batched.size}, " +
      s"first divergence at " +
      local.zip(batched).indexWhere { case (a, b) => a != b })
    spark.stop()
  }
}
