package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit main: dumps `explain("formatted")` for the flagship queries so
  * the physical plans can be reviewed (and diffed across rounds) without a
  * REPL. Usage: `runMain graft.Plans <sfDir> <outFile> [queryName...]`.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("/tmp/plans.txt")
    val names = if (args.length > 2) args.drop(2).toSet else Set(
      "q01_pricing_summary", "q02_revenue_by_nation", "q20_range_join",
      "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
      "sim_bruteforce_topk", "sim_ivf_topk", "sample_per_class",
      "decontaminate", "repeated_substrings", "fuzzy_join",
      "sim_quantized_topk", "zorder_key", "sim_pq_topk", "sim_ivfpq_topk",
      "overlap_sketch", "join_size_sketch", "cdc_chunks", "lang_id",
      "cdc_segment_dedup")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).filter(q => names(q._1)).foreach {
      case (name, fn) =>
        sb.append(s"\n================ $name ================\n")
        sb.append(fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted")))
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
