package graft.tools

import org.apache.spark.sql.SparkSession

/** Executed-plan probe: run a registry query to completion and print the
  * FINAL adaptive plan — the only way to see what AQE actually did
  * (stage/exchange reuse, runtime join strategy changes, coalesced
  * partitions), none of which the static `explain("formatted")` in
  * [[graft.Plans]] can show.
  *
  * Usage: `runMain graft.tools.PlanProbe <queryName> [sfDir]`
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: PlanProbe <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    // executedPlan after an action resolves the AdaptiveSparkPlan to its
    // final form, including ReusedExchange/ReusedSubquery nodes
    println(s"================ $name (executed, final adaptive) ================")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
