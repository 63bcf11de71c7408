package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the capped-quantizer centroid/codebook selection: times
  * the PQ/IVF plans under each selection variant (round-6 dense-id range
  * predicate, round-8 sort+limit, round-8b literal-bound filter) over a
  * stress-scaled embeddings table, plus the component costs (the bound
  * job, codebook materialization), to attribute wall-time deltas to the
  * selection change. Usage: runMain graft.tools.QuantProbe /tmp/graft_stress/x16
  */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)

    def time(name: String)(mk: => DataFrame): Unit = {
      // two passes, report both (first is cold)
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = mk.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name pass$pass rows=$n sec=$sec%.2f")
      }
    }

    // component: the scalar bound job alone
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val b = emb.select(col("vec_id"))
        .filter(pmod(col("vec_id"), lit(25L)) === 0)
        .orderBy(col("vec_id")).limit(128)
        .agg(max(col("vec_id"))).collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE bound_job pass$pass bound=$b sec=$sec%.2f")
    }

    // component: codebook materialization under each variant
    time("cb_bounded") {
      graft.operators.Similarity.pqCodebook(emb, m = 8, entryEvery = 25)
    }
    import org.apache.spark.sql.expressions.Window
    val cbRangePred = {
      val sel = emb.filter(pmod(col("vec_id"), lit(25L)) === 0)
        .filter(col("vec_id") < 25L * 128)
        .select((col("vec_id") / 25L).cast("long").as("entry"),
          org.apache.spark.sql.graft.VectorFunctions.quantizeInt8(col("embedding")).as("code"))
      sel.select(col("*"),
          explode(sequence(lit(0L), lit(7L))).as("sub"))
        .withColumn("scode",
          expr("slice(code, cast(sub * (size(code) div 8) + 1 as int), size(code) div 8)"))
        .select(col("sub"), col("entry"), col("scode"))
    }
    time("cb_range_pred") { cbRangePred }

    // full queries
    time("pq_range_pred") {
      graft.operators.Similarity.pqTopKPackedWith(queries, emb, cbRangePred, k = 5, m = 8)
    }
    time("pq_bounded") {
      graft.operators.Similarity.pqTopKPacked(queries, emb, k = 5, m = 8, entryEvery = 25)
    }
    val rangePred = emb.filter(pmod(col("vec_id"), lit(50L)) === 0)
      .filter(col("vec_id") < 50L * 128)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    time("ivf_range_pred") {
      graft.operators.Similarity.ivfTopKWith(queries, emb, rangePred, k = 5, nprobe = 2)
    }
    time("ivf_bounded") {
      graft.operators.Similarity.ivfTopK(queries, emb, k = 5, centroidEvery = 50, nprobe = 2)
    }
    spark.stop()
    sys.exit(0)
  }
}
