package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Component timings for the co-occurrence plan variants — builder-side
  * adjudication tool (the stress gate said the fp-keyed rewrite read 2×
  * the raw-term plan at ×64; this isolates which stage pays).
  * Usage: runMain graft.tools.CoocProbe [dir]
  */
object CoocProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress/x64")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graft.HashFunctions

    def widen(df: DataFrame): DataFrame = {
      val target = spark.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }

    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(df: => DataFrame): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${runs.min}%8.2f s (passes: ${
        runs.map(r => f"$r%.2f").mkString(", ")})")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val window = 3

    // JIT warmup so ordering doesn't skew the comparison
    time("warmup (entry)") {
      graft.operators.TextIndex.cooccurrenceCounts(
        docs, col("text"), window = 3, k = 200)
    }

    // raw-term pairs, agg, top-k (the old plan)
    time("raw-term full") {
      val base = widen(docs.select(col("text").as("__text")))
        .select(TextFunctions.tokensWs(col("__text")).as("toks"))
      val pairs = (1 to window).map { off =>
        base.filter(size(col("toks")) > off)
          .select(explode(arrays_zip(
            slice(col("toks"), lit(1), size(col("toks")) - off),
            slice(col("toks"), lit(1 + off), size(col("toks")) - off)))
            .as("z"))
          .select(least(col("z.0"), col("z.1")).as("term_a"),
            greatest(col("z.0"), col("z.1")).as("term_b"))
      }.reduce(_ unionByName _)
      pairs.groupBy(col("term_a"), col("term_b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term_a"), col("term_b")).limit(200)
    }

    // fp pairs via md5 ShingleFps60, agg, fp-order top-k (no labels)
    time("fp(md5) agg+topk") {
      val base = widen(docs.select(col("text").as("__text")))
        .select(HashFunctions.shingleFps60(
          TextFunctions.tokensWs(col("__text")), 1).as("fps"))
      val pairs = (1 to window).map { off =>
        base.filter(size(col("fps")) > off)
          .select(explode(arrays_zip(
            slice(col("fps"), lit(1), size(col("fps")) - off),
            slice(col("fps"), lit(1 + off), size(col("fps")) - off)))
            .as("z"))
          .select(least(col("z.0"), col("z.1")).as("fp_a"),
            greatest(col("z.0"), col("z.1")).as("fp_b"))
      }.reduce(_ unionByName _)
      pairs.groupBy(col("fp_a"), col("fp_b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("fp_a"), col("fp_b")).limit(200)
    }

    // the md5 fps pass alone (tokenize + hash, no pairs)
    time("fps(md5) pass only") {
      widen(docs.select(col("text").as("__text")))
        .select(HashFunctions.shingleFps60(
          TextFunctions.tokensWs(col("__text")), 1).as("fps"))
        .select(sum(size(col("fps"))).as("n"))
    }

    // tokenize alone
    time("tokenize only") {
      widen(docs.select(col("text").as("__text")))
        .select(TextFunctions.tokensWs(col("__text")).as("toks"))
        .select(sum(size(col("toks"))).as("n"))
    }

    // dict pass: tokenize + explode + distinct + hash-after-distinct
    time("dict pass") {
      widen(docs.select(col("text").as("__text")))
        .select(explode(TextFunctions.tokensWs(col("__text"))).as("term"))
        .distinct()
        .select(col("term"), element_at(
          HashFunctions.shingleFps60(array(col("term")), 1), 1).as("fp"))
    }

    // one-pass pair emission: tokenize+hash ONCE, all offsets emitted in
    // a single projection (flatten of per-offset zips), one explode
    time("fp one-pass agg+topk") {
      val base = widen(docs.select(col("text").as("__text")))
        .select(HashFunctions.shingleFps60(
          TextFunctions.tokensWs(col("__text")), 1).as("fps"))
      val n = size(col("fps"))
      val pairArr = flatten(array((1 to window).map { off =>
        val len = greatest(n - off, lit(0))
        arrays_zip(slice(col("fps"), lit(1), len),
          slice(col("fps"), lit(1 + off), len))
      }: _*))
      base.select(explode(pairArr).as("z"))
        .select(least(col("z.0"), col("z.1")).as("fp_a"),
          greatest(col("z.0"), col("z.1")).as("fp_b"))
        .groupBy(col("fp_a"), col("fp_b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("fp_a"), col("fp_b")).limit(200)
    }

    time("raw one-pass agg+topk") {
      val base = widen(docs.select(col("text").as("__text")))
        .select(TextFunctions.tokensWs(col("__text")).as("toks"))
      val n = size(col("toks"))
      val pairArr = flatten(array((1 to window).map { off =>
        val len = greatest(n - off, lit(0))
        arrays_zip(slice(col("toks"), lit(1), len),
          slice(col("toks"), lit(1 + off), len))
      }: _*))
      base.select(explode(pairArr).as("z"))
        .select(least(col("z.0"), col("z.1")).as("term_a"),
          greatest(col("z.0"), col("z.1")).as("term_b"))
        .groupBy(col("term_a"), col("term_b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term_a"), col("term_b")).limit(200)
    }

    // the registry entry as shipped
    time("entry as shipped") {
      graft.operators.TextIndex.cooccurrenceCounts(
        docs, col("text"), window = 3, k = 200)
    }

    spark.stop()
  }
}
