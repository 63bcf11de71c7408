package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regenerates the PINNED trained artifacts inlined in
  * [[graft.queries.Pipeline]] (`IvfCentroids16`, `BpeMerges16` and their SQL
  * literal twins): 16 k-means|| IVF centroids over the sf0.01 embeddings and
  * 16 BPE merges over the sf0.01 documents dictionary.
  *
  * Training loops (k-means iterations, per-merge argmax) are not
  * SQL-replayable, so the registry queries `sim_ivf_trained` /
  * `bpe_tokenize` inject the artifacts as literal frames instead of training
  * at query time — the POST-training math (assignment, probing, greedy merge
  * application) is exact and hash-checked against DuckDB at every scale,
  * while training itself stays gated by SimilaritySpec/BpeSpec. Run this
  * main to re-derive the literals from the fixtures:
  *
  * {{{ sbt "runMain graft.tools.TrainArtifacts /root/testdata/sf0.01" }}}
  */
object TrainArtifacts {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.configure(
      SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // ---- IVF centroids: k = 16, seed 42 (trainCentroids defaults)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = graft.operators.Similarity.trainCentroids(emb, k = 16)
      .orderBy(col("cid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    println("// ---- Scala literal: IvfCentroids16")
    cents.foreach { case (cid, cv) =>
      println(s"""    ${cid}L -> Seq(${cv.map(f => s"${f}f").mkString(", ")}),""")
    }
    println("-- ---- SQL literal: cent(cid, embedding) VALUES rows")
    cents.foreach { case (cid, cv) =>
      println(s"""       |  ($cid, [${cv.map(f => s"CAST($f AS FLOAT)").mkString(", ")}]),""")
    }

    // ---- BPE merges: 16, learned from the documents word dictionary
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val merges = graft.operators.Bpe.trainBpe(
      graft.operators.Bpe.wordCounts(docs, col("text")), numMerges = 16)

    def scalaStr(s: String) =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString } + "\""
    def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

    println("// ---- Scala literal: BpeMerges16")
    println("    " + merges.map { case (l, r) => s"(${scalaStr(l)}, ${scalaStr(r)})" }
      .mkString(", "))
    println("-- ---- SQL literal: m(rank, l, r) VALUES rows")
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      println(s"""       |  (${i + 1}, ${sqlStr(l)}, ${sqlStr(r)}),""")
    }

    // ---- Unigram-LM pieces: corpus chars + 48 multi-char pieces, soft
    // EM over the same word dictionary, quantized to fixed-point costs
    // (ln runs HERE; application is exact integer Viterbi)
    val wc = graft.operators.Bpe.wordCounts(docs, col("text"))
      .select(col("word"), col("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val uCosts = graft.operators.Unigram.toCosts(
      graft.operators.Unigram.trainUnigram(wc))
    println("// ---- Scala literal: UnigramCosts")
    uCosts.foreach { case (p, c) => println(s"    (${scalaStr(p)}, ${c}L),") }

    // ---- DSIR bucket weights: target = source 'src0', raw = the rest,
    // 64 hashed-unigram buckets (trainDsirWeights runs the ln on the
    // driver; the pinned literals keep query-time arithmetic ln-free)
    val target = docs.filter(col("source") === "src0")
    val raw = docs.filter(col("source") =!= "src0")
    val dw = graft.operators.Sampling.trainDsirWeights(target, raw, col("text"), 64)
    println("// ---- Scala literal: DsirWeights64")
    println("    " + dw.map(d => s"$d").mkString(", "))

    // ---- mm fixture dHash64 pins: decode the mm_phash_pairs fixture
    // corpus through the production path ONCE and print the (id, hash)
    // literals for PinnedArtifacts.MmFixtureHashes64
    import spark.implicits._
    val mmHashes = graft.operators.Multimodal.perceptualHash(
        graft.queries.Pipeline.mmFixtureImages.toDF("id", "payload"),
        col("payload"))
      .select(col("id"), col("phash")).orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    println("// ---- Scala literal: MmFixtureHashes64")
    mmHashes.foreach { case (id, h) => println(s"    ${id}L -> ${h}L,") }

    spark.stop()
  }
}
