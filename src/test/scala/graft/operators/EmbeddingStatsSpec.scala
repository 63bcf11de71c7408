package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  private def df3 = Seq(
    (1L, 0, Seq(1.0f, 0.0f)),
    (2L, 0, Seq(0.0f, 1.0f)),
    (3L, 1, Seq(4.0f, 4.0f))).toDF("vec_id", "label", "embedding")

  test("labelCentroids: fixed-point mean/variance match the closed form " +
      "exactly for representable inputs") {
    val out = EmbeddingStats.labelCentroids(df3, col("label"), col("embedding"))
      .as[(Int, Int, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // label 0, both dims: values {1, 0} -> mean .5, E[x^2] = .5, var = .25
    // (all exactly representable at 2^24 / 2^20 — no quantization loss)
    assert(out((0, 0)) === ((0, 0, 2L, 0.5, 0.25)))
    assert(out((0, 1)) === ((0, 1, 2L, 0.5, 0.25)))
    assert(out((1, 0)) === ((1, 0, 1L, 4.0, 0.0)))
    assert(out((1, 1)) === ((1, 1, 1L, 4.0, 0.0)))
  }

  test("labelCentroids: bit-identical under repartitioning (the float-avg " +
      "failure mode this operator exists to remove)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      EmbeddingStats.labelCentroids(df, col("label"), col("embedding"))
        .as[(Int, Int, Long, Double, Double)].collect()
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(emb) === run(emb.repartition(17)))
    // and close to the naive double mean (within quantization of the sum)
    val naive = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("x").cast("double")).as("m"))
      .as[(Int, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    run(emb).foreach { case (l, d, n, mean, _) =>
      assert(math.abs(mean - naive((l, d))) < 1e-6,
        s"fixed-point mean drifted from naive at ($l,$d)")
    }
  }

  test("embeddingOutliers: a planted far point wins; ties and order are " +
      "deterministic under repartitioning") {
    val base = (1L to 40L).map(i =>
      (i, (i % 3).toInt, Seq(0.1f * (i % 5), 0.1f * ((i + 1) % 5))))
    val planted = (99L, 0, Seq(50.0f, -50.0f))
    val df = (base :+ planted).toDF("vec_id", "label", "embedding")
    val out = EmbeddingStats.embeddingOutliers(df, col("vec_id"),
        col("label"), col("embedding"), k = 5)
      .as[(Long, Int, Double, Int)].collect().sortBy(_._4)
    assert(out.length === 5)
    assert(out.map(_._4).toSeq === (1 to 5).toSeq, "rank column is 1..k")
    assert(out.head._1 === 99L, s"planted outlier must rank first: ${out.toSeq}")
    assert(out.head._2 === 0)
    // rank agrees with (dist2 desc, id asc)
    assert(out.sortBy(t => (-t._3, t._1)).map(_._4).toSeq === (1 to 5).toSeq)
    val out2 = EmbeddingStats.embeddingOutliers(df.repartition(7),
        col("vec_id"), col("label"), col("embedding"), k = 5)
      .as[(Long, Int, Double, Int)].collect().sortBy(_._4)
    assert(out.toSeq === out2.toSeq)
  }

  test("embeddingCovariance: hand-checked 2x2 matrix, symmetric, " +
      "bit-identical under repartitioning") {
    // dyadic values so 2^20 quantization is exact: cov computed by hand
    // over x = [(1, 2), (3, 6), (5, 4)]:
    //   mean = (3, 4); cov_00 = 8/3, cov_11 = 8/3, cov_01 = cov_10 = 4/3
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)), (3L, Seq(5.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      EmbeddingStats.embeddingCovariance(d, col("embedding"))
        .as[(Int, Int, Long, Double)].collect()
        .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    val out = run(df)
    assert(out.size === 4)
    assert(out((0, 0))._1 === 3L)
    assert(math.abs(out((0, 0))._2 - 8.0 / 3.0) < 1e-9)
    assert(math.abs(out((1, 1))._2 - 8.0 / 3.0) < 1e-9)
    assert(out((0, 1))._2 === out((1, 0))._2, "matrix must be symmetric")
    assert(math.abs(out((0, 1))._2 - 4.0 / 3.0) < 1e-9)
    // order-free moments: any partitioning yields the same bits
    val out2 = run(df.repartition(5))
    assert(out.view.mapValues(_._2).toMap ===
      out2.view.mapValues(_._2).toMap)
  }

  test("quantErrorReport: reference-fold equality on a hand vector, zero " +
      "vectors counted but excluded from error stats") {
    val df = Seq(
      (0, Array(3f, 4f)),      // nrm 5 -> u = (0.6, 0.8)
      (0, Array(0f, 0f)),      // zero vector
      (1, Array(1f, 0f))       // exact code (127, 0) -> zero error
    ).toDF("label", "embedding")
    val out = EmbeddingStats.quantErrorReport(df, col("label"),
        col("embedding"))
      .as[(Int, Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().sortBy(_._1).toSeq
    // reference chain for (3,4): codes round(127*0.6)=76, round(127*0.8)=102
    val (u1, u2) = (3.0f.toDouble / 5.0, 4.0f.toDouble / 5.0)
    val e1 = u1 - 76.0 / 127.0
    val e2 = u2 - 102.0 / 127.0
    val mse = ((0.0 + e1 * e1) + e2 * e2) / 2.0
    val maxe = math.max(math.abs(e1), math.abs(e2))
    assert(out(0) === ((0, 2L, 1L, Some(mse), Some(mse), Some(mse),
      Some(maxe))))
    assert(out(1) === ((1, 1L, 0L, Some(0.0), Some(0.0), Some(0.0),
      Some(0.0))))
    // an all-zero label reports NULL error stats, not fabricated zeros
    val zonly = Seq((7, Array(0f, 0f))).toDF("label", "embedding")
    val z = EmbeddingStats.quantErrorReport(zonly, col("label"),
        col("embedding"))
      .as[(Int, Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(z === ((7, 1L, 1L, None, None, None, None)))
  }

  test("embeddingCovariance: empty and all-null-vector inputs yield zero " +
      "rows, not a null-dimension row") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(EmbeddingStats.embeddingCovariance(empty, col("embedding"))
      .count() === 0L)
    val allNull = Seq((1L, null: Seq[Float]), (2L, null: Seq[Float]))
      .toDF("vec_id", "embedding")
    assert(EmbeddingStats.embeddingCovariance(allNull, col("embedding"))
      .count() === 0L)
  }

  test("silhouetteReport: separable labels score positive, a mislabeled " +
      "point counts in n_negative, zero vectors are excluded, " +
      "partition-invariant") {
    val df = Seq(
      (0, Seq(1f, 0f)), (0, Seq(0.9f, 0.1f)),
      (1, Seq(0f, 1f)), (1, Seq(0.1f, 0.9f)),
      (0, Seq(0f, 1f)),  // mislabeled: sits on label 1's direction
      (1, Seq(0f, 0f))   // zero norm: no direction, excluded
    ).toDF("label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      EmbeddingStats.silhouetteReport(d, col("label"), col("embedding"))
        .as[(Int, Long, Double, Double, Double, Long)]
        .collect().sortBy(_._1).toSeq
    val out = run(df)
    assert(out.map(_._1) === Seq(0, 1))
    val l0 = out(0); val l1 = out(1)
    assert(l0._2 === 3L)            // all three label-0 rows have direction
    assert(l1._2 === 2L)            // zero vector dropped
    assert(l0._6 === 1L)            // exactly the mislabeled point
    assert(l1._6 === 0L)
    assert(l1._3 > 0.0)             // clean separable label
    assert(l0._4 < 0.0)             // min_sil of label 0 is the mislabel
    assert(out.forall(r => r._4 >= -1.0 && r._5 <= 1.0))
    assert(out.forall(r => r._4 <= r._3 && r._3 <= r._5))
    // fixed-point mean + within-row folds: bit-identical at any layout
    assert(run(df.repartition(5)) === out)
  }
}
