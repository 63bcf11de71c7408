package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 99).map(i => (i.toLong, s"c${i % 3}", s"payload$i"))
    .toDF("id", "cls", "payload")

  test("fixedSizeSample keeps exactly n rows per stratum, reproducibly") {
    val s1 = Sampling.fixedSizeSample(df, col("cls"), col("id"), 10)
    val counts = s1.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(counts === Map("c0" -> 10L, "c1" -> 10L, "c2" -> 10L))
    // deterministic: a second evaluation selects the identical ids
    val ids1 = s1.select("id").as[Long].collect().sorted
    val ids2 = Sampling.fixedSizeSample(df, col("cls"), col("id"), 10)
      .select("id").as[Long].collect().sorted
    assert(ids1.toSeq === ids2.toSeq)
    // all original columns survive (semi-join, not projection)
    assert(s1.columns === Array("id", "cls", "payload"))
  }

  test("fixedSizeSample returns whole strata smaller than n") {
    val kept = Sampling.fixedSizeSample(df, col("cls"), col("id"), 50)
    assert(kept.count() === 99) // every class has 33 rows — all kept
  }

  test("hashSample membership is a pure function of the key") {
    val a = Sampling.hashSample(df, col("id"), 0.3).select("id").as[Long].collect().sorted
    val b = Sampling.hashSample(df, col("id"), 0.3).select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty && a.length < 99)
    // fraction monotonicity: a larger fraction is a superset
    val big = Sampling.hashSample(df, col("id"), 0.6).select("id").as[Long].collect().toSet
    assert(a.forall(big))
  }
}
