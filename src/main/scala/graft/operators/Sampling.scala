package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic sampling for training-data curation.
  *
  * RNG-based `sample()` changes membership on retry/recompute and can't be
  * reproduced outside Spark; hashing a stable key gives samples that are
  * reproducible across runs, engines, and cluster layouts (the property
  * curation pipelines need for auditability) — membership is a pure
  * function of the row key. Uniformity comes from md5's avalanche over the
  * 32-bit prefix.
  */
object Sampling {

  /** Keep rows where hash32(key)/2^32 < fraction. Map-only, no shuffle. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.filter(TextFunctions.hash32(key.cast("string")) <
      lit((fraction * 4294967296.0).toLong))
  }

  /** Per-stratum fractions: rows in strata absent from `fractions` are
    * dropped (sampleBy semantics). One map-only pass regardless of the
    * number of strata.
    */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions out of range")
    val cut = fractions.foldLeft(lit(-1L)) { case (acc, (s, f)) =>
      when(stratum === s, lit((f * 4294967296.0).toLong)).otherwise(acc)
    }
    df.filter(TextFunctions.hash32(key.cast("string")) < cut)
  }
}
