package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for 100 TB-scale corpora.
  *
  * Scale design notes:
  *  - `exact` groups on a 60-bit md5 fingerprint, so the shuffle carries
  *    (id, fingerprint) pairs — not document bodies.
  *  - the approximate family (MinHash/SimHash/Jaccard) never goes anywhere
  *    near an all-pairs comparison: candidates come from equality joins on
  *    LSH band buckets / hash blocks, and only candidates are verified.
  */
object Dedup {

  /** Exact dedup: one row per distinct value of `content`, keeping the
    * minimum `id` and the duplicate-group size.
    *
    * The aggregation key is `fingerprint64(content)` (md5-derived), so at
    * scale the shuffle moves 16 bytes/row instead of the document body.
    * 60 bits across ~2^30 docs gives ~2^-? birthday collisions; callers that
    * cannot tolerate any collision can group on the full content instead.
    */
  def exact(df: DataFrame, id: Column, content: Column): DataFrame =
    df.select(id.as("__id"), graft.functions.TextFunctions.fingerprint64(content).as("__fp"))
      .groupBy(col("__fp"))
      .agg(min(col("__id")).as("keep_id"), count(lit(1)).as("group_size"))
      .select(col("keep_id"), col("group_size"))
}
