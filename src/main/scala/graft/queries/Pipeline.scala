package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Training-data pipeline operators over `documents` / `embeddings`:
  * deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
  * cosine), similarity search, text analysis. Implementations live in
  * graft.operators.*; these entries bind them to the driver tables and the
  * DuckDB oracles.
  */
object Pipeline {

  /** Exact dedup: canonical (minimum) doc_id per identical text; exposes
    * group size so duplicate mass is visible. Hash-groupBy — one shuffle
    * on a 64-bit fingerprint, not the full text, at scale.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.exact(T(s, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("keep_id"))

  val dedupExactOracle: String =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS group_size
      |FROM documents
      |GROUP BY text
      |ORDER BY keep_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("dedup_exact", dedupExact, Some(dedupExactOracle))
  )
}
