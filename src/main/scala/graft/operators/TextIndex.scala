package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus indexing / keyword extraction over a text column — the term-level
  * statistics retrieval and curation pipelines need (tf, df, per-doc top
  * terms). Everything is integer-exact (tf-idf weighting is a consumer-side
  * multiply; `ln` is deliberately left out of engine outputs so results stay
  * bit-comparable across engines).
  */
object TextIndex {

  /** (doc, term, tf) posting table: one narrow explode + count — the
    * inverted index both similarity joins and retrieval build on. Terms are
    * whitespace tokens (with multiplicity).
    */
  def postings(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"),
        explode(TextFunctions.tokensWs(text)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus-level term stats: document frequency + total term frequency. */
  def termStats(df: DataFrame, id: Column, text: Column): DataFrame =
    postings(df, id, text)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))

  /** Top-k terms per document by (tf desc, term asc) — deterministic
    * keyword extraction; `minLen` drops short stop-ish tokens.
    */
  def topTermsPerDoc(df: DataFrame, id: Column, text: Column, k: Int,
      minLen: Int = 1): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tf").desc, col("term"))
    postings(df, id, text)
      .filter(length(col("term")) >= minLen)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("rank").cast("int").as("rank"))
  }
}
