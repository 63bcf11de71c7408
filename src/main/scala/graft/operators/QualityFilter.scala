package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composite document-quality gate (the C4/Gopher-style pre-training
  * filter): every heuristic the engine already computes — token counts,
  * stopword density, punctuation density, token-length shape, within-doc
  * segment repetition — evaluated as ONE pipeline that returns, per
  * document, whether it survives and WHICH rules rejected it. Keeping the
  * reasons is the operational half of corpus curation: rule hit-rates are
  * how thresholds get audited and tuned at 100 TB, where "it dropped 40% of
  * crawl X" must be explainable.
  *
  * Scale shape: the stats side is the one-pass codegen'd TextStats
  * projection (map-only); repetition adds its per-doc segment aggregation
  * (shuffles (id, segment) pairs, nothing corpus-wide); the two meet in a
  * single equi-join on id. Rule evaluation is pure projection.
  */
object QualityFilter {

  /** Rejection thresholds; defaults are deliberately mild — tune per corpus
    * by auditing reason hit-rates (`filterWithReasons(...).groupBy(reasons)`).
    */
  case class Thresholds(
      minTokens: Long = 10,
      maxTokens: Long = 1000000,
      minStopRatio: Double = 0.01,
      maxPunctRatio: Double = 0.5,
      minMeanTokLen: Double = 2.0,
      maxMeanTokLen: Double = 12.0,
      maxDupFrac: Double = 0.3,
      maxTopFrac: Double = 0.9)

  /** Per-document verdict: (id, kept, reasons) with `reasons` the rule
    * names that fired, in fixed rule order (empty array = kept).
    */
  def filterWithReasons(df: DataFrame, id: Column, text: Column,
      th: Thresholds = Thresholds()): DataFrame = {
    val none = array().cast("array<string>")
    def rule(cond: Column, name: String): Column =
      when(cond, array(lit(name))).otherwise(none)

    val stats = df.select(id.as("id"),
        org.apache.spark.sql.graft.TextStats.textStats(text).as("ts"))
      .select(col("id"), col("ts.n_tok").as("n_tok"),
        col("ts.stop_ratio").as("stop_ratio"),
        col("ts.punct_ratio").as("punct_ratio"),
        col("ts.mean_tok_len").as("mean_tok_len"))
    val rep = TextIndex.repetitionStats(df, id, text)
      .select(col("id"), col("n_seg"), col("dup_frac"), col("top_frac"))

    stats.join(rep, Seq("id"))
      .withColumn("reasons", concat(
        rule(col("n_tok") < th.minTokens, "too_few_tokens"),
        rule(col("n_tok") > th.maxTokens, "too_many_tokens"),
        rule(col("stop_ratio") < th.minStopRatio, "low_stopword_ratio"),
        rule(col("punct_ratio") > th.maxPunctRatio, "high_punct_ratio"),
        rule(col("mean_tok_len") < th.minMeanTokLen ||
          col("mean_tok_len") > th.maxMeanTokLen, "mean_tok_len_out_of_range"),
        rule(col("dup_frac") > th.maxDupFrac, "repeated_segments"),
        // a dominant segment only means something once there are several
        rule(col("n_seg") > 1 && col("top_frac") > th.maxTopFrac,
          "dominant_segment")))
      .select(col("id"), (size(col("reasons")) === 0).as("kept"), col("reasons"))
  }

  /** Surviving documents only — the composition most pipelines want. */
  def filter(df: DataFrame, id: Column, text: Column,
      th: Thresholds = Thresholds()): DataFrame =
    df.join(filterWithReasons(df, id, text, th).filter(col("kept"))
        .select(col("id").as("__keep_id")),
      id === col("__keep_id"), "left_semi")

  /** Per-rule kill audit over [[filterWithReasons]] — the numbers a
    * threshold review actually reads: each rule's document kills
    * (`n_hits`), its SOLO kills (`n_solo` — documents rejected by this
    * rule alone, i.e. exactly what relaxing just this threshold would
    * readmit), the corpus size, and the hit rate. A rule with large
    * n_hits but near-zero n_solo is redundant with its neighbors; a rule
    * whose n_solo ≈ n_hits owns its rejections outright.
    *
    * Output: (rule, n_hits, n_solo, n_docs, hit_rate) — one row per rule
    * that fired at least once.
    *
    * Scale shape: the verdict pipeline's cost plus one reasons explode
    * into a ≤|rules|-row aggregation and a one-row total broadcast.
    */
  def ruleHits(df: DataFrame, id: Column, text: Column,
      th: Thresholds = Thresholds()): DataFrame = {
    val fr = filterWithReasons(df, id, text, th).select(col("reasons"))
    // n_docs from the INPUT, not a second run of the verdict pipeline
    // (filterWithReasons emits exactly one row per input doc — blank
    // docs included: both stat legs retain them — so the counts agree,
    // and the count branch costs one pruned scan instead of the full
    // stats + repetition + join subtree again)
    val tot = broadcast(df.agg(count(lit(1)).as("n_docs")))
    fr.filter(size(col("reasons")) > 0)
      .select(explode(col("reasons")).as("rule"),
        size(col("reasons")).as("__nr"))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_hits"),
        sum(when(col("__nr") === 1, 1L).otherwise(0L)).as("n_solo"))
      .crossJoin(tot)
      .select(col("rule"), col("n_hits"), col("n_solo"), col("n_docs"),
        (col("n_hits").cast("double") / col("n_docs").cast("double"))
          .as("hit_rate"))
  }

  /** Segment-level mixed-language detection: language-id each
    * `window`-token segment ([[TextIndex.chunks]] + [[graft.functions
    * .TextFunctions.langId]]) and report, per document, the segment
    * count, how many segments carried language evidence, how many
    * DISTINCT languages, the primary language (most segments, ties to
    * the alphabetically smaller code, 'und' when no segment has
    * evidence), and a `mixed` flag (>= 2 distinct languages) — the
    * curation screen for concatenation artifacts and code-switched docs
    * that a whole-document argmax silently mislabels.
    *
    * Scale shape: chunking is a bounded map-side explode; the language
    * vote is one (id, lang) count agg plus a per-doc fold over ≤ 5
    * language entries; document text shuffles only inside its own
    * segments.
    */
  def mixedLanguageReport(df: DataFrame, id: Column, text: Column,
      window: Int = 16): DataFrame = {
    // one compiled pass: token array → per-window labels (bit-for-bit the
    // former chunks() → langId(chunk) composition — WindowedLangLabels'
    // scaladoc carries the equivalence argument; QualityFilterSpec asserts
    // it on random inputs). The HOF chunk materialization re-tokenized
    // every chunk string inside langScores; this never builds the chunks.
    val lids = df.select(id.as("id"),
      explode(org.apache.spark.sql.graft.WindowedLangLabels
        .windowedLangLabels(
          graft.functions.TextFunctions.tokensWs(text), window))
        .as("lang"))
    val tot = lids.groupBy(col("id")).agg(count(lit(1)).as("n_segs"))
    val perLang = lids.filter(col("lang") =!= "und")
      .groupBy(col("id"), col("lang")).agg(count(lit(1)).as("n"))
    val agg = perLang.groupBy(col("id"))
      .agg(count(lit(1)).as("n_langs"), sum(col("n")).as("n_lang_segs"),
        array_sort(collect_list(struct((-col("n")).as("negn"), col("lang"))))
          .as("ls"))
      .select(col("id"), col("n_langs"), col("n_lang_segs"),
        element_at(col("ls"), 1).getField("lang").as("primary_lang"))
    tot.join(agg, Seq("id"), "left")
      .select(col("id"), col("n_segs"),
        coalesce(col("n_lang_segs"), lit(0L)).as("n_lang_segs"),
        coalesce(col("n_langs"), lit(0L)).as("n_langs"),
        coalesce(col("primary_lang"), lit("und")).as("primary_lang"),
        (coalesce(col("n_langs"), lit(0L)) >= 2).as("mixed"))
  }

  /** Compression-proxy quality signal — the distinct-`n`-gram ratio per
    * document (MassiveText's compression-ratio filter, restated without a
    * codec so any engine replays it): highly repetitive text (keyword
    * stuffing, boilerplate loops, degenerate generation) re-uses the same
    * character windows and scores LOW; natural prose approaches 1.
    * Output: (doc_id, n_grams, n_distinct, compress_ratio), ratio NULL
    * for docs shorter than `n` code points.
    *
    * Determinism: both counts are exact (the
    * [[org.apache.spark.sql.graft.CharNgrams]] code-point grams match
    * SQL `substring` positionally); the ratio is one IEEE division.
    *
    * Scale shape: MAP-ONLY — one O(len) gram pass and one per-row hash
    * dedup (`array_distinct`) per document; nothing shuffles at all.
    * At 100 TB this is a pure scan whose cost rides the text bytes.
    */
  def docCompressibility(df: DataFrame, id: Column, text: Column,
      n: Int = 8): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val grams = org.apache.spark.sql.graft.TextStats.charNgrams(text, n)
    df.select(id.as("doc_id"),
        size(grams).cast("long").as("n_grams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        when(col("n_grams") > 0, col("n_distinct").cast("double") /
          col("n_grams").cast("double")).as("compress_ratio"))
      .orderBy(col("doc_id"))
  }
}
