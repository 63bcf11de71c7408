package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Distributed BPE (byte-pair-encoding) tokenizer training and application
  * — the subword-vocabulary step of a training-data pipeline, run on the
  * corpus the model will be trained on (Sennrich et al. 2016, public
  * algorithm).
  *
  * Scale shape — the part that matters at 100 TB: the CORPUS is touched
  * exactly once (a whitespace-token count aggregation); every training
  * iteration then runs over the WORD DICTIONARY (distinct words ×
  * frequency), which is ~10⁶–10⁷ rows regardless of corpus size
  * (Heaps' law), so `numMerges` iterations cost `numMerges` small
  * dictionary jobs, not corpus passes. Application is the same trick in
  * reverse: tokenize the DISTINCT words once, then hash-join the
  * (word → subwords) map back onto the corpus — the per-word merge loop
  * never runs per occurrence.
  *
  * Determinism: pair counts tie-break lexicographically on (left, right),
  * so the learned merge table is a pure function of the word counts — the
  * same on any cluster layout (counts are exact longs; no floats anywhere).
  *
  * The merge TABLE is driver-sized by construction (numMerges rows) —
  * collecting it is the same move as broadcasting trained k-means
  * centroids, not a driver-side data loop.
  */
object Bpe {

  /** End-of-word marker symbol (classic BPE: lets merges distinguish
    * word-final from word-internal contexts).
    */
  val EndMark = "</w>"

  /** One corpus pass: whitespace-token frequency dictionary
    * `(word, n, syms)` with each word pre-split into its initial symbol
    * sequence (characters + [[EndMark]]).
    */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextFunctions.tokensWs(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("syms",
        concat(filter(split(col("word"), ""), s => length(s) > 0),
          array(lit(EndMark))))

  /** Adjacent-pair frequencies over the dictionary, weighted by word
    * count: `(l, r, cnt)`. One explode + groupBy over dict rows.
    */
  private def pairCounts(dict: DataFrame): DataFrame =
    dict.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("n")).as("cnt"))

  /** One greedy left-to-right merge pass of (l, r) → l+r over a symbol
    * array — a fold: append, or replace the tail element when it is `l`
    * and the incoming symbol is `r`. Higher-order function, evaluated only
    * over dictionary rows (never the corpus), which is why the interpreted
    * eval is acceptable here.
    */
  private def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      // nested CASE, not `&&`: ANSI element_at(-1) throws on an empty
      // array and Catalyst conjunctions do not short-circuit
      when(size(acc) === 0, array(x))
        .otherwise(when(element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x)))))

  /** Learns `numMerges` merges from a [[wordCounts]] dictionary. Each
    * iteration: count adjacent pairs (one small agg job), take the most
    * frequent (ties → lexicographically smallest, for engine-independent
    * determinism), rewrite the dictionary with that pair merged. The
    * dictionary is localCheckpointed per iteration so plan depth stays
    * constant. Stops early when no pair is left. Returns the ranked merge
    * table — driver-sized (≤ numMerges rows) by construction.
    */
  def trainBpe(dict0: DataFrame, numMerges: Int): Seq[(String, String)] = {
    var dict = dict0.select(col("n"), col("syms")).localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    var pendingMerges = 0
    while (i < numMerges && !done) {
      val top = pairCounts(dict)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .collect() // exactly one tiny row per iteration — the argmax scalar
      if (top.isEmpty) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        dict = dict.withColumn("syms", mergeOnce(col("syms"), l, r))
        // checkpoint every few merges, not every merge: a handful of
        // stacked fold projections over the dictionary is cheaper than a
        // materialization job per iteration, while plan depth stays O(1)
        pendingMerges += 1
        if (pendingMerges >= 4) {
          dict = dict.localCheckpoint()
          pendingMerges = 0
        }
      }
      i += 1
    }
    merges.result()
  }

  /** Applies a ranked merge table to one word (driver/executor-local; used
    * only over the distinct-word dictionary). Merges apply in rank order,
    * each as a full greedy left-to-right pass — the classic algorithm.
    */
  def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] = {
    // split by CODE POINT, not UTF-16 code unit, to mirror the SQL-side
    // symbolization (split(word, '') advances by code point) — otherwise
    // surrogate pairs (emoji, supplementary CJK) tokenize inconsistently
    // with the learned merge table
    var syms: List[String] = {
      val b = List.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        b += word.substring(i, i + n)
        i += n
      }
      (b += EndMark).result()
    }
    merges.foreach { case (l, r) =>
      val out = scala.collection.mutable.ListBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == l && x == r)
          out(out.length - 1) = l + r
        else out += x
      }
      syms = out.toList
    }
    syms
  }

  /** Tokenizes a corpus with a learned merge table: distinct words are
    * tokenized ONCE (UDF over the dictionary — never the corpus; the merge
    * loop is inherently sequential per word, and the dictionary is the
    * small side), then hash-joined back onto the exploded corpus and
    * re-assembled per document in original word order. Output:
    * `(id, tokens array<string>, n_tokens)`.
    */
  def tokenizeCorpus(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(id.as("id"),
      posexplode(TextFunctions.tokensWs(text)).as(Seq("pos", "word")))
    val tok = udf((w: String) => applyMerges(w, merges))
    val dict = words.select(col("word")).distinct()
      .withColumn("toks", tok(col("word")))
    val tokenized = words.join(dict, Seq("word"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("toks")))).as("t"))
      .select(col("id"),
        flatten(expr("transform(t, x -> x.toks)")).as("tokens"))
    // docs with no whitespace tokens still appear, with an empty token list
    df.select(id.as("id")).distinct()
      .join(tokenized, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("tokens"), array().cast("array<string>")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Train on a corpus and tokenize it in one call (the registry entry's
    * shape): one corpus pass for counts, `numMerges` dictionary jobs, one
    * dictionary tokenization, one corpus join.
    */
  def trainAndTokenize(df: DataFrame, id: Column, text: Column,
      numMerges: Int): DataFrame = {
    val merges = trainBpe(wordCounts(df, text), numMerges)
    tokenizeCorpus(df, id, text, merges)
  }
}
