package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for 100 TB-scale corpora.
  *
  * Scale design notes:
  *  - `exact` groups on a 60-bit md5 fingerprint, so the shuffle carries
  *    (id, fingerprint) pairs — not document bodies.
  *  - the approximate family (MinHash / SimHash / n-gram Jaccard) never does
  *    an all-pairs comparison: candidates come from equality joins on LSH
  *    band buckets / hash blocks, and only candidates are verified. Signature
  *    computation is a single narrow projection (no shuffle) built from
  *    codegen'd higher-order functions; the only shuffles are the bucket
  *    join and the verify join, both on compact keys.
  *  - all hashing is md5-derived (content-addressed, engine-portable,
  *    cluster-stable — no JVM hashCode anywhere).
  */
object Dedup {

  /** Exact dedup: one row per distinct value of `content`, keeping the
    * minimum `id` and the duplicate-group size.
    *
    * Groups on `fingerprint64(content)` (md5-derived), so at scale the
    * shuffle moves 16 bytes/row instead of the document body. Callers that
    * cannot tolerate ~2^-60-scale collisions can group on content itself.
    */
  def exact(df: DataFrame, id: Column, content: Column): DataFrame =
    df.select(id.as("__id"), TextFunctions.fingerprint64(content).as("__fp"))
      .groupBy(col("__fp"))
      .agg(min(col("__id")).as("keep_id"), count(lit(1)).as("group_size"))
      .select(col("keep_id"), col("group_size"))

  // ---------------------------------------------------------------- MinHash

  /** Prime just above 2^32 for the (a*h + b) mod P universal hash family. */
  val P: Long = 4294967311L

  /** Prime just below 2^30: keeps a < 2^30 so a*h < 2^62 (no i64 overflow). */
  private val AMod: Long = 1073741789L

  private def aCoef(j: Column): Column =
    ((j.cast("long") + 1L) * 1103515245L + 12345L) % AMod + 1L
  private def bCoef(j: Column): Column =
    ((j.cast("long") + 1L) * 69069L + 362437L) % P

  /** MinHash signature (length `numHashes`) over the distinct word
    * `shingleK`-shingles of `text`. Pure projection — no shuffle, no UDF:
    * md5-based 32-bit shingle hashes fed to `numHashes` universal hash
    * functions, min-folded per function with codegen'd higher-order exprs.
    */
  def minHashSignature(text: Column, shingleK: Int, numHashes: Int): Column = {
    val hashes = transform(TextFunctions.wordShingleSet(text, shingleK),
      s => TextFunctions.hash32(s))
    transform(sequence(lit(0), lit(numHashes - 1)), j =>
      aggregate(hashes, lit(P),
        (acc, h) => least(acc, (aCoef(j) * h + bCoef(j)) % P)))
  }

  /** (id, band, band_key) rows: `bands` LSH buckets per document, the band
    * key being the md5 of that band's signature slice. Join key is ~20
    * bytes/row regardless of document size.
    */
  def lshBands(df: DataFrame, id: Column, text: Column,
      shingleK: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val rows = numHashes / bands
    df.select(id.as("id"), minHashSignature(text, shingleK, numHashes).as("sig"))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows)))))
      ).as(Seq("band", "band_key")))
  }

  /** Candidate pairs (id_a < id_b) that collide in at least one LSH band.
    * Equality self-join on (band, band_key); distinct to collapse multi-band
    * collisions. Skew note: a bucket of n identical docs yields n^2/2
    * candidates — run `exact` dedup first so identical bodies are gone.
    */
  def minHashCandidates(df: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16): DataFrame = {
    val b = lshBands(df, id, text, shingleK, numHashes, bands)
    val l = b.select(col("band"), col("band_key"), col("id").as("id_a"))
    val r = b.select(col("band"), col("band_key"), col("id").as("id_b"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** MinHash+LSH near-duplicate pairs, verified: candidates from
    * `minHashCandidates`, then exact Jaccard over distinct shingle sets,
    * kept when >= `threshold`. Output: (id_a, id_b, jaccard), exact
    * integer-ratio doubles.
    */
  def minHashPairs(df: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val sets = df.select(id.as("id"),
      TextFunctions.wordShingleSet(text, shingleK).as("set"))
    val cand = minHashCandidates(df, id, text, shingleK, numHashes, bands)
    cand
      .join(sets.select(col("id").as("id_a"), col("set").as("set_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("set").as("set_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Corpus minus near-duplicates: drops every id that appears as the larger
    * element of a verified pair (greedy cluster collapse — for chains this
    * may drop a doc whose only link was itself dropped; acceptable for
    * training-data dedup where over-dropping a near-dup is harmless).
    */
  def minHashDedup(df: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val dupIds = minHashPairs(df, id, text, shingleK, numHashes, bands, threshold)
      .select(col("id_b").as("__dup_id")).distinct()
    df.join(dupIds, id === col("__dup_id"), "left_anti")
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** All-pairs n-gram Jaccard >= threshold via inverted-index join (no LSH,
    * no approximation): explode distinct shingles, self-join on the shingle
    * fingerprint, count intersections, join back set sizes.
    *
    * At scale, stop-shingles (appearing in a large fraction of docs) blow up
    * the join; `maxDocFreq` drops shingles seen in more than that many docs
    * from pair *generation* (verification still uses full sets, so pairs
    * sharing at least one rare shingle are scored exactly).
    */
  def jaccardPairs(df: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, threshold: Double = 0.8,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val sets = df.select(id.as("id"),
      TextFunctions.wordShingleSet(text, shingleK).as("set"))
    val posting = sets.select(col("id"),
      explode(col("set")).as("s"))
      .select(col("id"), TextFunctions.fingerprint64(col("s")).as("sfp"))
    val filtered = maxDocFreq match {
      case Some(maxDf) =>
        val rare = posting.groupBy(col("sfp")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select(col("sfp"))
        posting.join(rare, Seq("sfp"))
      case None => posting
    }
    val pairs = filtered.select(col("sfp"), col("id").as("id_a"))
      .join(filtered.select(col("sfp"), col("id").as("id_b")), Seq("sfp"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    pairs
      .join(sets.select(col("id").as("id_a"), col("set").as("set_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("set").as("set_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // --------------------------------------------------------------- SimHash

  /** Number of SimHash bits: 60 (what a 15-hex-digit md5 prefix yields),
    * split into 4 blocks of 15 bits for the hamming<=3 pigeonhole guarantee.
    */
  val SimHashBits = 60
  val SimHashBlocks = 4

  /** 60-bit SimHash over space-separated tokens (with multiplicity):
    * per-bit vote sum of md5-derived token hashes, bit set where the vote is
    * positive. Single projection, codegen'd higher-order exprs, no shuffle.
    */
  def simHash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokensWs(text),
      t => TextFunctions.fingerprint64(t))
    val votes = aggregate(hashes,
      array_repeat(lit(0L), SimHashBits),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(SimHashBits - 1)),
        (c, i) => c + (call_function("shiftright", h, i).bitwiseAND(lit(1L)) * 2L - 1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(SimHashBits - 1)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** Near-duplicate pairs by SimHash hamming distance <= maxHamming (<= 3).
    *
    * Candidates via the block trick: 60 bits in 4 equal blocks — any pair
    * within hamming 3 must agree exactly on at least one block (pigeonhole),
    * so an equality join on (block_idx, block_value) has recall exactly 1.
    * Output: (id_a, id_b, hamming).
    */
  def simHashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < SimHashBlocks, s"maxHamming must be < $SimHashBlocks for exact recall")
    val bits = SimHashBits / SimHashBlocks
    val sh = df.select(id.as("id"), simHash(text).as("sh"))
    val blocks = sh.select(col("id"), col("sh"), posexplode(
      transform(sequence(lit(0), lit(SimHashBlocks - 1)),
        b => call_function("shiftright", col("sh"), b * bits)
          .bitwiseAND(lit((1L << bits) - 1)))
    ).as(Seq("block", "block_val")))
    val l = blocks.select(col("block"), col("block_val"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val r = blocks.select(col("block"), col("block_val"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
