package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Training-data pipeline operators over `documents` / `embeddings`:
  * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
  * search (brute-force + SRP-LSH), text analysis. Implementations live in
  * graft.operators.* / graft.functions.*; these entries bind them to the
  * driver tables and the DuckDB oracles.
  *
  * Oracle strategy: every hash in the engine is md5-derived, so DuckDB can
  * reproduce signatures bit-for-bit via `('0x' || substring(md5(x), …))::BIGINT`
  * — the oracles below recompute MinHash/SimHash/SRP pipelines in pure SQL.
  * Floating-point outputs are either exact integer ratios (Jaccard) or strict
  * left-to-right double folds replicated with DuckDB `list_reduce`, so values
  * are bit-identical, not approximately equal.
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

  /** Scoped exact dedup ([[graft.operators.Dedup.exactScoped]]):
    * duplicates collapse within each source only; cross-source copies
    * are retained and COUNTED. The oracle replays the per-scope group
    * and the distinct-scope count per content.
    */
  def dedupScoped(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.exactScoped(T(s, dir, "documents"),
        col("doc_id"), col("text"), col("source"))
      .orderBy(col("scope"), col("keep_id"))

  val dedupScopedOracle: String =
    """WITH ps AS (
      |  SELECT source AS scope, text, MIN(doc_id) AS keep_id,
      |    COUNT(*) AS group_size
      |  FROM documents GROUP BY 1, 2),
      |sf AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS n_scopes
      |       FROM ps GROUP BY text)
      |SELECT ps.scope, ps.keep_id, ps.group_size,
      |  sf.n_scopes - 1 AS cross_scope_copies
      |FROM ps JOIN sf ON ps.text = sf.text
      |ORDER BY ps.scope, ps.keep_id""".stripMargin

  // ---------------------------------------------------------------- shared SQL

  /** DuckDB: distinct word-3-shingle sets per doc (mirrors
    * TextFunctions.wordShingleSet(text, 3)).
    */
  private val shingleSetsSql =
    """sets AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |         ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END
      |  ) AS s
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
      |)""".stripMargin

  /** DuckDB: exact all-pairs Jaccard >= threshold via inverted index. */
  private def jaccardOracle(threshold: Double): String =
    s"""WITH $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) AS jaccard
       |FROM pairs
       |JOIN sets sa ON sa.doc_id = id_a
       |JOIN sets sb ON sb.doc_id = id_b
       |WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- MinHash

  /** MinHash+LSH near-dup pairs, LSH candidates verified by exact Jaccard.
    * The oracle is the *exact* all-pairs Jaccard result: with 128 hashes in
    * 16 bands the probability an s>=0.8 pair misses every band is
    * (1 - s^8)^16 (< 1e-17 for the s~0.98 pairs this corpus plants), and
    * verification makes precision exactly 1, so LSH output == exact output.
    */
  def dedupMinHash(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.minHashPairs(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        shingleK = 3, numHashes = 128, bands = 16, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  val dedupMinHashOracle: String = jaccardOracle(0.8)

  /** MinHash estimator quality over the true near-dup pairs
    * ([[graft.operators.Diagnostics.minhashErrorReport]]): the oracle
    * replays the signature itself — h = md5-32 of the shingle,
    * a_j = ((j·1103515245 + 12345) mod 1073741789) + 1,
    * b_j = (j·69069 + 362437) mod 4294967311, sig_j = min (a_j·h + b_j)
    * mod 4294967311 over the doc's distinct shingles (1-based j — the
    * engine's (j+1) over 0-based) — then counts per-pair signature
    * matches. Exact integers end to end; a_j·h tops out near 2^62, inside
    * BIGINT.
    */
  def minhashErrReportQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.minhashErrorReport(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        shingleK = 3, numHashes = 128, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  val minhashErrReportOracle: String =
    s"""WITH $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jac AS (
       |  SELECT id_a, id_b,
       |    CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE)
       |      AS jaccard
       |  FROM pairs
       |  JOIN sets sa ON sa.doc_id = id_a
       |  JOIN sets sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE)
       |    >= 0.5),
       |ph AS (
       |  SELECT doc_id, ('0x' || substring(md5(sp), 1, 8))::BIGINT AS h
       |  FROM posting),
       |sig AS (
       |  SELECT doc_id, j,
       |    MIN(((((j * 1103515245 + 12345) % 1073741789) + 1) * h
       |       + ((j * 69069 + 362437) % 4294967311)) % 4294967311) AS v
       |  FROM ph CROSS JOIN (SELECT unnest(range(1, 129)) AS j) js
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT p.id_a, p.id_b,
       |    SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS n_match
       |  FROM jac p
       |  JOIN sig sa ON sa.doc_id = p.id_a
       |  JOIN sig sb ON sb.doc_id = p.id_b AND sb.j = sa.j
       |  GROUP BY 1, 2)
       |SELECT j.id_a, j.id_b, j.jaccard,
       |  CAST(m.n_match AS DOUBLE) / 128.0 AS est_jaccard,
       |  abs(CAST(m.n_match AS DOUBLE) / 128.0 - j.jaccard) AS abs_err
       |FROM jac j JOIN m ON m.id_a = j.id_a AND m.id_b = j.id_b
       |ORDER BY j.id_a, j.id_b""".stripMargin

  /** Exact n-gram (word-3-shingle) Jaccard similarity join at 0.5 via
    * inverted-index candidate generation — no approximation, so the oracle
    * is the same computation in SQL.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.jaccardPairs(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        shingleK = 3, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  val dedupNgramJaccardOracle: String = jaccardOracle(0.5)

  /** Dedup-threshold calibration histogram
    * ([[graft.operators.Dedup.jaccardHistogram]]): exact Jaccard over
    * every candidate pair, 20 integer-math buckets — the report read
    * BEFORE choosing a near-dup threshold. The oracle replays the pair
    * machinery and the `(inter·bins) div union` bucketing.
    */
  def jaccardHistogramQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.jaccardHistogram(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        bins = 20, shingleK = 3)
      .orderBy(col("bucket"))

  val jaccardHistogramOracle: String =
    s"""WITH $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |bk AS (
       |  SELECT least((inter * 20) // (len(sa.s) + len(sb.s) - inter), 19)
       |    AS bucket
       |  FROM pairs
       |  JOIN sets sa ON sa.doc_id = id_a
       |  JOIN sets sb ON sb.doc_id = id_b),
       |h AS (SELECT bucket, COUNT(*) AS n_pairs FROM bk GROUP BY 1)
       |SELECT CAST(r.range AS INTEGER) AS bucket,
       |  CAST(r.range AS DOUBLE) / 20.0 AS lo,
       |  CAST(r.range + 1 AS DOUBLE) / 20.0 AS hi,
       |  COALESCE(h.n_pairs, 0) AS n_pairs
       |FROM range(0, 20) r LEFT JOIN h ON h.bucket = r.range
       |ORDER BY bucket""".stripMargin

  /** Batch novelty screen ([[graft.operators.Dedup.noveltyScores]]): odd
    * docs as the candidate batch, even docs as the reference corpus —
    * per-doc fraction of distinct 3-shingles unseen in the corpus. Exact
    * integer counts and ratio; the oracle replays the distinct-shingle
    * membership join.
    */
  def noveltyScoreQ(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    graft.operators.Dedup.noveltyScores(
        docs.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 2 === 0), col("text"), shingleK = 3)
      .orderBy(col("doc_id"))
  }

  val noveltyScoreOracle: String =
    """WITH ab AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |         ELSE list_transform(range(1, len(t) - 1),
      |                i -> array_to_string(t[i:i+2], ' ')) END
      |  ) AS s
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |        FROM documents WHERE doc_id % 2 = 1)),
      |cset AS (
      |  SELECT DISTINCT unnest(s) AS sp FROM (
      |    SELECT list_distinct(
      |      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |           ELSE list_transform(range(1, len(t) - 1),
      |                  i -> array_to_string(t[i:i+2], ' ')) END
      |    ) AS s
      |    FROM (SELECT string_split_regex(trim(text), '\s+') AS t
      |          FROM documents WHERE doc_id % 2 = 0))),
      |bpost AS (SELECT doc_id, unnest(s) AS sp FROM ab),
      |counts AS (
      |  SELECT b.doc_id, COUNT(*) AS n_shingles,
      |    CAST(SUM(CASE WHEN c.sp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_seen
      |  FROM bpost b LEFT JOIN cset c ON b.sp = c.sp
      |  GROUP BY 1)
      |SELECT a.doc_id,
      |  COALESCE(n_shingles, 0) AS n_shingles,
      |  COALESCE(n_seen, 0) AS n_seen,
      |  CASE WHEN COALESCE(n_shingles, 0) = 0 THEN 0.0
      |       ELSE CAST(COALESCE(n_shingles, 0) - COALESCE(n_seen, 0)
      |              AS DOUBLE)
      |            / CAST(COALESCE(n_shingles, 0) AS DOUBLE) END AS novelty
      |FROM (SELECT DISTINCT doc_id FROM ab) a
      |LEFT JOIN counts ON counts.doc_id = a.doc_id
      |ORDER BY a.doc_id""".stripMargin

  /** Deletion propagation ([[graft.operators.Dedup.purgeDeletes]]): the
    * purge manifest for a fixed deletion set (doc_id % 45, bounded below
    * the replica stride so the set stays request-sized under stress —
    * members with organic ≥ 0.5-Jaccard partners at both oracle SFs, so
    * the near pass is exercised) — direct ids, exact-fingerprint
    * duplicates, and word-3-shingle Jaccard ≥ 0.5 near-duplicates, with
    * the smallest triggering deleted id and the priority-arbitrated
    * reason. The synthetic corpus has no byte-identical pair, so the
    * fixture unions in a re-keyed copy (id = −(doc_id + 1) — negative,
    * so it can NEVER collide with a real id at any corpus scale) of each
    * deleted document: the copies MUST come back as `exact_dup` rows or
    * the purge leaks verbatim content. The oracle replays all three
    * passes and the (priority, matched_id) arbitration over the same
    * unioned corpus.
    */
  def purgeDeletesQ(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "documents")
    val dels = base.filter(col("doc_id") % 45 === 0 &&
        col("doc_id") < graft.Stress.IdStride)
      .select(col("doc_id").as("del_id"))
    val copies = base
      .join(broadcast(dels), col("doc_id") === col("del_id"), "semi")
      .select((-(col("doc_id") + 1L)).as("doc_id"), col("text"))
    val corpus = base.select(col("doc_id"), col("text")).unionByName(copies)
    graft.operators.Dedup.purgeDeletes(corpus, col("doc_id"), col("text"),
        dels, col("del_id"), shingleK = 3, threshold = 0.5)
      .orderBy(col("doc_id"))
  }

  val purgeDeletesOracle: String =
    s"""WITH dels AS (
       |  SELECT doc_id AS del_id FROM documents
       |  WHERE doc_id % 45 = 0 AND doc_id < ${graft.Stress.IdStride}),
       |corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT -(d.doc_id + 1), d.text FROM documents d
       |  JOIN dels ON d.doc_id = dels.del_id),
       |sets AS (
       |  SELECT doc_id, list_distinct(
       |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |         ELSE list_transform(range(1, len(t) - 1),
       |                i -> array_to_string(t[i:i+2], ' ')) END
       |  ) AS s
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
       |        FROM corpus)),
       |fps AS (
       |  SELECT doc_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS fp
       |  FROM corpus),
       |delfp AS (
       |  SELECT f.fp, MIN(f.doc_id) AS matched_id
       |  FROM fps f JOIN dels d ON f.doc_id = d.del_id GROUP BY 1),
       |direct AS (
       |  SELECT f.doc_id AS id, 1 AS pri, f.doc_id AS matched_id
       |  FROM fps f JOIN dels d ON f.doc_id = d.del_id),
       |ex AS (
       |  SELECT f.doc_id AS id, 2 AS pri, d.matched_id
       |  FROM fps f JOIN delfp d ON f.fp = d.fp),
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |delpost AS (
       |  SELECT p.doc_id, p.sp FROM posting p
       |  JOIN dels d ON p.doc_id = d.del_id),
       |pairs AS (
       |  SELECT a.doc_id AS id, b.doc_id AS del_id, COUNT(*) AS inter
       |  FROM posting a JOIN delpost b ON a.sp = b.sp
       |  GROUP BY 1, 2),
       |near0 AS (
       |  SELECT p.id, p.del_id FROM pairs p
       |  JOIN sets sa ON sa.doc_id = p.id
       |  JOIN sets sb ON sb.doc_id = p.del_id
       |  WHERE CAST(p.inter AS DOUBLE)
       |    / CAST(len(sa.s) + len(sb.s) - p.inter AS DOUBLE) >= 0.5),
       |near AS (
       |  SELECT id, 3 AS pri, MIN(del_id) AS matched_id FROM near0 GROUP BY 1),
       |allr AS (
       |  SELECT * FROM direct UNION ALL SELECT * FROM ex
       |  UNION ALL SELECT * FROM near),
       |pick AS (
       |  SELECT id, pri, matched_id,
       |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY pri, matched_id) AS rk
       |  FROM allr)
       |SELECT id AS doc_id,
       |  CASE pri WHEN 1 THEN 'direct' WHEN 2 THEN 'exact_dup'
       |       ELSE 'near_dup' END AS reason,
       |  matched_id
       |FROM pick WHERE rk = 1
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- SimHash

  /** SimHash near-dup pairs at hamming <= 3 over 60-bit signatures; the
    * 4-block pigeonhole join gives recall exactly 1, so the oracle is the
    * all-pairs hamming filter with the signature recomputed in SQL.
    */
  def dedupSimHash(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.simHashPairs(
        T(s, dir, "documents"), col("doc_id"), col("text"), maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  val dedupSimHashOracle: String =
    """WITH th AS (
      |  SELECT doc_id, ('0x' || substring(md5(t), 1, 15))::BIGINT AS h
      |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents)
      |), votes AS (
      |  SELECT doc_id, b.b AS b, SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM th, (SELECT unnest(range(60)) AS b) b
      |  GROUP BY 1, 2
      |), sh AS (
      |  SELECT doc_id, SUM(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END) AS sh
      |  FROM votes GROUP BY 1)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** 128-bit SimHash pairs at hamming <= 6 over 8 × 16-bit blocks — the
    * corpus-scale signature (32/64-bit block keys available at lower
    * tolerance). Oracle recomputes both md5 words as UBIGINTs and brute-
    * forces the hamming join; the block join's recall is exactly 1 for
    * hamming <= blocks - 1, so the results must agree.
    */
  def dedupSimHash128(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.simHashPairs128(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        maxHamming = 6, blocks = 8)
      .orderBy(col("id_a"), col("id_b"))

  val dedupSimHash128Oracle: String =
    """WITH th AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(t), 1, 16))::UBIGINT AS h0,
      |    ('0x' || substring(md5(t), 17, 16))::UBIGINT AS h1
      |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents)
      |), votes AS (
      |  SELECT doc_id, b.b AS b,
      |    SUM(CASE WHEN (h0 >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v0,
      |    SUM(CASE WHEN (h1 >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v1
      |  FROM th, (SELECT unnest(range(64)) AS b) b
      |  GROUP BY 1, 2
      |), sh AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN v0 > 0 THEN 1::UBIGINT << b ELSE 0 END) AS w0,
      |    SUM(CASE WHEN v1 > 0 THEN 1::UBIGINT << b ELSE 0 END) AS w1
      |  FROM votes GROUP BY 1)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) AS INTEGER) AS hamming
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 6
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------------ text analysis

  /** Per-document text metrics: token counts (whitespace + BPE-ish regex),
    * punctuation/stopword ratios, mean token length, composite quality score,
    * heuristic language id, 60-bit content fingerprint. One narrow projection,
    * all codegen'd built-ins — at 100 TB this is a map-only pass.
    */
  def textMetrics(s: SparkSession, dir: String): DataFrame = {
    import TextFunctions._
    // one compiled pass per document (org.apache.spark.sql.graft.TextStats);
    // the TextFunctions column formulations are the executable spec — a
    // DedupSpec test asserts the two agree
    T(s, dir, "documents").select(col("doc_id"),
        org.apache.spark.sql.graft.TextStats.textStats(col("text")).as("ts"),
        fingerprint64(col("text")).as("fp"))
      .select(col("doc_id"), col("ts.n_tok").as("n_tok"),
        col("ts.n_tok_bpe").as("n_tok_bpe"),
        col("ts.punct_ratio").as("punct_ratio"),
        col("ts.stop_ratio").as("stop_ratio"),
        col("ts.mean_tok_len").as("mean_tok_len"),
        col("ts.quality").as("quality"),
        col("ts.lang_pred").as("lang_pred"), col("fp"))
      .orderBy(col("doc_id"))
  }

  private val swEn = TextFunctions.StopwordsEn.mkString("['", "', '", "']")
  private val swDe = TextFunctions.StopwordsDe.mkString("['", "', '", "']")
  private val swEs = TextFunctions.StopwordsEs.mkString("['", "', '", "']")
  private val swFr = TextFunctions.StopwordsFr.mkString("['", "', '", "']")

  val textMetricsOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(trim(text), '\\s+') END AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, text, toks,
       |    len(toks) AS n_tok,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tok_bpe,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |              / CAST(length(text) AS DOUBLE) END AS punct_ratio,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(len(list_filter(toks, x -> list_contains($swEn, x))) AS DOUBLE)
       |              / CAST(len(toks) AS DOUBLE) END AS stop_ratio,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
       |              / CAST(len(toks) AS DOUBLE) END AS mean_tok_len,
       |    len(list_filter(toks, x -> list_contains($swEn, x))) AS hit_en,
       |    len(list_filter(toks, x -> list_contains($swDe, x))) AS hit_de,
       |    len(list_filter(toks, x -> list_contains($swEs, x))) AS hit_es,
       |    len(list_filter(toks, x -> list_contains($swFr, x))) AS hit_fr,
       |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS hit_zh
       |  FROM t)
       |SELECT doc_id,
       |  CAST(n_tok AS INTEGER) AS n_tok,
       |  CAST(n_tok_bpe AS INTEGER) AS n_tok_bpe,
       |  punct_ratio, stop_ratio, mean_tok_len,
       |  least(1.0, greatest(0.0,
       |    0.4 * least(1.0, stop_ratio * 4.0)
       |    + 0.3 * (CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 10.0 THEN 1.0 ELSE 0.0 END)
       |    + 0.3 * (1.0 - punct_ratio))) AS quality,
       |  CASE WHEN greatest(hit_en, hit_de, hit_es, hit_fr, hit_zh) = 0 THEN 'und'
       |       WHEN hit_en = greatest(hit_en, hit_de, hit_es, hit_fr, hit_zh) THEN 'en'
       |       WHEN hit_de = greatest(hit_en, hit_de, hit_es, hit_fr, hit_zh) THEN 'de'
       |       WHEN hit_es = greatest(hit_en, hit_de, hit_es, hit_fr, hit_zh) THEN 'es'
       |       WHEN hit_fr = greatest(hit_en, hit_de, hit_es, hit_fr, hit_zh) THEN 'fr'
       |       ELSE 'zh' END AS lang_pred,
       |  ('0x' || substring(md5(text), 1, 15))::BIGINT AS fp
       |FROM m
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- similarity

  /** DuckDB: strict left-to-right double-fold cosine between embedding lists
    * `$a` and `$b` — bit-identical to the engine's CosineSimilarity codegen
    * (three independent accumulators folded in index order).
    */
  private def cosSql(a: String, b: String): String =
    s"""(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)
       | / (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $a[i]::DOUBLE), (x, y) -> x + y))
       |    * sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y))))""".stripMargin.replace("\n", "")

  /** DuckDB norms CTE (named `n`): per-vector norm precomputed once;
    * `a.nrm * b.nrm` is bit-identical to the engine's
    * `sqrt(nx) * sqrt(ny)` per pair.
    */
  private val normsCte =
    """n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
      |  FROM embeddings)""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a.embedding) + 1),
       |      i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE), (x, y) -> x + y)""".stripMargin

  /** Embedding-cosine near-dup pairs (exact all-pairs at this scale; the
    * LSH-bucketed variant is the 100 TB path, unit-tested for
    * candidates ⊆ exact + exact precision).
    */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.embeddingPairsExact(
        T(s, dir, "embeddings"), col("vec_id"), col("embedding"), threshold = 0.45)
      .orderBy(col("id_a"), col("id_b"))

  /** Semantic decontamination report
    * ([[graft.operators.Dedup.semanticDecontaminate]]): the corpus
    * (vec_id % 149 != 0) screened against a benchmark needle set
    * (vec_id % 149 == 0) in embedding space — per doc, the closest
    * needle, its cosine, and the contamination flag at 0.5. The oracle
    * replays every (doc, needle) cosine and picks the (cos desc,
    * needle_id) argmax — identical to the engine's max/max_by with the
    * same tie-break.
    */
  def semanticDecontaminateQ(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    // the needle set is additionally bounded below the stress replica
    // stride (a no-op at every oracle SF): a benchmark is FIXED-SIZE in
    // production, so the stress rows must measure corpus growth against
    // fixed needles, not a harness-scaled needle set
    graft.operators.Dedup.semanticDecontaminate(
        emb.filter(col("vec_id") % 149 =!= 0), col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") % 149 === 0 &&
          col("vec_id") < graft.Stress.IdStride),
        col("vec_id"), col("embedding"),
        threshold = 0.5)
      .select(col("id").as("vec_id"), col("worst_needle"), col("max_cos"),
        col("contaminated"))
      .orderBy(col("vec_id"))
  }

  /** The scale path of [[semanticDecontaminateQ]] hash-gated: the same
    * screen served through the SRP-bucketed variant
    * ([[graft.operators.Dedup.semanticDecontaminateLsh]], 8 bits, 1-bit
    * needle-side multiprobe). Candidates are exactly the (doc, needle)
    * pairs whose buckets differ in ≤ 1 bit, so the oracle replays the
    * md5-plane buckets (the `sim_lsh_multiprobe` machinery) and the
    * per-doc argmax over those candidates; docs with no candidate keep
    * their all-null clean row via the left join.
    */
  def semanticDecontaminateLshQ(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Dedup.semanticDecontaminateLsh(
        emb.filter(col("vec_id") % 149 =!= 0), col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") % 149 === 0 &&
          col("vec_id") < graft.Stress.IdStride),
        col("vec_id"), col("embedding"),
        threshold = 0.5, bits = 8, multiProbe = true)
      .select(col("id").as("vec_id"), col("worst_needle"), col("max_cos"),
        col("contaminated"))
      .orderBy(col("vec_id"))
  }

  val semanticDecontaminateLshOracle: String =
    s"""WITH buckets AS (
       |  SELECT vec_id, embedding,
       |    list_sum(list_transform(range(0, 8), j ->
       |      CASE WHEN list_reduce(
       |          list_transform(range(1, len(embedding) + 1), i ->
       |            embedding[i]::DOUBLE *
       |            (('0x' || substring(md5('plane:' || j || ':' || (i - 1)), 1, 8))::BIGINT::DOUBLE
       |             / 2147483648.0 - 1.0)),
       |          (x, y) -> x + y) > 0
       |      THEN 1::BIGINT << j ELSE 0 END)) AS bucket
       |  FROM embeddings
       |),
       |nd AS (
       |  SELECT vec_id AS needle_id, embedding AS nv, bucket AS nb
       |  FROM buckets
       |  WHERE vec_id % 149 = 0 AND vec_id < ${graft.Stress.IdStride}),
       |cp AS (
       |  SELECT vec_id, embedding, bucket FROM buckets
       |  WHERE vec_id % 149 <> 0),
       |sc AS (
       |  SELECT cp.vec_id, nd.needle_id,
       |    ${cosSql("cp.embedding", "nd.nv")} AS cos
       |  FROM cp JOIN nd ON bit_count(xor(cp.bucket, nd.nb)) <= 1),
       |r AS (
       |  SELECT vec_id, needle_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, needle_id) AS rk
       |  FROM sc)
       |SELECT b.vec_id, r.needle_id AS worst_needle, r.cos AS max_cos,
       |  COALESCE(r.cos >= CAST('0.5' AS DOUBLE), FALSE) AS contaminated
       |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 149 <> 0) b
       |LEFT JOIN r ON r.vec_id = b.vec_id AND r.rk = 1
       |ORDER BY b.vec_id""".stripMargin

  val semanticDecontaminateOracle: String =
    s"""WITH nd AS (
       |  SELECT vec_id AS needle_id, embedding AS nv
       |  FROM embeddings
       |  WHERE vec_id % 149 = 0 AND vec_id < ${graft.Stress.IdStride}),
       |cp AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 149 <> 0),
       |sc AS (
       |  SELECT cp.vec_id, nd.needle_id,
       |    ${cosSql("cp.embedding", "nd.nv")} AS cos
       |  FROM cp CROSS JOIN nd),
       |r AS (
       |  SELECT vec_id, needle_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, needle_id) AS rk
       |  FROM sc)
       |SELECT vec_id, needle_id AS worst_needle, cos AS max_cos,
       |  cos >= CAST('0.5' AS DOUBLE) AS contaminated
       |FROM r WHERE rk = 1
       |ORDER BY vec_id""".stripMargin

  val dedupEmbeddingOracle: String =
    s"""WITH $normsCte
       |SELECT id_a, id_b, cos FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${dotSql("a", "b")} / (a.nrm * b.nrm) AS cos
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id) t
       |WHERE cos >= 0.45
       |ORDER BY id_a, id_b""".stripMargin

  /** Deterministic per-label centroid/variance over the embedding corpus
    * ([[graft.operators.EmbeddingStats.labelCentroids]]): the fixed-point
    * sum makes the per-dimension mean independent of partitioning and
    * engine — the property a corpus-drift audit needs. The oracle
    * requantizes every element at the same 2^24 / 2^20 scales and replays
    * the exact integer sums.
    */
  def labelCentroidsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EmbeddingStats.labelCentroids(
        T(s, dir, "embeddings"), col("label"), col("embedding"))
      .orderBy(col("label"), col("dim"))

  /** Shared oracle CTE prefix: per-(label, dim) exact fixed-point sums. */
  private val centroidSumsCte: String =
    """e1 AS (
      |  SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS i
      |  FROM embeddings),
      |e AS (
      |  SELECT label, CAST(i - 1 AS INTEGER) AS dim,
      |    CAST(round(embedding[i]::DOUBLE * 16777216.0) AS BIGINT) AS qm,
      |    CAST(round(embedding[i]::DOUBLE * embedding[i]::DOUBLE * 1048576.0)
      |      AS BIGINT) AS qs
      |  FROM e1),
      |a AS (
      |  SELECT label, dim, COUNT(*) AS n, SUM(qm) AS sm, SUM(qs) AS ss
      |  FROM e GROUP BY 1, 2)""".stripMargin

  val labelCentroidsOracle: String =
    s"""WITH $centroidSumsCte
       |SELECT label, dim, CAST(n AS BIGINT) AS n,
       |  CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 16777216.0) AS mean,
       |  CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * 1048576.0)
       |    - (CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 16777216.0))
       |      * (CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 16777216.0))
       |    AS variance
       |FROM a ORDER BY label, dim""".stripMargin

  /** Top-25 embedding outliers by squared L2 from their own label's
    * deterministic centroid — the mislabeled/noisy-encode screen. The
    * per-row distance folds in dimension order (within-row, so no
    * cross-row float ordering exists); the oracle replays centroid,
    * fold, and the (dist2 desc, vec_id) cut.
    */
  def embeddingOutliersQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EmbeddingStats.embeddingOutliers(
        T(s, dir, "embeddings"), col("vec_id"), col("label"),
        col("embedding"), k = 25)
      .orderBy(col("vec_id"))

  val embeddingOutliersOracle: String =
    s"""WITH $centroidSumsCte,
       |cent AS (
       |  SELECT label, list(mean ORDER BY dim) AS c FROM (
       |    SELECT label, dim,
       |      CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 16777216.0) AS mean
       |    FROM a)
       |  GROUP BY label),
       |d AS (
       |  SELECT v.vec_id, v.label,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, len(v.embedding) + 1),
       |        i -> (v.embedding[i]::DOUBLE - c.c[i])
       |           * (v.embedding[i]::DOUBLE - c.c[i]))),
       |      (acc, x) -> acc + x) AS dist2
       |  FROM embeddings v JOIN cent c ON c.label = v.label),
       |r AS (
       |  SELECT vec_id, label, dist2,
       |    ROW_NUMBER() OVER (ORDER BY dist2 DESC, vec_id) AS rk
       |  FROM d)
       |SELECT vec_id, label, dist2, CAST(rk AS INTEGER) AS rank
       |FROM r WHERE rk <= 25
       |ORDER BY vec_id""".stripMargin

  /** Full d×d covariance matrix
    * ([[graft.operators.EmbeddingStats.embeddingCovariance]]): one-pass
    * exact integer moments at 2^20 fixed point, each entry a fixed
    * two-operand IEEE chain over exactly-representable longs. The oracle
    * rebuilds n / S_i / P_ij from raw vectors and replays the chain.
    */
  def embeddingCovarianceQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EmbeddingStats.embeddingCovariance(
        T(s, dir, "embeddings"), col("embedding"), bits = 20)
      .orderBy(col("dim_i"), col("dim_j"))

  val embeddingCovarianceOracle: String =
    """WITH e1 AS (
      |  SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
      |    CAST(round(embedding[i]::DOUBLE * 1048576.0) AS BIGINT) AS qv
      |  FROM e1),
      |-- engine-side reduce skips null vectors; count the same population
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
      |       WHERE embedding IS NOT NULL),
      |s AS (SELECT dim, CAST(SUM(qv) AS BIGINT) AS sv FROM q GROUP BY dim),
      |p AS (
      |  SELECT a.dim AS dim_i, b.dim AS dim_j,
      |    CAST(SUM(a.qv * b.qv) AS BIGINT) AS pv
      |  FROM q a JOIN q b ON a.vec_id = b.vec_id
      |  GROUP BY 1, 2)
      |SELECT p.dim_i, p.dim_j, nn.n,
      |  (CAST(pv AS DOUBLE) / CAST(nn.n AS DOUBLE)
      |   - (CAST(si.sv AS DOUBLE) * CAST(sj.sv AS DOUBLE))
      |     / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)))
      |  / 1099511627776.0 AS cov
      |FROM p JOIN s si ON p.dim_i = si.dim JOIN s sj ON p.dim_j = sj.dim
      |CROSS JOIN nn
      |ORDER BY dim_i, dim_j""".stripMargin

  /** SemDeDup (Abbas et al. 2023): cluster with the pinned k-means||
    * quantizer ([[PinnedArtifacts.IvfCentroids16]]), then drop docs with a
    * lower-id same-cluster neighbor at cosine >= 0.45. Output is the full
    * assignment table (id, cid, kept), so the oracle checks BOTH the
    * nearest-centroid assignment of every vector and the prune decisions.
    */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = PinnedArtifacts.IvfCentroids16.toDF("cid", "cv")
    graft.operators.Dedup.semanticDedup(
        T(s, dir, "embeddings"), col("vec_id"), col("embedding"), cents,
        threshold = 0.45)
      .orderBy(col("id"))
  }

  def dedupSemanticOracle: String =
    s"""WITH $normsCte,
       |cent AS (
       |  SELECT cid, embedding,
       |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
       |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
       |  FROM (VALUES
       |${PinnedArtifacts.ivfCentroidsSqlValues}
       |  ) AS c(cid, embedding)),
       |ccand AS (
       |  SELECT v.vec_id, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${dotSql("v", "c")} / (v.nrm * c.nrm) DESC, c.cid) AS crn
       |  FROM n v CROSS JOIN cent c),
       |assign AS (SELECT vec_id, cid FROM ccand WHERE crn = 1),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM assign x JOIN assign b ON x.cid = b.cid AND x.vec_id < b.vec_id
       |  JOIN n q ON q.vec_id = x.vec_id
       |  JOIN n nb ON nb.vec_id = b.vec_id
       |  WHERE ${dotSql("q", "nb")} / (q.nrm * nb.nrm) >= 0.45)
       |SELECT a.vec_id AS id, CAST(a.cid AS BIGINT) AS cid,
       |  (d.vec_id IS NULL) AS kept
       |FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
       |ORDER BY id""".stripMargin

  /** Hard negatives for contrastive training: top-5 most-similar vectors
    * with a DIFFERENT label per query.
    */
  def simHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.hardNegatives(
        emb.filter(col("vec_id") < 20), emb, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val simHardNegativesOracle: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    c.label AS neighbor_label,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND q.vec_id <> c.vec_id AND q.label <> c.label
       |), ranked AS (
       |  SELECT query_id, neighbor_id, neighbor_label, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, neighbor_label, rank, cos
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Diverse top-5 via maximal marginal relevance: exact top-10 shortlist,
    * then greedy re-rank with weights 0.7·relevance − 0.3·max-similarity.
    */
  def simMmrTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.mmrTopK(
        emb.filter(col("vec_id") < 20), emb, k = 5, shortlist = 10,
        relWeight = 0.7, divWeight = 0.3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The greedy MMR loop unrolled to `k` argmax CTE stages — each stage
    * picks ROW_NUMBER()=1 by score (ties → smaller id) among candidates
    * not yet selected, carrying the picks forward. Identical float ops to
    * the engine (wRel·rel − wDiv·maxSim, maxSim via GREATEST), so scores
    * replay bit-identically.
    */
  private def mmrOracle(k: Int, shortlist: Int,
      wRel: String, wDiv: String): String = {
    val stages = (1 to k).map { r =>
      if (r == 1)
        s"""s1 AS (
           |  SELECT query_id, neighbor_id AS p1, score AS sc1 FROM (
           |    SELECT query_id, neighbor_id, $wRel * rel - $wDiv * 0 AS score,
           |      ROW_NUMBER() OVER (PARTITION BY query_id
           |        ORDER BY $wRel * rel - $wDiv * 0 DESC, neighbor_id) AS rn
           |    FROM cand) t WHERE rn = 1)""".stripMargin
      else {
        val carryOut = (1 until r).map(j => s"p$j, sc$j").mkString(", ")
        val carryIn = (1 until r).map(j => s"s.p$j, s.sc$j").mkString(", ")
        val simJoins = (1 until r).map(j =>
          s"""  JOIN cc m$j ON m$j.query_id = c.query_id
             |    AND m$j.ia = c.neighbor_id AND m$j.ib = s.p$j""".stripMargin)
          .mkString("\n")
        val score = s"$wRel * c.rel - $wDiv * GREATEST(${
          (1 until r).map(j => s"m$j.sim").mkString(", ")})"
        val excl = (1 until r).map(j => s"c.neighbor_id <> s.p$j")
          .mkString(" AND ")
        s"""s$r AS (
           |  SELECT query_id, $carryOut, neighbor_id AS p$r, score AS sc$r FROM (
           |    SELECT c.query_id, $carryIn, c.neighbor_id, $score AS score,
           |      ROW_NUMBER() OVER (PARTITION BY c.query_id
           |        ORDER BY $score DESC, c.neighbor_id) AS rn
           |    FROM cand c JOIN s${r - 1} s ON c.query_id = s.query_id
           |$simJoins
           |    WHERE $excl) t WHERE rn = 1)""".stripMargin
      }
    }.mkString(",\n")
    val finalSel = (1 to k).map(r =>
      s"SELECT query_id, p$r AS neighbor_id, CAST($r AS INTEGER) AS rank, sc$r AS score FROM s$k")
      .mkString("\nUNION ALL ")
    s"""WITH $normsCte,
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q", "c")} / (q.nrm * c.nrm) AS rel
       |  FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
       |cand AS (
       |  SELECT query_id, neighbor_id, rel FROM (
       |    SELECT query_id, neighbor_id, rel,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY rel DESC, neighbor_id) AS rn
       |    FROM scored) t WHERE rn <= $shortlist),
       |cc AS (
       |  SELECT a.query_id, a.neighbor_id AS ia, b.neighbor_id AS ib,
       |    ${dotSql("na", "nb")} / (na.nrm * nb.nrm) AS sim
       |  FROM cand a JOIN cand b ON a.query_id = b.query_id
       |    AND a.neighbor_id <> b.neighbor_id
       |  JOIN n na ON na.vec_id = a.neighbor_id
       |  JOIN n nb ON nb.vec_id = b.neighbor_id),
       |$stages
       |$finalSel
       |ORDER BY query_id, rank""".stripMargin
  }

  val simMmrTopkOracle: String = mmrOracle(5, 10, "0.7", "0.3")

  /** Cluster-balanced subsample: nearest-centroid assignment over the
    * pinned quantizer, then exactly 10 vectors per cluster by md5 rank —
    * the diversity-preserving selection companion to [[dedupSemantic]].
    */
  def samplePerCluster(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = PinnedArtifacts.IvfCentroids16.toDF("cid", "cv")
    graft.operators.Sampling.clusterBalancedSample(
        T(s, dir, "embeddings"), col("vec_id"), col("embedding"), cents,
        nPerCluster = 10)
      .orderBy(col("cid"), col("id"))
  }

  def samplePerClusterOracle: String =
    s"""WITH $normsCte,
       |cent AS (
       |  SELECT cid, embedding,
       |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
       |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
       |  FROM (VALUES
       |${PinnedArtifacts.ivfCentroidsSqlValues}
       |  ) AS c(cid, embedding)),
       |ccand AS (
       |  SELECT v.vec_id, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${dotSql("v", "c")} / (v.nrm * c.nrm) DESC, c.cid) AS crn
       |  FROM n v CROSS JOIN cent c),
       |assign AS (SELECT vec_id, cid FROM ccand WHERE crn = 1),
       |ranked AS (
       |  SELECT cid, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY cid
       |      ORDER BY ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
       |               vec_id) AS rk
       |  FROM assign)
       |SELECT CAST(cid AS BIGINT) AS cid, vec_id AS id
       |FROM ranked WHERE rk <= 10
       |ORDER BY cid, id""".stripMargin

  /** IVF-Flat top-5: deterministic modulus-sampled centroids, nprobe=2. */
  def simIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.ivfTopK(
        emb.filter(col("vec_id") < 20), emb, k = 5, centroidEvery = 50, nprobe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF with a TRAINED fixed-size quantizer — the production/scale path:
    * centroid count stays K as the corpus grows, so map-side assignment is
    * n×K (linear in n), unlike `sim_ivf_topk`'s oracle-reproducible modulus
    * sampler whose centroid count is n/50 (assignment n²/50 — measured
    * super-linear in the stress harness; BASELINE.md round 5). The
    * quantizer is INJECTED from [[PinnedArtifacts.IvfCentroids16]] (k-means||
    * run once by [[graft.tools.TrainArtifacts]] and pinned as literals —
    * the "ship the trained quantizer as a build artifact" pattern), so the
    * post-training plan is fully deterministic and the oracle replays
    * assignment + probing over the same literal centroid table. Training
    * itself stays spec-gated (SimilaritySpec on `trainCentroids`).
    */
  def simIvfTrained(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = T(s, dir, "embeddings")
    val cents = PinnedArtifacts.IvfCentroids16.toDF("cid", "cv")
    graft.operators.Similarity.ivfTopKWith(
        emb.filter(col("vec_id") < 20), emb, cents, k = 5, nprobe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  def simIvfTrainedOracle: String =
    s"""WITH $normsCte,
       |cent AS (
       |  SELECT cid, embedding,
       |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
       |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
       |  FROM (VALUES
       |${PinnedArtifacts.ivfCentroidsSqlValues}
       |  ) AS c(cid, embedding)),
       |ccand AS (
       |  SELECT v.vec_id, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${dotSql("v", "c")} / (v.nrm * c.nrm) DESC, c.cid) AS crn
       |  FROM n v CROSS JOIN cent c),
       |assign AS (SELECT vec_id AS neighbor_id, cid FROM ccand WHERE crn = 1),
       |probes AS (SELECT vec_id AS query_id, cid FROM ccand WHERE crn <= 2 AND vec_id < 20),
       |scored AS (
       |  SELECT p.query_id, a.neighbor_id, ${dotSql("q", "nb")} / (q.nrm * nb.nrm) AS cos
       |  FROM probes p
       |  JOIN assign a ON a.cid = p.cid
       |  JOIN n q ON q.vec_id = p.query_id
       |  JOIN n nb ON nb.vec_id = a.neighbor_id
       |  WHERE a.neighbor_id <> p.query_id)
       |SELECT query_id, neighbor_id, rank, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  val simIvfOracle: String =
    s"""WITH $normsCte,
       |cent AS (SELECT vec_id AS cid, embedding, nrm FROM n
       |         WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 128),
       |ccand AS (
       |  SELECT v.vec_id, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${dotSql("v", "c")} / (v.nrm * c.nrm) DESC, c.cid) AS crn
       |  FROM n v CROSS JOIN cent c),
       |assign AS (SELECT vec_id AS neighbor_id, cid FROM ccand WHERE crn = 1),
       |probes AS (SELECT vec_id AS query_id, cid FROM ccand WHERE crn <= 2 AND vec_id < 20),
       |scored AS (
       |  SELECT p.query_id, a.neighbor_id, ${dotSql("q", "nb")} / (q.nrm * nb.nrm) AS cos
       |  FROM probes p
       |  JOIN assign a ON a.cid = p.cid
       |  JOIN n q ON q.vec_id = p.query_id
       |  JOIN n nb ON nb.vec_id = a.neighbor_id
       |  WHERE a.neighbor_id <> p.query_id)
       |SELECT query_id, neighbor_id, rank, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** ANN index acceptance gate ([[graft.operators.Similarity.recallReport]]):
    * recall@5 of the pinned-quantizer IVF (nprobe = 2) against exact
    * brute force on the same probe set — per-query hit counts and the
    * exact-integer-ratio recall. The oracle replays BOTH sides (the
    * brute-force ranking and the centroid-assignment + probe chain over
    * the same pinned literals) and intersects them.
    */
  def annRecallQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = T(s, dir, "embeddings")
    val probes = emb.filter(col("vec_id") < 20)
    val cents = PinnedArtifacts.IvfCentroids16.toDF("cid", "cv")
    graft.operators.Similarity.recallReport(
        graft.operators.Similarity.bruteForceTopK(probes, emb, k = 5),
        graft.operators.Similarity.ivfTopKWith(probes, emb, cents, k = 5,
          nprobe = 2))
      .orderBy(col("query_id"))
  }

  val annRecallOracle: String =
    s"""WITH $normsCte,
       |ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, nb.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${dotSql("q", "nb")} / (q.nrm * nb.nrm) DESC,
       |                 nb.vec_id) AS rk
       |    FROM n q JOIN n nb ON q.vec_id < 20 AND q.vec_id <> nb.vec_id) t
       |  WHERE rk <= 5),
       |cent AS (
       |  SELECT cid, embedding,
       |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
       |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
       |  FROM (VALUES
       |${PinnedArtifacts.ivfCentroidsSqlValues}
       |  ) AS c(cid, embedding)),
       |ccand AS (
       |  SELECT v.vec_id, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${dotSql("v", "c")} / (v.nrm * c.nrm) DESC, c.cid) AS crn
       |  FROM n v CROSS JOIN cent c),
       |assign AS (SELECT vec_id AS neighbor_id, cid FROM ccand WHERE crn = 1),
       |probes AS (SELECT vec_id AS query_id, cid FROM ccand
       |           WHERE crn <= 2 AND vec_id < 20),
       |ap AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT p.query_id, a.neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.query_id
       |        ORDER BY ${dotSql("q", "nb")} / (q.nrm * nb.nrm) DESC,
       |                 a.neighbor_id) AS rk
       |    FROM probes p
       |    JOIN assign a ON a.cid = p.cid
       |    JOIN n q ON q.vec_id = p.query_id
       |    JOIN n nb ON nb.vec_id = a.neighbor_id
       |    WHERE a.neighbor_id <> p.query_id) t
       |  WHERE rk <= 5),
       |hits AS (
       |  SELECT query_id, COUNT(*) AS n_hit FROM (
       |    SELECT * FROM ex INTERSECT SELECT * FROM ap) GROUP BY 1),
       |ne AS (SELECT query_id, COUNT(*) AS n_exact FROM ex GROUP BY 1)
       |SELECT ne.query_id, ne.n_exact,
       |  COALESCE(h.n_hit, 0) AS n_hit,
       |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(ne.n_exact AS DOUBLE)
       |    AS recall
       |FROM ne LEFT JOIN hits h ON h.query_id = ne.query_id
       |ORDER BY ne.query_id""".stripMargin

  /** Embedding-free text similarity search end to end: documents →
    * [[graft.operators.TextIndex.hashedTfidfVectors]] (feature hashing,
    * ln-free idf, 2^20 fixed-point bucket sums, float vectors) → the
    * SAME brute-force cosine top-k the neural-embedding queries use.
    * Probes = non-blank docs with doc_id % 97 == 0, top-3. The oracle
    * replays the hashing + fixed-point sums and folds sparse dot/norm in
    * bucket order — identical to the engine's dense index-order fold
    * because the absent buckets contribute exact +0.0 no-ops.
    */
  def simHashedTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
    val vecs = graft.operators.TextIndex.hashedTfidfVectors(
        docs, col("doc_id"), col("text"), dims = 64)
      .select(col("doc_id").as("vec_id"), col("vec").as("embedding"))
    graft.operators.Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") % 97 === 0), vecs, k = 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Shared replay of [[graft.operators.TextIndex.hashedTfidfVectors]] as
    * DuckDB CTEs — sparse (doc_id, b, val) vectors `vf` plus per-doc L2
    * norms `nrm`. ONE copy (the hash-bucket formula, 2^20 fixed point,
    * float cast, and fold order must stay bit-identical wherever the
    * vectors are replayed): both [[simHashedTfidfOracle]] (brute serve)
    * and [[simHashedLshOracle]] (LSH serve) build on it.
    */
  private val hashedTfidfVfCtes: String =
    """w AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents WHERE trim(text) <> ''),
      |p AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
      |dfd AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM documents WHERE trim(text) <> ''),
      |v AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(term), 1, 8))::BIGINT % 64 AS b,
      |    SUM(CAST(round((CAST(tf AS DOUBLE)
      |      * (CAST(nn.n AS DOUBLE) / CAST(dfd.df AS DOUBLE)))
      |      * 1048576.0) AS BIGINT)) AS sv
      |  FROM p JOIN dfd USING (term) CROSS JOIN nn
      |  GROUP BY 1, 2),
      |vf AS (
      |  SELECT doc_id, b,
      |    CAST(CAST(sv AS DOUBLE) / 1048576.0 AS FLOAT) AS val
      |  FROM v),
      |nrm AS (
      |  SELECT doc_id,
      |    sqrt(list_reduce(list_prepend(0.0,
      |      list(CAST(val AS DOUBLE) * CAST(val AS DOUBLE) ORDER BY b)),
      |      (a, x) -> a + x)) AS nrm
      |  FROM vf GROUP BY doc_id)""".stripMargin

  val simHashedTfidfOracle: String =
    s"""WITH $hashedTfidfVfCtes,
      |dots AS (
      |  SELECT qa.doc_id AS query_id, ca.doc_id AS neighbor_id,
      |    list_reduce(list_prepend(0.0,
      |      list(CAST(qa.val AS DOUBLE) * CAST(ca.val AS DOUBLE) ORDER BY qa.b)),
      |      (a, x) -> a + x) AS dot
      |  FROM vf qa JOIN vf ca ON qa.b = ca.b
      |    AND qa.doc_id % 97 = 0 AND qa.doc_id <> ca.doc_id
      |  GROUP BY 1, 2),
      |allp AS (
      |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
      |    q.nrm AS qn, c.nrm AS cn
      |  FROM nrm q JOIN nrm c ON q.doc_id % 97 = 0 AND q.doc_id <> c.doc_id),
      |sc AS (
      |  SELECT a.query_id, a.neighbor_id,
      |    COALESCE(d.dot, 0.0) / (a.qn * a.cn) AS cos
      |  FROM allp a
      |  LEFT JOIN dots d ON d.query_id = a.query_id
      |    AND d.neighbor_id = a.neighbor_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
      |  FROM sc)
      |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  /** The 10⁹-document shape of [[simHashedTfidf]]: the SAME hashed
    * TF-IDF vectors served through the LSH searcher instead of
    * brute-force — [[graft.operators.TextIndex.hashedTfidfVectors]] →
    * [[graft.operators.Similarity.lshTopK]] (8-bit sign-random-projection
    * buckets, exact cosine rescoring inside the bucket). Same probe set
    * (doc_id % 97) and k as the brute entry, so the two results are
    * directly comparable and [[graft.operators.Similarity.recallReport]]
    * can gate the swap. Candidate work per query is its bucket's
    * occupancy (~corpus/2^bits), not the corpus — the composition the
    * brute-force entry's scale adjudication promises. The oracle replays
    * hashing-trick vectors (fixed-point bucket sums), SRP buckets
    * (md5-derived planes; the sparse b-ordered fold equals the engine's
    * dense index-ordered fold because absent buckets contribute exact
    * +0.0 no-ops and all tf-idf values are positive, so no -0.0 can
    * arise), and in-bucket cosine top-3.
    *
    * The probe set is additionally bounded to ids below the
    * [[graft.Stress]] replica stride (1 000 000) — a no-op at every
    * oracle SF (all real doc_ids sit far below it), but under stress
    * replication it pins the probe WORKLOAD fixed while the corpus
    * grows, so the stress rows measure the per-probe serve cost's
    * linearity rather than a harness-scaled probe count (the
    * brute-force entry's ×64 adjudication is exactly that confound).
    */
  def simHashedLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
    val vecs = graft.operators.TextIndex.hashedTfidfVectors(
        docs, col("doc_id"), col("text"), dims = 64)
      .select(col("doc_id").as("vec_id"), col("vec").as("embedding"))
    graft.operators.Similarity.lshTopK(
        vecs.filter(col("vec_id") % 97 === 0 &&
          col("vec_id") < graft.Stress.IdStride),
        vecs, k = 3, bits = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  val simHashedLshOracle: String =
    s"""WITH $hashedTfidfVfCtes,
      |dj AS (
      |  SELECT doc_id, j,
      |    list_reduce(list_prepend(0.0,
      |      list(CAST(val AS DOUBLE)
      |        * (('0x' || substring(md5('plane:' || j || ':' || b), 1, 8))::BIGINT::DOUBLE
      |           / 2147483648.0 - 1.0) ORDER BY b)),
      |      (a, x) -> a + x) AS dot
      |  FROM vf CROSS JOIN range(0, 8) AS js(j)
      |  GROUP BY doc_id, j),
      |bk AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN dot > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT)
      |      AS bucket
      |  FROM dj GROUP BY doc_id),
      |cand AS (
      |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id
      |  FROM bk q JOIN bk c ON q.bucket = c.bucket
      |    AND q.doc_id % 97 = 0 AND q.doc_id < ${graft.Stress.IdStride}
      |    AND q.doc_id <> c.doc_id),
      |dots AS (
      |  SELECT cd.query_id, cd.neighbor_id,
      |    list_reduce(list_prepend(0.0,
      |      list(CAST(qa.val AS DOUBLE) * CAST(ca.val AS DOUBLE) ORDER BY qa.b)),
      |      (a, x) -> a + x) AS dot
      |  FROM cand cd
      |  JOIN vf qa ON qa.doc_id = cd.query_id
      |  JOIN vf ca ON ca.doc_id = cd.neighbor_id AND ca.b = qa.b
      |  GROUP BY 1, 2),
      |sc AS (
      |  SELECT cand.query_id, cand.neighbor_id,
      |    COALESCE(d.dot, 0.0) / (qn.nrm * cn.nrm) AS cos
      |  FROM cand
      |  JOIN nrm qn ON qn.doc_id = cand.query_id
      |  JOIN nrm cn ON cn.doc_id = cand.neighbor_id
      |  LEFT JOIN dots d ON d.query_id = cand.query_id
      |    AND d.neighbor_id = cand.neighbor_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
      |  FROM sc)
      |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  /** Exact brute-force cosine top-5 for the first 20 vectors against the full
    * corpus: broadcast the probe set, one scan of the corpus, per-query top-k.
    */
  def simBruteForce(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 20), emb, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val simBruteForceOracle: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM embeddings q JOIN embeddings c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, cos
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Int8-quantization error audit ([[graft.operators.EmbeddingStats
    * .quantErrorReport]]): per-label reconstruction-error distribution
    * between each L2-normalized vector and its ±127 code — the
    * acceptance gate before serving from quantized codes. The oracle
    * replays the norm fold, the half-away-from-zero code rounding (the
    * embedding_covariance convention), the per-dim error zip, the seeded
    * mse/max folds, and the discrete percentiles.
    */
  def quantErrorQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EmbeddingStats.quantErrorReport(
        T(s, dir, "embeddings"), col("label"), col("embedding"))
      .orderBy(col("label"))

  val quantErrorOracle: String =
    """WITH v AS (
      |  SELECT label, embedding,
      |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE),
      |      (x, y) -> x + y)) AS nrm
      |  FROM embeddings),
      |q AS (
      |  SELECT label, nrm, len(embedding) AS d,
      |    CASE WHEN nrm = 0 THEN NULL ELSE
      |      list_transform(range(1, len(embedding) + 1), i ->
      |        embedding[i]::DOUBLE / nrm -
      |        (CASE WHEN 127.0 * (embedding[i]::DOUBLE / nrm) >= 0
      |          THEN floor(127.0 * (embedding[i]::DOUBLE / nrm) + 0.5)
      |          ELSE ceil(127.0 * (embedding[i]::DOUBLE / nrm) - 0.5)
      |         END) / 127.0)
      |    END AS errs
      |  FROM v),
      |e AS (
      |  SELECT label, nrm,
      |    CASE WHEN nrm = 0 THEN NULL
      |      ELSE list_reduce(list_transform(errs, e -> e * e),
      |        (x, y) -> x + y) / d END AS mse,
      |    CASE WHEN nrm = 0 THEN NULL
      |      ELSE list_reduce(list_transform(errs, e -> abs(e)),
      |        (x, y) -> CASE WHEN x > y THEN x ELSE y END) END AS maxe
      |  FROM q)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  quantile_disc(mse, 0.5) AS mse_p50,
      |  quantile_disc(mse, 0.9) AS mse_p90,
      |  MAX(mse) AS mse_max, MAX(maxe) AS abserr_max
      |FROM e GROUP BY label
      |ORDER BY label""".stripMargin

  /** Margin-based bitext mining ([[graft.operators.Similarity
    * .marginMine]]): even-id probes aligned against the odd-id slice by
    * the LASER ratio margin `cos / ((avgK(x) + avgK(y)) / 2)`, k = 4,
    * threshold 1.3 (keeps 10-16 of 20 probes at the driver SFs — both
    * mined and unmined queries reach the gate). The oracle replays the
    * cosines, both rank-order k-NN average folds (list_reduce over the
    * (cos desc, id) slice ≡ the engine's seeded left fold), the margin
    * chain, and the argmax with its low-id tie-break.
    */
  def bitextMineQ(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.marginMine(
        emb.filter(col("vec_id") % 2 === 0 &&
          col("vec_id") < lit(graft.Stress.IdStride) &&
          col("vec_id") < 40),
        emb.filter(col("vec_id") % 2 === 1),
        k = 4, threshold = 1.3)
      .orderBy(col("query_id"))
  }

  val bitextMineOracle: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id % 2 = 0 AND q.vec_id < 40 AND c.vec_id % 2 = 1),
       |f AS (SELECT query_id, list(cos ORDER BY cos DESC, match_id)[1:4]
       |        AS l FROM scored GROUP BY 1),
       |fa AS (SELECT query_id,
       |         list_reduce(l, (x, y) -> x + y) / len(l) AS fa FROM f),
       |b AS (SELECT match_id, list(cos ORDER BY cos DESC, query_id)[1:4]
       |        AS l FROM scored GROUP BY 1),
       |ba AS (SELECT match_id,
       |         list_reduce(l, (x, y) -> x + y) / len(l) AS ba FROM b),
       |m AS (
       |  SELECT s.query_id, s.match_id, s.cos,
       |    s.cos / ((fa.fa + ba.ba) / 2.0) AS margin,
       |    ROW_NUMBER() OVER (PARTITION BY s.query_id
       |      ORDER BY s.cos / ((fa.fa + ba.ba) / 2.0) DESC, s.match_id)
       |      AS rn
       |  FROM scored s JOIN fa USING (query_id) JOIN ba USING (match_id))
       |SELECT query_id, match_id, cos, margin
       |FROM m WHERE rn = 1 AND margin >= 1.3
       |ORDER BY query_id""".stripMargin

  /** Bitext mining THROUGH THE LSH SHORTLIST
    * ([[graft.operators.Similarity.marginMineLsh]]) — the 10⁹-candidate
    * composition path [[bitextMineQ]]'s scaladoc names: SRP buckets
    * (8 bits, 1-bit multiprobe on the query side) shortlist the pairs,
    * then the SAME margin chain ranks the shortlist. Margins differ from
    * the full scan by construction (neighborhood averages read only
    * shortlisted candidates), so this entry has its own oracle replaying
    * the bucket join (`bit_count(xor) <= 1` — the
    * [[simLshMultiprobeOracle]] replay) ahead of the margin chain.
    */
  def bitextMineLshQ(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.marginMineLsh(
        emb.filter(col("vec_id") % 2 === 0 &&
          col("vec_id") < lit(graft.Stress.IdStride) &&
          col("vec_id") < 40),
        emb.filter(col("vec_id") % 2 === 1),
        k = 4, threshold = 1.3, bits = 8, multiProbe = true)
      .orderBy(col("query_id"))
  }

  val bitextMineLshOracle: String =
    s"""WITH buckets AS (
       |  SELECT vec_id, embedding,
       |    list_sum(list_transform(range(0, 8), j ->
       |      CASE WHEN list_reduce(
       |          list_transform(range(1, len(embedding) + 1), i ->
       |            embedding[i]::DOUBLE *
       |            (('0x' || substring(md5('plane:' || j || ':' || (i - 1)), 1, 8))::BIGINT::DOUBLE
       |             / 2147483648.0 - 1.0)),
       |          (x, y) -> x + y) > 0
       |      THEN 1::BIGINT << j ELSE 0 END)) AS bucket
       |  FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM buckets q JOIN buckets c
       |    ON bit_count(xor(q.bucket, c.bucket)) <= 1
       |    AND q.vec_id % 2 = 0 AND q.vec_id < 40 AND c.vec_id % 2 = 1),
       |f AS (SELECT query_id, list(cos ORDER BY cos DESC, match_id)[1:4]
       |        AS l FROM scored GROUP BY 1),
       |fa AS (SELECT query_id,
       |         list_reduce(l, (x, y) -> x + y) / len(l) AS fa FROM f),
       |b AS (SELECT match_id, list(cos ORDER BY cos DESC, query_id)[1:4]
       |        AS l FROM scored GROUP BY 1),
       |ba AS (SELECT match_id,
       |         list_reduce(l, (x, y) -> x + y) / len(l) AS ba FROM b),
       |m AS (
       |  SELECT s.query_id, s.match_id, s.cos,
       |    s.cos / ((fa.fa + ba.ba) / 2.0) AS margin,
       |    ROW_NUMBER() OVER (PARTITION BY s.query_id
       |      ORDER BY s.cos / ((fa.fa + ba.ba) / 2.0) DESC, s.match_id)
       |      AS rn
       |  FROM scored s JOIN fa USING (query_id) JOIN ba USING (match_id))
       |SELECT query_id, match_id, cos, margin
       |FROM m WHERE rn = 1 AND margin >= 1.3
       |ORDER BY query_id""".stripMargin

  /** Metadata-filtered search: top-5 among ENGLISH documents only — the
    * corpus is pre-filtered by a predicate on the documents table
    * (semi-join on id), then scored. See
    * [[graft.operators.Similarity.filteredTopK]].
    */
  def simFilteredTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val en = T(s, dir, "documents").filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    graft.operators.Similarity.filteredTopK(
        emb.filter(col("vec_id") < 20), emb, en, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val simFilteredTopkOracle: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM embeddings q
       |  JOIN embeddings c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
       |  JOIN documents d ON c.vec_id = d.doc_id AND d.lang = 'en'
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, cos
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Int8-quantized top-5 for the first 20 vectors: L2-normalize, round to
    * ±127 codes, rank by exact integer dot product — all integer math after
    * quantization, so the oracle reproduces scores bit-for-bit. The
    * normalize-then-round contract (left-to-right double norm fold,
    * half-away-from-zero rounding) matches DuckDB's `round` semantics.
    */
  def simQuantized(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.quantizedTopK(
        emb.filter(col("vec_id") < 20), emb, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val simQuantizedOracle: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
      |  FROM embeddings),
      |qz AS (
      |  SELECT vec_id,
      |    list_transform(range(1, len(embedding) + 1),
      |      i -> CASE WHEN nrm = 0 THEN CAST(0 AS BIGINT)
      |           ELSE CAST(round(127 * (embedding[i]::DOUBLE / nrm)) AS BIGINT) END) AS code
      |  FROM n),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_reduce(list_transform(range(1, len(q.code) + 1),
      |      i -> q.code[i] * c.code[i]), (x, y) -> x + y) AS dot
      |  FROM qz q JOIN qz c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, dot,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY dot DESC, neighbor_id) AS INTEGER) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, rank, CAST(dot AS BIGINT) AS dot
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Product-quantization ADC top-5 (Jégou et al.): int8-quantize, split
    * into 8 subspaces, assign each sub-code its nearest entry of a
    * deterministic modulus-sampled sub-codebook by exact integer squared
    * L2, then score queries against the reconstructed codes via per-query
    * lookup tables — long arithmetic end to end, so the oracle replays
    * assignment ties, ADC sums, and ranking bit-for-bit. The packed-binary
    * variant (`pqTopKPacked`, m bytes per corpus vector = 32× compression
    * at dims 64) is spec-gated equal to this relational form.
    */
  def simPq(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.pqTopK(
        emb.filter(col("vec_id") < 20), emb, k = 5, m = 8, entryEvery = 25)
      .orderBy(col("query_id"), col("rank"))
  }

  val simPqOracle: String = {
    // exact integer dot of two 8-element BIGINT sub-code lists
    def idot(a: String, b: String): String =
      s"list_reduce(list_transform(range(1, 9), i -> $a[i] * $b[i]), (x, y) -> x + y)"
    s"""WITH n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
       |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
       |  FROM embeddings),
       |qz AS (
       |  SELECT vec_id,
       |    list_transform(range(1, len(embedding) + 1),
       |      i -> CASE WHEN nrm = 0 THEN CAST(0 AS BIGINT)
       |           ELSE CAST(round(127 * (embedding[i]::DOUBLE / nrm)) AS BIGINT) END) AS code
       |  FROM n),
       |sq AS (
       |  SELECT vec_id, sub, code[(sub * 8 + 1):(sub * 8 + 8)] AS scode
       |  FROM qz CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) subs),
       |cbids AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS entry
       |          FROM (SELECT vec_id FROM qz WHERE vec_id % 25 = 0
       |                ORDER BY vec_id LIMIT 128)),
       |cb AS (SELECT i.entry, s.sub, s.scode
       |       FROM sq s JOIN cbids i ON i.vec_id = s.vec_id),
       |asg AS (
       |  SELECT vec_id, sub, entry FROM (
       |    SELECT x.vec_id, x.sub, c.entry,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
       |        (${idot("x.scode", "x.scode")} - 2 * ${idot("x.scode", "c.scode")}
       |         + ${idot("c.scode", "c.scode")}), c.entry) AS rn
       |    FROM sq x JOIN cb c ON c.sub = x.sub) t
       |  WHERE rn = 1),
       |lut AS (
       |  SELECT q.vec_id AS query_id, q.sub, c.entry, ${idot("q.scode", "c.scode")} AS pdot
       |  FROM sq q JOIN cb c ON c.sub = q.sub WHERE q.vec_id < 20),
       |scored AS (
       |  SELECT l.query_id, a.vec_id AS neighbor_id, CAST(SUM(l.pdot) AS BIGINT) AS adc
       |  FROM asg a JOIN lut l ON l.sub = a.sub AND l.entry = a.entry
       |  WHERE a.vec_id <> l.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, rank, adc FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-PQ top-5: modulus-sampled coarse centroids prune the scan to
    * nprobe=2 cells per query; packed PQ codes (same 8-subspace codebook as
    * `sim_pq_topk`) ADC-score the survivors. The oracle replays the whole
    * composed pipeline — double-fold cosine cell assignment with its ties,
    * int8 sub-code assignment, exact long ADC sums, candidate pruning, and
    * ranking — bit-for-bit.
    */
  def simIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.ivfPqTopK(
        emb.filter(col("vec_id") < 20), emb, k = 5, m = 8, entryEvery = 25,
        centroidEvery = 50, nprobe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  val simIvfPqOracle: String = {
    def idot(a: String, b: String): String =
      s"list_reduce(list_transform(range(1, 9), i -> $a[i] * $b[i]), (x, y) -> x + y)"
    s"""WITH $normsCte,
       |cent AS (SELECT vec_id AS cid, embedding, nrm FROM n
       |         WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 128),
       |ccand AS (
       |  SELECT v.vec_id, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${dotSql("v", "c")} / (v.nrm * c.nrm) DESC, c.cid) AS crn
       |  FROM n v CROSS JOIN cent c),
       |assign AS (SELECT vec_id, cid FROM ccand WHERE crn = 1),
       |probes AS (SELECT vec_id AS query_id, cid FROM ccand WHERE crn <= 2 AND vec_id < 20),
       |qz AS (
       |  SELECT vec_id,
       |    list_transform(range(1, len(embedding) + 1),
       |      i -> CASE WHEN nrm = 0 THEN CAST(0 AS BIGINT)
       |           ELSE CAST(round(127 * (embedding[i]::DOUBLE / nrm)) AS BIGINT) END) AS code
       |  FROM n),
       |sq AS (
       |  SELECT vec_id, sub, code[(sub * 8 + 1):(sub * 8 + 8)] AS scode
       |  FROM qz CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) subs),
       |cbids AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS entry
       |          FROM (SELECT vec_id FROM qz WHERE vec_id % 25 = 0
       |                ORDER BY vec_id LIMIT 128)),
       |cb AS (SELECT i.entry, s.sub, s.scode
       |       FROM sq s JOIN cbids i ON i.vec_id = s.vec_id),
       |asg AS (
       |  SELECT vec_id, sub, entry FROM (
       |    SELECT x.vec_id, x.sub, c.entry,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
       |        (${idot("x.scode", "x.scode")} - 2 * ${idot("x.scode", "c.scode")}
       |         + ${idot("c.scode", "c.scode")}), c.entry) AS rn
       |    FROM sq x JOIN cb c ON c.sub = x.sub) t
       |  WHERE rn = 1),
       |lut AS (
       |  SELECT q.vec_id AS query_id, q.sub, c.entry, ${idot("q.scode", "c.scode")} AS pdot
       |  FROM sq q JOIN cb c ON c.sub = q.sub WHERE q.vec_id < 20),
       |adc AS (
       |  SELECT l.query_id, a.vec_id AS neighbor_id, CAST(SUM(l.pdot) AS BIGINT) AS adc
       |  FROM asg a JOIN lut l ON l.sub = a.sub AND l.entry = a.entry
       |  WHERE a.vec_id <> l.query_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT adc.query_id, adc.neighbor_id, adc.adc
       |  FROM adc
       |  JOIN assign x ON x.vec_id = adc.neighbor_id
       |  JOIN probes p ON p.query_id = adc.query_id AND p.cid = x.cid)
       |SELECT query_id, neighbor_id, rank, adc FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** ANN in a JL-projected space: embeddings are reduced 64 → 8 dims with
    * the content-addressed ±1 matrix, and exact top-5 cosine runs in the
    * reduced space. The oracle replays the sign matrix (md5 parity), the
    * left-to-right projection folds, the float cast, and the reduced-space
    * cosine — bit-for-bit.
    */
  def simJlTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val proj = emb.select(col("vec_id"),
      graft.operators.Similarity.jlProject(col("embedding"), 8).as("embedding"))
    graft.operators.Similarity.bruteForceTopK(
        proj.filter(col("vec_id") < 20), proj, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val simJlTopkOracle: String = {
    val projSql =
      """list_transform(range(0, 8), j -> CAST(
        |      list_reduce(list_transform(range(1, len(embedding) + 1), i ->
        |        CASE WHEN ('0x' || substring(md5('jl:' || j || ':' || (i - 1)), 1, 8))::BIGINT % 2 = 0
        |             THEN embedding[i]::DOUBLE ELSE -(embedding[i]::DOUBLE) END),
        |        (x, y) -> x + y) AS FLOAT))""".stripMargin
    s"""WITH p AS (
       |  SELECT vec_id, $projSql AS emb8
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("q.emb8", "c.emb8")} AS cos
       |  FROM p q JOIN p c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, cos
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** kNN label propagation: each probe vector takes the majority label of
    * its 5 exact-cosine nearest labeled neighbors (ties → smaller label).
    * The auto-labeling move for bootstrapping classifiers off a small
    * labeled pool.
    */
  def simKnnLabel(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.knnLabel(
        emb.filter(col("vec_id") < 20), emb, k = 5)
      .orderBy(col("query_id"))
  }

  val simKnnLabelOracle: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND q.vec_id <> c.vec_id
       |), ranked AS (
       |  SELECT query_id, label,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored),
       |votes AS (
       |  SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS votes
       |  FROM ranked WHERE rank <= 5
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT query_id, label, votes,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY votes DESC, label) AS rk
       |  FROM votes)
       |SELECT query_id, label, votes
       |FROM best WHERE rk = 1
       |ORDER BY query_id""".stripMargin

  /** Approximate top-5 via 8-bit sign-random-projection buckets + exact
    * rescoring inside the bucket. Deterministic md5-derived hyperplanes mean
    * the oracle can recompute the identical buckets in SQL.
    */
  def simLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.lshTopK(
        emb.filter(col("vec_id") < 20), emb, k = 5, bits = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  val simLshOracle: String =
    s"""WITH buckets AS (
       |  SELECT vec_id, embedding,
       |    list_sum(list_transform(range(0, 8), j ->
       |      CASE WHEN list_reduce(
       |          list_transform(range(1, len(embedding) + 1), i ->
       |            embedding[i]::DOUBLE *
       |            (('0x' || substring(md5('plane:' || j || ':' || (i - 1)), 1, 8))::BIGINT::DOUBLE
       |             / 2147483648.0 - 1.0)),
       |          (x, y) -> x + y) > 0
       |      THEN 1::BIGINT << j ELSE 0 END)) AS bucket
       |  FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM buckets q JOIN buckets c ON q.bucket = c.bucket
       |    AND q.vec_id < 20 AND q.vec_id <> c.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, cos
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Multi-probe LSH top-5: the query additionally probes every bucket at
    * hamming distance 1 (flip each sign bit), trading bits× more probe keys
    * on the (small) query side for recall. Oracle: candidates are pairs
    * whose buckets differ in <= 1 bit.
    */
  def simLshMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.lshTopK(
        emb.filter(col("vec_id") < 20), emb, k = 5, bits = 8, multiProbe = true)
      .orderBy(col("query_id"), col("rank"))
  }

  val simLshMultiprobeOracle: String =
    s"""WITH buckets AS (
       |  SELECT vec_id, embedding,
       |    list_sum(list_transform(range(0, 8), j ->
       |      CASE WHEN list_reduce(
       |          list_transform(range(1, len(embedding) + 1), i ->
       |            embedding[i]::DOUBLE *
       |            (('0x' || substring(md5('plane:' || j || ':' || (i - 1)), 1, 8))::BIGINT::DOUBLE
       |             / 2147483648.0 - 1.0)),
       |          (x, y) -> x + y) > 0
       |      THEN 1::BIGINT << j ELSE 0 END)) AS bucket
       |  FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM buckets q JOIN buckets c ON bit_count(xor(q.bucket, c.bucket)) <= 1
       |    AND q.vec_id < 20 AND q.vec_id <> c.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, cos
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Keyword extraction + corpus term stats: top-3 terms per doc (tf desc,
    * term tiebreak) joined with each term's document frequency — all
    * integer-exact.
    */
  def topTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val top = graft.operators.TextIndex.topTermsPerDoc(
      docs, col("doc_id"), col("text"), k = 3, minLen = 4)
    val stats = graft.operators.TextIndex.termStats(docs, col("doc_id"), col("text"))
      .select(col("term"), col("df"))
    top.join(stats, Seq("term"))
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val topTermsOracle: String =
    """WITH posting AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM posting GROUP BY 1, 2
      |), df AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
      |), ranked AS (
      |  SELECT doc_id, term, tf,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS INTEGER) AS rank
      |  FROM tf WHERE length(term) >= 4)
      |SELECT doc_id, rank, r.term, tf, df.df
      |FROM ranked r JOIN df ON r.term = df.term
      |WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Deterministic hash sampling: 20% global sample by doc_id plus
    * per-language stratified fractions — membership is a pure function of
    * the key, so the oracle applies the identical predicate.
    */
  def sampleDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val global = graft.operators.Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select(col("doc_id"), lit("global").as("sample"))
    val strat = graft.operators.Sampling.stratifiedHashSample(
        docs, col("lang"), col("doc_id"),
        Map("en" -> 0.5, "de" -> 0.1))
      .select(col("doc_id"), lit("strat").as("sample"))
    global.unionAll(strat).orderBy(col("sample"), col("doc_id"))
  }

  val sampleDocsOracle: String =
    """SELECT doc_id, sample FROM (
      |  SELECT doc_id, 'global' AS sample FROM documents
      |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |        < CAST(0.2 * 4294967296 AS BIGINT)
      |  UNION ALL
      |  SELECT doc_id, 'strat' FROM documents
      |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |        < CASE lang WHEN 'en' THEN CAST(0.5 * 4294967296 AS BIGINT)
      |                    WHEN 'de' THEN CAST(0.1 * 4294967296 AS BIGINT)
      |                    ELSE -1 END) t
      |ORDER BY sample, doc_id""".stripMargin

  /** Exact-n global deterministic sample: exactly 100 documents by
    * smallest content hash (ties toward the smaller id) — reproducible
    * under any partitioning; the oracle replays the identical hash
    * ordering and cut.
    */
  def sampleFixedNQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.fixedSizeSampleGlobal(
        T(s, dir, "documents"), col("doc_id"), n = 100)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  val sampleFixedNOracle: String =
    """SELECT doc_id FROM (
      |  SELECT doc_id FROM documents
      |  ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id
      |  LIMIT 100) t
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- splits

  private val SplitWeights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Deterministic train/val/test split: every document lands in exactly one
    * split by its 32-bit content hash against cumulative weight cuts —
    * stable across runs/partitionings/engines, map-only at any scale.
    */
  def splitByHashQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.splitByHash(
        T(s, dir, "documents"), col("doc_id"), SplitWeights)
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  /** The split oracles recompute the cut points with the SAME Scala double
    * fold as Sampling.splitByHash (0.8+0.1+0.1 != 1.0 in doubles —
    * embedding the exact longs keeps boundary hashes on the same side in
    * both engines). ONE builder serves both split oracles so the
    * precision-sensitive cut arithmetic cannot drift between them.
    */
  private def hashCutCaseSql(keyExpr: String): String = {
    val total = SplitWeights.map(_._2).sum
    val cuts = SplitWeights.dropRight(1)
      .scanLeft(("", 0.0)) { case ((_, acc), (name, w)) => (name, acc + w) }
      .drop(1)
      .map { case (name, acc) => (name, (acc / total * 4294967296.0).toLong) }
    val cases = cuts.map { case (name, cut) =>
      s"WHEN ('0x' || substring(md5(CAST($keyExpr AS VARCHAR)), 1, 8))::BIGINT < $cut THEN '$name'"
    }.mkString("\n       ")
    s"""CASE $cases
       |       ELSE '${SplitWeights.last._1}' END""".stripMargin
  }

  val splitByHashOracle: String =
    s"""SELECT doc_id,
       |  ${hashCutCaseSql("doc_id")} AS split
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** Split-leakage audit ([[graft.operators.Diagnostics.splitLeakReport]])
    * over the hash split: exact-duplicate fingerprints crossing split
    * boundaries — the per-doc hash split leaks by construction wherever
    * the corpus carries duplicate texts, which is exactly what the gate
    * sees here (the cluster-keyed `split_leakfree` would report zeros).
    * The oracle replays the split cuts (shared [[hashCutCaseSql]]), the
    * 60-bit fingerprint, and the per-fp cross counts.
    */
  def splitLeakQ(s: SparkSession, dir: String): DataFrame = {
    // the synthetic corpus has no exact duplicates, so the fixture plants
    // them: every 7th doc re-enters under a fresh id — the hash split
    // assigns the copy independently, and some copies land across the
    // boundary, which is the leak this audit exists to surface
    val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
    val d = graft.operators.Sampling.splitByHash(
      corpus, col("doc_id"), SplitWeights)
    graft.operators.Diagnostics.splitLeakReport(d, col("split"),
        col("text"))
      .orderBy(col("split_a"), col("split_b"))
  }

  val splitLeakOracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000000, text FROM documents
       |  WHERE doc_id % 7 = 0),
       |d AS (
       |  SELECT ${hashCutCaseSql("doc_id")} AS split,
       |    ('0x' || substring(md5(text), 1, 15))::BIGINT AS fp
       |  FROM docs),
       |c AS (SELECT fp, split, CAST(COUNT(*) AS BIGINT) AS n
       |      FROM d GROUP BY 1, 2)
       |SELECT a.split AS split_a, b.split AS split_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared_fps,
       |  CAST(SUM(a.n * b.n) AS BIGINT) AS n_cross_pairs
       |FROM c a JOIN c b ON a.fp = b.fp AND a.split < b.split
       |GROUP BY 1, 2
       |ORDER BY split_a, split_b""".stripMargin

  // ------------------------------------------------------- shuffle & mixture

  /** Deterministic training-epoch shuffle: every doc dealt to one of 16
    * shards with an in-shard position, both pure functions of
    * (doc_id, epoch) — see [[graft.operators.Sampling.epochShuffle]]. The
    * oracle replays the identical seeded hash, modulus, and
    * ROW_NUMBER-over-shard.
    */
  def epochShuffleQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.epochShuffle(
        T(s, dir, "documents").select(col("doc_id")),
        col("doc_id"), numShards = 16, epoch = 3)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))

  val epochShuffleOracle: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':3'), 1, 8))::BIGINT AS h
      |  FROM documents)
      |SELECT doc_id, CAST(h % 16 AS INTEGER) AS shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS INTEGER) AS pos
      |FROM h
      |ORDER BY shard, pos""".stripMargin

  /** Mixture weights for [[mixtureSampleQ]] — en capped hardest despite
    * being the largest domain, de upweighted past its size (threshold
    * saturates: keep all), es absent (dropped). Shared with the oracle
    * builder so the two can't drift.
    */
  private val MixtureWeights: Seq[(String, Long)] =
    Seq("en" -> 4L, "de" -> 3L, "fr" -> 2L, "zh" -> 1L)

  /** Domain-mixture rebalancing to a token budget (half the corpus's
    * tokens, split by [[MixtureWeights]]) — see
    * [[graft.operators.Sampling.mixtureSampleByTokens]]. Thresholds are
    * exact integer arithmetic on both sides (BigInt in Scala, HUGEINT in
    * DuckDB), so the oracle recomputes them from the raw table rather
    * than embedding constants.
    */
  def mixtureSampleQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.mixtureSampleByTokens(
        T(s, dir, "documents"), col("lang"), col("doc_id"), col("text"),
        MixtureWeights.toMap, budgetNum = 1, budgetDen = 2)
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokenCountWs(col("text")).cast("long").as("n_tok"))
      .orderBy(col("doc_id"))

  val mixtureSampleOracle: String = {
    val sw = MixtureWeights.map(_._2).sum
    val wCase = MixtureWeights.map { case (d, w) =>
      s"WHEN '$d' THEN CAST($w AS HUGEINT)"
    }.mkString(" ")
    s"""WITH tok AS (
       |  SELECT lang,
       |    SUM(CAST(CASE WHEN trim(text) = '' THEN 0
       |        ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)) AS t
       |  FROM documents GROUP BY lang
       |), tot AS (
       |  SELECT (CAST(SUM(t) AS HUGEINT) * 1) // 2 AS budget FROM tok
       |), thr AS (
       |  SELECT lang,
       |    LEAST(CAST(4294967296 AS HUGEINT),
       |      (CAST(4294967296 AS HUGEINT) * (SELECT budget FROM tot)
       |        * (CASE lang $wCase END))
       |      // (CAST($sw AS HUGEINT) * CAST(t AS HUGEINT))) AS thr
       |  FROM tok WHERE lang IN (${MixtureWeights.map("'" + _._1 + "'").mkString(", ")})
       |)
       |SELECT d.doc_id, d.lang,
       |  CAST(CASE WHEN trim(d.text) = '' THEN 0
       |       ELSE len(string_split_regex(trim(d.text), '\\s+')) END AS BIGINT) AS n_tok
       |FROM documents d JOIN thr ON d.lang = thr.lang
       |WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
       |      < CAST(thr.thr AS BIGINT)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- hll sketches

  /** Distinct counting with mergeable HLL sketches (DataSketches): per-group
    * sketch + estimate, and a global row from hll_union_agg over the SAME
    * per-group sketches — the 100 TB pattern, where sketches are built once,
    * stored, and re-merged for any rollup without touching raw data (a
    * COUNT(DISTINCT) rollup would need a second full shuffle of raw keys;
    * the union shuffles one ~KB sketch per group).
    *
    * Oracle-able because DataSketches HLL is EXACT below the coupon-set
    * promotion threshold: measured with lgConfigK=16, estimates match
    * COUNT(DISTINCT) bit-for-bit through ~4000 distinct keys (default
    * lgK=12 already deviates by ~500), and supplier cardinalities stay
    * under 1000 at every test SF. SketchSpec pins this regime.
    */
  def hllCardinality(s: SparkSession, dir: String): DataFrame = {
    val sup = T(s, dir, "supplier")
      .join(T(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
    val sketches = sup.groupBy(col("n_name"))
      .agg(hll_sketch_agg(col("s_suppkey"), 16).as("sk"))
    val perNation = sketches
      .select(col("n_name"), hll_sketch_estimate(col("sk")).as("n_supp"))
    val global = sketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_supp"))
      .select(lit("*ALL*").as("n_name"), col("n_supp"))
    perNation.unionAll(global).orderBy(col("n_name"))
  }

  val hllCardinalityOracle: String =
    """SELECT n_name, CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_supp
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |UNION ALL
      |SELECT '*ALL*' AS n_name, CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_supp
      |FROM supplier
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- heavy hitters

  /** Frequent items over a token-derived term (first character): the
    * Misra-Gries summary shuffles O(capacity) state per partition instead of
    * one row per distinct term. capacity=128 exceeds the ASCII first-char
    * domain, so the summary is exact and the oracle is a plain GROUP BY.
    */
  def heavyHittersQ(s: SparkSession, dir: String): DataFrame = {
    val terms = T(s, dir, "documents")
      .select(explode(TextFunctions.tokensWs(col("text"))).as("tok"))
      .select(substring(col("tok"), 1, 1).as("term"))
    terms
      .agg(graft.functions.HeavyHitters.heavyHitters(128)(col("term")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term").as("term"), col("e.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
  }

  val heavyHittersOracle: String =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
      |SELECT substring(tok, 1, 1) AS term, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM toks
      |GROUP BY 1
      |ORDER BY cnt DESC, term""".stripMargin

  /** Duplicate-cluster assignment: connected components over the verified
    * MinHash near-dup pairs; oracle recomputes components with a recursive
    * CTE (component = min reachable id).
    */
  def dedupComponents(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.components(
        graft.operators.Dedup.minHashPairs(
          T(s, dir, "documents"), col("doc_id"), col("text"),
          shingleK = 3, numHashes = 128, bands = 16, threshold = 0.8))
      .orderBy(col("id"))

  val dedupComponentsOracle: String =
    s"""WITH RECURSIVE $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sets sa ON sa.doc_id = id_a
       |  JOIN sets sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) >= 0.8),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT reach.id, e.d FROM reach JOIN edges e ON e.s = reach.r)
       |SELECT id, MIN(r) AS component
       |FROM reach
       |GROUP BY id
       |ORDER BY id""".stripMargin

  /** Near-dup cluster size histogram — the dedup effectiveness report:
    * how many duplicate clusters of each size exist and how many docs
    * they hold (singletons — docs with no near-dup — are absent by
    * construction; corpus total minus n_docs gives them). Reuses the
    * pair/component machinery, so the report costs one extra tiny
    * aggregation over (id, component).
    */
  def dupClusterSizes(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.components(
        graft.operators.Dedup.minHashPairs(
          T(s, dir, "documents"), col("doc_id"), col("text"),
          shingleK = 3, numHashes = 128, bands = 16, threshold = 0.8))
      .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy(col("cluster_size"))

  val dupClusterSizesOracle: String =
    s"""WITH RECURSIVE $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sets sa ON sa.doc_id = id_a
       |  JOIN sets sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) >= 0.8),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT reach.id, e.d FROM reach JOIN edges e ON e.s = reach.r),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |          FROM comp GROUP BY component)
       |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
       |FROM sizes GROUP BY cluster_size
       |ORDER BY cluster_size""".stripMargin

  /** Soft dedup: every doc keeps weight 1/|its near-dup cluster| (1.0 for
    * singletons) — the downweight-instead-of-drop alternative (each
    * duplicated CONTENT contributes total mass 1 to training, but all
    * copies stay available). Exact integer-ratio doubles over the same
    * component machinery.
    */
  def dedupWeights(s: SparkSession, dir: String): DataFrame = {
    val comp = graft.operators.Dedup.components(
      graft.operators.Dedup.minHashPairs(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        shingleK = 3, numHashes = 128, bands = 16, threshold = 0.8))
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("sz"))
    val docWeights = comp.join(sizes, Seq("component"))
      .select(col("id").as("doc_id"),
        (lit(1.0) / col("sz").cast("double")).as("weight"))
    T(s, dir, "documents").select(col("doc_id"))
      .join(docWeights, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("weight"), lit(1.0)).as("weight"))
      .orderBy(col("doc_id"))
  }

  /** LEAKAGE-FREE train/val/test split: the split key is the near-dup
    * CLUSTER id (component min-id; singletons key on their own id), so
    * near-duplicate documents can never straddle a split boundary — the
    * contamination channel a per-document hash split leaves open (a test
    * document's near-copy in train is memorized, not generalized). Same
    * deterministic hash-cut machinery as [[splitByHashQ]], keyed one
    * level up.
    */
  def splitLeakFreeQ(s: SparkSession, dir: String): DataFrame = {
    val comp = graft.operators.Dedup.components(
      graft.operators.Dedup.minHashPairs(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        shingleK = 3, numHashes = 128, bands = 16, threshold = 0.8))
    graft.operators.Sampling.splitByCluster(
        T(s, dir, "documents"), col("doc_id"), comp, SplitWeights)
      .select(col("id").as("doc_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  val splitLeakFreeOracle: String = {
    s"""WITH RECURSIVE $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sets sa ON sa.doc_id = id_a
       |  JOIN sets sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) >= 0.8),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT reach.id, e.d FROM reach JOIN edges e ON e.s = reach.r),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |keyed AS (
       |  SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS ck
       |  FROM documents d LEFT JOIN comp ON comp.id = d.doc_id)
       |SELECT doc_id,
       |  ${hashCutCaseSql("ck")} AS split
       |FROM keyed
       |ORDER BY doc_id""".stripMargin
  }

  val dedupWeightsOracle: String =
    s"""WITH RECURSIVE $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sets sa ON sa.doc_id = id_a
       |  JOIN sets sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) >= 0.8),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT reach.id, e.d FROM reach JOIN edges e ON e.s = reach.r),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |sizes AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
       |SELECT d.doc_id,
       |  COALESCE(CAST(1.0 AS DOUBLE) / CAST(sz AS DOUBLE), CAST(1.0 AS DOUBLE)) AS weight
       |FROM documents d
       |LEFT JOIN comp ON comp.id = d.doc_id
       |LEFT JOIN sizes ON sizes.component = comp.component
       |ORDER BY d.doc_id""".stripMargin

  /** Priority-based cluster collapse: near-dup components (as
    * `dedup_components`), keeping per component the member with the most
    * characters (tie → smaller doc_id) — the curation move that keeps the
    * best copy instead of the smallest id. Output: surviving doc_ids.
    */
  def dedupCollapse(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    graft.operators.Dedup.collapseByPriority(
        docs, col("doc_id"),
        graft.operators.Dedup.minHashPairs(docs, col("doc_id"), col("text"),
          shingleK = 3, numHashes = 128, bands = 16, threshold = 0.8),
        col("n_chars"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val dedupCollapseOracle: String =
    s"""WITH RECURSIVE $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sets sa ON sa.doc_id = id_a
       |  JOIN sets sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) >= 0.8),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT reach.id, e.d FROM reach JOIN edges e ON e.s = reach.r),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |ranked AS (
       |  SELECT c.id, ROW_NUMBER() OVER (PARTITION BY c.component
       |    ORDER BY d.n_chars DESC, c.id) AS rk
       |  FROM comp c JOIN documents d ON d.doc_id = c.id)
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rk > 1)
       |ORDER BY doc_id""".stripMargin

  /** Sliding-window chunking (64-token windows, stride 32): every chunk
    * fingerprinted, short docs collapse to one whole-text chunk. The oracle
    * recomputes the identical slicing with DuckDB list ranges.
    */
  def docChunks(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.chunks(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        window = 64, stride = 32)
      .select(col("id").as("doc_id"), col("chunk_id"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val docChunksOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      |n AS (SELECT doc_id, toks, len(toks) AS nt FROM t),
      |idx AS (
      |  SELECT doc_id, toks, unnest(range(0,
      |    CASE WHEN nt <= 64 THEN 1
      |         ELSE CAST(ceil((nt - 64)::DOUBLE / 32) AS BIGINT) + 1 END)) AS cid
      |  FROM n)
      |SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
      |  md5(array_to_string(toks[(cid*32+1):(cid*32+64)], ' ')) AS chunk_md5
      |FROM idx
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** Content-defined chunking (3-gram boundary hash, maskBits = 6 →
    * ~64-token expected chunks): boundaries are functions of local
    * content, so chunk-level dedup on `chunk_fp` survives token
    * insertions that would shift every fixed-stride window. The oracle
    * replays the boundary rule with the same md5-prefix modulus over
    * DuckDB list ranges.
    */
  def cdcChunksQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.cdcChunks(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        shingleK = 3, maskBits = 6)
      .select(col("id").as("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tok"), col("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  val cdcChunksOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE string_split_regex(trim(text), '\s+') END AS w
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, w,
      |    [1] || coalesce(list_filter(range(2, greatest(len(w) - 3 + 2, 2)),
      |      i -> ('0x' || substring(md5(array_to_string(w[i:i+2], ' ')), 1, 8))::BIGINT % 64 = 0),
      |      []) AS starts
      |  FROM t),
      |sp AS (
      |  SELECT doc_id, w,
      |    unnest(list_transform(range(1, len(starts) + 1), j -> struct_pack(
      |      idx := j,
      |      s := starts[j],
      |      e := coalesce(starts[j + 1], len(w) + 1))), recursive := true)
      |  FROM b)
      |SELECT doc_id, CAST(idx AS INTEGER) AS chunk_idx,
      |  CAST(s AS INTEGER) AS start_tok, CAST(e - s AS INTEGER) AS n_tok,
      |  ('0x' || substring(md5(array_to_string(w[s:e-1], ' ')), 1, 15))::BIGINT AS chunk_fp
      |FROM sp
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** PII redaction battery: plant a deterministic email + IPv4 + phone per
    * document, redact, and fingerprint the cleaned text. Patterns stay in
    * the RE2-compatible subset so DuckDB reproduces them byte-for-byte.
    */
  def textRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com from 10.0."),
      pmod(col("doc_id"), lit(256)).cast("string"), lit(".7 tel 5551234567 end"))
    T(s, dir, "documents")
      .select(col("doc_id"), md5(TextFunctions.redactPii(planted)).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val textRedactOracle: String =
    """SELECT doc_id,
      |  md5(regexp_replace(regexp_replace(regexp_replace(
      |    text || ' contact user' || doc_id || '@example.com from 10.0.' ||
      |      (doc_id % 256) || '.7 tel 5551234567 end',
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
      |    '\b\d{7,15}\b', '<NUM>', 'g')) AS clean_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Repetition quality signals (duplicate-segment fraction, top-segment
    * share) over '.'-separated segments — the Gopher/C4-style repetition
    * filters as exact integer-ratio doubles.
    */
  def qualityRepetition(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.repetitionStats(
        T(s, dir, "documents"), col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  val qualityRepetitionOracle: String =
    """WITH segs AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\. ')) AS seg FROM documents),
      |c AS (SELECT doc_id, seg, COUNT(*) AS n FROM segs GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(SUM(n) AS BIGINT) AS n_seg,
      |  CAST(COUNT(*) AS BIGINT) AS n_uniq,
      |  CAST(SUM(n) - COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_frac,
      |  CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_frac
      |FROM c GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Decontamination: documents containing >= 60% of a "benchmark" needle's
    * 3-shingles (needles = the first 100 doc_ids). Containment is asymmetric
    * — needle shingles found / needle shingles — so a needle quoted inside a
    * longer doc still scores high where Jaccard would dilute.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = T(s, dir, "documents")
    graft.operators.Dedup.containmentPairs(
        d.filter(col("doc_id") < 100), col("doc_id"), col("text"),
        d, col("doc_id"), col("text"),
        shingleK = 3, threshold = 0.6)
      .filter(col("needle_id") =!= col("doc_id"))
      .orderBy(col("needle_id"), col("doc_id"))
  }

  val decontaminateOracle: String =
    s"""WITH $shingleSetsSql,
       |np AS (
       |  SELECT doc_id AS needle_id, len(s) AS nsz, unnest(s) AS sp
       |  FROM sets WHERE doc_id < 100),
       |cp AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |inter AS (
       |  SELECT needle_id, doc_id, nsz, COUNT(*) AS i
       |  FROM np JOIN cp USING (sp)
       |  WHERE needle_id <> doc_id
       |  GROUP BY 1, 2, 3)
       |SELECT needle_id, doc_id, CAST(i AS DOUBLE) / CAST(nsz AS DOUBLE) AS containment
       |FROM inter
       |WHERE CAST(i AS DOUBLE) / CAST(nsz AS DOUBLE) >= 0.6
       |ORDER BY needle_id, doc_id""".stripMargin

  /** Bloom-prefiltered exact decontamination: drop every corpus document
    * whose text equals a "benchmark" needle (doc_id % 97 == 0). The bloom
    * probe is map-only and codegen'd; only the |corpus|·fpp maybe-fraction
    * reaches the exact anti-join, which is what makes the shape hold when
    * the corpus is 100 TB and the needle set is an eval suite.
    */
  def decontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val d = T(s, dir, "documents")
    val needles = d.filter(col("doc_id") % 97 === 0).select(col("text"))
    graft.operators.Dedup.bloomAntiJoin(d, col("text"), needles, col("text"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val decontaminateBloomOracle: String =
    """SELECT d.doc_id FROM documents d
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM documents n
      |  WHERE n.doc_id % 97 = 0 AND n.text = d.text)
      |ORDER BY d.doc_id""".stripMargin

  /** Deterministic fixed-size class-balanced sample: 20 docs per language by
    * md5 rank of doc_id — exact per-class counts (fractions can't give
    * that), reproducible in SQL.
    */
  def samplePerClass(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.fixedSizeSample(
        T(s, dir, "documents"), col("lang"), col("doc_id"), n = 20)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))

  val samplePerClassOracle: String =
    """WITH ranked AS (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
      |               doc_id) AS rk
      |  FROM documents)
      |SELECT lang, doc_id FROM ranked WHERE rk <= 20
      |ORDER BY lang, doc_id""".stripMargin

  /** tf-idf-style relevance ranking: top-3 terms per doc by tf · (N/df) —
    * one IEEE division + multiply over exact integers, bit-identical in any
    * engine (ln damping deliberately left to the consumer).
    */
  def topRelevantTerms(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.relevantTerms(
        T(s, dir, "documents"), col("doc_id"), col("text"), k = 3, minLen = 4)
      .orderBy(col("doc_id"), col("rank"))

  val topRelevantTermsOracle: String =
    """WITH posting AS (
      |  SELECT doc_id, t AS term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
      |        FROM documents)
      |  WHERE length(t) >= 4
      |  GROUP BY 1, 2),
      |d AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM documents),
      |r AS (
      |  SELECT p.doc_id, p.term, p.tf, d.df,
      |    CAST(p.tf AS DOUBLE) * (CAST(nn.n AS DOUBLE) / CAST(d.df AS DOUBLE)) AS relevance,
      |    ROW_NUMBER() OVER (PARTITION BY p.doc_id
      |      ORDER BY CAST(p.tf AS DOUBLE) * (CAST(nn.n AS DOUBLE) / CAST(d.df AS DOUBLE)) DESC,
      |               p.term) AS rank
      |  FROM posting p JOIN d USING (term) CROSS JOIN nn)
      |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, df, relevance
      |FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** BM25 ranked retrieval: a deterministic query workload derived from the
    * corpus itself (every doc_id % 101 == 0 contributes its 4
    * alphabetically-first distinct terms of length >= 4 as one query),
    * scored with [[graft.operators.TextIndex.bm25TopK]] (k1 = 1.2,
    * b = 0.75, ln-free RSJ idf), top-5 docs per query. The oracle rebuilds
    * the same inverted index, sums per-term contributions in the same 2^20
    * fixed point (order-free exact integer addition — a float SUM's order
    * is engine-chosen), and ranks with the same (score desc, doc_id)
    * tie-break. The query workload is bounded below [[graft.Stress.IdStride]]
    * (replica 0 only — a no-op at the oracle SFs) so the stress harness
    * measures a FIXED query set against a growing corpus, matching the
    * operator's small-broadcast queryTerms contract; an unbounded corpus-
    * derived workload grows with replication and reads as harness-quadratic
    * (the [[simHashedLsh]] precedent).
    */
  def bm25Topk(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val qt = docs.filter(col("doc_id") % 101 === 0 &&
        col("doc_id") < graft.Stress.IdStride)
      .select(col("doc_id").as("qid"),
        explode(slice(array_sort(array_distinct(
          filter(graft.functions.TextFunctions.tokensWs(col("text")),
            t => length(t) >= 4))), 1, 4)).as("term"))
    graft.operators.TextIndex.bm25TopK(docs, col("doc_id"), col("text"),
        qt, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  val bm25TopkOracle: String = {
    val k1 = 1.2
    val b = 0.75
    val k1p1 = k1 + 1.0
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM documents WHERE trim(text) <> ''),
       |p AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
       |dl AS (SELECT doc_id, SUM(tf) AS dl FROM p GROUP BY 1),
       |st AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
       |              (SELECT SUM(tf) FROM p) AS tot),
       |qt AS (
       |  SELECT qid, unnest(terms4) AS term FROM (
       |    SELECT doc_id AS qid,
       |      list_sort(list_distinct(list_filter(
       |        string_split_regex(trim(text), '\\s+'),
       |        t -> length(t) >= 4)))[1:4] AS terms4
       |    FROM documents
       |    WHERE doc_id % 101 = 0 AND doc_id < ${graft.Stress.IdStride}
       |      AND trim(text) <> '')),
       |dfq AS (
       |  SELECT term, COUNT(*) AS df FROM p
       |  WHERE term IN (SELECT term FROM qt) GROUP BY 1),
       |cand AS (
       |  SELECT q.qid, p.doc_id, p.term,
       |    ((CAST(st.n AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
       |      / (CAST(dfq.df AS DOUBLE) + 0.5))
       |    * ((CAST(p.tf AS DOUBLE) * CAST('$k1p1' AS DOUBLE))
       |      / (CAST(p.tf AS DOUBLE) + CAST('$k1' AS DOUBLE)
       |        * (1.0 - CAST('$b' AS DOUBLE) + CAST('$b' AS DOUBLE)
       |        * (CAST(dl.dl AS DOUBLE)
       |          / (CAST(st.tot AS DOUBLE) / CAST(st.n AS DOUBLE)))))) AS cw
       |  FROM qt q JOIN p ON p.term = q.term
       |  JOIN dfq ON dfq.term = p.term
       |  JOIN dl ON dl.doc_id = p.doc_id
       |  CROSS JOIN st),
       |sc AS (
       |  SELECT qid, doc_id,
       |    CAST(SUM(CAST(round(cw * 1048576.0) AS BIGINT)) AS DOUBLE)
       |      / 1048576.0 AS score
       |  FROM cand GROUP BY 1, 2),
       |r AS (
       |  SELECT qid, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY score DESC, doc_id) AS rank
       |  FROM sc)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id, score
       |FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  /** Collocation mining ([[graft.operators.TextIndex.phraseMining]]):
    * top-50 adjacent word pairs by ln-free PMI lift
    * `c(ab)·N / (c(a)·c(b))`, pair count floored at 5. Exact integer
    * counts, one fixed-order double chain; the oracle replays the
    * adjacent-pair zip, both count joins, and the (lift desc, w1, w2)
    * take-ordered.
    */
  def phraseMiningQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.phraseMining(
      T(s, dir, "documents"), col("text"), k = 50, minCount = 5L)

  val phraseMiningOracle: String =
    """WITH t AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents WHERE trim(text) <> ''),
      |uni AS (
      |  SELECT w, COUNT(*) AS c
      |  FROM (SELECT unnest(ts) AS w FROM t) GROUP BY 1),
      |nn AS (SELECT SUM(c) AS n FROM uni),
      |idx AS (SELECT ts, unnest(range(1, len(ts))) AS j FROM t),
      |pc AS (
      |  SELECT ts[j] AS w1, ts[j+1] AS w2, COUNT(*) AS n_pair
      |  FROM idx GROUP BY 1, 2 HAVING COUNT(*) >= 5)
      |SELECT pc.w1, pc.w2, pc.n_pair, u1.c AS n_w1, u2.c AS n_w2,
      |  (CAST(pc.n_pair AS DOUBLE) * CAST(nn.n AS DOUBLE))
      |    / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
      |FROM pc
      |JOIN uni u1 ON u1.w = pc.w1
      |JOIN uni u2 ON u2.w = pc.w2
      |CROSS JOIN nn
      |ORDER BY lift DESC, pc.w1, pc.w2
      |LIMIT 50""".stripMargin

  /** Hybrid retrieval ([[graft.operators.TextIndex.rrfFuse]]): the
    * standard RAG-stack combination — BM25 over the text (lexical) and
    * brute-force cosine over the aligned embeddings (dense), each top-20
    * per query, fused with reciprocal-rank fusion (c = 60) to a top-10.
    * Query set fixed below the replica stride (doc_id % 149 — the sim
    * probe pattern), so stress measures per-query cost against the
    * growing corpus. Queries are corpus documents, so BOTH sides
    * exclude the self-hit (the dense searcher by default; the lexical
    * side retrieves k+1 and drops qid = doc_id before re-ranking — the
    * query's own doc would otherwise burn a fused slot at the maximum
    * possible RRF contribution in every query). The oracle replays BOTH
    * retrieval pipelines rank for rank and the fixed-order RRF chain.
    */
  def hybridRetrievalQ(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val emb = T(s, dir, "embeddings")
    val stride = graft.Stress.IdStride
    val qt = docs.filter(col("doc_id") % 149 === 0 && col("doc_id") < stride)
      .select(col("doc_id").as("qid"),
        explode(slice(array_sort(array_distinct(
          filter(graft.functions.TextFunctions.tokensWs(col("text")),
            t => length(t) >= 4))), 1, 4)).as("term"))
    // k+1, drop self, re-rank by the original order: the top-20 non-self
    // docs of the full ranking are always inside the top-21 overall
    val lexW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rank"))
    val lex = graft.operators.TextIndex.bm25TopK(
        docs, col("doc_id"), col("text"), qt, k = 21)
      .filter(col("qid") =!= col("doc_id"))
      .withColumn("rank", row_number().over(lexW))
      .filter(col("rank") <= 20)
      .select(col("qid"), col("doc_id"), col("rank"))
    val dense = graft.operators.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") % 149 === 0 && col("vec_id") < stride),
        emb, k = 20)
      .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
        col("rank"))
    graft.operators.TextIndex.rrfFuse(Seq(lex, dense), k = 10)
      .orderBy(col("qid"), col("rank"))
  }

  val hybridRetrievalOracle: String = {
    val k1 = 1.2
    val b = 0.75
    val k1p1 = k1 + 1.0
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM documents WHERE trim(text) <> ''),
       |p AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
       |dl AS (SELECT doc_id, SUM(tf) AS dl FROM p GROUP BY 1),
       |st AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
       |              (SELECT SUM(tf) FROM p) AS tot),
       |qt AS (
       |  SELECT qid, unnest(terms4) AS term FROM (
       |    SELECT doc_id AS qid,
       |      list_sort(list_distinct(list_filter(
       |        string_split_regex(trim(text), '\\s+'),
       |        t -> length(t) >= 4)))[1:4] AS terms4
       |    FROM documents
       |    WHERE doc_id % 149 = 0 AND doc_id < ${graft.Stress.IdStride}
       |      AND trim(text) <> '')),
       |dfq AS (
       |  SELECT term, COUNT(*) AS df FROM p
       |  WHERE term IN (SELECT term FROM qt) GROUP BY 1),
       |cand AS (
       |  SELECT q.qid, p.doc_id, p.term,
       |    ((CAST(st.n AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
       |      / (CAST(dfq.df AS DOUBLE) + 0.5))
       |    * ((CAST(p.tf AS DOUBLE) * CAST('$k1p1' AS DOUBLE))
       |      / (CAST(p.tf AS DOUBLE) + CAST('$k1' AS DOUBLE)
       |        * (1.0 - CAST('$b' AS DOUBLE) + CAST('$b' AS DOUBLE)
       |        * (CAST(dl.dl AS DOUBLE)
       |          / (CAST(st.tot AS DOUBLE) / CAST(st.n AS DOUBLE)))))) AS cw
       |  FROM qt q JOIN p ON p.term = q.term
       |  JOIN dfq ON dfq.term = p.term
       |  JOIN dl ON dl.doc_id = p.doc_id
       |  CROSS JOIN st),
       |sc AS (
       |  SELECT qid, doc_id,
       |    CAST(SUM(CAST(round(cw * 1048576.0) AS BIGINT)) AS DOUBLE)
       |      / 1048576.0 AS score
       |  FROM cand GROUP BY 1, 2),
       |lex AS (
       |  SELECT qid, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY score DESC, doc_id) AS r
       |  FROM sc WHERE qid <> doc_id),
       |lex20 AS (SELECT qid, doc_id, r FROM lex WHERE r <= 20),
       |den0 AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS doc_id,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id % 149 = 0 AND q.vec_id < ${graft.Stress.IdStride}
       |    AND q.vec_id <> c.vec_id),
       |den AS (
       |  SELECT qid, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id) AS r
       |  FROM den0),
       |den20 AS (SELECT qid, doc_id, r FROM den WHERE r <= 20),
       |fused AS (
       |  SELECT COALESCE(l.qid, d.qid) AS qid,
       |    COALESCE(l.doc_id, d.doc_id) AS doc_id,
       |    COALESCE(1.0 / (60.0 + CAST(l.r AS DOUBLE)), 0.0)
       |    + COALESCE(1.0 / (60.0 + CAST(d.r AS DOUBLE)), 0.0) AS rrf
       |  FROM lex20 l FULL OUTER JOIN den20 d
       |    ON l.qid = d.qid AND l.doc_id = d.doc_id),
       |rk AS (
       |  SELECT qid, doc_id, rrf,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id)
       |      AS rank
       |  FROM fused)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id, rrf
       |FROM rk WHERE rank <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  /** DSIR importance selection over the pinned bucket weights
    * ([[PinnedArtifacts.DsirWeights64]]): per-doc log importance = ordered
    * fold of hashed-unigram bucket counts x pinned log-ratio weights, keep
    * the top-100 (score desc, doc_id). The ln lives in the trainer; query
    * arithmetic is exact-integer counts times identical literal doubles.
    */
  def dsirSample(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    graft.operators.Sampling.dsirTopN(docs, col("doc_id"), col("text"),
        PinnedArtifacts.DsirWeights64, n = 100)
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("doc_id"))
  }

  val dsirSampleOracle: String =
    s"""WITH wt(b, w) AS (VALUES
       |${PinnedArtifacts.dsirWeightsSqlValues}
       |),
       |tok AS (
       |  SELECT doc_id,
       |    ('0x' || substring(md5(term), 1, 8))::BIGINT % 64 AS b
       |  FROM (SELECT doc_id,
       |          unnest(string_split_regex(trim(text), '\\s+')) AS term
       |        FROM documents WHERE trim(text) <> '')),
       |bc AS (SELECT doc_id, b, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       |contrib AS (
       |  SELECT doc_id, bc.b, CAST(c AS DOUBLE) * wt.w AS cw
       |  FROM bc JOIN wt ON wt.b = bc.b),
       |sc AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(0.0, list(cw ORDER BY b)),
       |      (a, x) -> a + x) AS score
       |  FROM contrib GROUP BY 1),
       |alldocs AS (
       |  SELECT d.doc_id, COALESCE(sc.score, 0.0) AS score
       |  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id),
       |r AS (
       |  SELECT doc_id, score,
       |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
       |  FROM alldocs)
       |SELECT doc_id, score FROM r WHERE rk <= 100
       |ORDER BY doc_id""".stripMargin

  /** Winnowing fingerprints exploded to (doc_id, fp) rows — the oracle
    * recomputes the k-shingle hash sequence and per-window minima in SQL.
    */
  def winnowFps(s: SparkSession, dir: String): DataFrame = {
    // widen before the per-row fingerprint loop — see Dedup.widen's note on
    // why a declarative minPartitionNum can't do this for small files
    val target = s.sparkContext.defaultParallelism
    val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
    val widened = if (docs.rdd.getNumPartitions < target) docs.repartition(target) else docs
    widened
      .select(col("doc_id"),
        explode(graft.operators.Dedup.winnowFingerprints(col("text"), 3, 4)).as("fp"))
      .orderBy(col("doc_id"), col("fp"))
  }

  val winnowFpsOracle: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |         ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END AS shingles
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
      |), h AS (
      |  SELECT doc_id,
      |    list_transform(shingles, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT) AS hs
      |  FROM sh
      |), w AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
      |         ELSE list_transform(range(0, len(hs) - 3), i -> list_min(hs[i+1:i+4])) END
      |  ) AS fps
      |  FROM h)
      |SELECT doc_id, unnest(fps) AS fp
      |FROM w
      |ORDER BY doc_id, fp""".stripMargin

  // ------------------------------------------------------------- multimodal

  /** Multimodal plumbing end-to-end: text bytes stand in for media payloads
    * (binary column), the batched stub codec extracts typed metadata, and
    * deterministic frame sampling hashes the first "frame". The oracle
    * recomputes the md5-derived stub outputs — documents are ASCII, so char
    * offsets equal byte offsets.
    */
  def mmDecodeMeta(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    graft.operators.Multimodal.decodeMeta(docs, col("payload"))
      .withColumn("frames", graft.operators.Multimodal.sampleFrames(col("payload"), 4))
      .select(col("doc_id"),
        col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.n_frames").as("n_frames"),
        col("meta.n_bytes").as("n_bytes"),
        size(col("frames")).as("n_sampled"),
        md5(element_at(col("frames"), 1)).as("frame0_md5"))
      .orderBy(col("doc_id"))
  }

  val mmDecodeMetaOracle: String =
    """WITH h AS (
      |  SELECT doc_id, text,
      |    ('0x' || substring(md5(text), 1, 8))::BIGINT AS h32,
      |    strlen(text) AS nb,
      |    CAST(ceil(strlen(text) / 256.0) AS INTEGER) AS nf
      |  FROM documents)
      |SELECT doc_id,
      |  (['jpeg', 'png', 'webp'])[CAST(h32 % 3 AS INTEGER) + 1] AS format,
      |  CAST(64 + h32 % 512 AS INTEGER) AS width,
      |  CAST(64 + (h32 // 512) % 512 AS INTEGER) AS height,
      |  nf AS n_frames,
      |  CAST(nb AS INTEGER) AS n_bytes,
      |  CAST(len(list_distinct(list_transform(range(0, 4), i ->
      |    least(i * greatest(nf // 4, 1), nf - 1)))) AS INTEGER) AS n_sampled,
      |  md5(substring(text, 1, 256)) AS frame0_md5
      |FROM h
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- sequence packing

  /** Greedy token-budget sequence packing per source shard (budget 512):
    * deterministic pack assignment via one shuffle + partition-local
    * streaming pass. The oracle replays the same greedy walk with a
    * recursive CTE over per-source row numbers.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packGreedy(
        T(s, dir, "documents").select(col("source"), col("doc_id"),
          TextFunctions.tokenCountWs(col("text")).as("n_tok")),
        col("source"), col("doc_id"), col("n_tok"), budget = 512L)
      .select(col("group").as("source"), col("ord").as("doc_id"),
        col("size").as("n_tok"), col("pack_id"))
      .orderBy(col("source"), col("doc_id"))

  val packSequencesOracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id, n_tok, rn, CAST(1 AS BIGINT) AS pack_id,
      |    n_tok AS acc
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.source, t.doc_id, t.n_tok, t.rn,
      |    CASE WHEN r.acc + t.n_tok > 512 THEN r.pack_id + 1 ELSE r.pack_id END,
      |    CASE WHEN r.acc + t.n_tok > 512 THEN t.n_tok ELSE r.acc + t.n_tok END
      |  FROM r JOIN t ON t.source = r.source AND t.rn = r.rn + 1)
      |SELECT source, doc_id, n_tok, pack_id
      |FROM r
      |ORDER BY source, doc_id""".stripMargin

  /** Packing efficiency report per source shard: packs produced, sequences
    * and token mass packed, and the fill ratio against the ideal
    * (tokens / (packs × budget)) — the number that says whether the greedy
    * budget is leaving GPU batch capacity on the table. Exact integer
    * counts + integer-ratio double.
    */
  def packingStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packGreedy(
        T(s, dir, "documents").select(col("source"), col("doc_id"),
          TextFunctions.tokenCountWs(col("text")).as("n_tok")),
        col("source"), col("doc_id"), col("n_tok"), budget = 512L)
      .groupBy(col("group").as("source"))
      .agg(max(col("pack_id")).as("n_packs"),
        count(lit(1)).as("n_seqs"),
        sum(col("size")).as("n_tokens"))
      .select(col("source"), col("n_packs"), col("n_seqs"), col("n_tokens"),
        (col("n_tokens").cast("double") /
          (col("n_packs") * lit(512L)).cast("double")).as("fill_ratio"))
      .orderBy(col("source"))

  val packingStatsOracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id, n_tok, rn, CAST(1 AS BIGINT) AS pack_id,
      |    n_tok AS acc
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.source, t.doc_id, t.n_tok, t.rn,
      |    CASE WHEN r.acc + t.n_tok > 512 THEN r.pack_id + 1 ELSE r.pack_id END,
      |    CASE WHEN r.acc + t.n_tok > 512 THEN t.n_tok ELSE r.acc + t.n_tok END
      |  FROM r JOIN t ON t.source = r.source AND t.rn = r.rn + 1)
      |SELECT source, CAST(MAX(pack_id) AS BIGINT) AS n_packs,
      |  CAST(COUNT(*) AS BIGINT) AS n_seqs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_tok) AS DOUBLE) / CAST(MAX(pack_id) * 512 AS DOUBLE) AS fill_ratio
      |FROM r
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --------------------------------------------------- cross-doc segment dedup

  /** C4-style cross-document segment dedup on 16-token segments, keeping
    * only globally-unique segments (maxDf = 1): exact-duplicate documents
    * share every aligned segment, so their content empties out; unique docs
    * survive untouched. Doc-level md5 keeps the compare compact.
    */
  /** Cross-document boilerplate removal over CONTENT-DEFINED chunks: a
    * duplicated passage chunks identically wherever it sits, so the df
    * count catches offset-shifted boilerplate that stride-aligned fixed
    * windows ([[segmentDedupQ]]) miss. Same df/broadcast/reassembly
    * shape; the oracle replays CDC boundaries + df + ordered
    * reassembly.
    */
  def cdcSegmentDedupQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.cdcSegmentDedup(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        shingleK = 3, maskBits = 6, maxDf = 1L)
      .select(col("id").as("doc_id"), col("n_seg"), col("n_kept"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  val cdcSegmentDedupOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE string_split_regex(trim(text), '\s+') END AS w
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, w,
      |    [1] || coalesce(list_filter(range(2, greatest(len(w) - 3 + 2, 2)),
      |      i -> ('0x' || substring(md5(array_to_string(w[i:i+2], ' ')), 1, 8))::BIGINT % 64 = 0),
      |      []) AS starts
      |  FROM t),
      |seg AS (
      |  SELECT doc_id, idx AS cid,
      |    array_to_string(w[s:e-1], ' ') AS seg
      |  FROM (
      |    SELECT doc_id, w,
      |      unnest(list_transform(range(1, len(starts) + 1), j -> struct_pack(
      |        idx := j,
      |        s := starts[j],
      |        e := coalesce(starts[j + 1], len(w) + 1))), recursive := true)
      |    FROM b) x),
      |dfs AS (SELECT seg AS sv, COUNT(DISTINCT doc_id) AS df FROM seg GROUP BY seg)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_seg,
      |  CAST(SUM(CASE WHEN df <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  md5(COALESCE(string_agg(CASE WHEN df <= 1 THEN seg END, ' '
      |    ORDER BY cid), '')) AS clean_md5
      |FROM seg JOIN dfs ON seg.seg = dfs.sv
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  def segmentDedupQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.segmentDedup(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        window = 16, maxDf = 1L)
      .select(col("id").as("doc_id"), col("n_seg"), col("n_kept"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  val segmentDedupOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |n AS (SELECT doc_id, toks, len(toks) AS nt FROM t),
      |seg AS (
      |  SELECT doc_id, cid,
      |    array_to_string(toks[(cid*16+1):(cid*16+16)], ' ') AS seg
      |  FROM (SELECT doc_id, toks, unnest(range(0,
      |      CASE WHEN nt <= 16 THEN 1
      |           ELSE CAST(ceil((nt - 16)::DOUBLE / 16) AS BIGINT) + 1 END)) AS cid
      |    FROM n) x),
      |dfs AS (SELECT seg AS sv, COUNT(DISTINCT doc_id) AS df FROM seg GROUP BY seg)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_seg,
      |  CAST(SUM(CASE WHEN df <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  md5(COALESCE(string_agg(CASE WHEN df <= 1 THEN seg END, ' '
      |    ORDER BY cid), '')) AS clean_md5
      |FROM seg JOIN dfs ON seg.seg = dfs.sv
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------- corpus duplicate n-grams

  /** Unicode NFC normalization over the corpus, with a planted decomposed
    * accent so the oracle actually exercises composition (the synthetic
    * corpus is ASCII, where NFC is the identity).
    */
  def textNormalizeQ(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents").select(col("doc_id"),
        md5(org.apache.spark.sql.graft.TextStats.nfcNormalize(
          concat(col("text"), lit(" caf"), lit("e\u0301")))).as("norm_md5"))
      .orderBy(col("doc_id"))

  val textNormalizeOracle: String =
    """SELECT doc_id,
      |  md5(nfc_normalize(text || ' caf' || chr(101) || chr(769))) AS norm_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Corpus-duplicated 5-gram profile per document (Lee et al. 2022 shape):
    * integer counts + exact-ratio double, over the full documents table.
    */
  def dupNgramProfileQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.duplicateNgramProfile(
        T(s, dir, "documents"), col("doc_id"), col("text"), n = 5, minDf = 2)
      .select(col("id").as("doc_id"), col("total_ngrams"), col("dup_ngrams"),
        col("dup_ratio"))
      .orderBy(col("doc_id"))

  val dupNgramProfileOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
      |         ELSE list_transform(range(1, len(toks) - 3),
      |                i -> array_to_string(toks[i:i+4], ' ')) END AS grams
      |  FROM t),
      |posting AS (SELECT doc_id, unnest(grams) AS gram FROM g),
      |dfs AS (SELECT gram AS gv, COUNT(DISTINCT doc_id) AS df
      |        FROM posting GROUP BY gram)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS total_ngrams,
      |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_ngrams,
      |  CASE WHEN COUNT(*) > 0
      |       THEN SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)::DOUBLE
      |       ELSE 0.0 END AS dup_ratio
      |FROM posting JOIN dfs ON posting.gram = dfs.gv
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Corpus-duplicated 5-gram REMOVAL: tokens covered by any cross-document
    * duplicated 5-gram are dropped and the survivors rejoined. md5 keeps
    * the rebuilt text compact in the compare, as in [[segmentDedupQ]].
    */
  def dedupNgramMaskQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.duplicateNgramMask(
        T(s, dir, "documents"), col("doc_id"), col("text"), n = 5, minDf = 2)
      .select(col("id").as("doc_id"), col("n_tok"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  val dedupNgramMaskOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, toks,
      |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
      |         ELSE list_transform(range(1, len(toks) - 3),
      |                i -> array_to_string(toks[i:i+4], ' ')) END AS grams
      |  FROM t),
      |gp AS (SELECT doc_id, unnest(grams) AS gram,
      |         unnest(range(0, len(grams))) AS pos FROM g),
      |dfs AS (SELECT gram AS gv, COUNT(DISTINCT doc_id) AS df
      |        FROM gp GROUP BY gram),
      |dpos AS (SELECT gp.doc_id, list_sort(list(gp.pos)) AS dps
      |         FROM gp JOIN dfs ON gp.gram = dfs.gv
      |         WHERE dfs.df >= 2 GROUP BY gp.doc_id),
      |m AS (SELECT g.doc_id, g.toks, COALESCE(d.dps, CAST([] AS BIGINT[])) AS dps
      |      FROM g LEFT JOIN dpos d ON g.doc_id = d.doc_id)
      |SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tok,
      |  CAST(len(toks) - len(list_filter(toks, (x, i) ->
      |    len(list_filter(dps, s -> s <= i - 1 AND s + 4 >= i - 1)) = 0)) AS INTEGER) AS n_removed,
      |  md5(COALESCE(array_to_string(list_filter(toks, (x, i) ->
      |    len(list_filter(dps, s -> s <= i - 1 AND s + 4 >= i - 1)) = 0), ' '), '')) AS clean_md5
      |FROM m
      |ORDER BY doc_id""".stripMargin

  /** Exact-substring dedup at 50-token-span granularity
    * ([[graft.operators.TextIndex.exactSubstrDedup]] — ExactSubstr, Lee
    * et al. 2022): every corpus-duplicated 50-token span keeps only its
    * globally first (doc_id, pos) occurrence; all other occurrences'
    * tokens are removed. The synthetic corpus carries ~280 duplicated
    * 50-spans (589 occurrences) at the driver SFs without whole-doc
    * duplicates, so the keep-first surgery is value-checked non-trivially.
    * The oracle replays the positional 50-grams as STRINGS (the engine
    * keys on 60-bit fps — the accepted fp-collision stance), the
    * first-occurrence rank, and the coverage mask; md5 keeps the rebuilt
    * text compact in the compare, as in [[dedupNgramMaskQ]].
    */
  def dedupExactSubstrQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.exactSubstrDedup(
        T(s, dir, "documents"), col("doc_id"), col("text"), n = 50)
      .select(col("id").as("doc_id"), col("n_tok"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  val dedupExactSubstrOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, toks,
      |    CASE WHEN len(toks) >= 50
      |         THEN list_transform(range(1, len(toks) - 48),
      |                i -> array_to_string(toks[i:i+49], ' '))
      |         ELSE CAST([] AS VARCHAR[]) END AS grams
      |  FROM t),
      |o AS (SELECT doc_id, unnest(grams) AS gram,
      |        unnest(range(0, len(grams))) AS pos FROM g),
      |r AS (
      |  SELECT doc_id, pos,
      |    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
      |  FROM o),
      |dpos AS (SELECT doc_id, list_sort(list(pos)) AS dps
      |         FROM r WHERE rn > 1 GROUP BY doc_id),
      |m AS (SELECT g.doc_id, g.toks, COALESCE(d.dps, CAST([] AS BIGINT[])) AS dps
      |      FROM g LEFT JOIN dpos d ON g.doc_id = d.doc_id)
      |SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tok,
      |  CAST(len(toks) - len(list_filter(toks, (x, i) ->
      |    len(list_filter(dps, s -> s <= i - 1 AND s + 49 >= i - 1)) = 0)) AS INTEGER) AS n_removed,
      |  md5(COALESCE(array_to_string(list_filter(toks, (x, i) ->
      |    len(list_filter(dps, s -> s <= i - 1 AND s + 49 >= i - 1)) = 0), ' '), '')) AS clean_md5
      |FROM m
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- vocabulary coverage

  /** Perplexity-proxy LM screen
    * ([[graft.operators.TextIndex.lmPerplexityScreen]]): per-doc
    * bits-per-token under the corpus's own bigram model with leave-one-out
    * counts and one-bit unigram backoff — every log2 the exact integer
    * ⌊log2⌋ via `length(bin(x)) − 1`, so the oracle replays the whole
    * model bit-for-bit with no libm ln.
    */
  def lmPerplexityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.lmPerplexityScreen(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        // ~75th-pct of the synthetic corpus (band 4.35-5.09) so the flag
        // actually discriminates at the gate; real corpora use the
        // 12-bit library default
        thresholdBits = 4.7)
      .select(col("id").as("doc_id"), col("n_scored"), col("total_bits"),
        col("bits_per_token"), col("keep"))
      .orderBy(col("doc_id"))

  val lmPerplexityOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS t
      |  FROM documents),
      |uni AS (SELECT unnest(t) AS w FROM toks),
      |c1 AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM uni),
      |pos AS (
      |  SELECT doc_id, t[i] AS wp, t[i+1] AS wc, t[i] || ' ' || t[i+1] AS g2
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
      |        FROM toks WHERE len(t) >= 2)),
      |c2 AS (SELECT g2 AS k2, COUNT(*) AS c FROM pos GROUP BY g2),
      |bits AS (
      |  SELECT doc_id,
      |    CASE WHEN c2.c >= 2
      |      THEN (length(bin(p1.c)) - 1) - (length(bin(c2.c - 1)) - 1)
      |      ELSE 1 + (length(bin(tot.n_total)) - 1) - (length(bin(p2.c)) - 1)
      |    END AS b
      |  FROM pos
      |  JOIN c2 ON pos.g2 = c2.k2
      |  JOIN c1 p1 ON pos.wp = p1.w
      |  JOIN c1 p2 ON pos.wc = p2.w
      |  CROSS JOIN tot),
      |sc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
      |    CAST(SUM(b) AS BIGINT) AS total_bits
      |  FROM bits GROUP BY doc_id)
      |SELECT t.doc_id,
      |  COALESCE(sc.n_scored, 0) AS n_scored,
      |  COALESCE(sc.total_bits, 0) AS total_bits,
      |  CASE WHEN COALESCE(sc.n_scored, 0) = 0 THEN 0.0
      |       ELSE CAST(sc.total_bits AS DOUBLE) / CAST(sc.n_scored AS DOUBLE)
      |  END AS bits_per_token,
      |  (CASE WHEN COALESCE(sc.n_scored, 0) = 0 THEN 0.0
      |        ELSE CAST(sc.total_bits AS DOUBLE) / CAST(sc.n_scored AS DOUBLE)
      |   END) <= 4.7 AS keep
      |FROM toks t LEFT JOIN sc ON t.doc_id = sc.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Frozen-LM cross-corpus screen — the actual CCNet deployment shape
    * run end-to-end: the reference model is [[graft.operators.TextIndex
    * .bigramLmCounts]] over the even-id slice, maintained in TWO batch
    * folds ([[graft.operators.TextIndex.foldLmCounts]], fold ≡ rebuild —
    * LmModelSpec's law, exercised here under the hash gate), PERSISTED as
    * the frozen parquet artifact, RELOADED cold, and the odd-id slice is
    * screened against it with `selfCounts = false` — counts are external
    * evidence (no leave-one-out), an unseen bigram backs off, an OOV
    * token floors at the 1 + ⌊log2 N⌋ maximum. The oracle rebuilds the
    * model clean over the even slice and replays the frozen-branch
    * arithmetic, so the gate is green only if the fold, the artifact
    * round-trip, AND the frozen scoring are all exact.
    *
    * Scale shape: the model is a vocabulary-sized stored table — scoring
    * a new corpus is three key-joins of the (id + three 8-byte fps)
    * position stream against its partitions; the training corpus is
    * never re-read at serve time.
    */
  def lmCrossScreenQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextIndex
    val docs = T(s, dir, "documents")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val model = TextIndex.foldLmCounts(
      TextIndex.bigramLmCounts(ref.filter(col("doc_id") % 4 === 0),
        col("text")),
      TextIndex.bigramLmCounts(ref.filter(col("doc_id") % 4 === 2),
        col("text")))
    val path = Engine.scratchPath("graft-lm-model", dir)
    model.write.mode("overwrite").parquet(path)
    val frozen = s.read.parquet(path)
    TextIndex.lmScoreAgainst(
        docs.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
        frozen,
        // between the p50/p75 cross-corpus band at both driver SFs
        // (4.58-4.68) so the flag discriminates; real corpora use the
        // 12-bit library default
        thresholdBits = 4.65, selfCounts = false)
      .select(col("id").as("doc_id"), col("n_scored"), col("total_bits"),
        col("bits_per_token"), col("keep"))
      .orderBy(col("doc_id"))
  }

  val lmCrossScreenOracle: String =
    """WITH tr AS (
      |  SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS t
      |  FROM documents WHERE doc_id % 2 = 0),
      |uni AS (SELECT unnest(t) AS w FROM tr),
      |c1 AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM uni),
      |trpos AS (
      |  SELECT t[i] || ' ' || t[i+1] AS g2
      |  FROM (SELECT t, unnest(range(1, len(t))) AS i
      |        FROM tr WHERE len(t) >= 2)),
      |c2 AS (SELECT g2 AS k2, COUNT(*) AS c FROM trpos GROUP BY g2),
      |sd AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS t
      |  FROM documents WHERE doc_id % 2 = 1),
      |pos AS (
      |  SELECT doc_id, t[i] AS wp, t[i+1] AS wc, t[i] || ' ' || t[i+1] AS g2
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
      |        FROM sd WHERE len(t) >= 2)),
      |bits AS (
      |  SELECT pos.doc_id,
      |    CASE WHEN c2.c IS NOT NULL
      |      THEN (length(bin(p1.c)) - 1) - (length(bin(c2.c)) - 1)
      |      ELSE 1 + (length(bin(tot.n_total)) - 1)
      |             - (length(bin(COALESCE(p2.c, 1))) - 1)
      |    END AS b
      |  FROM pos
      |  LEFT JOIN c2 ON pos.g2 = c2.k2
      |  LEFT JOIN c1 p1 ON pos.wp = p1.w
      |  LEFT JOIN c1 p2 ON pos.wc = p2.w
      |  CROSS JOIN tot),
      |sc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
      |    CAST(SUM(b) AS BIGINT) AS total_bits
      |  FROM bits GROUP BY doc_id)
      |SELECT s.doc_id,
      |  COALESCE(sc.n_scored, 0) AS n_scored,
      |  COALESCE(sc.total_bits, 0) AS total_bits,
      |  CASE WHEN COALESCE(sc.n_scored, 0) = 0 THEN 0.0
      |       ELSE CAST(sc.total_bits AS DOUBLE) / CAST(sc.n_scored AS DOUBLE)
      |  END AS bits_per_token,
      |  (CASE WHEN COALESCE(sc.n_scored, 0) = 0 THEN 0.0
      |        ELSE CAST(sc.total_bits AS DOUBLE) / CAST(sc.n_scored AS DOUBLE)
      |   END) <= 4.65 AS keep
      |FROM sd s LEFT JOIN sc ON s.doc_id = sc.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** Keyword tagging ([[graft.operators.TextIndex.keywordTag]]): one
    * native Aho–Corasick pass over every document against a fixed phrase
    * list; the oracle replays each pattern's overlapping occurrence
    * count positionally (substring-per-start-position — O(len·K) there,
    * O(len) here, same counts).
    */
  private val keywordTagPatterns = Seq(
    "hash join", "scan fast", "merge", "vector", "table table",
    "slow query", "batch window", "never-in-corpus")

  def keywordTagQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.keywordTag(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        keywordTagPatterns)
      .select(col("id").as("doc_id"), col("pattern"), col("n_hits"))
      .orderBy(col("doc_id"), col("pattern"))

  val keywordTagOracle: String = {
    val vals = keywordTagPatterns.map(p => s"('$p')").mkString(", ")
    s"""WITH pats AS (SELECT * FROM (VALUES $vals) p(pattern)),
       |hits AS (
       |  SELECT d.doc_id, p.pattern,
       |    len(list_filter(range(1, len(d.text) - len(p.pattern) + 2),
       |        i -> substring(d.text, i, len(p.pattern)) = p.pattern))
       |      AS n_hits
       |  FROM documents d CROSS JOIN pats p)
       |SELECT doc_id, pattern, CAST(n_hits AS BIGINT) AS n_hits
       |FROM hits WHERE n_hits > 0
       |ORDER BY doc_id, pattern""".stripMargin
  }

  /** k-anonymous composition release
    * ([[graft.operators.Diagnostics.kAnonymousRelease]]): the
    * (source, lang) breakdown published only where a cell holds ≥ 5
    * docs; smaller cells generalize to the '*' aggregate. The oracle
    * replays the count, the generalization CASE, and the k floor on the
    * released rows.
    */
  def kanonReleaseQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.kAnonymousRelease(
        T(s, dir, "documents"), Seq(col("source"), col("lang")), k = 5)
      .select(col("k0").as("source"), col("k1").as("lang"), col("n"))
      .orderBy(col("source"), col("lang"))

  val kanonReleaseOracle: String =
    """WITH c AS (
      |  SELECT CAST(source AS VARCHAR) AS source,
      |    CAST(lang AS VARCHAR) AS lang,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2),
      |g AS (
      |  SELECT CASE WHEN n >= 5 THEN source ELSE '*' END AS source,
      |    CASE WHEN n >= 5 THEN lang ELSE '*' END AS lang, n
      |  FROM c)
      |SELECT source, lang, CAST(SUM(n) AS BIGINT) AS n
      |FROM g GROUP BY 1, 2 HAVING SUM(n) >= 5
      |ORDER BY source, lang""".stripMargin

  /** Windowed co-occurrence counts
    * ([[graft.operators.TextIndex.cooccurrenceCounts]]): the GloVe-style
    * count matrix, window 3, top-200 pairs. The oracle replays each
    * offset's positional pairing, the canonical ordering, and the
    * (n desc, a, b) cut.
    */
  def cooccurrenceQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.cooccurrenceCounts(
        T(s, dir, "documents"), col("text"), window = 3, k = 200)
      .orderBy(col("n").desc, col("term_a"), col("term_b"))

  val cooccurrenceOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS t
      |  FROM documents),
      |offs AS (SELECT unnest(range(1, 4)) AS off),
      |pos AS (
      |  SELECT t, off, unnest(range(1, len(t) - off + 1)) AS i
      |  FROM toks CROSS JOIN offs WHERE len(t) > off),
      |p AS (
      |  SELECT CASE WHEN t[i] <= t[i + off] THEN t[i] ELSE t[i + off] END
      |      AS term_a,
      |    CASE WHEN t[i] <= t[i + off] THEN t[i + off] ELSE t[i] END
      |      AS term_b
      |  FROM pos)
      |SELECT term_a, term_b, CAST(COUNT(*) AS BIGINT) AS n
      |FROM p GROUP BY 1, 2
      |ORDER BY n DESC, term_a, term_b
      |LIMIT 200""".stripMargin

  /** Deterministic word dropout ([[graft.operators.Augment.wordDropout]]):
    * hash-decided 1/10 token dropout, reproducible across engines. The
    * oracle replays the per-position md5 decision and the re-join.
    */
  def augmentDropoutQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Augment.wordDropout(
        T(s, dir, "documents"), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("n_tok"), col("n_dropped"),
        md5(col("text_aug")).as("aug_md5"))
      .orderBy(col("doc_id"))

  val augmentDropoutOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS toks
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, len(toks) AS n_tok,
      |    list_filter(toks, (x, i) ->
      |      CAST(('0x' || substring(md5('aug:' || CAST(doc_id AS VARCHAR)
      |        || ':' || CAST(i AS VARCHAR) || ':' || x), 1, 8)) AS BIGINT)
      |        % 10 <> 0) AS kept
      |  FROM t)
      |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
      |  CAST(n_tok - len(kept) AS BIGINT) AS n_dropped,
      |  md5(COALESCE(array_to_string(kept, ' '), '')) AS aug_md5
      |FROM k
      |ORDER BY doc_id""".stripMargin

  /** ROUGE-2 over adjacent-doc pairs
    * ([[graft.operators.TextIndex.rougeN]]): clipped bigram overlap,
    * recall/precision/F1. The oracle replays the positional bigrams,
    * the per-gram clipped min, and the ratio guards.
    */
  def rougeOverlapQ(s: SparkSession, dir: String): DataFrame = {
    val d = T(s, dir, "documents").select(col("doc_id"), col("text"))
    val pairs = d.toDF("a_id", "a_text")
      .withColumn("b_id", col("a_id") + 1)
      .join(d.toDF("b_id", "b_text"), "b_id")
      .select(col("a_id").as("pair_id"), col("a_text"), col("b_text"))
    graft.operators.TextIndex.rougeN(pairs, col("pair_id"),
        col("a_text"), col("b_text"), n = 2)
      .orderBy(col("pair_id"))
  }

  val rougeOverlapOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS t
      |  FROM documents),
      |p AS (
      |  SELECT a.doc_id AS pair_id, a.t AS rt, b.t AS ct
      |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1),
      |rg AS (
      |  SELECT pair_id, g, COUNT(*) AS cnt FROM (
      |    SELECT pair_id, unnest(list_transform(range(1, len(rt)),
      |      i -> rt[i] || ' ' || rt[i+1])) AS g
      |    FROM p WHERE len(rt) >= 2)
      |  GROUP BY 1, 2),
      |cg AS (
      |  SELECT pair_id, g, COUNT(*) AS cnt FROM (
      |    SELECT pair_id, unnest(list_transform(range(1, len(ct)),
      |      i -> ct[i] || ' ' || ct[i+1])) AS g
      |    FROM p WHERE len(ct) >= 2)
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT rg.pair_id,
      |    CAST(SUM(LEAST(rg.cnt, cg.cnt)) AS BIGINT) AS n_match
      |  FROM rg JOIN cg ON rg.pair_id = cg.pair_id AND rg.g = cg.g
      |  GROUP BY 1),
      |rt AS (SELECT pair_id, CAST(SUM(cnt) AS BIGINT) AS n_ref
      |       FROM rg GROUP BY 1),
      |ctt AS (SELECT pair_id, CAST(SUM(cnt) AS BIGINT) AS n_cand
      |        FROM cg GROUP BY 1)
      |SELECT p.pair_id,
      |  COALESCE(rt.n_ref, 0) AS n_ref,
      |  COALESCE(ctt.n_cand, 0) AS n_cand,
      |  COALESCE(m.n_match, 0) AS n_match,
      |  CASE WHEN COALESCE(rt.n_ref, 0) = 0 THEN NULL
      |       ELSE CAST(COALESCE(m.n_match, 0) AS DOUBLE)
      |         / CAST(rt.n_ref AS DOUBLE) END AS recall,
      |  CASE WHEN COALESCE(ctt.n_cand, 0) = 0 THEN NULL
      |       ELSE CAST(COALESCE(m.n_match, 0) AS DOUBLE)
      |         / CAST(ctt.n_cand AS DOUBLE) END AS precision,
      |  CASE WHEN COALESCE(rt.n_ref, 0) = 0 OR COALESCE(ctt.n_cand, 0) = 0
      |       THEN NULL
      |       ELSE 2.0 * CAST(COALESCE(m.n_match, 0) AS DOUBLE)
      |         / CAST(rt.n_ref + ctt.n_cand AS DOUBLE) END AS f1
      |FROM p
      |LEFT JOIN rt ON rt.pair_id = p.pair_id
      |LEFT JOIN ctt ON ctt.pair_id = p.pair_id
      |LEFT JOIN m ON m.pair_id = p.pair_id
      |ORDER BY p.pair_id""".stripMargin

  /** T5 span corruption ([[graft.operators.Augment.spanCorruption]]):
    * hash-decided mask spans, sentinel inputs/targets. The oracle replays
    * the positional start hash, the trailing-window mask, the run
    * detection, the sentinel numbering, and both text assemblies.
    */
  def spanCorruptionQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Augment.spanCorruption(
        T(s, dir, "documents"), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("n_tok"), col("n_masked"),
        col("n_spans"), md5(col("input_text")).as("input_md5"),
        md5(col("target_text")).as("target_md5"))
      .orderBy(col("doc_id"))

  val spanCorruptionOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |    list_transform(range(1, len(toks) + 1), p ->
      |      CAST(('0x' || substring(md5('t5:' || CAST(doc_id AS VARCHAR)
      |        || ':' || CAST(p AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0)
      |      AS starts
      |  FROM t),
      |m AS (
      |  SELECT doc_id, toks, n,
      |    list_transform(range(1, n + 1), p ->
      |      len(list_filter(range(greatest(1, p - 2), p + 1),
      |        s -> starts[s])) > 0) AS msk
      |  FROM c),
      |r AS (
      |  SELECT doc_id, toks, n, msk,
      |    list_transform(range(1, n + 1), p ->
      |      msk[p] AND (p = 1 OR NOT msk[p - 1])) AS rst
      |  FROM m),
      |k AS (
      |  SELECT doc_id, toks, n, msk, rst,
      |    list_transform(range(1, n + 1), p ->
      |      list_sum(list_transform(range(1, p + 1),
      |        q -> CASE WHEN rst[q] THEN 1 ELSE 0 END)) - 1) AS kidx,
      |    len(list_filter(rst, x -> x)) AS n_spans,
      |    len(list_filter(msk, x -> x)) AS n_masked
      |  FROM r),
      |txt AS (
      |  SELECT doc_id, n, n_masked, n_spans,
      |    -- COALESCE: DuckDB array_to_string([]) is NULL, Spark's is ''
      |    COALESCE(array_to_string(list_filter(list_transform(
      |      range(1, n + 1), p ->
      |      CASE WHEN NOT msk[p] THEN toks[p]
      |           WHEN rst[p] THEN '<extra_id_' || CAST(kidx[p] AS VARCHAR)
      |             || '>'
      |           ELSE NULL END), x -> x IS NOT NULL), ' '), '')
      |      AS input_text,
      |    COALESCE(array_to_string(list_filter(list_transform(
      |      range(1, n + 1), p ->
      |      CASE WHEN rst[p] THEN '<extra_id_' || CAST(kidx[p] AS VARCHAR)
      |             || '> ' || toks[p]
      |           WHEN msk[p] THEN toks[p]
      |           ELSE NULL END), x -> x IS NOT NULL), ' '), '')
      |      AS target_body
      |  FROM k)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
      |  CAST(n_masked AS INTEGER) AS n_masked,
      |  CAST(n_spans AS INTEGER) AS n_spans,
      |  md5(input_text) AS input_md5,
      |  md5(target_body || CASE WHEN target_body = '' THEN '' ELSE ' ' END
      |    || '<extra_id_' || CAST(n_spans AS VARCHAR) || '>') AS target_md5
      |FROM txt
      |ORDER BY doc_id""".stripMargin

  /** Vocabulary-growth curve ([[graft.operators.TextIndex.vocabGrowth]]):
    * Heaps-law readout over ten doc-id-ordered corpus slices. The oracle
    * replays the NTILE cut, the first-seen reduction, and the running
    * vocabulary sum.
    */
  def vocabGrowthQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.vocabGrowth(
        T(s, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("bucket"))

  val vocabGrowthOracle: String =
    """WITH d AS (
      |  SELECT CAST(NTILE(10) OVER (ORDER BY doc_id) AS INTEGER) AS bucket,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS t
      |  FROM documents),
      |toks AS (SELECT bucket, unnest(t) AS term FROM d),
      |dp AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
      |       FROM d GROUP BY bucket),
      |tp AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS tokens
      |       FROM toks GROUP BY bucket),
      |ft AS (SELECT term, MIN(bucket) AS bucket FROM toks GROUP BY term),
      |nt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_terms
      |       FROM ft GROUP BY bucket)
      |SELECT dp.bucket, dp.n_docs,
      |  COALESCE(tp.tokens, 0) AS tokens,
      |  COALESCE(nt.new_terms, 0) AS new_terms,
      |  CAST(SUM(COALESCE(nt.new_terms, 0)) OVER (ORDER BY dp.bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_vocab
      |FROM dp LEFT JOIN tp ON dp.bucket = tp.bucket
      |LEFT JOIN nt ON dp.bucket = nt.bucket
      |ORDER BY dp.bucket""".stripMargin

  /** The growth curve's 10⁹-doc plan ([[graft.operators.TextIndex
    * .vocabGrowthSketchCuts]]): id slices from broadcast KLL range cuts —
    * no global sort, not even over ids. At driver SFs the corpus fits
    * the sketch buffer, so the cuts are the exact discrete quantiles and
    * the oracle replays them with quantile_disc (the curriculum_shards
    * convention: DOUBLE-cast, `> cut` counting, boundary to the lower
    * slice).
    */
  def vocabGrowthKllQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.vocabGrowthSketchCuts(
        T(s, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("bucket"))

  val vocabGrowthKllOracle: String =
    """WITH ids AS (SELECT doc_id FROM documents),
      |c AS (
      |  SELECT quantile_disc(CAST(doc_id AS DOUBLE),
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
      |  FROM ids),
      |d AS (
      |  SELECT CAST(len(list_filter(c.cuts,
      |      x -> CAST(doc_id AS DOUBLE) > x)) + 1 AS INTEGER) AS bucket,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS t
      |  FROM documents CROSS JOIN c),
      |toks AS (SELECT bucket, unnest(t) AS term FROM d),
      |dp AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
      |       FROM d GROUP BY bucket),
      |tp AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS tokens
      |       FROM toks GROUP BY bucket),
      |ft AS (SELECT term, MIN(bucket) AS bucket FROM toks GROUP BY term),
      |nt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_terms
      |       FROM ft GROUP BY bucket)
      |SELECT dp.bucket, dp.n_docs,
      |  COALESCE(tp.tokens, 0) AS tokens,
      |  COALESCE(nt.new_terms, 0) AS new_terms,
      |  CAST(SUM(COALESCE(nt.new_terms, 0)) OVER (ORDER BY dp.bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_vocab
      |FROM dp LEFT JOIN tp ON dp.bucket = tp.bucket
      |LEFT JOIN nt ON dp.bucket = nt.bucket
      |ORDER BY dp.bucket""".stripMargin

  /** Self-BLEU diversity ([[graft.operators.TextIndex.selfBleu]]): each
    * doc's clipped bigram precision against the rest of the corpus. The
    * oracle replays the positional bigrams, the per-gram (m1, c1, m2)
    * leave-one-out-max trick, the clip, and the per-doc ratio.
    */
  def selfBleuQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.selfBleu(
        T(s, dir, "documents"), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("n_grams"), col("n_clipped"),
        col("self_bleu"))
      .orderBy(col("doc_id"))

  val selfBleuOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |    i -> array_to_string(t[i:i+1], ' '))) AS gram
      |  FROM toks WHERE len(t) >= 2),
      |tf AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM g GROUP BY 1, 2),
      |m1 AS (SELECT gram, MAX(tf) AS m1 FROM tf GROUP BY gram),
      |st AS (
      |  SELECT tf.gram, MAX(m1.m1) AS m1,
      |    SUM(CASE WHEN tf.tf = m1.m1 THEN 1 ELSE 0 END) AS c1,
      |    MAX(CASE WHEN tf.tf < m1.m1 THEN tf.tf END) AS m2
      |  FROM tf JOIN m1 ON tf.gram = m1.gram GROUP BY tf.gram),
      |cl AS (
      |  SELECT tf.doc_id, tf.tf,
      |    LEAST(tf.tf, CASE WHEN tf.tf = st.m1 AND st.c1 = 1
      |      THEN COALESCE(st.m2, 0) ELSE st.m1 END) AS clip
      |  FROM tf JOIN st ON tf.gram = st.gram),
      |pd AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_grams,
      |    CAST(SUM(clip) AS BIGINT) AS n_clipped
      |  FROM cl GROUP BY doc_id)
      |SELECT t.doc_id,
      |  COALESCE(pd.n_grams, 0) AS n_grams,
      |  COALESCE(pd.n_clipped, 0) AS n_clipped,
      |  CASE WHEN COALESCE(pd.n_grams, 0) = 0 THEN NULL
      |       ELSE CAST(pd.n_clipped AS DOUBLE) / CAST(pd.n_grams AS DOUBLE)
      |  END AS self_bleu
      |FROM toks t LEFT JOIN pd ON t.doc_id = pd.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Trigram familiarity with 0.4 stupid backoff to the leading bigram —
    * exact-integer counts, fixed-order double score.
    */
  def trigramBackoffQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.backoffFamiliarity(
        T(s, dir, "documents"), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("n_trigrams"), col("n_tri_common"),
        col("n_backoff"), col("familiarity"))
      .orderBy(col("doc_id"))

  val trigramBackoffOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
      |         ELSE list_transform(range(1, len(t) - 1),
      |                i -> array_to_string(t[i:i+2], ' ')) END AS g3s,
      |    CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
      |         ELSE list_transform(range(1, len(t) - 1),
      |                i -> array_to_string(t[i:i+1], ' ')) END AS g2s
      |  FROM toks),
      |tripos AS (SELECT doc_id, unnest(g3s) AS g3, unnest(g2s) AS g2 FROM g),
      |c3 AS (SELECT g3 AS k3, COUNT(*) AS c FROM tripos GROUP BY g3),
      |allbi AS (
      |  SELECT unnest(CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
      |    ELSE list_transform(range(1, len(t)),
      |           i -> array_to_string(t[i:i+1], ' ')) END) AS g2
      |  FROM toks),
      |c2 AS (SELECT g2 AS k2, COUNT(*) AS c FROM allbi GROUP BY g2),
      |scored AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
      |    CAST(SUM(CASE WHEN c3.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_common,
      |    CAST(SUM(CASE WHEN c3.c < 2 AND c2.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff
      |  FROM tripos JOIN c3 ON tripos.g3 = c3.k3 JOIN c2 ON tripos.g2 = c2.k2
      |  GROUP BY doc_id)
      |SELECT t.doc_id, COALESCE(n_trigrams, 0) AS n_trigrams,
      |  COALESCE(n_tri_common, 0) AS n_tri_common,
      |  COALESCE(n_backoff, 0) AS n_backoff,
      |  CASE WHEN COALESCE(n_trigrams, 0) = 0 THEN 0.0
      |       ELSE (n_tri_common::DOUBLE + 0.4 * n_backoff::DOUBLE) / n_trigrams::DOUBLE
      |  END AS familiarity
      |FROM toks t LEFT JOIN scored ON t.doc_id = scored.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Top-10-vocabulary coverage per document — the common-token quality
    * filter; exact integer-ratio double. (k = 10 because the synthetic
    * corpus draws from ~31 distinct tokens; at real scale k ≈ 10^4–10^5.)
    */
  def vocabCoverageQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.vocabCoverage(
        T(s, dir, "documents"), col("doc_id"), col("text"), k = 10)
      .select(col("id").as("doc_id"), col("n_tok"), col("n_vocab"),
        col("coverage"))
      .orderBy(col("doc_id"))

  val vocabCoverageOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |vocab AS (
      |  SELECT term FROM (SELECT term, COUNT(*) AS c FROM toks GROUP BY term)
      |  ORDER BY c DESC, term LIMIT 10),
      |j AS (
      |  SELECT doc_id,
      |    CASE WHEN term IN (SELECT term FROM vocab) THEN 1 ELSE 0 END AS hit
      |  FROM toks)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |  CAST(SUM(hit) AS BIGINT) AS n_vocab,
      |  CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS coverage
      |FROM j
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Bigram-familiarity quality scoring: exact corpus-frequency form of
    * the n-gram-LM filter (see [[graft.operators.TextIndex.bigramFamiliarity]])
    * — integer counts and ratios only, so the oracle replays it exactly.
    */
  def bigramFamiliarityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bigramFamiliarity(
        T(s, dir, "documents"), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("n_bigrams"), col("sum_freq"),
        col("n_common"), col("common_frac"))
      .orderBy(col("doc_id"))

  val bigramFamiliarityOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, b[1] AS w1, b[2] AS w2 FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN []::VARCHAR[][]
      |      ELSE list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])
      |      END) AS b
      |    FROM t) x),
      |c AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |s AS (
      |  SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(c.c) AS BIGINT) AS sum_freq,
      |    CAST(SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
      |  FROM bg JOIN c ON c.w1 = bg.w1 AND c.w2 = bg.w2
      |  GROUP BY bg.doc_id)
      |SELECT d.doc_id,
      |  COALESCE(s.n_bigrams, 0) AS n_bigrams,
      |  COALESCE(s.sum_freq, 0) AS sum_freq,
      |  COALESCE(s.n_common, 0) AS n_common,
      |  CASE WHEN COALESCE(s.n_bigrams, 0) = 0 THEN 0.0
      |       ELSE CAST(s.n_common AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE) END
      |    AS common_frac
      |FROM (SELECT DISTINCT doc_id FROM documents) d
      |LEFT JOIN s ON s.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------- canonical dedup

  /** Exact dedup over the canonical text form (lowercased, punctuation
    * stripped, whitespace collapsed): catches case/spacing/punctuation
    * variants with exact-dedup cost — the cheap pass that runs BEFORE any
    * near-dup machinery. Same keep-min-id/group-size contract as
    * `dedup_exact`.
    */
  def dedupCanonical(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.exact(
        T(s, dir, "documents"), col("doc_id"),
        TextFunctions.canonicalize(col("text")))
      .orderBy(col("keep_id"))

  val dedupCanonicalOracle: String =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS group_size
      |FROM documents
      |GROUP BY trim(regexp_replace(regexp_replace(lower(text),
      |  '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))
      |ORDER BY keep_id""".stripMargin

  // ------------------------------------------------------ source overlap matrix

  /** Cross-source duplication matrix: verified near-dup pairs (>= 0.8
    * Jaccard) rolled up by the source pair they straddle — the curation
    * analytic that says which crawls/feeds duplicate each other and how
    * much, i.e. where dedup budget actually goes. Sources are normalized
    * (src_a <= src_b) so each unordered pair counts once.
    */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val pairs = graft.operators.Dedup.minHashPairs(
      docs, col("doc_id"), col("text"),
      shingleK = 3, numHashes = 128, bands = 16, threshold = 0.8)
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), Seq("id_b"))
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sourceOverlapOracle: String =
    s"""WITH $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sets sa ON sa.doc_id = id_a
       |  JOIN sets sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) >= 0.8)
       |SELECT least(da.source, db.source) AS src_a,
       |  greatest(da.source, db.source) AS src_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM pairs
       |JOIN documents da ON da.doc_id = id_a
       |JOIN documents db ON db.doc_id = id_b
       |GROUP BY 1, 2
       |ORDER BY src_a, src_b""".stripMargin

  /** KMV-sketch overlap matrix over the same corpus — the 100-TB scale path
    * for [[sourceOverlap]]: one aggregation reduces each source to its
    * k = 4096 smallest distinct shingle hashes; all pairwise distinct/
    * union/Jaccard estimates are then sketch-vs-sketch algebra. Every
    * source's distinct-shingle count at sf0.01 sits far below k, so the
    * sketches run their EXACT regime and DuckDB replays the md5-prefix
    * hashes bit-for-bit — a hash gate on the full aggregation + estimator
    * plumbing; the lossy regime (which this same query exercises at sf0.1+
    * in Bench, ~13k shingles per source) is spec-gated with error bounds
    * in DistinctSketchSpec.
    */
  def overlapSketchQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.sourceOverlapSketch(
        T(s, dir, "documents"), col("source"), col("text"),
        shingleK = 3, k = 4096)
      .orderBy(col("source_a"), col("source_b"))

  val overlapSketchOracle: String =
    """WITH sh AS (
      |  SELECT source, unnest(
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |         ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END
      |  ) AS g
      |  FROM (SELECT source, string_split_regex(trim(text), '\s+') AS t FROM documents)),
      |hs AS (SELECT DISTINCT source,
      |         ('0x' || substring(md5(g), 1, 8))::BIGINT AS h FROM sh),
      |sk AS (SELECT source, list_sort(list(h))[1:4096] AS s FROM hs GROUP BY source),
      |pairs AS (
      |  SELECT a.source AS source_a, b.source AS source_b, a.s AS sa, b.s AS sb,
      |    list_sort(list_distinct(a.s || b.s))[1:4096] AS l
      |  FROM sk a JOIN sk b ON a.source < b.source)
      |SELECT source_a, source_b,
      |  CASE WHEN len(sa) < 4096 THEN CAST(len(sa) AS DOUBLE)
      |       ELSE 4095 * 4294967296.0 / CAST(sa[4096] AS DOUBLE) END AS d_a,
      |  CASE WHEN len(sb) < 4096 THEN CAST(len(sb) AS DOUBLE)
      |       ELSE 4095 * 4294967296.0 / CAST(sb[4096] AS DOUBLE) END AS d_b,
      |  CASE WHEN len(l) < 4096 THEN CAST(len(l) AS DOUBLE)
      |       ELSE 4095 * 4294967296.0 / CAST(l[4096] AS DOUBLE) END AS d_union,
      |  CAST(len(list_intersect(list_intersect(l, sa), sb)) AS BIGINT) AS common_k,
      |  CAST(len(list_intersect(list_intersect(l, sa), sb)) AS DOUBLE)
      |    / CAST(len(l) AS DOUBLE) AS jaccard,
      |  CAST(len(list_intersect(list_intersect(l, sa), sb)) AS DOUBLE)
      |    / CAST(len(l) AS DOUBLE)
      |    * (CASE WHEN len(l) < 4096 THEN CAST(len(l) AS DOUBLE)
      |            ELSE 4095 * 4294967296.0 / CAST(l[4096] AS DOUBLE) END) AS d_inter
      |FROM pairs
      |ORDER BY source_a, source_b""".stripMargin

  // ----------------------------------------------------------- language id

  /** Heuristic n-gram language ID over the documents corpus: per-language
    * stopword token hits (en/de/es/fr) plus CJK character count (zh),
    * argmax with fixed precedence — a pure map-only function of the text,
    * every piece a codegen'd builtin. On this synthetic corpus the `lang`
    * column is uncorrelated with the text (the words are English-ish for
    * every label), so the oracle gates the SCORING function, not
    * discrimination power — TextStatsSpec proves discrimination on a
    * genuinely multilingual fixture.
    */
  def langIdQ(s: SparkSession, dir: String): DataFrame = {
    // native one-pass scorer (the HOF TextFunctions.langScores form is the
    // executable spec; TextStatsSpec pins native == spec)
    val sc = org.apache.spark.sql.graft.LangScores.langScores(col("text"))
    val hits = Seq("en", "de", "es", "fr", "zh")
      .map(l => col(s"s.$l").as(s"hits_$l"))
    val best = greatest(col("hits_en"), col("hits_de"), col("hits_es"),
      col("hits_fr"), col("hits_zh"))
    T(s, dir, "documents")
      .select(col("doc_id"), sc.as("s"))
      .select(col("doc_id") +: hits: _*)
      .select(col("*"),
        // null-text guard mirrors TextFunctions.langId (and the oracle):
        // without it the all-null when-chain falls through to 'zh'
        when(col("hits_en").isNull, lit(null).cast("string"))
          .when(best === 0, lit("und"))
          .when(col("hits_en") === best, lit("en"))
          .when(col("hits_de") === best, lit("de"))
          .when(col("hits_es") === best, lit("es"))
          .when(col("hits_fr") === best, lit("fr"))
          .otherwise(lit("zh")).as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  val langIdOracle: String = {
    def lst(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |h AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(toks, x -> list_contains(${lst(TextFunctions.StopwordsEn)}, x))) AS INTEGER) AS hits_en,
       |    CAST(len(list_filter(toks, x -> list_contains(${lst(TextFunctions.StopwordsDe)}, x))) AS INTEGER) AS hits_de,
       |    CAST(len(list_filter(toks, x -> list_contains(${lst(TextFunctions.StopwordsEs)}, x))) AS INTEGER) AS hits_es,
       |    CAST(len(list_filter(toks, x -> list_contains(${lst(TextFunctions.StopwordsFr)}, x))) AS INTEGER) AS hits_fr,
       |    CAST(len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS INTEGER) AS hits_zh
       |  FROM t),
       |p AS (SELECT *, greatest(hits_en, hits_de, hits_es, hits_fr, hits_zh) AS best FROM h)
       |SELECT doc_id, hits_en, hits_de, hits_es, hits_fr, hits_zh,
       |  CASE WHEN hits_en IS NULL THEN NULL
       |       WHEN best = 0 THEN 'und'
       |       WHEN hits_en = best THEN 'en'
       |       WHEN hits_de = best THEN 'de'
       |       WHEN hits_es = best THEN 'es'
       |       WHEN hits_fr = best THEN 'fr'
       |       ELSE 'zh' END AS pred_lang
       |FROM p
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ image near-dup

  /** Deterministic grayscale test pattern rendered at any resolution and
    * PNG-encoded in-JVM — relative coordinates, so the same `seedShift`
    * draws the same PICTURE at every size. Drives [[mmPhashPairsQ]].
    */
  private[graft] def patternPng(w: Int, h: Int, seedShift: Int,
      noise: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val fx = x * 255 / math.max(w - 1, 1)
        val fy = y * 255 / math.max(h - 1, 1)
        val base = ((fx + seedShift) ^ (fy >> 2)) & 0xff
        val v = if ((x * 8 / w + y * 8 / h) % 2 == 0) base else 255 - base
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val rnd = new scala.util.Random(noise * 7919 + 13)
    var i = 0
    while (i < noise) {
      img.setRGB(rnd.nextInt(w), rnd.nextInt(h), 0x808080)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The mm fixture corpus: 10 distinct pictures, each with a pixel-noised
    * copy and a 2× rescale. Shared by [[mmPhashPairsQ]] and the
    * [[graft.tools.TrainArtifacts]] run that pins the decoded dHash64
    * values ([[PinnedArtifacts.MmFixtureHashes64]]).
    */
  private[graft] def mmFixtureImages: Seq[(Long, Array[Byte])] =
    (0 until 10).flatMap { i =>
      Seq(
        (i * 3L, patternPng(72, 64, i * 29)),
        (i * 3L + 1, patternPng(72, 64, i * 29, noise = 6)),
        (i * 3L + 2, patternPng(144, 128, i * 29)))
    }

  /** Image near-dup pairs over REAL decoded pixels — dHash + pigeonhole
    * block-key join ([[graft.operators.Multimodal.imageDedupPairs]]),
    * all unordered pairs within Hamming radius 4. NOTE on the fixture's
    * pair structure (visible in the pinned hashes): exact copies and
    * noised copies pair at distance 0; most rescales pair within the
    * radius, but two rescale hashes land at distance 6/8 (absent) and
    * pictures 4 and 5 near-collide at exactly 4 (present) — the entry
    * gates the RADIUS-JOIN SEMANTICS bit-for-bit, while the
    * separation/recall demonstrations live in MultimodalSpec's dedicated
    * fixtures. The Spark side decodes pixels via javax.imageio at query
    * time; the oracle replays the pair semantics (pigeonhole recall is
    * exact, so block keys are an optimization, not a semantic) over the
    * PINNED decode results
    * ([[PinnedArtifacts.MmFixtureHashes64]], regenerated by
    * `graft.tools.TrainArtifacts`; MultimodalSpec pins decode → hash
    * equality per image, so a decode-path change fails the spec before
    * it can silently diverge from the oracle).
    */
  def mmPhashPairsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Multimodal.imageDedupPairs(
        mmFixtureImages.toDF("id", "payload"), col("id"), col("payload"),
        maxHamming = 4)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Pair replay over the pinned hashes: every unordered pair within 4
    * bits. `bit_count`/`xor` are exact integer ops in both engines.
    */
  val mmPhashPairsOracle: String =
    s"""WITH h(id, hash) AS (VALUES
       |${PinnedArtifacts.mmFixtureHashSqlValues}
       |)
       |SELECT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.hash, b.hash)) AS INTEGER) AS hamming
       |FROM h a JOIN h b ON a.id < b.id
       |WHERE bit_count(xor(a.hash, b.hash)) <= 4
       |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------- skew diagnostics

  /** Exact join-key skew report over lineitem's l_suppkey: the 20 heaviest
    * keys, their table share, and the salting factor that equalizes them
    * across 32 reducers — measured before the shuffle, not discovered when
    * it stalls.
    */
  def skewReportQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.skewReport(
        T(s, dir, "lineitem"), col("l_suppkey"), topN = 20, partitions = 32)

  val skewReportOracle: String =
    """WITH c AS (
      |  SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT SUM(cnt) AS total FROM c)
      |SELECT key, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
      |  CAST((cnt * 32 + total - 1) // total AS BIGINT) AS salt_factor
      |FROM c, t
      |ORDER BY cnt DESC, key
      |LIMIT 20""".stripMargin

  /** Pre-flight join-size estimate from counted KMV sketches: customer ⋈
    * orders on custkey, k = 4096 — both sides' distinct custkey counts at
    * sf0.01 sit below k, so the estimate is the EXACT join cardinality
    * and DuckDB replays it bit-for-bit (hash grouping, k-smallest cut,
    * threshold CASEs, and the ×1.0 scale all included); the saturated
    * regime (sf0.1 exercises it in Bench — 15k distinct custkeys) is
    * spec-gated with error bounds in DistinctSketchSpec.
    */
  def joinSizeSketchQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.joinSizeEstimate(
      T(s, dir, "customer"), col("c_custkey"),
      T(s, dir, "orders"), col("o_custkey"), k = 4096)

  val joinSizeSketchOracle: String =
    """WITH ha AS (
      |  SELECT ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM customer GROUP BY 1),
      |hb AS (
      |  SELECT ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |sa AS (SELECT h, c FROM ha ORDER BY h LIMIT 4096),
      |sb AS (SELECT h, c FROM hb ORDER BY h LIMIT 4096),
      |st AS (SELECT
      |  (SELECT COUNT(*) FROM sa) AS na, (SELECT COUNT(*) FROM sb) AS nb,
      |  (SELECT max(h) FROM sa) AS ma, (SELECT max(h) FROM sb) AS mb),
      |th AS (SELECT na, nb, ma, mb,
      |  least(CASE WHEN na < 4096 THEN 4294967296 ELSE ma END,
      |        CASE WHEN nb < 4096 THEN 4294967296 ELSE mb END) AS theta
      |  FROM st),
      |j AS (SELECT CAST(COUNT(*) AS BIGINT) AS common_keys,
      |        COALESCE(SUM(sa.c * sb.c), 0) AS raw
      |      FROM sa JOIN sb ON sa.h = sb.h CROSS JOIN th
      |      WHERE sa.h < th.theta)
      |SELECT
      |  CASE WHEN na < 4096 THEN CAST(na AS DOUBLE)
      |       ELSE 4095 * 4294967296.0 / CAST(ma AS DOUBLE) END AS d_a,
      |  CASE WHEN nb < 4096 THEN CAST(nb AS DOUBLE)
      |       ELSE 4095 * 4294967296.0 / CAST(mb AS DOUBLE) END AS d_b,
      |  common_keys,
      |  CAST(raw AS DOUBLE) * (4294967296.0 / CAST(theta AS DOUBLE)) AS est_join_rows
      |FROM j CROSS JOIN th""".stripMargin

  /** Content-addressed corpus manifest over the documents table: per
    * underlying parquet file, row count + XOR-folded content
    * fingerprints — the manifest-driven-incremental-processing
    * primitive. The driver tables are single files, so the oracle can
    * replay the XOR fold over the `documents` view with the literal file
    * name; the per-file grouping itself is spec-gated against a
    * deliberately two-file table in DiagnosticsSpec.
    */
  def corpusManifestQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.corpusManifest(
        s.read.parquet(s"$dir/documents.parquet"), col("text"))
      // the operator keys on the FULL path; project the basename only for
      // the oracle gate (the driver table is a single known file)
      // fp_sum is DECIMAL(38,0) (a 21-digit value at sf0.01) — emit it as a
      // STRING so the driver's hash canonicalization (which coerces numerics
      // through int64/float64) cannot lose precision on either side.
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("file"),
        col("n_rows"), col("fp_xor"), col("fp_sum").cast("string").as("fp_sum"))
      .orderBy(col("file"))

  val corpusManifestOracle: String =
    """SELECT 'documents.parquet' AS file,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  bit_xor(('0x' || substring(md5(text), 1, 15))::BIGINT) AS fp_xor,
      |  CAST(CAST(SUM(('0x' || substring(md5(text), 1, 15))::BIGINT) AS DECIMAL(38,0)) AS VARCHAR) AS fp_sum
      |FROM documents""".stripMargin

  /** Corpus snapshot diff: v1 = docs < 450, v2 = docs >= 50 with every
    * 7th doc's text amended — exercises all four statuses.
    */
  def corpusDiffQ(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val v1 = docs.filter(col("doc_id") < 450)
    val v2 = docs.filter(col("doc_id") >= 50)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    graft.operators.Diagnostics.corpusDiff(v1, v2, col("doc_id"), col("text"))
      .orderBy(col("id"))
  }

  val corpusDiffOracle: String =
    """WITH o AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 450),
      |nw AS (SELECT doc_id AS id,
      |         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      |       FROM documents WHERE doc_id >= 50)
      |SELECT COALESCE(o.id, nw.id) AS id,
      |  CASE WHEN o.id IS NULL THEN 'added'
      |       WHEN nw.id IS NULL THEN 'removed'
      |       WHEN o.text <> nw.text THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM o FULL OUTER JOIN nw ON o.id = nw.id
      |ORDER BY id""".stripMargin

  /** Mergeable KLL quantile sketch over order totals per priority — the
    * 100-TB percentile path (q22's exact `percentile_disc` is a full sort
    * per group by definition; the sketch shuffles O(k log(n/k)) doubles).
    * At sf0.01 every priority group (~3k orders) fits inside the k=4096
    * capacity, so the sketch runs its EXACT regime and the oracle is
    * DuckDB's `quantile_disc` — a hash gate on the full aggregation
    * plumbing; the lossy regime (which the same query exercises at sf0.1+
    * in Bench) is spec-gated with rank-error bounds in QuantileSketchSpec.
    */
  def quantileSketchQ(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.QuantileSketch
          .kllQuantiles(4096, Seq(0.5, 0.9, 0.99))(col("o_totalprice")).as("qs"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"), col("qs")(0).as("p50"),
        col("qs")(1).as("p90"), col("qs")(2).as("p99"), col("n"))
      .orderBy(col("o_orderpriority"))

  val quantileSketchOracle: String =
    """SELECT o_orderpriority,
      |  quantile_disc(o_totalprice, 0.5) AS p50,
      |  quantile_disc(o_totalprice, 0.9) AS p90,
      |  quantile_disc(o_totalprice, 0.99) AS p99,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Mergeable Misra-Gries heavy-hitters sketch over per-language tokens —
    * the 100-TB frequent-items path (the exact `heavy_hitters` shuffles one
    * row per distinct key; the sketch's partial buffer is capped at k
    * entries per group however large the vocabulary). The synthetic corpus
    * has far fewer distinct tokens than k = 4096, so the sketch runs its
    * EXACT regime and DuckDB's per-group top-5 replays it — a hash gate on
    * the full aggregation plumbing; the lossy regime (undercount ≤ n/(k+1),
    * heavy-hitter retention, merge associativity) is spec-gated in
    * FrequencySketchSpec.
    */
  def heavyHittersSketchQ(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("lang"),
        explode(graft.functions.TextFunctions.tokensWs(col("text"))).as("term"))
      .groupBy(col("lang"))
      .agg(graft.functions.FrequencySketch.mgTopK(4096, 5)(col("term")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "kv")))
      .select(col("lang"), (col("pos") + 1).as("rank"),
        col("kv._1").as("term"), col("kv._2").as("cnt"))
      .orderBy(col("lang"), col("rank"))

  val heavyHittersSketchOracle: String =
    """WITH toks AS (
      |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |c AS (SELECT lang, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
      |r AS (
      |  SELECT lang, term, cnt,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, term)
      |      AS INTEGER) AS rank
      |  FROM c)
      |SELECT lang, rank, term, CAST(cnt AS BIGINT) AS cnt
      |FROM r WHERE rank <= 5
      |ORDER BY lang, rank""".stripMargin

  /** Count-min sketch ([[graft.functions.CmsAggregator]]): the point-query
    * sketch member — build one 4×64 counter matrix over all corpus tokens,
    * then estimate a fixed probe set. UNLIKE the exact-regime-gated MG
    * entry, the oracle rebuilds the SKETCH ITSELF (every md5-bucket
    * counter) and replays the min-over-rows estimates, so the gate is
    * exact even in the lossy (colliding) regime — which this narrow
    * width deliberately exercises.
    */
  private val cmsProbeTerms =
    Seq("batch", "hash", "join", "row", "scan", "zz-missing")

  def cmsCountsQ(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.FrequencySketch
    val depth = 4; val width = 64
    T(s, dir, "documents")
      .select(explode(
        graft.functions.TextFunctions.tokensWs(col("text"))).as("term"))
      .agg(FrequencySketch.cms(depth, width)(col("term")).as("sk"))
      .select(col("sk.counters").as("c"))
      .select(array(cmsProbeTerms.map(t =>
        struct(lit(t).as("term"),
          FrequencySketch.cmsEstimate(col("c"), t, depth, width)
            .cast("long").as("est"))): _*).as("a"))
      .select(explode(col("a")).as("s"))
      .select(col("s.term").as("term"), col("s.est").as("est"))
      .orderBy(col("term"))
  }

  val cmsCountsOracle: String = {
    val vals = cmsProbeTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH toks AS (
       |  SELECT unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
       |    ELSE string_split_regex(trim(text), '\\s+') END) AS term
       |  FROM documents),
       |rr AS (SELECT unnest(range(0, 4)) AS r),
       |bk AS (
       |  SELECT rr.r,
       |    CAST(('0x' || substring(md5(CAST(rr.r AS VARCHAR) || ':'
       |      || t.term), 1, 8)) AS BIGINT) % 64 AS b,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM toks t CROSS JOIN rr GROUP BY 1, 2),
       |probes AS (SELECT * FROM (VALUES $vals) p(term)),
       |pe AS (
       |  SELECT p.term, rr.r,
       |    CAST(('0x' || substring(md5(CAST(rr.r AS VARCHAR) || ':'
       |      || p.term), 1, 8)) AS BIGINT) % 64 AS b
       |  FROM probes p CROSS JOIN rr)
       |SELECT pe.term, CAST(MIN(COALESCE(bk.c, 0)) AS BIGINT) AS est
       |FROM pe LEFT JOIN bk ON bk.r = pe.r AND bk.b = pe.b
       |GROUP BY pe.term
       |ORDER BY pe.term""".stripMargin
  }

  /** Token-length histogram of the documents corpus in power-of-two
    * buckets — the packing/batch-shape planning report.
    */
  def lengthHistogramQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.lengthHistogram(
        T(s, dir, "documents"), col("text"))
      .orderBy(col("bucket"))

  val lengthHistogramOracle: String =
    """WITH d AS (
      |  SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ntok
      |  FROM documents),
      |b AS (SELECT ntok, CAST(length(bin(ntok)) - 1 AS INTEGER) AS bucket FROM d)
      |SELECT bucket, (CAST(1 AS BIGINT) << bucket) AS lo_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
      |  CAST(MAX(ntok) AS BIGINT) AS max_tokens
      |FROM b GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  /** Dataset-card summary of the documents corpus: per-language rows plus
    * the all-corpus rollup (lang = "*").
    */
  def corpusReportQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.corpusReport(
        T(s, dir, "documents"), col("lang"), col("source"), col("text"),
        shortTokens = 16)
      .orderBy(col("lang"))

  val corpusReportOracle: String =
    """WITH d AS (
      |  SELECT lang, source,
      |    len(string_split_regex(trim(text), '\s+')) AS ntok,
      |    length(text) AS nchr
      |  FROM documents)
      |SELECT CASE WHEN GROUPING(lang) = 1 THEN '*'
      |            ELSE COALESCE(lang, '<null>') END AS lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
      |  CAST(SUM(nchr) AS BIGINT) AS total_chars,
      |  SUM(ntok)::DOUBLE / COUNT(*)::DOUBLE AS avg_tokens,
      |  CAST(SUM(CASE WHEN ntok < 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
      |FROM d
      |GROUP BY ROLLUP(lang)
      |ORDER BY lang""".stripMargin

  // ------------------------------------------------- incremental near-dup dedup

  /** Continuous-ingestion near-dup dedup: docs < 250 are the admitted
    * corpus (state = band + posting tables, no text), docs >= 250 arrive as
    * a fresh batch. The batch collapses internally (components, min-id rep)
    * then reps near-matching the corpus are dropped. LSH recall is exactly
    * 1 on this corpus and verification makes precision 1 (same argument as
    * `dedup_minhash_lsh`), so the oracle is the exact-Jaccard replay.
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val state = graft.operators.Dedup.NearDupState.build(
      docs.filter(col("doc_id") < 250), col("doc_id"), col("text"))
    val (survivors, _) = graft.operators.Dedup.minHashIncremental(
      docs.filter(col("doc_id") >= 250), col("doc_id"), col("text"), state)
    survivors.select(col("doc_id")).orderBy(col("doc_id"))
  }

  val dedupIncrementalOracle: String =
    s"""WITH RECURSIVE $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  WHERE a.doc_id >= 250 AND b.doc_id >= 250
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN sets sa ON sa.doc_id = id_a
       |  JOIN sets sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) >= 0.8),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT reach.id, e.d FROM reach JOIN edges e ON e.s = reach.r),
       |nonrep AS (
       |  SELECT id FROM (SELECT id, MIN(r) AS c FROM reach GROUP BY id)
       |  WHERE c < id),
       |xc AS (
       |  SELECT b.doc_id AS fid, a.doc_id AS sid, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp
       |  WHERE a.doc_id < 250 AND b.doc_id >= 250
       |  GROUP BY 1, 2),
       |xmatch AS (
       |  SELECT DISTINCT fid FROM xc
       |  JOIN sets sa ON sa.doc_id = sid
       |  JOIN sets sb ON sb.doc_id = fid
       |  WHERE CAST(inter AS DOUBLE) / CAST(len(sa.s) + len(sb.s) - inter AS DOUBLE) >= 0.8)
       |SELECT doc_id FROM documents
       |WHERE doc_id >= 250
       |  AND doc_id NOT IN (SELECT id FROM nonrep)
       |  AND doc_id NOT IN (SELECT fid FROM xmatch)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ composite quality gate

  /** The full C4-style quality gate as one pipeline: every doc gets a
    * kept/dropped verdict plus the ordered list of rules that rejected it
    * (reason hit-rates are how thresholds get audited at scale). Thresholds
    * chosen to actually exercise the token-count, stopword, and
    * token-length rules on this corpus.
    */
  def qualityFilterQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityFilter.filterWithReasons(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        graft.operators.QualityFilter.Thresholds(
          minTokens = 20, maxTokens = 1000000,
          minStopRatio = 0.02, maxPunctRatio = 0.5,
          minMeanTokLen = 3.0, maxMeanTokLen = 5.0,
          maxDupFrac = 0.2, maxTopFrac = 0.9))
      .select(col("id").as("doc_id"), col("kept"),
        array_join(col("reasons"), ",").as("reasons"))
      .orderBy(col("doc_id"))

  val qualityFilterOracle: String =
    s"""WITH $qualityReasonsCte
       |SELECT doc_id, reasons = '' AS kept, reasons
       |FROM r
       |ORDER BY doc_id""".stripMargin

  /** The shared reason-computation CTE chain (through `r`), reused by the
    * per-doc verdict oracle above and the rule-hit-rate oracle below —
    * one definition so the two gates cannot drift.
    */
  private lazy val qualityReasonsCte: String =
    s"""t AS (
       |  SELECT doc_id, text,
       |    CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(trim(text), '\\s+') END AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id,
       |    len(toks) AS n_tok,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |              / CAST(length(text) AS DOUBLE) END AS punct_ratio,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(len(list_filter(toks, x -> list_contains($swEn, x))) AS DOUBLE)
       |              / CAST(len(toks) AS DOUBLE) END AS stop_ratio,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
       |              / CAST(len(toks) AS DOUBLE) END AS mean_tok_len
       |  FROM t
       |), segs AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\. ')) AS seg FROM documents),
       |sc AS (SELECT doc_id, seg, COUNT(*) AS n FROM segs GROUP BY 1, 2),
       |rep AS (
       |  SELECT doc_id, SUM(n) AS n_seg,
       |    CAST(SUM(n) - COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_frac,
       |    CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_frac
       |  FROM sc GROUP BY doc_id),
       |r AS (
       |  SELECT m.doc_id,
       |    concat_ws(',',
       |      CASE WHEN n_tok < 20 THEN 'too_few_tokens' END,
       |      CASE WHEN n_tok > 1000000 THEN 'too_many_tokens' END,
       |      CASE WHEN stop_ratio < 0.02 THEN 'low_stopword_ratio' END,
       |      CASE WHEN punct_ratio > 0.5 THEN 'high_punct_ratio' END,
       |      CASE WHEN mean_tok_len < 3.0 OR mean_tok_len > 5.0
       |           THEN 'mean_tok_len_out_of_range' END,
       |      CASE WHEN dup_frac > 0.2 THEN 'repeated_segments' END,
       |      CASE WHEN n_seg > 1 AND top_frac > 0.9 THEN 'dominant_segment' END
       |    ) AS reasons
       |  FROM m JOIN rep ON rep.doc_id = m.doc_id)""".stripMargin

  /** Per-rule kill audit ([[graft.operators.QualityFilter.ruleHits]]):
    * how many documents each quality rule rejects, how many it alone
    * rejects (its marginal contribution — the number that changes when
    * you relax just that threshold), and the hit rate. Same thresholds
    * and shared oracle CTEs as `quality_filter`.
    */
  def qualityRuleHitsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityFilter.ruleHits(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        graft.operators.QualityFilter.Thresholds(
          minTokens = 20, maxTokens = 1000000,
          minStopRatio = 0.02, maxPunctRatio = 0.5,
          minMeanTokLen = 3.0, maxMeanTokLen = 5.0,
          maxDupFrac = 0.2, maxTopFrac = 0.9))
      .orderBy(col("rule"))

  val qualityRuleHitsOracle: String =
    s"""WITH $qualityReasonsCte,
       |rules AS (
       |  SELECT unnest(string_split(reasons, ',')) AS rule,
       |    len(string_split(reasons, ',')) AS nr
       |  FROM r WHERE reasons <> ''),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM r)
       |SELECT rule, CAST(COUNT(*) AS BIGINT) AS n_hits,
       |  CAST(SUM(CASE WHEN nr = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_solo,
       |  tot.n_docs,
       |  CAST(COUNT(*) AS DOUBLE) / CAST(tot.n_docs AS DOUBLE) AS hit_rate
       |FROM rules CROSS JOIN tot
       |GROUP BY rule, tot.n_docs
       |ORDER BY rule""".stripMargin

  /** The END-TO-END curation flow as one oracle-checked query — what a
    * user of this engine actually runs before training: exact dedup
    * (canonical doc per identical text) → C4-style quality gate → the
    * deterministic train split → greedy 512-token sequence packing per
    * source. Every stage is an already-proven operator; the value of this
    * entry is proving the COMPOSITION end to end against one SQL replay
    * (stage boundaries are where column-contract bugs hide). All stage
    * predicates are pure functions of (doc_id, text), so the pipeline is
    * engine- and partitioning-independent by construction.
    */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val deduped = docs.join(
      graft.operators.Dedup.exact(docs, col("doc_id"), col("text"))
        .select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val quality = graft.operators.QualityFilter.filter(
      deduped, col("doc_id"), col("text"),
      graft.operators.QualityFilter.Thresholds(
        minTokens = 20, maxTokens = 1000000,
        minStopRatio = 0.02, maxPunctRatio = 0.5,
        minMeanTokLen = 3.0, maxMeanTokLen = 5.0,
        maxDupFrac = 0.2, maxTopFrac = 0.9))
    val train = graft.operators.Sampling.splitByHash(
        quality, col("doc_id"), SplitWeights)
      .filter(col("split") === "train")
    graft.operators.Packing.packGreedy(
        train.select(col("source"), col("doc_id"),
          TextFunctions.tokenCountWs(col("text")).as("n_tok")),
        col("source"), col("doc_id"), col("n_tok"), budget = 512L)
      .select(col("group").as("source"), col("ord").as("doc_id"),
        col("size").as("n_tok"), col("pack_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  val curationPipelineOracle: String = {
    val trainCut = (0.8 * 4294967296.0).toLong
    s"""WITH RECURSIVE keepers AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
       |d AS (SELECT doc.* FROM documents doc JOIN keepers k ON k.doc_id = doc.doc_id),
       |tq AS (
       |  SELECT doc_id, text,
       |    CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(trim(text), '\\s+') END AS toks
       |  FROM d),
       |m AS (
       |  SELECT doc_id,
       |    len(toks) AS n_tok,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |              / CAST(length(text) AS DOUBLE) END AS punct_ratio,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(len(list_filter(toks, x -> list_contains($swEn, x))) AS DOUBLE)
       |              / CAST(len(toks) AS DOUBLE) END AS stop_ratio,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
       |              / CAST(len(toks) AS DOUBLE) END AS mean_tok_len
       |  FROM tq),
       |segs AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\. ')) AS seg FROM d),
       |sc AS (SELECT doc_id, seg, COUNT(*) AS n FROM segs GROUP BY 1, 2),
       |rep AS (
       |  SELECT doc_id, SUM(n) AS n_seg,
       |    CAST(SUM(n) - COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_frac,
       |    CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_frac
       |  FROM sc GROUP BY doc_id),
       |q AS (
       |  SELECT m.doc_id FROM m JOIN rep ON rep.doc_id = m.doc_id
       |  WHERE n_tok >= 20 AND n_tok <= 1000000
       |    AND stop_ratio >= 0.02 AND punct_ratio <= 0.5
       |    AND mean_tok_len >= 3.0 AND mean_tok_len <= 5.0
       |    AND dup_frac <= 0.2 AND NOT (n_seg > 1 AND top_frac > 0.9)),
       |qd AS (
       |  SELECT d.* FROM d JOIN q ON q.doc_id = d.doc_id
       |  WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
       |        < $trainCut),
       |t AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       |  FROM qd),
       |r AS (
       |  SELECT source, doc_id, n_tok, rn, CAST(1 AS BIGINT) AS pack_id,
       |    n_tok AS acc
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.source, t.doc_id, t.n_tok, t.rn,
       |    CASE WHEN r.acc + t.n_tok > 512 THEN r.pack_id + 1 ELSE r.pack_id END,
       |    CASE WHEN r.acc + t.n_tok > 512 THEN t.n_tok ELSE r.acc + t.n_tok END
       |  FROM r JOIN t ON t.source = r.source AND t.rn = r.rn + 1)
       |SELECT source, doc_id, n_tok, pack_id
       |FROM r
       |ORDER BY source, doc_id""".stripMargin
  }

  // ----------------------------------------------------------- z-order layout

  /** Z-order (Morton) clustering key over (o_custkey, o_orderkey): the
    * write-layout primitive behind [[graft.operators.Layout.zorder]] —
    * sorting by this key packs each output file into a compact rectangle of
    * the two-column space so min/max stats prune scans on either column.
    * The oracle recomputes the 31-bit interleave with per-bit shifts.
    */
  def zorderKeyQ(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .filter(col("o_orderkey") <= 5000)
      .select(col("o_orderkey"),
        graft.operators.Layout.zOrderKey(col("o_custkey"), col("o_orderkey"))
          .as("z"))
      .orderBy(col("o_orderkey"))

  val zorderKeyOracle: String =
    """SELECT o_orderkey,
      |  CAST(list_reduce(list_transform(range(0, 31), i ->
      |    (((CAST(o_custkey AS BIGINT) >> i) & 1) << (2 * i)) +
      |    (((CAST(o_orderkey AS BIGINT) >> i) & 1) << (2 * i + 1))),
      |    (x, y) -> x + y) AS BIGINT) AS z
      |FROM orders
      |WHERE o_orderkey <= 5000
      |ORDER BY o_orderkey""".stripMargin

  /** Hilbert clustering key over the same two columns as [[zorderKeyQ]] —
    * the no-long-jumps curve. The oracle replays the public xy→d walk
    * level by level with a recursive CTE (per level: quadrant contribution
    * `s²·((3·rx) xor ry)`, then flip-and-swap the frame).
    */
  def hilbertKeyQ(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .filter(col("o_orderkey") <= 5000)
      .select(col("o_orderkey"),
        graft.operators.Layout.hilbertKey(col("o_custkey"), col("o_orderkey"))
          .as("h"))
      .orderBy(col("o_orderkey"))

  val hilbertKeyOracle: String =
    """WITH RECURSIVE walk AS (
      |  SELECT o_orderkey,
      |    CAST(o_custkey AS BIGINT) & 2147483647 AS x,
      |    CAST(o_orderkey AS BIGINT) & 2147483647 AS y,
      |    CAST(0 AS BIGINT) AS d, 30 AS lev
      |  FROM orders WHERE o_orderkey <= 5000
      |  UNION ALL
      |  SELECT o_orderkey,
      |    CASE WHEN ry = 0 THEN fy ELSE x END,
      |    CASE WHEN ry = 0 THEN fx ELSE y END,
      |    d + s * s * xor(3 * rx, ry),
      |    lev - 1
      |  FROM (
      |    SELECT o_orderkey, x, y, d, lev, s, rx, ry,
      |      CASE WHEN rx = 1 THEN s - 1 - x ELSE x END AS fx,
      |      CASE WHEN rx = 1 THEN s - 1 - y ELSE y END AS fy
      |    FROM (
      |      SELECT *, (CAST(1 AS BIGINT) << lev) AS s,
      |        CASE WHEN (x & (CAST(1 AS BIGINT) << lev)) > 0
      |             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS rx,
      |        CASE WHEN (y & (CAST(1 AS BIGINT) << lev)) > 0
      |             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ry
      |      FROM walk WHERE lev >= 0) t1) t2)
      |SELECT o_orderkey, d AS h FROM walk WHERE lev = -1
      |ORDER BY o_orderkey""".stripMargin

  // ----------------------------------------------------------- token counting

  /** Token-budget estimation per document: whitespace tokens next to the
    * BPE-ish regex pieces (letter runs / digit runs / single symbols) — the
    * two standard cheap proxies when a real subword tokenizer is
    * unavailable. Map-only: both counts are codegen'd regex builtins.
    */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCountWs(col("text")).cast("long").as("n_tok_ws"),
        TextFunctions.tokenCountBpe(col("text")).cast("long").as("n_tok_bpe"))
      .orderBy(col("doc_id"))

  val tokenCountsOracle: String =
    """SELECT doc_id,
      |  CAST(CASE WHEN trim(text) = '' THEN 0
      |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tok_ws,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
      |    AS n_tok_bpe
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** REAL BPE application at corpus scale: the 16-merge table learned once
    * from this corpus's word dictionary ([[graft.tools.TrainArtifacts]],
    * pinned as [[PinnedArtifacts.BpeMerges16]] — the "ship the trained
    * tokenizer as a build artifact" pattern) applied via the distinct-word
    * join. With the merge table injected, tokenization is pure exact string
    * work, so the oracle can replay it: the recursive CTE walks every
    * distinct word symbol-by-symbol through the 16 ranked greedy merge
    * passes (the same left-to-right fold as [[graft.operators.Bpe
    * .applyMerges]]), then re-aggregates token counts per document. The
    * TRAINING loop (argmax per merge) stays spec-gated: BpeSpec pins
    * `trainBpe` against an independent reference implementation.
    */
  def bpeTokenize(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.tokenizeCorpus(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        PinnedArtifacts.BpeMerges16)
      .select(col("id").as("doc_id"), col("n_tokens"))
      .orderBy(col("doc_id"))

  /** The greedy-merge-application CTE block shared by [[bpeTokenizeOracle]]
    * and [[tokenizerFertilityOracle]]: expects a `dict(word)` CTE defined
    * before it, yields `tok(word, n_sub)`. One greedy left-to-right merge
    * pass per rank: state advances one symbol per iteration (pos into
    * syms, acc = folded output); when a pass ends, acc becomes the next
    * rank's syms. rk = 17 is final.
    */
  private val bpeStepTokCte: String =
    """step(word, rk, pos, syms, acc) AS (
      |  SELECT word, 1, 1,
      |    list_append(regexp_extract_all(word, '.'), '</w>'),
      |    []::VARCHAR[]
      |  FROM dict
      |  UNION ALL
      |  SELECT word,
      |    CASE WHEN pos <= len(syms) THEN rk ELSE rk + 1 END,
      |    CASE WHEN pos <= len(syms) THEN pos + 1 ELSE 1 END,
      |    CASE WHEN pos <= len(syms) THEN syms ELSE acc END,
      |    CASE WHEN pos > len(syms) THEN []::VARCHAR[]
      |         WHEN len(acc) > 0 AND acc[-1] = m.ml AND syms[pos] = m.mr
      |         THEN list_append(array_pop_back(acc), m.ml || m.mr)
      |         ELSE list_append(acc, syms[pos]) END
      |  FROM step JOIN m ON m.mrank = step.rk
      |  WHERE step.rk <= 16),
      |tok AS (SELECT word, len(syms) AS n_sub FROM step WHERE rk = 17)""".stripMargin

  def bpeTokenizeOracle: String =
    s"""WITH RECURSIVE
       |m(mrank, ml, mr) AS (VALUES
       |${PinnedArtifacts.bpeMergesSqlValues}
       |),
       |w AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents WHERE trim(text) <> ''),
       |dict AS (SELECT DISTINCT word FROM w),
       |$bpeStepTokCte,
       |cnt AS (
       |  SELECT w.doc_id, SUM(t.n_sub) AS n
       |  FROM w JOIN tok t ON t.word = w.word
       |  GROUP BY w.doc_id)
       |SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS INTEGER) AS n_tokens
       |FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** REAL unigram-LM tokenization at corpus scale
    * ([[graft.operators.Unigram]] — SentencePiece-style, Kudo 2018): the
    * 72-piece table trained once from this corpus's word dictionary
    * ([[graft.tools.TrainArtifacts]], pinned as
    * [[PinnedArtifacts.UnigramCosts]] in FIXED-POINT costs) applied via
    * exact integer Viterbi over the distinct-word dictionary. The oracle
    * enumerates every segmentation of each distinct word with a
    * recursive CTE (UNION-deduped (word, pos, cost, n) states keep the
    * lattice polynomial) and takes the same (cost ASC, pieces ASC)
    * argmin — integer costs make the DP and the enumeration provably
    * agree where a float Viterbi would tie on the last ulp. The EM
    * TRAINING loop stays spec-gated (UnigramSpec: coverage,
    * normalization, likelihood ascent, determinism).
    */
  def unigramTokenize(s: SparkSession, dir: String): DataFrame =
    graft.operators.Unigram.tokenCounts(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        PinnedArtifacts.UnigramCosts)
      .select(col("id").as("doc_id"), col("n_tokens"))
      .orderBy(col("doc_id"))

  /** The unigram Viterbi CTE block shared by [[unigramTokenizeOracle]]
    * and [[tokenizerCompareOracle]]: expects `p(piece, plen, cost)` and
    * `dict(word)` CTEs defined before it, yields `utok(word, n_sub)`.
    * States dedupe via UNION (not UNION ALL) so equal-cost equal-count
    * lattice paths collapse instead of multiplying.
    */
  private val unigramTokCte: String =
    """ust(word, pos, cost, n) AS (
      |  SELECT word, 0, CAST(0 AS BIGINT), 0 FROM dict
      |  UNION
      |  SELECT ust.word, ust.pos + p.plen, ust.cost + p.cost, ust.n + 1
      |  FROM ust JOIN p ON substring(ust.word, ust.pos + 1, p.plen) = p.piece
      |  WHERE ust.pos < len(ust.word)),
      |ubest AS (
      |  SELECT word, n AS n_sub,
      |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY cost, n) AS rn
      |  FROM ust WHERE pos = len(word)),
      |utok AS (SELECT word, n_sub FROM ubest WHERE rn = 1)""".stripMargin

  def unigramTokenizeOracle: String =
    s"""WITH RECURSIVE
       |p(piece, plen, cost) AS (VALUES
       |${PinnedArtifacts.unigramCostsSqlValues}
       |),
       |w AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents WHERE trim(text) <> ''),
       |dict AS (SELECT DISTINCT word FROM w),
       |$unigramTokCte,
       |cnt AS (
       |  SELECT w.doc_id, SUM(t.n_sub) AS n
       |  FROM w JOIN utok t ON t.word = w.word
       |  GROUP BY w.doc_id)
       |SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_tokens
       |FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** The two-tokenizer fertility comparison `tokenizer_fertility` was
    * built for: per language, word counts against BOTH the pinned BPE
    * merge table and the pinned unigram-LM piece table — the audit a
    * vocab decision actually reads (which family spends fewer subwords
    * per word on which language). One word-dictionary pass feeds both
    * appliers; the oracle replays BOTH segmentation algorithms (greedy
    * ranked merges AND Viterbi argmin) in one WITH RECURSIVE.
    */
  def tokenizerCompare(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val bpe = graft.operators.Bpe.fertilityByGroup(
        docs, col("text"), col("lang"), PinnedArtifacts.BpeMerges16)
      .select(col("grp").as("lang"), col("n_words"),
        col("n_tokens").as("bpe_tokens"),
        col("tokens_per_word").as("bpe_per_word"))
    val uni = graft.operators.Unigram.fertilityByGroup(
        docs, col("text"), col("lang"), PinnedArtifacts.UnigramCosts)
      .select(col("grp").as("lang"),
        col("n_tokens").as("uni_tokens"),
        col("tokens_per_word").as("uni_per_word"))
    bpe.join(uni, Seq("lang"))
      .orderBy(col("lang"))
  }

  def tokenizerCompareOracle: String =
    s"""WITH RECURSIVE
       |m(mrank, ml, mr) AS (VALUES
       |${PinnedArtifacts.bpeMergesSqlValues}
       |),
       |p(piece, plen, cost) AS (VALUES
       |${PinnedArtifacts.unigramCostsSqlValues}
       |),
       |w AS (
       |  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents WHERE trim(text) <> ''),
       |dict AS (SELECT DISTINCT word FROM w),
       |$bpeStepTokCte,
       |$unigramTokCte,
       |agg AS (
       |  SELECT w.lang, COUNT(*) AS n_words,
       |    SUM(b.n_sub) AS bpe_tokens, SUM(u.n_sub) AS uni_tokens
       |  FROM w
       |  JOIN tok b ON b.word = w.word
       |  JOIN utok u ON u.word = w.word
       |  GROUP BY w.lang),
       |base AS (SELECT lang FROM documents GROUP BY lang)
       |SELECT base.lang,
       |  CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(COALESCE(a.bpe_tokens, 0) AS BIGINT) AS bpe_tokens,
       |  CASE WHEN COALESCE(a.n_words, 0) = 0 THEN 0.0
       |       ELSE CAST(a.bpe_tokens AS DOUBLE) / CAST(a.n_words AS DOUBLE)
       |  END AS bpe_per_word,
       |  CAST(COALESCE(a.uni_tokens, 0) AS BIGINT) AS uni_tokens,
       |  CASE WHEN COALESCE(a.n_words, 0) = 0 THEN 0.0
       |       ELSE CAST(a.uni_tokens AS DOUBLE) / CAST(a.n_words AS DOUBLE)
       |  END AS uni_per_word
       |FROM base LEFT JOIN agg a ON a.lang = base.lang
       |ORDER BY base.lang""".stripMargin

  /** Incremental inverted-index maintenance
    * ([[graft.operators.TextIndex.postingsIncremental]]): the state holds
    * postings for the even docs PLUS deliberately STALE postings for some
    * odd docs (their first-3-token prefix); folding in the odd-doc batch
    * must replace the stale rows and preserve the even ones — so the
    * result hash-matches a clean full-corpus posting build (the oracle)
    * ONLY if the anti-join replacement semantics are right.
    */
  def indexIncrementalQ(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val oddStale = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"),
        array_join(slice(TextFunctions.tokensWs(col("text")), 1, 3), " ")
          .as("text"))
    val state = graft.operators.TextIndex.postings(
        even, col("doc_id"), col("text"))
      .unionByName(graft.operators.TextIndex.postings(
        oddStale, col("doc_id"), col("text")))
    val batch = docs.filter(col("doc_id") % 2 === 1)
    graft.operators.TextIndex.postingsIncremental(
        state, batch, col("doc_id"), col("text"))
      .orderBy(col("doc_id"), col("term"))
  }

  val indexIncrementalOracle: String =
    """SELECT doc_id, term, COUNT(*) AS tf
      |FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |      FROM documents WHERE trim(text) <> '')
      |GROUP BY 1, 2
      |ORDER BY doc_id, term""".stripMargin

  /** The composed production retrieval path: BM25 SERVED FROM THE
    * MAINTAINED INDEX. The index is the [[indexIncrementalQ]] state (even
    * docs' postings plus deliberately STALE prefix postings for the odd
    * docs) folded with the odd-doc batch via
    * [[graft.operators.TextIndex.postingsIncremental]]; serving is
    * [[graft.operators.TextIndex.bm25TopKFromPostings]] over that folded
    * table — no corpus tokenization at query time (PlanSpec asserts the
    * serve plan over a posting table is tokenize-free; the tokenization
    * visible in THIS query's plan belongs to the in-test index build,
    * which production amortizes across ingest batches). Corpus size is the
    * maintained doc count, NOT an index-derived distinct (blank docs have
    * no postings but belong in N). The oracle is [[bm25TopkOracle]]
    * verbatim — a clean full-corpus build + BM25 — so the composition
    * hash-matches ONLY if the incremental fold's replace semantics AND
    * the served scoring are both exact.
    */
  def bm25FromIndexQ(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val oddStale = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"),
        array_join(slice(TextFunctions.tokensWs(col("text")), 1, 3), " ")
          .as("text"))
    val state = graft.operators.TextIndex.postings(
        even, col("doc_id"), col("text"))
      .unionByName(graft.operators.TextIndex.postings(
        oddStale, col("doc_id"), col("text")))
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val index = graft.operators.TextIndex.postingsIncremental(
      state, batch, col("doc_id"), col("text"))
    val corpusSize = docs.agg(count(lit(1)).as("__n"))
    val qt = docs.filter(col("doc_id") % 101 === 0 &&
        col("doc_id") < graft.Stress.IdStride)
      .select(col("doc_id").as("qid"),
        explode(slice(array_sort(array_distinct(
          filter(graft.functions.TextFunctions.tokensWs(col("text")),
            t => length(t) >= 4))), 1, 4)).as("term"))
    graft.operators.TextIndex.bm25TopKFromPostings(
        index, corpusSize, qt, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Duplicate-rate attribution per source
    * ([[graft.operators.Diagnostics.dupRateByGroup]]): corpus-wide exact
    * duplicates charged to every source that carries them. Counts and
    * one exact-ratio division — the oracle recomputes the fingerprint
    * df directly.
    */
  def dupRateBySourceQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.dupRateByGroup(
        T(s, dir, "documents"), col("source"), col("text"))
      .orderBy(col("grp"))

  val dupRateBySourceOracle: String =
    """WITH f AS (
      |  SELECT source AS grp,
      |    ('0x' || substring(md5(text), 1, 15))::BIGINT AS fp
      |  FROM documents),
      |d AS (SELECT fp, 1 AS dup FROM f GROUP BY fp HAVING COUNT(*) > 1)
      |SELECT f.grp, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN d.dup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup,
      |  CAST(SUM(CASE WHEN d.dup IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS dup_rate
      |FROM f LEFT JOIN d ON d.fp = f.fp
      |GROUP BY f.grp
      |ORDER BY f.grp""".stripMargin

  /** Character-class drift per source
    * ([[graft.operators.Diagnostics.sourceDrift]]): each source's
    * {letter, digit, whitespace, other} distribution chi-squared against
    * the corpus profile — the model-free ingestion-drift screen. Counts
    * are exact integers; the χ² chain is fixed-order two-operand IEEE
    * arithmetic, replayed verbatim by the oracle.
    */
  def sourceDriftQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.sourceDrift(
        T(s, dir, "documents"), col("source"), col("text"))
      .orderBy(col("grp"))

  val sourceDriftOracle: String =
    """WITH cl AS (
      |  SELECT source AS grp, CAST(length(text) AS BIGINT) AS n_all,
      |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
      |      AS n_letter,
      |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
      |      AS n_digit,
      |    CAST(length(regexp_replace(text, e'[^ \\t\\n\\f\\r]', '', 'g'))
      |      AS BIGINT) AS n_space
      |  FROM documents),
      |ps AS (
      |  -- CAST AS BIGINT: DuckDB SUM(BIGINT) is HUGEINT, which pandas
      |  -- renders float64 — the driver's value hash then sees 7949.0 vs
      |  -- Spark's 7949 and fails (burned in CORRECTNESS_r13)
      |  SELECT grp, CAST(SUM(n_all) AS BIGINT) AS n_chars,
      |    CAST(SUM(n_letter) AS BIGINT) AS n_letters,
      |    CAST(SUM(n_digit) AS BIGINT) AS n_digits,
      |    CAST(SUM(n_space) AS BIGINT) AS n_spaces,
      |    CAST(SUM(n_all) - SUM(n_letter) - SUM(n_digit) - SUM(n_space)
      |      AS BIGINT) AS n_other
      |  FROM cl GROUP BY 1),
      |tot AS (
      |  SELECT SUM(n_chars) AS g_all, SUM(n_letters) AS g_letter,
      |    SUM(n_digits) AS g_digit, SUM(n_spaces) AS g_space,
      |    SUM(n_other) AS g_other
      |  FROM ps)
      |SELECT grp, n_chars, n_letters, n_digits, n_spaces, n_other,
      |  CASE WHEN g_letter = 0 OR n_chars = 0 THEN 0.0
      |      ELSE (CAST(n_letters AS DOUBLE) - CAST(n_chars AS DOUBLE)
      |        * (CAST(g_letter AS DOUBLE) / CAST(g_all AS DOUBLE)))
      |        * (CAST(n_letters AS DOUBLE) - CAST(n_chars AS DOUBLE)
      |        * (CAST(g_letter AS DOUBLE) / CAST(g_all AS DOUBLE)))
      |        / (CAST(n_chars AS DOUBLE)
      |        * (CAST(g_letter AS DOUBLE) / CAST(g_all AS DOUBLE))) END
      |  + CASE WHEN g_digit = 0 OR n_chars = 0 THEN 0.0
      |      ELSE (CAST(n_digits AS DOUBLE) - CAST(n_chars AS DOUBLE)
      |        * (CAST(g_digit AS DOUBLE) / CAST(g_all AS DOUBLE)))
      |        * (CAST(n_digits AS DOUBLE) - CAST(n_chars AS DOUBLE)
      |        * (CAST(g_digit AS DOUBLE) / CAST(g_all AS DOUBLE)))
      |        / (CAST(n_chars AS DOUBLE)
      |        * (CAST(g_digit AS DOUBLE) / CAST(g_all AS DOUBLE))) END
      |  + CASE WHEN g_space = 0 OR n_chars = 0 THEN 0.0
      |      ELSE (CAST(n_spaces AS DOUBLE) - CAST(n_chars AS DOUBLE)
      |        * (CAST(g_space AS DOUBLE) / CAST(g_all AS DOUBLE)))
      |        * (CAST(n_spaces AS DOUBLE) - CAST(n_chars AS DOUBLE)
      |        * (CAST(g_space AS DOUBLE) / CAST(g_all AS DOUBLE)))
      |        / (CAST(n_chars AS DOUBLE)
      |        * (CAST(g_space AS DOUBLE) / CAST(g_all AS DOUBLE))) END
      |  + CASE WHEN g_other = 0 OR n_chars = 0 THEN 0.0
      |      ELSE (CAST(n_other AS DOUBLE) - CAST(n_chars AS DOUBLE)
      |        * (CAST(g_other AS DOUBLE) / CAST(g_all AS DOUBLE)))
      |        * (CAST(n_other AS DOUBLE) - CAST(n_chars AS DOUBLE)
      |        * (CAST(g_other AS DOUBLE) / CAST(g_all AS DOUBLE)))
      |        / (CAST(n_chars AS DOUBLE)
      |        * (CAST(g_other AS DOUBLE) / CAST(g_all AS DOUBLE))) END AS chi2
      |FROM ps CROSS JOIN tot
      |ORDER BY grp""".stripMargin

  /** Segment-level mixed-language screen
    * ([[graft.operators.QualityFilter.mixedLanguageReport]]): language-id
    * every 16-token window and report per-doc distinct-language counts,
    * primary language, and the mixed flag. The oracle replays the window
    * slicing and the stopword/CJK argmax per segment.
    */
  def mixedLanguageQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityFilter.mixedLanguageReport(
        T(s, dir, "documents"), col("doc_id"), col("text"), window = 16)
      .select(col("id").as("doc_id"), col("n_segs"), col("n_lang_segs"),
        col("n_langs"), col("primary_lang"), col("mixed"))
      .orderBy(col("doc_id"))

  val mixedLanguageOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |nn AS (SELECT doc_id, toks, len(toks) AS nt FROM t),
       |idx AS (
       |  SELECT doc_id, toks, unnest(range(0,
       |    CASE WHEN nt <= 16 THEN 1
       |         ELSE CAST(ceil((nt - 16)::DOUBLE / 16) AS BIGINT) + 1 END)) AS cid
       |  FROM nn),
       |seg AS (
       |  SELECT doc_id, toks[(cid*16+1):(cid*16+16)] AS ct,
       |    array_to_string(toks[(cid*16+1):(cid*16+16)], ' ') AS cs
       |  FROM idx),
       |sc AS (
       |  SELECT doc_id,
       |    len(list_filter(ct, x -> list_contains($swEn, x))) AS he,
       |    len(list_filter(ct, x -> list_contains($swDe, x))) AS hd,
       |    len(list_filter(ct, x -> list_contains($swEs, x))) AS hs,
       |    len(list_filter(ct, x -> list_contains($swFr, x))) AS hf,
       |    len(regexp_extract_all(cs, '[\\x{4e00}-\\x{9fff}]')) AS hz
       |  FROM seg),
       |lid AS (
       |  SELECT doc_id,
       |    CASE WHEN greatest(he, hd, hs, hf, hz) = 0 THEN 'und'
       |         WHEN he = greatest(he, hd, hs, hf, hz) THEN 'en'
       |         WHEN hd = greatest(he, hd, hs, hf, hz) THEN 'de'
       |         WHEN hs = greatest(he, hd, hs, hf, hz) THEN 'es'
       |         WHEN hf = greatest(he, hd, hs, hf, hz) THEN 'fr'
       |         ELSE 'zh' END AS lang
       |  FROM sc),
       |tot AS (SELECT doc_id, COUNT(*) AS n_segs FROM lid GROUP BY 1),
       |pl AS (SELECT doc_id, lang, COUNT(*) AS n FROM lid
       |       WHERE lang <> 'und' GROUP BY 1, 2),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_langs, SUM(n) AS n_lang_segs,
       |    FIRST(lang ORDER BY n DESC, lang) AS primary_lang
       |  FROM pl GROUP BY 1)
       |SELECT tot.doc_id, tot.n_segs,
       |  CAST(COALESCE(a.n_lang_segs, 0) AS BIGINT) AS n_lang_segs,
       |  CAST(COALESCE(a.n_langs, 0) AS BIGINT) AS n_langs,
       |  COALESCE(a.primary_lang, 'und') AS primary_lang,
       |  COALESCE(a.n_langs, 0) >= 2 AS mixed
       |FROM tot LEFT JOIN agg a ON a.doc_id = tot.doc_id
       |ORDER BY tot.doc_id""".stripMargin

  /** Pairwise source vocabulary affinity
    * ([[graft.operators.Diagnostics.sourceAffinity]]): exact-integer
    * cosine between term-count vectors of every source pair — the
    * mixture-design diagnostic. Integer dot/norm sums are order-free, so
    * no fold gymnastics are needed; the oracle recomputes the same counts
    * and the same two sqrts + divide.
    */
  def sourceAffinityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.sourceAffinity(
        T(s, dir, "documents"), col("source"), col("text"))
      .orderBy(col("grp_a"), col("grp_b"))

  val sourceAffinityOracle: String =
    """WITH w AS (
      |  SELECT source AS grp,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents WHERE trim(text) <> ''),
      |c AS (SELECT grp, term, COUNT(*) AS c FROM w GROUP BY 1, 2),
      |n AS (SELECT grp, SUM(c * c) AS n2 FROM c GROUP BY 1),
      |d AS (
      |  SELECT a.grp AS ga, b.grp AS gb, SUM(a.c * b.c) AS dot
      |  FROM c a JOIN c b ON a.term = b.term AND a.grp < b.grp
      |  GROUP BY 1, 2)
      |SELECT na.grp AS grp_a, nb.grp AS grp_b,
      |  CAST(COALESCE(d.dot, 0) AS BIGINT) AS dot,
      |  CAST(COALESCE(d.dot, 0) AS DOUBLE)
      |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
      |FROM n na JOIN n nb ON na.grp < nb.grp
      |LEFT JOIN d ON d.ga = na.grp AND d.gb = nb.grp
      |ORDER BY grp_a, grp_b""".stripMargin

  /** Length-curriculum sharding ([[graft.operators.Layout.curriculumShards]]):
    * 4 shards cut at the token-count quartiles from ONE mergeable KLL
    * aggregation (exact at this n; rank-bounded beyond the sketch buffer),
    * then a map-only membership count — no corpus-wide ntile() window.
    * The oracle recomputes the discrete quartiles and the same
    * boundary-to-lower-shard assignment.
    */
  def curriculumShardsQ(s: SparkSession, dir: String): DataFrame = {
    val scored = T(s, dir, "documents").select(col("doc_id"),
      TextFunctions.tokenCountWs(col("text")).cast("long").as("n_tok"))
    graft.operators.Layout.curriculumShards(
        scored, col("doc_id"), col("n_tok"), numShards = 4)
      .select(col("id").as("doc_id"), col("score").as("n_tok"), col("shard"))
      .orderBy(col("doc_id"))
  }

  val curriculumShardsOracle: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
      |      AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT quantile_disc(CAST(n_tok AS DOUBLE), 0.25) AS q1,
      |         quantile_disc(CAST(n_tok AS DOUBLE), 0.5) AS q2,
      |         quantile_disc(CAST(n_tok AS DOUBLE), 0.75) AS q3
      |  FROM s)
      |SELECT doc_id, n_tok,
      |  CAST((CASE WHEN CAST(n_tok AS DOUBLE) > q1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN CAST(n_tok AS DOUBLE) > q2 THEN 1 ELSE 0 END)
      |     + (CASE WHEN CAST(n_tok AS DOUBLE) > q3 THEN 1 ELSE 0 END)
      |    AS INTEGER) AS shard
      |FROM s CROSS JOIN c
      |ORDER BY doc_id""".stripMargin

  /** Tokenizer fertility audit per language over the same pinned 16-merge
    * table: tokens-per-word and chars-per-token by lang — the check that a
    * candidate tokenizer doesn't starve some language of effective context.
    * The oracle replays the merge walk over the distinct-word dictionary
    * (shared [[bpeStepTokCte]]) and re-aggregates per lang; the ratios are
    * single IEEE divisions of exact integer sums.
    */
  def tokenizerFertility(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.fertilityByGroup(
        T(s, dir, "documents"), col("text"), col("lang"),
        PinnedArtifacts.BpeMerges16)
      .select(col("grp").as("lang"), col("n_docs"), col("n_chars"),
        col("n_words"), col("n_tokens"),
        col("tokens_per_word"), col("chars_per_token"))
      .orderBy(col("lang"))

  def tokenizerFertilityOracle: String =
    s"""WITH RECURSIVE
       |m(mrank, ml, mr) AS (VALUES
       |${PinnedArtifacts.bpeMergesSqlValues}
       |),
       |w AS (
       |  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents WHERE trim(text) <> ''),
       |dict AS (SELECT DISTINCT word FROM w),
       |$bpeStepTokCte,
       |agg AS (
       |  SELECT w.lang, COUNT(*) AS n_words, SUM(t.n_sub) AS n_tokens
       |  FROM w JOIN tok t ON t.word = w.word
       |  GROUP BY w.lang),
       |base AS (
       |  SELECT lang, COUNT(*) AS n_docs, SUM(length(text)) AS n_chars
       |  FROM documents GROUP BY lang)
       |SELECT b.lang, b.n_docs, CAST(b.n_chars AS BIGINT) AS n_chars,
       |  CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CASE WHEN COALESCE(a.n_words, 0) = 0 THEN 0.0
       |       ELSE CAST(a.n_tokens AS DOUBLE) / CAST(a.n_words AS DOUBLE) END
       |    AS tokens_per_word,
       |  CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0.0
       |       ELSE CAST(b.n_chars AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) END
       |    AS chars_per_token
       |FROM base b LEFT JOIN agg a ON a.lang = b.lang
       |ORDER BY b.lang""".stripMargin

  // ------------------------------------------------------ fuzzy (linkage) join

  /** Two-table fuzzy join across the corpus halves (doc_id < 250 vs >= 250):
    * cross-half near-duplicate pairs at word-3-shingle Jaccard >= 0.9 — the
    * record-linkage shape over the same planted near-dups the self-join
    * queries use, but via [[Dedup.jaccardJoin]]'s two-sided posting join.
    */
  def fuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    graft.operators.Dedup.jaccardJoin(
        docs.filter(col("doc_id") < 250), col("doc_id"), col("text"),
        docs.filter(col("doc_id") >= 250), col("doc_id"), col("text"),
        shingleK = 3, threshold = 0.9)
      .orderBy(col("left_id"), col("right_id"))
  }

  val fuzzyJoinOracle: String =
    s"""WITH $shingleSetsSql,
       |l AS (SELECT doc_id, s FROM sets WHERE doc_id < 250),
       |r AS (SELECT doc_id, s FROM sets WHERE doc_id >= 250),
       |lp AS (SELECT doc_id, unnest(s) AS sp FROM l),
       |rp AS (SELECT doc_id, unnest(s) AS sp FROM r),
       |pairs AS (
       |  SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS inter
       |  FROM lp a JOIN rp b ON a.sp = b.sp
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT left_id, right_id,
       |    CAST(inter AS DOUBLE) /
       |      CAST(len(sl.s) + len(sr.s) - inter AS DOUBLE) AS jaccard
       |  FROM pairs
       |  JOIN l sl ON sl.doc_id = left_id
       |  JOIN r sr ON sr.doc_id = right_id)
       |SELECT left_id, right_id, jaccard
       |FROM scored
       |WHERE jaccard >= 0.9
       |ORDER BY left_id, right_id""".stripMargin

  // --------------------------------------------- repeated-substring removal

  /** Cross-document repeated-substring spans (64-char tiles, stride 32,
    * >= 2 distinct docs): per-doc merged-span count and duplicated/surviving
    * character counts. The oracle replays tiling, the 60-bit md5
    * fingerprint, cross-doc df, and the lag-based interval merge in SQL.
    */
  def repeatedSubstrings(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.repeatedSpanStats(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        window = 64, stride = 32, minDocs = 2)
      .select(col("id").as("doc_id"), col("n_spans"), col("removed_chars"),
        col("kept_chars"))
      .orderBy(col("doc_id"))

  val repeatedSubstringsOracle: String =
    """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
      |tile AS (
      |  SELECT doc_id, text, unnest(range(0, len - 64 + 1, 32)) AS p
      |  FROM t WHERE len >= 64),
      |fp AS (
      |  SELECT doc_id, p,
      |    ('0x' || substring(md5(substr(text, CAST(p + 1 AS INT), 64)), 1, 15))::BIGINT AS f
      |  FROM tile),
      |dup AS (SELECT f FROM fp GROUP BY f HAVING COUNT(DISTINCT doc_id) >= 2),
      |hit AS (SELECT doc_id, p FROM fp WHERE f IN (SELECT f FROM dup)),
      |fl AS (
      |  SELECT doc_id, p,
      |    CASE WHEN p > COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p),
      |                           -128) + 64
      |         THEN 1 ELSE 0 END AS nw
      |  FROM hit),
      |cl AS (SELECT doc_id, p,
      |         SUM(nw) OVER (PARTITION BY doc_id ORDER BY p) AS cid
      |       FROM fl),
      |sp AS (SELECT doc_id, MIN(p) AS s, MAX(p) + 64 AS e
      |       FROM cl GROUP BY doc_id, cid),
      |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
      |          CAST(SUM(e - s) AS BIGINT) AS removed
      |        FROM sp GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(a.n_spans, CAST(0 AS BIGINT)) AS n_spans,
      |  COALESCE(a.removed, CAST(0 AS BIGINT)) AS removed_chars,
      |  CAST(length(d.text) AS BIGINT) - COALESCE(a.removed, CAST(0 AS BIGINT))
      |    AS kept_chars
      |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------ preference aggregation

  /** Pairwise-preference aggregation ([[graft.operators.Preference.winRates]]):
    * comparison ballots are derived deterministically — each doc is
    * compared against the next three doc ids, the longer text wins (the
    * earlier id on ties) — then collapsed to per-item wins/losses,
    * win-rate, and the Wilson 95% lower bound, the ranking key a reward-
    * data pipeline sorts by. The z and z² constants are interpolated from
    * the same Scala doubles the operator uses, so the fixed-order IEEE
    * chain replays bit-for-bit.
    */
  /** The shared comparison-ballot fixture of `preference_report` and
    * `preference_bt_strength`: each doc vs the next three doc ids, the
    * longer text wins (earlier id on ties). Both oracles replay THIS
    * derivation — change it here and in both SQL texts together.
    */
  private def prefBallots(s: SparkSession, dir: String): DataFrame = {
    val d = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val shifts = s.range(1, 4).select(col("id").as("shift"))
    val pairs = d.select(col("doc_id").as("a_id"), col("n_chars").as("a_n"))
      .crossJoin(broadcast(shifts))
      .withColumn("b_id", col("a_id") + col("shift"))
      .join(d.select(col("doc_id").as("b_id"), col("n_chars").as("b_n")),
        "b_id")
    pairs.select(
      when(col("b_n") > col("a_n"), col("b_id")).otherwise(col("a_id"))
        .as("win"),
      when(col("b_n") > col("a_n"), col("a_id")).otherwise(col("b_id"))
        .as("lose"))
  }

  /** Verbosity-bias audit ([[graft.operators.Preference.lengthBias]]):
    * ballots decided by CONTENT (the lexicographically larger md5 of the
    * text wins — length-independent by construction, unlike the
    * length-decided `preference_report` fixture where the rate would be
    * a degenerate 1.0), then each ballot joined to the items' n_chars
    * and scored for which side was longer. The oracle replays the md5
    * decision, both length joins, and the tie-excluded rate.
    */
  def preferenceLengthBiasQ(s: SparkSession, dir: String): DataFrame = {
    val d = T(s, dir, "documents")
    val dd = d.select(col("doc_id"), md5(col("text")).as("h"))
    val shifts = s.range(1, 4).select(col("id").as("shift"))
    val pairs = dd.select(col("doc_id").as("a_id"), col("h").as("a_h"))
      .crossJoin(broadcast(shifts))
      .withColumn("b_id", col("a_id") + col("shift"))
      .join(dd.select(col("doc_id").as("b_id"), col("h").as("b_h")), "b_id")
    val ballots = pairs.select(
      when(col("b_h") > col("a_h"), col("b_id")).otherwise(col("a_id"))
        .as("win"),
      when(col("b_h") > col("a_h"), col("a_id")).otherwise(col("b_id"))
        .as("lose"))
    graft.operators.Preference.lengthBias(ballots, col("win"), col("lose"),
      d, col("doc_id"), col("n_chars"))
  }

  val preferenceLengthBiasOracle: String =
    """WITH s(shift) AS (VALUES (1), (2), (3)),
      |d AS (SELECT doc_id, md5(text) AS h, n_chars FROM documents),
      |p AS (
      |  SELECT a.doc_id AS a_id, a.h AS a_h, b.doc_id AS b_id, b.h AS b_h
      |  FROM d a JOIN s ON TRUE
      |  JOIN d b ON b.doc_id = a.doc_id + s.shift),
      |bl AS (
      |  SELECT CASE WHEN b_h > a_h THEN b_id ELSE a_id END AS w,
      |    CASE WHEN b_h > a_h THEN a_id ELSE b_id END AS l
      |  FROM p),
      |j AS (
      |  SELECT dw.n_chars AS wlen, dl.n_chars AS llen
      |  FROM bl LEFT JOIN d dw ON dw.doc_id = bl.w
      |  LEFT JOIN d dl ON dl.doc_id = bl.l),
      |g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_ballots,
      |    CAST(SUM(CASE WHEN wlen IS NULL OR llen IS NULL THEN 1 ELSE 0
      |      END) AS BIGINT) AS n_unmatched,
      |    CAST(SUM(CASE WHEN wlen > llen THEN 1 ELSE 0 END) AS BIGINT)
      |      AS longer_wins,
      |    CAST(SUM(CASE WHEN wlen < llen THEN 1 ELSE 0 END) AS BIGINT)
      |      AS shorter_wins,
      |    CAST(SUM(CASE WHEN wlen = llen THEN 1 ELSE 0 END) AS BIGINT)
      |      AS len_ties
      |  FROM j)
      |SELECT n_ballots, n_unmatched, longer_wins, shorter_wins, len_ties,
      |  CASE WHEN longer_wins + shorter_wins = 0 THEN NULL
      |       ELSE CAST(longer_wins AS DOUBLE)
      |         / CAST(longer_wins + shorter_wins AS DOUBLE)
      |  END AS longer_win_rate
      |FROM g""".stripMargin

  def preferenceReportQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Preference.winRates(prefBallots(s, dir), col("win"),
        col("lose"))
      .orderBy(col("item"))

  private val wilsonZ = 1.96
  private val wilsonZz = wilsonZ * wilsonZ

  val preferenceReportOracle: String =
    s"""WITH s(shift) AS (VALUES (1), (2), (3)),
       |p AS (
       |  SELECT a.doc_id AS a_id, a.n_chars AS a_n,
       |    b.doc_id AS b_id, b.n_chars AS b_n
       |  FROM documents a JOIN s ON TRUE
       |  JOIN documents b ON b.doc_id = a.doc_id + s.shift),
       |v AS (
       |  SELECT CASE WHEN b_n > a_n THEN b_id ELSE a_id END AS item, 1 AS w
       |  FROM p
       |  UNION ALL
       |  SELECT CASE WHEN b_n > a_n THEN a_id ELSE b_id END AS item, 0 AS w
       |  FROM p),
       |g AS (
       |  SELECT item, CAST(SUM(w) AS BIGINT) AS wins,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM v GROUP BY 1),
       |r AS (
       |  SELECT item, wins, n - wins AS losses, n,
       |    CAST(wins AS DOUBLE) / CAST(n AS DOUBLE) AS win_rate,
       |    CAST('$wilsonZz' AS DOUBLE) AS zz,
       |    CAST('$wilsonZ' AS DOUBLE) AS z,
       |    CAST(n AS DOUBLE) AS nd
       |  FROM g)
       |SELECT item, wins, losses, n, win_rate,
       |  ((win_rate + zz / (2.0 * nd))
       |   - z * sqrt((win_rate * (1.0 - win_rate) + zz / (4.0 * nd)) / nd))
       |  / (1.0 + zz / nd) AS wilson_lb
       |FROM r
       |ORDER BY item""".stripMargin

  // ------------------------------------------------ Bradley–Terry strengths

  /** DPO training-pair assembly ([[graft.operators.Preference.dpoPairs]]):
    * docs grouped 8-per-prompt as response candidates, within-group
    * shifted-pair ballots decided by the PAIR hash's parity
    * (non-transitive by construction, so within-prompt win rates are
    * non-degenerate — a single global order would pin every chosen_rate
    * at 1.0), collapsed to one (prompt, chosen, rejected) record per
    * prompt with the minMargin = 0.5 data-quality cut (keeps 53-56 of
    * 63 prompts at the driver SFs — the gate sees both kept and dropped
    * prompts). Texts ride in by id join; the oracle replays the ballot
    * derivation, the per-item rates, both arg-extremes with the operator's
    * tie-break (low id for chosen, high id for rejected), and the margin
    * filter.
    */
  /** The shared (doc-id-hash dimension, ballots) fixture of `dpo_pairs`
    * and `dpo_from_counts` — both oracles replay THIS derivation.
    */
  private def dpoFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val dd = T(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
    val shifts = s.range(1, 4).select(col("id").as("shift"))
    val pairs = dd.select(col("doc_id").as("a_id"), col("h").as("a_h"))
      .crossJoin(broadcast(shifts))
      .withColumn("b_id", col("a_id") + col("shift"))
      .filter(expr("a_id div 8") === expr("b_id div 8"))
      .join(dd.select(col("doc_id").as("b_id"), col("h").as("b_h")), "b_id")
    val aWins = conv(substring(md5(concat(col("a_h"), col("b_h"))), 1, 8),
      16, 10).cast("long") % 2 === 0L
    val ballots = pairs.select(
      expr("a_id div 8").as("prompt"),
      when(aWins, col("a_id")).otherwise(col("b_id")).as("win"),
      when(aWins, col("b_id")).otherwise(col("a_id")).as("lose"))
    (dd, ballots)
  }

  /** Texts ride back into the pair records by id join; output narrowed
    * to the md5s so the gate value-checks the full record assembly.
    */
  private def dpoRecordize(dd: DataFrame, recs: DataFrame): DataFrame =
    recs
      .join(dd.toDF("chosen", "chosen_md5"), Seq("chosen"))
      .join(dd.toDF("rejected", "rejected_md5"), Seq("rejected"))
      .select(col("prompt"), col("chosen"), col("rejected"),
        col("chosen_rate"), col("rejected_rate"), col("margin"),
        col("n_ballots"), col("chosen_md5"), col("rejected_md5"))
      .orderBy(col("prompt"))

  def dpoPairsQ(s: SparkSession, dir: String): DataFrame = {
    val (dd, ballots) = dpoFixture(s, dir)
    dpoRecordize(dd, graft.operators.Preference.dpoPairs(ballots,
      col("prompt"), col("win"), col("lose"), minMargin = 0.5))
  }

  /** The composed production shape: DPO pairs SERVED FROM THE MAINTAINED
    * COUNT STATE. The same ballot fixture streams through the REAL
    * [[graft.streaming.Streams.DpoIngest]] in two micro-batches (split
    * by winner parity — any split works, the count fold is additive);
    * `pairs()` then derives the records from the folded state. The
    * oracle is [[dpoPairsOracle]] VERBATIM — a clean one-shot build —
    * so the composition hash-matches only if the additive fold, the
    * scaffold's pin/replay lifecycle, and the served derivation are all
    * exact (the bm25_from_index pattern).
    */
  def dpoFromCountsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (dd, ballots) = dpoFixture(s, dir)
    val state0 = Seq.empty[(Long, Long, Long, Long)]
      .toDF("prompt", "item", "wins", "n")
    val ing = new graft.streaming.Streams.DpoIngest(state0,
      col("prompt"), col("win"), col("lose"))
    ing.handler(ballots.filter(col("win") % 2 === 0), 0L)
    ing.handler(ballots.filter(col("win") % 2 === 1), 1L)
    dpoRecordize(dd, ing.pairs(minMargin = 0.5))
  }

  val dpoPairsOracle: String =
    """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
      |s(shift) AS (VALUES (1), (2), (3)),
      |p AS (
      |  SELECT a.doc_id AS a_id, a.h AS a_h, b.doc_id AS b_id, b.h AS b_h
      |  FROM d a JOIN s ON TRUE
      |  JOIN d b ON b.doc_id = a.doc_id + s.shift
      |  WHERE a.doc_id // 8 = b.doc_id // 8),
      |bl AS (
      |  SELECT a_id // 8 AS prompt,
      |    CASE WHEN ('0x' || substring(md5(a_h || b_h), 1, 8))::BIGINT
      |      % 2 = 0 THEN a_id ELSE b_id END AS w,
      |    CASE WHEN ('0x' || substring(md5(a_h || b_h), 1, 8))::BIGINT
      |      % 2 = 0 THEN b_id ELSE a_id END AS l
      |  FROM p),
      |u AS (SELECT prompt, w AS item, 1 AS bit FROM bl
      |      UNION ALL SELECT prompt, l, 0 FROM bl),
      |pi AS (
      |  SELECT prompt, item,
      |    CAST(SUM(bit) AS DOUBLE) / COUNT(*) AS rate
      |  FROM u GROUP BY 1, 2),
      |ch AS (
      |  SELECT prompt, item AS chosen, rate AS chosen_rate,
      |    ROW_NUMBER() OVER (PARTITION BY prompt
      |      ORDER BY rate DESC, item ASC) AS rn
      |  FROM pi),
      |rj AS (
      |  SELECT prompt, item AS rejected, rate AS rejected_rate,
      |    ROW_NUMBER() OVER (PARTITION BY prompt
      |      ORDER BY rate ASC, item DESC) AS rn
      |  FROM pi),
      |nb AS (SELECT prompt, CAST(COUNT(*) AS BIGINT) AS n_ballots
      |       FROM bl GROUP BY 1),
      |recs AS (
      |  SELECT ch.prompt, chosen, rejected, chosen_rate, rejected_rate,
      |    chosen_rate - rejected_rate AS margin, nb.n_ballots
      |  FROM ch
      |  JOIN rj ON ch.prompt = rj.prompt AND rj.rn = 1
      |  JOIN nb ON nb.prompt = ch.prompt
      |  WHERE ch.rn = 1 AND chosen <> rejected
      |    AND chosen_rate - rejected_rate >= 0.5)
      |SELECT CAST(recs.prompt AS BIGINT) AS prompt, chosen, rejected,
      |  chosen_rate, rejected_rate, margin, n_ballots,
      |  dc.h AS chosen_md5, dr.h AS rejected_md5
      |FROM recs
      |JOIN d dc ON dc.doc_id = recs.chosen
      |JOIN d dr ON dr.doc_id = recs.rejected
      |ORDER BY prompt""".stripMargin

  /** Bradley–Terry strength fitting
    * ([[graft.operators.Preference.btStrengths]]) over the same ballot
    * fixture as `preference_report` — two MM iterations in fixed-point
    * integer arithmetic, replayed by the oracle as two unrolled CTE
    * rounds (HUGEINT carries the win-total numerator the engine holds in
    * DECIMAL(38,0)).
    */
  def preferenceBtStrengthQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Preference.btStrengths(prefBallots(s, dir), col("win"),
        col("lose"), iters = 2)
      .orderBy(col("item"))

  val preferenceBtStrengthOracle: String =
    """WITH s(shift) AS (VALUES (1), (2), (3)),
      |p AS (
      |  SELECT a.doc_id AS a_id, a.n_chars AS a_n,
      |    b.doc_id AS b_id, b.n_chars AS b_n
      |  FROM documents a JOIN s ON TRUE
      |  JOIN documents b ON b.doc_id = a.doc_id + s.shift),
      |v AS (
      |  SELECT CASE WHEN b_n > a_n THEN b_id ELSE a_id END AS item,
      |    CASE WHEN b_n > a_n THEN a_id ELSE b_id END AS opp, 1 AS w
      |  FROM p
      |  UNION ALL
      |  SELECT CASE WHEN b_n > a_n THEN a_id ELSE b_id END,
      |    CASE WHEN b_n > a_n THEN b_id ELSE a_id END, 0
      |  FROM p),
      |ord AS (
      |  SELECT item, opp, CAST(COUNT(*) AS BIGINT) AS n_io,
      |    CAST(SUM(w) AS BIGINT) AS w_io
      |  FROM v GROUP BY 1, 2),
      |wins AS (
      |  SELECT item, CAST(SUM(w_io) AS BIGINT) AS wins,
      |    CAST(SUM(n_io) AS BIGINT) AS n
      |  FROM ord GROUP BY 1),
      |s0 AS (SELECT item, CAST(1000000000 AS BIGINT) AS s FROM wins),
      |d1 AS (
      |  SELECT o.item,
      |    CAST(SUM(o.n_io * 1000000000000000 // (si.s + so.s)) AS BIGINT)
      |      AS d
      |  FROM ord o JOIN s0 si ON si.item = o.item
      |  JOIN s0 so ON so.item = o.opp
      |  GROUP BY 1),
      |s1 AS (
      |  SELECT w.item, GREATEST(1, CAST(
      |    CAST(w.wins AS HUGEINT) * 1000000000000000 // d1.d AS BIGINT))
      |    AS s
      |  FROM wins w JOIN d1 ON d1.item = w.item),
      |d2 AS (
      |  SELECT o.item,
      |    CAST(SUM(o.n_io * 1000000000000000 // (si.s + so.s)) AS BIGINT)
      |      AS d
      |  FROM ord o JOIN s1 si ON si.item = o.item
      |  JOIN s1 so ON so.item = o.opp
      |  GROUP BY 1),
      |s2 AS (
      |  SELECT w.item, GREATEST(1, CAST(
      |    CAST(w.wins AS HUGEINT) * 1000000000000000 // d2.d AS BIGINT))
      |    AS s
      |  FROM wins w JOIN d2 ON d2.item = w.item)
      |SELECT w.item, w.wins, w.n - w.wins AS losses, w.n,
      |  s2.s AS strength_fp
      |FROM wins w JOIN s2 ON s2.item = w.item
      |ORDER BY w.item""".stripMargin

  // ------------------------------------------------ conversion attribution

  /** Session-scoped first/last-touch attribution
    * ([[graft.operators.EventAnalytics.conversionAttribution]]):
    * purchases attributed to the first and last non-purchase event
    * earlier in their 30-minute-gap session, counted per touch type.
    * The oracle replays the session cumsum and the IGNORE NULLS window
    * frames exactly.
    */
  def conversionAttributionQ(s: SparkSession, dir: String): DataFrame = {
    val e = T.events(s, dir)
    graft.operators.EventAnalytics.conversionAttribution(
        e, col("user_id"), col("ts"), col("event_type"), col("event_id"),
        col("event_type") === "purchase")
      .orderBy(col("touch_type"))
  }

  val conversionAttributionOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) * 1000 AS tsn,
      |    event_type AS et
      |  FROM events),
      |sflag AS (
      |  SELECT user_id, event_id, tsn, et,
      |    CASE WHEN LAG(tsn) OVER w IS NULL
      |           OR tsn - LAG(tsn) OVER w > 1800000000000
      |         THEN 1 ELSE 0 END AS nw
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
      |sess AS (
      |  SELECT *, SUM(nw) OVER (PARTITION BY user_id
      |    ORDER BY tsn, event_id) AS sid
      |  FROM sflag),
      |att AS (
      |  SELECT et,
      |    FIRST_VALUE(CASE WHEN et <> 'purchase' THEN et END IGNORE NULLS)
      |      OVER ws AS ft,
      |    LAST_VALUE(CASE WHEN et <> 'purchase' THEN et END IGNORE NULLS)
      |      OVER ws AS lt
      |  FROM sess
      |  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY tsn, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |c AS (
      |  SELECT COALESCE(ft, '(none)') AS ft, COALESCE(lt, '(none)') AS lt
      |  FROM att WHERE et = 'purchase'),
      |f AS (SELECT ft AS touch_type, COUNT(*) AS n_first_touch
      |      FROM c GROUP BY 1),
      |l AS (SELECT lt AS touch_type, COUNT(*) AS n_last_touch
      |      FROM c GROUP BY 1)
      |SELECT COALESCE(f.touch_type, l.touch_type) AS touch_type,
      |  COALESCE(f.n_first_touch, 0) AS n_first_touch,
      |  COALESCE(l.n_last_touch, 0) AS n_last_touch
      |FROM f FULL OUTER JOIN l ON f.touch_type = l.touch_type
      |ORDER BY touch_type""".stripMargin

  // ------------------------------------------------ event volume anomaly

  /** Trailing-window volume anomaly screen
    * ([[graft.operators.EventAnalytics.eventAnomaly]]): each (event_type,
    * day) count z-scored against its 7 prior observed days. Counts and
    * frame sums are exact; the mean/var/z chain replays in fixed order
    * with the variance floored at 0 and a NULL z on constant priors.
    */
  def eventAnomalyQ(s: SparkSession, dir: String): DataFrame = {
    val e = T.events(s, dir)
    graft.operators.EventAnalytics.eventAnomaly(
        e, col("event_type"), col("ts"))
      .orderBy(col("event_type"), col("day"))
  }

  val eventAnomalyOracle: String =
    """WITH daily AS (
      |  SELECT event_type, (epoch_us(ts) * 1000) // 86400000000000 AS day,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |f AS (
      |  SELECT event_type, day, n_events,
      |    COUNT(*) OVER w AS np,
      |    CAST(SUM(n_events) OVER w AS BIGINT) AS s,
      |    CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS s2
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |m AS (
      |  SELECT event_type, day, n_events,
      |    CAST(s AS DOUBLE) / 7.0 AS mean_prior,
      |    sqrt(GREATEST(0.0,
      |      (CAST(s2 AS DOUBLE)
      |       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 7.0) / (7.0 - 1.0)))
      |      AS std_prior
      |  FROM f WHERE np = 7)
      |SELECT event_type, day, n_events, mean_prior, std_prior,
      |  CASE WHEN std_prior > 0
      |    THEN (CAST(n_events AS DOUBLE) - mean_prior) / std_prior END AS z
      |FROM m
      |ORDER BY event_type, day""".stripMargin

  // ------------------------------------------------ robust group stats

  /** Winsorized per-source length statistics
    * ([[graft.operators.Diagnostics.robustStats]]): exact discrete
    * p05/p50/p95 plus the mean of values clamped into [p05, p95] — the
    * outlier-resistant dashboard row. Percentiles, the integer clamp,
    * and the one final division all replay exactly.
    */
  def robustStatsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.robustStats(
        T(s, dir, "documents"), col("source"), col("n_chars"))
      .orderBy(col("grp"))

  val robustStatsOracle: String =
    """WITH p AS (
      |  SELECT source AS grp,
      |    quantile_disc(n_chars, 0.05) AS p_lo,
      |    quantile_disc(n_chars, 0.5) AS p50,
      |    quantile_disc(n_chars, 0.95) AS p_hi
      |  FROM documents GROUP BY 1),
      |j AS (
      |  SELECT d.source AS grp, p.p_lo, p.p50, p.p_hi,
      |    GREATEST(p.p_lo, LEAST(p.p_hi, d.n_chars)) AS w
      |  FROM documents d JOIN p ON p.grp = d.source)
      |SELECT grp, COUNT(*) AS n, p_lo, p50, p_hi,
      |  CAST(SUM(w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS wins_mean
      |FROM j GROUP BY grp, p_lo, p50, p_hi
      |ORDER BY grp""".stripMargin

  // ------------------------------------------------ annotator agreement

  /** Cohen's kappa ([[graft.operators.Diagnostics.cohenKappa]]) between
    * the embeddings table's label column and a deterministically
    * perturbed second annotator (every 7th item shifted one class) — the
    * inter-annotator QC gate. One row; the marginal cross-product and the
    * p_o/p_e/κ chain replay exactly.
    */
  def annotatorAgreementQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.cohenKappa(
      T(s, dir, "embeddings"), col("label"),
      when(pmod(col("vec_id"), lit(7L)) === 0,
        pmod(col("label") + 1, lit(10))).otherwise(col("label")))

  val annotatorAgreementOracle: String =
    """WITH t AS (
      |  SELECT CAST(label AS VARCHAR) AS la,
      |    CAST(CASE WHEN vec_id % 7 = 0 THEN (label + 1) % 10 ELSE label END
      |      AS VARCHAR) AS lb
      |  FROM embeddings),
      |tot AS (
      |  SELECT COUNT(*) AS n_items,
      |    CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
      |  FROM t),
      |ma AS (SELECT la, COUNT(*) AS ca FROM t GROUP BY 1),
      |mb AS (SELECT lb, COUNT(*) AS cb FROM t GROUP BY 1),
      |x AS (
      |  SELECT COALESCE(SUM(CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT)),
      |    0) AS exp_prod
      |  FROM ma JOIN mb ON ma.la = mb.lb),
      |r AS (
      |  SELECT n_items, n_agree,
      |    CAST(n_agree AS DOUBLE) / CAST(n_items AS DOUBLE) AS p_o,
      |    CAST(exp_prod AS DOUBLE)
      |      / (CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE)) AS p_e
      |  FROM tot, x)
      |SELECT n_items, n_agree, p_o, p_e,
      |  (p_o - p_e) / (1.0 - p_e) AS kappa
      |FROM r""".stripMargin

  // ------------------------------------------------ markup stripping

  /** Markup stripping ([[graft.functions.TextFunctions.stripMarkup]]):
    * each doc is wrapped in deterministic HTML with attribute-bearing
    * tags, one-level-escaped entities, and a double-escaped `&amp;amp;`
    * (which must decode to the literal `&amp;`, not `&`), then stripped.
    * Output fingerprints the cleaned text; raw/clean lengths catch
    * off-by-one whitespace handling the md5 alone would hide.
    */
  def textStripMarkupQ(s: SparkSession, dir: String): DataFrame = {
    val html = concat(lit("<div class=\""), col("source"),
      lit("\"><p>&quot;"), col("text"),
      lit("&quot; &amp;amp; x &lt;tag&gt;</p>\n<br/>&nbsp;</div>"))
    val clean = TextFunctions.stripMarkup(html)
    T(s, dir, "documents")
      .select(col("doc_id"), length(html).as("len_raw"),
        length(clean).as("len_clean"), md5(clean).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val textStripMarkupOracle: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<div class="' || source || '"><p>&quot;' || text ||
      |    '&quot; &amp;amp; x &lt;tag&gt;</p>' || chr(10) ||
      |    '<br/>&nbsp;</div>' AS html
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, html,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(
      |        regexp_replace(html, '<[^>]*>', ' ', 'g'),
      |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |        '&nbsp;', ' '), '&amp;', '&'),
      |      '[ \t\n\r]+', ' ', 'g')) AS clean
      |  FROM h)
      |SELECT doc_id, length(html) AS len_raw, length(clean) AS len_clean,
      |  md5(clean) AS clean_md5
      |FROM c
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ score calibration

  /** Calibration/reliability report
    * ([[graft.operators.Diagnostics.calibrationReport]]) auditing the
    * stopword-ratio score as an is-English classifier: decile confidence
    * bins vs the empirical lang='en' rate. The bin index, midpoints, and
    * rates all replay exactly (the score is an exact integer ratio in
    * doubles, and both engines run the identical multiply-floor chain).
    */
  def calibrationReportQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.calibrationReport(
      T(s, dir, "documents"),
      TextFunctions.stopwordRatio(col("text")),
      col("lang") === "en", bins = 10)

  val calibrationReportOracle: String =
    s"""WITH t AS (
       |  SELECT CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(trim(text), '\\s+') END AS toks,
       |    lang
       |  FROM documents),
       |m AS (
       |  SELECT CASE WHEN len(toks) = 0 THEN 0.0
       |    ELSE CAST(len(list_filter(toks, x -> list_contains($swEn, x)))
       |           AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS s,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM t),
       |b AS (
       |  SELECT GREATEST(LEAST(CAST(FLOOR(s * 10) AS INTEGER), 9), 0) AS bin,
       |    pos
       |  FROM m),
       |g AS (
       |  SELECT bin, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos
       |  FROM b GROUP BY 1)
       |SELECT bin, (CAST(bin AS DOUBLE) + 0.5) / 10.0 AS conf_mid, n, n_pos,
       |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
       |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
       |    - (CAST(bin AS DOUBLE) + 0.5) / 10.0 AS gap
       |FROM g
       |ORDER BY bin""".stripMargin

  // ------------------------------------------------ label-noise screen

  /** Label-noise screen ([[graft.operators.Similarity.labelNoiseScreen]]):
    * the first 100 vectors are kNN-voted (k=5, exact cosine, self
    * excluded) against the whole labeled corpus; rows where the
    * neighborhood majority disagrees with the item's own label are the
    * re-annotation queue. The oracle replays the vote (cosine ranking,
    * vote count, smaller-label tie) plus the disagreement filter.
    */
  def labelNoiseScreenQ(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Similarity.labelNoiseScreen(
        emb.filter(col("vec_id") < 100), emb, k = 5)
      .orderBy(col("query_id"))
  }

  val labelNoiseScreenOracle: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 100 AND q.vec_id <> c.vec_id
       |), ranked AS (
       |  SELECT query_id, label,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored),
       |votes AS (
       |  SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS votes
       |  FROM ranked WHERE rank <= 5
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT query_id, label, votes,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY votes DESC, label) AS rk
       |  FROM votes)
       |SELECT b.query_id, e.label AS own_label, b.label AS knn_label,
       |  b.votes
       |FROM best b JOIN embeddings e ON e.vec_id = b.query_id
       |WHERE b.rk = 1 AND b.label <> e.label
       |ORDER BY b.query_id""".stripMargin

  // ------------------------------------------------ quantile normalization

  /** Per-source score quantile normalization
    * ([[graft.operators.Sampling.quantileNormalize]]): every document's
    * length score mapped to its percent-rank within its source — the
    * cross-source comparability transform applied before mixing
    * differently-calibrated quality scores. Unique (score, doc_id)
    * ordering makes the rank — and thus the (rank−1)/(n−1) double —
    * identical in any engine.
    */
  def scoreQuantileNormalizeQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.quantileNormalize(
        T(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars")),
        col("source"), col("n_chars"), col("doc_id"))
      .orderBy(col("doc_id"))

  val scoreQuantileNormalizeOracle: String =
    """SELECT doc_id, source, n_chars,
      |  PERCENT_RANK() OVER (PARTITION BY source
      |    ORDER BY n_chars, doc_id) AS q
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ graph link rank

  /** Fixed-point weighted PageRank ([[graft.operators.Graph.linkRank]])
    * over the session-transition graph — event types ranked by where
    * session flow concentrates, the same shape as crawl-pipeline domain
    * ranking. Three iterations unroll into three CTE rounds in the
    * oracle; every step is integer multiply/`div`/sum, so the ranks match
    * to the unit.
    */
  def linkRankQ(s: SparkSession, dir: String): DataFrame = {
    val e = T.events(s, dir)
    val trans = graft.operators.EventAnalytics.eventTransitions(
      e, col("user_id"), col("ts"), col("event_type"), col("event_id"))
    graft.operators.Graph.linkRank(trans, col("from_type"), col("to_type"),
        col("n_transitions"), iters = 3)
      .orderBy(col("rank").desc, col("node"))
  }

  val linkRankOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) * 1000 AS tsn,
      |    event_type AS et
      |  FROM events),
      |t AS (
      |  SELECT user_id, et, tsn,
      |    LAG(et) OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS pet,
      |    LAG(tsn) OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS ptsn
      |  FROM e),
      |tr AS (
      |  SELECT user_id, pet AS from_type, et AS to_type FROM t
      |  WHERE pet IS NOT NULL AND tsn - ptsn <= 1800000000000),
      |ed AS (
      |  SELECT from_type AS src, to_type AS dst, CAST(COUNT(*) AS BIGINT) AS w
      |  FROM tr GROUP BY 1, 2),
      |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM ed GROUP BY 1),
      |nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
      |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
      |c1 AS (
      |  SELECT ed.dst AS node, CAST(SUM(r0.r * ed.w // outw.out_w) AS BIGINT) AS cs
      |  FROM ed JOIN outw ON outw.src = ed.src JOIN r0 ON r0.node = ed.src
      |  GROUP BY 1),
      |r1 AS (
      |  SELECT n.node,
      |    CAST(150000000 + (17 * COALESCE(c1.cs, 0)) // 20 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
      |c2 AS (
      |  SELECT ed.dst AS node, CAST(SUM(r1.r * ed.w // outw.out_w) AS BIGINT) AS cs
      |  FROM ed JOIN outw ON outw.src = ed.src JOIN r1 ON r1.node = ed.src
      |  GROUP BY 1),
      |r2 AS (
      |  SELECT n.node,
      |    CAST(150000000 + (17 * COALESCE(c2.cs, 0)) // 20 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN c2 ON c2.node = n.node),
      |c3 AS (
      |  SELECT ed.dst AS node, CAST(SUM(r2.r * ed.w // outw.out_w) AS BIGINT) AS cs
      |  FROM ed JOIN outw ON outw.src = ed.src JOIN r2 ON r2.node = ed.src
      |  GROUP BY 1),
      |r3 AS (
      |  SELECT n.node,
      |    CAST(150000000 + (17 * COALESCE(c3.cs, 0)) // 20 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN c3 ON c3.node = n.node)
      |SELECT node, r AS rank FROM r3
      |ORDER BY rank DESC, node""".stripMargin

  // ------------------------------------------- keyword / vocabulary / paths

  /** Per-doc keyword extraction ([[graft.operators.TextIndex
    * .keywordExtract]]): top-3 distinctive terms by the ln-free tf-idf
    * lift tf·N/df. Counts are exact longs, the score one IEEE division
    * chain, the per-doc rank ordered (score desc, term) — the oracle
    * replays the posting agg, the df join, and the ranked window.
    */
  def keywordExtractQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.keywordExtract(
      T(s, dir, "documents"), col("doc_id"), col("text"), k = 3)

  val keywordExtractOracle: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents WHERE trim(text) <> ''),
      |tf AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM t GROUP BY 1, 2),
      |dfc AS (
      |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |sc AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
      |    (CAST(tf.tf AS DOUBLE) * CAST(nn.n AS DOUBLE))
      |      / CAST(dfc.df AS DOUBLE) AS score
      |  FROM tf JOIN dfc USING (term) CROSS JOIN nn),
      |r AS (
      |  SELECT doc_id, term, tf, df, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, term) AS rank
      |  FROM sc)
      |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, df, score
      |FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Per-source vocabulary richness ([[graft.operators.TextIndex
    * .vocabRichness]]): token mass, vocab, hapax count and the
    * hapax/type-token ratios — the OCR-noise / boilerplate triage row of
    * a corpus card. All counts exact; each ratio one IEEE division.
    */
  def vocabRichnessQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.vocabRichness(
      T(s, dir, "documents"), col("source"), col("text"))

  val vocabRichnessOracle: String =
    """WITH t AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents WHERE trim(text) <> ''),
      |c AS (
      |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM t GROUP BY 1, 2),
      |agg AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      |  FROM c GROUP BY 1)
      |SELECT source, n_tokens, vocab, hapax,
      |  CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE) AS hapax_ratio,
      |  CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS type_token_ratio
      |FROM agg
      |ORDER BY source""".stripMargin

  /** Three-step session path mining ([[graft.operators.EventAnalytics
    * .sessionPaths]]): consecutive in-session event-type triples with
    * path and walker counts — [[eventTransitionsQ]] one hop deeper. The
    * oracle replays both lags, both per-hop gap checks, and the
    * two-level aggregation.
    */
  def sessionPathsQ(s: SparkSession, dir: String): DataFrame = {
    val e = T.events(s, dir)
    graft.operators.EventAnalytics.sessionPaths(
      e, col("user_id"), col("ts"), col("event_type"), col("event_id"))
  }

  /** Session transcript assembly ([[graft.operators.EventAnalytics
    * .sessionTranscripts]]): the SFT/dialog data-prep record — each
    * 30-min-gap session becomes one ordered "role: content" transcript.
    * The oracle replays the gap sessionization, the (ts, role, content)
    * turn order, and the assembled string through string_agg; the gate
    * hashes md5(transcript) so the full assembly is value-checked
    * without shipping corpus text through the compare.
    */
  def dialogAssemblyQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.sessionTranscripts(
        T.events(s, dir), col("user_id"), col("ts"), col("event_type"),
        col("props"))
      .select(col("user_id"), col("session_seq"), col("session_start"),
        col("n_turns"), col("duration_ns"), col("n_chars"),
        md5(col("transcript")).as("transcript_md5"))
      .orderBy(col("user_id"), col("session_seq"))

  /** Next-event training examples ([[graft.operators.EventAnalytics
    * .nextEventExamples]]): (session context → next event type) rows —
    * the sequence-model dataset. The oracle replays the gap
    * sessionization, the history lags with the event_id tiebreak, and
    * the oldest-first context join.
    */
  def nextEventQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.nextEventExamples(
        T.events(s, dir), col("user_id"), col("ts"), col("event_type"),
        col("event_id"))
      .orderBy(col("user_id"), col("ts"), col("tie"))

  val nextEventOracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) * 1000 AS tsn, event_type AS et,
      |    event_id
      |  FROM events),
      |w AS (
      |  SELECT user_id, tsn, et, event_id,
      |    CASE WHEN lag(tsn) OVER win IS NULL
      |           OR tsn - lag(tsn) OVER win > 1800000000000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY tsn, event_id)),
      |s AS (
      |  SELECT user_id, tsn, et, event_id,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY tsn, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM w),
      |l AS (
      |  SELECT user_id, tsn, et, event_id,
      |    lag(et, 3) OVER ws AS l3, lag(et, 2) OVER ws AS l2,
      |    lag(et, 1) OVER ws AS l1
      |  FROM s
      |  WINDOW ws AS (PARTITION BY user_id, sess ORDER BY tsn, event_id)),
      |x AS (
      |  SELECT user_id, tsn, event_id, et,
      |    list_filter([l3, l2, l1], v -> v IS NOT NULL) AS ctx
      |  FROM l)
      |SELECT user_id, tsn AS ts, event_id AS tie, et AS next_et,
      |  array_to_string(ctx, '>') AS ctx,
      |  CAST(len(ctx) AS INTEGER) AS ctx_len
      |FROM x WHERE len(ctx) >= 1
      |ORDER BY user_id, ts, tie""".stripMargin

  val dialogAssemblyOracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) * 1000 AS tsn,
      |    COALESCE(event_type, '') AS role, COALESCE(props, '') AS content
      |  FROM events),
      |w AS (
      |  SELECT user_id, tsn, role, content,
      |    CASE WHEN lag(tsn) OVER win IS NULL
      |           OR tsn - lag(tsn) OVER win > 1800000000000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY tsn, role, content)),
      |s AS (
      |  SELECT user_id, tsn, role, content,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY tsn, role, content
      |      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM w),
      |g AS (
      |  SELECT user_id, CAST(sess AS BIGINT) AS session_seq,
      |    MIN(tsn) AS session_start,
      |    CAST(COUNT(*) AS BIGINT) AS n_turns,
      |    MAX(tsn) - MIN(tsn) AS duration_ns,
      |    string_agg(role || ': ' || content, chr(10)
      |      ORDER BY tsn, role, content) AS tr
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id, session_seq, session_start, n_turns, duration_ns,
      |  CAST(length(tr) AS BIGINT) AS n_chars, md5(tr) AS transcript_md5
      |FROM g
      |ORDER BY user_id, session_seq""".stripMargin

  val sessionPathsOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) * 1000 AS tsn,
      |    event_type AS et
      |  FROM events),
      |t AS (
      |  SELECT user_id, et, tsn,
      |    LAG(et, 1) OVER w AS e2, LAG(tsn, 1) OVER w AS ts2,
      |    LAG(et, 2) OVER w AS e1, LAG(tsn, 2) OVER w AS ts1
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
      |p AS (
      |  SELECT user_id, e1 AS step1, e2 AS step2, et AS step3 FROM t
      |  WHERE e1 IS NOT NULL AND tsn - ts2 <= 1800000000000
      |    AND ts2 - ts1 <= 1800000000000),
      |pu AS (
      |  SELECT step1, step2, step3, user_id, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM p GROUP BY 1, 2, 3, 4)
      |SELECT step1, step2, step3, CAST(SUM(c) AS BIGINT) AS n_paths,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM pu GROUP BY 1, 2, 3
      |ORDER BY n_paths DESC, step1, step2, step3""".stripMargin

  /** Event-type association pairs ([[graft.operators.EventAnalytics
    * .eventPairs]]): per-user co-occurrence with exact counts and the
    * lift n_both·N/(n_a·n_b). The oracle replays the distinct
    * (user, type) collapse, the a<b self-join, both marginals, and the
    * one fixed-shape double expression.
    */
  def eventPairsQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.eventPairs(
      T.events(s, dir), col("user_id"), col("event_type"))

  val eventPairsOracle: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type AS et FROM events),
      |marg AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS n_et FROM ut GROUP BY 1),
      |nn AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM ut),
      |pr AS (
      |  SELECT a.et AS type_a, b.et AS type_b, CAST(COUNT(*) AS BIGINT) AS n_both
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.et < b.et
      |  GROUP BY 1, 2)
      |SELECT pr.type_a, pr.type_b, pr.n_both, ma.n_et AS n_a, mb.n_et AS n_b,
      |  nn.n AS n_users,
      |  (CAST(pr.n_both AS DOUBLE) * CAST(nn.n AS DOUBLE))
      |    / (CAST(ma.n_et AS DOUBLE) * CAST(mb.n_et AS DOUBLE)) AS lift
      |FROM pr
      |JOIN marg ma ON ma.et = pr.type_a
      |JOIN marg mb ON mb.et = pr.type_b
      |CROSS JOIN nn
      |ORDER BY lift DESC, type_a, type_b""".stripMargin

  // ------------------------------------ decay / cadence / profile / grams

  /** Time-decayed event popularity ([[graft.operators.EventAnalytics
    * .timeDecayedPopularity]], half-life 7 days): exact binary decay —
    * integer 2^(36-age) weights, DECIMAL(38,0) sum, ONE IEEE division by
    * 2^36. The oracle replays the period index, the as-of max, the shift,
    * and the division bit-for-bit (no float pow chain on either side).
    */
  def timeDecayedPopularityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.timeDecayedPopularity(
      T.events(s, dir), col("event_type"), col("ts"), halfLifeDays = 7)

  val timeDecayedPopularityOracle: String =
    """WITH e AS (
      |  SELECT event_type AS et,
      |    (epoch_us(ts) * 1000) // 604800000000000 AS hl
      |  FROM events),
      |mx AS (SELECT MAX(hl) AS mhl FROM e),
      |w AS (
      |  SELECT et,
      |    CASE WHEN mhl - hl <= 36
      |      THEN CAST(1 AS BIGINT) << CAST(36 - (mhl - hl) AS INTEGER)
      |      ELSE 0 END AS wfp
      |  FROM e CROSS JOIN mx)
      |SELECT et AS event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(wfp AS DECIMAL(38,0))) AS DOUBLE) / 68719476736.0
      |    AS decayed
      |FROM w GROUP BY 1
      |ORDER BY decayed DESC, event_type""".stripMargin

  /** Per-type inter-arrival cadence ([[graft.operators.EventAnalytics
    * .eventCadence]]): consecutive same-(user, type) gap percentiles +
    * IEEE mean of the exact DECIMAL gap sum. The oracle replays the lag
    * window (same (ts, tiebreak) order), the discrete percentiles, and
    * the division.
    */
  def eventCadenceQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics.eventCadence(
      T.events(s, dir), col("user_id"), col("ts"), col("event_type"),
      col("event_id"))

  val eventCadenceOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) * 1000 AS tsn,
      |    event_type AS et
      |  FROM events),
      |g AS (
      |  SELECT et, tsn - LAG(tsn, 1) OVER (
      |    PARTITION BY user_id, et ORDER BY tsn, event_id) AS gap
      |  FROM e),
      |f AS (SELECT et, gap FROM g WHERE gap IS NOT NULL)
      |SELECT et AS event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_gap_ns,
      |  CAST(quantile_disc(gap, 0.95) AS BIGINT) AS p95_gap_ns,
      |  CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS mean_gap_ns
      |FROM f GROUP BY 1
      |ORDER BY event_type""".stripMargin

  /** One-pass numeric profiler ([[graft.operators.Diagnostics
    * .tableProfile]]) over lineitem's four measures, DECIMAL(18,2)-cast
    * so the means are exact-sum/one-division (the established decimal
    * money-math contract). The oracle replays each column's stats and
    * unions the rows.
    */
  def tableProfileQ(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(n => n -> col(n).cast("decimal(18,2)"))
    graft.operators.Diagnostics.tableProfile(T(s, dir, "lineitem"), cols)
  }

  val tableProfileOracle: String = {
    def branch(c: String) =
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
         |  CAST(MIN(v) AS DOUBLE) AS min_v, CAST(MAX(v) AS DOUBLE) AS max_v,
         |  CAST(SUM(v) AS DOUBLE) / CAST(COUNT(v) AS DOUBLE) AS mean,
         |  CAST(quantile_disc(v, 0.5) AS DOUBLE) AS p50
         |FROM (SELECT CAST($c AS DECIMAL(18,2)) AS v FROM lineitem)""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(branch).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Per-source char-trigram fingerprint ([[graft.operators.TextIndex
    * .charNgramProfile]]): top-10 code-point trigrams per source. The
    * oracle replays the grams positionally with `substring(text, i, 3)`
    * (the native emits identical code-point slices in one O(len) pass),
    * then the count + rank chain.
    */
  def charTrigramProfileQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.charNgramProfile(
      T(s, dir, "documents"), col("source"), col("text"), n = 3, k = 10)

  val charTrigramProfileOracle: String =
    """WITH pos AS (
      |  SELECT source, text,
      |    unnest(range(1, len(text) - 1)) AS i
      |  FROM documents),
      |g AS (
      |  SELECT source, substring(text, CAST(i AS INTEGER), 3) AS gram
      |  FROM pos),
      |c AS (
      |  SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM g GROUP BY 1, 2),
      |r AS (
      |  SELECT source, gram, n, ROW_NUMBER() OVER (
      |    PARTITION BY source ORDER BY n DESC, gram) AS rank
      |  FROM c)
      |SELECT source, CAST(rank AS INTEGER) AS rank, gram, n
      |FROM r WHERE rank <= 10
      |ORDER BY source, rank""".stripMargin

  // --------------------------- compressibility / waterfill / embargo / edit

  /** Compression-proxy quality signal ([[graft.operators.QualityFilter
    * .docCompressibility]]): per-doc distinct-8-gram ratio — exact
    * counts (code-point grams ≡ positional SQL substring), one IEEE
    * division, NULL ratio for sub-8-codepoint docs.
    */
  def docCompressibilityQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityFilter.docCompressibility(
      T(s, dir, "documents"), col("doc_id"), col("text"), n = 8)

  val docCompressibilityOracle: String =
    """WITH pos AS (
      |  SELECT doc_id, text, unnest(range(1, len(text) - 6)) AS i
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, substring(text, CAST(i AS INTEGER), 8) AS gram
      |  FROM pos),
      |a AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |    CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
      |  FROM g GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(a.n_grams, 0) AS n_grams,
      |  COALESCE(a.n_distinct, 0) AS n_distinct,
      |  CASE WHEN a.n_grams > 0
      |    THEN CAST(a.n_distinct AS DOUBLE) / CAST(a.n_grams AS DOUBLE)
      |  END AS compress_ratio
      |FROM documents d LEFT JOIN a USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Water-filling token-budget allocation ([[graft.operators.Sampling
    * .mixtureWaterfill]]): per-source whitespace-token mass, budget =
    * half the corpus total (computed from the same exact integers on
    * both sides), allocation entirely in integer div/mod — the oracle
    * replays the sorted prefix-sum level search and the remainder rule.
    */
  def mixtureWaterfillQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions
    // ONE corpus token aggregation, collected as the |sources|-row
    // dimension table (dimension-seed pattern) — the budget (half the
    // total, keeping every SF in the partial-funding regime) and the
    // waterfill input both come from this single pass; re-deriving the
    // budget from the uncached plan would scan the corpus twice
    val rows = T(s, dir, "documents")
      .select(col("source"),
        TextFunctions.tokenCountWs(col("text")).cast("long").as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val total = rows.map(_._2).sum
    graft.operators.Sampling.mixtureWaterfill(
      rows.toDF("source", "tokens"), col("source"), col("tokens"),
      budget = total / 2)
  }

  val mixtureWaterfillOracle: String =
    """WITH tc AS (
      |  SELECT source,
      |    CAST(CASE WHEN trim(text) = '' THEN 0
      |      ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
      |      AS tok
      |  FROM documents),
      |c AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS tokens
      |  FROM tc GROUP BY 1),
      |b AS (SELECT CAST(SUM(tokens) // 2 AS BIGINT) AS budget FROM c),
      |s AS (
      |  SELECT source, tokens,
      |    CAST(ROW_NUMBER() OVER (ORDER BY tokens, source) AS BIGINT) AS i,
      |    CAST(SUM(tokens) OVER (ORDER BY tokens, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM c),
      |t AS (
      |  SELECT s.*, b.budget,
      |    (cum + (n - i) * tokens <= budget) AS funded
      |  FROM s, b),
      |agg AS (
      |  SELECT MAX(CASE WHEN funded THEN i ELSE 0 END) AS k,
      |    MAX(CASE WHEN funded THEN cum ELSE 0 END) AS cumk
      |  FROM t)
      |SELECT source, tokens,
      |  CASE WHEN i <= k THEN tokens
      |    ELSE (budget - cumk) // (n - k)
      |      + (CASE WHEN i - k <= (budget - cumk) % (n - k)
      |          THEN 1 ELSE 0 END)
      |  END AS alloc
      |FROM t, agg
      |ORDER BY source""".stripMargin

  /** Chronological split with a 1-day embargo gap ([[graft.operators
    * .Sampling.timeEmbargoSplit]]): cut = exact p80 timestamp; the
    * oracle replays the percentile and both boundary comparisons.
    */
  def timeEmbargoSplitQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.timeEmbargoSplit(
      T.events(s, dir), col("event_id"), col("ts"),
      trainFrac = 0.8, embargoNanos = 86400L * 1000000000L)

  val timeEmbargoSplitOracle: String =
    """WITH e AS (
      |  SELECT event_id, epoch_us(ts) * 1000 AS tsn FROM events),
      |c AS (SELECT CAST(quantile_disc(tsn // 1000, 0.8) AS BIGINT) * 1000
      |  AS cut FROM e)
      |SELECT event_id AS id,
      |  CASE WHEN tsn <= cut - 86400000000000 THEN 'train'
      |       WHEN tsn <= cut THEN 'embargo'
      |       ELSE 'test' END AS split
      |FROM e, c
      |ORDER BY id""".stripMargin

  /** Block-and-refine edit-distance linkage ([[graft.operators.Dedup
    * .editDistanceLinkage]]) across the corpus halves: jaccardJoin
    * blocking at 0.5 (the fuzzy_join machinery, looser), then exact
    * banded Levenshtein over 100-code-point prefixes at ≤ 25. The
    * oracle replays the shingle blocking AND the refine with DuckDB's
    * own levenshtein — the integers must agree exactly.
    */
  def editDistanceLinkageQ(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    graft.operators.Dedup.editDistanceLinkage(
      docs.filter(col("doc_id") < 250), col("doc_id"), col("text"),
      docs.filter(col("doc_id") >= 250), col("doc_id"), col("text"),
      shingleK = 3, blockJaccard = 0.5, prefixLen = 100, maxDist = 25)
  }

  val editDistanceLinkageOracle: String =
    s"""WITH $shingleSetsSql,
       |l AS (SELECT doc_id, s FROM sets WHERE doc_id < 250),
       |r AS (SELECT doc_id, s FROM sets WHERE doc_id >= 250),
       |lp AS (SELECT doc_id, unnest(s) AS sp FROM l),
       |rp AS (SELECT doc_id, unnest(s) AS sp FROM r),
       |pairs AS (
       |  SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS inter
       |  FROM lp a JOIN rp b ON a.sp = b.sp
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT left_id, right_id
       |  FROM pairs
       |  JOIN l sl ON sl.doc_id = left_id
       |  JOIN r sr ON sr.doc_id = right_id
       |  WHERE CAST(inter AS DOUBLE) /
       |    CAST(len(sl.s) + len(sr.s) - inter AS DOUBLE) >= 0.5),
       |refined AS (
       |  SELECT c.left_id, c.right_id,
       |    CAST(levenshtein(substring(dl.text, 1, 100),
       |      substring(dr.text, 1, 100)) AS INTEGER) AS dist
       |  FROM cand c
       |  JOIN documents dl ON dl.doc_id = c.left_id
       |  JOIN documents dr ON dr.doc_id = c.right_id)
       |SELECT left_id, right_id, dist
       |FROM refined WHERE dist <= 25
       |ORDER BY left_id, right_id""".stripMargin

  // ------------------------------------------ ranking AUC / shuffle audit

  /** Per-source ranking AUC ([[graft.operators.Diagnostics
    * .rankingAucReport]]) of the stopword-ratio score against the
    * lang='en' label — the pre-threshold acceptance gate for the same
    * (score, label) pair [[calibrationReportQ]] bins. Exact
    * Mann–Whitney with tie-averaged ranks: the doubled rank
    * `2·rank − 1 + tie_count` keeps everything integer until the one
    * closing division, which the oracle replays operand-for-operand.
    */
  def rankingAucReportQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.rankingAucReport(
      T(s, dir, "documents"), col("source"),
      TextFunctions.stopwordRatio(col("text")), col("lang") === "en")

  val rankingAucReportOracle: String =
    s"""WITH t AS (
       |  SELECT source,
       |    CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(trim(text), '\\s+') END AS toks,
       |    lang
       |  FROM documents),
       |m AS (
       |  SELECT source,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |    ELSE CAST(len(list_filter(toks, x -> list_contains($swEn, x)))
       |           AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS s,
       |    (lang = 'en') AS y
       |  FROM t),
       |r AS (
       |  SELECT source, y,
       |    2 * CAST(RANK() OVER (PARTITION BY source ORDER BY s) AS BIGINT)
       |      - 1 + CAST(COUNT(*) OVER (PARTITION BY source, s) AS BIGINT)
       |      AS r2
       |  FROM m),
       |a AS (
       |  SELECT source AS "group",
       |    CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |    CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
       |    SUM(CASE WHEN y THEN CAST(r2 AS DECIMAL(38,0))
       |        ELSE CAST(0 AS DECIMAL(38,0)) END) AS sr2
       |  FROM r GROUP BY 1)
       |SELECT "group", n_pos, n_neg,
       |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
       |    CAST(sr2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1) AS DOUBLE)
       |      / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       |  END AS auc
       |FROM a
       |ORDER BY "group"""".stripMargin

  /** Shuffle-quality audit ([[graft.operators.Diagnostics
    * .shuffleQualityReport]]) over [[epochShuffleQ]]'s exact shard/pos
    * assignment (same epoch-3, 16-shard constants): adjacent same-source
    * rate per shard vs the exact random-order expectation
    * Σc(c−1)/(n(n−1)). The oracle replays the md5 hash32 placement AND
    * both rates.
    */
  def shuffleQualityReportQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Diagnostics.shuffleQualityReport(
      graft.operators.Sampling.epochShuffle(
        T(s, dir, "documents"), col("doc_id"), numShards = 16, epoch = 3),
      col("shard"), col("pos"), col("source"))

  val shuffleQualityReportOracle: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':3'), 1, 8))::BIGINT AS h
      |  FROM documents),
      |sp AS (
      |  SELECT source, CAST(h % 16 AS INTEGER) AS shard,
      |    ROW_NUMBER() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS pos
      |  FROM h),
      |lagd AS (
      |  SELECT shard, source,
      |    LAG(source, 1) OVER (PARTITION BY shard ORDER BY pos) AS pg
      |  FROM sp),
      |adj AS (
      |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN source = pg THEN 1 ELSE 0 END) AS BIGINT)
      |      AS adj_same
      |  FROM lagd GROUP BY 1),
      |coll AS (
      |  SELECT shard, SUM(CAST(c AS DECIMAL(38,0)) * (c - 1)) AS cl
      |  FROM (SELECT shard, source, CAST(COUNT(*) AS BIGINT) AS c
      |        FROM sp GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT a.shard, a.n, a.adj_same,
      |  CASE WHEN a.n > 1 THEN
      |    CAST(a.adj_same AS DOUBLE) / CAST(a.n - 1 AS DOUBLE) END
      |    AS adj_rate,
      |  CASE WHEN a.n > 1 THEN
      |    CAST(c.cl AS DOUBLE)
      |      / (CAST(a.n AS DOUBLE) * CAST(a.n - 1 AS DOUBLE)) END
      |    AS expected_rate
      |FROM adj a JOIN coll c ON c.shard = a.shard
      |ORDER BY a.shard""".stripMargin

  val all: Seq[Q] = Seq(
    Q("ranking_auc_report", rankingAucReportQ, Some(rankingAucReportOracle)),
    Q("shuffle_quality_report", shuffleQualityReportQ,
      Some(shuffleQualityReportOracle)),
    Q("doc_compressibility", docCompressibilityQ,
      Some(docCompressibilityOracle)),
    Q("mixture_waterfill", mixtureWaterfillQ, Some(mixtureWaterfillOracle)),
    Q("time_embargo_split", timeEmbargoSplitQ, Some(timeEmbargoSplitOracle)),
    Q("edit_distance_linkage", editDistanceLinkageQ,
      Some(editDistanceLinkageOracle)),
    Q("time_decayed_popularity", timeDecayedPopularityQ,
      Some(timeDecayedPopularityOracle)),
    Q("event_cadence", eventCadenceQ, Some(eventCadenceOracle)),
    Q("table_profile", tableProfileQ, Some(tableProfileOracle)),
    Q("char_trigram_profile", charTrigramProfileQ,
      Some(charTrigramProfileOracle)),
    Q("keyword_extract", keywordExtractQ, Some(keywordExtractOracle)),
    Q("vocab_richness", vocabRichnessQ, Some(vocabRichnessOracle)),
    Q("session_paths", sessionPathsQ, Some(sessionPathsOracle)),
    Q("dialog_assembly", dialogAssemblyQ, Some(dialogAssemblyOracle)),
    Q("next_event_pairs", nextEventQ, Some(nextEventOracle)),
    Q("event_pairs", eventPairsQ, Some(eventPairsOracle)),
    Q("preference_report", preferenceReportQ, Some(preferenceReportOracle)),
    Q("preference_length_bias", preferenceLengthBiasQ, Some(preferenceLengthBiasOracle)),
    Q("annotator_agreement", annotatorAgreementQ,
      Some(annotatorAgreementOracle)),
    Q("text_strip_markup", textStripMarkupQ, Some(textStripMarkupOracle)),
    Q("calibration_report", calibrationReportQ, Some(calibrationReportOracle)),
    Q("link_rank", linkRankQ, Some(linkRankOracle)),
    Q("label_noise_screen", labelNoiseScreenQ, Some(labelNoiseScreenOracle)),
    Q("score_quantile_normalize", scoreQuantileNormalizeQ,
      Some(scoreQuantileNormalizeOracle)),
    Q("dpo_pairs", dpoPairsQ, Some(dpoPairsOracle)),
    Q("dpo_from_counts", dpoFromCountsQ, Some(dpoPairsOracle)),
    Q("preference_bt_strength", preferenceBtStrengthQ,
      Some(preferenceBtStrengthOracle)),
    Q("conversion_attribution", conversionAttributionQ,
      Some(conversionAttributionOracle)),
    Q("robust_stats", robustStatsQ, Some(robustStatsOracle)),
    Q("event_anomaly", eventAnomalyQ, Some(eventAnomalyOracle)),
    Q("pack_sequences", packSequences, Some(packSequencesOracle)),
    Q("packing_stats", packingStats, Some(packingStatsOracle)),
    Q("curation_pipeline", curationPipeline, Some(curationPipelineOracle)),
    Q("repeated_substrings", repeatedSubstrings, Some(repeatedSubstringsOracle)),
    Q("fuzzy_join", fuzzyJoin, Some(fuzzyJoinOracle)),
    Q("token_counts", tokenCounts, Some(tokenCountsOracle)),
    Q("bpe_tokenize", bpeTokenize, Some(bpeTokenizeOracle)),
    Q("unigram_tokenize", unigramTokenize, Some(unigramTokenizeOracle)),
    Q("tokenizer_compare", tokenizerCompare, Some(tokenizerCompareOracle)),
    Q("zorder_key", zorderKeyQ, Some(zorderKeyOracle)),
    Q("hilbert_key", hilbertKeyQ, Some(hilbertKeyOracle)),
    Q("quality_filter", qualityFilterQ, Some(qualityFilterOracle)),
    Q("quality_rule_hits", qualityRuleHitsQ, Some(qualityRuleHitsOracle)),
    Q("dedup_incremental", dedupIncremental, Some(dedupIncrementalOracle)),
    Q("skew_report", skewReportQ, Some(skewReportOracle)),
    Q("corpus_report", corpusReportQ, Some(corpusReportOracle)),
    Q("corpus_diff", corpusDiffQ, Some(corpusDiffOracle)),
    Q("corpus_manifest", corpusManifestQ, Some(corpusManifestOracle)),
    Q("length_histogram", lengthHistogramQ, Some(lengthHistogramOracle)),
    Q("quantile_sketch", quantileSketchQ, Some(quantileSketchOracle)),
    Q("heavy_hitters_sketch", heavyHittersSketchQ, Some(heavyHittersSketchOracle)),
    Q("cms_counts", cmsCountsQ, Some(cmsCountsOracle)),
    Q("source_overlap", sourceOverlap, Some(sourceOverlapOracle)),
    Q("overlap_sketch", overlapSketchQ, Some(overlapSketchOracle)),
    Q("join_size_sketch", joinSizeSketchQ, Some(joinSizeSketchOracle)),
    Q("mm_phash_pairs", mmPhashPairsQ, Some(mmPhashPairsOracle)),
    Q("lang_id", langIdQ, Some(langIdOracle)),
    Q("dedup_canonical", dedupCanonical, Some(dedupCanonicalOracle)),
    Q("segment_dedup", segmentDedupQ, Some(segmentDedupOracle)),
    Q("cdc_segment_dedup", cdcSegmentDedupQ, Some(cdcSegmentDedupOracle)),
    Q("dup_ngram_profile", dupNgramProfileQ, Some(dupNgramProfileOracle)),
    Q("dedup_ngram_mask", dedupNgramMaskQ, Some(dedupNgramMaskOracle)),
    Q("dedup_exact_substr", dedupExactSubstrQ, Some(dedupExactSubstrOracle)),
    Q("vocab_coverage", vocabCoverageQ, Some(vocabCoverageOracle)),
    Q("bigram_familiarity", bigramFamiliarityQ, Some(bigramFamiliarityOracle)),
    Q("trigram_backoff", trigramBackoffQ, Some(trigramBackoffOracle)),
    Q("lm_perplexity_screen", lmPerplexityQ, Some(lmPerplexityOracle)),
    Q("lm_cross_screen", lmCrossScreenQ, Some(lmCrossScreenOracle)),
    Q("keyword_tag", keywordTagQ, Some(keywordTagOracle)),
    Q("vocab_growth", vocabGrowthQ, Some(vocabGrowthOracle)),
    Q("vocab_growth_kll", vocabGrowthKllQ, Some(vocabGrowthKllOracle)),
    Q("augment_dropout", augmentDropoutQ, Some(augmentDropoutOracle)),
    Q("span_corruption", spanCorruptionQ, Some(spanCorruptionOracle)),
    Q("rouge_overlap", rougeOverlapQ, Some(rougeOverlapOracle)),
    Q("self_bleu", selfBleuQ, Some(selfBleuOracle)),
    Q("cooccurrence_counts", cooccurrenceQ, Some(cooccurrenceOracle)),
    Q("kanon_release", kanonReleaseQ, Some(kanonReleaseOracle)),
    Q("dedup_exact", dedupExact, Some(dedupExactOracle)),
    Q("dedup_scoped", dedupScoped, Some(dedupScopedOracle)),
    Q("mm_decode_meta", mmDecodeMeta, Some(mmDecodeMetaOracle)),
    Q("dedup_minhash_lsh", dedupMinHash, Some(dedupMinHashOracle)),
    Q("dedup_ngram_jaccard", dedupNgramJaccard, Some(dedupNgramJaccardOracle)),
    Q("jaccard_histogram", jaccardHistogramQ, Some(jaccardHistogramOracle)),
    Q("purge_deletes", purgeDeletesQ, Some(purgeDeletesOracle)),
    Q("novelty_score", noveltyScoreQ, Some(noveltyScoreOracle)),
    Q("dedup_simhash", dedupSimHash, Some(dedupSimHashOracle)),
    Q("dedup_simhash128", dedupSimHash128, Some(dedupSimHash128Oracle)),
    Q("text_metrics", textMetrics, Some(textMetricsOracle)),
    Q("text_redact", textRedact, Some(textRedactOracle)),
    Q("text_normalize", textNormalizeQ, Some(textNormalizeOracle)),
    Q("doc_chunks", docChunks, Some(docChunksOracle)),
    Q("cdc_chunks", cdcChunksQ, Some(cdcChunksOracle)),
    Q("quality_repetition", qualityRepetition, Some(qualityRepetitionOracle)),
    Q("dedup_components", dedupComponents, Some(dedupComponentsOracle)),
    Q("dup_cluster_sizes", dupClusterSizes, Some(dupClusterSizesOracle)),
    Q("dedup_weights", dedupWeights, Some(dedupWeightsOracle)),
    Q("split_leakfree", splitLeakFreeQ, Some(splitLeakFreeOracle)),
    Q("dedup_collapse", dedupCollapse, Some(dedupCollapseOracle)),
    Q("decontaminate", decontaminate, Some(decontaminateOracle)),
    Q("decontaminate_bloom", decontaminateBloom, Some(decontaminateBloomOracle)),
    Q("sample_docs", sampleDocs, Some(sampleDocsOracle)),
    Q("sample_per_class", samplePerClass, Some(samplePerClassOracle)),
    Q("sample_per_cluster", samplePerCluster, Some(samplePerClusterOracle)),
    Q("split_by_hash", splitByHashQ, Some(splitByHashOracle)),
    Q("split_leak_report", splitLeakQ, Some(splitLeakOracle)),
    Q("sample_fixed_n", sampleFixedNQ, Some(sampleFixedNOracle)),
    Q("epoch_shuffle", epochShuffleQ, Some(epochShuffleOracle)),
    Q("mixture_sample", mixtureSampleQ, Some(mixtureSampleOracle)),
    Q("heavy_hitters", heavyHittersQ, Some(heavyHittersOracle)),
    Q("hll_cardinality", hllCardinality, Some(hllCardinalityOracle)),
    Q("top_terms", topTerms, Some(topTermsOracle)),
    Q("top_relevant_terms", topRelevantTerms, Some(topRelevantTermsOracle)),
    Q("bm25_topk", bm25Topk, Some(bm25TopkOracle)),
    Q("dsir_sample", dsirSample, Some(dsirSampleOracle)),
    Q("tokenizer_fertility", tokenizerFertility, Some(tokenizerFertilityOracle)),
    Q("curriculum_shards", curriculumShardsQ, Some(curriculumShardsOracle)),
    Q("index_incremental", indexIncrementalQ, Some(indexIncrementalOracle)),
    Q("bm25_from_index", bm25FromIndexQ, Some(bm25TopkOracle)),
    Q("hybrid_retrieval", hybridRetrievalQ, Some(hybridRetrievalOracle)),
    Q("phrase_mining", phraseMiningQ, Some(phraseMiningOracle)),
    Q("minhash_err_report", minhashErrReportQ, Some(minhashErrReportOracle)),
    Q("source_affinity", sourceAffinityQ, Some(sourceAffinityOracle)),
    Q("mixed_language", mixedLanguageQ, Some(mixedLanguageOracle)),
    Q("dup_rate_by_source", dupRateBySourceQ, Some(dupRateBySourceOracle)),
    Q("source_drift", sourceDriftQ, Some(sourceDriftOracle)),
    Q("winnow_fingerprints", winnowFps, Some(winnowFpsOracle)),
    Q("dedup_embedding", dedupEmbedding, Some(dedupEmbeddingOracle)),
    Q("semantic_decontaminate", semanticDecontaminateQ,
      Some(semanticDecontaminateOracle)),
    Q("semantic_decontaminate_lsh", semanticDecontaminateLshQ,
      Some(semanticDecontaminateLshOracle)),
    Q("label_centroids", labelCentroidsQ, Some(labelCentroidsOracle)),
    Q("embedding_outliers", embeddingOutliersQ, Some(embeddingOutliersOracle)),
    Q("embedding_covariance", embeddingCovarianceQ, Some(embeddingCovarianceOracle)),
    Q("dedup_semantic", dedupSemantic, Some(dedupSemanticOracle)),
    Q("sim_bruteforce_topk", simBruteForce, Some(simBruteForceOracle)),
    Q("bitext_mine", bitextMineQ, Some(bitextMineOracle)),
    Q("bitext_mine_lsh", bitextMineLshQ, Some(bitextMineLshOracle)),
    Q("quant_error_report", quantErrorQ, Some(quantErrorOracle)),
    Q("ann_recall", annRecallQ, Some(annRecallOracle)),
    Q("sim_hashed_tfidf", simHashedTfidf, Some(simHashedTfidfOracle)),
    Q("sim_hashed_lsh", simHashedLsh, Some(simHashedLshOracle)),
    Q("sim_mmr_topk", simMmrTopk, Some(simMmrTopkOracle)),
    Q("sim_hard_negatives", simHardNegatives, Some(simHardNegativesOracle)),
    Q("sim_filtered_topk", simFilteredTopk, Some(simFilteredTopkOracle)),
    Q("sim_quantized_topk", simQuantized, Some(simQuantizedOracle)),
    Q("sim_knn_label", simKnnLabel, Some(simKnnLabelOracle)),
    Q("sim_jl_topk", simJlTopk, Some(simJlTopkOracle)),
    Q("sim_lsh_topk", simLsh, Some(simLshOracle)),
    Q("sim_lsh_multiprobe", simLshMultiprobe, Some(simLshMultiprobeOracle)),
    Q("sim_ivf_topk", simIvf, Some(simIvfOracle)),
    Q("sim_ivf_trained", simIvfTrained, Some(simIvfTrainedOracle)),
    Q("sim_pq_topk", simPq, Some(simPqOracle)),
    Q("sim_ivfpq_topk", simIvfPq, Some(simIvfPqOracle))
  )
}
