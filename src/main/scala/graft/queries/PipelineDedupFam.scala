package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact/scoped/MinHash/SimHash dedup + text-analysis entries — one slice of the [[Pipeline]] registry (the
  * monolithic Pipeline.scala split per-family in round 16, zero
  * behavior change; `Pipeline.all` still assembles every entry).
  */
trait PipelineDedupFam {

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
  private[queries] val shingleSetsSql =
    """sets AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |         ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END
      |  ) AS s
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
      |)""".stripMargin

  /** DuckDB: exact all-pairs Jaccard >= threshold via inverted index. */
  private[queries] def jaccardOracle(threshold: Double): String =
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

  /** Within-corpus containment near-dup join
    * ([[graft.operators.Dedup.selfContainmentPairs]]): pairs whose smaller
    * 3-shingle set is ≥ 0.6 covered by the larger — the near-SUBSET
    * duplicates (article inside digest, quoted paragraph, truncated
    * re-crawl) whose Jaccard is diluted below any symmetric cut. Exact
    * integer-ratio score; the oracle replays the shared posting-self-join
    * machinery with the min-size denominator.
    */
  def dedupContainmentQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.selfContainmentPairs(
        T(s, dir, "documents"), col("doc_id"), col("text"),
        shingleK = 3, threshold = 0.6)
      .orderBy(col("id_a"), col("id_b"))

  val dedupContainmentOracle: String =
    s"""WITH $shingleSetsSql,
       |posting AS (SELECT doc_id, unnest(s) AS sp FROM sets),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM posting a JOIN posting b ON a.sp = b.sp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |c AS (
       |  SELECT p.id_a, p.id_b, p.inter,
       |    len(sa.s) AS sz_a, len(sb.s) AS sz_b,
       |    CAST(p.inter AS DOUBLE) /
       |      CAST(least(len(sa.s), len(sb.s)) AS DOUBLE) AS containment
       |  FROM pairs p
       |  JOIN sets sa ON sa.doc_id = p.id_a
       |  JOIN sets sb ON sb.doc_id = p.id_b)
       |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
       |  CAST(sz_a AS BIGINT) AS sz_a, CAST(sz_b AS BIGINT) AS sz_b,
       |  containment
       |FROM c WHERE containment >= 0.6
       |ORDER BY id_a, id_b""".stripMargin

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

  /** Novelty-gated streaming admission, end to end
    * ([[graft.streaming.Streams.NoveltyIngest]] — the crawl gate "only
    * keep pages adding ≥ 50% new 3-shingles"): the even docs seed the
    * admitted state; the odd docs arrive as TWO micro-batches
    * (doc_id % 4 = 1, then % 4 = 3) through the REAL ingest handler.
    * Batch 2 is scored against state0 ∪ batch-1 SURVIVORS' shingles, so
    * the result hash-matches the sequential SQL replay ONLY if the
    * admission scoring, the survivors-only fold, and the scaffold's
    * pin/delta lifecycle are all exact — at threshold 0.5 the batch-1
    * fold flips 66 of 125 batch-2 decisions on this corpus, so a fold
    * bug cannot hide (the dpo_from_counts pattern). Survivor ids are
    * collected inside onDelta (the consume-before-next-batch contract);
    * the collect is fixture-bounded (≤ |odd docs| ids — a driver-side
    * list of admitted ids is the operator's OUTPUT contract, not a
    * corpus materialization).
    */
  def noveltyFromStreamQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = T(s, dir, "documents")
    val state0 = graft.operators.Dedup.corpusShingleFps(
      docs.filter(col("doc_id") % 2 === 0), col("text"), shingleK = 3)
    val ing = new graft.streaming.Streams.NoveltyIngest(state0,
      col("doc_id"), col("text"), minNovelty = 0.5, shingleK = 3)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    ing.onDelta = (d, bid) =>
      admitted ++= d.select(col("doc_id")).as[Long].collect()
        .map(id => (id, bid.toInt))
    ing.handler(docs.filter(col("doc_id") % 4 === 1), 0L)
    ing.handler(docs.filter(col("doc_id") % 4 === 3), 1L)
    admitted.toSeq.toDF("doc_id", "batch").orderBy(col("doc_id"))
  }

  val noveltyFromStreamOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |sets AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |         ELSE list_transform(range(1, len(t) - 1),
      |                i -> array_to_string(t[i:i+2], ' ')) END) AS s
      |  FROM t),
      |p AS (SELECT doc_id, unnest(s) AS sp FROM sets),
      |ev AS (SELECT DISTINCT sp FROM p WHERE doc_id % 2 = 0),
      |n1 AS (
      |  SELECT doc_id, COUNT(*) AS ns,
      |    SUM(CASE WHEN sp IN (SELECT sp FROM ev) THEN 1 ELSE 0 END) AS seen
      |  FROM p WHERE doc_id % 4 = 1 GROUP BY 1),
      |adm1 AS (SELECT doc_id FROM n1
      |         WHERE CAST(ns - seen AS DOUBLE) / CAST(ns AS DOUBLE) >= 0.5),
      |cs1 AS (SELECT sp FROM ev
      |        UNION SELECT p.sp FROM p JOIN adm1 USING (doc_id)),
      |n2 AS (
      |  SELECT doc_id, COUNT(*) AS ns,
      |    SUM(CASE WHEN sp IN (SELECT sp FROM cs1) THEN 1 ELSE 0 END) AS seen
      |  FROM p WHERE doc_id % 4 = 3 GROUP BY 1),
      |adm2 AS (SELECT doc_id FROM n2
      |         WHERE CAST(ns - seen AS DOUBLE) / CAST(ns AS DOUBLE) >= 0.5)
      |SELECT doc_id, 0 AS batch FROM adm1
      |UNION ALL
      |SELECT doc_id, 1 AS batch FROM adm2
      |ORDER BY doc_id""".stripMargin

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

  private[queries] val swEn = TextFunctions.StopwordsEn.mkString("['", "', '", "']")
  private[queries] val swDe = TextFunctions.StopwordsDe.mkString("['", "', '", "']")
  private[queries] val swEs = TextFunctions.StopwordsEs.mkString("['", "', '", "']")
  private[queries] val swFr = TextFunctions.StopwordsFr.mkString("['", "', '", "']")

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
}
