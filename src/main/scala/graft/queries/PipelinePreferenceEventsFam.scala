package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Preference/RLHF aggregation, event analytics, keyword/vocabulary, diagnostics — one slice of the [[Pipeline]] registry (the
  * monolithic Pipeline.scala split per-family in round 16, zero
  * behavior change; `Pipeline.all` still assembles every entry).
  */
trait PipelinePreferenceEventsFam extends PipelineTokenizerFam {
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
  private[queries] def prefBallots(s: SparkSession, dir: String): DataFrame = {
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

  /** Win-rate rankings SERVED FROM STREAMED COUNT STATE: the same ballot
    * fixture streams through the REAL
    * [[graft.streaming.Streams.PreferenceIngest]] in two micro-batches
    * (split by winner parity — the count fold is additive, any split
    * works); `rates()` derives the report from the folded state. The
    * oracle is [[preferenceReportOracle]] VERBATIM — a clean one-shot
    * build — so the composition hash-matches only if the additive fold,
    * the scaffold's pin/replay lifecycle, and the served Wilson chain
    * are all exact (the dpo_from_counts pattern, closing the last
    * FoldIngest derivation without its own hash gate).
    */
  def preferenceFromCountsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ballots = prefBallots(s, dir)
    val state0 = Seq.empty[(Long, Long, Long)].toDF("item", "wins", "n")
    val ing = new graft.streaming.Streams.PreferenceIngest(state0,
      col("win"), col("lose"))
    ing.handler(ballots.filter(col("win") % 2 === 0), 0L)
    ing.handler(ballots.filter(col("win") % 2 === 1), 1L)
    ing.rates().orderBy(col("item"))
  }

  private[queries] val wilsonZ = 1.96
  private[queries] val wilsonZz = wilsonZ * wilsonZ

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
  private[queries] def dpoFixture(s: SparkSession, dir: String)
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
  private[queries] def dpoRecordize(dd: DataFrame, recs: DataFrame): DataFrame =
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
}
