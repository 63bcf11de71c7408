package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming restatement of the reference's micro-batch layer.
  *
  * The reference "streams" by pulling closed Kafka time windows every
  * `stream.interval` seconds with DStream-era safety knobs (reference:
  * data-process/spark-process/src/main/scala/process/Configs.scala:44-64 —
  * backpressure, WAL, graceful stop; offset persistence to ZooKeeper at
  * process/KafkaHelper.scala:42-65). Structured Streaming supplies each
  * piece natively: triggers ≈ interval, `maxOffsetsPerTrigger` ≈
  * backpressure + range slicing, checkpointing ≈ ZK offset store, watermarks
  * handle the late data the reference's closed windows simply excluded.
  *
  * These helpers define the engine's streaming transforms so batch tests and
  * the DuckDB oracle can validate the same logic: every function takes a
  * DataFrame (streaming or batch — identical plans, Catalyst treats both).
  */
object Streams {

  /** Stream → message-log sink: each micro-batch pushes through the same
    * transactional t_kf_push operator the batch path uses (per-partition
    * atomic append, abort on failure), so the streaming write inherits the
    * connector's delivery contract — at-least-once across batch retries,
    * no partial partitions within a batch. This is the reference's
    * "stream to Kafka" leg (process pulls a window, pushes results) as a
    * foreachBatch sink; against a real broker swap the store for the Kafka
    * writer with the same columns.
    */
  def logSink(df: DataFrame, store: graft.connectors.TopicStore.Factory,
      topic: Column, ct: Column, key: Column, value: Column)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.connectors.KafkaWindow
        .pushTransactional(batch, store, topic, ct, key, value).count()
      ()
    }

  /** Continuous near-duplicate ingestion: every micro-batch runs through
    * [[graft.operators.Dedup.minHashIncremental]] against state carried
    * across batches, and only survivors reach `onSurvivors`. The state
    * (band + posting tables — no text) is pinned per batch with a
    * localCheckpoint so its lineage doesn't grow with stream length; a
    * production deployment would instead write both tables to storage each
    * batch (they are plain DataFrames) and reload on restart, which also
    * makes the state transactional with the sink.
    *
    * Retry safety (foreachBatch is at-least-once, state update is NOT
    * transactional with the sink): the handler records the last APPLIED
    * batchId and the pinned survivor set, so a replayed batch
    * (`batchId <= lastApplied`) re-emits the recorded survivors WITHOUT
    * touching state — without this, replayed docs already sitting in
    * state.bands/postings would self-match at Jaccard 1.0 and be silently
    * dropped. This covers within-run sink retries; across a RESTART,
    * persist the state with [[graft.operators.Dedup.NearDupState.save]]
    * from `onSurvivors` AFTER the sink commit (state then never runs ahead
    * of the sink, and a post-restart replay re-admits the batch against
    * pre-batch state — duplicate-emitting, never survivor-dropping).
    *
    * Returns the writer; caller starts it with its own checkpoint/output
    * options.
    */
  def nearDupIngest(stream: DataFrame, id: Column, text: Column,
      state0: graft.operators.Dedup.NearDupState,
      onSurvivors: (DataFrame, Long) => Unit,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(
      nearDupBatchHandler(state0, onSurvivors, id, text, shingleK, numHashes,
        bands, threshold))

  /** The idempotent per-batch handler behind [[nearDupIngest]], exposed so
    * batch-mode tests (and custom sinks) can drive it directly. Survivors
    * are pinned with a localCheckpoint before emission — a replay must
    * re-emit the EXACT rows of the original run, and an unpinned plan would
    * recompute against the already-mutated state.
    *
    * LIFETIME: the emitted survivors frame is valid only until the NEXT
    * batch is applied — superseded pins are freed then (storage must not
    * grow O(batches)), and a localCheckpoint has no lineage to recompute
    * from. `onSurvivors` must fully consume (collect/write) the frame
    * before returning control to the stream; the same holds for
    * [[semanticIngest]]/[[imageIngest]] survivors and
    * [[IndexIngest.onDelta]] deltas.
    */
  def nearDupBatchHandler(state0: graft.operators.Dedup.NearDupState,
      onSurvivors: (DataFrame, Long) => Unit,
      id: Column, text: Column,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.8): (DataFrame, Long) => Unit =
    new NearDupIngest(state0, onSurvivors, id, text, shingleK, numHashes,
      bands, threshold).handler

  /** Class form of [[nearDupBatchHandler]] (the [[IndexIngest]] shape):
    * exposes the maintained state so callers can checkpoint it at
    * shutdown and tests can assert superseded pins are freed. `current`
    * has the same lifetime contract as [[IndexIngest.current]] — a
    * snapshot is invalidated by the next applied batch.
    */
  final class NearDupIngest(state0: graft.operators.Dedup.NearDupState,
      onSurvivors: (DataFrame, Long) => Unit,
      id: Column, text: Column,
      shingleK: Int, numHashes: Int, bands: Int, threshold: Double) {
    // mutable cells, touched only by the single-threaded batch callback
    private var state = state0
    private var lastApplied = -1L
    private var lastSurvivors: DataFrame = null
    private var ownsState = false // state0 belongs to the caller — never unpin it

    /** The admitted-corpus state after every applied batch. */
    def current: graft.operators.Dedup.NearDupState = state

    val handler: (DataFrame, Long) => Unit =
      (batch: DataFrame, batchId: Long) => {
        if (batchId <= lastApplied) {
          // at-least-once replay after the state union already ran: re-emit
          // the recorded survivors, do NOT re-apply the batch to state.
          // Structured Streaming only ever retries the LATEST batch; anything
          // older would re-emit the wrong set, so it is a guarded no-op.
          if (batchId == lastApplied && lastSurvivors != null)
            onSurvivors(lastSurvivors, batchId)
        } else {
          val (survivors, next) = graft.operators.Dedup.minHashIncremental(
            batch, id, text, state, shingleK, numHashes, bands, threshold)
          val pinned = survivors.localCheckpoint(true)
          onSurvivors(pinned, batchId)
          val nextState = graft.operators.Dedup.NearDupState(
            next.bands.localCheckpoint(true),
            next.postings.localCheckpoint(true))
          // the new pins are eager — the superseded state and the previous
          // batch's survivors can never be read again (replays only target
          // the LATEST batch), so free their blocks or executor storage
          // grows O(batches × state size) on a long-running stream
          if (ownsState) { Bridge.unpin(state.bands); Bridge.unpin(state.postings) }
          if (lastSurvivors != null) Bridge.unpin(lastSurvivors)
          state = nextState
          ownsState = true
          lastApplied = batchId
          lastSurvivors = pinned
        }
        ()
      }
  }

  /** Streaming SemDeDup ingestion: foreachBatch over
    * [[graft.operators.Dedup.semanticDedupIncremental]] — each micro-batch
    * is cluster-assigned against the (broadcast) quantizer, pruned within
    * itself and against the admitted state, survivors emitted and unioned
    * into state. Same at-least-once idempotency contract as
    * [[nearDupIngest]]: a replay of the last applied batch re-emits the
    * pinned survivors without touching state (an unguarded replay would
    * self-match at cosine 1.0 and silently drop everything).
    */
  def semanticIngest(stream: DataFrame, id: Column, vec: Column,
      centroids: DataFrame, state0: DataFrame,
      onSurvivors: (DataFrame, Long) => Unit, threshold: Double)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(
      semanticBatchHandler(state0, onSurvivors, id, vec, centroids, threshold))

  /** The idempotent per-batch handler behind [[semanticIngest]], exposed
    * for batch-mode tests and custom sinks (mirror of
    * [[nearDupBatchHandler]]). State and survivors are localCheckpoint-
    * pinned: state is replay-proof and survivor re-emission is exact.
    */
  def semanticBatchHandler(state0: DataFrame,
      onSurvivors: (DataFrame, Long) => Unit,
      id: Column, vec: Column, centroids: DataFrame,
      threshold: Double): (DataFrame, Long) => Unit =
    new SemanticIngest(state0, onSurvivors, id, vec, centroids, threshold)
      .handler

  /** Class form of [[semanticBatchHandler]] — same `current` lifetime
    * contract as [[NearDupIngest]]. */
  final class SemanticIngest(state0: DataFrame,
      onSurvivors: (DataFrame, Long) => Unit,
      id: Column, vec: Column, centroids: DataFrame, threshold: Double) {
    private var state = state0
    private var lastApplied = -1L
    private var lastSurvivors: DataFrame = null
    private var ownsState = false // state0 belongs to the caller — never unpin it

    /** The admitted (id, cid, v) state after every applied batch. */
    def current: DataFrame = state

    val handler: (DataFrame, Long) => Unit =
      (batch: DataFrame, batchId: Long) => {
        if (batchId <= lastApplied) {
          if (batchId == lastApplied && lastSurvivors != null)
            onSurvivors(lastSurvivors, batchId)
        } else {
          val (admitted, next) = graft.operators.Dedup.semanticDedupIncremental(
            batch, id, vec, centroids, state, threshold)
          val pinned = admitted.localCheckpoint(true)
          onSurvivors(pinned, batchId)
          val nextState = next.localCheckpoint(true)
          // free superseded pins (see NearDupIngest) — replays only
          // ever target the latest batch
          if (ownsState) Bridge.unpin(state)
          if (lastSurvivors != null) Bridge.unpin(lastSurvivors)
          state = nextState
          ownsState = true
          lastApplied = batchId
          lastSurvivors = pinned
        }
        ()
      }
  }

  /** Streaming image-near-dup ingestion: foreachBatch over
    * [[graft.operators.Multimodal.imageDedupIncremental]] — each
    * micro-batch of binary payloads is perceptually hashed once, collapsed
    * within itself, probed against the admitted-hash state, survivors
    * emitted and unioned into state (16 B per admitted image, no pixels).
    * Same at-least-once idempotency contract as [[nearDupIngest]].
    */
  def imageIngest(stream: DataFrame, id: Column, payload: Column,
      state0: DataFrame, onSurvivors: (DataFrame, Long) => Unit,
      maxHamming: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(
      imageBatchHandler(state0, onSurvivors, id, payload, maxHamming))

  /** The idempotent per-batch handler behind [[imageIngest]], exposed for
    * batch-mode tests and custom sinks (mirror of [[nearDupBatchHandler]]).
    */
  def imageBatchHandler(state0: DataFrame,
      onSurvivors: (DataFrame, Long) => Unit,
      id: Column, payload: Column,
      maxHamming: Int = 3): (DataFrame, Long) => Unit =
    new ImageIngest(state0, onSurvivors, id, payload, maxHamming).handler

  /** Class form of [[imageBatchHandler]] — same `current` lifetime
    * contract as [[NearDupIngest]]. */
  final class ImageIngest(state0: DataFrame,
      onSurvivors: (DataFrame, Long) => Unit,
      id: Column, payload: Column, maxHamming: Int) {
    private var state = state0
    private var lastApplied = -1L
    private var lastSurvivors: DataFrame = null
    private var ownsState = false // state0 belongs to the caller — never unpin it

    /** The admitted (id, phash) state after every applied batch. */
    def current: DataFrame = state

    val handler: (DataFrame, Long) => Unit =
      (batch: DataFrame, batchId: Long) => {
        if (batchId <= lastApplied) {
          if (batchId == lastApplied && lastSurvivors != null)
            onSurvivors(lastSurvivors, batchId)
        } else {
          val (admitted, next) = graft.operators.Multimodal
            .imageDedupIncremental(batch, state, id, payload, maxHamming)
          val pinned = admitted.localCheckpoint(true)
          onSurvivors(pinned, batchId)
          val nextState = next.localCheckpoint(true)
          // free superseded pins (see NearDupIngest) — replays only
          // ever target the latest batch
          if (ownsState) Bridge.unpin(state)
          if (lastSurvivors != null) Bridge.unpin(lastSurvivors)
          state = nextState
          ownsState = true
          lastApplied = batchId
          lastSurvivors = pinned
        }
        ()
      }
  }

  /** The shared scaffold of every fold-shaped ingest (index, LM counts,
    * novelty admission, preference counts): per micro-batch, derive a
    * pinned DELTA from (state, batch), FOLD it into the next state, free
    * the superseded state and delta pins (replays only ever target the
    * latest batch — holding older pins grows executor storage
    * O(batches × state)), and re-emit the pinned delta WITHOUT
    * re-folding on an at-least-once retry of the last applied batch. The
    * replay guard is LOAD-BEARING for additive folds (a re-fold
    * double-counts) and a free tokenization saver for idempotent
    * replace folds. One definition so a fix to the guard or the pin
    * ordering lands everywhere at once — this scaffold had been copied
    * per ingest and the copies were already drifting.
    *
    * `current` snapshots are INVALIDATED by the next applied batch (pins
    * freed; a localCheckpoint has no lineage fallback) — collect under
    * the handler's single-threaded discipline or re-read per use.
    */
  abstract class FoldIngest(state0: DataFrame) {
    @volatile private var state = state0
    private var lastApplied = -1L
    private var lastDelta: DataFrame = null
    private var ownsState = false // state0 belongs to the caller

    /** The maintained state after every applied batch. */
    def current: DataFrame = state

    /** The batch's contribution, computed BEFORE the fold and pinned —
      * what `onDelta` consumers see (and what a replay re-emits). May
      * read `state` (novelty admission scores against it).
      */
    protected def mkDelta(state: DataFrame, batch: DataFrame): DataFrame

    /** Next state from (state, batch, pinned delta). */
    protected def fold(state: DataFrame, batch: DataFrame,
        delta: DataFrame): DataFrame

    /** Override point for delta consumers; default is a no-op. */
    var onDelta: (DataFrame, Long) => Unit = (_, _) => ()

    val handler: (DataFrame, Long) => Unit =
      (batch: DataFrame, batchId: Long) => {
        if (batchId <= lastApplied) {
          if (batchId == lastApplied && lastDelta != null)
            onDelta(lastDelta, batchId)
        } else {
          val delta = mkDelta(state, batch).localCheckpoint(true)
          val next = fold(state, batch, delta).localCheckpoint(true)
          if (ownsState) Bridge.unpin(state)
          if (lastDelta != null) Bridge.unpin(lastDelta)
          state = next
          ownsState = true
          onDelta(delta, batchId)
          lastApplied = batchId
          lastDelta = delta
        }
        ()
      }

    def ingest(stream: DataFrame)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
      stream.writeStream.foreachBatch(handler)
  }

  /** Streaming inverted-index maintenance: each micro-batch folds into the
    * posting table via [[graft.operators.TextIndex.postingsIncremental]]
    * (batch docs REPLACE their state postings — a re-ingested document
    * changed; everything else carries over), the batch's own postings are
    * emitted as the delta, and `current` always exposes the up-to-date
    * index. The fold keys the replacement on the raw batch ids — a doc
    * re-ingested with empty text has no delta rows, yet its stale state
    * postings must still be dropped — and reuses the already-pinned delta
    * so each batch tokenizes once.
    */
  final class IndexIngest(state0: DataFrame, id: Column, text: Column)
      extends FoldIngest(state0) {
    override protected def mkDelta(state: DataFrame,
        batch: DataFrame): DataFrame =
      graft.operators.TextIndex.postings(batch, id, text)
    override protected def fold(state: DataFrame, batch: DataFrame,
        delta: DataFrame): DataFrame =
      graft.operators.TextIndex.postingsIncrementalFrom(
        state, batch.select(id.as("doc_id")), delta)
  }

  /** Streaming bigram-LM maintenance: each micro-batch's counts
    * ([[graft.operators.TextIndex.bigramLmCounts]]) fold ADDITIVELY into
    * the model via [[graft.operators.TextIndex.foldLmCounts]];
    * `current` always exposes the up-to-date count table, ready for
    * [[graft.operators.TextIndex.lmScoreAgainst]] — the
    * screen-while-you-ingest composition. One structural difference from
    * [[IndexIngest]]: the fold is additive, NOT replace-keyed, so the
    * batchId replay guard is LOAD-BEARING — an unguarded re-fold of a
    * retried batch would double-count it (replace semantics merely waste
    * work). Same pin lifecycle: superseded state and delta pins freed
    * every batch, keeping executor storage at O(model), not
    * O(batches × model).
    */
  final class LmIngest(state0: DataFrame, text: Column)
      extends FoldIngest(state0) {
    override protected def mkDelta(state: DataFrame,
        batch: DataFrame): DataFrame =
      graft.operators.TextIndex.bigramLmCounts(batch, text)
    override protected def fold(state: DataFrame, batch: DataFrame,
        delta: DataFrame): DataFrame =
      graft.operators.TextIndex.foldLmCounts(state, delta)
  }

  /** Streaming token-unigram-count maintenance: each micro-batch's
    * [[graft.operators.TextIndex.tokenFpCounts]] fold ADDITIVELY into the
    * (fp, c) count table via
    * [[graft.operators.TextIndex.foldTokenCounts]]; `current` is always
    * ready for
    * [[graft.operators.TextIndex.corpusDivergenceFromCounts]] — the
    * drift-monitor-while-you-ingest composition (watch a live corpus's
    * token distribution walk away from a frozen reference). Additive like
    * [[LmIngest]], so the batchId replay guard is LOAD-BEARING: an
    * unguarded re-fold double-counts the batch. Same pin lifecycle.
    */
  final class TokenCountIngest(state0: DataFrame, text: Column)
      extends FoldIngest(state0) {
    override protected def mkDelta(state: DataFrame,
        batch: DataFrame): DataFrame =
      graft.operators.TextIndex.tokenFpCounts(batch, text)
    override protected def fold(state: DataFrame, batch: DataFrame,
        delta: DataFrame): DataFrame =
      graft.operators.TextIndex.foldTokenCounts(state, delta)
  }

  /** Streaming funnel tracker: keyed state carries each user's
    * (depth, last-step timestamp) across micro-batches; every batch
    * re-emits the user's current depth (Update mode). Within a batch the
    * user's events fold in (ts, type) order, so the semantics match
    * [[graft.operators.EventAnalytics.funnel]]'s greedy strict-order
    * chain exactly WHEN events arrive batch-ordered; a step event landing
    * in an earlier batch than its predecessor is gone (state never
    * rewinds) — the documented streaming relaxation, same as any
    * cross-batch ordering contract. State is 12 bytes per user.
    */
  def funnelIngest(df: DataFrame, user: Column, tsNanos: Column,
      eventType: Column, steps: Seq[String])
      : org.apache.spark.sql.Dataset[(Long, Int)] = {
    require(steps.nonEmpty, "need at least one funnel step")
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val tupEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaLong, Encoders.STRING)
    implicit val stEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt)
    val keyed = df
      .select(user.cast("long").as("u"), tsNanos.cast("long").as("ts"),
        eventType.as("et"))
      .filter(col("et").isin(steps: _*))
      .as[(Long, Long, String)]
      .groupByKey(_._1)(Encoders.scalaLong)
    keyed.mapGroupsWithState[(Int, Long), (Long, Int)](
      GroupStateTimeout.NoTimeout()) {
      (u: Long, rows: Iterator[(Long, Long, String)],
          state: org.apache.spark.sql.streaming.GroupState[(Int, Long)]) =>
        var (d, t) = state.getOption.getOrElse((0, Long.MinValue))
        rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, et) =>
          if (d < steps.size && et == steps(d) && ts > t) { d += 1; t = ts }
        }
        state.update((d, t))
        (u, d)
    }
  }

  /** Novelty-gated admission for continuous ingestion: each micro-batch
    * is scored with
    * [[graft.operators.Dedup.noveltyScoresAgainstFps]] against the
    * DISTINCT shingle fingerprints of everything admitted so far, docs
    * with novelty ≥ `minNovelty` are admitted (delivered via
    * `onSurvivors`), and the admitted docs' fingerprints fold into the
    * state — the content-overlap crawl gate ("only keep pages that add
    * ≥ 30% new n-grams"), one rung coarser than near-dup admission
    * (which pairs documents; this thresholds aggregate overlap with the
    * WHOLE admitted corpus).
    *
    * Admission unit is the BATCH: batch members are scored against the
    * pre-batch state only, never against each other (two mutually-
    * duplicate docs in one batch are both admitted — run the batch
    * operator inside the handler first if intra-batch screening
    * matters). Replay-idempotent: a redelivered batch re-emits its
    * recorded survivors without re-folding. State is the admitted
    * corpus's distinct (sfp) longs — O(corpus shingles), the
    * [[IndexIngest]] state class — and superseded pins are freed per
    * batch so executor storage stays O(state), not O(batches × state).
    * Survivors must be fully consumed before the next batch is applied
    * (the localCheckpoint truncation contract of the other handlers).
    */
  final class NoveltyIngest(state0: DataFrame, id: Column, text: Column,
      minNovelty: Double, shingleK: Int = 3) extends FoldIngest(state0) {
    require(minNovelty >= 0 && minNovelty <= 1,
      s"minNovelty out of [0,1]: $minNovelty")

    // the delta here is the ADMITTED batch docs — scored against the
    // current state, which is why mkDelta receives it
    override protected def mkDelta(state: DataFrame,
        batch: DataFrame): DataFrame = {
      val scored = graft.operators.Dedup.noveltyScoresAgainstFps(
        batch, id, text, state, shingleK)
      // unique right-side name so the caller's id expression can only
      // resolve against the batch in the join condition
      val admitted = scored
        .filter(col("novelty") >= minNovelty)
        .select(col("doc_id").as("__adm_id"))
      batch.join(admitted, id === col("__adm_id"), "semi")
    }

    override protected def fold(state: DataFrame, batch: DataFrame,
        delta: DataFrame): DataFrame =
      state
        .unionByName(graft.operators.Dedup.corpusShingleFps(
          delta, text, shingleK))
        .distinct()

    /** Domain alias for [[onDelta]]: admitted-docs consumers. */
    def onSurvivors: (DataFrame, Long) => Unit = onDelta
    def onSurvivors_=(f: (DataFrame, Long) => Unit): Unit = { onDelta = f }
  }

  /** Streaming companion of
    * [[graft.operators.EventAnalytics.eventTransitions]]: emits one
    * (user, from_type, to_type) row per observed session transition,
    * maintaining each user's LAST event as 24-byte keyed state so a
    * transition spanning a micro-batch boundary (last event of batch N →
    * first event of batch N+1) is still produced — the cross-batch edge
    * a per-batch window recompute would silently drop. Aggregate the
    * emitted rows downstream for the running transition matrix.
    *
    * Replay contract (the [[funnelIngest]] stance): within a batch,
    * events fold in (ts, tieBreak) order regardless of arrival order;
    * ACROSS batches, the stream must deliver each user's events in
    * (ts, tieBreak) order (the Kafka-keyed-by-user layout — note the
    * TIEBREAK is part of the boundary contract too: two equal-ts events
    * split across batches in tiebreak-reversed order fold in arrival
    * order, not tiebreak order). A late event that time-travels behind
    * the stored state produces the transitions of its ARRIVAL position,
    * exactly like every stateful operator without a watermark-delayed
    * reorder buffer. When batches partition the stream in per-user
    * (ts, tieBreak) order, the emitted multiset equals the batch
    * operator's transitions over the union of all batches. State per
    * user: 16 bytes (last ts + type).
    */
  def transitionsIngest(df: DataFrame, user: Column, tsNanos: Column,
      eventType: Column, tieBreak: Column,
      sessionGapNanos: Long = 1800L * 1000000000L)
      : org.apache.spark.sql.Dataset[(Long, String, String)] = {
    require(sessionGapNanos > 0,
      s"sessionGapNanos must be positive, got $sessionGapNanos")
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong)
    implicit val stEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.STRING, Encoders.STRING)
    val keyed = df
      .select(user.cast("long").as("u"), tsNanos.cast("long").as("ts"),
        eventType.as("et"), tieBreak.cast("long").as("tb"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)(Encoders.scalaLong)
    keyed.flatMapGroupsWithState[(Long, String), (Long, String, String)](
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      (u: Long, rows: Iterator[(Long, Long, String, Long)],
          state: org.apache.spark.sql.streaming.GroupState[(Long, String)]) =>
        var last = state.getOption
        val out = Seq.newBuilder[(Long, String, String)]
        rows.toSeq.sortBy(r => (r._2, r._4)).foreach { case (_, ts, et, _) =>
          last match {
            case Some((pts, pet)) if ts - pts <= sessionGapNanos =>
              out += ((u, pet, et))
            case _ => ()
          }
          last = Some((ts, et))
        }
        last.foreach(state.update)
        out.result().iterator
    }
  }

  /** events table → typed event-time column, normalizing whichever
    * physical type `ts` arrived as: BIGINT epoch nanoseconds (the
    * TIMESTAMP(NANOS) parquet encoding under `nanosAsLong` — truncated to
    * the microsecond Spark can represent) or a timestamp column directly
    * (TIMESTAMP(MICROS); NTZ values are wall-clock UTC under the engine's
    * UTC session zone, so the cast is exact). See `queries.T.events` for
    * the same dual-encoding note on the batch side.
    */
  def withEventTime(events: DataFrame, tsCol: String = "ts",
      out: String = "event_time"): DataFrame =
    events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        events.withColumn(out, timestamp_micros(expr(s"$tsCol DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.TimestampType =>
        events.withColumn(out,
          col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case other => throw new IllegalStateException(
        s"$tsCol arrived as unsupported event-time type $other")
    }

  /** Tumbling-window counts per key with a watermark: the canonical
    * windowed aggregation (append-safe on streams).
    */
  def windowedCounts(df: DataFrame, eventTime: Column, key: Column,
      windowDur: String, watermark: String): DataFrame =
    df.withColumn("__et", eventTime)
      .withWatermark("__et", watermark)
      .groupBy(window(col("__et"), windowDur).as("w"), key)
      .agg(count(lit(1)).as("n"))

  /** Streaming trending terms: per event-time window, the topN estimated-
    * frequency tokens via the mergeable Misra-Gries sketch — the sketch
    * family under Structured Streaming. The streaming state per open
    * window is ONE k-bounded MG buffer (however many distinct tokens
    * stream through), and micro-batch partials merge into it with the
    * same associative merge the batch path shuffles — an exact
    * `groupBy(window, term).count()` would instead hold state per
    * DISTINCT (window, term), unbounded on an open vocabulary. Runs
    * identically in batch (used by the spec's batch-equivalence check).
    */
  def trendingTerms(df: DataFrame, eventTime: Column, text: Column,
      windowDur: String, watermark: String,
      k: Int = 1024, topN: Int = 10): DataFrame =
    df.withColumn("__et", eventTime)
      .withWatermark("__et", watermark)
      .select(col("__et"),
        explode(graft.functions.TextFunctions.tokensWs(text)).as("term"))
      .groupBy(window(col("__et"), windowDur).as("w"))
      .agg(graft.functions.FrequencySketch.mgTopK(k, topN)(col("term"))
        .as("top"))
      .select(col("w.start").as("win_start"),
        posexplode(col("top")).as(Seq("pos", "kv")))
      .select(col("win_start"), (col("pos") + 1).as("rank"),
        col("kv._1").as("term"), col("kv._2").as("cnt"))

  /** Streaming windowed quantiles: per event-time window, discrete
    * quantile estimates of a value column via the mergeable KLL sketch —
    * the latency-percentile dashboard query. Same state discipline as
    * [[trendingTerms]]: one O(k log(n/k)) buffer per open window instead
    * of every raw value; exact (== percentile_disc) while a window's
    * count stays within sketch capacity. Runs identically in batch.
    */
  def windowQuantiles(df: DataFrame, eventTime: Column, value: Column,
      windowDur: String, watermark: String,
      probs: Seq[Double] = Seq(0.5, 0.9, 0.99), k: Int = 1024): DataFrame = {
    // label from the decimal form of p (not a rounded percent, which
    // conflates 0.995 and 1.0): p = 0.5 → p50, 0.125 → p12_5
    val labels = probs.map(p =>
      "p" + (BigDecimal(p.toString) * 100).underlying
        .stripTrailingZeros.toPlainString.replace(".", "_"))
    require(labels.distinct.size == labels.size,
      s"probs must yield distinct column labels, got $labels")
    df.withColumn("__et", eventTime)
      .withWatermark("__et", watermark)
      .select(col("__et"), value.cast("double").as("v"))
      // null/uncastable AND NaN values never reach the sketch (nulls by
      // its contract, NaNs because reduce skips them), so filter BOTH
      // before counting — n must describe the sketch's population or the
      // capacity/exactness claims key to the wrong count
      .filter(col("v").isNotNull && !isnan(col("v")))
      .groupBy(window(col("__et"), windowDur).as("w"))
      .agg(graft.functions.QuantileSketch.kllQuantiles(k, probs)(col("v"))
          .as("qs"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("win_start") +:
        labels.zipWithIndex.map { case (l, i) => col("qs")(i).as(l) } :+
        col("n"): _*)
  }

  /** Gap-based sessionization via the native session_window operator —
    * replaces hand-rolled lag/flag logic in streaming contexts and runs
    * identically in batch (used by the session-window oracle query).
    */
  def sessionCounts(df: DataFrame, eventTime: Column, key: Column,
      gap: String, watermark: String): DataFrame =
    df.withColumn("__et", eventTime)
      .withWatermark("__et", watermark)
      .groupBy(session_window(col("__et"), gap).as("w"), key)
      .agg(count(lit(1)).as("n"))

  /** Session transcripts under Structured Streaming: the streaming run of
    * [[graft.operators.EventAnalytics.sessionTranscripts]] — each closed
    * session window emits ONE assembled "role: content" transcript (the
    * SFT/dialog record), ordered by the same (event time, role, content)
    * full tie-break, NULL content reading as ''. Append mode + the
    * watermark close sessions; state per open session is that session's
    * turns (bound it upstream with a turn cap where bot sessions are a
    * risk).
    *
    * Boundary note: the native session_window treats a gap of EXACTLY
    * `gap` as a new session (events extend a window while strictly
    * inside it), where the batch operator's `ts − prev > gap` rule keeps
    * it — the two agree everywhere except that exact boundary (the usual
    * open/closed-interval difference; StreamsSpec pins equality off the
    * boundary).
    */
  def sessionTranscripts(df: DataFrame, eventTime: Column, user: Column,
      role: Column, content: Column, gap: String,
      watermark: String): DataFrame =
    df.withColumn("__et", eventTime)
      .withWatermark("__et", watermark)
      .groupBy(session_window(col("__et"), gap).as("w"),
        user.as("user_id"))
      .agg(count(lit(1)).as("n_turns"),
        array_join(transform(
          array_sort(collect_list(struct(col("__et").as("t"),
            // role coalesces too: concat(NULL, ...) would NULL the line
            // and array_join would then DROP it while n_turns counts it
            coalesce(role, lit("")).as("r"),
            coalesce(content, lit("")).as("c")))),
          e => concat(e.getField("r"), lit(": "), e.getField("c"))), "\n")
          .as("transcript"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_turns"), col("transcript"))

  /** Cross-batch exact dedup on a key column: keyed boolean state remembers
    * seen keys, first arrival wins, later duplicates (same or later
    * micro-batch) are dropped. State grows with distinct keys — bound it
    * with content-hash keys (16 bytes/doc) and state-store TTL in
    * production. Update output mode.
    */
  def dedupByKey(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = df.schema
    implicit val rowEnc = Encoders.row(schema)
    implicit val tupEnc = Encoders.tuple(Encoders.STRING, rowEnc)
    val keyed = df.withColumn("__graft_key", key.cast("string"))
      .map(r => (r.getString(schema.size), Row.fromSeq(r.toSeq.dropRight(1))))(tupEnc)
      .groupByKey(_._1)(Encoders.STRING)
    keyed.flatMapGroupsWithState[Boolean, Row](
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      (_: String, rows: Iterator[(String, Row)], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else { state.update(true); rows.take(1).map(_._2) }
    }(Encoders.scalaBoolean, rowEnc)
  }

  /** Watermark-bounded streaming dedup: the built-in
    * `dropDuplicatesWithinWatermark` — duplicates arriving within the
    * watermark horizon of the first occurrence are dropped, and the keyed
    * state EXPIRES with the watermark, so memory is bounded by horizon ×
    * arrival rate instead of growing with distinct keys forever
    * ([[dedupByKey]] is the exact-forever variant; this is the production
    * default at 100 TB/day ingest).
    */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String],
      eventTime: String, delay: String): DataFrame =
    df.withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream inner join (the impressions⋈clicks shape):
    * equality on `keys` plus `rightTime ∈ [leftTime, leftTime + within]`.
    * Both sides carry watermarks so Spark can bound the join state — without
    * the time-range condition state would grow unboundedly. Right-side key
    * columns are renamed internally so the explicit condition is
    * unambiguous, then dropped.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      leftDelay: String, rightDelay: String, within: String): DataFrame = {
    require(keys.nonEmpty, "stream-stream join needs at least one equality key")
    val l = left.withWatermark(leftTime, leftDelay)
    val renamed = keys.map(k => k -> s"__r_$k")
    val r = renamed.foldLeft(right.withWatermark(rightTime, rightDelay)) {
      case (d, (k, rk)) => d.withColumnRenamed(k, rk)
    }
    val cond = renamed.map { case (k, rk) => col(k) === col(rk) }.reduce(_ && _) &&
      col(rightTime) >= col(leftTime) &&
      col(rightTime) <= col(leftTime) + expr(s"INTERVAL $within")
    l.join(r, cond, "inner").drop(renamed.map(_._2): _*)
  }

  /** File-source stream over parquet files with an explicit schema — the
    * zero-egress stand-in for a Kafka readStream; swap
    * `readStream.format("kafka")` in production, the transforms above are
    * source-agnostic. The source needs a directory, so single-file inputs
    * pass their parent dir + a glob filter.
    */
  def parquetStream(spark: SparkSession, dir: String, schemaFrom: DataFrame,
      glob: Option[String] = None): DataFrame = {
    val r = spark.readStream.schema(schemaFrom.schema)
    glob.fold(r)(g => r.option("pathGlobFilter", g)).parquet(dir)
  }

  /** Streaming pairwise-preference aggregation: fold each micro-batch of
    * comparison ballots into a per-item (wins, n) count state — the
    * sufficient statistic of [[graft.operators.Preference.winRates]] —
    * so a reward-data pipeline keeps live item rankings while comparisons
    * stream in. `rates(z)` derives win-rate + Wilson bound from the
    * current counts map-only; after any prefix of batches it equals the
    * batch operator run over the same ballots (StreamsSpec asserts the
    * fold ≡ batch multiset).
    *
    * Same contracts as the other ingest handlers: replay-idempotent (a
    * redelivered last batch does not double-count), state pinned via
    * localCheckpoint with superseded pins freed per batch (storage stays
    * O(items), not O(batches × items)), and `current` snapshots are
    * invalidated by the next applied batch.
    */
  final class PreferenceIngest(state0: DataFrame, winner: Column,
      loser: Column) extends FoldIngest(state0) {
    override protected def mkDelta(state: DataFrame,
        batch: DataFrame): DataFrame =
      graft.operators.Preference.ballotCounts(batch, winner, loser)
    override protected def fold(state: DataFrame, batch: DataFrame,
        delta: DataFrame): DataFrame =
      state.unionByName(delta)
        .groupBy(col("item"))
        .agg(sum(col("wins")).as("wins"), sum(col("n")).as("n"))

    /** Rankings derived from the current counts (map-only). */
    def rates(z: Double = 1.96): DataFrame =
      graft.operators.Preference.ratesFromCounts(current, z)
  }

  /** Streaming DPO-pair maintenance: fold each micro-batch of
    * prompt-grouped comparison ballots into the (prompt, item, wins, n)
    * count state — the sufficient statistic of
    * [[graft.operators.Preference.dpoPairs]] — so the training-pair
    * table stays live while annotation ballots stream in. `pairs()`
    * derives the (prompt, chosen, rejected) records from the current
    * counts; after any prefix of batches it equals the batch operator
    * over the same ballots. Additive fold ⇒ the scaffold's batchId
    * replay guard is LOAD-BEARING (a re-fold double-counts), same as
    * [[LmIngest]].
    */
  final class DpoIngest(state0: DataFrame, prompt: Column, winner: Column,
      loser: Column) extends FoldIngest(state0) {
    override protected def mkDelta(state: DataFrame,
        batch: DataFrame): DataFrame =
      graft.operators.Preference.dpoCounts(batch, prompt, winner, loser)
    override protected def fold(state: DataFrame, batch: DataFrame,
        delta: DataFrame): DataFrame =
      state.unionByName(delta)
        .groupBy(col("prompt"), col("item"))
        .agg(sum(col("wins")).as("wins"), sum(col("n")).as("n"))

    /** Training pairs derived from the current counts. */
    def pairs(minMargin: Double = 0.0): DataFrame =
      graft.operators.Preference.dpoFromCounts(current, minMargin)
  }

  /** Run a streaming DataFrame into an in-memory sink until exhausted;
    * returns the result table name. Complete mode: deterministic final state
    * for finite inputs regardless of micro-batch boundaries.
    */
  def drainToMemory(df: DataFrame, name: String,
      outputMode: String = "complete"): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    q
  }
}
