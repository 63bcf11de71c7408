package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable text classifier — the classifier-based curation stage of a
  * training-data pipeline (language ID backing the n-gram heuristic in
  * [[graft.functions.TextFunctions.langId]], quality scoring against
  * labeled exemplars, topic/domain routing): hashed character-n-gram
  * features into multinomial logistic regression (public fastText-style
  * recipe: bag of hashed n-grams + linear model).
  *
  * Scale shape: featurization is MAP-ONLY (the n-gram expression is a
  * codegen'd substring transform; hashing TF needs no vocabulary pass, so
  * there is no fit/transform round trip over the corpus — the feature
  * space is fixed by `dims`). Training is MLlib's distributed L-BFGS over
  * the hashed vectors; the learned model is (numClasses × dims) doubles —
  * driver-sized, broadcast for scoring. Scoring is again map-only. The
  * label index is label-space-sized (a handful of rows), collected like a
  * centroid table.
  *
  * Determinism: MLlib's L-BFGS logistic regression is deterministic
  * without a seed (no sampling anywhere in the objective), feature hashing
  * is fixed, and labels are indexed in sorted order — same model on any
  * cluster layout. Not SQL-replayable
  * (iterative optimization), so gates are spec-level, like the other
  * trained operators ([[Similarity.trainCentroids]], [[Bpe.trainBpe]]).
  */
object TextClassifier {

  /** Character n-grams of `c` as an array column — the native one-pass
    * [[org.apache.spark.sql.graft.CharNgrams]] gram kernel (the
    * declarative substring-per-position transform this replaced is
    * O(len²) per document — measured 65 s at stress ×16 on the
    * classifier before the switch, the same lesson char_trigram_profile
    * learned in round 13). Text shorter than `n` yields the text itself
    * so no document featurizes to nothing.
    */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) < n, array(c))
      .otherwise(org.apache.spark.sql.graft.TextStats.charNgrams(c, n))

  /** A trained classifier: the MLlib model plus the sorted label
    * vocabulary its numeric classes map back to, and the featurization
    * parameters scoring must reuse.
    */
  final case class Model(
      lr: org.apache.spark.ml.classification.LogisticRegressionModel,
      labels: Seq[String], n: Int, dims: Int)

  private def featurize(df: DataFrame, text: Column, n: Int, dims: Int)
      : DataFrame = {
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__terms").setOutputCol("features").setNumFeatures(dims)
    tf.transform(df.withColumn("__terms", charNgrams(text, n)))
      .drop("__terms")
  }

  /** Trains on `(text, label)` rows. `dims` is the hashed feature space
    * (2¹⁵ default — collisions are the accepted trade of vocabulary-free
    * featurization); `n` the character-gram width (3 suits language ID).
    */
  def train(df: DataFrame, text: Column, label: Column, n: Int = 3,
      dims: Int = 1 << 15, maxIter: Int = 50): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val labels = df.select(label.cast("string").as("l")).distinct()
      .as[String].collect().sorted.toSeq // label-space-sized, like centroids
    val idx = labels.zipWithIndex.map { case (l, i) => (l, i.toDouble) }
      .toDF("__label", "label")
    val prepared = featurize(
      df.select(text.as("__text"), label.cast("string").as("__label")),
      col("__text"), n, dims)
      .join(broadcast(idx), Seq("__label"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFamily("multinomial").setMaxIter(maxIter).setRegParam(1e-4)
      .setLabelCol("label").setFeaturesCol("features")
    Model(lr.fit(prepared.select(col("label"), col("features"))), labels, n, dims)
  }

  /** md5 bucket of a character n-gram — `hash32(gram) mod dims`: the
    * vocabulary-free featurization BOTH the pinned-weight apply path and
    * a SQL oracle can replay bit-for-bit (MLlib HashingTF's murmur3
    * cannot be reproduced in DuckDB, which is why [[classifyLinearPinned]]
    * does not share [[train]]'s featurizer — [[graft.tools.TrainArtifacts]]
    * trains on THIS hashing so the pinned weights match the apply path).
    */
  def hashedGramDim(gram: Column, dims: Int): Column =
    graft.functions.TextFunctions.hash32(gram) % dims

  /** The full pinned-path featurization — (id, dim, c) hashed-gram counts
    * — in ONE place, consumed by BOTH [[classifyLinearPinned]] and the
    * trainer ([[graft.tools.TrainArtifacts]]): a drift between the
    * features the weights were trained on and the features the apply
    * path computes is invisible to the oracle gate (it replays only the
    * apply side) and silently degrades predictions toward the majority
    * prior — so the two sides must SHARE the chain, not re-type it.
    *
    * `family` picks the hash: "md5" (default) is the ORACLE featurizer —
    * per-gram md5, SQL-replayable, but the md5 constant dominates the
    * classifier's cost at scale (~600 grams/doc); "fast" is the
    * PRODUCTION featurizer — the one-pass native
    * [[org.apache.spark.sql.graft.CharNgramDimCounts]] kernel (xxhash64
    * off the UTF-8 bytes, counts finished per document at map time, so
    * the (id, dim) aggregation exchange disappears too). Weights are
    * family-specific ([[graft.queries.PinnedArtifacts.LangLrWeights]] vs
    * `LangLrWeightsFast`) — NEVER apply one family's weights to the
    * other's features.
    *
    * Duplicate-id contract: "md5"'s groupBy merges rows sharing an id
    * into one (id, dim) count; "fast" stays map-only and emits one count
    * set PER INPUT ROW, so a duplicate-id frame yields duplicate
    * (id, dim) rows. Identical for every additive consumer
    * ([[linearScoresPinned]] sums either shape to the same scores —
    * spec'd); a consumer that assumes unique (id, dim) keys (sparse
    * vector assembly) must merge first, as
    * [[graft.tools.TrainArtifacts]] does.
    */
  def hashedGramCounts(df: DataFrame, id: Column, text: Column,
      n: Int, dims: Int, family: String = "md5"): DataFrame = {
    // widen before the per-gram hashing loop (the Dedup.widen rationale:
    // a single-row-group parquet file lands every document on ONE core
    // for the kernel pass; at real scale inputs arrive wide and this
    // no-ops — no shuffle added)
    val base = Dedup.widen(df.select(id.as("id"), text.as("__text")))
    family match {
      case "md5" =>
        // ONE compiled pass ([[org.apache.spark.sql.graft
        // .CharNgramMd5DimCounts]]): same md5-32 per gram, counts
        // finished per document at map time — the explode used to carry
        // every gram occurrence (with its rendered md5 hex) into the
        // (id, dim) aggregation exchange; now ≤ min(grams, dims) rows
        // per document reach it. The groupBy stays for this branch's
        // documented duplicate-id merge contract (sum of per-row counts
        // ≡ the old per-occurrence count).
        base.select(col("id"),
            explode(org.apache.spark.sql.graft.CharNgramMd5DimCounts
              .charNgramMd5DimCounts(col("__text"), n, dims)).as("__dc"))
          .select(col("id"), col("__dc.dim").cast("long").as("dim"),
            col("__dc.c").as("__c0"))
          .groupBy(col("id"), col("dim")).agg(sum(col("__c0")).as("c"))
      case "fast" =>
        base.select(col("id"),
            explode(org.apache.spark.sql.graft.CharNgramDimCounts
              .charNgramDimCounts(col("__text"), n, dims)).as("__dc"))
          .select(col("id"), col("__dc.dim").cast("long").as("dim"),
            col("__dc.c").as("c")) // long dim, like the md5 branch
      case other =>
        throw new IllegalArgumentException(
          s"unknown featurizer family '$other' (md5 | fast)")
    }
  }

  /** Apply a PINNED linear text classifier — the deployment shape of
    * classifier-based curation (fastText-style language ID / quality
    * routing): weights are trained ONCE offline
    * ([[graft.tools.TrainArtifacts]], logistic regression over
    * [[hashedGramDim]] char-n-gram counts), INTEGER-QUANTIZED at 2^20
    * fixed point, and shipped as literals — so scoring is exact integer
    * arithmetic end to end (order-free sums, no float-ordering anywhere)
    * and a SQL oracle replays the whole chain: per class,
    * score_q = bias_q + Σ_dim count(doc, dim) · w_q[class][dim]; argmax
    * with ties toward the sorted-label index.
    *
    * `weights`: (label, bias_q, w_q[dims]) rows sorted by label. Output:
    * (id, pred, score) with `score` = score_q / 2^20.
    *
    * Scale shape: one gram explode into a per-(doc, dim) count aggregate
    * (≤ dims rows per doc however long the text, map-side partials), a
    * broadcast join against the (dims × classes)-row weight table, a
    * per-(doc, class) sum and a per-doc argmax — all partial-first
    * HashAggregates on 8-byte keys; text never shuffles past the gram
    * projection. Overflow bound: count·w_q per (doc, dim) stays under
    * 2^62 for any realistic document at |w| ≤ 2^10.
    */
  def classifyLinearPinned(df: DataFrame, id: Column, text: Column,
      weights: Seq[(String, Long, Seq[Long])], n: Int = 3,
      dims: Int = 128, family: String = "md5"): DataFrame =
    linearScoresPinned(df, id, text, weights, n, dims, family)
      .groupBy(col("id"))
      .agg(max_by(struct(col("label"), col("scoreq")),
        struct(col("scoreq"), (-col("tie")).as("nt"))).as("m"))
      .select(col("id"), col("m.label").as("pred"),
        (col("m.scoreq").cast("double") / lit(1048576.0)).as("score"))

  /** The full per-class score table behind [[classifyLinearPinned]] —
    * (id, label, tie, scoreq) for EVERY class, in the same exact integer
    * arithmetic: the input to calibrated/uncertainty consumers (conformal
    * prediction sets, margin audits) that need more than the argmax.
    */
  def linearScoresPinned(df: DataFrame, id: Column, text: Column,
      weights: Seq[(String, Long, Seq[Long])], n: Int = 3,
      dims: Int = 128, family: String = "md5"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.map(_._1) == weights.map(_._1).sorted &&
      weights.map(_._1).distinct.size == weights.size,
      "weight labels must be unique and sorted")
    require(weights.forall(_._3.size == dims),
      s"every weight vector must have $dims entries")
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = broadcast(weights.zipWithIndex.flatMap {
      case ((l, _, w), i) =>
        w.zipWithIndex.map { case (wq, d) => (d, l, i.toLong, wq) }
    }.toDF("dim", "label", "tie", "wq"))
    val biases = broadcast(weights.zipWithIndex.map {
      case ((l, b, _), i) => (l, i.toLong, b)
    }.toDF("label", "tie", "biasq"))
    val counts = hashedGramCounts(df, id, text, n, dims, family)
      .withColumnRenamed("c", "__c")
    counts.join(wDf, Seq("dim"))
      .groupBy(col("id"), col("label"), col("tie"))
      .agg(sum(col("__c") * col("wq")).as("__s0"))
      .join(biases, Seq("label", "tie"))
      .select(col("id"), col("label"), col("tie"),
        (col("__s0") + col("biasq")).as("scoreq"))
  }

  /** Scores `text`, appending `out` (predicted label string). Map-only:
    * model coefficients broadcast inside MLlib's transform.
    */
  def classify(df: DataFrame, model: Model, text: Column,
      out: String = "pred"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val back = broadcast(model.labels.zipWithIndex
      .map { case (l, i) => (i.toDouble, l) }.toDF("prediction", out))
    model.lr.transform(featurize(df, text, model.n, model.dims))
      .join(back, Seq("prediction"))
      .drop("features", "rawPrediction", "probability", "prediction")
  }
}
