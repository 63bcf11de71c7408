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

  /** Character n-grams of `c` as an array column — map-only, codegen'd
    * (sliding substrings). Text shorter than `n` yields the text itself so
    * no document featurizes to nothing.
    */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) < n, array(c))
      .otherwise(transform(sequence(lit(1), length(c) - (n - 1)),
        i => substring(c, i, lit(n))))

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
