package graft.ml

import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result of a train-and-predict-all run: predictions for EVERY stored
  * row (train+test — the reference intentionally labels the whole
  * store, `/root/reference/vsu/base/VectorSearchBase.py:232-234`) plus
  * the holdout metric. */
final case class MlpResult(predictions: DataFrame, holdoutMetric: Double)

/** MLlib bridge for the reference's sklearn MLP surface (M7/M8,
  * `/root/reference/vsu/base/VectorSearchBase.py:219-256`).
  *
  * Parity notes (SURVEY §7.4): sklearn seeds 810/1 are not
  * reproducible in MLlib — tests assert quality (accuracy threshold on
  * separable data), not identical predictions. MLlib has no MLP
  * regressor; `trainRegressor` substitutes gradient-boosted trees
  * (capability-equivalent "train a regressor on stored vectors" —
  * documented oracle omission).
  *
  * Scale: `fit` is driver-orchestrated L-BFGS; each iteration is one
  * treeAggregate over executors — no shuffle of the feature matrix.
  */
object MlpBridge {

  /** Train an MLP classifier on (vecCol → labelCol), hidden layers
    * (100,) by default like the reference (`VectorSearchBase.py:230`),
    * stratified 75/25 split, predict all rows.
    *
    * @param labelCol string or numeric label column; indexed to
    *                 0..n-1 by sorted distinct value (deterministic)
    */
  def trainClassifier(df: DataFrame, vecCol: String, labelCol: String,
      hidden: Seq[Int] = Seq(100), maxIter: Int = 300,
      seed: Long = 810L): MlpResult = {
    val clean = df.filter(col(labelCol).isNotNull && col(vecCol).isNotNull)
    // index by Spark's OWN string rendering (cast-to-string), which is
    // what the lookup probes with — JVM toString differs for
    // timestamp/decimal values and would miss the map
    val labels = clean.select(col(labelCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    require(labels.length >= 2, "need at least 2 classes")
    val labelIdx = labels.zipWithIndex
      .map { case (v, i) => v -> i.toDouble }.toMap
    // label indexing as a codegen'd map-literal lookup, not a Scala UDF
    // — stays inside whole-stage codegen (the label map is driver-sized
    // already: it was collected to index it)
    val idxMap = map(labels.zipWithIndex.flatMap { case (v, i) =>
      Seq(lit(v), lit(i.toDouble)) }: _*)
    val prepared = clean
      .withColumn("features", array_to_vector(col(vecCol).cast("array<double>")))
      .withColumn("label", element_at(idxMap, col(labelCol).cast("string")))
      .cache()
    val dim = prepared.select(size(col(vecCol))).head.getInt(0)

    // stratified 75/25: sampleBy on the label column (reference uses
    // sklearn stratified split with seed 810, VectorSearchBase.py:225)
    val fractions = labelIdx.values.map(_ -> 0.75).toMap
    val train = prepared.stat.sampleBy("label", fractions, seed)
    val testSet = prepared.exceptAll(train)

    val mlp = new MultilayerPerceptronClassifier()
      .setLayers((dim +: hidden :+ labels.length).toArray)
      .setMaxIter(maxIter)
      .setSeed(seed)
      .setFeaturesCol("features")
      .setLabelCol("label")
    val model = mlp.fit(train)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy")
      .evaluate(model.transform(testSet))
    // inverse lookup by exact class-index double — same map-literal
    // form as the indexer (predictions are exact index doubles)
    val invMap = map(labels.zipWithIndex.flatMap { case (v, i) =>
      Seq(lit(i.toDouble), lit(v)) }: _*)
    val all = model.transform(prepared)
      .withColumn("mlp_pred", element_at(invMap, col("prediction")))
      .drop("features", "label", "rawPrediction", "probability", "prediction")
      .localCheckpoint(true) // materialize so the cache can be released
    prepared.unpersist()
    MlpResult(all, acc)
  }

  /** Train a regressor on (vecCol → labelCol): GBT substitute for
    * sklearn's MLPRegressor (M8 gap), 75/25 split (non-stratified,
    * like `VectorSearchBase.py:245`), returns R² on holdout and
    * predictions for all rows. */
  def trainRegressor(df: DataFrame, vecCol: String, labelCol: String,
      maxIter: Int = 50, seed: Long = 810L): MlpResult = {
    val prepared = df
      .filter(col(labelCol).isNotNull && col(vecCol).isNotNull)
      .withColumn("features", array_to_vector(col(vecCol).cast("array<double>")))
      .withColumn("label", col(labelCol).cast("double"))
      .cache()
    val Array(train, test) = prepared.randomSplit(Array(0.75, 0.25), seed)
    val gbt = new GBTRegressor()
      .setMaxIter(maxIter)
      .setSeed(1L) // model seed 1, reference VectorSearchBase.py:247
      .setFeaturesCol("features")
      .setLabelCol("label")
    val model = gbt.fit(train)
    val r2 = new RegressionEvaluator().setMetricName("r2")
      .evaluate(model.transform(test))
    val all = model.transform(prepared)
      .withColumnRenamed("prediction", "mlp_pred")
      .drop("features", "label")
      .localCheckpoint(true)
    prepared.unpersist()
    MlpResult(all, r2)
  }

  /** Pearson correlation of prediction vs truth (A6 — the reference
    * prints `np.corrcoef`, `VectorSearchBase.py:251`). */
  def pearson(df: DataFrame, a: String, b: String): Double =
    df.agg(corr(col(a).cast("double"), col(b).cast("double"))).head.getDouble(0)
}
