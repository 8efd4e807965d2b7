package graft.operators

import graft.functions.VectorFunctions._
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Zero-shot classification — reference M5/M6 (`/root/reference/vsu/
  * text/_classes.py:29-44`, `/root/reference/vsu/image/_classes.py:
  * 21-36`): score every stored vector against every label vector,
  * predict the argmax label.
  *
  * Spark-first shape: the label set is tiny (a handful of class names),
  * so instead of a crossJoin + aggregation we compile the label matrix
  * into an array-of-expressions projection — each row computes its
  * score vector inside whole-stage codegen, with NO shuffle and NO
  * join. Argmax is `array_position(scores, array_max(scores))`, which
  * takes the FIRST maximal index — `np.argmax` tiebreak parity.
  *
  * Quirk Q6 parity: E5 stores unnormalized vectors and zero-shot
  * normalizes on the fly (`normalizeData = true`); CLIP stores
  * normalized vectors (`normalizeData = false`).
  */
object ZeroShot {

  /** Cosine×scale scores + argmax prediction (text/E5 variant M5).
    *
    * @param labels (label, vector) pairs; vectors are L2-normalized
    *               here (label-side normalization happens inside the
    *               reference's do_zeroshot — `text/_classes.py:33-35`)
    */
  def classify(df: DataFrame, vecCol: String,
      labels: Seq[(String, Array[Float])], scale: Double = 100.0,
      normalizeData: Boolean = true, normalizeLabels: Boolean = true,
      predCol: String = "zeroshot_pred",
      scoresCol: String = "zeroshot_scores"): DataFrame = {
    require(labels.nonEmpty, "at least one zero-shot label required")
    require(!df.columns.contains(predCol) && !df.columns.contains(scoresCol),
      s"output columns '$predCol'/'$scoresCol' collide with input columns")
    val v: Column =
      if (normalizeData) l2_normalize(col(vecCol)) else col(vecCol)
    val scoreExprs = labels.map { case (_, lv) =>
      val labelVec = if (normalizeLabels) VectorOps.l2NormalizeFloats(lv) else lv
      vec_dot(v, typedLit(labelVec)) * lit(scale)
    }
    val names = labels.map(_._1)
    val withScores = df.withColumn(scoresCol, array(scoreExprs: _*))
    withScores.withColumn(predCol,
      element_at(typedLit(names),
        array_position(col(scoresCol), array_max(col(scoresCol))).cast("int")))
  }

  /** Softmax-probability variant (CLIP image variant M6,
    * `image/_classes.py:28`): `softmax(scale * cosine)` per row, argmax
    * prediction. Probabilities are computed with the max-subtraction
    * trick for stability, sequential left-to-right sums. */
  def classifySoftmax(df: DataFrame, vecCol: String,
      labels: Seq[(String, Array[Float])], scale: Double = 100.0,
      normalizeData: Boolean = false, normalizeLabels: Boolean = true,
      predCol: String = "zeroshot_pred",
      probsCol: String = "zeroshot_probs"): DataFrame = {
    require(!df.columns.contains(probsCol),
      s"output column '$probsCol' collides with an input column")
    val raw = "__graft_raw_scores"
    val scored = classify(df, vecCol, labels, scale, normalizeData,
      normalizeLabels, predCol, raw)
    val m = array_max(col(raw))
    val exps = transform(col(raw), s => exp(s - m))
    val denom = aggregate(exps, lit(0.0), (acc, x) => acc + x)
    scored
      .withColumn(probsCol, transform(exps, x => x / denom))
      .drop(raw)
  }
}
