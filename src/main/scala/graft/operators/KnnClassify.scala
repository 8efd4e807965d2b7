package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-NN majority-vote classification — the model-free counterpart of
  * the reference's MLP classifier (same contract: predict a stored
  * label column from vectors), useful when training a model is
  * overkill or labels churn faster than retraining.
  *
  * Scale shape: inherits [[Similarity.topKJoin]]'s broadcast-query
  * design (scores in a narrow map, WindowGroupLimit keeps k per query
  * before the rank shuffle), then one hash aggregation of k×queries
  * vote rows. For corpus-scale query sets, feed neighbor pairs from
  * [[IvfIndex.queryBatch]] into [[voteOnNeighbors]] instead.
  */
object KnnClassify {

  /** Predict `labelCol` for every query row as the majority label of
    * its k nearest corpus rows. Deterministic tiebreak: most votes,
    * then smallest label. Returns (queryIdCol, knn_pred, votes). */
  def predict(corpus: DataFrame, corpusVecCol: String, corpusIdCol: String,
      labelCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, k: Int = 5,
      metric: Metric = Metric.SquaredL2): DataFrame = {
    require(k > 0, "k must be positive")
    val nn = Similarity.topKJoin(
      corpus.select(col(corpusIdCol), col(corpusVecCol), col(labelCol))
        .filter(col(labelCol).isNotNull),
      queries, k, corpusIdCol, corpusVecCol, queryIdCol, queryVecCol, metric)
    voteOnNeighbors(nn, queryIdCol, labelCol)
  }

  /** Majority vote over an (queryId, label) neighbor frame — exposed
    * so ANN-sourced neighbor pairs (IVF batch join + a label re-join)
    * share the same vote semantics. */
  def voteOnNeighbors(neighbors: DataFrame, queryIdCol: String,
      labelCol: String): DataFrame = {
    for (reserved <- Seq("votes", "knn_pred", "__rn"))
      require(queryIdCol != reserved && labelCol != reserved,
        s"column name '$reserved' is reserved by the vote step — alias it")
    val votes = neighbors.groupBy(col(queryIdCol), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("votes").desc, col(labelCol).asc)
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(queryIdCol), col(labelCol).as("knn_pred"), col("votes"))
  }
}
