package graft.operators

import graft.functions.VectorOps
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IVF (inverted-file) approximate k-NN — the 100 TB scale path
  * (SURVEY §7.1 step 7; faiss IVF-Flat semantics: exact search inside
  * probed cells). The reference's index is exact faiss Flat
  * (`/root/reference/vsu/base/VectorSearchBase.py:54-59`); brute-force
  * [[Similarity.topK]] matches that. This index trades recall for a
  * `nprobe/nClusters` scan fraction:
  *
  *  - '''build''': MLlib KMeans (sampled) → centroids on the driver
  *    (nClusters × dim floats — tiny); every row gets a `cluster`
  *    column via a codegen'd nearest-centroid projection (NO MLlib
  *    transform on the full data — just squared-L2 expressions).
  *  - '''persist''': `partitionBy(cluster)` parquet. Queries filter on
  *    cluster ids → Spark partition pruning reads only nprobe
  *    directories of the lake, never the full corpus.
  *  - '''query''': rank centroids driver-side, probe the nprobe
  *    nearest cells, exact top-k inside them
  *    (`TakeOrderedAndProject`, no shuffle).
  */
final class IvfIndex(
    val centroids: Array[Array[Float]],
    val assigned: DataFrame,
    vecCol: String, idCol: String) extends Serializable {

  def nClusters: Int = centroids.length

  /** Cluster ids nearest to `q`, closest first (driver-side — the
    * centroid table is tiny by construction). */
  def rankCells(q: Array[Float]): Array[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (VectorOps.squaredL2Floats(q, c), i) }
      .sortBy { case (d, i) => (d, i) }
      .map(_._2)

  /** Approximate top-k: exact search over the `nprobe` nearest cells. */
  def query(q: Array[Float], k: Int, nprobe: Int = 4): DataFrame = {
    require(nprobe >= 1 && nprobe <= nClusters,
      s"nprobe must be in [1, $nClusters]")
    val cells = rankCells(q).take(nprobe).toSeq
    Similarity.topK(
      assigned.filter(col(IvfIndex.ClusterCol).isin(cells: _*)),
      vecCol, idCol, q, k)
  }

  /** Persist partitioned by cluster: downstream reads of a probed
    * query prune to nprobe directories (`PartitionFilters` in the
    * scan). */
  def writePartitioned(path: String): Unit =
    assigned.write.mode("overwrite")
      .partitionBy(IvfIndex.ClusterCol).parquet(path)
}

object IvfIndex {
  val ClusterCol = "cluster"

  /** Fit centroids on a sample, assign every row its nearest centroid.
    *
    * @param sampleFraction KMeans training sample (fit cost is
    *                       O(sample × nClusters) per iteration; the
    *                       full data only pays one narrow projection)
    */
  def build(df: DataFrame, vecCol: String, idCol: String, nClusters: Int,
      seed: Long = 42L, sampleFraction: Double = 1.0,
      maxIter: Int = 20): IvfIndex = {
    require(nClusters >= 2, "need at least 2 clusters")
    val sample =
      if (sampleFraction >= 1.0) df else df.sample(sampleFraction, seed)
    val feats = sample
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("__features"))
    val model = new KMeans().setK(nClusters).setSeed(seed)
      .setMaxIter(maxIter).setFeaturesCol("__features")
      .fit(feats)
    val centroids = model.clusterCenters
      .map(_.toArray.map(_.toFloat))
    new IvfIndex(centroids, assignCells(df, vecCol, centroids), vecCol, idCol)
  }

  /** Reload a partitioned index written by [[IvfIndex.writePartitioned]]. */
  def load(spark: SparkSession, path: String,
      centroids: Array[Array[Float]], vecCol: String,
      idCol: String): IvfIndex =
    new IvfIndex(centroids, spark.read.parquet(path), vecCol, idCol)

  /** Nearest-centroid assignment as a pure codegen'd projection:
    * argmin over nClusters squared-L2 expressions (same shape as the
    * zero-shot scorer — no shuffle, no MLlib dependency at read
    * time). */
  def assignCells(df: DataFrame, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    import graft.functions.VectorFunctions._
    val dists = array(centroids.map(c =>
      squared_l2(col(vecCol), typedLit(c))): _*)
    df.withColumn(ClusterCol,
      (array_position(dists, array_min(dists)) - 1).cast("int"))
  }
}
