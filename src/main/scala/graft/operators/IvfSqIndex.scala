package graft.operators

import graft.functions.VectorFunctions._
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IVF-SQ — coarse cells prune the ROWS scanned ([[IvfIndex]] partition
  * pruning), scalar quantization shrinks the BYTES per scanned row 4×
  * ([[SqIndex]]), composed the faiss `IndexIVFScalarQuantizer` way: the
  * byte range is fitted on each vector's RESIDUAL against its cell
  * centroid — residual spread is far tighter than the raw corpus's, so
  * 8 bits buy markedly finer resolution than a global fit.
  *
  * The middle point of the compression/precision curve: cheaper to fit
  * than IVF-PQ (one min/max pass, no codebook training), 4× instead of
  * 32× compression, tighter approximate distances. Query mirrors
  * [[IvfPqIndex.query]]: rank cells driver-side, per probed cell fuse
  * reconstruct-and-distance over that cell's pruned partition with the
  * query's residual, union the nprobe branches into one global
  * top-(k·refine), re-rank exactly in the original space. No corpus
  * shuffle anywhere.
  */
final class IvfSqIndex(
    val cells: Array[Array[Float]],
    val lo: Array[Float], val step: Array[Float],
    val table: DataFrame,
    val corpus: DataFrame,
    vecCol: String, idCol: String) extends Serializable {

  def nCells: Int = cells.length
  def dim: Int = lo.length

  /** Approximate top-k: (idCol, distance) ascending — SQ-ADC residual
    * estimates when `refineFactor == 1`, exact squared-L2 over the
    * re-ranked candidates otherwise. */
  def query(q: Array[Float], k: Int, nprobe: Int = 4,
      refineFactor: Int = 4): DataFrame = {
    require(k > 0, "k must be positive")
    require(nprobe >= 1 && nprobe <= nCells,
      s"nprobe must be in [1, $nCells]")
    require(refineFactor >= 1, "refineFactor must be >= 1")
    val probed = cells.zipWithIndex
      .map { case (c, i) => (VectorOps.squaredL2Floats(q, c), i) }
      .sortBy { case (d, i) => (d, i) }
      .take(nprobe).map(_._2)
    val branches = probed.toSeq.map { cell =>
      val residQ = q.indices.map(i => q(i) - cells(cell)(i)).toArray
      table.filter(col(IvfIndex.ClusterCol) === cell)
        .withColumn("distance",
          sq_adc(col(SqIndex.CodeCol), residQ, lo, step))
        .select(col(idCol), col("distance"))
    }
    val cand = branches.reduce(_ unionByName _)
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k * refineFactor)
    if (refineFactor == 1) cand.limit(k)
    else cand.drop("distance")
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("distance", squared_l2(col(vecCol), typedLit(q)))
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("distance"))
  }

  /** Persist the codes table partitioned by cell: probed queries read
    * nprobe directories of dim-byte codes — the 100 TB layout. */
  def writeTable(path: String): Unit =
    table.write.mode("overwrite")
      .partitionBy(IvfIndex.ClusterCol).parquet(path)
}

object IvfSqIndex {

  /** Build the composed index: coarse IVF fit, residuals (one narrow
    * codegen'd map), SQ range fit on the residuals (one treeAggregate),
    * one narrow projection to the (id, cell, code) table. */
  def build(df: DataFrame, vecCol: String, idCol: String,
      nClusters: Int = 16, seed: Long = 42L,
      sampleFraction: Double = 1.0, maxIter: Int = 8): IvfSqIndex = {
    val ivf = IvfIndex.build(df, vecCol, idCol, nClusters, seed,
      sampleFraction, maxIter)
    val resid = ivf.assigned.withColumn("__resid",
      cell_residual(col(IvfIndex.ClusterCol), col(vecCol), ivf.centroids))
    val sq = SqIndex.fit(resid.select(col(idCol), col("__resid")),
      "__resid", idCol)
    // cache: queries fan into nprobe filtered branches — without this
    // each branch would recompute assignment + residual + encode; the
    // cached form is dim bytes/row (see IvfPqIndex.build's rationale)
    // null residuals (null input vectors) would encode to null codes
    // and sort NULLS FIRST into the candidate slots — drop them here,
    // matching SqIndex.fit's own null discipline
    val table = resid.where(col("__resid").isNotNull)
      .select(col(idCol), col(IvfIndex.ClusterCol),
        sq_encode(col("__resid"), sq.lo, sq.step).as(SqIndex.CodeCol))
      .cache()
    new IvfSqIndex(ivf.centroids, sq.lo, sq.step, table, df, vecCol,
      idCol)
  }

  /** Reload a partitioned codes table written by [[writeTable]]. */
  def load(spark: SparkSession, path: String, cells: Array[Array[Float]],
      lo: Array[Float], step: Array[Float], corpus: DataFrame,
      vecCol: String, idCol: String): IvfSqIndex =
    new IvfSqIndex(cells, lo, step, spark.read.parquet(path), corpus,
      vecCol, idCol)
}
