package graft.operators

import graft.functions.VectorFunctions._
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IVF-PQ — the composed 10⁹+-row ANN layout (faiss `IndexIVFPQ`
  * semantics): coarse cells prune the ROWS scanned (partition pruning,
  * [[IvfIndex]]), product quantization shrinks the BYTES per scanned
  * row 32× ([[PqIndex]]), and — like faiss, unlike naive composition —
  * the codebooks quantize each vector's RESIDUAL against its cell
  * centroid, whose distribution is far tighter than the raw vectors',
  * so the same codebook budget buys more precision.
  *
  * Query: rank cells driver-side, then per probed cell build the ADC
  * table for `q - cellCentroid` (driver-side, nprobe × m × k entries)
  * and scan ONLY that cell's partition of the codes table with m byte
  * lookups per row; the nprobe pruned scans union into one global
  * top-(k·refine) and the exact re-rank joins the original corpus by
  * id. Every stage is either a pruned scan, a narrow map, or a
  * TakeOrderedAndProject — no shuffle of the corpus anywhere.
  */
final class IvfPqIndex(
    val cells: Array[Array[Float]],
    val codebooks: Array[Array[Array[Float]]],
    val table: DataFrame,
    val corpus: DataFrame,
    vecCol: String, idCol: String,
    val rotation: Option[Array[Array[Float]]] = None)
    extends Serializable {

  def nCells: Int = cells.length
  def codesPerBook: Int = codebooks(0).length

  /** Approximate top-k: (idCol, distance) ascending — ADC estimates
    * when `refineFactor == 1`, exact squared-L2 over the re-ranked
    * candidates otherwise. */
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
    // per probed cell: its own residual ADC table over its own pruned
    // partition — nprobe parallel pruned scans, unioned
    val branches = probed.toSeq.map { cell =>
      val raw = q.indices.map(i => q(i) - cells(cell)(i)).toArray
      // OPQ variant: codes live in the rotated residual space, so the
      // query residual rotates driver-side before the ADC table
      val residQ = rotation.fold(raw)(PqIndex.matVecFloats(_, raw))
      val t = PqIndex.adcTable(codebooks, residQ)
      table.filter(col(IvfIndex.ClusterCol) === cell)
        .withColumn("distance",
          pq_adc(col(PqIndex.CodeCol), t, codesPerBook))
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

  /** Persist the compressed table partitioned by cell: probed queries
    * read nprobe directories of m-byte codes — the 100 TB layout. */
  def writeTable(path: String): Unit =
    table.write.mode("overwrite")
      .partitionBy(IvfIndex.ClusterCol).parquet(path)
}

object IvfPqIndex {

  /** Build the composed index: coarse IVF fit, residual computation
    * (one narrow codegen'd map), PQ fit on the residuals, then ONE
    * narrow projection to the (id, cell, code) table — no join between
    * the two stages. */
  def build(df: DataFrame, vecCol: String, idCol: String,
      nClusters: Int = 16, m: Int = 8, codesPerBook: Int = 256,
      seed: Long = 42L, sampleFraction: Double = 1.0,
      maxIter: Int = 8): IvfPqIndex = {
    val ivf = IvfIndex.build(df, vecCol, idCol, nClusters, seed,
      sampleFraction, maxIter)
    val resid = ivf.assigned.withColumn("__resid",
      cell_residual(col(IvfIndex.ClusterCol), col(vecCol), ivf.centroids))
    // dim is already known from the coarse centroids (residuals keep
    // the vector dim) — skip PqIndex.train's probeDim limit-1 job
    val pq = PqIndex.trainWithDim(resid.select(col(idCol), col("__resid")),
      "__resid", idCol, m, codesPerBook, seed, sampleFraction, maxIter,
      ivf.centroids(0).length)
    // cache the codes table: queries fan out into nprobe filtered
    // branches, and without this each branch would recompute cell
    // assignment + residual + encode over the full corpus. The cached
    // form is m bytes/row — "codes fit in memory" IS the PQ design
    // point; the durable twin is writeTable's partitioned layout.
    val table = resid.select(col(idCol), col(IvfIndex.ClusterCol),
      pq_encode(col("__resid"), pq.codebooks).as(PqIndex.CodeCol)).cache()
    new IvfPqIndex(ivf.centroids, pq.codebooks, table, df, vecCol, idCol)
  }

  /** IVF-OPQ: the faiss `OPQMatrix`-inside-IVF composition — residuals
    * pass through the OPQ-trained rotation before PQ encoding, so the
    * codebook budget adapts to the residual distribution's anisotropy
    * (rotating RESIDUALS is what faiss does; rotating raw vectors
    * would change cell geometry). Distances are rotation-invariant:
    * the ADC estimates rank the same true neighbors, and the exact
    * re-rank still runs in the ORIGINAL space against the corpus. */
  def buildOpq(df: DataFrame, vecCol: String, idCol: String,
      nClusters: Int = 16, m: Int = 8, codesPerBook: Int = 256,
      seed: Long = 42L, sampleFraction: Double = 1.0, maxIter: Int = 8,
      opqIters: Int = 3): IvfPqIndex = {
    val ivf = IvfIndex.build(df, vecCol, idCol, nClusters, seed,
      sampleFraction, maxIter)
    val resid = ivf.assigned.withColumn("__resid",
      cell_residual(col(IvfIndex.ClusterCol), col(vecCol), ivf.centroids))
    val opq = PqIndex.trainOpq(resid.select(col(idCol), col("__resid")),
      "__resid", idCol, m, codesPerBook, seed, sampleFraction, maxIter,
      opqIters)
    val table = resid
      .withColumn("__rresid", mat_vec(col("__resid"), opq.rotation))
      .select(col(idCol), col(IvfIndex.ClusterCol),
        pq_encode(col("__rresid"), opq.inner.codebooks).as(PqIndex.CodeCol))
      .cache()
    new IvfPqIndex(ivf.centroids, opq.inner.codebooks, table, df, vecCol,
      idCol, rotation = Some(opq.rotation))
  }

  /** Reload a partitioned codes table written by
    * [[IvfPqIndex.writeTable]]. */
  def load(spark: SparkSession, path: String,
      cells: Array[Array[Float]], codebooks: Array[Array[Array[Float]]],
      corpus: DataFrame, vecCol: String, idCol: String): IvfPqIndex =
    new IvfPqIndex(cells, codebooks, spark.read.parquet(path), corpus,
      vecCol, idCol)

  /** Persist the whole index under one root: the cell-partitioned
    * codes table (`<path>/table`), coarse centroids (`<path>/cells`),
    * codebooks (`<path>/books`), and — for the OPQ variant — the
    * residual rotation (`<path>/rotation`). A search job reopens
    * everything from the path via [[loadSaved]]: the honest
    * fit-offline / search-online split at 100 TB, where Lloyd's runs
    * in a scheduled build job and queries only read nprobe partition
    * directories of m-byte codes. */
  def save(idx: IvfPqIndex, path: String): Unit = {
    val spark = idx.table.sparkSession
    idx.writeTable(s"$path/table")
    IndexArtifacts.writeMatrix(spark, idx.cells, s"$path/cells")
    IndexArtifacts.writeBooks(spark, idx.codebooks, s"$path/books")
    idx.rotation.foreach(
      IndexArtifacts.writeMatrix(spark, _, s"$path/rotation"))
  }

  /** Reopen a [[save]]d index against its corpus (exact re-rank side).
    * The rotation directory's presence decides plain-vs-OPQ — the
    * artifact is self-describing. */
  def loadSaved(spark: SparkSession, path: String, corpus: DataFrame,
      vecCol: String, idCol: String): IvfPqIndex = {
    val rotation =
      if (IndexArtifacts.exists(spark, s"$path/rotation"))
        Some(IndexArtifacts.readMatrix(spark, s"$path/rotation"))
      else None
    new IvfPqIndex(
      IndexArtifacts.readMatrix(spark, s"$path/cells"),
      IndexArtifacts.readBooks(spark, s"$path/books"),
      spark.read.parquet(s"$path/table"), corpus, vecCol, idCol,
      rotation)
  }
}
