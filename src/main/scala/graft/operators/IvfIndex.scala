package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IVF (inverted-file) approximate k-NN — the 100 TB scale path
  * (SURVEY §7.1 step 7; faiss IVF-Flat semantics: exact search inside
  * probed cells). The reference's index is exact faiss Flat
  * (`/root/reference/vsu/base/VectorSearchBase.py:54-59`); brute-force
  * [[Similarity.topK]] matches that. This index trades recall for a
  * `nprobe/nClusters` scan fraction:
  *
  *  - '''build''': seeded Lloyd's k-means on a sample (one
  *    vec_sum-aggregate job per iteration) → centroids on the driver
  *    (nClusters × dim floats — tiny); every row gets a `cluster`
  *    column via one codegen'd nearest-centroid kernel expression.
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

  /** Batch ANN join: approximate top-k corpus neighbors for EVERY row
    * of a query DataFrame — the scale path when the query side is too
    * big for [[Similarity.topKJoin]]'s broadcast (millions of queries ×
    * billions of corpus rows). No broadcast, no all-pairs: each query
    * expands to its `nprobe` nearest cells (one codegen'd
    * multi-probe kernel — the centroid matrix is the only driver-side
    * state), candidates meet in a hash join keyed by cell id, exact
    * distances run inside probed cells only, and a rank-limit window
    * (WindowGroupLimit pushes the top-k below the shuffle) keeps k per
    * query. Hot cells skew the join the same way hot keys skew any
    * join — AQE skew splitting applies.
    *
    * Returns (queryIdCol, idCol, distance), ascending per query. */
  def queryBatch(queries: DataFrame, queryIdCol: String,
      queryVecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    require(nprobe >= 1 && nprobe <= nClusters,
      s"nprobe must be in [1, $nClusters]")
    require(queryIdCol != idCol,
      s"query id column '$queryIdCol' must differ from corpus id '$idCol'")
    // the join/window below introduce these names; a corpus column with
    // the same name would be ambiguous or silently clobbered
    for (reserved <- Seq("__qid", "__qv", "__rn", "distance"))
      require(!assigned.columns.contains(reserved),
        s"corpus frame must not contain a column named '$reserved'")
    import graft.functions.VectorFunctions.{nearest_centroids, squared_l2}
    import org.apache.spark.sql.expressions.Window
    val probes = queries
      .select(col(queryIdCol).as("__qid"), col(queryVecCol).as("__qv"))
      .select(col("__qid"), col("__qv"),
        explode(nearest_centroids(col("__qv"), centroids, nprobe))
          .as(IvfIndex.ClusterCol))
    val w = Window.partitionBy("__qid")
      .orderBy(col("distance").asc, col(idCol).asc)
    probes.join(assigned, Seq(IvfIndex.ClusterCol))
      .withColumn("distance", squared_l2(col("__qv"), col(vecCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("__qid").as(queryIdCol), col(idCol), col("distance"))
  }

  /** Persist partitioned by cluster: downstream reads of a probed
    * query prune to nprobe directories (`PartitionFilters` in the
    * scan). */
  def writePartitioned(path: String): Unit =
    assigned.write.mode("overwrite")
      .partitionBy(IvfIndex.ClusterCol).parquet(path)

  /** Incrementally extend the index: new rows get cells from the
    * EXISTING centroids (the same narrow codegen'd kernel — no refit,
    * no shuffle, no touch of prior rows). This is the streaming-ingest
    * contract: assignment quality degrades only as far as the data
    * drifts from the trained centroids; call [[refreshCentroids]]
    * periodically to re-center. */
  def append(newRows: DataFrame): IvfIndex =
    new IvfIndex(centroids,
      assigned.unionByName(IvfIndex.assignCells(newRows, vecCol, centroids)),
      vecCol, idCol)

  /** Append-only write of NEW rows into an existing partitioned layout
    * (see [[writePartitioned]]): only the incoming batch's cell
    * directories gain files; the rest of the lake is untouched. */
  def appendPartitioned(path: String, newRows: DataFrame): Unit =
    IvfIndex.assignCells(newRows, vecCol, centroids)
      .write.mode("append").partitionBy(IvfIndex.ClusterCol).parquet(path)

  /** Per-cell health: row count plus quantization error (squared-L2 of
    * each row's residual against its OWN centroid — for rows assigned
    * by [[IvfIndex.assignCells]] this is also the nearest-centroid
    * distance, so it grows exactly as appended data drifts from the
    * trained centroids). One partial-aggregated `groupBy` job whose
    * output is nClusters rows; cells currently empty are absent.
    * Returns (cluster, n, mean_sq_err, max_sq_err). */
  def cellStats: DataFrame = {
    import graft.functions.VectorFunctions.{cell_residual, vec_dot}
    assigned
      .withColumn("__r",
        cell_residual(col(IvfIndex.ClusterCol), col(vecCol), centroids))
      .withColumn("__qe", vec_dot(col("__r"), col("__r")))
      .groupBy(IvfIndex.ClusterCol)
      .agg(count(lit(1)).as("n"), avg("__qe").as("mean_sq_err"),
        max("__qe").as("max_sq_err"))
  }

  /** Driver-side roll-up of [[cellStats]] (nClusters rows — tiny). */
  def health(): IvfIndex.Health = {
    val rows = cellStats.collect()
    val counts = rows.map(_.getLong(1))
    val total = counts.sum
    val meanErr =
      if (total == 0) 0.0
      else rows.map(r => r.getDouble(2) * r.getLong(1)).sum / total
    IvfIndex.Health(
      nCells = nClusters,
      nonEmptyCells = rows.length,
      total = total,
      maxCell = if (counts.isEmpty) 0L else counts.max,
      imbalance =
        if (total == 0) 0.0 else counts.max.toDouble / (total.toDouble / nClusters),
      meanQuantErr = meanErr,
      maxQuantErr = if (rows.isEmpty) 0.0 else rows.map(_.getDouble(3)).max)
  }

  /** Published refresh policy — when does [[refreshCentroids]] pay for
    * itself? (a) `imbalance` (hottest cell vs the uniform share)
    * beyond `maxImbalance`: probes hitting the hot cell scan that many
    * times the uniform cost, so query latency is skew-bound; (b) mean
    * quantization error grown past `errGrowth` × the baseline captured
    * at build/last-refresh time: appended data has drifted off the
    * trained centroids and recall at fixed nprobe decays. A refresh is
    * one Lloyd step, which never increases total quantization error
    * (reassign-then-recenter each monotonically reduce SSE), so when
    * this fires the refresh is guaranteed progress, not churn. */
  def needsRefresh(baseline: IvfIndex.Health,
      maxImbalance: Double = 4.0, errGrowth: Double = 1.5): Boolean = {
    val h = health()
    h.imbalance > maxImbalance ||
      (baseline.meanQuantErr > 0 &&
        h.meanQuantErr > errGrowth * baseline.meanQuantErr)
  }

  /** One Lloyd's step over the CURRENT index: recompute each cell's
    * mean (one vec_sum job — nClusters × dim doubles cross the
    * shuffle) and reassign all rows to the refreshed centroids (one
    * narrow map). Run this as the periodic offline re-center after
    * sustained appends; empty cells keep their previous centroid. */
  def refreshCentroids(): IvfIndex = {
    import graft.functions.VectorFunctions.vec_sum
    val stats = assigned.groupBy(IvfIndex.ClusterCol)
      .agg(vec_sum(col(vecCol)).as("s"), count(lit(1)).as("n"))
      .collect()
    val next = centroids.map(_.clone())
    stats.foreach { r =>
      val s = r.getSeq[Double](1)
      val n = r.getLong(2).toDouble
      next(r.getInt(0)) = s.map(x => (x / n).toFloat).toArray
    }
    new IvfIndex(next,
      IvfIndex.assignCells(assigned.drop(IvfIndex.ClusterCol), vecCol, next),
      vecCol, idCol)
  }
}

object IvfIndex {
  val ClusterCol = "cluster"

  /** Index health summary (see [[IvfIndex.health]]): `imbalance` is
    * the hottest cell's share relative to a perfectly uniform spread
    * (1.0 = uniform; k = one cell holds k× its fair share). */
  final case class Health(
      nCells: Int, nonEmptyCells: Int, total: Long, maxCell: Long,
      imbalance: Double, meanQuantErr: Double, maxQuantErr: Double)

  /** Fit centroids with a self-contained seeded Lloyd's loop, assign
    * every row its nearest centroid.
    *
    * The loop is built from this engine's own operators: cell
    * assignment is the codegen'd [[graft.functions.NearestCentroid]]
    * kernel, centroid refresh is one `groupBy(cell).agg(vec_sum, n)`
    * (partial aggregation — nClusters × dim doubles cross the
    * shuffle), so each iteration is ONE light job on the sample,
    * versus the many init+iteration jobs of an MLlib fit. Empty cells
    * keep their previous centroid.
    *
    * @param sampleFraction training sample for the fit (iteration cost
    *                       is O(sample × nClusters); the full data
    *                       only pays the final narrow assignment)
    * @param tol            early-exit threshold on the max squared-L2
    *                       centroid shift per iteration; the default 0
    *                       exits only on an exact fixpoint (assignment
    *                       is deterministic given centroids, so further
    *                       iterations cannot change anything)
    */
  def build(df: DataFrame, vecCol: String, idCol: String, nClusters: Int,
      seed: Long = 42L, sampleFraction: Double = 1.0,
      maxIter: Int = 8, tol: Double = 0.0): IvfIndex = {
    require(nClusters >= 2, "need at least 2 clusters")
    import graft.functions.VectorFunctions.vec_sum
    val sample =
      (if (sampleFraction >= 1.0) df else df.sample(sampleFraction, seed))
        .select(col(vecCol)).cache()
    try {
      var centroids = seedCentroids(sample, vecCol, nClusters, seed)
      require(centroids.length >= 2,
        s"need >= 2 distinct vectors to build $nClusters clusters")
      var it = 0
      var converged = false
      while (it < maxIter && !converged) {
        val stats = assignCells(sample, vecCol, centroids)
          .groupBy(ClusterCol)
          .agg(vec_sum(col(vecCol)).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = centroids.map(_.clone())
        stats.foreach { r =>
          val cell = r.getInt(0)
          val s = r.getSeq[Double](1)
          val n = r.getLong(2).toDouble
          next(cell) = s.map(x => (x / n).toFloat).toArray
        }
        val shift = centroids.zip(next)
          .map { case (a, b) => VectorOps.squaredL2Floats(a, b) }.max
        centroids = next
        converged = shift <= tol
        it += 1
      }
      new IvfIndex(centroids, assignCells(df, vecCol, centroids), vecCol,
        idCol)
    } finally sample.unpersist()
  }

  /** Deterministic init: nClusters DISTINCT vectors in hash order
    * (duplicate vectors — common in dedup corpora — would seed
    * identical centroids and leave cells permanently dead).
    *
    * Implemented as a single `TakeOrderedAndProject` over
    * `(hash, vector)` — a narrow top-N, no shuffle — oversampling 4×
    * and deduplicating the tiny collected slice driver-side. Duplicate
    * vectors hash identically, so they are adjacent in hash order and
    * the oversample is exhausted only under extreme duplication; the
    * full `distinct()` shuffle runs solely as that fallback. */
  private def seedCentroids(sample: DataFrame, vecCol: String,
      nClusters: Int, seed: Long): Array[Array[Float]] = {
    val hashed = sample
      .withColumn("__h", hash(col(vecCol), lit(seed.toInt)))
    val over = hashed
      .orderBy(col("__h"), col(vecCol))
      .limit(math.max(nClusters * 4, nClusters + 16))
      .collect().map(_.getSeq[Float](0).toArray)
    val distinctSeeds = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    val seen = scala.collection.mutable.HashSet[Seq[Float]]()
    for (v <- over if distinctSeeds.length < nClusters)
      if (seen.add(v.toSeq)) distinctSeeds += v
    if (distinctSeeds.length >= nClusters) distinctSeeds.toArray
    else // oversample exhausted by duplicates: exact fallback
      hashed.dropDuplicates(vecCol)
        .orderBy(col("__h"), col(vecCol)).limit(nClusters)
        .collect().map(_.getSeq[Float](0).toArray)
  }

  /** Reload a partitioned index written by [[IvfIndex.writePartitioned]]. */
  def load(spark: SparkSession, path: String,
      centroids: Array[Array[Float]], vecCol: String,
      idCol: String): IvfIndex =
    new IvfIndex(centroids, spark.read.parquet(path), vecCol, idCol)

  /** Persist the whole index under one root: the cell-partitioned
    * rows (`<path>/table`) plus the centroid matrix (`<path>/cells`) —
    * self-describing, so a search job reopens it from the path alone
    * via [[loadSaved]]. */
  def save(idx: IvfIndex, path: String): Unit = {
    idx.writePartitioned(s"$path/table")
    IndexArtifacts.writeMatrix(idx.assigned.sparkSession, idx.centroids,
      s"$path/cells")
  }

  /** Reopen a [[save]]d index. */
  def loadSaved(spark: SparkSession, path: String, vecCol: String,
      idCol: String): IvfIndex =
    new IvfIndex(IndexArtifacts.readMatrix(spark, s"$path/cells"),
      spark.read.parquet(s"$path/table"), vecCol, idCol)

  /** One Lloyd's recenter step as a cross-engine-auditable frame —
    * the oracle twin of the iteration body shared by [[IvfIndex.build]]
    * and [[refreshCentroids]]. Runs the REAL code path (the codegen'd
    * [[graft.functions.NearestCentroid]] argmin assignment, then the
    * `vec_sum` partial-aggregate recenter), but emits scalar rows
    * `(cluster, i, value, n)` with each mean rounded to decimal(18,9)
    * so the result is sum-order independent and hash-comparable against
    * a SQL engine (the `label_centroids` convention). With this, the
    * previously unoracled "Lloyd's training" exemption shrinks to just
    * the convergence LOOP — the assignment kernel and the recenter
    * arithmetic of a full iteration are machine-checked. */
  def lloydStepMeans(df: DataFrame, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    import graft.functions.VectorFunctions.vec_sum
    assignCells(df, vecCol, centroids)
      .groupBy(col(ClusterCol))
      .agg(vec_sum(col(vecCol)).as("s"), count(lit(1)).as("n"))
      .select(col(ClusterCol).cast("long").as("cluster"), col("n"),
        posexplode(col("s")).as(Seq("i", "s")))
      .select(col("cluster"), col("i").cast("long").as("i"),
        (col("s") / col("n").cast("double"))
          .cast("decimal(18,9)").cast("double").as("value"), col("n"))
      .orderBy("cluster", "i")
  }

  /** Nearest-centroid assignment as one codegen'd kernel expression —
    * the centroid matrix rides along as a reference object, so the
    * projection stays a single expression at any cluster count (an
    * argmin over N subexpressions would hit codegen size limits in the
    * thousands). Narrow map: no shuffle, no ML dependency. */
  def assignCells(df: DataFrame, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    import graft.functions.VectorFunctions.nearest_centroid
    df.withColumn(ClusterCol, nearest_centroid(col(vecCol), centroids))
  }
}
