package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-NN graph construction and mutual-kNN (reciprocal nearest
  * neighbor) filtering over an embedding column — the relationship
  * layer on top of [[Similarity]]'s point lookups: retrieval
  * re-ranking (reciprocal top-k is the classic re-rank signal,
  * Qin et al. 2011 "Hello neighbor"), and a higher-precision
  * candidate filter for embedding dedup (a mutual edge is a far
  * stronger near-dup signal than a one-directional one: hubs in
  * high-dim spaces appear in MANY nodes' top-k lists without those
  * nodes appearing in theirs — Radovanović et al. 2010 on hubness).
  *
  * Scale design (100 TB): the graph is built INSIDE candidate cells
  * (caller-fit or reused IVF centroids — the offline-fit / online-
  * build split of [[Dedup.semanticDedupPairsWithCentroids]]), never
  * all-pairs: cell assignment is one codegen'd kernel map, candidate
  * generation shuffles only (id, cell), vectors re-join by id exactly
  * twice, and each DISTINCT unordered pair is scored ONCE — both
  * directed ranks are derived from the same scored pair row, so the
  * score kernel cost never doubles. Per-node ranking is a
  * (src)-partitioned window whose input is already cell-bounded
  * (≤ maxCellSize neighbors per node by construction), and Spark's
  * WindowGroupLimit pushes the rank-≤-k cut below the shuffle. The
  * mutual join meets on slim (src, dst) edges — ≤ n·k rows a side.
  *
  * In-cell recall caveat (shared with SemDeDup): a true neighbor
  * assigned to a different cell is missed; identical/near-identical
  * vectors co-locate by construction. Raise recall by probing more
  * cells upstream (IVF nProbe) or accepting the one-cell contract.
  */
object KnnGraph {

  /** Directed in-cell k-NN edges: for every node, its up-to-k nearest
    * in-cell neighbors under `metric`. Ties break (score, dst ASC) so
    * the edge set is partitioning-independent. Returns
    * (src, dst, score, rank) with 1-based rank ≤ k.
    *
    * Hot cells larger than `maxCellSize` are dropped whole (the
    * [[Dedup]] candidate-join contract: a degenerate cell —
    * boilerplate embeddings, a collapsed space — would otherwise
    * explode quadratically at corpus scale; its members get no
    * edges, which the caller reads as "no reliable neighbors"). */
  def knnEdgesWithCentroids(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], k: Int,
      metric: Metric = Metric.Cosine,
      maxCellSize: Int = 10000): DataFrame = {
    require(k > 0, "k must be positive")
    require(centroids.nonEmpty, "at least one centroid")
    val assigned = IvfIndex.assignCells(
      df.select(col(idCol), col(vecCol)), vecCol, centroids)
    val slim = assigned.select(col(idCol), col(IvfIndex.ClusterCol))
    val pairs = Dedup.candidatePairs(slim, idCol,
      Seq(IvfIndex.ClusterCol), maxCellSize)
    val base = df.select(col(idCol), col(vecCol).as("__v"))
    val scored = Dedup.attachPayload(pairs, base, idCol, "__v")
      .select(col("idA"), col("idB"),
        metric.score(col("__vA"), col("__vB")).as("score"))
    // both directions from the SAME scored row: the kernel runs once
    // per distinct pair, the union is a zero-cost plan duplication of
    // the slim (id, id, score) frame
    val directed = scored.select(col("idA").as("src"),
        col("idB").as("dst"), col("score"))
      .unionByName(scored.select(col("idB").as("src"),
        col("idA").as("dst"), col("score")))
    val ord =
      if (metric.ascending) Seq(col("score").asc, col("dst").asc)
      else Seq(col("score").desc, col("dst").asc)
    val w = Window.partitionBy(col("src")).orderBy(ord: _*)
    directed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Mutual (reciprocal) k-NN edges: unordered pairs where BOTH
    * directed ranks are ≤ k. Returns (idA, idB, score), idA < idB —
    * the hubness-robust edge set for graph dedup / re-ranking.
    * The mutual meet is an inner self-join of the ≤ n·k directed
    * edge frame on swapped endpoints; keeping idA < idB halves it. */
  def mutualKnnWithCentroids(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], k: Int,
      metric: Metric = Metric.Cosine,
      maxCellSize: Int = 10000): DataFrame = {
    val edges = knnEdgesWithCentroids(df, idCol, vecCol, centroids, k,
      metric, maxCellSize)
    val fwd = edges.select(col("src"), col("dst"), col("score"))
    val rev = edges.select(col("src").as("dst"), col("dst").as("src"))
    fwd.join(rev, Seq("src", "dst"))
      .filter(col("src") < col("dst"))
      .select(col("src").as("idA"), col("dst").as("idB"), col("score"))
  }
}
