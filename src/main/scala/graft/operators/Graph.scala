package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain edge frames — the Pregel
  * shapes (degree, fixed-iteration PageRank) expressed as keyed
  * join/aggregate rounds, the same way [[Dedup.connectedComponents]]
  * expresses large-star/small-star. No graph library: an edge list is
  * a DataFrame, a vertex state is a DataFrame, one iteration is one
  * hash-join + one hash-aggregate — exactly the plan a 1000-executor
  * cluster runs well when edges are hash-partitioned by vertex.
  *
  * Determinism contract (oracle-replayable like Drift/Anomaly): each
  * per-edge contribution is ONE double division cast to
  * decimal(18,12), per-node sums are exact decimal (order-free), and
  * the rank update is a fixed parenthesized double expression entered
  * through the decimal→double VARCHAR bridge — so N iterations stay
  * bit-identical across engines.
  */
object Graph {

  /** Undirected degree per node from an edge list (self-loops dropped,
    * parallel edges collapsed). One distinct + one count aggregate. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    symmetrize(edges, srcCol, dstCol)
      .groupBy(col("__u").as("node"))
      .agg(count(lit(1)).as("degree"))

  /** Fixed-iteration PageRank over an UNDIRECTED edge list (the
    * TextRank setting — Mihalcea & Tarau 2004: rank tokens in a
    * co-occurrence graph; also hub scoring of near-dup graphs).
    * Symmetrized edges mean every node has degree ≥ 1, so there is no
    * dangling-mass term. `iters` is fixed (convergence-loop stopping
    * needs a driver-side delta check; at corpus scale run a few fixed
    * rounds — TextRank plateaus in ~10).
    *
    * Per iteration: contrib(u→v) = pr(u)/deg(u) — one double
    * division, cast decimal(18,12); per-node exact decimal sum;
    * pr'(v) = (1−d)/N + d·sum — fixed double ops via the VARCHAR
    * bridge. The iteration unrolls into one lazy plan; for many
    * rounds at corpus scale, checkpoint the rank frame every few
    * iterations (same guidance as connectedComponents).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      materializeEdges: Boolean = true): DataFrame = {
    require(iters >= 1, "at least one iteration")
    require(damping > 0.0 && damping < 1.0, "damping in (0,1)")
    // the symmetrized edge frame is scanned 1 + iters times (degree
    // pass + one contribution join per round): materialize it once so
    // an expensive upstream edge derivation doesn't re-run per round.
    // Pass false when edges are already a parquet scan — there the
    // rebuild is cheaper than the serialized cache (the measured
    // PrefixScan/md5Shingles tradeoff).
    val sym0 = symmetrize(edges, srcCol, dstCol)
    val sym = if (materializeEdges) sym0.localCheckpoint() else sym0
    val deg = sym.groupBy("__u").agg(count(lit(1)).as("__deg"))
    // N enters every row via a broadcast 1-row aggregate (never a
    // driver-side collect of the vertex set)
    val n = broadcast(deg.agg(count(lit(1)).as("__n")))
    var pr = deg.crossJoin(n)
      .select(col("__u"), col("__n"),
        (lit(1.0) / col("__n").cast("double")).as("__pr"))
    for (_ <- 1 to iters) {
      val contrib = sym
        .join(pr.join(deg, Seq("__u"))
          .select(col("__u"), col("__n"),
            (col("__pr") / col("__deg").cast("double"))
              .cast("decimal(18,12)").as("__c")),
          Seq("__u"))
        .groupBy(col("__v").as("__u"))
        .agg(sum(col("__c")).as("__s"), min(col("__n")).as("__n"))
      pr = contrib.select(col("__u"), col("__n"),
        (lit(1.0 - damping) / col("__n").cast("double") +
          lit(damping) *
            col("__s").cast("string").cast("double")).as("__pr"))
    }
    pr.select(col("__u").as("node"), col("__pr").as("rank"))
  }

  /** Fixed-iteration synchronous label propagation (community
    * detection, Raghavan et al. 2007) made DETERMINISTIC: every node
    * starts labeled with itself; each round it adopts the most
    * frequent label among its neighbors, ties to the SMALLEST label
    * (the argmax is a `min_by` over (−count, label) — no window, no
    * random tie order, so results replay exactly). One join + one
    * grouped aggregate per round, same Pregel-as-join-agg shape as
    * [[pageRank]]; labels are whatever ordered type the node ids are.
    *
    * Fixed `iters` for the same reason as pageRank (convergence
    * checks are driver round-trips); LPA on real graphs plateaus in
    * ~5 rounds. Oscillation on bipartite structures is inherent to
    * synchronous LPA — run an odd/even iters pair if it matters. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, materializeEdges: Boolean = true): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val sym0 = symmetrize(edges, srcCol, dstCol)
    val sym = if (materializeEdges) sym0.localCheckpoint() else sym0
    var labels = sym.select(col("__u")).distinct()
      .select(col("__u"), col("__u").as("__lbl"))
    for (_ <- 1 to iters) {
      labels = sym
        .join(labels, Seq("__u"))
        .groupBy(col("__v"), col("__lbl"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("__v").as("__u"))
        .agg(min_by(col("__lbl"),
          struct((lit(0L) - col("__c")).as("nc"), col("__lbl")))
          .as("__lbl"))
    }
    labels.select(col("__u").as("node"), col("__lbl").as("label"))
  }

  /** Both directions of each edge, self-loops dropped, null endpoints
    * dropped, parallel edges collapsed. */
  private def symmetrize(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).as("__u"), col(dstCol).as("__v"))
      .where(col("__u").isNotNull && col("__v").isNotNull &&
        col("__u") =!= col("__v"))
    e.unionByName(e.select(col("__v").as("__u"), col("__u").as("__v")))
      .distinct()
  }
}
