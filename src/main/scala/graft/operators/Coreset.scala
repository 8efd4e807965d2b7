package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Diversity / coverage selection over an embedding column — the
  * "pick k maximally-spread exemplars" curation primitive behind
  * coreset sampling, eval-set seeding, and labeling-budget triage
  * (cf. the reference's embedding workflows,
  * `/root/reference/vsu/text/_classes.py`; selection strategy is the
  * classic farthest-point traversal, Gonzalez 1985 — the 2-approximate
  * k-center algorithm).
  */
object Coreset {

  /** Greedy k-center (farthest-point traversal): start from the row
    * with the smallest id (deterministic seed), then repeatedly pick
    * the row FARTHEST from the already-chosen set (squared-L2; ties by
    * smallest id). Returns one row per chosen center, in pick order:
    * (round 1-based, idCol, radius) — `radius` is the chosen row's
    * distance to the prior set (the coverage radius achieved by the
    * previous round; NULL for the seed). Stops early when the corpus
    * runs out (fewer than k rows).
    *
    * Scale shape: k passes, each a NARROW map over the corpus (the
    * running min-distance is a `least(...)` over the ≤k collected
    * center vectors — centers ride the task binary like the IVF
    * centroid matrix, never a join) followed by one TakeOrdered
    * argmax (no shuffle, no global window, no pairwise blow-up).
    * Driver holds k vectors and k ids. The input should be a
    * MATERIALIZED slim (id, vec) frame: each round re-evaluates its
    * lineage, so feed a checkpointed projection, not a raw text scan.
    *
    * Determinism: distances accumulate per [[VectorOps.squaredL2]]'s
    * fixed dimension order; with integer-valued vector components
    * (the md5-embedding gate convention) every distance is an exact
    * integer in double and the whole selection is engine-replayable.
    */
  def kCenterGreedy(df: DataFrame, vecCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // the per-round least() chain and the not-yet-picked filter grow
    // the plan linearly in k, and the driver holds k vectors — the
    // "k ≤ a few hundred exemplars" contract, enforced loudly instead
    // of degrading into a plan-compile stall (for large k use
    // clustering, not farthest-point selection). 512 is where the
    // guard fires, matching the documented contract: at k≈4096 the
    // least() chain alone is a 4096-term expression and Catalyst plan
    // compilation stalls long before any data moves.
    require(k <= 512,
      s"kCenterGreedy: k=$k exceeds the selection contract (k <= 512): " +
        "each round adds a distance term and an id to the plan, so " +
        "large k stalls plan compilation and bloats the driver — use " +
        "k-means (IvfIndex.fit) for cluster-scale k")
    df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => ()
      case other => throw new IllegalArgumentException(
        s"kCenterGreedy: $vecCol must be array<float> (got $other) — " +
          "cast double embeddings with transform(v, x -> cast(x as " +
          "float)) before selecting")
    }
    val spark = df.sparkSession
    val slim = df.where(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
    val seedRow = slim.orderBy(col(idCol).asc).limit(1).collect()
    if (seedRow.isEmpty) {
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("round",
            org.apache.spark.sql.types.LongType),
          slim.schema(idCol),
          org.apache.spark.sql.types.StructField("radius",
            org.apache.spark.sql.types.DoubleType))))
    }
    val centers = scala.collection.mutable.ArrayBuffer[
      (Any, Array[Float], Option[Double])]()
    centers += ((seedRow(0).get(0),
      seedRow(0).getSeq[Float](1).toArray, None))
    var exhausted = false
    while (centers.length < k && !exhausted) {
      // running min distance to the chosen set: a pure projection
      // over the collected center vectors (k ≤ a few hundred by
      // contract — this is a SELECTION of exemplars, not clustering)
      val mind: Column = centers.map { case (_, v, _) =>
        squared_l2(col(vecCol), typedLit(v)) }
        .reduce(least(_, _))
      val pickedIds = centers.map(_._1).toSeq
      val next = slim
        .where(!col(idCol).isInCollection(pickedIds))
        .withColumn("__mind", mind)
        .orderBy(col("__mind").desc, col(idCol).asc)
        .limit(1).collect()
      if (next.isEmpty) exhausted = true
      else centers += ((next(0).get(0),
        next(0).getSeq[Float](1).toArray,
        Some(next(0).getDouble(2))))
    }
    val rows = centers.zipWithIndex.map { case ((id, _, rad), i) =>
      org.apache.spark.sql.Row((i + 1).toLong, id,
        rad.map(Double.box).orNull)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows.toSeq: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("round",
          org.apache.spark.sql.types.LongType),
        slim.schema(idCol).copy(name = idCol),
        org.apache.spark.sql.types.StructField("radius",
          org.apache.spark.sql.types.DoubleType))))
  }
}
