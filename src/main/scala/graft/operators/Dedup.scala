package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import scala.util.Random

/** Deduplication operators for large-scale training-data pipelines
  * (builder brief): exact first-wins, MinHash/LSH near-dup, SimHash
  * near-dup, and embedding-cosine near-dup. The reference's only dedup
  * is the first-wins target dedup (U1/J3,
  * `/root/reference/vsu/base/VectorSearchBase.py:77-94,123-124`) —
  * generalized here to arbitrary keys; the near-dup family is the
  * beyond-reference scale path.
  *
  * Scale design: every variant is bucketed — candidates meet only
  * inside a hash bucket (`groupBy`-equivalent shuffle on the bucket
  * key), NEVER via an all-pairs crossJoin. Verification (exact
  * Jaccard / cosine) runs per candidate pair only.
  */
object Dedup {

  /** Keep the first row per key under a deterministic order — the bulk
    * form of the reference's keep-first dedup (U1). One hash shuffle
    * on `keyCols`. */
  def exactFirstWins(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "key and order columns required")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** MinHash signature: `numHashes` independent min-hashes over a
    * string-array column. One-pass native expression (murmur base hash
    * per shingle + affine family) — stays in codegen, no UDF. Empty
    * shingle sets produce null signatures (filtered by callers). */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column = {
    require(numHashes >= 1, "numHashes must be >= 1")
    import org.apache.spark.sql.graftglue.SqlGlue
    SqlGlue.column(graft.functions.MinHashSignature(
      SqlGlue.expression(shingleCol), numHashes))
  }

  /** LSH band keys: hash of each `rowsPerBand`-slice of the signature.
    * Two docs with Jaccard ≥ t collide in ≥1 band with high
    * probability (t ≈ (1/bands)^(1/rowsPerBand)). */
  def minhashBands(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      hash(slice(sigCol, b * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** Near-duplicate candidate pairs via MinHash LSH banding, verified
    * by exact shingle-set Jaccard. Returns (idA, idB, jaccard) with
    * idA < idB, one row per verified pair.
    *
    * @param maxBucketSize skip pathological buckets (boilerplate/
    *                      stopword shingles) — at 100 TB a single hot
    *                      bucket would otherwise quadratically explode
    */
  def nearDupPairsMinHash(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val sh = shingles(col(textCol), shingleWidth)
    val base = df.select(col(idCol), sh.as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
    val banded = base.select(col(idCol), col("__sh"),
      posexplode(minhashBands(col("__sig"), bands, rowsPerBand))
        .as(Seq("__band", "__bh")))
    val pruned = pruneHotBuckets(banded, Seq("__band", "__bh"), maxBucketSize)
    val a = pruned.select(col("__band"), col("__bh"),
      col(idCol).as("idA"), col("__sh").as("__shA"))
    val b = pruned.select(col("__band"), col("__bh"),
      col(idCol).as("idB"), col("__sh").as("__shB"))
    a.join(b, Seq("__band", "__bh"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        jaccard(col("__shA"), col("__shB")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy("idA", "idB").agg(first("jaccard").as("jaccard"))
  }

  /** Prune buckets larger than `max` BEFORE a self-join, using a SLIM
    * count: bucket sizes come from a projection of the key columns
    * only (column pruning keeps heavy payload columns out of that
    * shuffle), then an equi-join filters the full rows. A count-window
    * over the payload-carrying frame would shuffle the heavy columns
    * an extra full pass. */
  private def pruneHotBuckets(df: DataFrame, keys: Seq[String],
      max: Int): DataFrame = {
    val keep = df.groupBy(keys.map(col): _*).count()
      .filter(col("count") <= max).drop("count")
    df.join(keep, keys)
  }

  /** Drop near-duplicates: a row is removed when ANY smaller id is its
    * verified near-duplicate (aggressive greedy — along a chain
    * A~B~C with A!~C, both B and C are dropped, because each
    * near-matches a smaller id; a transitive-closure variant that
    * keeps C would need connected components). Deterministic given
    * the pair set. */
  def dedupNearMinHash(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val pairs = nearDupPairsMinHash(df, idCol, textCol, shingleWidth,
      numHashes, bands, threshold)
    df.join(pairs.select(col("idB").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
  }

  /** SimHash near-dup candidate pairs: 64-bit signatures bucketed into
    * `bands` equal bit-slices — by pigeonhole, any pair within hamming
    * ≤ bands-1 collides in ≥1 band, so completeness is guaranteed for
    * `maxHamming ≤ bands-1` (enforced). More bands = wider guaranteed
    * radius but coarser (hotter) buckets; the bucket-size cap then
    * bounds the blowup at the cost of recall on pruned buckets.
    * Verified by exact hamming distance. */
  def nearDupPairsSimHash(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000,
      bands: Int = 4): DataFrame = {
    require(Set(2, 4, 8, 16).contains(bands), "bands must divide 64: 2/4/8/16")
    require(maxHamming >= 0 && maxHamming < bands,
      s"maxHamming=$maxHamming exceeds the guaranteed radius of " +
        s"$bands bands (${bands - 1}); raise `bands` for a wider radius")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    val sig = simhash64(col(textCol))
    val base = df.select(col(idCol), sig.as("__sig"))
    val quartered = base.select(col(idCol), col("__sig"),
      posexplode(array((0 until bands).map(q =>
        shiftright(col("__sig"), q * bits).bitwiseAND(lit(mask))): _*))
        .as(Seq("__q", "__qv")))
    val pruned = pruneHotBuckets(quartered, Seq("__q", "__qv"), maxBucketSize)
    val a = pruned.select(col("__q"), col("__qv"),
      col(idCol).as("idA"), col("__sig").as("__sigA"))
    val b = pruned.select(col("__q"), col("__qv"),
      col(idCol).as("idB"), col("__sig").as("__sigB"))
    a.join(b, Seq("__q", "__qv"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        hamming64(col("__sigA"), col("__sigB")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("idA", "idB").agg(first("hamming").as("hamming"))
  }

  /** Embedding near-dup candidate pairs: random-hyperplane LSH with
    * BAND AMPLIFICATION — `numTables` independent hash tables of
    * `planesPerTable` sign bits each; a pair is a candidate if it
    * collides in ANY table, then verified by exact cosine ≥ threshold.
    * One 12-bit code alone keeps only ~(1-θ/π)^12 ≈ 28% of
    * threshold-0.95 pairs; 4×8-bit tables keep ≈ 89%. Deterministic
    * planes from `seed`. */
  def nearDupPairsCosine(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, numTables: Int = 4,
      planesPerTable: Int = 8, seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    require(numTables >= 1 && planesPerTable >= 1 && planesPerTable <= 30,
      "need 1..30 planes per table and >= 1 table")
    val rnd = new Random(seed)
    val codes = (0 until numTables).map { _ =>
      val planes = Array.fill(planesPerTable)(
        Array.fill(dim)(rnd.nextGaussian().toFloat))
      planes.zipWithIndex.map { case (p, i) =>
        when(vec_dot(col(vecCol), typedLit(p)) > 0, lit(1 << i))
          .otherwise(lit(0))
      }.reduce(_ + _)
    }
    val base = df.select(col(idCol), col(vecCol).as("__v"),
      posexplode(array(codes: _*)).as(Seq("__table", "__bucket")))
    val pruned = pruneHotBuckets(base, Seq("__table", "__bucket"),
      maxBucketSize)
    val a = pruned.select(col("__table"), col("__bucket"),
      col(idCol).as("idA"), col("__v").as("__vA"))
    val b = pruned.select(col("__table"), col("__bucket"),
      col(idCol).as("idB"), col("__v").as("__vB"))
    a.join(b, Seq("__table", "__bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        cosine_sim(col("__vA"), col("__vB")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy("idA", "idB").agg(first("cosine").as("cosine"))
  }
}
