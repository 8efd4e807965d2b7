package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Maximal marginal relevance (Carbonell & Goldstein, SIGIR 1998) —
  * the standard diversity re-rank for retrieval/RAG: from a candidate
  * list, greedily pick the item maximizing
  * `λ·rel(i) − (1−λ)·max_{j∈selected} cos(v_i, v_j)` — relevance
  * traded against redundancy with what is already selected, so near-
  * duplicate passages stop crowding out coverage.
  *
  * CONTRACT (same as [[Similarity.rrfFuse]]): `candidates` is an
  * ALREADY-retrieved top-N list — driver-small by construction (this
  * re-ranks results, it does not scan corpora). The greedy loop runs
  * driver-side over the collected candidates in the exact double
  * arithmetic of the Catalyst kernels (float32 widened, sequential
  * accumulation, `dot/(‖a‖·‖b‖)` with the zero-norm → 0 guard), ties
  * broken by id ascending — so the selection is deterministic and
  * engine-reproducible, and the DuckDB twin replays it step for step.
  */
object Mmr {

  private def widen(v: Seq[Float]): Array[Double] =
    v.iterator.map(_.toDouble).toArray

  /** VectorOps.cosine's arithmetic over driver arrays. */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length,
      s"vector length mismatch: ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val (sa, sb) = (math.sqrt(na), math.sqrt(nb))
    if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
  }

  /** Greedy-select `k` of the candidates; returns (idCol, mmr_rank)
    * with rank 0 = first pick. `relCol` is the relevance score
    * (higher = better, e.g. cosine to the query); `vecCol` the
    * float32 embedding used for the redundancy term. Null vectors or
    * relevances are excluded up front.
    *
    * Id contract: `idCol` must be numeric (it is compared and emitted
    * as long; a non-numeric id would cast to null and is rejected
    * here, not silently dropped). Duplicate ids — routine when the
    * candidate list is a fusion of several retrieval lists — are
    * collapsed up front to one row per id, keeping the highest
    * relevance (ties by vector, elementwise ascending, so the pick is
    * data-deterministic, not collect-order-dependent). `maxCandidates`
    * enforces the documented driver-small contract: this re-ranks an
    * already-retrieved top-N, it does not scan corpora. */
  def select(candidates: DataFrame, idCol: String, vecCol: String,
      relCol: String, k: Int, lambda: Double = 0.5,
      maxCandidates: Int = 8192): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1]: $lambda")
    require(maxCandidates > 0, "maxCandidates must be positive")
    val raw = candidates
      // try_cast, not cast: under ANSI a malformed id would throw a
      // generic CAST_INVALID_INPUT mid-collect — null it instead and
      // raise the contract error below, which names the column
      .select(col(idCol).try_cast("long").as("__id"), col(vecCol).as("__vec"),
        col(relCol).cast("double").as("__rel"))
      .where(col("__vec").isNotNull && col("__rel").isNotNull)
    val nonNumeric = raw.where(col("__id").isNull).count()
    require(nonNumeric == 0L,
      s"$nonNumeric candidate row(s) have a null or non-numeric '$idCol' " +
        "— MMR ids must be numeric and non-null")
    val rows = raw
      .collect()
      .map(r => (r.getLong(0), widen(r.getSeq[Float](1)), r.getDouble(2)))
      // one row per id: max relevance wins; exact-tie rows are ordered
      // by their vectors elementwise so the survivor does not depend
      // on collect order
      .groupBy(_._1).valuesIterator
      .map(_.maxBy { case (_, v, rel) =>
        (rel, v.toIndexedSeq) }(Ordering.Tuple2(Ordering.Double.TotalOrdering,
          Ordering.Implicits.seqOrdering(Ordering.Double.TotalOrdering))))
      .toArray
      .sortBy(_._1)
    require(rows.length <= maxCandidates,
      s"${rows.length} candidates exceed maxCandidates=$maxCandidates: " +
        "MMR is a driver-side re-rank of an already-retrieved top-N — " +
        "retrieve fewer candidates or raise maxCandidates deliberately")
    // ids are unique after the collapse, so every loop iteration picks
    // a NEW id and the loop always terminates at min(k, rows.length)
    val selected = new java.util.BitSet(rows.length)
    val chosen = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    while (chosen.size < math.min(k, rows.length)) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      for (i <- rows.indices if !selected.get(i)) {
        val (_, v, rel) = rows(i)
        // max over selected of cos(v, v_j); empty set contributes 0
        // (first pick is pure relevance under the standard convention)
        var maxSim = 0.0
        var first = true
        var j = selected.nextSetBit(0)
        while (j >= 0) {
          val s = cos(v, rows(j)._2)
          if (first || s > maxSim) { maxSim = s; first = false }
          j = selected.nextSetBit(j + 1)
        }
        val score = lambda * rel - (1.0 - lambda) * maxSim
        // strict >: ties keep the earlier (lower-id) candidate
        if (score > bestScore) { bestScore = score; bestIdx = i }
      }
      selected.set(bestIdx)
      chosen(rows(bestIdx)._1) = (chosen.size).toLong
    }
    val spark = candidates.sparkSession
    val schema = StructType(Seq(StructField(idCol, LongType, false),
      StructField("mmr_rank", LongType, false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        chosen.toSeq.map { case (id, r) => Row(id, r) }, 1),
      schema)
  }
}
