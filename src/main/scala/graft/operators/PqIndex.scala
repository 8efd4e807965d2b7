package graft.operators

import graft.functions.VectorFunctions._
import graft.functions.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Product-quantization ANN — the MEMORY side of the 100 TB scale story
  * (Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011; faiss `IndexPQ` semantics). The vector is split
  * into `m` subspaces, each quantized against its own `codesPerBook`
  * centroids, so a row compresses to `m` bytes: a 64-dim float32 corpus
  * shrinks 32× (256 B → 8 B/row), which is the difference between "the
  * candidate scan fits in cluster memory" and "it does not" at 10⁹+
  * rows.
  *
  *  - '''train''': joint Lloyd's over ALL subspaces at once — the
  *    sample explodes to (sub, subvec) rows ONCE, each iteration is ONE
  *    job (codegen'd [[graft.functions.NearestSubCentroid]] assignment
  *    + `groupBy(sub, cell)` vec_sum refresh with partial aggregation),
  *    so cost does not multiply by m the way per-subspace fits would.
  *  - '''encode''': one narrow codegen'd [[graft.functions.PqEncode]]
  *    projection → `codes` frame of (id, m-byte code).
  *  - '''query''': the ADC table (m × codesPerBook squared-L2 entries
  *    from the query's subvectors to every centroid) is computed
  *    driver-side; the scan then does m BYTE-indexed lookups per row —
  *    no float math — planned as `TakeOrderedAndProject` over the
  *    codes-only columns (no shuffle, no vector reads). `refineFactor`
  *    re-ranks the ADC candidates by exact distance against the
  *    original corpus (the standard PQ re-rank): a k×refine-row join,
  *    negligible beside the scan.
  *
  * Compose with [[IvfIndex]] for IVF-PQ: partition the CODES frame by
  * the IVF cell (`IvfIndex.assignCells` on the same vectors) and probe
  * nprobe cells of the compressed table — cell pruning cuts rows
  * scanned, PQ cuts bytes per row.
  */
final class PqIndex(
    val codebooks: Array[Array[Array[Float]]],
    val corpus: DataFrame,
    val codes: DataFrame,
    vecCol: String, idCol: String) extends Serializable {

  def m: Int = codebooks.length
  def codesPerBook: Int = codebooks(0).length
  def subDim: Int = codebooks(0)(0).length

  /** ADC lookup table for `q` (see [[PqIndex.adcTable]]). */
  def adcTable(q: Array[Float]): Array[Double] = PqIndex.adcTable(codebooks, q)

  /** Approximate top-k. Returns (idCol, distance) ascending — ADC
    * distances when `refineFactor == 1`, exact squared-L2 over the
    * re-ranked `k * refineFactor` ADC candidates otherwise. */
  def query(q: Array[Float], k: Int, refineFactor: Int = 4): DataFrame = {
    require(k > 0, "k must be positive")
    require(refineFactor >= 1, "refineFactor must be >= 1")
    val table = adcTable(q)
    val cand = codes
      .withColumn("distance",
        pq_adc(col(PqIndex.CodeCol), table, codesPerBook))
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k * refineFactor)
      .select(col(idCol), col("distance"))
    if (refineFactor == 1) cand
    else cand.drop("distance")
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("distance", squared_l2(col(vecCol), typedLit(q)))
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("distance"))
  }

  /** Persist the compressed table — (id, code) only, m bytes of payload
    * per row; downstream ADC scans read THIS, never the vectors. */
  def writeCodes(path: String): Unit =
    codes.write.mode("overwrite").parquet(path)
}

/** PQ over a rotated space (see [[PqIndex.trainRotated]]): the inner
  * index holds rotated corpus + codes; queries rotate driver-side
  * (dim² flops — microseconds) and delegate. Returned distances are in
  * the rotated space, which equals the original squared-L2 up to
  * float32 rounding (orthonormal invariance). */
final class RotatedPqIndex(
    val rotation: Array[Array[Float]],
    val inner: PqIndex) extends Serializable {

  /** Driver-side rotation of a query vector (double accumulation). */
  def rotate(q: Array[Float]): Array[Float] = {
    require(q.length == rotation(0).length,
      s"query dim ${q.length} != rotation dim ${rotation(0).length}")
    rotation.map { row =>
      var acc = 0.0
      var i = 0
      while (i < row.length) { acc += row(i).toDouble * q(i); i += 1 }
      acc.toFloat
    }
  }

  def query(q: Array[Float], k: Int, refineFactor: Int = 4): DataFrame =
    inner.query(rotate(q), k, refineFactor)

  /** Codes are in the ROTATED space — reload with
    * [[PqIndex.loadRotated]] (same rotation + codebooks), never with
    * plain [[PqIndex.load]]. */
  def writeCodes(path: String): Unit = inner.writeCodes(path)
}

object PqIndex {
  val CodeCol = "pq_code"

  /** ADC lookup table: entry `s * codesPerBook + c` is the squared-L2
    * between q's s-th subvector and centroid c of codebook s
    * (driver-side — m × codesPerBook × subDim flops, microseconds). */
  def adcTable(codebooks: Array[Array[Array[Float]]],
      q: Array[Float]): Array[Double] = {
    val m = codebooks.length
    val k = codebooks(0).length
    val subDim = codebooks(0)(0).length
    require(q.length == m * subDim, s"query dim ${q.length} != ${m * subDim}")
    val t = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = q(s * subDim + i).toDouble - cent(i)
          acc += d * d
          i += 1
        }
        t(s * k + c) = acc
        c += 1
      }
      s += 1
    }
    t
  }

  /** Train codebooks on (a sample of) `df` and lazily encode the full
    * frame. `codesPerBook` ≤ 256 (one byte per subspace); `df`'s vector
    * dim must divide evenly into `m` subspaces.
    *
    * Training shape: the sample pays ONE explode into (sub, subvec)
    * rows (cached), then `maxIter` single-job Lloyd's rounds; only
    * m × codesPerBook centroid stats cross the shuffle per round. Seeds
    * are distinct subvectors in deterministic hash order, per subspace
    * (duplicate-heavy corpora would otherwise seed dead centroids);
    * under-populated subspaces pad by repeating their first seed —
    * padded duplicates never win an argmin tie, so they are inert. */
  def train(df: DataFrame, vecCol: String, idCol: String, m: Int = 8,
      codesPerBook: Int = 256, seed: Long = 42L,
      sampleFraction: Double = 1.0, maxIter: Int = 8): PqIndex =
    trainWithDim(df, vecCol, idCol, m, codesPerBook, seed, sampleFraction,
      maxIter, probeDim(df, vecCol))

  /** One first-row job to learn the vector dimension. */
  private def probeDim(df: DataFrame, vecCol: String): Int = {
    val firstRows = df.select(col(vecCol)).limit(1).collect()
    require(firstRows.nonEmpty, "cannot train PQ codebooks on an empty frame")
    firstRows(0).getSeq[Float](0).length
  }

  // package-visible so IvfPqIndex can pass the dim it already knows
  // from its coarse centroids instead of paying probeDim's extra job
  private[operators] def trainWithDim(df: DataFrame, vecCol: String, idCol: String,
      m: Int, codesPerBook: Int, seed: Long, sampleFraction: Double,
      maxIter: Int, dim: Int): PqIndex = {
    require(m >= 1, "need at least 1 subspace")
    require(codesPerBook >= 2 && codesPerBook <= 256,
      "codesPerBook must be in [2, 256] (one byte per code)")
    require(!df.columns.contains(CodeCol),
      s"input frame must not contain a column named '$CodeCol'")
    require(dim % m == 0, s"vector dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val sample =
      (if (sampleFraction >= 1.0) df else df.sample(sampleFraction, seed))
        .select(col(vecCol))
    val books = fitBooks(sample, vecCol, m, codesPerBook, seed, maxIter,
      subDim)
    new PqIndex(books, df,
      df.select(col(idCol), pq_encode(col(vecCol), books).as(CodeCol)),
      vecCol, idCol)
  }

  /** The joint-subspace Lloyd's fit on an already-sampled vectors
    * frame, returning only the codebooks (shared by [[train]] and the
    * OPQ alternation, which refits books per rotation update). */
  private def fitBooks(sample: DataFrame, vecCol: String, m: Int,
      codesPerBook: Int, seed: Long, maxIter: Int,
      subDim: Int): Array[Array[Array[Float]]] = {
    val subSlices = array((0 until m).map(s =>
      slice(col(vecCol), s * subDim + 1, subDim)): _*)
    val exploded = sample.select(posexplode(subSlices))
      .toDF("sub", "subvec").cache()
    try {
      var books = seedBooks(exploded, m, codesPerBook, seed)
      var it = 0
      var converged = false
      while (it < maxIter && !converged) {
        val stats = exploded
          .withColumn("cell",
            nearest_sub_centroid(col("sub"), col("subvec"), books))
          .groupBy("sub", "cell")
          .agg(vec_sum(col("subvec")).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = books.map(_.map(_.clone()))
        stats.foreach { r =>
          val s = r.getSeq[Double](2)
          val n = r.getLong(3).toDouble
          next(r.getInt(0))(r.getInt(1)) =
            s.map(x => (x / n).toFloat).toArray
        }
        var shift = 0.0
        for (s <- 0 until m; c <- 0 until codesPerBook)
          shift = math.max(shift,
            VectorOps.squaredL2Floats(books(s)(c), next(s)(c)))
        books = next
        converged = shift == 0.0
        it += 1
      }
      books
    } finally { exploded.unpersist(); () }
  }

  /** Seeded random orthonormal rotation (the OPQ random-rotation
    * baseline — Ge/He/Ke/Sun, "Optimized Product Quantization", CVPR
    * 2013 §4; faiss `OPQMatrix`'s random init): Gram-Schmidt over a
    * seeded Gaussian matrix, double precision driver-side. A rotation
    * spreads correlated-dimension variance across PQ subspaces, which
    * is where plain PQ loses precision when the energy concentrates in
    * a few dims. */
  def randomRotation(dim: Int, seed: Long = 7L): Array[Array[Float]] = {
    require(dim >= 1, "dim must be positive")
    val rnd = new scala.util.Random(seed)
    val basis = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    while (basis.length < dim) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      for (b <- basis) {
        var d = 0.0
        var i = 0
        while (i < dim) { d += v(i) * b(i); i += 1 }
        i = 0
        while (i < dim) { v(i) -= d * b(i); i += 1 }
      }
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 1e-8) basis += v.map(_ / n) // ~never skips at double precision
    }
    basis.map(_.map(_.toFloat)).toArray
  }

  /** Train PQ on ROTATED vectors: corpus rows pass once through the
    * codegen'd [[graft.functions.MatVec]] kernel (narrow map), queries
    * rotate driver-side. Squared-L2 is rotation-invariant, so ranks and
    * re-ranked distances match the unrotated space (up to float32
    * rounding); what changes is how variance lands across subspaces —
    * on anisotropic data the same m-byte budget quantizes finer. */
  def trainRotated(df: DataFrame, vecCol: String, idCol: String,
      m: Int = 8, codesPerBook: Int = 256, seed: Long = 42L,
      sampleFraction: Double = 1.0, maxIter: Int = 8,
      rotationSeed: Long = 7L): RotatedPqIndex = {
    import graft.functions.VectorFunctions.mat_vec
    val dim = probeDim(df, vecCol) // rotation preserves dim: probe ONCE
    val r = randomRotation(dim, rotationSeed)
    val rotated = df.withColumn(vecCol, mat_vec(col(vecCol), r))
    new RotatedPqIndex(r,
      trainWithDim(rotated, vecCol, idCol, m, codesPerBook, seed,
        sampleFraction, maxIter, dim))
  }

  /** OPQ proper — the NON-PARAMETRIC alternating optimization of
    * Ge/He/Ke/Sun, "Optimized Product Quantization", CVPR 2013 §3.2
    * (faiss `OPQMatrix`'s training loop), upgrading [[trainRotated]]'s
    * fixed random rotation: alternate
    *
    *  1. fix R → refit codebooks on the rotated sample (the shared
    *     joint-subspace Lloyd's pass), and
    *  2. fix the quantization → solve the orthogonal Procrustes
    *     problem `min_R Σᵢ ‖R xᵢ − ŷᵢ‖²` where ŷᵢ is the quantized
    *     reconstruction: maximize `tr(R · Σᵢ xᵢ ŷᵢᵀ)`, whose optimum
    *     is `R = V Uᵀ` from the SVD `Σᵢ xᵢ ŷᵢᵀ = U S Vᵀ`.
    *
    * Each alternation monotonically lowers quantization error (both
    * half-steps are exact minimizations of the shared objective), so
    * the ADC tables get strictly tighter than the random-rotation
    * baseline on anisotropic data.
    *
    * Scale shape: step 1 is the sampled Lloyd's fit (slim stats
    * shuffles only); step 2 is ONE mapPartitions pass over the cached
    * sample accumulating the dim×dim cross matrix per partition
    * (dim² doubles cross the network per partition, independent of
    * row count — the genuine per-partition-imperative case), and the
    * SVD runs driver-side on that dim×dim matrix via breeze (bundled
    * with Spark). The full corpus is touched once at the end for lazy
    * encoding. */
  def trainOpq(df: DataFrame, vecCol: String, idCol: String, m: Int = 8,
      codesPerBook: Int = 256, seed: Long = 42L,
      sampleFraction: Double = 1.0, maxIter: Int = 8, opqIters: Int = 4,
      rotationSeed: Long = 7L): RotatedPqIndex = {
    import graft.functions.VectorFunctions.mat_vec
    require(opqIters >= 1, "need at least one alternation")
    val dim = probeDim(df, vecCol)
    require(dim % m == 0, s"vector dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val spark = df.sparkSession
    val sample =
      (if (sampleFraction >= 1.0) df else df.sample(sampleFraction, seed))
        .select(col(vecCol)).cache()
    try {
      var r = randomRotation(dim, rotationSeed)
      var books: Array[Array[Array[Float]]] = null
      var it = 0
      while (it < opqIters) {
        // (1) refit codebooks for the current rotation — fewer Lloyd
        // rounds per alternation; the outer loop provides the rest
        books = fitBooks(sample.withColumn(vecCol, mat_vec(col(vecCol), r)),
          vecCol, m, codesPerBook, seed, maxIter, subDim)
        // (2) Procrustes update — skip after the last codebook fit so
        // the returned books always match the returned rotation
        if (it < opqIters - 1) {
          val bcBooks = spark.sparkContext.broadcast(books)
          val bcR = spark.sparkContext.broadcast(r)
          val cross = sample.rdd.mapPartitions { rows =>
            val bks = bcBooks.value
            val rot = bcR.value
            val acc = Array.ofDim[Double](dim, dim)
            rows.foreach { row =>
              val x = row.getSeq[Float](0).toArray
              val y = quantizeFloats(bks, matVecFloats(rot, x))
              var a = 0
              while (a < dim) {
                val xa = x(a).toDouble
                var b = 0
                while (b < dim) { acc(a)(b) += xa * y(b); b += 1 }
                a += 1
              }
            }
            Iterator(acc)
          }.reduce { (p, q) =>
            var a = 0
            while (a < dim) {
              var b = 0
              while (b < dim) { p(a)(b) += q(a)(b); b += 1 }
              a += 1
            }
            p
          }
          r = procrustesRotation(cross)
        }
        it += 1
      }
      val rotated = df.withColumn(vecCol, mat_vec(col(vecCol), r))
      new RotatedPqIndex(r, new PqIndex(books, rotated,
        rotated.select(col(idCol),
          pq_encode(col(vecCol), books).as(CodeCol)), vecCol, idCol))
    } finally { sample.unpersist(); () }
  }

  /** `R = V Uᵀ` for the cross matrix `M = Σ x ŷᵀ = U S Vᵀ` — the
    * orthogonal Procrustes optimum of `max_R tr(R M)`. */
  private def procrustesRotation(
      cross: Array[Array[Double]]): Array[Array[Float]] = {
    val dim = cross.length
    val mat = breeze.linalg.DenseMatrix.tabulate(dim, dim) {
      (i, j) => cross(i)(j)
    }
    val s = breeze.linalg.svd(mat)
    val rot = s.Vt.t * s.U.t
    Array.tabulate(dim, dim)((i, j) => rot(i, j).toFloat)
  }

  /** Driver/executor-side quantized reconstruction: each subvector is
    * replaced by its nearest codebook centroid. */
  private[operators] def quantizeFloats(books: Array[Array[Array[Float]]],
      v: Array[Float]): Array[Float] = {
    val m = books.length
    val subDim = books(0)(0).length
    val out = new Array[Float](v.length)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < books(s).length) {
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val t = v(s * subDim + i) - books(s)(c)(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      System.arraycopy(books(s)(best), 0, out, s * subDim, subDim)
      s += 1
    }
    out
  }

  private[operators] def matVecFloats(rows: Array[Array[Float]],
      x: Array[Float]): Array[Float] = {
    val out = new Array[Float](rows.length)
    var i = 0
    while (i < rows.length) {
      var s = 0.0
      var j = 0
      val row = rows(i)
      while (j < x.length) { s += row(j).toDouble * x(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /** Reload a rotated index from a codes table written by
    * [[RotatedPqIndex.writeCodes]]: pass the ORIGINAL (unrotated)
    * corpus plus the same rotation and codebooks you trained with —
    * the corpus is re-rotated through the `mat_vec` kernel (narrow
    * map, lazy) so the exact re-rank meets the codes in the same
    * space. Loading rotated codes with plain [[PqIndex.load]] would
    * silently mix spaces and return wrong neighbors. */
  def loadRotated(spark: SparkSession, codesPath: String,
      rotation: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]], corpus: DataFrame,
      vecCol: String, idCol: String): RotatedPqIndex = {
    import graft.functions.VectorFunctions.mat_vec
    val rotated = corpus.withColumn(vecCol, mat_vec(col(vecCol), rotation))
    new RotatedPqIndex(rotation,
      load(spark, codesPath, codebooks, rotated, vecCol, idCol))
  }

  /** Reload a codes table written by [[PqIndex.writeCodes]] against its
    * corpus (for the exact re-rank) and codebooks. */
  def load(spark: SparkSession, codesPath: String,
      codebooks: Array[Array[Array[Float]]], corpus: DataFrame,
      vecCol: String, idCol: String): PqIndex =
    new PqIndex(codebooks, corpus, spark.read.parquet(codesPath), vecCol,
      idCol)

  /** Persist codes AND codebooks under one root (`<path>/codes`,
    * `<path>/books`) — the fully self-describing fit-offline artifact:
    * a separate search job reopens the index from the path alone via
    * [[loadSaved]], no trained arrays carried across processes. */
  def save(idx: PqIndex, path: String): Unit = {
    idx.writeCodes(s"$path/codes")
    IndexArtifacts.writeBooks(idx.codes.sparkSession, idx.codebooks,
      s"$path/books")
  }

  /** Reopen a [[save]]d index against its corpus (exact re-rank side). */
  def loadSaved(spark: SparkSession, path: String, corpus: DataFrame,
      vecCol: String, idCol: String): PqIndex =
    load(spark, s"$path/codes",
      IndexArtifacts.readBooks(spark, s"$path/books"), corpus, vecCol,
      idCol)

  /** Persist an OPQ index: rotated-space codes, codebooks, AND the
    * rotation (`<path>/codes`, `<path>/books`, `<path>/rotation`). */
  def saveRotated(idx: RotatedPqIndex, path: String): Unit = {
    val spark = idx.inner.codes.sparkSession
    idx.writeCodes(s"$path/codes")
    IndexArtifacts.writeBooks(spark, idx.inner.codebooks, s"$path/books")
    IndexArtifacts.writeMatrix(spark, idx.rotation, s"$path/rotation")
  }

  /** Reopen a [[saveRotated]]'d index against the ORIGINAL (unrotated)
    * corpus — the corpus re-rotates through the lazy `mat_vec` kernel
    * exactly as in [[loadRotated]]. */
  def loadSavedRotated(spark: SparkSession, path: String,
      corpus: DataFrame, vecCol: String, idCol: String): RotatedPqIndex =
    loadRotated(spark, s"$path/codes",
      IndexArtifacts.readMatrix(spark, s"$path/rotation"),
      IndexArtifacts.readBooks(spark, s"$path/books"), corpus, vecCol,
      idCol)

  /** Per-subspace seeding: the first `codesPerBook` DISTINCT subvectors
    * in seeded hash order (one window pass over the exploded sample;
    * the 4× oversample absorbs duplicate-heavy data, and the collected
    * slice is m × 4k rows — driver-tiny). The window partitions by
    * `sub` (only m reducers), which is fine exactly because it runs on
    * the TRAINING SAMPLE — keep `sampleFraction` sized so the sample
    * fits a handful of executors; the full corpus never passes through
    * this window. */
  private def seedBooks(exploded: DataFrame, m: Int, codesPerBook: Int,
      seed: Long): Array[Array[Array[Float]]] = {
    val w = Window.partitionBy("sub")
      .orderBy(col("__h"), col("subvec"))
    val over = exploded
      .withColumn("__h", hash(col("subvec"), lit(seed.toInt)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= codesPerBook * 4)
      .select("sub", "subvec").collect()
    val books = Array.fill(m)(
      scala.collection.mutable.ArrayBuffer[Array[Float]]())
    val seen = Array.fill(m)(scala.collection.mutable.HashSet[Seq[Float]]())
    for (r <- over) {
      val s = r.getInt(0)
      val v = r.getSeq[Float](1)
      if (books(s).length < codesPerBook && seen(s).add(v))
        books(s) += v.toArray
    }
    books.map { b =>
      require(b.nonEmpty, "subspace has no vectors to seed from")
      // pad under-populated books with their first seed (inert: a
      // duplicate centroid never wins the lowest-index argmin tie)
      while (b.length < codesPerBook) b += b.head.clone()
      b.toArray
    }
  }
}
