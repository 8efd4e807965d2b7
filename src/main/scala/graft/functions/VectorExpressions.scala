package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.{BinaryFloatVectorExpression, BinaryLongArrayExpression, UnaryFloatVectorExpression}
import org.apache.spark.sql.types._

/** Tight-loop kernels shared by interpreted eval and generated code.
  *
  * Reference semantics: vectors are float32 (`/root/reference/vsu/base/
  * VectorSearchBase.py:74-75`), k-NN distance is SQUARED L2 (faiss
  * IndexFlatL2 convention surfaced by sqlite-vss, `VectorSearchBase.py:
  * 193-201`), zero-shot similarity is dot product on L2-normalized
  * vectors ×100 (`/root/reference/vsu/text/_classes.py:33-36`).
  *
  * Accumulation is in double for numerical stability; element access is
  * float32 (or float64 for `array<double>` inputs — `af`/`bf` flags are
  * compile-time constants in generated code, so the JIT folds the
  * branch). A static method call keeps the expression inside whole-stage
  * codegen; the JIT inlines these loops.
  */
object VectorOps {
  @inline private def checkLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"vector length mismatch: $n vs ${b.numElements()}")
    }
    n
  }

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, i, af) * get(b, i, bf); i += 1 }
    acc
  }

  def squaredL2(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, i, af) - get(b, i, bf)
      acc += d * d
      i += 1
    }
    acc
  }

  def norm(a: ArrayData, af: Boolean): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = get(a, i, af); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  def cosine(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val na = norm(a, af)
    val nb = norm(b, bf)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b, af, bf) / (na * nb)
  }

  /** Argmin squared-L2 over a centroid matrix; lowest index wins ties. */
  def nearestCentroid(a: ArrayData, af: Boolean,
      centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = a.numElements()
      if (n != cent.length) {
        throw new IllegalArgumentException(
          s"vector length mismatch: $n vs centroid dim ${cent.length}")
      }
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = get(a, i, af) - cent(i)
        acc += d * d
        i += 1
      }
      if (acc < bestDist) { bestDist = acc; best = c }
      c += 1
    }
    best
  }

  /** Indexes of the `nprobe` nearest centroids, ascending by
    * (distance, cell id) — the multi-probe twin of [[nearestCentroid]]
    * for batch ANN joins. Selection is an insertion pass into a k-slot
    * buffer (k = nprobe is small); ties keep the lower cell id because
    * cells are scanned in id order and insertion is strict-less-than. */
  def nearestCentroids(a: ArrayData, af: Boolean,
      centroids: Array[Array[Float]], nprobe: Int): ArrayData = {
    val k = math.min(nprobe, centroids.length)
    val bestIdx = new Array[Int](k)
    val bestD = new Array[Double](k)
    java.util.Arrays.fill(bestD, Double.MaxValue)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = a.numElements()
      if (n != cent.length) {
        throw new IllegalArgumentException(
          s"vector length mismatch: $n vs centroid dim ${cent.length}")
      }
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = get(a, i, af) - cent(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD(k - 1)) {
        var j = k - 1
        while (j > 0 && acc < bestD(j - 1)) {
          bestD(j) = bestD(j - 1); bestIdx(j) = bestIdx(j - 1); j -= 1
        }
        bestD(j) = acc
        bestIdx(j) = c
      }
      c += 1
    }
    new GenericArrayData(bestIdx)
  }

  /** Product-quantization encode: per subspace, argmin squared-L2 over
    * that subspace's codebook → one unsigned byte code (Jégou et al.
    * TPAMI 2011). `codebooks(s)(c)` is centroid c of subspace s; the
    * input dim must equal the summed sub-dims; ties take the lowest
    * code (centroid scan order). */
  def pqEncode(a: ArrayData, af: Boolean,
      codebooks: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = codebooks.length
    var dim = 0
    var s0 = 0
    while (s0 < m) { dim += codebooks(s0)(0).length; s0 += 1 }
    if (a.numElements() != dim) {
      throw new IllegalArgumentException(
        s"vector length ${a.numElements()} != codebook dim $dim")
    }
    val out = new Array[Byte](m)
    var off = 0
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val subDim = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = get(a, off + i, af) - cent(i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(s) = best.toByte
      off += subDim
      s += 1
    }
    out
  }

  /** Asymmetric-distance computation over PQ codes: the query's
    * precomputed table holds squared-L2 from each of its subvectors to
    * every centroid; a row's approximate distance is m table lookups —
    * no float math per row at scan time. Codes are unsigned. */
  def pqAdc(codes: Array[Byte], table: Array[Double], k: Int): Double = {
    val m = codes.length
    if (table.length != m * k) {
      throw new IllegalArgumentException(
        s"ADC table length ${table.length} != m*k = ${m * k}")
    }
    var acc = 0.0
    var s = 0
    while (s < m) { acc += table(s * k + (codes(s) & 0xFF)); s += 1 }
    acc
  }

  /** Subspace-indexed nearest centroid: argmin over `codebooks(sub)`
    * for a full (sub-dimensional) input vector — the PQ training
    * assignment kernel, one expression for all subspaces. */
  def nearestSubCentroid(sub: Int, a: ArrayData, af: Boolean,
      codebooks: Array[Array[Array[Float]]]): Int = {
    if (sub < 0 || sub >= codebooks.length) {
      throw new IllegalArgumentException(
        s"subspace $sub out of range [0, ${codebooks.length})")
    }
    val book = codebooks(sub)
    val n = a.numElements()
    if (n != book(0).length) {
      throw new IllegalArgumentException(
        s"subvector length $n != sub-centroid dim ${book(0).length}")
    }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val cent = book(c)
      var acc = 0.0
      var i = 0
      while (i < n) { val d = get(a, i, af) - cent(i); acc += d * d; i += 1 }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  /** Dense matrix × vector against an embedded row-major matrix
    * (float32 out, double accumulation) — the OPQ-style rotation
    * kernel. Rows need not be square (also a projection). */
  def matVec(a: ArrayData, af: Boolean,
      rows: Array[Array[Float]]): ArrayData = {
    val n = a.numElements()
    if (n != rows(0).length) {
      throw new IllegalArgumentException(
        s"vector length $n != matrix column count ${rows(0).length}")
    }
    val out = new Array[Float](rows.length)
    var r = 0
    while (r < rows.length) {
      val row = rows(r)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += row(i).toDouble * get(a, i, af); i += 1 }
      out(r) = acc.toFloat
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Residual against an indexed coarse centroid: `a - centroids(cell)`
    * (float32 out) — what IVF-PQ quantizes instead of the raw vector
    * (the residual distribution is tighter, so the same codebook budget
    * buys more precision). */
  def cellResidual(cell: Int, a: ArrayData, af: Boolean,
      centroids: Array[Array[Float]]): ArrayData = {
    if (cell < 0 || cell >= centroids.length) {
      throw new IllegalArgumentException(
        s"cell $cell out of range [0, ${centroids.length})")
    }
    val cent = centroids(cell)
    val n = a.numElements()
    if (n != cent.length) {
      throw new IllegalArgumentException(
        s"vector length $n != centroid dim ${cent.length}")
    }
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = (get(a, i, af) - cent(i)).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side squared L2 for plain float arrays (centroid ranking). */
  def squaredL2Floats(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"vector length mismatch: ${a.length} vs ${b.length}")
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** Driver-side twin of [[l2Normalize]] for plain float arrays (label
    * vectors, query vectors): identical arithmetic — double accumulate,
    * multiply by reciprocal, truncate to float32. */
  def l2NormalizeFloats(v: Array[Float]): Array[Float] = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    if (acc == 0.0) v.clone()
    else {
      val inv = 1.0 / math.sqrt(acc)
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i).toDouble * inv).toFloat; i += 1 }
      out
    }
  }

  /** L2-normalize to unit length; zero vectors pass through unchanged
    * (torch `F.normalize` clamps the denominator — a zero vector stays
    * zero, `/root/reference/vsu/text/_classes.py:33-35`). Output is
    * always float32 (F5 discipline). */
  def l2Normalize(a: ArrayData, af: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Float](n)
    val nrm = norm(a, af)
    var i = 0
    if (nrm == 0.0) {
      while (i < n) { out(i) = get(a, i, af).toFloat; i += 1 }
    } else {
      val inv = 1.0 / nrm
      while (i < n) { out(i) = (get(a, i, af) * inv).toFloat; i += 1 }
    }
    new GenericArrayData(out)
  }

  /** Scalar-quantize to one unsigned byte per dimension:
    * `round((x - lo_d) / step_d)` clamped to [0, 255], stored as the
    * signed-byte bit pattern (decode with `& 0xFF`). A degenerate
    * dimension (step 0: constant across the corpus) encodes as 0.
    * Out-of-range values (query-time drift beyond the fitted range)
    * clamp rather than wrap — SQ distance saturates, never corrupts. */
  def sqEncode(a: ArrayData, af: Boolean, lo: Array[Float],
      step: Array[Float]): Array[Byte] = {
    val n = a.numElements()
    if (n != lo.length) {
      throw new IllegalArgumentException(
        s"vector length $n != fitted dim ${lo.length}")
    }
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val s = step(i)
      if (s > 0f) {
        val q = Math.round((get(a, i, af) - lo(i)) / s).toInt
        out(i) = (if (q < 0) 0 else if (q > 255) 255 else q).toByte
      }
      i += 1
    }
    out
  }

  /** Asymmetric SQ distance: squared L2 between the float query and the
    * byte-code's reconstruction `lo_d + code_d * step_d`. One fused
    * pass, no reconstruction array. */
  def sqAdc(code: Array[Byte], q: Array[Float], lo: Array[Float],
      step: Array[Float]): Double = {
    val n = code.length
    if (n != q.length) {
      throw new IllegalArgumentException(
        s"code length $n != query dim ${q.length}")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = q(i) - (lo(i) + (code(i) & 0xFF) * step(i))
      acc += d * d
      i += 1
    }
    acc
  }

  /** Binary quantization encode: pack each dimension's sign (v > 0 —
    * the faiss IndexBinaryFlat convention via `binarize`) into 64-bit
    * words, LSB-first: word j bit i covers dimension 64j + i. 32×
    * smaller than float32; distance becomes XOR+popcount. */
  def signBits(a: ArrayData, af: Boolean): ArrayData = {
    val n = a.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (get(a, i, af) > 0.0) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }

  /** Hamming distance between two packed sign-bit codes: Σ
    * popcount(a_j xor b_j). Exact integer — engine-portable with no
    * rounding discipline needed. */
  def hamming(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"code length $n != ${b.numElements()}")
    }
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }
}

abstract class BinaryVectorExpression extends BinaryFloatVectorExpression {
  /** Fully-qualified static kernel, e.g. "graft.functions.VectorOps.dot". */
  protected def kernel: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $kernel($a, $b, $leftIsFloat, $rightIsFloat);")
}

/** dot(a, b): double — zero-shot scoring kernel (J2/F3 in SURVEY §2). */
case class VectorDot(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "graft.functions.VectorOps.dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** squared_l2(a, b): double — the k-NN distance (F4/Q4 in SURVEY §2). */
case class SquaredL2(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "graft.functions.VectorOps.squaredL2"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.squaredL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)
  override def prettyName: String = "squared_l2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** cosine_sim(a, b): double — normalized dot (F2+F3 composition). */
case class CosineSim(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "graft.functions.VectorOps.cosine"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)
  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** vec_norm(a): double — L2 norm. */
case class VectorNorm(child: Expression) extends UnaryFloatVectorExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VectorOps.norm(a.asInstanceOf[ArrayData], childIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.norm($a, $childIsFloat)")
  override def prettyName: String = "vec_norm"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** sign_bits(v): array<bigint> — binary-quantization encode (packed
  * sign bits, see VectorOps.signBits). */
case class SignBits(child: Expression) extends UnaryFloatVectorExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VectorOps.signBits(a.asInstanceOf[ArrayData], childIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOps.signBits($a, $childIsFloat)")
  override def prettyName: String = "sign_bits"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** hamming_dist(a, b): bigint — XOR+popcount over packed sign-bit
  * codes (binary-quantized ANN candidate metric). */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryLongArrayExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.hamming($a, $b)")
  override def prettyName: String = "hamming_dist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** nearest_centroid(v): int — argmin squared-L2 over an embedded
  * centroid matrix (IVF cell assignment). One expression regardless of
  * cluster count: the matrix rides along as a referenced object, the
  * kernel loops cells × dim inside codegen — unlike an
  * argmin-over-N-subexpressions projection, this survives thousands of
  * cells without hitting Janino method-size limits. Ties take the
  * lowest cell id. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryFloatVectorExpression {
  require(centroids.nonEmpty, "centroid matrix must be non-empty")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any): Any =
    VectorOps.nearestCentroid(a.asInstanceOf[ArrayData], childIsFloat, centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOps.nearestCentroid($a, $childIsFloat, $ref)")
  }
  override def prettyName: String = "nearest_centroid"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** nearest_centroids(v, nprobe): array<int> — the nprobe nearest cell
  * ids, closest first (multi-probe IVF batch queries). Same
  * reference-object embedding as [[NearestCentroid]]. */
case class NearestCentroids(child: Expression,
    centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryFloatVectorExpression {
  require(centroids.nonEmpty, "centroid matrix must be non-empty")
  require(nprobe >= 1, "nprobe must be >= 1")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VectorOps.nearestCentroids(a.asInstanceOf[ArrayData], childIsFloat,
      centroids, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOps.nearestCentroids($a, $childIsFloat, $ref, $nprobe)")
  }
  override def prettyName: String = "nearest_centroids"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** mat_vec(v): array<float> — dense matrix × vector against an
  * embedded row-major matrix (OPQ-style rotations / projections).
  * Same reference-object embedding as [[NearestCentroid]]: one
  * expression at any dimension, the loop lives in the kernel. */
case class MatVec(child: Expression, rows: Array[Array[Float]])
    extends UnaryFloatVectorExpression {
  require(rows.nonEmpty, "matrix must be non-empty")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VectorOps.matVec(a.asInstanceOf[ArrayData], childIsFloat, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rows", rows, "float[][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOps.matVec($a, $childIsFloat, $ref)")
  }
  override def prettyName: String = "mat_vec"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** pq_encode(v): binary — m-byte product-quantization code (one
  * unsigned byte per subspace codebook). The codebook tensor rides
  * along as a reference object like [[NearestCentroid]]'s matrix. */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Float]]])
    extends UnaryFloatVectorExpression {
  require(codebooks.nonEmpty && codebooks.forall(b =>
    b.nonEmpty && b.length <= 256), "each codebook needs 1..256 centroids")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any): Any =
    VectorOps.pqEncode(a.asInstanceOf[ArrayData], childIsFloat, codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOps.pqEncode($a, $childIsFloat, $ref)")
  }
  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** pq_adc(codes): double — asymmetric-distance lookup against a
  * query's precomputed table (m × codesPerBook doubles, embedded as a
  * reference object): the compressed-scan distance kernel. */
case class PqAdcDistance(child: Expression, table: Array[Double],
    codesPerBook: Int)
    extends org.apache.spark.sql.graftglue.UnaryBinaryInputExpression {
  require(codesPerBook >= 1 && table.length % codesPerBook == 0,
    "table length must be a multiple of codesPerBook")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VectorOps.pqAdc(a.asInstanceOf[Array[Byte]], table, codesPerBook)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTable", table, "double[]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOps.pqAdc($a, $ref, $codesPerBook)")
  }
  override def prettyName: String = "pq_adc"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sq_encode(vec): binary — one unsigned byte per dimension against the
  * fitted per-dim (lo, step) range (see [[VectorOps.sqEncode]]). */
case class SqEncode(child: Expression, lo: Array[Float], step: Array[Float])
    extends org.apache.spark.sql.graftglue.UnaryFloatVectorExpression {
  require(lo.length == step.length && lo.nonEmpty,
    "lo/step must be non-empty and the same length")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any): Any =
    VectorOps.sqEncode(a.asInstanceOf[ArrayData], childIsFloat, lo, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo, "float[]")
    val stepRef = ctx.addReferenceObj("sqStep", step, "float[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorOps.sqEncode($a, $childIsFloat, $loRef, $stepRef)")
  }
  override def prettyName: String = "sq_encode"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sq_adc(code): double — asymmetric squared-L2 between the embedded
  * float query and a scalar-quantized code (see [[VectorOps.sqAdc]]). */
case class SqAdcDistance(child: Expression, query: Array[Float],
    lo: Array[Float], step: Array[Float])
    extends org.apache.spark.sql.graftglue.UnaryBinaryInputExpression {
  require(query.length == lo.length && lo.length == step.length,
    "query/lo/step must be the same length")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VectorOps.sqAdc(a.asInstanceOf[Array[Byte]], query, lo, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("sqQuery", query, "float[]")
    val loRef = ctx.addReferenceObj("sqLo", lo, "float[]")
    val stepRef = ctx.addReferenceObj("sqStep", step, "float[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorOps.sqAdc($a, $qRef, $loRef, $stepRef)")
  }
  override def prettyName: String = "sq_adc"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** nearest_sub_centroid(sub, subvec): int — PQ training assignment
  * (argmin over the sub-th codebook). */
case class NearestSubCentroid(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Float]]])
    extends org.apache.spark.sql.graftglue.IntVectorExpression {
  require(codebooks.nonEmpty, "codebooks must be non-empty")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(s: Any, a: Any): Any =
    VectorOps.nearestSubCentroid(s.asInstanceOf[Int],
      a.asInstanceOf[ArrayData], rightIsFloat, codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (s, a) =>
      s"${ev.value} = graft.functions.VectorOps.nearestSubCentroid($s, $a, $rightIsFloat, $ref);")
  }
  override def prettyName: String = "nearest_sub_centroid"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cell_residual(cell, v): array<float> — `v - centroids(cell)`, the
  * IVF-PQ residual kernel (centroid matrix embedded by reference). */
case class CellResidual(left: Expression, right: Expression,
    centroids: Array[Array[Float]])
    extends org.apache.spark.sql.graftglue.IntVectorExpression {
  require(centroids.nonEmpty, "centroid matrix must be non-empty")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(c: Any, a: Any): Any =
    VectorOps.cellResidual(c.asInstanceOf[Int], a.asInstanceOf[ArrayData],
      rightIsFloat, centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, (c, a) =>
      s"${ev.value} = graft.functions.VectorOps.cellResidual($c, $a, $rightIsFloat, $ref);")
  }
  override def prettyName: String = "cell_residual"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** l2_normalize(a): array<float> — unit-length copy (F2 in SURVEY §2). */
case class L2Normalize(child: Expression) extends UnaryFloatVectorExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VectorOps.l2Normalize(a.asInstanceOf[ArrayData], childIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.l2Normalize($a, $childIsFloat)")
  override def prettyName: String = "l2_normalize"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
