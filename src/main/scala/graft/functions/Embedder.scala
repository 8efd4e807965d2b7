package graft.functions

import graft.Schemas
import org.apache.spark.sql.{DataFrame, Encoders, Row}

import scala.util.hashing.MurmurHash3

/** Pluggable embedding model — the engine's equivalent of the reference's
  * model layer (M1–M4 in SURVEY §2.8: E5 text, CLIP image/text,
  * EfficientNet image — `/root/reference/vsu/text/_classes.py:47-55`,
  * `/root/reference/vsu/image/_classes.py:39-55,73-91`).
  *
  * Implementations must be Serializable (shipped to executors) and hold
  * heavyweight model handles in `@transient lazy val`s so each executor
  * initializes its own copy lazily.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed one batch of texts. Called with at most `batchSize` rows —
    * the reference's `sp`-chunked inference loop
    * (`/root/reference/vsu/base/VectorSearchBase.py:153-170`). */
  def embed(batch: Seq[String]): Seq[Array[Float]]

  final def embedOne(s: String): Array[Float] = embed(Seq(s)).head
}

/** Embedder for binary payloads (image/audio/video columns). The decode
  * step is model-specific; see graft.operators.Multimodal for the
  * stubbed offline implementation. */
trait BinaryEmbedder extends Serializable {
  def dim: Int
  def embedBytes(batch: Seq[Array[Byte]]): Seq[Array[Float]]
}

/** Deterministic, dependency-free text embedder for offline use: signed
  * feature hashing over lowercase whitespace tokens (the classic
  * hashing-trick bag-of-words). Same string → same vector on every JVM
  * (MurmurHash3 with a fixed seed), so k-NN and zero-shot results are
  * reproducible without model weights (zero-egress substitute for E5 —
  * SURVEY §5/§7.4).
  *
  * @param normalized L2-normalize outputs (CLIP stores normalized
  *                   vectors, E5 does not — quirk Q6 in SURVEY §2.11).
  */
final case class HashEmbedder(dim: Int = 64, normalized: Boolean = false,
    seed: Int = 42) extends Embedder {
  require(dim > 0, "dim must be positive")

  override def embed(batch: Seq[String]): Seq[Array[Float]] = batch.map { s =>
    val v = new Array[Float](dim)
    val toks = Option(s).getOrElse("")
      .toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val h = MurmurHash3.stringHash(t, seed)
        val idx = math.floorMod(h, dim)
        // independent sign bit so collisions cancel unbiasedly
        val sign = if (((h >>> 16) & 1) == 0) 1f else -1f
        v(idx) += sign
      }
      i += 1
    }
    if (normalized) {
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += v(j).toDouble * v(j); j += 1 }
      if (acc > 0) {
        val inv = (1.0 / math.sqrt(acc)).toFloat
        j = 0
        while (j < dim) { v(j) *= inv; j += 1 }
      }
    }
    v
  }
}

/** Batched executor-side embedding of a string column — the engine's
  * model-inference operator. Maps the reference's chunked inference
  * (`__trans_vec_main/sub`, `/root/reference/vsu/base/VectorSearchBase
  * .py:153-191`) onto `mapPartitions` + `grouped(batchSize)`: one model
  * invocation per batch, no per-row overhead, executors work partitions
  * in parallel.
  *
  * Scale note: inference is the bottleneck at 100 TB, not the shuffle —
  * there is none here (narrow map). Size batches to the model
  * (reference default sp=10 is tiny; use 256+ for real models) and
  * `repartition` beforehand if upstream partitioning is skewed.
  */
object Embed {
  /** Production default. The reference's `sp=10`
    * (VectorSearchBase.py:101) is far too small for real model
    * inference — callers wanting exact reference chunking pass 10. */
  val DefaultBatchSize = 256

  def embedColumn(df: DataFrame, inCol: String, outCol: String,
      embedder: Embedder, batchSize: Int = DefaultBatchSize,
      prefix: String = ""): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val outSchema = df.schema.add(outCol, Schemas.vectorType)
    val inIdx = df.schema.fieldIndex(inCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val texts = rows.map(r =>
          prefix + Option(r.get(inIdx)).map(_.toString).getOrElse(""))
        val vecs = embedder.embed(texts)
        require(vecs.length == rows.length,
          s"embedder returned ${vecs.length} vectors for ${rows.length} rows")
        rows.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v))
      }
    }(Encoders.row(outSchema))
  }
}
