package graft.operators

import graft.Schemas
import graft.functions.BinaryEmbedder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}

/** Multimodal column support (S10 + builder brief): image/audio/video
  * as opaque `binary` columns with typed metadata, embedded by a
  * pluggable [[BinaryEmbedder]]. The reference's image path is
  * `PIL.Image.open` per row (`/root/reference/vsu/image/_classes.py:
  * 40,74`); Spark-first that becomes the `binaryFile` source plus
  * batched executor-side embedding — same shape as the text path, no
  * shuffle, inference-bound.
  *
  * The actual image decode is STUBBED (no image libraries in this
  * container): [[StubImageDecoder]] produces deterministic fake
  * metadata from the byte header. The Spark-side plumbing — schema,
  * batching, partitioning, mixed-modality tables — is real and tested;
  * swapping in a real decoder/CLIP embedder is a one-class change.
  */
object Multimodal {

  /** Read a directory of binary files (images etc.):
    * (path, modificationTime, length, content). Pushdown-friendly:
    * `pathGlobFilter` prunes at the source, and metadata-only queries
    * never read content bytes. */
  def readBinaryDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** Batched executor-side embedding of a binary column — twin of
    * `Embed.embedColumn` for bytes. */
  def embedBinaryColumn(df: DataFrame, inCol: String, outCol: String,
      embedder: BinaryEmbedder, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val outSchema = df.schema.add(outCol, Schemas.vectorType)
    val inIdx = df.schema.fieldIndex(inCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val bytes = rows.map(r =>
          Option(r.get(inIdx)).map(_.asInstanceOf[Array[Byte]])
            .getOrElse(Array.emptyByteArray))
        val vecs = embedder.embedBytes(bytes)
        require(vecs.length == rows.length,
          s"embedder returned ${vecs.length} vectors for ${rows.length} rows")
        rows.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v))
      }
    }(Encoders.row(outSchema))
  }

  /** Resize plumbing (STUB transform): batches rows, emits a resized
    * binary payload + target dims. The byte transform is a
    * deterministic truncation fake — a real decoder resamples pixels;
    * schema/batching/partitioning are the real contract. */
  def resizeImages(df: DataFrame, inCol: String, width: Int, height: Int,
      outCol: String = "resized", batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val inIdx = df.schema.fieldIndex(inCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val bytes = Option(r.get(inIdx)).map(_.asInstanceOf[Array[Byte]])
            .getOrElse(Array.emptyByteArray)
          // STUB: proportional truncation in lieu of pixel resampling
          val fakeLen = math.max(1,
            math.min(bytes.length, width * height / 256))
          Row.fromSeq(r.toSeq :+ bytes.take(fakeLen))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame-sampling plumbing for video columns (STUB decode): emits
    * one row per sampled frame with (frame_idx, frame bytes). The
    * "frames" are fixed-size byte slices — a real decoder would seek
    * keyframes; the explode shape, schema, and ordering are real. */
  def sampleFrames(df: DataFrame, inCol: String, everyNth: Int = 10,
      frameSize: Int = 4096, outPrefix: String = "frame"): DataFrame = {
    require(everyNth >= 1 && frameSize >= 1, "positive sampling params")
    val idxCol = s"${outPrefix}_idx"
    val bytesCol = s"${outPrefix}_bytes"
    val outSchema = df.schema
      .add(idxCol, IntegerType)
      .add(bytesCol, BinaryType)
    val inIdx = df.schema.fieldIndex(inCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = Option(r.get(inIdx)).map(_.asInstanceOf[Array[Byte]])
          .getOrElse(Array.emptyByteArray)
        val nFrames = math.max(1, bytes.length / frameSize)
        (0 until nFrames by everyNth).map { f =>
          val start = f * frameSize
          val end = math.min(bytes.length, start + frameSize)
          Row.fromSeq(r.toSeq :+ f :+ bytes.slice(start, end))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Attach decoded image metadata. STUB decode (see class doc): field
    * values are deterministic fakes derived from the bytes, NOT a real
    * decode — replace [[StubImageDecoder]] with a real one outside
    * this container. */
  def withImageMeta(df: DataFrame, inCol: String,
      outCol: String = "image_meta", batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(outCol, imageMetaType)
    val inIdx = df.schema.fieldIndex(inCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val bytes = Option(r.get(inIdx)).map(_.asInstanceOf[Array[Byte]])
            .getOrElse(Array.emptyByteArray)
          val (w, h, c, f) = StubImageDecoder.decode(bytes)
          Row.fromSeq(r.toSeq :+ Row(w, h, c, f))
        }
      }
    }(Encoders.row(outSchema))
  }
}

/** STUB image decoder — deterministic fake. A real implementation
  * would parse the container format (PNG IHDR / JPEG SOF0); this one
  * only sniffs magic bytes for `format` and derives fake dimensions
  * from a byte hash so tests are stable offline. */
object StubImageDecoder {
  def decode(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val fmt =
      if (bytes.length >= 8 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else "unknown"
    var h = 1469598103934665603L // FNV offset basis
    var i = 0
    while (i < math.min(bytes.length, 64)) {
      h ^= bytes(i); h *= 1099511628211L; i += 1
    }
    val w = 16 + math.floorMod(h, 1024).toInt
    val ht = 16 + math.floorMod(h >>> 20, 1024).toInt
    (w, ht, 3, fmt)
  }
}

/** Deterministic, dependency-free binary embedder: hashing trick over
  * sliding 8-byte windows (offline substitute for CLIP/EfficientNet
  * image embedding — M2/M4). Same bytes → same vector on every JVM. */
final case class HashBinaryEmbedder(dim: Int = 64,
    normalized: Boolean = true) extends BinaryEmbedder {
  require(dim > 0, "dim must be positive")

  override def embedBytes(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map { bytes =>
      val v = new Array[Float](dim)
      if (bytes.nonEmpty) {
        var i = 0
        val step = math.max(1, bytes.length / 4096) // cap work per blob
        while (i + 8 <= bytes.length) {
          var h = 1469598103934665603L
          var j = i
          while (j < i + 8) { h ^= bytes(j); h *= 1099511628211L; j += 1 }
          val idx = math.floorMod(h, dim).toInt
          val sign = if (((h >>> 32) & 1L) == 0L) 1f else -1f
          v(idx) += sign
          i += step
        }
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
