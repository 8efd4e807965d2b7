package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions._
import graft.functions.HashEmbedder
import graft.functions.Embed

import java.nio.file.{Files, Paths}

class MultimodalSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-bin")
    // two fake PNGs (magic header + deterministic payload) + one jpeg
    val png = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val jpg = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
    Files.write(Paths.get(d.toString, "a.png"),
      png ++ Array.tabulate(256)(i => (i % 251).toByte))
    Files.write(Paths.get(d.toString, "b.png"),
      png ++ Array.tabulate(256)(i => ((i * 7) % 251).toByte))
    Files.write(Paths.get(d.toString, "c.jpg"),
      jpg ++ Array.tabulate(128)(i => (i % 17).toByte))
    d.toString
  }

  test("binaryFile source reads path/length/content (S10)") {
    val df = Multimodal.readBinaryDir(spark, dir, glob = "*.png")
    assert(df.count() == 2)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    assert(df.select("length").collect().map(_.getLong(0)).forall(_ == 264))
  }

  test("stub image metadata is deterministic and format-aware") {
    val df = Multimodal.withImageMeta(
      Multimodal.readBinaryDir(spark, dir), "content")
    val metas = df.select(element_at(split(col("path"), "/"), -1).as("f"),
        col("image_meta.format"), col("image_meta.width")).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(metas("a.png")._1 == "png" && metas("c.jpg")._1 == "jpeg")
    // deterministic: same run twice gives identical fake dims
    val again = Multimodal.withImageMeta(
      Multimodal.readBinaryDir(spark, dir), "content")
      .select(col("image_meta.width")).collect().map(_.getInt(0)).sorted
    assert(again.sameElements(
      metas.values.map(_._2).toArray.sorted))
  }

  test("binary embedding: deterministic, unit-norm, right dim") {
    val df = Multimodal.embedBinaryColumn(
      Multimodal.readBinaryDir(spark, dir), "content", "vector",
      HashBinaryEmbedder(dim = 32))
    val vecs = df.select("vector").collect().map(_.getSeq[Float](0))
    assert(vecs.forall(_.length == 32))
    vecs.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // distinct payloads → distinct vectors
    assert(vecs.map(_.toSeq).distinct.length == 3)
  }

  test("resize stub: schema + deterministic payload, real plumbing") {
    val df = Multimodal.resizeImages(
      Multimodal.readBinaryDir(spark, dir), "content", 64, 64)
    val lens = df.select(length(col("resized"))).collect().map(_.getInt(0))
    assert(lens.forall(l => l >= 1 && l <= 16))
    assert(df.columns.contains("resized"))
  }

  test("frame sampling explodes one row per sampled frame") {
    val df = Multimodal.sampleFrames(
      Multimodal.readBinaryDir(spark, dir, "*.png"), "content",
      everyNth = 1, frameSize = 64)
    // 264-byte files → 4 frames each, 2 files
    assert(df.count() == 8)
    val idx = df.select("frame_idx").distinct().collect()
      .map(_.getInt(0)).sorted
    assert(idx.sameElements(Array(0, 1, 2, 3)))
    assert(df.filter(length(col("frame_bytes")) =!= 64).count() == 0)
  }

  test("mixed text+binary table embeds and k-NNs end-to-end") {
    import spark.implicits._
    val dim = 32
    val binVecs = Multimodal.embedBinaryColumn(
      Multimodal.readBinaryDir(spark, dir), "content", "vector",
      HashBinaryEmbedder(dim = dim))
      .select(col("path").as("target"), lit("image").as("modality"),
        col("vector"))
    val texts = Seq("spark vector search", "catalyst optimizer rules")
      .toDF("target").withColumn("modality", lit("text"))
    val textVecs = Embed.embedColumn(texts, "target", "vector",
      HashEmbedder(dim = dim, normalized = true), batchSize = 8)
      .select("target", "modality", "vector")
    val corpus = binVecs.unionByName(textVecs)
    assert(corpus.count() == 5)
    // query with one of the image vectors: itself comes back first
    val q = binVecs.orderBy("target").select("vector")
      .head.getSeq[Float](0).toArray
    val top = Similarity.topK(corpus, "vector", "target", q, k = 2)
      .collect()
    assert(top.head.getAs[String]("modality") == "image")
    assert(top.head.getAs[Double]("distance") == 0.0)
  }
}
