package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImageNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def gray(v: Int): Int = {
    val c = math.max(0, math.min(255, v))
    (c << 16) | (c << 8) | c
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("dHash survives rescale and brightness shift; distinct scenes " +
      "stay far") {
    val gradSmall = png(64, 32)((x, _) => gray(x * 255 / 64))
    val gradBig = png(256, 128)((x, _) => gray(x * 255 / 256))
    val gradBright = png(64, 32)((x, _) => gray(x * 255 / 64 + 10))
    val stripes = png(64, 64)((x, _) => if ((x / 8) % 2 == 0) gray(255) else gray(0))
    val hashes = Multimodal.dHashImages(
      Seq(("a", gradSmall), ("b", gradBig), ("c", gradBright),
        ("d", stripes)).toDF("id", "content"), "content")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("dhash")).toMap
    assert(hamming(hashes("a"), hashes("b")) <= 3,
      s"rescale moved the hash ${hamming(hashes("a"), hashes("b"))} bits")
    assert(hamming(hashes("a"), hashes("c")) <= 3,
      s"brightness moved the hash ${hamming(hashes("a"), hashes("c"))} bits")
    assert(hamming(hashes("a"), hashes("d")) > 10,
      "distinct scenes must be far apart")
  }

  test("corrupt bytes hash to null and never reach the pair join") {
    val good = png(16, 16)((x, y) => gray(x * 16 + y))
    val df = Seq(("ok", good), ("bad", Array[Byte](1, 2, 3)),
      ("nul", null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val hashed = Multimodal.dHashImages(df, "content")
    val byId = hashed.collect()
      .map(r => r.getString(0) -> Option(r.getAs[Any]("dhash"))).toMap
    assert(byId("ok").nonEmpty && byId("bad").isEmpty && byId("nul").isEmpty)
    assert(Multimodal.nearDupImagePairs(hashed, "id", "dhash", 3)
      .count() === 0L)
  }

  test("banding has recall 1.0: pairs equal the brute-force Hamming " +
      "filter over arbitrary hashes") {
    // synthetic hashes, no images needed: banding is pure bit logic
    val rnd = new scala.util.Random(7)
    val base = Array.fill(30)(rnd.nextLong())
    // plant near-dups: flip up to 3 bits of some bases
    val rows = base.zipWithIndex.map { case (h, i) => (i.toLong, h) } ++
      Seq(100L -> (base(0) ^ 1L), 101L -> (base(1) ^ (1L << 5) ^ (1L << 63)),
        102L -> (base(2) ^ 7L), 103L -> (base(3) ^ (0xFL << 20)))
    val df = rows.toSeq.toDF("id", "h")
    val got = Multimodal.nearDupImagePairs(df, "id", "h", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = rows
    val expect = (for {
      (i1, h1) <- all; (i2, h2) <- all
      if i1 < i2 && hamming(h1, h2) <= 3
    } yield (i1, i2)).toSet
    assert(got === expect)
    assert(expect.size >= 3, "fixture must actually contain near-dups")
    // 103 flipped 4 bits — must be excluded
    assert(!got.exists(p => p._1 == 3L && p._2 == 103L))
  }

  test("maxHamming guard: bands must divide 64") {
    val df = Seq((1L, 5L)).toDF("id", "h")
    intercept[IllegalArgumentException](
      Multimodal.nearDupImagePairs(df, "id", "h", maxHamming = 4))
  }
}
