package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("rp_weights").toString

  test("export → load round-trips the checkpoint: shape, seed, " +
      "scales, and every int8 weight") {
    val dir = tmpDir()
    RandomProjection.export(spark, dir, vocab = 512, dim = 16, seed = 7)
    val m = RandomProjection.load(spark, dir)
    assert(m.vocab === 512 && m.dim === 16 && m.seed === 7)
    assert(m.scales.forall(_ === RandomProjection.scaleFor(16)))
    for (b <- Seq(0, 1, 255, 511); d <- 0 until 16)
      assert(m.qWeights(b * 16 + d) === RandomProjection.q8(b, d, 16, 7))
  }

  test("re-export with the same seed is byte-identical; a different " +
      "seed is not") {
    val (d1, d2, d3) = (tmpDir(), tmpDir(), tmpDir())
    RandomProjection.export(spark, d1, vocab = 256, dim = 8, seed = 42)
    RandomProjection.export(spark, d2, vocab = 256, dim = 8, seed = 42)
    RandomProjection.export(spark, d3, vocab = 256, dim = 8, seed = 43)
    val (m1, m2, m3) = (RandomProjection.load(spark, d1),
      RandomProjection.load(spark, d2), RandomProjection.load(spark, d3))
    assert(m1.qWeights.toSeq === m2.qWeights.toSeq)
    assert(m1.qWeights.toSeq !== m3.qWeights.toSeq)
  }

  test("inference is mean-pool of token rows + L2 normalize, exactly") {
    val dir = tmpDir()
    RandomProjection.export(spark, dir, vocab = 128, dim = 8, seed = 5)
    val m = RandomProjection.load(spark, dir)
    val got = ColumnarEmbedder.AsEmbedder(m).embedOne("Alpha beta")
    // hand-compute: lowercase tokens hash to buckets, mean the two
    // dequantized rows, normalize
    import scala.util.hashing.MurmurHash3
    val bs = Seq("alpha", "beta")
      .map(t => math.floorMod(MurmurHash3.stringHash(t, 5), 128))
    val s = RandomProjection.scaleFor(8)
    val mean = (0 until 8).map(d =>
      bs.map(b => m.qWeights(b * 8 + d) * s).sum / 2)
    val norm = math.sqrt(mean.map(x => x.toDouble * x).sum)
    val want = mean.map(x => (x / norm).toFloat)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-6f) }
    assert(math.abs(got.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
  }

  test("the full weights-from-disk → batched columnar inference → " +
      "kNN path runs on real parquet and retrieves the query doc's " +
      "own nearest neighbors") {
    val dir = tmpDir()
    RandomProjection.export(spark, dir, vocab = 2048, dim = 32, seed = 42)
    val m = RandomProjection.load(spark, dir)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val embedded = Embed.embedColumnColumnar(docs, "text", "vector", m,
      batchSize = 64)
    // every embedding is unit-norm (or zero for empty docs)
    val norms = embedded.select(
      aggregate(transform(col("vector"), x => x * x),
        lit(0.0), (a, x) => a + x).as("n2"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-4 || n == 0.0))
    val probe = docs.orderBy("doc_id").limit(1)
      .select("text").as[String].head()
    val qv = ColumnarEmbedder.AsEmbedder(m).embedOne(probe)
    val top = Similarity.topK(embedded, "vector", "doc_id", qv, k = 3)
      .select("doc_id").as[Long].collect()
    // the probe text IS doc 0's text, so doc 0 must be its own 1-NN
    assert(top.head === 0L, s"self-retrieval failed: ${top.toSeq}")
  }

  test("malformed checkpoints are rejected loudly") {
    val dir = tmpDir()
    RandomProjection.export(spark, dir, vocab = 64, dim = 8, seed = 1)
    val half = spark.read.parquet(dir).where(col("bucket") < 32)
    val halfDir = tmpDir()
    half.write.mode("overwrite").parquet(halfDir)
    intercept[IllegalArgumentException] {
      RandomProjection.load(spark, halfDir)
    }
  }
}
