package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val emb = HashEmbedder(dim = 32)

  test("deterministic: same input, same vector") {
    val a = emb.embedOne("spark vector search")
    val b = emb.embedOne("spark vector search")
    assert(a.toSeq == b.toSeq)
    assert(a.length == 32)
  }

  test("token-order independence (bag of words) and case folding") {
    val a = emb.embedOne("alpha beta gamma")
    val b = emb.embedOne("GAMMA beta ALPHA")
    assert(a.toSeq == b.toSeq)
  }

  test("empty and null inputs give zero vectors") {
    assert(emb.embed(Seq("", null, "   ")).forall(_.forall(_ == 0f)))
  }

  test("normalized variant has unit norm") {
    val v = HashEmbedder(dim = 32, normalized = true).embedOne("a b c d e")
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
  }

  test("embedColumn: batch-size independent, matches direct embed") {
    val df = (1 to 25).map(i => (i.toLong, s"doc number $i shared tokens"))
      .toDF("id", "text")
    val e1 = Embed.embedColumn(df, "text", "vector", emb, batchSize = 3)
    val e2 = Embed.embedColumn(df, "text", "vector", emb, batchSize = 10)
    val v1 = e1.orderBy("id").select("vector").as[Seq[Float]].collect()
    val v2 = e2.orderBy("id").select("vector").as[Seq[Float]].collect()
    assert(v1.toSeq == v2.toSeq)
    val direct = emb.embedOne("doc number 7 shared tokens")
    val fromDf = e1.filter($"id" === 7).select("vector").as[Seq[Float]].head()
    assert(fromDf == direct.toSeq)
  }

  test("prefix changes the embedding (single-prefix ingest, Q1)") {
    val df = Seq((1L, "hello world")).toDF("id", "text")
    val withP = Embed.embedColumn(df, "text", "vector", emb, prefix = "query: ")
      .select("vector").as[Seq[Float]].head()
    assert(withP == emb.embedOne("query: hello world").toSeq)
    assert(withP != emb.embedOne("hello world").toSeq)
  }

  test("columnar plumbing: full batches reach the model, offsets carry " +
      "exact row bytes, per-row calls never fire") {
    EmbedderSpec.batchSizes.clear()
    val df = (1 to 550).map(i => (i.toLong, "x" * (i % 17)))
      .toDF("id", "text").repartition(1)
    val out = Embed.embedColumnColumnar(df, "text", "vector",
      EmbedderSpec.ProbeColumnar(4), batchSize = 256)
      .orderBy("id").select("id", "vector").as[(Long, Seq[Float])].collect()
    // the model saw three packed batches, never a per-row call
    val sizes = {
      val it = EmbedderSpec.batchSizes.iterator()
      val b = scala.collection.mutable.ArrayBuffer[Int]()
      while (it.hasNext) b += it.next()
      b.sorted.toSeq
    }
    assert(sizes == Seq(38, 256, 256), s"unexpected batch sizes $sizes")
    // vector(0) = row's UTF-8 length decoded from the offset buffer;
    // vector(1) = batch width the model received
    for ((id, v) <- out) {
      assert(v(0) == (id % 17).toFloat, s"row $id bytes ${v(0)}")
      assert(v(1) == 256f || v(1) == 38f)
      assert(v(1) != 1f, s"row $id came through a per-row call")
    }
    // the Embedder adapter packs a whole Seq batch into one call too
    EmbedderSpec.batchSizes.clear()
    val vecs = ColumnarEmbedder.AsEmbedder(EmbedderSpec.ProbeColumnar(4))
      .embed(Seq("ab", "cdef", ""))
    assert(EmbedderSpec.batchSizes.size() == 1 &&
      EmbedderSpec.batchSizes.peek() == 3)
    assert(vecs.map(_(0)).toSeq == Seq(2f, 4f, 0f))
  }

  test("similar texts more similar than disjoint texts") {
    val df = Seq(
      (1L, "spark sql query engine fast"),
      (2L, "spark sql query engine slow"),
      (3L, "totally unrelated words entirely different")
    ).toDF("id", "text")
    val e = Embed.embedColumn(df, "text", "vector", emb)
    val rows = e.orderBy("id").select("vector").as[Seq[Float]].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    assert(cos(rows(0), rows(1)) > cos(rows(0), rows(2)))
  }
}

object EmbedderSpec {
  /** Batch widths observed by the probe model (local-mode tasks share
    * the JVM, so a static collector sees executor-side calls). */
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()

  /** Synthetic columnar model: records the batch width it was handed
    * and emits per-row vectors decodable from the packed buffers —
    * `[utf8ByteLen, batchWidth, 0, ...]` — so the spec can prove the
    * offsets were packed right and no per-row path ran. */
  final case class ProbeColumnar(dim: Int)
      extends graft.functions.ColumnarEmbedder {
    override def embedBatch(values: Array[Byte], offsets: Array[Int],
        n: Int, out: Array[Float]): Unit = {
      batchSizes.add(n)
      var j = 0
      while (j < n) {
        out(j * dim) = (offsets(j + 1) - offsets(j)).toFloat
        out(j * dim + 1) = n.toFloat
        j += 1
      }
    }
  }
}
