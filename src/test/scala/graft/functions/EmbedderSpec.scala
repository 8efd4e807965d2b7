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
