package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  test("truncate slices the leading dims and renormalizes to a unit " +
      "vector") {
    val df = Seq(Tuple1(Seq(3f, 4f, 100f, -7f))).toDF("v")
      .select($"v".cast("array<float>").as("v"))
    val u = df.select(Matryoshka.truncate(col("v"), 2).as("u"))
      .head.getSeq[Float](0)
    assert(u.length === 2)
    assert(math.abs(u(0) - 0.6f) < 1e-6 && math.abs(u(1) - 0.8f) < 1e-6)
    // zero-prefix vectors stay unscaled rather than dividing by zero
    val z = Seq(Tuple1(Seq(0f, 0f, 5f))).toDF("v")
      .select($"v".cast("array<float>").as("v"))
      .select(Matryoshka.truncate(col("v"), 2).as("u"))
      .head.getSeq[Float](0)
    assert(z === Seq(0f, 0f))
  }

  test("full-refine MRL search is EXACTLY brute-force top-k") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 11).select("embedding")
      .head.getSeq[Float](0).toArray
    val n = emb.count().toInt
    val got = Matryoshka.topK(emb, "embedding", "vec_id", q, dims = 16,
      k = 5, refineFactor = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.topK(emb, "embedding", "vec_id", q, 5)
      .select("vec_id", "distance")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
  }

  test("16-of-64-dim candidates keep useful recall vs exact top-10") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 21).select("embedding")
      .head.getSeq[Float](0).toArray
    val got = Matryoshka.topK(emb, "embedding", "vec_id", q, dims = 16,
      k = 10, refineFactor = 8)
      .select("vec_id").as[Long].collect().toSet
    val want = Similarity.topK(emb, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = (got & want).size.toDouble / want.size
    assert(recall >= 0.5, s"recall $recall: got $got want $want")
  }
}
