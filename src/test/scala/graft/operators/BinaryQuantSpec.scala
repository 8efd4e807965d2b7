package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  test("sign_bits packs LSB-first 64-bit words; driver pack agrees") {
    // 70 dims: bits 0, 2 and 65 set → word0 = 5, word1 = 2
    val v = Array.fill(70)(-1f)
    v(0) = 0.5f; v(2) = 3f; v(65) = 1e-9f
    val enc = Seq(Tuple1(v.toSeq)).toDF("v")
      .select(sign_bits(col("v").cast("array<float>")).as("b"))
      .head.getSeq[Long](0)
    assert(enc === Seq(5L, 2L))
    assert(BinaryQuant.pack(v).toSeq === Seq(5L, 2L))
    // zero is NOT positive — faiss binarize convention
    val z = BinaryQuant.pack(Array(0f, 1f))
    assert(z.toSeq === Seq(2L))
  }

  test("hamming_dist is XOR popcount and rejects length mismatches") {
    val df = Seq((Seq(5L, 2L), Seq(4L, 3L))).toDF("a", "b")
    val d = df.select(hamming_dist(col("a"), col("b"))).head.getLong(0)
    assert(d === 2L) // 5^4 = 1 (1 bit), 2^3 = 1 (1 bit)
    val bad = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
    intercept[Exception] {
      bad.select(hamming_dist(col("a"), col("b"))).collect()
    }
  }

  test("full-refine query is EXACTLY brute-force top-k") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 7).select("embedding")
      .head.getSeq[Float](0).toArray
    val n = emb.count().toInt
    val idx = BinaryQuant.build(emb, "embedding", "vec_id")
    val got = idx.query(q, k = 5, refineFactor = n) // refine over all
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.topK(emb, "embedding", "vec_id", q, 5)
      .select("vec_id", "distance")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
  }

  test("moderate refine keeps high recall vs exact top-10") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 3).select("embedding")
      .head.getSeq[Float](0).toArray
    val idx = BinaryQuant.build(emb, "embedding", "vec_id")
    val got = idx.query(q, k = 10, refineFactor = 8)
      .select("vec_id").as[Long].collect().toSet
    val want = Similarity.topK(emb, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = (got & want).size.toDouble / want.size
    assert(recall >= 0.7, s"recall $recall too low: got $got want $want")
  }

  test("queryBatch matches per-query single queries") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding")
    val idx = BinaryQuant.build(emb, "embedding", "vec_id")
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding")
    val batch = idx.queryBatch(queries, "query_id", "embedding",
      k = 4, refineFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val singles = (0 until 3).flatMap { qid =>
      val q = emb.filter($"vec_id" === qid).select("embedding")
        .head.getSeq[Float](0).toArray
      idx.query(q, k = 4, refineFactor = 8)
        .collect().map(r => (qid.toLong, r.getLong(0)))
    }.toSet
    assert(batch === singles)
  }

  test("null vectors are excluded from the codes, not NULLS-FIRST " +
      "candidates") {
    val df = Seq(
      (1L, Some(Seq(1f, -1f))),
      (2L, Some(Seq(-1f, 1f))),
      (3L, None)
    ).toDF("id", "v").select($"id", $"v".cast("array<float>").as("v"))
    val idx = BinaryQuant.build(df, "v", "id")
    assert(idx.codes.count() === 2L)
    val got = idx.query(Array(1f, -1f), k = 3, refineFactor = 1)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1L, 2L))
  }
}
