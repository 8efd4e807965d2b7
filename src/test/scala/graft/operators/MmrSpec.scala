package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // three near-identical vectors pointing +x, one orthogonal +y;
  // rels favor the +x cluster
  private def cands = Seq(
    (1L, Seq(1f, 0f), 0.99),
    (2L, Seq(0.999f, 0.01f), 0.98),
    (3L, Seq(0.998f, 0.02f), 0.97),
    (4L, Seq(0f, 1f), 0.60)
  ).toDF("id", "v", "rel")
    .select($"id", $"v".cast("array<float>").as("v"), $"rel")

  test("MMR breaks up a redundant cluster: the orthogonal candidate " +
      "beats the third near-duplicate") {
    val got = Mmr.select(cands, "id", "v", "rel", k = 3, lambda = 0.5)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq
    // pick 1 (best rel), then 4 (rel 0.60 but sim ~0 vs sim ~1 for
    // 2/3: 0.5*0.98-0.5*~1 ≈ -0.01 < 0.5*0.6-0.5*0 = 0.30), then 2
    assert(got === Seq(1L, 4L, 2L), s"got $got")
  }

  test("lambda = 1 is pure relevance order") {
    val got = Mmr.select(cands, "id", "v", "rel", k = 4, lambda = 1.0)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 3L, 4L))
  }

  test("duplicate candidate ids (fused retrieval lists) collapse to " +
      "max-rel and never stall the greedy loop") {
    // id 1 appears twice (e.g. found by BM25 AND by dense retrieval);
    // the old loop overwrote the LinkedHashMap entry, stalled
    // chosen.size, and eventually threw on rows(-1)
    val fused = cands.union(Seq((1L, Seq(1f, 0f), 0.50)).toDF("id", "v", "rel")
      .select($"id", $"v".cast("array<float>").as("v"), $"rel"))
    val got = Mmr.select(fused, "id", "v", "rel", k = 4)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq
    // max-rel (0.99) wins for id 1, so the order matches the
    // duplicate-free run
    assert(got === Mmr.select(cands, "id", "v", "rel", k = 4)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq)
    assert(got.distinct === got)
  }

  test("the driver-small contract is enforced: a 10k candidate list " +
      "is rejected, not silently collected") {
    val big = spark.range(10000).select(col("id"),
      array(col("id").cast("float"), lit(1f)).as("v"),
      lit(1.0).as("rel"))
    val e = intercept[IllegalArgumentException] {
      Mmr.select(big, "id", "v", "rel", k = 5)
    }
    assert(e.getMessage.contains("maxCandidates"))
  }

  test("null or non-numeric ids are rejected with a clear error") {
    val bad = Seq(("a", Seq(1f, 0f), 0.9), ("b", Seq(0f, 1f), 0.8))
      .toDF("id", "v", "rel")
      .select($"id", $"v".cast("array<float>").as("v"), $"rel")
    val e = intercept[IllegalArgumentException] {
      Mmr.select(bad, "id", "v", "rel", k = 1)
    }
    assert(e.getMessage.contains("non-numeric"))
  }

  test("k beyond the candidate count returns everything once; null " +
      "vectors are excluded") {
    val withNull = cands.union(Seq((9L, null.asInstanceOf[Seq[Float]], 1.0))
      .toDF("id", "v", "rel")
      .select($"id", $"v".cast("array<float>").as("v"), $"rel"))
    val got = Mmr.select(withNull, "id", "v", "rel", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 4L))
  }
}
