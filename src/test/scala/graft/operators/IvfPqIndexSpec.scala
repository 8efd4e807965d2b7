package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${sf()}/embeddings.parquet")
    .select("vec_id", "embedding")
    .cache()

  private lazy val index = IvfPqIndex.build(emb, "embedding", "vec_id",
    nClusters = 8, m = 8, codesPerBook = 32)

  private def bruteTop(q: Array[Float], k: Int): Seq[Long] =
    Similarity.topK(emb, "embedding", "vec_id", q, k)
      .collect().map(_.getLong(0)).toSeq

  private def queries: Seq[Array[Float]] =
    emb.filter(col("vec_id") < 10).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toSeq

  test("full probe + full-corpus refine is exact by construction") {
    val q = queries.head
    val got = index.query(q, k = 10, nprobe = 8, refineFactor = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(got == bruteTop(q, 10))
  }

  test("multi-probe keeps high recall@10 with a 32x-compressed scan") {
    val recalls = queries.map { q =>
      val got = index.query(q, k = 10, nprobe = 5, refineFactor = 8)
        .collect().map(_.getLong(0)).toSet
      val want = bruteTop(q, 10).toSet
      (got & want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.8, s"mean recall@10 $mean below 0.8 ($recalls)")
  }

  test("residual codes differ from raw-vector codes (the IVFPQ part)") {
    // rows of the same cell but different positions must not collapse:
    // residual quantization keeps within-cell structure
    val codes = index.table.select(PqIndex.CodeCol).distinct().count()
    assert(codes > index.nCells,
      s"only $codes distinct codes across ${index.nCells} cells")
  }

  test("partitioned table prunes probed cells and reads only codes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    index.writeTable(s"$dir/t")
    val loaded = IvfPqIndex.load(spark, s"$dir/t", index.cells,
      index.codebooks, emb, "embedding", "vec_id")
    val q = queries.head
    assert(loaded.query(q, 10, nprobe = 8, refineFactor = 50)
      .collect().map(_.getLong(0)).toSeq == bruteTop(q, 10))
    val plan = loaded.query(q, 5, nprobe = 2, refineFactor = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"probed scan not pruned:\n$plan")
    assert(!plan.contains("embedding#"),
      s"ADC scan reads raw vectors:\n$plan")
  }

  test("IVF-OPQ: rotated-residual codes answer exactly at full " +
      "probe/refine and keep recall with the compressed scan") {
    val opq = IvfPqIndex.buildOpq(emb, "embedding", "vec_id",
      nClusters = 8, m = 8, codesPerBook = 32, opqIters = 2)
    assert(opq.rotation.nonEmpty)
    val q = queries.head
    // exact at full probe + generous refine — the re-rank runs in the
    // ORIGINAL space, so the rotation must not leak into results
    assert(opq.query(q, 10, nprobe = 8, refineFactor = 50)
      .collect().map(_.getLong(0)).toSeq == bruteTop(q, 10))
    // compressed-scan recall stays in the same band as plain IVF-PQ on
    // the SAME queries (this synthetic corpus is near-isotropic, so
    // the rotation neither helps nor may it hurt much)
    def recall(idx: IvfPqIndex, qq: Array[Float]): Double = {
      val got = idx.query(qq, 10, nprobe = 5, refineFactor = 8)
        .collect().map(_.getLong(0)).toSet
      val want = bruteTop(qq, 10).toSet
      (got & want).size.toDouble / want.size
    }
    val qs = queries.take(5)
    val meanOpq = qs.map(recall(opq, _)).sum / qs.size
    val meanPlain = qs.map(recall(index, _)).sum / qs.size
    assert(meanOpq >= meanPlain - 0.15,
      s"IVF-OPQ recall $meanOpq far below plain IVF-PQ $meanPlain")
  }
}
