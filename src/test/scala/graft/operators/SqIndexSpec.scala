package graft.operators

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

class SqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def noise(i: Int, j: Int): Float = {
    var h = i * 0x9E3779B9 + j * 0x85EBCA6B
    h = (h ^ (h >>> 16)) * 0xC2B2AE35
    ((h & 0xFFFF).toFloat / 0xFFFF.toFloat - 0.5f) * 0.02f
  }

  private def clustered(): Seq[(Long, Array[Float])] = {
    val anchors = Seq(
      Array.fill(8)(0f), Array.fill(8)(3f),
      Array.tabulate(8)(i => if (i < 4) 6f else 0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 0f else 6f))
    for (c <- 0 until 4; r <- 0 until 20) yield {
      val id = (c * 20 + r).toLong
      (id, Array.tabulate(8)(j => anchors(c)(j) + noise(id.toInt, j)))
    }
  }

  test("kernel: reconstruction error is bounded by step/2 per dim") {
    val lo = Array(0f, -1f); val step = Array(0.1f, 0.02f)
    for (i <- 0 until 50) {
      val v = Array(i * 0.5f, -1f + i * 0.1f)
      // clamp test values into the fitted range
      val x = Array(math.min(v(0), lo(0) + 255 * step(0)),
        math.min(v(1), lo(1) + 255 * step(1)))
      val code = VectorOps.sqEncode(new GenericArrayData(x), true, lo, step)
      val d = VectorOps.sqAdc(code, x, lo, step)
      val bound = math.pow(step(0) / 2 + 1e-4, 2) + math.pow(step(1) / 2 + 1e-4, 2)
      assert(d <= bound, s"row $i: $d > $bound")
    }
  }

  test("kernel: degenerate (constant) dimension reconstructs exactly") {
    val lo = Array(5f); val step = Array(0f)
    val code = VectorOps.sqEncode(new GenericArrayData(Array(5f)), true, lo, step)
    assert(code.toSeq == Seq(0.toByte))
    assert(VectorOps.sqAdc(code, Array(5f), lo, step) == 0.0)
  }

  test("kernel: out-of-range values clamp, never wrap") {
    val lo = Array(0f); val step = Array(1f)
    val below = VectorOps.sqEncode(new GenericArrayData(Array(-100f)), true, lo, step)
    val above = VectorOps.sqEncode(new GenericArrayData(Array(1000f)), true, lo, step)
    assert((below(0) & 0xFF) == 0 && (above(0) & 0xFF) == 255)
  }

  test("codes are dim bytes; full-corpus refine is exact by construction") {
    val df = clustered().toDF("vid", "vec")
    val idx = SqIndex.fit(df, "vec", "vid")
    val lens = idx.codes.select(length(col(SqIndex.CodeCol)))
      .distinct().as[Int].collect().toSeq
    assert(lens == Seq(8))
    val q = Array.tabulate(8)(j => 1f + noise(5, j))
    val sq = idx.query(q, k = 3, refineFactor = 80)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.topK(df, "vec", "vid", q, 3)
      .select("vid", "distance")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sq == exact)
  }

  test("refined SQ8 top-k matches brute force on clustered data") {
    val df = clustered().toDF("vid", "vec")
    val idx = SqIndex.fit(df, "vec", "vid")
    val q = Array.tabulate(8)(j => 3f + noise(999, j))
    val sq = idx.query(q, k = 5, refineFactor = 4)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.topK(df, "vec", "vid", q, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(sq == exact, s"sq $sq vs exact $exact")
  }

  test("unrefined ADC recall@5 on real embeddings >= 0.8 (8-bit is tight)") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = SqIndex.fit(emb, "embedding", "vec_id")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).toArray
    val adc = idx.query(q, k = 5, refineFactor = 1)
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.topK(emb, "embedding", "vec_id", q, 5)
      .collect().map(_.getLong(0)).toSet
    assert(adc.intersect(exact).size >= 4, s"adc $adc vs exact $exact")
  }

  test("write/load roundtrip preserves query results") {
    val df = clustered().toDF("vid", "vec")
    val idx = SqIndex.fit(df, "vec", "vid")
    val dir = java.nio.file.Files.createTempDirectory("sq-codes").toString
    idx.writeCodes(s"$dir/codes")
    val re = SqIndex.load(spark, s"$dir/codes", idx.lo, idx.step, df,
      "vec", "vid")
    val q = Array.tabulate(8)(j => 6f * (j % 2) + noise(7, j))
    assert(re.query(q, 4).collect().toSeq ==
      idx.query(q, 4).collect().toSeq)
  }

  test("null vectors are excluded from fit AND from the codes table") {
    val df = (clustered().map { case (id, v) => (id, v) } :+
      (999L, null.asInstanceOf[Array[Float]])).toDF("vid", "vec")
    val idx = SqIndex.fit(df, "vec", "vid")
    assert(idx.dim == 8)
    // a null vector must not appear in codes at all: a null code would
    // yield a null ADC distance, and ascending sort is NULLS FIRST, so
    // it would squat in the top-k candidate slots
    assert(idx.codes.where(col("vid") === 999L).count() == 0)
    assert(idx.codes.where(col(SqIndex.CodeCol).isNull).count() == 0)
    val q = Array.fill(8)(0f)
    val got = idx.query(q, 3).select("vid").as[Long].collect()
    assert(!got.contains(999L))
  }

  test("plan: ADC scan is TakeOrderedAndProject over codes, no join") {
    val df = clustered().toDF("vid", "vec")
    val idx = SqIndex.fit(df, "vec", "vid")
    val plan = idx.query(Array.fill(8)(1f), 5, refineFactor = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("save/loadSaved roundtrip: params and answers survive reopen") {
    val df = clustered().toDF("vid", "vec")
    val idx = SqIndex.fit(df, "vec", "vid")
    val dir = java.nio.file.Files.createTempDirectory("sq-save").toString
    SqIndex.save(idx, s"$dir/idx")
    val re = SqIndex.loadSaved(spark, s"$dir/idx", df, "vec", "vid")
    assert(re.lo.toSeq == idx.lo.toSeq && re.step.toSeq == idx.step.toSeq)
    val q = Array.tabulate(8)(j => 3f + noise(11, j))
    assert(re.query(q, 4).collect().toSeq == idx.query(q, 4).collect().toSeq)
  }
}
