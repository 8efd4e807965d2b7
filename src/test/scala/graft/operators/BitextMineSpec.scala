package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitextMineSpec extends SparkSpec {
  import spark.implicits._

  private def df(name: String, rows: (Long, Seq[Float])*) =
    rows.toDF(name, "vec")

  test("margin matches the hand formula on a tiny instance") {
    // 2D unit-ish vectors; k=2 so every neighborhood is the whole
    // other side
    val a = df("qid", 1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val b = df("cid", 10L -> Seq(1f, 0.1f), 11L -> Seq(0.1f, 1f))
    val got = BitextMine.marginPairs(a, b, "qid", "vec", "cid", "vec", k = 2)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0)) ->
        (r.getAs[Double]("cos"), r.getAs[Double]("margin"))).toMap
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val nx = math.sqrt(x.map(v => v.toDouble * v.toDouble).sum)
      val ny = math.sqrt(y.map(v => v.toDouble * v.toDouble).sum)
      d / (nx * ny)
    }
    def r9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val vecs = Map(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f),
      10L -> Seq(1f, 0.1f), 11L -> Seq(0.1f, 1f))
    for (((cid, qid), (gCos, gMargin)) <- got) {
      val c = r9(cos(vecs(qid), vecs(cid)))
      assert(math.abs(gCos - c.toDouble) < 1e-12, s"cos($qid,$cid)")
      val sumF = r9(cos(vecs(qid), vecs(10L))) + r9(cos(vecs(qid), vecs(11L)))
      val sumB = r9(cos(vecs(1L), vecs(cid))) + r9(cos(vecs(2L), vecs(cid)))
      val expect = c.toDouble / ((sumF + sumB).toDouble / 4.0)
      assert(math.abs(gMargin - expect) < 1e-12, s"margin($qid,$cid)")
    }
  }

  test("the margin demotes hub vectors a raw cosine threshold keeps") {
    // hub: near-equally close to both queries; specific: very close
    // to query 1 only. Raw cosine ranks hub above specific for q1's
    // SECOND slot, but margin ranks the specific match far higher.
    val a = df("qid",
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0f, 1f, 0f), 3L -> Seq(0f, 0f, 1f))
    val b = df("cid",
      10L -> Seq(0.9f, 0.9f, 0.9f), // hub — close to everything
      11L -> Seq(1f, 0.05f, 0f))    // true match for q1
    val pairs = BitextMine
      .marginPairs(a, b, "qid", "vec", "cid", "vec", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("margin"))
      .toMap
    assert(pairs((1L, 11L)) > pairs((1L, 10L)),
      "specific match must out-margin the hub")
    // for the query WITH a true match, the hub falls below the
    // standard margin>1 mining bar
    assert(pairs((1L, 10L)) < 1.0, "hub must not be mined for q1")
  }

  test("mine keeps one best-margin pair per query above the threshold") {
    val a = df("qid", 1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val b = df("cid",
      10L -> Seq(1f, 0.1f), 11L -> Seq(0.1f, 1f), 12L -> Seq(0.7f, 0.7f))
    val mined = BitextMine.mine(a, b, "qid", "vec", "cid", "vec", k = 3,
      threshold = 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mined.get(1L).contains(10L))
    assert(mined.get(2L).contains(11L))
    // per-query cardinality is at most 1 by construction
    assert(mined.size <= 2)
  }

  test("guards: k must be positive, id columns must differ") {
    val a = df("qid", 1L -> Seq(1f, 0f))
    val b = df("cid", 2L -> Seq(0f, 1f))
    intercept[IllegalArgumentException](
      BitextMine.marginPairs(a, b, "qid", "vec", "cid", "vec", k = 0))
    intercept[IllegalArgumentException](
      BitextMine.marginPairs(a, b.withColumnRenamed("cid", "qid"),
        "qid", "vec", "qid", "vec", k = 1))
  }
}
