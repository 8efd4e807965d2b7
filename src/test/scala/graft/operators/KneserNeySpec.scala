package graft.operators

import graft.SparkSpec

/** Pins [[TextAnalysis.kneserNeyScore]]: the interpolated-KN identity
  * (every context's full-vocab probability mass sums to exactly 1 —
  * the discounted mass (cv − D·N1+(v·))/cv plus the redistributed
  * λ(v) = D·N1+(v·)/cv times Σ Pcont = 1) and bit-exact agreement
  * with a driver-side replication of the operator's arithmetic
  * (same formula, same operation order, same decimal(18,12) per-term
  * quantize + exact sum + decimal(18,9) mean bridge). */
class KneserNeySpec extends SparkSpec {

  private val corpus = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the dog sat on the log",
    3L -> "a cat and a dog",
    4L -> "one",
    5L -> "the cat sat")

  // driver-side model: bigram counts, context totals, continuation
  // type counts, distinct-bigram-type total
  private def model = {
    val bigs = corpus.flatMap { case (_, t) =>
      val w = t.split("\\s+").toSeq
      w.sliding(2).filter(_.size == 2).map(p => (p.head, p(1)))
    }
    val cvw = bigs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cv = bigs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1pv = cvw.keys.toSeq.groupBy(_._1)
      .map { case (k, v) => k -> v.size.toLong }
    val n1cw = cvw.keys.toSeq.groupBy(_._2)
      .map { case (k, v) => k -> v.size.toLong }
    (cvw, cv, n1pv, n1cw, cvw.size.toLong)
  }

  private def pkn(v: String, w: String): Double = {
    val (cvw, cv, n1pv, n1cw, b) = model
    val first = math.max(cvw.getOrElse((v, w), 0L).toDouble - 0.75, 0.0) /
      cv(v).toDouble
    first + (0.75 * n1pv(v).toDouble / cv(v).toDouble) *
      (n1cw.getOrElse(w, 0L).toDouble / b.toDouble)
  }

  test("interpolated KN: full-vocab mass per context sums to exactly 1") {
    val (_, cv, _, n1cw, _) = model
    val vocabRight = n1cw.keys.toSeq
    for (v <- cv.keys) {
      val s = vocabRight.map(w => pkn(v, w)).sum
      assert(math.abs(s - 1.0) < 1e-12,
        s"context '$v' mass sums to $s, not 1")
    }
  }

  test("kneserNeyScore matches the driver-side replication bit-exactly; " +
      "sub-bigram docs are absent") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def q(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val expected = corpus.flatMap { case (id, t) =>
      val w = t.split("\\s+").toSeq
      val pairs = w.sliding(2).filter(_.size == 2)
        .map(p => (p.head, p(1))).toSeq
      if (pairs.isEmpty) None
      else {
        val sum = pairs.map(p => q(math.log(pkn(p._1, p._2)), 12)).sum
        val mean = q(sum.toDouble / pairs.size, 9).toDouble
        Some((id, pairs.size.toLong, mean))
      }
    }.sortBy(_._1)
    assert(got.toSeq == expected,
      s"got ${got.toSeq}\nexpected $expected")
    assert(!got.exists(_._1 == 4L), "a 1-token doc leaked into the output")
  }
}
