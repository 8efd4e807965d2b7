package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private val SEC = 1000000000L

  private def df(rows: (Long, String, Long, Double)*) =
    rows.toDF("event_id", "key", "ts", "value")

  test("a spike after a steady window is flagged; warm-up rows are " +
      "unscored") {
    val steady = (1 to 5).map(i =>
      (i.toLong, "a", i * SEC, 10.0 + (i % 2) * 2)) // 10,12,10,12,10
    val rows = steady :+ (6L, "a", 6 * SEC, 100.0)
    val got = Anomaly.rollingZScore(df(rows: _*), Seq("key"), "ts",
      "value", windowNanos = 100 * SEC, minCount = 5, threshold = 2.0)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_window"), Option(r.getAs[Any]("z")),
          r.getAs[Boolean]("is_anomaly"))).toMap
    for (i <- 1L to 4L) {
      assert(got(i)._1 === i)
      assert(got(i)._2.isEmpty, s"row $i must be unscored (warm-up)")
      assert(!got(i)._3)
    }
    // row 5: window full, value in-pattern -> scored, not anomalous
    assert(got(5L)._2.nonEmpty && !got(5L)._3)
    // row 6: the spike
    assert(got(6L)._3, s"spike not flagged: ${got(6L)}")
    val z6 = got(6L)._2.get.asInstanceOf[Double]
    assert(z6 > 2.0)
    // hand check: window = [12,10,12,10,12,100] (i%2 starts at 1):
    // mean 26, var = qd/6 - mean^2, z = (100-mean)/sqrt(var)
    val vals = Seq(12.0, 10.0, 12.0, 10.0, 12.0, 100.0)
    val mean = vals.sum / 6
    val varr = vals.map(v => v * v).sum / 6 - mean * mean
    val expect = (100.0 - mean) / math.sqrt(varr)
    assert(math.abs(z6 - expect) < 1e-9, s"$z6 vs $expect")
  }

  test("events beyond the horizon leave the window") {
    val rows = Seq(
      (1L, "a", 0L, 50.0), (2L, "a", 1 * SEC, 50.0),
      (3L, "a", 2 * SEC, 50.0),
      // 1000s later: the old trio is out of a 10s window
      (4L, "a", 1000 * SEC, 10.0))
    val got = Anomaly.rollingZScore(df(rows: _*), Seq("key"), "ts",
      "value", windowNanos = 10 * SEC, minCount = 2)
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("n_window")).toMap
    assert(got(3L) === 3L)
    assert(got(4L) === 1L, "stale events must roll out of the frame")
  }

  test("keys are isolated: one key's spike never contaminates another") {
    val a = (1 to 6).map(i => (i.toLong, "a", i * SEC, 10.0))
    val b = (1 to 6).map(i => (100L + i, "b", i * SEC,
      if (i == 6) 500.0 else 10.0))
    val got = Anomaly.rollingZScore(df((a ++ b): _*), Seq("key"), "ts",
      "value", windowNanos = 100 * SEC, minCount = 5, threshold = 2.0)
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Boolean]("is_anomaly")).toMap
    assert(got(106L), "b's spike must be flagged")
    assert((1L to 6L).forall(i => !got(i)),
      "constant key a must never alarm")
  }

  test("constant windows (zero variance) stay unscored instead of " +
      "dividing by zero; null values are dropped") {
    val rows = (1 to 6).map(i => (i.toLong, "a", i * SEC, 42.0))
    val got = Anomaly.rollingZScore(df(rows: _*), Seq("key"), "ts",
      "value", windowNanos = 100 * SEC, minCount = 5)
      .collect()
    assert(got.forall(r => r.isNullAt(r.fieldIndex("z"))))
    assert(got.forall(r => !r.getAs[Boolean]("is_anomaly")))
    val withNull = df((1L, "a", SEC, 5.0))
      .union(Seq((2L, "a", 2 * SEC, null.asInstanceOf[java.lang.Double]))
        .toDF("event_id", "key", "ts", "value"))
    assert(Anomaly.rollingZScore(withNull, Seq("key"), "ts", "value",
      windowNanos = 100 * SEC, minCount = 2).count() === 1L)
  }

  test("guards: empty keys and tiny minCount are rejected") {
    val d = df((1L, "a", SEC, 1.0))
    intercept[IllegalArgumentException](
      Anomaly.rollingZScore(d, Nil, "ts", "value", SEC))
    intercept[IllegalArgumentException](
      Anomaly.rollingZScore(d, Seq("key"), "ts", "value", SEC,
        minCount = 1))
  }

  test("cusumCurve: hand-computed integer deviations peak at the " +
      "rate shift; a flat series stays at zero") {
    import spark.implicits._
    // counts per day: 1,1,1,5,5 → shift after day 3
    val rows = Seq.fill(1)(1L) ++ Seq.fill(1)(2L) ++ Seq.fill(1)(3L) ++
      Seq.fill(5)(4L) ++ Seq.fill(5)(5L)
    val got = Anomaly.cusumCurve(rows.toDF("day"), "day")
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // n=5 buckets, T=13; dev_t = 5*S_t - t*13
    assert(got.toSeq === Seq(
      (1L, 1L, 1L, 1L, 5 * 1 - 1 * 13L),
      (2L, 1L, 2L, 2L, 5 * 2 - 2 * 13L),
      (3L, 1L, 3L, 3L, 5 * 3 - 3 * 13L),
      (4L, 5L, 4L, 8L, 5 * 8 - 4 * 13L),
      (5L, 5L, 5L, 13L, 5 * 13 - 5 * 13L)))
    // |dev| argmax at day 3 — the change point
    assert(got.maxBy(r => math.abs(r._5))._1 == 3L)
    // flat series: every deviation is exactly zero
    val flat = (1L to 4L).flatMap(d => Seq.fill(3)(d))
    assert(Anomaly.cusumCurve(flat.toDF("day"), "day")
      .collect().forall(_.getLong(4) == 0L))
  }
}
