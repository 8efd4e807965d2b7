package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeWindowsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour in nanos

  test("each row lands in exactly length/slide windows") {
    val df = Seq((1L, 10 * H + 5L), (2L, 11 * H), (3L, 12 * H - 1L))
      .toDF("id", "ts")
    val out = TimeWindows.slidingWindows(df, "ts", 3 * H, H)
    assert(out.groupBy("id").count().select("count")
      .as[Long].collect().toSet == Set(3L))
  }

  test("window membership matches Spark's built-in window() on timestamps") {
    // ground truth: functions.window over the same instants
    val rows = (0 until 500).map(i =>
      (i.toLong, (1700000000L * 1000000000L) + i * 137L * 1000000000L))
    val df = rows.toDF("id", "ts")
    val got = TimeWindows.slidingWindows(df, "ts", 2 * H, H)
      .select(col("id"), (col("win_bucket") * H).as("ws"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df
      .withColumn("t", timestamp_micros(expr("ts div 1000")))
      .select(col("id"), window(col("t"), "2 hours", "1 hour"))
      .select(col("id"),
        (unix_timestamp(col("window.start")) * 1000000000L).as("ws"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("boundary semantics: start inclusive, end exclusive") {
    val df = Seq((1L, 5 * H)).toDF("id", "ts") // exactly on a boundary
    val buckets = TimeWindows.slidingWindows(df, "ts", 2 * H, H)
      .select("win_bucket").as[Long].collect().sorted.toSeq
    // covered by [4H, 6H) and [5H, 7H); NOT [3H, 5H)
    assert(buckets == Seq(4L, 5L))
  }

  test("epoch-adjacent events cover their negative-start windows " +
      "(true floor division, not truncation)") {
    // ts = 3 with [len 10, slide 5): covering windows start at -5 and
    // 0, i.e. buckets {-1, 0}. Truncating `div` would compute
    // (3-10) div 5 + 1 = 0 and silently drop bucket -1.
    val df = Seq((1L, 3L)).toDF("id", "ts")
    val buckets = TimeWindows.slidingWindows(df, "ts", 10L, 5L)
      .select("win_bucket").as[Long].collect().sorted.toSeq
    assert(buckets == Seq(-1L, 0L))
    // and a negative timestamp floors correctly on BOTH bounds
    val dfn = Seq((1L, -3L)).toDF("id", "ts")
    val bn = TimeWindows.slidingWindows(dfn, "ts", 10L, 5L)
      .select("win_bucket").as[Long].collect().sorted.toSeq
    // windows [k*5, k*5+10) containing -3: k in {-2, -1}
    assert(bn == Seq(-2L, -1L))
  }

  test("null timestamps are dropped") {
    val df = Seq((1L, Some(10 * H)), (2L, None)).toDF("id", "ts")
    assert(TimeWindows.slidingWindows(df, "ts", 2 * H, H)
      .select("id").distinct().as[Long].collect().toSeq == Seq(1L))
  }

  test("slidingAgg counts every event once per covering window") {
    val df = Seq((1L, 10 * H, 2.0), (2L, 10 * H + 1, 3.0),
      (3L, 11 * H, 5.0)).toDF("id", "ts", "value")
    val out = TimeWindows.slidingAgg(df, "ts", Seq.empty, Seq("value"),
      2 * H, H).orderBy("win_bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((9L, 2L, 5.0), (10L, 3L, 10.0), (11L, 1L, 5.0)))
  }

  test("non-multiple length rejected") {
    val df = Seq((1L, 10 * H)).toDF("id", "ts")
    intercept[IllegalArgumentException] {
      TimeWindows.slidingWindows(df, "ts", 3 * H / 2, H)
    }
  }

  test("twap: hand-computed duration weighting, burst of ticks does " +
      "not over-count, single observation yields null") {
    import org.apache.spark.sql.functions.col
    // u1: value 10 held 3 ns, then 20 held 1 ns → (30+20)/4 = 12.5
    // u2: a BURST of three ticks at t=0..2 then long hold: plain mean
    // would be ~27.5; TWAP ≈ the long-held value
    // u3: one tick → no span, null twap
    val df = Seq(
      (1L, 0L, 10.0), (1L, 3L, 20.0), (1L, 4L, 20.0),
      (2L, 0L, 100.0), (2L, 1L, 100.0), (2L, 2L, 100.0),
      (2L, 102L, 10.0),
      (3L, 0L, 42.0))
      .toDF("user_id", "ts", "value")
    val got = TimeWindows.twap(df, Seq("user_id"), "ts", "value",
        Seq(col("ts").asc, col("value").asc))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got(0) == ((1L, 3L, Some(4L), Some(12.5))))
    // u2: 100 held 2 ns + 100 held 100 ns... wait: ticks at 0,1,2
    // hold 1+1 ns at 100, then 100 ns at 100 until t=102 → all-100
    // until the last tick: (100*1 + 100*1 + 100*100)/102 = 100
    assert(got(1)._4.exists(v => math.abs(v - 100.0) < 1e-9))
    assert(got(2) == ((3L, 1L, None, None)))
    // same-timestamp ticks with equal (ts, value) are order-free
    val dup = Seq((1L, 0L, 5.0), (1L, 0L, 5.0), (1L, 10L, 15.0))
      .toDF("user_id", "ts", "value")
    val t = TimeWindows.twap(dup, Seq("user_id"), "ts", "value",
        Seq(col("ts").asc, col("value").asc))
      .collect()(0).getDouble(3)
    assert(math.abs(t - 5.0) < 1e-9)
  }
}
