package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def quotes = {
    import spark.implicits._
    Seq(
      ("aapl", 1L, 100.0, 1L), ("aapl", 5L, 105.0, 2L),
      ("aapl", 10L, 110.0, 3L), ("msft", 3L, 300.0, 4L)
    ).toDF("sym", "qts", "price", "qid")
  }

  private def trades = {
    import spark.implicits._
    Seq(
      ("aapl", 0L, "t0"), ("aapl", 1L, "t1"), ("aapl", 6L, "t6"),
      ("aapl", 20L, "t20"), ("msft", 2L, "m2"), ("msft", 3L, "m3")
    ).toDF("sym", "tts", "trade")
  }

  test("each left row gets the latest right row at or before its ts") {
    val res = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
      Seq("price"), rightTieCol = "qid")
      .orderBy("sym", "tts").collect()
    val byTrade = res.map(r =>
      r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(byTrade("t0").isEmpty)         // nothing at or before ts 0
    assert(byTrade("t1").contains(100.0)) // equal ts matches
    assert(byTrade("t6").contains(105.0))
    assert(byTrade("t20").contains(110.0))
    assert(byTrade("m2").isEmpty)         // msft quote is at ts 3
    assert(byTrade("m3").contains(300.0)) // no cross-key leakage
  }

  test("equal-timestamp right rows: greatest tiebreak wins") {
    import spark.implicits._
    val right = Seq(("k", 5L, "low", 1L), ("k", 5L, "high", 9L))
      .toDF("key", "rts", "v", "tid")
    val left = Seq(("k", 7L, "e1")).toDF("key", "lts", "name")
    val res = AsOfJoin.asOf(left, right, Seq("key"), "lts", "rts",
      Seq("v"), rightTieCol = "tid").collect()
    assert(res.head.getString(3) == "high")
  }

  test("attached columns come from ONE right row (struct payload)") {
    import spark.implicits._
    val right = Seq(("k", 1L, "a1", "b1", 1L), ("k", 2L, "a2", "b2", 2L))
      .toDF("key", "rts", "colA", "colB", "tid")
    val left = Seq(("k", 5L, "x")).toDF("key", "lts", "name")
    val res = AsOfJoin.asOf(left, right, Seq("key"), "lts", "rts",
      Seq("colA", "colB"), "tid").collect()
    assert(res.head.getString(3) == "a2" && res.head.getString(4) == "b2")
  }

  test("null timestamps never match: null right ts is not an " +
      "'earlier than everything' row, null left ts rows are dropped") {
    import spark.implicits._
    val right = Seq(
      (Some("k"), Option.empty[Long], "poison", 1L),
      (Some("k"), Some(5L), "real", 2L))
      .map { case (k, ts, v, t) => (k.get, ts, v, t) }
      .toDF("key", "rts", "v", "tid")
    val left = Seq(("k", Some(3L), "before"), ("k", Some(9L), "after"),
      ("k", Option.empty[Long], "null_ts"))
      .toDF("key", "lts", "name")
    val res = AsOfJoin.asOf(left, right, Seq("key"), "lts", "rts",
      Seq("v"), rightTieCol = "tid").collect()
    val byName = res.map(r => r.getString(2) -> Option(r.get(3))).toMap
    // t=3 precedes the only real quote → no match (the null-ts right
    // row must NOT back-fill it)
    assert(byName("before").isEmpty)
    assert(byName("after").contains("real"))
    // the null-ts left row has no position on the time axis → dropped
    assert(!byName.contains("null_ts") && res.length == 2)
  }

  test("value-column collision with left is rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes.withColumnRenamed("price", "trade"),
        Seq("sym"), "tts", "qts", Seq("trade"), "qid")
    }
  }
}
