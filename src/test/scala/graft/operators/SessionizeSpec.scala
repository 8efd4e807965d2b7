package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  test("gap > maxGap starts a new session; per-key isolation") {
    import spark.implicits._
    val df = Seq(
      ("u1", 100L, "a"), ("u1", 150L, "b"), ("u1", 500L, "c"),
      ("u1", 520L, "d"), ("u2", 110L, "x")
    ).toDF("user", "ts", "ev")
    val out = Sessionize.sessionize(df, Seq("user"), "ts", maxGap = 100L)
      .select("ev", "session_idx", "session_id").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("a") == (0L, "u1#0") && out("b") == (0L, "u1#0"))
    assert(out("c") == (1L, "u1#1") && out("d") == (1L, "u1#1"))
    assert(out("x") == (0L, "u2#0")) // u1's history doesn't leak
  }

  test("gap exactly equal to maxGap stays in the session") {
    import spark.implicits._
    val df = Seq(("u", 0L, 1), ("u", 100L, 2)).toDF("user", "ts", "n")
    val out = Sessionize.sessionize(df, Seq("user"), "ts", maxGap = 100L)
    assert(out.select("session_idx").distinct().count() == 1)
  }

  test("timestamp ties land in one session regardless of order") {
    import spark.implicits._
    val df = Seq(("u", 0L), ("u", 500L), ("u", 500L), ("u", 510L))
      .toDF("user", "ts")
    val out = Sessionize.sessionize(df, Seq("user"), "ts", maxGap = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // first event alone in session 0; the tied pair + follower in 1
    assert(out.count(_._2 == 0L) == 1)
    assert(out.count(_._2 == 1L) == 3)
  }

  test("sessionStats aggregates start/end/count per session") {
    import spark.implicits._
    val df = Seq(("u", 0L), ("u", 50L), ("u", 1000L)).toDF("user", "ts")
    val stats = Sessionize.sessionStats(df, Seq("user"), "ts", maxGap = 100L)
      .orderBy("session_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(stats.toSeq == Seq((0L, 0L, 50L, 2L), (1L, 1000L, 1000L, 1L)))
  }
}
