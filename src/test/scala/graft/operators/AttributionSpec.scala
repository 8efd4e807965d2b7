package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // 1h in nanos

  // conversions: (event_id, user, ts); touches: (user, ts, type)
  private def conv(rows: (Long, String, Long)*) =
    rows.toDF("event_id", "user", "ts")
  private def touch(rows: (String, Long, String)*) =
    rows.toDF("user", "ts", "touch_type")

  test("linear: k in-window touches get exactly 1/k each and sum to 1; " +
      "out-of-window and post-conversion touches are ignored") {
    val c = conv((100L, "u1", 10 * H))
    val t = touch(
      ("u1", 9 * H, "view"),       // in window
      ("u1", 8 * H, "click"),      // in window
      ("u1", 10 * H, "email"),     // lag 0: in window
      ("u1", 11 * H, "late"),      // AFTER conversion: ignored
      ("u1", -20 * H, "ancient"),  // outside 24h window: ignored
      ("u2", 9 * H, "othersuser")) // wrong key: ignored
    val out = Attribution.credits(c, t, Seq("user"), "event_id", "ts",
      "ts", "touch_type", windowNanos = 24 * H)
      .collect().map(r => (r.getString(1), r.getDecimal(2).doubleValue()))
    assert(out.length === 3)
    assert(out.map(_._1).sorted.toSeq === Seq("click", "email", "view"))
    out.foreach { case (ty, cr) =>
      assert(math.abs(cr - 1.0 / 3.0) < 1e-12, s"$ty got $cr") }
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-9)
  }

  test("time_decay: weight halves per whole half-life; weights sum " +
      "to 1 per conversion") {
    val c = conv((100L, "u1", 10 * H))
    val t = touch(
      ("u1", 10 * H, "fresh"),          // lag 0h  -> w = 1
      ("u1", 9 * H, "hour_old"),        // lag 1h  -> w = 1/2
      ("u1", 8 * H, "two_hours_old"))   // lag 2h  -> w = 1/4
    val out = Attribution.credits(c, t, Seq("user"), "event_id", "ts",
      "ts", "touch_type", windowNanos = 24 * H,
      model = Attribution.TimeDecay, halfLifeNanos = H)
      .collect().map(r => r.getString(1) -> r.getDecimal(2).doubleValue())
      .toMap
    // normalized over z = 1 + 1/2 + 1/4 = 7/4
    assert(math.abs(out("fresh") - 4.0 / 7.0) < 1e-12)
    assert(math.abs(out("hour_old") - 2.0 / 7.0) < 1e-12)
    assert(math.abs(out("two_hours_old") - 1.0 / 7.0) < 1e-12)
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    // the decay is DISCRETE: 59 minutes of lag still weighs 1
    val t2 = touch(("u1", 10 * H - (59 * 60 * 1000000000L), "a"),
      ("u1", 10 * H, "b"))
    val o2 = Attribution.credits(c, t2, Seq("user"), "event_id", "ts",
      "ts", "touch_type", windowNanos = 24 * H,
      model = Attribution.TimeDecay, halfLifeNanos = H)
      .collect().map(r => r.getString(1) -> r.getDecimal(2).doubleValue())
      .toMap
    assert(math.abs(o2("a") - 0.5) < 1e-12 &&
      math.abs(o2("b") - 0.5) < 1e-12)
  }

  test("u_shaped: first/last get 0.4, middles split 0.2; k=1 takes " +
      "all; k=2 splits evenly — hand-checked") {
    val c = conv((1L, "u1", 10 * H), (2L, "u2", 10 * H),
      (3L, "u3", 10 * H))
    val t = touch(
      // u1: 4 touches -> 0.4, 0.2/2, 0.2/2, 0.4 in time order
      ("u1", 5 * H, "first"), ("u1", 6 * H, "mid1"),
      ("u1", 7 * H, "mid2"), ("u1", 8 * H, "last"),
      // u2: 1 touch -> full credit
      ("u2", 9 * H, "only"),
      // u3: 2 touches -> 0.5 each
      ("u3", 5 * H, "a"), ("u3", 6 * H, "b"))
    val cr = Attribution.credits(c, t, Seq("user"), "event_id", "ts",
      "ts", "touch_type", windowNanos = 24 * H,
      model = Attribution.UShaped)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDecimal(2).doubleValue()))
    val byConv = cr.groupBy(_._1)
    assert(byConv(1L).map(x => x._2 -> x._3).toMap ==
      Map("first" -> 0.4, "mid1" -> 0.1, "mid2" -> 0.1, "last" -> 0.4))
    assert(byConv(2L).map(x => x._2 -> x._3).toSeq == Seq("only" -> 1.0))
    assert(byConv(3L).map(x => x._2 -> x._3).toMap ==
      Map("a" -> 0.5, "b" -> 0.5))
  }

  test("a conversion with no in-window touch carries full credit as " +
      "'none', so total credit equals the conversion count") {
    val c = conv((1L, "u1", 10 * H), (2L, "u2", 10 * H),
      (3L, "u3", 10 * H))
    val t = touch(("u1", 9 * H, "view"), ("u1", 8 * H, "click"),
      ("u2", 50 * H, "late_for_u2"))
    for (model <- Seq(Attribution.Linear, Attribution.TimeDecay,
        Attribution.UShaped)) {
      val cr = Attribution.credits(c, t, Seq("user"), "event_id", "ts",
        "ts", "touch_type", windowNanos = 24 * H, model = model)
      val perConv = cr.groupBy("event_id")
        .agg(sum(col("credit").cast("double")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(perConv.keySet === Set(1L, 2L, 3L))
      perConv.values.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
      val rep = Attribution.report(c, t, Seq("user"), "event_id", "ts",
        "ts", "touch_type", windowNanos = 24 * H, model = model)
        .collect().map(r => (r.getString(0), r.getDouble(1),
          r.getLong(2)))
      assert(math.abs(rep.map(_._2).sum - 3.0) < 1e-9,
        s"$model total credit ${rep.map(_._2).sum}")
      assert(rep.filter(_._1 == "none").map(_._3).sum === 2L)
    }
  }

  test("null keys and timestamps drop on both sides — anonymous rows " +
      "never cross-attribute") {
    val c = Seq((1L, "u1", java.lang.Long.valueOf(10 * H)),
      (2L, null.asInstanceOf[String], java.lang.Long.valueOf(10 * H)),
      (3L, "u3", null.asInstanceOf[java.lang.Long]))
      .toDF("event_id", "user", "ts")
    val t = Seq(("u1", java.lang.Long.valueOf(9 * H), "view"),
      (null.asInstanceOf[String], java.lang.Long.valueOf(9 * H), "anon"),
      ("u1", null.asInstanceOf[java.lang.Long], "nots"))
      .toDF("user", "ts", "touch_type")
    val out = Attribution.credits(c, t, Seq("user"), "event_id", "ts",
      "ts", "touch_type", windowNanos = 24 * H)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // only conversion 1 survives, credited to the one valid touch
    assert(out.toSeq === Seq((1L, "view")))
    intercept[IllegalArgumentException] {
      Attribution.credits(c, t, Seq("user"), "event_id", "ts", "ts",
        "touch_type", windowNanos = 24 * H, model = "quadratic")
    }
    // a window spanning > 45 half-lives is rejected: past the exactness
    // bound, and far past it weights underflow to 0/0 = null credits
    // that silently drop conversions from the report total. 45*H + 1
    // pins the guard as non-truncating: the old integer-division form
    // admitted anything under 46 whole half-lives.
    val err = intercept[IllegalArgumentException] {
      Attribution.credits(c, t, Seq("user"), "event_id", "ts", "ts",
        "touch_type", windowNanos = 45 * H + 1,
        model = Attribution.TimeDecay, halfLifeNanos = H)
    }
    assert(err.getMessage.contains("half-lives"))
  }
}
