package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val H = 1000L // nanos horizon for hand cases

  // (user, type, ts)
  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ts")

  test("funnel counts ordered step completions per user") {
    val e = ev(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      (2L, "view", 10L), (2L, "click", 15L),
      (3L, "view", 10L),
      // out of order: click BEFORE view — step 2 not reached
      (4L, "click", 5L), (4L, "view", 10L),
      // never viewed: not even in step 1
      (5L, "click", 3L), (5L, "buy", 4L))
    val out = Funnel.funnel(e, "user_id", "event_type", "ts",
      Seq("view", "click", "buy"), H)
      .orderBy("step")
      .collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq === Seq((1, "view", 4L), (2, "click", 2L), (3, "buy", 1L)))
    // conversion = n / n_first, exact single division
    assert(out.map(_.getDouble(3)).toSeq === Seq(1.0, 0.5, 0.25))
  }

  test("strictly-after ordering: same-timestamp step does not count") {
    val e = ev((1L, "view", 10L), (1L, "click", 10L))
    val out = Funnel.funnel(e, "user_id", "event_type", "ts",
      Seq("view", "click"), H).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 0L))
  }

  test("horizon measured from step 1 cuts late conversions") {
    val e = ev(
      (1L, "view", 0L), (1L, "click", 50L), (1L, "buy", 2000L), // buy late
      (2L, "view", 0L), (2L, "click", 999L), (2L, "buy", 1000L)) // buy at edge
    val out = Funnel.funnel(e, "user_id", "event_type", "ts",
      Seq("view", "click", "buy"), horizonNanos = 1000L)
      .orderBy("step").collect()
    // horizon is inclusive (ts <= t1 + horizon): user 2's buy at exactly
    // t1+1000 counts, user 1's at 2000 does not
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 2L, 1L))
  }

  test("first qualifying occurrence drives the next step") {
    // user's first click is before view; second click (after view) counts,
    // and buy must be after THAT click
    val e = ev(
      (1L, "click", 1L), (1L, "view", 10L), (1L, "click", 20L),
      (1L, "buy", 15L), // before the qualifying click -> no
      (2L, "click", 1L), (2L, "view", 10L), (2L, "click", 20L),
      (2L, "buy", 25L)) // after -> yes
    val out = Funnel.funnel(e, "user_id", "event_type", "ts",
      Seq("view", "click", "buy"), H).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 2L, 1L))
  }

  test("null user/type/ts rows are ignored; guards fire") {
    val e = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, "view", 10L), (null, "view", 20L), (2L, null, 30L),
      (2L, "view", null))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(e, "user_id", "event_type", "ts",
      Seq("view"), H).collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L))
    intercept[IllegalArgumentException] {
      Funnel.funnel(e, "user_id", "event_type", "ts", Seq(), H)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(e, "user_id", "event_type", "ts", Seq("a", "a"), H)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(e, "user_id", "event_type", "ts", Seq("a"), -1L)
    }
  }

  test("retention builds the cohort matrix with exact rates") {
    // period = 10ns "days". u1 first in p0, active p0,p1,p2; u2 first p0,
    // active p0,p2; u3 first p1, active p1. Cohort p0 size 2, p1 size 1.
    val e = ev(
      (1L, "x", 1L), (1L, "x", 11L), (1L, "x", 25L),
      (2L, "x", 5L), (2L, "x", 27L), (2L, "x", 29L), // two events in p2
      (3L, "x", 15L))
    val out = Funnel.retention(e, "user_id", "ts", periodNanos = 10L)
      .orderBy("cohort", "offset")
      .select("cohort", "offset", "n_users", "n_cohort", "retention_pct")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5),
      (0L, 2L, 2L, 2L, 1.0),
      (1L, 0L, 1L, 1L, 1.0)))
  }

  test("conversionLag averages time-from-step-1 per reached step") {
    val e = ev(
      (1L, "view", 0L), (1L, "click", 100L),
      (2L, "view", 0L), (2L, "click", 300L),
      (3L, "view", 0L)) // never clicks
    val out = Funnel.conversionLag(e, "user_id", "event_type", "ts",
      Seq("view", "click"), H * 1000)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1, 3L, 0.0), (2, 2L, 200.0)))
  }

  test("conversionLag on an unreached step yields null avg, 0 users") {
    val e = ev((1L, "view", 0L))
    val out = Funnel.conversionLag(e, "user_id", "event_type", "ts",
      Seq("view", "click"), H).orderBy("step").collect()
    assert(out(1).getLong(2) === 0L)
    assert(out(1).isNullAt(3))
  }

  test("retention counts a user once per period") {
    val e = ev((1L, "x", 1L), (1L, "x", 2L), (1L, "x", 3L))
    val out = Funnel.retention(e, "user_id", "ts", 10L).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_users") === 1L)
  }
}
