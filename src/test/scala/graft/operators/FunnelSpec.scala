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

  test("exclusionFunnel: A→C without B — clean vs excluded split, " +
      "boundary B events (at t_A or t_C) do NOT exclude, horizon cuts") {
    val e = ev(
      // u1: clean convert (no click between view@10 and buy@30)
      (1L, "view", 10L), (1L, "buy", 30L), (1L, "click", 30L),
      // u2: excluded (click strictly between)
      (2L, "view", 10L), (2L, "click", 20L), (2L, "buy", 30L),
      // u3: click AT t_A — boundary, does not exclude
      (3L, "view", 10L), (3L, "click", 10L), (3L, "buy", 30L),
      // u4: converts too late (beyond horizon)
      (4L, "view", 10L), (4L, "buy", 10L + H + 1L),
      // u5: starts, never converts
      (5L, "view", 10L),
      // u6: buys before viewing — no conversion
      (6L, "buy", 5L), (6L, "view", 10L))
    val out = Funnel.exclusionFunnel(e, "user_id", "event_type", "ts",
      "view", "buy", "click", H).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 3L, 1L, 2L)),
      s"n_start/n_converted/n_excluded/n_clean: $r")
    assert(math.abs(r.getDouble(4) - 2.0 / 3.0) < 1e-15)
    // nothing converts → clean_pct is null, row still emitted
    val none = Funnel.exclusionFunnel(
      ev((1L, "view", 10L)), "user_id", "event_type", "ts",
      "view", "buy", "click", H).collect()(0)
    assert(none.getLong(1) == 0L && none.isNullAt(4))
  }

  test("covisitation: hand-counted pairs and lift, the recency cap " +
      "bounds a bot basket, minSupport prunes") {
    import spark.implicits._
    // (user, item, ts): u1 touches {1,2,3}, u2 {1,2}, u3 {2,3}
    val ev = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L), (1L, 2L, 40L),
      (2L, 1L, 10L), (2L, 2L, 20L),
      (3L, 2L, 10L), (3L, 3L, 20L))
      .toDF("user_id", "item", "ts")
    val got = Funnel.covisitation(ev, "user_id", "item", "ts",
        maxPerUser = 30, minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // pairs with >= 2 users: (1,2) u1+u2, (2,3) u1+u3; (1,3) only u1
    assert(got.keySet === Set((1L, 2L), (2L, 3L)))
    // U=3, u(1)=2, u(2)=3, u(3)=2: lift(1,2) = 2*3/(2*3) = 1
    assert(got((1L, 2L))._1 == 2L &&
      math.abs(got((1L, 2L))._2 - 1.0) < 1e-12)
    assert(math.abs(got((2L, 3L))._2 - (2.0 * 3) / (3.0 * 2)) < 1e-12)
    // a bot touching 5 items with cap 2 keeps only its 2 most recent
    // (ties by item asc): items 4,5 at ts 50, others older
    val bot = Seq((9L, 1L, 10L), (9L, 2L, 20L), (9L, 3L, 30L),
      (9L, 4L, 50L), (9L, 5L, 50L)).toDF("user_id", "item", "ts")
    val capped = Funnel.covisitation(bot, "user_id", "item", "ts",
      maxPerUser = 2, minSupport = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq === Seq((4L, 5L)),
      s"cap must keep only the 2 most recent items: ${capped.toSeq}")
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

  test("funnel with an empty step-1 cohort emits 0-rows with null " +
      "conv_pct instead of an ANSI 0/0 crash") {
    val e = ev((1L, "click", 10L), (2L, "purchase", 20L))
    val out = Funnel.funnel(e, "user_id", "event_type", "ts",
      Seq("view", "click"), H).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L))
    assert(out.forall(_.isNullAt(3)))
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

  test("funnelByCohort splits reach by the step-1 period") {
    // period 100: u1,u2 start in cohort 0; u3 starts in cohort 1.
    // u1 converts, u2 stalls at view, u3 converts.
    val e = ev(
      (1L, "view", 10L), (1L, "click", 20L),
      (2L, "view", 50L),
      (3L, "view", 110L), (3L, "click", 120L))
    val out = Funnel.funnelByCohort(e, "user_id", "event_type", "ts",
      Seq("view", "click"), horizonNanos = 1000L,
      cohortPeriodNanos = 100L)
      .orderBy("cohort", "step").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 1, 2L, 1.0), (0L, 2, 1L, 0.5),
      (1L, 1, 1L, 1.0), (1L, 2, 1L, 1.0)))
    intercept[IllegalArgumentException] {
      Funnel.funnelByCohort(e, "user_id", "event_type", "ts",
        Seq("view"), 1000L, 0L)
    }
  }

  test("transitions counts consecutive pairs per user with exact p") {
    // u1: a->b->a ; u2: a->b. Transitions: a->b x2, b->a x1.
    val e = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L),
      (2L, "a", 10L, 4L), (2L, "b", 20L, 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.transitions(e, "user_id", "event_type", "ts",
      "event_id").orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("a", "b", 2L, 2L, 1.0), ("b", "a", 1L, 1L, 1.0)))
  }

  test("transitions breaks timestamp ties by id (deterministic order)") {
    val e = Seq((1L, "x", 10L, 2L), (1L, "y", 10L, 1L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.transitions(e, "user_id", "event_type", "ts",
      "event_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out === Seq(("y", "x"))) // id 1 first
  }

  test("periodOverPeriod emits prev/delta/pct with nulls at edges") {
    val counts = Seq(
      ("k", 0L, 10L), ("k", 1L, 15L), ("k", 2L, 0L), ("k", 3L, 7L))
      .toDF("key", "bucket", "cnt")
    val out = Funnel.periodOverPeriod(counts, "bucket", Seq("key"), "cnt")
      .orderBy("bucket").collect()
    assert(out(0).isNullAt(3) && out(0).isNullAt(5)) // first bucket
    assert(out(1).getLong(3) === 10L &&
      out(1).getLong(4) === 5L && out(1).getDouble(5) === 0.5)
    assert(out(2).getDouble(5) === -1.0)
    assert(out(3).isNullAt(5)) // prev == 0 -> null, not infinity
    intercept[IllegalArgumentException] {
      Funnel.periodOverPeriod(counts, "bucket", Seq(), "cnt")
    }
  }

  test("journeys mines ordered n-step paths with a deterministic top-k") {
    val e = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "c", 3L, 3L),
      (1L, "a", 4L, 4L),
      (2L, "a", 1L, 5L), (2L, "b", 2L, 6L), (2L, "c", 3L, 7L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.journeys(e, "user_id", "event_type", "ts",
      "event_id", n = 3, topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // a>b>c twice; b>c>a once -> top-2 = [a>b>c, b>c>a]
    assert(out.toSeq === Seq(("a > b > c", 2L), ("b > c > a", 1L)))
    intercept[IllegalArgumentException] {
      Funnel.journeys(e, "user_id", "event_type", "ts", "event_id", 1, 5)
    }
  }

  test("abTest computes the hand-checked two-proportion z") {
    val users = Seq(
      (0L, true), (0L, true), (0L, false), (0L, false), // p_a = 0.5
      (1L, true), (1L, false), (1L, false), (1L, false)) // p_b = 0.25
      .toDF("variant", "converted")
    val r = Funnel.abTest(users, "variant", "converted").head
    assert(r.getAs[Long]("n_variants") === 2L)
    assert(r.getAs[Long]("n_a") === 4L && r.getAs[Long]("c_a") === 2L)
    assert(r.getAs[Double]("p_a") === 0.5 &&
      r.getAs[Double]("p_b") === 0.25)
    val pool = 3.0 / 8.0
    val se = math.sqrt(pool * (1.0 - pool) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(r.getAs[Double]("z") - (0.5 - 0.25) / se) < 1e-15)
  }

  test("unorderedFunnel: any-order completion within the horizon; " +
      "partials bucket by step count; too-slow full hitters split out") {
    import spark.implicits._
    val ev = Seq(
      // u1: all three, out of order, tight span -> completed
      ("u1", "purchase", 10L), ("u1", "view", 20L), ("u1", "click", 30L),
      // u2: all three but span > horizon -> full hit, not completed
      ("u2", "view", 0L), ("u2", "click", 500L), ("u2", "purchase", 5000L),
      // u3: two steps only
      ("u3", "view", 0L), ("u3", "click", 1L),
      // u4: one step, repeated (min-ts dedup)
      ("u4", "view", 0L), ("u4", "view", 999L),
      // noise: unrelated type and null user drop
      ("u1", "scroll", 5L), (null, "view", 1L))
      .toDF("user", "etype", "ts")
    val out = Funnel.unorderedFunnel(ev, "user", "etype", "ts",
      Seq("view", "click", "purchase"), horizonNanos = H)
      .orderBy("n_steps_hit", "completed").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0, 1L), (2L, 0, 1L), (3L, 0, 1L),
      (3L, 1, 1L)), out.toSeq.toString)
  }
}
