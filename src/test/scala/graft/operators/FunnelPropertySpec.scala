package graft.operators

import graft.SparkSpec

/** Brute-force cross-checks of the event-analytics family on seeded
  * random event sets — the operators are keyed aggregates/windows, the
  * references here are straight per-user Scala simulations, so a
  * divergence means the distributed formulation (not the spec) drifted
  * from the semantics. */
class FunnelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val types = Vector("view", "click", "purchase", "error")

  // seeded random events: (user, type, ts, id)
  private def randomEvents(seed: Long, nUsers: Int, nEvents: Int)
      : Seq[(Long, String, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nEvents).map { i =>
      (rnd.nextInt(nUsers).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(1000).toLong, i.toLong)
    }
  }

  private def bruteFunnelReach(evs: Seq[(Long, String, Long, Long)],
      steps: Seq[String], horizon: Long): Seq[Long] = {
    val byUser = evs.groupBy(_._1)
    val reach = Array.fill(steps.size)(0L)
    for ((_, uevs) <- byUser) {
      // step 1: min ts of step-0 events; step k: min ts of step-k
      // events strictly after step k-1 and within horizon of t1
      val firstTs = uevs.filter(_._2 == steps.head).map(_._3)
      if (firstTs.nonEmpty) {
        val t1 = firstTs.min
        reach(0) += 1
        var tPrev = t1
        var k = 1
        var alive = true
        while (alive && k < steps.size) {
          val cand = uevs.filter(e => e._2 == steps(k) && e._3 > tPrev &&
            e._3 <= t1 + horizon).map(_._3)
          if (cand.isEmpty) alive = false
          else { tPrev = cand.min; reach(k) += 1; k += 1 }
        }
      }
    }
    reach.toSeq
  }

  test("funnel reach equals the brute-force per-user simulation on " +
      "random event sets (3 seeds)") {
    for (seed <- Seq(1L, 42L, 777L)) {
      val evs = randomEvents(seed, nUsers = 20, nEvents = 400)
      val df = evs.toDF("user_id", "event_type", "ts", "event_id")
      val steps = Seq("view", "click", "purchase")
      val horizon = 300L
      val got = Funnel.funnel(df, "user_id", "event_type", "ts",
        steps, horizon).orderBy("step").collect().map(_.getLong(2)).toSeq
      val want = bruteFunnelReach(evs, steps, horizon)
      assert(got === want, s"seed=$seed")
      // reach is monotonically non-increasing by construction
      assert(got.sliding(2).forall(p => p.size < 2 || p(0) >= p(1)))
    }
  }

  test("transitions equal the brute-force lead counts (3 seeds)") {
    for (seed <- Seq(2L, 43L, 778L)) {
      val evs = randomEvents(seed, nUsers = 10, nEvents = 300)
      val df = evs.toDF("user_id", "event_type", "ts", "event_id")
      val want = evs.groupBy(_._1).values.flatMap { uevs =>
        uevs.sortBy(e => (e._3, e._4)).sliding(2)
          .collect { case Seq(a, b) => (a._2, b._2) }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = Funnel.transitions(df, "user_id", "event_type", "ts",
        "event_id").collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      assert(got === want, s"seed=$seed")
      // conditional probabilities sum to 1 per from_type
      val ps = Funnel.transitions(df, "user_id", "event_type", "ts",
        "event_id").collect()
        .groupBy(_.getString(0))
        .map { case (_, rows) => rows.map(_.getDouble(4)).sum }
      assert(ps.forall(s => math.abs(s - 1.0) < 1e-9))
    }
  }

  test("retention cells equal the brute-force cohort matrix (3 seeds)") {
    for (seed <- Seq(3L, 44L, 779L)) {
      val evs = randomEvents(seed, nUsers = 15, nEvents = 300)
      val df = evs.toDF("user_id", "event_type", "ts", "event_id")
      val period = 100L
      val userPeriods = evs.groupBy(_._1)
        .map { case (u, es) => u -> es.map(_._3 / period).distinct.sorted }
      val want = userPeriods.toSeq.flatMap { case (_, ps) =>
        val cohort = ps.min
        ps.map(p => (cohort, p - cohort))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = Funnel.retention(df, "user_id", "ts", period).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("journeys equal brute-force trigram counts (2 seeds)") {
    for (seed <- Seq(5L, 46L)) {
      val evs = randomEvents(seed, nUsers = 8, nEvents = 200)
      val df = evs.toDF("user_id", "event_type", "ts", "event_id")
      val want = evs.groupBy(_._1).values.flatMap { uevs =>
        uevs.sortBy(e => (e._3, e._4)).map(_._2).sliding(3)
          .filter(_.size == 3).map(_.mkString(" > "))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = Funnel.journeys(df, "user_id", "event_type", "ts",
        "event_id", n = 3, topK = 1000).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("pageRank equals a driver-side reference with the same " +
      "decimal quantization (2 seeds)") {
    for (seed <- Seq(7L, 48L)) {
      val rnd = new scala.util.Random(seed)
      val edges = (0 until 40)
        .map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
        .filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val sym = (edges ++ edges.map(_.swap)).distinct
        val deg = sym.groupBy(_._1).map { case (u, es) => u -> es.size }
        val nodes = deg.keys.toSeq.sorted
        val n = nodes.size
        var pr = nodes.map(_ -> 1.0 / n).toMap
        for (_ <- 1 to 3) {
          val sums = scala.collection.mutable.Map[Long, BigDecimal]()
          for ((u, v) <- sym) {
            val c = BigDecimal(pr(u) / deg(u))
              .setScale(12, BigDecimal.RoundingMode.HALF_UP)
            sums(v) = sums.getOrElse(v, BigDecimal(0)) + c
          }
          pr = nodes.map(v =>
            v -> ((1.0 - 0.85) / n + 0.85 * sums(v).toDouble)).toMap
        }
        val got = Graph.pageRank(df, "src", "dst", iters = 3).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got.keySet === pr.keySet, s"seed=$seed")
        for (k <- pr.keys)
          assert(got(k) === pr(k), s"seed=$seed node=$k")
      }
    }
  }
}
