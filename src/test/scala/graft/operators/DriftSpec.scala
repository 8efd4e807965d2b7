package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("KL matches the hand formula on a tiny instance") {
    val df = Seq(
      ("a", "x x y"), ("b", "y z z z")).toDF("src", "text")
    val got = Drift.unigramKl(df, "src", "text")
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab_used"),
          r.getAs[Double]("kl"))).toMap
    // corpus: x:2 y:2 z:3, N=7, V=3
    def r9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def kl(counts: Map[String, Long]): Double = {
      val nk = counts.values.sum
      val qs = Map("x" -> 2L, "y" -> 2L, "z" -> 3L)
      qs.keys.toSeq.sorted.map { t =>
        val p = (counts.getOrElse(t, 0L) + 1).toDouble / (nk + 3).toDouble
        val q = qs(t).toDouble / 7.0
        r9(p * math.log(p / q))
      }.sum.toDouble
    }
    assert(got("a")._1 === 3L && got("a")._2 === 2L)
    assert(math.abs(got("a")._3 - kl(Map("x" -> 2L, "y" -> 1L))) < 1e-12)
    assert(got("b")._1 === 4L && got("b")._2 === 2L)
    assert(math.abs(got("b")._3 - kl(Map("y" -> 1L, "z" -> 3L))) < 1e-12)
  }

  test("a representative slice scores lower KL than a skewed one") {
    // corpus dominated by two balanced sources + one SMALL degenerate
    // source (a slice that is half the corpus would legitimately look
    // representative)
    val balanced1 = (0 until 100).map(i => ("bal1", s"t${i % 10} common"))
    val balanced2 = (0 until 100).map(i => ("bal2", s"t${(i + 3) % 10} common"))
    val skewed = (0 until 10).map(_ => ("skew", "zzz zzz zzz"))
    val df = (balanced1 ++ balanced2 ++ skewed).toDF("src", "text")
    val kls = Drift.unigramKl(df, "src", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kl")).toMap
    assert(kls("skew") > kls("bal1") * 2,
      s"skewed slice must stand out: $kls")
    assert(kls("bal1") >= 0.0 && kls("skew") >= 0.0,
      "KL is non-negative")
  }

  test("null text rows contribute nothing; a null key forms a group " +
      "whose KL equals the same group under a real name") {
    val df = Seq(
      ("a", "x y"), ("a", null.asInstanceOf[String]),
      (null.asInstanceOf[String], "x z")).toDF("src", "text")
    val rows = Drift.unigramKl(df, "src", "text").collect()
    val byKey = rows.map(r => Option(r.getString(0)) ->
      (r.getAs[Long]("n_tokens"), r.getAs[Double]("kl"))).toMap
    assert(byKey(Some("a"))._1 === 2L)
    assert(byKey(None)._1 === 2L)
    // the null group's counts must actually reach its KL: renaming
    // null to a real key changes nothing else, so KL must be equal
    val renamed = Drift.unigramKl(
      df.withColumn("src", coalesce($"src", lit("was_null"))),
      "src", "text").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("kl")).toMap
    assert(byKey(None)._2 === renamed("was_null"))
    assert(byKey(Some("a"))._2 === renamed("a"))
  }

  test("plan: corpus-side tables join broadcast, no cartesian of " +
      "data-sized frames") {
    val df = (0 until 200).map(i => (s"s${i % 3}", s"w${i % 17} w${i % 5}"))
      .toDF("src", "text")
    val plan = Drift.unigramKl(df, "src", "text")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("psi: identical slices score ~0 per bin; a shifted slice " +
      "concentrates mass in the top bin; clamping and smoothing " +
      "hand-checked") {
    val ref = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    // identical distribution → p_ref == p_cur in every bin → terms 0
    val same = Drift.psi(ref, ref, "v", "id", bins = 10).collect()
    assert(same.length == 10)
    assert(same.forall(_.getDouble(6) == 0.0),
      "identical slices must have exactly-zero PSI terms")
    // shifted current slice: every value beyond the reference max
    // clamps into bin 10
    val cur = (1L to 50L).map(i => (i, 1000L + i)).toDF("id", "v")
    val shifted = Drift.psi(ref, cur, "v", "id", bins = 10)
      .orderBy("bin").collect()
    val top = shifted.last
    assert(top.getLong(0) == 10L && top.getLong(3) == 50L,
      s"all current rows must clamp into the top bin: $top")
    // smoothing keeps empty-current bins finite: p_cur = 0.5/55
    val b1 = shifted.head
    assert(b1.getLong(3) == 0L && !b1.getDouble(6).isNaN &&
      !b1.getDouble(6).isInfinite)
    assert(math.abs(b1.getDouble(5) - 0.5 / 55.0) < 1e-9)
    // total PSI is large for the shifted slice
    assert(shifted.map(_.getDouble(6)).sum > 1.0)
  }

  test("psi: INT reference vs LONG current slice — the literal edge " +
      "frame is typed from the REF side (the side the edges were " +
      "collected from), so mixed value types bin instead of crashing") {
    import spark.implicits._
    val ref = (1 to 100).map(i => (i.toLong, i)).toDF("id", "v") // int v
    val cur = (1L to 50L).map(i => (i, 1000L + i)).toDF("id", "v") // long
    val out = Drift.psi(ref, cur, "v", "id", bins = 10)
      .orderBy("bin").collect()
    assert(out.length == 10)
    assert(out.last.getLong(3) == 50L,
      s"every long current value must clamp into the top bin: " +
        s"${out.last}")
  }

  test("ksStat: hand-computed D and argmax, identical slices score 0, " +
      "empty slice yields an empty frame") {
    import spark.implicits._
    // ref {1,2,3,4}, cur {3,4,5,6}: F_r−F_c gaps .25,.5,.5,.5,.25,0
    // → D = 0.5 first attained at x = 2
    val refD = Seq(1L, 2L, 3L, 4L).toDF("v")
    val curD = Seq(3L, 4L, 5L, 6L).toDF("v")
    val got = Drift.ksStat(refD, curD, "v").collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === 4L && got(0).getLong(1) === 4L)
    assert(math.abs(got(0).getDouble(2) - 0.5) < 1e-9)
    assert(got(0).getLong(3) === 2L, "smallest value attaining the max")
    // identical slices: D = 0 at the smallest value
    val same = Drift.ksStat(refD, refD, "v").collect()(0)
    assert(same.getDouble(2) === 0.0 && same.getLong(3) === 1L)
    // empty current slice: KS undefined -> empty, not 0
    assert(Drift.ksStat(refD, refD.limit(0), "v").count() === 0L)
    // ties/duplicates: ref {1,1,1,9}, cur {1,9,9,9}:
    // F_r(1)=.75 F_c(1)=.25 -> D=.5 at 1
    val dup = Drift.ksStat(
      Seq(1L, 1L, 1L, 9L).toDF("v"), Seq(1L, 9L, 9L, 9L).toDF("v"), "v")
      .collect()(0)
    assert(math.abs(dup.getDouble(2) - 0.5) < 1e-9 &&
      dup.getLong(3) === 1L)
  }

  test("chiSquared: hand-computed expected/terms, new category flags " +
      "with null term, vanished category still reports") {
    import spark.implicits._
    val refK = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).toDF("k")
    val curK = (Seq.fill(3)("a") ++ Seq.fill(6)("b") ++ Seq("c")).toDF("k")
    val got = Drift.chiSquared(refK, curK, "k").collect()
      .map(r => r.getString(0) -> r).toMap
    // expected: a=10*8/10=8, b=2; terms: a=(3-8)^2/8=3.125, b=(6-2)^2/2=8
    assert(got("a").getLong(1) === 8L && got("a").getLong(2) === 3L)
    assert(math.abs(got("a").getDouble(3) - 8.0) < 1e-9)
    assert(math.abs(got("a").getDouble(4) - 3.125) < 1e-9)
    assert(math.abs(got("b").getDouble(4) - 8.0) < 1e-9)
    assert(!got("a").getBoolean(5) && !got("b").getBoolean(5))
    // c is new: no expected, no term, flagged
    assert(got("c").getBoolean(5) && got("c").isNullAt(3) &&
      got("c").isNullAt(4))
    // vanished category: present in ref, absent in cur -> o=0, term>0
    val van = Drift.chiSquared(refK, Seq.fill(10)("a").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(van("b").getLong(2) === 0L &&
      math.abs(van("b").getDouble(4) - 2.0) < 1e-9)
  }
}
