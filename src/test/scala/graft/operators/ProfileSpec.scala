package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("percentileRank: exact (rank-1)/(n-1), null drop, single-row 0") {
    import spark.implicits._
    val df = Seq((1L, Some(30L)), (2L, Some(10L)), (3L, Some(20L)),
      (4L, None)).toDF("id", "v")
      .select($"id", $"v".cast("long").as("v"))
    val got = Profile.percentileRank(df, "id", "v", materialize = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === Map(2L -> 0.0, 3L -> 0.5, 1L -> 1.0), s"$got")
    val one = Profile.percentileRank(Seq((7L, 5L)).toDF("id", "v"),
      "id", "v", materialize = false)
      .collect().map(r => r.getDouble(2)).toSeq
    assert(one === Seq(0.0))
    // partitioning-invariant
    val a = Profile.percentileRank(df.repartition(5), "id", "v",
      materialize = false).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === got)
  }

  test("ntileExact matches Spark's own ntile window bit-for-bit over " +
      "every (n, k) shape — big tiles first, partitioning-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1, 2, 3, 4, 5, 7, 10, 11, 97); k <- Seq(1, 2, 4, 5)) {
      // values deliberately tie-heavy: the id tiebreak decides order
      val df = (1 to n).map(i => (i.toLong, (i % 3).toLong))
        .toDF("id", "v").repartition(4)
      val want = df.select($"id",
          ntile(k).over(Window.orderBy($"v".asc, $"id".asc))
            .cast("long").as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Profile.ntileExact(df, Seq($"v".asc, $"id".asc), k, "t",
          materialize = false)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === want, s"n=$n k=$k")
    }
  }

  test("counts rows, nulls and exact distincts per column") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(1)), (Some("a"), Some(2)),
      (Some("b"), None), (None, Some(2))
    ).toDF("s", "v")
    val out = Profile.summarize(df, Seq("s", "v"), exact = true).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("s") == (4L, 1L, 2L))
    assert(out("v") == (4L, 1L, 2L))
  }

  test("default approx profile estimates distincts without Expand") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (s"k${i % 7}", i)).toDF("s", "v")
    val profiled = Profile.summarize(df, Seq("s", "v"))
    val out = profiled.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // HLL at these cardinalities is exact in practice; assert tight
    assert(out("s") == (1000L, 0L, 7L))
    assert(out("v")._1 == 1000L && math.abs(out("v")._3 - 1000L) <= 30L)
    // the scale point: the default path must NOT multiply the scan via
    // Expand the way exact multi-distinct does
    val agg = df.agg(count(lit(1)),
      approx_count_distinct($"s"), approx_count_distinct($"v"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("histogram buckets, clamps outliers, zero-fills empty buckets") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 1.0, 1.5, 9.9, 25.0).toDF("v")
    val h = Profile.histogram(df, "v", minVal = 0.0, maxVal = 10.0,
      buckets = 5).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // -5 clamps into bucket 0; 25 clamps into bucket 4; bucket 1-3 span
    assert(h.toSeq == Seq(
      (0L, 0.0, 2.0, 4L), // -5, 0.0, 1.0, 1.5
      (1L, 2.0, 4.0, 0L),
      (2L, 4.0, 6.0, 0L),
      (3L, 6.0, 8.0, 0L),
      (4L, 8.0, 10.0, 2L))) // 9.9, 25
  }

  test("histogram excludes NaN and infinities (no bucket owns them)") {
    import spark.implicits._
    val df = Seq(1.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity).toDF("v")
    val h = Profile.histogram(df, "v", 0.0, 10.0, 2)
      .orderBy("bucket").collect().map(_.getLong(3))
    assert(h.toSeq == Seq(1L, 0L))
  }

  test("unknown column is rejected") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    intercept[IllegalArgumentException] {
      Profile.summarize(df, Seq("nope"))
    }
  }

  test("heavyHitters: sketch candidates + exact verify equals the " +
      "exact HAVING answer, false positives dropped") {
    import spark.implicits._
    // zipf-ish: token t_k appears 2000/k times, plus a long tail of
    // singletons the sketch must not promote past the exact filter
    val rows = (1 to 20).flatMap(k =>
      Seq.fill(2000 / k)(s"t$k")) ++ (1 to 5000).map(i => s"tail$i")
    val df = rows.toDF("tok").repartition(16)
    val minSupport = 0.02 // threshold ≈ ceil(0.02 * 21877)
    val got = Profile.heavyHitters(df, "tok", minSupport, eps = 1e-3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.size
    val thr = math.ceil(minSupport * n).toLong
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toSeq
      .sortBy { case (v, c) => (-c, v) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    assert(got.nonEmpty && got.forall(!_._1.startsWith("tail")))
  }

  test("heavyHitters on an empty frame returns empty, not an error") {
    import spark.implicits._
    val df = Seq.empty[String].toDF("tok")
    assert(Profile.heavyHitters(df, "tok", 0.1).count() == 0L)
  }

  test("quantilesByKey: type-1 quantiles hand-checked, q=1 is the " +
      "max, nulls excluded, single-row and tied groups, " +
      "partitioning-independent") {
    import spark.implicits._
    // a: 1..4 -> p25 rank ceil(1)=1 -> 1, p50 rank 2 -> 2, p75 rank 3
    // b: {5} -> every q hits rank 1 -> 5
    // c: {7,7,9} -> p50 rank 2 -> 7 (ties well-defined: value at rank)
    // d: all-null values -> drops out
    val df = (Seq(("a", 3L), ("a", 1L), ("a", 4L), ("a", 2L),
      ("b", 5L), ("c", 7L), ("c", 9L), ("c", 7L))
      .map { case (k, v) => (k, Some(v)) } :+ ("d" -> None))
      .toDF("k", "v")
    def run(in: org.apache.spark.sql.DataFrame) =
      Profile.quantilesByKey(in, Seq("k"), "v",
        Seq(0.25, 0.5, 0.75, 1.0), materialize = false)
        .collect().map(r =>
          (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val got = run(df)
    assert(got(("a", 0.25)) === 1L && got(("a", 0.5)) === 2L &&
      got(("a", 0.75)) === 3L && got(("a", 1.0)) === 4L)
    assert(Seq(0.25, 0.5, 0.75, 1.0).forall(q => got(("b", q)) === 5L))
    assert(got(("c", 0.5)) === 7L && got(("c", 1.0)) === 9L)
    assert(!got.keySet.exists(_._1 == "d"), "all-null group must drop")
    assert(run(df.repartition(7)) === got)
  }

  test("quantilesByKey keeps a NULL key group (null-safe key join — " +
      "the sibling operators' 'null keys count as a group' rule)") {
    import spark.implicits._
    val df = Seq((Some("a"), 1L), (Some("a"), 3L), (None, 5L),
      (None, 7L)).toDF("k", "v")
    val got = Profile.quantilesByKey(df, Seq("k"), "v", Seq(0.5, 1.0),
      materialize = false)
      .collect()
      .map(r => (Option(r.getString(0)), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(got((None, 0.5, 5L)) && got((None, 1.0, 7L)),
      s"null-key group dropped: $got")
    assert(got((Some("a"), 0.5, 1L)) && got((Some("a"), 1.0, 3L)))
  }
}
