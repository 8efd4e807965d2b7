package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("bucketed range join matches the naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("pid", "v")
    val intervals = (1 to 80).map { i =>
      val lo = rnd.nextDouble() * 95
      (i.toLong, lo, lo + rnd.nextDouble() * 8)
    }.toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi",
      binWidth = 5.0).select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("inclusive bounds and cross-bin intervals") {
    import spark.implicits._
    val points = Seq((1L, 10.0), (2L, 20.0), (3L, 15.0)).toDF("pid", "v")
    // interval spans multiple bins at binWidth=2
    val intervals = Seq((7L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val res = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi",
      binWidth = 2.0).select("pid").collect().map(_.getLong(0)).toSet
    assert(res == Set(1L, 2L, 3L)) // both endpoints inclusive, no dups
    val cnt = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi",
      binWidth = 2.0).count()
    assert(cnt == 3) // each pair exactly once despite bin replication
  }

  test("column collision rejected") {
    import spark.implicits._
    val p = Seq((1L, 1.0)).toDF("id", "v")
    val i = Seq((1L, 0.0, 2.0)).toDF("id", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, i, "v", "lo", "hi", 1.0)
    }
  }
}
