package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  // two keys with different scales; values 1..100 and 1000..1100
  private def data = (
    (1 to 100).map(i => ("a", i.toDouble)) ++
    (0 to 100).map(i => ("b", 1000.0 + i))).toDF("k", "v")

  private def q7(sorted: Seq[Double], p: Double): Double = {
    val rank = (sorted.size - 1) * p
    val lo = math.floor(rank).toInt; val hi = math.ceil(rank).toInt
    val g = rank - lo
    (1 - g) * sorted(lo) + g * sorted(hi)
  }

  test("winsorize clamps exactly to the type-7 cutpoints per key") {
    val out = Outliers.winsorize(data, Seq("k"), "v", 0.1, 0.9)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val as = (1 to 100).map(_.toDouble)
    val bs = (0 to 100).map(1000.0 + _)
    val (aLo, aHi) = (q7(as, 0.1), q7(as, 0.9))
    val (bLo, bHi) = (q7(bs, 0.1), q7(bs, 0.9))
    out.foreach { case (k, v, w) =>
      val (lo, hi) = if (k == "a") (aLo, aHi) else (bLo, bHi)
      assert(w == math.max(lo, math.min(hi, v)), s"($k, $v) -> $w")
    }
    // some rows actually clamped on both tails of both keys
    assert(out.count { case (_, v, w) => w > v } >= 10)
    assert(out.count { case (_, v, w) => w < v } >= 10)
  }

  test("trim keeps exactly the in-range rows, inclusive bounds") {
    val kept = Outliers.trim(data, Seq("k"), "v", 0.1, 0.9)
      .where(col("k") === "a").select("v").as[Double].collect().sorted
    val as = (1 to 100).map(_.toDouble)
    val (lo, hi) = (q7(as, 0.1), q7(as, 0.9))
    assert(kept.toSeq == as.filter(v => v >= lo && v <= hi))
  }

  test("null values pass through winsorize and are dropped by trim") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(100.0)),
      ("a", Some(50.0))).toDF("k", "v")
    val w = Outliers.winsorize(df, Seq("k"), "v", 0.0, 1.0)
    assert(w.where(col("winsorized").isNull).count() == 1)
    assert(Outliers.trim(df, Seq("k"), "v", 0.0, 1.0).count() == 3)
  }

  test("keys are independent: one key's outliers don't move another's cuts") {
    val w = Outliers.winsorize(data, Seq("k"), "v", 0.1, 0.9)
    val aMax = w.where(col("k") === "a").agg(max("winsorized"))
      .as[Double].head()
    assert(aMax < 1000.0, s"key a clamped against key b's range: $aMax")
  }

  test("plan: clamp pass joins the cutpoints by broadcast") {
    val plan = Outliers.winsorize(data, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
