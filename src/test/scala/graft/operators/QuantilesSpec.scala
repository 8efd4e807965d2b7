package graft.operators

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("matches numpy-style linear interpolation on a known set") {
    import spark.implicits._
    // values 10,20,30,40 → p=0.5: rank 1.5 → 25; p=0.25: rank 0.75 → 17.5
    val df = Seq(("k", 30.0), ("k", 10.0), ("k", 40.0), ("k", 20.0))
      .toDF("key", "v")
    val q = Quantiles.exact(df, Seq("key"), "v", Seq(0.0, 0.25, 0.5, 1.0))
      .orderBy("p").collect().map(r => r.getDouble(1) -> r.getDouble(2))
    assert(q.toSeq == Seq(0.0 -> 10.0, 0.25 -> 17.5, 0.5 -> 25.0, 1.0 -> 40.0))
  }

  test("per-key isolation and null exclusion") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(100.0))).toDF("key", "v")
    val q = Quantiles.exact(df, Seq("key"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(q == Map("a" -> 2.0, "b" -> 100.0))
  }

  test("reserved column names are rejected up front") {
    import spark.implicits._
    val df = Seq(("k", 1.0)).toDF("p", "v")
    intercept[IllegalArgumentException] {
      Quantiles.exact(df, Seq("p"), "v", Seq(0.5))
    }
  }

  test("agrees with Spark's exact percentile aggregate") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 997).map(_ => ("k", rnd.nextDouble() * 100))
      .toDF("key", "v")
    val ours = Quantiles.exact(df, Seq("key"), "v", Seq(0.1, 0.5, 0.9))
      .orderBy("p").collect().map(_.getDouble(2))
    val spark_ = df.groupBy("key")
      .agg(expr("percentile(v, array(0.1, 0.5, 0.9))").as("q"))
      .select(explode(col("q"))).collect().map(_.getDouble(0))
    ours.zip(spark_).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    }
  }
}
