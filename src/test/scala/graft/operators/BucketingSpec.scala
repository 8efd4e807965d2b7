package graft.operators

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("co-located join over bucketed tables plans with zero shuffles " +
      "and matches the plain join") {
    import spark.implicits._
    val orders = (1 to 1000)
      .map(i => (i.toLong, (i % 97).toLong, i * 1.5)).toDF("oid", "cust", "amt")
    val custs = (0 until 97).map(i => (i.toLong, s"c$i")).toDF("cust", "name")

    Bucketing.writeBucketed(orders, "b_orders", "cust", numBuckets = 4)
    Bucketing.writeBucketed(custs, "b_custs", "cust", numBuckets = 4)

    // force the sort-merge path: a broadcast join would "win" here only
    // because the test tables are tiny, and its BroadcastExchange would
    // mask what bucketing buys at scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_custs", "cust")
      val result = joined.groupBy("name").agg(count(lit(1)).as("cnt"))
        .orderBy("name").collect()

      // the join itself must be Exchange-free: both sides come out of
      // the files already hash-partitioned by cust
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")

      val expected = orders.join(custs, "cust")
        .groupBy("name").agg(count(lit(1)).as("cnt"))
        .orderBy("name").collect()
      assert(result.sameElements(expected))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_custs")
    }
  }

  test("bucketed aggregation on the bucket key skips the exchange too") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i % 31).toLong, i.toLong)).toDF("k", "v")
    Bucketing.writeBucketed(df, "b_agg", "k", numBuckets = 4)
    val agg = spark.table("b_agg").groupBy("k").agg(sum("v").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    val got = agg.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = df.groupBy("k").agg(sum("v").as("s"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(want))
    spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
