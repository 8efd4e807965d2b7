package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionPlanSpec extends SparkSpec {
  import spark.implicits._

  test("bins fill to the target in order and overshoot by at most one " +
      "file") {
    val files = (1 to 100).map(i => (f"f$i%03d", 30L + i % 7)).toDF("file", "bytes")
    val plan = Lake.compactionPlan(files, "bytes", targetBytes = 100L,
      orderBy = Seq(col("file")), materialize = false)
      .orderBy("file").collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("bytes"),
        r.getAs[Long]("running_bytes"), r.getAs[Long]("bin")))
    // bins are contiguous, non-decreasing in file order
    val bins = plan.map(_._4)
    assert(bins.zip(bins.tail).forall { case (a, b) => b == a || b == a + 1 },
      "bins must advance by at most 1 in layout order")
    // every full bin's total is within one max-file-size of the
    // target on either side (bin k holds the files STARTING in
    // [k·target, (k+1)·target))
    val totals = plan.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    val last = bins.max
    for ((bin, tot) <- totals if bin != last)
      assert(tot > 100L - 37L && tot < 100L + 37L, s"bin $bin total $tot")
    // running_bytes is the exact inclusive prefix sum
    var run = 0L
    for ((_, bytes, running, _) <- plan) {
      run += bytes
      assert(running === run)
    }
  }

  test("a file larger than the target gets its own advancing bin") {
    val files = Seq(("a", 50L), ("b", 500L), ("c", 10L)).toDF("file", "bytes")
    val plan = Lake.compactionPlan(files, "bytes", 100L,
      Seq(col("file")), materialize = false)
      .orderBy("file").collect()
      .map(r => r.getAs[String]("file") -> r.getAs[Long]("bin")).toMap
    assert(plan("a") === 0L)
    assert(plan("b") === 0L)   // starts in bin 0 (offset 50 < 100)
    assert(plan("c") === 5L)   // offset 550 -> bin 5: the giant advanced it
  }

  test("null sizes count as zero, plan order is the caller's") {
    val files = Seq(("a", Some(60L)), ("b", None), ("c", Some(60L)))
      .toDF("file", "bytes")
    val plan = Lake.compactionPlan(files, "bytes", 100L,
      Seq(col("file")), materialize = false)
      .orderBy("file").collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("running_bytes"),
        r.getAs[Long]("bin")))
    assert(plan.toSeq === Seq(("a", 60L, 0L), ("b", 60L, 0L),
      ("c", 120L, 0L)))
  }

  test("plan shape: the running sum never plans a single-task global " +
      "window") {
    val files = spark.range(0, 2000)
      .select(concat(lit("f"), col("id")).as("file"),
        (col("id") % 97 + 10).as("bytes"))
    val plan = Lake.compactionPlan(files, "bytes", 1000L,
      Seq(col("file")), materialize = false)
    val physical = plan.queryExecution.executedPlan.toString()
    assert(!physical.contains("Window"),
      s"compaction plan must not use a window:\n$physical")
  }
}
