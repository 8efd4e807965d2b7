package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class ReadEvolvedSpec extends SparkSpec {
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("three schema generations read as one frame: added column, " +
      "widened type, dropped extra") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-evo-spec")
      .toString
    // v1: (id int, name) — id narrower than target, score absent
    Seq((1, "a"), (2, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$tmp/v1")
    // v2: (id long, name, score float) — float needs widening
    Seq((3L, "c", 1.5f)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(s"$tmp/v2")
    // v3: adds a column the target does not want
    Seq((4L, "d", 2.5, "junk")).toDF("id", "name", "score", "extra")
      .write.mode("overwrite").parquet(s"$tmp/v3")
    val got = Lake.readEvolved(spark,
      Seq(s"$tmp/v1", s"$tmp/v2", s"$tmp/v3"), target)
    assert(got.schema === target)
    val rows = got.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows === Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(1.5)), (4L, "d", Some(2.5))))
  }

  test("filters still push down through the evolved projection") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-evo-push")
      .toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$tmp/v1")
    Seq((3L, "c", 9.0)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(s"$tmp/v2")
    val q = Lake.readEvolved(spark, Seq(s"$tmp/v1", s"$tmp/v2"), target)
      .filter($"id" > 1L)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"pushdown lost through the cast layer:\n$plan")
    assert(q.count() === 2L)
  }

  test("a target column absent EVERYWHERE still appears, all null") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-evo-none")
      .toString
    Seq((1L, "a")).toDF("id", "name").write.mode("overwrite")
      .parquet(s"$tmp/v1")
    val got = Lake.readEvolved(spark, Seq(s"$tmp/v1"), target).collect()
    assert(got.length === 1 && got.head.isNullAt(2))
  }
}
