package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    "id_pos" -> (col("id") > 0L),
    "name_present" -> (col("name").isNotNull && length(col("name")) > 0),
    "score_range" -> (col("score") >= 0.0 && col("score") <= 1.0))

  test("violations name every failed rule in rule order; clean rows " +
      "get null") {
    val df = Seq(
      (1L, "ok", 0.5),
      (-2L, "", 0.5),   // id_pos + name_present
      (3L, "x", 7.0))   // score_range
      .toDF("id", "name", "score")
    val got = Lake.validate(df, rules)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("violations")))
      .toMap
    assert(got(1L).isEmpty)
    assert(got(-2L).contains("id_pos,name_present"))
    assert(got(3L).contains("score_range"))
  }

  test("a null predicate input is a violation, not a pass — unknown " +
      "is not clean") {
    val df = Seq((Some(1L), Some("a"), None: Option[Double]),
      (Some(2L), None: Option[String], Some(0.5)))
      .toDF("id", "name", "score")
    val got = Lake.validate(df, rules)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("violations"))
      .toMap
    assert(got(1L) === "score_range")
    assert(got(2L) === "name_present")
  }

  test("the clean/quarantine split partitions the feed exactly") {
    val df = (1 to 100).map(i => (i.toLong, s"n$i", (i % 3) * 0.4))
      .toDF("id", "name", "score")
    val v = Lake.validate(df, rules)
    assert(v.where(col("violations").isNull).count() +
      v.where(col("violations").isNotNull).count() === 100L)
    // no shuffle: the gate is a free rider on the scan
    val plan = v.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"validate must stay narrow:\n$plan")
  }

  test("guards: duplicate rule names, empty rules, colliding out " +
      "column") {
    val df = Seq((1L, "a", 0.1)).toDF("id", "name", "score")
    intercept[IllegalArgumentException](Lake.validate(df, Nil))
    intercept[IllegalArgumentException](
      Lake.validate(df, Seq("r" -> lit(true), "r" -> lit(false))))
    intercept[IllegalArgumentException](
      Lake.validate(df.withColumn("violations", lit("x")), rules))
  }
}
