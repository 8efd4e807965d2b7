package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaintainRollupSpec extends SparkSpec {
  import spark.implicits._

  private def rollupMap(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => Option(r.getString(0)) ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("sum_n"))).toMap

  test("invariant: maintain(rollup(before), diff(before, after)) == " +
      "rollup(after), including group moves, deletes, and inserts") {
    val before = (1 to 200).map(i =>
      (i.toLong, s"g${i % 5}", (i * 7 % 100).toLong)).toDF("id", "g", "n")
    val after = before
      .filter($"id" % 13 =!= 0)                                 // deletes
      .withColumn("n", when($"id" % 7 === 0, $"n" + 50).otherwise($"n"))
      .withColumn("g", when($"id" % 11 === 0, lit("moved")).otherwise($"g"))
      .unionByName(Seq((900L, "g0", 5L), (901L, "brand_new", 9L))
        .toDF("id", "g", "n"))                                  // inserts
    val base = Lake.groupRollup(before, "g", "n")
    val changes = Lake.snapshotDiff(before, after, Seq("id"), Seq("g", "n"))
    val maintained = rollupMap(Lake.maintainRollup(base, changes, "g", "n"))
    val direct = rollupMap(Lake.groupRollup(after, "g", "n"))
    assert(maintained === direct)
    assert(maintained.contains(Some("moved")) &&
      maintained.contains(Some("brand_new")),
      "fixture must exercise group moves and inserts")
  }

  test("a group fully deleted disappears, as a recompute would drop it") {
    val before = Seq((1L, "solo", 10L), (2L, "keep", 20L)).toDF("id", "g", "n")
    val after = before.filter($"id" =!= 1L)
    val maintained = rollupMap(Lake.maintainRollup(
      Lake.groupRollup(before, "g", "n"),
      Lake.snapshotDiff(before, after, Seq("id"), Seq("g", "n")), "g", "n"))
    assert(maintained === Map(Some("keep") -> ((1L, 20L))))
  }

  test("null keys and null values maintain consistently with the " +
      "direct rollup") {
    val before = Seq(
      (1L, null.asInstanceOf[String], Some(10L)),
      (2L, null.asInstanceOf[String], None),
      (3L, "a", Some(7L))).toDF("id", "g", "n")
    val after = Seq(
      (1L, null.asInstanceOf[String], Some(99L)), // update in null group
      (3L, "a", Some(7L)),
      (4L, "a", None)).toDF("id", "g", "n")       // insert with null value
    val maintained = rollupMap(Lake.maintainRollup(
      Lake.groupRollup(before, "g", "n"),
      Lake.snapshotDiff(before, after, Seq("id"), Seq("g", "n")), "g", "n"))
    val direct = rollupMap(Lake.groupRollup(after, "g", "n"))
    assert(maintained === direct)
    assert(maintained(None) === ((1L, 99L)))
    assert(maintained(Some("a")) === ((2L, 7L)))
  }

  test("an empty change set leaves the rollup untouched") {
    val before = Seq((1L, "a", 5L), (2L, "b", 6L)).toDF("id", "g", "n")
    val maintained = rollupMap(Lake.maintainRollup(
      Lake.groupRollup(before, "g", "n"),
      Lake.snapshotDiff(before, before, Seq("id"), Seq("g", "n")), "g", "n"))
    assert(maintained === rollupMap(Lake.groupRollup(before, "g", "n")))
  }
}
