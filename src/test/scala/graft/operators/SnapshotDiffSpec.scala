package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val before = Seq(
    (1L, "en", 100L), (2L, "de", 200L), (3L, "fr", 300L),
    (4L, "en", 400L), (5L, null.asInstanceOf[String], 500L))
    .toDF("id", "lang", "n")

  test("emits exactly the change set: insert / delete / update, " +
      "unchanged dropped") {
    val after = Seq(
      (1L, "en", 100L),   // unchanged
      (2L, "de", 999L),   // update (n)
      (3L, "es", 300L),   // update (lang)
      // 4 deleted
      (5L, null.asInstanceOf[String], 500L), // unchanged (null-safe)
      (6L, "it", 600L))   // insert
      .toDF("id", "lang", "n")
    val got = Lake.snapshotDiff(before, after, Seq("id"), Seq("lang", "n"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(5))).toSeq
    assert(got === Seq((2L, "update"), (3L, "update"), (4L, "delete"),
      (6L, "insert")))
  }

  test("before/after values ride along; missing side stays null") {
    val after = Seq((2L, "de", 999L), (6L, "it", 600L)).toDF("id", "lang", "n")
    val rows = Lake.snapshotDiff(
      before.filter($"id".isin(2L, 4L)), after.filter($"id".isin(2L, 6L)),
      Seq("id"), Seq("lang", "n"))
      .orderBy("id").collect()
    val upd = rows.find(_.getLong(0) == 2L).get
    assert(upd.getAs[Long]("n_before") === 200L)
    assert(upd.getAs[Long]("n_after") === 999L)
    val del = rows.find(_.getLong(0) == 4L).get
    assert(del.getAs[String]("op") === "delete")
    assert(del.isNullAt(del.fieldIndex("n_after")))
    val ins = rows.find(_.getLong(0) == 6L).get
    assert(ins.isNullAt(ins.fieldIndex("n_before")))
    assert(ins.getAs[Long]("n_after") === 600L)
  }

  test("null-valued compare columns diff null-safely: null -> value " +
      "and value -> null are updates, null -> null is unchanged") {
    val after = Seq(
      (1L, null.asInstanceOf[String], 100L),  // en -> null: update
      (2L, "de", 200L), (3L, "fr", 300L), (4L, "en", 400L),
      (5L, "pt", 500L))                       // null -> pt: update
      .toDF("id", "lang", "n")
    val ops = Lake.snapshotDiff(before, after, Seq("id"), Seq("lang", "n"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("op")).toMap
    assert(ops === Map(1L -> "update", 5L -> "update"))
  }

  test("identical snapshots produce an empty change set") {
    assert(Lake.snapshotDiff(before, before, Seq("id"), Seq("lang", "n"))
      .count() === 0L)
  }

  test("no compare columns: only membership changes surface") {
    val after = before.filter($"id" =!= 4L)
      .withColumn("n", $"n" + 1) // would be updates if compared
    val got = Lake.snapshotDiff(before, after, Seq("id"), Nil)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("op")).toSeq
    assert(got === Seq(4L -> "delete"))
  }

  test("works when before and after derive from the same source plan " +
      "(self-join disambiguation)") {
    val base = before
    val after = base.withColumn("n",
      when($"id" === 2L, $"n" * 10).otherwise($"n"))
    val got = Lake.snapshotDiff(base, after, Seq("id"), Seq("n"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("op")).toSeq
    assert(got === Seq(2L -> "update"))
  }
}
