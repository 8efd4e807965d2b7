package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeDensifySpec extends SparkSpec {
  import spark.implicits._

  private def tbl(rows: (Long, String, Long)*) =
    rows.toDF("id", "name", "v")

  test("merge: update + insert + delete in one pass") {
    val target = tbl((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    val source = tbl((2L, "b2", 21L), (3L, "c", 30L), (4L, "d", 40L))
    val out = Lake.merge(target, source, Seq("id"),
      deleteWhen = Some(col("id") === 3L))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "a", 10L),   // target-only survives
      (2L, "b2", 21L),  // updated
      (4L, "d", 40L)))  // inserted; 3 deleted
  }

  test("merge: insert-only and update-only modes") {
    val target = tbl((1L, "a", 10L))
    val source = tbl((1L, "a2", 11L), (2L, "b", 20L))
    val insOnly = Lake.merge(target, source, Seq("id"),
      updateMatched = false).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(insOnly.toSeq === Seq((1L, "a"), (2L, "b")))
    val updOnly = Lake.merge(target, source, Seq("id"),
      insertUnmatched = false).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(updOnly.toSeq === Seq((1L, "a2")))
  }

  test("merge: null keys match null-safely; schema mismatch rejected") {
    val target = Seq((Option.empty[Long], "t", 1L), (Some(1L), "x", 2L))
      .toDF("id", "name", "v")
    val source = Seq((Option.empty[Long], "s", 9L))
      .toDF("id", "name", "v")
    val out = Lake.merge(target, source, Seq("id"))
      .orderBy("name").collect().map(_.getString(1))
    assert(out.toSeq === Seq("s", "x")) // null key updated null-safely
    intercept[IllegalArgumentException] {
      Lake.merge(target, source.select("name", "id", "v"), Seq("id"))
    }
  }

  test("densify zero-fills missing buckets across the observed span") {
    val df = Seq(
      ("k1", 0L), ("k1", 5L), ("k1", 25L),  // buckets 0, 0, 2
      ("k2", 12L))                           // bucket 1
      .toDF("key", "ts")
    val out = TimeWindows.densify(df, "ts", Seq("key"), bucketNs = 10L)
      .orderBy("key", "bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (0L, "k1", 2L), (1L, "k1", 0L), (2L, "k1", 1L),
      (0L, "k2", 0L), (1L, "k2", 1L), (2L, "k2", 0L)))
  }

  test("densify drops null keys/ts and rejects bad args") {
    val df = Seq((Some("k"), Some(1L)), (None, Some(2L)),
      (Some("k"), None)).toDF("key", "ts")
    val out = TimeWindows.densify(df, "ts", Seq("key"), 10L).collect()
    assert(out.length === 1)
    intercept[IllegalArgumentException] {
      TimeWindows.densify(df, "ts", Seq("key"), 0L)
    }
    intercept[IllegalArgumentException] {
      TimeWindows.densify(df, "ts", Seq(), 10L)
    }
  }
}
