package graft.sources

import graft.SparkSpec

class JsonlSourceSpec extends SparkSpec {

  test("jsonl round-trip preserves newlines, unicode, quotes, and nulls") {
    import spark.implicits._
    val rows = Seq(
      (1L, "line one\nline two", Some("en")),
      (2L, "quote \" and backslash \\ and tab\t", Some("de")),
      (3L, "héllo wörld — 中文テキスト", None),
      (4L, "", Some("fr"))) // empty string is NOT null in JSONL
    val df = rows.toDF("id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl-spec")
      .toString
    JsonlSource.write(df, tmp)
    val back = JsonlSource.read(spark, tmp, Some(df.schema))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2))))
    assert(back.toSeq == rows.map(t => (t._1, t._2, t._3)))
  }

  test("declared schema surfaces type drift instead of silently " +
      "widening to string") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl-bad")
    java.nio.file.Files.writeString(tmp.resolve("part-0.json"),
      """{"id": 1, "n": 5}
        |{"id": 2, "n": "not-a-number"}
        |""".stripMargin)
    val schema = Seq((1L, 5L)).toDF("id", "n").schema
    val got = JsonlSource.read(spark, tmp.toString, Some(schema))
      .orderBy("id").collect()
    // permissive mode: the malformed field reads as null, the row stays
    assert(got.length == 2 && got(1).isNullAt(1))
    // inference instead quietly widens n to string for ALL rows
    val inferred = JsonlSource.read(spark, tmp.toString)
    assert(inferred.schema("n").dataType ==
      org.apache.spark.sql.types.StringType)
  }
}
