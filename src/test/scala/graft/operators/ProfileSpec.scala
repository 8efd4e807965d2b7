package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("counts rows, nulls and exact distincts per column") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(1)), (Some("a"), Some(2)),
      (Some("b"), None), (None, Some(2))
    ).toDF("s", "v")
    val out = Profile.summarize(df, Seq("s", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("s") == (4L, 1L, 2L))
    assert(out("v") == (4L, 1L, 2L))
  }

  test("unknown column is rejected") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    intercept[IllegalArgumentException] {
      Profile.summarize(df, Seq("nope"))
    }
  }
}
