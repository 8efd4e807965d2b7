package graft.operators

import graft.SparkSpec

class KnnClassifySpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("majority of k neighbors wins; ties take the smallest label") {
    import spark.implicits._
    // 1-d integer-valued vectors (exactly representable — no float
    // rounding in the distance ordering): cluster A at 0,2,4 labeled
    // "a", cluster B at 10,12 labeled "b"
    val corpus = Seq(
      (1L, Array(0.0f), "a"), (2L, Array(2.0f), "a"), (3L, Array(4.0f), "a"),
      (4L, Array(10f), "b"), (5L, Array(12f), "b")
    ).toDF("id", "vec", "lbl")
    val queries = Seq((100L, Array(1.0f)), (101L, Array(11f)))
      .toDF("qid", "vec")
    val pred = KnnClassify.predict(corpus, "vec", "id", "lbl",
      queries, "qid", "vec", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(pred(100L) == ("a", 3L))
    // query at 11: neighbors are the two b's and one a → b with 2 votes
    assert(pred(101L) == ("b", 2L))

    // exact tie (k=2 → one a, one b): query at 7 is distance 3 from
    // both a@4 and b@10 → (dist, id) rank admits one of each →
    // smallest label wins
    val mid = Seq((200L, Array(7.0f))).toDF("qid", "vec")
    val tied = KnnClassify.predict(corpus, "vec", "id", "lbl",
      mid, "qid", "vec", k = 2).collect()
    assert(tied.head.getString(1) == "a" && tied.head.getLong(2) == 1L)
  }

  test("reserved output column names are rejected") {
    import spark.implicits._
    val corpus = Seq((1L, Array(0.0f), "a")).toDF("id", "vec", "votes")
    val queries = Seq((9L, Array(0.0f))).toDF("qid", "vec")
    intercept[IllegalArgumentException] {
      KnnClassify.predict(corpus, "vec", "id", "votes",
        queries, "qid", "vec", k = 1)
    }
  }

  test("null-labeled corpus rows never vote") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(0.0f), Some("a")), (2L, Array(0.1f), None),
      (3L, Array(0.2f), Some("b"))
    ).toDF("id", "vec", "lbl")
    val queries = Seq((9L, Array(0.0f))).toDF("qid", "vec")
    val pred = KnnClassify.predict(corpus, "vec", "id", "lbl",
      queries, "qid", "vec", k = 2).collect()
    // the null row is excluded BEFORE ranking, so both votes are real
    assert(pred.head.getString(1) == "a")
    assert(pred.head.getLong(2) == 1L)
  }
}
