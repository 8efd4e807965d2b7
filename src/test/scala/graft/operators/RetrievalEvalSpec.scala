package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  // q1: relevant a@1, c@3 of n_rel=4; q2: nothing relevant retrieved
  // (truth has h); q3: no truth at all
  private def results = Seq(
    ("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3), ("q1", "d", 4),
    ("q1", "e", 5),
    ("q2", "x", 1), ("q2", "y", 2),
    ("q3", "z", 1)).toDF("qid", "doc", "rank")

  private def truth = Seq(
    ("q1", "a"), ("q1", "c"), ("q1", "f"), ("q1", "g"),
    ("q2", "h")).toDF("qid", "doc")

  private def metrics = RetrievalEval
    .perQuery(results, truth, "qid", "doc", "rank", k = 5)
    .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))).toMap

  test("hand-computed recall/MRR/AP on a worked example") {
    val (nRel, hits, recall, mrr, ap, _) = metrics("q1")
    assert(nRel == 4 && hits == 2)
    assert(recall == 0.5)
    assert(mrr == 1.0)
    // AP@5 = (1/1 + 2/3 rounded to 9dp) / min(4,5)
    assert(math.abs(ap - (1.0 + 0.666666667) / 4) < 1e-12, ap.toString)
  }

  test("hand-computed nDCG with rounded gains") {
    val (_, _, _, _, _, ndcg) = metrics("q1")
    def g(r: Int) = BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val dcg = (g(1) + g(3)).toDouble
    val idcg = (g(1) + g(2) + g(3) + g(4)).toDouble
    assert(math.abs(ndcg - dcg / idcg) < 1e-12, ndcg.toString)
  }

  test("no relevant retrieved and no truth both score zero, not null") {
    val (n2, h2, r2, m2, a2, d2) = metrics("q2")
    assert((n2, h2) == (1L, 0L) && r2 == 0.0 && m2 == 0.0 && a2 == 0.0
      && d2 == 0.0)
    val (n3, h3, r3, m3, a3, d3) = metrics("q3")
    assert((n3, h3) == (0L, 0L) && r3 == 0.0 && m3 == 0.0 && a3 == 0.0
      && d3 == 0.0)
  }

  test("rank cutoff k excludes deeper hits") {
    val m = RetrievalEval.perQuery(results, truth, "qid", "doc", "rank",
      k = 2).where(col("qid") === "q1")
      .select("hits", "mrr").head()
    assert(m.getLong(0) == 1 && m.getDouble(1) == 1.0)
  }

  test("perfect ranking scores 1.0 on every metric") {
    val res = Seq(("q", "a", 1), ("q", "b", 2)).toDF("qid", "doc", "rank")
    val tr = Seq(("q", "a"), ("q", "b")).toDF("qid", "doc")
    val m = RetrievalEval.perQuery(res, tr, "qid", "doc", "rank", 5).head()
    assert(m.getDouble(3) == 1.0 && m.getDouble(4) == 1.0 &&
      m.getDouble(5) == 1.0 && math.abs(m.getDouble(6) - 1.0) < 1e-12)
  }

  test("reserved column names are rejected for rankCol too") {
    // a rankCol named 'hits' (etc.) would be silently shadowed after
    // the __rank rename and later joins could bind the wrong column
    val res = Seq(("q", "a", 1)).toDF("qid", "doc", "hits")
    val tr = Seq(("q", "a")).toDF("qid", "doc")
    intercept[IllegalArgumentException] {
      RetrievalEval.perQuery(res, tr, "qid", "doc", "hits", 5)
    }
  }

  test("duplicate truth pairs do not inflate n_rel or hits") {
    val tr = truth.unionAll(truth)
    val m = RetrievalEval.perQuery(results, tr, "qid", "doc", "rank", 5)
      .where(col("qid") === "q1").head()
    assert(m.getLong(1) == 4 && m.getLong(2) == 2)
  }
}
