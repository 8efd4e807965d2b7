package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(ls: Seq[String], rs: Seq[String], d: Int) = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    (for (l <- ls.distinct; r <- rs.distinct; dist = lev(l, r)
      if dist <= d) yield (l, r, dist)).toSet
  }

  private def run(ls: Seq[String], rs: Seq[String], d: Int, q: Int = 3) =
    FuzzyJoin.editJoin(ls.toDF("l"), rs.toDF("r"), "l", "r", d, q)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet

  test("matches brute force on mixed-length strings (d=1)") {
    val ls = Seq("small ring", "red widget", "blue bolt", "hot gear", "ax")
    val rs = Seq("small rings", "red wadget", "blue bolts", "cold gear",
      "axe", "unrelated string")
    assert(run(ls, rs, 1) == bruteForce(ls, rs, 1))
  }

  test("matches brute force at d=2 including short strings below the gram bound") {
    // q=3, d=2 → gram guarantee needs len >= 9; these straddle it
    val ls = Seq("abcdef", "ab", "x", "abcdefghijk", "gear")
    val rs = Seq("abcdxf", "ba", "xy", "abcdefghixk", "gears", "geor",
      "completely different")
    assert(run(ls, rs, 2) == bruteForce(ls, rs, 2))
  }

  test("d=0 degenerates to exact equality") {
    val ls = Seq("alpha", "beta", "g")
    val rs = Seq("alpha", "betA", "g")
    assert(run(ls, rs, 0) == Set(("alpha", "alpha", 0), ("g", "g", 0)))
  }

  test("duplicate input rows verify once per distinct value pair") {
    val ls = Seq.fill(50)("red widget")
    val rs = Seq.fill(50)("red wadget")
    val out = run(ls, rs, 1)
    assert(out == Set(("red widget", "red wadget", 1)))
  }

  test("unicode strings: multi-byte chars count as single edits") {
    val got = run(Seq("çéδx"), Seq("çéδy", "çéδx"), 1, q = 2)
    assert(got == Set(("çéδx", "çéδy", 1), ("çéδx", "çéδx", 0)))
  }

  test("plan: no cartesian product at any band") {
    val ls = Seq("small ring", "ab").toDF("l")
    val rs = Seq("small rings", "ba").toDF("r")
    val plan = FuzzyJoin.editJoin(ls, rs, "l", "r", 1)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesian"), plan)
    assert(!plan.contains("broadcastnestedloop"), plan)
  }

  test("prefix filter preserves the exact result set (d=1 and d=2)") {
    val ls = Seq("small ring", "red widget", "blue bolt", "hot gear",
      "ax", "abcdefghijk")
    val rs = Seq("small rings", "red wadget", "blue bolts", "cold gear",
      "axe", "abcdefghixk", "unrelated string")
    for (d <- Seq(1, 2)) {
      val plain = FuzzyJoin.editJoin(ls.toDF("l"), rs.toDF("r"),
        "l", "r", d).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val filtered = FuzzyJoin.editJoin(ls.toDF("l"), rs.toDF("r"),
        "l", "r", d, prefixFilter = true).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(filtered == plain, s"d=$d")
      assert(plain == bruteForce(ls, rs, d), s"d=$d vs brute force")
    }
  }

  test("prefix filter caps per-value gram fan-out at d*q+1") {
    // every left value shares the hot gram "aaa" with every right value;
    // the filter must keep at most d*q+1 grams per left value
    val ls = (0 until 20).map(i => s"aaaa${i}%02dzzz")
    val rs = (0 until 20).map(i => s"aaaa${i}%02dyyy")
    val d = 1; val q = 3
    val plain = FuzzyJoin.editJoin(ls.toDF("l"), rs.toDF("r"), "l", "r",
      d, q).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val filtered = FuzzyJoin.editJoin(ls.toDF("l"), rs.toDF("r"), "l",
      "r", d, q, prefixFilter = true).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(filtered == plain)
  }
}
