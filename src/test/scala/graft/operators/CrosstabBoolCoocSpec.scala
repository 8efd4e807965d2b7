package graft.operators

import graft.SparkSpec

class CrosstabBoolCoocSpec extends SparkSpec {
  import spark.implicits._

  test("crosstab fills the explicit domain with exact counts and 0s") {
    val df = Seq(
      ("en", "a"), ("en", "a"), ("en", "b"),
      ("de", "b"), ("de", "c"), // c not in domain -> dropped
      (null.asInstanceOf[String], "a")) // null row key excluded
      .toDF("lang", "source")
    val out = Profile.crosstab(df, "lang", "source", Seq("a", "b"))
      .orderBy("lang").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq(("de", 0L, 1L), ("en", 2L, 1L)))
    intercept[IllegalArgumentException] {
      Profile.crosstab(df, "lang", "source", Seq())
    }
    intercept[IllegalArgumentException] {
      Profile.crosstab(df, "lang", "source", Seq("a", "a"))
    }
  }

  test("booleanQuery is AND over distinct tokens with NOT exclusion") {
    val docs = Seq(
      (1L, "spark join window"),
      (2L, "join window"), // missing spark
      (3L, "spark spark join window window"), // dup tokens count once
      (4L, "spark join window slow"), // excluded
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Bm25.booleanQuery(docs, "doc_id", "text",
      Seq("spark", "join", "window"), Seq("slow"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 3L), (3L, 3L)))
    // no exclusions: plain AND
    val and = Bm25.booleanQuery(docs, "doc_id", "text",
      Seq("spark", "join", "window"))
      .orderBy("doc_id").collect()
    assert(and.map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
    intercept[IllegalArgumentException] {
      Bm25.booleanQuery(docs, "doc_id", "text", Seq())
    }
    intercept[IllegalArgumentException] {
      Bm25.booleanQuery(docs, "doc_id", "text", Seq("a"), Seq("a"))
    }
  }

  test("coocLift counts doc-level pairs and computes exact lift") {
    // vocab by df: x(3), y(2), z(2), w(1). topV=3 keeps x,y,z.
    val docs = Seq(
      (1L, "x y"),
      (2L, "x y z"),
      (3L, "x z w"),
      (4L, "q")) // q outside topV; doc still counts toward N
      .toDF("doc_id", "text")
    val out = TextAnalysis.coocLift(docs, "doc_id", "text",
      topV = 3, minSupport = 1L)
      .orderBy("tok_a", "tok_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // N = 4 docs with tokens
    assert(out.toSeq === Seq(
      ("x", "y", 2L, 3L, 2L, (2.0 * 4.0) / (3.0 * 2.0)),
      ("x", "z", 2L, 3L, 2L, (2.0 * 4.0) / (3.0 * 2.0)),
      ("y", "z", 1L, 2L, 2L, (1.0 * 4.0) / (2.0 * 2.0))))
  }

  test("linearFit recovers a perfect line and guards degenerate groups") {
    val df = Seq(
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0), // y = 2x + 1
      ("b", 4.0, 9.0), ("b", 4.0, 1.0),                  // zero x-variance
      ("c", 1.0, 5.0), ("c", 2.0, 5.0))                  // zero y-variance
      .toDF("k", "x", "y")
    val out = Profile.linearFit(df, Seq("k"), "x", "y")
      .orderBy("k").collect()
    val a = out(0)
    assert(math.abs(a.getDouble(2) - 2.0) < 1e-12)
    assert(math.abs(a.getDouble(3) - 1.0) < 1e-12)
    assert(math.abs(a.getDouble(4) - 1.0) < 1e-12)
    assert(out(1).isNullAt(2) && out(1).isNullAt(3) && out(1).isNullAt(4))
    val c = out(2)
    assert(c.getDouble(2) === 0.0 && c.getDouble(3) === 5.0)
    assert(c.isNullAt(4)) // r2 undefined at zero y-variance
    intercept[IllegalArgumentException] {
      Profile.linearFit(df, Seq(), "x", "y")
    }
  }

  test("coocLift minSupport prunes and a doc never pairs a token with itself") {
    val docs = Seq((1L, "x x y"), (2L, "x y"), (3L, "y z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.coocLift(docs, "doc_id", "text",
      topV = 10, minSupport = 2L).collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq === Seq(("x", "y", 2L)))
  }

  test("coocLift: duplicate doc ids inflate neither df nor n_ab — " +
      "every count matches N's distinct-id convention") {
    val docs = Seq(
      (1L, "x y"),
      (2L, "x y z"),
      (3L, "x z w"),
      (4L, "q")).toDF("doc_id", "text")
    // the same corpus with doc 2 ingested three times and doc 3 twice
    val dup = docs.union(Seq((2L, "x y z"), (2L, "x y z"), (3L, "x z w"))
      .toDF("doc_id", "text"))
    val clean = TextAnalysis.coocLift(docs, "doc_id", "text",
      topV = 3, minSupport = 1L).orderBy("tok_a", "tok_b").collect()
    val dirty = TextAnalysis.coocLift(dup, "doc_id", "text",
      topV = 3, minSupport = 1L).orderBy("tok_a", "tok_b").collect()
    assert(dirty.toSeq === clean.toSeq)
  }
}
