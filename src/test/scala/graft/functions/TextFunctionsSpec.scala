package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def one[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(1).toDF("x").select(c).head.get(0).asInstanceOf[T]
  }

  test("tokens and token_count handle spacing and empties") {
    import spark.implicits._
    val df = Seq("a  b\tc", "", "  ", "single").toDF("t")
      .select(token_count(col("t")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 0, 0, 1))
  }

  test("shingles produce w-grams; short docs give empty array") {
    import spark.implicits._
    val res = Seq("a b c d").toDF("t")
      .select(shingles(col("t"), 2)).head.getSeq[String](0)
    assert(res == Seq("a b", "b c", "c d"))
    val short = Seq("a").toDF("t")
      .select(shingles(col("t"), 3)).head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("jaccard on shingle sets") {
    import spark.implicits._
    val df = Seq(("a b c d", "a b c e")).toDF("x", "y")
      .select(jaccard(shingles(col("x"), 2), shingles(col("y"), 2)).as("j"))
    // shingles: {a b, b c, c d} vs {a b, b c, c e}: |∩|=2 |∪|=4
    assert(df.head.getDouble(0) == 0.5)
  }

  test("simhash64: identical text same hash, edit stays near") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox leaps over the lazy dog").toDF("t")
      .select(simhash64(col("t")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(java.lang.Long.bitCount(hs(0) ^ hs(2)) <= 16)
  }

  test("fingerprints: deterministic, shared for overlapping docs") {
    import spark.implicits._
    val a = "spark catalyst optimizer rewrites logical plans before execution begins"
    val b = "spark catalyst optimizer rewrites logical plans before execution ends today"
    val df = Seq(a, a, b).toDF("t").select(fingerprints(col("t")).as("f"))
    val fs = df.collect().map(_.getSeq[Long](0))
    assert(fs(0) == fs(1))
    assert(fs(0).toSet.intersect(fs(2).toSet).nonEmpty)
    // short text falls back to whole-text hash
    val short = Seq("hi").toDF("t").select(fingerprints(col("t"))).head.getSeq[Long](0)
    assert(short.length == 1)
  }

  test("BPE-ish token count: contractions and runs split") {
    import spark.implicits._
    val df = Seq("it's 2026, friend!", "hello world").toDF("t")
      .select(token_count_bpe(col("t")).as("n"))
    // "it" "'s" " 2026" "," " friend" "!" → 6; "hello" " world" → 2
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(6, 2))
  }

  test("lang_id guesses common languages") {
    import spark.implicits._
    val samples = Seq(
      "the cat is on the mat and it is happy" -> "en",
      "der Hund ist nicht zu Hause und ich bin mit dir" -> "de",
      "le chat est dans la maison et je ne sais pas" -> "fr",
      "el perro es grande y no come con los gatos" -> "es",
      "这是一个中文句子用来测试语言识别功能" -> "zh",
      "zzz qqq xxx" -> "und")
    val out = samples.map(_._1).toDF("t")
      .select(lang_id(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq == samples.map(_._2))
  }

  test("qualityFeatures: sane ranges and ordering") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs to the forest for a while"
    val bad = "!!! ??? ..- ,,,"
    val df = Seq(good, bad).toDF("t")
      .select(qualityFeatures(col("t")).as("q"))
    val rows = df.select("q.n_tokens", "q.quality_score", "q.alpha_ratio",
      "q.punct_ratio").collect()
    assert(rows(0).getDouble(1) > rows(1).getDouble(1))
    assert(rows(0).getDouble(2) > 0.7)
    assert(rows(1).getDouble(3) > 0.5)
  }

  test("gopherRules: each rule trips on its designed offender") {
    import spark.implicits._
    val stopPad = "the cat must be going to one of all and that they have " +
      "fun with it "
    val good = (stopPad * 5).trim // 60 words, normal lengths, stopwords
    val short = "only four words here"                      // rule 1
    val symbols = ("ok " * 60) + ("#" * 20)                 // rule 3
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n") // rules 1,4
    val numeric = (1 to 60).map(_.toString).mkString(" ")   // rule 6
    val noStops = ("red green blue " * 20).trim             // rule 7
    val df = Seq((1L, good), (2L, short), (3L, symbols), (4L, bullets),
      (5L, numeric), (6L, noStops)).toDF("id", "t")
      .select(col("id"), gopherRules(col("t")).as("g"))
      .select(col("id"), col("g.*")).orderBy("id").collect()
    val byId = df.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Int]("keep") == 1)
    assert(byId(1L).getAs[Long]("n_words") == 80L)
    assert(byId(1L).getAs[Long]("n_stop_distinct") >= 6L)
    assert(byId(2L).getAs[Int]("keep") == 0) // word count
    assert(byId(3L).getAs[Int]("keep") == 0) // symbol ratio
    assert(byId(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(byId(4L).getAs[Double]("bullet_line_ratio") == 1.0)
    assert(byId(5L).getAs[Int]("keep") == 0) // alpha words
    assert(byId(5L).getAs[Double]("alpha_word_ratio") == 0.0)
    assert(byId(6L).getAs[Int]("keep") == 0) // stop words
    assert(byId(6L).getAs[Long]("n_stop_distinct") == 0L)
  }

  test("gopherRules alpha-word rule accepts non-ASCII letters") {
    import spark.implicits._
    val stops = "the be to of and that have with "
    // 50+ words, all containing letters — but accented/Cyrillic, not
    // just ASCII [a-z]; Gopher's rule is "contains an alphabetic
    // character", not "contains an English letter"
    val accented = (stops + "café naïve résumé über señor niño ") * 5
    val cyrillic = (stops + "привет мир хорошо день свет слово ") * 5
    val rows = Seq((1L, accented.trim), (2L, cyrillic.trim))
      .toDF("id", "t")
      .select(col("id"), gopherRules(col("t")).as("g"))
      .select(col("id"), col("g.alpha_word_ratio"), col("g.keep"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == 1.0,
        s"id ${r.getLong(0)}: alpha ratio ${r.getDouble(1)}")
      assert(r.getInt(2) == 1, s"id ${r.getLong(0)} rejected")
    }
  }

  test("char_bigram_lm rejects a non-finite unseen floor at " +
      "construction (codegen literal safety)") {
    val m = new java.util.HashMap[String, java.lang.Double]()
    m.put("ab", -1.0)
    intercept[IllegalArgumentException] {
      CharBigramLmScore(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc")),
        m, Double.NegativeInfinity)
    }
  }

  test("readability: exact counts and hand-computed Flesch scores; " +
      "wordless text yields null scores; no terminal punctuation " +
      "reads as one sentence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "headline without punctuation"),
      (3L, "")).toDF("id", "text")
    val out = df.select(col("id"),
        TextFunctions.readability(col("text")).as("r"))
      .select(col("id"), col("r.*")).orderBy("id").collect()
    val r1 = out(0)
    // 6 words, 2 sentences; syllables: the(1) cat(1) sat(1) the(1)
    // dog(1) ran(1) = 6 vowel groups
    assert(r1.getLong(1) === 6L && r1.getLong(2) === 2L &&
      r1.getLong(3) === 6L)
    val wps = 6.0 / 2.0; val spw = 6.0 / 6.0
    assert(math.abs(r1.getDouble(4) -
      (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-6)
    assert(math.abs(r1.getDouble(5) -
      (0.39 * wps + 11.8 * spw - 15.59)) < 1e-6)
    val r2 = out(1)
    assert(r2.getLong(2) === 1L, "no [.!?] → one sentence")
    val r3 = out(2)
    assert(r3.getLong(1) === 0L && r3.isNullAt(4) && r3.isNullAt(5))
  }

  test("SQL registration with arity validation") {
    TextFunctions.registerAll(spark)
    assert(spark.sql("SELECT lang_id('the cat is on the mat')")
      .head.getString(0) == "en")
    assert(spark.sql("SELECT simhash64('a b c')").head.getLong(0) ==
      spark.sql("SELECT simhash64('a b c')").head.getLong(0))
    val err = intercept[Exception] {
      spark.sql("SELECT lang_id('a', 'b')").head
    }
    assert(err.getMessage.contains("1 argument"))
  }
}
