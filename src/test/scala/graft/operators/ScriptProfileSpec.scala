package graft.operators

import graft.SparkSpec

class ScriptProfileSpec extends SparkSpec {
  import spark.implicits._

  private def profile(rows: Seq[(Long, String)], minSharePct: Int = 10) =
    ScriptProfile.profile(rows.toDF("doc_id", "text"), "doc_id", "text",
      minSharePct)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("pure-script documents: exact counts, dominant named, not mixed") {
    val out = profile(Seq(
      (1L, "Hello world"),          // 10 latin letters
      (2L, "Привет мир"),           // 9 cyrillic
      (3L, "日本語のテキスト"),        // 8 cjk (kanji + kana)
      (4L, "1234 ... !!")))         // no profiled script chars
    assert(out(1L).getAs[Long]("n_latin") == 10L)
    assert(out(1L).getAs[String]("dominant_script") == "latin")
    assert(!out(1L).getAs[Boolean]("mixed_script"))
    assert(out(2L).getAs[Long]("n_cyrillic") == 9L)
    assert(out(2L).getAs[String]("dominant_script") == "cyrillic")
    assert(out(3L).getAs[Long]("n_cjk") == 8L)
    assert(out(3L).getAs[String]("dominant_script") == "cjk")
    assert(out(4L).getAs[Long]("n_script_chars") == 0L)
    assert(out(4L).getAs[String]("dominant_script") == "none")
    assert(out(4L).getAs[Long]("n_scripts") == 0L)
    assert(!out(4L).getAs[Boolean]("mixed_script"))
  }

  test("homoglyph spoof: Cyrillic 'а'/'е' inside Latin words trips " +
      "the mixed flag a lowercase cleaner would never see") {
    // "pаypаl sеcurе login" with Cyrillic а (U+0430) and е (U+0435)
    val spoof = "pаypаl sеcurе login"
    val out = profile(Seq((1L, spoof)))
    assert(out(1L).getAs[Long]("n_cyrillic") == 4L)
    assert(out(1L).getAs[Long]("n_latin") == 13L)
    assert(out(1L).getAs[String]("dominant_script") == "latin")
    assert(out(1L).getAs[Boolean]("mixed_script"),
      "4/17 cyrillic ≥ 10% must flag mixed")
  }

  test("minSharePct boundary is an exact integer compare: a script at " +
      "exactly the threshold qualifies, below it does not") {
    // 1 cyrillic char among 10 total = exactly 10%
    val at = profile(Seq((1L, "abcdefghiа")))     // 9 latin + 1 cyr
    assert(at(1L).getAs[Long]("n_scripts") == 2L)
    assert(at(1L).getAs[Boolean]("mixed_script"))
    // 1 among 11 total < 10% → latin only
    val below = profile(Seq((1L, "abcdefghijа")))
    assert(below(1L).getAs[Long]("n_scripts") == 1L)
    assert(!below(1L).getAs[Boolean]("mixed_script"))
  }

  test("dominance ties resolve by priority order (latin first)") {
    val out = profile(Seq((1L, "abаб"))) // 2 latin, 2 cyrillic
    assert(out(1L).getAs[Long]("n_latin") == 2L)
    assert(out(1L).getAs[Long]("n_cyrillic") == 2L)
    assert(out(1L).getAs[String]("dominant_script") == "latin")
  }

  test("hangul, greek, arabic, hebrew, devanagari ranges count") {
    val out = profile(Seq(
      (1L, "한국어"),          // 한국어
      (2L, "αβγ"),          // αβγ
      (3L, "مرحبا"), // مرحبا
      (4L, "שלום"),    // שלום
      (5L, "हिन्दी"))) // हिन्दी
    assert(out(1L).getAs[String]("dominant_script") == "hangul")
    assert(out(2L).getAs[String]("dominant_script") == "greek")
    assert(out(3L).getAs[String]("dominant_script") == "arabic")
    assert(out(4L).getAs[String]("dominant_script") == "hebrew")
    assert(out(5L).getAs[String]("dominant_script") == "devanagari")
    assert(out(5L).getAs[Long]("n_devanagari") == 6L)
  }

  test("emoji / astral chars are outside every class and do not " +
      "disturb the counts") {
    val out = profile(Seq((1L, "hi 😀 ok")))
    assert(out(1L).getAs[Long]("n_latin") == 4L)
    assert(out(1L).getAs[Long]("n_script_chars") == 4L)
  }

  test("minSharePct out of range raises") {
    intercept[IllegalArgumentException] {
      profile(Seq((1L, "x")), minSharePct = 0)
    }
    intercept[IllegalArgumentException] {
      profile(Seq((1L, "x")), minSharePct = 101)
    }
  }
}
