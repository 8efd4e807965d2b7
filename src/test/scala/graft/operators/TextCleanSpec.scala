package graft.operators

import graft.SparkSpec

class TextCleanSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def cleanOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextClean.clean(col("t"))).head.getString(0)
  }

  test("strips tags, keeps token boundaries") {
    assert(cleanOne("foo<br>bar <b>baz</b>") == "foo bar baz")
  }

  test("redacts emails and urls") {
    assert(cleanOne("mail a.b+c@ex-ample.co.uk now") == "mail <EMAIL> now")
    assert(cleanOne("see https://ex.com/x?q=1&y=2 and http://a.io") ==
      "see <URL> and <URL>")
  }

  test("collapses whitespace and drops control chars") {
    assert(cleanOne("a\u0000b\t c\n\n  d\u0007") == "ab c d")
  }

  test("normalizeUnicode: NFC-composes combining marks, strips accents") {
    import spark.implicits._
    def norm(s: String): String =
      Seq(s).toDF("t").select(TextClean.normalizeUnicode(col("t")))
        .head.getString(0)
    // decomposed e + combining acute and precomposed é both → plain e
    assert(norm("café") == "cafe")
    assert(norm("café") == "cafe")
    // NFC alone must unify the two byte forms (dedup-hash stability)
    def nfc(s: String): String =
      Seq(s).toDF("t")
        .select(graft.functions.TextFunctions.nfc_normalize(col("t")))
        .head.getString(0)
    assert(nfc("café") == nfc("café"))
    // umlauts, tildes, cedillas
    assert(norm("über señor façade") == "uber senor facade")
    // non-accent text untouched
    assert(norm("plain ascii 123") == "plain ascii 123")
    // supplementary-plane combining mark (Adlam U+1E944, category Mn):
    // code-point iteration must strip it — surrogate halves never
    // classify as Mn
    val astralMark = new String(Character.toChars(0x1E944))
    assert(Character.getType(0x1E944) == Character.NON_SPACING_MARK)
    assert(norm("x" + astralMark + "y") == "xy")
  }

  test("scrubPii redacts emails, urls, IPs and phone runs; piiStats " +
      "counts them") {
    import spark.implicits._
    val t = "mail bob.smith+x@example.co.uk or visit https://ex.com/a?b=1 " +
      "from 192.168.0.1 or call +1 (415) 555-0132 now"
    val clean = Seq(t).toDF("t")
      .select(TextClean.scrubPii(col("t")).as("c")).head.getString(0)
    assert(clean == "mail <EMAIL> or visit <URL> from <IP> or call " +
      "<PHONE> now", clean)
    val s = Seq(t).toDF("t")
      .select(TextClean.piiStats(col("t")).as("s")).select("s.*").head
    assert(s.getAs[Long]("n_emails") == 1L)
    assert(s.getAs[Long]("n_urls") == 1L)
    assert(s.getAs[Long]("n_ips") == 1L)
    assert(s.getAs[Long]("n_phones") >= 1L)
    assert(s.getAs[Long]("clean_len") == clean.length.toLong)
    // clean text stays clean: scrub is idempotent
    val again = Seq(clean).toDF("t")
      .select(TextClean.scrubPii(col("t")).as("c")).head.getString(0)
    assert(again == clean)
  }

  test("null and empty pass through") {
    import spark.implicits._
    val out = Seq(Some(""), Option.empty[String]).toDF("t")
      .select(TextClean.clean(col("t")).as("c")).collect()
    assert(out(0).getString(0) == "")
    assert(out(1).isNullAt(0))
  }

  test("encodingDamage counts replacement chars, C1 controls, mojibake digraphs") {
    import spark.implicits._
    def dmg(s: String): (Long, Long, Long) = {
      val r = Seq(s).toDF("t")
        .select(TextClean.encodingDamage(col("t")).as("d"))
        .select("d.n_replacement", "d.n_c1", "d.n_mojibake")
        .head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(dmg("clean ascii text") === ((0L, 0L, 0L)))
    assert(dmg("bad � twice � here") === ((2L, 0L, 0L)))
    // cp1252 smart quote read as latin1 lands on C1 U+0092
    assert(dmg("its ok") === ((0L, 2L, 0L)))
    // "café" double-decoded + a smart quote + an NBSP symbol
    assert(dmg("cafÃ© naÃ¯ve?") === ((0L, 0L, 1L))) // Ã¯ not in the list
    assert(dmg("cafÃ© â€™ Â°") === ((0L, 0L, 3L)))
    // none of â € ™ Â ° are C1 codepoints
    // (U+00E2/20AC/2122/00C2/00B0) — only the n_mojibake digraph
    // counter sees them
  }

  test("encodingDamage is null-in/null-out per field") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("t")
      .select(TextClean.encodingDamage(col("t")).as("d"))
      .select("d.n_replacement").head
    assert(r.isNullAt(0))
  }

  test("repairMojibake restores digraphs and lone C1 chars; FFFD stays") {
    import spark.implicits._
    def fix(s: String): String =
      Seq(s).toDF("t").select(TextClean.repairMojibake(col("t")))
        .head.getString(0)
    assert(fix("cafÃ© â€™ Â°") === "café ’ °")
    // en-dash and ellipsis damage (â€ + cp1252-mapped continuation)
    assert(fix("a â€“ b â€¦") === "a – b …")
    // lone C1 chars translate through the cp1252 table
    assert(fix("its ok") === "it’s …ok")
    // the replacement char is an honest tombstone — untouched
    assert(fix("bad � char") === "bad � char")
    // clean text is a fixpoint; repaired text re-audits clean
    assert(fix("plain ascii") === "plain ascii")
    val audited = Seq("cafÃ© â€™ Â° its").toDF("t")
      .select(TextClean.encodingDamage(
        TextClean.repairMojibake(col("t"))).as("d"))
      .select("d.n_replacement", "d.n_c1", "d.n_mojibake").head
    assert((audited.getLong(0), audited.getLong(1),
      audited.getLong(2)) === ((0L, 0L, 0L)))
  }
}
