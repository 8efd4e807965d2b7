package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning column transforms for training-data pipelines
  * (builder brief: quality/cleaning ops beyond the reference). All are
  * compositions of codegen'd built-ins (`regexp_replace`/`trim`) — no
  * UDFs, so they inline into whole-stage codegen and cost one pass
  * over the string each. Patterns are RE2-compatible (portable to the
  * DuckDB oracle verbatim).
  */
object TextClean {

  /** Replace HTML/XML tags with a space (space, not empty, so
    * `foo<br>bar` keeps a token boundary). */
  def stripHtml(c: Column): Column =
    regexp_replace(c, "<[^>]*>", " ")

  /** Collapse all whitespace runs to single spaces and trim. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** PII patterns, shared by the redactors, [[piiStats]] and the
    * DuckDB oracle (RE2-safe: no lookarounds, ASCII `\b` only). The
    * phone pattern is deliberately blunt (digit run with separators,
    * ≥ 8 chars) — the C4/CCNet convention: over-redact rather than
    * leak. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val IpPattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9()\\-. ]{6,}[0-9]"

  /** Redact email addresses (PII scrub for crawl corpora). */
  def redactEmails(c: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(c, EmailPattern, token)

  /** Redact http(s) URLs. */
  def redactUrls(c: Column, token: String = "<URL>"): Column =
    regexp_replace(c, UrlPattern, token)

  /** Redact IPv4 addresses. */
  def redactIps(c: Column, token: String = "<IP>"): Column =
    regexp_replace(c, IpPattern, token)

  /** Redact phone-like digit runs. */
  def redactPhones(c: Column, token: String = "<PHONE>"): Column =
    regexp_replace(c, PhonePattern, token)

  /** Full PII scrub. Order matters: emails before phones (digit-heavy
    * local parts), IPs before phones (a dotted quad also matches the
    * blunt phone run). */
  def scrubPii(c: Column): Column =
    redactPhones(redactIps(redactUrls(redactEmails(c))))

  /** PII survey: per-category match counts plus the scrubbed length —
    * the audit side of [[scrubPii]] (run it BEFORE scrubbing to size
    * the exposure). All codegen'd built-ins, one struct. */
  def piiStats(c: Column): Column = struct(
    size(regexp_extract_all(c, lit(EmailPattern), lit(0)))
      .cast("long").as("n_emails"),
    size(regexp_extract_all(c, lit(UrlPattern), lit(0)))
      .cast("long").as("n_urls"),
    size(regexp_extract_all(c, lit(IpPattern), lit(0)))
      .cast("long").as("n_ips"),
    size(regexp_extract_all(c, lit(PhonePattern), lit(0)))
      .cast("long").as("n_phones"),
    length(scrubPii(c)).cast("long").as("clean_len"))

  /** Drop ASCII control characters (keep \t\n via the prior whitespace
    * collapse — this runs on raw text, so strip everything below 0x20
    * except tab/newline/carriage-return). */
  def stripControlChars(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")

  /** Canonical Unicode hygiene: NFC-normalize so every grapheme has
    * ONE byte form (hash dedup/fingerprints would otherwise see "é"
    * and "e+◌́" as different documents), then strip accents. Both are
    * codegen'd kernel expressions (java.text.Normalizer inside). */
  def normalizeUnicode(c: Column): Column =
    graft.functions.TextFunctions.strip_accents(
      graft.functions.TextFunctions.nfc_normalize(c))

  /** Full pipeline: control chars → tags → redactions → whitespace.
    * Order matters: whitespace collapse runs LAST so every earlier
    * step may emit spaces freely. */
  def clean(c: Column): Column =
    normalizeWhitespace(redactUrls(redactEmails(stripHtml(stripControlChars(c)))))

  /** The 32 C1 control codepoints U+0080–U+009F as one literal regex
    * character class — a C1 char in decoded text is the classic
    * cp1252-bytes-read-as-latin1 tell (every smart quote / dash in
    * cp1252 lands there). Literal chars, not an escape range, so the
    * identical class string runs under both Java regex and RE2
    * (DuckDB) without dialect-specific `\x{..}` syntax. */
  private[operators] val C1Class: String =
    "[" + (0x80 to 0x9F).map(_.toChar).mkString + "]"

  /** Common UTF-8-decoded-as-latin1/cp1252 digraph sequences ("é" →
    * "Ã©", "’" → "â€™", "°" → "Â°", …): a FIXED documented alternation
    * of literal sequences — deliberately a closed list so the count
    * replays in any regex engine; production deployments extend it.
    * Covers the accented-latin vowels/consonants (Ã + continuation),
    * the punctuation family (â€ + continuation), and the Â-prefixed
    * symbol family (NBSP/degree/currency/copyright). */
  private[operators] val MojibakePattern: String =
    "Ã©|Ã¨|Ã¡|Ã³|Ãº|Ã±|Ã§|Ã¤|Ã¶|Ã¼|Ã£|Ãª|Ã®|Ã´|Ã»|" +
      "â€™|â€˜|â€œ|â€|â€“|â€”|â€¦|Â°|Â£|Â©|Â®|Â "

  /** cp1252 mapping for the C1 range 0x80–0x9F (what a lenient
    * decoder shows when cp1252 bytes are read as latin1): defined
    * slots map to their cp1252 character, the five undefined slots
    * (0x81 8D 8F 90 9D) stay as their C1 codepoint. */
  private val Cp1252C1: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ',
    0x84 -> '„', 0x85 -> '…', 0x86 -> '†',
    0x87 -> '‡', 0x88 -> 'ˆ', 0x89 -> '‰',
    0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’',
    0x93 -> '“', 0x94 -> '”', 0x95 -> '•',
    0x96 -> '–', 0x97 -> '—', 0x98 -> '˜',
    0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  /** The mojibake rendering of `c`: its UTF-8 bytes re-decoded as
    * cp1252-with-latin1-fallback — EXACTLY how the damage appears, so
    * the repair map below is derived, not hand-typed (it cannot drift
    * from the encoding tables). */
  private def mojibakeOf(c: Char): String =
    c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map { b =>
        val i = b & 0xFF
        Cp1252C1.getOrElse(i, i.toChar)
      }.mkString

  /** The characters [[repairMojibake]] restores — the same closed
    * family the detector flags: accented latin vowels/consonants,
    * the cp1252 punctuation block, and the Â-prefixed symbols. */
  private val RepairTargets: Seq[Char] =
    "éèáóúñçäöüãêîôû’‘“”–—…°£©® ".toSeq

  /** ftfy-style mojibake REPAIR — the fixing companion of
    * [[encodingDamage]] (detect first, repair what is confidently
    * mappable): (1) each double-decoded digraph from the derived
    * repair map collapses back to its true character (longest
    * sequences first so "â€™" wins over any 2-char prefix);
    * (2) remaining raw C1 controls translate through the cp1252
    * table (a lone U+0092 was almost surely a cp1252 ’). U+FFFD is
    * NOT touched — the original bytes are gone; it stays as the
    * honest tombstone. Chained codegen'd regexp_replace + one
    * translate, zero shuffles, null-in/null-out. */
  def repairMojibake(c: Column): Column = {
    val repairs = RepairTargets.map(t => mojibakeOf(t) -> t.toString)
      .sortBy(-_._1.length)
    val afterDigraphs = repairs.foldLeft(c) { case (acc, (bad, good)) =>
      regexp_replace(acc,
        java.util.regex.Pattern.quote(bad),
        java.util.regex.Matcher.quoteReplacement(good))
    }
    val from = Cp1252C1.keys.toSeq.sorted.map(_.toChar).mkString
    val to = Cp1252C1.keys.toSeq.sorted.map(Cp1252C1).mkString
    translate(afterDigraphs, from, to)
  }

  /** Encoding-damage audit: per-document counts of the three classic
    * mojibake signals — U+FFFD replacement characters (a decoder
    * already gave up), raw C1 controls ([[C1Class]]), and
    * double-decoded UTF-8 digraphs ([[MojibakePattern]]) — plus the
    * boolean gate. The hygiene read that runs BEFORE any language-ID
    * or quality scoring: damaged text degrades every downstream
    * statistic, and at crawl scale a few percent of documents carry
    * it. One narrow codegen'd projection (regexp_extract_all +
    * length), zero shuffles; every count replays in ANSI-ish SQL.
    * Null text → null counts (null-in/null-out like the other text
    * kernels). */
  def encodingDamage(c: Column): Column = struct(
    (length(c) - length(regexp_replace(c, "�", "")))
      .cast("long").as("n_replacement"),
    size(regexp_extract_all(c, lit(C1Class), lit(0)))
      .cast("long").as("n_c1"),
    size(regexp_extract_all(c, lit(MojibakePattern), lit(0)))
      .cast("long").as("n_mojibake"))
}
