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

  /** Redact email addresses (PII scrub for crawl corpora). */
  def redactEmails(c: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      token)

  /** Redact http(s) URLs. */
  def redactUrls(c: Column, token: String = "<URL>"): Column =
    regexp_replace(c, "https?://[^\\s]+", token)

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
}
