package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.SqlGlue.{column, expression}

/** Column API for text analysis (LLM-pipeline operators: token
  * counting, quality scoring, language ID, fingerprinting). Everything
  * except the three kernel expressions is composed from built-in
  * codegen'd functions, so plans stay inside whole-stage codegen and
  * push down through Parquet scans.
  */
object TextFunctions {

  /** Lowercased whitespace tokens; empty string → empty array. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  def token_count(c: Column): Column = size(tokens(c))

  /** BPE-ish subword token pattern (GPT-2-style pretokenizer shape:
    * contractions, letter runs, digit runs, punctuation runs) — the
    * approximate LLM token counter of the builder brief. Constructs
    * used are portable between Java regex and RE2 (oracle parity). */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  def token_count_bpe(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenPattern), lit(0)))

  /** Word w-shingles ("a b", "b c", ...) from whitespace tokens —
    * native one-pass kernel (see TextOps.wordShingles perf note). */
  def shingles(c: Column, w: Int): Column =
    column(WordShingles(expression(c), w))

  /** Jaccard similarity of two arrays under set semantics. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  def simhash64(c: Column): Column = column(SimHash64(expression(c)))

  def fingerprints(c: Column, k: Int = 9, window: Int = 4): Column =
    column(Fingerprints(expression(c), k, window))

  def lang_id(c: Column): Column = column(LangId(expression(c)))

  /** Canonical Unicode NFC normalization (see [[NfcNormalize]]). */
  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))

  /** Accent stripping via NFD + mark removal (see [[StripAccents]]). */
  def strip_accents(c: Column): Column = column(StripAccents(expression(c)))

  /** Hamming distance between two 64-bit signatures (SimHash pairs). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Heuristic quality features for corpus filtering: returns a struct
    * of (n_tokens, avg_token_len, alpha_ratio, punct_ratio,
    * stopword_ratio, quality_score). All built-in expressions —
    * SQL-expressible for the oracle. */
  def qualityFeatures(c: Column): Column = {
    val toks = tokens(c)
    val nToks = size(toks)
    val nChars = length(c)
    val alpha = length(regexp_replace(c, "[^A-Za-z]", ""))
    val punct = length(regexp_replace(c, "[^.,;:!?]", ""))
    val stopwords = typedLit(Seq("the", "a", "and", "of", "to", "in", "is",
      "it", "that", "for"))
    val stopHits = size(array_intersect(toks, stopwords))
    val nTokD = nToks.cast("double")
    val avgLen = when(nToks === 0, 0.0)
      .otherwise(aggregate(toks, lit(0), (acc, t) => acc + length(t))
        .cast("double") / nTokD)
    val alphaRatio = when(nChars === 0, 0.0)
      .otherwise(alpha.cast("double") / nChars.cast("double"))
    val punctRatio = when(nChars === 0, 0.0)
      .otherwise(punct.cast("double") / nChars.cast("double"))
    val stopRatio = when(nToks === 0, 0.0)
      .otherwise(stopHits.cast("double") / nTokD)
    // crude composite in [0,1]: long-enough, alphabetic, some function
    // words, not punctuation-soup
    val score =
      least(nTokD / lit(20.0), lit(1.0)) * lit(0.4) +
        alphaRatio * lit(0.3) +
        least(stopRatio * lit(5.0), lit(1.0)) * lit(0.2) +
        (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.1)
    struct(
      nToks.as("n_tokens"), avgLen.as("avg_token_len"),
      alphaRatio.as("alpha_ratio"), punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"), score.as("quality_score"))
  }

  /** Register kernel functions for `spark.sql(...)` use. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String)(f: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => {
        require(es.length == 1, s"$name expects exactly 1 argument, got ${es.length}")
        f(es)
      }, "scala_udf")
    one("simhash64")(es => SimHash64(es.head))
    one("fingerprints")(es => Fingerprints(es.head))
    one("lang_id")(es => LangId(es.head))
    one("nfc_normalize")(es => NfcNormalize(es.head))
    one("strip_accents")(es => StripAccents(es.head))
  }
}
