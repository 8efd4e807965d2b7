package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode-script profiling: per-document counts of codepoints in the
  * major writing-system blocks, the dominant script, and a
  * mixed-script flag — the spam / homoglyph-spoofing signal (Cyrillic
  * 'а' inside Latin words survives every lowercase-and-trim cleaner;
  * a corpus slice that is 40% CJK under an `en` language tag is a
  * mislabel) and the routing signal for script-specific tokenizers.
  * Complements [[TextAnalysis]] lang-ID: scripts are exact codepoint
  * facts where lang-ID is a statistical guess, so this is the cheap
  * first-pass gate run before any model-based filter.
  *
  * Scale shape: one narrow codegen'd projection per document — eight
  * `regexp_replace` + `length` subtractions and integer CASE
  * arithmetic; zero shuffles, zero joins, zero UDFs. At 100 TB this
  * is scan-bound, exactly like the quality-scoring pass it rides
  * beside.
  *
  * Determinism contract: every class below is a BMP raw-codepoint
  * range (no `\p{...}` named properties — those drift across regex
  * engines and Unicode versions), so Java regex (Spark) and RE2
  * (DuckDB) agree character-for-character and the whole profile is
  * exact-integer oracle-checkable.
  */
object ScriptProfile {

  /** (script name, regex character class) in DOMINANCE PRIORITY order
    * — ties in the max count resolve to the earlier entry. Public so
    * oracle twins inline the identical class strings (lockstep by
    * construction). */
  val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u00FF\u0100-\u024F]",
    "cyrillic" -> "[\u0400-\u04FF]",
    "greek" -> "[\u0370-\u03FF]",
    "cjk" -> "[\u3040-\u309F\u30A0-\u30FF\u4E00-\u9FFF]",
    "arabic" -> "[\u0600-\u06FF]",
    "hebrew" -> "[\u0590-\u05FF]",
    "hangul" -> "[\u1100-\u11FF\uAC00-\uD7AF]",
    "devanagari" -> "[\u0900-\u097F]")

  private def cnt(textCol: Column, cls: String): Column =
    (length(textCol) - length(regexp_replace(textCol, cls, "")))
      .cast("long")

  /** Per-document script profile. Output: `idCol`, one `n_<script>`
    * count per entry of [[Scripts]], `n_script_chars` (their sum —
    * profiled scripts only, NOT all letters), `n_scripts` (scripts
    * holding ≥ `minSharePct`% of the profiled chars, all-integer
    * compare), `dominant_script` (max count, priority-order
    * tie-break, `'none'` when no profiled chars), and `mixed_script`
    * (≥ 2 qualifying scripts). */
  def profile(df: DataFrame, idCol: String, textCol: String,
      minSharePct: Int = 10): DataFrame = {
    require(minSharePct >= 1 && minSharePct <= 100,
      s"minSharePct must be in [1,100], got $minSharePct")
    val counts = Scripts.map { case (name, cls) =>
      name -> cnt(col(textCol), cls) }
    val withCounts = df.select(
      col(idCol) +: counts.map { case (n, c) => c.as(s"n_$n") }: _*)
    val total = counts.map { case (n, _) => col(s"n_$n") }
      .reduce(_ + _)
    val qualifies = Scripts.map { case (n, _) =>
      (col(s"n_$n") >= 1L) &&
        (col(s"n_$n") * 100L >= lit(minSharePct.toLong) *
          col("n_script_chars")) }
    val nScripts = qualifies
      .map(q => when(q, 1L).otherwise(0L)).reduce(_ + _)
    // dominant: first script in priority order whose count equals the
    // running max of all counts — an integer CASE chain both engines
    // evaluate identically
    val maxCnt = Scripts.map { case (n, _) => col(s"n_$n") }
      .reduce((a, b) => greatest(a, b))
    val dominant = Scripts.foldRight(lit("none")) { case ((n, _), rest) =>
      when(col(s"n_$n") > 0L && col(s"n_$n") === maxCnt, lit(n))
        .otherwise(rest) }
    // foldRight builds latin-first precedence: latin's WHEN is
    // outermost, so an n-way tie names the priority-earliest script
    withCounts
      .withColumn("n_script_chars", total)
      .withColumn("n_scripts", nScripts)
      .withColumn("dominant_script", dominant)
      .withColumn("mixed_script", nScripts >= 2L)
  }
}
