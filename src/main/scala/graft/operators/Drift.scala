package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TextFunctions

/** Corpus drift / domain-divergence measurement — "how far is this
  * domain (or crawl slice, or day) from the corpus it feeds": KL
  * divergence of each group's unigram distribution from the whole
  * corpus's, the standard monitor for training-mix shift (a domain
  * whose KL jumps between snapshots changed its content mix).
  *
  *   KL(P_k ‖ Q) = Σ_t p_{k,t} · ln(p_{k,t} / q_t)
  *
  * with add-one smoothing on the group side (groups have zeros; the
  * corpus, whose vocabulary defines the support, does not):
  * p = (c + 1)/(n_k + V), q = c_t / N.
  *
  * Scale shape: ONE (key, token) count shuffle; the corpus table
  * re-aggregates from it narrowly; the evaluation grid is
  * vocab × keys — keys (domains/slices) are FEW by contract, so the
  * grid is a broadcast cross of the V-row corpus frame, never
  * corpus-sized. Totals ride a broadcast join of a keys-row frame.
  *
  * Determinism (oracle parity): p and q are correctly-rounded doubles
  * of exact integer ratios; each ln-derived term is rounded to
  * decimal(18,9) BEFORE the order-free decimal sum (the BM25/nDCG
  * pattern — STATUS "determinism lessons" #4).
  */
object Drift {

  /** Per-key unigram KL from the corpus distribution over `textCol`
    * tokens (whitespace tokens, [[TextFunctions.tokens]]). Returns
    * (keyCol, n_tokens, vocab_used, kl) — `n_tokens` the key's token
    * count, `vocab_used` its distinct tokens, `kl` in nats. Null keys
    * count as a group; null texts contribute nothing. */
  def unigramKl(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(keyCol).as("__k"),
      explode(TextFunctions.tokens(col(textCol))).as("__t"))
    val counts = toks.groupBy("__k", "__t")
      .agg(count(lit(1)).cast("long").as("__c"))
    // narrow re-aggregations of the one shuffled frame
    val corpus = counts.groupBy("__t")
      .agg(sum("__c").cast("long").as("__ct"))
    val keyTotals = counts.groupBy("__k")
      .agg(sum("__c").cast("long").as("__nk"),
        count(lit(1)).cast("long").as("__vk"))
    val scalars = corpus.agg(sum("__ct").cast("long").as("__n"),
      count(lit(1)).cast("long").as("__v"))
    // grid = vocab × keys (keys are few by contract) with the
    // corpus-wide scalars riding along. The counts join must be
    // NULL-SAFE on the key: a null key is a legitimate group
    // (groupBy made it one) and an equi-join would silently zero its
    // observed counts.
    val cnts = counts.select(col("__k").as("__ck"), col("__t").as("__ct2"),
      col("__c"))
    val grid = corpus.crossJoin(broadcast(keyTotals))
      .crossJoin(broadcast(scalars))
      .join(cnts,
        col("__k") <=> col("__ck") && col("__t") === col("__ct2"), "left")
      .drop("__ck", "__ct2")
      .na.fill(0L, Seq("__c"))
    val p = (col("__c") + lit(1L)).cast("double") /
      (col("__nk") + col("__v")).cast("double")
    val q = col("__ct").cast("double") / col("__n").cast("double")
    val term = round(p * log(p / q), 9).cast("decimal(18,9)")
    grid.withColumn("__term", term)
      .groupBy("__k")
      .agg(first("__nk").as("n_tokens"), first("__vk").as("vocab_used"),
        sum("__term").cast("string").cast("double").as("kl"))
      .withColumnRenamed("__k", keyCol)
  }
}
