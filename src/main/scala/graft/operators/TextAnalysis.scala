package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level text statistics (SURVEY §7.1 step 7: tokenize / tf-idf
  * via relational ops). Row-level text features live in
  * [[graft.functions.TextFunctions]]; these operators aggregate across
  * the corpus.
  */
object TextAnalysis {

  /** Per-(doc, term) TF-IDF with smooth idf:
    * `tfidf = tf × (ln((N+1)/(df+1)) + 1)` (sklearn's smoothed
    * convention). Returns (idCol, token, tf, df, tfidf).
    *
    * Scale shape: explode → two hash aggregations (tf by (doc, token),
    * df by token — both partial-aggregated) → equi-join on token with
    * NO forced broadcast: at 100 TB the distinct-token table is far
    * beyond broadcast range, so the join is left to AQE, which picks a
    * broadcast join at runtime exactly when the df side is actually
    * small. `docCount` is the only driver-side scalar. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count()
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(idCol, "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("token"))
      .withColumn("tfidf",
        col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Corpus vocabulary with document frequencies, most common first. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      topN: Int = 1000): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("token")).limit(topN)
}
