package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation (binary relevance): recall@k, MRR,
  * AP@k, nDCG@k per query — the measurement half of a retrieval stack
  * (BM25 / ANN / hybrid all produce the (query, doc, rank) shape this
  * consumes; TREC eval semantics).
  *
  * Determinism is engineered for the cross-engine oracle:
  *  - ratios of exact integers (recall, MRR, precision@rank) are single
  *    correctly-rounded double divisions — bit-stable across engines;
  *  - log-derived DCG gains are rounded to decimal(18,9) BEFORE the
  *    order-free decimal sum (the BM25/RRF pattern), so accumulation
  *    order cannot wiggle the result;
  *  - IDCG is the same rounded-gain prefix sum at `min(n_rel, k)`,
  *    embedded as a literal lookup array (k entries, driver-tiny).
  *
  * Scale shape: one equi-join of results@k against the (deduped) truth
  * pairs, one rank window bounded at k rows per query, partial-agg
  * rollup per query. Nothing is row-proportional on the driver.
  */
object RetrievalEval {

  /** Per-query metrics over `results` (queryCol, docCol, rankCol; rank
    * 1-based within each query) against `truth` (queryCol, docCol)
    * relevant pairs. The evaluated universe is the distinct queries of
    * `results`; queries with no relevant docs score 0 on every metric
    * (n_rel = 0). Output: (queryCol, n_rel, hits, recall, mrr, ap,
    * ndcg). */
  def perQuery(results: DataFrame, truth: DataFrame, queryCol: String,
      docCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    for (reserved <- Seq("n_rel", "hits", "recall", "mrr", "ap", "ndcg",
        "__rank", "__hit_idx", "__prec", "__gain", "__minrank"))
      require(queryCol != reserved && docCol != reserved && rankCol != reserved,
        s"column name '$reserved' is reserved by RetrievalEval — alias it")
    val r = results
      .select(col(queryCol), col(docCol), col(rankCol).cast("long").as("__rank"))
      .where(col("__rank") <= k)
    val t = truth.select(col(queryCol), col(docCol)).distinct()
    val nrel = t.groupBy(queryCol)
      .agg(count(lit(1)).as("n_rel"))
    // rounded DCG gain per possible rank, and its prefix sums for IDCG
    val gains = (1 to k).map(r =>
      BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP))
    val idcgPrefix = gains.scanLeft(BigDecimal(0))(_ + _).tail
      .map(_.toDouble)
    val w = Window.partitionBy(queryCol).orderBy(col("__rank"))
    val hits = r.join(t, Seq(queryCol, docCol))
      .withColumn("__hit_idx", row_number().over(w))
      .withColumn("__prec",
        round(col("__hit_idx").cast("double") / col("__rank"), 9)
          .cast("decimal(18,9)"))
      .withColumn("__gain",
        element_at(typedlit(gains.map(_.toDouble)), col("__rank").cast("int"))
          .cast("decimal(18,9)"))
      .groupBy(queryCol)
      .agg(count(lit(1)).as("hits"),
        min(col("__rank")).as("__minrank"),
        sum(col("__prec")).as("__sum_prec"),
        // decimal→double via the VARCHAR bridge: a direct cast differs
        // from DuckDB's by 1 ulp on some sums (the repo-wide convention,
        // see Bm25's scaladoc); the oracle twin casts through VARCHAR
        sum(col("__gain")).cast("string").cast("double").as("__dcg"))
    results.select(col(queryCol)).distinct()
      .join(nrel, Seq(queryCol), "left")
      .join(hits, Seq(queryCol), "left")
      .na.fill(0L, Seq("n_rel", "hits"))
      .withColumn("recall",
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(coalesce(col("hits"), lit(0L)).cast("double")
            / col("n_rel")))
      .withColumn("mrr",
        coalesce(lit(1.0) / col("__minrank"), lit(0.0)))
      .withColumn("ap",
        when(col("n_rel") === 0 || col("__sum_prec").isNull, lit(0.0))
          .otherwise(col("__sum_prec").cast("string").cast("double")
            / least(col("n_rel"), lit(k.toLong))))
      .withColumn("ndcg",
        when(col("n_rel") === 0 || col("__dcg").isNull, lit(0.0))
          .otherwise(col("__dcg") /
            element_at(typedlit(idcgPrefix),
              least(col("n_rel"), lit(k.toLong)).cast("int"))))
      .select(col(queryCol), col("n_rel"), col("hits"), col("recall"),
        col("mrr"), col("ap"), col("ndcg"))
  }
}
