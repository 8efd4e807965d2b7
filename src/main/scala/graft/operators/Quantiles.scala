package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles with linear interpolation (type-7 /
  * numpy default: rank = (n−1)·p, q = (1−g)·x_lo + g·x_hi) — the
  * statistics layer of the pipeline (data-quality cutoffs, length
  * filters) computed EXACTLY and deterministically.
  *
  * Scale shape: one sort-shuffle of the values (rank window), a
  * partial-aggregated count, and two joins against a bounds frame of
  * size |keys|×|ps| (broadcast-small by construction). No
  * `collect_list` of group values, no driver-side sort — group size is
  * unbounded. Use Spark's `approx_percentile` instead when a t-digest
  * sketch is acceptable; this operator is for when the answer must be
  * exact (and cross-engine reproducible: the interpolation is one
  * fixed double expression).
  */
object Quantiles {

  /** Per-key exact quantiles of `valCol` at probabilities `ps`.
    * Returns (keyCols..., p, quantile), one row per key×p. Null values
    * are excluded (they have no rank). */
  def exact(df: DataFrame, keyCols: Seq[String], valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "probabilities must be in [0, 1]")
    // the internals and the (p, quantile) output columns are introduced
    // by name; a key with one of these names would be silently replaced
    // by withColumn and corrupt the joins
    for (reserved <- Seq("p", "quantile", "__v", "__n", "__rn", "__rank",
        "__lo", "__hi", "__g"))
      require(!keyCols.contains(reserved) && valCol != reserved,
        s"column name '$reserved' is reserved by Quantiles.exact — alias it")
    val keys = keyCols.map(col)
    val clean = df.filter(col(valCol).isNotNull)
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val ranked = clean
      .select(keys :+ col(valCol).cast("double").as("__v"): _*)
      .withColumn("__rn", row_number().over(w))
    val bounds = clean.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("__rank", (col("__n") - 1).cast("double") * col("p"))
      .withColumn("__lo", floor(col("__rank")).cast("long") + 1)
      .withColumn("__hi", least(ceil(col("__rank")).cast("long") + 1, col("__n")))
      .withColumn("__g", col("__rank") - floor(col("__rank")))
    val lo = ranked.select(
      keys :+ col("__rn").as("__lo") :+ col("__v").as("__vlo"): _*)
    val hi = ranked.select(
      keys :+ col("__rn").as("__hi") :+ col("__v").as("__vhi"): _*)
    bounds
      .join(lo, keyCols :+ "__lo")
      .join(hi, keyCols :+ "__hi")
      .select(keys :+ col("p") :+
        ((lit(1.0) - col("__g")) * col("__vlo") + col("__g") * col("__vhi"))
          .as("quantile"): _*)
  }
}
