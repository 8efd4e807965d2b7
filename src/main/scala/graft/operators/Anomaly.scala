package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Event-time anomaly detection — per-key rolling z-scores over a
  * trailing event-time window ("is this metric reading unusual for
  * THIS user/device/domain given its recent history"), the standard
  * first-line telemetry monitor.
  *
  * For each row, the trailing frame
  * `[ts − windowNanos, ts]` (RANGE, value-based — simultaneous events
  * all participate, no tiebreak sensitivity) over the SAME key yields
  * count/sum/sum-of-squares; z = (v − mean)/√variance when the window
  * has `minCount` points and positive variance, else null.
  *
  * Scale shape: one key-partitioned window — keys parallelize across
  * the cluster, frames slide incrementally (O(rows-per-key)), no
  * global sort, no self-join (the naive formulation is a range
  * self-join that rescans the window per row).
  *
  * Determinism (oracle parity): values quantize to decimal(18,6) at
  * ingest, window sums are exact decimal adds (order-free), and
  * mean/variance/z form one fixed double expression over
  * varchar-bridged exact inputs — bit-identical in any engine. Rows
  * with a null value are dropped (they have no place on a z scale and
  * null ordering diverges across engines).
  */
object Anomaly {

  /** Append `n_window`, `z` (nullable), `is_anomaly` to `df`. `tsCol`
    * must be integral event time (epoch nanos — the engine's event
    * time convention, [[graft.functions.TimeFunctions.epochNanos]]);
    * `windowNanos` the trailing horizon; `minCount` the minimum
    * points before scoring; `threshold` the |z| alarm bar. */
  def rollingZScore(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, windowNanos: Long, minCount: Int = 5,
      threshold: Double = 3.0): DataFrame = {
    require(keyCols.nonEmpty, "key columns required (a global window " +
      "would put every row in one task — partition by key)")
    require(windowNanos > 0, "windowNanos must be positive")
    require(minCount >= 2, "minCount must be at least 2")
    val reserved = Seq("__v6", "__n", "__s", "__q", "n_window", "z",
      "is_anomaly")
    require(reserved.forall(r => !df.columns.contains(r)),
      s"reserved columns $reserved present — rename them")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol))
      .rangeBetween(-windowNanos, 0)
    val base = df.where(col(valCol).isNotNull)
      .withColumn("__v6", col(valCol).cast("decimal(18,6)"))
      .withColumn("__n", count(lit(1)).over(w).cast("long"))
      .withColumn("__s", sum(col("__v6")).over(w))
      .withColumn("__q",
        sum((col("__v6") * col("__v6")).cast("decimal(30,12)")).over(w))
    val vD = col("__v6").cast("string").cast("double")
    val sD = col("__s").cast("string").cast("double")
    val qD = col("__q").cast("string").cast("double")
    val mean = sD / col("__n")
    val variance = qD / col("__n") - mean * mean
    base
      .withColumn("z", when(col("__n") >= minCount && variance > lit(0.0),
        (vD - mean) / sqrt(variance)))
      .withColumn("n_window", col("__n"))
      .withColumn("is_anomaly",
        col("z").isNotNull && abs(col("z")) > threshold)
      .drop("__v6", "__n", "__s", "__q")
  }

  /** CUSUM change-point curve over a bucketed count series: for each
    * bucket t (rank order, 1-based), the cumulative count S_t and the
    * INTEGER-scaled deviation `dev = n·S_t − t·T` (n = #buckets, T =
    * total) — the classic "where did the rate shift" statistic with
    * the 1/n·1/T divisions cleared, so every value is an exact long
    * and any engine replays it bit-for-bit. The |dev| argmax is the
    * change-point candidate; a flat series stays near 0.
    *
    * Scale shape: one count aggregate per bucket, then the cumulative
    * rollup runs on the ≤ |buckets|-row summary via a broadcast
    * inequality self-join (bounded by construction — bucket count is
    * calendar-sized, not corpus-sized). Returns
    * (bucket, n_events, t, cum_events, dev) ordered by bucket. */
  def cusumCurve(df: DataFrame, bucketCol: String): DataFrame = {
    val counts = df.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("n_events"))
    val totals = broadcast(counts.agg(
      count(lit(1)).as("__n"), sum("n_events").as("__t")))
    counts.as("x")
      .join(broadcast(counts.as("y")),
        col("y.bucket") <= col("x.bucket"))
      .groupBy(col("x.bucket").as("bucket"),
        col("x.n_events").as("n_events"))
      .agg(count(lit(1)).as("t"),
        sum(col("y.n_events")).cast("long").as("cum_events"))
      .crossJoin(totals)
      .withColumn("dev",
        col("__n") * col("cum_events") - col("t") * col("__t"))
      .drop("__n", "__t")
  }
}
