package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding (hopping) event-time windows over integer-nanos timestamps —
  * the batch twin of Structured Streaming's
  * `window($"ts", "2 hours", "1 hour")`, for backfilling the same
  * rolling aggregates a streaming job maintains (Spark's own
  * `TimeWindowing` rule does exactly this expansion for the built-in
  * `window()` on TimestampType; this operator is the nanos-long form —
  * normalize timestamp columns with
  * `graft.functions.TimeFunctions.epochNanos` at load).
  *
  * Each row is assigned to every window `[k·slide, k·slide + length)`
  * covering its timestamp — an explode by the constant overlap factor
  * `length / slide` (2 for the 2h/1h hop), NOT a range join: the
  * expansion is map-side, the shuffle happens once on the (window, key)
  * aggregate after partial aggregation, and window alignment is
  * epoch-anchored so every engine computing `floor(ts / slide)` agrees
  * on bucket identity.
  */
object TimeWindows {

  /** Explode each row into its covering sliding windows.
    * Adds `bucketCol` = k where the window is `[k·slide, k·slide+len)`
    * (so `k = win_start / slideNs`; multiply back for the timestamp).
    * Null timestamps are dropped — they belong to no window. */
  def slidingWindows(df: DataFrame, tsCol: String, lengthNs: Long,
      slideNs: Long, bucketCol: String = "win_bucket"): DataFrame = {
    require(lengthNs > 0 && slideNs > 0, "length and slide must be positive")
    require(lengthNs % slideNs == 0,
      s"window length $lengthNs must be a multiple of slide $slideNs " +
        "(epoch-aligned hop)")
    require(df.columns.forall(_ != bucketCol),
      s"column '$bucketCol' already exists")
    require(df.columns.forall(_ != "__tw_ts"), "column '__tw_ts' is reserved")
    // k ranges over (ts - length, ts] / slide: floor((ts-len)/slide)+1
    // .. floor(ts/slide). Integer arithmetic, NOT `/`: epoch nanos
    // exceed double's exact-integer range. `div` alone truncates toward
    // zero, which diverges from floor exactly when the numerator is
    // negative — true for the FIRST bound whenever 0 <= ts < length, so
    // epoch-adjacent events would miss their negative-start covering
    // windows (and Structured Streaming's window() twin uses floor).
    // floorDiv(x, s) = (x - pmod(x, s)) div s: pmod lands in [0, s), the
    // subtraction yields an exact multiple, and div of an exact multiple
    // is exact for either sign.
    def floorDiv(x: String): String =
      s"((($x) - pmod($x, ${slideNs}L)) div ${slideNs}L)"
    df.where(col(tsCol).isNotNull)
      .withColumn("__tw_ts", col(tsCol).cast("long"))
      .withColumn(bucketCol, explode(sequence(
        expr(s"${floorDiv(s"__tw_ts - ${lengthNs}L")} + 1L"),
        expr(floorDiv("__tw_ts")))))
      .drop("__tw_ts")
  }

  /** Rolling count/sum per (window, key): the common shape. Emits
    * (`bucketCol`, keys..., cnt, plus one `sum_<c>` per aggregated
    * column cast decimal(18,2)→double for cross-engine stability). */
  def slidingAgg(df: DataFrame, tsCol: String, keyCols: Seq[String],
      sumCols: Seq[String], lengthNs: Long, slideNs: Long,
      bucketCol: String = "win_bucket"): DataFrame = {
    val exploded = slidingWindows(df, tsCol, lengthNs, slideNs, bucketCol)
    val aggs = count(lit(1)).as("cnt") +:
      sumCols.map(c => sum(col(c).cast("decimal(18,2)")).cast("double")
        .as(s"sum_$c"))
    exploded.groupBy((bucketCol +: keyCols).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Time-series densification: tumbling-bucket counts per key with
    * the GAPS ZERO-FILLED — the dashboard/monitoring contract where a
    * missing hour must read 0, not vanish (aggregation alone emits
    * only observed buckets). Spine = the full
    * [min bucket, max bucket] range observed in the data (one
    * broadcast 1-row bounds aggregate → `sequence` explode) crossed
    * with the distinct key set, left-joined to the observed counts.
    *
    * Scale note: the output is |keys| × |buckets| rows BY DEFINITION
    * of densification — that product is the caller's contract, not a
    * join explosion (the spine cross is an explode over a broadcast
    * range, never a shuffled cartesian). Timestamps must be
    * non-negative epoch nanos (truncating `div` == floor there, both
    * engines). */
  def densify(df: DataFrame, tsCol: String, keyCols: Seq[String],
      bucketNs: Long, bucketCol: String = "bucket"): DataFrame = {
    require(bucketNs > 0, "bucketNs must be positive")
    require(keyCols.nonEmpty, "key columns required")
    require(!keyCols.contains(bucketCol), s"'$bucketCol' clashes with keys")
    val bucketed = df
      .where(col(tsCol).isNotNull &&
        keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(expr(s"cast(`$tsCol` div ${bucketNs}L as bigint)")
        .as(bucketCol) +: keyCols.map(col): _*)
    val counts = bucketed.groupBy((bucketCol +: keyCols).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val bounds = broadcast(bucketed.agg(
      min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi")))
    val keys = bucketed.select(keyCols.map(col): _*).distinct()
    val spine = keys.crossJoin(bounds)
      .select(keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"))).as(bucketCol): _*)
    spine.join(counts, bucketCol +: keyCols, "left")
      .select((bucketCol +: keyCols).map(col) :+
        coalesce(col("cnt"), lit(0L)).as("cnt"): _*)
  }

  /** Time-weighted average (TWAP) of a step-wise value series per
    * key: each observation holds its value until the NEXT observation
    * (last-value interpolation), and the average weights each value
    * by its holding duration — the finance/metrics convention where a
    * plain mean over-counts bursts of ticks. Returns one row per key:
    * (keyCols, n_obs, span_nanos, twap); keys with < 2 observations
    * have no holding span and report a null twap.
    *
    * Exact arithmetic: durations are long nanos, values quantize to
    * decimal(18,2) (the events.value convention), the
    * duration-weighted sum is an exact decimal, and the single final
    * division runs on bridged doubles — engine-reproducible. `tsCol`
    * must be epoch-nanos; `orderBy` must TOTALLY order each key's
    * rows (pass value as a tiebreaker for same-timestamp ticks —
    * equal (ts, value) duplicates are then order-free).
    *
    * Scale shape: one key-partitioned lead() window (keys
    * parallelize; never a global window) + one aggregate. Decimal
    * sums overflow at ~10^36 value·nanos per key — bound holding
    * spans upstream for multi-year tick data. */
  def twap(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String,
      orderBy: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(keyCols.nonEmpty, "key columns required")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    val stepped = df
      .where(col(tsCol).isNotNull && col(valCol).isNotNull)
      .withColumn("__v", col(valCol).cast("decimal(18,2)"))
      .withColumn("__dt", lead(col(tsCol), 1).over(w) - col(tsCol))
    stepped.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__dt")).cast("long").as("span_nanos"),
        sum(col("__v") * col("__dt")).as("__ws"))
      .withColumn("twap",
        when(col("span_nanos") > 0L,
          (col("__ws").cast("double") / col("span_nanos").cast("double"))
            .cast("decimal(18,9)").cast("double")))
      .drop("__ws")
  }
}
