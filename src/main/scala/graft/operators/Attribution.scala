package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-touch marketing attribution — the fractional-credit
  * complement of the last-touch query (an as-of join): every touch a
  * user made in the `windowNanos` before a conversion shares that
  * conversion's one unit of credit.
  *
  * Models:
  *  - `linear`: each of a conversion's k in-window touches gets 1/k —
  *    ONE double division of exact longs, decimal(18,12)-rounded, so
  *    credits replay bit-identically cross-engine.
  *  - `u_shaped` (position-based): the first and last in-window touch
  *    get 0.4 each, the middles share 0.2 equally (k=1 gets all, k=2
  *    splits 0.5/0.5) — every credit is a literal or ONE double
  *    division, decimal(18,12)-rounded, engine-exact. First/last rank
  *    by (touch time, touch type) so equal-timestamp ties are
  *    deterministic.
  *  - `time_decay`: a touch's raw weight halves for every WHOLE
  *    `halfLifeNanos` of lag (w = 0.5^⌊lag/halfLife⌋ — the discrete
  *    half-life form, chosen over continuous 2^(−lag/h) because
  *    integer-exponent powers of two are EXACT doubles: raw weights,
  *    their per-conversion sums (exact while the exponent spread stays
  *    under 53 bits — any window/halfLife ratio ≤ 45 qualifies), and
  *    the normalizing division are all engine-deterministic, where a
  *    fractional-exponent pow is only as portable as two libms).
  *    Credits are w/Σw, decimal(18,12)-rounded.
  *
  * Weights sum to 1 per conversion in every model (spec-pinned).
  * Conversions with NO in-window touch carry their full credit as the
  * `none` class, so total credit always equals the conversion count —
  * a report that silently dropped untouched conversions would
  * overstate every channel's share.
  *
  * Scale shape: one equi-join on the user key with the time window as
  * a post-join filter (per-user touch×conversion fan-out is bounded by
  * activity in the window), one keyed aggregate per conversion for
  * k/Σw, one anti-join for the `none` class, one keyed aggregate for
  * the report. No windows over a global order, no driver state; skewed
  * bot users are the usual hazard — cap upstream as with Sessionize.
  */
object Attribution {

  val Linear = "linear"
  val TimeDecay = "time_decay"
  val UShaped = "u_shaped"

  /** Per-conversion fractional credits: (convIdCol, touch_type,
    * credit decimal(18,12)). Touches qualify when
    * `0 <= convTs - touchTs <= windowNanos` (inclusive, the last-touch
    * convention); conversions with no qualifying touch get one row
    * (convIdCol, 'none', 1). Null keys/timestamps drop on both sides —
    * a null user key would cross-attribute every anonymous row. */
  def credits(conversions: DataFrame, touches: DataFrame,
      keyCols: Seq[String], convIdCol: String, convTsCol: String,
      touchTsCol: String, touchTypeCol: String, windowNanos: Long,
      model: String = Linear,
      halfLifeNanos: Long = 3600L * 1000000000L): DataFrame = {
    require(keyCols.nonEmpty, "at least one join key column")
    require(windowNanos > 0, "windowNanos must be positive")
    require(model == Linear || model == TimeDecay || model == UShaped,
      s"unknown attribution model '$model' " +
        s"(use '$Linear', '$TimeDecay' or '$UShaped')")
    require(halfLifeNanos > 0, "halfLifeNanos must be positive")
    // beyond ~45 half-lives per window the exactness guarantee decays
    // (the per-conversion weight SUM must stay under 53 mantissa bits,
    // and many weight-1 touches on top of a 2^-45 tail eat the
    // headroom), and past 1074 the raw weight UNDERFLOWS to 0.0 — a
    // conversion whose touches all underflow would get 0/0 = null
    // credits and silently vanish from the report total. Fail loudly
    // instead. Compared without division: windowNanos/halfLifeNanos
    // truncates, which would admit up to 45.99 half-lives.
    require(model != TimeDecay || halfLifeNanos > Long.MaxValue / 45 ||
        windowNanos <= 45L * halfLifeNanos,
      s"time_decay window spans ${windowNanos.toDouble / halfLifeNanos} " +
        "half-lives; beyond 45 the weight sums lose engine-exactness " +
        "(and far beyond, weights underflow to 0/0 credits) — widen " +
        "halfLifeNanos or narrow windowNanos")
    val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val c = conversions
      .select((keyCols.map(col) :+ col(convIdCol).as("__cid") :+
        col(convTsCol).as("__ct")): _*)
      .where(keyNotNull && col("__ct").isNotNull)
    val t = touches
      .select((keyCols.map(col) :+ col(touchTsCol).as("__tt") :+
        col(touchTypeCol).as("__ttype")): _*)
      .where(keyNotNull && col("__tt").isNotNull &&
        col("__ttype").isNotNull)
    val m = c.join(t, keyCols)
      .where(col("__tt") <= col("__ct") &&
        col("__ct") - col("__tt") <= windowNanos)
      .select(col("__cid"), col("__ct"), col("__tt"), col("__ttype"))
    val credited = model match {
      case Linear =>
        val k = m.groupBy("__cid").agg(count(lit(1)).as("__k"))
        m.join(k, Seq("__cid"))
          .select(col("__cid"), col("__ttype").as("touch_type"),
            (lit(1.0) / col("__k").cast("double"))
              .cast("decimal(18,12)").as("credit"))
      case UShaped =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("__cid")
          .orderBy(col("__tt").asc, col("__ttype").asc)
        m.withColumn("__rn", row_number().over(w))
          .withColumn("__k",
            count(lit(1)).over(Window.partitionBy("__cid")))
          .select(col("__cid"), col("__ttype").as("touch_type"),
            when(col("__k") === 1, lit(1.0))
              .when(col("__k") === 2, lit(0.5))
              .when(col("__rn") === 1 || col("__rn") === col("__k"),
                lit(0.4))
              .otherwise(lit(0.2) / (col("__k") - 2).cast("double"))
              .cast("decimal(18,12)").as("credit"))
      case TimeDecay =>
        val w = m.withColumn("__w",
          pow(lit(0.5), floor((col("__ct") - col("__tt")) /
            lit(halfLifeNanos.toDouble))))
        val z = w.groupBy("__cid").agg(sum("__w").as("__z"))
        w.join(z, Seq("__cid"))
          .select(col("__cid"), col("__ttype").as("touch_type"),
            (col("__w") / col("__z"))
              .cast("decimal(18,12)").as("credit"))
    }
    val none = c.join(m.select("__cid").distinct(), Seq("__cid"),
        "left_anti")
      .select(col("__cid"), lit("none").as("touch_type"),
        lit(1L).cast("decimal(18,12)").as("credit"))
    credited.unionByName(none)
      .withColumnRenamed("__cid", convIdCol)
  }

  /** Channel report over [[credits]]: per touch type, total fractional
    * credit (exact decimal sum, re-entering double through the VARCHAR
    * bridge) and the number of distinct conversions it touched. Total
    * credit across rows equals the conversion count. */
  def report(conversions: DataFrame, touches: DataFrame,
      keyCols: Seq[String], convIdCol: String, convTsCol: String,
      touchTsCol: String, touchTypeCol: String, windowNanos: Long,
      model: String = Linear,
      halfLifeNanos: Long = 3600L * 1000000000L): DataFrame =
    credits(conversions, touches, keyCols, convIdCol, convTsCol,
      touchTsCol, touchTypeCol, windowNanos, model, halfLifeNanos)
      .groupBy("touch_type")
      .agg(sum("credit").cast("string").cast("double").as("credit"),
        countDistinct(col(convIdCol)).as("n_conversions"))
}
