package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics operators over event streams: ordered conversion
  * funnels and cohort retention matrices. Both are built from keyed
  * aggregations only — per-user state never leaves its shuffle
  * partition, and the final outputs are tiny (one row per step /
  * per (cohort, offset) cell), so the shapes survive a 1000-executor
  * scale-up unchanged.
  *
  * Determinism: counts are exact longs; the only doubles emitted are
  * single divisions of exact longs (`conv_pct`, `retention_pct`),
  * which every IEEE-754 engine computes bit-identically.
  */
object Funnel {

  /** Ordered conversion funnel: step 1 is a user's FIRST `steps(0)`
    * event; step k is the first `steps(k-1)` event STRICTLY AFTER the
    * user's step-(k-1) time and within `horizonNanos` of their step-1
    * time. Emits one row per step: users reached + conversion from
    * step 1.
    *
    * Shape: one `groupBy(user)` min-aggregate per step (k small,
    * fixed), each joined user-keyed to the previous step's frame —
    * every shuffle is on the user key, so AQE reuses the exchange
    * layout across steps; the per-step count aggregates are
    * driver-tiny. The event scan is re-read once per step with a
    * pushed-down `event_type` equality filter (dictionary-pruned in
    * parquet); at corpus scale, persist the 3-column projection once
    * if the step list is long.
    *
    * `tsCol` must be an epoch-nanos long (see SparkEntry.events).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], horizonNanos: Long): DataFrame = {
    val stepFrames =
      stepReachFrames(events, userCol, typeCol, tsCol, steps, horizonNanos)
    val perStep = stepFrames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("int").as("step"),
          lit(steps(i)).as("event_type"), col("n_users"))
    }.reduce(_ unionByName _)
    val nFirst = stepFrames.head.agg(count(lit(1)).as("n_first"))
    perStep.crossJoin(broadcast(nFirst))
      .withColumn("conv_pct",
        col("n_users").cast("double") / col("n_first"))
      .drop("n_first")
  }

  /** Time-to-convert per funnel step: users reached + the average lag
    * from their step-1 event, in nanos (step 1 is 0 by definition).
    * The lag sum accumulates as exact decimal — horizon·users can
    * pass 2^63 nanos long before the corpus is "big" — and the
    * average is one double division via the VARCHAR bridge. */
  def conversionLag(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], horizonNanos: Long): DataFrame = {
    val stepFrames =
      stepReachFrames(events, userCol, typeCol, tsCol, steps, horizonNanos)
    stepFrames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"),
          sum((col("tk") - col("t1")).cast("decimal(28,0)")).as("__s"))
        .select(lit(i + 1).cast("int").as("step"),
          lit(steps(i)).as("event_type"), col("n_users"),
          (col("__s").cast("string").cast("double") / col("n_users"))
            .as("avg_lag_ns"))
    }.reduce(_ unionByName _)
  }

  /** stepFrames(k): (u, t1, tk) — users who reached step k+1, with
    * their step-1 time and step-(k+1) time. Shared by [[funnel]] and
    * [[conversionLag]]. */
  private def stepReachFrames(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      horizonNanos: Long): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate step in $steps")
    require(horizonNanos > 0 && horizonNanos <= Long.MaxValue / 2,
      "horizonNanos must be positive (and small enough that t1 + horizon " +
        "cannot overflow a long)")
    val base = events
      .select(col(userCol).as("u"), col(typeCol).as("et"),
        col(tsCol).cast("long").as("tn"))
      .where(col("u").isNotNull && col("et").isNotNull &&
        col("tn").isNotNull)
    val first = base.where(col("et") === steps.head)
      .groupBy("u").agg(min("tn").as("t1"))
      .withColumn("tk", col("t1"))
    steps.drop(1).scanLeft(first) { (prev, stepType) =>
      base.where(col("et") === stepType)
        .join(prev.select(col("u"), col("t1"), col("tk").as("tp")),
          Seq("u"))
        .where(col("tn") > col("tp") &&
          col("tn") <= col("t1") + lit(horizonNanos))
        .groupBy("u")
        .agg(min("t1").as("t1"), min("tn").as("tk"))
    }
  }

  /** Cohort retention matrix: cohort = the period (e.g. day) of a
    * user's first event; a user is retained at offset d if they have
    * any event in period cohort+d. Emits one row per (cohort, offset)
    * with the distinct-user count, the cohort's size, and the
    * retention rate.
    *
    * Shape: distinct (user, period) → one user-keyed min-aggregate →
    * one user-keyed join → a tiny (cohort, offset) aggregate. Cohort
    * sizes re-enter via a broadcast of the offset-0 slice (one row
    * per cohort — always small). No window functions, no per-user
    * arrays.
    *
    * `tsCol` must be an epoch-nanos long and non-negative (period
    * assignment uses truncating integer division, which equals floor
    * division only for non-negative timestamps — both engines agree
    * there).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      periodNanos: Long): DataFrame = {
    require(periodNanos > 0, "periodNanos must be positive")
    val dup = events
      .select(col(userCol).as("u"),
        expr(s"cast(`$tsCol` div ${periodNanos}L as bigint)").as("p"))
      .where(col("u").isNotNull && col("p").isNotNull)
      .distinct()
    val firstP = dup.groupBy("u").agg(min("p").as("cohort"))
    val cells = dup.join(firstP, Seq("u"))
      .select(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .groupBy("cohort", "offset").agg(count(lit(1)).as("n_users"))
    val size0 = cells.where(col("offset") === 0)
      .select(col("cohort"), col("n_users").as("n_cohort"))
    cells.join(broadcast(size0), Seq("cohort"))
      .withColumn("retention_pct",
        col("n_users").cast("double") / col("n_cohort"))
  }
}
