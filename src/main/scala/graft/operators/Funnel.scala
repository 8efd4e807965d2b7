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
    val counts = stepFrames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("int").as("step"),
          lit(steps(i)).as("event_type"), col("n_users"))
    }
    val perStep = counts.reduce(_ unionByName _)
    // n_first reuses the step-1 count subplan (identical Exchange →
    // ReuseExchange computes the step-1 scan+shuffle once)
    val nFirst = counts.head.select(col("n_users").as("n_first"))
    perStep.crossJoin(broadcast(nFirst))
      // an empty step-1 cohort makes conversion undefined (0/0 is an
      // ANSI divide error, not a rate) — null, rows still emitted
      .withColumn("conv_pct",
        when(col("n_first") > 0,
          col("n_users").cast("double") / col("n_first")))
      .drop("n_first")
  }

  /** EXCLUSION funnel ("did A then C WITHOUT B in between"): per user,
    * t_A = first `startStep`, t_C = first `endStep` strictly after
    * t_A within `horizonNanos`; a converted user is EXCLUDED when any
    * `excludeStep` event falls strictly between t_A and t_C. The
    * negative-path analytics cut ("purchased without clicking the
    * promo") product tools ship as "did not" steps. Returns ONE row:
    * (n_start, n_converted, n_excluded, n_clean, clean_pct) —
    * clean_pct = n_clean / n_converted, null when nothing converts.
    *
    * Shape: three user-keyed aggregates/joins (A-times, C-after-A,
    * B-between) — every shuffle is on the user key; the final row
    * composes broadcast 1-row counts. Exact longs; one division. */
  def exclusionFunnel(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, startStep: String,
      endStep: String, excludeStep: String,
      horizonNanos: Long): DataFrame = {
    require(horizonNanos > 0, "horizon must be positive")
    val ev = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(typeCol), col(tsCol).cast("long"))
    val a = ev.where(col(typeCol) === startStep)
      .groupBy(userCol).agg(min(tsCol).as("__ta"))
    val c = ev.where(col(typeCol) === endStep)
      .join(a, Seq(userCol))
      .where(col(tsCol) > col("__ta") &&
        col(tsCol) <= col("__ta") + horizonNanos)
      .groupBy(userCol)
      .agg(max(col("__ta")).as("__ta"), min(col(tsCol)).as("__tc"))
    val excluded = ev.where(col(typeCol) === excludeStep)
      .join(c, Seq(userCol))
      .where(col(tsCol) > col("__ta") && col(tsCol) < col("__tc"))
      .select(col(userCol)).distinct()
    val nStart = broadcast(a.agg(count(lit(1)).as("n_start")))
    val nConv = broadcast(c.agg(count(lit(1)).as("n_converted")))
    val nExcl = broadcast(excluded.agg(count(lit(1)).as("n_excluded")))
    nStart.crossJoin(nConv).crossJoin(nExcl)
      .withColumn("n_clean", col("n_converted") - col("n_excluded"))
      .withColumn("clean_pct",
        when(col("n_converted") > 0,
          col("n_clean").cast("double") /
            col("n_converted").cast("double")))
  }

  /** Item co-visitation ("users who touched A also touched B") — the
    * classic related-items / market-basket signal over an event
    * stream: per user, the distinct items they touched (capped at the
    * `maxPerUser` MOST RECENT by last-touch time — the standard
    * basket cap that stops a bot account from emitting O(catalog²)
    * pairs), then every unordered item pair counted by co-visiting
    * users, with lift = n_ab·U / (u_a·u_b). Returns
    * (item_a, item_b, n_users, lift), item_a < item_b, pairs with
    * ≥ `minSupport` users.
    *
    * Scale shape: one (user, item) last-touch aggregate, one
    * user-keyed WindowGroupLimit cap (≤ maxPerUser rows leave each
    * user), a self-join whose per-user fan-out is ≤ C(maxPerUser, 2)
    * by construction, then item-keyed count joins; U rides a
    * broadcast 1-row aggregate. Lift is two double products and one
    * division on exact longs (the coocLift convention). */
  def covisitation(events: DataFrame, userCol: String, itemCol: String,
      tsCol: String, maxPerUser: Int = 30,
      minSupport: Long = 2L): DataFrame = {
    require(maxPerUser >= 2, "maxPerUser must be >= 2")
    require(minSupport >= 1, "minSupport must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val ui = events
      .where(col(userCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(userCol, itemCol).agg(max(col(tsCol)).as("__lt"))
    val w = Window.partitionBy(userCol)
      .orderBy(col("__lt").desc, col(itemCol).asc)
    val capped = ui.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerUser)
      .select(col(userCol), col(itemCol))
    val users = broadcast(capped.select(userCol).distinct()
      .agg(count(lit(1)).as("__nu")))
    val itemUsers = capped.groupBy(itemCol)
      .agg(count(lit(1)).as("__u"))
    capped.select(col(userCol), col(itemCol).as("item_a"))
      .join(capped.select(col(userCol), col(itemCol).as("item_b")),
        Seq(userCol))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_users"))
      .where(col("n_users") >= minSupport)
      .join(itemUsers.select(col(itemCol).as("item_a"),
        col("__u").as("__ua")), Seq("item_a"))
      .join(itemUsers.select(col(itemCol).as("item_b"),
        col("__u").as("__ub")), Seq("item_b"))
      .crossJoin(users)
      .select(col("item_a"), col("item_b"), col("n_users"),
        ((col("n_users").cast("double") * col("__nu").cast("double")) /
          (col("__ua").cast("double") * col("__ub").cast("double")))
          .as("lift"))
  }

  /** UNORDERED funnel ("did they do all of these within the window",
    * any order): per user, the FIRST time of each step; the user
    * completes when every step is present and the span between the
    * earliest and latest first-occurrence fits `horizonNanos`. The
    * engagement-checklist complement of the ordered [[funnel]] — "hit
    * view AND click AND purchase this week" regardless of sequence.
    * Returns (n_steps_hit, completed, n_users): users bucket by how
    * many DISTINCT steps they performed at all, and full hitters
    * split into completed (span within the horizon) vs not — the
    * "engaged but too slowly" slice stays visible.
    *
    * One filtered aggregate per user (min ts per step via conditional
    * MIN — no join per step), one count by bucket. Exact integers. */
  def unorderedFunnel(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      horizonNanos: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, s"duplicate step in $steps")
    require(horizonNanos > 0, "horizonNanos must be positive")
    val perUser = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(steps.map(st =>
        min(when(col(typeCol) === st, col(tsCol))).as(s"__t_$st")).head,
        steps.tail.map(st =>
          min(when(col(typeCol) === st, col(tsCol))).as(s"__t_$st")): _*)
    val stepCols = steps.map(st => col(s"__t_$st"))
    val nHit = stepCols.map(c =>
      when(c.isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    // span only gates FULL hitters (nHit == |steps| ⇒ every step col
    // non-null, so engines' differing greatest/least null conventions
    // never reach the comparison)
    val span = greatest(stepCols: _*) - least(stepCols: _*)
    perUser
      .select(nHit.as("n_steps_hit"),
        (nHit === steps.size.toLong && span <= horizonNanos)
          .cast("int").as("completed"))
      .groupBy("n_steps_hit", "completed")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Funnel over time: reach and conversion per (cohort, step), where
    * a user's cohort is the period of their STEP-1 time — "did last
    * week's signups convert worse than this week's". Same step-reach
    * frames as [[funnel]], grouped by `t1 div cohortPeriodNanos`
    * instead of globally; per-cohort conversion re-enters via a
    * broadcast of the step-1 slice (one row per cohort, always
    * small). Every cohort present at step k exists at step 1 (cohort
    * derives from t1), so the join is lossless. */
  def funnelByCohort(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], horizonNanos: Long,
      cohortPeriodNanos: Long): DataFrame = {
    require(cohortPeriodNanos > 0, "cohortPeriodNanos must be positive")
    val stepFrames =
      stepReachFrames(events, userCol, typeCol, tsCol, steps, horizonNanos)
    val counts = stepFrames.zipWithIndex.map { case (f, i) =>
      f.groupBy(expr(s"t1 div ${cohortPeriodNanos}L").cast("long")
          .as("cohort"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("cohort"), lit(i + 1).cast("int").as("step"),
          lit(steps(i)).as("event_type"), col("n_users"))
    }
    val all = counts.reduce(_ unionByName _)
    val first = counts.head.select(col("cohort"),
      col("n_users").as("__n_first"))
    all.join(broadcast(first), Seq("cohort"))
      .withColumn("conv_pct",
        when(col("__n_first") > 0,
          col("n_users").cast("double") / col("__n_first")))
      .drop("__n_first")
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

  /** Next-event Markov transition matrix: for consecutive events of
    * each user (event-time order, id tiebreak — total order, so the
    * matrix is deterministic under duplicate timestamps), the count
    * and conditional probability of each (from → to) event-type pair.
    * One key-partitioned window (lead over user), one small
    * (from, to) aggregate, from-type totals re-entering via broadcast
    * re-aggregation — no second data shuffle. p is one exact-long
    * division. */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events
      .select(col(userCol).as("u"), col(typeCol).as("et"),
        col(tsCol).cast("long").as("tn"), col(idCol).as("id"))
      .where(col("u").isNotNull && col("et").isNotNull &&
        col("tn").isNotNull)
    val w = Window.partitionBy("u").orderBy(col("tn"), col("id"))
    val pairs = base
      .withColumn("to_type", lead(col("et"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("et").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type")
      .agg(sum("n").cast("long").as("n_from"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .withColumn("p", col("n").cast("double") / col("n_from"))
  }

  /** Period-over-period change report over a (bucket, keys..., cnt)
    * frame (the [[graft.operators.TimeWindows.densify]] output —
    * zero-filled input means `prev` is well-defined at every bucket
    * after the first): previous-bucket count, absolute delta, and
    * percent change (null at the first bucket and when prev == 0 —
    * a ratio against zero is a diagnosis, not a number). One
    * key-partitioned window. */
  def periodOverPeriod(counts: DataFrame, bucketCol: String,
      keyCols: Seq[String], cntCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty,
      "key columns required (a keyless report is one global window)")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(bucketCol))
    counts
      .withColumn("prev", lag(col(cntCol), 1).over(w))
      .withColumn("delta", col(cntCol) - col("prev"))
      .withColumn("pct_change",
        when(col("prev") > 0,
          col("delta").cast("double") / col("prev")))
  }

  /** Top-k user journeys: the most common length-`n` event-type
    * sequences over each user's (event-time, id) total order —
    * "view > click > purchase"-style path mining. One key-partitioned
    * window pass (n−1 chained LEADs), a path-count aggregate, and a
    * TakeOrdered top-k (count desc, path asc — total order, stable).
    * Paths spanning a session boundary count too; pre-filter with
    * [[graft.operators.Sessionize]] and group per session for
    * session-scoped journeys. */
  def journeys(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, n: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, "a journey needs at least two steps")
    require(topK >= 1, "topK must be positive")
    val base = events
      .select(col(userCol).as("u"), col(typeCol).as("et"),
        col(tsCol).cast("long").as("tn"), col(idCol).as("id"))
      .where(col("u").isNotNull && col("et").isNotNull &&
        col("tn").isNotNull)
    val w = Window.partitionBy("u").orderBy(col("tn"), col("id"))
    // window expressions are projected FIRST (a window function in a
    // WHERE clause is illegal), then the trailing partial windows
    // (null leads) are filtered on the materialized columns
    val stepped = base.select(
      col("et").as("__s0") +:
        (1 until n).map(i => lead(col("et"), i).over(w).as(s"__s$i")): _*)
    val stepCols = (0 until n).map(i => col(s"__s$i"))
    stepped
      .where(stepCols.map(_.isNotNull).reduce(_ && _))
      .select(concat_ws(" > ", stepCols: _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path").asc)
      .limit(topK)
  }

  /** Two-proportion z-test over per-user conversion flags — the A/B
    * readout: per-variant exposure and conversion counts, rates, and
    * the pooled z statistic, one row. Exactly two variants are the
    * contract; `n_variants` rides along so a bad split surfaces in
    * the output instead of silently dropping rows (rows outside the
    * min/max variant are ignored). Every double is a fixed chain of
    * IEEE ops on exact longs (sqrt included — correctly rounded per
    * IEEE 754, so engines agree bit-for-bit). */
  def abTest(users: DataFrame, variantCol: String,
      convertedCol: String): DataFrame = {
    val agg = users
      .where(col(variantCol).isNotNull)
      .groupBy(col(variantCol).as("__v"))
      .agg(count(lit(1)).as("__n"),
        sum(col(convertedCol).cast("int")).cast("long").as("__c"))
    val vs = broadcast(agg.agg(
      min("__v").as("__va"), max("__v").as("__vb"),
      count(lit(1)).as("n_variants")))
    val wide = agg.crossJoin(vs).agg(
      min("__va").as("variant_a"), min("__vb").as("variant_b"),
      min("n_variants").as("n_variants"),
      sum(when(col("__v") === col("__va"), col("__n"))).cast("long")
        .as("n_a"),
      sum(when(col("__v") === col("__va"), col("__c"))).cast("long")
        .as("c_a"),
      sum(when(col("__v") === col("__vb"), col("__n"))).cast("long")
        .as("n_b"),
      sum(when(col("__v") === col("__vb"), col("__c"))).cast("long")
        .as("c_b"))
    val pa = col("c_a").cast("double") / col("n_a")
    val pb = col("c_b").cast("double") / col("n_b")
    val pool = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    wide.select(col("variant_a"), col("variant_b"), col("n_variants"),
      col("n_a"), col("c_a"), pa.as("p_a"),
      col("n_b"), col("c_b"), pb.as("p_b"),
      // degenerate pools (0% or 100% conversion overall) have se = 0:
      // z is undefined there — null, not an ANSI divide-by-zero crash
      when(se > lit(0.0), (pa - pb) / se).as("z"))
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
