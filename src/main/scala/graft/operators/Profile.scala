package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Column-profiling summary for pipeline hygiene checks (row counts,
  * null counts, distinct cardinalities) — the "is this ingest sane"
  * primitive run before/after every large transform.
  *
  * Scale shape: ONE aggregation pass over the data computing all
  * metrics together (count/conditional-count partial-aggregate;
  * distinct counts are HyperLogLog sketches by default so the pass
  * stays a plain partial aggregation — exact multi-distinct would
  * Expand the scan |cols|×). Only the |cols|-sized metric row reaches
  * the driver; the pivot to one row per column happens on that
  * constant-size result.
  */
object Profile {

  /** Fixed-width histogram of a numeric column: counts per bucket over
    * [min, max), with underflow/overflow clamped into the edge buckets
    * and an explicit zero row for empty buckets (so downstream plots
    * see the full axis). One partial-aggregated hash aggregation; the
    * |buckets|-row result is joined against a range frame, never
    * collected. */
  def histogram(df: DataFrame, valCol: String, minVal: Double,
      maxVal: Double, buckets: Int): DataFrame = {
    require(buckets > 0 && maxVal > minVal, "need buckets > 0, max > min")
    val spark = df.sparkSession
    val width = (maxVal - minVal) / buckets
    val bucket = least(greatest(
      floor((col(valCol).cast("double") - minVal) / width).cast("long"),
      lit(0L)), lit(buckets - 1L))
    // NaN/±Infinity belong to no bucket (NaN would otherwise land in
    // bucket 0 via cast); between() is false for all three
    val counts = df.filter(col(valCol).isNotNull &&
        col(valCol).cast("double").between(-Double.MaxValue, Double.MaxValue))
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n"))
    spark.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (lit(minVal) + col("bucket").cast("double") * width).as("lo"),
        (lit(minVal) + (col("bucket") + 1).cast("double") * width).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** EXACT heavy hitters via a count-min-sketch candidate pass — the
    * "frequent tokens/n-grams over a corpus whose DISTINCT set does
    * not fit anywhere" shape: a plain `groupBy(col).count()` shuffles
    * every distinct value; this instead
    *
    *  1. aggregates one driver-side CMS (one treeAggregate pass,
    *     mergeable, `eps`·N max overestimation — NEVER underestimates,
    *     so no true heavy hitter can be missed),
    *  2. filters the raw stream to candidate values whose ESTIMATE
    *     reaches `minSupport`·N (narrow map over the broadcast sketch;
    *     survivors are rare by construction), and
    *  3. exact-counts ONLY the survivors (a tiny hash aggregation) and
    *     drops the false positives the overestimation let through.
    *
    * The result equals the exact `HAVING count >= ceil(minSupport·N)`
    * answer. The sketch probe is [[CountMin.estimateCol]] — the d×w
    * count table embedded as array literals, `least` over depth of
    * codegen'd xxhash64 bucket lookups — so the per-row candidate
    * filter stays inside whole-stage codegen with no serialized
    * closure (this was the last `udf(...)` in the engine). Returns
    * (value, count), count descending then value. */
  def heavyHitters(df: DataFrame, valCol: String, minSupport: Double,
      eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    require(minSupport > 0.0 && minSupport <= 1.0,
      "minSupport must be in (0, 1]")
    require(eps > 0.0 && confidence > 0.0 && confidence < 1.0,
      "need eps > 0 and confidence in (0, 1)")
    // sketch and probe must hash the SAME representation — cast to
    // string once, up front (a long and its string hash differently)
    val strs = df.select(col(valCol).cast("string").as("value"))
      .filter(col("value").isNotNull)
    // standard CMS sizing: width = ceil(e/eps) bounds overestimation
    // by eps·N with probability 1 − exp(−depth)  (depth = ln(1/δ))
    val depth = math.max(1,
      math.ceil(math.log(1.0 / (1.0 - confidence))).toInt)
    val width = math.max(1, math.ceil(math.E / eps).toInt)
    val table = CountMin.collectTable(
      CountMin.sketch(strs, "value", depth, width), depth, width)
    // every non-null row lands in exactly one seed-0 bucket, so the
    // seed-0 row sums to the stream length — no separate count() job
    val total = table(0).sum
    if (total == 0L)
      return strs.select(col("value"), lit(0L).as("count")).limit(0)
    val thr = math.ceil(minSupport * total).toLong
    strs.filter(CountMin.estimateCol(table, col("value")) >= thr)
      .groupBy("value")
      .agg(count(lit(1)).as("count"))
      .filter(col("count") >= thr)
      .orderBy(col("count").desc, col("value"))
  }

  /** Per-column (column, n_rows, n_nulls, n_distinct), one row per
    * profiled column, ordered by column name.
    *
    * ==BEHAVIOR CHANGE (round 4)== `n_distinct` defaults to an
    * ESTIMATE: earlier versions computed exact `countDistinct`;
    * callers that relied on exact cardinalities must now pass
    * `exact = true` explicitly.
    *
    * Distinct counts are HyperLogLog estimates by default (~2% error,
    * one plain aggregation pass): exact multi-column `countDistinct`
    * makes Catalyst Expand the scan — every input row is replayed once
    * per profiled column, which at 100 TB turns a hygiene check into
    * the most expensive query of the day. Pass `exact = true` when the
    * precise cardinality is the point (small frames, oracle checks). */
  /** Global percentile rank of `valCol` (0 = lowest, 1 = highest):
    * `(rank − 1) / (n − 1)` over the TOTAL order (valCol, idCol) —
    * the calibration step that puts heterogeneous quality signals
    * (LM score, length, dup ratio) on one comparable [0, 1] scale
    * before mixing them. Exact integer ratio → engine-reproducible.
    *
    * Scale shape: positions come from [[PrefixScan.runningSumBy]]
    * (range-partitioned sort + two-phase scan, never a single-task
    * `percent_rank()` window); n rides a broadcast 1-row aggregate of
    * the INPUT (no recompute of the sorted pass). Rows with a null
    * `valCol` are dropped — null order diverges across engines and a
    * rank over nulls is meaningless. Single row → 0.0. */
  def percentileRank(df: DataFrame, idCol: String, valCol: String,
      outCol: String = "pct_rank",
      materialize: Boolean = true): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' collides — rename one")
    val reserved = Seq("__graft_one", "__graft_pos", "__graft_n")
    require(reserved.forall(r => !df.columns.contains(r)),
      s"reserved columns $reserved present — rename them")
    val in = df.where(col(valCol).isNotNull)
    val counted = PrefixScan.runningSumBy(
      in.withColumn("__graft_one", lit(1L)),
      Seq(col(valCol), col(idCol)), "__graft_one", "__graft_pos",
      materialize).drop("__graft_one")
    val n = in.agg(count(lit(1)).as("__graft_n"))
    counted.crossJoin(org.apache.spark.sql.functions.broadcast(n))
      .withColumn(outCol,
        when(col("__graft_n") === 1L, lit(0.0))
          .otherwise((col("__graft_pos") - 1L).cast("double") /
            (col("__graft_n") - 1L).cast("double")))
      .drop("__graft_pos", "__graft_n")
  }

  /** Scale-safe `ntile(k)` over a TOTAL order: tile assignment from
    * exact integer arithmetic on (position, n) instead of a global
    * unpartitioned window (which funnels every row into one task).
    * Standard ntile semantics — with q = n div k and r = n mod k, the
    * first r tiles hold q+1 rows, the rest q — so results are
    * bit-identical to `ntile() OVER (ORDER BY ...)` in any ANSI
    * engine, provided `orderBy` is fully tie-broken.
    *
    * Scale shape: positions come from [[PrefixScan.runningSumBy]]
    * (range-partitioned sort + two-phase scan); n rides a broadcast
    * 1-row count. All arithmetic is integral — engine-reproducible. */
  def ntileExact(df: DataFrame, orderBy: Seq[org.apache.spark.sql.Column],
      k: Int, outCol: String, materialize: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' collides — rename one")
    val reserved = Seq("__graft_one", "__graft_pos", "__graft_n")
    require(reserved.forall(r => !df.columns.contains(r)),
      s"reserved columns $reserved present — rename them")
    val counted = PrefixScan.runningSumBy(
      df.withColumn("__graft_one", lit(1L)),
      orderBy, "__graft_one", "__graft_pos", materialize)
      .drop("__graft_one")
    val n = df.agg(count(lit(1)).as("__graft_n"))
    counted.crossJoin(broadcast(n))
      // big-tile section first: r tiles of (q+1) rows, then q-row tiles
      .withColumn(outCol, expr(
        s"""CASE WHEN __graft_pos <=
           |    (__graft_n % $k) * (__graft_n div $k + 1)
           |  THEN (__graft_pos - 1) div (__graft_n div $k + 1) + 1
           |  ELSE (__graft_n % $k) +
           |    (__graft_pos - (__graft_n % $k) * (__graft_n div $k + 1)
           |      - 1) div greatest(__graft_n div $k, 1) + 1
           |END""".stripMargin).cast("long"))
      .drop("__graft_pos", "__graft_n")
  }

  /** Key-skew histogram — the "will this key explode my shuffle"
    * diagnostic run BEFORE a big join/groupBy: group sizes bucketed by
    * log2 (bucket b holds keys with 2^b ≤ count < 2^(b+1)), one row
    * per occupied bucket: (bucket, lo, n_keys, n_rows). A healthy key
    * column tails off smoothly; a skew pathology shows as occupied
    * high buckets (one key holding millions of rows) — exactly the
    * keys to salt ([[SkewJoin]]) or AQE-split.
    *
    * Exact arithmetic: the bucket is the group count's bit length − 1
    * (`length(bin(c)) - 1` — no floating log2, engine-portable).
    * Scale: ONE count shuffle on the key (the partial-agg-bounded
    * shape every groupBy has), then a bucket re-agg of one row per
    * key. Null keys count as a group. */
  /** EXACT per-group discrete quantiles — "the median/p25/p75 doc
    * length per source" computed exactly, at scale, where the usual
    * answer is either an approximation (approx_percentile) or a
    * `PARTITION BY key` window that serializes a hot group into one
    * task. Type-1 (lower discrete) quantiles: the value whose 1-based
    * rank in (value, tiebreak ascending) order is `ceil(q·n_k)` —
    * always an observed value, integer-exact, engine-replayable.
    * Returns (keyCols…, q, quantile value), one row per (key, q);
    * null values are EXCLUDED (a null is missing data, not an extreme
    * of the order); groups whose values are all null drop out.
    *
    * Scale shape: one [[PrefixScan.runningSumByKey]] pass for the
    * per-(key, row) rank (no window — a hot key spans adjacent
    * partitions), one partial-aggregated per-key count joined back on
    * the key, and a narrow rank-membership filter against the ≤|qs|
    * target ranks (the qs list is a compile-time constant riding the
    * expression). */
  def quantilesByKey(df: DataFrame, keyCols: Seq[String],
      valCol: String, qs: Seq[Double],
      materialize: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "key columns required")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val reserved = Seq("__graft_one", "__graft_rank", "__graft_n")
    require(reserved.forall(r => !df.columns.contains(r)),
      s"reserved columns $reserved present — rename them")
    val base = df.where(col(valCol).isNotNull)
      .select((keyCols :+ valCol).map(col): _*)
      .withColumn("__graft_one", lit(1L))
    val ranked = PrefixScan.runningSumByKey(base, keyCols,
      Seq(col(valCol).asc), "__graft_one", "__graft_rank", materialize)
    val counts = base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("__graft_n"))
    // rank r is kept iff ∃ q: r == ceil(q·n) — all-LONG arithmetic
    // (ceil(q·n) on doubles is un-portable when q·n is exactly
    // integral): q as the rational num/10^6 (exact for 6-dp qs), and
    // ceil(a/b) = (a + b − 1) div b
    def targetRank(q: Double): org.apache.spark.sql.Column = {
      val num = math.round(q * 1e6)
      expr(s"(__graft_n * ${num}L + 999999L) div 1000000L")
    }
    val hit = qs.map(q => col("__graft_rank") === targetRank(q))
      .reduce(_ || _)
    val qCase = qs.map(q =>
      when(col("__graft_rank") === targetRank(q), lit(q)))
    // null-safe (<=>) key join: runningSumByKey ranks a null key as a
    // group like every sibling operator ("null keys count as a group",
    // skewHistogram et al.), and a plain equality join would silently
    // drop that group here — diverging from the SQL twin's window,
    // which keeps a NULL partition
    val joined = ranked.as("__r").join(counts.as("__c"),
      keyCols.map(k => col(s"__r.`$k`") <=> col(s"__c.`$k`"))
        .reduce(_ && _))
    joined
      .where(hit)
      .select((keyCols.map(k => col(s"__r.`$k`").as(k)) :+
        explode(array(qCase: _*)).as("q") :+
        col(valCol).as("quantile")): _*)
      .where(col("q").isNotNull)
  }

  def skewHistogram(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "key columns required")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("__c"))
    counts
      .withColumn("bucket", (length(bin(col("__c"))) - 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).cast("long").as("n_keys"),
        sum("__c").cast("long").as("n_rows"))
      .withColumn("lo", expr("shiftleft(cast(1 as bigint), cast(bucket as int))"))
      .select("bucket", "lo", "n_keys", "n_rows")
  }

  /** Crosstab / pivot report: row-key × EXPLICIT column domain →
    * counts, empty cells as 0. The column domain is a required
    * argument on purpose: Spark's values-less `pivot` first runs a
    * driver-side distinct-collect over the pivot column — an extra
    * full pass and an unbounded-width risk at corpus scale. With the
    * domain supplied, this is ONE map-side-combined aggregate over
    * (row, col) and a driver-free plan; values outside the domain are
    * dropped (documented contract). Null row keys are excluded (a
    * null row label is a diagnosis, not a report row). */
  def crosstab(df: DataFrame, rowCol: String, colCol: String,
      values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "explicit pivot column domain required")
    require(values.distinct.size == values.size,
      s"duplicate pivot value in $values")
    val wide = df.where(col(rowCol).isNotNull)
      .groupBy(col(rowCol))
      .pivot(colCol, values)
      .agg(count(lit(1)))
    // pivot leaves empty cells null; a count report wants 0
    wide.select(col(rowCol) +: values.map(v =>
      coalesce(col(s"`$v`"), lit(0L)).as(v)): _*)
  }

  /** Per-group simple linear regression (closed form): slope,
    * intercept, r² of y on x from the five sufficient moments —
    * ONE map-side-combined aggregate per group, no second pass, no
    * driver solve. Inputs quantize to decimal(18,6) and the moment
    * sums accumulate as exact decimals (order-free — partial
    * aggregation order differs across engines), then slope/intercept/
    * r² are a fixed chain of IEEE double ops via the VARCHAR bridge.
    * Degenerate groups (zero x-variance / zero y-variance) emit null
    * slope/r² instead of an ANSI divide error. */
  def linearFit(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "key columns required")
    // null filter runs AFTER the decimal cast: a value overflowing
    // decimal(18,6) (|v| >= 1e12) casts to null in non-ANSI mode, and
    // counting a row whose moments were null-skipped would silently
    // corrupt slope/intercept — the whole row drops instead.
    // Products go to decimal(38,12): (18,6)×(18,6) needs 36 integer
    // digits in the worst case, so (30,12) could overflow mid-range
    // inputs while (38,12) cannot for any in-range pair.
    val q = df
      .select(keyCols.map(col) :+
        col(xCol).cast("decimal(18,6)").as("__x") :+
        col(yCol).cast("decimal(18,6)").as("__y"): _*)
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val agg = q.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum((col("__x") * col("__x")).cast("decimal(38,12)")).as("__sxx"),
        sum((col("__x") * col("__y")).cast("decimal(38,12)")).as("__sxy"),
        sum((col("__y") * col("__y")).cast("decimal(38,12)")).as("__syy"))
    def d(c: String) = col(c).cast("string").cast("double")
    val nd = col("n").cast("double")
    val cov = nd * d("__sxy") - d("__sx") * d("__sy")
    val varx = nd * d("__sxx") - d("__sx") * d("__sx")
    val vary = nd * d("__syy") - d("__sy") * d("__sy")
    agg.select(keyCols.map(col) :+ col("n") :+
      when(varx > 0.0, cov / varx).as("slope") :+
      when(varx > 0.0,
        (d("__sy") - (cov / varx) * d("__sx")) / nd).as("intercept") :+
      when(varx > 0.0 && vary > 0.0,
        (cov * cov) / (varx * vary)).as("r2"): _*)
  }

  def summarize(df: DataFrame, cols: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val n = r.getLong(0)
    val rows = cols.sorted.map { c =>
      Row(c, n, n - r.getAs[Long](s"__nn_$c"), r.getAs[Long](s"__nd_$c"))
    }
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_nulls", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false)))
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }
}
