package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-curation sampling. Training-data pipelines
  * need repeatable selections — "same inputs, same sample" across
  * reruns, engines, and cluster sizes — which rules out `rand()`-based
  * sampling. Both operators here are pure functions of the data.
  */
object Sampling {

  /** Keep at most `n` rows per key, chosen by a total order — the
    * "at most N documents per domain/language" curation cap.
    * One hash shuffle; Spark's WindowGroupLimit pushes the cap below
    * the shuffle so each partition forwards ≤ n rows per key. */
  def capPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      n: Int): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && n > 0,
      "keys, order and a positive cap required")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_rn")
  }

  /** Deterministic ~(k/16^len) sample: keep rows whose md5(idCol) hex
    * digest is lexicographically below `thresholdHex` (e.g. "28" keeps
    * ≈ 40/256 ≈ 15.6%). Repeatable everywhere md5 exists — the
    * engine-portable alternative to seeded `sample()`, whose output
    * depends on partitioning. Narrow map, no shuffle. */
  def hashSample(df: DataFrame, idCol: String,
      thresholdHex: String): DataFrame = {
    require(thresholdHex.nonEmpty &&
      thresholdHex.forall(c => "0123456789abcdef".contains(c)),
      "threshold must be lowercase hex")
    df.filter(md5(col(idCol).cast("string").cast("binary")) < thresholdHex)
  }

  /** Deterministic WEIGHTED sampling without replacement — "keep the n
    * documents sampled proportional to quality/score" (Efraimidis &
    * Spirakis 2006, A-Res): each row draws u ∈ (0,1) from its md5
    * digest (not rand() — same row, same draw, on any engine or
    * partitioning) and scores `-ln(u) / w`; the n SMALLEST scores win,
    * which selects row i with probability proportional to weight i.
    * Plans as one narrow map + `TakeOrderedAndProject` — per-partition
    * heaps, no shuffle of the corpus. Rows with weight <= 0 or null
    * are filtered out in BOTH modes — they never appear in the result
    * even when n exceeds the number of eligible rows.
    *
    * `roundKeys=false` (default) ranks raw doubles — exact E-S, but
    * ln() is libm-dependent at the ulp level, so the winner set near
    * the cut can flip across engines (spec-verified only).
    * `roundKeys=true` is the ORACLE-COMPARABLE mode: drops
    * non-positive weights, rounds keys to decimal(18,6) and breaks
    * the (now possible) key ties by id — both engines rank identical
    * decimals, so the sample is engine-reproducible; the perturbation
    * of E-S probabilities is O(1e-6) on key comparisons. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int, roundKeys: Boolean = false): DataFrame = {
    require(n > 0, "n must be positive")
    require(!df.columns.contains("__graft_ws"),
      "reserved column '__graft_ws' present — rename it")
    // first 13 hex chars = 52 uniform bits → u in (0, 1]; flip to
    // [0, 1) then clamp away 0 so ln is finite
    val u = (conv(substring(md5(col(idCol).cast("string").cast("binary")),
      1, 13), 16, 10).cast("double") + 1.0) / math.pow(16.0, 13)
    val w = col(weightCol).cast("double")
    if (roundKeys)
      df.filter(w.isNotNull && w > 0.0)
        .withColumn("__graft_ws", (-log(u) / w).cast("decimal(18,6)"))
        .orderBy(col("__graft_ws").asc, col(idCol).asc)
        .limit(n)
        .drop("__graft_ws")
    else
      // same eligibility as roundKeys mode: null/non-positive weights
      // are excluded outright, so both modes agree on membership even
      // when n exceeds the eligible-row count (a +inf sentinel would
      // let them leak back in exactly then)
      df.filter(w.isNotNull && w > 0.0)
        .withColumn("__graft_ws", -log(u) / w)
        .orderBy(col("__graft_ws").asc, col(idCol).asc)
        .limit(n)
        .drop("__graft_ws")
  }

  /** 16-bit md5-threshold hex for a cumulative fraction — shared by
    * the stratified sampler, the mix rebalancer's oracle twin, and
    * [[assignSplits]] (single definition; 1.0 → "g", lexicographically
    * above every hex digest). */
  def thresholdHex(f: Double): String = {
    val t = math.round(f * 65536.0).toInt
    if (t >= 65536) "g" else f"$t%04x"
  }

  /** Deterministic train/validation/test assignment — append `outCol`
    * labeling each row by cumulative md5-threshold buckets over
    * `keyCol`. Pure function of the data: the same row lands in the
    * same split on any engine, partitioning, or cluster size, and —
    * the leakage control — splitting on a GROUP key (user id, domain,
    * near-dup component) keeps every row of a group in one split.
    * Narrow map, no shuffle; fractions honored to ±1/65536. */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(splits.forall(_._2 > 0.0), "split fractions must be positive")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $total")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' collides — rename one")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val digest = md5(col(keyCol).cast("string").cast("binary"))
    // last bucket catches the remainder (incl. the 'g' sentinel), so
    // every row is assigned even at rounding edges
    val assigned = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1)) { case (((name, _), c), acc) =>
      when(digest < thresholdHex(c), lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, assigned)
  }

  /** Rebalance the corpus toward a target key mix — "make the training
    * set 30% en / 20% de / ..." — by DOWN-sampling only (no row is
    * duplicated): find the largest total T whose mix is achievable,
    * `T = min_k(n_k / p_k)`, derive per-key keep fractions
    * `f_k = p_k · T / n_k`, and apply them via the deterministic
    * md5-threshold sampler. The binding (most under-represented
    * relative to its target) key keeps fraction 1; keys absent from
    * `targetMix` are dropped.
    *
    * Determinism & scale: one partial-aggregated count pass with
    * |targeted keys| rows to the driver; the selection itself is the
    * narrow no-shuffle [[stratifiedHashSample]] filter, a pure
    * function of the data (same sample on any engine / partitioning).
    * Targeted keys with zero rows are unattainable and are ignored in
    * the T computation (the achievable mix covers present keys only).
    * Fractions honor targets to the sampler's ±1/65536 threshold
    * granularity. */
  def rebalanceToMix(df: DataFrame, idCol: String, keyCol: String,
      targetMix: Map[String, Double]): DataFrame = {
    require(targetMix.nonEmpty, "target mix must be non-empty")
    require(targetMix.values.forall(p => p > 0.0 && p <= 1.0),
      "target proportions must be in (0, 1]")
    val keys = targetMix.keys.toSeq
    val counts = df
      .filter(col(keyCol).cast("string").isin(keys: _*))
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.limit(0)
    // largest achievable total, then per-key fractions — plain double
    // arithmetic in a FIXED operation order ((p * T) / n), mirrored by
    // the oracle twin so both engines derive identical thresholds
    val t = counts.map { case (k, n) => n.toDouble / targetMix(k) }.min
    // the binding key's fraction is 1 up to double rounding (p·(n/p)/n
    // can land 1 ulp above 1.0); the cap changes nothing below 1 and
    // the ≥65536 threshold collapses to 'g' on both engines anyway
    val fractions = counts.map { case (k, n) =>
      k -> math.min(1.0, targetMix(k) * t / n.toDouble)
    }
    stratifiedHashSample(df, idCol, keyCol, fractions,
      defaultFraction = 0.0)
  }

  /** Deterministic global training-order shuffle: every epoch of
    * pretraining reads the corpus in a fixed pseudorandom order, and
    * that order must be REPRODUCIBLE (resume from a checkpoint,
    * re-shard to a different worker count, re-run an ablation — same
    * order every time). Sort key = md5 of "salt:id" — a pure function
    * of the data, so the order survives any partitioning, engine, or
    * cluster size; a different `salt` gives an independent epoch
    * permutation. Appends `outCol` = 0-based position.
    *
    * Scale shape: positions come from [[PrefixScan.runningSumBy]] over
    * the md5 order — a range-partitioned sort plus the two-phase
    * distributed scan, NOT a global `row_number()` window (which would
    * put the whole corpus in one task). This is the one operator whose
    * JOB is a full-corpus sort; at 100 TB it is exactly the
    * dataset-shuffling pass a training pipeline schedules once per
    * epoch build. `materialize=false` is safe for deterministic
    * (storage-backed) inputs — see the PrefixScan contract. */
  def shuffleOrder(df: DataFrame, idCol: String, salt: String = "0",
      outCol: String = "shuffle_pos",
      materialize: Boolean = true): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' collides — rename one")
    val reserved = Seq("__graft_shuf", "__graft_one")
    require(reserved.forall(r => !df.columns.contains(r)),
      s"reserved columns $reserved present — rename them")
    val key = md5(concat(lit(salt), lit(":"),
      col(idCol).cast("string")).cast("binary"))
    PrefixScan.runningSumBy(
      df.withColumn("__graft_shuf", key).withColumn("__graft_one", lit(1L)),
      Seq(col("__graft_shuf"), col(idCol)), "__graft_one", outCol,
      materialize)
      .withColumn(outCol, col(outCol) - 1)
      .drop("__graft_shuf", "__graft_one")
  }

  /** Temperature-scaled mixture sampling (the mT5 / XLM-R / UniMax
    * family): derive the target mix FROM the data — sampling
    * probabilities ∝ n_k^α with α ∈ (0, 1] flattening the size
    * head — then downsample to the largest achievable total. Because
    * achievable fractions are invariant under scaling of the target
    * weights, the whole recipe collapses to the closed form
    * `f_k = (n_min / n_k)^(1−α)`: the smallest key binds at fraction
    * 1, larger keys shed mass toward it. α = 1 keeps everything
    * (identity mix); α → 0 approaches uniform counts per key.
    * Down-sampling only — no row is ever duplicated; null keys drop.
    *
    * Scale shape: one partial-aggregated count pass with |keys| rows
    * to the driver (keyCol must be LOW-cardinality — languages,
    * domains, sources; same contract as [[rebalanceToMix]]), then the
    * narrow no-shuffle md5-threshold filter of
    * [[stratifiedHashSample]] — a pure function of the data, so the
    * same sample falls out on any engine or partitioning. */
  def temperatureMix(df: DataFrame, idCol: String, keyCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.limit(0)
    val nMin = counts.values.min
    // FIXED operation order ((nmin / n) pow (1 − α)), mirrored by the
    // oracle twin so both engines derive identical thresholds
    val fractions = counts.map { case (k, n) =>
      k -> math.pow(nMin.toDouble / n.toDouble, 1.0 - alpha)
    }
    stratifiedHashSample(df, idCol, keyCol, fractions,
      defaultFraction = 0.0)
  }

  /** UniMax-style budget allocation (Chung et al. 2023,
    * arXiv:2304.09151, the epoch-capped uniform multilingual sampler,
    * here in its no-repetition form): distribute a total row `budget`
    * UNIFORMLY across keys, capped by each key's availability — the
    * classic water-filling: every key gets `min(n_k, τ)` rows where
    * the water level τ satisfies `Σ min(n_k, τ) = budget`. Small keys
    * are taken whole; the budget left over is split evenly among the
    * rest. (Repetition above 1 epoch is a trainer-side concern — this
    * operator selects distinct rows only.)
    *
    * Deterministic: τ falls out of integer prefix sums over keys
    * sorted by (n, key) — the driver computes it from the |keys|-row
    * count frame with the integer full-take test
    * `n_j·(m−j+1) ≤ budget − prefix_{j−1}` (no division), and the
    * fractional keys get `τ / n_k` in a FIXED double operation order
    * mirrored by the oracle twin. Selection is the narrow no-shuffle
    * md5-threshold filter. Same low-cardinality keyCol contract as
    * [[rebalanceToMix]]; null keys drop. If `budget ≥ Σ n_k`
    * everything is kept. */
  def unimaxMix(df: DataFrame, idCol: String, keyCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    if (counts.isEmpty) return df.limit(0)
    val sorted = counts.sortBy { case (k, n) => (n, k) }
    var remaining = budget
    var tau = -1.0
    val fractions = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (((k, n), idx) <- sorted.zipWithIndex) {
      val m = sorted.size - idx // keys not yet allocated, incl. this one
      if (tau < 0 && n * m <= remaining) {
        fractions(k) = 1.0
        remaining -= n
      } else {
        if (tau < 0) tau = remaining.toDouble / m
        fractions(k) = tau / n.toDouble
      }
    }
    stratifiedHashSample(df, idCol, keyCol, fractions.toMap,
      defaultFraction = 0.0)
  }

  /** Repetition-capped TOKEN-budget allocation — the data-constrained
    * mixing planner (Muennighoff et al. 2023, arXiv:2305.16264: past
    * ~4 epochs repeated data stops paying; so cap per-source epochs
    * and water-fill the rest): given per-key token counts n_k, a
    * total token `budget` T, and `maxEpochs` R, allocate
    * `alloc_k = min(R·n_k, τ)` where the water level τ satisfies
    * `Σ min(R·n_k, τ) = min(T, Σ R·n_k)` — [[unimaxMix]]'s closed
    * form with availability replaced by the repetition cap (UniMax is
    * exactly the R = 1 row-level case, applied as a sampler; this is
    * the PLANNER's report, epochs > 1 allowed). Returns one row per
    * key: (keyCol, n_tokens, cap_tokens, alloc_tokens, epochs,
    * capped), key order.
    *
    * Deterministic: τ falls out of integer prefix sums over keys
    * sorted by (cap, key) with the integer full-take test
    * `c_j·(m−j+1) ≤ T − prefix_{j−1}` (no division). The flag is
    * ONE-WAY by construction: a key is capped iff every key up to and
    * including it passed the test — a later key re-passing after a
    * failure must NOT cap (the water level is already below its cap);
    * the twin replays exactly that prefix-all-passed rule. Then ONE
    * double division `τ = remaining / m` bridged to decimal(18,9);
    * epochs = alloc/n in the same bridged order — the oracle twin
    * replays every step. If `budget ≥ Σ caps` every key is capped and
    * the leftover is the caller's signal to go find more data.
    *
    * Scale shape: one partial-aggregated token-count pass with |keys|
    * rows to the driver (keyCol must be LOW-cardinality — sources,
    * languages; the [[rebalanceToMix]] contract); everything after is
    * driver-side arithmetic on the registry-sized mix table. */
  def epochCappedAlloc(df: DataFrame, keyCol: String, tokenCol: String,
      budget: Long, maxEpochs: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val spark = df.sparkSession
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(sum(col(tokenCol).cast("long")).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val sorted = counts
      .map { case (k, n) => (k, n, maxEpochs * n) }
      .sortBy { case (k, _, c) => (c, k) }
    var remaining = budget
    var tau = -1.0
    val rows = sorted.zipWithIndex.map { case ((k, n, c), idx) =>
      val m = sorted.size - idx
      val (alloc, capped) =
        if (tau < 0 && c * m <= remaining) { remaining -= c; (c.toDouble, true) }
        else {
          if (tau < 0) tau = remaining.toDouble / m
          (tau, false)
        }
      org.apache.spark.sql.Row(k, n, c, alloc, capped)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField(keyCol, StringType),
        StructField("n_tokens", LongType),
        StructField("cap_tokens", LongType),
        StructField("__alloc", DoubleType),
        StructField("capped", BooleanType))))
      .withColumn("alloc_tokens",
        col("__alloc").cast("decimal(18,9)").cast("string").cast("double"))
      .withColumn("epochs",
        when(col("n_tokens") === 0L, 0.0).otherwise(
          (col("alloc_tokens") / col("n_tokens").cast("double"))
            .cast("decimal(18,9)").cast("string").cast("double")))
      .select(keyCol, "n_tokens", "cap_tokens", "alloc_tokens",
        "epochs", "capped")
      .orderBy(keyCol)
  }

  /** Deterministic STRATIFIED sampling — the "rebalance the language /
    * domain mix" curation primitive: each stratum keeps ≈ its fraction
    * of rows via a per-key md5 threshold (16-bit granularity, so
    * fractions are honored to ±1/65536). Like [[hashSample]] this is a
    * pure function of the data: same inputs → same sample on any
    * engine, any partitioning, any cluster size — unlike
    * `DataFrame.stat.sampleBy`, whose output moves with partition
    * layout. The key→threshold map compiles to a codegen'd map literal
    * lookup; narrow map, no shuffle.
    *
    * @param fractions       per-key keep fraction in [0, 1]
    * @param defaultFraction keep fraction for keys absent from the map
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    require(fractions.nonEmpty, "at least one stratum fraction")
    require((fractions.values ++ Seq(defaultFraction))
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0, 1]")
    val thrMap = map(fractions.toSeq.sortBy(_._1).flatMap {
      case (k, f) => Seq(lit(k), lit(thresholdHex(f)))
    }: _*)
    val thr = coalesce(element_at(thrMap, col(keyCol).cast("string")),
      lit(thresholdHex(defaultFraction)))
    df.filter(md5(col(idCol).cast("string").cast("binary")) < thr)
  }

  /** EXACT stratified quota sampling: per key keep exactly
    * `min(quota_k, n_k)` rows, chosen in md5(id) hash order (a pure
    * function of the data — reproducible on any engine, partitioning,
    * or cluster size) — the "exactly 10k eval docs per language" cut
    * where [[stratifiedHashSample]]'s fraction thresholds (±1/65536)
    * aren't a contract. Keys absent from `quotas` get `defaultQuota`.
    *
    * Scale shape: the per-key rank comes from
    * [[PrefixScan.runningSumByKey]] — the GROUPED two-phase scan, so
    * a hot stratum spans many partitions instead of serializing into
    * one `PARTITION BY` window task; the quota filter is a narrow map
    * over a broadcast-compiled map literal. */
  def quotaSample(df: DataFrame, idCol: String, keyCol: String,
      quotas: Map[String, Long], defaultQuota: Long = 0L,
      materialize: Boolean = true): DataFrame = {
    require(quotas.nonEmpty, "at least one stratum quota")
    require((quotas.values ++ Seq(defaultQuota)).forall(_ >= 0L),
      "quotas must be >= 0")
    val reserved = Seq("__graft_one", "__graft_h", "__graft_rank")
    require(reserved.forall(r => !df.columns.contains(r)),
      s"reserved columns $reserved present — rename them")
    val ranked = PrefixScan.runningSumByKey(
      df.withColumn("__graft_one", lit(1L))
        .withColumn("__graft_h",
          md5(col(idCol).cast("string").cast("binary"))),
      Seq(keyCol), Seq(col("__graft_h"), col(idCol)), "__graft_one",
      "__graft_rank", materialize)
    val qMap = map(quotas.toSeq.sortBy(_._1).flatMap {
      case (k, q) => Seq(lit(k), lit(q)) }: _*)
    val quota = coalesce(element_at(qMap, col(keyCol).cast("string")),
      lit(defaultQuota))
    ranked.filter(col("__graft_rank") <= quota)
      .drop("__graft_one", "__graft_h", "__graft_rank")
  }

  /** Systematic (every k-th) sampling under a TOTAL order: keep the
    * rows whose 1-based position in `orderBy` order satisfies
    * `(pos − 1) % every == offset` — the audit-sampling mode where a
    * reviewer wants a deterministic, evenly-spaced sweep of a sorted
    * population rather than a hash draw. Pass a unique tiebreaker in
    * `orderBy` for full determinism.
    *
    * Scale shape: positions come from [[PrefixScan.runningSumBy]]
    * (range-partitioned two-phase rank — never a global ROW_NUMBER
    * window), then one narrow modulo filter. */
  def systematicSample(df: DataFrame, orderBy: Seq[Column], every: Int,
      offset: Int = 0, materialize: Boolean = true): DataFrame = {
    require(every >= 1, "every must be >= 1")
    require(offset >= 0 && offset < every,
      s"offset must be in [0, $every)")
    val reserved = Seq("__graft_one", "__graft_pos")
    require(reserved.forall(r => !df.columns.contains(r)),
      s"reserved columns $reserved present — rename them")
    PrefixScan.runningSumBy(
      df.withColumn("__graft_one", lit(1L)),
      orderBy, "__graft_one", "__graft_pos", materialize)
      .where((col("__graft_pos") - 1L) % every === offset.toLong)
      .drop("__graft_one", "__graft_pos")
  }
}
