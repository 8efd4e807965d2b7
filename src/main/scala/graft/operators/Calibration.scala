package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score-calibration diagnostics (reliability table + expected
  * calibration error, Naeini et al. AAAI 2015 / Guo et al. ICML
  * 2017): before a pipeline TRUSTS a classifier score — a quality
  * model gating documents, a fasttext-style lang-ID confidence, a
  * dedup-verifier probability — it needs to know whether "0.9" means
  * 90%. The reliability table bins predictions by confidence and
  * compares each bin's mean confidence against its observed label
  * rate; ECE is the row-weighted absolute gap.
  *
  * Scale shape: one narrow bin projection (no UDF), one grouped
  * aggregate (map-side partial sums — bins-sized output), ECE one
  * broadcast 1-row total cross. Means go through the repo's
  * decimal(18,12)-quantized exact-sum + decimal(18,9) bridge, so
  * every emitted double is bit-stable cross-engine.
  */
object Calibration {

  /** Per-bin reliability rows: equal-width bins over [0, 1] by
    * `floor(score·bins)` (score 1.0 clamps into the last bin), per
    * bin the row count, mean confidence (`conf`), observed label
    * rate (`acc`), and the signed gap `acc − conf`. Rows with null
    * score or label are dropped (they carry no calibration signal —
    * count them upstream). Empty bins are absent (their weight in
    * ECE is zero). `labelCol` must be 0/1-valued. */
  def reliabilityBins(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    checkReserved(Seq(scoreCol, labelCol),
      Seq("bin", "__s", "__l", "n", "conf", "acc", "gap"))
    val score = col(scoreCol).cast("double")
    val label = col(labelCol).cast("long")
    def bridged(sumCol: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =
      (sumCol.cast("double") / n.cast("double"))
        .cast("decimal(18,9)").cast("double")
    df.where(score.isNotNull && label.isNotNull)
      .select(
        least(floor(score * bins).cast("int"), lit(bins - 1)).as("bin"),
        score.cast("decimal(18,12)").as("__s"), label.as("__l"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("__s").as("__ss"), sum("__l").cast("long").as("__sl"))
      .select(col("bin"), col("n"),
        bridged(col("__ss"), col("n")).as("conf"),
        bridged(col("__sl"), col("n")).as("acc"),
        (bridged(col("__sl"), col("n"))
          - bridged(col("__ss"), col("n"))).as("gap"))
  }

  /** EXACT grouped ROC-AUC via the rank-sum (Mann–Whitney) identity
    * with average-rank tie handling — the discrimination-side read
    * next to [[reliabilityBins]]'s calibration: AUC =
    * (2·ΣR₊ − n₊(n₊+1)) / (2·n₊·n₋), where ΣR₊ sums positives'
    * average ranks under ascending score order. Everything up to the
    * final single division is exact longs: per (key, score) counts,
    * cumulative counts via the grouped two-phase scan
    * ([[PrefixScan.runningSumByKey]] — no PARTITION BY window, hot
    * keys safe), and each tie group contributes
    * n₊·(2·below + n + 1) = 2·Σ(average ranks of its positives).
    *
    * Returns (keyCols..., n, n_pos, auc) — auc null when a key has no
    * positives or no negatives (undefined, not 0.5). Empty `keyCols`
    * computes one global row. Long-exactness holds to ~10⁹ rows per
    * key (2·ΣR₊ < 2n²). */
  def aucByKey(df: DataFrame, keyCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    checkReserved(keyCols :+ scoreCol :+ labelCol,
      Seq("__s", "__l", "__n", "__np", "__cum", "__contrib", "__allk",
        "n", "n_pos", "auc"))
    val keys = if (keyCols.nonEmpty) keyCols else Seq("__allk")
    val base0 = df.where(col(scoreCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s") +:
        col(labelCol).cast("long").as("__l") +: keyCols.map(col): _*)
    val base = if (keyCols.nonEmpty) base0
      else base0.withColumn("__allk", lit(1))
    val byScore = base.groupBy(keys.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).cast("long").as("__n"),
        sum("__l").cast("long").as("__np"))
    val scanned = PrefixScan.runningSumByKey(byScore, keys,
      Seq(col("__s").asc), "__n", outCol = "__cum")
    val perKey = scanned
      .withColumn("__contrib",
        col("__np") * (lit(2L) * (col("__cum") - col("__n"))
          + col("__n") + 1L))
      .groupBy(keys.map(col): _*)
      .agg(sum("__contrib").cast("long").as("__two_sum"),
        sum("__np").cast("long").as("n_pos"),
        sum("__n").cast("long").as("n"))
    val out = perKey.select(keys.map(col) :+ col("n") :+ col("n_pos") :+
      when(col("n_pos") > 0L && col("n") > col("n_pos"),
        (col("__two_sum") - col("n_pos") * (col("n_pos") + 1L))
          .cast("double")
          / (lit(2L) * col("n_pos") * (col("n") - col("n_pos")))
            .cast("double"))
        .as("auc"): _*)
    if (keyCols.nonEmpty) out else out.drop("__allk")
  }

  /** Precision/recall sweep over every distinct score threshold
    * (predict positive iff score ≥ t): per (key, t) the exact
    * TP/FP/FN and single-division precision/recall — the
    * operating-point table read next to [[aucByKey]]'s scalar.
    * Cumulatives via the grouped scan under DESCENDING score order
    * (two passes, one per counter — the scan carries one long).
    * Output rows per key = distinct scores; quantize dense float
    * scores upstream if that bound matters. */
  def prCurveByKey(df: DataFrame, keyCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    checkReserved(keyCols :+ scoreCol :+ labelCol,
      Seq("threshold", "__l", "__n", "__np", "__cum", "__cump",
        "__tpos", "__allk", "tp", "fp", "fn", "precision", "recall"))
    val keys = if (keyCols.nonEmpty) keyCols else Seq("__allk")
    val base0 = df.where(col(scoreCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("threshold") +:
        col(labelCol).cast("long").as("__l") +: keyCols.map(col): _*)
    val base = if (keyCols.nonEmpty) base0
      else base0.withColumn("__allk", lit(1))
    val byScore = base.groupBy(keys.map(col) :+ col("threshold"): _*)
      .agg(count(lit(1)).cast("long").as("__n"),
        sum("__l").cast("long").as("__np"))
    val c1 = PrefixScan.runningSumByKey(byScore, keys,
      Seq(col("threshold").desc), "__n", outCol = "__cum")
    val c2 = PrefixScan.runningSumByKey(c1, keys,
      Seq(col("threshold").desc), "__np", outCol = "__cump")
    val tot = byScore.groupBy(keys.map(col): _*)
      .agg(sum("__np").cast("long").as("__tpos"))
    val out = c2.join(tot, keys)
      .select(keys.map(col) :+ col("threshold") :+
        col("__cump").as("tp") :+
        (col("__cum") - col("__cump")).as("fp") :+
        (col("__tpos") - col("__cump")).as("fn") :+
        (col("__cump").cast("double") / col("__cum").cast("double"))
          .as("precision") :+
        when(col("__tpos") > 0L,
          col("__cump").cast("double") / col("__tpos").cast("double"))
          .as("recall"): _*)
    if (keyCols.nonEmpty) out else out.drop("__allk")
  }

  /** Expected calibration error over [[reliabilityBins]]: one row,
    * `ece = Σ_b (n_b/N)·|acc_b − conf_b|`, plus N and the max
    * absolute bin gap (MCE). The per-bin |gap| and the weighted sum
    * both run through the decimal bridge. */
  def ece(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    val b = reliabilityBins(df, scoreCol, labelCol, bins)
    val tot = b.agg(sum("n").cast("long").as("__N"))
    b.crossJoin(broadcast(tot))
      .select(col("__N"),
        // decimal(19,0): the product type is decimal(18+19+1=38,12) —
        // exactly at Spark's 38-digit cap with NO precision loss; a
        // (20,0) count made it decimal(38,11) with HALF_UP rounding,
        // silently diverging from DuckDB's exact DECIMAL(38,12) the
        // moment the bridge scale exceeds 11
        (abs(col("gap")).cast("decimal(18,12)")
          * col("n").cast("decimal(19,0)")).as("__w"),
        abs(col("gap")).as("__g"))
      .groupBy("__N")
      .agg(sum("__w").as("__sw"), max("__g").as("mce"))
      .select(col("__N").as("n"),
        (col("__sw").cast("double") / col("__N").cast("double"))
          .cast("decimal(18,9)").cast("double").as("ece"),
        col("mce").cast("decimal(18,9)").cast("double").as("mce"))
  }

  /** Reject input column names that collide with the operator's
    * internal working columns or output schema — a keyCol named
    * `threshold` or a scoreCol named `__s` would otherwise produce
    * ambiguous-reference errors or silently wrong columns deep inside
    * the plan (the CorpusSketch.minhashSketchByKey convention). */
  private def checkReserved(inputs: Seq[String],
      reserved: Seq[String]): Unit = {
    val hit = inputs.filter(reserved.contains)
    require(hit.isEmpty,
      s"input column name(s) ${hit.mkString(", ")} collide with " +
        s"reserved internal/output columns $reserved — rename upstream")
  }
}
