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
        (abs(col("gap")).cast("decimal(18,12)")
          * col("n").cast("decimal(20,0)")).as("__w"),
        abs(col("gap")).as("__g"))
      .groupBy("__N")
      .agg(sum("__w").as("__sw"), max("__g").as("mce"))
      .select(col("__N").as("n"),
        (col("__sw").cast("double") / col("__N").cast("double"))
          .cast("decimal(18,9)").cast("double").as("ece"),
        col("mce").cast("decimal(18,9)").cast("double").as("mce"))
  }
}
