package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — with a bucketed plan instead of the
  * inequality-join cross product Spark would otherwise produce
  * (builder brief: "range join" as a missing-operator example).
  *
  * Mechanics: pick a bin width; every interval explodes to the bins it
  * spans, every point maps to its single bin; an EQUI-join on the bin
  * id meets each point only with intervals overlapping its bin, and an
  * exact containment filter finishes the job. A point lies in exactly
  * one bin, so no post-join dedup is needed. Shuffle volume is
  * O(points + intervals × spanBins) — choose `binWidth` near the
  * typical interval length so spanBins stays ~2.
  */
object RangeJoin {

  /** Join each point row to every interval row whose
    * `[loCol, hiCol]` (inclusive) contains `pointCol`.
    * Output = point columns + interval columns.
    *
    * @param binWidth bucketing width in the value's units; must
    *                 comfortably exceed 0 and be near the typical
    *                 interval length
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty,
      s"point/interval column collision: $overlap — alias before joining")
    val bin = "__graft_bin"
    val p = points.withColumn(bin,
      floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn(bin,
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, Seq(bin))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bin)
  }
}
