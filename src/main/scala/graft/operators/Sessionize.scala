package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: rows of the same key
  * belong to one session while consecutive timestamps are within
  * `maxGap`; a larger gap starts a new session. The batch twin of
  * Structured Streaming's session windows, and the standard first step
  * of any clickstream/telemetry pipeline.
  *
  * Scale shape: ONE hash shuffle on the key plus a per-partition sort
  * (the window) — no self-join, no range join, no driver state. Skewed
  * keys (one bot user with 100M events) are the usual hazard; cap or
  * pre-split such keys upstream if present.
  */
object Sessionize {

  /** Append `session_idx` (0-based per key, in time order) and
    * `session_id` (key values + idx rendered as one string).
    *
    * @param tsCol  numeric event-time column (epoch nanos/millis —
    *               normalize timestamp columns with
    *               `graft.functions.TimeFunctions.epochNanos` first)
    * @param maxGap same unit as `tsCol`; gaps STRICTLY greater start a
    *               new session
    *
    * Ties on (key, ts) are session-stable: tied rows always land in
    * the same session, whatever their sort order, because a zero gap
    * never opens a boundary.
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
      maxGap: Long): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(maxGap > 0, "maxGap must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = when(col(tsCol) - lag(col(tsCol), 1).over(w) > maxGap, 1L)
      .otherwise(0L)
    df.withColumn("session_idx", sum(boundary).over(cum))
      .withColumn("session_id",
        concat_ws("#", (keyCols.map(col) :+ col("session_idx")): _*))
  }

  /** Per-session rollup: (key cols, session_idx, start, end, events). */
  def sessionStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
      maxGap: Long): DataFrame =
    sessionize(df, keyCols, tsCol, maxGap)
      .groupBy((keyCols :+ "session_idx").map(col): _*)
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
