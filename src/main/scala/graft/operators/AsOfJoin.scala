package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward-looking temporal) join — the canonical "operator
  * Spark lacks" (builder brief): for each left row, the single right
  * row with the greatest right timestamp ≤ the left timestamp within
  * the same key.
  *
  * Spark-first shape: NOT an inequality join (which plans as a
  * per-key cross product and explodes at scale). Instead tag + union +
  * running last-non-null:
  *
  *   1. union left and right rows into one stream of (key, ts, src);
  *   2. one sort-shuffle on (key, ts, src) — right rows sort BEFORE
  *      left rows at equal ts so equal timestamps match;
  *   3. a running `last(struct-of-right-values, ignoreNulls)` window
  *      gives every left row the most recent right row at O(n log n).
  *
  * The right payload travels as ONE struct so all attached columns
  * come from the same right row. Ties on the right timestamp are
  * broken by `rightTieCol` — the greatest value wins,
  * deterministically.
  */
object AsOfJoin {

  /** Left as-of join. Output = all left columns + the right value
    * columns (null when no right row precedes the left row).
    *
    * @param keyCols     equi-join keys present in BOTH frames
    * @param leftTsCol   left event-time column (numeric or timestamp)
    * @param rightTsCol  right event-time column (same type/scale)
    * @param valueCols   right columns to attach (must not collide with
    *                    left columns; non-null rows recommended)
    * @param rightTieCol deterministic tiebreak among right rows with
    *                    equal (key, ts) — greatest wins
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String, valueCols: Seq[String],
      rightTieCol: String): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keys and values required")
    valueCols.foreach(v => require(!left.columns.contains(v),
      s"right value column '$v' collides with a left column"))

    val ts = "__graft_ts"
    val src = "__graft_src" // 0 = right, 1 = left (right first at equal ts)
    val tie = "__graft_tie"
    val payload = "__graft_payload"

    // null timestamps have no position on the time axis: a null right
    // ts would sort nulls-first and act as an "earlier than everything"
    // match for the whole key; a null left ts would always miss. Both
    // are dropped up front.
    val left0 = left.filter(col(leftTsCol).isNotNull)
    val right0 = right.filter(col(rightTsCol).isNotNull)

    val r = right0.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as(ts), lit(0).as(src), col(rightTieCol).as(tie),
        struct(valueCols.map(col): _*).as(payload)): _*)
    val leftCols = left.columns.toSeq
    val l = left0.select(
      leftCols.map(col) ++ Seq(
        col(leftTsCol).as(ts), lit(1).as(src),
        lit(null).cast(r.schema(tie).dataType).as(tie),
        lit(null).cast(r.schema(payload).dataType).as(payload)): _*)
    val unioned = l.unionByName(
      r.select((keyCols ++ leftCols.filterNot(keyCols.contains))
        .map(c => if (keyCols.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(ts), col(src), col(tie), col(payload)): _*))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ts).asc, col(src).asc, col(tie).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = unioned
      .withColumn("__graft_match", last(col(payload), ignoreNulls = true).over(w))
      .filter(col(src) === 1)
    valueCols.foldLeft(attached) { (d, v) =>
      d.withColumn(v, col(s"__graft_match.$v"))
    }.select((leftCols ++ valueCols).map(col): _*)
  }
}
