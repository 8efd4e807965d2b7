package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time normalization: every graft event-time operator
  * (`TimeWindows`, `Sessionize`, `AsOfJoin`, `StreamIngest` batch
  * twins) computes in epoch-NANOS longs, but the physical column a
  * source hands us depends on how the parquet was written:
  *
  *  - `INT64` raw nanos (the original testdata layout, read as long,
  *    or TIMESTAMP(NANOS) read as long via
  *    `spark.sql.legacy.parquet.nanosAsLong=true`),
  *  - `TIMESTAMP(MICROS, adjusted=true)` → Spark `TimestampType`,
  *  - `TIMESTAMP(MICROS, adjusted=false)` → Spark `TimestampNTZType`
  *    (the regenerated-testdata layout).
  *
  * These helpers make loading type-adaptive so a testdata or upstream
  * schema change can never silently break the operators again: call
  * `epochNanos` at the registration/ingest layer and the operator code
  * stays pure integer arithmetic.
  *
  * NTZ handling assumes the session timezone is UTC (all graft
  * entrypoints set `spark.sql.session.timeZone=UTC`), under which the
  * NTZ→TZ cast is a wall-clock identity — the same convention the
  * DuckDB oracles use (`epoch_ns(ts)` on a naive timestamp).
  */
object TimeFunctions {

  /** Epoch-nanos expression for an event-time column of physical type
    * long/int (already nanos), timestamp, or timestamp_ntz. */
  def epochNanosCol(c: Column, dt: DataType): Column = dt match {
    case LongType                => c
    case IntegerType             => c.cast(LongType)
    case TimestampType           => unix_micros(c) * lit(1000L)
    case _: TimestampNTZType     =>
      // NTZ → TZ is identity wall-clock under the UTC session TZ
      unix_micros(c.cast(TimestampType)) * lit(1000L)
    case other =>
      throw new IllegalArgumentException(
        s"cannot interpret ${other.simpleString} as event-time nanos " +
          "(expected long, int, timestamp, or timestamp_ntz)")
  }

  /** Normalize `tsCol` in place to epoch-nanos long, whatever its
    * physical type. A pure narrow projection — no shuffle, prunes away
    * entirely if the column goes unused downstream. */
  def epochNanos(df: DataFrame, tsCol: String): DataFrame = {
    val dt = df.schema(tsCol).dataType
    if (dt == LongType) df
    else df.withColumn(tsCol, epochNanosCol(col(tsCol), dt))
  }
}
