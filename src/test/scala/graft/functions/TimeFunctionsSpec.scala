package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `TimeFunctions.epochNanos` must yield the SAME epoch-nanos longs for
  * every physical layout the events table has shipped in across
  * testdata regenerations: raw INT64 nanos, TIMESTAMP(MICROS)
  * timezone-adjusted (Spark `timestamp`), and TIMESTAMP(MICROS) naive
  * (Spark `timestamp_ntz`). The fixtures below round-trip each layout
  * through parquet so the test pins the *reader* types, not just
  * in-memory casts — the r7 breakage was exactly a silent reader-type
  * drift. */
class TimeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // three instants, micros precision (what TIMESTAMP(MICROS) can hold)
  private val micros = Seq(0L, 1500000000000123L, 1700000000999999L)
  private val wantNanos = micros.map(_ * 1000L)

  private def roundTrip(df: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("graft-timefn").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def nanosOf(df: DataFrame): Seq[Long] =
    TimeFunctions.epochNanos(df, "ts")
      .orderBy("ts").select("ts").as[Long].collect().toSeq

  test("long (raw nanos) passes through untouched") {
    val df = roundTrip(wantNanos.toDF("ts"))
    assert(df.schema("ts").dataType === LongType)
    assert(nanosOf(df) === wantNanos)
  }

  test("timestamp (TIMESTAMP MICROS, utc-adjusted) converts to nanos") {
    val df = roundTrip(
      micros.toDF("us").select(timestamp_micros(col("us")).as("ts")))
    assert(df.schema("ts").dataType === TimestampType)
    assert(nanosOf(df) === wantNanos)
  }

  test("timestamp_ntz (TIMESTAMP MICROS, naive) converts to nanos " +
      "under the UTC session") {
    val df = roundTrip(
      micros.toDF("us").select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(nanosOf(df) === wantNanos)
  }

  test("the live testdata events.ts normalizes to longs no matter its " +
      "current layout") {
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    val out = TimeFunctions.epochNanos(ev, "ts")
    assert(out.schema("ts").dataType === LongType)
    // column order is preserved in place
    assert(out.columns.toSeq === ev.columns.toSeq)
    assert(out.where(col("ts").isNotNull).count() > 0)
  }

  test("unsupported types are rejected loudly") {
    val df = Seq("x").toDF("ts")
    intercept[IllegalArgumentException] {
      TimeFunctions.epochNanos(df, "ts")
    }
  }
}
