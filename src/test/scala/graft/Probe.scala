package graft

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostics for bench tuning. Run:
  * sbt "Test/runMain graft.Probe" */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = if (args.nonEmpty) args(0) else "winsorized_values"
    val out = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    out.show(30, false)
    println("PROBE_ROWS=" + out.count())
    spark.stop()
  }
}
