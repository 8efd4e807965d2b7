package graft

import org.apache.spark.sql.SparkSession

/** Replays the driver's flagship smoke: SparkEntry.entry must return
  * rows. Run: sbt "Test/runMain graft.EntryCheck" */
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = SparkEntry.entry(spark)
    val n = res.count()
    res.show(false)
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
