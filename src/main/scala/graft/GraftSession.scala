package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for this engine at scale —
  * spill-aware sizing and runtime re-planning (builder brief: AQE for
  * skew, partitions sized to executor memory).
  *
  * Local harness runs pass explicit master/partitions; production
  * clusters get AQE coalescing + skew-join splitting so shuffle
  * partition counts self-tune between the static default and the data.
  */
object GraftSession {

  /** Apply engine-recommended configs to a builder. */
  def tuned(builder: SparkSession.Builder,
      shufflePartitions: Int = 200): SparkSession.Builder =
    builder
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // 128 MB scan splits: big enough to amortize task overhead,
      // small enough that a row-group plus shuffle state fits typical
      // executor memory at 100 TB inputs
      .config("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
      // timestamp nanos appear in event feeds (TESTDATA events table)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    tuned(SparkSession.builder().master(s"local[$cores]"),
      shufflePartitions = cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
