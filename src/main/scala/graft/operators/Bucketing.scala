package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers (builder brief: "co-locate joins via
  * bucketing or pre-partitioning"). Writing both sides of a recurring
  * join bucketed by the join key into the same bucket count lets every
  * subsequent join run WITHOUT a shuffle: each task zips bucket i of A
  * with bucket i of B (SortMergeJoin over pre-hashed files). At 100 TB
  * that converts the nightly "join events to entities" from a full
  * 2×100 TB exchange into a scan — the shuffle is paid ONCE at layout
  * time and amortized over every later query.
  *
  * Spark-native mechanics: `bucketBy` is metadata on a catalog table
  * (hash(bucketCol) % n file layout + optional per-bucket sort), read
  * back with `spark.table`; Catalyst then plans joins/aggregations on
  * the bucket key with `Exchange`-free `outputPartitioning =
  * HashPartitioning(bucketCol, n)`.
  */
object Bucketing {

  /** Persist `df` as a bucketed catalog table (overwriting any prior
    * version). Sorting within buckets additionally removes the Sort
    * from later sort-merge joins on the key. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortWithinBuckets: Boolean = true): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a crashed previous run can leave an orphaned managed-table dir
    // the (fresh, in-memory) catalog no longer knows about; saveAsTable
    // refuses to reuse the location, so clear it explicitly
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc) && !spark.catalog.tableExists(table))
      fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortWithinBuckets) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Equi-join two tables previously written by [[writeBucketed]] with
    * the SAME key and bucket count — plans with zero Exchange on both
    * sides (verify with `.explain`: no "Exchange hashpartitioning"). */
  def coLocatedJoin(spark: SparkSession, tableA: String, tableB: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(tableA).join(spark.table(tableB), Seq(key), joinType)
}
