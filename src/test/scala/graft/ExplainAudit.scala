package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of the headline queries for the
  * scale audit (shuffle count, pushdown, WindowGroupLimit, broadcast).
  * Run: sbt "Test/runMain graft.ExplainAudit" */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q1_agg", "q2_join_agg", "knn_top5", "knn_batch_join",
        "zeroshot_cosine", "exact_dedup", "minhash_neardup")) {
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
