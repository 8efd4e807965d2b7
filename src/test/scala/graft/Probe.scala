package graft

import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostics for bench tuning. Run:
  * sbt "Test/runMain graft.Probe" */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // exact_dedup stages
    time("scan only")(docs.select("doc_id").count())
    val keyed = docs.withColumn("key",
      array_join(slice(tokens(col("text")), 1, 3), " "))
    time("key compute")(keyed.select(sum(length(col("key")))).head)
    time("full exact_dedup")(
      Dedup.exactFirstWins(keyed, Seq("key"), Seq("doc_id")).count())

    val base = docs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 64))
    time("signatures")(base.select(sum(element_at(col("sig"), 1))).head)

    val banded = base.select(col("doc_id"),
      posexplode(Dedup.minhashBands(col("sig"), 16, 4)).as(Seq("b", "bh")))
    time("bands")(banded.count())
    val sizes = banded.groupBy("b", "bh").count()
    println("bucket size dist:")
    time("bucket stats")(
      sizes.groupBy("count").count().orderBy(desc("count")).show(10))
    val cand = time("candidates") {
      val a = banded.select(col("b"), col("bh"), col("doc_id").as("idA"))
      val bb = banded.select(col("b"), col("bh"), col("doc_id").as("idB"))
      a.join(bb, Seq("b", "bh")).filter(col("idA") < col("idB")).count()
    }
    println(s"candidate band-pairs: $cand")

    // connected components at scale: 100k-edge graph of 10k-node chains
    // (worst case for label propagation, fine for star contraction)
    import spark.implicits._
    val chains = spark.range(100000)
      .select(col("id").as("idA"), (col("id") + 1).as("idB"))
      .filter((col("id") + 1) % 10000 =!= 0)
    time("CC 100k-edge chains") {
      val comp = Dedup.connectedComponents(chains.toDF(), "idA", "idB")
      println("components: " + comp.select("component").distinct().count())
    }
    spark.stop()
  }
}
