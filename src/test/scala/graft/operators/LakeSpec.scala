package graft.operators

import graft.SparkSpec

class LakeSpec extends SparkSpec {

  test("compactTo collapses a small-file swarm without losing rows") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-lake-src")
      .toString
    val dest = java.nio.file.Files.createTempDirectory("graft-lake")
      .toString + "/compacted"
    // 40 single-row files — the streaming-append pathology
    (1 to 40).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
      .repartition(40).write.mode("overwrite").parquet(src)
    val before = Lake.health(spark, src)
    // hash round-robin may leave some of the 40 partitions empty —
    // a couple dozen tiny files is swarm enough
    assert(before.nFiles >= 20, s"expected a swarm, got $before")
    assert(before.nSmall == before.nFiles)
    val planned = Lake.compactTo(spark, src, dest,
      targetBytesPerFile = 1L << 30)
    assert(planned == 1L)
    val after = Lake.health(spark, dest)
    assert(after.nFiles == 1L, s"still fragmented: $after")
    // same rows, byte-identical content
    val a = spark.read.parquet(src).orderBy("id").collect().toSeq
    val b = spark.read.parquet(dest).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("compactTo refuses in-place rewrites") {
    val p = java.nio.file.Files.createTempDirectory("graft-lake-ip")
      .toString
    intercept[IllegalArgumentException] {
      Lake.compactTo(spark, p, p)
    }
  }
}
