package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, max, min}

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

  test("z-order layout keeps per-file ranges tight on BOTH columns; " +
      "a lexicographic sort only on the leading one") {
    import spark.implicits._
    // two independent uniform columns — the case where a plain sort
    // cannot help the second column at all
    val rows = (0 until 4096).map { i =>
      val a = (i * 2654435761L % 1000).toInt
      val b = (i * 40503 % 1000).toInt
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString +
      "/z"
    val lexDir = java.nio.file.Files.createTempDirectory("graft-lex")
      .toString + "/lex"
    Lake.writeZordered(df, zDir, Seq("a", "b"), nFiles = 16)
    df.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .write.mode("overwrite").parquet(lexDir)
    def spans(dir: String, c: String): Seq[Long] =
      Lake.fileStats(spark, dir).collect().map(_.getString(0)).toSeq
        .map { f =>
          val r = spark.read.parquet(f).agg(min(c), max(c)).head
          r.getInt(1).toLong - r.getInt(0).toLong
        }
    // z-order: a 16-file split of an 8-bit × 8-bit z-space is ≈ a 4×4
    // grid — both columns span ≈ 1/4 of their range per TYPICAL file
    // (a file straddling a Morton discontinuity can span more, so the
    // guarantee is about the mean, not the worst file)
    def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    val zb = spans(zDir, "b")
    val za = spans(zDir, "a")
    assert(mean(za) < 600 && mean(zb) < 600,
      s"z-order files not tight: a ${mean(za)}, b ${mean(zb)}")
    // the lexicographic layout leaves column b unconstrained per file
    val lexB = spans(lexDir, "b")
    assert(mean(lexB) > 800, s"expected full-range b in lex layout: $lexB")
    // and the data survives intact
    assert(spark.read.parquet(zDir).orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // the point of the layout is SKIPPING: a selective range filter on
    // either z column must reach the parquet reader as a pushed filter
    // (row-group min/max pruning keys off exactly these), and a narrow
    // projection must shrink ReadSchema — a scan that reads every
    // column for a 2-column projection is wrong
    val scan = spark.read.parquet(zDir)
      .filter(col("b") >= 900).select("id", "b")
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(b), GreaterThanOrEqual(b,900)]"),
      s"range filter not pushed to the z-ordered scan:\n$scan")
    assert(scan.contains("ReadSchema") && !scan.contains("a:int"),
      s"projection not pruned to (id, b):\n$scan")
  }

  test("writeManifest records exact rows, schema, and file inventory; " +
      "manifest is excluded from its own stats") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-man")
      .toString + "/d"
    (1 to 123).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val p = Lake.writeManifest(spark, dir)
    // underscore-prefixed: Spark's own readers skip it as metadata —
    // read with plain IO
    def slurp(path: String): String = new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(
        new java.net.URI(path).getPath)), "UTF-8")
    val m = slurp(p)
    assert(m.contains("\"n_rows\": 123"))
    assert(m.contains("id BIGINT"))
    assert(m.contains("\"files\": ["))
    // re-running counts data files only (underscore files ignored), so
    // the manifest is stable under its own presence
    val m2 = slurp(Lake.writeManifest(spark, dir))
    def nFiles(s: String) =
      "\"n_files\": (\\d+)".r.findFirstMatchIn(s).get.group(1)
    assert(nFiles(m2) == nFiles(m))
    // and the parquet read still works untouched
    assert(spark.read.parquet(dir).count() == 123L)
  }

  test("compactTo refuses in-place rewrites") {
    val p = java.nio.file.Files.createTempDirectory("graft-lake-ip")
      .toString
    intercept[IllegalArgumentException] {
      Lake.compactTo(spark, p, p)
    }
  }
}
