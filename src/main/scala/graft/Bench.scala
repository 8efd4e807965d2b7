package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the alphabetically-first query doesn't
    // absorb ~4s of classloading; touches no benchmark data.
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 100)")
      .collect()
    // A failed query must NOT silently record a timing (round-1 defect:
    // errors were swallowed into -1L counts). Failures are excluded
    // from `queries`/total and reported in `errors`.
    // Each query runs twice and reports the min: the first run absorbs
    // per-query codegen + parquet-footer first-touch costs that at toy
    // scale dominate the actual operator time and made round-over-round
    // numbers swing ~2x.
    val runs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            Left(e.getClass.getSimpleName)
        }
      }
      // two independent runs; any success counts (a transient failure
      // on one run must neither discard the other run's valid timing
      // nor skip the retry)
      val results = Seq(once(), once())
      val successes = results.collect { case Right(t) => t }
      val best: Either[String, Double] =
        if (successes.nonEmpty) Right(successes.min)
        else results.head
      (name, best)
    }
    val ok = runs.collect { case (n, Right(sec)) => n -> sec }
    val failed = runs.collect { case (n, Left(err)) => n -> err }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
