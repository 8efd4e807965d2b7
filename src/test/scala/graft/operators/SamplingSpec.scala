package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("capPerKey keeps the first n rows per key by the given order") {
    import spark.implicits._
    val df = Seq(("en", 3L), ("en", 1L), ("en", 2L), ("fr", 9L), ("fr", 8L))
      .toDF("lang", "id")
    val out = Sampling.capPerKey(df, Seq("lang"), Seq("id"), n = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("en", 1L), ("en", 2L), ("fr", 8L), ("fr", 9L)))
  }

  test("hashSample is deterministic, partitioning-independent, ~fraction-sized") {
    import spark.implicits._
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, "id", "28").collect()
      .map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(13), "id", "28").collect()
      .map(_.getLong(0)).toSet
    assert(a == b) // same rows whatever the partitioning
    val frac = a.size.toDouble / 10000
    assert(frac > 0.12 && frac < 0.20, s"fraction $frac vs expected ~0.156")
  }

  test("hashSample rejects non-hex thresholds") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Sampling.hashSample(Seq(1).toDF("id"), "id", "ZZ")
    }
  }
}
