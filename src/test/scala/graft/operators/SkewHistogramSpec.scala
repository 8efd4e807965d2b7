package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("buckets are exact powers of two: count c lands in bucket " +
      "floor(log2 c)") {
    // keys with counts 1, 2, 3, 4, 7, 8, 1000
    val rows = Seq("a" -> 1, "b" -> 2, "c" -> 3, "d" -> 4, "e" -> 7,
      "f" -> 8, "g" -> 1000).flatMap { case (k, n) => Seq.fill(n)(k) }
    val got = Profile.skewHistogram(rows.toDF("k"), Seq("k"))
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("lo"), r.getAs[Long]("n_keys"),
          r.getAs[Long]("n_rows"))).toMap
    assert(got(0L) === ((1L, 1L, 1L)))        // a
    assert(got(1L) === ((2L, 2L, 5L)))        // b, c
    assert(got(2L) === ((4L, 2L, 11L)))       // d, e
    assert(got(3L) === ((8L, 1L, 8L)))        // f
    assert(got(9L) === ((512L, 1L, 1000L)))   // g: 512 <= 1000 < 1024
    assert(got.values.map(_._3).sum === rows.size.toLong)
  }

  test("null keys count as one group; multi-column keys work") {
    val df = Seq((Some("a"), 1), (Some("a"), 1), (None, 2), (None, 2))
      .toDF("k", "sub")
    val one = Profile.skewHistogram(df, Seq("k", "sub"))
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_keys"))
      .toMap
    // (a,1) has 2 rows -> bucket 1; (null,2) has 2 rows -> bucket 1
    assert(one === Map(1L -> 2L))
  }

  test("a skewed key surfaces in a high bucket a uniform frame never " +
      "occupies") {
    val uniform = (0 until 1024).map(i => s"k${i % 256}").toDF("k")
    val skewed = uniform.union(Seq.fill(5000)("hot").toDF("k"))
    val hiU = Profile.skewHistogram(uniform, Seq("k"))
      .agg(max("bucket")).head().getLong(0)
    val hiS = Profile.skewHistogram(skewed, Seq("k"))
      .agg(max("bucket")).head().getLong(0)
    assert(hiU === 2L)  // 4 rows per key
    assert(hiS === 12L) // 5000 -> 4096 <= c < 8192
  }
}
