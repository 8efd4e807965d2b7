package graft.operators

import graft.SparkSpec

/** Brute-force cross-checks for MERGE INTO and densification on
  * seeded random tables (same rationale as FunnelPropertySpec). */
class LakePropertySpec extends SparkSpec {
  import spark.implicits._

  test("merge equals brute-force set algebra on random tables (3 seeds)") {
    for (seed <- Seq(11L, 52L, 93L)) {
      val rnd = new scala.util.Random(seed)
      // unique-key target; source with updates, inserts, delete flags
      val target = (0 until 50)
        .map(k => (k.toLong, s"t$k", rnd.nextInt(100).toLong))
      val source = (0 until 70).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, s"s$k", rnd.nextInt(100).toLong))
      val delMod = 1 + rnd.nextInt(5)
      val got = Lake.merge(
        target.toDF("id", "name", "v"), source.toDF("id", "name", "v"),
        Seq("id"),
        deleteWhen = Some(org.apache.spark.sql.functions.col("id") %
          delMod === 0))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val srcKeys = source.map(_._1).toSet
      val tgtKeys = target.map(_._1).toSet
      val want =
        target.filterNot(t => srcKeys(t._1)).toSet ++          // untouched
        source.filter(s => tgtKeys(s._1) && s._1 % delMod != 0)
          .toSet ++                                            // updates
        source.filterNot(s => tgtKeys(s._1)).toSet             // inserts
      assert(got === want, s"seed=$seed delMod=$delMod")
    }
  }

  test("densify equals the brute-force matrix on random series (3 seeds)") {
    for (seed <- Seq(21L, 62L, 103L)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 200).map(_ =>
        (s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
      val got = TimeWindows.densify(rows.toDF("key", "ts"), "ts",
        Seq("key"), bucketNs = 50L)
        .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
        .toMap
      val bucketed = rows.map { case (k, t) => (k, t / 50L) }
      val lo = bucketed.map(_._2).min
      val hi = bucketed.map(_._2).max
      val keys = bucketed.map(_._1).distinct
      val counts = bucketed.groupBy(identity)
        .map { case ((k, b), v) => (b, k) -> v.size.toLong }
      val want = (for (k <- keys; b <- lo to hi)
        yield (b, k) -> counts.getOrElse((b, k), 0L)).toMap
      assert(got === want, s"seed=$seed")
    }
  }
}
