package graft.operators

import graft.SparkSpec

/** Greedy k-center selection: hand-checked trajectory, tie-breaks,
  * early exhaustion, and partitioning-independence. */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private val pts = Seq(
    (1L, Array(0f, 0f)),
    (2L, Array(1f, 0f)),
    (3L, Array(10f, 0f)),
    (4L, Array(0f, 6f)),
    (5L, Array(10f, 1f))).toDF("id", "vec")

  test("hand-checked trajectory: seed = min id, then farthest-first " +
      "with radii, ties broken by smaller id") {
    // seed 1 (0,0). dists: 2->1, 3->100, 4->36, 5->101 => pick 5 (101)
    // min-dists to {1,5}: 2->1, 3->min(100,1)=1, 4->min(36,125)=36
    //   => pick 4 (36)
    // min-dists to {1,5,4}: 2->min(1,..)=1, 3->1 => TIE at 1 => pick 2
    val got = Coreset.kCenterGreedy(pts, "vec", "id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, -1.0), (2L, 5L, 101.0), (3L, 4L, 36.0), (4L, 2L, 1.0)))
  }

  test("k >= n returns every row then stops; empty input returns an " +
      "empty frame with the right schema") {
    assert(Coreset.kCenterGreedy(pts, "vec", "id", k = 99)
      .count() === 5L)
    val empty = Coreset.kCenterGreedy(pts.limit(0), "vec", "id", k = 3)
    assert(empty.columns.toSeq === Seq("round", "id", "radius"))
    assert(empty.count() === 0L)
  }

  test("rejects non-float vectors and cluster-scale k with pointed " +
      "errors (a double vector used to surface as an opaque " +
      "ClassCastException mid-round)") {
    val dbl = Seq((1L, Array(0.0, 1.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(dbl, "vec", "id", 1)
    }
    assert(e.getMessage.contains("array<float>"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(pts, "vec", "id", 513)
    }
    assert(e2.getMessage.contains("512"), e2.getMessage)
  }

  test("selection is partitioning-independent") {
    val a = Coreset.kCenterGreedy(pts.repartition(7), "vec", "id", 4)
      .collect().map(_.toString).toSeq
    val b = Coreset.kCenterGreedy(pts.coalesce(1), "vec", "id", 4)
      .collect().map(_.toString).toSeq
    assert(a === b)
  }
}
