package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  // 1-D embeddings on a line make nearest-neighbor sets hand-checkable
  private def lineCorpus = Seq(
    (0L, Array(0.0f, 1.0f)),
    (1L, Array(1.0f, 1.0f)),
    (2L, Array(2.0f, 1.0f)),
    (3L, Array(10.0f, 1.0f)),
    (4L, Array(11.0f, 1.0f))).toDF("id", "vec")

  private val oneCell = Array(Array(0.0f, 0.0f)) // everything co-cells

  test("knnEdges: per-node nearest in-cell neighbors under squared " +
      "L2, rank and tie-break hand-checked") {
    val edges = KnnGraph.knnEdgesWithCentroids(lineCorpus, "id", "vec",
      oneCell, k = 2, metric = Metric.SquaredL2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .toSet
    // node 0 at x=0: nearest 1 (d=1) then 2 (d=4)
    assert(edges.contains((0L, 1L, 1)) && edges.contains((0L, 2L, 2)))
    // node 1 at x=1: 0 and 2 tie at d=1 → dst asc puts 0 first
    assert(edges.contains((1L, 0L, 1)) && edges.contains((1L, 2L, 2)))
    // node 3 at x=10: nearest 4 (d=1) then 2 (d=64)
    assert(edges.contains((3L, 4L, 1)) && edges.contains((3L, 2L, 2)))
    assert(edges.size == 10, s"every node gets exactly k=2 edges: $edges")
  }

  test("mutualKnn keeps only reciprocal edges: an isolated hub-leaf " +
      "asymmetry is filtered out") {
    // k=1: 0↔1 mutual (each other's nearest); 2's nearest is 1 but
    // 1's nearest is 0 → edge (1,2) must NOT survive; 3↔4 mutual
    val mutual = KnnGraph.mutualKnnWithCentroids(lineCorpus, "id", "vec",
      oneCell, k = 1, metric = Metric.SquaredL2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutual == Set((0L, 1L), (3L, 4L)), s"got $mutual")
  }

  test("mutualKnn scores carry the metric value and idA < idB") {
    val out = KnnGraph.mutualKnnWithCentroids(lineCorpus, "id", "vec",
      oneCell, k = 2, metric = Metric.SquaredL2).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    val m = out.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(m((0L, 1L)) == 1.0 && m((3L, 4L)) == 1.0)
  }

  test("cells partition the candidate space: cross-cell pairs never " +
      "meet, co-assigned near-identicals always do") {
    val cents = Array(Array(0.0f, 1.0f), Array(10.0f, 1.0f))
    val mutual = KnnGraph.mutualKnnWithCentroids(lineCorpus, "id", "vec",
      cents, k = 4, metric = Metric.SquaredL2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cell A = {0,1,2}, cell B = {3,4}; with k=4 every in-cell pair is
    // mutual, and no pair crosses cells
    assert(mutual == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
  }

  test("hot cells above maxCellSize are dropped whole") {
    val out = KnnGraph.mutualKnnWithCentroids(lineCorpus, "id", "vec",
      oneCell, k = 2, metric = Metric.SquaredL2, maxCellSize = 4)
    assert(out.count() == 0L)
  }

  test("edge set is partitioning-independent") {
    val a = KnnGraph.mutualKnnWithCentroids(lineCorpus.repartition(1),
      "id", "vec", oneCell, k = 2, metric = Metric.SquaredL2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KnnGraph.mutualKnnWithCentroids(lineCorpus.repartition(7),
      "id", "vec", oneCell, k = 2, metric = Metric.SquaredL2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("cosine metric ranks descending: mutual top-1 under cosine " +
      "pairs the direction-aligned vectors") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.1f, 0.9f))).toDF("id", "vec")
    val mutual = KnnGraph.mutualKnnWithCentroids(df, "id", "vec",
      oneCell, k = 1, metric = Metric.Cosine)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutual == Set((0L, 1L), (2L, 3L)), s"got $mutual")
  }
}
