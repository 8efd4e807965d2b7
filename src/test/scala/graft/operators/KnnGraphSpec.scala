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

  test("mutualFromEdges over a stored edge frame equals the composed " +
      "operator, and one-directional edges never pair") {
    // the stored-graph entry point must be definitionally equal to
    // mutualKnnWithCentroids (the registry shares one persisted edge
    // artifact across consumers on the strength of this identity)
    val edges = KnnGraph.knnEdgesWithCentroids(lineCorpus, "id", "vec",
      oneCell, k = 2, metric = Metric.SquaredL2)
    val viaStored = KnnGraph.mutualFromEdges(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val composed = KnnGraph.mutualKnnWithCentroids(lineCorpus, "id",
      "vec", oneCell, k = 2, metric = Metric.SquaredL2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(viaStored == composed)
    // a strictly one-directional edge frame has no reciprocal pair
    val oneWay = Seq((0L, 1L, 0.5), (1L, 2L, 0.5)).toDF(
      "src", "dst", "score")
    assert(KnnGraph.mutualFromEdges(oneWay).count() == 0L)
  }

  // ---- graphSearch (batched beam search over a neighbor graph) ----

  // path graph over the line corpus: 0-1-2-3-4 chained both ways —
  // a query near x=11 must WALK from seed 0 hop by hop
  private def chainEdges = Seq(
    (0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
    (3L, 4L), (4L, 3L)).toDF("src", "dst")

  private def oneQuery = Seq((100L, Array(11.0f, 1.0f)))
    .toDF("qid", "qvec")

  private def seedsDf(ids: Long*) = ids.toDF("id")

  test("graphSearch walks the chain: each hop discovers the next " +
      "node, hops=0 degenerates to scoring the seeds") {
    def run(hops: Int) = KnnGraph.graphSearch(
      lineCorpus, "id", "vec", chainEdges, "src", "dst",
      oneQuery, "qid", "qvec", seedsDf(0L), beam = 1, hops = hops,
      k = 10, metric = Metric.SquaredL2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toMap
    assert(run(0) == Map(0L -> 1), "hops=0: only the seed is visited")
    // beam=1 from seed 0: hop1 discovers 1, hop2 discovers 2, …
    assert(run(2).keySet == Set(0L, 1L, 2L))
    val full = run(4)
    assert(full.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // ranks: nearest to x=11 is 4, then 3, then 2…
    assert(full(4L) == 1 && full(3L) == 2 && full(2L) == 3)
  }

  test("graphSearch never reaches a disconnected component and " +
      "scores every visited node exactly once") {
    // drop the 2-3 bridge: {3,4} unreachable from seed 0
    val cut = chainEdges.filter(
      !(col("src").isin(2L, 3L) && col("dst").isin(2L, 3L)))
    val out = KnnGraph.graphSearch(
      lineCorpus, "id", "vec", cut, "src", "dst",
      oneQuery, "qid", "qvec", seedsDf(0L), beam = 4, hops = 6,
      k = 10, metric = Metric.SquaredL2).collect()
    val ids = out.map(_.getLong(1))
    assert(ids.toSet == Set(0L, 1L, 2L), s"got ${ids.toSet}")
    assert(ids.length == ids.distinct.length,
      "each (query, node) scored exactly once")
  }

  test("graphSearch beam prunes: beam=1 under squared L2 follows " +
      "only the best new node, ties break to the smaller id") {
    // star: seed 2 links to 1 and 3; query at x=6 → 3 (d=16) beats
    // 1 (d=25), so beam=1 expands only 3 (then 3→4)
    val star = Seq((2L, 1L), (2L, 3L), (1L, 0L), (3L, 4L))
      .toDF("src", "dst")
    val q = Seq((7L, Array(6.0f, 1.0f))).toDF("qid", "qvec")
    val ids = KnnGraph.graphSearch(
      lineCorpus, "id", "vec", star, "src", "dst",
      q, "qid", "qvec", seedsDf(2L), beam = 1, hops = 2, k = 10,
      metric = Metric.SquaredL2)
      .collect().map(_.getLong(1)).toSet
    // hop1 discovers {1,3}, beam keeps 3 only; hop2 expands 3 → 4.
    // 1 was VISITED (scored) but never expanded → 0 never found.
    assert(ids == Set(2L, 1L, 3L, 4L), s"got $ids")
    // equidistant tie: query at x=5.5 exactly between 1 (x=1) and
    // 3 (x=10) — both at d=20.25
    val qTie = Seq((8L, Array(5.5f, 1.0f))).toDF("qid", "qvec")
    val tieIds = KnnGraph.graphSearch(
      lineCorpus, "id", "vec", star, "src", "dst",
      qTie, "qid", "qvec", seedsDf(2L), beam = 1, hops = 2, k = 10,
      metric = Metric.SquaredL2)
      .collect().map(_.getLong(1)).toSet
    // hop1: 1 and 3 tie at d=1 → id ASC keeps 1; hop2 expands 1 → 0
    assert(tieIds == Set(2L, 1L, 3L, 0L), s"got $tieIds")
  }

  test("graphSearch batches queries independently and is " +
      "partitioning-invariant") {
    val qs = Seq((100L, Array(11.0f, 1.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("qid", "qvec")
    def run(parts: Int) = KnnGraph.graphSearch(
      lineCorpus.repartition(parts), "id", "vec",
      chainEdges.repartition(parts), "src", "dst",
      qs.repartition(parts), "qid", "qvec", seedsDf(2L),
      beam = 2, hops = 4, k = 2, metric = Metric.SquaredL2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .toSet
    val a = run(1)
    // query 100 (x=11): nearest reachable 4 then 3; query 200 (x=0):
    // 0 then 1 — per-query ranks independent
    assert(a == Set((100L, 4L, 1), (100L, 3L, 2),
      (200L, 0L, 1), (200L, 1L, 2)), s"got $a")
    assert(run(7) == a)
  }

  test("graphSearch rejects an oversized seed frame and composes " +
      "with knnEdgesWithCentroids under cosine") {
    intercept[IllegalArgumentException] {
      KnnGraph.graphSearch(lineCorpus, "id", "vec", chainEdges,
        "src", "dst", oneQuery, "qid", "qvec",
        lineCorpus.select("id"), beam = 1, hops = 1, k = 1,
        maxSeeds = 2)
    }
    // end-to-end: build the graph, search it — self is its own top-1
    // under cosine (score ≈ 1.0; dot/(√n·√n) may round off exact 1)
    val edges = KnnGraph.knnEdgesWithCentroids(lineCorpus, "id", "vec",
      oneCell, k = 2, metric = Metric.Cosine)
    val q = Seq((4L, Array(11.0f, 1.0f))).toDF("qid", "qvec")
    val top = KnnGraph.graphSearch(lineCorpus, "id", "vec",
      edges, "src", "dst", q, "qid", "qvec", seedsDf(0L),
      beam = 2, hops = 4, k = 1, metric = Metric.Cosine).collect()
    assert(top.length == 1 && top.head.getLong(1) == 4L
      && math.abs(top.head.getDouble(2) - 1.0) < 1e-9)
  }
}
