package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("degrees symmetrizes, drops self-loops, collapses parallels") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))
      .toDF("src", "dst")
    val out = Graph.degrees(e, "src", "dst").orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("pageRank on a symmetric pair splits mass evenly") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graph.pageRank(e, "src", "dst", iters = 5)
      .orderBy("node").collect().map(_.getDouble(1))
    // two symmetric nodes: rank stays uniform 0.5 (up to the decimal
    // quantization of contributions)
    assert(out.forall(r => math.abs(r - 0.5) < 1e-9))
  }

  test("pageRank ranks the hub of a star above its leaves, mass ~1") {
    // star: 0 -- {1,2,3,4}
    val e = (1L to 4L).map(i => (0L, i)).toDF("src", "dst")
    val out = Graph.pageRank(e, "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) > out(1L) * 2)
    assert((1L to 4L).map(out).distinct.size === 1) // leaves identical
    assert(math.abs(out.values.sum - 1.0) < 1e-6)
  }

  test("labelPropagation converges two triangles to their min labels " +
      "and breaks ties deterministically") {
    // two triangles joined by one bridge edge
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L)).toDF("src", "dst")
    val out = Graph.labelPropagation(e, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle {1,2,3} pulls to label 1; {10,11,12} keeps its own
    // min label — the bridge must NOT flood one label everywhere
    assert(Set(1L, 2L, 3L).map(out).size === 1)
    assert(out(1L) === 1L)
    assert(Set(10L, 11L, 12L).map(out).size === 1)
    assert(out(10L) === 3L || out(10L) === 10L, s"got $out")
    assert(out(1L) !== out(11L), "bridge flooded one community label")
    // every label is one of the node ids (labels propagate, never
    // invent)
    assert(out.values.toSet.subsetOf(out.keySet))
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(e, "src", "dst", iters = 0)
    }
  }

  test("labelPropagation single round: a node adopts its neighbors' " +
      "majority label, ties to the smallest") {
    // star center 5 with leaves 1,2,3 -> center adopts min leaf 1;
    // leaves adopt 5 (their only neighbor)
    val e = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("src", "dst")
    val out = Graph.labelPropagation(e, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(5L) === 1L)
    assert(Seq(1L, 2L, 3L).forall(out(_) === 5L))
  }

  test("pageRank matches a hand-computed iteration on a path graph") {
    // path 1-2-3, degrees 1,2,1. After one iteration with d=0.85:
    // pr(1) = 0.15/3 + 0.85*(pr2/2); pr(2) = 0.15/3 + 0.85*(pr1+pr3);
    // pr(3) symmetric to 1. Initial pr = 1/3.
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.pageRank(e, "src", "dst", iters = 1)
      .orderBy("node").collect().map(_.getDouble(1))
    val third = 1.0 / 3.0
    val exp1 = (1.0 - 0.85) / 3.0 + 0.85 * (third / 2.0)
    val exp2 = (1.0 - 0.85) / 3.0 + 0.85 * (third + third)
    assert(math.abs(out(0) - exp1) < 1e-9)
    assert(math.abs(out(1) - exp2) < 1e-9)
    assert(math.abs(out(2) - exp1) < 1e-9)
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iters = 1, damping = 1.0)
    }
  }
}
