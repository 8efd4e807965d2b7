package graft.operators

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val emb = spark.read
    .parquet(s"${sf()}/embeddings.parquet")
    .select("vec_id", "embedding")
    .cache()

  private lazy val index =
    IvfIndex.build(emb, "embedding", "vec_id", nClusters = 16)

  private def bruteTop(q: Array[Float], k: Int): Seq[Long] =
    Similarity.topK(emb, "embedding", "vec_id", q, k)
      .collect().map(_.getLong(0)).toSeq

  private def queries: Seq[Array[Float]] =
    emb.filter(col("vec_id") < 20).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray).toSeq

  test("every row is assigned its nearest centroid") {
    val n = index.assigned.count()
    assert(n == 500)
    val nCells = index.assigned.select(IvfIndex.ClusterCol).distinct().count()
    assert(nCells > 1 && nCells <= 16)
  }

  test("nprobe = nClusters is exact (matches brute force)") {
    for (q <- queries.take(5)) {
      val ivf = index.query(q, k = 10, nprobe = 16)
        .collect().map(_.getLong(0)).toSeq
      assert(ivf == bruteTop(q, 10))
    }
  }

  test("nprobe=4 of 16 keeps high recall@10") {
    val recalls = queries.map { q =>
      val ivf = index.query(q, k = 10, nprobe = 4)
        .collect().map(_.getLong(0)).toSet
      val exact = bruteTop(q, 10).toSet
      (ivf intersect exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@10 $mean over ${recalls.size} queries")
  }

  test("queryBatch with full probe matches the brute-force batch join") {
    val qdf = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = index.queryBatch(qdf, "query_id", "embedding", k = 5,
      nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._3, t._2))
    val want = Similarity.topKJoin(emb, qdf, k = 5,
      corpusIdCol = "vec_id", corpusVecCol = "embedding",
      queryIdCol = "query_id", queryVecCol = "embedding")
      .select("query_id", "vec_id", "distance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._3, t._2))
    assert(got.sameElements(want))
  }

  test("queryBatch multi-probe keeps high recall without broadcast") {
    val qdf = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val approx = index.queryBatch(qdf, "query_id", "embedding", k = 10,
      nprobe = 4)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = queries.zipWithIndex.map { case (q, i) =>
      val exact = bruteTop(q, 10).toSet
      (approx.getOrElse(i.toLong, Set.empty) intersect exact).size.toDouble /
        exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@10 $mean over ${recalls.size} queries")
  }

  test("partitioned write prunes probed cells at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    index.writePartitioned(s"$dir/ivf")
    val reloaded = IvfIndex.load(spark, s"$dir/ivf", index.centroids,
      "embedding", "vec_id")
    val q = queries.head
    assert(reloaded.query(q, 5, nprobe = 16).collect().map(_.getLong(0)).toSeq
      == bruteTop(q, 5))
    // the probed query's scan must carry partition filters
    val plan = reloaded.query(q, 5, nprobe = 2).queryExecution
      .executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains(s"${IvfIndex.ClusterCol}#"),
      s"expected pruned scan, got:\n$plan")
  }

  test("incremental append: new rows assigned to existing centroids, " +
      "full-probe query stays exact over the union") {
    val first = emb.filter(col("vec_id") < 400)
    val rest = emb.filter(col("vec_id") >= 400)
    val partial = IvfIndex.build(first, "embedding", "vec_id",
      nClusters = 16)
    val extended = partial.append(rest)
    assert(extended.assigned.count() == 500)
    // appended rows got cells from the SAME centroids (no refit)
    assert(extended.centroids.zip(partial.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    val q = queries.head
    assert(extended.query(q, 10, nprobe = 16)
      .collect().map(_.getLong(0)).toSeq == bruteTop(q, 10))
  }

  test("appendPartitioned writes only the new rows' cell files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-a").toString
    val first = emb.filter(col("vec_id") < 400)
    val rest = emb.filter(col("vec_id") >= 400)
    val partial = IvfIndex.build(first, "embedding", "vec_id",
      nClusters = 16)
    partial.writePartitioned(s"$dir/ivf")
    val filesBefore = java.nio.file.Files.walk(
      java.nio.file.Paths.get(s"$dir/ivf"))
      .filter(_.toString.endsWith(".parquet")).count()
    partial.appendPartitioned(s"$dir/ivf", rest)
    val filesAfter = java.nio.file.Files.walk(
      java.nio.file.Paths.get(s"$dir/ivf"))
      .filter(_.toString.endsWith(".parquet")).count()
    assert(filesAfter > filesBefore)
    val reloaded = IvfIndex.load(spark, s"$dir/ivf", partial.centroids,
      "embedding", "vec_id")
    assert(reloaded.assigned.count() == 500)
    val q = queries.head
    assert(reloaded.query(q, 10, nprobe = 16)
      .collect().map(_.getLong(0)).toSeq == bruteTop(q, 10))
  }

  test("refreshCentroids is one Lloyd's step: moves centroids toward " +
      "cell means, keeps full-probe exactness") {
    val refreshed = index.refreshCentroids()
    assert(refreshed.assigned.count() == 500)
    val q = queries.head
    assert(refreshed.query(q, 10, nprobe = 16)
      .collect().map(_.getLong(0)).toSeq == bruteTop(q, 10))
    // non-empty cells now sit exactly on their (pre-refresh) cell means
    import graft.functions.VectorFunctions.{vec_mean_of, vec_sum}
    val means = index.assigned.groupBy(IvfIndex.ClusterCol)
      .agg(vec_mean_of(vec_sum(col("embedding")), count(lit(1))).as("mu"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for ((cell, mu) <- means) {
      val c = refreshed.centroids(cell)
      assert(c.zip(mu).forall { case (a, b) =>
        math.abs(a - b.toFloat) <= math.ulp(b.toFloat) })
    }
  }

  test("lloydStepMeans emits one Lloyd's recenter, hand-checked: " +
      "argmin assignment then exact per-cell per-dim means") {
    val cents = emb.filter(col("vec_id") < 4).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val got = IvfIndex.lloydStepMeans(emb, "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    def cellOf(v: Array[Float]): Int =
      cents.zipWithIndex.minBy { case (c, i) =>
        (graft.functions.VectorOps.squaredL2Floats(v, c), i) }._2
    val byCell = rows.groupBy { case (_, v) => cellOf(v) }
    assert(got.keySet.map(_._1) == byCell.keySet.map(_.toLong))
    for ((cell, members) <- byCell; d <- cents(0).indices) {
      val mean = members.map(_._2(d).toDouble).sum / members.size
      val (v, n) = got((cell.toLong, d.toLong))
      assert(n == members.size)
      assert(math.abs(v - mean) <= 1e-6, s"cell $cell dim $d: $v vs $mean")
    }
  }

  test("cellStats/health: counts reconcile, quantization error is the " +
      "nearest-centroid distance for freshly assigned rows") {
    val stats = index.cellStats.collect()
    assert(stats.map(_.getLong(1)).sum == 500L)
    assert(stats.forall(r => r.getDouble(2) >= 0 &&
      r.getDouble(3) >= r.getDouble(2)))
    val h = index.health()
    assert(h.total == 500L && h.nCells == 16 &&
      h.nonEmptyCells == stats.length)
    assert(h.imbalance >= 1.0 && h.maxCell == stats.map(_.getLong(1)).max)
    assert(h.maxQuantErr >= h.meanQuantErr)
  }

  test("needsRefresh fires on drift after appends and a refresh " +
      "reduces quantization error (Lloyd monotonicity)") {
    import spark.implicits._
    val baseline = index.health()
    assert(!index.needsRefresh(baseline, maxImbalance = 1e9,
      errGrowth = 1.0001),
      "freshly built index must not demand a refresh on the error rule")
    // drift: a far-away blob appended under the OLD centroids
    val dim = index.centroids.head.length
    val far = (0 until 200).map { i =>
      (10000L + i) -> Array.tabulate(dim)(d =>
        50f + (i % 7) * 0.1f + d * 0.01f)
    }.toDF("vec_id", "embedding")
    val grown = index.append(far)
    val drifted = grown.health()
    assert(drifted.meanQuantErr > baseline.meanQuantErr)
    assert(grown.needsRefresh(baseline, maxImbalance = 1e9,
      errGrowth = 1.5))
    val refreshed = grown.refreshCentroids()
    assert(refreshed.health().meanQuantErr <= drifted.meanQuantErr)
  }
}
