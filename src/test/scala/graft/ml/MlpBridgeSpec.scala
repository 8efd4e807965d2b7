package graft.ml

import graft.SparkSpec

import scala.util.Random

/** Quality-threshold tests (SURVEY §7.4: sklearn seed parity is
  * impossible — assert the model learns separable structure, not
  * identical predictions). */
class MlpBridgeSpec extends SparkSpec {

  // 3 well-separated gaussian clusters in 8-d
  private def clustered = {
    import spark.implicits._
    val rnd = new Random(42)
    val centers = Map("a" -> 0f, "b" -> 5f, "c" -> -5f)
    val rows = for {
      (lbl, c) <- centers.toSeq
      i <- 0 until 60
    } yield (s"$lbl$i", lbl,
      Array.fill(8)(c + rnd.nextGaussian().toFloat * 0.5f))
    rows.toDF("id", "y", "vector")
  }

  test("MLP classifier learns separable clusters (M7)") {
    val res = MlpBridge.trainClassifier(clustered, "vector", "y",
      hidden = Seq(16), maxIter = 100)
    assert(res.holdoutMetric >= 0.9,
      s"holdout accuracy ${res.holdoutMetric}")
    val preds = res.predictions
    assert(preds.count() == 180) // predicts ALL rows, train+test
    assert(preds.columns.contains("mlp_pred"))
    val acc = preds.filter("y = mlp_pred").count().toDouble / 180
    assert(acc >= 0.95, s"all-rows accuracy $acc")
  }

  test("regressor substitute recovers a linear signal (M8, GBT path)") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = (0 until 200).map { i =>
      val v = Array.fill(4)(rnd.nextGaussian().toFloat)
      (i.toLong, v, 3.0 * v(0) - 2.0 * v(1) + 0.1 * rnd.nextGaussian())
    }
    val df = rows.toDF("id", "vector", "y")
    val res = MlpBridge.trainRegressor(df, "vector", "y")
    assert(res.holdoutMetric >= 0.7, s"holdout R² ${res.holdoutMetric}")
    val p = MlpBridge.pearson(res.predictions, "mlp_pred", "y")
    assert(p >= 0.85, s"pearson $p")
  }

  test("TRUE MLP regressor learns a linear signal (M8): holdout R², " +
      "all-rows predictions, input-partitioning insensitivity") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = (0 until 240).map { i =>
      val v = Array.fill(4)(rnd.nextGaussian().toFloat)
      (i.toLong, v, 3.0 * v(0) - 2.0 * v(1) + 0.1 * rnd.nextGaussian())
    }
    val df = rows.toDF("id", "vector", "y")
    val res = MlpBridge.trainMlpRegressor(df, "vector", "y",
      hidden = 16, iters = 300, lr = 0.05)
    assert(res.holdoutMetric >= 0.85, s"holdout R² ${res.holdoutMetric}")
    assert(res.predictions.count() == 240,
      "must predict every stored row, train+test")
    val p = MlpBridge.pearson(res.predictions, "mlp_pred", "y")
    assert(p >= 0.9, s"pearson $p")
    // quality holds under a different input partitioning (float
    // partial sums re-associate — quality-pinned, not value-pinned)
    val res2 = MlpBridge.trainMlpRegressor(df.repartition(7),
      "vector", "y", hidden = 16, iters = 300, lr = 0.05)
    assert(res2.holdoutMetric >= 0.85, s"repartitioned R² ${res2.holdoutMetric}")
  }

  test("MLP regressor learns a NONLINEAR signal the linear fit " +
      "cannot (the reason it exists): y = x0^2 - x1^2") {
    import spark.implicits._
    val rnd = new Random(11)
    val rows = (0 until 300).map { i =>
      val v = Array.fill(2)(rnd.nextGaussian().toFloat)
      (i.toLong, v,
        v(0).toDouble * v(0) - v(1).toDouble * v(1) +
          0.05 * rnd.nextGaussian())
    }
    val df = rows.toDF("id", "vector", "y")
    val res = MlpBridge.trainMlpRegressor(df, "vector", "y",
      hidden = 24, iters = 600, lr = 0.08)
    assert(res.holdoutMetric >= 0.6,
      s"nonlinear holdout R² ${res.holdoutMetric}")
  }

  test("classifier rejects single-class input") {
    import spark.implicits._
    val df = Seq(("x", "only", Array(1f, 2f))).toDF("id", "y", "vector")
    intercept[IllegalArgumentException] {
      MlpBridge.trainClassifier(df, "vector", "y")
    }
  }
}
