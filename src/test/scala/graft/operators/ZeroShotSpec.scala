package graft.operators

import graft.SparkSpec
import graft.functions.HashEmbedder
import graft.store.VectorStore

class ZeroShotSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def data = {
    import spark.implicits._
    Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 2f, 0f)),
      (3L, Array(3f, 3f, 0f))
    ).toDF("id", "vec")
  }

  private val labels = Seq(
    "x" -> Array(2f, 0f, 0f), // unnormalized on purpose
    "y" -> Array(0f, 1f, 0f))

  test("cosine×100 scores and argmax prediction (M5)") {
    val res = ZeroShot.classify(data, "vec", labels)
      .orderBy("id").collect()
    assert(res.map(_.getString(3)).toSeq == Seq("x", "y", "x"))
    val scores1 = res(0).getSeq[Double](2)
    assert(math.abs(scores1(0) - 100.0) < 1e-6) // cos(x,x)=1 → 100
    assert(scores1(1) == 0.0)
    // row 3 = (3,3,0): cos with both axes = 1/sqrt(2) → equal scores,
    // first label wins (np.argmax tiebreak parity)
    val scores3 = res(2).getSeq[Double](2)
    assert(math.abs(scores3(0) - scores3(1)) < 1e-9)
  }

  test("normalizeData=false skips data-side normalization (CLIP Q6)") {
    val res = ZeroShot.classify(data, "vec", labels, normalizeData = false)
      .orderBy("id").collect()
    // raw dot with normalized labels: (1,0,0)·(1,0,0)=1 → 100
    assert(math.abs(res(0).getSeq[Double](2).head - 100.0) < 1e-6)
    // (0,2,0)·(0,1,0)=2 → 200: unnormalized magnitude leaks through
    assert(math.abs(res(1).getSeq[Double](2)(1) - 200.0) < 1e-6)
  }

  test("softmax probabilities sum to 1 and argmax matches (M6)") {
    val res = ZeroShot.classifySoftmax(data, "vec", labels,
      normalizeData = true).orderBy("id").collect()
    res.foreach { r =>
      val probs = r.getSeq[Double](3)
      assert(math.abs(probs.sum - 1.0) < 1e-9)
      assert(probs.forall(p => p >= 0 && p <= 1))
    }
    assert(res.map(_.getString(2)).toSeq == Seq("x", "y", "x"))
    // dominant class gets nearly all mass at scale=100
    assert(res(0).getSeq[Double](3).head > 0.999)
  }

  test("store integration: setZeroshotLabels + doZeroshot") {
    import spark.implicits._
    val store = new VectorStore(spark, HashEmbedder(dim = 16))
    store.setData(Seq("apple pie recipe", "car engine repair",
      "apple tart baking").toDF("target"))
    store.setZeroshotLabels(Seq("apple pie recipe", "car engine repair"))
    val res = store.doZeroshot()
    assert(res.columns.contains("zeroshot_pred"))
    val preds = res.select("target", "zeroshot_pred").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(preds("apple pie recipe") == "apple pie recipe")
    assert(preds("car engine repair") == "car engine repair")
    // mirror-only write parity: predictions do NOT mutate the store
    assert(!store.data.columns.contains("zeroshot_pred"))
  }

  test("doZeroshot before setZeroshotLabels raises (quirk Q2 hardened)") {
    val store = new VectorStore(spark, HashEmbedder(dim = 8))
    intercept[IllegalArgumentException] { store.doZeroshot() }
  }
}
