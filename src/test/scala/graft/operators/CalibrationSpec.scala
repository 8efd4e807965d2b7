package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (0.05, 0L), (0.15, 0L), (0.15, 1L), (0.95, 1L), (1.0, 1L)
  ).toDF("score", "label")

  test("reliability bins: hand-checked counts, conf, acc, clamp at 1.0") {
    val out = Calibration.reliabilityBins(rows, "score", "label", 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.keySet === Set(0, 1, 9))
    assert(out(0) === ((1L, 0.05, 0.0, -0.05)))
    assert(out(1)._1 === 2L)
    assert(math.abs(out(1)._2 - 0.15) < 1e-9)
    assert(out(1)._3 === 0.5)
    assert(math.abs(out(1)._4 - 0.35) < 1e-9)
    assert(out(9)._1 === 2L) // score 1.0 clamps into the last bin
    assert(math.abs(out(9)._2 - 0.975) < 1e-9)
    assert(out(9)._3 === 1.0)
  }

  test("ece: weighted gap, mce the max bin gap; perfect scores give 0") {
    val e = Calibration.ece(rows, "score", "label", 10).collect().head
    assert(e.getLong(0) === 5L)
    assert(math.abs(e.getDouble(1) - 0.16) < 1e-9)
    assert(math.abs(e.getDouble(2) - 0.35) < 1e-9)
    val perfect = Seq((0.0, 0L), (1.0, 1L), (1.0, 1L), (0.0, 0L))
      .toDF("score", "label")
    val pe = Calibration.ece(perfect, "score", "label", 10).collect().head
    assert(pe.getDouble(1) === 0.0 && pe.getDouble(2) === 0.0)
  }

  test("aucByKey: hand-checked ranks with ties; perfect and inverted scores") {
    val d = Seq(
      ("x", 0.1, 0L), ("x", 0.2, 0L), ("x", 0.3, 1L), ("x", 0.3, 0L),
      ("x", 0.9, 1L),
      ("p", 0.1, 0L), ("p", 0.2, 0L), ("p", 0.8, 1L), ("p", 0.9, 1L),
      ("r", 0.1, 1L), ("r", 0.2, 1L), ("r", 0.8, 0L), ("r", 0.9, 0L),
      ("allpos", 0.5, 1L)
    ).toDF("k", "score", "label")
    val out = Calibration.aucByKey(d, Seq("k"), "score", "label")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // ranks 1,2,{3.5,3.5},5; sum of positive ranks 8.5 -> 11/12
    assert(math.abs(out("x").get - 11.0 / 12.0) < 1e-15)
    assert(out("p").get === 1.0)
    assert(out("r").get === 0.0)
    assert(out("allpos").isEmpty) // undefined, not 0.5
  }

  test("aucByKey matches a driver-side pairwise computation on real data") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select($"lang",
        (($"doc_id" % 97).cast("double") / lit(97.0)).as("score"),
        when(($"doc_id" * 7919) % 97 < $"doc_id" % 97, 1L)
          .otherwise(0L).as("label"))
    val got = Calibration.aucByKey(docs, Seq("lang"), "score", "label")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val rows = docs.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2)))
    for ((lang, perLang) <- rows.groupBy(_._1)) {
      val pos = perLang.filter(_._3 == 1L).map(_._2)
      val neg = perLang.filter(_._3 == 0L).map(_._2)
      val wins = (for (p <- pos; n <- neg) yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val expected = wins / (pos.length.toDouble * neg.length)
      assert(math.abs(got(lang) - expected) < 1e-12,
        s"$lang: ${got(lang)} vs $expected")
    }
  }

  test("prCurveByKey: hand-checked sweep") {
    val d = Seq(
      ("x", 0.1, 0L), ("x", 0.2, 0L), ("x", 0.3, 1L), ("x", 0.3, 0L),
      ("x", 0.9, 1L)).toDF("k", "score", "label")
    val out = Calibration.prCurveByKey(d, Seq("k"), "score", "label")
      .collect().map(r => r.getDouble(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(out(0.9) === ((1L, 0L, 1L, 1.0, 0.5)))
    assert(out(0.3)._1 === 2L && out(0.3)._2 === 1L && out(0.3)._3 === 0L)
    assert(math.abs(out(0.3)._4 - 2.0 / 3.0) < 1e-15)
    assert(out(0.3)._5 === 1.0)
    assert(out(0.1) === ((2L, 3L, 0L, 0.4, 1.0)))
  }

  test("null scores and labels are dropped") {
    val withNulls = Seq(
      (Some(0.5), Some(1L)), (None, Some(0L)), (Some(0.5), None)
    ).toDF("score", "label")
    val out = Calibration.reliabilityBins(withNulls, "score", "label", 4)
      .collect()
    assert(out.length === 1 && out.head.getLong(1) === 1L)
  }

  test("reserved-column collisions are rejected with a pointed error") {
    val d = Seq((0.5, 1L, "a")).toDF("score", "label", "threshold")
    val e = intercept[IllegalArgumentException] {
      Calibration.prCurveByKey(d, Seq("threshold"), "score", "label")
    }
    assert(e.getMessage.contains("threshold"))
    val d2 = Seq((0.5, 1L)).toDF("__s", "label")
    assert(intercept[IllegalArgumentException] {
      Calibration.aucByKey(d2, Nil, "__s", "label")
    }.getMessage.contains("__s"))
    assert(intercept[IllegalArgumentException] {
      Calibration.reliabilityBins(
        Seq((0.5, 1L)).toDF("bin", "label"), "bin", "label")
    }.getMessage.contains("bin"))
  }
}
