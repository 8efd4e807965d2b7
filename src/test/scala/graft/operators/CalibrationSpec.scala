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

  test("null scores and labels are dropped") {
    val withNulls = Seq(
      (Some(0.5), Some(1L)), (None, Some(0L)), (Some(0.5), None)
    ).toDF("score", "label")
    val out = Calibration.reliabilityBins(withNulls, "score", "label", 4)
      .collect()
    assert(out.length === 1 && out.head.getLong(1) === 1L)
  }
}
