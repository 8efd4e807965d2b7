package graft

import org.apache.spark.sql.functions._

/** Gate for the graph-peel twin unroll depths: the token_kcore /
  * token_ktruss / token_coreness DuckDB twins replay a FIXED number of
  * peel stages (`SparkEntry.token*TwinRounds` — the SQL chains are
  * generated from those constants), while the operators' round counts
  * are data-dependent. If regenerated testdata ever needs more rounds
  * than a twin unrolls, the driver gate would report a bare hash
  * mismatch with no pointer to the cause — this spec measures the
  * actual round counts on the GATE data (sf0.01, the exact frame the
  * registered queries peel) and fails with the remedy spelled out. */
class TwinDepthSpec extends SparkSpec {

  private def gateEdges = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    SharedFrames.coocPairs(spark, sf("sf0.01"))
      .where(col("lift") >= 1.05).select("tok_a", "tok_b")
  }

  private def check(name: String, measured: Int, unrolled: Int): Unit =
    assert(measured <= unrolled,
      s"$name converges in $measured rounds on the gate data but its " +
        s"twin unrolls only $unrolled — REGENERATE THE TWIN: raise " +
        s"SparkEntry.${name}TwinRounds to >= $measured (the generated " +
        "SQL chain follows the constant automatically)")

  test("token_kcore's twin unrolls at least as many peel stages as " +
      "the operator executes on the gate data") {
    val (_, rounds) = graft.operators.Graph.kCoreInstrumented(
      gateEdges, "tok_a", "tok_b", k = 8)
    check("tokenKcore", rounds, SparkEntry.tokenKcoreTwinRounds)
  }

  test("token_ktruss's twin unrolls at least as many peel stages as " +
      "the operator executes on the gate data") {
    val (_, rounds) = graft.operators.Graph.kTrussInstrumented(
      gateEdges, "tok_a", "tok_b", k = 7)
    check("tokenKtruss", rounds, SparkEntry.tokenKtrussTwinRounds)
  }

  test("token_coreness's twin unrolls at least as many h-index " +
      "rounds as the operator executes on the gate data") {
    val (_, rounds) = graft.operators.Graph.corenessInstrumented(
      gateEdges, "tok_a", "tok_b")
    check("tokenCoreness", rounds, SparkEntry.tokenCorenessTwinRounds)
  }
}
