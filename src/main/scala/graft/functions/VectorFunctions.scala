package graft.functions

import org.apache.spark.sql.graftglue.SqlGlue.{column, expression}
import org.apache.spark.sql.{Column, SparkSession}

/** Column-API surface for the vector kernels, plus SQL registration.
  *
  * These are native Catalyst expressions with `doGenCode` — they stay
  * inside whole-stage codegen (unlike Scala UDFs, which box every row).
  */
object VectorFunctions {

  def vec_dot(a: Column, b: Column): Column = column(VectorDot(expression(a), expression(b)))

  def squared_l2(a: Column, b: Column): Column = column(SquaredL2(expression(a), expression(b)))

  def cosine_sim(a: Column, b: Column): Column = column(CosineSim(expression(a), expression(b)))

  def vec_norm(a: Column): Column = column(VectorNorm(expression(a)))

  def l2_normalize(a: Column): Column = column(L2Normalize(expression(a)))

  /** Register all kernels for `spark.sql(...)` use. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", es => VectorDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("squared_l2", es => SquaredL2(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_norm", es => VectorNorm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es.head), "scala_udf")
  }
}
