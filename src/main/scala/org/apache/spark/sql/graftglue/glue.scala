package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bridge into `private[sql]` Spark internals (Column <-> Expression and
  * `AbstractDataType`), kept to the minimum surface the graft package
  * needs. Lives under `org.apache.spark.sql` for access, contains no
  * engine logic.
  */
object SqlGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Binary expression over two numeric-array inputs returning double.
  * Accepts `array<float>` (the canonical vector type) and `array<double>`
  * (what SQL literals like `array(1.0, 2.0)` produce — double→float is
  * narrowing, so Catalyst will not coerce it implicitly).
  *
  * Null-element semantics: `containsNull` arrays are accepted and NULL
  * elements are read as 0.0 (ArrayData.getFloat/getDouble convention) —
  * the same convention as treating a missing dimension as zero mass.
  * Vectors produced by this engine are containsNull=false; only
  * hand-built arrays can hit this path. */
abstract class BinaryFloatVectorExpression extends BinaryExpression with ExpectsInputTypes {
  private val anyVec = TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))
  override def inputTypes: Seq[AbstractDataType] = Seq(anyVec, anyVec)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Unary expression over one numeric-array input. */
abstract class UnaryFloatVectorExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def nullIntolerant: Boolean = true
  protected def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Binary expression over (int, numeric-array) inputs — subspace-
  * indexed vector kernels (PQ training assignment). */
abstract class IntVectorExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def nullIntolerant: Boolean = true
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Unary expression over one binary input (compressed-code kernels). */
abstract class UnaryBinaryInputExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullIntolerant: Boolean = true
}

/** Unary expression over one join-key input (bigint or string) —
  * sketch-membership kernels. `AbstractDataType` is private[sql]. */
abstract class UnaryKeyExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(LongType, StringType))
  override def nullIntolerant: Boolean = true
}

/** Unary expression over one string input (text kernels).
  * `AbstractDataType` is private[sql], hence this lives in the glue. */
abstract class UnaryStringExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
}

/** Unary expression over one array<string> input. */
abstract class UnaryStringArrayExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def nullIntolerant: Boolean = true
}

/** Binary expression over two array<bigint> inputs (packed-bit
  * binary-quantization codes). */
abstract class BinaryLongArrayExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def nullIntolerant: Boolean = true
}

/** Typed imperative aggregate over one numeric-array input (vector
  * aggregation kernels; buffer type is the implementor's). */
abstract class FloatVectorAggregate[B]
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[B]
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  protected def childIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
}
