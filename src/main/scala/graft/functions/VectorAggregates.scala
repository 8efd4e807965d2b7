package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.FloatVectorAggregate
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** vec_sum(vectors): array<double> — element-wise sum of a vector
  * column, the building block of distributed centroid computation
  * (grouped means for IVF/k-means-style pipelines; spiritual kin of
  * the reference's mean pooling A1/A2, done across ROWS instead of
  * across tokens).
  *
  * Scale: a `TypedImperativeAggregate`, so Catalyst runs it with
  * partial aggregation — each partition folds its rows into one
  * dim-sized buffer (map-side combine), and only nGroups × dim doubles
  * cross the shuffle. Summation order is partition-dependent, like any
  * distributed double sum — consumers needing cross-engine hash
  * equality must round (see the label_centroids oracle entry).
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends FloatVectorAggregate[Array[Double]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  // buffer is allocated lazily on the first non-null row (dim is not
  // known statically); null buffer ⇒ no input seen ⇒ null result
  override def createAggregationBuffer(): Array[Double] = null

  override def update(buf: Array[Double], row: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(row)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = childIsFloat(child)
    val acc = if (buf == null) new Array[Double](n) else buf
    require(acc.length == n,
      s"vector length mismatch in vec_sum: ${acc.length} vs $n")
    var i = 0
    while (i < n) {
      acc(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    acc
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1 == null) return b2
    if (b2 == null) return b1
    require(b1.length == b2.length,
      s"vector length mismatch in vec_sum merge: ${b1.length} vs ${b2.length}")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    if (buf == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorSumAgg =
    copy(child = c)
}
