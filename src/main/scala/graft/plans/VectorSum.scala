package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Element-wise sum of `ARRAY<FLOAT|DOUBLE>` vectors as a typed aggregate.
  *
  * The IVF/k-means centroid step needs per-group mean vectors. The
  * declarative formulation (`posexplode` → groupBy (cell, pos) → avg →
  * re-assemble) shuffles n×dim SCALAR rows — at 384-dim that is 384
  * shuffle rows per vector, the dominant index-build cost. This aggregate
  * keeps ONE double[] accumulator per group: partial sums are computed
  * map-side and the shuffle carries one dim-length buffer per group per
  * task, the same map-side-combine shape as the built-in numeric `sum`.
  *
  * Semantics (matching what the exploded avg formulation produces on
  * null-free input, parity-tested in KnnSpec):
  *  - NULL input rows are skipped; an all-NULL (or empty) group sums to NULL;
  *  - rows whose array contains a NULL element are skipped entirely;
  *  - mixed lengths within a group throw (vectors must be dimension-aligned).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  private lazy val childIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got ${other.sql}")
  }

  // empty array = "no input seen yet" sentinel (a 0-dim vector is not a
  // meaningful embedding, so the sentinel can't collide with real data)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) { // skip rows with null elements (same as exploded-avg path)
      if (arr.isNullAt(i)) return buffer
      i += 1
    }
    val acc =
      if (buffer.length == 0) new Array[Double](n)
      else if (buffer.length == n) buffer
      else throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${buffer.length} vs $n)")
    i = 0
    while (i < n) {
      acc(i) += (if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    acc
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    if (b1.length != b2.length) throw new IllegalArgumentException(
      s"$prettyName: dimension mismatch (${b1.length} vs ${b2.length})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(storage)
    val out = new Array[Double](storage.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

object VectorSum {
  /** Column-API entry: element-wise vector sum aggregate. */
  def vectorSum(c: Column): Column =
    GraftSqlBridge.column(
      VectorSum(GraftSqlBridge.expression(c)).toAggregateExpression())
}
