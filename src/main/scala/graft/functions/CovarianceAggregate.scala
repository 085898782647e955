package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass covariance-moment accumulator over a vector column: buffer
  * = [n, Σx₀…Σx_{d−1}, upper-triangle Σxᵢxⱼ (i ≤ j)] — 1 + d + d(d+1)/2
  * doubles of state per partition, merged by element-wise addition.
  * This is THE distributed shape for covariance at corpus scale: the
  * d² moment matrix reduces map-side, only O(d²) state ever shuffles,
  * and the driver finishes with cov = M/n − μμᵀ on a matrix that is
  * bounded by the embedding dimension, never by the row count.
  * (Spark's ml.stat offers mean/variance Summarizers but no full
  * covariance on the DataFrame API — this fills that gap in the same
  * TypedImperativeAggregate idiom as the repo's MG/TopK aggregates.)
  *
  * Rows that are NULL or whose length ≠ d are skipped (counted rows
  * only — the caller can difference counts to audit skips).
  */
case class CovMoments(
    child: Expression, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {
  require(d >= 1 && d <= 4096, s"dimension out of range: $d")

  private val triLen = d * (d + 1) / 2
  private val bufLen = 1 + d + triLen

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  private lazy val floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == d) {
        val x = new Array[Double](d)
        var i = 0
        while (i < d) {
          x(i) = if (floatElems) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
        buf(0) += 1.0
        i = 0
        var t = 1 + d
        while (i < d) {
          buf(1 + i) += x(i)
          var j = i
          while (j < d) { buf(t) += x(i) * x(j); j += 1; t += 1 }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bufLen)
    var i = 0
    while (i < bufLen) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CovMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMoments =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object CovFunctions {
  import ColumnOps._
  def cov_moments(vec: Column, d: Int): Column =
    toColumn(CovMoments(toExpr(vec), d).toAggregateExpression())
}
