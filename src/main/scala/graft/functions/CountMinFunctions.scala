package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Read-side surface for Spark's BUILT-IN `count_min_sketch` aggregate
  * (the Spark-first CMS: the aggregate is map-side combinable, so an
  * exploded token stream reduces to partial sketches per partition and
  * only depth×width counter tables ever shuffle — the same
  * bounded-state contract as the HLL/theta/KLL sketch family in
  * operators.Sketches, with `CountMinSketch.mergeInPlace` as the
  * public merge for rolling windows).
  *
  * Spark ships the aggregate but no scalar reader, so `cms_estimate`
  * fills that gap: deserialize + point lookup. Deserialization runs
  * per ROW of the frame it is applied to — apply it to the probe
  * frame (|probes| rows), never to a corpus-sized one; a
  * reference-object cache would be the next step if a consumer ever
  * needed corpus-side lookups.
  */
object CmsKernels {
  def estimate(bytes: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(java.lang.Long.valueOf(item))
}

case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(BinaryType, LongType)
  override def nullSafeEval(sk: Any, item: Any): Any =
    CmsKernels.estimate(sk.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, item) =>
      s"${ev.value} = graft.functions.CmsKernels.estimate($sk, $item);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object CountMinFunctions {
  import ColumnOps._
  def cms_estimate(sketch: Column, item: Column): Column =
    toColumn(CmsEstimateExpr(toExpr(sketch), toExpr(item)))
}
