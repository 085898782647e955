package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Affine projection kernel: y_e = Σ_j (x_j − mean_j)·basis_e_j ·
  * scale_e — the whiten/dimension-reduce step applied corpus-side as
  * ONE codegen'd pass per row, with the k×d basis shipped as a codegen
  * reference object (the IVF-centroid pattern: no k-term expression
  * tree, no join, bounded driver state). Output ARRAY<DOUBLE> length k.
  */
object ProjectionKernels {
  def projectWhiten(v: ArrayData, mean: Array[Double],
                    basis: Array[Array[Double]], scales: Array[Double],
                    floatElems: Boolean): ArrayData = {
    val d = mean.length
    require(v.numElements() == d,
      s"vector length ${v.numElements()} != expected $d")
    val x = new Array[Double](d)
    var j = 0
    while (j < d) {
      x(j) = (if (floatElems) v.getFloat(j).toDouble else v.getDouble(j)) -
        mean(j)
      j += 1
    }
    val k = basis.length
    val out = new Array[Any](k)
    var e = 0
    while (e < k) {
      val row = basis(e)
      var s = 0.0
      j = 0
      while (j < d) { s += x(j) * row(j); j += 1 }
      out(e) = s * scales(e)
      e += 1
    }
    new GenericArrayData(out)
  }
}

object RemoveComponentsKernel {
  /** y = (x − mean) − Σ_e ((x − mean)·basis_e)·basis_e — common-
    * component removal keeping the full dimension d. Basis rows must
    * be orthonormal for exact per-row orthogonality of the output
    * (the t263 gate measures it).
    */
  def removeComponents(v: ArrayData, mean: Array[Double],
                       basis: Array[Array[Double]],
                       floatElems: Boolean): ArrayData = {
    val d = mean.length
    require(v.numElements() == d,
      s"vector length ${v.numElements()} != expected $d")
    val x = new Array[Double](d)
    var j = 0
    while (j < d) {
      x(j) = (if (floatElems) v.getFloat(j).toDouble else v.getDouble(j)) -
        mean(j)
      j += 1
    }
    var e = 0
    while (e < basis.length) {
      val row = basis(e)
      var s = 0.0
      j = 0
      while (j < d) { s += x(j) * row(j); j += 1 }
      j = 0
      while (j < d) { x(j) -= s * row(j); j += 1 }
      e += 1
    }
    val out = new Array[Any](d)
    j = 0
    while (j < d) { out(j) = x(j); j += 1 }
    new GenericArrayData(out)
  }
}

case class RemoveComponentsExpr(child: Expression, mean: Seq[Double],
                                basis: Seq[Seq[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(basis.nonEmpty && basis.forall(_.length == mean.length),
    "basis rows must match mean dimension")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def inputTypes =
    Seq(org.apache.spark.sql.graftshim.Bridge.vectorArrayType)

  @transient private lazy val meanArr: Array[Double] = mean.toArray
  @transient private lazy val basisArr: Array[Array[Double]] =
    basis.map(_.toArray).toArray

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(v: Any): Any =
    RemoveComponentsKernel.removeComponents(v.asInstanceOf[ArrayData],
      meanArr, basisArr, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mean", meanArr, "double[]")
    val b = ctx.addReferenceObj("basis", basisArr, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RemoveComponentsKernel." +
        s"removeComponents($c, $m, $b, $floatElems);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ProjectWhitenExpr(child: Expression, mean: Seq[Double],
                             basis: Seq[Seq[Double]], scales: Seq[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(basis.nonEmpty && basis.forall(_.length == mean.length),
    "basis rows must match mean dimension")
  require(scales.length == basis.length, "one scale per basis row")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def inputTypes =
    Seq(org.apache.spark.sql.graftshim.Bridge.vectorArrayType)

  @transient private lazy val meanArr: Array[Double] = mean.toArray
  @transient private lazy val basisArr: Array[Array[Double]] =
    basis.map(_.toArray).toArray
  @transient private lazy val scaleArr: Array[Double] = scales.toArray

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(v: Any): Any =
    ProjectionKernels.projectWhiten(v.asInstanceOf[ArrayData], meanArr,
      basisArr, scaleArr, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mean", meanArr, "double[]")
    val b = ctx.addReferenceObj("basis", basisArr, "double[][]")
    val s = ctx.addReferenceObj("scales", scaleArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ProjectionKernels.projectWhiten(" +
        s"$c, $m, $b, $s, $floatElems);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object ProjectionFunctions {
  import ColumnOps._
  def project_whiten(vec: Column, mean: Seq[Double], basis: Seq[Seq[Double]],
                     scales: Seq[Double]): Column =
    toColumn(ProjectWhitenExpr(toExpr(vec), mean, basis, scales))
  def remove_components(vec: Column, mean: Seq[Double],
                        basis: Seq[Seq[Double]]): Column =
    toColumn(RemoveComponentsExpr(toExpr(vec), mean, basis))
}
