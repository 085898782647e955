package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector math (SURVEY.md §7.4
  * extension surface). A tight primitive loop per row — no object churn,
  * no lambda-expression interpretation overhead like the
  * `aggregate`/`zip_with` composition would have — over both FLOAT and
  * DOUBLE array columns. Full `doGenCode` so the loop inlines into the
  * surrounding whole-stage-codegen span instead of breaking it
  * (CodegenFallback would force interpreted eval with boxing at every
  * call boundary).
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType

  /** Declared input types → misuse through the SQL registry fails at
    * analysis (or implicitly casts, e.g. ARRAY<INT> → ARRAY<DOUBLE>)
    * instead of crashing executors mid-job. (TypeCollection is
    * private[sql]; the shim exports the float-or-double-array
    * collection.)
    */
  override def inputTypes =
    Seq(org.apache.spark.sql.graftshim.Bridge.vectorArrayType,
        org.apache.spark.sql.graftshim.Bridge.vectorArrayType)

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Java ArrayData getter for this side's element type. */
  protected def getter(e: Expression): String = elemType(e) match {
    case FloatType  => "getFloat"
    case DoubleType => "getDouble"
    case t => throw new IllegalArgumentException(s"unsupported element type $t")
  }

  protected def toDoubles(e: Expression, v: Any): Array[Double] =
    elemType(e) match {
      case FloatType =>
        val f = v.asInstanceOf[ArrayData].toFloatArray()
        val out = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
        out
      case DoubleType => v.asInstanceOf[ArrayData].toDoubleArray()
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }
}

/** cosine(a, b) = a·b / (|a| |b|); NaN when either norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = toDoubles(left, a)
    val y = toDoubles(right, b)
    require(x.length == y.length, s"dim mismatch: ${x.length} vs ${y.length}")
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < x.length) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, dot, nx, ny, x, y) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("dot"), ctx.freshName("nx"), ctx.freshName("ny"),
        ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("dim mismatch: " + $n + " vs " + $b.numElements());
         |}
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.${getter(left)}($i);
         |  final double $y = (double) $b.${getter(right)}($i);
         |  $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Plain dot product. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = toDoubles(left, a)
    val y = toDoubles(right, b)
    require(x.length == y.length, s"dim mismatch: ${x.length} vs ${y.length}")
    var dot = 0.0; var i = 0
    while (i < x.length) { dot += x(i) * y(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, dot) =
        (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("dot"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("dim mismatch: " + $n + " vs " + $b.numElements());
         |}
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.${getter(left)}($i)) * ((double) $b.${getter(right)}($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Static kernel for [[HyperplaneSignature]] — standalone object so
  * generated code can call it as a plain JVM static method.
  */
object VectorKernels {
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  /** uniform in [-1, 1) — a symmetric weight is enough for sign-LSH. */
  private def weight(seed: Long, j: Int, d: Int): Double =
    splitmix64(seed * 0x100000001b3L + j.toLong * 0x1000193L + d).toDouble /
      9.223372036854776e18

  def hyperplaneSig(arr: ArrayData, numBits: Int, seed: Long,
                    floatElems: Boolean): Long = {
    val x: Array[Double] =
      if (floatElems) {
        val f = arr.toFloatArray()
        val out = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
        out
      } else arr.toDoubleArray()
    var sig = 0L
    var j = 0
    while (j < numBits) {
      var dot = 0.0; var d = 0
      while (d < x.length) { dot += x(d) * weight(seed, j, d); d += 1 }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Signed-random-projection (hyperplane) LSH signature: bit j of the
  * result is the sign of vec · g_j, where g_j is a deterministic
  * pseudo-random hyperplane derived from (seed, j, dim index) via
  * splitmix64 — reproducible across executors with no broadcast state.
  * Cosine-similar vectors agree on most bits (P[bit match] = 1 - θ/π).
  * Codegen emits a static kernel call so the expression stays inside
  * the whole-stage span.
  */
case class HyperplaneSignature(child: Expression, numBits: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(numBits >= 1 && numBits <= 64, "numBits in [1,64]")
  override def dataType: DataType = LongType
  override def inputTypes =
    Seq(org.apache.spark.sql.graftshim.Bridge.vectorArrayType)

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.hyperplaneSig(v.asInstanceOf[ArrayData], numBits, seed, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.hyperplaneSig($c, $numBits, ${seed}L, $floatElems);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object VectorFunctions {
  import ColumnOps._
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpr(a), toExpr(b)))
  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpr(a), toExpr(b)))
  def hyperplane_sig(v: Column, numBits: Int, seed: Long = 42L): Column =
    toColumn(HyperplaneSignature(toExpr(v), numBits, seed))
}
