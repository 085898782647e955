package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[Md5Uniform32]]. */
object SeededUniformKernels {
  // MessageDigest is stateful; one instance per thread, reset per call.
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** u in [1e-9, 1-1e-9] from the first 8 hex digits of md5(key) —
    * BIT-IDENTICAL to the expression-tree form it replaces
    * (Σ_{i=1..8} nibble_i / 16^i over the lowercase hex string): the
    * left-fold partial sums are all exact dyadic doubles spanning 32
    * mantissa bits, so the sum equals (first 4 digest bytes as a
    * big-endian unsigned int) / 2^32 exactly, and the clamp chain is
    * the same least/greatest pair.
    */
  def md5Uniform32(key: UTF8String): Double = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(key.getBytes)
    val n = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
    val u = n.toDouble / 4294967296.0
    Math.min(Math.max(u, 1e-9), 1.0 - 1e-9)
  }
}

/** The repo's seeded-uniform convention (Sampling.md5Uniform) as ONE
  * native codegen'd expression: u = Σ_{i=1..8} hexdigit_i(md5(key))/16^i,
  * clamped to [1e-9, 1-1e-9]. The expression-tree form paid, per row,
  * an md5-hex UTF8String materialization plus eight substring+strpos
  * expression evaluations over it; bootstrap queries evaluate this on
  * |rows| × replicates inputs, where that overhead was the dominant
  * per-task cost. The DuckDB oracle keeps replaying the strpos
  * arithmetic — the kernel is bit-identical (SamplingSpec pins it
  * against the old tree).
  */
case class Md5Uniform32(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    SeededUniformKernels.md5Uniform32(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SeededUniformKernels.md5Uniform32($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SeededUniform {
  import ColumnOps._
  def md5_uniform32(key: Column): Column =
    toColumn(Md5Uniform32(toExpr(key)))
}
