package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document fingerprinting. */

/** 64-bit SimHash over pre-hashed features: each feature hash votes ±1
  * per bit position; the sign of the per-bit sum becomes the output bit.
  * Near-duplicate documents land within a small Hamming distance.
  * Input: ARRAY<LONG> of feature (token/shingle) hashes.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val hashes = v.asInstanceOf[ArrayData].toLongArray()
    val votes = new Array[Int](64)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Polynomial rolling hash of a string (Rabin-Karp form): fingerprint =
  * Σ c_i · base^(n-1-i) in Long arithmetic (wrapping — deterministic on
  * the JVM). One pass, O(length), no allocation.
  */
case class RollingHash(child: Expression, base: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * base + (bytes(i) & 0xff); i += 1 }
    h
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Modular polynomial rolling hash over Unicode CODE POINTS:
  * fingerprint = (Σ cp_i · base^(n-1-i)) mod `mod`, evaluated with
  * Horner's rule so intermediates stay < mod·base (no overflow for
  * mod < 2^31, base < 2^31). Code points (not UTF-8 bytes) and an
  * explicit modulus make the value recomputable by any engine with
  * plain 64-bit integer arithmetic — the DuckDB oracle mirrors it via
  * list_reduce over string_split(text, '') (Oracle.sql t11).
  */
case class CodePointRollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextFunctions {
  import ColumnOps._
  def simhash64(featureHashes: Column): Column =
    toColumn(SimHash64(toExpr(featureHashes)))
  def rolling_hash(s: Column, base: Long = 1000003L): Column =
    toColumn(RollingHash(toExpr(s), base))
  def rolling_hash_mod(s: Column, base: Long = 1000003L,
                       mod: Long = 2147483647L): Column =
    toColumn(CodePointRollingHash(toExpr(s), base, mod))
}
