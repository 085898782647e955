package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking kernel (the FastCDC/rsync family: Muthitacharoen
  * et al., LBFS SOSP'01; Xia et al., FastCDC ATC'16): split a text into
  * variable-size chunks whose boundaries are decided by the CONTENT (a
  * rolling-hash condition over the trailing window), not by fixed offsets —
  * so inserting or deleting a prefix only perturbs the chunks that overlap
  * the edit, and every later boundary re-synchronizes. That property is what
  * makes chunk-level dedup catch shifted/edited near-duplicates that
  * fixed-stride shingling misses.
  *
  * Boundary rule (engine-portable by construction — a SQL oracle replays it
  * with `list_reduce` arithmetic, no bit tricks):
  *  - H(p) = Horner hash of the last `w` code points ending at 1-based
  *    position p, each step `(h * base + cp) % mod` — the same residue
  *    chain as [[TextKernels.codePointRollingHash]] restricted to a window.
  *  - position p is an ANCHOR iff p >= w and H(p) % divisor == 0.
  *  - scanning from chunk start s (0-based): the chunk ends at the first
  *    anchor p in [s+minLen, s+maxLen], else at min(s+maxLen, n) — i.e.
  *    cut(s) = least(nextAnchor(s+minLen), s+maxLen, n). The last chunk may
  *    be shorter than minLen (it is the remainder).
  *
  * One O(n) pass per document with O(w) rolling state; no shuffle. The
  * expression participates in whole-stage codegen via a static kernel call
  * (same pattern as every [[TextKernels]] expression).
  */
object ChunkKernels {

  /** Returns ARRAY<STRUCT<start INT (1-based code point), len INT (code
    * points), chunk STRING>> — empty array for empty text.
    */
  def contentChunks(text: UTF8String, w: Int, base: Long, mod: Long,
                    divisor: Long, minLen: Int, maxLen: Int): ArrayData = {
    val s = text.toString
    val nChars = s.length
    // code points + the char offset of each code point (for slicing)
    var n = 0
    var ci = 0
    while (ci < nChars) { n += 1; ci += Character.charCount(s.codePointAt(ci)) }
    val cps = new Array[Int](n)
    val charOff = new Array[Int](n + 1)
    var i = 0
    ci = 0
    while (ci < nChars) {
      val cp = s.codePointAt(ci)
      cps(i) = cp; charOff(i) = ci
      i += 1; ci += Character.charCount(cp)
    }
    charOff(n) = nChars
    // anchor(p) for 1-based end positions p in [w, n]: window-hash % divisor == 0.
    // Incremental update h' = ((h - cp_out*base^(w-1)) * base + cp_in) mod `mod`
    // keeps the exact per-step residues of the oracle's oldest-to-newest
    // Horner fold (cp <= 0x10FFFF and base^(w-1) mod < 2^31, so the product
    // stays under 2^52 — no Long overflow).
    val anchor = new Array[Boolean](n + 1)
    if (n >= w) {
      var bpow = 1L
      var j = 0
      while (j < w - 1) { bpow = (bpow * base) % mod; j += 1 }
      var h = 0L
      j = 0
      while (j < w) { h = (h * base + cps(j)) % mod; j += 1 }
      if (h % divisor == 0) anchor(w) = true
      var p = w
      while (p < n) {
        h = (h - (cps(p - w) * bpow) % mod + mod) % mod
        h = (h * base + cps(p)) % mod
        if (h % divisor == 0) anchor(p + 1) = true
        p += 1
      }
    }
    // sequential walk: cut(s) = first anchor in [s+minLen, min(s+maxLen, n)],
    // else min(s+maxLen, n)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var st = 0
    while (st < n) {
      val e = math.min(st + maxLen, n)
      var p = st + minLen
      var cut = -1
      while (cut < 0 && p <= e) { if (anchor(p)) cut = p; p += 1 }
      if (cut < 0) cut = e
      out += new GenericInternalRow(Array[Any](st + 1, cut - st,
        UTF8String.fromString(s.substring(charOff(st), charOff(cut)))))
      st = cut
    }
    new GenericArrayData(out.toArray)
  }
}

case class ContentChunksExpr(child: Expression, w: Int, base: Long, mod: Long,
                             divisor: Long, minLen: Int, maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 2, s"window must be >= 2, got $w")
  require(minLen >= 1 && maxLen >= minLen,
    s"need 1 <= minLen <= maxLen, got [$minLen, $maxLen]")
  require(mod > 1 && divisor > 1 && base > 1, "base/mod/divisor must be > 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false))), containsNull = false)
  override def inputTypes = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    ChunkKernels.contentChunks(v.asInstanceOf[UTF8String], w, base, mod,
      divisor, minLen, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkKernels.contentChunks($c, $w, " +
        s"${base}L, ${mod}L, ${divisor}L, $minLen, $maxLen);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object ChunkFunctions {
  import ColumnOps._

  /** Default parameters: 16-cp window, ~1/32 anchor density, chunks in
    * [24, 96] code points → ≈56-cp expected chunk. */
  def content_chunks(text: Column, w: Int = 16, base: Long = 257L,
                     mod: Long = 2147483647L, divisor: Long = 32L,
                     minLen: Int = 24, maxLen: Int = 96): Column =
    toColumn(ContentChunksExpr(toExpr(text), w, base, mod, divisor, minLen,
      maxLen))
}
