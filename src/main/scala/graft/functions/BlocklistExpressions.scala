package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern literal scanning — the C4/Gopher "bad-words" filter
  * primitive, done right for scale: ONE Aho–Corasick automaton pass per
  * document (O(n + matches), independent of the pattern count) instead
  * of P per-pattern regex/contains passes (O(P·n) — the naive plan
  * Catalyst builds from `col.contains(t1) || col.contains(t2) || …`,
  * which also regrows the codegen method linearly in P).
  *
  * Counting semantics per term: greedy leftmost NON-overlapping
  * occurrences — exactly what `indexOf`-advance produces and what a SQL
  * oracle replays with `(len(text) − len(replace(text, term, ''))) /
  * len(term)`. Terms are matched case-sensitively and independently
  * (a term that is a substring of another still counts its own hits).
  *
  * The automaton builds once per expression instance from the term list
  * (≈ Σ|term| trie nodes — a million-term blocklist is tens of MB of
  * driver state shipped as a codegen reference object, the same
  * broadcast-bounded pattern as the IVF centroid matrix) and scan state
  * is stamp-reset per row (O(touched terms), never O(P) per row).
  */
final class AhoCorasick(val terms: Array[String]) extends Serializable {
  require(terms.nonEmpty, "empty term list")
  require(terms.forall(_.nonEmpty), "empty-string term")
  require(terms.distinct.length == terms.length, "duplicate terms")

  val nTerms: Int = terms.length

  // trie (built eagerly — the instance is constructed once per plan)
  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Character, Integer]())
  private val emitBuf = scala.collection.mutable.ArrayBuffer(-1)
  private var failArr: Array[Int] = _
  private var dictArr: Array[Int] = _
  val termLen: Array[Int] = terms.map(_.length)

  terms.zipWithIndex.foreach { case (t, id) =>
    var node = 0
    var i = 0
    while (i < t.length) {
      val c = Character.valueOf(t.charAt(i))
      var next = children(node).get(c)
      if (next == null) {
        next = Integer.valueOf(children.length)
        children(node).put(c, next)
        children += new java.util.HashMap[Character, Integer]()
        emitBuf += -1
      }
      node = next.intValue()
      i += 1
    }
    emitBuf(node) = id
  }
  locally {
    val n = children.length
    failArr = new Array[Int](n)
    dictArr = new Array[Int](n)
    java.util.Arrays.fill(dictArr, -1)
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach((_, v) => queue.add(v))
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      // dict link: nearest proper-suffix node that emits a term
      val f = failArr(u)
      dictArr(u) = if (emitBuf(f) >= 0) f else dictArr(f)
      children(u).forEach { (c, v) =>
        var f2 = failArr(u)
        while (f2 != 0 && !children(f2).containsKey(c)) f2 = failArr(f2)
        val t = children(f2).get(c)
        failArr(v.intValue()) =
          if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
        queue.add(v)
      }
    }
  }
  private val emit: Array[Int] = emitBuf.toArray

  /** Per-thread scan state, stamp-reset so a row touching k terms costs
    * O(k) bookkeeping, not O(nTerms). */
  private final class ScanState {
    // Long stamps: an Int counter wraps after 2^31 rows on one
    // long-lived executor thread, at which point a stale stamp could
    // alias the current scan and leak counts across rows
    val stamp = new Array[Long](nTerms)
    val lastEnd = new Array[Int](nTerms)
    val cnt = new Array[Long](nTerms)
    val touched = new Array[Int](nTerms)
    var cur = 0L
  }
  @transient private lazy val tl: ThreadLocal[ScanState] =
    ThreadLocal.withInitial(() => new ScanState)

  /** Returns (distinct terms hit, total non-overlapping hits). */
  def scan(text: String): (Int, Long) = {
    val st = tl.get()
    st.cur += 1
    var nTouched = 0
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = Character.valueOf(text.charAt(i))
      while (node != 0 && !children(node).containsKey(c)) node = failArr(node)
      val nx = children(node).get(c)
      node = if (nx != null) nx.intValue() else 0
      var m = if (emit(node) >= 0) node else dictArr(node)
      while (m >= 0) {
        val id = emit(m)
        if (st.stamp(id) != st.cur) {
          st.stamp(id) = st.cur; st.lastEnd(id) = -1; st.cnt(id) = 0L
          st.touched(nTouched) = id; nTouched += 1
        }
        val start = i - termLen(id) + 1
        if (start > st.lastEnd(id)) { st.cnt(id) += 1L; st.lastEnd(id) = i }
        m = dictArr(m)
      }
      i += 1
    }
    var total = 0L
    var j = 0
    while (j < nTouched) { total += st.cnt(st.touched(j)); j += 1 }
    (nTouched, total)
  }
}

object BlocklistKernels {
  def multiContains(text: UTF8String, ac: AhoCorasick): AnyRef = {
    val (nTerms, total) = ac.scan(text.toString)
    new GenericInternalRow(Array[Any](nTerms, total, nTerms > 0))
  }
}

case class MultiContainsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StructType(Seq(
    StructField("n_terms", IntegerType, nullable = false),
    StructField("total_hits", LongType, nullable = false),
    StructField("blocked", BooleanType, nullable = false)))
  override def inputTypes = Seq(StringType)

  @transient private lazy val ac = new AhoCorasick(terms.toArray)

  override def nullSafeEval(v: Any): Any =
    BlocklistKernels.multiContains(v.asInstanceOf[UTF8String], ac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.expressions.GenericInternalRow) " +
        s"graft.functions.BlocklistKernels.multiContains($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object BlocklistFunctions {
  import ColumnOps._
  def multi_contains(text: Column, terms: Seq[String]): Column =
    toColumn(MultiContainsExpr(toExpr(text), terms))
}
