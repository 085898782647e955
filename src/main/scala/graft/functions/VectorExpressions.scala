package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Kernel for [[ArgmaxCellExpr]]: index of the max-cosine centroid
    * for one vector — ties take the LARGER index and NaN compares
    * greatest, matching Spark's struct-ordering `array_max` over
    * (sim, idx) structs (the expression-tree form this kernel
    * replaces). One primitive double loop over an nlist × dim matrix;
    * cosine arithmetic matches [[CosineSimilarity]] exactly.
    */
  def argmaxCell(v: ArrayData, cents: Array[Array[Double]],
                 floatElems: Boolean): Int = {
    val x: Array[Double] =
      if (floatElems) {
        val f = v.toFloatArray()
        val out = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
        out
      } else v.toDoubleArray()
    var best = Double.NegativeInfinity
    var idx = 0
    var c = 0
    while (c < cents.length) {
      val y = cents(c)
      if (x.length != y.length)
        throw new IllegalArgumentException(
          s"dim mismatch: ${x.length} vs centroid $c of ${y.length}")
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var d = 0
      while (d < x.length) {
        dot += x(d) * y(d); nx += x(d) * x(d); ny += y(d) * y(d); d += 1
      }
      val s = dot / (math.sqrt(nx) * math.sqrt(ny))
      if (java.lang.Double.compare(s, best) >= 0) { best = s; idx = c }
      c += 1
    }
    idx
  }

  /** Kernel for [[ArgmaxCellsExpr]] — same argmax/tie/NaN semantics as
    * [[argmaxCell]] but the centroid matrix arrives as a COLUMN value
    * (ARRAY<ARRAY<DOUBLE>>) instead of a codegen reference object, so
    * different rows can score against different matrices. This is the
    * within-coarse-cell assign of the two-level quantizer: the fine
    * centroids ride a DataFrame keyed by coarse cell and join to the
    * vectors, never the driver.
    */
  /** Max cosine against a fixed matrix — the scoring twin of
    * [[argmaxCell]]: the same primitive rows × dim loop, returning the
    * best similarity itself instead of its index (NaN compares
    * greatest, matching argmaxCell's ordering). Backs the broadcast
    * side of embedding-space decontamination, where only "how close is
    * the closest eval vector" matters, not which one.
    */
  def maxCellCosine(v: ArrayData, cents: Array[Array[Double]],
                    floatElems: Boolean): Double = {
    val x: Array[Double] =
      if (floatElems) {
        val f = v.toFloatArray()
        val out = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
        out
      } else v.toDoubleArray()
    var best = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val y = cents(c)
      if (x.length != y.length)
        throw new IllegalArgumentException(
          s"dim mismatch: ${x.length} vs centroid $c of ${y.length}")
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var d = 0
      while (d < x.length) {
        dot += x(d) * y(d); nx += x(d) * x(d); ny += y(d) * y(d); d += 1
      }
      val s = dot / (math.sqrt(nx) * math.sqrt(ny))
      if (java.lang.Double.compare(s, best) >= 0) best = s
      c += 1
    }
    best
  }

  /** Kernel for [[TopCellsExpr]]: indices of the `nprobe` max-cosine
    * centroids for one vector, best first — [[argmaxCell]] generalized
    * from top-1 to top-n. Ordering matches the expression-tree form it
    * replaces (`slice(reverse(array_sort(array(struct(sim, idx)))))`):
    * descending by (sim, idx) with NaN comparing greatest, so ties
    * take the LARGER index first. Selection is nprobe passes of
    * argmax over the scored array — O(nlist·(dim + nprobe)) per row,
    * constant generated code size, vs the array_sort form whose
    * generated method grows linearly in nlist and blows the JIT/64KB
    * limits at index-quality nlist (the same collapse the corpus-side
    * assign hit at nlist≈80 — docs/PERF_NOTES.md).
    */
  def topCells(v: ArrayData, cents: Array[Array[Double]], nprobe: Int,
               floatElems: Boolean): ArrayData = {
    val x: Array[Double] =
      if (floatElems) {
        val f = v.toFloatArray()
        val out = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
        out
      } else v.toDoubleArray()
    val n = cents.length
    val sims = new Array[Double](n)
    var c = 0
    while (c < n) {
      val y = cents(c)
      if (x.length != y.length)
        throw new IllegalArgumentException(
          s"dim mismatch: ${x.length} vs centroid $c of ${y.length}")
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var d = 0
      while (d < x.length) {
        dot += x(d) * y(d); nx += x(d) * x(d); ny += y(d) * y(d); d += 1
      }
      sims(c) = dot / (math.sqrt(nx) * math.sqrt(ny))
      c += 1
    }
    val m = math.min(nprobe, n)
    val out = new Array[Any](m)
    val taken = new Array[Boolean](n)
    var p = 0
    while (p < m) {
      var best = Double.NegativeInfinity
      var idx = -1
      c = 0
      while (c < n) {
        // >= : ties (and NaN, comparing greatest) take the larger index,
        // matching the reversed-array_sort struct ordering
        if (!taken(c) && (idx < 0 ||
            java.lang.Double.compare(sims(c), best) >= 0)) {
          best = sims(c); idx = c
        }
        c += 1
      }
      taken(idx) = true
      out(p) = idx
      p += 1
    }
    new GenericArrayData(out)
  }

  def argmaxCellCol(v: ArrayData, cents: ArrayData,
                    floatElems: Boolean): Int = {
    val x: Array[Double] =
      if (floatElems) {
        val f = v.toFloatArray()
        val out = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
        out
      } else v.toDoubleArray()
    val n = cents.numElements()
    if (n == 0)
      throw new IllegalArgumentException("argmax over an empty centroid list")
    var best = Double.NegativeInfinity
    var idx = 0
    var c = 0
    while (c < n) {
      val y = cents.getArray(c)
      if (x.length != y.numElements())
        throw new IllegalArgumentException(
          s"dim mismatch: ${x.length} vs centroid $c of ${y.numElements()}")
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var d = 0
      while (d < x.length) {
        val yd = y.getDouble(d)
        dot += x(d) * yd; nx += x(d) * x(d); ny += yd * yd; d += 1
      }
      val s = dot / (math.sqrt(nx) * math.sqrt(ny))
      if (java.lang.Double.compare(s, best) >= 0) { best = s; idx = c }
      c += 1
    }
    idx
  }

  /** Kernel for [[SemDedupCellExpr]]: greedy within-cell SemDeDup over
    * one cell's member array — members scan in ascending id order, and
    * each member is removed by the FIRST (= smallest-id) earlier member
    * whose cosine clears `threshold`. Per-pair arithmetic is identical
    * to [[CosineSimilarity]] (same accumulation order, so audits that
    * recompute `cosine_sim` see bit-equal values; per-member norm terms
    * are hoisted — the same double each pair would recompute). No pair
    * rows ever materialize: the O(sz²)-worst-case loop runs inside one
    * expression eval over the already-capped member array, and the
    * ascending scan breaks at the first keeper, so dup-heavy cells run
    * far below sz².
    */
  def semDedupCell(members: ArrayData, threshold: Double,
                   floatElems: Boolean): ArrayData = {
    val n = members.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val a = row.getArray(1)
      vecs(i) =
        if (floatElems) {
          val f = a.toFloatArray()
          val out = new Array[Double](f.length)
          var d = 0
          while (d < f.length) { out(d) = f(d).toDouble; d += 1 }
          out
        } else a.toDoubleArray()
      i += 1
    }
    val order = Array.range(0, n).sortBy(ids(_))
    val norms = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = vecs(i)
      var nx = 0.0; var d = 0
      while (d < x.length) { nx += x(d) * x(d); d += 1 }
      norms(i) = math.sqrt(nx)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var bi = 1
    while (bi < n) {
      val b = order(bi)
      val y = vecs(b)
      var ai = 0
      var found = false
      while (ai < bi && !found) {
        val a = order(ai)
        val x = vecs(a)
        if (x.length != y.length)
          throw new IllegalArgumentException(
            s"dim mismatch: ${x.length} vs ${y.length}")
        var dot = 0.0; var d = 0
        while (d < x.length) { dot += x(d) * y(d); d += 1 }
        if (dot / (norms(a) * norms(b)) >= threshold) {
          out += new GenericInternalRow(Array[Any](ids(b), ids(a)))
          found = true
        }
        ai += 1
      }
      bi += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def asDoubles(v: ArrayData, floatElems: Boolean): Array[Double] =
    if (floatElems) {
      val f = v.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    } else v.toDoubleArray()

  /** Kernel for [[PqEncodeExpr]]: product-quantization encode — the
    * vector splits into `codebook.length` contiguous subvectors and
    * each maps to the index of its L2-nearest codeword in that
    * subspace's codebook (ties → the SMALLER index, the first-seen
    * argmin). Output is one short per subspace: the 8-32× storage
    * compression that makes a 100 TB ANN index scannable.
    */
  def pqEncode(v: ArrayData, codebook: Array[Array[Array[Double]]],
               floatElems: Boolean): ArrayData = {
    val x = asDoubles(v, floatElems)
    val m = codebook.length
    val out = new Array[Any](m)
    var off = 0
    var mi = 0
    while (mi < m) {
      val words = codebook(mi)
      val dsub = words(0).length
      if (off + dsub > x.length)
        throw new IllegalArgumentException(
          s"codebook dims exceed vector length ${x.length}")
      var best = Double.PositiveInfinity
      var idx = 0
      var w = 0
      while (w < words.length) {
        val c = words(w)
        var dist = 0.0; var d = 0
        while (d < dsub) {
          val diff = x(off + d) - c(d); dist += diff * diff; d += 1
        }
        if (dist < best) { best = dist; idx = w }
        w += 1
      }
      out(mi) = idx.toShort
      off += dsub
      mi += 1
    }
    if (off != x.length)
      throw new IllegalArgumentException(
        s"codebook dims $off != vector length ${x.length}")
    new GenericArrayData(out)
  }

  /** Kernel for [[PqDecodeExpr]]: reconstruction — concatenate the
    * codewords the code array points at. Exact inverse of
    * [[pqEncode]] when every distinct subvector is a codeword.
    */
  def pqDecode(codes: ArrayData, codebook: Array[Array[Array[Double]]])
      : ArrayData = {
    val m = codebook.length
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"code length ${codes.numElements()} != $m subspaces")
    var n = 0
    var mi = 0
    while (mi < m) { n += codebook(mi)(0).length; mi += 1 }
    val out = new Array[Any](n)
    var off = 0
    mi = 0
    while (mi < m) {
      val c = codebook(mi)(codes.getShort(mi).toInt)
      var d = 0
      while (d < c.length) { out(off + d) = c(d); d += 1 }
      off += c.length
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Kernel for [[PqAdcExpr]]: asymmetric-distance cosine — cosine
    * between the UNCOMPRESSED query and the compressed row's
    * reconstruction, computed without materializing it: the dot and
    * the reconstruction norm² accumulate subspace-by-subspace
    * (subspaces are disjoint slices, so |recon|² = Σ_m |codeword_m|²).
    * O(dim) per row like the raw scan, but over an 8-32×-smaller
    * payload — at 100 TB the scan is IO-bound and the compression IS
    * the speedup.
    */
  def pqAdcCosine(codes: ArrayData, q: ArrayData,
                  codebook: Array[Array[Array[Double]]],
                  floatElems: Boolean): Double = {
    val y = asDoubles(q, floatElems)
    val m = codebook.length
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"code length ${codes.numElements()} != $m subspaces")
    var dot = 0.0; var nr = 0.0; var ny = 0.0
    var off = 0
    var mi = 0
    while (mi < m) {
      val c = codebook(mi)(codes.getShort(mi).toInt)
      if (off + c.length > y.length)
        throw new IllegalArgumentException(
          s"codebook dims exceed query length ${y.length}")
      var d = 0
      while (d < c.length) {
        val yd = y(off + d)
        dot += c(d) * yd; nr += c(d) * c(d); ny += yd * yd; d += 1
      }
      off += c.length
      mi += 1
    }
    if (off != y.length)
      throw new IllegalArgumentException(
        s"codebook dims $off != query length ${y.length}")
    dot / (math.sqrt(nr) * math.sqrt(ny))
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

/** Argmax-cosine cell assignment against a FIXED centroid matrix (the
  * k-means/IVF assign step). The matrix rides the expression as a
  * codegen reference object, so assignment is one primitive
  * nlist × dim loop per row — where the expression-tree form (an
  * `array_max` over nlist per-centroid `cosine_sim` subtrees) grows
  * the generated code linearly in nlist and fell off a cliff at
  * nlist ≈ 80 (540 s for a 20k-row assign; docs/PERF_NOTES.md).
  */
case class ArgmaxCellExpr(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(centroids.nonEmpty, "centroids must be non-empty")
  override def dataType: DataType = IntegerType
  override def inputTypes =
    Seq(org.apache.spark.sql.graftshim.Bridge.vectorArrayType)

  // constructor keeps Seq (structural equals → semanticEquals and
  // common-subexpression elimination work); the kernel's primitive
  // matrix materializes lazily, once per (de)serialized instance
  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.argmaxCell(v.asInstanceOf[ArrayData], matrix, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.argmaxCell($c, $ref, $floatElems);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Top-`nprobe` cell indices by cosine against a FIXED centroid matrix
  * (best first) — [[ArgmaxCellExpr]] generalized from top-1 to top-n:
  * the probe-selection step of an IVF query. Same reference-object
  * shape, so generated code stays CONSTANT-size in nlist; the
  * expression-tree alternative (`slice(reverse(array_sort(array(nlist
  * struct-cosine exprs))))`) regrows codegen linearly in nlist — the
  * exact shape whose corpus-side twin collapsed at nlist≈80
  * (docs/PERF_NOTES.md) — and index-quality nlist is in the thousands.
  * Ordering is identical to that form: descending (sim, idx), NaN
  * greatest, ties → larger index first.
  */
case class TopCellsExpr(child: Expression, centroids: Seq[Seq[Double]],
                        nprobe: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(centroids.nonEmpty, "centroids must be non-empty")
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes =
    Seq(org.apache.spark.sql.graftshim.Bridge.vectorArrayType)

  // Seq constructor for structural equals (CSE/canonicalization — see
  // ArgmaxCellExpr); the primitive matrix materializes lazily
  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.topCells(v.asInstanceOf[ArrayData], matrix, nprobe, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.topCells($c, $ref, $nprobe, $floatElems);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Max cosine against a FIXED vector matrix (the scoring twin of
  * [[ArgmaxCellExpr]] — same codegen reference-object shape, returning
  * the best similarity instead of its index). Backs embedding-space
  * benchmark decontamination: the eval matrix rides the expression, so
  * scoring a corpus row against every eval vector is one primitive
  * loop with no join and no per-eval expression growth.
  */
case class MaxCellCosineExpr(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(centroids.nonEmpty, "centroids must be non-empty")
  override def dataType: DataType = DoubleType
  override def inputTypes =
    Seq(org.apache.spark.sql.graftshim.Bridge.vectorArrayType)

  // constructor keeps Seq (structural equals → semanticEquals and
  // common-subexpression elimination work); the kernel's primitive
  // matrix materializes lazily, once per (de)serialized instance
  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.maxCellCosine(v.asInstanceOf[ArrayData], matrix, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.maxCellCosine($c, $ref, $floatElems);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Argmax-cosine cell assignment against a PER-ROW centroid matrix
  * (ARRAY<ARRAY<DOUBLE>>) — the fine-assign step of the two-level
  * quantizer, where each coarse cell carries its own fine-centroid
  * array and the matrix arrives via a join rather than the driver.
  * Same tie (larger index) and NaN (greatest) semantics as
  * [[ArgmaxCellExpr]].
  */
case class ArgmaxCellsExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes =
    Seq(org.apache.spark.sql.graftshim.Bridge.vectorArrayType,
        ArrayType(ArrayType(DoubleType)))

  private def floatElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(v: Any, cents: Any): Any =
    VectorKernels.argmaxCellCol(v.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.VectorKernels.argmaxCellCol($v, $c, $floatElems);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Greedy within-cell SemDeDup over a collected member array
  * (ARRAY<STRUCT<id, vec>>) → ARRAY<STRUCT<removed_id, keeper_id>> —
  * the whole quadratic pair stage of `Similarity.semDedup` as ONE
  * expression eval per cell row. The row-level alternative (explode ×
  * explode × cosine filter × min groupBy) materializes two full
  * vectors per candidate pair: minutes of row churn on dup-heavy
  * cells where this kernel's break-at-first-keeper scan takes
  * seconds (docs/PERF_NOTES.md).
  */
case class SemDedupCellExpr(child: Expression, threshold: Double)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("removed_id", LongType, nullable = false),
    StructField("keeper_id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _)
        if f0.dataType == LongType &&
           (f1.dataType == ArrayType(FloatType, false) ||
            f1.dataType == ArrayType(FloatType, true) ||
            f1.dataType == ArrayType(DoubleType, false) ||
            f1.dataType == ArrayType(DoubleType, true)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected ARRAY<STRUCT<BIGINT, ARRAY<FLOAT|DOUBLE>>>, got $t")
    }

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    VectorKernels.semDedupCell(v.asInstanceOf[ArrayData], threshold, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.semDedupCell($c, $threshold, $floatElems);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Product-quantization encode against a FIXED codebook
  * (m subspaces × ksub codewords × dsub dims) riding the expression as
  * a codegen reference object — the same driver-bounded-matrix pattern
  * as [[ArgmaxCellExpr]] (the codebook is ksub × dim doubles total,
  * independent of corpus size). Output ARRAY<SMALLINT>, one code per
  * subspace. Subspaces may hold FEWER than ksub codewords (a slice
  * with fewer distinct subvectors than ksub trains a smaller
  * codebook); codes always index within their own subspace.
  */
case class PqEncodeExpr(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "codebook must have >= 1 codeword per subspace")
  require(codebook.forall(s => s.forall(_.length == s.head.length)),
    "codewords within a subspace must share a dimension")
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def inputTypes =
    Seq(org.apache.spark.sql.graftshim.Bridge.vectorArrayType)

  // Seq constructor for structural equals (CSE/canonicalization — see
  // ArgmaxCellExpr); the primitive matrix materializes lazily
  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqEncode(v.asInstanceOf[ArrayData], matrix, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", matrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.pqEncode($c, $ref, $floatElems);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Reconstruction of a PQ code array: concatenated codewords
  * (ARRAY<DOUBLE>). The audit/debug inverse of [[PqEncodeExpr]] — and
  * the quantization-distortion measurement path (MSE between vector
  * and reconstruction).
  */
case class PqDecodeExpr(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "codebook must have >= 1 codeword per subspace")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def inputTypes = Seq(ArrayType(ShortType))

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqDecode(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", matrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.pqDecode($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Asymmetric-distance cosine between a PQ code array (left) and an
  * uncompressed query vector (right): cosine(query, reconstruction)
  * computed subspace-by-subspace without materializing the
  * reconstruction. Accumulation order matches [[CosineSimilarity]]
  * index-for-index, so when the codebook reconstructs a vector
  * exactly the score is bit-equal to the exact cosine.
  */
case class PqAdcExpr(left: Expression, right: Expression,
                     codebook: Seq[Seq[Seq[Double]]])
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "codebook must have >= 1 codeword per subspace")
  override def dataType: DataType = DoubleType
  override def inputTypes =
    Seq(ArrayType(ShortType),
        org.apache.spark.sql.graftshim.Bridge.vectorArrayType)

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  private def floatElems: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(codes: Any, q: Any): Any =
    VectorKernels.pqAdcCosine(codes.asInstanceOf[ArrayData],
      q.asInstanceOf[ArrayData], matrix, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", matrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.functions.VectorKernels.pqAdcCosine($c, $q, $ref, $floatElems);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorFunctions {
  import ColumnOps._
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpr(a), toExpr(b)))
  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpr(a), toExpr(b)))
  def hyperplane_sig(v: Column, numBits: Int, seed: Long = 42L): Column =
    toColumn(HyperplaneSignature(toExpr(v), numBits, seed))
  def sem_dedup_cell(members: Column, threshold: Double): Column =
    toColumn(SemDedupCellExpr(toExpr(members), threshold))
  def argmax_cell(v: Column, centroids: Seq[Seq[Double]]): Column =
    toColumn(ArgmaxCellExpr(toExpr(v),
      centroids.map(_.toIndexedSeq).toIndexedSeq))
  def argmax_cells(v: Column, centroids: Column): Column =
    toColumn(ArgmaxCellsExpr(toExpr(v), toExpr(centroids)))
  def top_cells(v: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    toColumn(TopCellsExpr(toExpr(v),
      centroids.map(_.toIndexedSeq).toIndexedSeq, nprobe))
  def max_cell_cosine(v: Column, centroids: Seq[Seq[Double]]): Column =
    toColumn(MaxCellCosineExpr(toExpr(v),
      centroids.map(_.toIndexedSeq).toIndexedSeq))
  private def deepIndexed(cb: Seq[Seq[Seq[Double]]]) =
    cb.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq
  def pq_encode(v: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    toColumn(PqEncodeExpr(toExpr(v), deepIndexed(codebook)))
  def pq_decode(codes: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    toColumn(PqDecodeExpr(toExpr(codes), deepIndexed(codebook)))
  def pq_adc(codes: Column, qvec: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    toColumn(PqAdcExpr(toExpr(codes), toExpr(qvec), deepIndexed(codebook)))
}
