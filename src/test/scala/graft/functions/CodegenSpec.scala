package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Guards the codegen path of every native expression: generating an
  * UnsafeProjection compiles the emitted Java directly (no interpreted
  * fallback at this API level), so a static-call kernel that Janino
  * cannot resolve fails HERE instead of silently degrading the whole
  * stage to interpreted eval in production plans.
  */
class CodegenSpec extends SparkSpec {

  test("text expressions compile under codegen and agree with interpreted eval") {
    val text = BoundReference(0, StringType, nullable = true)
    val sh = HashedShingles(text, 3)
    val exprs = Seq(sh, MinHashSignature(sh, 8), SimHash64(sh),
      RollingHash(text, 31L), CodePointRollingHash(text, 31L, 97L),
      SortedIntersectCount(sh, sh), BpeishTokenCount(text),
      HashedNgramCountsExpr(text, 64))
    val proj = GenerateUnsafeProjection.generate(exprs) // throws on Janino failure
    val input = InternalRow(UTF8String.fromString("the quick brown fox jumps"))
    val row = proj(input)
    // codegen result == interpreted result, field by field
    assert(row.getArray(0).toLongArray().toSeq ==
      exprs(0).eval(input).asInstanceOf[GenericArrayData].toLongArray().toSeq)
    assert(row.getArray(1).toLongArray().toSeq ==
      exprs(1).eval(input).asInstanceOf[GenericArrayData].toLongArray().toSeq)
    (2 until 5).foreach { i =>
      assert(row.getLong(i) == exprs(i).eval(input).asInstanceOf[Long])
    }
    assert(row.getInt(5) == row.getArray(0).numElements()) // self-intersection
    assert(row.getInt(6) == exprs(6).eval(input).asInstanceOf[Int])
    assert(row.getArray(7).toLongArray().toSeq ==
      exprs(7).eval(input).asInstanceOf[GenericArrayData].toLongArray().toSeq)
    assert(row.getArray(7).toLongArray().sum == 9L) // 5 unigrams + 4 bigrams
  }

  test("BpeMergeExpr compiles under codegen and agrees with interpreted eval") {
    val arr = BoundReference(0, ArrayType(StringType), nullable = true)
    val e = BpeMergeExpr(arr, "a", "b")
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    val input = InternalRow(new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), UTF8String.fromString("b"),
      UTF8String.fromString("a"))))
    val row = proj(input)
    val interp = e.eval(input)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(row.getArray(0).numElements() == 2) // [ab, a]
    assert((0 until 2).forall(i =>
      row.getArray(0).getUTF8String(i) == interp.getUTF8String(i)))
  }

  test("vector expressions compile under codegen and agree with interpreted eval") {
    val vec = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val exprs = Seq(HyperplaneSignature(vec, 16, 42L),
      CosineSimilarity(vec, vec), DotProduct(vec, vec))
    val proj = GenerateUnsafeProjection.generate(exprs)
    val input = InternalRow(new GenericArrayData(Array(0.5, -1.5, 2.0)))
    val row = proj(input)
    assert(row.getLong(0) == exprs(0).eval(input).asInstanceOf[Long])
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12) // cos(v, v) = 1
    assert(row.getDouble(2) == 0.25 + 2.25 + 4.0)
  }

  test("argmax cell expressions compile under codegen; ties take the larger index") {
    val vec = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val cents = BoundReference(1,
      ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false), nullable = true)
    // centroids 0 and 2 identical → the tie must resolve to index 2 in
    // BOTH the reference-object and column-matrix forms
    val matrix = Vector(Vector(1.0, 0.0), Vector(0.0, 1.0), Vector(1.0, 0.0))
    val exprs = Seq(ArgmaxCellExpr(vec, matrix), ArgmaxCellsExpr(vec, cents))
    val proj = GenerateUnsafeProjection.generate(exprs)
    val input = InternalRow(
      new GenericArrayData(Array(3.0, 0.1)),
      new GenericArrayData(matrix.map(c =>
        new GenericArrayData(c.toArray)).toArray[Any]))
    val row = proj(input)
    assert(row.getInt(0) == 2 && row.getInt(1) == 2)
    // codegen == interpreted, both forms
    assert(exprs(0).eval(input) == 2 && exprs(1).eval(input) == 2)
    // a vector nearest centroid 1 picks it in both forms
    val input2 = InternalRow(
      new GenericArrayData(Array(0.1, 5.0)),
      new GenericArrayData(matrix.map(c =>
        new GenericArrayData(c.toArray)).toArray[Any]))
    val row2 = proj(input2)
    assert(row2.getInt(0) == 1 && row2.getInt(1) == 1)
  }

  test("TopCellsExpr compiles under codegen; ordering matches the array_sort form") {
    val vec = BoundReference(0, ArrayType(DoubleType), nullable = true)
    // centroids 0 and 3 identical (tie), 1 nearest, 2 orthogonal-ish:
    // descending (sim, idx) with ties taking the LARGER index first
    val matrix = Vector(Vector(1.0, 0.0), Vector(3.0, 0.4),
                        Vector(0.0, 1.0), Vector(1.0, 0.0))
    val expr = TopCellsExpr(vec, matrix, nprobe = 3)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val input = InternalRow(new GenericArrayData(Array(3.0, 0.1)))
    val row = proj(input)
    // cos vs (1,0) ≈ 0.99944 (cells 0 and 3 tie → 3 first, then 0),
    // vs (3,0.4) ≈ 0.99508, vs (0,1) ≈ 0.0333
    assert(row.getArray(0).toIntArray().toSeq == Seq(3, 0, 1))
    // codegen == interpreted
    assert(expr.eval(input).asInstanceOf[GenericArrayData]
      .toIntArray().toSeq == Seq(3, 0, 1))
    // nprobe > nlist degenerates to all cells, still ordered
    val all = TopCellsExpr(vec, matrix, nprobe = 10)
    assert(all.eval(input).asInstanceOf[GenericArrayData]
      .toIntArray().toSeq == Seq(3, 0, 1, 2))
  }

  test("MaxCellCosineExpr compiles under codegen; returns the best cosine") {
    val vec = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val matrix = Vector(Vector(1.0, 0.0), Vector(0.0, 1.0))
    val expr = MaxCellCosineExpr(vec, matrix)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val input = InternalRow(new GenericArrayData(Array(3.0, 4.0)))
    val row = proj(input)
    // max(cos vs x-axis, cos vs y-axis) = max(0.6, 0.8) = 0.8
    assert(math.abs(row.getDouble(0) - 0.8) < 1e-12)
    // codegen == interpreted
    assert(math.abs(expr.eval(input).asInstanceOf[Double] - 0.8) < 1e-12)
  }

  test("SemDedupCellExpr compiles under codegen; greedy mapping is exact") {
    val memberType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(DoubleType, containsNull = false),
        nullable = false))), containsNull = false)
    val members = BoundReference(0, memberType, nullable = true)
    val expr = SemDedupCellExpr(members, threshold = 0.9)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    // ids deliberately out of order: 7 ∥ 3 (cosine 1), 5 orthogonal
    def m(id: Long, v: Array[Double]) =
      InternalRow(id, new GenericArrayData(v))
    val input = InternalRow(new GenericArrayData(Array[Any](
      m(7L, Array(2.0, 0.0)), m(3L, Array(1.0, 0.0)), m(5L, Array(0.0, 1.0)))))
    val row = proj(input)
    val got = row.getArray(0)
    assert(got.numElements() == 1)
    assert(got.getStruct(0, 2).getLong(0) == 7L) // removed
    assert(got.getStruct(0, 2).getLong(1) == 3L) // keeper = smaller id
    // codegen == interpreted
    val interp = expr.eval(input).asInstanceOf[GenericArrayData]
    assert(interp.numElements() == 1 &&
      interp.getStruct(0, 2).getLong(0) == 7L &&
      interp.getStruct(0, 2).getLong(1) == 3L)
  }

  test("JaroWinklerSim compiles under codegen and agrees with interpreted eval") {
    val a = BoundReference(0, StringType, nullable = true)
    val b = BoundReference(1, StringType, nullable = true)
    val e = JaroWinklerSim(a, b)
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    val cases = Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"), ("", ""), ("a", ""),
      ("same", "same"), ("abc", "xyz"), ("h\u00e9llo", "hello"))
    cases.foreach { case (x, y) =>
      val in = InternalRow(UTF8String.fromString(x), UTF8String.fromString(y))
      assert(proj(in).getDouble(0) == e.eval(in).asInstanceOf[Double],
        s"codegen/interpreted skew on ($x, $y)")
    }
  }

  test("jaroWinkler kernel: reference values and the DuckDB contract") {
    def jw(a: String, b: String): Double =
      TextKernels.jaroWinkler(UTF8String.fromString(a),
        UTF8String.fromString(b))
    // Winkler's canonical examples
    assert(math.rint(jw("martha", "marhta") * 1e6) / 1e6 == 0.961111)
    assert(math.rint(jw("dixon", "dicksonx") * 1e6) / 1e6 == 0.813333)
    // the DuckDB empty rule: EITHER empty (including both) => 0
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0 && jw("", "a") == 0.0)
    assert(jw("same", "same") == 1.0)
    // no matches within the window => 0
    assert(jw("abc", "xyz") == 0.0)
    // boost threshold: jaro = 2/3 <= 0.7 gets NO prefix bonus despite
    // the 4-byte shared prefix (duckdb-verified constant)
    assert(jw("abcdefgh", "abcdxyzw") == 0.6666666666666666)
    // prefix cap at 4: jaro = 7/9 with an 8-byte shared prefix boosts
    // by exactly 4*0.1*(1-j), not 8 (duckdb-verified constant; an
    // uncapped boost would give 0.9555...)
    assert(jw("abcdefghijkl", "abcdefghxyzw") == 0.8666666666666666)
    assert(jw("prefab", "prefab-extra") == 0.9)
    // byte alphabet: multi-byte code points compare per byte
    // (duckdb-verified value for ("h\u00e9llo","hello") = 0.84000000...01)
    assert(jw("h\u00e9llo", "hello") == 0.8400000000000001)
  }

  test("DamerauLevenshteinDist compiles under codegen and matches reference values") {
    val a = BoundReference(0, StringType, nullable = true)
    val b = BoundReference(1, StringType, nullable = true)
    val e = DamerauLevenshteinDist(a, b)
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    // (pair, expected) — duckdb-verified, incl. the OSA-vs-full-DL
    // discriminator "ca"->"abc" (full DL = 2; OSA would say 3)
    val cases = Seq(
      (("ca", "abc"), 2), (("abcd", "acbd"), 1), (("ab", "ba"), 1),
      (("martha", "marhta"), 1), (("", "abc"), 3), (("same", "same"), 0),
      (("kitten", "sitting"), 3))
    cases.foreach { case ((x, y), want) =>
      val in = InternalRow(UTF8String.fromString(x), UTF8String.fromString(y))
      assert(proj(in).getInt(0) == want, s"($x, $y)")
      assert(e.eval(in).asInstanceOf[Int] == want)
    }
  }
}
