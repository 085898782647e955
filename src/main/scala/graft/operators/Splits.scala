package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/validation/test
  * assignment every training pipeline needs before anything else
  * touches the data. Assignment is a pure per-row function of the
  * document key (never `rand()`): re-running the pipeline, adding
  * executors, or reordering the input cannot move a document across
  * the split boundary, and late-arriving shards of the same corpus
  * land in the same split as their siblings.
  *
  * Scale shape: one scan, zero shuffles — the split label is a
  * codegen'd column expression, so splitting 100 TB costs exactly the
  * read. Materializing per-split manifests is then a partitioned
  * write on the label column.
  *
  * Two hash paths:
  *  - [[assignByHash]] — xxhash64 over arbitrary key columns + a salt.
  *    The production path: well-mixed for any key type, and the salt
  *    gives independent re-splits of the same corpus.
  *  - [[assignArithmetic]] — a Knuth multiplicative hash over a single
  *    integer key, restricted to arithmetic any SQL engine evaluates
  *    bit-identically (mod-prime multiply, no 64-bit wraparound), so
  *    an external system can reproduce the exact assignment (and the
  *    DuckDB oracle checks it row for row).
  */
object Splits {

  /** A split scheme: ordered (name, share-in-permille) pairs summing
    * to 1000, e.g. `Seq("train" -> 800, "val" -> 100, "test" -> 100)`.
    */
  type Scheme = Seq[(String, Int)]

  val DefaultScheme: Scheme =
    Seq("train" -> 800, "val" -> 100, "test" -> 100)

  private def requireScheme(scheme: Scheme): Unit = {
    require(scheme.nonEmpty && scheme.forall(_._2 > 0),
      s"split shares must be positive, got $scheme")
    require(scheme.map(_._2).sum == 1000,
      s"split shares must sum to 1000 permille, got ${scheme.map(_._2).sum}")
  }

  /** CASE chain mapping a [0, 1000) bucket to its split label by
    * cumulative share: bucket < 800 → train, < 900 → val, … — the
    * label boundaries move only if the scheme itself changes.
    */
  private def labelOf(bucket: Column, scheme: Scheme): Column = {
    val cuts = scheme.scanLeft(0)(_ + _._2).tail    // cumulative upper bounds
    scheme.init.zip(cuts.init).foldRight(lit(scheme.last._1): Column) {
      case (((name, _), cut), rest) => when(bucket < cut, name).otherwise(rest)
    }
  }

  // mod-prime multiplicative hash: both factors stay under 2^31 and
  // 2^33 respectively, so the product is < 2^63 — no silent 64-bit
  // wraparound, which is what makes the arithmetic reproducible in ANY
  // engine's BIGINT semantics (wraparound would also work on
  // two's-complement engines, but some SQL engines raise on overflow)
  private val P = 1000000007L          // prime modulus
  private val A = 2654435761L          // Knuth's 2^32 / phi multiplier

  /** [0, 1000) bucket for an integer key — `((id mod P) · A) mod P mod
    * 1000`. Exposed so callers (and the oracle) can pin the exact
    * arithmetic.
    */
  def arithmeticBucket(id: Column): Column =
    pmod(pmod(pmod(id.cast("long"), lit(P)) * lit(A), lit(P)), lit(1000))

  /** Oracle-reproducible split over a single integer key column.
    * Output: input columns + `bucket` + `split`.
    */
  def assignArithmetic(df: DataFrame, idCol: String,
                       scheme: Scheme = DefaultScheme): DataFrame = {
    requireScheme(scheme)
    val bucket = arithmeticBucket(col(idCol))
    df.withColumn("bucket", bucket)
      .withColumn("split", labelOf(col("bucket"), scheme))
  }

  /** Leakage-FREE splitting: key the split on the near-duplicate
    * COMPONENT instead of the document. A per-document split leaks —
    * near-identical copies of a test document land in train with
    * probability 1 − share, quietly inflating eval scores — so the
    * contamination-safe assignment first labels connected components
    * over the near-dup pair set ([[Clustering.labelCorpus]]: min-label
    * propagation with pointer jumping, no quadratic stage) and then
    * hashes the COMPONENT id through the same oracle-reproducible
    * arithmetic as [[assignArithmetic]] — every cluster lands wholly
    * in one split, and singleton documents (component = own id) split
    * exactly as before. Output: (idCol, component, bucket, split).
    */
  def assignLeakFree(corpus: DataFrame, idCol: String, pairs: DataFrame,
                     srcCol: String, dstCol: String,
                     scheme: Scheme = DefaultScheme): DataFrame =
    assignArithmetic(
      Clustering.labelCorpus(corpus, idCol, pairs, srcCol, dstCol)
        .select(col(idCol), col("component")),
      "component", scheme)

  /** Production split over arbitrary key columns: xxhash64(salt, keys)
    * folded into [0, 1000). Different salts give statistically
    * independent assignments of the same corpus (for re-splits or
    * cross-validation folds). Output: input columns + `bucket` +
    * `split`.
    */
  def assignByHash(df: DataFrame, keyCols: Seq[String],
                   scheme: Scheme = DefaultScheme,
                   salt: String = "graft-split-v1"): DataFrame = {
    requireScheme(scheme)
    require(keyCols.nonEmpty, "assignByHash needs at least one key column")
    val bucket = pmod(xxhash64(lit(salt) +: keyCols.map(col): _*), lit(1000L))
    df.withColumn("bucket", bucket)
      .withColumn("split", labelOf(col("bucket"), scheme))
  }
}
