package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CovFunctions, ProjectionFunctions}

/** Distributed PCA whitening for embedding columns — the
  * dimensionality-reduction / decorrelation step retrieval and
  * clustering pipelines run before indexing (whitening measurably
  * improves cosine ANN recall on anisotropic embedding spaces).
  *
  * Scale split, the only one that works at 100 TB:
  *  - the CORPUS pass is [[graft.functions.CovMoments]] — one scan
  *    accumulating [n, Σx, Σxxᵀ] map-side; O(d²) state per partition
  *    is all that shuffles (d = embedding dim, 64 here), never rows.
  *  - the EIGEN step runs on the DRIVER over the d×d covariance
  *    (power iteration + deflation + re-orthogonalization — bounded
  *    work on a matrix whose size is set by the model, not the data).
  *  - the APPLY pass is one codegen'd kernel per row
  *    ([[graft.functions.ProjectWhitenExpr]], basis as a codegen
  *    reference object) — no join, no shuffle.
  *
  * Determinism: power iteration starts from the covariance column of
  * maximal norm and runs a FIXED iteration count — same input, same
  * model, every run.
  */
object Pca {

  case class PcaModel(n: Long, mean: Array[Double],
                      eigVals: Array[Double], eigVecs: Array[Array[Double]],
                      totalVar: Double) {
    def explainedFrac: Double =
      if (totalVar > 0) eigVals.sum / totalVar else 0.0
  }

  /** One-pass covariance (population) from the moment aggregate. */
  def fitCovariance(vecs: DataFrame, vecCol: String,
                    d: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val flat = vecs.agg(CovFunctions.cov_moments(col(vecCol), d).as("m"))
      .head().getSeq[Double](0).toArray
    val n = flat(0).toLong
    require(n >= 2, s"need at least 2 vectors, got $n")
    val mean = Array.tabulate(d)(i => flat(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = flat(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Top-k eigenpairs by power iteration with deflation. */
  def fit(vecs: DataFrame, vecCol: String, d: Int, k: Int,
          iters: Int = 200): PcaModel = {
    require(k >= 1 && k <= d, s"need 1 <= k <= d, got k=$k d=$d")
    val (n, mean, cov) = fitCovariance(vecs, vecCol, d)
    val totalVar = (0 until d).map(i => cov(i)(i)).sum
    val c = cov.map(_.clone())
    val vals = new Array[Double](k)
    val vecsOut = new Array[Array[Double]](k)
    var e = 0
    while (e < k) {
      // deterministic init: the column of the (deflated) matrix with
      // the largest norm — never orthogonal to the dominant eigenvector
      // unless the matrix is already (numerically) zero
      var best = 0
      var bestN = -1.0
      var j = 0
      while (j < d) {
        var s = 0.0
        var i2 = 0
        while (i2 < d) { s += c(i2)(j) * c(i2)(j); i2 += 1 }
        if (s > bestN) { bestN = s; best = j }
        j += 1
      }
      var v = Array.tabulate(d)(i2 => c(i2)(best))
      if (norm(v) == 0.0) v = Array.tabulate(d)(i2 => if (i2 == e) 1.0 else 0.0)
      normalize(v)
      var it = 0
      while (it < iters) {
        v = matVec(c, v)
        // re-orthogonalize against found eigenvectors: deflation keeps
        // them out in exact arithmetic; this keeps them out in floats
        var p = 0
        while (p < e) { axpy(v, vecsOut(p), -dot(v, vecsOut(p))); p += 1 }
        if (norm(v) == 0.0) v(e % d) = 1.0
        normalize(v)
        it += 1
      }
      val lambda = dot(v, matVec(c, v))
      vals(e) = lambda
      vecsOut(e) = v
      // deflate
      var i3 = 0
      while (i3 < d) {
        var j3 = 0
        while (j3 < d) { c(i3)(j3) -= lambda * v(i3) * v(j3); j3 += 1 }
        i3 += 1
      }
      e += 1
    }
    PcaModel(n, mean, vals, vecsOut, totalVar)
  }

  /** Whitened projection: y_e = (x − μ)·v_e / √(λ_e + eps). Output
    * (passthrough cols…, projCol ARRAY<DOUBLE> length k). Rows whose
    * vector is NULL or of the wrong length are DROPPED — the same
    * skip contract as the CovMoments fit pass, so a corpus with one
    * malformed row fits AND projects instead of crashing the apply
    * job on the row the fit already skipped (the kernel's own length
    * require stays as the backstop for direct callers).
    */
  def whiten(vecs: DataFrame, vecCol: String, model: PcaModel,
             projCol: String = "whitened", eps: Double = 1e-9): DataFrame = {
    val scales = model.eigVals.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
    vecs
      .filter(col(vecCol).isNotNull &&
        size(col(vecCol)) === model.mean.length)
      .withColumn(projCol,
        ProjectionFunctions.project_whiten(col(vecCol),
          model.mean.toSeq, model.eigVecs.map(_.toSeq).toSeq, scales.toSeq))
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
  private def normalize(a: Array[Double]): Unit = {
    val n = norm(a)
    if (n > 0) { var i = 0; while (i < a.length) { a(i) /= n; i += 1 } }
  }
  private def axpy(a: Array[Double], x: Array[Double], alpha: Double): Unit = {
    var i = 0
    while (i < a.length) { a(i) += alpha * x(i); i += 1 }
  }
  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val d = v.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0; var j = 0
      while (j < d) { s += m(i)(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** Common-component removal ("all-but-the-top", Mu & Viswanath
    * ICLR'18; Arora et al.'s tough-to-beat baseline): center, then
    * subtract the projections onto the top-k principal directions —
    * y = (x − μ) − Σ_e ((x−μ)·v_e)·v_e. Anisotropic embedding spaces
    * concentrate mass in a few directions that carry frequency, not
    * meaning; removing them measurably improves cosine retrieval.
    * Output keeps the FULL dimension d (unlike [[whiten]]'s k-dim
    * projection). One codegen'd kernel pass per row; the k×d basis is
    * a codegen reference object. Same malformed-row skip contract as
    * [[whiten]].
    */
  def removeTop(vecs: DataFrame, vecCol: String, model: PcaModel,
                outCol: String = "residual"): DataFrame =
    vecs
      .filter(col(vecCol).isNotNull &&
        size(col(vecCol)) === model.mean.length)
      .withColumn(outCol,
        ProjectionFunctions.remove_components(col(vecCol),
          model.mean.toSeq, model.eigVecs.map(_.toSeq).toSeq))

  /** Corpus-level embedding HEALTH CARD per group — the pre-flight a
    * vector pipeline runs before indexing 100 TB: row and defect
    * counts (null vectors, wrong dimension, non-finite elements,
    * all-zero vectors) plus the norm distribution of the healthy rows
    * (exact interpolated percentiles + mean). Exact integer contract:
    * norms micro-rounded to longs (one IEEE sqrt per row), percentile
    * interpolation runs on integers in both engines → hash-exact
    * DuckDB `quantile_cont` oracle (the t141 convention). One scan,
    * |groups|-row output.
    */
  def embeddingCard(vecs: DataFrame, groupCols: Seq[String],
                    vecCol: String, d: Int): DataFrame = {
    val v = col(vecCol)
    val isNull = v.isNull
    val badDim = !isNull && size(v) =!= d
    // a NULL ELEMENT inside a correctly-sized vector is a defect too:
    // without this clause Spark's aggregate null-propagates __r_micro
    // (while DuckDB's list_sum would skip the NULL and produce a
    // norm), and the mean_norm denominator would count a row that
    // contributes nothing to the numerator
    val nonFinite = !isNull && size(v) === d &&
      exists(v, x => x.isNull || isnan(x.cast("double")) ||
        x.cast("double") === Double.PositiveInfinity ||
        x.cast("double") === Double.NegativeInfinity)
    val ok = !isNull && size(v) === d && !nonFinite
    val zero = ok && forall(v, x => x.cast("double") === 0.0)
    // micro norm of healthy rows only (NULL elsewhere so aggregates
    // skip). Components quantize to micro longs FIRST, then integer-
    // sum-of-squares, then ONE sqrt — the labelSeparation lesson: both
    // engines sqrt the SAME exact integer, where sqrt of a float sum
    // would round differently near .5 micro boundaries
    val q = transform(v,
      x => round(x.cast("double") * 1000000.0).cast("long"))
    val rMicro = when(ok,
      round(sqrt(aggregate(q, lit(0L), (a, x) => a + x * x)
        .cast("double"))).cast("long"))
    val staged = vecs.select((groupCols.map(col) ++ Seq(
      isNull.cast("long").as("__null"), badDim.cast("long").as("__bad"),
      nonFinite.cast("long").as("__nf"), zero.cast("long").as("__zero"),
      ok.cast("long").as("__ok"), rMicro.as("__r_micro"))): _*)
    staged.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__null")).as("n_null"),
        sum(col("__bad")).as("n_bad_dim"),
        sum(col("__nf")).as("n_nonfinite"),
        sum(col("__zero")).as("n_zero"),
        sum(col("__ok")).as("n_ok"),
        round(expr("percentile(__r_micro, 0.1)") / 1e6, 6).as("p10_norm"),
        round(expr("percentile(__r_micro, 0.5)") / 1e6, 6).as("p50_norm"),
        round(expr("percentile(__r_micro, 0.9)") / 1e6, 6).as("p90_norm"),
        round(sum(col("__r_micro")).cast("double") / sum(col("__ok")) / 1e6, 6)
          .as("mean_norm"))
      .orderBy(groupCols.map(col): _*)
  }

  /** Per-dimension embedding QA stats — the cheap pre-flight before
    * any vector work: (dim, n, mean, std, min, max, frac_zero). One
    * posexplode + a |dims|-group aggregate (map-side combined; the
    * shuffle carries dims × partitions partial rows, never vectors).
    */
  def dimStats(vecs: DataFrame, vecCol: String): DataFrame =
    vecs
      .filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("x")), 6).as("mean"),
        round(sqrt(avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))), 6)
          .as("std"),
        round(min(col("x")), 6).as("min"),
        round(max(col("x")), 6).as("max"),
        round(sum(when(col("x") === 0.0, 1.0).otherwise(0.0)) / count(lit(1)), 6)
          .as("frac_zero"))
}
