package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Closed-form simple OLS over DataFrame columns (SURVEY.md §2.11 M1/M2)
  * — the regression the reference actually computes (statsmodels OLS on
  * log-transformed daily flows, btc_logregression_pre.py:77-117; the
  * "logistic regression" in its filenames is dead code, M5).
  *
  * Everything is a single aggregate pass over population moments: no
  * collect, no iteration — the fit costs one tiny shuffle regardless of
  * input size, so it runs on a billion-row series as happily as on the
  * reference's O(10^3) daily rows.
  */
object Ols {

  /** Fitted model + diagnostics. tStat/pApprox are for the slope
    * (btc_logregression_pre.py's commented-out summary table).
    */
  final case class Fit(slope: Double, intercept: Double, r2: Double,
                       rmse: Double, n: Long, slopeStdErr: Double,
                       tStat: Double) {
    def predict(x: Double): Double = intercept + slope * x
  }

  /** Fit y = intercept + slope * x. `logLog=true` fits on (ln x, ln y)
    * — the reference's log-log spec (btc_logregression_pre.py:77-78).
    */
  def fit(df: DataFrame, xCol: String, yCol: String,
          logLog: Boolean = false): Fit = {
    val (x, y) =
      if (logLog) (log(col(xCol)), log(col(yCol)))
      else (col(xCol).cast("double"), col(yCol).cast("double"))
    val m = df.select(x.as("x"), y.as("y"))
      .na.drop()  // the reference dropna()s before fitting (pre.py:142)
      .agg(
        covar_pop(col("y"), col("x")).as("sxy"),
        var_pop(col("x")).as("sxx"),
        var_pop(col("y")).as("syy"),
        avg(col("x")).as("mx"),
        avg(col("y")).as("my"),
        count(lit(1)).as("n"))
      .head()
    val n = m.getLong(5)
    // degenerate inputs: no rows, a single row, or constant x (sxx = 0,
    // vertical-line fit) — report NaN rather than Infinity artifacts
    if (n < 2 || m.isNullAt(0) || m.getDouble(1) == 0.0)
      return Fit(Double.NaN, Double.NaN, Double.NaN, Double.NaN, n,
                 Double.NaN, Double.NaN)
    val (sxy, sxx, syy) = (m.getDouble(0), m.getDouble(1), m.getDouble(2))
    val (mx, my) = (m.getDouble(3), m.getDouble(4))
    val slope = sxy / sxx
    val intercept = my - slope * mx
    val r2 = (sxy * sxy) / (sxx * syy)
    // SSE = n * var(y) * (1 - r2); rmse over n (population form)
    val sse = n * syy * (1 - r2)
    val rmse = math.sqrt(sse / n)
    // slope std error needs n-2 residual dof — undefined for n == 2
    val seSlope =
      if (n > 2) math.sqrt((sse / (n - 2)) / (n * sxx)) else Double.NaN
    Fit(slope, intercept, r2, rmse, n, seSlope, slope / seSlope)
  }

  /** Residual/prediction table for plotting consumers (M4 stays out of
    * the engine; we emit the (x, y, yhat) frame).
    */
  def withPrediction(df: DataFrame, xCol: String, yCol: String,
                     fit: Fit): DataFrame =
    df.withColumn("yhat", lit(fit.intercept) + lit(fit.slope) * col(xCol))
      .withColumn("residual", col(yCol) - col("yhat"))

  /** M3 — stratified percentile-bin downsampling ("smart_sampling",
    * btc_logregression_pre.py:53-70): `bins` quantile bins over
    * `orderCol`, keep the `capPerBin` rows with the smallest row-hash
    * per bin — a deterministic, order-free sample. Distributed at any
    * scale:
    *
    *  - bin boundaries come from approxQuantile (tiny driver result),
    *    rows bucket by comparing against the broadcast boundary array
    *    (a bare ntile(n).over(Window.orderBy(...)) would pull every row
    *    through ONE task);
    *  - the per-bin cap is TWO-LEVEL: first cap per (bin, salt) — the
    *    salt spreads each bin over `salts` partitions so no task ever
    *    sees more than ~N/(bins·salts) rows — then re-cap the
    *    ≤ capPerBin·salts survivors per bin. Because both levels order
    *    by the same key, the final set is exactly the global per-bin
    *    top-capPerBin (every globally-surviving row survives its salt
    *    group), so the two-level form is a pure plan change: a
    *    single-window Window.partitionBy(bin) with bins = 20 would
    *    funnel the whole dataset through ≤ 20 tasks at any input size.
    */
  def stratifiedSample(df: DataFrame, orderCol: String, bins: Int,
                       capPerBin: Int,
                       quantileError: Double = 1e-4,
                       salts: Int = 64): DataFrame = {
    // scale path — see stratifiedSampleExact for the oracle-checkable
    // exact-binning variant used at verification scale.
    val probes = (1 until bins).map(_.toDouble / bins).toArray
    val bounds = df.stat.approxQuantile(orderCol, probes, quantileError)
    val boundsCol = array(bounds.toIndexedSeq.map(lit): _*)
    val rowHash = xxhash64(struct(df.columns.toIndexedSeq.map(col): _*))
    val binned = df.withColumn("__bin",
        size(filter(boundsCol, b => b <= col(orderCol).cast("double"))))
      .withColumn("__h", rowHash)
    graft.ops.Sampling.saltedCap(binned, Seq(col("__bin")),
        orderBy = col("__h"), saltBy = col("__h"),
        cap = lit(capPerBin), salts = salts)
      .drop("__bin", "__h")
  }

  /** M3, exact-binning variant — the oracle-checkable form of
    * `stratifiedSample`: equi-height bins come from `ntile(bins)` over
    * a TOTAL order (`orderCol`, tie-broken by the unique `keyCol`), and
    * the per-bin cap keeps the `capPerBin` rows with the smallest
    * `md5(keyCol)` — every ingredient (ntile, md5 over a decimal-string
    * key, row_number) evaluates identically in any ANSI engine, so an
    * external SQL oracle can replay membership EXACTLY. This is what
    * `approxQuantile` boundaries + xxhash64 row hashes (engine-local)
    * structurally cannot offer.
    *
    * Deliberately NOT the scale path: a global ntile is a
    * single-partition window funnel. Use it at verification scale
    * (where exactness is the point) and `stratifiedSample` — identical
    * semantics up to boundary placement, distributed plan — at corpus
    * scale.
    */
  def stratifiedSampleExact(df: DataFrame, orderCol: String,
                            keyCol: String, bins: Int,
                            capPerBin: Int): DataFrame = {
    val wNtile = Window.orderBy(col(orderCol), col(keyCol))
    val wBin = Window.partitionBy(col("__bin"))
      .orderBy(md5(col(keyCol).cast("string")))
    df.withColumn("__bin", ntile(bins).over(wNtile))
      .withColumn("__rn", row_number().over(wBin))
      .filter(col("__rn") <= capPerBin)
      .drop("__bin", "__rn")
  }

  /** Per-GROUP closed-form simple OLS — the M1 regression fitted to
    * every segment at once (one fit per source/type/cohort), from ONE
    * map-side-combinable moment aggregation: n, Σx, Σy, Σxy, Σx², Σy²
    * reduce per group, then slope/intercept/r² are pure arithmetic on
    * six numbers. No window, no per-group sort; shuffle =
    * O(groups) moment rows. With INTEGRAL x and y the moments are
    * exact longs, so the derived doubles are bit-identical across
    * engines (the t127 oracle contract).
    *
    * Output: (groupCols…, n, slope, intercept, r2) — 6dp; groups with
    * n < 2 or zero x-variance are dropped (no line to fit).
    */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val m = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val covN = m("n") * col("sxy") - col("sx") * col("sy")
    val varXN = m("n") * col("sxx") - col("sx") * col("sx")
    val varYN = m("n") * col("syy") - col("sy") * col("sy")
    m.filter(col("n") >= 2 && varXN > 0)
      .withColumn("slope", covN.cast("double") / varXN.cast("double"))
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx")) / col("n"))
      .withColumn("r2",
        when(varYN > 0,
          (covN.cast("double") * covN.cast("double")) /
            (varXN.cast("double") * varYN.cast("double"))))
      .select(g :+ col("n") :+ round(col("slope"), 6).as("slope") :+
        round(col("intercept"), 6).as("intercept") :+
        round(col("r2"), 6).as("r2"): _*)
  }

  /** Pairwise Pearson correlation between per-key series sharing a
    * time axis: self-join the (group, t, v) table on t (a < b), reduce
    * each pair to integer-exact moments, finish with arithmetic. The
    * series-of-series correlation matrix every metrics warehouse
    * computes — |groups|² pairs of O(1) state, never |t|² anything.
    * Output: (g_a, g_b, n, corr) over the pairs' SHARED time points;
    * pairs with < 2 shared points or zero variance on either side are
    * dropped.
    */
  def pairCorrelation(df: DataFrame, groupCol: String, tCol: String,
                      vCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("g_a"), col(tCol).as("__t"),
      col(vCol).cast("long").as("__x"))
    val b = df.select(col(groupCol).as("g_b"), col(tCol).as("__t"),
      col(vCol).cast("long").as("__y"))
    val m = a.join(b, Seq("__t"))
      .filter(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
    val covN = m("n") * col("sxy") - col("sx") * col("sy")
    val varXN = m("n") * col("sxx") - col("sx") * col("sx")
    val varYN = m("n") * col("syy") - col("sy") * col("sy")
    m.filter(col("n") >= 2 && varXN > 0 && varYN > 0)
      .withColumn("corr", covN.cast("double") /
        sqrt(varXN.cast("double") * varYN.cast("double")))
      .select(col("g_a"), col("g_b"), col("n"), round(col("corr"), 6).as("corr"))
  }
}
