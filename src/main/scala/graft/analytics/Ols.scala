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
    * `orderCol`, keep at most `capPerBin` rows per bin, with a
    * deterministic hash-ordered cap. Reproducible and distributed:
    * bin boundaries come from approxQuantile (a tiny driver-side
    * result), and rows bucket by comparing against the broadcast
    * boundary array — no global-window single-partition funnel (a bare
    * ntile(n).over(Window.orderBy(...)) would pull every row through
    * one task).
    */
  def stratifiedSample(df: DataFrame, orderCol: String, bins: Int,
                       capPerBin: Int,
                       quantileError: Double = 1e-4): DataFrame = {
    val probes = (1 until bins).map(_.toDouble / bins).toArray
    val bounds = df.stat.approxQuantile(orderCol, probes, quantileError)
    val boundsCol = array(bounds.toIndexedSeq.map(lit): _*)
    val binned = df.withColumn("__bin",
      size(filter(boundsCol, b => b <= col(orderCol).cast("double"))))
    val w = Window.partitionBy(col("__bin"))
      .orderBy(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)))
    binned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= capPerBin)
      .drop("__bin", "__rn")
  }
}
