package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.DailyAgg

/** The reference's analysis read path (EP2, btc_logregression_pre.py /
  * _post.py) as one library call: located-ledger parquet → per-cohort
  * daily flow series → inner merge → min-activity filter → log-log OLS
  * with diagnostics → prediction table.
  *
  * The two Python scripts differ only in their date cohort; here the
  * cohort is a parameter. The stats stage never leaves Spark: the fit
  * is a single aggregate pass (analytics.Ols), the prediction frame is
  * a projection — nothing collects but the 7-double fit summary.
  */
object CohortAnalysis {

  /** One cohort result: the merged daily table (with predictions) and
    * the fit. */
  final case class Result(daily: DataFrame, fit: Ols.Fit)

  /** @param ledger      located flow ledger (block_timestamp, type,
    *                     location, val — Schemas.flowLedger shape)
    * @param outLocation cohort for the OUTFLOW series (reference:
    *                     'China' inputs, negated to magnitudes)
    * @param inLocationNot cohort predicate for the INFLOW series is
    *                     location != this (reference: abroad = not China)
    * @param minFlow     drop days with outflow below this (the
    *                     reference's `df[df.txid_input > 1]` filter,
    *                     pre.py:28)
    */
  def run(ledger: DataFrame, outLocation: String, inLocationNot: String,
          minFlow: Double = 1.0): Result = {
    val outflow = DailyAgg.dailyFlow(
      ledger.filter(col("type") === "input" && col("location") === outLocation),
      negate = true, as = "outflow")
    val inflow = DailyAgg.dailyFlow(
      ledger.filter(col("type") === "output" && col("location") =!= inLocationNot),
      negate = false, as = "inflow")
    // minFlow thresholds the OUTFLOW series only (reference parity:
    // df[df.txid_input > 1], pre.py:28); inflow just needs to be in the
    // log domain (> 0) for the fit.
    val merged = DailyAgg.merge(outflow, inflow)
      .filter(col("outflow") > minFlow && col("inflow") > 0.0)
    val fit = Ols.fit(merged, "outflow", "inflow", logLog = true)
    val withPred =
      if (fit.n >= 2)
        merged
          .withColumn("log_x", log(col("outflow")))
          .withColumn("log_y", log(col("inflow")))
          .withColumn("yhat", lit(fit.intercept) + lit(fit.slope) * col("log_x"))
          .withColumn("residual", col("log_y") - col("yhat"))
      else merged
    Result(withPred, fit)
  }

  /** Pre/post event-date pair — the reference's two scripts in one
    * call, split on the SAFE date (btcolap.sql:97,322,370).
    */
  def prePost(ledger: DataFrame, splitDate: String, outLocation: String,
              inLocationNot: String, minFlow: Double = 1.0): (Result, Result) = {
    val d = lit(splitDate).cast("timestamp")
    (run(ledger.filter(col("block_timestamp") < d), outLocation, inLocationNot, minFlow),
     run(ledger.filter(col("block_timestamp") > d), outLocation, inLocationNot, minFlow))
  }
}
