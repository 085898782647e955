package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucketed aggregation + cross-series alignment (SURVEY.md §2.6
  * A1/A2, §2.5 J5) — the read-path of the reference's analysis stage
  * (btc_logregression_pre.py:14-49).
  */
object DailyAgg {

  /** GROUP BY DATE_TRUNC('day', ts) with an arbitrary aggregate.
    * Partial (map-side) aggregation makes the shuffle O(days), not
    * O(rows) — at 100 TB the exchange carries a few thousand rows.
    */
  def daily(df: DataFrame, tsCol: String, agg: Column): DataFrame =
    df.groupBy(date_trunc("day", col(tsCol)).as("date")).agg(agg)

  /** Signed daily flow sum — the reference's SUM(-val) daily totals
    * (btc_logregression_pre.py:21): inputs are stored negative, so the
    * outflow series negates again to report positive magnitudes.
    */
  def dailyFlow(flow: DataFrame, negate: Boolean, as: String): DataFrame = {
    val v = if (negate) -col("val") else col("val")
    daily(flow, "block_timestamp", sum(v).as(as))
  }

  /** pd.merge(..., on='date', how='inner') ≡ inner join on the day
    * bucket (btc_logregression_pre.py:49). Daily frames are tiny after
    * aggregation — broadcast the right side.
    */
  def merge(left: DataFrame, right: DataFrame): DataFrame =
    left.join(broadcast(right), Seq("date"), "inner")
}
