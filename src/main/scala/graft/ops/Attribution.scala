package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** METRIC DELTA ATTRIBUTION — the root-cause decomposition every
  * metrics review runs when a headline number moves: split the
  * corpus into two periods (or builds, or crawls), and decompose the
  * total metric delta into exact per-cell contributions — "revenue
  * fell 4%; the purchase segment explains 80% of it". Because the
  * metric is additive, per-cell deltas sum EXACTLY to the total:
  * nothing hides in a residual.
  */
object Attribution {

  /** Per-cell contribution table: pre mass, post mass, delta, and
    * the cell's SHARE of the total delta (NULL when the total delta
    * is zero — nothing to attribute).
    *
    * Arithmetic: pre/post are exact BIGINT sums from ONE map-side
    * combinable (cell, side) collapse; deltas are integer
    * subtractions and the share is one IEEE divide at the 6dp
    * boundary. Scale shape: nothing after the collapse exceeds
    * |cells| rows (the total joins back as a broadcast 1-row frame).
    *
    * Output: (cells…, pre, post, delta, share 6dp).
    */
  def deltaAttribution(df: DataFrame, cellCols: Seq[String],
                       isPre: Column, valueCol: Column): DataFrame = {
    require(cellCols.nonEmpty, "need at least one cell column")
    val g = cellCols.map(col)
    val cells = df.filter(valueCol.isNotNull && isPre.isNotNull)
      .groupBy(g: _*)
      .agg(sum(when(isPre, valueCol.cast("long")).otherwise(0L)).as("pre"),
        sum(when(!isPre, valueCol.cast("long")).otherwise(0L)).as("post"))
      .withColumn("delta", col("post") - col("pre"))
    val tot = cells.agg(sum(col("delta")).as("__td"))
    cells.crossJoin(broadcast(tot))
      .select(g :+ col("pre") :+ col("post") :+ col("delta") :+
        when(col("__td") =!= 0,
          round(col("delta").cast("double") / col("__td").cast("double"),
            6)).as("share"): _*)
  }
}
