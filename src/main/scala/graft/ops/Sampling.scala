package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The salted TWO-LEVEL per-group cap shared by the deterministic
  * samplers (Ols.stratifiedSample, Mixing.sampleQuotas): first cap per
  * (group, salt) — the salt spreads each group over `salts` partitions
  * so no task ever sees more than ~|group|/salts rows — then re-cap
  * the ≤ cap·salts survivors per group. Both levels order by the SAME
  * key, so the final set is exactly the single-window
  * `Window.partitionBy(group)` form's (every globally-surviving row
  * survives its salt group): salting is a pure plan change, asserted
  * by both call sites' equivalence specs. A bare per-group window
  * would funnel the whole dataset through ≤ |groups| tasks at any
  * input size.
  */
private[graft] object Sampling {

  /** Keep at most `cap` rows per `partCols` group, smallest `orderBy`
    * first; `saltBy` (any stable per-row expression) spreads the
    * first-level cap. `cap` may vary per group (it is evaluated per
    * row).
    */
  def saltedCap(df: DataFrame, partCols: Seq[Column], orderBy: Column,
                saltBy: Column, cap: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val wSalted = Window.partitionBy(partCols :+ col("__salt"): _*)
      .orderBy(orderBy)
    val wGroup = Window.partitionBy(partCols: _*).orderBy(orderBy)
    df.withColumn("__salt", pmod(saltBy, lit(salts)))
      .withColumn("__rn1", row_number().over(wSalted))
      .filter(col("__rn1") <= cap)
      .withColumn("__rn2", row_number().over(wGroup))
      .filter(col("__rn2") <= cap)
      .drop("__salt", "__rn1", "__rn2")
  }
}
