package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing — deterministic per-group quota resampling, the
  * "data mixture" step of a training pipeline: hold each source/domain
  * to a target row budget (upweight rare sources by keeping them
  * whole, cap dominant ones) with an order-free, reproducible
  * selection (keep the `quota(group)` rows with the smallest
  * `md5(key)` per group — any engine replays it, so the whole output
  * is oracle-checkable).
  *
  * Scale shape: the same salted TWO-LEVEL cap as Ols.stratifiedSample
  * — first cap per (group, salt) so no task ever sees more than
  * ~|group|/salts rows, then re-cap the ≤ quota·salts survivors per
  * group. Both levels order by the same key, so the result is exactly
  * the single-window form's (every globally-surviving row survives its
  * salt group) — salting is a pure plan change, spec-asserted. A bare
  * Window.partitionBy(source) would funnel a petabyte web-crawl
  * source through one task.
  */
object Mixing {

  /** Keep at most `quotas(group)` rows per group (`defaultQuota` for
    * unlisted groups), selecting the smallest-md5(key) rows. `keyCol`
    * must be unique (the deterministic tiebreak).
    */
  def sampleQuotas(df: DataFrame, groupCol: String, keyCol: String,
                   quotas: Map[String, Int], defaultQuota: Int,
                   salts: Int = 64): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val quota =
      if (quotas.isEmpty) lit(defaultQuota)
      else coalesce(element_at(typedLit(quotas), col(groupCol)),
                    lit(defaultQuota))
    val h = md5(col(keyCol).cast("string"))
    val wSalted = Window.partitionBy(col(groupCol), col("__salt")).orderBy(h)
    val wGroup = Window.partitionBy(col(groupCol)).orderBy(h)
    df.withColumn("__salt", pmod(xxhash64(col(keyCol)), lit(salts)))
      .withColumn("__rn1", row_number().over(wSalted))
      .filter(col("__rn1") <= quota)
      .withColumn("__rn2", row_number().over(wGroup))
      .filter(col("__rn2") <= quota)
      .drop("__salt", "__rn1", "__rn2")
  }
}
