package graft.ops

import org.apache.spark.sql.DataFrame
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
    val quota =
      if (quotas.isEmpty) lit(defaultQuota)
      else coalesce(element_at(typedLit(quotas), col(groupCol)),
                    lit(defaultQuota))
    Sampling.saltedCap(df, Seq(col(groupCol)),
      orderBy = md5(col(keyCol).cast("string")),
      saltBy = xxhash64(col(keyCol)),
      cap = quota, salts = salts)
  }
}
