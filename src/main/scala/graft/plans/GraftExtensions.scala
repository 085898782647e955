package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.InnerLike
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst extension surface (SURVEY.md §7.4): the one optional custom
  * rule the blueprint names — automatic broadcast hints for small
  * dimension legs of a join — packaged both as a
  * `SparkSessionExtensions` installer (for sessions built with
  * `.withExtensions`) and as a live-session hook through
  * `spark.experimental.extraOptimizations`.
  *
  * Why a custom rule when Catalyst already auto-broadcasts: the
  * built-in decision keys off `spark.sql.autoBroadcastJoinThreshold`
  * at physical planning and can be lost when that conf is disabled
  * fleet-wide (a common guard against rogue broadcasts of mis-stated
  * relations). This rule re-enables the safe subset — genuinely tiny
  * legs by logical stats — as explicit hints, the exact pattern of the
  * reference's 121-row wallet_location join (btcolap.sql:429-430).
  */
case class SmallDimBroadcast(thresholdBytes: Long) extends Rule[LogicalPlan] {

  private def small(p: LogicalPlan): Boolean =
    p.stats.sizeInBytes >= 0 && p.stats.sizeInBytes <= thresholdBytes

  // (user hints are already merged into Join.hint before optimizer
  // rules run — EliminateResolvedHint is first — so matching
  // JoinHint.NONE is the complete "no existing hint" guard)
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _: InnerLike, _, JoinHint.NONE) =>
      if (small(right))
        j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
      else if (small(left))
        j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
      else j
  }
}

/** `.withExtensions(new GraftExtensions)` at session build time:
  * installs the broadcast-hint rule and the native as-of join
  * strategy, so library users get the whole extension surface from
  * one hook.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SmallDimBroadcast(GraftExtensions.DefaultThreshold))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  /** 1 MiB: conservatively tiny — nothing this size can hurt an executor. */
  val DefaultThreshold: Long = 1L << 20

  /** Install on an already-running session (extraOptimizations is the
    * supported live hook; builder extensions can't be added
    * retroactively).
    */
  def install(spark: SparkSession,
              thresholdBytes: Long = DefaultThreshold): Unit = {
    val rule = SmallDimBroadcast(thresholdBytes)
    if (!spark.experimental.extraOptimizations.contains(rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
