package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trend and change-point detection over per-group time series — the
  * monitoring questions AFTER drift detection says "something moved":
  * is a metric drifting monotonically ([[mannKendall]]), and WHEN did
  * it shift ([[cusumChangePoint]])?
  *
  * Both operate on an already-aggregated series frame (one row per
  * (group, period) — the caller's daily/hourly reduction), so every
  * stage below the input aggregation is PERIOD-cardinality, not
  * corpus-cardinality: the pair join and windows touch ≤ n_periods
  * rows per group (a year of days = 365). Integer-valued series keep
  * the statistics exact (S and the scaled CUSUM are exact longs);
  * only the final normalized scores are doubles, 6dp at the boundary.
  */
object Trend {

  private val Z975 = 1.959963985

  /** Mann–Kendall monotone-trend test per group: S = Σ_{i<j}
    * sgn(x_j − x_i) over period order, tie-corrected variance
    * Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, continuity-corrected
    * z = (S∓1)/√Var, `trending` = |z| > z₀.₉₇₅ with the sign of S.
    * Output: (group…, n_points, s_stat, var_s, z, trending) —
    * groups with < 2 points or zero variance (all values tied) yield
    * z = NULL and never flag.
    */
  def mannKendall(series: DataFrame, groupCols: Seq[String],
                  orderCol: String, valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val base = series.filter(col(valueCol).isNotNull)
      .select((g :+ col(orderCol).as("__t") :+
        col(valueCol).cast("long").as("__x")): _*)
    val a = base.select((g :+ col("__t").as("__t1") :+
      col("__x").as("__x1")): _*)
    val b = base.select((g :+ col("__t").as("__t2") :+
      col("__x").as("__x2")): _*)
    val s = a.join(b, groupCols).filter(col("__t1") < col("__t2"))
      .groupBy(g: _*)
      .agg(sum(signum(col("__x2") - col("__x1")).cast("long")).as("s_stat"))
    val n = base.groupBy(g: _*).agg(count(lit(1)).as("n_points"))
    val ties = base.groupBy(g :+ col("__x"): _*)
      .agg(count(lit(1)).as("__tc"))
      .groupBy(g: _*)
      .agg(sum(col("__tc") * (col("__tc") - 1) *
        (col("__tc") * 2 + 5)).as("__tiesum"))
    val joined = n.join(s, groupCols).join(ties, groupCols)
      .filter(col("n_points") >= 2)
      .withColumn("__var18",
        col("n_points") * (col("n_points") - 1) *
          (col("n_points") * 2 + 5) - col("__tiesum"))
    val varS = col("__var18").cast("double") / 18.0
    val z = when(col("__var18") > 0,
      when(col("s_stat") > 0,
          (col("s_stat") - 1L).cast("double") / sqrt(varS))
        .when(col("s_stat") < 0,
          (col("s_stat") + 1L).cast("double") / sqrt(varS))
        .otherwise(lit(0.0)))
    joined
      .withColumn("__z", z)
      .select(g :+ col("n_points") :+ col("s_stat") :+
        round(varS, 6).as("var_s") :+
        round(col("__z"), 6).as("z") :+
        coalesce(abs(col("__z")) > Z975, lit(false)).as("trending"): _*)
  }

  /** CUSUM change-point per group: with series total T over n points,
    * the scaled cumulative deviation n·S_k = n·Σ_{i≤k} x_i − k·T is an
    * EXACT long (S_k = Σ_{i≤k}(x_i − mean) would be fractional); the
    * change point is the first period k maximizing |n·S_k|, the
    * magnitude is max|S_k| = max|n·S_k|/n, and the before/after means
    * quantify the shift. Output: (group…, n_points, change_point,
    * cusum_max, mean_before, mean_after, shift). Groups with < 2
    * points drop; a flat series reports cusum_max 0 and shift 0 at
    * the first period.
    */
  def cusumChangePoint(series: DataFrame, groupCols: Seq[String],
                       orderCol: String, valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val base = series.filter(col(valueCol).isNotNull)
      .select((g :+ col(orderCol).as("__t") :+
        col(valueCol).cast("long").as("__x")): _*)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val cum = base
      .withColumn("__k", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("__t"))))
      .withColumn("__ck", sum(col("__x")).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__tot", sum(col("__x")).over(wAll))
      .filter(col("__n") >= 2)
      // exact long: n*S_k = n*cum_k − k*T
      .withColumn("__ns",
        col("__n") * col("__ck") - col("__k") * col("__tot"))
    // the change point: first period with the maximal |n·S_k|
    val wPick = Window.partitionBy(g: _*)
      .orderBy(abs(col("__ns")).desc, col("__t").asc)
    val picked = cum
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
    picked.select(g ++ Seq(
      col("__n").as("n_points"),
      col("__t").as("change_point"),
      round(abs(col("__ns")).cast("double") / col("__n"), 6)
        .as("cusum_max"),
      round(col("__ck").cast("double") / col("__k"), 6).as("mean_before"),
      when(col("__n") > col("__k"),
        round((col("__tot") - col("__ck")).cast("double") /
          (col("__n") - col("__k")), 6)).as("mean_after"),
      when(col("__n") > col("__k"),
        round((col("__tot") - col("__ck")).cast("double") /
          (col("__n") - col("__k")) -
          col("__ck").cast("double") / col("__k"), 6))
        .as("shift")): _*)
  }

  /** Gini concentration of a per-period count series — the
    * BURSTINESS readout per group: gini ≈ 0 means volume spreads
    * evenly across periods, → 1 means a few periods carry everything
    * (a dump-shaped scrape, a replayed backfill, a broken sampler).
    * Complements [[mannKendall]]/[[cusumChangePoint]]: those ask
    * "does the series move"; this asks "how unequal is it".
    *
    * Standard rank formula on the ascending-sorted series
    * (ties broken by `tCol` for determinism):
    * G = 2·Σᵢ i·xᵢ / (D·Σx) − (D+1)/D, with `peak_share` = max/Σ as
    * the companion single-period concentration. Integer numerators
    * stay exact longs; doubles appear only at the final division, 6dp
    * at the boundary. Like the other series ops the input is the
    * periods × groups aggregate — windows run on calendar-bounded
    * frames, never raw rows. Groups with zero total emit no row.
    */
  def giniConcentration(series: DataFrame, groupCols: Seq[String],
                        tCol: String, xCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val wOrd = Window.partitionBy(g: _*).orderBy(col(xCol), col(tCol))
    val wAll = Window.partitionBy(g: _*)
    series
      .withColumn("__i", row_number().over(wOrd).cast("long"))
      .withColumn("__d", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col(xCol)).over(wAll))
      .withColumn("__mx", max(col(xCol)).over(wAll))
      .filter(col("__s") > 0)
      .groupBy(g: _*)
      .agg(
        max(col("__d")).as("n_periods"),
        max(col("__s")).as("total_x"),
        round((lit(2L) * sum(col("__i") * col(xCol))).cast("double")
            / (max(col("__d")) * max(col("__s")))
          - (max(col("__d")) + 1).cast("double") / max(col("__d")), 6)
          .as("gini"),
        round(max(col("__mx")).cast("double") / max(col("__s")), 6)
          .as("peak_share"))
  }

  /** Index of dispersion (variance-to-mean ratio) per group over an
    * integer count series — the Poisson-ness check: independent
    * arrivals give D ≈ 1, batch dumps / scripted bursts push D ≫ 1
    * (overdispersion), and rate-limited/templated feeds pin D < 1.
    * The one-number companion to the burstiness Gini (t158) with an
    * actual null model attached.
    *
    * Exactness: sample variance comes from exact BIGINT moments
    * (n·Σx² − (Σx)²), so D is a closed-form expression of exact
    * integers — bit-identical across engines. The flag judges the
    * UNROUNDED D against `threshold` on both engines (one IEEE
    * expression each side).
    *
    * Scale shape: one map-side-combinable moment aggregate over the
    * caller's per-period series; output is one row per group. Groups
    * with < 2 periods or zero total drop.
    *
    * Output: (groups…, n, total, mean_daily, dispersion,
    * overdispersed) — 6dp.
    */
  def dispersionIndex(series: DataFrame, groupCols: Seq[String],
                      xCol: String, threshold: Double = 1.5): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val x = col(xCol).cast("long")
    val m = series.groupBy(g: _*)
      .agg(count(lit(1)).as("n"), sum(x).as("total"),
        sum(x * x).as("__sxx"))
      .filter(col("n") >= 2 && col("total") > 0)
    val d = (col("n") * col("__sxx") - col("total") * col("total"))
      .cast("double") / (col("n").cast("double") * (col("n") - 1)) /
      (col("total").cast("double") / col("n"))
    m.select(g :+ col("n") :+ col("total") :+
      round(col("total").cast("double") / col("n"), 6).as("mean_daily") :+
      round(d, 6).as("dispersion") :+
      (d > threshold).as("overdispersed"): _*)
  }

  /** Rolling Pearson correlation between two integer-valued series
    * over a trailing `win`-period window — the co-movement monitor
    * (do clicks and purchases still track each other this week?)
    * that a single whole-history correlation (t128) averages away:
    * coupling breaks show up as the rolling r diving while the global
    * r still looks healthy.
    *
    * Exactness: the five window moments (Σx, Σy, Σxy, Σx², Σy²) are
    * EXACT BIGINT sums over the integer series, so r is one closed-
    * form expression of exact integers with a single sqrt — bit-
    * identical across engines (the t127/t163 moment contract, windowed).
    * Only complete windows emit (n = win); degenerate windows (either
    * series constant) yield NULL r rather than 0/0.
    *
    * Scale shape: the input is the caller's per-period aggregate, so
    * the ordered window runs over n_periods rows — calendar-bounded
    * (the t158 shape). Output: (orderCol, x, y, r) — r 6dp.
    */
  def rollingCorrelation(series: DataFrame, orderCol: String,
                         xCol: String, yCol: String,
                         win: Int = 7): DataFrame = {
    require(win >= 2, s"win must be >= 2, got $win")
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(-(win - 1), Window.currentRow)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val m = series
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(x).over(w))
      .withColumn("__sy", sum(y).over(w))
      .withColumn("__sxy", sum(x * y).over(w))
      .withColumn("__sxx", sum(x * x).over(w))
      .withColumn("__syy", sum(y * y).over(w))
      .filter(col("__n") === win)
    val varX = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val varY = col("__n") * col("__syy") - col("__sy") * col("__sy")
    m.select(col(orderCol), col(xCol), col(yCol),
      when(varX > 0 && varY > 0,
        round((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double")
          / sqrt(varX.cast("double") * varY.cast("double")), 6)).as("r"))
  }

  /** Sample AUTOCORRELATION function per group at lags 1..`maxLag` —
    * the periodicity/memory readout the other detectors here don't
    * give: a weekly scrape cadence spikes r₇, a sticky backlog decays
    * slowly from r₁, independent arrivals sit near 0 everywhere.
    * Standard sample ACF (fixed whole-series mean):
    * r_k = Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)².
    *
    * Exactness: both sums are exact integers after multiplying the
    * mean away — with S = Σx over n periods, r_k = Σ(n·x_t−S)(n·x_{t−k}−S)
    * / Σ(n·x_t−S)² — accumulated as DECIMAL(38,0) (HUGEINT on the
    * oracle side), one double divide at the 6dp boundary. A constant
    * series (zero denominator) yields NULL acf.
    *
    * The caller supplies a COMPLETE per-period series (zero-filled
    * grid for count series — an absent day is 0 events, and skipping
    * it would silently splice distant days adjacent). Scale shape:
    * one broadcast |groups|-row moment join, then ONE per-group
    * ordered window carrying all `maxLag` lag columns (one shuffle,
    * one sort, calendar-bounded partitions — the t158 series
    * contract), a map-side-combinable moment aggregate, and a
    * maxLag-row explode per group.
    *
    * Output: (groups…, lag, n_days, acf) — one row per (group, lag).
    */
  def autocorrelation(series: DataFrame, groupCols: Seq[String],
                      orderCol: String, valueCol: String,
                      maxLag: Int = 7): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val g = groupCols.map(col)
    val base = series.select(g :+ col(orderCol).as("__t") :+
      col(valueCol).cast("long").as("__x"): _*)
    val st = base.groupBy(g: _*)
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val w = Window.partitionBy(g: _*).orderBy(col("__t"))
    val c = base.join(broadcast(st), groupCols)
      .withColumn("__y",
        (col("__n") * col("__x") - col("__s")).cast("decimal(38,0)"))
    val lagged = (1 to maxLag).foldLeft(c)((df, k) =>
      df.withColumn(s"__y$k", lag(col("__y"), k).over(w)))
    val agg = lagged.groupBy(g: _*)
      .agg(count(lit(1)).as("n_days"),
        sum(col("__y") * col("__y")).as("__den") +:
        (1 to maxLag).map(k =>
          sum(col("__y") * col(s"__y$k")).as(s"__m$k")): _*)
    val lags = array((1 to maxLag).map(k =>
      struct(lit(k.toLong).as("lag"), col(s"__m$k").as("num"))): _*)
    agg.select(g :+ col("n_days") :+ col("__den") :+
        explode(lags).as("__e"): _*)
      .select(g :+ col("__e.lag").as("lag") :+ col("n_days") :+
        round(col("__e.num").cast("double") /
          when(col("__den") =!= 0, col("__den")).cast("double"), 6)
          .as("acf"): _*)
  }

  /** THEIL–SEN robust trend line per group: slope = left-continuous
    * median over all period pairs i<j of (x_j−x_i)/(t_j−t_i),
    * intercept = median of (x_i − slope·t_i) (Conover). The robust
    * companion to [[mannKendall]] — MK says WHETHER the series
    * trends; this says HOW FAST, and unlike OLS (t127) a handful of
    * dump days can't drag the line (29% breakdown point).
    *
    * Determinism: each pairwise slope is ONE IEEE divide of exact
    * integers — bit-identical across engines — and both medians are
    * selections (the [[ops.Profiling.weightedQuantiles]] rank test
    * 2·cum ≥ n over distinct-value blocks), never averages, so the
    * output is a value both engines computed identically, 6dp-rounded
    * for display only.
    *
    * Scale shape: the input is the caller's per-period series
    * (zero-filled grid), so the pair join expands period-pairs —
    * n_periods²/2 per group, calendar-bounded (365 days → 66k pairs),
    * NEVER row pairs — and both median windows run over per-group
    * distinct slope/intercept values. The slope broadcast back into
    * the intercept pass is |groups|-row.
    *
    * Output: (groups…, n_days, n_pairs, slope, intercept).
    */
  def theilSen(series: DataFrame, groupCols: Seq[String],
               orderCol: String, valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val base = series.select(g :+ col(orderCol).cast("long").as("__t") :+
      col(valueCol).cast("long").as("__x"): _*)
    val a = base.select(g :+ col("__t").as("__t1") :+
      col("__x").as("__x1"): _*)
    val b = base.select(g :+ col("__t").as("__t2") :+
      col("__x").as("__x2"): _*)
    val pairs = a.join(b, groupCols).filter(col("__t2") > col("__t1"))
      .select(g :+ ((col("__x2") - col("__x1")).cast("double") /
        (col("__t2") - col("__t1")).cast("double")).as("__slope"): _*)
    def lMedian(df: DataFrame, vCol: String, nAs: String,
                statAs: String): DataFrame = {
      val blocks = df.groupBy(g :+ col(vCol): _*).agg(count(lit(1)).as("__c"))
      val wAll = Window.partitionBy(g: _*)
      val wOrd = wAll.orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      blocks
        .withColumn("__n", sum(col("__c")).over(wAll))
        .withColumn("__cw", sum(col("__c")).over(wOrd))
        .filter(col("__cw") * 2 >= col("__n"))
        .groupBy(g: _*)
        .agg(min(col(vCol)).as(statAs), max(col("__n")).as(nAs))
    }
    val med = lMedian(pairs, "__slope", "n_pairs", "__sl")
    val ivals = base.join(broadcast(med), groupCols)
      .select(g :+ (col("__x").cast("double") -
        col("__sl") * col("__t").cast("double")).as("__iv"): _*)
    val imed = lMedian(ivals, "__iv", "n_days", "__ic")
    med.join(imed, groupCols)
      .select(g :+ col("n_days") :+ col("n_pairs") :+
        round(col("__sl"), 6).as("slope") :+
        round(col("__ic"), 6).as("intercept"): _*)
  }

  /** SEASONALITY profile per group over a complete per-period count
    * series: the day-of-week (or any modular phase) multiplicative
    * index — index_p = (phase mean)/(overall mean) — the "weekends
    * run at 0.7×" table behind dashboard normalization and the
    * deseasonalization step feeding [[theilSen]]/[[mannKendall]].
    *
    * Exactness: index_p = (S_p·n)/(n_p·S) — ONE IEEE divide of exact
    * BIGINT products (sums and counts never touch floats), 6dp at
    * the boundary. Zero overall mass yields NULL indices.
    *
    * Scale shape: the caller's daily count is the corpus-sized stage;
    * this is two map-side-combinable reductions over the
    * calendar-bounded daily frame and a |groups|-row broadcast join.
    *
    * Output: (groups…, phase, n_periods, seasonal_index 6dp).
    */
  def seasonalIndices(series: DataFrame, groupCols: Seq[String],
                      orderCol: String, valueCol: String,
                      cycle: Int = 7): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(cycle >= 2, s"cycle must be >= 2, got $cycle")
    val g = groupCols.map(col)
    val base = series.select(g :+ (col(orderCol).cast("long") % cycle)
      .as("phase") :+ col(valueCol).cast("long").as("__x"): _*)
    val st = base.groupBy(g: _*)
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    base.groupBy(g :+ col("phase"): _*)
      .agg(count(lit(1)).as("n_periods"), sum(col("__x")).as("__sp"))
      .join(broadcast(st), groupCols)
      .select(g :+ col("phase") :+ col("n_periods") :+
        when(col("__s") > 0,
          round((col("__sp") * col("__n")).cast("double") /
            (col("n_periods") * col("__s")).cast("double"), 6))
          .as("seasonal_index"): _*)
  }

  /** SEASONALLY-ADJUSTED robust outlier summary per group — the
    * anomaly detector that doesn't cry wolf every weekend: divide
    * each period's count by its [[seasonalIndices]] multiplicative
    * index, then run the median/MAD modified-z summary
    * ([[graft.ops.Profiling.robustOutliers]]) on the deseasonalized
    * series. A Sunday at half volume is NORMAL under the index; a
    * Tuesday at half volume still flags.
    *
    * Exactness: the deseasonalized value x/index = (x·n_p·S)/(S_p·n)
    * is one IEEE divide of exact BIGINT products, micro-rounded to a
    * BIGINT before the median/MAD machinery — so every downstream
    * selection and flag comparison is integer arithmetic (the t188
    * contract on micro units).
    *
    * Scale shape: the caller's daily count is the corpus-sized
    * stage; the phase/moment joins are |groups|·cycle rows, and the
    * robust summary runs on the calendar-bounded micro frame.
    *
    * Output: (groups…, n, med, mad, n_outliers, outlier_frac) — med/
    * mad in micro units of the DESEASONALIZED value (10⁶ × the
    * period-mean scale). Caveat shared with every mean-based index:
    * a large outlier contaminates its own phase's index, so its
    * phase-mates deviate too — robust (median) indices are the
    * escape hatch if single-day crashes must flag alone.
    */
  def seasonalOutliers(series: DataFrame, groupCols: Seq[String],
                       orderCol: String, valueCol: String,
                       cycle: Int = 7): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(cycle >= 2, s"cycle must be >= 2, got $cycle")
    val g = groupCols.map(col)
    val base = series.select(g :+ col(orderCol).cast("long").as("__d") :+
      col(valueCol).cast("long").as("__x"): _*)
    val st = base.groupBy(g: _*)
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val dm = base.groupBy(g :+ (col("__d") % cycle).as("__phase"): _*)
      .agg(count(lit(1)).as("__np"), sum(col("__x")).as("__sp"))
    val micro = base
      .withColumn("__phase", col("__d") % cycle)
      .join(broadcast(dm), groupCols :+ "__phase")
      .join(broadcast(st), groupCols)
      .select(g :+ round(lit(1000000.0) *
        (col("__x").cast("decimal(38,0)") * col("__np") * col("__s"))
          .cast("double") /
        (col("__sp").cast("decimal(38,0)") * col("__n")).cast("double"))
        .cast("long").as("__m"): _*)
    graft.ops.Profiling.robustOutliers(micro, groupCols, col("__m"))
  }
}
