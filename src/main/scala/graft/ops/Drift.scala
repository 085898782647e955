package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample distribution-drift diagnostics — the monitoring step a
  * training-data pipeline runs between corpus snapshots (did the value
  * distribution of a source shift since the last crawl?) and between
  * splits (is validation distributed like train?).
  *
  * Two detectors with complementary scale shapes:
  *
  *  - [[ksStatistic]] — exact two-sample Kolmogorov–Smirnov:
  *    D = sup_x |F_a(x) − F_b(x)|, evaluated at every observed value
  *    (the sup of a right-continuous step difference is attained at a
  *    step). One groupBy(value) shuffle collapses duplicates, then ONE
  *    ordered window per group builds both ECDFs in a single pass.
  *    The window sorts each group's distinct values inside one
  *    partition — exact KS is inherently a per-group sort, so groups
  *    parallelize but a single group's distinct-value count must fit a
  *    partition. For billion-distinct-value (continuous) groups use
  *    [[ksStatisticBinned]] — same statistic over a bins-sized window
  *    — or [[psi]], the binned detector that never sorts.
  *
  *  - [[psi]] — Population Stability Index over FIXED literal bin
  *    edges: Σ (p_a − p_b)·ln(p_a/p_b), shares clamped at `eps` so
  *    empty bins stay finite (the industry convention; PSI < 0.1 is
  *    the customary "stable" reading). Pure conditional-sum
  *    aggregation — map-side combinable, one shuffle of
  *    O(groups·bins) rows, any scale.
  *
  * Both emit per-group rows with engine-portable arithmetic (integer
  * cumulative counts, IEEE ratios, 6dp rounding at the boundary) so a
  * SQL oracle replays them exactly.
  */
object Drift {

  /** Exact two-sample KS per group. `sideA` is a boolean column
    * splitting rows into samples A (true) and B (false). Output:
    * (groupCols…, n_a, n_b, ks_d, ks_crit, drifted) — `ks_crit` the
    * α=0.05 large-sample critical value 1.358·√((n_a+n_b)/(n_a·n_b)),
    * `drifted` = D > crit; rows with a NULL value or an empty side
    * yield no verdict and are dropped (n_a·n_b = 0 → no distribution
    * to compare).
    */
  def ksStatistic(df: DataFrame, groupCols: Seq[String], sideA: Column,
                  valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(sum(when(sideA, 1L).otherwise(0L)).as("__ca"),
           sum(when(sideA, 0L).otherwise(1L)).as("__cb"))
    ksFromCounts(counts, g, col("__v"))
  }

  /** Binned two-sample KS — the bounded-window escape hatch for
    * continuous / billion-distinct-value columns, where [[ksStatistic]]'s
    * exact per-group distinct-value sort would not fit a partition.
    * Values bin against literal `edges` (the [[psi]] rule: bin k =
    * count of edges ≤ v), the ECDFs are evaluated at bin boundaries
    * only, and D̂ = max over boundaries of |F̂_a − F̂_b|.
    *
    * Resolution contract: D̂ ≤ D always (the binned sup scans a subset
    * of the exact sup's evaluation points), and D − D̂ ≤ the largest
    * single-bin probability mass (the ECDF difference moves at most
    * one bin's mass between consecutive boundaries) — with
    * quantile-spaced edges that is ≈ 1/(#bins). The per-group window
    * is (#edges + 1) rows regardless of data size; the only
    * corpus-sized stage is the map-side-combinable groupBy(group, bin).
    * Output schema matches [[ksStatistic]].
    */
  def ksStatisticBinned(df: DataFrame, groupCols: Seq[String],
                        sideA: Column, valueCol: String,
                        edges: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      "edges must be non-empty, sorted, distinct")
    val g = groupCols.map(col)
    val bin = edges.map(e => (col(valueCol) >= e).cast("int"))
      .reduce(_ + _).as("__bin")
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(g :+ bin: _*)
      .agg(sum(when(sideA, 1L).otherwise(0L)).as("__ca"),
           sum(when(sideA, 0L).otherwise(1L)).as("__cb"))
    ksFromCounts(counts, g, col("__bin"))
  }

  /** [[ksStatisticBinned]] with the edges chosen FOR you, per group:
    * bin boundaries are the (1/k … (k−1)/k) quantiles of the
    * REFERENCE sample (side A) — equal-mass bins where the reference
    * has mass, which is where KS resolution matters (fixed literal
    * edges waste bins on empty regions and need domain knowledge to
    * place). The resolution bound tightens to D − D̂ ≤ max bin mass ≈
    * 1/k on the reference side by construction.
    *
    * Scale shape: one exact per-group percentile aggregate over the
    * reference rows (|groups| output rows, each carrying k−1 doubles)
    * broadcast back, bin assignment as a per-row fold over the edge
    * array, then the [[ksStatisticBinned]] tail — the per-group
    * window stays ≤ k rows. The exact percentile's per-group sort is
    * the oracle-checkable form; swap `percentile` for
    * `percentile_approx` (KLL-style sketch, bounded state) when a
    * single group's reference sample exceeds a partition — bins then
    * land within sketch tolerance of equal-mass, which only moves
    * WHERE the ECDFs are compared, not their values: D̂ stays a valid
    * lower bound of D, the resolution bound degrades by the sketch
    * error. Groups with no reference rows drop (no distribution to
    * compare against), matching the empty-side rule.
    */
  def ksStatisticQuantileBinned(df: DataFrame, groupCols: Seq[String],
                                sideA: Column, valueCol: String,
                                nBins: Int = 10, approx: Boolean = false,
                                accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val g = groupCols.map(col)
    val base = df.filter(col(valueCol).isNotNull)
      .select((g :+ col(valueCol).as("__v") :+ sideA.as("__sa")): _*)
    val ps = (1 until nBins).map(_.toDouble / nBins)
    // approx = the sketch-sized scale path (Greenwald–Khanna state,
    // no per-group sort): edges land within 1/accuracy rank error of
    // the true quantiles, which only moves WHERE the ECDFs compare —
    // D̂ stays a valid lower bound of the exact D for ANY edge set,
    // and the t146 gate pins |D̂_approx − D̂_exact-edges| ≤ 1/nBins
    val edgeAgg =
      if (approx) percentile_approx(col("__v"), array(ps.map(lit): _*),
        lit(accuracy))
      else percentile(col("__v"), array(ps.map(lit): _*))
    val edges = base.filter(col("__sa"))
      .groupBy(g: _*)
      .agg(edgeAgg.as("__edges"))
    val bin = aggregate(col("__edges"), lit(0),
      (acc, e) => acc + when(col("__v") >= e, 1).otherwise(0))
    val counts = base.join(broadcast(edges), groupCols)
      .groupBy(g :+ bin.as("__bin"): _*)
      .agg(sum(when(col("__sa"), 1L).otherwise(0L)).as("__ca"),
           sum(when(col("__sa"), 0L).otherwise(1L)).as("__cb"))
    ksFromCounts(counts, g, col("__bin"))
  }

  /** χ²₀.₉₅ critical values for df = 1..30 (literals shared verbatim
    * with the SQL oracle; computing them per-engine would risk
    * last-ulp disagreement at the comparison). Beyond 30 the
    * Wilson–Hilferty cube approximation takes over (< 0.1% relative
    * error there).
    */
  private[graft] val Chi2Crit95: Seq[Double] = Seq(
    3.841458821, 5.991464547, 7.814727903, 9.487729037, 11.070497694,
    12.591587244, 14.067140449, 15.507313056, 16.918977605, 18.307038053,
    19.675137573, 21.026069817, 22.362032495, 23.684791305, 24.99579014,
    26.296227605, 27.587111638, 28.86929943, 30.143527206, 31.410432844,
    32.670573341, 33.924438471, 35.172461627, 36.415028502, 37.652484133,
    38.88513866, 40.113272069, 41.337138151, 42.556967804, 43.772971826)

  /** Pearson χ² two-sample homogeneity test per group — the
    * CATEGORICAL member of the drift family ([[ksStatistic]] =
    * continuous, [[psi]] = binned stability): did the category mix of
    * `catCol` change between samples A and B? χ² = Σ over categories
    * and both samples of (observed − expected)²/expected, expected
    * from the pooled margins; df = #categories − 1; `drifted` = χ²
    * above the α=0.05 critical value (literal table to df 30,
    * Wilson–Hilferty beyond).
    *
    * Scale shape: one groupBy(group, category) count shuffle
    * (map-side combinable — the only corpus-sized stage), then
    * per-group windows and the final aggregate over CATEGORY-
    * cardinality rows. Groups with an empty side or a single category
    * yield no verdict and drop. Counts stay exact longs; the χ² terms
    * are the only doubles, rounded 6dp at the boundary.
    */
  def chiSquareDrift(df: DataFrame, groupCols: Seq[String], sideA: Column,
                     catCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val counts = df
      .filter(col(catCol).isNotNull)
      .groupBy(g :+ col(catCol).as("__c"): _*)
      .agg(sum(when(sideA, 1L).otherwise(0L)).as("__ca"),
           sum(when(sideA, 0L).otherwise(1L)).as("__cb"))
    val tot = Window.partitionBy(g: _*)
    val terms = counts
      .withColumn("__na", sum(col("__ca")).over(tot))
      .withColumn("__nb", sum(col("__cb")).over(tot))
      .withColumn("__n", (col("__na") + col("__nb")).cast("double"))
      .withColumn("__tc", (col("__ca") + col("__cb")).cast("double"))
      // NULL-mask the degenerate groups inside the expression (they
      // drop after the aggregate; ANSI would throw on their divisions
      // first): expected counts are > 0 whenever both sides are
      // non-empty, because every category row has __tc >= 1
      .withColumn("__term", when(col("__na") > 0 && col("__nb") > 0, {
        val ea = col("__tc") * col("__na").cast("double") / col("__n")
        val eb = col("__tc") * col("__nb").cast("double") / col("__n")
        (col("__ca").cast("double") - ea) * (col("__ca").cast("double") - ea) / ea +
          (col("__cb").cast("double") - eb) * (col("__cb").cast("double") - eb) / eb
      }))
    val z95 = 1.6448536269514722
    val agg = terms.groupBy(g: _*)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        (count(lit(1)) - 1L).as("dof"),
        sum(col("__term")).as("__chi2"))
      .filter(col("n_a") > 0 && col("n_b") > 0 && col("dof") >= 1)
    val whCrit = {
      val d = col("dof").cast("double")
      val inner = lit(1.0) - lit(2.0) / (lit(9.0) * d) +
        lit(z95) * sqrt(lit(2.0) / (lit(9.0) * d))
      d * inner * inner * inner
    }
    val crit = when(col("dof") <= 30,
      element_at(typedLit(Chi2Crit95), col("dof").cast("int")))
      .otherwise(whCrit)
    agg
      .withColumn("__crit", crit)
      .select(g :+ col("n_a") :+ col("n_b") :+ col("dof") :+
        round(col("__chi2"), 6).as("chi2") :+
        round(col("__crit"), 6).as("chi2_crit") :+
        (col("__chi2") > col("__crit")).as("drifted"): _*)
  }

  /** Shared KS tail: per-group cumulative ECDFs over `orderCol`
    * (distinct values for the exact form, bin ids for the binned
    * form — the window is as long as that column's per-group
    * cardinality) → sup |F_a − F_b| → critical value and verdict.
    */
  private def ksFromCounts(counts: DataFrame, g: Seq[Column],
                           orderCol: Column): DataFrame = {
    val w = Window.partitionBy(g: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(g: _*)
    val cum = counts
      .withColumn("__fa", sum(col("__ca")).over(w))
      .withColumn("__fb", sum(col("__cb")).over(w))
      .withColumn("__na", max(col("__fa")).over(tot))
      .withColumn("__nb", max(col("__fb")).over(tot))
    cum
      .groupBy(g: _*)
      // empty-side groups (__na or __nb = 0) are dropped below, but
      // ANSI mode would throw on their divisions before the filter can
      // run — NULL-mask them inside the aggregate instead (max ignores
      // NULLs; the group's __d is NULL only when the group is dropped)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(when(col("__na") > 0 && col("__nb") > 0,
          abs(col("__fa").cast("double") / col("__na")
            - col("__fb").cast("double") / col("__nb")))).as("__d"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("ks_crit",
        round(lit(1.358) * sqrt((col("n_a") + col("n_b")).cast("double") /
          (col("n_a") * col("n_b"))), 6))
      .select(g :+ col("n_a") :+ col("n_b") :+
        round(col("__d"), 6).as("ks_d") :+ col("ks_crit") :+
        (col("__d") > lit(1.358) * sqrt((col("n_a") + col("n_b")).cast("double") /
          (col("n_a") * col("n_b")))).as("drifted"): _*)
  }

  /** Robust per-group outlier profile via median/MAD (median absolute
    * deviation): robust_z = |v − median| / MAD flags tail values
    * without the mean/stddev's sensitivity to the very outliers being
    * hunted. Output one row per group: (groupCols…, n, med, mad,
    * n_outliers, max_z) with outlier = robust_z > k (when MAD = 0 —
    * a constant group — any deviation is an outlier and max_z is
    * reported NULL).
    *
    * Scale shape: two exact-percentile aggregations (groupBy — the
    * partial-agg shuffle carries per-group value buffers; exact
    * percentile is sort-based per group) plus one broadcast-sized join
    * back. For billion-row groups swap `percentile` for
    * `percentile_approx` — same plan shape, sketch-sized state; the
    * exact form is what the DuckDB oracle replays. The input is
    * scanned once per percentile stage (three passes total — inherent
    * to median-then-MAD); persist the input upstream if it is
    * expensive to recompute.
    */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val rows = df.filter(col(valueCol).isNotNull)
    val med = rows.groupBy(g: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val withMed = rows.join(med, groupCols)
      .withColumn("__ad", abs(col(valueCol) - col("med")))
    val mad = withMed.groupBy(g: _*)
      .agg(percentile(col("__ad"), lit(0.5)).as("mad"))
    withMed.join(mad, groupCols)
      .withColumn("__z",
        when(col("mad") > 0, col("__ad") / col("mad")))
      .withColumn("__out",
        when(col("mad") > 0, col("__ad") > lit(k) * col("mad"))
          .otherwise(col("__ad") > 0))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 6).as("med"),
        round(max(col("mad")), 6).as("mad"),
        sum(when(col("__out"), 1L).otherwise(0L)).as("n_outliers"),
        round(max(col("__z")), 6).as("max_z"))
  }

  /** Rolling z-score anomaly detection over a (group, time-ordered)
    * series — the monitoring readout for ingest volumes and metric
    * feeds: each point is scored against the mean/std of the
    * `window`-point TRAILING window that EXCLUDES the point itself
    * (a spike must not suppress its own alarm), flagged when
    * |z| > k. Points without a full trailing window emit NULL z and
    * never flag (no verdict without history).
    *
    * One per-group ordered window pass — groups parallelize across the
    * shuffle, window state is `window` rows. Output adds
    * (mean_prev, std_prev, z, anomaly) per input row.
    */
  def rollingAnomalies(df: DataFrame, groupCols: Seq[String], orderCol: String,
                       valueCol: String, window: Int = 7,
                       k: Double = 3.0): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(orderCol))
      .rowsBetween(-window, -1)
    val full = count(col(valueCol)).over(w) === window
    val mean = avg(col(valueCol)).over(w)
    val sq = avg(col(valueCol) * col(valueCol)).over(w)
    val std = sqrt(greatest(sq - mean * mean, lit(0.0)))
    df
      .withColumn("__full", full)
      .withColumn("mean_prev", when(col("__full"), round(mean, 6)))
      .withColumn("std_prev", when(col("__full"), round(std, 6)))
      .withColumn("z", when(col("__full") && std > 0,
        round((col(valueCol) - mean) / std, 6)))
      .withColumn("anomaly",
        coalesce(
          when(col("__full"),
            when(std > 0, abs((col(valueCol) - mean) / std) > k)
              .otherwise(col(valueCol) =!= mean))
            .otherwise(lit(false)),
          // a NULL value with a full window would otherwise yield a
          // NULL flag; no value -> no alarm
          lit(false)))
      .drop("__full")
  }

  /** PSI per group over literal `edges` (bin k = count of edges ≤ v,
    * so values below edges(0) fall in bin 0 and above the last edge in
    * bin edges.length). Output: (groupCols…, n_a, n_b, psi, stable)
    * with shares clamped at `eps` and `stable` = psi < 0.1.
    */
  def psi(df: DataFrame, groupCols: Seq[String], sideA: Column,
          valueCol: String, edges: Seq[Double],
          eps: Double = 1e-6): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      "edges must be non-empty, sorted, distinct")
    val g = groupCols.map(col)
    val bin = edges.map(e => (col(valueCol) >= e).cast("int"))
      .reduce(_ + _).as("__bin")
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(g :+ bin: _*)
      .agg(sum(when(sideA, 1L).otherwise(0L)).as("__ca"),
           sum(when(sideA, 0L).otherwise(1L)).as("__cb"))
    val tot = Window.partitionBy(g: _*)
    val shares = counts
      .withColumn("__na", sum(col("__ca")).over(tot))
      .withColumn("__nb", sum(col("__cb")).over(tot))
      .filter(col("__na") > 0 && col("__nb") > 0)
      .withColumn("__pa",
        greatest(col("__ca").cast("double") / col("__na"), lit(eps)))
      .withColumn("__pb",
        greatest(col("__cb").cast("double") / col("__nb"), lit(eps)))
    shares
      .groupBy(g: _*)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb")))
          .as("__psi"))
      .select(g :+ col("n_a") :+ col("n_b") :+
        round(col("__psi"), 6).as("psi") :+
        (col("__psi") < 0.1).as("stable"): _*)
  }

  /** Asymptotic two-sample KS p-value from a D statistic and the two
    * sample sizes: the Kolmogorov tail series
    * 2·Σ_{k≥1} (−1)^{k−1}·exp(−2k²·D²·n_e) with n_e = n_a·n_b/(n_a+n_b),
    * truncated at k = 3 and clamped to [0, 1]. The 3-term truncation
    * IS the contract (not an approximation detail): both engine and
    * oracle compute exactly these three exp terms, so the value is
    * reproducible; the truncation error is < exp(−32·D²·n_e) — already
    * below 6dp wherever p is small enough to matter.
    */
  def ksPValue(d: Column, nA: Column, nB: Column): Column = {
    val ne = nA.cast("double") * nB.cast("double") /
      (nA + nB).cast("double")
    val lam2 = d * d * ne
    least(lit(1.0), greatest(lit(0.0),
      lit(2.0) * (exp(lit(-2.0) * lam2) - exp(lit(-8.0) * lam2)
        + exp(lit(-18.0) * lam2))))
  }

  /** 1-Wasserstein (earth-mover) distance between the two samples per
    * group: W₁ = ∫|F_a − F_b| dx, evaluated exactly on the discrete
    * ECDFs as Σᵢ |F_a(vᵢ) − F_b(vᵢ)|·(vᵢ₊₁ − vᵢ) over consecutive
    * distinct values. The magnitude-aware complement to
    * [[ksStatistic]]'s sup: KS says whether the distributions differ,
    * W₁ says by HOW MUCH in value units (a whole-distribution 0.1
    * shift and a 0.1-mass outlier spike look alike to KS but not to
    * W₁). Same scale shape as exact KS — one groupBy(value) collapse,
    * one per-group ordered window (distinct values must fit a
    * partition; bin first for billion-distinct-value groups).
    * Output: (groups…, n_a, n_b, w1, v_range) — `v_range` = max−min
    * for scale-free reading; empty-side groups drop.
    */
  def wasserstein1(df: DataFrame, groupCols: Seq[String], sideA: Column,
                   valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(sum(when(sideA, 1L).otherwise(0L)).as("__ca"),
           sum(when(sideA, 0L).otherwise(1L)).as("__cb"))
    val ord = Window.partitionBy(g: _*).orderBy(col("__v"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(g: _*)
    counts
      .withColumn("__fa", sum(col("__ca")).over(cum))
      .withColumn("__fb", sum(col("__cb")).over(cum))
      .withColumn("__nv", lead(col("__v"), 1).over(ord))
      .withColumn("__na", max(col("__fa")).over(tot))
      .withColumn("__nb", max(col("__fb")).over(tot))
      .groupBy(g: _*)
      // empty-side divisions NULL-mask inside the aggregate (the
      // ksFromCounts ANSI convention); those groups drop below
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(when(col("__nv").isNull, lit(0.0))
          .otherwise(when(col("__na") > 0 && col("__nb") > 0,
            abs(col("__fa").cast("double") / col("__na")
              - col("__fb").cast("double") / col("__nb"))
              * (col("__nv") - col("__v"))))).as("__w1"),
        max(col("__v")).as("__vmax"), min(col("__v")).as("__vmin"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(g :+ col("n_a") :+ col("n_b") :+
        round(col("__w1"), 6).as("w1") :+
        round(col("__vmax") - col("__vmin"), 6).as("v_range"): _*)
  }

  /** Benjamini–Hochberg step-up FDR correction over a fleet of
    * simultaneous drift tests — the multiple-testing discipline a
    * monitoring panel needs once it watches hundreds of sources at
    * once (at α = 0.05, fifty clean monitors still raise ~2.5 raw
    * alarms per refresh; BH caps the EXPECTED FALSE-DISCOVERY RATE
    * instead).
    *
    * Ranks rows by ascending `pCol` (ties broken by `tieBreak` for
    * determinism), finds the largest rank k with p_(k) ≤ α·k/m, and
    * flags exactly ranks 1…k (`fdr_flag`) — the step-up rule, which
    * can flag a row whose own p exceeds its cutoff when a later rank
    * passes. Appends p_rank, m_tests, bh_cutoff (= α·rank/m, 6dp),
    * fdr_flag.
    *
    * Scale shape: the input is one row per MONITORED GROUP (a fleet of
    * detectors, thousands at most — metadata, not data), so the global
    * rank window runs over a model-sized frame; the corpus-sized work
    * happened upstream in the detector that produced the p-values.
    */
  def bhCorrect(tests: DataFrame, pCol: String, alpha: Double,
                tieBreak: Seq[String]): DataFrame = {
    val wOrd = Window.orderBy(col(pCol) +: tieBreak.map(col): _*)
    val wAll = Window.partitionBy()
    tests
      .withColumn("p_rank", row_number().over(wOrd).cast("long"))
      .withColumn("m_tests", count(lit(1)).over(wAll))
      .withColumn("bh_cutoff",
        round(lit(alpha) * col("p_rank") / col("m_tests"), 6))
      .withColumn("__pass",
        when(col(pCol) <= lit(alpha) * col("p_rank") / col("m_tests"),
          col("p_rank")))
      .withColumn("fdr_flag",
        col("p_rank") <= coalesce(max(col("__pass")).over(wAll), lit(0L)))
      .drop("__pass")
  }
}
