package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** One-pass column profiling — the data-quality summary every ingest
  * pipeline runs before expensive stages: per column, the null count,
  * distinct count, and min/max rendered as strings so heterogeneous
  * column types share one result schema.
  *
  * Scale shape: a single global aggregate — map-side partials, one
  * 1-row exchange. The only scale caveat is `profile`'s EXACT distinct
  * counts, which plan as one Expand branch per profiled column (rows ×
  * |columns| before partial aggregation); `profileApprox` swaps in
  * HyperLogLog sketches (`approx_count_distinct`) — same plan minus
  * the Expand, the form to run at 100 TB. The exact form is kept
  * because the oracle checks exact values (q42); the approx form is
  * bounds-checked in ProfilingSpec and timed against it in
  * StageProfile.
  *
  * Both variants build the result with the Column API only — column
  * names are carried as struct-field literals, never interpolated into
  * generated SQL, so names containing quotes/backticks/dots profile
  * fine.
  */
object Profiling {

  private def renderer(df: DataFrame, c: String): Column => Column =
    df.schema(c).dataType match {
      // floating-point min/max render through DECIMAL(18,2) so the
      // string form is engine-portable (raw double→string is not)
      case DoubleType | FloatType => _.cast("decimal(18,2)").cast("string")
      case _ => _.cast("string")
    }

  /** Reference a top-level column by its LITERAL name: backtick-quoted
    * (embedded backticks doubled), so dots/quotes in the name are data,
    * not attribute-path syntax.
    */
  private def byName(c: String): Column =
    col("`" + c.replace("`", "``") + "`")

  private def profileWith(df: DataFrame, columns: Seq[String],
                          distinctAgg: Column => Column): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    // one struct-valued aggregate per column, aliased positionally —
    // the data column name never enters an identifier or SQL string
    val aggs = columns.zipWithIndex.map { case (c, i) =>
      val toStr = renderer(df, c)
      val src = byName(c)
      struct(
        count(when(src.isNull, 1)).as("n_nulls"),
        distinctAgg(src).as("n_distinct"),
        toStr(min(src)).as("min_str"),
        toStr(max(src)).as("max_str")).as(s"__p$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(columns.zipWithIndex.map { case (c, i) =>
        struct(
          lit(c).as("col_name"),
          col(s"__p$i").getField("n_nulls").as("n_nulls"),
          col(s"__p$i").getField("n_distinct").as("n_distinct"),
          col(s"__p$i").getField("min_str").as("min_str"),
          col(s"__p$i").getField("max_str").as("max_str"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Profile `columns` of `df` into one row per column:
    * (col_name, n_nulls, n_distinct, min_str, max_str) with EXACT
    * distinct counts.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame =
    profileWith(df, columns, count_distinct(_))

  /** `profile` with approximate (HLL) distinct counts — identical
    * schema, no per-column Expand branch: the variant to run at corpus
    * scale. `rsd` is the HLL relative standard deviation (Spark's
    * default 0.05).
    */
  def profileApprox(df: DataFrame, columns: Seq[String],
                    rsd: Double = 0.05): DataFrame =
    profileWith(df, columns, approx_count_distinct(_, rsd))

  /** Exact WEIGHTED quantiles per group — the smallest value v whose
    * cumulative weight reaches q·W (the left-continuous weighted
    * order statistic): the sample-weight-aware percentile every
    * mixture-weighted corpus needs, where the unweighted percentile
    * (t13/t120) silently over-represents down-weighted rows. Emits
    * the p25/p50/p75 trio.
    *
    * Exactness: values collapse to (group, value) blocks with exact
    * weight sums; the rank test `cw·k ≥ W·m` is pure integer
    * arithmetic (no q·W float product to straddle), and the selected
    * values are DATA values — no interpolation, engine-identical by
    * construction.
    *
    * Scale shape: one map-side-combinable block collapse, then the
    * [[graft.ops.Eval.aucRank]]-style per-group cumulative window
    * over DISTINCT values (bin first at billion-distinct-value
    * cardinality — the t137 hatch). Output: (groups…, total_weight,
    * p25, p50, p75).
    */
  def weightedQuantiles(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, weightCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val blocks = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val ord = whole.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    blocks
      .withColumn("__tw", sum(col("__w")).over(whole))
      .withColumn("__cw", sum(col("__w")).over(ord))
      .groupBy(g: _*)
      .agg(max(col("__tw")).as("total_weight"),
        min(when(col("__cw") * 4 >= col("__tw"), col("__v"))).as("p25"),
        min(when(col("__cw") * 2 >= col("__tw"), col("__v"))).as("p50"),
        min(when(col("__cw") * 4 >= col("__tw") * 3, col("__v"))).as("p75"))
  }

  /** Benford's-law conformance audit per group: the leading-digit
    * distribution of a positive numeric column against the Benford
    * expectation P(d) = log₁₀(1 + 1/d), summarized as the mean
    * absolute deviation over all nine digits — the classic
    * fabricated-/synthetic-numbers tripwire (hand-typed and
    * template-generated amounts flatten the leading-digit curve long
    * before any distributional test sees it).
    *
    * Leading digit extraction is integer-exact and engine-portable:
    * values scale to BIGINT cents (one IEEE multiply + half-away
    * round on both engines), and the digit is the first character of
    * the decimal string — no float log₁₀ near power-of-ten
    * boundaries. Every group scores ALL nine digits: absent digits
    * contribute their full |0 − P(d)| via a broadcast 9-row digit
    * grid, so a group stuck on one digit is maximally penalized
    * rather than silently under-measured. Deviation terms route
    * through the BIGINT micro boundary (t167 convention) so the MAD
    * sum is order-independent.
    *
    * Scale shape: one map-side-combinable (group, digit) count — the
    * only corpus-sized stage; the grid join and MAD arithmetic run on
    * ≤ 9 rows per group. Output: (groups…, n_values, k_digits, mad)
    * — mad 6dp; groups with no positive values drop.
    */
  /** Functional-dependency audit for one candidate rule lhs → rhs:
    * does the lhs column determine the rhs column, and how badly does
    * it fail — group count, violating-group count (groups with > 1
    * distinct rhs), and the rule's CONFIDENCE (share of rows kept if
    * each lhs group snapped to its majority rhs: Σ_g max_v n_gv / N,
    * the standard FD-mining score). The schema-drift / join-key
    * sanity probe every ingest runs: "event_id determines event_type"
    * breaking is a pipeline bug long before any statistic moves.
    *
    * Scale shape: one map-side-combinable (lhs, rhs) count, one
    * lhs-keyed reduction (max / sum / distinct-count via count of the
    * aggregated frame), one 1-row global roll-up — nothing after the
    * first aggregate is corpus-sized. NULLs group as values on both
    * engines. All counts exact BIGINTs; confidence is one divide.
    *
    * Output: ONE row (n_groups, n_violating, n_rows, confidence,
    * holds) — callers union several audits with a label column.
    */
  def fdAudit(df: DataFrame, lhsCol: String, rhsCol: String): DataFrame = {
    val c = df.groupBy(col(lhsCol), col(rhsCol))
      .agg(count(lit(1)).as("__n"))
    val g = c.groupBy(col(lhsCol))
      .agg(sum(col("__n")).as("__tot"), max(col("__n")).as("__mx"),
        count(lit(1)).as("__k"))
    g.agg(count(lit(1)).as("n_groups"),
        sum(when(col("__k") > 1, 1L).otherwise(0L)).as("n_violating"),
        sum(col("__tot")).as("n_rows"),
        round(sum(col("__mx")).cast("double") / sum(col("__tot")), 6)
          .as("confidence"))
      .withColumn("holds", col("n_violating") === 0L)
  }

  def benfordAudit(df: DataFrame, groupCols: Seq[String],
                   valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .withColumn("__cents", round(col(valueCol) * 100, 0).cast("long"))
      .filter(col("__cents") > 0)
      .groupBy(g :+ substring(col("__cents").cast("string"), 1, 1)
        .cast("long").as("__digit"): _*)
      .agg(count(lit(1)).as("__n"))
    val totals = counts.groupBy(g: _*)
      .agg(sum(col("__n")).as("__tot"))
    val grid = totals.select(g :+ col("__tot") :+
      explode(sequence(lit(1L), lit(9L))).as("__digit"): _*)
    grid.join(counts, groupCols :+ "__digit", "left")
      .withColumn("__nd", coalesce(col("__n"), lit(0L)))
      .withColumn("__micro",
        round(abs(col("__nd").cast("double") / col("__tot")
          - log10(lit(1.0) + lit(1.0) / col("__digit"))) * lit(1e6), 0)
          .cast("long"))
      .groupBy(g: _*)
      .agg(max(col("__tot")).as("n_values"),
        sum(when(col("__nd") > 0, 1L).otherwise(0L)).as("k_digits"),
        sum(col("__micro")).as("__msum"))
      .select(g :+ col("n_values") :+ col("k_digits") :+
        round(col("__msum").cast("double") / 1e6 / 9.0, 6).as("mad"): _*)
  }

  /** ROBUST outlier summary per group — median / MAD flagging on an
    * integer-scaled metric (the modified z-score convention,
    * Iglewicz–Hoaglin): |x − med| > cutoff·1.4826·MAD. The
    * heavy-tail-safe replacement for mean/σ fences, which a single
    * extreme dump value drags wide open (the σ chases the outliers
    * it's meant to catch; the median and MAD don't move).
    *
    * The caller supplies the metric as exact integers (cents,
    * micros, counts — the Benford cents convention), so EVERYTHING
    * is integer arithmetic: both order statistics are the
    * left-continuous weighted form (smallest v with 2·cum ≥ n — the
    * [[weightedQuantiles]] rank test at p = 1/2), and the flag test
    * |x − med|·10⁴ > scaledCutoff·MAD multiplies through the float
    * factor (default 51891 = ⌈3.5·1.4826·10⁴⌉ deci-milli units) so
    * no float compare ever runs — bit-identical across engines.
    *
    * Scale shape: ONE corpus-sized map-side-combinable (group,
    * value) count, pinned; the median window, the deviation
    * re-collapse, the MAD window, and the outlier count all run on
    * that distinct-value frame (windows bounded by per-group
    * distinct-value cardinality — bounded by the quantized domain;
    * bin first past that, the t137 hatch). The med/MAD tables are
    * |groups|-row broadcasts.
    *
    * Output: (groups…, n, med, mad, n_outliers, outlier_frac) —
    * med/mad in the caller's integer units, frac 6dp.
    */
  def robustOutliers(df: DataFrame, groupCols: Seq[String],
                     intCol: Column,
                     scaledCutoff: Long = 51891L): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val W = org.apache.spark.sql.expressions.Window
    val vc = df.select(g :+ intCol.cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .groupBy(g :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // distinct-value blocks feed all 3 passes
    def orderStat(blocks: DataFrame, vCol: String): DataFrame = {
      val whole = W.partitionBy(g: _*)
      val ord = whole.orderBy(col(vCol))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      blocks
        .withColumn("__n", sum(col("__c")).over(whole))
        .withColumn("__cw", sum(col("__c")).over(ord))
        .filter(col("__cw") * 2 >= col("__n"))
        .groupBy(g: _*)
        .agg(min(col(vCol)).as("__stat"), max(col("__n")).as("__nn"))
    }
    val med = orderStat(vc, "__v")
      .select(g :+ col("__stat").as("med") :+ col("__nn").as("n"): _*)
    val devBlocks = vc.join(broadcast(med), groupCols)
      .groupBy(g :+ abs(col("__v") - col("med")).as("__d"): _*)
      .agg(sum(col("__c")).as("__c"))
    val mad = orderStat(devBlocks, "__d")
      .select(g :+ col("__stat").as("mad"): _*)
    vc.join(broadcast(med), groupCols).join(broadcast(mad), groupCols)
      .groupBy(g: _*)
      .agg(max(col("n")).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(abs(col("__v") - col("med")) * 10000L >
          lit(scaledCutoff) * col("mad"), col("__c")).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_frac",
        round(col("n_outliers").cast("double") / col("n").cast("double"), 6))
  }
}
