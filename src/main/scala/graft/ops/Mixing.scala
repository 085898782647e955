package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Temperature-weighted source mixing — the mT5/XLM-R α-sampling
    * shape for multilingual/multi-domain corpora: source s with share
    * p_s = n_s/N is sampled at the TEMPERED share
    *
    *   q_s = p_s^α / Σ_t p_t^α        (n_s^α works too — N^α cancels)
    *
    * so α = 1 keeps the natural proportions, α → 0 flattens toward
    * uniform, and intermediate α (0.3–0.7 in practice) upweights rare
    * sources without letting any dominate. Each source keeps
    * quota_s = min(n_s, ⌊targetRows · q_s⌋) rows — no upsampling here
    * (compose [[upsampleEpochs]] when rates above 1 are wanted) — via
    * the deterministic smallest-md5(key) cut every other sampler uses,
    * so the whole output is exactly SQL-replayable. The ⌊⌋ applies to
    * the 6dp-ROUNDED product (the cross-engine convention): a raw
    * floor sits one double ulp from flipping on engine arithmetic.
    *
    * Scale shape: one map-side-combinable count per source feeds a
    * group-cardinality quota table (the Σ-normalizer is a broadcast
    * 1-row aggregate OVER that table, never a second corpus pass);
    * quotas broadcast-join back on the group key and the cut is the
    * same salted two-level cap as [[sampleQuotas]] — no per-source
    * window funnel at any input size.
    */
  def temperatureMix(df: DataFrame, groupCol: String, keyCol: String,
                     alpha: Double, targetRows: Long,
                     salts: Int = 64): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1], got $alpha")
    require(targetRows >= 0, s"targetRows must be >= 0, got $targetRows")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val tempered = pow(col("__n").cast("double"), lit(alpha))
    val quotas = counts
      .crossJoin(broadcast(
        counts.agg(sum(pow(col("__n").cast("double"), lit(alpha)))
          .as("__z"))))
      .select(col(groupCol),
        least(col("__n"),
          floor(round(lit(targetRows.toDouble) * tempered / col("__z"), 6))
            .cast("long")).as("__quota"))
    Sampling.saltedCap(
        df.join(broadcast(quotas), groupCol),
        Seq(col(groupCol)),
        orderBy = md5(col(keyCol).cast("string")),
        saltBy = xxhash64(col(keyCol)),
        cap = col("__quota"), salts = salts)
      .drop("__quota")
  }

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

  /** Mixture under a WEIGHT budget rather than a row count — the form
    * real mixing uses (budgets are tokens, not documents): per group,
    * rank rows by the same deterministic smallest-md5(key) order as
    * [[sampleQuotas]] and keep the maximal prefix whose cumulative
    * weight stays within `budgets(group)` (`defaultBudget` for
    * unlisted groups). Weights must be non-negative, so the running
    * sum is monotone and `cum <= budget` IS the greedy prefix.
    *
    * Scale note: the cumulative sum is inherently order-dependent, so
    * this runs ONE window per group (a shuffle partitioned by group) —
    * fine while no single group is petabyte-hot. For a dominant
    * source, compose with [[sampleQuotas]] first (quota ≈ budget /
    * min expected weight) so the salted two-level cap trims the group
    * to a bounded candidate set BEFORE the exact budget window; the
    * md5 orders agree, so pre-capping at any quota ≥ the final kept
    * count does not change the selection.
    */
  def sampleWeightBudget(df: DataFrame, groupCol: String, keyCol: String,
                         weight: Column, budgets: Map[String, Long],
                         defaultBudget: Long): DataFrame = {
    val budget =
      if (budgets.isEmpty) lit(defaultBudget)
      else coalesce(element_at(typedLit(budgets), col(groupCol)),
                    lit(defaultBudget))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("wt", weight)
      // a negative weight would make the running sum non-monotone (a
      // NON-prefix subset passes `cum <= budget`), and a NULL weight
      // rides free (window sum skips nulls, so its cum repeats the
      // previous row's) — fail loudly on both (the Buckets.capped
      // id-type-guard convention)
      .withColumn("wt",
        when(col("wt").isNull || col("wt") < 0, raise_error(concat(
            lit("sampleWeightBudget: null or negative weight "),
            coalesce(col("wt").cast("string"), lit("null")),
            lit(" for key "),
            coalesce(col(keyCol).cast("string"), lit("null")))))
          .otherwise(col("wt")))
      .withColumn("cum", sum(col("wt")).over(w))
      .filter(col("cum") <= budget)
      .drop("cum")
  }

  /** Fractional-EPOCH upsampling — the other half of mixture design:
    * where [[sampleQuotas]] caps dominant sources DOWN, this repeats
    * prized sources UP by a real-valued epoch weight (the "Wikipedia
    * × 3.2" convention in LLM data recipes). A source with weight w
    * emits ⌊w⌋ full copies of every row (epoch = 0..⌊w⌋−1) plus one
    * PARTIAL epoch (epoch = ⌊w⌋) holding the ⌊frac(w)·|group|⌋
    * smallest-md5(key) rows — the same deterministic order as the
    * quota/budget samplers, so one md5 rank drives all three and the
    * whole output replays in any engine.
    *
    * Scale shape: full copies are a pure per-row explode (no shuffle
    * — a row's repeat count depends only on its own group column);
    * group sizes come from one map-side-combined count aggregate
    * broadcast back; the partial-epoch selection rides the salted
    * two-level cap, so no single task ever sees a whole source.
    */
  def upsampleEpochs(df: DataFrame, groupCol: String, keyCol: String,
                     weights: Map[String, Double], defaultWeight: Double,
                     salts: Int = 64): DataFrame = {
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
      s"upsampleEpochs: epoch weights must be non-negative, got " +
        (weights.filter(_._2 < 0) ++
          (if (defaultWeight < 0) Map("default" -> defaultWeight) else Map())))
    val w =
      if (weights.isEmpty) lit(defaultWeight)
      else coalesce(element_at(typedLit(weights), col(groupCol)),
                    lit(defaultWeight))
    // ⌊w⌋ full copies: explode a 0..⌊w⌋−1 sequence (empty for w < 1 —
    // explode drops the row, which IS the semantics)
    val full = df
      .withColumn("epoch", explode(
        when(floor(w) >= 1, sequence(lit(0), floor(w).cast("int") - 1))
          .otherwise(array().cast("array<int>"))))
    // partial epoch: the ⌊frac(w)·|group|⌋-row md5 prefix of the group
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val partial = Sampling.saltedCap(
        df.join(broadcast(counts), Seq(groupCol)),
        Seq(col(groupCol)),
        orderBy = md5(col(keyCol).cast("string")),
        saltBy = xxhash64(col(keyCol)),
        cap = floor((w - floor(w)) * col("__n")).cast("int"),
        salts = salts)
      .withColumn("epoch", floor(w).cast("int"))
      .drop("__n")
    full.unionByName(partial.select(full.columns.map(col).toSeq: _*))
  }

  /** WATER-FILLING budget allocation: split a total token `budget`
    * evenly across sources, except no source can receive more than it
    * HAS — a small source takes only its availability and its unused
    * share redistributes to the rest, which all settle at the common
    * water level (the fair-allocation solve behind "give every source
    * an equal voice up to its size"). In the output, `capped` = true
    * marks the LEVELED sources (allocation = water level < their
    * availability); fully-funded small sources read capped = false.
    * Closed form, no iteration: with sources
    * sorted by availability ascending, source i is fully funded iff
    * prefix(i−1) + avail(i)·(n−i+1) ≤ budget (feasibility is monotone
    * in sorted order), and every unfunded source gets the common
    * water level T = (budget − Σ funded avail) / (#unfunded).
    *
    * Runs on the per-source AGGREGATE (one row per source — the
    * corpus-scale token count happens upstream, map-side), so the
    * global sort window spans |sources| rows, not the corpus; with
    * integral availabilities every feasibility comparison is exact
    * long arithmetic and T is a ratio of exact longs → bit-identical
    * across engines. Output: (keyCol, available, allocation 6dp,
    * capped).
    */
  def waterFill(perSource: DataFrame, keyCol: String, availCol: String,
                budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val w = Window.orderBy(col("available"), col(keyCol))
    val base = perSource
      .select(col(keyCol), col(availCol).cast("long").as("available"))
      .filter(col("available").isNotNull && col("available") >= 0)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prefix", sum(col("available")).over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      // fully funded iff funding all smaller sources AND giving every
      // remaining source this one's availability fits the budget
      .withColumn("__funded",
        (col("__prefix") - col("available")) +
          col("available") * (col("__n") - col("__rn") + 1) <= budget)
    val fundedStats = base
      .agg(coalesce(sum(when(col("__funded"), col("available"))), lit(0L))
          .as("__fsum"),
        coalesce(sum(when(col("__funded"), 1L).otherwise(0L)), lit(0L))
          .as("__fcnt"),
        coalesce(max(col("__n")), lit(0L)).as("__nn"))
    base.crossJoin(broadcast(fundedStats))
      .withColumn("__level",
        when(col("__nn") > col("__fcnt"),
          (lit(budget) - col("__fsum")).cast("double") /
            (col("__nn") - col("__fcnt"))))
      .select(col(keyCol), col("available"),
        round(when(col("__funded"), col("available").cast("double"))
          .otherwise(col("__level")), 6).as("allocation"),
        (!col("__funded")).as("capped"))
  }

  /** RAKING (iterative proportional fitting, Deming–Stephan 1940) —
    * per-cell sampling weights that make BOTH marginals of a
    * two-dimensional contingency table match target shares
    * simultaneously (the survey-weighting / corpus-mixing step when
    * two constraints must hold at once — e.g. language shares AND
    * length-bucket shares — and per-axis reweighting alone breaks the
    * other axis). Alternately scales row then column weights toward
    * their targets for `iterations` rounds; IPF converges
    * geometrically whenever every observed cell is reachable.
    *
    * Input is the PRE-AGGREGATED cells frame (rowCol, colCol, nCol) —
    * the caller's corpus-sized groupBy-count stays upstream, and
    * everything here touches |rows|×|cols| cells. The IPF loop runs
    * driver-side over the collected cells (model-sized state, the
    * documented [[graft.operators.Ids.denseIds]]-style exception) in
    * sorted-key order, and the weights broadcast back as a map
    * literal. Targets must be defined for every observed value (fail
    * loudly — a missing target would silently zero a stratum).
    * Output: the cells frame + `weight` (6dp).
    */
  def rakeWeights(cells: DataFrame, rowCol: String, colCol: String,
                  nCol: String, rowTargets: Map[String, Double],
                  colTargets: Map[String, Double],
                  iterations: Int = 4): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val collected = cells
      .select(col(rowCol).cast("string"), col(colCol).cast("string"),
        col(nCol).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(c => (c._1, c._2))
    require(collected.nonEmpty, "cells frame is empty")
    val rows = collected.map(_._1).distinct.sorted
    val cols = collected.map(_._2).distinct.sorted
    rows.foreach(r => require(rowTargets.contains(r),
      s"no row target for observed value '$r'"))
    cols.foreach(c => require(colTargets.contains(c),
      s"no column target for observed value '$c'"))
    val n = collected.map(c => (c._1, c._2) -> c._3).toMap
    val total = collected.map(_._3).sum.toDouble
    val w = scala.collection.mutable.Map[(String, String), Double](
      collected.map(c => (c._1, c._2) -> 1.0): _*)
    for (_ <- 1 to iterations) {
      for (r <- rows) {
        val share = cols.collect {
          case c if n.contains((r, c)) => n((r, c)) * w((r, c)) }.sum / total
        val f = rowTargets(r) / share
        cols.foreach(c => if (w.contains((r, c))) w((r, c)) *= f)
      }
      for (c <- cols) {
        val share = rows.collect {
          case r if n.contains((r, c)) => n((r, c)) * w((r, c)) }.sum / total
        val f = colTargets(c) / share
        rows.foreach(r => if (w.contains((r, c))) w((r, c)) *= f)
      }
    }
    // nested row→(col→weight) map: keying each axis separately is
    // collision-free by construction (a single "$r|$c" key would merge
    // two cells whenever a value itself contains the separator)
    val lookup: Map[String, Map[String, Double]] =
      w.toMap.groupBy(_._1._1).map { case (r, m) =>
        r -> m.map { case ((_, c), v) => c -> v }
      }
    cells.withColumn("weight",
      round(element_at(element_at(typedLit(lookup),
          col(rowCol).cast("string")), col(colCol).cast("string")), 6))
  }
}
