package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-rater agreement — the QA step for label pipelines where two
  * imperfect annotators (two quality heuristics, two classifier
  * versions, an LLM judge vs a rule) label the same rows and raw
  * percent-agreement overstates reliability because both raters
  * mostly emit the majority class. Cohen's κ subtracts the
  * chance-agreement floor: κ = (p_o − p_e)/(1 − p_e) with p_o the
  * observed diagonal share and p_e = Σ_k P_A(k)·P_B(k) from the
  * marginals.
  *
  * Scale shape: ONE map-side-combinable groupBy(group, labelA,
  * labelB) count — the confusion matrix — then two label-keyed
  * reductions of that |labels|²-cardinality frame (the per-label
  * marginals) and a |groups|-row join. Counts and the marginal
  * product sum stay exact integers (DECIMAL(38,0) — order-independent
  * regardless of aggregation placement); κ's doubles appear only at
  * the final ratios, 6dp at the boundary. Degenerate groups (p_e = 1:
  * both raters constant and identical) have no chance-corrected
  * signal — κ is NULL and `reliable` false.
  */
object Agreement {

  /** Per-group Cohen's κ between two label columns. Output:
    * (group…, n_rows, po, pe, kappa, reliable) — `reliable` =
    * κ ≥ `floor` (0.6 default: the customary "substantial agreement"
    * reading). NULL labels on either side drop the row (no pair to
    * compare).
    */
  def cohensKappa(df: DataFrame, groupCols: Seq[String], labelA: Column,
                  labelB: Column, floor: Double = 0.6): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val cells = df
      .select((g :+ labelA.cast("string").as("__a") :+
        labelB.cast("string").as("__b")): _*)
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(g :+ col("__a") :+ col("__b"): _*)
      .agg(count(lit(1)).as("__c"))
    // p_e = Σ_k P_A(k)·P_B(k): a label contributes whenever EITHER
    // rater used it (full-outer marginal join; a marginal absent on
    // one side makes the product 0). The product sum accumulates as
    // an exact DECIMAL(38,0) integer — Σ_k ra_k·cb_k — so aggregation
    // order can never move a ulp; the only doubles are the single
    // divide by n² below and the final κ ratio.
    val labels = cells.select((g :+ col("__a").as("__k") :+
        col("__c")): _*)
      .groupBy(g :+ col("__k"): _*).agg(sum(col("__c")).as("__ra"))
      .join(
        cells.select((g :+ col("__b").as("__k") :+ col("__c")): _*)
          .groupBy(g :+ col("__k"): _*).agg(sum(col("__c")).as("__cb")),
        groupCols :+ "__k", "full_outer")
      .na.fill(0L, Seq("__ra", "__cb"))
    val n = cells.groupBy(g: _*).agg(sum(col("__c")).as("n_rows"))
    val pe = labels
      .groupBy(g: _*)
      .agg(sum(col("__ra").cast("decimal(19,0)") *
        col("__cb").cast("decimal(19,0)")).as("__sp"))
    val po = cells.filter(col("__a") === col("__b"))
      .groupBy(g: _*).agg(sum(col("__c")).as("__agree"))
    n.join(pe, groupCols)
      .join(po, groupCols, "left")
      .withColumn("__pe", col("__sp").cast("double") /
        (col("n_rows").cast("double") * col("n_rows")))
      .withColumn("__po",
        coalesce(col("__agree"), lit(0L)).cast("double") / col("n_rows"))
      .withColumn("__kappa",
        when(col("__pe") < 1.0,
          (col("__po") - col("__pe")) / (lit(1.0) - col("__pe"))))
      .select(g ++ Seq(col("n_rows"),
        round(col("__po"), 6).as("po"),
        round(col("__pe"), 6).as("pe"),
        round(col("__kappa"), 6).as("kappa"),
        coalesce(col("__kappa") >= floor, lit(false)).as("reliable")): _*)
  }

  /** Per-group FLEISS' κ — the many-rater generalization of
    * [[cohensKappa]] for label pipelines where EVERY item gets the
    * same number of assignments but rater identity doesn't pair up
    * (three quality heuristics, an annotator pool, N prompted
    * judges). Input is a ratings frame: one row per (item,
    * assignment) carrying the assigned category; rater identity is
    * irrelevant to the statistic and not required.
    *
    * Definitions (Fleiss 1971), with n_ij the per-(item, category)
    * assignment count, n raters per item, N items: per-item agreement
    * P_i = (Σ_j n_ij² − n)/(n(n−1)); P̄ = mean over items; chance
    * agreement P_e = Σ_j p_j² from the pooled category shares; κ =
    * (P̄ − P_e)/(1 − P_e).
    *
    * Arithmetic contract: every term is an exact integer — A =
    * Σ_i(Σ_j n_ij² − n) and C = Σ_j(Σ_i n_ij)² fold the two
    * normalizations away, giving κ = (A·(Nn)² − C·Nn(n−1)) /
    * (Nn(n−1)·((Nn)² − C)) — one double division of DECIMAL(38,0)
    * integer products at the very end, 6dp. A group pooled onto a
    * single category has P_e = 1 (no chance-corrected signal); κ
    * pins to 1.0 there, mirrored in the oracle.
    *
    * Scale shape: one map-side-combinable (group, item, category)
    * count — the only ratings-sized stage — then two item-keyed /
    * category-keyed reductions of the collapsed frame and a
    * |groups|-row join. No windows at all.
    *
    * Output: (groups…, n_items, n_raters, kappa).
    */
  def fleissKappa(df: DataFrame, groupCols: Seq[String], itemCol: String,
                  categoryCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val cell = df
      .filter(col(categoryCol).isNotNull)
      .groupBy(g :+ col(itemCol).as("__i") :+ col(categoryCol).as("__k"): _*)
      .agg(count(lit(1)).as("__c"))
    val perItem = cell.groupBy(g :+ col("__i"): _*)
      .agg(sum(col("__c") * col("__c")).as("__s2"), sum(col("__c")).as("__n"))
    val ag = perItem.groupBy(g: _*)
      .agg(sum(col("__s2") - col("__n")).as("__a"),
        count(lit(1)).as("n_items"), max(col("__n")).as("n_raters"))
    val cm = cell.groupBy(g :+ col("__k"): _*)
      .agg(sum(col("__c")).as("__bj"))
      .groupBy(g: _*).agg(sum(col("__bj") * col("__bj")).as("__cc"))
    // DECIMAL(38,0) keeps the κ rational exact far past BIGINT range
    // (A·(Nn)² is ~N³n⁴); the one double appears at the final divide
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val nn = dec(col("n_items") * col("n_raters"))
    val num = dec(col("__a")) * nn * nn -
      dec(col("__cc")) * nn * dec(col("n_raters") - 1)
    val den = nn * dec(col("n_raters") - 1) * (nn * nn - dec(col("__cc")))
    ag.join(cm, groupCols)
      .select(g ++ Seq(col("n_items"), col("n_raters"),
        when(nn * nn === dec(col("__cc")), lit(1.0))
          .otherwise(round(num.cast("double") / den.cast("double"), 6))
          .as("kappa")): _*)
  }

  /** Per-group KRIPPENDORFF'S ALPHA (nominal) — the agreement metric
    * that tolerates MISSING ratings, which real annotation pipelines
    * always have (raters abstain, time out, or join late): where
    * [[cohensKappa]] needs exactly two raters on every row and
    * [[fleissKappa]] a constant rater count per item, α takes a bare
    * ratings frame — one row per (unit, assigned category), rater
    * identity irrelevant, any per-unit count ≥ 2 — and measures
    * 1 − D_o/D_e from the coincidence matrix: within-unit
    * disagreement pairs weighted 1/(n_u−1), chance disagreement from
    * the pooled category margins over the participating units.
    *
    * Closed form used (algebraically the coincidence-matrix
    * definition): D_o·n = Σ_u (n_u² − Σ_c o_uc²)/(n_u−1) and
    * D_e·n(n−1) = n² − Σ_c n_c², so
    * α = 1 − (n−1)·Σ_u term_u / (n² − Σ_c n_c²). Units with a single
    * rating drop (no pair to compare); a group whose participating
    * ratings are all ONE category has D_e = 0 — no chance-corrected
    * signal — and α is NULL.
    *
    * Arithmetic contract: counts are exact longs; each unit's
    * disagreement term (rational — denominator n_u−1) rounds to
    * BIGINT micro units BEFORE the unit-cardinality sum (the
    * t167/t204 order-independence contract); margins square as
    * DECIMAL(38,0); α is one IEEE chain at the 6dp boundary.
    *
    * Scale shape: the only ratings-sized stage is the map-side-
    * combinable (group, unit, category) collapse; then a unit-keyed
    * and a category-keyed reduction of that collapsed frame and a
    * |groups|-row join. No windows, no driver state.
    *
    * Output: (groups…, n_units, n_ratings, n_categories, alpha 6dp).
    */
  def krippendorffAlpha(df: DataFrame, groupCols: Seq[String],
                        unitCol: String, categoryCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cell = df
      .filter(col(categoryCol).isNotNull)
      .groupBy(g :+ col(unitCol).as("__u") :+
        col(categoryCol).cast("string").as("__k"): _*)
      .agg(count(lit(1)).as("__c"))
    val perUnit = cell.groupBy(g :+ col("__u"): _*)
      .agg(sum(col("__c") * col("__c")).as("__s2"),
           sum(col("__c")).as("__nu"))
      .filter(col("__nu") >= 2)
    val doSum = perUnit
      .withColumn("__tm", round(
        (col("__nu") * col("__nu") - col("__s2")).cast("double") /
          (col("__nu") - 1) * 1e6, 0).cast("long"))
      .groupBy(g: _*)
      .agg(sum(col("__tm")).as("__dsum"),
           sum(col("__nu")).as("n_ratings"),
           count(lit(1)).as("n_units"))
    val margins = cell
      .join(perUnit.select(g :+ col("__u"): _*), groupCols :+ "__u")
      .groupBy(g :+ col("__k"): _*).agg(sum(col("__c")).as("__nc"))
      .groupBy(g: _*)
      .agg(sum(dec(col("__nc")) * col("__nc")).as("__nc2"),
           count(lit(1)).as("n_categories"))
    val deNum = dec(col("n_ratings")) * col("n_ratings") - col("__nc2")
    val alpha = when(deNum > 0,
      lit(1.0) - (col("n_ratings") - 1).cast("double") *
        (col("__dsum").cast("double") / lit(1e6)) /
        deNum.cast("double"))
    doSum.join(margins, groupCols)
      .select(g ++ Seq(col("n_units"), col("n_ratings"),
        col("n_categories"), round(alpha, 6).as("alpha")): _*)
  }

  /** Per-group COCHRAN'S Q — the k-rater generalization of McNemar
    * (t209) for BINARY raters on the same items: do k candidate
    * keep/drop rules (quality heuristics, classifier versions,
    * prompted judges) flag at the same rate, accounting for the
    * rules rating the SAME documents? With x_ij ∈ {0,1}, column
    * totals C_j, row totals R_i, T = ΣC_j:
    *
    *   Q = (k−1)·(k·ΣC_j² − T²) / (k·T − ΣR_i²)
    *
    * judged against χ²₀.₉₅ at df = k−1 (the shared
    * [[graft.ops.Drift.Chi2Crit95]] literal table; Wilson–Hilferty
    * above df 30). Degenerate groups — every item unanimous (all
    * R_i ∈ {0, k}) — have zero denominator: Q is NULL, never flags.
    *
    * Arithmetic: ONE map-side-combinable reduction per group carries
    * n, ΣR_i², and the k column totals as exact BIGINTs (raters are
    * COLUMNS, so row totals are per-row expressions — no unpivot, no
    * item-keyed shuffle at all); the squares/products promote to
    * DECIMAL(38,0) and Q is one double divide. Rows where any rater
    * is NULL drop (complete-case, the McNemar convention).
    *
    * Output: (groups…, n_items, k, q 6dp, q_crit 6dp, significant).
    */
  def cochranQ(df: DataFrame, groupCols: Seq[String],
               raters: Seq[Column]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(raters.size >= 2, s"need >= 2 raters, got ${raters.size}")
    require(raters.size <= 31,
      s"chi-square literal table covers df <= 30, got k = ${raters.size}")
    val k = raters.size
    val g = groupCols.map(col)
    val rs = raters.zipWithIndex.map { case (r, j) =>
      when(r, 1L).otherwise(0L).as(s"__r$j")
    }
    val base = df
      .filter(raters.map(_.isNotNull).reduce(_ && _))
      .select(g ++ rs: _*)
    val rowSum = (0 until k).map(j => col(s"__r$j")).reduce(_ + _)
    val aggCols = Seq(count(lit(1)).as("n_items"),
      sum(rowSum * rowSum).as("__rr")) ++
      (0 until k).map(j => sum(col(s"__r$j")).as(s"__c$j"))
    val agg = base.groupBy(g: _*).agg(aggCols.head, aggCols.tail: _*)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val t = (0 until k).map(j => col(s"__c$j")).reduce(_ + _)
    val sumC2 = (0 until k).map(j => dec(col(s"__c$j")) * col(s"__c$j"))
      .reduce(_ + _)
    val num = dec(lit(k - 1)) * (dec(lit(k)) * sumC2 - dec(t) * t)
    val den = dec(lit(k)) * t - dec(col("__rr"))
    val q = when(den > 0, num.cast("double") / den.cast("double"))
    val crit = lit(graft.ops.Drift.Chi2Crit95(k - 2))
    agg.select(g ++ Seq(col("n_items"), lit(k).as("k"),
      round(q, 6).as("q"), round(crit, 6).as("q_crit"),
      coalesce(q > crit, lit(false)).as("significant")): _*)
  }
}
