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
}
