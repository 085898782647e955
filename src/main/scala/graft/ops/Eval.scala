package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier / scoring-signal evaluation over corpus-scale data: the
  * QA layer a training-data pipeline runs on its own quality scores,
  * filters, and label heuristics before trusting them at 100 TB —
  * ranking quality (exact ROC AUC), probability calibration (reliability
  * bins + ECE), and time-to-event survival (Kaplan–Meier with right
  * censoring).
  *
  * Arithmetic contracts are engine-portable by construction: AUC's
  * rank sums are exact BIGINTs (doubled to absorb midranks), the
  * calibration report routes probability mass through DECIMAL(28,10)
  * so sums are order-independent, and the survival product's only
  * float stage is a deterministically-ordered cumulative ln-sum that
  * crosses one 6dp boundary.
  *
  * Reference behavioral anchor: the reference pipeline fits/evaluates
  * models driver-side on collected aggregates (reference
  * `btc_logregression_post.py:79-80` — statsmodels OLS on a pandas
  * frame); these operators keep the same "evaluate a signal against an
  * outcome" semantics but run the sufficient statistics distributed,
  * collecting nothing.
  */
object Eval {

  /** Exact ROC AUC per group via the Mann–Whitney rank-sum with
    * midrank tie handling: AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), where
    * R⁺ is the sum of POSITIVE rows' midranks under ascending score.
    *
    * Distributed exactly like the exact-KS chain (one collapse + one
    * ordered window): rows collapse to one row per (group, score) with
    * positive/negative counts — map-side combinable, so ties never
    * shuffle individually — then a per-group cumulative window over
    * DISTINCT scores assigns each tie block its midrank. To keep
    * everything integral, the operator accumulates 2·R⁺ =
    * Σ_blocks c⁺·(2·cum_before + block + 1) as an exact BIGINT and
    * divides once at the end: auc = (2R⁺ − n⁺(n⁺+1)) / (2n⁺n⁻).
    *
    * Scale shape: shuffles carry (group, score) pairs and two longs;
    * the window is per-group over distinct scores (the t113 caveat:
    * bin first — t137/t139 — for billion-distinct-score groups).
    * Groups with an empty side are dropped (AUC undefined).
    *
    * Output: (groups…, n_pos, n_neg, auc) — auc 6dp.
    */
  def aucRank(df: DataFrame, groupCols: Seq[String], positive: Column,
              scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val blocks = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(g :+ col(scoreCol).as("__s"): _*)
      .agg(sum(when(positive, 1L).otherwise(0L)).as("__cp"),
           sum(when(positive, 0L).otherwise(1L)).as("__cn"))
    val ord = Window.partitionBy(g: _*).orderBy(col("__s"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    blocks
      .withColumn("__before",
        coalesce(sum(col("__cp") + col("__cn")).over(before), lit(0L)))
      .groupBy(g: _*)
      .agg(sum(col("__cp")).as("n_pos"), sum(col("__cn")).as("n_neg"),
        sum(col("__cp") * (lit(2L) * col("__before")
          + col("__cp") + col("__cn") + lit(1L))).as("__two_r_pos"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(g :+ col("n_pos") :+ col("n_neg") :+
        round((col("__two_r_pos") - col("n_pos") * (col("n_pos") + 1))
          .cast("double")
          / (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"): _*)
  }

  /** Split-conformal threshold + coverage audit per group (Vovk et
    * al.; Angelopoulos & Bates 2023 survey): from a CALIBRATION slice,
    * the score threshold q̂ = the ⌈(n+1)(1−α)⌉-th smallest calibration
    * score — the distribution-free cutoff that guarantees
    * P(score ≤ q̂) ≥ 1−α on exchangeable data — then the measured
    * coverage of that threshold on the held-out TEST slice. The
    * finite-sample-honest way to turn any quality/nonconformity score
    * into a keep/flag rule with a stated guarantee, plus the audit
    * that catches the guarantee breaking (distribution shift between
    * slices).
    *
    * Distributed exactly like [[aucRank]]: calibration scores
    * collapse map-side to (group, score) count blocks, the order
    * statistic comes from a per-group cumulative window over DISTINCT
    * scores (first block whose cumulative count reaches the rank —
    * bin scores first, t137-style, at billion-distinct-score
    * cardinality), and the test-side coverage is one count aggregate
    * against the group-cardinality threshold table (broadcast).
    * Counts and the ⌈·⌉ rank are exact BIGINTs; ceil runs on the same
    * IEEE product on both engines.
    *
    * Output: (groups…, n_cal, threshold, n_test, coverage, covered) —
    * threshold/coverage 6dp; `covered` judges the 6dp-rounded
    * coverage against `coveredAt`. Groups with an empty side drop.
    */
  /** The calibration half of [[conformalThreshold]], reusable on its
    * own (e.g. to feed a streaming coverage monitor): per group, the
    * ⌈(n+1)(1−α)⌉-th smallest score from the `calSide` slice as an
    * UNROUNDED `__thr` plus `n_cal`. Same block-collapse + cumulative
    * distinct-score window as [[aucRank]].
    */
  def conformalCut(df: DataFrame, groupCols: Seq[String],
                   scoreCol: String, calSide: Column,
                   alpha: Double): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val g = groupCols.map(col)
    val blocks = df.filter(col(scoreCol).isNotNull && calSide)
      .groupBy(g :+ col(scoreCol).as("__s"): _*)
      .agg(count(lit(1)).as("__ct"))
    val whole = Window.partitionBy(g: _*)
    val ord = whole.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocks
      .withColumn("n_cal", sum(col("__ct")).over(whole))
      .withColumn("__cc", sum(col("__ct")).over(ord))
      .filter(col("__cc") >=
        ceil((col("n_cal") + 1) * lit(1.0 - alpha)).cast("long"))
      .groupBy(g :+ col("n_cal"): _*)
      .agg(min(col("__s")).as("__thr"))
  }

  def conformalThreshold(df: DataFrame, groupCols: Seq[String],
                         scoreCol: String, calSide: Column,
                         alpha: Double, coveredAt: Double): DataFrame = {
    val g = groupCols.map(col)
    val scored = df.filter(col(scoreCol).isNotNull)
    val thr = conformalCut(df, groupCols, scoreCol, calSide, alpha)
    scored.filter(!calSide)
      .join(broadcast(thr), groupCols)
      .groupBy(g :+ col("n_cal") :+ col("__thr"): _*)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col(scoreCol) <= col("__thr"), 1L).otherwise(0L))
          .as("__n_cov"))
      .select(g :+ col("n_cal") :+ round(col("__thr"), 6).as("threshold") :+
        col("n_test") :+
        round(col("__n_cov").cast("double") / col("n_test"), 6)
          .as("coverage") :+
        (round(col("__n_cov").cast("double") / col("n_test"), 6)
          >= coveredAt).as("covered"): _*)
  }

  /** Average precision (area under the precision–recall step curve)
    * per group — the ranking metric that, unlike AUC, stays honest
    * under heavy class imbalance (the common shape when a quality
    * score hunts a rare label). Ties share one block: with blocks b
    * ordered by score DESC, AP = Σ_b (cp_b / n_pos) · (P_b / T_b)
    * where cp_b is the block's positives and P_b/T_b the cumulative
    * positives/rows through b — i.e. every tied row sees the
    * precision AT THE END of its tie block (the order-deterministic
    * convention; row-level AP would depend on arbitrary tie order).
    *
    * Distributed exactly like [[aucRank]]: one collapse to (group,
    * score) blocks — map-side combinable, ties never shuffle
    * individually — then per-group cumulative windows over DISTINCT
    * scores. The float stage is the per-group cumulative sum of
    * block terms, sequential in the window's DESC score order on
    * both engines, so the result is bit-stable; terms are single
    * IEEE divides/multiplies of exact BIGINTs.
    *
    * Scale shape: shuffles carry (group, score) + two longs; the
    * window is per-group over distinct scores (same t113 caveat:
    * bin scores first for billion-distinct-score groups). Groups
    * with no positives drop (AP undefined).
    *
    * Output: (groups…, n_pos, ap) — ap 6dp.
    */
  def averagePrecision(df: DataFrame, groupCols: Seq[String],
                       positive: Column, scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val blocks = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(g :+ col(scoreCol).as("__s"): _*)
      .agg(sum(when(positive, 1L).otherwise(0L)).as("__cp"),
           count(lit(1)).as("__ct"))
    val whole = Window.partitionBy(g: _*)
    val ord = whole.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocks
      .withColumn("n_pos", sum(col("__cp")).over(whole))
      .filter(col("n_pos") > 0)
      .withColumn("__pb", sum(col("__cp")).over(ord))
      .withColumn("__tb", sum(col("__ct")).over(ord))
      .withColumn("__ap_cum",
        sum((col("__cp").cast("double") / col("n_pos"))
          * (col("__pb").cast("double") / col("__tb"))).over(ord))
      .groupBy(g :+ col("n_pos"): _*)
      // terms are ≥ 0 so the cumulative sum is nondecreasing: max =
      // the final (complete) ordered sum, without a last_value frame
      .agg(round(max(col("__ap_cum")), 6).as("ap"))
      .select(g :+ col("n_pos") :+ col("ap"): _*)
  }

  /** Tie-corrected Mann–Whitney U test per group — the inferential
    * companion to [[aucRank]]: the same exact rank sums, plus the
    * large-sample z statistic under H₀ (no location shift), with the
    * standard tie correction σ² = (n₁n₂/12)·((n+1) − Σ(t³−t)/(n(n−1)))
    * and no continuity correction (documented; both engines agree by
    * construction). The "is this score difference real or noise"
    * answer AUC alone doesn't give.
    *
    * Everything integral stays integral: U derives from the exact
    * BIGINT 2·R⁺ accumulator, Σ(t³−t) sums exact per-block cubes, and
    * doubles appear only in the final σ/z arithmetic (identical
    * expression order on both engines). BIGINT bound: t³ per tie
    * block — safe to ~2M-row tie blocks; beyond that collapse scores
    * into bins first (t137), which is also what the distinct-score
    * window needs.
    *
    * Output: (groups…, n_pos, n_neg, u, z) — u is R⁺-based (positive
    * side), 6dp; z > 0 ⇔ positives score higher. Groups with an
    * empty side drop.
    */
  def mannWhitney(df: DataFrame, groupCols: Seq[String],
                  positive: Column, scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val blocks = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(g :+ col(scoreCol).as("__s"): _*)
      .agg(sum(when(positive, 1L).otherwise(0L)).as("__cp"),
           sum(when(positive, 0L).otherwise(1L)).as("__cn"))
    val ord = Window.partitionBy(g: _*).orderBy(col("__s"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val t = col("__cp") + col("__cn")
    val agg = blocks
      .withColumn("__before",
        coalesce(sum(col("__cp") + col("__cn")).over(before), lit(0L)))
      .groupBy(g: _*)
      .agg(sum(col("__cp")).as("n_pos"), sum(col("__cn")).as("n_neg"),
        sum(col("__cp") * (lit(2L) * col("__before")
          + col("__cp") + col("__cn") + lit(1L))).as("__trp"),
        sum(t * t * t - t).as("__ties"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
    val twoU = col("__trp") - col("n_pos") * (col("n_pos") + 1)
    val n = col("n_pos") + col("n_neg")
    val sigma = sqrt((col("n_pos").cast("double") * col("n_neg") / 12.0)
      * ((n + 1) - col("__ties").cast("double")
        / (n.cast("double") * (n - 1))))
    agg.select(g :+ col("n_pos") :+ col("n_neg") :+
      round(twoU.cast("double") / 2.0, 6).as("u") :+
      round((twoU - (col("n_pos") * col("n_neg")).cast("double"))
        / (lit(2.0) * sigma), 6).as("z"): _*)
  }

  /** CLIFF'S DELTA effect size per group — the MAGNITUDE companion to
    * [[mannWhitney]]'s significance (a z can be astronomically
    * significant while the actual shift is operationally negligible —
    * the trap every large-corpus A/B readout walks into):
    * δ = P(X > Y) − P(X < Y) over all (positive, negative) pairs,
    * ties counting neither side = 2U/(n₁n₂) − 1 with the same
    * midrank-U accumulator, in [−1, 1] with 0 = full overlap.
    * `magnitude` labels |δ| by the Romano et al. (2006) thresholds
    * (negligible < 0.147 ≤ small < 0.33 ≤ medium < 0.474 ≤ large) —
    * judged on the 6dp-ROUNDED δ so both engines label identically.
    *
    * Arithmetic: 2U is the exact BIGINT 2·R⁺ − n₁(n₁+1) accumulator
    * ([[mannWhitney]]'s trick — doubled masses absorb midranks
    * exactly); δ is ONE double expression (2U − n₁n₂)/(n₁n₂) at the
    * boundary. Scale shape identical to mannWhitney: one map-side-
    * combinable (group, score) block collapse, the per-group window
    * over DISTINCT scores (bin first at billion-distinct cardinality
    * — the t137 hatch), then group-cardinality closed forms.
    *
    * Output: (groups…, n_pos, n_neg, delta 6dp, magnitude); groups
    * with an empty side drop (no pairs to compare).
    */
  def cliffsDelta(df: DataFrame, groupCols: Seq[String],
                  positive: Column, scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val blocks = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(g :+ col(scoreCol).as("__s"): _*)
      .agg(sum(when(positive, 1L).otherwise(0L)).as("__cp"),
           sum(when(positive, 0L).otherwise(1L)).as("__cn"))
    val ord = Window.partitionBy(g: _*).orderBy(col("__s"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val agg = blocks
      .withColumn("__before",
        coalesce(sum(col("__cp") + col("__cn")).over(before), lit(0L)))
      .groupBy(g: _*)
      .agg(sum(col("__cp")).as("n_pos"), sum(col("__cn")).as("n_neg"),
        sum(col("__cp") * (lit(2L) * col("__before")
          + col("__cp") + col("__cn") + lit(1L))).as("__trp"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
    val twoU = col("__trp") - col("n_pos") * (col("n_pos") + 1)
    val mn = (col("n_pos") * col("n_neg")).cast("double")
    val delta = round((twoU.cast("double") - mn) / mn, 6)
    agg.select(g :+ col("n_pos") :+ col("n_neg") :+
      delta.as("delta") :+
      when(abs(delta) < 0.147, "negligible")
        .when(abs(delta) < 0.33, "small")
        .when(abs(delta) < 0.474, "medium")
        .otherwise("large").as("magnitude"): _*)
  }

  /** MEDIAN-OF-MEANS robust mean per group — the heavy-tail-proof
    * mean estimator (Nemirovsky–Yudin; the MAB/quality-monitoring
    * standard): hash rows into `buckets` deterministic shards, mean
    * each shard, report the MEDIAN of the shard means. One extreme
    * value corrupts one shard's mean; the median of 16 shard means
    * shrugs it off — where the plain mean moves arbitrarily (the
    * trimmed/winsorized t203/t225 members need a quantile pass; MoM
    * needs only a hash). Sub-Gaussian concentration holds for ANY
    * finite-variance distribution.
    *
    * `valueMass` must be an EXACT-INTEGER column (e.g. cents —
    * round(value·100) cast long); `scale` converts the readout back
    * (100 for cents). The shard coin is the engine-portable 48-bit
    * md5 digest of `idCol` — deterministic per row, replayable by any
    * engine.
    *
    * Arithmetic: shard sums/counts are exact BIGINTs; each shard mean
    * is ONE fixed IEEE chain (sum/count/scale); the median picks the
    * LEFT-median element (index ⌈k/2⌉ of the sorted list — the t188
    * left-continuous convention) — no averaging of two middles, so
    * the result is one shard's exact mean. Scale shape: one map-side-
    * combinable (group, shard) reduction — the only corpus-sized
    * stage — then a buckets-bounded collect per group (16 doubles:
    * model-sized, the documented denseIds-style exception).
    *
    * Output: (groups…, n_rows, k_buckets, mean 6dp, mom 6dp).
    */
  def medianOfMeans(df: DataFrame, groupCols: Seq[String],
                    valueMass: Column, idCol: String,
                    buckets: Int = 16, scale: Double = 1.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(buckets >= 2 && buckets <= 4096,
      s"buckets out of range: $buckets")
    val g = groupCols.map(col)
    val b = graft.ops.SnapshotDiff.portableDigest(Seq(col(idCol))) %
      buckets
    val bm = df.filter(valueMass.isNotNull)
      .select(g ++ Seq(valueMass.cast("long").as("__v"),
        b.as("__b")): _*)
      .groupBy(g :+ col("__b"): _*)
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__c"))
      .withColumn("__m",
        col("__s").cast("double") / col("__c") / lit(scale))
    bm.groupBy(g: _*)
      .agg(sum(col("__c")).as("n_rows"),
        count(lit(1)).as("k_buckets"),
        sum(col("__s")).as("__st"),
        sort_array(collect_list(col("__m"))).as("__ms"))
      .select(g ++ Seq(col("n_rows"), col("k_buckets"),
        round(col("__st").cast("double") / col("n_rows") / lit(scale), 6)
          .as("mean"),
        round(element_at(col("__ms"),
          expr("(k_buckets + 1) div 2").cast("int")), 6).as("mom")): _*)
  }

  /** ROLLING median-of-means — the ROBUST member of the rolling
    * family (t91 rolling distinct from mergeable HLLs, t99 rolling
    * quantiles from mergeable KLLs, and this: rolling robust mean
    * from mergeable shard sums): per-day (day, shard) cents
    * sums/counts are exact commutative monoids, so every w-day window
    * is a SUM of per-day shard statistics — the nightly re-slide
    * touches |days|·buckets pairs of longs, never raw history — and
    * the window's [[medianOfMeans]] readout follows from its merged
    * shards. Unlike the sketch members this one is EXACT end-to-end
    * (shard sums don't approximate), so the driver row is hash-exact,
    * not gated.
    *
    * Scale shape: the ONLY corpus-sized stage is the map-side-
    * combinable (day, shard) reduction; the window re-slice is a
    * range join of the |days|-row day list against the
    * |days|·buckets daily frame (broadcast-sized both sides at any
    * corpus scale), then a buckets-bounded collect per window.
    * Same arithmetic contract as [[medianOfMeans]].
    *
    * Output: (day, window_days, n_rows, k_buckets, mom 6dp) — one row
    * per day with data, windows spanning [day − w + 1, day].
    */
  def rollingMedianOfMeans(df: DataFrame, tsCol: String,
                           valueMass: Column, idCol: String,
                           windowDays: Int = 7, buckets: Int = 16,
                           scale: Double = 1.0): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(buckets >= 2 && buckets <= 4096,
      s"buckets out of range: $buckets")
    val b = graft.ops.SnapshotDiff.portableDigest(Seq(col(idCol))) %
      buckets
    val daily = df.filter(valueMass.isNotNull)
      .select(to_date(col(tsCol)).as("__d"), b.as("__b"),
        valueMass.cast("long").as("__v"))
      .groupBy(col("__d"), col("__b"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__c"))
      .localCheckpoint(true) // |days|·buckets rows feed days + re-slice
    val days = daily.select(col("__d").as("day")).distinct()
    val win = days.join(daily,
        col("__d").between(date_sub(col("day"), windowDays - 1),
          col("day")))
      .groupBy(col("day"), col("__b"))
      .agg(sum(col("__s")).as("__ws"), sum(col("__c")).as("__wc"))
      .withColumn("__m",
        col("__ws").cast("double") / col("__wc") / lit(scale))
    win.groupBy(col("day"))
      .agg(sum(col("__wc")).as("n_rows"), count(lit(1)).as("k_buckets"),
        sort_array(collect_list(col("__m"))).as("__ms"))
      .select(col("day"), lit(windowDays).as("window_days"),
        col("n_rows"), col("k_buckets"),
        round(element_at(col("__ms"),
          expr("(k_buckets + 1) div 2").cast("int")), 6).as("mom"))
  }

  /** KRUSKAL–WALLIS H test per group — the k-sample generalization of
    * [[mannWhitney]]: does a score's distribution differ across k
    * treatments (sources, shards, pipeline variants) without assuming
    * normality? With midranks R_g summed per treatment,
    * H = 12/(N(N+1))·Σ_g R_g²/n_g − 3(N+1), tie-corrected by
    * C = 1 − Σ_v(t_v³−t_v)/(N³−N), judged against the χ²₀.₉₅ critical
    * value at df = k−1 (the [[Drift.Chi2Crit95]] literal table —
    * shared verbatim with the oracle).
    *
    * Arithmetic contract: doubled rank sums 2·R_g =
    * Σ_v c_gv·(2·before_v + t_v + 1) are exact BIGINTs (the
    * [[mannWhitney]] trick); the per-treatment term (2R_g)²/(4·n_g)
    * is ONE deterministic IEEE expression rounded to micro units and
    * summed as BIGINT — order-independent — so H is a closed form of
    * exact integers. A fully-tied group (C ≤ 0) yields NULL h and
    * never flags.
    *
    * Scale shape: the only corpus-sized stages are the two map-side-
    * combinable collapses — (group, treatment, score) cells and
    * (group, score) tie blocks; the midrank window runs per group
    * over DISTINCT scores (bin first — the t137 hatch — at
    * billion-distinct-score cardinality), and everything after is
    * treatment-cardinality.
    *
    * Output: (groups…, k, n, h, h_crit, significant) — h/h_crit 6dp.
    */
  def kruskalWallis(df: DataFrame, groupCols: Seq[String],
                    treatmentCol: String, scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val cell = df
      .filter(col(scoreCol).isNotNull && col(treatmentCol).isNotNull)
      .groupBy(g :+ col(treatmentCol).as("__trt") :+
        col(scoreCol).as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val vb = cell.groupBy(g :+ col("__s"): _*)
      .agg(sum(col("__c")).as("__tv"))
    val before = Window.partitionBy(g: _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val vb2 = vb.withColumn("__bef",
      coalesce(sum(col("__tv")).over(before), lit(0L)))
    val rg = cell.join(vb2, groupCols :+ "__s")
      .groupBy(g :+ col("__trt"): _*)
      .agg(sum(col("__c")).as("__ng"),
        sum(col("__c") * (lit(2L) * col("__bef") + col("__tv") + 1L))
          .as("__r2"))
    val nn = rg.groupBy(g: _*)
      .agg(count(lit(1)).as("k"), sum(col("__ng")).as("n"),
        sum(round(col("__r2").cast("double") * col("__r2").cast("double")
          / (col("__ng") * 4).cast("double") * 1000000.0).cast("long"))
          .as("__amicro"))
      .filter(col("k") >= 2)
    val tie = vb.groupBy(g: _*)
      .agg(sum(col("__tv") * col("__tv") * col("__tv") - col("__tv"))
        .as("__tsum"))
    val nd = col("n").cast("double")
    val h = lit(12.0) * (col("__amicro").cast("double") / 1000000.0) /
        (nd * (col("n") + 1).cast("double")) -
      lit(3.0) * (col("n") + 1).cast("double")
    val cFac = lit(1.0) -
      col("__tsum").cast("double") / (nd * nd * nd - nd)
    val hAdj = when(cFac > 0, h / cFac)
    val dof = col("k") - 1
    val whCrit = {
      val d = dof.cast("double")
      val inner = lit(1.0) - lit(2.0) / (lit(9.0) * d) +
        lit(1.6448536269514722) * sqrt(lit(2.0) / (lit(9.0) * d))
      d * inner * inner * inner
    }
    val crit = when(dof <= 30,
      element_at(typedLit(Drift.Chi2Crit95), dof.cast("int")))
      .otherwise(whCrit)
    nn.join(tie, groupCols)
      .withColumn("__h", hAdj).withColumn("__crit", crit)
      .select(g :+ col("k") :+ col("n") :+
        round(col("__h"), 6).as("h") :+
        round(col("__crit"), 6).as("h_crit") :+
        coalesce(col("__h") > col("__crit"), lit(false))
          .as("significant"): _*)
  }

  /** Probability-calibration report per group: fixed-width reliability
    * bins over a [0,1] probability column plus the group's expected
    * calibration error (ECE = Σ_b n_b/n · |acc_b − conf_b|) — the
    * "is this quality classifier's 0.9 actually a 0.9" check run
    * before its scores gate a corpus.
    *
    * Exactness: bin assignment is floor(p·bins) (one IEEE product —
    * bit-identical across engines), capped into the last bin;
    * accuracy numerators are exact BIGINT label counts; confidence
    * mass routes through DECIMAL(28,10) (the moneySum convention), so
    * per-bin conf sums and the ECE numerator
    * Σ_b |pos_b − Σp_b| are ORDER-INDEPENDENT exact decimals — no
    * float-summation drift anywhere; doubles appear only at the final
    * divisions.
    *
    * Scale shape: one groupBy to (groups × bins) rows — map-side
    * combinable — then a bins-sized broadcast-style join of the
    * group totals back onto the bins. Nothing after the first
    * aggregate sees corpus-sized data.
    *
    * Output: (groups…, bin, n_b, acc, conf, gap, ece) — 6dp; ece
    * repeats on each of the group's bin rows.
    */
  def calibrationReport(df: DataFrame, groupCols: Seq[String],
                        probCol: String, positive: Column,
                        bins: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(bins >= 2, "need at least two bins")
    val g = groupCols.map(col)
    val dec = col(probCol).cast("decimal(28,10)")
    val perBin = df
      .filter(col(probCol).isNotNull)
      .groupBy(g :+
        least(floor(col(probCol) * bins).cast("long"),
          lit(bins - 1L)).as("bin"): _*)
      .agg(count(lit(1)).as("n_b"),
           sum(when(positive, 1L).otherwise(0L)).as("__pos"),
           sum(dec).as("__conf_mass"))
    val totals = perBin
      .groupBy(g: _*)
      .agg(sum(col("n_b")).as("__n_tot"),
        sum(abs(col("__pos").cast("decimal(28,10)")
          - col("__conf_mass"))).as("__ece_num"))
    perBin.join(totals, groupCols)
      .select(g :+ col("bin") :+ col("n_b") :+
        round(col("__pos").cast("double") / col("n_b"), 6).as("acc") :+
        round((col("__conf_mass") / col("n_b")).cast("double"), 6)
          .as("conf") :+
        round((abs(col("__pos").cast("decimal(28,10)")
          - col("__conf_mass")) / col("n_b")).cast("double"), 6)
          .as("gap") :+
        round((col("__ece_num") / col("__n_tot")).cast("double"), 6)
          .as("ece"): _*)
  }

  /** Kaplan–Meier survival estimate per group from per-subject
    * (duration, event) rows with right censoring: at each duration d
    * with ≥ 1 event, S(d) = Π_{d'≤d} (1 − deaths_{d'} / atRisk_{d'}) —
    * the time-to-event curve (user churn, doc staleness, label decay)
    * that naive retention ratios get wrong the moment observation
    * windows differ per subject.
    *
    * Input is ALREADY per-subject (one row each, e.g. from a per-user
    * collapse); the operator aggregates to one row per (group,
    * duration) — map-side combinable — computes the at-risk set by a
    * reversed cumulative window (subjects whose duration ≥ d), and
    * the survival product as exp of the deterministically-ordered
    * cumulative ln-sum. When a duration's deaths exhaust the risk set
    * the factor is exactly 0: that row (necessarily the group's last
    * reported one) emits survival 0.0 via an explicit guard instead
    * of ln(0).
    *
    * Scale shape: post-collapse structures are bounded by DISTINCT
    * DURATIONS per group (calendar-granular in practice — days/weeks;
    * coarsen the duration unit for microsecond-granular inputs).
    * Float contract: ln/exp cross one 6dp boundary; the cumulative
    * sum's order is the window's sort order on both engines.
    *
    * Output: (groups…, d, deaths, at_risk, survival) — only durations
    * with deaths > 0 emit; survival 6dp.
    */
  def kaplanMeier(subjects: DataFrame, groupCols: Seq[String],
                  durCol: String, diedCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val perDay = subjects
      .filter(col(durCol).isNotNull)
      .groupBy(g :+ col(durCol).cast("long").as("d"): _*)
      .agg(sum(col(diedCol).cast("long")).as("deaths"),
           count(lit(1)).as("__ending"))
    val ord = Window.partitionBy(g: _*).orderBy(col("d"))
    val fromHere = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val upToHere = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay
      .withColumn("at_risk", sum(col("__ending")).over(fromHere))
      .withColumn("__term",
        when(col("deaths") < col("at_risk"),
          log(lit(1.0) - col("deaths").cast("double") / col("at_risk"))))
      .withColumn("__zeroed",
        max(when(col("deaths") === col("at_risk"), 1L).otherwise(0L))
          .over(upToHere))
      .withColumn("survival",
        when(col("__zeroed") === 1L, lit(0.0))
          .otherwise(round(exp(coalesce(sum(col("__term")).over(upToHere),
            lit(0.0))), 6)))
      .filter(col("deaths") > 0)
      .select(g :+ col("d") :+ col("deaths") :+ col("at_risk") :+
        col("survival"): _*)
  }

  /** SPEARMAN rank correlation per group between two integer-quantized
    * columns — the monotone-association readout Pearson (t128/t178)
    * misses when the relationship is nonlinear or heavy-tailed (does
    * doc length track quality score AT ALL, in any monotone way?).
    * Standard midrank treatment of ties: ρ = Pearson correlation of
    * the midrank vectors.
    *
    * Arithmetic contract: doubled midranks 2R_v = 2·before_v + t_v + 1
    * are exact BIGINTs per distinct value (the [[mannWhitney]] trick;
    * the doubling scales both vectors and cancels in ρ), and the five
    * moment sums accumulate c·a, c·a·b, … as DECIMAL(38,0) (HUGEINT
    * on the oracle side) — order-independent — with ONE double
    * expression at the 6dp boundary. A constant margin (zero variance)
    * yields NULL rho.
    *
    * Scale shape: one (group, x, y) cell collapse is the only
    * corpus-sized stage (map-side combinable); the two marginal
    * midrank windows run per group over DISTINCT x / DISTINCT y cell
    * blocks (bin first — the t137 hatch — at billion-distinct-value
    * cardinality), and the moment reduction is cell-cardinality.
    *
    * Output: (groups…, n, rho 6dp).
    */
  def spearman(df: DataFrame, groupCols: Seq[String],
               xCol: Column, yCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    // checkpointed: the cell table feeds several consumers (the pair/
    // join legs and the marginal rank sides) whose planned subtrees
    // differ after per-consumer projection pushdown, so ReuseExchange
    // never fires and the corpus-wide aggregate was scanned once per
    // consumer. The pin is the (group, x, y, count) cell table the
    // downstream joins read anyway; one scan feeds them all.
    val cells = df
      .filter(xCol.isNotNull && yCol.isNotNull)
      .groupBy(g :+ xCol.cast("long").as("__x") :+
        yCol.cast("long").as("__y"): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    def marginal(vCol: String, rankAs: String): DataFrame = {
      val before = Window.partitionBy(g: _*).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      cells.groupBy(g :+ col(vCol): _*)
        .agg(sum(col("__c")).as("__tv"))
        .withColumn("__bef",
          coalesce(sum(col("__tv")).over(before), lit(0L)))
        .select(g :+ col(vCol) :+
          (lit(2L) * col("__bef") + col("__tv") + 1L).as(rankAs): _*)
    }
    val dec = "decimal(38,0)"
    val joined = cells
      .join(marginal("__x", "__a"), groupCols :+ "__x")
      .join(marginal("__y", "__b"), groupCols :+ "__y")
      .select(g :+ col("__c") :+ col("__a").cast(dec).as("__a") :+
        col("__b").cast(dec).as("__b"): _*)
    val m = joined.groupBy(g: _*)
      .agg(sum(col("__c")).as("n"),
        sum(col("__c") * col("__a")).as("__sa"),
        sum(col("__c") * col("__b")).as("__sb"),
        sum(col("__c") * col("__a") * col("__b")).as("__sab"),
        sum(col("__c") * col("__a") * col("__a")).as("__saa"),
        sum(col("__c") * col("__b") * col("__b")).as("__sbb"))
    val nD = col("n").cast(dec)
    val varA = nD * col("__saa") - col("__sa") * col("__sa")
    val varB = nD * col("__sbb") - col("__sb") * col("__sb")
    val cov = nD * col("__sab") - col("__sa") * col("__sb")
    m.select(g :+ col("n") :+
      when(varA > 0 && varB > 0,
        round(cov.cast("double") /
          sqrt(varA.cast("double") * varB.cast("double")), 6))
        .as("rho"): _*)
  }

  /** ISOTONIC calibration per group — the monotone recalibration map
    * PAV (pool-adjacent-violators) produces, computed on the
    * [[calibrationReport]] reliability bins: the fitted curve is the
    * best nondecreasing approximation of per-bin accuracy (weighted
    * L2), i.e. what the group's probability column SHOULD read to be
    * trustworthy, with violations (a 0.8 bin less accurate than the
    * 0.6 bin) pooled away. The standard post-hoc calibrator for
    * quality-classifier scores before thresholding them into keep
    * decisions (t138).
    *
    * Implementation is the closed MINIMAX form, not the sequential
    * pooling loop: iso_i = max_{j≤i} min_{k≥i} avg(pos_{j..k}) /
    * avg(n_{j..k}) — verified identical to true PAV on every group
    * of the test fixture. Each segment average A(j,k) is ONE IEEE
    * divide of exact BIGINT window sums (bit-identical across
    * engines), and min/max are selections, so the fitted value is
    * deterministic; 6dp only at the output boundary.
    *
    * Scale shape: the only corpus-sized stage is the (group, bin)
    * count collapse (map-side combinable). Everything after lives on
    * the ≤`bins`-row per-group frame: the cumulative window, the
    * bins² segment join, and the bins³ minimax reduction are all
    * bounded by the FIXED bin count — never by data.
    *
    * Output: (groups…, bin, n_b, acc, iso) — iso nondecreasing in
    * bin within each group.
    */
  def isotonicCalibration(df: DataFrame, groupCols: Seq[String],
                          probCol: Column, labelCol: Column,
                          bins: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val g = groupCols.map(col)
    val perBin = df
      .filter(probCol.isNotNull)
      .groupBy(g :+ least(floor(probCol * bins).cast("long"),
        lit(bins - 1L)).as("bin"): _*)
      .agg(count(lit(1)).as("n_b"),
        sum(labelCol.cast("long")).as("__pos"))
    val upTo = Window.partitionBy(g: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perBin
      .withColumn("__cn", sum(col("n_b")).over(upTo))
      .withColumn("__cp", sum(col("__pos")).over(upTo))
    val a = cum.select(g :+ col("bin").as("__j") :+ col("n_b").as("__nj") :+
      col("__pos").as("__pj") :+ col("__cn").as("__cnj") :+
      col("__cp").as("__cpj"): _*)
    val b = cum.select(g :+ col("bin").as("__k") :+
      col("__cn").as("__cnk") :+ col("__cp").as("__cpk"): _*)
    // A(j,k): one IEEE divide of exact integer segment sums
    val seg = a.join(b, groupCols).filter(col("__k") >= col("__j"))
      .select(g :+ col("__j") :+ col("__k") :+
        ((col("__cpk") - col("__cpj") + col("__pj")).cast("double") /
          (col("__cnk") - col("__cnj") + col("__nj")).cast("double"))
          .as("__avg"): _*)
    val iso = seg
      .join(perBin.select(g :+ col("bin"): _*), groupCols)
      .filter(col("__j") <= col("bin") && col("__k") >= col("bin"))
      .groupBy(g :+ col("bin") :+ col("__j"): _*)
      .agg(min(col("__avg")).as("__mn"))
      .groupBy(g :+ col("bin"): _*)
      .agg(max(col("__mn")).as("__iso"))
    perBin.join(iso, groupCols :+ "bin")
      .select(g :+ col("bin") :+ col("n_b") :+
        round(col("__pos").cast("double") / col("n_b"), 6).as("acc") :+
        round(col("__iso"), 6).as("iso"): _*)
  }

  /** KENDALL'S τ-b per group between two integer-quantized columns —
    * the concordance-based association companion to [[spearman]]
    * (same monotone question, pair-counting semantics: more robust to
    * a few extreme ranks, the standard for small-cardinality ordinal
    * scales). τ-b = (C − D) / √((n₀−n₁)(n₀−n₂)) with tie corrections
    * from both marginals.
    *
    * Arithmetic: C and D are exact BIGINT sums of cell-count products
    * over the distinct-cell pair join; n₀/n₁/n₂ exact BIGINTs; ONE
    * double expression at the 6dp boundary. (Counts are BIGINT-safe
    * to ~3B rows/group; past that lift C/D to DECIMAL(38,0).)
    *
    * Scale shape: the corpus-sized stage is the (group, x, y) cell
    * collapse (map-side combinable). The pair stage is a per-group
    * DISTINCT-CELL join — O(|cells|²) per group, bounded by the
    * QUANTIZED DOMAIN product, never by rows (50 quantities × 11
    * discount ticks = 302k cell pairs regardless of corpus size).
    * That bound is the caller's contract: quantize/bin first (the
    * t137 hatch) — at unbounded value cardinality use [[spearman]],
    * whose windows are |distinct|-linear, instead.
    *
    * Output: (groups…, n, tau_b 6dp) — NULL when either margin is
    * constant.
    */
  def kendallTauB(df: DataFrame, groupCols: Seq[String],
                  xCol: Column, yCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    // checkpointed: the cell table feeds several consumers (the pair/
    // join legs and the marginal rank sides) whose planned subtrees
    // differ after per-consumer projection pushdown, so ReuseExchange
    // never fires and the corpus-wide aggregate was scanned once per
    // consumer. The pin is the (group, x, y, count) cell table the
    // downstream joins read anyway; one scan feeds them all.
    val cells = df
      .filter(xCol.isNotNull && yCol.isNotNull)
      .groupBy(g :+ xCol.cast("long").as("__x") :+
        yCol.cast("long").as("__y"): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val a = cells.select(g :+ col("__x").as("__x1") :+
      col("__y").as("__y1") :+ col("__c").as("__c1"): _*)
    val b = cells.select(g :+ col("__x").as("__x2") :+
      col("__y").as("__y2") :+ col("__c").as("__c2"): _*)
    val cd = a.join(b, groupCols).filter(col("__x2") > col("__x1"))
      .groupBy(g: _*)
      .agg(sum(when(col("__y2") > col("__y1"),
          col("__c1") * col("__c2")).otherwise(0L)).as("__cc"),
        sum(when(col("__y2") < col("__y1"),
          col("__c1") * col("__c2")).otherwise(0L)).as("__dd"))
    def marginalTies(vCol: String, asCol: String): DataFrame =
      cells.groupBy(g :+ col(vCol): _*).agg(sum(col("__c")).as("__cv"))
        .groupBy(g: _*)
        .agg(sum(col("__cv")).as(s"__n_$asCol"),
          // integer div keeps the tie terms exact longs
          sum(expr("__cv * (__cv - 1) div 2")).as(asCol))
    val xm = marginalTies("__x", "__t1")
    val ym = marginalTies("__y", "__t2").drop("__n___t2")
    val n = col("__n___t1")
    val n0 = expr("__n___t1 * (__n___t1 - 1) div 2")
    xm.join(ym, groupCols).join(cd, groupCols)
      .select(g :+ n.as("n") :+
        when((n0 - col("__t1")) > 0 && (n0 - col("__t2")) > 0,
          round((col("__cc") - col("__dd")).cast("double") /
            sqrt((n0 - col("__t1")).cast("double") *
                 (n0 - col("__t2")).cast("double")), 6)).as("tau_b"): _*)
  }

  /** STANDARDIZED MEAN DIFFERENCE balance audit per group — the
    * covariate-balance check run before attributing any metric delta
    * to a slice split (A/B arms, train/holdout, old/new crawl):
    * SMD = (x̄_A − x̄_B) / √((s²_A + s²_B)/2) per group, the
    * scale-free imbalance measure (|SMD| < 0.1 is the conventional
    * "balanced" bar — judged by the CALLER; this emits the number).
    *
    * Arithmetic: per-side n/Σx/Σx² accumulate exactly (DECIMAL(38,0)
    * — HUGEINT on the oracle); means, the two Bessel-corrected
    * variances, and the SMD are a FIXED deterministic chain of IEEE
    * expressions mirrored by the oracle, 6dp at the boundary. A
    * degenerate pair (both sides constant) yields NULL.
    *
    * Scale shape: ONE map-side-combinable (group, side) moment
    * collapse is the only corpus-sized stage; the A×B self-join runs
    * on |groups| rows. Groups missing a side drop (nothing to
    * compare).
    *
    * Output: (groups…, n_a, n_b, smd 6dp).
    */
  def balanceSmd(df: DataFrame, groupCols: Seq[String],
                 valueCol: Column, sideA: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val m = df.filter(valueCol.isNotNull && sideA.isNotNull)
      .select(g :+ valueCol.cast("long").as("__x") :+ sideA.as("__sa"): _*)
      .groupBy(g :+ col("__sa"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast(dec)).as("__s"),
        sum(col("__x").cast(dec) * col("__x")).as("__ss"))
      .filter(col("__n") > 1)
    def side(tag: String, keep: Column => Column): DataFrame =
      m.filter(keep(col("__sa")))
        .select(g :+ col("__n").as(s"n_$tag") :+
          col("__s").as(s"__s_$tag") :+ col("__ss").as(s"__ss_$tag"): _*)
    def variance(tag: String): Column =
      (col(s"n_$tag").cast(dec) * col(s"__ss_$tag") -
        col(s"__s_$tag") * col(s"__s_$tag")).cast("double") /
        (col(s"n_$tag").cast("double") * (col(s"n_$tag") - 1))
    val dmean = col("__s_a").cast("double") / col("n_a") -
      col("__s_b").cast("double") / col("n_b")
    val va = variance("a"); val vb = variance("b")
    side("a", identity).join(side("b", c => !c), groupCols)
      .select(g :+ col("n_a") :+ col("n_b") :+
        when(va + vb > 0,
          round(dmean / sqrt((va + vb) / 2.0), 6)).as("smd"): _*)
  }

  /** McNEMAR'S TEST per group for two PAIRED binary raters — the
    * significance member of the agreement family ([[graft.operators
    * .Agreement]]'s κ says HOW MUCH raters agree; this says whether
    * their marginal keep-rates differ SYSTEMATICALLY, which is what
    * you ask before swapping rater A's filter for rater B's):
    * χ² = (b − c)²/(b + c) over the discordant cells, judged against
    * the χ²₀.₉₅ df=1 literal 3.841458821 shared with the oracle.
    *
    * Arithmetic: b and c are exact BIGINTs from ONE map-side
    * combinable collapse; the statistic is one IEEE divide. All-
    * concordant groups (b + c = 0) yield NULL and never flag.
    *
    * Output: (groups…, n, b, c, stat 6dp, significant).
    */
  def mcNemar(df: DataFrame, groupCols: Seq[String],
              rater1: Column, rater2: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val m = df.filter(rater1.isNotNull && rater2.isNotNull)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(rater1 && !rater2, 1L).otherwise(0L)).as("b"),
        sum(when(!rater1 && rater2, 1L).otherwise(0L)).as("c"))
    val stat = round(((col("b") - col("c")) * (col("b") - col("c")))
      .cast("double") / (col("b") + col("c")), 6)
    m.select(g :+ col("n") :+ col("b") :+ col("c") :+
      when(col("b") + col("c") > 0, stat).as("stat") :+
      when(col("b") + col("c") > 0, stat > 3.841458821)
        .as("significant"): _*)
  }

  /** CUPED variance reduction (Deng et al. 2013 — Controlled
    * experiments Utilizing Pre-Experiment Data): adjust each unit's
    * experiment metric y by its pre-period covariate x,
    * ŷ = y − θ·(x − x̄) with θ = cov(x,y)/var(x) fitted on ALL units,
    * then report per-arm adjusted means and the variance-reduction
    * ratio — the standard trick that makes A/B deltas readable at a
    * fraction of the sample size.
    *
    * Portability: θ and x̄ come from exact DECIMAL(38,0)/HUGEINT
    * moments; each unit's ŷ is ONE fixed IEEE chain micro-rounded to
    * a BIGINT (round(ŷ·10⁶)) so every later sum — means AND the
    * sample variances — is exact integer arithmetic,
    * order-independent. var_reduction = 1 − var(ŷ)/var(y) with both
    * variances in the n·Σm² − (Σm)² closed form.
    *
    * Scale shape: one per-unit collapse (map-side combinable), one
    * 1-row moment aggregate broadcast back, one per-row adjustment
    * kernel, one per-arm reduction. Nothing bigger than |arms| rows
    * after the unit frame.
    *
    * Output: (arm, n_units, theta, mean_y, mean_cuped,
    * var_reduction) — 6dp.
    */
  def cuped(units: DataFrame, armCol: Column, xCol: Column,
            yCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val u = units.filter(xCol.isNotNull && yCol.isNotNull &&
        armCol.isNotNull)
      .select(armCol.as("arm"), xCol.cast("long").as("__x"),
        yCol.cast("long").as("__y"))
    val m = u.agg(count(lit(1)).as("__n"),
      sum(col("__x").cast(dec)).as("__sx"),
      sum(col("__y").cast(dec)).as("__sy"),
      sum(col("__x").cast(dec) * col("__y")).as("__sxy"),
      sum(col("__x").cast(dec) * col("__x")).as("__sxx"))
    val theta = (col("__n").cast(dec) * col("__sxy") -
      col("__sx") * col("__sy")).cast("double") /
      (col("__n").cast(dec) * col("__sxx") -
        col("__sx") * col("__sx")).cast("double")
    val xbar = col("__sx").cast("double") / col("__n")
    val adj = u.crossJoin(broadcast(m))
      .withColumn("__th", theta)
      .withColumn("__ym",
        round((col("__y").cast("double") -
          col("__th") * (col("__x").cast("double") - xbar)) * 1000000.0)
          .cast(dec))
    adj.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_units"),
        max(col("__th")).as("__theta"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__y").cast(dec) * col("__y")).as("__syy"),
        sum(col("__ym")).as("__sm"),
        sum(col("__ym") * col("__ym")).as("__smm"))
      .select(col("arm"), col("n_units"),
        round(col("__theta"), 6).as("theta"),
        round(col("__sy").cast("double") / col("n_units"), 6).as("mean_y"),
        round(col("__sm").cast("double") / 1e6 / col("n_units"), 6)
          .as("mean_cuped"),
        when(col("n_units") > 1 &&
            (col("n_units").cast(dec) * col("__syy") -
              col("__sy") * col("__sy")).cast("double") > 0,
          round(lit(1.0) -
            ((col("n_units").cast(dec) * col("__smm") -
              col("__sm") * col("__sm")).cast("double") / 1e12) /
            (col("n_units").cast(dec) * col("__syy") -
              col("__sy") * col("__sy")).cast("double"), 6))
          .as("var_reduction"))
  }

  /** ALWAYS-VALID sequential A/B monitor (mSPRT, Johari et al. 2017/
    * 2022 — the "peeking-safe" p-value): per period, the running
    * two-sample mixture likelihood ratio
    * Λ_n = √(V/(V+τ²))·exp(Δ²τ²/(2V(V+τ²))) with Δ the cumulative
    * mean difference, V = s²·(1/n_A + 1/n_B) from the pooled running
    * variance, and mixture scale τ² = s² — and the always-valid
    * p_n = min(1, 1/max_{k≤n} Λ_k), monotone by construction. The
    * experimentation table a dashboard can read EVERY day without
    * inflating false positives (a fixed-horizon t-test peeked daily
    * is statistically invalid; this is the standard fix).
    *
    * Portability: per-(period, arm) n/Σx/Σx² collapse to exact
    * DECIMAL(38,0)/HUGEINT integers; the cumulative windows run over
    * the calendar-bounded period frame; Δ, V, and Λ are one fixed
    * IEEE chain of those integers, and the running max/min are
    * selections. Periods missing either arm drop (inner join).
    *
    * Scale shape: one map-side-combinable (period, arm) moment
    * collapse is the only corpus-sized stage; everything after lives
    * on ≤ |periods| rows per arm.
    *
    * Output: (period, n_a, n_b, delta 6dp, p_always 6dp, stopped) —
    * `stopped` judges the 6dp p against `alpha`.
    */
  def sequentialAbMonitor(df: DataFrame, periodCol: Column,
                          armA: Column, valueCol: Column,
                          alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val dec = "decimal(38,0)"
    val daily = df.filter(valueCol.isNotNull && armA.isNotNull)
      .groupBy(periodCol.as("period"), armA.as("__a"))
      .agg(count(lit(1)).as("__n"),
        sum(valueCol.cast("long").cast(dec)).as("__s"),
        sum(valueCol.cast("long").cast(dec) * valueCol.cast("long"))
          .as("__ss"))
    val w = Window.partitionBy(col("__a")).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("__cn", sum(col("__n")).over(w))
      .withColumn("__cs", sum(col("__s")).over(w))
      .withColumn("__css", sum(col("__ss")).over(w))
    def side(tag: String, keep: Column): DataFrame =
      cum.filter(keep).select(col("period"),
        col("__cn").as(s"__n_$tag"), col("__cs").as(s"__s_$tag"),
        col("__css").as(s"__ss_$tag"))
    def variance(tag: String): Column =
      (col(s"__n_$tag").cast(dec) * col(s"__ss_$tag") -
        col(s"__s_$tag") * col(s"__s_$tag")).cast("double") /
        (col(s"__n_$tag").cast("double") * (col(s"__n_$tag") - 1))
    val ab = side("a", col("__a")).join(side("b", !col("__a")), "period")
      .filter(col("__n_a") > 1 && col("__n_b") > 1)
    val delta = col("__s_a").cast("double") / col("__n_a") -
      col("__s_b").cast("double") / col("__n_b")
    val s2 = (variance("a") + variance("b")) / 2.0
    val vn = s2 * (lit(1.0) / col("__n_a") + lit(1.0) / col("__n_b"))
    val lambda = sqrt(vn / (vn + s2)) *
      exp(delta * delta * s2 / (lit(2.0) * vn * (vn + s2)))
    val runMax = Window.orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = round(least(lit(1.0),
      lit(1.0) / max(col("__lambda")).over(runMax)), 6)
    ab.withColumn("__lambda", lambda)
      .withColumn("p_always", p)
      .select(col("period"), col("__n_a").as("n_a"),
        col("__n_b").as("n_b"), round(delta, 6).as("delta"),
        col("p_always"), (col("p_always") < alpha).as("stopped"))
  }

  /** SAMPLE-RATIO MISMATCH check per period — the first validity
    * gate on any A/B readout (an arm imbalance the randomizer didn't
    * intend invalidates every downstream metric comparison before it
    * starts): χ² = (n_A − n_B)²/(n_A + n_B) against the expected
    * 50/50 split, judged on the shared χ²₁ literal 3.841458821.
    *
    * Arithmetic: exact BIGINT arm counts from ONE map-side
    * combinable collapse; one IEEE divide. Output: (period, n_a,
    * n_b, chi2 6dp, mismatch).
    */
  def srmCheck(df: DataFrame, periodCol: Column,
               armA: Column): DataFrame = {
    val m = df.filter(armA.isNotNull)
      .groupBy(periodCol.as("period"))
      .agg(sum(when(armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(!armA, 1L).otherwise(0L)).as("n_b"))
    val chi2 = round(((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
      .cast("double") / (col("n_a") + col("n_b")), 6)
    m.select(col("period"), col("n_a"), col("n_b"), chi2.as("chi2"),
      (chi2 > 3.841458821).as("mismatch"))
  }

  /** Pairwise WIN-RATE matrix between groups — the arena-style
    * comparison table: for every group pair (a, b),
    * P(value_a > value_b) + ½·P(tie) over independent draws (the
    * Mann–Whitney θ statistic, per pair). The "which source's docs
    * are longer/higher-quality, head-to-head" readout that single
    * per-group means blur.
    *
    * Arithmetic: DOUBLED win mass 2W_ab = Σ_v c_a(v)·(2·F_b(v⁻) +
    * c_b(v)) stays an exact BIGINT (strict wins doubled, ties once);
    * one IEEE divide per pair.
    *
    * Scale shape: one (group, value) cell collapse (map-side
    * combinable), then a DENSE value grid — |groups|·|domain| rows,
    * absent cells zero-filled so every group's CDF evaluates at
    * every value — with per-group cumulative windows over the
    * domain, and ONE value-keyed join of a-cells against the grid
    * (never a cells×cells pair blowup). Bounded by the QUANTIZED
    * domain (the t198 contract: bin first; at unbounded cardinality
    * use per-pair [[mannWhitney]] instead).
    *
    * Output: (group_a, group_b, n_a, n_b, win_rate 6dp), a < b.
    */
  def winRateMatrix(df: DataFrame, groupCol: String,
                    valueCol: Column): DataFrame = {
    val cells = df.filter(valueCol.isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), valueCol.cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val tot = cells.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val grid = cells.select(col("__v")).distinct()
      .crossJoin(broadcast(tot.select(col("__g"))))
      .join(cells, Seq("__g", "__v"), "left")
      .na.fill(0L, Seq("__c"))
    val before = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cdf = grid.withColumn("__bef",
        coalesce(sum(col("__c")).over(before), lit(0L)))
      .select(col("__g").as("group_b"), col("__v"),
        col("__c").as("__cb"), col("__bef"))
    cells.select(col("__g").as("group_a"), col("__v"),
        col("__c").as("__ca"))
      .join(cdf, "__v")
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(sum(col("__ca") * (lit(2L) * col("__bef") + col("__cb")))
        .as("__w2"))
      .join(tot.select(col("__g").as("group_a"), col("__n").as("n_a")),
        "group_a")
      .join(tot.select(col("__g").as("group_b"), col("__n").as("n_b")),
        "group_b")
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        round(col("__w2").cast("double") /
          (lit(2L) * col("n_a") * col("n_b")), 6).as("win_rate"))
  }

  /** RATIO-METRIC delta-method CI per group — the correct uncertainty
    * for per-unit ratio metrics (value per event, clicks per session)
    * where both numerator and denominator are random: R = Σy/Σx with
    * the cluster-robust (unit-level) delta-method variance
    * var(R) ≈ (s²_y − 2R·s_xy + R²·s²_x)/(x̄²·n), 95% z-interval. The
    * naive row-level mean silently understates this variance whenever
    * units contribute unequal denominators.
    *
    * Portability: unit moments (n, Σx, Σy, Σx², Σy², Σxy) are exact
    * DECIMAL(38,0)/HUGEINT integers; R, the (co)variances, the SE,
    * and the bounds are a fixed IEEE chain, 6dp at the boundary.
    * Single-unit groups drop.
    *
    * Scale shape: the caller's per-unit collapse is the corpus-sized
    * stage; this is ONE map-side-combinable moment reduction to
    * |groups| rows. Output: (groups…, n, ratio, ci_lo, ci_hi).
    */
  def ratioMetricCI(units: DataFrame, groupCols: Seq[String],
                    xCol: Column, yCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val m = units.filter(xCol.isNotNull && yCol.isNotNull)
      .select(g :+ xCol.cast("long").as("__x") :+
        yCol.cast("long").as("__y"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x").cast(dec) * col("__x")).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y")).as("__syy"),
        sum(col("__x").cast(dec) * col("__y")).as("__sxy"))
      .filter(col("n") > 1)
    val nD = col("n").cast(dec)
    def sVar(ss: String, s1: String, s2: String): Column =
      (nD * col(ss) - col(s1) * col(s2)).cast("double") /
        (col("n").cast("double") * (col("n") - 1))
    val r = col("__sy").cast("double") / col("__sx").cast("double")
    val xbar = col("__sx").cast("double") / col("n")
    val se = sqrt((sVar("__syy", "__sy", "__sy") -
      lit(2.0) * r * sVar("__sxy", "__sx", "__sy") +
      r * r * sVar("__sxx", "__sx", "__sx")) / (xbar * xbar) / col("n"))
    val z = 1.959963984540054
    m.select(g :+ col("n") :+ round(r, 6).as("ratio") :+
      round(r - lit(z) * se, 6).as("ci_lo") :+
      round(r + lit(z) * se, 6).as("ci_hi"): _*)
  }

  /** MINIMUM DETECTABLE EFFECT table per group — "how big an effect
    * could this A/B even see?": with the observed per-unit metric
    * variance, a 50/50 split of the group's n units, two-sided
    * α = 0.05 and power 0.8, MDE_abs = (z_{α/2} + z_β)·σ·√(2/(n/2))
    * and MDE_rel = MDE_abs / mean. The go/no-go sizing readout run
    * BEFORE launching the experiment the t213/t218 monitors then
    * guard.
    *
    * Portability: σ and the mean come from exact DECIMAL(38,0)/
    * HUGEINT moments; the z literals (1.959963984540054,
    * 0.8416212335729143) are shared verbatim with the oracle; one
    * fixed IEEE chain, 6dp. Single-unit groups drop.
    *
    * Output: (groups…, n, sigma, mde_abs, mde_rel) — 6dp.
    */
  def mdeTable(units: DataFrame, groupCols: Seq[String],
               yCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val m = units.filter(yCol.isNotNull)
      .select(g :+ yCol.cast("long").as("__y"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__y").cast(dec)).as("__s"),
        sum(col("__y").cast(dec) * col("__y")).as("__ss"))
      .filter(col("n") > 1)
    val sigma = sqrt((col("n").cast(dec) * col("__ss") -
      col("__s") * col("__s")).cast("double") /
      (col("n").cast("double") * (col("n") - 1)))
    val zSum = 1.959963984540054 + 0.8416212335729143
    val mde = lit(zSum) * sigma * sqrt(lit(2.0) / (col("n") / 2))
    m.select(g :+ col("n") :+ round(sigma, 6).as("sigma") :+
      round(mde, 6).as("mde_abs") :+
      round(mde / (col("__s").cast("double") / col("n")), 6)
        .as("mde_rel"): _*)
  }
}
