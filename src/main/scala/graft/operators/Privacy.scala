package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving curation beyond per-string PII redaction
  * (TextAnalysis.redactPii): group-level protections over
  * quasi-identifier combinations — the attributes that re-identify a
  * row when JOINED together (language × source × region …) even after
  * direct identifiers are scrubbed.
  */
object Privacy {

  /** The (quasi combination → group_size) count table both entry
    * points share: one map-side-combinable groupBy on the quasi key.
    * groupBy keeps NULL keys as their own group, so a null lang/source
    * still counts — the join back must use null-safe equality to
    * match (see [[kAnonymize]]).
    */
  private def groupSizes(df: DataFrame, quasiCols: Seq[String]): DataFrame =
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("group_size"))

  /** k-anonymity by suppression: flag every row whose quasi-identifier
    * combination occurs in fewer than `k` rows (the released subset —
    * `kept = true` rows — then satisfies k-anonymity w.r.t. those
    * columns). Adds `group_size` and `kept`; callers filter or audit.
    *
    * Scale shape: one map-side-combinable groupBy on the quasi key for
    * the group sizes, joined back on the same key — the join reuses
    * the aggregate's partitioning, and the count table is
    * group-cardinality (≪ corpus), so AQE broadcasts it while it
    * fits. No window over the corpus. The join-back is NULL-SAFE
    * (`<=>` per quasi column): a plain equi-join would silently drop
    * every row whose quasi key contains a NULL — neither kept nor
    * flagged, the worst failure mode for a privacy operator — whereas
    * the count-over-window formulation the oracle replays keeps
    * NULL-keyed rows as their own group.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String],
                 k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val sizes = quasiCols.foldLeft(groupSizes(df, quasiCols)) {
      (d, c) => d.withColumnRenamed(c, s"__k_$c")
    }
    val cond = quasiCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(sizes, cond)
      .drop(quasiCols.map(c => s"__k_$c"): _*)
      .withColumn("kept", col("group_size") >= k)
  }

  /** The release audit that ships with [[kAnonymize]]: per quasi
    * combination — size, kept flag, and the share of total rows the
    * suppression removes. Derived ENTIRELY from the group-cardinality
    * count table (each quasi combination is one audit row, so its
    * n_rows IS its group_size): one corpus aggregate total, with the
    * total-row denominator one further aggregate over the count table
    * broadcast back as a 1-row frame — never a second corpus pass.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val sizes = groupSizes(df, quasiCols)
    sizes
      .withColumn("kept", col("group_size") >= k)
      .withColumn("n_rows", col("group_size"))
      .crossJoin(broadcast(
        sizes.agg(sum(col("group_size")).cast("double").as("__total"))))
      .withColumn("suppressed_share",
        when(col("kept"), 0.0)
          .otherwise(round(col("n_rows") / col("__total"), 6)))
      .select((quasiCols.map(col) :+ col("group_size") :+ col("kept") :+
        col("n_rows") :+ col("suppressed_share")): _*)
  }

  /** ε-differentially-private count release (the Laplace mechanism,
    * Dwork et al. 2006): per-group counts plus Laplace(Δ/ε) noise with
    * sensitivity Δ = 1 (one row changes one count by one). The noise
    * is SEEDED — the uniform draw u derives from md5(group key ‖ salt)
    * digit arithmetic, so the release is reproducible run-to-run and
    * any engine replays it exactly (the repo's md5-portability
    * contract; a production release would rotate `salt` per release
    * and keep it secret). Inverse-CDF transform:
    * noise = −(1/ε)·sgn(u−½)·ln(1−2|u−½|), u clamped to
    * [1e−9, 1−1e−9] so the tails stay finite.
    *
    * Scale shape: one map-side-combinable count per group + per-row
    * hash arithmetic on the group-cardinality result — nothing else
    * touches the corpus.
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
               salt: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val hexDigits = "0123456789abcdef"
    // seed-collision hardening: each component is NULL-tagged and
    // base64-encoded before joining (base64's alphabet excludes the
    // delimiter), so ('a|b','c') vs ('a','b|c') and ('a',NULL) vs
    // (NULL,'a') draw INDEPENDENT noise — colliding seeds would hand
    // an observer the exact difference of two true counts (the noise
    // cancels), voiding the DP guarantee
    val parts = groupCols.map { c =>
      when(col(c).isNull, lit("N"))
        .otherwise(concat(lit("V"),
          base64(col(c).cast("string").cast("binary"))))
    }
    val h = md5(concat_ws("|", parts :+ (lit(salt): Column): _*))
    // 8 hex digits → uniform in [0,1) with 2^-32 granularity; digit
    // extraction via strpos keeps the arithmetic engine-portable (no
    // hex-to-int builtin needed on either side)
    val u0 = (1 to 8).map { i =>
      (instr(lit(hexDigits), substring(h, i, 1)) - 1).cast("double") /
        math.pow(16.0, i)
    }.reduce(_ + _)
    val u = least(greatest(u0, lit(1e-9)), lit(1.0 - 1e-9))
    val b = 1.0 / epsilon
    val noise = (lit(-b) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5)))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("true_count"))
      .select(groupCols.map(col) :+
        round(col("true_count") + noise, 6).as("noisy_count") :+
        lit(epsilon).as("epsilon"): _*)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the attack
    * k-anonymity misses: a group can be k-large yet reveal everyone's
    * SENSITIVE value if that value is (near-)constant inside it. Per
    * quasi-identifier combination: group size, distinct sensitive
    * values, the sensitive distribution's entropy, and both standard
    * verdicts — distinct l-diversity (≥ l distinct values) and the
    * stricter entropy l-diversity (H ≥ ln l).
    *
    * Arithmetic contract: each entropy term routes through the
    * BIGINT micro-log boundary (round(p·ln p·10⁶), p one IEEE divide
    * of exact counts — the t167 convention), so the per-group sum is
    * order-independent; the entropy verdict compares the 6dp-rounded
    * value against ln(l) on both engines.
    *
    * Scale shape: one map-side-combinable count on (quasi, sensitive)
    * — the only corpus-sized stage — then per-quasi windows over the
    * already-aggregated frame (bounded by sensitive-value cardinality
    * per group). NULL sensitive values count as one more "value":
    * groupBy keeps them, matching the count-based oracle replay.
    *
    * Output: (quasi…, n, k_sensitive, s_entropy, distinct_l_diverse,
    * entropy_l_diverse) — entropy in nats, 6dp.
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    val q = quasiCols.map(col)
    val c = df.groupBy(q :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__n"))
    val wq = org.apache.spark.sql.expressions.Window.partitionBy(q: _*)
    val p = col("__n").cast("double") / sum(col("__n")).over(wq)
    c.withColumn("__micro", round(p * log(p) * lit(1e6), 0).cast("long"))
      .groupBy(q: _*)
      .agg(sum(col("__n")).as("n"), count(lit(1)).as("k_sensitive"),
           sum(col("__micro")).as("__msum"))
      .select(q :+ col("n") :+ col("k_sensitive") :+
        round(-col("__msum").cast("double") / 1e6, 6).as("s_entropy") :+
        (col("k_sensitive") >= l).as("distinct_l_diverse") :+
        (round(-col("__msum").cast("double") / 1e6, 6)
          >= math.log(l.toDouble)).as("entropy_l_diverse"): _*)
  }

  /** t-CLOSENESS audit per quasi-group (Li, Li & Venkatasubramanian
    * 2007) — the disclosure [[lDiversityAudit]] still misses: a group
    * can hold l distinct sensitive values yet skew so far from the
    * corpus-wide distribution that membership alone leaks the
    * sensitive attribute (every value distinct but all high). For an
    * ORDERED sensitive domain the distance is the ordered-distance
    * Earth Mover's: EMD(g) = Σ_k |F_g(k) − F(k)| / (m − 1) over the
    * m global domain values — cumulative-share differences, so mass
    * moved two bins away costs twice mass moved one.
    *
    * The caller supplies the (binned) sensitive column — for
    * continuous attributes quantize first (fixed-width or the t139
    * quantile edges); the audit is then exact on the binned domain,
    * the same resolution contract as binned KS.
    *
    * Arithmetic contract: per-bin terms are |cum_g·n − cum·n_g| —
    * exact DECIMAL(38,0) integer products (HUGEINT on the oracle
    * side) — summed then divided ONCE by n_g·n·(m−1), 6dp. The
    * verdict compares the already-rounded EMD to t, so both engines
    * judge the identical 6dp value.
    *
    * Scale shape: one map-side-combinable (quasi, bin) count — the
    * only corpus-sized stage; the global bin table (≤ m rows)
    * broadcasts into a grid join so ABSENT bins still contribute
    * their full cumulative deficit; per-group windows span exactly m
    * rows. Output: (quasi…, n, emd, t_close).
    */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveBin: Column, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val q = quasiCols.map(col)
    val base = df.select(q :+ sensitiveBin.as("__b"): _*)
      .filter(col("__b").isNotNull)
    val gb = base.groupBy(q :+ col("__b"): _*).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // groups×bins rows: feeds grid join + totals
    val ab = gb.groupBy(col("__b")).agg(sum(col("__c")).as("__ca"))
    val gn = gb.groupBy(q: _*).agg(sum(col("__c")).as("__ng"))
    val an = ab.agg(sum(col("__ca")).as("__na"), count(lit(1)).as("__m"))
    val grid = gn.crossJoin(broadcast(ab))
      .join(gb, quasiCols :+ "__b", "left")
      .na.fill(0L, Seq("__c"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(q: _*).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    grid
      .withColumn("__cg", sum(col("__c")).over(wOrd))
      .withColumn("__cal", sum(col("__ca")).over(wOrd))
      .crossJoin(broadcast(an))
      .withColumn("__term",
        abs(dec(col("__cg")) * dec(col("__na")) -
            dec(col("__cal")) * dec(col("__ng"))))
      .groupBy(q: _*)
      .agg(max(col("__ng")).as("n"),
        // m = 1 (single-bin global domain) degenerates the (m−1)
        // normalizer to 0/0, but every distribution over one bin is
        // identical — the mathematically correct EMD is exactly 0
        round(when(max(col("__m")) > 1,
          sum(col("__term")).cast("double") /
            (dec(max(col("__ng"))) * dec(max(col("__na"))) *
             dec(max(col("__m")) - 1)).cast("double"))
          .otherwise(lit(0.0)), 6).as("emd"))
      .withColumn("t_close", col("emd") <= t)
  }
}
