package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap — the distributed bootstrap (Chamandy et al.,
  * "Estimating uncertainty for massive data streams", Google 2012).
  * The classical bootstrap resamples n rows WITH replacement, which
  * needs a global n and coordinated draws — both unavailable
  * map-side. The Poisson trick: each row's multiplicity in replicate
  * b is an independent Poisson(1) draw (the n→∞ limit of
  * Binomial(n, 1/n)), so every row decides its own weight in every
  * replicate from nothing but (id, b) — embarrassingly parallel,
  * stream-friendly, and exactly replayable when the draw is seeded.
  *
  * Scale shape: explode rows × B replicates map-side (the O(B)
  * per-row cost IS the algorithm; B = 100–200 is customary), then one
  * groupBy(group, replicate) whose partial map-side combine reduces
  * shuffle volume to partitions × |groups| × B aggregate rows — the
  * corpus never shuffles. The replicate-mean table is |groups| × B
  * rows; the CI percentile runs per group over B values. Driver state:
  * none.
  *
  * Portability contract (the repo's integer-moment convention): the
  * value column must be INTEGRAL — weighted sums then stay exact
  * longs, each replicate mean is ONE long/long division, and the
  * percentile interpolation is one multiply-add on bit-identical
  * doubles, so a DuckDB oracle replays the whole pipeline hash-exact.
  * The Poisson draw inverts the seeded md5 uniform
  * ([[graft.ops.Sampling.md5Uniform]], key = (id, b)) against
  * hard-coded CDF literals; multiplicity caps at 9
  * (P(X > 9) ≈ 1.1e-7 — the truncation moves nothing at 6dp).
  */
object Bootstrap {

  /** P(Poisson(1) ≤ k) for k = 0..8, as decimal literals shared
    * verbatim with the SQL oracle (computing them via exp() in each
    * engine would risk last-ulp disagreement at the comparison).
    */
  val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402)

  /** Seeded Poisson(1) multiplicity for (id, replicate): the count of
    * CDF thresholds at or below the row's md5 uniform.
    *
    * The uniform subtree appears once per CDF literal (9×) in this
    * single-expression form; Catalyst's CollapseProject keeps a
    * PRE-MATERIALIZED uniform column un-inlined (md5 is non-cheap and
    * multiply-referenced), so hot paths — the ×reps streaming explode
    * especially — should compute `u` into its own column and call
    * [[poissonWeightFromUniform]].
    */
  def poissonWeight(idCol: Column, repCol: Column, salt: String): Column =
    poissonWeightFromUniform(
      graft.ops.Sampling.md5Uniform(Seq(idCol, repCol), salt))

  /** The threshold fold alone, for callers that materialized the
    * seeded uniform into a column first.
    */
  def poissonWeightFromUniform(u: Column): Column =
    PoissonCdf.map(c => when(u >= lit(c), 1L).otherwise(0L)).reduce(_ + _)

  /** Per-group bootstrap percentile CI for the MEAN of an integral
    * column. Output one row per group: n_rows, mean (the point
    * estimate), ci_lo / ci_hi (percentile-method bounds over the B
    * replicate means at `conf` coverage), n_reps (replicates with
    * non-zero total weight — < B only for near-empty groups, where
    * P(all weights 0) = e^−n).
    */
  def meanCI(df: DataFrame, groupCols: Seq[String], idCol: String,
             valueCol: String, reps: Int = 200, conf: Double = 0.95,
             salt: String = "boot"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(reps >= 2, s"reps must be >= 2, got $reps")
    require(conf > 0 && conf < 1, s"conf must be in (0,1), got $conf")
    val integral = Set("ByteType", "ShortType", "IntegerType", "LongType")
    require(integral(df.schema(valueCol).dataType.toString),
      s"$valueCol must be integral (the exact-long portability contract); " +
        "pre-scale doubles to fixed-point")
    val g = groupCols.map(col)
    val rows = df.filter(col(valueCol).isNotNull)
      .select((g :+ col(idCol).as("__id") :+
        col(valueCol).cast("long").as("__v")): _*)
    val point = rows.groupBy(g: _*)
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__v")).cast("double") / count(lit(1))).as("__mean"))
    val lo = (1 - conf) / 2
    val perRep = rows
      .withColumn("__b", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("__u", graft.ops.Sampling.md5Uniform(
        Seq(col("__id"), col("__b")), salt))
      .withColumn("__w", poissonWeightFromUniform(col("__u")))
      .groupBy((g :+ col("__b")): _*)
      .agg(sum(col("__w") * col("__v")).as("__wv"), sum(col("__w")).as("__wt"))
      .filter(col("__wt") > 0)
      .select((g :+ (col("__wv").cast("double") / col("__wt").cast("double"))
        .as("__m") ): _*)
    val ci = perRep.groupBy(g: _*)
      .agg(count(lit(1)).as("n_reps"),
        percentile(col("__m"), lit(lo)).as("__lo"),
        percentile(col("__m"), lit(1 - lo)).as("__hi"))
    point.join(ci, groupCols)
      .select((g :+ col("n_rows") :+
        round(col("__mean"), 6).as("mean") :+
        round(col("__lo"), 6).as("ci_lo") :+
        round(col("__hi"), 6).as("ci_hi") :+
        col("n_reps")): _*)
  }

  /** Per-group bootstrap CI for the DIFFERENCE of means between two
    * samples (the A/B readout: "did the treatment move the metric,
    * with what uncertainty") — replicate statistic d_b = mean_A −
    * mean_B under shared per-(id, replicate) Poisson weights, CI by
    * the percentile method, `significant` = the CI excludes 0. Same
    * scale shape and integral-value portability contract as
    * [[meanCI]]; replicates where either side's total weight is 0
    * drop (no difference to measure — P ≈ e^−min(n_a,n_b)).
    * Output: (group…, n_a, n_b, diff, ci_lo, ci_hi, n_reps,
    * significant).
    */
  def diffCI(df: DataFrame, groupCols: Seq[String], sideA: Column,
             idCol: String, valueCol: String, reps: Int = 200,
             conf: Double = 0.95, salt: String = "boot"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(reps >= 2, s"reps must be >= 2, got $reps")
    require(conf > 0 && conf < 1, s"conf must be in (0,1), got $conf")
    val integral = Set("ByteType", "ShortType", "IntegerType", "LongType")
    require(integral(df.schema(valueCol).dataType.toString),
      s"$valueCol must be integral (the exact-long portability contract); " +
        "pre-scale doubles to fixed-point")
    val g = groupCols.map(col)
    val rows = df.filter(col(valueCol).isNotNull)
      .select((g :+ col(idCol).as("__id") :+
        col(valueCol).cast("long").as("__v") :+ sideA.as("__sa")): _*)
    val point = rows.groupBy(g: _*)
      .agg(sum(when(col("__sa"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__sa"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__sa"), col("__v"))).as("__va"),
        sum(when(!col("__sa"), col("__v"))).as("__vb"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("__diff",
        col("__va").cast("double") / col("n_a").cast("double") -
          col("__vb").cast("double") / col("n_b").cast("double"))
    val lo = (1 - conf) / 2
    val perRep = rows
      .withColumn("__b", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("__u", graft.ops.Sampling.md5Uniform(
        Seq(col("__id"), col("__b")), salt))
      .withColumn("__w", poissonWeightFromUniform(col("__u")))
      .groupBy((g :+ col("__b")): _*)
      .agg(sum(when(col("__sa"), col("__w") * col("__v"))).as("__wva"),
        sum(when(col("__sa"), col("__w"))).as("__wa"),
        sum(when(!col("__sa"), col("__w") * col("__v"))).as("__wvb"),
        sum(when(!col("__sa"), col("__w"))).as("__wb"))
      .filter(col("__wa") > 0 && col("__wb") > 0)
      .select((g :+ (col("__wva").cast("double") / col("__wa").cast("double") -
        col("__wvb").cast("double") / col("__wb").cast("double")).as("__d")): _*)
    val ci = perRep.groupBy(g: _*)
      .agg(count(lit(1)).as("n_reps"),
        percentile(col("__d"), lit(lo)).as("__lo"),
        percentile(col("__d"), lit(1 - lo)).as("__hi"))
    point.join(ci, groupCols)
      .select((g :+ col("n_a") :+ col("n_b") :+
        round(col("__diff"), 6).as("diff") :+
        round(col("__lo"), 6).as("ci_lo") :+
        round(col("__hi"), 6).as("ci_hi") :+
        col("n_reps") :+
        (col("__lo") > 0 || col("__hi") < 0).as("significant")): _*)
  }
}
