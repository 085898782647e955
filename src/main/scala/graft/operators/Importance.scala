package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling") —
  * the model-free domain-selection step: map every document to hashed
  * unigram+bigram feature counts, fit two smoothed categorical
  * distributions over the buckets (target slice vs whole corpus), and
  * weight each document by its log importance ratio
  * `Σ_f n_f · (ln p_f − ln q_f)`. High weight = the document's
  * feature profile looks like the target domain.
  */
object Importance {

  /** Feature buckets of the DSIR hash — shared by the operator, its
    * oracle, and the scale-stress audit. */
  val DefaultBuckets = 64

  /** Per-document DSIR importance weights plus a top-quantile keep
    * flag.
    *
    * Output: (doc_id, n_feats, logw, keep) for EVERY document —
    * featureless (empty-text) docs carry n_feats = 0, logw = 0.
    * `logw` is rounded to 6dp; the per-bucket log ratios are rounded
    * to 6dp BEFORE the dot product so any engine replaying the
    * arithmetic feeds identical inputs to the sum (ln differs by an
    * ulp across libm implementations); keep = logw ≥ the rounded
    * `keepQuantile` exact percentile of the corpus weights.
    *
    * Scale shape: the feature map is ONE native-kernel scan per row —
    * no explode, no per-token strings, no shuffle. Fitting reduces the
    * `buckets`-length count vectors to exactly `buckets` rows
    * [posexplode → map-side combined groupBy], and the fitted model is
    * 2·`buckets` numbers — bounded by construction, held on the driver
    * like the k-means centroid matrices (never grows with the corpus).
    * Scoring is a per-row zip_with/aggregate dot product against the
    * literal log-ratio vector — map-side only. The one corpus-wide
    * ordering is the percentile aggregate over per-doc scalars, riding
    * a broadcast single-row frame (the t52 threshold convention).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  target: Column, buckets: Int = DefaultBuckets,
                  alpha: Double = 0.5, keepQuantile: Double = 0.75)
      : DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(keepQuantile > 0 && keepQuantile < 1,
      s"keepQuantile must be in (0, 1), got $keepQuantile")
    // NULL text = featureless (all-zero counts, logw 0), matching the
    // oracle's LEFT-join + coalesce-0 coverage of every document —
    // without the coalesce the kernel would null-propagate and drop
    // the row from the percentile the keep threshold rides on
    val feats = docs.select(col(idCol).as("doc_id"), target.as("__tgt"),
        TextFunctions.hashed_ngram_counts(
          coalesce(col(textCol), lit("")), buckets).as("f"))
      .localCheckpoint(true)
    // a NULL target verdict counts as out-of-domain (excluded by
    // `when`); posexplode emits every bucket of every row, so the
    // groupBy covers all `buckets` positions even for empty buckets
    val totals = feats
      .select(col("__tgt"), posexplode(col("f")).as(Seq("b", "n")))
      .groupBy(col("b"))
      .agg(sum(col("n")).as("c_all"),
           coalesce(sum(when(col("__tgt"), col("n"))), lit(0L)).as("c_tgt"))
      .collect() // bounded: exactly `buckets` rows, like k-means centroids
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val lr = logRatiosOf(totals, buckets, alpha)
    scoreFeats(feats, lr, keepQuantile)
  }

  /** The 6dp-rounded per-bucket log importance ratios — shared by
    * [[dsirWeights]] (in-session) and [[dsirFit]] (the persistable
    * model table), so the two paths cannot drift arithmetically. */
  private def logRatiosOf(totals: Array[(Int, Long, Long)],
                          buckets: Int, alpha: Double): Array[Double] = {
    val tAll = totals.map(_._2).sum.toDouble
    val tTgt = totals.map(_._3).sum.toDouble
    val lr = new Array[Double](buckets)
    totals.foreach { case (b, cAll, cTgt) =>
      val raw =
        math.log((cTgt + alpha) / (tTgt + alpha * buckets)) -
        math.log((cAll + alpha) / (tAll + alpha * buckets))
      lr(b) =
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    lr
  }

  /** The scoring half (dot product, 6dp, exact-percentile keep flag)
    * against a literal log-ratio vector — shared by [[dsirWeights]]
    * and [[dsirScore]] so a loaded model scores through the IDENTICAL
    * plan a fresh fit would. */
  private def scoreFeats(feats: DataFrame, lr: Array[Double],
                         keepQuantile: Double): DataFrame = {
    val lrCol = array(lr.toSeq.map(lit): _*)
    val scored = feats.select(col("doc_id"),
        aggregate(col("f"), lit(0L), (acc, x) => acc + x).as("n_feats"),
        round(aggregate(zip_with(col("f"), lrCol, (n, w) => n * w),
          lit(0.0), (acc, x) => acc + x), 6).as("logw"))
      .localCheckpoint(true) // consumed twice: threshold + labeling
    val thr = scored.agg(
      round(percentile(col("logw"), lit(keepQuantile)), 6).as("__thr"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_feats"), col("logw"),
        (col("logw") >= col("__thr")).as("keep"))
  }

  // ---- model persistence --------------------------------------------------
  //
  // The fitted DSIR model is 64 numbers; until round 11 it lived only
  // as driver state inside dsirWeights' one session. dsirFit exposes
  // it as a TABLE (b, c_all, c_tgt, log_ratio) — saveable, browsable,
  // and auditable (the raw counts ride along so a loaded model can be
  // re-derived) — and dsirScore scores any corpus against a loaded
  // model WITHOUT retraining, through the same plan as dsirWeights.

  /** Fit only: the model table (b, c_all, c_tgt, log_ratio), exactly
    * `buckets` rows, log_ratio 6dp-rounded — the same numbers
    * [[dsirWeights]] would embed as literals. */
  def dsirFit(docs: DataFrame, idCol: String, textCol: String,
              target: Column, buckets: Int = DefaultBuckets,
              alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val spark = docs.sparkSession
    import spark.implicits._
    val totals = docs.select(target.as("__tgt"),
        posexplode(TextFunctions.hashed_ngram_counts(
          coalesce(col(textCol), lit("")), buckets)).as(Seq("b", "n")))
      .groupBy(col("b"))
      .agg(sum(col("n")).as("c_all"),
           coalesce(sum(when(col("__tgt"), col("n"))), lit(0L)).as("c_tgt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val lr = logRatiosOf(totals, buckets, alpha)
    totals.sortBy(_._1)
      .map { case (b, cAll, cTgt) => (b, cAll, cTgt, lr(b)) }.toSeq
      .toDF("b", "c_all", "c_tgt", "log_ratio")
  }

  /** Persist a [[dsirFit]] model table (one tiny file). */
  def saveModel(model: DataFrame, path: String): Unit =
    model.orderBy(col("b")).coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** Load a persisted model and return the validated log-ratio
    * vector: bucket ids must be exactly 0..n−1 with no gaps or
    * duplicates and every ratio finite — a truncated or hand-edited
    * model fails at load, not as silently-wrong scores. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Array[Double] = {
    val rows = spark.read.parquet(path)
      .select(col("b"), col("log_ratio"))
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, s"empty DSIR model at $path")
    val lr = new Array[Double](rows.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i,
        s"bucket ids not contiguous in $path: saw ${r.getInt(0)} at $i")
      val v = r.getDouble(1)
      require(!v.isNaN && !v.isInfinite,
        s"non-finite log_ratio at bucket $i in $path")
      lr(i) = v
    }
    lr
  }

  /** Score a corpus against a fitted/loaded model — the
    * [[dsirWeights]] output shape (doc_id, n_feats, logw, keep)
    * through the identical scoring plan, no retraining. */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
                logRatios: Array[Double],
                keepQuantile: Double = 0.75): DataFrame = {
    require(keepQuantile > 0 && keepQuantile < 1,
      s"keepQuantile must be in (0, 1), got $keepQuantile")
    val feats = docs.select(col(idCol).as("doc_id"),
        TextFunctions.hashed_ngram_counts(
          coalesce(col(textCol), lit("")), logRatios.length).as("f"))
      .localCheckpoint(true)
    scoreFeats(feats, logRatios, keepQuantile)
  }
}
